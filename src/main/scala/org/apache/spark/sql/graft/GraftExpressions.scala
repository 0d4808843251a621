/* Hosted under org.apache.spark.sql because the Expression-authoring
 * surface (AbstractDataType, the Column↔Expression bridge) is
 * private[sql] in Spark 4 — the same placement every third-party
 * Catalyst extension uses. Public API re-exported via graft.functions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.SparkException
import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.{TextHashes, VectorKernels}

/** Native Catalyst expression: k-slot MinHash signature of a string in
  * one rolling-hash pass (kernel: graft.functions.TextHashes). Codegen
  * emits a direct static call — no lambda dispatch, no intermediate
  * shingle arrays, stays inside whole-stage codegen. Replaces a
  * ~k×|text| higher-order transform/array_min pipeline that interpreted
  * a lambda per element.
  */
case class MinHashSig(child: Expression, k: Int, shingleLen: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHashes.minhashSig(input.asInstanceOf[UTF8String].getBytes, k, shingleLen))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextHashes.minhashSig($c.getBytes(), $k, $shingleLen));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** Native Catalyst expression: 64-bit SimHash of whitespace tokens in
  * one pass (kernel: TextHashes.simhash64). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    TextHashes.simhash64(input.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHashes.simhash64($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Exact n-byte-gram set (n ≤ 8) packed into sorted distinct longs —
  * the compact verification-side representation for near-dup Jaccard
  * (kernel: TextHashes.gramSet). */
case class GramSet(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(n >= 1 && n <= 8, "gram length must be in [1, 8]")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_set"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      TextHashes.gramSet(input.asInstanceOf[UTF8String].getBytes, n))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.TextHashes.gramSet($c.getBytes(), $n));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): GramSet =
    copy(child = newChild)
}

/** Intersection size of two sorted long arrays (merge scan — the fast
  * exact kernel under Jaccard verification). */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_intersect_size"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    TextHashes.sortedIntersectSize(
      l.asInstanceOf[ArrayData].toLongArray(), r.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.TextHashes.sortedIntersectSize($l.toLongArray(), $r.toLongArray())")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** Cosine similarity of two float-vector columns, double accumulation
  * (kernel: VectorKernels.cosineFF — oracle-identical fold order). */
case class CosineSimF(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.cosineFF(
      l.asInstanceOf[ArrayData].toFloatArray(), r.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.VectorKernels.cosineFF($l.toFloatArray(), $r.toFloatArray())")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimF = copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket of a float vector (kernel:
  * VectorKernels.lshBucketF). */
case class LshBucketF(child: Expression, bits: Int, table: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"

  override protected def nullSafeEval(input: Any): Any =
    VectorKernels.lshBucketF(input.asInstanceOf[ArrayData].toFloatArray(), bits, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.lshBucketF($c.toFloatArray(), $bits, $table)")

  override protected def withNewChildInternal(newChild: Expression): LshBucketF =
    copy(child = newChild)
}

object GraftExpressions {

  def cosineSimF(l: Column, r: Column): Column =
    ExpressionUtils.column(CosineSimF(
      ExpressionUtils.expression(l), ExpressionUtils.expression(r)))

  def lshBucketF(c: Column, bits: Int, table: Int): Column =
    ExpressionUtils.column(LshBucketF(ExpressionUtils.expression(c), bits, table))


  def minhashSig(c: Column, k: Int, shingleLen: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(c), k, shingleLen))

  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))

  def gramSet(c: Column, n: Int): Column =
    ExpressionUtils.column(GramSet(ExpressionUtils.expression(c), n))

  def sortedIntersectSize(l: Column, r: Column): Column =
    ExpressionUtils.column(SortedIntersectSize(
      ExpressionUtils.expression(l), ExpressionUtils.expression(r)))

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case _ => throw SparkException.internalError(s"$what must be an integer literal")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => MinHashSig(c, 32, 5)
        case Seq(c, k) => MinHashSig(c, intLit(k, "k"), 5)
        case Seq(c, k, l) => MinHashSig(c, intLit(k, "k"), intLit(l, "shingleLen"))
        case _ => throw SparkException.internalError("minhash_sig takes 1-3 args")
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => SimHash64(args.head)),
    (FunctionIdentifier("gram_set"),
      new ExpressionInfo(classOf[GramSet].getName, "gram_set"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => GramSet(c, 3)
        case Seq(c, n) => GramSet(c, intLit(n, "n"))
        case _ => throw SparkException.internalError("gram_set takes 1-2 args")
      }),
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (args: Seq[Expression]) => args match {
        case Seq(l, r) => SortedIntersectSize(l, r)
        case _ => throw SparkException.internalError("sorted_intersect_size takes 2 args")
      }),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimF].getName, "cosine_sim"),
      (args: Seq[Expression]) => args match {
        case Seq(l, r) => CosineSimF(l, r)
        case _ => throw SparkException.internalError("cosine_sim takes 2 args")
      }),
    (FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketF].getName, "lsh_bucket"),
      (args: Seq[Expression]) => args match {
        case Seq(c, bits) => LshBucketF(c, intLit(bits, "bits"), 0)
        case Seq(c, bits, tbl) =>
          LshBucketF(c, intLit(bits, "bits"), intLit(tbl, "table"))
        case _ => throw SparkException.internalError("lsh_bucket takes 2-3 args")
      }))

  /** Register the SQL functions on an already-built session. */
  def registerAll(spark: SparkSession): Unit =
    registrations.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExpressions.registrations.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => BucketedRangeJoinRule())
    ext.injectPlannerStrategy(_ => new AsofJoinStrategy)
  }
}
