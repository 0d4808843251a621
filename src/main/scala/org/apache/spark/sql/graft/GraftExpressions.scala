/* Hosted under org.apache.spark.sql because the Expression-authoring
 * surface (AbstractDataType, the Column↔Expression bridge) is
 * private[sql] in Spark 4 — the same placement every third-party
 * Catalyst extension uses. Public API re-exported via graft.functions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionInfo, Literal, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, BinaryType, DataType, DoubleType, FloatType, IntegerType, LongType, StringType}
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
  require(k >= 1 && k <= 4096, s"k (signature slots) must be in [1, 4096], got $k")
  require(shingleLen >= 1 && shingleLen <= 1024,
    s"shingleLen must be in [1, 1024], got $shingleLen")

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
  // a null ELEMENT inside either array nulls the result (ArrayData's
  // bulk converters would silently read it as 0 — a phantom gram).
  // The null scan is skipped when both children DECLARE
  // containsNull=false (e.g. gram_set output) — provably unnecessary,
  // and these arrays are the hot path's largest (measured ~20% on the
  // near-dup family at sf0.1 before the gate).
  private def elementsNullable: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => true
    }
  override def nullable: Boolean = left.nullable || right.nullable || elementsNullable

  override protected def nullSafeEval(l: Any, r: Any): Any =
    if (elementsNullable)
      VectorKernels.sortedIntersectAD(
        l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else TextHashes.sortedIntersectSize(
      l.asInstanceOf[ArrayData].toLongArray(), r.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elementsNullable)
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val tmp = ctx.freshName("boxed")
        s"""java.lang.Integer $tmp = graft.functions.VectorKernels.sortedIntersectAD($l, $r);
           |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.intValue(); }""".stripMargin
      })
    else defineCodeGen(ctx, ev, (l, r) =>
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
  // null vector ELEMENTS null the result instead of being read as 0.0f;
  // scan skipped when both children declare containsNull=false
  private def elementsNullable: Boolean =
    Seq(left.dataType, right.dataType).exists {
      case ArrayType(_, cn) => cn
      case _ => true
    }
  override def nullable: Boolean = left.nullable || right.nullable || elementsNullable

  override protected def nullSafeEval(l: Any, r: Any): Any =
    if (elementsNullable)
      VectorKernels.cosineAD(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    else VectorKernels.cosineFF(
      l.asInstanceOf[ArrayData].toFloatArray(), r.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elementsNullable)
      nullSafeCodeGen(ctx, ev, (l, r) => {
        val tmp = ctx.freshName("boxed")
        s"""java.lang.Double $tmp = graft.functions.VectorKernels.cosineAD($l, $r);
           |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.doubleValue(); }""".stripMargin
      })
    else defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.VectorKernels.cosineFF($l.toFloatArray(), $r.toFloatArray())")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): CosineSimF = copy(left = newLeft, right = newRight)
}

/** int8 cosine sketch of a float vector — a 16+d byte blob carrying
  * the quantized normalized vector plus the norms that make
  * I8CosBound a rigorous upper bound (kernel: VectorKernels.i8Sketch,
  * where the bound's proof lives). Computed once per vector; ~8×
  * smaller than the float array it stands in for on the candidate
  * side of a near-dup verify. */
case class I8Sketch(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "i8_sketch"
  // null vector ELEMENTS null the sketch instead of quantizing as 0.0f
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elementsNullable

  override protected def nullSafeEval(input: Any): Any =
    if (elementsNullable)
      VectorKernels.i8SketchAD(input.asInstanceOf[ArrayData])
    else VectorKernels.i8Sketch(input.asInstanceOf[ArrayData].toFloatArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elementsNullable)
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("boxed")
        s"""byte[] $tmp = graft.functions.VectorKernels.i8SketchAD($c);
           |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }""".stripMargin
      })
    else defineCodeGen(ctx, ev, c =>
      s"graft.functions.VectorKernels.i8Sketch($c.toFloatArray())")

  override protected def withNewChildInternal(newChild: Expression): I8Sketch =
    copy(child = newChild)
}

/** Upper bound on cosine(a, b) from two i8_sketch blobs (kernel:
  * VectorKernels.i8CosBound — proof in its scaladoc). Filtering on
  * `i8_cos_bound(ska, skb) >= threshold - 1e-6` before an exact
  * cosine verify is lossless: the ε absorbs the bound's own FP
  * evaluation error and the declared filter's round(·, 6). */
case class I8CosBound(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(BinaryType, BinaryType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "i8_cos_bound"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    VectorKernels.i8CosBound(l.asInstanceOf[Array[Byte]], r.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (l, r) =>
      s"graft.functions.VectorKernels.i8CosBound($l, $r)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): I8CosBound = copy(left = newLeft, right = newRight)
}

/** Random-hyperplane LSH bucket of a float vector (kernel:
  * VectorKernels.lshBucketF). */
case class LshBucketF(child: Expression, bits: Int, table: Int)
    extends UnaryExpression with ExpectsInputTypes {
  // bits > 63 would wrap `1L << p` mod 64 in the kernel: planes 64+
  // would silently vote onto low bits, aliasing buckets
  require(bits >= 1 && bits <= 63, s"bits must be in [1, 63], got $bits")
  require(table >= 0, s"table must be >= 0, got $table")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  override def dataType: DataType = LongType
  override def prettyName: String = "lsh_bucket"
  // null vector ELEMENTS null the bucket instead of voting as 0.0f;
  // scan skipped when the child declares containsNull=false
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, cn) => cn
    case _ => true
  }
  override def nullable: Boolean = child.nullable || elementsNullable

  override protected def nullSafeEval(input: Any): Any =
    if (elementsNullable)
      VectorKernels.lshBucketAD(input.asInstanceOf[ArrayData], bits, table)
    else VectorKernels.lshBucketF(
      input.asInstanceOf[ArrayData].toFloatArray(), bits, table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (elementsNullable)
      nullSafeCodeGen(ctx, ev, c => {
        val tmp = ctx.freshName("boxed")
        s"""java.lang.Long $tmp = graft.functions.VectorKernels.lshBucketAD($c, $bits, $table);
           |if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp.longValue(); }""".stripMargin
      })
    else defineCodeGen(ctx, ev, c =>
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

  def i8Sketch(c: Column): Column =
    ExpressionUtils.column(I8Sketch(ExpressionUtils.expression(c)))

  def i8CosBound(l: Column, r: Column): Column =
    ExpressionUtils.column(I8CosBound(
      ExpressionUtils.expression(l), ExpressionUtils.expression(r)))


  def minhashSig(c: Column, k: Int, shingleLen: Int): Column =
    ExpressionUtils.column(MinHashSig(ExpressionUtils.expression(c), k, shingleLen))

  def simhash64(c: Column): Column =
    ExpressionUtils.column(SimHash64(ExpressionUtils.expression(c)))

  def gramSet(c: Column, n: Int): Column =
    ExpressionUtils.column(GramSet(ExpressionUtils.expression(c), n))

  def sortedIntersectSize(l: Column, r: Column): Column =
    ExpressionUtils.column(SortedIntersectSize(
      ExpressionUtils.expression(l), ExpressionUtils.expression(r)))

  /** Spark's NATIVE replace-all regexp as a Column, bypassing the
    * session function registry: `functions.regexp_replace` resolves by
    * NAME, and the DuckDB-dialect shim rebinds the 3-arg form to
    * first-match-only — callers that need global semantics regardless
    * of session dialect (BpeTokenizer's sanitize) build the catalyst
    * expression directly. */
  def regexpReplaceAll(c: Column, pattern: String, rep: String): Column =
    ExpressionUtils.column(
      org.apache.spark.sql.catalyst.expressions.RegExpReplace(
        ExpressionUtils.expression(c), Literal(pattern), Literal(rep)))

  // user-facing argument errors: IllegalArgumentException (surfaced by
  // function resolution as the user's mistake), NOT internalError —
  // that macro prints "please file a bug report" for what is a wrong
  // argument at the call site
  private def badArgs(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) if v.isValidInt => v.toInt
    case other => badArgs(
      s"$what must be an integer literal, got ${other.sql}")
  }

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getName, "minhash_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => MinHashSig(c, 32, 5)
        case Seq(c, k) => MinHashSig(c, intLit(k, "k"), 5)
        case Seq(c, k, l) => MinHashSig(c, intLit(k, "k"), intLit(l, "shingleLen"))
        case _ => badArgs("minhash_sig takes 1-3 args (col[, k[, shingleLen]])")
      }),
    (FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => SimHash64(c)
        case _ => badArgs("simhash64 takes exactly 1 arg")
      }),
    (FunctionIdentifier("gram_set"),
      new ExpressionInfo(classOf[GramSet].getName, "gram_set"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => GramSet(c, 3)
        case Seq(c, n) => GramSet(c, intLit(n, "n"))
        case _ => badArgs("gram_set takes 1-2 args (col[, n])")
      }),
    (FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      (args: Seq[Expression]) => args match {
        case Seq(l, r) => SortedIntersectSize(l, r)
        case _ => badArgs("sorted_intersect_size takes exactly 2 args")
      }),
    (FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimF].getName, "cosine_sim"),
      (args: Seq[Expression]) => args match {
        case Seq(l, r) => CosineSimF(l, r)
        case _ => badArgs("cosine_sim takes exactly 2 args")
      }),
    (FunctionIdentifier("lsh_bucket"),
      new ExpressionInfo(classOf[LshBucketF].getName, "lsh_bucket"),
      (args: Seq[Expression]) => args match {
        case Seq(c, bits) => LshBucketF(c, intLit(bits, "bits"), 0)
        case Seq(c, bits, tbl) =>
          LshBucketF(c, intLit(bits, "bits"), intLit(tbl, "table"))
        case _ => badArgs("lsh_bucket takes 2-3 args (vec, bits[, table])")
      }),
    (FunctionIdentifier("i8_sketch"),
      new ExpressionInfo(classOf[I8Sketch].getName, "i8_sketch"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => I8Sketch(c)
        case _ => badArgs("i8_sketch takes exactly 1 arg")
      }),
    (FunctionIdentifier("i8_cos_bound"),
      new ExpressionInfo(classOf[I8CosBound].getName, "i8_cos_bound"),
      (args: Seq[Expression]) => args match {
        case Seq(l, r) => I8CosBound(l, r)
        case _ => badArgs("i8_cos_bound takes exactly 2 args")
      }))

  /** Register the SQL functions on an already-built session. */
  def registerAll(spark: SparkSession): Unit = {
    (registrations ++ DuckDialect.registrations).foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
    DuckDialect.tableFunctions.foreach { case (id, info, builder) =>
      spark.sessionState.tableFunctionRegistry.registerFunction(id, info, builder)
    }
  }
}

/** DuckDB-dialect SQL compatibility functions — thin builders over
  * Spark's own Catalyst expressions, registered by GraftExtensions so
  * SQL written for DuckDB (the repo's oracle dialect, and a common
  * analyst dialect) runs on this engine unchanged:
  *
  *  - `epoch_us/epoch_ms(ts)` → unix_micros/unix_millis (BIGINT);
  *    `epoch(ts)` → DOUBLE seconds with fraction (DuckDB semantics);
  *  - `quantile_cont(x, q)` → exact interpolated `percentile` (both
  *    engines define it as the linear-interpolation continuous
  *    quantile);
  *  - `isodow(ts)` → ISO day-of-week, Monday = 1 (Spark's weekday is
  *    Monday = 0);
  *  - `string_split_regex(s, p)` → `split(s, p)` (identical regex
  *    split semantics, different name);
  *  - `len(x)` → character length for strings (the builtin), element
  *    count for arrays/maps (DuckDB's polymorphic len — see DuckLen);
  *  - `json_extract(j, path)` → `get_json_object` (NULL on absent
  *    paths in both engines);
  *  - `make_timestamp(us)` — DuckDB's 1-arg epoch-micros constructor
  *    → timestamp_micros; the native 6-arg form falls through to the
  *    builtin builder unchanged (the override only claims a call
  *    shape that previously errored, so nothing narrows).
  *
  * NOT shimmable: DuckDB's quoted-unit `datediff('day', s, e)` —
  * Spark's PARSER validates the datetime unit before function
  * resolution ever happens (INVALID_PARAMETER_VALUE.DATETIME_UNIT at
  * parse time), so no registry builder can claim that shape; oracle
  * SQL uses `epoch()` day arithmetic instead where cross-engine day
  * diffs are needed.
  *
  * These are COMPATIBILITY surface, not new semantics: every builder
  * returns a stock Catalyst expression, so codegen/pushdown behave as
  * if the user had written the Spark spelling. SqlParitySpec leans on
  * them: each one widens the share of the declared oracle SQL that
  * replays verbatim through spark.sql.
  */
/** Runtime kernel for DuckDB's 3-arg regexp_replace (FIRST match only —
  * Spark's builtin replaces ALL). Top-level object so scalac emits a
  * static forwarder for StaticInvoke's codegen'd call. The compiled
  * pattern is memoized: the dialect builder only claims literal
  * patterns, so the cache is bounded by the number of distinct pattern
  * literals in the workload (belt-and-braces cap anyway). */
object DuckRegexpFirst {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()
  def replaceFirst(s: UTF8String, p: UTF8String, r: UTF8String): UTF8String = {
    if (cache.size > 128) cache.clear()
    val pat = cache.computeIfAbsent(p.toString, java.util.regex.Pattern.compile(_))
    UTF8String.fromString(pat.matcher(s.toString)
      .replaceFirst(java.util.regex.Matcher.quoteReplacement(r.toString)))
  }
}

object DuckDialect {
  import org.apache.spark.sql.catalyst.analysis.{FunctionRegistry => FR}
  import org.apache.spark.sql.catalyst.expressions.{Add, Cast, Divide, MicrosToTimestamp, UnixMicros, UnixMillis, StringSplit, WeekDay}
  import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
  import org.apache.spark.sql.types.TimestampType

  /** DuckDB's polymorphic `len`: character length for strings/binary
    * (exactly Spark's own `len`/`length`), ELEMENT COUNT for arrays
    * and maps (Spark spells that `size`). Registered over the builtin
    * `len` alias — a strict widening: the string behavior delegates to
    * the same Length expression the builtin builds, and array/map
    * inputs previously failed analysis. RuntimeReplaceable, so the
    * analyzer swaps in the typed delegate and codegen/pushdown see
    * only stock expressions. */
  case class DuckLen(child: Expression)
      extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
    import org.apache.spark.sql.catalyst.expressions.{Length, Size}
    override lazy val replacement: Expression = child.dataType match {
      case _: ArrayType | _: org.apache.spark.sql.types.MapType =>
        Size(child, legacySizeOfNull = false)
      case _ => Length(child)
    }
    override def prettyName: String = "len"
    override protected def withNewChildInternal(newChild: Expression): DuckLen =
      copy(child = newChild)
  }

  /** DuckDB's `list_sum` in DOUBLE accumulation: a left fold
    * aggregate(x, 0.0, (acc, v) -> acc + v) built with pre-resolved
    * lambda variables. Declared double-typed regardless of element
    * type (DuckDB widens int lists to HUGEINT; every oracle usage
    * transforms elements to DOUBLE first, where the two engines'
    * left folds agree bit-for-bit). */
  case class ListSum(child: Expression)
      extends UnaryExpression with org.apache.spark.sql.catalyst.expressions.RuntimeReplaceable {
    import org.apache.spark.sql.catalyst.expressions.{Add, ArrayAggregate, LambdaFunction, NamedLambdaVariable}
    override lazy val replacement: Expression = {
      val et = child.dataType match {
        case ArrayType(e, cn) => (e, cn)
        case other => throw new IllegalArgumentException(
          s"list_sum expects an array, got $other")
      }
      val acc = NamedLambdaVariable("acc", DoubleType, nullable = true)
      val x = NamedLambdaVariable("x", et._1, et._2)
      // 4-arg ctor with an explicit PRE-RESOLVED identity finish lambda:
      // the 3-arg convenience ctor builds its finish lambda from
      // UnresolvedNamedLambdaVariable, and RuntimeReplaceable.dataType
      // is consulted before the analyzer would resolve it
      val out = NamedLambdaVariable("out", DoubleType, nullable = true)
      new ArrayAggregate(child, Literal(0.0d),
        LambdaFunction(Add(acc, Cast(x, DoubleType)), Seq(acc, x), hidden = false),
        LambdaFunction(out, Seq(out), hidden = false))
    }
    override def prettyName: String = "list_sum"
    override protected def withNewChildInternal(newChild: Expression): ListSum =
      copy(child = newChild)
  }

  private def badArgs(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def info(clazz: Class[_], name: String): ExpressionInfo =
    new ExpressionInfo(clazz.getName, name)

  /** The stock builder for a builtin name — delegation target for the
    * call shapes the override does NOT claim. */
  private def builtin(name: String): Seq[Expression] => Expression =
    FR.builtin.lookupFunctionBuilder(FunctionIdentifier(name)).getOrElse(
      (_: Seq[Expression]) => badArgs(s"no builtin builder for $name"))

  val registrations: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("epoch_us"), info(classOf[UnixMicros], "epoch_us"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => UnixMicros(Cast(c, TimestampType))
        case _ => badArgs("epoch_us takes exactly 1 arg")
      }),
    (FunctionIdentifier("epoch_ms"), info(classOf[UnixMillis], "epoch_ms"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => UnixMillis(Cast(c, TimestampType))
        case _ => badArgs("epoch_ms takes exactly 1 arg")
      }),
    (FunctionIdentifier("epoch"), info(classOf[UnixMicros], "epoch"),
      (args: Seq[Expression]) => args match {
        // DuckDB epoch() is DOUBLE seconds including the fraction
        case Seq(c) => Divide(
          Cast(UnixMicros(Cast(c, TimestampType)), DoubleType), Literal(1e6))
        case _ => badArgs("epoch takes exactly 1 arg")
      }),
    (FunctionIdentifier("quantile_cont"), info(classOf[Percentile], "quantile_cont"),
      (args: Seq[Expression]) => args match {
        case Seq(c, q) => new Percentile(c, q)
        case _ => badArgs("quantile_cont takes exactly 2 args")
      }),
    (FunctionIdentifier("isodow"), info(classOf[WeekDay], "isodow"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => Add(WeekDay(c), Literal(1))
        case _ => badArgs("isodow takes exactly 1 arg")
      }),
    (FunctionIdentifier("string_split_regex"), info(classOf[StringSplit], "string_split_regex"),
      (args: Seq[Expression]) => args match {
        case Seq(s, p) => new StringSplit(s, p)
        case _ => badArgs("string_split_regex takes exactly 2 args")
      }),
    (FunctionIdentifier("range"), info(classOf[org.apache.spark.sql.catalyst.expressions.Sequence], "range"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{CaseWhen, GreaterThan, Sequence, Subtract}
        import org.apache.spark.sql.catalyst.util.GenericArrayData
        // DuckDB's SCALAR range: [lo, hi) step 1, EMPTY when hi <= lo.
        // Spark's sequence(lo, hi-1) is inclusive and auto-descends on
        // hi-1 < lo, so the empty case needs an explicit guard. Only
        // the scalar form is claimed — range(...) in a FROM clause
        // resolves through the separate table-function registry.
        def halfOpen(lo: Expression, hi: Expression,
            step: Option[Expression] = None): Expression =
          CaseWhen(Seq((GreaterThan(hi, lo), step match {
            case None => new Sequence(lo, Subtract(hi, Literal(1L)))
            case Some(s) => new Sequence(lo, Subtract(hi, Literal(1L)), s)
          })),
            Some(Literal.create(new GenericArrayData(Array.emptyLongArray),
              ArrayType(LongType, containsNull = false))))
        args match {
          case Seq(hi) => halfOpen(Literal(0L), Cast(hi, LongType))
          case Seq(lo, hi) => halfOpen(Cast(lo, LongType), Cast(hi, LongType))
          // positive-literal-step half-open form: Sequence(lo, hi-1, s)
          // hits the same value set (lo, lo+s, ... < hi) for any s >= 1.
          // Negative steps stay unclaimed — DuckDB's descending range is
          // exclusive at the END bound, which Sequence can't spell with
          // a constant end offset
          case Seq(lo, hi, Literal(s: Long, _)) if s > 0 =>
            halfOpen(Cast(lo, LongType), Cast(hi, LongType), Some(Literal(s)))
          case Seq(lo, hi, Literal(s: Int, _)) if s > 0 =>
            halfOpen(Cast(lo, LongType), Cast(hi, LongType), Some(Literal(s.toLong)))
          case _ => badArgs("range takes 1-3 args (scalar form, positive literal step)")
        }
      }),
    (FunctionIdentifier("list_transform"), info(classOf[DuckLen], "list_transform"),
      builtin("transform")),
    (FunctionIdentifier("list_filter"), info(classOf[DuckLen], "list_filter"),
      builtin("filter")),
    (FunctionIdentifier("list_max"), info(classOf[DuckLen], "list_max"),
      builtin("array_max")),
    (FunctionIdentifier("list_min"), info(classOf[DuckLen], "list_min"),
      builtin("array_min")),
    (FunctionIdentifier("list_distinct"), info(classOf[DuckLen], "list_distinct"),
      builtin("array_distinct")),
    (FunctionIdentifier("list_intersect"), info(classOf[DuckLen], "list_intersect"),
      builtin("array_intersect")),
    (FunctionIdentifier("list_extract"), info(classOf[DuckLen], "list_extract"),
      // 1-based, NULL past either end — DuckDB's list_extract is
      // exactly Spark's try_element_at (bracket subscripts are NOT
      // portable: 1-based in DuckDB, 0-based + bounds-throwing here).
      // The index narrows to INT (ElementAt requires it, and the
      // portable subscript idiom feeds BIGINT range() indices); the
      // name claims LISTS only, so the int cast never mistypes a map
      // key
      (args: Seq[Expression]) => args match {
        case Seq(arr, idx) =>
          builtin("try_element_at")(Seq(arr, Cast(idx, IntegerType)))
        case _ => badArgs("list_extract takes exactly 2 args")
      }),
    (FunctionIdentifier("string_split"), info(classOf[StringSplit], "string_split"),
      (args: Seq[Expression]) => args match {
        // DuckDB string_split splits on a LITERAL separator; Spark's
        // split takes a regex — quote the literal so regex
        // metacharacters in the separator split literally
        case Seq(str, Literal(sep: UTF8String, _)) =>
          new StringSplit(str, Literal(java.util.regex.Pattern.quote(sep.toString)))
        case Seq(_, _) => badArgs(
          "string_split requires a literal separator (regex-quoted into split)")
        case _ => badArgs("string_split takes exactly 2 args")
      }),
    (FunctionIdentifier("encode"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.Encode], "encode"),
      {
        val orig = builtin("encode")
        (args: Seq[Expression]) => args match {
          // DuckDB encode(str) = the UTF-8 bytes; Spark's native
          // 2-arg (str, charset) falls through
          case Seq(str) =>
            org.apache.spark.sql.catalyst.expressions.Encode(str, Literal("UTF-8"))
          case other => orig(other)
        }
      }),
    (FunctionIdentifier("generate_series"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.Sequence], "generate_series"),
      (args: Seq[Expression]) => {
        import org.apache.spark.sql.catalyst.expressions.{CaseWhen, GreaterThanOrEqual, Literal => Lit, Sequence, Slice}
        args match {
          // DuckDB's SCALAR generate_series(lo, hi) is an INCLUSIVE
          // ASCENDING list, EMPTY when lo > hi. Spark's 2-arg sequence
          // auto-DESCENDS on lo > hi (sequence(5,1) = [5,4,3,2,1]), so
          // the reversed-bounds case needs the same explicit guard as
          // the `range` shim. The else branch's empty array borrows its
          // element type from a zero-length slice of sequence(lo, lo) —
          // no hand-built typed literal, so int/bigint/date inputs all
          // type out. The FROM-position table function of the same name
          // stays DuckDB-only.
          case Seq(lo, hi) =>
            CaseWhen(Seq((GreaterThanOrEqual(hi, lo), new Sequence(lo, hi))),
              Some(Slice(new Sequence(lo, lo), Lit(1), Lit(0))))
          // the explicit-step form keeps Spark's sequence verbatim:
          // with a signed step both engines agree (DuckDB's 3-arg form
          // descends for negative steps exactly like Spark's)
          case Seq(lo, hi, step) =>
            new org.apache.spark.sql.catalyst.expressions.Sequence(lo, hi, step)
          case _ => badArgs("generate_series takes 2-3 args (scalar form)")
        }
      }),
    (FunctionIdentifier("generate_subscripts"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.Sequence], "generate_subscripts"),
      (args: Seq[Expression]) => args match {
        // 1-based subscripts of a (1-dimensional) list
        case Seq(arr, Literal(1, _)) =>
          new org.apache.spark.sql.catalyst.expressions.Sequence(Literal(1),
            org.apache.spark.sql.catalyst.expressions.Size(arr, legacySizeOfNull = false))
        case _ => badArgs("generate_subscripts supports (list, 1) only")
      }),
    (FunctionIdentifier("strlen"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.OctetLength], "strlen"),
      (args: Seq[Expression]) => args match {
        // DuckDB strlen is BYTE length (UTF-8), not character length
        case Seq(c) => org.apache.spark.sql.catalyst.expressions.OctetLength(c)
        case _ => badArgs("strlen takes exactly 1 arg")
      }),
    (FunctionIdentifier("unnest"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.Explode], "unnest"),
      (args: Seq[Expression]) => args match {
        // DuckDB's SELECT-position unnest(arr) is Spark's explode
        // generator (one output row per element; generators are legal
        // scalar-registry entries — explode itself is one). FROM-ative
        // LATERAL unnest stays DuckDB-only: that is the table-function
        // namespace with correlated arguments.
        case Seq(c) => org.apache.spark.sql.catalyst.expressions.Explode(c)
        case _ => badArgs("unnest takes exactly 1 arg (scalar position)")
      }),
    (FunctionIdentifier("list_sum"), info(classOf[ListSum], "list_sum"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => ListSum(c)
        case _ => badArgs("list_sum takes exactly 1 arg")
      }),
    (FunctionIdentifier("regexp_replace"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace], "regexp_replace"),
      {
        (args: Seq[Expression]) => args match {
          // DuckDB's regexp_replace(s, p, r, 'g') — global replace,
          // which is Spark's DEFAULT 3-arg behavior (Spark's own 4th
          // arg is an INT start position; a string flag previously
          // died in a cast error inside checkInputDataTypes). Only
          // the 'g' flag maps; other flag strings keep erroring.
          case Seq(str, pat, rep, Literal(u: UTF8String, _))
              if u.toString.equalsIgnoreCase("g") =>
            org.apache.spark.sql.catalyst.expressions.RegExpReplace(str, pat, rep)
          // DuckDB's 3-arg form replaces the FIRST match only — Spark's
          // builtin replaces ALL, so falling through would silently
          // diverge from the DuckDB driver truth while passing the
          // Spark-vs-Spark parity replay. Claimed subset: literal
          // pattern (bounds the compiled-pattern cache) and a literal
          // replacement with no backreference syntax (`\1` is RE2
          // spelling, `$1` is java.util.regex — rejecting both ends of
          // that ambiguity keeps the claim exact). Everything else
          // errors loudly rather than borrowing Spark semantics.
          case Seq(str, pat @ Literal(_: UTF8String, _), rep @ Literal(rs: UTF8String, _))
              if !rs.toString.exists(c => c == '\\' || c == '$') =>
            org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke(
              classOf[DuckRegexpFirst.type], StringType, "replaceFirst",
              Seq(str, pat, rep), Seq(StringType, StringType, StringType))
          case Seq(_, _, _) => badArgs(
            "3-arg regexp_replace (DuckDB: first match only) requires a literal " +
            "pattern and a backreference-free literal replacement; use the " +
            "4-arg 'g' form for global replace")
          case _ => badArgs("regexp_replace takes 3-4 args")
        }
      }),
    (FunctionIdentifier("json_extract"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.GetJsonObject], "json_extract"),
      (args: Seq[Expression]) => args match {
        // DuckDB json_extract(json, '$.path') ~ Spark get_json_object:
        // both return NULL for an absent path; scalar values compare
        // equal after the CAST every consumer applies
        case Seq(j, path) => org.apache.spark.sql.catalyst.expressions.GetJsonObject(j, path)
        case _ => badArgs("json_extract takes exactly 2 args")
      }),
    (FunctionIdentifier("len"), info(classOf[DuckLen], "len"),
      (args: Seq[Expression]) => args match {
        case Seq(c) => DuckLen(c)
        case _ => badArgs("len takes exactly 1 arg")
      }),
    (FunctionIdentifier("make_timestamp"), info(classOf[MicrosToTimestamp], "make_timestamp"),
      {
        val orig = builtin("make_timestamp")
        (args: Seq[Expression]) => args match {
          // DuckDB: make_timestamp(epoch_micros)
          case Seq(us) => MicrosToTimestamp(us)
          case other => orig(other)
        }
      }),
    (FunctionIdentifier("list_value"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.CreateArray], "list_value"),
      // DuckDB's explicit list constructor (the bracket literal [a, b]
      // is parse-foreign here; list_value is the spelling both engines
      // parse)
      (args: Seq[Expression]) =>
        org.apache.spark.sql.catalyst.expressions.CreateArray(args)),
    (FunctionIdentifier("list"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.aggregate.CollectList], "list"),
      (args: Seq[Expression]) => args match {
        // DuckDB's list(x) aggregate = collect_list; ORDER wihin the
        // list is nondeterministic in BOTH engines, so portable oracle
        // SQL always wraps it in list_sort before comparing
        case Seq(c) =>
          org.apache.spark.sql.catalyst.expressions.aggregate.CollectList(c)
        case _ => badArgs("list takes exactly 1 arg")
      }),
    (FunctionIdentifier("list_sort"), info(classOf[DuckLen], "list_sort"),
      (args: Seq[Expression]) => args match {
        // 1-arg ascending sort only. Null placement diverges between
        // the engines (DuckDB: NULLS LAST on ASC... but NULLS FIRST
        // pre-0.8 configs; Spark array_sort: nulls last) — the claim
        // is non-null element lists, which is every oracle usage
        case Seq(_) => builtin("array_sort")(args)
        case _ => badArgs("list_sort takes exactly 1 arg (ascending)")
      }),
    (FunctionIdentifier("array_to_string"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.ArrayJoin], "array_to_string"),
      (args: Seq[Expression]) => args match {
        // both engines: join elements with the separator, skip NULLs
        case Seq(arr, sep) =>
          org.apache.spark.sql.catalyst.expressions.ArrayJoin(arr, sep, None)
        case _ => badArgs("array_to_string takes exactly 2 args")
      }),
    (FunctionIdentifier("array_slice"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.Slice], "array_slice"),
      (args: Seq[Expression]) => args match {
        // DuckDB array_slice(l, begin, end): 1-based INCLUSIVE end →
        // Spark's Slice(l, begin, end - begin + 1). Both engines clamp
        // a past-the-end bound and return empty for begin > len; the
        // negative-index forms are unclaimed (DuckDB counts from the
        // back, Spark's slice errors on start = 0 only)
        // int casts: Slice requires INT positions, while DuckDB call
        // sites produce BIGINT bounds (range() indices); list positions
        // fit INT by construction
        case Seq(arr, begin, end) =>
          org.apache.spark.sql.catalyst.expressions.Slice(arr,
            Cast(begin, IntegerType),
            Cast(Add(org.apache.spark.sql.catalyst.expressions.Subtract(
              Cast(end, LongType), Cast(begin, LongType)), Literal(1L)),
              IntegerType))
        case _ => badArgs("array_slice takes exactly 3 args (1-based inclusive end)")
      }),
    (FunctionIdentifier("strftime"),
      info(classOf[org.apache.spark.sql.catalyst.expressions.DateFormatClass], "strftime"),
      (args: Seq[Expression]) => args match {
        // DuckDB strftime(ts, '%Y-%m') → date_format with the C
        // specifiers translated to their Java pattern letters. Claimed
        // subset: a LITERAL format string of known %-specifiers joined
        // by plain separator characters — anything else errors loudly
        // instead of borrowing the (different) Java pattern alphabet
        case Seq(ts, Literal(f: UTF8String, StringType)) =>
          val fmt = f.toString
          val sb = new StringBuilder
          var i = 0
          while (i < fmt.length) {
            val c = fmt.charAt(i)
            if (c == '%') {
              if (i + 1 >= fmt.length) badArgs("strftime: dangling %")
              fmt.charAt(i + 1) match {
                case 'Y' => sb ++= "yyyy"
                case 'y' => sb ++= "yy"
                case 'm' => sb ++= "MM"
                case 'd' => sb ++= "dd"
                case 'H' => sb ++= "HH"
                case 'M' => sb ++= "mm"
                case 'S' => sb ++= "ss"
                case 'j' => sb ++= "DDD"
                case other => badArgs(s"strftime: unsupported specifier %$other")
              }
              i += 2
            } else if ("-/:. _".indexOf(c.toInt) >= 0) { sb += c; i += 1 }
            else badArgs(
              "strftime: only %-specifiers and -/:. _ separators are claimed")
          }
          org.apache.spark.sql.catalyst.expressions.DateFormatClass(
            Cast(ts, TimestampType), Literal(sb.toString))
        case _ => badArgs("strftime takes (expr, literal format)")
      }))

  /** DuckDB-dialect TABLE functions — FROM-position surface, resolved
    * through Spark's separate TableFunctionRegistry:
    *
    *  - `generate_series(lo, hi)` (inclusive, literal bounds) → the
    *    Range logical plan — a leaf source that parallelizes by slice,
    *    never a driver-side collect;
    *  - `unnest(arr)` → a Generate(Explode) over OneRowRelation, the
    *    exact plan shape the builtin `explode` table function builds.
    *    With a CORRELATED argument (`FROM t, LATERAL unnest(range(0,
    *    t.n)) AS x(i)`) the analyzer's lateral-join resolution applies
    *    unchanged, so DuckDB's row-expansion idiom runs verbatim.
    *
    * Spark's builtin `range(lo, hi)` table function already matches
    * DuckDB's half-open FROM-position `range` (both [lo, hi) step 1);
    * only the default column name differs (`id` vs `range`), which
    * every oracle statement papers over with an explicit `t(i)` alias.
    */
  val tableFunctions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Generate, OneRowRelation, Range => LRange}
    def longLit(e: Expression, what: String): Long = e match {
      case Literal(v: Int, _) => v.toLong
      case Literal(v: Long, _) => v
      case Literal(v: Short, _) => v.toLong
      case _ => badArgs(s"$what requires literal integer bounds in FROM position")
    }
    Seq(
      (FunctionIdentifier("generate_series"),
        info(classOf[LRange], "generate_series"),
        (args: Seq[Expression]) => args match {
          // INCLUSIVE both ends (the scalar shim's guard isn't needed:
          // Range with start >= end under a positive step is empty,
          // matching DuckDB's empty series for lo > hi)
          case Seq(lo, hi) =>
            LRange(longLit(lo, "generate_series"),
              longLit(hi, "generate_series") + 1L, 1L, None)
          case _ => badArgs("generate_series table function takes 2 args")
        }),
      (FunctionIdentifier("unnest"),
        info(classOf[org.apache.spark.sql.catalyst.expressions.Explode], "unnest"),
        (args: Seq[Expression]) => args match {
          case Seq(c) => Generate(
            org.apache.spark.sql.catalyst.expressions.Explode(c),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Nil, child = OneRowRelation())
          case _ => badArgs("unnest table function takes exactly 1 arg")
        }))
  }
}

/** SparkSessionExtensions entry point:
  * `.config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExpressions.registrations.foreach(ext.injectFunction)
    DuckDialect.registrations.foreach(ext.injectFunction)
    DuckDialect.tableFunctions.foreach(ext.injectTableFunction)
    ext.injectOptimizerRule(_ => BucketedRangeJoinRule())
    ext.injectPlannerStrategy(_ => new AsofJoinStrategy)
    // ASOF JOIN grammar: parse-time rewrite → marker function →
    // resolution-time swap onto the native as-of plan (AsofSql.scala)
    ext.injectFunction(AsofMarker.registration)
    ext.injectParser((_, delegate) => new AsofSqlParser(delegate))
    ext.injectResolutionRule(_ => AsofJoinResolution())
    ext.injectCheckRule(_ => AsofMarkerCheck())
  }
}
