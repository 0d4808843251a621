package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.graft.GraftExpressions

/** Public column-level API for the graft native expressions (the
  * Expression classes themselves live in org.apache.spark.sql.graft —
  * see GraftExpressions for why). */
object functions {

  /** k-slot MinHash signature (array<long>) of a string column —
    * native one-pass Catalyst expression with codegen. */
  def minhash_sig(c: Column, k: Int = 32, shingleLen: Int = 5): Column =
    GraftExpressions.minhashSig(c, k, shingleLen)

  /** 64-bit SimHash of a string column's whitespace tokens. */
  def simhash64(c: Column): Column = GraftExpressions.simhash64(c)

  /** Exact n-byte-gram set (n <= 8) as sorted distinct packed longs. */
  def gram_set(c: Column, n: Int = 3): Column = GraftExpressions.gramSet(c, n)

  /** Intersection size of two sorted long-array columns (merge scan). */
  def sorted_intersect_size(l: Column, r: Column): Column =
    GraftExpressions.sortedIntersectSize(l, r)

  /** Cosine similarity of two array<float> columns (double accum). */
  def cosine_sim(l: Column, r: Column): Column = GraftExpressions.cosineSimF(l, r)

  /** B-bit random-hyperplane LSH bucket of an array<float> column. */
  def lsh_bucket(c: Column, bits: Int, table: Int = 0): Column =
    GraftExpressions.lshBucketF(c, bits, table)

  /** int8 cosine sketch blob of an array<float> column (binary). */
  def i8_sketch(c: Column): Column = GraftExpressions.i8Sketch(c)

  /** Rigorous cosine upper bound from two i8_sketch columns. */
  def i8_cos_bound(l: Column, r: Column): Column = GraftExpressions.i8CosBound(l, r)

  /** Register minhash_sig/simhash64 as SQL functions on a session. */
  def registerAll(spark: SparkSession): Unit = GraftExpressions.registerAll(spark)
}
