package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact-arithmetic helpers for oracle-checked aggregates.
  *
  * Summing doubles is order-dependent, and Spark's partial-aggregation
  * order is not the oracle's — so `round(sum(double),2)` can flip a cent
  * on a rounding boundary (observed once per ~40 queries at sf0.01).
  * All monetary inputs here carry exactly 2 decimals, so we sum in
  * integer cents (long): exact, order-independent, identical across
  * engines, and faster than decimal aggregation. One final division by
  * a power of ten converts back to double — the dividend stays below
  * 2^53 through sf0.1 and beyond (sums ≲1e17), so the conversion is a
  * single correctly-rounded IEEE op in both Spark and DuckDB.
  */
object Exact {

  /** 2-decimal double → exact integer hundredths (cents). */
  def cents(c: Column): Column = round(c * 100).cast("long")

  /** Sum of a 2dp money column, returned as an exact double. */
  def sumMoney(c: Column): Column = (sum(cents(c)) / lit(100.0)).cast("double")

  /** SQL fragment: integer cents of a 2dp money column. */
  def centsSql(c: String): String = s"CAST(round(($c)*100) AS BIGINT)"
}
