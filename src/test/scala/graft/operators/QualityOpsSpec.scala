package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** The expectations audit (q211): exact violation counts on a poisoned
  * in-memory fixture (every check must COUNT, not just flag), and the
  * calibrated pass/fail split on the real fixture. */
class QualityOpsSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  test("poisoned fixture: every check counts its exact violations") {
    import spark.implicits._
    // lineitem: one dup PK pair (3 copies -> 2 extra), one qty 31, one
    // discount 0.2, one orderkey (99) with no parent order
    val li = Seq(
      (1L, 1, 5.0, 0.05), (1L, 1, 5.0, 0.05), (1L, 1, 5.0, 0.05),
      (1L, 2, 31.0, 0.00),
      (2L, 1, 10.0, 0.20),
      (99L, 1, 1.0, 0.01))
      .toDF("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    // orders: one bad status, one custkey (77) with no parent customer
    val ord = Seq(
      (1L, 10L, "F"), (2L, 10L, "X"), (3L, 77L, "O"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus")
    // customer: one negative balance
    val cust = Seq((10L, -5.0), (11L, 100.0))
      .toDF("c_custkey", "c_acctbal")
    val got = QualityOps.audit(li, ord, cust).collect().toSeq
    assert(got === Seq(
      Row("customer_acctbal_nonnegative", 1L, 2L),
      Row("lineitem_discount_range", 1L, 6L),
      Row("lineitem_orderkey_fk_orders", 1L, 6L),
      Row("lineitem_pk_unique", 2L, 6L),
      Row("lineitem_qty_le_30", 1L, 6L),
      Row("orders_custkey_fk_customer", 1L, 3L),
      Row("orders_status_domain", 1L, 3L)))
  }

  test("q211 on the fixture: calibrated checks fail with nonzero counts, structural checks hold at zero") {
    val got = QualityOps.expectations(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.size === 7)
    // the two calibrated-to-fail expectations demonstrably count —
    // and the PK check surfaces REAL duplication in the synthetic
    // fixture ((l_orderkey, l_linenumber) is not unique there), the
    // audit earning its keep rather than rubber-stamping
    assert(got("lineitem_qty_le_30")._1 > 0)
    assert(got("customer_acctbal_nonnegative")._1 > 0)
    assert(got("lineitem_pk_unique")._1 > 0)
    // structural integrity the fixture does hold: both FK edges, domains
    for (k <- Seq("lineitem_orderkey_fk_orders",
        "orders_custkey_fk_customer", "orders_status_domain",
        "lineitem_discount_range"))
      assert(got(k)._1 === 0L, k)
    // checked = the audited table's cardinality, never zero
    assert(got.values.forall(_._2 > 0))
  }
}
