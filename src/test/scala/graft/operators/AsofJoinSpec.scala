package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {

  test("asofJoin attaches latest preceding right row per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 5L, "c"))
      .toDF("k", "lt", "lv")
    val right = Seq((1L, 10L, "r10", 100), (1L, 20L, "r20", 200),
        (2L, 9L, "r9", 900))
      .toDF("k", "rt", "rname", "rval")
    val out = Ops.asofJoin(left, right, "k", "lt", "rt", Seq("rname", "rval"))
      .orderBy("k", "lt")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.toString).orNull,
        Option(r.get(4)).map(_.toString).orNull))
      .toSeq
    // exact-time match included; k=2 left at t=5 precedes all right rows
    assert(out === Seq(
      (1L, 10L, "a", "r10", "100"),
      (1L, 25L, "b", "r20", "200"),
      (2L, 5L, "c", null, null)))
  }

  test("asofJoin carries the matched right row atomically (null payload column cannot leak an older value)") {
    import spark.implicits._
    val left = Seq((1L, 30L, "x")).toDF("k", "lt", "lv")
    // the latest preceding right row (t=20) has a NULL rname; the older
    // row's "old" must NOT bleed into rname while rval comes from t=20
    val right = Seq((1L, 10L, Option("old"), Option(1)),
        (1L, 20L, None: Option[String], Option(2)))
      .toDF("k", "rt", "rname", "rval")
    val row = Ops.asofJoin(left, right, "k", "lt", "rt", Seq("rname", "rval"))
      .collect().head
    assert(row.isNullAt(row.fieldIndex("rname")))
    assert(row.getInt(row.fieldIndex("rval")) === 2)
  }

  test("asofJoinForward attaches earliest following right row per key") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 25L, "b"), (2L, 50L, "c"))
      .toDF("k", "lt", "lv")
    val right = Seq((1L, 10L, "r10", 100), (1L, 20L, "r20", 200),
        (2L, 9L, "r9", 900))
      .toDF("k", "rt", "rname", "rval")
    val out = Ops.asofJoinForward(left, right, "k", "lt", "rt", Seq("rname", "rval"))
      .orderBy("k", "lt")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Option(r.get(3)).map(_.toString).orNull,
        Option(r.get(4)).map(_.toString).orNull))
      .toSeq
    // exact-time match included (lt=10 → rt=10, not rt=20); k=2 left at
    // t=50 follows every right row → nulls
    assert(out === Seq(
      (1L, 10L, "a", "r10", "100"),
      (1L, 25L, "b", null, null),
      (2L, 50L, "c", null, null)))
  }

  test("null left time matches nothing in either direction") {
    import spark.implicits._
    val left = Seq((1L, Option(15L), "t15"), (1L, None: Option[Long], "tnull"))
      .toDF("k", "lt", "lv")
    val right = Seq((1L, 10L, "r10"), (1L, 20L, "r20")).toDF("k", "rt", "rname")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, String, Seq[String]) => org.apache.spark.sql.DataFrame) =
      f(left, right, "k", "lt", "rt", Seq("rname"))
        .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.toString)).toMap
    assert(run(Ops.asofJoin) === Map("t15" -> Some("r10"), "tnull" -> None))
    assert(run(Ops.asofJoinForward) === Map("t15" -> Some("r20"), "tnull" -> None))
  }

  test("null right time/key rows can never fabricate a match") {
    import spark.implicits._
    // the null-rt right row would sort nulls-first into the scan and
    // last(ignoreNulls) would carry its payload into unmatched left
    // rows if it were not dropped; null-key rows must also never match
    val left = Seq((1L, 100L, "l"), (2L, 1L, "early")).toDF("k", "lt", "lv")
    val right = Seq(
      (Option(1L), None: Option[Long], "poison"),
      (None: Option[Long], Option(1L), "nullkey"),
      (Option(1L), Option(5L), "r5")).toDF("k", "rt", "rname")
    def run(f: (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame,
        String, String, String, Seq[String]) => org.apache.spark.sql.DataFrame) =
      f(left, right, "k", "lt", "rt", Seq("rname"))
        .collect().map(r => r.getString(2) -> Option(r.get(3)).map(_.toString)).toMap
    // backward: k=1@100 matches r5 (5 <= 100); k=2@1 has no right rows
    assert(run(Ops.asofJoin) === Map("l" -> Some("r5"), "early" -> None))
    // forward: k=1@100 has nothing at-or-after; poison must NOT appear
    assert(run(Ops.asofJoinForward) === Map("l" -> None, "early" -> None))
  }

  test("forward and backward agree with a brute-force formulation on a random timeline") {
    import spark.implicits._
    var seed = 777L
    def next(n: Long): Long = { seed = seed * 6364136223846793005L + 1442695040888963407L; (seed >>> 33) % n }
    val left = (1 to 300).map(i => (next(5), next(1000), i.toLong)).toDF("k", "lt", "lid")
    val right = (1 to 200).map(i => (next(5), next(1000), i.toLong))
      .distinct.groupBy(t => (t._1, t._2)).map(_._2.maxBy(_._3)).toSeq // unique per (k, rt)
      .toDF("k", "rt", "rid")
    val fwd = Ops.asofJoinForward(left, right, "k", "lt", "rt", Seq("rid"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3)).map(_.toString.toLong)).toMap
    val brute = left.as[(Long, Long, Long)].collect().map { case (k, lt, lid) =>
      val cands = right.as[(Long, Long, Long)].collect()
        .filter(r => r._1 == k && r._2 >= lt)
      lid -> (if (cands.isEmpty) None else Some(cands.minBy(r => (r._2, -r._3))._3))
    }.toMap
    assert(fwd === brute)
  }

  test("saltedJoin rejects join types that would duplicate small-side rows") {
    import spark.implicits._
    val df = Seq((1L, "a")).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "k", joinType = "full_outer")
    }
    intercept[IllegalArgumentException] {
      Skew.saltedJoin(df, df, "k", joinType = "right")
    }
  }
}
