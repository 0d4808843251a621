package graft

import java.sql.Timestamp

/** Contract of the DuckDB-dialect compatibility functions registered
  * by GraftExtensions (org.apache.spark.sql.graft.DuckDialect): each
  * shim must equal its Spark-native spelling value-for-value, and the
  * overridden builtins (datediff/date_diff/make_timestamp) must keep
  * their NATIVE call shapes byte-identical — the override only claims
  * shapes that previously errored. */
class DuckDialectSpec extends SparkSpec {

  private def one[T](sql: String): T =
    spark.sql(s"SELECT $sql").collect().head.get(0).asInstanceOf[T]

  test("epoch family: micros/millis/fractional seconds of a known instant") {
    val ts = "TIMESTAMP '2024-01-02 03:04:05.678901'"
    assert(one[Long](s"epoch_us($ts)") === one[Long](s"unix_micros($ts)"))
    assert(one[Long](s"epoch_ms($ts)") === one[Long](s"unix_millis($ts)"))
    // DuckDB epoch() is DOUBLE seconds WITH the fraction
    val e = one[Double](s"epoch($ts)")
    assert(e === one[Long](s"unix_micros($ts)") / 1e6)
    assert(e % 1 !== 0.0, "fractional seconds must survive")
  }

  test("quantile_cont == exact interpolated percentile") {
    spark.sql("SELECT * FROM VALUES (1.0),(2.0),(3.0),(10.0) t(x)")
      .createOrReplaceTempView("qv")
    val a = spark.sql("SELECT quantile_cont(x, 0.25) FROM qv").collect().head.getDouble(0)
    val b = spark.sql("SELECT percentile(x, 0.25) FROM qv").collect().head.getDouble(0)
    assert(a === b)
    assert(a === 1.75) // linear interpolation between 1 and 2
  }

  test("isodow: Monday = 1 ... Sunday = 7 (ISO numbering)") {
    assert(one[Int]("isodow(TIMESTAMP '2024-01-01 12:00:00')") === 1) // a Monday
    assert(one[Int]("isodow(TIMESTAMP '2024-01-07 12:00:00')") === 7) // a Sunday
  }

  test("string_split_regex == split") {
    val got = spark.sql("SELECT string_split_regex('a  b\tc', '[ \\t]+')")
      .collect().head.getSeq[String](0)
    assert(got.toSeq === Seq("a", "b", "c"))
  }

  test("len: character length for strings (builtin behavior), element count for arrays") {
    assert(one[Int]("len('héllo')") === 5)
    assert(one[Int]("len(array(10, 20, 30))") === 3)
    assert(one[Int]("len(map('a', 1, 'b', 2))") === 2)
    // the string path must remain byte-identical to Spark's own length
    assert(one[Int]("len('héllo')") === one[Int]("length('héllo')"))
  }

  test("list_* family: transform/filter/max/min aliases and the double-fold list_sum") {
    assert(one[Double]("list_sum(list_transform(array(1.0D, 2.5D), x -> x * 2))") === 7.0)
    assert(one[Double]("list_sum(array(1, 2, 3))") === 6.0) // int lists fold in DOUBLE
    assert(one[Int]("len(list_filter(array(1, -2, 3), x -> x > 0))") === 2)
    assert(one[Double]("list_max(array(1.5D, 9.25D, 2.0D))") === 9.25)
    assert(one[Double]("list_min(array(1.5D, 9.25D, 2.0D))") === 1.5)
    // the fold must equal Spark's own aggregate() spelling exactly
    assert(one[Double]("list_sum(array(0.1D, 0.2D, 0.3D))") ===
      one[Double]("aggregate(array(0.1D, 0.2D, 0.3D), 0.0D, (a, v) -> a + v)"))
  }

  test("json_extract == get_json_object; NULL on absent paths") {
    assert(one[String]("""json_extract('{"k": 5}', '$.k')""") === "5")
    assert(one[String]("""json_extract('{"k": 5}', '$.absent')""") === null)
    assert(one[String]("""json_extract('{"k": 5}', '$.k')""") ===
      one[String]("""get_json_object('{"k": 5}', '$.k')"""))
  }

  test("epoch on DATE: UTC midnight — the portable day-diff device") {
    // DuckDB's quoted-unit datediff('day', ...) is NOT shimmable
    // (Spark's parser validates datetime units before function
    // resolution), so oracle SQL computes day diffs as
    // (epoch(b) - epoch(a)) / 86400; pin the device's exactness
    assert(one[Double]("epoch(DATE '1970-01-01')") === 0.0)
    assert(one[Double](
      "(epoch(DATE '2024-03-01') - epoch(DATE '2024-01-01')) / 86400") === 60.0)
  }

  test("make_timestamp: 1-arg epoch-micros form; native 6-arg falls through") {
    assert(one[Timestamp]("make_timestamp(1704164645678901)").toInstant ===
      one[Timestamp]("timestamp_micros(1704164645678901)").toInstant)
    assert(one[Timestamp]("make_timestamp(2024, 1, 2, 3, 4, 5.5)").toInstant ===
      one[Timestamp]("TIMESTAMP '2024-01-02 03:04:05.5'").toInstant)
  }

  test("generate_series: inclusive ascending; EMPTY on reversed bounds (DuckDB), never auto-descending") {
    assert(one[Seq[Int]]("generate_series(1, 5)") === Seq(1, 2, 3, 4, 5))
    assert(one[Seq[Int]]("generate_series(3, 3)") === Seq(3))
    // DuckDB: generate_series(5, 1) = [] — Spark's bare sequence would
    // auto-descend to [5,4,3,2,1] here
    assert(one[Seq[Int]]("generate_series(5, 1)") === Seq.empty[Int])
    // explicit-step form keeps the signed-step contract both engines share
    assert(one[Seq[Int]]("generate_series(5, 1, -2)") === Seq(5, 3, 1))
  }

  test("regexp_replace: 3-arg replaces FIRST match only (DuckDB); 4-arg 'g' replaces all") {
    assert(one[String]("regexp_replace('a1b2c3', '[0-9]', 'X')") === "aXb2c3")
    assert(one[String]("regexp_replace('a1b2c3', '[0-9]', 'X', 'g')") === "aXbXcX")
    // replacement is literal text, not java-regex replacement syntax
    assert(one[String]("regexp_replace('abc', 'b', '.')") === "a.c")
    // null propagation matches the builtin
    assert(spark.sql("SELECT regexp_replace(CAST(NULL AS STRING), 'a', 'b')")
      .collect().head.isNullAt(0))
    // backreference-ambiguous replacements are rejected loudly, not
    // silently given Spark semantics
    intercept[Exception] {
      spark.sql("SELECT regexp_replace('ab', '(a)(b)', '\\\\2\\\\1')").collect()
    }
  }
}
