package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.{AsofSqlRewrite, GraftPlans}

/** ASOF JOIN grammar through the injected parser: the pure text
  * rewrite, the analysis-time swap onto AsofJoinExec, direction and
  * inner/outer semantics, coercion/multi-key shapes, and the loud
  * failures for shapes the operator cannot mean. */
class AsofSqlSpec extends SparkSpec {

  private def sql(q: String): DataFrame = spark.sql(q)

  private def views(): Unit = {
    import spark.implicits._
    Seq((1L, 1L, 5L), (2L, 1L, 1L), (3L, 2L, 10L), (4L, 3L, 7L))
      .toDF("eid", "uid", "et").createOrReplaceTempView("asof_l")
    Seq((1L, 3L, "a"), (1L, 5L, "b"), (1L, 9L, "c"), (2L, 20L, "d"))
      .toDF("ruid", "rt", "pay").createOrReplaceTempView("asof_r")
  }

  // ---- the pure rewrite ----

  test("rewrite: ASOF LEFT JOIN brands the ON condition and drops the keyword") {
    val got = AsofSqlRewrite(
      "SELECT * FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t ORDER BY 1")
    assert("""(?i)(?<![_a-z0-9])ASOF(?![_a-z0-9])""".r.findFirstIn(got).isEmpty, got)
    assert(got.contains("LEFT JOIN r ON graft_asof_marker() AND ("), got)
    assert(got.contains("l.t >= r.t ) ORDER BY 1"), got)
  }

  test("rewrite: statements without ASOF come back byte-identical") {
    val q = "SELECT 'ASOF JOIN inside a string literal', asof_col FROM t -- ASOF JOIN comment"
    assert(AsofSqlRewrite(q) eq q) // the identifier/string/comment hits must not edit
    val plain = "SELECT a FROM t JOIN u ON t.k = u.k WHERE a > 1"
    assert(AsofSqlRewrite(plain) eq plain)
  }

  test("rewrite: subquery right side, trailing WHERE, and two ASOF joins") {
    val got = AsofSqlRewrite(
      "SELECT * FROM a ASOF JOIN (SELECT k, t FROM x WHERE x.on_col = 1) s " +
        "ON a.k = s.k AND a.t >= s.t ASOF LEFT JOIN r ON a.k = r.k AND a.t <= r.t WHERE a.id < 5")
    assert(got.count(_ == '(') === got.count(_ == ')'), got)
    assert("graft_asof_marker".r.findAllIn(got).size === 2, got)
    assert(got.contains(") WHERE a.id < 5"), got)
    assert(!"""(?i)\bASOF\b""".r.findFirstIn(got).isDefined, got)
  }

  test("rewrite: string lexing follows the active literal mode") {
    // DEFAULT mode (backslash escapes): \' stays inside the literal, so
    // the words "asof left join" are string CONTENT, not grammar
    val q1 = """SELECT 'it\'s an asof left join on x >= y' AS s FROM t"""
    assert(AsofSqlRewrite(q1, backslashEscapes = true) eq q1)
    // ANSI mode (escapedStringLiterals=true): the backslash is an
    // ordinary char, the literal ends at the next quote, and the real
    // ASOF JOIN after it MUST still be rewritten
    val q2 = """SELECT 'dir\' AS s FROM t ASOF JOIN u ON t.k = u.k AND t.a >= u.a"""
    val got = AsofSqlRewrite(q2, backslashEscapes = false)
    assert(got.contains("graft_asof_marker"), got)
    // ...and under the WRONG convention the string would swallow the
    // join — which is exactly why the parser passes the session's mode
    assert(AsofSqlRewrite(q2, backslashEscapes = true) eq q2)
  }

  test("rewrite: a quoted `asof` alias is never the keyword; unquoted is, loudly") {
    // quoted identifiers are never lexed as keywords — untouched
    val quoted = "SELECT * FROM t `asof` JOIN u ON t.k = u.k"
    assert(AsofSqlRewrite(quoted) eq quoted)
    // the UNQUOTED contextual-keyword ambiguity is DuckDB's too: the
    // alias reads as ASOF, and a plain equi-condition then fails LOUDLY
    // in the resolution rule (no inequality) rather than silently
    // changing join semantics
    val unquoted = AsofSqlRewrite("SELECT * FROM t asof JOIN u ON t.k = u.k")
    assert(unquoted.contains("graft_asof_marker"), unquoted)
  }

  test("rewrite: unsupported shapes fail loudly") {
    for ((q, frag) <- Seq(
      "SELECT * FROM a ASOF JOIN b USING (k)" -> "ON condition",
      "SELECT * FROM a ASOF JOIN b" -> "ON condition",
      "SELECT * FROM a ASOF JOIN b JOIN c ON b.k = c.k ON a.k = b.k AND a.t >= b.t"
        -> "parenthesize the right side",
      // a mistyped DIRECTION must not silently demote ASOF to an alias
      // and return every inequality match — LEFT/INNER only, loudly
      "SELECT * FROM a ASOF RIGHT JOIN b ON a.k = b.k AND a.t >= b.t"
        -> "LEFT and INNER only",
      "SELECT * FROM a ASOF FULL OUTER JOIN b ON a.k = b.k AND a.t >= b.t"
        -> "LEFT and INNER only")) {
      val e = intercept[IllegalArgumentException](AsofSqlRewrite(q))
      assert(e.getMessage.contains(frag), s"$q → ${e.getMessage}")
    }
  }

  test("rewrite: ASOF in non-join positions is an ordinary identifier") {
    // the keyword treatment requires the following tokens to actually
    // form [LEFT [OUTER] | INNER] JOIN; everywhere else `asof` is a
    // name, exactly as DuckDB accepts it in expression positions.
    // (`a asof RIGHT JOIN b` is deliberately NOT in this list: an
    // unquoted asof directly before RIGHT/FULL JOIN reads as a mistyped
    // ASOF direction and fails loudly — a quoted `asof` alias opts out.)
    for (q <- Seq(
      "SELECT asof FROM t",                              // column named asof
      "SELECT * FROM a ASOF",                            // trailing alias
      "SELECT * FROM t asof WHERE asof.x > 1",           // alias + qualifier
      "SELECT * FROM a `asof` RIGHT JOIN b ON b.k = 1",  // quoted alias opts out
      "SELECT a.asof FROM a ORDER BY asof"))             // qualified + order by
      assert(AsofSqlRewrite(q) eq q, q)
  }

  test("ASOF as a live column name still parses and answers through spark.sql") {
    import spark.implicits._
    Seq((1, 10), (2, 20)).toDF("asof", "v").createOrReplaceTempView("asof_ident")
    val got = spark.sql("SELECT asof, v FROM asof_ident t WHERE t.asof > 1 ORDER BY asof")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toList
    assert(got === List((2, 20)))
  }

  test("multi-key packed struct: a NULL key component matches nothing (SQL equality)") {
    import spark.implicits._
    // (1, NULL) on both sides: interpreted struct ordering alone would
    // call these EQUAL and match them — SQL equality says neither row
    // joins; the packed key must null out and take the null-key path
    Seq((Some(1L), Option.empty[Long], 100L, "ln"),
        (Some(1L), Some(2L), 100L, "lk"))
      .toDF("a1", "a2", "lt", "tag").createOrReplaceTempView("asof_nl")
    Seq((Some(1L), Option.empty[Long], 90L, "rn"),
        (Some(1L), Some(2L), 90L, "rk"))
      .toDF("b1", "b2", "rt", "pay").createOrReplaceTempView("asof_nr")
    val left = sql("""SELECT tag, pay FROM asof_nl ASOF LEFT JOIN asof_nr
                     | ON a1 = b1 AND a2 = b2 AND lt >= rt ORDER BY tag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(left === List(("lk", "rk"), ("ln", null)),
      "NULL-component key must not match the NULL-component right row")
    // inner: the null-key left row must drop entirely
    val inner = sql("""SELECT tag, pay FROM asof_nl ASOF JOIN asof_nr
                      | ON a1 = b1 AND a2 = b2 AND lt >= rt ORDER BY tag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(inner === List(("lk", "rk")))
    // ...and the same condition through a plain equi-join agrees on who matches
    val plain = sql("""SELECT tag, pay FROM asof_nl JOIN asof_nr
                      | ON a1 = b1 AND a2 = b2 AND lt >= rt ORDER BY tag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    assert(plain === List(("lk", "rk")))
  }

  // ---- end-to-end through spark.sql ----

  test("ASOF LEFT JOIN == native GraftPlans.asofJoin; plans the custom exec") {
    views()
    val df = sql("""SELECT eid, pay FROM asof_l ASOF LEFT JOIN asof_r
                   | ON uid = ruid AND et >= rt ORDER BY eid""".stripMargin)
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsofJoin"), phys)
    assert(!phys.contains("SortMergeJoin") && !phys.contains("Window"), phys)
    val got = df.collect().map(r => r.getLong(0) -> r.getString(1)).toList
    // uid=1: et=5 → rt=5 tie wins ("b"); et=1 → none; uid=2: et=10 → no rt<=10
    // for ruid=2 (rt=20) → null; uid=3 → no key
    assert(got === List(1L -> "b", 2L -> null, 3L -> null, 4L -> null))
    val native = GraftPlans.asofJoin(
      spark.table("asof_l"), spark.table("asof_r"), "uid", "ruid", "et", "rt")
      .select(col("eid"), col("pay")).orderBy("eid")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toList
    assert(got === native)
  }

  test("forward direction (<=): earliest right row at-or-after, ties match") {
    views()
    val got = sql("""SELECT eid, pay FROM asof_l ASOF LEFT JOIN asof_r
                    | ON uid = ruid AND et <= rt ORDER BY eid""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toList
    // uid=1 et=5 → rt=5 tie ("b") beats rt=9; et=1 → rt=3 ("a");
    // uid=2 et=10 → rt=20 ("d"); uid=3 → null
    assert(got === List(1L -> "b", 2L -> "a", 3L -> "d", 4L -> null))
  }

  test("inner ASOF JOIN drops unmatched left rows") {
    views()
    val got = sql("""SELECT eid, pay FROM asof_l ASOF JOIN asof_r
                    | ON uid = ruid AND et >= rt ORDER BY eid""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toList
    assert(got === List(1L -> "b"))
  }

  test("reversed spelling and coercion: r.date <= l.ts is still backward") {
    import spark.implicits._
    Seq((1L, "2024-03-05 00:00:00"), (2L, "2024-01-01 00:00:00"))
      .toDF("id", "ts_s").selectExpr("id", "CAST(ts_s AS TIMESTAMP) AS ts")
      .createOrReplaceTempView("asof_tl")
    Seq((1L, "2024-03-01"), (1L, "2024-03-04"), (1L, "2024-06-01"))
      .toDF("rid", "d_s").selectExpr("rid", "CAST(d_s AS DATE) AS d")
      .createOrReplaceTempView("asof_tr")
    // DATE vs TIMESTAMP forces analyzer coercion (a Cast around d) —
    // the rule materializes it as a projected column; reversed operand
    // order must mean the same backward join
    val got = sql("""SELECT id, d FROM asof_tl ASOF LEFT JOIN asof_tr
                    | ON rid = id AND d <= ts ORDER BY id""".stripMargin)
      .collect().map(r => r.getLong(0) -> String.valueOf(r.get(1))).toList
    assert(got === List(1L -> "2024-03-04", 2L -> "null"))
  }

  test("multi-key equality packs a struct key; zero-key degrades to one group") {
    import spark.implicits._
    Seq((1L, 10L, 100L, "x1"), (1L, 20L, 50L, "x2"))
      .toDF("a1", "a2", "lt", "tag").createOrReplaceTempView("asof_ml")
    Seq((1L, 10L, 90L, "p"), (1L, 20L, 60L, "q"), (1L, 20L, 10L, "r"))
      .toDF("b1", "b2", "rt", "pay").createOrReplaceTempView("asof_mr")
    val two = sql("""SELECT tag, pay FROM asof_ml ASOF LEFT JOIN asof_mr
                    | ON a1 = b1 AND a2 = b2 AND lt >= rt ORDER BY tag""".stripMargin)
    assert(two.queryExecution.executedPlan.toString.contains("AsofJoin"))
    assert(two.collect().map(r => (r.getString(0), r.getString(1))).toList ===
      List(("x1", "p"), ("x2", "r")))
    val zero = sql("""SELECT tag, pay FROM asof_ml ASOF LEFT JOIN asof_mr
                     | ON lt >= rt ORDER BY tag""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1))).toList
    // one global group: x1 (lt=100) → latest rt<=100 is 90 ("p");
    // x2 (lt=50) → rt=10 ("r")
    assert(zero === List(("x1", "p"), ("x2", "r")))
  }

  test("strict comparators exclude the tie row in both directions") {
    views()
    // backward strict: uid=1 et=5 skips the rt=5 tie and takes rt=3
    val back = sql("""SELECT eid, pay FROM asof_l ASOF LEFT JOIN asof_r
                     | ON uid = ruid AND et > rt ORDER BY eid""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toList
    assert(back === List(1L -> "a", 2L -> null, 3L -> null, 4L -> null))
    // forward strict: uid=1 et=5 skips the rt=5 tie and takes rt=9
    val fwd = sql("""SELECT eid, pay FROM asof_l ASOF LEFT JOIN asof_r
                    | ON uid = ruid AND et < rt ORDER BY eid""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toList
    assert(fwd === List(1L -> "c", 2L -> "a", 3L -> "d", 4L -> null))
  }

  test("a stray marker call gets the real explanation, not an Unevaluable error") {
    val e = intercept[Throwable](spark.sql("SELECT graft_asof_marker() AS m").collect())
    def msgs(t: Throwable): List[String] =
      if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
    assert(msgs(e).exists(_.contains("internal to ASOF JOIN rewriting")), msgs(e))
  }

  test("shapes the operator cannot mean fail analysis loudly") {
    views()
    for ((q, frag) <- Seq(
      ("SELECT * FROM asof_l ASOF LEFT JOIN asof_r ON uid = ruid AND et >= rt AND et <= rt",
        "more than one inequality"),
      ("SELECT * FROM asof_l ASOF LEFT JOIN asof_r ON uid = ruid",
        "inequality found"),
      ("SELECT * FROM asof_l ASOF LEFT JOIN asof_r ON uid = ruid OR et >= rt",
        "unsupported conjunct"))) {
      val e = intercept[Throwable](sql(q).queryExecution.analyzed)
      def msgs(t: Throwable): List[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) :: msgs(t.getCause)
      assert(msgs(e).exists(_.contains(frag)), s"$q → ${msgs(e)}")
    }
  }

  test("parameterized spark.sql keeps its bindings through the wrapper") {
    // the ParserInterface DEFAULT for parsePlanWithParameters drops the
    // ParameterContext (it falls back to parsePlan) — a wrapper leaning
    // on it would silently break spark.sql(text, args); the override
    // must delegate with the context intact, rewrite applied
    val plain = spark.sql("SELECT :a + 1 AS v", Map("a" -> 41))
      .collect()(0).getInt(0)
    assert(plain === 42)
    views()
    val rows = spark.sql(
      """SELECT eid, pay FROM asof_l ASOF LEFT JOIN asof_r
        | ON uid = ruid AND et >= rt WHERE eid <= :maxid ORDER BY eid""".stripMargin,
      Map("maxid" -> 2))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toList
    assert(rows === List(1L -> "b", 2L -> null))
  }

  test("GraftPlans.asofJoin forward/strict flags match the SQL grammar") {
    views()
    def api(forward: Boolean, strict: Boolean) = GraftPlans.asofJoin(
        spark.table("asof_l"), spark.table("asof_r"),
        "uid", "ruid", "et", "rt", forward = forward, strict = strict)
      .select(col("eid"), col("pay")).orderBy("eid")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toList
    def viaSql(op: String) = sql(
      s"""SELECT eid, pay FROM asof_l ASOF LEFT JOIN asof_r
         | ON uid = ruid AND et $op rt ORDER BY eid""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toList
    assert(api(forward = false, strict = false) === viaSql(">="))
    assert(api(forward = true, strict = false) === viaSql("<="))
    assert(api(forward = false, strict = true) === viaSql(">"))
    assert(api(forward = true, strict = true) === viaSql("<"))
  }

  test("q206 (SQL grammar) equals the q36 DataFrame plan on real data") {
    val sf = "/root/testdata/sf0.001"
    val viaSql = RelationalQueries.asofSqlGrammar(spark, sf).collect().toSeq
    val viaApi = RelationalQueries.asofJoin(spark, sf).collect().toSeq
    assert(viaSql === viaApi)
  }
}
