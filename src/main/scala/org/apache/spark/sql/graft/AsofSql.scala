package org.apache.spark.sql.graft

import scala.collection.mutable.ListBuffer

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, BinaryComparison, CreateNamedStruct, EqualTo, Expression, ExpressionInfo, GreaterThan, GreaterThanOrEqual, If, IsNotNull, IsNull, LeafExpression, LessThan, LessThanOrEqual, Literal, NamedExpression, Or, SubqueryExpression, Unevaluable}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}

/** ASOF JOIN *grammar* for Spark SQL — the missing front-end over the
  * engine's native as-of operator (AsofJoinNode/AsofJoinExec).
  *
  * DuckDB (and the reference's analysts) write
  * `FROM events e ASOF LEFT JOIN r ON e.user_id = r.user_id AND e.ts >= r.o_orderdate`
  * (reference README.md:1 query surface); Spark's ANTLR grammar has no
  * ASOF join type, so until now those statements were the engine's only
  * SQL-dialect skips. This closes them with the last unused
  * SparkSessionExtensions injection point, `injectParser`:
  *
  *  1. [[AsofSqlParser]] wraps the session parser. A light lexer (string
  *     / identifier / comment aware, paren-depth tracked) removes the
  *     `ASOF` keyword and brands the join's ON condition with
  *     `graft_asof_marker() AND ( ... )`, then DELEGATES to Spark's own
  *     parser — no grammar fork, every other statement byte-identical.
  *  2. [[AsofMarker]] is the brand: an unevaluable boolean leaf that
  *     resolves through the injected function registry and survives into
  *     the analyzed join condition.
  *  3. [[AsofJoinResolution]] (a resolution rule) finds the branded,
  *     fully-resolved Join, decomposes the conjunction into equi-keys +
  *     exactly one time inequality (all four DuckDB comparators), and
  *     swaps the Join for the native AsofJoinNode — one merge pass over
  *     co-partitioned sorted children instead of the O(matches-per-key)
  *     range join a plain inequality join would plan. Direction comes
  *     from the inequality (left >= right → latest-at-or-before; left
  *     <= right → earliest-at-or-after; strict < / > exclude the tie
  *     row), INNER drops unmatched left rows via an IsNotNull filter on
  *     the matched right time (never null on a match by construction —
  *     the merge skips null-time right rows). [[AsofMarkerCheck]] turns
  *     any marker that escapes (a direct call outside a join) into the
  *     real explanation.
  *
  * 100 TB shape: identical to the hand-built as-of path — both sides
  * hash-cluster on the key (EnsureRequirements co-partitions exactly as
  * for a sort-merge join) and stream once; per-partition state is one
  * buffered row. The SQL surface adds zero execution cost; it is parse-
  * time rewriting plus an analysis-time plan swap.
  */
case class AsofMarker() extends LeafExpression with Unevaluable {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
}

object AsofMarker {
  val name = "graft_asof_marker"
  val registration: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[AsofMarker].getName, name),
      (args: Seq[Expression]) => {
        require(args.isEmpty, s"$name takes no arguments")
        AsofMarker()
      })
}

/** Pure text → text rewrite of ASOF join grammar onto stock Spark SQL.
  * Unsupported shapes fail loudly with the reason; statements without a
  * top-level ASOF keyword are returned unchanged (one indexOf probe).
  *
  * Known ambiguity, identical to DuckDB's: `ASOF` is contextual, so an
  * UNQUOTED table alias named `asof` directly before JOIN
  * (`FROM t asof JOIN u ON ...`) reads as the join keyword — the
  * failure is loud, not silent (a plain equi-condition then has no
  * as-of inequality and the resolution rule rejects it by name), and a
  * quoted alias (`` `asof` ``) opts out entirely because quoted
  * identifiers are never lexed as keywords. DuckDB documents the same
  * restriction for the same reason.
  */
object AsofSqlRewrite {

  private case class Tok(up: String, start: Int, end: Int, depth: Int)

  /** Keywords that can only FOLLOW a join condition at the join's own
    * paren depth — the end-of-ON-expression sentinels. */
  private val terminators = Set(
    "JOIN", "INNER", "LEFT", "RIGHT", "FULL", "CROSS", "SEMI", "ANTI",
    "NATURAL", "ASOF", "LATERAL", "WHERE", "GROUP", "HAVING", "WINDOW",
    "ORDER", "LIMIT", "OFFSET", "FETCH", "UNION", "INTERSECT", "EXCEPT",
    "QUALIFY", "CLUSTER", "DISTRIBUTE", "SORT")

  /** `backslashEscapes`: whether `\'` inside a string literal escapes
    * the quote — true under Spark's DEFAULT literal mode, false under
    * `spark.sql.parser.escapedStringLiterals=true` (ANSI mode, where
    * `''` is the only escape and a backslash is an ordinary char).
    * The parser wrapper passes the session's ACTIVE mode: lexing with
    * the wrong convention could mis-bound a literal and let string
    * CONTENT (e.g. "... asof join ...") masquerade as grammar. */
  def apply(sql: String, backslashEscapes: Boolean = true): String = {
    // fast path: no ASOF word anywhere (case-insensitive)
    if (!sql.toUpperCase(java.util.Locale.ROOT).contains("ASOF")) return sql
    val toks = lex(sql, backslashEscapes)
    // edits as (position, remove-through-position, insertion)
    val edits = ListBuffer[(Int, Int, String)]()
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      if (t.up == "ASOF") {
        // contextual keyword: ASOF is the join keyword ONLY when the
        // tokens after it actually form [LEFT [OUTER] | INNER] JOIN.
        // Any other continuation (SELECT asof FROM t, FROM t asof
        // WHERE ..., `asof RIGHT JOIN` = alias + right join) leaves
        // the identifier untouched — DuckDB accepts `asof` in
        // expression positions for the same reason. The one genuine
        // ambiguity — an unquoted alias `asof` DIRECTLY before JOIN —
        // reads as the keyword and fails loudly in the resolution
        // rule; a quoted alias (`` `asof` ``) opts out entirely.
        var j = i + 1
        def up(n: Int): String = if (n < toks.length) toks(n).up else ""
        up(j) match {
          case "LEFT" =>
            j += 1
            if (up(j) == "OUTER") j += 1
          case "INNER" => j += 1
          // a mistyped join DIRECTION must stay a loud error: silently
          // reading `a ASOF RIGHT JOIN b` as alias `asof` + plain RIGHT
          // JOIN would return every inequality match instead of the
          // latest row. An alias literally named asof directly before a
          // right join is far rarer than the typo — and a quoted alias
          // still opts out.
          case "RIGHT" | "FULL" =>
            var n = j + 1
            if (up(n) == "OUTER") n += 1
            if (up(n) == "JOIN") fail(sql, t.start,
              s"ASOF ${up(j)} JOIN is not supported — ASOF supports LEFT " +
                "and INNER only (quote the alias as `asof` if a right/full " +
                "join off an asof alias is really intended)")
          case _ =>
        }
        if (up(j) != "JOIN") { i += 1 }
        else {
        val d0 = t.depth
        // drop the ASOF keyword itself
        edits += ((t.start, t.end, ""))
        // locate this join's ON at the join's own depth (the right
        // relation may be a parenthesized subquery — deeper, skipped)
        var k = j + 1
        var on = -1
        while (on < 0 && k < toks.length) {
          val tk = toks(k)
          if (tk.depth < d0) k = toks.length // left the join's scope
          else if (tk.depth == d0 && tk.up == "JOIN") fail(sql, tk.start,
            // Spark's own grammar also rejects the un-parenthesized
            // nested form (a join's right side is a relationPrimary) —
            // branding the INNER join's ON would only produce a parse
            // error pointing nowhere near the cause, so name it here
            "un-parenthesized nested join on the right side of ASOF JOIN" +
              " — parenthesize the right side")
          else if (tk.depth == d0 && tk.up == "USING") fail(sql, tk.start,
            "ASOF JOIN requires an ON condition (USING cannot name the inequality)")
          else if (tk.depth == d0 && tk.up == "ON") on = k
          else k += 1
        }
        if (on < 0) fail(sql, t.start, "ASOF JOIN requires an ON condition")
        edits += ((toks(on).end, toks(on).end, s" ${AsofMarker.name}() AND ("))
        // end of the ON expression: first terminator / comma at the
        // join's depth, or the paren that closes an enclosing scope
        var m = on + 1
        var endPos = sql.length
        while (m < toks.length && endPos == sql.length) {
          val tm = toks(m)
          if (tm.depth < d0 ||
              (tm.depth == d0 && (tm.up == "," || terminators(tm.up))))
            endPos = tm.start
          else m += 1
        }
        edits += ((endPos, endPos, ") "))
        // advance one token only: a subquery between this ASOF and its
        // ON may itself contain an ASOF join that still needs branding
        i += 1
        }
      } else i += 1
    }
    if (edits.isEmpty) return sql
    val sb = new java.lang.StringBuilder(sql.length + 64 * edits.length)
    var pos = 0
    for ((from, to, ins) <- edits.sortBy(_._1)) {
      sb.append(sql, pos, from).append(ins)
      pos = to
    }
    sb.append(sql, pos, sql.length)
    sb.toString
  }

  private def fail(sql: String, pos: Int, msg: String): Nothing =
    throw new IllegalArgumentException(
      s"$msg (near position $pos in: ${sql.slice(pos, pos + 60)}...)")

  /** Word/paren/comma tokens with paren depth; strings ('', "", ``,
    * each with doubled-quote escapes, plus backslash escapes in '/"
    * when the session's literal mode has them), line comments and
    * NESTED block comments (Spark supports nesting) contribute no
    * tokens. A '(' token carries the depth OUTSIDE it; a ')' token the
    * depth after closing — so "depth < joinDepth" on a ')' means it
    * closes an enclosing scope. */
  private def lex(sql: String, backslashEscapes: Boolean): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    var depth = 0
    var i = 0
    val n = sql.length
    def isWordStart(c: Char) = c.isLetter || c == '_'
    def isWordPart(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = sql.charAt(i)
      c match {
        case '\'' | '"' | '`' =>
          i += 1
          var open = true
          while (open && i < n) {
            if (backslashEscapes && c != '`' && sql.charAt(i) == '\\') i += 2
            else if (sql.charAt(i) == c) {
              if (i + 1 < n && sql.charAt(i + 1) == c) i += 2 // doubled escape
              else { open = false; i += 1 }
            } else i += 1
          }
        case '-' if i + 1 < n && sql.charAt(i + 1) == '-' =>
          while (i < n && sql.charAt(i) != '\n') i += 1
        case '/' if i + 1 < n && sql.charAt(i + 1) == '*' =>
          var nest = 1
          i += 2
          while (nest > 0 && i < n) {
            if (i + 1 < n && sql.charAt(i) == '/' && sql.charAt(i + 1) == '*') { nest += 1; i += 2 }
            else if (i + 1 < n && sql.charAt(i) == '*' && sql.charAt(i + 1) == '/') { nest -= 1; i += 2 }
            else i += 1
          }
        case '(' =>
          out += Tok("(", i, i + 1, depth); depth += 1; i += 1
        case ')' =>
          depth -= 1; out += Tok(")", i, i + 1, depth); i += 1
        case ',' =>
          out += Tok(",", i, i + 1, depth); i += 1
        case w if isWordStart(w) =>
          val s = i
          while (i < n && isWordPart(sql.charAt(i))) i += 1
          out += Tok(sql.substring(s, i).toUpperCase(java.util.Locale.ROOT), s, i, depth)
        case _ => i += 1
      }
    }
    out.result()
  }
}

/** Session parser wrapper: ASOF rewrite on statement entry points,
  * byte-for-byte delegation everywhere else. The active literal mode
  * comes from the thread's SQLConf at PARSE time (the same source the
  * delegate parser reads it from), so the rewrite's string lexing can
  * never disagree with the parser about where a literal ends. */
class AsofSqlParser(delegate: ParserInterface) extends ParserInterface {
  private def rewrite(sqlText: String): String = AsofSqlRewrite(sqlText,
    backslashEscapes =
      !org.apache.spark.sql.internal.SQLConf.get.escapedStringLiterals)
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(rewrite(sqlText))
  // MUST override: the interface default calls this.parsePlan and
  // silently DROPS the ParameterContext — spark.sql(text, args) would
  // lose its named/positional bindings through a wrapper that leans on
  // the default. Delegate with the context intact.
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(rewrite(sqlText), ctx)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
}

/** Swaps a marker-branded, fully resolved Join for the native as-of
  * plan. Runs inside the Resolution fixed point: it waits until type
  * coercion has equalized the comparison sides (j.resolved), preserves
  * the join's exact output attribute list (parent operators resolve
  * against the same exprIds), and removes the marker — so it fires
  * exactly once per branded join. */
case class AsofJoinResolution() extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsUp {
    case j @ Join(_, _, _, Some(cond), _)
        if j.resolved && cond.exists(_.isInstanceOf[AsofMarker]) =>
      rewrite(j)
  }

  private def bad(msg: String): Nothing = throw new IllegalArgumentException(
    s"ASOF JOIN: $msg (the condition must be a conjunction of " +
      "equalities plus exactly ONE >= / <= / > / < inequality between the two sides)")

  private def split(e: Expression): Seq[Expression] = e match {
    case And(a, b) => split(a) ++ split(b)
    case x => Seq(x)
  }

  private def rewrite(j: Join): LogicalPlan = {
    val Join(l, r, jt, Some(cond), _) = j: @unchecked
    if (jt != Inner && jt != LeftOuter)
      bad(s"supports INNER and LEFT OUTER, got $jt")
    val conjs = split(cond).filterNot(_.isInstanceOf[AsofMarker])
    conjs.foreach { c =>
      if (!c.deterministic || c.exists(_.isInstanceOf[SubqueryExpression]))
        bad(s"non-deterministic or subquery conjunct: ${c.sql}")
    }
    // which side does an expression read? (None: neither purely)
    def side(e: Expression): Option[Boolean] =
      if (e.references.isEmpty) None
      else if (e.references.subsetOf(l.outputSet)) Some(true)
      else if (e.references.subsetOf(r.outputSet)) Some(false)
      else None

    val keys = ListBuffer[(Expression, Expression)]() // (left, right)
    // (leftTime, rightTime, forward, strict)
    var ineq: Option[(Expression, Expression, Boolean, Boolean)] = None
    def setIneq(lt: Expression, rt: Expression, forward: Boolean, strict: Boolean): Unit = {
      if (ineq.isDefined) bad("more than one inequality")
      ineq = Some((lt, rt, forward, strict))
    }
    conjs.foreach {
      case EqualTo(a, b) => (side(a), side(b)) match {
        case (Some(true), Some(false)) => keys += ((a, b))
        case (Some(false), Some(true)) => keys += ((b, a))
        case _ => bad(s"equality does not compare the two sides: ${EqualTo(a, b).sql}")
      }
      case c: BinaryComparison if c.isInstanceOf[GreaterThanOrEqual] ||
          c.isInstanceOf[LessThanOrEqual] || c.isInstanceOf[GreaterThan] ||
          c.isInstanceOf[LessThan] =>
        // the ">" family reads "latest at-or-before" (backward) when the
        // LEFT side's time is on the left of the operator; the "<"
        // family the reverse; strict (< / >) excludes the tie row, like
        // DuckDB's four ASOF comparators. Reversed spellings flip the
        // direction, never the meaning.
        val gtFamily = c.isInstanceOf[GreaterThanOrEqual] || c.isInstanceOf[GreaterThan]
        val strict = c.isInstanceOf[GreaterThan] || c.isInstanceOf[LessThan]
        (side(c.left), side(c.right)) match {
          case (Some(true), Some(false)) => setIneq(c.left, c.right, forward = !gtFamily, strict)
          case (Some(false), Some(true)) => setIneq(c.right, c.left, forward = gtFamily, strict)
          case _ => bad(s"inequality does not compare the two sides: ${c.sql}")
        }
      case other => bad(s"unsupported conjunct ${other.sql}")
    }
    val (ltE, rtE, forward, strict) = ineq.getOrElse(bad("no >= / <= / > / < inequality found"))

    // single-attribute keys pass through; multi-key packs both sides
    // into an identical named struct (hash + interpreted ordering both
    // work on structs, so the exec is unchanged); no equality at all
    // degrades to a constant key — a documented single-group merge
    val (lkE, rkE) = keys.toList match {
      case Nil => (Literal(1), Literal(1))
      case (a, b) :: Nil => (a, b)
      case many =>
        // SQL equality semantics for packed keys: a NULL in ANY key
        // component matches nothing, but the interpreted struct
        // ordering the exec compares with treats NULL components as
        // EQUAL — so (1, NULL) would silently match (1, NULL). Null
        // out the whole packed struct when any component is null; the
        // exec's null-key skip (the same path the single-key join
        // takes) then excludes the row on either side.
        def pack(es: Seq[Expression]): Expression = {
          val s = CreateNamedStruct(
            es.zipWithIndex.flatMap { case (e, ix) => Seq(Literal(s"k$ix"), e) })
          val anyNull = es.map(IsNull(_): Expression).reduce(Or(_, _))
          If(anyNull, Literal.create(null, s.dataType), s)
        }
        (pack(many.map(_._1)), pack(many.map(_._2)))
    }

    // materialize non-attribute sides (casts from type coercion, struct
    // packs, constant keys) as projected columns on their own child
    def mat(child: LogicalPlan, exprs: Seq[(Expression, String)])
        : (LogicalPlan, Seq[Attribute]) = {
      val named = exprs.map {
        case (a: Attribute, _) => (None, a)
        case (e, n) => val al = Alias(e, n)(); (Some(al), al.toAttribute)
      }
      val aliases = named.collect { case (Some(al), _) => al }
      val plan = if (aliases.isEmpty) child
        else Project(child.output ++ (aliases: Seq[NamedExpression]), child)
      (plan, named.map(_._2))
    }
    val (l2, lAttrs) = mat(l, Seq(lkE -> "graft_asof_lk", ltE -> "graft_asof_lt"))
    val (r2, rAttrs) = mat(r, Seq(rkE -> "graft_asof_rk", rtE -> "graft_asof_rt"))
    val (Seq(lk, lt), Seq(rk, rt)) = (lAttrs, rAttrs): @unchecked
    // sameType (nullability-blind): packed-struct keys embed each
    // component's nullability in the struct type, and the two sides
    // may legitimately differ there (values compare identically)
    if (!lk.dataType.sameType(rk.dataType) || !lt.dataType.sameType(rt.dataType))
      bad(s"key/time types differ after coercion: " +
        s"${lk.dataType}/${rk.dataType}, ${lt.dataType}/${rt.dataType}")

    val node = AsofJoinNode(l2, r2, lk, rk, lt, rt, forward, strict)
    val base = if (jt == Inner) {
      // a matched row always carries a non-null right time (the merge
      // skips null-time right rows), so this drops exactly the
      // unmatched left rows — DuckDB's inner ASOF
      val rtOut = node.output.find(_.exprId == rt.exprId).get
      Filter(IsNotNull(rtOut), node)
    } else node
    // restore the Join's exact output (drops materialized helper cols;
    // exprIds are preserved so parent resolution is untouched)
    Project(j.output, base)
  }
}

/** Post-analysis check: the marker is internal plumbing between the
  * rewriter and the resolution rule — if one survives analysis (a user
  * called graft_asof_marker() directly, or branded a condition shape
  * the rule refuses outside a join), fail with the real explanation
  * instead of the opaque Unevaluable error it would hit at planning. */
case class AsofMarkerCheck() extends (LogicalPlan => Unit) {
  override def apply(plan: LogicalPlan): Unit = plan.foreach { node =>
    node.expressions.foreach { e =>
      if (e.exists(_.isInstanceOf[AsofMarker]))
        throw new IllegalArgumentException(
          "graft_asof_marker() is internal to ASOF JOIN rewriting and cannot " +
            "appear outside a join condition the as-of rule can decompose — " +
            "write `left ASOF [LEFT] JOIN right ON <equalities> AND " +
            "<one time inequality>` instead of calling the marker directly")
    }
  }
}
