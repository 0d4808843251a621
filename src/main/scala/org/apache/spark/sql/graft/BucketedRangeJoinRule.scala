package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: plans a point-in-interval INNER join with no
  * equi-join keys as a bucketed equi-join instead of the nested-loop
  * cross product Spark would otherwise produce.
  *
  * A condition of the shape `p >= lo AND p <= hi` (strict variants and
  * flipped operand orders accepted; `p` from one side, `lo`/`hi` from
  * the other, all LongType and deterministic) has no equi key, so
  * Spark's only strategies are broadcast/cartesian nested-loop — O(n·m)
  * comparisons and, at 100 TB, an unrunnable plan. But bucketing by a
  * fixed width w is monotone: p ∈ [lo, hi] implies
  * floor(p/w) ∈ [floor(lo/w), floor(hi/w)]. So the join can run as an
  * equi-join on the bucket id — the interval side exploded to the
  * buckets it spans, the point side tagged with its single bucket —
  * with the ORIGINAL predicate re-applied as a post-join filter
  * (the bucket join is a strict superset, so the rewrite is exact
  * regardless of bound strictness). This is q37's hand-written shape
  * (RelationalQueries.rangeJoinBucketed), derived automatically.
  *
  * Opt-in by setting `spark.graft.rangeJoin.bucketWidth` (in the
  * point column's units) — width choice is a data statement: intervals
  * should span few buckets, which the optimizer cannot know statically.
  * Choosing a width far below the interval span makes the per-row
  * bucket Sequence huge; past ~2^31 elements Spark's Sequence fails
  * the query with its array-size-limit error — if that happens, the
  * width is the knob to raise.
  * The rule runs inside the operator-optimization fixed point and is
  * self-stabilizing: its own output contains an equi condition, which
  * the eligibility check rejects.
  */
case class BucketedRangeJoinRule() extends Rule[LogicalPlan] with PredicateHelper {

  import BucketedRangeJoinRule.WIDTH_KEY

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val raw = conf.getConfString(WIDTH_KEY, "0")
    // this rule runs for EVERY query in the session once the conf is
    // set — a malformed value must fail naming the key, not as a bare
    // NumberFormatException from deep inside the optimizer
    val width = scala.util.Try(raw.toLong).getOrElse(
      throw new IllegalArgumentException(
        s"$WIDTH_KEY must be a Long (point-column units), got '$raw'"))
    if (width <= 0) plan
    else plan.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rewrite(j, left, right, cond, width).getOrElse(j)
    }
  }

  /** A conjunct's possible bound readings: (point, bound,
    * pointIsFromLeft, isLowerBound). Every comparison admits two — in
    * `a >= b`, a is a point lower-bounded by b AND b is a point
    * upper-bounded by a; which reading is right emerges when a lower
    * and an upper bound pair up on the same point expression. */
  private def boundsOf(e: Expression, left: LogicalPlan,
      right: LogicalPlan): Seq[(Expression, Expression, Boolean, Boolean)] = {
    def mk(p: Expression, b: Expression, lower: Boolean) = {
      val ok = (x: Expression) => x.deterministic && x.dataType == LongType
      if (!ok(p) || !ok(b)) None
      else if (p.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet))
        Some((p, b, true, lower))
      else if (p.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
        Some((p, b, false, lower))
      else None
    }
    e match {
      case GreaterThanOrEqual(a, b) => mk(a, b, lower = true).toSeq ++ mk(b, a, lower = false)
      case GreaterThan(a, b) => mk(a, b, lower = true).toSeq ++ mk(b, a, lower = false)
      case LessThanOrEqual(a, b) => mk(a, b, lower = false).toSeq ++ mk(b, a, lower = true)
      case LessThan(a, b) => mk(a, b, lower = false).toSeq ++ mk(b, a, lower = true)
      case _ => Nil
    }
  }

  private[graft] def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
      cond: Expression, width: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(cond)
    // an equi condition between the sides means Spark already has a
    // shuffle key (and also marks our own rewritten joins)
    // both sides must actually REFERENCE their side: a literal's empty
    // reference set is a subset of every outputSet, so without the
    // nonEmpty guards an attribute-vs-literal equality (cat = 'x',
    // present pre-pushdown in rewriteFrame's analyzed plan) would
    // masquerade as a join key and silently defeat the rewrite
    val hasEqui = conjuncts.exists {
      case Equality(a, b) if a.references.nonEmpty && b.references.nonEmpty =>
        (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet)) ||
          (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet))
      case _ => false
    }
    if (hasEqui) return None

    val bounds = conjuncts.flatMap(boundsOf(_, left, right))
    // one lower and one upper bound on the SAME point expression, with
    // both bounds coming from the other side
    val pair = (for {
      (p1, lo, fromL1, true) <- bounds
      (p2, hi, fromL2, false) <- bounds
      if fromL1 == fromL2 && p1.semanticEquals(p2)
    } yield (p1, lo, hi, fromL1)).headOption
    pair.map { case (p, lo, hi, pointFromLeft) =>
      val w = Literal(width, LongType)
      // floor division WITHOUT the subtract-pmod identity: e - pmod(e,w)
      // underflows Long for values in the lowest partial bucket (ANSI
      // mode throws, legacy mode wraps to a wrong bucket and silently
      // drops matches). trunc-div then correct when the remainder is
      // negative — every intermediate stays in range for w >= 1.
      def bucket(e: Expression): Expression = {
        val d = IntegralDivide(e, w)
        val r = Remainder(e, w)
        If(LessThan(r, Literal(0L, LongType)),
          Subtract(d, Literal(1L, LongType)), d)
      }

      val pb = Alias(bucket(p), "__graft_pb")()
      val pointSide = Project(
        (if (pointFromLeft) left.output else right.output) :+ pb,
        if (pointFromLeft) left else right)

      // interval side: one row per spanned bucket; an empty interval
      // (hi < lo) explodes to no rows, exactly like the original
      // join's empty match set (Sequence would throw on a reversed
      // range, hence the guard)
      val bLo = bucket(lo)
      val bHi = bucket(hi)
      // timeZoneId must be supplied explicitly: ResolveTimeZone ran at
      // analysis, long before this rule injects the expression
      val seq = If(LessThanOrEqual(bLo, bHi),
        Sequence(bLo, bHi, Some(Literal(1L, LongType)),
          Some(conf.sessionLocalTimeZone)),
        Literal.create(Array.empty[Long], ArrayType(LongType, containsNull = false)))
      val rbAttr = AttributeReference("__graft_rb", LongType, nullable = false)()
      val boundSide = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(rbAttr),
        child = if (pointFromLeft) right else left)

      val (newLeft, newRight) =
        if (pointFromLeft) (pointSide, boundSide) else (boundSide, pointSide)
      // the original join's hints carry over: sides keep their roles,
      // and a user's broadcast(intervals) must survive the rewrite
      val bucketJoin = Join(newLeft, newRight, Inner,
        Some(EqualTo(pb.toAttribute, rbAttr)), j.hint)
      // the full original condition re-applied: the bucket join is a
      // candidate superset, the filter makes it exact
      Project(j.output, Filter(cond, bucketJoin))
    }
  }
}

object BucketedRangeJoinRule {
  val WIDTH_KEY = "spark.graft.rangeJoin.bucketWidth"

  /** Rewrite a frame's range join with an explicit width, baking the
    * bucketed join INTO the frame's analyzed logical plan. This is the
    * per-query form of the conf: a conf-scoped planning window only
    * pins the CURRENT QueryExecution, and every later `count()` /
    * `write` builds a fresh one that re-optimizes without the conf —
    * silently restoring the nested-loop plan. A logical-plan rewrite
    * survives any re-planning (the rewritten join has an equi key, so
    * the rule's own eligibility check also leaves it alone if the conf
    * IS set). */
  def rewriteFrame(df: org.apache.spark.sql.DataFrame, width: Long): org.apache.spark.sql.DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val rule = BucketedRangeJoinRule()
    val newPlan = df.queryExecution.analyzed.transform {
      case j @ Join(left, right, Inner, Some(cond), _) =>
        rule.rewrite(j, left, right, cond, width).getOrElse(j)
    }
    org.apache.spark.sql.classic.Dataset.ofRows(
      df.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession], newPlan)
  }
}
