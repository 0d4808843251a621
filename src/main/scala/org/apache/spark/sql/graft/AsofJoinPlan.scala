package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.classic
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of join as a FIRST-CLASS operator — logical node + planner
  * strategy + physical merge-scan plan, registered through
  * SparkSessionExtensions. This is the (c) rung of the extension
  * ladder (custom LogicalPlan + Strategy + SparkPlan) for the one
  * operator whose ideal physical shape Spark cannot reach from
  * relational building blocks: for every left row, attach the LATEST
  * right row with rightTime <= leftTime within the same key.
  *
  * Physical contract: both children cluster by their key
  * (EnsureRequirements co-partitions them, exactly as it does for a
  * sort-merge join) and sort within partitions by (key, time); the
  * exec then streams BOTH sides in one forward merge pass per
  * partition — no window state, no union trick (Ops.asofJoin's
  * union+last(ignoreNulls) formulation carries a growing window
  * buffer through one merged sort), and per-partition memory is one
  * buffered right row. Left-outer semantics: unmatched left rows get
  * nulls for every right column. Ties (rightTime == leftTime) match,
  * like DuckDB's ASOF JOIN and the union formulation.
  *
  * The right side must be unique per (key, time) for deterministic
  * output — same contract as Ops.asofJoin.
  */
case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    forward: Boolean = false, strict: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

class AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(l, r, lk, rk, lt, rt, fwd, st) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, fwd, st) :: Nil
    case _ => Nil
  }
}

/** `forward = false` (the default): for every left row, the LATEST
  * right row with rightTime <= leftTime in the key group. `forward =
  * true`: the EARLIEST right row with rightTime >= leftTime — the same
  * one-pass merge (both sides ascend by (key, time), the right cursor
  * only ever advances), but the match is the lookahead row itself
  * instead of the last row left behind, so forward needs no buffered
  * copy at all. Ties (rightTime == leftTime) match in both directions,
  * like DuckDB's ASOF >= / <= — unless `strict` (the < / > comparator
  * family), which excludes the tie row. Strictness is safe under the
  * one-pass cursor in both directions: backward leaves the tie row as
  * the lookahead (a LATER left row with a larger time may still claim
  * it), and forward discards it (no later left row, with its
  * greater-or-equal time, could match it strictly either). */
case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, rightKey: Attribute,
    leftTime: Attribute, rightTime: Attribute,
    forward: Boolean = false, strict: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // cluster both sides by key — EnsureRequirements inserts compatible
  // hash exchanges (or reuses existing ones), the same mechanism that
  // co-partitions a sort-merge join's children
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey: Expression, left.output)
    val ltB = BindReferences.bindReference(leftTime: Expression, left.output)
    val rkB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rtB = BindReferences.bindReference(rightTime: Expression, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val rightWidth = right.output.size
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val toUnsafe = UnsafeProjection.create(outAttrs, outAttrs)
      new Iterator[InternalRow] {
        // one-row lookahead into the right side; `lastMatch` is the
        // newest right row whose (key, time) does not exceed the
        // current left row — a COPY, because iterator rows are reused
        private var rNext: InternalRow = advanceRight()
        private var lastMatch: InternalRow = _
        private var lastKey: Any = _
        private var haveKey = false

        private def advanceRight(): InternalRow = {
          // skip right rows with null key or time: they can never be
          // "the latest row at or before t" for any left row
          var r: InternalRow = null
          var searching = true
          while (searching && rIter.hasNext) {
            r = rIter.next()
            if (rkB.eval(r) != null && rtB.eval(r) != null) searching = false
            else r = null
          }
          r
        }

        override def hasNext: Boolean = lIter.hasNext

        override def next(): InternalRow = {
          val l = lIter.next()
          val k = lkB.eval(l)
          val t = ltB.eval(l)
          if (k == null || t == null) {
            // null key/time never matches; right state is untouched
            joined(l, nullRight)
          } else if (forward) {
            // advance past right rows strictly BEFORE (k, t); the
            // cursor row is then the earliest at-or-after candidate.
            // It is NOT consumed on match — the next left row (same
            // key, later time) may still be at or before it.
            var scanning = true
            while (scanning && rNext != null) {
              val c = keyOrd.compare(rkB.eval(rNext), k)
              val before = {
                val ct = timeOrd.compare(rtB.eval(rNext), t)
                if (strict) ct <= 0 else ct < 0 // strict: ties advance past too
              }
              if (c < 0 || (c == 0 && before)) rNext = advanceRight()
              else scanning = false
            }
            val hit = rNext != null && keyOrd.compare(rkB.eval(rNext), k) == 0
            joined(l, if (hit) rNext else nullRight)
          } else {
            if (!haveKey || keyOrd.compare(k, lastKey) != 0) {
              lastMatch = null
              // copyValue, not k: for buffer-backed types (UTF8String,
              // binary, nested rows) eval() returns a view into the
              // iterator's reused row buffer — holding it across next()
              // calls would let lastKey mutate and break key-change
              // detection (same reason lastMatch is copied)
              lastKey = InternalRow.copyValue(k)
              haveKey = true
            }
            var scanning = true
            while (scanning && rNext != null) {
              val c = keyOrd.compare(rkB.eval(rNext), k)
              val atOrBefore = {
                val ct = timeOrd.compare(rtB.eval(rNext), t)
                // strict: a tie row is NOT consumed — it stays as the
                // lookahead for a later (larger-time) left row
                if (strict) ct < 0 else ct <= 0
              }
              if (c < 0) rNext = advanceRight()
              else if (c == 0 && atOrBefore) {
                lastMatch = rNext.copy()
                rNext = advanceRight()
              } else scanning = false
            }
            joined(l, if (lastMatch != null) lastMatch else nullRight)
          }
          toUnsafe(joined)
        }
      }
    }
  }
}

/** Public construction API for the custom plan (lives here because
  * Dataset.ofRows is private[sql]). */
object GraftPlans {

  /** As-of join `left` to `right`: for every left row, the latest
    * right row with `rightTime <= leftTime` sharing the key (nulls
    * when none precedes). Column names must be disjoint across sides.
    * `forward = true` flips the direction (earliest right row at or
    * after the left time); `strict = true` excludes the tie row — the
    * same four-comparator surface the SQL ASOF grammar exposes
    * (AsofSql.scala), for callers building plans programmatically.
    */
  def asofJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String,
      forward: Boolean = false, strict: Boolean = false): DataFrame = {
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    require(lp.outputSet.intersect(rp.outputSet).isEmpty,
      "as-of join sides must not share attributes — re-alias one side")
    // honor the session's resolution mode (default case-INSENSITIVE,
    // like every other column lookup in Spark) — BOTH in the column
    // lookups below and in the disjointness check here: 'TS' vs 'ts'
    // are distinct names but one ambiguous column under insensitive
    // resolution, so they must be rejected the same way
    val caseSensitive = left.sparkSession.sessionState.conf.caseSensitiveAnalysis
    def canon(n: String): String = if (caseSensitive) n else n.toLowerCase
    val shared = lp.output.map(a => canon(a.name)).toSet
      .intersect(rp.output.map(a => canon(a.name)).toSet)
    require(shared.isEmpty,
      s"as-of join sides must not share column NAMES (got $shared) — " +
        "the combined output would be ambiguous to resolve; rename one side")
    def attr(p: LogicalPlan, n: String): Attribute = {
      val hits = p.output.filter(a =>
        if (caseSensitive) a.name == n else a.name.equalsIgnoreCase(n))
      hits match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"no column '$n' in ${p.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"ambiguous column '$n': matches ${many.map(_.name)}")
      }
    }
    val (lk, rk) = (attr(lp, leftKey), attr(rp, rightKey))
    val (lt, rt) = (attr(lp, leftTime), attr(rp, rightTime))
    require(lk.dataType == rk.dataType && lt.dataType == rt.dataType,
      s"key/time types must match: ${lk.dataType}/${rk.dataType}, ${lt.dataType}/${rt.dataType}")
    classic.Dataset.ofRows(
      left.sparkSession.asInstanceOf[classic.SparkSession],
      AsofJoinNode(lp, rp, lk, rk, lt, rt, forward, strict))
  }
}
