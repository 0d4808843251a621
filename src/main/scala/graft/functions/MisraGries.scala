package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a custom typed Aggregator —
  * the one-pass, bounded-memory, MERGEABLE sketch that finds frequent
  * items at 100 TB without a full groupBy: each task keeps at most `k`
  * counters regardless of key cardinality, and partial summaries
  * combine associatively (Agarwal et al., "Mergeable Summaries", PODS
  * 2012: combine counts, then subtract the (k+1)-th largest and drop
  * non-positive — error bounds add, staying ≤ n/(k+1)).
  *
  * Survival guarantee (what the verify pass and tests rely on): every
  * item with true frequency > n/(k+1) has a positive estimate in the
  * final summary, under any partitioning and merge order. The summary
  * alone is order-dependent (counts are estimates), so queries use it
  * as a CANDIDATE set and re-count candidates exactly — one cheap
  * semi-join pass — making the end result deterministic and
  * oracle-checkable, the same candidate→verify shape as q58/q66.
  */
class MisraGries(k: Int)
    extends Aggregator[String, mutable.Map[String, Long], Seq[String]] {
  require(k > 0, "k must be positive")

  override def zero: mutable.Map[String, Long] = mutable.Map.empty

  override def reduce(m: mutable.Map[String, Long], w: String): mutable.Map[String, Long] = {
    m.get(w) match {
      case Some(c) => m.update(w, c + 1)
      case None if m.size < k => m.update(w, 1L)
      case None =>
        // classic MG step: a full summary + unseen key decrements ALL
        // (snapshot first — mutating a mutable.Map mid-foreach is UB)
        m.toSeq.foreach { case (key, c) =>
          if (c == 1) m.remove(key) else m.update(key, c - 1)
        }
    }
    m
  }

  override def merge(a: mutable.Map[String, Long],
      b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    b.foreach { case (w, c) => a.update(w, a.getOrElse(w, 0L) + c) }
    if (a.size > k) {
      val d = a.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      a.toSeq.foreach { case (w, c) =>
        if (c - d <= 0) a.remove(w) else a.update(w, c - d)
      }
    }
    a
  }

  override def finish(m: mutable.Map[String, Long]): Seq[String] =
    m.keys.toSeq.sorted

  override def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  override def outputEncoder: Encoder[Seq[String]] = ExpressionEncoder[Seq[String]]()
}
