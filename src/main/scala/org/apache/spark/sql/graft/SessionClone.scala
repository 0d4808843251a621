package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.{SparkSession => ClassicSession}

/** Public doorway to `SparkSession.cloneSession()`, which Spark keeps
  * `private[sql]`. A clone shares the SparkContext, the catalog and the
  * cached-table state of its parent but owns an independent SQLConf —
  * exactly the isolation a declared query needs to plan under its own
  * optimizer settings (e.g. `spark.sql.cbo.enabled`) without a
  * save/restore window on the caller's shared conf, which is a TOCTOU
  * under concurrent callers. This is the same mechanism the Thrift
  * server uses for per-connection session isolation, reached from the
  * `org.apache.spark.sql` package the way the engine's other Catalyst
  * extensions (AsofJoinPlan, BloomFilterPrune) already are.
  */
object SessionClone {
  def apply(s: SparkSession): SparkSession = s match {
    case c: ClassicSession => c.cloneSession()
    case other => throw new IllegalStateException(
      s"SessionClone requires a classic SparkSession, got ${other.getClass}")
  }
}
