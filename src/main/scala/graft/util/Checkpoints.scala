package graft.util

import org.apache.spark.sql.DataFrame

/** Lineage truncation with a production escape hatch.
  *
  * Iterative operators (connected components, candidate-pair
  * materialization, TF-IDF's multi-consumer token frame) must cut their
  * lineage or the plan grows per iteration / re-runs per consumer. The
  * mechanism is a deployment decision:
  *
  *  - `localCheckpoint()` stores blocks in EXECUTOR memory/disk with no
  *    fault tolerance: free at local[n] scale, but on a real cluster a
  *    single executor loss kills the query with an unrecoverable
  *    missing-block error instead of recomputing — unacceptable for a
  *    multi-hour 100 TB job.
  *  - reliable `checkpoint()` writes to a (HDFS/object-store) directory
  *    and survives any executor loss, at the price of one write+read
  *    round trip.
  *
  * `truncate` picks per the `spark.graft.checkpointDir` runtime conf:
  * set it (cluster deployments) → reliable checkpoints under that
  * directory; unset (local/dev/bench) → localCheckpoint. Both are
  * eager, so callers can rely on the input being materialized exactly
  * once either way.
  */
object Checkpoints {

  val DirConf = "spark.graft.checkpointDir"

  def truncate(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    s.conf.getOption(DirConf) match {
      case Some(dir) if dir.nonEmpty =>
        // SparkContext owns one checkpoint dir (it appends a per-app
        // UUID subdir); align it with the conf only when it drifts
        val sc = s.sparkContext
        if (!sc.getCheckpointDir.exists(_.contains(dir))) sc.setCheckpointDir(dir)
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }
}
