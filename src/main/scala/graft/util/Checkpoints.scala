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
        // SparkContext owns one checkpoint dir (setCheckpointDir
        // appends a per-app UUID subdir under the given path); align
        // it with the conf only when it drifts. Prefix-match on a
        // separator boundary — a bare contains() would accept
        // /data/ckpt2 when the conf says /data/ckpt and leave
        // checkpoints in the wrong directory.
        val sc = s.sparkContext
        val want = dir.stripSuffix("/")
        val aligned = sc.getCheckpointDir.exists { cur =>
          val p = cur.stripSuffix("/")
          p == want || p.startsWith(want + "/")
        }
        if (!aligned) sc.setCheckpointDir(dir)
        df.checkpoint()
      case _ => df.localCheckpoint()
    }
  }
}
