package graft.util

import java.nio.file.{Files, Paths}
import scala.collection.mutable

/** Outcome of one stage in a [[Dag]] run. */
sealed trait StageResult
object StageResult {
  case object Ran extends StageResult
  case object SkippedDone extends StageResult // done-marker present
  case object SkippedUpstreamFailed extends StageResult
  final case class Failed(error: Throwable) extends StageResult
}

/** Minimal embedded DAG runner — the engine-side equivalent of the
  * reference's Airflow DAG (candy_dag.py:136-164: four PythonOperators
  * chained load >> process >> forecast >> cleanup). An orchestration
  * artifact, not a scheduler: stages are named thunks with explicit
  * dependencies, executed in topological order with
  *
  *  - **idempotent skip**: a stage with a done-marker file (written
  *    after success under `markerDir`) is skipped on re-run, so a
  *    failed run resumes from the first incomplete stage — unlike the
  *    reference DAG, whose every task re-runs the WHOLE pipeline from
  *    scratch (each PythonOperator rebuilds the session and reloads
  *    all inputs, candy_dag.py:80-126);
  *  - **failure propagation**: a failed stage marks every transitive
  *    dependent SkippedUpstreamFailed (Airflow's upstream_failed);
  *  - **acyclic by construction**: a stage's dependencies must be
  *    registered before it, so declaration order IS a topological
  *    order and cycles cannot be expressed.
  *
  * Deterministic execution (declaration order) keeps runs
  * reproducible; stages run sequentially on the driver because each
  * stage is itself a distributed Spark job — the parallelism lives
  * inside the stages, exactly as in an Airflow+Spark deployment.
  */
final class Dag(markerDir: Option[String] = None) {
  private case class Stage(name: String, deps: Seq[String], body: () => Unit)
  private val stages = mutable.LinkedHashMap.empty[String, Stage]

  /** Register a stage. Dependencies must be registered first (keeps
    * the graph acyclic by construction and the declaration readable
    * top-down like candy_dag's `>>` chains). */
  def stage(name: String, deps: String*)(body: => Unit): this.type = {
    require(!stages.contains(name), s"duplicate stage $name")
    deps.foreach(d => require(stages.contains(d),
      s"stage $name depends on unregistered $d — declare dependencies first"))
    stages(name) = Stage(name, deps, () => body)
    this
  }

  private def markerPath(name: String) =
    markerDir.map(d => Paths.get(d, s"_done_$name"))

  /** Run all stages; returns per-stage results in execution order. */
  def run(): Seq[(String, StageResult)] = {
    val results = mutable.LinkedHashMap.empty[String, StageResult]
    def upstreamFailed(s: Stage): Boolean = s.deps.exists { d =>
      results(d) match {
        case _: StageResult.Failed | StageResult.SkippedUpstreamFailed => true
        case _ => false
      }
    }
    stages.values.foreach { s =>
      val r: StageResult =
        if (upstreamFailed(s)) StageResult.SkippedUpstreamFailed
        else markerPath(s.name) match {
          case Some(m) if Files.exists(m) => StageResult.SkippedDone
          case m =>
            try {
              s.body()
              m.foreach { p =>
                Files.createDirectories(p.getParent)
                Files.write(p, Array.empty[Byte])
              }
              StageResult.Ran
            } catch { case e: Exception => StageResult.Failed(e) }
        }
      results(s.name) = r
    }
    results.toSeq
  }
}
