package graft.util

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Dag runner semantics: declaration-order execution, done-marker
  * skip/resume, transitive failure propagation, build-time validation.
  */
class DagSpec extends AnyFunSuite {

  test("stages run in declaration order; all Ran") {
    val order = collection.mutable.ArrayBuffer.empty[String]
    val r = new Dag()
      .stage("a") { order += "a" }
      .stage("b", "a") { order += "b" }
      .stage("c", "a") { order += "c" }
      .stage("d", "b", "c") { order += "d" }
      .run()
    assert(order.toSeq === Seq("a", "b", "c", "d"))
    assert(r.forall(_._2 === StageResult.Ran))
  }

  test("failure propagates to transitive dependents; siblings still run") {
    val ran = collection.mutable.Set.empty[String]
    val r = new Dag()
      .stage("a") { ran += "a" }
      .stage("boom", "a") { sys.error("stage failure") }
      .stage("after_boom", "boom") { ran += "after_boom" }
      .stage("transitive", "after_boom") { ran += "transitive" }
      .stage("sibling", "a") { ran += "sibling" }
      .run().toMap
    assert(ran === Set("a", "sibling"))
    assert(r("a") === StageResult.Ran)
    assert(r("boom").isInstanceOf[StageResult.Failed])
    assert(r("after_boom") === StageResult.SkippedUpstreamFailed)
    assert(r("transitive") === StageResult.SkippedUpstreamFailed)
    assert(r("sibling") === StageResult.Ran)
  }

  test("done-markers: resume skips completed stages, reruns the failed one") {
    val dir = Files.createTempDirectory("dag_markers").toString
    var attempts = 0
    def build(failB: Boolean) = new Dag(markerDir = Some(dir))
      .stage("a") { () }
      .stage("b", "a") { attempts += 1; if (failB) sys.error("first run fails") }
      .stage("c", "b") { () }
    val first = build(failB = true).run().toMap
    assert(first("a") === StageResult.Ran)
    assert(first("b").isInstanceOf[StageResult.Failed])
    assert(first("c") === StageResult.SkippedUpstreamFailed)
    // resume: a is marker-skipped, b retried and succeeds, c runs
    val second = build(failB = false).run().toMap
    assert(second("a") === StageResult.SkippedDone)
    assert(second("b") === StageResult.Ran)
    assert(second("c") === StageResult.Ran)
    assert(attempts === 2)
    // third run: everything marker-skipped
    val third = build(failB = false).run().toMap
    assert(third.values.forall(_ === StageResult.SkippedDone))
    assert(attempts === 2)
  }

  test("build-time validation: unknown dependency and duplicate names rejected") {
    intercept[IllegalArgumentException] {
      new Dag().stage("x", "nope") { () }
    }
    intercept[IllegalArgumentException] {
      new Dag().stage("x") { () }.stage("x") { () }
    }
  }
}
