package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench must report failures as failures: a crashing query records an
  * `errors` entry and bumps `n_errors` — it can never masquerade as a
  * fast success (the r2 bench lost its join-query signal exactly this
  * way).
  */
class BenchSpec extends AnyFunSuite {
  import TestSession._

  test("a deliberately broken query surfaces as an error, not a fast time") {
    val broken: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.read.parquet("/nonexistent/graft/bench/path")
    val ok: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.range(10).toDF("id")

    val results = Bench.runAll(spark, sf, Map("q_broken" -> broken, "q_ok" -> ok))
    val byName = results.map(r => r.name -> r).toMap
    assert(byName("q_broken").error.isDefined, "broken query must record an error")
    assert(byName("q_ok").error.isEmpty)

    val json = Bench.toJson(results, sf)
    assert(json.contains("\"n_errors\":1"), json)
    assert(json.contains("\"q_broken\":\""), s"errors object must name the broken query: $json")
    // the time is still recorded (for wall-clock accounting) but flagged
    assert(json.contains("\"queries\":{"))
  }

  test("min-of-N reps reports the minimum and still surfaces failures") {
    var calls = 0
    val counting: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => { calls += 1; s.range(3).toDF("id") }
    val r = Bench.runOne(spark, sf, "q", counting, reps = 3)
    assert(calls == 3 && r.error.isEmpty)
    val broken: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => s.read.parquet("/nonexistent")
    assert(Bench.runOne(spark, sf, "q", broken, reps = 2).error.isDefined)
  }

  test("a fast-failing rep never sets the reported time when another rep succeeds") {
    var calls = 0
    // rep 1 crashes instantly; rep 2 succeeds after a measurable sleep —
    // the reported time must be the slow SUCCESSFUL rep's, not the crash's
    val flaky: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame =
      (s, _) => {
        calls += 1
        if (calls == 1) throw new RuntimeException("boom")
        Thread.sleep(300)
        s.range(3).toDF("id")
      }
    val r = Bench.runOne(spark, sf, "q_flaky", flaky, reps = 2)
    assert(r.error.isDefined, "the failing rep must still be surfaced")
    assert(r.seconds >= 0.3, s"time must come from the successful rep, got ${r.seconds}")
  }

  test("all-green run reports n_errors 0 and an empty errors object") {
    val results = Bench.runAll(spark, sf,
      Map("a" -> ((s, _) => s.range(5).toDF("id"))))
    val json = Bench.toJson(results, sf)
    assert(json.contains("\"n_errors\":0") && json.contains("\"errors\":{}"), json)
  }
}
