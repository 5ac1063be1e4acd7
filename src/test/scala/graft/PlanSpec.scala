package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.ExplainMode
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape assertions — the properties that decide whether these
  * operators survive a 100 TB input: predicate pushdown reaching the
  * parquet scan, column pruning, broadcast joins for dimension sides,
  * TakeOrderedAndProject for top-k (never a global sort), and
  * whole-stage codegen in the hot paths.
  */
class PlanSpec extends AnyFunSuite {
  import TestSession._

  private def plan(name: String): String = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.explainString(ExplainMode.fromString("formatted"))
  }

  test("q6: filters are pushed to the parquet scan") {
    val p = plan("q6_filter_agg")
    assert(p.contains("PushedFilters:"), p)
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate filter not pushed")
    assert(p.contains("LessThan(l_quantity,24.0)"), "quantity filter not pushed")
  }

  test("io_column_projection: scan reads only the projected column") {
    val p = plan("io_column_projection")
    assert(p.contains("ReadSchema: struct<o_orderpriority:string>"),
      s"scan not pruned to one column:\n${p.linesIterator.filter(_.contains("ReadSchema")).mkString("\n")}")
  }

  test("q3/q5: dimension joins broadcast") {
    assert(plan("q3_join_agg").contains("BroadcastHashJoin"))
    val p5 = plan("q5_multijoin")
    assert("BroadcastHashJoin".r.findAllIn(p5).size >= 4,
      "q5 should broadcast the whole dim chain")
  }

  test("q_topk plans as TakeOrderedAndProject, not a global sort") {
    val p = plan("q_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q1: aggregation is partial (map-side combine) + final") {
    val p = plan("q1_agg")
    assert("HashAggregate".r.findAllIn(p).size >= 2, "expected partial+final agg")
    // codegen markers ("*(n)") appear in the AQE final plan — execute
    // first, then inspect
    val df = SparkEntry.queries("q1_agg")(spark, sf)
    df.collect()
    assert(df.queryExecution.executedPlan.toString.contains("*("),
      "agg pipeline should codegen")
  }

  test("dedup_exact shuffles fingerprints, not text") {
    val p = plan("dedup_exact")
    // the exchange key is the 64-bit fingerprint — text never shuffles
    assert(p.contains("graft_fingerprint64"), p.take(500))
    assert(!p.contains("Exchange hashpartitioning(text"), "raw text in shuffle key")
  }

  test("custom expressions run inside whole-stage codegen") {
    // collect codegen'd subtrees only; custom exprs must appear there
    val df = Tables.documents(spark, sf)
      .select(graft.functions.GraftFunctions.fingerprint64(
        org.apache.spark.sql.functions.col("text")).as("fp"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("*(1)") || p.contains("WholeStageCodegen"),
      s"fingerprint pipeline fell out of codegen:\n$p")
  }
}
