package graft

import graft.operators.Similarity
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.scalatest.funsuite.AnyFunSuite

/** Round-9 hardening: the stored IVFPQ index (stage once, query many),
  * the index-served hybrid dense leg's plan shape, and the RRF fusion
  * depth-invariance contract.
  */
class Round9Spec extends AnyFunSuite {
  import TestSession._

  // ---- stored ANN index ---------------------------------------------------

  test("ANN index: queries after staging run zero training jobs") {
    // First touch stages (or finds a prior stage with a matching
    // content fingerprint); every query invocation after that must
    // serve from the stored codebooks/codes without re-running Lloyd.
    Similarity.annIndexRoot(spark, sf)
    val before = Similarity.annTrainRuns.get()
    assert(SparkEntry.queries("sim_ann_ivfpq")(spark, sf).count() > 0)
    assert(SparkEntry.queries("q_hybrid_rrf")(spark, sf).count() > 0)
    assert(Similarity.annTrainRuns.get() == before,
      "query path retrained the IVFPQ index instead of reading the stored one")
    val root = Similarity.annIndexRoot(spark, sf)
    for (part <- Seq("coarse", "pqcodebook", "codes"))
      assert(new java.io.File(s"$root/$part").exists(), s"missing index part $part")
  }

  // ---- hybrid dense leg plan shape ---------------------------------------

  test("q_hybrid_rrf: no BroadcastNestedLoopJoin touches the embeddings table") {
    val df = SparkEntry.queries("q_hybrid_rrf")(spark, sf)
    def scansEmbeddings(p: SparkPlan): Boolean = p.collect {
      case s: FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("embeddings.parquet")) => s
    }.nonEmpty
    val bad = df.queryExecution.sparkPlan.collect {
      case j: BroadcastNestedLoopJoinExec if scansEmbeddings(j) => j
    }
    assert(bad.isEmpty,
      s"dense leg must be index-served, not an all-pairs corpus crossJoin:\n${bad.mkString("\n")}")
  }

  // ---- RRF fusion depth invariance ---------------------------------------

  test("rrfFuse: fused output is invariant to leg entries beyond LegDepth") {
    import spark.implicits._
    val depth = Similarity.RrfLegDepth
    // two queries: q0 with full-depth legs and partial overlap, q7 with
    // a short lexical leg (30 entries — a leg may run dry, rank stops
    // early) — overlap docs exercise the full-outer fusion arithmetic
    val baseLex = (1 to depth).map(r => (0L, 1000L + r, r)) ++
      (1 to 30).map(r => (7L, 2000L + r, r))
    val baseDen = (1 to depth).map(r => (0L, 1050L + r, r)) ++
      (1 to depth).map(r => (7L, 2020L + r, r))
    // beyond-depth garbage a mis-truncated leg might hand in
    val extraLex = (depth + 1 to depth + 50).map(r => (0L, 5000L + r, r))
    val extraDen = (depth + 1 to depth + 40).map(r => (7L, 6000L + r, r))
    def fuse(lex: Seq[(Long, Long, Int)], den: Seq[(Long, Long, Int)]) =
      Similarity.rrfFuse(
        lex.toDF("query_id", "doc_id", "lex_rank"),
        den.toDF("query_id", "doc_id", "vec_rank")).collect().toSeq
    val a = fuse(baseLex, baseDen)
    val b = fuse(baseLex ++ extraLex, baseDen ++ extraDen)
    assert(a.nonEmpty)
    assert(a == b, "beyond-depth leg entries changed the fused output")
    // overlap doc (appears in both legs for q0) must carry both ranks
    val overlap = a.filter(r => r.getLong(0) == 0L && r.getInt(3) > 0 && r.getInt(4) > 0)
    assert(overlap.nonEmpty, "expected at least one doc ranked by both legs")
  }
}
