package graft

import graft.operators.{Behavioral, Corpus}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-8 hardening: the hashed mixture key on adversarial id
  * spaces, ANN index staging, and RRF leg-depth invariance.
  */
class Round8Spec extends AnyFunSuite {
  import TestSession._

  // ---- q_mixture_apply: hashed key on adversarial id spaces ---------------

  test("q_mixture_apply: downsample survives ids that are all multiples of the modulus") {
    import spark.implicits._
    // Every id ≡ 0 (mod 997). The raw-residue rule (doc_id % 997)
    // would evaluate the keep test identically for every row — keeping
    // either everything or nothing — while the hashed key must still
    // thin the over-represented source toward the uniform target.
    val docs = ((0 until 400).map(i => (i.toLong * 997L, "A")) ++
      (0 until 100).map(i => (4000000000L + i.toLong * 997L, "B")))
      .toDF("doc_id", "source")
    val out = Behavioral.mixtureApplyOn(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("B") == ((100L, 100L)), s"under-represented keeps all: ${out("B")}")
    val (inA, keptA) = out("A")
    assert(inA == 400L)
    assert(keptA < 400L && keptA > 0L,
      s"hashed key must thin a source whose ids are all ≡ 0 mod 997: $keptA")
    // target = N/S = 250 of 400 → expect ≈ 250 kept (binomial-ish slack)
    assert(keptA >= 200L && keptA <= 300L, s"kept ≈ 250: $keptA")
  }

  test("q_mixture_apply: clustered id ranges downsample at the same rate as spread ids") {
    import spark.implicits._
    // Two over-represented sources, one with a dense consecutive id
    // block and one with ids scattered across the 63-bit space — the
    // hashed residue must give both the same keep-rate (±noise).
    val docs = ((0 until 300).map(i => (7000000L + i.toLong, "dense")) ++
      (0 until 300).map(i => (i.toLong * 104729L * 65537L, "spread")) ++
      (0 until 60).map(i => (2000000000L + i.toLong, "small")))
      .toDF("doc_id", "source")
    val out = Behavioral.mixtureApplyOn(docs)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out("small") == ((60L, 60L)))
    val kd = out("dense")._2.toDouble
    val ks = out("spread")._2.toDouble
    // target = 660/3 = 220 of 300 per big source
    assert(kd >= 180 && kd <= 260, s"dense kept ≈ 220: $kd")
    assert(ks >= 180 && ks <= 260, s"spread kept ≈ 220: $ks")
  }

  // ---- index staging freshness --------------------------------------------

  test("indexRoot: regenerating the dataset at the same path restages instead of serving stale postings") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r8idx").toString
    def write(texts: Seq[(Long, String)]): Unit =
      texts.toDF("doc_id", "text")
        .withColumn("lang", lit("en")).withColumn("source", lit("s"))
        .withColumn("n_chars", length($"text").cast("long"))
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    write(Seq((1L, "alpha beta")))
    val r1 = Corpus.indexRoot(spark, dir)
    val toks1 = spark.read.parquet(s"$r1/postings")
      .select("tok").as[String].collect().toSet
    assert(toks1 == Set("alpha", "beta"))
    // second call with unchanged data is a no-op (marker short-circuit)
    assert(Corpus.indexRoot(spark, dir) == r1)
    write(Seq((1L, "gamma delta epsilon")))
    val r2 = Corpus.indexRoot(spark, dir)
    assert(r2 == r1, "same path must map to the same staging root")
    val toks2 = spark.read.parquet(s"$r2/postings")
      .select("tok").as[String].collect().toSet
    assert(toks2 == Set("gamma", "delta", "epsilon"),
      "content fingerprint change must rebuild the staged index")
  }
}
