package graft

import graft.operators.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Similarity-search quality beyond oracle parity: ANN recall against
  * brute-force ground truth, and vector-math sanity.
  */
class SimilaritySpec extends AnyFunSuite {
  import TestSession._

  private def topkSet(name: String): Map[Long, Set[Long]] = {
    import spark.implicits._
    SparkEntry.queries(name)(spark, sf)
      .select($"query_id", $"neighbor_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (q, ns) => q -> ns.map(_._2).toSet }
  }

  test("ANN recall vs brute force is useful (LSH and IVF)") {
    val exact = topkSet("sim_bruteforce_topk") // top-5 ground truth
    val lsh = topkSet("sim_ann_lsh")           // top-3 from candidates
    val ivf = topkSet("sim_ann_ivf")
    def recall(ann: Map[Long, Set[Long]]): Double = {
      val per = exact.keys.toSeq.map { q =>
        val hits = ann.getOrElse(q, Set.empty).count(exact(q).contains)
        hits.toDouble / 3.0
      }
      per.sum / per.size
    }
    val (rl, ri) = (recall(lsh), recall(ivf))
    info(s"recall@3 vs exact top-5: lsh=$rl ivf=$ri")
    assert(rl >= 0.45, s"LSH recall too low: $rl")
    // Lloyd-trained centroids (2 deterministic iterations) measure
    // 0.633 here vs the 0.3 floor the untrained medoids were held to
    assert(ri >= 0.6, s"IVF recall too low: $ri")
    assert(exact.size == 10 && lsh.size == 10 && ivf.size == 10,
      "every query must return neighbors")
  }

  test("PQ ANN recall vs exact L2 ground truth") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // exact L2 top-3 (PQ approximates L2, so cosine ground truth would
    // mismeasure unless embeddings happen to be normalized)
    val emb = Tables.embeddings(spark, sf).select($"vec_id",
      expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
    val q = emb.filter($"vec_id" % 50 === 0)
      .select($"vec_id".as("query_id"), $"e".as("qe"))
    val w = Window.partitionBy($"query_id").orderBy($"d", $"vec_id")
    val exact = q.crossJoin(emb).filter($"vec_id" =!= $"query_id")
      .select($"query_id", $"vec_id",
        expr("aggregate(zip_with(qe, e, (x, y) -> (x - y) * (x - y)), 0D, (a, v) -> a + v)").as("d"))
      .withColumn("rn", row_number().over(w)).filter($"rn" <= 3)
      .select($"query_id", $"vec_id").as[(Long, Long)]
      .collect().groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val pq = topkSet("sim_ann_pq")
    val per = exact.keys.toSeq.map { k =>
      pq.getOrElse(k, Set.empty).count(exact(k).contains).toDouble / 3.0
    }
    val recall = per.sum / per.size
    info(s"PQ recall@3 vs exact L2 top-3: $recall")
    // ADC alone measures 0.4 on this unclustered corpus; the exact
    // re-rank of the top-20 shortlist lifts it to 0.87
    assert(recall >= 0.7, s"PQ recall too low: $recall")
    assert(pq.size == exact.size, "every query must return PQ neighbors")

    // IVFPQ: same metric, candidates pruned to the 2 L2-nearest of 16
    // coarse cells (~12.5% of the corpus). The synthetic embeddings are
    // UNCLUSTERED (measured nearest-neighbor same-label rate ≈ 7% —
    // chance), so recall is ceilinged by the probe fraction: no coarse
    // index can beat it by much on structureless data. The property
    // that proves the router works is the LIFT over uniform pruning —
    // L2 routing must put true neighbors in probed cells far more often
    // than the 2/16 a random cell choice would.
    val ivfpq = topkSet("sim_ann_ivfpq")
    val perI = exact.keys.toSeq.map { k =>
      ivfpq.getOrElse(k, Set.empty).count(exact(k).contains).toDouble / 3.0
    }
    val recallI = perI.sum / perI.size
    val uniformPruning = 2.0 / 16.0
    info(s"IVFPQ recall@3 vs exact L2 top-3: $recallI " +
      f"(lift over uniform 2/16 pruning: ${recallI / uniformPruning}%.1fx)")
    assert(recallI >= 2.0 * uniformPruning,
      s"IVFPQ routing shows no lift over random cell pruning: $recallI")
    assert(ivfpq.size == exact.size, "every query must return IVFPQ neighbors")
  }

  test("cosine: self-similarity is 1, orthogonal is 0") {
    import spark.implicits._
    val df = Seq((Seq(1f, 0f, 3f, 4f), Seq(1f, 0f, 3f, 4f), Seq(0f, 5f, 0f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(
      VectorOps.cosine($"a", $"b").as("self"),
      VectorOps.cosine($"a", $"c").as("orth")).collect()(0)
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(math.abs(r.getDouble(1)) < 1e-12)
  }

  test("embedding near-dup pairs are symmetric-free and above threshold") {
    import spark.implicits._
    val pairs = SparkEntry.queries("dedup_embedding")(spark, sf)
      .as[(Long, Long, Double)].collect()
    assert(pairs.nonEmpty)
    assert(pairs.forall { case (a, b, c) => a < b && c >= 0.4 })
  }

  test("int8 quantization: reconstruction error bounded by scale/2 on every vector") {
    import spark.implicits._
    val errs = graft.operators.Similarity.quantizeErrors(
        Tables.embeddings(spark, sf)
          .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e")))
      .select($"vec_id", $"scale", $"rmse", $"max_abs")
      .collect()
    assert(errs.nonEmpty)
    errs.foreach { r =>
      val (scale, rmse, maxAbs) =
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      // round-to-nearest property: |x - q*scale| <= scale/2 per element
      assert(maxAbs <= scale / 2 + 1e-12, s"vec ${r.getLong(0)}: $maxAbs > $scale/2")
      assert(rmse <= maxAbs + 1e-12 && rmse >= 0)
      assert(scale > 0, "corpus has no zero vectors, scale must be positive")
    }
    // crafted vector with exactly representable errors
    val one = graft.operators.Similarity.quantizeErrors(
        Seq(Seq(1.27, -0.635, 0.0)).toDF("e"))
      .select($"scale", $"max_abs").collect()(0)
    assert(math.abs(one.getDouble(0) - 0.01) < 1e-15) // 1.27/127
    // -0.635/0.01 = -63.5 -> floor(-63.5+0.5) = -63 -> err = 0.005
    assert(math.abs(one.getDouble(1) - 0.005) < 1e-12)
  }

  test("QuantizeStats: codegen and interpreted agree; HOF chain reproduced exactly") {
    import spark.implicits._
    val df = graft.operators.Similarity.quantizeErrors(
        Tables.embeddings(spark, sf).limit(100).select($"vec_id", $"embedding".as("e")))
      .select($"vec_id", $"scale", $"rmse", $"max_abs")
    val withCodegen = df.collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      val interpreted = df.collect().map(r =>
        (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
      assert(withCodegen.sortBy(_._1).toSeq == interpreted.sortBy(_._1).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
    }
    // the fused expression reproduces the five-pass HOF chain bit-for-bit
    val hof = Tables.embeddings(spark, sf).limit(100)
      .select($"vec_id", expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("e"))
      .withColumn("scale", expr("array_max(transform(e, x -> abs(x)))") / 127.0)
      .withColumn("err", expr("transform(e, x -> x - floor(x / scale + 0.5) * scale)"))
      .withColumn("sq", expr("aggregate(err, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x)"))
      .select($"vec_id", $"scale", sqrt($"sq" / size($"e")).as("rmse"),
        expr("array_max(transform(err, x -> abs(x)))").as("max_abs"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(withCodegen.sortBy(_._1).toSeq == hof.sortBy(_._1).toSeq)
    // null element / empty array -> NULL result (HOF-chain null semantics)
    val edge = Seq(Seq.empty[Double]).toDF("e")
      .unionAll(Seq(Seq(1.0, 2.0)).toDF("e").select(expr("transform(e, x -> CAST(NULL AS DOUBLE))").as("e")))
      .select(graft.functions.GraftFunctions.quantize_stats($"e").as("qs")).collect()
    assert(edge.forall(_.isNullAt(0)), "empty/null-element vectors must yield NULL")
  }

  test("dedup_semantic keeps one canonical per near-dup cluster, singletons intact") {
    import spark.implicits._
    // crafted geometry: ids 0-2 share a direction, 3-4 share another,
    // 5 is alone — near-identical vectors share every LSH band and
    // cos ≈ 1; cross-cluster cos ≈ 0 fails the 0.4 verify even if a
    // band collides
    def vec(axis: Int, jitter: Int): Seq[Float] =
      (0 until 64).map(i => (if (i == axis) 100f else 0f) + (((i * 7 + jitter) % 5) * 0.01f))
    val rows = Seq(
      (0L, vec(0, 1), 0), (1L, vec(0, 2), 0), (2L, vec(0, 3), 0),
      (3L, vec(20, 1), 1), (4L, vec(20, 2), 1),
      (5L, vec(40, 1), 2))
    val dir = java.nio.file.Files.createTempDirectory("graft_semdd").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("dedup_semantic")(spark, dir)
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(out == Seq(
      (0L, 0L, 3L, true), (1L, 0L, 3L, false), (2L, 0L, 3L, false),
      (3L, 3L, 2L, true), (4L, 3L, 2L, false),
      (5L, 5L, 1L, true)), s"unexpected clustering: $out")
    assert(out.count(_._4) == 3, "exactly one canonical per cluster")
  }

  test("residual PQ codes strictly shrink ADC error vs raw codes at the same budget") {
    // FAISS's reason for residual encoding: within a cell the residual
    // coordinates span a fraction of the raw range, so 16 entries per
    // subspace resolve finer structure. Same codebook size, same M,
    // same probes — only the encoded quantity differs. The testdata
    // embeddings are UNCLUSTERED (residual ≈ x − global mean, a pure
    // shift — nothing to gain, same ceiling the routing-lift spec
    // documents), so the property is asserted on a crafted CLUSTERED
    // corpus: 16 well-separated centers (spread ~10), within-cluster
    // noise ~0.5, and cluster id (v/16) % 16 so the fixed seed grid
    // (vec_id ≡ 3 mod 16, < 256) lands exactly one seed per cluster.
    import spark.implicits._
    def h(a: Long, b: Long): Double = {
      val x = (a * 1103515245L + b * 12345L + 6789L) & 0x7fffffffL
      (x % 1000) / 1000.0 // deterministic pseudo-uniform [0, 1)
    }
    val rows = (0 until 512).map { v =>
      val k = (v / 16) % 16
      val emb = (0 until 64).map { i =>
        (10.0 * h(k, i) + 0.5 * h(v.toLong * 64 + i, 7)).toFloat
      }
      (v.toLong, emb, k)
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_emb").toString
    rows.toDF("vec_id", "embedding", "label")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val raw = operators.Similarity.adcError(spark, dir, residual = false)
    val res = operators.Similarity.adcError(spark, dir, residual = true)
    info(f"mean |ADC − true L2²|: raw=$raw%.5f residual=$res%.5f")
    assert(res < raw,
      s"residual encoding should shrink ADC error on clustered data: residual=$res raw=$raw")
  }
}
