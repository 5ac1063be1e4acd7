package graft

import org.scalatest.funsuite.AnyFunSuite

/** Round-10 additions, second batch: sketch/accounting operators
  * (Count-Min, minhash candidate recall), behavioral transitions,
  * equi-depth profiling, PMI collocations, curriculum ordering.
  */
class Round10bSpec extends AnyFunSuite {
  import TestSession._

  // ---- Count-Min Sketch ----------------------------------------------------

  test("q_cms_freq: estimates never undercount and bound the error") {
    val rows = SparkEntry.queries("q_cms_freq")(spark, sf).collect()
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(rows.length == math.min(20L, users))
    for (r <- rows) {
      val (exact, est, over) =
        (r.getAs[Long]("n_exact"), r.getAs[Long]("est"), r.getAs[Long]("overcount"))
      assert(est >= exact, s"CMS undercounted: est=$est < exact=$exact")
      assert(over == est - exact)
    }
    // heaviest-first presentation, deterministic ties
    val exacts = rows.map(_.getAs[Long]("n_exact")).toSeq
    assert(exacts == exacts.sorted.reverse)
  }

  // ---- minhash candidate recall -------------------------------------------

  test("dedup_minhash_recall: accounting is coherent and bands trade recall") {
    def one(rowsPerBand: Int) = {
      val r = operators.Dedup.minhashRecallOn(spark, sf, rowsPerBand).head()
      (r.getAs[Long]("n_truth"), r.getAs[Long]("n_candidates"),
        r.getAs[Long]("n_hit"), r.getAs[Double]("recall"))
    }
    val (t4, c4, h4, r4) = one(4)
    assert(t4 > 0, "corpus should contain J >= 0.8 pairs")
    assert(h4 <= t4 && h4 <= c4)
    assert(r4 == h4.toDouble / t4)
    // wider bands collide strictly less: the candidate set shrinks and
    // recall can only drop — the S-curve the operator exists to measure
    val (t16, c16, h16, r16) = one(16)
    assert(t16 == t4, "truth side must not depend on the band shape")
    assert(c16 <= c4 && h16 <= h4 && r16 <= r4)
  }

  // ---- transition matrix ---------------------------------------------------

  test("q_transition_matrix: rows are a distribution per prev_type") {
    val rows = SparkEntry.queries("q_transition_matrix")(spark, sf).collect()
    assert(rows.nonEmpty)
    val byPrev = rows.groupBy(_.getAs[String]("prev_type"))
    for ((p, rs) <- byPrev) {
      val psum = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(psum - 1.0) < 1e-9, s"P(.|$p) sums to $psum")
    }
    // pair count identity: transitions = events - one per user timeline
    val ev = Tables.events(spark, sf)
    val expected = ev.count() - ev.select("user_id").distinct().count()
    assert(rows.map(_.getAs[Long]("n")).sum == expected)
  }

  // ---- equi-depth histogram ------------------------------------------------

  test("q_equidepth_histogram: buckets are contiguous, complete, near-equal") {
    val rows = SparkEntry.queries("q_equidepth_histogram")(spark, sf).collect()
    assert(rows.length == 10)
    val total = Tables.lineitem(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_rows")).sum == total)
    // value ranges are disjoint and ordered
    val his = rows.map(_.getAs[Double]("hi"))
    val los = rows.map(_.getAs[Double]("lo"))
    for (i <- 1 until rows.length)
      assert(los(i) > his(i - 1), s"bucket $i overlaps its predecessor")
    // depth balance: within one value-group of ideal
    val maxTie = Tables.lineitem(spark, sf)
      .groupBy("l_extendedprice").count()
      .agg(org.apache.spark.sql.functions.max("count")).head().getLong(0)
    val ideal = total / 10.0
    for (r <- rows)
      assert(math.abs(r.getAs[Long]("n_rows") - ideal) <= maxTie + 10,
        s"bucket ${r.getAs[Long]("bucket")} depth ${r.getAs[Long]("n_rows")} vs ideal $ideal")
  }

  // ---- PMI collocations ----------------------------------------------------

  test("text_pmi: scaled PMI matches a from-scratch recomputation") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("text_pmi")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 50)
    val docs = Tables.documents(spark, sf)
      .select(operators.TextPrep.words(col("text")).as("w"))
    val n = docs.filter(size(col("w")) >= 2)
      .select(explode(expr(
        "transform(sequence(0, size(w) - 2), i -> struct(w[i] AS u, w[i + 1] AS v2))")).as("b"))
      .filter(col("b.u") =!= "" && col("b.v2") =!= "").count()
    for (r <- rows) {
      val (cuv, cu, cv) = (r.getAs[Long]("c_uv"), r.getAs[Long]("c_u"), r.getAs[Long]("c_v"))
      assert(cuv >= 5)
      val want = math.floor(math.log(cuv.toDouble * n / (cu.toDouble * cv)) * 1e6 + 0.5).toLong
      assert(r.getAs[Long]("pmi6") == want, s"PMI mismatch for ${r.getAs[String]("u")} ${r.getAs[String]("v2")}")
    }
  }

  // ---- triangle count ------------------------------------------------------

  test("q_triangle_count: per-node counts match a from-scratch enumeration") {
    val rows = SparkEntry.queries("q_triangle_count")(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute-force the same graph (tiny at sf0.001) and compare exactly
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = pairs.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val triCount = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
    for {
      (a, b) <- pairs; c <- nodes if b < c
      if pairs.contains((b, c)) && pairs.contains((a, c))
    } { triCount(a) += 1; triCount(b) += 1; triCount(c) += 1 }
    val got = rows.map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_triangles")).toMap
    assert(got.filter(_._2 > 0) == triCount.toMap, s"got $got want $triCount")
    // every pair node reports (zero-triangle nodes included), no extras
    assert(got.keySet == nodes.toSet)
    // each triangle contributes exactly 3 participations
    assert(got.values.sum % 3 == 0)
  }

  // ---- entity resolution ---------------------------------------------------

  test("q_entity_resolution: canonical labels are closed, minimal, pair-consistent") {
    val rows = SparkEntry.queries("q_entity_resolution")(spark, sf).collect()
    val canon = rows.map(r => r.getAs[String]("name") -> r.getAs[String]("canonical")).toMap
    // the canonical representative is the cluster's lexicographic min
    for ((n, c) <- canon) assert(c <= n, s"$n resolved to non-min $c")
    // closed: a canonical name resolves to itself
    for (c <- canon.values) assert(canon(c) == c, s"canonical $c not a fixpoint")
    // every matched pair lands in one cluster
    val pairs = SparkEntry.queries("q_fuzzy_join")(spark, sf).collect()
    assert(pairs.nonEmpty)
    for (p <- pairs) {
      val (a, b) = (p.getAs[String]("n1"), p.getAs[String]("n2"))
      assert(canon(a) == canon(b), s"pair ($a,$b) split across clusters")
    }
  }

  // ---- last-touch attribution ----------------------------------------------

  test("q_attribution: credits every purchase exactly once") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_attribution")(spark, sf).collect()
    val ev = Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase").count()
    assert(rows.map(_.getAs[Long]("n_purchases")).sum == purchases)
    val types = ev.select("event_type").distinct().collect().map(_.getString(0)).toSet
    for (r <- rows) {
      val ch = r.getAs[String]("channel")
      assert(ch == "direct" || (types - "purchase").contains(ch), s"bogus channel $ch")
    }
  }

  // ---- streaming transitions -----------------------------------------------

  test("stream_transitions: state carries across micro-batches, counts equal batch twin") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val dir = new java.io.File("/tmp/graft_spec/stream_trans_slices")
    if (dir.exists()) {
      java.nio.file.Files.walk(dir.toPath).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.delete(p))
    }
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts_ns", $"event_id", $"event_type")
    val (mn, mx) = ev.agg(min($"ts_ns"), max($"ts_ns")).as[(Long, Long)].collect()(0)
    val step = (mx - mn) / 4 + 1
    (0 until 4).foreach { i =>
      ev.filter($"ts_ns" >= mn + i * step && $"ts_ns" < mn + (i + 1) * step)
        .coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(100) // distinct mtimes → deterministic oldest-first file order
    }
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getPath)
      .as[streaming.Streaming.EvT]
    val q = streaming.Streaming.transitionsDs(stream)
      .writeStream.format("memory").queryName("graft_multibatch_trans")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(q.recentProgress.count(_.numInputRows > 0) == 4,
      "each time-sliced file should form its own micro-batch")
    val streamed = spark.table("graft_multibatch_trans")
      .groupBy($"prev_type", $"event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n")).toMap
    val batch = SparkEntry.queries("q_transition_matrix")(spark, sf).collect()
      .map(r => (r.getAs[String]("prev_type"), r.getAs[String]("event_type")) ->
        r.getAs[Long]("n")).toMap
    assert(streamed == batch,
      "pairs spanning micro-batch boundaries must form via carried state")
  }

  // ---- event paths ---------------------------------------------------------

  test("q_event_paths: path counts conserve the timeline-window identity") {
    val rows = SparkEntry.queries("q_event_paths")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val ns = rows.map(_.getAs[Long]("n"))
    assert(ns.toSeq == ns.sorted.reverse.toSeq, "heaviest paths first")
    // total 3-windows = sum over users of max(0, events - 2); the top-20
    // can only cover at most that many
    val ev = Tables.events(spark, sf)
    val perUser = ev.groupBy("user_id").count().collect().map(_.getLong(1))
    val windows = perUser.map(n => math.max(0L, n - 2)).sum
    assert(ns.sum <= windows)
    // and with only 5 event types, 20 of 125 possible paths must cover
    // a nontrivial share of all windows on this corpus
    assert(ns.sum * 5 > windows, s"top-20 covers ${ns.sum} of $windows")
  }

  // ---- priority sampling ---------------------------------------------------

  test("q_weighted_sample: HT estimate tracks the true total; rerun reproduces") {
    val r = SparkEntry.queries("q_weighted_sample")(spark, sf).head()
    val (total, est) = (r.getAs[Double]("total_exact"), r.getAs[Double]("est"))
    assert(r.getAs[Long]("n_docs") > 50)
    // k=50 → rel. std ≈ 1/√(k−1) ≈ 14%; this fixed draw sits at ~2.4σ
    // on the tiny sf0.001 corpus (−0.5% at sf0.1), so bound at ~3.5σ
    assert(math.abs(est - total) < total * 0.50, s"est $est vs total $total")
    assert(r.getAs[Double]("err") == est - total)
    // deterministic u => the estimate is byte-identical across runs
    val again = SparkEntry.queries("q_weighted_sample")(spark, sf).head()
    assert(again.getAs[Double]("est") == est)
  }

  // ---- KMV distinct sketch -------------------------------------------------

  test("q_kmv_distinct: small populations exact, estimator within KMV error") {
    val r = SparkEntry.queries("q_kmv_distinct")(spark, sf).head()
    val (exact, nh) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hashes"))
    val est = r.getAs[Double]("est")
    assert(nh == math.min(256L, exact))
    if (exact < 256) assert(est == exact.toDouble,
      "below k distinct keys the sketch must return the exact count")
    else assert(math.abs(est - exact) < exact * 0.25,
      s"KMV estimate $est outside 4 sigma of $exact")
    assert(r.getAs[Double]("err") == est - exact)
  }

  // ---- market basket -------------------------------------------------------

  test("q_copurchase_pairs: supports and lift match a from-scratch recount") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_copurchase_pairs")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 20)
    val items = Tables.lineitem(spark, sf)
      .select(col("l_orderkey").as("o"), col("l_suppkey").as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val orders = items.map(_._1).distinct.length
    val supp = items.groupBy(_._2).view.mapValues(_.length).toMap
    val pairCount = items.groupBy(_._1).values.flatMap { g =>
      val ps = g.map(_._2).sorted
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).view.mapValues(_.size).toMap
    for (r <- rows) {
      val (pa, pb) = (r.getAs[Long]("pa"), r.getAs[Long]("pb"))
      assert(pa < pb)
      val nab = r.getAs[Long]("n_ab")
      assert(nab >= 5 && nab == pairCount((pa, pb)))
      assert(r.getAs[Long]("n_a") == supp(pa) && r.getAs[Long]("n_b") == supp(pb))
      assert(r.getAs[Double]("lift") ==
        nab.toDouble * orders / (supp(pa).toDouble * supp(pb)))
    }
  }

  // ---- ranking-function family ---------------------------------------------

  test("q_rank_functions: tie semantics hold within every partition") {
    val rows = SparkEntry.queries("q_rank_functions")(spark, sf).collect()
    assert(rows.nonEmpty)
    for ((_, part) <- rows.groupBy(_.getAs[String]("l_returnflag"))) {
      val n = part.length
      val sorted = part.sortBy(_.getAs[Long]("rn"))
      assert(sorted.map(_.getAs[Long]("rn")).toSeq == (1L to n), "rn must be 1..n")
      for (r <- sorted) {
        val (rk, drk, qty) = (r.getAs[Long]("rk"), r.getAs[Long]("drk"),
          r.getAs[Double]("l_quantity"))
        assert(drk <= rk, "dense_rank never exceeds rank")
        assert(r.getAs[Double]("prk") == (rk - 1).toDouble / (n - 1))
        // cume_dist = fraction of rows with quantity <= this row's
        val cd = part.count(_.getAs[Double]("l_quantity") <= qty).toDouble / n
        assert(r.getAs[Double]("cd") == cd)
      }
      // rank jumps after tie groups; dense_rank is consecutive over groups
      val distinctQ = part.map(_.getAs[Double]("l_quantity")).distinct.length
      assert(sorted.map(_.getAs[Long]("drk")).max == distinctQ)
      // ntile(4) buckets differ by at most one in size
      val sizes = part.groupBy(_.getAs[Long]("quartile")).values.map(_.length)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  // ---- self-join size estimation -------------------------------------------

  test("q_selfjoin_size: the CMS inner product never undercounts F2") {
    val r = SparkEntry.queries("q_selfjoin_size")(spark, sf).head()
    val (exact, est) = (r.getAs[Long]("f2_exact"), r.getAs[Long]("f2_est"))
    assert(est >= exact, s"AMS-style estimate must overcount: est=$est < F2=$exact")
    assert(r.getAs[Long]("overcount") == est - exact)
    // w=1024 buckets on this key cardinality: the estimate is tight
    assert(est <= exact * 2, s"estimate $est implausibly loose vs F2 $exact")
  }

  // ---- incremental aggregate maintenance -----------------------------------

  test("q_incremental_agg: stored + delta merge equals the full recompute") {
    import org.apache.spark.sql.functions._
    import graft.OracleMath.dsum
    val rows = SparkEntry.queries("q_incremental_agg")(spark, sf).collect()
    val full = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("s"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(rows.map(_.getAs[String]("event_type")).toSet == full.keySet)
    for (r <- rows) {
      val (n, s) = full(r.getAs[String]("event_type"))
      assert(r.getAs[Long]("n_total") == n)
      assert(r.getAs[Double]("sum_total") == s,
        "decimal merge must be bit-identical to the full decimal sum")
      assert(r.getAs[Long]("n_shards") >= 1 && r.getAs[Long]("n_shards") <= 2)
    }
  }

  // ---- OLS regression ------------------------------------------------------

  test("q_regression: matches a from-scratch exact-moment recomputation") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_regression")(spark, sf).collect()
    assert(rows.nonEmpty)
    val data = Tables.lineitem(spark, sf)
      .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .collect()
      .groupBy(_.getString(0))
    for (r <- rows) {
      val g = data(r.getAs[String]("l_returnflag"))
      val xs = g.map(row => math.floor(row.getDouble(1) * 100 + 0.5).toLong)
      val ys = g.map(row => math.floor(row.getDouble(2) * 100 + 0.5).toLong)
      val n = xs.length.toLong
      val (sx, sy) = (BigInt(xs.sum), BigInt(ys.sum))
      val sxx = xs.map(v => BigInt(v) * v).sum
      val syy = ys.map(v => BigInt(v) * v).sum
      val sxy = xs.zip(ys).map { case (a, b) => BigInt(a) * b }.sum
      val num = (n * sxy - sx * sy).toDouble
      val denx = (n * sxx - sx * sx).toDouble
      val deny = (n * syy - sy * sy).toDouble
      assert(r.getAs[Long]("n") == n)
      assert(math.abs(r.getAs[Double]("slope") - num / denx) < 1e-9)
      assert(math.abs(r.getAs[Double]("r") - num / math.sqrt(denx * deny)) < 1e-9)
      val icept = (sy.toDouble - num / denx * sx.toDouble) / n / 100.0
      assert(math.abs(r.getAs[Double]("intercept") - icept) < 1e-6)
      assert(r.getAs[Double]("r") >= -1.0 && r.getAs[Double]("r") <= 1.0)
    }
  }

  // ---- HLL intersection ----------------------------------------------------

  test("q_hll_intersect: inclusion-exclusion identity and sane estimates") {
    val r = SparkEntry.queries("q_hll_intersect")(spark, sf).head()
    val (a, b, u) = (r.getAs[Double]("est_a"), r.getAs[Double]("est_b"),
      r.getAs[Double]("est_union"))
    assert(u <= a + b + 1e-9, "union estimate cannot exceed the sum of parts")
    assert(u >= math.max(a, b) - u * 0.05, "union must cover each side (within sketch error)")
    assert(r.getAs[Double]("est_intersect") == a + b - u)
    assert(r.getAs[Double]("err") == a + b - u - r.getAs[Long]("n_exact"))
    // m=4096 registers: each estimate within ~5% of its exact side here
    val exact = r.getAs[Long]("n_exact")
    if (exact >= 100)
      assert(math.abs(r.getAs[Double]("est_intersect") - exact) < exact * 0.15,
        s"intersection estimate ${r.getAs[Double]("est_intersect")} vs exact $exact")
  }

  // ---- calendar rollup -----------------------------------------------------

  test("q_calendar_rollup: conserves orders and computes YoY exactly") {
    import org.apache.spark.sql.functions._
    val rows = SparkEntry.queries("q_calendar_rollup")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_orders")).sum == Tables.orders(spark, sf).count())
    val byYm = rows.map(r => (r.getAs[Int]("y"), r.getAs[Int]("m")) -> r).toMap
    val firstYear = rows.map(_.getAs[Int]("y")).min
    for (r <- rows) {
      val (y, m) = (r.getAs[Int]("y"), r.getAs[Int]("m"))
      byYm.get((y - 1, m)) match {
        case Some(prev) =>
          val want = r.getAs[Double]("revenue") / prev.getAs[Double]("revenue") - 1.0
          assert(r.getAs[Double]("yoy_growth") == want, s"YoY mismatch at $y-$m")
        case None =>
          assert(r.isNullAt(r.fieldIndex("yoy_growth")),
            s"$y-$m has no prior-year month yet reports growth")
          assert(y == firstYear || !byYm.contains((y - 1, m)))
      }
    }
  }

  // ---- eval-safe curriculum pipeline ---------------------------------------

  test("pipeline_curriculum: exactly the train side, ordered, leakage-free") {
    val cur = SparkEntry.queries("pipeline_curriculum")(spark, sf).collect()
    val split = SparkEntry.queries("q_leakage_split")(spark, sf).collect()
    val train = split.filter(_.getAs[String]("split") == "train")
      .map(_.getAs[Long]("doc_id")).toSet
    assert(cur.map(_.getAs[Long]("doc_id")).toSet == train,
      "curriculum must contain exactly the train docs")
    assert(cur.map(_.getAs[Long]("position")).toSeq == (1L to train.size).toSeq)
    val tiers = cur.sortBy(_.getAs[Long]("position")).map(_.getAs[Int]("tier_rank")).toSeq
    assert(tiers == tiers.sorted)
    // structural leakage guarantee: no near-dup pair straddles the
    // curriculum and the heldout side
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
    for (p <- pairs) {
      val (a, b) = (p.getAs[Long]("doc_a"), p.getAs[Long]("doc_b"))
      assert(train.contains(a) == train.contains(b),
        s"near-dup pair ($a,$b) straddles the curriculum/heldout boundary")
    }
  }

  // ---- curriculum ordering -------------------------------------------------

  test("q_curriculum_order: a deterministic permutation, clean tiers first") {
    val rows = SparkEntry.queries("q_curriculum_order")(spark, sf).collect()
    val total = Tables.documents(spark, sf).count()
    assert(rows.length == total)
    val positions = rows.map(_.getAs[Long]("position")).toSeq
    assert(positions == (1L to total).toSeq, "positions must be 1..N in order")
    // tier blocks are contiguous and ascending (0 = clean first)
    val tiers = rows.map(_.getAs[Int]("tier_rank")).toSeq
    assert(tiers == tiers.sorted, "curriculum must emit whole tiers in order")
    // deterministic: a second run reproduces the byte-identical order
    val again = SparkEntry.queries("q_curriculum_order")(spark, sf).collect()
    assert(rows.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }
}
