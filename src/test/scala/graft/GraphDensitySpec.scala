package graft

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.mutable

/** Brute-force recomputation of the density/decomposition graph ops
  * (q_kcore onion peel, sim_dbscan roles+clusters) in plain Scala from
  * the same pair sets the operators consume.
  */
class GraphDensitySpec extends AnyFunSuite {
  import TestSession._

  test("q_kcore: layers match a sequential peel; 2-core is internally dense") {
    val got = SparkEntry.queries("q_kcore")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    assert(got.keySet == adj.keySet.toSet)
    got.foreach { case (id, (d0, _)) => assert(d0 == adj(id).size, s"$id deg0") }
    // sequential peel, capped at the operator's fixed 8 rounds
    var alive = adj.keySet.toSet
    val layer = mutable.Map.empty[Long, Int]
    var t = 1
    var changed = true
    while (t <= 8 && changed) {
      val next = alive.filter(v => adj(v).count(alive) >= 2)
      val removed = alive -- next
      changed = removed.nonEmpty
      removed.foreach(layer(_) = t)
      alive = next
      t += 1
    }
    got.foreach { case (id, (_, l)) =>
      assert(l == layer.getOrElse(id, 0), s"$id layer")
    }
    // every survivor keeps >= 2 surviving neighbors (the 2-core property)
    val core = got.collect { case (id, (_, 0)) => id }.toSet
    core.foreach(v => assert(adj(v).count(core) >= 2, s"$v not 2-core-dense"))
  }

  test("q_link_prediction: neighbor-Jaccard candidates match brute force") {
    val got = SparkEntry.queries("q_link_prediction")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    assert(got.keySet == adj.keySet.toSet)
    // brute-force: all non-adjacent pairs with >=1 common neighbor
    val nodes = adj.keySet.toVector.sorted
    val cand = for {
      a <- nodes; b <- nodes if a < b && !adj(a)(b)
      common = (adj(a) & adj(b)).size if common > 0
    } yield (a, b, common.toLong * 1000000L / (adj(a).size + adj(b).size - common))
    val byNode = cand.flatMap { case (a, b, s) => Seq(a -> (b, s), b -> (a, s)) }
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    got.foreach { case (v, (deg, nCand, best, partner)) =>
      assert(deg == adj(v).size, s"$v deg")
      val cs = byNode.getOrElse(v, Vector.empty)
      assert(nCand == cs.size, s"$v n_cand")
      if (cs.isEmpty) assert(best == 0L && partner == -1L, s"$v empty")
      else {
        val (bp, bs) = cs.minBy { case (p, s) => (-s, p) }
        assert(best == bs, s"$v best score")
        assert(partner == bp, s"$v best partner")
      }
    }
  }

  test("q_feature_backfill: strict-past trailing features match brute force") {
    val got = SparkEntry.queries("q_feature_backfill")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), Seq(3, 4, 5, 6, 7).map(r.getLong), r.getDouble(8))).toMap
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "ts_ns div 1000 as ts_us", "value")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3), r.getDouble(4)))
    val week = 7L * 24 * 3600 * 1000000L
    val byUser = ev.groupBy(_._1)
    val purchases = ev.filter(_._3 == "purchase")
    assert(got.keySet == purchases.map(p => (p._1, p._2)).toSet)
    purchases.foreach { case (u, eid, _, ts, _) =>
      val (gotTs, counts, spend) = got((u, eid))
      assert(gotTs == ts)
      val frame = byUser(u).filter(e => e._4 >= ts - week && e._4 < ts)
      val expCounts = Seq("view", "click", "signup", "error", "purchase")
        .map(t => frame.count(_._3 == t).toLong)
      assert(counts == expCounts, s"($u,$eid) counts")
      val expSpend = frame.filter(_._3 == "purchase")
        .map(e => BigDecimal(e._5).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
      assert(spend == expSpend, s"($u,$eid) spend")
    }
  }

  test("q_label_prop: 5-round synchronous LPA matches a sequential replay") {
    val got = SparkEntry.queries("q_label_prop")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getBoolean(1), r.getInt(2), r.getInt(3)))
      .toMap
    val pairs = SparkEntry.queries("dedup_embedding")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val truth = Tables.embeddings(spark, sf).select("vec_id", "label")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.keySet == truth.keySet)
    val seed = truth.map { case (v, l) => v -> (if (v % 5 == 0) -1 else l) }
    var cur = seed
    for (_ <- 1 to 5) {
      cur = truth.keys.map { v =>
        v -> (if (seed(v) != -1) seed(v)
        else {
          val votes = adj.getOrElse(v, mutable.Set.empty[Long]).toSeq
            .map(cur).filter(_ != -1)
          if (votes.isEmpty) -1
          else votes.groupBy(identity).view.mapValues(_.size).toSeq
            .minBy { case (l, c) => (-c, l) }._1
        })
      }.toMap
    }
    got.foreach { case (v, (isSeed, tl, pl)) =>
      assert(isSeed == (v % 5 != 0), s"$v seed flag")
      assert(tl == truth(v), s"$v truth")
      assert(pl == cur(v), s"$v prediction")
    }
    // seeds must pass through untouched
    got.collect { case (v, (true, tl, pl)) => assert(pl == tl, s"$v seed label") }
  }

  test("q_recommend: item-item CF top-3 matches a brute-force replay") {
    val got = SparkEntry.queries("q_recommend")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val li = Tables.lineitem(spark, sf).select("l_orderkey", "l_partkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val custOf = Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val oi = li.distinct
    // undirected pair counts with the support-2 floor
    val byOrder = oi.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    val counts = mutable.Map.empty[(Long, Long), Long]
    byOrder.values.foreach { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        counts((ps(i), ps(j))) = counts.getOrElse((ps(i), ps(j)), 0L) + 1
    }
    val floored = counts.filter(_._2 >= 2)
    val sym = floored.toSeq.flatMap { case ((a, b), n) => Seq((a, b, n), (b, a, n)) }
    val top10 = sym.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, nbr, n) => (-n, nbr) }.take(10)).toMap
    val baskets = li.map { case (o, p) => (custOf(o), p) }.distinct
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = baskets.toSeq.flatMap { case (c, ps) =>
      val cand = ps.toSeq.flatMap(p => top10.getOrElse(p, Seq.empty))
        .filter { case (_, nbr, _) => !ps(nbr) }
        .groupBy(_._2).view
        .mapValues(rows => (rows.map(_._3).sum, rows.size.toLong)).toSeq
        .sortBy { case (nbr, (score, _)) => (-score, nbr) }
        .take(3)
      cand.zipWithIndex.map { case ((nbr, (score, paths)), i) =>
        (c, i + 1) -> (nbr, score, paths)
      }
    }.toMap
    assert(got == exp, s"got ${got.size} rows, expected ${exp.size}")
  }

  test("q_rolling_actives: exact trailing-7-day distincts match brute force") {
    val got = SparkEntry.queries("q_rolling_actives")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val days = Tables.events(spark, sf)
      .selectExpr("user_id", "ts_ns div 86400000000000 as day").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val maxDay = days.map(_._2).max
    val allDays = days.map(_._2).min to maxDay
    val byUser = days.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val exp = allDays.map { d =>
      val active7 = byUser.count(_._2.exists(ad => ad <= d && ad >= d - 6))
      val active1 = byUser.count(_._2.contains(d))
      d -> (active1.toLong, active7.toLong)
    }.filter(_._2._2 > 0).toMap
    assert(got == exp,
      s"got ${got.size} days, expected ${exp.size}; " +
        s"diff=${(got.toSet diff exp.toSet).take(3)}")
  }

  test("q_churn_labels: strict-future windows match brute force and pair " +
      "leakage-free with the backfill") {
    val got = SparkEntry.queries("q_churn_labels")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getBoolean(3), r.getLong(4), r.getLong(5))).toMap
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_id", "event_type", "ts_ns div 1000 as ts_us")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val horizon = 14L * 24 * 3600 * 1000000L
    val byUser = ev.groupBy(_._1)
    val purchases = ev.filter(_._3 == "purchase")
    assert(got.keySet == purchases.map(p => (p._1, p._2)).toSet)
    purchases.foreach { case (u, eid, _, ts) =>
      val (gotTs, label, nP, nE) = got((u, eid))
      assert(gotTs == ts)
      val future = byUser(u).filter(e => e._4 > ts && e._4 <= ts + horizon)
      assert(nP == future.count(_._3 == "purchase"), s"($u,$eid) purchases")
      assert(nE == future.size.toLong, s"($u,$eid) events")
      assert(label == (nP > 0), s"($u,$eid) label")
    }
    // composition invariant: backfill features + churn labels share the
    // exact same key set — the leakage-safe training table is a 1:1 join
    val feat = SparkEntry.queries("q_feature_backfill")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(feat == got.keySet, "feature/label key sets diverge")
  }

  test("q_funnel_latency: pinned percentiles match a sequential funnel walk") {
    val got = SparkEntry.queries("q_funnel_latency")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "event_type", "ts_ns div 1000 as ts_us").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val lat1 = mutable.ArrayBuffer.empty[(Long, Long)]
    val lat2 = mutable.ArrayBuffer.empty[(Long, Long)]
    byUser.foreach { case (u, es) =>
      val vs = es.filter(_._2 == "view").map(_._3)
      if (vs.nonEmpty) {
        val vt = vs.min
        val cs = es.filter(e => e._2 == "click" && e._3 > vt).map(_._3)
        if (cs.nonEmpty) {
          val ct = cs.min
          lat1 += ((ct - vt, u))
          val ps = es.filter(e => e._2 == "purchase" && e._3 > ct).map(_._3)
          if (ps.nonEmpty) lat2 += ((ps.min - ct, u))
        }
      }
    }
    def pinned(xs: Seq[(Long, Long)], q: Double): Long = {
      val s = xs.sorted
      s(math.ceil(q * s.size).toInt - 1)._1
    }
    for ((stage, lats) <- Seq("1_view_to_click" -> lat1.toSeq,
        "2_click_to_purchase" -> lat2.toSeq)) {
      val (n, mn, p50, p90, mx) = got(stage)
      assert(n == lats.size, s"$stage n")
      assert(mn == lats.map(_._1).min && mx == lats.map(_._1).max, s"$stage ends")
      assert(p50 == pinned(lats, 0.5), s"$stage p50")
      assert(p90 == pinned(lats, 0.9), s"$stage p90")
    }
  }

  test("q_time_split: purged boundaries match brute force; segments conserve") {
    val got = SparkEntry.queries("q_time_split")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val ev = Tables.events(spark, sf)
      .selectExpr("user_id", "ts_ns div 1000 as ts_us").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val n = ev.length
    val sortedTs = ev.map(_._2).sorted
    val t70 = sortedTs(math.ceil(0.7 * n).toInt - 1)
    val t85 = sortedTs(math.ceil(0.85 * n).toInt - 1)
    val purge = 24L * 3600 * 1000000L
    def seg(ts: Long): String =
      if (ts <= t70 - purge) "1_train" else if (ts <= t70) "2_purge"
      else if (ts <= t85 - purge) "3_val" else if (ts <= t85) "4_purge"
      else "5_test"
    val exp = ev.groupBy(e => seg(e._2)).map { case (k, es) =>
      k -> (es.length.toLong, es.map(_._1).distinct.length.toLong,
        es.map(_._2).min, es.map(_._2).max)
    }
    assert(got == exp)
    // conservation + ordering invariants
    assert(got.values.map(_._1).sum == n)
    val ranges = got.toSeq.sortBy(_._1).map(_._2)
    ranges.sliding(2).foreach { case Seq(a, b) => assert(a._4 < b._3) }
    // the purge gap really is at most a day wide
    assert(got("2_purge")._4 - got("2_purge")._3 <= purge)
  }

  test("q_hits: 3-round exact power iteration matches a BigInt replay") {
    val got = SparkEntry.queries("q_hits")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val edges = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf),
        org.apache.spark.sql.functions.expr("l_orderkey = o_orderkey"))
      .select("o_custkey", "l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byCust = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val byPart = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    var hub = byCust.keys.map(_ -> BigInt(1)).toMap
    var auth = Map.empty[Long, BigInt]
    for (_ <- 1 to 3) {
      auth = byPart.map { case (p, cs) => p -> cs.map(hub).sum }
      hub = byCust.map { case (c, ps) => c -> ps.map(auth).sum }
    }
    val am = auth.values.max
    val hm = hub.values.max
    def top20(m: Map[Long, BigInt], mx: BigInt): Seq[(Int, Long, Long)] =
      m.toSeq.map { case (id, v) => (id, (v * 1000000000L / mx).toLong) }
        .sortBy { case (id, s) => (-s, id) }.take(20)
        .zipWithIndex.map { case ((id, s), i) => (i + 1, id, s) }
    top20(auth, am).foreach { case (rk, id, s) =>
      assert(got(("authority", rk)) == ((id, s)), s"auth rank $rk") }
    top20(hub, hm).foreach { case (rk, id, s) =>
      assert(got(("hub", rk)) == ((id, s)), s"hub rank $rk") }
  }

  test("stream_rolling_actives equals the batch DAU/WAU series exactly") {
    val streamed = SparkEntry.queries("stream_rolling_actives")(spark, sf)
      .collect().map(_.toSeq).toSeq
    val batch = SparkEntry.queries("q_rolling_actives")(spark, sf)
      .collect().map(_.toSeq).toSeq
    assert(streamed == batch,
      "drained activity state must reproduce the batch rolling series")
  }

  test("q_pca_power: quantized moments + 6-round iteration match a replay") {
    val got = SparkEntry.queries("q_pca_power")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(_._1).toSeq == (0L until 64L))
    val emb = Tables.embeddings(spark, sf).select("embedding").collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val n = emb.length
    def q(x: Double, s: Double): BigInt =
      BigInt(math.floor(x * s + 0.5).toLong)
    val sk = Array.tabulate(64)(i => emb.map(e => q(e(i), 1e6)).sum)
    val mat = Array.tabulate(64, 64)((i, j) =>
      BigInt(n) * emb.map(e => q(e(i) * e(j), 1e12)).sum - sk(i) * sk(j))
    var vec = Array.fill(64)(BigInt(1000000000L))
    for (_ <- 1 to 6) {
      val u = Array.tabulate(64)(i =>
        (0 until 64).map(j => mat(i)(j) * vec(j)).sum)
      val mx = u.map(_.abs).max
      vec = u.map(x => x.sign * (x.abs * 1000000000L / mx))
    }
    assert(got.map(_._2).toSeq == vec.map(_.toLong).toSeq, "loadings")
    val vr = vec.map(x => x.sign * (x.abs / 1000000))
    val uf = Array.tabulate(64)(i =>
      (0 until 64).map(j => mat(i)(j) * vr(j)).sum)
    val num = (0 until 64).map(i => vr(i) * uf(i)).sum
    val den = vr.map(x => x * x).sum
    val tr = (0 until 64).map(i => mat(i)(i)).sum
    val evr = BigDecimal(num.toDouble / den.toDouble / tr.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (_, _, e) => assert(e == evr, "evr6") }
    assert(evr > 0 && evr <= 1.0)
    // the dominant loading must be at full scale (max-normalized)
    assert(vec.map(_.abs).max == BigInt(1000000000L))
  }

  test("q_embedding_norms: per-label norm stats match a per-row recompute") {
    val got = SparkEntry.queries("q_embedding_norms")(spark, sf).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5))).toMap
    val rows = Tables.embeddings(spark, sf)
      .select("label", "vec_id", "embedding").collect()
      .map(r => (r.getInt(0), r.getLong(1),
        r.getSeq[Float](2).map(_.toDouble).toArray))
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    rows.groupBy(_._1).foreach { case (lab, es) =>
      val (n, nZero, mn, p50, mx) = got(lab)
      // left-to-right fold — the engines' shared accumulation order
      val n2s = es.map { case (_, id, e) =>
        (e.foldLeft(0.0)((a, x) => a + x * x), id)
      }
      assert(n == es.length)
      assert(nZero == n2s.count(_._1 == 0.0))
      assert(mn == r6(math.sqrt(n2s.map(_._1).min)), s"$lab min")
      assert(mx == r6(math.sqrt(n2s.map(_._1).max)), s"$lab max")
      val sorted = n2s.sortBy(identity)
      assert(p50 == r6(math.sqrt(
        sorted(math.ceil(0.5 * sorted.length).toInt - 1)._1)), s"$lab p50")
    }
  }

  test("q_dedup_impact: per-source rates match the pairwise-greedy rule") {
    val got = SparkEntry.queries("q_dedup_impact")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val inGraph = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    val dropped = pairs.map(_._2).toSet
    val docs = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.keySet == docs.map(_._2).toSet)
    docs.groupBy(_._2).foreach { case (src, ds) =>
      val (n, nIg, nDr, dupM, dropM) = got(src)
      assert(n == ds.length)
      assert(nIg == ds.count(d => inGraph(d._1)), s"$src in-graph")
      assert(nDr == ds.count(d => dropped(d._1)), s"$src dropped")
      assert(dupM == nIg * 1000000L / n && dropM == nDr * 1000000L / n)
      assert(nDr <= nIg)
    }
  }

  test("q_markov_stationary: floor-quotient iteration matches a replay " +
      "and agrees with the transition matrix") {
    val got = SparkEntry.queries("q_markov_stationary")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val tm = SparkEntry.queries("q_transition_matrix")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val states = tm.keys.map(_._1).toSeq.distinct.sorted
    val r = states.map(st =>
      st -> tm.collect { case ((p, _), n) if p == st => n }.sum).toMap
    got.foreach { case (st, (nOut, _)) => assert(nOut == r(st), s"$st n_out") }
    var v = states.map(_ -> BigInt(1000000000L)).toMap
    for (_ <- 1 to 8) {
      v = states.map { nx =>
        nx -> states.map(pv =>
          v(pv) * BigInt(tm.getOrElse((pv, nx), 0L)) / BigInt(r(pv))).sum
      }.toMap
    }
    val tot = states.map(v).sum
    states.foreach { st =>
      assert(got(st)._2 == (v(st) * 1000000 / tot).toLong, s"$st pi")
    }
    // shares sum to ~1 (floor slack only)
    val share = got.values.map(_._2).sum
    assert(share >= 999995L && share <= 1000000L)
  }

  test("q_new_vs_returning: tenure split conserves weekly revenue") {
    val got = SparkEntry.queries("q_new_vs_returning")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    val orders = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 604800000000 AS BIGINT) as week",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) as cents")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val firstWeek = orders.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val byWeek = orders.groupBy(_._2)
    assert(got.map(_._1).toSet == byWeek.keySet)
    got.foreach { case (wk, (nNew, nRet, cNew, cRet, share)) =>
      val custs = byWeek(wk).groupBy(_._1).view
        .mapValues(_.map(_._3).sum).toMap
      val (newC, retC) = custs.partition { case (c, _) => firstWeek(c) == wk }
      assert(nNew == newC.size && nRet == retC.size, s"week $wk counts")
      assert(cNew == newC.values.sum && cRet == retC.values.sum, s"week $wk cents")
      assert(share == cNew * 1000000L / (cNew + cRet), s"week $wk share")
    }
  }

  test("q_percentile_trend: weekly pinned percentiles match brute force") {
    val got = SparkEntry.queries("q_percentile_trend")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4))).toMap
    val orders = Tables.orders(spark, sf)
      .selectExpr(
        "CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 604800000000 AS BIGINT) as week",
        "o_totalprice", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    orders.groupBy(_._1).foreach { case (wk, rows) =>
      val (n, p50, p95, mx) = got(wk)
      assert(n == rows.length)
      val sorted = rows.map(t => (t._2, t._3)).sorted
      def pin(q: Double) = sorted(math.ceil(q * sorted.length).toInt - 1)._1
      assert(p50 == pin(0.5), s"week $wk p50")
      assert(p95 == pin(0.95), s"week $wk p95")
      assert(mx == sorted.last._1)
    }
  }

  test("recommender neighbor lists: queries after staging run zero builds") {
    import graft.operators.Relational
    SparkEntry.queries("q_recommend")(spark, sf).count()
    SparkEntry.queries("q_recommend_eval")(spark, sf).count()
    val before = Relational.nbrStageRuns.get()
    assert(SparkEntry.queries("q_recommend")(spark, sf).count() > 0)
    assert(SparkEntry.queries("q_recommend_eval")(spark, sf).count() > 0)
    assert(Relational.nbrStageRuns.get() == before,
      "a query path re-ran the co-occurrence build instead of reading " +
        "the staged neighbor lists")
  }

  test("q_recommend_eval: metrics cohere and the split boundary is exact") {
    val Seq(row) = SparkEntry.queries("q_recommend_eval")(spark, sf)
      .collect().toSeq
    val (recd, eval_, hitU, recRows, recHits, hr, p3) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getLong(4), row.getLong(5), row.getLong(6))
    assert(eval_ <= recd && hitU <= eval_ && recHits <= recRows)
    assert(recRows <= 3 * eval_)
    assert(hr == hitU * 1000000L / eval_)
    assert(p3 == recHits * 1000000L / recRows)
    // a hit user needs at least one matched rec row
    assert((hitU > 0) == (recHits > 0))
    // boundary replay: 75% count position of the order-date multiset
    val ts = Tables.orders(spark, sf)
      .selectExpr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").collect()
      .map(_.getLong(0)).sorted
    val t75 = ts(math.ceil(0.75 * ts.length).toInt - 1)
    val nTrain = ts.count(_ <= t75)
    assert(nTrain >= math.ceil(0.75 * ts.length).toInt)
  }

  test("sim_dbscan: roles and clusters match union-find over the pair set") {
    val got = SparkEntry.queries("sim_dbscan")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2), r.getLong(3)))
      .toMap
    val pairs = SparkEntry.queries("dedup_embedding")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val adj = mutable.Map.empty[Long, mutable.Set[Long]]
    pairs.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.Set.empty) += b
      adj.getOrElseUpdate(b, mutable.Set.empty) += a
    }
    val allVecs = Tables.embeddings(spark, sf).select("vec_id").collect()
      .map(_.getLong(0)).toSet
    assert(got.keySet == allVecs)
    val core = adj.keySet.filter(v => adj(v).size >= 2).toSet
    // min reachable id within the core-core subgraph
    def coreLabel(v: Long): Long = {
      val seen = mutable.Set(v)
      val q = mutable.Queue(v)
      while (q.nonEmpty) {
        val x = q.dequeue()
        adj(x).filter(core).foreach(y => if (seen.add(y)) q.enqueue(y))
      }
      seen.min
    }
    got.foreach { case (id, (deg, role, cluster)) =>
      assert(deg == adj.get(id).map(_.size).getOrElse(0), s"$id deg")
      if (core(id)) {
        assert(role == "core", s"$id role")
        assert(cluster == coreLabel(id), s"$id cluster")
      } else if (adj.get(id).exists(_.exists(core))) {
        assert(role == "border", s"$id role")
        assert(cluster == adj(id).filter(core).map(coreLabel).min, s"$id cluster")
      } else {
        assert(role == "noise", s"$id role")
        assert(cluster == -1L, s"$id cluster")
      }
    }
  }

  test("q_assortativity: degree Pearson r matches a BigInt-moment replay") {
    val r = SparkEntry.queries("q_assortativity")(spark, sf).head()
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1)))
    val deg = (pairs.map(_._1) ++ pairs.map(_._2))
      .groupBy(identity).view.mapValues(g => BigInt(g.length)).toMap
    val xy = pairs.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a))) }
    val n = BigInt(xy.length)
    val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
    val sxx = xy.map(t => t._1 * t._1).sum
    val syy = xy.map(t => t._2 * t._2).sum
    val sxy = xy.map(t => t._1 * t._2).sum
    assert(r.getAs[Long]("n_edges") == pairs.length.toLong)
    assert(r.getAs[Long]("deg_sum") == sx.toLong)
    val denx = (n * sxx - sx * sx).toDouble
    val deny = (n * syy - sy * sy).toDouble
    if (denx > 0 && deny > 0) {
      val exp = (n * sxy - sx * sy).toDouble / math.sqrt(denx * deny)
      assert(r.getAs[Double]("r6") ==
        BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(math.abs(r.getAs[Double]("r6")) <= 1.0)
    } else assert(r.isNullAt(r.fieldIndex("r6")))
  }

  test("q_modularity: per-source contributions and overall Q match BigInt replay") {
    val got = SparkEntry.queries("q_modularity")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val srcOf = Tables.documents(spark, sf).select("doc_id", "source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val m = BigInt(pairs.length)
    val edges = pairs.map { case (a, b) => (srcOf(a), srcOf(b)) }
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).view.mapValues(g => BigInt(g.length)).toMap
    val intra = edges.filter(e => e._1 == e._2)
      .groupBy(_._1).view.mapValues(g => BigInt(g.length)).toMap
    val nNodes = pairs.flatMap(p => Seq(p._1, p._2)).distinct
      .groupBy(srcOf).view.mapValues(_.length.toLong).toMap
    def shiftedFloor(num: BigInt): Long = {
      val den = 4 * m * m
      ((num + den) * 1000000 / den - 1000000).toLong
    }
    assert(got.keySet == deg.keySet + "ALL")
    deg.keySet.foreach { s =>
      val e = intra.getOrElse(s, BigInt(0))
      val d = deg(s)
      val exp = (nNodes(s), e.toLong, d.toLong, shiftedFloor(4 * m * e - d * d))
      assert(got(s) == exp, s"source $s")
    }
    val sq = deg.values.map(d => d * d).sum
    val eAll = intra.values.sum
    val expAll = (nNodes.values.sum, eAll.toLong, (2 * m).toLong,
      shiftedFloor(4 * m * eAll - sq))
    assert(got("ALL") == expAll)
    // sanity: Q is bounded and the per-source rows decompose the graph
    assert(got("ALL")._4 >= -1000000L && got("ALL")._4 <= 1000000L)
  }
}
