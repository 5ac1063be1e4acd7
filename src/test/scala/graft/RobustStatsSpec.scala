package graft

import org.scalatest.funsuite.AnyFunSuite

/** Brute-force recomputation of the robust/inferential stats operators
  * (RobustStats.scala) from raw collected rows — independent of every
  * window/join trick the distributed forms use.
  */
class RobustStatsSpec extends AnyFunSuite {
  import TestSession._

  private def prices(): Map[String, Vector[(Double, Long, Int)]] =
    Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice", "l_orderkey", "l_linenumber")
      .collect()
      .map(r => (r.getString(0), (r.getDouble(1), r.getLong(2), r.getInt(3))))
      .groupBy(_._1).view.mapValues(_.map(_._2).toVector).toMap

  /** Value at position ceil(q*n) of the ascending total order. */
  private def pinned(xs: Vector[(Double, Long, Int)], q: Double): Double = {
    val sorted = xs.sortBy(identity)
    sorted(math.ceil(q * xs.size).toInt - 1)._1
  }

  test("q_mad: medians, MAD, and robust outlier counts match brute force") {
    val got = SparkEntry.queries("q_mad")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toMap
    val raw = prices()
    assert(got.keySet == raw.keySet)
    raw.foreach { case (flag, xs) =>
      val (n, med, mad, nOut) = got(flag)
      assert(n == xs.size)
      assert(med == pinned(xs, 0.5), s"$flag median")
      val devs = xs.map { case (x, k, ln) => (math.abs(x - med), k, ln) }
      assert(mad == pinned(devs, 0.5), s"$flag mad")
      val fence = 3 * 1.4826 * mad
      assert(nOut == devs.count(_._1 > fence), s"$flag outliers")
    }
  }

  test("q_iqr_outliers: Tukey fences and tail counts match brute force") {
    val got = SparkEntry.queries("q_iqr_outliers")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3),
          r.getLong(4), r.getLong(5))).toMap
    val raw = prices()
    assert(got.keySet == raw.keySet)
    raw.foreach { case (flag, xs) =>
      val (n, q1, q3, nLow, nHigh) = got(flag)
      assert(n == xs.size)
      assert(q1 == pinned(xs, 0.25), s"$flag q1")
      assert(q3 == pinned(xs, 0.75), s"$flag q3")
      val lo = q1 - 1.5 * (q3 - q1)
      val hi = q3 + 1.5 * (q3 - q1)
      assert(nLow == xs.count(_._1 < lo), s"$flag n_low")
      assert(nHigh == xs.count(_._1 > hi), s"$flag n_high")
    }
  }

  test("q_chi_square: cells, expectations, and the decimal-summed total") {
    val rows = SparkEntry.queries("q_chi_square")(spark, sf).collect()
      .map(r => ((r.getString(0), r.getString(1)),
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))))
    val obs = Tables.orders(spark, sf)
      .select("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(rows.map(_._1).toSet == obs.keySet)
    val rowTot = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colTot = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val nn = obs.values.sum
    // replay the exact per-cell IEEE expression, then the decimal(18,6)
    // per-cell quantization the engines use for the cross-row total
    val contribs = rows.map { case ((st, pr), (o, exp6, contrib6, _)) =>
      assert(o == obs((st, pr)), s"($st,$pr) obs")
      val exp = (rowTot(st) * colTot(pr)).toDouble / nn
      val contrib = (o - exp) * (o - exp) / exp
      assert(exp6 == BigDecimal(exp).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      assert(contrib6 == BigDecimal(contrib).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
      BigDecimal(contrib).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val chi2 = contribs.sum.toDouble
    rows.foreach { case (_, (_, _, _, c)) => assert(c == chi2, "chi2 total") }
    // df for this 3x5 table; sanity that the statistic is in a sane range
    assert(rowTot.size == 3 && colTot.size == 5)
    assert(chi2 >= 0)
  }

  test("text_readability: counts and FKRE match a per-doc recompute") {
    val got = SparkEntry.queries("text_readability")(spark, sf).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getString(5)))
      .toMap
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.keySet == docs.map(_._1).toSet)
    docs.foreach { case (id, text) =>
      val (nw, ns, nsy, fkre6, band) = got(id)
      val words = text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
      assert(nw == words.length, s"$id words")
      assert(ns == math.max(1, "[.!?]+".r.findAllIn(text).length), s"$id sents")
      assert(nsy == math.max(1,
        "[aeiouy]+".r.findAllIn(text.toLowerCase).length), s"$id syll")
      val fkre = 206.835 - 1.015 * (nw.toDouble / ns) - 84.6 * (nsy.toDouble / nw)
      assert(fkre6 ==
        BigDecimal(fkre).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"$id fkre")
      val expBand =
        if (fkre >= 90) "very_easy" else if (fkre >= 70) "easy"
        else if (fkre >= 50) "medium" else if (fkre >= 30) "difficult"
        else "very_difficult"
      assert(band == expBand, s"$id band")
    }
  }

  test("q_spearman: Pearson over doubled average ranks, recomputed in BigInt") {
    val got = SparkEntry.queries("q_spearman")(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val ev = Tables.events(spark, sf)
      .selectExpr("event_type", "value", "ts_ns div 1000 as ts_us").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    ev.groupBy(_._1).foreach { case (t, rows) =>
      val (n, rho6) = got(t)
      assert(n == rows.length)
      def ranks2[A](xs: Seq[A])(implicit o: Ordering[A]): Seq[Long] = {
        val sorted = xs.sorted
        val firstIdx = sorted.zipWithIndex.groupBy(_._1).map {
          case (v, g) => v -> (g.map(_._2).min + 1, g.length)
        }
        xs.map { v => val (r, c) = firstIdx(v); 2L * r + c - 1 }
      }
      val rx = ranks2(rows.map(_._2).toSeq)
      val ry = ranks2(rows.map(_._3).toSeq)
      val nn = BigInt(rows.length)
      def s(v: Seq[Long]) = v.map(BigInt(_)).sum
      def sp(a: Seq[Long], b: Seq[Long]) =
        a.zip(b).map { case (x, y) => BigInt(x) * BigInt(y) }.sum
      val num = (nn * sp(rx, ry) - s(rx) * s(ry)).toDouble
      val den = math.sqrt((nn * sp(rx, rx) - s(rx) * s(rx)).toDouble *
        (nn * sp(ry, ry) - s(ry) * s(ry)).toDouble)
      val rho = num / den
      assert(rho6 ==
        BigDecimal(rho).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble,
        s"$t rho")
      assert(rho6.abs <= 1.0)
    }
  }

  test("q_mutual_info: quantized MI/NMI match a BigInt replay") {
    val Seq(row) = SparkEntry.queries("q_mutual_info")(spark, sf).collect().toSeq
    val (n, nCells, mi, hx, hy, nmi6) = (row.getLong(0), row.getLong(1),
      row.getLong(2), row.getLong(3), row.getLong(4), row.getDouble(5))
    val obs = Tables.orders(spark, sf)
      .select("o_orderstatus", "o_orderpriority").collect()
      .map(r => (r.getString(0), r.getString(1)))
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(n == obs.values.sum && nCells == obs.size)
    val rt = obs.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val ct = obs.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    def q6(x: Double): Long = math.floor(math.log(x) * 1e6 + 0.5).toLong
    val lnN6 = q6(n.toDouble)
    val miS = obs.map { case ((x, y), c) =>
      BigInt(c) * q6(c.toDouble * n / (rt(x).toDouble * ct(y)))
    }.sum
    def fdiv(a: BigInt, b: Long): Long = { // floor division
      val q = a / b; if (a % b != 0 && a.sign * b.sign < 0) (q - 1).toLong
      else q.toLong
    }
    assert(mi == fdiv(miS, n), "mi_micro")
    assert(hx == lnN6 - fdiv(rt.values.map(c => BigInt(c) * q6(c.toDouble)).sum, n))
    assert(hy == lnN6 - fdiv(ct.values.map(c => BigInt(c) * q6(c.toDouble)).sum, n))
    assert(nmi6 == BigDecimal(mi.toDouble / math.min(hx, hy).toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(mi >= -2 && nmi6 >= -1e-5 && nmi6 <= 1.0)
  }

  test("q_id_gaps: purchase-id gaps match the non-purchase ground truth") {
    val rows = SparkEntry.queries("q_id_gaps")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    val ev = Tables.events(spark, sf).select("event_id", "event_type")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val ids = ev.filter(_._2 == "purchase").map(_._1).sorted
    val (n, mn, mx) = (ids.length.toLong, ids.min, ids.max)
    rows.foreach { case (gn, gmn, gmx, miss, _, _, _) =>
      assert((gn, gmn, gmx) == ((n, mn, mx)))
      assert(miss == mx - mn + 1 - n)
    }
    // ground truth: every gap is exactly a run of non-purchase ids
    val gaps = ids.sliding(2).collect {
      case Array(a, b) if b - a > 1 => (a + 1, b - 1, b - a - 1)
    }.toSeq
    val expTop = gaps.sortBy { case (st, _, w) => (-w, st) }.take(5)
    assert(rows.map(r => (r._5, r._6, r._7)).toSeq == expTop)
    val inGaps = ev.filter(e =>
      gaps.exists(g => e._1 >= g._1 && e._1 <= g._2))
    assert(inGaps.forall(_._2 != "purchase"))
  }

  test("q_period_over_period: WoW deltas match a decimal replay") {
    val got = SparkEntry.queries("q_period_over_period")(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    val orders = Tables.orders(spark, sf)
      .selectExpr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
        "div 604800000000 AS BIGINT) as week", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val byWeek = orders.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong,
        rs.map(r => BigDecimal(r._2).setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum)
    }.toMap
    val weeks = byWeek.keys.toSeq.sorted
    assert(got.map(_._1).toSeq == weeks)
    weeks.zipWithIndex.foreach { case (wk, i) =>
      val (n, rev, delta, pct) = got.find(_._1 == wk).get._2
      assert(n == byWeek(wk)._1)
      assert(rev == byWeek(wk)._2.toDouble)
      if (i == 0) assert(delta.isEmpty && pct.isEmpty)
      else {
        val prev = byWeek(weeks(i - 1))._2
        assert(delta.contains((byWeek(wk)._2 - prev).toDouble), s"week $wk delta")
        val expPct = (byWeek(wk)._2 - prev).toDouble / prev.toDouble
        assert(pct.contains(BigDecimal(expPct)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble), s"week $wk pct")
      }
    }
  }

  test("q_tail_index: Hill over pinned top-k order statistics") {
    val Seq(row) = SparkEntry.queries("q_tail_index")(spark, sf).collect().toSeq
    val (k, thr, hMicro, alpha6) =
      (row.getInt(0), row.getDouble(1), row.getLong(2), row.getDouble(3))
    assert(k == 100)
    val xs = Tables.orders(spark, sf).select("o_totalprice", "o_orderkey")
      .collect().map(r => (r.getDouble(0), r.getLong(1)))
      .sortBy { case (x, id) => (-x, id) }
    assert(thr == xs(100)._1)
    val s = xs.take(100)
      .map(t => math.floor(math.log(t._1 / thr) * 1e6 + 0.5).toLong).sum
    assert(hMicro == s / 100)
    assert(alpha6 == BigDecimal(100e6 / s)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(alpha6 > 0)
  }

  test("q_ab_srm: chi-square of the split matches raw variant counts") {
    val Seq(row) = SparkEntry.queries("q_ab_srm")(spark, sf).collect().toSeq
    val (na, nb, chi26, srm) =
      (row.getLong(0), row.getLong(1), row.getDouble(2), row.getBoolean(3))
    // replay the assignment through the op's own hash by cross-checking
    // count conservation and the statistic's closed form
    val users = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(na + nb == users)
    val expd = (na + nb) / 2.0
    val chi2 = ((na - expd) * (na - expd) + (nb - expd) * (nb - expd)) / expd
    assert(chi26 == BigDecimal(chi2)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(srm == (chi26 > 3.841))
  }

  test("q_lorenz: decile shares match a sorted-cents replay and q_gini") {
    val got = SparkEntry.queries("q_lorenz")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.map(_._1).toSeq == (1L to 10L))
    val cents = Tables.orders(spark, sf)
      .selectExpr("o_custkey",
        "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS LONG) as c")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy { case (k, c) => (c, k) }
    val n = cents.length
    val byDecile = cents.zipWithIndex
      .groupBy { case (_, i) => i * 10 / n + 1 }
    val total = cents.map(t => BigInt(t._2)).sum
    var cum = BigInt(0)
    (1 to 10).foreach { dec =>
      val (_, nc, dc, share) = got(dec - 1)
      val mine = byDecile(dec).map(_._1._2)
      assert(nc == mine.length, s"decile $dec count")
      assert(dc == mine.sum, s"decile $dec cents")
      cum += BigInt(dc)
      assert(share == (cum * 1000000 / total).toLong, s"decile $dec share")
    }
    assert(got.last._4 == 1000000L, "final decile must reach 100%")
    // monotone increasing decile masses (sorted ascending by spend)
    got.map(_._3).toSeq.sliding(2).foreach { case Seq(a, b) => assert(a <= b) }
  }

  test("text_burstiness: VMR over zero-inclusive doc counts, brute force") {
    val got = SparkEntry.queries("text_burstiness")(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val nd = docs.length
    val counts = docs.flatMap { case (id, text) =>
      text.trim.toLowerCase.replaceAll("\\s+", " ").split(" ", -1)
        .filter(_.nonEmpty).groupBy(identity).map { case (t, g) =>
          (t, id, g.length.toLong)
        }
    }
    val byTerm = counts.groupBy(_._1)
    val expTop = byTerm.view.mapValues(_.length).toSeq
      .sortBy { case (t, df) => (-df, t) }.take(20)
    assert(got.map(t => (t._1, t._2)).toSeq == expTop.map(t => (t._1, t._2.toLong)))
    got.foreach { case (term, df, tf, vmr6) =>
      val cs = byTerm(term).map(_._3)
      assert(df == cs.length && tf == cs.sum, s"$term df/tf")
      val s2 = cs.map(c => BigInt(c) * BigInt(c)).sum
      val varAll = (BigInt(nd) * s2 - BigInt(tf) * BigInt(tf)).toDouble /
        (BigInt(nd) * BigInt(nd - 1)).toDouble
      val vmr = varAll / (tf.toDouble / nd)
      assert(vmr6 == BigDecimal(vmr)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble, s"$term vmr")
    }
  }

  test("text_zipf: quantized rank-frequency OLS matches a BigInt replay") {
    val Seq(row) = SparkEntry.queries("text_zipf")(spark, sf).collect().toSeq
    val (n, slope6, r26) = (row.getLong(0), row.getDouble(1), row.getDouble(2))
    val tf = Tables.documents(spark, sf).select("text").collect()
      .flatMap(_.getString(0).trim.toLowerCase.replaceAll("\\s+", " ")
        .split(" ", -1).filter(_.nonEmpty))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }.take(100)
    assert(n == tf.length)
    def q6(x: Double) = BigInt(math.floor(math.log(x) * 1e6 + 0.5).toLong)
    val pts = tf.zipWithIndex.map { case ((_, f), i) =>
      (q6(i + 1.0), q6(f.toDouble))
    }
    val nn = BigInt(pts.length)
    val sx = pts.map(_._1).sum; val sy = pts.map(_._2).sum
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val num = (nn * sxy - sx * sy).toDouble
    val slope = num / (nn * sxx - sx * sx).toDouble
    val r2 = num * num /
      ((nn * sxx - sx * sx).toDouble * (nn * syy - sy * sy).toDouble)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(slope6 == r6(slope) && r26 == r6(r2))
    assert(slope6 < 0 && r26 >= 0 && r26 <= 1)
  }

  test("q_mann_whitney: doubled U from brute-force average ranks") {
    val Seq(row) = SparkEntry.queries("q_mann_whitney")(spark, sf)
      .collect().toSeq
    val (n1, n2, u1x2, u2x2, z6) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
        row.getDouble(4))
    val vals = Tables.events(spark, sf)
      .select("event_type", "value").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
      .filter(t => t._1 == "purchase" || t._1 == "view")
    assert(n1 == vals.count(_._1 == "purchase"))
    assert(n2 == vals.count(_._1 == "view"))
    // doubled average ranks: sort combined, tie group at min-rank r with
    // c members contributes 2r + c - 1 per member
    val sorted = vals.map(_._2).sorted
    val rankX2 = sorted.zipWithIndex.groupBy(_._1).map { case (v, g) =>
      v -> (2L * (g.map(_._2).min + 1) + g.length - 1)
    }
    val r1x2 = vals.filter(_._1 == "purchase").map(t => rankX2(t._2)).sum
    assert(u1x2 == r1x2 - n1 * (n1 + 1), "u1_x2")
    assert(u1x2 + u2x2 == 2 * n1 * n2, "U partition identity")
    val u1 = u1x2 / 2.0
    val z = (u1 - n1 * n2 / 2.0) / math.sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0)
    assert(z6 == BigDecimal(z).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("q_seasonal_anomaly: per-dow robust flags match a sequential replay") {
    import org.apache.spark.sql.functions.to_date
    import TestSession.spark.implicits._
    val daily = Tables.orders(spark, sf)
      .select(to_date($"o_orderdate").as("day"), $"o_totalprice")
      .collect()
      .map(r => (r.getDate(0),
        BigDecimal(r.getDouble(1)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq
      .sortBy(_._1.toString)
    def dow(d: java.sql.Date): Long =
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(1970, 1, 1), d.toLocalDate) % 7
    def pinnedMed[K](xs: Seq[(Long, K)]): Long = {
      val sorted = xs.sortBy(t => (t._1, t._2.toString))
      sorted(math.ceil(xs.size * 0.5).toInt - 1)._1
    }
    val byDow = daily.groupBy(t => dow(t._1))
    val med = byDow.map { case (k, g) =>
      k -> pinnedMed(g.map(t => (t._2, t._1.toString)))
    }
    val mad = byDow.map { case (k, g) =>
      k -> pinnedMed(g.map(t =>
        (math.abs(t._2 - med(k)), t._1.toString)))
    }
    val got = SparkEntry.queries("q_seasonal_anomaly")(spark, sf).collect()
      .map(r => (r.getDate(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.length == daily.length)
    got.foreach { case (day, dw, cents, m, md, fl) =>
      assert(dw == dow(day), s"$day dow")
      assert(m == med(dw), s"$day med")
      assert(md == mad(dw), s"$day mad")
      val expFlag =
        if (math.abs(cents - m).toDouble > 3 * 1.4826 * md.toDouble) 1L
        else 0L
      assert(fl == expFlag, s"$day flag")
    }
  }

  test("q_anova: F statistic matches a BigInt-moment replay") {
    val r = SparkEntry.queries("q_anova")(spark, sf).head()
    val xs = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_extendedprice").collect()
      .map(x => (x.getString(0),
        BigInt(math.floor(x.getDouble(1) * 100 + 0.5).toLong)))
    val groups = xs.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val terms = groups.values.map(g => (g.sum * g.sum) / g.length).toSeq
    val s = xs.map(_._2).sum
    val n = BigInt(xs.length)
    val corr = s * s / n
    val ssb = terms.sum - corr
    val ssw = xs.map(v => v._2 * v._2).sum - corr - ssb
    assert(r.getAs[Long]("k") == groups.size.toLong)
    assert(r.getAs[Long]("n") == xs.length.toLong)
    assert(r.getAs[Double]("ssb2") == ssb.toDouble)
    assert(r.getAs[Double]("ssw2") == ssw.toDouble)
    val f = (ssb.toDouble / (groups.size - 1)) /
      (ssw.toDouble / (xs.length - groups.size))
    assert(r.getAs[Double]("f6") ==
      BigDecimal(f).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    assert(r.getAs[Double]("f6") >= 0.0)
  }

  test("q_weighted_median: lower weighted median matches a sequential fold") {
    val rows = Tables.lineitem(spark, sf)
      .select("l_returnflag", "l_discount", "l_extendedprice")
      .collect()
      .map(r => (r.getString(0), r.getDouble(1),
        math.floor(r.getDouble(2) * (1.0 - r.getDouble(1)) * 100 + 0.5).toLong))
    val expected = rows.groupBy(_._1).map { case (flag, g) =>
      val byDisc = g.groupBy(_._2).view
        .mapValues(_.map(_._3).sum).toSeq.sortBy(_._1)
      val tw = byDisc.map(_._2).sum
      val wmed = byDisc
        .scanLeft((0.0, 0L)) { case ((_, c), (disc, sw)) => (disc, c + sw) }
        .tail.find { case (_, cw) => cw * 2 >= tw }.get._1
      flag -> (g.length.toLong, tw, wmed)
    }
    val got = SparkEntry.queries("q_weighted_median")(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(got == expected)
  }
}
