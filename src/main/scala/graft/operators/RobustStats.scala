package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Robust / inferential statistics (SURVEY.md §2.5 additions): median
  * absolute deviation with robust z-score outlier counts, Tukey-fence
  * IQR outliers, a chi-square independence test over two categoricals,
  * and the Mann-Whitney U rank-sum test.
  *
  * Parity discipline (the q_percentile / text_pmi rules):
  *  - every quantile is the value at a PINNED total order position
  *    (prefix-max at rn <= ceil(q*n) over (value, key...)) — no
  *    interpolation formula to drift between engines;
  *  - per-row float math ((obs-exp)^2/exp, fence comparisons) is the
  *    identical IEEE expression evaluated row-locally on both engines;
  *    any SUM over such doubles goes through a per-row decimal(18,6)
  *    cast first (OracleMath.dsum), so accumulation order cannot leak;
  *  - rank statistics stay in INTEGER space (doubled U avoids the /2).
  *
  * Scale shapes: the two quantile ops shuffle once per window key (the
  * group key, reused by both window passes); the group-level medians
  * rejoin via broadcast (group cardinality, not data cardinality). The
  * rank test pre-aggregates to DISTINCT VALUES before any window — the
  * global-order window walks |distinct values| rows, never the corpus.
  */
object RobustStats {

  // -- q_mad: median absolute deviation + robust z-score outliers ----------
  // MAD is THE robust scale estimate for heavy-tailed data (price/value
  // columns): one wild row moves stddev arbitrarily but not the MAD.
  // consistency constant 1.4826 rescales MAD to sigma under normality;
  // a row with |x - med| > 3 * 1.4826 * MAD is the standard robust
  // z-score outlier. Both medians are pinned-position exact (prefix-max
  // at ceil(n/2) of the (value, l_orderkey, l_linenumber) total order).
  private def qMad(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, d).select(
      $"l_returnflag".as("flag"), $"l_extendedprice".as("x"),
      $"l_orderkey".as("k"), $"l_linenumber".as("ln"))
    val wn = Window.partitionBy($"flag")
    val w1 = wn.orderBy($"x", $"k", $"ln")
    val med = base
      .withColumn("rn", row_number().over(w1))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy($"flag")
      .agg(max(when($"rn" <= ceil($"n" * 0.5), $"x")).as("med"))
    // |x - med| is row-local IEEE: identical per row on both engines
    val dev = base.join(broadcast(med), "flag")
      .withColumn("dev", abs($"x" - $"med"))
    val w2 = wn.orderBy($"dev", $"k", $"ln")
    val mad = dev
      .withColumn("rn", row_number().over(w2))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy($"flag")
      .agg(max(when($"rn" <= ceil($"n" * 0.5), $"dev")).as("mad"))
    dev.join(broadcast(mad), "flag")
      .groupBy($"flag")
      .agg(
        count(lit(1)).as("n"),
        max($"med").as("med_price"),
        max($"mad").as("mad_price"),
        sum(when($"dev" > lit(3) * lit(1.4826) * $"mad", 1L).otherwise(0L))
          .as("n_robust_outliers"))
      .select($"flag".as("l_returnflag"), $"n", $"med_price", $"mad_price",
        $"n_robust_outliers")
      .orderBy($"l_returnflag")
  }
  private val qMadSql =
    """WITH b AS (SELECT l_returnflag AS flag, l_extendedprice AS x,
      |    l_orderkey AS k, l_linenumber AS ln FROM lineitem),
      |med AS (SELECT flag,
      |    MAX(CASE WHEN rn <= ceil(n * 0.5) THEN x END) AS med
      |  FROM (SELECT flag, x,
      |      row_number() OVER (PARTITION BY flag ORDER BY x, k, ln) AS rn,
      |      COUNT(*) OVER (PARTITION BY flag) AS n FROM b)
      |  GROUP BY flag),
      |d AS (SELECT b.flag, abs(b.x - m.med) AS dev, b.k, b.ln, m.med
      |      FROM b JOIN med m ON b.flag = m.flag),
      |mad AS (SELECT flag,
      |    MAX(CASE WHEN rn <= ceil(n * 0.5) THEN dev END) AS mad
      |  FROM (SELECT flag, dev,
      |      row_number() OVER (PARTITION BY flag ORDER BY dev, k, ln) AS rn,
      |      COUNT(*) OVER (PARTITION BY flag) AS n FROM d)
      |  GROUP BY flag)
      |SELECT d.flag AS l_returnflag, COUNT(*) AS n,
      |  MAX(d.med) AS med_price, MAX(mad.mad) AS mad_price,
      |  CAST(SUM(CASE WHEN d.dev > 3 * 1.4826 * mad.mad THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_robust_outliers
      |FROM d JOIN mad ON d.flag = mad.flag
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q_iqr_outliers: Tukey-fence outlier audit ---------------------------
  // The boxplot rule: q1/q3 pinned-position exact, fences at
  // q1 - 1.5*iqr / q3 + 1.5*iqr. Fence arithmetic is row-group-local
  // IEEE on identical inputs (q1, q3 are data values), so the fence
  // comparison is engine-exact per row.
  private def qIqrOutliers(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, d).select(
      $"l_returnflag".as("flag"), $"l_extendedprice".as("x"),
      $"l_orderkey".as("k"), $"l_linenumber".as("ln"))
    val wn = Window.partitionBy($"flag")
    val w1 = wn.orderBy($"x", $"k", $"ln")
    val q = base
      .withColumn("rn", row_number().over(w1))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy($"flag")
      .agg(
        max(when($"rn" <= ceil($"n" * 0.25), $"x")).as("q1"),
        max(when($"rn" <= ceil($"n" * 0.75), $"x")).as("q3"))
      .withColumn("lo", $"q1" - lit(1.5) * ($"q3" - $"q1"))
      .withColumn("hi", $"q3" + lit(1.5) * ($"q3" - $"q1"))
    base.join(broadcast(q), "flag")
      .groupBy($"flag")
      .agg(
        count(lit(1)).as("n"),
        max($"q1").as("q1"),
        max($"q3").as("q3"),
        sum(when($"x" < $"lo", 1L).otherwise(0L)).as("n_low"),
        sum(when($"x" > $"hi", 1L).otherwise(0L)).as("n_high"))
      .select($"flag".as("l_returnflag"), $"n", $"q1", $"q3",
        $"n_low", $"n_high")
      .orderBy($"l_returnflag")
  }
  private val qIqrOutliersSql =
    """WITH b AS (SELECT l_returnflag AS flag, l_extendedprice AS x,
      |    l_orderkey AS k, l_linenumber AS ln FROM lineitem),
      |q AS (SELECT flag,
      |    MAX(CASE WHEN rn <= ceil(n * 0.25) THEN x END) AS q1,
      |    MAX(CASE WHEN rn <= ceil(n * 0.75) THEN x END) AS q3
      |  FROM (SELECT flag, x,
      |      row_number() OVER (PARTITION BY flag ORDER BY x, k, ln) AS rn,
      |      COUNT(*) OVER (PARTITION BY flag) AS n FROM b)
      |  GROUP BY flag),
      |f AS (SELECT flag, q1, q3,
      |    q1 - 1.5 * (q3 - q1) AS lo, q3 + 1.5 * (q3 - q1) AS hi FROM q)
      |SELECT b.flag AS l_returnflag, COUNT(*) AS n,
      |  MAX(f.q1) AS q1, MAX(f.q3) AS q3,
      |  CAST(SUM(CASE WHEN b.x < f.lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
      |  CAST(SUM(CASE WHEN b.x > f.hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      |FROM b JOIN f ON b.flag = f.flag
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q_chi_square: independence of two categoricals ----------------------
  // Pearson chi-square of o_orderstatus x o_orderpriority: the
  // contingency table is one hash aggregation (map-side combined);
  // row/column marginals are windows over the CELL table (|statuses| x
  // |priorities| rows, never the fact table). Each cell's
  // (obs-exp)^2/exp is row-local IEEE (exp = INT*INT promoted to
  // double, one division — same op order both engines); the chi2 total
  // crosses rows, so it goes decimal(18,6)-per-cell first (dsum), then
  // back to double.
  private def qChiSquare(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.orders(s, d)
      .groupBy($"o_orderstatus".as("status"), $"o_orderpriority".as("prio"))
      .agg(count(lit(1)).as("obs"))
    val wr = Window.partitionBy($"status")
    val wc = Window.partitionBy($"prio")
    val wAll = Window.partitionBy()
    cells
      .withColumn("rt", sum($"obs").over(wr))
      .withColumn("ct", sum($"obs").over(wc))
      .withColumn("nn", sum($"obs").over(wAll))
      .withColumn("exp", ($"rt" * $"ct") / $"nn")
      .withColumn("contrib", ($"obs" - $"exp") * ($"obs" - $"exp") / $"exp")
      .withColumn("chi2",
        sum($"contrib".cast("decimal(18,6)")).over(wAll).cast("double"))
      .select($"status", $"prio", $"obs", round($"exp", 6).as("exp6"),
        round($"contrib", 6).as("contrib6"), $"chi2")
      .orderBy($"status", $"prio")
  }
  private val qChiSquareSql =
    """WITH cells AS (SELECT o_orderstatus AS status, o_orderpriority AS prio,
      |    COUNT(*) AS obs FROM orders GROUP BY 1, 2),
      |m AS (SELECT status, prio, obs,
      |    SUM(obs) OVER (PARTITION BY status) AS rt,
      |    SUM(obs) OVER (PARTITION BY prio) AS ct,
      |    SUM(obs) OVER () AS nn
      |  FROM cells),
      |x AS (SELECT status, prio, obs, (rt * ct) / nn AS exp FROM m),
      |c AS (SELECT status, prio, obs, exp,
      |    (obs - exp) * (obs - exp) / exp AS contrib FROM x)
      |SELECT status, prio, obs, round(exp, 6) AS exp6,
      |  round(contrib, 6) AS contrib6,
      |  CAST(SUM(CAST(contrib AS DECIMAL(18,6))) OVER () AS DOUBLE) AS chi2
      |FROM c ORDER BY status, prio""".stripMargin

  // -- q_mann_whitney: rank-sum test with tie-averaged ranks ---------------
  // Are purchase values drawn from the same distribution as view
  // values? Nonparametric U test. Scale shape: aggregate the corpus to
  // DISTINCT VALUES first (one hash agg with per-side counts), then the
  // prior-count ranks come from SemiStructured.valueKeyedCums — the
  // range-partitioned two-pass prefix sum (the r11 equidepth shape), so
  // there is NO single-partition global window anywhere, at any
  // cardinality of distinct values. Tie handling is the textbook
  // average rank, kept in integer space: each member of a tie group at
  // min-rank r with c ties has doubled average rank 2r + c - 1, so the
  // doubled rank sum R1_x2 = sum(n_a * (2*prior + c + 1)) is exact
  // BIGINT math, and U1_x2 = R1_x2 - n1*(n1+1). The z statistic is one
  // double expression over five integers — engine-exact — rounded at 6.
  private def qMannWhitney(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val g = Tables.events(s, d)
      .filter($"event_type".isin("purchase", "view"))
      .groupBy($"value")
      .agg(
        sum(when($"event_type" === "purchase", 1L).otherwise(0L)).as("na"),
        sum(when($"event_type" === "view", 1L).otherwise(0L)).as("nb"),
        count(lit(1)).as("c"))
    val t = SemiStructured.valueKeyedCums(g, "value", Seq("c"))
      .withColumn("prior", $"cum_c" - $"c")
      .agg(
        sum($"na").as("n1"),
        sum($"nb").as("n2"),
        sum($"na" * (lit(2) * $"prior" + $"c" + lit(1))).as("r1_x2"))
      .withColumn("u1_x2", $"r1_x2" - $"n1" * ($"n1" + lit(1)))
      .withColumn("u2_x2", lit(2) * $"n1" * $"n2" - $"u1_x2")
    t.select($"n1", $"n2", $"u1_x2", $"u2_x2",
      round(
        ($"u1_x2" / 2.0 - $"n1" * $"n2" / 2.0) /
          sqrt($"n1" * $"n2" * ($"n1" + $"n2" + lit(1)) / 12.0),
        6).as("z6"))
  }
  private val qMannWhitneySql =
    """WITH g AS (SELECT value,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS na,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS nb,
      |    COUNT(*) AS c
      |  FROM events WHERE event_type IN ('purchase', 'view')
      |  GROUP BY value),
      |p AS (SELECT na, nb, c,
      |    COALESCE(SUM(c) OVER (ORDER BY value
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
      |  FROM g),
      |t AS (SELECT CAST(SUM(na) AS BIGINT) AS n1,
      |    CAST(SUM(nb) AS BIGINT) AS n2,
      |    CAST(SUM(na * (2 * prior + c + 1)) AS BIGINT) AS r1_x2
      |  FROM p),
      |u AS (SELECT n1, n2, r1_x2 - n1 * (n1 + 1) AS u1_x2,
      |    2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS u2_x2 FROM t)
      |SELECT n1, n2, u1_x2, u2_x2,
      |  round((u1_x2 / 2.0 - n1 * n2 / 2.0) /
      |    sqrt(n1 * n2 * (n1 + n2 + 1) / 12.0), 6) AS z6
      |FROM u""".stripMargin

  // -- q_spearman: rank correlation (is value drifting over time?) ---------
  // Pearson answers "linear in the raw units"; Spearman answers
  // "monotone at all" — robust to outliers and any monotone transform,
  // which is why drift monitors prefer it. Per event type: tie-averaged
  // ranks of value and of event time, kept INTEGER by doubling (tie
  // group at min-rank r with c members: 2r + c − 1 each — the
  // q_mann_whitney discipline), then Pearson over the doubled ranks
  // from exact decimal(38,0) joint moments (the q_regression
  // discipline: doubled ranks reach 2n, their products 4n² — far past
  // LONG at corpus scale, so every product is widened BEFORE the
  // multiply). Scaling by 2 cancels in the correlation, so rho is
  // exact-up-to-one-IEEE-expression, rounded at 6. Rank windows are
  // per-type partitioned — no global window.
  private def qSpearman(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val dec = "decimal(38,0)"
    val ev = Tables.events(s, d)
      .select($"event_type".as("t"), $"value".as("v"),
        expr("ts_ns div 1000").as("ts"))
    def ranked2(c: String) = {
      val wMin = Window.partitionBy($"t").orderBy(col(c))
      val wTie = Window.partitionBy($"t", col(c))
      (lit(2) * rank().over(wMin) + count(lit(1)).over(wTie) - lit(1))
        .cast("long")
    }
    ev
      .withColumn("rx", ranked2("v"))
      .withColumn("ry", ranked2("ts"))
      .groupBy($"t")
      .agg(
        count(lit(1)).as("n"),
        sum($"rx".cast(dec)).as("sx"),
        sum($"ry".cast(dec)).as("sy"),
        sum($"rx".cast(dec) * $"rx".cast(dec)).as("sxx"),
        sum($"ry".cast(dec) * $"ry".cast(dec)).as("syy"),
        sum($"rx".cast(dec) * $"ry".cast(dec)).as("sxy"))
      .select($"t".as("event_type"), $"n",
        round(
          (($"n" * $"sxy" - $"sx" * $"sy").cast("double")) /
            sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
              ($"n" * $"syy" - $"sy" * $"sy").cast("double")),
          6).as("rho6"))
      .orderBy($"event_type")
  }
  private val qSpearmanSql =
    """WITH e AS (SELECT event_type AS t, value AS v,
      |    epoch_ns(ts) // 1000 AS tsu FROM events),
      |r AS (SELECT t,
      |    2 * rank() OVER (PARTITION BY t ORDER BY v)
      |      + COUNT(*) OVER (PARTITION BY t, v) - 1 AS rx,
      |    2 * rank() OVER (PARTITION BY t ORDER BY tsu)
      |      + COUNT(*) OVER (PARTITION BY t, tsu) - 1 AS ry
      |  FROM e),
      |m AS (SELECT t, COUNT(*) AS n,
      |    SUM(CAST(rx AS HUGEINT)) AS sx,
      |    SUM(CAST(ry AS HUGEINT)) AS sy,
      |    SUM(CAST(rx AS HUGEINT) * CAST(rx AS HUGEINT)) AS sxx,
      |    SUM(CAST(ry AS HUGEINT) * CAST(ry AS HUGEINT)) AS syy,
      |    SUM(CAST(rx AS HUGEINT) * CAST(ry AS HUGEINT)) AS sxy
      |  FROM r GROUP BY t)
      |SELECT t AS event_type, n,
      |  round(CAST(n * sxy - sx * sy AS DOUBLE) /
      |    sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
      |      * CAST(n * syy - sy * sy AS DOUBLE)), 6) AS rho6
      |FROM m ORDER BY event_type""".stripMargin

  // -- q_mutual_info: MI + normalized MI between two categoricals ----------
  // The information-theoretic companion to q_chi_square (chi2 scales
  // with n and table shape; NMI is comparable across tables — the
  // feature-selection screen reads NMI): MI = Σ (c_xy/N)·ln(c_xy·N/
  // (c_x·c_y)). Cross-row ln sums are engine-order-sensitive as
  // floats, so each cell's log-ratio is quantized to an integer FIRST
  // (q_entropy's discipline): lnr6 = floor(ln(·)·10⁶ + 0.5) on the
  // row-locally-identical IEEE ratio, MI_micro = Σ c_xy·lnr6 div N in
  // exact integer arithmetic. Marginal entropies get the same
  // treatment, and NMI = MI/min(Hx,Hy) is one IEEE division of exact
  // integers, rounded at 6. The cell table is one map-side-combined
  // hash agg; everything after runs on cells and marginals (|r|·|c|
  // rows), never the fact table.
  private def qMutualInfo(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.orders(s, d)
      .groupBy($"o_orderstatus".as("x"), $"o_orderpriority".as("y"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint() // feeds the joint term + both marginals
    def marginalS(key: String, out: String) = cells
      .groupBy(col(key)).agg(sum($"c").as("cm"))
      .withColumn("ln6",
        floor(log($"cm".cast("double")) * 1e6 + 0.5).cast("long"))
      .agg(sum($"cm".cast("decimal(38,0)") * $"ln6").as(out))
    val wx = Window.partitionBy($"x")
    val wy = Window.partitionBy($"y")
    val wAll = Window.partitionBy()
    val joint = cells
      .withColumn("rt", sum($"c").over(wx))
      .withColumn("ct", sum($"c").over(wy))
      .withColumn("nn", sum($"c").over(wAll))
      .withColumn("lnr6",
        floor(log(($"c".cast("double") * $"nn") /
          ($"rt".cast("double") * $"ct")) * 1e6 + 0.5).cast("long"))
      .agg(sum($"c").as("n"), count(lit(1)).as("n_cells"),
        sum($"c".cast("decimal(38,0)") * $"lnr6").as("mi_s"))
    // mi_s is MIXED-SIGN (independent-ish tables sit near 0): Spark's
    // `div` truncates toward zero where DuckDB's `//` floors, so the
    // quotient is taken on a provably-positive shifted numerator
    // (per-cell lnr6 ≥ −lnN6 up to quantization; +2 covers the rounding
    // slack) and the shift is subtracted back — floor == trunc holds
    joint.crossJoin(marginalS("x", "sx")).crossJoin(marginalS("y", "sy"))
      .withColumn("ln_n6",
        floor(log($"n".cast("double")) * 1e6 + 0.5).cast("long"))
      .select($"n", $"n_cells",
        expr("(mi_s + CAST(n AS DECIMAL(38,0)) * (ln_n6 + 2)) div n" +
          " - (ln_n6 + 2)").as("mi_micro"),
        ($"ln_n6" - expr("sx div n")).as("hx_micro"),
        ($"ln_n6" - expr("sy div n")).as("hy_micro"))
      .withColumn("nmi6",
        round($"mi_micro".cast("double") /
          least($"hx_micro", $"hy_micro").cast("double"), 6))
  }
  private val qMutualInfoSql =
    """WITH cells AS (SELECT o_orderstatus AS x, o_orderpriority AS y,
      |    COUNT(*) AS c FROM orders GROUP BY 1, 2),
      |mx AS (SELECT SUM(CAST(cm AS HUGEINT)
      |      * CAST(floor(ln(CAST(cm AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS sx
      |  FROM (SELECT x, CAST(SUM(c) AS BIGINT) AS cm FROM cells GROUP BY x)),
      |my AS (SELECT SUM(CAST(cm AS HUGEINT)
      |      * CAST(floor(ln(CAST(cm AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS sy
      |  FROM (SELECT y, CAST(SUM(c) AS BIGINT) AS cm FROM cells GROUP BY y)),
      |j AS (SELECT c,
      |    SUM(c) OVER (PARTITION BY x) AS rt,
      |    SUM(c) OVER (PARTITION BY y) AS ct,
      |    SUM(c) OVER () AS nn
      |  FROM cells),
      |jt AS (SELECT CAST(SUM(c) AS BIGINT) AS n, COUNT(*) AS n_cells,
      |    SUM(CAST(c AS HUGEINT)
      |      * CAST(floor(ln((CAST(c AS DOUBLE) * nn)
      |          / (CAST(rt AS DOUBLE) * ct)) * 1e6 + 0.5) AS BIGINT)) AS mi_s
      |  FROM j),
      |f AS (SELECT n, n_cells,
      |    CAST((mi_s + CAST(n AS HUGEINT) * (ln_n6 + 2)) // n AS BIGINT)
      |      - (ln_n6 + 2) AS mi_micro,
      |    ln_n6 - CAST(sx // n AS BIGINT) AS hx_micro,
      |    ln_n6 - CAST(sy // n AS BIGINT) AS hy_micro
      |  FROM (SELECT jt.*, mx.sx, my.sy,
      |      CAST(floor(ln(CAST(n AS DOUBLE)) * 1e6 + 0.5) AS BIGINT) AS ln_n6
      |    FROM jt CROSS JOIN mx CROSS JOIN my))
      |SELECT n, n_cells, mi_micro, hx_micro, hy_micro,
      |  round(CAST(mi_micro AS DOUBLE)
      |    / CAST(least(hx_micro, hy_micro) AS DOUBLE), 6) AS nmi6
      |FROM f""".stripMargin

  // -- q_id_gaps: key-sequence completeness audit --------------------------
  // The ingestion-completeness check (gaps-and-islands, the gap half):
  // is a supposedly-sequential key column missing ranges? Run over the
  // PURCHASE event-id subsequence — a filtered stream whose gaps are
  // real and whose ground truth the spec can cross-check against the
  // other event types: total missing = (max − min + 1 − n) needs only
  // the global aggregate, and the top-5 widest gaps come from lag
  // windows over the DISTINCT key table (gap start/end/width, ordered
  // by width then start — pinned). The header aggregate rides every
  // row (a 4-column broadcast) so the result is one self-contained
  // audit table. Scale: the key universe is corpus-proportional, so
  // the lag NEVER runs globally — keys carry a value-derived coarse
  // range key (affine in k against the broadcast (min, max) stats, so
  // monotone: range i's keys all precede range i+1's), each range lags
  // in parallel, and the ≤ 256 range-boundary pairs are stitched by a
  // lag over the per-range (min, max) subtotal rows. Deterministic
  // under every partition layout by construction.
  private def qIdGaps(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ks = Tables.events(s, d)
      .filter($"event_type" === "purchase")
      .select($"event_id".as("k")).distinct()
    val stats = ks.agg(count(lit(1)).as("n"), min($"k").as("mn"),
      max($"k").as("mx"))
    val keyed = ks.crossJoin(broadcast(stats.select($"mn", $"mx")))
      .withColumn("rk", when($"mx" > $"mn",
          least(lit(255L), floor(($"k" - $"mn") / ($"mx" - $"mn") * 256)
            .cast("long")))
        .otherwise(lit(0L)))
      .select($"k", $"rk")
    // gaps interior to one coarse range: per-range parallel lag
    val wIn = Window.partitionBy($"rk").orderBy($"k")
    val inner = keyed.withColumn("prev", lag($"k", 1).over(wIn))
      .filter($"prev".isNotNull && $"k" - $"prev" > 1)
      .select(($"prev" + 1).as("gap_start"), ($"k" - 1).as("gap_end"),
        ($"k" - $"prev" - 1).as("gap_width"))
    // gaps straddling a range boundary: lag over the ≤ 256 per-range
    // (min, max) rows — empty ranges simply don't appear, so the lag
    // pairs each range with its nearest populated predecessor
    val wB = Window.orderBy($"rk")
    val boundary = keyed.groupBy($"rk")
      .agg(min($"k").as("mnk"), max($"k").as("mxk"))
      .withColumn("pmax", lag($"mxk", 1).over(wB))
      .filter($"pmax".isNotNull && $"mnk" - $"pmax" > 1)
      .select(($"pmax" + 1).as("gap_start"), ($"mnk" - 1).as("gap_end"),
        ($"mnk" - $"pmax" - 1).as("gap_width"))
    inner.unionByName(boundary)
      .orderBy($"gap_width".desc, $"gap_start")
      .limit(5)
      .crossJoin(broadcast(stats))
      .select($"n", $"mn", $"mx", ($"mx" - $"mn" + 1 - $"n").as("n_missing"),
        $"gap_start", $"gap_end", $"gap_width")
      .orderBy($"gap_width".desc, $"gap_start")
  }
  private val qIdGapsSql =
    """WITH ks AS (SELECT DISTINCT event_id AS k FROM events
      |            WHERE event_type = 'purchase'),
      |st AS (SELECT COUNT(*) AS n, MIN(k) AS mn, MAX(k) AS mx FROM ks),
      |g AS (SELECT prev + 1 AS gap_start, k - 1 AS gap_end,
      |    k - prev - 1 AS gap_width
      |  FROM (SELECT k, lag(k) OVER (ORDER BY k) AS prev FROM ks)
      |  WHERE prev IS NOT NULL AND k - prev > 1
      |  ORDER BY gap_width DESC, gap_start LIMIT 5)
      |SELECT st.n, st.mn, st.mx, st.mx - st.mn + 1 - st.n AS n_missing,
      |  g.gap_start, g.gap_end, g.gap_width
      |FROM g CROSS JOIN st
      |ORDER BY gap_width DESC, gap_start""".stripMargin

  // -- q_period_over_period: WoW deltas on the weekly revenue series -------
  // The dashboard staple: weekly revenue (decimal pre-sum), the prior
  // week's value by lag over the bounded WEEK table, absolute delta in
  // exact decimal, and the relative change as one IEEE division of
  // decimal-exact inputs rounded at 6 (NULL for the first week — no
  // prior — matching SQL lag semantics on both engines). Integer
  // epoch-weeks (calendar-free).
  private def qPeriodOverPeriod(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wk = Tables.orders(s, d)
      .select(expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
        "div 604800000000 AS BIGINT)").as("week"),
        $"o_totalprice".cast("decimal(18,6)").as("p"))
      .groupBy($"week")
      .agg(count(lit(1)).as("n_orders"), sum($"p").as("revenue"))
    val w = Window.orderBy($"week")
    wk.withColumn("prev_rev", lag($"revenue", 1).over(w))
      .select($"week", $"n_orders",
        $"revenue".cast("double").as("revenue"),
        ($"revenue" - $"prev_rev").cast("double").as("delta"),
        round(($"revenue" - $"prev_rev").cast("double") /
          $"prev_rev".cast("double"), 6).as("pct_change6"))
      .orderBy($"week")
  }
  private val qPeriodOverPeriodSql =
    """WITH wk AS (SELECT epoch_us(CAST(o_orderdate AS TIMESTAMP))
      |      // 604800000000 AS week,
      |    COUNT(*) AS n_orders,
      |    SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS revenue
      |  FROM orders GROUP BY 1),
      |l AS (SELECT week, n_orders, revenue,
      |    lag(revenue) OVER (ORDER BY week) AS prev_rev FROM wk)
      |SELECT week, n_orders, CAST(revenue AS DOUBLE) AS revenue,
      |  CAST(revenue - prev_rev AS DOUBLE) AS delta,
      |  round(CAST(revenue - prev_rev AS DOUBLE)
      |    / CAST(prev_rev AS DOUBLE), 6) AS pct_change6
      |FROM l ORDER BY week""".stripMargin

  // -- q_tail_index: Hill estimator for the price tail ---------------------
  // How heavy is the upper tail? The Hill estimator (Hill 1975) over
  // the top-k order statistics: H = (1/k)·Σ ln(x_(i)/x_thr), alpha =
  // 1/H — the power-law exponent sizing decisions (skew handling,
  // sampling caps) hang on. k = 100 with a pinned (price desc,
  // orderkey) total order; each ln(x/thr) is row-local IEEE on exact
  // inputs, quantized floor(·10⁶+0.5) BEFORE the cross-row sum (the
  // ln discipline), H_micro an integer quotient, alpha one IEEE
  // division rounded at 6. Scale: top-(k+1) plans as
  // TakeOrderedAndProject — no global sort, no global window.
  private val HillK = 100
  private def qTailIndex(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val top = Tables.orders(s, d)
      .select($"o_totalprice".as("x"), $"o_orderkey".as("k"))
      .orderBy($"x".desc, $"k").limit(HillK + 1)
      .localCheckpoint() // 101 rows; feeds threshold + tail
    val w = Window.orderBy($"x".desc, $"k")
    val r = top.withColumn("rn", row_number().over(w))
    val thr = r.filter($"rn" === HillK + 1).select($"x".as("thr"))
    r.filter($"rn" <= HillK)
      .crossJoin(broadcast(thr))
      .select(floor(log($"x" / $"thr") * 1e6 + 0.5).cast("long").as("lnq"),
        $"thr")
      .agg(max($"thr").as("x_thr"), sum($"lnq".cast("decimal(38,0)")).as("s"))
      .select(lit(HillK).as("k"), $"x_thr",
        expr(s"s div $HillK").as("h_micro"),
        round(lit(HillK * 1e6) / $"s".cast("double"), 6).as("alpha6"))
  }
  private val qTailIndexSql =
    s"""WITH top AS (SELECT o_totalprice AS x, o_orderkey AS k FROM orders
       |             ORDER BY x DESC, k LIMIT ${HillK + 1}),
       |r AS (SELECT x, row_number() OVER (ORDER BY x DESC, k) AS rn FROM top),
       |thr AS (SELECT x AS thr FROM r WHERE rn = ${HillK + 1}),
       |l AS (SELECT CAST(floor(ln(x / thr) * 1e6 + 0.5) AS BIGINT) AS lnq,
       |        thr
       |      FROM r CROSS JOIN thr WHERE rn <= $HillK),
       |a AS (SELECT MAX(thr) AS x_thr, SUM(CAST(lnq AS HUGEINT)) AS s FROM l)
       |SELECT $HillK AS k, x_thr,
       |  CAST(s // $HillK AS BIGINT) AS h_micro,
       |  round(${HillK}e6 / CAST(s AS DOUBLE), 6) AS alpha6
       |FROM a""".stripMargin

  // -- q_lorenz: the concentration curve behind the Gini number ------------
  // q_gini reports one coefficient; the Lorenz decile table is what the
  // review actually plots (\"the top decile holds X% of spend\"): per
  // spend decile of customers (pinned (cents, custkey) rank, explicit
  // ((rn−1)·10) div n + 1 bucketing — ntile's remainder placement is an
  // engine-semantics risk this spelling avoids), exact cent sums and
  // the cumulative share as an integer micro-quotient. The global rank
  // is ASSEMBLED, never sorted on one task (customers grow with the
  // corpus — a global Window.orderBy rank is a single-partition sort at
  // 100 TB): the value-keyed two-pass prefix sum over the DISTINCT
  // cents table gives each cents value its strictly-below customer
  // count, and within one cents value ranks come from a window
  // PARTITIONED by cents (q_rfm's shape, layout-free by construction).
  private def qLorenz(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val spend = Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
    val vals = spend.groupBy($"cents").agg(count(lit(1)).as("cnt"))
    val cums = SemiStructured.valueKeyedCums(vals, "cents", Seq("cnt"))
      .select($"cents", ($"cum_cnt" - $"cnt").as("below"), $"tot_cnt".as("n"))
    val wIn = Window.partitionBy($"cents").orderBy($"o_custkey")
    val b = spend
      .join(cums.hint("shuffle_hash"), "cents")
      .withColumn("rn", $"below" + row_number().over(wIn))
      .withColumn("decile", expr("(rn - 1) * 10 div n + 1"))
      .groupBy($"decile")
      .agg(count(lit(1)).as("n_customers"),
        sum($"cents".cast("decimal(38,0)")).as("dc"))
    val wc = Window.orderBy($"decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    b.withColumn("cum", sum($"dc").over(wc))
      // full-frame spec over the 10 decile rows (gate signature: decile)
      .withColumn("tot", sum($"dc").over(Window.orderBy($"decile")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"decile", $"n_customers", $"dc".cast("long").as("decile_cents"),
        expr("(cum * 1000000) div tot").as("cum_share_micro"))
      .orderBy($"decile")
  }
  private val qLorenzSql =
    """WITH spend AS (SELECT o_custkey,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |r AS (SELECT cents,
      |    row_number() OVER (ORDER BY cents, o_custkey) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM spend),
      |b AS (SELECT (rn - 1) * 10 // n + 1 AS decile,
      |    COUNT(*) AS n_customers, SUM(CAST(cents AS HUGEINT)) AS dc
      |  FROM r GROUP BY 1),
      |c AS (SELECT decile, n_customers, dc,
      |    SUM(dc) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(dc) OVER () AS tot
      |  FROM b)
      |SELECT decile, n_customers, CAST(dc AS BIGINT) AS decile_cents,
      |  CAST((cum * 1000000) // tot AS BIGINT) AS cum_share_micro
      |FROM c ORDER BY decile""".stripMargin

  // -- q_anova: one-way ANOVA F across return-flag groups -------------------
  // The parametric complement of Mann-Whitney (two-sample, rank) and
  // chi-square (categorical): does mean price differ ACROSS the k
  // groups? F = (SSB/(k-1)) / (SSW/(N-k)) over exact per-group integer
  // moments (n_g, Σx, Σx²) on 10⁻²-scaled cents (the q_variance rule).
  // The only non-integer quantity — the per-group s_g²/n_g term — is
  // FLOORED to an exact cents² integer in 128-bit arithmetic (s_g² ≤
  // 1e32 at ~1e12 rows, inside decimal38/HUGEINT; a double→decimal
  // quantization here would NOT be engine-stable at these magnitudes:
  // Spark converts via the double's shortest decimal string, DuckDB
  // via its exact binary expansion). Flooring biases each sum-of-
  // squares by < k cents² on values ~1e12 — 10⁻¹² relative, invisible
  // at f6's 6 decimals — in exchange for bit-exactness. One map-side-
  // combined pass over the corpus; everything after runs on k rows.
  // NULL F on zero within-variance (no 0/0 to drift).
  private def qAnova(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val x = floor($"l_extendedprice" * 100 + 0.5).cast("decimal(38,0)")
    val g = Tables.lineitem(s, d)
      .select($"l_returnflag".as("flag"), x.as("x"))
      .groupBy($"flag")
      .agg(count(lit(1)).as("ng"), sum($"x").as("sg"),
        sum($"x" * $"x").as("ssg"))
    // floor division stays in DECIMAL throughout ((a - a%b)/b, exact on
    // nonnegatives): Spark's `div` narrows its quotient to LONG, and
    // s²/n crosses 2^63 already at sf0.1-scale sums
    g.select($"ng", $"sg", $"ssg",
        expr("(sg * sg - (sg * sg) % ng) / ng").cast("decimal(38,0)")
          .as("term"))
      .agg(count(lit(1)).as("k"), sum($"ng").as("n"), sum($"sg").as("s"),
        sum($"ssg").as("ss"), sum($"term").as("sterm"))
      .withColumn("corr",
        expr("(s * s - (s * s) % n) / n").cast("decimal(38,0)"))
      .withColumn("ssb", $"sterm" - $"corr")
      .withColumn("ssw", $"ss" - $"corr" - $"ssb")
      .select($"k", $"n",
        $"ssb".cast("double").as("ssb2"), $"ssw".cast("double").as("ssw2"),
        when($"ssw" > 0, round(($"ssb".cast("double") / ($"k" - 1)) /
            ($"ssw".cast("double") / ($"n" - $"k")), 6))
          .otherwise(lit(null)).as("f6"))
  }
  private val qAnovaSql = {
    val cents = "CAST(floor(l_extendedprice * 100 + 0.5) AS HUGEINT)"
    s"""WITH gr AS (SELECT l_returnflag AS flag, COUNT(*) AS ng,
       |    SUM($cents) AS sg, SUM($cents * $cents) AS ssg
       |  FROM lineitem GROUP BY 1),
       |t AS (SELECT ng, sg, ssg, (sg * sg) // ng AS term FROM gr),
       |m AS (SELECT COUNT(*) AS k, SUM(ng) AS n, SUM(sg) AS s,
       |    SUM(ssg) AS ss, SUM(term) AS sterm FROM t),
       |f AS (SELECT k, n, sterm - (s * s) // n AS ssb,
       |    ss - (s * s) // n AS sst FROM m)
       |SELECT CAST(k AS BIGINT) AS k, CAST(n AS BIGINT) AS n,
       |  CAST(ssb AS DOUBLE) AS ssb2, CAST(sst - ssb AS DOUBLE) AS ssw2,
       |  CASE WHEN sst - ssb > 0
       |       THEN round((CAST(ssb AS DOUBLE) / (k - 1))
       |         / (CAST(sst - ssb AS DOUBLE) / (n - k)), 6)
       |       ELSE NULL END AS f6
       |FROM f""".stripMargin
  }

  // -- q_seasonal_anomaly: day-of-week-aware robust anomaly flags ----------
  // The ops question a plain z-score gets wrong: Sunday revenue is
  // always "anomalous" against a weekday mean. Deseasonalize by
  // COMPARING LIKE WITH LIKE — each day is judged against its own
  // day-of-week's median and MAD (q_mad's pinned-position exactness,
  // the 3·1.4826·MAD robust fence as row-local IEEE). Day-of-week is
  // the PORTABLE epoch-day mod 7 (Spark's dayofweek is 1=Sunday,
  // DuckDB's 0=Sunday — an off-by-one oracle trap); the corpus
  // collapses to the daily aggregate first, so every window walks
  // O(calendar-days/7) rows. Emits every day with its verdict — the
  // dashboard series, not just the alerts.
  private def qSeasonalAnomaly(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val daily = Tables.orders(s, d)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
      .withColumn("dow",
        expr("datediff(day, DATE '1970-01-01') % 7").cast("long"))
    val wd = Window.partitionBy($"dow")
    val w1 = wd.orderBy($"cents", $"day")
    val med = daily
      .withColumn("rn", row_number().over(w1))
      .withColumn("n", count(lit(1)).over(wd))
      .groupBy($"dow")
      .agg(max(when($"rn" <= ceil($"n" * 0.5), $"cents")).as("med"))
    val dev = daily.join(broadcast(med), "dow")
      .withColumn("dev", abs($"cents" - $"med"))
    val w2 = wd.orderBy($"dev", $"day")
    val mad = dev
      .withColumn("rn", row_number().over(w2))
      .withColumn("n", count(lit(1)).over(wd))
      .groupBy($"dow")
      .agg(max(when($"rn" <= ceil($"n" * 0.5), $"dev")).as("mad"))
    dev.join(broadcast(mad), "dow")
      .select($"day", $"dow", $"cents", $"med".as("med_cents"),
        $"mad".as("mad_cents"),
        when($"dev".cast("double") >
            lit(3) * lit(1.4826) * $"mad".cast("double"), 1L)
          .otherwise(0L).as("is_anomaly"))
      .orderBy($"day")
  }
  private val qSeasonalAnomalySql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |d AS (SELECT day, cents,
      |    CAST((day - DATE '1970-01-01') AS BIGINT) % 7 AS dow FROM daily),
      |med AS (SELECT dow,
      |    MAX(CASE WHEN rn <= ceil(n * 0.5) THEN cents END) AS med
      |  FROM (SELECT dow, cents,
      |      row_number() OVER (PARTITION BY dow ORDER BY cents, day) AS rn,
      |      COUNT(*) OVER (PARTITION BY dow) AS n FROM d)
      |  GROUP BY dow),
      |dv AS (SELECT d.day, d.dow, d.cents, m.med,
      |    abs(d.cents - m.med) AS dev
      |  FROM d JOIN med m ON m.dow = d.dow),
      |mad AS (SELECT dow,
      |    MAX(CASE WHEN rn <= ceil(n * 0.5) THEN dev END) AS mad
      |  FROM (SELECT dow, dev,
      |      row_number() OVER (PARTITION BY dow ORDER BY dev, day) AS rn,
      |      COUNT(*) OVER (PARTITION BY dow) AS n FROM dv)
      |  GROUP BY dow)
      |SELECT dv.day, dv.dow, dv.cents, dv.med AS med_cents,
      |  mad.mad AS mad_cents,
      |  CAST(CASE WHEN CAST(dv.dev AS DOUBLE)
      |         > 3 * 1.4826 * CAST(mad.mad AS DOUBLE)
      |       THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM dv JOIN mad ON mad.dow = dv.dow
      |ORDER BY dv.day""".stripMargin

  // -- q_weighted_median: revenue-weighted median discount -----------------
  // The weighted quantile the plain median can't answer: "half the
  // REVENUE ships at discount <= X" (each row votes its revenue, not
  // 1). Weights are exact integer cents — the per-row revenue
  // extendedprice*(1-discount) is row-local IEEE identical on both
  // engines, quantized floor(x*100+0.5) BEFORE any sum (the dsum
  // rule), so cumulative weights are exact 64-bit integers (1e4
  // cents/row * 1e12 rows ~ 1e16 << 2^63 — headroom to far past
  // 100 TB). The lower weighted median is the pinned-order rule:
  // MIN discount with 2*cumw >= totw over the discount-ascending
  // cumulative. SCALE SHAPE: the corpus collapses to <= |distinct
  // discounts| rows per group (11 here) in ONE map-side-combined
  // aggregate; both windows then walk those dozen rows — the window
  // never sees the corpus (the Mann-Whitney distinct-values rule).
  private def qWeightedMedian(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.lineitem(s, d).select(
      $"l_returnflag".as("flag"), $"l_discount".as("disc"),
      floor($"l_extendedprice" * (lit(1.0) - $"l_discount") * 100 + 0.5)
        .cast("long").as("w"))
    val agg = base.groupBy($"flag", $"disc")
      .agg(count(lit(1)).as("nr"), sum($"w").as("sw"))
    val wf = Window.partitionBy($"flag").orderBy($"disc")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wg = Window.partitionBy($"flag")
    agg
      .select($"flag", $"disc", $"nr", $"sw",
        sum($"sw").over(wf).as("cw"), sum($"sw").over(wg).as("tw"),
        sum($"nr").over(wg).as("n"))
      .filter($"cw" * 2 >= $"tw")
      .groupBy($"flag")
      .agg(max($"n").as("n"), max($"tw").as("total_cents"),
        min($"disc").as("wmed_discount"))
      .select($"flag".as("l_returnflag"), $"n", $"total_cents",
        $"wmed_discount")
      .orderBy($"l_returnflag")
  }
  private val qWeightedMedianSql =
    """WITH b AS (SELECT l_returnflag AS flag, l_discount AS disc,
      |    CAST(floor(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
      |      AS BIGINT) AS w FROM lineitem),
      |a AS (SELECT flag, disc, COUNT(*) AS nr, SUM(w) AS sw
      |      FROM b GROUP BY 1, 2),
      |c AS (SELECT flag, disc, nr, sw,
      |    SUM(sw) OVER (PARTITION BY flag ORDER BY disc
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    SUM(sw) OVER (PARTITION BY flag) AS tw,
      |    SUM(nr) OVER (PARTITION BY flag) AS n
      |  FROM a)
      |SELECT flag AS l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MAX(tw) AS BIGINT) AS total_cents,
      |  MIN(disc) AS wmed_discount
      |FROM c WHERE cw * 2 >= tw GROUP BY 1 ORDER BY 1""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_weighted_median", qWeightedMedian, Some(qWeightedMedianSql)),
    QueryDef("q_anova", qAnova, Some(qAnovaSql)),
    QueryDef("q_seasonal_anomaly", qSeasonalAnomaly,
      Some(qSeasonalAnomalySql)),
    QueryDef("q_lorenz", qLorenz, Some(qLorenzSql)),
    QueryDef("q_tail_index", qTailIndex, Some(qTailIndexSql)),
    QueryDef("q_id_gaps", qIdGaps, Some(qIdGapsSql)),
    QueryDef("q_period_over_period", qPeriodOverPeriod,
      Some(qPeriodOverPeriodSql)),
    QueryDef("q_mutual_info", qMutualInfo, Some(qMutualInfoSql)),
    QueryDef("q_spearman", qSpearman, Some(qSpearmanSql)),
    QueryDef("q_mad", qMad, Some(qMadSql)),
    QueryDef("q_iqr_outliers", qIqrOutliers, Some(qIqrOutliersSql)),
    QueryDef("q_chi_square", qChiSquare, Some(qChiSquareSql)),
    QueryDef("q_mann_whitney", qMannWhitney, Some(qMannWhitneySql)))
}
