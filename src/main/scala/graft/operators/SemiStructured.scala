package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Semi-structured extraction + data-profiling operators.
  *
  *  - `q_json_extract`: parse a JSON string column with a DECLARED
  *    schema (`from_json`) — one codegen'd parse per row, pushed into
  *    the same map stage as the scan. At 100 TB the declared schema is
  *    the difference between one pass and two: schema inference
  *    (`spark.read.json` without a schema, or `schema_of_json` over the
  *    data) reads everything once before the real job starts.
  *  - `q_profile_stats`: per-column null / distinct / min / max profile
  *    in ONE scan, the data-quality gate a pipeline runs before
  *    accepting a new drop. NOT spelled as six `countDistinct`s in one
  *    `agg`: Spark rewrites multi-distinct aggregates with Expand —
  *    every input row is replicated once per distinct column and the
  *    hash-agg grouping key carries ALL the distinct columns at once
  *    (7× the rows through one wide aggregate; measured 7.4s vs 0.8s
  *    at sf0.1). Instead: `stack` unpivots map-side to narrow
  *    (col_name, value) rows, then a two-level aggregate — level 1
  *    groups by (col_name, value) so the shuffle carries only the
  *    per-partition-DISTINCT pairs after map-side combine, level 2
  *    folds those into null/distinct/min/max per column. The 100 TB
  *    variant swaps level 1+2 for `approx_count_distinct` (mergeable
  *    HLL, no value shuffle at all), which `q_approx_distinct` covers.
  */
object SemiStructured {

  // -- JSON extraction -----------------------------------------------------
  private def jsonExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        from_json($"props", StructType(Seq(StructField("k", LongType))))
          .getField("k").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"k").as("sum_k"),
        min($"k").as("min_k"),
        max($"k").as("max_k"),
        countDistinct($"k").as("n_distinct_k"))
      .orderBy($"event_type")
  }
  private val jsonExtractSql =
    """WITH e AS (SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
      |SELECT event_type, COUNT(*) AS n, CAST(SUM(k) AS BIGINT) AS sum_k,
      |  MIN(k) AS min_k, MAX(k) AS max_k, COUNT(DISTINCT k) AS n_distinct_k
      |FROM e GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- one-pass column profile --------------------------------------------
  private val NumCols = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
  private val StrCols = Seq("l_returnflag", "l_linestatus")

  private def profile(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val li = Tables.lineitem(s, d)
    // map-side unpivot to narrow (col_name, dval, sval) rows; numeric
    // columns ride in dval (double), string columns in sval — never
    // cast doubles to strings (Java and DuckDB render doubles
    // differently, e.g. 1.05E7 vs 10500000.0)
    val rows =
      NumCols.map(c => s"'$c', CAST($c AS DOUBLE), CAST(NULL AS STRING)") ++
      StrCols.map(c => s"'$c', CAST(NULL AS DOUBLE), $c")
    val pairs = li.selectExpr(
      s"stack(${rows.size}, ${rows.mkString(", ")}) AS (col_name, dval, sval)")
    // level 1: per-partition combine collapses to distinct (col, value)
    // pairs before the only data-bearing shuffle
    val perValue = pairs.groupBy($"col_name", $"dval", $"sval")
      .agg(count(lit(1)).as("cnt"))
    // level 2: fold the distinct pairs into the per-column profile
    perValue.groupBy($"col_name")
      .agg(
        sum(when($"dval".isNull && $"sval".isNull, $"cnt").otherwise(lit(0L))).as("n_nulls"),
        count(when($"dval".isNotNull || $"sval".isNotNull, lit(1))).as("n_distinct"),
        min($"dval").as("min_v"), max($"dval").as("max_v"),
        min($"sval").as("min_s"), max($"sval").as("max_s"))
      .orderBy("col_name")
  }
  private val profileSql = {
    val numRows = NumCols.map(c =>
      s"""SELECT '$c' AS col_name, COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(MIN($c) AS DOUBLE) AS min_v, CAST(MAX($c) AS DOUBLE) AS max_v,
         |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
         |FROM lineitem""".stripMargin)
    val strRows = StrCols.map(c =>
      s"""SELECT '$c' AS col_name, COUNT(*) - COUNT($c) AS n_nulls,
         |  COUNT(DISTINCT $c) AS n_distinct,
         |  CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v,
         |  MIN($c) AS min_s, MAX($c) AS max_s
         |FROM lineitem""".stripMargin)
    (numRows ++ strRows).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  // -- equi-width histogram ------------------------------------------------
  // Distribution profile per group: one groupBy over (group, bucket)
  // where bucket = floor(value / width) — a pure map-side expression, so
  // the shuffle carries only (group, bucket, partial count). floor of an
  // IEEE division is bit-identical across engines (no percentile sort,
  // no second pass).
  private val BucketWidth = 50000.0
  private def histogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderstatus",
        floor($"o_totalprice" / BucketWidth).cast("long").as("bucket"))
      .groupBy($"o_orderstatus", $"bucket")
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", $"bucket" * BucketWidth)
      .orderBy($"o_orderstatus", $"bucket")
  }
  // NB: a bare 50000.0 literal is DECIMAL in both SQL dialects — the
  // multiply must go through an explicit DOUBLE to match the DataFrame
  private val histogramSql =
    s"""SELECT o_orderstatus, CAST(floor(o_totalprice / $BucketWidth) AS BIGINT) AS bucket,
       |  COUNT(*) AS n,
       |  CAST(floor(o_totalprice / $BucketWidth) AS BIGINT) * CAST($BucketWidth AS DOUBLE) AS bucket_lo
       |FROM orders
       |GROUP BY 1, 2 ORDER BY o_orderstatus, bucket""".stripMargin

  // -- equi-depth histogram ------------------------------------------------
  // The other histogram a profiler needs: buckets of (approximately)
  // equal ROW COUNT, so a skewed distribution still yields informative
  // boundaries (equi-width puts 90% of a lognormal in one bucket).
  // Construction is on DISTINCT values, not rows: groupBy(value) →
  // per-value counts (map-side combined, the only full-data shuffle),
  // then a prefix sum over the value-ordered groups assigns each group
  // the bucket of its FIRST row — integer arithmetic, and a stated tie
  // policy (equal values never split across buckets — the property a
  // data-skipping histogram needs). The prefix-sum window runs over
  // distinct values only; at 100 TB with a truly unbounded value domain
  // the same construction range-partitions the prefix sum (per-range
  // subtotals + broadcast offsets) instead of one ordered window — the
  // two-pass shape q_pack_sequences documents.
  private val DepthBuckets = 10
  private val DepthRanges = 256L
  private def equidepthHistogram(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val vals = Tables.lineitem(s, d)
      .groupBy($"l_extendedprice".as("v")).agg(count(lit(1)).as("c"))
    // prefix sum as a two-pass VALUE-KEYED shape (never a
    // single-partition global window over the distinct values): each
    // value's coarse range key rk is an affine function of the value
    // against the one-row (vmin, vmax) stats frame — a pure, monotone
    // function of the DATA, so the split is identical under every
    // partition layout, retry, and recomputation (the r10 construction
    // keyed ranges by spark_partition_id + localCheckpoint, betting
    // correctness on a pinned physical layout; a re-executed range
    // sampler after eviction/retry could misalign pid between the two
    // branches — the driver's one hash-red row). Each rk computes a
    // PARALLEL local prefix; the ≤ DepthRanges per-range subtotals
    // broadcast back as offsets. local + offset reconstructs the same
    // cum wherever the affine split lands, because rk is monotone in v.
    val stats = vals.agg(min($"v").as("vmin"), max($"v").as("vmax"))
    val keyed = vals.crossJoin(broadcast(stats))
      .withColumn("rk", when($"vmax" > $"vmin",
          least(lit(DepthRanges - 1), floor(($"v" - $"vmin") /
            ($"vmax" - $"vmin") * DepthRanges).cast("long")))
        .otherwise(lit(0L)))
      .select($"v", $"c", $"rk")
    val local = keyed.withColumn("lcum",
      sum($"c").over(Window.partitionBy($"rk").orderBy($"v")))
    val offs = keyed.groupBy($"rk").agg(sum($"c").as("pc"))
      .withColumn("off",
        coalesce(sum($"pc").over(Window.orderBy($"rk")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      // full-frame spec (not partitionBy()): carries the rk signature
      // the Round13 window gate recognizes as a ≤ 256-row frame
      .withColumn("n", sum($"pc").over(Window.orderBy($"rk")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"rk", $"off", $"n")
    local.join(broadcast(offs), "rk")
      .withColumn("cum", $"lcum" + $"off")
      .withColumn("bucket", expr(s"(cum - c) * $DepthBuckets div n"))
      .groupBy($"bucket")
      .agg(sum($"c").as("n_rows"), min($"v").as("lo"), max($"v").as("hi"),
        count(lit(1)).as("n_distinct"))
      .orderBy($"bucket")
  }
  private val equidepthHistogramSql =
    s"""WITH vals AS (SELECT l_extendedprice AS v, COUNT(*) AS c
       |              FROM lineitem GROUP BY 1),
       |cum AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum,
       |               SUM(c) OVER () AS n FROM vals)
       |SELECT CAST((cum - c) * $DepthBuckets // n AS BIGINT) AS bucket,
       |  CAST(SUM(c) AS BIGINT) AS n_rows, MIN(v) AS lo, MAX(v) AS hi,
       |  COUNT(*) AS n_distinct
       |FROM cum GROUP BY 1 ORDER BY bucket""".stripMargin

  // -- shared: value-keyed two-pass prefix sums ------------------------------
  /** Prefix sums over the DISTINCT-value table `vals`, ordered by
    * `vcol`, without a single-partition global window and without any
    * layout coupling (the equidepth r11 shape): the coarse range key is
    * an affine — hence monotone — function of the value against the
    * broadcast one-row (min, max) stats frame, each range computes a
    * parallel local prefix, and the ≤ 256 per-range subtotals broadcast
    * back as offsets. Appends `cum_<c>` (inclusive prefix sum) and
    * `tot_<c>` (grand total) for every LONG column `c` in `sums`.
    * Deterministic under every partition layout by construction —
    * pinned by the Round11 cross-layout spec. */
  private[operators] def valueKeyedCums(vals: DataFrame, vcol: String,
      sums: Seq[String]): DataFrame = {
    val s = vals.sparkSession
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val v = col(vcol)
    val stats = vals.agg(min(v).as("vk_min"), max(v).as("vk_max"))
    val keyed = vals.crossJoin(broadcast(stats))
      .withColumn("vk_rk", when($"vk_max" > $"vk_min",
          least(lit(255L), floor((v - $"vk_min") /
            ($"vk_max" - $"vk_min") * 256).cast("long")))
        .otherwise(lit(0L)))
      .drop("vk_min", "vk_max")
    val wLoc = Window.partitionBy($"vk_rk").orderBy(v)
    val local = sums.foldLeft(keyed)((df, c) =>
      df.withColumn(s"cum_$c", sum(col(c)).over(wLoc)))
    // offsets: one row per coarse range — the only global window runs
    // over ≤ 256 subtotal rows
    val wOff = Window.orderBy($"vk_rk")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs0 = keyed.groupBy($"vk_rk")
      .agg(sums.map(c => sum(col(c)).as(s"pc_$c")).head,
        sums.map(c => sum(col(c)).as(s"pc_$c")).tail: _*)
    // full-frame spec (not partitionBy()) so the grand total carries the
    // vk_rk order signature the Round13 unpartitioned-window gate
    // recognizes as this helper's ≤ 256-row frame — same value, same
    // single reduce over the subtotal rows
    val wTot = Window.orderBy($"vk_rk")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val offs = sums.foldLeft(offs0)((df, c) =>
      df.withColumn(s"off_$c", coalesce(sum(col(s"pc_$c")).over(wOff), lit(0L)))
        .withColumn(s"tot_$c", sum(col(s"pc_$c")).over(wTot)))
      .select(col("vk_rk") +: sums.flatMap(c =>
        Seq(col(s"off_$c"), col(s"tot_$c"))): _*)
    val joined = local.join(broadcast(offs), "vk_rk")
    sums.foldLeft(joined)((df, c) =>
      df.withColumn(s"cum_$c", col(s"cum_$c") + col(s"off_$c"))
        .drop(s"off_$c"))
      .drop("vk_rk")
  }

  // -- q_ks_test: exact two-sample Kolmogorov-Smirnov drift ------------------
  // The nonparametric distribution-drift test PSI can't give you
  // (q_drift_psi buckets first; KS compares the FULL empirical CDFs):
  // D = max over pooled values of |F1(v) − F2(v)|, here between the
  // order-price distributions of finished ('F') vs open ('O') orders.
  // Everything is exact integers until one final division: per-value
  // counts for both slices in ONE shuffle, value-keyed prefix sums (no
  // global window, no layout coupling), and the divergence is
  // maximized as the INTEGER |cum1·n2 − cum2·n1| — cross-multiplied so
  // no per-row float ratio exists to drift. The decision quantity
  // D = d_scaled/(n1·n2) and the arg-max value are emitted alongside.
  // 100 TB shape: the only full-data shuffle is the (value, counts)
  // groupBy; everything after runs on the distinct-value table.
  private def ksTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val vals = Tables.orders(s, d)
      .filter($"o_orderstatus".isin("F", "O"))
      .groupBy($"o_totalprice".as("v"))
      .agg(sum(when($"o_orderstatus" === "F", 1L).otherwise(0L)).as("c1"),
        sum(when($"o_orderstatus" === "O", 1L).otherwise(0L)).as("c2"))
    val d38 = "decimal(38,0)"
    val di = valueKeyedCums(vals, "v", Seq("c1", "c2"))
      .select($"v",
        abs($"cum_c1".cast(d38) * $"tot_c2" - $"cum_c2".cast(d38) * $"tot_c1")
          .as("di"),
        $"tot_c1".as("n1"), $"tot_c2".as("n2"))
    val dmax = di.agg(max($"di").as("d_scaled"))
    // output types: BIGINT + DOUBLE only. The 128-bit decimal exists
    // only INSIDE the cross-multiply; the maximum itself is bounded by
    // n1·n2 (≈5e9 at sf0.1, ≈5e17 at a 100 TB sf1000 — comfortably
    // int64), so the emitted d_scaled is an exact long on both
    // engines. Emitting the decimal directly was the r11 driver
    // hash-red suspect: DECIMAL(38,0) surfaces as decimal128 through
    // Arrow-family readers, a plausibly hash-distinct representation
    // where integer widths canonicalize together.
    di.join(broadcast(dmax), $"di" === $"d_scaled")
      .groupBy($"n1", $"n2", $"d_scaled")
      .agg(min($"v").as("v_at_max"))
      .select($"n1", $"n2", $"d_scaled".cast("long").as("d_scaled"),
        $"v_at_max",
        ($"d_scaled".cast("double") / ($"n1".cast("double") * $"n2")).as("ks_d"))
  }
  private val ksTestSql =
    """WITH v AS (SELECT o_totalprice AS v,
      |    SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS c1,
      |    SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS c2
      |  FROM orders WHERE o_orderstatus IN ('F', 'O') GROUP BY 1),
      |c AS (SELECT v,
      |    SUM(c1) OVER (ORDER BY v) AS cum1, SUM(c2) OVER (ORDER BY v) AS cum2,
      |    SUM(c1) OVER () AS n1, SUM(c2) OVER () AS n2 FROM v),
      |di AS (SELECT v,
      |    ABS(CAST(cum1 AS HUGEINT) * n2 - CAST(cum2 AS HUGEINT) * n1) AS di,
      |    n1, n2 FROM c),
      |m AS (SELECT MAX(di) AS d_scaled FROM di)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(m.d_scaled AS BIGINT) AS d_scaled, MIN(v) AS v_at_max,
      |  CAST(m.d_scaled AS DOUBLE) / (CAST(n1 AS DOUBLE) * n2) AS ks_d
      |FROM di JOIN m ON di.di = m.d_scaled
      |GROUP BY n1, n2, m.d_scaled""".stripMargin

  // -- q_cusum: change-point detection over the daily revenue series ---------
  // The sequential drift detector KS and PSI can't be (they compare two
  // FIXED windows; CUSUM watches a series and flags WHEN it shifted —
  // Page 1954): one-sided CUSUM of daily revenue against a reference
  // mean. The textbook recursion S_t = max(0, S_{t-1} + x_t − μ) looks
  // inherently sequential, but it has a closed prefix form —
  // S_t = P_t − min(0, min_{j≤t} P_j) with P the plain prefix sum of
  // deviations — so it's two windows, not a driver loop. Exactness: the
  // rational μ = S_ref/n_ref is never divided — deviations are scaled
  // through by n_ref (dev_t = n_ref·x_t − S_ref, exact 128-bit
  // integers over exact cents), the detector output is the floored
  // quotient in micro mean-day units, and the alarm threshold (5
  // reference-mean-days of cumulative excess) is the integer predicate
  // cusum > 5·S_ref. Scale shape: the fact table is touched once by
  // the day groupBy; every window runs over the DAY table, bounded by
  // the calendar span, never over rows.
  private def cusum(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val daily = Tables.orders(s, d)
      .groupBy(to_date($"o_orderdate").as("day"))
      .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
        .as("x_cents"))
    val stats = daily.agg(min($"day").as("d0"))
    val marked = daily.crossJoin(broadcast(stats))
      .withColumn("is_ref", $"day" < date_add($"d0", 365))
    val ref = marked.filter($"is_ref")
      .agg(sum($"x_cents").as("s_ref"), count(lit(1)).as("n_ref"))
    val wCum = Window.orderBy($"day")
    marked.filter(!$"is_ref")
      .crossJoin(broadcast(ref))
      .withColumn("dev", $"n_ref".cast(d38) * $"x_cents" - $"s_ref")
      .withColumn("p", sum($"dev").over(wCum))
      .withColumn("runmin", least(lit(0).cast(d38), min($"p").over(wCum)))
      .withColumn("cusum", $"p" - $"runmin")
      .select($"day", $"x_cents",
        expr("(cusum * 1000000) div s_ref").as("cusum_mu_micro"),
        ($"cusum" > $"s_ref".cast(d38) * 5).as("alarm"))
      .orderBy($"day")
  }
  private val cusumSql =
    """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS x_cents
      |  FROM orders GROUP BY 1),
      |st AS (SELECT MIN(day) AS d0 FROM daily),
      |ref AS (SELECT CAST(SUM(x_cents) AS BIGINT) AS s_ref,
      |    COUNT(*) AS n_ref FROM daily CROSS JOIN st
      |  WHERE day < d0 + 365),
      |post AS (SELECT day, x_cents,
      |    CAST(n_ref AS HUGEINT) * x_cents - s_ref AS dev, s_ref
      |  FROM daily CROSS JOIN st CROSS JOIN ref WHERE day >= d0 + 365),
      |pre AS (SELECT day, x_cents, s_ref,
      |    SUM(dev) OVER (ORDER BY day) AS p FROM post),
      |c AS (SELECT day, x_cents, s_ref, p,
      |    LEAST(CAST(0 AS HUGEINT), MIN(p) OVER (ORDER BY day)) AS runmin
      |  FROM pre)
      |SELECT day, x_cents,
      |  CAST(((p - runmin) * 1000000) // CAST(s_ref AS HUGEINT) AS BIGINT)
      |    AS cusum_mu_micro,
      |  (p - runmin) > CAST(s_ref AS HUGEINT) * 5 AS alarm
      |FROM c ORDER BY day""".stripMargin

  // -- q_mode: deterministic most-frequent value per group -------------------
  // The profile statistic SQL's MODE() gets wrong for distributed use:
  // engine mode() picks an ARBITRARY value among tied frequencies, so
  // two runs (or two engines) can legally disagree. Here the mode is a
  // total-order pick — (count DESC, value ASC) over the per-group
  // DISTINCT-value count table — so ties always resolve to the smallest
  // value, identically everywhere. One count groupBy on the fact table;
  // the rank window runs per group over distinct values only. The
  // group's distinct-value count and the mode's share ride along.
  private def qMode(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val counts = Tables.lineitem(s, d)
      .groupBy($"l_returnflag", $"l_quantity")
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy($"l_returnflag")
      .orderBy($"n".desc, $"l_quantity".asc)
    val wg = Window.partitionBy($"l_returnflag")
    counts
      .withColumn("rk", row_number().over(w))
      .withColumn("n_distinct", count(lit(1)).over(wg))
      .withColumn("n_group", sum($"n").over(wg))
      .filter($"rk" === 1)
      .select($"l_returnflag", $"l_quantity".as("mode_quantity"),
        $"n".as("n_mode"), $"n_distinct",
        expr("(n * 1000000) div n_group").as("share_ppm"))
      .orderBy($"l_returnflag")
  }
  private val qModeSql =
    """WITH c AS (SELECT l_returnflag, l_quantity, COUNT(*) AS n
      |  FROM lineitem GROUP BY 1, 2),
      |r AS (SELECT l_returnflag, l_quantity, n,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY n DESC, l_quantity ASC) AS rk,
      |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n_distinct,
      |    SUM(n) OVER (PARTITION BY l_returnflag) AS n_group
      |  FROM c)
      |SELECT l_returnflag, l_quantity AS mode_quantity,
      |  CAST(n AS BIGINT) AS n_mode, CAST(n_distinct AS BIGINT) AS n_distinct,
      |  (CAST(n AS BIGINT) * 1000000) // CAST(n_group AS BIGINT) AS share_ppm
      |FROM r WHERE rk = 1 ORDER BY l_returnflag""".stripMargin

  // -- q_benford: first-digit-law conformance audit --------------------------
  // The forensic data-quality screen auditors run on financial columns
  // (Benford 1938; Nigrini's fraud-detection practice): naturally
  // occurring multi-magnitude amounts put digit d first with
  // probability log10(1+1/d); fabricated or truncated data doesn't.
  // Engine-exactness: the first significant digit comes from the CENTS
  // INTEGER's decimal string — no log10 ever touches the data — and
  // the nine Benford probabilities are hardcoded ppb constants
  // (universal numbers, identical literals in both engines), so the
  // whole audit is integer arithmetic: observed_ppb is a floored
  // 128-bit quotient, excess_ppb a subtraction. One digit groupBy is
  // the only shuffle; the 9-row digit table joins the one-row total.
  private val BenfordPpb: Seq[(Int, Long)] = Seq(
    1 -> 301029996L, 2 -> 176091259L, 3 -> 124938737L, 4 -> 96910013L,
    5 -> 79181246L, 6 -> 66946790L, 7 -> 57991947L, 8 -> 51152522L,
    9 -> 45757491L)
  private def benford(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val digits = Tables.orders(s, d)
      .select(substring(($"o_totalprice".cast("decimal(18,2)") * 100)
        .cast("long").cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy($"digit").agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum($"n_obs").as("n"))
    val btab = BenfordPpb.toDF("digit", "benford_ppb")
    btab.join(digits, Seq("digit"), "left").na.fill(0L, Seq("n_obs"))
      .crossJoin(broadcast(tot))
      // n_obs·10⁹ wraps a LONG past ~9×10⁹ rows: widen first
      .withColumn("observed_ppb",
        expr("(cast(n_obs as decimal(38,0)) * 1000000000) div n"))
      .select($"digit", $"n_obs", $"benford_ppb", $"observed_ppb",
        ($"observed_ppb" - $"benford_ppb").as("excess_ppb"))
      .orderBy($"digit")
  }
  private val benfordSql = {
    val rows = BenfordPpb.map { case (dg, p) => s"($dg, $p)" }.mkString(", ")
    s"""WITH dg AS (SELECT CAST(substr(CAST(CAST(CAST(o_totalprice
       |      AS DECIMAL(18,2)) * 100 AS BIGINT) AS VARCHAR), 1, 1)
       |    AS INTEGER) AS digit
       |  FROM orders),
       |c AS (SELECT digit, COUNT(*) AS n_obs FROM dg GROUP BY 1),
       |t AS (SELECT SUM(n_obs) AS n FROM c),
       |b AS (SELECT * FROM (VALUES $rows) AS tt(digit, benford_ppb))
       |SELECT b.digit, CAST(COALESCE(c.n_obs, 0) AS BIGINT) AS n_obs,
       |  CAST(b.benford_ppb AS BIGINT) AS benford_ppb,
       |  CAST((CAST(COALESCE(c.n_obs, 0) AS HUGEINT) * 1000000000) // n
       |    AS BIGINT) AS observed_ppb,
       |  CAST((CAST(COALESCE(c.n_obs, 0) AS HUGEINT) * 1000000000) // n
       |    - b.benford_ppb AS BIGINT) AS excess_ppb
       |FROM b LEFT JOIN c USING (digit) CROSS JOIN t
       |ORDER BY b.digit""".stripMargin
  }

  // -- q_gini: concentration (Gini coefficient) of customer spend -----------
  // The inequality audit a data-mixture or revenue report runs: how
  // concentrated is lifetime spend across customers? Gini over sorted
  // per-customer totals, computed EXACTLY on the distinct-value table
  // with tie handling closed-form: for a value v with count c and
  // inclusive cumulative count cum, Σᵢ(2i − n − 1)·v over that tie
  // group collapses to v·c·(2·cum − c − n) — so the numerator is one
  // exact decimal sum and the coefficient is a single IEEE division of
  // exact integers. Spend is 10⁻²-scaled integer cents (the q_variance
  // discipline). Prefix sums are value-keyed two-pass — no global
  // window, no layout coupling.
  private def gini(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val d38 = "decimal(38,0)"
    val spend = Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
        .as("cents"))
    val vals = spend.groupBy($"cents".as("v")).agg(count(lit(1)).as("c"))
    valueKeyedCums(vals, "v", Seq("c"))
      .select(
        ($"v".cast(d38) * $"c" * (lit(2) * $"cum_c" - $"c" - $"tot_c"))
          .as("term"),
        ($"v".cast(d38) * $"c").as("mass"),
        $"tot_c".as("n"))
      .groupBy($"n")
      .agg(sum($"term").as("num"), sum($"mass").cast("long").as("total_cents"))
      .select($"n".as("n_customers"), $"total_cents",
        ($"num".cast("double") /
          ($"n".cast("double") * $"total_cents".cast("double"))).as("gini"))
  }
  private val giniSql =
    """WITH spend AS (SELECT o_custkey,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |v AS (SELECT cents AS v, COUNT(*) AS c FROM spend GROUP BY 1),
      |c AS (SELECT v, c, SUM(c) OVER (ORDER BY v) AS cum,
      |             SUM(c) OVER () AS n FROM v),
      |t AS (SELECT MAX(n) AS n,
      |    SUM(CAST(v AS HUGEINT) * c * (2 * cum - c - n)) AS num,
      |    SUM(CAST(v AS HUGEINT) * c) AS total_cents FROM c)
      |SELECT CAST(n AS BIGINT) AS n_customers,
      |  CAST(total_cents AS BIGINT) AS total_cents,
      |  CAST(num AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(total_cents AS DOUBLE))
      |    AS gini
      |FROM t""".stripMargin

  // -- Count-Min Sketch frequency estimation -------------------------------
  // The fixed-size mergeable frequency sketch (Cormode & Muthukrishnan
  // 2005) that complements Misra-Gries (q_heavy_hitters): d=4 hash rows
  // × w=256 counters, estimate = min over rows of the hashed counter —
  // always an OVERestimate, within eN/w with probability 1-exp(-d).
  // The sketch build is one groupBy over (row, bucket): counters are
  // plain sums, so shards merge by addition — the 100 TB shape (each
  // partition sketches locally, partials add; the shuffle carries
  // d×w=1024 longs per partition, never keys). Hash row j uses the
  // md5-derived mixKey over "j:key", so DuckDB replays the exact
  // placement; estimates and errors are integer-exact on both engines.
  // Output: the 20 heaviest users (exact count desc, user_id ties) with
  // exact vs estimated count — the accuracy accounting production
  // sketches monitor.
  private val CmsD = 4
  private val CmsW = 256L
  private def cmsFreq(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def buckets(df: DataFrame): DataFrame = df.select($"user_id",
      explode(array((0 until CmsD).map(j =>
        struct(lit(j).as("j"),
          (Behavioral.mixKey(concat_ws(":", lit(j), $"user_id")) % CmsW)
            .as("bucket"))): _*)).as("h"))
      .select($"user_id", $"h.j", $"h.bucket")
    val keys = Tables.events(s, d).select($"user_id")
    // one increment per event per hash row → counter = stream mass there
    val sketch = buckets(keys).groupBy($"j", $"bucket")
      .agg(count(lit(1)).as("counter"))
    val exact = keys.groupBy($"user_id").agg(count(lit(1)).as("n_exact"))
    // probe once per DISTINCT key; the ≤ d×w-row sketch broadcasts
    val est = buckets(exact.select($"user_id"))
      .join(broadcast(sketch), Seq("j", "bucket"))
      .groupBy($"user_id").agg(min($"counter").as("est"))
    exact.join(est, "user_id")
      .select($"user_id", $"n_exact", $"est",
        ($"est" - $"n_exact").as("overcount"))
      .orderBy($"n_exact".desc, $"user_id")
      .limit(20)
  }
  private val cmsFreqSql = {
    val h = Behavioral.mixKeySql("concat(j, ':', user_id)")
    s"""WITH keys AS (SELECT user_id FROM events),
       |hashed AS (SELECT u.user_id, j.j AS j, $h % $CmsW AS bucket
       |           FROM (SELECT DISTINCT user_id FROM keys) u,
       |                unnest(range(0, $CmsD)) j(j)),
       |sketch AS (SELECT h.j, h.bucket, COUNT(*) AS counter
       |           FROM keys k JOIN hashed h ON h.user_id = k.user_id
       |           GROUP BY 1, 2),
       |exact AS (SELECT user_id, COUNT(*) AS n_exact FROM keys GROUP BY 1),
       |est AS (SELECT h.user_id, MIN(s.counter) AS est
       |        FROM hashed h JOIN sketch s ON s.j = h.j AND s.bucket = h.bucket
       |        GROUP BY 1)
       |SELECT e.user_id, e.n_exact, est.est, est.est - e.n_exact AS overcount
       |FROM exact e JOIN est ON est.user_id = e.user_id
       |ORDER BY e.n_exact DESC, e.user_id LIMIT 20""".stripMargin
  }

  // -- self-join size (F2) estimation from a CMS ----------------------------
  // The optimizer's cardinality question — "how big is the join on this
  // key?" — answered from a sketch before any join runs. Self-join size
  // = F2 = Σ_k n(k)² (the second frequency moment, AMS'96); the
  // Count-Min inner-product estimate is min over rows j of Σ_b c_j[b]²
  // — ALWAYS an overestimate ((Σn)² ≥ Σn² per bucket), within F1²/w
  // w.h.p. Sketch build is the same d×w counter groupBy as q_cms_freq
  // (mergeable sums, d×w longs per partition on the shuffle, never
  // keys); the squared-sum fold is 4×1024 rows. Exact F2 rides along
  // as accounting: one (key, count) aggregate + a decimal Σn² — the
  // thing the sketch exists to avoid at 100 TB, here the ground truth.
  private val F2W = 1024L
  private def selfJoinSize(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val keys = Tables.lineitem(s, d).select($"l_partkey".as("k"))
    val sketch = keys.select(explode(array((0 until CmsD).map(j =>
        struct(lit(j).as("j"),
          (Behavioral.mixKey(concat_ws(":", lit(j), $"k")) % F2W)
            .as("bucket"))): _*)).as("h"))
      .select($"h.j", $"h.bucket")
      .groupBy($"j", $"bucket").agg(count(lit(1)).as("c"))
    // cast BEFORE multiplying (mirrors the oracle's HUGEINT discipline):
    // a per-bucket counter can exceed ~3e9 rows at 100 TB, where the
    // LONG square silently wraps before a post-multiply cast could help
    val est = sketch
      .groupBy($"j")
      .agg(sum($"c".cast("decimal(38,0)") * $"c").as("e"))
      .agg(min($"e").cast("long").as("f2_est"))
    val exact = keys.groupBy($"k").agg(count(lit(1)).as("n"))
      .agg(count(lit(1)).as("n_keys"),
        sum($"n".cast("decimal(38,0)") * $"n").cast("long").as("f2_exact"))
    exact.crossJoin(est)
      .select($"n_keys", $"f2_exact", $"f2_est",
        ($"f2_est" - $"f2_exact").as("overcount"))
  }
  private val selfJoinSizeSql = {
    val h = Behavioral.mixKeySql("concat(j, ':', k)")
    s"""WITH keys AS (SELECT l_partkey AS k FROM lineitem),
       |sk AS (SELECT j.j AS j, $h % $F2W AS bucket, COUNT(*) AS c
       |       FROM keys, unnest(range(0, $CmsD)) j(j) GROUP BY 1, 2),
       |est AS (SELECT CAST(MIN(e) AS BIGINT) AS f2_est FROM (
       |  SELECT j, SUM(CAST(c AS HUGEINT) * c) AS e FROM sk GROUP BY j)),
       |ex AS (SELECT COUNT(*) AS n_keys,
       |    CAST(SUM(CAST(n AS HUGEINT) * n) AS BIGINT) AS f2_exact
       |  FROM (SELECT k, COUNT(*) AS n FROM keys GROUP BY k))
       |SELECT n_keys, f2_exact, f2_est, f2_est - f2_exact AS overcount
       |FROM ex CROSS JOIN est""".stripMargin
  }

  // -- two-table join size estimation from CMS inner product ----------------
  // The general form of q_selfjoin_size's F2: |R ⋈ S on k| = Σ_k
  // n_R(k)·n_S(k) is the CMS INNER PRODUCT (Cormode & Muthukrishnan
  // 2005, §4.2) — sketch each side independently with the SAME hash
  // family, estimate = min over rows j of Σ_b cR_j[b]·cS_j[b]; always
  // an overestimate (colliding keys add cross terms), within
  // F1(R)·F1(S)/w w.h.p. This is the planner's pre-flight for a join
  // it hasn't run: both sketches are mergeable d×w counter grids built
  // in one map-side-combined pass per table — at 100 TB the two tables
  // never meet; only 2·d·w longs do. Exact join size rides along as
  // ground truth via the (key, count)⋈(key, count) aggregate.
  private def joinSizeCms(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // ONE scan per table: the (key, count) aggregate feeds BOTH legs —
    // the sketch hashes each DISTINCT key once with its count as the
    // increment weight (identical counters to per-row increments, 4×
    // fewer exploded rows on a 4-lines-per-order fact), and the exact
    // inner product reuses the same frame (localCheckpoint: two
    // consumers)
    def keyCounts(df: DataFrame, cname: String): DataFrame = df
      .groupBy($"k").agg(count(lit(1)).as(cname)).localCheckpoint()
    def sketch(kc: DataFrame, cname: String): DataFrame = kc
      .select(col(cname).as("n"),
        explode(array((0 until CmsD).map(j =>
          struct(lit(j).as("j"),
            (Behavioral.mixKey(concat_ws(":", lit(j), $"k")) % F2W)
              .as("bucket"))): _*)).as("h"))
      .select($"h.j", $"h.bucket", $"n")
      .groupBy($"j", $"bucket").agg(sum($"n").as(cname))
    val ko = keyCounts(Tables.orders(s, d).select($"o_orderkey".as("k")),
      "n_r")
    val kl = keyCounts(Tables.lineitem(s, d).select($"l_orderkey".as("k")),
      "n_s")
    // cast BEFORE multiplying (the q_selfjoin_size 128-bit rule)
    val est = sketch(ko, "n_r").join(sketch(kl, "n_s"), Seq("j", "bucket"))
      .groupBy($"j")
      .agg(sum($"n_r".cast("decimal(38,0)") * $"n_s").as("e"))
      .agg(min($"e").cast("long").as("join_est"))
    val exact = ko.join(kl, "k")
      .agg(count(lit(1)).as("n_shared_keys"),
        sum($"n_r".cast("decimal(38,0)") * $"n_s").cast("long")
          .as("join_exact"))
    exact.crossJoin(est)
      .select($"n_shared_keys", $"join_exact", $"join_est",
        ($"join_est" - $"join_exact").as("overcount"))
  }
  private val joinSizeCmsSql = {
    val h = Behavioral.mixKeySql("concat(j, ':', k)")
    s"""WITH ko AS (SELECT o_orderkey AS k FROM orders),
       |kl AS (SELECT l_orderkey AS k FROM lineitem),
       |so AS (SELECT j.j AS j, $h % $F2W AS bucket, COUNT(*) AS co
       |       FROM ko, unnest(range(0, $CmsD)) j(j) GROUP BY 1, 2),
       |sl AS (SELECT j.j AS j, $h % $F2W AS bucket, COUNT(*) AS cl
       |       FROM kl, unnest(range(0, $CmsD)) j(j) GROUP BY 1, 2),
       |est AS (SELECT CAST(MIN(e) AS BIGINT) AS join_est FROM (
       |  SELECT so.j, SUM(CAST(co AS HUGEINT) * cl) AS e
       |  FROM so JOIN sl ON sl.j = so.j AND sl.bucket = so.bucket
       |  GROUP BY so.j)),
       |ex AS (SELECT COUNT(*) AS n_shared_keys,
       |    CAST(SUM(CAST(n_r AS HUGEINT) * n_s) AS BIGINT) AS join_exact
       |  FROM (SELECT k, COUNT(*) AS n_r FROM ko GROUP BY 1) a
       |  JOIN (SELECT k, COUNT(*) AS n_s FROM kl GROUP BY 1) b USING (k))
       |SELECT n_shared_keys, join_exact, join_est,
       |  join_est - join_exact AS overcount
       |FROM ex CROSS JOIN est""".stripMargin
  }

  // -- q_fd_check: uniqueness + functional-dependency profiling -------------
  // The data-quality question constraint validation (57h) can't answer
  // because nobody DECLARED the constraint: does this candidate key
  // actually identify rows, does this column determine that one?
  // (Metanome-style dependency profiling, here over a fixed candidate
  // set — at discovery scale the lattice search prunes, but each CHECK
  // is exactly this shape.) Every candidate is ONE map-side-combined
  // groupBy on its LHS: uniqueness counts rows per key, an FD counts
  // DISTINCT RHS per LHS; a violation is a group past 1. The audit row
  // carries group count, violating-group count, worst cardinality, and
  // the verdict — candidates chosen to exercise both outcomes (order
  // keys hold; part→supplier and user→event_type genuinely fail).
  private def fdCheck(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    def audit(name: String, grouped: DataFrame): DataFrame = grouped
      .agg(count(lit(1)).as("n_groups"),
        sum(when($"card" > 1, 1L).otherwise(0L)).as("n_violations"),
        max($"card").as("max_card"))
      .select(lit(name).as("candidate"), $"n_groups", $"n_violations",
        $"max_card",
        when($"n_violations" === 0, 1L).otherwise(0L).as("holds"))
    val u1 = audit("unique:orders.o_orderkey",
      Tables.orders(s, d).groupBy($"o_orderkey")
        .agg(count(lit(1)).as("card")))
    val u2 = audit("unique:lineitem.(l_orderkey,l_linenumber)",
      Tables.lineitem(s, d).groupBy($"l_orderkey", $"l_linenumber")
        .agg(count(lit(1)).as("card")))
    val f1 = audit("fd:lineitem.l_partkey->l_suppkey",
      Tables.lineitem(s, d).groupBy($"l_partkey")
        .agg(countDistinct($"l_suppkey").as("card")))
    val f2 = audit("fd:customer.c_custkey->c_nationkey",
      Tables.customer(s, d).groupBy($"c_custkey")
        .agg(countDistinct($"c_nationkey").as("card")))
    val f3 = audit("fd:events.user_id->event_type",
      Tables.events(s, d).groupBy($"user_id")
        .agg(countDistinct($"event_type").as("card")))
    u1.unionByName(u2).unionByName(f1).unionByName(f2).unionByName(f3)
      .orderBy($"candidate")
  }
  private val fdCheckSql =
    """WITH u1 AS (SELECT COUNT(*) AS card FROM orders GROUP BY o_orderkey),
      |u2 AS (SELECT COUNT(*) AS card FROM lineitem
      |       GROUP BY l_orderkey, l_linenumber),
      |f1 AS (SELECT COUNT(DISTINCT l_suppkey) AS card FROM lineitem
      |       GROUP BY l_partkey),
      |f2 AS (SELECT COUNT(DISTINCT c_nationkey) AS card FROM customer
      |       GROUP BY c_custkey),
      |f3 AS (SELECT COUNT(DISTINCT event_type) AS card FROM events
      |       GROUP BY user_id),
      |a AS (
      |  SELECT 'unique:orders.o_orderkey' AS candidate, COUNT(*) AS n_groups,
      |    SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END) AS n_violations,
      |    MAX(card) AS max_card FROM u1
      |  UNION ALL SELECT 'unique:lineitem.(l_orderkey,l_linenumber)',
      |    COUNT(*), SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END), MAX(card)
      |  FROM u2
      |  UNION ALL SELECT 'fd:lineitem.l_partkey->l_suppkey', COUNT(*),
      |    SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END), MAX(card) FROM f1
      |  UNION ALL SELECT 'fd:customer.c_custkey->c_nationkey', COUNT(*),
      |    SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END), MAX(card) FROM f2
      |  UNION ALL SELECT 'fd:events.user_id->event_type', COUNT(*),
      |    SUM(CASE WHEN card > 1 THEN 1 ELSE 0 END), MAX(card) FROM f3)
      |SELECT candidate, n_groups, CAST(n_violations AS BIGINT)
      |    AS n_violations,
      |  CAST(max_card AS BIGINT) AS max_card,
      |  CAST(CASE WHEN n_violations = 0 THEN 1 ELSE 0 END AS BIGINT)
      |    AS holds
      |FROM a ORDER BY candidate""".stripMargin

  // -- join-key skew diagnostic --------------------------------------------
  // The measurement that decides whether a join needs salting (SURVEY
  // #46): per-key counts → the heaviest keys with their share of the
  // table, plus the global skew factor max/avg carried on every row.
  // One narrow (key, count) shuffle + a broadcast one-row total; at
  // 100 TB this is the cheap pre-flight before choosing a join strategy.
  private def keySkew(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val counts = Tables.lineitem(s, d)
      .groupBy($"l_suppkey").agg(count(lit(1)).as("n"))
    val totals = counts.agg(
      sum($"n").as("total"), count(lit(1)).as("n_keys"), max($"n").as("max_n"))
    counts.crossJoin(broadcast(totals))
      .select($"l_suppkey", $"n",
        ($"n".cast("double") / $"total").as("share"),
        ($"max_n" * $"n_keys".cast("double") / $"total").as("skew_factor"))
      .orderBy($"n".desc, $"l_suppkey")
      .limit(5)
  }
  private val keySkewSql =
    """WITH c AS (SELECT l_suppkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
      |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total, COUNT(*) AS n_keys,
      |             MAX(n) AS max_n FROM c)
      |SELECT l_suppkey, n,
      |  CAST(n AS DOUBLE) / total AS share,
      |  max_n * CAST(n_keys AS DOUBLE) / total AS skew_factor
      |FROM c CROSS JOIN t
      |ORDER BY n DESC, l_suppkey LIMIT 5""".stripMargin

  // -- VARIANT extraction (Spark 4 semi-structured type) --------------------
  // The schema-FLEXIBLE complement of q_json_extract's declared-schema
  // parse: `parse_json` shreds the JSON once into the binary VARIANT
  // encoding, and every later `variant_get` path access is a typed
  // lookup into that encoding — no re-parse per field, no schema
  // declared up front. At 100 TB this is the difference between paying
  // the JSON parse once per row vs once per row PER FIELD; fields can
  // be added to props without touching the pipeline.
  private def variantExtract(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select($"event_type",
        expr("variant_get(parse_json(props), '$.k', 'long')").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), sum($"k").as("sum_k"),
        min($"k").as("min_k"), max($"k").as("max_k"))
      .orderBy($"event_type")
  }
  private val variantExtractSql =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k,
      |  MIN(CAST(props->>'k' AS BIGINT)) AS min_k,
      |  MAX(CAST(props->>'k' AS BIGINT)) AS max_k
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- recursive CTE (Spark 4 WITH RECURSIVE) --------------------------------
  // Declarative iteration INSIDE one SQL statement — the engine runs
  // the fixpoint loop (contrast dedup_components, where the driver
  // loop owns convergence). Closure over a derived binary tree on
  // user ids (child u → parent u div 2): per-user depth from root 0,
  // folded to depth histogram. Each recursion step is a narrow
  // (id, depth) equi-join — the same shape the driver-loop version
  // shuffles, but planned and iterated by the engine.
  private def recursiveCte(s: SparkSession, d: String): DataFrame = {
    // materialize the node set ONCE: the engine replays the recursive
    // step's full plan every iteration, so an un-materialized view
    // re-scans events.parquet and re-runs the distinct per depth level
    // (measured 11s → 3s at sf0.1); localCheckpoint truncates the plan
    // to the computed rows, exactly like the label-propagation loop
    Tables.events(s, d).select("user_id").distinct().localCheckpoint()
      .createOrReplaceTempView("graft_rcte_users")
    s.sql(
      """WITH RECURSIVE walk(user_id, depth) AS (
        |  SELECT CAST(0 AS BIGINT), 0
        |  UNION ALL
        |  SELECT u.user_id, w.depth + 1
        |  FROM graft_rcte_users u JOIN walk w
        |    ON u.user_id DIV 2 = w.user_id AND u.user_id > w.user_id
        |)
        |SELECT depth, COUNT(*) AS n_users,
        |  MIN(user_id) AS min_id, MAX(user_id) AS max_id
        |FROM walk GROUP BY depth ORDER BY depth""".stripMargin)
  }
  private val recursiveCteSql =
    """WITH RECURSIVE users AS (SELECT DISTINCT user_id FROM events),
      |walk(user_id, depth) AS (
      |  SELECT CAST(0 AS BIGINT), 0
      |  UNION ALL
      |  SELECT u.user_id, w.depth + 1
      |  FROM users u JOIN walk w
      |    ON u.user_id // 2 = w.user_id AND u.user_id > w.user_id
      |)
      |SELECT depth, COUNT(*) AS n_users,
      |  MIN(user_id) AS min_id, MAX(user_id) AS max_id
      |FROM walk GROUP BY depth ORDER BY depth""".stripMargin

  // -- heavy hitters: Misra-Gries candidates + exact verification ----------
  // The deterministic two-pass heavy-hitter pattern: pass 1 runs the
  // mergeable Misra-Gries summary (graft.functions.MisraGriesAgg — m
  // counters per partition, map-side partials, tiny merge) whose
  // guarantee is NO FALSE NEGATIVES: every key with true frequency
  // > n/(m+1) is in the summary. Pass 2 exact-counts ONLY the candidate
  // keys (a broadcast semi-join, so the shuffle carries just candidate
  // rows) and applies the threshold to TRUE counts — which keys survive
  // merge-order wobble never matters, so the result is deterministic
  // and oracle-able even though the sketch itself is not. At 100 TB
  // this replaces a full per-key aggregate with one sketch pass + one
  // filtered count.
  private val HhM = 9          // MG counters → catches freq > n/10
  private val HhDen = 10       // report keys with n * HhDen > total
  private def heavyHitters(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // The testdata is uniform everywhere, so (like q_salted_skew_join)
    // the skew is derived deterministically from row identity: half the
    // rows share two hot keys (~25% each), the rest spread over a
    // ~500-key tail (1000 % 4 = 0, so cold keys keep l_orderkey % 4 ∈
    // {2,3}) — hundreds of distinct keys against 9 counters, so the
    // sketch genuinely prunes (a uniform key set would fit entirely in
    // the counters and never exercise the decrement/merge path).
    val keyed = Tables.lineitem(s, d)
      .select(when($"l_orderkey" % 4 < 2, concat(lit("hot_"), $"l_orderkey" % 2))
        .otherwise(concat(lit("cold_"), $"l_orderkey" % 1000)).as("k"))
    val summary = keyed.agg(
      graft.functions.MisraGries.misra_gries($"k", HhM).as("mg"),
      count(lit(1)).as("total"))
    val candidates = summary.select(explode(map_keys($"mg")).as("k"), $"total")
    keyed.join(broadcast(candidates), Seq("k"))
      .groupBy($"k", $"total").agg(count(lit(1)).as("n"))
      .filter($"n" * HhDen > $"total")
      .select($"k", $"n", ($"n".cast("double") / $"total").as("share"))
      .orderBy($"k")
  }
  private val heavyHittersSql =
    s"""WITH keyed AS (SELECT CASE WHEN l_orderkey % 4 < 2
       |    THEN 'hot_' || CAST(l_orderkey % 2 AS VARCHAR)
       |    ELSE 'cold_' || CAST(l_orderkey % 1000 AS VARCHAR) END AS k
       |  FROM lineitem),
       |c AS (SELECT k, COUNT(*) AS n FROM keyed GROUP BY 1),
       |t AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM c)
       |SELECT k, n, CAST(n AS DOUBLE) / total AS share
       |FROM c CROSS JOIN t WHERE n * $HhDen > total
       |ORDER BY k""".stripMargin

  // -- row-level constraint validation (data-quality gate) -----------------
  // Deequ/dbt-test shape: declarative rules evaluated in ONE scan — a
  // per-rule violation flag is a map-side expression, the only
  // aggregate is the global (rule, count) fold, zero data shuffle. A
  // NULL rule verdict counts as a violation (a constraint that cannot
  // be evaluated is not satisfied). The 100 TB posture for "did this
  // drop pass the contract": one pass, a few dozen counters.
  private def validateRules(s: SparkSession): Seq[(String, Column)] = {
    import s.implicits._
    Seq(
      "discount_le_6pct" -> ($"l_discount" <= 0.06),
      "price_over_1000" -> ($"l_extendedprice" > 1000.0),
      "quantity_in_range" -> $"l_quantity".between(1.0, 50.0),
      "tax_below_5pct" -> ($"l_tax" < 0.05))
  }
  private def validateRows(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val rules = validateRules(s)
    val aggs = rules.map { case (name, rule) =>
      sum(when(coalesce(rule, lit(false)), 0L).otherwise(1L)).as(s"v_$name")
    } :+ count(lit(1)).as("n_rows")
    val one = Tables.lineitem(s, d).agg(aggs.head, aggs.tail: _*)
    val stacked = rules.map { case (name, _) => s"'$name', v_$name" }
    one.selectExpr("n_rows",
        s"stack(${rules.size}, ${stacked.mkString(", ")}) AS (rule, n_violations)")
      .select($"rule", $"n_violations",
        ($"n_violations".cast("double") / $"n_rows").as("violation_rate"))
      .orderBy($"rule")
  }
  private val validateRowsSql = {
    val ruleSql = Seq(
      "discount_le_6pct" -> "l_discount <= 0.06",
      "price_over_1000" -> "l_extendedprice > 1000.0",
      "quantity_in_range" -> "l_quantity BETWEEN 1.0 AND 50.0",
      "tax_below_5pct" -> "l_tax < 0.05")
    ruleSql.map { case (name, cond) =>
      s"""SELECT '$name' AS rule,
         |  CAST(SUM(CASE WHEN COALESCE($cond, false) THEN 0 ELSE 1 END) AS BIGINT)
         |    AS n_violations,
         |  CAST(SUM(CASE WHEN COALESCE($cond, false) THEN 0 ELSE 1 END) AS DOUBLE)
         |    / COUNT(*) AS violation_rate
         |FROM lineitem""".stripMargin
    }.mkString("", "\nUNION ALL\n", "\nORDER BY rule")
  }

  // -- q_collate_group: collation-aware grouping (Spark 4) -----------------
  // Case-insensitive semantics declared IN THE TYPE: grouping under the
  // UTF8_LCASE collation folds case at compare time, and the collation
  // travels with the column through joins/sorts/aggs — no lower()
  // shadow column to keep in sync (the pre-collation idiom, which
  // silently breaks the moment one code path forgets the wrapper).
  // Still codegen'd + map-side-combinable like any hash aggregate; the
  // output casts back to UTF8_BINARY so the result schema stays
  // engine-neutral. Mixed-case input derived deterministically from
  // the data (even custkeys see UPPER, odd see lower).
  private def collateGroup(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.OracleMath.dsum
    Tables.customer(s, d)
      .withColumn("seg", when($"c_custkey" % 2 === 0, upper($"c_mktsegment"))
        .otherwise(lower($"c_mktsegment")))
      .groupBy(collate($"seg", "UTF8_LCASE").as("k"))
      .agg(count(lit(1)).as("n"), dsum($"c_acctbal").as("sum_bal"))
      .select(collate(lower($"k"), "UTF8_BINARY").as("segment"), $"n", $"sum_bal")
      .orderBy($"segment")
  }
  private val collateGroupSql =
    s"""WITH c AS (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
       |    ELSE lower(c_mktsegment) END AS seg, c_acctbal FROM customer)
       |SELECT lower(seg) AS segment, COUNT(*) AS n,
       |  ${graft.OracleMath.sqlSum("c_acctbal")} AS sum_bal
       |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  // -- q_drift_psi: distribution drift between stream halves ---------------
  // The per-batch data-quality monitor an ingest pipeline runs before
  // training consumes a snapshot: Population Stability Index per
  // categorical bucket between a reference window (older half of the
  // stream by timestamp) and the current window — PSI_i =
  // (p_i − q_i)·ln(p_i/q_i), add-one smoothed so empty buckets are
  // well-defined; contributions are non-negative by construction
  // (both factors share a sign) and rows with PSI ≳ 0.2 flag actionable
  // drift. Shapes: one narrow (type, side) aggregation is the only
  // shuffle; the split point and totals ride one-row broadcasts; the
  // per-bucket math is row-local. Parity: counts exact integers, the
  // probabilities are correctly-rounded double divisions of exact ints
  // (bit-identical cross-engine), one ln() per bucket with identical
  // parenthesization, output rounded through DECIMAL(18,6).
  private def driftPsi(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val e = Tables.events(s, d).select($"ts_ns", $"event_type")
    val bounds = e.agg(min($"ts_ns").as("lo"), max($"ts_ns").as("hi"))
    val sided = e.crossJoin(broadcast(bounds))
      .withColumn("is_ref", expr("ts_ns <= lo + (hi - lo) div 2"))
    val cnt = sided.groupBy($"event_type").agg(
      sum(when($"is_ref", 1L).otherwise(0L)).as("c_ref"),
      sum(when(!$"is_ref", 1L).otherwise(0L)).as("c_cur"))
    val tot = cnt.agg(sum($"c_ref").as("n_ref"), sum($"c_cur").as("n_cur"),
      count(lit(1)).as("b"))
    cnt.crossJoin(broadcast(tot))
      .withColumn("p", ($"c_ref" + 1.0) / ($"n_ref" + $"b"))
      .withColumn("q", ($"c_cur" + 1.0) / ($"n_cur" + $"b"))
      .withColumn("psi", (($"p" - $"q") * log($"p" / $"q"))
        .cast("decimal(18,6)").cast("double"))
      .select($"event_type", $"c_ref", $"c_cur", $"psi")
      .orderBy($"event_type")
  }
  private val driftPsiSql =
    """WITH e AS (SELECT epoch_ns(ts) AS ts_ns, event_type FROM events),
      |bounds AS (SELECT MIN(ts_ns) AS lo, MAX(ts_ns) AS hi FROM e),
      |sided AS (SELECT event_type, ts_ns <= lo + (hi - lo) // 2 AS is_ref
      |          FROM e CROSS JOIN bounds),
      |cnt AS (SELECT event_type,
      |    CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT) AS c_ref,
      |    CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT) AS c_cur
      |  FROM sided GROUP BY event_type),
      |tot AS (SELECT CAST(SUM(c_ref) AS BIGINT) AS n_ref,
      |    CAST(SUM(c_cur) AS BIGINT) AS n_cur, COUNT(*) AS b FROM cnt),
      |w AS (SELECT event_type, c_ref, c_cur,
      |    (c_ref + 1.0) / (n_ref + b) AS p, (c_cur + 1.0) / (n_cur + b) AS q
      |  FROM cnt CROSS JOIN tot)
      |SELECT event_type, c_ref, c_cur,
      |  CAST(CAST((p - q) * ln(p / q) AS DECIMAL(18,6)) AS DOUBLE) AS psi
      |FROM w ORDER BY event_type""".stripMargin

  // -- q_k_anonymity: generalization-ladder privacy release ----------------
  // The Samarati/Sweeney release discipline for publishing grouped
  // data: a quasi-identifier cell (nation, segment) is released only
  // if ≥ K individuals share it; smaller cells climb a generalization
  // ladder — segment generalizes to 'ANY' within the nation — and
  // whatever still can't reach K is suppressed into one global bucket.
  // Every released row therefore describes ≥ K people, and the output
  // conserves the population exactly (spec-pinned). Two narrow
  // aggregations (cells, then the pooled ladder level) are the only
  // shuffles; the ladder operates on the CELL table (O(cells), not
  // O(rows)), which is what makes generalization affordable at 100 TB.
  private val AnonK = 10

  private def kAnonymity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
      .select($"c_nationkey".cast("long").as("nation"), $"c_mktsegment".as("seg"))
    val l0 = c.groupBy($"nation", $"seg").agg(count(lit(1)).as("n"))
    val rel0 = l0.filter($"n" >= AnonK).withColumn("level", lit(0))
      .select($"nation", $"seg", $"n", $"level")
    val l1 = l0.filter($"n" < AnonK)
      .groupBy($"nation").agg(sum($"n").as("n"))
      .withColumn("seg", lit("ANY"))
    val rel1 = l1.filter($"n" >= AnonK).withColumn("level", lit(1))
      .select($"nation", $"seg", $"n", $"level")
    val sup = l1.filter($"n" < AnonK)
      .agg(coalesce(sum($"n"), lit(0L)).as("n"))
      .select(lit(-1L).as("nation"), lit("SUPPRESSED").as("seg"), $"n",
        lit(2).as("level"))
    rel0.unionByName(rel1).unionByName(sup)
      .orderBy($"level", $"nation", $"seg")
  }
  // -- q_l_diversity: the sensitive-attribute strengthening of k-anon -------
  // k-anonymity alone leaks when a ≥K cell is HOMOGENEOUS in the
  // sensitive attribute (everyone in the cell shares the secret —
  // Machanavajjhala et al. 2007): l-diversity additionally requires
  // ≥ L distinct sensitive values per released cell. Same
  // generalization ladder as q_k_anonymity — cell released iff n ≥ K
  // AND distinct(sensitive) ≥ L, failures pool to the nation level,
  // the rest suppress — but the climb re-aggregates the RAW rows of
  // failed cells (a broadcast-able cell-list semi-join), because
  // distinct counts don't merge from cell partials. Sensitive here =
  // the account-balance band.
  private val DivL = 3
  private def lDiversity(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val c = Tables.customer(s, d)
      .select($"c_nationkey".cast("long").as("nation"), $"c_mktsegment".as("seg"),
        floor($"c_acctbal" / 2000).cast("long").as("sens"))
    val l0 = c.groupBy($"nation", $"seg")
      .agg(count(lit(1)).as("n"), countDistinct($"sens").as("n_sensitive"))
    val ok0 = $"n" >= AnonK && $"n_sensitive" >= DivL
    val rel0 = l0.filter(ok0).withColumn("level", lit(0))
      .select($"nation", $"seg", $"n", $"n_sensitive", $"level")
    val failedCells = l0.filter(!ok0).select($"nation", $"seg")
    val pooledRows = c.join(broadcast(failedCells), Seq("nation", "seg"), "left_semi")
    val l1 = pooledRows.groupBy($"nation")
      .agg(count(lit(1)).as("n"), countDistinct($"sens").as("n_sensitive"))
      .withColumn("seg", lit("ANY"))
    val ok1 = $"n" >= AnonK && $"n_sensitive" >= DivL
    val rel1 = l1.filter(ok1).withColumn("level", lit(1))
      .select($"nation", $"seg", $"n", $"n_sensitive", $"level")
    val supRows = pooledRows
      .join(broadcast(l1.filter(!ok1).select($"nation")), Seq("nation"), "left_semi")
    val sup = supRows
      .agg(coalesce(count(lit(1)), lit(0L)).as("n"),
        coalesce(countDistinct($"sens"), lit(0L)).as("n_sensitive"))
      .select(lit(-1L).as("nation"), lit("SUPPRESSED").as("seg"), $"n",
        $"n_sensitive", lit(2).as("level"))
    rel0.unionByName(rel1).unionByName(sup)
      .orderBy($"level", $"nation", $"seg")
  }
  private val lDiversitySql =
    s"""WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    c_mktsegment AS seg,
       |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS sens FROM customer),
       |l0 AS (SELECT nation, seg, COUNT(*) AS n,
       |    COUNT(DISTINCT sens) AS n_sensitive FROM c GROUP BY 1, 2),
       |rel0 AS (SELECT nation, seg, n, n_sensitive, 0 AS level FROM l0
       |         WHERE n >= $AnonK AND n_sensitive >= $DivL),
       |failed AS (SELECT nation, seg FROM l0
       |           WHERE NOT (n >= $AnonK AND n_sensitive >= $DivL)),
       |pooled AS (SELECT c.* FROM c SEMI JOIN failed USING (nation, seg)),
       |l1 AS (SELECT nation, 'ANY' AS seg, COUNT(*) AS n,
       |    COUNT(DISTINCT sens) AS n_sensitive FROM pooled GROUP BY 1),
       |rel1 AS (SELECT nation, seg, n, n_sensitive, 1 AS level FROM l1
       |         WHERE n >= $AnonK AND n_sensitive >= $DivL),
       |supn AS (SELECT nation FROM l1
       |         WHERE NOT (n >= $AnonK AND n_sensitive >= $DivL)),
       |sup AS (SELECT CAST(-1 AS BIGINT) AS nation, 'SUPPRESSED' AS seg,
       |    COUNT(*) AS n, COUNT(DISTINCT p.sens) AS n_sensitive, 2 AS level
       |  FROM pooled p SEMI JOIN supn USING (nation))
       |SELECT nation, seg, CAST(n AS BIGINT) AS n,
       |  CAST(n_sensitive AS BIGINT) AS n_sensitive, level
       |FROM (SELECT * FROM rel0 UNION ALL SELECT * FROM rel1
       |      UNION ALL SELECT * FROM sup)
       |ORDER BY level, nation, seg""".stripMargin

  // -- q_t_closeness: the distribution-shape strengthening of l-diversity ---
  // l-diversity counts distinct sensitive values; it still leaks when a
  // cell's DISTRIBUTION is skewed (99% of a cell in the top balance
  // band tells you the secret with 99% confidence even with L distinct
  // values present). t-closeness (Li, Li & Venkatasubramanian, ICDE
  // 2007) bounds the Earth Mover's Distance between each cell's
  // sensitive distribution and the GLOBAL one: for an ordered attribute
  // EMD = (1/(m−1)) Σ_i |CumP_i − CumQ_i|. Everything is exact integers
  // via cross-multiplication — the per-step term is
  // |cum_cell·N − cum_global·n_cell| (no per-row fractions exist to
  // drift) in decimal(38,0) (the product overflows int64 past ~1e6
  // rows), the pass test t ≤ 1/5 is the integer comparison
  // 5·emd_num ≤ n·N·(m−1), and emd_micro one floored quotient. Scale:
  // two groupBys over the raw rows (cell and cell×value), the global
  // cum over the ≤ value-domain band rows (bounded: the band ladder is
  // fixed by the attribute's range, audited in the window gate), the
  // cell cums per-cell-partitioned — no data-proportional global sort.
  private val TCloseDen = 5L // t = 1/5
  private def tCloseness(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val c = Tables.customer(s, d)
      .select($"c_nationkey".cast("long").as("nation"),
        $"c_mktsegment".as("seg"),
        floor($"c_acctbal" / 2000).cast("long").as("sens"))
    val gv = c.groupBy($"sens").agg(count(lit(1)).as("gc"))
    val wg = Window.orderBy($"sens")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val gcum = gv.withColumn("cumg", sum($"gc").over(wg))
      .select($"sens", $"cumg")
    val stats = gv.agg(sum($"gc").as("big_n"), count(lit(1)).as("m"))
    val cells = c.groupBy($"nation", $"seg").agg(count(lit(1)).as("n"))
    val cv = c.groupBy($"nation", $"seg", $"sens").agg(count(lit(1)).as("cc"))
    val wc = Window.partitionBy($"nation", $"seg").orderBy($"sens")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cells.crossJoin(broadcast(gcum))
      .join(cv, Seq("nation", "seg", "sens"), "left")
      .na.fill(0L, Seq("cc"))
      .withColumn("cumc", sum($"cc").over(wc))
      .crossJoin(broadcast(stats))
      .select($"nation", $"seg", $"n", $"m", $"big_n",
        abs($"cumc".cast(dec) * $"big_n" - $"cumg".cast(dec) * $"n")
          .as("term"))
      .groupBy($"nation", $"seg", $"n", $"m", $"big_n")
      .agg(sum($"term").as("emd_num"))
      .select($"nation", $"seg", $"n",
        expr("CAST((emd_num * 1000000) div (CAST(n AS DECIMAL(38,0)) " +
          "* big_n * greatest(m - 1, 1)) AS BIGINT)").as("emd_micro"),
        when($"emd_num" * TCloseDen <=
            $"n".cast(dec) * $"big_n" * greatest($"m" - 1, lit(1L)), 1L)
          .otherwise(0L).as("t_pass"))
      .orderBy($"nation", $"seg")
  }
  private val tClosenessSql =
    s"""WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    c_mktsegment AS seg,
       |    CAST(floor(c_acctbal / 2000) AS BIGINT) AS sens FROM customer),
       |gv AS (SELECT sens, COUNT(*) AS gc FROM c GROUP BY 1),
       |g AS (SELECT sens, SUM(gc) OVER (ORDER BY sens) AS cumg FROM gv),
       |st AS (SELECT CAST(SUM(gc) AS BIGINT) AS big_n, COUNT(*) AS m
       |       FROM gv),
       |cells AS (SELECT nation, seg, COUNT(*) AS n FROM c GROUP BY 1, 2),
       |cv AS (SELECT nation, seg, sens, COUNT(*) AS cc FROM c
       |       GROUP BY 1, 2, 3),
       |grid AS (SELECT cells.nation, cells.seg, cells.n, g.sens, g.cumg,
       |    COALESCE(cv.cc, 0) AS cc
       |  FROM cells CROSS JOIN g
       |  LEFT JOIN cv ON cv.nation = cells.nation AND cv.seg = cells.seg
       |    AND cv.sens = g.sens),
       |cum AS (SELECT *, SUM(cc) OVER (PARTITION BY nation, seg
       |    ORDER BY sens) AS cumc FROM grid),
       |agg AS (SELECT nation, seg, n,
       |    SUM(ABS(CAST(cumc AS HUGEINT) * st.big_n
       |      - CAST(cumg AS HUGEINT) * n)) AS emd_num,
       |    MAX(st.big_n) AS big_n, MAX(st.m) AS m
       |  FROM cum CROSS JOIN st GROUP BY 1, 2, 3)
       |SELECT nation, seg, CAST(n AS BIGINT) AS n,
       |  CAST((emd_num * 1000000)
       |    // (CAST(n AS HUGEINT) * big_n * greatest(m - 1, 1)) AS BIGINT)
       |    AS emd_micro,
       |  CAST(CASE WHEN emd_num * $TCloseDen
       |      <= CAST(n AS HUGEINT) * big_n * greatest(m - 1, 1)
       |    THEN 1 ELSE 0 END AS BIGINT) AS t_pass
       |FROM agg ORDER BY nation, seg""".stripMargin

  private val kAnonymitySql =
    s"""WITH c AS (SELECT CAST(c_nationkey AS BIGINT) AS nation,
       |    c_mktsegment AS seg FROM customer),
       |l0 AS (SELECT nation, seg, COUNT(*) AS n FROM c GROUP BY nation, seg),
       |l1 AS (SELECT nation, 'ANY' AS seg, CAST(SUM(n) AS BIGINT) AS n
       |  FROM l0 WHERE n < $AnonK GROUP BY nation)
       |SELECT nation, seg, n, 0 AS level FROM l0 WHERE n >= $AnonK
       |UNION ALL
       |SELECT nation, seg, n, 1 FROM l1 WHERE n >= $AnonK
       |UNION ALL
       |SELECT CAST(-1 AS BIGINT), 'SUPPRESSED',
       |  CAST(COALESCE(SUM(n), 0) AS BIGINT), 2
       |FROM l1 WHERE n < $AnonK
       |ORDER BY level, nation, seg""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_k_anonymity", kAnonymity, Some(kAnonymitySql)),
    QueryDef("q_l_diversity", lDiversity, Some(lDiversitySql)),
    QueryDef("q_t_closeness", tCloseness, Some(tClosenessSql)),
    QueryDef("q_drift_psi", driftPsi, Some(driftPsiSql)),
    QueryDef("q_json_extract", jsonExtract, Some(jsonExtractSql)),
    QueryDef("q_collate_group", collateGroup, Some(collateGroupSql)),
    QueryDef("q_profile_stats", profile, Some(profileSql)),
    QueryDef("q_histogram", histogram, Some(histogramSql)),
    QueryDef("q_equidepth_histogram", equidepthHistogram, Some(equidepthHistogramSql)),
    QueryDef("q_ks_test", ksTest, Some(ksTestSql)),
    QueryDef("q_cusum", cusum, Some(cusumSql)),
    QueryDef("q_benford", benford, Some(benfordSql)),
    QueryDef("q_mode", qMode, Some(qModeSql)),
    QueryDef("q_gini", gini, Some(giniSql)),
    QueryDef("q_cms_freq", cmsFreq, Some(cmsFreqSql)),
    QueryDef("q_selfjoin_size", selfJoinSize, Some(selfJoinSizeSql)),
    QueryDef("q_joinsize_cms", joinSizeCms, Some(joinSizeCmsSql)),
    QueryDef("q_fd_check", fdCheck, Some(fdCheckSql)),
    QueryDef("q_key_skew", keySkew, Some(keySkewSql)),
    QueryDef("q_heavy_hitters", heavyHitters, Some(heavyHittersSql)),
    QueryDef("q_validate_rows", validateRows, Some(validateRowsSql)),
    QueryDef("q_variant_extract", variantExtract, Some(variantExtractSql)),
    QueryDef("q_recursive_cte", recursiveCte, Some(recursiveCteSql)),
  )
}
