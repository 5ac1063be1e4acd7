package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-sequence analytics and training-mix planning (round 5):
  * ordered funnels, cohort retention, token-budget sequence packing,
  * and source-mixture rebalancing. All DuckDB-oracled.
  *
  * Scale shapes:
  *  - `q_funnel`: each stage is a per-user min-aggregate; stages chain
  *    through equi-joins ON user_id, so every shuffle in the chain
  *    reuses the same hash partitioning — AQE coalesces them into one
  *    exchange lineage, and no stage ever materializes more than one
  *    row per user. Timestamps stay integer microseconds end-to-end:
  *    the stage predicate (strictly-after) is exact, never a float
  *    comparison.
  *  - `q_retention`: cohort assignment is a per-user min; the activity
  *    matrix is a (cohort, offset) countDistinct over (user, week)
  *    pairs that were already deduplicated map-side. Weeks are integer
  *    epoch-week numbers (epoch_ns div ns-per-week) — calendar-free,
  *    so both engines bucket identically.
  *  - `q_pack_sequences`: GPT-style concat-and-split packing. The
  *    running token offset is a windowed sum PARTITIONED BY source —
  *    one shuffle, bounded window state — never a global single-
  *    partition cumsum (the classic packing scale trap; global packing
  *    at 100 TB is per-partition pack + partial-sum offset merge, which
  *    is exactly what the per-source form models). A document spanning
  *    a sequence boundary contributes to BOTH sequences (split, not
  *    padded), so every sequence except a source's last is exactly
  *    full: the explode emits ≤ 1 + n_tokens/budget rows per doc.
  *  - `q_mixture_weights`: DoReMi-style source re-weighting toward a
  *    uniform target with an upsampling cap. All shares are computed in
  *    EXACT integer arithmetic over a common denominator (cap test
  *    `total < capS·tokens`, effective mass `min(total, cap·S·tokens)`)
  *    and only the final presentation ratios divide as doubles — one
  *    division per output cell, so engine partial-agg order can never
  *    drift the result. The per-source aggregate is the only shuffle;
  *    the S-row summary then broadcasts.
  */
object Behavioral {

  // -- q_funnel: ordered conversion funnel ---------------------------------
  private def funnel(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type", expr("ts_ns div 1000").as("ts_us"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts_us").as("v_ts"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts_us" > $"v_ts")
      .groupBy($"user_id").agg(min($"ts_us").as("c_ts"), min($"v_ts").as("v_ts"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts_us" > $"c_ts")
      .groupBy($"user_id").agg(min($"ts_us").as("p_ts"), min($"v_ts").as("v_ts"))
    val s1 = v.agg(lit("1_view").as("stage"), count(lit(1)).as("n_users"),
      lit(0L).as("total_latency_us"))
    val s2 = c.agg(lit("2_click").as("stage"), count(lit(1)).as("n_users"),
      sum($"c_ts" - $"v_ts").as("total_latency_us"))
    val s3 = p.agg(lit("3_purchase").as("stage"), count(lit(1)).as("n_users"),
      sum($"p_ts" - $"v_ts").as("total_latency_us"))
    s1.unionAll(s2).unionAll(s3).orderBy($"stage")
  }
  private val funnelSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |v AS (SELECT user_id, MIN(ts_us) AS v_ts FROM ev
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT ev.user_id, MIN(ts_us) AS c_ts, MIN(v_ts) AS v_ts
      |      FROM ev JOIN v ON ev.user_id = v.user_id
      |      WHERE event_type = 'click' AND ts_us > v_ts GROUP BY ev.user_id),
      |p AS (SELECT ev.user_id, MIN(ts_us) AS p_ts, MIN(v_ts) AS v_ts
      |      FROM ev JOIN c ON ev.user_id = c.user_id
      |      WHERE event_type = 'purchase' AND ts_us > c_ts GROUP BY ev.user_id)
      |SELECT '1_view' AS stage, COUNT(*) AS n_users,
      |       CAST(0 AS BIGINT) AS total_latency_us FROM v
      |UNION ALL
      |SELECT '2_click', COUNT(*), CAST(SUM(c_ts - v_ts) AS BIGINT) FROM c
      |UNION ALL
      |SELECT '3_purchase', COUNT(*), CAST(SUM(p_ts - v_ts) AS BIGINT) FROM p
      |ORDER BY stage""".stripMargin

  // -- q_retention: weekly cohort retention matrix -------------------------
  private val NsPerWeek = 7L * 86400L * 1000L * 1000L * 1000L

  private def retention(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // cohort = window-min over the distinct (user, week) pairs (no
    // groupBy + join back); after the distinct, each user contributes
    // at most ONE row per offset, so the final count is a plain
    // count(*) — no countDistinct, no multi-distinct Expand rewrite.
    // Three shuffles total: the pair distinct, the user window, the
    // (cohort, offset) count.
    val w = org.apache.spark.sql.expressions.Window.partitionBy($"user_id")
    Tables.events(s, d)
      .select($"user_id", expr(s"ts_ns div ${NsPerWeek}L").as("week"))
      .distinct()
      .withColumn("cohort_week", min($"week").over(w))
      .groupBy($"cohort_week", ($"week" - $"cohort_week").as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy($"cohort_week", $"week_offset")
  }
  private val retentionSql =
    s"""WITH wk AS (SELECT DISTINCT user_id, epoch_ns(ts) // ${NsPerWeek} AS week
       |            FROM events),
       |co AS (SELECT user_id, week,
       |         MIN(week) OVER (PARTITION BY user_id) AS cohort_week FROM wk)
       |SELECT cohort_week, week - cohort_week AS week_offset,
       |       COUNT(*) AS n_users
       |FROM co GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -- q_pack_sequences: token-budget concat-and-split packing -------------
  private[graft] val PackBudget = 256L

  private def packSequences(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val B = PackBudget
    val w = Window.partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select($"source", $"doc_id", size(TextPrep.words($"text")).cast("long").as("n"))
      .filter($"n" > 0) // Spark's sequence() would step BACKWARD on n=0
      .withColumn("cum", coalesce(sum($"n").over(w), lit(0L)))
      .withColumn("seq_id", explode(expr(s"sequence(cum div $B, (cum + n - 1) div $B)")))
      .withColumn("tok", least(($"seq_id" + 1) * B, $"cum" + $"n")
        - greatest($"seq_id" * B, $"cum"))
      .groupBy($"source", $"seq_id")
      .agg(count(lit(1)).as("n_docs"), sum($"tok").as("n_tokens"))
      .orderBy($"source", $"seq_id")
  }
  private val packSequencesSql = {
    val B = PackBudget
    s"""WITH docs AS (SELECT source, doc_id, len(${TextPrep.wordsSql}) AS n
       |              FROM documents),
       |cum AS (SELECT source, doc_id, n,
       |  CAST(COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum
       |  FROM docs WHERE n > 0),
       |pieces AS (SELECT source, doc_id, n, cum, seq_id,
       |    least((seq_id + 1) * $B, cum + n) - greatest(seq_id * $B, cum) AS tok
       |  FROM cum, unnest(range(cum // $B, (cum + n - 1) // $B + 1)) t(seq_id))
       |SELECT source, seq_id, COUNT(*) AS n_docs,
       |  CAST(SUM(tok) AS BIGINT) AS n_tokens
       |FROM pieces GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // -- q_mixture_weights: capped uniform-target source re-weighting --------
  /** Max upsampling factor: a rare source is repeated at most this many
    * times toward the uniform target (epoch-cap in LLM data mixing). */
  private[graft] val MixtureCap = 2L

  private def mixtureWeights(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cap = MixtureCap
    val perSrc = Tables.documents(s, d)
      .select($"source", size(TextPrep.words($"text")).cast("long").as("n"))
      .groupBy($"source").agg(count(lit(1)).as("n_docs"), sum($"n").as("n_tokens"))
    val tot = perSrc.agg(sum($"n_tokens").as("total"),
      count(lit(1)).as("n_sources"))
    // exact integer mass over common denominator S: uncapped mass of a
    // source toward uniform is total/S tokens; capping upsampling at
    // `cap` bounds it by cap·tokens — min(total, cap·S·tokens) in S-ths
    val massed = perSrc.crossJoin(broadcast(tot))
      .withColumn("eff_num", least($"total", lit(cap) * $"n_sources" * $"n_tokens"))
    val wsum = Window.partitionBy(lit(1))
    massed
      .withColumn("share", $"n_tokens".cast("double") / $"total")
      .withColumn("weight",
        least($"total".cast("double") / ($"n_sources" * $"n_tokens"), lit(cap.toDouble)))
      .withColumn("resampled_share",
        $"eff_num".cast("double") / sum($"eff_num").over(wsum))
      .select($"source", $"n_docs", $"n_tokens", $"share", $"weight",
        $"resampled_share")
      .orderBy($"source")
  }
  private val mixtureWeightsSql = {
    val cap = MixtureCap
    s"""WITH per AS (SELECT source, COUNT(*) AS n_docs,
       |    CAST(SUM(len(${TextPrep.wordsSql})) AS BIGINT) AS n_tokens
       |  FROM documents GROUP BY source),
       |  -- SUM→HUGEINT recast: the driver schema-compares vs Spark's BIGINT
       |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total,
       |               COUNT(*) AS n_sources FROM per),
       |m AS (SELECT per.*, total, n_sources,
       |    least(total, $cap * n_sources * n_tokens) AS eff_num
       |  FROM per CROSS JOIN tot)
       |SELECT source, n_docs, n_tokens,
       |  CAST(n_tokens AS DOUBLE) / total AS share,
       |  least(CAST(total AS DOUBLE) / (n_sources * n_tokens),
       |        CAST($cap AS DOUBLE)) AS weight,
       |  CAST(eff_num AS DOUBLE) / SUM(eff_num) OVER () AS resampled_share
       |FROM m ORDER BY source""".stripMargin
  }

  // -- q_length_batching: padding-minimal inference batching ---------------
  // The serving/eval-prep step after packing's training story: group
  // documents into fixed-size batches of B so that padding-to-batch-max
  // waste is BOUNDED — docs first land in length buckets of width W
  // (bucket = len div W), batches form within a bucket in doc_id
  // order, so no batch mixes lengths more than W−1 apart and
  // per-doc padding is < W tokens regardless of corpus shape (the
  // spec pins the bound). One window per bucket (row_number → batch
  // slot) and one (bucket, batch) aggregate share the bucket
  // partitioning: a single narrow shuffle of (doc_id, len) pairs.
  private val BatchSize = 8
  private val BucketWidth = 16

  private def lengthBatching(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, d)
      .select($"doc_id", size(TextPrep.words($"text")).cast("long").as("n_tok"))
      .withColumn("bucket", expr(s"n_tok div $BucketWidth"))
    val w = Window.partitionBy($"bucket").orderBy($"doc_id")
    docs
      .withColumn("batch_no", ((row_number().over(w) - 1) / BatchSize).cast("long"))
      .groupBy($"bucket", $"batch_no")
      .agg(count(lit(1)).as("n_docs"), max($"n_tok").as("batch_max"),
        sum($"n_tok").as("sum_tok"))
      .withColumn("padding_waste", $"n_docs" * $"batch_max" - $"sum_tok")
      .select($"bucket", $"batch_no", $"n_docs", $"batch_max", $"padding_waste")
      .orderBy($"bucket", $"batch_no")
  }
  private val lengthBatchingSql =
    s"""WITH docs AS (SELECT doc_id,
       |    CAST(len(${TextPrep.wordsSql}) AS BIGINT) AS n_tok
       |  FROM documents),
       |b AS (SELECT doc_id, n_tok, n_tok // $BucketWidth AS bucket FROM docs),
       |slots AS (SELECT bucket, n_tok,
       |    (row_number() OVER (PARTITION BY bucket ORDER BY doc_id) - 1)
       |      // $BatchSize AS batch_no
       |  FROM b)
       |SELECT bucket, batch_no, COUNT(*) AS n_docs,
       |  MAX(n_tok) AS batch_max,
       |  CAST(COUNT(*) * MAX(n_tok) - SUM(n_tok) AS BIGINT) AS padding_waste
       |FROM slots GROUP BY bucket, batch_no
       |ORDER BY bucket, batch_no""".stripMargin

  // -- q_kfold_split: stratified deterministic k-fold assignment -----------
  // Train/validation splitting done the way an eval harness needs it
  // REPRODUCIBLE: fold = (rank within source) mod K, so (a) the split
  // is a pure function of the data (no RNG state to version), (b)
  // every source is represented in every fold with counts differing by
  // at most 1 (exact stratification — a global hash split only
  // approximates this), and (c) adding a NEW source never perturbs
  // existing sources' folds (the window is per-source). One narrow
  // (doc_id, source) shuffle; the per-(source, fold) aggregate shares
  // the window's partitioning.
  private val KFolds = 5

  private def kfoldSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"source").orderBy($"doc_id")
    Tables.documents(s, d)
      .select($"doc_id", $"source",
        size(TextPrep.words($"text")).cast("long").as("n_tok"))
      .withColumn("fold", ((row_number().over(w) - 1) % KFolds).cast("long"))
      .groupBy($"source", $"fold")
      .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      .orderBy($"source", $"fold")
  }
  private val kfoldSplitSql =
    s"""WITH docs AS (SELECT doc_id, source,
       |    CAST(len(${TextPrep.wordsSql}) AS BIGINT) AS n_tok
       |  FROM documents),
       |f AS (SELECT source, n_tok,
       |    (row_number() OVER (PARTITION BY source ORDER BY doc_id) - 1)
       |      % $KFolds AS fold
       |  FROM docs)
       |SELECT source, fold, COUNT(*) AS n_docs,
       |  CAST(SUM(n_tok) AS BIGINT) AS n_tokens
       |FROM f GROUP BY source, fold
       |ORDER BY source, fold""".stripMargin

  // -- q_mixture_apply: execute the mixture as a deterministic filter ------
  // q_mixture_weights computes target shares; this op EXECUTES the
  // downsample: source s keeps each doc with probability
  // min(1, N/(S·n_s)) — uniform-target share without upsampling — via
  // a pure-integer rational test: keep iff (H(doc_id) mod D)·S·n_s <
  // N·D, D = 997. H is the first 32 bits of md5(doc_id) — hashing
  // first decorrelates the residue from ANY id pattern (raw doc_id
  // mod D assumes dense ids: a corpus whose ids are all multiples of
  // D would keep everything), and md5 is the one 64-bit-quality hash
  // both engines compute byte-identically, so the oracle replays it.
  // No RNG state to version, no float rate to drift between engines,
  // and re-running the pipeline reproduces the byte-identical sample —
  // the property a training-data freeze actually needs. Per-source
  // counts ride one broadcast; the filter is row-local; the only
  // shuffle is the final per-source accounting.
  private val MixD = 997L

  /** First 32 bits of md5 of the stringified key, as a long in
    * [0, 2^32) — identical in Spark and DuckDB (see [[mixKeySql]]).
    * Shared with the leakage-safe split (Dedup.scala), which hashes
    * component labels through the same idiom. */
  private[graft] def mixKey(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** The DuckDB spelling of [[mixKey]]: DuckDB has no conv(), so the 8
    * hex nibbles are parsed positionally (each term cast to BIGINT —
    * DuckDB errors on INT32 overflow rather than wrapping). */
  private[graft] def mixKeySql(e: String): String = {
    val h = s"md5(CAST($e AS VARCHAR))"
    (1 to 8).map(i =>
      s"CAST(strpos('0123456789abcdef', substr($h, $i, 1)) - 1 AS BIGINT) * ${1L << (4 * (8 - i))}")
      .mkString("(", " + ", ")")
  }

  /** The downsample core over any (doc_id, source) frame — public so
    * the spec can drive it with sparse/clustered id spaces. */
  private[graft] def mixtureApplyOn(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val counts = docs.groupBy($"source").agg(count(lit(1)).as("n_s"))
    val totals = counts.agg(sum($"n_s").as("n"), count(lit(1)).as("s_cnt"))
    docs.join(broadcast(counts), "source")
      .crossJoin(broadcast(totals))
      .withColumn("kept",
        when((mixKey($"doc_id") % MixD) * $"s_cnt" * $"n_s" < $"n" * MixD, 1L)
          .otherwise(0L))
      .groupBy($"source")
      .agg(first($"n_s").as("n_in"), sum($"kept").as("n_kept"))
      .orderBy($"source")
  }

  private def mixtureApply(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    mixtureApplyOn(Tables.documents(s, d).select($"doc_id", $"source"))
  }
  private val mixtureApplySql =
    s"""WITH counts AS (SELECT source, COUNT(*) AS n_s FROM documents GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS n, COUNT(*) AS s_cnt FROM counts)
       |SELECT d.source, any_value(c.n_s) AS n_in,
       |  CAST(SUM(CASE WHEN (${mixKeySql("d.doc_id")} % $MixD) * t.s_cnt * c.n_s < t.n * $MixD
       |       THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM documents d JOIN counts c ON d.source = c.source CROSS JOIN tot t
       |GROUP BY d.source ORDER BY d.source""".stripMargin

  // -- q_transition_matrix: first-order Markov transitions ------------------
  // The event-sequence summary behavioral pipelines feed into session
  // models and anomaly scoring: P(next event type | current type),
  // estimated from every consecutive pair in each user's timeline.
  // Shapes: ONE window (lag over the user's total-ordered events —
  // ts_ns then event_id breaks timestamp ties, so the pair set is
  // deterministic) and one groupBy; state per user is a single row of
  // look-behind, so the window never buffers a timeline. Parity: counts
  // are exact integers; the probability is one IEEE division of two
  // exact integers per output row — no aggregation-order exposure.
  private def transitionMatrix(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"event_type", $"ts_ns", $"event_id")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("n"))
      .withColumn("p",
        $"n".cast("double") / sum($"n").over(Window.partitionBy($"prev_type")))
      .orderBy($"prev_type", $"event_type")
  }
  private[graft] val transitionMatrixSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id
      |            FROM events),
      |st AS (SELECT event_type,
      |         LAG(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts_ns, event_id) AS prev_type
      |       FROM ev)
      |SELECT prev_type, event_type, COUNT(*) AS n,
      |  CAST(COUNT(*) AS DOUBLE)
      |    / (SUM(COUNT(*)) OVER (PARTITION BY prev_type)) AS p
      |FROM st WHERE prev_type IS NOT NULL
      |GROUP BY prev_type, event_type
      |ORDER BY prev_type, event_type""".stripMargin

  // -- q_attribution: last-touch channel attribution ------------------------
  // The marketing-analytics standard beside funnel and retention: each
  // purchase is credited to the user's most recent PRECEDING
  // non-purchase event type (its "channel"); a purchase with no prior
  // touch is 'direct'. One window per user — last(... ignoreNulls) over
  // ROWS UNBOUNDED PRECEDING..1 PRECEDING, the frame Spark and DuckDB
  // define identically — with the (ts_ns, event_id) total order making
  // the credited touch deterministic under timestamp ties. Revenue
  // sums ride the decimal pre-cast (dsum), so partial-agg order can't
  // drift bits.
  private def attribution(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    import graft.OracleMath.dsum
    val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, d)
      .withColumn("att",
        last(when($"event_type" =!= "purchase", $"event_type"),
          ignoreNulls = true).over(w))
      .filter($"event_type" === "purchase")
      .groupBy(coalesce($"att", lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"), dsum($"value").as("revenue"))
      .orderBy($"channel")
  }
  private val attributionSql =
    s"""WITH ev AS (SELECT user_id, event_type, value, epoch_ns(ts) AS ts_ns,
       |             event_id FROM events),
       |att AS (SELECT event_type, value,
       |  LAST_VALUE(CASE WHEN event_type <> 'purchase' THEN event_type END
       |             IGNORE NULLS)
       |    OVER (PARTITION BY user_id ORDER BY ts_ns, event_id
       |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS att
       |  FROM ev)
       |SELECT COALESCE(att, 'direct') AS channel, COUNT(*) AS n_purchases,
       |  ${graft.OracleMath.sqlSum("value")} AS revenue
       |FROM att WHERE event_type = 'purchase'
       |GROUP BY 1 ORDER BY channel""".stripMargin

  // -- q_event_paths: dominant 3-step journeys ------------------------------
  // Path analysis, the discovery complement of q_funnel: the funnel
  // checks ONE hypothesized stage sequence, this surfaces which
  // 3-step journeys actually dominate (and q_transition_matrix's
  // first-order probabilities can't see order-3 structure — a→b→a
  // loops vs a→b→c progressions look identical pairwise). Two lead()
  // columns on the same user-timeline window (one sort serves both),
  // then a count groupBy; top-20 by (count, path) is TakeOrdered.
  // The (ts_ns, event_id) total order makes the path multiset exact.
  private def eventPaths(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"event_type", $"ts_ns", $"event_id")
      .withColumn("s2", lead($"event_type", 1).over(w))
      .withColumn("s3", lead($"event_type", 2).over(w))
      .filter($"s3".isNotNull)
      .groupBy($"event_type".as("s1"), $"s2", $"s3")
      .agg(count(lit(1)).as("n"))
      .orderBy($"n".desc, $"s1", $"s2", $"s3")
      .limit(20)
  }
  private val eventPathsSql =
    """WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns, event_id
      |            FROM events),
      |paths AS (SELECT event_type AS s1,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id
      |                              ORDER BY ts_ns, event_id) AS s2,
      |    LEAD(event_type, 2) OVER (PARTITION BY user_id
      |                              ORDER BY ts_ns, event_id) AS s3
      |  FROM ev)
      |SELECT s1, s2, s3, COUNT(*) AS n
      |FROM paths WHERE s3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY n DESC, s1, s2, s3 LIMIT 20""".stripMargin

  // -- q_ab_test: two-proportion experiment readout ---------------------------
  // The experiment-analysis primitive over the event log: users are
  // assigned to variants by the replayable md5 hash (the deterministic
  // randomization a real platform persists), conversion = the user ever
  // purchased, and the readout is the pooled two-proportion z statistic
  // z = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b)). All inputs are
  // exact integer counts from two narrow aggregates (per-user collapse,
  // then per-variant); the statistic is ONE IEEE expression over those
  // integers — identical parenthesization on both engines, no float
  // accumulation anywhere. 100 TB shape: the only data-sized shuffle is
  // the per-user groupBy; variants are a 2-row frame.
  private def abTest(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    // conversion must be a SELECTIVE predicate (every user in this log
    // purchases eventually, so plain "ever purchased" makes pooled = 1,
    // the z denominator 0, and ANSI Spark throws on double/0 where
    // IEEE would say NaN): a high-value purchase splits users ~45/55
    val users = Tables.events(s, d)
      .groupBy($"user_id")
      .agg(max(when($"event_type" === "purchase" && $"value" > 150.0, 1L)
        .otherwise(0L)).as("converted"))
      .withColumn("variant",
        when(mixKey($"user_id") % 2 === 0, "A").otherwise("B"))
    val v = users.groupBy($"variant")
      .agg(count(lit(1)).as("n"), sum($"converted").as("x"))
    val a = v.filter($"variant" === "A")
      .select($"n".as("n_a"), $"x".as("x_a"))
    val b = v.filter($"variant" === "B")
      .select($"n".as("n_b"), $"x".as("x_b"))
    a.crossJoin(broadcast(b))
      .withColumn("rate_a", $"x_a".cast("double") / $"n_a")
      .withColumn("rate_b", $"x_b".cast("double") / $"n_b")
      .withColumn("pooled", ($"x_a" + $"x_b").cast("double") / ($"n_a" + $"n_b"))
      .select($"n_a", $"x_a", $"n_b", $"x_b", $"rate_a", $"rate_b",
        // degenerate experiment (pooled 0 or 1) reads z = 0, not a crash
        when($"pooled" > 0 && $"pooled" < 1,
          ($"rate_a" - $"rate_b") /
            sqrt($"pooled" * (lit(1.0) - $"pooled") *
              (lit(1.0) / $"n_a" + lit(1.0) / $"n_b")))
          .otherwise(lit(0.0)).as("z"))
  }
  private val abTestSql = {
    val h = mixKeySql("user_id")
    s"""WITH users AS (SELECT user_id,
       |    MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
       |             THEN 1 ELSE 0 END) AS converted,
       |    CASE WHEN $h % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |  FROM events GROUP BY user_id),
       |v AS (SELECT variant, COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS x
       |      FROM users GROUP BY variant),
       |j AS (SELECT a.n AS n_a, a.x AS x_a, b.n AS n_b, b.x AS x_b,
       |    CAST(a.x AS DOUBLE) / a.n AS rate_a,
       |    CAST(b.x AS DOUBLE) / b.n AS rate_b,
       |    CAST(a.x + b.x AS DOUBLE) / (a.n + b.n) AS pooled
       |  FROM (SELECT * FROM v WHERE variant = 'A') a,
       |       (SELECT * FROM v WHERE variant = 'B') b)
       |SELECT n_a, x_a, n_b, x_b, rate_a, rate_b,
       |  CASE WHEN pooled > 0 AND pooled < 1
       |       THEN (rate_a - rate_b) / sqrt(pooled * (1.0 - pooled)
       |         * (1.0 / n_a + 1.0 / n_b))
       |       ELSE 0.0 END AS z
       |FROM j""".stripMargin
  }

  // -- q_survival: Kaplan-Meier-style churn life table ----------------------
  // The survival-analysis primitive behind retention curves done right:
  // per-user activity span in whole hours, a user counts as CHURNED if
  // their last event is ≥ 24 hours before the corpus frontier and as
  // CENSORED otherwise (still active at observation end — dropping them
  // is the classic retention-curve bias; Kaplan & Meier 1958). The life
  // table per duration t: n_risk = users whose span reached t (a SUFFIX
  // sum over the duration table), exits split into churned/censored,
  // and the discrete hazard d/n as a floored integer micro-quotient.
  // Exactness: spans are integer nanoseconds, durations integer `div`
  // hours, every count exact, hazard an integer quotient of integers —
  // the survival product Π(1−hazard) is spec-pinned (floats) rather
  // than oracled. Scale shape: one narrow user groupBy; the frontier
  // rides a one-row broadcast; the only ordered windows run over the
  // DISTINCT-DURATION table, bounded by the calendar span in hours.
  private[graft] val ChurnHorizonHours = 24L
  private def qSurvival(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val hourNs = 3600L * 1000000000L
    val spans = Tables.events(s, d).groupBy($"user_id")
      .agg(min($"ts_ns").as("first_ns"), max($"ts_ns").as("last_ns"))
    val frontier = spans.agg(max($"last_ns").as("corpus_max_ns"))
    val users = spans.crossJoin(broadcast(frontier))
      .select(expr(s"(last_ns - first_ns) div $hourNs").as("t_hours"),
        ($"corpus_max_ns" - $"last_ns" >= ChurnHorizonHours * hourNs).as("churned"))
    val byT = users.groupBy($"t_hours")
      .agg(sum(when($"churned", 1L).otherwise(0L)).as("n_churn"),
        sum(when(!$"churned", 1L).otherwise(0L)).as("n_censored"))
    val wRisk = Window.orderBy($"t_hours")
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    byT
      .withColumn("n_risk", sum($"n_churn" + $"n_censored").over(wRisk))
      .select($"t_hours", $"n_risk", $"n_churn", $"n_censored",
        expr("(n_churn * 1000000) div n_risk").as("hazard_micro"))
      .orderBy($"t_hours")
  }
  private val qSurvivalSql = {
    val hourNs = 3600L * 1000000000L
    s"""WITH sp AS (SELECT user_id, MIN(epoch_ns(ts)) AS first_ns,
       |    MAX(epoch_ns(ts)) AS last_ns FROM events GROUP BY 1),
       |h AS (SELECT MAX(last_ns) AS cm FROM sp),
       |u AS (SELECT (last_ns - first_ns) // $hourNs AS t_hours,
       |    cm - last_ns >= ${ChurnHorizonHours * hourNs} AS churned
       |  FROM sp CROSS JOIN h),
       |byt AS (SELECT t_hours,
       |    SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS n_churn,
       |    SUM(CASE WHEN churned THEN 0 ELSE 1 END) AS n_censored
       |  FROM u GROUP BY 1),
       |r AS (SELECT t_hours, n_churn, n_censored,
       |    SUM(n_churn + n_censored) OVER (ORDER BY t_hours
       |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk
       |  FROM byt)
       |SELECT t_hours, CAST(n_risk AS BIGINT) AS n_risk,
       |  CAST(n_churn AS BIGINT) AS n_churn,
       |  CAST(n_censored AS BIGINT) AS n_censored,
       |  (CAST(n_churn AS BIGINT) * 1000000) // CAST(n_risk AS BIGINT)
       |    AS hazard_micro
       |FROM r ORDER BY t_hours""".stripMargin
  }

  // -- q_seasonality: hour-of-week activity profile --------------------------
  // The load/engagement seasonality matrix (dow × hour of day) every
  // capacity plan and anomaly baseline starts from, bucketed with
  // CALENDAR-FREE integer arithmetic (the q_retention discipline):
  // hour = (ts_ns div 3600·10⁹) mod 24, dow = (epoch_days + 4) mod 7
  // (epoch day 0 was a Thursday, so +4 makes Sunday 0) — no engine
  // dayofweek()/timezone semantics to disagree on. The deviation from
  // uniform is exact: share·168 in ppm (uniform ≡ 10⁶) via a floored
  // 128-bit quotient, excess as a subtraction. One (dow, hour) groupBy
  // is the only shuffle; the total rides a one-row broadcast.
  private def seasonality(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cells = Tables.events(s, d)
      .select(expr("((ts_ns div 86400000000000) + 4) % 7").as("dow"),
        expr("(ts_ns div 3600000000000) % 24").as("hour"))
      .groupBy($"dow", $"hour").agg(count(lit(1)).as("n"))
    val tot = cells.agg(sum($"n").as("total"))
    cells.crossJoin(broadcast(tot))
      .withColumn("share168_ppm",
        expr("(cast(n as decimal(38,0)) * 168000000) div total"))
      .select($"dow", $"hour", $"n", $"share168_ppm",
        ($"share168_ppm" - 1000000L).as("excess_ppm"))
      .orderBy($"dow", $"hour")
  }
  private val seasonalitySql =
    """WITH e AS (SELECT ((epoch_ns(ts) // 86400000000000) + 4) % 7 AS dow,
      |    (epoch_ns(ts) // 3600000000000) % 24 AS hour FROM events),
      |c AS (SELECT dow, hour, COUNT(*) AS n FROM e GROUP BY 1, 2),
      |t AS (SELECT SUM(n) AS total FROM c)
      |SELECT dow, hour, n,
      |  CAST((CAST(n AS HUGEINT) * 168000000) // total AS BIGINT)
      |    AS share168_ppm,
      |  CAST((CAST(n AS HUGEINT) * 168000000) // total - 1000000 AS BIGINT)
      |    AS excess_ppm
      |FROM c CROSS JOIN t ORDER BY dow, hour""".stripMargin

  // -- q_user_growth: DAU / new users / cumulative audience -----------------
  // The growth dashboard's first page: per day, events, distinct active
  // users, NEW users (first-ever-seen that day — a per-user min, no
  // "seen before" scan), and the cumulative audience — which needs no
  // running distinct at all: cumulative distinct users ≡ the prefix sum
  // of first-day counts, an identity that turns the classic
  // hard-to-distribute running-COUNT-DISTINCT into one bounded window.
  // Integer epoch-day bucketing (calendar-free); the (day, user)
  // distinct is the only corpus shuffle; the cumulative window runs
  // over the calendar-bounded day table.
  private def userGrowth(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select(expr("ts_ns div 86400000000000").as("day_idx"), $"user_id")
    val daily = ev.groupBy($"day_idx").agg(count(lit(1)).as("n_events"))
    val dau = ev.distinct().groupBy($"day_idx").agg(count(lit(1)).as("dau"))
    val newu = ev.groupBy($"user_id").agg(min($"day_idx").as("day_idx"))
      .groupBy($"day_idx").agg(count(lit(1)).as("new_users"))
    daily.join(dau, "day_idx")
      .join(newu, Seq("day_idx"), "left").na.fill(0L, Seq("new_users"))
      .withColumn("cum_users",
        sum($"new_users").over(Window.orderBy($"day_idx")))
      .select($"day_idx", $"n_events", $"dau", $"new_users", $"cum_users")
      .orderBy($"day_idx")
  }
  private[graft] val userGrowthSql =
    """WITH ev AS (SELECT epoch_ns(ts) // 86400000000000 AS day_idx, user_id
      |            FROM events),
      |daily AS (SELECT day_idx, COUNT(*) AS n_events FROM ev GROUP BY 1),
      |dau AS (SELECT day_idx, COUNT(*) AS dau
      |        FROM (SELECT DISTINCT day_idx, user_id FROM ev) GROUP BY 1),
      |nu AS (SELECT day_idx, COUNT(*) AS new_users
      |       FROM (SELECT user_id, MIN(day_idx) AS day_idx FROM ev GROUP BY 1)
      |       GROUP BY 1)
      |SELECT d.day_idx, d.n_events, dau.dau,
      |  CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
      |  CAST(SUM(COALESCE(nu.new_users, 0)) OVER (ORDER BY d.day_idx)
      |    AS BIGINT) AS cum_users
      |FROM daily d
      |JOIN dau ON dau.day_idx = d.day_idx
      |LEFT JOIN nu ON nu.day_idx = d.day_idx
      |ORDER BY d.day_idx""".stripMargin

  // -- q_user_overlap: exact audience overlap between event types -----------
  // The exact counterpart of q_hll_intersect's estimates, affordable
  // because the pair space is TYPE × TYPE (tiny) even though the sets
  // are user-sized: one (type, user) distinct, then a self-equi-join on
  // user_id — each user contributes at most types²/2 pairs, never a
  // cross join — and exact Jaccard as a floored integer micro-quotient.
  // The per-type set sizes join back as a types-row broadcast.
  private def userOverlap(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val tu = Tables.events(s, d)
      .select($"event_type", $"user_id").distinct()
    val sizes = tu.groupBy($"event_type").agg(count(lit(1)).as("sz"))
    tu.as("a").join(tu.as("b"),
        $"a.user_id" === $"b.user_id" && $"a.event_type" < $"b.event_type")
      .groupBy($"a.event_type".as("type_a"), $"b.event_type".as("type_b"))
      .agg(count(lit(1)).as("inter"))
      .join(broadcast(sizes.as("sa")), $"type_a" === $"sa.event_type")
      .join(broadcast(sizes.as("sb")), $"type_b" === $"sb.event_type")
      .select($"type_a", $"type_b", $"inter",
        $"sa.sz".as("sz_a"), $"sb.sz".as("sz_b"),
        expr("(inter * 1000000) div (sz_a + sz_b - inter)").as("jacc_micro"))
      .orderBy($"type_a", $"type_b")
  }
  private val userOverlapSql =
    """WITH tu AS (SELECT DISTINCT event_type, user_id FROM events),
      |sz AS (SELECT event_type, COUNT(*) AS sz FROM tu GROUP BY 1),
      |iv AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
      |    COUNT(*) AS inter
      |  FROM tu a JOIN tu b
      |    ON a.user_id = b.user_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
      |  (inter * 1000000) // (sa.sz + sb.sz - inter) AS jacc_micro
      |FROM iv
      |JOIN sz sa ON sa.event_type = type_a
      |JOIN sz sb ON sb.event_type = type_b
      |ORDER BY type_a, type_b""".stripMargin

  // -- q_rfm: recency / frequency / monetary segmentation -------------------
  // The classic customer-value grid (direct-marketing RFM): per
  // customer, days since last order, order count, and lifetime cents;
  // each dimension scored into quintiles and customers counted per
  // (R, F, M) cell. Quintiles are VALUE-BASED, not ntile: equal values
  // always share a score (ntile splits ties by arbitrary row order —
  // nondeterministic across engines), via the inclusive cumulative
  // customer count over each dimension's DISTINCT-value table:
  // score = ((cum − 1)·5) div n + 1, recency reversed (most recent =
  // 5). The cumulative counts come from the value-keyed two-pass
  // prefix-sum helper — no global windows, layout-free. Scale shape:
  // one per-customer groupBy, three distinct-value cum passes, three
  // equi-joins back on the dimension value.
  private def rfm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val perCust = Tables.orders(s, d)
      .groupBy($"o_custkey")
      .agg(max(to_date($"o_orderdate")).as("last_day"),
        count(lit(1)).as("freq"),
        sum(($"o_totalprice".cast("decimal(18,2)") * 100).cast("long"))
          .as("cents"))
    val frontier = perCust.agg(max($"last_day").as("maxd"))
    val base = perCust.crossJoin(broadcast(frontier))
      .select($"o_custkey", datediff($"maxd", $"last_day").cast("long")
        .as("recency"), $"freq", $"cents")
      .localCheckpoint() // feeds three score joins + the final aggregate
    def scores(dim: String, out: String): DataFrame = {
      val vals = base.groupBy(col(dim)).agg(count(lit(1)).as("cnt"))
      SemiStructured.valueKeyedCums(vals, dim, Seq("cnt"))
        .select(col(dim),
          expr(s"((cum_cnt - 1) * 5) div tot_cnt + 1").as(out))
    }
    base
      .join(scores("recency", "q_r").hint("shuffle_hash"), "recency")
      .join(scores("freq", "q_f").hint("shuffle_hash"), "freq")
      .join(scores("cents", "q_m").hint("shuffle_hash"), "cents")
      .select((lit(6L) - $"q_r").as("r_score"), $"q_f".as("f_score"),
        $"q_m".as("m_score"), $"cents")
      .groupBy($"r_score", $"f_score", $"m_score")
      .agg(count(lit(1)).as("n_customers"), sum($"cents").as("cents_total"))
      .orderBy($"r_score", $"f_score", $"m_score")
  }
  private val rfmSql =
    """WITH pc AS (SELECT o_custkey,
      |    MAX(CAST(o_orderdate AS DATE)) AS last_day, COUNT(*) AS freq,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
      |      AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |f AS (SELECT MAX(last_day) AS maxd FROM pc),
      |b AS (SELECT o_custkey, CAST(maxd - last_day AS BIGINT) AS recency,
      |    freq, cents FROM pc CROSS JOIN f),
      |sr AS (SELECT recency, ((SUM(cnt) OVER (ORDER BY recency) - 1) * 5)
      |      // (SUM(cnt) OVER ()) + 1 AS q_r
      |  FROM (SELECT recency, COUNT(*) AS cnt FROM b GROUP BY 1)),
      |sf AS (SELECT freq, ((SUM(cnt) OVER (ORDER BY freq) - 1) * 5)
      |      // (SUM(cnt) OVER ()) + 1 AS q_f
      |  FROM (SELECT freq, COUNT(*) AS cnt FROM b GROUP BY 1)),
      |sm AS (SELECT cents, ((SUM(cnt) OVER (ORDER BY cents) - 1) * 5)
      |      // (SUM(cnt) OVER ()) + 1 AS q_m
      |  FROM (SELECT cents, COUNT(*) AS cnt FROM b GROUP BY 1))
      |SELECT CAST(6 - q_r AS BIGINT) AS r_score, CAST(q_f AS BIGINT)
      |    AS f_score, CAST(q_m AS BIGINT) AS m_score,
      |  COUNT(*) AS n_customers, CAST(SUM(cents) AS BIGINT) AS cents_total
      |FROM b JOIN sr USING (recency) JOIN sf USING (freq)
      |JOIN sm USING (cents)
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // -- q_cohort_ltv: cumulative revenue per acquisition cohort ---------------
  // The LTV curve growth teams actually plot (q_retention's revenue
  // twin): customers grouped by first-order month, revenue per
  // (cohort, month offset) cell, the running cumulative per cohort,
  // and cumulative cents PER COHORT MEMBER — the money shot, an exact
  // floored quotient by the FIXED cohort size (not by that month's
  // active count, the classic LTV-inflation mistake). Months are the
  // integer index year·12 + month − 1 — extraction-identical under the
  // UTC session on both engines. One fact groupBy; cohort assignment is
  // a per-customer min joined back; the cumulative window runs per
  // cohort over the calendar-bounded offset table.
  private def cohortLtv(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val po = Tables.orders(s, d)
      .select($"o_custkey",
        (year($"o_orderdate") * 12 + month($"o_orderdate") - 1).cast("long")
          .as("m"),
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("cents"))
    val cohort = po.groupBy($"o_custkey").agg(min($"m").as("cm"))
    val sizes = cohort.groupBy($"cm").agg(count(lit(1)).as("cohort_size"))
    val cells = po.hint("shuffle_hash").join(cohort, "o_custkey")
      .groupBy($"cm", ($"m" - $"cm").as("month_offset"))
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("cents_sum"))
    val wCum = Window.partitionBy($"cm").orderBy($"month_offset")
    cells
      .withColumn("cum_cents", sum($"cents_sum").over(wCum))
      .join(sizes, "cm")
      .select($"cm".as("cohort_month"), $"month_offset", $"cohort_size",
        $"n_orders", $"cents_sum", $"cum_cents",
        expr("cum_cents div cohort_size").as("ltv_cents"))
      .orderBy($"cohort_month", $"month_offset")
  }
  private val cohortLtvSql =
    """WITH po AS (SELECT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
      |      AS m,
      |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM orders),
      |co AS (SELECT o_custkey, MIN(m) AS cm FROM po GROUP BY 1),
      |sz AS (SELECT cm, COUNT(*) AS cohort_size FROM co GROUP BY 1),
      |cells AS (SELECT cm, m - cm AS month_offset, COUNT(*) AS n_orders,
      |    CAST(SUM(cents) AS BIGINT) AS cents_sum
      |  FROM po JOIN co USING (o_custkey) GROUP BY 1, 2),
      |cum AS (SELECT cm, month_offset, n_orders, cents_sum,
      |    CAST(SUM(cents_sum) OVER (PARTITION BY cm ORDER BY month_offset)
      |      AS BIGINT) AS cum_cents
      |  FROM cells)
      |SELECT cm AS cohort_month, month_offset, sz.cohort_size, n_orders,
      |  cents_sum, cum_cents, cum_cents // sz.cohort_size AS ltv_cents
      |FROM cum JOIN sz USING (cm)
      |ORDER BY cohort_month, month_offset""".stripMargin

  // -- q_feature_backfill: leakage-safe point-in-time features -------------
  // The feature-store backfill primitive: at every LABEL event (a
  // purchase), the user's trailing-7-day activity profile as it stood
  // STRICTLY BEFORE that instant — the frame is RANGE [-7d, -1]
  // microseconds, excluding the current row's timestamp entirely, which
  // is the label-leakage rule training-set builders get wrong when they
  // use an inclusive frame (the label event would see itself and any
  // same-timestamp sibling). Counts pivot per event type in ONE window
  // pass (conditional aggregates share the frame buffer); the trailing
  // spend goes through the decimal pre-sum. ONE shuffle (user_id), the
  // q_rolling_agg shape; the window state is bounded by the time span,
  // not the partition. Ties: same-instant events are EXCLUDED together
  // (strict past), so no intra-timestamp order can leak.
  private val BackfillUs: Long = 7L * 24 * 3600 * 1000000L
  private def featureBackfill(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-BackfillUs, -1)
    def nOf(t: String) =
      count(when($"event_type" === t, 1)).over(w).as(s"n_${t}_7d")
    // all six trailing aggregates in ONE projection: withColumn chains
    // interleave Projects between the Window nodes and defeat
    // CollapseWindow — six sequential Window operators over the same
    // frame instead of one (plan-pinned by PlanSpec)
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts_ns div 1000").as("ts_us"), $"value")
      .select($"user_id", $"event_id", $"event_type", $"ts_us",
        nOf("view"), nOf("click"), nOf("signup"), nOf("error"),
        nOf("purchase"),
        coalesce(sum(when($"event_type" === "purchase",
            $"value".cast(org.apache.spark.sql.types.DecimalType(18, 6))))
          .over(w), lit(0).cast(org.apache.spark.sql.types.DecimalType(18, 6)))
          .cast("double").as("spend_7d"))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts_us", $"n_view_7d", $"n_click_7d",
        $"n_signup_7d", $"n_error_7d", $"n_purchase_7d", $"spend_7d")
      .orderBy($"user_id", $"ts_us", $"event_id")
  }
  private val featureBackfillSql =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |    epoch_ns(ts) // 1000 AS ts_us, value FROM events),
       |f AS (SELECT user_id, event_id, event_type, ts_us,
       |    COUNT(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS n_view_7d,
       |    COUNT(CASE WHEN event_type = 'click' THEN 1 END) OVER w AS n_click_7d,
       |    COUNT(CASE WHEN event_type = 'signup' THEN 1 END) OVER w AS n_signup_7d,
       |    COUNT(CASE WHEN event_type = 'error' THEN 1 END) OVER w AS n_error_7d,
       |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) OVER w AS n_purchase_7d,
       |    CAST(COALESCE(SUM(CASE WHEN event_type = 'purchase'
       |        THEN CAST(value AS DECIMAL(18,6)) END) OVER w, 0) AS DOUBLE)
       |      AS spend_7d
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
       |    RANGE BETWEEN $BackfillUs PRECEDING AND 1 PRECEDING))
       |SELECT user_id, event_id, ts_us, n_view_7d, n_click_7d, n_signup_7d,
       |  n_error_7d, n_purchase_7d, spend_7d
       |FROM f WHERE event_type = 'purchase'
       |ORDER BY user_id, ts_us, event_id""".stripMargin

  // -- q_rolling_actives: exact trailing-7-day distinct actives ------------
  // The DAU/WAU dashboard series — and the op naive pipelines get WRONG
  // by summing daily distincts (a user active twice in a week must
  // count once). Exact rolling distinct without a per-window distinct
  // pass: a user active on day d is "7-day active" for every window day
  // in [d, d+6], so each user's activity-day set becomes a union of
  // COVERAGE INTERVALS — merged with one lag window per user (a gap > 7
  // days starts a new interval; ≤ 7 keeps coverage contiguous), then
  // exploded to (window_day, user) rows that are DISTINCT BY
  // CONSTRUCTION (intervals within a user are disjoint), so the final
  // count per day is a plain aggregate. Scale: everything is keyed by
  // user until the last groupBy; the explode fan-out is bounded by the
  // calendar (≤ span+6 rows per user interval), never by event volume;
  // integer epoch-days everywhere (calendar-free, engine-identical).
  // Window days past the last observed day are clipped (trailing
  // windows that would only report on future dates are artifacts).
  private def rollingActives(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val days = Tables.events(s, d)
      .select($"user_id", expr("ts_ns div 86400000000000").as("day"))
      .distinct()
      .localCheckpoint() // feeds the interval pass + the DAU aggregate
    rollingActivesFrom(days)
  }

  /** The interval-merge epilogue over a distinct (user_id, day) frame —
    * shared with the streaming twin, whose drained activity state is
    * exactly this table. */
  private[graft] def rollingActivesFrom(days: DataFrame): DataFrame = {
    val s = days.sparkSession
    import s.implicits._
    val maxDay = days.agg(max($"day").as("max_day"))
    val wu = Window.partitionBy($"user_id").orderBy($"day")
    val intervals = days
      .withColumn("gap", $"day" - lag($"day", 1).over(wu))
      .withColumn("new_iv", when($"gap".isNull || $"gap" > 7, 1L).otherwise(0L))
      .withColumn("iv", sum($"new_iv").over(
        wu.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy($"user_id", $"iv")
      .agg(min($"day").as("start"), (max($"day") + 6).as("end"))
    val covered = intervals.crossJoin(broadcast(maxDay))
      .select($"user_id",
        explode(sequence($"start", least($"end", $"max_day"))).as("day"))
    val wau = covered.groupBy($"day").agg(count(lit(1)).as("active_7d"))
    val dau = days.groupBy($"day").agg(count(lit(1)).as("active_1d"))
    wau.join(dau, Seq("day"), "left")
      .select($"day", coalesce($"active_1d", lit(0L)).as("active_1d"),
        $"active_7d")
      .orderBy($"day")
  }
  private[graft] val rollingActivesSql =
    """WITH days AS (SELECT DISTINCT user_id,
      |    epoch_ns(ts) // 86400000000000 AS day FROM events),
      |mx AS (SELECT MAX(day) AS max_day FROM days),
      |iv0 AS (SELECT user_id, day,
      |    CASE WHEN day - lag(day) OVER (PARTITION BY user_id ORDER BY day)
      |           IS NULL
      |         OR day - lag(day) OVER (PARTITION BY user_id ORDER BY day) > 7
      |         THEN 1 ELSE 0 END AS new_iv
      |  FROM days),
      |iv AS (SELECT user_id, day,
      |    SUM(new_iv) OVER (PARTITION BY user_id ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS iv
      |  FROM iv0),
      |merged AS (SELECT user_id, iv, MIN(day) AS start, MAX(day) + 6 AS fin
      |  FROM iv GROUP BY 1, 2),
      |covered AS (SELECT m.user_id, t.day
      |  FROM merged m CROSS JOIN mx,
      |    unnest(generate_series(m.start, least(m.fin, mx.max_day))) t(day)),
      |wau AS (SELECT day, COUNT(*) AS active_7d FROM covered GROUP BY day),
      |dau AS (SELECT day, COUNT(*) AS active_1d FROM days GROUP BY day)
      |SELECT w.day, COALESCE(d.active_1d, 0) AS active_1d, w.active_7d
      |FROM wau w LEFT JOIN dau d ON d.day = w.day
      |ORDER BY w.day""".stripMargin

  // -- q_churn_labels: strict-future training labels -----------------------
  // The label half of the training-table pair (q_feature_backfill is
  // the feature half): at every purchase, did the user purchase again
  // within 14 days — STRICTLY AFTER the label instant (RANGE [+1,
  // +14d] µs)? The symmetric leakage rule to the backfill's strict
  // past: an inclusive lower bound would let the label event label
  // itself positive, and same-instant siblings leak both ways — here
  // they are excluded together. Also emits the future activity count
  // of ANY type (the "retained at all" weak label — churn modeling
  // wants both targets). Joining this to q_feature_backfill on (user,
  // event_id) yields a leakage-safe training table: features end at
  // ts−1, labels start at ts+1, the label instant itself in neither.
  // Same one-shuffle window shape as the backfill.
  private val ChurnHorizonUs: Long = 14L * 24 * 3600 * 1000000L
  private def churnLabels(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(1, ChurnHorizonUs)
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"event_type",
        expr("ts_ns div 1000").as("ts_us"))
      .select($"user_id", $"event_id", $"event_type", $"ts_us",
        count(when($"event_type" === "purchase", 1)).over(w)
          .as("n_future_purchases_14d"),
        count(lit(1)).over(w).as("n_future_events_14d"))
      .filter($"event_type" === "purchase")
      .select($"user_id", $"event_id", $"ts_us",
        ($"n_future_purchases_14d" > 0).as("label_repurchase_14d"),
        $"n_future_purchases_14d", $"n_future_events_14d")
      .orderBy($"user_id", $"ts_us", $"event_id")
  }
  private val churnLabelsSql =
    s"""WITH e AS (SELECT user_id, event_id, event_type,
       |    epoch_ns(ts) // 1000 AS ts_us FROM events),
       |f AS (SELECT user_id, event_id, event_type, ts_us,
       |    COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) OVER w
       |      AS n_future_purchases_14d,
       |    COUNT(*) OVER w AS n_future_events_14d
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
       |    RANGE BETWEEN 1 FOLLOWING AND $ChurnHorizonUs FOLLOWING))
       |SELECT user_id, event_id, ts_us,
       |  n_future_purchases_14d > 0 AS label_repurchase_14d,
       |  n_future_purchases_14d, n_future_events_14d
       |FROM f WHERE event_type = 'purchase'
       |ORDER BY user_id, ts_us, event_id""".stripMargin

  // -- q_funnel_latency: conversion-time distribution per funnel step ------
  // q_funnel reports WHO converts (counts + total latency); this
  // reports HOW FAST — the per-transition latency distribution
  // (view→first-click, click→first-purchase on the same funnel-ordered
  // first events), as exact pinned-position percentiles: p50/p90 at
  // prefix-max rn <= ceil(q·n) of the (latency, user_id) total order
  // (the q_percentile no-interpolation rule), plus min/max. Latencies
  // are integer microsecond differences — no float anywhere. Same
  // per-user min-aggregation joins as the funnel (each stage is one
  // narrow groupBy; the rank windows run over USERS-WHO-CONVERTED, a
  // funnel-shrinking frame, keyed by the 2-row stage dimension).
  private def funnelLatency(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_type", expr("ts_ns div 1000").as("ts_us"))
    val v = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts_us").as("v_ts"))
    val c = ev.filter($"event_type" === "click").join(v, "user_id")
      .filter($"ts_us" > $"v_ts")
      .groupBy($"user_id").agg(min($"ts_us").as("c_ts"), min($"v_ts").as("v_ts"))
    val p = ev.filter($"event_type" === "purchase").join(c, "user_id")
      .filter($"ts_us" > $"c_ts")
      .groupBy($"user_id").agg(min($"ts_us").as("p_ts"), min($"c_ts").as("c_ts"))
    val lats = c.select(lit("1_view_to_click").as("stage"), $"user_id",
        ($"c_ts" - $"v_ts").as("lat"))
      .unionAll(p.select(lit("2_click_to_purchase").as("stage"), $"user_id",
        ($"p_ts" - $"c_ts").as("lat")))
    val ws = Window.partitionBy($"stage")
    val wr = ws.orderBy($"lat", $"user_id")
    lats
      .withColumn("rn", row_number().over(wr))
      .withColumn("n", count(lit(1)).over(ws))
      .groupBy($"stage")
      .agg(count(lit(1)).as("n_users"),
        min($"lat").as("min_us"),
        max(when($"rn" <= ceil($"n" * 0.5), $"lat")).as("p50_us"),
        max(when($"rn" <= ceil($"n" * 0.9), $"lat")).as("p90_us"),
        max($"lat").as("max_us"))
      .orderBy($"stage")
  }
  private val funnelLatencySql =
    """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
      |v AS (SELECT user_id, MIN(ts_us) AS v_ts FROM ev
      |      WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT ev.user_id, MIN(ts_us) AS c_ts, MIN(v_ts) AS v_ts
      |      FROM ev JOIN v ON ev.user_id = v.user_id
      |      WHERE event_type = 'click' AND ts_us > v_ts GROUP BY ev.user_id),
      |p AS (SELECT ev.user_id, MIN(ts_us) AS p_ts, MIN(c_ts) AS c_ts
      |      FROM ev JOIN c ON ev.user_id = c.user_id
      |      WHERE event_type = 'purchase' AND ts_us > c_ts GROUP BY ev.user_id),
      |lats AS (SELECT '1_view_to_click' AS stage, user_id, c_ts - v_ts AS lat
      |         FROM c
      |         UNION ALL
      |         SELECT '2_click_to_purchase', user_id, p_ts - c_ts FROM p),
      |r AS (SELECT stage, lat,
      |    row_number() OVER (PARTITION BY stage ORDER BY lat, user_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY stage) AS n
      |  FROM lats)
      |SELECT stage, COUNT(*) AS n_users,
      |  MIN(lat) AS min_us,
      |  MAX(CASE WHEN rn <= ceil(n * 0.5) THEN lat END) AS p50_us,
      |  MAX(CASE WHEN rn <= ceil(n * 0.9) THEN lat END) AS p90_us,
      |  MAX(lat) AS max_us
      |FROM r GROUP BY stage ORDER BY stage""".stripMargin

  // -- q_time_split: purged temporal train/val/test split ------------------
  // The time-series CV splitter (the purged split of de Prado 2018):
  // boundaries at the EXACT 70%/85% count positions of the timestamp
  // order (same-instant events stay together — a timestamp never
  // straddles a boundary), so segment sizes are data-driven fractions,
  // not calendar guesses — and a PURGE GAP of 1 day before
  // each boundary: events in (boundary − 1d, boundary] leave the
  // earlier segment entirely, because a trailing-window feature
  // computed there overlaps the next segment's label horizon (the
  // q_feature_backfill window is exactly the leak this gap closes).
  // Boundary discovery runs on the DISTINCT-timestamp table through
  // the range-partitioned prefix sum (valueKeyedCums — no global
  // window at any cardinality); boundaries ride a one-row broadcast.
  // Output is the per-segment audit (counts, user coverage, exact time
  // range) — the row a pipeline asserts on before training.
  private val PurgeUs: Long = 24L * 3600 * 1000000L
  private def timeSplit(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ev = Tables.events(s, d)
      .select($"user_id", $"event_id", expr("ts_ns div 1000").as("ts_us"))
    val tsCounts = ev.groupBy($"ts_us").agg(count(lit(1)).as("c"))
    val cums = SemiStructured.valueKeyedCums(tsCounts, "ts_us", Seq("c"))
    val bounds = cums
      .agg(
        min(when($"cum_c" >= ceil($"tot_c" * 0.7), $"ts_us")).as("t70"),
        min(when($"cum_c" >= ceil($"tot_c" * 0.85), $"ts_us")).as("t85"))
    ev.crossJoin(broadcast(bounds))
      .withColumn("segment",
        when($"ts_us" <= $"t70" - PurgeUs, "1_train")
          .when($"ts_us" <= $"t70", "2_purge")
          .when($"ts_us" <= $"t85" - PurgeUs, "3_val")
          .when($"ts_us" <= $"t85", "4_purge")
          .otherwise("5_test"))
      .groupBy($"segment")
      .agg(count(lit(1)).as("n_events"),
        count_distinct($"user_id").as("n_users"),
        min($"ts_us").as("t_min"), max($"ts_us").as("t_max"))
      .orderBy($"segment")
  }
  private val timeSplitSql =
    s"""WITH e AS (SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us
       |           FROM events),
       |tc AS (SELECT ts_us, COUNT(*) AS c FROM e GROUP BY ts_us),
       |cu AS (SELECT ts_us,
       |    SUM(c) OVER (ORDER BY ts_us
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_c,
       |    SUM(c) OVER () AS tot_c
       |  FROM tc),
       |b AS (SELECT
       |    MIN(CASE WHEN cum_c >= ceil(tot_c * 0.7) THEN ts_us END) AS t70,
       |    MIN(CASE WHEN cum_c >= ceil(tot_c * 0.85) THEN ts_us END) AS t85
       |  FROM cu),
       |seg AS (SELECT e.user_id, e.ts_us,
       |    CASE WHEN ts_us <= t70 - $PurgeUs THEN '1_train'
       |         WHEN ts_us <= t70 THEN '2_purge'
       |         WHEN ts_us <= t85 - $PurgeUs THEN '3_val'
       |         WHEN ts_us <= t85 THEN '4_purge'
       |         ELSE '5_test' END AS segment
       |  FROM e CROSS JOIN b)
       |SELECT segment, COUNT(*) AS n_events,
       |  COUNT(DISTINCT user_id) AS n_users,
       |  MIN(ts_us) AS t_min, MAX(ts_us) AS t_max
       |FROM seg GROUP BY segment ORDER BY segment""".stripMargin

  // -- q_ab_srm: sample-ratio-mismatch gate --------------------------------
  // The #1 experiment-validity check, run BEFORE reading q_ab_test's z:
  // under 50/50 persisted randomization the variant counts must be
  // binomially close — a skewed split means broken assignment or
  // differential logging loss, and every downstream readout is invalid.
  // Chi-square with 1 df on the two observed user counts vs the even
  // split: one IEEE expression over two exact integers (identical
  // parenthesization both engines — two cells need no cross-row float
  // sum at all), flagged at the 95% critical value 3.841. Same
  // replayable md5 assignment as q_ab_test, same one-shuffle per-user
  // collapse.
  private def abSrm(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val v = Tables.events(s, d)
      .select($"user_id").distinct()
      .withColumn("variant",
        when(mixKey($"user_id") % 2 === 0, "A").otherwise("B"))
      .groupBy($"variant").agg(count(lit(1)).as("n"))
    val a = v.filter($"variant" === "A").select($"n".as("n_a"))
    val b = v.filter($"variant" === "B").select($"n".as("n_b"))
    a.crossJoin(broadcast(b))
      .withColumn("expd", ($"n_a" + $"n_b") / lit(2.0))
      .select($"n_a", $"n_b",
        round((($"n_a" - $"expd") * ($"n_a" - $"expd") +
          ($"n_b" - $"expd") * ($"n_b" - $"expd")) / $"expd", 6).as("chi2_6"))
      .withColumn("srm", $"chi2_6" > 3.841)
  }
  private val abSrmSql = {
    val h = mixKeySql("user_id")
    s"""WITH u AS (SELECT DISTINCT user_id FROM events),
       |v AS (SELECT CASE WHEN $h % 2 = 0 THEN 'A' ELSE 'B' END AS variant
       |      FROM u),
       |c AS (SELECT variant, COUNT(*) AS n FROM v GROUP BY variant),
       |j AS (SELECT a.n AS n_a, b.n AS n_b,
       |    (a.n + b.n) / 2.0 AS expd
       |  FROM (SELECT n FROM c WHERE variant = 'A') a
       |  CROSS JOIN (SELECT n FROM c WHERE variant = 'B') b)
       |SELECT n_a, n_b,
       |  round(((n_a - expd) * (n_a - expd)
       |    + (n_b - expd) * (n_b - expd)) / expd, 6) AS chi2_6,
       |  round(((n_a - expd) * (n_a - expd)
       |    + (n_b - expd) * (n_b - expd)) / expd, 6) > 3.841 AS srm
       |FROM j""".stripMargin
  }

  // -- q_markov_stationary: long-run state distribution --------------------
  // Closes the Markov story q_transition_matrix opens: where does the
  // chain SPEND its time (the load-planning number — "what fraction of
  // steady-state traffic is errors") — the stationary distribution of
  // the first-order event-type chain. The distributed work is the same
  // one-window lag-pair count; the 5×5 count matrix is then
  // SCALAR-scale, so the fixed 8-round power iteration runs driver-side
  // in exact BigInt (the q_pca_power decision): each step's term is the
  // floor quotient (v_i·c_ij) div r_i — positive everywhere, so
  // Spark-side BigInt truncation and the oracle's `//` agree — and the
  // output is π as an integer micro-share of the final mass. The
  // row-stochastic floors keep total mass ~constant, so no per-round
  // renorm is needed at 8 rounds (drift ≤ states per round, documented
  // bound). Oracle replays the unrolled rounds on the counts CTE.
  private val MkRounds = 8
  private def markovStationary(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts_ns", $"event_id")
    val counts = Tables.events(s, d)
      .select($"user_id", $"event_type", $"ts_ns", $"event_id")
      .withColumn("prev_type", lag($"event_type", 1).over(w))
      .filter($"prev_type".isNotNull)
      .groupBy($"prev_type", $"event_type")
      .agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    // the chain is defined over states WITH outgoing mass (r > 0);
    // transitions into states outside that support are dropped on both
    // engines — a next-only absorbing state has no stationary row
    val states = counts.keys.map(_._1).toSeq.distinct.sorted
    val stateSet = states.toSet
    val r = states.map(st =>
      st -> counts.collect { case ((p, _), n) if p == st => n }.sum).toMap
    val counts2 = counts.filter { case ((_, nx), _) => stateSet(nx) }
    var v = states.map(_ -> BigInt(1000000000L)).toMap
    for (_ <- 1 to MkRounds) {
      v = states.map { next =>
        next -> states.map { prev =>
          val cnt: Long = counts2.getOrElse((prev, next), 0L)
          v(prev) * BigInt(cnt) / BigInt(r(prev))
        }.sum
      }.toMap
    }
    val tot = states.map(v).sum
    states.map(st => (st, r(st), (v(st) * 1000000 / tot).toLong))
      .toDF("state", "n_out", "pi_micro")
      .orderBy($"state")
  }
  private val markovStationarySql = {
    val rounds = (0 until MkRounds).map { t =>
      s"""v${t + 1} AS MATERIALIZED (SELECT c.event_type AS state,
         |    SUM((v.v * c.n) // r.r) AS v
         |  FROM c2 c JOIN v$t v ON v.state = c.prev_type
         |  JOIN r ON r.state = c.prev_type
         |  GROUP BY c.event_type)""".stripMargin
    }.mkString(",\n")
    s"""WITH ev AS (SELECT user_id, event_type, epoch_ns(ts) AS ts_ns,
       |    event_id FROM events),
       |st AS (SELECT event_type,
       |    LAG(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts_ns, event_id) AS prev_type
       |  FROM ev),
       |c AS MATERIALIZED (SELECT prev_type, event_type, COUNT(*) AS n
       |  FROM st WHERE prev_type IS NOT NULL GROUP BY 1, 2),
       |r AS MATERIALIZED (SELECT prev_type AS state, SUM(n) AS r FROM c
       |  GROUP BY 1),
       |c2 AS MATERIALIZED (SELECT c.* FROM c
       |  WHERE c.event_type IN (SELECT state FROM r)),
       |v0 AS (SELECT state, CAST(1000000000 AS HUGEINT) AS v FROM r),
       |$rounds,
       |tot AS (SELECT SUM(v) AS tot FROM v$MkRounds)
       |SELECT r.state, CAST(r.r AS BIGINT) AS n_out,
       |  CAST(COALESCE(v.v, 0) * 1000000 // tot.tot AS BIGINT) AS pi_micro
       |FROM r LEFT JOIN v$MkRounds v ON v.state = r.state CROSS JOIN tot
       |ORDER BY r.state""".stripMargin
  }

  // -- q_new_vs_returning: weekly revenue split by customer tenure ---------
  // The growth-accounting staple: how much of each week's revenue is
  // NEW customers (first-ever order that week) vs returning — the split
  // that tells acquisition from retention revenue. First-order week is
  // one per-customer window-min over the already-aggregated (customer,
  // week) frame (the q_retention shape — never a second fact scan);
  // revenue through the decimal pre-sum; shares as integer
  // micro-quotients of exact cents. Integer epoch-weeks.
  private def newVsReturning(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val wk = Tables.orders(s, d)
      .select($"o_custkey",
        expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
          "div 604800000000 AS BIGINT)").as("week"),
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("cents"))
      .groupBy($"o_custkey", $"week")
      .agg(count(lit(1)).as("n_orders"), sum($"cents").as("cents"))
    val w = Window.partitionBy($"o_custkey")
    wk.withColumn("first_week", min($"week").over(w))
      .withColumn("is_new", $"week" === $"first_week")
      .groupBy($"week")
      .agg(
        sum(when($"is_new", 1L).otherwise(0L)).as("new_customers"),
        sum(when(!$"is_new", 1L).otherwise(0L)).as("returning_customers"),
        sum(when($"is_new", $"cents").otherwise(0L)).as("new_cents"),
        sum(when(!$"is_new", $"cents").otherwise(0L)).as("returning_cents"))
      .select($"week", $"new_customers", $"returning_customers",
        $"new_cents", $"returning_cents",
        expr("new_cents * 1000000 div (new_cents + returning_cents)")
          .as("new_share_micro"))
      .orderBy($"week")
  }
  private val newVsReturningSql =
    """WITH wk AS (SELECT o_custkey,
      |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 604800000000 AS week,
      |    CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
      |      AS BIGINT) AS cents,
      |    COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1, 2),
      |f AS (SELECT o_custkey, week, cents,
      |    week = MIN(week) OVER (PARTITION BY o_custkey) AS is_new
      |  FROM wk)
      |SELECT week,
      |  CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
      |    AS new_customers,
      |  CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
      |    AS returning_customers,
      |  CAST(SUM(CASE WHEN is_new THEN cents ELSE 0 END) AS BIGINT)
      |    AS new_cents,
      |  CAST(SUM(CASE WHEN is_new THEN 0 ELSE cents END) AS BIGINT)
      |    AS returning_cents,
      |  CAST(SUM(CASE WHEN is_new THEN cents ELSE 0 END) * 1000000
      |    // SUM(cents) AS BIGINT) AS new_share_micro
      |FROM f GROUP BY week ORDER BY week""".stripMargin

  // -- q_percentile_trend: weekly exact price percentiles ------------------
  // The latency/price-SLO dashboard shape: per week, exact pinned
  // p50/p95 of order price (the q_percentile rule, grouped by the
  // calendar bucket) with count and max — the trend a drift review
  // reads next to the PSI monitor. One week-keyed window pass.
  private def percentileTrend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val base = Tables.orders(s, d)
      .select(expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) " +
        "div 604800000000 AS BIGINT)").as("week"),
        $"o_totalprice".as("x"), $"o_orderkey".as("k"))
    val wn = Window.partitionBy($"week")
    val w = wn.orderBy($"x", $"k")
    base
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(wn))
      .groupBy($"week")
      .agg(count(lit(1)).as("n_orders"),
        max(when($"rn" <= ceil($"n" * 0.5), $"x")).as("p50"),
        max(when($"rn" <= ceil($"n" * 0.95), $"x")).as("p95"),
        max($"x").as("mx"))
      .orderBy($"week")
  }
  private val percentileTrendSql =
    """WITH b AS (SELECT
      |    epoch_us(CAST(o_orderdate AS TIMESTAMP)) // 604800000000 AS week,
      |    o_totalprice AS x, o_orderkey AS k FROM orders),
      |r AS (SELECT week, x,
      |    row_number() OVER (PARTITION BY week ORDER BY x, k) AS rn,
      |    COUNT(*) OVER (PARTITION BY week) AS n
      |  FROM b)
      |SELECT week, COUNT(*) AS n_orders,
      |  MAX(CASE WHEN rn <= ceil(n * 0.5) THEN x END) AS p50,
      |  MAX(CASE WHEN rn <= ceil(n * 0.95) THEN x END) AS p95,
      |  MAX(x) AS mx
      |FROM r GROUP BY week ORDER BY week""".stripMargin

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_new_vs_returning", newVsReturning, Some(newVsReturningSql)),
    QueryDef("q_percentile_trend", percentileTrend, Some(percentileTrendSql)),
    QueryDef("q_markov_stationary", markovStationary, Some(markovStationarySql)),
    QueryDef("q_ab_srm", abSrm, Some(abSrmSql)),
    QueryDef("q_time_split", timeSplit, Some(timeSplitSql)),
    QueryDef("q_funnel_latency", funnelLatency, Some(funnelLatencySql)),
    QueryDef("q_churn_labels", churnLabels, Some(churnLabelsSql)),
    QueryDef("q_rolling_actives", rollingActives, Some(rollingActivesSql)),
    QueryDef("q_feature_backfill", featureBackfill, Some(featureBackfillSql)),
    QueryDef("q_survival", qSurvival, Some(qSurvivalSql)),
    QueryDef("q_cohort_ltv", cohortLtv, Some(cohortLtvSql)),
    QueryDef("q_seasonality", seasonality, Some(seasonalitySql)),
    QueryDef("q_user_growth", userGrowth, Some(userGrowthSql)),
    QueryDef("q_user_overlap", userOverlap, Some(userOverlapSql)),
    QueryDef("q_rfm", rfm, Some(rfmSql)),
    QueryDef("q_ab_test", abTest, Some(abTestSql)),
    QueryDef("q_transition_matrix", transitionMatrix, Some(transitionMatrixSql)),
    QueryDef("q_event_paths", eventPaths, Some(eventPathsSql)),
    QueryDef("q_attribution", attribution, Some(attributionSql)),
    QueryDef("q_mixture_apply", mixtureApply, Some(mixtureApplySql)),
    QueryDef("q_kfold_split", kfoldSplit, Some(kfoldSplitSql)),
    QueryDef("q_length_batching", lengthBatching, Some(lengthBatchingSql)),
    QueryDef("q_funnel", funnel, Some(funnelSql)),
    QueryDef("q_retention", retention, Some(retentionSql)),
    QueryDef("q_pack_sequences", packSequences, Some(packSequencesSql)),
    QueryDef("q_mixture_weights", mixtureWeights, Some(mixtureWeightsSql)),
  )
}
