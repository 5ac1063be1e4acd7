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

  test("dedup_substring: discovery shuffles fingerprints; document text never shuffles") {
    val p = plan("dedup_substring")
    // gram fingerprints drive the duplicate discovery
    assert(p.contains("graft_fingerprint64"), p.take(500))
    // no Exchange is keyed on (or carries) the raw text / word array —
    // marking is a broadcast semi-join, excision a broadcast join onto
    // the unexploded docs
    assert(!p.contains("Exchange hashpartitioning(text"), "raw text in shuffle key")
    assert(!p.contains("Exchange hashpartitioning(g#") &&
      !p.contains("Exchange hashpartitioning(w#"), "gram/word text in shuffle key")
  }

  test("q_index_incremental: stored postings maintained via broadcast, churn legs doc-filtered") {
    val p = plan("q_index_incremental")
    // dropping stale postings is a BROADCAST anti-join and the df-minus
    // count a broadcast semi-join: the stored table is scanned, never
    // shuffled, for maintenance
    assert(p.contains("LeftAnti"), "stale-posting drop must be an anti-join")
    assert(p.contains("LeftSemi"), "df-minus leg must be a semi-join")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      "churn doc_ids must broadcast to both maintenance joins")
    // the recompute legs read only churned documents: the % 17 churn
    // predicates reach the documents scans
    assert(p.contains("% 17"), "churn filter missing from the recompute legs")
  }

  test("q_bm25: top-k lands as TakeOrderedAndProject, stats and terms broadcast") {
    val p = plan("q_bm25")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must not be a global sort")
    assert("BroadcastExchange".r.findAllIn(p).size >= 2,
      s"query terms + corpus stats should broadcast:\n${p.take(600)}")
  }

  test("io_partition_pruning: filter becomes a PartitionFilter (file skipping)") {
    // write the hive-partitioned layout, then inspect the pruned scan
    val out = operators.ScaleOps.partitionedOrders(spark, sf)
    val df = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
    val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
    assert(p.contains("PartitionFilters: [isnotnull(o_orderpriority"),
      s"partition filter not applied at file listing:\n$p")
    // the partition column never appears as a data-level pushed filter
    assert(!p.contains("PushedFilters: [IsNotNull(o_orderpriority"),
      "partition predicate leaked into data filters")
  }

  test("q_bucketed_join: co-located bucket join has NO shuffle") {
    operators.ScaleOps.ensureBucketedTables(spark, sf)
    // at sf0.001 the planner would broadcast (buckets moot); force the
    // fact⋈fact shape the technique exists for
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val p = try operators.ScaleOps.bucketedJoinOnly(spark)
      .queryExecution.executedPlan.toString
    finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert(p.contains("SortMergeJoin"), p)
    assert(!p.contains("Exchange"),
      s"bucketed join should read co-located buckets without shuffling:\n$p")
    assert(p.contains("SelectedBucketsCount"), "scan is not bucket-aware")
  }

  test("q_salted_skew_join: shuffle keys include the salt") {
    val p = plan("q_salted_skew_join")
    assert(p.contains("salt"), "join should be keyed on (key, salt)")
    // correctness vs the unsalted oracle is checked by Verify/DuckDB
  }

  test("q_asof_join: ONE hash shuffle — window and groupBy share user_id partitioning") {
    val p = plan("q_asof_join")
    // formatted mode prints exchange specs as "Arguments: hashpartitioning(…)"
    val hashExchanges = "hashpartitioning\\(user_id".r.findAllIn(p).size
    assert(hashExchanges == 1,
      s"as-of join should shuffle by user once, found $hashExchanges:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"), "as-of must not nested-loop")
  }

  test("q_asof_join_native plans through the custom AsofJoinExec operator") {
    val p = plan("q_asof_join_native")
    assert(p.contains("AsofJoin"), s"custom strategy did not fire:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("Window"),
      "native path must not fall back to window/nested-loop")
  }

  test("q_range_join is an equi-join with range residual, not a nested loop") {
    val p = plan("q_range_join")
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"),
      s"range join degenerated to a nested loop:\n$p")
  }

  test("z-order layout prunes more row groups than a linear sort for a 2-d box") {
    import org.apache.spark.sql.functions.col
    // sf0.01 with 64 files: enough stats granularity to measure skipping
    val sfDir = "/root/testdata/sf0.01"
    val (linear, zord) = operators.ScaleOps.zorderDirs(spark, sfDir, files = 64)
    val (sMax, pMax) = operators.ScaleOps.zorderBox(spark, sfDir)
    def rowsReadFrom(dir: String): Long = {
      val df = spark.read.parquet(dir)
        .filter(col("l_suppkey") <= sMax && col("l_partkey") <= pMax)
      df.collect()
      val plan = df.queryExecution.executedPlan
      val scans = plan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      scans.map(_.metrics("numOutputRows").value).sum
    }
    val total = spark.read.parquet(linear).count()
    val fromLinear = rowsReadFrom(linear)
    val fromZ = rowsReadFrom(zord)
    // linear sort on l_suppkey prunes one axis (~10% of rows); z-order
    // prunes both (~few %). Assert the ordering, with slack for stats
    // granularity at this tiny scale.
    assert(fromLinear < total, "linear layout should prune at least one axis")
    assert(fromZ < fromLinear,
      s"z-order should out-prune the linear sort: z=$fromZ linear=$fromLinear total=$total")
  }

  test("tfidf tokenizes the corpus once and computes top-k with partial group limits") {
    val p = plan("text_tfidf")
    // one Generate (the tokenize/explode) — df must NOT re-derive from a
    // second tokenize branch
    val generates = "\\(\\d+\\) Generate".r.findAllIn(p).size
    assert(generates == 1, s"expected exactly one tokenize pass, got $generates:\n$p")
    // scans: the tokenize scan + the one-row corpus count, nothing more
    val scans = "\\(\\d+\\) Scan parquet".r.findAllIn(p).size
    assert(scans <= 2, s"expected <= 2 parquet scans, got $scans:\n$p")
    // rank <= 5 runs as a group-limit BEFORE the final window sort
    assert(p.contains("WindowGroupLimit"),
      s"top-k per doc should use partial window group limits:\n$p")
  }

  test("component propagation shuffles narrow (id, label) rows only") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // one propagation round over a seeded edge list: the exchanged rows
    // must be ids + labels, never anything wider
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("doc_a", "doc_b")
    val labels = graft.operators.Dedup.componentLabels(pairs)
    val rows = labels.collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L),
      s"transitive chain 1-2-3 must converge to min label: $rows")
    val p = labels.queryExecution.executedPlan.toString
    assert(!p.toLowerCase.contains("cartesian") && !p.contains("BroadcastNestedLoop"),
      s"label propagation must stay an equi-join:\n$p")
  }

  test("runtime bloom filter prunes the probe side of the selective fact join") {
    import graft.operators.ScaleOps
    val (planStr, bloomed) = ScaleOps.withBloomConfs(spark) {
      val df = ScaleOps.bloomJoinPlan(spark, sf)
      (df.queryExecution.optimizedPlan.toString, df.collect())
    }
    assert(planStr.contains("might_contain") && planStr.contains("bloom_filter_agg"),
      s"runtime bloom filter was not injected:\n$planStr")
    // the filter is an optimization, never a semantics change
    val plain = ScaleOps.bloomJoinPlan(spark, sf).collect()
    assert(bloomed.toSeq == plain.toSeq,
      "bloom-pruned join must return exactly the plain join's rows")
    // confs were restored: a fresh plan must NOT carry the bloom filter
    val after = ScaleOps.bloomJoinPlan(spark, sf)
      .queryExecution.optimizedPlan.toString
    assert(!after.contains("might_contain"),
      "withBloomConfs must restore the session confs on exit")
  }

  test("round-4 operators keep their claimed shuffle counts") {
    // hashpartitioning exchanges only — the trailing orderBy's range
    // exchange is presentation, not algorithm (simple-mode string keeps
    // each Exchange inline with its partitioning)
    def hashExchanges(name: String): Int =
      "Exchange hashpartitioning".r.findAllIn(
        SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString).size
    // per-row map stages: zero data shuffles
    assert(hashExchanges("text_rep_removal") == 0,
      "within-doc dedup is row-local; any hash exchange is a regression")
    assert(hashExchanges("text_pii") == 0,
      "pii scrub is row-local; any hash exchange is a regression")
    assert(hashExchanges("sim_quantize_int8") == 1,
      "quantization shuffles only the final per-label aggregate")
    // windows + final groupBy share one key partitioning
    assert(hashExchanges("q_winsorize") == 1,
      "winsorize windows and aggregate must share the event_type exchange")
    assert(hashExchanges("q_scd2") == 1,
      "scd2 lag/lead windows must share the user_id exchange")
    // single-scan profile: ONE parquet scan feeds every aggregate, and
    // no Expand — six countDistinct in one agg would trigger the
    // multi-distinct rewrite (every row replicated 7×, grouping key
    // carrying all six value columns; measured 7.4s vs 0.6s at sf0.1)
    val prof = plan("q_profile_stats")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(prof).size == 1,
      s"profile must make one pass over the table:\n$prof")
    assert(!prof.contains("Expand"),
      s"profile must use the two-level (col,value) aggregate, not the multi-distinct Expand rewrite:\n$prof")
    // round-5 corpus operators
    assert(hashExchanges("text_chunk") == 0,
      "chunking is row-local (explode is the output, not a shuffle)")
    assert(hashExchanges("q_rolling_agg") == 1,
      "rolling window shuffles once, on the user_id partitioning")
    val dec = plan("q_decontaminate")
    assert(dec.contains("BroadcastHashJoin LeftSemi"),
      s"benchmark grams must broadcast (train side streams):\n$dec")
    assert(hashExchanges("q_decontaminate") == 2,
      "decontaminate shuffles only the bench distinct + the per-doc count")
    val seg = plan("text_seg_dedup")
    assert(seg.contains("BroadcastHashJoin LeftAnti"),
      s"frequent segments must broadcast back as an anti-join:\n$seg")
    assert(hashExchanges("text_seg_dedup") == 3,
      "seg dedup: two-phase frequency discovery + one reassembly shuffle")
    assert(plan("text_vocab").contains("TakeOrderedAndProject"),
      "vocab top-K must be a partial top-K, not a global sort")
    // validation gate: one scan, rule flags are map-side, zero data shuffle
    val vr = plan("q_validate_rows")
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(vr).size == 1 &&
      hashExchanges("q_validate_rows") == 0,
      s"constraint validation must be one scan + a global fold:\n$vr")
    // heavy hitters: candidates broadcast; only the verified count shuffles
    val hh = plan("q_heavy_hitters")
    assert(hh.contains("BroadcastHashJoin"),
      s"candidate set must broadcast into the exact pass:\n$hh")
    assert(hashExchanges("q_heavy_hitters") == 1,
      "only the candidate-filtered exact count may shuffle")
    // CDC: exactly the two churned file sets are scanned
    assert("\\(\\d+\\) Scan parquet".r.findAllIn(plan("q_cdc_diff")).size == 2,
      "CDC diff must read only the manifests' differing file groups")
    // full raw-docs→chunks pipeline: the dedup fingerprint window is
    // still the ONLY data shuffle — chunking fuses into the same stage
    // as the post-window filters
    assert(hashExchanges("pipeline_chunked_corpus") == 1,
      "chunked corpus pipeline must shuffle once (the dedup window)")
    // round-5 batch 2
    // ONE shuffle: hashpartitioning(source) from the cumsum window also
    // satisfies the (source, seq_id) aggregate's clustering (subset-key
    // co-location), so the final groupBy adds NO exchange
    assert(hashExchanges("q_pack_sequences") == 1,
      "packing: the per-source cumsum window partitioning must be reused by the aggregate")
    assert(hashExchanges("q_retention") == 3,
      "retention: pair distinct, cohort window, cohort-offset count — no join-back, no Expand")
  }

  test("q_lateral_join decorrelates to a window top-K join, not a subquery loop") {
    val p = plan("q_lateral_join")
    assert(p.contains("WindowGroupLimit"),
      s"correlated LIMIT must become a partial per-key top-K:\n$p")
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin"),
      s"lateral must execute as ONE join, not per-row subqueries:\n$p")
  }

  test("bucketed point lookup reads one bucket, not the table") {
    operators.ScaleOps.ensureBucketedTables(spark, sf)
    // autoBucketedScan drops the bucketed scan when nothing downstream
    // exploits its partitioning — which also forfeits bucket PRUNING;
    // a point lookup wants the pruning, so hold the bucketed scan on
    val k = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    val prev = spark.conf.get(k)
    spark.conf.set(k, "false")
    try {
      val p = spark.table("graft_li_bucketed")
        .filter(org.apache.spark.sql.functions.col("l_orderkey") === 42)
        .queryExecution.executedPlan.toString
      assert(p.contains("SelectedBucketsCount: 1 out of 8"),
        s"a bucket-key equality filter must prune the file listing to its bucket:\n$p")
    } finally spark.conf.set(k, prev)
  }

  test("parquet bloom filters exist on the enabled column and skip absent keys") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import scala.jdk.CollectionConverters._
    val dir = operators.ScaleOps.bloomTable(spark, sf)
    val part = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
      new Path(part.getAbsolutePath),
      spark.sessionState.newHadoopConf()))
    try {
      val block = reader.getRowGroups.asScala.head
      val byCol = block.getColumns.asScala
        .map(c => c.getPath.toDotString -> c).toMap
      val bloomReader = reader.getBloomFilterDataReader(block)
      assert(bloomReader.readBloomFilter(byCol("l_orderkey")) != null,
        "bloom filter must be written for the enabled column")
      assert(bloomReader.readBloomFilter(byCol("l_linenumber")) == null,
        "non-enabled columns must not pay bloom storage")
    } finally reader.close()
    // a key that exists returns rows; the scan consults the bloom for
    // pushed equality filters (PushedFilters carries the EqualTo)
    val df = spark.read.parquet(dir)
      .filter(org.apache.spark.sql.functions.col("l_orderkey") === 40)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("EqualTo(l_orderkey,40)"), s"equality must push to the scan:\n$p")
    assert(df.count() > 0)
  }

  test("AQE splits a skewed join partition at runtime") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 50% of the fact lands on ONE key; thresholds lowered so the
    // test-scale partition qualifies as skewed (defaults are 256 MB)
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "4KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1KB",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // AQE splits a skewed reduce partition by MAPPER block ranges —
      // a single-map-task stage (one small test file) has nothing to
      // split, so give the map side real parallelism first
      val fact = Tables.lineitem(spark, sf).repartition(8).select(
        when($"l_orderkey" % 2 === 0, 0L).otherwise($"l_orderkey" % 997).as("k"),
        $"l_extendedprice")
      // no distinct: a final aggregate between the Sort and the shuffle
      // stage would break OptimizeSkewedJoin's SMJ(Sort(Stage),
      // Sort(Stage)) pattern and silently disable the split
      val dim = Tables.orders(spark, sf).repartition(8)
        .select(($"o_orderkey" % 997).as("k"))
      val joined = fact.join(dim, "k")
      joined.collect() // execute THIS plan: AQE re-plans mid-flight
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"),
        s"AQE must mark and split the skewed partition:\n${p.take(4000)}")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q_dpp_join: dim filter prunes the fact's partitions at RUNTIME") {
    val fact = operators.ScaleOps.partitionedOrders(spark, sf)
    val dim = operators.ScaleOps.dppDim(spark, sf)
    val p = operators.ScaleOps.dppJoinOnly(spark, fact, dim)
      .queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruningexpression"),
      s"fact scan must carry a dynamic partition filter from the dim side:\n$p")
  }

  test("ANN re-rank runs the codegen'd L2 kernel, not an interpreted fold") {
    val df = SparkEntry.queries("sim_ann_pq")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("graft_vec_l2sq"),
      s"re-rank stage should score with VecL2Sq:\n${p.take(800)}")
    // and the kernel itself stays inside a codegen'd projection
    val solo = Tables.embeddings(spark, sf)
      .select(graft.functions.GraftFunctions.vec_l2sq(
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("d"))
    val sp = solo.queryExecution.executedPlan.toString
    assert(sp.contains("*(1)") || sp.contains("WholeStageCodegen"),
      s"VecL2Sq fell out of codegen:\n$sp")
  }

  test("cosine queries run the fused one-pass kernel inside codegen") {
    val p = plan("sim_bruteforce_topk")
    assert(p.contains("graft_vec_cosine"),
      s"cosine should be the fused kernel:\n${p.take(600)}")
    val solo = Tables.embeddings(spark, sf)
      .select(graft.functions.GraftFunctions.vec_cosine(
        org.apache.spark.sql.functions.col("embedding"),
        org.apache.spark.sql.functions.col("embedding")).as("c"))
    val sp = solo.queryExecution.executedPlan.toString
    assert(sp.contains("*(1)") || sp.contains("WholeStageCodegen"),
      s"VecCosine fell out of codegen:\n$sp")
  }

  test("text_boilerplate: discovery shuffles (source, fingerprint), never segment text") {
    val p = plan("text_boilerplate")
    assert(p.contains("graft_fingerprint64"), p.take(500))
    assert(!p.contains("Exchange hashpartitioning(seg#"),
      "segment text in shuffle key")
    // census and frequent-set sides broadcast; removal is not a shuffle join
    assert(p.contains("BroadcastExchange"), "census/frequent set should broadcast")
  }

  test("q_cms_freq: the d×w sketch broadcasts; no sort-merge join anywhere") {
    val p = plan("q_cms_freq")
    assert(p.contains("BroadcastExchange"), "sketch should broadcast to the probe side")
    assert(!p.contains("SortMergeJoin"),
      "a bounded-size sketch must never be a shuffle-join side")
  }

  test("q_triangle_count: two equi-joins, no cartesian/nested-loop closure") {
    val df = SparkEntry.queries("q_triangle_count")(spark, sf)
    df.count() // materialize through AQE
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"triangle closure fell back to a cross join:\n${p.take(800)}")
  }

  test("q_curriculum_order: global enumeration runs without any window operator") {
    val df = SparkEntry.queries("q_curriculum_order")(spark, sf)
    df.count()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"),
      "curriculum position must come from the range-partitioned sort, not a window")
  }

  test("q_equidepth_histogram: no single-partition window over the value sets") {
    val df = SparkEntry.queries("q_equidepth_histogram")(spark, sf)
    df.count()
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.SparkPlan
    def walk(pl: SparkPlan): Seq[SparkPlan] = {
      val extra = pl match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec        => Seq(q.plan)
        case _                        => Nil
      }
      pl +: (pl.children ++ extra).flatMap(walk)
    }
    // every WindowExec must be partitioned (the per-range local prefix)
    // except the ≤#partitions offset fold, whose input is the tiny pid agg
    val wins = walk(df.queryExecution.executedPlan).collect { case w: WindowExec => w }
    assert(wins.nonEmpty)
    val unpartitioned = wins.filter(_.partitionSpec.isEmpty)
    for (w <- unpartitioned) {
      val below = walk(w).collect {
        case h: org.apache.spark.sql.execution.aggregate.HashAggregateExec => h
      }
      assert(below.nonEmpty,
        "an unpartitioned window must only ever fold the per-range subtotals")
    }
  }

  test("r11 operators keep their claimed plan shapes") {
    // dedup_setsim: every build side (dfreq, sizes, cand, toks) is
    // corpus-proportional — a broadcast here is the 100 TB killer
    val setsim = plan("dedup_setsim")
    assert(!setsim.contains("BroadcastHashJoin"),
      "set-similarity join must not broadcast a corpus-proportional side")
    // q_assoc_rules: the rank gate must plan as TakeOrderedAndProject,
    // never a global sort of all rules
    assert(plan("q_assoc_rules").contains("TakeOrderedAndProject"))
    // q_concurrency: the order-span join is corpus ⋈ corpus —
    // shuffle-hash, not broadcast
    assert(!plan("q_concurrency").contains("BroadcastHashJoin"),
      "interval sweep must not broadcast the order side")
    // q_rfm: the three score joins are on corpus-proportional
    // distinct-value tables — shuffle-hash all three (the helper's
    // internal ≤256-row offsets broadcast is the one legitimate
    // broadcast in the plan)
    val rfm = plan("q_rfm")
    assert("ShuffledHashJoin".r.findAllIn(rfm).size >= 3,
      "RFM score joins must shuffle-hash, not broadcast the value tables")
  }

  test("r11 additions keep their claimed plan shapes") {
    // q_tail_index: top-(k+1) is a rank gate, never a global sort
    assert(plan("q_tail_index").contains("TakeOrderedAndProject"),
      "Hill top-k must plan as TakeOrderedAndProject")
    // q_recommend: the truncated item-item matrix broadcasts into the
    // basket fan-out join (catalog-sized, never corpus-sized)
    assert(plan("q_recommend").contains("BroadcastHashJoin"),
      "neighbor lists must broadcast into the basket join")
    // q_feature_backfill / q_churn_labels: ONE fused Window node (the
    // withColumn spelling interleaves Projects and defeats
    // CollapseWindow), one user-keyed exchange + the output sort's, and
    // no join in the plan at all. `(n) Op` detail headers count
    // physical nodes exactly once.
    for (q <- Seq("q_feature_backfill", "q_churn_labels")) {
      val p = plan(q)
      assert(!p.contains("Join"), s"$q must be join-free")
      assert("""\(\d+\) Window""".r.findAllIn(p).size == 1,
        s"$q window functions must collapse into one Window node")
      assert("""\(\d+\) Exchange""".r.findAllIn(p).size <= 2,
        s"$q should shuffle once for the window (+1 output sort)")
    }
    // q_mutual_info / q_chi_square: windows run on the CELL table —
    // the fact scan feeds exactly one aggregate
    assert(plan("q_chi_square").contains("Window"),
      "chi-square marginals are cell-table windows")
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

  test("q_bucketed_agg: the bucket-key aggregate runs with zero exchange") {
    val p = plan("q_bucketed_agg")
    val tree = p.split("\n\\(1\\) ").head // formatted tree section only
    val lines = tree.linesIterator.toVector
    val scanIdx = lines.indexWhere(_.contains("graft_li_bucketed"))
    assert(scanIdx > 0, s"bucketed scan missing:\n$tree")
    // walk up from the scan: the per-orderkey aggregate pair must appear
    // BEFORE any Exchange — the bucket layout satisfies the distribution
    val above = lines.take(scanIdx).reverse
    val firstExchange = above.indexWhere(_.contains("Exchange"))
    val aggsBefore = above.take(firstExchange).count(_.contains("HashAggregate"))
    assert(aggsBefore >= 2,
      s"per-orderkey agg should complete before the first Exchange:\n$tree")
  }

  test("r11 additions: scale-shape pins") {
    // top_supplier: the date filter reaches the scan; supplier dim broadcasts
    val ts = plan("q_top_supplier")
    assert(ts.contains("PushedFilters:") &&
      ts.contains("GreaterThanOrEqual(l_shipdate"), "shipdate not pushed")
    assert(ts.contains("BroadcastHashJoin"), "supplier dim should broadcast")
    // text_novelty: the gram dictionary anti-join is a SHUFFLED hash
    // join — a corpus-proportional dictionary must never broadcast
    val nv = plan("text_novelty")
    assert(nv.contains("ShuffledHashJoin") && nv.contains("LeftAnti"),
      s"novelty anti-join should shuffle-hash:\n${nv.take(800)}")
    // modularity: the pair-sized builds broadcast INTO the corpus-sized
    // doc dimension (never the reverse)
    assert(plan("q_modularity").contains("BroadcastHashJoin"))
    // joinsize sketch: both sides aggregate map-side before they meet
    val js = plan("q_joinsize_cms")
    assert("HashAggregate".r.findAllIn(js).size >= 4,
      "both CMS grids should partial-aggregate")
    // blocking: the O(w·corpus) candidate set meets the truth set in a
    // SHUFFLED hash join — a corpus-proportional relation must never
    // broadcast (the rank equi-join itself materializes inside the
    // localCheckpoint, so it is pinned by the replay spec, not here)
    val bl = plan("dedup_blocking")
    assert(bl.contains("ShuffledHashJoin"),
      s"truth⋈cand should shuffle-hash:\n${bl.take(600)}")
    assert(!bl.toLowerCase.contains("cartesianproduct"), "no cartesian")
  }

  // ---- DSv2 front door (r14): spark.read.format("graft") -----------------

  test("DSv2: filters push into the GraftScan and the delegate stays columnar") {
    import spark.implicits._
    val root = graft.operators.Maintenance.snapshotRoot(spark, sf)
    val df = spark.read.format("graft").option("versionAsOf", 2).load(root)
      .filter($"o_orderkey" > 100L).select($"o_orderkey", $"o_totalprice")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("GraftScan") && p.contains("version=2"), p.take(600))
    assert(p.contains("GreaterThan(o_orderkey,100)"),
      s"filter not pushed into the DSv2 scan:\n${p.take(600)}")
    // vectorized parquet delegation: batches arrive columnar
    assert(p.contains("ColumnarToRow"), s"delegate fell out of columnar:\n${p.take(600)}")
  }

  test("DSv2: zone maps skip file groups from pushed filters, values exact") {
    import spark.implicits._
    val zroot = graft.operators.Maintenance.zonemapRoot(spark, sf)
    val df = spark.read.format("graft").load(zroot)
      .filter($"o_orderdate" >= "1995-03-01" && $"o_orderdate" <= "1995-09-30")
    val desc = df.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("GraftScan")).getOrElse("")
    val m = """groups=(\d+)/(\d+) zoneSkipped=(\d+)""".r.findFirstMatchIn(desc)
    assert(m.isDefined, s"no group accounting in scan description: $desc")
    val (kept, total, skipped) =
      (m.get.group(1).toInt, m.get.group(2).toInt, m.get.group(3).toInt)
    assert(skipped > 0 && kept + skipped == total && kept < total,
      s"zone map should prune groups: $desc")
    // pruning is a pure superset optimization — the answer is exact
    val oracle = spark.read.parquet(s"$zroot/data")
      .filter($"o_orderdate" >= "1995-03-01" && $"o_orderdate" <= "1995-09-30")
      .count()
    assert(df.count() == oracle, "zone pruning changed the answer")
  }

  test("DSv2: column mapping translates pushed filters to physical names") {
    import spark.implicits._
    val (root, _) = graft.operators.Maintenance.columnMappingStore(spark, sf)
    val df = spark.read.format("graft").option("versionAsOf", 2).load(root)
      .filter($"price_usd" > 1000.0).select($"price_usd")
    assert(df.columns.sameElements(Array("price_usd")))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("mapping=v2"), p.take(600))
    assert(p.contains("GreaterThan(o_totalprice,1000.0)"),
      s"logical filter should push under its PHYSICAL name:\n${p.take(600)}")
  }
}
