package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-5 batch 2: event-sequence analytics (funnel, retention),
  * training-mix planning (sequence packing, mixture weights), lake
  * merge-on-read deletes, collation-aware grouping, and the
  * redelivery-dedup stream — each on crafted inputs with hand-computed
  * answers.
  */
class BehavioralSpec extends AnyFunSuite {
  import TestSession._

  /** Stage crafted (event_id, ts_ns, user_id, event_type) events under a
    * temp sf-dir shaped like testdata. */
  private def eventsDir(rows: Seq[(Long, Long, Long, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_behav_ev").toString
    rows.toDF("event_id", "ts", "user_id", "event_type")
      .withColumn("value", lit(1.0))
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  /** Stage crafted (doc_id, source, text) documents under a temp sf-dir. */
  private def docsDir(rows: Seq[(Long, String, String)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_behav_doc").toString
    rows.toDF("doc_id", "source", "text")
      .withColumn("lang", lit("en"))
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def toks(prefix: String, n: Int): String =
    (0 until n).map(i => s"$prefix$i").mkString(" ")

  test("q_funnel: stage order is strict — click before view doesn't convert") {
    import spark.implicits._
    val us = 1000L // 1 microsecond in ns
    val dir = eventsDir(Seq(
      // user 1: full ordered funnel (click +1us, purchase +2us after view)
      (1L, 1 * us, 1L, "view"), (2L, 2 * us, 1L, "click"), (3L, 3 * us, 1L, "purchase"),
      // user 2: click BEFORE view — must not count as converted
      (4L, 1 * us, 2L, "click"), (5L, 2 * us, 2L, "view"),
      // user 3: purchase without click — funnel stops at view
      (6L, 1 * us, 3L, "view"), (7L, 2 * us, 3L, "purchase"),
      // user 4: click at the SAME instant as view — strictly-after fails
      (8L, 1 * us, 4L, "view"), (9L, 1 * us, 4L, "click")))
    val out = SparkEntry.queries("q_funnel")(spark, dir)
      .as[(String, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("1_view", 4L, 0L), ("2_click", 1L, 1L), ("3_purchase", 1L, 2L)))
  }

  test("q_retention: cohort = first week, offsets count distinct returning users") {
    import spark.implicits._
    val wk = 7L * 86400L * 1000L * 1000L * 1000L
    val dir = eventsDir(Seq(
      // user 1: cohort week 0, active weeks 0, 1, 3
      (1L, 0 * wk + 5, 1L, "view"), (2L, 1 * wk + 5, 1L, "view"),
      (3L, 3 * wk + 5, 1L, "view"),
      // two events same week — still ONE distinct user-week
      (4L, 0 * wk + 9, 1L, "click"),
      // user 2: cohort week 1, active weeks 1, 2
      (5L, 1 * wk + 5, 2L, "view"), (6L, 2 * wk + 5, 2L, "view")))
    val out = SparkEntry.queries("q_retention")(spark, dir)
      .as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      (0L, 0L, 1L), (0L, 1L, 1L), (0L, 3L, 1L),
      (1L, 0L, 1L), (1L, 1L, 1L)))
  }

  test("q_pack_sequences: concat-and-split fills every non-final sequence exactly") {
    import spark.implicits._
    // budget 256; source s: 100 + 200 + 30 tokens. Doc 2 spans the
    // boundary: 156 tokens close sequence 0 at exactly 256, 44 spill
    // into sequence 1, which doc 3 then joins. Source t packs alone.
    val dir = docsDir(Seq(
      (1L, "s", toks("a", 100)), (2L, "s", toks("b", 200)),
      (3L, "s", toks("c", 30)), (4L, "t", toks("d", 10))))
    val out = SparkEntry.queries("q_pack_sequences")(spark, dir)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("s", 0L, 2L, 256L), ("s", 1L, 2L, 74L), ("t", 0L, 1L, 10L)))
  }

  test("q_mixture_weights: cap binds on rare sources, masses stay exact") {
    import spark.implicits._
    // tokens 10 / 100 / 1000; uniform target = 370 each. Sources a and
    // b would need >2x upsampling — the cap binds; c is downsampled.
    val dir = docsDir(Seq(
      (1L, "a", toks("a", 10)), (2L, "b", toks("b", 100)),
      (3L, "c", toks("c", 1000))))
    val out = SparkEntry.queries("q_mixture_weights")(spark, dir)
      .as[(String, Long, Long, Double, Double, Double)].collect().toSeq
    val byS = out.map(r => r._1 -> r).toMap
    assert(byS("a")._5 == 2.0 && byS("b")._5 == 2.0, "cap must bind on a and b")
    assert(byS("c")._5 == 1110.0 / 3000.0)
    // effective masses 60 / 600 / 1110 (in source-count-ths), sum 1770
    assert(byS("a")._6 == 60.0 / 1770.0)
    assert(byS("b")._6 == 600.0 / 1770.0)
    assert(byS("c")._6 == 1110.0 / 1770.0)
    assert(math.abs(out.map(_._6).sum - 1.0) < 1e-12)
    // rebalancing direction: rare sources gain share, dominant loses
    assert(byS("a")._6 > byS("a")._4 && byS("c")._6 < byS("c")._4)
  }

  test("zstd writes measurably smaller parquet than snappy, same content") {
    val (zstd, snappy) = operators.ScaleOps.zstdDirs(spark, sf)
    def bytes(dir: String) = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".parquet")).map(_.length()).sum
    val (zb, sb) = (bytes(zstd), bytes(snappy))
    info(s"zstd=$zb bytes, snappy=$sb bytes (${100 - zb * 100 / sb}% smaller)")
    assert(zb < sb, s"zstd ($zb) must beat snappy ($sb) on this corpus")
    // identical logical content
    assert(spark.read.parquet(zstd).exceptAll(spark.read.parquet(snappy)).isEmpty)
  }

  test("dynamic partition overwrite rewrites only the touched partition") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_dynov").toString
    val orders = Tables.orders(spark, sf)
    orders.write.mode("overwrite").partitionBy("o_orderpriority").parquet(root)
    def filesByPartition: Map[String, Map[String, Long]] =
      new java.io.File(root).listFiles().filter(_.isDirectory).map { p =>
        p.getName -> p.listFiles().filter(_.getName.endsWith(".parquet"))
          .map(f => f.getName -> f.lastModified).toMap
      }.toMap
    val before = filesByPartition
    Thread.sleep(50)
    val prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try orders.filter($"o_orderpriority" === "1-URGENT")
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(root)
    finally spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)
    val after = filesByPartition
    val urgent = "o_orderpriority=1-URGENT"
    assert(after(urgent) != before(urgent), "touched partition must be rewritten")
    for ((p, fs) <- before if p != urgent)
      assert(after(p) == fs, s"untouched partition $p must keep its exact files")
    // and the table still holds every partition's rows
    assert(spark.read.parquet(root).count() == orders.count())
  }

  test("io_deletion_vectors: delete rewrites no data, DV stays tiny, read subtracts") {
    import spark.implicits._
    val root = operators.Maintenance.dvRoot(spark, sf)
    def files(sub: String) = new java.io.File(s"$root/$sub").listFiles()
      .filter(_.getName.endsWith(".parquet"))
    val baseRows = spark.read.parquet(s"$root/base").count()
    val deleted = spark.read.parquet(s"$root/base")
      .filter(expr("l_quantity >= 49.0")).count()
    val dv = spark.read.parquet(s"$root/dv")
    assert(dv.count() == deleted, "DV lists exactly the deleted positions")
    assert(dv.select($"file_path").distinct().count() > 1,
      "delete touches several files — CoW would have rewritten them all")
    // merge-on-read: base minus DV == predicate filter, row for row
    val mor = operators.Maintenance.readWithDv(spark, root)
    assert(mor.count() == baseRows - deleted)
    assert(mor.filter(expr("l_quantity >= 49.0")).count() == 0)
    // the whole point: the DV sidecar is a sliver of the data size
    val baseBytes = files("base").map(_.length()).sum
    val dvBytes = files("dv").map(_.length()).sum
    assert(dvBytes < baseBytes / 10,
      s"DV must be far smaller than the data it deletes from ($dvBytes vs $baseBytes)")
  }

  test("q_collate_group: UTF8_LCASE grouping folds case without a shadow column") {
    import spark.implicits._
    val out = SparkEntry.queries("q_collate_group")(spark, sf)
    // output schema is engine-neutral plain string (collation cast away)
    assert(out.schema("segment").dataType == org.apache.spark.sql.types.StringType)
    val got = out.select($"segment", $"n").as[(String, Long)].collect().toMap
    val want = Tables.customer(spark, sf)
      .groupBy(lower($"c_mktsegment").as("seg")).count()
      .as[(String, Long)].collect().toMap
    assert(got == want, "collated grouping must equal explicit lower() grouping")
    assert(got.keys.forall(k => k == k.toLowerCase))
  }

  test("q_fuzzy_join: deletion neighborhoods find every edit-1 pair, nothing more") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_fuzzy").toString
    val names = Seq(
      "abcde",  // base
      "abXde",  // substitution (middle)       -> matches abcde
      "Xbcde",  // substitution (first char)   -> matches abcde
      "abcdX",  // substitution (last char)    -> matches abcde
      "abcdef", // insertion at end            -> matches abcde
      "bcde",   // deletion of first char      -> matches abcde
      "abdc0",  // transposition = levenshtein 2: must NOT match abcde
      "zzzzz")  // far away
    names.zipWithIndex
      .map { case (n, i) => (i.toLong * 7, n) } // every key passes % 7 = 0
      .toDF("c_custkey", "c_name")
      .withColumn("c_nationkey", lit(1)).withColumn("c_acctbal", lit(0.0))
      .withColumn("c_mktsegment", lit("S"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val got = SparkEntry.queries("q_fuzzy_join")(spark, dir)
      .as[(String, String)].collect().toSet
    // ground truth by brute force
    def lev(a: String, b: String): Int = {
      val m = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
      for (i <- 1 to a.length; j <- 1 to b.length)
        m(i)(j) = math.min(math.min(m(i - 1)(j) + 1, m(i)(j - 1) + 1),
          m(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      m(a.length)(b.length)
    }
    val want = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 1
    } yield (a, b)).toSet
    assert(got == want, s"got $got, want $want")
    assert(want.contains(("abcde", "abcdef")) && want.contains(("abcde", "bcde")),
      "crafted cases must actually exercise insertion and deletion")
  }

  test("q_gap_fill: every hour in the span appears, gaps forward-fill") {
    import spark.implicits._
    val hr = 3600L * 1000 * 1000 * 1000
    val dir = eventsDir(Seq(
      // user 1: hours 10 (two events) and 13 (one) — 11, 12 are gaps
      (1L, 10 * hr + 5, 1L, "view"), (2L, 10 * hr + 9, 1L, "view"),
      (3L, 13 * hr + 5, 1L, "view"),
      // user 2: single hour — span of one, nothing to fill
      (4L, 20 * hr + 5, 2L, "view")))
    val out = SparkEntry.queries("q_gap_fill")(spark, dir)
      .as[(Long, Long, Long, Boolean, Double)].collect().toSeq
    assert(out == Seq(
      (1L, 10L, 2L, false, 2.0), // value=1.0 per event, dsum = 2.0
      (1L, 11L, 0L, true, 2.0),  // gap: carries hour 10's running value
      (1L, 12L, 0L, true, 2.0),
      (1L, 13L, 1L, false, 1.0),
      (2L, 20L, 1L, false, 1.0)))
  }

  test("text_lm_score: repeated bigrams score high, novel text scores low") {
    import spark.implicits._
    // docs 1 and 2 share every bigram ("a b", "b c"); doc 3 is all-novel
    val dir = docsDir(Seq(
      (1L, "s", "a b c"), (2L, "s", "a b c"), (3L, "s", "x y z")))
    val out = SparkEntry.queries("text_lm_score")(spark, dir)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // shared bigrams each appear 4x in the corpus (2 docs x 2 bigrams
    // counted per occurrence: "a b" in doc1 + doc2 = count 2; mass per
    // doc = 2 + 2 = 4 over 2 bigrams -> familiarity 2.0; novel doc = 1.0
    assert(out == Seq((1L, 2L, 4L, 2.0), (2L, 2L, 4L, 2.0), (3L, 2L, 2L, 1.0)))
  }

  test("stream_funnel: conversions emit on purchase, state carries across batches") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    // whole-table replay equals the batch funnel's converted-user set
    val streamed = SparkEntry.queries("stream_funnel")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSeq
    Tables.events(spark, sf).createOrReplaceTempView("events")
    val batch = spark.sql(
      """WITH ev AS (SELECT user_id, event_type, ts_ns div 1000 AS ts_us FROM events),
        |v AS (SELECT user_id, MIN(ts_us) AS v_ts FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT ev.user_id, MIN(ts_us) AS c_ts, any_value(v_ts) AS v_ts
        |      FROM ev JOIN v ON ev.user_id = v.user_id
        |      WHERE event_type = 'click' AND ts_us > v_ts GROUP BY ev.user_id),
        |p AS (SELECT ev.user_id, MIN(ts_us) AS p_ts, any_value(c_ts) AS c_ts,
        |             any_value(v_ts) AS v_ts
        |      FROM ev JOIN c ON ev.user_id = c.user_id
        |      WHERE event_type = 'purchase' AND ts_us > c_ts GROUP BY ev.user_id)
        |SELECT user_id, v_ts, c_ts, p_ts FROM p ORDER BY user_id""".stripMargin)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(streamed == batch, "streamed conversions must equal the batch funnel")
    // state carry: view / click / purchase arrive in three separate
    // micro-batches; the conversion may only emit in the LAST batch
    val us = 1000L
    val dir = java.nio.file.Files.createTempDirectory("graft_funnel_slices").toFile
    Seq(
      Seq((1L, 1 * us, 1L, "view"), (2L, 1 * us, 2L, "view")),
      Seq((3L, 2 * us, 1L, "click"), (4L, 2 * us, 2L, "purchase")), // u2: no click
      Seq((5L, 3 * us, 1L, "purchase"))).foreach { rows =>
      rows.toDF("event_id", "ts", "user_id", "event_type")
        .withColumn("value", lit(1.0)).withColumn("props", lit("{}"))
        .coalesce(1).write.mode("append").parquet(dir.getPath)
      Thread.sleep(100) // distinct mtimes → deterministic file order
    }
    val schema = spark.read.parquet(dir.getPath).schema
    val evs = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(dir.getPath)
      .withColumnRenamed("ts", "ts_ns")
      .select($"user_id", $"ts_ns", $"event_id", $"event_type")
      .as[streaming.Streaming.FEv]
    val q = streaming.Streaming.funnelDs(evs)
      .writeStream.format("memory").queryName("graft_funnel_slices")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val out = spark.table("graft_funnel_slices")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 1L, 2L, 3L)),
      s"user 1 converts across three batches, user 2 must not (purchase w/o click): $out")
  }

  test("stream_dedup_watermark: redelivered file adds zero rows, state evicts") {
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    import spark.implicits._
    // the staged dir replays events.parquet TWICE; output must equal the
    // single-copy table exactly
    val out = SparkEntry.queries("stream_dedup_watermark")(spark, sf)
    val evN = Tables.events(spark, sf).count()
    assert(out.count() == evN, "each redelivered event emitted exactly once")
    assert(out.select($"event_id").distinct().count() == evN)
    // eviction probe: short delay → the heartbeat's watermark passes
    // every event_id's (event time + delay) and the store ends EMPTY —
    // the bounded-state property the NoTimeout flatMapGroups dedup
    // (stream_dedup) deliberately trades away
    val (dir, hbNs) = streaming.Streaming.stageRedelivered(spark, sf)
    val q = streaming.Streaming.redeliveryDedupStream(spark, dir, hbNs, delay = "1 hour")
      .writeStream.format("memory").queryName("graft_dedup_wm_probe")
      .outputMode(OutputMode.Append()).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val stateRows = q.recentProgress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateRows.nonEmpty && stateRows.max > 0,
      "dedup keys must pass through the state store")
    assert(stateRows.last == 0,
      s"redelivery-horizon state must evict at end of replay, got ${stateRows.toSeq}")
  }
}
