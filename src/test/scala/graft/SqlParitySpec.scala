package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** SQL front-end parity (SURVEY.md §2.2 #28): the engine's surface is
  * reachable through `spark.sql` over temp views — DataFrame results
  * and SQL results agree, and the custom graft functions are callable
  * from SQL after registration.
  */
class SqlParitySpec extends AnyFunSuite {
  import TestSession._

  private def viewsReady(): Unit =
    Tables.names.foreach { t =>
      if (t == "events") Tables.events(spark, sf).createOrReplaceTempView(t)
      else Tables.load(spark, sf, t).createOrReplaceTempView(t)
    }

  private def sameResult(df: DataFrame, sql: String): Unit = {
    val a = df.collect().map(_.toSeq).toSeq
    val b = spark.sql(sql).collect().map(_.toSeq).toSeq
    assert(a == b, s"DataFrame vs SQL mismatch for:\n$sql")
  }

  test("q1_agg via spark.sql matches the DataFrame plan") {
    viewsReady()
    sameResult(SparkEntry.queries("q1_agg")(spark, sf),
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  CAST(SUM(CAST(l_discount AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
  }

  test("join + top-k via spark.sql matches the DataFrame plan") {
    viewsReady()
    sameResult(SparkEntry.queries("q_topk")(spark, sf),
      """SELECT l_orderkey, l_linenumber, l_extendedprice
        |FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin)
  }

  test("deterministic HLL stays within its rated error (m=4096 => ~1.6% typical)") {
    import spark.implicits._
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = SparkEntry.queries("q_distinct")(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as_) = approx(flag)
      assert(math.abs(ap - p) / p < 0.1, s"$flag parts: approx $ap vs $p")
      assert(math.abs(as_ - s) / s < 0.1, s"$flag supps: approx $as_ vs $s")
    }
  }

  test("custom graft functions are callable from SQL") {
    viewsReady()
    graft.functions.GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT doc_id,
        |  graft_fingerprint64(text) AS fp,
        |  graft_simhash64(graft_shingles(text, 3)) AS sh,
        |  graft_minhash_sig(graft_shingles(text, 3), 8) AS mh
        |FROM documents ORDER BY doc_id LIMIT 5""".stripMargin).collect()
    assert(r.length == 5)
    assert(r.forall(row => row.getSeq[Long](3).length == 8))
    // SQL path and Column API path agree
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val api = Tables.documents(spark, sf)
      .select($"doc_id", graft.functions.GraftFunctions.fingerprint64(col("text")).as("fp"))
      .orderBy($"doc_id").limit(5).collect().map(x => (x.getLong(0), x.getLong(1)))
    assert(api.toSeq == r.map(x => (x.getLong(0), x.getLong(1))).toSeq)
    // zorder + vec_dot from SQL, agreeing with the direct implementations
    val z = spark.sql("SELECT graft_zorder64(3, 5) AS z, " +
      "graft_vec_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), " +
      "array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d").collect()(0)
    assert(z.getLong(0) == graft.functions.ZOrder64.interleave(3L, 5L))
    assert(z.getDouble(1) == 11.0)
  }

  test("graft_stopword_scores rejects bad SQL arguments at analysis time with clear messages") {
    graft.functions.GraftFunctions.register(spark)
    def analyzeError(sql: String): String = {
      val t = intercept[Throwable] { spark.sql(sql).queryExecution.analyzed }
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .flatMap(x => Option(x.getMessage)).mkString(" | ")
    }
    // non-literal list argument
    assert(analyzeError(
      "SELECT graft_stopword_scores(array('a'), CAST(rand() AS STRING))")
      .contains("literal string"))
    // NULL list
    assert(analyzeError(
      "SELECT graft_stopword_scores(array('a'), CAST(NULL AS STRING))")
      .contains("NULL"))
    // stray comma → empty token
    assert(analyzeError(
      "SELECT graft_stopword_scores(array('a'), 'the,,and')")
      .contains("empty stopword token"))
    // overlap across lists reports both argument positions
    val overlap = analyzeError(
      "SELECT graft_stopword_scores(array('a'), 'the,and', 'le,the')")
    assert(overlap.contains("'the'") && overlap.contains("disjoint"), overlap)
    // and the happy path still works
    val ok = spark.sql(
      "SELECT graft_stopword_scores(array('the','le','x'), 'the,and', 'le,la') AS s")
      .collect()(0).getSeq[Int](0)
    assert(ok == Seq(1, 1))
  }

  test("native as-of join is reachable from SQL and agrees with the DataFrame path") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val quotes = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("q_id", "q_ts", "q_val")
    val trades = Seq((1L, 15L), (1L, 25L), (2L, 3L), (3L, 9L))
      .toDF("t_id", "t_ts")
    trades.createOrReplaceTempView("sqlp_trades")
    quotes.createOrReplaceTempView("sqlp_quotes")
    val viaSql = spark.sql(
      """SELECT t_id, t_ts, q_val
        |FROM graft_asof_join('sqlp_trades', 'sqlp_quotes',
        |                     't_id', 'q_id', 't_ts', 'q_ts')
        |ORDER BY t_id, t_ts""".stripMargin)
    // the SQL plan actually uses the native exec (nodeName = "AsofJoin")
    assert(viaSql.queryExecution.executedPlan.toString.contains("AsofJoin "),
      viaSql.queryExecution.executedPlan.toString)
    val viaApi = graft.plans.Asof.join(trades, quotes, "t_id", "q_id", "t_ts", "q_ts")
      .select($"t_id", $"t_ts", $"q_val").orderBy($"t_id", $"t_ts")
    assert(viaSql.collect().toSeq == viaApi.collect().toSeq)
    // expected semantics: latest quote at-or-before each trade; no-match → null
    assert(viaApi.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq ==
      Seq((1L, 15L, "a"), (1L, 25L, "b"), (2L, 3L, null), (3L, 9L, null)))
  }

  test("as-of join rejects mismatched key/time types at plan time with a clear message") {
    import spark.implicits._
    val intKeys = Seq((1, 10L)).toDF("id", "ts")
    val longKeys = Seq((1L, 5L)).toDF("id", "ts")
    val ex = intercept[IllegalArgumentException] {
      graft.plans.Asof.join(intKeys, longKeys, "id", "id", "ts", "ts")
    }
    assert(ex.getMessage.contains("INT") && ex.getMessage.contains("BIGINT"),
      ex.getMessage)
    // same guard on the SQL path (planning time, not execution time);
    // TVF arguments resolve by name across BOTH inputs, so sides must
    // use distinct column names (alias in the view otherwise)
    graft.functions.GraftFunctions.register(spark)
    intKeys.createOrReplaceTempView("sqlp_int_keys")
    longKeys.toDF("lid", "lts").createOrReplaceTempView("sqlp_long_keys")
    val ex2 = intercept[Throwable] {
      spark.sql(
        """SELECT * FROM graft_asof_join('sqlp_int_keys', 'sqlp_long_keys',
          |                              'id', 'lid', 'ts', 'lts')""".stripMargin)
        .queryExecution.executedPlan
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(ex2).exists(m => m.contains("INT") && m.contains("BIGINT")),
      s"expected a type-mismatch message, got: ${messages(ex2)}")
  }

  test("round-4 operators are reachable via spark.sql with identical results") {
    viewsReady()
    sameResult(SparkEntry.queries("q_json_extract")(spark, sf),
      """SELECT event_type, COUNT(*) AS n,
        |  SUM(k) AS sum_k, MIN(k) AS min_k, MAX(k) AS max_k,
        |  COUNT(DISTINCT k) AS n_distinct_k
        |FROM (SELECT event_type, from_json(props, 'k BIGINT').k AS k FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin)
    sameResult(SparkEntry.queries("q_histogram")(spark, sf),
      """SELECT o_orderstatus, CAST(floor(o_totalprice / 50000.0) AS BIGINT) AS bucket,
        |  COUNT(*) AS n,
        |  CAST(floor(o_totalprice / 50000.0) AS BIGINT) * CAST(50000.0 AS DOUBLE) AS bucket_lo
        |FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, bucket""".stripMargin)
    sameResult(SparkEntry.queries("q_grouping_sets")(spark, sf),
      """SELECT l_returnflag, l_linestatus,
        |  grouping(l_returnflag) * 2 + grouping(l_linestatus) AS gid,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS n
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), (l_linestatus))
        |ORDER BY gid, l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin)
  }

  test("GraftExtensions wires every SQL function and the as-of TVF without register()") {
    import org.apache.spark.sql.SparkSession
    val orig = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.functions.GraftExtensions())
        .getOrCreate()
      assert(s2 ne orig, "extensions need a fresh session to bind")
      // scalar functions present via injection alone — including the ones
      // the hand-maintained list used to drop (zorder64, quantize_stats)
      val r = s2.sql(
        """SELECT graft_fingerprint64('') AS fp, graft_zorder64(3, 5) AS z,
          |  graft_quantize_stats(array(CAST(1.27 AS DOUBLE))).scale AS sc""".stripMargin)
        .collect()(0)
      assert(r.getLong(0) == 0xcbf29ce484222325L) // FNV-1a basis
      assert(r.getLong(1) == graft.functions.ZOrder64.interleave(3L, 5L))
      assert(math.abs(r.getDouble(2) - 0.01) < 1e-15)
      // the as-of TVF and its planner strategy ride the same hook
      import s2.implicits._
      Seq((1L, 15L)).toDF("t_id", "t_ts").createOrReplaceTempView("ext_trades")
      Seq((1L, 10L, "a")).toDF("q_id", "q_ts", "q_val").createOrReplaceTempView("ext_quotes")
      val asof = s2.sql(
        """SELECT t_id, q_val FROM graft_asof_join('ext_trades', 'ext_quotes',
          |  't_id', 'q_id', 't_ts', 'q_ts')""".stripMargin).collect()
      assert(asof.map(x => (x.getLong(0), x.getString(1))).toSeq == Seq((1L, "a")))
    } finally {
      SparkSession.setActiveSession(orig)
      SparkSession.setDefaultSession(orig)
    }
  }

  test("round-5 operators are reachable via spark.sql with identical results") {
    viewsReady()
    graft.functions.GraftFunctions.register(spark)
    sameResult(SparkEntry.queries("text_vocab")(spark, sf),
      """WITH toks AS (SELECT doc_id,
        |    explode(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')) AS tok
        |  FROM documents),
        |c AS (SELECT tok, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        |      FROM toks GROUP BY tok),
        |t AS (SELECT COUNT(*) AS total FROM toks)
        |SELECT tok, n, n_docs, CAST(n AS DOUBLE) / total AS coverage
        |FROM c CROSS JOIN t ORDER BY n DESC, tok LIMIT 40""".stripMargin)
    sameResult(SparkEntry.queries("q_rolling_agg")(spark, sf),
      """SELECT user_id, event_id, ts_ns div 1000 AS ts_us, value,
        |  COUNT(*) OVER w AS n_1h,
        |  CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS sum_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts_ns div 1000
        |  RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        |ORDER BY user_id, ts_us, event_id""".stripMargin)
    sameResult(SparkEntry.queries("q_validate_rows")(spark, sf),
      """WITH v AS (SELECT
        |    SUM(CASE WHEN COALESCE(l_discount <= 0.06, false) THEN 0L ELSE 1L END) AS v_discount_le_6pct,
        |    SUM(CASE WHEN COALESCE(l_extendedprice > 1000.0, false) THEN 0L ELSE 1L END) AS v_price_over_1000,
        |    SUM(CASE WHEN COALESCE(l_quantity BETWEEN 1.0 AND 50.0, false) THEN 0L ELSE 1L END) AS v_quantity_in_range,
        |    SUM(CASE WHEN COALESCE(l_tax < 0.05, false) THEN 0L ELSE 1L END) AS v_tax_below_5pct,
        |    COUNT(*) AS n_rows
        |  FROM lineitem)
        |SELECT rule, n_violations,
        |  CAST(n_violations AS DOUBLE) / n_rows AS violation_rate
        |FROM v
        |LATERAL VIEW stack(4,
        |  'discount_le_6pct', v_discount_le_6pct,
        |  'price_over_1000', v_price_over_1000,
        |  'quantity_in_range', v_quantity_in_range,
        |  'tax_below_5pct', v_tax_below_5pct) AS rule, n_violations
        |ORDER BY rule""".stripMargin)
    // the MG aggregate itself from SQL, verified exactly like the operator
    sameResult(SparkEntry.queries("q_heavy_hitters")(spark, sf),
      """WITH keyed AS (SELECT CASE WHEN l_orderkey % 4 < 2
        |    THEN concat('hot_', l_orderkey % 2)
        |    ELSE concat('cold_', l_orderkey % 1000) END AS k FROM lineitem),
        |s AS (SELECT graft_misra_gries(k, 9) AS mg, COUNT(*) AS total FROM keyed),
        |cand AS (SELECT explode(map_keys(mg)) AS k, total FROM s)
        |SELECT k.k AS k, COUNT(*) AS n, CAST(COUNT(*) AS DOUBLE) / any_value(c.total) AS share
        |FROM keyed k JOIN cand c ON k.k = c.k
        |GROUP BY k.k HAVING COUNT(*) * 10 > any_value(c.total)
        |ORDER BY k""".stripMargin)
  }

  test("round-5 batch-2 operators are reachable via spark.sql with identical results") {
    viewsReady()
    sameResult(SparkEntry.queries("q_funnel")(spark, sf),
      """WITH ev AS (SELECT user_id, event_type, ts_ns div 1000 AS ts_us FROM events),
        |v AS (SELECT user_id, MIN(ts_us) AS v_ts FROM ev
        |      WHERE event_type = 'view' GROUP BY user_id),
        |c AS (SELECT ev.user_id, MIN(ts_us) AS c_ts, any_value(v_ts) AS v_ts
        |      FROM ev JOIN v ON ev.user_id = v.user_id
        |      WHERE event_type = 'click' AND ts_us > v_ts GROUP BY ev.user_id),
        |p AS (SELECT ev.user_id, MIN(ts_us) AS p_ts, any_value(v_ts) AS v_ts
        |      FROM ev JOIN c ON ev.user_id = c.user_id
        |      WHERE event_type = 'purchase' AND ts_us > c_ts GROUP BY ev.user_id)
        |SELECT '1_view' AS stage, COUNT(*) AS n_users, 0L AS total_latency_us FROM v
        |UNION ALL SELECT '2_click', COUNT(*), SUM(c_ts - v_ts) FROM c
        |UNION ALL SELECT '3_purchase', COUNT(*), SUM(p_ts - v_ts) FROM p
        |ORDER BY stage""".stripMargin)
    sameResult(SparkEntry.queries("q_retention")(spark, sf),
      """WITH wk AS (SELECT DISTINCT user_id, ts_ns div 604800000000000L AS week
        |            FROM events),
        |co AS (SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id)
        |SELECT cohort_week, week - cohort_week AS week_offset,
        |       COUNT(DISTINCT wk.user_id) AS n_users
        |FROM wk JOIN co ON wk.user_id = co.user_id
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    sameResult(SparkEntry.queries("q_pack_sequences")(spark, sf),
      """WITH docs AS (SELECT source, doc_id,
        |    cast(size(split(lower(trim(regexp_replace(text, '\\s+', ' '))), ' ')) AS BIGINT) AS n
        |  FROM documents),
        |cum AS (SELECT source, doc_id, n,
        |  COALESCE(SUM(n) OVER (PARTITION BY source ORDER BY doc_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0L) AS cum
        |  FROM docs WHERE n > 0),
        |pieces AS (SELECT source, doc_id, n, cum,
        |    explode(sequence(cum div 256, (cum + n - 1) div 256)) AS seq_id
        |  FROM cum)
        |SELECT source, seq_id, COUNT(*) AS n_docs,
        |  SUM(least((seq_id + 1) * 256, cum + n) - greatest(seq_id * 256, cum)) AS n_tokens
        |FROM pieces GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
    sameResult(SparkEntry.queries("q_collate_group")(spark, sf),
      """WITH c AS (SELECT CASE WHEN c_custkey % 2 = 0 THEN upper(c_mktsegment)
        |    ELSE lower(c_mktsegment) END AS seg, c_acctbal FROM customer)
        |SELECT collate(lower(collate(seg, 'UTF8_LCASE')), 'UTF8_BINARY') AS segment,
        |  COUNT(*) AS n,
        |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE) AS sum_bal
        |FROM c GROUP BY collate(seg, 'UTF8_LCASE') ORDER BY segment""".stripMargin)
  }

  test("every driver-contract query key is documented in SURVEY.md §2") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val missing = SparkEntry.queries.keySet.filterNot(survey.contains)
    assert(missing.isEmpty,
      s"queries missing from the SURVEY.md inventory: $missing")
  }
}
