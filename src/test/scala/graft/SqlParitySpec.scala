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

  test("approx_count_distinct stays within its rated error") {
    import spark.implicits._
    val approx = SparkEntry.queries("q_approx_distinct")(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = SparkEntry.queries("q_distinct")(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    exact.foreach { case (flag, (p, s)) =>
      val (ap, as_) = approx(flag)
      assert(math.abs(ap - p).toDouble / p < 0.1, s"$flag parts: approx $ap vs $p")
      assert(math.abs(as_ - s).toDouble / s < 0.1, s"$flag supps: approx $as_ vs $s")
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

  test("every driver-contract query key is documented in SURVEY.md §2") {
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val missing = SparkEntry.queries.keySet.filterNot(survey.contains)
    assert(missing.isEmpty,
      s"queries missing from the SURVEY.md inventory: $missing")
  }
}
