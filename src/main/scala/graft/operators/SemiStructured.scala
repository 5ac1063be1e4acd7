package graft.operators

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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

  val defs: Seq[QueryDef] = Seq(
    QueryDef("q_json_extract", jsonExtract, Some(jsonExtractSql)),
    QueryDef("q_profile_stats", profile, Some(profileSql)),
    QueryDef("q_histogram", histogram, Some(histogramSql)),
    QueryDef("q_key_skew", keySkew, Some(keySkewSql)),
  )
}
