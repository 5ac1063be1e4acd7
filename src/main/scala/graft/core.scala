package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** One engine capability exposed through the driver contract.
  *
  * @param name   key in `SparkEntry.queries` (and SURVEY.md §2)
  * @param fn     (session, sfDir) => result DataFrame
  * @param oracle equivalent DuckDB SQL over the same parquet tables; None
  *               for non-SQL-expressible ops (driver then does a weaker
  *               rows-only check)
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Loaders for the driver-generated test tables (TESTDATA.md). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** Canonical event-time columns regardless of the on-disk type of
    * `ts` — driver-generated data has shipped it as int64 nanos,
    * TIMESTAMP(NANOS) and TIMESTAMP(MICROS) across rounds. Output
    * layout is fixed: `ts_ns` (int64 epoch nanos, bit-exact with
    * DuckDB's `epoch_ns(ts)` under the UTC session) in the original
    * column position, plus a microsecond TimestampType `ts` appended
    * for event-time semantics (watermarks, window()).
    */
  def withEventTime(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, lit, timestamp_micros, unix_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    val nsExpr = df.schema("ts").dataType match {
      case LongType => col("ts") // legacy layout: already int64 nanos
      case _        => unix_micros(col("ts").cast(TimestampType)) * lit(1000L)
    }
    df.withColumn("ts", nsExpr.cast(LongType))
      .withColumnRenamed("ts", "ts_ns")
      .withColumn("ts", timestamp_micros(expr("ts_ns div 1000")))
  }

  /** Events with normalized event time (see [[withEventTime]]). */
  def events(s: SparkSession, d: String): DataFrame = {
    // harmless for micros data; required if the data reverts to nanos
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withEventTime(load(s, d, "events"))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Staging key for operators that persist a derived index under /tmp
    * (inverted index, ANN codebooks): full-path hash — two datasets
    * sharing a basename must not collide — plus a content fingerprint
    * from file metadata (name, size, mtime of every part of `table`),
    * so a regenerated dataset at the same path restages instead of
    * silently reusing a stale index. Pure driver-side file-metadata
    * arithmetic: no Spark job runs to answer "is the staging fresh?". */
  def stagingKey(d: String, table: String): (String, String) = {
    def walk(f: java.io.File): Seq[java.io.File] =
      if (f.isDirectory)
        Option(f.listFiles()).toSeq.flatten.sortBy(_.getName).flatMap(walk)
      else Seq(f)
    val abs = new java.io.File(d).getAbsolutePath
    val parts = walk(new java.io.File(abs, s"$table.parquet"))
    val content = parts
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}").mkString("|")
    val dirKey = f"${new java.io.File(d).getName}_${abs.hashCode & 0x7fffffff}%08x"
    (dirKey, f"${content.hashCode & 0x7fffffff}%08x-${parts.map(_.length).sum}")
  }
}

/** Shared helpers for oracle-exact arithmetic.
  *
  * The driver hash-compares our results against DuckDB. Double aggregation
  * order differs between engines (partial aggregates), so raw sum(double)
  * drifts in the low bits. Casting each row to DECIMAL(18,6) first makes
  * the sum exact and associative — the source doubles carry <=6 decimal
  * digits of true scale (TPC-H-style 2dp prices × 2dp rates), so the cast
  * is lossless and both engines round identically. Cast back to double at
  * the end so the output schema is a plain double on both sides.
  */
object OracleMath {
  /** Order-insensitive, engine-exact sum of a double expression. */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 6))).cast("double")

  /** Engine-exact average (decimal sum, then IEEE double division). */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** SQL fragment equivalents for the DuckDB oracle. */
  def sqlSum(expr: String): String =
    s"CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE)"
  def sqlAvg(expr: String): String =
    s"(CAST(SUM(CAST(($expr) AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*))"
}
