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
    // beyond (name, size, mtime): a sample of each file's LAST bytes —
    // the parquet footer, which carries the row-group metadata and so
    // changes whenever the data does. Catches a regeneration that
    // lands on identical size + mtime (coarse-mtime filesystems).
    def tailSample(f: java.io.File): Int = {
      val n = math.min(64L, f.length).toInt
      if (n == 0) return 0
      val buf = new Array[Byte](n)
      val raf = new java.io.RandomAccessFile(f, "r")
      try { raf.seek(f.length - n); raf.readFully(buf) } finally raf.close()
      java.util.Arrays.hashCode(buf)
    }
    val content = parts
      .map(f => s"${f.getName}:${f.length}:${f.lastModified}:${tailSample(f)}")
      .mkString("|")
    val dirKey = f"${new java.io.File(d).getName}_${abs.hashCode & 0x7fffffff}%08x"
    (dirKey, f"${content.hashCode & 0x7fffffff}%08x-${parts.map(_.length).sum}")
  }
}

/** Staging discipline shared by the operators that persist a derived
  * index under /tmp/graft_q (ANN codebooks/codes, inverted-index
  * postings, BM25 postings): content-fingerprinted freshness
  * ([[Tables.stagingKey]]), build-in-temp + swap publish, a recorded
  * source per staged dir, and retention (vacuum) of dead dirs.
  *
  * Publish: builders write every part into a private temp dir and
  * [[publish]] swaps it into the final path — a crashed build never
  * leaves a half-written index at the served location, and the
  * torn-read window shrinks from the whole training run to the swap
  * itself. (True multi-writer atomicity would version the published
  * dirs and flip a pointer; the sequential driver doesn't need it and
  * retention keeps the simpler layout.)
  *
  * Retention: every published dir records its source dataset + table +
  * content fingerprint. [[vacuum]] deletes dirs whose dataset is gone
  * or whose fingerprint no longer matches the current files — the
  * io_vacuum rule applied to the engine's own staging. Builders call
  * it on every staging miss (cold builds are already paying a corpus
  * pass; the vacuum walk is driver-side file metadata only).
  */
object Staging {
  val Base = "/tmp/graft_q"
  /** Prefixes of content-fingerprinted stage-once dirs (the per-query
    * tmp() scratch dirs have their own lifecycle and are not walked).
    * private[graft]: the crypto-parity spec walks the same list. */
  private[graft] val Kinds = Seq("ann_", "annb_", "annr_", "lex_", "index_", "mm_", "pairs_", "epairs_", "nbrs_", "ssink_", "rbdata_", "mordata_", "srestart_", "hyb_", "cpdata_", "pidata_", "occdata_", "bpe_", "gsink_")
  private val SourceFile = "staging_source.txt"

  /** Spec instrumentation: dirs deleted by the last vacuum. */
  private[graft] val lastVacuumed = new java.util.concurrent.atomic.AtomicInteger(0)

  def tempBuildDir(): java.io.File = {
    val f = new java.io.File(Base, s".build_${java.util.UUID.randomUUID}")
    f.mkdirs()
    f
  }

  private[graft] def rmTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(rmTree))
    f.delete(); ()
  }

  /** Swap a fully-built temp dir into the final root (replacing any
    * stale version), then record its source for retention. */
  def publish(temp: java.io.File, root: String,
      d: String, table: String, fp: String): Unit = {
    val dst = new java.io.File(root)
    if (dst.exists()) rmTree(dst)
    java.nio.file.Files.move(temp.toPath, dst.toPath)
    recordSource(root, d, table, fp)
  }

  /** Record (or backfill, on a warm hit from an older layout) where a
    * staged dir came from — what vacuum() needs to decide liveness. */
  def recordSource(root: String, d: String, table: String, fp: String): Unit = {
    val abs = new java.io.File(d).getAbsolutePath
    java.nio.file.Files.write(
      java.nio.file.Paths.get(root, SourceFile),
      s"$abs\n$table\n$fp".getBytes("UTF-8"))
    ()
  }

  /** Delete staged index dirs that can never be served again: their
    * recorded dataset no longer exists, or its current content
    * fingerprint no longer matches the one staged. Dirs without a
    * source record (older layouts, foreign dirs) are left alone.
    * Also reaps crashed temp builds older than an hour. */
  def vacuum(): Int = {
    val dirs = Option(new java.io.File(Base).listFiles()).getOrElse(Array.empty)
    var removed = 0
    dirs.foreach { dir =>
      val name = dir.getName
      if (name.startsWith(".build_")) {
        if (System.currentTimeMillis - dir.lastModified > 3600L * 1000) {
          rmTree(dir); removed += 1
        }
      } else if (Kinds.exists(name.startsWith)) {
        val src = new java.io.File(dir, SourceFile)
        if (src.exists()) {
          val lines = new String(
            java.nio.file.Files.readAllBytes(src.toPath), "UTF-8").split("\n", -1)
          if (lines.length >= 3) {
            val (d, table, fp) = (lines(0), lines(1), lines(2))
            val live = new java.io.File(d, s"$table.parquet").exists() &&
              Tables.stagingKey(d, table)._2 == fp
            if (!live) { rmTree(dir); removed += 1 }
          }
        }
      }
    }
    lastVacuumed.set(removed)
    removed
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
