package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import graft.operators.Maintenance

/** `SELECT * FROM graft.` + "`<store>$history`" — the DESCRIBE HISTORY
  * metadata table (Delta's `HISTORY` / Iceberg's `.history`): one row
  * per committed snapshot version, computed ENTIRELY from manifest
  * arithmetic on the driver (no data file is listed or opened):
  *
  *  - `version`        committed manifest version
  *  - `commit_epoch`   from `commits_ts.txt` when present, else NULL
  *  - `n_data_groups`  data file groups live at the version
  *  - `n_dv_lines`     deletion-vector sidecars live (MoR debt)
  *  - `n_zoned_groups` groups carrying committed `zone:` stats
  *
  * The history rows are materialized at PLANNING time and shipped
  * inside the single input partition — history is O(versions), the one
  * store artifact that is always driver-small. Encrypted stores work
  * transparently (the manifest reader decrypts); a tampered manifest
  * fails the query closed like any other read.
  */
private[sources] class GraftHistoryTable(root: String) extends Table
    with SupportsRead {
  override def name(): String = s"graft-history:$root"
  override def schema(): StructType = GraftHistoryTable.Schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new GraftHistoryScan(root)
    }
}

private[sources] object GraftHistoryTable {
  val Schema: StructType = StructType(Seq(
    StructField("version", IntegerType, nullable = false),
    StructField("commit_epoch", LongType, nullable = true),
    StructField("n_data_groups", IntegerType, nullable = false),
    StructField("n_dv_lines", IntegerType, nullable = false),
    StructField("n_zoned_groups", IntegerType, nullable = false)))

  /** One (version, epoch?, data, dv, zoned) tuple per committed
    * version — driver-side manifest arithmetic. */
  def rows(root: String): Seq[(Int, Option[Long], Int, Int, Int)] = {
    val epochs: Map[Int, Long] =
      if (!new java.io.File(root, "commits_ts.txt").exists()) Map.empty
      else Maintenance.readStoreText(root, "commits_ts.txt")
        .split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
        .map { l => val Array(v, t) = l.split("=", 2); v.toInt -> t.toLong }
        .toMap
    val versions = Option(new java.io.File(root).listFiles())
      .getOrElse(Array.empty).map(_.getName)
      .filter(n => n.startsWith("manifest_v") && n.endsWith(".txt"))
      .map(_.stripPrefix("manifest_v").stripSuffix(".txt").toInt)
      .sorted.toSeq
    versions.map { v =>
      val (dv, data) = Maintenance.manifestPaths(root, v)
        .partition(_.startsWith("dv:"))
      val zoned = Maintenance.manifestZones(root, v).map(_._1).distinct.size
      (v, epochs.get(v), data.size, dv.size, zoned)
    }
  }
}

private[sources] class GraftHistoryScan(root: String) extends Scan with Batch {
  override def readSchema(): StructType = GraftHistoryTable.Schema
  override def toBatch: Batch = this
  override def description(): String = s"GraftHistoryScan $root"

  override def planInputPartitions(): Array[InputPartition] =
    Array(GraftHistoryPartition(GraftHistoryTable.rows(root)))

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val it = p.asInstanceOf[GraftHistoryPartition].rows.iterator
        new PartitionReader[InternalRow] {
          private var cur: InternalRow = _
          override def next(): Boolean =
            if (!it.hasNext) false
            else {
              val (v, e, d, dv, z) = it.next()
              cur = InternalRow(v, e.map(Long.box).orNull, d, dv, z)
              true
            }
          override def get(): InternalRow = cur
          override def close(): Unit = ()
        }
      }
    }
}

private[sources] case class GraftHistoryPartition(
    rows: Seq[(Int, Option[Long], Int, Int, Int)]) extends InputPartition
