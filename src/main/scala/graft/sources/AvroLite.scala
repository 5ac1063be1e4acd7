package graft.sources

import org.apache.avro.{LogicalTypes, Schema}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.hadoop.mapreduce.{Job, TaskAttemptContext}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.execution.datasources.{FileFormat, OutputWriter, OutputWriterFactory, PartitionedFile}
import org.apache.spark.sql.sources.{DataSourceRegister, Filter}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Minimal Avro data source — the streaming-interchange format the lake
  * was missing (CSV/JSON/ORC/parquet are covered by ScaleOps). The
  * environment ships the Avro core library but not the spark-avro
  * module, so this is a first-party `FileFormat` on top of
  * `org.apache.avro` directly — the same V1 integration surface
  * spark-avro itself uses, which buys the whole FileSourceScanExec
  * machinery for free: distributed planning, file listing/packing into
  * splits, partition-value appending, and column PRUNING (Avro is
  * row-major so pruning saves decode, not IO — only requested fields
  * are converted to Catalyst values).
  *
  * Scope: the flat scalar subset the analytics tables use — long, int,
  * double, float, boolean, string, date (int + `date` logical type),
  * timestamp (long + `timestamp-micros`), each nullable via
  * union(null, T). Container files are written one per task (Avro sync
  * markers would support finer splits; whole-file splits keep the
  * reader simple and files are task-sized by construction).
  */
object AvroLite {
  val Namespace = "graft.avro"

  def toAvroSchema(st: StructType, name: String = "row"): Schema = {
    val fields = new java.util.ArrayList[Schema.Field]()
    st.fields.foreach { f =>
      val base = f.dataType match {
        case LongType => Schema.create(Schema.Type.LONG)
        case IntegerType => Schema.create(Schema.Type.INT)
        case DoubleType => Schema.create(Schema.Type.DOUBLE)
        case FloatType => Schema.create(Schema.Type.FLOAT)
        case BooleanType => Schema.create(Schema.Type.BOOLEAN)
        case StringType => Schema.create(Schema.Type.STRING)
        case DateType =>
          LogicalTypes.date().addToSchema(Schema.create(Schema.Type.INT))
        case TimestampType =>
          LogicalTypes.timestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case TimestampNTZType =>
          LogicalTypes.localTimestampMicros().addToSchema(Schema.create(Schema.Type.LONG))
        case other => throw new IllegalArgumentException(
          s"graft-avro does not support ${other.sql} (column ${f.name})")
      }
      if (f.nullable)
        fields.add(new Schema.Field(f.name,
          Schema.createUnion(Schema.create(Schema.Type.NULL), base),
          null, Schema.Field.NULL_DEFAULT_VALUE))
      else fields.add(new Schema.Field(f.name, base, null, null.asInstanceOf[Object]))
    }
    Schema.createRecord(name, null, Namespace, false, fields)
  }

  def toSparkSchema(s: Schema): StructType = {
    def unwrap(fs: Schema): (Schema, Boolean) =
      if (fs.getType == Schema.Type.UNION) {
        val nonNull = fs.getTypes.stream().filter(_.getType != Schema.Type.NULL)
          .findFirst().orElseThrow()
        (nonNull, true)
      } else (fs, false)
    StructType(s.getFields.stream().map[StructField] { f =>
      val (base, nullable) = unwrap(f.schema())
      val dt = (base.getType, Option(base.getLogicalType).map(_.getName)) match {
        case (Schema.Type.LONG, Some("timestamp-micros")) => TimestampType
        case (Schema.Type.LONG, Some("local-timestamp-micros")) => TimestampNTZType
        case (Schema.Type.LONG, _) => LongType
        case (Schema.Type.INT, Some("date")) => DateType
        case (Schema.Type.INT, _) => IntegerType
        case (Schema.Type.DOUBLE, _) => DoubleType
        case (Schema.Type.FLOAT, _) => FloatType
        case (Schema.Type.BOOLEAN, _) => BooleanType
        case (Schema.Type.STRING, _) => StringType
        case (t, _) => throw new IllegalArgumentException(
          s"graft-avro does not support Avro type $t (field ${f.name})")
      }
      StructField(f.name, dt, nullable)
    }.collect(java.util.stream.Collectors.toList[StructField]).toArray(Array.empty[StructField]))
  }

  /** Catalyst internal value → Avro generic value for one field. */
  def toAvroValue(row: InternalRow, i: Int, dt: DataType): AnyRef =
    if (row.isNullAt(i)) null
    else dt match {
      case LongType | TimestampType | TimestampNTZType =>
        java.lang.Long.valueOf(row.getLong(i))
      case IntegerType | DateType => java.lang.Integer.valueOf(row.getInt(i))
      case DoubleType => java.lang.Double.valueOf(row.getDouble(i))
      case FloatType => java.lang.Float.valueOf(row.getFloat(i))
      case BooleanType => java.lang.Boolean.valueOf(row.getBoolean(i))
      case StringType => row.getUTF8String(i).toString
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }

  /** Avro generic value → Catalyst internal value. */
  def toCatalystValue(v: AnyRef, dt: DataType): Any =
    if (v == null) null
    else dt match {
      case StringType => UTF8String.fromString(v.toString)
      case LongType | TimestampType | TimestampNTZType =>
        v.asInstanceOf[java.lang.Long].longValue()
      case IntegerType | DateType => v.asInstanceOf[java.lang.Integer].intValue()
      case DoubleType => v.asInstanceOf[java.lang.Double].doubleValue()
      case FloatType => v.asInstanceOf[java.lang.Float].floatValue()
      case BooleanType => v.asInstanceOf[java.lang.Boolean].booleanValue()
      case other => throw new IllegalArgumentException(s"unsupported $other")
    }
}

class AvroLiteFileFormat extends FileFormat with DataSourceRegister with Serializable {
  override def shortName(): String = "graft-avro"
  override def toString: String = "GraftAvro"

  override def inferSchema(spark: SparkSession, options: Map[String, String],
      files: Seq[FileStatus]): Option[StructType] =
    files.headOption.map { f =>
      val in = new FsInput(f.getPath, spark.sessionState.newHadoopConf())
      try {
        val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
        try AvroLite.toSparkSchema(reader.getSchema) finally reader.close()
      } finally in.close()
    }

  override def prepareWrite(spark: SparkSession, job: Job,
      options: Map[String, String], dataSchema: StructType): OutputWriterFactory =
    new OutputWriterFactory {
      override def getFileExtension(context: TaskAttemptContext): String = ".avro"
      override def newInstance(path: String, dataSchema: StructType,
          context: TaskAttemptContext): OutputWriter =
        new AvroLiteOutputWriter(path, dataSchema, context)
    }

  override def buildReader(spark: SparkSession, dataSchema: StructType,
      partitionSchema: StructType, requiredSchema: StructType,
      filters: Seq[Filter], options: Map[String, String],
      hadoopConf: org.apache.hadoop.conf.Configuration)
      : PartitionedFile => Iterator[InternalRow] = {
    val required = requiredSchema.fields.map(f => (f.name, f.dataType))
    // executors rebuild a default Configuration — local/default-FS paths
    // only, which is all run_class/local-mode uses; a cluster deploy
    // would thread the serialized job conf through here instead
    (file: PartitionedFile) => {
      val conf = new org.apache.hadoop.conf.Configuration()
      val in = new FsInput(file.toPath, conf)
      val reader = DataFileReader.openReader(in, new GenericDatumReader[GenericRecord]())
      var closed = false
      def closeOnce(): Unit = if (!closed) { closed = true; reader.close(); in.close() }
      // an early-terminated scan (LIMIT, failed task) never drains the
      // iterator, so the drain-time close below is only a fast path —
      // task completion is the guaranteed close, as in Spark's built-in
      // file formats
      Option(org.apache.spark.TaskContext.get())
        .foreach(_.addTaskCompletionListener[Unit](_ => closeOnce()))
      val it = new Iterator[InternalRow] {
        override def hasNext: Boolean = {
          val h = !closed && reader.hasNext
          if (!h) closeOnce()
          h
        }
        override def next(): InternalRow = {
          val rec = reader.next()
          val vals = new Array[Any](required.length)
          var i = 0
          while (i < required.length) {
            vals(i) = AvroLite.toCatalystValue(
              rec.get(required(i)._1).asInstanceOf[AnyRef], required(i)._2)
            i += 1
          }
          new GenericInternalRow(vals)
        }
      }
      it
    }
  }
}

class AvroLiteOutputWriter(val path: String, dataSchema: StructType,
    context: TaskAttemptContext) extends OutputWriter {
  private val avroSchema = AvroLite.toAvroSchema(dataSchema)
  private val fieldTypes = dataSchema.fields.map(_.dataType)
  private val fieldNames = dataSchema.fields.map(_.name)
  private val writer = {
    val p = new Path(path)
    val os = p.getFileSystem(context.getConfiguration).create(p, false)
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](avroSchema))
    w.create(avroSchema, os)
  }

  override def write(row: InternalRow): Unit = {
    val rec = new GenericData.Record(avroSchema)
    var i = 0
    while (i < fieldTypes.length) {
      rec.put(fieldNames(i), AvroLite.toAvroValue(row, i, fieldTypes(i)))
      i += 1
    }
    writer.append(rec)
  }

  override def close(): Unit = writer.close()
}
