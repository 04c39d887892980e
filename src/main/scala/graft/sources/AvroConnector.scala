package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.FsInput
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.net.URI
import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._

/** Avro container-file connector built directly on the Avro core API.
  *
  * The environment ships avro-1.12 but not the spark-avro datasource
  * module, so `format("avro")` is unavailable; this connector supplies
  * the same lake-interchange capability through the distributed
  * imperative seam instead: the writer runs one `DataFileWriter` per
  * partition inside `foreachPartition`, and the reader parallelizes the
  * file list and streams each file through a `DataFileReader` inside
  * `flatMap`. All paths go through the Hadoop `FileSystem` API — the
  * connector works against any FS Hadoop can mount (`file:`, HDFS,
  * object stores), not just a driver-local disk, and each executor
  * resolves the filesystem from the path URI + its own site config.
  *
  * Write commit protocol: each task writes to a task-attempt-unique
  * temp file under `_temporary/` and RENAMEs it to the final
  * `part-NNNNN.avro` on success (rename is atomic on HDFS/posix). A
  * speculative or retried attempt that loses the race deletes its temp
  * file and leaves the winner's committed output intact — the
  * interleaved-writes hazard of writing final names directly from
  * executors cannot occur.
  *
  * Schema mapping covers the flat lake types (long/int/double/float/
  * boolean/string/binary) plus ARRAYS of them (`array<float>`
  * embeddings roundtrip — see src_avro_embeddings), nullable via the
  * standard `["null", T]` union, and the three LOGICAL types every
  * warehouse Avro feed carries (see src_avro_logical):
  *  - decimal(p, s) → `bytes` + `decimal` logical type: the unscaled
  *    two's-complement big-endian integer, scale carried by the
  *    schema (the Avro spec's decimal encoding);
  *  - date → `int` + `date` logical type (days since epoch);
  *  - timestamp → `long` + `timestamp-micros` logical type.
  */
object AvroConnector {

  private def avroBase(dt: DataType): Schema = dt match {
    case LongType => Schema.create(Schema.Type.LONG)
    case IntegerType => Schema.create(Schema.Type.INT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case StringType => Schema.create(Schema.Type.STRING)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case TimestampType =>
      val s = Schema.create(Schema.Type.LONG)
      org.apache.avro.LogicalTypes.timestampMicros().addToSchema(s)
    case DateType =>
      val s = Schema.create(Schema.Type.INT)
      org.apache.avro.LogicalTypes.date().addToSchema(s)
    case dt: DecimalType =>
      val s = Schema.create(Schema.Type.BYTES)
      org.apache.avro.LogicalTypes.decimal(dt.precision, dt.scale).addToSchema(s)
    case ArrayType(elem, containsNull) =>
      val e = avroBase(elem)
      Schema.createArray(
        if (containsNull) Schema.createUnion(Schema.create(Schema.Type.NULL), e) else e)
    case other =>
      throw new IllegalArgumentException(s"avro connector: unsupported type $other")
  }

  private def avroSchema(schema: StructType, record: String): Schema = {
    val fields = SchemaBuilder.record(record).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val base = avroBase(f.dataType)
      // null is only a valid default for the ["null", T] union; a
      // non-nullable field must declare no default or Avro throws at
      // schema build time.
      if (f.nullable)
        fs.name(f.name)
          .`type`(Schema.createUnion(Schema.create(Schema.Type.NULL), base))
          .withDefault(null)
      else fs.name(f.name).`type`(base).noDefault()
    }.endRecord()
  }

  /** Spark value → Avro datum for the declared Catalyst type
    * (recursive for arrays). */
  private def toAvro(v: Any, dt: DataType): AnyRef = (v, dt) match {
    case (null, _) => null
    case (ts: java.sql.Timestamp, _) =>
      java.lang.Long.valueOf(ts.getTime * 1000 + (ts.getNanos / 1000) % 1000)
    case (d: java.sql.Date, DateType) => // Avro date = days since epoch
      java.lang.Integer.valueOf(d.toLocalDate.toEpochDay.toInt)
    case (bd: java.math.BigDecimal, t: DecimalType) =>
      // Avro decimal: unscaled two's-complement big-endian bytes at the
      // SCHEMA's scale (rescale defensively — Spark rows normally carry
      // the column scale already, and setScale at the same scale is a
      // no-op; a genuine mismatch must not silently shift the point)
      ByteBuffer.wrap(
        bd.setScale(t.scale, java.math.RoundingMode.UNNECESSARY)
          .unscaledValue().toByteArray)
    case (b: Array[Byte], _) => ByteBuffer.wrap(b)
    case (xs: scala.collection.Seq[_], ArrayType(elem, _)) =>
      xs.map(toAvro(_, elem)).asJava
    case (x, _) => x.asInstanceOf[AnyRef]
  }

  /** Avro datum → Spark value for the declared Catalyst type. */
  private def fromAvro(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (v, StringType) => v.toString
    case (v: ByteBuffer, t: DecimalType) =>
      val b = new Array[Byte](v.remaining()); v.get(b)
      new java.math.BigDecimal(new java.math.BigInteger(b), t.scale)
    case (v: ByteBuffer, BinaryType) =>
      val b = new Array[Byte](v.remaining()); v.get(b); b
    case (v: java.lang.Long, TimestampType) =>
      java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
        v / 1000000L, (v % 1000000L) * 1000))
    case (v: java.lang.Integer, DateType) =>
      java.sql.Date.valueOf(java.time.LocalDate.ofEpochDay(v.longValue()))
    case (v: java.util.Collection[_], ArrayType(elem, _)) =>
      v.asScala.map(fromAvro(_, elem)).toSeq
    case (v, _) => v
  }

  /** New FileSystem handle for `path`, from the executor-local Hadoop
    * site config (core-site.xml etc. ride the executor classpath on a
    * real cluster; a fresh Configuration resolves `file:` locally). */
  private def fsFor(path: String): (FileSystem, Configuration) = {
    val conf = new Configuration()
    (FileSystem.get(URI.create(path), conf), conf)
  }

  def writeAvro(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val (fs0, _) = fsFor(path)
    fs0.mkdirs(new Path(path))
    val avroJson = avroSchema(sparkSchema, "row").toString
    df.rdd.foreachPartition { it =>
      val tc = TaskContext.get()
      val pid = tc.partitionId()
      val (fs, _) = fsFor(path)
      val finalPath = new Path(path, f"part-$pid%05d.avro")
      // task-attempt-unique temp name → no two attempts ever write the
      // same file; the rename below is the commit point
      val tmpPath = new Path(path,
        f"_temporary/part-$pid%05d-attempt-${tc.taskAttemptId()}%d.avro")
      val schema = new Schema.Parser().parse(avroJson)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, fs.create(tmpPath, true))
      var committed = false
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            rec.put(i, toAvro(row.get(i), sparkSchema(i).dataType))
            i += 1
          }
          writer.append(rec)
        }
        writer.close()
        // commit: first attempt to finish wins; a losing speculative
        // attempt finds the final file present and discards its temp
        if (!fs.exists(finalPath) && fs.rename(tmpPath, finalPath)) committed = true
      } finally {
        if (!committed) { try writer.close() catch { case _: Throwable => () } }
        if (fs.exists(tmpPath)) fs.delete(tmpPath, false)
      }
    }
    // drop the (now-empty) temp dir so readers listing *.avro never race
    val (fsEnd, _) = fsFor(path)
    fsEnd.delete(new Path(path, "_temporary"), true)
  }

  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val (fs, _) = fsFor(path)
    val files = fs.listStatus(new Path(path))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".avro"))
      .map(_.getPath.toString)
      .sorted
    val fields = schema.fields
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(1, files.length))
      .flatMap { f =>
        val (_, conf) = fsFor(f)
        val reader = new DataFileReader[GenericRecord](
          new FsInput(new Path(f), conf), new GenericDatumReader[GenericRecord]())
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          while (reader.hasNext) {
            val rec = reader.next()
            out += Row.fromSeq(fields.indices.map { i =>
              fromAvro(rec.get(fields(i).name), fields(i).dataType)
            })
          }
        } finally reader.close()
        out
      }
    spark.createDataFrame(rows, schema)
  }
}
