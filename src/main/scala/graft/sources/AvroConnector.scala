package graft.sources

import org.apache.avro.{Schema, SchemaBuilder}
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import java.io.File
import java.nio.ByteBuffer

/** Avro container-file connector built directly on the Avro core API.
  *
  * The environment ships avro-1.12 but not the spark-avro datasource
  * module, so `format("avro")` is unavailable; this connector supplies
  * the same lake-interchange capability through the distributed
  * imperative seam instead: the writer runs one `DataFileWriter` per
  * partition inside `foreachPartition` (one container file per task —
  * the standard output layout), and the reader parallelizes the file
  * list and streams each file through a `DataFileReader` inside
  * `flatMap`. Only the file LISTING touches the driver; all record IO
  * is executor-side, so the shape holds on a 1000-executor cluster
  * (with paths routed through the cluster filesystem).
  *
  * Schema mapping covers the flat lake types (long/int/double/float/
  * boolean/string/binary/timestamp-micros), nullable via the standard
  * `["null", T]` union.
  */
object AvroConnector {

  private def avroSchema(schema: StructType, record: String): Schema = {
    val fields = SchemaBuilder.record(record).namespace("graft").fields()
    schema.fields.foldLeft(fields) { (fs, f) =>
      val base: Schema = f.dataType match {
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
        case other =>
          throw new IllegalArgumentException(s"avro connector: unsupported type $other")
      }
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

  def writeAvro(df: DataFrame, path: String): Unit = {
    val sparkSchema = df.schema
    val dir = new File(path)
    dir.mkdirs()
    val avroJson = avroSchema(sparkSchema, "row").toString
    df.rdd.foreachPartition { it =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val schema = new Schema.Parser().parse(avroJson)
      val writer = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      writer.create(schema, new File(dir, f"part-$pid%05d.avro"))
      try {
        it.foreach { row =>
          val rec = new GenericData.Record(schema)
          var i = 0
          while (i < sparkSchema.length) {
            val v = row.get(i) match {
              case null => null
              case ts: java.sql.Timestamp =>
                java.lang.Long.valueOf(ts.getTime * 1000 + (ts.getNanos / 1000) % 1000)
              case b: Array[Byte] => ByteBuffer.wrap(b)
              case x => x.asInstanceOf[AnyRef]
            }
            rec.put(i, v)
            i += 1
          }
          writer.append(rec)
        }
      } finally writer.close()
    }
  }

  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val files = Option(new File(path).listFiles())
      .getOrElse(Array.empty)
      .filter(_.getName.endsWith(".avro"))
      .map(_.getAbsolutePath)
      .sorted
    val fields = schema.fields
    val rows = spark.sparkContext
      .parallelize(files.toIndexedSeq, math.max(1, files.length))
      .flatMap { f =>
        val reader = new DataFileReader[GenericRecord](
          new File(f), new GenericDatumReader[GenericRecord]())
        val out = scala.collection.mutable.ArrayBuffer.empty[Row]
        try {
          while (reader.hasNext) {
            val rec = reader.next()
            out += Row.fromSeq(fields.indices.map { i =>
              (rec.get(fields(i).name), fields(i).dataType) match {
                case (null, _) => null
                case (v, StringType) => v.toString
                case (v: ByteBuffer, BinaryType) =>
                  val b = new Array[Byte](v.remaining()); v.get(b); b
                case (v: java.lang.Long, TimestampType) =>
                  java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(
                    v / 1000000L, (v % 1000000L) * 1000))
                case (v, _) => v
              }
            })
          }
        } finally reader.close()
        out
      }
    spark.createDataFrame(rows, schema)
  }
}
