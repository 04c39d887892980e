package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** Read/write connectors.
  *
  * All readers take an explicit schema — at 100 TB, schema inference is
  * both a full extra pass over the data and a correctness hazard
  * (per-file drift). Writers default to snappy parquet; `partitionedBy`
  * gives hive-style partition pruning for downstream readers, and
  * `bucketedBy` persists a co-located layout so repeated joins/aggs on
  * the bucket key skip the shuffle entirely.
  */
object Connectors {

  def readParquet(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).parquet(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read.schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .csv(path)

  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def writeParquet(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).parquet(path)

  def writeCsv(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite, header: Boolean = true): Unit =
    df.write.mode(mode).option("header", header.toString).csv(path)

  def writeJson(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).json(path)

  /** Line-delimited text — the raw-corpus interchange format. `df`
    * must be a single string column; one row per line. */
  def writeText(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).text(path)

  def readText(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  def writeOrc(df: DataFrame, path: String,
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).orc(path)

  /** Avro container files — see [[AvroConnector]] for why this rides
    * the Avro core API rather than a `format("avro")` datasource. */
  def readAvro(spark: SparkSession, path: String, schema: StructType): DataFrame =
    AvroConnector.readAvro(spark, path, schema)

  def writeAvro(df: DataFrame, path: String): Unit =
    AvroConnector.writeAvro(df, path)

  /** JDBC read (warehouse loads). Exercised end-to-end against the
    * embedded Derby engine (on the Spark classpath) by
    * `src_jdbc_roundtrip`. */
  def readJdbc(spark: SparkSession, url: String, table: String,
      props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Partitioned JDBC read — the scale path: N executors each issue a
    * range-bounded query on `partCol` instead of one connection
    * streaming the whole table through the driver. */
  def readJdbcPartitioned(spark: SparkSession, url: String, table: String,
      partCol: String, lower: Long, upper: Long, numParts: Int,
      props: java.util.Properties): DataFrame =
    spark.read.jdbc(url, table, partCol, lower, upper, numParts, props)

  def writeJdbc(df: DataFrame, url: String, table: String,
      props: java.util.Properties, mode: SaveMode = SaveMode.Append): Unit =
    df.write.mode(mode).jdbc(url, table, props)

  /** Hive-style partitioned layout: readers filtering on `cols` prune
    * whole directories before any IO. */
  def writePartitioned(df: DataFrame, path: String, cols: Seq[String],
      mode: SaveMode = SaveMode.Overwrite): Unit =
    df.write.mode(mode).partitionBy(cols: _*).parquet(path)

  /** Bucketed table: co-locates rows by key so joins/aggregations on the
    * bucket key are shuffle-free across jobs. Requires a table name
    * (metastore-backed), not a bare path. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCol: Option[String] = None): Unit = {
    val w = df.write.mode(SaveMode.Overwrite).bucketBy(nBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).format("parquet").saveAsTable(table)
  }
}
