package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Z-order layout write + data-skipping read: the consumer side of
  * `etl_zorder_plan` (operators/Etl.scala). The writer lays the table
  * out into 64 z-ordered files (hive directories `file_id=NN`) and
  * emits the per-file bounding-box manifest alongside; the reader
  * CONSULTS that manifest — a 2-D box predicate prunes every file
  * whose bounding box misses the box before any data IO, which is the
  * whole point of z-ordering: because z-neighbors are close in BOTH
  * dimensions, per-file boxes are tight in both keys, so 2-D
  * predicates skip files a single-column sort order cannot.
  *
  * Scale shape: the layout is row-local bit math + one partitioned
  * write (no global sort); the manifest is one row per file —
  * bookkeeping the driver can hold at any corpus size (a 100 TB table
  * at 1 GiB files is ~10⁵ manifest rows). Pruning happens via a
  * partition-column `isin` filter, so Spark's partition pruning skips
  * the directories without listing their contents.
  */
object ZorderLayout {

  final val NumFiles = 64

  private def bucket(c: org.apache.spark.sql.Column, lo: Double, hi: Double) =
    least(lit(255), floor((c - lit(lo)) * 256.0 / lit(hi - lo))).cast(IntegerType)

  /** Interleave the low 8 bits of (xb, yb) — identical bit order to
    * etl_zorder_plan's oracle. */
  private def zval(xb: org.apache.spark.sql.Column, yb: org.apache.spark.sql.Column) =
    (0 until 8).map(i =>
      shiftleft(shiftright(xb, i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftright(yb, i).bitwiseAND(lit(1)), 2 * i))
      .reduce(_ + _)

  /** Write `df` z-ordered on (xCol, yCol) under `path`: data in
    * `path/data/file_id=NN` plus the per-file min/max manifest at
    * `path/_zmanifest`. */
  def writeZordered(df: DataFrame, path: String, xCol: String, yCol: String): Unit = {
    val mm = df.agg(
      min(col(xCol)).cast("double"), max(col(xCol)).cast("double"),
      min(col(yCol)).cast("double"), max(col(yCol)).cast("double")).head()
    val (xLo, xHi, yLo, yHi) =
      (mm.getDouble(0), mm.getDouble(1), mm.getDouble(2), mm.getDouble(3))
    val z = df
      .withColumn("zbx", bucket(col(xCol).cast("double"), xLo, xHi))
      .withColumn("zby", bucket(col(yCol).cast("double"), yLo, yHi))
      .withColumn("file_id",
        (zval(col("zbx"), col("zby")) / lit(1024)).cast(IntegerType))
      .drop("zbx", "zby")
      .persist() // one layout pass feeds both the data write and the manifest
    z.write.partitionBy("file_id").parquet(s"$path/data")
    z.groupBy(col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol)).cast("double").as("min_x"),
        max(col(xCol)).cast("double").as("max_x"),
        min(col(yCol)).cast("double").as("min_y"),
        max(col(yCol)).cast("double").as("max_y"))
      .coalesce(1)
      .write.parquet(s"$path/_zmanifest")
    z.unpersist()
  }

  /** Data-skipping read of the 2-D box [xLo, xHi] × [yLo, yHi]: files
    * whose manifest bounding box misses the query box are pruned
    * BEFORE any data IO. Returns the candidate rows — a SUPERSET of
    * the box (per-file boxes overlap its edges); the caller applies
    * the exact predicate, the skipping is what saves the IO. */
  def readBox(spark: SparkSession, path: String,
      xLo: Double, xHi: Double, yLo: Double, yHi: Double): DataFrame = {
    val ids = spark.read.parquet(s"$path/_zmanifest")
      .filter(col("max_x") >= xLo && col("min_x") <= xHi &&
        col("max_y") >= yLo && col("min_y") <= yHi)
      .select(col("file_id"))
      .collect().map(_.getInt(0)) // ≤ one row per file: driver bookkeeping
    spark.read.parquet(s"$path/data")
      .where(col("file_id").isin(ids.map(Integer.valueOf).toSeq: _*))
  }
}
