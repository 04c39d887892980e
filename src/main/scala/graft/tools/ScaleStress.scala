package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scale evidence beyond the fixed test SFs: synthesize a lineitem-like
  * fact of N rows (deterministic, generated distributed via
  * `spark.range` — no driver materialization), then run the headline
  * aggregation/join/window shapes and report rows/sec.
  *
  * Usage: runMain graft.tools.ScaleStress [nRows] (default 20M)
  */
object ScaleStress {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.driver.memory", "8g")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.tune(spark)

    val fact = spark.range(n).select(
      (col("id") % 1500000L).as("orderkey"),
      (col("id") % 200000L).as("partkey"),
      (col("id") % 100L).as("suppkey"),
      (pmod(hash(col("id")), lit(50)) + 1).cast(DoubleType).as("quantity"),
      (pmod(hash(col("id"), lit(1)), lit(100000)) / 100.0 + 1.0).as("price"),
      (pmod(hash(col("id"), lit(2)), lit(11)) / 100.0).as("discount"),
      concat(lit("F"), pmod(col("id"), lit(3))).as("flag"))
    val dim = spark.range(100).select(
      col("id").as("s_suppkey"), concat(lit("SUP_"), col("id")).as("s_name"))

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val rows = f
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[stress] $label: $sec%.2f s  (${n / sec / 1e6}%.1f M input rows/s, $rows result rows)")
    }

    // warm the generator path once
    fact.filter(col("flag") === "F0").agg(count(lit(1))).head()

    time("filtered group-agg (q1 shape)") {
      fact.filter(col("discount") <= 0.05)
        .groupBy(col("flag"))
        .agg(sum(col("quantity").cast(DecimalType(18, 2))).as("sq"),
          sum((col("price") * (lit(1) - col("discount"))).cast(DecimalType(18, 4))).as("rev"),
          count(lit(1)).as("cnt"))
        .count()
    }
    time("broadcast dim join + agg (q6 shape)") {
      fact.join(broadcast(dim), col("suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum((col("price") * (lit(1) - col("discount"))).cast(DecimalType(18, 4))).as("rev"))
        .count()
    }
    time("shuffle agg on high-card key (orderkey)") {
      fact.groupBy(col("orderkey"))
        .agg(sum(col("quantity").cast(DecimalType(18, 2))).as("sq"))
        .count()
    }
    time("window topk per group (q7 shape)") {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("suppkey")).orderBy(col("price").desc, col("orderkey").asc)
      fact.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10).count()
    }
    spark.stop()
  }
}
