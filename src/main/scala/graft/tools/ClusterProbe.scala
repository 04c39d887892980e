package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev probe: time dedup_cluster_assign in isolation (cold then warm)
  * and report per-call wall-clock. Usage: runMain graft.tools.ClusterProbe [sfDir] */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.tune(spark)
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries("dedup_cluster_assign")(spark, dir).count()
      println(f"[cluster] run $i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
