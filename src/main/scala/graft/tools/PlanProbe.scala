package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: time a named query cold/warm and dump its executed plan.
  * Usage: runMain graft.tools.PlanProbe <queryName> [sfDir] */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val noBc = args.contains("-nobc") // hinted-broadcast-only view (audit pass 2)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)
    if (noBc) spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val fn = graft.SparkEntry.queries(name)
    def once(label: String): Unit = {
      val t0 = System.nanoTime(); fn(spark, dir).count()
      println(f"[probe] $name $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    if (!noBc) { once("cold"); once("warm") }
    println(fn(spark, dir).queryExecution.executedPlan.treeString)
    spark.stop()
  }
}
