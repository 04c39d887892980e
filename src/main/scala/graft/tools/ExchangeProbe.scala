package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the DISTINCT hash-exchange lines of a named
  * query's COLD executed plan (fresh cache, no execution) — the exact
  * view PlanAudit's exchange allowance is derived from. Usage:
  * runMain graft.tools.ExchangeProbe <queryName> [sfDir]
  */
object ExchangeProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.tune(spark)
    spark.catalog.clearCache()
    val plan = graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString
    val ex = plan.linesIterator
      .filter(_.contains("Exchange hashpartitioning"))
      .map(_.dropWhile(c => !c.isLetter)).toSeq
    val distinct = ex.toSet.toSeq.sorted
    println(s"[exch] $name: total=${ex.size} distinct=${distinct.size}")
    distinct.zipWithIndex.foreach { case (l, i) =>
      println(f"[exch] ${i + 1}%2d ${l.take(240)}")
    }
    spark.stop()
  }
}
