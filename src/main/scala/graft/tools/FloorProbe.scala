package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import java.util.concurrent.atomic.{AtomicInteger, LongAdder}

/** Dev utility: decompose a query's WARM wall-clock into the
  * driver-floor components the bench's single number hides —
  *   plan  = DataFrame construction + analysis + optimization +
  *           physical planning (executedPlan forced, nothing run)
  *   exec  = the count() action (AQE stage rounds + task execution)
  *   jobs/stages/tasks = scheduling rounds inside exec
  *   task  = summed task duration (the tenancy-independent metric)
  * so "wall ≫ task" splits into Catalyst cost vs sequential
  * stage-materialization latency. Same environment as graft.Bench
  * (master/partitions/tune, warmup pass first).
  * Usage: runMain graft.tools.FloorProbe <q1,q2,...|top=N> [sfDir]
  */
object FloorProbe {
  private final class Counts extends SparkListener {
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new LongAdder
    var enabled = false
    override def onJobStart(j: SparkListenerJobStart): Unit =
      if (enabled) jobs.incrementAndGet()
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
      if (enabled) { stages.incrementAndGet(); tasks.addAndGet(sc.stageInfo.numTasks) }
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (enabled && te.taskInfo != null) taskMs.add(te.taskInfo.duration)
  }

  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 1) args(1) else
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.GraftSession.tune(spark)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v) })
    val names = args(0).split(",").toSeq
    val c = new Counts
    spark.sparkContext.addSparkListener(c)
    println(f"${"query"}%-28s ${"cons"}%7s ${"plan"}%7s ${"exec"}%7s " +
      f"${"wall"}%7s ${"task"}%7s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s")
    for (name <- names) {
      val fn = graft.SparkEntry.queries(name)
      try fn(spark, dir).count() catch { case _: Throwable => () } // warmup
      // timed pass, decomposed
      val t0 = System.nanoTime()
      val df = fn(spark, dir) // construction (incl. any eager loop jobs)
      val tC = System.nanoTime()
      val _ = df.queryExecution.executedPlan // force plan, pre-AQE
      val t1 = System.nanoTime()
      c.jobs.set(0); c.stages.set(0); c.tasks.set(0); c.taskMs.reset()
      c.enabled = true
      df.count()
      val t2 = System.nanoTime()
      try {
        val bus = spark.sparkContext.getClass.getMethod("listenerBus")
          .invoke(spark.sparkContext)
        bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
      } catch { case _: Throwable => Thread.sleep(1500) }
      c.enabled = false
      val cons = (tC - t0) / 1e9; val plan = (t1 - tC) / 1e9
      val exec = (t2 - t1) / 1e9
      println(f"$name%-28s $cons%7.3f $plan%7.3f $exec%7.3f " +
        f"${cons + plan + exec}%7.3f " +
        f"${c.taskMs.sum / 1e3}%7.3f ${c.jobs.get}%5d ${c.stages.get}%5d " +
        f"${c.tasks.get}%6d")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
