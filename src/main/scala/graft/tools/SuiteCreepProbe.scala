package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Root-cause instrumentation for in-suite vs solo bench drift on one
  * query (the r12 verdict's embedding_cluster_eval ask): counts the
  * STAGES and TASKS each pass actually runs, solo and after replaying
  * the exact bench-order prefix of queries that precede the target in
  * `SparkEntry.queries` iteration order (the order Bench.scala runs).
  *
  * Discriminates the two hypotheses the wall clock cannot:
  *  - recompute (cache interaction): the in-suite timed pass runs MORE
  *    stages than the solo timed pass — some persisted/shared relation
  *    is being re-derived;
  *  - JVM-state noise (GC/JIT/code-cache from hundreds of prior
  *    queries): stage counts match, only the wall differs.
  *
  * Usage: runMain graft.tools.SuiteCreepProbe [query] [sfDir] [nPrefix]
  * nPrefix = -1 (default) replays every preceding query; 0 = solo only.
  */
object SuiteCreepProbe {
  def main(args: Array[String]): Unit = {
    val target = if (args.nonEmpty) args(0) else "embedding_cluster_eval"
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val nPrefix = if (args.length > 2) args(2).toInt else -1
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.GraftSession.tune(spark)

    val stages = new AtomicInteger(0)
    val tasks = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(sc.stageInfo.numTasks.toLong)
      }
    })

    val fn = graft.SparkEntry.queries(target)
    def pass(label: String): Unit = {
      // drain in-flight listener events so the counters are per-pass
      Thread.sleep(400) // let the listener bus drain (private API)
      stages.set(0); tasks.set(0L)
      val t0 = System.nanoTime()
      fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(400) // let the listener bus drain (private API)
      println(f"[creep] $target $label: wall=$wall%.3f s " +
        f"stages=${stages.get()} tasks=${tasks.get()}")
    }

    println(s"[creep] === SOLO (fresh JVM) ===")
    pass("warmup"); pass("timed1"); pass("timed2")
    spark.catalog.clearCache()

    if (nPrefix != 0) {
      // the exact bench order: SparkEntry.queries iteration order
      val order = graft.SparkEntry.queries.toSeq
      val idx = order.indexWhere(_._1 == target)
      val prefix = order.take(idx).map(_._1)
      val replay = if (nPrefix < 0) prefix else prefix.takeRight(nPrefix)
      println(s"[creep] === PREFIX replay: ${replay.size} of ${prefix.size} " +
        s"queries precede $target in bench order ===")
      val t0 = System.nanoTime()
      replay.foreach { name =>
        val f = graft.SparkEntry.queries(name)
        try f(spark, dir).count() catch { case _: Throwable => () } // warmup
        try f(spark, dir).count() catch { case _: Throwable => () } // timed
        spark.catalog.clearCache()
      }
      println(f"[creep] prefix replay done in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      println(s"[creep] === IN-SUITE (after prefix, bench protocol) ===")
      pass("warmup"); pass("timed1"); pass("timed2")
    }
    spark.stop()
  }
}
