package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local runs use `local[N]`; on a real cluster the same settings apply
  * except parallelism knobs, which scale with the executor count. AQE is
  * on so skewed shuffle partitions are split and small ones coalesced at
  * runtime — the local plan shape is then representative of the cluster
  * plan shape.
  */
object GraftSession {

  /** Tuning applied to any session graft runs on. Safe to call on an
    * existing session builder-produced session (configs are runtime-settable
    * except shuffle.partitions which is). */
  def tune(spark: SparkSession): SparkSession = {
    val c = spark.conf
    c.set("spark.sql.session.timeZone", "UTC")
    c.set("spark.sql.adaptive.enabled", "true")
    c.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    c.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // 10 MB default is conservative; dims in a TPC-H-ratio schema are tiny
    // relative to facts — let Catalyst broadcast aggressively.
    c.set("spark.sql.autoBroadcastJoinThreshold", (64L * 1024 * 1024).toString)
    spark
  }

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = SparkSession
      .builder()
      .master(s"local[$cores]")
      .withExtensions(new GraftExtensions)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    tune(spark)
  }
}
