import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.01")
    val sums = e
      .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
      .groupBy(col("label"), (col("pos0") + 1).as("pos"))
      .agg(sum(col("v").cast(DecimalType(18, 7))).as("s"))
    val cent = sums.groupBy(col("label").as("c_label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("s")))),
        x => x.getField("s").cast(DoubleType)).as("cvec"))
    val c0 = cent.filter(col("c_label") === 0).head().getSeq[Double](1)
    println("[ivf] spark centroid0 first5: " + c0.take(5).map(_.toString).mkString(", "))
    val embD = transform(col("embedding"), x => x.cast(DoubleType))
    val dot = aggregate(zip_with(embD, col("cvec"), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(embD, lit(0.0), (acc, x) => acc + x * x)
    val nb = aggregate(col("cvec"), lit(0.0), (acc, x) => acc + x * x)
    val cos = dot / sqrt(na * nb)
    val row = e.filter(col("vec_id") === 64).crossJoin(broadcast(cent.filter(col("c_label") === 0)))
      .select(cos.as("cos"), dot.as("dot"), na.as("na"), nb.as("nb")).head()
    println(f"[ivf] spark cos=${row.getDouble(0)}%.17g dot=${row.getDouble(1)}%.17g na=${row.getDouble(2)}%.17g nb=${row.getDouble(3)}%.17g")
    spark.stop()
  }
}
