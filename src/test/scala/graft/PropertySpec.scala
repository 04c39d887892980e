package graft

import graft.plans.BottomKSample
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the custom expressions: randomized inputs checked
  * against straightforward reference implementations, driven through
  * the real Column/SQL surface (not expression internals).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession._

  test("sorted intersect count == reference set intersection (randomized)") {
    import spark.implicits._
    val gen = for {
      a <- Gen.listOf(Gen.chooseNum(-50L, 50L))
      b <- Gen.listOf(Gen.chooseNum(-50L, 50L))
    } yield (a.distinct.sorted, b.distinct.sorted)
    val cases = Gen.listOfN(60, gen).sample.get
    val df = cases.toDF("a", "b")
    val got = df.select(
      graft.functions.Vectors.sortedIntersectCount(spark, col("a"), col("b")))
      .collect().map(_.getInt(0)).toSeq
    val want = cases.map { case (a, b) => a.toSet.intersect(b.toSet).size }
    assert(got == want)
  }

  test("bottom-k sample == reference sort-by-mix (randomized)") {
    import spark.implicits._
    val idsGen = Gen.nonEmptyListOf(Gen.chooseNum(0L, 100000L)).map(_.distinct)
    val kGen = Gen.chooseNum(1, 12)
    val cases = Gen.listOfN(25, Gen.zip(idsGen, kGen)).sample.get
    cases.foreach { case (ids, k) =>
      val got = ids.toDF("id")
        .agg(graft.functions.Vectors.bottomkSample(spark, col("id"), k))
        .head().getSeq[Long](0).toList
      val want = ids.sortBy(id => (BottomKSample.mix(id), id)).take(k)
      assert(got == want, s"ids=$ids k=$k")
    }
  }

  test("cosine expression == reference for random float vectors") {
    import spark.implicits._
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-100, 100).map(_ / 10.0f))
    val cases = Gen.listOfN(30, Gen.zip(vecGen, vecGen)).sample.get
      .filter { case (a, b) =>
        a.exists(_ != 0f) && b.exists(_ != 0f)
      }
    val df = cases.toDF("a", "b")
      .select(col("a").cast("array<float>").as("a"), col("b").cast("array<float>").as("b"))
    val got = df.select(graft.functions.Vectors.cosine(spark, col("a"), col("b")))
      .collect().map(_.getDouble(0))
    val want = cases.map { case (a, b) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      a.zip(b).foreach { case (x, y) =>
        dot += x.toDouble * y.toDouble
        na += x.toDouble * x.toDouble
        nb += y.toDouble * y.toDouble
      }
      dot / math.sqrt(na * nb)
    }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12) }
  }
}
