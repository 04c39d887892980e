package graft.operators

import graft.QueryDef
import graft.functions.Vectors
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * `ann_topk_exact` is the brute-force correctness baseline: the probe
  * set is tiny and broadcast, so the scan is a single pass over the
  * corpus with no shuffle of the big side — this is exactly the shape
  * that scales to 10^9 vectors (probes × corpus is linear in corpus).
  *
  * `ann_lsh` is the scale path: deterministic random-hyperplane buckets
  * (8 planes → 256 buckets) bound each probe's candidate set; the same
  * plane literals could be evaluated by any engine.
  */
object Similarity {

  private val K = 5
  private val NPROBES = 10

  val defs: Seq[(String, QueryDef)] = Seq(

    // ------------------------------------------------------------------
    "ann_topk_exact" -> QueryDef.withOracle(
      s"""SELECT probe_id, neighbor_id, cos_sim, rn FROM (
         |  SELECT p.vec_id AS probe_id, e.vec_id AS neighbor_id,
         |    round(list_cosine_similarity(
         |      list_transform(p.embedding, x -> CAST(x AS DOUBLE)),
         |      list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) AS cos_sim,
         |    row_number() OVER (PARTITION BY p.vec_id
         |      ORDER BY round(list_cosine_similarity(
         |        list_transform(p.embedding, x -> CAST(x AS DOUBLE)),
         |        list_transform(e.embedding, x -> CAST(x AS DOUBLE))), 6) DESC,
         |               e.vec_id ASC) AS rn
         |  FROM (SELECT * FROM embeddings WHERE vec_id < $NPROBES) p
         |  JOIN embeddings e ON e.vec_id <> p.vec_id)
         |WHERE rn <= $K""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      val probes = e.filter(col("vec_id") < NPROBES)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"))
      val cos = round(Vectors.cosine(s, col("probe_emb"), col("embedding")), 6)
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
      e.join(broadcast(probes), col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"), cos.as("cos_sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= K)
    },

    // ------------------------------------------------------------------
    // Hyperplane-LSH bucketed ANN: each vector lands in one of 16
    // sign-buckets; probes only scan their own bucket. Plane count
    // trades recall for candidate-set size (k planes → 2^k buckets;
    // with ~10^3-vector test corpora 4 planes keeps buckets populated;
    // a 10^9-vector corpus would use 12-16 planes + multi-probe).
    // Rows-only (the operator is approximate by construction).
    "ann_lsh" -> QueryDef.rowsOnly { (s, dir) =>
      val planes = Vectors.planes(4, 64)
      val e = Tables.embeddings(s, dir)
      def bucketOf(emb: org.apache.spark.sql.Column) =
        planes.zipWithIndex.map { case (p, j) =>
          when(Vectors.dot(s, emb, typedLit(p)) > 0, lit(1 << j)).otherwise(lit(0))
        }.reduce(_ + _)
      val bucketed = e.select(col("vec_id"), col("embedding"),
        bucketOf(col("embedding")).as("bucket"))
      val probes = bucketed.filter(col("vec_id") < NPROBES)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
          col("bucket").as("probe_bucket"))
      val cos = round(Vectors.cosine(s, col("probe_emb"), col("embedding")), 6)
      val w = Window.partitionBy(col("probe_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
      bucketed.join(broadcast(probes),
          col("bucket") === col("probe_bucket") && col("vec_id") =!= col("probe_id"))
        .select(col("probe_id"), col("vec_id").as("neighbor_id"),
          col("bucket"), cos.as("cos_sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= K)
    }
  )
}
