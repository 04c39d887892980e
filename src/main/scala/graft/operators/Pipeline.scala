package graft.operators

import graft.QueryDef
import org.apache.spark.sql.functions._

/** End-to-end corpus cleaning — the composition a training-data
  * pipeline actually runs, as one declarative plan:
  *
  *   1. exact dedup (content fingerprint, keep min doc_id)
  *   2. near-dedup (minhash-LSH candidates verified at jaccard ≥ 0.5;
  *      the higher doc_id of each verified pair is dropped)
  *   3. quality filter (composite score ≥ 0.5)
  *
  * Emits every document with its verdict and the dominant drop reason
  * (priority: exact_dup > near_dup > low_quality > kept). Each stage is
  * the already-verified operator; Catalyst fuses the composition, and
  * the shingle relation is shared through the cache across stages.
  * Rows-only (the minhash stage is hash-based).
  */
object Pipeline {

  val defs: Seq[(String, QueryDef)] = Seq(
    "pipe_clean_corpus" -> QueryDef.rowsOnly { (s, dir) =>
      val exact = Dedup.defs.toMap.apply("dedup_exact").fn(s, dir)
        .select(col("doc_id"), col("is_dup").as("exact_dup"))
      val nearPairs = Dedup.defs.toMap.apply("dedup_minhash_lsh").fn(s, dir)
        .select(col("doc_b").as("doc_id")).distinct()
        .withColumn("near_dup", lit(true))
      val quality = TextOps.defs.toMap.apply("text_quality").fn(s, dir)
        .select(col("doc_id"), col("quality_score"))
      exact
        .join(nearPairs, Seq("doc_id"), "left_outer")
        .join(quality, Seq("doc_id"), "left_outer")
        .select(
          col("doc_id"),
          col("exact_dup"),
          coalesce(col("near_dup"), lit(false)).as("near_dup"),
          coalesce(col("quality_score"), lit(0.0)).as("quality_score"),
          when(col("exact_dup"), "exact_dup")
            .when(coalesce(col("near_dup"), lit(false)), "near_dup")
            .when(coalesce(col("quality_score"), lit(0.0)) < 0.5, "low_quality")
            .otherwise("kept").as("verdict"))
    }
  )
}
