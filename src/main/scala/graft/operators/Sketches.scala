package graft.operators

import graft.QueryDef
import graft.functions.Vectors
import graft.operators.TextOps.tokens
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Mergeable sketch aggregates surfaced as queries. Both are custom
  * `TypedImperativeAggregate`s (plans/HeavyHittersSketch.scala,
  * plans/KllQuantileSketch.scala): O(sketch) state per partial, merged
  * associatively through the exchange — the only shape that lets a
  * 1000-executor job answer "top tokens / quantiles over 100 TB"
  * without shuffling the raw value stream. Sketch contents are
  * order-dependent by construction → rows-only checks; the specs bound
  * the estimates against exact answers instead.
  */
object Sketches {

  private val HhCapacity = 512
  private val HhK = 20
  private val KllCap = 256
  private[operators] val KllQs = Seq(0.25, 0.5, 0.9, 0.99)

  val defs: Seq[(String, QueryDef)] = Seq(

    // ------------------------------------------------------------------
    // Global heavy-hitter tokens via Misra-Gries: counts underestimate
    // true frequency by ≤ N/512; the exact top tokens in this corpus
    // sit far above that line (SketchSpec asserts the bound and that
    // the exact top-5 all surface). Contrast with text_topk_tokens,
    // which shuffles every (token, count) pair: this shuffles one
    // 512-entry table per partition.
    "sketch_heavy_hitters" -> QueryDef.rowsOnly { (s, dir) =>
      Tables.documents(s, dir)
        .select(explode(tokens(col("text"))).as("tok"))
        .agg(Vectors.heavyHitters(s, col("tok"), HhCapacity, HhK).as("hh"))
        .select(posexplode(col("hh")).as(Seq("rank", "e")))
        .select((col("rank") + 1).as("rank"),
          col("e.token").as("token"), col("e.est_count").as("est_count"))
    },

    // ------------------------------------------------------------------
    // Per-group quantiles via the KLL-style sketch: one small summary
    // per (group, partition) through the exchange. SketchSpec bounds
    // each estimate inside the exact p±5% rank window.
    "sketch_quantiles" -> QueryDef.rowsOnly { (s, dir) =>
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"))
        .agg(Vectors.kllQuantiles(s, col("l_quantity").cast(DoubleType),
          KllCap, KllQs).as("est"))
        .select(col("l_returnflag"), posexplode(col("est")).as(Seq("qi", "est_value")))
        .select(col("l_returnflag"),
          element_at(typedLit(KllQs), col("qi").cast("int") + 1).as("q"),
          col("est_value"))
    },

    // ------------------------------------------------------------------
    // Mergeable distinct-count sketches (Apache DataSketches HLL, native
    // in Spark 4): one sketch per source slice, then the UNION of those
    // partial sketches answers the corpus-wide distinct question
    // without a second scan — the per-slice + global pattern a
    // 1000-executor job runs for distinct tokens/users. Sketch register
    // layout is engine-specific → rows-only; SketchSpec bounds every
    // estimate within 5% of the exact distinct count.
    "sketch_hll_union" -> QueryDef.rowsOnly { (s, dir) =>
      val perSrc = Tables.documents(s, dir)
        .select(col("source"), explode(tokens(col("text"))).as("tok"))
        .groupBy(col("source"))
        .agg(hll_sketch_agg(col("tok"), 12).as("sk"))
        .persist() // per-source rows + the union read one sketch build
      perSrc
        .select(col("source"), hll_sketch_estimate(col("sk")).as("est_distinct"))
        .unionByName(perSrc.agg(
            hll_sketch_estimate(hll_union_agg(col("sk"))).as("est_distinct"))
          .select(lit("__all__").as("source"), col("est_distinct")))
    }
  )
}
