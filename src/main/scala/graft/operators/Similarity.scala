package graft.operators

import graft.QueryDef
import graft.functions.Vectors
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * `ann_topk_exact` is the brute-force correctness baseline: the probe
  * set is tiny and broadcast, so the scan is a single pass over the
  * corpus with no shuffle of the big side — this is exactly the shape
  * that scales to 10^9 vectors (probes × corpus is linear in corpus).
  *
  * `ann_lsh` is the scale path: deterministic random-hyperplane buckets
  * bound each probe's candidate set; the same plane literals could be
  * evaluated by any engine. `ann_ivf_assign` builds the IVF cell
  * structure itself with reproducible fixed-point centroid accumulation.
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
    // IVF index construction + assignment: per-label centroids built as
    // exact per-dimension fixed-point sums (cosine is scale-invariant, so
    // the unnormalized sum vector IS the centroid), then every vector
    // assigned to its nearest centroid. Centroid build is two keyed
    // aggregations; assignment is corpus × n_cells with a broadcast
    // centroid table — linear in corpus size.
    "ann_ivf_assign" -> QueryDef.withOracle(
      """WITH sums AS (
        |  SELECT label, pos,
        |    sum(CAST(floor(CAST(embedding[pos] AS DOUBLE) * 1048576 + 0.5) AS BIGINT)) AS s
        |  FROM embeddings, range(1, 65) t(pos)
        |  GROUP BY label, pos),
        |cent AS (
        |  SELECT label AS c_label,
        |    list(CAST(s AS DOUBLE) / 1048576 ORDER BY pos) AS cvec
        |  FROM sums GROUP BY label),
        |scored AS (
        |  SELECT e.vec_id, e.label, c.c_label,
        |    round(list_cosine_similarity(
        |      list_transform(e.embedding, x -> CAST(x AS DOUBLE)), c.cvec), 6) AS cos_c
        |  FROM embeddings e CROSS JOIN cent c)
        |SELECT vec_id, label, c_label AS assigned_label, cos_c,
        |  c_label = label AS is_home_cell
        |FROM (SELECT *, row_number() OVER (PARTITION BY vec_id
        |        ORDER BY cos_c DESC, c_label ASC) AS rn FROM scored)
        |WHERE rn = 1""".stripMargin) { (s, dir) =>
      val e = Tables.embeddings(s, dir)
      // Fixed-point accumulation: scale by 2^20 (exact double op), round
      // to long (bit-identical on any engine), sum exactly, rescale.
      // float→decimal casts are NOT portable (string-repr vs binary
      // rounding differ per element); this is, and it's also how a real
      // cluster makes float reductions reproducible across partitionings.
      val sums = e
        .select(col("label"), posexplode(col("embedding")).as(Seq("pos0", "v")))
        .groupBy(col("label"), (col("pos0") + 1).as("pos"))
        .agg(sum(floor(col("v").cast(DoubleType) * 1048576 + 0.5).cast(LongType)).as("s"))
      val cent = sums
        .groupBy(col("label").as("c_label"))
        .agg(transform(
          array_sort(collect_list(struct(col("pos"), col("s")))),
          x => x.getField("s").cast(DoubleType) / 1048576).as("cvec"))
      val embD = transform(col("embedding"), x => x.cast(DoubleType))
      // sequential-order double accumulation, matching DuckDB's
      // list_cosine_similarity on double lists
      val dot = aggregate(zip_with(embD, col("cvec"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      val na = aggregate(embD, lit(0.0), (acc, x) => acc + x * x)
      val nb = aggregate(col("cvec"), lit(0.0), (acc, x) => acc + x * x)
      val cosC = round(dot / sqrt(na * nb), 6)
      val w = Window.partitionBy(col("vec_id"))
        .orderBy(col("cos_c").desc, col("c_label").asc)
      e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("label"), col("c_label"), cosC.as("cos_c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("label"), col("c_label").as("assigned_label"),
          col("cos_c"), (col("c_label") === col("label")).as("is_home_cell"))
    },

    // ------------------------------------------------------------------
    // Hyperplane-LSH bucketed ANN: each vector lands in one of 16
    // sign-buckets; probes only scan their own bucket. Plane count
    // trades recall for candidate-set size (k planes → 2^k buckets;
    // with ~10^3-vector test corpora 4 planes keeps buckets populated;
    // a 10^9-vector corpus would use 12-16 planes + multi-probe).
    // Rows-only (the operator is approximate by construction).
    "ann_lsh" -> QueryDef.rowsOnly { (s, dir) =>
      val nPlanes = 4
      val planes = Vectors.planes(nPlanes, 64)
      val e = Tables.embeddings(s, dir)
      def bucketOf(emb: org.apache.spark.sql.Column) =
        planes.zipWithIndex.map { case (p, j) =>
          when(Vectors.dot(s, emb, typedLit(p)) > 0, lit(1 << j)).otherwise(lit(0))
        }.reduce(_ + _)
      val bucketed = e.select(col("vec_id"), col("embedding"),
        bucketOf(col("embedding")).as("bucket"))
      // multi-probe: each probe also scans the nPlanes hamming-1
      // neighbor buckets (a borderline sign flips exactly one bit), so
      // recall doesn't fall off a cliff at cell boundaries while the
      // candidate set stays (nPlanes+1)/2^nPlanes of the corpus.
      val probes = bucketed.filter(col("vec_id") < NPROBES)
        .select(col("vec_id").as("probe_id"), col("embedding").as("probe_emb"),
          explode(array(
            col("bucket") +: (0 until nPlanes).map(j =>
              col("bucket").bitwiseXOR(lit(1 << j))): _*)).as("probe_bucket"))
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
