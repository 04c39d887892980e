package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode/feature-extract
  * run batched per partition.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked deterministic STUB (`decodeStub`) — what is real and
  * tested is the Spark-side shape: binary columns through the plan,
  * typed metadata extraction, and partition-batched feature extraction
  * with a fixed output schema (the `mapPartitions` seam is exactly
  * where a JNI/FFI decoder would slot in).
  */
object Multimodal {

  /** STUB decoder: stands in for an image/audio codec. Deterministic
    * fake: 8 "channel" features from byte-stripe sums, normalized. */
  def decodeStub(payload: Array[Byte]): Array[Double] = {
    val n = payload.length.max(1)
    val stripe = math.max(n / 8, 1)
    (0 until 8).map { k =>
      var s = 0L
      var i = k * stripe
      val end = math.min(n, (k + 1) * stripe)
      while (i < end) { s += payload(i) & 0xFF; i += 1 }
      s.toDouble / (255.0 * stripe)
    }.toArray
  }

  /** Scalar feature columns (not array<double>): the driver's rows-only
    * check sorts rows in pandas, which cannot order array cells. */
  final case class MmFeature(
      doc_id: Long, n_bytes: Int, n_stripes: Int,
      f0: Double, f1: Double, f2: Double, f3: Double,
      f4: Double, f5: Double, f6: Double, f7: Double)

  val defs: Seq[(String, QueryDef)] = Seq(

    // ------------------------------------------------------------------
    // Typed metadata over a binary payload column (payload = utf8 bytes
    // of the doc text here; in production the image/audio blob).
    "mm_meta" -> QueryDef.withOracle(
      """SELECT doc_id,
        |  octet_length(encode(text)) AS byte_len,
        |  hex(encode(substring(text, 1, 4))) AS magic,
        |  md5(text) AS payload_md5,
        |  CASE WHEN octet_length(encode(text)) > 256 THEN 'large' ELSE 'small' END AS kind,
        |  CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
        |  CAST((octet_length(encode(text)) * 7) % 480 AS BIGINT) AS height
        |FROM documents""".stripMargin) { (s, dir) =>
      val payload = col("text").cast(BinaryType)
      val byteLen = length(payload)
      Tables.documents(s, dir).select(
        col("doc_id"),
        byteLen.as("byte_len"),
        hex(substring(col("text"), 1, 4).cast(BinaryType)).as("magic"),
        md5(payload).as("payload_md5"),
        when(byteLen > 256, "large").otherwise("small").as("kind"),
        (byteLen % 640).cast(LongType).as("width"),
        ((byteLen * 7) % 480).cast(LongType).as("height"))
    },

    // ------------------------------------------------------------------
    // Resize planning: target box fit (224×224) preserving aspect ratio,
    // computed from the typed metadata in pure integer/double arithmetic
    // (the real resample would run in the batched decode seam below —
    // the PLAN of what to resize to is engine-checkable, and is what a
    // scheduler shards work by). Dims are byte-length-derived fakes like
    // mm_meta's, shifted by +32 so both sides of the aspect-ratio
    // division are provably nonzero (mm_meta's raw dims can be 0).
    "mm_resize" -> QueryDef.withOracle(
      """WITH m AS (
        |  SELECT doc_id,
        |    octet_length(encode(text)) % 640 + 32 AS w,
        |    (octet_length(encode(text)) * 7) % 480 + 32 AS h
        |  FROM documents)
        |SELECT doc_id, CAST(w AS BIGINT) AS width, CAST(h AS BIGINT) AS height,
        |  CAST(CASE WHEN w * 224 <= h * 224 THEN round(w * 224.0 / h) ELSE 224 END AS BIGINT) AS out_w,
        |  CAST(CASE WHEN w * 224 <= h * 224 THEN 224 ELSE round(h * 224.0 / w) END AS BIGINT) AS out_h,
        |  w * 224 > h * 224 AS landscape
        |FROM m""".stripMargin) { (s, dir) =>
      val byteLen = length(col("text").cast(BinaryType))
      Tables.documents(s, dir)
        .select(col("doc_id"),
          (byteLen % 640 + 32).cast(LongType).as("w"),
          ((byteLen * 7) % 480 + 32).cast(LongType).as("h"))
        .select(col("doc_id"), col("w").as("width"), col("h").as("height"),
          when(col("w") * 224 <= col("h") * 224,
            round(col("w") * lit(224.0) / col("h")).cast(LongType))
            .otherwise(lit(224L)).as("out_w"),
          when(col("w") * 224 <= col("h") * 224, lit(224L))
            .otherwise(round(col("h") * lit(224.0) / col("w")).cast(LongType)).as("out_h"),
          (col("w") * 224 > col("h") * 224).as("landscape"))
    },

    // ------------------------------------------------------------------
    // Frame sampling plan: a "video" payload's frame count is derived
    // from its metadata; every k-th frame is selected so each doc
    // explodes into a bounded set of (doc, frame, offset) work items —
    // the row shape a decode fleet consumes. Explode stays bounded
    // (≤ 32 frames/doc) so a 100 TB corpus fans out linearly.
    "mm_frame_sample" -> QueryDef.withOracle(
      """WITH m AS (
        |  SELECT doc_id,
        |    octet_length(encode(text)) % 961 + 1 AS n_frames
        |  FROM documents),
        |k AS (SELECT doc_id, n_frames,
        |        CAST(ceil(n_frames / 32.0) AS BIGINT) AS stride FROM m)
        |SELECT doc_id, CAST(n_frames AS BIGINT) AS n_frames,
        |  CAST(unnest(range(0, n_frames, stride)) AS BIGINT) AS frame_idx
        |FROM k""".stripMargin) { (s, dir) =>
      val byteLen = length(col("text").cast(BinaryType))
      Tables.documents(s, dir)
        .select(col("doc_id"), (byteLen % 961 + 1).cast(LongType).as("n_frames"))
        .withColumn("stride", ceil(col("n_frames") / 32.0).cast(LongType))
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0L), col("n_frames") - 1, col("stride"))).as("frame_idx"))
    },

    // ------------------------------------------------------------------
    // Partition-batched feature extraction through the stub decoder.
    // Batching shape is real: payloads are processed per-partition in
    // groups of 64 (the codec-call batch), never row-at-a-time across a
    // process boundary. Rows-only (the stub is engine-specific).
    "mm_feature" -> QueryDef.rowsOnly { (s, dir) =>
      import s.implicits._
      val src = Tables.documents(s, dir)
        .select(col("doc_id"), col("text").cast(BinaryType).as("payload"))
        .as[(Long, Array[Byte])]
      src.mapPartitions { it =>
        it.grouped(64).flatMap { batch =>
          // codec batch call would happen here, once per `batch`
          batch.map { case (id, payload) =>
            val f = decodeStub(payload)
            MmFeature(id, payload.length, f.length,
              f(0), f(1), f(2), f(3), f(4), f(5), f(6), f(7))
          }
        }
      }.toDF()
    },

    // ------------------------------------------------------------------
    // Header-hash media dedup — the cheap first tier of blob dedup at
    // 100 TB: group by (md5 of the first 64 payload bytes, coarse size
    // class) and report multi-member groups with a canonical keeper.
    // The shuffle carries a 16-byte hash + a long per blob, NEVER the
    // payload — a petabyte of media dedups by moving kilobytes per
    // million blobs. Groups found here would feed an exact byte-compare
    // second tier (same two-tier shape as ann_refine_rerank). Member
    // lists are emitted as a sorted CSV string (driver-side row sorting
    // cannot order array cells — see MmFeature note).
    "mm_header_dedup" -> QueryDef.withOracle(
      """SELECT md5(substring(text, 1, 64)) AS header_md5,
        |  CAST(octet_length(encode(text)) // 64 AS BIGINT) AS size_class,
        |  CAST(count(*) AS BIGINT) AS n_copies,
        |  min(doc_id) AS keep_id,
        |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS member_ids
        |FROM documents
        |GROUP BY 1, 2
        |HAVING count(*) >= 2""".stripMargin) { (s, dir) =>
      val payload = col("text").cast(BinaryType)
      Tables.documents(s, dir)
        .select(
          col("doc_id"),
          md5(substring(col("text"), 1, 64).cast(BinaryType)).as("header_md5"),
          floor(length(payload) / 64).cast(LongType).as("size_class"))
        .groupBy(col("header_md5"), col("size_class"))
        .agg(
          count(lit(1)).as("n_copies"),
          min(col("doc_id")).as("keep_id"),
          array_join(transform(sort_array(collect_list(col("doc_id"))),
            x => x.cast(StringType)), ",").as("member_ids"))
        .filter(col("n_copies") >= 2)
    },

    // ------------------------------------------------------------------
    // Chunk-level blob dedup — the second tier after mm_header_dedup:
    // split every payload into fixed 16-byte chunks (the CDC seam; a
    // rolling-hash boundary would slot in where the fixed stride is),
    // hash each chunk, and report cross-corpus duplicate chunks with
    // their blob reach. The exchange carries (chunk_md5, doc_id) pairs
    // — 24 bytes per chunk, never payload bytes — so a petabyte of
    // media yields storage-dedup stats by shipping hashes. Chunking is
    // row-local (explode over a computed index range); payloads here
    // are the utf8 doc bytes (ASCII ⇒ char positions = byte offsets).
    "mm_chunk_dedup" -> QueryDef.withOracle(
      """WITH c AS (
        |  SELECT doc_id,
        |    unnest(range(0, CAST(ceil(length(text) / 16.0) AS INT))) AS i,
        |    text
        |  FROM documents),
        |h AS (SELECT doc_id, md5(substring(text, i * 16 + 1, 16)) AS chunk_md5
        |      FROM c)
        |SELECT chunk_md5, CAST(count(*) AS BIGINT) AS n_copies,
        |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs
        |FROM h GROUP BY chunk_md5
        |HAVING count(*) >= 2""".stripMargin) { (s, dir) =>
      val nChunks = ceil(length(col("text")) / 16.0).cast(IntegerType)
      Tables.documents(s, dir)
        .select(col("doc_id"), explode(transform(
          sequence(lit(0), nChunks - 1),
          i => col("text").substr(i * 16 + 1, lit(16)))).as("chunk"))
        .select(col("doc_id"), md5(col("chunk").cast(BinaryType)).as("chunk_md5"))
        .groupBy(col("chunk_md5"))
        .agg(count(lit(1)).as("n_copies"),
          countDistinct(col("doc_id")).as("n_docs"))
        .filter(col("n_copies") >= 2)
    }
  )
}
