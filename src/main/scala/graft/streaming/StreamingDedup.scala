package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor,
  TimeMode, TTLConfig}

/** Streaming near-duplicate detection — "dedup the crawl as it
  * arrives": the banded-minhash LSH of [[graft.operators.Dedup]]
  * re-expressed incrementally. Each incoming document computes its
  * 16 min-hashes ROW-LOCALLY (no per-doc aggregation: `array_min` over
  * the shingle array inside one projection — a stateless map), lands in
  * its 8 band buckets, and each bucket's `transformWithState` state is
  * the capped member list: a new arrival emits a candidate pair against
  * every prior member, then joins the list.
  *
  * Scale/semantics contract, identical to the batch operator:
  *  - state per bucket is bounded by [[graft.operators.Dedup.MaxBandBucket]]
  *    (a corpus-wide boilerplate band fills once and stops emitting —
  *    the same safety valve as the batch cap, applied incrementally);
  *  - on corpora where no band bucket exceeds the cap, the candidate
  *    SET equals the batch band self-join's, whatever the arrival
  *    order or batching (pairs are emitted (min, max) and multi-band
  *    duplicates dedup downstream) — StreamingDedupSpec asserts set
  *    equality against the batch construction at two different
  *    `maxFilesPerTrigger` batchings. In the OVER-cap regime the two
  *    operators intentionally diverge: the batch cap drops a hot
  *    bucket whole (zero pairs, deterministic), while the streaming
  *    processor has already emitted C(cap, 2) pairs among whichever
  *    cap members arrived first — an arrival-order-dependent set. Both
  *    bound state and output; only the batch form is replayable.
  */
object StreamingDedup {

  final case class BandRow(bucket: String, doc_id: Long)
  final case class CandPair(doc_a: Long, doc_b: Long)

  /** Band-bucket membership as streaming state: emit (prior, new)
    * candidate pairs, append the newcomer, stop at `cap` members. */
  class BandBucketProcessor(cap: Int)
      extends StatefulProcessor[String, BandRow, CandPair] {
    @transient private var members: ListState[Long] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      members = getHandle.getListState[Long]("members",
        Encoders.scalaLong, TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[BandRow],
        timerValues: org.apache.spark.sql.streaming.TimerValues): Iterator[CandPair] = {
      val cur = scala.collection.mutable.ArrayBuffer.empty[Long]
      members.get().foreach(cur += _)
      val seen = scala.collection.mutable.Set(cur.toSeq: _*)
      val out = scala.collection.mutable.ArrayBuffer.empty[CandPair]
      rows.foreach { r =>
        if (!seen(r.doc_id) && cur.length < cap) {
          out ++= cur.map(e =>
            CandPair(math.min(e, r.doc_id), math.max(e, r.doc_id)))
          cur += r.doc_id
          seen += r.doc_id
          members.appendValue(r.doc_id)
        }
      }
      out.iterator
    }
  }

  /** Row-local banded minhash signatures — the exact construction of
    * the batch `Dedup.bandedSignatures` (same md5 seeds, same 2-hash
    * bands), but as a stateless projection: min over the shingle array
    * replaces the groupBy over exploded shingles, because a streaming
    * per-doc row already holds its whole shingle set. */
  def bandRows(docs: DataFrame): DataFrame = {
    import graft.operators.Dedup.{NumBands, NumHashes}
    val toks = graft.operators.TextOps.tokens(col("text"))
    val sh = array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ",
            element_at(toks, i + 1),
            element_at(toks, i + 2),
            element_at(toks, i + 3))))
        .otherwise(typedLit(Seq.empty[String])))
    val mins = (0 until NumHashes).map(i =>
      array_min(transform(col("sh"), g => md5(concat(lit(s"$i:"), g)))).as(s"m$i"))
    docs
      .select(col("doc_id"), sh.as("sh"))
      .filter(size(col("sh")) > 0)
      .select(col("doc_id") +: mins: _*)
      .select(col("doc_id"),
        explode(array((0 until NumBands).map(b =>
          concat_ws("|", lit(b.toString),
            col(s"m${2 * b}"), col(s"m${2 * b + 1}"))): _*)).as("bucket"))
  }

  /** File-source stream of documents → incremental LSH candidate pairs. */
  def candidateStream(spark: SparkSession, docsDir: String,
      maxFilesPerTrigger: Int = 0,
      cap: Int = graft.operators.Dedup.MaxBandBucket): Dataset[CandPair] = {
    import spark.implicits._
    val reader = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
    val src = (if (maxFilesPerTrigger > 0)
      reader.option("maxFilesPerTrigger", maxFilesPerTrigger) else reader)
      .parquet(docsDir)
    bandRows(src)
      .select(col("bucket"), col("doc_id"))
      .as[BandRow]
      .groupByKey(_.bucket)
      .transformWithState(new BandBucketProcessor(cap),
        TimeMode.None(), OutputMode.Append())
  }
}
