package graft.streaming

import graft.sources.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardCopyOption}

/** Message-bus-shaped incremental ingest: the Kafka consumer contract
  * demonstrated without a broker.
  *
  * A "topic" is a parquet dataset with the wire shape a keyed log has —
  * `(part INT, offset BIGINT, key BIGINT, value...)` where `offset` is
  * dense and monotone within a partition. The consumer half implements
  * exactly the protocol a production Kafka→lakehouse job runs:
  *
  *  1. read the committed per-partition offsets from a ledger file;
  *  2. pull at most `maxPerPartition` rows ABOVE those offsets
  *     (bounded poll — state and memory per trigger are capped);
  *  3. write the batch to an epoch-keyed sink directory
  *     (`epoch=<ledger version>`) with mode=overwrite, so a replay of
  *     the same epoch is a byte-level no-op rather than a duplicate;
  *  4. atomically commit the advanced ledger (temp file + ATOMIC_MOVE)
  *     only AFTER the sink write lands.
  *
  * Crash between (3) and (4) → the restarted consumer re-reads the old
  * ledger, rebuilds the SAME epoch deterministically, and overwrites it:
  * at-least-once delivery + idempotent epoch sink = exactly-once table
  * contents, the same argument Structured Streaming's file sink makes
  * with its `_spark_metadata` log. OffsetLedgerSpec drives all three
  * failure points (multi-poll drain, lost-commit replay, fresh-process
  * restart).
  *
  * Scale shape: the ledger is O(n_partitions) and rides the driver; the
  * topic scan prunes on `part=` hive partitions, and because `offset`
  * is monotone within each partition file, the `offset > committed`
  * predicate prunes whole row groups via parquet min/max stats — a poll
  * near the head of a 100 TB topic reads only the tail row groups, not
  * the history.
  *
  * == Kafka mapping (the seam, behavior by behavior) ==
  *
  * Swapping the file-backed simulation for a real broker touches ONLY
  * the transport; every consumer-contract behavior here is the direct
  * analogue of a public Kafka API:
  *
  *  - '''topic layout''' — `(part, offset, key, value)` with dense
  *    monotone per-partition offsets IS Kafka's log abstraction; the
  *    `part = hash(key) % n` staging mirrors the producer
  *    `DefaultPartitioner`. Spark side: `spark.readStream.format("kafka")
  *    .option("subscribe", topic)` yields the same
  *    `(partition, offset, key, value)` columns.
  *  - '''committed-offset read''' (`readLedger`) — `Consumer.committed(
  *    Set[TopicPartition])` / `AdminClient.listConsumerGroupOffsets`,
  *    or Structured Streaming's checkpoint `offsets/` log (the
  *    `startingOffsets` JSON has exactly the ledger's shape:
  *    partition → next offset).
  *  - '''bounded poll above committed''' (`poll`'s `offset > committed`
  *    + `maxPerPartition` cap) — `Consumer.poll` after `seek(tp,
  *    committed+1)`, capped by `max.poll.records`; in Structured
  *    Streaming, `maxOffsetsPerTrigger`.
  *  - '''epoch-keyed idempotent sink''' (`epoch=<ledger version>`
  *    overwrite) — the sink-side half of exactly-once: same contract as
  *    the file sink's `_spark_metadata` commit log or a
  *    `foreachBatch(batchId)` upsert keyed on batch id.
  *  - '''atomic commit AFTER the write''' (temp + ATOMIC_MOVE) —
  *    `Consumer.commitSync` issued only after the sink flush, i.e.
  *    disable `enable.auto.commit` and commit manually; Structured
  *    Streaming does the same by writing `commits/<batch>` after
  *    `offsets/<batch>`.
  *  - '''epoch fencing on replay''' (re-running an old ledger version
  *    rebuilds and overwrites the SAME epoch) — the transactional
  *    producer's `epoch`/`producer.id` zombie fencing: a stale worker
  *    cannot double-append, it can only re-emit a byte-identical epoch.
  *
  * '''Dense-offset assumption (explicit transport contract).''' The
  * gap guard keys contiguity on arithmetic density
  * (`offset == committed + row_number`), which is valid HERE because
  * this transport's producers emit dense offsets by construction
  * (`stageTopic` assigns `row_number`). Real Kafka logs legitimately
  * skip offsets — transaction control records and compacted topics
  * leave holes — and against a real broker a density check would stall
  * the partition forever on the first legitimate hole. A production
  * swap must replace it with broker-advertised-watermark contiguity:
  * ingest up to `endOffsets` (the high-watermark) and treat offsets
  * missing below it as non-records, committing the high-watermark
  * rather than a counted prefix. The seam is the two `_rn` lines in
  * `poll`; everything else carries over unchanged.
  *
  * Consumer-visible failure modes ARE exercised (OffsetLedgerFaultSpec):
  * duplicate delivery (both below and within the unconsumed range),
  * out-of-order offsets within a partition (late files behind a gap),
  * and a mid-stream rebalance (partition reassignment between two
  * consumers sharing the group ledger). Not simulated (broker-internal,
  * invisible to the consumer contract): ISR replication, the rebalance
  * WIRE protocol itself, compaction. A production swap keeps
  * `poll`/`commit` call sites and replaces the parquet scan with the
  * kafka source — nothing downstream of the DataFrame changes.
  */
object OffsetLedgerIngest {

  /** Stage the events table as a keyed topic: `part` = key-hash bucket
    * (what a Kafka producer's default partitioner does), `offset` =
    * dense per-partition sequence in (ts, event_id) order. Written
    * hive-partitioned by `part` and sorted by `offset` within files so
    * both partition pruning and row-group skipping work for the poll
    * predicate. */
  def stageTopic(spark: SparkSession, sfDir: String, topicDir: String,
      nPartitions: Int = 4): Unit = {
    val w = Window.partitionBy(col("part")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, sfDir)
      .withColumn("part", pmod(hash(col("user_id")), lit(nPartitions)))
      .withColumn("offset", row_number().over(w).cast("long"))
      .select(col("part"), col("offset"), col("user_id").as("key"),
        col("event_id"), col("ts"), col("event_type"), col("value"))
      .repartition(col("part"))
      .sortWithinPartitions(col("part"), col("offset"))
      .write.mode("overwrite").partitionBy("part").parquet(topicDir)
  }

  /** Committed consumer state: ledger version (= next epoch id) and the
    * highest ingested offset per partition. */
  final case class Ledger(version: Long, offsets: Map[Int, Long])

  private def ledgerPath(sinkDir: String): Path = Paths.get(sinkDir, "_offsets")

  /** Read the committed ledger; a missing file is the initial state
    * (version 0, no offsets — consume from the beginning). */
  def readLedger(sinkDir: String): Ledger = {
    val p = ledgerPath(sinkDir)
    if (!Files.exists(p)) Ledger(0L, Map.empty)
    else {
      val lines = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
        .linesIterator.filter(_.nonEmpty).toSeq
      Ledger(lines.head.toLong,
        lines.tail.map { l =>
          val Array(k, v) = l.split(":"); k.toInt -> v.toLong
        }.toMap)
    }
  }

  /** Atomic commit: write to a temp file in the same directory, then
    * ATOMIC_MOVE over the ledger. A reader (or a crashed writer's
    * successor) sees either the old or the new ledger, never a torn
    * one — the flip-pointer protocol the CDC sink also uses. */
  def commitLedger(sinkDir: String, ledger: Ledger): Unit = {
    val p = ledgerPath(sinkDir)
    val body = (ledger.version.toString +:
      ledger.offsets.toSeq.sortBy(_._1).map { case (k, v) => s"$k:$v" })
      .mkString("", "\n", "\n")
    val tmp = Files.createTempFile(p.getParent, "_offsets_tmp", "")
    Files.write(tmp, body.getBytes(StandardCharsets.UTF_8))
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** One bounded poll: ingest up to `maxPerPartition` rows per topic
    * partition above the committed offsets, land them under
    * `sinkDir/epoch=<version>`, then commit the advanced ledger.
    * Returns the number of rows ingested (0 = caught up; nothing is
    * written and the ledger does not advance, so idle polls are free).
    *
    * `parts` is the consumer's PARTITION ASSIGNMENT (Kafka
    * `Consumer.assign` / the group coordinator's post-rebalance
    * assignment): the poll reads only those partitions, so a rebalance
    * is a pure assignment change — the next assignee of a reassigned
    * partition resumes from the shared ledger's committed offset, and
    * exactly-once carries across the handoff (OffsetLedgerFaultSpec).
    *
    * Two at-least-once transport faults are absorbed INSIDE the poll:
    *
    *  - '''duplicate delivery''' — a record redelivered BELOW the
    *    committed offset is excluded by the `offset > committed` seek;
    *    one redelivered WITHIN the unconsumed range (same (part,
    *    offset) twice in the scan) is collapsed by the (part, offset)
    *    dedup, the consumer-side idempotence a real consumer gets from
    *    the broker's one-record-per-offset invariant.
    *  - '''out-of-order offsets within a partition''' — only the
    *    CONTIGUOUS offset prefix above the committed offset is
    *    ingested and committed (`offset == committed + row_number`):
    *    rows past a gap stay in the topic until the late delivery
    *    fills it, so a delayed file can never be skipped-forever by an
    *    advancing ledger. Both guards run on the BOUNDED poll batch
    *    (≤ maxPerPartition × |assignment| rows), never the topic. */
  /** Fault-injection seam for crash-recovery specs ONLY: when set,
    * `poll` throws at the named point, leaving exactly the on-disk
    * state a process death there would leave. Because poll reads ALL
    * of its state from disk at entry (ledger + topic + epoch dirs;
    * nothing consumer-side survives in memory between polls), an
    * abandoned throw is observationally equivalent to `kill -9` for
    * the recovery path. Valid points: `"sink-write"` (epoch dir
    * written, ledger commit lost — the at-least-once window) and
    * `"ledger-commit"` (ledger committed, consumer died before
    * observing success). */
  private[graft] var crashAfter: Option[String] = None

  def poll(spark: SparkSession, topicDir: String, sinkDir: String,
      maxPerPartition: Long = Long.MaxValue,
      parts: Option[Set[Int]] = None): Long = {
    val ledger = readLedger(sinkDir)
    // tiny (n_partitions rows) — broadcast against the topic scan; the
    // per-partition offset bounds stay inside the scan's pushed filters
    import spark.implicits._
    val committed = ledger.offsets.toSeq.toDF("part", "committed")
    val topic0 = spark.read.parquet(topicDir)
    val topic = parts.fold(topic0)(ps =>
      topic0.filter(col("part").isin(ps.toSeq.sorted.map(Int.box): _*)))
    val w = Window.partitionBy(col("part")).orderBy(col("offset"))
    val batch = topic
      .join(broadcast(committed), Seq("part"), "left_outer")
      .withColumn("committed", coalesce(col("committed"), lit(0L)))
      .filter(col("offset") > col("committed") &&
        col("offset") <= col("committed") + maxPerPartition)
      .dropDuplicates("part", "offset") // duplicate-delivery guard
      .withColumn("_rn", row_number().over(w).cast("long"))
      .filter(col("offset") === col("committed") + col("_rn")) // gap guard
      .drop("_rn", "committed")
      .persist() // read once for the count, once for the write
    val n = batch.count()
    if (n > 0) {
      val newOffsets = batch.groupBy(col("part"))
        .agg(max(col("offset")).as("hi"))
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      // deterministic epoch contents + overwrite ⇒ replay-safe
      batch.write.mode("overwrite")
        .parquet(s"$sinkDir/epoch=${ledger.version}")
      batch.unpersist()
      if (crashAfter.contains("sink-write"))
        throw new IllegalStateException(
          "failpoint: died after sink write, before ledger commit")
      commitLedger(sinkDir,
        Ledger(ledger.version + 1, ledger.offsets ++ newOffsets))
      if (crashAfter.contains("ledger-commit"))
        throw new IllegalStateException(
          "failpoint: died after ledger commit, before observing success")
    } else batch.unpersist()
    n
  }

  /** Drain the topic: poll until a poll ingests nothing. Returns the
    * number of polls that ingested data. */
  def drain(spark: SparkSession, topicDir: String, sinkDir: String,
      maxPerPartition: Long): Int = {
    var polls = 0
    while (poll(spark, topicDir, sinkDir, maxPerPartition) > 0) polls += 1
    polls
  }

  /** Read the ingested table (all committed epochs). */
  def sinkTable(spark: SparkSession, sinkDir: String): DataFrame = {
    val epochs = new java.io.File(sinkDir).listFiles()
    val dirs = if (epochs == null) Array.empty[String]
      else epochs.filter(f => f.isDirectory && f.getName.startsWith("epoch="))
        .map(_.getPath)
    if (dirs.isEmpty) spark.emptyDataFrame
    else spark.read.parquet(dirs.toIndexedSeq: _*)
  }
}
