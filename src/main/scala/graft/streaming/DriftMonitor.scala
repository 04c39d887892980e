package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming CUSUM drift monitor — ev_changepoint_cusum's deployment
  * shape. A batch job publishes each event type's reference daily rate
  * (×10⁶ fixed point); the stream then folds per-type daily counts
  * against that reference and emits one row per CLOSED day carrying
  * the running cumulative deviation and a threshold alarm. This is the
  * standard drift-deployment split: the reference is frozen batch
  * statistics, the monitor is O(|types|) state however long the
  * stream runs (one (open day, open count, cum deviation) triple per
  * type — no per-day history retained).
  *
  * Determinism contract: counts and the ×10⁶ reference are exact
  * longs, so the cumulative deviation is replay-deterministic and
  * equal to the batch prefix fold over the same closed days (the spec
  * asserts set equality across a 3-micro-batch replay). Rows within a
  * batch fold in (day, ts_s, event_id) order; across batches arrival
  * order is the monotone-source contract (file/offset order), as with
  * the milestone detector. A late row behind the open day folds into
  * the open day rather than reopening a closed one — the monitor
  * trades per-day exactness of stragglers for bounded state, and the
  * batch operator remains the corrective backfill.
  */
object DriftMonitor {

  case class TypedEvent(event_type: String, day: Long, ts_s: Long, event_id: Long)
  case class DriftRow(event_type: String, day: Long, n: Long,
      cum_dev_fp: Long, alarm: Boolean)

  /** State: (open day, open-day count, cumulative deviation ×10⁶). */
  private type St = (Long, Long, Long)

  class CusumProcessor(refFp: Map[String, Long], thresholdFp: Long)
      extends StatefulProcessor[String, TypedEvent, DriftRow] {
    @transient private var st: ValueState[St] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St]("st",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[DriftRow] = {
      var (openDay, cnt, cum) = if (st.exists()) st.get() else (-1L, 0L, 0L)
      val ref = refFp.getOrElse(key, 0L)
      val out = Seq.newBuilder[DriftRow]
      rows.toSeq.sortBy(r => (r.day, r.ts_s, r.event_id)).foreach { r =>
        if (openDay == -1L) openDay = r.day
        while (r.day > openDay) { // close the open day, then any gap days at n=0
          cum += cnt * 1000000L - ref
          out += DriftRow(key, openDay, cnt, cum, math.abs(cum) > thresholdFp)
          openDay += 1; cnt = 0L
        }
        cnt += 1 // late rows behind the open day fold into it (see Scaladoc)
      }
      st.update((openDay, cnt, cum))
      out.result().iterator
    }
  }

  /** The batch-published reference: each type's mean daily event count
    * ×10⁶, floor(x+0.5)-snapped so the frozen constant is identical on
    * any engine that recomputes it. */
  def referenceRates(spark: SparkSession, sfDir: String): Map[String, Long] =
    graft.sources.Tables.eventsTimed(spark, sfDir)
      .groupBy(col("event_type"), expr("ts_s div 86400").as("day"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("nd"), sum(col("n")).as("tot"))
      .collect()
      .map(r => r.getString(0) ->
        math.floor(r.getLong(2).toDouble * 1000000L / r.getLong(1) + 0.5).toLong)
      .toMap

  def cusumStream(spark: SparkSession, srcDir: String,
      refFp: Map[String, Long], thresholdFp: Long,
      maxFilesPerTrigger: Int = 0): Dataset[DriftRow] = {
    import spark.implicits._
    EventStreams.eventStreamFromDir(spark, srcDir, maxFilesPerTrigger)
      .select(col("event_type"), expr("ts_s div 86400").as("day"),
        col("ts_s"), col("event_id"))
      .as[TypedEvent]
      .groupByKey(_.event_type)
      .transformWithState(new CusumProcessor(refFp, thresholdFp),
        TimeMode.None(), OutputMode.Append())
  }
}

/** Streaming Kalman level monitor — ev_kalman_level's deployment
  * shape, sharing DriftMonitor's split: a batch job freezes each
  * type's ×10⁶ mean daily rate; the stream folds per-type daily
  * counts through the local-level Kalman recursion as days close and
  * emits one row per CLOSED day carrying the filtered level (in
  * mean-relative units) and the running standardized-innovation sum.
  * State is O(|types|): (open day, open count, a, P, Σv²/F) per type.
  *
  * Determinism contract: days close in order (gap days at n = 0, late
  * rows fold into the open day — the DriftMonitor contract), so the
  * double-precision recursion replays identically across restarts and
  * equals the batch prefix fold over the same closed days (spec-
  * asserted across a 3-micro-batch replay). Normalization uses the
  * FROZEN reference rate, not the live series mean — the same
  * frozen-statistics split as the CUSUM monitor; the batch operator
  * (whose mean is the full series') remains the corrective backfill.
  */
object LevelMonitor {

  import DriftMonitor.TypedEvent

  case class LevelRow(event_type: String, day: Long, n: Long,
      level: Double, ssq: Double)

  /** State: (open day, open-day count, a, P, Σv²/F); P < 0 marks
    * "no day closed yet" (the diffuse init happens at first close). */
  private type St = (Long, Long, Double, Double, Double)

  class KalmanProcessor(refFp: Map[String, Long])
      extends StatefulProcessor[String, TypedEvent, LevelRow] {
    @transient private var st: ValueState[St] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St]("st",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaDouble, Encoders.scalaDouble, Encoders.scalaDouble),
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[LevelRow] = {
      var (openDay, cnt, a, p, ssq) =
        if (st.exists()) st.get() else (-1L, 0L, 0.0, -1.0, 0.0)
      val ref = refFp.getOrElse(key, 1L).toDouble
      val out = Seq.newBuilder[LevelRow]
      rows.toSeq.sortBy(r => (r.day, r.ts_s, r.event_id)).foreach { r =>
        if (openDay == -1L) openDay = r.day
        while (r.day > openDay) { // close the open day + any gap days
          val z = cnt * 1000000.0 / ref
          if (p < 0) { a = z; p = 10000000.0; ssq = 0.0 }
          else {
            val pp = p + 0.1
            val k = pp / (pp + 1.0)
            val v = z - a
            a = a + k * v
            p = pp * (1.0 - k)
            ssq = ssq + v * v / (pp + 1.0)
          }
          out += LevelRow(key, openDay, cnt, a, ssq)
          openDay += 1; cnt = 0L
        }
        cnt += 1
      }
      st.update((openDay, cnt, a, p, ssq))
      out.result().iterator
    }
  }

  def levelStream(spark: SparkSession, srcDir: String,
      refFp: Map[String, Long],
      maxFilesPerTrigger: Int = 0): Dataset[LevelRow] = {
    import spark.implicits._
    EventStreams.eventStreamFromDir(spark, srcDir, maxFilesPerTrigger)
      .select(col("event_type"), expr("ts_s div 86400").as("day"),
        col("ts_s"), col("event_id"))
      .as[TypedEvent]
      .groupByKey(_.event_type)
      .transformWithState(new KalmanProcessor(refFp),
        TimeMode.None(), OutputMode.Append())
  }
}
