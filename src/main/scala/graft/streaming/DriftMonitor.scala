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

/** Streaming SPRT monitor — ev_sprt's deployment shape, sharing
  * DriftMonitor's frozen-statistics split: the two ×10⁹-snapped log
  * ratios and the ±ln 19 boundary are frozen constants; the stream
  * folds daily purchase/view counts into the cumulative exact-integer
  * LLR as days close and emits one row per CLOSED day carrying the
  * walk and the STICKY decision (a crossed SPRT boundary is a stop —
  * later days keep reporting the frozen verdict, they cannot undo
  * it). The test is global by definition (one hypothesis), so state is
  * O(1): (open day, s, f, cum, decision) under a single key. At scale
  * the per-day (s, f) reduction belongs upstream of this fold — the
  * monitor's own work per day is two multiplies — and the batch
  * operator remains the corrective backfill (DriftMonitor's late-row
  * contract: stragglers behind the open day fold into it).
  *
  * Determinism contract: all state is exact longs (the batch op's
  * ×10⁹ discipline), so the walk is replay-deterministic and equal to
  * the batch prefix fold over the same closed days (spec-asserted
  * across a 3-micro-batch replay).
  */
object SprtMonitor {

  import DriftMonitor.TypedEvent

  case class SprtRow(day: Long, s: Long, f: Long, llr_fp: Long,
      decision: String)

  /** Frozen constants (l1, l0, a): per-success and per-failure
    * ×10⁹-snapped log ratios and the ln 19 boundary — identical to
    * the batch operator's. */
  def constants(p1: Double, p0: Double): (Long, Long, Long) = (
    math.floor(math.log(p1 / p0) * 1e9 + 0.5).toLong,
    math.floor(math.log((1 - p1) / (1 - p0)) * 1e9 + 0.5).toLong,
    math.floor(math.log(19.0) * 1e9 + 0.5).toLong)

  /** State: (open day, open s, open f, cum LLR ×10⁹, decision:
    * 0 = continue, 1 = accept_h1, -1 = accept_h0). */
  private type St = (Long, Long, Long, Long, Long)

  class SprtProcessor(l1: Long, l0: Long, aa: Long)
      extends StatefulProcessor[String, TypedEvent, SprtRow] {
    @transient private var st: ValueState[St] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[St]("st",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
          Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
    override def handleInputRows(key: String, rows: Iterator[TypedEvent],
        timerValues: TimerValues): Iterator[SprtRow] = {
      var (openDay, s, f, cum, dec) =
        if (st.exists()) st.get() else (-1L, 0L, 0L, 0L, 0L)
      val out = Seq.newBuilder[SprtRow]
      def verdict: String =
        if (dec > 0) "accept_h1" else if (dec < 0) "accept_h0" else "continue"
      rows.toSeq.sortBy(r => (r.day, r.ts_s, r.event_id)).foreach { r =>
        if (openDay == -1L) openDay = r.day
        while (r.day > openDay) { // close the open day + any gap days
          cum += s * l1 + f * l0
          if (dec == 0L && cum >= aa) dec = 1L
          else if (dec == 0L && cum <= -aa) dec = -1L
          out += SprtRow(openDay, s, f, cum, verdict)
          openDay += 1; s = 0L; f = 0L
        }
        if (r.event_type == "purchase") s += 1 else f += 1
      }
      st.update((openDay, s, f, cum, dec))
      out.result().iterator
    }
  }

  def sprtStream(spark: SparkSession, srcDir: String,
      l1: Long, l0: Long, aa: Long,
      maxFilesPerTrigger: Int = 0): Dataset[SprtRow] = {
    import spark.implicits._
    EventStreams.eventStreamFromDir(spark, srcDir, maxFilesPerTrigger)
      .filter(col("event_type").isin("purchase", "view"))
      .select(col("event_type"), expr("ts_s div 86400").as("day"),
        col("ts_s"), col("event_id"))
      .as[TypedEvent]
      .groupByKey(_ => "conv")
      .transformWithState(new SprtProcessor(l1, l0, aa),
        TimeMode.None(), OutputMode.Append())
  }
}
