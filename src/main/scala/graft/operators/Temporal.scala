package graft.operators

import graft.QueryDef
import graft.sources.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Temporal operators over the event log: tumbling windows, gap-based
  * sessionization, funnels, as-of join, range join.
  *
  * The as-of join is the single-shuffle union+window formulation: tag
  * both sides, sort within the key partition by (ts, side), and carry
  * the last left-side row forward with `last(_, ignoreNulls)`. This is
  * the shape that scales — one shuffle on the join key, no per-key
  * loops, no range cross-product. The range join broadcasts the tiny
  * band table (non-equi broadcast join, never a cartesian of facts).
  */
object Temporal {

  private val dec2 = DecimalType(18, 2)

  val defs: Seq[(String, QueryDef)] = Seq(

    // ------------------------------------------------------------------
    "ev_window_agg" -> QueryDef.withOracle(
      """SELECT CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS win_start_s,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events
        |GROUP BY 1, 2""".stripMargin) { (s, dir) =>
      Tables.eventsTimed(s, dir)
        .groupBy(window(col("ts_us"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec2)).cast(DoubleType).as("sum_value"))
        .select(unix_timestamp(col("w.start")).as("win_start_s"),
          col("event_type"), col("n"), col("sum_value"))
    },

    // ------------------------------------------------------------------
    // Gap-based sessionization: a >30 min silence starts a new session.
    // Session ids are per-user ordinals → deterministic.
    "ev_sessionize" -> QueryDef.withOracle(
      """WITH e AS (
        |  SELECT user_id, event_id, value,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events),
        |g AS (
        |  SELECT *, CASE WHEN prev_s IS NULL OR ts_s - prev_s > 1800 THEN 1 ELSE 0 END AS new_sess
        |  FROM (SELECT *, lag(ts_s) OVER (PARTITION BY user_id
        |          ORDER BY ts_s ASC, event_id ASC) AS prev_s FROM e)),
        |t AS (
        |  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ts_s ASC, event_id ASC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_seq
        |  FROM g)
        |SELECT user_id, CAST(sess_seq AS BIGINT) AS sess_seq,
        |  count(*) AS n_events,
        |  min(ts_s) AS sess_start_s, max(ts_s) AS sess_end_s,
        |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sess_value
        |FROM t GROUP BY user_id, sess_seq""".stripMargin) { (s, dir) =>
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s").asc, col("event_id").asc)
      Tables.eventsTimed(s, dir)
        .withColumn("prev_s", lag(col("ts_s"), 1).over(w))
        .withColumn("new_sess",
          when(col("prev_s").isNull || col("ts_s") - col("prev_s") > 1800, 1).otherwise(0))
        .withColumn("sess_seq",
          sum(col("new_sess")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("sess_seq"))
        .agg(count(lit(1)).as("n_events"),
          min(col("ts_s")).as("sess_start_s"),
          max(col("ts_s")).as("sess_end_s"),
          sum(col("value").cast(dec2)).cast(DoubleType).as("sess_value"))
    },

    // ------------------------------------------------------------------
    // Signup→purchase funnel: first purchase at-or-after first signup.
    // Two keyed aggregations + one keyed join — all on user_id.
    "ev_funnel" -> QueryDef.withOracle(
      """WITH su AS (
        |  SELECT user_id, min(CAST(floor(epoch(ts)) AS BIGINT)) AS signup_s
        |  FROM events WHERE event_type = 'signup' GROUP BY user_id),
        |pu AS (
        |  SELECT e.user_id, su.signup_s,
        |    min(CAST(floor(epoch(e.ts)) AS BIGINT)) AS first_purchase_s
        |  FROM events e JOIN su ON e.user_id = su.user_id
        |  WHERE e.event_type = 'purchase'
        |    AND CAST(floor(epoch(e.ts)) AS BIGINT) >= su.signup_s
        |  GROUP BY e.user_id, su.signup_s)
        |SELECT user_id, signup_s, first_purchase_s,
        |  first_purchase_s - signup_s AS conversion_delay_s
        |FROM pu""".stripMargin) { (s, dir) =>
      val ev = Tables.eventsTimed(s, dir)
      val su = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts_s")).as("signup_s"))
      ev.filter(col("event_type") === "purchase")
        .join(su, "user_id")
        .filter(col("ts_s") >= col("signup_s"))
        .groupBy(col("user_id"), col("signup_s"))
        .agg(min(col("ts_s")).as("first_purchase_s"))
        .withColumn("conversion_delay_s", col("first_purchase_s") - col("signup_s"))
    },

    // ------------------------------------------------------------------
    // As-of join: each purchase matched to the user's most recent click
    // at-or-before it. Single shuffle on user_id via union+window.
    "asof_join" -> QueryDef.withOracle(
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |u AS (
        |  SELECT user_id, ts_s, event_id,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts_s ASC, (CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) DESC,
        |                     event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts_s END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts_s ASC, (CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) DESC,
        |                     event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts_s
        |  FROM e)
        |SELECT event_id AS purchase_id, user_id, ts_s AS purchase_ts_s,
        |  click_id, click_ts_s, ts_s - click_ts_s AS gap_s
        |FROM u WHERE is_click = 0""".stripMargin) { (s, dir) =>
      val e = Tables.eventsTimed(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("ts_s"),
          when(col("event_type") === "click", 1).otherwise(0).as("is_click"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s").asc, col("is_click").desc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("click_id",
          last(when(col("is_click") === 1, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("click_ts_s",
          last(when(col("is_click") === 1, col("ts_s")), ignoreNulls = true).over(w))
        .filter(col("is_click") === 0)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_s").as("purchase_ts_s"), col("click_id"), col("click_ts_s"),
          (col("ts_s") - col("click_ts_s")).as("gap_s"))
    },

    // ------------------------------------------------------------------
    // Cohort retention matrix: users bucketed by first-seen week, then
    // counted per (cohort, weeks-since-cohort) — the standard product
    // analytics triangle. Two keyed aggregations + one keyed join, all
    // on user_id / the (cohort, offset) pair; week ids are integer
    // division on floored epoch seconds (cross-engine exact).
    "ev_retention" -> QueryDef.withOracle(
      """WITH e AS (
        |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) // 604800 AS week
        |  FROM events),
        |f AS (SELECT user_id, min(week) AS cohort_week FROM e GROUP BY user_id),
        |a AS (SELECT DISTINCT e.user_id, f.cohort_week,
        |        e.week - f.cohort_week AS week_offset
        |      FROM e JOIN f ON e.user_id = f.user_id)
        |SELECT cohort_week, week_offset, count(*) AS n_active
        |FROM a GROUP BY cohort_week, week_offset""".stripMargin) { (s, dir) =>
      val e = Tables.eventsTimed(s, dir)
        // integer div, not double-divide-then-truncate (boundary-safe)
        .select(col("user_id"), expr("ts_s div 604800").as("week"))
      val cohort = e.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
      e.join(cohort, "user_id")
        .select(col("user_id"), col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .distinct()
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
    },

    // ------------------------------------------------------------------
    // Outlier flagging from exact per-group moments (the q21 protocol:
    // decimal power sums → double mean/std with an expression shape
    // shared verbatim with the oracle). One aggregation + one broadcast
    // join back to the stream — no window over the full event log.
    "ev_anomaly" -> QueryDef.withOracle(
      """WITH stats AS (
        |  SELECT event_type, count(*) AS n,
        |    sum(CAST(value AS DECIMAL(18,2))) AS s1,
        |    sum(CAST(value * value AS DECIMAL(18,4))) AS s2
        |  FROM events GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.value,
        |  round((e.value - CAST(s.s1 AS DOUBLE) / s.n) /
        |    sqrt((CAST(s.s2 AS DOUBLE) - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / s.n)
        |         / (s.n - 1)), 9) AS z,
        |  abs((e.value - CAST(s.s1 AS DOUBLE) / s.n) /
        |    sqrt((CAST(s.s2 AS DOUBLE) - CAST(s.s1 AS DOUBLE) * CAST(s.s1 AS DOUBLE) / s.n)
        |         / (s.n - 1))) > 3 AS is_anomaly
        |FROM events e JOIN stats s ON e.event_type = s.event_type""".stripMargin) { (s, dir) =>
      val stats = Tables.events(s, dir)
        .groupBy(col("event_type").as("st_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec2)).as("s1"),
          sum((col("value") * col("value")).cast(DecimalType(18, 4))).as("s2"))
      val mean = col("s1").cast(DoubleType) / col("n")
      val variance = (col("s2").cast(DoubleType) -
        col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / col("n")) /
        (col("n") - 1)
      val z = (col("value") - mean) / sqrt(variance)
      Tables.events(s, dir)
        .join(broadcast(stats), col("event_type") === col("st_type"))
        .select(col("event_id"), col("event_type"), col("value"),
          round(z, 9).as("z"), (abs(z) > 3).as("is_anomaly"))
    },

    // ------------------------------------------------------------------
    // Range join against a tiny band table: broadcast non-equi join.
    "range_join" -> QueryDef.withOracle(
      """SELECT b.band_label, count(*) AS n,
        |  CAST(sum(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events e
        |JOIN (VALUES ('b0_low', 0, 100), ('b1_mid', 100, 200), ('b2_high', 200, 300),
        |             ('b3_vhigh', 300, 400), ('b4_top', 400, 1000000)) b(band_label, lo, hi)
        |  ON e.value >= b.lo AND e.value < b.hi
        |GROUP BY b.band_label""".stripMargin) { (s, dir) =>
      import s.implicits._
      val bands = Seq(
        ("b0_low", 0, 100), ("b1_mid", 100, 200), ("b2_high", 200, 300),
        ("b3_vhigh", 300, 400), ("b4_top", 400, 1000000))
        .toDF("band_label", "lo", "hi")
      Tables.events(s, dir)
        .join(broadcast(bands), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("band_label"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(dec2)).cast(DoubleType).as("sum_value"))
    },

    // ------------------------------------------------------------------
    // First-order Markov transition matrix over per-user event
    // sequences: P(next_type | type), the session-model behind
    // next-action prediction and funnel drop-off analysis. The lead()
    // window is per-user (bounded partitions), the transition table is
    // |types|² rows, and the probabilities divide exact integer counts
    // — one bounded window + one keyed agg at any corpus size.
    "ev_markov_transitions" -> QueryDef.withOracle(
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id) AS next_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |    CAST(count(*) AS BIGINT) AS n
        |  FROM seq WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        |  round(n * 1.0 / (sum(n) OVER (PARTITION BY from_type)), 9) AS p
        |FROM t""".stripMargin) { (s, dir) =>
      val wSeq = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s"), col("event_id"))
      val wFrom = Window.partitionBy(col("from_type"))
      Tables.eventsTimed(s, dir)
        .withColumn("next_type", lead(col("event_type"), 1).over(wSeq))
        .filter(col("next_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
        .agg(count(lit(1)).as("n"))
        .withColumn("p", round(col("n") * lit(1.0) / sum(col("n")).over(wFrom), 9))
    },

    // ------------------------------------------------------------------
    // As-of join with a lookback tolerance: the standard market-data /
    // attribution variant — a click only matches a purchase within the
    // trailing 10 minutes; staler matches degrade to no-match rather
    // than attributing to ancient history. Same single-shuffle
    // union+window plan as asof_join; the tolerance is a row-local
    // post-filter on the already-found latest match (NOT a second
    // window), so the cost is identical.
    "asof_join_tolerance" -> QueryDef.withOracle(
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS ts_s
        |  FROM events WHERE event_type IN ('click', 'purchase')),
        |u AS (
        |  SELECT user_id, ts_s, event_id,
        |    CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_click,
        |    last_value(CASE WHEN event_type = 'click' THEN event_id END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts_s ASC, (CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) DESC,
        |                     event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_id,
        |    last_value(CASE WHEN event_type = 'click' THEN ts_s END IGNORE NULLS)
        |      OVER (PARTITION BY user_id
        |            ORDER BY ts_s ASC, (CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) DESC,
        |                     event_id ASC
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS click_ts_s
        |  FROM e)
        |SELECT event_id AS purchase_id, user_id, ts_s AS purchase_ts_s,
        |  CASE WHEN ts_s - click_ts_s <= 600 THEN click_id END AS click_id,
        |  CASE WHEN ts_s - click_ts_s <= 600 THEN click_ts_s END AS click_ts_s,
        |  CASE WHEN ts_s - click_ts_s <= 600 THEN ts_s - click_ts_s END AS gap_s
        |FROM u WHERE is_click = 0""".stripMargin) { (s, dir) =>
      val e = Tables.eventsTimed(s, dir)
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("user_id"), col("event_id"), col("ts_s"),
          when(col("event_type") === "click", 1).otherwise(0).as("is_click"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_s").asc, col("is_click").desc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val inTol = col("ts_s") - col("raw_ts") <= 600
      e.withColumn("raw_id",
          last(when(col("is_click") === 1, col("event_id")), ignoreNulls = true).over(w))
        .withColumn("raw_ts",
          last(when(col("is_click") === 1, col("ts_s")), ignoreNulls = true).over(w))
        .filter(col("is_click") === 0)
        .select(col("event_id").as("purchase_id"), col("user_id"),
          col("ts_s").as("purchase_ts_s"),
          when(inTol, col("raw_id")).as("click_id"),
          when(inTol, col("raw_ts")).as("click_ts_s"),
          when(inTol, col("ts_s") - col("raw_ts")).as("gap_s"))
    }
  )
}
