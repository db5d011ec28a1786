package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal/event operators over the `events` table — the streaming-shaped
  * capability surface in batch form (SURVEY §2.8: the reference is
  * batch-only; its closest temporal construct is the daily dt= partition).
  * The same window/gap logic runs under Structured Streaming in
  * graft.streaming.EventStream.
  */
object Sessions {
  type Q = (SparkSession, String) => DataFrame

  val SessionGapMinutes = 30L

  // Sessionization: gap > 30 min starts a new session. lag + running sum
  // over a (user, time) window — one shuffle on user_id; epoch micros
  // comparison avoids interval-type divergence between engines.
  val qSessionize: Q = (s, d) => {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
             unix_micros(col("ts")) - col("prev_us") > SessionGapMinutes * 60L * 1000000L,
             1L).otherwise(0L))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
           count(lit(1)).as("n_events"))
    // No final orderBy: corpus-sized output; the gate sorts rows.
  }

  val qSessionizeSql: String =
    """WITH x AS (
      |  SELECT user_id,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
      |       count(*) AS n_events
      |FROM x GROUP BY 1 ORDER BY 1""".stripMargin

  // Time-bucket aggregation (hourly tumbling window) — Spark's window()
  // operator (the Structured-Streaming-compatible form), value sums made
  // exact via decimal. The transform is shared verbatim with the
  // streaming plane (graft.streaming.EventStream) so batch/stream parity
  // is by construction, not by keeping two copies in sync.
  def hourlyAggTransform(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
              col("event_type"), col("n_events"), col("value_sum"))

  val qEventWindow: Q = (s, d) =>
    hourlyAggTransform(Tables.events(s, d))
      .orderBy(col("bucket"), col("event_type"))

  val qEventWindowSql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS bucket,
      |       event_type, count(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Native session windows: the same 30-minute-gap sessionization
  // expressed with Spark's session_window() aggregation — the
  // Structured-Streaming-compatible operator (merging session state,
  // usable under watermarks) rather than the batch gaps-and-islands
  // window above. The oracle IS gaps-and-islands SQL, which pins the
  // two formulations equal. Boundary semantics: Spark merges an event
  // into a session iff it starts strictly before session_end = last_ts
  // + gap, so a gap of exactly 30 min starts a new session → the oracle
  // flags new sessions with >= (q_sessionize's lag formulation uses >,
  // which only differs ON the exact boundary — unreachable with
  // microsecond timestamps in this corpus, but kept correct anyway).
  val qSessionWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(col("user_id"),
               session_window(col("ts"), s"$SessionGapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"),
           max(unix_micros(col("ts"))).as("session_end_us"))
      .select(col("user_id"),
              unix_micros(col("session_window.start")).as("session_start_us"),
              col("session_end_us"), col("n_events"), col("value_sum"))
    // No final orderBy: O(sessions) output; the gate sorts rows.

  val qSessionWindowSql: String =
    """WITH x AS (
      |  SELECT user_id, ts, event_id, value,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
      |              THEN 1 ELSE 0 END AS ns
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (
      |  SELECT *, SUM(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM x)
      |SELECT user_id,
      |       CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start_us,
      |       CAST(epoch_us(MAX(ts)) AS BIGINT) AS session_end_us,
      |       COUNT(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM g GROUP BY user_id, sid""".stripMargin

  // As-of (temporal) join: for every purchase, the user's most recent
  // click at-or-before it — an operator Spark has no native node for,
  // composed per the preference order (SURVEY §7.3 / prompt rule (a)):
  // tag-union both sides, then `last(click, ignoreNulls) OVER (user
  // ORDER BY ts, side, id)` carries the latest click forward into each
  // purchase row. One shuffle on user_id, no range-join explosion —
  // the standard distributed as-of plan. Clicks are deduped to one per
  // (user, ts) first so same-timestamp ties are unambiguous in both
  // engines (the oracle is DuckDB's native ASOF LEFT JOIN).
  val qAsofJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id"), col("ts"))
      .agg(max(col("event_id")).as("click_id"))
      .select(col("user_id"), col("ts"), lit(0).as("side"),
              col("click_id").as("event_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), lit(1).as("side"), col("event_id"))
    // side 0 < 1: a click at the exact purchase timestamp sorts first,
    // so it is visible to the purchase — matching ASOF's >= semantics.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("side"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    clicks.unionByName(purchases)
      .withColumn("last_click",
        last(when(col("side") === 0,
                  struct(col("ts").as("cts"), col("event_id").as("cid"))),
             ignoreNulls = true).over(w))
      .filter(col("side") === 1)
      .select(col("event_id"),
              col("user_id"),
              unix_micros(col("ts")).as("purchase_us"),
              col("last_click.cid").as("click_id"),
              (unix_micros(col("ts")) - unix_micros(col("last_click.cts")))
                .as("gap_us"))
    // No final orderBy: corpus-sized output; the gate sorts rows.
  }

  val qAsofJoinSql: String =
    """WITH clicks AS (
      |  SELECT user_id, ts, max(event_id) AS click_id
      |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
      |purch AS (
      |  SELECT user_id, ts, event_id FROM events WHERE event_type = 'purchase')
      |SELECT p.event_id, p.user_id,
      |       CAST(epoch_us(p.ts) AS BIGINT) AS purchase_us,
      |       c.click_id,
      |       CAST(epoch_us(p.ts) - epoch_us(c.ts) AS BIGINT) AS gap_us
      |FROM purch p ASOF LEFT JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts
      |ORDER BY p.event_id""".stripMargin

  // Sketch aggregation: HyperLogLog distinct-user estimate per event
  // type next to the exact count. Engine-native HLL++ sketches differ
  // per engine, so instead the sketch itself is portable: md5-60-bit
  // hashes (identical in Spark and DuckDB), m=64 registers (low 6 bits),
  // rank = leading-zero position in the remaining 54 bits, and the
  // register sum Σ 2^(−M_r) carried as the EXACT integer Σ 2^(55−M_r)
  // (≤ 64·2^54 < 2^63) so float summation order can't perturb the
  // estimate — making a cardinality sketch hash-match an oracle exactly.
  // At scale this is the same two-level aggregation HLL always is:
  // partial per-partition register maxes, tiny merge.
  val HllRegisters = 64 // 6-bit register index; alpha below is for m=64
  val HllAlpha = 0.709

  /** Relational formulation of the sketch (register max as a groupBy,
    * exact-integer register sum): the semantic reference the SQL oracle
    * transliterates, and the spec's pin for the native aggregate below.
    */
  def hllRelational(s: SparkSession, d: String): DataFrame = {
    val m = HllRegisters
    val twoP55 = 1L << 55
    val hashed = Tables.events(s, d)
      .select(col("event_type"),
              graft.ops.Ops.md5Bits60(col("user_id").cast("string")).as("h"))
      .select(col("event_type"),
              (col("h") % m).as("r"),
              shiftright(col("h"), 6).as("w"))
      .withColumn("rank",
        when(col("w") === 0L, lit(55)).otherwise(lit(55) - length(bin(col("w")))))
    val regs = hashed.groupBy(col("event_type"), col("r"))
      .agg(max(col("rank")).as("mr"))
    val z = regs.groupBy(col("event_type"))
      .agg((sum(pow(lit(2.0), lit(55) - col("mr")).cast("bigint")) +
              (lit(m.toLong) - count(lit(1))) * twoP55).as("zs"),
           (lit(m.toLong) - count(lit(1))).as("v"))
    // alpha·m²·2^55 folded to one double literal (exact: the two factors
    // beyond alpha are powers of two), shared verbatim with the oracle so
    // neither engine's constant-folding order can matter.
    val estRaw = lit(HllAlpha * (m.toDouble * m.toDouble) * twoP55.toDouble) /
      col("zs").cast("double")
    z.select(col("event_type"),
      when(estRaw <= lit(2.5 * m) && col("v") > 0,
           lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
        .otherwise(estRaw).as("e"))
  }

  /** The production path runs the native single-pass sketch
    * (graftshim.HllSketchAgg: 64-byte partial state per group per
    * partition, register-wise merge) — pinned bit-equal to
    * hllRelational by spec, so the relational SQL oracle still applies.
    */
  val qApproxDistinct: Q = (s, d) => {
    import org.apache.spark.sql.graftshim.{HllSketchAgg, Shim}
    val sketch = Shim.column(HllSketchAgg(
      Shim.expression(graft.ops.Ops.md5Bits60(col("user_id").cast("string"))))
      .toAggregateExpression())
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"),
           round(sketch, 4).as("approx_users"),
           count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  val qApproxDistinctSql: String =
    s"""WITH h AS (
       |  SELECT event_type,
       |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
       |  FROM events),
       |regs AS (
       |  SELECT event_type, h % 64 AS r,
       |         MAX(CASE WHEN (h >> 6) = 0 THEN 55
       |                  ELSE 55 - length(bin(h >> 6)) END) AS mr
       |  FROM h GROUP BY 1, 2),
       |z AS (
       |  SELECT event_type,
       |         CAST(SUM(CAST(2 ** (55 - mr) AS BIGINT)) AS BIGINT)
       |           + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 55) AS zs,
       |         CAST(64 - COUNT(*) AS BIGINT) AS v
       |  FROM regs GROUP BY 1),
       |est AS (
       |  SELECT event_type,
       |         CASE WHEN (1.0462993238608057e+20 / CAST(zs AS DOUBLE)) <= 160.0
       |                   AND v > 0
       |              THEN 64.0 * ln(CAST(64 AS DOUBLE) / CAST(v AS DOUBLE))
       |              ELSE 1.0462993238608057e+20 / CAST(zs AS DOUBLE) END AS e
       |  FROM z),
       |base AS (
       |  SELECT event_type, COUNT(DISTINCT user_id) AS exact_users, COUNT(*) AS n_events
       |  FROM events GROUP BY 1)
       |SELECT b.event_type, b.exact_users, round(e.e, 4) AS approx_users, b.n_events
       |FROM base b JOIN est e USING (event_type)
       |ORDER BY 1""".stripMargin

  // Incremental sketch maintenance: per-DAY HLL register states merged
  // across days — the materialized-sketch pattern (keep yesterday's
  // O(m) state, merge today's partial, never rescan history). Register
  // max is associative, so day-level maxes re-merged equal the global
  // registers exactly; the spec additionally pins this query's estimate
  // == q_approx_distinct's. Shape: two-level groupBy, each with map-side
  // partial aggregation; the cross-day merge moves m=64 rows per
  // (event_type, day).
  val qIncrementalDistinct: Q = (s, d) => {
    val m = HllRegisters
    val twoP55 = 1L << 55
    val hashed = Tables.events(s, d)
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
              graft.ops.Ops.md5Bits60(col("user_id").cast("string")).as("h"))
      .select(col("event_type"), col("day"),
              (col("h") % m).as("r"), shiftright(col("h"), 6).as("w"))
      .withColumn("rank",
        when(col("w") === 0L, lit(55)).otherwise(lit(55) - length(bin(col("w")))))
    val daily = hashed.groupBy(col("event_type"), col("day"), col("r"))
      .agg(max(col("rank")).as("mr"))
    val merged = daily.groupBy(col("event_type"), col("r"))
      .agg(max(col("mr")).as("mr"))
    val z = merged.groupBy(col("event_type"))
      .agg((sum(pow(lit(2.0), lit(55) - col("mr")).cast("bigint")) +
              (lit(m.toLong) - count(lit(1))) * twoP55).as("zs"),
           (lit(m.toLong) - count(lit(1))).as("v"))
    val estRaw = lit(HllAlpha * (m.toDouble * m.toDouble) * twoP55.toDouble) /
      col("zs").cast("double")
    val days = daily.select(col("event_type"), col("day")).distinct()
      .groupBy(col("event_type")).agg(count(lit(1)).as("n_days"))
    z.select(col("event_type"),
        when(estRaw <= lit(2.5 * m) && col("v") > 0,
             lit(m.toDouble) * log(lit(m.toDouble) / col("v")))
          .otherwise(estRaw).as("e"))
      .join(days, Seq("event_type"))
      .select(col("event_type"), col("n_days"), round(col("e"), 4).as("approx_users"))
      .orderBy(col("event_type"))
  }

  val qIncrementalDistinctSql: String =
    """WITH h AS (
      |  SELECT event_type, date_trunc('day', ts) AS day,
      |         ('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      |  FROM events),
      |daily AS (
      |  SELECT event_type, day, h % 64 AS r,
      |         MAX(CASE WHEN (h >> 6) = 0 THEN 55
      |                  ELSE 55 - length(bin(h >> 6)) END) AS mr
      |  FROM h GROUP BY 1, 2, 3),
      |merged AS (
      |  SELECT event_type, r, MAX(mr) AS mr FROM daily GROUP BY 1, 2),
      |z AS (
      |  SELECT event_type,
      |         CAST(SUM(CAST(2 ** (55 - mr) AS BIGINT)) AS BIGINT)
      |           + (64 - COUNT(*)) * (CAST(1 AS BIGINT) << 55) AS zs,
      |         CAST(64 - COUNT(*) AS BIGINT) AS v
      |  FROM merged GROUP BY 1),
      |est AS (
      |  SELECT event_type,
      |         CASE WHEN (1.0462993238608057e+20 / CAST(zs AS DOUBLE)) <= 160.0
      |                   AND v > 0
      |              THEN 64.0 * ln(CAST(64 AS DOUBLE) / CAST(v AS DOUBLE))
      |              ELSE 1.0462993238608057e+20 / CAST(zs AS DOUBLE) END AS e
      |  FROM z),
      |days AS (
      |  SELECT event_type, CAST(COUNT(DISTINCT day) AS BIGINT) AS n_days
      |  FROM h GROUP BY 1)
      |SELECT e.event_type, d.n_days, round(e.e, 4) AS approx_users
      |FROM est e JOIN days d USING (event_type)
      |ORDER BY 1""".stripMargin

  // Funnel analysis: how many users progressed view → click → purchase
  // IN ORDER (each step's first occurrence after the previous step's).
  // One groupBy(user) with conditional min-timestamp aggregates — the
  // two-phase step timestamps are derived per user, not via k-way
  // self-joins, so the plan is a single shuffle however many steps.
  // Steps are counted on the strictly-ordered first-occurrence chain:
  // step2 = first click AFTER first view, step3 = first purchase AFTER
  // that click.
  val qFunnel: Q = (s, d) => {
    // One filtered projection feeds all steps: only the funnel's three
    // event types ever reach a shuffle, and step 1 groups view rows
    // only — non-funnel volume (errors, pings) never ships.
    val ev = Tables.events(s, d)
      .filter(col("event_type").isin("view", "click", "purchase"))
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val perUser = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id"))
      .agg(min(col("us")).as("t_view"))
    val clicks = ev.filter(col("event_type") === "click")
      .join(perUser, Seq("user_id"))
      .filter(col("us") > col("t_view"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t_click"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .join(clicks, Seq("user_id"))
      .filter(col("us") > col("t_click"))
      .groupBy(col("user_id")).agg(min(col("us")).as("t_purchase"))
    perUser
      .join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .agg(count(col("t_view")).as("n_step1_view"),
           count(col("t_click")).as("n_step2_click"),
           count(col("t_purchase")).as("n_step3_purchase"))
  }

  val qFunnelSql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type, CAST(epoch_us(ts) AS BIGINT) AS us FROM events
      |  WHERE event_type IN ('view', 'click', 'purchase')),
      |v AS (
      |  SELECT user_id, MIN(us) AS t_view
      |  FROM ev WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, MIN(e.us) AS t_click
      |  FROM ev e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND e.us > v.t_view
      |  GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, MIN(e.us) AS t_purchase
      |  FROM ev e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND e.us > c.t_click
      |  GROUP BY 1)
      |SELECT COUNT(v.t_view) AS n_step1_view,
      |       COUNT(c.t_click) AS n_step2_click,
      |       COUNT(p.t_purchase) AS n_step3_purchase
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id""".stripMargin

  // Cohort retention: users grouped by first-activity week; for each
  // (cohort, weeks-since) cell, how many distinct cohort members were
  // active that week. The canonical engagement matrix — one firstseen
  // aggregate + one join + one distinct count, all key-partitioned.
  val qRetentionCohorts: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"),
              floor(unix_micros(col("ts")) / (7L * 86400L * 1000000L))
                .cast("bigint").as("week"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_week"), (col("week") - col("cohort_week")).as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("weeks_since"))
  }

  val qRetentionCohortsSql: String =
    """WITH ev AS (
      |  SELECT user_id,
      |         CAST(FLOOR(epoch_us(ts) / 604800000000.0) AS BIGINT) AS week
      |  FROM events),
      |cohort AS (SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1)
      |SELECT c.cohort_week, e.week - c.cohort_week AS weeks_since,
      |       CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
      |FROM ev e JOIN cohort c ON e.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Ingestion anomaly detection: per event_type, flag days whose event
  // count deviates from that type's mean by more than Z standard
  // deviations — the data-quality gate a pipeline runs before trusting
  // a day's partition. Mean/std derive in double from exact sums
  // (order-free at any parallelism); the squared term multiplies in
  // DECIMAL so extreme per-day counts can't silently wrap in BIGINT
  // (Spark non-ANSI wraps where DuckDB raises). The z-score itself is
  // per-row IEEE math rounded before the threshold compare.
  val AnomalyZ = 1.5

  val qAnomalyDays: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val stats = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
           sum(col("cnt")).as("s1"),
           sum(col("cnt").cast("decimal(19,0)") * col("cnt")).as("s2"))
    val n = col("n_days").cast("double")
    val mean = col("s1").cast("double") / n
    val variance = (col("s2").cast("double") - n * mean * mean) / (n - 1.0)
    // Degenerate series guard: a single-day or zero-variance type has
    // no meaningful z (0/0 = NaN, and NaN > threshold is TRUE in both
    // engines' NaN-high orderings — every day would be "anomalous").
    daily.join(stats, Seq("event_type"))
      .withColumn("var_", variance)
      .withColumn("z", round((col("cnt") - mean) / sqrt(col("var_")), 6))
      .filter(col("n_days") > 1 && col("var_") > 0 && abs(col("z")) > AnomalyZ)
      .select(col("event_type"),
              date_format(col("day"), "yyyy-MM-dd").as("day"),
              col("cnt"), col("z"))
      .orderBy(col("event_type"), col("day"))
  }

  val qAnomalyDaysSql: String =
    s"""WITH daily AS (
       |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |stats AS (
       |  SELECT event_type, count(*) AS n_days,
       |         CAST(SUM(cnt) AS BIGINT) AS s1,
       |         SUM(CAST(cnt AS HUGEINT) * cnt) AS s2
       |  FROM daily GROUP BY 1),
       |scored AS (
       |  SELECT d.event_type, strftime(d.day, '%Y-%m-%d') AS day, d.cnt,
       |         s.n_days,
       |         (CAST(s.s2 AS DOUBLE)
       |            - CAST(s.n_days AS DOUBLE)
       |              * (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE))
       |              * (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE)))
       |           / (CAST(s.n_days AS DOUBLE) - 1.0) AS var_,
       |         round((d.cnt - CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE)) /
       |               sqrt((CAST(s.s2 AS DOUBLE)
       |                      - CAST(s.n_days AS DOUBLE)
       |                        * (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE))
       |                        * (CAST(s.s1 AS DOUBLE) / CAST(s.n_days AS DOUBLE)))
       |                    / (CAST(s.n_days AS DOUBLE) - 1.0)), 6) AS z
       |  FROM daily d JOIN stats s ON d.event_type = s.event_type)
       |SELECT event_type, day, cnt, z FROM scored
       |WHERE n_days > 1 AND var_ > 0 AND abs(z) > $AnomalyZ
       |ORDER BY 1, 2""".stripMargin

  // Lag-1 autocorrelation of the daily event-count series per type —
  // the temporal-stats shape (is yesterday predictive of today?): one
  // window lag to pair consecutive days, then the exact-sufficient-sums
  // Pearson over the pairs, same discipline as q_corr_stats.
  val qAutocorr: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val pairs = daily
      .withColumn("prev", lag(col("cnt"), 1).over(w))
      .filter(col("prev").isNotNull)
    val sums = pairs.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("cnt")).as("sx"), sum(col("prev")).as("sy"),
           // DECIMAL-widened products: BIGINT cnt*cnt would wrap
           // silently in Spark (non-ANSI) at extreme daily counts.
           sum(col("cnt").cast("decimal(19,0)") * col("prev")).as("sxy"),
           sum(col("cnt").cast("decimal(19,0)") * col("cnt")).as("sxx"),
           sum(col("prev").cast("decimal(19,0)") * col("prev")).as("syy"))
    val n = col("n").cast("double")
    def dbl(c: String) = col(c).cast("double")
    val num = n * dbl("sxy") - dbl("sx") * dbl("sy")
    val den = sqrt(n * dbl("sxx") - dbl("sx") * dbl("sx")) *
      sqrt(n * dbl("syy") - dbl("sy") * dbl("sy"))
    // NULL (not NaN) for constant series: den = 0 would give 0/0 = NaN,
    // and NaN != NaN breaks any exact gate even when both engines agree.
    sums.select(col("event_type"), col("n"),
                when(den =!= 0.0, round(num / den, 6)).as("lag1_autocorr"))
      .orderBy(col("event_type"))
  }

  val qAutocorrSql: String =
    """WITH daily AS (
      |  SELECT event_type, date_trunc('day', ts) AS day, count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |pairs AS (
      |  SELECT event_type, cnt,
      |         lag(cnt) OVER (PARTITION BY event_type ORDER BY day) AS prev
      |  FROM daily),
      |sums AS (
      |  SELECT event_type, count(*) AS n,
      |         CAST(SUM(cnt) AS BIGINT) AS sx, CAST(SUM(prev) AS BIGINT) AS sy,
      |         SUM(CAST(cnt AS HUGEINT) * prev) AS sxy,
      |         SUM(CAST(cnt AS HUGEINT) * cnt) AS sxx,
      |         SUM(CAST(prev AS HUGEINT) * prev) AS syy
      |  FROM pairs WHERE prev IS NOT NULL GROUP BY 1),
      |derived AS (
      |  SELECT event_type, n,
      |         CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS num,
      |         sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
      |         sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
      |                - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) AS den
      |  FROM sums)
      |SELECT event_type, n,
      |       CASE WHEN den <> 0 THEN round(num / den, 6) END AS lag1_autocorr
      |FROM derived ORDER BY 1""".stripMargin

  // Hopping (sliding) window aggregation: 1-hour windows every 30
  // minutes — each event lands in exactly 2 overlapping windows.
  // Spark's window(ts, len, slide) is the Structured-Streaming-
  // compatible operator; the oracle reproduces the window set
  // relationally (each event joins its ⌊len/slide⌋ covering grid
  // starts). Exact decimal value sums as everywhere.
  val qHoppingWindow: Q = (s, d) =>
    Tables.events(s, d)
      .groupBy(window(col("ts"), "1 hour", "30 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("w_start"),
              col("event_type"), col("n_events"), col("value_sum"))
      .orderBy(col("w_start"), col("event_type"))

  // Oracle stays in the NAIVE timestamp domain: to_timestamp() would
  // return TIMESTAMPTZ and strftime would then render it in the host's
  // session TimeZone (environment-dependent gate); make_timestamp(µs)
  // keeps the plain-TIMESTAMP rendering that matches Spark's UTC pin.
  val qHoppingWindowSql: String =
    """WITH g AS (
      |  SELECT event_type, value,
      |         make_timestamp(epoch_us(ts) - epoch_us(ts) % 1800000000) AS grid
      |  FROM events),
      |w AS (
      |  SELECT event_type, value, grid AS w_start FROM g
      |  UNION ALL
      |  SELECT event_type, value, grid - INTERVAL 30 MINUTE FROM g)
      |SELECT strftime(w_start, '%Y-%m-%d %H:%M:%S') AS w_start, event_type,
      |       count(*) AS n_events,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM w GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // Ratio-to-report + YoY growth: yearly revenue per market segment
  // with each year's share of its segment total and growth vs the
  // prior year — window functions OVER an aggregate (the reporting
  // layer's standard shape). Ratios are double divisions of exact
  // decimal sums, rounded before compare.
  val qShareGrowth: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val yearly = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"),
               year(col("o_orderdate")).cast("bigint").as("yr"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
    val wSeg = Window.partitionBy(col("c_mktsegment"))
    val wLag = Window.partitionBy(col("c_mktsegment")).orderBy(col("yr"))
    yearly
      .withColumn("seg_total", sum(col("rev")).over(wSeg))
      .withColumn("prev_rev", lag(col("rev"), 1).over(wLag))
      .select(col("c_mktsegment"), col("yr"),
              col("rev").cast("double").as("revenue"),
              round(col("rev").cast("double") / col("seg_total").cast("double"), 6)
                .as("share_of_segment"),
              round(col("rev").cast("double") / col("prev_rev").cast("double")
                      - 1.0, 6).as("yoy_growth"))
      .orderBy(col("c_mktsegment"), col("yr"))
  }

  val qShareGrowthSql: String =
    """WITH yearly AS (
      |  SELECT c_mktsegment, CAST(year(o_orderdate) AS BIGINT) AS yr,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2)
      |SELECT c_mktsegment, yr,
      |       CAST(rev AS DOUBLE) AS revenue,
      |       round(CAST(rev AS DOUBLE) /
      |             CAST(SUM(rev) OVER (PARTITION BY c_mktsegment) AS DOUBLE), 6)
      |         AS share_of_segment,
      |       round(CAST(rev AS DOUBLE) /
      |             CAST(lag(rev) OVER (PARTITION BY c_mktsegment ORDER BY yr)
      |                  AS DOUBLE) - 1.0, 6) AS yoy_growth
      |FROM yearly ORDER BY 1, 2""".stripMargin

  // Count-Min sketch — the classic point-frequency summary completing
  // the sketch family (HLL distinct, Misra-Gries heavy hitters, TopK,
  // binned quantiles): a depth×width counter matrix built with one
  // groupBy (mergeable: matrices add), probed by min over the depth
  // rows — estimates never undercount (spec-pinned). Same portable
  // md5 + affine hash family as MinHash, so DuckDB rebuilds the
  // identical matrix and the estimates hash-match exactly.
  val CmsDepth = 4
  val CmsWidth = 256

  val qCountMin: Q = (s, d) => {
    def cmHash(x: org.apache.spark.sql.Column, i: org.apache.spark.sql.Column) =
      ((i * 2L + 1L) * x + (i * 1000003L + 12345L)) % graft.ops.Ops.HashModP % CmsWidth
    val hashed = Tables.events(s, d)
      .select(col("user_id"),
              (graft.ops.Ops.md5Bits60(concat(col("user_id").cast("string"), lit(":cm")))
                 % graft.ops.Ops.HashModP).as("x"))
    val sketch = hashed
      .select(col("x"), explode(sequence(lit(0L), lit(CmsDepth - 1L))).as("i"))
      .groupBy(col("i"), cmHash(col("x"), col("i")).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
    val probes = hashed.filter(col("user_id") % 7 === 0)
      .groupBy(col("user_id"), col("x")).agg(count(lit(1)).as("exact_n"))
    probes
      .select(col("user_id"), col("exact_n"),
              explode(sequence(lit(0L), lit(CmsDepth - 1L))).as("pi"), col("x"))
      .join(sketch, sketch("i") === col("pi") &&
                    sketch("bucket") === cmHash(col("x"), col("pi")))
      .groupBy(col("user_id"), col("exact_n"))
      .agg(min(col("cnt")).as("cms_est"))
      .orderBy(col("user_id"))
  }

  val qCountMinSql: String =
    s"""WITH hashed AS (
       |  SELECT user_id,
       |         ('0x' || substr(md5(CAST(user_id AS VARCHAR) || ':cm'), 1, 15))::BIGINT
       |           % 1000000007 AS x
       |  FROM events),
       |sketch AS (
       |  SELECT i.i AS i,
       |         ((i.i * 2 + 1) * x + (i.i * 1000003 + 12345)) % 1000000007
       |           % $CmsWidth AS bucket,
       |         count(*) AS cnt
       |  FROM hashed CROSS JOIN generate_series(0, ${CmsDepth - 1}) i(i)
       |  GROUP BY 1, 2),
       |probes AS (
       |  SELECT user_id, x, count(*) AS exact_n FROM hashed
       |  WHERE user_id % 7 = 0 GROUP BY 1, 2)
       |SELECT p.user_id, p.exact_n, CAST(MIN(s.cnt) AS BIGINT) AS cms_est
       |FROM probes p CROSS JOIN generate_series(0, ${CmsDepth - 1}) i(i)
       |JOIN sketch s
       |  ON s.i = i.i
       | AND s.bucket = ((i.i * 2 + 1) * p.x + (i.i * 1000003 + 12345)) % 1000000007
       |                 % $CmsWidth
       |GROUP BY 1, 2 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q_ewma_daily — exponentially-weighted moving average of the daily
  // value series per event type (half-life decay, the monitoring-layer
  // smoother behind trend lines and drift alerts; complements
  // q_anomaly_days' z-score with the estimator real dashboards chart).
  // A bounded EwmaN-term window form, not the recursive form: ewma_t =
  // Σ_{k<EwmaN} x_{t−k}·2^{−k} / Σ_{k present} 2^{−k} — at the head of
  // a series the window renormalizes over the terms that exist.
  //
  // Exactness: daily sums are exact DECIMAL(18,2) (the house value-sum
  // rule) cast to double; every weight is a POWER OF TWO, so each
  // x_k·2^{−k} is an exact IEEE scaling (no rounding anywhere in the
  // numerator terms); both engines evaluate the same left-associated
  // chain over the same lag values, so the emitted double is
  // bit-identical without any snapping.
  //
  // Scale shape: one (type, day) partial-agg shuffle, then a
  // type-keyed window over the BOUNDED daily series (days per type,
  // not events). Nothing corpus-cardinality anywhere.
  // ------------------------------------------------------------------
  val EwmaN = 8

  val qEwmaDaily: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("double")
             .as("value_sum"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val withLags = (1 until EwmaN).foldLeft(daily) { (df, k) =>
      df.withColumn(s"x$k", lag(col("value_sum"), k).over(w))
    }
    val xs = col("value_sum") +: (1 until EwmaN).map(k => col(s"x$k"))
    val num = xs.zipWithIndex.map { case (x, k) =>
      when(x.isNotNull, x * lit(math.pow(0.5, k))).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    val den = xs.zipWithIndex.map { case (x, k) =>
      when(x.isNotNull, lit(math.pow(0.5, k))).otherwise(lit(0.0))
    }.reduceLeft(_ + _)
    withLags
      .select(col("event_type"), col("day"), col("value_sum"),
              (num / den).as("ewma"))
      .orderBy(col("event_type"), col("day"))
  }

  val qEwmaDailySql: String = {
    val lagDefs = (1 until EwmaN)
      .map(k => s"lag(value_sum, $k) OVER tw AS x$k").mkString(",\n       |         ")
    def pow(k: Int): String = s"${math.pow(0.5, k)}"
    val num = (0 until EwmaN).map { k =>
      val x = if (k == 0) "value_sum" else s"x$k"
      s"CASE WHEN $x IS NOT NULL THEN $x * ${pow(k)} ELSE 0.0 END"
    }.reduceLeft((a, b) => s"($a + $b)")
    val den = (0 until EwmaN).map { k =>
      val x = if (k == 0) "value_sum" else s"x$k"
      s"CASE WHEN $x IS NOT NULL THEN ${pow(k)} ELSE 0.0 END"
    }.reduceLeft((a, b) => s"($a + $b)")
    s"""WITH daily AS (
       |  SELECT event_type, CAST(ts AS DATE) AS day,
       |         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE)
       |           AS value_sum
       |  FROM events GROUP BY 1, 2),
       |l AS (
       |  SELECT event_type, day, value_sum,
       |         $lagDefs
       |  FROM daily
       |  WINDOW tw AS (PARTITION BY event_type ORDER BY day))
       |SELECT event_type, day, value_sum,
       |       $num
       |         / $den AS ewma
       |FROM l ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------------------------------
  // q_burstiness — per-event-type Fano factor (index of dispersion)
  // of the DAILY count series over the full observed day grid:
  // D = Var/Mean = (n·Σx² − (Σx)²) / (n·Σx), with absent (type, day)
  // cells counted as 0 — a Poisson-like arrival stream scores ≈ 1,
  // campaign-driven or batchy types score ≫ 1. The dispersion
  // companion to q_ewma_daily's trend line and q_anomaly_days'
  // z-score: the monitoring panel that tells load balancing whether
  // an event type arrives smoothly or in bursts.
  //
  // Exactness: daily counts, n, Σx, Σx² are exact BIGINTs; mean and
  // fano are each ONE IEEE division of identical integers on both
  // engines — no snapping (the ks-test rule).
  //
  // Scale shape: events collapse to (type, day) counts in one
  // partial-agg shuffle; the zero-filled grid is days × types
  // (calendar-bounded — centuries of days fit one task) and the
  // rollup is type-keyed. Never event-cardinality past the first
  // aggregate.
  // ------------------------------------------------------------------
  val qBurstiness: Q = (s, d) => burstiness(Tables.events(s, d))

  /** Core of q_burstiness over any (event_type, ts) frame. */
  def burstiness(events: DataFrame): DataFrame = {
    val daily = events
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("c"))
    val grid = daily.select(col("day")).distinct()
    val types = daily.select(col("event_type")).distinct()
    grid.crossJoin(types)
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), coalesce(col("c"), lit(0L)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("c")).as("n_events"),
           sum(col("c") * col("c")).as("s2"))
      .select(col("event_type"), col("n_days"), col("n_events"),
              (col("n_events").cast("double") / col("n_days").cast("double"))
                .as("mean_daily"),
              ((col("n_days") * col("s2")
                  - col("n_events") * col("n_events")).cast("double")
                 / (col("n_days") * col("n_events")).cast("double"))
                .as("fano"))
      .orderBy(col("event_type"))
  }

  val qBurstinessSql: String =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |grid AS (SELECT DISTINCT day FROM daily),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |cells AS (
      |  SELECT t.event_type, COALESCE(d.c, 0) AS c
      |  FROM grid g CROSS JOIN types t
      |  LEFT JOIN daily d ON d.event_type = t.event_type AND d.day = g.day),
      |agg AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
      |         CAST(SUM(c) AS BIGINT) AS n_events,
      |         CAST(SUM(c * c) AS BIGINT) AS s2
      |  FROM cells GROUP BY 1)
      |SELECT event_type, n_days, n_events,
      |       CAST(n_events AS DOUBLE) / CAST(n_days AS DOUBLE) AS mean_daily,
      |       CAST(n_days * s2 - n_events * n_events AS DOUBLE)
      |         / CAST(n_days * n_events AS DOUBLE) AS fano
      |FROM agg ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_burstiness"      -> qBurstiness,
    "q_ewma_daily"      -> qEwmaDaily,
    "q_count_min"       -> qCountMin,
    "q_hopping_window"  -> qHoppingWindow,
    "q_share_growth"    -> qShareGrowth,
    "q_anomaly_days"    -> qAnomalyDays,
    "q_autocorr"        -> qAutocorr,
    "q_funnel"          -> qFunnel,
    "q_retention_cohorts" -> qRetentionCohorts,
    "q_incremental_distinct" -> qIncrementalDistinct,
    "q_session_window"  -> qSessionWindow,
    "q_sessionize"      -> qSessionize,
    "q_event_window"    -> qEventWindow,
    "q_asof_join"       -> qAsofJoin,
    "q_approx_distinct" -> qApproxDistinct,
  )

  val oracles: Map[String, String] = Map(
    "q_burstiness"      -> qBurstinessSql,
    "q_ewma_daily"      -> qEwmaDailySql,
    "q_count_min"       -> qCountMinSql,
    "q_hopping_window"  -> qHoppingWindowSql,
    "q_share_growth"    -> qShareGrowthSql,
    "q_anomaly_days"    -> qAnomalyDaysSql,
    "q_autocorr"        -> qAutocorrSql,
    "q_funnel"          -> qFunnelSql,
    "q_retention_cohorts" -> qRetentionCohortsSql,
    "q_incremental_distinct" -> qIncrementalDistinctSql,
    "q_session_window"  -> qSessionWindowSql,
    "q_sessionize"      -> qSessionizeSql,
    "q_event_window"    -> qEventWindowSql,
    "q_asof_join"       -> qAsofJoinSql,
    "q_approx_distinct" -> qApproxDistinctSql,
  )
}
