package graft.jobs

import graft.Tables
import graft.ops.Ops
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Aggregation / join breadth beyond the reference's own surface (SURVEY
  * §2.4/§2.5/§2.6 mark these absent-but-free in Spark): pivot, grouping
  * sets, exact percentiles, moment statistics from exact sums, a range
  * (interval lookback) join, and latest-record-per-key dedup — the
  * standard warehouse shapes a user of the reference would reach for
  * next, each exact-oracle-checked against DuckDB.
  *
  * Float-parity conventions follow README "Design for 100 TB": every
  * re-associative aggregate rides DECIMAL (associative, order-free),
  * derived statistics are computed in double FROM those exact sums with
  * the same expression text on both engines, and ranked/derived floats
  * are rounded before comparison.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------
  // Pivot: order-priority counts per market segment (wide layout). The
  // value list is pinned (priorities are a closed domain), so the plan
  // is a single groupBy with one CASE-aggregated column per value — no
  // second pass to discover values, which is what keeps pivot scalable.
  // ------------------------------------------------------------------
  private val Priorities = Seq(
    "1-URGENT" -> "p1_urgent", "2-HIGH" -> "p2_high", "3-MEDIUM" -> "p3_medium",
    "4-NOT SPECIFIED" -> "p4_not_specified", "5-LOW" -> "p5_low")

  val qPivot: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
    val aggs = Priorities.map { case (v, alias) =>
      sum(when(col("o_orderpriority") === v, 1L).otherwise(0L)).as(alias)
    }
    joined.groupBy(col("c_mktsegment"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy(col("c_mktsegment"))
  }

  val qPivotSql: String = {
    val cols = Priorities.map { case (v, alias) =>
      s"CAST(SUM(CASE WHEN o_orderpriority = '$v' THEN 1 ELSE 0 END) AS BIGINT) AS $alias"
    }
    s"""SELECT c_mktsegment,
       |       ${cols.mkString(",\n       ")}
       |FROM orders JOIN customer ON o_custkey = c_custkey
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // Grouping sets: per-returnflag and per-linestatus subtotals plus the
  // grand total in one pass (finer than rollup's prefix hierarchy —
  // q_rollup covers that shape). Subtotal NULLs render as 'ALL' on both
  // sides so NULL sort order can't skew the compare.
  // ------------------------------------------------------------------
  // Two-level (the q_rollup discipline, see CoreQueries.qRollup): the
  // finest-grouping pre-aggregate bounds the Expand's input at |groups|
  // rows instead of replicating the scan once per grouping set.
  val qGroupingSets: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("dq"),
           count(lit(1)).as("n"))
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq()),
        col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("dq")).cast("double").as("sum_qty"),
           sum(col("n")).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("sum_qty"), col("n_rows"))
      .orderBy(col("returnflag"), col("linestatus"))

  // CUBE completes the grouping family (rollup in CoreQueries, explicit
  // grouping sets above): all four (flag × status) subtotal combinations
  // in one pass.
  val qCube: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("dq"),
           count(lit(1)).as("n"))
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("dq")).cast("double").as("sum_qty"),
           sum(col("n")).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("sum_qty"), col("n_rows"))
      .orderBy(col("returnflag"), col("linestatus"))

  val qCubeSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)
      |ORDER BY 1, 2""".stripMargin

  val qGroupingSetsSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Exact percentiles (median / p90, linear interpolation) per line
  // status. l_quantity is integer-valued, so the interpolated values
  // stay well clear of round-to-6 boundaries even if the two engines
  // associate the interpolation differently.
  // ------------------------------------------------------------------
  val qPercentiles: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(round(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY l_quantity)"), 6)
             .as("median_qty"),
           round(expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY l_quantity)"), 6)
             .as("p90_qty"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("l_linestatus"))

  val qPercentilesSql: String =
    """SELECT l_linestatus,
      |       round(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
      |       round(quantile_cont(l_quantity, 0.9), 6) AS p90_qty,
      |       count(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Correlation / stddev per group — NOT via the engines' streaming
  // moment aggregates (their accumulation order varies with partitioning
  // and differs between engines): the five sufficient statistics ride as
  // exact DECIMAL sums, and the moments are derived in double from those
  // with the same expression on both sides. Deterministic at any
  // parallelism — the only way a 1000-executor corr can hash-match.
  // ------------------------------------------------------------------
  val qCorrStats: Q = (s, d) => {
    val x = col("l_quantity")
    val y = col("l_discount")
    val sums = Ops.spreadScan(Tables.lineitem(s, d)
        .select(col("l_linestatus"), x, y))
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
           sum(x.cast("decimal(28,2)")).as("sx"),
           sum(y.cast("decimal(28,2)")).as("sy"),
           sum((x * y).cast("decimal(28,4)")).as("sxy"),
           sum((x * x).cast("decimal(28,4)")).as("sxx"),
           sum((y * y).cast("decimal(28,4)")).as("syy"))
    val n = col("n").cast("double")
    def dbl(c: String) = col(c).cast("double")
    val covN = n * dbl("sxy") - dbl("sx") * dbl("sy")
    val varXN = n * dbl("sxx") - dbl("sx") * dbl("sx")
    val varYN = n * dbl("syy") - dbl("sy") * dbl("sy")
    sums.select(col("l_linestatus"), col("n"),
                round(covN / (sqrt(varXN) * sqrt(varYN)), 6).as("corr_qd"),
                round(sqrt(varXN / (n * (n - lit(1.0)))), 6).as("stddev_qty"))
      .orderBy(col("l_linestatus"))
  }

  val qCorrStatsSql: String =
    """WITH sums AS (
      |  SELECT l_linestatus, count(*) AS n,
      |         SUM(CAST(l_quantity AS DECIMAL(28,2))) AS sx,
      |         SUM(CAST(l_discount AS DECIMAL(28,2))) AS sy,
      |         SUM(CAST(l_quantity * l_discount AS DECIMAL(28,4))) AS sxy,
      |         SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS sxx,
      |         SUM(CAST(l_discount * l_discount AS DECIMAL(28,4))) AS syy
      |  FROM lineitem GROUP BY 1)
      |SELECT l_linestatus, n,
      |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
      |             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
      |         AS corr_qd,
      |       round(sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
      |                  / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0))), 6) AS stddev_qty
      |FROM sums ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Range (interval lookback) join: for each error event, how many
  // events did the same user emit in the preceding 5 minutes? Equi on
  // user_id carries the join; the range predicate prunes inside the
  // group — the bounded lookback is what makes this bucketable at
  // scale (a ±window bucket join keeps the shuffle equi-keyed).
  // ------------------------------------------------------------------
  val LookbackUs: Long = 5L * 60L * 1000000L

  val qRangeJoin: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
    val errors = Tables.events(s, d)
      .filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
              unix_micros(col("ts")).as("err_us"))
    errors.join(ev, errors("user_id") === ev("user_id") &&
                    ev("us") >= errors("err_us") - LookbackUs &&
                    ev("us") < errors("err_us"))
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_preceding"))
      .orderBy(col("err_id"))
  }

  val qRangeJoinSql: String =
    s"""SELECT e.event_id AS err_id, count(*) AS n_preceding
       |FROM events e JOIN events p
       |  ON p.user_id = e.user_id
       | AND epoch_us(p.ts) >= epoch_us(e.ts) - $LookbackUs
       | AND epoch_us(p.ts) < epoch_us(e.ts)
       |WHERE e.event_type = 'error'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Latest-record-per-key dedup (the CDC / compaction shape): one
  // surviving row per (user, event_type), by latest (ts, event_id).
  // row_number over a per-key window — one shuffle on the key, no
  // driver-side state; the workhorse of incremental table maintenance.
  // ------------------------------------------------------------------
  val qLatestByKey: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
              unix_micros(col("ts")).as("ts_us"))
      .orderBy(col("user_id"), col("event_type"))
  }

  val qLatestByKeySql: String =
    """SELECT user_id, event_type, event_id, CAST(epoch_us(ts) AS BIGINT) AS ts_us
      |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                                   ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1
      |ORDER BY user_id, event_type""".stripMargin

  // ------------------------------------------------------------------
  // Unpivot (wide → long): per-status metric sums melted into
  // (status, metric, value) rows — the inverse of q_pivot, via the
  // dedicated Dataset.unpivot operator (one pass; the long layout is
  // what metric stores and training-data stats pipelines ingest).
  // ------------------------------------------------------------------
  val qUnpivot: Q = (s, d) =>
    Ops.spreadScan(Tables.lineitem(s, d)
        .select(col("l_linestatus"), col("l_quantity"),
                col("l_extendedprice"), col("l_discount")))
      .groupBy(col("l_linestatus"))
      .agg(Ops.exactSum(col("l_quantity")).as("sum_qty"),
           Ops.exactSum(col("l_extendedprice")).as("sum_price"),
           Ops.exactSum(col("l_discount")).as("sum_disc"))
      .unpivot(Array(col("l_linestatus")),
               Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
               "metric", "value")
      .orderBy(col("l_linestatus"), col("metric"))

  val qUnpivotSql: String =
    """WITH wide AS (
      |  SELECT l_linestatus,
      |         CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |         CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY 1)
      |SELECT l_linestatus, 'sum_qty' AS metric, sum_qty AS value FROM wide
      |UNION ALL SELECT l_linestatus, 'sum_price', sum_price FROM wide
      |UNION ALL SELECT l_linestatus, 'sum_disc', sum_disc FROM wide
      |ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Window-frame breadth: ntile buckets, cumulative distribution, lead,
  // and an explicit unbounded-preceding frame, all over the same
  // (customer, order-date) window — one sort serves every function.
  // ------------------------------------------------------------------
  val qWindowFrames: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wFrame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              ntile(4).over(w).cast("bigint").as("quartile"),
              round(cume_dist().over(w), 6).as("cd"),
              lead(col("o_totalprice"), 1).over(w).as("next_price"),
              first_value(col("o_orderkey")).over(wFrame).as("first_key"))
    // No final orderBy: O(orders) output; the gate sorts rows.
  }

  val qWindowFramesSql: String =
    """SELECT o_custkey, o_orderkey,
      |       ntile(4) OVER w AS quartile,
      |       round(cume_dist() OVER w, 6) AS cd,
      |       lead(o_totalprice, 1) OVER w AS next_price,
      |       first_value(o_orderkey) OVER (PARTITION BY o_custkey
      |              ORDER BY o_orderdate, o_orderkey
      |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_key
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // ------------------------------------------------------------------
  // SCD2 validity intervals (slowly-changing-dimension shape): each
  // user's event stream becomes [valid_from, valid_to) state intervals
  // via lead over the per-user timeline; the open (current) interval
  // carries NULL valid_to. One shuffle on the key — the standard
  // history-table build in warehouse pipelines.
  // ------------------------------------------------------------------
  val qScd2Intervals: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("event_id"),
              unix_micros(col("ts")).as("valid_from_us"),
              lead(unix_micros(col("ts")), 1).over(w).as("valid_to_us"))
    // No final orderBy: O(events) output; the gate sorts rows.
  }

  val qScd2IntervalsSql: String =
    """SELECT user_id, event_type, event_id,
      |       CAST(epoch_us(ts) AS BIGINT) AS valid_from_us,
      |       lead(CAST(epoch_us(ts) AS BIGINT), 1)
      |         OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to_us
      |FROM events""".stripMargin

  // ------------------------------------------------------------------
  // Fixed-bound histogram: 20 × 25k price buckets. Bounds are
  // data-independent constants, so the bucketing is a pure per-row map
  // (no min/max pre-pass) and two runs — or two engines — can never
  // disagree on edges. count per bucket + exact share of total.
  // ------------------------------------------------------------------
  val qHistogram: Q = (s, d) => {
    val buckets = Tables.orders(s, d)
      .select(least(floor(col("o_totalprice") / 25000.0), lit(19.0))
                .cast("bigint").as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"))
    // Total via crossJoin(agg) — the oracle's SUM(n) OVER () shape — not
    // an empty-partition window: the window form logs Spark's "moving
    // all data to a single partition" warning into every bench tail
    // (harmless on a ≤20-row bucket table, but it buries real warnings).
    buckets
      .crossJoin(buckets.agg(sum(col("n")).as("__total")))
      .withColumn("share",
        round(col("n").cast("double") / col("__total").cast("double"), 6))
      .drop("__total")
      .orderBy(col("bucket"))
  }

  val qHistogramSql: String =
    """SELECT bucket, n,
      |       round(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE), 6) AS share
      |FROM (SELECT CAST(least(floor(o_totalprice / 25000.0), 19.0) AS BIGINT) AS bucket,
      |             count(*) AS n
      |      FROM orders GROUP BY 1)
      |ORDER BY bucket""".stripMargin

  // ------------------------------------------------------------------
  // Typed JSON decode: from_json with a pinned schema (vs
  // q_json_extract's per-path get_json_object) — ONE parse per row
  // materializes every field, the right shape when a query touches
  // multiple JSON fields at scale.
  // ------------------------------------------------------------------
  val qJsonTyped: Q = (s, d) => {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("k", LongType)))
    Tables.events(s, d)
      .select(col("event_type"),
              from_json(col("props"), schema).getField("k").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_parsed"),
           min(col("k")).as("min_k"),
           max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  val qJsonTypedSql: String =
    """SELECT event_type,
      |       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_parsed,
      |       MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS min_k,
      |       MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Two-pass heavy hitters: pass 1 runs the Misra–Gries sketch
  // (graftshim.MisraGriesAgg — O(k) mergeable partial state, any item
  // with frequency > n/(k+1) guaranteed to survive) to produce a
  // bounded candidate list + exact row count in ONE aggregation; pass 2
  // re-counts only the candidates and applies the real threshold. The
  // sketch's internal counts are order-dependent, but the guarantee is
  // not, so the final answer is deterministic and oracle-able — while
  // at scale the expensive full-cardinality groupBy is replaced by a
  // sketch plus a tiny isin-filtered recount.
  // ------------------------------------------------------------------
  val HeavyDivisor = 8.0 // heavy = count > n/8; MG k=64 covers n/65 ≪ n/8
  val MgCounters = 64

  val qHeavyHitters: Q = (s, d) => {
    import org.apache.spark.sql.graftshim.{MisraGriesAgg, Shim}
    val mg = Shim.column(
      MisraGriesAgg(Shim.expression(col("event_type")), MgCounters)
        .toAggregateExpression())
    val sketch = Tables.events(s, d).agg(mg.as("s"))
      .select(col("s.n_total").as("n"), col("s.candidates.item").as("items"))
      .collect()(0)
    val n = sketch.getLong(0)
    val cands = sketch.getSeq[String](1)
    Tables.events(s, d)
      .filter(col("event_type").isin(cands: _*))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_occurrences"))
      .filter(col("n_occurrences") > n / HeavyDivisor)
      .orderBy(col("event_type"))
  }

  val qHeavyHittersSql: String =
    s"""SELECT event_type, count(*) AS n_occurrences
       |FROM events GROUP BY 1
       |HAVING count(*) > (SELECT count(*) FROM events) / $HeavyDivisor
       |ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Full outer join — the one join type not yet in the registry
  // (inner/broadcast/semi/anti/left/as-of/range are covered elsewhere):
  // per-nation customer counts ⟗ per-nation supplier counts. At the
  // harness SFs some nations have no suppliers, so both null sides are
  // actually exercised; COALESCE(…, 0) canonicalizes them identically
  // on both engines.
  // ------------------------------------------------------------------
  val qOuterJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
      .groupBy(col("c_nationkey").cast("bigint").as("nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sup = Tables.supplier(s, d)
      .groupBy(col("s_nationkey").cast("bigint").as("nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    c.join(sup, Seq("nationkey"), "full_outer")
      .select(col("nationkey"),
              coalesce(col("n_cust"), lit(0L)).as("n_cust"),
              coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nationkey"))
  }

  val qOuterJoinSql: String =
    """SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
      |       CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
      |       CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp
      |FROM (SELECT CAST(c_nationkey AS BIGINT) AS nationkey, count(*) AS n_cust
      |      FROM customer GROUP BY 1) c
      |FULL OUTER JOIN
      |     (SELECT CAST(s_nationkey AS BIGINT) AS nationkey, count(*) AS n_supp
      |      FROM supplier GROUP BY 1) s
      |  ON c.nationkey = s.nationkey
      |ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Binned quantile sketch: estimate p50/p90 from a fixed-bound bin
  // histogram (width 2000 over [0, 500k]) with linear interpolation
  // inside the target bin. Unlike exact percentile_cont — which must
  // sort every group — this is one aggregation whose state (bin counts)
  // is trivially mergeable, the approximate-quantiles play at 100 TB.
  // The estimator is a deterministic function of the exact histogram,
  // so unlike KLL/t-digest it still hash-matches an oracle; the spec
  // bounds |estimate − exact| ≤ bin width.
  // ------------------------------------------------------------------
  val QBinWidth = 2000.0
  val QNumBins = 250

  val qQuantileSketch: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val bins = Tables.orders(s, d)
      .select(col("o_orderstatus").as("status"),
              least(floor(col("o_totalprice") / QBinWidth), lit(QNumBins - 1.0))
                .cast("bigint").as("bin"))
      .groupBy(col("status"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy(col("status")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col("status"))
    val cum = bins
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("cum_prev", col("cum") - col("cnt"))
      .withColumn("n", sum(col("cnt")).over(wAll))
    def est(q: Double): Column = {
      val qn = lit(q) * col("n").cast("double")
      // exactly one bin satisfies cum_prev < qn <= cum (the bin holding
      // the target rank), so max() just picks that bin's interpolation
      max(when(col("cum").cast("double") >= qn && col("cum_prev").cast("double") < qn,
               col("bin").cast("double") * QBinWidth +
                 lit(QBinWidth) * (qn - col("cum_prev").cast("double")) /
                   col("cnt").cast("double")))
    }
    cum.groupBy(col("status"))
      .agg(round(est(0.5), 6).as("p50_est"),
           round(est(0.9), 6).as("p90_est"),
           max(col("n")).as("n_rows"))
      .orderBy(col("status"))
  }

  val qQuantileSketchSql: String = {
    def est(q: String) =
      s"""max(CASE WHEN CAST(cum AS DOUBLE) >= $q * CAST(n AS DOUBLE)
         |          AND CAST(cum_prev AS DOUBLE) < $q * CAST(n AS DOUBLE)
         |         THEN CAST(bin AS DOUBLE) * 2000.0 +
         |              2000.0 * ($q * CAST(n AS DOUBLE) - CAST(cum_prev AS DOUBLE))
         |                / CAST(cnt AS DOUBLE) END)""".stripMargin.replace("\n", " ")
    s"""WITH bins AS (
       |  SELECT o_orderstatus AS status,
       |         CAST(least(floor(o_totalprice / 2000.0), 249.0) AS BIGINT) AS bin,
       |         count(*) AS cnt
       |  FROM orders GROUP BY 1, 2),
       |cum AS (
       |  SELECT status, bin, cnt,
       |         SUM(cnt) OVER (PARTITION BY status ORDER BY bin
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
       |         SUM(cnt) OVER (PARTITION BY status ORDER BY bin
       |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt AS cum_prev,
       |         SUM(cnt) OVER (PARTITION BY status) AS n
       |  FROM bins)
       |SELECT status,
       |       round(${est("0.5")}, 6) AS p50_est,
       |       round(${est("0.9")}, 6) AS p90_est,
       |       CAST(MAX(n) AS BIGINT) AS n_rows
       |FROM cum GROUP BY 1 ORDER BY 1""".stripMargin
  }

  // ------------------------------------------------------------------
  // Ranking-function breadth (SURVEY §2.5 marks rank/ntile/analytic
  // functions absent-but-free): dense_rank, quartile ntile, percent_rank
  // and cume_dist over the per-segment price ordering, aggregated so the
  // output stays small. percent_rank/cume_dist are rational divisions of
  // window counters — bit-identical across engines without rounding; the
  // unique o_orderkey tiebreaker keeps every rank deterministic.
  // ------------------------------------------------------------------
  val qWindowRanks: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"),
              ntile(4).over(w).cast("bigint").as("quartile"),
              dense_rank().over(w).cast("bigint").as("drnk"),
              percent_rank().over(w).as("pr"),
              cume_dist().over(w).as("cd"),
              col("o_totalprice"))
      .groupBy(col("o_orderpriority"), col("quartile"))
      .agg(count(lit(1)).as("n_rows"),
           max(col("drnk")).as("max_dense_rank"),
           max(col("pr")).as("max_percent_rank"),
           max(col("cd")).as("max_cume_dist"),
           Ops.exactSum(col("o_totalprice")).as("price_sum"))
      .orderBy(col("o_orderpriority"), col("quartile"))
  }

  val qWindowRanksSql: String =
    """WITH r AS (
      |  SELECT o_orderpriority,
      |         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |         CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |         percent_rank() OVER w AS pr,
      |         cume_dist() OVER w AS cd,
      |         o_totalprice
      |  FROM orders
      |  WINDOW w AS (PARTITION BY o_orderpriority
      |               ORDER BY o_totalprice, o_orderkey))
      |SELECT o_orderpriority, quartile, count(*) AS n_rows,
      |       max(drnk) AS max_dense_rank,
      |       max(pr) AS max_percent_rank,
      |       max(cd) AS max_cume_dist,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // Bloom-filter semi-join reduction — the engine technique behind
  // runtime row-group skipping: compress the build side's key set
  // (parts with p_size = 1) into a 4032-bit bloom bitmap (64 words ×
  // 63 usable bits, 3 hash functions), probe the fact side's distinct keys
  // against it, and verify against the exact semi-join. At scale the
  // bitmap is O(1) to broadcast no matter how large the build side
  // grows, and the probe is a 64-row broadcast join — the fact table
  // never shuffles. Built on the portable md5 hash family so DuckDB
  // re-derives the identical bitmap and false-positive count.
  // ------------------------------------------------------------------
  val BloomWords = 64 // 64 words x 63 usable bits = 4032 bits
  // bit index stays in 0..62: DuckDB range-checks BIGINT << 63
  val BloomHashes = 3

  val qBloomJoin: Q = (s, d) => {
    def pos(key: Column, i: Int): Column =
      Ops.md5Bits60(concat(key.cast("string"), lit(s":b$i"))) % (BloomWords * 63)
    val sel = Tables.part(s, d).filter(col("p_size") === 1)
      .select(col("p_partkey").as("key"))
    val bloom = sel
      .select(explode(array((0 until BloomHashes).map(i => pos(col("key"), i)): _*))
                .as("pos"))
      .select((col("pos") / 63).cast("int").as("word"),
              pmod(col("pos"), lit(63)).as("bit"))
      .groupBy(col("word"))
      .agg(expr("bit_or(CAST(1 AS BIGINT) << CAST(bit AS INT))").as("bits"))
    val probeKeys = Tables.lineitem(s, d).select(col("l_partkey").as("key")).distinct()
    val probed = (0 until BloomHashes).foldLeft(
      probeKeys.withColumn("hits", lit(0))) { (df, i) =>
        df.withColumn(s"p$i", pos(col("key"), i))
          .join(broadcast(bloom.withColumnRenamed("word", s"w$i")
                  .withColumnRenamed("bits", s"b$i")),
                (col(s"p$i") / 63).cast("int") === col(s"w$i"), "left")
          .withColumn("hits",
            col("hits") +
              when(col(s"b$i").isNotNull &&
                   (col(s"b$i").bitwiseAND(
                      expr(s"shiftleft(CAST(1 AS BIGINT), CAST(pmod(p$i, 63) AS INT))"))
                      =!= 0L), 1).otherwise(0))
          .drop(s"w$i", s"b$i", s"p$i")
      }
    val truth = probeKeys.join(sel, Seq("key"), "left_semi")
      .withColumn("is_true", lit(1L))
    probed.join(truth, Seq("key"), "left")
      .agg(count(lit(1)).as("n_keys_total"),
           sum(when(col("hits") === BloomHashes, 1L).otherwise(0L))
             .as("n_bloom_pass"),
           sum(coalesce(col("is_true"), lit(0L))).as("n_true_match"),
           sum(when(col("hits") === BloomHashes && col("is_true").isNull, 1L)
                 .otherwise(0L)).as("n_false_pos"))
  }

  val qBloomJoinSql: String = {
    def posSql(key: String, i: Int) =
      s"('0x' || substr(md5(CAST($key AS VARCHAR) || ':b$i'), 1, 15))::BIGINT % ${BloomWords * 63}"
    val hashUnion = (0 until BloomHashes)
      .map(i => s"SELECT ${posSql("key", i)} AS pos FROM sel")
      .mkString(" UNION ALL ")
    val hitSum = (0 until BloomHashes).map { i =>
      s"""(SELECT CASE WHEN b.bits & (CAST(1 AS BIGINT) << CAST(${posSql("p.key", i)} % 63 AS INT)) <> 0
         |      THEN 1 ELSE 0 END
         | FROM bloom b WHERE b.word = CAST(${posSql("p.key", i)} // 63 AS INT))""".stripMargin.replace("\n", " ")
    }.map(s => s"COALESCE($s, 0)").mkString(" + ")
    s"""WITH sel AS (SELECT p_partkey AS key FROM part WHERE p_size = 1),
       |hashes AS ($hashUnion),
       |bloom AS (
       |  SELECT CAST(pos // 63 AS INT) AS word,
       |         bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INT)) AS bits
       |  FROM hashes GROUP BY 1),
       |probe AS (SELECT DISTINCT l_partkey AS key FROM lineitem),
       |scored AS (
       |  SELECT p.key, ($hitSum) AS hits,
       |         CASE WHEN EXISTS (SELECT 1 FROM sel WHERE sel.key = p.key)
       |              THEN 1 ELSE 0 END AS is_true
       |  FROM probe p)
       |SELECT COUNT(*) AS n_keys_total,
       |       CAST(SUM(CASE WHEN hits = $BloomHashes THEN 1 ELSE 0 END) AS BIGINT)
       |         AS n_bloom_pass,
       |       CAST(SUM(is_true) AS BIGINT) AS n_true_match,
       |       CAST(SUM(CASE WHEN hits = $BloomHashes AND is_true = 0
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
       |FROM scored""".stripMargin
  }

  // ------------------------------------------------------------------
  // 2-D skyline (Pareto frontier): per market segment, orders not
  // weakly dominated on (recency, price) — i.e. no other order is at
  // least as recent AND at least as expensive with one strict. NOT the
  // textbook O(n²) anti-join: for two dimensions the skyline falls out
  // of ONE window pass — sort by date desc, keep rows whose price (a)
  // beats the running max over strictly-later orders and (b) is the max
  // among same-date orders. O(n log n), one shuffle, scales like any
  // window aggregate.
  // ------------------------------------------------------------------
  val qSkyline: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val base = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .select(col("c_mktsegment"), col("o_orderkey"),
              datediff(col("o_orderdate"), lit("1970-01-01")).cast("bigint")
                .as("d_days"),
              col("o_totalprice"))
    val wLater = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("d_days").desc)
      .rangeBetween(Window.unboundedPreceding, -1)
    val wSame = Window.partitionBy(col("c_mktsegment"), col("d_days"))
    base
      .withColumn("mx_later", max(col("o_totalprice")).over(wLater))
      .withColumn("mx_same", max(col("o_totalprice")).over(wSame))
      .filter((col("mx_later").isNull || col("mx_later") < col("o_totalprice")) &&
              col("o_totalprice") === col("mx_same"))
      .select(col("c_mktsegment"), col("o_orderkey"), col("d_days"),
              col("o_totalprice"))
    // No final orderBy: the skyline is small but the range sampler
    // would re-execute the two corpus-sized windows to sort it — the
    // gate sorts rows.
  }

  val qSkylineSql: String =
    """WITH base AS (
      |  SELECT c_mktsegment, o_orderkey,
      |         CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
      |              AS BIGINT) AS d_days,
      |         o_totalprice
      |  FROM orders JOIN customer ON o_custkey = c_custkey),
      |scored AS (
      |  SELECT *,
      |         MAX(o_totalprice) OVER (PARTITION BY c_mktsegment ORDER BY d_days DESC
      |                                 RANGE BETWEEN UNBOUNDED PRECEDING
      |                                 AND 1 PRECEDING) AS mx_later,
      |         MAX(o_totalprice) OVER (PARTITION BY c_mktsegment, d_days) AS mx_same
      |  FROM base)
      |SELECT c_mktsegment, o_orderkey, d_days, o_totalprice
      |FROM scored
      |WHERE (mx_later IS NULL OR mx_later < o_totalprice)
      |  AND o_totalprice = mx_same""".stripMargin

  // ------------------------------------------------------------------
  // Bucketed interval join — temporal join with NO equi key (count ALL
  // events in the 10 minutes before each error, any user): the naive
  // plan is a cross join. Bucketing by the lookback width L turns it
  // into an equi-join: a [t−L, t) window spans at most two L-wide
  // buckets, so the error side explodes into its bucket and the
  // previous one, joins on bucket equality, and filters the exact
  // range. Join fan-out is exactly 2×, independent of data size — the
  // standard distributed interval-join strategy when neither side is
  // broadcastable (q_range_join covers the small-side-broadcast case).
  // ------------------------------------------------------------------
  val GlobalLookbackUs = 600000000L // 10 minutes

  val qIntervalBucketJoin: Q = (s, d) => {
    val L = GlobalLookbackUs
    val ev = Tables.events(s, d)
      .select(col("event_id"), unix_micros(col("ts")).as("us"))
      .withColumn("bucket", expr(s"us DIV $L"))
    val err = Tables.events(s, d)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), unix_micros(col("ts")).as("err_us"))
      .withColumn("bucket",
        explode(array(expr(s"err_us DIV $L"), expr(s"err_us DIV $L - 1"))))
    err.join(ev, Seq("bucket"))
      .filter(col("us") >= col("err_us") - L && col("us") < col("err_us"))
      .groupBy(col("err_id"))
      .agg(count(lit(1)).as("n_any_preceding"))
    // No final orderBy: the output is O(errors) and the range sampler
    // would re-run the 2× bucket join — the gate sorts rows.
  }

  val qIntervalBucketJoinSql: String =
    s"""SELECT e.event_id AS err_id, count(*) AS n_any_preceding
       |FROM events e JOIN events p
       |  ON epoch_us(p.ts) >= epoch_us(e.ts) - $GlobalLookbackUs
       | AND epoch_us(p.ts) < epoch_us(e.ts)
       |WHERE e.event_type = 'error'
       |GROUP BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Per-group OLS linear fit (price ~ quantity) from the same exact
  // DECIMAL sufficient statistics as q_corr_stats: slope and intercept
  // derive in double from order-free exact sums, so a 1000-executor fit
  // hash-matches a single-threaded one. The engines' built-in
  // regr_slope would stream in partition order and could not.
  // ------------------------------------------------------------------
  val qLinearFit: Q = (s, d) => {
    val x = col("l_quantity")
    val y = col("l_extendedprice")
    val sums = Ops.spreadScan(Tables.lineitem(s, d)
        .select(col("l_returnflag"), x, y))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
           sum(x.cast("decimal(28,2)")).as("sx"),
           sum(y.cast("decimal(28,2)")).as("sy"),
           sum((x * y).cast("decimal(28,4)")).as("sxy"),
           sum((x * x).cast("decimal(28,4)")).as("sxx"))
    val n = col("n").cast("double")
    def dbl(c: String) = col(c).cast("double")
    val slope = (n * dbl("sxy") - dbl("sx") * dbl("sy")) /
      (n * dbl("sxx") - dbl("sx") * dbl("sx"))
    sums.select(col("l_returnflag"), col("n"),
                round(slope, 6).as("slope"),
                round((dbl("sy") - slope * dbl("sx")) / n, 6).as("intercept"))
      .orderBy(col("l_returnflag"))
  }

  val qLinearFitSql: String =
    """WITH sums AS (
      |  SELECT l_returnflag, count(*) AS n,
      |         SUM(CAST(l_quantity AS DECIMAL(28,2))) AS sx,
      |         SUM(CAST(l_extendedprice AS DECIMAL(28,2))) AS sy,
      |         SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(28,4))) AS sxy,
      |         SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,4))) AS sxx
      |  FROM lineitem GROUP BY 1)
      |SELECT l_returnflag, n,
      |       round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS slope,
      |       round((CAST(sy AS DOUBLE)
      |               - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |                    - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
      |                  (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |                 * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6) AS intercept
      |FROM sums ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // Deterministic MODE per group: most frequent o_orderpriority per
  // market segment, ties broken by value — the
  // engines' built-in mode()/any_value have unspecified tie behavior,
  // so the deterministic form is count + row_number, which also scales
  // as two partial-aggregating shuffles.
  // ------------------------------------------------------------------
  val qMode: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val counts = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .groupBy(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("cnt"))
    // min_by over a unique (−cnt, priority) struct key ≡ the row that a
    // (cnt DESC, priority ASC) row_number()=1 window would keep, but it
    // folds into the existing aggregate: no second shuffle, no per-group
    // sort. Priority is unique within a group, so the key can't tie.
    counts.groupBy(col("c_mktsegment"))
      .agg(min_by(struct(col("o_orderpriority"), col("cnt")),
                  struct((-col("cnt")).as("neg_cnt"),
                         col("o_orderpriority"))).as("m"))
      .select(col("c_mktsegment"),
              col("m.o_orderpriority").as("mode_priority"),
              col("m.cnt").as("mode_count"))
      .orderBy(col("c_mktsegment"))
  }

  val qModeSql: String =
    """WITH counts AS (
      |  SELECT c_mktsegment, o_orderpriority, count(*) AS cnt
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2),
      |ranked AS (
      |  SELECT *, row_number() OVER (PARTITION BY c_mktsegment
      |                               ORDER BY cnt DESC, o_orderpriority ASC) AS rn
      |  FROM counts)
      |SELECT c_mktsegment, o_orderpriority AS mode_priority, cnt AS mode_count
      |FROM ranked WHERE rn = 1 ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------------------------
  // Item co-occurrence — the recommender building block ("bought
  // together"): self-join lineitems on the order, count part pairs,
  // keep the top-20 pairs. The pair explosion is bounded by
  // items-per-order (k items → k(k−1)/2 pairs), NOT corpus size, so
  // the shuffle grows linearly with orders; brand-level pairing keeps
  // the output domain stable across scale factors.
  // ------------------------------------------------------------------
  val qCooccurrence: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
    // One shuffle builds the per-order brand set (collect_set dedups, so
    // no separate distinct pass), then pairs are generated MAP-SIDE from
    // the sorted set — fan-out bounded by C(brands-per-order, 2), vs the
    // self-join formulation that shuffled the item table twice more.
    val orderBrands = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(sort_array(collect_set(col("p_brand"))).as("bs"))
    orderBrands
      .select(explode(expr(
        """flatten(transform(bs, (x, i) ->
          |  transform(slice(bs, i + 2, size(bs)),
          |            y -> struct(x AS brand_a, y AS brand_b))))"""
          .stripMargin)).as("pr"))
      .select(col("pr.brand_a").as("brand_a"), col("pr.brand_b").as("brand_b"))
      .groupBy(col("brand_a"), col("brand_b"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("brand_a"), col("brand_b"))
      .limit(20)
  }

  val qCooccurrenceSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, p_brand
      |  FROM lineitem JOIN part ON l_partkey = p_partkey)
      |SELECT a.p_brand AS brand_a, b.p_brand AS brand_b,
      |       count(*) AS n_orders
      |FROM items a JOIN items b
      |  ON a.l_orderkey = b.l_orderkey AND a.p_brand < b.p_brand
      |GROUP BY 1, 2 ORDER BY 3 DESC, 1, 2 LIMIT 20""".stripMargin

  // ------------------------------------------------------------------
  // Event transition matrix (clickstream Markov counts): for each user,
  // pair every event with its successor via one window lead, then count
  // (from, to) transitions globally — the session-flow shape behind
  // "what do users do after X". One shuffle on user, one on the pair.
  // ------------------------------------------------------------------
  val qTransitionMatrix: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val qTransitionMatrixSql: String =
    """WITH nxt AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS to_type
      |  FROM events)
      |SELECT from_type, to_type, count(*) AS n_transitions
      |FROM nxt WHERE to_type IS NOT NULL
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // q_benford — first-significant-digit census of lineitem extended
  // prices against Benford's law (expected share log10(1+1/d)): the
  // standard data-quality / fraud screen for any monetary or count
  // column entering the warehouse — fabricated or truncated feeds
  // bend the leading-digit curve long before totals look wrong.
  //
  // Exactness: prices are 2-dp decimals carried as doubles, so
  // round(x·100) recovers exact integer CENTS identically on both
  // engines; the leading digit falls out of a pure-integer binary
  // power-of-ten division cascade (no log10 on data — floor(log10 x)
  // at an exact power boundary is libm-dependent). Observed shares
  // are IEEE divisions of identical BIGINTs; the Benford expectation
  // snaps log10(1+1/d) to micro-units (d = 1..9 are fixed constants
  // nowhere near a half boundary), and the deviation is the same
  // subtraction of identical doubles on both engines.
  //
  // Scale shape: a 1-column scan collapsing to ≤9 groups in one
  // partial-agg shuffle — map-side combine does all the work; the
  // digit grid is a 9-row literal join. Nothing is row-bounded past
  // the scan.
  // ------------------------------------------------------------------
  val qBenford: Q = (s, d) => benford(
    Tables.lineitem(s, d).select(col("l_extendedprice").as("x")), s)

  /** Core of q_benford over any positive numeric column named x. */
  def benford(vals: DataFrame, s: SparkSession): DataFrame = {
    // Leading digit of integer cents via truncating division by the
    // largest power of ten ≤ c — a branch cascade over binary
    // power-of-ten steps (8, 4, 2, 1) covers magnitudes to 10^16.
    // `div` (not `/`) keeps every step in exact integer arithmetic.
    val cents = vals.select(
      round(col("x") * 100.0).cast("long").as("c"))
    val digits = Seq(8, 4, 2, 1).foldLeft(cents) { (df, k) =>
      val p = math.pow(10, k).toLong
      df.withColumn("c",
        when(col("c") >= p, expr(s"c div ${p}L")).otherwise(col("c")))
    }
    val obs = digits.select(col("c").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
      // Non-nullable join key, post-agg: the grid left-join would
      // otherwise infer isnotnull(digit) and push it through the
      // aggregate into the digit cascade, where Project-collapse
      // substitution expands the filter to 2^4 copies of the cascade
      // (measured 3.2 s → its removal below; the whole scan ran that
      // mega-expression per row). coalesce after the agg folds the
      // inferred filter to true AND leaves both branches' shuffle
      // subtrees identical, so the total branch reuses the exchange
      // instead of re-scanning. A NULL digit (needs a NULL price —
      // none exist) maps to -1, which no grid digit matches — the
      // same drop the oracle's LEFT JOIN applies to NULL.
      .select(coalesce(col("digit"), lit(-1L)).as("digit"), col("n_obs"))
    val total = obs.agg(sum(col("n_obs")).as("n_total"))
    val grid = s.range(1, 10).select(col("id").as("digit"))
    grid.join(obs, Seq("digit"), "left").crossJoin(total)
      .select(col("digit"), coalesce(col("n_obs"), lit(0L)).as("n_obs"),
              col("n_total"))
      .select(col("digit"), col("n_obs"),
              (col("n_obs").cast("double") / col("n_total").cast("double"))
                .as("obs_share"),
              (round(log10(lit(1.0) + lit(1.0) / col("digit").cast("double"))
                       * 1e6).cast("long").cast("double") / 1e6)
                .as("exp_share"))
      .withColumn("dev", col("obs_share") - col("exp_share"))
      .orderBy(col("digit"))
  }

  val qBenfordSql: String =
    """WITH cents AS (
      |  SELECT CAST(round(l_extendedprice * 100.0, 0) AS BIGINT) AS c
      |  FROM lineitem),
      |d8 AS (SELECT CASE WHEN c >= 100000000 THEN c // 100000000
      |                   ELSE c END AS c FROM cents),
      |d4 AS (SELECT CASE WHEN c >= 10000 THEN c // 10000
      |                   ELSE c END AS c FROM d8),
      |d2 AS (SELECT CASE WHEN c >= 100 THEN c // 100
      |                   ELSE c END AS c FROM d4),
      |d1 AS (SELECT CASE WHEN c >= 10 THEN c // 10
      |                   ELSE c END AS digit FROM d2),
      |obs AS (SELECT digit, count(*) AS n_obs FROM d1 GROUP BY 1),
      |total AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n_total FROM obs),
      |grid AS (SELECT CAST(unnest(range(1, 10)) AS BIGINT) AS digit)
      |SELECT g.digit, CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n_obs,
      |       CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / CAST(t.n_total AS DOUBLE)
      |         AS obs_share,
      |       CAST(CAST(round(log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE))
      |                       * 1000000.0, 0) AS BIGINT) AS DOUBLE)
      |         / 1000000.0 AS exp_share,
      |       CAST(COALESCE(o.n_obs, 0) AS DOUBLE) / CAST(t.n_total AS DOUBLE)
      |         - CAST(CAST(round(log10(1.0 + 1.0 / CAST(g.digit AS DOUBLE))
      |                           * 1000000.0, 0) AS BIGINT) AS DOUBLE)
      |           / 1000000.0 AS dev
      |FROM grid g LEFT JOIN obs o ON o.digit = g.digit
      |CROSS JOIN total t ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_benford"        -> qBenford,
    "q_cooccurrence"   -> qCooccurrence,
    "q_transition_matrix" -> qTransitionMatrix,
    "q_linear_fit"     -> qLinearFit,
    "q_mode"           -> qMode,
    "q_interval_bucket_join" -> qIntervalBucketJoin,
    "q_skyline"        -> qSkyline,
    "q_bloom_join"     -> qBloomJoin,
    "q_window_ranks"   -> qWindowRanks,
    "q_cube"           -> qCube,
    "q_quantile_sketch" -> qQuantileSketch,
    "q_outer_join"     -> qOuterJoin,
    "q_heavy_hitters"  -> qHeavyHitters,
    "q_histogram"      -> qHistogram,
    "q_json_typed"     -> qJsonTyped,
    "q_pivot"          -> qPivot,
    "q_grouping_sets"  -> qGroupingSets,
    "q_percentiles"    -> qPercentiles,
    "q_corr_stats"     -> qCorrStats,
    "q_range_join"     -> qRangeJoin,
    "q_latest_by_key"  -> qLatestByKey,
    "q_unpivot"        -> qUnpivot,
    "q_window_frames"  -> qWindowFrames,
    "q_scd2_intervals" -> qScd2Intervals,
  )

  val oracles: Map[String, String] = Map(
    "q_benford"        -> qBenfordSql,
    "q_cooccurrence"   -> qCooccurrenceSql,
    "q_transition_matrix" -> qTransitionMatrixSql,
    "q_linear_fit"     -> qLinearFitSql,
    "q_mode"           -> qModeSql,
    "q_interval_bucket_join" -> qIntervalBucketJoinSql,
    "q_skyline"        -> qSkylineSql,
    "q_bloom_join"     -> qBloomJoinSql,
    "q_window_ranks"   -> qWindowRanksSql,
    "q_cube"           -> qCubeSql,
    "q_quantile_sketch" -> qQuantileSketchSql,
    "q_outer_join"     -> qOuterJoinSql,
    "q_heavy_hitters"  -> qHeavyHittersSql,
    "q_histogram"      -> qHistogramSql,
    "q_json_typed"     -> qJsonTypedSql,
    "q_pivot"          -> qPivotSql,
    "q_grouping_sets"  -> qGroupingSetsSql,
    "q_percentiles"    -> qPercentilesSql,
    "q_corr_stats"     -> qCorrStatsSql,
    "q_range_join"     -> qRangeJoinSql,
    "q_latest_by_key"  -> qLatestByKeySql,
    "q_unpivot"        -> qUnpivotSql,
    "q_window_frames"  -> qWindowFramesSql,
    "q_scd2_intervals" -> qScd2IntervalsSql,
  )
}
