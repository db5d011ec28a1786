package graft.jobs

import graft.Tables
import graft.ops.Ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's core operator surface (SURVEY §2) re-expressed over the
  * harness tables, one query per operator family, each with a DuckDB oracle.
  *
  * Conventions for oracle hash-parity (see SURVEY §7.4):
  *  - re-associative double sums go through DECIMAL (exact, order-free);
  *  - per-row arithmetic stays IEEE double (bit-deterministic);
  *  - integer-ish outputs cast to BIGINT on both sides;
  *  - timestamps rendered with date_format/strftime as strings;
  *  - every output has a total ORDER BY on both sides;
  *  - ranking always carries a unique tiebreaker.
  */
object CoreQueries {
  type Q = (SparkSession, String) => DataFrame

  // S1/P1/A1 — the MaxTemperature shape: fixed-width-ish projection feeding
  // a group-by MAX with map-side partial aggregation (the reference's
  // combiner, BootStrap.java:35, is HashAggregate partial mode here).
  val qMaxPerGroup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(year(col("l_shipdate")).cast("bigint").as("ship_year"))
      .agg(max(col("l_quantity")).as("max_qty"),
           count(lit(1)).as("n_rows"))
      .orderBy(col("ship_year"))

  val qMaxPerGroupSql: String =
    """SELECT CAST(year(l_shipdate) AS BIGINT) AS ship_year,
      |       max(l_quantity) AS max_qty, count(*) AS n_rows
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  // P1/F1 — fixed-width substring projection + signed int parse
  // (MaxTemperatureMapper.java:17-22). c_name is `Customer#` + 9 digits;
  // Java offsets [9,18) → the parsed key must round-trip to c_custkey.
  val qFixedwidthParse: Q = (s, d) =>
    Tables.customer(s, d)
      .select(col("c_custkey"),
              Ops.fixedWidthInt(col("c_name"), 9, 18).cast("bigint").as("parsed_key"))
      .withColumn("key_matches",
                  (col("parsed_key") === col("c_custkey")).cast("int").cast("bigint"))
      .orderBy(col("c_custkey"))

  val qFixedwidthParseSql: String =
    """SELECT c_custkey,
      |       CAST(CAST(substring(c_name, 10, 9) AS INT) AS BIGINT) AS parsed_key,
      |       CAST(CAST(substring(c_name, 10, 9) AS INT) = c_custkey AS BIGINT) AS key_matches
      |FROM customer ORDER BY c_custkey""".stripMargin

  // J1 — reduce-side repartition equi-join (ReduceJoinJob.java:100-175).
  // Actual reference semantics are INNER despite the javadoc's `left join`
  // (SURVEY §7.4.2). customer ⋈ nation plays employee ⋈ dept; output
  // mirrors the reference's projection (name, key, joined name, value).
  val qReduceJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    c.join(n, c("c_nationkey") === n("n_nationkey"), "inner")
      .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
              col("n_name").as("nation_name"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  val qReduceJoinSql: String =
    """SELECT c_custkey, c_name, c_nationkey, n_name AS nation_name, c_acctbal
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |ORDER BY c_custkey""".stripMargin

  // J2 — map-side broadcast hash join (UserHotcar.java:102-142): the big
  // fact (lineitem) probes a broadcast small dim (part). Explicit
  // broadcast() hint = the reference's distributed-cache side table; at
  // 100 TB lineitem never shuffles for this join.
  val qBroadcastJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(broadcast(p), li("l_partkey") === p("p_partkey"), "inner")
      .groupBy(col("p_brand"))
      .agg(Ops.exactSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
             .as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy(col("p_brand"))
  }

  val qBroadcastJoinSql: String =
    """SELECT p_brand,
      |       CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // J3/F2/P2 — explode-then-join over the reference's packed-pair
  // micro-format (UserHotcar.java:67-96): pack lineitems into
  // `partkey@qty,...` per order, split+explode back (the *intended*
  // `[$]`-style literal split, SURVEY §7.4.1), then join the exploded ids
  // against part. Quantities are whole numbers → BIGINT round-trip keeps
  // string formatting engine-agnostic.
  val qExplodeJoin: Q = (s, d) => {
    val packed = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
              Ops.packPairs(col("l_partkey").cast("bigint").cast("string"),
                            col("l_quantity").cast("bigint").cast("string")).as("pair"))
      .groupBy(col("l_orderkey"))
      .agg(concat_ws(",", collect_list(col("pair"))).as("items"))
    val exploded = Ops.unpackPairs(packed, "items", ",", "item_key", "item_qty")
    val p = Tables.part(s, d)
    exploded
      .join(broadcast(p), col("item_key").cast("bigint") === p("p_partkey"), "inner")
      .groupBy(col("l_orderkey"))
      .agg((sum(col("p_retailprice").cast("decimal(18,2)") *
                col("item_qty").cast("bigint"))).cast("double").as("packed_value"),
           count(lit(1)).as("n_items"))
    // No final orderBy: the output is O(orders) — corpus-sized — and a
    // global sort's range sampling RE-EXECUTES the whole pack→explode→
    // join subtree (measured at 100×-diverse: shuffle read 2171 MiB vs
    // 1177 written = the 995 MiB pack exchange read twice, and steady
    // wall 26.4 → ~13 s without it). Per-order rows are complete and
    // exact either way; callers wanting presentation order sort the
    // 3-column result, not the operator's pipeline.
  }

  val qExplodeJoinSql: String =
    """WITH packed AS (
      |  SELECT l_orderkey,
      |         string_agg(CAST(CAST(l_partkey AS BIGINT) AS VARCHAR) || '@' ||
      |                    CAST(CAST(l_quantity AS BIGINT) AS VARCHAR), ',') AS items
      |  FROM lineitem GROUP BY 1),
      |exploded AS (
      |  SELECT l_orderkey, unnest(string_split(items, ',')) AS pair FROM packed)
      |SELECT l_orderkey,
      |       CAST(SUM(CAST(p_retailprice AS DECIMAL(18,2)) *
      |                CAST(string_split(pair, '@')[2] AS BIGINT)) AS DOUBLE) AS packed_value,
      |       count(*) AS n_items
      |FROM exploded JOIN part ON CAST(string_split(pair, '@')[1] AS BIGINT) = p_partkey
      |GROUP BY 1""".stripMargin

  // U1 — union of two tagged sources (ReduceJoinJob.java:66-67,106-136:
  // two input dirs through one mapper, routed by source tag).
  val qUnion: Q = (s, d) => {
    val c = Tables.customer(s, d)
      .select(col("c_name").as("name"), col("c_acctbal").as("acctbal"),
              lit("customer").as("src"))
    val sup = Tables.supplier(s, d)
      .select(col("s_name").as("name"), col("s_acctbal").as("acctbal"),
              lit("supplier").as("src"))
    c.unionByName(sup).orderBy(col("src"), col("name"))
  }

  val qUnionSql: String =
    """SELECT * FROM (
      |  SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS src FROM customer
      |  UNION ALL
      |  SELECT s_name, s_acctbal, 'supplier' FROM supplier)
      |ORDER BY src, name""".stripMargin

  // P3 — arity filter (malformed-row drop, ReduceJoinJob.java:111-114):
  // keep only documents whose whitespace split meets the expected arity.
  val qArityFilter: Q = (s, d) =>
    Tables.documents(s, d)
      .filter(size(Ops.tokens(col("text"))) >= 50)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
           sum(col("n_chars")).as("total_chars"))
      .orderBy(col("lang"))

  val qArityFilterSql: String =
    """SELECT lang, count(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
      |FROM documents WHERE len(string_split(text, ' ')) >= 50
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // F11-F14 — date parse/offset/truncate/format (DateHelper.java:17-79,
  // UserNewcar's dt=yesterday partition arithmetic): month truncation,
  // +1 day offset, string formatting.
  // Format AFTER aggregating, not per input row: the group key is the
  // cheap truncated timestamp, and because yyyy-MM-dd formatting is
  // monotonic in the timestamp, max(format(x+1d)) ≡ format(max(x)+1d) —
  // so the expensive string formatting runs once per GROUP (~80) instead
  // of once per row (10× stress: 9.0 s → row-formatting was the query).
  val qDateOps: Q = (s, d) =>
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("m"))
      .agg(count(lit(1)).as("n_orders"),
           countDistinct(col("o_custkey")).as("n_custs"),
           max(col("o_orderdate")).as("mx"))
      .select(date_format(col("m"), "yyyy-MM-dd").as("month"),
              col("n_orders"), col("n_custs"),
              date_format(col("mx") + expr("INTERVAL 1 DAY"), "yyyy-MM-dd")
                .as("max_next_day"))
      .orderBy(col("month"))

  val qDateOpsSql: String =
    """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month,
      |       count(*) AS n_orders,
      |       count(DISTINCT o_custkey) AS n_custs,
      |       max(strftime(o_orderdate + INTERVAL 1 DAY, '%Y-%m-%d')) AS max_next_day
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // P5/F9 — JSON field extraction (JsonHelper.java:19-22 via Gson →
  // get_json_object) over events.props.
  val qJsonExtract: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
              get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
           count(col("k")).as("n_valid"),
           count(lit(1)).as("n_total"))
      .orderBy(col("event_type"))

  val qJsonExtractSql: String =
    """SELECT event_type,
      |       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |       COUNT(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS n_valid,
      |       COUNT(*) AS n_total
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // P6/F3 — permissive numeric parse with 0.0 default (UserHotcar.java:
  // 57-62). 'error'-type rows get a poisoned string that fails the cast
  // and falls back to the default — mirroring the reference's swallowed
  // NumberFormatException. Integer-valued doubles sum exactly.
  val qPermissiveCast: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("event_type"),
              Ops.permissiveDouble(
                concat(col("event_id").cast("string"),
                       when(col("event_type") === "error", lit("x")).otherwise(lit(""))))
                .as("parsed"))
      .groupBy(col("event_type"))
      .agg(sum(col("parsed")).as("parsed_sum"), count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val qPermissiveCastSql: String =
    """SELECT event_type,
      |       SUM(COALESCE(TRY_CAST(CAST(event_id AS VARCHAR) ||
      |             CASE WHEN event_type = 'error' THEN 'x' ELSE '' END AS DOUBLE),
      |           0.0)) AS parsed_sum,
      |       COUNT(*) AS n
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // F4 — |a − b| distance scoring (UserHotcar.java:77) as an aggregate
  // per market segment; exact decimal average (SURVEY §7.4 parity rules).
  val qAbsDist: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    o.join(c, o("o_custkey") === c("c_custkey"), "inner")
      .groupBy(col("c_mktsegment"))
      .agg((sum(abs(col("o_totalprice") - col("c_acctbal")).cast("decimal(18,2)"))
              .cast("double") / count(lit(1))).as("avg_dist"),
           count(lit(1)).as("n_orders"))
      .orderBy(col("c_mktsegment"))
  }

  val qAbsDistSql: String =
    """SELECT c_mktsegment,
      |       CAST(SUM(CAST(ABS(o_totalprice - c_acctbal) AS DECIMAL(18,2))) AS DOUBLE)
      |         / COUNT(*) AS avg_dist,
      |       COUNT(*) AS n_orders
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // S11 — job counters as observable aggregates (UserHotcar.java:97-98:
  // valid-user counter). Dataset.observe carries the running metrics on
  // the returned plan (the Spark-native accumulator surface); the query
  // result is the same counts as a relation.
  // The JSON validity flag is projected ONCE before the observe, so the
  // CollectMetrics node and the aggregate share a single
  // get_json_object parse per row instead of each running the parser
  // (2× the JSON cost — the measured bottleneck at the 10× stress).
  val qCounters: Q = (s, d) =>
    Tables.events(s, d)
      .select(col("user_id"),
              when(get_json_object(col("props"), "$.k").isNotNull, 1L)
                .otherwise(0L).as("k_valid"))
      .observe("graft_counters",
               count(lit(1)).as("rows_seen"),
               sum(col("k_valid")).as("rows_valid"))
      .agg(count(lit(1)).as("n_total"),
           sum(col("k_valid")).as("n_valid"),
           countDistinct(col("user_id")).as("n_users"))

  val qCountersSql: String =
    """SELECT COUNT(*) AS n_total,
      |       CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
      |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
      |       COUNT(DISTINCT user_id) AS n_users
      |FROM events""".stripMargin

  // Aggregation breadth beyond the reference (SURVEY §2.4 marks these
  // absent-but-free): ROLLUP subtotals over the classic pricing-summary
  // shape. Subtotal NULLs are rendered as 'ALL' on both sides so the
  // engines' differing NULL sort orders can't skew the compare.
  // Two-level: pre-aggregate on the FINEST grouping (9 groups), then
  // rollup the bounded aggregate. Spark's Expand runs BELOW the partial
  // aggregate, so a direct rollup replicates every scan row once per
  // grouping set (×3 here) before any combining — at 100 TB that's 3×
  // the map output and 3× the shuffle. Decimal sums and counts are
  // exactly decomposable (decimal addition is associative-exact), so
  // the two-level result is bit-identical; only the Expand input drops
  // from |rows| to |groups|. (Sweep: 2.3 s → sub-second at sf0.1.)
  val qRollup: Q = (s, d) =>
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("dq"),
           sum(col("l_extendedprice").cast("decimal(18,2)")).as("dp"),
           count(lit(1)).as("n"))
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("dq")).cast("double").as("sum_qty"),
           sum(col("dp")).cast("double").as("sum_price"),
           sum(col("n")).as("n_rows"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
              coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
              col("sum_qty"), col("sum_price"), col("n_rows"))
      .orderBy(col("returnflag"), col("linestatus"))

  val qRollupSql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |       COALESCE(l_linestatus, 'ALL') AS linestatus,
      |       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
      |       count(*) AS n_rows
      |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY 1, 2""".stripMargin

  // Window analytics breadth (SURVEY §2.5 absent-but-free): rank, lag,
  // and a 3-row moving sum per customer. The moving sum goes through
  // DECIMAL because sliding-window implementations (running fold vs
  // segment tree) associate float additions differently across engines.
  val qWindowAnalytics: Q = (s, d) => {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val w3 = w.rowsBetween(-2, Window.currentRow)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              rank().over(w).cast("bigint").as("rnk"),
              lag(col("o_totalprice"), 1).over(w).as("prev_price"),
              sum(col("o_totalprice").cast("decimal(18,2)")).over(w3)
                .cast("double").as("moving3_sum"))
    // No final orderBy: O(orders) output; the gate sorts rows and the
    // range sampler would re-run the window.
  }

  val qWindowAnalyticsSql: String =
    """SELECT o_custkey, o_orderkey,
      |       CAST(rank() OVER w AS BIGINT) AS rnk,
      |       lag(o_totalprice, 1) OVER w AS prev_price,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
      |              OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |         AS moving3_sum
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  // Join-type breadth (SURVEY §2.3 marks semi/anti absent-but-free):
  // per nation, customers with vs without orders via left_semi /
  // left_anti against the same build side.
  val qSemiAnti: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    val withOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_with_orders"))
    val withoutOrders = c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_without_orders"))
    c.select(col("c_nationkey")).distinct()
      .join(withOrders, Seq("c_nationkey"), "left")
      .join(withoutOrders, Seq("c_nationkey"), "left")
      .select(col("c_nationkey"),
              coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
              coalesce(col("n_without_orders"), lit(0L)).as("n_without_orders"))
      .orderBy(col("c_nationkey"))
  }

  val qSemiAntiSql: String =
    """SELECT c_nationkey,
      |       CAST(COALESCE(SUM(CASE WHEN EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_with_orders,
      |       CAST(COALESCE(SUM(CASE WHEN NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |                              THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_without_orders
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  // Set-operation breadth (SURVEY §2.6): nations that have customers
  // INTERSECT/EXCEPT nations that have suppliers.
  val qSetOps: Q = (s, d) => {
    val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    cn.intersect(sn).withColumn("set_op", lit("both"))
      .unionByName(cn.except(sn).withColumn("set_op", lit("customer_only")))
      .unionByName(sn.except(cn).withColumn("set_op", lit("supplier_only")))
      .orderBy(col("set_op"), col("nationkey"))
  }

  val qSetOpsSql: String =
    """SELECT * FROM (
      |  SELECT nationkey, 'both' AS set_op FROM (
      |    SELECT c_nationkey AS nationkey FROM customer
      |    INTERSECT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT nationkey, 'customer_only' FROM (
      |    SELECT c_nationkey AS nationkey FROM customer
      |    EXCEPT SELECT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT nationkey, 'supplier_only' FROM (
      |    SELECT s_nationkey AS nationkey FROM supplier
      |    EXCEPT SELECT c_nationkey FROM customer))
      |ORDER BY set_op, nationkey""".stripMargin

  // Skew-resistant SALTED equi-join (the join-side companion of
  // Ops.topKPerGroupSalted): the probe side carries a deterministic
  // salt in 0..R-1, the build side is replicated R× with every salt
  // value, and the join key becomes (key, salt) — a hot customer's
  // rows now land on R reducers instead of one. The salt provably
  // cannot change the result (each probe row still matches exactly its
  // key's build rows, once), which is what the plain-join oracle
  // hash-gates. At scale R is tuned to the observed hot-key factor;
  // AQE's skew-join split is the automatic variant of this pattern.
  // PORTABLE PATTERN, NOT THE RECOMMENDATION: docs/SKEWBENCH.json
  // measured AQE skew-join beating this (1.59 vs 2.48 s, 31% fewer
  // bytes) — production default is AQE on; salt only where AQE is
  // unavailable (README "Skew: the production defaults").
  val SaltBuckets = 8

  val qSaltedJoin: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .withColumn("salt", pmod(hash(col("o_orderkey")), lit(SaltBuckets)))
    val c = Tables.customer(s, d)
      .withColumn("salt", explode(sequence(lit(0), lit(SaltBuckets - 1))))
    o.join(c, o("o_custkey") === c("c_custkey") && o("salt") === c("salt"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
           Ops.exactSum(col("o_totalprice")).as("price_sum"))
      .orderBy(col("c_mktsegment"))
  }

  val qSaltedJoinSql: String =
    """SELECT c_mktsegment, count(*) AS n_orders,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // S4 end-to-end — the reference's production cadence (a daily batch
  // writes `parent/dt=<date>/`, the next job reads exactly one day back,
  // ref UserNewcar.java:241-247): lay events out Hive-partitioned by day,
  // then read ONE day through the partition-column filter and aggregate.
  // The read plans a single-directory scan (partition pruning at planning
  // time — see docs/PLANS.md), which is what makes the daily read O(day),
  // not O(history), at 100 TB. The day choice is data-derived (earliest
  // day) via a bounded 1-row aggregate collect.
  val qDailyPartition: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("ts"), col("user_id"),
              col("event_type"), col("value"))
    val dir = "/tmp/graft_dtpart_" + d.replaceAll("[^A-Za-z0-9.]+", "_")
    graft.sources.TextTables.writeDatePartitioned(ev, dir, "ts")
    val day = ev.agg(date_format(min(col("ts")), "yyyy-MM-dd")).head().getString(0)
    graft.sources.TextTables.readDatePartitionParquet(s, dir, day)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           count_distinct(col("user_id")).as("n_users"),
           sum(col("value").cast("decimal(18,2)")).cast("double").as("value_sum"))
      .orderBy(col("event_type"))
  }

  val qDailyPartitionSql: String =
    """SELECT event_type, count(*) AS n_events,
      |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
      |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
      |FROM events
      |WHERE date_trunc('day', ts) = (SELECT min(date_trunc('day', ts)) FROM events)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_daily_partition"  -> qDailyPartition,
    "q_salted_join"      -> qSaltedJoin,
    "q_rollup"           -> qRollup,
    "q_window_analytics" -> qWindowAnalytics,
    "q_semi_anti_join"   -> qSemiAnti,
    "q_set_ops"          -> qSetOps,
    "q_max_per_group"    -> qMaxPerGroup,
    "q_fixedwidth_parse" -> qFixedwidthParse,
    "q_reduce_join"      -> qReduceJoin,
    "q_broadcast_join"   -> qBroadcastJoin,
    "q_explode_join"     -> qExplodeJoin,
    "q_union"            -> qUnion,
    "q_arity_filter"     -> qArityFilter,
    "q_date_ops"         -> qDateOps,
    "q_json_extract"     -> qJsonExtract,
    "q_permissive_cast"  -> qPermissiveCast,
    "q_abs_dist"         -> qAbsDist,
    "q_counters"         -> qCounters,
  )

  val oracles: Map[String, String] = Map(
    "q_daily_partition"  -> qDailyPartitionSql,
    "q_salted_join"      -> qSaltedJoinSql,
    "q_rollup"           -> qRollupSql,
    "q_window_analytics" -> qWindowAnalyticsSql,
    "q_semi_anti_join"   -> qSemiAntiSql,
    "q_set_ops"          -> qSetOpsSql,
    "q_max_per_group"    -> qMaxPerGroupSql,
    "q_fixedwidth_parse" -> qFixedwidthParseSql,
    "q_reduce_join"      -> qReduceJoinSql,
    "q_broadcast_join"   -> qBroadcastJoinSql,
    "q_explode_join"     -> qExplodeJoinSql,
    "q_union"            -> qUnionSql,
    "q_arity_filter"     -> qArityFilterSql,
    "q_date_ops"         -> qDateOpsSql,
    "q_json_extract"     -> qJsonExtractSql,
    "q_permissive_cast"  -> qPermissiveCastSql,
    "q_abs_dist"         -> qAbsDistSql,
    "q_counters"         -> qCountersSql,
  )
}
