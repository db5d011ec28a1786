package graft.jobs

import graft.Tables
import graft.ops.Ops
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's flagship UserHotcar/UserNewcar pipeline (reference
  * UserHotcar.java:30-249) re-expressed Spark-first over the harness star
  * schema: broadcast join of a big "user" side against a small per-city
  * item table, |price − preference| scoring, per-group full-set min-max
  * normalization, bounded top-K, ordered group-concat into a JSON payload.
  *
  * Harness casting (FIXTURES.md §2 mapping): customer = user profile
  * (c_nationkey = preferred city, c_acctbal = price preference), part =
  * the per-city hot-item side table (city = p_partkey % 25), orders =
  * the per-user priced events used by the standalone top-K/minmax ops.
  *
  * Scale posture: the item side table is bounded (the reference's ~300
  * cities, BASELINE.md) → broadcast; the only shuffle is the window
  * partition on the (user, city) group key; top-K is a rank filter, never
  * a driver-side collect.
  */
object RecPipeline {
  type Q = (SparkSession, String) => DataFrame

  val TopK = 100 // reference HOTCAR_NUM, UserHotcar.java:32

  // T1/T2 — per-group bounded top-K by ascending computed distance
  // (TreeSet sort + break-at-K, UserHotcar.java:152-193), with the
  // deterministic tiebreaker mandated by SURVEY §7.4.4. K=10 keeps the
  // standalone operator's output compact; the flagship uses K=100.
  val qTopkPerGroup: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
      .select(col("c_custkey"), col("o_orderkey"),
              abs(col("o_totalprice") - col("c_acctbal")).as("dist"))
    Ops.topKPerGroup(joined, Seq("c_custkey"), col("dist"), col("o_orderkey"), 10)
    // No final orderBy: K × |users| output rows — the gate sorts rows,
    // and a global sort's range sampling re-runs the window.
  }

  val qTopkPerGroupSql: String =
    """SELECT c_custkey, o_orderkey, dist, rn FROM (
      |  SELECT c_custkey, o_orderkey,
      |         ABS(o_totalprice - c_acctbal) AS dist,
      |         CAST(row_number() OVER (PARTITION BY c_custkey
      |           ORDER BY ABS(o_totalprice - c_acctbal), o_orderkey) AS BIGINT) AS rn
      |  FROM orders JOIN customer ON o_custkey = c_custkey)
      |WHERE rn <= 10""".stripMargin

  // T1/T2 via the bounded-heap aggregate (graftshim.BoundedTopK): same
  // semantics and oracle as q_topk_per_group, but partial aggregation
  // ships only K rows per group per partition through the shuffle — the
  // 100 TB path for skewed/huge groups, and the faithful equivalent of
  // the reference's bounded reducer emit.
  val qTopkHeap: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
      .select(col("c_custkey"), col("o_orderkey"),
              abs(col("o_totalprice") - col("c_acctbal")).as("dist"))
    Ops.topKHeap(joined, Seq("c_custkey"), col("dist"), col("o_orderkey"), 10,
                 outScore = "dist", outId = "o_orderkey")
      .select(col("c_custkey"), col("o_orderkey"), col("dist"), col("rn"))
  }

  // T1/T2 via the two-phase salted formulation (Ops.topKPerGroupSalted):
  // identical semantics and oracle again, but a hot key's first-phase
  // sort spreads over 16 salt buckets — the power-law-skew path. Having
  // it in the registry means the driver's hash gate itself proves the
  // skew plan returns byte-identical results.
  // PORTABLE PATTERN, NOT THE RECOMMENDATION: docs/SKEWBENCH.json
  // measured the BoundedTopK heap (q_topk_heap / Ops.topKHeap)
  // dominating this under skew (0.98 s / 97 MB vs 2.26 s / 237 MB) —
  // production default is the heap aggregate (README "Skew: the
  // production defaults").
  val qTopkSalted: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val joined = o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "inner")
      .select(col("c_custkey"), col("o_orderkey"),
              abs(col("o_totalprice") - col("c_acctbal")).as("dist"))
    Ops.topKPerGroupSalted(joined, Seq("c_custkey"), col("dist"),
                           col("o_orderkey"), 10)
      .select(col("c_custkey"), col("o_orderkey"), col("dist"), col("rn"))
  }

  // A2/A3 — per-group min-max normalization over the *full* group
  // (UserHotcar.java:166-183), with the max==min → 1.0 guard replacing
  // the reference's divide-by-zero NaN (SURVEY §7.4.3).
  val qMinmaxNorm: Q = (s, d) =>
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"),
              Ops.minMaxNorm(col("o_totalprice"), Seq(col("o_custkey"))).as("score"))

  val qMinmaxNormSql: String =
    """SELECT o_custkey, o_orderkey,
      |       CASE WHEN mx = mn THEN 1.0
      |            ELSE 1.0 - (o_totalprice - mn) / (mx - mn) END AS score
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |             min(o_totalprice) OVER (PARTITION BY o_custkey) AS mn,
      |             max(o_totalprice) OVER (PARTITION BY o_custkey) AS mx
      |      FROM orders)""".stripMargin

  // A4/F6/F7 — ordered group-concat (sorted emit + trailing-comma strip,
  // UserHotcar.java:175-198) wrapped in a hand-built JSON envelope (F10).
  val qGroupConcat: Q = (s, d) =>
    Tables.customer(s, d)
      .groupBy(col("c_nationkey"))
      .agg(Ops.orderedConcat(col("c_name")).as("names"),
           count(lit(1)).as("n_members"))
      .select(col("c_nationkey"),
              concat(lit("{\"names\": \""), col("names"), lit("\"}")).as("payload"),
              col("n_members"))
      .orderBy(col("c_nationkey"))

  val qGroupConcatSql: String =
    """SELECT c_nationkey,
      |       '{"names": "' || string_agg(c_name, ',' ORDER BY c_name) || '"}' AS payload,
      |       count(*) AS n_members
      |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin

  // The full flagship pipeline (J2+J3+T1+T2+A2+A3+A4+F10 fused): the
  // complete UserHotcar dataflow as ONE declarative plan. Output rows are
  // `user_city`-keyed JSON payloads, byte-compatible with the reference's
  // `<userId>_<cityId> \001 {"infoids": "..."}` record (FIXTURES.md §1.5)
  // minus the \001 (two columns instead).
  //
  // Shape insight that kills every shuffle: a scoring group is exactly
  // (one user row × its city's bounded item list). So instead of
  // explode → shuffle → window (which moves |users|×|items/city| rows —
  // 12M at sf0.1, petabytes at 100 TB), pre-aggregate the small side to
  // one array per city, broadcast it, and do sort/min-max/top-K/concat
  // per row with array HOFs. The big side is a pure map — no exchange at
  // any scale. array_sort on struct(dist, id) is lexicographic, giving
  // the (dist asc, id asc) deterministic order SURVEY §7.4.4 requires.
  val qRecommend: Q = recommend(TopK)

  /** UserNewcar is a ~95% clone of UserHotcar with K=60 and the side
    * table read from a dt=<yesterday> partition (reference
    * UserNewcar.java:33,241-247) — here one parameterized pipeline. The
    * partitioned-directory side-source itself is covered by
    * sources.TextTables.readDatePartition.
    */
  val TopKNewcar = 60 // reference TOP_60, UserNewcar.java:33
  val qRecommendNewcar: Q = recommend(TopKNewcar)

  private def recommend(k: Int): Q = (s, d) => {
    import org.apache.spark.sql.graftshim.{KClosestItems, RecPayload, Shim}
    // Zero-shuffle flagship shape: broadcast each city's items PRICE-
    // SORTED once, then one native expression per user binary-searches
    // the probe balance and two-pointers outward — O(log n + K) work
    // per user for the exact (dist asc, id asc) top-K, with min/max
    // distance read off the top-K head and the sorted array's endpoints
    // (the extremes are always at the ends of a sorted price list). Two
    // earlier shapes measured under full-plan timing: per-user
    // array_sort of all candidates ran its struct comparator
    // interpreted (22.7 s at sf0.1); explode + bounded-heap aggregate
    // still touched every candidate per user (5.7 s). This touches K
    // per user: sub-second, no aggregate, no extra shuffle.
    // CPU-bound map stage: the per-user top-K costs tens of µs — far
    // above the scan's per-row cost — so the stage must NOT inherit the
    // scan's byte-based split count (a ≤128 MB users file is ONE split,
    // so one core does every user; measured at the 100× relational
    // rung: 1 busy worker for 140 s). A round-robin repartition to the
    // session's parallelism costs one users-table shuffle — megabytes —
    // and buys full-width CPU at every rung. On a real cluster a huge
    // users table splits naturally and this exchange coalesces under
    // AQE; the explicit repartition is for the small-bytes/heavy-CPU
    // regime where split count, not data size, is the bottleneck.
    val users = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey").as("city"), col("c_acctbal"))
      .repartition(s.sparkContext.defaultParallelism)
    val cityItems = Tables.part(s, d)
      .groupBy((col("p_partkey") % 25).cast("int").as("city"))
      .agg(array_sort(collect_list(struct(
             col("p_retailprice").as("price"), col("p_partkey").as("id"))))
             .as("items"),
           min(col("p_retailprice")).as("pmin"),
           max(col("p_retailprice")).as("pmax"))
    val topExpr = Shim.column(KClosestItems(
      Shim.expression(col("items")), Shim.expression(col("c_acctbal")), k))
    // Project the items array away in the SAME stage that consumes it:
    // every operator that carries a row copies it, and a per-row ~13 KB
    // array times the user count is real memcpy. The max distance needs
    // only the price extremes, which are per-city scalars.
    users.join(broadcast(cityItems), Seq("city"), "inner")
      .select(col("c_custkey"), col("city"), col("c_acctbal"),
              topExpr.as("top"), col("pmin"), col("pmax"))
      .withColumn("mn", element_at(col("top"), 1)("score"))
      .withColumn("mx", greatest(abs(col("c_acctbal") - col("pmin")),
                                 abs(col("c_acctbal") - col("pmax"))))
      .select(
        concat(col("c_custkey").cast("string"), lit("_"),
               col("city").cast("string")).as("user_city"),
        concat(lit("{\"infoids\": \""),
               Shim.column(RecPayload(
                 Shim.expression(col("top")), Shim.expression(col("mn")),
                 Shim.expression(col("mx")))),
               lit("\"}")).as("payload"),
        size(col("top")).cast("bigint").as("n_items"))
    // No final orderBy: the output is O(users) rows each carrying a
    // ~K-item JSON payload, and a global sort both shuffles that
    // payload mass and re-executes the join+top-K subtree for range
    // sampling (measured at 100×-diverse: 33.9 → 11.9 s without it).
    // Row order is presentational — the gate sorts rows.
  }

  val qRecommendSql: String = recommendSql(TopK)
  val qRecommendNewcarSql: String = recommendSql(TopKNewcar)

  private def recommendSql(k: Int): String =
    s"""WITH cand AS (
      |  SELECT c_custkey, c_nationkey AS city, p_partkey,
      |         ABS(c_acctbal - p_retailprice) AS dist
      |  FROM customer JOIN part ON CAST(p_partkey % 25 AS INT) = c_nationkey),
      |ranked AS (
      |  SELECT *,
      |         CAST(row_number() OVER (PARTITION BY c_custkey, city
      |                                 ORDER BY dist, p_partkey) AS BIGINT) AS rn,
      |         min(dist) OVER (PARTITION BY c_custkey, city) AS mn,
      |         max(dist) OVER (PARTITION BY c_custkey, city) AS mx
      |  FROM cand),
      |scored AS (
      |  SELECT *, CASE WHEN mx = mn THEN 1.0
      |                 ELSE 1.0 - (dist - mn) / (mx - mn) END AS score
      |  FROM ranked WHERE rn <= $k)
      |SELECT CAST(c_custkey AS VARCHAR) || '_' || CAST(city AS VARCHAR) AS user_city,
      |       '{"infoids": "' ||
      |         string_agg(CAST(p_partkey AS VARCHAR) || '@' || printf('%.4f', score),
      |                    ',' ORDER BY rn) || '"}' AS payload,
      |       count(*) AS n_items
      |FROM scored GROUP BY 1""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_topk_per_group" -> qTopkPerGroup,
    "q_topk_heap"      -> qTopkHeap,
    "q_topk_salted"    -> qTopkSalted,
    "q_minmax_norm"    -> qMinmaxNorm,
    "q_group_concat"   -> qGroupConcat,
    "q_recommend"      -> qRecommend,
    "q_recommend_k60"  -> qRecommendNewcar,
  )

  val oracles: Map[String, String] = Map(
    "q_topk_per_group" -> qTopkPerGroupSql,
    "q_topk_heap"      -> qTopkPerGroupSql, // same semantics, same oracle
    "q_topk_salted"    -> qTopkPerGroupSql, // same semantics, same oracle
    "q_minmax_norm"    -> qMinmaxNormSql,
    "q_group_concat"   -> qGroupConcatSql,
    "q_recommend"      -> qRecommendSql,
    "q_recommend_k60"  -> qRecommendNewcarSql,
  )
}
