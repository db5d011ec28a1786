package graft

import graft.ext.Stats
import java.sql.Timestamp
import org.apache.spark.sql.functions.{col, length, lit}
import org.scalatest.funsuite.AnyFunSuite

/** Crafted-data invariants for the round-8 distributional-statistics
  * panel (Spearman, robust z-score, CUSUM changepoint, SAX motifs).
  * The DuckDB oracle pins cross-engine exactness; these pin the
  * STATISTICS — known inputs with hand-computable answers.
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String, String)*) =
    rows.toDF("doc_id", "source", "text")

  // Repeat word w k times, space-joined: k tokens, 1 distinct.
  private def rep(w: String, k: Int): String = Seq.fill(k)(w).mkString(" ")

  test("spearman: monotone pair scores +1, anti-monotone −1") {
    // src_up: token count and distinct count rise together (1..4 distinct
    // words over 1/2/3/4 tokens). src_dn: token count rises while
    // distinct count falls (all-distinct short doc → one-word long doc).
    val d = docs(
      (1L, "up", "a"),
      (2L, "up", "a b"),
      (3L, "up", "a b c"),
      (4L, "up", "a b c d"),
      (5L, "dn", "a b c d"),
      (6L, "dn", rep("a", 5) + " b c"),
      (7L, "dn", rep("a", 10) + " b"),
      (8L, "dn", rep("a", 20)))
    val r = Stats.spearman(d).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(math.abs(r("up") - 1.0) < 1e-12)
    assert(math.abs(r("dn") + 1.0) < 1e-12)
  }

  test("spearman: tied ranks use the average-rank convention") {
    // x = (2,2,3,4): ranks (1.5, 1.5, 3, 4). y = (1,2,3,4) strictly
    // rises; with x's tie the hand value is Pearson over
    // ((1.5,1.5,3,4),(1,2,3,4)) = 4.5/sqrt(4.5·5) = 3/sqrt(10).
    val d = docs(
      (1L, "s", "a a"),
      (2L, "s", "a b"),
      (3L, "s", "a b c"),
      (4L, "s", "a b c d"))
    val rho = Stats.spearman(d).collect().head.getDouble(2)
    assert(math.abs(rho - 3.0 / math.sqrt(10.0)) < 1e-12)
  }

  test("robust zscore: median/MAD exact on an odd run, outlier counted") {
    // Token counts 10,12,14,16,100: median 14, |dev| = (4,2,0,2,86)/1
    // → MAD = 2 (median of 0,2,2,4,86). z(100) = 86/(1.4826*2) = 29 ≫ 3:
    // exactly one outlier; the mean-based z-score would have been
    // dragged far less.
    val d = docs(
      (1L, "s", rep("w", 10)), (2L, "s", rep("w", 12)),
      (3L, "s", rep("w", 14)), (4L, "s", rep("w", 16)),
      (5L, "s", rep("w", 100)))
    val row = Stats.robustZscore(d).collect().head
    assert(row.getDouble(2) == 14.0) // median_toks
    assert(row.getDouble(3) == 2.0)  // mad_toks
    assert(row.getLong(4) == 1L)     // n_outliers
  }

  test("robust zscore: even n takes the half-unit midpoint") {
    // Counts 10, 11, 13, 14 → median 12.0, devs (2,1,1,2) → MAD 1.5.
    val d = docs(
      (1L, "s", rep("w", 10)), (2L, "s", rep("w", 11)),
      (3L, "s", rep("w", 13)), (4L, "s", rep("w", 14)))
    val row = Stats.robustZscore(d).collect().head
    assert(row.getDouble(2) == 12.0)
    assert(row.getDouble(3) == 1.5)
    assert(row.getLong(4) == 0L)
  }

  private def events(rows: (String, String, Double)*) =
    rows.map { case (t, day, v) =>
      (1L, Timestamp.valueOf(s"$day 12:00:00"), 7L, t, v, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")

  test("cusum: level shift located at the last day of the old level") {
    // 4 days at 1 event/day then 4 days at 5/day (arrivals counted, not
    // values). S'_t = n·cum − t·T peaks in magnitude at t=4 (the
    // boundary): |S'| = 8·4 − 4·24 = 64, cusum_max = 64/8 = 8.
    val rows = (1 to 4).map(i => ("a", f"2024-01-0$i", 1.0)) ++
      (5 to 8).flatMap(i => Seq.fill(5)(("a", f"2024-01-0$i", 1.0)))
    val r = Stats.cusum(events(rows: _*)).collect().head
    assert(r.getDate(1).toString == "2024-01-04") // cp_day
    assert(r.getDouble(4) == 8.0)                 // cusum_max
    assert(r.getDouble(5) == 1.0)                 // mean_before
    assert(r.getDouble(6) == 5.0)                 // mean_after
  }

  test("cusum: constant series has zero cusum and earliest-day cp") {
    val rows = (1 to 6).map(i => ("a", f"2024-01-0$i", 1.0))
    val r = Stats.cusum(events(rows: _*)).collect().head
    assert(r.getDouble(4) == 0.0)
    assert(r.getDate(1).toString == "2024-01-01")
  }

  test("cusum: absent days count as zero through the shared grid") {
    // Type b fires only on days 1-2 of a 4-day grid established by a:
    // its series is (1,1,0,0) — shift down at day 2.
    val rows = (1 to 4).map(i => ("a", f"2024-01-0$i", 1.0)) ++
      (1 to 2).map(i => ("b", f"2024-01-0$i", 1.0))
    val r = Stats.cusum(events(rows: _*)).collect()
      .find(_.getString(0) == "b").get
    assert(r.getLong(2) == 4L)                    // n_days (grid, not 2)
    assert(r.getDate(1).toString == "2024-01-02")
  }

  test("sax motifs: tertile symbols and window census are exact") {
    // Daily value sums 1,1,1,5,5,5,9,9,9 → tertiles put 9s in 'c',
    // 5s in 'b', 1s in 'a': symbol string aaabbbccc → motifs
    // aaa, aab, abb, bbb, bbc, bcc, ccc (each once).
    val rows = (1 to 9).map { i =>
      val v = if (i <= 3) 1.0 else if (i <= 6) 5.0 else 9.0
      ("a", f"2024-01-0$i", v)
    }
    val m = Stats.saxMotifs(events(rows: _*)).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(m == Map("aaa" -> 1L, "aab" -> 1L, "abb" -> 1L, "bbb" -> 1L,
                    "bbc" -> 1L, "bcc" -> 1L, "ccc" -> 1L))
  }

  test("dbscan: crafted geometry splits core/border/noise correctly") {
    // Unit vectors in a 2-D subspace at angle θ: cosine similarity =
    // cos(Δθ), so ε = 0.2 admits Δθ ≲ 78°. Hub at 0° with spokes at
    // ±60° (edges only to the hub) → hub core (deg 2), spokes border;
    // an isolated pair at 150°/215° (Δθ = 65°, one edge) sits below
    // MinPts = 2 on both ends → DBSCAN calls tight-but-tiny groups
    // noise, which k-means never can.
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array.tabulate(64)(i =>
        if (i == 0) math.cos(r).toFloat
        else if (i == 1) math.sin(r).toFloat else 0f)
    }
    val emb = Seq(
      (0L, 0, v(0)), (4L, 0, v(60)), (8L, 0, v(300)),
      (12L, 0, v(150)), (16L, 0, v(215)))
      .toDF("vec_id", "label", "embedding")
    val got = Stats.dbscan(emb).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == Set(
      (0L, "core", 0L), (4L, "border", 0L), (8L, "border", 0L),
      (12L, "noise", -1L), (16L, "noise", -1L)))
  }

  test("knn classify: majority vote with deterministic tie order") {
    // Query vec 0 (selected by % 16). Five nearest: ids 1-3 identical
    // to the query (cos 1.0), ids 4-5 at 10° (cos ≈ .985). Labels
    // 2,2,3,3,3 → majority 3 beats the query's true label 1 →
    // confusion row (1, 3, 1).
    def v(deg: Double): Array[Float] = {
      val r = math.toRadians(deg)
      Array.tabulate(64)(i =>
        if (i == 0) math.cos(r).toFloat
        else if (i == 1) math.sin(r).toFloat else 0f)
    }
    val emb = Seq(
      (0L, 1, v(0)), (1L, 2, v(0)), (2L, 2, v(0)), (3L, 3, v(0)),
      (4L, 3, v(10)), (5L, 3, v(10)), (6L, 9, v(90)), (7L, 9, v(90)))
      .toDF("vec_id", "label", "embedding")
    val got = Stats.knnClassify(emb).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq((1, 3, 1L)), s"got $got")
  }

  test("ab test: hand-computed two-proportion z on a crafted split") {
    // Variant A (even user): 10 events, 5 purchases; B (odd): 10
    // events, 2 purchases. Pooled p = 0.35 → z = 0.3 /
    // sqrt(0.35·0.65·0.2) ≈ 1.4066 — NOT significant at 1.96: the
    // readout must resist a 2.5x rate ratio on tiny n.
    val rows =
      (1 to 10).map(i => (if (i <= 5) "purchase" else "view", 0L)) ++
      (1 to 10).map(i => (if (i <= 2) "purchase" else "view", 1L))
    val ev = rows.zipWithIndex.map { case ((t, u), i) =>
      (i.toLong, Timestamp.valueOf("2024-01-01 12:00:00"), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val r = Stats.abTest(ev).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
           ((10L, 5L, 10L, 2L)))
    assert(math.abs(r.getDouble(6) -
      0.3 / math.sqrt(0.35 * 0.65 * 0.2)) < 1e-12)
    assert(!r.getBoolean(7))
  }

  test("decile lift: deciles partition the corpus and quality rises") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val rows = Stats.decileLift(docs).collect()
    assert(rows.map(_.getLong(1)).sum == docs.count())
    val mq = rows.map(_.getDouble(2))
    assert(mq.zip(mq.tail).forall { case (a, b) => a <= b },
           s"mean_quality not monotone: ${mq.mkString(",")}")
  }

  test("entropy rate: deterministic chain scores exactly zero") {
    // "a b a b …" has p(b|a) = p(a|b) = 1 → H(cur|prev) = 0 exactly
    // (every snapped ln 1 = 0). A branching source must score > 0.
    val d = docs(
      (1L, "det", ("a b " * 10).trim),
      (2L, "mix", "a a a b b b a b b a"))
    val r = Stats.entropyRate(d).collect()
      .map(x => x.getString(0) -> x.getDouble(2)).toMap
    assert(r("det") == 0.0)
    assert(r("mix") > 0.1)
  }

  test("hampel: spike flagged against a noisy rolling window") {
    // Series 10,12,10,12,10,1000,12,10,12: the spike day's ±3 window
    // has median 12 and MAD 2 → z ≈ 333; every other day stays within
    // ±1.4 robust sigmas. Exactly one flag.
    val vals = Seq(10.0, 12.0, 10.0, 12.0, 10.0, 1000.0, 12.0, 10.0, 12.0)
    val rows = vals.zipWithIndex.map { case (v, i) =>
      ("a", f"2024-01-0${i + 1}", v)
    }
    val got = Stats.hampel(events(rows: _*)).collect()
    assert(got.length == 1)
    assert(got.head.getDate(1).toString == "2024-01-06")
    assert(got.head.getDouble(2) == 1000.0)
    assert(got.head.getDouble(3) > 100.0)
  }

  test("hampel: constant series flags nothing (MAD-zero guard)") {
    val rows = (1 to 9).map(i => ("a", f"2024-01-0$i", 10.0))
    assert(Stats.hampel(events(rows: _*)).collect().isEmpty)
  }

  test("winsorize: p5/p95 clamp and robust mean, hand-checked") {
    // Lengths 1..19 plus one 1000-token doc (n = 20): rank cuts are
    // ceil(.05·20) = 1 → lo = 1 and ceil(.95·20) = 19 → hi = 19, so
    // only the 1000 clamps: mean = (Σ1..19 + 19)/20 = 10.45 — vs the
    // raw mean 59.5 the outlier would have bought.
    val d = docs((1 to 19).map(i => (i.toLong, "s", rep("w", i))) :+
                 (20L, "s", rep("w", 1000)): _*)
    val r = Stats.winsorize(d).collect().head
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((20L, 1L, 19L)))
    assert(r.getDouble(4) == 10.45)
    assert(r.getLong(5) == 1L)
  }

  test("cluster margin: partition-complete and bounded below by a quantum") {
    // Assignment maximizes the RAW dot, so a vector's snapped own-dot
    // can trail the best other by at most one 1e-6 quantum: per-cell
    // mean margin ≥ −1e-6 exactly, and cells partition the corpus.
    val emb = Tables.embeddings(spark, TestSpark.Sf)
    val rows = ext.Similarity.qClusterMargin(spark, TestSpark.Sf).collect()
    assert(rows.map(_.getLong(1)).sum == emb.count())
    assert(rows.forall(_.getDouble(2) >= -1e-6))
  }

  test("welch t: hand-computed t and Satterthwaite df") {
    // a: lengths 10,12,14 (mean 12, s²=4); b: 20,22,24 (mean 22,
    // s²=4). Equal se² = 4/3 → t = −10/√(8/3), df = (8/3)²/((16/9)/2
    // + (16/9)/2) = 4 exactly.
    val d = docs(
      (1L, "a", rep("w", 10)), (2L, "a", rep("w", 12)),
      (3L, "a", rep("w", 14)),
      (4L, "b", rep("w", 20)), (5L, "b", rep("w", 22)),
      (6L, "b", rep("w", 24)))
    val r = Stats.welchTtest(d).collect().head
    assert(math.abs(r.getDouble(4) + 10.0 / math.sqrt(8.0 / 3.0)) < 1e-12)
    assert(math.abs(r.getDouble(5) - 4.0) < 1e-9)
  }

  test("chi2: zero under independence, n under perfect dependence") {
    val indep = Seq(
      (1L, "s1", "en"), (2L, "s1", "de"),
      (3L, "s2", "en"), (4L, "s2", "de"))
      .toDF("doc_id", "source", "lang")
    val ri = Stats.chi2(indep).collect().head
    assert(ri.getDouble(0) == 0.0 && ri.getLong(1) == 1L)
    val dep = Seq(
      (1L, "s1", "en"), (2L, "s1", "en"),
      (3L, "s2", "de"), (4L, "s2", "de"))
      .toDF("doc_id", "source", "lang")
    val rd = Stats.chi2(dep).collect().head
    assert(rd.getDouble(0) == 4.0 && rd.getLong(1) == 1L)
  }

  test("assoc rules: hand-computed support/confidence/lift") {
    // 10 users: 6 do both A and B, 2 A-only, 2 B-only. Both directed
    // rules: support 0.6, confidence 6/8, lift 6·10/(8·8).
    val rows =
      (1 to 6).flatMap(u => Seq(("A", u.toLong), ("B", u.toLong))) ++
      (7 to 8).map(u => ("A", u.toLong)) ++
      (9 to 10).map(u => ("B", u.toLong))
    val ev = rows.zipWithIndex.map { case ((t, u), i) =>
      (i.toLong, Timestamp.valueOf("2024-01-01 12:00:00"), u, t, 1.0, "{}")
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val got = Stats.assocRules(ev).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
                 r.getDouble(5), r.getDouble(6), r.getDouble(7))).toSeq
    assert(got == Seq(
      ("A", "B", 6L, 0.6, 0.75, 60.0 / 64.0),
      ("B", "A", 6L, 0.6, 0.75, 60.0 / 64.0)), s"got $got")
  }

  test("minhash eval: identical docs land in the 32-match bucket, error-free") {
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val b = "one two three four five six seven eight nine ten eleven"
    val d = Seq((1L, a), (2L, a), (3L, b))
      .toDF("doc_id", "text")
      .withColumn("source", lit("s")).withColumn("lang", lit("en"))
      .withColumn("n_chars", length(col("text")))
    // Route through the registry entry by writing a scratch dir.
    val tmp = java.nio.file.Files.createTempDirectory("graft_mh").toString
    d.write.parquet(s"$tmp/documents.parquet")
    val got = ext.Dedup.qMinhashEval(spark, tmp).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
                 r.getDouble(3))).toSeq
    assert(got == Seq((32L, 1L, 1.0, 0.0)), s"got $got")
  }

  test("min-label propagation survives a high-diameter path graph") {
    // A 24-node path needs ~23 propagation rounds; before the round-4
    // lineage truncation in Corpus.minLabelPropagate the per-round plan
    // DOUBLED and stringifying it for the cache name OOM'd the driver
    // (found by q_dbscan's ε-graph, which has real diameter unlike the
    // dedup callers' star graphs).
    val n = 24
    val verts = (1 to n).map(_.toLong).toDF("doc_id")
    val edges = (1 until n).flatMap(i =>
      Seq((i.toLong, i + 1L), (i + 1L, i.toLong))).toDF("src", "dst")
    val labels = ext.Corpus.minLabelPropagate(verts, edges).collect()
    assert(labels.length == n && labels.forall(_.getLong(1) == 1L))
  }

  test("sax motifs: threshold ties land on the high side, like buckets") {
    // Sums 1,1,1,1,1,9: t1 = 9 (top-third rank cuts at ceil(6/3)=2 →
    // the 9 and one 1... rank logic: cum desc ≥ 2 first reaches a 1),
    // so verify against the cut the rank recipe actually produces: the
    // motif census still covers n−2 windows.
    val rows = (1 to 6).map(i => ("a", f"2024-01-0$i", if (i == 6) 9.0 else 1.0))
    val m = Stats.saxMotifs(events(rows: _*)).collect()
    assert(m.map(_.getLong(2)).sum == 4L) // 6 days → 4 sliding windows
  }
}
