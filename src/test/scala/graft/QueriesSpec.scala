package graft

import graft.ext.{Dedup, Similarity, TextOps}
import graft.jobs.RecPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the registered queries on sf0.001 — the checks
  * the DuckDB hash-compare can't express (join semantics, bounds,
  * format), plus goldens for the reference join on its own fixture shape
  * (FIXTURES.md §1.2).
  */
class QueriesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  test("every registered query returns rows on sf0.001") {
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, s"$name failed")
      // near-dup pair finders may legitimately be empty on a tiny SF
      if (!Set("q_ngram_jaccard", "q_dedup_block").contains(name))
        assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry (flagship) smoke: rows > 0") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracle coverage: every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  test("q_embed_project: projections equal the md5-sign micro-unit sums") {
    val got = Similarity.qEmbedProject(spark, sf)
      .as[(Long, Long, Long)].collect()
    val vecs = Tables.embeddings(spark, sf)
      .select($"vec_id", $"embedding").as[(Long, Array[Float])].collect().toMap
    assert(got.length == vecs.size * Similarity.ProjDim)
    def md5hex(x: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(x.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def sign(j: Long, i: Int): Long =
      if ("02468ace".indexOf(md5hex(s"${j}_${i}").charAt(0)) >= 0) 1L else -1L
    // Spark round() on double is BigDecimal HALF_UP — replicate exactly
    def micro(x: Float): Long =
      BigDecimal(x.toDouble * 1e6)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    got.take(4 * Similarity.ProjDim).foreach { case (v, j, p) =>
      val e = vecs(v)
      val want = e.indices.map(i => sign(j, i) * micro(e(i))).sum
      assert(p == want, s"vec $v component $j")
    }
  }

  test("q_skyline window formulation == brute-force dominance check") {
    import graft.jobs.AnalyticsQueries
    val got = AnalyticsQueries.qSkyline(spark, sf)
      .select($"c_mktsegment", $"o_orderkey", $"d_days", $"o_totalprice")
      .as[(String, Long, Long, Double)].collect()
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val all = o.join(c, o("o_custkey") === c("c_custkey"))
      .select($"c_mktsegment", $"o_orderkey",
              datediff($"o_orderdate", lit("1970-01-01")).cast("long"),
              $"o_totalprice")
      .as[(String, Long, Long, Double)].collect()
    val bySeg = all.groupBy(_._1)
    val want = all.filter { case (seg, key, d0, p0) =>
      !bySeg(seg).exists { case (_, k2, d2, p2) =>
        k2 != key && d2 >= d0 && p2 >= p0 && (d2 > d0 || p2 > p0)
      }
    }.map(r => (r._1, r._2, r._3, r._4)).toSet
    assert(got.toSet == want)
    assert(got.nonEmpty)
  }

  test("reduce-join golden (employee⋈dept fixture shape): inner, not left") {
    // Reference javadoc fixture (ReduceJoinJob.java:36-45): dept 3 has no
    // employees -> must NOT appear (actual semantics are inner despite
    // the documented `left join`, SURVEY §7.4.2).
    val emp = Seq(("Bob", 70000L, 5L), ("Alice", 72000L, 2L),
                  ("Amar", 60000L, 5L), ("Joe", 55000L, 5L))
      .toDF("name", "salary", "dept_id")
    val dept = Seq((2L, "Marking"), (3L, "Finance"), (5L, "Sales"))
      .toDF("dept_id", "dept_name")
    val got = emp.join(dept, Seq("dept_id"), "inner")
      .select($"name", $"dept_id", $"dept_name", $"salary")
      .as[(String, Long, String, Long)].collect().toSet
    assert(got == Set(
      ("Alice", 2L, "Marking", 72000L),
      ("Bob", 5L, "Sales", 70000L),
      ("Amar", 5L, "Sales", 60000L),
      ("Joe", 5L, "Sales", 55000L)))
  }

  test("flagship q_recommend: bounded top-K, valid payload format") {
    val rec = RecPipeline.qRecommend(spark, sf)
    val rows = rec.select($"user_city", $"payload", $"n_items")
      .as[(String, String, Long)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_._3 <= RecPipeline.TopK))
    val fmt = """\{"infoids": "\d+@\d\.\d{4}(,\d+@\d\.\d{4})*"\}""".r
    rows.take(50).foreach { case (uc, payload, _) =>
      assert(uc.matches("""\d+_\d+"""), s"bad key $uc")
      assert(fmt.matches(payload), s"bad payload $payload")
    }
  }

  test("q_topk_per_group: rn bounded and distances ascending per group") {
    val rows = RecPipeline.qTopkPerGroup(spark, sf)
      .select($"c_custkey", $"dist", $"rn").as[(Long, Double, Long)].collect()
    assert(rows.forall(_._3 <= 10))
    rows.groupBy(_._1).foreach { case (_, g) =>
      val byRank = g.sortBy(_._3).map(_._2)
      assert(byRank.sameElements(byRank.sorted))
    }
  }

  test("q_minmax_norm: scores within [0,1]") {
    val s = RecPipeline.qMinmaxNorm(spark, sf)
      .select($"score").as[Double].collect()
    assert(s.forall(v => v >= 0.0 && v <= 1.0 && !v.isNaN))
  }

  test("dedup exact: canonical ids unique, copies cover corpus") {
    val d = Dedup.qDedupExact(spark, sf)
      .select($"canonical_id", $"n_copies").as[(Long, Long)].collect()
    assert(d.map(_._1).distinct.length == d.length)
    assert(d.map(_._2).sum == Tables.documents(spark, sf).count())
  }

  test("minhash dedup: planted near-duplicates are caught") {
    import org.apache.spark.sql.SaveMode
    // Plant: 60 docs, 3 of which are near-identical copies.
    val base = (1 to 60).map { i =>
      val words = (1 to 40).map(j => s"w${(i * 31 + j * 7) % 97}").mkString(" ")
      (i.toLong, words, "en", "src", words.length.toLong)
    }
    val dup = Seq(
      (101L, base(0)._2, "en", "src", base(0)._2.length.toLong),
      (102L, base(0)._2 + " extra", "en", "src", base(0)._2.length + 6L))
    val dir = java.nio.file.Files.createTempDirectory("graft_minhash").toString
    (base ++ dup).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val out = Dedup.qDedupMinhash(spark, dir)
      .select($"doc_id", $"is_dup", $"max_jaccard").as[(Long, Long, Double)]
      .collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(101L)._1 == 1L, "exact copy must be flagged dup")
    assert(out(1L)._2 >= 0.9, "original must see its near-dup partner")
    assert(out(102L)._2 >= 0.8, "near copy must have high jaccard")
  }

  test("simhash: identical texts collide, hamming-far texts differ") {
    val out = Dedup.qDedupSimhash(spark, sf)
      .select($"doc_id", $"simhash").as[(Long, Long)].collect()
    assert(out.length == 500 && out.map(_._2).distinct.length > 400)
  }

  test("similarity: ANN results are a subset-quality check vs brute force") {
    val exact = Similarity.qSimilarityTopk(spark, sf)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val ann = Similarity.qAnnLsh(spark, sf)
      .select($"qid", $"bucket", $"vec_id", $"score", $"rn").collect()
    // ANN only sees its bucket: every returned neighbor must share the
    // query's bucket (structural), scores sorted desc per query.
    assert(ann.nonEmpty)
    ann.groupBy(_.getLong(0)).foreach { case (_, g) =>
      val scores = g.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(scores.sameElements(scores.sortBy(-(_: Double))))
    }
    assert(exact.nonEmpty)
  }

  test("semdedup: keep-rule — min-centroid-cosine member per cell survives") {
    val out = Similarity.qSemDedup(spark, sf)
      .select($"vec_id", $"cell", $"cent_cos", $"is_dropped")
      .as[(Long, Long, Double, Long)].collect()
    assert(out.length == 500, "every vector must appear exactly once")
    assert(out.forall(r => r._4 == 0L || r._4 == 1L))
    assert(out.exists(_._4 == 1L) && out.exists(_._4 == 0L),
      "threshold should neither drop everything nor nothing")
    // A vector is dropped only by a partner with strictly lower
    // (cent_cos, vec_id), so each cell's minimum can never lose a pair.
    // (SemCellCap doesn't bind at sf0.001 — max cell size << 256 — so
    // participants == members and the invariant covers whole cells.)
    out.groupBy(_._2).foreach { case (cell, g) =>
      val keeper = g.minBy(r => (r._3, r._1))
      assert(keeper._4 == 0L, s"cell $cell: min-cent_cos member was dropped")
    }
  }

  test("ann_pq: ADC shortlist re-rank beats chance recall vs brute force") {
    val exact = Similarity.qSimilarityTopk(spark, sf)
      .select($"qid", $"vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val pq = Similarity.qAnnPq(spark, sf)
      .select($"qid", $"vec_id", $"adc", $"score", $"rn").collect()
    val got = pq.groupBy(_.getLong(0))
    // structural: exactly TopK rows per query, exact scores sorted desc
    got.foreach { case (_, g) =>
      assert(g.length == Similarity.TopK)
      val scores = g.sortBy(_.getLong(4)).map(_.getDouble(3))
      assert(scores.sameElements(scores.sortBy(-(_: Double))))
    }
    // recall floor: the 40-candidate ADC shortlist must recover far more
    // of the exact top-5 than a random 40-of-499 shortlist would (~8%
    // expected recall at sf0.001; measured ~56% — pin a 0.35 floor)
    val recalls = exact.map { case (q, ids) =>
      got(q).map(_.getLong(1)).toSet.intersect(ids).size.toDouble / ids.size
    }
    val mean = recalls.sum / recalls.size
    assert(mean >= 0.35, s"PQ mean recall $mean below floor")
  }

  test("ann_ivfpq: probed-cell candidates only, exact scores sorted") {
    val out = Similarity.qAnnIvfpq(spark, sf)
      .select($"qid", $"cell", $"vec_id", $"adc", $"score", $"rn").collect()
    assert(out.nonEmpty)
    // every query returns at most TopK rows; exact scores sorted desc;
    // ADC is a real pre-filter: the shortlist survivors carry finite ADC
    out.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.length <= Similarity.TopK)
      val scores = g.sortBy(_.getLong(5)).map(_.getDouble(4))
      assert(scores.sameElements(scores.sortBy(-(_: Double))))
    }
    // pruning respects the IVF geometry: a candidate's cell must be one
    // of its query's probed cells
    val e0 = Tables.embeddings(spark, sf)
    val mat = Similarity.trainCodebook(e0)
    val probed = e0.filter($"vec_id" < Similarity.NumQueries)
      .select($"vec_id".as("qid"),
        explode(slice(graft.functions.VectorFunctions.matrixDotRank(
          $"embedding", mat, Similarity.Dim), 1, Similarity.NProbe)).as("pc"))
      .select($"qid", $"pc".cast("bigint"))
      .as[(Long, Long)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).toSet).toMap
    out.foreach { r =>
      assert(probed(r.getLong(0)).contains(r.getLong(1)),
             s"candidate cell ${r.getLong(1)} not probed for qid ${r.getLong(0)}")
    }
  }

  test("stratified sample: deterministic, honors per-language fractions") {
    import graft.ext.Pipeline
    val a = Pipeline.qStratifiedSample(spark, sf).collect().toSeq
    val b = Pipeline.qStratifiedSample(spark, sf).collect().toSeq
    assert(a == b, "seeded sampling must be run-deterministic")
    a.foreach { r =>
      val (lang, n, total) = (r.getString(0), r.getLong(1), r.getLong(3))
      if (lang == "en")
        assert(n < total && n > total / 5, s"en downsampled oddly: $n of $total")
      else assert(n == total, s"minority lang $lang must be kept whole")
    }
  }

  test("approx distinct: portable HLL estimate within 2/sqrt(m) of exact") {
    import graft.ext.Sessions
    val rows = Sessions.qApproxDistinct(spark, sf)
      .select($"exact_users", $"approx_users").as[(Long, Double)].collect()
    assert(rows.nonEmpty)
    // m=64 registers -> standard error 1.04/sqrt(64) = 13%; assert 2 sigma
    rows.foreach { case (exact, approx) =>
      assert(math.abs(approx - exact) / exact <= 0.26,
             s"approx $approx too far from exact $exact")
    }
  }

  test("native HLL sketch aggregate == relational register formulation (bit-equal)") {
    import graft.ext.Sessions
    val native = Sessions.qApproxDistinct(spark, sf)
      .select($"event_type", $"approx_users").as[(String, Double)].collect().toMap
    val relational = Sessions.hllRelational(spark, sf)
      .select($"event_type", round($"e", 4).as("e")).as[(String, Double)]
      .collect().toMap
    assert(native.keySet == relational.keySet)
    native.foreach { case (k, v) =>
      assert(v == relational(k), s"$k: native $v != relational ${relational(k)}")
    }
  }

  test("as-of join: prior click is at-or-before the purchase, per user") {
    import graft.ext.Sessions
    val rows = Sessions.qAsofJoin(spark, sf)
      .select($"user_id", $"purchase_us", $"gap_us")
      .collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.isNullAt(2) || r.getLong(2) >= 0L))
  }

  test("lang-id + quality: outputs well-formed") {
    val conf = TextOps.qLangId(spark, sf)
      .select($"predicted").as[String].collect().toSet
    assert(conf.subsetOf(Set("en", "de", "es", "fr", "other")))
    val q = TextOps.qQualityScore(spark, sf).select($"quality").as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("analytics breadth: pivot rows sum to joined count, sets include total") {
    import graft.jobs.AnalyticsQueries
    val piv = AnalyticsQueries.qPivot(spark, sf).collect()
    val pivTotal = piv.map(r => (1 to 5).map(r.getLong).sum).sum
    val joined = graft.Tables.orders(spark, sf)
      .join(graft.Tables.customer(spark, sf),
            $"o_custkey" === $"c_custkey").count()
    assert(pivTotal == joined, "pivot cells must partition the joined rows")
    val sets = AnalyticsQueries.qGroupingSets(spark, sf)
      .select($"returnflag", $"linestatus", $"n_rows")
      .as[(String, String, Long)].collect()
    val total = graft.Tables.lineitem(spark, sf).count()
    assert(sets.count { case (r, l, _) => r == "ALL" && l == "ALL" } == 1)
    assert(sets.find { case (r, l, _) => r == "ALL" && l == "ALL" }.get._3 == total)
    // each single-dimension slice also partitions the table
    assert(sets.filter(s => s._1 != "ALL").map(_._3).sum == total)
    assert(sets.filter(s => s._2 != "ALL").map(_._3).sum == total)
  }

  test("quantile sketch: within one bin width of exact percentile_cont") {
    import graft.jobs.AnalyticsQueries
    val est = AnalyticsQueries.qQuantileSketch(spark, sf)
      .select($"status", $"p50_est", $"p90_est")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = graft.Tables.orders(spark, sf)
      .groupBy($"o_orderstatus".as("status"))
      .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)").as("p50"),
           expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)").as("p90"))
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(est.keySet == exact.keySet && est.nonEmpty)
    est.foreach { case (k, (e50, e90)) =>
      assert(math.abs(e50 - exact(k)._1) <= AnalyticsQueries.QBinWidth,
             s"$k p50 $e50 vs ${exact(k)._1}")
      assert(math.abs(e90 - exact(k)._2) <= AnalyticsQueries.QBinWidth,
             s"$k p90 $e90 vs ${exact(k)._2}")
    }
  }

  test("latest-by-key keeps exactly one max-ts row per key; range join bounded") {
    import graft.jobs.AnalyticsQueries
    val latest = AnalyticsQueries.qLatestByKey(spark, sf)
      .groupBy($"user_id", $"event_type").count()
      .filter($"count" > 1).count()
    assert(latest == 0L, "one survivor per key")
    val rj = AnalyticsQueries.qRangeJoin(spark, sf)
      .select($"n_preceding").as[Long].collect()
    assert(rj.forall(_ > 0), "inner range join emits only matched errors")
  }

  test("benford: integer-cascade leading digit, zero-filled grid") {
    import graft.jobs.AnalyticsQueries
    // cents 123 -> 1, 5 -> 5, 98765432 -> 9 (exercises the 4/2/1
    // steps), 10 -> 1, 99999999 -> 9 (all-nines boundary).
    val vals = Seq(1.23, 0.05, 987654.32, 0.10, 999999.99).toDF("x")
    val got = AnalyticsQueries.benford(vals, spark)
      .select($"digit", $"n_obs").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 0L), (3L, 0L), (4L, 0L), (5L, 1L),
                      (6L, 0L), (7L, 0L), (8L, 0L), (9L, 2L)), s"got $got")
    val shares = AnalyticsQueries.benford(vals, spark)
      .select($"exp_share").as[Double].collect()
    assert(math.abs(shares.sum - 1.0) < 1e-5,
           "Benford expectations must sum to ~1")
    assert(shares.head == 0.30103, "snapped log10(2)")
  }

  test("burstiness: constant stream scores 0, crafted burst hits Fano") {
    import graft.ext.Sessions
    // smooth: 2 events every day over 4 days -> Var 0 -> fano 0.
    // bursty: 8 events on one day, 0 on the other three ->
    //   n=4, sum=8, s2=64: fano = (4*64 - 64)/(4*8) = 6.
    val ts = (day: Int, k: Int) =>
      java.sql.Timestamp.valueOf(f"2026-01-0$day 0$k:00:00")
    val rows =
      (1 to 4).flatMap(d => Seq(("smooth", ts(d, 1)), ("smooth", ts(d, 2)))) ++
        (1 to 8).map(k => ("bursty", ts(2, k)))
    val got = Sessions.burstiness(rows.toDF("event_type", "ts"))
      .as[(String, Long, Long, Double, Double)].collect().toSeq
    assert(got == Seq(("bursty", 4L, 8L, 2.0, 6.0),
                      ("smooth", 4L, 8L, 2.0, 0.0)), s"got $got")
  }

  test("ewma daily: local replay of the half-life chain is bit-exact") {
    import graft.ext.Sessions
    val rows = Sessions.qEwmaDaily(spark, sf)
      .select($"event_type", $"day".cast("string"), $"value_sum", $"ewma")
      .as[(String, String, Double, Double)].collect()
    assert(rows.nonEmpty)
    // Replay the exact left-associated bounded chain per type: weights
    // are powers of two, so any divergence is a real semantics bug,
    // not float noise — assert bit equality. The i=0 case doubles as
    // the head pin: a one-term chain renormalizes to the plain sum.
    rows.groupBy(_._1).foreach { case (_, series) =>
      val s = series.sortBy(_._2)
      s.indices.foreach { i =>
        var num = 0.0; var den = 0.0
        (0 until Sessions.EwmaN).foreach { k =>
          val (nt, dt) =
            if (i - k >= 0) (s(i - k)._3 * math.pow(0.5, k), math.pow(0.5, k))
            else (0.0, 0.0)
          num += nt; den += dt
        }
        assert(s(i)._4 == num / den,
               s"ewma mismatch at ${s(i)._1}/${s(i)._2}")
      }
      assert(s.head._4 == s.head._3,
             "first day's ewma must equal its value_sum")
    }
  }
  test("rank fusion: RRF arithmetic replayed from the two rank lists") {
    import spark.implicits._
    val out = Similarity.qRankFusion(spark, TestSpark.Sf)
      .select($"qid", $"vec_id", $"rank_cos", $"rank_dot", $"rrf",
              $"fused_rank")
      .as[(Long, Long, Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_._1)
    for ((_, rows) <- byQ) {
      // exactly FuseK rows, fused_rank 1..K, rrf non-increasing
      assert(rows.length === Similarity.FuseK)
      assert(rows.map(_._6).sorted.toSeq === (1L to Similarity.FuseK))
      val ordered = rows.sortBy(_._6)
      assert(ordered.zip(ordered.drop(1)).forall { case (a, b) =>
        a._5 >= b._5 })
      // the emitted rrf equals the two-term rule from the emitted ranks
      for ((_, _, rc, rd, rrf, _) <- rows) {
        val expect =
          (if (rc > 0) 1.0 / (Similarity.RrfK0 + rc) else 0.0) +
            (if (rd > 0) 1.0 / (Similarity.RrfK0 + rd) else 0.0)
        assert(rrf === expect)
        assert(rc >= 0 && rc <= Similarity.FuseN &&
               rd >= 0 && rd <= Similarity.FuseN)
        assert(rc > 0 || rd > 0, "fused rows come from at least one list")
      }
      // a candidate ranked 1 by BOTH retrievers must lead the fusion
      rows.find(r => r._3 == 1L && r._4 == 1L)
        .foreach(r => assert(r._6 === 1L))
    }
  }
  test("hybrid search: every fused row traces to a source list; both modalities contribute") {
    import spark.implicits._
    val out = Similarity.qHybridSearch(spark, TestSpark.Sf)
      .select($"qid", $"doc_id", $"rank_lex", $"rank_vec", $"rrf",
              $"fused_rank")
      .as[(Long, Long, Long, Long, Double, Long)].collect()
    assert(out.nonEmpty)
    for ((_, _, rl, rv, rrf, _) <- out) {
      assert(rl > 0 || rv > 0)
      val expect =
        (if (rl > 0) 1.0 / (Similarity.RrfK0 + rl) else 0.0) +
          (if (rv > 0) 1.0 / (Similarity.RrfK0 + rv) else 0.0)
      assert(rrf === expect)
    }
    // per query: HybK rows, ranks 1..K, rrf non-increasing
    for ((_, rows) <- out.groupBy(_._1)) {
      assert(rows.length === Similarity.HybK)
      val ordered = rows.sortBy(_._6)
      assert(ordered.map(_._6).toSeq === (1L to Similarity.HybK))
      assert(ordered.zip(ordered.drop(1)).forall { case (a, b) => a._5 >= b._5 })
    }
    // the fusion is genuinely hybrid on this corpus: some emitted rows
    // are lexical-only and some vector-only
    assert(out.exists(r => r._3 > 0 && r._4 == 0))
    assert(out.exists(r => r._4 > 0 && r._3 == 0))
  }
}
