package graft

import graft.ext.{Corpus, Dedup, Pipeline, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the corpus-curation diagnostics (rule-funnel
  * quality filter, duplicate-span mass) that the DuckDB hash-compare
  * can't express: conservation laws on the real corpus and exact
  * expected outputs on crafted corpora with known duplication.
  */
class CurationSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  test("q_filter_funnel: doc and token totals are conserved across stages") {
    val stages = TextOps.qFilterFunnel(spark, sf)
      .as[(String, Long, Long)].collect()
    val docs = Tables.documents(spark, sf)
    val expectDocs = docs.count()
    val expectToks = docs
      .agg(sum(size(split(col("text"), " ")).cast("bigint"))).as[Long].head()
    assert(stages.map(_._2).sum == expectDocs,
           "every document must land in exactly one funnel stage")
    assert(stages.map(_._3).sum == expectToks,
           "token mass must be conserved across funnel stages")
    val labels = stages.map(_._1).toSet
    val allowed = Set("1_too_short", "2_too_long", "3_word_len",
                      "4_low_stopword", "5_pass")
    assert(labels.subsetOf(allowed) && labels.contains("5_pass"))
  }

  test("filterFunnel: crafted docs land in their first failing rule") {
    val en = "the a of and to is"            // 6 stopword tokens
    // 24 8-char tokens: mean word len (13 + 24*8)/30 = 6.83 clears 4.0
    val pad = Seq.fill(24)("wordword").mkString(" ")
    val docs = Seq(
      // 6 tokens -> too_short claims it even though stopwords pass
      (1L, en),
      // 30 tokens, mean word len ok, stopwords present -> pass
      (2L, s"$en $pad"),
      // 100 tokens -> too_long
      (3L, Seq.fill(100)("word").mkString(" ")),
      // 30 tokens but every word 12 chars -> word_len (then stopwords
      // would also fail; first-fail attribution must pick word_len)
      (4L, Seq.fill(30)("abcdefghijkl").mkString(" ")),
      // 30 short tokens, no stopwords -> low_stopword
      (5L, Seq.fill(30)("word").mkString(" "))
    ).toDF("doc_id", "text")
    val got = TextOps.filterFunnel(docs)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(got == Map("1_too_short" -> 1L, "2_too_long" -> 1L,
                      "3_word_len" -> 1L, "4_low_stopword" -> 1L,
                      "5_pass" -> 1L))
  }

  test("dupSpanMass: crafted corpus with known duplication is exact") {
    val eight = (1 to 8).map(i => s"t$i").mkString(" ")   // one 8-gram
    val nine = (1 to 9).map(i => s"u$i").mkString(" ")    // two 8-grams
    val docs = Seq(
      (1L, "a", eight),  // dup of doc 2 -> its 1 span is duplicated
      (2L, "a", eight),
      (3L, "b", nine)    // unique -> 2 spans, none duplicated
    ).toDF("doc_id", "source", "text")
    val got = Dedup.dupSpanMass(docs)
      .as[(String, Long, Long, Long, Double)].collect().toList
    assert(got == List(("a", 2L, 2L, 2L, 1.0), ("b", 2L, 0L, 0L, 0.0)))
  }

  test("native shinglesAll == the HOF allSpans reference, every doc incl. short ones") {
    val toks = Tables.documents(spark, sf)
      .select(split($"text", " ").as("t"))
      .unionAll(Seq(Tuple1("a b c"), Tuple1("solo"), Tuple1(""))
        .toDF("x").select(split($"x", " ").as("t")))
    val mism = toks
      .select(graft.ops.Ops.shinglesAll($"t", Dedup.SpanN).as("a"),
              Dedup.allSpansHof($"t").as("b"))
      .filter(not($"a" <=> $"b")).count()
    assert(mism == 0L, "occurrence shingles must be byte-equal to the HOF form")
  }

  test("dedupSubstring: crafted corpus with embedded 50-token repeats is exact") {
    def toks(p: String, r: Range) = r.map(i => s"$p$i")
    def md5s(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val a = toks("a", 1 to 60)                       // 60 unique tokens
    val c = toks("c", 1 to 10) ++ a.take(50) ++ toks("c", 11 to 20)
    val e = toks("x", 1 to 50) ++ toks("x", 1 to 50) // self-repeat
    val docs = Seq(
      (1L, a.mkString(" ")),                 // first-seen: fully kept
      (2L, a.mkString(" ")),                 // exact later dup: fully cut
      (3L, c.mkString(" ")),                 // embedded run from doc 1 cut
      (4L, toks("d", 1 to 40).mkString(" ")),// < 50 tokens: untouched
      (5L, e.mkString(" "))                  // 2nd half self-dup cut
    ).toDF("doc_id", "text")
    val got = Dedup.dedupSubstring(docs)
      .as[(Long, Long, Long, String)].collect().toList
    assert(got == List(
      (1L, 60L, 0L, md5s(a.mkString(" "))),
      (2L, 60L, 60L, md5s("")),
      // doc 3: only the 50-gram at start 11 duplicates doc 1 (grams
      // overlapping c-tokens are unique) -> positions 11..60 removed.
      (3L, 70L, 50L,
       md5s((toks("c", 1 to 10) ++ toks("c", 11 to 20)).mkString(" "))),
      (4L, 40L, 0L, md5s(toks("d", 1 to 40).mkString(" "))),
      // doc 5: the only duplicated gram is start 51 (= gram at start 1);
      // boundary-spanning grams are unique -> positions 51..100 removed.
      (5L, 100L, 50L, md5s(toks("x", 1 to 50).mkString(" ")))))
  }

  test("dedupSubstring: first-seen-wins is order-dependent on doc_id") {
    // Same corpus, swapped ids: the KEEPER flips to the new lower id.
    val a = (1 to 55).map(i => s"w$i").mkString(" ")
    val docs = Seq((7L, a), (3L, a)).toDF("doc_id", "text")
    val got = Dedup.dedupSubstring(docs)
      .as[(Long, Long, Long, String)].collect().toList.sortBy(_._1)
    assert(got.map(r => (r._1, r._3)) == List((3L, 0L), (7L, 55L)))
  }

  test("boilerplateRemove: shared segments drop, unique text survives intact") {
    // Segments are 5 tokens: "b1..b5" is the boilerplate segment shared by
    // docs 1 and 2; each doc also carries a unique 5-token segment plus a
    // short unique tail (tail segments are < 5 tokens but still distinct).
    val boiler = (1 to 5).map(i => s"b$i").mkString(" ")
    val docs = Seq(
      (1L, s"$boiler u1 u2 u3 u4 u5 tail1"),
      (2L, s"$boiler v1 v2 v3 v4 v5"),
      (3L, "w1 w2 w3 w4 w5 w6 w7")
    ).toDF("doc_id", "text")
    val got = Corpus.boilerplateRemove(docs)
      .as[(Long, Long, Long, Double, String)].collect().toList
    assert(got == List(
      (1L, 3L, 2L, 0.333333, "u1 u2 u3 u4 u5 tail1"),
      (2L, 2L, 1L, 0.5, "v1 v2 v3 v4 v5"),
      (3L, 2L, 2L, 0.0, "w1 w2 w3 w4 w5 w6 w7")))
  }

  test("boilerplateRemove: fully-boilerplate doc keeps empty text, not NULL") {
    val seg = (1 to 5).map(i => s"x$i").mkString(" ")
    val docs = Seq((1L, seg), (2L, seg)).toDF("doc_id", "text")
    val got = Corpus.boilerplateRemove(docs)
      .as[(Long, Long, Long, Double, String)].collect().toList
    assert(got == List((1L, 1L, 0L, 1.0, ""), (2L, 1L, 0L, 1.0, "")))
  }

  test("sourceDivergence: hand-computed two-source KL, non-negative, asymmetric") {
    // src a: "x x y" (n=3), src b: "x z" (n=2), shared vocab {x,y,z}=3
    val docs = Seq(("a", "x x y"), ("b", "x z")).toDF("source", "text")
    def u(ca: Long, na: Long, cb: Long, nb: Long, v: Long): Long =
      math.rint((ca + 1).toDouble / (na + v) *
        (math.log((ca + 1).toDouble * (nb + v)) -
         math.log((cb + 1).toDouble * (na + v))) * 1e9).toLong
    val v = 3L
    val klAB = (u(2, 3, 1, 2, v) + u(1, 3, 0, 2, v)
                + u(0, 3, 1, 2, v)).toDouble / 1e9
    val klBA = (u(1, 2, 2, 3, v) + u(0, 2, 1, 3, v)
                + u(1, 2, 0, 3, v)).toDouble / 1e9
    val got = Corpus.sourceDivergence(docs)
      .as[(String, String, Long, Double)].collect().toList
    assert(got == List(("a", "b", 3L, klAB), ("b", "a", 3L, klBA)))
    // Gibbs: KL over true (smoothed) distributions is non-negative,
    // and KL is asymmetric on this corpus.
    assert(klAB >= 0 && klBA >= 0 && klAB != klBA)
  }

  test("bigramLogprob: hand-computed interpolated model is exact") {
    // corpus: "a b a b" + "b a c"
    // unigrams: a=3 b=3 c=1 -> N=7, V=3, N+V=10
    // bigrams: (a,b)=2 (b,a)=2 (a,c)=1; left contexts: a=3, b=2
    val docs = Seq((1L, "a b a b"), (2L, "b a c")).toDF("doc_id", "text")
    // u(prev,cur) = round((ln(4*c_bg*10 + c_left*(c_uni+1))
    //                      - ln(5*c_left*10)) * 1e6)
    def u(cBg: Long, cLeft: Long, cUni: Long): Long =
      math.rint((math.log(4.0 * cBg * 10 + cLeft * (cUni + 1.0))
                 - math.log(5.0 * cLeft * 10)) * 1e6).toLong
    val uAB = u(2, 3, 3) // ln(92) - ln(150)
    val uBA = u(2, 2, 3) // ln(88) - ln(100)
    val uAC = u(1, 3, 1) // ln(46) - ln(150)
    // Unrounded, like the operator: identical integer sums -> identical
    // IEEE divisions (a cosmetic 6-dp round diverges at half boundaries).
    def mean(sumU: Long, n: Long): Double = sumU.toDouble / 1e6 / n
    val got = Corpus.bigramLogprob(docs)
      .as[(Long, Long, Double)].collect().toList
    assert(got == List(
      (1L, 3L, mean(2 * uAB + uBA, 3)),   // a b, b a, a b
      (2L, 2L, mean(uBA + uAC, 2))))      // b a, a c
    // context sensitivity: common words in an unseen order score lower
    // than the same words in their corpus-frequent order.
    assert(mean(2 * uAB + uBA, 3) > mean(uBA + uAC, 2),
           "the doc made of frequent bigrams must outscore the rarer one")
  }

  test("bigramLogprob: single-token doc gets 0 bigrams, not a null score") {
    val docs = Seq((1L, "x"), (2L, "x y")).toDF("doc_id", "text")
    val got = Corpus.bigramLogprob(docs)
      .as[(Long, Long, Double)].collect().toList
    assert(got.head == ((1L, 0L, 0.0)))
    assert(got(1)._2 == 1L)
  }

  test("thresholdSweep: PR-curve invariants over the real corpus") {
    val rows = TextOps.qThresholdSweep(spark, sf)
      .as[(Double, Long, Long, Double, Double)].collect().toList
    assert(rows.length == TextOps.SweepCuts)
    assert(rows.map(_._1) ==
           (0 until TextOps.SweepCuts).map(_.toDouble / TextOps.SweepCuts),
           "cut grid is k/20")
    val nDocs = Tables.documents(spark, sf).count()
    // t = 0 admits everything (the rational sigmoid's range is (0, 1)).
    assert(rows.head._2 == nDocs && rows.head._5 == 1.0)
    // Monotone: raising the cutoff never admits more docs or more TPs.
    assert(rows.map(_._2) == rows.map(_._2).sorted.reverse)
    assert(rows.map(_._3) == rows.map(_._3).sorted.reverse)
    // Exact ratio arithmetic: prec * n_pred == tp, rec * n_pos == tp.
    val nPos = rows.head._3 // tp at t=0 counts every positive
    rows.foreach { case (_, nPred, tp, prec, rec) =>
      assert(tp <= nPred)
      if (nPred > 0) assert(prec == tp.toDouble / nPred)
      assert(rec == (if (nPos == 0) 1.0 else tp.toDouble / nPos))
    }
  }

  test("unigramLogprob: hand-computed corpus model is exact") {
    // corpus: "a a b" + "a c" -> counts a=3, b=1, c=1, N=5
    val docs = Seq((1L, "a a b"), (2L, "a c")).toDF("doc_id", "text")
    val got = Corpus.unigramLogprob(docs)
      .as[(Long, Long, Double)].collect()
      .map { case (id, n, s) => id -> ((n, s)) }.toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    // per-token ln snapped to micro-units before summing (order-free)
    def u(x: Double) = math.rint(math.log(x) * 1e6)
    val n = math.log(5.0)
    assert(got(1L) == ((3L, r6((2 * u(3.0) + u(1.0)) / 1e6 / 3.0 - n))))
    assert(got(2L) == ((2L, r6((u(3.0) + u(1.0)) / 1e6 / 2.0 - n))))
  }

  test("dsirScore: hand-computed importance log-ratios, target slice wins") {
    // target (en): "alpha alpha", "beta"; raw adds de "beta beta"
    // raw counts: alpha=2, beta=3; target: alpha=2, beta=1; V=2
    val docs = Seq((1L, "en", "alpha alpha"), (2L, "de", "beta beta"),
                   (3L, "en", "beta")).toDF("doc_id", "lang", "text")
    val got = Corpus.dsirScore(docs)
      .as[(Long, Long, Double, Long)].collect()
      .map { case (id, n, s, f) => id -> ((n, s, f)) }.toMap
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def u(x: Double) = math.rint(math.log(x) * 1e6)
    val shift = -math.log(3.0 + 2.0) + math.log(5.0 + 2.0)
    val vAlpha = u(3.0) - u(3.0) // ln(cnt_tgt+1) - ln(cnt_raw+1)
    val vBeta = u(2.0) - u(4.0)
    assert(got(1L) == ((2L, r6(2 * vAlpha / 1e6 / 2.0 + shift), 1L)))
    assert(got(2L) == ((2L, r6(2 * vBeta / 1e6 / 2.0 + shift), 1L)))
    assert(got(3L) == ((1L, r6(vBeta / 1e6 + shift), 1L)))
    assert(got(1L)._2 > got(2L)._2, "target-aligned doc must outscore")
    assert(got(2L)._2 == got(3L)._2, "same token mix, same mean score")
  }

  test("q_dsir_score: exactly K selected, selected floor >= unselected ceiling") {
    val out = Corpus.qDsirScore(spark, sf)
      .as[(Long, Long, Double, Long)].collect()
    assert(out.length == 500 && out.forall(r => r._4 == 0L || r._4 == 1L))
    assert(out.count(_._4 == 1L) == Corpus.DsirSelectK)
    val selMin = out.filter(_._4 == 1L).map(_._3).min
    val unselMax = out.filter(_._4 == 0L).map(_._3).max
    assert(selMin >= unselMax - 1e-6,
      s"selection not a top-K cut: $selMin < $unselMax")
  }

  test("qualityClassifier: separable crafted corpus is fully learned") {
    // Balanced classes with disjoint vocabularies: the en docs' buckets
    // get positive weights, the others negative, bias stays ~0 — after
    // two steps every doc lands on the right side of 0.5.
    import graft.ext.TextOps
    val docs = (0 until 6).map(i => (i.toLong, "en", "good great solid")) ++
               (6 until 12).map(i => (i.toLong, "de", "bad awful poor"))
    val got = TextOps.qualityClassifier(
        docs.toDF("doc_id", "lang", "text"))
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(got.length == 12)
    assert(got.forall(_._5 == 1L), s"all docs should classify correctly")
    val en = got.filter(_._2 == 1L).map(_._3)
    val de = got.filter(_._2 == 0L).map(_._3)
    assert(en.min > 0.5 && de.max < 0.5)
  }

  test("q_quality_classifier: real corpus learns the right DIRECTION") {
    // The synthetic corpus shares an English-ish vocabulary across langs
    // (see qLangId's scaladoc), so hashed-bucket separation is small —
    // but two gradient steps must still move target-slice scores ABOVE
    // the rest on average. (The crafted-corpus test above shows full
    // separation when vocabularies actually differ.)
    import graft.ext.TextOps
    val got = TextOps.qQualityClassifier(spark, sf)
      .as[(Long, Long, Double, Long, Long)].collect()
    assert(got.length == 500)
    val pos = got.filter(_._2 == 1L).map(_._3)
    val neg = got.filter(_._2 == 0L).map(_._3)
    assert(pos.sum / pos.length > neg.sum / neg.length,
      "target-slice mean score must exceed the rest after training")
  }

  test("q_bm25_mlt: structural bounds and rank monotonicity") {
    val out = Corpus.qBm25Mlt(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._1 < Corpus.Bm25NumQueries), "qid bound")
    assert(out.forall(r => r._3 != r._1), "self never retrieved")
    assert(out.forall(r => r._4 >= 1 && r._4 <= Corpus.Bm25QueryTerms),
      "matches bounded by query terms")
    out.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length <= Corpus.Bm25TopK)
      val byRank = g.sortBy(_._2).map(_._5)
      assert(byRank.zip(byRank.tail).forall { case (x, y) => x >= y },
        "bm25 must be non-increasing in rank")
    }
  }

  test("paragraphDedup: first occurrence survives, later copies drop") {
    val shared = (1 to 5).map(i => s"s$i").mkString(" ")
    val rep = (1 to 5).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, s"$shared u1 u2 u3 u4 u5"), // owns the first copy of `shared`
      (2L, s"$shared v1 v2 v3 v4 v5"), // later copy -> dropped
      (3L, s"$rep $rep")               // in-doc repeat -> second drops
    ).toDF("doc_id", "text")
    val got = Corpus.paragraphDedup(docs)
      .as[(Long, Long, Long, Double, String)].collect().toList
    assert(got == List(
      (1L, 2L, 2L, 0.0, s"$shared u1 u2 u3 u4 u5"),
      (2L, 2L, 1L, 0.5, "v1 v2 v3 v4 v5"),
      (3L, 2L, 1L, 0.5, rep)))
  }

  test("textrank: hand-computed integer PageRank on a star graph") {
    // "aa bb aa cc aa dd" -> edges (aa,bb) w2, (aa,cc) w2, (aa,dd) w1;
    // degrees aa=5, bb=2, cc=2, dd=1. Three damped integer iterations
    // computed by hand (micro-units, div = exact integer division).
    val docs = Seq((1L, "aa bb aa cc aa dd")).toDF("doc_id", "text")
    val got = Corpus.textrank(docs)
      .as[(Long, String, Long, Long)].collect().toList
    assert(got == List(
      (1L, "aa", 5L, 2483250L),
      (2L, "bb", 2L, 576700L),   // tie with cc resolved by term asc
      (3L, "cc", 2L, 576700L),
      (4L, "dd", 1L, 363350L)))
  }

  test("q_textrank: exactly TopK rows, ranks descending, hub outranks leaf") {
    val out = Corpus.qTextrank(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    assert(out.length == Corpus.TrTopK)
    val ranks = out.sortBy(_._1).map(_._4)
    assert(ranks.zip(ranks.tail).forall { case (x, y) => x >= y })
  }

  test("q_dup_span_mass: span totals match the corpus token arithmetic") {
    val rows = Dedup.qDupSpanMass(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    val docs = Tables.documents(spark, sf)
    // every doc contributes max(len - 7, 1) spans
    val expectSpans = docs
      .agg(sum(greatest(size(split(col("text"), " ")) - 7, lit(1))
                 .cast("bigint"))).as[Long].head()
    assert(rows.map(_._2).sum == expectSpans)
    rows.foreach { case (src, n, dup, hit, ratio) =>
      assert(dup <= n && hit >= 0, s"$src: dup spans exceed span count")
      assert(math.abs(ratio - dup.toDouble / n) == 0.0)
    }
  }

  test("winnowPairs: a shared K+W-1 token run guarantees a shared fingerprint") {
    // Docs 1 and 2 embed the same 7-token run (= WinnowK + WinnowW - 1,
    // the winnowing guarantee length) inside otherwise-disjoint text;
    // doc 3 shares nothing. The guarantee: (1,2) must surface with
    // n_shared >= 1; no pair may involve doc 3.
    val shared = "alpha beta gamma delta epsilon zeta eta"
    val docs = Seq(
      (1L, s"red blue green $shared yellow purple orange pink brown black"),
      (2L, s"one two three four $shared five six seven eight nine ten"),
      (3L, "completely different words with no overlap at all here friend " +
           "more filler tokens keep the document long enough for windows"))
      .toDF("doc_id", "text")
    val pairs = Dedup.winnowPairs(docs)
      .as[(Long, Long, Long)].collect()
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 >= 1L),
           s"planted shared run must yield a shared fingerprint, got ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L),
           "doc 3 shares no content and must not pair")
  }

  test("dedupEditdist: patched twin pairs with exact distance, stranger excluded") {
    // Docs 1 and 2: identical 30-token text except one token patched
    // ("alpha" -> "alphq", distance 1). Same lang, same n_chars bucket,
    // shared 16-char normalized prefix. Doc 3 shares the block key
    // prefix rules but exceeds MaxEditDist everywhere after its prefix.
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val twin = base.replace("tok20", "tokQQ").toLowerCase
    val far = base.take(16) + ("z" * (base.length - 16))
    val docs = Seq(
      (1L, base, "en", base.length.toLong),
      (2L, twin, "en", twin.length.toLong),
      (3L, far, "en", far.length.toLong))
      .toDF("doc_id", "text", "lang", "n_chars")
    val got = Dedup.dedupEditdist(docs).as[(Long, Long, Long)].collect()
    // "tok20" -> "tokqq": 2 substituted chars at one site.
    assert(got.toSeq == Seq((1L, 2L, 2L)),
           s"expected exactly the patched twin at distance 2, got ${got.toSeq}")
  }

  test("containmentPairs: full quote scores 1.0 despite low jaccard") {
    // Doc 1 is wholly quoted inside doc 2 (every 5-gram of doc 1 appears
    // in doc 2), but doc 2 is 4x longer, so jaccard is far below the
    // containment. Doc 3 is disjoint.
    val quote = (1 to 12).map(i => s"q$i").mkString(" ")
    val host = (1 to 30).map(i => s"h$i").mkString(" ") + " " + quote +
      " " + (31 to 60).map(i => s"h$i").mkString(" ")
    val other = (1 to 40).map(i => s"z$i").mkString(" ")
    val docs = Seq(
      (1L, quote, "en"), (2L, host, "en"), (3L, other, "en"))
      .toDF("doc_id", "text", "lang")
    val got = Dedup.containmentPairs(docs)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == 1 && got.head._1 == 1L && got.head._2 == 2L,
           s"only the quote pair may surface, got ${got.toSeq}")
    // All 8 of doc 1's 5-grams (12 tokens) appear in doc 2.
    assert(got.head._3 == 8L && got.head._4 == 1.0,
           s"full containment expected, got ${got.head}")
  }

  test("readability: hand-computed flesch components are exact") {
    // 6 alpha words, 2 sentence-punctuation runs, 6 single-vowel-group
    // syllables: flesch_milli = 206835 - (1015*6)/2 - (84600*6)/6.
    val docs = Seq(
      (1L, "the cat sat . a dog ran !"),
      (2L, "")) // zero alpha words -> filtered out
      .toDF("doc_id", "text")
    val got = TextOps.readability(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 6L, 2L, 6L, 206835L - 3045L - 84600L)),
           s"got ${got.toSeq}")
  }

  test("q_readability: one row per alpha-bearing doc, syllables >= words") {
    val rows = TextOps.qReadability(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val expect = Tables.documents(spark, sf)
      .filter(size(expr("filter(split(text, ' '), w -> w rlike '^[a-z]+$')")) >= 1)
      .count()
    assert(rows.length == expect)
    rows.foreach { case (id, w, s, y, _) =>
      assert(w >= 1 && s >= 1 && y >= w,
             s"doc $id: every alpha word carries >= 1 syllable")
    }
  }

  // CDC dedup: the spec derives the boundary set from the operator's own
  // predicate (md5 is fixed, so this is deterministic), then pins the
  // content-defined property: a PREFIX insertion changes only the chunk
  // containing the edit — every chunk after the next boundary dedups
  // against the original.
  test("dedupCdc: exact copy fully dedups; prefix insertion costs one chunk") {
    val cand = (0 until 200).map(i => s"w$i")
    val isB = cand.toDF("t")
      .select(col("t"),
              (ops.Ops.md5Bits60(concat(col("t"), lit(":cdc")))
                 % Dedup.CdcMod === 0L).as("b"))
      .as[(String, Boolean)].collect().toMap
    val bTok = cand.find(isB(_)).get
    val plain = cand.filterNot(isB(_))
    // doc 1: [p0..p4 B][p5..p9] — two chunks (B ends its chunk)
    val d1 = (plain.take(5) :+ bTok) ++ plain.slice(5, 10)
    val d3 = plain(10) +: d1 // prefix insertion: chunk 1 differs, chunk 2 dedups
    val docs = Seq((1L, d1.mkString(" ")), (2L, d1.mkString(" ")),
                   (3L, d3.mkString(" "))).toDF("doc_id", "text")
    val got = Dedup.dedupCdc(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L, 2L, 0L),   // first copy stores both chunks
                      (2L, 2L, 0L, 11L),  // exact copy: all 11 tokens dup
                      (3L, 2L, 1L, 5L)),  // only the edited chunk re-stores
           s"got $got")
  }

  test("ngramNovelty: copy scores 0, fresh doc 1, half-overlap 5/6") {
    val t = (1 to 10).map(i => s"a$i")
    val docs = Seq(
      (1L, t.mkString(" ")),                                // all novel
      (2L, t.mkString(" ")),                                // exact copy
      (3L, (t.drop(5) ++ (1 to 5).map(i => s"b$i")).mkString(" ")),
      (4L, "c1 c2 c3")                                      // short: 1 gram
    ).toDF("doc_id", "text")
    val got = Dedup.ngramNovelty(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq.sortBy(_._1)
    // doc 3's first 5-gram IS doc 1's last 5-gram; the other 5 carry a
    // b-token each. A doc shorter than K contributes its whole text.
    assert(got == Seq((1L, 6L, 6L, 1.0), (2L, 6L, 0L, 0.0),
                      (3L, 6L, 5L, 0.833333), (4L, 1L, 1L, 1.0)),
           s"got $got")
  }

  test("kcenterCoreset: farthest-first picks the known sequence on a line") {
    def v(x: Float): Array[Float] = Array.fill(64)(0.0f).updated(0, x)
    val emb = Seq((0L, v(0.0f)), (1L, v(10.0f)), (2L, v(1.0f)),
                  (3L, v(5.0f)), (4L, v(9.0f)))
      .toDF("vec_id", "embedding")
    val got = ext.Similarity.kcenterCoreset(spark, emb)
      .as[(Long, Long, Long)].collect().toSeq
    // seed 0 (min id), then x=10 (d²=(10·10⁶)²), then the midpoint x=5,
    // then the d²=1e12 tie between x=1 and x=9 broken by vec_id; with
    // only 5 points, rounds 6-8 select nothing.
    assert(got == Seq((1L, 0L, 0L), (2L, 1L, 100000000000000L),
                      (3L, 3L, 25000000000000L), (4L, 2L, 1000000000000L),
                      (5L, 4L, 1000000000000L)),
           s"got $got")
  }

  test("simhashHamming: banded retrieval == brute force at the threshold") {
    // 12 docs over drifting token sets + one exact-copy pair. The banded
    // operator must return EXACTLY the brute-force Hamming<=HamT pairs
    // (pigeonhole: <=3 differing bits can't touch all 4 bands), with the
    // copy pair at distance 0.
    val docs = ((1 to 11).map { i =>
      (i.toLong, (0 until 20).map(j => s"tok${i / 3}_${(i + j) % 25}")
                   .mkString(" "))
    } :+ (12L, (0 until 20).map(j => s"tok0_${(1 + j) % 25}")
                 .mkString(" "))) // doc 12 == doc 1's token stream
      .toDF("doc_id", "text")
    val sigs = Dedup.simhashSig(docs)
      .as[(Long, Long)].collect().toMap
    val brute = (for {
      a <- sigs.keys; b <- sigs.keys if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      if h <= Dedup.HamT
    } yield (a, b, h.toLong)).toSeq.sorted
    val got = Dedup.simhashHamming(docs)
      .as[(Long, Long, Long)].collect().toSeq.sorted
    assert(got == brute, s"banded $got vs brute $brute")
    assert(got.contains((1L, 12L, 0L)),
           "an exact copy must surface at Hamming distance 0")
  }

  test("sourceCaps: greedy prefix admission matches a local replay") {
    val docs = (1 to 12).map { i =>
      (i.toLong, s"s${i % 2}", Seq.fill(1500)(s"w$i").mkString(" "))
    }.toDF("doc_id", "source", "text")
    val prio = docs
      .select(col("doc_id"), col("source"),
              ops.Ops.md5Bits60(concat(col("doc_id").cast("string"),
                                       lit(":cap"))).as("h"))
      .as[(Long, String, Long)].collect()
    val expect = prio.groupBy(_._2).map { case (src, rows) =>
      val order = rows.sortBy(r => (r._3, r._1))
      var cum = 0L; var kd = 0L; var kt = 0L
      order.foreach { _ =>
        cum += 1500L
        if (cum <= Pipeline.CapTokens) { kd += 1; kt += 1500L }
      }
      (src, rows.length.toLong, rows.length * 1500L, kd, kt,
       BigDecimal(kt.toDouble / Pipeline.CapTokens)
         .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }.toSeq.sortBy(_._1)
    val got = Pipeline.sourceCaps(docs)
      .as[(String, Long, Long, Long, Long, Double)].collect().toSeq
    // 6 docs x 1500 tokens per source, cap 5000 -> exactly 3 admitted.
    assert(got == expect, s"got $got vs $expect")
    assert(got.forall(_._5 <= Pipeline.CapTokens))
    assert(got.forall(_._4 == 3L))
  }

  test("tokenEntropy: uniform = ln n, constant = 0, half-half = ln 2") {
    val docs = Seq((1L, "a b c d"), (2L, "x x x x"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    val got = TextOps.tokenEntropy(docs)
      .as[(Long, Long, Long, Double)].collect().toSeq
    // Micro-unit arithmetic: round(ln 4 * 1e6) = 1386294,
    // round(ln 2 * 1e6) = 693147 — the assertions are the exact
    // integer-snapped values, not the reals.
    assert(got == Seq((1L, 4L, 4L, 1.386294), (2L, 4L, 1L, 0.0),
                      (3L, 4L, 2L, 0.693147)), s"got $got")
  }

  test("giniConcentration: equal sizes score 0, hand-computed skew") {
    // sA: four 1-token docs -> G = 0 exactly.
    // sB: sizes [1,1,1,5]: sum=8, srx = 1+2+3+20 = 26,
    //     G = (52 - 5*8)/(4*8) = 12/32 = 0.375.
    val docs = Seq(
      (1L, "sA", "a"), (2L, "sA", "b"), (3L, "sA", "c"), (4L, "sA", "d"),
      (5L, "sB", "a"), (6L, "sB", "b"), (7L, "sB", "c"),
      (8L, "sB", "p q r s t")
    ).toDF("doc_id", "source", "text")
    val got = Pipeline.giniConcentration(docs)
      .as[(String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("sA", 4L, 4L, 0.0), ("sB", 4L, 8L, 0.375)),
           s"got $got")
  }

  test("lexicalDiversity: hand-computed TTR, hapax rate, Yule's K") {
    val docs = Seq((1L, "a b c d"), (2L, "x x x x"), (3L, "a a b b"))
      .toDF("doc_id", "text")
    val got = TextOps.lexicalDiversity(docs)
      .as[(Long, Long, Long, Long, Double, Double, Double)].collect().toSeq
    // doc1: all hapax -> TTR 1, K 0.  doc2: one type used 4x ->
    // s2=16, K = 1e4*(16-4)/16 = 7500.  doc3: two types 2x ->
    // s2=8, K = 1e4*(8-4)/16 = 2500, hapax rate 0.
    assert(got == Seq((1L, 4L, 4L, 4L, 1.0, 1.0, 0.0),
                      (2L, 4L, 1L, 0L, 0.25, 0.0, 7500.0),
                      (3L, 4L, 2L, 0L, 0.5, 0.0, 2500.0)), s"got $got")
  }

  test("ksTest: hand-computed two-sample D, identical sources score 0") {
    // s1 lengths {2,2,4}; s2 lengths {4,6}; s3 == s1's lengths.
    // F1(2)=2/3 F1(4)=1; F2(2)=0 F2(4)=1/2 F2(6)=1 -> D(1,2) = 2/3.
    val docs = Seq(
      (1L, "s1", "a b"), (2L, "s1", "c d"), (3L, "s1", "e f g h"),
      (4L, "s2", "p q r s"), (5L, "s2", "u v w x y z"),
      (6L, "s3", "h i"), (7L, "s3", "j k"), (8L, "s3", "l m n o")
    ).toDF("doc_id", "source", "text")
    val got = Corpus.ksTest(docs)
      .as[(String, String, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("s1", "s2", 3L, 2L, 2.0 / 3.0),
                      ("s1", "s3", 3L, 3L, 0.0),
                      ("s2", "s3", 2L, 3L, 2.0 / 3.0)), s"got $got")
  }

  test("triangleCount: identical-doc clique closes, lone pair does not") {
    // Docs 1-3 share a text (Hamming-0 clique = 1 triangle); docs 4-5
    // share a different text (one edge, no wedge); doc 6 is isolated.
    // Degrees 2,2,2,1,1 -> wedges 3, triangles 1, transitivity 1.0.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine ten"
    val docs = Seq(
      (1L, a), (2L, a), (3L, a), (4L, b), (5L, b),
      (6L, "completely different standalone text body here")
    ).toDF("doc_id", "text")
    val got = Dedup.triangleCount(docs)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq((5L, 4L, 3L, 1L, 1.0)), s"got $got")
  }

  test("pagerank: regular components sit at the 1e6 fixed point") {
    // Same crafted graph as the triangle test: a K3 clique (docs 1-3)
    // and a lone pair (4-5). Both are REGULAR graphs, so the uniform
    // rank is the exact fixed point of the integer iteration:
    // each node receives deg · (1e6 div deg) = 1e6 and
    // 150000 + (85 · 1e6) div 100 = 1e6 again — pinning the damping
    // arithmetic and the (rank desc, doc_id asc) tie order.
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    val b = "one two three four five six seven eight nine ten"
    val docs = Seq((1L, a), (2L, a), (3L, a), (4L, b), (5L, b))
      .toDF("doc_id", "text")
    val got = Dedup.pagerank(docs)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 2L, 1000000L), (2L, 2L, 2L, 1000000L),
      (3L, 3L, 2L, 1000000L), (4L, 4L, 1L, 1000000L),
      (5L, 5L, 1L, 1000000L)), s"got $got")
  }

  test("pmi: hand-computed collocation above the support floor") {
    // "new york" x5 then 6 filler singletons: 16 tokens, 15 bigrams.
    // Only (new, york) clears c12 >= 5: PMI = ln(5*15/(5*5)) = ln 3,
    // micro-snapped to 1.098612.
    val docs = Seq((1L, ("new york " * 5) + "a b c d e f"))
      .toDF("doc_id", "text")
    val got = Corpus.pmi(docs)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("new", "york", 5L, 5L, 5L, 1.098612)), s"got $got")
  }

  test("jsd: identical sources score exactly 0, disjoint ~ ln 2") {
    val docs = Seq(
      (1L, "sA", "a a b"), (2L, "sB", "c c d"), (3L, "sC", "a a b")
    ).toDF("doc_id", "source", "text")
    val got = Corpus.jsd(docs)
      .as[(String, String, Long, Double)].collect().toSeq
    val byPair = got.map(r => ((r._1, r._2), r._4)).toMap
    // Clone pair: p = q at every term -> ln(p/m) = ln 1 = 0 exactly,
    // so the snapped sum is exactly 0. Disjoint pairs: JSD = ln 2 up
    // to nano-snapping of the 4 per-term contributions.
    assert(byPair(("sA", "sC")) == 0.0, s"got $got")
    assert(math.abs(byPair(("sA", "sB")) - math.log(2.0)) < 1e-6)
    assert(math.abs(byPair(("sB", "sC")) - math.log(2.0)) < 1e-6)
    // Union-support cell count: disjoint pairs see all 4 terms.
    assert(got.filter(r => r._1 == "sA" && r._2 == "sB").head._3 == 4L)
  }

  test("logOdds: exclusive terms top their source, shared terms score 0") {
    val docs = Seq(
      (1L, "sA", "apple apple apple common common"),
      (2L, "sB", "banana banana banana common common")
    ).toDF("doc_id", "source", "text")
    val got = Corpus.logOdds(docs)
      .as[(String, Long, String, Long, Double)].collect().toSeq
    val bySrc = got.groupBy(_._1)
    // Each source's characteristic term ranks first with positive z;
    // the perfectly-shared term has an exactly-zero numerator, so its
    // snapped z is exactly 0.0; the symmetric construction forces
    // both exclusive terms to the same snapped z.
    assert(bySrc("sA").head._3 == "apple" && bySrc("sB").head._3 == "banana")
    assert(bySrc("sA").head._5 > 1.0)
    assert(bySrc("sA").head._5 == bySrc("sB").head._5)
    assert(got.filter(_._3 == "common").forall(_._5 == 0.0))
    // Only observed (source, term) cells are scored: 2 rows per source.
    assert(got.length == 4 && got.map(_._2).toSet == Set(1L, 2L))
  }

  test("mannWhitney: hand-computed U with ties, disjoint supports hit 1") {
    // AUC = P(a < b) + half-tie credit. sA lengths {1,2}, sB {2,3}:
    // pairs (1<2) (1<3) (2<3) plus the (2,2) tie -> U = 3.5,
    // 2U = 7, AUC = 7/8. sC {4,5} sits wholly above sA and sB ->
    // AUC = 1 exactly for both pairs.
    val docs = Seq(
      (1L, "sA", "a"), (2L, "sA", "b c"),
      (3L, "sB", "d e"), (4L, "sB", "f g h"),
      (5L, "sC", "i j k l"), (6L, "sC", "m n o p q")
    ).toDF("doc_id", "source", "text")
    val got = Corpus.mannWhitney(docs)
      .as[(String, String, Long, Long, Long, Double)].collect().toSeq
    assert(got == Seq(("sA", "sB", 2L, 2L, 7L, 0.875),
                      ("sA", "sC", 2L, 2L, 8L, 1.0),
                      ("sB", "sC", 2L, 2L, 8L, 1.0)), s"got $got")
  }

  test("q_kcenter_coreset: ranks distinct, coverage radius non-increasing") {
    val rows = ext.Similarity.qKcenterCoreset(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.length == ext.Similarity.KcK)
    assert(rows.map(_._2).distinct.length == rows.length,
           "selected vectors must be distinct")
    val radii = rows.drop(1).map(_._3)
    assert(radii.zip(radii.drop(1)).forall { case (a, b) => a >= b },
           s"greedy coverage radius must be non-increasing: ${radii.toSeq}")
  }

  test("curriculumOrder: crafted sources interleave round-robin with unique positions") {
    // 3 sources of sizes 3/2/1: rank-1 docs occupy positions 0..2, the
    // rank-2 docs positions 3..4 (gap where source c exhausted), rank-3
    // doc position 6 — order total, positions unique, sources maximally
    // interleaved at every prefix.
    val docs = Seq(
      ("a", 1L), ("a", 2L), ("a", 3L),
      ("b", 4L), ("b", 5L),
      ("c", 6L)
    ).toDF("source", "doc_id")
    val out = Pipeline.curriculumOrder(docs)
      .select($"pos", $"source", $"doc_id").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(out.length === 6)
    assert(out.map(_._1).distinct.length === 6)
    // first round: one doc from each source, in source_idx order a,b,c
    assert(out.take(3).map(_._2).toSeq === Seq("a", "b", "c"))
    // second round: a then b (c exhausted); final doc is a's rank 3
    assert(out.slice(3, 5).map(_._2).toSeq === Seq("a", "b"))
    assert(out.last._2 === "a")
    // position formula: pos = (rn-1)*3 + idx-1 for every emitted row
    for ((pos, src, _) <- out) {
      val idx = Map("a" -> 1L, "b" -> 2L, "c" -> 3L)(src)
      assert((pos - (idx - 1)) % 3 === 0)
    }
  }

  test("curriculumOrder: every source present in the real corpus prefix") {
    // CurriculumK = 40 = 2 full rounds over the 20 sources: the prefix
    // must contain every source exactly twice — the interleave claim.
    val out = Pipeline.qCurriculumOrder(spark, sf)
      .select($"source").as[String].collect()
    assert(out.length === Pipeline.CurriculumK)
    val counts = out.groupBy(identity).view.mapValues(_.length)
    assert(counts.values.forall(_ == Pipeline.CurriculumK / counts.size),
           s"uneven interleave: ${counts.toMap}")
  }
}
