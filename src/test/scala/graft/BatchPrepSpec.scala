package graft

import graft.ext.{Corpus, Dedup, Similarity}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-11 batch-prep operators that the
  * DuckDB hash-compare can't express: independent Scala recomputation of
  * the seeded-shuffle permutation fingerprint, both padding-waste
  * batching strategies, and the T5 span draw + merge algebra; the
  * cross-source cluster weighting of soft dedup on a crafted corpus; and
  * the re-rank-depth monotonicity theorem with q_pq_recall as the
  * curve's closed end.
  */
class BatchPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  private def bits60(s: String): BigInt = {
    val md = java.security.MessageDigest.getInstance("MD5")
    BigInt(md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15), 16)
  }

  test("softDedup: cross-source cluster weighting on a crafted corpus") {
    // "x x" appears 3x ACROSS sources (csize 3 everywhere); "y" once.
    val docs = Seq(("A", "x x"), ("A", "x x"), ("A", "y"), ("B", "x x"))
      .toDF("source", "text")
    val got = Dedup.softDedup(docs)
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got("A") == (("A", 3L, 5L, 1.666666, 2.333332)))
    assert(got("B") == (("B", 1L, 2L, 0.333333, 0.666666)))
  }

  test("padWaste: both strategies recomputed independently per shard") {
    // Lengths chosen so batches are heterogeneous; PadBatch = 32 means
    // each shard holds partial batches too.
    val docs = (1 to 90).map { i =>
      (i.toLong, (1 to (i * 7 % 23 + 1)).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val lens = (1 to 90).map(i => i.toLong -> (i * 7 % 23 + 1).toLong).toMap
    val shardOf = (id: Long) =>
      (bits60(id.toString) % Corpus.PadShards).toLong
    def waste(ordered: Seq[Long]): (Long, Long) = {
      val batches = ordered.map(lens).grouped(Corpus.PadBatch).toSeq
      (batches.size.toLong,
       batches.map(b => b.size * b.max - b.sum).sum)
    }
    val expect = (1 to 90).map(_.toLong).groupBy(shardOf).flatMap {
      case (sh, ids) =>
        val arrival = waste(ids.sorted)
        val bySize = waste(ids.sortBy(id => (lens(id), id)))
        Seq(("arrival", sh) -> arrival, ("sorted", sh) -> bySize)
    }
    val got = Corpus.padWaste(docs)
      .select(col("strategy"), col("shard"), col("n_batches"),
              col("pad_tokens"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got == expect)
  }

  test("globalShuffle: permutation + order fingerprint recomputed") {
    val docs = (1 to 60).map { i =>
      (i.toLong, (1 to (i % 5 + 1)).map(j => s"w$j").mkString(" "))
    }.toDF("doc_id", "text")
    val P = graft.ops.Ops.HashModP
    val rows = (1 to 60).map { i =>
      val h = bits60(Corpus.ShuffleSeed + i.toString)
      (i.toLong, (i % 5 + 1).toLong, h, (h % Corpus.ShuffleShards).toLong)
    }
    val expect = rows.groupBy(_._4).map { case (sh, rs) =>
      val ordered = rs.sortBy(r => (r._3, r._1))
      val fp = ordered.zipWithIndex.map { case (r, i) =>
        (BigInt(i + 1) % P) * (r._3 % P) % P
      }.sum % P
      sh -> ((rs.size.toLong, rs.map(_._2).sum, ordered.head._1,
              fp.toLong))
    }
    val got = Corpus.globalShuffle(docs)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect)
    // order-sensitivity: permuting two positions changes the fingerprint
    // (h values are distinct, so distinct position weights differ)
    val anyShard = expect.keys.head
    val swapped = rows.filter(_._4 == anyShard).sortBy(r => (r._3, r._1))
    if (swapped.size >= 2) {
      val fpSwapped = swapped.reverse.zipWithIndex.map { case (r, i) =>
        (BigInt(i + 1) % P) * (r._3 % P) % P
      }.sum % P
      assert(fpSwapped.toLong != expect(anyShard)._4)
    }
  }

  test("spanCorrupt: independent recompute of draw, merge, fingerprint") {
    val docs = Seq((7L, (1 to 200).map(i => s"w$i").mkString(" ")),
                   (9L, "one two three"))
      .toDF("doc_id", "text")
    val expect = Map(7L -> 200, 9L -> 3).map { case (id, n) =>
      val starts = (0 until n).filter(i =>
        bits60(s"sp:$id:$i") < BigInt(Corpus.SpanThrBits))
      val covered = (0 until n).filter(p =>
        starts.exists(st => st <= p && p < st + Corpus.SpanLen))
      val nSpans = covered.count(p => !covered.contains(p - 1))
      id -> ((n.toLong, nSpans.toLong, covered.size.toLong,
              bits60(covered.mkString(",")).toLong))
    }
    val got = Corpus.spanCorrupt(docs)
      .select(col("doc_id"), col("n_toks"), col("n_spans"),
              col("n_corrupted"), col("span_sig"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(got == expect)
  }

  test("q_span_corruption: corpus-wide realized rate near T5's 15%") {
    // start prob 0.05 x span 3 => coverage ~ 1 - 0.95^3 ~ 0.143
    val rows = Corpus.qSpanCorruption(spark, sf)
      .select(col("n_toks"), col("n_corrupted"), col("n_spans"))
      .as[(Long, Long, Long)].collect()
    val rate = rows.map(_._2).sum.toDouble / rows.map(_._1).sum
    assert(rate > 0.10 && rate < 0.20, s"realized corruption rate $rate")
    rows.foreach { case (_, nc, ns) =>
      assert(ns <= nc, "every merged span covers at least one token")
    }
  }

  test("shuffle ingest stream: ledger folds to the batch shuffle, any order, idempotent, retroactive") {
    import graft.streaming.ShuffleStream
    val dir = java.nio.file.Files
      .createTempDirectory("graft_shufledger").toString + "/shufledger"
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text")
    // REVERSE-order micro-batches: positions derive from h order, not
    // arrival order, so parity must hold for any batching.
    assert(ShuffleStream.ingestBatch(docs.filter($"doc_id" >= 250), dir) > 0)
    ShuffleStream.ingestBatch(docs.filter($"doc_id" < 250), dir)
    val got = ShuffleStream.shuffleView(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val twin = Corpus.globalShuffle(docs).as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == twin, "ledger fold must equal the batch shuffle view")
    // Idempotent re-ingest: replaying the whole corpus admits nothing.
    assert(ShuffleStream.ingestBatch(docs, dir) == 0L)
    // Retroactive positions: a late arrival re-ranks its shard; the
    // folded view still equals the batch operator over the union.
    val extra = Seq((99001L, "x y z")).toDF("doc_id", "text")
    assert(ShuffleStream.ingestBatch(extra, dir) == 1L)
    val after = ShuffleStream.shuffleView(spark, dir).as[(Long, Long, Long, Long, Long)].collect().toSet
    val twin2 = Corpus.globalShuffle(docs.unionByName(extra))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(after == twin2 && after != got,
           "late arrival must re-rank, and the fold must track the batch twin")
    // Same staged-commit bucket layout as the other ledgers.
    val entries = new java.io.File(dir).listFiles().map(_.getName)
    assert(entries.nonEmpty && entries.forall(_.startsWith("bucket=")))
    // In-batch duplicates: the ledger anti-join only screens against
    // HISTORY, so a doc_id repeated within one micro-batch must be
    // collapsed before the probe or it is ledgered twice and the
    // shuffleView == globalShuffle parity breaks permanently.
    val dupBatch = Seq((99002L, "p q r"), (99002L, "p q r"))
      .toDF("doc_id", "text")
    assert(ShuffleStream.ingestBatch(dupBatch, dir) == 1L,
           "a doc_id duplicated within one micro-batch is admitted once")
    val after2 = ShuffleStream.shuffleView(spark, dir)
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    val twin3 = Corpus.globalShuffle(
        docs.unionByName(extra).unionByName(dupBatch.dropDuplicates("doc_id")))
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(after2 == twin3,
           "fold must still equal the batch twin after an in-batch-dup ingest")
    // Conflicting in-batch duplicates: same doc_id, DIFFERING text —
    // the collapse must pick a deterministic representative (min
    // n_toks; h is a pure function of doc_id), not an arbitrary row,
    // or the ledgered mass differs across retries.
    val conflict = Seq((99003L, "aa bb cc dd ee"), (99003L, "aa bb"))
      .toDF("doc_id", "text")
    assert(ShuffleStream.ingestBatch(conflict, dir) == 1L)
    val led = ShuffleStream.ledger(spark, dir)
      .filter($"doc_id" === 99003L).as[(Long, Long, Long)].collect()
    assert(led.length == 1 && led.head._2 == 2L,
           "conflicting texts collapse to the min-n_toks representative")
  }

  test("sqReconstructed: affine int8 round trip recomputed; scale-0 edge") {
    val xs = Seq(0.1f, 0.5f, -0.3f, 0.9f)
    val e = Seq((1L, xs), (2L, Seq(0.25f, 0.25f, 0.25f, 0.25f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.sqReconstructed(e)
      .as[(Long, Seq[Float])].collect().toMap
    val mn = xs.min.toDouble
    val scale = (xs.max.toDouble - mn) / Similarity.SqLevels
    val expect = xs.map(x =>
      (mn + math.floor((x.toDouble - mn) / scale) * scale).toFloat)
    assert(got(1L) == expect)
    // constant vector: scale = 0 reconstructs exactly (no NaN from 0/0)
    assert(got(2L) == Seq(0.25f, 0.25f, 0.25f, 0.25f))
    // reconstruction error bounded by one quantization step
    got(1L).zip(xs).foreach { case (r, x) =>
      assert(math.abs(r - x) <= scale + 1e-6) // + float-snap half-ULP
    }
  }

  test("q_sq_recall: int8 quantization is near-lossless at the gate") {
    val rows = Similarity.qSqRecall(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(rows.length == Similarity.NumQueries)
    // measured 1.0 for every query at both sf gates; pin a safe floor
    assert(rows.forall(_._4 >= 0.8),
           s"int8 recall collapsed: ${rows.mkString(",")}")
  }

  test("q_split_leakage: sides respect the component split") {
    val split = Corpus.qSplitHoldout(spark, sf)
      .select(col("doc_id"), col("split"))
      .as[(Long, String)].collect().toMap
    val rows = Corpus.qSplitLeakage(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (h, t, n) =>
      assert(split(h) == "holdout" && split(t) == "train" && n >= 1,
             s"leakage row ($h, $t, $n) must pair a holdout doc with a train doc")
    }
    // one row per contaminated holdout doc (the worst-contaminator cut)
    assert(rows.map(_._1).distinct.length == rows.length)
  }

  test("q_cc_profile: conserves the corpus and agrees with q_dedup_cluster") {
    val prof = Corpus.qCcProfile(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(prof.map(_._3).sum == 500L,
           "profile n_docs must conserve the corpus")
    // removable mass == what the cluster view (size > 1 components) shows
    val clusters = Corpus.qDedupCluster(spark, sf)
      .select(col("component_id"), col("component_size"))
      .as[(Long, Long)].collect().distinct
    assert(prof.map(_._4).sum == clusters.map(_._2 - 1).sum,
           "removable must equal sum(size-1) over multi-doc components")
  }

  test("purityOf: majority, tie-break, and total algebra on a crafted assignment") {
    // cell 0: labels 1x3, 2x1 -> top (1,3), purity .75
    // cell 1: tie 3x2, 4x2   -> label ASC wins: top (3,2), purity .5
    // cell 2: pure 5x4       -> purity 1.0
    val asg = (Seq.fill(3)((0L, 1L)) ++ Seq((0L, 2L)) ++
               Seq((1L, 3L), (1L, 3L), (1L, 4L), (1L, 4L)) ++
               Seq.fill(4)((2L, 5L)))
      .toDF("cell", "label")
    val got = Similarity.purityOf(asg)
      .as[(Long, Long, Long, Long, Double)].collect().toSet
    val expect = Set(
      (0L, 4L, 1L, 3L, 0.75),
      (1L, 4L, 3L, 2L, 0.5),
      (2L, 4L, 5L, 4L, 1.0),
      (-1L, 12L, -1L, 9L, 0.75))
    assert(got == expect)
  }

  test("q_cluster_purity: bounds and consistency at the gate") {
    val rows = Similarity.qClusterPurity(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    val (tot, per) = rows.partition(_._1 == -1L)
    assert(tot.length == 1 && per.nonEmpty)
    per.foreach { case (_, n, _, topN, p) =>
      assert(topN >= 1 && topN <= n && p > 0.0 && p <= 1.0)
    }
    assert(tot.head._2 == per.map(_._2).sum &&
           tot.head._4 == per.map(_._4).sum,
           "sentinel row must be the exact fold of the per-cell rows")
  }

  test("refine sweep: recall monotone in depth; closed end == q_pq_recall") {
    val curve = Similarity.qRefineSweep(spark, sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(curve.map(_._1).toSeq ==
             Similarity.RefineDepths.map(_.toLong).sorted)
    // Re-ranking BY EXACT SCORE from a superset candidate set can never
    // evict a true-top-K member: fewer than K vectors beat it globally,
    // so fewer than K can beat it in any candidate subset.
    curve.sliding(2).foreach {
      case Array(lo, hi) => assert(lo._4 <= hi._4 + 1e-9,
        s"recall must not drop with depth: $lo vs $hi")
      case _ => ()
    }
    // depth = PqShortlist IS q_pq_recall, micro-averaged
    val pq = Similarity.qPqRecall(spark, sf)
      .select(col("n_exact"), col("n_hits"))
      .as[(Long, Long)].collect()
    val last = curve.last
    assert(last._2 == pq.map(_._1).sum && last._3 == pq.map(_._2).sum)
  }
}
