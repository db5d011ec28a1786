package graft

import graft.ext.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the chunk-level dedup, the data-constrained
  * repeat-epoch allocation, and the deterministic MLM mask that the
  * DuckDB hash-compare can't express: shared-vs-within-doc-vs-unique
  * chunk classification on crafted corpora, the Muennighoff cap algebra,
  * and an independent Scala recomputation of the hash-threshold mask.
  */
class TrainPrepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  test("chunkDedup: shared, within-doc-only, and unique chunks classify") {
    // A and B are verbatim copies (80 tokens -> 3 chunks each, all
    // shared); C is unique (0 shared); D is 56 tokens with period-24
    // tokens, so its two chunks are IDENTICAL TEXT but only within D --
    // nd counts distinct docs, so nothing in D is shared.
    val text80 = (1 to 80).map(i => s"a$i").mkString(" ")
    val textC = (1 to 80).map(i => s"c$i").mkString(" ")
    val textD = (0 until 56).map(i => s"p${i % 24}").mkString(" ")
    val docs = Seq((1L, text80), (2L, text80), (3L, textC), (4L, textD))
      .toDF("doc_id", "text")
    val got = Corpus.chunkDedup(docs)
      .select(col("doc_id"), col("n_chunks"), col("n_shared_chunks"))
      .as[(Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == (3L, 3L) && got(2L) == (3L, 3L),
           "verbatim copies: every chunk shared")
    assert(got(3L) == (3L, 0L), "unique doc: nothing shared")
    assert(got(4L) == (2L, 0L),
           "within-doc duplicate chunks are not cross-doc shared")
    // sanity of the period-24 construction: D's two chunks really are
    // byte-identical (else the case above passes vacuously)
    val dSigs = Corpus.chunkRows(docs.filter(col("doc_id") === 4L))
      .select(col("chunk_sig")).as[Long].collect()
    assert(dSigs.length == 2 && dSigs(0) == dSigs(1))
  }

  test("q_repeat_epochs: cap algebra and budget accounting") {
    val rows = Corpus.qRepeatEpochs(spark, sf)
      .as[(String, Long, Double, Long, Double, Double, Long, Long)]
      .collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4, "weights sum to 1")
    val totToks = rows.map(_._2).sum
    val targetSum = rows.map(_._4).sum
    // floor() per source loses < 1 token each vs the exact 2x budget
    assert(targetSum <= Corpus.RepeatBudgetFactor * totToks &&
           targetSum > Corpus.RepeatBudgetFactor * totToks - rows.length,
           s"sum(target)=$targetSum vs budget=${2 * totToks}")
    rows.foreach { case (src, toks, _, target, rawE, e, eff, unused) =>
      assert(eff == math.min(Corpus.MaxEpochs * toks, target),
             s"$src: effective = min(cap, target)")
      assert(unused == target - eff, s"$src: unused accounting")
      assert(e <= Corpus.MaxEpochs + 1e-6, s"$src: epochs capped")
      assert(e <= rawE + 1e-6, s"$src: cap only lowers epochs")
    }
  }

  test("mlmMask: independent Scala recomputation of the mask") {
    // Recompute md5Bits60(doc:pos) < thr locally for small docs and
    // compare count AND position-list fingerprint.
    val docs = Seq((7L, (1 to 200).map(i => s"w$i").mkString(" ")),
                   (8L, "one two three"))
      .toDF("doc_id", "text")
    def bits60(s: String): BigInt = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15)
      BigInt(hex, 16)
    }
    val expect = Map(7L -> 200, 8L -> 3).map { case (id, n) =>
      val pos = (0 until n).filter(i =>
        bits60(s"$id:$i") < BigInt(Corpus.MaskThrBits))
      id -> (pos.size.toLong, bits60(pos.mkString(",")).toLong)
    }
    val got = Corpus.mlmMask(docs)
      .select(col("doc_id"), col("n_masked"), col("mask_sig"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(got == expect)
  }

  test("dupProfile: multi-size cluster distribution on a crafted corpus") {
    // 3 copies of A, 2 of B, 1 of C -> one cluster per size 1..3; the
    // sf gates carry no exact duplicates (their profile is the single
    // csize=1 row), so the interesting path is pinned here.
    val docs = Seq((1L, "a a a"), (2L, "a a a"), (3L, "a a a"),
                   (4L, "b b"), (5L, "b b"), (6L, "c"))
      .toDF("doc_id", "text")
    val got = graft.ext.Dedup.dupProfile(docs)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3, r._4)).toSeq ==
           Seq((1L, 1L, 1L, 0L), (2L, 1L, 2L, 1L), (3L, 1L, 3L, 2L)))
    assert(math.abs(got.map(_._5).sum - 1.0) < 1e-6,
           "doc_frac is a distribution over the corpus")
    assert(got.map(_._4).sum == 3L, "dedup would remove 3 of 6 docs")
  }

  test("q_band_sweep: shared ground truth, bounded hits, config algebra") {
    val rows = graft.ext.Dedup.qBandSweep(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.length == graft.ext.Dedup.BandConfigs.length)
    // every config splits the same signature: b x r = NumHashes
    rows.foreach { case (b, r, ne, nc, nh, rec) =>
      assert(b * r == graft.ext.Dedup.NumHashes)
      assert(nh <= math.min(ne, nc), s"hits bounded: ($b,$r)")
      assert(rec >= 0.0 && rec <= 1.0)
    }
    // the exact side is computed once — identical in every row
    assert(rows.map(_._3).distinct.length == 1,
           "ground truth must be shared across configs")
  }

  test("q_mlm_mask: realized rate concentrates near 15%") {
    val agg = Corpus.qMlmMask(spark, sf)
      .agg(sum(col("n_masked")).cast("double") / sum(col("n_toks")))
      .as[Double].head()
    assert(agg > 0.10 && agg < 0.20, s"corpus-wide mask rate $agg")
  }
}
