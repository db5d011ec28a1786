package graft

import graft.ext.Corpus
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the mixture-temperature weights, the
  * sliding-window chunker, and the per-language tokenizer-fertility
  * audit that the DuckDB hash-compare can't express: window arithmetic
  * on crafted lengths, coverage/overlap conservation, and the
  * flattening law of temperature sampling.
  */
class MixChunkSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = TestSpark.Sf

  private def doc(n: Int): (Long, String) =
    (n.toLong, (1 to n).map(i => s"t$i").mkString(" "))

  test("chunkOverlap: crafted lengths hit the ceil-window arithmetic") {
    // doc_id == its token count, so expectations read off the id.
    val docs = Seq(doc(1), doc(8), doc(32), doc(33), doc(56), doc(57))
      .toDF("doc_id", "text")
    val got = Corpus.chunkOverlap(docs)
      .select(col("doc_id"), col("n_chunks"), col("chunk_id"),
              col("n_chunk_toks"))
      .as[(Long, Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._3).map(r => (r._2, r._4)))
      .toMap
    // (n_chunks, last-chunk token count) per length:
    assert(got(1L).map(_._2).toSeq == Seq(1L) && got(1L).head._1 == 1L)
    assert(got(8L).map(_._2).toSeq == Seq(8L))
    assert(got(32L).map(_._2).toSeq == Seq(32L)) // exactly one window
    // 33: second window starts at 25, covers 25..33 = 9 tokens
    assert(got(33L).map(_._2).toSeq == Seq(32L, 9L))
    // 56: second window 25..56 is a full 32
    assert(got(56L).map(_._2).toSeq == Seq(32L, 32L))
    // 57: third window 49..57 = 9 tokens
    assert(got(57L).map(_._2).toSeq == Seq(32L, 32L, 9L))
  }

  test("chunkOverlap: chunks cover every token; adjacent overlap is 8") {
    val docs = Seq(doc(100)).toDF("doc_id", "text")
    val chunks = Corpus.chunkOverlap(docs)
      .select(col("chunk_id"), col("n_chunk_toks"))
      .as[(Long, Long)].collect().sortBy(_._1)
    // starts at stride spacing; each chunk spans [start, start+len)
    val covered = chunks.flatMap { case (cid, len) =>
      val start = cid * Corpus.ChunkStride
      start until (start + len)
    }
    assert(covered.toSet == (0 until 100).toSet,
           "every token position must land in at least one chunk")
    // full adjacent windows share exactly window - stride positions
    val spans = chunks.map { case (cid, len) =>
      (cid * Corpus.ChunkStride, cid * Corpus.ChunkStride + len) }
    spans.sliding(2).foreach { case Array((_, e0), (s1, e1)) =>
      assert(math.min(e0, e1) - s1 ==
               math.min(Corpus.ChunkWindow - Corpus.ChunkStride, e1 - s1))
    case _ => ()
    }
  }

  test("q_mix_temperature: flattening law and simplex invariants") {
    val rows = Corpus.qMixTemperature(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    // q and p are distributions (to rounding): sums within 1e-4
    assert(math.abs(rows.map(_._3).sum - 1.0) < 1e-4)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    // temperature flattens: boost is strictly decreasing in raw share
    // (the pivot share where boost crosses 1 is T/S^2, NOT the mean
    // share, so the guaranteed extremes are the two ends: since
    // sum(p*boost) = sum(q) = 1 and boost is monotone, the biggest
    // language cannot upsample and the smallest cannot downsample).
    val byToks = rows.sortBy(_._2)
    byToks.sliding(2).foreach {
      case Array(lo, hi) =>
        if (lo._2 < hi._2)
          assert(lo._5 >= hi._5,
                 s"boost must not increase with share: ${lo._1} vs ${hi._1}")
      case _ => ()
    }
    assert(byToks.last._5 <= 1.0 + 1e-6, "head lang must not upsample")
    assert(byToks.head._5 >= 1.0 - 1e-6, "tail lang must not downsample")
    rows.foreach { case (_, _, p, q, boost) =>
      assert(math.abs(q / p - boost) < 1e-3)
    }
  }

  test("q_tokenizer_fertility: bounds and language coverage") {
    val rows = Corpus.qTokenizerFertility(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nw, ns, nc, fert, cps) =>
      assert(nw > 0 && ns >= nw,
             s"$lang: every word is at least one subword")
      assert(nc >= ns, s"$lang: a subword is at least one char")
      assert(fert >= 1.0 && cps >= 1.0)
      assert(math.abs(fert - ns.toDouble / nw) < 1e-5)
    }
  }
}
