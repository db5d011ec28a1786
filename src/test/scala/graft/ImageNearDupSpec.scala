package graft

import graft.ext.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** Exact-pair invariants of the perceptual-hash (average-hash) image
  * near-dup on crafted corpora: identical renders must collide at
  * Hamming 0, unrelated renders must not pair, and the hot-bucket cap
  * must drop over-full LSH buckets entirely (the quadratic-blowup
  * defense, same contract as the n-gram MaxGramDf cap).
  */
class ImageNearDupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Deterministic pseudo-random ASCII text (no java.util.Random so the
  // fixture is reproducible from the source alone).
  private def text(seed: Long, n: Int): String = {
    var x = seed
    val sb = new StringBuilder
    for (_ <- 0 until n) {
      x = (x * 6364136223846793005L + 1442695040888963407L)
      sb.append((32 + math.floorMod(x >>> 33, 95)).toChar)
    }
    sb.toString
  }

  test("identical renders pair at hamming 0; unrelated docs don't pair") {
    val a = text(7L, 200)
    val b = text(99L, 200)
    val docs = Seq((0L, a), (1L, a), (2L, b)).toDF("doc_id", "text")
    val got = Multimodal.imageNearDup(spark, docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((0L, 1L, 0L)),
           "identical thumbnails must collide at hamming 0")
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L),
           "an unrelated render must not survive the hamming filter")
    assert(got.forall(p => p._1 < p._2 && p._3 <= Multimodal.AhMaxHamming))
  }

  test("over-full LSH buckets are dropped by the cap") {
    val a = text(13L, 150)
    val docs = (0L until (Multimodal.AhMaxBucket + 6L)).map(i => (i, a))
      .toDF("doc_id", "text")
    val got = Multimodal.imageNearDup(spark, docs).count()
    assert(got == 0L,
           s"a bucket of ${Multimodal.AhMaxBucket + 6} identical sigs " +
             "exceeds AhMaxBucket and must be dropped, not exploded")
  }

  test("audio fingerprint: identical 512-byte prefixes collide at hamming 0") {
    // Audio near-dup hears only the first 512 bytes (256 samples), so
    // docs sharing that prefix are exact fingerprint matches even with
    // different tails; a doc with a different prefix must not pair.
    val prefix = text(31L, 512)
    val docs = Seq(
      (0L, prefix + text(1L, 100)),
      (1L, prefix + text(2L, 300)),
      (2L, text(77L, 600))).toDF("doc_id", "text")
    val got = Multimodal.audioNearDup(spark, docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got.contains((0L, 1L, 0L)))
    assert(!got.exists(p => p._1 == 2L || p._2 == 2L))
  }

  test("non-ASCII text is excluded by the premise guard, not mis-hashed") {
    val a = text(21L, 180)
    val docs = Seq((0L, a), (1L, a), (2L, "café " * 40)).toDF("doc_id", "text")
    val got = Multimodal.imageNearDup(spark, docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((0L, 1L, 0L)))
  }
}
