package graft

import graft.ext.Corpus
import org.scalatest.funsuite.AnyFunSuite

/** Exact merge-table invariants of the BPE trainer on crafted corpora
  * (the Sennrich worked example), plus the deterministic tie-break,
  * the exhaustion path, and round-trip encoding with learned merges.
  */
class BpeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(wordFreqs: (String, Int)*): org.apache.spark.sql.DataFrame =
    wordFreqs.zipWithIndex.map { case ((w, f), i) =>
      (i.toLong, (Seq.fill(f)(w)).mkString(" "))
    }.toDF("doc_id", "text")

  test("Sennrich example: first merges follow count desc, pair asc") {
    // low*5 lower*2 newest*6 widest*3 — the classic worked example.
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val got = Corpus.bpeMerges(spark, docs)
      .as[(Long, String, String, Long)].collect().toList
    // (e,s)=9 ties (s,t)=9 -> pair-asc picks (e,s); then (es,t)=9;
    // (l,o)=7 ties (o,w)=7 -> (l,o); then (lo,w)=7; then the 6-count
    // tie {(e,w),(n,e),(w,est)} -> (e,w).
    assert(got.take(5) == List(
      (1L, "e", "s", 9L),
      (2L, "es", "t", 9L),
      (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L),
      (5L, "e", "w", 6L)))
    assert(got.map(_._1) == (1L to got.length).toList, "iters are dense")
  }

  test("encode applies learned merges in order") {
    val docs = corpus("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
    val merges = Corpus.bpeMerges(spark, docs)
      .as[(Long, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    assert(Corpus.bpeEncode("lowest", merges) == Seq("low", "est"),
           "unseen word segments into learned subwords")
    assert(Corpus.bpeEncode("xyz", merges) == Seq("x", "y", "z"),
           "word sharing no learned pair stays at char level")
  }

  test("exhaustion stops the loop early with identical tables") {
    // Two 2-char words: exactly 2 merges exist, far below NumMerges.
    val docs = corpus("ab" -> 2, "cd" -> 2)
    val got = Corpus.bpeMerges(spark, docs)
      .as[(Long, String, String, Long)].collect().toList
    assert(got == List((1L, "a", "b", 2L), (2L, "c", "d", 2L)),
           "tie at count 2 breaks pair-asc; loop stops when no pair remains")
  }
}
