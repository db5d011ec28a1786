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

  test("native BpeEncodeWord == string-fold encoder, incl. consumed-boundary repeats") {
    import org.apache.spark.sql.graftshim.{BpeEncodeWord, Shim}
    // Adversarial table: self-pair, merged-symbol chaining, overlaps.
    val merges = Seq(("a", "a"), ("a", "b"), ("aa", "a"), ("ab", "c"),
                     ("b", "c"), ("aab", "x"))
    val words = Seq("aaaa", "aaaaa", "aaaaaa", "ababab", "abab", "abc",
                    "abcbc", "aabx", "aaabx", "xyz", "a", "ba", "bcbcbc",
                    "aabaab", "abcabc")
    // The reference is the SAME replace primitive the oracle runs:
    // sequential non-overlapping left-to-right, boundary consumed.
    val expect = words.map(w => Corpus.bpeEncode(w, merges))
    // Sanity-pin the subtlety itself, not just agreement: "aaaa" under
    // a LONE (a,a) merge is [aa, a, a] — not [aa, aa] — because the
    // second pair's anchor pipe is consumed by the first match.
    assert(Corpus.bpeEncode("aaaa", Seq(("a", "a"))) == Seq("aa", "a", "a"))
    val got = words.toDF("w")
      .select(Shim.column(BpeEncodeWord(Shim.expression($"w"), merges))
                .as("enc"))
      .as[Seq[String]].collect().toList
    assert(got == expect, "native encoder must be byte-equal to the fold")
  }

  test("native BpeEncodeWord == replace-chain fold over the real corpus vocab") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val merges = Corpus.bpeMerges(spark, docs)
      .as[(Long, String, String, Long)].collect()
      .map(m => (m._2, m._3)).toSeq
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.graftshim.{BpeEncodeWord, Shim}
    val vocab = docs
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(col("w").rlike("^[a-z]+$") && length(col("w")) >= 2)
      .distinct()
    val wrapped = concat(lit("|"), regexp_replace(col("w"), "(.)", "$1|"))
    val folded = merges.foldLeft(wrapped) { case (c, (l, r)) =>
      replace(c, lit(s"|$l|$r|"), lit(s"|$l$r|"))
    }
    val mismatches = vocab
      .select(col("w"),
              (size(split(folded, "\\|")) - 2).cast("long").as("n_fold"),
              size(Shim.column(BpeEncodeWord(Shim.expression(col("w")),
                                             merges)))
                .cast("long").as("n_native"))
      .filter(col("n_fold") =!= col("n_native"))
      .count()
    assert(mismatches == 0L,
           "native subword counts must match the fold on every word type")
  }

  test("exhaustion stops the loop early with identical tables") {
    // Two 2-char words: exactly 2 merges exist, far below NumMerges.
    val docs = corpus("ab" -> 2, "cd" -> 2)
    val got = Corpus.bpeMerges(spark, docs)
      .as[(Long, String, String, Long)].collect().toList
    assert(got == List((1L, "a", "b", 2L), (2L, "c", "d", 2L)),
           "tie at count 2 breaks pair-asc; loop stops when no pair remains")
  }

  test("driver-local merge loop == distributed loop on the real corpus") {
    val docs = Tables.documents(spark, TestSpark.Sf)
    val local = Corpus.bpeMerges(spark, docs)
      .as[(Long, String, String, Long)].collect().toList
    val dist = Corpus.bpeMergesVia(spark, docs, 0)
      .as[(Long, String, String, Long)].collect().toList
    assert(local == dist,
           "both merge-loop paths must learn the identical table")
    assert(local.nonEmpty, "real corpus must yield at least one merge")
  }
}
