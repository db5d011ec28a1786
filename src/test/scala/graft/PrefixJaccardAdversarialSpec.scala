package graft

import graft.ext.Dedup
import graft.ops.Ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import scala.util.Random

/** Adversarial losslessness pin for q_prefix_jaccard's three-layer
  * candidate filter (length + k-prefix count + positional).
  *
  * The gate corpus (sf0.01, ~60k-gram vocabulary) never stresses the
  * filters: its prefix grams are near-unique, so the 1-prefix index
  * already emits only true pairs. This spec builds the corpus shape
  * that broke the first formulation at 30× — a TINY vocabulary (every
  * possible gram shared by many docs) — plus the length edge cases the
  * k = 2 count filter must special-case (docs with a single gram,
  * where a qualifying pair has total overlap O = 1 < k and the
  * min(k, O_min) guard is what keeps the filter lossless), and pins
  * candidates ⊇ brute-force threshold pairs.
  */
class PrefixJaccardAdversarialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("tiny-vocab + single-gram docs: candidates cover brute force") {
    val s = spark
    import s.implicits._
    val rnd = new Random(42)
    val vocab = (0 until 12).map(i => s"w$i")
    // 300 random docs over the 12-token vocab (lengths 3..40 tokens),
    // 30 near-dup pairs (one token substituted), and 6 docs of exactly
    // 3 tokens = 1 shingle, several sharing that one shingle (J = 1.0
    // pairs with O = 1 — the min(k, O_min) edge).
    val base = (0 until 300).map { i =>
      val len = 3 + rnd.nextInt(38)
      (i.toLong, Seq.fill(len)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val dups = (0 until 30).map { i =>
      val (id, text) = base(rnd.nextInt(base.size))
      val toks = text.split(" ").toSeq
      val j = rnd.nextInt(toks.size)
      (1000L + i, toks.updated(j, vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val tiny = Seq(2000L -> "w0 w1 w2", 2001L -> "w0 w1 w2",
                   2002L -> "w0 w1 w2", 2003L -> "w3 w4 w5")
      .map { case (id, t) => (id, t) }
    val docsRaw = (base ++ dups ++ tiny).toDF("doc_id", "text")

    val docs = docsRaw.select(col("doc_id"),
        Ops.shingles(Ops.tokens(col("text")), 3).as("grams"))
      .select(col("doc_id"), col("grams"),
              size(col("grams")).cast("bigint").as("n"))
      .persist()

    val exact = docs
      .select(col("doc_id").as("doc_a"), col("grams").as("ga"),
              col("n").as("n_a"))
      .crossJoin(docs.select(col("doc_id").as("doc_b"),
                             col("grams").as("gb"), col("n").as("n_b")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("n_common",
        size(array_intersect(col("ga"), col("gb"))).cast("bigint"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= Dedup.PrefixJacT)
      .select(col("doc_a"), col("doc_b"))
      .persist()

    val nExact = exact.count()
    assert(nExact >= 3L,
      s"adversarial corpus must carry threshold pairs, got $nExact")
    // The single-gram J=1.0 pairs must be present and covered.
    assert(exact.filter(col("doc_a") >= 2000L).count() == 3L)

    val cand = Dedup.prefixJacCandidates(docs).persist()
    val missed = exact.join(cand, Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed == 0L,
      s"filters dropped $missed true pairs on the adversarial corpus")

    // The point of the k-prefix layer: candidates stay output-scale,
    // not collision-scale. With a 12-token vocab every doc pair shares
    // prefix grams, so the 1-prefix index would emit ~all C(336,2)
    // pairs; the count+positional layers must keep well under 10%.
    val nCand = cand.count()
    val allPairs = 336L * 335L / 2L
    assert(nCand < allPairs / 10L,
      s"filters barely prune on tiny vocab: cand=$nCand of $allPairs")

    // End-to-end: operator output == brute force on this corpus.
    val got = Dedup.prefixJaccard(docsRaw)
    assert(got.select(col("doc_a"), col("doc_b"))
      .join(exact, Seq("doc_a", "doc_b"), "left_anti").count() == 0L)
    assert(exact.join(got, Seq("doc_a", "doc_b"), "left_anti").count() == 0L)

    cand.unpersist(); exact.unpersist(); docs.unpersist()
    ()
  }
}
