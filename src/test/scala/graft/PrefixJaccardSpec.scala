package graft

import graft.ext.Dedup
import graft.ops.Ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Losslessness + exactness pins for q_prefix_jaccard's prefix-filter
  * candidate generator (AllPairs/PPJoin principle).
  *
  * Unlike the capped generators (MaxGramDf, SimBandMaxDf), the prefix
  * filter claims ZERO recall loss by theorem: any pair with shingle-set
  * Jaccard ≥ t must share a gram inside the two docs' rarest-first
  * prefixes of length n − ⌈t·n⌉ + 1. This spec machine-checks the
  * theorem at the correctness-gate scale against brute force, and pins
  * the funnel numbers the operator's docstring quotes.
  */
class PrefixJaccardSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val SfDir = "/root/testdata/sf0.01"

  /** Brute-force all-pairs shingle-set Jaccard (va < vb). */
  private def brutePairs() = {
    val docs = Tables.documents(spark, SfDir)
      .select(col("doc_id"),
              Ops.shingles(Ops.tokens(col("text")), 3).as("grams"))
      .select(col("doc_id"), col("grams"),
              size(col("grams")).cast("bigint").as("n"))
      .persist()
    val pairs = docs
      .select(col("doc_id").as("doc_a"), col("grams").as("ga"),
              col("n").as("n_a"))
      .crossJoin(docs.select(col("doc_id").as("doc_b"), col("grams").as("gb"),
                             col("n").as("n_b")))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("n_common",
        size(array_intersect(col("ga"), col("gb"))).cast("bigint"))
      .withColumn("jaccard", col("n_common").cast("double") /
        (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    (docs, pairs)
  }

  test("prefix candidates cover every exact threshold pair (lossless)") {
    val (docs, pairs) = brutePairs()
    val exact = pairs.filter(col("jaccard") >= Dedup.PrefixJacT).persist()
    val cand = Dedup.prefixJacCandidates(docs)

    val missed = exact.join(cand, Seq("doc_a", "doc_b"), "left_anti").count()
    assert(missed == 0L,
      s"prefix filter missed $missed exact pairs at t=${Dedup.PrefixJacT}")

    // The funnel the docstring quotes: all pairs ≫ shared-shingle pairs
    // ≫ prefix candidates; on this corpus the candidates are exactly
    // the true pairs (zero false candidates).
    val nExact = exact.count()
    val nCand = cand.count()
    assert(nExact > 0L, "gate corpus carries no threshold pairs")
    assert(nCand == nExact,
      s"expected zero false candidates on the gate corpus: " +
        s"cand=$nCand exact=$nExact")
    exact.unpersist()
    docs.unpersist()
    ()
  }

  test("operator output equals brute-force threshold pairs exactly") {
    val (docs, pairs) = brutePairs()
    val exact = pairs.filter(col("jaccard") >= Dedup.PrefixJacT)
    val got = Dedup.prefixJaccard(Tables.documents(spark, SfDir))
    // Bidirectional anti-joins on all three columns: jaccard values are
    // int/int divisions, bit-identical between the two formulations.
    assert(got.join(exact, Seq("doc_a", "doc_b", "jaccard"), "left_anti")
      .count() == 0L, "operator emitted a pair brute force does not have")
    assert(exact.join(got, Seq("doc_a", "doc_b", "jaccard"), "left_anti")
      .count() == 0L, "operator missed a brute-force pair")
    docs.unpersist()
    ()
  }
}
