package graft

import graft.ext.Corpus
import org.scalatest.funsuite.AnyFunSuite

/** The contamination family's hot-gram document-frequency cap
  * (Corpus.ContamMaxDf) on crafted corpora where it BINDS — the
  * sf0.001/0.01 gates have near-uniform vocab, so their df never
  * reaches the cap and the CORRECTNESS rows can't distinguish capped
  * from uncapped. These corpora can: a stopword-like 5-gram shared by
  * more than ContamMaxDf large-side documents must contribute ZERO
  * overlap evidence (it is an idiom, not leakage), while a gram at
  * exactly the cap still counts.
  */
class HotGramCapSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val hot = "h1 h2 h3 h4 h5"   // one 5-gram, planted hot
  private val rare = "r1 r2 r3 r4 r5"  // one 5-gram, planted rare

  test("q_contamination: gram above ContamMaxDf on the corpus side is dropped") {
    assert(Corpus.ContamMaxDf == 64L, "test corpus is sized to the cap")
    // 70 corpus docs (> cap) all carry the hot gram; docs 1 and 2 also
    // carry the rare gram (unique separator token keeps crossing grams
    // df=1 so they can't match anything). Bench doc 50 carries both.
    val hotIds = ((1L to 49L) ++ (51L to 71L)).toSeq // 70 ids, none %50==0
    val docs = hotIds.map { i =>
      if (i <= 2) (i, s"$hot u$i $rare") else (i, hot)
    } :+ ((50L, s"$hot u50 $rare"))
    val got = Corpus.contaminationPairs(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().toSet
    // Uncapped this would be 70 rows (every hot doc paired with bench);
    // capped, only the rare-gram carriers report, with the hot gram
    // contributing nothing to their counts either.
    assert(got == Set((1L, 50L, 1L), (2L, 50L, 1L)))
  }

  test("q_contamination: gram at exactly ContamMaxDf still counts") {
    val warmIds = ((1L to 49L) ++ (51L to 65L)).toSeq // 64 ids == cap, none %50==0
    val docs = warmIds.map(i => (i, hot)) :+ ((100L, hot))
    val got = Corpus.contaminationPairs(docs.toDF("doc_id", "text"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got == warmIds.map(i => (i, 100L, 1L)).toSet)
  }

  test("capHotGrams and capHotGramsColocated keep the identical posting set") {
    // The two formulations exist for plan reasons only (broadcast-anti
    // vs window-exchange-reuse); this pins that they can never drift
    // semantically. Frame straddles the boundary: grams at df 1,
    // ContamMaxDf, and ContamMaxDf+1.
    val cap = Corpus.ContamMaxDf.toInt
    val postings =
      (1 to cap + 1).map(i => (i.toLong, "hotgram")) ++   // df = cap+1 -> drop
      (1 to cap).map(i => (1000L + i, "warmgram")) ++     // df = cap   -> keep
      Seq((5000L, "raregram"))                            // df = 1     -> keep
    val df = postings.toDF("doc_id", "gram")
    val a = Corpus.capHotGrams(df).select($"doc_id", $"gram")
      .as[(Long, String)].collect().toSet
    val b = Corpus.capHotGramsColocated(df).select($"doc_id", $"gram")
      .as[(Long, String)].collect().toSet
    assert(a == b)
    assert(a.map(_._2) == Set("warmgram", "raregram"))
    assert(a.size == cap + 1)
  }

  test("q_split_leakage: gram above ContamMaxDf on the train side is dropped") {
    val trainHot = (1L to 70L).map(i => (i, hot))
    val docs = (trainHot :+ ((201L, rare))
      :+ ((1000L, s"$hot u0 $rare"))).toDF("doc_id", "text")
    val split = (trainHot.map(_._1) :+ 201L).map(i => (i, "train"))
      .:+((1000L, "holdout")).toDF("doc_id", "split")
    val got = Corpus.splitLeakagePairs(docs, split)
      .as[(Long, Long, Long)].collect().toSet
    // The holdout doc shares the hot gram with all 70 train docs and
    // the rare gram with train doc 201 only; with the cap binding on
    // the hot gram, 201 is the sole surviving (and thus worst)
    // contaminator.
    assert(got == Set((1000L, 201L, 1L)))
  }
}
