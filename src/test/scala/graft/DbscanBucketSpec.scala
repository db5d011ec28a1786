package graft

import graft.ext.Stats
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Recall pin for q_dbscan's banded sign-LSH candidate generator (the
  * round-10 replacement of the within-label all-pairs ε-graph).
  *
  * The bucketed predicate (share ≥ 1 of the DbBands 2-bit sign bands,
  * hot-band cap DbBandMaxDf) defines the query's candidate set on BOTH
  * engines — correctness vs the oracle never depends on recall. What
  * this spec pins is the stronger claim the docstring makes: on the
  * demo sample at the correctness-gate scale (sf0.01) the banding is
  * LOSSLESS, i.e. bucketed candidates ⊇ all exact ε-pairs and the cap
  * never fires — so the bucketed DBSCAN result EQUALS exact all-pairs
  * DBSCAN there, while the generator stays cap-bounded at 100×.
  */
class DbscanBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // The correctness gate runs at sf0.01; pin the lossless claim there.
  private val SfDir = "/root/testdata/sf0.01"

  test("bucketed candidates cover every exact eps-pair, with cos margin") {
    val e = Stats.dbscanSample(Tables.embeddings(spark, SfDir)).persist()
    val allPairs = e
      .select(col("vec_id").as("va"), col("embedding").as("ea"),
              col("nrm").as("na"))
      .crossJoin(e.select(col("vec_id").as("vb"), col("embedding").as("eb"),
                          col("nrm").as("nb")))
      .filter(col("va") < col("vb"))
      .withColumn("cos",
        round(VectorFunctions.vecDot(col("ea"), col("eb")) /
                (col("na") * col("nb")), 6))
      .select(col("va"), col("vb"), col("cos"))
    val cand = Stats.dbscanCandidates(e)

    val missedEps = allPairs.filter(col("cos") >= Stats.DbEps)
      .join(cand, Seq("va", "vb"), "left_anti").count()
    assert(missedEps == 0L,
      s"banding missed $missedEps exact eps-pairs at DbEps=${Stats.DbEps}")

    // Margin, not just coverage: the hottest pair the banding does NOT
    // generate sits well below the threshold (measured 0.143 at sf0.01
    // vs DbEps 0.2), so the lossless property is not a knife-edge.
    val maxMissCos = allPairs.join(cand, Seq("va", "vb"), "left_anti")
      .agg(max(col("cos"))).collect().head.getDouble(0)
    assert(maxMissCos < Stats.DbEps,
      s"non-candidate pair at cos=$maxMissCos >= DbEps=${Stats.DbEps}")
    e.unpersist()
    ()
  }

  test("demo band occupancy stays below the hot-band cap") {
    val e = Stats.dbscanSample(Tables.embeddings(spark, SfDir))
    val maxOcc = Stats.dbscanBanded(e)
      .groupBy(col("band_id"), col("band_val"))
      .agg(count(lit(1)).as("c"))
      .agg(max(col("c"))).collect().head.getLong(0)
    assert(maxOcc <= Stats.DbBandMaxDf,
      s"demo bucket occupancy $maxOcc exceeds cap ${Stats.DbBandMaxDf} — " +
        "the cap would drop candidates and the lossless claim is void")
  }
}
