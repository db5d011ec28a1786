package graft

import graft.ext.{Dedup, Stats}
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Machine-checks the "production swaps in the funnel unchanged"
  * comments that q_knn_classify and q_dedup_embedding carry: the
  * bucketed / index-pruned production candidate generators, run on the
  * same demo inputs at the correctness-gate scale (sf0.01), must
  * reproduce the demo queries' results EXACTLY. Until round 10 those
  * claims lived only in docstrings.
  */
class ProductionPathSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val SfDir = "/root/testdata/sf0.01"

  private def census(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getInt(0), r.getInt(1), r.getLong(2))).toList

  test("knn classify: full-probe IVF funnel equals brute force exactly") {
    // nprobe = NumCells makes the funnel's candidate set the whole
    // corpus, so any divergence would be a defect in the swapped-in
    // scoring / top-K / voting path itself — this pins that the
    // production funnel and the demo share semantics, with recall the
    // ONLY degree of freedom between them.
    val emb = Tables.embeddings(spark, SfDir)
    val brute = census(Stats.knnClassify(emb))
    val full = census(Stats.knnClassifyIvf(emb,
                                           nprobe = ext.Similarity.NumCells))
    assert(full === brute,
      s"full-probe IVF census diverged from brute force: $full vs $brute")
  }

  test("knn classify: production-nprobe funnel matches brute force on clustered data") {
    // The sf dirs' near-uniform embeddings are the adversarial case for
    // any cell-pruned index (every vector is everyone's ~equidistant
    // neighbor — AnnClusteredSpec's documented geometry effect), so the
    // production-regime pin runs on the CLUSTERED twin corpus: there,
    // NProbe-cell pruning must reproduce the brute-force census exactly.
    val dir = java.nio.file.Files
      .createTempDirectory("graft_knn_clustered").toString
    ScaleGen
      .clusteredEmbeddings(spark, Tables.embeddings(spark, TestSpark.Sf), 1)
      .write.parquet(s"$dir/embeddings.parquet")
    val emb = Tables.embeddings(spark, dir)
    val brute = census(Stats.knnClassify(emb))
    val ivf = census(Stats.knnClassifyIvf(emb))
    assert(ivf === brute,
      s"clustered-data IVF census diverged from brute force: $ivf vs $brute")
  }

  test("dedup embedding: bucketed query equals the all-pairs reference") {
    // q_dedup_embedding ships the banded sign-LSH generator (round 10 —
    // the within-label all-pairs join measured 21× wall at 30×). This
    // pin holds the EXHAUSTIVE reference: brute-force within-label
    // all-pairs cosine at EmbDupThreshold must equal the shipped
    // bucketed query row for row — i.e. the banding is lossless on the
    // gate corpus, not just covered-by-construction.
    val e = Stats.dbscanSample(Tables.embeddings(spark, SfDir)).persist()
    val allPairs = e
      .select(col("label").as("la"), col("vec_id").as("va"),
              col("embedding").as("ea"), col("nrm").as("na"))
      .crossJoin(e.select(col("label").as("lb"), col("vec_id").as("vb"),
                          col("embedding").as("eb"), col("nrm").as("nb")))
      .filter(col("la") === col("lb") && col("va") < col("vb"))
      .withColumn("cos",
        round(VectorFunctions.vecDot(col("ea"), col("eb")) /
                (col("na") * col("nb")), 6))
      .filter(col("cos") >= Dedup.EmbDupThreshold)
      .select(col("la").as("label"), col("va").as("vec_a"),
              col("vb").as("vec_b"), col("cos"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val shipped = Dedup.qDedupEmbedding(spark, SfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(shipped === allPairs,
      "bucketed query diverged from the all-pairs reference:\n" +
        s"only-shipped=${shipped -- allPairs}\nmissed=${allPairs -- shipped}")
    e.unpersist()
    ()
  }
}
