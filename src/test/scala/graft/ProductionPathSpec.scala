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

  test("dedup embedding: banded generator reproduces the label-block pairs") {
    // The production path: sign-LSH banded candidates (the q_dbscan
    // round-10 generator) restricted to the label block, cosine-verified
    // at EmbDupThreshold — must equal q_dedup_embedding's within-label
    // all-pairs result row for row.
    val emb = Tables.embeddings(spark, SfDir)
    val e = Stats.dbscanSample(emb).persist()
    val labels = emb.select(col("vec_id"), col("label"))
    val viaBuckets = Stats.dbscanCandidates(e)
      .join(labels.select(col("vec_id").as("va"), col("label").as("la")),
            Seq("va"))
      .join(labels.select(col("vec_id").as("vb"), col("label").as("lb")),
            Seq("vb"))
      .filter(col("la") === col("lb"))
      .join(e.select(col("vec_id").as("va"), col("embedding").as("ea"),
                     col("nrm").as("na")), Seq("va"))
      .join(e.select(col("vec_id").as("vb"), col("embedding").as("eb"),
                     col("nrm").as("nb")), Seq("vb"))
      .withColumn("cos",
        round(VectorFunctions.vecDot(col("ea"), col("eb")) /
                (col("na") * col("nb")), 6))
      .filter(col("cos") >= Dedup.EmbDupThreshold)
      .select(col("la").as("label"), col("va").as("vec_a"),
              col("vb").as("vec_b"), col("cos"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val demo = Dedup.qDedupEmbedding(spark, SfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(viaBuckets === demo,
      "bucketed pair set diverged from the label-block demo:\n" +
        s"only-bucketed=${viaBuckets -- demo}\nonly-demo=${demo -- viaBuckets}")
    e.unpersist()
    ()
  }
}
