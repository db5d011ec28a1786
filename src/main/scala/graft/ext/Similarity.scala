package graft.ext

import graft.Tables
import graft.functions.VectorFunctions
import graft.ops.Ops
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Similarity search over the `embeddings` table (`array<float>`, 64-dim).
  *
  * Two paths, per the scale playbook:
  *  - brute-force cosine top-k: broadcast the (small) query set against a
  *    full scan of the corpus — the exact baseline. At 100 TB the corpus
  *    side never shuffles; ranking is a window on the bounded
  *    (query × corpus) candidate stream.
  *  - sign-LSH (random-hyperplane) bucketed ANN: each vector maps to a
  *    16-bit bucket via fixed hyperplanes; candidate generation is a
  *    bucket equi-join, turning O(N·Q) into O(N/2^16-ish · Q) at the cost
  *    of recall. Hyperplanes are deterministic plan literals (broadcast
  *    for free, reproducible across runs).
  *
  * Vector math uses the native codegen'd Catalyst expressions in
  * graft.functions.VectorFunctions (index-order double accumulation —
  * bit-identical to the HOF formulation and the DuckDB oracle, but a
  * tight primitive loop inside whole-stage codegen instead of an
  * interpreted lambda per element).
  */
object Similarity {
  type Q = (SparkSession, String) => DataFrame

  val NumQueries = 10
  val TopK = 5

  // Brute-force exact cosine top-k. Norms are computed ONCE per vector
  // before the pair join (per-pair norm recomputation is the classic
  // O(Q×) waste at scale); the per-pair work is a single dot product.
  // Scores are rounded to 6 decimals on BOTH engines before ranking so
  // that float-summation-order noise in the oracle can never flip a
  // rank; vec_id breaks residual ties.
  val qSimilarityTopk: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
              VectorFunctions.vecNorm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
              col("nrm").as("qnrm"))
    val cand = e
      .join(broadcast(q), col("vec_id") =!= col("qid"))
      .withColumn("score",
        round(VectorFunctions.vecDot(col("qe"), col("embedding")) / (col("qnrm") * col("nrm")), 6))
    Ops.topKPerGroup(cand, Seq("qid"), -col("score"), col("vec_id"), TopK)
      .select(col("qid"), col("vec_id"), col("score"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  val qSimilarityTopkSql: String =
    """WITH q AS (SELECT vec_id AS qid, embedding AS qe
      |           FROM embeddings WHERE vec_id < 10),
      |cand AS (
      |  SELECT q.qid, e.vec_id,
      |         round(
      |           (SELECT SUM(CAST(qe[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE))
      |            FROM generate_series(1, 64) i(i)) /
      |           (sqrt((SELECT SUM(CAST(qe[i.i] AS DOUBLE) ** 2)
      |                  FROM generate_series(1, 64) i(i))) *
      |            sqrt((SELECT SUM(CAST(e.embedding[i.i] AS DOUBLE) ** 2)
      |                  FROM generate_series(1, 64) i(i)))), 6) AS score
      |  FROM q, embeddings e WHERE e.vec_id <> q.qid),
      |ranked AS (
      |  SELECT qid, vec_id, score,
      |         CAST(row_number() OVER (PARTITION BY qid
      |                ORDER BY score DESC, vec_id) AS BIGINT) AS rn
      |  FROM cand)
      |SELECT qid, vec_id, score, rn FROM ranked WHERE rn <= 5
      |ORDER BY qid, rn""".stripMargin

  // ------------------------------------------------------------------
  // Sign-LSH ANN (non-SQL-expressible → rows-only check).
  // ------------------------------------------------------------------
  val NumPlanes = 16
  val Dim = 64

  /** Deterministic pseudo-random hyperplanes in [-1, 1], from a plain LCG
    * (same constants as java.util.Random) seeded per (plane, dim). Plan
    * literals: shipped once with the plan, identical on every executor
    * and every run.
    */
  private[ext] def planes: Seq[Seq[Float]] =
    (0 until NumPlanes).map { j =>
      (0 until Dim).map { i =>
        var x = (j.toLong * 1000003L + i.toLong * 7919L + 12345L)
        x = (x * 0x5DEECE66DL + 0xBL) & ((1L << 48) - 1)
        x = (x * 0x5DEECE66DL + 0xBL) & ((1L << 48) - 1)
        ((x.toDouble / (1L << 47).toDouble) - 1.0).toFloat
      }
    }

  /** 16-bit sign-LSH bucket of an embedding column — one native
    * expression over a row-major plane matrix (a plan-bound reference
    * object) instead of 16 dot/when/OR subtrees, so analysis and codegen
    * cost stay O(1) in NumPlanes.
    */
  def lshBucket(emb: Column): Column =
    VectorFunctions.signBucket(emb, planes.flatten.toArray, Dim)

  // ANN: bucket the corpus once, probe each query's bucket only, exact
  // cosine re-rank inside the bucket. Output keeps the bucket id so
  // recall/selectivity is inspectable.
  val qAnnLsh: Q = (s, d) => {
    val e = Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding"),
              lshBucket(col("embedding")).as("bucket"),
              VectorFunctions.vecNorm(col("embedding")).as("nrm"))
    val q = e.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
              col("bucket").as("qbucket"), col("nrm").as("qnrm"))
    val cand = e.join(broadcast(q),
                      col("bucket") === col("qbucket") && col("vec_id") =!= col("qid"))
      .withColumn("score",
        round(VectorFunctions.vecDot(col("qe"), col("embedding")) / (col("qnrm") * col("nrm")), 6))
    Ops.topKPerGroup(cand, Seq("qid"), -col("score"), col("vec_id"), TopK)
      .select(col("qid"), col("bucket"), col("vec_id"), col("score"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  // ------------------------------------------------------------------
  // IVF ANN (non-SQL-expressible → rows-only check): coarse-quantize the
  // corpus into NumCells inverted lists, probe the query's NProbe
  // nearest cells only, exact cosine re-rank inside them. Centroids here
  // are the first NumCells vectors by id — a deterministic stand-in for
  // a k-means codebook (the index-build step is a bounded driver-side
  // collect of NumCells rows; the corpus-side assignment is a pure map).
  // ------------------------------------------------------------------
  val NumCells = 16
  val NProbe = 2

  val qAnnIvf: Q = (s, d) => {
    val e0 = Tables.embeddings(s, d)
    // Index build: a bounded driver-side collect of NumCells centroid
    // rows, flattened row-major into one plan-bound matrix. Cell ranking
    // (dot desc, id asc — smaller id breaks ties) happens in a single
    // native expression per row instead of NumCells dot-product subtrees.
    // The REAL vec_ids ride along as a literal lookup: matrixDotRank
    // returns 0-based matrix ROW indices, which only coincide with
    // vec_ids when 0..NumCells-1 are all present — a filtered corpus
    // with a gap would otherwise silently shift every cell label.
    val cents: Array[(Int, Array[Float])] = e0
      .filter(col("vec_id") < NumCells)
      .orderBy(col("vec_id"))
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => (r.getLong(0).toInt, r.getSeq[Float](1).toArray))
    val cellIds: Seq[Int] = cents.map(_._1).toIndexedSeq
    val mat = cents.flatMap(_._2)

    def rankedCells(emb: Column): Column =
      VectorFunctions.matrixDotRank(emb, mat, Dim)
    def toCellId(rowIdx: Column): Column =
      element_at(typedlit(cellIds), rowIdx + 1)

    val e = e0.select(col("vec_id"), col("embedding"),
                      toCellId(element_at(rankedCells(col("embedding")), 1))
                        .cast("bigint").as("cell"),
                      VectorFunctions.vecNorm(col("embedding")).as("nrm"))
    val q = e0.filter(col("vec_id") < NumQueries)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"),
              VectorFunctions.vecNorm(col("embedding")).as("qnrm"),
              explode(transform(slice(rankedCells(col("embedding")), 1, NProbe),
                                i => toCellId(i))).as("probe_cell"))
    val cand = e.join(broadcast(q),
                      col("cell") === col("probe_cell") && col("vec_id") =!= col("qid"))
      .withColumn("score",
        round(VectorFunctions.vecDot(col("qe"), col("embedding")) /
                (col("qnrm") * col("nrm")), 6))
    Ops.topKPerGroup(cand, Seq("qid"), -col("score"), col("vec_id"), TopK)
      .select(col("qid"), col("cell"), col("vec_id"), col("score"), col("rn"))
      .orderBy(col("qid"), col("rn"))
  }

  /** DuckDB oracle for the sign-LSH ANN. The hyperplanes are re-derived
    * IN SQL from the same two-step LCG as `planes` (HUGEINT modmul keeps
    * the 48-bit wrap exact; the REAL cast reproduces `.toFloat`), so both
    * engines bucket identically — dots are in-index-order double sums on
    * both sides, making even the sign of a near-zero dot deterministic.
    */
  val qAnnLshSql: String = {
    val x0 = "(j.j*1000003 + (i.i-1)*7919 + 12345)"
    val step1 = s"((CAST($x0 AS HUGEINT) * 25214903917 + 11) % 281474976710656)"
    val step2 = s"((CAST($step1 AS HUGEINT) * 25214903917 + 11) % 281474976710656)"
    val plane = s"CAST(CAST($step2 AS DOUBLE) / 140737488355328.0 - 1.0 AS REAL)"
    s"""WITH pd AS (
       |  SELECT e.vec_id, j.j,
       |         (SELECT SUM(CAST(e.embedding[i.i] AS DOUBLE) * CAST($plane AS DOUBLE))
       |          FROM generate_series(1, $Dim) i(i)) AS dot
       |  FROM embeddings e CROSS JOIN generate_series(0, ${NumPlanes - 1}) j(j)),
       |buckets AS (
       |  SELECT vec_id,
       |         CAST(SUM(CASE WHEN dot >= 0 THEN (CAST(1 AS BIGINT) << j) ELSE 0 END) AS BIGINT) AS bucket
       |  FROM pd GROUP BY 1),
       |nrm AS (
       |  SELECT vec_id, sqrt((SELECT SUM(CAST(embedding[i.i] AS DOUBLE) ** 2)
       |                       FROM generate_series(1, $Dim) i(i))) AS nrm
       |  FROM embeddings),
       |q AS (SELECT vec_id AS qid, bucket AS qbucket FROM buckets WHERE vec_id < $NumQueries),
       |cand AS (
       |  SELECT q.qid, b.bucket, e.vec_id,
       |         round((SELECT SUM(CAST(qe.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE))
       |                FROM generate_series(1, $Dim) i(i)) / (nq.nrm * ne.nrm), 6) AS score
       |  FROM q
       |  JOIN buckets b ON b.bucket = q.qbucket
       |  JOIN embeddings e ON e.vec_id = b.vec_id
       |  JOIN embeddings qe ON qe.vec_id = q.qid
       |  JOIN nrm nq ON nq.vec_id = q.qid
       |  JOIN nrm ne ON ne.vec_id = e.vec_id
       |  WHERE e.vec_id <> q.qid),
       |ranked AS (
       |  SELECT qid, bucket, vec_id, score,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn
       |  FROM cand)
       |SELECT qid, bucket, vec_id, score, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin
  }

  /** DuckDB oracle for the IVF ANN: centroids are the same first
    * NumCells corpus vectors, cell assignment/probing the same
    * (dot desc, id asc) ranking — all re-derived relationally.
    */
  val qAnnIvfSql: String =
    s"""WITH cents AS (SELECT vec_id AS cid, embedding AS ce FROM embeddings WHERE vec_id < $NumCells),
       |dots AS (
       |  SELECT e.vec_id, c.cid,
       |         (SELECT SUM(CAST(e.embedding[i.i] AS DOUBLE) * CAST(c.ce[i.i] AS DOUBLE))
       |          FROM generate_series(1, $Dim) i(i)) AS dot
       |  FROM embeddings e CROSS JOIN cents c),
       |ranked_cells AS (
       |  SELECT vec_id, cid,
       |         row_number() OVER (PARTITION BY vec_id ORDER BY dot DESC, cid) AS cell_rn
       |  FROM dots),
       |assigned AS (SELECT vec_id, cid AS cell FROM ranked_cells WHERE cell_rn = 1),
       |nrm AS (
       |  SELECT vec_id, sqrt((SELECT SUM(CAST(embedding[i.i] AS DOUBLE) ** 2)
       |                       FROM generate_series(1, $Dim) i(i))) AS nrm
       |  FROM embeddings),
       |probes AS (
       |  SELECT vec_id AS qid, cid AS probe_cell FROM ranked_cells
       |  WHERE vec_id < $NumQueries AND cell_rn <= $NProbe),
       |cand AS (
       |  SELECT p.qid, a.cell, e.vec_id,
       |         round((SELECT SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(e.embedding[i.i] AS DOUBLE))
       |                FROM generate_series(1, $Dim) i(i)) / (nq.nrm * ne.nrm), 6) AS score
       |  FROM probes p
       |  JOIN assigned a ON a.cell = p.probe_cell
       |  JOIN embeddings e ON e.vec_id = a.vec_id
       |  JOIN embeddings q ON q.vec_id = p.qid
       |  JOIN nrm nq ON nq.vec_id = p.qid
       |  JOIN nrm ne ON ne.vec_id = e.vec_id
       |  WHERE e.vec_id <> p.qid),
       |ranked AS (
       |  SELECT qid, cell, vec_id, score,
       |         CAST(row_number() OVER (PARTITION BY qid ORDER BY score DESC, vec_id) AS BIGINT) AS rn
       |  FROM cand)
       |SELECT qid, cell, vec_id, score, rn FROM ranked WHERE rn <= $TopK
       |ORDER BY qid, rn""".stripMargin

  // ------------------------------------------------------------------
  // Int8 range quantization audit: per-vector (min, max) affine code
  // (the storage format that cuts a float32 embedding store 4×), with
  // the reconstruction MSE aggregated per label. All quantization math
  // is floor-based double arithmetic (floor is deterministic where
  // round-half could straddle engines), the per-vector MSE is an
  // in-index-order fold, and the per-label sum rides DECIMAL — so a
  // lossy-compression audit still hash-matches its oracle exactly.
  // ------------------------------------------------------------------
  val qEmbedQuantize: Q = (s, d) => {
    val xd = (c: Column) => c.cast("double")
    val e = Tables.embeddings(s, d)
      .select(col("label"), col("vec_id"), col("embedding"),
              xd(array_min(col("embedding"))).as("mn"),
              xd(array_max(col("embedding"))).as("mx"))
      .withColumn("scale", (col("mx") - col("mn")) / 255.0)
      .withColumn("mse", round(
        when(col("scale") === 0.0, 0.0).otherwise(
          aggregate(col("embedding"), lit(0.0), (acc, x) => {
            val err = xd(x) -
              (col("mn") + floor((xd(x) - col("mn")) / col("scale")) * col("scale"))
            acc + err * err
          }) / lit(Dim.toDouble)), 6))
    e.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
           sum(col("mse").cast("decimal(18,6)")).cast("double").as("sum_mse"),
           round(max(col("mx") - col("mn")), 6).as("max_range"))
      .orderBy(col("label"))
  }

  val qEmbedQuantizeSql: String = {
    val x = "CAST(s.embedding[i.i] AS DOUBLE)"
    val recon = s"(s.mn + floor(($x - s.mn) / s.scale) * s.scale)"
    s"""WITH per AS (
       |  SELECT label, vec_id, embedding,
       |         CAST(list_min(embedding) AS DOUBLE) AS mn,
       |         CAST(list_max(embedding) AS DOUBLE) AS mx
       |  FROM embeddings),
       |sc AS (SELECT *, (mx - mn) / 255.0 AS scale FROM per),
       |m AS (
       |  SELECT label, mx - mn AS range,
       |         round(CASE WHEN scale = 0 THEN 0.0 ELSE
       |           (SELECT SUM(($x - $recon) * ($x - $recon))
       |            FROM generate_series(1, $Dim) i(i)) / $Dim.0 END, 6) AS mse
       |  FROM sc s)
       |SELECT label, count(*) AS n_vecs,
       |       CAST(SUM(CAST(mse AS DECIMAL(18,6))) AS DOUBLE) AS sum_mse,
       |       round(max(range), 6) AS max_range
       |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_similarity_topk" -> qSimilarityTopk,
    "q_ann_lsh"         -> qAnnLsh,
    "q_ann_ivf"         -> qAnnIvf,
    "q_embed_quantize"  -> qEmbedQuantize,
  )

  val oracles: Map[String, String] = Map(
    "q_similarity_topk" -> qSimilarityTopkSql,
    "q_ann_lsh"         -> qAnnLshSql,
    "q_ann_ivf"         -> qAnnIvfSql,
    "q_embed_quantize"  -> qEmbedQuantizeSql,
  )
}
