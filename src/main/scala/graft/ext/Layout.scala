package graft.ext

import graft.Tables
import graft.ops.Ops
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Physical-layout and table-operations panel: the metadata-plane
  * operators a 100 TB lakehouse table actually runs between queries —
  * multi-dimensional clustering audits (Z-order), small-file compaction
  * planning, shuffle-skew diagnosis, and min/max-stats file skipping.
  *
  * The reference engine has no layout plane at all (its scans are flat
  * text directories, reference BootStrap.java:31); these operators are
  * the Spark-native capability that makes its workloads survive at
  * warehouse scale: every query here runs over FILE/PARTITION METADATA
  * derived in one scan — the outputs are O(files) or O(partitions)
  * rows, never O(data) — which is exactly why the same plans hold at
  * 1000 executors: the data-sized stage is a single map-side projection
  * feeding a few-hundred-group partial aggregate.
  *
  * Exactness discipline (the repo-wide rule): every emitted integer is
  * an exact BIGINT on both engines; every emitted double is one IEEE
  * division of identical BIGINTs; the Z-value is pure integer bit
  * arithmetic generated from the SAME constants on both sides.
  */
object Layout {
  type Q = (SparkSession, String) => DataFrame

  // ------------------------------------------------------------------
  // q_zorder_layout — Z-order (Morton) clustering audit over the two
  // lineitem join dimensions (part, supplier). Rows are assigned to
  // files two ways from the same scan:
  //   zorder: file = interleave(pk_bucket, sk_bucket) div 1024
  //   linear: file = pk_bucket div 4   (single-dimension clustering)
  // and the audit emits per-file min/max bucket ranges for BOTH
  // dimensions. Reading the result: under `linear`, pk ranges are
  // width-4 (perfect skipping on pk) but sk ranges span the full
  // domain (zero skipping on sk); under `zorder` both dimensions have
  // width ~1/8 of the domain — the standard data-skipping trade that
  // makes point/range predicates on EITHER column prune ~7/8 of files.
  //
  // Scale shape: bucket + interleave + file-id are map-side integer
  // expressions on the scan; the two layouts ride one explode (×2 rows,
  // still map-side) into a single 128-group partial aggregate. At
  // 100 TB the write path would be repartitionByRange(z) — the audit
  // itself never moves data, only (layout, file, pk_b, sk_b) int rows.
  // ------------------------------------------------------------------
  val ZBits = 8           // 8+8-bit interleave → z ∈ [0, 65535]
  val ZFileShift = 1024L  // 64 z-files
  val LinFileDiv = 4L     // 64 linear files over pk_b ∈ [0,255]

  /** Morton interleave of two ZBits-bit non-negative ints: a's bit i →
    * z bit 2i+1, b's bit i → z bit 2i. Disjoint targets, so OR == sum.
    */
  def zInterleave(a: Column, b: Column): Column =
    (0 until ZBits).map { i =>
      shiftleft(shiftrightunsigned(a, i).bitwiseAND(lit(1)), 2 * i + 1) +
        shiftleft(shiftrightunsigned(b, i).bitwiseAND(lit(1)), 2 * i)
    }.reduce(_ + _)

  /** The same interleave as portable SQL over non-negative ints. */
  def zInterleaveSql(a: String, b: String): String =
    (0 until ZBits).map { i =>
      s"((($a // ${1L << i}) % 2) * ${1L << (2 * i + 1)} + " +
        s"(($b // ${1L << i}) % 2) * ${1L << (2 * i)})"
    }.mkString("(", " + ", ")")

  val qZorderLayout: Q = (s, d) => zorderLayout(
    Tables.lineitem(s, d).select(
      pmod(col("l_partkey"), lit(256)).cast("int").as("pk_b"),
      pmod(col("l_suppkey"), lit(256)).cast("int").as("sk_b")))

  /** Core of q_zorder_layout over any (pk_b, sk_b) bucket frame. */
  def zorderLayout(buckets: DataFrame): DataFrame = {
    val z = zInterleave(col("pk_b"), col("sk_b")).cast("bigint")
    buckets
      .select(col("pk_b").cast("bigint").as("pk_b"),
              col("sk_b").cast("bigint").as("sk_b"),
              (z / ZFileShift).cast("bigint").as("zfile"),
              (col("pk_b").cast("bigint") / LinFileDiv).cast("bigint").as("lfile"))
      .select(explode(array(
                struct(lit("zorder").as("layout"), col("zfile").as("file_id")),
                struct(lit("linear").as("layout"), col("lfile").as("file_id"))))
                .as("lf"),
              col("pk_b"), col("sk_b"))
      .select(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"),
              col("pk_b"), col("sk_b"))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
           min(col("pk_b")).as("pkb_min"), max(col("pk_b")).as("pkb_max"),
           min(col("sk_b")).as("skb_min"), max(col("sk_b")).as("skb_max"))
      .withColumn("pk_span", col("pkb_max") - col("pkb_min") + lit(1L))
      .withColumn("sk_span", col("skb_max") - col("skb_min") + lit(1L))
      .orderBy(col("layout"), col("file_id"))
  }

  val qZorderLayoutSql: String = {
    val z = zInterleaveSql("pk_b", "sk_b")
    s"""WITH b AS (
       |  SELECT CAST(l_partkey % 256 AS BIGINT) AS pk_b,
       |         CAST(l_suppkey % 256 AS BIGINT) AS sk_b
       |  FROM lineitem),
       |f AS (
       |  SELECT pk_b, sk_b,
       |         CAST($z // $ZFileShift AS BIGINT) AS zfile,
       |         CAST(pk_b // $LinFileDiv AS BIGINT) AS lfile
       |  FROM b),
       |layouts AS (
       |  SELECT 'zorder' AS layout, zfile AS file_id, pk_b, sk_b FROM f
       |  UNION ALL
       |  SELECT 'linear' AS layout, lfile AS file_id, pk_b, sk_b FROM f)
       |SELECT layout, file_id, CAST(count(*) AS BIGINT) AS n_rows,
       |       min(pk_b) AS pkb_min, max(pk_b) AS pkb_max,
       |       min(sk_b) AS skb_min, max(sk_b) AS skb_max,
       |       max(pk_b) - min(pk_b) + 1 AS pk_span,
       |       max(sk_b) - min(sk_b) + 1 AS sk_span
       |FROM layouts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ------------------------------------------------------------------
  // q_compaction_plan — small-file compaction planning (the OPTIMIZE /
  // rewrite-manifest step every lakehouse table needs once streaming
  // or per-batch writes fragment it). "Files" are simulated from the
  // documents table as (source, doc_id div DocsPerFile) groups with
  // byte mass Σ n_chars; the planner assigns files to compaction bins
  // per source by NEXT-FIT over the file sequence: a bin is the
  // TargetBytes-sized window of the source's cumulative byte stream,
  // bin = floor(bytes_before_this_file / TargetBytes) — a file
  // straddling a boundary stays in the earlier bin (bins may overflow
  // by at most one file, the standard streaming-compaction contract;
  // no file is ever split).
  //
  // Scale shape: one (source, file)-group partial agg builds the
  // manifest — O(files) rows, metadata-plane from then on; the binning
  // is ONE cumulative-sum window partitioned by source (each source's
  // manifest sorts independently — the hot-source worst case is one
  // partition sorting its own file list, never document data).
  // ------------------------------------------------------------------
  val DocsPerFile = 10L
  val TargetBytes = 4000L

  val qCompactionPlan: Q = (s, d) => compactionPlan(
    Tables.documents(s, d).select(col("source"), col("doc_id"), col("n_chars")))

  /** Core of q_compaction_plan over any (source, doc_id, n_chars) frame. */
  def compactionPlan(docs: DataFrame): DataFrame =
    binManifest(
      docs.groupBy(col("source"),
                   expr(s"CAST(doc_id AS BIGINT) div $DocsPerFile")
                     .as("file_idx"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes")))

  /** Next-fit binning over a (source, file_idx, n_docs, bytes) manifest
    * — factored so the streaming small-file monitor (CompactionStream)
    * can bin its incrementally-accumulated manifest with the identical
    * code path (bins are a VIEW of the manifest: arriving files extend
    * it but never reorder it, so re-deriving per flush is exact).
    */
  def binManifest(manifest: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source")).orderBy(col("file_idx").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    manifest
      .withColumn("cum", sum(col("bytes")).over(w))
      // integer div, not double-divide-then-cast: exact at any byte
      // magnitude (IEEE rounding could misplace a bin boundary past 2^53)
      .withColumn("bin", expr(s"(cum - bytes) div $TargetBytes"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("n_docs")).as("n_docs"),
           sum(col("bytes")).as("total_bytes"),
           min(col("file_idx")).as("first_file"),
           max(col("file_idx")).as("last_file"))
      .orderBy(col("source"), col("bin"))
  }

  val qCompactionPlanSql: String =
    s"""WITH manifest AS (
       |  SELECT source, CAST(doc_id // $DocsPerFile AS BIGINT) AS file_idx,
       |         CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_chars) AS BIGINT) AS bytes
       |  FROM documents GROUP BY 1, 2),
       |cum AS (
       |  SELECT source, file_idx, n_docs, bytes,
       |         SUM(bytes) OVER (PARTITION BY source ORDER BY file_idx ASC
       |                          ROWS BETWEEN UNBOUNDED PRECEDING
       |                          AND CURRENT ROW) AS cum
       |  FROM manifest),
       |binned AS (
       |  SELECT source, file_idx, n_docs, bytes,
       |         CAST((cum - bytes) // $TargetBytes AS BIGINT) AS bin
       |  FROM cum)
       |SELECT source, bin, CAST(count(*) AS BIGINT) AS n_files,
       |       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       |       CAST(sum(bytes) AS BIGINT) AS total_bytes,
       |       min(file_idx) AS first_file, max(file_idx) AS last_file
       |FROM binned GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // q_skew_diagnose — hash-shuffle load forecast for a join/groupBy
  // key: given the key histogram of events.user_id, compute the
  // per-reducer load a P-partition hash exchange would see (partition
  // = portable 60-bit md5 of the key mod P — the md5Bits60 family, so
  // DuckDB derives the identical placement), plus each reducer's
  // heaviest key and its share of total rows. The operational read:
  // max(load_share)·P is the straggler factor; a heavy_key_rows close
  // to n_rows says salting that ONE key beats repartitioning.
  //
  // Scale shape: the only data-sized stage is the key-histogram
  // partial agg (map-side combine on the natural key); everything
  // after runs on O(distinct keys) rows, and the emitted report is P
  // rows. The heavy-key attribution joins the key table to the P-row
  // per-partition maxima — a broadcast join at any scale.
  // ------------------------------------------------------------------
  val SkewParts = 32

  val qSkewDiagnose: Q = (s, d) => skewDiagnose(
    Tables.events(s, d).select(col("user_id").as("key")))

  /** Core of q_skew_diagnose over any single-column (key) frame. */
  def skewDiagnose(rows: DataFrame): DataFrame = {
    val hist = rows.groupBy(col("key")).agg(count(lit(1)).as("n"))
      .withColumn("p",
        pmod(Ops.md5Bits60(concat(col("key").cast("string"), lit(":skew"))),
             lit(SkewParts.toLong)).cast("bigint"))
    val perPart = hist.groupBy(col("p"))
      .agg(count(lit(1)).as("n_keys"), sum(col("n")).as("n_rows"),
           max(col("n")).as("heavy_key_rows"))
    val heavy = hist.join(
        perPart.select(col("p"), col("heavy_key_rows").as("hn")), Seq("p"))
      .filter(col("n") === col("hn"))
      .groupBy(col("p")).agg(min(col("key")).as("heavy_key"))
    val total = perPart.agg(sum(col("n_rows")).as("n_total"))
    perPart.join(heavy, Seq("p")).crossJoin(total)
      .select(col("p").as("part"), col("n_keys"), col("n_rows"),
              col("heavy_key_rows"), col("heavy_key"),
              (col("n_rows").cast("double") / col("n_total").cast("double"))
                .as("load_share"))
      .orderBy(col("part"))
  }

  val qSkewDiagnoseSql: String =
    s"""WITH hist AS (
       |  SELECT user_id AS key, CAST(count(*) AS BIGINT) AS n
       |  FROM events GROUP BY 1),
       |placed AS (
       |  SELECT key, n,
       |         ('0x' || substr(md5(CAST(key AS VARCHAR) || ':skew'),
       |                         1, 15))::BIGINT % $SkewParts AS p
       |  FROM hist),
       |per_part AS (
       |  SELECT p, CAST(count(*) AS BIGINT) AS n_keys,
       |         CAST(sum(n) AS BIGINT) AS n_rows,
       |         CAST(max(n) AS BIGINT) AS heavy_key_rows
       |  FROM placed GROUP BY 1),
       |heavy AS (
       |  SELECT pl.p, min(pl.key) AS heavy_key
       |  FROM placed pl JOIN per_part pp
       |    ON pl.p = pp.p AND pl.n = pp.heavy_key_rows
       |  GROUP BY 1),
       |total AS (SELECT CAST(sum(n_rows) AS BIGINT) AS n_total FROM per_part)
       |SELECT pp.p AS part, pp.n_keys, pp.n_rows, pp.heavy_key_rows,
       |       h.heavy_key,
       |       CAST(pp.n_rows AS DOUBLE) / CAST(t.n_total AS DOUBLE)
       |         AS load_share
       |FROM per_part pp JOIN heavy h ON pp.p = h.p CROSS JOIN total t
       |ORDER BY 1""".stripMargin

  // ------------------------------------------------------------------
  // q_file_skipping — min/max-stats pruning audit (the parquet
  // footer / Delta-stats / Iceberg-manifest skipping model) for a
  // date-range probe over lineitem, contrasting two write orders from
  // one scan:
  //   arrival: file = l_orderkey div ArrivalRows  (insertion order)
  //   sorted:  file = ship_day div SortedDaysPerFile (date-clustered)
  // Each file carries (day_min, day_max); a file is `skippable` for
  // the probe window iff its stats window misses [ProbeLo, ProbeHi].
  // On TPC-H-shaped data arrival order decorrelates orderkey from
  // shipdate, so EVERY arrival file spans the full date range and
  // nothing skips — the audit's honest negative result, and the
  // quantified case for maintaining a date-sorted (or q_zorder_layout)
  // rewrite: sorted files skip all but the probe's ~⌈92/64⌉+1 files.
  //
  // Days are exact integers (datediff from epoch on a DATE cast — no
  // timezone arithmetic), so every emitted column is exact BIGINT.
  // Scale shape: identical to q_zorder_layout — map-side day/file
  // ids, one ×2 explode, one O(files)-group partial agg.
  // ------------------------------------------------------------------
  val ArrivalRows = 1024L       // orderkeys per arrival file
  val SortedDaysPerFile = 64L   // days per sorted file
  val ProbeLoDay = 9312L        // 1995-07-01
  val ProbeHiDay = 9403L        // 1995-09-30

  val qFileSkipping: Q = (s, d) => fileSkipping(
    Tables.lineitem(s, d).select(
      col("l_orderkey").cast("bigint").as("okey"),
      datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date"))
        .cast("bigint").as("day")))

  /** Core of q_file_skipping over any (okey, day) frame. */
  def fileSkipping(rows: DataFrame): DataFrame =
    rows
      .select(expr(s"okey div $ArrivalRows").as("afile"),
              expr(s"day div $SortedDaysPerFile").as("sfile"),
              col("day"))
      .select(explode(array(
                struct(lit("arrival").as("layout"), col("afile").as("file_id")),
                struct(lit("sorted").as("layout"), col("sfile").as("file_id"))))
                .as("lf"),
              col("day"))
      .select(col("lf.layout").as("layout"), col("lf.file_id").as("file_id"),
              col("day"))
      .groupBy(col("layout"), col("file_id"))
      .agg(count(lit(1)).as("n_rows"),
           min(col("day")).as("day_min"), max(col("day")).as("day_max"))
      .withColumn("skippable",
        when(col("day_max") < ProbeLoDay || col("day_min") > ProbeHiDay, 1L)
          .otherwise(0L))
      .orderBy(col("layout"), col("file_id"))

  val qFileSkippingSql: String =
    s"""WITH rows_ AS (
       |  SELECT CAST(l_orderkey AS BIGINT) AS okey,
       |         CAST(date_diff('day', DATE '1970-01-01',
       |                        CAST(l_shipdate AS DATE)) AS BIGINT) AS day
       |  FROM lineitem),
       |f AS (
       |  SELECT CAST(okey // $ArrivalRows AS BIGINT) AS afile,
       |         CAST(day // $SortedDaysPerFile AS BIGINT) AS sfile, day
       |  FROM rows_),
       |layouts AS (
       |  SELECT 'arrival' AS layout, afile AS file_id, day FROM f
       |  UNION ALL
       |  SELECT 'sorted' AS layout, sfile AS file_id, day FROM f)
       |SELECT layout, file_id, CAST(count(*) AS BIGINT) AS n_rows,
       |       min(day) AS day_min, max(day) AS day_max,
       |       CAST(CASE WHEN max(day) < $ProbeLoDay
       |                   OR min(day) > $ProbeHiDay
       |                 THEN 1 ELSE 0 END AS BIGINT) AS skippable
       |FROM layouts GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ------------------------------------------------------------------
  // q_snapshot_diff — manifest diff between two table snapshots (the
  // Iceberg/Delta snapshot-compare primitive behind incremental
  // processing, CDC planning, and time travel audits). Two snapshots
  // of the documents table are simulated by deterministic hash
  // membership under two different salts, at BOTH granularities so
  // every diff status occurs: each side drops ~1/20 of whole FILES
  // (→ added / removed rows) and ~1/40 of individual DOCS (→ changed
  // rows, since the surviving file's fingerprint shifts); each
  // snapshot's manifest is (file, n_docs, content_fingerprint) — file
  // = doc_id div DocsPerFile, the ingestion-order file key (source is
  // NOT part of the key: a manifest is file-keyed, and sf docs are not
  // source-clustered, so a source-qualified key would degenerate to
  // ~1-doc files where 'changed' can never occur) — where the
  // fingerprint is the SUM of per-doc reduced digests — an
  // order- and partitioning-insensitive aggregate,
  // so it is reproducible under any parallelism and any row order on
  // both engines. The diff FULL-OUTER-joins the manifests on the file
  // key and classifies: added (B only), removed (A only), changed
  // (fingerprint differs), unchanged.
  //
  // Scale shape: each manifest is one partial agg over a slim
  // (source, file, digest) projection; the diff join runs on O(files)
  // rows — metadata-plane. In a real lakehouse both manifests come
  // from the table log and the scans vanish entirely; the shape here
  // is the fallback for tables without a transaction log.
  // ------------------------------------------------------------------
  val SnapFileDropMod = 20L // each snapshot drops ~1/20 of whole files
  val SnapDocDropMod = 40L  // …and ~1/40 of surviving files' docs

  val qSnapshotDiff: Q = (s, d) => snapshotDiff(
    Tables.documents(s, d).select(col("source"), col("doc_id"), col("n_chars")))

  /** Core of q_snapshot_diff over any (source, doc_id, n_chars) frame. */
  def snapshotDiff(docs: DataFrame): DataFrame = {
    def manifest(salt: String, excl: Long): DataFrame =
      docs
        .withColumn("file_idx",
          (col("doc_id").cast("bigint") / DocsPerFile).cast("bigint"))
        .filter(
          pmod(Ops.md5Bits60(concat(col("file_idx").cast("string"),
                 lit(salt), lit(":f"))),
               lit(SnapFileDropMod)) =!= excl &&
          pmod(Ops.md5Bits60(concat(col("doc_id").cast("string"), lit(salt))),
               lit(SnapDocDropMod)) =!= excl)
        .groupBy(col("file_idx"))
        // digest % HashModP before the sum: raw 60-bit digests would
        // overflow BIGINT after ~8 docs (Spark wraps, DuckDB promotes
        // to HUGEINT — divergent); reduced digests sum exactly in both.
        .agg(count(lit(1)).as("n_docs"),
             sum(Ops.md5Bits60(concat(col("doc_id").cast("string"), lit(":"),
                                      col("n_chars").cast("string")))
                   % Ops.HashModP)
               .as("fp"))
    val a = manifest(":snapA", 0L).withColumnRenamed("n_docs", "n_docs_a")
      .withColumnRenamed("fp", "fp_a")
    val b = manifest(":snapB", 1L).withColumnRenamed("n_docs", "n_docs_b")
      .withColumnRenamed("fp", "fp_b")
    a.join(b, Seq("file_idx"), "full_outer")
      .withColumn("status",
        when(col("fp_a").isNull, lit("added"))
          .when(col("fp_b").isNull, lit("removed"))
          .when(col("fp_a") === col("fp_b"), lit("unchanged"))
          .otherwise(lit("changed")))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_files"),
           sum(coalesce(col("n_docs_b"), lit(0L))).as("n_docs_after"))
      .orderBy(col("status"))
  }

  val qSnapshotDiffSql: String = {
    def manifest(salt: String, excl: Long): String =
      s"""SELECT file_idx,
         |         CAST(count(*) AS BIGINT) AS n_docs,
         |         CAST(sum(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
         |                     CAST(n_chars AS VARCHAR)), 1, 15))::BIGINT
         |                  % ${Ops.HashModP}) AS BIGINT) AS fp
         |  FROM (SELECT *, CAST(doc_id // $DocsPerFile AS BIGINT) AS file_idx
         |        FROM documents)
         |  WHERE ('0x' || substr(md5(CAST(file_idx AS VARCHAR) ||
         |            '$salt' || ':f'),
         |          1, 15))::BIGINT % $SnapFileDropMod <> $excl
         |    AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '$salt'),
         |                        1, 15))::BIGINT % $SnapDocDropMod <> $excl
         |  GROUP BY 1""".stripMargin
    s"""WITH a AS (
       |  ${manifest(":snapA", 0L)}),
       |b AS (
       |  ${manifest(":snapB", 1L)}),
       |diff AS (
       |  SELECT CASE WHEN a.fp IS NULL THEN 'added'
       |              WHEN b.fp IS NULL THEN 'removed'
       |              WHEN a.fp = b.fp THEN 'unchanged'
       |              ELSE 'changed' END AS status,
       |         COALESCE(b.n_docs, 0) AS n_docs_b
       |  FROM a FULL OUTER JOIN b
       |    ON a.file_idx = b.file_idx)
       |SELECT status, CAST(count(*) AS BIGINT) AS n_files,
       |       CAST(sum(n_docs_b) AS BIGINT) AS n_docs_after
       |FROM diff GROUP BY 1 ORDER BY 1""".stripMargin
  }

  val queries: Map[String, Q] = Map(
    "q_zorder_layout"   -> qZorderLayout,
    "q_compaction_plan" -> qCompactionPlan,
    "q_skew_diagnose"   -> qSkewDiagnose,
    "q_file_skipping"   -> qFileSkipping,
    "q_snapshot_diff"   -> qSnapshotDiff,
  )
  val oracles: Map[String, String] = Map(
    "q_zorder_layout"   -> qZorderLayoutSql,
    "q_compaction_plan" -> qCompactionPlanSql,
    "q_skew_diagnose"   -> qSkewDiagnoseSql,
    "q_file_skipping"   -> qFileSkippingSql,
    "q_snapshot_diff"   -> qSnapshotDiffSql,
  )
}
