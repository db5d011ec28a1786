package graft.streaming

import graft.ext.Layout
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming small-file / compaction monitor — the incremental face of
  * ext.Layout.qCompactionPlan: as document micro-batches land, fold
  * their per-(source, file) byte stats into a durable MANIFEST ledger;
  * the compaction plan is re-derived from the accumulated manifest by
  * the batch operator's own binManifest, so the monitor's plan after
  * the stream drains equals the batch plan over the same corpus — for
  * ANY batching and ANY arrival order, because the manifest is a pure
  * additive aggregate (bytes and doc counts sum across batches; a file
  * split across batches merges on fold) and next-fit bins are a
  * deterministic function of the manifest alone.
  *
  * That invariance is the design point: unlike the order-canonicalizing
  * ingest twins (CorpusStream first-seen-wins), a compaction monitor
  * carries no per-row identity — only O(files) metadata — so the
  * streaming state is manifest-sized at any corpus scale, and the
  * per-flush binning runs on metadata, never documents. A production
  * deployment would trigger actual rewrite jobs for bins whose
  * total_bytes exceed the target; here the emitted plan IS the result.
  *
  * Ledger durability reuses the corpus-ingest discipline: plain append
  * of per-batch partial manifests (additive, so append order is
  * irrelevant); the read path folds duplicates of a (source, file)
  * key by summation, which also makes re-appends of a FAILED batch's
  * partial write self-healing only if the batch is not retried —
  * exactly-once here comes from the AvailableNow finite drive; an
  * unbounded deployment would stage-and-rename per batch id
  * (CorpusStream.scala:156-185's commit note applies verbatim).
  */
object CompactionStream {

  val manifestSchema: StructType = StructType(Seq(
    StructField("source", StringType),
    StructField("file_idx", LongType),
    StructField("n_docs", LongType),
    StructField("bytes", LongType)))

  /** One micro-batch's partial manifest: the batch operator's file
    * grouping, verbatim.
    */
  private[graft] def partialManifest(batch: DataFrame): DataFrame =
    batch.groupBy(col("source"),
                  (col("doc_id").cast("bigint") / Layout.DocsPerFile)
                    .cast("bigint").as("file_idx"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("bytes"))

  /** The accumulated manifest: append-file partials folded by key —
    * a file whose docs arrived across several batches merges here.
    * Explicit schema so a missing/empty ledger reads as empty.
    */
  private[graft] def foldedManifest(spark: SparkSession,
                                    ledgerDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(ledgerDir)
    val f = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw =
      if (f.exists(path)) spark.read.schema(manifestSchema).parquet(ledgerDir)
      else spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], manifestSchema)
    raw.groupBy(col("source"), col("file_idx"))
      .agg(sum(col("n_docs")).as("n_docs"), sum(col("bytes")).as("bytes"))
  }

  /** Current compaction plan as of the ledger's contents. */
  def plan(spark: SparkSession, ledgerDir: String): DataFrame =
    Layout.binManifest(foldedManifest(spark, ledgerDir))

  /** Drive the monitor over a static documents dir (AvailableNow) and
    * return the post-drain plan.
    */
  def runOnce(spark: SparkSession, srcDir: String, ledgerDir: String,
              name: String = "graft_compaction_monitor"): DataFrame = {
    val q = spark.readStream
      .schema(CorpusStream.docsSchema)
      .option("pathGlobFilter", "documents*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .queryName(name)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        partialManifest(batch).write.mode("append").parquet(ledgerDir); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    plan(spark, ledgerDir)
  }
}
