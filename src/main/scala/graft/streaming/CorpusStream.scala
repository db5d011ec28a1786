package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming corpus INGEST — the curation pillar's streaming face: new
  * document files stream in, pass a stateless quality gate, and are
  * exact-deduplicated incrementally against the durable content-hash
  * history (the streaming form of ext.Dedup.qDedupIncremental).
  *
  * The dedup state deliberately lives in a PERSISTED history table
  * probed per micro-batch via LEFT ANTI join — not in streaming
  * operator state. Exact corpus dedup needs every hash ever seen, so
  * in-operator state would grow without bound and die with the
  * checkpoint; a history table scales with the corpus, survives
  * restarts, and is exactly what the daily batch pipeline
  * (q_dedup_incremental) already maintains — the two planes share one
  * ledger. Within a micro-batch, duplicates collapse to the min doc_id
  * (deterministic regardless of arrival order); ACROSS micro-batches
  * the ledger is first-seen-wins, exactly like the batch incremental
  * pipeline: a duplicate arriving in a later batch is dropped even if
  * its doc_id is smaller, so the canonical id reflects ingest order,
  * not the global minimum. (Global-min canonicalization over an
  * unbounded stream would mean rewriting history per batch.)
  *
  * The key operational property is IDEMPOTENT re-ingest: replaying the
  * same files adds zero rows, because every content hash already sits
  * in the history (pinned by spec).
  */
object CorpusStream {

  val docsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Quality gate: same shape as the rule funnel's pass band — bounded
    * token count. Stateless, so it rides the stream as a pure filter.
    */
  val MinToks = 10
  val MaxToks = 100000

  private def qualityGate(docs: DataFrame): DataFrame = {
    val nToks = size(split(col("text"), " "))
    docs.filter(nToks >= MinToks && nToks <= MaxToks)
  }

  private def historyOrEmpty(spark: SparkSession, historyDir: String): DataFrame = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(historyDir), spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(historyDir)))
      spark.read.parquet(historyDir)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(Seq(
          StructField("text_hash", StringType),
          StructField("canonical_id", LongType),
          StructField("lang", StringType),
          StructField("source", StringType))))
  }

  /** One micro-batch of ingest: gate → hash → collapse in-batch dups to
    * the min doc_id → drop hashes already in the history → append
    * survivors. Exposed for the spec; foreachBatch delegates here.
    */
  private[graft] def ingestBatch(batch: DataFrame, historyDir: String): Long = {
    val spark = batch.sparkSession
    val hashed = qualityGate(batch)
      .select(sha2(col("text"), 256).as("text_hash"), col("doc_id"),
              col("lang"), col("source"))
    val collapsed = hashed
      .groupBy(col("text_hash"))
      .agg(min_by(struct(col("doc_id"), col("lang"), col("source")),
                  col("doc_id")).as("c"))
      .select(col("text_hash"), col("c.doc_id").as("canonical_id"),
              col("c.lang").as("lang"), col("c.source").as("source"))
    val history = historyOrEmpty(spark, historyDir)
    val fresh = collapsed.join(
      history.select(col("text_hash")), Seq("text_hash"), "left_anti")
      .localCheckpoint(true) // snapshot BEFORE appending to the dir it reads
    val n = fresh.count()
    if (n > 0)
      fresh.write.mode(SaveMode.Append).parquet(historyDir)
    n
  }

  /** Drive the ingest over a static documents dir to completion
    * (AvailableNow), appending survivors to `historyDir`. Returns the
    * history as of completion.
    */
  def runOnce(spark: SparkSession, srcDir: String, historyDir: String,
              name: String = "graft_corpus_ingest"): DataFrame = {
    val q = spark.readStream
      .schema(docsSchema)
      .option("pathGlobFilter", "documents*.parquet")
      .parquet(srcDir)
      .writeStream
      .queryName(name)
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch, historyDir); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // historyOrEmpty, not a bare read: if every document failed the
    // quality gate (or no files matched), no batch ever wrote and the
    // dir does not exist — an empty ledger, not an error.
    historyOrEmpty(spark, historyDir)
  }
}
