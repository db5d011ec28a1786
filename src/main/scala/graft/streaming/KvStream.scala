package graft.streaming

import graft.sources.KvTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming ingest twin of the KV op-log (sources.KvTable, SURVEY §2.1
  * S10) — the write path a live deployment runs: op-record micro-batches
  * (key, value, seq, tombstone) land in the ledger's L0 tier as they
  * arrive (the memstore-flush shape — one token-named flush per batch,
  * no per-bucket fan-out; KvTable.compact owns bucketing), and the
  * table's view at any drain point is KvTable's latest-wins fold over
  * everything ingested so far.
  *
  * Batching-invariance (the house streaming design point): the fold is
  * max(struct(seq, tombstone, value)) per key — an order-free,
  * idempotent reduction — so the post-drain view equals the one-shot
  * batch ingest of the same ops for ANY batching and ANY arrival order,
  * exactly the invariance the corpus/paragraph/embedding twins pin for
  * their canonicalizing folds. No per-batch read-back is needed (unlike
  * CorpusStream's anti-join probe): KV writes stay blind appends, the
  * HBase-LSM property the batch module documents.
  *
  * Durability: each micro-batch commits under its DETERMINISTIC
  * batch-id token via the CompactionStream staging discipline — stage,
  * erase any prior commit of the same token (a retried batch replaces
  * itself), rename into L0 — and the stream keeps a real
  * checkpoint at `<ledger>.checkpoint`, so re-running runOnce over the
  * same source is a no-op. KvSpec pins: streamed view == batch-put
  * view, re-run unchanged, retried commit unchanged.
  */
object KvStream {

  /** Commit one micro-batch of op records under its batch-id token:
    * map-only staged write, same-token erase, rename into the L0 tier.
    * L0 gains the batch's files under `<token>-part-*` names — the
    * memstore-flush discipline of KvTable.append, idempotent per token
    * on top (a retried batch replaces its own prior flush).
    */
  private[graft] def commitOps(spark: SparkSession, ops: DataFrame,
                               dir: String, batchId: Long): Unit = {
    import org.apache.hadoop.fs.Path
    val token = f"batch-$batchId%08d"
    val stageDir = s"$dir.staging/$token"
    val f = new Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    ops.select(col("key").cast("string").as("key"),
               col("value").cast("string").as("value"),
               col("seq").cast("bigint").as("seq"),
               col("tombstone").cast("boolean").as("tombstone"))
      .write.mode("overwrite").parquet(stageDir)
    // Erase any prior commit of this token (retry idempotency), then
    // rename the staged part-files into the live L0 tier.
    val stage = new Path(stageDir)
    val l0 = new Path(s"$dir/l0")
    f.mkdirs(l0)
    f.listStatus(l0)
      .filter(_.getPath.getName.startsWith(token))
      .foreach(st => f.delete(st.getPath, false))
    f.listStatus(stage)
      .filter(_.getPath.getName.startsWith("part-"))
      .foreach { file =>
        val target = new Path(l0, s"$token-${file.getPath.getName}")
        require(f.rename(file.getPath, target),
          s"kv ledger commit rename failed: ${file.getPath} -> $target")
      }
    f.delete(stage, true)
  }

  /** Drive op-record parquet files (key, value, seq, tombstone) from a
    * static dir through the ledger (AvailableNow) and return the
    * post-drain latest-wins view. Idempotent: checkpointed source +
    * per-token commits.
    */
  def runOnce(spark: SparkSession, srcDir: String, ledgerDir: String,
              name: String = "graft_kv_ingest"): DataFrame = {
    val q = spark.readStream
      .schema(KvTable.opSchema)
      .option("pathGlobFilter", "ops*.parquet")
      .option("maxFilesPerTrigger", 1)
      .parquet(srcDir)
      .writeStream
      .queryName(name)
      .outputMode("update")
      .option("checkpointLocation", s"$ledgerDir.checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        commitOps(spark, batch, ledgerDir, batchId); ()
      }
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    KvTable.latestView(spark, ledgerDir)
  }
}
