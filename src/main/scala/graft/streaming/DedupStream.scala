package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming deduplication — the streaming face of the engine's dedup
  * family (ext.Dedup): suppress all but the first event per
  * (user_id, event_type) key using watermark-bounded state.
  *
  * dropDuplicatesWithinWatermark keeps per-key state only until the
  * watermark passes it, so state is O(keys active within the watermark
  * horizon), not O(all keys ever) — the property that makes streaming
  * dedup viable on an unbounded 100 TB/day event feed. Emission is
  * append-mode: a kept (first-seen) row flows through immediately;
  * later duplicates inside the horizon are dropped.
  *
  * Parity with batch: which PHYSICAL row survives per key depends on
  * arrival order (same as any first-wins dedup), so the pinned
  * invariants are the key set and count — the streaming output carries
  * exactly the batch-distinct key set (StreamingSpec).
  */
object DedupStream {

  def dedup(spark: SparkSession, dir: String): DataFrame = {
    EventStream.readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("user_id", "event_type")
  }

  /** Drive synchronously over a static events dir via a memory sink. */
  def runOnce(spark: SparkSession, dir: String,
              name: String = "graft_dedup_stream"): DataFrame = {
    val q = dedup(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
