package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stream-stream interval join — the last streaming shape in the
  * engine's surface (windowed agg, stateful sessions, dedup, join):
  * each purchase event joins the same user's click events from the
  * preceding hour, the streaming form of the batch lookback range join
  * (jobs.AnalyticsQueries.qRangeJoin).
  *
  * Both sides carry watermarks and the join condition bounds click time
  * to [purchase − 1h, purchase], so Spark can expire join state as the
  * watermark advances — without the time bound, stream-stream join
  * state grows forever; with it, state is O(events in the horizon),
  * which is what survives an unbounded feed.
  */
object JoinStream {

  private def side(spark: SparkSession, dir: String, eventType: String)
      : DataFrame = {
    EventStream.readEvents(spark, dir)
      .filter(col("event_type") === eventType)
  }

  def clicksBeforePurchase(spark: SparkSession, dir: String): DataFrame = {
    val clicks = side(spark, dir, "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"),
              col("event_id").as("click_id"))
      .withWatermark("c_ts", "1 hour")
    val purchases = side(spark, dir, "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"),
              col("event_id").as("purchase_id"))
      .withWatermark("p_ts", "1 hour")
    purchases.join(
      clicks,
      col("p_user") === col("c_user") &&
        col("c_ts") <= col("p_ts") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
  }

  /** Drive synchronously over a static events dir via a memory sink. */
  def runOnce(spark: SparkSession, dir: String,
              name: String = "graft_join_stream"): DataFrame = {
    val q = clicksBeforePurchase(spark, dir).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
