package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming heavy-hitter candidates: the native Misra–Gries summary
  * (graftshim.MisraGriesAgg) running inside a watermarked windowed
  * streaming aggregation. TypedImperativeAggregates merge partial
  * states, which is exactly what a streaming aggregation's state-store
  * update is — so the O(k) sketch works unchanged in the streaming
  * plane, giving per-hour candidate sets whose superset guarantee
  * (true freq > n/(k+1) ⟹ present) holds per window.
  *
  * The batch twin is the identical transform over the static read; the
  * spec pins stream == batch. (The reference, SURVEY §2.8, is
  * batch-only — this is the engine's forward-looking surface.)
  */
object SketchStream {

  val K = 8

  /** Per-hour Misra–Gries candidate summary over event_type. */
  def hourlyHeavyHitters(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.graftshim.{MisraGriesAgg, Shim}
    val mg = Shim.column(
      MisraGriesAgg(Shim.expression(col("event_type")), K)
        .toAggregateExpression())
    events
      .groupBy(window(col("ts"), "1 hour"))
      .agg(mg.as("mg"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH:mm:ss").as("bucket"),
              col("mg.n_total").as("n_total"),
              // candidate items only (counter values are order-dependent
              // in any MG sketch; the guarantee is about membership)
              array_join(transform(col("mg.candidates"),
                x => x.getField("item")), ",").as("candidates"))
  }

  def streaming(spark: SparkSession, dir: String): DataFrame = {
    val src = EventStream.readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
    hourlyHeavyHitters(src)
  }

  def batchTwin(spark: SparkSession, dir: String): DataFrame =
    hourlyHeavyHitters(graft.Tables.events(spark, dir))

  def runOnce(spark: SparkSession, dir: String,
              name: String = "graft_sketch_stream"): DataFrame = {
    val q = streaming(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
