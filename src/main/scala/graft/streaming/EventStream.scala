package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming face of the engine: the same hourly windowed
  * aggregation as ext.Sessions.qEventWindow, expressed as readStream →
  * watermark → window agg → writeStream, so the batch and streaming
  * planes share semantics (SURVEY §2.8 marks streaming absent in the
  * reference; this is the forward-looking capability the events table
  * exists for).
  *
  * The events parquet stores ts as TIMESTAMP(NANOS) (see Tables.events);
  * streaming sources need an explicit schema, so ts comes in as LongType
  * nanos (legacy conf) and converts with integer division.
  */
object EventStream {

  val eventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType), // TIMESTAMP(NANOS) read as nanos-since-epoch
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming hourly windowed aggregation with a 1-hour watermark — the
    * aggregation itself is graft.ext.Sessions.hourlyAggTransform, shared
    * with the batch operator so the planes agree by construction.
    */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val src = spark.readStream
      .schema(eventsSchema)
      // FileStreamSource requires a directory path; select just the
      // events file(s) from the sf dir with a glob filter.
      .option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
      .withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      .withWatermark("ts", "1 hour")
    graft.ext.Sessions.hourlyAggTransform(src)
  }

  /** Drive the streaming query synchronously over the (static) parquet
    * dir via a memory sink; returns the materialized result. Used by the
    * spec to prove streaming/batch parity.
    */
  def runOnce(spark: SparkSession, dir: String, name: String = "graft_stream")
      : DataFrame = {
    val q = hourlyAgg(spark, dir).writeStream
      .outputMode("complete")
      .format("memory")
      .queryName(name)
      .start()
    try q.processAllAvailable()
    finally q.stop()
    spark.table(name)
  }
}
