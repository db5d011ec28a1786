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
  * The events parquet's ts physical type has varied across harness data
  * generations — TIMESTAMP(NANOS) or TIMESTAMP(MICROS)-no-tz (see
  * Tables.events). Streaming sources need an explicit schema, so
  * `readEvents` probes the footers with a cheap batch read first and
  * builds the matching schema + normalization, landing every generation
  * on the same TimestampType `ts`.
  */
object EventStream {

  def eventsSchema(tsType: DataType = LongType): StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", tsType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Streaming read of `dir`'s events file(s) with `ts` normalized to
    * TimestampType, whatever the file generation stores. One footer-only
    * batch read resolves the physical type (driver-side, no data scan);
    * the streaming source then uses the matching explicit schema.
    */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val onDisk = spark.read.option("pathGlobFilter", "events*.parquet")
      .parquet(dir).schema("ts").dataType
    val raw = spark.readStream
      .schema(eventsSchema(onDisk))
      // FileStreamSource requires a directory path; select just the
      // events file(s) from the sf dir with a glob filter.
      .option("pathGlobFilter", "events*.parquet")
      .parquet(dir)
    onDisk match {
      case LongType => // TIMESTAMP(NANOS) as nanos-since-epoch: integer
        // floor-division to micros (see Tables.events for the pmod trick)
        raw.withColumn("ts", timestamp_micros(expr("(ts - pmod(ts, 1000)) div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case _ => raw
    }
  }

  /** Streaming hourly windowed aggregation with a 1-hour watermark — the
    * aggregation itself is graft.ext.Sessions.hourlyAggTransform, shared
    * with the batch operator so the planes agree by construction.
    */
  def hourlyAgg(spark: SparkSession, dir: String): DataFrame = {
    val src = readEvents(spark, dir).withWatermark("ts", "1 hour")
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
