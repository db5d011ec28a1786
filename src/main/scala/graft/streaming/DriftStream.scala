package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming drift monitor — the stateful streaming face of
  * ext.Sessions.qEwmaDaily: per event type, accumulate the daily value
  * series in keyed state as events arrive (any order, any batching) and,
  * when the watermark closes the series, emit the identical renormalized
  * EwmaN-term half-life EWMA rows the batch operator computes. The
  * monitoring smoother as a LIVE surface: the same state pattern runs
  * unbounded with a sliding retention horizon; the finite-source drive
  * here flushes once so the batch twin can pin equality exactly.
  *
  * Exactness discipline: per-event values snap to integer CENTS through
  * the same DECIMAL(18,2) cast as the batch aggregate (so the state sum
  * is the batch daily sum's unscaled value exactly); the EWMA itself
  * re-runs the batch operator's left-associated power-of-two chain over
  * the day-ordered series — bit-identical doubles.
  *
  * Scale: state per key is the type's OBSERVED-day map (calendar-
  * bounded, like every daily-series operator in the repo), not events;
  * a production deployment would age out days beyond the EWMA horizon
  * on each flush.
  */
object DriftStream {

  case class Ev(event_type: String, ts: java.sql.Timestamp, day: String,
                cents: Long)
  case class SeriesState(days: Map[String, Long])
  case class EwmaRow(event_type: String, day: java.sql.Date,
                     value_sum: Double, ewma: Double)

  /** The batch operator's renormalized window EWMA over a day-ordered
    * cents series — factored so the spec can also drive it directly.
    */
  private[graft] def ewmaRows(
      eventType: String, series: Seq[(String, Long)]): Seq[EwmaRow] = {
    val ordered = series.sortBy(_._1)
    val sums = ordered.map(_._2.toDouble / 100.0)
    ordered.indices.map { i =>
      val lags = (0 until graft.ext.Sessions.EwmaN)
        .map(k => if (i - k >= 0) Some(sums(i - k)) else None)
      val num = lags.zipWithIndex.foldLeft(0.0) {
        case (acc, (Some(x), k)) => acc + x * math.pow(0.5, k)
        case (acc, (None, _))    => acc
      }
      val den = lags.zipWithIndex.foldLeft(0.0) {
        case (acc, (Some(_), k)) => acc + math.pow(0.5, k)
        case (acc, (None, _))    => acc
      }
      EwmaRow(eventType, java.sql.Date.valueOf(ordered(i)._1), sums(i),
              num / den)
    }
  }

  private def flatMapFn(
      key: String, it: Iterator[Ev], state: GroupState[SeriesState])
      : Iterator[EwmaRow] = {
    val prev = state.getOption.map(_.days).getOrElse(Map.empty)
    val evs = it.toSeq
    if (evs.isEmpty && state.hasTimedOut) {
      val out = ewmaRows(key, prev.toSeq)
      state.remove()
      out.iterator
    } else {
      val next = evs.foldLeft(prev) { (m, e) =>
        m.updated(e.day, m.getOrElse(e.day, 0L) + e.cents)
      }
      state.update(SeriesState(next))
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
      Iterator.empty
    }
  }

  /** Build the streaming EWMA over a static events dir. */
  def ewmaDaily(spark: SparkSession, dir: String): Dataset[EwmaRow] = {
    import spark.implicits._
    EventStream.readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("event_type"), col("ts"),
              date_format(to_date(col("ts")), "yyyy-MM-dd").as("day"),
              (col("value").cast("decimal(18,2)") * 100).cast("long")
                .as("cents"))
      .as[Ev]
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Append,
                              GroupStateTimeout.EventTimeTimeout)(flatMapFn)
  }

  /** Drive synchronously over a static events dir via a memory sink —
    * the SessionStream sentinel-nudge harness verbatim: a far-future
    * event advances the watermark so every real key's timeout fires and
    * flushes its series.
    */
  def runOverStaticDir(spark: SparkSession, srcDir: String,
                       name: String = "graft_drift"): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_drift").toString
    Files.copy(Paths.get(s"$srcDir/events.parquet"),
               Paths.get(s"$tmp/events.parquet"),
               StandardCopyOption.REPLACE_EXISTING)
    val q = ewmaDaily(spark, tmp).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      val staging = s"$tmp/__staging"
      val tsOnDisk = spark.read.parquet(s"$tmp/events.parquet")
        .schema("ts").dataType
      val base = Seq((-1L, -1L, "zz_sentinel", 0.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
      val sentinel = tsOnDisk match {
        case org.apache.spark.sql.types.LongType =>
          base.withColumn("ts", lit(4102444800000000000L)) // 2100-01-01 ns
        case _ =>
          base.withColumn("ts", expr("timestamp_ntz'2100-01-01 00:00:00'"))
      }
      sentinel
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
        .coalesce(1).write.parquet(staging)
      val part = Files.list(Paths.get(staging)).toArray
        .map(_.toString).filter(_.endsWith(".parquet")).head
      Files.move(Paths.get(part), Paths.get(s"$tmp/events_zz_sentinel.parquet"))
      q.processAllAvailable()
    } finally q.stop()
    spark.table(name).filter(col("event_type") =!= "zz_sentinel")
  }
}
