package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization — the custom-state streaming face of
  * ext.Sessions.qSessionize (30-minute inactivity gap), built on
  * KeyValueGroupedDataset.flatMapGroupsWithState with event-time timeout.
  *
  * State per user: the set of open sessions' (start, end, count). On
  * watermark expiry the state flushes closed sessions downstream. The
  * batch and streaming planes share the same gap constant so their
  * results are comparable (pinned by StreamingSpec over a static dir:
  * processAllAvailable + final timeout flush ≡ the batch lag/sum
  * formulation).
  */
object SessionStream {

  /** Derived from the batch operator's constant so the two planes can't
    * silently diverge.
    */
  val GapUs: Long = graft.ext.Sessions.SessionGapMinutes * 60L * 1000000L

  /** ts stays in the record so the watermark column survives into the
    * stateful operator (event-time timeout requires it); session-gap math
    * uses ts_us — the same epoch-micros comparison as the batch operator.
    */
  case class Ev(user_id: Long, ts: java.sql.Timestamp, ts_us: Long, event_id: Long)
  case class SessionState(sessions: List[(Long, Long, Long)]) // (start, end, n)
  case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Merge one micro-batch of a user's events into the running session
    * list. Events may arrive out of order both inside a batch and across
    * batches (any ts still above the watermark): each event enters as a
    * singleton session and the whole list is re-coalesced — two sessions
    * merge when the later one starts within GapUs of the earlier one's
    * end, so an out-of-order event that lands inside (or bridges) earlier
    * sessions folds in instead of opening a spurious new session. Result
    * is descending by start (head = most recent), matching prior layout.
    */
  private[graft] def merge(
      st: List[(Long, Long, Long)], evs: Seq[Ev]): List[(Long, Long, Long)] = {
    val all = evs.foldLeft(st)((acc, e) => (e.ts_us, e.ts_us, 1L) :: acc)
    all.sortBy(s => (s._1, s._2))
      .foldLeft(List.empty[(Long, Long, Long)]) {
        case ((ps, pe, pn) :: rest, (cs, ce, cn)) if cs - pe <= GapUs =>
          (ps, math.max(pe, ce), pn + cn) :: rest
        case (acc, s) => s :: acc
      }
  }

  private def flatMapFn(
      userId: Long, it: Iterator[Ev], state: GroupState[SessionState])
      : Iterator[UserSessions] = {
    val prev = state.getOption.map(_.sessions).getOrElse(Nil)
    val evs = it.toSeq
    if (evs.isEmpty && state.hasTimedOut) {
      // watermark passed: flush everything for this user
      val out = UserSessions(userId, prev.size.toLong, prev.map(_._3).sum)
      state.remove()
      Iterator.single(out)
    } else {
      val merged = merge(prev, evs)
      state.update(SessionState(merged))
      state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + GapUs / 1000L + 1)
      Iterator.empty
    }
  }

  /** Build the streaming sessionization over a static events dir. */
  def sessionize(spark: SparkSession, dir: String): Dataset[UserSessions] = {
    import spark.implicits._
    EventStream.readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .select(col("user_id"), col("ts"), expr("unix_micros(ts)").as("ts_us"),
              col("event_id"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        flatMapFn)
  }

  /** Drive synchronously over a static events dir via a memory sink.
    *
    * Event-time timeouts only fire while a batch is being processed and
    * only once the watermark has passed them, so a finite source needs a
    * nudge: the events file is copied into a scratch dir, processed, and
    * then a single far-future sentinel event (user_id −1) is appended as
    * a second file — its batch carries the data's watermark forward,
    * firing every real user's timeout and flushing their sessions. The
    * sentinel's own (still-open) state never reaches the sink.
    */
  def runOverStaticDir(spark: SparkSession, srcDir: String,
                       name: String = "graft_sessions"): DataFrame = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft_sess").toString
    Files.copy(Paths.get(s"$srcDir/events.parquet"),
               Paths.get(s"$tmp/events.parquet"),
               StandardCopyOption.REPLACE_EXISTING)
    val q = sessionize(spark, tmp).writeStream
      .outputMode("append")
      .format("memory")
      .queryName(name)
      .start()
    try {
      q.processAllAvailable()
      // sentinel: year-2100 event, written as a single parquet FILE so the
      // source's pathGlobFilter (events*.parquet, file-name match) sees it.
      // Its ts column must mirror the REAL file's physical type (the
      // streaming schema was probed from it — see EventStream.readEvents):
      // nanos-long for the NANOS generation, timestamp_ntz for MICROS.
      val staging = s"$tmp/__staging"
      val tsOnDisk = spark.read.parquet(s"$tmp/events.parquet")
        .schema("ts").dataType
      val base = Seq((-1L, -1L, "sentinel", 0.0, "{}"))
        .toDF("event_id", "user_id", "event_type", "value", "props")
      val sentinel = tsOnDisk match {
        case org.apache.spark.sql.types.LongType =>
          base.withColumn("ts", lit(4102444800000000000L)) // 2100-01-01 in ns
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
    spark.table(name).filter(col("user_id") =!= -1L)
  }
}
