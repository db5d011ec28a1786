package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import java.util.concurrent.atomic.AtomicLong

/** Per-query profiler: wall time AND shuffle read/write bytes (task-
  * metrics listener), 2 reps each — rep2 is the steady-state number.
  * Shuffle bytes are the scale-decision currency: on a real cluster
  * network bytes dominate long before local CPU does, so key-encoding
  * choices (raw text vs digest) are judged here, not on local wall.
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shufWrite = new AtomicLong; val shufRead = new AtomicLong
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shufWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shufRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        }
      }
    })
    spark.range(1000000L).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    for (name <- names; rep <- 1 to 2) {
      // Deterministic listener-bus drain (BusShim) instead of fixed
      // sleeps: counters are read only after every task-end event from
      // this run has been delivered.
      org.apache.spark.graftshim.BusShim.drain(spark.sparkContext)
      shufWrite.set(0L); shufRead.set(0L)
      val t0 = System.nanoTime()
      // toRdd.count(): execute the query's own plan in full (a bare
      // count() lets Catalyst drop row-preserving joins + final sorts).
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.spark.graftshim.BusShim.drain(spark.sparkContext)
      println(f"[profile] $name rep$rep: $secs%.3f s  " +
        f"shuffle_write=${shufWrite.get / 1048576.0}%.1f MiB  " +
        f"shuffle_read=${shufRead.get / 1048576.0}%.1f MiB")
    }
    spark.stop()
  }
}
