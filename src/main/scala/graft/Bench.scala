package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen/file-index paths so startup cost isn't charged
    // to whichever query happens to run first: touch every table's file
    // index + footer, and run one shuffle + one broadcast-join shape so
    // the generic exchange/codegen infrastructure is JIT'd. Guarded: a bad
    // sf dir must surface as per-query -1 markers in the metric line, not
    // a crash before any JSON is emitted.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    try {
      for (t <- Seq("region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "documents", "embeddings"))
        spark.read.parquet(s"$sfDir/$t.parquet").count()
      Tables.events(spark, sfDir).count()
      val a = spark.range(100000L).selectExpr("id", "id % 100 AS k")
      val b = spark.range(100L).selectExpr("id AS k", "id * 2 AS v")
      a.join(org.apache.spark.sql.functions.broadcast(b), "k")
        .groupBy("k").count().count()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warmup read failed: ${e.getMessage}") }
    // Keep the sorted Seq end-to-end: deterministic execution AND output
    // key order. A failing query records -1 (not its time-to-throw) so
    // breakage is visible in the metric line instead of masked.
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name failed: ${e.getMessage}")
                 false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Two sinks for the same measurement: stdout gets a COMPACT metric
    // line (values at 2 dp, sf basename) so it survives the harness's
    // bounded output capture un-truncated at 90+ queries, and
    // BENCH_LOCAL.json in the repo gets the full-precision copy so the
    // per-round perf audit trail doesn't depend on stdout capture at all.
    def fmt(v: Double, dp: Int): String = {
      val s = BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
      if (s.isEmpty) "0" else s
    }
    def jsonLine(dp: Int, sf: String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, dp) }
        .mkString("{", ",", "}")
      val total = results.collect { case (_, v) if v >= 0 => v }.sum
      s"""{"metric":"total","value":${fmt(total, dp)},"unit":"sec","queries":$qs,"sf":"$sf"}"""
    }
    try {
      val w = new java.io.PrintWriter("/root/repo/BENCH_LOCAL.json")
      try w.println(jsonLine(4, sfDir)) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_LOCAL.json: ${e.getMessage}") }
    println(jsonLine(2, new java.io.File(sfDir).getName))
    spark.stop()
  }
}
