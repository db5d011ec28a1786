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
    //
    // toRdd.count(), NOT Dataset.count(): counting through a fresh
    // aggregate plan lets Catalyst eliminate row-preserving left joins
    // and final sorts — under-measuring any query with that shape.
    // Executing the query's OWN physical plan times what a consumer of
    // the full result would pay. (Changed in r5; r4-and-earlier totals
    // are slight under-measurements for sort/left-join tails.)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).queryExecution.toRdd.count(); true }
               catch { case e: Throwable =>
                 System.err.println(s"[bench] $name failed: ${e.getMessage}")
                 false }
      name -> (if (ok) (System.nanoTime() - t0) / 1e9 else -1.0)
    }
    // Two sinks for the same measurement. The harness captures only the
    // LAST ~2000 chars of stdout and JSON-parses them, so the stdout line
    // must fit that window WHOLE or the parse fails (r4's 105-query line
    // overflowed it -> parsed:null). stdout therefore gets a BOUNDED line:
    // total + failures + the slowest queries, greedily added while the
    // line stays under budget; BENCH_LOCAL.json in the repo gets the
    // full-precision full map so the per-round perf audit trail doesn't
    // depend on stdout capture at all.
    def fmt(v: Double, dp: Int): String = {
      val s = BigDecimal(v).setScale(dp, BigDecimal.RoundingMode.HALF_UP)
        .bigDecimal.stripTrailingZeros.toPlainString
      if (s.isEmpty) "0" else s
    }
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    def fullLine(dp: Int, sf: String): String = {
      val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v, dp) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, dp)},"unit":"sec","queries":$qs,"sf":"$sf"}"""
    }
    def boundedLine(sf: String, budget: Int): String = {
      // Failures (-1) always surface; the rest slowest-first.
      val ranked = results.sortBy { case (_, v) => if (v < 0) Double.MinValue else -v }
      val head = s"""{"metric":"total","value":${fmt(total, 2)},"unit":"sec","sf":"$sf","n_queries":${results.size},"full":"BENCH_LOCAL.json","queries":{"""
      val tail = "}}"
      val sb = new StringBuilder(head)
      var first = true
      for ((k, v) <- ranked) {
        val entry = (if (first) "" else ",") + "\"" + k + "\":" + fmt(v, 2)
        if (sb.length + entry.length + tail.length <= budget) {
          sb.append(entry); first = false
        }
      }
      sb.append(tail).toString
    }
    try {
      val w = new java.io.PrintWriter("/root/repo/BENCH_LOCAL.json")
      try w.println(fullLine(4, sfDir)) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] could not write BENCH_LOCAL.json: ${e.getMessage}") }
    println(boundedLine(new java.io.File(sfDir).getName, 1800))
    spark.stop()
  }
}
