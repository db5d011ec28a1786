package graft

/** Dev utility for the optimization rounds: write `.explain("formatted")`
  * of named queries to files. Usage:
  *   runMain graft.PlanDump <outDir> <suffix> q_a q_b ...
  * Run with -Dgraft.plan.audit=1 so checkpoint-tailed queries dump their
  * full pre-checkpoint plan instead of one cached scan (PlanMode note).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args.drop(2)
    new java.io.File(outDir).mkdirs()
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (q <- names) {
      val df = SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val w = new java.io.PrintWriter(s"$outDir/${q}_$suffix.txt")
      try w.println(plan) finally w.close()
      println(s"[plandump] wrote $outDir/${q}_$suffix.txt")
    }
    spark.stop()
  }
}
