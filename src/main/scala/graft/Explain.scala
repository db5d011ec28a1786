package graft
/** Dev utility: print the formatted physical plan and warm/steady timings
  * for one or more registered queries. Usage:
  *   runMain graft.Explain <q1,q2,...> [sfDir] [--plan]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions","16")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    val d = if (args.length > 1 && !args(1).startsWith("--")) args(1)
            else "/root/testdata/sf0.1"
    val showPlan = args.contains("--plan")
    for (q <- args(0).split(",")) {
      if (showPlan) {
        println(s"===== $q =====")
        SparkEntry.queries(q)(spark, d).explain("formatted")
      }
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        SparkEntry.queries(q)(spark, d).count()
        println(f"[timing] $q run$i ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
    spark.stop()
  }
}
