// temp probe - not part of the library
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Decompose q_recommend's superlinear wall at the 100x relational
  * rung: is the cost the broadcast join carrying the per-city items
  * array, the KClosestItems evaluation, or the payload tail?
  */
object ProfileRec {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    import org.apache.spark.sql.graftshim.{KClosestItems, Shim}

    val users = Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_nationkey").as("city"), col("c_acctbal"))
    def cityItems = Tables.part(spark, sfDir)
      .groupBy((col("p_partkey") % 25).cast("int").as("city"))
      .agg(array_sort(collect_list(struct(
             col("p_retailprice").as("price"), col("p_partkey").as("id"))))
             .as("items"),
           min(col("p_retailprice")).as("pmin"),
           max(col("p_retailprice")).as("pmax"))
    val topExpr = Shim.column(KClosestItems(
      Shim.expression(col("items")), Shim.expression(col("c_acctbal")), 100))

    def time(tag: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        df.queryExecution.toRdd.count()
        println(f"[profilerec] $tag run$i ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }

    time("0_cityItems_agg")(cityItems)
    time("1_join_only")(
      users.join(broadcast(cityItems), Seq("city"), "inner")
        .select(col("c_custkey"), col("pmin")))
    time("2_join_size_items")(
      users.join(broadcast(cityItems), Seq("city"), "inner")
        .select(col("c_custkey"), size(col("items"))))
    time("3_join_topk")(
      users.join(broadcast(cityItems), Seq("city"), "inner")
        .select(col("c_custkey"), size(topExpr.as("top"))))
    time("4_full")(SparkEntry.queries("q_recommend")(spark, sfDir))
    spark.stop()
  }
}
