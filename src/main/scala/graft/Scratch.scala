// temp probe - not part of the library (deleted before round end)
package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/sfbig30d")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime()
    val n = graft.ext.Dedup.qPrefixJaccard(spark, sfDir).count()
    println(f"[scratch] q_prefix_jaccard rows=$n ${(System.nanoTime()-t0)/1e9}%.2f s")
    spark.stop()
  }
}
