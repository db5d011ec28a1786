package graft
import org.apache.spark.sql.functions._
object ShingleBench {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[16]").config("spark.sql.shuffle.partitions","16")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    for (label <- Seq("slice+array_join", "element_at", "slice+array_join2", "element_at2")) {
      val toks = split(col("text"), " ")
      val sh = if (label.startsWith("slice")) graft.ops.Ops.shingles(toks, 3)
        else array_distinct(transform(sequence(lit(0), greatest(size(toks) - 3, lit(0))),
          i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3))))
      val t0 = System.nanoTime()
      d.select(explode(sh)).count()
      println(f"[sh] $label ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
