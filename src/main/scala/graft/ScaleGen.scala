package graft

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Dev utility: deterministically scale an sf dir N× into a new dir by
  * unioning key-shifted copies (fact keys shifted per copy so
  * cardinality ratios are preserved; static dims region/nation are kept
  * single-copy). Used to probe how query runtimes scale beyond the
  * largest driver-provided SF:
  *
  *   runMain graft.ScaleGen /root/testdata/sf0.1 /tmp/sfbig 10
  */
object ScaleGen {
  val Offset = 10000000L

  // bigint key columns to shift per copy; everything else is carried
  val ShiftCols: Map[String, Seq[String]] = Map(
    "customer"   -> Seq("c_custkey"),
    "supplier"   -> Seq("s_suppkey"),
    "part"       -> Seq("p_partkey"),
    "orders"     -> Seq("o_orderkey", "o_custkey"),
    "lineitem"   -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "events"     -> Seq("event_id", "user_id"),
    "documents"  -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
  )
  val StaticDims = Seq("region", "nation")

  def scaled(df: DataFrame, shift: Seq[String], copies: Int): DataFrame =
    (0 until copies).map { i =>
      shift.foldLeft(df)((d, c) => d.withColumn(c, col(c) + i * Offset))
    }.reduce(_.unionByName(_))

  def main(args: Array[String]): Unit = {
    val Array(src, dst, n) = args.padTo(3, null) match {
      case Array(a, b, c) => Array(
        Option(a).getOrElse("/root/testdata/sf0.1"),
        Option(b).getOrElse("/tmp/sfbig"),
        Option(c).getOrElse("10"))
    }
    val copies = n.toInt
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
              sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    StaticDims.foreach { t =>
      spark.read.parquet(s"$src/$t.parquet")
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
    }
    ShiftCols.foreach { case (t, cols) =>
      val df = spark.read.parquet(s"$src/$t.parquet")
      scaled(df, cols, copies)
        .write.mode(SaveMode.Overwrite).parquet(s"$dst/$t.parquet")
      println(s"[scalegen] $t x$copies written")
    }
    spark.stop()
  }
}
