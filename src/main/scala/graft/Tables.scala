package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table readers over the harness star schema (see TESTDATA.md /
  * FIXTURES.md §2). One method per table so call sites stay declarative and
  * Catalyst sees a plain file scan it can push filters/projections into.
  *
  * The reference's scans are line-oriented text (`TextInputFormat`,
  * reference BootStrap.java:31); here the engine is columnar-first: Parquet
  * scans get predicate pushdown, column pruning, and vectorized reads for
  * free, which is the 100 TB-scale posture.
  */
object Tables {
  def read(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = read(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = read(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = read(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = read(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = read(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = read(s, d, "lineitem")
  /** events.parquet stores `ts` as Parquet TIMESTAMP(NANOS), which Spark
    * has no native type for. Read it as nanos-since-epoch (legacy conf)
    * and floor-divide to micros with integer `div` — a double division
    * would lose precision above 2^53 ns. DuckDB's ns→µs coercion floors
    * the same way, so oracle parity holds.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    read(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
