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
  /** events.parquet's `ts` physical type has varied across harness data
    * generations: TIMESTAMP(NANOS) (no native Spark type — loads only as
    * a nanos-since-epoch long under the legacy conf) and TIMESTAMP(MICROS)
    * (plain TimestampType). Branch on the LOADED type so both generations
    * read to the same TimestampType column:
    *
    *  - LongType ⇒ nanos: floor-divide to micros in integer space — a
    *    double division would lose precision above 2^53 ns.
    *    `(ts - pmod(ts, 1000)) div 1000` is true floor division (pmod is
    *    non-negative), matching DuckDB's ns→µs flooring even for pre-1970
    *    (negative) nanos, where plain `div` truncates toward zero.
    *  - TimestampType ⇒ micros: pass through untouched (keeps pushdown
    *    and pruning on the raw scan — no projection layer at all).
    *
    * The conf set below is an intentional session-wide mutation: the
    * harness driver builds the SparkSession itself, so the reader is the
    * only hook this library has. The flag only affects TIMESTAMP(NANOS)
    * parquet columns (they fail to load at all without it) and setting it
    * is idempotent; MICROS files ignore it entirely.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = read(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("(ts - pmod(ts, 1000)) div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        // MICROS-no-timezone generation: NTZ → instant via the session
        // zone. Verify/spec sessions pin spark.sql.session.timeZone=UTC,
        // so the mapping is micros-identical to DuckDB's (which treats
        // the NTZ value as UTC when extracting epochs).
        raw.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
