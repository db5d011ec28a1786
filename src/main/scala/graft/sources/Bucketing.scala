package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table support: pre-partition both sides of a recurring join
  * on the join key at WRITE time, so every subsequent join is co-located
  * and needs no exchange — the 100 TB answer to "this join runs every
  * day on the same key" (vs broadcast for bounded dims and shuffle for
  * ad-hoc keys).
  *
  * Spark buckets via hash(key) % n at write; a join of two tables
  * bucketed on the join key with compatible bucket counts reads
  * bucket-aligned splits and sort-merges in place. The spec pins the
  * no-Exchange plan.
  */
object Bucketing {

  /** Write df as a bucketed (+ in-bucket sorted) managed table. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Exchange-free equi-join of two tables bucketed on the join key. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key))
}
