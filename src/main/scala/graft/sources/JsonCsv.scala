package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.types.StructType

/** JSONL and CSV source/sink support — the two mainstream line-oriented
  * interchange formats beyond the reference's raw text/TSV (SURVEY
  * §1.2). Readers take an explicit schema: at 100 TB, schema inference
  * is a full extra pass over the data, so production reads must pin the
  * schema (inference stays available for exploration via the inferring
  * variants).
  */
object JsonCsv {

  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).json(path)

  /** Schema-pinned JSONL read — no inference pass; malformed lines land
    * in PERMISSIVE mode as nulls (the reference's swallow-errors posture,
    * UserHotcar.java:57-62) rather than failing the job.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "PERMISSIVE").json(path)

  def writeCsv(df: DataFrame, path: String, sep: String = ",",
               header: Boolean = true): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", sep).option("header", header.toString)
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType,
              sep: String = ",", header: Boolean = true): DataFrame =
    spark.read.schema(schema)
      .option("sep", sep).option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)
}
