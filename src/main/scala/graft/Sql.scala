package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** SQL-first face of the engine: register the harness tables as temp
  * views and the native graft functions, then any query in the registry
  * — and anything a user writes — runs as plain `spark.sql`. The same
  * Catalyst plans come out either way; this is the surface for users who
  * arrive with SQL instead of the DataFrame API.
  *
  * The reference has no SQL layer at all (SURVEY intro: every "query" is
  * a compiled MapReduce main); this is the engine-side upgrade that
  * makes the capability surface reachable without writing Scala.
  */
object Sql {

  /** Register every harness table under its bare name (plus the graft
    * native functions) in the session's catalog.
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit = {
    val tables = Seq("region", "nation", "customer", "supplier", "part",
                     "orders", "lineitem", "documents", "embeddings")
    tables.foreach(t => Tables.read(spark, sfDir, t).createOrReplaceTempView(t))
    Tables.events(spark, sfDir).createOrReplaceTempView("events")
    functions.VectorFunctions.registerAll(spark)
  }

  /** Convenience: register then run one statement. */
  def sql(spark: SparkSession, sfDir: String, statement: String): DataFrame = {
    registerTables(spark, sfDir)
    spark.sql(statement)
  }
}
