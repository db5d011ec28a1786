package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftshim.{FloatVectorDot, FloatVectorNorm, HammingDistance, Shim}

/** Column-API face of the native Catalyst vector expressions (the
  * expression classes live in the graftshim package because they use
  * Spark-internal `private[sql]` types like AbstractDataType).
  */
object VectorFunctions {
  def vecDot(a: Column, b: Column): Column =
    Shim.column(FloatVectorDot(Shim.expression(a), Shim.expression(b)))
  def vecNorm(a: Column): Column = Shim.column(FloatVectorNorm(Shim.expression(a)))
  def hamming(a: Column, b: Column): Column =
    Shim.column(HammingDistance(Shim.expression(a), Shim.expression(b)))
  def vecCosine(a: Column, b: Column): Column =
    vecDot(a, b) / (vecNorm(a) * vecNorm(b))

  /** Register the native functions for SQL use in an existing session. */
  def registerAll(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("graft_dot",
      es => FloatVectorDot(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("graft_norm",
      es => FloatVectorNorm(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("graft_hamming",
      es => HammingDistance(es.head, es(1)), "scala_udf")
  }
}
