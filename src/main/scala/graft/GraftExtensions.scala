package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graftshim.{FloatVectorDot, FloatVectorNorm, HammingDistance, HllSketchAgg, MisraGriesAgg, RollingHash64}

/** SparkSessionExtensions entry point: makes the engine's native
  * expressions available as SQL functions in any session built with
  *
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *
  * (or `.withExtensions(new GraftExtensions)`). For an already-running
  * session use graft.functions.VectorFunctions.registerAll instead.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage,
                       "", "", "", "", "4.0.0", "", "scala_udf")

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_dot"),
      info("graft_dot", "graft_dot(a, b) - dot product of two float arrays"),
      (es: Seq[Expression]) => FloatVectorDot(es.head, es(1))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_norm"),
      info("graft_norm", "graft_norm(a) - L2 norm of a float array"),
      (es: Seq[Expression]) => FloatVectorNorm(es.head)))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hamming"),
      info("graft_hamming", "graft_hamming(a, b) - hamming distance of two int64 signatures"),
      (es: Seq[Expression]) => HammingDistance(es.head, es(1))))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_hll"),
      info("graft_hll", "graft_hll(h) - HyperLogLog (m=64) distinct estimate over 60-bit hashes"),
      (es: Seq[Expression]) => HllSketchAgg(es.head)))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_heavy_hitters"),
      info("graft_heavy_hitters",
           "graft_heavy_hitters(item, k) - Misra-Gries summary: items with freq > n/(k+1) guaranteed present"),
      (es: Seq[Expression]) => MisraGriesAgg.fromFunctionArgs(es)))
    e.injectFunction((org.apache.spark.sql.catalyst.FunctionIdentifier("graft_rolling_hash"),
      info("graft_rolling_hash",
           "graft_rolling_hash(s[, maxLen]) - polynomial rolling hash of the first maxLen code points, mod 1e9+7"),
      (es: Seq[Expression]) => RollingHash64.fromFunctionArgs(es)))
  }
}
