// temp probe - not part of the library
package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.KClosestItems
import org.apache.spark.sql.catalyst.expressions.Literal

/** Ground-truth per-call cost of KClosestItems.compute on REAL sf10rel
  * city arrays and REAL c_acctbal probes, with the tie-gather width m
  * instrumented (re-derived outside the expression).
  */
object MicroK2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val cityRows = Tables.part(spark, sfDir)
      .groupBy((col("p_partkey") % 25).cast("int").as("city"))
      .agg(array_sort(collect_list(struct(
             col("p_retailprice").as("price"), col("p_partkey").as("id"))))
             .as("items"))
      .where(col("city") === 0)
      .collect()
    val itemsRow = cityRows(0).getSeq[org.apache.spark.sql.Row](1)
    val n = itemsRow.size
    val prices = itemsRow.map(_.getDouble(0)).toArray
    val ids = itemsRow.map(_.getLong(1)).toArray
    println(s"[microk2] city0 n=$n distinctPrices=${prices.distinct.length}")

    val probes = Tables.customer(spark, sfDir).select(col("c_acctbal"))
      .limit(2000).collect().map(_.getDouble(0))
    spark.stop()

    val arr = new GenericArrayData(
      prices.zip(ids).map { case (p, i) => InternalRow(p, i): Any })
    val expr = KClosestItems(Literal(1), Literal(1.0), args(1).toInt)

    // instrument m (gather width) per probe, algorithm mirrored
    def gatherWidth(b: Double, k: Int): Int = {
      var lo = 0; var hi = n
      while (lo < hi) { val mid = (lo + hi) >>> 1; if (prices(mid) <= b) lo = mid + 1 else hi = mid }
      var l = lo - 1; var r = lo; var taken = 0; var dK = 0.0
      while (taken < k && (l >= 0 || r < n)) {
        val dl = if (l >= 0) math.abs(b - prices(l)) else Double.PositiveInfinity
        val dr = if (r < n) math.abs(b - prices(r)) else Double.PositiveInfinity
        if (dl <= dr) { dK = math.max(dK, dl); l -= 1 } else { dK = math.max(dK, dr); r += 1 }
        taken += 1
      }
      var m = 0; var i = lo - 1
      while (i >= 0 && math.abs(b - prices(i)) <= dK) { m += 1; i -= 1 }
      i = lo
      while (i < n && math.abs(b - prices(i)) <= dK) { m += 1; i += 1 }
      m
    }
    val widths = probes.map(b => gatherWidth(b, args(1).toInt))
    println(s"[microk2] m: min=${widths.min} p50=${widths.sorted.apply(widths.length/2)} max=${widths.max} mean=${widths.sum/widths.length}")

    probes.foreach(b => expr.compute(arr, b)) // warm
    var s = 0L
    val t0 = System.nanoTime()
    probes.foreach(b => s += expr.compute(arr, b).numElements())
    println(f"[microk2] real per-call ${(System.nanoTime() - t0) / 1e3 / probes.length}%.1f us (sink=$s)")
  }
}
