// temp probe - not part of the library
package graft
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.KClosestItems
import org.apache.spark.sql.catalyst.expressions.Literal

/** Decompose the per-call cost of KClosestItems.compute at the sf10
  * city-array shape (80k items, ~4 duplicate prices per value).
  */
object MicroK {
  def main(args: Array[String]): Unit = {
    val n = 80000
    val rnd = new scala.util.Random(7)
    val prices = Array.fill(n)(900.0 + rnd.nextInt(20000) / 16.66).sorted
    val arr = new GenericArrayData(
      prices.zipWithIndex.map { case (p, i) => InternalRow(p, i.toLong): Any })
    val expr = KClosestItems(Literal(1), Literal(1.0), 100)
    val probes = Array.fill(2000)(-999.0 + rnd.nextDouble() * 10999)
    probes.foreach(b => expr.compute(arr, b)) // warm
    val t0 = System.nanoTime()
    var s = 0L
    probes.foreach(b => s += expr.compute(arr, b).numElements())
    println(f"[microk] mixed per-call ${(System.nanoTime() - t0) / 1e3 / probes.length}%.1f us (sink=$s)")
    val in = Array.fill(2000)(900.0 + rnd.nextDouble() * 1200)
    val t1 = System.nanoTime()
    in.foreach(b => s += expr.compute(arr, b).numElements())
    println(f"[microk] in-range per-call ${(System.nanoTime() - t1) / 1e3 / in.length}%.1f us (sink=$s)")
    val out = Array.fill(2000)(5000.0 + rnd.nextDouble() * 5000)
    val t2 = System.nanoTime()
    out.foreach(b => s += expr.compute(arr, b).numElements())
    println(f"[microk] out-of-range per-call ${(System.nanoTime() - t2) / 1e3 / out.length}%.1f us (sink=$s)")

    // scaling: n at fixed k, then k at fixed n
    for (m <- Seq(800, 8000, 80000)) {
      val a2 = new GenericArrayData(prices.take(m).zipWithIndex
        .map { case (p, i) => InternalRow(p, i.toLong): Any })
      val e2 = KClosestItems(Literal(1), Literal(1.0), 100)
      in.foreach(b => e2.compute(a2, b))
      val t = System.nanoTime()
      in.foreach(b => s += e2.compute(a2, b).numElements())
      println(f"[microk] n=$m k=100 per-call ${(System.nanoTime() - t) / 1e3 / in.length}%.1f us (sink=$s)")
    }
    for (kk <- Seq(10, 100, 1000)) {
      val e2 = KClosestItems(Literal(1), Literal(1.0), kk)
      in.foreach(b => e2.compute(arr, b))
      val t = System.nanoTime()
      in.foreach(b => s += e2.compute(arr, b).numElements())
      println(f"[microk] n=80000 k=$kk per-call ${(System.nanoTime() - t) / 1e3 / in.length}%.1f us (sink=$s)")
    }
  }
}
