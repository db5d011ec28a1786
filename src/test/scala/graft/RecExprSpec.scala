package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.{KClosestItems, RecPayload, Shim}
import org.scalatest.funsuite.AnyFunSuite

/** Exact-semantics pins for the recommender's native expressions:
  * KClosestItems against a brute-force (dist asc, id asc) top-K, and
  * RecPayload against the interpreted HOF formulation it replaced
  * (format_string %.4f + transform/concat/array_join).
  */
class RecExprSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // deterministic LCG so fixtures are reproducible from source
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L).drop(1)

  test("KClosestItems == brute force on arrays with duplicate prices") {
    val rnd = lcg(42L)
    for (trial <- 0 until 20) {
      val n = 1 + (trial * 7) % 40
      // prices drawn from a SMALL grid so duplicates are common (the
      // tie-break path), ids shuffled relative to price order
      val items = (0 until n).map { i =>
        val price = (math.floorMod(rnd.next(), 12L) * 25).toDouble / 10.0
        val id = math.floorMod(rnd.next(), 1000L)
        (price, id)
      }.sortBy(identity) // (price asc, id asc) — the expression's contract
      val b = (math.floorMod(rnd.next(), 400L)).toDouble / 10.0
      val k = 1 + trial % 7
      val df = Seq((items, b)).toDF("items_raw", "b")
        .select(expr("transform(items_raw, x -> struct(x._1 AS price, x._2 AS id))")
                  .as("items"), col("b"))
      val got = df.select(Shim.column(KClosestItems(
          Shim.expression(col("items")), Shim.expression(col("b")), k)).as("top"))
        .selectExpr("transform(top, x -> struct(x.score, x.id)) AS t")
        .as[Seq[(Double, Long)]].head()
      val want = items.map { case (p, id) => (math.abs(b - p), id) }
        .sorted.take(k)
      assert(got == want, s"trial $trial: n=$n b=$b k=$k")
    }
  }

  test("KClosestItems == brute force when tie runs are far wider than k") {
    // The sf10rel regime that broke the sort-the-ties formulation: few
    // distinct prices over many items, so the kth-distance boundary
    // captures a tie run of ~n/values items (>> k). Exercises the
    // binary-searched run extents + ascending-id merge, for probes
    // inside the range, at exact grid points (dK == 0), and far outside
    // (one-sided walk), against the O(n log n) brute force.
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val rnd = lcg(7L)
    val n = 5000
    val grid = Array(10.0, 12.5, 20.0, 20.5, 31.0, 44.0, 99.0)
    val items = (0 until n).map { _ =>
      val price = grid(math.floorMod(rnd.next(), grid.length.toLong).toInt)
      val id = math.floorMod(rnd.next(), 1000000L)
      (price, id)
    }.sortBy(identity)
    val arr = new GenericArrayData(
      items.map { case (p, id) => InternalRow(p, id): Any }.toArray)
    val probes = Seq(0.0, 10.0, 15.0, 16.25, 20.25, 44.0, 99.0, 500.0, -3.0)
    for (b <- probes; k <- Seq(1, 3, 50, 137, n + 10)) {
      val e = KClosestItems(null, null, k)
      val got = (0 until math.min(k, n)).map { i =>
        val r = e.compute(arr, b).asInstanceOf[GenericArrayData]
          .getStruct(i, 2)
        (r.getDouble(0), r.getLong(1))
      }
      val want = items.map { case (p, id) => (math.abs(b - p), id) }
        .sorted.take(k)
      assert(got == want, s"b=$b k=$k")
    }
  }

  test("RecPayload == interpreted HOF payload incl. formatting sweep") {
    // scores sweep [0,1] incl. rounding-boundary neighborhoods; mn/mx
    // exercised both degenerate (mx == mn) and spread
    val scores = (0 until 2000).map(_ / 1999.0) ++
      Seq(0.00005, 0.000049999, 0.12345, 0.99995, 0.5, 1.0, 0.0)
    val rows = scores.zipWithIndex.map { case (s, i) => (s, i.toLong) }
    val df = rows.toDF("s", "id")
      .agg(expr("array_agg(struct(s AS score, id))").as("top"))
      .withColumn("mn", lit(0.0)).withColumn("mx", lit(1.0))
    val native = df.select(Shim.column(RecPayload(
      Shim.expression(col("top")), Shim.expression(col("mn")),
      Shim.expression(col("mx")))).as("p")).as[String].head()
    val reference = df.select(array_join(
      transform(col("top"), x =>
        concat(x.getField("id").cast("string"), lit("@"),
               format_string("%.4f",
                 lit(1.0) - (x.getField("score") - col("mn")) /
                   (col("mx") - col("mn"))))), ",").as("p"))
      .as[String].head()
    assert(native == reference)
    // degenerate group: mx == mn -> every score 1.0000
    val deg = df.withColumn("mx", lit(0.0))
      .select(Shim.column(RecPayload(
        Shim.expression(col("top")), Shim.expression(col("mn")),
        Shim.expression(col("mx")))).as("p")).as[String].head()
    assert(deg.split(",").forall(_.endsWith("@1.0000")))
  }
}
