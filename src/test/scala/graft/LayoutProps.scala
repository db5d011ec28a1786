package graft

import graft.ext.Layout
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the layout panel's arithmetic cores: the
  * Morton interleave is a bijection on the 16-bit grid (so z-range file
  * assignment never collides or drops coordinates), and next-fit
  * compaction binning satisfies its contract on arbitrary manifests —
  * bins are contiguous in file order, every bin except possibly the
  * last CROSSES the target only via its final file (overflow ≤ one
  * file), and file/doc/byte mass is conserved.
  */
object LayoutProps extends Properties("graft.Layout") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def zRef(a: Int, b: Int): Long =
    (0 until Layout.ZBits).map { i =>
      (((a >> i) & 1).toLong << (2 * i + 1)) | (((b >> i) & 1).toLong << (2 * i))
    }.sum

  val coordGen: Gen[List[(Int, Int)]] =
    Gen.listOfN(40, for {
      a <- Gen.chooseNum(0, 255); b <- Gen.chooseNum(0, 255)
    } yield (a, b))

  property("zInterleave == reference loop and is injective on sampled grid") =
    Prop.forAllNoShrink(coordGen) { coords =>
      val got = coords.toDF("pk_b", "sk_b")
        .select($"pk_b", $"sk_b",
                Layout.zInterleave(col("pk_b"), col("sk_b")).cast("long").as("z"))
        .as[(Int, Int, Long)].collect()
      got.forall { case (a, b, z) => z == zRef(a, b) } &&
        got.map(r => (r._1, r._2) -> r._3).toMap.size ==
          coords.distinct.size // distinct coords → distinct z
    }

  val manifestGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.chooseNum(1, 30)
    rows <- Gen.listOfN(n, Gen.chooseNum(1L, 3000L))
  } yield rows.zipWithIndex.map { case (b, i) => (i.toLong, b) }

  property("next-fit binning: contiguity, bounded overflow, conservation") =
    Prop.forAllNoShrink(manifestGen) { files =>
      val manifest = files.map { case (idx, bytes) => ("s", idx, 1L, bytes) }
        .toDF("source", "file_idx", "n_docs", "bytes")
      val plan = Layout.binManifest(manifest)
        .select($"bin", $"n_files", $"total_bytes", $"first_file", $"last_file")
        .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toList
      val totalBytes = files.map(_._2).sum
      val contiguous = plan.zip(plan.drop(1)).forall { case (a, b) =>
        a._5 < b._4 // bins never interleave in file order
      }
      // replay the next-fit rule locally: bin = floor(bytes_before / T)
      val expected = files.scanLeft(0L)(_ + _._2).zip(files).map {
        case (before, (idx, _)) => (idx, before / Layout.TargetBytes)
      }.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      val sameBins = plan.map(p => p._1 -> p._2).toMap == expected
      contiguous && sameBins &&
        plan.map(_._3).sum == totalBytes &&
        plan.map(_._2).sum == files.size.toLong
    }
}
