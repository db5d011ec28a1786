package graft

import graft.ops.Ops
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suites for the quirk-sensitive operators (SURVEY
  * §5: top-K bound, min-max range, permissive-parse defaults) — run by
  * sbt's scalacheck integration alongside the ScalaTest suites.
  */
object OpsProps extends Properties("graft.Ops") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  val rowsGen: Gen[List[(Int, Double, Long)]] = for {
    n <- Gen.chooseNum(1, 60)
    rows <- Gen.listOfN(n, for {
      g <- Gen.chooseNum(0, 3)
      v <- Gen.chooseNum(-1000.0, 1000.0)
    } yield (g, v))
  } yield rows.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }

  property("topK emits <= K per group and exactly the K smallest") =
    Prop.forAllNoShrink(rowsGen) { rows =>
      val df = rows.toDF("g", "v", "id")
      val got = Ops.topKPerGroup(df, Seq("g"), col("v"), col("id"), 3)
        .select($"g", $"v", $"id").as[(Int, Double, Long)].collect()
      val byGroup = got.groupBy(_._1)
      val expected = rows.groupBy(_._1).map { case (g, rs) =>
        g -> rs.map(r => (r._2, r._3)).sorted.take(3).toSet
      }
      byGroup.forall { case (g, rs) => rs.length <= 3 } &&
        expected.forall { case (g, exp) =>
          byGroup.getOrElse(g, Array.empty).map(r => (r._2, r._3)).toSet == exp
        }
    }

  property("all three top-K variants agree: window == salted == heap") =
    Prop.forAllNoShrink(rowsGen) { rows =>
      // skewed partitioning on purpose: the salted and heap paths must
      // return the same rows no matter how data lands in partitions
      val df = rows.toDF("g", "v", "id").repartition(5)
      def norm(rs: Array[(Int, Double, Long)]) = rs.toSet
      val plain = norm(Ops.topKPerGroup(df, Seq("g"), col("v"), col("id"), 3)
        .select($"g", $"v", $"id").as[(Int, Double, Long)].collect())
      val salted = norm(Ops.topKPerGroupSalted(df, Seq("g"), col("v"),
                                               col("id"), 3, saltBuckets = 4)
        .select($"g", $"v", $"id").as[(Int, Double, Long)].collect())
      val heap = norm(Ops.topKHeap(df, Seq("g"), col("v"), col("id"), 3)
        .select($"g", $"score", $"id").as[(Int, Double, Long)].collect())
      plain == salted && plain == heap
    }

  property("minMaxNorm stays in [0,1] and never NaN") =
    Prop.forAllNoShrink(rowsGen) { rows =>
      val df = rows.toDF("g", "v", "id")
      val scores = df.select(Ops.minMaxNorm($"v", Seq($"g")).as("s"))
        .as[Double].collect()
      scores.forall(s => s >= 0.0 && s <= 1.0 && !s.isNaN)
    }

  property("permissiveDouble: parses doubles, defaults everything else") =
    Prop.forAllNoShrink(Gen.listOf(Gen.oneOf(
      Gen.chooseNum(-1e6, 1e6).map(_.toString),
      // prefix with 'x' so pathological alpha draws ("NaN", "Infinity")
      // can't parse on either side
      Gen.alphaStr.map("x" + _), Gen.const(""), Gen.const("1.5e3"), Gen.const("-"),
    ))) { xs =>
      xs.isEmpty || {
        val got = xs.toDF("s").select(Ops.permissiveDouble($"s").as("v"))
          .as[Double].collect()
        got.zip(xs).forall { case (v, s) =>
          val expect = try s.toDouble catch { case _: Throwable => 0.0 }
          v == expect || (v == 0.0 && s.trim.isEmpty)
        }
      }
    }

  property("rollingHash is a function of the string only") =
    Prop.forAllNoShrink(Gen.listOfN(5, Gen.asciiPrintableStr)) { xs =>
      xs.isEmpty || {
        val twice = (xs ++ xs).toDF("s")
          .select($"s", Ops.rollingHash($"s").as("h"))
          .as[(String, Long)].collect()
        twice.groupBy(_._1).values.forall(g => g.map(_._2).distinct.length == 1)
      }
    }

  property("md5Bits60: non-negative, < 2^60, equals java digest prefix") =
    Prop.forAllNoShrink(Gen.listOfN(4, Gen.asciiPrintableStr)) { xs =>
      xs.isEmpty || {
        val got = xs.toDF("s").select($"s", Ops.md5Bits60($"s").as("h"))
          .as[(String, Long)].collect()
        got.forall { case (s, h) =>
          val hex = java.security.MessageDigest.getInstance("MD5")
            .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
          h >= 0L && h < (1L << 60) &&
            h == java.lang.Long.parseLong(hex.take(15), 16)
        }
      }
    }

  property("minHashSignatureMod: fixed length, permutation-invariant, containment-monotone") =
    Prop.forAllNoShrink(for {
      base <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 1000000006L))
      extra <- Gen.listOf(Gen.chooseNum(0L, 1000000006L))
    } yield (base, extra)) { case (base, extra) =>
      val df = Seq(
        (1L, base), (2L, scala.util.Random.shuffle(base)), (3L, base ++ extra))
        .toDF("id", "xs")
        .select($"id", Ops.minHashSignatureMod($"xs", 8).as("sig"))
        .as[(Long, Seq[Long])].collect().map(r => r._1 -> r._2).toMap
      df(1).length == 8 &&
        df(1) == df(2) && // element order can't matter (min over a set)
        df(3).zip(df(1)).forall { case (sup, sub) => sup <= sub } // superset mins <=
    }

  property("session merge: any batch split yields the single-batch sessions") =
    Prop.forAllNoShrink(for {
      ts <- Gen.nonEmptyListOf(Gen.chooseNum(0L, 20L))
      splits <- Gen.listOf(Gen.chooseNum(0, 100))
    } yield (ts, splits)) { case (tsRaw, splits) =>
      import graft.streaming.SessionStream
      val gap = SessionStream.GapUs
      // spread draws over ~4 gap-widths so multi-session layouts occur
      val evs = tsRaw.zipWithIndex.map { case (t, i) =>
        SessionStream.Ev(1L, new java.sql.Timestamp(0), t * gap / 5, i.toLong)
      }
      val whole = SessionStream.merge(Nil, evs).toSet
      // partition the (arbitrary-order) event list into random batches
      val cuts = splits.map(s => s % (evs.length + 1)).sorted.distinct
      val batches = (0 +: cuts :+ evs.length).distinct.sorted
        .sliding(2).map { case Seq(a, b) => evs.slice(a, b) }
        .filter(_.nonEmpty).toList
      val incremental = batches.foldLeft(List.empty[(Long, Long, Long)])(
        (st, b) => SessionStream.merge(st, b))
      whole == incremental.toSet
    }

  property("Misra-Gries: freq > n/(k+1) items always survive, even merged") =
    Prop.forAllNoShrink(for {
      items <- Gen.nonEmptyListOf(Gen.chooseNum(0, 30).map(i => s"w$i"))
      cut <- Gen.chooseNum(0, 100)
    } yield (items, cut)) { case (items, cut) =>
      import org.apache.spark.sql.graftshim.MgState
      val k = 5
      val freq = items.groupBy(identity).map { case (w, g) => w -> g.size }
      val guaranteed = freq.filter(_._2 > items.size.toDouble / (k + 1)).keySet
      val whole = new MgState(k); items.foreach(whole.update)
      // and via a partition split + summary merge (the partial-agg path)
      val at = cut % items.size
      val (a, b) = items.splitAt(at)
      val sa = new MgState(k); a.foreach(sa.update)
      val sb = new MgState(k); b.foreach(sb.update)
      val merged = new MgState(k); merged.mergeFrom(sa); merged.mergeFrom(sb)
      whole.n == items.size &&
        guaranteed.subsetOf(whole.counters.keySet) &&
        guaranteed.subsetOf(merged.counters.keySet) &&
        whole.counters.size <= k && merged.counters.size <= k
    }

  property("HLL state merge is commutative and idempotent") =
    Prop.forAllNoShrink(Gen.listOf(Gen.chooseNum(0L, (1L << 60) - 1))) { hs =>
      import org.apache.spark.sql.graftshim.HllState
      val (a, b) = hs.splitAt(hs.length / 2)
      val stA = new HllState; a.foreach(stA.update)
      val stB = new HllState; b.foreach(stB.update)
      val ab = new HllState; ab.mergeFrom(stA); ab.mergeFrom(stB)
      val ba = new HllState; ba.mergeFrom(stB); ba.mergeFrom(stA)
      val whole = new HllState; hs.foreach(whole.update)
      val again = new HllState; again.mergeFrom(ab); again.mergeFrom(ab)
      ab.regs.sameElements(ba.regs) &&
        ab.regs.sameElements(whole.regs) &&
        again.regs.sameElements(ab.regs)
    }
}
