package graft

import graft.ext.Corpus
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck pin: the distributed min-label propagation equals a
  * driver-side union-find on random graphs — the adversarial check the
  * fixed verify corpus can't provide (odd diameters, isolated vertices,
  * multi-edges, self-loops).
  */
object CorpusProps extends Properties("graft.Corpus") {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // Each case runs a full iterative Spark job cascade — cap the count.
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  val graphGen: Gen[(List[Long], List[(Long, Long)])] = for {
    n <- Gen.chooseNum(1, 14)
    vs = (1L to n.toLong).toList
    m <- Gen.chooseNum(0, 16)
    es <- Gen.listOfN(m, for {
      a <- Gen.chooseNum(1L, n.toLong)
      b <- Gen.chooseNum(1L, n.toLong)
    } yield (a, b))
  } yield (vs, es)

  private def unionFind(vs: List[Long], es: List[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map(vs.map(v => v -> v): _*)
    def find(x: Long): Long = {
      var r = x
      while (parent(r) != r) r = parent(r)
      r
    }
    es.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    vs.map { v =>
      // component id = min member: chase to root, which union-by-min keeps minimal
      v -> find(v)
    }.toMap
  }

  property("minLabelPropagate == union-find component minima") =
    Prop.forAllNoShrink(graphGen) { case (vs, es) =>
      val vertices = vs.toDF("doc_id")
      val e0 = es.toDF("src", "dst")
      val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
      val got = Corpus.minLabelPropagate(vertices, edges)
        .as[(Long, Long)].collect().toMap
      val want = unionFind(vs, es)
      got == want
    }

  // ------------------------------------------------------------------
  // boilerplateRemove invariants on random corpora: a driver-side
  // re-implementation of the segment/df/filter/reassemble pipeline must
  // agree exactly, covering shapes the fixed corpus can't (doc counts
  // of 1, all-duplicate corpora, token counts straddling the segment
  // boundary, repeated segments WITHIN one doc — df counts docs, not
  // occurrences).
  // ------------------------------------------------------------------
  val corpusGen: Gen[List[(Long, String)]] = for {
    nDocs <- Gen.chooseNum(1, 8)
    vocab <- Gen.chooseNum(2, 5) // tiny vocab → cross-doc segment collisions
    docs <- Gen.listOfN(nDocs, for {
      nToks <- Gen.chooseNum(1, 23)
      toks <- Gen.listOfN(nToks, Gen.chooseNum(1, vocab).map(i => s"w$i"))
    } yield toks.mkString(" "))
  } yield docs.zipWithIndex.map { case (t, i) => (i.toLong + 1, t) }

  private def refBoilerplate(docs: List[(Long, String)])
      : Map[Long, (Long, Long, String)] = {
    val w = Corpus.BoilerSegWords
    val segs = docs.map { case (id, t) =>
      id -> t.split(" ", -1).grouped(w).map(_.mkString(" ")).toVector
    }.toMap
    val df = segs.values.flatMap(_.distinct).groupBy(identity)
      .map { case (s, occ) => s -> occ.size }
    docs.map { case (id, _) =>
      val kept = segs(id).filter(s => df(s) < Corpus.BoilerDfCap)
      id -> ((segs(id).length.toLong, kept.length.toLong, kept.mkString(" ")))
    }.toMap
  }

  property("boilerplateRemove == driver-side reference pipeline") =
    Prop.forAllNoShrink(corpusGen) { docs =>
      val got = Corpus.boilerplateRemove(docs.toDF("doc_id", "text"))
        .as[(Long, Long, Long, Double, String)].collect()
        .map { case (id, n, k, _, t) => id -> ((n, k, t)) }.toMap
      got == refBoilerplate(docs)
    }

  property("warm-started propagation reaches the same fixpoint") =
    Prop.forAllNoShrink(graphGen) { case (vs, es) =>
      val vertices = vs.toDF("doc_id")
      val e0 = es.toDF("src", "dst")
      val edges = e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst")))
      // valid warm start: each vertex labeled with the min of itself and
      // its direct neighbors (one manual propagation round)
      val nbrMin = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (v, ns) => v -> ns.map(_._2).min }
      val init = vs.map(v => v -> math.min(v, nbrMin.getOrElse(v, v)))
        .toDF("doc_id", "label")
      val got = Corpus.minLabelPropagate(vertices, edges, Some(init))
        .as[(Long, Long)].collect().toMap
      got == unionFind(vs, es)
    }
}
