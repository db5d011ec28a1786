package graft

import graft.ops.Ops
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Golden/unit tests for the Ops combinators, mirroring the reference's
  * MRUnit pairs (reference src/test/.../TemperatureTest.java:19-30) on
  * synthesized fixtures (same field offsets, locally generated data).
  */
class OpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Synthesize a 105-char NCDC-layout line: year at Java offsets
    * [15,19), signed 5-char temperature at [87,92).
    */
  def ncdcLine(year: Int, temp: Int): String = {
    val sb = new StringBuilder("0" * 105)
    sb.replace(15, 19, f"$year%04d")
    val sign = if (temp < 0) "-" else "+"
    sb.replace(87, 92, f"$sign${math.abs(temp)}%04d")
    sb.toString
  }

  test("fixed-width projection parses year and signed temp (map golden)") {
    val df = Seq(ncdcLine(1950, -11)).toDF("value")
      .select(Ops.fixedWidth($"value", 15, 19).as("year"),
              Ops.fixedWidthInt($"value", 87, 92).as("temp"))
    assert(df.as[(String, Int)].collect().toSeq == Seq(("1950", -11)))
  }

  test("group-by max (reduce golden): (1950,[10,5]) -> (1950,10)") {
    val df = Seq(("1950", 10), ("1950", 5)).toDF("year", "temp")
      .groupBy($"year").agg(max($"temp").as("max_temp"))
    assert(df.as[(String, Int)].collect().toSeq == Seq(("1950", 10)))
  }

  test("micro end-to-end: 4 synthesized years -> 4 maxima") {
    val lines = Seq(
      ncdcLine(1950, -11), ncdcLine(1950, -20),
      ncdcLine(1951, -12), ncdcLine(1952, 3), ncdcLine(1952, -1))
    val got = lines.toDF("value")
      .select(Ops.fixedWidth($"value", 15, 19).as("year"),
              Ops.fixedWidthInt($"value", 87, 92).as("temp"))
      .groupBy($"year").agg(max($"temp").as("m"))
      .as[(String, Int)].collect().toMap
    assert(got == Map("1950" -> -11, "1951" -> -12, "1952" -> 3))
  }

  test("fixed-width parse DROPS malformed rows instead of crashing (ANSI mode)") {
    // short line + alpha garbage in the temp slice: the reference drops
    // these (P3); under Spark 4 ANSI a plain cast would throw mid-job.
    val lines = Seq(ncdcLine(1950, -11), "too short",
                    ncdcLine(1951, 5).patch(87, "XXXXX", 5))
    val got = lines.toDF("value")
      .select(Ops.fixedWidth($"value", 15, 19).as("year"),
              Ops.fixedWidthInt($"value", 87, 92).as("temp"))
      .filter($"temp".isNotNull)
      .as[(String, Int)].collect().toSeq
    assert(got == Seq(("1950", -11)))
  }

  test("heap top-K accepts int score/id via implicit casts") {
    val df = Seq((1, 5, 10), (1, 3, 11), (1, 7, 12), (2, 1, 20))
      .toDF("g", "v", "id") // all IntegerType
    val got = Ops.topKHeap(df, Seq("g"), col("v"), col("id"), 2)
      .select($"g", $"id", $"score", $"rn").as[(Int, Long, Double, Long)]
      .collect().toSet
    assert(got == Set((1, 11L, 3.0, 1L), (1, 10L, 5.0, 2L), (2, 20L, 1.0, 1L)))
  }

  test("permissive parse defaults to 0.0 on garbage (UserHotcar.java:57-62)") {
    val got = Seq("1.5", "abc", "", "2", "-3.25")
      .toDF("s").select(Ops.permissiveDouble($"s").as("v"))
      .as[Double].collect().toSeq
    assert(got == Seq(1.5, 0.0, 0.0, 2.0, -3.25))
  }

  test("unpackPairs explodes id@val lists (intended [$] split semantics)") {
    val df = Seq(("u1", "7@0.9$9@0.1")).toDF("uid", "cityid")
    val got = Ops.unpackPairs(df, "cityid", "[$]", "city", "score")
      .select($"uid", $"city", $"score").as[(String, String, String)]
      .collect().toSet
    assert(got == Set(("u1", "7", "0.9"), ("u1", "9", "0.1")))
  }

  test("topKPerGroup: bounded per group, deterministic ties (property)") {
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 5) {
      val xs = List.fill(1 + rnd.nextInt(200))(rnd.nextInt(50))
      val df = xs.zipWithIndex.map { case (v, i) => (v % 3, v, i.toLong) }
        .toDF("g", "v", "id")
      val topped = Ops.topKPerGroup(df, Seq("g"), col("v"), col("id"), 5)
      val counts = topped.groupBy($"g").count().as[(Int, Long)].collect()
      assert(counts.forall(_._2 <= 5))
      // determinism: same input twice -> identical top-K rows
      val again = Ops.topKPerGroup(df, Seq("g"), col("v"), col("id"), 5)
      assert(topped.collect().toSet == again.collect().toSet)
    }
  }

  test("salted top-K == plain top-K (skew path is semantics-preserving)") {
    val rnd = new scala.util.Random(7)
    // power-law-ish: group 0 gets ~80% of rows (the hot key)
    val rows = (1 to 3000).map { i =>
      val g = if (rnd.nextDouble() < 0.8) 0 else rnd.nextInt(5)
      (g, rnd.nextDouble() * 100, i.toLong)
    }
    val df = rows.toDF("g", "v", "id")
    val plain = Ops.topKPerGroup(df, Seq("g"), col("v"), col("id"), 7)
      .select($"g", $"v", $"id", $"rn").collect().toSet
    val salted = Ops.topKPerGroupSalted(df, Seq("g"), col("v"), col("id"), 7)
      .select($"g", $"v", $"id", $"rn").collect().toSet
    assert(salted == plain)
  }

  test("heap top-K aggregate == window top-K (bounded shuffle path)") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 2000).map(i => (rnd.nextInt(20), rnd.nextDouble() * 100, i.toLong))
    val df = rows.toDF("g", "v", "id").repartition(8)
    val window = Ops.topKPerGroup(df, Seq("g"), col("v"), col("id"), 5)
      .select($"g", $"id", $"v".as("score"), $"rn")
      .as[(Int, Long, Double, Long)].collect().toSet
    val heap = Ops.topKHeap(df, Seq("g"), col("v"), col("id"), 5)
      .select($"g", $"id", $"score", $"rn")
      .as[(Int, Long, Double, Long)].collect().toSet
    assert(heap == window)
  }

  test("minMaxNorm: [0,1] range and max==min guard") {
    val df = Seq((1, 10.0), (1, 20.0), (1, 30.0), (2, 7.0))
      .toDF("g", "x")
      .select($"g", $"x", Ops.minMaxNorm($"x", Seq($"g")).as("s"))
    val byRow = df.as[(Int, Double, Double)].collect().toSet
    assert(byRow == Set((1, 10.0, 1.0), (1, 20.0, 0.5), (1, 30.0, 0.0),
                        (2, 7.0, 1.0))) // singleton group -> guard, not NaN
  }

  test("exactSum is order-independent (decimal path)") {
    val xs = Seq(0.1, 0.2, 0.3, 1e9 + 0.07, -1e9)
    val a = xs.toDF("x").agg(Ops.exactSum($"x")).as[Double].head()
    val b = xs.reverse.toDF("x").agg(Ops.exactSum($"x")).as[Double].head()
    assert(a == b && math.abs(a - 0.67) < 1e-9)
  }

  test("shingles: distinct word n-grams") {
    val got = Seq("a b c d").toDF("t")
      .select(Ops.shingles(Ops.tokens($"t"), 3).as("sh"))
      .as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
  }

  test("native shingles == HOF shingles on the real corpus") {
    val toks = Ops.tokens(col("text"))
    val both = Tables.documents(spark, TestSpark.Sf)
      .select(Ops.shingles(toks, 3).as("native"),
              Ops.shinglesHof(toks, 3).as("hof"))
      .as[(Seq[String], Seq[String])].collect()
    assert(both.forall { case (a, b) => a == b })
    // edge: fewer tokens than n
    val short = Seq("a b", "x").toDF("text")
      .select(Ops.shingles(Ops.tokens(col("text")), 3).as("n"),
              Ops.shinglesHof(Ops.tokens(col("text")), 3).as("h"))
      .as[(Seq[String], Seq[String])].collect()
    assert(short.forall { case (a, b) => a == b })
  }

  test("native minhash signature == HOF signature on the real corpus") {
    val xs = transform(Ops.shingles(Ops.tokens(col("text")), 3),
                       g => Ops.md5Bits60(g) % Ops.HashModP)
    val both = Tables.documents(spark, TestSpark.Sf)
      .select(Ops.minHashSignatureMod(xs, 32).as("native"),
              Ops.minHashSignatureModHof(xs, 32).as("hof"))
    assert(both.filter(!(col("native") <=> col("hof"))).count() == 0)
    // edge: empty gram array -> nHashes nulls in both formulations
    val empty = Seq(Seq.empty[Long]).toDF("xs")
      .select(Ops.minHashSignatureMod($"xs", 4).as("n"),
              Ops.minHashSignatureModHof($"xs", 4).as("h"))
    assert(empty.filter(!(col("n") <=> col("h"))).count() == 0)
    val row = empty.select(col("n")).head().getSeq[Any](0)
    assert(row == Seq(null, null, null, null))
  }

  test("minhash signature: identical docs identical, length fixed") {
    val df = Seq("x y z w", "x y z w", "totally different words here")
      .toDF("t")
      .select(Ops.minHashSignatureMod(
        transform(Ops.shingles(Ops.tokens($"t"), 2),
                  g => Ops.md5Bits60(g) % Ops.HashModP), 16).as("sig"))
    val sigs = df.as[Seq[Long]].collect()
    assert(sigs.forall(_.length == 16))
    assert(sigs(0) == sigs(1) && sigs(0) != sigs(2))
  }

  test("rollingHash: deterministic, prefix-sensitive") {
    val got = Seq("hello world", "hello world", "jello world")
      .toDF("t").select(Ops.rollingHash($"t").as("h")).as[Long].collect()
    assert(got(0) == got(1) && got(0) != got(2))
    assert(got.forall(h => h >= 0 && h < 1000000007L))
  }

  test("native rollingHash == HOF rollingHash on the real corpus + edges") {
    val both = Tables.documents(spark, TestSpark.Sf)
      .select(Ops.rollingHash(Ops.normalizeText(col("text"))).as("n"),
              Ops.rollingHashHof(Ops.normalizeText(col("text"))).as("h"))
    assert(both.filter(col("n") =!= col("h")).count() == 0)
    val edges = Seq("", "a", "é", "x" * 200)
      .toDF("t").select(Ops.rollingHash($"t").as("n"),
                        Ops.rollingHashHof($"t").as("h"))
      .as[(Long, Long)].collect()
    assert(edges.forall { case (a, b) => a == b })
  }

  test("native alnumSpaceCount == regex formulation on the real corpus + edges") {
    def regexForm(c: org.apache.spark.sql.Column) =
      length(regexp_replace(c, "[^a-zA-Z0-9 ]", ""))
    val both = Tables.documents(spark, TestSpark.Sf)
      .select(Ops.alnumSpaceCount(col("text")).as("n"),
              regexForm(col("text")).as("r"))
    assert(both.filter(col("n") =!= col("r")).count() == 0)
    // Edges: empty, all-kept, all-dropped, multi-byte UTF-8 (é, 漢 —
    // no continuation byte may be miscounted as ASCII), mixed.
    val edges = Seq("", "abc 09Z", "!@#$%^&*", "héllo wörld", "漢字 a1!")
      .toDF("t").select(Ops.alnumSpaceCount($"t").as("n"),
                        regexForm($"t").as("r"))
      .as[(Int, Int)].collect()
    assert(edges.forall { case (a, b) => a == b })
    assert(edges.map(_._1).toSeq == Seq(0, 7, 0, 9, 3))
  }

  test("cosine: self-similarity 1.0, orthogonal 0.0") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(1.0f, 2.0f, 3.0f)),
                 (Seq(1.0f, 0.0f, 0.0f), Seq(0.0f, 1.0f, 0.0f)))
      .toDF("a", "b").select(Ops.cosine($"a", $"b").as("c"))
    val got = df.as[Double].collect()
    assert(math.abs(got(0) - 1.0) < 1e-12 && got(1) == 0.0)
  }

  test("matrixDotRank/signBucket == compositional dot formulation") {
    import graft.functions.VectorFunctions
    val dim = 4
    // 3 codebook rows, chosen so vec (1,0,0,0) ties rows 0 and 2 on dot
    // — the tie must break toward the smaller row id.
    val rows = Array(
      Array(1.0f, 0.0f, 0.0f, 0.0f),
      Array(0.0f, 1.0f, 0.0f, 0.0f),
      Array(1.0f, 0.0f, 0.0f, 0.0f))
    val mat = rows.flatten
    val vecs = Seq(Seq(1.0f, 0.0f, 0.0f, 0.0f), Seq(0.1f, 2.0f, -1.0f, 0.5f),
                   Seq(-1.0f, -1.0f, 1.0f, 1.0f))
    val df = vecs.toDF("v")
      .select($"v", VectorFunctions.matrixDotRank($"v", mat, dim).as("rank"),
              VectorFunctions.signBucket($"v", mat, dim).as("bucket"))
    val got = df.as[(Seq[Float], Seq[Int], Long)].collect()
    for ((v, rank, bucket) <- got) {
      def dot(r: Array[Float]) = r.zip(v).map { case (a, b) => a.toDouble * b.toDouble }.sum
      val expRank = rows.indices.sortBy(i => (-dot(rows(i)), i))
      val expBucket = rows.indices.map(i => if (dot(rows(i)) >= 0) 1L << i else 0L).sum
      assert(rank == expRank, s"rank for $v")
      assert(bucket == expBucket, s"bucket for $v")
    }
  }

  test("matrix expressions: structurally identical instances are equal (CSE-able)") {
    import org.apache.spark.sql.graftshim.{FloatMatrixDotRank, FloatMatrixSignBucket, Shim}
    import scala.collection.immutable.ArraySeq
    val child = Shim.expression(col("v"))
    val m1 = ArraySeq.unsafeWrapArray(Array(1.0f, 2.0f, 3.0f, 4.0f))
    val m2 = ArraySeq.unsafeWrapArray(Array(1.0f, 2.0f, 3.0f, 4.0f))
    val a = FloatMatrixDotRank(child, m1, 2)
    val b = FloatMatrixDotRank(child, m2, 2)
    assert(a == b && a.hashCode == b.hashCode && a.semanticEquals(b))
    val sa = FloatMatrixSignBucket(child, m1, 2)
    val sb = FloatMatrixSignBucket(child, m2, 2)
    assert(sa == sb && sa.semanticEquals(sb))
  }

  test("MisraGriesAgg: serde round-trips items longer than 65535 UTF-8 bytes") {
    import org.apache.spark.sql.graftshim.{MgState, MisraGriesAgg}
    import org.apache.spark.sql.catalyst.expressions.Literal
    val agg = MisraGriesAgg(Literal("x"), 4)
    val st = new MgState(4)
    val big = "é" * 50000 // 100k UTF-8 bytes: writeUTF would throw
    st.update(big); st.update(big); st.update("small")
    val back = agg.deserialize(agg.serialize(st))
    assert(back.n == st.n && back.counters == st.counters)
  }

  test("MisraGriesAgg: NULL items count toward n_total but never the counters") {
    import graft.functions.VectorFunctions
    VectorFunctions.registerAll(spark)
    Seq(Some("a"), Some("a"), None, Some("b"), None)
      .toDF("s").createOrReplaceTempView("mg_null_in")
    val row = spark.sql(
      "SELECT graft_heavy_hitters(s, 3) AS hh FROM mg_null_in")
      .select($"hh.n_total", $"hh.candidates.item").collect()(0)
    assert(row.getLong(0) == 5L) // == count(*), including NULLs
    assert(row.getSeq[String](1).toSet == Set("a", "b"))
  }

  test("graft_heavy_hitters: typed error on bad k, foldable k accepted") {
    import graft.functions.VectorFunctions
    VectorFunctions.registerAll(spark)
    Seq("a", "b").toDF("s").createOrReplaceTempView("mg_k_in")
    // foldable integral expression (1+2) folds before our builder sees it
    assert(spark.sql("SELECT graft_heavy_hitters(s, 1+2) FROM mg_k_in")
      .collect().length == 1)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_heavy_hitters(s, 2.5) FROM mg_k_in").collect()
    }
    assert(err.getMessage.contains("constant integer"),
      s"unexpected message: ${err.getMessage}")
  }

  test("graft_rolling_hash SQL function: default + explicit maxLen") {
    import graft.functions.VectorFunctions
    VectorFunctions.registerAll(spark)
    Seq("abc").toDF("s").createOrReplaceTempView("rh_in")
    val full = spark.sql("SELECT graft_rolling_hash(s) FROM rh_in")
      .collect()(0).getLong(0)
    val dfSide = Seq("abc").toDF("s")
      .select(Ops.rollingHash($"s")).collect()(0).getLong(0)
    assert(full == dfSide, "SQL function must equal the Column API")
    val twoOnly = spark.sql("SELECT graft_rolling_hash(s, 1+1) FROM rh_in")
      .collect()(0).getLong(0)
    assert(twoOnly == ('a'.toLong * 31 + 'b') % 1000000007L)
    val err = intercept[Exception] {
      spark.sql("SELECT graft_rolling_hash(s, 2.5) FROM rh_in").collect()
    }
    assert(err.getMessage.contains("foldable integral"),
      s"unexpected message: ${err.getMessage}")
  }
}
