package graft

import graft.functions.VectorFunctions
import graft.sources.TextTables
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Text-source round-trips in the reference's own record formats
  * (FIXTURES.md §1.3-1.5), partitioned-directory pruning, and the native
  * Catalyst vector expressions (value parity vs the HOF formulation +
  * SQL registration).
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  def tmp(): String = Files.createTempDirectory("graft_src").toString

  test("\\u0001-keyed JSON profile source parses and drops malformed rows") {
    val dir = tmp()
    val lines = Seq(
      "u1{\"bycar_profile\": {\"cityid\": \"7@0.9$9@0.1\", \"priceid\": \"150000.0\"}}",
      "u2{\"bycar_profile\": {\"cityid\": \"3@0.5\", \"priceid\": \"garbage\"}}",
      "malformed-no-delimiter",
      "u3{\"other\": 1}")
    TextTables.writeTextUncompressed(lines.toDF("value"), s"$dir/profiles")
    val got = TextTables.parseProfiles(
        TextTables.readLines(spark, s"$dir/profiles"))
      .as[(String, String, Float)].collect().sortBy(_._1)
    assert(got.toSeq == Seq(
      ("u1", "7@0.9$9@0.1", 150000.0f),
      ("u2", "3@0.5", 0.0f))) // permissive priceid default; u3/malformed dropped
  }

  test("city->cars side source + sideInputMap broadcast") {
    val dir = tmp()
    val lines = Seq(
      "7{\"infoidlist\": \"101@99000,102@150000\"}",
      "9{\"infoidlist\": \"201@80000\"}")
    TextTables.writeTextUncompressed(lines.toDF("value"), s"$dir/cars")
    val cars = TextTables.parseCityCars(TextTables.readLines(spark, s"$dir/cars"))
    val bc = TextTables.sideInputMap(cars, "city_id", "infoidlist")
    assert(bc.value == Map("7" -> "101@99000,102@150000", "9" -> "201@80000"))
  }

  test("overwrite semantics: second write replaces the first (S7)") {
    val dir = tmp()
    TextTables.writeTextUncompressed(Seq("old").toDF("value"), s"$dir/out")
    TextTables.writeTextUncompressed(Seq("new1", "new2").toDF("value"), s"$dir/out")
    val back = spark.read.text(s"$dir/out").as[String].collect().sorted
    assert(back.toSeq == Seq("new1", "new2"))
  }

  test("LZO text round-trip through the Hadoop codec path (S8)") {
    val dir = tmp()
    val rows = (1 to 500).map(i => s"lzo-row-$i:${"x" * (i % 37)}")
    TextTables.writeTextLzo(rows.toDF("value"), s"$dir/lzo")
    // the sink must produce framed lzop container files, not plain text
    val files = new java.io.File(s"$dir/lzo").listFiles()
      .map(_.getName).filter(_.startsWith("part-"))
    assert(files.nonEmpty && files.forall(_.endsWith(".lzo")),
      s"expected .lzo parts, got ${files.toSeq}")
    // magic check: lzop files open with the 9-byte lzop signature
    val partPath = new java.io.File(s"$dir/lzo").listFiles()
      .find(_.getName.endsWith(".lzo")).get
    val head = java.nio.file.Files.readAllBytes(partPath.toPath).take(9)
    assert(head.sameElements(Array(0x89, 'L', 'Z', 'O', 0, 0x0d, 0x0a, 0x1a, 0x0a)
      .map(_.toByte)), "lzop magic bytes missing")
    // read side resolves .lzo by extension through the codec factory
    TextTables.enableLzo(spark)
    val back = spark.read.text(s"$dir/lzo").as[String].collect().sorted
    assert(back.toSeq == rows.sorted)
  }

  test("dt= partitioned source prunes to one partition (S4)") {
    val dir = tmp()
    for (dt <- Seq("2026-08-10", "2026-08-11", "2026-08-12"))
      TextTables.writeTextUncompressed(
        Seq(s"row-of-$dt").toDF("value"), s"$dir/side/dt=$dt")
    val yesterday = TextTables.yesterday(java.time.LocalDate.parse("2026-08-12"))
    val df = TextTables.readDatePartition(spark, s"$dir/side", yesterday)
    assert(df.as[(String, String)].collect().toSeq == Seq(("row-of-2026-08-11", "2026-08-11")))
    // partition pruning must reach the file index, not a post-scan filter
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(dt"), scan)
  }

  test("weather fixed-width source end-to-end (BootStrap shape)") {
    val dir = tmp()
    def line(y: Int, t: Int) = {
      val sb = new StringBuilder("0" * 105)
      sb.replace(15, 19, y.toString)
      sb.replace(87, 92, f"${if (t < 0) "-" else "+"}${math.abs(t)}%04d")
      sb.toString
    }
    TextTables.writeTextUncompressed(
      Seq(line(1950, -11), line(1950, 5), line(1951, 22)).toDF("value"),
      s"$dir/weather")
    val got = TextTables.parseWeather(TextTables.readLines(spark, s"$dir/weather"))
      .groupBy($"year").agg(max($"temp").as("m"))
      .as[(String, Int)].collect().toMap
    assert(got == Map("1950" -> 5, "1951" -> 22))
  }

  test("codec support (S8): compressed parquet/text round-trips") {
    val dir = tmp()
    val df = Tables.customer(spark, TestSpark.Sf)
      .select($"c_custkey", $"c_name")
    df.write.option("compression", "zstd").parquet(s"$dir/zstd")
    df.write.option("compression", "snappy").parquet(s"$dir/snappy")
    Seq("a", "b").toDF("value").write.option("compression", "gzip")
      .text(s"$dir/gz")
    assert(spark.read.parquet(s"$dir/zstd").count() == df.count())
    assert(spark.read.parquet(s"$dir/snappy").count() == df.count())
    assert(spark.read.text(s"$dir/gz").count() == 2)
    val files = new java.io.File(s"$dir/gz").listFiles().map(_.getName)
    assert(files.exists(_.endsWith(".gz")), files.mkString(","))
  }

  test("ORC source/sink: round-trip with predicate pushdown into the scan") {
    val dir = tmp()
    val df = Tables.customer(spark, TestSpark.Sf)
      .select($"c_custkey", $"c_name", $"c_acctbal")
    df.write.orc(s"$dir/orc")
    val back = spark.read.orc(s"$dir/orc")
    assert(back.count() == df.count())
    assert(back.orderBy($"c_custkey").as[(Long, String, Double)].collect().toSeq ==
           df.orderBy($"c_custkey").as[(Long, String, Double)].collect().toSeq)
    val plan = back.filter($"c_custkey" === 7L).queryExecution
      .executedPlan.toString
    assert(plan.contains("EqualTo(c_custkey,7)"), plan.take(400))
  }

  test("native vector expressions == HOF formulation, bit-exact") {
    val e = Tables.embeddings(spark, TestSpark.Sf).limit(50)
      .select($"vec_id", $"embedding")
    val both = e.select(
      VectorFunctions.vecDot($"embedding", $"embedding").as("native"),
      graft.ops.Ops.dot($"embedding", $"embedding").as("hof"),
      VectorFunctions.vecNorm($"embedding").as("nnorm"),
      graft.ops.Ops.l2Norm($"embedding").as("hnorm"))
    val rows = both.as[(Double, Double, Double, Double)].collect()
    assert(rows.forall(r => r._1 == r._2 && r._3 == r._4)) // bitwise equal
  }

  test("native expressions registered for SQL use") {
    VectorFunctions.registerAll(spark)
    Tables.embeddings(spark, TestSpark.Sf).limit(3).createOrReplaceTempView("emb_t")
    val r = spark.sql(
      """SELECT graft_dot(embedding, embedding) AS d,
        |       graft_norm(embedding) AS n,
        |       graft_hamming(7, 1) AS h
        |FROM emb_t""".stripMargin).collect()
    assert(r.length == 3)
    assert(r.forall(x => math.abs(x.getDouble(0) - x.getDouble(1) * x.getDouble(1)) < 1e-9))
    assert(r.forall(_.getInt(2) == 2))
  }

  test("hamming distance pairs simhash signatures") {
    import graft.ext.Dedup
    val sh = Dedup.qDedupSimhash(spark, TestSpark.Sf).limit(20)
      .select($"doc_id", $"simhash")
    val a = sh.toDF("id_a", "h_a")
    val b = sh.toDF("id_b", "h_b")
    val d = a.crossJoin(b).filter($"id_a" < $"id_b")
      .select(VectorFunctions.hamming($"h_a", $"h_b").as("hd"))
      .as[Int].collect()
    assert(d.forall(x => x >= 0 && x <= 64))
  }

  test("bucketed tables: co-located join runs with NO shuffle exchange") {
    import graft.sources.Bucketing
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path so the exchange (or its absence) is
      // what we observe, not a broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(
        Tables.orders(spark, TestSpark.Sf).select($"o_custkey", $"o_totalprice"),
        "b_orders", "o_custkey", 8)
      Bucketing.writeBucketed(
        Tables.customer(spark, TestSpark.Sf)
          .select($"c_custkey".as("o_custkey"), $"c_acctbal"),
        "b_customer", "o_custkey", 8)
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_customer", "o_custkey")
      assert(joined.count() == Tables.orders(spark, TestSpark.Sf).count())
      val plan = joined.queryExecution.executedPlan.toString
        .split("== Initial Plan ==").head
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      // control: the same join over plain parquet DOES exchange
      val unbucketed = Tables.orders(spark, TestSpark.Sf)
        .select($"o_custkey", $"o_totalprice")
        .join(Tables.customer(spark, TestSpark.Sf)
                .select($"c_custkey".as("o_custkey"), $"c_acctbal"),
              Seq("o_custkey"))
      unbucketed.count()
      val controlPlan = unbucketed.queryExecution.executedPlan.toString
      assert(controlPlan.contains("Exchange hashpartitioning"), "control should shuffle")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("FsUtil (S5): write/read/ls/delete round-trip on the local scheme") {
    import graft.sources.FsUtil
    val dir = tmp()
    FsUtil.writeString(s"$dir/a/x.txt", "hello graft")
    FsUtil.writeString(s"$dir/a/b/y.txt", "nested")
    assert(FsUtil.readString(s"$dir/a/x.txt") == "hello graft")
    val listed = FsUtil.ls(s"$dir/a")
    assert(listed.count(_.endsWith(".txt")) == 2)
    assert(FsUtil.deleteIfExists(s"$dir/a/b"))
    assert(FsUtil.ls(s"$dir/a").count(_.endsWith(".txt")) == 1)
    // overwrite semantics (create(true)): second write replaces
    FsUtil.writeString(s"$dir/a/x.txt", "v2")
    assert(FsUtil.readString(s"$dir/a/x.txt") == "v2")
  }

  test("IVF ANN: probes only its cells, ranks descending, finds brute-force hits") {
    import graft.ext.Similarity
    val ivf = Similarity.qAnnIvf(spark, TestSpark.Sf)
      .select($"qid", $"cell", $"vec_id", $"score", $"rn")
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(ivf.nonEmpty)
    ivf.groupBy(_._1).foreach { case (_, g) =>
      val scores = g.sortBy(_._5).map(_._4)
      assert(scores.sameElements(scores.sortBy(-(_: Double))))
      assert(g.length <= Similarity.TopK)
    }
    // quantified recall vs brute force: a trained 2-probe/16-cell search
    // scans ~12.5% of the corpus; measured recall is ~0.48 at this SF —
    // assert a conservative floor well above the ~0.125 of random cells
    val exact = Similarity.qSimilarityTopk(spark, TestSpark.Sf)
      .select($"qid", $"vec_id").as[(Long, Long)].collect().toSet
    val approx = ivf.map(r => (r._1, r._3)).toSet
    val recall = approx.intersect(exact).size.toDouble / exact.size
    assert(recall >= 0.3, s"trained-IVF recall $recall below floor")
  }

  test("IVF codebook training is deterministic and yields balanced cells") {
    import graft.ext.Similarity
    import graft.functions.VectorFunctions
    val e0 = Tables.embeddings(spark, TestSpark.Sf)
    val m1 = Similarity.trainCodebook(e0)
    val m2 = Similarity.trainCodebook(e0)
    assert(m1.sameElements(m2), "k-means must be run-deterministic")
    assert(m1.length == Similarity.NumCells * Similarity.Dim)
    // full-corpus assignment against the trained codebook: pruning only
    // works if vectors spread across cells instead of piling into one
    val cells = e0.select(
        element_at(VectorFunctions.matrixDotRank(
          $"embedding", m1, Similarity.Dim), 1).as("cell"))
      .groupBy($"cell").count().as[(Int, Long)].collect()
    val total = cells.map(_._2).sum
    assert(cells.length >= Similarity.NumCells / 2,
      s"only ${cells.length} populated cells")
    assert(cells.map(_._2).max.toDouble / total <= 0.5,
      "one cell holds over half the corpus - degenerate codebook")
  }

  test("dt= partitioned WRITE: layout, pruned read-back, dynamic overwrite") {
    import graft.sources.TextTables
    val tmp = java.nio.file.Files.createTempDirectory("graft_dtwrite").toString
    val ev = Tables.events(spark, TestSpark.Sf)
      .select($"event_id", $"user_id", $"event_type", $"ts")
    TextTables.writeDatePartitioned(ev, tmp, "ts")
    val dts = new java.io.File(tmp).listFiles().map(_.getName)
      .filter(_.startsWith("dt=")).sorted
    assert(dts.nonEmpty, "hive-style dt= dirs must exist")
    val oneDay = dts.head.stripPrefix("dt=")
    val back = spark.read.option("basePath", tmp).parquet(tmp)
      .filter($"dt" === oneDay)
    val expected = ev.filter(date_format($"ts", "yyyy-MM-dd") === oneDay).count()
    assert(back.count() == expected)
    // partition pruning: the executed scan must only touch the one dt dir
    val scanDesc = back.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PartitionFilters") &&
           scanDesc.contains(s"= $oneDay)"), // attr prints as dt#<exprId>
           s"expected partition filter in plan")
    // idempotent daily rerun: rewriting ONE day's slice must not drop others
    val total = spark.read.parquet(tmp).count()
    TextTables.writeDatePartitioned(
      ev.filter(date_format($"ts", "yyyy-MM-dd") === oneDay), tmp, "ts")
    assert(spark.read.parquet(tmp).count() == total,
           "dynamic overwrite must leave other partitions intact")
  }

  test("daily pipeline loop: dt= write -> pruned read -> incremental compaction") {
    // The reference's daily cadence (UserNewcar dt=<yesterday>) as a full
    // loop: land events partitioned by day, then for each day read ONLY
    // that partition and fold it into a compacted latest-per-key state,
    // asserting the incremental result equals the one-shot batch answer.
    import graft.sources.TextTables
    import org.apache.spark.sql.DataFrame
    val tmp = java.nio.file.Files.createTempDirectory("graft_daily").toString
    val ev = Tables.events(spark, TestSpark.Sf)
      .select($"event_id", $"user_id", $"event_type", $"ts")
    TextTables.writeDatePartitioned(ev, tmp, "ts")
    val days = new java.io.File(tmp).listFiles().map(_.getName)
      .filter(_.startsWith("dt=")).map(_.stripPrefix("dt=")).sorted
    assert(days.length > 1, "need multiple days for an incremental loop")
    def latest(df: DataFrame): DataFrame = {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy($"user_id", $"event_type")
        .orderBy($"ts".desc, $"event_id".desc)
      df.withColumn("rn", row_number().over(w)).filter($"rn" === 1).drop("rn")
    }
    val state = days.foldLeft(Option.empty[DataFrame]) { (acc, day) =>
      val slice = spark.read.option("basePath", tmp).parquet(tmp)
        .filter($"dt" === day)
        .select($"event_id", $"user_id", $"event_type", $"ts")
      Some(latest(acc.fold(slice)(_.unionByName(slice))))
    }.get.select($"user_id", $"event_type", $"event_id")
      .as[(Long, String, Long)].collect().toSet
    val oneShot = latest(ev).select($"user_id", $"event_type", $"event_id")
      .as[(Long, String, Long)].collect().toSet
    assert(state == oneShot, "incremental daily fold must equal one-shot batch")
  }

  test("JSONL + CSV sources: schema-pinned round-trip, permissive malformed rows") {
    import graft.sources.JsonCsv
    import org.apache.spark.sql.types._
    val df = Tables.customer(spark, TestSpark.Sf)
      .select($"c_custkey", $"c_name", $"c_acctbal")
    val schema = StructType(Seq(
      StructField("c_custkey", LongType), StructField("c_name", StringType),
      StructField("c_acctbal", DoubleType)))
    val tmp = java.nio.file.Files.createTempDirectory("graft_jsoncsv").toString
    JsonCsv.writeJsonl(df, s"$tmp/j")
    JsonCsv.writeCsv(df, s"$tmp/c", sep = "|")
    val jBack = JsonCsv.readJsonl(spark, s"$tmp/j", schema)
    val cBack = JsonCsv.readCsv(spark, s"$tmp/c", schema, sep = "|")
    val orig = df.collect().map(_.toSeq).toSet
    assert(jBack.collect().map(_.toSeq).toSet == orig)
    assert(cBack.collect().map(_.toSeq).toSet == orig)
    // permissive parse: a malformed JSON line yields a null row, not a crash
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$tmp/j/zz_malformed.json"),
      "not json at all\n".getBytes)
    assert(JsonCsv.readJsonl(spark, s"$tmp/j", schema).count() == df.count() + 1)
  }

  test("SQL facade: registered views + native functions run plain SQL") {
    graft.Sql.registerTables(spark, TestSpark.Sf)
    val viaSql = spark.sql(
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin)
      .as[(String, Double)].collect().toSeq
    val viaDf = Tables.lineitem(spark, TestSpark.Sf)
      .groupBy($"l_returnflag")
      .agg(graft.ops.Ops.exactSum($"l_quantity").as("s"))
      .orderBy($"l_returnflag").as[(String, Double)].collect().toSeq
    assert(viaSql == viaDf)
    // native function reachable from SQL over a registered view
    val d = spark.sql(
      "SELECT graft_dot(embedding, embedding) FROM embeddings WHERE vec_id = 0")
      .as[Double].head()
    assert(d > 0.0)
  }

  test("recommend K variants: newcar is a strict prefix of hotcar") {
    import graft.jobs.RecPipeline
    val hot = RecPipeline.qRecommend(spark, TestSpark.Sf)
      .select($"user_city", $"n_items").as[(String, Long)].collect().toMap
    val newc = RecPipeline.qRecommendNewcar(spark, TestSpark.Sf)
      .select($"user_city", $"n_items").as[(String, Long)].collect().toMap
    assert(newc.keySet == hot.keySet)
    assert(newc.forall { case (k, n) => n == math.min(hot(k), 60L) })
  }
}
