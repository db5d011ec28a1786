package graft

import graft.sources.KvTable
import org.apache.spark.sql.functions.{abs, hash}
import org.scalatest.funsuite.AnyFunSuite

/** CRUD semantics and the bucket-pruning contract of the parquet
  * key-value table (SURVEY §2.1 S10).
  */
class KvSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir() = java.nio.file.Files
    .createTempDirectory("graft_kv").toString + "/table"

  test("put / get / update / delete: latest-wins per key") {
    val dir = freshDir()
    KvTable.put(spark, dir,
      Seq(("a", "1"), ("b", "2")).toDF("key", "value"), seq = 1L)
    assert(KvTable.get(spark, dir, "a") === Some("1"))
    assert(KvTable.get(spark, dir, "b") === Some("2"))
    assert(KvTable.get(spark, dir, "missing") === None)
    KvTable.put(spark, dir, Seq(("a", "3")).toDF("key", "value"), seq = 2L)
    assert(KvTable.get(spark, dir, "a") === Some("3"), "update wins")
    KvTable.delete(spark, dir, Seq("a"), seq = 3L)
    assert(KvTable.get(spark, dir, "a") === None, "tombstone hides the key")
    assert(KvTable.get(spark, dir, "b") === Some("2"), "other keys untouched")
    // re-put AFTER a delete resurrects the key (seq order, not op kind)
    KvTable.put(spark, dir, Seq(("a", "4")).toDF("key", "value"), seq = 4L)
    assert(KvTable.get(spark, dir, "a") === Some("4"))
  }

  test("point get opens only the key's bucket directory plus L0") {
    val dir = freshDir()
    val keys = (0 until 40).map(i => (s"k$i", s"v$i"))
    KvTable.put(spark, dir, keys.toDF("key", "value"), seq = 1L)
    // the put is an L0 flush; compact() folds it into the bucketed tier
    KvTable.compact(spark, dir)
    val probe = "k7"
    val keep = KvTable.bucketOf(probe)
    // destroy every OTHER bucket: if get() touched anything beyond its
    // own bucket (L0 is empty post-compaction) the read would fail or
    // change — it must still answer.
    val root = new java.io.File(dir)
    assert(!new java.io.File(dir, "l0").exists(),
           "compaction retires the L0 tail")
    root.listFiles().filter(_.getName.startsWith("bucket="))
      .filterNot(_.getName == s"bucket=$keep")
      .foreach(d => { d.listFiles().foreach(_.delete()); d.delete() })
    assert(root.listFiles().count(_.getName.startsWith("bucket=")) === 1)
    assert(KvTable.get(spark, dir, probe) === Some("v7"))
    // LSM read amplification: a post-compaction write lands in L0 and a
    // get finds it there even though its own bucket dir is gone.
    KvTable.put(spark, dir, Seq(("k20", "fresh")).toDF("key", "value"), 2L)
    assert(KvTable.get(spark, dir, "k20") === Some("fresh"),
           "get must fold the key's bucket plus the L0 tail")
  }

  test("latestView and compact: superseded records and tombstones drop") {
    val dir = freshDir()
    KvTable.put(spark, dir,
      (0 until 20).map(i => (s"k$i", s"v$i")).toDF("key", "value"), 1L)
    KvTable.put(spark, dir,
      (0 until 10).map(i => (s"k$i", s"w$i")).toDF("key", "value"), 2L)
    KvTable.delete(spark, dir, Seq("k0", "k15"), 3L)
    val expected = ((1 until 10).map(i => s"k$i" -> s"w$i") ++
      ((10 until 20).filter(_ != 15).map(i => s"k$i" -> s"v$i"))).toMap
    def view() = KvTable.latestView(spark, dir)
      .select($"key", $"value").as[(String, String)].collect().toMap
    assert(view() === expected)
    // compact materializes the same view and drops the op history
    val survivors = KvTable.compact(spark, dir)
    assert(survivors === expected.size.toLong)
    assert(view() === expected, "view unchanged by compaction")
    val rawAfter = spark.read.parquet(dir).count()
    assert(rawAfter === expected.size.toLong,
           "superseded records and tombstones physically gone")
    assert(KvTable.get(spark, dir, "k3") === Some("w3"))
    assert(KvTable.get(spark, dir, "k0") === None)
  }

  test("kv ingest stream: post-drain view equals batch puts, idempotent") {
    import graft.streaming.KvStream
    val root = java.nio.file.Files
      .createTempDirectory("graft_kv_stream").toString
    // The same op history the latestView test drives through put/delete,
    // expressed as raw op records split into two parquet files with
    // INTERLEAVED seqs (ops of seq 1 and 2 in both files), so the
    // order-free fold is exercised across micro-batches, not just
    // within them.
    val ops = ((0 until 20).map(i => (s"k$i", s"v$i", 1L, false)) ++
               (0 until 10).map(i => (s"k$i", s"w$i", 2L, false)) ++
               Seq(("k0", null: String, 3L, true),
                   ("k15", null: String, 3L, true)))
      .toDF("key", "value", "seq", "tombstone")
    def writeFile(df: org.apache.spark.sql.DataFrame, name: String): Unit = {
      import java.nio.file.{Files, Paths}
      val staging = s"$root/__stage_$name"
      df.coalesce(1).write.parquet(staging)
      val part = Files.list(Paths.get(staging)).toArray.map(_.toString)
        .filter(_.endsWith(".parquet")).head
      Files.createDirectories(Paths.get(s"$root/src"))
      Files.move(Paths.get(part), Paths.get(s"$root/src/$name"))
    }
    writeFile(ops.filter(abs(hash($"key")) % 2 === 0), "ops_even.parquet")
    writeFile(ops.filter(abs(hash($"key")) % 2 === 1), "ops_odd.parquet")
    val ledger = s"$root/ledger"
    def view(df: org.apache.spark.sql.DataFrame) =
      df.select($"key", $"value").as[(String, String)].collect().toMap
    val expected = ((1 until 10).map(i => s"k$i" -> s"w$i") ++
      ((10 until 20).filter(_ != 15).map(i => s"k$i" -> s"v$i"))).toMap
    val streamed = view(KvStream.runOnce(spark, s"$root/src", ledger))
    assert(streamed === expected,
           "streamed ledger must fold to the batch-put view")
    // Idempotency #1: re-running over the same source is a checkpointed
    // no-op — view and raw op count unchanged.
    val rawBefore = KvTable.rawOps(spark, ledger).count()
    val again = view(KvStream.runOnce(spark, s"$root/src", ledger,
                                      name = "graft_kv_ingest_rerun"))
    assert(again === expected)
    assert(KvTable.rawOps(spark, ledger).count() === rawBefore,
           "re-run must not append duplicate ops")
    // Idempotency #2: a retried batch commit (same batch-id token)
    // replaces its own prior output instead of doubling it.
    val batch = Seq(("k1", "z1", 9L, false))
      .toDF("key", "value", "seq", "tombstone")
    KvStream.commitOps(spark, batch, ledger, 99L)
    KvStream.commitOps(spark, batch, ledger, 99L)
    assert(KvTable.rawOps(spark, ledger).count() === rawBefore + 1,
           "retried commit must replace, not double")
    assert(KvTable.get(spark, ledger, "k1") === Some("z1"))
  }
}
