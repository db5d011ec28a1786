package graft.ext

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata.
  *
  * The Spark-side architecture is real and tested — schema, partition-
  * preserving mapPartitions batch transform, deterministic output shape —
  * while the actual media decode is STUBBED (this container ships no
  * image/audio codecs): `decodeStub` derives deterministic fake
  * dimensions/duration from the payload bytes. Swapping in a real decoder
  * changes only the body of `decodeStub`; the distributed plumbing
  * (per-partition batching, no driver collect, binary-safe shuffle) is
  * the part that has to survive 100 TB and is what the tests pin down.
  */
object Multimodal {
  type Q = (SparkSession, String) => DataFrame

  /** Typed metadata extracted from a media payload. */
  case class MediaMeta(
      docId: Long,
      nBytes: Long,
      format: String,
      width: Int,
      height: Int,
      durationMs: Long)

  /** STUB decoder ??? replace with a real codec binding. Deterministic:
    * derives pseudo-metadata purely from payload size and a byte
    * checksum, so tests and reruns are stable.
    */
  def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    var cksum = 0L
    var i = 0
    while (i < payload.length) { cksum = cksum * 31 + (payload(i) & 0xff); i += 1 }
    val fmt = if (payload.length % 3 == 0) "png"
              else if (payload.length % 3 == 1) "jpeg" else "wav"
    MediaMeta(docId, payload.length.toLong, fmt,
      width = 16 + math.floorMod(cksum, 1904L).toInt,
      height = 16 + math.floorMod(cksum >> 11, 1064L).toInt,
      durationMs = math.floorMod(cksum >> 7, 600000L))
  }

  /** Batch feature extraction over a binary column: partition-preserving
    * mapPartitions (the Scala analogue of a batched pandas-UDF pipeline) —
    * each task decodes its partition's payloads locally, nothing returns
    * to the driver.
    */
  def extractMeta(bin: Dataset[(Long, Array[Byte])]): Dataset[MediaMeta] = {
    import bin.sparkSession.implicits._
    bin.mapPartitions(_.map { case (id, bytes) => decodeStub(id, bytes) })
  }

  /** Deterministic resize: shrink a payload to a byte budget derived
    * from the target (w, h) by even-stride subsampling — the shape of a
    * real thumbnail/resize stage (1 binary in → 1 smaller binary +
    * target dims out) with the codec swapped for deterministic byte
    * math. Partition-preserving mapPartitions, like extractMeta.
    */
  def resize(bin: Dataset[(Long, Array[Byte])], targetW: Int, targetH: Int)
      : Dataset[(Long, Int, Int, Array[Byte])] = {
    import bin.sparkSession.implicits._
    val budget = math.max(targetW * targetH / 64, 1) // stub "pixel" budget
    bin.mapPartitions(_.map { case (id, bytes) =>
      val out =
        if (bytes.length <= budget) bytes
        else Array.tabulate(budget)(k =>
          bytes((bytes.length.toLong * k / budget).toInt))
      (id, targetW, targetH, out)
    })
  }

  /** Deterministic frame sampling: n evenly spaced byte-slices of the
    * payload (what frame extraction looks like shape-wise: 1 binary in →
    * n binaries + indices out).
    */
  def sampleFrames(bin: Dataset[(Long, Array[Byte])], n: Int)
      : Dataset[(Long, Int, Array[Byte])] = {
    import bin.sparkSession.implicits._
    bin.flatMap { case (id, bytes) =>
      if (bytes.isEmpty) Iterator.empty
      else (0 until n).iterator.map { k =>
        val start = (bytes.length.toLong * k / n).toInt
        val end = (bytes.length.toLong * (k + 1) / n).toInt
        (id, k, java.util.Arrays.copyOfRange(bytes, start, math.max(end, start + 1)))
      }
    }
  }

  // Oracle-able face: documents.text encoded to a binary payload column,
  // then metadata over the bytes (the decode itself is engine-agnostic
  // byte math). Exercises binary columns end-to-end through the parquet
  // sink the driver reads back.
  val qMultimodalMeta: Q = (s, d) =>
    Tables.documents(s, d)
      .select(col("doc_id"),
              octet_length(encode(col("text"), "UTF-8")).cast("bigint").as("n_bytes"))
      .withColumn("fake_width", lit(16L) + col("n_bytes") % 640L)
      .withColumn("fake_height", lit(16L) + col("n_bytes") % 480L)
      .orderBy(col("doc_id"))

  val qMultimodalMetaSql: String =
    """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
      |       16 + CAST(octet_length(encode(text)) AS BIGINT) % 640 AS fake_width,
      |       16 + CAST(octet_length(encode(text)) AS BIGINT) % 480 AS fake_height
      |FROM documents ORDER BY doc_id""".stripMargin

  // Frame-sampling accounting over a real BINARY column: encode the doc
  // to bytes, slice 4 evenly-spaced frames with binary substring, and
  // emit per-frame length + md5 — the whole path (encode → binary
  // slice → binary hash) runs on BinaryType in Spark. The oracle slices
  // the STRING instead: the corpus is pure ASCII (1 byte/char,
  // spec-checked), so the byte and character slices are identical and
  // md5 agrees. Sampled to every 10th doc to keep output bounded.
  val NumFrames = 4

  val qFrameSample: Q = (s, d) => {
    val payload = encode(col("text"), "UTF-8")
    val len = octet_length(payload)
    val frames = (0 until NumFrames).map { k =>
      val start = (len * k / NumFrames).cast("int") + 1
      val flen = (len * (k + 1) / NumFrames).cast("int") -
        (len * k / NumFrames).cast("int")
      struct(lit(k.toLong).as("frame_id"),
             flen.cast("bigint").as("frame_bytes"),
             md5(substring(payload, start, flen)).as("frame_md5"))
    }
    Tables.documents(s, d)
      .filter(col("doc_id") % 10 === 0 && length(col("text")) >= NumFrames)
      .select(col("doc_id"), explode(array(frames: _*)).as("f"))
      .select(col("doc_id"), col("f.frame_id"), col("f.frame_bytes"),
              col("f.frame_md5"))
      .orderBy(col("doc_id"), col("frame_id"))
  }

  val qFrameSampleSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text, length(text) AS len FROM documents
       |  WHERE doc_id % 10 = 0 AND length(text) >= $NumFrames),
       |f AS (
       |  SELECT doc_id, k.k AS frame_id,
       |         (len * (k.k + 1) // $NumFrames) - (len * k.k // $NumFrames) AS flen,
       |         len * k.k // $NumFrames + 1 AS start,
       |         text
       |  FROM d CROSS JOIN generate_series(0, ${NumFrames - 1}) k(k))
       |SELECT doc_id, CAST(frame_id AS BIGINT) AS frame_id,
       |       CAST(flen AS BIGINT) AS frame_bytes,
       |       md5(substring(text, CAST(start AS INT), CAST(flen AS INT))) AS frame_md5
       |FROM f ORDER BY doc_id, frame_id""".stripMargin

  val queries: Map[String, Q] = Map(
    "q_multimodal_meta" -> qMultimodalMeta,
    "q_frame_sample"    -> qFrameSample,
  )

  val oracles: Map[String, String] = Map(
    "q_multimodal_meta" -> qMultimodalMetaSql,
    "q_frame_sample"    -> qFrameSampleSql,
  )
}
