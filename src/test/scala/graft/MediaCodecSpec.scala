package graft

import graft.ext.MediaCodec
import org.scalatest.funsuite.AnyFunSuite

/** Byte-level codec correctness: round trips, both BMP row orders,
  * stride padding, RIFF chunk walking, and malformed-input degradation.
  * Pure JVM — no Spark session needed.
  */
class MediaCodecSpec extends AnyFunSuite {

  private def pix(w: Int, h: Int): Array[Byte] =
    Array.tabulate(3 * w * h)(i => ((i * 37 + 11) % 256).toByte)

  test("bmp round-trip recovers dims and raster pixels (top-down)") {
    for (w <- Seq(1, 2, 5, 7, 20); h <- Seq(1, 3, 13)) {
      val p = pix(w, h)
      val m = MediaCodec.decode(MediaCodec.encodeBmp(w, h, p, topDown = true))
      assert(m.format == "bmp")
      assert(m.width.contains(w.toLong) && m.height.contains(h.toLong))
      assert(m.content.toSeq == p.toSeq, s"pixels differ at ${w}x$h")
      assert(m.contentSum == p.map(_ & 0xff).map(_.toLong).sum)
    }
  }

  test("bmp bottom-up files decode to the same raster order as top-down") {
    // w=5 forces a non-trivial stride (15 -> 16): padding must be skipped.
    val (w, h) = (5, 4)
    val p = pix(w, h)
    val down = MediaCodec.decode(MediaCodec.encodeBmp(w, h, p, topDown = true))
    val up = MediaCodec.decode(MediaCodec.encodeBmp(w, h, p, topDown = false))
    assert(down.content.toSeq == up.content.toSeq)
    assert(up.width.contains(w.toLong) && up.height.contains(h.toLong))
    // and the two FILES genuinely differ (row order + height sign)
    assert(MediaCodec.encodeBmp(w, h, p, topDown = true).toSeq !=
           MediaCodec.encodeBmp(w, h, p, topDown = false).toSeq)
  }

  test("wav round-trip recovers rate, duration and signed sample sum") {
    val data = Array.tabulate(64)(i => ((i * 97 + 3) % 256).toByte)
    val m = MediaCodec.decode(MediaCodec.encodeWav(16000, 1, 16, data))
    assert(m.format == "wav")
    assert(m.sampleRate.contains(16000L))
    assert(m.durationMs.contains(64L * 1000 / (16000 * 2)))
    val expected = data.grouped(2).map { p =>
      (((p(0) & 0xff) | (p(1) << 8)).toShort).toLong
    }.sum
    assert(m.contentSum == expected) // negative-capable: proves int16 parse
    assert(m.content.toSeq == data.toSeq)
  }

  test("wav chunk walk skips unknown chunks and odd-size padding") {
    val base = MediaCodec.encodeWav(8000, 1, 16, Array[Byte](1, 0, 2, 0))
    // Splice an unknown 3-byte chunk (odd size -> 1 pad byte) between
    // "fmt " and "data": a real RIFF reader must hop over it.
    val insertAt = 36 // start of the "data" chunk in encodeWav's layout
    val junk = Array[Byte]('L', 'I', 'S', 'T', 3, 0, 0, 0, 9, 9, 9, 0)
    val spliced = base.take(insertAt) ++ junk ++ base.drop(insertAt)
    putLe32(spliced, 4, spliced.length - 8)
    val m = MediaCodec.decode(spliced)
    assert(m.format == "wav" && m.sampleRate.contains(8000L))
    assert(m.contentSum == 1L + 2L)
  }

  test("malformed payloads degrade to bin, never throw") {
    val junks = Seq(
      Array.emptyByteArray,
      Array[Byte]('B', 'M', 1, 2, 3),                      // truncated BMP
      Array.tabulate(100)(i => (i * 7).toByte),            // random bytes
      MediaCodec.encodeWav(8000, 1, 16, Array[Byte](1, 0)).take(30), // cut WAV
      { val b = MediaCodec.encodeBmp(2, 2, pix(2, 2)); b(28) = 8; b } // 8 bpp
    )
    junks.foreach { j =>
      val m = MediaCodec.decode(j)
      assert(m.format == "bin")
      assert(m.contentSum == j.map(_ & 0xff).map(_.toLong).sum)
    }
  }

  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
}
