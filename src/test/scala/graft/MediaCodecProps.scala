package graft

import graft.ext.MediaCodec
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck properties for the pure-JVM media codec: arbitrary-dim
  * BMP and arbitrary-parameter WAV round trips, both BMP row orders,
  * and never-throw on arbitrary byte junk.
  */
object MediaCodecProps extends Properties("graft.MediaCodec") {

  val bmpGen: Gen[(Int, Int, Boolean, Array[Byte])] = for {
    w <- Gen.chooseNum(1, 40)
    h <- Gen.chooseNum(1, 30)
    topDown <- Gen.oneOf(true, false)
    pix <- Gen.listOfN(3 * w * h, Gen.chooseNum(-128, 127).map(_.toByte))
  } yield (w, h, topDown, pix.toArray)

  property("bmp round-trip: dims + raster pixels, either row order") =
    Prop.forAllNoShrink(bmpGen) { case (w, h, topDown, pix) =>
      val m = MediaCodec.decode(MediaCodec.encodeBmp(w, h, pix, topDown))
      m.format == "bmp" && m.width.contains(w.toLong) &&
        m.height.contains(h.toLong) && m.content.toSeq == pix.toSeq
    }

  val wavGen: Gen[(Int, Int, Array[Byte])] = for {
    rate <- Gen.oneOf(8000, 11025, 16000, 22050, 44100)
    channels <- Gen.chooseNum(1, 2)
    nSamples <- Gen.chooseNum(0, 300)
    data <- Gen.listOfN(2 * channels * nSamples,
                        Gen.chooseNum(-128, 127).map(_.toByte))
  } yield (rate, channels, data.toArray)

  property("wav round-trip: rate, duration floor, data bytes") =
    Prop.forAllNoShrink(wavGen) { case (rate, channels, data) =>
      val m = MediaCodec.decode(MediaCodec.encodeWav(rate, channels, 16, data))
      val byteRate = rate.toLong * channels * 2
      m.format == "wav" && m.sampleRate.contains(rate.toLong) &&
        m.durationMs.contains(data.length.toLong * 1000 / byteRate) &&
        m.content.toSeq == data.toSeq
    }

  property("decode never throws on arbitrary bytes; bin sum is unsigned") =
    Prop.forAllNoShrink(Gen.listOf(Gen.chooseNum(-128, 127).map(_.toByte))) { l =>
      val b = l.toArray
      val m = MediaCodec.decode(b)
      // junk may accidentally sniff as a container prefix but must never
      // throw; for the bin fallback the checksum is the unsigned byte sum
      m.format != "bin" || m.contentSum == b.map(_ & 0xff).map(_.toLong).sum
    }
}
