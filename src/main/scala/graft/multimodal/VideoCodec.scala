package graft.multimodal

import java.nio.{ByteBuffer, ByteOrder}

/** Real video codec for the multimodal column path — closes the last
  * `video` stub kind (companions: [[ImageCodec]] `javax.imageio`,
  * [[AudioCodec]] `javax.sound.sampled`). The JDK ships no video codec,
  * so this takes the [[AudioCodec]] hand-parsed-RIFF approach one
  * container up: a spec-compliant AVI file (RIFF `AVI ` with `hdrl`
  * MainAVIHeader + `vids/DIB ` stream header and a `movi` list of
  * uncompressed 24-bit `00db` DIB frames) is synthesized BY HAND, and the
  * decoder is an independent generic RIFF chunk walker that must get the
  * container structure right: fourCC validation, chunk-size word
  * alignment, BITMAPINFOHEADER fields, per-row 4-byte DIB padding, and
  * the bottom-up DIB row order (the checksum weights pixels in TOP-DOWN
  * position order, so a decoder that forgets to un-flip rows — the
  * classic DIB mistake — cannot collide).
  *
  * Uncompressed DIB frames are lossless, so the decoded pixels are a pure
  * function of the synthesized pattern and the DuckDB oracle recomputes
  * frame count and checksum with integer arithmetic over a
  * generate_series grid — no video library on the oracle side.
  */
object VideoCodec {

  /** Deterministic BGR pattern for pixel (x, y) of frame `f` in clip `id`
    * — same modular-arithmetic family as [[ImageCodec]]'s still pattern,
    * extended by the frame index. */
  def patternB(id: Long, f: Int, x: Int, y: Int): Int =
    ((x * 7 + y * 13 + f * 11 + id * 31) % 256).toInt
  def patternG(id: Long, f: Int, x: Int, y: Int): Int =
    ((x * 3 + y * 5 + f * 19 + id * 17) % 256).toInt
  def patternR(id: Long, f: Int, x: Int, y: Int): Int =
    ((x * 11 + y * 19 + f * 29 + id * 23) % 256).toInt

  private def fourCC(s: String): Array[Byte] = s.getBytes("US-ASCII")

  /** Synthesize a real AVI: RIFF(AVI ) { LIST(hdrl){avih, LIST(strl){strh,
    * strf}}, LIST(movi){00db × frames} }. Frames are bottom-up 24-bit DIB
    * with rows padded to 4 bytes — the wire format, not the logical one. */
  def synthAvi(id: Long, nFrames: Int, w: Int, h: Int): Array[Byte] = {
    val rowBytes = (w * 3 + 3) / 4 * 4 // DIB rows pad to 32-bit boundaries
    val frameBytes = rowBytes * h
    val strlSize = 4 + (8 + 56) + (8 + 40) // 'strl' + strh + strf chunks
    val hdrlSize = 4 + (8 + 56) + (8 + strlSize) // 'hdrl' + avih + LIST strl
    val moviSize = 4 + nFrames * (8 + frameBytes) // frameBytes is 4-aligned
    val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize)
    val buf = ByteBuffer.allocate(8 + riffSize).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(fourCC("RIFF")).putInt(riffSize).put(fourCC("AVI "))
    buf.put(fourCC("LIST")).putInt(hdrlSize).put(fourCC("hdrl"))
    buf.put(fourCC("avih")).putInt(56)
      .putInt(40000) // µs per frame (25 fps)
      .putInt(frameBytes * 25) // max bytes/sec
      .putInt(0) // padding granularity
      .putInt(0x10) // AVIF_HASINDEX off, AVIF_WASCAPTUREFILE off; flags
      .putInt(nFrames)
      .putInt(0) // initial frames
      .putInt(1) // streams
      .putInt(frameBytes) // suggested buffer
      .putInt(w).putInt(h)
      .putInt(0).putInt(0).putInt(0).putInt(0) // reserved
    buf.put(fourCC("LIST")).putInt(strlSize).put(fourCC("strl"))
    buf.put(fourCC("strh")).putInt(56)
      .put(fourCC("vids")).put(fourCC("DIB "))
      .putInt(0) // flags
      .putInt(0) // priority + language
      .putInt(0) // initial frames
      .putInt(1) // scale
      .putInt(25) // rate → 25 fps
      .putInt(0) // start
      .putInt(nFrames) // length
      .putInt(frameBytes) // suggested buffer
      .putInt(-1) // quality (default)
      .putInt(0) // sample size (varies)
      .putShort(0).putShort(0).putShort(w.toShort).putShort(h.toShort) // rcFrame
    buf.put(fourCC("strf")).putInt(40)
      .putInt(40) // biSize
      .putInt(w).putInt(h)
      .putShort(1) // planes
      .putShort(24) // bits per pixel
      .putInt(0) // BI_RGB (uncompressed)
      .putInt(frameBytes)
      .putInt(0).putInt(0).putInt(0).putInt(0) // ppm, colors
    buf.put(fourCC("LIST")).putInt(moviSize).put(fourCC("movi"))
    var f = 0
    while (f < nFrames) {
      buf.put(fourCC("00db")).putInt(frameBytes)
      var y = h - 1 // DIB: bottom row first
      while (y >= 0) {
        var x = 0
        while (x < w) {
          buf.put(patternB(id, f, x, y).toByte)
          buf.put(patternG(id, f, x, y).toByte)
          buf.put(patternR(id, f, x, y).toByte)
          x += 1
        }
        var p = w * 3
        while (p < rowBytes) { buf.put(0.toByte); p += 1 } // row padding
        y -= 1
      }
      f += 1
    }
    buf.array()
  }

  /** A decoded clip: container facts plus a positional pixel checksum in
    * TOP-DOWN frame-major order — Σ (B + 256·G + 65536·R) · (1 + pos),
    * pos = x + y·w + f·w·h — so dropped, reordered, or un-flipped frames
    * cannot collide. */
  final case class DecodedVideo(width: Int, height: Int, n_frames: Int,
                                checksum: Long)

  /** Decode an AVI payload with a generic RIFF walk (independent of the
    * synthesizer's layout math): validate RIFF/AVI fourCCs, read
    * width/height from the BITMAPINFOHEADER (falling back to avih), then
    * checksum every `00db`/`00dc` frame un-flipping the bottom-up rows
    * and skipping row padding. Non-AVI bytes or an unsupported shape
    * (compressed, non-24-bit) → None — undecodable, not mis-decoded. */
  def decodeAvi(payload: Array[Byte]): Option[DecodedVideo] =
    try {
      val bb = ByteBuffer.wrap(payload).order(ByteOrder.LITTLE_ENDIAN)
      def cc(): String = {
        val b = new Array[Byte](4); bb.get(b); new String(b, "US-ASCII")
      }
      if (bb.remaining() < 12 || cc() != "RIFF") return None
      bb.getInt // riff size (trust the buffer bound instead)
      if (cc() != "AVI ") return None
      var w = 0; var h = 0; var bitCount = 0; var compression = -1
      var frames = 0; var sum = 0L
      // walk a chunk run within [from, until). A corrupt/adversarial size
      // field must make the walk STOP, not spin: a negative size (e.g.
      // 0xFFFFFFF8 = -8) would otherwise compute pos_next == pos and
      // loop forever inside the executor task — the one failure mode the
      // surrounding try/catch cannot convert to None.
      def walk(from: Int, until: Int): Unit = {
        var pos = from
        var cont = true
        while (cont && pos + 8 <= until) {
          bb.position(pos)
          val id = cc()
          val size = bb.getInt
          if (size < 0) cont = false
          else {
            val body = bb.position()
            if (id == "LIST") {
              val listType = cc()
              if (listType == "hdrl" || listType == "strl" ||
                listType == "movi")
                walk(body + 4, body + size)
            } else if (id == "strf" && size >= 40) {
              bb.getInt // biSize
              w = bb.getInt
              h = bb.getInt
              bb.getShort // planes
              bitCount = bb.getShort.toInt
              compression = bb.getInt
            } else if ((id == "00db" || id == "00dc") && w > 0 && h > 0 &&
              bitCount == 24 && compression == 0) {
              val rowBytes = (w * 3 + 3) / 4 * 4
              if (size >= rowBytes * h) {
                val base = frames.toLong * w * h
                var y = 0
                while (y < h) { // logical top-down row y …
                  val srcRow = body + (h - 1 - y) * rowBytes // … stored flipped
                  var x = 0
                  while (x < w) {
                    val o = srcRow + x * 3
                    val v = (payload(o) & 0xff) + 256L * (payload(o + 1) & 0xff) +
                      65536L * (payload(o + 2) & 0xff)
                    sum += v * (1L + base + x + y.toLong * w)
                    x += 1
                  }
                  y += 1
                }
                frames += 1
              }
            }
            pos = body + size + (size & 1) // chunks are word-aligned
          }
        }
      }
      walk(12, payload.length)
      if (w > 0 && h > 0 && frames > 0)
        Some(DecodedVideo(w, h, frames, sum))
      else None
    } catch { case _: Exception => None }
}
