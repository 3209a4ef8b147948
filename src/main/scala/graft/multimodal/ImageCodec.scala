package graft.multimodal

/** Real image codec for the multimodal column path — `javax.imageio`
  * (JDK-public, zero new dependencies). Replaces the documented stub for
  * the `image` kind: PNG payloads decode to exact pixels (PNG is
  * lossless), so decoded width/height and a positional pixel checksum
  * are deterministic functions of the painted pattern and the DuckDB
  * oracle can recompute them from arithmetic alone — no image library on
  * the oracle side. (Audio: [[AudioCodec]] via `javax.sound.sampled`;
  * video: [[VideoCodec]], hand-parsed RIFF/AVI.)
  *
  * Scale: decode runs inside `mapPartitions` tasks (partition-parallel,
  * no shuffle, no driver involvement) — the same plan shape as a
  * Pandas-UDF `mapInPandas` decode stage at 100 TB.
  */
object ImageCodec {

  // ImageIO's default stream cache spools every encode/decode through a
  // TEMP FILE (FileCacheImageInput/OutputStream): one create+write+delete
  // per image, per task. At 32 concurrent decode tasks the temp-file churn
  // serializes in the filesystem and inverts core scaling — the r15 driver
  // measured the PNG-decode gate 3× SLOWER on 32 cores than on 8
  // (scaling ratio 0.32). Heap-buffered streams carry identical bytes;
  // this is I/O plumbing, not codec semantics — decoded pixels (what the
  // oracle pins) are untouched. JVM-global, set when the codec first
  // loads in each executor.
  javax.imageio.ImageIO.setUseCache(false)

  /** Deterministic RGB test pattern for pixel (x, y) of image `id` —
    * shared by the synthesizer, the JVM spec reference, and the DuckDB
    * oracle (pure integer arithmetic in all three). */
  def patternRgb(id: Long, x: Int, y: Int): (Int, Int, Int) = (
    ((x * 7L + y * 13L + id * 31L) % 256).toInt,
    ((x * 3L + y * 5L + id * 17L) % 256).toInt,
    ((x * 11L + y * 19L + id * 23L) % 256).toInt)

  /** Synthesize a real PNG: paint the pattern, encode through the real
    * encoder. Encoded BYTES may differ across JDKs (compression); decoded
    * PIXELS cannot — the oracle pins pixels, never bytes. */
  def synthPng(id: Long, w: Int, h: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val (r, g, b) = patternRgb(id, x, y)
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** A decoded image: dimensions, a position-weighted pixel checksum
    * (Σ (r + 256·g + 65536·b) · (1 + x + y·w) — order-sensitive, so a
    * transposed or flipped decode cannot collide), and per-channel means
    * for the feature path. */
  final case class Decoded(width: Int, height: Int, checksum: Long,
                           meanRgb: Array[Float])

  /** Decode any ImageIO-supported payload (PNG here). Non-image bytes →
    * None (ImageIO returns null or throws on junk) — callers fall back
    * to the stub, which keeps text-payload harness media on the
    * historical path. */
  def decode(payload: Array[Byte]): Option[Decoded] =
    try {
      Option(javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(payload))).map { img =>
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0L
        var rs = 0L; var gs = 0L; var bs = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sum += (r + 256L * g + 65536L * b) * (1L + x + y.toLong * w)
            rs += r; gs += g; bs += b
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        Decoded(w, h, sum, Array(
          rs.toFloat / (255f * n), gs.toFloat / (255f * n),
          bs.toFloat / (255f * n)))
      }
    } catch { case _: Exception => None }
}
