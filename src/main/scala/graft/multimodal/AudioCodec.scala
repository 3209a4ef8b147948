package graft.multimodal

/** Real audio codec for the multimodal column path — `javax.sound.sampled`
  * (JDK-public, zero new dependencies), companion to [[ImageCodec]]:
  * closes the `audio` kind of the documented stub. WAV/PCM is lossless,
  * so decoded sample values are a pure function of the synthesized
  * pattern and the DuckDB oracle recomputes the checksum with integer
  * arithmetic — no audio library on the oracle side. (Video: see
  * [[VideoCodec]], which hand-parses the AVI container this RIFF walk
  * generalizes to.)
  *
  * The synthesizer writes a spec-compliant RIFF/WAVE header BY HAND and
  * the decoder goes through the real `AudioSystem` parser — the gate
  * fails if either side misreads the format (rate, width, endianness),
  * not just the payload.
  */
object AudioCodec {

  /** Deterministic 16-bit PCM test pattern: sample `i` of clip `id`. */
  def patternSample(id: Long, i: Int): Int =
    (((i * 37L + id * 101L) % 65536L) - 32768L).toInt

  /** Synthesize a real mono 16-bit PCM WAV: 44-byte RIFF header +
    * little-endian samples. */
  def synthWav(id: Long, nSamples: Int, sampleRate: Int): Array[Byte] = {
    val dataLen = nSamples * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1) // PCM
      .putShort(1) // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2) // byte rate
      .putShort(2) // block align
      .putShort(16) // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataLen)
    var i = 0
    while (i < nSamples) {
      buf.putShort(patternSample(id, i).toShort)
      i += 1
    }
    buf.array()
  }

  /** A decoded clip: format facts from the real parser plus a
    * position-weighted sample checksum (Σ s_i · (1 + i) — order-sensitive,
    * so dropped or reordered frames cannot collide). */
  final case class DecodedAudio(sample_rate: Int, n_samples: Int,
                                checksum: Long)

  /** Decode a WAV payload through `javax.sound.sampled.AudioSystem`.
    * Non-audio bytes → None (fall back to the stub). Only the 16-bit
    * little-endian PCM shape this engine stages is scored; anything else
    * is treated as undecodable rather than mis-decoded. */
  def decodeWav(payload: Array[Byte]): Option[DecodedAudio] =
    try {
      val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(payload))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16 || fmt.getChannels != 1 ||
          fmt.isBigEndian ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED)
          None
        else {
          val bytes = in.readAllBytes()
          val bb = java.nio.ByteBuffer.wrap(bytes)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = bytes.length / 2
          var sum = 0L
          var i = 0
          while (i < n) {
            sum += bb.getShort(2 * i).toLong * (1L + i)
            i += 1
          }
          Some(DecodedAudio(fmt.getSampleRate.toInt, n, sum))
        }
      } finally in.close()
    } catch { case _: Exception => None }
}
