package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata (extension surface, SURVEY.md §7.2 step 7).
  *
  * All three kinds now have REAL decoders — [[ImageCodec]] (PNG via
  * `javax.imageio`), [[AudioCodec]] (RIFF/PCM via `javax.sound.sampled`),
  * [[VideoCodec]] (RIFF/AVI, hand-parsed — the JDK ships no video codec).
  * [[FakeCodec]] remains only as the fallback for payloads that aren't
  * actual media bytes (the harness's text-payload media table). The
  * Spark-side plumbing is the point either way: schema, batch shape,
  * partition-parallel `mapPartitions` over a typed Dataset — the Scala
  * analog of a Pandas-UDF `mapInPandas` stage; swapping a codec changes
  * no plan shape.
  */
object Multimodal {

  /** A media row: opaque payload + typed metadata. */
  final case class MediaRow(
      media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  /** Extracted features per media row (fixed-width vector + scalars). */
  final case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Int,
      feature: Array[Float], frames_sampled: Int)

  /** Deterministic fake decode/feature-extract: derives a `dim`-length
    * feature vector from payload bytes. Stands in for image decode /
    * resize / audio FFT / video frame-sampling. */
  object FakeCodec {
    def features(payload: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      var i = 0
      while (i < payload.length) {
        out(i % dim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
    /** "Frame sample": every `stride`-th byte counts as one frame. */
    def frameCount(payload: Array[Byte], stride: Int): Int =
      if (payload.isEmpty) 0 else 1 + (payload.length - 1) / stride

    /** "Resize": nearest-neighbor byte downsampling to a fixed target
      * length — stands in for image resize / audio resample; deterministic
      * and length-exact. */
    def resize(payload: Array[Byte], targetLen: Int): Array[Byte] = {
      if (payload.isEmpty || targetLen <= 0) return Array.emptyByteArray
      val out = new Array[Byte](targetLen)
      var i = 0
      while (i < targetLen) {
        out(i) = payload((i.toLong * payload.length / targetLen).toInt)
        i += 1
      }
      out
    }
  }

  /** Resized media row (payload downsampled to `targetLen` bytes, target
    * display dims attached) — the resize stage of the pipeline. */
  final case class ResizedMedia(
      media_id: Long, kind: String, payload: Array[Byte],
      out_width: Int, out_height: Int)

  def resizeStage(media: Dataset[MediaRow], targetLen: Int = 256,
                  outW: Int = 224, outH: Int = 224): Dataset[ResizedMedia] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map(m => ResizedMedia(
      m.media_id, m.kind, FakeCodec.resize(m.payload, targetLen), outW, outH)))
  }

  /** One sampled frame: a fixed-budget byte slice taken every `stride`
    * bytes of the payload — the video-frame-sampling stage shape (decode
    * stubbed; slicing, row explosion, and batch shape real). */
  final case class SampledFrame(
      media_id: Long, kind: String, frame_idx: Int, payload: Array[Byte])

  /** Frame-sample stage: explode each media row into its sampled frames
    * (one slice of up to `frameLen` bytes every `stride` bytes). Runs
    * partition-parallel with no shuffle — output partitioning inherits the
    * input's, and downstream per-frame stages (feature extract, resize)
    * chain without an exchange. Empty payloads yield no frames. */
  def frameSampleStage(media: Dataset[MediaRow], stride: Int = 32,
                       frameLen: Int = 16): Dataset[SampledFrame] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.flatMap { m =>
      Iterator.range(0, m.payload.length, stride).zipWithIndex.map {
        case (off, idx) =>
          SampledFrame(m.media_id, m.kind, idx,
            m.payload.slice(off, math.min(off + frameLen, m.payload.length)))
      }
    })
  }

  /** Manufacture a deterministic media table from `documents` (text bytes
    * play the opaque payload) — the harness has no real binaries; what
    * matters is that the column is genuinely BinaryType end-to-end. */
  def mediaFromDocuments(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    graft.queries.Tables.read(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        // kind cycles image/audio/video — deterministic from the id
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        encode(col("text"), "UTF-8").as("payload"),
        (col("doc_id") % 640 + 64).cast("int").as("width"),
        (col("doc_id") % 480 + 48).cast("int").as("height"),
        lit(16000).as("sample_rate"))
      .as[MediaRow]
  }

  /** The decode/feature stage: partition-parallel, batch-shaped like a
    * vectorized UDF (one iterator per partition, no driver collect).
    * `image` payloads go through the REAL image codec
    * ([[ImageCodec.decode]], `javax.imageio`: feature = (w, h, mean
    * R/G/B) padded to `dim`, one "frame" — a still) and `audio` payloads
    * through the REAL WAV codec ([[AudioCodec.decodeWav]],
    * `javax.sound.sampled`: feature = (rate, n_samples), frames =
    * samples) and `video` payloads through the REAL AVI parser
    * ([[VideoCodec.decodeAvi]]: feature = (w, h, frames)) when they
    * decode. Payloads that aren't actual media bytes (the harness's
    * text-payload media) take the documented stub, so the historical
    * metadata gate is byte-stable. */
  def extractFeatures(media: Dataset[MediaRow], dim: Int = 8,
                      frameStride: Int = 32): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val real: Option[MediaFeatures] = m.kind match {
        case "image" => ImageCodec.decode(m.payload).map(d =>
          MediaFeatures(m.media_id, m.kind, m.payload.length,
            (Array(d.width.toFloat, d.height.toFloat) ++ d.meanRgb)
              .padTo(dim, 0f).take(dim), 1))
        case "audio" => AudioCodec.decodeWav(m.payload).map(d =>
          MediaFeatures(m.media_id, m.kind, m.payload.length,
            Array(d.sample_rate.toFloat, d.n_samples.toFloat)
              .padTo(dim, 0f).take(dim), d.n_samples))
        case "video" => VideoCodec.decodeAvi(m.payload).map(d =>
          MediaFeatures(m.media_id, m.kind, m.payload.length,
            Array(d.width.toFloat, d.height.toFloat, d.n_frames.toFloat)
              .padTo(dim, 0f).take(dim), d.n_frames))
        case _ => None
      }
      real.getOrElse(
        MediaFeatures(m.media_id, m.kind, m.payload.length,
          FakeCodec.features(m.payload, dim),
          FakeCodec.frameCount(m.payload, frameStride)))
    })
  }

  /** Decoded-PNG table: synthesize a real PNG per document id (pattern
    * pixels, real encoder), decode it back through `javax.imageio`, and
    * report (width, height, positional pixel checksum). PNG round-trips
    * pixels losslessly, so the result is a pure function of the pattern
    * — the DuckDB oracle recomputes it with integer arithmetic over a
    * generate_series pixel grid. Encode+decode both run inside the
    * mapPartitions task: partition-parallel, zero shuffle. */
  final case class DecodedPng(media_id: Long, width: Int, height: Int,
                              checksum: Long)
  def decodePngTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.queries.Tables.read(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 16 + 8).cast("int").as("w"),
        (col("doc_id") % 12 + 8).cast("int").as("h"))
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, w, h) =>
        val d = ImageCodec.decode(ImageCodec.synthPng(id, w, h))
          .getOrElse(sys.error(s"PNG for media $id failed to decode"))
        DecodedPng(id, d.width, d.height, d.checksum)
      }).toDF()
  }

  /** Decoded-WAV table, companion to [[decodePngTable]]: synthesize a
    * real RIFF/PCM clip per document id, decode it back through
    * `javax.sound.sampled.AudioSystem`, report (sample_rate, n_samples,
    * positional sample checksum). PCM is lossless ⇒ pure function of the
    * pattern; the oracle recomputes it arithmetically. Partition-parallel,
    * zero shuffle. */
  final case class DecodedWav(media_id: Long, sample_rate: Int,
                              n_samples: Int, checksum: Long)
  def decodeWavTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.queries.Tables.read(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 256 + 64).cast("int").as("n"),
        ((col("doc_id") % 4) * 4000 + 8000).cast("int").as("rate"))
      .as[(Long, Int, Int)]
      .mapPartitions(_.map { case (id, n, rate) =>
        val d = AudioCodec.decodeWav(AudioCodec.synthWav(id, n, rate))
          .getOrElse(sys.error(s"WAV for media $id failed to decode"))
        DecodedWav(id, d.sample_rate, d.n_samples, d.checksum)
      }).toDF()
  }

  /** Decoded-AVI table, the video companion to [[decodePngTable]] /
    * [[decodeWavTable]]: synthesize a real RIFF/AVI clip of uncompressed
    * 24-bit DIB frames per document id, decode it back through
    * [[VideoCodec.decodeAvi]]'s independent RIFF chunk walk, report
    * (width, height, n_frames, positional pixel checksum). Uncompressed
    * DIB is lossless ⇒ pure function of the pattern; the oracle
    * recomputes it arithmetically. Partition-parallel, zero shuffle. */
  final case class DecodedAvi(media_id: Long, width: Int, height: Int,
                              n_frames: Int, checksum: Long)
  def decodeAviTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.queries.Tables.read(spark, dir, "documents")
      .select(col("doc_id").as("media_id"),
        (col("doc_id") % 4 + 2).cast("int").as("n"),
        (col("doc_id") % 12 + 8).cast("int").as("w"),
        (col("doc_id") % 8 + 6).cast("int").as("h"))
      .as[(Long, Int, Int, Int)]
      .mapPartitions(_.map { case (id, n, w, h) =>
        val d = VideoCodec.decodeAvi(VideoCodec.synthAvi(id, n, w, h))
          .getOrElse(sys.error(s"AVI for media $id failed to decode"))
        DecodedAvi(id, d.width, d.height, d.n_frames, d.checksum)
      }).toDF()
  }

  /** Scalar metadata view of the feature stage (oracle-friendly: byte
    * length and frame count are exactly reproducible in SQL; the float
    * vector itself is exercised by the ScalaTest spec instead). */
  def mediaMetadata(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaFromDocuments(spark, dir)).toDF()
      .select(col("media_id"), col("kind"), col("n_bytes"),
        col("frames_sampled"))
}
