package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row, SparkSession}
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructType, TimestampType}

/** Distributed bridge: directory of rotated binlog files →
  * [[graft.streaming.CdcPipeline]]-shaped change rows (row-image columns
  * + `op` I/U/D + `_seq` + `_tbl`), the exact frame
  * [[graft.operators.CdcTransform.stamp]] consumes — so everything the
  * reference receives from `BinLogStreamReader`
  * (`/root/reference/src/cdc_replicator.py:326-368`) arrives here from
  * raw bytes instead of a Python library object.
  *
  * Scale: `binaryFile` scan → per-file [[BinlogFormat.parse]] inside
  * `mapPartitions`-style `flatMap` — one task per binlog file, so a
  * server fleet's rotated logs (the 100 TB shape: many 1 GiB files)
  * parallelize across executors while each file is decoded in its
  * inherently sequential single pass. The imperative byte walk is the
  * one place the DataFrame API genuinely cannot express the work
  * (self-describing variable-length binary records).
  *
  * Ordering: `_seq` = (file ordinal << 40) | per-file change ordinal.
  * The file ordinal is the numeric suffix of the standard `<base>.NNNNNN`
  * binlog name — the same total order the ROTATE chain encodes (MySQL
  * increments the suffix on rotation); [[rotateChain]] lets a caller
  * REQUIRE the two agree before trusting it. Within a file the CHANGE
  * ordinal is used, not the raw end-log-pos: a multi-row rows-event
  * stamps every row with the same event position, so pos alone ties
  * two changes to one key inside one event and the survivor would be
  * arbitrary (the reference inherits exactly that nondeterminism from
  * its batch-granular version, README.md "duplicate versions"; we keep
  * SURVEY §7.4's deterministic contract instead). The ordinal is
  * order-isomorphic to (end-log-pos, row-index-in-event) and < 2^40 for
  * any real file (MySQL caps binlogs at 1 GiB); the raw pos stays on
  * [[BinlogFormat.RowChange]] as the resume offset.
  *
  * Row-image policy (parity with the reference's processors,
  * `src/cdc_replicator.py:157-212`): updates surface the AFTER image
  * (before-images discarded), deletes their BEFORE image, inserts their
  * AFTER image. Partial images (binlog_row_image=MINIMAL) surface absent
  * columns as null — callers needing full images should run the source
  * with FULL row images, like the reference.
  */
object BinlogSource {

  /** Numeric suffix of a rotated binlog name (`mysql-bin.000042` → 42). */
  def fileOrdinal(path: String): Long = {
    val base = path.substring(path.lastIndexOf('/') + 1)
    val digits = base.reverse.takeWhile(_.isDigit).reverse
    require(digits.nonEmpty, s"binlog name without numeric suffix: $base")
    digits.toLong
  }

  /** The fixed schema of the `binaryFile` format (streaming reads must
    * state it explicitly — file-stream schema inference is off by
    * default and the format's schema is not inferred for streams). */
  val BinaryFileSchema: StructType = new StructType()
    .add("path", StringType).add("modificationTime", TimestampType)
    .add("length", LongType).add("content", BinaryType)

  private def decode(files: Dataset[(String, Array[Byte])], table: String,
                     rowSchema: StructType): DataFrame = {
    val out = rowSchema
      .add("op", StringType).add("_seq", LongType).add("_tbl", StringType)
    val n = rowSchema.size
    implicit val enc = Encoders.row(out)
    files.flatMap { case (path, bytes) =>
      val ord = fileOrdinal(path)
      BinlogFormat.parse(bytes).changes.iterator
        .zipWithIndex // per-file change ordinal: see ordering scaladoc
        .filter(_._1.table == table)
        .map { case (ch, i) =>
          val img = (if (ch.op == "D") ch.before else ch.after)
            .getOrElse(throw new IllegalStateException(
              s"${ch.op} row without its image at pos ${ch.pos}"))
          require(img.size == n,
            s"row arity ${img.size} != schema arity $n for $table")
          Row.fromSeq(img ++ Seq(ch.op, (ord << 40) | i.toLong, ch.table))
        }
    }.toDF()
  }

  private def asFiles(df: DataFrame): Dataset[(String, Array[Byte])] =
    df.select("path", "content")
      .as[(String, Array[Byte])](
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))

  /** Change rows for `table` from every binlog file under `dir`.
    * `rowSchema` = the row-image columns in TABLE_MAP order (LongType /
    * DoubleType / StringType per the decoded type surface). */
  def changes(s: SparkSession, dir: String, table: String,
              rowSchema: StructType): DataFrame =
    decode(asFiles(s.read.format("binaryFile").load(dir)), table, rowSchema)

  /** Streaming form — the reference's continuous mode
    * (`CDCReplicator.run_continuous`, `src/cdc_replicator.py:296-326`)
    * as a file-shipped tail: the landing dir is watched and each NEW
    * binlog file is decoded exactly once, with the file-stream
    * checkpoint playing the reference's position file (S5 offset
    * capture at whole-file granularity). Deployment caveat, documented
    * rather than hidden: file-stream sources treat files as immutable,
    * so a file must land COMPLETE — i.e. the server's ACTIVE binlog is
    * consumed only once rotated (standard relay/backup shipping); a
    * live socket tail would need the wire handshake the sandbox cannot
    * host (COVERAGE.md, environment-blocked). */
  def changesStream(s: SparkSession, dir: String, table: String,
                    rowSchema: StructType): DataFrame =
    decode(asFiles(s.readStream.format("binaryFile")
      .schema(BinaryFileSchema).load(dir)), table, rowSchema)

  /** (file name, rotate target) per binlog under `dir`, name-ordered —
    * lets callers REQUIRE the ROTATE chain matches the suffix order.
    * Uses [[BinlogFormat.scanRotate]]'s header-only walk, so chain
    * validation never decodes row images a second time. Bounded collect:
    * one row per FILE (a fleet's file count, not rows). */
  def rotateChain(s: SparkSession, dir: String): Seq[(String, Option[String])] =
    s.read.format("binaryFile").load(dir)
      .select("path", "content")
      .as[(String, Array[Byte])](
        Encoders.tuple(Encoders.STRING, Encoders.BINARY))
      .map { case (path, bytes) =>
        (path.substring(path.lastIndexOf('/') + 1),
          BinlogFormat.scanRotate(bytes).getOrElse(""))
      }(Encoders.tuple(Encoders.STRING, Encoders.STRING))
      .collect().toSeq.sortBy(x => fileOrdinal(x._1))
      .map { case (f, nx) => (f, Option(nx).filter(_.nonEmpty)) }
}
