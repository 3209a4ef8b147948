package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32

/** Parser for the MySQL binary-log (binlog) v4 event format — the wire
  * bytes the reference consumes through `pymysqlreplication`'s
  * `BinLogStreamReader` (`/root/reference/src/cdc_replicator.py:8-9,99-145`:
  * fake-replica connection, `WriteRowsEvent`/`UpdateRowsEvent`/
  * `DeleteRowsEvent` decode, `(file, pos)` offsets). The replication
  * stream carries exactly the events of the binlog FILE format (each
  * stream packet is one file-format event behind a 1-byte OK header), so
  * parsing the file format IS the event-decode half of the reference's
  * binlog client; only the socket/handshake half stays environment-blocked
  * (no MySQL in the sandbox — see COVERAGE.md).
  *
  * Layout implemented from the PUBLIC format description (MySQL
  * Internals manual, "Binary log versions" / "Row Based Replication"):
  *
  *   - file  = 4-byte magic `0xfe 'b' 'i' 'n'`, then events back-to-back;
  *   - event = common header v4 (19 bytes: ts4, type1, serverId4,
  *     eventSize4, logPos4, flags2 — all little-endian) + post-header +
  *     body [+ CRC32 when the format descriptor enables checksums];
  *   - FORMAT_DESCRIPTION (15): binlogVersion2 (=4), serverVersion50,
  *     createTs4, commonHeaderLen1 (=19), postHeaderLen byte per event
  *     type, checksumAlg1 [+ crc4 when alg=CRC32]. The alg byte governs
  *     every later event in the file (MySQL ≥ 5.6.1 always writes it);
  *   - TABLE_MAP (19): tableId6, flags2; dbLen1, db, NUL, tblLen1, tbl,
  *     NUL, colCount(lenenc), colTypes, metaLen(lenenc), per-type
  *     metadata, nullability bitmap;
  *   - WRITE/UPDATE/DELETE_ROWS v2 (30/31/32): tableId6, flags2,
  *     extraLen2 (self-inclusive); colCount(lenenc), columns-present
  *     bitmap (×2 for UPDATE), then row images to the end: per image a
  *     null bitmap over PRESENT columns, then one value per present
  *     non-null column. UPDATE rows come as (before, after) pairs;
  *   - XID (16): xid8 — the transaction commit marker;
  *   - GTID (33): flags1, sid16, gno8 (the 5.7+ logical-clock tail is
  *     skipped) — stamped onto every row change of the transaction it
  *     opens, so a consumer can track applied GTIDs and resume on ANY
  *     replica (a (file, pos) offset is server-specific);
  *   - PREVIOUS_GTIDS (35): the GTID set already applied before this
  *     file, decoded to the canonical `uuid:start-end` display form;
  *   - ROTATE (4): nextPos8, next file name to the end — the inter-file
  *     ordering chain;
  *   - any other event type is skipped via its header's eventSize (real
  *     binlogs interleave QUERY/STOP/ROWS_QUERY events a row-image
  *     consumer does not need).
  *
  * Column types supported (the engine's CDC type surface, matching
  * `model/TypeMapper`'s integer/float/varchar core): TINY(1), SHORT(2),
  * LONG(3), DOUBLE(5), LONGLONG(8), VARCHAR(15). Integers are decoded
  * signed — signedness is not recorded in the binlog (it lives in the
  * table DDL), the same caveat the reference documents for
  * unsigned/`bit` columns. VARCHAR length is 1 byte when the column's
  * max byte length < 256, else 2 (the documented metadata rule).
  *
  * Transactional semantics: row events buffer as PENDING and only an XID
  * commits them — a file that ends mid-transaction (server crash) yields
  * its committed prefix plus `droppedUncommitted > 0`, never a torn tail.
  * This is stronger than the reference, which applies row events as they
  * stream and can replay a torn tail on reconnect (its at-least-once
  * contract absorbs that; ours never surfaces uncommitted rows at all).
  *
  * Integrity: when the FDE declares CRC32 (alg=1), every event's trailing
  * 4 bytes are verified against `java.util.zip.CRC32` over the rest of
  * the event; a mismatch aborts the parse (corrupt log ≠ skippable row).
  *
  * Scale: one binlog file is a sequential log — parsing it is inherently
  * single-pass (each event's size lives in its own header), but files are
  * independent, so a fleet of servers × rotated files parallelizes
  * per-file; see [[BinlogSource]] for the distributed bridge.
  */
object BinlogFormat {

  // event type codes (public binlog v4 numbering)
  val RotateEvent = 0x04
  val FormatDescriptionEvent = 0x0f
  val XidEvent = 0x10
  val TableMapEvent = 0x13
  val WriteRowsV2 = 0x1e
  val UpdateRowsV2 = 0x1f
  val DeleteRowsV2 = 0x20
  val GtidEvent = 0x21
  val PreviousGtidsEvent = 0x23

  // column type codes (MYSQL_TYPE_*)
  val TypeTiny = 1
  val TypeShort = 2
  val TypeLong = 3
  val TypeDouble = 5
  val TypeLongLong = 8
  val TypeVarchar = 15

  val Magic: Array[Byte] = Array(0xfe.toByte, 'b'.toByte, 'i'.toByte, 'n'.toByte)
  val HeaderLen = 19

  /** One column of a TABLE_MAP: type code + decoded metadata (VARCHAR →
    * max byte length; DOUBLE → pack length; integers → 0). */
  final case class ColumnDef(tpe: Int, meta: Int)

  final case class TableMap(tableId: Long, db: String, table: String,
                            cols: IndexedSeq[ColumnDef])

  /** A committed row change. `pos` = the event's end-log-pos (the offset
    * the reference persists as its resume position,
    * `/root/reference/src/cdc_replicator.py:24-35`) — strictly monotone
    * within a file, so (file-ordinal, pos) totally orders a rotated
    * stream. Update rows carry both images; inserts only `after`;
    * deletes only `before` (the documented row-image rules). */
  final case class RowChange(db: String, table: String, op: String,
                             before: Option[IndexedSeq[Any]],
                             after: Option[IndexedSeq[Any]],
                             pos: Long,
                             gtid: Option[String] = None)

  /** Parse result for one file: committed changes in log order, the
    * ROTATE target (next file in the chain) when present, how many row
    * changes sat in a never-committed trailing transaction, and the
    * PREVIOUS_GTIDS set (the GTIDs already applied before this file —
    * modern MySQL's resume token; a consumer that tracks the gtids it
    * applied can resume on any replica, where a (file, pos) offset is
    * server-specific). */
  final case class ParsedBinlog(changes: Vector[RowChange],
                                nextFile: Option[String],
                                droppedUncommitted: Int,
                                previousGtids: Option[String] = None)

  import CdcTransformOps.{InsertOp, UpdateOp, DeleteOp}

  def parse(bytes: Array[Byte]): ParsedBinlog = {
    require(bytes.length >= 4 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not a binlog: bad magic")
    var off = 4
    var checksummed = false
    var sawFde = false
    val tableMaps = scala.collection.mutable.Map[Long, TableMap]()
    val committed = Vector.newBuilder[RowChange]
    var pending = Vector.empty[RowChange]
    var nextFile: Option[String] = None
    var currentGtid: Option[String] = None
    var previousGtids: Option[String] = None

    while (off < bytes.length) {
      require(bytes.length - off >= HeaderLen, s"truncated event header at $off")
      val b = buf(bytes, off, HeaderLen)
      b.getInt() // timestamp
      val tpe = b.get() & 0xff
      b.getInt() // server id
      val eventSize = b.getInt()
      val logPos = b.getInt().toLong & 0xffffffffL
      b.getShort() // flags
      // overflow-safe form: eventSize can be any corrupt Int, so compare
      // against the REMAINING length, never `off + eventSize`
      require(eventSize >= HeaderLen && eventSize <= bytes.length - off,
        s"event at $off overruns file (size=$eventSize)")
      require(sawFde || tpe == FormatDescriptionEvent,
        s"first event must be FORMAT_DESCRIPTION, got type $tpe")

      // The FDE always reserves its trailing 5 bytes for alg + checksum
      // (MySQL >= 5.6.1 layout; its own reader fetches the alg byte at
      // eventSize-5 unconditionally, log_event.cc get_checksum_alg).
      // Later events carry the 4 CRC bytes only when alg = CRC32.
      val fdeAlg =
        if (tpe == FormatDescriptionEvent) {
          // header + fixed part (2+50+4+1) + alg + crc = the v4 minimum
          require(eventSize >= HeaderLen + 62, s"FDE too short: $eventSize")
          bytes(off + eventSize - 5) & 0xff
        } else -1
      val crcLen =
        if (tpe == FormatDescriptionEvent) 4
        else if (checksummed) 4
        else 0
      require(eventSize >= HeaderLen + crcLen,
        s"event at $off too short for its checksum (size=$eventSize)")
      if (crcLen == 4 && (fdeAlg == 1 || (fdeAlg == -1 && checksummed))) {
        val crc = new CRC32()
        crc.update(bytes, off, eventSize - 4)
        val stored = buf(bytes, off + eventSize - 4, 4).getInt().toLong & 0xffffffffL
        require(crc.getValue == stored,
          f"CRC32 mismatch on event type $tpe at offset $off: " +
            f"computed ${crc.getValue}%08x, stored $stored%08x")
      }
      val body = buf(bytes, off + HeaderLen, eventSize - HeaderLen - crcLen)

      tpe match {
        case FormatDescriptionEvent =>
          val ver = body.getShort().toInt
          require(ver == 4, s"unsupported binlog version $ver")
          skip(body, 50 + 4) // server version, create ts
          val hdrLen = body.get() & 0xff
          require(hdrLen == HeaderLen, s"unsupported common header len $hdrLen")
          // remaining body = postHeaderLen array; alg already read at -5
          require(fdeAlg == 0 || fdeAlg == 1,
            s"unsupported checksum alg $fdeAlg")
          checksummed = fdeAlg == 1
          sawFde = true

        case TableMapEvent =>
          val tm = parseTableMap(body)
          tableMaps(tm.tableId) = tm

        case WriteRowsV2 | UpdateRowsV2 | DeleteRowsV2 =>
          pending ++= parseRowsEvent(body, tpe, logPos, tableMaps)
            .map(_.copy(gtid = currentGtid))

        case XidEvent =>
          committed ++= pending
          pending = Vector.empty
          currentGtid = None

        case GtidEvent =>
          // flags1, sid16, gno8 — the logical-clock tail (5.7+) is
          // version-dependent and skipped
          body.get()
          val sid = new Array[Byte](16); body.get(sid)
          val gno = body.getLong()
          currentGtid = Some(s"${uuidStr(sid)}:$gno")

        case PreviousGtidsEvent =>
          previousGtids = Some(parseGtidSet(body))

        case RotateEvent =>
          body.getLong() // next position (always 4 post-magic)
          val name = new Array[Byte](body.remaining())
          body.get(name)
          nextFile = Some(new String(name, UTF_8))

        case _ => // QUERY/GTID/STOP/… — size-skipped, row consumers don't need them
      }
      off += eventSize
    }
    ParsedBinlog(committed.result(), nextFile, pending.size, previousGtids)
  }

  /** Header-only walk returning the trailing ROTATE target — the chain
    * link at O(events) header reads, no row decode, no CRC pass (the
    * full [[parse]] is the integrity authority; this exists so chain
    * validation doesn't decode every row image a second time). */
  def scanRotate(bytes: Array[Byte]): Option[String] = {
    require(bytes.length >= 4 && Magic.indices.forall(i => bytes(i) == Magic(i)),
      "not a binlog: bad magic")
    var off = 4
    var checksummed = false
    var nextFile: Option[String] = None
    while (off < bytes.length) {
      require(bytes.length - off >= HeaderLen, s"truncated event header at $off")
      val b = buf(bytes, off, HeaderLen)
      b.getInt()
      val tpe = b.get() & 0xff
      b.getInt()
      val eventSize = b.getInt()
      require(eventSize >= HeaderLen && eventSize <= bytes.length - off,
        s"event at $off overruns file (size=$eventSize)")
      if (tpe == FormatDescriptionEvent) {
        require(eventSize >= HeaderLen + 62, s"FDE too short: $eventSize")
        checksummed = (bytes(off + eventSize - 5) & 0xff) == 1
      } else if (tpe == RotateEvent) {
        val crcLen = if (checksummed) 4 else 0
        require(eventSize >= HeaderLen + 8 + crcLen, "rotate body too short")
        val body = buf(bytes, off + HeaderLen, eventSize - HeaderLen - crcLen)
        body.getLong()
        val name = new Array[Byte](body.remaining())
        body.get(name)
        nextFile = Some(new String(name, UTF_8))
      }
      off += eventSize
    }
    nextFile
  }

  /** GTID-set wire encoding (PREVIOUS_GTIDS body): n_sids8, then per sid
    * sid16 + n_intervals8 + (start8, endExclusive8)*. Rendered in the
    * canonical `uuid:start[-endInclusive]` display form, comma-joined;
    * an empty set renders as "". Empty/inverted intervals (endEx <=
    * start) and sids left with no intervals are dropped defensively —
    * real servers never write them, but a consumer resuming "from the
    * set" must not see a malformed `uuid:1-0`. */
  private def parseGtidSet(b: ByteBuffer): String = {
    val nSids = b.getLong()
    (0L until nSids).flatMap { _ =>
      val sid = new Array[Byte](16); b.get(sid)
      val nIv = b.getLong()
      val ivs = (0L until nIv).flatMap { _ =>
        val start = b.getLong(); val endEx = b.getLong()
        if (endEx <= start) None
        else if (endEx - 1 == start) Some(s"$start")
        else Some(s"$start-${endEx - 1}")
      }
      if (ivs.isEmpty) None
      else Some(s"${uuidStr(sid)}:${ivs.mkString(":")}")
    }.mkString(",")
  }

  private def uuidStr(sid: Array[Byte]): String = {
    val h = sid.map(x => f"${x & 0xff}%02x").mkString
    s"${h.substring(0, 8)}-${h.substring(8, 12)}-${h.substring(12, 16)}-" +
      s"${h.substring(16, 20)}-${h.substring(20)}"
  }

  private def parseTableMap(b: ByteBuffer): TableMap = {
    val tableId = uint48(b)
    b.getShort() // flags
    val dbLen = b.get() & 0xff
    val db = str(b, dbLen); b.get() // NUL
    val tblLen = b.get() & 0xff
    val tbl = str(b, tblLen); b.get() // NUL
    // bound counts by the bytes actually present BEFORE allocating —
    // a corrupted non-checksummed file must fail, not balloon memory
    val n = lenenc(b).toInt
    require(n >= 0 && n <= b.remaining(), s"column count $n overruns event")
    val types = Array.fill(n)(b.get() & 0xff)
    val metaLen = lenenc(b).toInt
    require(metaLen >= 0 && metaLen <= b.remaining(),
      s"metadata length $metaLen overruns event")
    val metaEnd = b.position() + metaLen
    val cols = types.map { t =>
      val meta = t match {
        case TypeVarchar => (b.get() & 0xff) | ((b.get() & 0xff) << 8)
        case TypeDouble  => b.get() & 0xff // pack length (8)
        case _           => 0
      }
      ColumnDef(t, meta)
    }.toIndexedSeq
    require(b.position() == metaEnd,
      s"table-map metadata length mismatch: ${b.position()} vs $metaEnd")
    // nullability bitmap follows; row decoding uses per-row bitmaps instead
    TableMap(tableId, db, tbl, cols)
  }

  private def parseRowsEvent(b: ByteBuffer, tpe: Int, pos: Long,
      maps: collection.Map[Long, TableMap]): Vector[RowChange] = {
    val tableId = uint48(b)
    b.getShort() // flags
    val extraLen = (b.get() & 0xff) | ((b.get() & 0xff) << 8)
    skip(b, extraLen - 2) // extra-data length includes its own 2 bytes
    val tm = maps.getOrElse(tableId,
      throw new IllegalStateException(s"rows event for unmapped table id $tableId"))
    val n = lenenc(b).toInt
    require(n == tm.cols.size,
      s"rows event column count $n != table map ${tm.cols.size}")
    val present1 = bitmap(b, n)
    val present2 = if (tpe == UpdateRowsV2) bitmap(b, n) else present1
    val out = Vector.newBuilder[RowChange]
    while (b.hasRemaining) {
      // zero-progress guard: a corrupt all-zeros present bitmap would
      // otherwise make image() consume 0 bytes per iteration and this
      // loop emit empty rows until OOM (only reachable without CRCs)
      val p0 = b.position()
      tpe match {
        case WriteRowsV2 =>
          out += RowChange(tm.db, tm.table, InsertOp,
            None, Some(image(b, tm, present1)), pos)
        case DeleteRowsV2 =>
          out += RowChange(tm.db, tm.table, DeleteOp,
            Some(image(b, tm, present1)), None, pos)
        case UpdateRowsV2 =>
          val before = image(b, tm, present1)
          val after = image(b, tm, present2)
          out += RowChange(tm.db, tm.table, UpdateOp,
            Some(before), Some(after), pos)
      }
      require(b.position() > p0,
        "zero-progress row image — corrupt columns-present bitmap")
    }
    out.result()
  }

  /** One row image: null bitmap over PRESENT columns, then values. Absent
    * columns (minimal row images) decode as null — the consumer treats a
    * partial image like the reference treats its discarded before-values. */
  private def image(b: ByteBuffer, tm: TableMap,
                    present: IndexedSeq[Boolean]): IndexedSeq[Any] = {
    val nPresent = present.count(identity)
    val nulls = bitmap(b, nPresent)
    var pi = 0
    tm.cols.indices.map { i =>
      if (!present(i)) null
      else {
        val isNull = nulls(pi); pi += 1
        if (isNull) null else value(b, tm.cols(i))
      }
    }
  }

  private def value(b: ByteBuffer, c: ColumnDef): Any = c.tpe match {
    case TypeTiny     => b.get().toLong
    case TypeShort    => b.getShort().toLong
    case TypeLong     => b.getInt().toLong
    case TypeLongLong => b.getLong()
    case TypeDouble   => b.getDouble()
    case TypeVarchar  =>
      val len = if (c.meta < 256) b.get() & 0xff
                else (b.get() & 0xff) | ((b.get() & 0xff) << 8)
      str(b, len)
    case t => throw new IllegalStateException(s"unsupported column type $t")
  }

  // --- little-endian primitives ---

  private def buf(bytes: Array[Byte], off: Int, len: Int): ByteBuffer =
    ByteBuffer.wrap(bytes, off, len).order(ByteOrder.LITTLE_ENDIAN)

  private def skip(b: ByteBuffer, n: Int): Unit = b.position(b.position() + n)

  private def str(b: ByteBuffer, len: Int): String = {
    val a = new Array[Byte](len); b.get(a); new String(a, UTF_8)
  }

  private def uint48(b: ByteBuffer): Long =
    (0 until 6).map(i => (b.get().toLong & 0xff) << (8 * i)).sum

  /** net_store_length / length-encoded integer. */
  private def lenenc(b: ByteBuffer): Long = (b.get() & 0xff) match {
    case x if x < 0xfb => x.toLong
    case 0xfc => ((b.get() & 0xff) | ((b.get() & 0xff) << 8)).toLong
    case 0xfd => ((b.get() & 0xff) | ((b.get() & 0xff) << 8) |
      ((b.get() & 0xff) << 16)).toLong
    case 0xfe => b.getLong()
    case x => throw new IllegalStateException(s"bad length-encoded int $x")
  }

  /** LSB-first bitmap over `n` bits (the binlog's bit order). */
  private def bitmap(b: ByteBuffer, n: Int): IndexedSeq[Boolean] = {
    require(n >= 0 && (n + 7) / 8 <= b.remaining(),
      s"bitmap over $n bits overruns event")
    val bytes = new Array[Byte]((n + 7) / 8)
    b.get(bytes)
    (0 until n).map(i => (bytes(i / 8) & (1 << (i % 8))) != 0)
  }
}

/** The op constants [[BinlogFormat]] emits — aliased here so the parser
  * file has no Spark import (pure bytes → rows). They match
  * [[graft.operators.CdcTransform]]'s `Insert`/`Update`/`Delete`. */
private[sources] object CdcTransformOps {
  val InsertOp = "I"; val UpdateOp = "U"; val DeleteOp = "D"
}
