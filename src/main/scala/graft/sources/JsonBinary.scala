package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** MySQL binary JSON (the `JSON` column type's storage and wire format,
  * WL#8132 / json_binary.h — public documentation) → JSON text.
  *
  * The reference's type map sends `json` to String
  * (`/root/reference/src/schema_converter.py:36`) and its client library
  * hands it decoded text; on the raw wire the row image carries the
  * BINARY document (blob-like: a length prefix, then one type byte and
  * the payload), so the decode below is what closes the last column-type
  * gap of the wire path.
  *
  * Layout implemented (the "small" variants cover documents < 64 KiB —
  * the large variants differ only in 4-byte counts/offsets and are
  * handled symmetrically):
  *
  *   - 0x00/0x01 object (small/large): count, size, then per key a
  *     (key-offset, key-length-2) entry, then per value a
  *     (type-1, offset-or-inlined-2/4) entry, then key bytes, then the
  *     non-inlined values; offsets are relative to the element start;
  *   - 0x02/0x03 array: count, size, value entries, values;
  *   - inlined in the entry's offset field: literal (0x04: null/true/
  *     false), int16 (0x05), uint16 (0x06) — plus int32/uint32 in the
  *     large form;
  *   - 0x05–0x0a integers (LE), 0x0b double (LE);
  *   - 0x0c utf8 string: variable-length length (7 bits per byte, high
  *     bit = continuation), then the bytes.
  *
  * Rendering is COMPACT canonical text (no whitespace, `\uXXXX` only for
  * control characters) with object keys in STORED order — MySQL stores
  * keys sorted by (length, bytes), and [[encode]] applies the same sort,
  * so fixture roundtrips reproduce server semantics. Malformed bytes
  * fail with diagnosable IllegalArgument/BufferUnderflow, per the
  * binlog parser's robustness contract. */
object JsonBinary {

  // ---- AST (the fixture-side input; the engine side only renders) ----
  sealed trait J
  case object JNull extends J
  final case class JBool(b: Boolean) extends J
  final case class JInt(v: Long) extends J
  final case class JDouble(v: Double) extends J
  final case class JStr(s: String) extends J
  final case class JArr(items: IndexedSeq[J]) extends J
  final case class JObj(fields: IndexedSeq[(String, J)]) extends J

  // type bytes
  private val SmallObj = 0x00; private val LargeObj = 0x01
  private val SmallArr = 0x02; private val LargeArr = 0x03
  private val Lit = 0x04
  private val I16 = 0x05; private val U16 = 0x06
  private val I32 = 0x07; private val U32 = 0x08
  private val I64 = 0x09; private val U64 = 0x0a
  private val Dbl = 0x0b; private val Str = 0x0c

  // ================= decode: binary document -> JSON text ==============

  /** JSON document nesting bound (MySQL's own MAX_JSON_DEPTH is 100) —
    * also the cycle breaker: a malformed container whose value entry
    * points back at itself would otherwise recurse to StackOverflow. */
  private val MaxDepth = 100

  /** Render a binary JSON document (type byte + payload) as text. */
  def render(doc: Array[Byte]): String = {
    require(doc.length >= 1, "empty JSON document")
    val sb = new java.lang.StringBuilder(doc.length * 2)
    renderValue(doc(0) & 0xff, doc, 1, sb, 0)
    sb.toString
  }

  private def le(d: Array[Byte], off: Int, n: Int): Long = {
    require(off >= 0 && off + n <= d.length, s"JSON value at $off overruns doc")
    var v = 0L
    (0 until n).foreach(i => v |= (d(off + i).toLong & 0xff) << (8 * i))
    v
  }

  /** Variable-length string length: 7 bits per byte, MSB = continuation. */
  private def varlen(d: Array[Byte], off: Int): (Int, Int) = {
    var len = 0L; var i = off; var shift = 0
    var cont = true
    while (cont) {
      require(i < d.length && shift < 35, s"unterminated varlen at $off")
      val b = d(i) & 0xff
      len |= (b & 0x7fL) << shift
      cont = (b & 0x80) != 0
      i += 1; shift += 7
    }
    require(len >= 0 && len <= Int.MaxValue, s"bad string length $len")
    (len.toInt, i)
  }

  private def renderValue(tpe: Int, d: Array[Byte], off: Int,
                          sb: java.lang.StringBuilder, depth: Int): Unit = tpe match {
    case SmallObj => renderContainer(d, off, sb, obj = true, small = true, depth)
    case LargeObj => renderContainer(d, off, sb, obj = true, small = false, depth)
    case SmallArr => renderContainer(d, off, sb, obj = false, small = true, depth)
    case LargeArr => renderContainer(d, off, sb, obj = false, small = false, depth)
    case Lit => le(d, off, 1) match {
      case 0 => sb.append("null"); ()
      case 1 => sb.append("true"); ()
      case 2 => sb.append("false"); ()
      case x => throw new IllegalArgumentException(s"bad JSON literal $x")
    }
    case I16 => sb.append(le(d, off, 2).toShort.toLong); ()
    case U16 => sb.append(le(d, off, 2)); ()
    case I32 => sb.append(le(d, off, 4).toInt.toLong); ()
    case U32 => sb.append(le(d, off, 4)); ()
    case I64 => sb.append(le(d, off, 8)); ()
    case U64 =>
      sb.append(java.lang.Long.toUnsignedString(le(d, off, 8))); ()
    case Dbl =>
      val v = java.lang.Double.longBitsToDouble(le(d, off, 8))
      // integral doubles render with a trailing .0, like MySQL's own text
      if (v == v.floor && !v.isInfinite && math.abs(v) < 1e15 &&
          v.toLong.toDouble == v)
        { sb.append(v.toLong).append(".0"); () }
      else { sb.append(v); () }
    case Str =>
      val (len, start) = varlen(d, off)
      require(start + len <= d.length, s"string at $off overruns doc")
      appendEscaped(new String(d, start, len, UTF_8), sb)
    case t => throw new IllegalArgumentException(s"unsupported JSON type $t")
  }

  private def appendEscaped(s: String, sb: java.lang.StringBuilder): Unit = {
    sb.append('"')
    s.foreach {
      case '"'  => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case '\n' => sb.append("\\n")
      case '\r' => sb.append("\\r")
      case '\t' => sb.append("\\t")
      case c if c < 0x20 => sb.append(f"\\u$c%04x")
      case c => sb.append(c)
    }
    sb.append('"'); ()
  }

  /** Containers: `off` points at the count field; entry offsets are
    * relative to exactly that position. */
  private def renderContainer(d: Array[Byte], off: Int,
      sb: java.lang.StringBuilder, obj: Boolean, small: Boolean,
      depth: Int): Unit = {
    require(depth < MaxDepth,
      s"JSON nesting exceeds $MaxDepth — malformed (cyclic?) document")
    val w = if (small) 2 else 4
    val count = le(d, off, w).toInt
    val size = le(d, off + w, w).toInt
    require(count >= 0 && size >= 0 && off + size <= d.length,
      s"container at $off overruns doc (count=$count size=$size)")
    val keyEntries = off + 2 * w
    val valEntries = keyEntries + (if (obj) count * (w + 2) else 0)
    sb.append(if (obj) '{' else '[')
    (0 until count).foreach { i =>
      if (i > 0) sb.append(',')
      if (obj) {
        val kOff = le(d, keyEntries + i * (w + 2), w).toInt
        val kLen = le(d, keyEntries + i * (w + 2) + w, 2).toInt
        require(off + kOff + kLen <= d.length, s"key $i overruns doc")
        appendEscaped(new String(d, off + kOff, kLen, UTF_8), sb)
        sb.append(':')
      }
      val e = valEntries + i * (1 + w)
      val t = le(d, e, 1).toInt
      val inlined = t == Lit || t == I16 || t == U16 ||
        (!small && (t == I32 || t == U32))
      if (inlined) renderValue(t, d, e + 1, sb, depth + 1)
      else renderValue(t, d, off + le(d, e + 1, w).toInt, sb, depth + 1)
    }
    sb.append(if (obj) '}' else ']'); ()
  }

  // ================= encode: AST -> binary document ====================

  /** Binary document (type byte + payload), small format. The fixture's
    * server side: key sort (length, then bytes) matches MySQL's stored
    * order, so decode(encode(x)) renders the text a real server would. */
  def encode(j: J): Array[Byte] = {
    val (t, payload) = enc(j)
    val out = new ByteArrayOutputStream(payload.length + 1)
    out.write(t); out.write(payload)
    out.toByteArray
  }

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
  private def leN(v: Long, n: Int): Array[Byte] =
    Array.tabulate(n)(i => ((v >> (8 * i)) & 0xff).toByte)

  /** (type byte, payload bytes). */
  private def enc(j: J): (Int, Array[Byte]) = j match {
    case JNull        => (Lit, Array(0.toByte))
    case JBool(true)  => (Lit, Array(1.toByte))
    case JBool(false) => (Lit, Array(2.toByte))
    case JInt(v) =>
      if (v >= Short.MinValue && v <= Short.MaxValue) (I16, leN(v, 2))
      else if (v >= Int.MinValue && v <= Int.MaxValue) (I32, leN(v, 4))
      else (I64, leN(v, 8))
    case JDouble(v) => (Dbl, leN(java.lang.Double.doubleToLongBits(v), 8))
    case JStr(s) =>
      val b = s.getBytes(UTF_8)
      require(b.length < 128, "fixture strings limited to 1-byte varlen")
      (Str, Array(b.length.toByte) ++ b)
    case JArr(items) => encContainer(items.map(("", _)), obj = false)
    case JObj(fields) =>
      // MySQL stores object keys sorted by (length, bytes) — the byte
      // comparison is UNSIGNED UTF-8 memcmp, which differs from String
      // order for non-BMP/private-use keys, so compare the bytes
      val sorted = fields
        .map { case (k, v) => (k.getBytes(UTF_8), k, v) }
        .sortWith { case ((a, _, _), (b, _, _)) =>
          if (a.length != b.length) a.length < b.length
          else {
            val i = a.indices.find(j => a(j) != b(j))
            i.exists(j => (a(j) & 0xff) < (b(j) & 0xff))
          }
        }
        .map { case (_, k, v) => (k, v) }
      encContainer(sorted, obj = true)
  }

  private def encContainer(fields: IndexedSeq[(String, J)],
                           obj: Boolean): (Int, Array[Byte]) = {
    val w = 2 // small format
    val count = fields.size
    val encoded = fields.map { case (k, v) => (k.getBytes(UTF_8), enc(v)) }
    val keyEntryBytes = if (obj) count * (w + 2) else 0
    val valEntryBytes = count * (1 + w)
    var cursor = 2 * w + keyEntryBytes + valEntryBytes
    val keyOffsets = encoded.map { case (kb, _) =>
      val o = cursor; if (obj) cursor += kb.length; o
    }
    val valSlots: IndexedSeq[Either[Array[Byte], Int]] =
      encoded.map { case (_, (t, payload)) =>
        val inlined = t == Lit || t == I16 || t == U16
        if (inlined) Left(java.util.Arrays.copyOf(payload, w))
        else { val o = cursor; cursor += payload.length; Right(o) }
      }
    val size = cursor
    require(size < 0x10000 && count < 0x10000,
      "fixture JSON limited to the small container format")
    val out = new ByteArrayOutputStream(size)
    out.write(le16(count)); out.write(le16(size))
    if (obj) encoded.indices.foreach { i =>
      out.write(le16(keyOffsets(i)))
      out.write(le16(encoded(i)._1.length))
    }
    encoded.indices.foreach { i =>
      out.write(encoded(i)._2._1) // type byte
      valSlots(i) match {
        case Left(inline) => out.write(inline)
        case Right(o)     => out.write(le16(o))
      }
    }
    if (obj) encoded.foreach { case (kb, _) => out.write(kb) }
    encoded.indices.foreach { i =>
      if (valSlots(i).isRight) out.write(encoded(i)._2._2)
    }
    ((if (obj) SmallObj else SmallArr), out.toByteArray)
  }
}
