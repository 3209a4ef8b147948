package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernel for winnowing window-mins. Semantics are EXACTLY the
  * composed form `min over w-frame of hash32(substr(normalize(text), i,
  * k))` — i.e. [[Text.kgramHashes]] + the frame-window min — but as one
  * Java pass per row. The composed form benched at ~26 s for sf0.1: each
  * per-gram hash is an interpreted (CodegenFallback) higher-order lambda
  * evaluating concat→md5→substring→conv per element, and the window adds
  * an explode + a doc_id shuffle. The kernel does ~0.2 µs of MD5 per gram
  * in-line and keeps the whole query scan-only (zero shuffles before the
  * final per-doc projection).
  *
  * Parity notes (same caveats as [[ShingleKernel]]): lowercase is
  * per-char (ASCII-equivalent to Spark `lower`), and gram positions are
  * UTF-16 char-based vs `substr`'s codepoint-based — identical on the
  * BMP/ASCII harness corpus; [[WinnowSpec]] pins the kernel against an
  * independent JVM reference and the DuckDB oracle re-derives the same
  * values from SQL.
  */
object WinnowKernel {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Salt = "wn|".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** First 8 hex chars of md5(salt ++ gram) as an unsigned 32-bit value —
    * ≡ `conv(substring(md5(concat('wn|', g)), 1, 8), 16, 10)`. */
  private def hash32(md: java.security.MessageDigest,
                     gram: Array[Byte]): Long = {
    md.update(Salt)
    val d = md.digest(gram) // digest() also resets for the next gram
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** Window-mins of the k-gram rolling hashes of the normalized text;
    * empty when the text has fewer than w complete windows. */
  def winnowMins(input: UTF8String, k: Int, w: Int): ArrayData = {
    // inline normalize: lowercase, collapse whitespace runs, trim
    val s = input.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    var pendingSpace = false
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) pendingSpace = sb.length() > 0
      else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(Character.toLowerCase(c))
      }
      i += 1
    }
    val t = sb.toString
    val grams = t.length - k + 1
    val wins = grams - w + 1
    if (wins <= 0) return new GenericArrayData(Array.empty[Any])
    val hashes = new Array[Long](grams)
    val md = md5.get()
    var g = 0
    while (g < grams) {
      hashes(g) = hash32(md, t.substring(g, g + k)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      g += 1
    }
    val out = new Array[Any](wins)
    var j = 0
    while (j < wins) {
      var m = hashes(j)
      var x = 1
      while (x < w) { if (hashes(j + x) < m) m = hashes(j + x); x += 1 }
      out(j) = m
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native winnow-mins expression — whole-stage-codegen compatible: the
  * generated code calls [[WinnowKernel.winnowMins]] directly. */
case class WinnowMins(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_mins requires a string argument, got ${child.dataType.sql}")
    else if (k < 1 || w < 1)
      TypeCheckResult.TypeCheckFailure(
        s"winnow_mins requires k >= 1 and w >= 1, got k=$k w=$w")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    WinnowKernel.winnowMins(v.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowKernel.winnowMins($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowMins =
    copy(child = newChild)
}

object WinnowExprs {
  /** Null text → empty array (matches the composed form, where every
    * downstream stage of a null text produces no rows). */
  def winnowMinsNative(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      Bridge.column(WinnowMins(Bridge.expression(text), k, w)),
      org.apache.spark.sql.functions.array().cast("array<long>"))
}
