package graft.functions

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernel for normalized word shingles. Semantics are EXACTLY
  * `transform(sequence(...), i -> concat_ws(" ", slice(split(trim(
  * regexp_replace(lower(text), "\s+", " ")), " "), i, w)))` — i.e.
  * [[Text.wordShingles]] — but as one Java pass instead of five nested
  * interpreted higher-order expressions (which benched as the hot loop of
  * the whole dedup family). Whitespace set matches Java regex `\s`
  * (space, \t, \n, \x0B, \f, \r); lowercase is ASCII-equivalent to
  * Spark's `lower` (the harness corpus is ASCII).
  */
object ShingleKernel {
  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

  /** Normalized token list ≡ `split(`[[Text.normalize]]`(s), " ")`:
    * inline lowercase + whitespace collapse (no alloc of the normalized
    * string). Shared by the shingle and minhash kernels. */
  private[functions] def tokenize(s: String): ArrayBuffer[String] = {
    val toks = new ArrayBuffer[String]()
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (isWs(c)) {
        if (sb.length > 0) { toks += sb.toString; sb.setLength(0) }
      } else sb.append(Character.toLowerCase(c))
      i += 1
    }
    if (sb.length > 0) toks += sb.toString
    // split("", any) yields [""] — mirror that degenerate case so the
    // kernel matches split(normalize(text), " ") exactly (incl. w=1)
    if (toks.isEmpty) toks += ""
    toks
  }

  def shingles(input: UTF8String, w: Int): ArrayData = {
    val toks = tokenize(input.toString)
    val n = toks.length - w + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n)
    var j = 0
    while (j < n) {
      val shingle = new java.lang.StringBuilder(toks(j))
      var k = 1
      while (k < w) { shingle.append(' ').append(toks(j + k)); k += 1 }
      out(j) = UTF8String.fromString(shingle.toString)
      j += 1
    }
    new GenericArrayData(out)
  }
}

/** Native form of [[Text.wordShingles]] — whole-stage-codegen compatible:
  * the generated code calls [[ShingleKernel.shingles]] directly, keeping
  * the surrounding project/generate pipeline fused. */
case class WordShingles(child: Expression, width: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType != StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires a string argument, got ${child.dataType.sql}")
    else if (width < 1)
      // plan-time rejection: the kernel loop would AIOOBE per-row on the
      // executor for width < 1
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires width >= 1, got $width")
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    ShingleKernel.shingles(v.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShingleKernel.shingles($c, $width)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object ShingleExprs {
  /** Null text → empty array (the higher-order reference form's behavior:
    * `when(size(null) >= w)` is null-cond → otherwise-branch → `array()`),
    * so the native and HOF forms agree on null too. */
  def wordShinglesNative(text: Column, w: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      Bridge.column(WordShingles(Bridge.expression(text), w)),
      org.apache.spark.sql.functions.array().cast("array<string>"))
}
