package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop kernel for the whole MinHash signature. Semantics are
  * EXACTLY the composed pipeline in [[DedupOps.minhashSignatureComposed]]:
  * `explode(array_distinct(word-shingles)) → h = hash32(md5("mh|"||s)) →
  * groupBy(doc).agg(min((h·a_i + b_i) mod M) …)` — but as one Java pass
  * per row, returning the k mins as `array<long>`. The composed form
  * materializes every shingle as a row and shuffles them all back to the
  * doc just to take k mins; per-row signatures need no explode, no
  * exchange, and no 16-way aggregate, so the signature stage becomes
  * scan-shaped and linear-scalable (the shuffle that remains in the LSH
  * family is the band-bucket one, which is inherent).
  *
  * Parity notes (same caveats as [[ShingleKernel]]): tokenization is the
  * shared [[ShingleKernel.tokenize]]; the base hash is the first 8 MD5 hex
  * chars as an unsigned 32-bit value (≡ [[PortableHash.hash32]] with salt
  * "mh|"); the (a_i, b_i) family and modulus are [[DedupOps.hashParams]] /
  * [[DedupOps.HashModulus]] — all long arithmetic, bit-identical in Java
  * and in the composed Spark-SQL form. [[graft.functions]] MinHashSpec
  * pins kernel ≡ composed form on fixtures + real documents.
  */
object MinHashKernel {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  private val Salt = "mh|".getBytes(java.nio.charset.StandardCharsets.UTF_8)

  /** Largest k the cached parameter table supports. */
  val MaxK = 64
  private lazy val ParamA: Array[Long] =
    Array.tabulate(MaxK)(i => DedupOps.hashParams(i)._1)
  private lazy val ParamB: Array[Long] =
    Array.tabulate(MaxK)(i => DedupOps.hashParams(i)._2)

  /** k-slot MinHash signature over the distinct word `w`-shingles of the
    * text; empty array when the text has fewer than `w` tokens (the
    * composed form's explode+groupBy drops such docs). */
  def signature(input: UTF8String, w: Int, k: Int): ArrayData = {
    val toks = ShingleKernel.tokenize(input.toString)
    val n = toks.length - w + 1
    if (n <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.HashSet[String](n * 2)
    val mins = Array.fill(k)(Long.MaxValue)
    val md = md5.get()
    var j = 0
    while (j < n) {
      val sb = new java.lang.StringBuilder(toks(j))
      var x = 1
      while (x < w) { sb.append(' ').append(toks(j + x)); x += 1 }
      val sh = sb.toString
      if (seen.add(sh)) {
        md.update(Salt)
        val d = md.digest(sh.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        // first 8 hex chars of md5 as unsigned 32-bit — ≡ PortableHash.hash32
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        var i = 0
        while (i < k) {
          // h < 2^32, a < 2^30 ⇒ h·a + b < 2^62 + 2^30: no signed overflow,
          // same bound the composed Spark-SQL form relies on
          val v = (h * ParamA(i) + ParamB(i)) % DedupOps.HashModulus
          if (v < mins(i)) mins(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(mins.map(v => v: Any))
  }
}

/** Native MinHash-signature expression — whole-stage-codegen compatible:
  * the generated code calls [[MinHashKernel.signature]] directly. */
case class MinHashSig(child: Expression, w: Int, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != StringType)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires a string argument, got ${child.dataType.sql}")
    else if (k < 1 || k > MinHashKernel.MaxK)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig supports 1 <= k <= ${MinHashKernel.MaxK}, got $k")
    else if (w < 1)
      TypeCheckResult.TypeCheckFailure(
        s"minhash_sig requires shingle width w >= 1, got $w")
    else TypeCheckResult.TypeCheckSuccess

  override def nullSafeEval(v: Any): Any =
    MinHashKernel.signature(v.asInstanceOf[UTF8String], w, k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.MinHashKernel.signature($c, $w, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashExprs {
  /** Null text → empty array (the composed form's explode of an empty
    * shingle set produces no rows, so null docs never reach the
    * signature either way). */
  def minhashSigNative(text: Column, w: Int, k: Int): Column =
    org.apache.spark.sql.functions.coalesce(
      Bridge.column(MinHashSig(Bridge.expression(text), w, k)),
      org.apache.spark.sql.functions.array().cast("array<long>"))
}
