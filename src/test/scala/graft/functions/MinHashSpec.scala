package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** MinHash signature: the native kernel must agree exactly with the
  * composed built-ins pipeline it replaces (the form the DuckDB oracle
  * mirrors), and with a straight-line JVM reimplementation, per document. */
class MinHashSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val W = graft.queries.TrainingData.ShingleW
  private val K = graft.queries.TrainingData.MinhashK

  // independent JVM reference: normalize → shingles → distinct → base hash
  // → k universal-hash mins
  private def h32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(("mh|" + s).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }
  private def reference(text: String): Option[Seq[Long]] = {
    val toks = text.toLowerCase.replaceAll(Text.WsClass, " ").trim
      .split(" ", -1).toSeq
    if (toks.length < W) return None
    val shingles = toks.sliding(W).map(_.mkString(" ")).toSeq.distinct
    val hs = shingles.map(h32)
    Some((0 until K).map { i =>
      val (a, b) = DedupOps.hashParams(i)
      hs.map(h => (h * a + b) % DedupOps.HashModulus).min
    })
  }

  private def collectSigs(df: org.apache.spark.sql.DataFrame): Map[Long, Seq[Long]] =
    df.collect().map(r =>
      r.getLong(0) -> (1 to K).map(i => r.getLong(i)).toSeq).toMap

  test("native MinHashSig kernel ≡ composed explode+groupBy form") {
    val edge = Seq("", "   ", "one two", "one two three",
      "a b c d e f", "A  B\tC d efghij", "dup dup dup dup dup",
      " trailing and LEADING  ").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val docs = graft.queries.Tables.read(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("text"))
    for (df <- Seq(edge, docs)) {
      val kernel = collectSigs(
        DedupOps.minhashSignature(df, "doc_id", "text", W, K))
      val composed = collectSigs(
        DedupOps.minhashSignatureComposed(df, "doc_id", "text", W, K))
      assert(kernel.keySet == composed.keySet)
      val bad = composed.collect {
        case (id, e) if kernel(id) != e => (id, e, kernel(id))
      }
      assert(bad.isEmpty, s"first mismatches: ${bad.take(2).toList}")
    }
  }

  test("kernel ≡ JVM reference on every sf0.001 document") {
    val docs = graft.queries.Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, t) =>
      reference(t).map(id -> _)
    }.toMap
    val got = collectSigs(DedupOps.minhashSignature(
      graft.queries.Tables.read(spark, TestSpark.Sf0001, "documents"),
      "doc_id", "text", W, K))
    assert(got.keySet == expected.keySet)
    val bad = expected.collect {
      case (id, e) if got(id) != e => (id, e, got(id))
    }
    assert(bad.isEmpty, s"first mismatches: ${bad.take(2).toList}")
  }

  test("null text and short docs are dropped, like the composed form") {
    val df = Seq((0L, Option("one two three")), (1L, None), (2L, Option("a b")))
      .toDF("doc_id", "text")
    val ids = DedupOps.minhashSignature(df, "doc_id", "text", W, K)
      .select("doc_id").as[Long].collect().toSet
    assert(ids == Set(0L))
  }
}
