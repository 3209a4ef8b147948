package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Winnowing fingerprint: the distributed plan (posexplode + frame-window
  * min + per-doc agg) must agree exactly with a straight-line JVM
  * reimplementation of the algorithm, document by document. */
class WinnowSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = graft.queries.TrainingData.WinnowK
  private val W = graft.queries.TrainingData.WinnowW

  // JVM reference: same normalize, same MD5-derived 32-bit gram hash
  private def normalize(s: String): String =
    s.toLowerCase.replaceAll(Text.WsClass, " ").trim
  private def h32(s: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(("wn|" + s).getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.take(8), 16)
  }
  private def winnow(text: String): Option[(Long, Long, Long, Long)] = {
    val t = normalize(text)
    if (t.length < K) return None
    val grams = (0 to t.length - K).map(i => h32(t.substring(i, i + K)))
    if (grams.length < W) return None
    val mins = (0 to grams.length - W).map(j => grams.slice(j, j + W).min)
    Some((grams.length.toLong, mins.distinct.length.toLong,
      mins.min, mins.max))
  }

  test("kgramHashes: positions, short-text guard") {
    val got = Seq("abcdef").toDF("t")
      .select(Text.kgramHashes(col("t"), 5)).head().getSeq[Long](0)
    assert(got == Seq(h32("abcde"), h32("bcdef")))
    val short = Seq("abcd").toDF("t")
      .select(Text.kgramHashes(col("t"), 5)).head().getSeq[Long](0)
    assert(short.isEmpty)
  }

  test("x_winnow_fingerprint ≡ JVM reference on every sf0.001 document") {
    val docs = graft.queries.Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = docs.flatMap { case (id, txt) =>
      winnow(txt).map { case (g, n, lo, hi) => id -> ((g, n, lo, hi)) }
    }.toMap
    val got = graft.queries.TrainingData
      .queries("x_winnow_fingerprint")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap
    assert(got.keySet == expected.keySet)
    val bad = expected.collect {
      case (id, e) if got(id) != e => (id, e, got(id))
    }
    assert(bad.isEmpty, s"first mismatches: ${bad.take(3).toList}")
  }
}
