package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Cross-batch suppression is the property that distinguishes the
  * streaming near-dup from a per-batch dedup: a document whose near-dup
  * original arrived BATCHES earlier must still be flagged, which only
  * works if the band index persists and accrues across micro-batches. */
class StreamNearDupSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("near-dup of a batch-1 doc arriving in batch 3 is flagged") {
    // ids 1..6 → the gate's thirds split batches them {1,2},{3,4},{5,6};
    // id 6 repeats id 1's text (≫ shingle width, identical signature),
    // everything else is unique
    val again = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (1L, "en", again),
      (2L, "en", "completely different words about nothing in particular"),
      (3L, "de", "noch ein ganz anderer text ohne jede wiederholung hier"),
      (4L, "en", "fourth document with its own unrelated vocabulary set"),
      (5L, "de", "fuenfter text wieder voellig anders als alle vorherigen"),
      (6L, "en", again))
    val dir = java.nio.file.Files.createTempDirectory("snd_spec").toString
    docs.toDF("doc_id", "lang", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val flagged = graft.queries.PipelineOps.streamNearDupRaw(spark, dir)
      .as[(Long, String, Long)].collect()
      .map { case (id, _, d) => id -> d }.toMap
    assert(flagged.keySet == (1L to 6L).toSet)
    assert(flagged(6L) == 1L,
      "batch-3 near-dup of the batch-1 original was not flagged — " +
        "the band index did not survive across micro-batches")
    assert(flagged(1L) == 0L, "keep-first: the original must stay novel")
    assert(Seq(2L, 3L, 4L, 5L).forall(flagged(_) == 0L),
      s"unique docs flagged: $flagged")
  }
}
