package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines (extension surface;
  * SURVEY.md §7.2 step 7). All built from codegen'd built-ins + shuffles on
  * compact keys — each strategy's scale behavior is noted on the method.
  *
  * Portability: hashes are MD5-derived ([[PortableHash]]) so the DuckDB
  * oracle reproduces signatures bit-for-bit.
  */
object DedupOps {

  // ---------------------------------------------------------------- exact

  /** Exact dedup on a fingerprint: keep the lowest-id row per identical
    * normalized text. One shuffle on a 32-char key; partial aggregation
    * makes this linear-scalable (the classic hash-groupBy dedup). */
  def exactDedup(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .withColumn("_fp", Text.fingerprint(col(textCol)))
      .groupBy(col("_fp").as("fingerprint"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  // -------------------------------------------------------------- minhash

  /** MinHash signature column `mh_0 … mh_{k-1}`: k independent permutations
    * approximated by salted MD5 minima over the shingle set.
    * Signature is computed in ONE pass over the exploded shingles with k
    * `min()` partial aggregates — no k-fold re-scan, no UDF. */
  def minhashSignature(docs: DataFrame, idCol: String, textCol: String,
                       shingleWidth: Int, k: Int): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(array_distinct(Text.wordShingles(col(textCol), shingleWidth)))
        .as("_sh"))
    val mins = (0 until k).map(i =>
      min(PortableHash.md5Hex(col("_sh"), s"mh$i|")).as(s"mh_$i"))
    sh.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
  }

  /** LSH band keys: group the k minhashes into `bands` bands of `rowsPerBand`
    * and hash each band; docs sharing any band key are near-dup candidates.
    * Output: (id, band, band_key) — the join/groupBy key is a short string,
    * so candidate generation is a cheap shuffle even at 100 TB. */
  def lshBands(sig: DataFrame, idCol: String,
               bands: Int, rowsPerBand: Int): DataFrame = {
    val bandCols = (0 until bands).map { b =>
      val parts = (0 until rowsPerBand)
        .map(r => col(s"mh_${b * rowsPerBand + r}"))
      struct(lit(b).as("band"),
        md5(concat_ws("|", parts: _*)).as("band_key"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("_b"))
      .select(col(idCol), col("_b.band").as("band"),
        col("_b.band_key").as("band_key"))
  }

  /** Near-duplicate candidate pairs from LSH buckets (id1 < id2,
    * distinct across bands). Self-join happens per (band, band_key) bucket —
    * worst-case quadratic only inside a bucket, so skew is bounded by
    * bucket size; at scale add a bucket-size cap before the join. */
  def lshCandidatePairs(bandsDf: DataFrame, idCol: String): DataFrame = {
    val a = bandsDf.select(col("band"), col("band_key"), col(idCol).as("id1"))
    val b = bandsDf.select(col("band"), col("band_key"), col(idCol).as("id2"))
    a.join(b, Seq("band", "band_key"))
      .filter(col("id1") < col("id2"))
      .select("id1", "id2").distinct()
  }

  /** Estimated Jaccard from signatures: fraction of agreeing minhashes. */
  def minhashJaccard(sig: DataFrame, pairs: DataFrame, idCol: String,
                     k: Int): DataFrame = {
    val s1 = sig.toDF(sig.columns.map(c => if (c == idCol) "id1" else s"a_$c"): _*)
    val s2 = sig.toDF(sig.columns.map(c => if (c == idCol) "id2" else s"b_$c"): _*)
    val agree = (0 until k).map(i =>
      when(col(s"a_mh_$i") === col(s"b_mh_$i"), 1).otherwise(0))
      .reduce(_ + _)
    pairs.join(s1, "id1").join(s2, "id2")
      .select(col("id1"), col("id2"),
        (agree.cast("double") / k).cast("decimal(10,6)").as("est_jaccard"))
  }

  // -------------------------------------------------------------- simhash

  /** `bits`-bit SimHash over the token set: for each bit, sign of the sum
    * of ±1 votes from each distinct token's hash bit. One explode + one
    * groupBy; the signature is an integer → exact-match bucketing gives
    * near-dup clusters. bits ≤ 30 keeps every intermediate in long range. */
  def simhash(docs: DataFrame, idCol: String, textCol: String,
              bits: Int): DataFrame = {
    require(bits <= 30, "portable simhash uses a 32-bit base hash")
    val toks = docs.select(col(idCol),
      explode(array_distinct(split(Text.normalize(col(textCol)), " ")))
        .as("_tok"))
      .withColumn("_h", PortableHash.hash32(col("_tok"), "sh|"))
    val votes = (0 until bits).map { b =>
      // vote_b = sum over tokens of (bit_b(h) ? 1 : -1)
      sum(when(shiftright(col("_h"), b) % 2 === 1, 1)
        .otherwise(-1)).as(s"v_$b")
    }
    val agg = toks.groupBy(col(idCol)).agg(votes.head, votes.tail: _*)
    val sig = (0 until bits).map(b =>
      when(col(s"v_$b") > 0, math.pow(2, b).toLong).otherwise(0L))
      .reduce(_ + _)
    agg.select(col(idCol), sig.cast("long").as("simhash"))
  }

  // -------------------------------------------- n-gram Jaccard (exact)

  /** Exact n-gram Jaccard for candidate pairs: |A∩B| via a join of distinct
    * shingles, |A∪B| = |A|+|B|−|A∩B|. Only candidate pairs (from LSH) are
    * scored — the all-pairs blowup never materializes. */
  def ngramJaccard(docs: DataFrame, pairs: DataFrame, idCol: String,
                   textCol: String, shingleWidth: Int): DataFrame = {
    val sh = docs.select(col(idCol).as("_id"),
      explode(array_distinct(Text.wordShingles(col(textCol), shingleWidth)))
        .as("_sh"))
    val sizes = sh.groupBy(col("_id")).agg(count(lit(1)).as("_n"))
    val sh1 = sh.select(col("_id").as("id1"), col("_sh"))
    val sh2 = sh.select(col("_id").as("id2"), col("_sh"))
    val intersectCount = pairs.join(sh1, "id1").join(sh2, Seq("id2", "_sh"))
      .groupBy(col("id1"), col("id2")).agg(count(lit(1)).as("_inter"))
    pairs
      .join(intersectCount, Seq("id1", "id2"), "left")
      .na.fill(0, Seq("_inter"))
      .join(sizes.select(col("_id").as("id1"), col("_n").as("_n1")), "id1")
      .join(sizes.select(col("_id").as("id2"), col("_n").as("_n2")), "id2")
      .select(col("id1"), col("id2"),
        (col("_inter").cast("double") /
          (col("_n1") + col("_n2") - col("_inter")).cast("double"))
          .cast("decimal(10,6)").as("jaccard"))
  }
}
