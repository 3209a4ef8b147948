package graft.queries

import java.math.{BigDecimal => JBigDecimal, RoundingMode}
import java.security.MessageDigest
import org.scalatest.funsuite.AnyFunSuite
import graft.TestSpark

/** Independent JVM references for the curation operators: straight-line
  * Scala recomputations (no Spark expressions) of repetition stats, the
  * Gopher rule stack, greedy budget selection, and the incremental-dedup
  * band-index probe. Cross-engine exactness is pinned by the DuckDB
  * oracle gate; these pin the SEMANTICS against code that shares nothing
  * with the implementation. */
class CurationSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def normalize(t: String): String =
    t.toLowerCase.replaceAll("[ \\t\\n\\r\\f\\x0B]+", " ").trim
  private def tokens(t: String): Array[String] = normalize(t).split(" ", -1)
  private def bigrams(t: String): Array[String] = {
    val tk = tokens(t)
    if (tk.length < 2) Array.empty
    else (0 until tk.length - 1).map(i => s"${tk(i)} ${tk(i + 1)}").toArray
  }
  private def round6(x: Double): Double =
    new JBigDecimal(x).setScale(6, RoundingMode.HALF_UP).doubleValue

  private def docRows: Array[(Long, String, String)] =
    Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "lang", "text")
      .as[(Long, String, String)].collect()

  private def dupFrac(t: String): Double = {
    val tk = tokens(t)
    (tk.length - tk.distinct.length).toDouble / tk.length
  }
  private def topBigramFrac(t: String): Double = {
    val bg = bigrams(t)
    if (bg.isEmpty) 0.0
    else bg.groupBy(identity).values.map(_.length).max.toDouble / bg.length
  }

  test("weightedSample: passes draw independently; gate is pass 1") {
    // the pass salt (r7 ADVICE) must yield a genuinely different draw —
    // and the registered gate must remain exactly pass 1
    def draw(p: Int): Seq[(Int, Long)] =
      Curation.weightedSample(spark, TestSpark.Sf0001, p)
        .select("rk", "doc_id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    val p1 = draw(1)
    val p2 = draw(2)
    assert(p1.size == Curation.WSampleK && p2.size == Curation.WSampleK)
    assert(p1 != p2, "pass 2 drew the identical sample — salt not applied")
    val gate = Curation.queries("x_weighted_sample")(spark, TestSpark.Sf0001)
      .select("rk", "doc_id").as[(Int, Long)].collect().toSeq.sortBy(_._1)
    assert(gate == p1)
  }

  test("bpeLearn guard is lazy (no job at construction) and per-round") {
    // construction of the gate frame must launch no MORE Spark jobs than
    // a known-lazy gate reading the same table does (spark.read.parquet
    // itself runs a footer-listing job — that's the baseline, not the
    // guard); the old guard ran an eager isEmpty action on top
    val sc = spark.sparkContext
    def jobs(): Int = sc.statusTracker.getJobIdsForGroup(null).length
    val b0 = jobs()
    Curation.queries("x_repetition_stats")(spark, TestSpark.Sf0001)
    val baseline = jobs() - b0
    val b1 = jobs()
    val frame = Curation.queries("x_bpe_merges")(spark, TestSpark.Sf0001)
    val bpeJobs = jobs() - b1
    assert(bpeJobs <= baseline,
      s"x_bpe_merges construction launched $bpeJobs job(s) vs the lazy " +
        s"baseline's $baseline — guard is eager again")
    assert(frame.count() == Curation.BpeRounds)
    graft.GateCache.releaseAll()
    // degenerate corpus (all 1-char words → no adjacent symbol pair in
    // any word): the throw happens at ACTION time, not construction, and
    // names round 1
    val dir = java.nio.file.Files.createTempDirectory("bpe_deg").toString
    Seq((1L, "a b c"), (2L, "x y")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val degFrame = Curation.queries("x_bpe_merges")(spark, dir) // no throw
    val ex = intercept[Exception] { degFrame.count() }
    assert(ex.getMessage != null && ex.getMessage.contains("round 1"),
      s"guard message lost: ${ex.getMessage}")
    graft.GateCache.releaseAll()
  }

  test("x_repetition_stats matches a straight-line JVM recomputation") {
    val got = Curation.queries("x_repetition_stats")(spark, TestSpark.Sf0001)
      .as[(Long, Long, java.math.BigDecimal, java.math.BigDecimal)]
      .collect().map(r => r._1 -> ((r._2, r._3.doubleValue, r._4.doubleValue)))
      .toMap
    val docs = docRows
    assert(got.size == docs.length)
    docs.foreach { case (id, _, text) =>
      val (ntok, dup, topbg) = got(id)
      assert(ntok == tokens(text).length, s"doc $id token count")
      assert(dup == round6(dupFrac(text)), s"doc $id dup frac")
      assert(topbg == round6(topBigramFrac(text)), s"doc $id top bigram")
    }
  }

  test("x_gopher_filter_apply matches per-rule JVM accounting") {
    val got = Curation.queries("x_gopher_filter_apply")(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    val byLang = docRows.groupBy(_._2)
    assert(got.keySet == byLang.keySet)
    byLang.foreach { case (lang, docs) =>
      case class R(size: Boolean, dup: Boolean, topbg: Boolean, stop: Boolean,
                   ntok: Long)
      val rs = docs.map { case (_, _, text) =>
        val tk = tokens(text)
        val meanw = normalize(text).length.toDouble / tk.length
        val stopHits = tk.count(t => t == "the" || t == "a" || t == "of")
        R(size = tk.length < Curation.MinTokens ||
            tk.length > Curation.MaxTokens ||
            meanw < Curation.MinMeanWordLen || meanw > Curation.MaxMeanWordLen,
          dup = dupFrac(text) > Curation.MaxDupTokenFrac,
          topbg = topBigramFrac(text) > Curation.MaxTopBigramFrac,
          stop = stopHits < 1,
          ntok = tk.length.toLong)
      }
      val kept = rs.filter(r => !r.size && !r.dup && !r.topbg && !r.stop)
      val (_, nDocs, nKept, nSize, nDup, nTopbg, nStop, keptToks) = got(lang)
      assert(nDocs == docs.length, s"$lang n_docs")
      assert(nKept == kept.length, s"$lang n_kept")
      assert(nSize == rs.count(_.size), s"$lang n_fail_size")
      assert(nDup == rs.count(_.dup), s"$lang n_fail_dup")
      assert(nTopbg == rs.count(_.topbg), s"$lang n_fail_topbg")
      assert(nStop == rs.count(_.stop), s"$lang n_fail_stop")
      assert(keptToks == kept.map(_.ntok).sum, s"$lang kept_tokens")
    }
  }

  test("x_token_budget_select is the maximal quality-ordered prefix per language") {
    import org.apache.spark.sql.functions._
    // scoring pulled from the (already oracle-pinned) Text expressions;
    // the greedy prefix itself is recomputed in plain Scala
    val scored = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select(col("lang"), col("doc_id"),
        graft.functions.Text.tokenCount(col("text")).as("tok"),
        graft.functions.Text.qualityScore(col("text")).cast("double").as("q"))
      .as[(String, Long, Long, Double)].collect()
    val expect = scored.groupBy(_._1).map { case (lang, ds) =>
      val ordered = ds.sortBy(d => (-d._4, d._2))
      val cum = ordered.scanLeft(0L)(_ + _._3).tail
      val sel = ordered.zip(cum).filter(_._2 <= Curation.TokenBudget).map(_._1)
      lang -> ((sel.length.toLong, sel.map(_._3).sum))
    }
    val got = Curation.queries("x_token_budget_select")(spark, TestSpark.Sf0001)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect.toMap)
    got.values.foreach { case (_, toks) =>
      assert(toks <= Curation.TokenBudget)
    }
  }

  test("x_ngram_lm_score matches a straight-line JVM bigram LM") {
    val docs = docRows
    val allBigrams = docs.flatMap { case (id, _, t) => bigrams(t).map(id -> _) }
    val c2 = allBigrams.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val c1 = c2.groupBy(_._1.split(" ")(0)).view
      .mapValues(_.values.sum).toMap
    val v = docs.flatMap(d => tokens(d._3)).distinct.length
    val expect = allBigrams.groupBy(_._1).map { case (id, bs) =>
      val terms = bs.map { case (_, bg) =>
        val p = (c2(bg) + 1).toDouble / (c1(bg.split(" ")(0)) + v)
        new JBigDecimal(math.log(p) * 1e9)
          .setScale(0, RoundingMode.HALF_UP).longValue
      }
      id -> ((bs.length.toLong, terms.sum))
    }
    val got = Curation.queries("x_ngram_lm_score")(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expect)
  }

  test("x_vocab_coverage: minimal prefix covering >= 90% of token mass") {
    val freqs = docRows.flatMap(d => tokens(d._3))
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, f) => (-f, t) }
    val total = freqs.map(_._2).sum
    val cums = freqs.scanLeft(0L)(_ + _._2).tail
    val n90 = freqs.zip(cums)
      .count { case ((_, f), c) => (c - f) * 10 < total * 9 }
    val (vocab, tot, got90) =
      Curation.queries("x_vocab_coverage")(spark, TestSpark.Sf0001)
        .as[(Long, Long, Long)].head()
    assert(vocab == freqs.length && tot == total && got90 == n90)
    // the prefix really covers ≥ 90%, and dropping its last token doesn't
    val cover = freqs.take(n90.toInt).map(_._2).sum
    assert(cover * 10 >= total * 9)
    assert(freqs.take(n90.toInt - 1).map(_._2).sum * 10 < total * 9)
  }

  test("x_vocab_coverage: cumsum range count follows the session, result invariant") {
    // the distributed prefix sum must widen with the cluster — the range
    // count is defaultParallelism (or the conf override), never a literal
    def rangeN(plan: String): Option[Int] =
      "rangepartitioning\\([^)]*\\bfreq\\b[^)]*, (\\d+)\\)".r
        .findFirstMatchIn(plan).map(_.group(1).toInt)
    val default = Curation.queries("x_vocab_coverage")(spark, TestSpark.Sf0001)
    val defaultPlan = default.queryExecution.executedPlan.toString
    assert(rangeN(defaultPlan).contains(spark.sparkContext.defaultParallelism),
      s"range count does not follow the session:\n$defaultPlan")
    val base = default.as[(Long, Long, Long)].head()
    graft.GateCache.releaseAll()
    // …and the exact result is independent of the partitioning (the
    // offset join realigns any contiguous range split)
    spark.conf.set("graft.vocab.cumsum.partitions", "3")
    try {
      val over = Curation.queries("x_vocab_coverage")(spark, TestSpark.Sf0001)
      assert(rangeN(over.queryExecution.executedPlan.toString).contains(3))
      assert(over.as[(Long, Long, Long)].head() == base)
    } finally {
      spark.conf.unset("graft.vocab.cumsum.partitions")
      graft.GateCache.releaseAll()
    }
  }

  test("x_mixture_sample: odd sources keep everything, even sources downsample") {
    val got = Curation.queries("x_mixture_sample")(spark, TestSpark.Sf0001)
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (src, orig, sampled) =>
      assert(sampled <= orig, src)
      if (src.drop(3).toLong % 2 == 1) assert(sampled == orig, src)
    }
    // uniform corpus shares + 3:1 target weights ⇒ the even half must
    // actually shed documents somewhere
    assert(got.filter(_._1.drop(3).toLong % 2 == 0).map(r => r._2 - r._3).sum > 0)
  }

  test("x_dedup_incremental matches a JVM band-index probe over the signatures") {
    // independent reference: collect the minhash signatures, derive band
    // keys in plain Scala (md5 of the pipe-joined band values — mirroring
    // lshBands' definition, not its execution), probe delta keys against
    // the corpus key set
    val sig = TrainingData.minhashSig(spark, TestSpark.Sf0001).collect()
    def bandKeys(row: org.apache.spark.sql.Row): Seq[(Int, String)] =
      (0 until TrainingData.Bands).map { b =>
        val vals = (0 until TrainingData.RowsPerBand)
          .map(r => row.getLong(1 + b * TrainingData.RowsPerBand + r))
        val md5 = MessageDigest.getInstance("MD5")
          .digest(vals.mkString("|").getBytes("UTF-8"))
        b -> md5.map("%02x".format(_)).mkString
      }
    val delta = sig.filter(_.getLong(0) % Curation.DeltaMod == Curation.DeltaMod - 1)
    val corpusKeys = sig
      .filter(_.getLong(0) % Curation.DeltaMod != Curation.DeltaMod - 1)
      .flatMap(bandKeys).toSet
    val dupIds = delta.filter(r => bandKeys(r).exists(corpusKeys.contains))
      .map(_.getLong(0)).toSet
    val docs = docRows
    val expect = docs.filter(_._1 % Curation.DeltaMod == Curation.DeltaMod - 1)
      .groupBy(_._2).map { case (lang, ds) =>
        val dup = ds.count(d => dupIds.contains(d._1))
        lang -> ((ds.length.toLong, dup.toLong, (ds.length - dup).toLong))
      }
    val got = Curation.queries("x_dedup_incremental")(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expect.toMap)
    got.foreach { case (lang, (nNew, nDup, nNovel)) =>
      assert(nNew == nDup + nNovel, s"$lang accounting")
    }
  }

  test("x_dsir_weights: straight-line JVM reference; target-lang enrichment") {
    // reference at sf0.001 (50 docs, top-k = all): hash grams, build both
    // smoothed distributions, score every doc — full list must match
    val ds = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    def hash32(s: String): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(("dsir|" + s).getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    def grams(t: String): Seq[String] = {
      val toks = tokens(t).toSeq
      toks ++ toks.sliding(2).filter(_.length == 2).map(_.mkString(" "))
    }
    val B = Curation.DsirBuckets
    val perDoc = ds.map { case (id, lang, text) =>
      (id, lang, grams(text).map(g => hash32(g) % B))
    }
    val raw = perDoc.flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tgt = perDoc.filter(_._2 == Curation.DsirTargetLang)
      .flatMap(_._3).groupBy(identity).view.mapValues(_.length.toLong).toMap
    val totR = raw.values.sum; val totT = tgt.values.sum
    def halfUp(x: Double): Long =
      new JBigDecimal(x).setScale(0, RoundingMode.HALF_UP).longValueExact()
    val lr: Map[Long, Long] = raw.map { case (bkt, cr) =>
      bkt -> halfUp((math.log((tgt.getOrElse(bkt, 0L) + 1).toDouble / (totT + B)) -
        math.log((cr + 1).toDouble / (totR + B))) * 1e9)
    }
    val expected = perDoc.map { case (id, _, bkts) =>
      (id, bkts.length.toLong, bkts.map(lr).sum)
    }.sortBy { case (id, _, w) => (-w, id) }.take(Curation.DsirTopK).toSeq
    val got = Curation.queries("x_dsir_weights")(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got == expected)

    // enrichment at sf0.01 (500 docs, top-50): the whole point of the
    // importance weight — the target language's share of the selected
    // subset must exceed its corpus share
    val sf01 = "/root/testdata/sf0.01"
    val top = Curation.queries("x_dsir_weights")(spark, sf01)
      .select("doc_id").as[Long].collect().toSet
    val langOf = Tables.read(spark, sf01, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect().toMap
    val corpusShare = langOf.values
      .count(_ == Curation.DsirTargetLang).toDouble / langOf.size
    val topShare = top.count(id =>
      langOf(id) == Curation.DsirTargetLang).toDouble / top.size
    assert(topShare > corpusShare,
      s"top-k target share $topShare vs corpus $corpusShare")
  }

  test("x_bpe_merges: matches a straight-line canonical (array-form) BPE trainer") {
    // canonical BPE on symbol ARRAYS — deliberately the stricter form the
    // gate's greedy-string apply is documented against; agreement here
    // proves the string caveat doesn't bite on this corpus/rounds
    val wf = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("text").as[String].collect()
      .flatMap(t => tokens(t)).filter(_.nonEmpty)
      .groupBy(w => w).view.mapValues(_.length.toLong).toMap
    var syms: Map[String, Vector[String]] =
      wf.keys.map(w => w -> w.map(_.toString).toVector).toMap
    def applyMerge(v: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += v(i); i += 1 }
      }
      out.result()
    }
    val expected = (1 to Curation.BpeRounds).map { r =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (w, v) =>
        v.sliding(2).foreach {
          case Vector(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + wf(w)
          case _ =>
        }
      }
      val ((a, b), freq) = counts.toSeq
        .minBy { case ((x, y), c) => (-c, s"$x $y") }
      syms = syms.map { case (w, v) => w -> applyMerge(v, a, b) }
      (r, s"$a $b", a + b, freq)
    }
    val got = Curation.queries("x_bpe_merges")(spark, TestSpark.Sf0001)
      .as[(Int, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(got == expected,
      s"gate $got vs canonical $expected — greedy-string caveat bit")
  }

  test("x_bpe_tokenize: per-lang token accounting matches a canonical apply") {
    // same canonical array-form trainer as the x_bpe_merges spec, here
    // driven through to per-word symbol counts and corpus accounting
    val ds = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "lang", "text").as[(Long, String, String)].collect()
    val words = ds.flatMap(d => tokens(d._3)).filter(_.nonEmpty)
    val wf = words.groupBy(identity).view.mapValues(_.length.toLong).toMap
    var syms: Map[String, Vector[String]] =
      wf.keys.map(w => w -> w.map(_.toString).toVector).toMap
    def applyMerge(v: Vector[String], a: String, b: String): Vector[String] = {
      val out = Vector.newBuilder[String]; var i = 0
      while (i < v.length) {
        if (i + 1 < v.length && v(i) == a && v(i + 1) == b) {
          out += (a + b); i += 2
        } else { out += v(i); i += 1 }
      }
      out.result()
    }
    (1 to Curation.BpeRounds).foreach { _ =>
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      syms.foreach { case (w, v) =>
        v.sliding(2).foreach {
          case Vector(a, b) =>
            counts((a, b)) = counts.getOrElse((a, b), 0L) + wf(w)
          case _ =>
        }
      }
      val ((a, b), _) = counts.toSeq.minBy { case ((x, y), c) => (-c, s"$x $y") }
      syms = syms.map { case (w, v) => w -> applyMerge(v, a, b) }
    }
    val expected = ds.groupBy(_._2).map { case (lang, rows) =>
      val ws = rows.flatMap(r => tokens(r._3)).filter(_.nonEmpty)
      lang -> ((rows.length.toLong, ws.length.toLong,
        ws.map(w => syms(w).length.toLong).sum))
    }
    val got = Curation.queries("x_bpe_tokenize")(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
    // every word is ≥1 symbol, and merging can only shrink symbol counts
    // toward that floor — so bpe is bounded below by the word count and
    // above by the character count
    val chars = ds.groupBy(_._2).map { case (lang, rows) =>
      lang -> rows.flatMap(r => tokens(r._3)).filter(_.nonEmpty)
        .map(_.length.toLong).sum
    }
    got.foreach { case (lang, (_, ws, bpe)) =>
      assert(bpe >= ws && bpe <= chars(lang))
    }
  }

  test("x_shard_assign: budget-packed manifest over the hash order") {
    // straight-line reference: hash-order the docs, running token sum,
    // shard = exclusive-prefix div budget
    val ds = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    def hash32(s: String): Long = {
      val d = MessageDigest.getInstance("MD5")
        .digest(("shard|" + s).getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(4).map("%02x".format(_)).mkString, 16)
    }
    val ordered = ds
      .map { case (id, t) => (hash32(id.toString), id, tokens(t).length.toLong) }
      .sortBy { case (h, id, _) => (h, id) }
    var cum = 0L
    val assigned = ordered.map { case (_, id, nt) =>
      val shard = cum / Curation.ShardTokenBudget; cum += nt; (shard, id, nt)
    }
    val expected = assigned.groupBy(_._1).map { case (sh, rows) =>
      sh -> ((rows.length.toLong, rows.map(_._3).sum))
    }
    val got = Curation.queries("x_shard_assign")(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == expected)
    // shards are contiguous 0..max and every FULL shard's mass covers its
    // budget window (a doc never splits, so a shard can only overshoot)
    val maxShard = got.keys.max
    assert(got.keySet == (0L to maxShard).toSet)
    (0L until maxShard).foreach { sh =>
      val massThrough = (0L to sh).map(s => got(s)._2).sum
      assert(massThrough >= (sh + 1) * Curation.ShardTokenBudget)
    }
  }

  test("x_equidepth_bins: ntile semantics, balanced sizes, monotone boundaries") {
    val k = Curation.EquiDepthBins
    val ds = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "n_chars").as[(Long, Long)].collect()
    val ranked = ds.sortBy { case (id, nc) => (nc, id) }.zipWithIndex
    val expected = ranked
      .map { case ((_, nc), i) => (i.toLong * k / ds.length, nc) }
      .groupBy(_._1).map { case (b, rows) =>
        b -> ((rows.length.toLong, rows.map(_._2).min, rows.map(_._2).max))
      }
    val got = Curation.queries("x_equidepth_bins")(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
    // balanced within one row; boundaries monotone across bins
    val sizes = got.values.map(_._1)
    assert(sizes.max - sizes.min <= 1)
    (0L until (k - 1).toLong).foreach { b =>
      assert(got(b)._3 <= got(b + 1)._2)
    }
  }

  test("x_token_entropy ≡ straight-line nano-unit entropy; uniform-doc law") {
    val ds = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "text").as[(Long, String)].collect()
    val expected = ds.flatMap { case (id, t) =>
      val tk = tokens(t).filter(_.nonEmpty)
      if (tk.isEmpty) None
      else {
        val cs = tk.groupBy(identity).view.mapValues(_.length.toLong)
        val n = tk.length.toLong
        val nano = cs.values.map { c =>
          val p = c.toDouble / n
          new JBigDecimal(p * math.log(p) * 1e9)
            .setScale(0, RoundingMode.HALF_UP).longValue
        }.sum
        Some(id -> ((n, cs.size.toLong, -nano)))
      }
    }.toMap
    val got = Curation.queries("x_token_entropy")(spark, TestSpark.Sf0001)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == expected)
    // entropy is bounded by ln(n_distinct) (uniform distribution law)
    got.foreach { case (id, (_, d, e)) =>
      assert(e >= 0 && e <= math.ceil(math.log(d.toDouble) * 1e9).toLong + d,
        s"doc $id entropy $e outside [0, ln($d)]")
    }
  }

  test("x_cooccur_lift ≡ straight-line lift reference with exact tie order") {
    val texts = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("text").as[String].collect()
    val toks = texts.flatMap(t => tokens(t)).filter(_.nonEmpty)
    val uni = toks.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val bgAll = texts.flatMap(bigrams)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ntok = toks.length.toLong
    val nbg = bgAll.values.sum
    val expected = bgAll.toSeq
      .filter(_._2 >= Curation.LiftMinCount)
      .map { case (bgm, cab) =>
        val Array(a, b) = bgm.split(" ")
        val lift = cab.toDouble * ntok * ntok / (nbg.toDouble * uni(a) * uni(b))
        (bgm, cab, round6(lift))
      }
      .sortBy { case (bgm, _, l) => (-l, bgm) }.take(Curation.LiftTopK)
    val got = Curation.queries("x_cooccur_lift")(spark, TestSpark.Sf0001)
      .as[(String, Long, java.math.BigDecimal)].collect()
      .map(r => (r._1, r._2, r._3.doubleValue)).toSeq
    assert(got == expected)
  }

  test("x_epoch_upsample: deterministic per-doc multiplicities match the straight-line recipe; scan-only plan") {
    val df = Curation.queries("x_epoch_upsample")(spark, TestSpark.Sf0001)
    // map-side claim: weights + explode ride the scan, no Exchange
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"upsample plan shuffles:\n$plan")
    val rows = df.as[(Long, String, Int)].collect()
    val docs = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("doc_id", "lang").as[(Long, String)].collect()
    def md5hex(s: String): String =
      MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    def h32(id: Long): Long =
      java.lang.Long.parseLong(md5hex(s"epoch|$id").substring(0, 8), 16)
    val wFull = Map("en" -> 2, "fr" -> 0).withDefaultValue(1)
    val wThr = Map("en" -> Curation.EpochThrHalf,
      "de" -> Curation.EpochThrQuarter, "fr" -> Curation.EpochThrHalf,
      "es" -> Curation.EpochThr3Q).withDefaultValue(0L)
    val expected = docs.flatMap { case (id, lang) =>
      val n = wFull(lang) + (if (h32(id) < wThr(lang)) 1 else 0)
      (0 until n).map(e => (id, lang, e))
    }.toSet
    assert(rows.toSet == expected)
    assert(rows.length == expected.size) // no duplicate copies
    // fractional epochs actually fire both ways somewhere in the corpus
    val nByLang = rows.groupBy(_._2).view.mapValues(_.length).toMap
    val dByLang = docs.groupBy(_._2).view.mapValues(_.length).toMap
    assert(nByLang("en") > 2 * dByLang("en")) // some en docs got the 3rd copy
    assert(nByLang("en") < 3 * dByLang("en"))
  }

  test("x_mad_outliers: median/MAD/fence match a straight-line reference; robust vs the mean") {
    val rows = Curation.queries("x_mad_outliers")(spark, TestSpark.Sf0001)
      .as[(String, Long, Long, Long, Double, Double)].collect()
    val docs = Tables.read(spark, TestSpark.Sf0001, "documents")
      .select("lang", "n_chars").as[(String, Long)].collect()
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted; val n = s.length
      if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
    }
    val byLang = docs.groupBy(_._1).view.mapValues(_.map(_._2.toDouble).toSeq)
    rows.foreach { case (lang, nOut, minL, maxL, med, mad) =>
      val xs = byLang(lang)
      val m = median(xs)
      val md = median(xs.map(x => math.abs(x - m)))
      assert(med == m && mad == md, s"$lang: ($med,$mad) vs ($m,$md)")
      val out = xs.filter(x => math.abs(x - m) > md * 1.5)
      assert(nOut == out.length)
      assert(out.nonEmpty || nOut == 0L)
      if (out.nonEmpty) {
        assert(minL == out.min.toLong && maxL == out.max.toLong)
      }
    }
    assert(rows.nonEmpty)
  }
}
