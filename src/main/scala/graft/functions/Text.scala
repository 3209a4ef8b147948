package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines
  * (extension surface beyond the reference — SURVEY.md §7.2 step 7).
  *
  * Every function is a pure codegen'd Column expression (no UDFs) with an
  * exactly-equivalent DuckDB SQL form for the oracle, so the whole family
  * is embarrassingly parallel: one scan, no shuffle, scales linearly to
  * 100 TB of documents.
  */
object Text {

  /** Normalize: lowercase, collapse whitespace runs, trim. The whitespace
    * class is spelled out explicitly because Java regex `\s` includes
    * vertical tab (\x0B) while DuckDB's RE2 `\s` does not — an explicit
    * class keeps both engines (and [[ShingleKernel.isWs]]) identical. */
  val WsChars = " \\t\\n\\r\\f\\x0B"
  val WsClass = s"[$WsChars]+"
  def normalize(text: Column): Column =
    trim(regexp_replace(lower(text), WsClass, " "))
  def normalizeDuck(x: String): String =
    s"trim(regexp_replace(lower($x), '$WsClass', ' ', 'g'))"

  /** Whitespace token count. */
  def tokenCount(text: Column): Column =
    size(split(normalize(text), " ")).cast("long")
  def tokenCountDuck(x: String): String =
    s"len(string_split(${normalizeDuck(x)}, ' '))"

  /** BPE-ish subword-unit count: alpha runs, digit runs, and single
    * non-alphanumeric marks each count as one unit (a cheap, deterministic
    * proxy for a BPE tokenizer's pre-tokenization). Whitespace is excluded
    * via the explicit [[WsChars]] set, not `\s` — Java regex `\s` matches
    * \x0B while RE2's does not, the same engine divergence [[WsClass]]
    * exists to avoid. */
  private val BpeUnitRe = s"[a-z]+|[0-9]+|[^a-z0-9$WsChars]"
  def bpeUnitCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpeUnitRe), lit(0)))
      .cast("long")
  def bpeUnitCountDuck(x: String): String =
    s"len(regexp_extract_all(lower($x), '$BpeUnitRe'))"

  /** Count occurrences of a word as a whole token. Token-filter semantics
    * (split + equality), NOT padded-substring removal — adjacent repeats
    * ("the the the") each count, which substring removal undercounts
    * because consecutive matches share the boundary space. */
  def wordOccurrences(text: Column, word: String): Column =
    size(filter(split(normalize(text), " "), t => t === word)).cast("int")
  def wordOccurrencesDuck(x: String, word: String): String =
    s"CAST(len(list_filter(string_split(${normalizeDuck(x)}, ' '), t -> t = '$word')) AS INT)"

  /** N-gram-frequency language ID heuristic: score each candidate language
    * by marker-token hits, pick the argmax (ties broken by language code
    * order). Markers are deterministic and tiny — the point is the Spark
    * shape (scan-only classification), not linguistic accuracy. */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of"),
    "de" -> Seq("der", "die", "und"),
    "es" -> Seq("el", "la", "que"),
    "fr" -> Seq("le", "la", "et"),
    "zh" -> Seq("de", "shi", "le"))

  def langScore(text: Column, lang: String): Column =
    LangMarkers.toMap.apply(lang)
      .map(wordOccurrences(text, _)).reduce(_ + _)

  def langId(text: Column): Column = {
    // argmax via greatest + chained when (deterministic tie-break: first
    // language in LangMarkers order wins).
    val scores = LangMarkers.map { case (l, _) => l -> langScore(text, l) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    } // foldRight so earlier langs take precedence via outermost when…
  }
  def langIdDuck(x: String): String = {
    val scoreSql = LangMarkers.map { case (l, ws) =>
      l -> ws.map(w => wordOccurrencesDuck(x, w)).mkString("(", " + ", ")")
    }
    val best = s"greatest(${scoreSql.map(_._2).mkString(", ")})"
    val whens = scoreSql.map { case (l, s) =>
      s"WHEN $s = $best AND $best > 0 THEN '$l'"
    }.mkString(" ")
    s"(CASE $whens ELSE 'und' END)"
  }

  /** Quality score in [0,1]: blend of length, punctuation ratio, stopword
    * ratio, mean word length — the standard cheap pre-filter stack.
    * Returned as DECIMAL(10,6) for oracle-exact comparison. */
  def qualityScore(text: Column): Column = {
    val toks = tokenCount(text).cast("double")
    val chars = length(text).cast("double")
    val punct = (length(text) -
      length(regexp_replace(text, "[.,;:!?]", ""))).cast("double")
    val stop = (wordOccurrences(text, "the") + wordOccurrences(text, "a") +
      wordOccurrences(text, "of")).cast("double")
    val lenScore = least(toks / lit(100.0), lit(1.0))
    val punctRatio = punct / greatest(chars, lit(1.0))
    val stopRatio = least(stop * lit(10.0) / greatest(toks, lit(1.0)), lit(1.0))
    val meanWord = chars / greatest(toks, lit(1.0))
    val wordScore = when(meanWord >= 3 && meanWord <= 10, lit(1.0)).otherwise(lit(0.5))
    ((lenScore * 0.3 + (lit(1.0) - punctRatio) * 0.2 +
      stopRatio * 0.3 + wordScore * 0.2)).cast("decimal(10,6)")
  }
  def qualityScoreDuck(x: String): String = {
    val toks = s"CAST(${tokenCountDuck(x)} AS DOUBLE)"
    val chars = s"CAST(len($x) AS DOUBLE)"
    val punct = s"CAST(len($x) - len(regexp_replace($x, '[.,;:!?]', '', 'g')) AS DOUBLE)"
    val stop = s"CAST(${wordOccurrencesDuck(x, "the")} + ${wordOccurrencesDuck(x, "a")} + ${wordOccurrencesDuck(x, "of")} AS DOUBLE)"
    val lenScore = s"least($toks / 100.0, 1.0)"
    val punctRatio = s"($punct / greatest($chars, 1.0))"
    val stopRatio = s"least($stop * 10.0 / greatest($toks, 1.0), 1.0)"
    val meanWord = s"($chars / greatest($toks, 1.0))"
    val wordScore = s"(CASE WHEN $meanWord >= 3 AND $meanWord <= 10 THEN 1.0 ELSE 0.5 END)"
    s"CAST($lenScore * 0.3 + (1.0 - $punctRatio) * 0.2 + $stopRatio * 0.3 + $wordScore * 0.2 AS DECIMAL(10,6))"
  }

  /** Document fingerprint: MD5 of the normalized text (content-defined
    * identity for exact dedup at scale; rolling-hash analog). */
  def fingerprint(text: Column): Column = md5(normalize(text))
  def fingerprintDuck(x: String): String = s"md5(${normalizeDuck(x)})"

  /** Character k-gram rolling hashes of an ALREADY-NORMALIZED text column:
    * `hash32(substr(t, i, k))` for i = 1 .. len−k+1, as an array. Input
    * must be a plain attribute (pre-projected [[normalize]] output), not an
    * expression: this column is referenced from inside a `transform`
    * lambda, where an inlined expression would re-evaluate per element.
    * Building block of the winnowing fingerprint (`x_winnow_fingerprint`).
    */
  def kgramHashes(normText: Column, k: Int): Column =
    when(length(normText) >= k,
      transform(sequence(lit(1), length(normText) - (k - 1)),
        i => PortableHash.hash32(normText.substr(i, lit(k)), "wn|")))
      .otherwise(array().cast("array<long>"))

  /** DuckDB form: one row per gram position (caller unnests the range),
    * hashing `substr(t, i, k)` with the same salt. */
  def kgramHashDuck(t: String, i: String, k: Int): String =
    PortableHash.duckSql(s"substr($t, CAST($i AS INT), $k)", "wn|")

  /** Word w-shingles as an array column: sliding windows of `w` tokens.
    * Built from higher-order functions only — codegen-friendly, no UDF. */
  def wordShingles(text: Column, w: Int): Column = {
    val toks = split(normalize(text), " ")
    // guard: Spark's sequence(a, b) descends when a > b, so short texts
    // must short-circuit to an empty array, not sequence(1, 0).
    when(size(toks) >= w,
      transform(sequence(lit(1), size(toks) - (w - 1)),
        i => concat_ws(" ", slice(toks, i, lit(w)))))
      .otherwise(array().cast("array<string>"))
  }
  /** DuckDB equivalent (1-based list indexing). */
  def wordShinglesDuck(x: String, w: Int): String = {
    val toks = s"string_split(${normalizeDuck(x)}, ' ')"
    s"""(CASE WHEN len($toks) >= $w
       | THEN list_transform(range(1, len($toks) - ${w - 1} + 1),
       |        i -> array_to_string(list_slice($toks, i, i + ${w - 1}), ' '))
       | ELSE [] END)""".stripMargin.replace("\n", " ")
  }
}
