package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`) — extension
  * surface (SURVEY.md §7.2 step 7).
  *
  * Vector math uses Spark's higher-order functions (`zip_with` +
  * `aggregate`) — codegen'd, no UDF, left-to-right summation so the DuckDB
  * oracle (explicit term-sum or list functions) can match deterministically
  * after rounding.
  */
object SimilarityOps {

  /** Dot product — native codegen'd [[DotProduct]] expression (double
    * accumulator, sequential left-to-right fold — deterministic order,
    * bit-identical to [[dotHof]] and to the generated oracle term-sum). */
  def dot(a: Column, b: Column): Column = VectorExprs.dotNative(a, b)

  /** Higher-order-function form (`zip_with`+`aggregate`): semantically
    * identical, but CodegenFallback — kept as the reference implementation
    * the spec checks the native expression against. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force top-k cosine neighbors for a set of query vectors.
    * Cross join (queries × corpus) — the corpus side streams; with Q query
    * rows broadcast, this is a single scan of the corpus doing Q·d FMAs per
    * row, then a per-query top-k (window). The correct baseline, and the
    * right plan when Q is small; scale path is [[lshAnnTopK]]. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    // norms precomputed per ROW (not per pair): the pair stage does one dot
    // + one divide. Same arithmetic as norm-per-pair, 3× fewer dots.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      norm(col(vecCol)).as("_qn"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      norm(col(vecCol)).as("_cn"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn"))).as("_cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("_cos"), 6).desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("_cos"), 6).cast("decimal(10,6)").as("cos_sim"))
  }

  /** Random-hyperplane LSH bucket key: `planes` sign bits from fixed
    * pseudo-random hyperplanes (seeded by [[PortableHash]] of (plane, dim),
    * so buckets are deterministic and oracle-reproducible without shipping
    * plane data). Sign bit b = sign(Σ_d w(b,d)·v[d]) with w ∈ {-1,+1}.
    * Native [[HyperplaneKey]] kernel; VectorSpec pins it bit-identical to
    * [[hyperplaneKeyComposed]], whose term order the oracle SQL mirrors. */
  def hyperplaneKey(vec: Column, planes: Int, dim: Int): Column =
    VectorExprs.hyperplaneKeyNative(vec, planes, dim)

  /** Composed built-ins form of [[hyperplaneKey]] — the executable spec of
    * the kernel's arithmetic (a planes×dim literal tree; Janino splits it
    * into dozens of generated methods, which is why the kernel exists). */
  def hyperplaneKeyComposed(vec: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      // w(p,d) = ±1 from MD5 parity of (p,d) — plan-time literals shared
      // with the oracle generator ([[hyperplaneWeight]]), folded by codegen.
      val proj = (0 until dim).map(d =>
        lit(hyperplaneWeight(p, d)) * element_at(vec, d + 1).cast("double"))
        .reduce(_ + _)
      when(proj > 0, math.pow(2, p).toLong).otherwise(0L)
    }
    bits.reduce(_ + _).cast("long")
  }

  /** LSH-bucketed ANN, banded OR-construction (the amplification trick the
    * minhash path uses, applied to sign bits): one `bands·bandBits`-plane
    * key per vector, split into `bands` sub-keys; a corpus row is a
    * candidate for a query if ANY band matches, with Hamming-1 multi-probe
    * inside the band (query probes its band key plus each one-bit flip —
    * [[hyperplaneProbeKeys]]). Candidates are exact-cosine scored once
    * (duplicate band matches collapse via distinct on the deterministic
    * score) and top-k ranked.
    *
    * Scale shape: corpus explodes ×bands, queries ×bands·(bandBits+1) —
    * but the query side is the small broadcast side, and the join stays an
    * equi-join on (band, key): no cross join, no non-equi. Recall tunes
    * with (bands, bandBits): more bands = higher recall & more candidates
    * (AnnRecallSpec pins the floor); more bits = sharper buckets. */
  def lshAnnTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, bands: Int, bandBits: Int,
                 dim: Int): DataFrame = {
    val total = bands * bandBits
    val mask = (1L << bandBits) - 1
    def bandKeys(key: Column): Column =
      array((0 until bands).map(b =>
        shiftright(key, b * bandBits).bitwiseAND(lit(mask))): _*)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      norm(col(vecCol)).as("_cn"),
      posexplode(bandKeys(hyperplaneKey(col(vecCol), total, dim)))
        .as(Seq("_band", "_bkey")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
        norm(col(vecCol)).as("_qn"),
        posexplode(bandKeys(hyperplaneKey(col(vecCol), total, dim)))
          .as(Seq("_band", "_bkey")))
      .select(col("query_id"), col("_qv"), col("_qn"), col("_band"),
        explode(hyperplaneProbeKeys(col("_bkey"), bandBits)).as("_bkey"))
    val scored = c.join(broadcast(q), Seq("_band", "_bkey"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn"))).as("_cos"))
      .distinct()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("_cos"), 6).desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("_cos"), 6).cast("decimal(10,6)").as("cos_sim"))
  }

  /** IVF (inverted-file) ANN — the other classic scale path next to
    * [[lshAnnTopK]]. A coarse quantizer partitions the corpus into cells;
    * each query probes only the `nprobe` nearest cells.
    *
    * Centroids here are a deterministic corpus subset (`id % centroidMod
    * == 0`) rather than k-means output: the cell GEOMETRY is what the
    * operator exercises, and a deterministic quantizer is what makes the
    * result exactly reproducible by the DuckDB oracle (k-means would make
    * the gate a fixture comparison, not an algorithm check). Swapping in
    * trained centroids is a drop-in (`centroids` is just a DataFrame).
    *
    * Scale shape: centroids are broadcast twice (assignment + probe — both
    * map-side, no shuffle of the corpus); the candidate stage shuffles on
    * the cell id only, so the corpus streams once and the per-cell
    * fan-in is |cell|·nprobe, not |corpus|. Recall < 1 by construction
    * (a true neighbor can live in an unprobed cell) — raise `nprobe` to
    * trade cost for recall.
    */
  def ivfAnnTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                 vecCol: String, k: Int, centroidMod: Int,
                 nprobe: Int): DataFrame = {
    val cent = corpus.filter(col(idCol) % centroidMod === 0)
      .select(col(idCol).as("_cid"), col(vecCol).as("_cvec"),
        norm(col(vecCol)).as("_cnrm"))
    // nearest-centroid rank: shared by assignment (rank 1) and probing
    // (rank ≤ nprobe). Deterministic ties: rounded cosine desc, cid asc.
    def cellRank(side: DataFrame, id: String, vec: String, nrm: String) = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col(id))
        .orderBy(round(col("_ccos"), 6).desc, col("_cid").asc)
      side.crossJoin(broadcast(cent))
        .withColumn("_ccos",
          dot(col(vec), col("_cvec")) / (col(nrm) * col("_cnrm")))
        .withColumn("_crk", row_number().over(w))
    }
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("_cv"),
      norm(col(vecCol)).as("_cn"))
    val cells = cellRank(c, "neighbor_id", "_cv", "_cn")
      .filter(col("_crk") === 1)
      .select(col("neighbor_id"), col("_cv"), col("_cn"),
        col("_cid").as("_cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("_qv"),
      norm(col(vecCol)).as("_qn"))
    val probes = cellRank(q, "query_id", "_qv", "_qn")
      .filter(col("_crk") <= nprobe)
      .select(col("query_id"), col("_qv"), col("_qn"),
        col("_cid").as("_cell"))
    val scored = cells.join(broadcast(probes), Seq("_cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        (dot(col("_qv"), col("_cv")) / (col("_qn") * col("_cn"))).as("_cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id"))
      .orderBy(round(col("_cos"), 6).desc, col("neighbor_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("neighbor_id"),
        round(col("_cos"), 6).cast("decimal(10,6)").as("cos_sim"))
  }

  /** Multi-probe key set for a hyperplane bucket: the bucket itself plus
    * its `planes` Hamming-1 neighbors (one sign bit flipped). Probing these
    * lifts recall — a near-neighbor pair disagrees on few sign bits, so
    * allowing one flipped bit catches the pairs single-probe loses — while
    * keeping the candidate stage an equi-join (explode ×(planes+1) on the
    * probe side, exact key on the corpus side). A pair at Hamming distance
    * 1 matches through exactly one probe key, distance 0 through exactly
    * the identity probe — no duplicate candidates by construction. */
  def hyperplaneProbeKeys(bkt: Column, planes: Int): Column =
    array((bkt +: (0 until planes).map(p => bkt.bitwiseXOR(lit(1L << p)))): _*)

  /** DuckDB list literal matching [[hyperplaneProbeKeys]]. */
  def hyperplaneProbeKeysDuck(bkt: String, planes: Int): String =
    (s"$bkt" +: (0 until planes).map(p => s"xor($bkt, ${1L << p})"))
      .mkString("[", ", ", "]")

  /** The ±1 hyperplane weight for (plane, dim) — plan-time constant shared
    * by the Spark expression and the generated oracle SQL. */
  def hyperplaneWeight(p: Int, d: Int): Double = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(s"plane|$p|$d".getBytes("UTF-8"))
    if ((h(0) & 1) == 1) 1.0 else -1.0
  }

  /** DuckDB SQL computing the same bucket key as [[hyperplaneKey]]
    * (identical weights, identical left-to-right summation → identical
    * sign bits). */
  def hyperplaneKeyDuck(vec: String, planes: Int, dim: Int): String = {
    val bits = (0 until planes).map { p =>
      val proj = (0 until dim).map(d =>
        s"${hyperplaneWeight(p, d)} * CAST($vec[${d + 1}] AS DOUBLE)")
        .mkString("(", " + ", ")")
      s"(CASE WHEN $proj > 0 THEN ${1L << p} ELSE 0 END)"
    }
    s"CAST(${bits.mkString(" + ")} AS BIGINT)"
  }

  /** DuckDB SQL for the same dot product as an explicit term sum
    * (left-to-right, matching `aggregate`'s fold order). 1-based lists. */
  def dotDuck(a: String, b: String, dim: Int): String =
    (1 to dim).map(i =>
      s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString("(", " + ", ")")

  def cosineDuck(a: String, b: String, dim: Int): String =
    s"(${dotDuck(a, b, dim)} / (sqrt(${dotDuck(a, a, dim)}) * sqrt(${dotDuck(b, b, dim)})))"
}
