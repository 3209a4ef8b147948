package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.SimilarityOps

/** Embedding-compression and clustering operators (extension surface):
  * int8 scalar quantization (the storage/bandwidth path for 100 TB vector
  * corpora) and Lloyd's k-means (the IVF coarse-quantizer trainer —
  * completes the building block [[TrainingData]]'s `x_embed_centroids`
  * computes one step of).
  *
  * Determinism rules (what makes both exactly oracle-able):
  *   - cross-row float sums only as quantized integer sums (micro-units);
  *   - per-row vector math in fixed left-to-right index order (identical
  *     IEEE doubles in both engines);
  *   - every argmin/argmax on round(·,6) with an id tie-break.
  */
object Embeddings {

  val QuantBits = 8 // int8 scalar quantization
  val QuantLevels = (1 << QuantBits) - 1 // 255
  val KmeansK = 8 // k-means: clusters (init = first K vectors by id)
  val Dim = TrainingData.EmbeddingDim

  private[queries] def emb(s: SparkSession, dir: String): DataFrame =
    Tables.read(s, dir, "embeddings")

  /** Per-(cluster, dim) exact integer sums → per-cluster centroid arrays
    * (dims re-assembled in order via sorted collect_list — the one
    * deterministic way to build an array column from grouped rows).
    * `assigned` must have (cid, embedding). */
  private[queries] def centroidsOf(assigned: DataFrame): DataFrame =
    assigned
      .select(col("cid"), posexplode(col("embedding")).as(Seq("_pos", "_v")))
      .groupBy(col("cid"), col("_pos"))
      .agg(sum(round(col("_v").cast("double") * 1000000d, 0).cast("bigint"))
        .as("_sq"), count(lit(1)).as("_n"))
      .select(col("cid"), col("_pos"),
        ((col("_sq").cast("double") / col("_n")) / 1000000d).as("_cd"))
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("_pos"), col("_cd"))))
        .as("_arr"))
      .select(col("cid"),
        transform(col("_arr"), x => x.getField("_cd")).as("cvec"))

  /** Argmax-cosine assignment of each corpus vector to a (broadcast)
    * centroid set. Both sides' vector math is left-to-right index order;
    * ties broken by rounded score then centroid id — the IVF pattern. */
  private[queries] def assign(e: DataFrame, cents: DataFrame): DataFrame = {
    val dotc = SimilarityOps.dotHof(col("embedding"), col("cvec"))
    val cnorm = sqrt(SimilarityOps.dotHof(col("cvec"), col("cvec")))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(round(col("_cos"), 6).desc, col("cid").asc)
    e.crossJoin(broadcast(cents))
      .withColumn("_cos",
        dotc / (SimilarityOps.norm(col("embedding")) * cnorm))
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .select(col("vec_id"), col("embedding"), col("cid"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Int8 scalar quantization with exact reconstruction-error accounting:
    // per-dim global [min, max] (order-independent aggregates), linear
    // quantization to 255 levels, per-label error stats as quantized
    // integer sums. Scale shape: one posexplode scan → per-dim agg (64
    // rows, broadcast back) → one per-label agg; the corpus streams twice,
    // shuffles only on (dim) and (label) — both partial-aggregated.
    "x_embed_quantize_int8" -> ((s, dir) => {
      val x = emb(s, dir)
        .select(col("vec_id"), col("label"),
          posexplode(col("embedding")).as(Seq("_pos", "_vf")))
        .select(col("vec_id"), col("label"), (col("_pos") + 1).as("dim"),
          col("_vf").cast("double").as("v"))
      val mm = x.groupBy(col("dim"))
        .agg(min(col("v")).as("mn"), max(col("v")).as("mx"))
      val scale = (col("mx") - col("mn")) / QuantLevels
      val q = when(col("mx") === col("mn"), lit(0.0))
        .otherwise(least(round((col("v") - col("mn")) / scale, 0),
          lit(QuantLevels.toDouble)))
      val err = abs(col("v") - (col("mn") + q * scale))
      x.join(broadcast(mm), "dim")
        .select(col("label"),
          round(err * 1000000000d, 0).cast("bigint").as("_eq"))
        .groupBy(col("label"))
        .agg(count(lit(1)).as("n_components"),
          sum(col("_eq")).cast("long").as("sum_abs_err_nano"),
          max(col("_eq")).cast("long").as("max_abs_err_nano"))
    }),

    // Lloyd's k-means, two exact iterations: deterministic init (first K
    // vectors by id), argmax-cosine assignment, quantized-integer-mean
    // centroid update, re-assignment. Every step is reproducible
    // arithmetic, so the oracle replays the algorithm — not a fixture.
    // Scale shape per iteration: centroids broadcast (assignment is
    // map-side over the streaming corpus; K·d doubles), update is one
    // partial-agg'd shuffle on (cid, dim). This is how IVF coarse
    // quantizers are trained at 100 TB; more iterations = same plan looped.
    "x_kmeans_embed" -> ((s, dir) => {
      val e = emb(s, dir).select(col("vec_id"), col("embedding"))
      val c0 = e.filter(col("vec_id") < KmeansK)
        .select(col("vec_id").as("cid"),
          transform(col("embedding"), v => v.cast("double")).as("cvec"))
      val a1 = assign(e, c0)
      val c1 = centroidsOf(a1.select(col("cid"), col("embedding")))
      val a2 = assign(e, c1)
      a2.groupBy(col("cid").as("cluster_id"))
        .agg(count(lit(1)).as("n_vecs"),
          sum(col("vec_id")).cast("long").as("sum_vec_id"))
    })
  )

  // -------------------------------------------------- oracle generation

  /** Assignment CTE body: argmax rounded cosine, cid tie-break — over a
    * centroid relation `cent(cid, cv)` whose vectors are DOUBLE lists. */
  private def assignSql(cent: String): String = {
    val dotQC = (1 to Dim)
      .map(i => s"CAST(e.embedding[$i] AS DOUBLE) * $cent.cv[$i]")
      .mkString("(", " + ", ")")
    val normQ = s"sqrt(${SimilarityOps.dotDuck("e.embedding", "e.embedding", Dim)})"
    val normC = (1 to Dim).map(i => s"$cent.cv[$i] * $cent.cv[$i]")
      .mkString("sqrt((", " + ", "))")
    s"""SELECT vec_id, cid FROM (
       |  SELECT e.vec_id, $cent.cid,
       |    row_number() OVER (PARTITION BY e.vec_id
       |      ORDER BY round($dotQC / ($normQ * $normC), 6) DESC,
       |               $cent.cid ASC) AS rn
       |  FROM embeddings e CROSS JOIN $cent) WHERE rn = 1""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "x_embed_quantize_int8" ->
      s"""WITH x AS (SELECT vec_id, label, CAST(i AS INT) AS dim,
         |    CAST(embedding[i] AS DOUBLE) AS v
         |  FROM (SELECT vec_id, label, embedding,
         |          unnest(range(1, len(embedding) + 1)) AS i
         |        FROM embeddings)),
         |mm AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM x GROUP BY dim),
         |err AS (SELECT label,
         |    CAST(round(abs(v - (mn +
         |      (CASE WHEN mx = mn THEN 0.0
         |            ELSE least(round((v - mn) / ((mx - mn) / $QuantLevels), 0),
         |                       ${QuantLevels.toDouble}) END)
         |      * ((mx - mn) / $QuantLevels))) * 1000000000, 0) AS BIGINT)
         |      AS eq
         |  FROM x JOIN mm USING (dim))
         |SELECT label, count(*) AS n_components,
         |  CAST(sum(eq) AS BIGINT) AS sum_abs_err_nano,
         |  CAST(max(eq) AS BIGINT) AS max_abs_err_nano
         |FROM err GROUP BY label""".stripMargin,

    "x_kmeans_embed" ->
      s"""WITH c0 AS (SELECT vec_id AS cid,
         |    list_transform(embedding, v -> CAST(v AS DOUBLE)) AS cv
         |  FROM embeddings WHERE vec_id < $KmeansK),
         |a1 AS (${assignSql("c0")}),
         |x1 AS (SELECT a1.cid, CAST(i AS INT) AS dim,
         |    CAST(embedding[i] AS DOUBLE) AS v
         |  FROM (SELECT vec_id, embedding,
         |          unnest(range(1, len(embedding) + 1)) AS i
         |        FROM embeddings) e
         |  JOIN a1 USING (vec_id)),
         |s1 AS (SELECT cid, dim,
         |    sum(CAST(round(v * 1000000, 0) AS BIGINT)) AS sq,
         |    count(*) AS n
         |  FROM x1 GROUP BY cid, dim),
         |c1 AS (SELECT cid,
         |    list((CAST(sq AS DOUBLE) / n) / 1000000.0 ORDER BY dim) AS cv
         |  FROM s1 GROUP BY cid),
         |a2 AS (${assignSql("c1")})
         |SELECT cid AS cluster_id, count(*) AS n_vecs,
         |  CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
         |FROM a2 GROUP BY cid""".stripMargin)
}
