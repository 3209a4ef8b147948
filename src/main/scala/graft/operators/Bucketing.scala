package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Bucketed (co-located) table layout — the shuffle-avoidance layout
  * decision for repeated big-fact joins at 100 TB.
  *
  * The reference's scale-out guidance is to manually shard tables across
  * replicator instances (`README.md:473-476`); ClickHouse itself co-locates
  * by the MergeTree ORDER BY / sharding key. The Spark-native equivalent is
  * bucketing: both join sides hash-partitioned into the same number of
  * buckets on the join key AT WRITE TIME, so every subsequent equi-join on
  * that key reads matching buckets directly — no Exchange on either side,
  * for every query that ever joins on the key. One shuffle paid once at
  * layout time instead of per query; at 100 TB the join exchange IS the
  * dominant cost, which is why this is a first-class operator and not a
  * tuning flag. BucketingSpec asserts the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, per-bucket-sorted managed parquet table.
    * Overwrites both the catalog entry and any leftover location from a
    * previous session (the in-memory catalog forgets tables on restart but
    * the warehouse directory survives — a stale dir would otherwise make
    * the CTAS fail or read mixed generations). */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    writeBucketedMulti(df, table, Seq(key), buckets)

  /** Composite-key form: bucket AND per-bucket sort on the full key list
    * (a multi-column join is only exchange-free when the bucket spec is
    * exactly the join key set — a prefix is not enough). */
  def writeBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
                         buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketed write needs at least one key column")
    val spark = df.sparkSession
    graft.model.Identifiers.validate(table, "table")
    if (!spark.catalog.tableExists(table)) {
      val wh = new Path(spark.conf.get("spark.sql.warehouse.dir"),
        table.toLowerCase)
      val fs = wh.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(wh)) fs.delete(wh, true)
    }
    // Cluster rows into their bucket BEFORE the write (optimization r15):
    // repartition's hash (pmod(murmur3, n)) IS the bucket-id function, so
    // each task owns exactly one bucket and writes ONE sorted file.
    // Without it every input task sprays a file into every bucket it
    // touches — up to tasks×buckets files per generation (slow commit,
    // small-file reads, and the per-bucket sorted-scan claim lost on the
    // very first write). One exchange of the table's bytes, paid once at
    // layout time — the same trade the layout itself makes.
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("overwrite").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** Append a new generation into an EXISTING bucketed table, preserving
    * the layout: rows hash into the same bucket files' directory, so every
    * bucket now holds one file per generation and the join-side
    * partitioning guarantee is unchanged (Spark drops only the per-bucket
    * SORTED-scan claim when a bucket has >1 file — an extra Sort node,
    * never an Exchange). This is the 100 TB maintenance path: ingest
    * appends generations, the layout investment keeps paying, and
    * compaction (operators/Compaction) folds generations back to one file
    * per bucket when the sort claim is worth reclaiming. Spark enforces
    * that the bucket spec matches the existing table's. */
  def appendBucketedMulti(df: DataFrame, table: String, keys: Seq[String],
                          buckets: Int): Unit = {
    require(keys.nonEmpty, "bucketed append needs at least one key column")
    graft.model.Identifiers.validate(table, "table")
    // append REQUIRES the catalog entry: after a session restart the
    // in-memory catalog forgot the table but its warehouse dir survived,
    // and a create-on-append over those files could not verify the
    // bucket spec matches the previous generation's — recreate with
    // writeBucketedMulti (which clears the stale dir) instead
    require(df.sparkSession.catalog.tableExists(table),
      s"bucketed append target `$table` is not in the catalog — " +
        "write the initial generation with writeBucketedMulti first")
    requireBucketSpec(df.sparkSession, table, keys, buckets, "append")
    // same pre-clustering as writeBucketedMulti: one file per bucket per
    // GENERATION (the exchange moves only this generation's bytes)
    df.repartition(buckets, keys.map(col): _*)
      .write.mode("append").format("parquet")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .saveAsTable(table)
  }

  /** The caller's (keys, buckets) must equal the table's registered
    * bucket spec — a mismatched append or compaction would silently
    * rewrite the table into a different layout and every co-bucketed
    * join relying on the old spec would regain its Exchange. */
  private def requireBucketSpec(spark: SparkSession, table: String,
      keys: Seq[String], buckets: Int, op: String): Unit = {
    val spec = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .bucketSpec
    require(spec.exists(s => s.numBuckets == buckets &&
        s.bucketColumnNames == keys),
      s"bucketed $op on `$table` with (${keys.mkString(",")}, $buckets) " +
        s"does not match the table's bucket spec $spec")
  }

  /** Fold a bucketed table's accumulated generations back to ONE file per
    * bucket, restoring the per-bucket sorted-scan claim: Spark only
    * advertises a bucketed table's sort order when every bucket holds at
    * most one file, so each appended generation costs a Sort node at
    * every downstream merge join until compaction. The rewrite
    * repartitions on exactly the bucket keys with the bucket count —
    * Spark's repartition hash (pmod(murmur3, n)) IS the bucket-id
    * function, so each task owns one whole bucket and writes one sorted
    * file. In place via a RENAME SWAP (table→_compact_old, tmp→table,
    * drop _compact_old): unlike drop-then-rename, a crash at any point
    * leaves the data reachable under either the live or the _compact_old
    * name, and re-invoking recovers — the entry check restores a
    * stranded _compact_old before starting ([[Compaction.compact]]'s
    * crash-recovery protocol). Cost is one linear rewrite, amortized
    * over every join after it — the bucketed analog of [[Compaction]]. */
  def compactBucketed(spark: SparkSession, table: String, keys: Seq[String],
                      buckets: Int): Unit = {
    graft.model.Identifiers.validate(table, "table")
    val tmp = s"${table}_compact_tmp"
    val old = s"${table}_compact_old"
    // crash recovery: a previous compact that died between its two
    // renames left the data under _compact_old with no live table
    if (!spark.catalog.tableExists(table) && spark.catalog.tableExists(old))
      spark.sql(s"ALTER TABLE `$old` RENAME TO `$table`")
    require(spark.catalog.tableExists(table), s"no table `$table`")
    requireBucketSpec(spark, table, keys, buckets, "compaction")
    spark.sql(s"DROP TABLE IF EXISTS `$old`") // completed-swap debris
    // Read by PATH, not by table: the catalog read advertises the bucket
    // partitioning, which lets the planner drop the repartition as
    // redundant — and then DisableUnnecessaryBucketedScan reverts the
    // scan to plain splits (nothing downstream "requires" the
    // distribution in a V1 write), leaving the write unpartitioned and
    // every task spraying files into every bucket. The path read carries
    // no bucket metadata, so the repartition genuinely shuffles into
    // exactly `buckets` tasks = one sorted file per bucket.
    val loc = spark.sessionState.catalog
      .getTableMetadata(org.apache.spark.sql.catalyst.TableIdentifier(table))
      .location.toString
    writeBucketedMulti(
      spark.read.parquet(loc).repartition(buckets, keys.map(col): _*),
      tmp, keys, buckets)
    spark.sql(s"ALTER TABLE `$table` RENAME TO `$old`")
    spark.sql(s"ALTER TABLE `$tmp` RENAME TO `$table`")
    spark.sql(s"DROP TABLE `$old`")
    // drop the cached pre-compaction file listing (the swap changed the
    // files under the same name); other sessions must refresh too
    spark.catalog.refreshTable(table)
  }

  /** Equi-join two bucketed tables on their bucket keys. With equal bucket
    * counts this plans with zero Exchange nodes: each task reads bucket i
    * of both sides. (If one side is still small enough to broadcast, AQE
    * will do that instead — also exchange-free.) */
  def bucketedJoin(spark: SparkSession, left: String, leftKey: String,
                   right: String, rightKey: String): DataFrame = {
    val l = spark.table(left)
    val r = spark.table(right)
    // frame-qualified keys: co-bucketed tables usually share the key
    // NAME, and a bare col(...) === col(...) would be AMBIGUOUS_REFERENCE
    l.join(r, l(leftKey) === r(rightKey))
  }
}
