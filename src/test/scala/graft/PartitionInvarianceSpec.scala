package graft

import org.scalatest.funsuite.AnyFunSuite

/** Partition-count invariance — the distributed-determinism property the
  * whole oracle methodology rests on: every gate's result must be
  * identical under ANY shuffle partitioning, or the same query would
  * hash differently on a 1000-executor cluster than on local[32]. A
  * representative gate per determinism technique is re-run with
  * shuffle.partitions=3 (vs the session default 32) and compared
  * row-for-row: decimal sums (q1), window + RANGE frames, the live-view
  * dedup, LSH banding, the distributed prefix sum (vocab/shard), the
  * integer PageRank, star-CC clustering, degree-oriented triangles, the
  * prefix-filtered similarity join, OLS moments, and the substring-dedup
  * apply's per-doc reassembly. */
class PartitionInvarianceSpec extends AnyFunSuite with GateCacheHygiene {
  lazy val spark = TestSpark.spark

  private val gates = Seq(
    "q1_pricing_summary", "window_range_frame", "w1_live_view",
    "x_dedup_minhash_lsh", "x_vocab_coverage", "x_shard_assign",
    "x_pagerank", "x_triangle_count", "x_setsim_join_exact",
    "x_linreg_price", "x_substring_dedup_apply", "x_dedup_cluster_apply",
    // r9 third wave: frame-ordered collect_list + integer weights (ewma),
    // session merging, sorted-array JSON → VARIANT roundtrip, the pruned
    // join + explode change feed, and the two-anchor interpolation windows
    "x_ewma_smooth", "x_session_windows_batch", "x_variant_shred",
    "x_merge_cdf", "x_interpolate_linear", "x_twap",
    // r9 sixth-eighth waves: the sign collapse's max_by-over-struct under
    // shuffle, the three min-monoid relaxations, the cumulative-weight
    // quantiles, the prefix-window sequence count, the span-cutoff tier
    // rollup, the HLL register-max state merge, and the key-hash holdout
    "x_collapsing_final", "x_label_propagation", "x_bfs_khop",
    "x_sssp_weighted", "x_weighted_quantiles", "x_sequence_count",
    "x_ttl_rollup", "x_agg_state_merge", "x_entity_sample", "x_delta_sum",
    // r10 wave: keep-first segment ownership + per-doc ordered reassembly
    // under shuffle, and the positional postings intersection (x_kcore's
    // peel is exercised at sf0.01-scale by its own spec — its 4-core is
    // empty at sf0.001, and this matrix requires non-empty results)
    "x_line_dedup_apply", "x_phrase_search", "x_join_ivm",
    "x_spatial_grid_join", "x_autocorr", "o16_full_resync",
    "t25_stream_scd2", "x_top_paths", "x_gdpr_erasure",
    "x_event_transitions", "t26_sink_retry", "o17_multidb",
    "o18_filtered_replication", "x_redact_apply", "x_dedup_keep_best",
    "x_mmr_rerank", "t27_multitable_cdc",
    // r11 wave: the staged-partsupp joins (composite-key shuffle + min
    // decorrelation + decimal profit sums), the derived-column Q12, the
    // dual-mode orphan ledger, and the 7-stage pipeline ledger
    // (q11_important_stock is exercised at sf0.01 by its oracle — its
    // 2×-average cut is empty at sf0.001 and this matrix requires
    // non-empty results)
    "q9_product_profit", "q2_min_cost_supplier", "q20_excess_suppliers",
    "q12_shipmode_priority", "t28_pk_update_orphan", "x_pipeline_e2e",
    // r12 wave: the binlog decode's per-file change ordinal (seq built
    // inside one task per file, so shuffle layout must not affect it)
    "t29_binlog_wire_cdc")

  private def run(name: String): Seq[String] = {
    val rows = SparkEntry.queries(name)(spark, TestSpark.Sf0001)
      .collect().map(_.toString).sorted.toSeq
    GateCache.releaseAll()
    spark.catalog.clearCache()
    rows
  }

  test("gate results are identical under shuffle.partitions = 3 vs the default") {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    gates.foreach { g =>
      val wide = run(g)
      assert(wide.nonEmpty, s"$g returned no rows")
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        val narrow = run(g)
        assert(narrow == wide,
          s"$g differs between partition counts: " +
            s"${narrow.diff(wide).take(3)} vs ${wide.diff(narrow).take(3)}")
      } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    }
  }
}
