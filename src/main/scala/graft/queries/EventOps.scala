package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-analytics operators over the `events` stream table: calendar
  * gap-filling with forward-fill (the time-series densification shape),
  * weekly cohort retention, and ordered funnel-stage analysis. All
  * deterministic (integer/decimal aggregates, exact date arithmetic) and
  * exactly DuckDB-oracled.
  */
object EventOps {

  val GapFillUsers = 50L // bound the densified output: user_id < 50
  val ClickWindowUs = 12L * 3600 * 1000000 // funnel: click ≤ 12h after view
  val BuyWindowUs = 2L * 86400 * 1000000 // funnel: purchase ≤ 2d after click
  val RetentionMinValue = 90.0 // retention: high-value purchases only
  val PathMaxSteps = 8 // path truncation: first k steps of each session
  val TopPathsK = 20 // paths reported (hoisted with the other knobs —
  // object vals initialize in declaration order; review find)
  // (unwindowed funnel stages and all-events retention are degenerate on
  // this corpus — every user does everything every week; the windows and
  // the value floor make the stages discriminative: 150 → 37 → 20 users
  // and a triangular cohort matrix at sf0.01)

  /** Per-user day densification shared by x_gap_fill and
    * x_interpolate_linear (review find: previously inlined twice):
    * (days, daily) = the exploded per-user calendar over each user's
    * event span, and the exact-decimal daily purchase totals. */
  private def densifiedDays(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    val ev = Tables.events(s, dir).filter(col("user_id") < GapFillUsers)
      .withColumn("day", to_date(timestamp_micros(col("ts_us"))))
    val span = ev.groupBy(col("user_id"))
      .agg(min(col("day")).as("_d0"), max(col("day")).as("_d1"))
    val days = span.select(col("user_id"),
      explode(sequence(col("_d0"), col("_d1"))).as("day"))
    val daily = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("day"))
      .agg(sum(col("value").cast("decimal(18,2)")).cast("decimal(38,2)")
        .as("_dv"))
    (days, daily)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Calendar gap-fill + forward-fill: each user's [first, last] event
    // date densified to one row per day (sequence + explode — generated
    // map-side, no join against a calendar table), daily purchase sums
    // attached, and days without purchases carrying the last known
    // value forward (last ignoreNulls over an ordered window). The
    // window partitions per user — parallel across users; row volume =
    // Σ per-user day spans, bounded here by the user_id < 50 slice.
    "x_gap_fill" -> ((s, dir) => {
      val (days, daily) = densifiedDays(s, dir)
      val w = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      days.join(daily, Seq("user_id", "day"), "left")
        .withColumn("filled",
          last(col("_dv"), ignoreNulls = true).over(w))
        .select(col("user_id"), col("day").cast("string").as("day"),
          coalesce(col("filled"), lit(0).cast("decimal(38,2)"))
            .as("purchase_value_ff"))
    }),

    // Linear interpolation between known points (the time-series
    // densification x_gap_fill forward-fills, upgraded to the two-sided
    // estimate an ML feature pipeline wants): per user-day, a missing
    // daily purchase total is interpolated between the nearest previous
    // and next purchase days; before the first / after the last anchor
    // the nearest known value extends (edge semantics made explicit in
    // the `kind` column). Two per-user ordered windows (prev/next anchor)
    // over the densified frame — same exchange, no self-join. The
    // interpolation arithmetic is a fixed double expression tree
    // (pv + (nv − pv) · (Δprev / Δspan)) mirrored verbatim in the oracle,
    // so both engines round identically at every step.
    "x_interpolate_linear" -> ((s, dir) => {
      val (days, daily0) = densifiedDays(s, dir)
      val daily = daily0.withColumn("_dv", col("_dv").cast("double"))
      val wPrev = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wNext = Window.partitionBy(col("user_id")).orderBy(col("day").asc)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val known = when(col("_dv").isNotNull, col("day"))
      val knownV = when(col("_dv").isNotNull, col("_dv"))
      days.join(daily, Seq("user_id", "day"), "left")
        .withColumn("_pd", last(known, ignoreNulls = true).over(wPrev))
        .withColumn("_pv", last(knownV, ignoreNulls = true).over(wPrev))
        .withColumn("_nd", first(known, ignoreNulls = true).over(wNext))
        .withColumn("_nv", first(knownV, ignoreNulls = true).over(wNext))
        .select(col("user_id"), col("day").cast("string").as("day"),
          when(col("_dv").isNotNull, lit("actual"))
            .when(col("_pd").isNull || col("_nd").isNull, lit("edge"))
            .otherwise(lit("interp")).as("kind"),
          when(col("_dv").isNotNull, col("_dv"))
            .when(col("_pd").isNull && col("_nd").isNull, lit(0.0))
            .when(col("_pd").isNull, col("_nv"))
            .when(col("_nd").isNull, col("_pv"))
            .otherwise(col("_pv") + (col("_nv") - col("_pv")) *
              (datediff(col("day"), col("_pd")).cast("double") /
                datediff(col("_nd"), col("_pd")).cast("double")))
            .as("value_interp"))
    }),

    // Weekly cohort retention: users grouped by the week of their FIRST
    // event; each later active week counts them at its integer week
    // offset. Two partial-agg'd shuffles (first-event per user, then
    // cohort cell counts) — the classic retention-matrix shape.
    "x_retention_cohorts" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
        .filter(col("event_type") === "purchase" &&
          col("value") > RetentionMinValue)
        .select(col("user_id"),
          date_trunc("week", timestamp_micros(col("ts_us"))).cast("date")
            .as("wk"))
      val first = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort"))
      ev.join(first, "user_id")
        .select(col("user_id"), col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("int")
            .as("week_offset"))
        .distinct()
        .groupBy(col("cohort").cast("string").as("cohort_week"),
          col("week_offset"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // OHLC downsampling: 6-hour bars per event type — a single plain
    // aggregation (open/close via min_by/max_by on a deterministic
    // scalar key), so the identical expression runs under readStream +
    // watermark (see [[graft.streaming.EventAnalytics.ohlcBars]] and
    // OhlcStreamSpec, which pins batch ≡ stream).
    "x_ohlc_bars" -> ((s, dir) =>
      graft.streaming.EventAnalytics.ohlcBars(
        Tables.events(s, dir)
          .withColumn("ts_ev", timestamp_micros(col("ts_us"))),
        tsCol = "ts_ev", barLen = "6 hours")),

    // Ordered funnel: view → click-after-view → purchase-after-click per
    // user (each stage's timestamp must be at or after the previous
    // stage's). Conditional-min aggregation in ONE pass over the events
    // scan — min(ts) per type per user, then the ordering constraints
    // applied on the tiny per-user frame. No self-joins of the event
    // stream.
    "x_funnel_stages" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      // cached: the three stage counts are three separate actions and
      // each re-executes its inputs otherwise (review find; the dead
      // t_click_any/t_buy_any aggregates are gone — no consumer)
      val perUser = graft.GateCache.cache(ev.groupBy(col("user_id")).agg(
        min(when(col("event_type") === "view", col("ts_us"))).as("t_view")))
      // stage 2/3 re-derived with the ordering constraint: min event AT
      // OR AFTER the previous stage — needs the event list again, but
      // only for users who passed the previous stage (semi-join-pruned).
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts_us").as("_tc"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_us").as("_tb"))
      val afterView = graft.GateCache.cache(
        perUser.filter(col("t_view").isNotNull)
          .join(clicks, "user_id")
          .filter(col("_tc") >= col("t_view") &&
            col("_tc") <= col("t_view") + ClickWindowUs)
          .groupBy(col("user_id"), col("t_view"))
          .agg(min(col("_tc")).as("t_click")))
      val afterClick = afterView.join(buys, "user_id")
        .filter(col("_tb") >= col("t_click") &&
          col("_tb") <= col("t_click") + BuyWindowUs)
        .groupBy(col("user_id"))
        .agg(min(col("_tb")).as("t_buy"))
      import s.implicits._
      Seq(
        ("view", perUser.filter(col("t_view").isNotNull).count()),
        ("click_after_view", afterView.count()),
        ("purchase_after_click", afterClick.count()))
        .toDF("stage", "n_users")
    }),

    // Rolling MEDIAN smoothing — exact order statistics inside a moving
    // ROWS frame (the robust alternative to window_running_sum's moving
    // mean, and the windowed form of x_mad_outliers' global median):
    // per user, the median of the trailing five event values. Odd
    // frames select an exact element; the short head frames average two
    // doubles — identical IEEE result in both engines either way. One
    // hash exchange on user_id, per-partition sort only.
    "x_rolling_median" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
        .rowsBetween(-4, 0)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          percentile(col("value"), lit(0.5)).over(w).as("roll_med"))
    }),

    // Exponentially-weighted moving average — the recency-weighted
    // smoother next to x_rolling_median's robust one. The α=1/2
    // recurrence over a trailing-8 frame is computed EXACTLY: integer
    // cents × power-of-two weights (newest 2^(m−1), halving backwards)
    // accumulated in a higher-order `aggregate` over the frame's
    // collect_list, one final double division — so the sum is
    // order-independent integer arithmetic and both engines round once,
    // identically. One hash exchange on user_id; the per-row list is ≤ 8
    // elements, constant memory.
    "x_ewma_smooth" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
        .rowsBetween(-7, 0)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"), col("ts_us"),
          round(col("value") * 100).cast("long").as("_cents"))
        .withColumn("_lst", collect_list(col("_cents")).over(w))
        .select(col("user_id"), col("event_id"),
          aggregate(col("_lst"),
            struct(lit(0L).as("n"), lit(1L).as("w")),
            (acc, x) => struct((acc("n") + x * acc("w")).as("n"),
              (acc("w") * 2).as("w")),
            acc => acc("n").cast("double") /
              (acc("w") - 1).cast("double")).as("ewma"))
    }),

    // Time-WEIGHTED average (TWAP) — the correct mean for irregularly
    // sampled series, where x_ewma_smooth weights by recency and a plain
    // avg() would weight by sampling density: each value is held until
    // the next observation, so it contributes proportionally to its
    // holding duration. All integer arithmetic — cents × µs-duration
    // sums (≤10^17, no overflow), one double division per user at the
    // end. One lead() window and one aggregate on the same user_id
    // exchange; single-event users have no holding interval and are
    // excluded by construction (lead is null).
    "x_twap" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          round(col("value") * 100).cast("long").as("_cents"))
        .withColumn("_dur", lead(col("ts_us"), 1).over(w) - col("ts_us"))
        .filter(col("_dur").isNotNull)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"),
          // Σ dur telescopes to exactly t_last − t_first — the span
          (sum(col("_cents") * col("_dur")).cast("double") /
            sum(col("_dur")).cast("double")).as("twap_cents"))
    }),

    // Sketch SET OPERATIONS (extends x_hll_distinct_users from single-set
    // cardinality to pairwise overlap): audience overlap between every
    // pair of event types via HLL inclusion-exclusion
    // (|A∩B| ≈ hll(A) + hll(B) − hll(A∪B)). HLL registers merge under
    // union but not intersection — inclusion-exclusion is the standard
    // mergeable-sketch answer, and the whole plan is partial-agg'd
    // equi-joins: one distinct shuffle of (type, user), tiny per-type
    // aggregates, pair membership via two broadcast equi-joins (NOT an
    // OR-condition nested-loop join). Adjudication follows the hardened
    // sketch-gate pattern: exact overlap/union (DuckDB-oracled) plus a
    // within-bound boolean — |est − exact| ≤ 15% of the union, ≫ the
    // ~2%·3-estimate plausible deviation, so deterministically true on
    // real data while still binding the sketch to reality in the hash.
    "x_hll_audience_overlap" -> ((s, dir) => {
      val du = graft.GateCache.cache(
        Tables.read(s, dir, "events")
          .select(col("event_type"), col("user_id")).distinct())
      val perType = du.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("_hll"))
      val pairs = perType
        .select(col("event_type").as("type_a"), col("_hll").as("_hll_a"))
        .join(perType.select(col("event_type").as("type_b"),
          col("_hll").as("_hll_b")), col("type_a") < col("type_b"))
      val members = pairs.select("type_a", "type_b")
        .join(du, col("event_type") === col("type_a"))
        .select(col("type_a"), col("type_b"), col("user_id"))
        .unionByName(pairs.select("type_a", "type_b")
          .join(du, col("event_type") === col("type_b"))
          .select(col("type_a"), col("type_b"), col("user_id")))
      members.groupBy(col("type_a"), col("type_b"))
        .agg(
          (count(lit(1)) - countDistinct(col("user_id"))).as("exact_overlap"),
          countDistinct(col("user_id")).as("exact_union"),
          approx_count_distinct(col("user_id"), rsd = 0.02).as("_hll_u"))
        .join(broadcast(pairs), Seq("type_a", "type_b"))
        .select(col("type_a"), col("type_b"),
          col("exact_overlap"), col("exact_union"),
          (abs((col("_hll_a") + col("_hll_b") - col("_hll_u"))
            .cast("double") - col("exact_overlap").cast("double")) <=
            col("exact_union").cast("double") * 0.15 + lit(1.0))
            .as("hll_overlap_in_bound"))
    }),

    // Lag-k autocorrelation of the daily event-count series — the
    // seasonality probe a monitoring stack runs next to deltaSum/TTL:
    // corr(y_t, y_{t−k}) for k = 1 (day-over-day persistence) and k = 7
    // (weekly cycle). The series is an integer aggregate (daily counts),
    // the lag pairing is an exact self-join on day+k (robust to calendar
    // gaps, unlike a positional lag), and the sufficient statistics are
    // exact integer sums — the x_corr_qty_price protocol, so the only
    // floating-point work is the final per-lag scalar formula, identical
    // expression tree both engines (IEEE division and sqrt are correctly
    // rounded). One events scan + one O(days) self-join; output O(lags).
    "x_autocorr" -> ((s, dir) => {
      val daily = graft.GateCache.cache(Tables.events(s, dir)
        .groupBy(datediff(to_date(timestamp_micros(col("ts_us"))),
          to_date(lit("1970-01-01"))).as("d"))
        .agg(count(lit(1)).as("y")))
      def d(c: String): org.apache.spark.sql.Column = col(c).cast("double")
      Seq(1, 7).map { k =>
        val a = daily.select(col("d"), col("y").as("y0"))
        val b = daily.select((col("d") + k).as("d"), col("y").as("yk"))
        a.join(b, "d")
          .agg(count(lit(1)).as("n"),
            sum(col("y0")).as("sx"), sum(col("yk")).as("sy"),
            sum(col("y0") * col("yk")).as("sxy"),
            sum(col("y0") * col("y0")).as("sxx"),
            sum(col("yk") * col("yk")).as("syy"))
          .select(lit(k).as("lag"), col("n").as("n_pairs"),
            round(
              (d("n") * d("sxy") - d("sx") * d("sy")) /
                (sqrt(d("n") * d("sxx") - d("sx") * d("sx")) *
                  sqrt(d("n") * d("syy") - d("sy") * d("sy"))), 6)
              .as("autocorr"))
      }.reduce(_ unionByName _)
    }),

    // ClickHouse deltaSum — counter-reset-aware monitoring aggregation:
    // per (user, event_type) series ordered by (ts, event_id), sum ONLY
    // the positive deltas of the value — a counter that resets (drops)
    // contributes its growth segments, never the negative reset jump.
    // Integer-micro quantization before the lag keeps every delta exact;
    // one per-series window exchange, output per event_type (n_series +
    // delta sum) — O(types) rows. Complements x_ttl_rollup as the other
    // half of the Graphite/monitoring rollup pair.
    "x_delta_sum" -> ((s, dir) => {
      val w = Window
        .partitionBy(col("user_id"), col("event_type"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts_us"),
          col("event_id"),
          round(col("value") * 1000000d, 0).cast("bigint").as("_vq"))
        .withColumn("_d", col("_vq") - lag(col("_vq"), 1).over(w))
        .groupBy(col("event_type"))
        .agg(countDistinct(col("user_id")).as("n_series"),
          sum(when(col("_d") > 0, col("_d")).otherwise(0L))
            .cast("long").as("delta_sum_micro"))
    }),

    // ClickHouse sequenceCount (non-overlapping pattern occurrences):
    // how many DISJOINT view→purchase chains each user's ordered stream
    // contains — the funnel gate counts first-occurrence chains, this
    // counts the maximal disjoint matching. Closed form (no iterative
    // scan): matched = n_purchases − max(0, max over inclusive prefixes
    // of (purchases − views)) — the prefix max is exactly the purchases
    // that arrive with no view available (the bracket-deficit law; the
    // naive "more views than purchases before" identity OVERCOUNTS when
    // unmatched purchases precede views, which the spec's greedy matcher
    // caught). One per-user window exchange feeds both prefix counts,
    // then a per-user aggregate; output is the pairs-per-user histogram —
    // O(distinct counts) rows at any scale. Total order (ts, event_id)
    // makes every prefix engine-exact.
    "x_sequence_count" -> ((s, dir) => {
      val wi = Window
        .partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"), col("event_type"))
        .filter(col("event_type").isin("view", "purchase"))
        .withColumn("_d",
          count(when(col("event_type") === "purchase", 1)).over(wi) -
            count(when(col("event_type") === "view", 1)).over(wi))
        .groupBy(col("user_id"))
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("_np"),
          greatest(max(col("_d")), lit(0L)).as("_maxdef"))
        .select(col("user_id"), (col("_np") - col("_maxdef")).as("n_pairs"))
        .filter(col("n_pairs") > 0)
        .groupBy(col("n_pairs")).agg(count(lit(1)).as("n_users"))
    }),

    // ClickHouse `TTL … GROUP BY` — age-tiered downsampling (the
    // GraphiteMergeTree retention-policy shape): the newest third of the
    // event span keeps hourly resolution, the middle third rolls to
    // daily, the oldest to weekly. The tier is decided PER ROW (exactly
    // ClickHouse's TTL semantics — a bucket straddling a cutoff splits
    // across tiers), cutoffs derived from the data's own span in exact
    // Long arithmetic (Spark's truncating / and DuckDB's // agree on
    // positive operands). One scan + one partial-agg'd shuffle; output is
    // O(time buckets), independent of row count — the 100 TB point of
    // retention rollup. Bucket timestamps emitted as epoch micros
    // (driver-safe types; date_trunc is UTC-session-exact both engines,
    // weeks start Monday in both).
    "x_ttl_rollup" -> ((s, dir) => {
      val ev = Tables.events(s, dir).select(col("ts_us"),
        round(col("value") * 1000000d, 0).cast("bigint").as("_vq"))
      val b = ev.agg(min(col("ts_us")), max(col("ts_us"))).head()
      val (lo, hi) = (b.getLong(0), b.getLong(1))
      val (c1, c2) = (hi - (hi - lo) / 3, hi - 2 * ((hi - lo) / 3))
      val t = timestamp_micros(col("ts_us"))
      ev.select(
          when(col("ts_us") > c1, "hour")
            .when(col("ts_us") > c2, "day").otherwise("week").as("tier"),
          when(col("ts_us") > c1, unix_micros(date_trunc("hour", t)))
            .when(col("ts_us") > c2, unix_micros(date_trunc("day", t)))
            .otherwise(unix_micros(date_trunc("week", t))).as("bucket_us"),
          col("_vq"))
        .groupBy(col("tier"), col("bucket_us"))
        .agg(count(lit(1)).as("n_events"),
          sum(col("_vq")).cast("long").as("sum_value_micro"))
    }),

    // AggregatingMergeTree -State/-Merge (the third ClickHouse MergeTree
    // family next to Replacing = w1 and Collapsing = x_collapsing_final):
    // per-day PARTIAL aggregate states — a datasketches HLL binary from
    // hll_sketch_agg plus additive count/sum — are PERSISTED to parquet
    // (the -State half), then re-read and finalized WITHOUT touching raw
    // rows (the -Merge half: hll_union_agg → hll_sketch_estimate, sums
    // add). At 100 TB the raw scan happens once at state-build time;
    // every later rollup reads O(days) state rows. Adjudication is the
    // hardened-sketch pattern: every additive value exact-oracled, the
    // sketch estimate bound to exact distinct by a pinned boolean (±5%
    // ≫ the ~1.6% lgK=12 plausible deviation).
    "x_agg_state_merge" -> ((s, dir) => {
      val mvDir =
        graft.GateCache.tempDir("graft_aggstate").toString
      val ev = Tables.events(s, dir).select(
        to_date(timestamp_micros(col("ts_us"))).cast("string").as("day"),
        col("user_id"),
        round(col("value") * 1000000d, 0).cast("bigint").as("_vq"))
      ev.groupBy(col("day"))
        .agg(hll_sketch_agg(col("user_id")).as("_state"),
          count(lit(1)).as("_n"), sum(col("_vq")).as("_sv"))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(mvDir)
      val merged = s.read.parquet(mvDir).agg(
        count(lit(1)).as("n_days"),
        sum(col("_n")).cast("long").as("n_events"),
        sum(col("_sv")).cast("long").as("sum_value_micro"),
        hll_sketch_estimate(hll_union_agg(col("_state"))).as("_est"))
      val exact = Tables.events(s, dir)
        .agg(countDistinct(col("user_id")).as("exact_users"))
      merged.crossJoin(exact).select(
        col("n_days"), col("n_events"), col("sum_value_micro"),
        col("exact_users"),
        (abs(col("_est").cast("double") - col("exact_users").cast("double"))
          <= col("exact_users").cast("double") * 0.05 + lit(1.0))
          .as("est_in_bound"))
    }),

    // Session path analysis (top paths): each session's ordered
    // event-type sequence — the product-analytics query behind "what do
    // users do before buying". Sessionized by the 6 h inactivity gap
    // (same law as x_session_windows_batch, spelled as a lag/cumsum
    // window so the oracle mirrors it exactly); paths truncated to the
    // first PathMaxSteps steps — the bound that keeps per-session state
    // (and path-string cardinality) fixed regardless of session length,
    // the difference between O(sessions) and O(events) output at 100 TB.
    // One user-partitioned window exchange covers sessionize + step rank
    // (same partition key, one sort); the path build is a per-session
    // collect of ≤ PathMaxSteps structs; the top-k is a
    // TakeOrderedAndProject over O(distinct paths), total-ordered by
    // (count desc, path asc) so the cut is deterministic.
    "x_top_paths" -> ((s, dir) => {
      val wUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val sess = Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("_gap", col("ts_us") - lag(col("ts_us"), 1).over(wUser))
        .withColumn("_new",
          when(col("_gap").isNull
            || col("_gap") > SqlSurface.SessionGapUs, 1L).otherwise(0L))
        .withColumn("_sess", sum(col("_new")).over(wUser))
      val wSess = Window.partitionBy(col("user_id"), col("_sess"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val paths = sess
        .withColumn("_step", row_number().over(wSess))
        .filter(col("_step") <= PathMaxSteps)
        .groupBy(col("user_id"), col("_sess"))
        .agg(array_join(
          transform(
            array_sort(collect_list(struct(col("_step"),
              col("event_type")))),
            x => x.getField("event_type")), ">").as("path"))
      paths.groupBy(col("path")).agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path").asc)
        .limit(TopPathsK)
    }),

    // First-order Markov transition matrix over the event stream: for
    // each adjacent pair within a session (same 6 h gap law as
    // x_top_paths — a cross-session adjacency is not a behavioral
    // transition), count from_type → to_type and row-normalize into
    // transition probabilities. One user-keyed window exchange (lag only
    // — no self-join of the stream), one O(types²) aggregate, and the
    // row totals re-derived from the pair counts themselves (a
    // broadcast-able O(types) join) rather than a second pass over the
    // events. Integer counts exact; the probability is one terminal
    // double division under the x_autocorr round-6 protocol.
    "x_event_transitions" -> ((s, dir) => {
      val wUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts_us").asc, col("event_id").asc)
      val pairs = Tables.events(s, dir)
        .select(col("user_id"), col("ts_us"), col("event_id"),
          col("event_type"))
        .withColumn("_from", lag(col("event_type"), 1).over(wUser))
        .withColumn("_gap", col("ts_us") - lag(col("ts_us"), 1).over(wUser))
        .filter(col("_from").isNotNull
          && col("_gap") <= SqlSurface.SessionGapUs)
      val counts = pairs
        .groupBy(col("_from").as("from_type"),
          col("event_type").as("to_type"))
        .agg(count(lit(1)).as("n_transitions"))
      val totals = counts.groupBy(col("from_type"))
        .agg(sum(col("n_transitions")).cast("long").as("_tot"))
      counts.join(broadcast(totals), "from_type")
        .select(col("from_type"), col("to_type"), col("n_transitions"),
          round(col("n_transitions").cast("double") / col("_tot")
            .cast("double"), 6).as("p"))
    })
  )

  val oracle: Map[String, String] = Map(
    "x_event_transitions" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         |    event_type FROM events),
         |p AS (SELECT lag(event_type) OVER w AS from_type,
         |    event_type AS to_type,
         |    ts_us - lag(ts_us) OVER w AS gap
         |  FROM e WINDOW w AS (PARTITION BY user_id
         |    ORDER BY ts_us ASC, event_id ASC)),
         |c AS (SELECT from_type, to_type, count(*) AS n_transitions
         |  FROM p WHERE from_type IS NOT NULL
         |    AND gap <= ${SqlSurface.SessionGapUs}
         |  GROUP BY from_type, to_type),
         |t AS (SELECT from_type, CAST(sum(n_transitions) AS BIGINT) AS tot
         |  FROM c GROUP BY from_type)
         |SELECT c.from_type, c.to_type, c.n_transitions,
         |  round(CAST(c.n_transitions AS DOUBLE) / CAST(t.tot AS DOUBLE), 6)
         |    AS p
         |FROM c JOIN t ON c.from_type = t.from_type""".stripMargin,

    "x_top_paths" ->
      s"""WITH e AS (SELECT user_id, epoch_us(ts) AS ts_us, event_id,
         |    event_type FROM events),
         |s AS (SELECT *, CASE WHEN ts_us - lag(ts_us) OVER w
         |      IS NOT DISTINCT FROM NULL
         |      OR ts_us - lag(ts_us) OVER w > ${SqlSurface.SessionGapUs}
         |      THEN 1 ELSE 0 END AS is_new
         |  FROM e WINDOW w AS (PARTITION BY user_id
         |    ORDER BY ts_us ASC, event_id ASC)),
         |s2 AS (SELECT *, sum(is_new) OVER (PARTITION BY user_id
         |    ORDER BY ts_us ASC, event_id ASC) AS sess FROM s),
         |s3 AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess
         |    ORDER BY ts_us ASC, event_id ASC) AS step FROM s2),
         |p AS (SELECT user_id, sess,
         |    string_agg(event_type, '>' ORDER BY step ASC) AS path
         |  FROM s3 WHERE step <= $PathMaxSteps GROUP BY user_id, sess)
         |SELECT path, count(*) AS n_sessions FROM p GROUP BY path
         |ORDER BY n_sessions DESC, path ASC LIMIT $TopPathsK""".stripMargin,

    "x_gap_fill" ->
      s"""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         |    value
         |  FROM events WHERE user_id < $GapFillUsers),
         |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
         |  FROM ev GROUP BY user_id),
         |days AS (SELECT user_id,
         |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |      AS day
         |  FROM span),
         |daily AS (SELECT user_id, day,
         |    CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS dv
         |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, day)
         |SELECT d.user_id, CAST(d.day AS VARCHAR) AS day,
         |  CAST(coalesce(last_value(daily.dv IGNORE NULLS) OVER (
         |    PARTITION BY d.user_id ORDER BY d.day
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0)
         |    AS DOUBLE) AS purchase_value_ff
         |FROM days d LEFT JOIN daily
         |  ON daily.user_id = d.user_id AND daily.day = d.day""".stripMargin,

    // identical expression tree to the Spark side so every IEEE rounding
    // agrees; DuckDB date subtraction yields integer days (= datediff)
    "x_interpolate_linear" ->
      s"""WITH ev AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type,
         |    value FROM events WHERE user_id < $GapFillUsers),
         |span AS (SELECT user_id, min(day) AS d0, max(day) AS d1
         |  FROM ev GROUP BY user_id),
         |days AS (SELECT user_id,
         |    CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE)
         |      AS day
         |  FROM span),
         |daily AS (SELECT user_id, day,
         |    CAST(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2))
         |      AS DOUBLE) AS dv
         |  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, day),
         |f AS (SELECT d.user_id, d.day, daily.dv FROM days d
         |  LEFT JOIN daily ON daily.user_id = d.user_id
         |    AND daily.day = d.day),
         |a AS (SELECT user_id, day, dv,
         |    last_value(CASE WHEN dv IS NOT NULL THEN day END IGNORE NULLS)
         |      OVER wp AS pd,
         |    last_value(CASE WHEN dv IS NOT NULL THEN dv END IGNORE NULLS)
         |      OVER wp AS pv,
         |    first_value(CASE WHEN dv IS NOT NULL THEN day END IGNORE NULLS)
         |      OVER wn AS nd,
         |    first_value(CASE WHEN dv IS NOT NULL THEN dv END IGNORE NULLS)
         |      OVER wn AS nv
         |  FROM f WINDOW
         |    wp AS (PARTITION BY user_id ORDER BY day
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |    wn AS (PARTITION BY user_id ORDER BY day
         |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT user_id, CAST(day AS VARCHAR) AS day,
         |  CASE WHEN dv IS NOT NULL THEN 'actual'
         |       WHEN pd IS NULL OR nd IS NULL THEN 'edge'
         |       ELSE 'interp' END AS kind,
         |  CASE WHEN dv IS NOT NULL THEN dv
         |       WHEN pd IS NULL AND nd IS NULL THEN CAST(0.0 AS DOUBLE)
         |       WHEN pd IS NULL THEN nv
         |       WHEN nd IS NULL THEN pv
         |       ELSE pv + (nv - pv) *
         |         (CAST(day - pd AS DOUBLE) / CAST(nd - pd AS DOUBLE))
         |  END AS value_interp
         |FROM a""".stripMargin,

    "x_retention_cohorts" ->
      s"""WITH ev AS (SELECT user_id,
        |    CAST(date_trunc('week', ts) AS DATE) AS wk FROM events
        |    WHERE event_type = 'purchase' AND value > $RetentionMinValue),
        |first AS (SELECT user_id, min(wk) AS cohort FROM ev
        |          GROUP BY user_id)
        |SELECT CAST(cohort AS VARCHAR) AS cohort_week,
        |  CAST((wk - cohort) / 7 AS INT) AS week_offset,
        |  count(*) AS n_users
        |FROM (SELECT DISTINCT ev.user_id, cohort, wk
        |      FROM ev JOIN first USING (user_id))
        |GROUP BY 1, 2""".stripMargin,

    "x_ohlc_bars" ->
      """WITH e AS (SELECT event_type, value,
        |    epoch_us(ts) - epoch_us(ts) % 21600000000 AS bar_us,
        |    printf('%020d|%012d', epoch_us(ts), event_id) AS k FROM events)
        |SELECT bar_us, event_type,
        |  arg_min(value, k) AS open,
        |  max(value) AS high, min(value) AS low,
        |  arg_max(value, k) AS close,
        |  count(*) AS n_events
        |FROM e GROUP BY bar_us, event_type""".stripMargin,

    "x_rolling_median" ->
      """SELECT user_id, event_id,
        |  median(value) OVER (PARTITION BY user_id
        |    ORDER BY epoch_us(ts), event_id
        |    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS roll_med
        |FROM events""".stripMargin,

    // identical integer sums, one division — lead() mirrors exactly
    "x_twap" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |d AS (SELECT user_id, cents,
        |    lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
        |      - us AS dur
        |  FROM e)
        |SELECT user_id, count(*) AS n_intervals,
        |  CAST(sum(cents * dur) AS DOUBLE) / CAST(sum(dur) AS DOUBLE)
        |    AS twap_cents
        |FROM d WHERE dur IS NOT NULL GROUP BY user_id""".stripMargin,

    // same integer weights via 1-based list index (oldest first, so
    // weight 2^(i−1) doubles toward the newest element), one division
    "x_ewma_smooth" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us,
        |    CAST(round(value * 100) AS BIGINT) AS cents FROM events),
        |l AS (SELECT user_id, event_id,
        |    list(cents) OVER (PARTITION BY user_id ORDER BY us, event_id
        |      ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS lst
        |  FROM e)
        |SELECT user_id, event_id,
        |  CAST(list_sum(list_transform(lst,
        |      (x, i) -> x * (CAST(1 AS BIGINT) << (i - 1)))) AS DOUBLE)
        |    / CAST((CAST(1 AS BIGINT) << len(lst)) - 1 AS DOUBLE) AS ewma
        |FROM l""".stripMargin,

    // exact side + pinned-true bound of the HLL set-op gate (same
    // adjudication pattern as x_hll_distinct_users — see the gate comment)
    "x_hll_audience_overlap" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        |tp AS (SELECT DISTINCT event_type FROM du),
        |pr AS (SELECT a.event_type AS type_a, b.event_type AS type_b
        |       FROM tp a JOIN tp b ON a.event_type < b.event_type),
        |un AS (
        |  SELECT type_a, type_b, user_id FROM pr
        |  JOIN du ON du.event_type = pr.type_a
        |  UNION ALL
        |  SELECT type_a, type_b, user_id FROM pr
        |  JOIN du ON du.event_type = pr.type_b)
        |SELECT type_a, type_b,
        |  count(*) - count(DISTINCT user_id) AS exact_overlap,
        |  count(DISTINCT user_id) AS exact_union,
        |  true AS hll_overlap_in_bound
        |FROM un GROUP BY 1, 2""".stripMargin,

    // same daily series, same day+k self-join, the identical scalar
    // formula over exact integer moments (HUGEINT sums cast to DOUBLE
    // inside the formula, exactly where Spark's long→double casts sit)
    "x_autocorr" -> {
      def leg(k: Int) =
        s"""SELECT $k AS lag, count(*) AS n_pairs,
           |  round((CAST(count(*) AS DOUBLE) * CAST(sum(a.y * b.y) AS DOUBLE)
           |      - CAST(sum(a.y) AS DOUBLE) * CAST(sum(b.y) AS DOUBLE))
           |    / (sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(a.y * a.y) AS DOUBLE)
           |        - CAST(sum(a.y) AS DOUBLE) * CAST(sum(a.y) AS DOUBLE))
           |      * sqrt(CAST(count(*) AS DOUBLE) * CAST(sum(b.y * b.y) AS DOUBLE)
           |        - CAST(sum(b.y) AS DOUBLE) * CAST(sum(b.y) AS DOUBLE))), 6)
           |    AS autocorr
           |FROM daily a JOIN daily b ON b.d + $k = a.d""".stripMargin
      s"""WITH daily AS MATERIALIZED (
         |  SELECT (CAST(ts AS DATE) - DATE '1970-01-01') AS d,
         |    count(*) AS y
         |  FROM events GROUP BY 1)
         |${leg(1)}
         |UNION ALL
         |${leg(7)}""".stripMargin
    },

    // identical per-series lag arithmetic
    "x_delta_sum" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us,
        |    event_id, CAST(round(value * 1000000, 0) AS BIGINT) AS vq
        |  FROM events),
        |d AS (SELECT user_id, event_type,
        |    vq - lag(vq, 1) OVER (PARTITION BY user_id, event_type
        |      ORDER BY us, event_id) AS dd
        |  FROM e)
        |SELECT event_type, count(DISTINCT user_id) AS n_series,
        |  CAST(sum(CASE WHEN dd > 0 THEN dd ELSE 0 END) AS BIGINT)
        |    AS delta_sum_micro
        |FROM d GROUP BY event_type""".stripMargin,

    // the same bracket-deficit closed form, verbatim
    "x_sequence_count" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS us, event_id, event_type
        |  FROM events WHERE event_type IN ('view', 'purchase')),
        |m AS (SELECT user_id, event_type,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END) OVER w
        |      - count(CASE WHEN event_type = 'view' THEN 1 END) OVER w AS d
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |per AS (SELECT user_id,
        |    count(CASE WHEN event_type = 'purchase' THEN 1 END)
        |      - greatest(max(d), 0) AS n_pairs
        |  FROM m GROUP BY user_id)
        |SELECT n_pairs, count(*) AS n_users FROM per
        |WHERE n_pairs > 0 GROUP BY n_pairs""".stripMargin,

    // identical per-row tier logic, cutoffs from the same span arithmetic
    "x_ttl_rollup" ->
      """WITH b AS (SELECT epoch_us(min(ts)) AS lo, epoch_us(max(ts)) AS hi
        |  FROM events),
        |e AS (SELECT epoch_us(ts) AS us, ts,
        |    CAST(round(value * 1000000, 0) AS BIGINT) AS vq
        |  FROM events),
        |tiered AS (SELECT
        |    CASE WHEN us > hi - (hi - lo) // 3 THEN 'hour'
        |         WHEN us > hi - 2 * ((hi - lo) // 3) THEN 'day'
        |         ELSE 'week' END AS tier,
        |    CASE WHEN us > hi - (hi - lo) // 3
        |           THEN epoch_us(date_trunc('hour', ts))
        |         WHEN us > hi - 2 * ((hi - lo) // 3)
        |           THEN epoch_us(date_trunc('day', ts))
        |         ELSE epoch_us(date_trunc('week', ts)) END AS bucket_us,
        |    vq
        |  FROM e CROSS JOIN b)
        |SELECT tier, bucket_us, count(*) AS n_events,
        |  CAST(sum(vq) AS BIGINT) AS sum_value_micro
        |FROM tiered GROUP BY tier, bucket_us""".stripMargin,

    // every additive value recomputed from raw rows; the sketch binds
    // through the pinned bound boolean
    "x_agg_state_merge" ->
      """SELECT count(DISTINCT CAST(ts AS DATE)) AS n_days,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS BIGINT)
        |    AS sum_value_micro,
        |  count(DISTINCT user_id) AS exact_users,
        |  true AS est_in_bound
        |FROM events""".stripMargin,

    "x_funnel_stages" ->
      s"""WITH pu AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      AS t_view
        |  FROM events GROUP BY user_id),
        |av AS (SELECT e.user_id, pu.t_view, min(epoch_us(e.ts)) AS t_click
        |  FROM events e JOIN pu USING (user_id)
        |  WHERE e.event_type = 'click' AND pu.t_view IS NOT NULL
        |    AND epoch_us(e.ts) >= pu.t_view
        |    AND epoch_us(e.ts) <= pu.t_view + $ClickWindowUs
        |  GROUP BY e.user_id, pu.t_view),
        |ac AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t_buy
        |  FROM events e JOIN av USING (user_id)
        |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= av.t_click
        |    AND epoch_us(e.ts) <= av.t_click + $BuyWindowUs
        |  GROUP BY e.user_id)
        |SELECT 'view' AS stage, count(*) AS n_users FROM pu
        |  WHERE t_view IS NOT NULL
        |UNION ALL SELECT 'click_after_view', count(*) FROM av
        |UNION ALL SELECT 'purchase_after_click', count(*) FROM ac""".stripMargin)
}
