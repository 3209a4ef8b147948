package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** In-engine pins for the event-analytics gates (cross-engine exactness
  * is the DuckDB oracle's job). */
class EventOpsSpec extends AnyFunSuite with graft.GateCacheHygiene {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("x_ewma_smooth: exact power-of-two weighting, trailing-8 truncation") {
    val tmp = java.nio.file.Files.createTempDirectory("ewma").toString
    // 10 events, one user, values 1.00 … 10.00 — weights double toward
    // the newest; from the 9th row the frame drops the oldest element
    val ev = (1 to 10).map(i => (7L, i.toLong, i.toDouble))
      .toDF("user_id", "event_id", "value")
      .withColumn("ts", timestamp_micros($"event_id" * 1000000L))
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = EventOps.queries("x_ewma_smooth")(spark, tmp)
      .as[(Long, Long, Double)].collect().sortBy(_._2).toSeq
    def ewma(vals: Seq[Long]): Double = {
      val num = vals.zipWithIndex.map { case (v, i) => v << i }.sum
      num.toDouble / ((1L << vals.size) - 1).toDouble
    }
    val cents = (1 to 10).map(_ * 100L)
    val expect = (1 to 10).map { i =>
      ewma(cents.slice(math.max(0, i - 8), i))
    }
    assert(out.map(_._3) == expect)
    assert(out.head._3 == 100.0) // single element: the value itself
    // row 3: (100·1 + 200·2 + 300·4)/7 — recency dominates
    assert(out(2)._3 == 1700.0 / 7.0)
  }

  test("x_twap: duration-weighted exactly — a value held 9x longer weighs 9x; single-event users excluded") {
    val tmp = java.nio.file.Files.createTempDirectory("twap").toString
    // user 1: 1.00 held 9 µs-units, then 11.00 held 1 → TWAP = (100·9e6 +
    // 1100·1e6)/10e6 = 200 cents (NOT the density-weighted avg of 600).
    // user 2: one event — no holding interval, excluded.
    val ev = Seq(
      (1L, 1L, 0L, 1.0), (1L, 2L, 9000000L, 11.0), (1L, 3L, 10000000L, 5.0),
      (2L, 4L, 0L, 42.0))
      .toDF("user_id", "event_id", "us", "value")
      .withColumn("ts", timestamp_micros($"us"))
      .withColumn("event_type", lit("view")).withColumn("props", lit("{}"))
      .drop("us")
    ev.write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = EventOps.queries("x_twap")(spark, tmp)
      .as[(Long, Long, Double)].collect().toSeq
    assert(out == Seq((1L, 2L, 200.0)))
  }

  test("x_interpolate_linear: exact values between anchors, edge extension, full coverage") {
    val dir = TestSpark.Sf0001
    val rows = EventOps.queries("x_interpolate_linear")(spark, dir)
      .as[(Long, String, String, Double)].collect().toSeq
    val byUser = rows.groupBy(_._1)
    // the densified frame is complete: per user, one row per day of span
    byUser.foreach { case (_, rs) =>
      val days = rs.map(r => java.time.LocalDate.parse(r._2))
      assert(days.distinct.size == days.size)
      assert(java.time.temporal.ChronoUnit.DAYS.between(
        days.min(Ordering[java.time.LocalDate]),
        days.max(Ordering[java.time.LocalDate])) + 1 == days.size)
    }
    assert(Set("actual", "interp", "edge").subsetOf(rows.map(_._3).toSet),
      "corpus exercises all three kinds")
    // every interpolated value lies between its user's anchor bounds
    byUser.foreach { case (_, rs) =>
      val actual = rs.filter(_._3 == "actual").map(_._4)
      if (actual.nonEmpty) {
        val (lo, hi) = (actual.min, actual.max)
        rs.filter(_._3 == "interp").foreach { r =>
          assert(r._4 >= lo - 1e-9 && r._4 <= hi + 1e-9,
            s"interp ${r._4} outside anchor envelope [$lo, $hi]")
        }
      }
    }
    // crafted exactness: anchors 10 @ d0 and 40 @ d3 → 20, 30 on the
    // missing days (exact binary fractions — no tolerance)
    val ev = Seq(
      (1L, "2024-01-01 00:00:00", "purchase", 10.0),
      (1L, "2024-01-04 00:00:00", "purchase", 40.0),
      (1L, "2024-01-02 00:00:00", "view", 5.0)) // non-purchase: no anchor
      .toDF("user_id", "t", "event_type", "value")
      .withColumn("ts_us", unix_micros(to_timestamp($"t")))
    val tmp = java.nio.file.Files.createTempDirectory("interp").toString
    ev.select($"user_id", timestamp_micros($"ts_us").as("ts"),
      $"event_type", $"value",
      lit(0L).as("event_id"), lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = EventOps.queries("x_interpolate_linear")(spark, tmp)
      .as[(Long, String, String, Double)].collect().toSeq.sortBy(_._2)
    assert(out == Seq(
      (1L, "2024-01-01", "actual", 10.0),
      (1L, "2024-01-02", "interp", 20.0),
      (1L, "2024-01-03", "interp", 30.0),
      (1L, "2024-01-04", "actual", 40.0)))
  }

  test("x_delta_sum: counter resets never contribute; ≡ straight-line lag") {
    import org.apache.spark.sql.functions._
    // crafted counter with a reset: 10 → 13 → 7 → 20 sums only +3 and
    // +13 = 16; the −6 reset jump is dropped
    val deltas = Seq(10L, 13L, 7L, 20L).sliding(2)
      .map { case Seq(a, b) => b - a }.filter(_ > 0).sum
    assert(deltas == 16L)

    val ev = spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")),
        col("event_id"),
        round(col("value") * 1000000d, 0).cast("bigint"))
      .as[(Long, String, Long, Long, Option[Long])].collect()
    val want = ev.groupBy(r => r._2).map { case (tpe, rows) =>
      val bySeries = rows.groupBy(_._1)
      val ds = bySeries.values.map { series =>
        series.sortBy(r => (r._3, r._4)).map(_._5).toSeq
          .sliding(2).collect {
            case Seq(Some(a), Some(b)) if b - a > 0 => b - a
          }.sum
      }.sum
      tpe -> ((bySeries.size.toLong, ds))
    }
    val got = EventOps.queries("x_delta_sum")(spark, TestSpark.Sf0001)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got == want)
  }

  test("x_sequence_count: bracket identity ≡ greedy non-overlap matcher") {
    import org.apache.spark.sql.functions._
    // crafted: V P P V V P → P1 consumes V1, P2 finds no view,
    // P3 consumes V2 — greedy disjoint pairs = 2
    val seq = Seq("view", "purchase", "purchase", "view", "view", "purchase")
    var open = 0L; var matched = 0L
    seq.foreach {
      case "view" => open += 1
      case _ => if (open > 0) { open -= 1; matched += 1 }
    }
    assert(matched == 2L)

    // straight-line greedy matcher over real sf0.001 streams ≡ the gate
    val ev = spark.read.parquet(s"${TestSpark.Sf0001}/events.parquet")
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .filter(col("event_type").isin("view", "purchase"))
      .as[(Long, Long, Long, String)].collect()
    val want = ev.groupBy(_._1).flatMap { case (u, rows) =>
      var o = 0L; var m = 0L
      rows.sortBy(r => (r._2, r._3)).foreach { r =>
        if (r._4 == "view") o += 1
        else if (o > 0) { o -= 1; m += 1 }
      }
      if (m > 0) Some(u -> m) else None
    }
    val wantHist = want.values.groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val got = EventOps.queries("x_sequence_count")(spark, TestSpark.Sf0001)
      .as[(Long, Long)].collect().toMap
    assert(got == wantHist)
    assert(got.nonEmpty)
  }

  test("x_ttl_rollup: tiers partition the rows; buckets align to their " +
      "resolution") {
    import org.apache.spark.sql.functions._
    val out = EventOps.queries("x_ttl_rollup")(spark, TestSpark.Sf0001)
      .collect()
    val total = spark.read
      .parquet(s"${TestSpark.Sf0001}/events.parquet").count()
    // mass conservation: every event lands in exactly one tier bucket
    assert(out.map(_.getAs[Long]("n_events")).sum == total)
    assert(out.map(_.getAs[String]("tier")).toSet == Set("hour", "day", "week"))
    val hourUs = 3600L * 1000000L
    out.foreach { r =>
      val b = r.getAs[Long]("bucket_us")
      r.getAs[String]("tier") match {
        case "hour" => assert(b % hourUs == 0)
        case "day"  => assert(b % (24 * hourUs) == 0)
        case "week" => // Monday-start: epoch Thursday + 4 days offset
          assert((b - 4 * 24 * hourUs) % (7 * 24 * hourUs) == 0)
      }
    }
    // downsampling: coarser tiers hold fewer buckets per covered row
    val byTier = out.groupBy(_.getAs[String]("tier"))
      .view.mapValues(_.length).toMap
    assert(byTier("week") < byTier("day") && byTier("day") < byTier("hour"))
  }

  test("x_agg_state_merge: persisted HLL states union to the whole-set " +
      "estimate; additive partials reconcile exactly") {
    import org.apache.spark.sql.functions._
    // crafted overlap across groups: users 0-99 in g0, 50-149 in g1 —
    // union-of-states must see 150 distinct, not 200
    val df = spark.range(100).select(lit("g0").as("g"), col("id"))
      .unionAll(spark.range(50, 150).select(lit("g1").as("g"), col("id")))
    val mv = java.nio.file.Files.createTempDirectory("aggstate_spec").toString
    df.groupBy(col("g")).agg(hll_sketch_agg(col("id")).as("_state"),
        count(lit(1)).as("_n"))
      .write.mode("overwrite").parquet(mv)
    val r = spark.read.parquet(mv).agg(
      sum(col("_n")).as("n"),
      hll_sketch_estimate(hll_union_agg(col("_state"))).as("est"),
      count(lit(1)).as("groups")).head()
    assert(r.getLong(2) == 2L && r.getLong(0) == 200L)
    assert(math.abs(r.getLong(1) - 150L) <= 8L) // ±5% of 150 at lgK=12
    // the merged estimate must equal estimating one directly-built
    // global sketch — state merge loses nothing vs a single pass
    val direct = df.agg(
      hll_sketch_estimate(hll_sketch_agg(col("id")))).head().getLong(0)
    assert(r.getLong(1) == direct)

    // the real gate on real data: booleans pinned, additives positive
    val g = EventOps.queries("x_agg_state_merge")(spark, TestSpark.Sf0001)
      .collect()
    assert(g.length == 1)
    val row = g.head
    assert(row.getAs[Boolean]("est_in_bound"))
    assert(row.getAs[Long]("n_days") > 0 && row.getAs[Long]("n_events") > 0)
  }

  test("x_autocorr ≡ straight-line lag correlation of the daily series; pair counts match the calendar") {
    import spark.implicits._
    val daily = Tables.events(spark, graft.TestSpark.Sf0001)
      .groupBy(to_date(timestamp_micros(col("ts_us"))).as("day"))
      .agg(count(lit(1)).as("y"))
      .select(datediff(col("day"), to_date(lit("1970-01-01"))).as("d"),
        col("y"))
      .as[(Int, Long)].collect().toMap
    def ref(k: Int): (Long, Double) = {
      val pairs = daily.toSeq.flatMap { case (d, y0) =>
        daily.get(d - k).map(yk => (y0, yk)) }
      val n = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum.toDouble, pairs.map(_._2).sum.toDouble)
      val sxy = pairs.map(p => p._1 * p._2).sum.toDouble
      val sxx = pairs.map(p => p._1 * p._1).sum.toDouble
      val syy = pairs.map(p => p._2 * p._2).sum.toDouble
      val c = (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
      (pairs.length.toLong,
        BigDecimal(c).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
    val got = EventOps.queries("x_autocorr")(spark, graft.TestSpark.Sf0001)
      .as[(Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1, 7))
    Seq(1, 7).foreach { k =>
      val (n, c) = ref(k)
      assert(got(k)._1 == n, s"lag $k pair count")
      assert(math.abs(got(k)._2 - c) < 1e-9, s"lag $k corr ${got(k)._2} vs $c")
      assert(math.abs(got(k)._2) <= 1.0)
    }
    // the event calendar is dense: a 30-day span gives span−k pairs
    val span = daily.keySet.max - daily.keySet.min + 1
    assert(got(1)._1 == span - 1 && got(7)._1 == span - 7,
      "calendar gaps would shrink the lag join — not expected on this corpus")
    graft.GateCache.releaseAll()
  }

  test("x_top_paths ≡ straight-line sessionize+truncate+rank; the " +
      "truncation genuinely binds") {
    import spark.implicits._
    val ev = Tables.events(spark, graft.TestSpark.Sf0001)
      .select($"user_id", $"ts_us", $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    // straight-line reference: per user, order by (ts, id), split on the
    // 6 h gap, keep the first 8 steps, join with '>'
    val sessions = ev.groupBy(_._1).values.flatMap { rows =>
      val sorted = rows.sortBy(r => (r._2, r._3)).toSeq
      val sessionsOfUser =
        scala.collection.mutable.ArrayBuffer(
          scala.collection.mutable.ArrayBuffer(sorted.head))
      sorted.sliding(2).foreach {
        case Seq(a, b) =>
          if (b._2 - a._2 > SqlSurface.SessionGapUs)
            sessionsOfUser += scala.collection.mutable.ArrayBuffer(b)
          else sessionsOfUser.last += b
        case _ => ()
      }
      sessionsOfUser.map(sess => (sess.size,
        sess.take(EventOps.PathMaxSteps).map(_._4).mkString(">")))
    }.toSeq
    val want = sessions.map(_._2).groupBy(identity)
      .view.mapValues(_.size.toLong).toSeq
      .sortBy { case (p, n) => (-n, p) }.take(EventOps.TopPathsK)
    val got = EventOps.queries("x_top_paths")(spark, graft.TestSpark.Sf0001)
      .as[(String, Long)].collect().toSeq
      .sortBy { case (p, n) => (-n, p) }
    assert(got == want)
    // the 8-step cap must do real work on this corpus (a session LONGER
    // than the cap exists) — otherwise the bound is untested
    assert(sessions.exists(_._1 > EventOps.PathMaxSteps),
      "no session exceeds the truncation cap at sf0.001")
    assert(got.nonEmpty && got.map(_._2).sum <= sessions.size)
    assert(got.map(_._1).distinct.size > 1, "degenerate single path")
    graft.GateCache.releaseAll()
  }

  test("x_event_transitions ≡ straight-line adjacency counts; rows " +
      "normalize to 1; cross-session adjacencies excluded") {
    import spark.implicits._
    val ev = Tables.events(spark, graft.TestSpark.Sf0001)
      .select($"user_id", $"ts_us", $"event_id", $"event_type")
      .as[(Long, Long, Long, String)].collect()
    val pairs = ev.groupBy(_._1).values.flatMap { rows =>
      rows.sortBy(r => (r._2, r._3)).toSeq.sliding(2).collect {
        case Seq(a, b) if b._2 - a._2 <= SqlSurface.SessionGapUs =>
          (a._4, b._4)
      }
    }.toSeq
    val want = pairs.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val got = EventOps.queries("x_event_transitions")(spark,
        graft.TestSpark.Sf0001)
      .as[(String, String, Long, Double)].collect()
    assert(got.map(r => (r._1, r._2) -> r._3).toMap == want)
    // per-from probabilities sum to 1 (up to the round-6 quantization)
    got.groupBy(_._1).foreach { case (from, rs) =>
      assert(math.abs(rs.map(_._4).sum - 1.0) < 1e-4, s"row $from")
    }
    // the session bound does real work: some adjacency was excluded
    val allPairs = ev.groupBy(_._1).values.map(_.size - 1).sum
    assert(pairs.size < allPairs,
      "no cross-session gap at sf0.001 — the gap filter is vacuous")
    graft.GateCache.releaseAll()
  }
}
