package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EventOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  test("events.ts schema contract: testdata layout is supported and normalized") {
    // The driver regenerates /root/testdata between rounds and has already
    // shipped events.ts in two physical layouts (INT64 TIMESTAMP(NANOS),
    // then TIMESTAMP(MICROS) ntz). This is the loud, named canary for the
    // next drift: it fails with the actual footer type instead of 39
    // downstream DATATYPE_MISMATCH spec failures.
    import org.apache.spark.sql.types._
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet").schema("ts").dataType
    val supported: Set[DataType] = Set(TimestampType, TimestampNTZType, LongType)
    assert(supported.contains(raw),
      s"events.ts layout changed: footer reads as $raw — extend Tables.eventsAt " +
        "and StreamingSessions.eventsStream for the new layout")
    // whatever the physical layout, every consumer sees one logical type
    assert(Tables.events(spark, sfDir).schema("ts").dataType === TimestampType)
  }

  test("events.ts legacy nanos-as-long layout still reads (and unknown fails loudly)") {
    import org.apache.spark.sql.types._
    import spark.implicits._
    // the legacy TIMESTAMP(NANOS) generation surfaces as a raw long under
    // nanosAsLong; no such corpus ships any more, so synthesize one: a
    // bigint ts in nanos must come back as the truncated-µs instant
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos").toString
    val nanos = 1700000000123456789L // ...456789 ns → ...456 µs truncated
    Seq((1L, nanos)).toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val got = Tables.events(spark, dir)
    assert(got.schema("ts").dataType === TimestampType)
    val inst = got.select(unix_micros(col("ts"))).head().getLong(0)
    assert(inst === nanos / 1000)
    // an unrecognized layout must throw the one-line contract error, not
    // flow garbage downstream
    val bad = Seq((1L, "not-a-time")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](
      Tables.normalizeTs(bad, StringType, "synthetic"))
    assert(e.getMessage.contains("events.ts layout changed"))
  }

  test("q105 decayed popularity equals an exact BigInt recompute") {
    val got = SparkEntry.queries("q105_decayed_popularity")(spark, sfDir)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(get_json_object(col("props"), "$.k").as("item"),
        to_date(col("ts")).as("d"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getString(0), r.getDate(1).toLocalDate, r.getLong(2)))
    val maxD = ev.map(_._2).max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val expected = ev.groupBy(_._1).map { case (item, rows) =>
      val sum = rows.map { case (_, d, cents) =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(d, maxD)
        if (age > 30) BigInt(0) else BigInt(cents) * (BigInt(1) << (30 - age).toInt)
      }.sum
      item -> (sum.toDouble / math.pow(2, 30), rows.size.toLong)
    }
    assert(got === expected)
  }

  test("q73 funnel: stage timestamps are strictly ordered and prefix-closed") {
    val df = SparkEntry.queries("q73_funnel")(spark, sfDir)
    // reaching stage k implies reaching every earlier stage
    assert(df.filter(col("t3").isNotNull && (col("t2").isNull || col("t1").isNull)).count() === 0)
    assert(df.filter(col("t2").isNotNull && col("t1").isNull).count() === 0)
    // strict event ordering within the funnel
    assert(df.filter(col("t2").isNotNull && !(col("t2") > col("t1"))).count() === 0)
    assert(df.filter(col("t3").isNotNull && !(col("t3") > col("t2"))).count() === 0)
    // one row per user seen in the log
    assert(df.count() ===
      Tables.events(spark, sfDir).select("user_id").distinct().count())
    // reached_stage encodes exactly the nullness ladder
    assert(df.filter(
      (col("reached_stage") === 3) =!= col("t3").isNotNull ||
      (col("reached_stage") >= 2) =!= col("t2").isNotNull ||
      (col("reached_stage") >= 1) =!= col("t1").isNotNull).count() === 0)
  }

  test("q74 bucketed join: aggregation runs with zero shuffle exchanges") {
    val df = SparkEntry.queries("q74_bucketed_join")(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    // broadcast of the small dim is fine; a shuffle (hashpartitioning
    // exchange) would mean the bucketed layout was not exploited
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join+agg must not shuffle:\n$plan")
    // sanity: every customer with orders appears once
    assert(df.groupBy("custkey").count().filter(col("count") > 1).count() === 0)
  }

  test("q75 watermark ingest: emits exactly the post-watermark events, idempotently") {
    val df = SparkEntry.queries("q75_watermark_ingest")(spark, sfDir)
    val expected = Tables.events(spark, sfDir)
      .filter(col("ts") > lit("2024-01-20 00:00:00").cast("timestamp"))
      .select("event_id")
    assert(df.select("event_id").exceptAll(expected).isEmpty)
    assert(expected.exceptAll(df.select("event_id")).isEmpty)
    // idempotent: a second run of the same batch produces the same set
    val again = SparkEntry.queries("q75_watermark_ingest")(spark, sfDir)
    assert(df.select("event_id").exceptAll(again.select("event_id")).isEmpty)
  }

  test("q76 gap fill: scaffold is dense per user and LOCF carries the last observation") {
    val df = SparkEntry.queries("q76_gap_fill")(spark, sfDir).cache()
    try {
      // dense daily scaffold: row count per user = days in [min, max]
      val spans = Tables.events(spark, sfDir).groupBy("user_id")
        .agg(date_trunc("DAY", min("ts")).as("d0"), date_trunc("DAY", max("ts")).as("d1"))
        .select(col("user_id"),
          (datediff(col("d1"), col("d0")) + 1).cast("long").as("expect_days"))
      val counts = df.groupBy("user_id").count()
      assert(counts.join(spans, "user_id")
        .filter(col("count") =!= col("expect_days")).count() === 0)
      // LOCF law on collected rows: a zero-event day carries the previous value
      val rows = df.orderBy("user_id", "day").collect()
      var prev: (Long, Any) = (-1L, null)
      rows.foreach { r =>
        val u = r.getLong(0)
        val filled = r.get(3)
        if (r.getLong(2) === 0L && u === prev._1)
          assert(filled === prev._2, s"LOCF broke for user $u day ${r.get(1)}")
        prev = (u, filled)
      }
    } finally df.unpersist()
  }

  test("q77 cube: grouping sets partition the count space") {
    val df = SparkEntry.queries("q77_cube")(spark, sfDir)
    val total = Tables.orders(spark, sfDir).count()
    // each of the four grouping sets sums to the table count
    Seq((0, 0), (0, 1), (1, 0), (1, 1)).foreach { case (gs, gp) =>
      val s = df.filter(col("g_status") === gs && col("g_priority") === gp)
        .agg(sum("n_orders")).head().getLong(0)
      assert(s === total, s"grouping set ($gs,$gp) must cover all rows")
    }
    // grouping flag semantics: flag=1 <=> dimension is the ALL bucket (null)
    assert(df.filter((col("g_status") === 1) =!= col("o_orderstatus").isNull).count() === 0)
    assert(df.filter((col("g_priority") === 1) =!= col("o_orderpriority").isNull).count() === 0)
  }

  test("q81 hopping windows: every event lands in exactly 3 overlapping windows") {
    val df = SparkEntry.queries("q81_hopping_window")(spark, sfDir)
    val total = Tables.events(spark, sfDir).count()
    assert(df.agg(sum("n_events")).head().getLong(0) === 3 * total,
      "6h windows hopping every 2h must count each event exactly 3 times")
    // all windows span exactly 6 hours and start on the 2-hour grid
    assert(df.filter(
      unix_timestamp(col("window_end")) - unix_timestamp(col("window_start")) =!= 21600 ||
      unix_timestamp(col("window_start")) % 7200 =!= 0).count() === 0)
  }

  test("q78 count-min: estimates never undercount and totals reconcile") {
    val df = SparkEntry.queries("q78_countmin")(spark, sfDir)
    assert(df.filter(col("overestimate") < 0).count() === 0,
      "count-min must never underestimate")
    val totalExact = df.agg(sum("exact_n")).head().getLong(0)
    assert(totalExact === Tables.events(spark, sfDir).count())
  }

  test("q83 cohort retention: offset-0 cell counts every user exactly once") {
    val df = SparkEntry.queries("q83_cohort_retention")(spark, sfDir)
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    // every user is active in their own cohort week
    assert(df.filter(col("week_offset") === 0).agg(sum("n_active")).head().getLong(0)
      === users)
    assert(df.filter(col("week_offset") < 0).count() === 0)
    // no retention cell can exceed its cohort's size
    val c0 = df.filter(col("week_offset") === 0)
      .select(col("cohort_week"), col("n_active").as("cohort_size"))
    assert(df.join(c0, "cohort_week").filter(col("n_active") > col("cohort_size"))
      .count() === 0)
  }

  test("q84 debounce: survivors keep their gap, dropped events were within the window") {
    val kept = SparkEntry.queries("q84_debounce")(spark, sfDir)
      .select("event_id").collect().map(_.getLong(0)).toSet
    // independent driver-side recomputation: plain Scala sort + walk, no
    // window functions — a bug in the operator's lag formulation cannot
    // replicate here
    val rows = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts", "event_id").collect()
      .map { r =>
        val t = r.getTimestamp(2)
        // full µs precision: getTime() truncates to ms, getNanos() has the rest
        val us = t.getTime / 1000 * 1000000L + t.getNanos / 1000
        (r.getLong(0), r.getString(1), us, r.getLong(3))
      }
    val expected = rows.groupBy(r => (r._1, r._2)).values.flatMap { grp =>
      val sorted = grp.sortBy(r => (r._3, r._4))
      sorted.zip(None +: sorted.map(Some(_))).collect {
        case (cur, prev) if prev.forall(p => cur._3 - p._3 >= 3600000000L) => cur._4
      }
    }.toSet
    assert(kept === expected)
    assert(kept.size < rows.length, "the window must actually drop something")
  }

  test("q82 nested agg: arrays are sorted, complete, and consistent with their scalars") {
    val df = SparkEntry.queries("q82_nested_agg")(spark, sfDir)
    assert(df.agg(sum("n_orders")).head().getLong(0) ===
      Tables.orders(spark, sfDir).count(), "arrays must cover every order")
    assert(df.filter(col("first_key") > col("last_key")).count() === 0)
    assert(df.filter(
      size(split(col("keys_csv"), ",")).cast("long") =!= col("n_orders")).count() === 0)
  }

  test("q88 time-weighted average: bounded by the day's values and matches an independent recompute") {
    val df = SparkEntry.queries("q88_time_weighted_avg")(spark, sfDir)
    assert(df.agg(sum("n_events")).head().getLong(0) ===
      Tables.events(spark, sfDir).count(), "every event belongs to exactly one user-day")
    // twa is a convex combination of the day's observations
    val bounds = Tables.events(spark, sfDir)
      .groupBy(col("user_id"), date_trunc("DAY", col("ts")).as("day"))
      .agg(min("value").as("lo"), max("value").as("hi"))
    val eps = 1e-9
    assert(df.join(bounds, Seq("user_id", "day"))
      .filter(col("twa_value") < col("lo") - eps || col("twa_value") > col("hi") + eps)
      .count() === 0)
    // independent scala recompute of one busy user-day (exact µs arithmetic,
    // matching the query's integer-sum formulation bit for bit)
    val top = df.orderBy(col("n_events").desc, col("user_id"), col("day")).head()
    val (u, day) = (top.getLong(0), top.getTimestamp(1))
    val evs = Tables.events(spark, sfDir)
      .filter(col("user_id") === u && date_trunc("DAY", col("ts")) === day)
      .select(expr("unix_micros(ts)"), col("value"), col("event_id"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      .sortBy(t => (t._1, t._3))
    val dayEndUs = day.getTime * 1000L + 24L * 3600 * 1000000
    val (num, den) = evs.zip(evs.drop(1).map(_._1) :+ dayEndUs)
      .map { case ((ts, v, _), next) => (math.round(v * 100) * (next - ts), next - ts) }
      .reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    assert(top.getDouble(3) === num.toDouble / den.toDouble / 1e2)
  }

  test("q92 peak concurrency matches an exact global sweep with day-start levels") {
    val df = SparkEntry.queries("q92_peak_concurrency")(spark, sfDir)
    // the per-day offset join must broadcast the tiny base table, not
    // sort-merge the whole boundary stream
    assert(!df.queryExecution.executedPlan.toString.contains("SortMergeJoin"),
      "q92 offset join regressed to a sort-merge join")
    val got = df.collect().map(r => r.getTimestamp(0) -> r.getLong(1)).toMap
    // independent recompute: ONE global sweep (no per-day partitioning),
    // sampling the running level once per distinct boundary INSTANT (all
    // same-instant deltas applied as one net step — the exact semantics the
    // distributed per-day form must reproduce, including the level at each
    // day-start sentinel)
    val us = Tables.events(spark, sfDir)
      .select(expr("unix_micros(ts)"))
      .collect().map(_.getLong(0))
    val win = 30L * 60 * 1000000
    val dayUs = 24L * 3600 * 1000000
    val bounds = us.map(t => (t, 1)) ++ us.map(t => (t + win, -1))
    val days = bounds.map(b => Math.floorDiv(b._1, dayUs) * dayUs).distinct
    val byInstant = (bounds ++ days.map(d => (d, 0)))
      .groupBy(_._1).toSeq
      .map { case (t, ds) => (t, ds.map(_._2).sum) }
      .sortBy(_._1)
    var cur = 0L
    val peaks = scala.collection.mutable.Map[Long, Long]()
    for ((t, d) <- byInstant) {
      cur += d
      val day = Math.floorDiv(t, dayUs) * dayUs
      peaks(day) = math.max(peaks.getOrElse(day, Long.MinValue), cur)
    }
    val expected = peaks.map { case (d, p) => new java.sql.Timestamp(d / 1000) -> p }.toMap
    assert(got === expected)
  }

  test("q92 exact-midnight ties: the new day's peak is the NET day-start level") {
    import spark.implicits._
    // 3 intervals all ending exactly at midnight (start 23:30:00) and nothing
    // else on day 2: the carried-over base is 3, all three −1 boundaries
    // collapse with the day-start sentinel into one net step, so day 2's peak
    // must be 0 — not the base−1=2 a per-boundary walk would record there
    val ev = Seq.fill(3)("2024-03-01 23:30:00").toDF("s")
      .select(to_timestamp(col("s")).as("ts")) // parsed in the session tz
    val got = graft.ops.EventOps.peakConcurrencyOf(ev)
      .select(date_format(col("day"), "yyyy-MM-dd").as("d"), col("peak_concurrent"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map(
      "2024-03-01" -> 3L, // the three open intervals before midnight
      "2024-03-02" -> 0L)) // at midnight all three are closed (half-open)
  }

  test("q96 rolling active users matches a brute-force window recompute") {
    val df = SparkEntry.queries("q96_rolling_active_users")(spark, sfDir)
    val got = df.collect().map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val ud = Tables.events(spark, sfDir)
      .select(col("user_id"), date_trunc("DAY", col("ts")).as("day")).distinct()
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).getTime))
    val dayMs = 24L * 3600 * 1000
    // every calendar day of the observed span, including any with a fully
    // silent 7-day lookback (those must report 0, not vanish)
    val days = ud.map(_._2).min to ud.map(_._2).max by dayMs
    val expected = days.map { d =>
      d -> ud.filter { case (_, ed) => ed >= d - 6 * dayMs && ed <= d }
        .map(_._1).distinct.length.toLong
    }.toMap
    assert(got === expected)
  }

  test("q97 transition matrix matches an exact recompute and rows sum to 1 per source") {
    val df = SparkEntry.queries("q97_transition_matrix")(spark, sfDir)
    val got = df.collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val evs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)"), col("event_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = evs.groupBy(_._1).values.flatMap { g =>
      val s = g.sortBy(t => (t._2, t._3))
      s.zip(s.drop(1)).collect {
        case (a, b) if b._2 - a._2 < 1800000000L => (a._4, b._4)
      }
    }.toSeq
    val counts = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val totals = counts.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val expected = counts.map { case ((f, t), n) =>
      (f, t) -> (n, n.toDouble / totals(f).toDouble) }
    assert(got === expected)
    // conditional probabilities per source sum to 1 (within one ulp-scale sum)
    val sums = df.groupBy("from_type").agg(sum("p_transition")).collect()
      .map(_.getDouble(1))
    assert(sums.forall(s => math.abs(s - 1.0) < 1e-12))
  }

  test("q89 attribution: conserves purchases and revenue; channels are valid") {
    val df = SparkEntry.queries("q89_attribution")(spark, sfDir)
    val purchases = Tables.events(spark, sfDir).filter(col("event_type") === "purchase")
    assert(df.agg(sum("n_purchases")).head().getLong(0) === purchases.count(),
      "every purchase is attributed to exactly one channel (or none)")
    val creditedCents = df.agg(sum(expr("CAST(round(revenue * 100) AS BIGINT)")))
      .head().getLong(0)
    val actualCents = purchases.agg(sum(expr("CAST(round(value * 100) AS BIGINT)")))
      .head().getLong(0)
    assert(creditedCents === actualCents, "attribution must conserve revenue")
    val channels = df.select("attributed_channel").distinct()
      .collect().map(_.getString(0)).toSet
    assert(channels.subsetOf(Set("view", "click", "none")))
  }

  test("q109 grouping sets: each set matches its standalone GROUP BY") {
    val df = SparkEntry.queries("q109_grouping_sets")(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
      .withColumn("cents", expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
    // gid=0: the full (flag, status) breakdown
    val fine = df.filter(col("gid") === 0)
      .select("l_returnflag", "l_linestatus", "revenue_cents", "n_items")
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    val fineExp = li.groupBy("l_returnflag", "l_linestatus")
      .agg(sum("cents").as("c"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(fine === fineExp)
    // gid=1: per-flag subtotals; gid=3: the single grand-total row
    val byFlag = df.filter(col("gid") === 1)
    assert(byFlag.filter(col("l_linestatus").isNotNull).count() === 0)
    val grand = df.filter(col("gid") === 3).collect()
    assert(grand.length === 1 &&
      grand(0).getLong(3) === li.agg(sum("cents")).head().getLong(0) &&
      grand(0).getLong(4) === li.count())
    // exactly the three declared sets, nothing else (no gid=2)
    assert(df.select("gid").distinct().collect().map(_.getLong(0)).toSet === Set(0L, 1L, 3L))
  }

  test("q106 interval union equals an exact per-user driver merge") {
    val got = SparkEntry.queries("q106_interval_union")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ivs = Tables.events(spark, sfDir)
      .select(col("user_id"), expr("unix_micros(ts)").as("st"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = ivs.groupBy(_._1).map { case (u, rows) =>
      val sorted = rows.map(_._2).sorted
      var islands = 0L
      var active = 0L
      var curStart = 0L
      var curEnd = Long.MinValue
      sorted.foreach { st =>
        val en = st + 1800000000L
        if (st > curEnd) { // strictly past: touching intervals merge
          if (islands > 0) active += curEnd - curStart
          islands += 1; curStart = st; curEnd = en
        } else if (en > curEnd) curEnd = en
      }
      active += curEnd - curStart
      u -> (active, islands)
    }
    assert(got === expected)
  }

  test("q106 boundary semantics: touching merges, 1µs gap splits, containment folds") {
    import spark.implicits._
    val iv = Seq(
      // user 1: [0,100) + [100,200) touch -> ONE island of 200
      (1L, 0L, 100L), (1L, 100L, 200L),
      // user 2: [0,100) then [101,200) -> gap of 1 -> two islands, 199 active
      (2L, 0L, 100L), (2L, 101L, 200L),
      // user 3: [0,1000) contains [10,20) and overlaps [900,1100) -> one island 1100
      (3L, 0L, 1000L), (3L, 10L, 20L), (3L, 900L, 1100L),
      // user 4: duplicate rows collapse into their island, not double-counted
      (4L, 5L, 50L), (4L, 5L, 50L)
    ).toDF("user_id", "st", "en")
    val got = ops.EventOps.intervalUnionOf(iv)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got === Map(
      1L -> (200L, 1L), 2L -> (199L, 2L), 3L -> (1100L, 1L), 4L -> (45L, 1L)))
  }

  test("q107 bitmap distinct equals exact COUNT(DISTINCT) per event type") {
    val got = SparkEntry.queries("q107_bitmap_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = Tables.events(spark, sfDir)
      .groupBy("event_type").agg(countDistinct("user_id").as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
  }

  /** Driver ground truth for q113: sort, slice ranks (⌈i·n/k⌉, ⌈(i+1)·n/k⌉]
    * per bucket, take min/max/count. */
  private def equidepthBrute(xs: Seq[Double], k: Int): Seq[(Long, Double, Double, Long)] = {
    val sorted = xs.sorted
    val n = sorted.length.toLong
    def ceilDiv(a: Long, b: Long): Long = (a + b - 1) / b
    (0 until k).flatMap { i =>
      val lo = ceilDiv(i * n, k)
      val hi = ceilDiv((i + 1) * n, k)
      if (hi > lo)
        Some((i.toLong, sorted(lo.toInt), sorted(hi.toInt - 1), hi - lo))
      else None
    }
  }

  test("q113 equi-depth histogram equals a driver sort-and-slice recompute") {
    val vs = Tables.lineitem(spark, sfDir)
      .select(col("l_extendedprice")).collect().map(_.getDouble(0)).toSeq
    val got = SparkEntry.queries("q113_equidepth_hist")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got === equidepthBrute(vs, 32))
    // every bucket within one row of n/k, by construction
    assert(got.map(_._4).max - got.map(_._4).min <= 1)
  }

  test("q113 boundary semantics under extreme skew and boundary-straddling ties") {
    import spark.implicits._
    // 90% of the mass on ONE value: that value must span many buckets, and
    // tie rows at boundary ranks must split by rank (counts stay within one
    // of n/k) while min/max stay tie-order-independent
    val skewed = Seq.fill(900)(5.0) ++ (1 to 100).map(_.toDouble / 100.0)
    val got = ops.Analytics.equidepthOf(skewed.toDF("v"), 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(got === equidepthBrute(skewed, 8))
    // k > n: empty buckets are dropped, emitted counts sum to n
    val tiny = Seq(1.0, 2.0, 3.0)
    val gotTiny = ops.Analytics.equidepthOf(tiny.toDF("v"), 8)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    assert(gotTiny === equidepthBrute(tiny, 8))
    assert(gotTiny.map(_._4).sum === 3L)
  }

  test("q126 incremental sessions equal full resessionization, with real merge work") {
    val got = SparkEntry.queries("q126_incremental_sessions")(spark, sfDir)
    // full recompute, reduced to the mergeable store schema
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val full = Tables.events(spark, sfDir)
      .select(col("event_id"), col("user_id"), col("ts"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("new_s", when(col("prev_ts").isNull ||
        (unix_timestamp(col("ts")) - unix_timestamp(col("prev_ts"))) > 1800, 1L)
        .otherwise(0L))
      .withColumn("seq", sum(col("new_s")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("seq"))
      .agg(min(col("ts")).as("session_start_ts"), max(col("ts")).as("session_end_ts"),
        count(lit(1)).as("events_n"), sum(col("cents")).as("value_cents"))
      .drop("seq")
    assert(got.count() > 0)
    assert(got.exceptAll(full).count() === 0)
    assert(full.exceptAll(got).count() === 0)
    // the delta branch is genuinely exercised: events exist on both sides of
    // the 3-days-from-horizon cutoff
    val ev = Tables.events(spark, sfDir)
    val t0 = ev.agg((max(col("ts")) - expr("INTERVAL 3 DAYS")).as("t0")).head().get(0)
    assert(ev.filter(col("ts") < lit(t0)).count() > 0)
    assert(ev.filter(col("ts") >= lit(t0)).count() > 0)
  }

  test("q124 volume anomaly equals a driver recompute over daily counts") {
    val got = SparkEntry.queries("q124_volume_anomaly")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getLong(2), r.getDouble(3), r.getInt(4))))
      .toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("cnt")).collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
      .groupBy(_._1)
    var expected = 0
    for ((t, rows) <- daily) {
      val seq = rows.sortBy(_._2).map(r => (r._2, r._3))
      for (i <- seq.indices.drop(7)) {
        val w = seq.slice(i - 7, i).map(_._2)
        val sx = w.sum
        val sxx = w.map(c => c * c).sum
        // the production double sequence: BIGINT/INT division first
        val variance = (sxx / 7.0d) - ((sx / 7.0d) * (sx / 7.0d))
        if (variance > 0.0d) {
          expected += 1
          val z = (seq(i)._2 - (sx / 7.0d)) / math.sqrt(variance)
          val flag = if (math.abs(z) >= 2.0d) 1 else 0
          assert(got((t, seq(i)._1)) === ((seq(i)._2, z, flag)),
            s"type $t day ${seq(i)._1}")
        }
      }
    }
    assert(got.size === expected)
    // at least one full-baseline day exists per frequent event type
    assert(expected > 0)
  }

  test("q152 windowed funnel equals a driver replay and never beats q73") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val week = 7L * 86400L * 1000000L
    val byUser = ev.groupBy(_._1)
    val want = byUser.view.mapValues { rows =>
      val t1 = rows.filter(_._2 == "view").map(_._3).minOption
      val t2 = t1.flatMap(a => rows.filter(r => r._2 == "click" && r._3 > a && r._3 <= a + week)
        .map(_._3).minOption)
      val t3 = t2.flatMap(b => rows.filter(r => r._2 == "purchase" && r._3 > b && r._3 <= b + week)
        .map(_._3).minOption)
      (t1, t2, t3)
    }.toMap
    val got = SparkEntry.queries("q152_windowed_funnel")(spark, sfDir).collect()
      .map { r =>
        def us(i: Int): Option[Long] = Option(r.get(i))
          .map(_.asInstanceOf[java.sql.Timestamp].toInstant)
          .map(t => t.getEpochSecond * 1000000L + t.getNano / 1000L)
        r.getLong(0) -> ((us(1), us(2), us(3), r.getInt(4)))
      }.toMap
    assert(got.keySet === want.keySet)
    val unbounded = SparkEntry.queries("q73_funnel")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getInt(4)).toMap
    want.foreach { case (u, (t1, t2, t3)) =>
      val stage = if (t3.isDefined) 3 else if (t2.isDefined) 2 else if (t1.isDefined) 1 else 0
      assert(got(u) === ((t1, t2, t3, stage)), s"user $u")
      assert(stage <= unbounded(u), s"window must only remove conversions: $u")
    }
    assert(got.values.map(_._4).toSet.size > 1, "stages must discriminate")
  }

  test("q153 RFM equals a driver ntile recompute") {
    val p = Tables.events(spark, sfDir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val horizon = p.map(_._2).max
    val rfm = p.groupBy(_._1).map { case (u, rows) =>
      (u, horizon - rows.map(_._2).max, rows.size.toLong, rows.map(_._3).sum)
    }.toSeq
    def ntile5(ordered: Seq[Long]): Map[Long, Int] = {
      val n = ordered.size
      ordered.zipWithIndex.map { case (u, i) =>
        // SQL NTILE: first (n mod 5) buckets get one extra row
        val base = n / 5; val extra = n % 5
        val bucket =
          if (i < (base + 1) * extra) i / (base + 1) else extra + (i - (base + 1) * extra) / base
        u -> (bucket + 1)
      }.toMap
    }
    val r = ntile5(rfm.sortBy(x => (x._2, x._1)).map(_._1)).view.mapValues(6 - _).toMap
    val f = ntile5(rfm.sortBy(x => (x._3, x._1)).map(_._1))
    val m = ntile5(rfm.sortBy(x => (x._4, x._1)).map(_._1))
    val got = SparkEntry.queries("q153_rfm_segments")(spark, sfDir).collect()
      .map(row => row.getLong(0) ->
        ((row.getInt(4), row.getInt(5), row.getInt(6), row.getString(7)))).toMap
    assert(got.size === rfm.size)
    rfm.foreach { case (u, _, _, _) =>
      assert(got(u) === ((r(u), f(u), m(u), s"R${r(u)}F${f(u)}M${m(u)}")), s"user $u")
    }
  }

  test("q167 exact EWMA equals the scaled closed form and tracks the recurrence") {
    val got = SparkEntry.queries("q167_exact_ewma")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val daily = Tables.events(spark, sfDir)
      .groupBy(col("event_type"), expr("unix_micros(ts) DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("x")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    daily.foreach { case (t, rows) =>
      val seq = rows.sortBy(_._2)
      var sScaled = BigInt(0)
      seq.zipWithIndex.foreach { case ((_, day, x), i) =>
        val rn = i + 1
        sScaled += (if (rn == 1) BigInt(x) else BigInt(x) << (rn - 2))
        val ewma = sScaled.toLong.toDouble / (1L << (rn - 1)).toDouble
        assert(got((t, day)) === ((x, rn.toLong, sScaled.toLong, ewma)), s"$t day $day")
        // the scaled form IS the recurrence: s_t = (x_t + s_{t-1}) / 2
        val rec = seq.take(rn).map(_._3.toDouble)
          .reduceLeft((s2, xt) => (xt + s2) / 2.0)
        assert(math.abs(ewma - rec) < 1e-9, s"recurrence drift $t day $day")
      }
    }
  }

  test("q173 Spearman OOO audit equals a driver rank recompute; identity law") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = SparkEntry.queries("q173_ooo_spearman")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    ev.groupBy(_._1).filter(_._2.length >= 2).foreach { case (u, rows) =>
      val byArr = rows.sortBy(_._2).map(_._2).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
      val byTime = rows.sortBy(r => (r._3, r._2)).map(_._2).zipWithIndex
        .map { case (id, i) => id -> (i + 1L) }.toMap
      val n = rows.length.toLong
      val sd2 = rows.map(r => { val d = byArr(r._2) - byTime(r._2); d * d }).sum
      val rho = 1.0 - (6L * sd2).toDouble / (n * (n * n - 1)).toDouble
      assert(got(u) === ((n, sd2, rho)), s"user $u")
    }
    // identity law: ranking a perfectly ordered stream gives rho = 1
    val sortedUser = ev.groupBy(_._1).values.head.sortBy(_._2)
    val isMonotone = sortedUser.sliding(2).forall(p => p.head._3 <= p.last._3)
    if (isMonotone) assert(got(sortedUser.head._1)._3 === 1.0)
  }

  test("q161 sequence funnels equal a driver earliest-transition replay") {
    val ev = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val types = ev.map(_._2).distinct.sorted
    val byUser = ev.groupBy(_._1)
    val want = scala.collection.mutable.Map.empty[(String, String, String), Long]
      .withDefaultValue(0L)
    byUser.values.foreach { rows =>
      for (a <- types; b <- types; c <- types) {
        val t1 = rows.filter(_._2 == a).map(_._3).minOption
        val t2 = t1.flatMap(x => rows.filter(r => r._2 == b && r._3 > x).map(_._3).minOption)
        val t3 = t2.flatMap(x => rows.filter(r => r._2 == c && r._3 > x).map(_._3).minOption)
        if (t3.isDefined) want((a, b, c)) += 1
      }
    }
    val got = SparkEntry.queries("q161_sequence_funnels")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)) -> r.getLong(3)).toMap
    assert(got === want.toMap)
    // completing a->b->c requires having all three stages reachable: bound
    // by the 2-step funnel count
    val twoStep = got.keys.map { case (a, b, _) => (a, b) }.toSet
    twoStep.foreach { case (a, b) =>
      val m2 = byUser.values.count { rows =>
        val t1 = rows.filter(_._2 == a).map(_._3).minOption
        t1.exists(x => rows.exists(r => r._2 == b && r._3 > x))
      }
      types.foreach(c => assert(got.getOrElse((a, b, c), 0L) <= m2))
    }
  }

  test("q143 cross-correlation equals a driver recompute; argmax unique") {
    val got = SparkEntry.queries("q143_xcorr_lag")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(got.size === 15)
    val days = Tables.events(spark, sfDir)
      .filter(col("event_type").isin("click", "purchase"))
      .select(expr("unix_micros(ts) DIV 86400000000").as("day"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val c = days.filter(_._2 == "click").groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val p = days.filter(_._2 == "purchase").groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val want = (-7L to 7L).map { l =>
      l -> c.keys.toSeq.map(d => c(d) * p.getOrElse(d + l, 0L)).sum
    }.toMap
    (-7L to 7L).foreach(l => assert(got(l)._1 === want(l), s"lag $l"))
    val best = want.toSeq.sortBy { case (l, sc) => (-sc, l) }.head._1
    assert(got(best)._2 && got.count(_._2._2) === 1)
  }

  test("q188 Fano factor equals a driver minute-bucket recompute") {
    val ev = Tables.events(spark, sfDir).select("event_type", "ts").collect()
      .map(r => (r.getString(0), r.getTimestamp(1).getTime * 1000L +
        r.getTimestamp(1).getNanos / 1000 % 1000))
    val byType = ev.groupBy(_._1)
    val rows = SparkEntry.queries("q188_fano_burstiness")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(rows.keySet === byType.keySet)
    byType.foreach { case (t, es) =>
      val mins = es.map(_._2 / 60000000L)
      val counts = mins.groupBy(identity).view.mapValues(_.length.toLong).toMap
      val n = es.length.toLong
      val b = mins.max - mins.min + 1
      val s2 = counts.values.map(c => c * c).sum
      val r = rows(t)
      assert((r.getLong(1), r.getLong(2), r.getLong(3)) ===
        ((n, b, counts.size.toLong)), t)
      assert(r.getDouble(4) === n.toDouble / b.toDouble, t)
      assert(r.getDouble(5) === (b * s2 - n * n).toDouble / (b * n).toDouble, t)
      assert(r.getDouble(5) >= 0.0, t) // dispersion index is non-negative
    }
  }

  test("q194 lateness profile: planted out-of-order stream + real-data identity") {
    import spark.implicits._
    // planted: type A arrives in order except one event 130s late and one
    // 5s late; type B fully in order
    val ev = Seq(
      ("A", 1L, 0L), ("A", 2L, 10_000_000L), ("A", 3L, 5_000_000L),
      ("A", 4L, 20_000_000L), ("A", 5L, 20_000_000L - 130_000_000L),
      ("B", 1L, 0L), ("B", 2L, 1_000_000L))
      .toDF("event_type", "event_id", "us")
    val got = ops.EventOps.latenessProfileOf(ev).collect()
      .map(r => (r.getString(0), r.getLong(1)) -> r).toMap
    // A: lateness 0,0,5,0,130 -> buckets binlen(0)=1 (x3), binlen(5)=3,
    // binlen(130)=8
    assert(got.keySet === Set(("A", 1L), ("A", 3L), ("A", 8L), ("B", 1L)))
    assert(got(("A", 1L)).getLong(3) === 3L)
    assert(got(("A", 3L)).getLong(3) === 1L &&
      got(("A", 3L)).getLong(4) === 5L)       // max lateness in bucket
    assert(got(("A", 8L)).getLong(3) === 1L &&
      got(("A", 8L)).getLong(4) === 130L)
    assert(got(("A", 8L)).getDouble(6) === 1.0) // last bucket covers all
    assert(got(("A", 3L)).getDouble(6) === 4.0 / 5.0)
    assert(got(("A", 1L)).getLong(2) === 1L)    // bucket cap 2^1-1
    assert(got(("A", 8L)).getLong(2) === 255L)  // bucket cap 2^8-1
    assert(got(("B", 1L)).getDouble(6) === 1.0)
    // real data arrives in order -> the registered query must say a zero
    // watermark retains everything (cum_frac 1.0 in the <=1s bucket)
    val real = SparkEntry.queries("q194_lateness_profile")(spark, sfDir).collect()
    assert(real.forall(r => r.getLong(1) === 1L && r.getDouble(6) === 1.0))
  }
}
