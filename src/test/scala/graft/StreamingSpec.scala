package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("streaming dedup converges to exactly the batch q13 aggregate") {
    val streaming = SparkEntry.queries("q59_streaming_dedup")(spark, sfDir)
      .select("content_hash", "canonical_doc_id", "dup_count")
    val batch = SparkEntry.queries("q13_dedup_exact")(spark, sfDir)
      .select("content_hash", "canonical_doc_id", "dup_count")
    assert(streaming.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streaming).count() === 0)
  }

  test("streaming hopping windows converge to exactly the batch q81 grid") {
    val streaming = SparkEntry.queries("q94_streaming_hopping")(spark, sfDir)
    val batch = SparkEntry.queries("q81_hopping_window")(spark, sfDir)
    assert(streaming.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streaming).count() === 0)
  }

  test("streaming interval join emits exactly the batch range join") {
    val streaming = SparkEntry.queries("q101_streaming_interval_join")(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 HOURS"))
      .select(col("click_id"), col("purchase_id"), col("user_id"),
        col("click_ts"), col("purchase_ts"), col("purchase_value"))
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streaming).count() === 0)
  }

  test("streaming left-outer interval join equals the batch left join, unmatched included") {
    val streaming = SparkEntry.queries("q123_streaming_outer_join")(spark, sfDir)
    val ev = Tables.events(spark, sfDir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("purchase_ts"), col("value").as("purchase_value"))
    val batch = clicks.join(purchases,
        col("user_id") === col("p_user") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 2 HOURS"),
        "left")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        when(col("purchase_id").isNull, 0).otherwise(1).as("matched"),
        coalesce(col("purchase_id"), lit(-1L)).as("purchase_id"),
        coalesce(col("purchase_ts"), to_timestamp(lit("1970-01-01 00:00:00"))
          .cast(ev.schema("ts").dataType)).as("purchase_ts"),
        coalesce(col("purchase_value"), lit(-1.0d)).as("purchase_value"))
    // the unmatched path — the rows only watermark eviction can emit — must
    // actually be exercised, including clicks at the very END of the corpus
    // horizon (flushable only because the sentinels carry the watermark past
    // it); no sentinel may leak into the output
    assert(streaming.filter(col("matched") === 0).count() > 0)
    assert(streaming.filter(col("click_id") < 0 || col("user_id") < 0).count() === 0)
    val maxClick = clicks.agg(max("click_ts")).head().get(0)
    val lastReal = batch.filter(col("click_ts") === lit(maxClick)).count()
    assert(streaming.filter(col("click_ts") === lit(maxClick)).count() === lastReal)
    assert(streaming.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streaming).count() === 0)
  }

  test("q129 upsert compaction equals the batch aggregate over a real multi-batch history") {
    val got = SparkEntry.queries("q129_streaming_upsert")(spark, sfDir)
    val batch = Tables.events(spark, sfDir).groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).as("value_cents"),
        max(col("ts")).as("last_ts"))
    assert(got.count() > 0)
    assert(got.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(got).count() === 0)
    // the changelog really spans micro-batches, and some key was genuinely
    // UPDATED (emitted in more than one batch) — the path a single-batch
    // drive would never exercise
    val log = streaming.StreamingSessions.upsertLog(spark, sfDir)
    assert(log.select("batch_id").distinct().count() > 1)
    val updated = log.groupBy("user_id").count().filter(col("count") > 1).count()
    assert(updated > 0, "no key was updated across batches")
  }

  test("streaming enrich join equals the batch join + tumbling aggregate") {
    val streaming = SparkEntry.queries("q118_streaming_enrich")(spark, sfDir)
    val dim = Tables.customer(spark, sfDir)
      .select(col("c_custkey").as("user_id"), col("c_mktsegment").as("segment"))
    val batch = Tables.events(spark, sfDir)
      .join(dim, Seq("user_id"), "left")
      .groupBy(window(col("ts"), "6 hours").as("w"),
        coalesce(col("segment"), lit("unknown")).as("segment"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("seg_value"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("segment"), col("n_events"), col("seg_value"))
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streaming).count() === 0)
  }

  test("streaming session_window produces the same sessions as batch q06") {
    val streaming = SparkEntry.queries("q31_streaming_sessions")(spark, sfDir)
    val batch = SparkEntry.queries("q06_sessionization")(spark, sfDir)
    assert(streaming.count() === batch.count())
    // per-user session counts agree
    val s = streaming.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = batch.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(s === b)
    // event totals agree
    val se = streaming.agg(sum("events_n")).head().getLong(0)
    val be = batch.agg(sum("events_n")).head().getLong(0)
    assert(se === be)
  }

  test("flatMapGroupsWithState matches session_window on closeable sessions") {
    // running q31 first stages the events symlink dir the stateful stream
    // reads (staging happens before its artifact-cache check, so this holds
    // even on a warm artifact)
    val sw = SparkEntry.queries("q31_streaming_sessions")(spark, sfDir)
    val tag = sfDir.replaceAll("[^a-zA-Z0-9.]", "_")
    val stageDir = s"/root/repo/target/graft_stream/sessions/$tag"
    val q = graft.streaming.StreamingSessions.statefulSessions(spark, stageDir)
      .writeStream.format("memory").queryName("graft_stateful").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val stateful = spark.table("graft_stateful").cache()
    stateful.count()
    // expected emissions: exactly the sessions whose gap deadline
    // (= session_window end = last event + 30 min) the final watermark
    // (max ts - 1h) passed — session_window's own close rule. Sessions the
    // watermark has not sealed correctly stay in state.
    val maxTsUs = Tables.events(spark, sfDir)
      .agg(max(unix_micros(col("ts")))).head().getLong(0)
    val wmUs = maxTsUs - 3600L * 1000000L
    val swN = sw.select(col("user_id"),
      unix_micros(col("session_start_ts")).as("start_us"),
      unix_micros(col("session_end_ts")).as("end_us"),
      col("events_n"))
    val expected = swN.filter(col("end_us") <= wmUs)
      .select(col("user_id"), col("start_us"), col("events_n"))
    val got = stateful.select(col("user_id"),
      col("session_start_us").as("start_us"), col("events_n"))
    assert(got.count() === expected.count())
    assert(got.except(expected).count() === 0)
    assert(expected.except(got).count() === 0)
  }

  test("stateful session spanning two micro-batches is emitted once, unsplit") {
    import spark.implicits._
    val dir = "/root/repo/target/graft_stream_split"
    val fs = new java.io.File(dir)
    if (fs.exists()) fs.listFiles().foreach(f => {
      if (f.isDirectory) f.listFiles().foreach(_.delete()); f.delete()
    })
    fs.mkdirs()
    val t0 = 1700000000L * 1000000000L // ns
    def m(n: Long) = n * 60L * 1000000000L
    def write(name: String, rows: Seq[(Long, Long, Long)], mtime: Long): Unit = {
      val tmp = s"$dir/_tmp_$name"
      rows.toDF("event_id", "ts", "user_id")
        .withColumn("event_type", lit("click"))
        .withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/$name")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
    }
    // user 1's session spans the file boundary (all gaps < 30 min);
    // user 99's far-future event pushes the watermark so the merged session's
    // timeout fires during processAllAvailable
    write("a.parquet", Seq((1L, t0, 1L), (2L, t0 + m(10), 1L)), 1000000L)
    write("b.parquet", Seq((3L, t0 + m(25), 1L), (4L, t0 + m(50), 1L),
      (5L, t0 + m(600), 99L)), 2000000L)
    val q = graft.streaming.StreamingSessions
      .statefulSessions(spark, dir, Map("maxFilesPerTrigger" -> "1"))
      .writeStream.format("memory").queryName("graft_split").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("graft_split").cache()
    out.count()
    // exactly one session for user 1, spanning both batches, all 4 events
    val u1 = out.filter(col("user_id") === 1L).collect()
    assert(u1.length === 1, s"session was split: ${u1.mkString(";")}")
    assert(u1.head.getAs[Long]("session_start_us") === t0 / 1000L)
    assert(u1.head.getAs[Long]("session_end_us") === (t0 + m(50)) / 1000L)
    assert(u1.head.getAs[Long]("events_n") === 4L)
    // user 99's session is still open (watermark has not passed it) → held
    assert(out.filter(col("user_id") === 99L).count() === 0)
  }

  test("stateful sessions handle late events: backward extension and separate late session") {
    import spark.implicits._
    val dir = "/root/repo/target/graft_stream_late"
    val fs = new java.io.File(dir)
    if (fs.exists()) fs.listFiles().foreach(f => {
      if (f.isDirectory) f.listFiles().foreach(_.delete()); f.delete()
    })
    fs.mkdirs()
    val t0 = 1700000000L * 1000000000L // ns — "12:00"
    def m(n: Long) = n * 60L * 1000000000L
    def write(name: String, rows: Seq[(Long, Long, Long)], mtime: Long): Unit = {
      val tmp = s"$dir/_tmp_$name"
      rows.toDF("event_id", "ts", "user_id")
        .withColumn("event_type", lit("click"))
        .withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/$name")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
    }
    // batch 1: 12:00 and 12:10. batch 2 delivers two admissible late events
    // (watermark after batch 1 is 11:10): 11:55 is within the gap of the held
    // session -> must extend its START backwards; 11:15 is 40 min before
    // 11:55 -> must become its own separate session, not merge (the old fold
    // merged ANY earlier event via the negative-gap branch)
    write("a.parquet", Seq((1L, t0, 1L), (2L, t0 + m(10), 1L)), 1000000L)
    write("b.parquet", Seq((3L, t0 - m(45), 1L), (4L, t0 - m(5), 1L),
      (5L, t0 + m(600), 99L)), 2000000L)
    val q = graft.streaming.StreamingSessions
      .statefulSessions(spark, dir, Map("maxFilesPerTrigger" -> "1"))
      .writeStream.format("memory").queryName("graft_late").outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("graft_late").cache()
    out.count()
    val u1 = out.filter(col("user_id") === 1L)
      .orderBy("session_start_us").collect()
    assert(u1.length === 2, s"expected 2 sessions, got: ${u1.mkString(";")}")
    assert(u1(0).getAs[Long]("session_start_us") === (t0 - m(45)) / 1000L)
    assert(u1(0).getAs[Long]("events_n") === 1L)
    assert(u1(1).getAs[Long]("session_start_us") === (t0 - m(5)) / 1000L)
    assert(u1(1).getAs[Long]("session_end_us") === (t0 + m(10)) / 1000L)
    assert(u1(1).getAs[Long]("events_n") === 3L)
  }

  test("streaming quota equals the batch row_number formulation") {
    import org.apache.spark.sql.expressions.Window
    val streaming = SparkEntry.queries("q112_streaming_quota")(spark, sfDir)
    val batch = Tables.events(spark, sfDir)
      .select(col("user_id"), to_date(col("ts")).as("day"), col("ts"),
        col("event_type"), col("value"))
      .withColumn("rank_in_quota", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id", "day")
          .orderBy("ts", "event_type", "value")).cast("long"))
      .filter(col("rank_in_quota") <= 3)
    assert(streaming.count() > 0)
    assert(streaming.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streaming).count() === 0)
  }

  test("quota admission is first-come-first-served across micro-batches") {
    import spark.implicits._
    val dir = "/root/repo/target/graft_stream_quota"
    val fs = new java.io.File(dir)
    if (fs.exists()) fs.listFiles().foreach(f => {
      if (f.isDirectory) f.listFiles().foreach(_.delete()); f.delete()
    })
    fs.mkdirs()
    val t0 = 1700006400L * 1000000000L // ns, 02:00 UTC — all one UTC day
    def m(n: Long) = n * 60L * 1000000000L
    def write(name: String, rows: Seq[(Long, Long, Long)], mtime: Long): Unit = {
      val tmp = s"$dir/_tmp_$name"
      rows.toDF("event_id", "ts", "user_id")
        .withColumn("event_type", lit("click"))
        .withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/$name")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
    }
    // batch a: user 1's two LATER events arrive first and take ranks 1-2;
    // batch b: two EARLIER events arrive afterwards, still admissible (wm
    // after batch a is t0+50m-1h < t0) — greedy FCFS admits only ONE of
    // them (rank 3), by ts order the earliest
    write("a.parquet", Seq((1L, t0 + m(40), 1L), (2L, t0 + m(50), 1L)), 1000000L)
    write("b.parquet", Seq((3L, t0, 1L), (4L, t0 + m(10), 1L)), 2000000L)
    val q = graft.streaming.StreamingSessions
      .statefulQuota(spark, dir, 3, Map("maxFilesPerTrigger" -> "1"))
      .writeStream.format("memory").queryName("graft_quota")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("graft_quota")
      .select(unix_micros(col("ts")).as("ts_us"), col("rank_in_quota")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val us = (n: Long) => (t0 + m(n)) / 1000L
    assert(out === Set((us(40), 1L), (us(50), 2L), (us(0), 3L)),
      s"got $out")
  }

  test("q132 watermark dedup equals batch DISTINCT keys over the real corpus") {
    val got = SparkEntry.queries("q132_streaming_wm_dedup")(spark, sfDir)
    val gotKeys = got.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString))
    val want = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"), to_date(col("ts")).as("day"))
      .distinct().collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDate(2).toString))
    // set equality AND no duplicate emissions (append stream must emit each
    // key exactly once even though ~20% of keys straddle the 4 micro-batches)
    assert(gotKeys.length === want.length, "duplicate or missing emissions")
    assert(gotKeys.toSet === want.toSet)
  }

  test("q260 streaming ANN probe equals the q19 batch top-k row for row") {
    // The serving contract: every query vector served in its arrival
    // micro-batch through q19's plan must yield exactly the batch answer —
    // the streamed union IS q19 over the same query set (4 real source
    // batches, so at least some queries are served in later batches).
    // (collected compare, not exceptAll: exceptAll between the parquet-backed
    // artifact and q19's windowed plan trips INTERNAL_ERROR_ATTRIBUTE_NOT_
    // FOUND in Spark 4.1's replace-except rewrite; both sides are ≤ top-5 ×
    // |queries| rows, driver-safe by construction)
    def rows(name: String) =
      SparkEntry.queries(name)(spark, sfDir)
        .select("q_id", "neighbor_id", "rank", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._3))
    val streamed = rows("q260_streaming_ann_probe")
    val batch = rows("q19_knn_lsh")
    assert(streamed.length === batch.length)
    assert(streamed.sameElements(batch),
      s"streamed/batch top-k diverge: ${streamed.diff(batch).take(3).mkString("; ")}")
  }

  test("q268 streamed shingle-registry linkage equals the q262 batch scoring") {
    // The registry contract: the streamed (df, maxDf+1-min doc set) state,
    // driven to completion over 4 real micro-batches, re-derives the batch
    // rare-shingle blocking index bit-for-bit, so the shared scoring stages
    // produce q262's exact output. exceptAll both ways = set equality.
    val streamed = SparkEntry.queries("q268_streaming_fs_linkage")(spark, sfDir)
    val batch = SparkEntry.queries("q262_fs_linkage")(spark, sfDir)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
  }

  test("q281 streamed k-means assignment equals the batch assignment row for row") {
    // The router contract: assignment against the driver-held centroid
    // table is row-local, so each vector's (cluster, quantized distance)
    // is identical whether it arrives in batch 0 or batch 3 — the appended
    // union over 4 real micro-batches must equal the batch assignment of
    // the whole corpus through the SAME kmAssign code path.
    val streamed = SparkEntry.queries("q281_streaming_kmeans_assign")(spark, sfDir)
      .select("vec_id", "cluster_id", "mind2q").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val cents = ops.Similarity.kmFit(spark, sfDir)._1
    val batch = ops.Similarity.kmAssign(spark,
        ops.Similarity.kmXqOf(Tables.embeddings(spark, sfDir)), cents)
      .select("vec_id", "cid", "mind2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(streamed.length === batch.length)
    assert(streamed.sameElements(batch))
  }

  test("q289 streamed decontam gate equals batch q286 span for span") {
    // The ingest-gate contract: a document's contamination spans depend
    // only on its own text and the STATIC eval gram set, so the appended
    // union over 4 real micro-batches must equal the batch q286 table.
    // exceptAll both ways = set equality.
    val streamed = SparkEntry.queries("q289_streaming_decontam_gate")(spark, sfDir)
    val batch = SparkEntry.queries("q286_decontam_spans")(spark, sfDir)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    assert(batch.count() > 0, "fixture corpus should contain contamination")
  }

  test("q269 streamed quantile summary equals the batch sample (5th summary)") {
    // Parity by shared stages: the streamed priority_topk summary, driven
    // over 4 real micro-batches, must hold EXACTLY the batch bottom-k by
    // hash, so the shared quantileAuditOf tail reproduces the batch report
    // bit-for-bit. exceptAll both ways = set equality.
    val streamed =
      SparkEntry.queries("q269_streaming_sample_quantiles")(spark, sfDir)
    val batch = ops.Analytics.sqsReport(spark,
      ops.Analytics.sqsSketchOf(spark, ops.Analytics.sqsItemsOf(
        Tables.documents(spark, sfDir))), sfDir)
    assert(streamed.exceptAll(batch).count() === 0)
    assert(batch.exceptAll(streamed).count() === 0)
    // and the estimator is inside its DKW gate on the real corpus
    import org.apache.spark.sql.functions.col
    assert(streamed.filter(col("within_dkw") === 0L).count() === 0)
  }

  test("q132 a key is re-admitted only after its dedup state is evicted") {
    import spark.implicits._
    val dir = "/root/repo/target/graft_stream_wmdedup"
    val fs = new java.io.File(dir)
    if (fs.exists()) fs.listFiles().foreach(f => {
      if (f.isDirectory) f.listFiles().foreach(_.delete()); f.delete()
    })
    fs.mkdirs()
    val t0 = 1700006400L * 1000000000L // ns — 2023-11-15 00:00:00 UTC
    def m(n: Long) = n * 60L * 1000000000L
    def write(name: String, rows: Seq[(Long, Long, Long)], mtime: Long): Unit = {
      val tmp = s"$dir/_tmp_$name"
      rows.toDF("event_id", "ts", "user_id")
        .withColumn("event_type", lit("click"))
        .withColumn("value", lit(1.0))
        .withColumn("props", lit("{}"))
        .coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = new java.io.File(s"$dir/$name")
      java.nio.file.Files.move(part.toPath, dst.toPath)
      dst.setLastModified(mtime)
      new java.io.File(tmp).listFiles().foreach(_.delete())
      new java.io.File(tmp).delete()
    }
    // delay 1h. batch a: users 1,2. batch b: user 2 duplicate while its
    // state is still live (suppressed) + user 99 at +10h, which advances the
    // watermark to +9h — past user 1's state expiry (t0 + 1h) → evicted.
    // batch c: user 1 again at +9h30m, same UTC day, above watermark: with
    // state evicted it MUST be re-admitted (the bounded-state trade-off).
    // state cleanup commits with the watermark that was active DURING a
    // batch, so the eviction driven by batch b's +10h row lands at the end
    // of batch b2 — only batch c then sees the store without user 1
    write("a.parquet", Seq((1L, t0, 1L), (2L, t0 + m(5), 2L)), 1000000L)
    write("b.parquet", Seq((3L, t0 + m(10), 2L), (4L, t0 + m(600), 99L)), 2000000L)
    write("b2.parquet", Seq((6L, t0 + m(605), 98L)), 3000000L)
    write("c.parquet", Seq((5L, t0 + m(570), 1L)), 4000000L)
    val q = graft.streaming.StreamingSessions
      .wmDedupStream(spark, dir, "1 hour", Map("maxFilesPerTrigger" -> "1"))
      .writeStream.format("memory").queryName("graft_wmdedup")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("graft_wmdedup").collect()
      .map(r => r.getLong(0)).groupBy(identity).view.mapValues(_.length).toMap
    assert(out === Map(1L -> 2, 2L -> 1, 98L -> 1, 99L -> 1),
      s"expected u1 twice (evicted state), u2 once (live state), got $out")
  }
}
