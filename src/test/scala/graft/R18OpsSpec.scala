package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral coverage for the round-18 changes: the size-guarded
  * eval-key-set broadcasts (VERDICT r17 "what's wrong" #2 — the modeled
  * eval slice is 5% of the corpus, proportional, so the formerly
  * unconditional broadcast() hint was a latent 100 TB driver OOM; the
  * guard must produce IDENTICAL output on both its paths), and the
  * PlanCache keyed-build restructure (ADVICE r17 — expensive collect-driven
  * builders must not run under the global monitor).
  */
class R18OpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  private def tmpSfDir(documents: Option[org.apache.spark.sql.DataFrame] = None,
      embeddings: Option[org.apache.spark.sql.DataFrame] = None): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r18").toString
    documents.foreach(_.write.mode("overwrite").parquet(s"$dir/documents.parquet"))
    embeddings.foreach(_.write.mode("overwrite").parquet(s"$dir/embeddings.parquet"))
    dir
  }

  /** Run `body` with the SizeGuard forced onto its shuffle path — row cap 0
    * AND the auto-broadcast threshold disabled, since at spec scale AQE
    * would otherwise re-broadcast the tiny eval set on its own and the
    * "large eval set" plan would never actually execute. */
  private def forcedShuffle[A](body: => A): A = {
    val prevAuto = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set(ops.SizeGuard.confKey, "0")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try body finally {
      spark.conf.unset(ops.SizeGuard.confKey)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevAuto)
    }
  }

  test("SizeGuard attaches the hint under the cap and withholds it at 0") {
    import spark.implicits._
    val keys = Seq("a", "b", "c").toDF("h")
    def hinted(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.analyzed.collect {
        case h: org.apache.spark.sql.catalyst.plans.logical.ResolvedHint => h
      }.nonEmpty
    assert(hinted(ops.SizeGuard.keySide(keys)), "3 rows must broadcast")
    spark.conf.set(ops.SizeGuard.confKey, "0")
    try assert(!hinted(ops.SizeGuard.keySide(keys)),
      "cap 0 must withhold the hint")
    finally spark.conf.unset(ops.SizeGuard.confKey)
    spark.conf.set(ops.SizeGuard.confKey, "2")
    try assert(!hinted(ops.SizeGuard.keySide(keys)),
      "3 rows past a cap of 2 must withhold the hint")
    finally spark.conf.unset(ops.SizeGuard.confKey)
  }

  test("q286 planted contamination: both guard paths emit the identical span set") {
    import spark.implicits._
    // doc 20 is EVAL (20 % 20 == 0); train doc 3 embeds the same 15-token
    // run (≥ esK=13 ⇒ a detectable span); train doc 7 shares nothing.
    val run = (1 to 15).map(i => s"leak$i").mkString(" ")
    val docs = Seq(
      (20L, run + " evaltail1 evaltail2"),
      (3L, "pre1 pre2 " + run + " post1"),
      (7L, (1 to 30).map(i => s"clean$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpSfDir(documents = Some(docs))
    def spans(): Set[(Long, Long, Long, Long, Long)] =
      SparkEntry.queries("q286_decontam_spans")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    val viaBroadcast = spans()
    val viaShuffle = forcedShuffle(spans())
    assert(viaBroadcast === viaShuffle)
    // the planted leak IS detected: doc 3's run starts at token 2 and the
    // 15-token window contributes 3 gram starts (15 - 13 + 1)
    assert(viaBroadcast === Set((3L, 2L, 17L, 15L, 3L)))
    // and the forced leg really planned a non-broadcast semi join
    val forcedPlan = forcedShuffle {
      val df = SparkEntry.queries("q286_decontam_spans")(spark, dir)
      df.collect()
      df.queryExecution.executedPlan.toString
    }
    assert(!forcedPlan.contains("BroadcastExchange"),
      s"forced path must not broadcast:\n$forcedPlan")
  }

  test("q51 on the real corpus: both guard paths agree row for row") {
    val dir = sfDir
    def rows(): Set[(Long, Long, Int)] =
      SparkEntry.queries("q51_decontaminate")(spark, dir)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val viaBroadcast = rows()
    val viaShuffle = forcedShuffle(rows())
    assert(viaBroadcast === viaShuffle)
    assert(viaBroadcast.nonEmpty)
  }

  test("q290 composes the q57 stages with q287's span rewrite (planted fixture)") {
    import spark.implicits._
    val run = (1 to 15).map(i => s"leak$i").mkString(" ")
    val t1 = "p1 p2 " + run + " q1 q2 q3" // survivor WITH a contaminated span
    val t7 = (1 to 20).map(i => s"w$i").mkString(" ") // clean survivor
    val docs = Seq(
      (20L, run + " ev1 ev2 ev3 ev4 ev5", "en"), // eval slice: gram source
      (1L, t1, "en"),
      (2L, t1, "en"),                            // exact dup of 1 → dedup drop
      (3L, t7.replace("w", "d"), "de"),          // language drop
      (5L, "the a of", "en"),                    // quality drop (score 0)
      (7L, t7, "en"))
      .toDF("doc_id", "text", "lang")
      .withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpSfDir(documents = Some(docs))
    val out = SparkEntry.queries("q290_composed_span_clean")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    // doc 1 survives every filter and loses exactly the 15-token leak span
    // (gram starts 2..4 merge to one island [2, 17)); doc 7 is untouched;
    // 2/3/5 fall to dedup/lang/quality; 20 is the eval slice
    assert(out.keySet === Set(1L, 7L))
    assert(out(1L) === ((20L, 5L, "p1 p2 q1 q2 q3")))
    assert(out(7L) === ((20L, 20L, t7)))
  }

  test("q290 equals q287 restricted to the composed survivor set (real corpus)") {
    val dir = sfDir
    val q290 = SparkEntry.queries("q290_composed_span_clean")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3), r.getString(4)))).toMap
    val q287 = SparkEntry.queries("q287_decontam_clean")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    // every composed row IS the independent q287 rewrite of that doc
    q290.foreach { case (id, row) =>
      assert(q287.get(id).contains(row), s"doc $id diverges from q287")
    }
    // and the survivor set is q57's plus exactly the q51-contaminated docs
    // q57 drops at flag grain (q290 keeps them, span-cleaned instead)
    val q57 = SparkEntry.queries("q57_clean_pipeline")(spark, dir)
      .collect().map(_.getLong(0)).toSet
    val contaminated = SparkEntry.queries("q51_decontaminate")(spark, dir)
      .collect().filter(_.getInt(2) === 1).map(_.getLong(0)).toSet
    assert(q57.subsetOf(q290.keySet))
    assert((q290.keySet -- q57).subsetOf(contaminated),
      "q290-only docs must all be flag-grain contaminated survivors")
  }

  test("q291 SSE is monotone nonincreasing in K and reconciles with q279 at K=8") {
    val dir = sfDir
    val sweep = SparkEntry.queries("q291_kmeans_k_sweep")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(sweep.map(_._1) === Seq(2L, 4L, 8L, 16L))
    sweep.toSeq.sliding(2).foreach {
      case scala.collection.Seq((k1, s1, _), (k2, s2, _)) =>
        assert(s2 <= s1, s"SSE rose from K=$k1 ($s1) to K=$k2 ($s2)")
      case _ =>
    }
    val nVec = Tables.embeddings(spark, dir).count()
    assert(sweep.forall(_._3 == nVec))
    // K=8 rides q277's published fit: the sweep's total must equal the sum
    // of q279's per-cluster SSEs (same fit, same assignment, same integers)
    val q279Total = SparkEntry.queries("q279_cluster_quality")(spark, dir)
      .collect().map(_.getLong(2)).sum
    assert(sweep.find(_._1 == 8L).get._2 === q279Total)
  }

  test("q231 and q215 on the real corpus: both guard paths agree") {
    val dir = sfDir
    def dump(q: String): Set[String] =
      SparkEntry.queries(q)(spark, dir).collect().map(_.toString).toSet
    for (q <- Seq("q231_contam_n_sweep", "q215_eval_leak_surface")) {
      val b = dump(q)
      assert(b === forcedShuffle(dump(q)), s"$q paths diverged")
      assert(b.nonEmpty)
    }
  }
}
