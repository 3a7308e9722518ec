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
