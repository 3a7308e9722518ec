package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral coverage for the round-17 changes: the k-center-seeded
  * k-means composition (q283 — VERDICT r16 #1, including the SSE
  * improvement it exists for), the ExactSubstr keep-first policy variant
  * (q284 — VERDICT r16 #6, containment + mass conservation against q276),
  * the q274 certificate tie rule (ADVICE r16 medium — the ≥-bound accept
  * retired for strict-> + fresh-window accept; the 260-identical-vectors
  * fixture would spin forever under strict-only and diverge under ≥), the
  * kmFit truncating-division parity on negative shifted coordinates
  * (ADVICE r18: DuckDB integer `//` truncates, it does not floor), the
  * q279 NULL-label tie order, and the q265 empty/single-day contract.
  */
class R17OpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  private def tmpSfDir(embeddings: Option[org.apache.spark.sql.DataFrame] = None,
      documents: Option[org.apache.spark.sql.DataFrame] = None,
      events: Option[org.apache.spark.sql.DataFrame] = None): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r17").toString
    embeddings.foreach(_.write.mode("overwrite").parquet(s"$dir/embeddings.parquet"))
    documents.foreach(_.write.mode("overwrite").parquet(s"$dir/documents.parquet"))
    events.foreach(_.write.mode("overwrite").parquet(s"$dir/events.parquet"))
    dir
  }

  private def embFrame(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    spark.createDataset(rows).toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label").cast("int").as("label"))
  }

  /** Exact quantized SSE of a published fit (cluster_id, d, centroid_q,
    * size_n) against the embeddings under `dir` — the q277/q279 integer
    * arithmetic replayed in test code: xq = floor(x·10⁶) (the kmShift
    * cancels in every difference), per-vector argmin over centroids. */
  private def sseOf(dir: String, fit: org.apache.spark.sql.DataFrame): Long = {
    val cents = fit.collect()
      .groupBy(_.getLong(0))
      .map { case (cid, rs) =>
        cid -> rs.sortBy(_.getLong(1)).map(_.getLong(2))
      }.toSeq.sortBy(_._1).map(_._2)
    val vecs = Tables.embeddings(spark, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))"))
      .collect().map(_.getSeq[Double](1))
    vecs.map { v =>
      val xq = v.map(x => math.floor(x * 1000000L).toLong)
      cents.map { c =>
        var acc = 0L; var d = 0
        while (d < 64) { val t = xq(d) - c(d); acc += t * t; d += 1 }
        acc
      }.min
    }.sum
  }

  test("q283 spread seeding does not lose to q277 id seeding on the real corpus") {
    // the inequality the composition exists for (VERDICT r16 #1): at
    // sf0.1 — the bench corpus — the k-center-seeded fit's SSE is
    // strictly below the id-seeded one's (measured 1.9029e15 vs
    // 1.9044e15 at landing; at sf0.01 the two are within 0.02% of each
    // other, which is why this pins the sf where the drop is real)
    val dir = "/root/testdata/sf0.1"
    val sse277 = sseOf(dir, SparkEntry.queries("q277_kmeans_centroids")(spark, dir))
    val sse283 = sseOf(dir, SparkEntry.queries("q283_kmeans_kcenter_seeded")(spark, dir))
    assert(sse283 < sse277,
      s"kcenter-seeded SSE $sse283 did not improve on id-seeded $sse277")
  }

  test("q283 recovers the pathological id-seeding case q277 cannot") {
    // ids 1..8 IDENTICAL at the origin: q277 seeds all 8 clusters there,
    // every argmin ties to cid 0, clusters 1..7 stay empty forever and
    // the whole corpus collapses into one cell — Lloyd CANNOT recover
    // from coincident seeds. 7 far points + the origin = exactly K
    // distinct locations, so the spread seeder covers them ALL and its
    // SSE is exactly zero where the id-seeded fit keeps the full
    // single-cell variance.
    val far = (0 until 7).map(a =>
      (9L + a, Seq.tabulate(64)(d => if (d == a) 100f else 0f), a))
    val e = embFrame((1L to 8L).map(i => (i, Seq.fill(64)(0f), 0)) ++ far)
    val dir = tmpSfDir(embeddings = Some(e))
    val sse277 = sseOf(dir, SparkEntry.queries("q277_kmeans_centroids")(spark, dir))
    val sse283 = sseOf(dir, SparkEntry.queries("q283_kmeans_kcenter_seeded")(spark, dir))
    assert(sse283 === 0L,
      s"spread seeding must cover K distinct locations exactly, got $sse283")
    assert(sse277 > 0L, "id seeding must be unable to recover here")
  }

  test("q274 terminates and stays exact when >window rows tie at the bound") {
    // 260 identical far vectors overflow the 256-row candidate window
    // with ONE quantized distance: the M-th fetched value EQUALS every
    // candidate's distance, so a strict-bound-only certificate would
    // refetch forever and the old >=-bound accept could diverge from the
    // oracle's (mind2q DESC, vec_id ASC) argmax on subtler ties. The
    // fresh-window accept must pick vec 2 (fetch-ordered argmax), then
    // exhaustion stops the selection at 2 rounds.
    val e = embFrame((1L, Seq.fill(64)(0f), 0) +:
      (2L to 261L).map(i => (i, Seq.fill(64)(1f), 1)))
    val dir = tmpSfDir(embeddings = Some(e))
    val out = SparkEntry.queries("q274_kcenter_coreset")(spark, dir)
      .orderBy("round").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1))).toSeq
      === Seq((0L, 1L), (1L, 2L)))
  }

  test("kmFit centroid division truncates (= DuckDB integer //) on " +
      "negative shifted coordinates") {
    // components < −1 push the shifted xq negative. ADVICE r17 corrected
    // ADVICE r16: DuckDB 1.0.0's `//` on BIGINT/HUGEINT TRUNCATES toward
    // zero (-7//2 = -3; it floors only on FLOAT/DOUBLE), so the oracle's
    // SUM(x)//count(1) is truncating division and the Spark side must be
    // plain Long '/', not floorDiv. v8/v9 land in one cluster whose
    // dim-0 sum is odd and negative — exactly where the two disagree —
    // and the centroid must be the TRUNCATED value. Cross-checked r18
    // against DuckDB 1.0.0 executing the verbatim q277 oracle SQL on this
    // exact fixture parquet: the oracle's cluster-7 d-0 centroid_q is
    // -3000000 (truncation), NOT floorDiv's -3000001 (BENCH_NOTES r18).
    val e = embFrame((1L to 7L).map(i =>
      (i, Seq.tabulate(64)(d => if (d == 0) 10f * i else 0f), 0)) ++
      Seq((8L, Seq.tabulate(64)(d => if (d == 0) -3.0f else 0f), 0),
        (9L, Seq.tabulate(64)(d => if (d == 0) -3.000001f else 0f), 7)))
    val dir = tmpSfDir(embeddings = Some(e))
    val xq8 = math.floor(-3.0f.toDouble * 1e6).toLong
    val xq9 = math.floor(-3.000001f.toDouble * 1e6).toLong
    assert((xq8 + xq9) % 2 != 0 && xq8 + xq9 < 0,
      "fixture must exercise an odd negative sum")
    val expected = (xq8 + xq9) / 2
    assert(expected !== Math.floorDiv(xq8 + xq9, 2),
      "truncation must differ from floorDiv here")
    val got = SparkEntry.queries("q277_kmeans_centroids")(spark, dir)
      .filter(col("cluster_id") === 7 && col("d") === 0)
      .collect().head.getLong(2)
    assert(got === expected)
  }

  test("q279 count-tie with a NULL label picks the non-null label (nulls last)") {
    // cluster 7 holds v8 (label NULL) and v9 (label 7): a 1-1 count tie.
    // DuckDB's ORDER BY label defaults NULLS LAST; the Spark window must
    // match (ADVICE r16: plain asc sorts nulls FIRST and would emit NULL).
    val base = embFrame((1L to 7L).map(i =>
      (i, Seq.tabulate(64)(d => if (d == 0) 10f * i else 0f), 0)) ++
      Seq((8L, Seq.tabulate(64)(d => if (d == 0) -3.0f else 0f), 0),
        (9L, Seq.tabulate(64)(d => if (d == 0) -3.000001f else 0f), 7)))
      .withColumn("label",
        when(col("vec_id") === 8L, lit(null)).otherwise(col("label"))
          .cast("int"))
    val dir = tmpSfDir(embeddings = Some(base))
    val row = SparkEntry.queries("q279_cluster_quality")(spark, dir)
      .filter(col("cluster_id") === 7).collect().head
    assert(!row.isNullAt(3) && row.getLong(3) === 7L)
    assert(row.getLong(4) === 1L)
  }

  test("q284 keep-first spans sit inside q276 spans with no more mass") {
    val dir = sfDir
    def spans(q: String): Map[Long, Seq[(Long, Long)]] =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        .groupBy(_._1).map { case (d, a) => d -> a.map(_._2).toSeq }.toMap
    val all = spans("q276_exactsubstr_spans")
    val kf = spans("q284_exactsubstr_keepfirst")
    // containment: every keep-first span lies inside some delete-all span
    // of the same doc (marked₍₂₈₄₎ ⊆ marked₍₂₇₆₎ lifts to token coverage)
    kf.foreach { case (doc, ss) =>
      val sup = all.getOrElse(doc, Nil)
      ss.foreach { case (s0, s1) =>
        assert(sup.exists { case (a0, a1) => a0 <= s0 && s1 <= a1 },
          s"doc $doc span [$s0,$s1) escapes the q276 coverage")
      }
    }
    // mass: the keep-first policy never removes more than delete-all
    val m276 = all.values.flatten.map { case (a, b) => b - a }.sum
    val m284 = kf.values.flatten.map { case (a, b) => b - a }.sum
    assert(m284 <= m276 && m284 > 0)
  }

  test("q284 exempts exactly the min-(doc_id,pos) copy of a duplicated doc pair") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq((5L, shared), (9L, shared), (7L, "completely different words"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpSfDir(documents = Some(docs))
    val all = SparkEntry.queries("q276_exactsubstr_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // delete-all marks BOTH copies end to end
    assert(all.map(_._1).toSet === Set(5L, 9L))
    assert(all.forall { case (_, s0, s1) => s0 === 0L && s1 === 20L })
    val kf = SparkEntry.queries("q284_exactsubstr_keepfirst")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // keep-first exempts doc 5 (the smaller doc_id) entirely
    assert(kf.toSeq === Seq((9L, 0L, 20L)))
  }

  test("q285 keep-first rewrite removes exactly q284's mass, never more than q282") {
    val dir = sfDir
    def removed(q: String): Long =
      SparkEntry.queries(q)(spark, dir).collect()
        .map(r => r.getLong(1) - r.getLong(2)).sum
    val spanMass284 = SparkEntry.queries("q284_exactsubstr_keepfirst")(spark, dir)
      .collect().map(_.getLong(3)).sum
    val rem285 = removed("q285_exactsubstr_keepfirst_clean")
    // disjoint maximal spans ⇒ removed mass IS the span mass; and the
    // keep-first policy can never excise more than delete-all does
    assert(rem285 === spanMass284)
    assert(rem285 <= removed("q282_exactsubstr_clean"))
    assert(rem285 > 0L)
  }

  test("q285 keeps the min-doc_id copy of an identical pair byte-identical") {
    import spark.implicits._
    val shared = (1 to 20).map(i => s"tok$i").mkString(" ")
    val docs = Seq((5L, shared), (9L, shared), (7L, "completely different words"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpSfDir(documents = Some(docs))
    val out = SparkEntry.queries("q285_exactsubstr_keepfirst_clean")(spark, dir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3))))
      .toMap
    assert(out(5L) === ((20L, 20L, shared))) // first occurrence survives intact
    assert(out(9L) === ((20L, 0L, "")))      // later copy fully excised
    assert(out(7L)._1 === out(7L)._2)        // untouched doc round-trips
    // contrast with delete-all: q282 empties BOTH copies
    val da = SparkEntry.queries("q282_exactsubstr_clean")(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(da(5L) === 0L && da(9L) === 0L)
  }

  test("q286/q287 excise exactly the eval-overlapping span from a planted train doc") {
    import spark.implicits._
    // doc 20 is EVAL (doc_id % 20 == 0); doc 21 embeds 15 of its tokens
    // (one maximal contaminated span); doc 23 shares nothing
    val evalTokens = (1 to 15).map(i => s"ev$i")
    val evalDoc = ("pre " * 0) + evalTokens.mkString(" ") + " post extra tail"
    val trainHit = "lead in words " + evalTokens.mkString(" ") + " trailing clean words"
    val docs = Seq((20L, evalDoc), (21L, trainHit),
      (23L, (1 to 20).map(i => s"u$i").mkString(" ")))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpSfDir(documents = Some(docs))
    val spans = SparkEntry.queries("q286_decontam_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // only the train doc is spanned, exactly over the 15 planted tokens
    // (positions 3..17 inside trainHit)
    assert(spans.toSeq === Seq((21L, 3L, 18L)))
    val out = SparkEntry.queries("q287_decontam_clean")(spark, dir)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(!out.contains(20L)) // eval docs are not part of the train corpus
    assert(out(21L)._2 === out(21L)._1 - 15L)
    assert(out(21L)._3 === "lead in words trailing clean words")
    assert(out(23L)._1 === out(23L)._2) // untouched train doc round-trips
  }

  test("q287 removed mass equals q286's span mass on the real corpus") {
    val dir = sfDir
    val spanMass = SparkEntry.queries("q286_decontam_spans")(spark, dir)
      .collect().map(_.getLong(3)).sum
    val removed = SparkEntry.queries("q287_decontam_clean")(spark, dir)
      .collect().map(r => r.getLong(1) - r.getLong(2)).sum
    assert(removed === spanMass)
    assert(spanMass > 0L, "fixture corpus should contain some contamination")
  }

  test("q288 impact report reconciles with q286's span table") {
    val dir = sfDir
    val spans = SparkEntry.queries("q286_decontam_spans")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(3)))
    val imp = SparkEntry.queries("q288_decontam_impact")(spark, dir).collect()
    // contamination mass and hit-doc count roll up exactly
    assert(imp.map(_.getLong(3)).sum === spans.map(_._2).sum)
    assert(imp.map(_.getLong(2)).sum === spans.map(_._1).distinct.length.toLong)
    // the denominator is the TRAIN slice only, and ppm is the exact
    // integer division of the two reported columns
    imp.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2))
      assert(r.getLong(5) === r.getLong(3) * 1000000L / r.getLong(4))
    }
  }

  test("q265 returns an empty frame (not a crash) on empty and single-day events") {
    import spark.implicits._
    val cols = Seq("n_days", "n_pairs", "slope_num", "slope_den", "slope",
      "intercept")
    val empty = Seq.empty[java.sql.Timestamp].toDF("ts")
      .withColumn("event_id", lit(0L)).withColumn("user_id", lit(0L))
    val d1 = tmpSfDir(events = Some(empty))
    val out1 = SparkEntry.queries("q265_theilsen_trend")(spark, d1)
    assert(out1.columns.toSeq === cols && out1.count() === 0L)
    // one day ⇒ zero (di < dj) pairs ⇒ the oracle's med CTE is empty too
    val oneDay = Seq("2024-01-02 03:00:00", "2024-01-02 04:00:00",
      "2024-01-02 05:00:00").map(java.sql.Timestamp.valueOf).toDF("ts")
      .withColumn("event_id", lit(1L)).withColumn("user_id", lit(1L))
    val d2 = tmpSfDir(events = Some(oneDay))
    val out2 = SparkEntry.queries("q265_theilsen_trend")(spark, d2)
    assert(out2.columns.toSeq === cols && out2.count() === 0L)
  }
}
