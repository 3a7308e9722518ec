package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral coverage for the round-16 changes: the ADVICE-r15
  * degenerate-case contracts on the greedy selectors (q274 empty/under-K
  * embeddings, q275 coverage exhaustion — both formerly NoSuchElement/NPE
  * crash paths), and the q273 DECIMAL accumulation fix.
  */
class R16OpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import org.apache.spark.sql.functions._

  /** A temp sf-dir holding the given embeddings/documents frames. */
  private def tmpSfDir(embeddings: Option[org.apache.spark.sql.DataFrame],
      documents: Option[org.apache.spark.sql.DataFrame]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_r16").toString
    embeddings.foreach(_.write.mode("overwrite").parquet(s"$dir/embeddings.parquet"))
    documents.foreach(_.write.mode("overwrite").parquet(s"$dir/documents.parquet"))
    dir
  }

  private def embFrame(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    spark.createDataset(rows).toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"),
        col("label").cast("int").as("label"))
  }

  test("q274 returns empty (not NPE) on an empty embeddings table") {
    val dir = tmpSfDir(Some(embFrame(Nil)), None)
    val out = SparkEntry.queries("q274_kcenter_coreset")(spark, dir)
    assert(out.count() === 0L)
  }

  test("q274 stops at the number of DISTINCT points when fewer than K") {
    // 3 distinct vectors, one duplicated: once every point sits at
    // quantized distance 0 from a chosen center the selection stops —
    // output length = distinct centers, no silently duplicated rows
    val e = embFrame(Seq(
      (1L, Seq.fill(64)(0f), 0),
      (2L, Seq.tabulate(64)(i => if (i == 0) 1f else 0f), 0),
      (3L, Seq.tabulate(64)(i => if (i == 1) 2f else 0f), 1),
      (4L, Seq.fill(64)(0f), 0))) // duplicate of vec 1
    val dir = tmpSfDir(Some(e), None)
    val out = SparkEntry.queries("q274_kcenter_coreset")(spark, dir).collect()
    assert(out.length === 3)
    assert(out.map(_.getLong(1)).toSet === Set(1L, 2L, 3L))
    // radii non-increasing, and every non-seed radius positive
    val radii = out.sortBy(_.getLong(0)).map(_.getLong(3))
    assert(radii.drop(1).forall(_ > 0L))
    assert(radii.drop(1).zip(radii.drop(2)).forall { case (a, b) => b <= a })
  }

  test("q275 emits the rounds picked so far when coverage exhausts (no crash)") {
    import spark.implicits._
    // exactly one duplicated 3-gram universe: two docs share all their
    // shingles, every other doc is unique → the rare index covers after
    // ~1-2 picks and later rounds find an empty frame
    val shared = "alpha beta gamma delta epsilon"
    val docs = Seq(
      (1L, shared), (2L, shared),
      (3L, "uno dos tres cuatro"), (4L, "one two three four"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpSfDir(None, Some(docs))
    val out = SparkEntry.queries("q275_maxcover_select")(spark, dir).collect()
    // doc 1 takes all 3 shared shingles; doc 2's remaining postings are
    // then all covered, so round 1's frame is empty and the loop stops
    assert(out.length === 1)
    assert(out.head.getLong(1) === 1L)
    assert(out.head.getLong(2) === 3L)
  }

  test("q275 returns empty on a corpus with no rare shingles") {
    import spark.implicits._
    val docs = Seq((1L, "all words here unique"), (2L, "nothing shared at all"))
      .toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("t"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val dir = tmpSfDir(None, Some(docs))
    assert(SparkEntry.queries("q275_maxcover_select")(spark, dir).count() === 0L)
  }

  test("q277 k-means: cluster masses partition the corpus; assignment is the argmin") {
    val cents = SparkEntry.queries("q277_kmeans_centroids")(spark, sfDir).collect()
    assert(cents.length === 8 * 64)
    val sizes = cents.groupBy(_.getLong(0)).view
      .mapValues(_.map(_.getLong(3)).distinct).toMap
    // one size per cluster, and the masses partition the corpus exactly
    assert(sizes.values.forall(_.length === 1))
    val nVec = Tables.embeddings(spark, sfDir).count()
    assert(sizes.values.map(_.head).sum === nVec)
    // driver argmin replay on one vector: its assigned cluster under the
    // published centroids must be the (distance, cid)-minimal one
    val emb = Tables.embeddings(spark, sfDir)
      .orderBy("vec_id").limit(1).collect().head
    val xq = emb.getSeq[Float](1).map(x =>
      math.floor(x.toDouble * 1000000).toLong)
    val cent = cents.groupBy(_.getLong(0)).view.mapValues(rs =>
      rs.sortBy(_.getLong(1)).map(_.getLong(2))).toMap
    val d2 = cent.map { case (cid, cq) =>
      cid -> xq.zip(cq).map { case (x, c) => (x - c) * (x - c) }.sum }
    val best = d2.toSeq.sortBy { case (cid, d) => (d, cid) }.head._1
    // the corpus-side assignment is not in q277's output; q278 carries it
    val asg = SparkEntry.queries("q278_cluster_balanced_sample")(spark, sfDir)
      .filter(org.apache.spark.sql.functions.col("vec_id") === emb.getLong(0))
      .collect()
    // the smallest vec_id draws into its cluster's sample at this corpus
    // size or not at all; when present its cluster must equal the replay
    asg.headOption.foreach(r => assert(r.getLong(0) === best))
  }

  test("q278 keeps at most kmSample rows per cluster, ranks dense from 1") {
    val out = SparkEntry.queries("q278_cluster_balanced_sample")(spark, sfDir)
      .collect()
    val byC = out.groupBy(_.getLong(0))
    assert(byC.values.forall(_.length <= 32))
    byC.values.foreach { rows =>
      assert(rows.map(_.getLong(3)).sorted.toSeq ===
        (1L to rows.length.toLong))
    }
  }

  test("q279 masses partition the corpus and bound q278; q280 conserves token mass") {
    val q = SparkEntry.queries("q279_cluster_quality")(spark, sfDir).collect()
    // q279 evaluates the PUBLISHED fit (one fresh assignment against the
    // final centroids), so its masses partition the corpus — they need NOT
    // equal q277's size_n, which is the mass of the 4th update that
    // produced those centroids (Lloyd's is not converged after 4 rounds)
    assert(q.map(_.getLong(1)).sum ===
      Tables.embeddings(spark, sfDir).count())
    q.foreach { r =>
      assert(r.getLong(5) >= 0L && r.getLong(5) <= 1000L)
      assert(r.getLong(4) <= r.getLong(1), "majority count exceeds mass")
    }
    // q278 samples the same final assignment: per cluster min(32, mass)
    val byC = SparkEntry.queries("q278_cluster_balanced_sample")(spark, sfDir)
      .collect().groupBy(_.getLong(0)).view.mapValues(_.length.toLong).toMap
    q.foreach { r =>
      assert(byC.getOrElse(r.getLong(0), 0L) === math.min(32L, r.getLong(1)))
    }
    val imp = SparkEntry.queries("q280_exactsubstr_impact")(spark, sfDir).collect()
    imp.foreach { r =>
      assert(r.getLong(3) <= r.getLong(4), "removed mass exceeds token mass")
      assert(r.getLong(2) <= r.getLong(1), "hit docs exceed docs")
    }
    // conservation vs q276: per-corpus removed mass and hit-doc count agree
    val spans = SparkEntry.queries("q276_exactsubstr_spans")(spark, sfDir).collect()
    assert(imp.map(_.getLong(3)).sum === spans.map(_.getLong(3)).sum)
    assert(imp.map(_.getLong(2)).sum === spans.map(_.getLong(0)).distinct.length.toLong)
  }

  test("q276 spans are maximal: disjoint, non-adjacent, each >= k tokens") {
    val spans = SparkEntry.queries("q276_exactsubstr_spans")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(spans.nonEmpty, "fixture corpus lost its planted duplicates")
    spans.foreach { case (_, s, e, tok) =>
      assert(e - s === tok); assert(tok >= 13L)
    }
    // maximality: within a doc, consecutive spans are separated (a merge
    // would have fused touching or overlapping windows)
    spans.groupBy(_._1).values.foreach { ss =>
      ss.sortBy(_._2).sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) => assert(s2 > e1)
        case _ =>
      }
    }
  }

  test("q282 removal conserves mass against q280 and q276") {
    val clean = SparkEntry.queries("q282_exactsubstr_clean")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    // removed token mass == the impact report's dup_tokens == span mass
    val imp = SparkEntry.queries("q280_exactsubstr_impact")(spark, sfDir)
      .collect().map(_.getLong(3)).sum
    assert(clean.map(c => c._2 - c._3).sum === imp)
    // every doc present exactly once; untouched docs round-trip their text
    assert(clean.map(_._1).distinct.length === clean.length)
    val spanned = SparkEntry.queries("q276_exactsubstr_spans")(spark, sfDir)
      .collect().map(_.getLong(0)).toSet
    val texts = Tables.documents(spark, sfDir).select("doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    clean.filterNot(c => spanned(c._1)).foreach { c =>
      assert(c._2 === c._3); assert(c._4 === texts(c._1))
    }
    // cleaned text token count matches the reported n_tokens_after
    clean.filter(c => spanned(c._1)).take(50).foreach { c =>
      val n = if (c._4.isEmpty) 0 else c._4.split(" ", -1).length
      assert(n.toLong === c._3, s"doc ${c._1}")
    }
  }

  test("q273 accumulates w_chars in DECIMAL(38,0) before the multiply") {
    // the aggregated column must be exact for sums past 2^63: verify the
    // PLAN carries a decimal sum (the ADVICE-r15 fix), and the output
    // still matches the BIGINT values at test scale
    val out = SparkEntry.queries("q273_poisson_bootstrap")(spark, sfDir)
    val aggPlan = out.queryExecution.optimizedPlan.toString
    assert(aggPlan.contains("decimal(38,0)"),
      s"q273 plan lost the DECIMAL accumulation:\n$aggPlan")
    val rows = out.collect()
    assert(rows.length === 32)
    assert(rows.forall(r => r.getLong(2) > 0L && r.getLong(3) > 0L))
  }
}
