package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral coverage for the round-12 operators (q224–q228): planted
  * synthetic corpora with hand-computable answers driven through the
  * REGISTERED query entries (the driver's code path), plus invariants over
  * the real sf0.001 corpus.
  */
class R12OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Embeddings dir with one query vector (vec_id 0 — the only id ≡ 0 mod
    * 50) and four planted corpus vectors whose cosines are hand-orderable. */
  private lazy val embDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_emb").toString
    Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 1),   // the query, label 1
      (1L, Seq(0.9f, 0.1f, 0f, 0f), 1), // same-label, cos ~0.9939 (the positive)
      (2L, Seq(0.8f, 0.2f, 0f, 0f), 2), // diff-label, cos ~0.9701 (hard negative)
      (3L, Seq(0f, 0f, 1f, 0f), 2),   // diff-label, cos 0 (easy negative)
      (4L, Seq(0f, 1f, 0f, 0f), 1))   // same-label, cos 0
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) AS embedding",
        "cast(label as int) AS label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  /** Documents dir shared with the R11 fixture's planted structure:
    * (1,2) share an 11-shingle overlap (J = 11/15), (4,5) are verbatim
    * duplicates (J = 1), everything else is shingle-disjoint. */
  private lazy val docDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_docs").toString
    val span = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13"
    Seq(
      (1L, s"$span extra1 extra2", "en", "srcA", 60L),
      (2L, s"lead1 lead2 $span", "en", "srcA", 60L),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14", "en", "srcA", 50L),
      (4L, "b1 b2 b3 b4 b5", "en", "srcB", 14L),
      (5L, "b1 b2 b3 b4 b5", "en", "srcB", 14L),
      (6L, "c1 c2 c3 c4 c5", "en", "srcB", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q224 hard negatives: planted ordering, positive margin for the hard one") {
    val rows = SparkEntry.queries("q224_hard_negatives")(spark, embDir)
      .collect().sortBy(_.getAs[Long]("rank"))
    assert(rows.length === 2) // only two diff-label vectors exist
    val Array(r1, r2) = rows
    assert(r1.getAs[Long]("q_id") === 0L)
    assert(r1.getAs[Int]("q_label") === 1)
    assert(r1.getAs[Long]("neighbor_id") === 2L) // the hard negative ranks first
    assert(r2.getAs[Long]("neighbor_id") === 3L)
    // pos_cos is vec 1's cosine; the hard negative still sits BELOW it
    assert(r1.getAs[Double]("pos_cos") > 0.99)
    assert(r1.getAs[Double]("margin") > 0.0 && r1.getAs[Double]("margin") < 0.1)
    assert(r2.getAs[Double]("margin") > 0.9) // the easy negative's margin is wide
  }

  test("q224 on the real corpus: ranks 1..5 per query, margin = pos_cos - cos") {
    val rows = SparkEntry.queries("q224_hard_negatives")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getAs[Long]("rank")).sorted.toSeq === (1L to rs.length).toSeq)
    }
    rows.filter(r => !r.isNullAt(r.fieldIndex("pos_cos"))).foreach { r =>
      assert(r.getAs[Double]("margin") ===
        r.getAs[Double]("pos_cos") - r.getAs[Double]("cos"))
    }
  }

  test("q225 label noise: hand-counted agreement on the planted vectors") {
    val rows = SparkEntry.queries("q225_knn_label_noise")(spark, embDir)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    // only vec 0 is a query: 4 neighbors total, 2 share label 1
    val l1 = rows(1)
    assert(l1.getAs[Long]("n_queries") === 1L)
    assert(l1.getAs[Long]("n_neighbors") === 4L)
    assert(l1.getAs[Long]("n_same_total") === 2L)
    assert(l1.getAs[Long]("n_suspect") === 0L)
    assert(l1.getAs[Double]("agree_frac") === 0.5)
    assert(!rows.contains(2)) // no label-2 queries
  }

  test("q225 on the real corpus: fractions in [0,1], neighbor counts = 5 per query") {
    val rows = SparkEntry.queries("q225_knn_label_noise")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val f = r.getAs[Double]("agree_frac")
      assert(f >= 0.0 && f <= 1.0)
      assert(r.getAs[Long]("n_neighbors") === 5L * r.getAs[Long]("n_queries"))
      assert(r.getAs[Long]("n_suspect") <= r.getAs[Long]("n_queries"))
    }
  }

  test("q226 code detect: hand-counted symbol/digit densities and flags") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_code").toString
    Seq(
      (1L, "a b c d e f g h", "en", "prose", 15L),           // 0 sym, 0 dig
      (2L, "if (x) { y = 1; }", "en", "code", 17L),           // 6 sym, 1 dig
      (3L, "1 2 3 4 5", "en", "nums", 9L))                    // 0 sym, 5 dig
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q226_code_detect")(spark, dir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    assert(rows("prose").getAs[Long]("n_code") === 0L)
    assert(rows("prose").getAs[Long]("n_digit_heavy") === 0L)
    assert(rows("code").getAs[Long]("sym_chars") === 6L)
    assert(rows("code").getAs[Long]("n_code") === 1L)       // 6/17 >= 1.5%
    assert(rows("code").getAs[Long]("n_digit_heavy") === 0L) // 1/17 < 20%
    assert(rows("nums").getAs[Long]("digit_chars") === 5L)
    assert(rows("nums").getAs[Long]("n_digit_heavy") === 1L) // 5/9 >= 20%
    assert(rows("nums").getAs[Long]("n_code") === 0L)
    assert(rows("code").getAs[Double]("sym_frac") === 6.0 / 17.0)
  }

  test("q227 split manifest: assignment matches an independent md5 recompute") {
    val rows = SparkEntry.queries("q227_split_manifest")(spark, docDir).collect()
    // independent recompute of the split family (salt 'split42', md5-hex)
    def splitOf(id: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split42|$id".getBytes("UTF-8"))
      val hex = d.map("%02x".format(_)).mkString
      if (hex < "cc") "train" else if (hex < "e6") "val" else "test"
    }
    val expected = (1L to 6L).groupBy(splitOf).map { case (k, v) => k -> v.size }
    val got = rows.groupBy(_.getAs[String]("split"))
      .map { case (k, v) => k -> v.map(_.getAs[Long]("n_docs")).sum }
    assert(got === expected.map { case (k, v) => k -> v.toLong })
    // the per-split deviation identity: split_docs*256 - target*total
    val total = rows.groupBy(_.getAs[String]("split"))
      .map(_._2.head.getAs[Long]("split_docs")).sum
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_256") ===
        r.getAs[Long]("split_docs") * 256L - r.getAs[Long]("target_256") * total)
    }
    // token mass: 6 docs with 15+15+14+5+5+5 = 59 words
    assert(rows.map(_.getAs[Long]("n_tokens")).sum === 59L)
  }

  test("q228 S-curve: planted pairs land in buckets 7 and 9; the verbatim pair is caught") {
    val rows = SparkEntry.queries("q228_lsh_s_curve")(spark, docDir)
      .collect().map(r => r.getAs[Long]("bucket") -> r).toMap
    assert(rows.size === 10)
    // (1,2): J = 11/15 = 0.733 -> bucket 7; (4,5): J = 1.0 -> capped at 9
    assert(rows(7L).getAs[Long]("n_pairs") === 1L)
    assert(rows(9L).getAs[Long]("n_pairs") === 1L)
    // identical docs have identical signatures -> always band-caught
    assert(rows(9L).getAs[Long]("n_caught") === 1L)
    assert(rows(9L).getAs[Double]("empirical_catch") === 1.0)
    // empty buckets: zero pairs, null empirical rate
    assert(rows(0L).getAs[Long]("n_pairs") === 0L)
    assert(rows(0L).isNullAt(rows(0L).fieldIndex("empirical_catch")))
    // the embedded theory curve is monotone increasing and saturates
    val th = (0L to 9L).map(rows(_).getAs[Double]("theory_catch"))
    assert(th.zip(th.tail).forall { case (a, b) => a < b })
    assert(th.last > 0.99 && th.head < 0.01)
  }

  test("q229 policy comparison: keep-longest picks the longer member, delta exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_policy").toString
    // 10/11 near-dup where the HIGHER id is longer; 12 unclustered
    Seq(
      (10L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10", "en", "s", 30L),
      (11L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 x1 x2", "en", "s", 38L),
      (12L, "z1 z2 z3 z4 z5", "en", "s", 14L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q229_canonical_policy")(spark, dir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[Long]("component") === 10L)
    assert(r.getAs[Long]("n_members") === 2L)
    assert(r.getAs[Long]("rep_lowest") === 10L)
    assert(r.getAs[Long]("rep_longest") === 11L)
    assert(!r.getAs[Boolean]("same_rep"))
    assert(r.getAs[Long]("chars_lowest") === 30L)
    assert(r.getAs[Long]("chars_longest") === 38L)
    assert(r.getAs[Long]("chars_delta") === 8L)
  }

  test("q230 OOV: doc 1 is the only val doc; extra1/extra2 are its OOV words") {
    val rows = SparkEntry.queries("q230_val_oov_rate")(spark, docDir).collect()
    assert(rows.length === 1)
    val r = rows.head
    assert(r.getAs[String]("source") === "srcA")
    assert(r.getAs[Long]("n_val_tokens") === 15L)
    assert(r.getAs[Long]("n_oov_tokens") === 2L) // extra1, extra2
    assert(r.getAs[Long]("n_val_types") === 15L)
    assert(r.getAs[Long]("n_oov_types") === 2L)
    assert(r.getAs[Double]("oov_token_frac") === 2.0 / 15.0)
  }

  test("q230 on the real corpus: fractions in [0,1], token >= type counts") {
    val rows = SparkEntry.queries("q230_val_oov_rate")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_oov_tokens") <= r.getAs[Long]("n_val_tokens"))
      assert(r.getAs[Long]("n_oov_types") <= r.getAs[Long]("n_val_types"))
      assert(r.getAs[Long]("n_val_tokens") >= r.getAs[Long]("n_val_types"))
      val f = r.getAs[Double]("oov_token_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }

  test("q231 n-sweep: planted 4-word leak flags at n=3,4 only; eligibility by width") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_nsweep").toString
    Seq(
      (20L, "e1 e2 e3 e4 e5 e6", "en", "s", 17L),          // eval (20 % 20 == 0)
      (21L, "e1 e2 e3 e4 x5 x6", "en", "s", 17L),          // shares a 4-gram run
      (22L, "f1 f2 f3 f4 f5 f6 f7 f8", "en", "s", 23L))    // clean
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("q231_contam_n_sweep")(spark, dir)
      .collect().map(r => r.getAs[Long]("n") -> r).toMap
    assert(rows.keySet === (3L to 8L).toSet)
    assert(rows(3L).getAs[Long]("n_flagged") === 1L)
    assert(rows(4L).getAs[Long]("n_flagged") === 1L)
    (5L to 8L).foreach(n => assert(rows(n).getAs[Long]("n_flagged") === 0L))
    // eligibility: both train docs have >= 6 words; only doc 22 has >= 7
    (3L to 6L).foreach(n => assert(rows(n).getAs[Long]("n_train_docs") === 2L))
    (7L to 8L).foreach(n => assert(rows(n).getAs[Long]("n_train_docs") === 1L))
    assert(rows(3L).getAs[Double]("flag_frac") === 0.5)
  }

  test("q231 at n=5 reproduces q51's contamination count on the real corpus") {
    val sweep5 = SparkEntry.queries("q231_contam_n_sweep")(spark, sfDir)
      .collect().find(_.getAs[Long]("n") === 5L).get.getAs[Long]("n_flagged")
    val q51 = SparkEntry.queries("q51_decontaminate")(spark, sfDir)
      .agg(org.apache.spark.sql.functions.sum("is_contaminated")).head().getLong(0)
    assert(sweep5 === q51)
    // monotone: widening the shingle can only reduce flags
    val byN = SparkEntry.queries("q231_contam_n_sweep")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("n")).map(_.getAs[Long]("n_flagged"))
    assert(byN.zip(byN.tail).forall { case (a, b) => a >= b })
  }

  test("q232 mixture: singleton shards on the tiny corpus; reconciles with q223") {
    val rows = SparkEntry.queries("q232_shard_mixture")(spark, docDir).collect()
    assert(rows.length === 6) // 6 docs into 8 shards -> 6 singletons
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") === 1L)
      assert(r.getAs[Long]("n_sources") === 1L)
      assert(r.getAs[Double]("top_share") === 1.0)
      assert(r.getAs[Double]("hhi") === 1.0)
    }
    // doc-count reconciliation with the balance report, shard by shard
    val q223 = SparkEntry.queries("q223_shard_packing")(spark, docDir)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    rows.foreach { r =>
      assert(q223(r.getAs[Long]("shard")) === r.getAs[Long]("n_docs"))
    }
  }

  test("q232 on the real corpus: hhi and shares well-formed") {
    val rows = SparkEntry.queries("q232_shard_mixture")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val hhi = r.getAs[Double]("hhi"); val ts = r.getAs[Double]("top_share")
      val ns = r.getAs[Long]("n_sources").toDouble
      assert(hhi >= 1.0 / ns - 1e-12 && hhi <= 1.0)
      assert(ts >= 1.0 / ns - 1e-12 && ts <= 1.0)
      assert(hhi <= ts + 1e-12) // HHI is bounded above by the majority share...
    }
  }

  test("q233 leakage: cluster policy straddles zero; doc policy matches recompute") {
    val rows = SparkEntry.queries("q233_split_leakage")(spark, docDir)
      .collect().map(r => r.getAs[String]("policy") -> r).toMap
    assert(rows.keySet === Set("doc_hash", "cluster_hash"))
    // pair universe: (1,2) and (4,5)
    assert(rows("doc_hash").getAs[Long]("n_pairs") === 2L)
    assert(rows("cluster_hash").getAs[Long]("n_pairs") === 2L)
    assert(rows("cluster_hash").getAs[Long]("n_straddling") === 0L)
    assert(rows("cluster_hash").getAs[Double]("leak_frac") === 0.0)
    // independent recompute of the naive 3-way draw
    def splitOf(id: Long): String = {
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split|$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
        .substring(0, 8)
      if (hex < "cccccccc") "train" else if (hex < "e6666666") "val" else "test"
    }
    val expected = Seq((1L, 2L), (4L, 5L))
      .count { case (a, b) => splitOf(a) != splitOf(b) }.toLong
    assert(rows("doc_hash").getAs[Long]("n_straddling") === expected)
  }

  test("q234 hapax: hand-counted type/hapax ledger on the planted corpus") {
    val rows = SparkEntry.queries("q234_hapax_profile")(spark, docDir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    val b = rows("srcB") // b1..b5 x2 (docs 4,5), c1..c5 x1 (doc 6)
    assert(b.getAs[Long]("n_tokens") === 15L)
    assert(b.getAs[Long]("n_types") === 10L)
    assert(b.getAs[Long]("n_source_hapax") === 5L)
    assert(b.getAs[Long]("n_corpus_hapax") === 5L)
    assert(b.getAs[Double]("source_hapax_type_frac") === 0.5)
    val a = rows("srcA") // w1..w13 x2; extra1/2, lead1/2, u1..u14 x1
    assert(a.getAs[Long]("n_tokens") === 44L)
    assert(a.getAs[Long]("n_types") === 31L)
    assert(a.getAs[Long]("n_source_hapax") === 18L)
    assert(a.getAs[Long]("n_corpus_hapax") === 18L)
  }

  test("q235 embedding stats: zero vector counted, norms and dims exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_estats").toString
    Seq(
      (0L, Seq(1f, 0f), 1), (1L, Seq(0f, 0f), 1), (2L, Seq(3f, 4f), 2))
      .toDF("vec_id", "embedding", "label")
      .selectExpr("vec_id", "transform(embedding, x -> cast(x as float)) AS embedding",
        "cast(label as int) AS label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("q235_embedding_stats")(spark, dir)
      .collect().map(r => r.getAs[Int]("label") -> r).toMap
    val l1 = rows(1)
    assert(l1.getAs[Long]("n_vectors") === 2L)
    assert(l1.getAs[Long]("min_dim") === 2L && l1.getAs[Long]("max_dim") === 2L)
    assert(l1.getAs[Long]("n_zero_vectors") === 1L)
    assert(l1.getAs[Double]("min_norm") === 0.0)
    assert(l1.getAs[Double]("max_norm") === 1.0)
    assert(l1.getAs[Double]("mean_norm") === 0.5)
    assert(rows(2).getAs[Double]("max_norm") === 5.0)
  }

  test("q235 on the real corpus: mean within [min,max], uniform dims, no zeros") {
    val rows = SparkEntry.queries("q235_embedding_stats")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_dim") === 64L)
      assert(r.getAs[Long]("max_dim") === 64L)
      assert(r.getAs[Long]("n_zero_vectors") === 0L)
      val mean = r.getAs[Double]("mean_norm")
      assert(mean >= r.getAs[Double]("min_norm") - 1e-6)
      assert(mean <= r.getAs[Double]("max_norm") + 1e-6)
    }
  }

  test("q236 streaming registry: the verbatim pair collides in all four bands") {
    val rows = SparkEntry.queries("q236_streaming_lsh_registry")(spark, docDir)
      .collect()
    assert(rows.forall(_.getAs[Long]("n_docs") >= 2L))
    // docs 4 and 5 are byte-identical -> identical signatures -> all 4 bands
    val pairBands = rows.filter(_.getAs[Long]("first_doc_id") === 4L)
    assert(pairBands.map(_.getAs[Long]("band_idx")).sorted.toSeq === Seq(0L, 1L, 2L, 3L))
    assert(pairBands.forall(_.getAs[Long]("n_docs") === 2L))
    // distinct band hashes per band index (no accidental cross-band merge)
    assert(pairBands.map(_.getAs[String]("band_hash")).distinct.length === 4)
  }

  test("q236 equals an independent relational recompute on the real corpus") {
    import org.apache.spark.sql.functions._
    val streamed = SparkEntry.queries("q236_streaming_lsh_registry")(spark, sfDir)
      .collect().map(r => (r.getAs[Long]("band_idx"), r.getAs[String]("band_hash"))
        -> (r.getAs[Long]("first_doc_id"), r.getAs[Long]("n_docs"))).toMap
    assert(streamed.nonEmpty)
    // independent formulation of the same hash family: RELATIONAL min over
    // exploded shingles (q15's sigsOf shape) instead of the streaming side's
    // row-local HOF fold — a family drift in either shows here
    val ng = Tables.documents(spark, sfDir)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        """transform(sequence(0, size(words) - 3),
           i -> concat(words[i], ' ', words[i + 1], ' ', words[i + 2]))""")))
        .as("g"))
    val mh = (0 until 16).map(i =>
      min(md5(concat_ws("|", lit(i.toString), col("g")))).as(s"mh$i"))
    val sigs = ng.groupBy("doc_id").agg(mh.head, mh.tail: _*)
    val bandCols = (0 until 4).map { b =>
      struct(lit(b.toLong).as("band_idx"),
        md5(concat_ws("|", (b * 4 until (b + 1) * 4)
          .map(i => col(s"mh$i")): _*)).as("band_hash"))
    }
    val expected = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .groupBy(col("bk.band_idx").as("band_idx"), col("bk.band_hash").as("band_hash"))
      .agg(min("doc_id").as("first_doc_id"), count(lit(1)).as("n_docs"))
      .filter(col("n_docs") >= 2)
      .collect().map(r => (r.getAs[Long]("band_idx"), r.getAs[String]("band_hash"))
        -> (r.getAs[Long]("first_doc_id"), r.getAs[Long]("n_docs"))).toMap
    assert(streamed === expected)
  }

  test("plan pins: q224/q225 broadcast the query sample, never a cartesian") {
    Seq("q224_hard_negatives", "q225_knn_label_noise").foreach { q =>
      val plan = SparkEntry.queries(q)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), s"$q:\n$plan")
      assert(plan.contains("Broadcast"), s"$q lost the broadcast query side:\n$plan")
    }
  }

  test("q228 on the real corpus: counts are consistent and rates well-formed") {
    val rows = SparkEntry.queries("q228_lsh_s_curve")(spark, sfDir).collect()
    assert(rows.length === 10)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_caught") <= r.getAs[Long]("n_pairs"))
      if (!r.isNullAt(r.fieldIndex("empirical_catch"))) {
        val e = r.getAs[Double]("empirical_catch")
        assert(e >= 0.0 && e <= 1.0)
      }
    }
    assert(rows.map(_.getAs[Long]("n_pairs")).sum > 0L)
  }

  /** DSIR fixture: src0 is the target (all 'alpha'-flavored bigrams); the
    * candidates are one alpha-heavy doc (should win), one mixed, one fully
    * off-distribution. */
  private lazy val dsirDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_dsir").toString
    Seq(
      (1L, "alpha beta alpha beta alpha beta", "en", "src0", 30L),
      (2L, "alpha beta alpha beta", "en", "src0", 20L),
      (3L, "alpha beta alpha beta alpha", "en", "srcX", 25L), // target-like
      (4L, "alpha beta gamma delta", "en", "srcX", 20L), // 1 of 3 on-target
      (5L, "zeta eta theta iota", "en", "srcY", 20L)) // 0 of 3 on-target
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q237 DSIR: target-like candidate outranks mixed outranks off-target") {
    val rows = SparkEntry.queries("q237_dsir_selection")(spark, dsirDir).collect()
    // src0 (the target) never appears among the selected candidates
    assert(rows.forall(_.getAs[String]("source") != "src0"))
    assert(rows.map(_.getAs[Long]("doc_id")).toSet === Set(3L, 4L, 5L))
    val byDoc = rows.map(r => r.getAs[Long]("doc_id")
      -> r.getAs[Long]("avg_w_micro")).toMap
    // doc 3's bigrams all come from the target's buckets; doc 4 shares one
    // of its three with the target; doc 5 none (and all three off-target
    // buckets are raw singletons, so 4 and 5 differ only in that one
    // target-bucket substitution) — the induced ordering is structural,
    // not hash-lucky
    assert(byDoc(3L) > byDoc(4L) && byDoc(4L) > byDoc(5L))
  }

  test("q237 on the real corpus: top-K, ordered, candidates only") {
    val rows = SparkEntry.queries("q237_dsir_selection")(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 100)
    assert(rows.forall(_.getAs[String]("source") != "src0"))
    assert(rows.forall(_.getAs[Long]("n_bigrams") > 0L))
    // the result IS the top-K under (avg desc, doc_id asc): re-sorting the
    // collected rows by that key must be a no-op modulo row order
    val sorted = rows.sortBy(r =>
      (-r.getAs[Long]("avg_w_micro"), r.getAs[Long]("doc_id")))
    assert(sorted.map(_.getAs[Long]("doc_id")).toSet ===
      rows.map(_.getAs[Long]("doc_id")).toSet)
  }

  /** Winnowing fixture: 1 and 2 are verbatim duplicates (every selected
    * fingerprint shared), 3 copies an 11-word run from them (≥ w+k−1 = 6
    * words ⇒ the Schleimer guarantee forces shared fingerprints), 4 is
    * disjoint. */
  private lazy val winnowDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_win").toString
    val run = "m1 m2 m3 m4 m5 m6 m7 m8 m9 m10 m11"
    Seq(
      (1L, s"p1 p2 p3 $run q1 q2 q3 q4 q5 q6 q7", "en", "srcA", 90L),
      (2L, s"p1 p2 p3 $run q1 q2 q3 q4 q5 q6 q7", "en", "srcA", 90L),
      (3L, s"r1 r2 r3 r4 r5 $run s1 s2 s3", "en", "srcB", 80L),
      (4L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12 u13 u14 u15",
        "en", "srcB", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q238 winnowing: verbatim pair at full containment, shared-run pair caught, disjoint doc silent") {
    val rows = SparkEntry.queries("q238_winnowing_overlap")(spark, winnowDir)
      .collect()
    val pairs = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    // identical docs: identical selection => n_shared = n_fp both sides,
    // containment exactly 1000 per mille
    val dup = pairs((1L, 2L))
    assert(dup.getAs[Long]("n_shared") === dup.getAs[Long]("n_fp_a"))
    assert(dup.getAs[Long]("n_fp_a") === dup.getAs[Long]("n_fp_b"))
    assert(dup.getAs[Long]("containment_pm") === 1000L)
    // the 11-word shared run: 9 shared 3-grams spanning > w windows — the
    // winnowing guarantee plus the report floor keep both cross pairs
    assert(pairs.contains((1L, 3L)) && pairs.contains((2L, 3L)))
    assert(pairs((1L, 3L)).getAs[Long]("n_shared") >= 3L)
    // doc 4 shares no 3-gram with anyone: never reported
    assert(rows.forall(r => r.getAs[Long]("doc_a") != 4L
      && r.getAs[Long]("doc_b") != 4L))
  }

  test("q238 on the real corpus: floors hold and containment is well-formed") {
    val rows = SparkEntry.queries("q238_winnowing_overlap")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("n_shared") >= 3L)
      assert(r.getAs[Long]("n_shared")
        <= math.min(r.getAs[Long]("n_fp_a"), r.getAs[Long]("n_fp_b")))
      val pm = r.getAs[Long]("containment_pm")
      assert(pm >= 0L && pm <= 1000L)
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
    }
  }

  test("q239 k-anonymity: hand-computed cells on the planted corpus") {
    val rows = SparkEntry.queries("q239_k_anonymity")(spark, docDir)
      .collect().map(r => r.getAs[String]("source") -> r).toMap
    // srcA: docs 1,2,3 all (en, bucket 0) -> one cell of 3 (< k=5)
    val a = rows("srcA")
    assert(a.getAs[Long]("n_docs") === 3L && a.getAs[Long]("n_cells") === 1L)
    assert(a.getAs[Long]("k_achieved") === 3L && a.getAs[Long]("max_cell") === 3L)
    assert(a.getAs[Long]("n_small_cells") === 1L)
    assert(a.getAs[Long]("n_docs_at_risk") === 3L)
    assert(a.getAs[Long]("n_unique_docs") === 0L)
    assert(a.getAs[Double]("at_risk_frac") === 1.0)
    // srcB: docs 4,5,6 all (en, bucket 0) -> one cell of 3
    val b = rows("srcB")
    assert(b.getAs[Long]("n_cells") === 1L && b.getAs[Long]("k_achieved") === 3L)
  }

  test("q240 HLL: small planted cardinality routes to linear counting and lands close") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_hll").toString
    val t0 = java.sql.Timestamp.valueOf("2025-03-01 10:00:00")
    // 10 users, one day, one type — plus every event duplicated: the
    // register sketch must be duplicate-insensitive by construction
    val base = (1L to 10L).map(u => (u, t0, u, "click", 1.0, "p"))
    (base ++ base.map { case (e, t, u, ty, v, p) => (e + 100L, t, u, ty, v, p) })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q240_hll_distinct")(spark, dir).collect().head
    assert(r.getAs[Long]("n_exact") === 10L)
    assert(r.getAs[Long]("n_active") <= 10L)
    // raw HLL at V ≈ 246 empty registers is far below 2.5m → the published
    // small-range branch must fire, and linear counting is near-exact here
    assert(r.getAs[Double]("hll_estimate") !== r.getAs[Double]("hll_raw"))
    assert(math.abs(r.getAs[Double]("rel_err")) < 0.15)
  }

  test("q240 on the real corpus: error within estimator bounds, registers well-formed") {
    val rows = SparkEntry.queries("q240_hll_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_active") >= 1L && r.getAs[Long]("n_active") <= 256L)
      assert(r.getAs[Long]("max_rank") >= 1L && r.getAs[Long]("max_rank") <= 49L)
      assert(r.getAs[Double]("hll_estimate") > 0.0)
      // 1.04/√256 = 6.5% standard error; 5σ is a generous but real bound
      assert(math.abs(r.getAs[Double]("rel_err")) < 0.325,
        s"${r.getAs[String]("event_type")}: ${r.getAs[Double]("rel_err")}")
    }
  }

  test("q241 KMV: sub-k planted cardinality is EXACT, duplicates invisible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_kmv").toString
    val t0 = java.sql.Timestamp.valueOf("2025-03-01 10:00:00")
    val base = (1L to 10L).map(u => (u, t0, u, "click", 1.0, "p"))
    (base ++ base.map { case (e, t, u, ty, v, p) => (e + 100L, t, u, ty, v, p) })
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q241_kmv_distinct")(spark, dir).collect().head
    // below k the sketch holds every distinct value: the estimate IS exact
    assert(r.getAs[Long]("n_held") === 10L)
    assert(r.isNullAt(r.fieldIndex("theta")))
    assert(r.getAs[Long]("kmv_estimate") === 10L)
    assert(r.getAs[Double]("rel_err") === 0.0)
  }

  test("q241 on the real corpus: saturated sketches, error within KMV bounds") {
    val rows = SparkEntry.queries("q241_kmv_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val held = r.getAs[Long]("n_held")
      assert(held <= 256L)
      if (held == 256L) {
        assert(!r.isNullAt(r.fieldIndex("theta")))
        // 1/√(k−2) ≈ 6.3% standard error; 5σ bound
        assert(math.abs(r.getAs[Double]("rel_err")) < 0.315,
          s"${r.getAs[String]("event_type")}: ${r.getAs[Double]("rel_err")}")
      } else {
        assert(r.getAs[Long]("kmv_estimate") === held)
        assert(r.getAs[Long]("n_exact") === held)
      }
    }
  }

  test("q242 overlap: planted sets below k are exact through the sketch algebra") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_kov").toString
    val t0 = java.sql.Timestamp.valueOf("2025-03-01 10:00:00")
    // A = users 1..10, B = users 6..15, same day: |A∩B| = 5, |A∪B| = 15
    val a = (1L to 10L).map(u => (u, t0, u, "alpha", 1.0, "p"))
    val b = (6L to 15L).map(u => (u + 50L, t0, u, "beta", 1.0, "p"))
    (a ++ b).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q242_kmv_overlap")(spark, dir).collect().head
    assert(r.getAs[String]("type_a") === "alpha" && r.getAs[String]("type_b") === "beta")
    assert(r.getAs[Long]("n_a") === 10L && r.getAs[Long]("n_b") === 10L)
    assert(r.getAs[Long]("est_union") === 15L && r.getAs[Long]("exact_union") === 15L)
    assert(r.getAs[Long]("est_inter") === 5L && r.getAs[Long]("exact_inter") === 5L)
    assert(r.getAs[Double]("err_union") === 0.0 && r.getAs[Double]("err_inter") === 0.0)
  }

  test("q242 on the real corpus: sub-k groups stay exact, pairs complete") {
    val rows = SparkEntry.queries("q242_kmv_overlap")(spark, sfDir).collect()
    assert(rows.length === 10) // C(5,2) event-type pairs
    // at sf0.001 every type holds < k = 256 user-days; a pair whose MERGED
    // set also stays below k must be exact end-to-end, while a pair whose
    // union crosses k exercises the θ hand-off and only owes the 5σ bound
    rows.foreach { r =>
      assert(r.getAs[Long]("est_inter") <= r.getAs[Long]("est_union"))
      if (r.getAs[Long]("est_union") < 256L) {
        assert(r.getAs[Long]("est_union") === r.getAs[Long]("exact_union"))
        assert(r.getAs[Long]("est_inter") === r.getAs[Long]("exact_inter"))
        assert(r.getAs[Double]("err_union") === 0.0)
      } else {
        assert(math.abs(r.getAs[Double]("err_union")) < 0.315)
      }
    }
    // both regimes must actually occur at this scale, or the test is vacuous
    assert(rows.exists(_.getAs[Long]("est_union") < 256L))
    assert(rows.exists(_.getAs[Long]("est_union") >= 256L))
  }

  test("q243 bloom: planted tiny filter — geometry exact, no false positives at 0.3% fill") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_blm").toString
    val t0 = java.sql.Timestamp.valueOf("2025-03-01 10:00:00")
    val m = (1L to 5L).map(u => (u, t0, u, "purchase", 1.0, "p"))
    val o = (6L to 10L).map(u => (u + 50L, t0, u, "click", 1.0, "p"))
    (m ++ o).toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = SparkEntry.queries("q243_bloom_audit")(spark, dir).collect().head
    assert(r.getAs[Long]("n_members") === 5L)
    assert(r.getAs[Long]("n_bits_set") <= 15L && r.getAs[Long]("n_bits_set") >= 1L)
    assert(r.getAs[Long]("n_probe_keys") === 5L)
    // 15 bits of 16384 → (B/m)³ ≈ 8e-10: a false positive here would mean
    // the hash plumbing is broken, not bad luck
    assert(r.getAs[Long]("n_false_pos") === 0L)
    assert(r.getAs[Double]("fpr_exact") === 0.0)
  }

  test("q243 on the real corpus: filter well-formed, FPR tracks the fill prediction") {
    val r = SparkEntry.queries("q243_bloom_audit")(spark, sfDir).collect().head
    val bits = r.getAs[Long]("n_bits_set")
    assert(bits >= 1L && bits <= math.min(16384L, 3L * r.getAs[Long]("n_members")))
    assert(r.getAs[Long]("n_false_pos") <= r.getAs[Long]("n_probe_keys"))
    val (exact, pred) = (r.getAs[Double]("fpr_exact"), r.getAs[Double]("fpr_predicted"))
    assert(exact >= 0.0 && exact <= 1.0 && pred > 0.0 && pred < 1.0)
    // at sf0.001's ~3% fill the prediction is ~2.5e-5 — the observed rate
    // must not exceed it by orders of magnitude
    assert(exact <= 10.0 * pred + 1e-9)
  }

  test("q244 streaming HLL equals the batch sketch at completion") {
    val streamed = SparkEntry.queries("q244_streaming_hll")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("max_rank"),
          r.getAs[Double]("hll_raw"), r.getAs[Double]("hll_estimate"))).toMap
    assert(streamed.nonEmpty)
    // the micro-batched registry must land on the BIT-IDENTICAL registers
    // and estimate the one-shot batch plan produces — max() register state
    // is order-insensitive, so batch discovery order cannot matter
    val batch = SparkEntry.queries("q240_hll_distinct")(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_active"), r.getAs[Long]("max_rank"),
          r.getAs[Double]("hll_raw"), r.getAs[Double]("hll_estimate"))).toMap
    assert(streamed === batch)
  }

  /** SNM fixture: docs 1/2 share the whole body behind a DIFFERING first
    * word (adjacent only under the reversed-suffix key — the multi-pass
    * case); 10/11 are verbatim duplicates (adjacent under both keys); the
    * fillers push 1 and 2 more than w−1 ranks apart in pass-1 order and are
    * shingle-disjoint from everything. */
  private lazy val snmDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_snm").toString
    Seq(
      (1L, "alpha common body words one two three four five six"),
      (2L, "zeta common body words one two three four five six"),
      (3L, "beta aa1 aa2 aa3 aa4 aa5 aa6"),
      (4L, "cat bb1 bb2 bb3 bb4 bb5 bb6"),
      (5L, "delta cc1 cc2 cc3 cc4 cc5 cc6"),
      (6L, "echo dd1 dd2 dd3 dd4 dd5 dd6"),
      (7L, "golf ee1 ee2 ee3 ee4 ee5 ee6"),
      (8L, "hotel ff1 ff2 ff3 ff4 ff5 ff6"),
      (9L, "india gg1 gg2 gg3 gg4 gg5 gg6"),
      (10L, "mike dup body xx1 xx2 xx3 xx4 xx5"),
      (11L, "mike dup body xx1 xx2 xx3 xx4 xx5"))
      .map { case (id, t) => (id, t, "en", "srcA", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q245 SNM: verbatim pair via both passes, suffix-shared pair via pass 2 only") {
    val rows = SparkEntry.queries("q245_sorted_neighborhood")(spark, snmDir)
      .collect()
    val pairs = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) -> r).toMap
    // verbatim duplicates: identical blocking keys in both passes
    val dup = pairs((10L, 11L))
    assert(dup.getAs[Long]("n_passes") === 2L)
    assert(dup.getAs[Long]("j_pm") === 1000L)
    assert(dup.getAs[Long]("inter") === dup.getAs[Long]("n_a"))
    // prefix differs (10 ranks apart in pass 1), reversed suffix identical:
    // only pass 2 proposes it; 7 of 8 shingles shared -> 7/9 = 777 pm
    val suf = pairs((1L, 2L))
    assert(suf.getAs[Long]("n_passes") === 1L)
    assert(suf.getAs[Long]("inter") === 7L)
    assert(suf.getAs[Long]("n_a") === 8L && suf.getAs[Long]("n_b") === 8L)
    assert(suf.getAs[Long]("j_pm") === 777L)
    // fillers are shingle-disjoint: never reported
    assert(rows.forall(r => !(3L to 9L).contains(r.getAs[Long]("doc_a"))
      && !(3L to 9L).contains(r.getAs[Long]("doc_b"))))
  }

  test("q245 on the real corpus: floors and pair invariants hold") {
    val rows = SparkEntry.queries("q245_sorted_neighborhood")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("doc_a") < r.getAs[Long]("doc_b"))
      val np = r.getAs[Long]("n_passes")
      assert(np === 1L || np === 2L)
      val (i, na, nb) = (r.getAs[Long]("inter"),
        r.getAs[Long]("n_a"), r.getAs[Long]("n_b"))
      assert(i >= 1L && i <= math.min(na, nb))
      val pm = r.getAs[Long]("j_pm")
      assert(pm >= 400L && pm <= 1000L)
      assert(pm === (i * 1000L) / (na + nb - i))
    }
  }

  test("q246 LPA core: bridge between two triangles stays cut (where CC merges)") {
    import spark.implicits._
    // triangles {1,2,3} and {4,5,6} joined by the single bridge 3-4
    val pairs = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("doc_a", "doc_b")
    val labels = ops.DedupCluster.lpaLabelFrame(pairs, 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("label")).toMap
    assert(labels === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
      4L -> 4L, 5L -> 4L, 6L -> 4L))
    // the same graph under q40's semantics is ONE component — LPA's local
    // majority is what keeps the chance bridge from fusing the templates
    val cc = ops.DedupCluster.connectedComponents(spark, pairs).collect()
      .map(_.getAs[Long]("component")).distinct
    assert(cc === Array(1L))
  }

  test("q246 on the planted corpus: 2-cliques converge to min label via the self-vote") {
    val rows = SparkEntry.queries("q246_label_propagation")(spark, docDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    // q14 pairs on docDir: (1,2) at J=11/15 and (4,5) at J=1 — two 2-cliques.
    // Self-vote forces the tie, min-label breaks it: both members land on
    // the smaller doc_id and are stable by round 2.
    assert(rows.keySet === Set(1L, 2L, 4L, 5L))
    for ((m, c) <- Seq(1L -> 1L, 2L -> 1L, 4L -> 4L, 5L -> 4L)) {
      assert(rows(m).getAs[Long]("community") === c)
      assert(rows(m).getAs[Long]("csize") === 2L)
      assert(rows(m).getAs[Long]("converged") === 1L)
    }
  }

  test("q246 on the real corpus: communities refine q40's components") {
    val lpa = SparkEntry.queries("q246_label_propagation")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("community"))
      .toMap
    val cc = SparkEntry.queries("q40_dedup_clusters")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("component"))
      .toMap
    assert(lpa.keySet === cc.keySet) // same node set: every paired doc
    // refinement: two docs in different components NEVER share a community
    // (labels only travel along edges, which never leave a component)
    val lpaByCommunity = lpa.groupMap(_._2)(_._1)
    lpaByCommunity.values.foreach { members =>
      assert(members.map(cc).toSet.size === 1)
    }
  }

  test("q247 sample quantiles: sub-k corpus makes the sample exhaustive and errors zero") {
    val rows = SparkEntry.queries("q247_sample_quantiles")(spark, docDir)
      .collect().map(r => r.getAs[Long]("p_pm") -> r).toMap
    // docDir: 6 docs, n_chars sorted = [14,14,14,50,60,60]; k = N = 6 so the
    // sample IS the corpus and every rank band contains its target exactly
    val expect = Map(100L -> (14L, 1L), 250L -> (14L, 2L), 500L -> (14L, 3L),
      750L -> (60L, 5L), 900L -> (60L, 6L), 990L -> (60L, 6L))
    assert(rows.keySet === expect.keySet)
    for ((p, (v, sr)) <- expect) {
      val r = rows(p)
      assert(r.getAs[Long]("est_value") === v, s"p=$p")
      assert(r.getAs[Long]("sample_rank") === sr, s"p=$p")
      assert(r.getAs[Long]("sample_k") === 6L)
      assert(r.getAs[Long]("n_tot") === 6L)
      assert(r.getAs[Long]("err_pm") === 0L, s"p=$p")
      assert(r.getAs[Long]("within_dkw") === 1L)
    }
  }

  test("q247 on the real corpus: bands bracket the estimate and DKW holds") {
    val rows = SparkEntry.queries("q247_sample_quantiles")(spark, sfDir)
      .collect()
    assert(rows.length === 6)
    rows.foreach { r =>
      val (lo, hi, n) = (r.getAs[Long]("rank_lo"), r.getAs[Long]("rank_hi"),
        r.getAs[Long]("n_tot"))
      assert(lo < hi && hi <= n) // the estimate's value class is non-empty
      assert(r.getAs[Long]("sample_k") === math.min(256L, n))
      // the audit's own law: err_pm is the banded deviation over N
      val p = r.getAs[Long]("p_pm")
      val dev = math.max(math.max(p * n - 1000L * hi, 1000L * lo - p * n), 0L)
      assert(r.getAs[Long]("err_pm") === dev / n)
      assert(r.getAs[Long]("within_dkw") === (if (dev <= 100L * n) 1L else 0L))
      // with this fixed hash family the DKW gate holds on the shipped corpus
      assert(r.getAs[Long]("within_dkw") === 1L)
    }
  }

  test("q248 streaming count-min: streamed registers reproduce the batch sketch bit-identically") {
    val key = (r: org.apache.spark.sql.Row) => Option(r.getAs[String]("item"))
    val streamed = SparkEntry.queries("q248_streaming_countmin")(spark, sfDir)
      .collect().map(r => key(r) -> (r.getAs[Long]("exact_n"),
        r.getAs[Long]("cms_estimate"), r.getAs[Long]("overestimate"))).toMap
    val batch = SparkEntry.queries("q78_countmin")(spark, sfDir)
      .collect().map(r => key(r) -> (r.getAs[Long]("exact_n"),
        r.getAs[Long]("cms_estimate"), r.getAs[Long]("overestimate"))).toMap
    assert(streamed === batch)
    // CMS law: estimates never undercount
    streamed.values.foreach { case (_, _, over) => assert(over >= 0L) }
  }

  /** MMR fixture: c1 is the top hit, c2 is a near-duplicate of c1 with
    * marginally lower relevance, c3 is moderately relevant but diverse,
    * c4 is irrelevant. Pure relevance ranks 1,2,3,4; MMR must demote the
    * near-duplicate: 1,3,2,4 (margins ≥ 0.05 — far above float noise). */
  private lazy val mmrDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_mmr").toString
    Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),        // the query (vec_id ≡ 0 mod 50)
      (1L, Seq(0.95f, 0.312f, 0f, 0f)), // rel ≈ 0.9501
      (2L, Seq(0.94f, 0.309f, 0f, 0f)), // rel ≈ 0.9500, sim to c1 ≈ 1.0
      (3L, Seq(0.9f, -0.436f, 0f, 0f)), // rel ≈ 0.9000, sim to c1 ≈ 0.719
      (4L, Seq(0f, 0f, 1f, 0f)))        // rel 0, orthogonal to everything
      .toDF("vec_id", "embedding")
      .selectExpr("vec_id",
        "transform(embedding, x -> cast(x as float)) AS embedding")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("q249 MMR: the near-duplicate of pick 1 is demoted below the diverse hit") {
    val rows = SparkEntry.queries("q249_mmr_rerank")(spark, mmrDir)
      .collect().sortBy(_.getAs[Long]("pick_rank"))
    assert(rows.map(_.getAs[Long]("q_id")).toSet === Set(0L))
    assert(rows.map(_.getAs[Long]("pick_rank")).toSeq === Seq(1L, 2L, 3L, 4L))
    // relevance order is 1,2,3,4 (rel: .9501, .9500, .9000, 0) — MMR demotes
    // the near-dup c2 below the diverse c3
    assert(rows.map(_.getAs[Long]("picked_id")).toSeq === Seq(1L, 3L, 2L, 4L))
    val r1 = rows(0)
    assert(r1.getAs[Double]("mmr_score") === 0.7 * r1.getAs[Double]("rel_cos"))
    // every later pick scores rel minus a positive-or-zero diversity penalty
    rows.drop(1).foreach { r =>
      assert(r.getAs[Double]("mmr_score") <= 0.7 * r.getAs[Double]("rel_cos") + 1e-12)
    }
  }

  test("q249 on the real corpus: 4 picks per query, scores non-increasing in rank is NOT required but penalty law holds") {
    val rows = SparkEntry.queries("q249_mmr_rerank")(spark, sfDir).collect()
    val byQ = rows.groupBy(_.getAs[Long]("q_id"))
    val nVec = Tables.embeddings(spark, sfDir).count()
    assert(byQ.nonEmpty)
    byQ.foreach { case (_, picks) =>
      val ranks = picks.map(_.getAs[Long]("pick_rank")).sorted.toSeq
      assert(ranks === (1L to math.min(4L, ranks.length.toLong)))
      // picks are distinct vectors
      assert(picks.map(_.getAs[Long]("picked_id")).distinct.length === picks.length)
      picks.foreach { r =>
        assert(r.getAs[Double]("rel_cos") <= 1.0 + 1e-9)
        assert(r.getAs[Long]("picked_id") !== r.getAs[Long]("q_id"))
      }
    }
    assert(rows.length <= byQ.size * 4 && byQ.size >= (nVec / 50).toInt - 1)
  }

  test("q250 map ops: the filter drops an absent k, shapes and entry counts are exact") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r12_map").toString
    val t0 = java.sql.Timestamp.valueOf("2025-03-01 10:00:00")
    Seq(
      (1L, t0, 7L, "view", 250.0, """{"k": 42}"""),
      (2L, t0, 8L, "view", -50.0, "{}"),          // no k -> filtered out
      (3L, t0, 9L, "buy", 99.0, """{"k": 7}"""))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("q250_map_ops")(spark, dir)
      .collect().map(r => r.getAs[String]("event_type") -> r).toMap
    val view = rows("view")
    assert(view.getAs[Long]("n_events") === 2L)
    assert(view.getAs[Long]("n_with_k") === 1L)
    // with k: {k,type,vbin,user} + n = 5 entries; without: 4
    assert(view.getAs[Long]("total_entries") === 9L)
    assert(view.getAs[Long]("n_key_shapes") === 2L)
    assert(view.getAs[String]("min_keys_csv") === "k,n,type,user,vbin")
    // vbins: floor(250/100)=2, floor(-50/100)=-1 -> max 2
    assert(view.getAs[Long]("max_vbin") === 2L)
    val buy = rows("buy")
    assert(buy.getAs[Long]("n_events") === 1L)
    assert(buy.getAs[Long]("total_entries") === 5L)
    assert(buy.getAs[Long]("max_vbin") === 0L)
  }

  test("q250 on the real corpus: every event carries k, one key shape per type") {
    val rows = SparkEntry.queries("q250_map_ops")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_with_k") === r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("total_entries") === 5L * r.getAs[Long]("n_events"))
      assert(r.getAs[Long]("n_key_shapes") === 1L)
      assert(r.getAs[String]("min_keys_csv") === "k,n,type,user,vbin")
    }
  }

  test("q239 on the real corpus: partition of the corpus, fractions in range") {
    val rows = SparkEntry.queries("q239_k_anonymity")(spark, sfDir).collect()
    val total = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum === total)
    rows.foreach { r =>
      assert(r.getAs[Long]("k_achieved") >= 1L)
      assert(r.getAs[Long]("n_docs_at_risk") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("n_unique_docs") <= r.getAs[Long]("n_small_cells"))
      val f = r.getAs[Double]("at_risk_frac")
      assert(f >= 0.0 && f <= 1.0)
    }
  }
}
