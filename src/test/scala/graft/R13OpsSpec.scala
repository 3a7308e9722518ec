package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral coverage for the round-13 operators (q251–q255): planted
  * synthetic corpora with hand-computable answers driven through the
  * REGISTERED query entries (the driver's code path), plus batch/streaming
  * parity on real testdata.
  */
class R13OpsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Corpus whose q14 near-dup pair graph is exactly a triangle plus an
    * isolated duplicate pair: docs 1–3 verbatim copies of a 15-word
    * template (pairwise J=1 → edges (1,2),(1,3),(2,3)), docs 4–5 verbatim
    * copies of a disjoint 5-word text (edge (4,5)), doc 6 all-singleton
    * shingles (df=1 → no rare shingles → no pairs). */
  private lazy val graphDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r13_graph").toString
    val tmpl = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12 t13 t14 t15"
    val pair = "p1 p2 p3 p4 p5"
    Seq(
      (1L, tmpl, "en", "srcA", 60L),
      (2L, tmpl, "en", "srcA", 60L),
      (3L, tmpl, "en", "srcA", 60L),
      (4L, pair, "en", "srcB", 14L),
      (5L, pair, "en", "srcB", 14L),
      (6L, "u1 u2 u3 u4 u5 u6 u7", "en", "srcB", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  /** Corpus whose only support-floored bigram is (a, b): doc 1 alternates
    * "a b" five times (bigrams (a,b)×5, (b,a)×4), doc 2 is "c"×5
    * ((c,c)×4 — under the floor of 5). */
  private lazy val collocDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r13_colloc").toString
    Seq(
      (1L, "a b a b a b a b a b", "en", "srcA", 19L),
      (2L, "c c c c c", "en", "srcA", 9L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q251 estimator error: verbatim dupes land at agree=16 with zero error") {
    // On graphDir every LSH candidate pair joins two VERBATIM copies
    // (identical shingle sets → identical signatures → agree=16, exact
    // J=1000‰, error 0); no cross-template candidates can exist because
    // disjoint shingle sets cannot share an argmin. Rows collapse to the
    // single agree=16 bucket holding all 4 dup pairs: (1,2),(1,3),(2,3),(4,5).
    val rows = SparkEntry.queries("q251_minhash_estimator_error")(spark, graphDir)
      .collect()
    assert(rows.length === 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getAs[Long]("agree") === 16L)
    assert(r.getAs[Long]("n_pairs") === 4L)
    assert(r.getAs[Double]("mean_exact_pm") === 1000.0)
    assert(r.getAs[Double]("mean_abs_err_pm") === 0.0)
    assert(r.getAs[Long]("max_abs_err_pm") === 0L)
  }

  test("q251 on the real corpus: errors bounded, support covers the estimator range") {
    val rows = SparkEntry.queries("q251_minhash_estimator_error")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val agree = r.getAs[Long]("agree")
      assert(agree >= 4L && agree <= 16L, s"agree=$agree outside band floor")
      assert(r.getAs[Long]("max_abs_err_pm") <= 1000L)
      assert(r.getAs[Double]("mean_abs_err_pm") >= 0.0)
    }
  }

  test("q252 k-core: the triangle survives the 2-core peel, the pendant pair dissolves") {
    val rows = SparkEntry.queries("q252_kcore_decomposition")(spark, graphDir)
      .collect().sortBy(_.getAs[Long]("doc_id"))
    assert(rows.map(_.getAs[Long]("doc_id")).toSeq === Seq(1L, 2L, 3L),
      rows.mkString("; "))
    rows.foreach { r =>
      assert(r.getAs[Long]("degree") === 2L)  // triangle degrees
      assert(r.getAs[Long]("stable") === 1L)  // round 4 removed nothing
    }
  }

  test("q253 assortativity: degree-homogeneous components give r = 1 exactly") {
    // Triangle (all deg 2) + isolated pair (all deg 1): every directed edge
    // has dx == dy, so Pearson r is exactly 1.0; n=8 directed edges,
    // mean degree 14/8.
    val r = SparkEntry.queries("q253_degree_assortativity")(spark, graphDir)
      .collect().head
    assert(r.getAs[Long]("n_edges") === 8L)
    assert(r.getAs[Double]("mean_deg") === 14.0 / 8.0)
    assert(r.getAs[Double]("assortativity") === 1.0)
  }

  test("q254 streaming KMV registry is bit-identical to the batch sketch (q241)") {
    val batch = SparkEntry.queries("q241_kmv_distinct")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    val streamed = SparkEntry.queries("q254_streaming_kmv")(spark, sfDir)
      .collect().map(_.toSeq).sortBy(_.head.toString)
    assert(streamed.nonEmpty)
    assert(batch === streamed)
  }

  test("q255 collocation lift: planted pair is the only survivor, lift exact") {
    val rows = SparkEntry.queries("q255_collocation_lift")(spark, collocDir)
      .collect()
    assert(rows.length === 1, rows.mkString("; "))
    val r = rows.head
    assert(r.getAs[Int]("rank") === 1)
    assert(r.getAs[String]("w1") === "a")
    assert(r.getAs[String]("w2") === "b")
    assert(r.getAs[Long]("c2") === 5L)   // support: five "a b" bigrams
    assert(r.getAs[Long]("c1a") === 5L)  // five a's
    assert(r.getAs[Long]("c1b") === 5L)  // five b's
    // Nu = 15 tokens, Nb = 13 bigrams; the exact five-op IEEE chain
    val expected = (5.0 / 13.0) / ((5.0 / 15.0) * (5.0 / 15.0))
    assert(r.getAs[Double]("lift") === expected)
  }

  test("q256 blocking quality: all generators recover the planted truth; RR separates them") {
    val rows = SparkEntry.queries("q256_blocking_quality")(spark, graphDir)
      .collect().map(r => r.getAs[String]("method") -> r).toMap
    assert(rows.keySet === Set("lsh_banded", "snm_2pass", "rare_shingle"))
    rows.values.foreach { r =>
      assert(r.getAs[Long]("n_truth") === 4L) // (1,2),(1,3),(2,3),(4,5)
      assert(r.getAs[Long]("pc_pm") === 1000L, r.toString) // every truth pair found
    }
    // shingle-collision generators propose EXACTLY the 4 true pairs on this
    // corpus (disjoint shingle sets cannot collide): 6 eligible docs,
    // 15 possible pairs -> rr = 1000 - 4000/15 = 734
    Seq("lsh_banded", "rare_shingle").foreach { m =>
      assert(rows(m).getAs[Long]("n_cand") === 4L, rows(m).toString)
      assert(rows(m).getAs[Long]("rr_pm") === 734L)
    }
    // SNM's fixed window is distribution-blind: on 6 docs with window 4 the
    // two passes cover the whole pair space -> zero reduction, full recall
    assert(rows("snm_2pass").getAs[Long]("n_cand") === 15L, rows("snm_2pass").toString)
    assert(rows("snm_2pass").getAs[Long]("rr_pm") === 0L)
  }

  test("q257 bit balance reconstructs the signature on a one-doc corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_r13_bit").toString
    Seq((1L, "alpha beta gamma delta", "en", "srcA", 22L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sig = SparkEntry.queries("q16_dedup_simhash")(spark, dir)
      .collect().head.getAs[Long]("simhash")
    val bits = SparkEntry.queries("q257_simhash_bit_balance")(spark, dir)
      .collect().map(r => r.getAs[Long]("bit") -> r).toMap
    assert(bits.size === 64)
    val rebuilt = (0 until 64).map { b =>
      val r = bits(b.toLong)
      assert(r.getAs[Long]("n_docs") === 1L)
      val one = r.getAs[Long]("n_ones")
      assert(one === 0L || one === 1L)
      assert(r.getAs[Long]("ones_pm") === one * 1000)
      assert(r.getAs[Long]("skew_pm") === 500L) // a single doc is maximally skewed
      if (one == 1L) 1L << b else 0L
    }.reduce(_ | _)
    assert(rebuilt === sig, f"bit table ${rebuilt}%x != simhash ${sig}%x")
  }

  test("q257 on the real corpus: 64 balanced-ish bits, consistent counts") {
    val rows = SparkEntry.queries("q257_simhash_bit_balance")(spark, sfDir)
      .collect()
    assert(rows.length === 64)
    val nDocs = rows.head.getAs[Long]("n_docs")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_docs") === nDocs)
      val ones = r.getAs[Long]("n_ones")
      assert(ones >= 0 && ones <= nDocs)
      assert(r.getAs[Long]("ones_pm") === ones * 1000 / nDocs)
    }
  }

  test("q258 RBO matches a driver-side re-derivation from the two rankings") {
    def ranks(name: String): Map[(Long, Long), Long] =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("neighbor_id")) ->
          r.getAs[Long]("rank")).toMap
    val b = ranks("q18_knn_bruteforce")
    val l = ranks("q19_knn_lsh")
    // independent recomputation of the quantized depth weights
    val p = 0.9
    val wu = (1 to 5).map(m => Math.round(
      (m to 5).map(d => (1 - p) * math.pow(p, d - 1) / d).sum * 1e9))
    val expected = b.keys.map(_._1).toSeq.distinct.map { q =>
      val units = b.collect { case ((`q`, n), ra) if l.contains((q, n)) =>
        wu((math.max(ra, l((q, n))) - 1).toInt)
      }
      q -> (units.size.toLong, units.sum)
    }.toMap
    val rows = SparkEntry.queries("q258_rbo_agreement")(spark, sfDir).collect()
    assert(rows.map(_.getAs[Long]("q_id")).toSet === expected.keySet)
    rows.foreach { r =>
      val (nc, u) = expected(r.getAs[Long]("q_id"))
      assert(r.getAs[Long]("n_common") === nc, r.toString)
      assert(r.getAs[Double]("rbo5") === u.toDouble / 1e9, r.toString)
      assert(r.getAs[Double]("rbo5") <= 0.40952) // identical-list ceiling Σw_d
    }
  }

  test("q259 tf-idf cosine: verbatim dupes are exact distribution twins") {
    val rows = SparkEntry.queries("q259_tfidf_cosine")(spark, graphDir).collect()
    val pairs = rows.map(r =>
      (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    assert(pairs === Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)), rows.mkString("; "))
    rows.foreach { r =>
      val (dot, na, nb) = (r.getAs[Long]("dot"), r.getAs[Long]("na"), r.getAs[Long]("nb"))
      assert(dot === na && na === nb) // identical word distributions
      // the displayed cosine is exactly the int64-cast IEEE chain
      val exp = dot.toDouble / math.sqrt(na.toDouble * nb.toDouble)
      assert(r.getAs[Double]("cos") === exp)
      assert(math.abs(r.getAs[Double]("cos") - 1.0) < 1e-12)
    }
    // template words: df=3 across docs 1-3 -> wt = 1 * (10000 div 3) = 3333,
    // 15 distinct words -> dot = 15 * 3333^2
    val t = rows.find(r => r.getAs[Long]("doc_a") == 1L &&
      r.getAs[Long]("doc_b") == 2L).get
    assert(t.getAs[Long]("n_shared") === 15L)
    assert(t.getAs[Long]("dot") === 15L * 3333L * 3333L)
  }

  test("q255 on the real corpus: ranked without gaps, all above support floor") {
    val rows = SparkEntry.queries("q255_collocation_lift")(spark, sfDir)
      .collect().sortBy(_.getAs[Int]("rank"))
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.map(_.getAs[Int]("rank")).toSeq === (1 to rows.length))
    rows.foreach(r => assert(r.getAs[Long]("c2") >= 5L))
    // ranking really is by lift (desc) with lexical tie-break
    val lifts = rows.map(_.getAs[Double]("lift"))
    assert(lifts.zip(lifts.tail).forall { case (a, b) => a >= b })
  }
}
