package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Behavioral + plan-shape coverage for the corpus-preparation operators
  * (q50–q55). Behavior is driven end-to-end through the registered queries
  * over a synthetic documents.parquet (so the same code path the driver
  * verifies is the one under test), invariants over the real corpus, and
  * shuffle/broadcast assertions backing the 100 TB claims in the Scaladoc.
  */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Write a synthetic documents table and return its dir. */
  private lazy val syntheticDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_corpus_spec").toString
    val evalText = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    Seq(
      // doc 0 is eval (0 % 20 == 0); doc 21 copies it verbatim → contaminated
      (0L, evalText, "en", "src0", evalText.length.toLong),
      (21L, evalText, "en", "src1", evalText.length.toLong),
      // unrelated words → clean
      (22L, "one two three four five six seven eight nine ten", "en", "src2", 49L),
      // under the 5-gram width → n_shared 0
      (23L, "tiny short text", "en", "src3", 15L),
      // PII-bearing document
      (24L, "contact me at alice@example.com or +123 456-7890 from 10.0.42.1 today ok",
        "en", "src4", 74L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("q50 redacts emails, phones and IPs and counts each category") {
    val out = SparkEntry.queries("q50_pii_redact")(spark, syntheticDir)
      .filter(col("doc_id") === 24L).head()
    assert(out.getAs[Long]("n_email") === 1L)
    assert(out.getAs[Long]("n_phone") === 1L)
    assert(out.getAs[Long]("n_ip") === 1L)
    val red = out.getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<IP>"))
    assert(!red.contains("alice@example.com") && !red.contains("10.0.42.1"))
    // clean docs pass through byte-identical
    val clean = SparkEntry.queries("q50_pii_redact")(spark, syntheticDir)
      .filter(col("doc_id") === 22L).head()
    assert(clean.getAs[Long]("n_email") === 0L)
    assert(clean.getAs[String]("redacted") === "one two three four five six seven eight nine ten")
  }

  test("q51 flags exactly the train docs sharing a 5-gram with the eval slice") {
    val rows = SparkEntry.queries("q51_decontaminate")(spark, syntheticDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(!rows.contains(0L), "eval docs must not appear in the output")
    assert(rows(21L)._2 === 1, "verbatim copy of an eval doc must be contaminated")
    assert(rows(21L)._1 === 6L, "10 words sharing all 6 distinct 5-grams")
    assert(rows(22L) === ((0L, 0)), "unrelated doc must be clean")
    assert(rows(23L) === ((0L, 0)), "doc shorter than the shingle width is clean")
  }

  test("q52 is a deterministic per-source hash sample at the declared rates") {
    val out = SparkEntry.queries("q52_mixture_sample")(spark, sfDir)
    val again = SparkEntry.queries("q52_mixture_sample")(spark, sfDir)
    assert(out.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      again.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq)
    // mean rate across the 4 rate classes is 0.5; n>=500 draws → tight CI
    val total = Tables.documents(spark, sfDir).count().toDouble
    val kept = out.count().toDouble
    assert(kept / total > 0.4 && kept / total < 0.6,
      s"global keep rate ${kept / total} far from the 0.5 design point")
    // every kept row's draw is below its source's threshold by construction
    assert(out.filter(col("draw") >= col("thr")).count() === 0)
  }

  test("q53 novelty: exact duplicates of an earlier doc score zero") {
    val nov = SparkEntry.queries("q53_novelty_score")(spark, sfDir)
    assert(nov.filter(col("novelty") < 0 || col("novelty") > 1).count() === 0)
    // doc pairs with identical text (q13 mines them): the later copy has
    // every 8-gram already seen → novelty exactly 0
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("h"),
        size(split(col("text"), " ")).as("nw"))
    val laterDups = docs.as("a").join(docs.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") > col("b.doc_id"))
      .filter(col("a.nw") >= 8)
      .select(col("a.doc_id")).distinct()
    val nonZero = nov.join(laterDups, "doc_id").filter(col("novelty") =!= 0.0).count()
    assert(nonZero === 0, "later exact-duplicate docs must have novelty 0")
  }

  test("q54 top-k n-grams are rank-ordered with deterministic ties") {
    val rows = SparkEntry.queries("q54_ngram_topk")(spark, sfDir).orderBy("rank").collect()
    assert(rows.length === 100)
    assert(rows.map(_.getAs[Long]("rank")).toSeq === (1L to 100L))
    val pairs = rows.map(r => (r.getAs[Long]("n"), r.getAs[String]("ngram")))
    // (n desc, ngram asc) must already be sorted
    assert(pairs.toSeq === pairs.sortBy { case (n, g) => (-n, g) }.toSeq)
  }

  test("q55 pack ids reproduce the exclusive-prefix-sum chunking per source") {
    val rows = SparkEntry.queries("q55_doc_pack")(spark, sfDir)
      .collect().map(r => (r.getString(1), r.getLong(0), r.getLong(2), r.getLong(4)))
    for ((_, perSource) <- rows.groupBy(_._1)) {
      var cum = 0L
      for ((_, _, n, packId) <- perSource.sortBy(_._2)) {
        assert(packId === cum / 2048, "pack_id must be exclusive-prefix div budget")
        cum += n
      }
    }
  }

  test("q56 quantization codes stay in [0,255] and reconstruction is tight") {
    val out = SparkEntry.queries("q56_embed_quantize")(spark, sfDir).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val codes = r.getAs[String]("codes_csv").split(",").map(_.toInt)
      assert(codes.forall(c => c >= 0 && c <= 255), s"code out of int8 range for ${r.get(0)}")
      val vmin = r.getAs[Double]("vmin")
      val vmax = r.getAs[Double]("vmax")
      // max reconstruction error of scalar quantization is half a step
      val step = (vmax - vmin) / 255.0
      assert(r.getAs[Double]("max_abs_err") <= step / 2 + 1e-12)
    }
  }

  test("q57 output is exactly the en/high-quality/first-copy/clean train docs") {
    val out = SparkEntry.queries("q57_clean_pipeline")(spark, sfDir)
    val ids = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty)
    assert(out.filter(col("quality_score") < 0.8).count() === 0)
    // no eval docs, no contaminated docs, no non-first duplicates
    assert(ids.forall(_ % 20 != 0), "eval-slice docs must be removed")
    val contaminated = SparkEntry.queries("q51_decontaminate")(spark, sfDir)
      .filter(col("is_contaminated") === 1)
      .collect().map(_.getLong(0)).toSet
    assert((ids & contaminated).isEmpty, "contaminated docs must be removed")
    val nonFirstDups = Tables.documents(spark, sfDir)
      .select(col("doc_id"), md5(col("text")).as("h")).as("a")
      .join(Tables.documents(spark, sfDir)
        .select(col("doc_id").as("b_id"), md5(col("text")).as("h")), "h")
      .filter(col("b_id") < col("doc_id"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert((ids & nonFirstDups).isEmpty, "only the first copy of a dup group survives")
  }

  test("q61 z-order key interleaves bits correctly and range-clusters partitions") {
    val out = SparkEntry.queries("q61_zorder_key")(spark, sfDir)
    // driver recomputation of the Morton interleave
    def morton(a: Long, b: Long): Long =
      (0 until 16).foldLeft(0L) { (acc, i) =>
        acc | (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
      }
    for (r <- out.limit(200).collect()) {
      assert(r.getLong(2) === morton(r.getLong(1) % 65536, r.getLong(0) % 65536))
    }
    // the clustering claim: range partitions hold disjoint zvalue intervals
    val ranges = out
      .select(spark_partition_id().as("p"), col("zvalue"))
      .groupBy("p").agg(min("zvalue").as("lo"), max("zvalue").as("hi"))
      .collect().map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    for (Seq((_, hi1), (lo2, _)) <- ranges.toSeq.sliding(2)) {
      assert(hi1 <= lo2, "range partitions overlap — clustering lost")
    }
  }

  test("Artifacts.loadOrBuild: builds once, reuses, rebuilds on fingerprint change and corruption") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft_artifacts_spec").toString
    var builds = 0
    def build = { builds += 1; Seq((1L, "x")).toDF("id", "v") }
    val a = graft.ops.Artifacts.loadOrBuild(spark, base, 111L)(build)
    assert(a.count() === 1 && builds === 1)
    // same fingerprint: reads the published artifact, no rebuild
    graft.ops.Artifacts.loadOrBuild(spark, base, 111L)(build).count()
    assert(builds === 1)
    // new fingerprint: rebuild; the stale artifact survives (age-gated — a
    // concurrent session may still be scanning it) until it is a day old
    graft.ops.Artifacts.loadOrBuild(spark, base, 222L)(build).count()
    assert(builds === 2)
    val fs = new org.apache.hadoop.fs.Path(base)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val fp111 = new org.apache.hadoop.fs.Path(base, "fp_111")
    assert(fs.exists(fp111),
      "fresh stale-fingerprint artifact must NOT be deleted (live readers)")
    val twoDaysAgo = System.currentTimeMillis() - 48L * 3600 * 1000
    fs.setTimes(fp111, twoDaysAgo, -1)
    graft.ops.Artifacts.loadOrBuild(spark, base, 222L)(build).count()
    assert(!fs.exists(fp111),
      "day-old stale-fingerprint artifact must be cleaned up")
    // corruption: a dest without _SUCCESS is garbage — rebuilt, not fatal
    fs.delete(new org.apache.hadoop.fs.Path(s"$base/fp_222/_SUCCESS"), false)
    assert(graft.ops.Artifacts.loadOrBuild(spark, base, 222L)(build).count() === 1)
    assert(builds === 3)
    // empty build result publishes and reads back as schema-only
    val e = graft.ops.Artifacts.loadOrBuild(spark, base, 333L) {
      Seq((1L, "x")).toDF("id", "v").filter(col("id") < 0)
    }
    assert(e.count() === 0 && e.columns.toSeq === Seq("id", "v"))
  }

  test("PlanCache: one bounded entry, fingerprint replacement, heal after external unpersist") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_plancache_spec").toString
    val data = java.nio.file.Paths.get(dir, "t.parquet")
    Seq((1L, "a")).toDF("k", "v").write.mode("overwrite").parquet(data.toString)
    var builds = 0
    def build = { builds += 1; spark.read.parquet(data.toString) }
    val a = graft.PlanCache.cached(spark, "spec_entry", dir, data.toString)(build)
    val b = graft.PlanCache.cached(spark, "spec_entry", dir, data.toString)(build)
    assert(builds === 1, "second call must reuse, not rebuild")
    assert(a eq b, "same DataFrame instance = one bounded cache entry")
    assert(a.storageLevel !== org.apache.spark.storage.StorageLevel.NONE)
    // external unpersist of an equivalent plan evicts the entry: heal it
    a.unpersist()
    val c = graft.PlanCache.cached(spark, "spec_entry", dir, data.toString)(build)
    assert(c.storageLevel !== org.apache.spark.storage.StorageLevel.NONE, "must re-persist")
    // data change under the same dir: rebuild with the old copy released
    Thread.sleep(1100) // local FS mtime granularity can be 1s
    Seq((2L, "b")).toDF("k", "v").write.mode("overwrite").parquet(data.toString)
    val d = graft.PlanCache.cached(spark, "spec_entry", dir, data.toString)(build)
    assert(builds === 2, "fingerprint change must rebuild")
    assert(d.select("k").head().getLong(0) === 2L)
  }

  test("q91 tf-idf: three ranked terms per doc, scores monotone, rarest-term preference holds") {
    val df = SparkEntry.queries("q91_tfidf_top_terms")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir).filter(col("text").isNotNull).count()
    assert(df.count() === docs * 3, "every doc has >= 3 distinct terms on this corpus")
    assert(df.filter(col("term_rank") < 1 || col("term_rank") > 3).count() === 0)
    assert(df.filter(col("tf") < 1 || col("score") <= 0).count() === 0)
    // scores are non-increasing in rank within a doc
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("term_rank")
    assert(df.withColumn("prev", lag("score", 1).over(w))
      .filter(col("prev").isNotNull && col("score") > col("prev")).count() === 0)
    // independent recompute for the single busiest doc: its rank-1 term must
    // maximize tf * (N - df + 0.5)/(df + 0.5) over the doc's distinct terms
    val docId = df.groupBy("doc_id").agg(max("tf").as("m"))
      .orderBy(col("m").desc, col("doc_id")).head().getLong(0)
    val text = Tables.documents(spark, sfDir).filter(col("doc_id") === docId)
      .head().getAs[String]("text")
    val tf = text.split(" ").groupBy(identity).map { case (t, a) => t -> a.length }
    val allTf = Tables.documents(spark, sfDir).filter(col("text").isNotNull)
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("term"))
    val dfMap = allTf.filter(col("term").isin(tf.keys.toSeq: _*))
      .groupBy("term").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val best = tf.map { case (t, f) =>
      (t, f * ((docs - dfMap(t) + 0.5) / (dfMap(t) + 0.5)))
    }.toSeq.sortBy { case (t, sc) => (-sc, t) }.head
    val got = df.filter(col("doc_id") === docId && col("term_rank") === 1).head()
    assert(got.getAs[String]("term") === best._1)
    assert(got.getAs[Double]("score") === best._2)
    // skew guard: the df side is vocab-sized and must BROADCAST — a term-keyed
    // shuffle of tf would pile zipfian stopword keys into single partitions
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "q91 must broadcast the df table")
    assert(!plan.contains("SortMergeJoin"),
      s"q91 gained a term-keyed sort-merge join:\n${plan.take(600)}")
  }

  test("corpus-prep per-row operators stay zero-shuffle; q51 broadcasts the eval side") {
    for (q <- Seq("q50_pii_redact", "q52_mixture_sample", "q56_embed_quantize")) {
      val plan = SparkEntry.queries(q)(spark, sfDir).queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"$q plan gained a shuffle:\n$plan")
    }
    val p51 = SparkEntry.queries("q51_decontaminate")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(p51.contains("BroadcastHashJoin"), "q51 must broadcast the eval shingles")
  }

  test("q108 heavy hitters equals the plain exact groupBy-HAVING answer") {
    val got = SparkEntry.queries("q108_heavy_hitters")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val grams = Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 2)
      .select(explode(expr(
        """transform(sequence(0, size(words) - 2),
           i -> concat_ws(' ', slice(words, i + 1, 2)))""")).as("gram"))
    val total = grams.count()
    val expected = grams.groupBy("gram").agg(count(lit(1)).as("n"))
      .filter(col("n") * 1024 > total)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.nonEmpty && got === expected)
  }

  test("q108 Misra-Gries eviction path: vocabulary far beyond the summary size") {
    import spark.implicits._
    // 50k distinct singletons + three genuinely frequent grams, shuffled
    // across 8 partitions with a summary of only 15 counters (denom 16):
    // every item with count*16 > total must survive eviction — exactly hh0
    // (30%), hh1 (20%), and nothing else (singletons are far below 1/16)
    val noise = (0 until 50000).map(i => s"n$i")
    val data = new scala.util.Random(42).shuffle(
      noise ++ List.fill(30000)("hh0") ++ List.fill(20000)("hh1") ++
        List.fill(3000)("almost")) // 3% — below 1/16, must be filtered
    val grams = spark.sparkContext.parallelize(data, 8).toDF("gram")
    val got = ops.CorpusOps.heavyHittersOf(grams, 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("hh0" -> 30000L, "hh1" -> 20000L))
  }

  // ---- q134 BPE: independent list-based reference implementation ----------
  private def bpeNormWords(t: String): Seq[String] =
    t.toLowerCase.replaceAll("[^a-z0-9]+", "#")
      .dropWhile(_ == '#').reverse.dropWhile(_ == '#').reverse
      .split("#").toSeq.filter(_.nonEmpty)

  private def bpeMergeWord(w: List[String], p: (String, String)): List[String] = {
    val b = List.newBuilder[String]
    var rest = w
    while (rest.nonEmpty) rest match {
      case a :: bb :: t if (a, bb) == p => b += (a + bb); rest = t
      case a :: t => b += a; rest = t
      case Nil => ()
    }
    b.result()
  }

  private def bpeTrain(words: Map[String, Long], k: Int): Seq[(String, String)] = {
    var vocab = words.map { case (w, f) => w.map(_.toString).toList -> f }.toSeq
    val out = Seq.newBuilder[(String, String)]
    var done = false
    for (_ <- 1 to k if !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((syms, f) <- vocab; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), f) => (-f, a, b) }._1
        out += best
        vocab = vocab.map { case (syms, f) => bpeMergeWord(syms, best) -> f }
      }
    }
    out.result()
  }

  test("q134 BPE merges and token counts match the independent reference") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val wordFreq = docs.flatMap(d => bpeNormWords(d._2))
      .groupBy(identity).map { case (w, o) => w -> o.length.toLong }
    val wantMerges = bpeTrain(wordFreq, ops.Bpe.nMerges)
    assert(ops.Bpe.learnMerges(spark, sfDir) === wantMerges)
    val got = SparkEntry.queries("q134_bpe_tokenize")(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), Option(r.get(3)).map(_.asInstanceOf[Double]))))
      .toMap
    assert(got.size === docs.length)
    for ((id, text) <- docs) {
      val words = bpeNormWords(text)
      val toks = words.map { w =>
        wantMerges.foldLeft(w.map(_.toString).toList)(bpeMergeWord).length.toLong
      }.sum
      val base = words.map(_.length.toLong).sum
      val comp = if (toks > 0) Some(base.toDouble / toks.toDouble) else None
      assert(got(id) === ((toks, base, comp)), s"doc $id")
    }
  }

  test("q134 BPE learns the hand-computed merge sequence on a planted corpus") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_bpe_spec").toString
    // three copies of "aaaa bb": round 1 (a,a)=9 beats (b,b)=3; round 2 ties
    // (aa,aa)=3 with (b,b)=3 → pair-asc tie-break picks (aa,aa); round 3
    // (b,b); round 4 no pairs left → training stops early
    (0L until 3L).map(i => (i, "aaaa bb", "en", "src0", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    assert(ops.Bpe.learnMerges(spark, dir) ===
      Seq(("a", "a"), ("aa", "aa"), ("b", "b")))
    val row = SparkEntry.queries("q134_bpe_tokenize")(spark, dir)
      .filter(col("doc_id") === 0L).head()
    assert(row.getAs[Long]("bpe_tokens") === 2L) // [aaaa] [bb]
    assert(row.getAs[Long]("base_symbols") === 6L)
    assert(row.getAs[Double]("compression") === 3.0d)
  }

  test("q130 KS drift equals a driver-side exact recompute over the real corpus") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val n = docs.length.toLong
    val grid = docs.map(_._2).distinct.sorted
    val got = SparkEntry.queries("q130_ks_drift")(spark, sfDir).collect()
      .map(r => r.getAs[String]("source") ->
        ((r.getAs[Long]("n_src"), r.getAs[Long]("n_rest"),
          r.getAs[Long]("d_num"), r.getAs[Double]("ks")))).toMap
    val bySrc = docs.groupBy(_._1)
    assert(got.keySet === bySrc.keySet)
    for ((src, rows) <- bySrc) {
      val nSrc = rows.length.toLong
      val nRest = n - nSrc
      val srcVals = rows.map(_._2)
      val restVals = docs.filter(_._1 != src).map(_._2)
      val dNum = grid.map { v =>
        val cs = srcVals.count(_ <= v).toLong
        val cr = restVals.count(_ <= v).toLong
        math.abs(cs * nRest - cr * nSrc)
      }.max
      assert(got(src) ===
        ((nSrc, nRest, dNum, dNum.toDouble / (nSrc.toDouble * nRest.toDouble))),
        s"KS mismatch for $src")
    }
  }

  test("q130 a planted shifted source dominates identically-distributed ones") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_ks_spec").toString
    // srcA/srcB draw the same lengths; srcC is shifted wholesale
    val rows =
      (0 until 50).map(i => (i.toLong, "t", "en", "srcA", (100 + i % 10).toLong)) ++
        (50 until 100).map(i => (i.toLong, "t", "en", "srcB", (100 + i % 10).toLong)) ++
        (100 until 150).map(i => (i.toLong, "t", "en", "srcC", (500 + i % 10).toLong))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val ks = SparkEntry.queries("q130_ks_drift")(spark, dir).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("ks")).toMap
    // srcC is fully separated from the rest: its CDF reaches 1 while the
    // rest's is still 0 at every threshold below 500 → D = 1 exactly
    assert(ks("srcC") === 1.0)
    // srcA vs (srcB ∪ srcC): at thresholds ≥ 109 srcA's CDF is 1 but the
    // rest is at 1/2 — D = 1/2; twins never exceed that
    assert(ks("srcA") === 0.5 && ks("srcB") === 0.5)
  }

  test("q165 nucleus retention: budget law and boundary doc per source") {
    val rows = SparkEntry.queries("q165_nucleus_retention")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5)))
    val bySrc = rows.groupBy(_._2)
    bySrc.foreach { case (src, rs) =>
      val total = rs.map(_._3).sum
      val sorted = rs.sortBy(_._4)
      // cumulative walk is consistent
      sorted.foldLeft(0L) { case (acc, r) =>
        assert(r._5 === acc + r._3, s"cum at rank ${r._4} in $src"); r._5
      }
      // kept iff rank 1 or inclusive cum within 90% of the source budget
      sorted.foreach { r =>
        assert(r._6 === (r._4 == 1L || r._5 * 10 <= total * 9), s"$src rank ${r._4}")
      }
      // the survivor set is a prefix of the quality order
      val lastKept = sorted.filter(_._6).map(_._4).max
      assert(sorted.filter(_._4 <= lastKept).forall(_._6))
      // something is kept and something is cut in every source
      assert(sorted.exists(_._6) && sorted.exists(!_._6), src)
    }
    assert(bySrc.size > 1)
  }

  test("q148 source overlap: exact jaccard matches a driver set recompute, estimate is calibrated") {
    val rows = SparkEntry.queries("q148_source_overlap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // driver recompute of the shingle sets per source
    val sets = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1)))
      .filter(_._2.length >= 3)
      .groupBy(_._1).view.mapValues(_.flatMap { case (_, w) =>
        w.sliding(3).filter(_.length == 3).map(_.mkString(" "))
      }.toSet).toMap
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val inter = (sets(a) & sets(b)).size.toLong
      assert(r.getLong(2) === inter, s"pair $a,$b")
      assert(r.getDouble(3) ===
        inter.toDouble / (sets(a).size + sets(b).size - inter))
      // 32-hash MinHash: σ ≈ √(J(1−J)/32) ≤ 0.09; 0.35 is > 3.5σ for any J
      assert(r.getDouble(5) <= 0.35, s"estimate off for $a,$b: ${r.getDouble(5)}")
    }
    // every overlapping pair is present exactly once
    val pairs = rows.map(r => (r.getString(0), r.getString(1)))
    assert(pairs.distinct.length === pairs.length)
    val wantPairs = (for {
      a <- sets.keys; b <- sets.keys
      if a < b && (sets(a) & sets(b)).nonEmpty
    } yield (a, b)).toSet
    assert(pairs.toSet === wantPairs)
  }

  test("q185 vocab growth equals a driver prefix recompute; growth laws hold") {
    val docs = Tables.documents(spark, sfDir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def binlen(x: Long): Int = java.lang.Long.toBinaryString(x).length
    val ks = docs.map { case (id, _) => binlen(id) }.distinct.sorted
    val rows = SparkEntry.queries("q185_vocab_growth")(spark, sfDir)
      .orderBy("k").collect()
    assert(rows.map(_.getLong(0)).toSeq === ks.map(_.toLong).toSeq)
    // driver recompute per checkpoint: docs/tokens/vocab over doc_id < 2^k
    rows.foreach { r =>
      val k = r.getLong(0).toInt
      val pre = docs.filter { case (id, _) => binlen(id) <= k }
      val toks = pre.map(_._2.split(" ", -1).length.toLong).sum
      val vocab = pre.iterator.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .toSet.size.toLong
      assert(r.getLong(1) === (1L << k) - 1)
      assert(r.getLong(2) === pre.length.toLong, s"n_docs at k=$k")
      assert(r.getLong(3) === toks, s"n_tokens at k=$k")
      assert(r.getLong(4) === vocab, s"vocab at k=$k")
      assert(r.getDouble(5) === vocab.toDouble / toks.toDouble)
    }
    // laws: all three cumulative series are non-decreasing; types <= tokens
    val v = rows.map(r => (r.getLong(2), r.getLong(3), r.getLong(4)))
    v.sliding(2).foreach { case Array(a, b) =>
      assert(a._1 <= b._1 && a._2 <= b._2 && a._3 <= b._3)
    }
    assert(v.last._3 <= v.last._2)
  }

  test("q187 padding waste equals a driver bucket recompute; bucketing beats ALL") {
    val ts = Tables.documents(spark, sfDir).select("text").collect()
      .map(_.getString(0).split(" ", -1).length.toLong)
    def binlen(x: Long): String = java.lang.Long.toBinaryString(x).length.toString
    val rows = SparkEntry.queries("q187_padding_waste")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val buckets = ts.groupBy(binlen)
    assert(rows.keySet === buckets.keySet + "ALL")
    (buckets ++ Map("ALL" -> ts)).foreach { case (b, g) =>
      val r = rows(b)
      val (n, real, mx) = (g.length.toLong, g.sum, g.max)
      assert((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((n, mx, real, n * mx)), b)
      assert(r.getDouble(5) === 1.0 - real.toDouble / (n * mx).toDouble, b)
    }
    // bucketed padded volume never exceeds the unbucketed baseline
    val bucketedPadded = buckets.values.map(g => g.length.toLong * g.max).sum
    assert(bucketedPadded <= rows("ALL").getLong(4))
  }

  test("q192 Zipf octaves equal a driver frequency recompute") {
    val freq = Tables.documents(spark, sfDir).select("text").collect()
      .iterator.flatMap(_.getString(0).split(" ", -1)).filter(_.nonEmpty)
      .foldLeft(Map.empty[String, Long]) { (m, w) => m.updated(w, m.getOrElse(w, 0L) + 1L) }
    val ranked = freq.toSeq.sortBy { case (w, f) => (-f, w) }
    val rows = SparkEntry.queries("q192_zipf_octaves")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r).toMap
    val expected = (0 to 9).map(1L << _)
      .filter(r => 2 * r <= ranked.length)
    assert(rows.keySet === expected.toSet)
    expected.foreach { r =>
      val (term, fr) = ranked((r - 1).toInt)
      val f2r = ranked((2 * r - 1).toInt)._2
      val row = rows(r)
      assert((row.getString(1), row.getLong(2), row.getLong(3)) ===
        ((term, fr, f2r)), s"rank $r")
      assert(row.getDouble(4) === fr.toDouble / f2r.toDouble, s"rank $r")
      assert(row.getDouble(4) >= 1.0, s"rank $r") // frequencies are sorted
    }
  }

  test("q196 containment equals a driver set recompute and dominates Jaccard") {
    val sets = Tables.documents(spark, sfDir).select("source", "text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ", -1)
        (r.getString(0), ws.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet)
      }.groupBy(_._1).view.mapValues(_.iterator.map(_._2)
        .foldLeft(Set.empty[String])(_ ++ _)).toMap
    val rows = SparkEntry.queries("q196_source_containment")(spark, sfDir)
      .collect()
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val inter = (sets(a) & sets(b)).size.toLong
      assert((r.getLong(2), r.getLong(3), r.getLong(4)) ===
        ((inter, sets(a).size.toLong, sets(b).size.toLong)), s"$a,$b")
      assert(r.getDouble(5) === inter.toDouble / sets(a).size)
      assert(r.getDouble(6) === inter.toDouble / sets(b).size)
      // each containment dominates the symmetric Jaccard
      val jac = inter.toDouble / (sets(a).size + sets(b).size - inter)
      assert(r.getDouble(5) >= jac - 1e-15 && r.getDouble(6) >= jac - 1e-15)
      assert(r.getBoolean(7) === (math.max(r.getDouble(5), r.getDouble(6)) >= 0.5))
    }
  }
}
