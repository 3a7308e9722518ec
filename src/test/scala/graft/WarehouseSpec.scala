package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class WarehouseSpec extends AnyFunSuite {
  import SparkTestSession._

  test("q104 quality audit fails exactly the violated constraints") {
    import spark.implicits._
    import java.sql.Timestamp
    val t = Timestamp.valueOf("2024-01-01 00:00:00")
    // violations: a null + a duplicate key, a negative price, a null date,
    // an out-of-domain status — every constraint trips except none
    val bad = Seq(
      (Some(1L), "O", 10.0, Some(t)),
      (Some(1L), "F", -5.0, Some(t)),
      (None: Option[Long], "X", 3.0, None: Option[Timestamp]))
      .toDF("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    val got = graft.ops.Warehouse.qualityAuditOf(bad)
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getInt(2))).toMap
    assert(got("o_orderkey.not_null") === (1.0, 0))
    assert(got("o_orderkey.unique") === (1.0, 0)) // 1 distinct vs 2 non-null
    assert(got("o_totalprice.non_negative") === (-5.0, 0))
    assert(got("o_orderdate.not_null") === (1.0, 0))
    assert(got("o_orderstatus.in_domain") === (1.0, 0))
    // and the production table passes all five
    val prod = SparkEntry.queries("q104_quality_audit")(spark, sfDir)
      .filter(col("passed") === 0).count()
    assert(prod === 0)
  }

  test("q64 SCD2: one current row per customer, intervals chain without gaps") {
    val df = SparkEntry.queries("q64_scd2_history")(spark, sfDir)
      .select("custkey", "priority", "valid_from", "valid_to", "is_current")
    // exactly one open-ended (current) interval per customer
    val current = df.filter(col("is_current") === 1)
      .groupBy("custkey").count().filter(col("count") =!= 1).count()
    assert(current === 0, "every custkey must have exactly one current row")
    assert(df.filter(col("is_current") === 1 && col("valid_to").isNotNull).count() === 0)
    // intervals chain: each non-current valid_to equals the next valid_from.
    // Two changes on the same o_orderdate produce tied valid_from values
    // (the operator breaks ties by o_orderkey, which the output omits), so
    // order ties by valid_to: within a tie the earlier version's valid_to IS
    // the tied date, making (valid_from, valid_to nulls-last) the true
    // version order — valid_from alone would make lead() nondeterministic.
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("custkey")
      .orderBy(col("valid_from"), col("valid_to").asc_nulls_last)
    val gaps = df.withColumn("next_from", lead("valid_from", 1).over(w))
      .filter(col("valid_to").isNotNull && col("valid_to") =!= col("next_from"))
      .count()
    assert(gaps === 0, "validity intervals must chain exactly")
    // consecutive versions always differ in the tracked attribute
    val noChange = df.withColumn("next_prio", lead("priority", 1).over(w))
      .filter(col("next_prio").isNotNull && col("next_prio") === col("priority"))
      .count()
    assert(noChange === 0, "adjacent SCD2 versions must differ")
  }

  test("q65 CDC: I/U/D partition matches the snapshot derivation rules") {
    val df = SparkEntry.queries("q65_snapshot_cdc")(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val dCount = df.filter(col("op") === "D").count()
    assert(dCount === cust.filter(col("c_custkey") % 13 === 0).count())
    val iCount = df.filter(col("op") === "I").count()
    assert(iCount === cust.filter(col("c_custkey") % 11 === 0).count())
    // updates: every U row really changed, and covers exactly the %7 non-deleted keys
    assert(df.filter(col("op") === "U" &&
      col("old_acctbal") === col("new_acctbal") &&
      col("old_segment") === col("new_segment")).count() === 0)
    val uCount = df.filter(col("op") === "U").count()
    assert(uCount === cust.filter(col("c_custkey") % 13 =!= 0 && col("c_custkey") % 7 === 0).count())
  }

  test("q66 range join: day-binned broadcast equi-join equals the naive non-equi join") {
    val binned = SparkEntry.queries("q66_range_join")(spark, sfDir)
    // independently computed reference: the O(n×m) plan the binning avoids
    val promos = Tables.orders(spark, sfDir).filter(col("o_orderkey") % 400 === 0)
      .select(col("o_orderkey").as("promo_key"), col("o_orderpriority").as("priority"),
        col("o_orderdate").as("start_ts"), expr("o_orderdate + INTERVAL 3 DAYS").as("end_ts"))
    val naive = Tables.lineitem(spark, sfDir).crossJoin(promos)
      .filter(col("l_shipdate") >= col("start_ts") && col("l_shipdate") < col("end_ts"))
      .groupBy("promo_key", "priority")
      .agg(count(lit(1)).as("n_items"), sum(col("l_quantity").cast("long")).as("sum_qty"))
    assert(binned.exceptAll(naive).isEmpty && naive.exceptAll(binned).isEmpty,
      "binned range join must equal the naive non-equi join")
    // the scale property: the fact side joins a broadcast, never a nested loop
    val plan = binned.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), "interval side must broadcast")
    assert(!plan.contains("BroadcastNestedLoopJoin"), "must not fall back to nested loop")
  }

  test("q70 partition stats: skip verdicts are consistent with collected min/max") {
    val df = SparkEntry.queries("q70_partition_stats")(spark, sfDir)
    val lo = java.sql.Timestamp.valueOf("1998-06-01 00:00:00")
    val hi = java.sql.Timestamp.valueOf("1998-08-31 00:00:00")
    val bad = df.filter(
      (col("skip_for_ts_range") === 1) =!= (col("max_ts") < lo || col("min_ts") > hi))
      .count()
    assert(bad === 0)
    // a skipped partition really contains no matching rows
    val skippedMonths = df.filter(col("skip_for_ts_range") === 1)
      .select("part_month").collect().map(_.getTimestamp(0)).toSet
    val hits = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lo && col("l_shipdate") <= hi)
      .select(date_trunc("MONTH", col("l_shipdate")).as("m"))
      .distinct().collect().map(_.getTimestamp(0)).toSet
    assert(skippedMonths.intersect(hits).isEmpty,
      "skip=1 partitions must contain no rows matching the predicate")
  }

  test("q72 schema evolution: merged read surfaces absent columns as nulls") {
    val df = SparkEntry.queries("q72_schema_evolution")(spark, sfDir)
    assert(df.columns.toSeq ===
      Seq("custkey", "name", "acctbal", "segment", "loyalty_tier", "snapshot_v"))
    assert(df.filter(col("snapshot_v") === 1 &&
      (col("segment").isNotNull || col("loyalty_tier").isNotNull)).count() === 0)
    assert(df.filter(col("snapshot_v") === 2 && col("acctbal").isNotNull).count() === 0)
    assert(df.filter(col("snapshot_v") === 1 && col("acctbal").isNull).count() === 0)
    assert(df.count() === Tables.customer(spark, sfDir).count())
  }

  test("q67 chunking: short docs chunk whole; stride-aligned starts reconstruct the text") {
    val chunks = SparkEntry.queries("q67_doc_chunks")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"), size(split(col("text"), " ")).as("n"))
    // docs with <= 30 words (one stride) produce exactly one chunk = the text
    val short = docs.filter(col("n") <= 30).as("d")
      .join(chunks.as("c"), Seq("doc_id"))
    assert(short.filter(col("chunk_id") =!= 0).count() === 0)
    assert(short.filter(col("chunk_text") =!= col("text")).count() === 0)
    // every doc's chunk 0 starts the document; chunk word counts are bounded
    assert(chunks.filter(col("n_words") > 40 || col("n_words") < 1).count() === 0)
    val c0 = chunks.filter(col("chunk_id") === 0).as("c").join(docs.as("d"), Seq("doc_id"))
      .filter(!col("text").startsWith(col("chunk_text"))).count()
    assert(c0 === 0, "chunk 0 must be a prefix of the document")
  }

  test("q68 BM25: zero iff no term matches, and more matched terms never scores lower than zero-match") {
    val df = SparkEntry.queries("q68_bm25_score")(spark, sfDir)
    val tfSum = col("tf0") + col("tf1") + col("tf2") + col("tf3")
    assert(df.filter(tfSum === 0 && col("score") =!= 0.0).count() === 0)
    assert(df.filter(tfSum > 0 && col("score") <= 0.0).count() === 0,
      "rational idf is positive, so any match must score positive")
  }

  test("q69 cluster split: near-duplicate pairs never straddle splits") {
    val split = SparkEntry.queries("q69_cluster_split")(spark, sfDir)
    val pairs = SparkEntry.queries("q14_dedup_ngram_jaccard")(spark, sfDir)
      .select("doc_a", "doc_b")
    val straddle = pairs.as("p")
      .join(split.as("a"), col("p.doc_a") === col("a.doc_id"))
      .join(split.as("b"), col("p.doc_b") === col("b.doc_id"))
      .filter(col("a.split") =!= col("b.split"))
      .count()
    assert(straddle === 0, "near-dup pairs must land in the same split")
    // all documents assigned exactly once, all three splits populated
    assert(split.count() === Tables.documents(spark, sfDir).count())
    assert(split.select("split").distinct().count() === 3)
  }

  test("q79 incremental MV: delta maintenance equals full recompute from the CDC rows") {
    val mv = SparkEntry.queries("q79_incremental_mv")(spark, sfDir)
    // counts must reconcile with the derivation rules: news-side customers
    val cust = Tables.customer(spark, sfDir)
    val expectedTotal = cust.filter(col("c_custkey") % 13 =!= 0).count() +
      cust.filter(col("c_custkey") % 11 === 0).count()
    assert(mv.agg(sum("n_customers")).head().getLong(0) === expectedTotal)
    // the synthetic segments introduced by the CDC derivation are present
    val segs = mv.select("segment").collect().map(_.getString(0)).toSet
    assert(segs.contains("MIGRATED") && segs.contains("NEW"))
    assert(mv.filter(col("n_customers") <= 0).count() === 0)
  }

  test("q80 stratified sample: exactly N per stratum, deterministic across runs") {
    val a = SparkEntry.queries("q80_stratified_sample")(spark, sfDir)
    val sizes = a.groupBy("source").count()
    assert(sizes.filter(col("count") =!= 5).count() === 0,
      "every stratum must contribute exactly 5 documents")
    val b = SparkEntry.queries("q80_stratified_sample")(spark, sfDir)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
      "the sample must be identical across runs")
  }

  test("q71 length outliers: emitted rows match an independent z-score computation") {
    val df = SparkEntry.queries("q71_length_outliers")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
    val bySource = docs.groupBy(_.getString(1))
    val expected = bySource.toSeq.flatMap { case (_, rows) =>
      val xs = rows.map(_.getLong(2).toDouble)
      val mean = xs.sum / xs.length
      val sd = math.sqrt(xs.map(x => x * x).sum / xs.length - mean * mean)
      rows.filter(r => math.abs((r.getLong(2) - mean) / sd) > 1.5).map(_.getLong(0)).toSeq
    }.toSet
    val got = df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got === expected)
  }

  test("q110 robust outliers match a driver lower-median/MAD recompute") {
    val df = SparkEntry.queries("q110_robust_outliers")(spark, sfDir)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "n_chars").collect()
    def lowerMedian(xs: Seq[Long]): Long = {
      val sorted = xs.sorted
      val n = sorted.length
      sorted.zipWithIndex.collectFirst {
        case (v, i) if (i + 1) * 2 >= n => v
      }.get
    }
    val expected = docs.groupBy(_.getString(1)).toSeq.flatMap { case (_, rows) =>
      val xs = rows.map(_.getLong(2)).toSeq
      val med = lowerMedian(xs)
      val mad = lowerMedian(xs.map(x => math.abs(x - med)))
      rows.filter(r => math.abs(r.getLong(2) - med) > 3 * mad).map(_.getLong(0)).toSeq
    }.toSet
    val got = df.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got.nonEmpty && got === expected)
  }

  /** Driver sliding-window phrase counter — the q114 ground truth. */
  private def phraseBrute(texts: Seq[(Long, String)],
      phrases: Seq[String]): Set[(Long, String, Long)] =
    (for {
      (id, t) <- texts; p <- phrases
      ws = t.split(" "); pw = p.split(" ")
      n = ws.indices.count(i =>
        i + pw.length <= ws.length && pw.indices.forall(j => ws(i + j) == pw(j)))
      if n > 0
    } yield (id, p, n.toLong)).toSet

  test("q114 phrase search matches a driver sliding-window recompute") {
    val texts = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = SparkEntry.queries("q114_phrase_search")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got.nonEmpty && got === phraseBrute(texts, ops.TextOps.searchPhrases))
  }

  test("q114 counts overlapping occurrences and handles short docs") {
    import spark.implicits._
    val texts: Seq[(Long, String)] = Seq(
      1L -> "a a a a",        // "a a" occurs at starts 0,1,2 — overlaps count
      2L -> "a",              // shorter than the phrase
      3L -> "b a a b a a b")  // two disjoint occurrences
    val got = ops.TextOps.phraseSearchOf(texts.toDF("doc_id", "text"), Seq("a a"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === Set((1L, 3L), (3L, 2L)))
  }

  test("q164 reconciliation equals a driver cents recompute and partitions all orders") {
    val li = Tables.lineitem(spark, sfDir).select("l_orderkey", "l_extendedprice")
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val orders = Tables.orders(spark, sfDir).select("o_orderkey", "o_totalprice")
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 100)))
    val want = orders.groupBy { case (ok, hdr) =>
      li.get(ok) match {
        case None => "childless"
        case Some(c) if c == hdr => "match"
        case _ => "mismatch"
      }
    }.view.mapValues { rows =>
      val diffs = rows.map { case (ok, hdr) => li.get(ok).map(c => (c - hdr).abs).getOrElse(0L) }
      (rows.size.toLong, diffs.sum, diffs.max)
    }.toMap
    val got = SparkEntry.queries("q164_order_reconcile")(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(got === want)
    assert(got.values.map(_._1).sum === orders.length.toLong, "statuses partition orders")
  }

  test("q145 profile equals a driver recompute per column") {
    val got = SparkEntry.queries("q145_profile")(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5)))).toMap
    val li = Tables.lineitem(spark, sfDir)
    val n = li.count()
    assert(got.size === 11)
    // typed exact recomputes across the three canonicalization families
    val ok = li.select("l_orderkey").collect().map(_.getLong(0))
    assert(got("l_orderkey") ===
      ((n, 0L, ok.distinct.length.toLong, ok.min.toString, ok.max.toString)))
    val rf = li.select("l_returnflag").collect().map(_.getString(0))
    assert(got("l_returnflag") ===
      ((n, 0L, rf.distinct.length.toLong, rf.min, rf.max)))
    val disc = li.select("l_discount").collect().map(_.getDouble(0))
      .map(d => BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP))
    assert(got("l_discount") ===
      ((n, 0L, disc.distinct.length.toLong, disc.min.toString, disc.max.toString)))
    val ship = li.select(unix_micros(col("l_shipdate").cast("timestamp")))
      .collect().map(_.getLong(0))
    assert(got("l_shipdate")._4 === ship.min.toString)
    assert(got("l_shipdate")._5 === ship.max.toString)
  }

  test("q146 integrity: clean star schema, planted orphan detected") {
    val rows = SparkEntry.queries("q146_ref_integrity")(spark, sfDir).collect()
    assert(rows.length === 8)
    assert(rows.forall(_.getBoolean(5)), "synthetic star schema must be orphan-free")
    assert(rows.map(_.getLong(1)).sum > 0)
    // planted: child keys {1,2,99}, parent {1,2} → orphan row/key = 99
    import spark.implicits._
    val child = Seq(1L, 2L, 2L, 99L, 99L).toDF("fk")
    val parent = Seq(1L, 2L).toDF("pk")
    val audit = ops.Warehouse.edgeAudit(child, "fk", parent, "pk", "t.fk->p.pk").head()
    assert((audit.getLong(1), audit.getLong(2), audit.getLong(3),
      audit.getLong(4), audit.getBoolean(5)) === ((5L, 3L, 2L, 1L, false)))
  }

  test("q190 FD audit equals a driver group recompute; key FDs hold") {
    val rows = SparkEntry.queries("q190_fd_audit")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    def recompute(df: org.apache.spark.sql.DataFrame, lhs: String, rhs: String) = {
      val groups = df.select(lhs, rhs).collect()
        .map(r => (r.get(0), r.get(1))).distinct
        .groupBy(_._1).view.mapValues(_.length.toLong).toMap
      (groups.size.toLong, groups.values.count(_ > 1).toLong, groups.values.max)
    }
    val cases = Seq(
      ("part.p_partkey->p_name", Tables.part(spark, sfDir), "p_partkey", "p_name"),
      ("orders.o_custkey->o_orderpriority", Tables.orders(spark, sfDir),
        "o_custkey", "o_orderpriority"),
      ("documents.source->lang", Tables.documents(spark, sfDir), "source", "lang"))
    cases.foreach { case (name, df, lhs, rhs) =>
      val (n, v, mx) = recompute(df, lhs, rhs)
      val r = rows(name)
      assert((r.getLong(1), r.getLong(2), r.getLong(4)) === ((n, v, mx)), name)
      assert(r.getDouble(3) === v.toDouble / n.toDouble, name)
      assert(r.getBoolean(5) === (v == 0L), name)
    }
    // the two by-construction keys must HOLD; the synthetic-corpus FDs must not
    assert(rows("part.p_partkey->p_name").getBoolean(5))
    assert(rows("customer.c_custkey->c_nationkey").getBoolean(5))
    assert(!rows("lineitem.l_orderkey->l_suppkey").getBoolean(5))
  }

  test("q193 join cardinality: exact product-sum matches a real join count") {
    val rows = SparkEntry.queries("q193_join_card_audit")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r).toMap
    // the product-sum must equal the materialized join's row count
    val li = Tables.lineitem(spark, sfDir)
    val ords = Tables.orders(spark, sfDir)
    val actual = li.join(ords, li("l_orderkey") === ords("o_orderkey")).count()
    val r = rows("lineitem.l_orderkey->orders.o_orderkey")
    assert(r.getLong(5) === actual)
    // orderkey is unique in orders, so the estimate denominator is ndv_child
    // and the estimate equals n_child exactly -> ratio 1
    assert(r.getLong(3) >= r.getLong(4) || r.getLong(4) >= r.getLong(3))
    val est = r.getLong(1).toDouble * r.getLong(2).toDouble /
      math.max(r.getLong(3), r.getLong(4)).toDouble
    assert(r.getDouble(6) === est)
    assert(r.getDouble(7) === actual.toDouble / est)
    // events->customer: every event joins (orphan-free, q146), so the exact
    // count equals the events row count
    val ev = rows("events.user_id->customer.c_custkey")
    assert(ev.getLong(5) === Tables.events(spark, sfDir).count())
  }
}
