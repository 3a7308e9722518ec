package graft

import org.scalatest.funsuite.AnyFunSuite

/** Behavioral coverage for the round-14 changes: q117's band-bucket hub cap
  * (never bites at tested sf; bounds a pathological near-uniform corpus) and
  * the q174/q180 two-phase bucket ranks (bit-equal to the one-task window
  * formulations they replaced).
  */
class R14OpsSpec extends AnyFunSuite {
  import SparkTestSession._
  import graft.ops.Multimodal
  import org.apache.spark.sql.functions._

  test("q117 hub cap never bites on real testdata (audit: zero capped buckets)") {
    import spark.implicits._
    val media = Tables.documents(spark, sfDir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"),
        lit("image/fake").as("mime"))
      .as[Multimodal.MediaRow]
    val audit = Multimodal.phashBucketAudit(media)
    assert(audit.count() > 0)
    assert(audit.filter(col("capped")).count() === 0,
      "default cap bit on real testdata — published hashes would change")
    // cap headroom vs the measured maxima (sf0.1: 390; ~sf1 stress: 3945)
    assert(Multimodal.PhashBucketCap > 3945)
  }

  test("q117 hub cap bounds a pathological near-uniform media corpus") {
    import spark.implicits._
    // 20 identical payloads (one phash → its 9 buckets each hold 20 docs)
    // plus 2 identical outliers whose buckets stay tiny
    val uniform = (1L to 20L).map(i =>
      Multimodal.MediaRow(i, ("the same letterbox frame repeated " * 4).getBytes("UTF-8"), "image/fake"))
    val outliers = Seq(101L, 102L).map(i =>
      Multimodal.MediaRow(i, "zq xv wk pl mn ab cd ef gh ij kl mn op".getBytes("UTF-8"), "image/fake"))
    val media = spark.createDataset(uniform ++ outliers)
    // uncapped: the 20-doc clique alone yields 190 pairs
    val uncapped = Multimodal.phashNearDupOf(media, cap = Int.MaxValue)
    assert(uncapped.filter(col("doc_a") <= 20 && col("doc_b") <= 20).count() === 190)
    // cap = 8: every bucket of the uniform clique (20 docs) is dropped, the
    // outlier pair (bucket size 2) survives — candidates bounded, audit sees it
    val capped = Multimodal.phashNearDupOf(media, cap = 8)
    assert(capped.filter(col("doc_a") <= 20 && col("doc_b") <= 20).count() === 0,
      "capped buckets still produced clique pairs")
    assert(capped.filter(col("doc_a") === 101L && col("doc_b") === 102L).count() === 1,
      "cap dropped a small-bucket pair it should keep")
    val audit = Multimodal.phashBucketAudit(media, cap = 8)
    val cappedBuckets = audit.filter(col("capped"))
    assert(cappedBuckets.count() > 0, "audit missed the hub buckets")
    // the clique's buckets hold all 20 docs (22 where an outlier happens to
    // share a band value) — the audit must report the TRUE uncapped size
    assert(cappedBuckets.agg(max("n_docs")).head.getLong(0) >= 20L,
      "audit's uncapped count must report the TRUE bucket size")
  }

  test("q174/q180 two-phase bucket ranks equal the one-task window formulations") {
    import org.apache.spark.sql.expressions.Window
    // q174: registered (two-phase) global_pos vs a direct global window
    val q174 = SparkEntry.queries("q174_interleaved_order")(spark, sfDir)
    val naive174 = q174.select("doc_id", "source", "k", "n_src", "frac")
      .withColumn("global_pos", row_number().over(
        Window.orderBy(col("frac"), col("source"), col("doc_id"))).cast("long"))
    assert(q174.count() === naive174.count())
    assert(q174.except(naive174).count() === 0)
    assert(naive174.except(q174).count() === 0)
    // q180: the closed-form NTILE bucketing vs the window NTILE, compared on
    // the bucket assignment's downstream aggregate (the query's own output)
    val q180 = SparkEntry.queries("q180_probe_calibration")(spark, sfDir)
    assert(q180.count() === 10)
    // deciles of N rows: sizes differ by at most 1 and sum to N
    val sizes = q180.select("n").collect().map(_.getLong(0))
    assert(sizes.max - sizes.min <= 1,
      s"NTILE closed form produced uneven deciles: ${sizes.mkString(",")}")
    assert(sizes.sum === Tables.documents(spark, sfDir).count())
  }
}
