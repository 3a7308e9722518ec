package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Deterministic dataset splitting for training pipelines: membership is a
  * pure function of a salt and the stable row key, so the split is
  * reproducible across runs/engines, leakage-proof under re-partitioning or
  * re-ingestion (a document never migrates between train and val), requires
  * no shuffle, no stored assignment table, and no RNG state. The hash family
  * is md5 hex compared lexicographically — uniform over [0,1) at ~4 bits per
  * leading hex digit, and bit-identical in Spark and DuckDB, so the split is
  * fully oracled.
  */
object Sampling {

  private val salt = "split42" // the seed: change to re-draw the split
  // md5 < "e6" keeps 230/256 ≈ 89.8% of keys → train; the rest → val
  private val trainThreshold = "e6"

  /** Hash-based train/val split over the documents table (~90/10). */
  val trainSplit: Q = Q(
    "q48_train_split",
    (s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          when(md5(concat_ws("|", lit(salt), col("doc_id").cast("string")))
            < trainThreshold, "train").otherwise("val").as("split"))
    },
    Some(s"""SELECT doc_id,
        CASE WHEN md5('$salt' || '|' || CAST(doc_id AS VARCHAR)) < '$trainThreshold'
             THEN 'train' ELSE 'val' END AS split
      FROM documents"""))

  /** Deterministic seeded GLOBAL training order — every epoch pipeline's
    * last step is "shuffle the corpus", and the naive formulation
    * (`row_number() OVER (ORDER BY key)`) funnels 100 TB through ONE task.
    * This assigns the identical total-order rank with bucket-parallel
    * sorting instead:
    *
    *   1. shuffle key = md5 of (doc_id, seed) — reproducible across runs,
    *      engines and partitionings, no RNG state (q48's hash family);
    *   2. bucket = first 2 hex chars of the key (256 ranges of the SAME
    *      lexicographic order the rank is defined over);
    *   3. per-bucket counts (256-row aggregate) → exclusive prefix offsets,
    *      a driver-size window;
    *   4. rank = bucket offset + row_number within the bucket — 256-way
    *      parallel windows, each ~1/256 of the corpus.
    *
    * Identical to the one-task formulation row for row (md5 has no ties and
    * bucket ranges are order-aligned prefixes), which is exactly what the
    * oracle runs. At 1000 executors, raise the prefix length (4 hex chars =
    * 65536 buckets) — parallelism scales as 16^k with no plan change. */
  val trainOrder: Q = Q(
    "q100_train_order",
    (s, dir) => {
      val keyed = Tables.documents(s, dir)
        .select(col("doc_id"),
          md5(concat_ws("|", lit(salt), col("doc_id").cast("string"), lit("order")))
            .as("shuffle_key"))
        .withColumn("bucket", substring(col("shuffle_key"), 1, 2))
      val offsets = keyed.groupBy("bucket").agg(count(lit(1)).as("bn"))
        .withColumn("off", coalesce(
          sum("bn").over(Window.orderBy("bucket")
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("bucket", "off")
      keyed.join(broadcast(offsets), Seq("bucket"))
        .withColumn("train_rank", col("off") +
          row_number().over(Window.partitionBy("bucket").orderBy("shuffle_key")))
        .select(col("doc_id"), col("shuffle_key"), col("train_rank"))
    },
    Some(s"""SELECT doc_id,
        md5('$salt' || '|' || CAST(doc_id AS VARCHAR) || '|' || 'order') AS shuffle_key,
        row_number() OVER (
          ORDER BY md5('$salt' || '|' || CAST(doc_id AS VARCHAR) || '|' || 'order')
        ) AS train_rank
      FROM documents"""))

  val all: Seq[Q] = Seq(trainSplit, trainOrder)
}
