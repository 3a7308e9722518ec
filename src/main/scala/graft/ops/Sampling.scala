package graft.ops

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

  val all: Seq[Q] = Seq(trainSplit)
}
