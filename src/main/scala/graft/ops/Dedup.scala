package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Deduplication operators for training-data pipelines, each designed for the
  * 100 TB shape of the problem:
  *
  *  - exact: shuffle on a 128-bit content hash, never on raw text (bytes moved
  *    per row = 16 + ids, not document size);
  *  - n-gram Jaccard: inverted-index self-join on *rare* shingles (document
  *    frequency capped) — the standard way to avoid both the O(n²) cross join
  *    and hot-key explosion on stop-shingles;
  *  - MinHash+LSH: fixed-width signature (16 minhashes) + banded bucket join,
  *    candidates verified by signature agreement;
  *  - SimHash: 64-bit signature via per-bit weighted majority, near-dup probe
  *    via 16-bit band collision counts.
  *
  * Reference has no dedup surface (capability extension; BASELINE.json north
  * star). Signature ops use xxhash64 (not available in DuckDB) → rows-only
  * checks; exact + n-gram Jaccard have full oracles.
  */
object Dedup {

  /** Exact dedup by content hash: one representative (min doc_id) per distinct
    * text + duplicate count. */
  val exact: Q = Q(
    "q13_dedup_exact",
    (s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("content_hash"))
        .agg(
          min(col("doc_id")).as("canonical_doc_id"),
          count(lit(1)).as("dup_count"))
    },
    Some("""SELECT md5(text) AS content_hash, min(doc_id) AS canonical_doc_id,
      count(1) AS dup_count FROM documents GROUP BY md5(text)"""))

  /** Distinct word 3-grams per doc, exploded to (doc_id, ngram). */
  private def ngramRows(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("words"))
      .filter(size(col("words")) >= 3)
      .select(col("doc_id"), explode(array_distinct(expr(
        "transform(sequence(0, size(words)-3), i -> concat(words[i], ' ', words[i+1], ' ', words[i+2]))")))
        .as("ngram"))

  private val maxDf = 50 // shingles seen in more docs than this are stop-shingles

  /** Exact n-gram Jaccard over rare shingles via inverted-index self-join:
    * pairs sharing ≥1 rare 3-gram, jaccard = |∩| / |∪| of rare-shingle sets. */
  val ngramJaccard: Q = Q(
    "q14_dedup_ngram_jaccard",
    (s, dir) => {
      val ng = ngramRows(s, dir)
      // df >= 2: singleton shingles can't produce pairs; df <= maxDf kills hot keys
      val rare = ng.groupBy("ngram").agg(count(lit(1)).as("df"))
        .filter(col("df") >= 2 && col("df") <= maxDf)
        .select("ngram")
      // ngr feeds four consumers (pair join ×2, sizes, output) — materialize
      // once instead of re-running the explode+join subtree per consumer
      val ngr = ng.join(rare, "ngram").persist()
      val sizes = ngr.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val pairs = ngr.as("a").join(ngr.as("b"),
          col("a.ngram") === col("b.ngram") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("common"))
      pairs
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
        .withColumn("jaccard", col("common") / (col("na") + col("nb") - col("common")))
        .filter(col("jaccard") >= 0.5)
        .select(col("doc_a"), col("doc_b"), col("common"), col("jaccard"))
    },
    Some(s"""WITH docs AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
        WHERE len(string_split(text, ' ')) >= 3
      ), ng AS (
        SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(words)-1),
               i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS ngram
        FROM docs
      ), rare AS (
        SELECT ngram FROM ng GROUP BY ngram HAVING count(1) >= 2 AND count(1) <= $maxDf
      ), ngr AS (
        SELECT ng.doc_id, ng.ngram FROM ng JOIN rare ON ng.ngram = rare.ngram
      ), sizes AS (
        SELECT doc_id, count(1) AS n FROM ngr GROUP BY doc_id
      ), pairs AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(1) AS common
        FROM ngr a JOIN ngr b ON a.ngram = b.ngram AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
      )
      SELECT p.doc_a, p.doc_b, p.common,
             p.common / (sa.n + sb.n - p.common) AS jaccard
      FROM pairs p
      JOIN sizes sa ON p.doc_a = sa.doc_id
      JOIN sizes sb ON p.doc_b = sb.doc_id
      WHERE p.common / (sa.n + sb.n - p.common) >= 0.5"""))

  private val numHashes = 16
  private val bands = 4 // 4 minhashes per band

  /** MinHash signatures over 3-gram shingles + banded LSH candidate pairs,
    * scored by signature agreement (estimated Jaccard ≥ 0.5). */
  val minhashLsh: Q = Q(
    "q15_dedup_minhash_lsh",
    (s, dir) => {
      val ng = ngramRows(s, dir)
      val mh = (0 until numHashes).map(i =>
        min(xxhash64(lit(i), col("ngram"))).as(s"mh$i"))
      val sigs = ng.groupBy("doc_id").agg(mh.head, mh.tail: _*).persist()
      val bandCols = (0 until bands).map { b =>
        struct(lit(b).as("band_idx"),
          xxhash64((b * numHashes / bands until (b + 1) * numHashes / bands)
            .map(i => col(s"mh$i")): _*).as("band_hash"))
      }
      val bandRows = sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
        .select(col("doc_id"), col("bk.band_idx").as("band_idx"), col("bk.band_hash").as("band_hash"))
      val cand = bandRows.as("a").join(bandRows.as("b"),
          col("a.band_idx") === col("b.band_idx") && col("a.band_hash") === col("b.band_hash")
            && col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .distinct()
      val agree: Column = (0 until numHashes)
        .map(i => when(col(s"sa.mh$i") === col(s"sb.mh$i"), 1).otherwise(0))
        .reduce(_ + _).cast("long")
      cand
        .join(sigs.as("sa"), col("doc_a") === col("sa.doc_id"))
        .join(sigs.as("sb"), col("doc_b") === col("sb.doc_id"))
        .select(col("doc_a"), col("doc_b"),
          (agree / lit(numHashes.toDouble)).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
    },
    None)

  /** 64-bit SimHash per document (weighted per-bit majority over token hashes)
    * + near-dup collision counts via 4×16-bit LSH bands. One row per doc. */
  val simhash: Q = Q(
    "q16_dedup_simhash",
    (s, dir) => {
      val tok = Tables.documents(s, dir)
        .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
        .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
        .withColumn("h", xxhash64(col("w")))
      val bitSums = (0 until 64).map(b =>
        sum(when(expr(s"((h >> $b) & 1) = 1"), col("cnt")).otherwise(-col("cnt"))).as(s"s$b"))
      val sums = tok.groupBy("doc_id").agg(bitSums.head, bitSums.tail: _*)
      val sim: Column = (0 until 64)
        .map(b => when(col(s"s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
        .reduce((a, c) => a.bitwiseOR(c))
      val sigs = sums.select(col("doc_id"), sim.as("simhash"))
      val bandRows = sigs.select(col("doc_id"), col("simhash"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("band_idx"),
            expr(s"(simhash >> ${16 * i}) & 65535").as("band_key"))): _*)).as("bk"))
        .select(col("doc_id"), col("simhash"),
          col("bk.band_idx").as("band_idx"), col("bk.band_key").as("band_key"))
      val collisions = bandRows.as("a").join(bandRows.as("b"),
          col("a.band_idx") === col("b.band_idx") && col("a.band_key") === col("b.band_key")
            && col("a.doc_id") =!= col("b.doc_id"))
        .filter(expr("bit_count(a.simhash ^ b.simhash) <= 6"))
        .select(col("a.doc_id").as("doc_id"), col("b.doc_id").as("other"))
        .distinct()
        .groupBy("doc_id").agg(count(lit(1)).as("near_dup_count"))
      sigs.join(collisions, Seq("doc_id"), "left")
        .select(col("doc_id"), col("simhash"),
          coalesce(col("near_dup_count"), lit(0L)).as("near_dup_count"))
    },
    None)

  val all: Seq[Q] = Seq(exact, ngramJaccard, minhashLsh, simhash)
}
