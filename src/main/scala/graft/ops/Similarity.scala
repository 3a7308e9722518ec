package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.{Q, Tables}

/** Similarity search over the embeddings table (vec_id, embedding float[64],
  * label) — reference analog: exact FAISS IndexFlatL2 retrieval
  * (/root/reference/qa/embed_index.py:41-46, qa/ask.py:135-152), generalized to
  * cosine top-k plus an LSH-bucketed scale path.
  *
  * Scale design: the query side is a small sample broadcast to every executor,
  * so the scan side streams once with no shuffle of the corpus; top-k is a
  * per-query-partition window. At 100 TB the same plan holds — corpus stays
  * partitioned, queries broadcast, and the LSH variant cuts the per-query scan
  * to one signature bucket.
  *
  * Cosine is computed as a sequential double fold (aggregate HOF over
  * double-cast floats) which is bit-identical to DuckDB's
  * list_dot_product(CAST(e AS DOUBLE[])) — verified — so these have full
  * oracles despite floating-point outputs.
  */
object Similarity {

  /** vec_id % 50 == 0 → 2% query sample; same modulus in the oracles. */
  private val queryMod = 50

  private def withNorm(s: SparkSession, dir: String): DataFrame = {
    graft.functions.VectorFunctions.register(s)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), expr("transform(embedding, x -> cast(x as double))").as("v"))
      .withColumn("norm", expr("sqrt(vec_dot(v, v))"))
  }

  private def scored(s: SparkSession, dir: String): DataFrame = {
    val e = withNorm(s, dir)
    val q = e.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("dot", expr("vec_dot(qv, v)"))
      .withColumn("cos", col("dot") / (col("qn") * col("norm")))
  }

  private def oracleBase =
    s"""WITH e AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
      ), n AS (
        SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS norm FROM e
      ), q AS (
        SELECT vec_id AS q_id, v AS qv, norm AS qn FROM n WHERE vec_id % $queryMod = 0
      ), sims AS (
        SELECT q.q_id, n.vec_id,
               list_dot_product(q.qv, n.v) / (q.qn * n.norm) AS cos,
               row_number() OVER (PARTITION BY q.q_id
                 ORDER BY list_dot_product(q.qv, n.v) / (q.qn * n.norm) DESC, n.vec_id) AS rn
        FROM q JOIN n ON n.vec_id <> q.q_id
      )"""

  /** Embedding-cosine near-dup: nearest neighbor per sampled vector + flag. */
  val embeddingNearDup: Q = Q(
    "q17_dedup_embedding",
    (s, dir) => {
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("q_id"), col("vec_id").as("nearest_id"), col("cos"),
          when(col("cos") >= 0.95, 1).otherwise(0).as("is_near_dup"))
    },
    Some(oracleBase +
      """
      SELECT q_id, vec_id AS nearest_id, cos,
             CASE WHEN cos >= 0.95 THEN 1 ELSE 0 END AS is_near_dup
      FROM sims WHERE rn = 1"""))

  /** Brute-force cosine top-k (k=5) — the exact baseline every ANN variant is
    * measured against (IndexFlatL2 parity: exact, no approximation). */
  val knnBruteForce: Q = Q(
    "q18_knn_bruteforce",
    (s, dir) => {
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      scored(s, dir)
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
    },
    Some(oracleBase +
      """
      SELECT q_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank, cos
      FROM sims WHERE rn <= 5"""))

  /** Random-hyperplane (SimHash-for-vectors) LSH top-k: 16 deterministic
    * hyperplanes → 16-bit signature → candidates share a 4-bit band → exact
    * cosine re-rank inside the candidate set. Approximate: per-query scan cost
    * drops to the matching buckets (recall vs q18 is asserted in tests). */
  val knnLsh: Q = Q(
    "q19_knn_lsh",
    (s, dir) => {
      val planes: Seq[Seq[Double]] = {
        val rnd = new scala.util.Random(42)
        Seq.fill(16)(Seq.fill(64)(rnd.nextGaussian()))
      }
      val planesCol = typedLit(planes)
      val e = withNorm(s, dir).withColumn("planes", planesCol)
        .withColumn("sig",
          expr("""aggregate(
            transform(planes, p -> if(aggregate(zip_with(p, v, (x, y) -> x * y), 0D, (acc, x) -> acc + x) > 0D, 1, 0)),
            0, (acc, b) -> acc * 2 + b)"""))
        .drop("planes")
      val bandRows = e.select(col("vec_id"), col("v"), col("norm"), col("sig"),
        explode(array((0 until 4).map(i =>
          struct(lit(i).as("band_idx"), expr(s"(sig >> ${4 * i}) & 15").as("band_key"))): _*)).as("bk"))
        .select(col("vec_id"), col("v"), col("norm"),
          col("bk.band_idx").as("band_idx"), col("bk.band_key").as("band_key"))
      val q = bandRows.filter(col("vec_id") % queryMod === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"),
          col("band_idx").as("q_band_idx"), col("band_key").as("q_band_key"))
      val cand = bandRows.join(broadcast(q),
          col("band_idx") === col("q_band_idx") && col("band_key") === col("q_band_key")
            && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("qv"), col("qn"), col("vec_id"), col("v"), col("norm"))
        .dropDuplicates("q_id", "vec_id")
        .withColumn("dot", expr("vec_dot(qv, v)"))
        .withColumn("cos", col("dot") / (col("qn") * col("norm")))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      cand.withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
    },
    None)

  /** IVF-style ANN: seeded KMeans coarse quantizer (16 cells), queries probe
    * their 3 nearest centroids, exact cosine re-rank inside the probed cells.
    * The 100 TB shape: the corpus is partitioned by cell, a query touches
    * 3/16ths of it instead of all of it; recall vs q18 asserted in tests. */
  val knnIvf: Q = Q(
    "q34_knn_ivf",
    (s, dir) => {
      import org.apache.spark.ml.clustering.KMeans
      import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
      val e = withNorm(s, dir).withColumn("features", array_to_vector(col("v")))
      val model = new KMeans().setK(16).setSeed(42).setMaxIter(10)
        .setFeaturesCol("features").fit(e)
      val assigned = model.transform(e)
        .select(col("vec_id"), col("v"), col("norm"), col("prediction").as("cell"))
      val centroids = s.createDataFrame(
          model.clusterCenters.zipWithIndex.toSeq.map { case (c, i) => (i, c.toArray.toSeq) })
        .toDF("cent_cell", "cvec")
      val q = assigned.filter(col("vec_id") % queryMod === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("norm").as("qn"))
      // probe: 3 nearest centroids per query (centroid table is tiny → broadcast)
      val wProbe = Window.partitionBy(col("q_id")).orderBy(col("cdist"), col("cent_cell"))
      val probes = q.join(broadcast(centroids))
        .withColumn("cdist", expr("vec_l2sq(qv, cvec)"))
        .withColumn("probe_rank", row_number().over(wProbe))
        .filter(col("probe_rank") <= 3)
        .select(col("q_id"), col("qv"), col("qn"), col("cent_cell").as("cell"))
      val w = Window.partitionBy(col("q_id")).orderBy(col("cos").desc, col("vec_id"))
      assigned.join(broadcast(probes), Seq("cell"))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("cos", expr("vec_dot(qv, v)") / (col("qn") * col("norm")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 5)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"), col("cos"))
    },
    None)

  val all: Seq[Q] = Seq(embeddingNearDup, knnBruteForce, knnLsh, knnIvf)
}
