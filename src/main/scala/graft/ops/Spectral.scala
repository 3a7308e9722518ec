package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Distributed spectral analysis of the embeddings table: the dominant
  * principal direction (top right-singular vector of the uncentered data
  * matrix) via power iteration, then every vector's projection onto it.
  * The classic corpus use: a 1-D semantic axis for curriculum ordering,
  * outlier surfacing, and whitening diagnostics.
  *
  * Power iteration is Gram-vector products: w = Aᵀ(A·u) = Σᵢ (vᵢ·u)·vᵢ —
  * one aggregation pass over the corpus per iteration, with `u` broadcast
  * as a 64-double plan literal. No matrix is ever materialized; per-row
  * work is one codegen'd vec_dot + 64 multiplies.
  *
  * Determinism contract (what makes the oracle possible): floating-point
  * partial-sum order varies with partitioning, so the per-dimension sums
  * run in DECIMAL(38,12) — each row's contribution is deterministically
  * rounded to 12 dp, and decimal addition is exact and order-independent.
  * The resulting iterate (and thus the converged direction) is bit-identical
  * across any parallelism geometry. The driver normalizes the 64-vector
  * between iterations with a fixed left-to-right op sequence. The final
  * per-vector projection vᵢ·u is a sequential double fold — bit-identical
  * to DuckDB's list_dot_product — so the dynamic oracle just embeds the
  * converged direction as a DOUBLE[] literal.
  *
  * Scale shape: T=10 scans of the corpus (the input is a cached narrow
  * projection), each a 64-key partial aggregation — map-side combine
  * collapses every partition to ≤64 rows before the shuffle, so wire volume
  * is independent of N. DECIMAL(38,12) leaves 26 integer digits of headroom:
  * contributions are O(‖v‖²) ≈ 10², so overflow needs ~10²⁴ rows.
  */
object Spectral {

  private val dims = 64
  private val iterations = 10

  /** Converged direction per sf-dir for the dynamic oracle (same contract as
    * [[Similarity.IvfIndex]]: Verify pins the dump's dir via the
    * `graft.oracle.sfdir` system property; last-dir is the fallback). */
  private val mem =
    new scala.collection.concurrent.TrieMap[(String, Long), Seq[Double]]()
  private val lastByDir =
    new scala.collection.concurrent.TrieMap[String, Seq[Double]]()
  @volatile private var lastDir: Option[String] = None

  private def forOracle: Option[Seq[Double]] =
    sys.props.get("graft.oracle.sfdir").orElse(lastDir).flatMap(lastByDir.get)

  /** Train-once dominant direction: T power iterations from the exact
    * all-ones start (1/√64 = 0.125 is dyadic), each one distributed
    * Gram-vector pass. Memoized per (dir, corpus fingerprint). */
  private[graft] def principalDirection(s: SparkSession, dir: String): Seq[Double] = {
    val fp = Artifacts.fingerprint(s, s"$dir/embeddings.parquet")
    val u = mem.getOrElseUpdate((dir, fp), {
      graft.functions.VectorFunctions.register(s)
      val e = Tables.embeddings(s, dir)
        .select(expr("transform(embedding, x -> cast(x as double))").as("v"))
        .persist()
      var cur: Array[Double] = Array.fill(dims)(0.125d)
      try {
        for (_ <- 1 to iterations) {
          val uLit = typedLit(cur.toSeq)
          // per-row contribution array (vᵢ·u)·vᵢ, exploded to (dim, contrib)
          // and summed exactly in decimal — 64 groups, map-side combined
          val sums = e.withColumn("u", uLit)
            .select(posexplode(expr(
              "transform(v, x -> cast(x * vec_dot(v, u) as decimal(38,12)))"))
              .as(Seq("dim", "contrib")))
            .groupBy(col("dim")).agg(sum("contrib").as("w"))
            .collect().map(r => r.getInt(0) -> r.getDecimal(1).doubleValue()).toMap
          val w = Array.tabulate(dims)(j => sums.getOrElse(j, 0d))
          // fixed-order normalization (left-to-right) keeps the driver math
          // deterministic too
          var ss = 0d
          var j = 0
          while (j < dims) { ss += w(j) * w(j); j += 1 }
          val norm = math.sqrt(ss)
          cur = w.map(_ / norm)
        }
      } finally e.unpersist()
      cur.toSeq
    })
    lastByDir.put(dir, u)
    lastDir = Some(dir)
    u
  }

  /** q122: dominant principal direction + per-vector projection and rank.
    * The projection is the bit-exact sequential dot fold both engines share;
    * the oracle embeds the converged direction the run itself produced. */
  val pcaProjection: Q = Q(
    "q122_pca_power",
    (s, dir) => {
      graft.functions.VectorFunctions.register(s)
      val uLit = typedLit(principalDirection(s, dir))
      Tables.embeddings(s, dir)
        .select(col("vec_id"),
          expr("transform(embedding, x -> cast(x as double))").as("v"))
        .withColumn("u", uLit)
        .select(col("vec_id"), expr("vec_dot(v, u)").as("proj"))
    },
    None,
    Some(() => forOracle.map { u =>
      val uLit = graft.SqlLit.doubles(u)
      s"""SELECT vec_id,
             list_dot_product(CAST(embedding AS DOUBLE[]),
                              CAST($uLit AS DOUBLE[])) AS proj
      FROM embeddings"""
    }))

  val all: Seq[Q] = Seq(pcaProjection)
}
