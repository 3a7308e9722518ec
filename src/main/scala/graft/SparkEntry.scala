package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  private def registry: Seq[Q] =
    pipelines.Pipelines.all ++ ops.Dedup.all ++ ops.DedupCluster.all ++
      ops.Similarity.all ++ ops.Spectral.all ++
      ops.TextOps.all ++ ops.CorpusOps.all ++ ops.Bpe.all ++
      ops.Multimodal.all ++ ops.Sampling.all ++
      ops.Skew.all ++ ops.Sources.all ++
      ops.Analytics.all ++ ops.TypedAgg.all ++ ops.Warehouse.all ++
      ops.EventOps.all ++ ops.LineageQueries.all ++ ops.Subqueries.all ++
      streaming.StreamingSessions.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    pipelines.Pipelines.q11.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. Evaluated
    * after the queries run (Verify's dump order), so dynamic oracles can
    * embed run-derived literals such as the trained IVF centroids. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q =>
      q.oracleDyn.flatMap(_()).orElse(q.oracle).map(q.name -> _)).toMap
}
