package graft.lineage

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model._

/** Canonical lineage edges, repo stitching, dependency graphs and BFS closures
  * — the reference's postprocess/stitch/QA-graph layer
  * (lineage_postprocess.py:12-121, stitch_repo.py:4-30, qa/ask.py:167-341) as
  * Dataset transformations. All inputs/outputs are flat Datasets, so at 100 TB
  * of lineage metadata every step is a shuffle-partitioned join/groupBy, not a
  * driver-side dict walk.
  */
object Lineage {

  /** Canonical column edges from extracted lineage (A11). Dedup key mirrors
    * the reference: (df, target, sorted sources) — lineage_postprocess.py:106-118.
    *
    * Dedup keeps the FIRST occurrence in plan-walk order (r13): the prior
    * `dropDuplicates` delegates to a `first()` aggregate whose surviving
    * `reason` is whatever row the shuffle read first — deterministic for a
    * fixed local relation but unspecified under repartitioning. The
    * explicit ordinal window pins the semantics ("earliest plan node wins",
    * the reference's insertion-order dict behavior) so the q25 DuckDB
    * oracle can recompose the exact rows from the raw plan-node dump. */
  def edges(spark: SparkSession, lineages: Seq[ScriptLineage]): Dataset[Edge] = {
    import spark.implicits._
    val raw = for {
      sl <- lineages
      df <- sl.dfs
      cd <- df.columns
      s <- cd.sources
    } yield {
      val (srcDf, srcCol) = s.span(_ != '.') match {
        case (d, c) if c.nonEmpty => (d, c.drop(1))
        case (c, _) => ("", c)
      }
      Edge(sl.script, df.name, cd.name, srcDf, srcCol, cd.transformation)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("script", "df", "targetCol", "srcDf", "srcCol")
      .orderBy(col("ord"))
    spark.createDataset(raw.zipWithIndex.map { case (e, i) => (e, i.toLong) })
      .select(col("_1.*"), col("_2").as("ord"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("ord", "rn")
      .as[Edge]
  }

  /** Writer→reader stitching on shared (already-normalized) asset paths (A12):
    * an equi-join of writes against reads, trailing slashes stripped —
    * stitch_repo.py:4-30. */
  def stitch(spark: SparkSession, lineages: Seq[ScriptLineage]): Dataset[RepoLink] = {
    import spark.implicits._
    val assets = spark.createDataset(lineages.flatMap(_.assets))
      .withColumn("norm", regexp_replace(col("path"), "/+$", ""))
    val writes = assets.filter(col("direction") === "write")
      .select(col("script").as("fromScript"), col("norm"))
    val reads = assets.filter(col("direction") === "read")
      .select(col("script").as("toScript"), col("norm"))
    writes.join(reads, "norm")
      .filter(col("fromScript") =!= col("toScript"))
      .select(col("fromScript"), col("toScript"), col("norm").as("asset"))
      .distinct()
      .as[RepoLink]
  }

  /** Global column dependency graph (A18): name-level src→dst with reasons —
    * the reference aliases same-named columns across scripts (qa/ask.py:185-200,
    * kept deliberately, SURVEY §4.3.5) — plus the df-qualified pair for
    * precision. */
  def columnGraph(edges: Dataset[Edge]): DataFrame =
    edges.select(
      col("srcCol").as("src"),
      col("targetCol").as("dst"),
      concat_ws("", col("script"), lit(": "), col("srcDf"), lit("."), col("srcCol"),
        lit(" -> "), col("df"), lit("."), col("targetCol"),
        lit(" ("), col("reason"), lit(")")).as("reason"))
      .filter(col("src") =!= col("dst")) // self-loops would never terminate BFS usefully
      .distinct()

  /** Edge-count threshold below which a closure runs as a driver BFS: a
    * column-lineage graph is REPO METADATA — O(scripts × columns), not data
    * volume — so at any plausible repo size the complete edge list fits in
    * driver memory and scheduling a Spark job per BFS level is pure
    * overhead (measured: ~15 tiny jobs to walk a 130-edge graph). The
    * distributed loop below stays the path for graphs that outgrow this. */
  private[graft] val DriverBfsMaxEdges = 65536

  /** Downstream transitive closure from a start column (A19): BFS with
    * min-depth semantics, capped — qa/ask.py:211-223 (limit 2000).
    *
    * Adaptive execution: one bounded probe (`limit(threshold+1).collect`)
    * decides the path — a complete in-memory edge list runs the BFS on the
    * driver ([[driverClosure]]); a larger graph runs the iterative
    * frontier-join loop ([[distributedClosure]], checkpoint-per-iteration
    * at scale). Both implement identical semantics, asserted against each
    * other in InfraSpec. */
  def downstreamClosure(spark: SparkSession, graph: DataFrame, start: String,
      limit: Int = 2000, maxDepth: Int = 20): DataFrame = {
    val edgePlan = graph.select(col("src"), col("dst")).distinct()
    val probe = edgePlan.limit(DriverBfsMaxEdges + 1).collect()
    if (probe.length <= DriverBfsMaxEdges)
      driverClosure(spark, probe.map(r => (r.getString(0), r.getString(1))),
        start, limit, maxDepth)
    else distributedClosure(spark, edgePlan, start, limit, maxDepth)
  }

  /** Driver BFS over a complete in-memory edge list — the metadata-sized
    * path. Level-synchronous with the same cap truncation (complete levels,
    * then alphabetical fill of the overflowing level) as the distributed
    * loop. */
  private[graft] def driverClosure(spark: SparkSession, edges: Seq[(String, String)],
      start: String, limit: Int = 2000, maxDepth: Int = 20): DataFrame =
    localDepthFrame(spark, driverClosureSeq(edges, start, limit, maxDepth), "column")

  /** Seq core of [[driverClosure]] — also consumed directly by the evidence
    * assembly (qa.Ask), which merges several candidates' closures without
    * round-tripping each through a frame. */
  private[graft] def driverClosureSeq(edges: Seq[(String, String)],
      start: String, limit: Int = 2000, maxDepth: Int = 20): Seq[(String, Int)] =
    driverBfsSeq(edges, Seq(start), includeSeeds = false, limit, maxDepth)

  /** The ONE driver-side level-synchronous BFS — single- and multi-seed
    * closures ([[driverClosureSeq]], [[downstreamScripts]]) both delegate
    * here so cap/min-depth semantics cannot drift between them. Cap
    * truncation keeps complete levels, then alphabetical fill of the
    * overflowing level (see downstreamClosure's boundary note). */
  private[graft] def driverBfsSeq(edges: Seq[(String, String)], seeds: Seq[String],
      includeSeeds: Boolean, limit: Long = Long.MaxValue,
      maxDepth: Int = 20): Seq[(String, Int)] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).distinct }
    val ds = seeds.distinct
    val acc = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    if (includeSeeds) acc ++= ds.map(_ -> 0)
    var seen = ds.toSet
    var frontier: Seq[String] = ds
    var have = ds.size.toLong
    var depth = 0
    var done = false
    while (!done && depth < maxDepth) {
      depth += 1
      val next = frontier.flatMap(adj.getOrElse(_, Nil)).distinct.filterNot(seen)
      if (next.isEmpty) done = true
      else if (have + next.size > limit) {
        acc ++= next.sorted.take((limit - have).toInt).map(_ -> depth)
        done = true
      } else {
        acc ++= next.map(_ -> depth)
        seen ++= next
        have += next.size
        frontier = next
      }
    }
    acc.toSeq
  }

  /** (key, depth) pairs → a sorted local relation — the shared scaffolding
    * for every driver-path closure result. */
  private[graft] def localDepthFrame(spark: SparkSession,
      pairs: Seq[(String, Int)], keyName: String): DataFrame = {
    val rows = pairs.sortBy { case (k, d) => (d, k) }
      .map { case (k, d) => org.apache.spark.sql.Row(k, d) }
    spark.createDataFrame(java.util.Arrays.asList(rows: _*),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField(keyName,
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("depth",
          org.apache.spark.sql.types.IntegerType))))
  }

  /** Iterative frontier-join closure — the path for graphs too large to
    * collect. Same loop is checkpoint-per-iteration at scale.
    *
    * Checkpoint lifecycle (round-7 audit): each round's barriers are freed
    * as soon as the next round's barrier is materialized (only the newest
    * frontier/result are live), and since the result is CAPPED at `limit`
    * rows by reference semantics it is collected into a local relation at
    * the end so the final barriers release too — repeated invocations leave
    * zero persisted RDDs behind. */
  private[graft] def distributedClosure(spark: SparkSession, edgePlan: DataFrame,
      start: String, limit: Int = 2000, maxDepth: Int = 20): DataFrame = {
    import spark.implicits._
    val edges = edgePlan.cache()
    var result = Seq((start, 0)).toDF("column", "depth")
    var frontier = result
    var liveCks = Seq.empty[DataFrame] // barriers the current round still reads
    var depth = 0
    var have = 1L // running |result| — avoids a recount job every depth
    var done = false
    try {
      while (!done && depth < maxDepth) {
        depth += 1
        // localCheckpoint truncates the logical plan each iteration — without
        // it the union+anti-join recursion doubles the plan per depth (2^d
        // nodes); on a cluster this is checkpoint()-per-iteration
        val next = graft.Ckpt.eager(frontier.select(col("column").as("fcol")).as("f")
          .join(edges.as("e"), col("fcol") === col("e.src"))
          .select(col("e.dst").as("column"), lit(depth).as("depth"))
          .distinct()
          .join(result.select(col("column").as("seen")), col("column") === col("seen"), "left_anti"))
        val cnt = next.count()
        if (cnt == 0) { graft.Ckpt.free(next); done = true }
        else if (have + cnt > limit) {
          // truncate the overflowing level to exactly `limit` total nodes,
          // deterministically (ordered by column name). The reference
          // (qa/ask.py:211-223) stops in BFS discovery order (per-parent
          // sorted-neighbor queue), so at the cap boundary the retained
          // subset can differ; below the cap the closures are identical.
          val capped = graft.Ckpt.eager(result
            .unionByName(next.orderBy(col("column")).limit((limit - have).toInt)))
          graft.Ckpt.free(next)
          liveCks.foreach(graft.Ckpt.free)
          liveCks = Seq(capped)
          result = capped
          done = true
        } else {
          val merged = graft.Ckpt.eager(result.unionByName(next))
          liveCks.foreach(graft.Ckpt.free)
          liveCks = Seq(merged, next)
          result = merged
          have += cnt
          frontier = next
        }
      }
      // the closure is ≤ `limit` rows by construction — collect into a local
      // relation so the last round's barriers release with everything else
      val outPlan = result.filter(col("column") =!= start)
        .orderBy(col("depth"), col("column"))
      val rows = outPlan.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), outPlan.schema)
    } finally {
      liveCks.foreach(graft.Ckpt.free)
      edges.unpersist()
    }
  }

  /** GraphX/Pregel variant of the downstream closure — the shape to prefer
    * when the lineage graph itself is huge (iterative joins re-shuffle per
    * hop; Pregel keeps the partitioned graph resident across supersteps).
    * spark-graphx ships in /opt/spark/jars. Equivalence with the iterative
    * join version is asserted in tests. */
  def downstreamClosureGraphX(spark: SparkSession, graph: DataFrame, start: String,
      maxDepth: Int = 20): DataFrame = {
    import org.apache.spark.graphx.{Edge => GxEdge, Graph => GxGraph, EdgeTriplet, Pregel}
    import spark.implicits._
    // vertex ids are derived distributively as xxhash64(name) — deterministic
    // under recomputation (zipWithUniqueId could assign different ids when
    // the shuffle behind it re-executes for the vertex vs edge jobs), with no
    // driver-side edge collect, so the lineage graph can exceed driver
    // memory. 64-bit collisions over a column-name vocabulary are negligible.
    val edgePairs = graph.select(col("src"), col("dst")).distinct()
    val edges = edgePairs
      .select(xxhash64(col("src")).as("src_vid"), xxhash64(col("dst")).as("dst_vid"))
      .as[(Long, Long)]
      .rdd.map { case (s, d) => GxEdge(s, d, 1) }
    // vertex attr carries (name, dist) so the result maps back to names
    // without a driver-side id→name table
    val vertices = edgePairs.select(col("src").as("name"))
      .unionByName(edgePairs.select(col("dst").as("name")))
      .distinct()
      .select(xxhash64(col("name")).as("vid"), col("name"))
      .as[(Long, String)]
      .rdd.map { case (id, n) =>
        (id, (n, if (n == start) 0 else Int.MaxValue))
      }
    val g = GxGraph(vertices, edges)
    val res = Pregel(g, Int.MaxValue, maxIterations = maxDepth)(
      (_, attr, msg) => (attr._1, math.min(attr._2, msg)),
      (t: EdgeTriplet[(String, Int), Int]) =>
        if (t.srcAttr._2 != Int.MaxValue && t.srcAttr._2 + 1 < t.dstAttr._2)
          Iterator((t.dstId, t.srcAttr._2 + 1))
        else Iterator.empty,
      (a, b) => math.min(a, b))
    res.vertices
      .flatMap { case (_, (name, d)) =>
        if (d != Int.MaxValue && d > 0) Some((name, d)) else None }
      .toDF("column", "depth")
  }

  /** Script-level downstream BFS over stitched links (A21). */
  def downstreamScripts(spark: SparkSession, links: Dataset[RepoLink],
      seeds: Seq[String], maxDepth: Int = 20): DataFrame = {
    // adaptive like downstreamClosure: the script graph is one node per
    // analyzed job, so in practice this always takes the driver path; the
    // frontier-join loop below remains for a repo that outgrows the probe
    val edgePlan = links
      .select(col("fromScript").as("src"), col("toScript").as("dst")).distinct()
    val probe = edgePlan.limit(DriverBfsMaxEdges + 1).collect()
    if (probe.length <= DriverBfsMaxEdges)
      return localDepthFrame(spark,
        driverBfsSeq(probe.map(r => (r.getString(0), r.getString(1))).toSeq,
          seeds, includeSeeds = true, maxDepth = maxDepth),
        "script")
    import spark.implicits._
    val edges = edgePlan.cache()
    var result = seeds.distinct.map((_, 0)).toDF("script", "depth")
    var frontier = result
    var liveCks = Seq.empty[DataFrame]
    var depth = 0
    var done = false
    try {
      while (!done && depth < maxDepth) {
        depth += 1
        val next = graft.Ckpt.eager(frontier.select(col("script").as("fscript")).as("f")
          .join(edges.as("e"), col("fscript") === col("e.src"))
          .select(col("e.dst").as("script"), lit(depth).as("depth"))
          .distinct()
          .join(result.select(col("script").as("seen")), col("script") === col("seen"), "left_anti"))
        if (next.count() == 0) { graft.Ckpt.free(next); done = true }
        else {
          val merged = graft.Ckpt.eager(result.unionByName(next))
          liveCks.foreach(graft.Ckpt.free)
          liveCks = Seq(merged, next)
          result = merged
          frontier = next
        }
      }
      // script universe is small by construction (one row per analyzed job):
      // collect into a local relation so the last round's barriers release
      val rows = result.collect()
      spark.createDataFrame(java.util.Arrays.asList(rows: _*), result.schema)
    } finally {
      liveCks.foreach(graft.Ckpt.free)
      edges.unpersist()
    }
  }

  /** Scripts whose lineage mentions a column (A21 seed set). */
  def seedScriptsForColumn(edges: Dataset[Edge], column: String): Seq[String] =
    edges.filter(col("targetCol") === column || col("srcCol") === column)
      .select("script").distinct().collect().map(_.getString(0)).toSeq.sorted

  /** Gold outputs among impacted scripts (A22): writes with a 'gold' path
    * segment — qa/ask.py:343-360. */
  def goldOutputs(spark: SparkSession, lineages: Seq[ScriptLineage],
      impacted: DataFrame): DataFrame = {
    import spark.implicits._
    val writes = spark.createDataset(lineages.flatMap(_.assets))
      .filter(col("direction") === "write")
      .filter(array_contains(split(col("path"), "/"), "gold"))
      .select(col("script"), col("path"))
    writes.join(impacted, "script").select(col("script"), col("path")).distinct()
  }
}
