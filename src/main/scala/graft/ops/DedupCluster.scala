package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q

/** Duplicate clustering — the step after candidate-pair mining in a real
  * 100 TB dedup pipeline: connected components over the near-dup pair graph,
  * keeping one canonical doc per component. Implemented as iterative min-label
  * propagation over the edge Dataset (each round: every node takes the min
  * label among itself and its neighbors; converges in O(diameter) rounds,
  * each one shuffle on the node id) with per-round localCheckpoint — the same
  * loop is checkpoint() on a cluster. Deterministic: labels are doc_ids.
  */
object DedupCluster {

  /** Connected components of an undirected pair graph (doc_a, doc_b) →
    * (doc_id, component) where component = min doc_id reachable.
    *
    * Frontier-based: each round only the nodes whose label changed last round
    * send messages, so per-round join input shrinks as components settle, and
    * convergence is read off the (already-materialized-by-checkpoint)
    * frontier's count — no extra join+count job per round. */
  def connectedComponents(spark: SparkSession, pairs: DataFrame,
      maxIter: Int = 50): DataFrame = {
    val (labels, _) = connectedComponentsManaged(spark, pairs, maxIter)
    labels
  }

  /** [[connectedComponents]] plus a release handle for the final round's
    * checkpoint (checkpoint-lifecycle audit, round 7): superseded rounds are
    * freed inside the loop as soon as the next round is materialized, edges
    * on exit; only the frame backing the returned labels stays resident —
    * call the handle after the terminal action (as the artifact publish in
    * [[clusters]] does) and nothing persists across invocations. */
  private[graft] def connectedComponentsManaged(spark: SparkSession, pairs: DataFrame,
      maxIter: Int = 50): (DataFrame, () => Unit) = {
    // undirected: propagate both ways
    val edges = graft.Ckpt.eager(pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .distinct())
    var labels = graft.Ckpt.eager(edges.select(col("u").as("doc_id")).distinct()
      .withColumn("component", col("doc_id")))
    var live = labels // the one round whose blocks the loop still reads
    var frontier = labels
    var it = 0
    var frontierSize = 1L
    try {
      while (frontierSize > 0 && it < maxIter) {
        it += 1
        val msgs = edges.as("e")
          .join(frontier.as("f"), col("e.v") === col("f.doc_id"))
          .groupBy(col("e.u").as("doc_id")).agg(min(col("f.component")).as("cand"))
        val merged = graft.Ckpt.eager(labels.as("l").join(msgs.as("m"), Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("l.component"), coalesce(col("m.cand"), col("l.component"))).as("component"),
            (col("m.cand") < col("l.component")).as("improved")))
        graft.Ckpt.free(live) // previous round: fully superseded once merged exists
        live = merged
        frontier = merged.filter(col("improved")).select("doc_id", "component")
        frontierSize = frontier.count() // scan of the checkpointed merged, no join
        labels = merged.select("doc_id", "component")
      }
      // never ship non-converged components: downstream (canonical selection,
      // pruning, the exact-fixpoint oracle) all assume true component minima
      if (frontierSize > 0)
        throw new IllegalStateException(
          s"connectedComponents did not converge within $maxIter iterations " +
            "(component diameter exceeds the cap); raise maxIter")
    } catch {
      case e: Throwable => graft.Ckpt.free(live); graft.Ckpt.free(edges); throw e
    }
    graft.Ckpt.free(edges)
    val last = live
    (labels, () => graft.Ckpt.free(last))
  }

  /** Cluster assignments per sf-dir as a persisted artifact (parquet under
    * target/graft_cc): pair mining (q14's plan) + label propagation run once
    * and are shared by q40 and q46 — in a production dedup pipeline the
    * candidate pairs and components are materialized intermediates feeding
    * both reporting and pruning, never re-mined per consumer. Stored as data,
    * not a session-bound cached plan, so it survives session restarts.
    * Staleness + publish atomicity are handled by [[Artifacts]]: the artifact
    * path embeds a fingerprint of the documents parquet files, so a
    * regenerated corpus — even at identical row count — rebuilds, and
    * concurrent sessions never observe a half-written artifact. */
  private def clusters(s: SparkSession, dir: String): DataFrame = {
    val tag = dir.replaceAll("[^a-zA-Z0-9.]", "_")
    val fp = Artifacts.fingerprint(s, s"$dir/documents.parquet")
    Artifacts.publishOnce(s, s"${Artifacts.root(s)}/graft_cc/$tag", fp) { tmp =>
      val pairs = Dedup.ngramJaccard.run(s, dir).select("doc_a", "doc_b")
      val (cc, release) = connectedComponentsManaged(s, pairs)
      // release the final label checkpoint right after the publish write —
      // the artifact is data on disk from here on, so the build leaves no
      // persisted RDDs behind
      try cc.withColumn("is_canonical",
          when(col("doc_id") === col("component"), 1).otherwise(0))
        .write.mode("overwrite").parquet(tmp)
      finally release()
    }(p => s.read.parquet(p))
  }

  /** Cluster the verified n-gram-Jaccard near-dup pairs (q14) and emit one row
    * per clustered document with its canonical representative. Docs in no pair
    * are their own canonical (identity components are omitted here — the
    * interesting output is the dup groups).
    *
    * Oracled: DuckDB recursive CTE enumerates (node, reachable-label) pairs
    * over the undirected pair graph; MIN(label) per node = the component's
    * minimum doc_id, exactly the fixpoint of min-label propagation. */
  val dedupClusters: Q = Q(
    "q40_dedup_clusters",
    (s, dir) => clusters(s, dir).orderBy("component", "doc_id"),
    Some(s"""WITH RECURSIVE pairs AS (
        ${Dedup.ngramJaccard.oracle.get}
      ), cc_edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b AS u, doc_a AS v FROM pairs
      ), walk AS (
        SELECT u AS doc_id, u AS label FROM cc_edges
        UNION
        SELECT e.u AS doc_id, w.label FROM cc_edges e JOIN walk w ON e.v = w.doc_id
      )
      SELECT doc_id, MIN(label) AS component,
             CASE WHEN doc_id = MIN(label) THEN 1 ELSE 0 END AS is_canonical
      FROM walk GROUP BY doc_id"""))

  /** The end of the dedup pipeline: drop every non-canonical cluster member
    * and emit the cleaned corpus (mine q14 → cluster q40 → prune). left_anti
    * against the small drop-list — the corpus streams once, never shuffles
    * its text. */
  val dedupPrune: Q = Q(
    "q46_dedup_prune",
    (s, dir) => {
      val drop = clusters(s, dir)
        .filter(col("is_canonical") === 0).select("doc_id")
      graft.Tables.documents(s, dir)
        .join(drop, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("text"))
    },
    Some(s"""WITH comp AS (
        ${dedupClusters.oracle.get}
      )
      SELECT d.doc_id, d.text FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM comp WHERE is_canonical = 0)"""))

  /** Leakage-safe train/val/test split: the split is hashed from the
    * duplicate-cluster REPRESENTATIVE (min doc_id of the component, the doc
    * itself when unclustered), so near-duplicate documents always land in the
    * same split — hashing raw doc_ids would leak train near-dups into eval.
    * The 80/10/10 assignment compares the md5-hex prefix lexicographically
    * against fixed thresholds (a uniform 32-bit draw, the q52 technique), so
    * it is deterministic and exactly oracled; the cluster map rides the same
    * persisted artifact as q40/q46 and joins in as a broadcast. */
  val clusterSplit: Q = Q(
    "q69_cluster_split",
    (s, dir) => {
      val comp = clusters(s, dir).select("doc_id", "component")
      graft.Tables.documents(s, dir).select("doc_id")
        .join(broadcast(comp), Seq("doc_id"), "left")
        .withColumn("component", coalesce(col("component"), col("doc_id")))
        .withColumn("draw", Md5Draw.draw(8, lit("split"), col("component")))
        .select(col("doc_id"), col("component"),
          when(col("draw") < "cccccccc", "train")
            .when(col("draw") < "e6666666", "val")
            .otherwise("test").as("split"))
    },
    Some(s"""WITH comp AS (
        ${dedupClusters.oracle.get}
      ), labeled AS (
        SELECT d.doc_id,
               CAST(COALESCE(c.component, d.doc_id) AS BIGINT) AS component
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.doc_id
      )
      SELECT doc_id, component,
             CASE WHEN ${Md5Draw.drawSql(8, "'split'", "component")}
                    < 'cccccccc' THEN 'train'
                  WHEN ${Md5Draw.drawSql(8, "'split'", "component")}
                    < 'e6666666' THEN 'val'
                  ELSE 'test' END AS split
      FROM labeled"""))

  // ---- q140: alternating large-star/small-star components ------------------
  /** Connected components via the ALTERNATING STAR algorithm (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", Alg. 2) — the
    * web-graph-scale alternative to [[connectedComponents]]'s min-label
    * frontier propagation: frontier propagation converges in O(diameter)
    * rounds (painful on a long-chain component), while alternating
    * large-star/small-star contracts components in O(log² n) rounds
    * regardless of diameter, each round two grouped aggregations + joins on
    * the CURRENT edge set (which only shrinks toward one star per
    * component).
    *
    *   large-star: per node u, attach every LARGER neighbor to
    *     m = min(Γ(u) ∪ {u});
    *   small-star: per node u, attach u and every smaller neighbor to the
    *     min of the smaller neighbors.
    *
    * Every emitted edge points big → small, so the edge set is its own
    * canonical form; convergence = the round is a no-op, at which point the
    * edges are exactly (v, component-min) stars. Per-round localCheckpoint
    * (managed via [[graft.Ckpt]]) keeps the plan flat, as in the frontier
    * loop. */
  private[graft] def alternatingStarComponents(spark: SparkSession,
      pairs: DataFrame, maxIter: Int = 50): (DataFrame, () => Unit) = {
    def swap(e: DataFrame) = e.select(col("b").as("a"), col("a").as("b"))
    def largeStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(swap(e))
      val mins = sym.groupBy("a").agg(min("b").as("mb"))
      sym.join(mins, "a")
        .withColumn("m", least(col("a"), col("mb")))
        .filter(col("b") > col("a"))
        .select(col("b").as("a"), col("m").as("b"))
        .filter(col("a") =!= col("b")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val sym = e.unionByName(swap(e))
      val dirE = sym.filter(col("b") < col("a"))
      val mins = dirE.groupBy("a").agg(min("b").as("m"))
      dirE.join(mins, "a")
        .filter(col("b") =!= col("m"))
        .select(col("b").as("a"), col("m").as("b"))
        .unionByName(mins.select(col("a"), col("m").as("b")))
        .filter(col("a") =!= col("b")).distinct()
    }
    val nodes = graft.Ckpt.eager(
      pairs.select(col("doc_a").as("doc_id"))
        .unionByName(pairs.select(col("doc_b").as("doc_id"))).distinct())
    var e = graft.Ckpt.eager(
      pairs.select(greatest(col("doc_a"), col("doc_b")).as("a"),
        least(col("doc_a"), col("doc_b")).as("b"))
        .filter(col("a") =!= col("b")).distinct())
    var it = 0
    var converged = false
    try {
      while (!converged && it < maxIter) {
        it += 1
        val next = graft.Ckpt.eager(smallStar(largeStar(e)))
        converged = next.count() == e.count() &&
          next.except(e).isEmpty
        graft.Ckpt.free(e)
        e = next
      }
      if (!converged) throw new IllegalStateException(
        s"alternating-star did not converge within $maxIter rounds")
      // converged edges are (v, component-min); roots have no out-edge. The
      // returned frame still reads the e/nodes blocks — the caller runs its
      // terminal action, then calls the release handle.
      val labels = nodes
        .join(e.select(col("a").as("doc_id"), col("b").as("comp")),
          Seq("doc_id"), "left")
        .groupBy("doc_id")
        .agg(coalesce(min("comp"), min("doc_id")).as("component"))
      val eFinal = e
      (labels, () => { graft.Ckpt.free(eFinal); graft.Ckpt.free(nodes) })
    } catch {
      case t: Throwable =>
        graft.Ckpt.free(e); graft.Ckpt.free(nodes); throw t
    }
  }

  /** q140: the q40 component contract (same oracle — the exact reachability
    * fixpoint) computed by the alternating-star algorithm instead of
    * frontier propagation. Two independent distributed algorithms, one
    * hash-gated answer. Published as a fingerprinted artifact (like q40's
    * clusters) so the checkpoint barriers die with the build and repeat
    * invocations read data. */
  val starComponents: Q = Q(
    "q140_star_components",
    (s, dir) => {
      val tag = dir.replaceAll("[^a-zA-Z0-9.]", "_")
      val fp = Artifacts.fingerprint(s, s"$dir/documents.parquet")
      Artifacts.publishOnce(s, s"${Artifacts.root(s)}/graft_cc_star/$tag", fp) { tmp =>
        val pairs = Dedup.ngramJaccard.run(s, dir).select("doc_a", "doc_b")
        val (cc, release) = alternatingStarComponents(s, pairs)
        try cc.withColumn("is_canonical",
            when(col("doc_id") === col("component"), 1).otherwise(0))
          .write.mode("overwrite").parquet(tmp)
        finally release()
      }(p => s.read.parquet(p))
    },
    dedupClusters.oracle)

  // ---- q211: dedup-cluster purity audit ------------------------------------
  /** q211: the quality audit of q40's connected components — per cluster,
    * the exact full-shingle Jaccard over EVERY member pair (not just the
    * mined edges): mean and min pairwise similarity plus how many pairs
    * share no shingle at all. Transitive closure is exactly where dedup
    * clustering over-merges (a—b—c chains where a and c are unrelated),
    * and a pair-level gate like q144 cannot see it — the min column here
    * is the over-merge detector, completing the dedup eval family (q144
    * grades the pair miner, q163 the method menu, this the clusters a
    * keep-one sweep actually acts on).
    *
    * FP shape: each pair's jaccard is one int/int division; per-cluster
    * means are round(sum,6)/total over small groups (cluster sizes);
    * unscored pairs contribute exactly 0 via the closed-form total
    * k(k−1)/2, never a NULL-skewed average.
    *
    * Distributed shape: member shingles prune via the cluster join before
    * the (component, ngram)-keyed self-join, so candidate volume is
    * Σ_cluster (k·shingles)², bounded by cluster size — never corpus
    * pairs. The artifact-published clusters are reused, not re-mined. */
  val clusterPurity: Q = Q(
    "q211_cluster_purity",
    (s, dir) => {
      val cc = clusters(s, dir).select("doc_id", "component")
      val sizes = cc.groupBy("component").agg(count(lit(1)).as("n_members"))
      val ng = Dedup.allShingleRows(s, dir).select("doc_id", "ngram").join(cc, "doc_id")
      val shCounts = ng.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
      val pairSim = ng.as("a").join(ng.as("b"),
          col("a.component") === col("b.component") &&
            col("a.ngram") === col("b.ngram") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.component").as("component"),
          col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
        .agg(count(lit(1)).as("common"))
        .join(shCounts.withColumnRenamed("doc_id", "doc_a")
          .withColumnRenamed("n_sh", "na"), "doc_a")
        .join(shCounts.withColumnRenamed("doc_id", "doc_b")
          .withColumnRenamed("n_sh", "nb"), "doc_b")
        .select(col("component"),
          (col("common").cast("double")
            / (col("na") + col("nb") - col("common")).cast("double")).as("j"))
      val perC = pairSim.groupBy("component")
        .agg(count(lit(1)).as("n_scored_pairs"),
          round(sum("j"), 6).as("j_sum"), min("j").as("j_min_scored"))
      sizes.join(perC, Seq("component"), "left")
        .na.fill(0L, Seq("n_scored_pairs"))
        .withColumn("n_pairs", expr("n_members * (n_members - 1) DIV 2"))
        .select(col("component"), col("n_members"), col("n_pairs"),
          col("n_scored_pairs"),
          (coalesce(col("j_sum"), lit(0.0))
            / col("n_pairs").cast("double")).as("mean_jaccard"),
          when(col("n_scored_pairs") < col("n_pairs"), lit(0.0))
            .otherwise(col("j_min_scored")).as("min_jaccard"))
    },
    // CTE materialization (see q229's note; measured 5.7 s vs 0.9 s)
    Some(graft.OracleSql.materializeCtes(s"""WITH RECURSIVE pairs AS (
        ${Dedup.ngramJaccard.oracle.get}
      ), cc_edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION
        SELECT doc_b AS u, doc_a AS v FROM pairs
      ), walk AS (
        SELECT u AS doc_id, u AS label FROM cc_edges
        UNION
        SELECT e.u AS doc_id, w.label FROM cc_edges e JOIN walk w ON e.v = w.doc_id
      ), cc AS (
        SELECT doc_id, MIN(label) AS component FROM walk GROUP BY doc_id
      ), sizes AS (
        SELECT component, count(1) AS n_members FROM cc GROUP BY component
      ), docs2 AS (
        SELECT doc_id, string_split(text, ' ') AS words FROM documents
        WHERE len(string_split(text, ' ')) >= 3
      ), tng AS (
        SELECT d.doc_id, c.component, unnest(list_distinct(list_transform(
                 range(1, len(words) - 1),
                 i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))) AS ngram
        FROM docs2 d JOIN cc c ON d.doc_id = c.doc_id
      ), shc AS (
        SELECT doc_id, count(1) AS n_sh FROM tng GROUP BY doc_id
      ), ps AS (
        SELECT a.component, a.doc_id AS doc_a, b.doc_id AS doc_b,
               count(1) AS common
        FROM tng a JOIN tng b ON a.component = b.component
          AND a.ngram = b.ngram AND a.doc_id < b.doc_id
        GROUP BY 1, 2, 3
      ), sim AS (
        SELECT ps.component,
               CAST(ps.common AS DOUBLE)
                 / CAST(sa.n_sh + sb.n_sh - ps.common AS DOUBLE) AS j
        FROM ps JOIN shc sa ON ps.doc_a = sa.doc_id
        JOIN shc sb ON ps.doc_b = sb.doc_id
      ), perc AS (
        SELECT component, count(1) AS n_scored_pairs,
               ROUND(SUM(j), 6) AS j_sum, MIN(j) AS j_min_scored
        FROM sim GROUP BY component
      )
      SELECT s.component, s.n_members,
             CAST(s.n_members * (s.n_members - 1) // 2 AS BIGINT) AS n_pairs,
             CAST(COALESCE(p.n_scored_pairs, 0) AS BIGINT) AS n_scored_pairs,
             COALESCE(p.j_sum, 0.0)
               / CAST(s.n_members * (s.n_members - 1) // 2 AS DOUBLE)
               AS mean_jaccard,
             CASE WHEN COALESCE(p.n_scored_pairs, 0)
                    < s.n_members * (s.n_members - 1) // 2
                  THEN 0.0 ELSE p.j_min_scored END AS min_jaccard
      FROM sizes s LEFT JOIN perc p ON s.component = p.component""")))

  // ---- q229: canonical-selection policy comparison ---------------------------
  /** q229: which document each dedup cluster KEEPS under the two standard
    * representative policies — keep-lowest-id (q40/q46's current sweep,
    * cheap and deterministic) vs keep-longest (max n_chars, ties to lowest
    * id — the content-preserving policy curation guides recommend) — one
    * row per cluster with both representatives, whether they agree, and
    * the exact character mass the longest-policy keeps that lowest-id
    * throws away. The aggregate of chars_delta is the cost of the cheap
    * policy; clusters where the policies disagree are where a sweep
    * silently keeps truncated variants.
    *
    * FP shape: all columns are exact integers/booleans; representative
    * selection is a deterministic (n_chars DESC, doc_id ASC) rank.
    *
    * Distributed shape: the cluster map (pair-graph scale, far smaller
    * than the corpus) joins n_chars on doc_id, then one per-component
    * window + two bounded joins; |clusters| rows out. */
  val canonicalPolicy: Q = Q(
    "q229_canonical_policy",
    (s, dir) => {
      val sized = clusters(s, dir).select("doc_id", "component")
        .join(graft.Tables.documents(s, dir).select("doc_id", "n_chars"), "doc_id")
      val w = org.apache.spark.sql.expressions.Window.partitionBy("component")
        .orderBy(col("n_chars").desc, col("doc_id").asc)
      val byQuality = sized.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("component"), col("doc_id").as("rep_longest"),
          col("n_chars").as("chars_longest"))
      val byLowest = sized.filter(col("doc_id") === col("component"))
        .select(col("component"), col("n_chars").as("chars_lowest"))
      val members = sized.groupBy("component")
        .agg(count(lit(1)).as("n_members"))
      members.join(byQuality, "component").join(byLowest, "component")
        .select(col("component"), col("n_members"),
          col("component").as("rep_lowest"), col("rep_longest"),
          (col("rep_longest") === col("component")).as("same_rep"),
          col("chars_lowest"), col("chars_longest"),
          (col("chars_longest") - col("chars_lowest")).as("chars_delta"))
    },
    // CTE materialization: the recursive component walk is referenced by
    // several downstream CTEs; un-hinted DuckDB re-executes it per reference
    // (measured 3.6 s vs 1.0 s at sf0.1, identical rows)
    Some(graft.OracleSql.materializeCtes(s"""WITH comp AS (
        ${dedupClusters.oracle.get}
      ), sized AS (
        SELECT c.doc_id, c.component, d.n_chars
        FROM comp c JOIN documents d ON c.doc_id = d.doc_id
      ), byq AS (
        SELECT component, doc_id AS rep_longest, n_chars AS chars_longest,
               row_number() OVER (PARTITION BY component
                 ORDER BY n_chars DESC, doc_id ASC) AS rn
        FROM sized
      ), bylow AS (
        SELECT component, n_chars AS chars_lowest FROM sized
        WHERE doc_id = component
      ), members AS (
        SELECT component, CAST(count(1) AS BIGINT) AS n_members
        FROM sized GROUP BY component
      )
      SELECT m.component, m.n_members,
             m.component AS rep_lowest, q.rep_longest,
             q.rep_longest = m.component AS same_rep,
             l.chars_lowest, q.chars_longest,
             CAST(q.chars_longest - l.chars_lowest AS BIGINT) AS chars_delta
      FROM members m
      JOIN byq q ON m.component = q.component AND q.rn = 1
      JOIN bylow l ON m.component = l.component""")))

  // ---- q233: split-leakage comparison --------------------------------------
  /** q233: the measured justification for q69 — how many q14 near-dup
    * pairs STRADDLE a train/val/test boundary under (a) the naive policy
    * that hashes raw doc_ids and (b) q69's cluster-aware policy that
    * hashes the component representative. Both policies use the identical
    * md5 draw and 80/10/10 thresholds, so the ONLY difference is the
    * hash key — the naive row quantifies the eval-leak a doc-keyed split
    * ships (~1−Σp² ≈ 34% of near-dup pairs straddle), and the cluster row
    * is structurally zero (both members share the component key), which
    * the oracle re-derives rather than pins.
    *
    * FP shape: exact integer counting; leak_frac is one BIGINT/BIGINT
    * division guarded to 0.0 on an empty pair table.
    *
    * Distributed shape: the pair table is the PlanCache-shared q14 frame
    * (hundreds of rows per million docs); the cluster row joins the
    * pair-graph-sized q69 assignment twice on its own key; 2 rows out. */
  val splitLeakage: Q = Q(
    "q233_split_leakage",
    (s, dir) => {
      val pairs = Dedup.ngramJaccard.run(s, dir).select("doc_a", "doc_b")
      def naiveSplit(c: org.apache.spark.sql.Column) = {
        val d = Md5Draw.draw(8, lit("split"), c)
        when(d < "cccccccc", "train").when(d < "e6666666", "val").otherwise("test")
      }
      val nv = pairs.agg(count(lit(1)).as("n_pairs"),
          sum(when(naiveSplit(col("doc_a")) =!= naiveSplit(col("doc_b")), 1L)
            .otherwise(0L)).as("n_straddling"))
        .select(lit("doc_hash").as("policy"), col("n_pairs"), col("n_straddling"))
      val cs = clusterSplit.run(s, dir).select("doc_id", "split")
      val cl = pairs
        .join(cs.select(col("doc_id").as("doc_a"), col("split").as("sa")), "doc_a")
        .join(cs.select(col("doc_id").as("doc_b"), col("split").as("sb")), "doc_b")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_straddling"))
        .select(lit("cluster_hash").as("policy"), col("n_pairs"), col("n_straddling"))
      nv.unionByName(cl)
        .withColumn("leak_frac",
          when(col("n_pairs") > 0,
            col("n_straddling").cast("double") / col("n_pairs").cast("double"))
            .otherwise(lit(0.0)))
    },
    Some {
      def naiveSql(c: String) =
        s"""CASE WHEN ${Md5Draw.drawSql(8, "'split'", c)} < 'cccccccc' THEN 'train'
                 WHEN ${Md5Draw.drawSql(8, "'split'", c)} < 'e6666666' THEN 'val'
                 ELSE 'test' END"""
      s"""WITH pairs AS (
        ${Dedup.ngramJaccard.oracle.get}
      ), cs AS (
        ${clusterSplit.oracle.get}
      ), nv AS (
        SELECT CAST(count(1) AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(CASE WHEN ${naiveSql("doc_a")}
                 <> ${naiveSql("doc_b")} THEN 1 ELSE 0 END), 0) AS BIGINT)
                 AS n_straddling
        FROM pairs
      ), cl AS (
        SELECT CAST(count(1) AS BIGINT) AS n_pairs,
               CAST(COALESCE(SUM(CASE WHEN a.split <> b.split
                 THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_straddling
        FROM pairs p
        JOIN cs a ON p.doc_a = a.doc_id
        JOIN cs b ON p.doc_b = b.doc_id
      )
      SELECT policy, n_pairs, n_straddling,
             CASE WHEN n_pairs > 0
                  THEN CAST(n_straddling AS DOUBLE) / CAST(n_pairs AS DOUBLE)
                  ELSE 0.0 END AS leak_frac
      FROM (
        SELECT 'doc_hash' AS policy, n_pairs, n_straddling FROM nv
        UNION ALL
        SELECT 'cluster_hash' AS policy, n_pairs, n_straddling FROM cl
      )"""
    })

  // ---- q246: synchronous label propagation communities ---------------------
  private val lpaIters = 3

  /** Fixed-round SYNCHRONOUS label propagation over an undirected pair graph:
    * every node starts as its own label; each round every node adopts the
    * most frequent label among its neighbors AND itself (the self-vote is
    * what lets 2-cliques converge instead of oscillating — the classic sync-
    * LPA pathology), ties broken by the SMALLEST label. Both choices make the
    * update a deterministic total order, so the result is bit-reproducible
    * across engines and execution geometries (async/randomized LPA is not).
    * Returns one row per node: (doc_id, label after iters rounds, prev =
    * label after iters−1 rounds) so the caller can report convergence.
    * The round-(i) plan nests the round-(i−1) plan, so a consumer that
    * touches both final and prev re-executes the shared prefix — callers
    * should persist the returned frame (the Q below PlanCaches it per
    * (session, dir), the maintained-materialization shape). */
  private[graft] def lpaLabelFrame(pairs: DataFrame, iters: Int): DataFrame = {
    val nodes = pairs.select(col("doc_a").as("u"))
      .union(pairs.select(col("doc_b").as("u"))).distinct()
    val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
      .union(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      .union(nodes.select(col("u"), col("u").as("v"))) // self-vote
    val init = nodes.select(col("u").as("doc_id"), col("u").as("label"))
    def step(l: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("u").orderBy(col("c").desc, col("label").asc)
      edges.join(l.withColumnRenamed("doc_id", "v"), "v")
        .groupBy("u", "label").agg(count(lit(1)).as("c"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("u").as("doc_id"), col("label"))
    }
    val prev = (1 until iters).foldLeft(init)((l, _) => step(l))
    step(prev).join(prev.withColumnRenamed("label", "prev"), "doc_id")
  }

  /** The PlanCache'd, eagerly-checkpointed LPA label frame over the q14 pair
    * graph — ONE materialization per (session, dir), shared by q246 (the
    * partition itself) and q271 (its modularity). The eager checkpoint
    * collapses the ~50-operator 3-round plan to one LogicalRDD (see the
    * lifecycle note on [[labelPropagation]]). */
  private[graft] def lpaCached(s: SparkSession, dir: String): DataFrame =
    graft.PlanCache.cached(s, "q246_lpa", dir, s"$dir/documents.parquet") {
      graft.Ckpt.eager(lpaLabelFrame(
        Dedup.ngramJaccard.run(s, dir).select("doc_a", "doc_b"), lpaIters))
    }

  /** q246: communities on the verified near-dup graph (q14's PlanCache-shared
    * pair table) via [[lpaLabels]] with [[lpaIters]] fixed rounds. Where
    * q40's connected components fuse everything reachable, LPA requires a
    * LOCAL MAJORITY: two dense near-dup templates connected by one chance
    * pair keep distinct communities, so the community sizes read as template
    * mass rather than reachability mass. `converged` flags nodes whose label
    * was already stable in the previous round.
    *
    * Distributed shape: each round is one |E|-row join + one keyed count +
    * one per-node top-1 window (partitioned by node, never global) — a fixed
    * 3-round cost, not a data-depth-controlled fixpoint loop (that is q40's
    * job; LPA is the bounded-cost refinement view). Output is node-bounded. */
  val labelPropagation: Q = Q(
    "q246_label_propagation",
    (s, dir) => {
      // the 3-round plan is ~50 operators deep; left bare, EVERY consumer
      // action pays ~0.7 s of driver-side plan handling even with the data
      // persisted (measured sf0.1). The eager checkpoint collapses the
      // cached entry to one LogicalRDD — consumer actions drop to ~0.05 s.
      // The barrier RDD lives exactly as long as the PlanCache entry (one
      // per session × dir, node-bounded rows), the maintained-
      // materialization lifecycle, so no per-invocation leak.
      val lab = lpaCached(s, dir)
      val sizes = lab.groupBy("label").agg(count(lit(1)).as("csize"))
      // no broadcast hint: community count is node-proportional in the
      // worst case (every doc its own label) — a forced broadcast is a
      // driver OOM at 100 TB. The join is co-keyed on `label` with the
      // groupBy above; AQE broadcasts when the frame is actually small.
      lab.join(sizes, "label")
        .select(col("doc_id"), col("label").as("community"), col("csize"),
          when(col("label") === col("prev"), 1L).otherwise(0L).as("converged"))
    },
    Some {
      graft.OracleSql.materializeCtes(s"""WITH ${lpaOracleCtes}, sizes AS (
        SELECT label, CAST(count(1) AS BIGINT) AS csize FROM l3 GROUP BY label
      )
      SELECT l3.doc_id, l3.label AS community, sizes.csize,
             CAST(CASE WHEN l3.label = l2.label THEN 1 ELSE 0 END AS BIGINT)
               AS converged
      FROM l3
      JOIN l2 ON l3.doc_id = l2.doc_id
      JOIN sizes ON l3.label = sizes.label""")
    })

  /** The shared oracle CTE chain for the LPA partition — pairs (q14's exact
    * near-dup SQL), the undirected+self-vote edge list, and the three label
    * rounds l1..l3 (l2 doubles as `prev` for q246's convergence flag). Used
    * by q246 and q271 so both oracles replay the IDENTICAL partition. */
  private def lpaOracleCtes: String = {
    def round(i: Int, prevL: String) =
      s"""s$i AS (
        SELECT e.u, l.label, count(1) AS c
        FROM edges e JOIN $prevL l ON l.doc_id = e.v
        GROUP BY e.u, l.label
      ), l$i AS (
        SELECT u AS doc_id, label FROM (
          SELECT u, label, row_number() OVER (
            PARTITION BY u ORDER BY c DESC, label ASC) AS rn
          FROM s$i)
        WHERE rn = 1
      )"""
    // CTE materialization (applied by each caller): each LPA round references
    // the previous label CTE and the shared edge list; un-hinted DuckDB
    // re-executes the q14 mining per round (measured 7.2 s vs 1.0 s at sf0.1,
    // identical rows)
    s"""pairs AS (
        ${Dedup.ngramJaccard.oracle.get}
      ), nodes AS (
        SELECT doc_a AS u FROM pairs UNION SELECT doc_b AS u FROM pairs
      ), edges AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM pairs
        UNION ALL
        SELECT u, u AS v FROM nodes
      ), l0 AS (
        SELECT u AS doc_id, u AS label FROM nodes
      ), ${round(1, "l0")}, ${round(2, "l1")}, ${round(3, "l2")}"""
  }

  // ---- q271: modularity of the LPA partition --------------------------------
  /** q271: Newman–Girvan modularity of q246's label-propagation partition on
    * the verified near-dup graph — the partition-quality number that says
    * whether the communities are real structure or chance: Q = Σ_c [ e_c/m −
    * (d_c/2m)² ] (fraction of edges inside community c minus the fraction a
    * degree-preserving random rewiring would put there). q246 reports the
    * partition, q252/q264 its density — this is the figure of merit that
    * validates them, and the number a template-mining report quotes before
    * anyone trusts "community = template family".
    *
    * Exactness: per-community contribution scaled by 4m² is the integer
    * 4m·e_c − d_c², published as exact ppm via the positive-shift floor
    * division (num + 4m²)·10⁶ DIV 4m² − 10⁶ — both operands positive (|num|
    * ≤ 4m² since e_c ≤ m, d_c ≤ 2m), so Spark's truncating DIV and DuckDB's
    * flooring // agree (the q136 idiom); products go through DECIMAL(38,0)/
    * HUGEINT before multiplying (the q259 lesson — m² wraps a BIGINT at
    * ~3·10⁹ edges), and 4m²·10⁶ ≤ 10³⁸ holds to m = 1.5·10¹⁵ edges.
    *
    * Distributed shape: the label frame is the SAME PlanCache'd+checkpointed
    * materialization q246 serves (one build per session × dir); on top of it,
    * one |E|-row degree aggregate, two node-keyed joins of the pair table to
    * labels (candidate-bounded — never all-pairs), and a community-keyed
    * rollup. m is a 1-row broadcast scalar. Nothing is fact-proportional past
    * the pair table itself; no global sort, no cartesian. */
  val modularity: Q = Q(
    "q271_modularity",
    (s, dir) => {
      val pairs = Dedup.ngramJaccard.run(s, dir).select("doc_a", "doc_b")
      val lab = lpaCached(s, dir).select(col("doc_id"), col("label"))
      val mCnt = pairs.agg(count(lit(1)).cast("decimal(38,0)").as("m"))
      val deg = pairs.select(col("doc_a").as("doc_id"))
        .union(pairs.select(col("doc_b").as("doc_id")))
        .groupBy("doc_id").agg(count(lit(1)).as("deg"))
      val byComm = lab.join(deg, Seq("doc_id"))
        .groupBy("label")
        .agg(count(lit(1)).as("n_nodes"), sum("deg").as("d_sum"))
      val eIn = pairs
        .join(lab.select(col("doc_id").as("doc_a"), col("label").as("la")),
          Seq("doc_a"))
        .join(lab.select(col("doc_id").as("doc_b"), col("label").as("lb")),
          Seq("doc_b"))
        .filter(col("la") === col("lb"))
        .groupBy(col("la").as("label")).agg(count(lit(1)).as("e_in"))
      // left join: a community whose every edge crosses outward has e_c = 0
      // but still owes its degree penalty — it must not drop from the sum
      byComm.join(eIn, Seq("label"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .crossJoin(broadcast(mCnt))
        .select(col("label").as("community"), col("n_nodes"), col("e_in"),
          col("d_sum"),
          expr("CAST((4 * m * e_in - CAST(d_sum AS DECIMAL(38,0)) * d_sum" +
            " + 4 * m * m) * 1000000 DIV (4 * m * m) AS BIGINT)" +
            " - 1000000").as("q_ppm"))
    },
    Some {
      graft.OracleSql.materializeCtes(s"""WITH ${lpaOracleCtes}, deg AS (
        SELECT u AS doc_id, CAST(count(1) AS BIGINT) AS deg FROM (
          SELECT doc_a AS u FROM pairs
          UNION ALL
          SELECT doc_b AS u FROM pairs)
        GROUP BY u
      ), mm AS (
        SELECT CAST(count(1) AS HUGEINT) AS m FROM pairs
      ), bc AS (
        SELECT l.label, CAST(count(1) AS BIGINT) AS n_nodes,
               CAST(SUM(d.deg) AS BIGINT) AS d_sum
        FROM l3 l JOIN deg d USING (doc_id) GROUP BY l.label
      ), ein AS (
        SELECT la.label, CAST(count(1) AS BIGINT) AS e_in
        FROM pairs p
        JOIN l3 la ON p.doc_a = la.doc_id
        JOIN l3 lb ON p.doc_b = lb.doc_id
        WHERE la.label = lb.label
        GROUP BY la.label
      )
      SELECT bc.label AS community, bc.n_nodes,
             CAST(COALESCE(ein.e_in, 0) AS BIGINT) AS e_in, bc.d_sum,
             CAST((4 * mm.m * COALESCE(ein.e_in, 0)
                 - CAST(bc.d_sum AS HUGEINT) * bc.d_sum
                 + 4 * mm.m * mm.m) * 1000000
               // (4 * mm.m * mm.m) AS BIGINT) - 1000000 AS q_ppm
      FROM bc LEFT JOIN ein ON bc.label = ein.label CROSS JOIN mm""")
    })

  // ---- q252: k-core decomposition (bounded peel) ---------------------------
  private val kcoreK = 2
  private val kcoreRounds = 4

  /** q252: the k-core of the duplicate-pair graph — iteratively peel nodes
    * of degree < k until (near-)fixpoint, keeping the dense cores. On a dup
    * graph the 2-core separates TEMPLATE FAMILIES (mutually-similar doc
    * groups that survive peeling) from chains/pendants (pairwise accidents
    * that dissolve) — the signal q219 approximates with raw degree. The
    * peel is unrolled to a FIXED 4 rounds (the q246 discipline: bounded
    * plan, no data-dependent fixpoint loop); the semantics are "degrees
    * after a 4-round k=2 peel", exact whenever the peel converges earlier
    * (it does on every tested corpus — round 4 removes nothing; the
    * `stable` flag certifies it row by row).
    *
    * Distributed shape: per round one degree aggregate + two node-keyed
    * semi-joins of the |E|-bounded edge list (never the corpus); the pair
    * universe is q14's PlanCache-materialized table. At 100 TB a full
    * coreness decomposition runs more peel rounds of the same shape —
    * cost is rounds × |E|, never quadratic. */
  val kcoreDecomposition: Q = Q(
    "q252_kcore_decomposition",
    // Each peel round reads its input edge frame THREE times (the degree
    // aggregate plus both endpoint semi-joins), so a bare 4-round unrolled
    // plan re-executes the base subtree 3^4 times (measured: 25 s at
    // sf0.1). Per-round eager checkpoints make every round one small job
    // over materialized blocks (measured: <1 s); the intermediate barriers
    // are freed as soon as the final node frame is materialized, and that
    // frame lives exactly as long as its PlanCache entry (one per
    // session × dir, node-bounded rows) — the q246 lifecycle.
    (s, dir) => graft.PlanCache.cached(s, "q252_core", dir,
        s"$dir/documents.parquet") {
      val pairs = Dedup.ngramJaccard.run(s, dir).select("doc_a", "doc_b")
      val e0 = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionAll(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      def peel(edges: DataFrame): DataFrame = {
        val alive = edges.groupBy("u").agg(count(lit(1)).as("deg"))
          .filter(col("deg") >= kcoreK).select("u")
        edges.join(alive, Seq("u"))
          .join(alive.withColumnRenamed("u", "v"), Seq("v"))
          .select("u", "v")
      }
      val rounds = Iterator.iterate(graft.Ckpt.eager(e0))(e =>
        graft.Ckpt.eager(peel(e))).take(kcoreRounds + 1).toSeq
      val e3 = rounds(kcoreRounds - 1)
      val e4 = rounds(kcoreRounds)
      val d3 = e3.groupBy("u").agg(count(lit(1)).as("deg3"))
      val out = graft.Ckpt.eager(
        e4.groupBy("u").agg(count(lit(1)).as("degree"))
          .join(d3, Seq("u"))
          .select(col("u").as("doc_id"), col("degree"),
            when(col("degree") === col("deg3"), 1L).otherwise(0L).as("stable")))
      rounds.foreach(graft.Ckpt.free)
      out
    },
    Some {
      def round(i: Int, prev: String) =
        s"""a$i AS (
        SELECT u FROM $prev GROUP BY u HAVING count(1) >= $kcoreK
      ), e$i AS (
        SELECT e.u, e.v FROM $prev e
        JOIN a$i x ON e.u = x.u JOIN a$i y ON e.v = y.u
      )"""
      // CTE materialization: the 4-round peel references each round's edge
      // CTE three times; un-hinted DuckDB re-executes the q14 mining 3^4
      // times (measured 125.6 s vs 1.1 s at sf0.1, identical rows)
      graft.OracleSql.materializeCtes(s"""WITH pairs AS (
        ${Dedup.ngramJaccard.oracle.get}
      ), e0 AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM pairs
      ), ${round(1, "e0")}, ${round(2, "e1")}, ${round(3, "e2")},
      ${round(4, "e3")}, d3 AS (
        SELECT u, CAST(count(1) AS BIGINT) AS deg3 FROM e3 GROUP BY u
      )
      SELECT e4.u AS doc_id, CAST(count(1) AS BIGINT) AS degree,
             CAST(CASE WHEN count(1) = d3.deg3 THEN 1 ELSE 0 END
               AS BIGINT) AS stable
      FROM e4 JOIN d3 ON e4.u = d3.u
      GROUP BY e4.u, d3.deg3""")
    })

  // ---- q253: degree assortativity of the duplicate-pair graph --------------
  /** q253: Pearson correlation of endpoint degrees over the dup graph's
    * directed edge list (both directions — the standard undirected
    * treatment). Strongly negative assortativity = hub-and-spoke (one
    * template matched by many one-off docs, q219's shape); positive =
    * clique-of-clones (q252's cores) — one scalar that says which dedup
    * topology dominates, and therefore whether canonical-selection (q229)
    * or template-mining (q213) is the higher-leverage cleanup.
    *
    * FP shape: the five moment sums are exact integers in DECIMAL(38,0)
    * (degrees are counts; HUGEINT in the oracle) — one operand of each
    * degree product is cast to DECIMAL(38,0) BEFORE the multiply so the
    * product never passes through LongType (Long×Long wraps silently above
    * 2^63 in non-ANSI Spark; the q136/q221 class); numerator/denominator
    * cross-products stay in decimal and cast to double only at the end.
    * Scale bound (the q204/q232 class): those casts are value-exact while
    * n·Σxy < 2^53 — beyond ~10^15 (an |E| ~ 10^11 dup graph with hub
    * degrees ~10^2) DuckDB's HUGEINT→double rounds differently in the last
    * ulp; exact at every tested sf. The guarded form (NULL when the
    * variance term is zero) is identical in both engines.
    *
    * Distributed shape: one degree aggregate + two node-keyed joins of the
    * |E|-bounded edge list, then a single 1-row moment aggregate. */
  val degreeAssortativity: Q = Q(
    "q253_degree_assortativity",
    (s, dir) => {
      val pairs = Dedup.ngramJaccard.run(s, dir).select("doc_a", "doc_b")
      val e = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionAll(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val deg = e.groupBy("u").agg(count(lit(1)).as("deg"))
      val de = e.join(deg.select(col("u"), col("deg").as("dx")), Seq("u"))
        .join(deg.select(col("u").as("v"), col("deg").as("dy")), Seq("v"))
      de.agg(
          count(lit(1)).as("n_edges"),
          sum(col("dx").cast("decimal(38,0)")).as("sx"),
          sum(col("dy").cast("decimal(38,0)")).as("sy"),
          sum(col("dx").cast("decimal(38,0)") * col("dy")).as("sxy"),
          sum(col("dx").cast("decimal(38,0)") * col("dx")).as("sxx"),
          sum(col("dy").cast("decimal(38,0)") * col("dy")).as("syy"))
        .select(col("n_edges"),
          (col("sx").cast("double") / col("n_edges").cast("double"))
            .as("mean_deg"),
          expr("""CASE
            WHEN CAST(n_edges AS DECIMAL(38,0)) * sxx - sx * sx = 0
              OR CAST(n_edges AS DECIMAL(38,0)) * syy - sy * sy = 0 THEN NULL
            ELSE CAST(CAST(n_edges AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
              / sqrt(CAST(CAST(n_edges AS DECIMAL(38,0)) * sxx - sx * sx AS DOUBLE)
                   * CAST(CAST(n_edges AS DECIMAL(38,0)) * syy - sy * sy AS DOUBLE))
            END""").as("assortativity"))
    },
    Some {
      s"""WITH pairs AS (
        ${Dedup.ngramJaccard.oracle.get}
      ), e AS (
        SELECT doc_a AS u, doc_b AS v FROM pairs
        UNION ALL
        SELECT doc_b AS u, doc_a AS v FROM pairs
      ), deg AS (
        SELECT u, CAST(count(1) AS BIGINT) AS deg FROM e GROUP BY u
      ), de AS (
        SELECT du.deg AS dx, dv.deg AS dy
        FROM e JOIN deg du ON e.u = du.u JOIN deg dv ON e.v = dv.u
      ), m AS (
        SELECT CAST(count(1) AS BIGINT) AS n_edges,
               SUM(CAST(dx AS HUGEINT)) AS sx, SUM(CAST(dy AS HUGEINT)) AS sy,
               SUM(CAST(dx AS HUGEINT) * dy) AS sxy,
               SUM(CAST(dx AS HUGEINT) * dx) AS sxx,
               SUM(CAST(dy AS HUGEINT) * dy) AS syy
        FROM de
      )
      SELECT n_edges,
             CAST(sx AS DOUBLE) / CAST(n_edges AS DOUBLE) AS mean_deg,
             CASE
               WHEN n_edges * sxx - sx * sx = 0
                 OR n_edges * syy - sy * sy = 0 THEN NULL
               ELSE CAST(n_edges * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n_edges * sxx - sx * sx AS DOUBLE)
                      * CAST(n_edges * syy - sy * sy AS DOUBLE))
             END AS assortativity
      FROM m"""
    })

  // ---- q264: local clustering coefficient of the dup graph -----------------
  /** q264: per-node local clustering coefficient over the duplicate-pair
    * graph — the fourth and last member of the dup-graph topology layer
    * (components q40, k-core q252, assortativity q253, triangles →
    * LCC here): lcc(v) = 2·T(v) / d(v)(d(v)−1) in exact per-mille. A node
    * at lcc ≈ 1000 sits in a clique of clones (q252's cores — safe to
    * keep one survivor); a high-degree node at lcc ≈ 0 is a TEMPLATE hub
    * (q219's shape — its neighbors are unrelated to each other, so
    * keep-lowest-id canonical selection would wrongly collapse distinct
    * documents). Degree alone cannot tell those apart; this is the
    * per-node scalar that routes each dup-cluster to the right cleanup.
    *
    * Triangle counts use q149's degree-ordered wedge closure (Cohen 2009)
    * on the dup edge list — orient each edge to its (degree, id)-larger
    * endpoint, enumerate wedges at out-neighborhoods, close with the
    * canonical (lo, hi) equi-join (the r13 plan-gate lesson: an OR of
    * orientations is un-hashable) — O(m^{3/2}) wedges under any skew.
    * All integers exact; the only division is the final integral
    * per-mille. Oracle: the UNDIRECTED 3-way enumeration — a different
    * algorithm landing on identical integers, the q149 gate. */
  val localClustering: Q = Q(
    "q264_local_clustering",
    (s, dir) => {
      val und = Dedup.ngramJaccard.run(s, dir)
        .select(col("doc_a").as("a"), col("doc_b").as("b"))
      val e = und.select(col("a").as("u"), col("b").as("v"))
        .unionAll(und.select(col("b").as("u"), col("a").as("v")))
      val deg = e.groupBy("u").agg(count(lit(1)).as("d"))
      val oriented = und
        .join(deg.select(col("u").as("a"), col("d").as("da")), Seq("a"))
        .join(deg.select(col("u").as("b"), col("d").as("db")), Seq("b"))
        .select(
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
            col("a")).otherwise(col("b")).as("src"),
          when(col("da") < col("db") || (col("da") === col("db") && col("a") < col("b")),
            col("b")).otherwise(col("a")).as("dst"))
      val wedges = oriented.as("x").join(oriented.as("y"),
          col("x.src") === col("y.src") && col("x.dst") < col("y.dst"))
        .select(col("x.src").as("u"), col("x.dst").as("v"), col("y.dst").as("w"))
      // und already emits doc_a < doc_b, the canonical (lo, hi) key
      val tri = wedges.join(und.select(col("a").as("v"), col("b").as("w")),
        Seq("v", "w"))
      val triPerNode = tri
        .select(explode(array(col("u"), col("v"), col("w"))).as("doc_id"))
        .groupBy("doc_id").agg(count(lit(1)).as("n_tri"))
      deg.select(col("u").as("doc_id"), col("d"))
        .filter(col("d") >= 2)
        .join(triPerNode, Seq("doc_id"), "left")
        .withColumn("n_tri", coalesce(col("n_tri"), lit(0L)))
        .withColumn("lcc_pm", expr("n_tri * 2000 div (d * (d - 1))"))
        .select("doc_id", "d", "n_tri", "lcc_pm")
    },
    Some {
      s"""WITH pairs0 AS (
        ${Dedup.ngramJaccard.oracle.get}
      ), und AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs0
      ), e AS (
        SELECT a AS u, b AS v FROM und UNION ALL SELECT b, a FROM und
      ), deg AS (
        SELECT u, CAST(count(1) AS BIGINT) AS d FROM e GROUP BY u
      ), tri AS (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1
        JOIN und e2 ON e2.a = e1.b
        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b
      ), members AS (
        SELECT x AS doc_id FROM tri
        UNION ALL SELECT y FROM tri
        UNION ALL SELECT z FROM tri
      ), tpn AS (
        SELECT doc_id, CAST(count(1) AS BIGINT) AS n_tri
        FROM members GROUP BY doc_id
      )
      SELECT deg.u AS doc_id, deg.d,
             CAST(COALESCE(tpn.n_tri, 0) AS BIGINT) AS n_tri,
             CAST(COALESCE(tpn.n_tri, 0) * 2000 // (deg.d * (deg.d - 1))
               AS BIGINT) AS lcc_pm
      FROM deg LEFT JOIN tpn ON deg.u = tpn.doc_id
      WHERE deg.d >= 2"""
    })

  val all: Seq[Q] = Seq(dedupClusters, dedupPrune, clusterSplit, starComponents,
    clusterPurity, canonicalPolicy, splitLeakage, labelPropagation,
    kcoreDecomposition, degreeAssortativity, localClustering, modularity)
}
