package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Q
import graft.lineage.Lineage
import graft.model.ScriptLineage
import graft.pipelines.Repo
import graft.qa.QA

/** The engine's own lineage surface exposed as driver-checkable queries:
  * plan-extracted column edges, stitched repo links, impact closures, corpus,
  * retrieval and evidence. Results derive from Catalyst plans (not
  * SQL-expressible in DuckDB) → rows-only checks, with exact golden assertions
  * in LineageSpec instead — EXCEPT q27, whose closure over the exported q25
  * edge dump is replayed as a DuckDB recursive CTE (dynamic oracle below).
  */
object LineageQueries {

  private def lineages(s: SparkSession, dir: String): Seq[ScriptLineage] =
    Repo.cachedLineage(s, dir)

  val lineageEdges: Q = Q(
    "q25_lineage_edges",
    (s, dir) => Lineage.edges(s, lineages(s, dir)).toDF()
      .orderBy("script", "df", "targetCol", "srcDf", "srcCol"),
    None)

  val repoLinks: Q = Q(
    "q26_repo_links",
    (s, dir) => Lineage.stitch(s, lineages(s, dir)).toDF()
      .orderBy("fromScript", "toScript", "asset"),
    None)

  /** Downstream impact of the bronze `amount` column — columns + depth.
    *
    * Unlike the plan-walk extraction itself, the CLOSURE over already-exported
    * edges is SQL-expressible: the dynamic oracle replays the BFS as a DuckDB
    * recursive CTE over the q25 edge dump Verify just wrote (the edge table is
    * itself sha1-pinned in LineageSpec), with min-depth semantics, the
    * maxDepth=20 horizon, and the 2000-node cap of qa/ask.py:211-223 — the
    * cap as a (depth, name)-ordered row_number ≤ 1999, exactly the
    * complete-levels-then-alphabetical-fill truncation downstreamClosure
    * applies. This puts the BFS semantics under the driver's hard
    * rows+schema+hash gate rather than only the self-refereed suite. */
  val impactClosure: Q = Q(
    "q27_impact_closure",
    (s, dir) => {
      val graph = Lineage.columnGraph(Lineage.edges(s, lineages(s, dir)))
      Lineage.downstreamClosure(s, graph, "amount")
    },
    None,
    oracleDyn = Some(() => sys.props.get("graft.oracle.outdir")
      // only claim the oracle when the edge dump actually landed — if q25
      // failed to dump, fall back to the rows-only check instead of handing
      // the driver SQL that errors on a missing file
      .filter(out => new java.io.File(s"$out/q25_lineage_edges").isDirectory)
      .map { out =>
      s"""WITH RECURSIVE e AS (
        SELECT DISTINCT srcCol AS src, targetCol AS dst
        FROM read_parquet('$out/q25_lineage_edges/*.parquet')
        WHERE srcCol <> targetCol
      ), r AS (
        SELECT CAST('amount' AS VARCHAR) AS name, 0 AS depth
        UNION
        SELECT e.dst, r.depth + 1
        FROM r JOIN e ON e.src = r.name
        WHERE r.depth < 20
      ), m AS (
        SELECT name, MIN(depth) AS depth FROM r
        WHERE name <> 'amount' GROUP BY name
      ), capped AS (
        SELECT name, depth,
               row_number() OVER (ORDER BY depth, name) AS rn
        FROM m
      )
      SELECT name AS "column", CAST(depth AS INTEGER) AS depth
      FROM capped WHERE rn <= 1999"""
    }))

  val corpusDocs: Q = Q(
    "q28_corpus_docs",
    (s, dir) => {
      val ls = lineages(s, dir)
      QA.corpus(s, ls, Lineage.edges(s, ls)).toDF()
        .select("id", "docType", "script", "df", "column", "text")
        .orderBy("docType", "script", "df", "column", "id")
    },
    None)

  /** Hybrid retrieval for a fixed acceptance question (README.md:261-271
    * class): top-25 corpus docs by L2 over hashed embeddings. */
  val qaRetrieval: Q = Q(
    "q29_qa_retrieval",
    (s, dir) => {
      import s.implicits._
      val ls = lineages(s, dir)
      // one bounded persisted copy per (session, dir) — PlanCache replaces
      // (and unpersists) the entry when the repo inputs change, so repeated
      // driver invocations reuse instead of accumulating cache entries
      val docs = graft.PlanCache.cached(s, "qa_corpus", dir, dir) {
        QA.corpus(s, ls, Lineage.edges(s, ls)).toDF()
      }
      val docVecs = graft.PlanCache.cached(s, "qa_docvecs", dir, dir) {
        QA.embed(docs, "text")
      }
      val question = "Where does avg_daily_spend come from and which gold outputs depend on amount?"
      val qVec = QA.embed(Seq(("question", question)).toDF("id", "text"), "text")
      QA.retrieve(s, docVecs, qVec)
        .join(docs.select(col("id").as("doc_id"), col("docType"), col("script")), "doc_id")
        .select("rank", "doc_id", "dist", "docType", "script")
        .orderBy("rank")
    },
    None)

  /** Full hybrid Q&A evidence for the acceptance question: deterministic
    * impact sections + retrieval facts (qa/ask.py:391-450). */
  val qaEvidence: Q = Q(
    "q30_qa_evidence",
    (s, dir) => {
      import s.implicits._
      // evidence is capped driver-side assembly (A23): materialize eagerly so
      // the per-question caches can be released — repeated driver invocations
      // must not accumulate persisted plans
      val q = QA.Questions.headOption
        .getOrElse(sys.error("no acceptance question configured"))
      val (ev, _, cleanup) = graft.qa.Ask.evidenceFrameManaged(s, dir, q)
      val rows = try ev.collect().map(r => (r.getString(0), r.getString(1))).toSeq
        finally cleanup()
      rows.toDF("section", "line")
    },
    None)

  /** Retrieval-only variant (the reference's simple `qa.py` mode: TOP_K=6, no
    * deterministic graphs — qa.py:34,208-248). */
  val qaRetrievalSimple: Q = Q(
    "q44_qa_retrieval_simple",
    (s, dir) => {
      import s.implicits._
      val ls = lineages(s, dir)
      // shares q29's bounded cached corpus (same name key) — see q29
      val docs = graft.PlanCache.cached(s, "qa_corpus", dir, dir) {
        QA.corpus(s, ls, Lineage.edges(s, ls)).toDF()
      }
      val docVecs = graft.PlanCache.cached(s, "qa_docvecs", dir, dir) {
        QA.embed(docs, "text")
      }
      val qVec = QA.embed(
        Seq(("question", "Which scripts write gold outputs?")).toDF("id", "text"), "text")
      QA.retrieve(s, docVecs, qVec, k = 6)
        .join(docs.select(col("id").as("doc_id"), col("docType"), col("script")), "doc_id")
        .select("rank", "doc_id", "dist", "docType", "script")
        .orderBy("rank")
    },
    None)

  val all: Seq[Q] = Seq(lineageEdges, repoLinks, impactClosure, corpusDocs,
    qaRetrieval, qaRetrievalSimple, qaEvidence)
}
