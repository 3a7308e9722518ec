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

  /** The outDir dump directory for `name` iff it was produced BY THIS RUN:
    * requires Spark's `_SUCCESS` marker and a marker mtime at or after the
    * run start Verify stamps into `graft.oracle.runstart` — a stale dump
    * left in the same outDir by a prior run must not feed an oracle (it
    * would replay old data against this run's results and still "pass").
    * Missing marker / stamp → None → the query falls back to rows-only. */
  private def freshDump(out: String, name: String): Option[String] = {
    val marker = new java.io.File(s"$out/$name/_SUCCESS")
    val startMs = sys.props.get("graft.oracle.runstart")
      .flatMap(s => scala.util.Try(s.toLong).toOption)
    // 2s slack: coarse-mtime filesystems (FAT, some NFS) truncate the marker
    // timestamp below the millisecond run-start stamp and would otherwise
    // silently mark this run's own dump stale. A dump written within 2s
    // BEFORE run start is indistinguishable from this run's — acceptable,
    // since the stale case this guards against is a leftover from a prior
    // round minutes-to-days old, not milliseconds.
    val fresh = marker.isFile && startMs.exists(marker.lastModified() >= _ - 2000)
    if (fresh) Some(new java.io.File(s"$out/$name").getAbsolutePath)
    else {
      if (marker.isFile)
        System.err.println(s"[verify] $name dump is STALE (predates run start)"
          + " — dynamic oracle downgraded to rows-only")
      None
    }
  }

  /** Acceptance questions for the retrieval queries — shared with
    * [[dumpRetrievalAux]] so the oracle scores the exact same query
    * vectors. */
  private val RetrievalQuestion =
    "Where does avg_daily_spend come from and which gold outputs depend on amount?"
  private val SimpleQuestion = "Which scripts write gold outputs?"

  /** Verify-time aux dump: the corpus embedding table plus the two question
    * vectors, written as `aux_qa_vectors` beside the query dumps. The
    * embedding itself is not SQL-expressible (xxhash64 bag-of-tokens), but
    * given the vectors the retrieval RANKING is — the q29/q44 oracles
    * recompute L2 distances in DuckDB (`list_distance` over DOUBLE[] is
    * bit-exact vs the sequential vec_l2sq fold, prototyped) and re-derive
    * the top-k, moving retrieval from the self-refereed suite into the
    * driver's rows+schema+hash gate (reference semantics:
    * qa/ask.py:135-152, qa.py:210-234). */
  def dumpRetrievalAux(s: SparkSession, dir: String, outDir: String): Unit = {
    import s.implicits._
    val ls = lineages(s, dir)
    val docs = graft.PlanCache.cached(s, "qa_corpus", dir, dir) {
      QA.corpus(s, ls, Lineage.edges(s, ls)).toDF()
    }
    val docVecs = graft.PlanCache.cached(s, "qa_docvecs", dir, dir) {
      QA.embed(docs, "text")
    }
    val qVecs = QA.embed(Seq(
      "question::q29" -> RetrievalQuestion,
      "question::q44" -> SimpleQuestion).toDF("id", "text"), "text")
    docVecs.select("id", "v").unionByName(qVecs.select("id", "v"))
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/aux_qa_vectors")
  }

  /** DuckDB SQL re-deriving a retrieval top-k from the aux vector dump:
    * L2 by `list_distance` (bit-exact vs vec_l2sq), ties broken by doc id
    * (QA.retrieve's window order), metadata joined from the q28 dump. */
  private def retrievalOracle(out: String, qid: String, k: Int): String =
    s"""WITH vecs AS (
        SELECT id, v FROM read_parquet('$out/aux_qa_vectors/*.parquet')
      ), q AS (
        SELECT v AS qv FROM vecs WHERE id = '$qid'
      ), d AS (
        SELECT id, v FROM vecs WHERE id NOT LIKE 'question::%'
      ), ranked AS (
        SELECT d.id AS doc_id, list_distance(q.qv, d.v) AS dist,
               CAST(row_number() OVER (ORDER BY list_distance(q.qv, d.v), d.id)
                 AS BIGINT) AS rank
        FROM d, q
      )
      SELECT r.rank, r.doc_id, r.dist, c."docType", c.script
      FROM ranked r
      JOIN read_parquet('$out/q28_corpus_docs/*.parquet') c ON c.id = r.doc_id
      WHERE r.rank <= $k
      ORDER BY r.rank"""

  /** Shared oracleDyn for q29/q44: claims the oracle only when this run's
    * aux vector dump AND q28 corpus dump both landed (fresh `_SUCCESS`). */
  private def retrievalOracleDyn(qid: String, k: Int): Option[() => Option[String]] =
    Some(() => sys.props.get("graft.oracle.outdir")
      .filter(out => freshDump(out, "aux_qa_vectors").isDefined &&
        freshDump(out, "q28_corpus_docs").isDefined)
      .map(out => retrievalOracle(out, qid, k)))

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
    * maxDepth=20 horizon, and THIS REPO's 2000-node cap semantics — a
    * (depth, name)-ordered row_number ≤ 1999, i.e. complete levels then
    * alphabetical fill, exactly what downstreamClosure applies. The
    * reference (qa/ask.py:211-223) instead stops in BFS discovery order, so
    * AT the cap boundary the retained subset can differ (documented at
    * Lineage.downstreamClosure); below the cap the closures are identical.
    * This puts the BFS semantics under the driver's hard rows+schema+hash
    * gate rather than only the self-refereed suite. */
  val impactClosure: Q = Q(
    "q27_impact_closure",
    (s, dir) => {
      val graph = Lineage.columnGraph(Lineage.edges(s, lineages(s, dir)))
      Lineage.downstreamClosure(s, graph, "amount")
    },
    None,
    oracleDyn = Some(() => sys.props.get("graft.oracle.outdir")
      // only claim the oracle when THIS RUN's edge dump actually landed
      // (fresh _SUCCESS) — a failed q25 dump, or a stale dump from a prior
      // run in the same outDir, falls back to the rows-only check instead
      // of handing the driver SQL over wrong edges
      .filter(out => freshDump(out, "q25_lineage_edges").isDefined)
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
      val qVec = QA.embed(Seq(("question", RetrievalQuestion)).toDF("id", "text"), "text")
      QA.retrieve(s, docVecs, qVec)
        .join(docs.select(col("id").as("doc_id"), col("docType"), col("script")), "doc_id")
        .select("rank", "doc_id", "dist", "docType", "script")
        .orderBy("rank")
    },
    None,
    oracleDyn = retrievalOracleDyn("question::q29", QA.TopK))

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
        Seq(("question", SimpleQuestion)).toDF("id", "text"), "text")
      QA.retrieve(s, docVecs, qVec, k = 6)
        .join(docs.select(col("id").as("doc_id"), col("docType"), col("script")), "doc_id")
        .select("rank", "doc_id", "dist", "docType", "script")
        .orderBy("rank")
    },
    None,
    oracleDyn = retrievalOracleDyn("question::q44", 6))

  val all: Seq[Q] = Seq(lineageEdges, repoLinks, impactClosure, corpusDocs,
    qaRetrieval, qaRetrievalSimple, qaEvidence)
}
