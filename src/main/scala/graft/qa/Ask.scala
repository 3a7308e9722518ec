package graft.qa

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.lineage.Lineage
import graft.model.ScriptLineage
import graft.pipelines.Repo

/** Hybrid lineage Q&A — the reference's `qa/ask.py` entry point end-to-end:
  * candidate-column extraction → downstream column closure → script BFS →
  * gold outputs → vector retrieval → capped evidence → grounded answer
  * (qa/ask.py:476-519 REPL loop). Deterministic offline answerer by default;
  * plug an LLM via QA.AnswerClient without touching the truth path.
  *
  * Run: sbt "runMain graft.qa.Ask <sfDir> <question...>"
  */
object Ask {

  final case class Result(answer: String, evidence: Seq[(String, String)],
      candidates: Seq[String])

  /** Evidence DataFrame + extracted candidates for one question — shared by
    * the CLI and the q30 driver query. */
  def evidenceFrame(spark: SparkSession, sfDir: String,
      question: String): (DataFrame, Seq[String]) = {
    import spark.implicits._
    val ls: Seq[ScriptLineage] = Repo.lineage(spark, sfDir)
    val edges = Lineage.edges(spark, ls).cache()
    val known = edges.select("targetCol").distinct().collect().map(_.getString(0)).toSet ++
      edges.select("srcCol").distinct().collect().map(_.getString(0)).toSet
    val cands = QA.candidateColumns(question, known)
    val graph = Lineage.columnGraph(edges)
    val impact: DataFrame = cands.map(Lineage.downstreamClosure(spark, graph, _))
      .reduceOption(_ unionByName _)
      .getOrElse(Seq.empty[(String, Int)].toDF("column", "depth"))
      .groupBy("column").agg(min("depth").as("depth"))
    val links = Lineage.stitch(spark, ls)
    val seeds = cands.flatMap(Lineage.seedScriptsForColumn(edges, _)).distinct
    val scripts = Lineage.downstreamScripts(spark, links, seeds)
    val gold = Lineage.goldOutputs(spark, ls, scripts)
    val docs = QA.corpus(spark, ls, edges).cache()
    val hits = QA.retrieve(spark, QA.embed(docs.toDF(), "text"),
      QA.embed(Seq(("question", question)).toDF("id", "text"), "text")).cache()
    (QA.evidence(spark, impact, scripts, gold, hits, docs), cands)
  }

  def ask(spark: SparkSession, sfDir: String, question: String,
      answerer: QA.AnswerClient = QA.DeterministicAnswerer): Result = {
    val (ev, cands) = evidenceFrame(spark, sfDir, question)
    val evidence = ev.collect().map(r => (r.getString(0), r.getString(1))).toSeq
    Result(answerer.answer(question, evidence), evidence, cands)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val question = if (args.length > 1) args.drop(1).mkString(" ")
      else "What is impacted downstream if `amount` changes?"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val r = ask(spark, sfDir, question)
    println(s"CANDIDATES: ${r.candidates.mkString(", ")}")
    println(r.answer)
    spark.stop()
  }
}
