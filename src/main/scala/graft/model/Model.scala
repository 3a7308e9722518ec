package graft.model

/** Lineage data model — Spark-native re-expression of the reference's
  * string-typed JSON schema (/root/reference/schemas/lineage_schema.json:1-21,
  * SURVEY.md §1.1). Flat, Encoder-friendly case classes so every collection is
  * a Dataset and every pipeline stage is a distributed transformation.
  */

/** One derived column inside a plan node: name, provenance, rendered
  * expression, and the operator class that produced it
  * (reference: static_extract.py:187-248 — but sourced from Catalyst here). */
final case class ColumnDerivation(
    name: String,
    sources: Seq[String],    // "node.colName" qualified provenance
    expression: String,
    transformation: String)  // project | aggregation | window | join-carry

/** A dataframe node in a script: one logical operator with named output
  * (reference DfNode: static_extract.py:152-164; here real plan nodes, so no
  * false-positive `spark`/`w` variables — SURVEY §4.3 defect 4 fixed). */
final case class DfNode(
    script: String,
    name: String,
    kind: String,            // source | intermediate | sink
    op: String,              // Project / Aggregate / Join / Window / Relation ...
    columns: Seq[ColumnDerivation])

/** Read/write endpoint (reference: static_extract.py:122-123,169-178,256-265). */
final case class AssetRef(
    script: String,
    format: String,
    path: String,
    df: String,
    direction: String)       // read | write

/** Join captured from a Catalyst Join node
  * (reference enrichment `joins`: bedrock_enrich.py:176-183). */
final case class JoinInfo(
    script: String,
    df: String,
    joinType: String,
    condition: String,
    leftCols: Seq[String],
    rightCols: Seq[String])

/** Aggregation captured from a Catalyst Aggregate node (reference enrichment
  * `aggregations` — LLM-derived there, deterministic here). */
final case class AggInfo(
    script: String,
    df: String,
    column: String,
    function: String,
    sources: Seq[String],
    groupBy: Seq[String])

/** Full per-script lineage — root record of the extraction
  * (reference: one JSON file per script, static_extract.py:275-279). */
final case class ScriptLineage(
    script: String,
    dfs: Seq[DfNode],
    assets: Seq[AssetRef],
    joins: Seq[JoinInfo],
    aggs: Seq[AggInfo],
    sqlBlocks: Seq[String])

/** Canonical column-level lineage edge
  * (reference: lineage_postprocess.py:66,83,93,104). */
final case class Edge(
    script: String,
    df: String,
    targetCol: String,
    srcDf: String,
    srcCol: String,
    reason: String)

/** Cross-script link: writer → reader of the same asset path
  * (reference: stitch_repo.py:21-28). */
final case class RepoLink(
    fromScript: String,
    toScript: String,
    asset: String)

/** Retrieval corpus document (reference: qa/build_corpus.py:33-35). */
final case class CorpusDoc(
    id: String,
    text: String,
    docType: String,         // script | lineage_edge | derived | aggregation | join
    script: String,
    df: String,
    column: String)
