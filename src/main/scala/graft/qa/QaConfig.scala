package graft.qa

import com.fasterxml.jackson.databind.ObjectMapper

/** QA-layer configuration — the analog of the reference's `config.json`
  * (qa/ask.py:26,43-63 + config.example.json): model ids and region for a
  * live client, plus the retrieval/evidence caps that ask.py keeps as module
  * constants (ask.py:32-37). Defaults reproduce the reference exactly; a
  * config file only overrides what it names.
  *
  * The model ids select PLUGGABLE components: in this offline build the only
  * registered embedder is the deterministic hashed bag-of-tokens
  * (`hashed-bow`, QA.embed) and the only answerer is
  * [[QA.DeterministicAnswerer]] (`deterministic`) — a live Bedrock-backed
  * AnswerClient would be keyed in the same way without touching the truth
  * path. Unknown selector values fail at load, not mid-question.
  */
final case class QaConfig(
    region: Option[String] = None,
    embedModelId: String = "amazon.titan-embed-text-v2:0",
    llmModelId: String = "amazon.nova-lite-v1:0",
    embedder: String = "hashed-bow",
    answerer: String = "deterministic",
    topK: Int = 25,
    maxImpactCols: Int = 3,
    maxImpactShow: Int = 80,
    maxScriptsShow: Int = 50,
    maxGoldShow: Int = 60) {

  def answerClient: QA.AnswerClient = answerer match {
    case "deterministic" => QA.DeterministicAnswerer
    case other => sys.error(
      s"unknown answerer '$other' (this offline build registers: deterministic)")
  }

  private[qa] def validated: QaConfig = {
    answerClient
    if (embedder != "hashed-bow") sys.error(
      s"unknown embedder '$embedder' (this offline build registers: hashed-bow)")
    this
  }
}

object QaConfig {

  val default: QaConfig = QaConfig()

  /** Load from a JSON file, mirroring ask.py's load_cfg key fallbacks:
    * `region` | `aws_region` (REQUIRED — ask.py:59-60 raises without it),
    * `embed_model_id` | `embedding_model_id` | `embeddingModelId`,
    * `model_id` | `llm_model_id` | `llmModelId`; the cap keys and component
    * selectors are optional extensions with reference defaults. */
  def load(path: String): QaConfig = {
    val root = new ObjectMapper()
      .readTree(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    def str(keys: String*): Option[String] =
      keys.flatMap(k => Option(root.get(k)).filter(!_.isNull).map(_.asText())).headOption
    def int(keys: String*): Option[Int] =
      keys.flatMap(k => Option(root.get(k)).filter(!_.isNull).map(_.asInt())).headOption
    val region = str("region", "aws_region")
    if (region.isEmpty) sys.error(s"$path missing region (or aws_region)")
    val d = default
    QaConfig(
      region = region,
      embedModelId = str("embed_model_id", "embedding_model_id", "embeddingModelId")
        .getOrElse(d.embedModelId),
      llmModelId = str("model_id", "llm_model_id", "llmModelId")
        .getOrElse(d.llmModelId),
      embedder = str("embedder").getOrElse(d.embedder),
      answerer = str("answerer").getOrElse(d.answerer),
      topK = int("top_k", "topK").getOrElse(d.topK),
      maxImpactCols = int("max_impact_cols").getOrElse(d.maxImpactCols),
      maxImpactShow = int("max_impact_show").getOrElse(d.maxImpactShow),
      maxScriptsShow = int("max_scripts_show").getOrElse(d.maxScriptsShow),
      maxGoldShow = int("max_gold_show").getOrElse(d.maxGoldShow)).validated
  }
}
