package graft.extract

import graft.model.ScriptLineage

/** Serializes extracted lineage into the reference's exact JSON schema
  * (/root/reference/schemas/lineage_schema.json:1-21 — `script_name`,
  * `dataframes[].{df_name,type,columns[].{name,derived_from,expression,
  * transformation}}`, `assets.{reads,writes}`), so artifacts are drop-in
  * readable by tooling written against the reference's outputs/ files.
  * Source qualifiers (`node.col`) are reduced to bare column names exactly as
  * the reference records them.
  */
object ReferenceJson {

  private def esc(s: String): String = s.flatMap {
    case '"' => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  private def jstr(s: String): String = "\"" + esc(s) + "\""
  private def jarr(xs: Seq[String]): String = xs.mkString("[", ", ", "]")

  def render(sl: ScriptLineage): String = {
    val dfs = sl.dfs.map { d =>
      val cols = d.columns.map { c =>
        val bare = c.sources.map(s => jstr(s.split('.').last))
        s"""{ "name": ${jstr(c.name)}, "derived_from": ${jarr(bare)}, "expression": ${jstr(c.expression)}, "transformation": ${jstr(c.transformation)} }"""
      }
      s"""{ "df_name": ${jstr(d.name)}, "type": ${jstr(d.kind)}, "columns": ${jarr(cols)} }"""
    }
    val reads = sl.assets.filter(_.direction == "read")
      .map(a => s"""{ "format": ${jstr(a.format)}, "path": ${jstr(a.path)} }""")
    val writes = sl.assets.filter(_.direction == "write")
      .map(a => s"""{ "format": ${jstr(a.format)}, "path": ${jstr(a.path)}, "df": ${jstr(a.df)} }""")
    s"""{
  "script_name": ${jstr(sl.script)},
  "dataframes": ${jarr(dfs)},
  "assets": { "reads": ${jarr(reads)}, "writes": ${jarr(writes)} }
}"""
  }
}
