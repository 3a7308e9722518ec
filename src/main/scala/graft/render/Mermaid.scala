package graft.render

import graft.model._

/** Mermaid HTML rendering of the repo + per-df column graphs — driver-side
  * string templating from collected Datasets (reference: build_html.py:31-271).
  */
object Mermaid {

  /** Sanitize to a mermaid-safe node id (reference safe_id, build_html.py:31). */
  def safeId(s: String): String = s.replaceAll("[^A-Za-z0-9_]", "_")

  /** Repo overview: scripts + assets + writer→reader links
    * (build_html.py:50-84). */
  def overview(lineages: Seq[ScriptLineage], links: Seq[RepoLink]): String = {
    val sb = new StringBuilder("flowchart LR\n")
    lineages.foreach { sl =>
      sb.append(s"  ${safeId(sl.script)}[\"${sl.script}\"]\n")
      sl.assets.foreach { a =>
        val aid = safeId(a.path)
        sb.append(s"  $aid((\"${a.path}\"))\n")
        if (a.direction == "read") sb.append(s"  $aid --> ${safeId(sl.script)}\n")
        else sb.append(s"  ${safeId(sl.script)} --> $aid\n")
      }
    }
    links.foreach { l =>
      sb.append(s"  ${safeId(l.fromScript)} -. ${l.asset} .-> ${safeId(l.toScript)}\n")
    }
    sb.toString
  }

  /** Per-script column graph (build_html.py:104-230). */
  def columnGraph(script: String, edges: Seq[Edge]): String = {
    val sb = new StringBuilder("flowchart TB\n")
    edges.filter(_.script == script).foreach { e =>
      val s = safeId(s"${e.srcDf}.${e.srcCol}")
      val t = safeId(s"${e.df}.${e.targetCol}")
      sb.append(s"  $s[\"${e.srcDf}.${e.srcCol}\"] -->|${e.reason}| $t[\"${e.df}.${e.targetCol}\"]\n")
    }
    sb.toString
  }

  /** Self-contained HTML page embedding the graphs (build_html.py:233-271). */
  def html(lineages: Seq[ScriptLineage], links: Seq[RepoLink], edges: Seq[Edge]): String = {
    val per = lineages.map(sl =>
      s"""<h2>${sl.script}</h2>\n<pre class="mermaid">\n${columnGraph(sl.script, edges)}</pre>""")
      .mkString("\n")
    s"""<!doctype html><html><head><meta charset="utf-8"><title>graft lineage</title>
<script type="module">
  import mermaid from 'https://cdn.jsdelivr.net/npm/mermaid@10/dist/mermaid.esm.min.mjs';
  mermaid.initialize({ startOnLoad: true });
</script></head>
<body>
<h1>Repo lineage</h1>
<pre class="mermaid">
${overview(lineages, links)}</pre>
$per
</body></html>"""
  }
}
