package graft.extract

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, AttributeReference, ExprId, Expression, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.model._

/** Column-level lineage extraction from Catalyst **analyzed plans** — the
  * Spark-native replacement for the reference's whole text-heuristic + LLM
  * stack (static_extract.py:23-272 AST walk, bedrock_enrich.py:169-248 LLM
  * enrichment). Provenance is tracked by `ExprId`, not by column-name matching,
  * so qualified references through `df.alias("o")` joins resolve exactly
  * (SURVEY.md §7.3 "plan-walk fidelity") and none of the reference's
  * false-positive classes (SURVEY.md §4.3.4) can occur.
  *
  * The walk is driver-side (plans are metadata, not data); everything derived
  * from its output is a Dataset transformation.
  */
object PlanLineage {

  /** Extract lineage for one script = one final DataFrame (plus the SQL text
    * when the script is SQL-defined, reference sql_blocks). */
  def extract(script: String, df: DataFrame, sqlBlocks: Seq[String] = Nil): ScriptLineage = {
    val walker = new Walker(script)
    val rootName = walker.walk(df.queryExecution.analyzed)
    val dfs = walker.nodes.toSeq.map { case (name, node) =>
      node.copy(kind = if (name == rootName) "sink" else node.kind)
    }
    ScriptLineage(script, dfs, walker.assets.toSeq, walker.joins.toSeq,
      walker.aggs.toSeq, sqlBlocks)
  }

  private final class Walker(script: String) {
    val nodes = mutable.LinkedHashMap[String, DfNode]()
    val assets = mutable.ArrayBuffer[AssetRef]()
    val joins = mutable.ArrayBuffer[JoinInfo]()
    val aggs = mutable.ArrayBuffer[AggInfo]()
    /** exprId → (originNode, colName): where each attribute was CREATED. */
    private val owner = mutable.HashMap[ExprId, (String, String)]()
    /** Synthetic window aliases (`_weN`) are expanded transitively so user
      * columns never cite Catalyst-internal names: exprId → (sources, sql). */
    private val synthetic = mutable.HashMap[ExprId, (Seq[String], String)]()
    private val counters = mutable.HashMap[String, Int]()
    private val cteNames = mutable.HashMap[Long, String]()

    private def fresh(prefix: String): String = {
      val n = counters.getOrElse(prefix, 0) + 1
      counters(prefix) = n
      s"${prefix}_$n"
    }

    private def own(attr: Attribute, node: String): Unit =
      if (!owner.contains(attr.exprId)) owner(attr.exprId) = (node, attr.name)

    private def src(e: Expression): Seq[String] =
      e.references.toSeq.flatMap { a =>
        synthetic.get(a.exprId).map(_._1).getOrElse {
          val (n, c) = owner.getOrElse(a.exprId, ("unknown", a.name))
          Seq(s"$n.$c")
        }
      }.distinct.sorted

    private def viaWindow(e: Expression): Boolean =
      e.exists(_.isInstanceOf[WindowExpression]) ||
        e.references.exists(a => synthetic.contains(a.exprId))

    private def exprSql(e: Expression): String =
      try e.sql catch { case _: Throwable => e.simpleString(100) }

    private def register(name: String, op: String, kind: String,
        cols: Seq[ColumnDerivation], outputs: Seq[Attribute]): String = {
      nodes(name) = DfNode(script, name, kind, op, cols)
      outputs.foreach(own(_, name))
      name
    }

    /** Returns the node name producing this plan's output. */
    def walk(plan: LogicalPlan): String = plan match {
      case s: SubqueryAlias =>
        val child = walk(s.child)
        // an alias renames the stream for qualification; keep provenance on the
        // child node but surface the alias as a node when it names a view/df
        val name = s.alias
        if (!nodes.contains(name) && name.nonEmpty && !name.startsWith("__")) {
          nodes(name) = DfNode(script, name, "intermediate", "Alias",
            Seq.empty)
        }
        child

      case v: View =>
        walk(v.child)

      case w: WithCTE =>
        w.cteDefs.foreach { d =>
          val n = walk(d.child)
          cteNames(d.id) = n
          d.child.output.foreach(own(_, n))
        }
        walk(w.plan)

      case r: CTERelationRef =>
        val name = cteNames.getOrElse(r.cteId, s"cte_${r.cteId}")
        r.output.foreach(own(_, name))
        name

      case r: LogicalRelation =>
        val (fmt, path) = r.relation match {
          case h: HadoopFsRelation =>
            (h.fileFormat.toString.toLowerCase.replaceAll("[^a-z0-9]", ""),
              h.location.rootPaths.headOption.map(_.toString).getOrElse("?"))
          case other => (other.getClass.getSimpleName, "?")
        }
        val base = path.split('/').takeRight(1).headOption.getOrElse("rel")
          .replaceAll("\\.parquet$", "")
        val name =
          if (nodes.contains(base)) fresh(base) else base
        assets += AssetRef(script, fmt, path, name, "read")
        register(name, "Relation", "source",
          r.output.map(a => ColumnDerivation(a.name, Nil, a.name, "source")),
          r.output)

      case p: Project =>
        val child = walk(p.child)
        val derived = p.projectList.collect {
          case a: Alias =>
            val sqlTxt = a.child match {
              // inline the synthetic window expression's own SQL for readability
              case ar: AttributeReference if synthetic.contains(ar.exprId) =>
                synthetic(ar.exprId)._2
              case c => exprSql(c)
            }
            ColumnDerivation(a.name, src(a.child), sqlTxt,
              if (viaWindow(a.child)) "window" else "project")
        }
        if (derived.isEmpty) {
          // pure column pruning/reorder — pass through
          p.projectList.foreach {
            case a: Attribute => own(a, owner.get(a.exprId).map(_._1).getOrElse(child))
            case _ => ()
          }
          child
        } else {
          val name = fresh("project")
          // carried columns keep their origin; only aliases belong to this node
          p.projectList.foreach {
            case a: Alias => owner(a.exprId) = (name, a.name)
            case _ => ()
          }
          register(name, "Project", "intermediate", derived,
            p.output.filterNot(a => owner.contains(a.exprId)))
          name
        }

      case a: Aggregate =>
        val child = walk(a.child)
        val name = fresh("agg")
        val groupBy = a.groupingExpressions.flatMap(_.references.toSeq).map(_.name).distinct
        val cols = a.aggregateExpressions.collect {
          case al: Alias =>
            al.child.collectFirst { case ae: AggregateExpression => ae } match {
              case Some(ae) =>
                aggs += AggInfo(script, name, al.name, ae.aggregateFunction.prettyName,
                  src(al.child), groupBy)
                ColumnDerivation(al.name, src(al.child), exprSql(al.child), "aggregation")
              case None =>
                ColumnDerivation(al.name, src(al.child), exprSql(al.child), "project")
            }
        }
        val carry = a.aggregateExpressions.collect { case at: Attribute =>
          ColumnDerivation(at.name, src(at), at.name, "groupByKey")
        }
        a.aggregateExpressions.foreach {
          case al: Alias => owner(al.exprId) = (name, al.name)
          case _ => ()
        }
        register(name, "Aggregate", "intermediate", cols ++ carry, Seq.empty)
        name

      case w: Window =>
        // window expressions surface as synthetic `_weN` aliases consumed by
        // the enclosing Project; expand them there instead of emitting a node
        val child = walk(w.child)
        w.windowExpressions.foreach {
          case al: Alias =>
            synthetic(al.exprId) = (src(al.child), exprSql(al.child))
          case _ => ()
        }
        child

      case j: Join =>
        val left = walk(j.left)
        val right = walk(j.right)
        val name = fresh("join")
        val (lc, rc) = j.condition match {
          case Some(c) =>
            val lset = j.left.outputSet
            val refs = c.references.toSeq
            (refs.filter(lset.contains).map(_.name).distinct,
              refs.filterNot(lset.contains).map(_.name).distinct)
          case None => (Nil, Nil)
        }
        joins += JoinInfo(script, name, j.joinType.sql.toLowerCase,
          j.condition.map(exprSql).getOrElse(""), lc, rc)
        // join-key provenance: left key ← right key (reference postprocess
        // attaches right-side sources to the join result)
        val keyCols = lc.zipAll(rc, "", "").collect {
          case (l, r) if l.nonEmpty && r.nonEmpty =>
            ColumnDerivation(l, Seq(s"$left.$l", s"$right.$r"), s"$l = $r", "join")
        }
        register(name, "Join", "intermediate", keyCols, j.output)
        name

      case u: Union =>
        val children = u.children.map(walk)
        val name = fresh("union")
        val cols = u.output.zipWithIndex.map { case (a, i) =>
          val srcs = u.children.map(c => {
            val ca = c.output(i)
            val (n, cn) = owner.getOrElse(ca.exprId, ("unknown", ca.name))
            s"$n.$cn"
          }).distinct
          ColumnDerivation(a.name, srcs, a.name, "union")
        }
        register(name, "Union", "intermediate", cols, u.output)
        name

      case other =>
        // pass-through operators (Filter, Sort, Limit, Distinct, Repartition…):
        // output attrs share exprIds with the child, provenance unchanged
        other.children match {
          case Seq(only) =>
            val child = walk(only)
            other.output.foreach(own(_, child))
            child
          case Seq() =>
            val name = fresh(other.nodeName.toLowerCase)
            register(name, other.nodeName, "source",
              other.output.map(a => ColumnDerivation(a.name, Nil, a.name, "source")),
              other.output)
          case many =>
            val names = many.map(walk)
            val name = fresh(other.nodeName.toLowerCase)
            register(name, other.nodeName, "intermediate", Seq.empty, other.output)
            name
        }
    }
  }
}
