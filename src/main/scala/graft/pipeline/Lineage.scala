package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{ExprId, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical._

/** Column-level lineage over ANALYZED logical plans — the
  * impact-analysis surface of a spec-driven ETL framework: for every
  * output column of a feed's load, which `view.column` leaves feed it.
  * Answers "what breaks downstream if this source column changes" and
  * "where did this output value come from" without executing anything
  * (analysis is driver-side only, zero jobs — same discipline as
  * [[PipelineRunner.dryRun]]).
  *
  * The walk propagates leaf attribution through the expression graph:
  * leaves label their attributes with the nearest enclosing
  * `SubqueryAlias` (which is how both temp views and SQL derived-table
  * aliases appear in analyzed plans), projection-like nodes
  * (Project / Aggregate / Window / Generate) map their named expressions
  * to the union of their references' sources, Union merges positionally,
  * CTEs resolve through `WithCTE`/`CTERelationRef`, and every other node
  * (Filter, Join, Sort, Limit, Distinct, …) passes attribution through
  * unchanged. Filter/join CONDITIONS deliberately do not contribute —
  * this is value lineage, not control-flow lineage.
  */
object Lineage {

  /** (output column → set of "view.column" sources) for `df`. */
  def columnLineage(df: DataFrame): Map[String, Set[String]] = {
    val plan = df.queryExecution.analyzed
    val m = build(plan, None, Map.empty)
    plan.output.map(a => a.name -> m.getOrElse(a.exprId, Set.empty)).toMap
  }

  private type Sources = Map[ExprId, Set[String]]
  private type CteDefs = Map[Long, (Seq[ExprId], Sources)]

  private def build(plan: LogicalPlan, scope: Option[String],
                    ctes: CteDefs): Sources = plan match {
    case SubqueryAlias(ident, child) =>
      build(child, Some(ident.name), ctes)
    case w: WithCTE =>
      val defs = w.cteDefs.foldLeft(ctes) { (acc, d) =>
        acc + (d.id -> (d.child.output.map(_.exprId),
          build(d.child, scope, acc)))
      }
      build(w.plan, scope, defs)
    case r: CTERelationRef =>
      ctes.get(r.cteId) match {
        case Some((defOut, defMap)) =>
          r.output.zip(defOut).map { case (a, de) =>
            a.exprId -> defMap.getOrElse(de, Set.empty)
          }.toMap
        case None =>
          r.output.map(a => a.exprId -> Set(label(scope, a.name))).toMap
      }
    case l: LeafNode =>
      l.output.map(a => a.exprId -> Set(label(scope, a.name))).toMap
    case p: Project =>
      val cm = childMaps(p, scope, ctes)
      cm ++ named(p.projectList, cm)
    case a: Aggregate =>
      val cm = childMaps(a, scope, ctes)
      cm ++ named(a.aggregateExpressions, cm)
    case w: Window =>
      val cm = childMaps(w, scope, ctes)
      cm ++ named(w.windowExpressions, cm)
    case g: Generate =>
      val cm = childMaps(g, scope, ctes)
      val srcs = g.generator.references.toSeq
        .flatMap(r => cm.getOrElse(r.exprId, Set.empty[String])).toSet
      cm ++ g.generatorOutput.map(a => a.exprId -> srcs).toMap
    case e: Expand =>
      val cm = childMaps(e, scope, ctes)
      // every output position unions the sources of that position
      // across the projection rows (grouping-set expansions)
      cm ++ e.output.zipWithIndex.map { case (a, i) =>
        a.exprId -> e.projections.flatMap(row =>
          row(i).references.toSeq
            .flatMap(r => cm.getOrElse(r.exprId, Set.empty[String]))).toSet
      }.toMap
    case u: Union =>
      val maps = u.children.map(c => build(c, scope, ctes))
      val outs = u.children.map(_.output)
      maps.foldLeft(Map.empty: Sources)(_ ++ _) ++
        u.output.zipWithIndex.map { case (a, i) =>
          a.exprId -> maps.zip(outs).flatMap { case (m, o) =>
            m.getOrElse(o(i).exprId, Set.empty[String])
          }.toSet
        }.toMap
    case other =>
      childMaps(other, scope, ctes)
  }

  private def childMaps(p: LogicalPlan, scope: Option[String],
                        ctes: CteDefs): Sources =
    p.children.map(c => build(c, scope, ctes))
      .foldLeft(Map.empty: Sources)(_ ++ _)

  private def named(nes: Seq[NamedExpression], cm: Sources): Sources =
    nes.map { ne =>
      ne.toAttribute.exprId -> ne.references.toSeq
        .flatMap(r => cm.getOrElse(r.exprId, Set.empty[String])).toSet
    }.toMap

  private def label(scope: Option[String], col: String): String =
    s"${scope.getOrElse("<inline>")}.$col"
}
