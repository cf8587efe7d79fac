package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, CreateArray, Expression, GetArrayItem, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: collapse N scalar `percentile(col, p_i)` aggregates
  * over the same column into ONE `percentile(col, array(p_1..p_N))`
  * evaluation plus a projection of array elements.
  *
  * Why it matters: Percentile is a sort-based aggregate whose buffer
  * holds every value of the group. N separate calls over the same column
  * keep N copies of that buffer and run N sorts — at 100 TB that is N×
  * the aggregation memory and spill for byte-identical results. Spark's
  * optimizer does not consolidate them (each AggregateExpression is
  * planned independently); this rule does, turning the quartile pattern
  * (x20: p25/p50/p75/p90, x47: p45/p50/p55) into one buffer + one sort.
  * The merged Percentile interpolates each requested fraction from the
  * same sorted counts, so results are bit-identical to the unmerged
  * plan — pinned by MergePercentilesSpec and, end-to-end, by the driver
  * correctness gate (Verify/Bench sessions install this rule).
  *
  * Scope guard: only top-level `Alias(AggregateExpression(Percentile))`
  * outputs with scalar foldable percentages, no DISTINCT, no FILTER, no
  * reverse, and semantically-equal child/frequency expressions merge;
  * everything else passes through untouched. Idempotent: merged
  * percentiles carry array percentages, which the matcher excludes.
  */
object MergePercentiles extends Rule[LogicalPlan] {

  /** (child, frequency, reverse) — the merge-compatibility key. */
  private type GroupKey = (Expression, Expression, Boolean)

  private def mergeable(ne: NamedExpression): Option[(Alias, AggregateExpression, Percentile)] =
    ne match {
      case a @ Alias(ae @ AggregateExpression(p: Percentile, _, false, None, _), _)
          if p.percentageExpression.foldable &&
            !p.percentageExpression.dataType.isInstanceOf[org.apache.spark.sql.types.ArrayType] &&
            !p.reverse =>
        Some((a, ae, p))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      val candidates = agg.aggregateExpressions.flatMap(mergeable)
      val groups = candidates
        .groupBy { case (_, _, p) =>
          (p.child.canonicalized, p.frequencyExpression.canonicalized, p.reverse): GroupKey
        }
        .filter(_._2.length >= 2)
      if (groups.isEmpty) agg
      else {
        // One merged percentile per group, in first-appearance order.
        val mergedByAlias = scala.collection.mutable.HashMap.empty[Long, (Alias, Int)]
        val mergedAliases = groups.toSeq
          .sortBy { case (_, ms) => agg.aggregateExpressions.indexOf(ms.head._1) }
          .map { case (_, members) =>
            val (_, ae0, p0) = members.head
            val merged = p0.copy(
              percentageExpression = CreateArray(members.map(_._3.percentageExpression)))
            val mergedAe = ae0.copy(aggregateFunction = merged,
              resultId = NamedExpression.newExprId)
            val alias = Alias(mergedAe, "__merged_percentile")()
            members.zipWithIndex.foreach { case ((a, _, _), i) =>
              mergedByAlias(a.exprId.id) = (alias, i)
            }
            alias
          }
        val mergedSet = candidates.collect {
          case (a, _, _) if mergedByAlias.contains(a.exprId.id) => a.exprId.id
        }.toSet
        val newAggExprs =
          agg.aggregateExpressions.filterNot(ne => mergedSet.contains(ne.exprId.id)) ++
            mergedAliases
        // Original output names/exprIds survive in a projection, so parent
        // operators' references stay valid.
        val projectList = agg.aggregateExpressions.map { ne =>
          mergedByAlias.get(ne.exprId.id) match {
            case Some((mergedAlias, idx)) =>
              Alias(GetArrayItem(mergedAlias.toAttribute, Literal(idx)), ne.name)(
                exprId = ne.exprId, qualifier = ne.qualifier)
            case None => ne.toAttribute
          }
        }
        Project(projectList, agg.copy(aggregateExpressions = newAggExprs))
      }
  }
}
