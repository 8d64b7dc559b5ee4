package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CreateArray, ElementAt, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Percentile}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Fuse sibling scalar `percentile(col, p₁) … percentile(col, pₙ)`
  * aggregates over the same column into ONE
  * `percentile(col, array(p₁…pₙ))` plus per-output `element_at`
  * projections.
  *
  * Why this matters at scale: `Percentile` is an object aggregate whose
  * buffer is a value→count hash map over the ENTIRE group. Spark plans
  * each distinct percentage as its own aggregate function, so
  * `agg(percentile(v, 0.25), percentile(v, 0.75))` — the shape of every
  * quartile-fence/quartile-score/equi-depth operator in this engine
  * (Stats, q43/q76/q78/q79) — builds and updates N IDENTICAL maps per
  * group: N× the aggregation memory and N× the per-row update cost for
  * byte-identical state. The array form computes every requested
  * percentage from one buffer in one sort; this rule rewrites the
  * former into the latter, which Spark does not do on its own.
  *
  * Safety: only non-distinct, unfiltered, forward `Percentile`s with a
  * foldable scalar DOUBLE percentage fuse, grouped by (child, frequency)
  * canonical equality — everything else is left untouched. Results are
  * bit-identical: the array variant runs the same interpolation over the
  * same buffer, and replacements share one `resultId`, so physical
  * planning deduplicates the fused function into a single buffer.
  *
  * Registered via [[graft.GraftExtensions]] (`injectOptimizerRule`).
  */
object FusePercentiles extends Rule[LogicalPlan] {

  private type Key = (Expression, Expression)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case agg: Aggregate =>
      // first-occurrence-ordered: (child, freq) -> percentage -> the ae
      val groups = scala.collection.mutable.LinkedHashMap
        .empty[Key, scala.collection.mutable.LinkedHashMap[Double, AggregateExpression]]
      agg.aggregateExpressions.foreach(_.foreach {
        case ae @ AggregateExpression(p: Percentile, _, false, None, _) if !p.reverse =>
          p.percentageExpression match {
            case Literal(d: Double, DoubleType) =>
              groups.getOrElseUpdate(
                  (p.child.canonicalized, p.frequencyExpression.canonicalized),
                  scala.collection.mutable.LinkedHashMap.empty)
                .getOrElseUpdate(d, ae)
            case _ =>
          }
        case _ =>
      })
      val fusable = groups.filter(_._2.size >= 2)
      if (fusable.isEmpty) agg
      else {
        val repl = scala.collection.mutable.HashMap.empty[Expression, Expression]
        fusable.values.foreach { byP =>
          val proto = byP.values.head
          val pr = proto.aggregateFunction.asInstanceOf[Percentile]
          val fused = proto.copy(aggregateFunction = Percentile(
            pr.child, CreateArray(byP.keys.toSeq.map(Literal(_))),
            pr.frequencyExpression))
          byP.zipWithIndex.foreach { case ((_, ae), i) =>
            repl(ae.canonicalized) = ElementAt(fused, Literal(i + 1))
          }
        }
        val rewritten = agg.aggregateExpressions.map { ne =>
          ne.transform {
            case ae: AggregateExpression if repl.contains(ae.canonicalized) =>
              repl(ae.canonicalized)
          }.asInstanceOf[NamedExpression]
        }
        agg.copy(aggregateExpressions = rewritten)
      }
  }
}
