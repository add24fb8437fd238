package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Coalesce, HllSketchEstimate, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, HllSketchAgg}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType, StringType}

/** Opt-in ClickHouse-`uniq()` semantics as a Catalyst optimizer rule:
  * when `spark.graft.approxDistinct=true`, every exact
  * `COUNT(DISTINCT x)` in the plan rewrites to a DataSketches HLL
  * estimate (`hll_sketch_estimate(hll_sketch_agg(x))`) — ClickHouse's
  * default approximate-distinct trade, made available per session
  * without touching a line of query code.
  *
  * Why a Rule and not a function: the reference's users write
  * `uniq(x)` habitually and get the sketch; a Spark user migrating a
  * dashboard of `countDistinct` queries flips ONE conf instead of
  * editing every query. The exact form stays the default (`false`):
  * the oracle suite and anything unflagged are untouched.
  *
  * Scale story: exact distinct on a high-cardinality key shuffles
  * every distinct value; the sketch shuffles one ~4 KB buffer per
  * group per partition — the difference between a terabyte exchange
  * and a megabyte one at 100 TB. Only single-argument distincts over
  * sketch-supported types rewrite (int/long/string/binary); multi-arg
  * and other types keep exact semantics.
  */
case class ApproxDistinctRewrite(session: SparkSession) extends Rule[LogicalPlan] {

  private def enabled: Boolean =
    session.conf.get("spark.graft.approxDistinct", "false").toBoolean

  private val supported = Set[org.apache.spark.sql.types.DataType](
    IntegerType, LongType, StringType, BinaryType)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!enabled) plan
    else plan.transform {
      case agg: Aggregate =>
        agg.transformExpressions {
          case ae @ AggregateExpression(Count(children), _, true, _, _)
              if children.size == 1 && supported.contains(children.head.dataType) =>
            // coalesce to 0: over an empty relation the sketch estimate
            // is NULL while exact COUNT(DISTINCT) is 0, and Count's
            // contract is non-nullable — keep both semantics
            Coalesce(Seq(
              HllSketchEstimate(ae.copy(
                aggregateFunction = new HllSketchAgg(children.head),
                isDistinct = false)),
              Literal(0L)))
        }
    }
}
