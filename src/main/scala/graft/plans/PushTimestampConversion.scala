package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Optimizer rule: rewrite comparisons of
  * `timestamp_micros(x div 1000) <op> TIMESTAMP_LITERAL` into integer
  * comparisons on the raw `x` (nanosecond) column.
  *
  * Why: nanosecond-precision parquet columns are read as raw longs
  * (`spark.sql.legacy.parquet.nanosAsLong`) and converted to
  * timestamps in a projection. A watermark filter on the converted
  * column arrives at the scan as a function of `x`, which the parquet
  * source cannot push — at 100 TB that is the difference between
  * pruning row groups server-side and scanning everything. After this
  * rewrite the predicate is a plain long comparison on `x`
  * (`PushedFilters: [GreaterThan(ts, …)]`).
  *
  * Soundness (integer floor/truncation arithmetic, for literal micros
  * `t` where noted; `x div 1000` is Spark IntegralDivide = truncation
  * toward zero):
  *   x div 1000 >  t  ⟺  x >  t*1000 + 999   (t ≥ 0)
  *   x div 1000 ≥  t  ⟺  x ≥  t*1000         (t ≥ 1)
  *   x div 1000 <  t  ⟺  x <  t*1000         (t ≥ 1)
  *   x div 1000 ≤  t  ⟺  x ≤  t*1000 + 999   (t ≥ 0)
  * Negative-`t` (pre-1970) literals are left untouched — truncation
  * and floor disagree there.
  */
object PushTimestampConversion extends Rule[LogicalPlan] {

  private object NanosToTs {
    /** Matches timestamp_micros(x div 1000) and yields x. */
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide) =>
        d.right match {
          case Literal(1000L, LongType) => Some(d.left)
          case _ => None
        }
      case _ => None
    }
  }

  private def micros(l: Literal): Long = l.value.asInstanceOf[Long]

  private def rewrite(cond: Expression): Expression = cond.transformUp {
    case GreaterThan(NanosToTs(x), l @ Literal(_, TimestampType)) if micros(l) >= 0 =>
      GreaterThan(x, Literal(micros(l) * 1000L + 999L))
    case GreaterThanOrEqual(NanosToTs(x), l @ Literal(_, TimestampType)) if micros(l) >= 1 =>
      GreaterThanOrEqual(x, Literal(micros(l) * 1000L))
    case LessThan(NanosToTs(x), l @ Literal(_, TimestampType)) if micros(l) >= 1 =>
      LessThan(x, Literal(micros(l) * 1000L))
    case LessThanOrEqual(NanosToTs(x), l @ Literal(_, TimestampType)) if micros(l) >= 0 =>
      LessThanOrEqual(x, Literal(micros(l) * 1000L + 999L))
    // literal-on-left mirrors
    case GreaterThan(l @ Literal(_, TimestampType), NanosToTs(x)) if micros(l) >= 1 =>
      GreaterThan(Literal(micros(l) * 1000L), x)
    case LessThan(l @ Literal(_, TimestampType), NanosToTs(x)) if micros(l) >= 0 =>
      LessThan(Literal(micros(l) * 1000L + 999L), x)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond, child) =>
      val next = rewrite(cond)
      if (next fastEquals cond) f else Filter(next, child)
  }
}
