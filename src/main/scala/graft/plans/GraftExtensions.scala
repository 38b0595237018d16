package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Engine extensions, registered via
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")` or
  * `.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => PushdownNanosTimestampPredicate)
    e.injectPlannerStrategy(_ => TopKPerProbeStrategy)
  }
}

/** Rewrites comparisons against the ns→µs-converted events timestamp into
  * raw-nanos predicates so they reach the parquet scan.
  *
  * The events table stores TIMESTAMP(NANOS), which Spark reads as a long
  * (legacy flag) and converts with `timestamp_micros(ts div 1000)` — an
  * expression Catalyst cannot push through, losing row-group pruning on
  * the one column every incremental-window query filters on. Since
  * µs = floor(ns/1000), each comparison has an exact integer-arithmetic
  * equivalent on the raw column:
  *
  *   floor(ns/1000) >= T  ⟺  ns >= T*1000
  *   floor(ns/1000) >  T  ⟺  ns >= (T+1)*1000
  *   floor(ns/1000) <  T  ⟺  ns <  T*1000
  *   floor(ns/1000) <= T  ⟺  ns <  (T+1)*1000
  *   floor(ns/1000) =  T  ⟺  ns >= T*1000 AND ns < (T+1)*1000
  *
  * The rewrite replaces the predicate (exact equivalence, so results are
  * unchanged); the plain long comparison then pushes to the scan as a
  * normal parquet filter.
  */
object PushdownNanosTimestampPredicate extends Rule[LogicalPlan] {

  /** timestamp_micros(raw div 1000) → raw */
  private object NanosConversion {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(raw, Literal(1000L, LongType), _))
          if raw.dataType == LongType => Some(raw)
      case _ => None
    }
  }

  private object TsLiteral {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, TimestampType) => Some(v)
      case Cast(Literal(v: Long, TimestampType), TimestampType, _, _) => Some(v)
      case _ => None
    }
  }

  private def nsLit(micros: Long): Literal = Literal(micros * 1000L, LongType)

  /** The rewrite is only exact when (a) `(t+1)*1000` cannot overflow Long and
    * (b) `t >= 1`, because Spark's IntegralDivide truncates toward zero (not
    * floor): for negative raw nanos, `ns div 1000` rounds up, so the floor
    * identities above only hold when the literal bound is positive (any
    * negative-nanos row is then strictly below the bound on both sides).
    * Out-of-range literals (pre-1970 or far-future like TIMESTAMP '9999-12-31'
    * at ns scale) are left unrewritten — correct, just not pushed down.
    */
  private def rewritable(t: Long): Boolean =
    t >= 1L && t <= Long.MaxValue / 1000L - 2L

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    case GreaterThanOrEqual(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      GreaterThanOrEqual(raw, nsLit(t))
    case GreaterThan(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      GreaterThanOrEqual(raw, nsLit(t + 1))
    case LessThan(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      LessThan(raw, nsLit(t))
    case LessThanOrEqual(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      LessThan(raw, nsLit(t + 1))
    case EqualTo(NanosConversion(raw), TsLiteral(t)) if rewritable(t) =>
      And(GreaterThanOrEqual(raw, nsLit(t)), LessThan(raw, nsLit(t + 1)))
    // mirrored operand order
    case GreaterThanOrEqual(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      LessThan(raw, nsLit(t + 1))
    case GreaterThan(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      LessThan(raw, nsLit(t))
    case LessThan(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      GreaterThanOrEqual(raw, nsLit(t + 1))
    case LessThanOrEqual(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      GreaterThanOrEqual(raw, nsLit(t))
    case EqualTo(TsLiteral(t), NanosConversion(raw)) if rewritable(t) =>
      And(GreaterThanOrEqual(raw, nsLit(t)), LessThan(raw, nsLit(t + 1)))
  }
}
