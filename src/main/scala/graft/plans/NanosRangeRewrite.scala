package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: comparisons of the engine's epoch-nanos conversion
  * against long literals —
  * `unix_micros(cast(ntzCol as timestamp)) * 1000  <cmp>  nanosLit`
  * — are rewritten to direct comparisons on the raw TIMESTAMP_NTZ
  * column with the literal folded to a micros-precision NTZ timestamp.
  *
  * Why it matters at 100 TB: the conversion [[graft.Tables.events]]
  * applies at the ingest boundary is opaque to the parquet filter
  * translator, so a time-range predicate over a foreign NTZ-typed file
  * evaluates row-by-row after a full scan. The rewritten comparison is
  * a plain attribute-vs-literal range, which lands in `PushedFilters`
  * and prunes whole row groups by min/max statistics — the
  * reference's `Scan.setTimeRange` pruning
  * (HBaseRDDFunctions.scala:39-46), recovered through Catalyst instead
  * of a special-cased reader.
  *
  * Correctness: with the session clock pinned to UTC (GraftSession),
  * `unix_micros(cast(ntz as timestamp))` is the identity on the NTZ
  * value's internal micros, so `micros * 1000 <cmp> v` is equivalent to
  * an integer bound on micros — `>=` takes ceil(v/1000), `>` floor,
  * `<` ceil, `<=` floor, and `=` only when v is a whole microsecond
  * (sub-micro equality can never hold against a micros column; that
  * shape is left unrewritten rather than folded to `false`, preserving
  * null-vs-false semantics outside Filter). Null flows identically:
  * both forms are null iff the column is null. In any other session
  * timezone the rule backs off entirely.
  */
object NanosRangeRewrite extends Rule[LogicalPlan] {

  /** The nanos-conversion pattern over a TIMESTAMP_NTZ column. */
  private object NanosOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Multiply(UnixMicros(Cast(c, TimestampType, _, _)),
                    Literal(1000L, LongType), _)
          if c.dataType == TimestampNTZType => Some(c)
      case Multiply(Literal(1000L, LongType),
                    UnixMicros(Cast(c, TimestampType, _, _)), _)
          if c.dataType == TimestampNTZType => Some(c)
      case _ => None
    }
  }

  private object NanosLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(v: Long, LongType) => Some(v)
      case _ => None
    }
  }

  private def ntz(micros: Long): Literal = Literal(micros, TimestampNTZType)
  private def floorM(v: Long): Long = Math.floorDiv(v, 1000L)
  private def ceilM(v: Long): Long = Math.floorDiv(v + 999L, 1000L)

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (conf.sessionLocalTimeZone != "UTC") plan
    else plan.transformAllExpressions {
      case GreaterThanOrEqual(NanosOf(c), NanosLit(v)) =>
        GreaterThanOrEqual(c, ntz(ceilM(v)))
      case GreaterThan(NanosOf(c), NanosLit(v)) =>
        GreaterThan(c, ntz(floorM(v)))
      case LessThan(NanosOf(c), NanosLit(v)) =>
        LessThan(c, ntz(ceilM(v)))
      case LessThanOrEqual(NanosOf(c), NanosLit(v)) =>
        LessThanOrEqual(c, ntz(floorM(v)))
      case EqualTo(NanosOf(c), NanosLit(v)) if v % 1000L == 0 =>
        EqualTo(c, ntz(v / 1000L))
      // literal-on-left mirrors (bounds flip with the comparison side)
      case GreaterThanOrEqual(NanosLit(v), NanosOf(c)) =>
        GreaterThanOrEqual(ntz(floorM(v)), c)
      case GreaterThan(NanosLit(v), NanosOf(c)) =>
        GreaterThan(ntz(ceilM(v)), c)
      case LessThan(NanosLit(v), NanosOf(c)) =>
        LessThan(ntz(floorM(v)), c)
      case LessThanOrEqual(NanosLit(v), NanosOf(c)) =>
        LessThanOrEqual(ntz(ceilM(v)), c)
      case EqualTo(NanosLit(v), NanosOf(c)) if v % 1000L == 0 =>
        EqualTo(ntz(v / 1000L), c)
    }
}
