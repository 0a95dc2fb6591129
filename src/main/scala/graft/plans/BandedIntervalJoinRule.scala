package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, TimestampType}

/** Optimizer rule (SURVEY §2.4 J5 at scale): an INNER join whose only
  * condition is a closed timestamp interval — `l.ts BETWEEN r.lo AND r.hi`
  * with no equi conjunct — can only be planned by Spark as a nested-loop
  * join: O(|L|·|R|) comparisons, the classic 100 TB scale-killer. This rule
  * rewrites the LOGICAL join into the banded form
  * ([[graft.operators.RangeJoin.bandedIntervalJoin]] expressed as plan
  * nodes): both sides bucketed by `floor(unix_micros / band)`, the interval
  * side exploded to every band its range overlaps, the join turned into a
  * band EQUI join with the original interval predicate kept as residual —
  * so users (and SQL text) can write the natural theta join and still get a
  * shuffle hash/sort-merge plan.
  *
  * Row-identity with the naive join: every band of the interval
  * [lo, hi] is generated, so any ts in the interval shares a band with
  * exactly one generated row per (interval row); the residual re-checks the
  * exact bounds; the final Project restores the original output (the band
  * columns are internal). Asserted in RangeJoinSpec (results) and by the
  * q100 oracle (hash-equal to the naive SQL in DuckDB).
  *
  * Scope guards: only Inner joins; only a single `And` of two bounds on the
  * SAME timestamp attribute with both bounds from the opposite side; fires
  * only when `spark.graft.rangeJoin.bandSeconds` > 0 (set session-wide by
  * GraftSession; width tunes replication — ceil(range/band)+1 rows per
  * interval row). The rewritten join contains an equi conjunct, so the rule
  * never re-fires on its own output.
  */
case class BandedIntervalJoinRule() extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.rangeJoin.bandSeconds"

  private def bandUs: Long =
    conf.getConfString(confKey, "0").toLong * 1000000L

  /** Normalize a comparison to (greater, lesser): x >= y. */
  private def geq(e: Expression): Option[(AttributeReference, AttributeReference)] =
    e match {
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) =>
        Some((a, b))
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference) =>
        Some((b, a))
      case _ => None
    }

  /** Match `ts >= lo AND ts <= hi` (any conjunct order/direction) where ts
    * comes from one join side and lo/hi both from the other. Returns
    * (ts, lo, hi, tsOnLeft). */
  private def matchInterval(cond: Expression, l: LogicalPlan, r: LogicalPlan)
      : Option[(AttributeReference, AttributeReference, AttributeReference, Boolean)] =
    cond match {
      case And(c1, c2) =>
        for {
          b1 <- geq(c1) // x1 >= y1
          b2 <- geq(c2) // x2 >= y2
          tlh <- (b1, b2) match {
            // ts >= lo, hi >= ts
            case ((x1, y1), (x2, y2)) if x1.semanticEquals(y2) => Some((x1, y1, x2))
            case ((x1, y1), (x2, y2)) if x2.semanticEquals(y1) => Some((x2, y2, x1))
            case _ => None
          }
          (ts, lo, hi) = tlh
          if Seq(ts, lo, hi).forall(_.dataType == TimestampType)
          tsOnLeft <-
            if (l.outputSet.contains(ts) && r.outputSet.contains(lo) &&
              r.outputSet.contains(hi)) Some(true)
            else if (r.outputSet.contains(ts) && l.outputSet.contains(lo) &&
              l.outputSet.contains(hi)) Some(false)
            else None
        } yield (ts, lo, hi, tsOnLeft)
      case _ => None
    }

  private def bandOf(e: Expression, band: Long): Expression =
    Floor(Divide(Cast(UnixMicros(e), DoubleType), Literal(band.toDouble)))

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val band = bandUs
    if (band <= 0) return plan
    plan.transform {
      case j @ Join(l, r, Inner, Some(cond), hint) =>
        matchInterval(cond, l, r) match {
          case Some((ts, lo, hi, tsOnLeft)) =>
            val tsSide = if (tsOnLeft) l else r
            val ivSide = if (tsOnLeft) r else l
            val tsBand = Alias(bandOf(ts, band), "__band_ts")()
            val tsProj = Project(tsSide.output :+ tsBand, tsSide)
            val seq = Sequence(bandOf(lo, band), bandOf(hi, band), None,
              Some(conf.sessionLocalTimeZone))
            val ivBand = AttributeReference("__band_iv", LongType, nullable = false)()
            val ivGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
              outer = false, qualifier = None, generatorOutput = Seq(ivBand),
              child = ivSide)
            val newCond = And(EqualTo(tsBand.toAttribute, ivBand), cond)
            val (nl, nr) = if (tsOnLeft) (tsProj, ivGen) else (ivGen, tsProj)
            Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
          case None => j
        }
    }
  }
}
