package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Alias, And, AttributeReference, Cast, EqualNullSafe, EqualTo, Explode,
  Expression, GreaterThan, GreaterThanOrEqual, If, IntegralDivide, LessThan,
  LessThanOrEqual, Literal, Sequence}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Generate, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{
  DataType, DateType, IntegerType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: BINNED RANGE JOIN — an inner join whose only
  * cross-side condition is an interval containment
  * `lo <= point AND point <= hi` has no equi key, so Spark plans a
  * nested-loop join: every point row is compared against every interval
  * row, O(|points| · |intervals|) — the classic scale killer of
  * point-in-interval enrichment (events × campaign windows, trades ×
  * sessions, reads × gene ranges). The standard fix (the "range join bin"
  * technique) is mechanical: pick a bin width W, explode each interval
  * into the bins it covers, tag each point with its one bin, and
  * equi-join on the bin with the ORIGINAL predicate kept as residual —
  * candidates become O(matches + intervals · span/W) and the join
  * hash-partitions like any other.
  *
  * Correctness does not depend on the bin function beyond monotonicity:
  * `lo ≤ p ≤ hi ⇒ bin(lo) ≤ bin(p) ≤ bin(hi)`, so every true pair is a
  * candidate, and the residual filters the rest exactly. NULL bounds or
  * points produce NULL bins/sequences and drop, matching the original
  * predicate's UNKNOWN. A degenerate interval (lo > hi) must yield zero
  * candidates, but Spark's `sequence(start, stop, 1)` THROWS when
  * start > stop rather than returning empty — so the generator is guarded:
  * `if (bin(lo) <= bin(hi)) sequence(...) else array()`, making inverted
  * rows contribute nothing, same as the original predicate (a NULL guard
  * result also takes the empty branch, matching UNKNOWN).
  * The rewrite leaves the join's output attributes untouched (outer
  * Project), so parents resolve unchanged; once rewritten, the new join
  * HAS an equi conjunct, so the rule never fires twice.
  *
  * Gated on `spark.graft.rangejoin.bin` = W (a positive long, in units
  * of the comparison type's long form: seconds for timestamps, days for
  * dates, the value itself for integrals) — scoped by the caller like
  * q280's MV rewrite. Narrow by design: INNER joins, one bounded point,
  * both bounds from the other side, supported orderable-to-long types.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] {

  private val confKey = "spark.graft.rangejoin.bin"

  private def supported(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | DateType | TimestampType |
        TimestampNTZType => true
    case _ => false
  }

  /** Monotone map to long (seconds for timestamps, days for dates) —
    * truncation is fine: the bin only needs monotonicity, the residual
    * does the exact work.
    */
  private def toLong(e: Expression): Expression =
    if (e.dataType == LongType) e
    // Cast is timezone-aware: without an explicit zone the new node is
    // unresolved and the optimizer's plan validation rejects the rewrite
    else Cast(e, LongType, Some(conf.sessionLocalTimeZone))

  private def bin(e: Expression, w: Long): Expression =
    IntegralDivide(toLong(e), Literal(w))

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case other => Seq(other)
  }

  // lower ≤/< point in either spelling → (point, lower). Strict bounds
  // are fine: lo < p still implies bin(lo) ≤ bin(p), so the candidate
  // set stays complete and the residual applies the strictness exactly.
  private def asLower(e: Expression): Option[(Expression, Expression)] = e match {
    case GreaterThanOrEqual(p, lo) => Some((p, lo))
    case LessThanOrEqual(lo, p) => Some((p, lo))
    case GreaterThan(p, lo) => Some((p, lo))
    case LessThan(lo, p) => Some((p, lo))
    case _ => None
  }
  // point ≤/< upper in either spelling → (point, upper)
  private def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
    case LessThanOrEqual(p, hi) => Some((p, hi))
    case GreaterThanOrEqual(hi, p) => Some((p, hi))
    case LessThan(p, hi) => Some((p, hi))
    case GreaterThan(hi, p) => Some((p, hi))
    case _ => None
  }

  /** true → point from left / bounds from right; false → mirrored. */
  private def orientation(p: Expression, lo: Expression, hi: Expression,
                          left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val boundRefs = lo.references ++ hi.references
    if (p.references.nonEmpty && boundRefs.nonEmpty &&
      p.references.subsetOf(left.outputSet) && boundRefs.subsetOf(right.outputSet))
      Some(true)
    else if (p.references.nonEmpty && boundRefs.nonEmpty &&
      p.references.subsetOf(right.outputSet) && boundRefs.subsetOf(left.outputSet))
      Some(false)
    else None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val w =
      try conf.getConfString(confKey, "0").toLong
      catch { case _: NumberFormatException => 0L }
    if (w <= 0) return plan
    plan.transformUp {
      case j @ Join(left, right, Inner, Some(cond), hint) =>
        rewrite(j, left, right, cond, hint, w).getOrElse(j)
    }
  }

  private def crossSideEqui(cs: Seq[Expression], left: LogicalPlan,
                            right: LogicalPlan): Boolean = cs.exists {
    case EqualTo(a, b) => crosses(a, b, left, right)
    case EqualNullSafe(a, b) => crosses(a, b, left, right)
    case _ => false
  }
  private def crosses(a: Expression, b: Expression, left: LogicalPlan,
                      right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) ||
      (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
        a.references.nonEmpty && b.references.nonEmpty)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression, hint: JoinHint, w: Long): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    // an existing cross-side equi key means Spark already hash-joins —
    // and it's how THIS rule's own output is recognized as done
    if (crossSideEqui(cs, left, right)) return None
    val pair = (for {
      (p1, lo) <- cs.flatMap(asLower)
      (p2, hi) <- cs.flatMap(asUpper)
      if p1.semanticEquals(p2) && supported(p1.dataType) &&
        supported(lo.dataType) && supported(hi.dataType)
      pointOnLeft <- orientation(p1, lo, hi, left, right)
    } yield (p1, lo, hi, pointOnLeft)).headOption
    pair.map { case (p, lo, hi, pointOnLeft) =>
      val (pointPlan, intervalPlan) =
        if (pointOnLeft) (left, right) else (right, left)
      val pBin = Alias(bin(p, w), "graft_pbin")()
      val pProj = Project(pointPlan.output :+ pBin, pointPlan)
      val iBin = AttributeReference("graft_ibin", LongType, nullable = false)()
      // sequence(start, stop, 1) throws "Illegal sequence boundaries" when
      // start > stop — an inverted interval row would crash the whole
      // query. Guard: degenerate (or NULL-bound) intervals explode to an
      // empty array and contribute zero candidates.
      val loBin = bin(lo, w)
      val hiBin = bin(hi, w)
      val emptyBins = Literal.create(Seq.empty[Long],
        org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))
      val gen = Generate(
        Explode(If(LessThanOrEqual(loBin, hiBin),
          Sequence(loBin, hiBin, Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone)),
          emptyBins)),
        unrequiredChildIndex = Nil, outer = false, qualifier = None,
        generatorOutput = Seq(iBin), child = intervalPlan)
      val (nl, nr) = if (pointOnLeft) (pProj, gen) else (gen, pProj)
      val newCond = And(EqualTo(pBin.toAttribute, iBin), cond)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), hint))
    }
  }
}
