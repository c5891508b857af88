package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, BindReferences,
  BoundReference, Descending, GenericInternalRow, JoinedRow, NullsFirst,
  NullsLast, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.Metadata

/** Native as-of join (SURVEY.md §2.3 J7 — the §2.10 escalation ladder's
  * final rung: custom `LogicalPlan` + `Strategy` + `SparkPlan`, injected
  * through `SparkSessionExtensions`).
  *
  * Semantics (backward, the default): for every left row, the
  * `rightValue` of the LAST right row with the same key that is STRICTLY
  * BEFORE the left row in `(time, tiebreak)` order — NULL when no such row
  * exists. A null tiebreak is +inf on the right and -inf on the left:
  * either way the equal-time arm of the strictly-before test is false
  * (SQL three-valued logic evaluates `NULL < x` to NULL), while
  * strictly-earlier times still match. `forward = true` is the exact
  * mirror — the FIRST right row STRICTLY AFTER — executed as the same
  * merge over the reversed traversal order (both sides sort descending,
  * every comparison negated, the null-tiebreak infinities swap sides).
  * Equivalent to
  * the window composition q16 runs, but executed as a single forward merge
  * per co-partition: both sides hash-partition on the key and sort on
  * `(key, time, tiebreak)`, then one O(|L| + |R|) pass joins them with
  * O(1) state — no window buffer, no interleaved union row ever built.
  *
  * Scale shape: one shuffle per side (the same two a shuffled join pays),
  * sorted merge within each partition, constant memory regardless of how
  * many right rows precede a left row. Key/time/tiebreak accept ANY
  * orderable type (compared through the interpreted Catalyst ordering of
  * the column's own type — string keys, decimal times, whatever the data
  * has); the carried value is any type at all, it is never compared. The
  * two sides must agree on each column's type — that is checked up front,
  * because the merge would otherwise compare across types and produce
  * garbage, not an error.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute, leftTie: Attribute,
    rightKey: Attribute, rightTime: Attribute, rightTie: Attribute,
    rightValue: Attribute,
    outAttr: AttributeReference, forward: Boolean,
    tolerance: Option[Long]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output :+ outAttr
  // outAttr is born here, not derived from a child — without this the
  // analyzer's missing-input integrity check rejects the plan
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner rule mapping the logical node to its physical operator. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case j: AsOfJoinPlan =>
      AsOfJoinExec(planLater(j.left), planLater(j.right),
        j.leftKey, j.leftTime, j.leftTie,
        j.rightKey, j.rightTime, j.rightTie, j.rightValue, j.outAttr,
        j.forward, j.tolerance) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute, leftTie: Attribute,
    rightKey: Attribute, rightTime: Attribute, rightTie: Attribute,
    rightValue: Attribute,
    outAttr: AttributeReference, forward: Boolean,
    tolerance: Option[Long]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  // co-partition both sides on the key; EnsureRequirements inserts the
  // exchanges (or reuses compatible existing ones)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // and sort each side by (key, time, tiebreak) — descending when forward,
  // so the one merge pass traverses from the far end and "last consumed"
  // becomes "first after". Null-tiebreak placement must agree with the
  // comparator's infinity mapping or the pass would stall on a null-tie
  // row at an equal-time probe: the right tie (+inf backward, -inf
  // forward) is always traversed last within its (key, time) group, the
  // left tie (-inf backward, +inf forward) always probes first — NULLS
  // LAST / NULLS FIRST respectively in BOTH directions.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
    val d = if (forward) Descending else Ascending
    Seq(
      Seq(SortOrder(leftKey, d), SortOrder(leftTime, d),
        SortOrder(leftTie, d, NullsFirst, Seq.empty)),
      Seq(SortOrder(rightKey, d), SortOrder(rightTime, d),
        SortOrder(rightTie, d, NullsLast, Seq.empty)))
  }

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output).asInstanceOf[BoundReference]
    val lt = BindReferences.bindReference(leftTime, left.output).asInstanceOf[BoundReference]
    val lb = BindReferences.bindReference(leftTie, left.output).asInstanceOf[BoundReference]
    val rk = BindReferences.bindReference(rightKey, right.output).asInstanceOf[BoundReference]
    val rt = BindReferences.bindReference(rightTime, right.output).asInstanceOf[BoundReference]
    val rb = BindReferences.bindReference(rightTie, right.output).asInstanceOf[BoundReference]
    val rv = BindReferences.bindReference(rightValue, right.output).asInstanceOf[BoundReference]
    // interpreted orderings of the columns' OWN types — the merge works for
    // any orderable key/time/tiebreak, not just the events table's shapes
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val timeOrd = TypeUtils.getInterpretedOrdering(leftTime.dataType)
    val tieOrd = TypeUtils.getInterpretedOrdering(leftTie.dataType)
    // dir folds the traversal direction into every comparison: the merge
    // below is written once, for "strictly earlier in traversal order"
    val dir = if (forward) -1 else 1
    // tolerance needs time arithmetic: integral-backed types only
    // (timestamps are Long micros internally, dates Int days) — enforced
    // at build time in AsOfJoin.apply
    def asLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case s: Short => s.toLong
      case b: Byte => b.toLong
      case other => throw new IllegalStateException(
        s"tolerance on non-integral time value $other")
    }
    val outputAttrs = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
        val valueRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        // O(1) state: the pulled-ahead right head and the last right row
        // consumed, each retained as a .copy() snapshot (iterator rows are
        // reused buffers and must never be referenced past next())
        var lastRow: InternalRow = null
        var rRow: InternalRow = null
        def pullRight(): Unit = {
          rRow = null
          // a null key or time can never satisfy the strictly-before
          // comparison (SQL three-valued logic) — skip those rows. A null
          // TIEBREAK row stays: it ranks +inf (see strictlyBefore)
          while (rRow == null && rIter.hasNext) {
            val r = rIter.next()
            if (!r.isNullAt(rk.ordinal) && !r.isNullAt(rt.ordinal)) rRow = r.copy()
          }
        }
        pullRight()
        lIter.map { l =>
          if (l.isNullAt(lk.ordinal) || l.isNullAt(lt.ordinal)) {
            valueRow.setNullAt(0) // null key/time never matches
          } else {
            val k = lk.eval(l)
            val t = lt.eval(l)
            // null tiebreaks follow SQL three-valued logic: the equal-time
            // arm of strictly-before is NULL (never true) when EITHER tie
            // is null — a null left tie acts as -inf, a null right tie as
            // +inf; strictly-earlier times still match either way
            val b = lb.eval(l)
            def strictlyBefore(r: InternalRow): Boolean = {
              val ck = keyOrd.compare(rk.eval(r), k) * dir
              if (ck != 0) ck < 0
              else {
                val ct = timeOrd.compare(rt.eval(r), t) * dir
                if (ct != 0) ct < 0
                else {
                  val rtie = rb.eval(r)
                  b != null && rtie != null && tieOrd.compare(rtie, b) * dir < 0
                }
              }
            }
            // consume right rows strictly before (k, t, b)
            while (rRow != null && strictlyBefore(rRow)) {
              lastRow = rRow
              pullRight()
            }
            // tolerance filters only the SELECTED row: the merge picks
            // the nearest row on its side, and any other candidate is
            // farther, so "selected row within tolerance" is equivalent
            // to "latest/earliest row within tolerance exists"
            val lastVal = if (lastRow == null) null
              else if (keyOrd.compare(rk.eval(lastRow), k) != 0) null
              else if (tolerance.exists(tol => math.abs(
                asLong(t) - asLong(rt.eval(lastRow))) > tol)) null
              else rv.eval(lastRow)
            if (lastVal != null) valueRow.update(0, lastVal)
            else valueRow.setNullAt(0)
          }
          proj(joined(l, valueRow))
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsOfJoin {
  /** Build the as-of joined DataFrame: `left`'s rows plus `outName` — the
    * last `valueCol` from `right` (same `keyCol`) strictly before the left
    * row in `(timeCol, tieCol)` order (or the FIRST strictly after, with
    * `direction = "forward"`). `tolerance` bounds how far the matched row
    * may be from the left row, in the time column's backing unit
    * (micros for timestamps, days for dates): a nearest row farther than
    * that yields NULL, exactly pandas merge_asof's contract. Columns are
    * resolved by name from each side's analyzed plan; key/time/tie may be
    * any ORDERABLE type (each matching between the two sides) — except
    * that a tolerance needs an integral-backed time — the carried value
    * any type.
    */
  def apply(spark: SparkSession,
            leftDf: org.apache.spark.sql.DataFrame,
            rightDf: org.apache.spark.sql.DataFrame,
            keyCol: String, timeCol: String, tieCol: String,
            valueCol: String, outName: String,
            direction: String = "backward",
            tolerance: Option[Long] = None): org.apache.spark.sql.DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward or forward, got $direction")
    import org.apache.spark.sql.functions.col
    // both sides often derive from the same scan; re-alias every right
    // column so the two children never share expression ids (the manual
    // analog of the analyzer's self-join deduplication)
    val rightFresh = rightDf.select(
      rightDf.columns.map(c => col(c).as(c)): _*)
    val lp = leftDf.queryExecution.analyzed
    val rp = rightFresh.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found in ${p.output.map(_.name)}"))
    // fail fast on the type contract: both sides must agree on each merge
    // column's type and the type must be orderable — a silent mismatch
    // would compare across types and produce garbage, not an error
    def checked(name: String): (Attribute, Attribute) = {
      val (la, ra) = (attr(lp, name), attr(rp, name))
      require(la.dataType == ra.dataType,
        s"as-of column $name: left is ${la.dataType}, right is ${ra.dataType}")
      require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(la.dataType),
        s"as-of column $name: ${la.dataType} is not orderable")
      (la, ra)
    }
    val (lKey, rKey) = checked(keyCol)
    val (lTime, rTime) = checked(timeCol)
    val (lTie, rTie) = checked(tieCol)
    // tolerance subtracts time values, so the time column must be backed
    // by an integral physical type (timestamp = Long micros, date = Int
    // days, or a plain integral column); the unit is that backing unit
    tolerance.foreach { tol =>
      require(tol >= 0, s"tolerance must be nonnegative, got $tol")
      import org.apache.spark.sql.types._
      val ok = lTime.dataType match {
        case TimestampType | TimestampNTZType | DateType => true
        case LongType | IntegerType | ShortType | ByteType => true
        case _ => false
      }
      require(ok, s"tolerance needs an integral-backed time column, " +
        s"got ${lTime.dataType}")
    }
    val rVal = attr(rp, valueCol)
    val node = AsOfJoinPlan(lp, rp,
      lKey, lTime, lTie, rKey, rTime, rTie, rVal,
      AttributeReference(outName, rVal.dataType, nullable = true, Metadata.empty)(),
      forward = direction == "forward", tolerance = tolerance)
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }
}
