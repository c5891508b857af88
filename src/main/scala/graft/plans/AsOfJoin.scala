package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, AttributeReference, AttributeSet, BindReferences,
  BoundReference, GenericInternalRow, JoinedRow, NullsLast, SortOrder,
  UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DoubleType, Metadata}

/** Native as-of join (SURVEY.md §2.3 J7 — the §2.10 escalation ladder's
  * final rung: custom `LogicalPlan` + `Strategy` + `SparkPlan`, injected
  * through `SparkSessionExtensions`).
  *
  * Semantics: for every left row, the `rightValue` of the LAST right row
  * with the same key that is STRICTLY BEFORE the left row in
  * `(time, tiebreak)` order — NULL when no such row exists. A null
  * tiebreak is +inf on the right and -inf on the left: either way the
  * equal-time arm of the strictly-before test is false (SQL three-valued
  * logic evaluates `NULL < x` to NULL), while strictly-earlier times still
  * match. Equivalent to
  * the window composition q16 runs, but executed as a single forward merge
  * per co-partition: both sides hash-partition on the key and sort on
  * `(key, time, tiebreak)`, then one O(|L| + |R|) pass joins them with
  * O(1) state — no window buffer, no interleaved union row ever built.
  *
  * Scale shape: one shuffle per side (the same two a shuffled join pays),
  * sorted merge within each partition, constant memory regardless of how
  * many right rows precede a left row. Keys and tiebreaks are `bigint`,
  * times are `timestamp` (micros), the carried value is `double` — the
  * concrete shapes the events table needs; widening to generic types is a
  * projection away (cast up front, cast back after).
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTime: Attribute, leftTie: Attribute,
    rightKey: Attribute, rightTime: Attribute, rightTie: Attribute,
    rightValue: Attribute,
    outAttr: AttributeReference) extends BinaryNode {
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
        j.rightKey, j.rightTime, j.rightTie, j.rightValue, j.outAttr) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Attribute, leftTime: Attribute, leftTie: Attribute,
    rightKey: Attribute, rightTime: Attribute, rightTie: Attribute,
    rightValue: Attribute,
    outAttr: AttributeReference) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output :+ outAttr
  override def producedAttributes: AttributeSet = AttributeSet(outAttr)

  // co-partition both sides on the key; EnsureRequirements inserts the
  // exchanges (or reuses compatible existing ones)
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

  // and sort each side by (key, time, tiebreak) so one forward pass joins.
  // The right tiebreak sorts NULLS LAST (not Spark's ascending default of
  // nulls-first) because the merge treats a null right tiebreak as +inf:
  // physical order must agree with the comparator or the forward pass
  // would stall on a null-tie row at an equal-time probe
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTie, Ascending, NullsLast, Seq.empty)))

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
    val outputAttrs = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val proj = UnsafeProjection.create(outputAttrs, outputAttrs)
        val valueRow = new GenericInternalRow(1)
        val joined = new JoinedRow
        // O(1) state: the last right row consumed, as primitives (right
        // iterator rows are reused buffers and must never be retained)
        var haveLast = false
        var lastKey = 0L
        var lastNull = true
        var lastVal = 0.0
        // the right head, pulled one row ahead
        var rHas = false
        var rKey = 0L; var rTime = 0L; var rTie = 0L
        var rNull = true; var rVal = 0.0
        def pullRight(): Unit =
          if (rIter.hasNext) {
            val r = rIter.next()
            // a null key or time can never satisfy the strictly-before
            // comparison (SQL three-valued logic) — skip. A null TIEBREAK
            // only nulls the equal-time arm of the OR: strictly earlier
            // times still match, so map it to Long.MaxValue (the mirror of
            // the left side's Long.MinValue) instead of dropping the row
            if (r.isNullAt(rk.ordinal) || r.isNullAt(rt.ordinal)) { pullRight() }
            else {
              rHas = true
              rKey = r.getLong(rk.ordinal)
              rTime = r.getLong(rt.ordinal)
              rTie = if (r.isNullAt(rb.ordinal)) Long.MaxValue else r.getLong(rb.ordinal)
              rNull = r.isNullAt(rv.ordinal)
              rVal = if (rNull) 0.0 else r.getDouble(rv.ordinal)
            }
          } else rHas = false
        pullRight()
        lIter.map { l =>
          if (l.isNullAt(lk.ordinal) || l.isNullAt(lt.ordinal)) {
            valueRow.setNullAt(0) // null key/time never matches
          } else {
            val k = l.getLong(lk.ordinal)
            val t = l.getLong(lt.ordinal)
            // a left row with a NULL tiebreak matches only strictly
            // earlier times (the same-time arm of the OR is NULL in SQL):
            // Long.MinValue makes the equal-time comparison always false
            val b = if (l.isNullAt(lb.ordinal)) Long.MinValue else l.getLong(lb.ordinal)
            // consume right rows strictly before (k, t, b)
            while (rHas && (rKey < k ||
                (rKey == k && (rTime < t || (rTime == t && rTie < b))))) {
              haveLast = true; lastKey = rKey; lastNull = rNull; lastVal = rVal
              pullRight()
            }
            if (haveLast && lastKey == k && !lastNull) valueRow.update(0, lastVal)
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
    * row in `(timeCol, tieCol)` order. Columns are resolved by name from
    * each side's analyzed plan; key/tie must be `bigint`, time `timestamp`,
    * value `double`.
    */
  def apply(spark: SparkSession,
            leftDf: org.apache.spark.sql.DataFrame,
            rightDf: org.apache.spark.sql.DataFrame,
            keyCol: String, timeCol: String, tieCol: String,
            valueCol: String, outName: String): org.apache.spark.sql.DataFrame = {
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
    // fail fast on the documented type contract: the exec reads fixed-width
    // slots, so a silently mistyped column would produce garbage, not an error
    import org.apache.spark.sql.types.{LongType, TimestampType}
    def expect(a: Attribute, t: org.apache.spark.sql.types.DataType): Attribute = {
      require(a.dataType == t, s"as-of column ${a.name}: expected $t, got ${a.dataType}")
      a
    }
    val node = AsOfJoinPlan(lp, rp,
      expect(attr(lp, keyCol), LongType), expect(attr(lp, timeCol), TimestampType),
      expect(attr(lp, tieCol), LongType),
      expect(attr(rp, keyCol), LongType), expect(attr(rp, timeCol), TimestampType),
      expect(attr(rp, tieCol), LongType), expect(attr(rp, valueCol), DoubleType),
      AttributeReference(outName, DoubleType, nullable = true, Metadata.empty)())
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, node)
  }
}
