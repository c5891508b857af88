package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** `graft_dot(array<bigint>, array<bigint>) -> bigint` — native Catalyst
  * expression with whole-stage codegen (SURVEY.md §2.10 escalation ladder:
  * built-ins first, native Expression before any UDF).
  *
  * The built-in spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0, +)`
  * allocates an intermediate array and drives a lambda interpreter per
  * element; this compiles to a bare fused loop over the two ArrayData
  * buffers — the inner-product kernel the similarity operators run once per
  * candidate pair, millions of times per partition at 100 TB.
  */
case class DotProductLong(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_dot"

  // Replicates the builtin `aggregate(zip_with(a,b,*),0,+)` null semantics:
  // unequal lengths (zip_with null-pads) or a null element null the whole
  // sum, so the result can be null even for non-null array inputs.
  override def nullable: Boolean = true

  private def anyElementNullable: Boolean = Seq(left, right).exists(_.dataType match {
    case ArrayType(_, cn) => cn
    case _ => false
  })

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires two array<bigint> arguments, got " +
        s"${left.dataType.catalogString} and ${right.dataType.catalogString}")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += x.getLong(i) * y.getLong(i)
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      // element null-check only emitted when the input types can hold nulls,
      // so the common non-null hot loop stays branch-free
      val nullCheck =
        if (anyElementNullable)
          s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $s = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += $x.getLong($i) * $y.getLong($i);
         |  }
         |  if (!${ev.isNull}) { ${ev.value} = $s; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductLong =
    copy(left = newLeft, right = newRight)
}

/** Session-level registration of the graft native functions. */
object GraftFunctions {
  private val dotIdent = FunctionIdentifier("graft_dot")
  private val chunksIdent = FunctionIdentifier("graft_chunks")

  /** `graft_dot` as a Spark FunctionDescription — the injectable triple
    * consumed by [[graft.GraftExtensions]] and by [[register]].
    */
  val dotDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (dotIdent,
      new ExpressionInfo(classOf[DotProductLong].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.size == 2, "graft_dot takes exactly 2 arguments")
        DotProductLong(children.head, children(1))
      })

  /** `graft_chunks` (native Generator, [[SlidingChunks]]) as an injectable
    * FunctionDescription.
    */
  val chunksDescription: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (chunksIdent,
      new ExpressionInfo(classOf[SlidingChunks].getName, "graft_chunks"),
      (children: Seq[Expression]) => {
        require(children.size == 3, "graft_chunks takes exactly 3 arguments")
        SlidingChunks(children.head, children(1), children(2))
      })

  /** Idempotently register `graft_dot` with the session's function
    * registry (usable from `expr(...)` and `spark.sql(...)`) and install
    * the [[graft.plans.DotProductRewrite]] optimizer rule so the built-in
    * `aggregate(zip_with(...))` spelling compiles to the native kernel.
    * Programmatic twin of wiring [[graft.GraftExtensions]] through
    * `spark.sql.extensions`.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(dotIdent))
      registry.registerFunction(dotDescription._1, dotDescription._2, dotDescription._3)
    if (!registry.functionExists(chunksIdent))
      registry.registerFunction(chunksDescription._1, chunksDescription._2, chunksDescription._3)
    val extra = spark.experimental.extraOptimizations
    if (!extra.contains(graft.plans.DotProductRewrite))
      spark.experimental.extraOptimizations = extra :+ graft.plans.DotProductRewrite
    val strategies = spark.experimental.extraStrategies
    if (!strategies.contains(graft.plans.AsOfJoinStrategy))
      spark.experimental.extraStrategies = strategies :+ graft.plans.AsOfJoinStrategy
  }
}
