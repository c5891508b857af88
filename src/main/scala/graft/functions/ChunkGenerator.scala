package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `graft_chunks(tokens array<string>, size int, stride int)` — native
  * Catalyst table-generating function (the §2.10 ladder's Generator rung,
  * alongside the scalar Expression `graft_dot`, the `Aggregator`s, and the
  * whole-operator `AsOfJoinPlan`): emits one `(chunk_idx, chunk)` row per
  * sliding window of `size` tokens advancing by `stride`, starting at every
  * offset < len(tokens). The analyzer plans it as a `Generate` node exactly
  * like `explode`/`posexplode`, so the fan-out happens inside the scan
  * stage with no intermediate array-of-structs materialized per row —
  * unlike the built-in spelling `explode(sequence(...))` + `slice(...)`,
  * which allocates the index sequence and re-evaluates the slice against
  * the full token array for every chunk.
  *
  * Generators sit outside whole-stage codegen by design (`GenerateExec`
  * drives them row-by-row), so `CodegenFallback` costs nothing here.
  *
  * Null/empty semantics: a NULL or empty token array generates no rows
  * (inner-join behavior, matching `explode`). `size`/`stride` must be
  * foldable positive ints — enforced at analysis, not per row.
  */
case class SlidingChunks(tokens: Expression, size: Expression, stride: Expression)
  extends Expression with Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(tokens, size, stride)

  override def elementSchema: StructType = StructType(Seq(
    StructField("chunk_idx", LongType, nullable = false),
    StructField("chunk", ArrayType(StringType, containsNull = true),
      nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = {
    def posFoldableInt(e: Expression, name: String): Option[String] =
      if (e.dataType != IntegerType || !e.foldable)
        Some(s"$name must be a foldable int literal")
      else if (e.eval() == null || e.eval().asInstanceOf[Int] <= 0)
        Some(s"$name must be a positive int")
      else None
    val arrOk = tokens.dataType match {
      case ArrayType(StringType, _) => None
      case other => Some(s"tokens must be array<string>, got ${other.catalogString}")
    }
    (arrOk.toSeq ++ posFoldableInt(size, "size") ++ posFoldableInt(stride, "stride"))
      .headOption
      .map(TypeCheckResult.TypeCheckFailure)
      .getOrElse(TypeCheckResult.TypeCheckSuccess)
  }

  private lazy val sz: Int = size.eval().asInstanceOf[Int]
  private lazy val st: Int = stride.eval().asInstanceOf[Int]

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = tokens.eval(input)
    if (arr == null) return Iterator.empty
    val a = arr.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0) return Iterator.empty
    new Iterator[InternalRow] {
      private var off = 0
      private var idx = 0L
      override def hasNext: Boolean = off < n
      override def next(): InternalRow = {
        val end = math.min(off + sz, n)
        val out = new Array[AnyRef](end - off)
        var i = off
        while (i < end) {
          out(i - off) =
            if (a.isNullAt(i)) null else a.getUTF8String(i): UTF8String
          i += 1
        }
        val row = new GenericInternalRow(
          Array[Any](idx, new GenericArrayData(out)))
        idx += 1L
        off += st
        row
      }
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(tokens = newChildren(0), size = newChildren(1), stride = newChildren(2))

  override def prettyName: String = "graft_chunks"
}
