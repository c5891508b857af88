package graft.functions

import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Column, Encoder}
import org.apache.spark.sql.functions.udaf

/** Mergeable bottom-k sketch as a typed [[Aggregator]] (SURVEY.md §2.10:
  * custom aggregate = Aggregator + udaf). Keeps the k smallest values seen;
  * buffers are tiny (k longs), merge is associative+commutative, so partial
  * aggregation applies and the shuffle carries k values per group
  * regardless of input size — the same economics as a sketch at 100 TB.
  */
case class BottomKAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] =
    if (buf.size < k) (buf :+ x).sorted
    else if (x < buf.last) (buf.init :+ x).sorted
    else buf

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

/** KMV (k-minimum-values) distinct sketch: the k smallest DISTINCT hash
  * values seen. Dedup happens inside the sketch, so the distinct-count
  * estimate needs no upstream `DISTINCT` shuffle — state is ≤ k longs per
  * group through every partial/merge hop, the one-pass economics an
  * approximate COUNT DISTINCT needs at 100 TB. Unlike HLL the whole
  * sketch is deterministic given the hash function, so an oracle can
  * replay it value-for-value.
  */
case class KmvSketchAgg(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
  override def zero: Seq[Long] = Seq.empty

  override def reduce(buf: Seq[Long], x: Long): Seq[Long] =
    // cheap reject first: once the sketch is full, anything >= the current
    // k-th minimum can neither enter nor change it (x == last is a dup)
    if (buf.size >= k && x >= buf.last) buf
    else if (buf.contains(x)) buf
    else if (buf.size < k) (buf :+ x).sorted
    else (buf.init :+ x).sorted

  override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    (a ++ b).distinct.sorted.take(k)

  override def finish(r: Seq[Long]): Seq[Long] = r

  override def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object BottomK {
  /** Column-level bottom-k aggregate usable in `agg(...)`. */
  def bottomK(k: Int)(c: Column): Column = udaf(BottomKAgg(k)).apply(c)

  /** Column-level KMV distinct sketch usable in `agg(...)`. */
  def kmv(k: Int)(c: Column): Column = udaf(KmvSketchAgg(k)).apply(c)
}
