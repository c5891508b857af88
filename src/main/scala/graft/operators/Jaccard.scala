package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Shared exact-Jaccard pair derivation (the common core of TextOps.q74,
  * CorpusOps.q85 and CorpusOps.q89): an inverted-index self-join on set
  * elements — join the exploded per-id element postings on the element
  * with `ida < idb`, count intersections per pair, then Jaccard from the
  * per-id set sizes. Linear in total postings; no all-pairs stage exists
  * anywhere, so the shape survives a 100 TB corpus (the shuffle key is the
  * element, and hot elements split under AQE skew handling).
  */
object Jaccard {

  /** Pairs `(ida, idb, inter, jac)` with `jac >= minJ`.
    *
    * @param postings distinct `(id, e)` rows — one per set element; ids
    *                 must be mutually comparable with `<`
    * @param sizes `(id, sz)` rows — the per-id distinct element count
    * @param minJ similarity floor (0.0 keeps every intersecting pair)
    * @param broadcastSizes broadcast the sizes lookup (right when the id
    *                       domain is small, e.g. languages; leave false
    *                       when ids are documents and sizes is scan-sized)
    */
  def pairs(postings: DataFrame, sizes: DataFrame,
            minJ: Double, broadcastSizes: Boolean = false): DataFrame = {
    val inter = postings.as("a").join(postings.as("b"),
        col("a.e") === col("b.e") && col("a.id") < col("b.id"))
      .groupBy(col("a.id").as("ida"), col("b.id").as("idb"))
      .agg(count(lit(1)).as("inter"))
    val dress: DataFrame => DataFrame =
      if (broadcastSizes) broadcast(_) else identity
    inter
      .join(dress(sizes.select(col("id").as("ida"), col("sz").as("sza"))), "ida")
      .join(dress(sizes.select(col("id").as("idb"), col("sz").as("szb"))), "idb")
      .withColumn("jac",
        col("inter").cast(DoubleType) / (col("sza") + col("szb") - col("inter")))
      .filter(col("jac") >= minJ)
      .select(col("ida"), col("idb"), col("inter"), col("jac"))
  }
}
