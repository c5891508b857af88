package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Shared exact-Jaccard pair derivation (the common core of TextOps.q74,
  * CorpusOps.q85/q113/q186 and CorpusOps.q89): an inverted index grouped
  * by set element — per-element posting lists, pairs `ida < idb` fanned
  * out within each list, intersections counted per pair, then Jaccard
  * from the per-id set sizes.
  *
  * Scale: an element shared by k ids emits k(k-1)/2 pairs, so the fan-out
  * is linear in total postings ONLY while no element is hot — a
  * boilerplate shingle in half the corpus (license headers, navigation
  * chrome) makes it quadratic, and AQE skew-splitting cannot shrink that
  * pair *cardinality*, only spread it. The `maxDf` document-frequency cap
  * is the guard: elements appearing in more than `maxDf` ids are dropped
  * (stop-shingles, the IR stop-word idea), which bounds the per-element
  * fan-out at maxDf²/2 and the total pair count at `maxDf/2 × |postings|`
  * — linear in postings again. Intersections then count only cold
  * elements while set sizes stay full-set, so a pair whose overlap is
  * pure boilerplate scores low — exactly the dedup behavior a 100 TB web
  * corpus wants. The grouped spelling pays ONE element-keyed shuffle for
  * all of it — posting lists, the df gate (a free size() filter), and the
  * in-row pair fan-out; the previous self-join spelling re-derived the
  * postings (the shingle explode) three times: df leg plus both join
  * sides.
  */
object Jaccard {

  /** Default stop-shingle document-frequency cap for corpus-sized id
    * domains (q74 / nearDupEdges). A shingle in more than this many
    * documents is boilerplate, not content; 256 bounds the per-element
    * pair fan-out at 256²/2 ≈ 33 k and the total candidate count at
    * 128 × |postings|. Mirrored as a literal in the DuckDB oracles —
    * change both together.
    */
  val StopShingleDf = 256L

  /** Pairs `(ida, idb, inter, jac)` with `jac >= minJ`.
    *
    * @param postings distinct `(id, e)` rows — one per set element; ids
    *                 must be mutually comparable with `<`
    * @param sizes `(id, sz)` rows — the per-id distinct element count
    * @param minJ similarity floor (0.0 keeps every intersecting pair)
    * @param broadcastSizes broadcast the sizes lookup (right when the id
    *                       domain is small, e.g. languages; leave false
    *                       when ids are documents and sizes is scan-sized)
    * @param maxDf drop postings whose element occurs in more than this
    *              many ids before the self-join (stop-shingles). The
    *              default keeps every posting — right only when df is
    *              structurally bounded (q89: df ≤ #languages); pass an
    *              explicit cap whenever ids are corpus-sized.
    */
  def pairs(postings: DataFrame, sizes: DataFrame,
            minJ: Double, broadcastSizes: Boolean = false,
            maxDf: Long = Long.MaxValue): DataFrame = {
    // Grouped spelling: ONE element-keyed shuffle builds the per-element
    // posting list, the df cap is a size() filter on it instead of a
    // second aggregation plus an anti-join over RECOMPUTED postings (the
    // old self-join spelling re-derived the shingle explode three times —
    // df leg + both join sides), and pairs fan out in-row from the sorted
    // list, bounded by maxDf²/2 structs per element. When capped, the
    // list itself is built with the size-BOUNDED collect so a hot element
    // holds O(maxDf) aggregation state, never its full posting list
    // (overflow surfaces as size = maxDf + 1 and is filtered). Sorting
    // inside the row makes ida < idb by construction under the same
    // ordering `<` uses.
    val grouped =
      if (maxDf == Long.MaxValue)
        postings.groupBy(col("e"))
          .agg(collect_list(col("id")).as("ids"))
          .filter(size(col("ids")) >= 2)
      else {
        require(maxDf <= Int.MaxValue - 1, s"maxDf $maxDf exceeds Int range")
        postings.groupBy(col("e"))
          .agg(graft.functions.BottomK.boundedCollect(maxDf.toInt)(col("id"))
            .as("ids"))
          .filter(size(col("ids")).between(2, maxDf))
      }
    val inter = grouped
      .select(array_sort(col("ids")).as("s"))
      .select(explode(expr(
        """flatten(transform(sequence(0, size(s) - 2),
          |  i -> transform(sequence(i + 1, size(s) - 1),
          |    j -> struct(s[i] AS ida, s[j] AS idb))))""".stripMargin)).as("p"))
      .select(col("p.ida"), col("p.idb"))
      .groupBy(col("ida"), col("idb"))
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
