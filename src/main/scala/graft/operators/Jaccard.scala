package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Shared exact-Jaccard pair derivation (the common core of TextOps.q74,
  * CorpusOps.q85/q113/q186 and CorpusOps.q89): an inverted-index self-join
  * on set elements over ONE shared postings exchange — pairs `ida < idb`,
  * intersections counted per pair, then Jaccard from the per-id set
  * sizes.
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
  * corpus wants. The postings relation (the corpus scan + shingle
  * explode) is derived once: the df aggregate, the stop-shingle
  * semi-filter and both self-join sides all cluster on the element key
  * and ride one repartition exchange.
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
    // Shared-exchange spelling: the stop-shingle SEMI-filter and BOTH
    // self-join sides cluster on the element key over the SAME postings
    // subtree, so EnsureRequirements plans one canonical fat exchange
    // and ReusedExchange dedups the rest — the postings shuffle is
    // written once and re-read per side. The df leg deliberately stays a
    // separate aggregation: its partial combine runs map-side below its
    // own exchange, so what it ships is one count per distinct element
    // per task — a sliver — and its output lands already e-partitioned,
    // so the semi join adds NO further exchange. The cold-element list is
    // |distinct elements|-sized (almost everything is cold), which is why
    // it meets the postings as a distributed SEMI rather than the inverse
    // hot-list broadcast-ANTI: no driver round-trip sits on the path.
    // Every operator stays whole-stage codegen with bounded state: the
    // df agg carries one count per element and the SMJ self-join
    // materializes no lists. (A rejected spelling, measured: grouping
    // into per-element posting lists makes a hot element's list the
    // aggregation state and pushes the whole agg onto the object-hash
    // path, which falls back to sort-based at high element cardinality —
    // slower at sf0.1 and riskier at scale.)
    val base =
      if (maxDf == Long.MaxValue) postings
      else {
        val colds = postings.groupBy(col("e")).agg(count(lit(1)).as("df"))
          .filter(col("df") <= maxDf).select(col("e"))
        postings.join(colds, Seq("e"), "left_semi")
      }
    val inter = base.as("a").join(base.as("b"),
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
