package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics — SURVEY.md §2 F9 extension. The corpus
  * family already walks the token co-occurrence graph structurally
  * (q112 triangles, q85/q113 components, q125 BFS); this module adds the
  * canonical ITERATIVE workload, PageRank, whose superstep loop is the
  * shape every large-scale graph computation (label propagation, HITS,
  * embedding propagation) takes on Spark.
  *
  * Exactness: ranks are fixed-point BIGINTs (scale 1e6) and every
  * superstep is integer arithmetic only — `rank div outdeg` (truncating
  * division on positives ≡ DuckDB `//`), an associative BIGINT sum, and a
  * final `(85 * Σ) div 100` damping step. No floating point anywhere, so
  * partial aggregation across any partitioning cannot change a bit and the
  * unrolled-CTE DuckDB oracle hash-matches exactly.
  */
object Graphs extends QueryModule {

  private val Iters = 3
  private val RankScale = 1000000L // fixed-point 1.0

  /** q138: PageRank over the undirected token co-occurrence graph
    * ([[CorpusOps.tokenEdges]], both directions), damping 0.85, 3
    * supersteps from a uniform start, top-20 tokens by final rank.
    *
    * Scale shapes (the Pregel loop on DataFrames):
    *   - the edge list is hash-partitioned ONCE on `src` and
    *     localCheckpointed; every superstep's contribution join then
    *     reuses that layout (exchange reuse — the edge side never
    *     re-shuffles), so one iteration costs exactly two shuffles:
    *     contributions to `src` partitioning, sums to `dst` — independent
    *     of iteration count.
    *   - per-superstep state is one (node, rank) row — O(V) total, never
    *     per-edge state.
    *   - `localCheckpoint` after each superstep truncates lineage, so
    *     plan size stays constant as iterations grow (same device as
    *     q85's fixpoint loop).
    *   - symmetrized edges mean no dangling nodes: every node has
    *     outdeg ≥ 1 and receives ≥ 1 contribution, so the rank relation
    *     keeps the full node set without an outer-join repair.
    */
  private def q138(s: SparkSession, d: String): DataFrame = {
    val e = CorpusOps.tokenEdges(s, d)
    val bi = e.select(col("ta").as("src"), col("tb").as("dst"))
      .union(e.select(col("tb").as("src"), col("ta").as("dst")))
      .repartition(col("src"))
      .localCheckpoint()
    val outdeg = bi.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
      .select(col("src").as("ov"), col("outdeg"))
      .localCheckpoint()
    var r = outdeg.select(col("ov").as("v"), lit(RankScale).as("rank"))
    for (_ <- 1 to Iters) {
      val contrib = r.as("rr").join(outdeg.as("od"), col("rr.v") === col("od.ov"))
        .select(col("od.ov").as("cs"), expr("rank div outdeg").as("c"))
      r = bi.as("bb").join(contrib.as("ct"), col("bb.src") === col("ct.cs"))
        .groupBy(col("dst"))
        .agg((lit(RankScale * 15 / 100) +
          expr("(85 * sum(c)) div 100")).as("rank"))
        .select(col("dst").as("v"), col("rank"))
        .localCheckpoint()
    }
    r.orderBy(desc("rank"), col("v")).limit(20)
      .select(col("v").as("token"), col("rank"))
  }

  private def stepSql(prev: String): String =
    s"""SELECT b.dst AS v,
       |    150000 + (85 * SUM(r.rank // o.outdeg)) // 100 AS rank
       |  FROM bi b JOIN $prev r ON r.v = b.src
       |  JOIN outdeg o ON o.src = b.src
       |  GROUP BY 1""".stripMargin

  private val q138Sql =
    s"""WITH ${CorpusOps.tokenEdgesCteSql},
       |bi AS (
       |  SELECT ta AS src, tb AS dst FROM edges
       |  UNION ALL SELECT tb, ta FROM edges),
       |outdeg AS (SELECT src, COUNT(*) AS outdeg FROM bi GROUP BY 1),
       |r0 AS (SELECT src AS v, CAST(1000000 AS BIGINT) AS rank FROM outdeg),
       |r1 AS (${stepSql("r0")}),
       |r2 AS (${stepSql("r1")}),
       |r3 AS (${stepSql("r2")})
       |SELECT v AS token, CAST(rank AS BIGINT) AS rank
       |FROM r3 ORDER BY rank DESC, v LIMIT 20""".stripMargin

  /** q152: PMI collocation ranking — the top-20 token pairs by pointwise
    * mutual information over the co-occurrence counts ([[CorpusOps.tokenPairs]],
    * doc-frequency from [[CorpusOps.tokenCounts]]), min support 5. The
    * phrase-mining score is kept as the integer-scaled odds ratio
    * `cooc·N·10⁶ div (c_a·c_b)` — exp(PMI) to a constant — because log()
    * is the one step whose libm bits could differ across engines; the
    * ranking is identical and the arithmetic stays hash-exact.
    *
    * Scale: two shuffles (pair counts, token counts) + two joins keyed on
    * single tokens; the N scalar is a 1-row cross join. No vocabulary²
    * blow-up: pairs exist only where documents co-mention.
    */
  private def q152(s: SparkSession, d: String): DataFrame = {
    val nDocs = Tables.documents(s, d).count()
    val cnt = CorpusOps.tokenCounts(s, d)
    CorpusOps.tokenPairs(s, d)
      .filter(col("cooc") >= 5)
      .join(cnt.select(col("tok").as("ta"), col("c").as("ca")), "ta")
      .join(cnt.select(col("tok").as("tb"), col("c").as("cb")), "tb")
      .select(col("ta"), col("tb"), col("cooc"),
        expr(s"(cooc * ${nDocs}L * 1000000L) div (ca * cb)").as("pmi_score"))
      .orderBy(desc("pmi_score"), col("ta"), col("tb"))
      .limit(20)
  }

  private val q152Sql =
    """WITH dt AS (
      |  SELECT unnest(list_distinct(
      |    (list_filter(string_split(text, ' '), t -> length(t) > 0))[1:32])) AS tok
      |  FROM documents),
      |cnt AS (SELECT tok, COUNT(*) AS c FROM dt GROUP BY 1),
      |dts AS (
      |  SELECT doc_id, unnest(list_distinct(
      |    (list_filter(string_split(text, ' '), t -> length(t) > 0))[1:32])) AS tok
      |  FROM documents),
      |pairs AS (
      |  SELECT a.tok AS ta, b.tok AS tb, COUNT(*) AS cooc
      |  FROM dts a JOIN dts b ON a.doc_id = b.doc_id AND a.tok < b.tok
      |  GROUP BY 1, 2)
      |SELECT p.ta, p.tb, p.cooc,
      |  CAST((p.cooc * (SELECT COUNT(*) FROM documents) * 1000000)
      |    // (ca.c * cb.c) AS BIGINT) AS pmi_score
      |FROM pairs p
      |JOIN cnt ca ON ca.tok = p.ta
      |JOIN cnt cb ON cb.tok = p.tb
      |WHERE p.cooc >= 5
      |ORDER BY pmi_score DESC, p.ta, p.tb LIMIT 20""".stripMargin

  /** q162: market-basket association rules — per-order brand baskets
    * (lineitem ⋈ broadcast part), unordered brand pairs counted by the
    * same IN-ROW fan-out q112 uses (≤ |basket|²/2 per order, baskets are
    * small by nature), then support/confidence/lift with min support 10,
    * top 20 by lift. Scores are integer ppm (support·10⁶ div …) so the
    * ranking is hash-exact; both rule directions emit (confidence is
    * asymmetric).
    *
    * Scale: the pair space is brands² ≤ 625 — the shuffle after the
    * map-side fan-out carries pair partials, never order-level rows; item
    * supports are a second tiny aggregate. This is a-priori's first pass,
    * which at 100 TB is exactly the part worth distributing. Headroom:
    * `sab·N·10⁶` stays inside int64 to ~2e6 baskets per pair support;
    * beyond that, lift the ppm arithmetic to DECIMAL(38,0) (the shape is
    * unchanged — only the cast widens).
    */
  private def q162(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    val part = Tables.part(s, d).select(col("p_partkey"), col("p_brand"))
    val baskets = li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("p_brand"))).as("bs"))
      .localCheckpoint() // feeds the pair fan-out, item supports, and N
    val nOrders = baskets.count()
    val pairSupport = baskets
      .select(explode(expr(
        "flatten(transform(bs, (x, i) -> transform(slice(bs, i + 2, size(bs)), y -> struct(x AS a, y AS b))))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(count(lit(1)).as("sab"))
      .filter(col("sab") >= 10)
    val itemSupport = baskets
      .select(explode(col("bs")).as("item"))
      .groupBy(col("item")).agg(count(lit(1)).as("s"))
    val directed = pairSupport
      .select(col("a"), col("b"), col("sab"))
      .union(pairSupport.select(col("b"), col("a"), col("sab")))
    directed
      .join(itemSupport.select(col("item").as("a"), col("s").as("sa")), "a")
      .join(itemSupport.select(col("item").as("b"), col("s").as("sb")), "b")
      .select(col("a").as("antecedent"), col("b").as("consequent"),
        col("sab"),
        expr("sab * 1000000L div sa").as("confidence_ppm"),
        expr(s"sab * ${nOrders}L * 1000000L div (sa * sb)").as("lift_ppm"))
      .orderBy(desc("lift_ppm"), col("antecedent"), col("consequent"))
      .limit(20)
  }

  private val q162Sql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, p_brand AS item
      |  FROM lineitem JOIN part ON l_partkey = p_partkey),
      |n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM items),
      |pairs AS (
      |  SELECT x.item AS a, y.item AS b, COUNT(*) AS sab
      |  FROM items x JOIN items y
      |    ON x.l_orderkey = y.l_orderkey AND x.item < y.item
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 10),
      |sup AS (SELECT item, COUNT(*) AS s FROM items GROUP BY 1),
      |directed AS (
      |  SELECT a, b, sab FROM pairs
      |  UNION ALL SELECT b, a, sab FROM pairs)
      |SELECT d.a AS antecedent, d.b AS consequent, CAST(d.sab AS BIGINT) AS sab,
      |  CAST((d.sab * 1000000) // sa.s AS BIGINT) AS confidence_ppm,
      |  CAST((d.sab * (SELECT n_orders FROM n) * 1000000) // (sa.s * sb.s)
      |    AS BIGINT) AS lift_ppm
      |FROM directed d
      |JOIN sup sa ON sa.item = d.a
      |JOIN sup sb ON sb.item = d.b
      |ORDER BY lift_ppm DESC, antecedent, consequent LIMIT 20""".stripMargin

  // --------------------------------------------------------------- q395

  /** q395: LINK PREDICTION by common neighbors + Jaccard (Liben-Nowell &
    * Kleinberg 2003, "The Link Prediction Problem for Social Networks")
    * over the customer co-purchase graph — the collaborative-filtering
    * primitive: customers are ADJACENT when they share ≥ 2 distinct
    * purchased parts (the bipartite customer–part projection, threshold
    * sparsifying noise edges); for every NON-adjacent pair sharing at
    * least one graph neighbor, common = |Γ(u)∩Γ(v)| (exact BIGINT) and
    * Jaccard = common/(deg_u + deg_v − common) (ONE double division of
    * exact integers), top-20 by (common DESC, pair). The token
    * co-occurrence graph can't host this query — its 31-token vocabulary
    * is near-complete, so no non-adjacent wedge exists; the customer
    * graph is the natural sparse instance.
    *
    * Scale: the bipartite projection is CAPPED — parts with more than
    * [[PartCap]] distinct buyers drop BEFORE pairing ([[copurchasePairCounts]]
    * — the q74 stop-shingle argument applied to parts: a part bought by
    * everyone separates nobody, and its h²/2 fan-out is the one place
    * this plan could go quadratic on a real Zipfian catalog, r11 verdict
    * #1), so per-part fan-out is ≤ C(64,2) = 2016 pair rows by
    * CONSTRUCTION, not by data-model luck. Wedge generation reuses the
    * same capped array pair-expansion keyed by the middle node (one
    * groupBy shuffle — no adjacency self-join); middles above degree 64
    * drop inside the cap (the same idiom) so a hub's fan-out is bounded
    * at 2016 wedges, while FULL endpoint degrees still enter the
    * Jaccard denominator. The 401k-edge graph localCheckpoints once and
    * feeds its three consumers. The existing-edge subtraction is a
    * keyed left-anti; the final top-20 is TakeOrdered, no global sort.
    */
  /** Distinct-buyers-per-part cap for the co-purchase projection —
    * parts hotter than this carry almost no link-prediction signal
    * (everyone shares them) and are dropped before pairing, exactly the
    * stop-shingle rule q74 applies at df > 256. 64 sits ~6σ above the
    * data model's scale-invariant ~30 buyers/part, so the uniform gauge
    * keeps every part while a Zipfian head is bounded. */
  private[graft] val PartCap = 64

  /** Capped, join-free pair counting for the co-purchase projection —
    * `(ca, cb, cnt)` = unordered buyer pairs (ca < cb) with the number
    * of parts they share. Parts keep at most `cap` distinct buyers'
    * pairs — hotter parts are DROPPED before pairing (r11 verdict #1:
    * the old `cp ⋈ cp ON p` self-join fanned out buyers² per part with
    * no bound but the data model's geometry). Pairs come from each
    * surviving part's SORTED buyer array via codegen'd array HOFs — one
    * groupBy(part) shuffle total — PACKED as `ca·2³² + cb` single
    * BIGINTs so the pair aggregation hashes/shuffles one 8-byte key
    * instead of a 16-byte struct (sound while keys < 2³¹ — the data
    * model's custkey tops out at 15M even at sf100; ANSI mode would
    * crash, not wrap, beyond it). Per-part fan-out is ≤ C(cap, 2) =
    * 2016 rows by construction (Round12Spec pins the bound on an
    * adversarial hot-part fixture).
    */
  private[graft] def copurchasePairCounts(cp: DataFrame, cap: Int): DataFrame =
    copurchasePairCounts(cp, cap, 0)

  /** `pairParts > 0` widens the PAIR exchange (r12 verdict #6 — the sf10
    * spill diet): the expanded pk rows repartition to `pairParts`
    * hash(pk) partitions and the count aggregates IN-STAGE on the
    * receive side. This trades map-side combine (which at decade scale
    * combined little — pairs from one part land once — while its
    * aggregation hash map spilled sorted runs repeatedly) for bounded
    * per-reducer state: each final hash map holds pairs/pairParts
    * entries. 0 keeps the default plan (partial+final agg across a
    * 32-way exchange), which map-side-combines fine at bench scale. */
  private[graft] def copurchasePairCounts(cp: DataFrame, cap: Int,
                                          pairParts: Int): DataFrame = {
    // the cap applies BEFORE any buyer list materializes: a bounded-state
    // distinct-count pass finds the surviving parts, and only their rows
    // reach collect_set — so no aggregation buffer ever exceeds `cap`
    // elements. A size filter AFTER collect_set would build the hot
    // part's FULL buyer array in the agg buffer first: exactly the heap
    // blow-up the sf10 gauge hit on hub nodes in the wedge stage. (A
    // KMV-sketch collector bounds state in one pass but pays typed-udaf
    // encoder costs — measured 13% slower than this all-codegen shape.)
    // The two aggregates and the semi join share the (p) partitioning.
    val keep = cp.groupBy(col("p")).agg(countDistinct(col("c")).as("b"))
      .filter(col("b").between(2, cap))
      .select(col("p"))
    val expanded = cp.join(keep, Seq("p"), "left_semi")
      .groupBy(col("p")).agg(sort_array(collect_set(col("c"))).as("cs"))
      .select(explode(expr(
        "flatten(transform(cs, (x, i) -> " +
          "transform(slice(cs, i + 2, size(cs)), " +
          "y -> x * 4294967296L + y)))")).as("pk"))
    val spread =
      if (pairParts > 0) expanded.repartition(pairParts, col("pk"))
      else expanded
    spread
      .groupBy(col("pk")).agg(count(lit(1)).as("cnt"))
      .select(expr("pk div 4294967296L").as("ca"),
        expr("pk % 4294967296L").as("cb"), col("cnt"))
  }

  /** Scale probe for [[q395]]'s pair-exchange width, memoized per dataset
    * dir so warm bench re-quotes pay nothing (the count() itself is a
    * column-free vectorized scan — row counts only). */
  private val liRowsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long]()

  private def q395(s: SparkSession, d: String): DataFrame = {
    // pair-exchange width (r12 verdict #6): keep the default 32-way
    // exchange (with map-side combine) until the pair mass outgrows it,
    // then widen linearly — ~500k lineitems of pair mass per reduce
    // partition keeps every final aggregation map in memory. sf0.1–sf1
    // keep today's plan; sf10 gets a 120-way pair exchange whose counts
    // aggregate in-stage instead of spilling a 32-way hash map.
    val liRows: Long =
      liRowsMemo.computeIfAbsent(d, dd => Tables.lineitem(s, dd).count())
    val defaultParts = s.conf.get("spark.sql.shuffle.partitions").toInt
    val pairParts =
      if ((liRows / 500000L) <= defaultParts) 0 else (liRows / 500000L).toInt
    val cp = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
    // no .distinct(): copurchasePairCounts' collect_set dedupes (c) within
    // each part, so a pre-distinct would only add a 600k-row shuffle.
    // the graph (401k edges at sf0.1) is read THREE times downstream
    // (adjacency both directions + the existing-edge anti join);
    // localCheckpoint materializes the 9M-pair projection ONCE instead
    // of re-executing it per consumer (q138's fixpoint device) — edge
    // rows are two longs, O(edges) executor storage
    val edges = copurchasePairCounts(cp, PartCap, pairParts)
      .filter(col("cnt") >= 2)
      .select(col("ca"), col("cb"))
      .localCheckpoint()
    val adj = edges.select(col("ca").as("src"), col("cb").as("dst"))
      .union(edges.select(col("cb").as("src"), col("ca").as("dst")))
    val deg = adj.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // wedges through each middle node: the SAME sorted-array pair
    // generation as the projection (one groupBy(middle) shuffle, no
    // mid ⋈ mid self-join); the ≤ 64 size cap IS the middle-degree cap —
    // adj has no duplicate neighbors, so collect_set size ≡ deg(n)
    val wedges = copurchasePairCounts(
        adj.select(col("dst").as("c"), col("src").as("p")), 64, pairParts)
      .select(col("ca").as("u"), col("cb").as("v"),
        col("cnt").as("common"))
    wedges
      .join(edges.select(col("ca").as("u"), col("cb").as("v")),
        Seq("u", "v"), "left_anti")
      .join(deg.select(col("src").as("u"), col("deg").as("du")), Seq("u"))
      .join(deg.select(col("src").as("v"), col("deg").as("dv")), Seq("v"))
      .select(col("u"), col("v"), col("common"), col("du"), col("dv"),
        (col("common").cast("double") /
          (col("du") + col("dv") - col("common")).cast("double"))
          .as("jaccard"))
      .orderBy(desc("common"), col("u"), col("v")).limit(20)
  }

  private val q395Sql =
    """WITH cp0 AS (
      |  SELECT DISTINCT o.o_custkey AS c, l.l_partkey AS p
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |keep AS (
      |  SELECT p FROM cp0 GROUP BY p HAVING COUNT(*) BETWEEN 2 AND 64),
      |cp AS (SELECT c, p FROM cp0 WHERE p IN (SELECT p FROM keep)),
      |edges AS (
      |  SELECT ca, cb FROM (
      |    SELECT a.c AS ca, b.c AS cb, COUNT(*) AS shared
      |    FROM cp a JOIN cp b ON a.p = b.p AND a.c < b.c
      |    GROUP BY 1, 2)
      |  WHERE shared >= 2),
      |adj AS (
      |  SELECT ca AS src, cb AS dst FROM edges
      |  UNION ALL SELECT cb AS src, ca AS dst FROM edges),
      |deg AS (
      |  SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
      |mid AS (
      |  SELECT a.src AS n, a.dst AS u FROM adj a
      |  JOIN deg ON deg.src = a.src WHERE deg.deg <= 64),
      |wedges AS (
      |  SELECT m1.u AS u, m2.u AS v, CAST(COUNT(*) AS BIGINT) AS common
      |  FROM mid m1 JOIN mid m2 ON m1.n = m2.n AND m1.u < m2.u
      |  GROUP BY 1, 2),
      |nonadj AS (
      |  SELECT w.* FROM wedges w
      |  LEFT JOIN edges e ON e.ca = w.u AND e.cb = w.v
      |  WHERE e.ca IS NULL)
      |SELECT n2.u, n2.v, n2.common, d1.deg AS du, d2.deg AS dv,
      |  CAST(n2.common AS DOUBLE) /
      |    CAST(d1.deg + d2.deg - n2.common AS DOUBLE) AS jaccard
      |FROM nonadj n2
      |JOIN deg d1 ON d1.src = n2.u JOIN deg d2 ON d2.src = n2.v
      |ORDER BY common DESC, u, v LIMIT 20""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q138_pagerank" -> q138,
    "q152_pmi_collocations" -> q152,
    "q162_market_basket" -> q162,
    "q395_link_prediction" -> q395
  )

  override def oracles: Map[String, String] = Map(
    "q138_pagerank" -> q138Sql,
    "q152_pmi_collocations" -> q152Sql,
    "q162_market_basket" -> q162Sql,
    "q395_link_prediction" -> q395Sql
  )
}
