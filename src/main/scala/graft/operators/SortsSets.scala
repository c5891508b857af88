package graft.operators

import graft.{QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sorts / limits / top-k (SURVEY.md §2.6) and set operations (§2.7).
  *
  * The reference's only ordering/limit machinery is the page-count bound and
  * early termination (`/root/reference/main.py:40,64,129-140`); its corpora
  * stay un-unioned as four files in `data/`. Scale shapes here:
  *   - global top-k compiles to TakeOrderedAndProjectExec: per-partition
  *     heaps of k rows, then a k-way driver merge — no full sort, no full
  *     shuffle, viable for any input size with small k.
  *   - set ops are hash aggregations / joins on the full row — same
  *     partial-agg economics as groupBy.
  */
object SortsSets extends QueryModule {

  /** q40: global top-k — the TakeOrderedAndProject shape (no full sort). */
  private def q40(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))

  private val q40Sql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""".stripMargin

  /** q41: multi-key sort with an injected NULL key and explicit null
    * placement (SURVEY.md §7.3: Spark defaults NULLS FIRST on ASC, DuckDB
    * NULLS LAST — both sides are forced explicit).
    */
  private def q41(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        nullif(col("o_orderpriority"), lit("3-MEDIUM")).as("prio"),
        col("o_orderkey"), col("o_totalprice")
      )
      .orderBy(col("prio").asc_nulls_first, col("o_totalprice").desc, col("o_orderkey"))
      .limit(200)

  private val q41Sql =
    """SELECT NULLIF(o_orderpriority, '3-MEDIUM') AS prio, o_orderkey, o_totalprice
      |FROM orders
      |ORDER BY prio ASC NULLS FIRST, o_totalprice DESC, o_orderkey LIMIT 200""".stripMargin

  /** q42: unionByName with missing columns — the IEEE(11-col) ∪ ACM(9-col)
    * shape from SURVEY.md §2.7: schemas align by NAME, absent columns fill
    * with NULL.
    */
  private def q42(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_name").as("name"),
      col("c_acctbal").as("acctbal"),
      col("c_mktsegment").as("segment"),
      lit("customer").as("side")
    )
    val supp = Tables.supplier(s, d).select(
      col("s_name").as("name"),
      col("s_acctbal").as("acctbal"),
      lit("supplier").as("side")
    )
    cust.unionByName(supp, allowMissingColumns = true)
      .orderBy(col("side"), col("name"))
  }

  private val q42Sql =
    """SELECT c_name AS name, c_acctbal AS acctbal, c_mktsegment AS segment,
      |       'customer' AS side FROM customer
      |UNION ALL BY NAME
      |SELECT s_name AS name, s_acctbal AS acctbal, 'supplier' AS side FROM supplier
      |ORDER BY side, name""".stripMargin

  /** q43: INTERSECT (distinct) — nations present on both sides. */
  private def q43(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersect(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .orderBy(col("nationkey"))

  private val q43Sql =
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier
      |ORDER BY nationkey""".stripMargin

  /** q44: EXCEPT ALL — bag difference keeps multiplicity; folded to a
    * histogram so the output is O(distinct keys) at any scale.
    */
  private def q44(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .exceptAll(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("surplus"))
      .orderBy(col("nationkey"))

  private val q44Sql =
    """SELECT nationkey, COUNT(*) AS surplus FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT ALL
      |  SELECT s_nationkey AS nationkey FROM supplier
      |) GROUP BY nationkey ORDER BY nationkey""".stripMargin

  /** q109: INTERSECT ALL — bag intersection keeps min multiplicity (the
    * multiset twin of q43/q44, completing SURVEY.md §2.7), folded to a
    * histogram so the output is O(distinct keys) at any scale. Like
    * exceptAll this plans as one hash aggregation per side plus a join on
    * the full row — no all-pairs stage.
    */
  private def q109(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
      .intersectAll(Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")))
      .groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n_common"))
      .orderBy(col("nationkey"))

  private val q109Sql =
    """SELECT nationkey, COUNT(*) AS n_common FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  INTERSECT ALL
      |  SELECT s_nationkey AS nationkey FROM supplier
      |) GROUP BY nationkey ORDER BY nationkey""".stripMargin

  /** q45: sorted pagination — offset + limit over a total order. */
  private def q45(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
      .offset(100)
      .limit(50)

  private val q45Sql =
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_orderkey LIMIT 50 OFFSET 100""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q40_topk_global" -> q40,
    "q41_sort_nulls" -> q41,
    "q42_union_by_name" -> q42,
    "q43_intersect" -> q43,
    "q44_except_all" -> q44,
    "q109_intersect_all" -> q109,
    "q45_limit_offset" -> q45
  )

  override def oracles: Map[String, String] = Map(
    "q40_topk_global" -> q40Sql,
    "q41_sort_nulls" -> q41Sql,
    "q42_union_by_name" -> q42Sql,
    "q43_intersect" -> q43Sql,
    "q44_except_all" -> q44Sql,
    "q109_intersect_all" -> q109Sql,
    "q45_limit_offset" -> q45Sql
  )
}
