package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Contracts of the q365 lineage walk on the plan shapes that break naive
  * implementations: alias chains, union position-matching, reference-free
  * outputs, and join passthrough under aliases.
  */
class ColumnLineageSpec extends SparkSpec {

  private def docs = graft.Tables.documents(spark, sf0001)
  private def orders = graft.Tables.orders(spark, sf0001)

  test("alias-of-alias chains resolve to the leaf column") {
    val df = docs.select(col("n_chars").as("a"))
      .select((col("a") * 2).as("b"))
      .select(col("b").as("c"))
    assert(ColumnLineage.lineage(df) ==
      Seq(("c", "documents", "n_chars")))
  }

  test("union merges lineage by output position, not by name") {
    val left = docs.select(col("doc_id").as("k"))
    val right = orders.select(col("o_orderkey").as("k"))
    val got = ColumnLineage.lineage(left.union(right))
    assert(got.toSet == Set(
      ("k", "documents", "doc_id"), ("k", "orders", "o_orderkey")), got)
  }

  test("reference-free outputs (count(*), literals) yield no lineage row") {
    val df = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n"))
      .withColumn("tag", lit("x"))
    assert(ColumnLineage.lineage(df) == Seq(("lang", "documents", "lang")))
  }

  test("join + alias passthrough keeps each side's attribution") {
    val d = docs.as("d")
    val o = orders.as("o")
    val df = d.join(o, col("d.doc_id") === col("o.o_orderkey"))
      .select(col("d.lang"), col("o.o_orderstatus"),
        (col("d.n_chars") + col("o.o_totalprice")).as("mix"))
    assert(ColumnLineage.lineage(df).toSet == Set(
      ("lang", "documents", "lang"),
      ("o_orderstatus", "orders", "o_orderstatus"),
      ("mix", "documents", "n_chars"),
      ("mix", "orders", "o_totalprice")))
  }

  test("the audit is metadata-only: no Spark job runs during the walk") {
    val sc = spark.sparkContext
    // plan construction (schema inference) may schedule work; the WALK
    // itself must not — measure around lineage() only
    val df = docs.groupBy(col("source")).agg(sum(col("n_chars")).as("s"))
    df.queryExecution.analyzed // force analysis outside the window
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    ColumnLineage.lineage(df)
    val after = sc.statusTracker.getJobIdsForGroup(null).length
    assert(after == before, "lineage must not launch jobs")
  }
}
