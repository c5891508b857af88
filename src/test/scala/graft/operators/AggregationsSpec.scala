package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Pins the aggregation queries that have no DuckDB oracle, plus spot
  * invariants on the oracle-checked ones (the oracle run is the full gate;
  * these are fast local regressions at sf0.001).
  */
class AggregationsSpec extends SparkSpec {

  test("q114 histogram quantile lands within one bucket width of the exact quantile") {
    // the sketch's error contract: the estimate is the lower edge of the
    // bucket holding the rank-ceil(q*n) value, so exact ∈ [est, est+width)
    val width = 100.0
    val est = SparkEntry.queries("q114_histogram_quantiles")(spark, sf0001)
      .collect().map(r => r.getString(0) ->
        Seq(r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val byFlag = Tables.lineitem(spark, sf0001)
      .select(col("l_returnflag"), col("l_extendedprice"))
      .collect().groupBy(_.getString(0))
      .map { case (f, rs) => f -> rs.map(_.getDouble(1)).sorted }
    assert(est.keySet == byFlag.keySet)
    for ((flag, values) <- byFlag; (q, i) <- Seq(0.5, 0.9, 0.99).zipWithIndex) {
      val exact = values(math.ceil(q * values.length).toInt - 1)
      val e = est(flag)(i)
      assert(e <= exact && exact < e + width,
        s"$flag p$q: est=$e exact=$exact not within one bucket")
    }
  }

  test("q24 HLL estimate stays within rsd bounds of the exact distinct count") {
    // the quantified pin for the one oracle-less query: at rsd=0.05, allow
    // 5 sigma => 25% relative error, far tighter than chance — checked at
    // BOTH spec scale factors so the bound is exercised at the oracle SF too
    for (sf <- Seq(sf0001, sf001)) {
      val approx = SparkEntry.queries("q24_approx_distinct")(spark, sf)
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      val exact = Tables.lineitem(spark, sf)
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("p"), countDistinct(col("l_orderkey")).as("o"))
        .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
      assert(approx.keySet == exact.keySet)
      for ((k, (ep, eo)) <- exact) {
        val (ap, ao) = approx(k)
        assert(math.abs(ap - ep).toDouble / ep < 0.25, s"$sf $k parts: approx=$ap exact=$ep")
        assert(math.abs(ao - eo).toDouble / eo < 0.25, s"$sf $k orders: approx=$ao exact=$eo")
      }
    }
  }

  test("q24 HLL estimate is deterministic (same data, same sketch, same value)") {
    // HLL++ has no randomness: the driver's rows-only check would hide a
    // regression to a seeded sketch, so pin run-to-run equality explicitly
    val a = SparkEntry.queries("q24_approx_distinct")(spark, sf0001).collect().toSeq
    val b = SparkEntry.queries("q24_approx_distinct")(spark, sf0001).collect().toSeq
    assert(a == b)
  }

  test("q23 distinct output carries no duplicate rows") {
    val df = SparkEntry.queries("q23_distinct")(spark, sf0001)
    assert(df.count() == df.distinct().count())
  }

  test("q21 rollup grand total equals the customer row count") {
    val rows = SparkEntry.queries("q21_rollup")(spark, sf0001).collect()
    val grand = rows.find(r => r.getString(0) == "(all)" && r.getString(1) == "(all)").get
    assert(grand.getLong(2) == Tables.customer(spark, sf0001).count())
  }
}
