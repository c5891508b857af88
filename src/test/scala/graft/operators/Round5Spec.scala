package graft.operators

import graft.{SparkSpec, SparkEntry, Tables}
import org.apache.spark.sql.functions._

/** Invariant pins for the round-5 operators beyond the DuckDB hash compare:
  * the oracle proves value equality at one SF; these pin the semantic
  * properties that must survive any data (ffill carry, cohort triangle
  * shape, BFS level structure, lateral/window equivalence, threshold
  * filter).
  */
class Round5Spec extends SparkSpec {

  test("q123 gap-fill: dense spine, gaps carry the last seen revenue") {
    val out = SparkEntry.queries("q123_gapfill_ffill")(spark, sf0001).cache()
    try {
      // dense: every priority covers the identical full spine
      val perPrio = out.groupBy("prio").agg(
        count(lit(1)).as("n"), countDistinct(col("day")).as("nd"))
        .collect()
      val spineLen = out.select(countDistinct(col("day"))).head.getLong(0)
      assert(perPrio.nonEmpty)
      perPrio.foreach { r =>
        assert(r.getLong(1) == spineLen && r.getLong(2) == spineLen,
          s"priority ${r.get(0)} spine not dense: $r")
      }
      // ffill: a gap day equals the previous day's value; a leading gap is 0
      val rows = out.orderBy("prio", "day")
        .select(col("prio"), col("rev"), col("is_gap")).collect()
      var prevPrio: String = null
      var prevRev = 0.0
      rows.foreach { r =>
        val (prio, rev, gap) = (r.getString(0), r.getDouble(1), r.getLong(2))
        if (prio != prevPrio) { prevPrio = prio; prevRev = 0.0 }
        if (gap == 1L) assert(rev == prevRev,
          s"$prio gap day broke the carry: $rev != $prevRev")
        prevRev = rev
      }
      assert(rows.exists(_.getLong(2) == 1L), "test data has no gap days")
    } finally out.unpersist()
  }

  test("q124 cohorts: offset 0 counts the whole cohort, actives never exceed it") {
    val out = SparkEntry.queries("q124_retention_cohorts")(spark, sf0001).cache()
    try {
      val zero = out.filter(col("offset_weeks") === 0)
        .select(col("cohort_week"), col("n_active")).collect()
        .map(r => r.get(0).toString -> r.getLong(1)).toMap
      val cohorts = out.select(col("cohort_week")).distinct().count()
      assert(zero.size == cohorts.toInt,
        "every cohort must appear at offset 0 (its members are active then)")
      out.collect().foreach { r =>
        assert(r.getLong(2) <= zero(r.get(0).toString),
          s"cohort ${r.get(0)} offset ${r.getLong(1)} exceeds cohort size")
      }
    } finally out.unpersist()
  }

  test("q125 BFS levels: single seed at depth 0, monotone level structure") {
    val out = SparkEntry.queries("q125_reachability_cte")(spark, sf001)
      .collect()
    assert(out.nonEmpty)
    val byDepth = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byDepth(0L) == 1L, s"depth 0 must be exactly the seed: $byDepth")
    // depths are contiguous from 0 (BFS frontier can't skip a level)
    val ds = out.map(_.getLong(0)).sorted
    assert(ds.head == 0L && ds.zipWithIndex.forall { case (d, i) => d == i },
      s"non-contiguous BFS depths: ${ds.mkString(",")}")
  }

  test("q126 lateral top-k equals the q30-style window spelling") {
    val lateral = SparkEntry.queries("q126_lateral_topk")(spark, sf001)
    val c = Tables.customer(spark, sf001).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(spark, sf001)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val windowed = o.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 2)
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey").as("custkey"), col("c_name").as("name"),
        col("o_orderkey").as("orderkey"), col("o_totalprice").as("price"))
    assert(lateral.count() == windowed.count())
    assert(lateral.exceptAll(windowed).isEmpty && windowed.exceptAll(lateral).isEmpty,
      "lateral and window spellings must return identical rows")
  }

  test("q127 threshold: every reported min_dist is within the bound") {
    val out = SparkEntry.queries("q127_edit_distance")(spark, sf001).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (pairs, nd) = (r.getLong(1), r.getLong(2))
      assert(nd <= pairs, s"near-dups exceed candidate pairs: $r")
      if (!r.isNullAt(3)) {
        val m = r.getLong(3)
        assert(m >= 0 && m <= 32, s"min_dist $m outside the threshold")
        assert(nd > 0, "a min_dist implies at least one near-dup pair")
      } else assert(nd == 0L, "no min_dist implies zero near-dup pairs")
    }
  }

  test("q129 ordered-set aggregates: disc is a data value, cont brackets it") {
    val out = SparkEntry.queries("q129_ordered_set_agg")(spark, sf001).cache()
    try {
      val prices = Tables.orders(spark, sf001)
        .groupBy(col("o_orderpriority").as("prio"))
        .agg(min("o_totalprice").as("lo"), max("o_totalprice").as("hi"),
          collect_set(col("o_totalprice")).as("vals"))
      out.join(prices, "prio").collect().foreach { r =>
        val (p50, p90, d50) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
        val (lo, hi) = (r.getDouble(5), r.getDouble(6))
        val vals = r.getSeq[Double](7).toSet
        assert(vals.contains(d50), "percentile_disc must be an actual value")
        assert(lo <= p50 && p50 <= p90 && p90 <= hi, s"quantile order broken: $r")
      }
    } finally out.unpersist()
  }

  test("q180 clamp fold is order-correct under adversarial input partitioning") {
    // the non-associative trap: +5, -10, +3 folds to 3 (one clamp), while
    // any order-insensitive spelling (sum -2 -> clamp 0) gets 0. Feed the
    // rows REVERSED and split across many partitions; flatMapSortedGroups
    // must still fold in (day, order, line) order.
    import spark.implicits._
    val rows = Seq(
      // (suppkey, day, orderkey, linenumber, qty)
      (1L, 3, 30L, 1, 3L), (1L, 2, 20L, 1, -10L), (1L, 1, 10L, 1, 5L),
      (2L, 1, 11L, 1, -7L) // single negative: clamps to 0 immediately
    ).toDF("l_suppkey", "day", "l_orderkey", "l_linenumber", "q")
      .repartition(4)
    val got = rows.as[(Long, Int, Long, Int, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("day"), col("l_orderkey"), col("l_linenumber")) {
        (sk, it) =>
          var bal = 0L; var clamps = 0L
          it.foreach { case (_, _, _, _, q) =>
            val nb = bal + q
            if (nb < 0L) { clamps += 1L; bal = 0L } else bal = nb
          }
          Iterator.single((sk, bal, clamps))
      }.collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got(1L) == ((3L, 1L)), s"supplier 1 folded ${got(1L)}, want (3,1)")
    assert(got(2L) == ((0L, 1L)), s"supplier 2 folded ${got(2L)}, want (0,1)")
  }
}
