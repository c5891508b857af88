package graft

import org.apache.spark.sql.SparkSession

/** Scale-growth measurement (r7 verdict #6): time the 22 TPC-H shapes plus
  * the shuffle-bound dedup/ANN family at TWO scale factors in one session
  * and report the growth ratio — converting the "this plan survives 10×"
  * design arguments into measurements. A shuffle-bound plan should grow
  * ≈ linearly (ratio ≈ data ratio, here 10×); a quadratic candidate stage
  * or an unbounded window would show up as ratio ≫ 10.
  *
  * Protocol per (query, dir): warm once untimed, then min of 2 timed runs,
  * `CacheHygiene.release` after every execution (the Bench discipline).
  * Usage: runMain graft.ScaleCheck <dirA> <dirB>   (A = small, B = big)
  */
object ScaleCheck {

  /** The 22 TPC-H shapes (Q1..Q22 in query order) + the dedup/ANN set. */
  private val set = Seq(
    "q01_pricing_summary", "q198_min_cost_supplier", "q207_shipping_priority",
    "q208_priority_check", "q07_revenue_by_nation", "q06_filter_sum",
    "q209_bilateral_volume", "q188_market_share", "q210_profit_by_nation",
    "q211_returned_items", "q190_important_parts", "q212_late_shipments",
    "q191_custdist", "q213_promo_share", "q205_top_supplier",
    "q206_supplier_census", "q192_avg_yearly", "q196_big_orders",
    "q204_disjunctive_join", "q193_concentrated_suppliers",
    "q189_sole_supplier", "q197_dormant_customers",
    // shuffle-bound corpus family
    "q74_ngram_jaccard", "q85_dedup_components", "q151_decontamination",
    "q152_pmi_collocations", "q221_ivf_pq", "q224_bm25_retrieval",
    "q225_hybrid_rrf", "q229_bpe_train", "q230_contamination_matrix",
    "q232_winnowing_fingerprints")

  def main(args: Array[String]): Unit = {
    val (dirA, dirB) = (args(0), args(1))
    var spark = GraftSession.get(GraftSession.cpus("32"))
    val qs = SparkEntry.queries

    // revive a dead context so one casualty doesn't void every later row
    // (the Bench discipline — see Bench.liveSession)
    def liveSession() = {
      if (spark.sparkContext.isStopped)
        spark = GraftSession.get(GraftSession.cpus("32"))
      spark
    }
    def timed(name: String, dir: String): Double = {
      def exec(): Unit =
        qs(name)(liveSession(), dir).write.format("noop").mode("overwrite").save()
      try exec() catch { case t: Throwable =>
        CacheHygiene.release(spark); throw t }
      CacheHygiene.release(spark)
      val runs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        exec()
        val dt = (System.nanoTime() - t0) / 1e9
        CacheHygiene.release(spark)
        dt
      }
      runs.min
    }

    val rows = set.filter(qs.contains).map { name =>
      val (a, b) =
        try (timed(name, dirA), timed(name, dirB))
        catch { case t: Throwable =>
          System.err.println(s"[scalecheck] $name failed: ${t.getMessage}")
          (-1.0, -1.0)
        }
      val ratio = if (a > 0 && b > 0) b / a else -1.0
      println(f"[scalecheck] $name%-28s A=$a%7.2fs B=$b%7.2fs ratio=$ratio%6.2f")
      (name, a, b, ratio)
    }
    val js = rows.map { case (n, a, b, r) =>
      f""""$n":{"a":$a%.3f,"b":$b%.3f,"ratio":$r%.2f}""" }
      .mkString("{", ",", "}")
    println(s"""{"metric":"scalecheck","dirA":"$dirA","dirB":"$dirB","queries":$js}""")
    spark.stop()
  }
}
