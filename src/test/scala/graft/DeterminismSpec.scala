package graft

/** The exact-arithmetic claim, tested head-on: results must be BIT-IDENTICAL
  * under different shuffle partition counts (= different partial-aggregation
  * groupings, = what changes between local[32] and a 1000-executor cluster).
  * Doubles summed naively would fail this; the Exact decimal lifts and
  * integer quantization must not.
  */
class DeterminismSpec extends SparkSpec {

  private val sensitive = Seq(
    "q01_pricing_summary", // decimal money sums
    "q27_stats_exact",     // integer variance identity
    "q46_salted_agg",      // two-stage salted sums
    "q84_vector_stats",    // integer vector sums
    "q33_window_moving_avg", // decimal window frames
    "q85_dedup_components", // iterative fixpoint + hashed shingle identity
    "q100_multimodal_features" // mapPartitions feature vectors + element sums
  )

  test("results are bit-identical across shuffle partition counts") {
    val before = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      val runs = Seq("3", "17").map { n =>
        spark.conf.set("spark.sql.shuffle.partitions", n)
        sensitive.map { q =>
          q -> SparkEntry.queries(q)(spark, sf0001).collect().toSeq
        }.toMap
      }
      for (q <- sensitive) {
        assert(runs(0)(q) == runs(1)(q),
          s"$q differs between 3 and 17 shuffle partitions")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", before)
  }
}
