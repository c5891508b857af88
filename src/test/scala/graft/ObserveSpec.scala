package graft

import org.apache.spark.sql.functions._

/** `Dataset.observe` — inline data-quality counters collected DURING the
  * query (a CollectMetrics node on the plan), not by a second scan. The
  * operational pattern for pipeline health: row counts, null rates and
  * domain violations ride along with the real computation for free.
  */
class ObserveSpec extends SparkSpec {

  test("observe() collects row/null/domain metrics in one pass") {
    val df = Tables.lineitem(spark, sf0001)
      .observe("dq",
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").isNull.cast("long")).as("null_qty"),
        sum((col("l_discount") < 0 || col("l_discount") > 1).cast("long"))
          .as("bad_discounts"))
      .groupBy(col("l_returnflag")).agg(count(lit(1)).as("n"))
    val out = df.collect()
    val m = df.queryExecution.observedMetrics("dq")
    assert(m.getAs[Long]("n_rows") == out.map(_.getLong(1)).sum,
      "observed row count disagrees with the aggregate itself")
    assert(m.getAs[Long]("null_qty") == 0L)
    assert(m.getAs[Long]("bad_discounts") == 0L)
  }

  test("q265's bracketed pass: two CollectMetrics nodes, ONE scan") {
    val pass = Tables.documents(spark, sf0001)
      .observe("obs_in", count(lit(1)).as("n_rows"))
      .filter(length(col("text")) >= 200)
      .observe("obs_out", count(lit(1)).as("n_rows"))
    val plan = pass.queryExecution.executedPlan
    val metrics = plan.collect {
      case c: org.apache.spark.sql.execution.CollectMetricsExec => c
    }
    assert(metrics.length == 2, s"expected 2 CollectMetrics:\n$plan")
    val scans = plan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.length == 1,
      s"the audit must not add a scan, found ${scans.length}:\n$plan")
  }

  test("observe() metrics survive into streaming progress") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = input.toDS().toDF("v")
      .observe("sdq", count(lit(1)).as("n"), sum(col("v")).as("s"))
      .writeStream.format("memory").queryName("obs_sink")
      .outputMode("append").start()
    try {
      input.addData(1L, 2L, 3L)
      q.processAllAvailable()
      val prog = q.recentProgress.flatMap(p =>
        Option(p.observedMetrics.get("sdq")))
      assert(prog.nonEmpty, "no observed metrics in streaming progress")
      assert(prog.map(_.getAs[Long]("n")).sum == 3L)
      assert(prog.map(_.getAs[Long]("s")).sum == 6L)
    } finally q.stop()
  }
}
