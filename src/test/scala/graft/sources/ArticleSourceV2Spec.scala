package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the V2 connector's three contracts: row identity with the
  * composed [[ArticleSource]] spelling, filter pushdown all the way into
  * the reader (no Filter node survives above the scan), and column
  * pruning visible in the scan's read schema.
  */
class ArticleSourceV2Spec extends SparkSpec {

  private def v2 = spark.read
    .format("graft.sources.ArticleSourceV2")
    .option("corpus", "all").load()

  test("v2 read is row-identical to the composed ArticleSource union") {
    val got = v2.collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val want = ArticleSource.unionAll(spark)
      .select(ArticleSource.schema.fieldNames.map(col).toIndexedSeq: _*)
      .collect().map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(got === want)
    assert(want.nonEmpty)
  }

  test("supported filters are fully pushed: no Filter above the BatchScan") {
    val df = v2.filter(col("indexation") === "IEEE")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(indexation), EqualTo(indexation,IEEE)]")
      || plan.contains("PushedFilters: [EqualTo(indexation,IEEE), IsNotNull(indexation)]"),
      s"filters not pushed into the scan:\n$plan")
    assert(!plan.contains("Filter "), s"residual Filter survived above the scan:\n$plan")
    // and the reader applied them: results match the un-pushed spelling
    val want = ArticleSource.unionAll(spark)
      .select(ArticleSource.schema.fieldNames.map(col).toIndexedSeq: _*)
      .filter(col("indexation") === "IEEE").collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet === want)
    assert(want.nonEmpty, "no IEEE articles in the fixture — pushdown test is vacuous")
  }

  test("unsupported filters stay as a residual Filter node") {
    val df = v2.filter(length(col("doi")) > 10)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Filter "), "residual filter was dropped — wrong pushFilters contract")
  }

  test("column pruning reaches the reader's schema") {
    val df = v2.select(col("doi"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doi:string>"),
      s"scan not pruned to doi:\n$plan")
  }

  test("corpus option selects a single corpus (one partition per corpus)") {
    val one = spark.read.format("graft.sources.ArticleSourceV2")
      .option("corpus", "ai_articles").load()
    assert(one.rdd.getNumPartitions === 1)
    assert(one.count() === ArticleSource.json(spark, "ai_articles").count())
    assert(v2.rdd.getNumPartitions === 4)
  }
}
