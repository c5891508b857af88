package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Golden-file ingestion tests (SURVEY.md §5.2 item 1): record counts,
  * schema widths, and CSV↔JSON parity modulo the ''→NULL rule.
  */
class ArticleSourceSpec extends SparkSpec {

  private val corpora = Seq(
    ("ai_articles", 50L, 11),
    ("blockchain_articles", 50L, 11),
    ("acm_machine_learning_articles", 20L, 9),
    ("acm_blockchain_articles", 20L, 9)
  )

  test("JSON corpora have golden record counts and schema widths") {
    for ((name, n, width) <- corpora) {
      val df = ArticleSource.json(spark, name)
      assert(df.count() == n, s"$name count")
      assert(df.columns.length == width, s"$name width: ${df.columns.toSeq}")
    }
  }

  test("CSV corpora match JSON corpora modulo the ''-to-NULL rule") {
    for ((name, n, _) <- corpora) {
      val j = ArticleSource.json(spark, name)
      val c = ArticleSource.csv(spark, name)
      assert(c.count() == n, s"$name csv count")
      assert(c.columns.sorted.toSeq == j.columns.sorted.toSeq, s"$name columns")
      // after normalization both sides carry NULL for missing — non-null
      // profiles must agree column by column
      val cols = j.columns.sorted.toSeq
      val jProfile = j.select(cols.map(x => count(col(x)).as(x)): _*).collect()(0)
      val cProfile = c.select(cols.map(x => count(col(x)).as(x)): _*).collect()(0)
      assert(jProfile == cProfile, s"$name fill profile json=$jProfile csv=$cProfile")
    }
  }

  test("normalize maps empty strings to NULL and is idempotent") {
    import spark.implicits._
    val df = Seq(("", "x"), ("y", "")).toDF("a", "b")
    val once = ArticleSource.normalize(df)
    assert(once.filter(col("a").isNull).count() == 1)
    assert(once.filter(col("b").isNull).count() == 1)
    val twice = ArticleSource.normalize(once)
    assert(twice.collect().toSeq == once.collect().toSeq)
  }

  test("unioned corpus aligns 11-col and 9-col schemas with NULL fill") {
    val u = ArticleSource.unionAll(spark)
    assert(u.count() == 140)
    assert(u.columns.length == 11)
    // ACM rows (9-col) must carry NULL in the IEEE-only columns
    assert(u.filter(col("indexation") === "ACM" && col("pays").isNotNull).count() == 0)
  }
}
