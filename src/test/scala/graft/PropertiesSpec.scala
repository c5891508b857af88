package graft

import graft.sources.ArticleSource
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants (SURVEY.md §5.2 item 3) for the reference's
  * data semantics: the ''-sentinel rule, the or-chain coalesce, and the
  * author-list pack/unpack round trip. Raw ScalaCheck generators are
  * sampled under fixed seeds (the scalatest bridge artifact is not in the
  * offline cache), and each property batches its cases through ONE Spark
  * job so the suite stays fast.
  */
class PropertiesSpec extends SparkSpec {

  private val cell: Gen[String] =
    Gen.oneOf(Gen.const(""), Gen.alphaNumStr.map(_.take(8)))

  private def samples[T](g: Gen[T], n: Int): Seq[T] =
    (0 until n).map(i => g.pureApply(Gen.Parameters.default, Seed(i.toLong)))

  test("coalesce-nullif chain equals Python or-chain semantics on '' cells") {
    import spark.implicits._
    val cases = samples(Gen.zip(cell, cell, cell), 200)
    val got = cases.toDF("a", "b", "c")
      .select(coalesce(nullif($"a", lit("")), nullif($"b", lit("")),
        nullif($"c", lit("")), lit("")).as("r"))
      .collect().map(_.getString(0)).toSeq
    val expected = cases.map { case (a, b, c) =>
      Seq(a, b, c).find(_.nonEmpty).getOrElse("") // '' falsy or-chain
    }
    assert(got == expected)
  }

  test("normalize is idempotent for arbitrary '' placement") {
    import spark.implicits._
    val cases = samples(Gen.zip(cell, cell, cell, cell), 100)
    val df = cases.toDF("a", "b", "c", "d")
    val once = ArticleSource.normalize(df).collect().toSeq
    val twice = ArticleSource.normalize(ArticleSource.normalize(df)).collect().toSeq
    assert(once == twice)
  }

  test("author pack/split/explode/collect round trip preserves the multiset") {
    import spark.implicits._
    val author = Gen.nonEmptyListOf(Gen.alphaChar).map(_.mkString.take(6))
    val lists = samples(Gen.nonEmptyListOf(author).map(_.take(5)), 100)
    val packed = lists.zipWithIndex.map { case (l, i) => (i, l.mkString("; ")) }
    val back = packed.toDF("id", "chercheurs")
      .select($"id", explode(split($"chercheurs", "; ")).as("author"))
      .groupBy($"id")
      .agg(sort_array(collect_list($"author")).as("back"))
      .collect().map(r => r.getInt(0) -> r.getSeq[String](1)).toMap
    lists.zipWithIndex.foreach { case (l, i) =>
      assert(back(i) == l.sorted, s"case $i")
    }
  }
}
