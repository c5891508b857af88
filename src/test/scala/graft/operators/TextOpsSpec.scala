package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {

  test("q150 canonicalizer merges case/punctuation/whitespace variants") {
    // the sf corpora are punctuation-free lower-case, so q150's
    // merged_by_canon is legitimately 0 there; this pins that the
    // canonicalizer DOES merge the variants it exists for
    import spark.implicits._
    val variants = Seq(
      "Hello, World!",
      "hello world",
      "HELLO   world.",
      "hello; world",
      "a genuinely different document")
    val canon = variants.toDF("text")
      .select(TextOps.canonText(col("text")).as("c"))
      .collect().map(_.getString(0))
    assert(canon.take(4).distinct.length == 1, s"variants not merged: ${canon.toSeq}")
    assert(canon(0) == "hello world")
    assert(canon(4) == "a genuinely different document")
  }

  test("q175 prefix filtering indexes materially fewer postings than q74") {
    // the perf claim behind the lossless result: at tau=0.5 the indexed
    // prefix is floor(n/2)+1 of each n-token set, so postings shrink to
    // ~(n/2+1)/n of the full inverted index
    val docs = graft.Tables.documents(spark, sf001)
      .select(col("doc_id"),
        array_distinct(expr(
          """transform(sequence(0, size(split(text, ' '))-3),
            |  i -> concat_ws(' ', split(text, ' ')[i],
            |       split(text, ' ')[i+1], split(text, ' ')[i+2]))""".stripMargin))
          .as("sh"))
      .filter(size(col("sh")) > 0)
    val full = docs.select(explode(col("sh"))).count()
    val prefix = docs
      .select(explode(expr("slice(sh, 1, CAST(size(sh) div 2 AS INT) + 1)")))
      .count()
    assert(prefix < full * 6 / 10,
      s"prefix postings $prefix not materially below full $full")
  }

  test("q151 finds nonzero contamination on the sf0.01 corpus") {
    // guards the fixture against degenerating into a vacuous check: the
    // mod-7 benchmark split must actually share 8-grams with the train set
    val out = TextOps.queries("q151_decontamination")(spark, sf001)
      .agg(sum(col("n_contaminated"))).collect()(0).getLong(0)
    assert(out > 0, "benchmark split shares no 8-grams with the train set")
  }
}
