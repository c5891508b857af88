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

  // ---- hot-element candidate bounds for the self-built candidate stages
  // (q175 prefix filter, q182 containment) — the JaccardSpec pin applied
  // to the two operators that bypass Jaccard.pairs

  /** 60 docs: one boilerplate shingle in 50 of them, plus per-doc rare
    * shingles with chain overlaps (shared{k} links docs 2k and 2k+1), plus
    * one genuine near-dup/containment pair (200 ⊂ 201).
    */
  private def hotFixture = {
    import spark.implicits._
    ((0 until 60).map { i =>
      val rare = Seq(s"r${i}a", s"r${i}b", s"shared${i / 2}")
      i.toLong -> (if (i < 50) rare :+ "HOT" else rare)
    } ++ Seq(
      200L -> Seq("x1", "x2", "x3"),
      201L -> Seq("x1", "x2", "x3", "y1", "y2")))
      .toDF("doc_id", "shingles")
  }

  test("q182 containment: df cap bounds the directed candidate fan-out") {
    val sh = hotFixture
    // uncapped, the hot shingle alone emits 50*49 directed pairs
    assert(TextOps.containmentCandidates(sh, Long.MaxValue).count() >= 2450L)
    // capped, only genuine-content overlaps survive: 30 chain pairs both
    // directions + the (200,201) pair both directions
    val cand = TextOps.containmentCandidates(sh, 10L)
    assert(cand.count() === 62L)
    // the stated bound: maxDf × |postings|
    val nPostings = sh.select(explode(col("shingles"))).count()
    assert(cand.count() <= 10L * nPostings)
    // and the verified result keeps exactly the asymmetric pair: 200's 3
    // cold shingles all appear in 201 (C = 3/3 ≥ 0.8) but not vice versa
    // (C = 3/5 < 0.8); chain pairs fail at 1/3 and 1/4
    val out = TextOps.containmentPairs(sh, 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((200L, 201L, 3L, 3L)))
  }

  test("q175 prefix filter: df cap + prefix bound the candidate set") {
    val sh = hotFixture
    // capped at 10 the HOT postings vanish before prefix construction;
    // chain links (df 2) sort after the df-1 singletons and fall outside
    // every tau=0.5 prefix, so the only candidate is the genuine pair
    val cand = TextOps.prefixCandidates(sh, 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(cand.toSeq === Seq((200L, 201L)))
    // ...which verifies exactly under the family convention (cold inter,
    // full-size denominators): inter 3, union 3+5-3 = 5, 2*3 >= 5
    val out = TextOps.prefixFilterPairs(sh, 10L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq === Seq((200L, 201L, 3L, 5L)))
  }

  test("q175: boilerplate inside the prefix window is fanned out only uncapped") {
    import spark.implicits._
    // adversarial shape the prefix alone does NOT bound: two hot shingles
    // per doc, so the tau=0.5 prefix (2 of 3) always includes one
    val sh = (0 until 50).map(i => i.toLong -> Seq(s"r$i", "HOT1", "HOT2"))
      .toDF("doc_id", "shingles")
    assert(TextOps.prefixCandidates(sh, Long.MaxValue).count() === 1225L)
    // the df cap restores the bound: cold sets are the df-1 singletons
    assert(TextOps.prefixCandidates(sh, 10L).count() === 0L)
  }

  test("q151 finds nonzero contamination on the sf0.01 corpus") {
    // guards the fixture against degenerating into a vacuous check: the
    // mod-7 benchmark split must actually share 8-grams with the train set
    val out = TextOps.queries("q151_decontamination")(spark, sf001)
      .agg(sum(col("n_contaminated"))).collect()(0).getLong(0)
    assert(out > 0, "benchmark split shares no 8-grams with the train set")
  }
}
