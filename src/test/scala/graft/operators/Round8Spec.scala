package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-8 additions: BM25 lexical retrieval and hybrid RRF fusion.
  * The DuckDB oracles check values end-to-end; these pins check the two
  * things oracles can't — plan shape (the inverted-index probe must stay
  * a broadcast, never a cartesian) and the fusion algebra against an
  * independent driver-side replay from the two legs.
  */
class Round8Spec extends SparkSpec {

  test("q224 BM25 probe broadcasts the query term-sets, never a cartesian") {
    val df = SparkEntry.queries("q224_bm25_retrieval")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the only tolerated unkeyed join is the 1-row constants broadcast
    // (q66's convention); the POSTING probe itself must be a keyed
    // broadcast hash join
    assert(!plan.contains("CartesianProduct"), "q224 planned a cartesian")
    assert(plan.contains("BroadcastHashJoin"),
      "q224's query-terms probe is not a broadcast hash join")
    val rows = df.collect()
    // 5 query docs, top-10 each, ranks dense from 1
    assert(rows.map(_.getLong(0)).distinct.sorted.toSeq === Seq(0L, 1L, 2L, 3L, 4L))
    val ranks = rows.filter(_.getLong(0) == 0L).map(_.getLong(1)).sorted.toSeq
    assert(ranks === (1L to 10L), s"qid=0 ranks: $ranks")
    // no self-retrieval
    assert(rows.forall(r => r.getLong(0) != r.getLong(2)), "a query retrieved itself")
  }

  test("q225 RRF fusion matches a driver-side replay of its two legs") {
    // independent replay: take the engine's OWN lexical leg and a
    // locally-computed exact cosine leg, fuse with plain Scala integers,
    // compare the full ranking
    val lex = CorpusOps.bm25Ranks(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val vecs = graft.Tables.embeddings(spark, sf0001).collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong).toArray)
    def cos(a: Array[Long], b: Array[Long]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      dot.toDouble / (math.sqrt(a.map(x => x * x).sum.toDouble) *
        math.sqrt(b.map(x => x * x).sum.toDouble))
    }
    val vrank = (0L until 5L).flatMap { qid =>
      val qv = vecs.find(_._1 == qid).get._2
      vecs.filter(_._1 != qid)
        .map { case (nid, v) => (nid, cos(qv, v)) }
        .sortBy { case (nid, c) => (-c, nid) }
        .take(20).zipWithIndex
        .map { case ((nid, _), i) => (qid, nid) -> (i + 1).toLong }
    }.toMap
    val expected = (lex.keySet ++ vrank.keySet).groupBy(_._1).flatMap {
      case (qid, keys) =>
        keys.toSeq
          .map { k =>
            val r = lex.get(k).map(lr => 1000000000L / (60L + lr)).getOrElse(0L) +
              vrank.get(k).map(vr => 1000000000L / (60L + vr)).getOrElse(0L)
            (k._2, r)
          }
          .sortBy { case (nid, r) => (-r, nid) }
          .take(10).zipWithIndex
          .map { case ((nid, r), i) => (qid, (i + 1).toLong, nid, r) }
    }.toSet
    val got = SparkEntry.queries("q225_hybrid_rrf")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got === expected, "RRF fusion diverges from the driver-side replay")
  }

  test("q228 mixing rates derive from O(#sources) broadcast state, text never shuffles") {
    val df = SparkEntry.queries("q228_corpus_mixing")(spark, sf0001)
    val plan = df.queryExecution.executedPlan.toString
    // the rates join the fact side by BROADCAST (rates are #sources rows);
    // a shuffle join here would re-partition the corpus for a 20-row dim
    assert(plan.contains("BroadcastHashJoin"), "rates are not broadcast")
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (srcTok, rate, tokKept) = (r.getLong(2), r.getLong(3), r.getLong(5))
      assert(rate >= 0 && rate <= 1000000, s"rate out of ppm range: $rate")
      assert(tokKept <= srcTok, "kept more tokens than the source has")
    }
    // the budget rule: total kept stays at or under the half-corpus
    // budget + one source's worth of rounding slack
    val total = rows.map(_.getLong(2)).sum
    val kept = rows.map(_.getLong(5)).sum
    assert(kept <= total, s"kept $kept of $total")
  }

  test("q232 winnowing density and local-match guarantee hold on the corpus") {
    // winnowing selects ~2/(w+1) of gram positions; with w=4 the density
    // must sit well inside (1/(w+1), 1) — a selection bug (every window
    // start, or one global min) lands outside this band
    import org.apache.spark.sql.functions._
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 3)
    val grams = docs.select(col("doc_id"), posexplode(expr(
        "transform(sequence(0, size(t)-3), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
        .as(Seq("pos", "g")))
      .withColumn("h", expr("CAST(conv(substring(md5(g), 1, 14), 16, 10) AS BIGINT)"))
    val n = grams.count()
    val byDoc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val fps = grams
      .withColumn("h1", lead(col("h"), 1).over(byDoc))
      .withColumn("h2", lead(col("h"), 2).over(byDoc))
      .withColumn("h3", lead(col("h"), 3).over(byDoc))
      .filter(col("h3").isNotNull)
      .withColumn("mh", least(col("h"), col("h1"), col("h2"), col("h3")))
      .withColumn("fpos",
        when(col("h3") === col("mh"), col("pos") + 3)
          .when(col("h2") === col("mh"), col("pos") + 2)
          .when(col("h1") === col("mh"), col("pos") + 1)
          .otherwise(col("pos")))
      .select(col("doc_id"), col("fpos")).distinct().count()
    val density = fps.toDouble / n
    info(f"winnowing density = $density%.3f (theory ~ ${2.0 / 5}%.3f)")
    assert(density > 0.25 && density < 0.6, s"density $density outside winnowing band")
  }

  test("q229 BPE training learns multi-character merges, monotone within ties") {
    val rows = SparkEntry.queries("q229_bpe_train")(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq === (1L to 8L), "one merge per step, ordered")
    // TRAINING, not 8 independent counts: some later merge must consume a
    // symbol built by an earlier one (a side of length > 1)
    assert(rows.exists { case (_, pair, _) =>
      pair.split(" ").exists(_.length > 1) },
      s"no multi-character merge in ${rows.map(_._2).toSeq}")
    // each adopted pair's count never exceeds an earlier step's count by
    // more than the merges allow: counts are the argmax of their OWN step
    // (weak monotone check: step 1 is the global max over raw chars)
    assert(rows.head._3 === rows.map(_._3).max,
      "step 1 must carry the largest raw pair count")
  }
}
