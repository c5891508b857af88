package graft.operators

import graft.{SparkSpec, SparkEntry}
import org.apache.spark.sql.functions._

/** Invariant pins for the round-6 operators beyond the DuckDB hash compare:
  * the oracle proves value equality at one SF; these pin the semantic
  * properties that must survive any data (the dedup flags something real,
  * the fluency gate bites, the importance signal points at the target,
  * keeper ids actually precede what they replace).
  */
class Round6Spec extends SparkSpec {

  test("q199 semantic dedup flags pairs, and every keeper precedes its dup") {
    val out = SparkEntry.queries("q199_semantic_dedup")(spark, sf001).cache()
    try {
      assert(out.count() > 0, "threshold flags nothing — vacuous fixture")
      // SemDeDup keeps the lowest id: a keeper must precede what it removes
      assert(out.filter(col("keeper_id") >= col("dup_id")).count() == 0,
        "a keeper does not precede its duplicate")
      // a flagged vector appears once, with its single best keeper
      assert(out.groupBy(col("dup_id")).count().filter(col("count") > 1)
        .count() == 0, "a dup_id has two removal verdicts")
    } finally out.unpersist()
  }

  test("q200 fluency gate bites without flagging the whole corpus") {
    val rows = SparkEntry.queries("q200_lm_fluency")(spark, sf001).collect()
    val (low, docs) = (rows.map(_.getAs[Long]("n_low")).sum,
      rows.map(_.getAs[Long]("n_docs")).sum)
    assert(low > 0, "low-fluency gate flags nothing — vacuous threshold")
    assert(low < docs / 2, s"gate flags $low of $docs docs — threshold broken")
  }

  test("q201 importance weights rank the target language on top") {
    val top = SparkEntry.queries("q201_importance_weights")(spark, sf001)
      .collect()
    // the DSIR signal exists to surface target-like docs: the top-20 must
    // be majority-English even though English is ~44% of the corpus
    val en = top.count(_.getAs[String]("lang") == "en")
    assert(en > top.length / 2,
      s"only $en of ${top.length} top-weight docs are English — no signal")
  }

  test("q214 incremental dedup flags snapshot duplicates in the delta") {
    val rows = SparkEntry.queries("q214_incremental_dedup")(spark, sf001)
      .collect().map(r => r.getAs[String]("class") -> r.getAs[Long]("n_docs"))
      .toMap
    assert(rows.getOrElse("dup_of_snapshot", 0L) > 0,
      "no delta doc matched a snapshot fingerprint — vacuous fixture")
    assert(rows.getOrElse("unique", 0L) > 0, "every delta doc was a dup")
    // the three classes must PARTITION the delta: every delta doc lands
    // in exactly one class (independently recomputed delta size)
    val deltaDocs = graft.Tables.documents(spark, sf001)
      .filter(expr(
        "CAST(conv(substring(md5(concat('doc-', CAST(doc_id AS STRING))), 1, 7), 16, 10) AS BIGINT) % 100 >= 80"))
      .count()
    assert(rows.values.sum == deltaDocs,
      s"classes cover ${rows.values.sum} of $deltaDocs delta docs")
  }

  test("q202 right-outer keeps every watermark-final purchase exactly once") {
    val out = SparkEntry.queries("q202_stream_right_outer")(spark, sf0001)
      .cache()
    try {
      val attributed = out.agg(sum(col("n_attributed"))).head.getLong(0)
      val unattributed = out.agg(sum(col("n_unattributed"))).head.getLong(0)
      assert(attributed > 0, "no purchase matched a signup window")
      assert(unattributed > 0,
        "every purchase matched — the outer path is untested")
    } finally out.unpersist()
  }
}
