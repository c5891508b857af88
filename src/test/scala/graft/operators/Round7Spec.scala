package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-7 additions: persisted snapshot gate, landed binary ingestion,
  * and the streaming/source-surface pins live in their own suites.
  */
class Round7Spec extends SparkSpec {

  test("q216 persisted snapshot gate is row-identical to the derived q214") {
    val persisted = SparkEntry.queries("q216_snapshot_gate_persisted")(spark, sf001)
    // the snapshot side must come back through a parquet FileScan on the
    // published fingerprint artifact, not the documents table
    assert(persisted.queryExecution.executedPlan.toString
        .contains("graft_snapfp_"),
      "q216 snapshot side does not read the published fingerprint parquet")
    val derived = SparkEntry.queries("q214_incremental_dedup")(spark, sf001)
    assert(persisted.collect().map(_.toSeq).toSeq ===
        derived.collect().map(_.toSeq).toSeq,
      "persisted-snapshot classification diverges from derived-snapshot q214")
  }

  test("q218 ADC top-20 matches a driver-side brute-force PQ replay") {
    // independent twin: quantize, encode against the first-16 codebook
    // with the packed argmin tie-break, LUT from vec 0, ADC = sum of LUT
    // entries — all in plain Scala, no Spark SQL
    val vecs = graft.Tables.embeddings(spark, sf0001)
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong).toArray)
      .sortBy(_._1)
    def sub(v: Array[Long], m: Int): Array[Long] = v.slice(m * 8, m * 8 + 8)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val codebook = vecs.filter(_._1 < 16).map(_._2)
    val qv = vecs.find(_._1 == 0L).get._2
    val lut = Array.tabulate(8, 16)((m, c) => d2(sub(qv, m), sub(codebook(c.toInt), m)))
    val adc = vecs.filter(_._1 != 0L).map { case (id, v) =>
      val dist = (0 until 8).map { m =>
        val code = (0 until 16).minBy(c => d2(sub(v, m), sub(codebook(c), m)) * 16 + c) % 16
        lut(m)(code)
      }.sum
      (dist, id)
    }.sorted.take(20).map { case (dist, id) => (id, dist) }.toSeq
    val got = SparkEntry.queries("q218_ann_adc_rerank")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === adc, "engine ADC top-20 diverges from the brute-force replay")
  }

  test("q219 dup spans match a hash-free brute-force replay") {
    // independent twin with NO hashing: window identity is the raw
    // 16-token text, so this pins that the engine's xxhash64 identity is
    // collision-free on the fixture and the island merge is right
    val k = 16
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("source"), col("text"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).split(" ").filter(_.nonEmpty)))
      .filter(_._3.length >= k)
    val wins = docs.flatMap { case (id, src, t) =>
      (0 to t.length - k).map(p => (t.slice(p, p + k).mkString(" "), id, src, t.length, p))
    }
    val hot = wins.groupBy(_._1).filter(_._2.map(_._2).distinct.size > 1).keySet
    val expected = wins.filter(w => hot(w._1))
      .groupBy(w => (w._2, w._3, w._4))
      .map { case ((id, src, n), ws) =>
        val ps = ws.map(_._5).distinct.sorted
        // merge starts whose windows overlap or touch (gap <= k) into
        // maximal islands — each token counted once
        val spans = ps.foldLeft(List.empty[(Int, Int)]) {
          case ((a, b) :: rest, p) if p - b <= k => (a, p) :: rest
          case (acc, p) => (p, p) :: acc
        }.map { case (a, b) => b - a + k }
        (id, src, spans.size.toLong, spans.sum.toLong,
          spans.max.toLong, spans.sum.toLong * 1000000L / n)
      }.toSeq.sortBy(_._1)
    val got = SparkEntry.queries("q219_dup_spans")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected, "engine dup-span frame diverges from brute force")
    assert(expected.nonEmpty, "fixture has no duplicated spans — test is vacuous")
  }

  test("q220 count-min estimate is one-sided for EVERY token, not just probes") {
    // the CMS guarantee: estimate >= exact, always. Replay the sketch in
    // plain Scala over every distinct token at sf0.001.
    import java.security.MessageDigest
    def bucket(r: Int, w: String): Long = {
      val hex = MessageDigest.getInstance("MD5")
        .digest(s"cms-$r-$w".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(7)
      java.lang.Long.parseLong(hex, 16) % 512
    }
    val toks = graft.Tables.documents(spark, sf0001)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
    val exact = toks.groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    val sketch = new scala.collection.mutable.HashMap[(Int, Long), Long]()
    for (w <- toks; r <- 0 until 4)
      sketch.updateWith((r, bucket(r, w)))(c => Some(c.getOrElse(0L) + 1))
    exact.foreach { case (w, n) =>
      val est = (0 until 4).map(r => sketch((r, bucket(r, w)))).min
      assert(est >= n, s"CMS under-counted '$w': $est < $n")
    }
    // and the engine's probe frame agrees with this replay on the overlap
    val got = SparkEntry.queries("q220_countmin_sketch")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 20)
    got.foreach { case (w, ex, est, over) =>
      assert(ex === exact(w), s"probe '$w' exact mismatch")
      assert(est === (0 until 4).map(r => sketch((r, bucket(r, w)))).min,
        s"probe '$w' estimate mismatch")
      assert(over === est - ex && over >= 0L)
    }
  }

  test("q216 snapshot artifact is fingerprints only — one fp column") {
    // the published accepted-corpus contract must never carry text:
    // construct the query (which publishes), then read the artifact raw
    SparkEntry.queries("q216_snapshot_gate_persisted")(spark, sf001)
    // derive the dir from the SAME sf001 value the query ran with, so the
    // two can never silently drift (r7 ADVICE)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_snapfp_" +
      s"${spark.sparkContext.applicationId}_" +
      sf001.replaceAll("[^A-Za-z0-9.-]", "_")
    val snap = spark.read.parquet(dir)
    assert(snap.columns.toSeq === Seq("fp"), s"artifact schema: ${snap.columns.toSeq}")
    assert(snap.count() > 0)
    assert(snap.agg(max(length(col("fp")))).head.getInt(0) === 32,
      "fingerprints are not 32-hex md5 strings")
  }
}
