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

  test("q216 snapshot artifact is fingerprints only — one fp column") {
    // the published accepted-corpus contract must never carry text:
    // construct the query (which publishes), then read the artifact raw
    SparkEntry.queries("q216_snapshot_gate_persisted")(spark, sf001)
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_snapfp_" +
      s"${spark.sparkContext.applicationId}_" +
      "/root/testdata/sf0.01".replaceAll("[^A-Za-z0-9.-]", "_")
    val snap = spark.read.parquet(dir)
    assert(snap.columns.toSeq === Seq("fp"), s"artifact schema: ${snap.columns.toSeq}")
    assert(snap.count() > 0)
    assert(snap.agg(max(length(col("fp")))).head.getInt(0) === 32,
      "fingerprints are not 32-hex md5 strings")
  }
}
