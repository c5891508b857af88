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
