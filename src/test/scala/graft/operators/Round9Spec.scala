package graft.operators

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Round-9 additions: the BPE encode pass and the Avro round trip.
  * (q233's DPP evidence lives in PlanSpec — it is a plan/metrics
  * property; q236's pushdown pins live in ArticleSourceV2Spec.) The
  * DuckDB oracles check values end-to-end; these pins check what the
  * oracles can't — the encode algebra against an independent driver-side
  * replay, the train/serve split semantics, and the physical layout of
  * the Avro landing.
  */
class Round9Spec extends SparkSpec {

  test("q234 encode applies EXACTLY the q229-style merges learned on the even half") {
    // independent replay: learn BPE merges driver-side from the even
    // doc_ids only, apply them greedily left-to-right to a sample of
    // words from the WHOLE corpus, and compare token counts with the
    // engine's per-doc stats
    val docs = graft.Tables.documents(spark, sf0001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) ->
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq)
    val trainFreq = scala.collection.mutable.Map.empty[String, Long]
    docs.filter(_._1 % 2 == 0).flatMap(_._2)
      .foreach(w => trainFreq(w) = trainFreq.getOrElse(w, 0L) + 1L)

    def applyMerge(syms: Vector[String], pair: (String, String)): Vector[String] = {
      val out = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == pair._1 && syms(i + 1) == pair._2) {
          out += (syms(i) + syms(i + 1)); i += 2
        } else { out += syms(i); i += 1 }
      }
      out.result()
    }
    // train 8 merges on the even half (weighted by train frequency)
    var seg: Map[String, Vector[String]] =
      (docs.flatMap(_._2).distinct.map(w => w -> w.map(_.toString).toVector)).toMap
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    for (_ <- 1 to 8) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      trainFreq.foreach { case (w, f) =>
        val s = seg(w)
        s.zip(s.drop(1)).foreach(p => counts(p) = counts.getOrElse(p, 0L) + f)
      }
      if (counts.nonEmpty) {
        val best = counts.toSeq
          .minBy { case ((a, b), c) => (-c, a + " " + b) }._1
        merges += best
        seg = seg.map { case (w, s) => w -> applyMerge(s, best) }
      }
    }
    val want = docs.map { case (id, ws) =>
      id -> ws.map(w => seg(w).length.toLong).sum
    }.toMap
    val got = SparkEntry.queries("q234_bpe_encode")(spark, sf0001)
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === want, "engine token counts diverge from the driver replay")
    // and the merges must do real work: strictly fewer tokens than chars
    val chars = docs.map { case (id, ws) => id -> ws.map(_.length.toLong).sum }.toMap
    assert(got.exists { case (id, n) => n < chars(id) },
      "no document was compressed by the learned merges")
  }

  test("q234 OOV counts only single chars absent from the TRAINING half") {
    val rows = SparkEntry.queries("q234_bpe_encode")(spark, sf0001).collect()
    // this synthetic corpus shares its charset between halves, so the
    // structural contract is oov = 0 everywhere; a nonzero value here
    // would mean the train/serve charset split leaked
    val trainChars = graft.Tables.documents(spark, sf0001)
      .filter(col("doc_id") % 2 === 0)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .flatMap(_.toCharArray).toSet
    val allChars = graft.Tables.documents(spark, sf0001)
      .select(col("text")).collect()
      .flatMap(_.getString(0).split(" ").filter(_.nonEmpty))
      .flatMap(_.toCharArray).toSet
    val expectOov = (allChars -- trainChars).nonEmpty
    assert(rows.exists(_.getLong(5) > 0) === expectOov,
      s"oov column disagrees with the charset split (unseen chars: ${allChars -- trainChars})")
  }

  test("q237 KMV set ops: sketches saturate and estimates track exact overlap") {
    val rows = SparkEntry.queries("q237_kmv_set_ops")(spark, sf001).collect()
    assert(rows.length === 190, s"expected C(20,2) source pairs, got ${rows.length}")
    // the whole point of the bigram domain: k=64 sketches must SATURATE
    // (union_est via the estimator, not the exact-collapse path)
    assert(rows.forall(_.getLong(2) > 64),
      "a union estimate fell below k - the estimator path is untested")
    // estimate quality: mean relative intersection error well under the
    // 1/sqrt(k) ~ 12.5% theory bound's ballpark (allow 3x for small sets)
    val errs = rows.map { r =>
      val est = r.getLong(3).toDouble
      val exact = math.max(r.getLong(4), 1L).toDouble
      math.abs(est - exact) / exact
    }
    val mean = errs.sum / errs.length
    info(f"mean KMV intersection error = $mean%.3f")
    assert(mean < 0.375, f"mean intersection error $mean%.3f out of bounds")
  }

  test("q242 compaction collapses the file count without touching a value") {
    SparkEntry.queries("q242_compaction")(spark, sf0001).collect()
    val base = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_compact_" +
        s"${spark.sparkContext.applicationId}_" +
        sf0001.replaceAll("[^A-Za-z0-9.-]", "_"))
    def parquetFiles(sub: String): Int =
      Option(new java.io.File(base, sub).listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    val frag = parquetFiles("fragmented")
    val comp = parquetFiles("compacted")
    assert(frag === 32, s"fragmented landing has $frag files")
    assert(comp >= 1 && comp * 4 <= frag,
      s"compaction did not collapse the layout: $frag -> $comp")
    // byte-identity of the data across layouts: same rows, any order
    val a = spark.read.parquet(s"$base/fragmented").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    val b = spark.read.parquet(s"$base/compacted").collect()
      .map(_.toSeq).groupBy(identity).view.mapValues(_.length).toMap
    assert(a === b, "compaction changed the data")
  }

  test("q245 compaction respects the hive layout: one file per partition dir") {
    SparkEntry.queries("q245_partitioned_compaction")(spark, sf0001).collect()
    val base = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_pcompact_" +
        s"${spark.sparkContext.applicationId}_" +
        sf0001.replaceAll("[^A-Za-z0-9.-]", "_"))
    def perDir(sub: String): Map[String, Int] =
      Option(new java.io.File(base, sub).listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("o_orderpriority="))
        .map(d => d.getName ->
          Option(d.listFiles()).getOrElse(Array.empty)
            .count(_.getName.endsWith(".parquet")))
        .toMap
    val frag = perDir("fragmented")
    val comp = perDir("compacted")
    assert(frag.keySet === comp.keySet, "compaction changed the partition set")
    assert(frag.values.forall(_ > 1), s"fragmented landing not fragmented: $frag")
    assert(comp.values.forall(_ === 1),
      s"within-partition compaction must leave ONE file per dir: $comp")
  }

  test("q235 Avro landing is file-per-partition and decode covers every row") {
    SparkEntry.queries("q235_avro_roundtrip")(spark, sf0001).collect()
    val dir = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_avro_" +
        s"${spark.sparkContext.applicationId}_" +
        sf0001.replaceAll("[^A-Za-z0-9.-]", "_"))
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .map(_.getName).filter(_.endsWith(".avro")).sorted.toSeq
    assert(files.size > 1, s"avro landing is not parallel: $files")
    // total decoded rows must equal the source row count (nothing lost
    // or double-landed across the container files)
    val total = SparkEntry.queries("q235_avro_roundtrip")(spark, sf0001)
      .agg(sum(col("n_docs"))).collect()(0).getLong(0)
    val want = graft.Tables.documents(spark, sf0001).count()
    assert(total === want, s"decoded $total rows, source has $want")
  }
}
