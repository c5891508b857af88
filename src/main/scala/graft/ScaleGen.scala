package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic sf1 generator for the scale check the r7 verdict asked
  * for: every plan claim ("survives 100×") was argued from plan shape and
  * measured only at sf0.1, so this derives a 10× dataset FROM sf0.1 (which
  * is itself deterministic, driver seed 42 — see TESTDATA.md) by unioning
  * `copies` key-shifted replicas of each fact/dimension: copy i adds
  * i·(max(key)+1) to every primary key and to the foreign keys that
  * reference it, so join cardinalities scale exactly linearly and every
  * query's semantic shape is preserved. Dates, measures, text, and
  * embeddings are left as-is — document text repeating 10× is exactly the
  * stress a dedup corpus applies, so the near-dup family gets a HARDER
  * input at sf1, not an easier one. nation/region (fixed dims) and events
  * are copied through unchanged.
  *
  * Output lands OUTSIDE /root/testdata (read-only): `target/sf1` by
  * default. Usage: runMain graft.ScaleGen [srcDir] [dstDir] [copies]
  */
object ScaleGen {

  private def stride(df: DataFrame, key: String): Long =
    df.agg(max(col(key)).cast("long")).head().getLong(0) + 1L

  /** Shift `keys` (column → stride) in copy i, preserving column types. */
  private def shifted(df: DataFrame, keys: Map[String, Long], i: Int): DataFrame =
    keys.foldLeft(df) { case (d, (k, s)) =>
      val t = df.schema(k).dataType
      d.withColumn(k, (col(k).cast("long") + lit(i * s)).cast(t))
    }

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = args.lift(1).getOrElse("target/sf1")
    val copies = args.lift(2).map(_.toInt).getOrElse(10)
    // optional 4th arg: comma-separated table subset — the second decade
    // (sf1 → sf10) only needs the tables its query set reads, and the
    // disk ceiling is real at 100× (r8 verdict #2)
    val only: Set[String] = args.lift(3)
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty)
    def wanted(n: String) = only.isEmpty || only(n)
    val spark = GraftSession.get(GraftSession.cpus("32"))

    def load(n: String) = Tables(spark, src, n)
    // primary-key strides, shared with the referencing foreign keys
    val sCust = stride(load("customer"), "c_custkey")
    val sSupp = stride(load("supplier"), "s_suppkey")
    val sPart = stride(load("part"), "p_partkey")
    val sOrd = stride(load("orders"), "o_orderkey")
    val sDoc = stride(load("documents"), "doc_id")
    val sVec = stride(load("embeddings"), "vec_id")

    val plans: Seq[(String, Map[String, Long])] = Seq(
      "customer" -> Map("c_custkey" -> sCust),
      "supplier" -> Map("s_suppkey" -> sSupp),
      "part" -> Map("p_partkey" -> sPart),
      "orders" -> Map("o_orderkey" -> sOrd, "o_custkey" -> sCust),
      "lineitem" -> Map("l_orderkey" -> sOrd, "l_partkey" -> sPart,
        "l_suppkey" -> sSupp),
      "documents" -> Map("doc_id" -> sDoc),
      "embeddings" -> Map("vec_id" -> sVec),
      "nation" -> Map.empty, "region" -> Map.empty)

    plans.filter(p => wanted(p._1)).foreach { case (name, keys) =>
      val base = load(name)
      val out =
        if (keys.isEmpty) base
        else (0 until copies).map(shifted(base, keys, _)).reduce(_.unionAll(_))
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"[scalegen] $name: ${out.count()} rows -> $dst/$name.parquet")
    }
    // events scales like the facts — copies shift event_id (and user_id,
    // which some stateful queries key on) but keep TIMESTAMPS as-is, so
    // at 10× input the event-time window count is unchanged: exactly the
    // contrast the streaming state sweep measures (window-agg state
    // constant, dedup-by-id state ∝ distinct ids — r8 verdict #5)
    if (wanted("events")) {
    val ev = load("events")
    val sEvt = stride(ev, "event_id")
    val sUsr = stride(ev, "user_id")
    val evOut = (0 until copies)
      .map(shifted(ev, Map("event_id" -> sEvt, "user_id" -> sUsr), _))
      .reduce(_.unionAll(_))
    evOut.write.mode("overwrite").parquet(s"$dst/events.parquet")
    println(s"[scalegen] events: ${evOut.count()} rows -> $dst/events.parquet")
    }
    spark.stop()
  }
}
