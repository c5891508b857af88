package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Execution semantics of the native as-of join, on planted data the
  * oracle gate cannot isolate: strict-before tiebreaks, missing matches,
  * null carried values, and the physical plan actually using the custom
  * operator.
  */
class AsOfJoinSpec extends SparkSpec {

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("asof picks the last strictly-prior right row per key") {
    import spark.implicits._
    // left: (event_id, user_id, ts)
    val left = Seq(
      (100L, 1L, ts(10000000L)), // after views 1 and 2 -> value 2.0
      (101L, 1L, ts(3000000L)),  // after view 1 only -> 1.0
      (102L, 2L, ts(10000000L)), // user 2 has no views -> null
      (103L, 3L, ts(5000000L))   // same ts as view, view has smaller id -> 3.0
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts(2000000L), 1.0),
      (11L, 1L, ts(9000000L), 2.0),
      (12L, 3L, ts(5000000L), 3.0), // same ts as purchase 103, id 12 < 103
      (13L, 3L, ts(5000000L), 4.0)  // id 13 < 103 too, later in tie order
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v")
      .select(col("event_id"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(100L) == Some(2.0))
    assert(out(101L) == Some(1.0))
    assert(out(102L) == None)
    assert(out(103L) == Some(4.0)) // the LAST of the two same-ts prior views
  }

  test("a right row at or after the left position never matches") {
    import spark.implicits._
    val left = Seq((50L, 1L, ts(1000000L))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (60L, 1L, ts(1000000L), 9.0), // same ts, LARGER id -> not strictly before
      (61L, 1L, ts(2000000L), 8.0)  // later ts
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v").collect()
    assert(out.length == 1 && out(0).isNullAt(3))
  }

  test("a null carried value stays null (last-ROW, not last-non-null)") {
    import spark.implicits._
    val left = Seq((70L, 1L, ts(9000000L))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (80L, 1L, ts(1000000L), Some(5.0)),
      (81L, 1L, ts(2000000L), None: Option[Double]) // last prior row: null value
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v").collect()
    assert(out.length == 1 && out(0).isNullAt(3))
  }

  test("property: native as-of equals the window-composition reference on random data") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // random interleaved history: few keys + coarse times force heavy ties
    val row = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 20L), Gen.choose(0.0, 9.0))
    val rows = Gen.listOfN(120, row)
    (0 until 5).foreach { seed =>
      val data = rows.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case ((k, t, v), i) =>
          (i.toLong, k, ts(t * 1000000L), v, i % 3 == 0) // every 3rd row is "left"
        }
      val df = data.toDF("event_id", "user_id", "ts", "value", "is_left")
      val left = df.filter(col("is_left")).select(col("event_id"), col("user_id"), col("ts"))
      val right = df.filter(!col("is_left"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val native = AsOfJoin(spark, left, right,
          "user_id", "ts", "event_id", "value", "v")
        .select(col("event_id"), col("v")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      // reference: last right ROW strictly before, via window over the union
      // (last non-null STRUCT = last right row even if its value were null)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val ref = df.withColumn("tagged",
          when(!col("is_left"), struct(col("value"))))
        .withColumn("lastRow", last(col("tagged"), ignoreNulls = true).over(w))
        .filter(col("is_left"))
        .select(col("event_id"), col("lastRow.value").as("v")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(native == ref, s"seed $seed diverged")
    }
  }

  test("property: generic column types (string key, string tie, decimal value)") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    // the merge compares through each column's own Catalyst ordering, so
    // the operator must agree with the window reference on non-bigint
    // shapes too: string keys/tiebreaks, decimal carried values
    val row = Gen.zip(Gen.oneOf("ca", "cb", "cc"), Gen.choose(0L, 20L),
      Gen.choose(0L, 9999L))
    val rows = Gen.listOfN(120, row)
    (0 until 3).foreach { seed =>
      val data = rows.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case ((k, t, cents), i) =>
          (f"e$i%04d", k, ts(t * 1000000L), BigDecimal(cents) / 100, i % 3 == 0)
        }
      val df = data.toDF("event_id", "user_id", "ts", "value", "is_left")
      val left = df.filter(col("is_left")).select(col("event_id"), col("user_id"), col("ts"))
      val right = df.filter(!col("is_left"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val native = AsOfJoin(spark, left, right,
          "user_id", "ts", "event_id", "value", "v")
        .select(col("event_id"), col("v")).collect()
        .map(r => r.getString(0) -> Option(r.getDecimal(1))).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val ref = df.withColumn("tagged",
          when(!col("is_left"), struct(col("value"))))
        .withColumn("lastRow", last(col("tagged"), ignoreNulls = true).over(w))
        .filter(col("is_left"))
        .select(col("event_id"), col("lastRow.value").as("v")).collect()
        .map(r => r.getString(0) -> Option(r.getDecimal(1))).toMap
      assert(native == ref, s"seed $seed diverged")
    }
  }

  test("null tiebreaks follow SQL three-valued logic") {
    import spark.implicits._
    // a null tiebreak only nulls the EQUAL-time arm of strictly-before:
    // a null-tie right row at a strictly earlier time is still eligible
    // (+inf on the right / -inf on the left — either way `NULL < x` is
    // never true, but `ts < ts'` needs no tie compare)
    val left = Seq(
      (Some(90L), 1L, ts(5000000L)),
      (None: Option[Long], 1L, ts(5000000L))
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (None: Option[Long], 1L, ts(1000000L), 7.0), // earlier: eligible despite null tie
      (Some(30L), 1L, ts(5000000L), 8.0)           // same-ts: needs a real tie compare
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin(spark, left, right,
        "user_id", "ts", "event_id", "value", "v").collect()
      .map(r => (if (r.isNullAt(0)) -1L else r.getLong(0)) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(out(90L) == Some(8.0))  // same-ts view id 30 < 90 is later than ts1
    assert(out(-1L) == Some(7.0))  // null left tie: same-ts arm NULL, earlier row matches
  }

  test("a null right tiebreak ranks as +inf among equal-time prior rows") {
    import spark.implicits._
    val left = Seq((200L, 1L, ts(9000000L))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (Some(5L), 1L, ts(1000000L), 1.0),
      (None: Option[Long], 1L, ts(1000000L), 2.0) // same ts, null tie = +inf = last
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v").collect()
    assert(out.length == 1 && out(0).getDouble(3) == 2.0)
  }

  test("an equal-time null-tie right row does not stall the merge") {
    import spark.implicits._
    // right holds BOTH a null-tie and a smaller-tie row at the probe's own
    // timestamp; the null-tie row is ineligible (+inf) but must not block
    // consumption of the eligible tie=3 row (NullsLast physical order)
    val left = Seq((90L, 1L, ts(5000000L))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (None: Option[Long], 1L, ts(5000000L), 9.0), // same ts, null tie: ineligible
      (Some(3L), 1L, ts(5000000L), 6.0)            // same ts, tie 3 < 90: eligible
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v").collect()
    assert(out.length == 1 && out(0).getDouble(3) == 6.0)
  }

  test("mistyped as-of columns fail fast instead of reading garbage") {
    import spark.implicits._
    val left = Seq((1, 1L, ts(1L))).toDF("event_id", "user_id", "ts") // event_id is INT
    val right = Seq((2L, 1L, ts(1L), 1.0)).toDF("event_id", "user_id", "ts", "value")
    intercept[IllegalArgumentException] {
      AsOfJoin(spark, left, right, "user_id", "ts", "event_id", "value", "v")
    }
  }

  test("q108 plans through AsOfJoinExec and matches the q16 window spelling") {
    val native = graft.SparkEntry.queries("q108_asof_native")(spark, sf0001)
    val p = native.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native operator not in plan:\n$p")
    val window = graft.SparkEntry.queries("q16_join_asof")(spark, sf0001)
    assert(native.collect().toSeq == window.collect().toSeq,
      "native as-of result diverges from the window composition")
  }

  test("forward picks the first strictly-later right row per key") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts(1000000L)),  // before views 10 and 11 -> first after = 1.0
      (101L, 1L, ts(8000000L)),  // only view 11 remains -> 2.0
      (102L, 2L, ts(1000000L)),  // user 2 has no views -> null
      (103L, 3L, ts(5000000L))   // same ts, views have LARGER ids -> 3.0
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts(2000000L), 1.0),
      (11L, 1L, ts(9000000L), 2.0),
      (110L, 3L, ts(5000000L), 3.0), // same ts as 103, id 110 > 103: after
      (111L, 3L, ts(5000000L), 4.0)  // also after, but 110 is FIRST
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v", direction = "forward")
      .select(col("event_id"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(100L) == Some(1.0))
    assert(out(101L) == Some(2.0))
    assert(out(102L) == None)
    assert(out(103L) == Some(3.0)) // the FIRST of the two same-ts later views
  }

  test("forward: a right row at or before the left position never matches") {
    import spark.implicits._
    val left = Seq((50L, 1L, ts(2000000L))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (40L, 1L, ts(2000000L), 9.0), // same ts, SMALLER id -> not strictly after
      (41L, 1L, ts(1000000L), 8.0)  // earlier ts
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v", direction = "forward").collect()
    assert(out.length == 1 && out(0).isNullAt(3))
  }

  test("property: forward as-of equals the mirrored window reference") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val row = Gen.zip(Gen.choose(1L, 5L), Gen.choose(0L, 20L), Gen.choose(0.0, 9.0))
    val rows = Gen.listOfN(120, row)
    (0 until 5).foreach { seed =>
      val data = rows.pureApply(Gen.Parameters.default, Seed(seed.toLong))
        .zipWithIndex.map { case ((k, t, v), i) =>
          (i.toLong, k, ts(t * 1000000L), v, i % 3 == 0)
        }
      val df = data.toDF("event_id", "user_id", "ts", "value", "is_left")
      val left = df.filter(col("is_left")).select(col("event_id"), col("user_id"), col("ts"))
      val right = df.filter(!col("is_left"))
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val native = AsOfJoin(spark, left, right,
          "user_id", "ts", "event_id", "value", "v", direction = "forward")
        .select(col("event_id"), col("v")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      // reference: FIRST right ROW strictly after, via the mirrored window
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(1, org.apache.spark.sql.expressions.Window.unboundedFollowing)
      val ref = df.withColumn("tagged",
          when(!col("is_left"), struct(col("value"))))
        .withColumn("firstRow", first(col("tagged"), ignoreNulls = true).over(w))
        .filter(col("is_left"))
        .select(col("event_id"), col("firstRow.value").as("v")).collect()
        .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
      assert(native == ref, s"seed $seed diverged")
    }
  }

  test("tolerance nulls a nearest match that is too far away") {
    import spark.implicits._
    val left = Seq(
      (100L, 1L, ts(10000000L)), // last prior view 2s earlier: within tol
      (101L, 2L, ts(10000000L))  // last prior view 8s earlier: outside tol
    ).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (10L, 1L, ts(8000000L), 1.0),
      (11L, 2L, ts(2000000L), 2.0),
      (12L, 2L, ts(1000000L), 3.0) // even farther: must NOT be substituted
    ).toDF("event_id", "user_id", "ts", "value")
    val out = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v",
      tolerance = Some(5000000L)) // 5 s in micros
      .select(col("event_id"), col("v")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toMap
    assert(out(100L) == Some(1.0))
    assert(out(101L) == None, "a too-far nearest row must yield NULL, not an older row")
  }

  test("tolerance composes with the forward direction") {
    import spark.implicits._
    val left = Seq((50L, 1L, ts(1000000L))).toDF("event_id", "user_id", "ts")
    val right = Seq(
      (60L, 1L, ts(9000000L), 7.0) // first after, but 8s away
    ).toDF("event_id", "user_id", "ts", "value")
    val near = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v",
      direction = "forward", tolerance = Some(10000000L)).collect()
    assert(near.length == 1 && near(0).getDouble(3) == 7.0)
    val far = AsOfJoin(spark, left, right,
      "user_id", "ts", "event_id", "value", "v",
      direction = "forward", tolerance = Some(5000000L)).collect()
    assert(far.length == 1 && far(0).isNullAt(3))
  }

  test("tolerance on a non-integral time column fails fast") {
    import spark.implicits._
    val left = Seq((1L, 1L, "ta")).toDF("event_id", "user_id", "ts")
    val right = Seq((2L, 1L, "tb", 1.0)).toDF("event_id", "user_id", "ts", "value")
    intercept[IllegalArgumentException] {
      AsOfJoin(spark, left, right,
        "user_id", "ts", "event_id", "value", "v", tolerance = Some(10L))
    }
  }
}
