package graft.operators

import graft.{Exact, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Time-series reshaping — SURVEY.md §2.5/§2.8 extensions ([S]; the
  * reference has no time-series concept, but any analytics engine over
  * event/order streams needs a dense-calendar view and cohort analysis).
  *
  * Scale note: both queries aggregate the fact table FIRST (one shuffle on
  * a bounded key), then do all calendar/cohort work on the aggregate —
  * O(days × groups) / O(users) rows — never on raw facts. The generated
  * date spine is driver-free: `sequence()` + `explode` from a 1-row bounds
  * aggregate, so the calendar never materializes outside the plan.
  */
object TimeSeries extends QueryModule {

  /** q123: calendar gap-fill + forward-fill — the dense daily revenue view
    * per order priority. Missing days are manufactured from a generated
    * date spine (`sequence(min_day, max_day)` exploded, cross-joined with
    * the tiny priority dim) and carry the last seen revenue forward (0
    * before the first observation).
    *
    * Exactness: daily revenue stays DECIMAL through the left join and the
    * forward-fill window; the DOUBLE cast happens per output row only —
    * so no double addition ever happens and partitioning cannot change a
    * bit. The ffill window partitions by priority (5 partitions × O(days)
    * rows — bounded regardless of fact-table size).
    */
  private def q123(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderpriority").as("prio"),
      to_date(col("o_orderdate")).as("day"),
      col("o_totalprice"))
    val daily = o.groupBy(col("prio"), col("day"))
      .agg(sum(Exact.money(col("o_totalprice"))).as("rev"))
    val spine = o.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1, interval 1 day)")).as("day"))
    val grid = spine.crossJoin(o.select(col("prio")).distinct())
    val w = Window.partitionBy(col("prio")).orderBy(col("day"))
    grid.join(daily, Seq("prio", "day"), "left")
      .withColumn("ff", last(col("rev"), ignoreNulls = true).over(w))
      .select(col("prio"), col("day"),
        coalesce(col("ff"), lit(0)).cast(DoubleType).as("rev"),
        col("rev").isNull.cast(LongType).as("is_gap"))
      .orderBy(col("prio"), col("day"))
  }

  private val q123Sql =
    """WITH o AS (
      |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
      |         o_totalprice
      |  FROM orders),
      |daily AS (
      |  SELECT prio, day, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
      |  FROM o GROUP BY 1, 2),
      |spine AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      |  FROM (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM o)),
      |grid AS (SELECT p.prio, s.day FROM (SELECT DISTINCT prio FROM o) p, spine s),
      |f AS (
      |  SELECT g.prio, g.day, d.rev AS raw,
      |    LAST_VALUE(d.rev IGNORE NULLS)
      |      OVER (PARTITION BY g.prio ORDER BY g.day) AS ff
      |  FROM grid g LEFT JOIN daily d ON g.prio = d.prio AND g.day = d.day)
      |SELECT prio, day, CAST(COALESCE(ff, 0) AS DOUBLE) AS rev,
      |  CAST(raw IS NULL AS BIGINT) AS is_gap
      |FROM f ORDER BY prio, day""".stripMargin

  /** q124: retention cohorts — users grouped by their first-activity week
    * (the cohort), counted as active per whole weeks elapsed since. The
    * classic triangle matrix behind every retention dashboard.
    *
    * Scale: per-user first-week is one partial-aggregated shuffle on
    * user_id; the join back to events co-shuffles on the same key (no
    * broadcast needed — both sides are user-keyed, AQE can pick either);
    * the final distinct-count shuffles once more on the tiny
    * (cohort, offset) key. Nothing holds more than O(events-per-user)
    * per task.
    */
  private def q124(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("user_id"),
      to_date(date_trunc("week", col("ts"))).as("week"))
    val cohorts = ev.groupBy(col("user_id"))
      .agg(min(col("week")).as("cohort_week"))
    ev.join(cohorts, "user_id")
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7)
          .cast(LongType).as("offset_weeks"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("offset_weeks"))
  }

  private val q124Sql =
    """WITH ev AS (
      |  SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      |  FROM events),
      |cohorts AS (
      |  SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1)
      |SELECT c.cohort_week,
      |  CAST((ev.week - c.cohort_week) / 7 AS BIGINT) AS offset_weeks,
      |  CAST(COUNT(DISTINCT ev.user_id) AS BIGINT) AS n_active
      |FROM ev JOIN cohorts c USING (user_id)
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q123_gapfill_ffill" -> q123,
    "q124_retention_cohorts" -> q124
  )

  override def oracles: Map[String, String] = Map(
    "q123_gapfill_ffill" -> q123Sql,
    "q124_retention_cohorts" -> q124Sql
  )
}
