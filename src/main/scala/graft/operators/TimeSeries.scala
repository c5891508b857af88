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

  // --------------------------------------------------------------- q341

  /** q341: CRAWL POLITENESS SCHEDULER — the frontier stage after q337's
    * canonicalization: fetches against one host must be spaced ≥ D apart,
    * so each fetch's dispatch slot obeys the recurrence
    * `slot_i = max(ts_i, slot_(i-1) + D)`. A literal fold would force a
    * sequential per-host pass; the algebraic rewrite
    * `slot_i − i·D = running_max(ts_j − j·D)` turns it into ONE running-max
    * window per host — O(1) state per row, shuffle-free beyond the single
    * host-keyed exchange, the same non-associative-fold-to-window move as
    * q241's sweep line. Per host: fetch count, total politeness wait the
    * schedule injects, and the makespan tail (how far past the last
    * arrival the queue drains) — the numbers that size a crawler fleet.
    * All integer microseconds; the oracle replays the identical window.
    *
    * Scale: hosts are the natural partition key of a crawl frontier; the
    * window carries one running max, never a buffered group, so a hot
    * host costs memory O(1) — at 100 TB the plan is exactly one exchange
    * + one sorted window pass.
    *
    * The gap D is calibrated to the FIXTURE's per-host arrival density
    * (median inter-arrival ≈ 3,600 s at sf0.01) so queues genuinely form
    * at every test SF — a real crawler runs the same plan with D in
    * seconds; D is a constant in the window expression either way.
    */
  private def q341(s: SparkSession, d: String): DataFrame = {
    val D = 14400000000L // 4 h politeness gap in µs (fixture-calibrated)
    val w = Window.partitionBy(col("host"))
      .orderBy(col("ts_us"), col("event_id"))
    val fetches = Tables.events(s, d)
      .select(col("event_id"), concat(lit("h"), col("user_id") % 20).as("host"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("rn", row_number().over(w).cast(LongType) - 1)
      .withColumn("adj", col("ts_us") - col("rn") * D)
      .withColumn("slot",
        max(col("adj")).over(w.rowsBetween(Window.unboundedPreceding, 0)) +
          col("rn") * D)
    fetches
      .groupBy(col("host"))
      .agg(count(lit(1)).as("n_fetches"),
        // per-row µs→s BEFORE the sum: a backlogged host's waits grow
        // quadratically (Σ i·D), and a µs-summed total overflows Long at
        // ~10M fetches/host — found by the sf10 gauge, not by review
        expr("sum((slot - ts_us) div 1000000)").as("total_wait_s"),
        (max(col("slot")) - max(col("ts_us"))).as("drain_tail_us"))
      .orderBy(col("host"))
  }

  private val q341Sql =
    """WITH f AS (
      |  SELECT event_id, 'h' || (user_id % 20) AS host, epoch_us(ts) AS ts_us
      |  FROM events),
      |r AS (
      |  SELECT host, event_id, ts_us,
      |    ROW_NUMBER() OVER (PARTITION BY host ORDER BY ts_us, event_id) - 1
      |      AS rn
      |  FROM f),
      |sch AS (
      |  SELECT host, ts_us,
      |    MAX(ts_us - rn * 14400000000) OVER (PARTITION BY host
      |      ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      + rn * 14400000000 AS slot
      |  FROM r)
      |SELECT host, CAST(COUNT(*) AS BIGINT) AS n_fetches,
      |  CAST(SUM((slot - ts_us) // 1000000) AS BIGINT) AS total_wait_s,
      |  CAST(MAX(slot) - MAX(ts_us) AS BIGINT) AS drain_tail_us
      |FROM sch GROUP BY host ORDER BY host""".stripMargin

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

  /** q139: SCD2 interval build — the slowly-changing-dimension type-2 view
    * of each user's event-type timeline: consecutive runs of the same state
    * collapse into one row with `[valid_from, valid_to)` validity and a
    * version number; the live row has `valid_to IS NULL`. This is the
    * standard dimension-table construction every warehouse load performs
    * on change streams.
    *
    * Scale: two window passes over ONE user-keyed shuffle (lag to find run
    * starts, lead on the filtered run-start rows for the closing bound) —
    * the second window reuses the first's partitioning, and per-user state
    * is O(1) per pass. The (ts, event_id) composite order makes equal-ts
    * runs deterministic.
    */
  private def q139(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("state"))
      .withColumn("prev_state", lag(col("state"), 1).over(w))
      .filter(col("prev_state").isNull || col("prev_state") =!= col("state"))
      .withColumn("valid_from", col("ts"))
      .withColumn("valid_to", lead(col("ts"), 1).over(w))
      .withColumn("version", row_number().over(w))
      .select(col("user_id"), col("version").cast(LongType).as("version"),
        col("state"), col("valid_from"), col("valid_to"),
        col("valid_to").isNull.as("is_current"))
      .orderBy(col("user_id"), col("version"))
  }

  private val q139Sql =
    """WITH runs AS (
      |  SELECT user_id, ts, event_id, event_type AS state,
      |    LAG(event_type) OVER w AS prev_state
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |starts AS (
      |  SELECT user_id, ts, event_id, state FROM runs
      |  WHERE prev_state IS NULL OR prev_state <> state)
      |SELECT user_id,
      |  CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
      |  state, ts AS valid_from,
      |  LEAD(ts) OVER w AS valid_to,
      |  LEAD(ts) OVER w IS NULL AS is_current
      |FROM starts
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, version""".stripMargin

  /** q140: linear multi-touch attribution — every purchase's value, in
    * integer cents, splits EQUALLY across the user's marketing touches
    * (click/view/signup) in the 30 days before it; the `cents mod n`
    * remainder goes one cent each to the most recent touches so the split
    * is exact and deterministic; purchases with no in-window touch credit
    * 'direct'. Complements q120 (last-touch) with the fan-out model.
    *
    * Scale: the touch×purchase pair join is per-user equi-keyed, and the
    * 30-day lookback bounds its fan-out to the user's activity in one
    * window — the lever that keeps a year of history from going quadratic.
    * All arithmetic is integer cents (associative), so per-channel sums
    * are bit-stable at any partitioning.
    */
  private def q140(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val touches = ev.filter(col("event_type").isin("click", "view", "signup"))
      .select(col("user_id"), col("ts").as("t_ts"), col("event_id").as("t_id"),
        col("event_type").as("channel"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"), col("event_id").as("p_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val pairs = purchases.join(touches, Seq("user_id"))
      .filter((col("t_ts") < col("p_ts") ||
        (col("t_ts") === col("p_ts") && col("t_id") < col("p_id"))) &&
        col("t_ts") >= col("p_ts") - expr("INTERVAL 30 DAYS"))
    val w = Window.partitionBy(col("p_id"))
      .orderBy(desc("t_ts"), desc("t_id"))
    val credited = pairs
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("p_id"))))
      .withColumn("r", row_number().over(w))
      .select(col("channel"),
        (expr("cents div n") +
          when(col("r") <= col("cents") % col("n"), 1L).otherwise(0L))
          .as("credit"))
    val direct = purchases.join(
        pairs.select(col("p_id").as("touched_id")).distinct(),
        col("p_id") === col("touched_id"), "left_anti")
      .select(lit("direct").as("channel"), col("cents").as("credit"))
    // cents totals stay far under 2^53, so the final double division by
    // 100 is IEEE-exact and engine-identical
    credited.union(direct)
      .groupBy(col("channel"))
      .agg(count(lit(1)).as("n_credits"),
        (sum(col("credit")).cast(DoubleType) / 100).as("attributed"))
      .orderBy(col("channel"))
  }

  private val q140Sql =
    """WITH touches AS (
      |  SELECT user_id, ts AS t_ts, event_id AS t_id, event_type AS channel
      |  FROM events WHERE event_type IN ('click', 'view', 'signup')),
      |purchases AS (
      |  SELECT user_id, ts AS p_ts, event_id AS p_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |pairs AS (
      |  SELECT p.p_id, p.cents, t.channel, t.t_ts, t.t_id
      |  FROM purchases p JOIN touches t ON p.user_id = t.user_id
      |  WHERE (t.t_ts < p.p_ts OR (t.t_ts = p.p_ts AND t.t_id < p.p_id))
      |    AND t.t_ts >= p.p_ts - INTERVAL 30 DAY),
      |credited AS (
      |  SELECT channel,
      |    cents // COUNT(*) OVER (PARTITION BY p_id)
      |    + CASE WHEN ROW_NUMBER() OVER
      |             (PARTITION BY p_id ORDER BY t_ts DESC, t_id DESC)
      |           <= cents % COUNT(*) OVER (PARTITION BY p_id)
      |           THEN 1 ELSE 0 END AS credit
      |  FROM pairs),
      |direct AS (
      |  SELECT 'direct' AS channel, cents AS credit FROM purchases
      |  WHERE p_id NOT IN (SELECT p_id FROM pairs)),
      |allc AS (SELECT * FROM credited UNION ALL SELECT * FROM direct)
      |SELECT channel, COUNT(*) AS n_credits,
      |  CAST(SUM(credit) AS DOUBLE) / 100 AS attributed
      |FROM allc GROUP BY 1 ORDER BY 1""".stripMargin

  /** q153: A/B experiment readout — purchase values split by an
    * experiment bucket parsed from the JSON props (`k % 2`), with exact
    * per-variant moments (decimal sums) feeding the Welch t statistic.
    * The analytics-engine staple: assignment comes from event properties,
    * not a column, and significance needs n/mean/variance per arm.
    *
    * Exactness: n, Σx, Σx² are exact decimal/integer aggregates
    * (associative → partition-proof); mean, variance and t are a fixed
    * double formula over those exact inputs, IEEE-identical across
    * engines. Scale: one partial-agg shuffle of 3 numbers per arm.
    */
  private def q153(s: SparkSession, d: String): DataFrame = {
    val x = Exact.money(col("value"))
    val arms = Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select((get_json_object(col("props"), "$.k").cast(LongType) % 2)
        .as("variant"), x.as("x"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).cast(DoubleType).as("sx"),
        sum(col("x") * col("x")).cast(DoubleType).as("sx2"))
      .select(col("variant"), col("n"),
        (col("sx") / col("n")).as("mean"),
        ((col("sx2") - col("sx") * col("sx") / col("n")) / (col("n") - 1))
          .as("variance"))
    val a = arms.filter(col("variant") === 0).select(
      col("n").as("n0"), col("mean").as("mean0"), col("variance").as("var0"))
    val b = arms.filter(col("variant") === 1).select(
      col("n").as("n1"), col("mean").as("mean1"), col("variance").as("var1"))
    a.crossJoin(b).select(
      col("n0"), col("n1"), col("mean0"), col("mean1"),
      ((col("mean1") - col("mean0"))
        / sqrt(col("var0") / col("n0") + col("var1") / col("n1")))
        .as("welch_t"))
  }

  private val q153Sql =
    """WITH arms AS (
      |  SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 2 AS variant,
      |    COUNT(*) AS n,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx,
      |    CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sx2
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1),
      |m AS (
      |  SELECT variant, n, sx / n AS mean,
      |    (sx2 - sx * sx / n) / (n - 1) AS variance
      |  FROM arms)
      |SELECT a.n AS n0, b.n AS n1, a.mean AS mean0, b.mean AS mean1,
      |  (b.mean - a.mean) / sqrt(a.variance / a.n + b.variance / b.n) AS welch_t
      |FROM (SELECT * FROM m WHERE variant = 0) a,
      |     (SELECT * FROM m WHERE variant = 1) b""".stripMargin

  /** q158: time-weighted average (TWAP) — each user's `value` held
    * constant until their next event, integrated over the observation
    * window: Σ valueᵢ·(tᵢ₊₁−tᵢ) / (t_last − t_first). The finance/IoT
    * aggregate where arithmetic means lie (irregular sampling overweights
    * bursts).
    *
    * Exactness: value lifts to integer cents, durations are exact
    * microsecond longs, so the numerator is an associative Σ cents·µs
    * BIGINT fold (max |value|·span ≈ 1e4·2.6e12·65 ≈ 1.7e18 < 2⁶³ per
    * user); one double division at the end. Users with a single event
    * (zero span) are excluded — both engines drop them identically.
    *
    * Scale: one user-keyed shuffle, one lead() pass, O(1) window state.
    */
  private def q158(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, d)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .filter(col("next_ts").isNotNull)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_intervals"),
        sum(col("cents") *
          (unix_micros(col("next_ts")) - unix_micros(col("ts"))))
          .as("weighted_sum"),
        sum(unix_micros(col("next_ts")) - unix_micros(col("ts")))
          .as("total_us"))
      .select(col("user_id"), col("n_intervals"),
        (col("weighted_sum").cast(DoubleType) / col("total_us") / 100)
          .as("twap"))
      .orderBy(col("user_id"))
  }

  private val q158Sql =
    """WITH e AS (
      |  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |iv AS (
      |  SELECT user_id, cents,
      |    epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS dur_us
      |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
      |SELECT user_id, COUNT(*) AS n_intervals,
      |  CAST(CAST(SUM(cents * dur_us) AS BIGINT) AS DOUBLE)
      |    / CAST(SUM(dur_us) AS BIGINT) / 100 AS twap
      |FROM iv WHERE dur_us IS NOT NULL
      |GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q159: survivorship / golden-record merge — duplicate "customer"
    * records (each user's events standing in for record versions)
    * collapsed to one row taking, PER FIELD, the latest non-null value
    * (nullable fields arrive sparsely, so the winner differs per column —
    * the master-data-management rule "most recent non-null wins, field by
    * field"). `max_by` over a null-filtered struct implements each field's
    * rule in one aggregate pass; no window needed.
    *
    * Scale: a single user-keyed partial aggregation; per-field state is
    * one (timestamp, value) pair regardless of version count.
    */
  private def q159(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(col("user_id"),
      col("ts"), col("event_id"),
      // sparse nullable "fields" carved from the event stream
      when(col("event_type") === "purchase", col("value")).as("last_purchase"),
      when(col("event_type") === "click", get_json_object(col("props"), "$.k")
        .cast(LongType)).as("last_click_k"),
      when(col("event_type") === "signup", col("ts")).as("signup_ts"))
    // recency key as a zero-padded sortable string — DuckDB's arg_max
    // cannot order by a struct, and (µs, event_id) padded to fixed width
    // compares identically as text in both engines
    val recency = concat(
      lpad(unix_micros(col("ts")).cast(StringType), 20, "0"),
      lpad(col("event_id").cast(StringType), 20, "0"))
    ev.groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_versions"),
        max_by(col("last_purchase"),
          when(col("last_purchase").isNotNull, recency)).as("last_purchase"),
        max_by(col("last_click_k"),
          when(col("last_click_k").isNotNull, recency)).as("last_click_k"),
        max(col("signup_ts")).as("signup_ts"))
      .orderBy(col("user_id"))
  }

  private val q159Sql =
    """WITH e AS (
      |  SELECT user_id, event_type, value, props, ts,
      |    lpad(CAST(epoch_us(CAST(ts AS TIMESTAMP)) AS VARCHAR), 20, '0')
      |      || lpad(CAST(event_id AS VARCHAR), 20, '0') AS recency
      |  FROM events)
      |SELECT user_id, COUNT(*) AS n_versions,
      |  arg_max(CASE WHEN event_type = 'purchase' THEN value END,
      |    CASE WHEN event_type = 'purchase' THEN recency END)
      |    AS last_purchase,
      |  arg_max(CASE WHEN event_type = 'click'
      |               THEN CAST(json_extract(props, '$.k') AS BIGINT) END,
      |    CASE WHEN event_type = 'click' THEN recency END)
      |    AS last_click_k,
      |  MAX(CASE WHEN event_type = 'signup' THEN CAST(ts AS TIMESTAMP) END)
      |    AS signup_ts
      |FROM e GROUP BY user_id ORDER BY user_id""".stripMargin

  /** q163: volume-anomaly detection — days whose event count sits more
    * than 2σ from that type's daily mean. The z-test is spelled ENTIRELY
    * in integers: z² > 4 ⟺ (n·D − S)² > 4·(S2·D − S²) after clearing
    * denominators (S = Σn, S2 = Σn², D = days), so the flag can never
    * waver on a float rounding; the reported z²·10⁶ is the same exact
    * ratio scaled. The monitoring query every event pipeline runs.
    *
    * Scale: daily counts are one (type, day) partial agg; the per-type
    * moments are a second tiny agg joined back broadcast-small. Headroom:
    * the cleared-denominator products stay inside int64 up to ~10⁶ events
    * per (type, day); past that, lift S/S2 to DECIMAL(38,0) — the
    * inequality is unchanged.
    */
  private def q163(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).as("n"))
    val moments = daily.groupBy(col("event_type"))
      .agg(count(lit(1)).as("dd"), sum(col("n")).as("ss"),
        sum(col("n") * col("n")).as("s2"))
    daily.join(moments, "event_type")
      .filter((col("n") * col("dd") - col("ss")) *
        (col("n") * col("dd") - col("ss")) >
        lit(4L) * (col("s2") * col("dd") - col("ss") * col("ss")))
      .select(col("event_type"), col("day"), col("n"),
        expr("((n * dd - ss) * (n * dd - ss) * 1000000L) div (s2 * dd - ss * ss)")
          .as("z2_ppm"))
      .orderBy(col("event_type"), col("day"))
  }

  private val q163Sql =
    """WITH daily AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      |  FROM events GROUP BY 1, 2),
      |m AS (
      |  SELECT event_type, COUNT(*) AS dd, CAST(SUM(n) AS BIGINT) AS ss,
      |    CAST(SUM(n * n) AS BIGINT) AS s2
      |  FROM daily GROUP BY 1)
      |SELECT d.event_type, d.day, d.n,
      |  ((d.n * m.dd - m.ss) * (d.n * m.dd - m.ss) * 1000000)
      |    // (m.s2 * m.dd - m.ss * m.ss) AS z2_ppm
      |FROM daily d JOIN m ON d.event_type = m.event_type
      |WHERE (d.n * m.dd - m.ss) * (d.n * m.dd - m.ss)
      |      > 4 * (m.s2 * m.dd - m.ss * m.ss)
      |ORDER BY d.event_type, d.day""".stripMargin

  /** q164: conversion-latency profile — per signup-week cohort, the
    * p50/p90 of time from signup to the user's FIRST subsequent purchase
    * (exact µs durations; converters only). `percentile_cont`
    * interpolation parity is pinned by q129; the double interpolation on
    * exact integer inputs is bit-identical across engines.
    *
    * Scale: two user-keyed aggregations (first signup, first purchase
    * after it) and a cohort-sized percentile — the per-cohort duration
    * lists stay bounded by cohort membership, and at unbounded scale the
    * exact percentile swaps for q114's mergeable histogram.
    */
  private def q164(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val signups = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("p_ts"))
    val conv = signups.join(purchases, "user_id")
      .filter(col("p_ts") >= col("signup_ts"))
      .groupBy(col("user_id"), col("signup_ts"))
      .agg(min(col("p_ts")).as("first_p"))
      .select(to_date(date_trunc("week", col("signup_ts"))).as("cohort_week"),
        (unix_micros(col("first_p")) - unix_micros(col("signup_ts")))
          .as("delay_us"))
    conv.createOrReplaceTempView("conv_delays")
    // percentile_cont WITHIN GROUP — the q129-pinned interpolation parity
    s.sql(
      """SELECT cohort_week, COUNT(*) AS n_converted,
        |  percentile_cont(0.5) WITHIN GROUP (ORDER BY delay_us) AS p50_us,
        |  percentile_cont(0.9) WITHIN GROUP (ORDER BY delay_us) AS p90_us
        |FROM conv_delays GROUP BY cohort_week ORDER BY cohort_week""".stripMargin)
  }

  private val q164Sql =
    """WITH s AS (
      |  SELECT user_id, MIN(CAST(ts AS TIMESTAMP)) AS signup_ts
      |  FROM events WHERE event_type = 'signup' GROUP BY 1),
      |conv AS (
      |  SELECT s.user_id, s.signup_ts,
      |    MIN(CAST(e.ts AS TIMESTAMP)) AS first_p
      |  FROM s JOIN events e ON e.user_id = s.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) >= s.signup_ts
      |  GROUP BY 1, 2),
      |delays AS (
      |  SELECT CAST(date_trunc('week', signup_ts) AS DATE) AS cohort_week,
      |    epoch_us(first_p) - epoch_us(signup_ts) AS delay_us
      |  FROM conv)
      |SELECT cohort_week, COUNT(*) AS n_converted,
      |  quantile_cont(delay_us, 0.5) AS p50_us,
      |  quantile_cont(delay_us, 0.9) AS p90_us
      |FROM delays GROUP BY 1 ORDER BY 1""".stripMargin

  /** q177: distribution-drift monitor — the training/serving-skew check:
    * order values bucketed into 16 equi-width bins over the GLOBAL range,
    * early era (orderdate < 1997) vs late era compared per bin. The drift
    * score is the cross-multiplied share difference
    * |c_a·N_b − c_b·N_a|·10⁶ div (N_a·N_b) — exact integers, no float
    * near a threshold (headroom: inside int64 to ~2e6 rows per era;
    * DECIMAL past that). The per-bin rows are what a drift dashboard
    * plots; alerting sums them.
    *
    * Scale: two partial-agg shuffles of (bin, era) pairs — 32 rows of
    * reducer state; the global bounds are a 1-row broadcast.
    */
  private def q177(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
      (year(to_date(col("o_orderdate"))) < 1997).as("early"))
    val bounds = o.agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
    val binned = o.crossJoin(broadcast(bounds))
      .select(expr("((cents - lo) * 16) div (hi - lo + 1)").as("bin"),
        col("early"))
    val counts = binned.groupBy(col("bin"))
      .agg(sum(when(col("early"), 1L).otherwise(0L)).as("ca"),
        sum(when(!col("early"), 1L).otherwise(0L)).as("cb"))
    val totals = counts.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
    counts.crossJoin(broadcast(totals))
      .select(col("bin"), col("ca"), col("cb"),
        expr("abs(ca * nb - cb * na) * 1000000L div (na * nb)")
          .as("drift_ppm"))
      .orderBy(col("bin"))
  }

  private val q177Sql =
    """WITH o AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    year(CAST(o_orderdate AS DATE)) < 1997 AS early
      |  FROM orders),
      |bounds AS (SELECT MIN(cents) AS lo, MAX(cents) AS hi FROM o),
      |b AS (
      |  SELECT ((cents - lo) * 16) // (hi - lo + 1) AS bin, early
      |  FROM o, bounds),
      |c AS (
      |  SELECT bin,
      |    CAST(SUM(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS ca,
      |    CAST(SUM(CASE WHEN NOT early THEN 1 ELSE 0 END) AS BIGINT) AS cb
      |  FROM b GROUP BY 1),
      |t AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
      |             CAST(SUM(cb) AS BIGINT) AS nb FROM c)
      |SELECT bin, ca, cb,
      |  abs(ca * nb - cb * na) * 1000000 // (na * nb) AS drift_ppm
      |FROM c, t ORDER BY bin""".stripMargin

  /** q181: symbolic motif mining (SAX-style) — each priority's
    * daily-revenue series quantized to 4 symbols by WITHIN-SERIES revenue
    * rank quartiles (ntile with a day tie-break — integer-exact, where
    * classic SAX's z-normalization would put floats next to breakpoints),
    * then every 3-day symbol trigram counted across series and ranked:
    * the repeated-shape detector behind time-series indexing.
    *
    * Scale: the series relation is (priorities × days) — already tiny
    * after one partial-agg shuffle; both windows partition by series.
    */
  private def q181(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("prio"),
        to_date(col("o_orderdate")).as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val byVal = Window.partitionBy(col("prio")).orderBy(col("cents"), col("day"))
    val byDay = Window.partitionBy(col("prio")).orderBy(col("day"))
    daily
      .withColumn("sym", ntile(4).over(byVal))
      .withColumn("m2", lead(col("sym"), 1).over(byDay))
      .withColumn("m3", lead(col("sym"), 2).over(byDay))
      .filter(col("m3").isNotNull)
      .groupBy(concat_ws("", col("sym"), col("m2"), col("m3")).as("motif"))
      .agg(count(lit(1)).as("n_windows"))
      .orderBy(desc("n_windows"), col("motif"))
      .limit(10)
  }

  private val q181Sql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1, 2),
      |sym AS (
      |  SELECT prio, day,
      |    NTILE(4) OVER (PARTITION BY prio ORDER BY cents, day) AS sym
      |  FROM daily),
      |tri AS (
      |  SELECT sym,
      |    LEAD(sym, 1) OVER w AS m2, LEAD(sym, 2) OVER w AS m3
      |  FROM sym WINDOW w AS (PARTITION BY prio ORDER BY day))
      |SELECT CAST(sym AS VARCHAR) || CAST(m2 AS VARCHAR)
      |    || CAST(m3 AS VARCHAR) AS motif,
      |  COUNT(*) AS n_windows
      |FROM tri WHERE m3 IS NOT NULL
      |GROUP BY 1 ORDER BY n_windows DESC, motif LIMIT 10""".stripMargin

  // --------------------------------------------------------------- q241

  /** q241: INTERVAL CONCURRENCY via the sweep line — how many 5-minute
    * event intervals overlap at once, per event type (the "peak
    * concurrent sessions/jobs/streams" question every capacity audit
    * asks). The naive spelling self-joins intervals on overlap — Θ(n²)
    * per hot window; the sweep line converts each interval to a +1/−1
    * delta, sorts once per type, and reads the peak off a running sum —
    * one exchange, O(n log n), the classic event-calculus rewrite. At
    * equal timestamps ends process BEFORE starts (delta ascending), the
    * closed-open [ts, ts+5m) convention, so back-to-back intervals never
    * count as concurrent — pinned by both engines computing identical
    * peaks.
    *
    * Scale: one (type)-keyed exchange carrying 2 rows per event; the
    * running sum rides a single sort. With a skewed type, the sweep
    * still beats the join — salting splits the TIME RANGE, not the key,
    * and per-range peaks merge with boundary offsets (the standard
    * parallel-sweep refinement, not needed at these volumes).
    */
  private def q241(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts"),
        (col("ts") + expr("interval 5 minutes")).as("te"))
    val deltas = ev.select(col("event_type"), col("ts").as("t"), lit(1L).as("delta"))
      .unionAll(ev.select(col("event_type"), col("te").as("t"),
        lit(-1L).as("delta")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("t"), col("delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas
      .withColumn("conc", sum(col("delta")).over(w))
      .groupBy(col("event_type"))
      .agg((count(lit(1)) / 2).cast(LongType).as("n_events"),
        max(col("conc")).as("max_concurrency"))
      .orderBy(col("event_type"))
  }

  private val q241Sql =
    """WITH ev AS (
      |  SELECT event_type, CAST(ts AS TIMESTAMP) AS ts,
      |    CAST(ts AS TIMESTAMP) + INTERVAL 5 MINUTE AS te
      |  FROM events),
      |deltas AS (
      |  SELECT event_type, ts AS t, CAST(1 AS BIGINT) AS delta FROM ev
      |  UNION ALL
      |  SELECT event_type, te, -1 FROM ev),
      |sw AS (
      |  SELECT event_type,
      |    SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS conc
      |  FROM deltas)
      |SELECT event_type, CAST(COUNT(*) / 2 AS BIGINT) AS n_events,
      |  CAST(MAX(conc) AS BIGINT) AS max_concurrency
      |FROM sw GROUP BY 1 ORDER BY 1""".stripMargin

  // --------------------------------------------------------------- q379

  /** q379: EXPONENTIALLY-DECAYED FRESHNESS SCORE — the recency-weighted
    * value a crawl scheduler or feature store keeps per key ("how much
    * recent signal does this source still carry"), computed so a
    * distributed run and the single-threaded oracle agree BIT-FOR-BIT.
    * The trap: `sum(value * exp(-λ·age))` is a floating sum whose result
    * depends on partial-aggregation order (and libm's exp differs by
    * ulps across engines). The discipline: quantize age to half-life
    * buckets (k = age-in-weeks, clamped to 4 — a 5-level decay ladder),
    * sum each bucket EXACTLY in decimal, and combine the ≤5 bucket sums
    * in ONE fixed-order expression `S₀ + S₁·2⁻¹ + … + S₄·2⁻⁴` — powers
    * of two are exactly representable, the per-bucket casts stay under
    * 2⁵³, and five IEEE ops in a written-down order are deterministic
    * everywhere. `now` is the table's max event date (deterministic
    * replay, no wall clock).
    *
    * Scale: state per group is FIVE decimal cells regardless of row
    * count — the decay ladder rides any partial-agg tree unchanged;
    * contrast with a per-row exp() sum, which at 1000 executors is
    * nondeterministic run to run. Same trick serves TTL-weighted counts
    * and half-life popularity ranking.
    */
  private def q379(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d)
      .select(col("event_type"), col("ts"), Exact.money(col("value")).as("v"))
    val mx = e.agg(max(to_date(col("ts"))).as("mxd"))
    val withK = e.crossJoin(broadcast(mx))
      .withColumn("k", least(
        floor(datediff(col("mxd"), to_date(col("ts"))) / 7), lit(4L)))
    val buckets = (0 to 4).map(i =>
      coalesce(sum(when(col("k") === i, col("v"))),
        lit(0).cast(Exact.Money)).as(s"s$i"))
    val score = (0 to 4).map(i =>
      col(s"s$i").cast(DoubleType) * lit(math.pow(2, -i))).reduce(_ + _)
    withK.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"), buckets: _*)
      .select(col("event_type"), col("n_events"),
        score.as("decayed_total"),
        (col("s0") + col("s1") + col("s2") + col("s3") + col("s4"))
          .cast(DoubleType).as("raw_total"))
      .orderBy(col("event_type"))
  }

  private val q379Sql = {
    val sums = (0 to 4).map(i =>
      s"COALESCE(SUM(CASE WHEN k = $i THEN v END), 0) AS s$i").mkString(", ")
    val score = (0 to 4).map(i =>
      s"CAST(s$i AS DOUBLE) * ${math.pow(2, -i)}").mkString(" + ")
    s"""WITH e AS (
       |  SELECT event_type, CAST(value AS DECIMAL(18,2)) AS v,
       |    LEAST(datediff('day',
       |      CAST(ts AS DATE),
       |      (SELECT MAX(CAST(ts AS DATE)) FROM events)) // 7, 4) AS k
       |  FROM events),
       |g AS (
       |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events, $sums
       |  FROM e GROUP BY 1)
       |SELECT event_type, n_events, $score AS decayed_total,
       |  CAST(s0 + s1 + s2 + s3 + s4 AS DOUBLE) AS raw_total
       |FROM g ORDER BY event_type""".stripMargin
  }

  // --------------------------------------------------------------- q402

  /** q402: ROW-PATTERN MATCHING (MATCH_RECOGNIZE essence) — SQL:2016's
    * one-pass DFA over ordered rows, which Spark lacks as a statement:
    * per user, events ordered by (ts, event_id) are reduced to delta
    * signs and a 4-state machine counts NON-OVERLAPPING V-shapes
    * (PATTERN (D D+ U U+): two-or-more falls then two-or-more rises —
    * the dip-and-recovery motif behind churn saves and incident
    * postmortems). The DFA is an explicit left fold over the group's
    * SORTED ITERATOR (`flatMapSortedGroups`, the q130/q180 rung:
    * Spark's shuffle sorts (ts, event_id) within partitions and hands
    * the function an ordered stream — a struct-typed `list_reduce` in
    * the oracle) — same transitions, same order, integer state only —
    * so the match counts hash-match; a plateau (delta 0) resets, a fall
    * after the first rise starts the next candidate (greedy, consuming
    * — the standard AFTER MATCH SKIP PAST LAST ROW).
    *
    * Scale: O(1) state per user — NOTHING is collected (r11 verdict #4
    * retired the `collect_list` spelling, which was bounded only by the
    * data model's events-per-user invariance; Round12Spec pins
    * CollectList out of the plan). A billion users cost one
    * (user)-keyed exchange with sort-within-partitions, the same shape
    * as sessionization; a single user with a billion events streams
    * through the fold without materializing.
    */
  private def q402(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .as[(Long, Long, Long, Double)]
      .groupByKey(_._1)
      .flatMapSortedGroups(col("ts_us"), col("event_id")) { (uid, it) =>
        // states: 0 start/reset, 1 one fall, 2 ≥2 falls, 3 ≥2 falls + 1
        // rise; a rise at 3 completes PATTERN (D D+ U U+) — count, reset
        var st = 0; var cnt = 0L; var prev = 0.0; var seen = false
        it.foreach { case (_, _, _, v) =>
          if (seen) {
            if (v == prev) st = 0
            else if (v < prev) st = if (st == 1 || st == 2) 2 else 1
            else if (st == 3) { st = 0; cnt += 1L }
            else if (st == 2) st = 3
            else st = 0
          }
          prev = v; seen = true
        }
        Iterator.single((uid, cnt))
      }
      .toDF("user_id", "matches")
      .groupBy((col("user_id") % 4).as("cohort"))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("matches") > 0, 1L).otherwise(0L))
          .as("users_with_match"),
        sum(col("matches")).as("total_matches"),
        max(col("matches")).as("max_matches"))
      .orderBy(col("cohort"))
  }

  private val q402Sql =
    """WITH pu AS (
      |  SELECT user_id, list(value ORDER BY ts, event_id) AS vs
      |  FROM events GROUP BY user_id),
      |dl AS (
      |  SELECT user_id,
      |    [{'st': 0, 'cnt': CAST(0 AS BIGINT),
      |      'd': CASE WHEN vs[i+1] > vs[i] THEN 1
      |                WHEN vs[i+1] < vs[i] THEN -1 ELSE 0 END}
      |     FOR i IN range(1, len(vs))] AS deltas
      |  FROM pu),
      |m AS (
      |  SELECT user_id,
      |    list_reduce(
      |      list_prepend({'st': 0, 'cnt': CAST(0 AS BIGINT), 'd': 0},
      |        deltas),
      |      (a, x) -> CASE
      |        WHEN x.d = 0 THEN {'st': 0, 'cnt': a.cnt, 'd': 0}
      |        WHEN x.d < 0 THEN {'st': CASE WHEN a.st = 1 OR a.st = 2
      |          THEN 2 ELSE 1 END, 'cnt': a.cnt, 'd': 0}
      |        WHEN a.st = 3 THEN
      |          {'st': 0, 'cnt': a.cnt + CAST(1 AS BIGINT), 'd': 0}
      |        WHEN a.st = 2 THEN {'st': 3, 'cnt': a.cnt, 'd': 0}
      |        ELSE {'st': 0, 'cnt': a.cnt, 'd': 0} END).cnt AS matches
      |  FROM dl)
      |SELECT user_id % 4 AS cohort, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(CASE WHEN matches > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS users_with_match,
      |  CAST(SUM(matches) AS BIGINT) AS total_matches,
      |  CAST(MAX(matches) AS BIGINT) AS max_matches
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  override def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q402_match_recognize" -> q402,
    "q379_freshness_decay" -> q379,
    "q241_max_concurrency" -> q241,
    "q181_sax_motifs" -> q181,
    "q177_distribution_drift" -> q177,
    "q163_volume_anomaly" -> q163,
    "q341_politeness_schedule" -> q341,
    "q164_conversion_latency" -> q164,
    "q158_twap" -> q158,
    "q159_survivorship" -> q159,
    "q153_ab_welch" -> q153,
    "q123_gapfill_ffill" -> q123,
    "q124_retention_cohorts" -> q124,
    "q139_scd2_intervals" -> q139,
    "q140_linear_attribution" -> q140
  )

  override def oracles: Map[String, String] = Map(
    "q402_match_recognize" -> q402Sql,
    "q379_freshness_decay" -> q379Sql,
    "q241_max_concurrency" -> q241Sql,
    "q181_sax_motifs" -> q181Sql,
    "q177_distribution_drift" -> q177Sql,
    "q163_volume_anomaly" -> q163Sql,
    "q341_politeness_schedule" -> q341Sql,
    "q164_conversion_latency" -> q164Sql,
    "q158_twap" -> q158Sql,
    "q159_survivorship" -> q159Sql,
    "q153_ab_welch" -> q153Sql,
    "q123_gapfill_ffill" -> q123Sql,
    "q124_retention_cohorts" -> q124Sql,
    "q139_scd2_intervals" -> q139Sql,
    "q140_linear_attribution" -> q140Sql
  )
}
