package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

import graft.Tables

/** Batch analytics over the `events` table: sessionization, JSON
  * property extraction, time-window rollups. These are the batch twins
  * of the Structured Streaming operators in [[graft.streaming]] — same
  * semantics, bounded input.
  *
  * Scale: sessionization shuffles once on user_id (the window partition
  * key); both aggregations are partial-aggregated before their single
  * shuffle. Timestamps reduce to epoch seconds for gap math so the plan
  * stays codegen-friendly.
  */
object EventsAnalytics {

  val SessionGapSeconds = 1800L

  private def moneySum(c: org.apache.spark.sql.Column) =
    coalesce(sum(c.cast(DecimalType(18, 2))).cast(DoubleType), lit(0.0))

  // ---------------------------------------------------------------------
  // e01 — gap-based sessionization: a new session starts after >30 min of
  // user inactivity. lag → flag → running sum is the classic formulation;
  // (ts, event_id) is a unique total order within each user partition.
  // ---------------------------------------------------------------------
  /** Gap-based sessionization over ANY (user_id, event_id, ts, value)
    * frame. */
  def sessionize(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val gap = col("ts").cast("long") - lag(col("ts"), 1).over(w).cast("long")
    events
      .withColumn("new_s", when(gap.isNull || gap > SessionGapSeconds, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"),
        (max(col("ts").cast("long")) - min(col("ts").cast("long"))).as("duration_s"),
        moneySum(col("value")).as("total_value"))
      .orderBy(col("user_id").asc, col("session_idx").asc)
  }

  def e01Sessionize(spark: SparkSession, dir: String): DataFrame =
    sessionize(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e02 — JSON property stats: extract props.k per event, roll up per
  // event type. get_json_object is a codegen'd scalar path — no UDF.
  // ---------------------------------------------------------------------
  /** JSON property stats over ANY (event_type, user_id, props, value)
    * frame. */
  def propsStats(events: DataFrame): DataFrame = {
    val k = get_json_object(col("props"), "$.k").cast("int")
    events
      .groupBy(col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        min(k).as("min_k"),
        max(k).as("max_k"),
        sum(k.cast("long")).as("sum_k"),
        moneySum(col("value")).as("total_value"))
      .orderBy(col("event_type").asc)
  }

  def e02PropsStats(spark: SparkSession, dir: String): DataFrame =
    propsStats(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e03 — tumbling-hour rollup per event type: the batch equivalent of a
  // streaming windowed aggregation (date_trunc = tumbling window assign).
  // ---------------------------------------------------------------------
  /** Tumbling-hour rollup over ANY (ts, event_type, user_id, value)
    * frame. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events
      .groupBy(date_trunc("HOUR", col("ts")).as("hour_start"), col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        moneySum(col("value")).as("total_value"))
      .orderBy(col("hour_start").asc, col("event_type").asc)

  def e03HourlyAgg(spark: SparkSession, dir: String): DataFrame =
    hourlyAgg(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e04 — ordered funnel (view → click → purchase): per user, the stages
  // completed IN ORDER (each stage's first occurrence must follow the
  // previous stage's first occurrence). One groupBy computes all three
  // first-occurrence timestamps; funnel depth is a pure projection.
  // ---------------------------------------------------------------------
  /** Ordered funnel over ANY (user_id, event_type, ts) frame. */
  def funnel(events: DataFrame): DataFrame = {
    val firstOf = (t: String) => min(when(col("event_type") === t, col("ts")))
    val perUser = events
      .groupBy(col("user_id"))
      .agg(firstOf("view").as("t_view"), firstOf("click").as("t_click"),
        firstOf("purchase").as("t_purchase"))
    val depth = when(col("t_view").isNull, 0)
      .when(col("t_click").isNull || col("t_click") < col("t_view"), 1)
      .when(col("t_purchase").isNull || col("t_purchase") < col("t_click"), 2)
      .otherwise(3)
    perUser.select(col("user_id"), depth.as("funnel_depth"))
      .groupBy(col("funnel_depth"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("funnel_depth").asc)
  }

  def e04Funnel(spark: SparkSession, dir: String): DataFrame =
    funnel(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e05 — cohort retention: users grouped by first-activity week, counted
  // in each later week they return. Two aggregations over one scan
  // (first-activity via window-min carried on the activity rows), then
  // the classic cohort × week-offset matrix in long form.
  // ---------------------------------------------------------------------
  /** Cohort retention over ANY (user_id, ts) frame. */
  def retention(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), date_trunc("WEEK", col("ts")).cast("date").as("week"))
      .distinct()
    val firstWeek = ev.groupBy(col("user_id")).agg(min(col("week")).as("cohort_week"))
    ev.join(firstWeek, Seq("user_id"))
      .groupBy(col("cohort_week"),
        (datediff(col("week"), col("cohort_week")) / 7).cast("int").as("weeks_since"))
      .agg(countDistinct(col("user_id")).as("n_users"))
      .orderBy(col("cohort_week").asc, col("weeks_since").asc)
  }

  def e05Retention(spark: SparkSession, dir: String): DataFrame =
    retention(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e06 — hourly anomaly detection: flag hours whose event count exceeds
  // 2× the trailing mean of the 24 previous observed hours (ROWS frame
  // over the hourly rollup, so gap hours with zero events don't emit
  // rows and aren't averaged). The window partitions by event_type and
  // its length is bounded by the corpus TIME RANGE (hours), not data
  // volume — the pre-aggregation shrinks 100 TB of raw events to one row
  // per (type, hour) before any window runs. The ratio is built from
  // exact integer window sums with a single fixed-shape double
  // expression, so both engines agree bitwise.
  // ---------------------------------------------------------------------
  val TrailHours = 24

  /** Hourly anomaly detection over ANY (event_type, ts) frame. */
  def hourlyAnomaly(events: DataFrame): DataFrame = {
    val hourly = events
      .groupBy(col("event_type"), date_trunc("HOUR", col("ts")).as("hour_start"))
      .agg(count(lit(1)).as("n_events"))
    val trail = Window.partitionBy(col("event_type")).orderBy(col("hour_start").asc)
      .rowsBetween(-TrailHours, -1)
    hourly
      .withColumn("trail_hours", count(lit(1)).over(trail))
      .withColumn("trail_events", sum(col("n_events")).over(trail))
      .where(col("trail_hours") === TrailHours) // full-history hours only
      .withColumn("ratio",
        col("n_events").cast(DoubleType) * col("trail_hours") / col("trail_events"))
      .select(col("event_type"), col("hour_start"), col("n_events"),
        col("trail_events"), col("ratio"), (col("ratio") > 2.0).as("is_spike"))
      .orderBy(col("event_type").asc, col("hour_start").asc)
  }

  def e06HourlyAnomaly(spark: SparkSession, dir: String): DataFrame =
    hourlyAnomaly(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e07 — the STREAMING windowed-count transform, driven in batch mode:
  // graft.streaming.EventStreams.windowedCounts is one function over both
  // execution modes (the Structured Streaming model), so the oracle row
  // exercises the exact code path the incremental query runs — watermark
  // declaration, window() bucketing, decimal-accumulated totals — with
  // DuckDB recomputing the tumbling hour windows relationally.
  // ---------------------------------------------------------------------
  def e07WindowedCounts(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.windowedCounts(Tables.load(spark, dir, "events"))
      .orderBy(col("window_start").asc, col("event_type").asc)

  // ---------------------------------------------------------------------
  // e08 — the streaming SLIDING-window transform in batch mode: every
  // event lands in window/slide = 6 overlapping hour windows. The DuckDB
  // oracle rebuilds Spark's epoch-aligned window grid relationally (6
  // slide offsets per event), pinned to plain TIMESTAMP arithmetic off
  // the day boundary so no timezone type sneaks in.
  // ---------------------------------------------------------------------
  def e08SlidingCounts(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.EventStreams.slidingRate(Tables.load(spark, dir, "events"))
      .orderBy(col("window_start").asc, col("event_type").asc)

  // ---------------------------------------------------------------------
  // e09 — AS-OF attribution join: each purchase is attributed to the
  // LATEST click by the same user at or before it, if within a 1-hour
  // horizon — the classic as-of join the reference (and vanilla SQL-92)
  // has no operator for. Composed from primitives Spark executes at
  // scale: a running max over the per-user event order finds each
  // purchase's as-of click TIME (one shuffle on user_id, the e01
  // partition shape — state bounded by per-user activity, not corpus),
  // and one (user_id, ts) equi-join resolves the click's identity
  // (ties at the same timestamp break on min event_id, so both engines
  // agree). No range/theta join anywhere — the naive formulation
  // (clicks ⋈ purchases ON user AND click_ts BETWEEN …) explodes on
  // active users; this one never builds a pair that isn't emitted.
  // ---------------------------------------------------------------------
  val AttributionHorizonSeconds = 3600L

  /** As-of attribution join over ANY (event_id, user_id, ts, event_type)
    * frame. */
  def asofAttribution(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val purchases = events
      .withColumn("last_click_ts",
        max(when(col("event_type") === "click", col("ts"))).over(w))
      .where(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"), col("last_click_ts"))
    val clicks = events.where(col("event_type") === "click")
      .groupBy(col("user_id").as("c_user_id"), col("ts").as("click_ts"))
      .agg(min(col("event_id")).as("click_id"))
    val gap = col("purchase_ts").cast("long") - col("last_click_ts").cast("long")
    val attributed = col("last_click_ts").isNotNull && gap <= AttributionHorizonSeconds
    purchases
      .join(clicks, col("user_id") === col("c_user_id") &&
        col("last_click_ts") === col("click_ts"), "left_outer")
      .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
        when(attributed, col("click_id")).as("click_id"),
        when(attributed, gap).as("gap_s"),
        attributed.as("attributed"))
      .orderBy(col("purchase_id").asc)
  }

  def e09AsofAttribution(spark: SparkSession, dir: String): DataFrame =
    asofAttribution(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e10 — event-transition matrix (first-order Markov model of user
  // behavior): for every (prev_type → event_type) pair, the transition
  // count and conditional probability — the session-flow model behind
  // next-action prediction and bot detection. The per-user lag runs in
  // the e01 partition shape (user_id is high-cardinality, so no few-key
  // window hazard); everything after is an aggregate over ≤ |types|²
  // rows, and the probability is one integer÷integer division both
  // engines evaluate bit-identically (t02 contract).
  // ---------------------------------------------------------------------
  /** Event-transition matrix over ANY (user_id, event_id, ts,
    * event_type) frame. */
  def transitions(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val counts = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .where(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.groupBy(col("prev_type")).agg(sum(col("n")).as("tot"))
    counts.join(broadcast(totals), Seq("prev_type"))
      .select(col("prev_type"), col("event_type"), col("n"),
        (col("n").cast(DoubleType) / col("tot")).as("p"))
      .orderBy(col("prev_type").asc, col("event_type").asc)
  }

  def e10Transitions(spark: SparkSession, dir: String): DataFrame =
    transitions(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e11 — view→purchase conversion lag: per user with at least one view,
  // the first view, the first purchase AT OR AFTER that view, and the
  // lag in seconds — the attribution-latency table a growth pipeline
  // feeds into LTV models. Two aggregations shuffling on the same
  // user_id key (AQE reuses the partitioning); no window over the raw
  // stream is needed at all, so per-task state is one row per user.
  // ---------------------------------------------------------------------
  /** View→purchase conversion lag over ANY (user_id, ts, event_type)
    * frame. */
  def conversionLag(events: DataFrame): DataFrame = {
    val firstView = events.where(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("first_view_ts"))
    val firstPurch = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
      .join(firstView, col("p_user") === col("user_id") &&
        col("p_ts") >= col("first_view_ts"))
      .groupBy(col("p_user")).agg(min(col("p_ts")).as("first_purchase_ts"))
    firstView
      .join(firstPurch, col("user_id") === col("p_user"), "left_outer")
      .select(col("user_id"), col("first_view_ts"), col("first_purchase_ts"),
        (col("first_purchase_ts").cast("long") - col("first_view_ts").cast("long"))
          .as("lag_s"),
        col("first_purchase_ts").isNotNull.as("converted"))
      .orderBy(col("user_id").asc)
  }

  def e11ConversionLag(spark: SparkSession, dir: String): DataFrame =
    conversionLag(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e12 — user behavior profile + bot screen: per-user volume, event-type
  // diversity, top-type concentration, and peak-hour burst, with a
  // rule-based bot flag (hourly burst, or type concentration with enough
  // volume to mean something) — the abuse/automation filter an events
  // feed goes through before it becomes training data. NOTE on the
  // constants: BotBurstPerHour=3 and the ≥1/3-concentration rule are NOT
  // plausible production thresholds (a real screen would use hundreds of
  // events/hour and concentration ≫ 1/3) — they are tuned down solely so
  // BOTH flag branches fire on the small synthetic test corpus and the
  // oracle compare exercises the whole CASE tree; a deployment sets them
  // per feed. Every aggregate keys on user_id (high cardinality — no
  // few-key reducer):
  // two partial-aggregated trees, (user, type) → user and (user, hour) →
  // user, joined on user_id. The flag compares exact BIGINTs
  // (top_n·3 ≥ n_events, not a double ≥ 1/3) so it cannot drift
  // cross-engine; top_share divides once at the end for reporting (t02
  // contract: same BIGINT inputs → bit-identical double).
  // ---------------------------------------------------------------------
  val BotBurstPerHour = 3L
  val BotMinEvents = 20L

  /** User behavior profile + bot screen over ANY (user_id, ts,
    * event_type) frame. */
  def userProfile(ev: DataFrame): DataFrame = {
    val perUser = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"), count(lit(1)).as("n_types"),
        max(col("n")).as("top_n"))
    val burst = ev.groupBy(col("user_id"), date_trunc("HOUR", col("ts")).as("h"))
      .agg(count(lit(1)).as("nh"))
      .groupBy(col("user_id"))
      .agg(max(col("nh")).as("max_hour_events"))
    perUser.join(burst, Seq("user_id"))
      .select(col("user_id"), col("n_events"), col("n_types"),
        (col("top_n").cast(DoubleType) / col("n_events")).as("top_share"),
        col("max_hour_events"),
        (col("max_hour_events") >= BotBurstPerHour ||
          (col("top_n") * 3 >= col("n_events") && col("n_events") >= BotMinEvents))
          .as("is_bot"))
      .orderBy(col("user_id").asc)
  }

  def e12UserProfile(spark: SparkSession, dir: String): DataFrame =
    userProfile(Tables.load(spark, dir, "events"))

  // ---------------------------------------------------------------------
  // e13 — replay/at-least-once dedup: collapse duplicate deliveries of
  // the same event_id to their FIRST arrival, counting arrivals — the
  // batch twin of [[graft.streaming.EventStreams.dedupStream]]'s
  // watermark-bounded dropDuplicatesWithinWatermark (StreamingSpec
  // asserts stream ≡ this on the same augmented feed). The synthetic
  // events table is delivered exactly-once by construction, so (t11
  // pattern) the query runs over a deterministically AUGMENTED view:
  // events with event_id % 13 == 0 get a replayed copy 7 minutes later,
  // so suppression provably fires (n_arrivals = 2 on exactly those ids,
  // ts_first = the original delivery). Deterministic by construction —
  // min(ts) per id, not "whichever row a partition saw first". Scale:
  // one map-combinable hash aggregate keyed on event_id; no window, no
  // join.
  // ---------------------------------------------------------------------
  val ReplayEveryNthEvent = 13L

  /** Replay/at-least-once dedup over ANY (event_id, ts, user_id,
    * event_type) delivery feed — operates on the feed AS GIVEN (the
    * fixture's synthetic replays live in the e13 wrapper). */
  def replayDedup(deliveries: DataFrame): DataFrame =
    // group on the FULL delivery identity (a replay is a byte-identical
    // redelivery, so payload is part of the key): string columns as
    // grouping KEYS stay inside HashAggregate, whereas min(string) as an
    // aggregate forces a SortAggregate with two extra sorts
    deliveries.groupBy(col("event_id"), col("user_id"), col("event_type"))
      .agg(min(col("ts")).as("ts_first"), count(lit(1)).as("n_arrivals"))
      .orderBy(col("event_id").asc)

  /** Fixture wrapper: the synthetic feed is exactly-once by
    * construction, so events with event_id % 13 == 0 get a replayed
    * copy 7 minutes later. Augmentation is TEST DATA — it lives here,
    * not in [[replayDedup]]. */
  def e13ReplayDedup(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    replayDedup(ev.unionAll(
      ev.where(col("event_id") % ReplayEveryNthEvent === 0)
        .select(col("event_id"), expr("ts + INTERVAL 7 MINUTE").as("ts"),
          col("user_id"), col("event_type"))))
  }

  // ---------------------------------------------------------------------
  // e14 — inter-arrival audit: exact p50/p90/p99 of the gap between a
  // user's consecutive events of the same type — the rate-profile a
  // throttling/abuse screen is tuned against (e12 decides WHO is a bot;
  // this measures HOW FAST the traffic actually is). Percentiles are
  // percentile_disc by RANK SELECTION, never interpolation: the k-th
  // order statistic with k = ceil(q·n) computed in pure integer
  // arithmetic ((q_num·n + q_den - 1) DIV q_den), so no fp percentile
  // formula has to agree across engines. Scale shape: gaps come from a
  // user-keyed lag window (state bounded per user — the e01 partition
  // shape), then collapse to a (type, gap_seconds) HISTOGRAM — the t07
  // distributed-selection trick: the cumulative walk and selection run
  // over distinct observed gap-seconds (bounded by the time span, ~1e5
  // at years of data), never over the event stream itself.
  // ---------------------------------------------------------------------
  /** Inter-arrival percentile audit over ANY (user_id, event_id, ts,
    * event_type) frame. */
  def interarrivalAudit(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gaps = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .where(col("prev_us").isNotNull)
      .select(col("event_type"),
        expr("(unix_micros(ts) - prev_us) DIV 1000000").as("gap_s"))
    val hist = gaps.groupBy(col("event_type"), col("gap_s"))
      .agg(count(lit(1)).as("cnt"))
    val wc = Window.partitionBy(col("event_type")).orderBy(col("gap_s").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist.withColumn("cum", sum(col("cnt")).over(wc))
    val totals = hist.groupBy(col("event_type")).agg(sum(col("cnt")).as("n_gaps"))
    def kOf(num: Long, den: Long) = expr(s"($num * n_gaps + $den - 1) DIV $den")
    cum.join(broadcast(totals), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("n_gaps")).as("n_gaps"),
        min(when(col("cum") >= kOf(1, 2), col("gap_s"))).as("p50_gap_s"),
        min(when(col("cum") >= kOf(9, 10), col("gap_s"))).as("p90_gap_s"),
        min(when(col("cum") >= kOf(99, 100), col("gap_s"))).as("p99_gap_s"),
        max(col("gap_s")).as("max_gap_s"))
      .orderBy(col("event_type").asc)
  }

  def e14InterarrivalAudit(spark: SparkSession, dir: String): DataFrame =
    interarrivalAudit(Tables.load(spark, dir, "events"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e14_interarrival" -> e14InterarrivalAudit _,
    "e13_replay_dedup" -> e13ReplayDedup _,
    "e12_user_profile" -> e12UserProfile _,
    "e10_transitions" -> e10Transitions _,
    "e11_conversion_lag" -> e11ConversionLag _,
    "e09_asof_attribution" -> e09AsofAttribution _,
    "e07_windowed_counts" -> e07WindowedCounts _,
    "e08_sliding_counts" -> e08SlidingCounts _,
    "e01_sessionize" -> e01Sessionize _,
    "e02_props_stats" -> e02PropsStats _,
    "e03_hourly_agg" -> e03HourlyAgg _,
    "e04_funnel" -> e04Funnel _,
    "e05_retention" -> e05Retention _,
    "e06_hourly_anomaly" -> e06HourlyAnomaly _
  )

  private val valueSumSql = "coalesce(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE), 0.0)"

  val oracleSql: Map[String, String] = Map(
    "e14_interarrival" ->
      """WITH g AS (
        |  SELECT event_type,
        |         (epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |            PARTITION BY user_id, event_type
        |            ORDER BY ts ASC NULLS FIRST, event_id ASC NULLS FIRST))
        |           // 1000000 AS gap_s
        |  FROM events),
        |hist AS (
        |  SELECT event_type, gap_s, count(*) AS cnt
        |  FROM g WHERE gap_s IS NOT NULL GROUP BY 1, 2),
        |cum AS (
        |  SELECT event_type, gap_s, cnt,
        |         sum(cnt) OVER (PARTITION BY event_type ORDER BY gap_s
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM hist),
        |tot AS (SELECT event_type, CAST(sum(cnt) AS BIGINT) AS n_gaps
        |        FROM hist GROUP BY 1)
        |SELECT c.event_type, max(t.n_gaps) AS n_gaps,
        |       min(CASE WHEN c.cum >= (1 * t.n_gaps + 1) // 2 THEN c.gap_s END)
        |         AS p50_gap_s,
        |       min(CASE WHEN c.cum >= (9 * t.n_gaps + 9) // 10 THEN c.gap_s END)
        |         AS p90_gap_s,
        |       min(CASE WHEN c.cum >= (99 * t.n_gaps + 99) // 100 THEN c.gap_s END)
        |         AS p99_gap_s,
        |       max(c.gap_s) AS max_gap_s
        |FROM cum c JOIN tot t USING (event_type)
        |GROUP BY 1
        |ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "e13_replay_dedup" ->
      s"""WITH aug AS (
         |  SELECT event_id, ts, user_id, event_type FROM events
         |  UNION ALL
         |  SELECT event_id, ts + INTERVAL 7 MINUTE, user_id, event_type
         |  FROM events WHERE event_id % $ReplayEveryNthEvent = 0)
         |SELECT event_id, user_id, event_type,
         |       min(ts) AS ts_first, count(*) AS n_arrivals
         |FROM aug GROUP BY event_id, user_id, event_type
         |ORDER BY event_id ASC NULLS FIRST""".stripMargin,

    "e12_user_profile" ->
      s"""WITH bt AS (
         |  SELECT user_id, event_type, count(*) AS n FROM events GROUP BY 1, 2),
         |pu AS (
         |  SELECT user_id, CAST(sum(n) AS BIGINT) AS n_events,
         |         count(*) AS n_types, CAST(max(n) AS BIGINT) AS top_n
         |  FROM bt GROUP BY 1),
         |bh AS (
         |  SELECT user_id, date_trunc('hour', ts) AS h, count(*) AS nh
         |  FROM events GROUP BY 1, 2),
         |mh AS (SELECT user_id, CAST(max(nh) AS BIGINT) AS max_hour_events
         |       FROM bh GROUP BY 1)
         |SELECT pu.user_id, n_events, n_types,
         |       CAST(top_n AS DOUBLE) / n_events AS top_share, max_hour_events,
         |       max_hour_events >= $BotBurstPerHour
         |         OR (top_n * 3 >= n_events AND n_events >= $BotMinEvents) AS is_bot
         |FROM pu JOIN mh ON pu.user_id = mh.user_id
         |ORDER BY pu.user_id ASC NULLS FIRST""".stripMargin,

    "e10_transitions" ->
      """WITH x AS (
        |  SELECT user_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |           ORDER BY ts ASC, event_id ASC) AS prev_type
        |  FROM events),
        |c AS (SELECT prev_type, event_type, count(*) AS n
        |      FROM x WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT prev_type, CAST(sum(n) AS BIGINT) AS tot FROM c GROUP BY 1)
        |SELECT c.prev_type, c.event_type, c.n, CAST(c.n AS DOUBLE) / t.tot AS p
        |FROM c JOIN t USING (prev_type)
        |ORDER BY prev_type ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    "e11_conversion_lag" ->
      """WITH fv AS (
        |  SELECT user_id, min(ts) AS first_view_ts
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |fp AS (
        |  SELECT e.user_id AS p_user, min(e.ts) AS first_purchase_ts
        |  FROM events e JOIN fv ON e.user_id = fv.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view_ts
        |  GROUP BY 1)
        |SELECT user_id, first_view_ts, first_purchase_ts,
        |       date_diff('second', first_view_ts, first_purchase_ts) AS lag_s,
        |       first_purchase_ts IS NOT NULL AS converted
        |FROM fv LEFT JOIN fp ON fv.user_id = fp.p_user
        |ORDER BY user_id ASC NULLS FIRST""".stripMargin,

    "e09_asof_attribution" ->
      s"""WITH o AS (
         |  SELECT event_id, user_id, ts, event_type,
         |         max(CASE WHEN event_type = 'click' THEN ts END) OVER (
         |           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
         |  FROM events),
         |p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts, last_click_ts
         |      FROM o WHERE event_type = 'purchase'),
         |c AS (SELECT user_id, ts AS click_ts, min(event_id) AS click_id
         |      FROM events WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT purchase_id, p.user_id, purchase_ts,
         |       CASE WHEN last_click_ts IS NOT NULL
         |             AND date_diff('second', last_click_ts, purchase_ts)
         |                   <= $AttributionHorizonSeconds
         |            THEN click_id END AS click_id,
         |       CASE WHEN last_click_ts IS NOT NULL
         |             AND date_diff('second', last_click_ts, purchase_ts)
         |                   <= $AttributionHorizonSeconds
         |            THEN date_diff('second', last_click_ts, purchase_ts) END AS gap_s,
         |       coalesce(last_click_ts IS NOT NULL
         |             AND date_diff('second', last_click_ts, purchase_ts)
         |                   <= $AttributionHorizonSeconds, FALSE) AS attributed
         |FROM p LEFT JOIN c ON p.user_id = c.user_id AND p.last_click_ts = c.click_ts
         |ORDER BY purchase_id ASC NULLS FIRST""".stripMargin,

    "e07_windowed_counts" ->
      s"""SELECT date_trunc('hour', ts) AS window_start,
         |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
         |       event_type, count(*) AS n_events,
         |       $valueSumSql AS total_value
         |FROM events GROUP BY 1, 2, 3
         |ORDER BY window_start ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    "e08_sliding_counts" ->
      """WITH w AS (
        |  SELECT date_trunc('day', ts)
        |           + ((floor(epoch(ts - date_trunc('day', ts)))::BIGINT // 600 - k.k) * 600)
        |             * INTERVAL 1 SECOND AS window_start,
        |         event_type
        |  FROM events, (SELECT unnest(generate_series(0, 5)) AS k) k)
        |SELECT window_start, event_type, count(*) AS n_events
        |FROM w GROUP BY 1, 2
        |ORDER BY window_start ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    "e01_sessionize" ->
      s"""WITH x AS (
         |  SELECT *, CASE WHEN lag(ts) OVER w IS NULL
         |              OR date_diff('second', lag(ts) OVER w, ts) > $SessionGapSeconds
         |            THEN 1 ELSE 0 END AS new_s
         |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         |s AS (
         |  SELECT *, CAST(sum(new_s) OVER (PARTITION BY user_id
         |              ORDER BY ts, event_id) AS BIGINT) AS session_idx
         |  FROM x)
         |SELECT user_id, session_idx, count(*) AS n_events,
         |       min(ts) AS session_start, max(ts) AS session_end,
         |       date_diff('second', min(ts), max(ts)) AS duration_s,
         |       $valueSumSql AS total_value
         |FROM s GROUP BY 1, 2
         |ORDER BY user_id ASC NULLS FIRST, session_idx ASC NULLS FIRST""".stripMargin,

    "e02_props_stats" ->
      s"""SELECT event_type, count(*) AS n_events,
         |       count(DISTINCT user_id) AS n_users,
         |       min(json_extract_string(props, '$$.k')::INTEGER) AS min_k,
         |       max(json_extract_string(props, '$$.k')::INTEGER) AS max_k,
         |       CAST(sum(json_extract_string(props, '$$.k')::BIGINT) AS BIGINT) AS sum_k,
         |       $valueSumSql AS total_value
         |FROM events GROUP BY event_type
         |ORDER BY event_type ASC NULLS FIRST""".stripMargin,

    "e03_hourly_agg" ->
      s"""SELECT date_trunc('hour', ts) AS hour_start, event_type,
         |       count(*) AS n_events, count(DISTINCT user_id) AS n_users,
         |       $valueSumSql AS total_value
         |FROM events GROUP BY 1, 2
         |ORDER BY hour_start ASC NULLS FIRST, event_type ASC NULLS FIRST""".stripMargin,

    "e04_funnel" ->
      """WITH peruser AS (
        |  SELECT user_id,
        |         min(CASE WHEN event_type = 'view' THEN ts END) AS t_view,
        |         min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
        |         min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
        |  FROM events GROUP BY user_id),
        |depth AS (
        |  SELECT user_id,
        |         CASE WHEN t_view IS NULL THEN 0
        |              WHEN t_click IS NULL OR t_click < t_view THEN 1
        |              WHEN t_purchase IS NULL OR t_purchase < t_click THEN 2
        |              ELSE 3 END AS funnel_depth
        |  FROM peruser)
        |SELECT funnel_depth, count(*) AS n_users
        |FROM depth GROUP BY funnel_depth
        |ORDER BY funnel_depth ASC NULLS FIRST""".stripMargin,

    "e05_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week FROM events),
        |fw AS (SELECT user_id, min(week) AS cohort_week FROM act GROUP BY 1)
        |SELECT cohort_week,
        |       CAST(date_diff('day', cohort_week, week) // 7 AS INTEGER) AS weeks_since,
        |       count(DISTINCT act.user_id) AS n_users
        |FROM act JOIN fw USING (user_id)
        |GROUP BY 1, 2
        |ORDER BY cohort_week ASC NULLS FIRST, weeks_since ASC NULLS FIRST""".stripMargin,

    "e06_hourly_anomaly" ->
      s"""WITH hourly AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour_start,
         |         count(*) AS n_events
         |  FROM events GROUP BY 1, 2),
         |trail AS (
         |  SELECT *, count(*) OVER w AS trail_hours,
         |         CAST(sum(n_events) OVER w AS BIGINT) AS trail_events
         |  FROM hourly
         |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_start ASC
         |               ROWS BETWEEN $TrailHours PRECEDING AND 1 PRECEDING))
         |SELECT event_type, hour_start, n_events, trail_events,
         |       CAST(n_events AS DOUBLE) * trail_hours / trail_events AS ratio,
         |       CAST(n_events AS DOUBLE) * trail_hours / trail_events > 2.0 AS is_spike
         |FROM trail WHERE trail_hours = $TrailHours
         |ORDER BY event_type ASC NULLS FIRST, hour_start ASC NULLS FIRST""".stripMargin
  )
}
