package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Tables._

/** Time/event operators over the `events` table: tumbling / sliding /
  * session windows (the batch duals of the Structured Streaming queries in
  * graft.streaming), an as-of join, and JSON prop extraction.
  *
  * Timestamp parity: `events.ts` is parquet `timestamp[ns]`; Spark reads it
  * at microsecond precision (ns floor-truncated) while DuckDB keeps ns — so
  * every oracle mirrors the µs truncation (`date_trunc('microseconds', ts)`)
  * and timestamps are projected as formatted strings, never raw values.
  *
  * Scale: all window aggregations shuffle once on their grouping keys; the
  * as-of join is a single partition-by-user sort (no per-row subquery — the
  * oracle's correlated subquery is the semantic spec, not the plan).
  */
object Events {

  private def fmt(c: org.apache.spark.sql.Column) =
    date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Tumbling 1-hour windows per event type (batch dual of streaming agg). */
  def qEventsHourly(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(
        fmt(col("window.start")).as("window_start"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("window_start"), col("event_type"))
  }

  val qEventsHourlySql: String =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
      |  event_type, count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM events
      |GROUP BY 1, 2
      |ORDER BY window_start, event_type""".stripMargin

  /** Sliding windows (1 hour size, 30 min slide): each event lands in two
    * windows; Spark's `window()` does the fan-out natively.
    */
  def qEventsSliding(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .select(fmt(col("window.start")).as("window_start"), col("n"), col("sum_value"))
      .orderBy(col("window_start"))
  }

  val qEventsSlidingSql: String =
    """SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
      |  count(*) AS n,
      |  CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
      |FROM (
      |  SELECT e.value,
      |    to_timestamp((floor(epoch_us(e.ts) / 1800000000) - k.k) * 1800)::TIMESTAMP AS ws
      |  FROM events e CROSS JOIN (SELECT unnest([0, 1]) AS k) k)
      |GROUP BY ws
      |ORDER BY window_start""".stripMargin

  /** Session windows per user (5-minute gap). Batch dual of
    * `session_window` streaming aggregation; output start + last-event time
    * + size per session.
    */
  def qEventsSessions(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.groupBy(session_window(col("ts"), "5 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"), max(col("ts")).as("last_ts"))
      .select(
        col("user_id"),
        fmt(col("session_window.start")).as("session_start"),
        fmt(col("last_ts")).as("last_event"),
        col("n"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Gaps-and-islands formulation of the same sessionization. */
  val qEventsSessionsSql: String =
    """WITH e AS (
      |  SELECT user_id, date_trunc('microseconds', ts) AS ts FROM events
      |), flagged AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL 5 MINUTE
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM e
      |), sessions AS (
      |  SELECT user_id, ts,
      |    sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged
      |)
      |SELECT user_id,
      |  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
      |  strftime(max(ts), '%Y-%m-%d %H:%M:%S') AS last_event,
      |  count(*) AS n
      |FROM sessions
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_start""".stripMargin

  /** As-of join: for every `purchase`, the most recent strictly-earlier
    * `click` by the same user. Implemented Spark-first as one sort per user
    * partition (union + last(ignoreNulls) running value), not a per-row
    * lookup — O(n log n), one shuffle, scales to any fact size.
    */
  def qEventsAsof(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    AsOfJoin.join(
        left = ev.filter(col("event_type") === "purchase"),
        right = ev.filter(col("event_type") === "click"),
        key = "user_id", time = "ts", tiebreak = "event_id",
        rightPayload = Seq("ts"))
      .select(
        col("event_id"), col("user_id"),
        fmt(col("ts")).as("purchase_ts"),
        fmt(col("asof_ts")).as("click_ts"))
      .orderBy(col("event_id"))
  }

  /** Correlated-subquery spec of the as-of (µs-mirrored). Note the window
    * formulation above excludes the current ROW, so a click at the exact
    * same µs as the purchase but a smaller event_id still qualifies — the
    * oracle encodes (ts, event_id) lexicographic "earlier".
    */
  val qEventsAsofSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts
      |  FROM events
      |)
      |SELECT a.event_id, a.user_id,
      |  strftime(a.ts, '%Y-%m-%d %H:%M:%S') AS purchase_ts,
      |  strftime((
      |    SELECT max(b.ts) FROM e b
      |    WHERE b.user_id = a.user_id AND b.event_type = 'click'
      |      AND (b.ts < a.ts OR (b.ts = a.ts AND b.event_id < a.event_id))
      |  ), '%Y-%m-%d %H:%M:%S') AS click_ts
      |FROM e a
      |WHERE a.event_type = 'purchase'
      |ORDER BY a.event_id""".stripMargin

  /** JSON prop extraction + aggregation (`props` is a JSON string). */
  def qEventsJson(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    ev.select(col("event_type"), get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  val qEventsJsonSql: String =
    """SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k, max(k) AS max_k
      |FROM (SELECT event_type, CAST(json_extract(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Sequential-pattern (funnel) detection: per user, count views whose
    * funnel completes — an (any) click strictly after the view, then a
    * purchase strictly after that click, with the purchase inside 24 hours
    * of the view. Two chained window passes over the stream ordered by
    * (ts, event_id): pass 1 gives every event the earliest FOLLOWING
    * purchase ts, pass 2 gives every view the earliest following click's
    * purchase ts — no self-joins, no per-step tables. Scale:
    * partition-local after a single shuffle on user_id; at 100 TB
    * pre-bucket the events table on user_id and the exchange disappears.
    */
  /** Regex pattern for [[qSequenceMatch]] over event-type INITIALS
    * (s/e/c/v/p are distinct): a view, any run of views/clicks, then a
    * purchase — the "browse-to-buy" journey. The pattern is chosen so
    * Java regex (Spark) and RE2 (DuckDB) produce the SAME non-overlapping
    * match set: from any start the `[vc]*` run is maximal and `p` cannot
    * occur inside it, so at most one match exists per start and
    * leftmost-first (Java, backtracking) equals leftmost-longest (RE2) —
    * the same engine-parity discipline as the PII patterns.
    */
  val JourneyPattern = "v[vc]*p"

  /** SEQUENCE PATTERN MATCHING over per-user event journeys —
    * MATCH_RECOGNIZE-lite: each user's events collapse (ordered by
    * (ts, event_id)) into a journey STRING of event-type initials, and
    * the pattern counts its non-overlapping matches — expressing
    * "A (B|C)* D within a user's history" which the fixed-step funnel
    * ([[qEventsFunnel]]) cannot (funnels need a step count known
    * up-front; a regex run does not).
    *
    * Scale: one groupBy collapses each user to a journey (array_sort of
    * (ts, event_id, initial) structs — collect_list order never
    * observed), then the match count is a per-row regexp projection.
    * Journey length is bounded by a user's event count; a user with
    * millions of events needs session-windowed journeys first (the
    * standard MATCH_RECOGNIZE partition discipline).
    */
  def qSequenceMatch(spark: SparkSession, dir: String): DataFrame =
    sequenceMatches(events(spark, dir), JourneyPattern)

  /** The table-agnostic core of [[qSequenceMatch]]: any
    * (user_id, ts, event_id, event_type) frame plus a pattern over
    * event-type initials.
    */
  def sequenceMatches(ev: DataFrame, pattern: String): DataFrame =
    ev
      .select(col("user_id"),
        struct(col("ts"), col("event_id"),
          substring(col("event_type"), 1, 1).as("c")).as("e"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        concat_ws("", transform(array_sort(collect_list(col("e"))),
          s => s.getField("c"))).as("journey"))
      .select(col("user_id"), col("n_events"),
        size(regexp_extract_all(col("journey"), lit(pattern), lit(0)))
          .cast("long").as("n_matches"))
      .filter(col("n_matches") >= 1)
      .orderBy(col("user_id"))

  val qSequenceMatchSql: String =
    s"""WITH j AS (
       |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events,
       |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id) AS journey
       |  FROM events GROUP BY 1
       |)
       |SELECT user_id, n_events,
       |  CAST(len(regexp_extract_all(journey, '$JourneyPattern')) AS BIGINT) AS n_matches
       |FROM j
       |WHERE len(regexp_extract_all(journey, '$JourneyPattern')) >= 1
       |ORDER BY user_id""".stripMargin

  /** CUSUM CHANGE-POINT detection per event type — where did the value
    * level SHIFT: the position maximizing |Σ_{i≤k}(v_i − mean)|, the
    * classic cumulative-sum statistic whose peak marks the most likely
    * single change point. Exact-integer formulation (the house
    * discipline): with values in exact cents, the n-scaled statistic is
    *
    *   C_k = n·P_k − k·S   (P_k = prefix sum, S = total, n = count)
    *
    * — every term a long, no mean division ever happens, peaks compared
    * exactly; ties break to the earliest (ts, event_id). Envelope:
    * n·P < 2^63 holds through ~10⁷ events per type at ~10³-cent values.
    *
    * Scale: one cumulative-sum window per event-type partition riding a
    * broadcast 1-row (n, S) per type; a single dominant key at 100 TB
    * takes the range-partitioned two-pass ([[Rank.globalRank]]) instead
    * of one partition-local window.
    */
  def qCusumShift(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val ev = events(spark, dir)
      .select(col("event_type"), col("ts"), col("event_id"),
        (dec(col("value")) * 100).cast(LongType).as("cents"))
    val tot = ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    val cum = ev
      .withColumn("k", row_number().over(w).cast(LongType))
      .withColumn("p", sum(col("cents")).over(w))
      .join(broadcast(tot), "event_type")
      .withColumn("c", col("n") * col("p") - col("k") * col("s"))
    val wPeak = Window.partitionBy(col("event_type"))
      .orderBy(abs(col("c")).desc, col("ts"), col("event_id"))
    cum.withColumn("rn", row_number().over(wPeak))
      .filter(col("rn") === 1)
      .select(col("event_type"), fmt(col("ts")).as("shift_at"),
        col("k"), col("c").as("cusum_scaled"))
      .orderBy(col("event_type"))
  }

  val qCusumShiftSql: String =
    """WITH e AS (
      |  SELECT event_type, date_trunc('microseconds', ts) AS ts, event_id,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
      |  FROM events
      |), tot AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n, CAST(sum(cents) AS BIGINT) AS s
      |  FROM e GROUP BY 1
      |), cum AS (
      |  SELECT e.event_type, e.ts, e.event_id,
      |    CAST(row_number() OVER w AS BIGINT) AS k,
      |    CAST(sum(cents) OVER (PARTITION BY event_type ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS p
      |  FROM e WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
      |), scored AS (
      |  SELECT cum.*, tot.n * cum.p - cum.k * tot.s AS c
      |  FROM cum JOIN tot USING (event_type)
      |)
      |SELECT event_type, strftime(ts, '%Y-%m-%d %H:%M:%S') AS shift_at, k,
      |  CAST(c AS BIGINT) AS cusum_scaled
      |FROM (
      |  SELECT scored.*, row_number() OVER (
      |    PARTITION BY event_type ORDER BY abs(c) DESC, ts, event_id) AS rn
      |  FROM scored)
      |WHERE rn = 1
      |ORDER BY event_type""".stripMargin

  /** SESSION-windowed sequence matching — the partition discipline
    * [[qSequenceMatch]]'s scaladoc prescribes for unbounded histories:
    * journeys are built per (user, 30-minute-gap session) instead of per
    * whole user, so journey length is bounded by session activity and a
    * match can never span a session break. Sessions come from the
    * gaps-and-islands cumulative sum over the deterministic
    * (ts, event_id) order (same-tick events share a session whatever
    * their internal order — the gap compares timestamps only).
    */
  def qSessionPatterns(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("user_id"), col("ts"), col("event_id"),
        substring(col("event_type"), 1, 1).as("c"))
      .withColumn("new_s",
        when(lag(col("ts"), 1).over(w).isNull ||
          col("ts") >= lag(col("ts"), 1).over(w) + expr("INTERVAL 30 MINUTES"), 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_s")).over(w))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        concat_ws("", transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("c")))),
          s => s.getField("c"))).as("journey"))
      .select(col("user_id"), col("session_id"), col("n_events"),
        size(regexp_extract_all(col("journey"), lit(JourneyPattern), lit(0)))
          .cast("long").as("n_matches"))
      .filter(col("n_matches") >= 1)
      .orderBy(col("user_id"), col("session_id"))
  }

  val qSessionPatternsSql: String =
    s"""WITH e AS (
       |  SELECT user_id, date_trunc('microseconds', ts) AS ts, event_id,
       |    substr(event_type, 1, 1) AS c
       |  FROM events
       |), flagged AS (
       |  SELECT e.*,
       |    CASE WHEN lag(ts) OVER w IS NULL
       |           OR ts >= lag(ts) OVER w + INTERVAL 30 MINUTE
       |         THEN 1 ELSE 0 END AS new_s
       |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
       |), sess AS (
       |  SELECT flagged.*,
       |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
       |      ROWS UNBOUNDED PRECEDING) AS session_id
       |  FROM flagged
       |), j AS (
       |  SELECT user_id, session_id, CAST(count(*) AS BIGINT) AS n_events,
       |    string_agg(c, '' ORDER BY ts, event_id) AS journey
       |  FROM sess GROUP BY 1, 2
       |)
       |SELECT user_id, CAST(session_id AS BIGINT) AS session_id, n_events,
       |  CAST(len(regexp_extract_all(journey, '$JourneyPattern')) AS BIGINT) AS n_matches
       |FROM j
       |WHERE len(regexp_extract_all(journey, '$JourneyPattern')) >= 1
       |ORDER BY user_id, session_id""".stripMargin

  def qEventsFunnel(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .filter(col("event_type").isin("view", "click", "purchase"))
    val wFollowing = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(1, Window.unboundedFollowing)
    ev
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        min(when(col("event_type") === "purchase", col("ts"))).over(wFollowing).as("pts"))
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"),
        min(when(col("event_type") === "click", col("pts"))).over(wFollowing).as("cpts"))
      .filter(col("event_type") === "view" &&
        col("cpts") <= col("ts") + expr("INTERVAL 24 HOURS"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_funnels"))
      .orderBy(col("user_id"))
  }

  val qEventsFunnelSql: String =
    """WITH e AS (
      |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts, event_id
      |  FROM events WHERE event_type IN ('view', 'click', 'purchase')
      |), p1 AS (
      |  SELECT user_id, event_type, ts, event_id,
      |    min(CASE WHEN event_type = 'purchase' THEN ts END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS pts
      |  FROM e
      |), p2 AS (
      |  SELECT user_id, event_type, ts,
      |    min(CASE WHEN event_type = 'click' THEN pts END)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS cpts
      |  FROM p1
      |)
      |SELECT user_id, count(*) AS n_funnels
      |FROM p2
      |WHERE event_type = 'view' AND cpts <= ts + INTERVAL 24 HOURS
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  /** Cohort retention: users grouped by first-activity week, counted
    * distinct per (cohort week, activity week) — the classic retention
    * matrix, all exact integer counts. Two aggregations + one join on
    * user_id. The cohort relation is one row PER USER over the whole
    * events table — at billions of users it exceeds any broadcast
    * threshold, so the join strategy is left to AQE: it broadcasts at
    * test scale (where the relation is dim-sized) and falls back to a
    * shuffle join at scale instead of failing on a forced hint.
    */
  def qEventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    ev.join(cohort, "user_id")
      .groupBy(col("cohort_wk"), col("wk"))
      .agg(countDistinct(col("user_id")).as("active_users"))
      .select(fmt(col("cohort_wk")).as("cohort_week"), fmt(col("wk")).as("activity_week"),
        col("active_users"))
      .orderBy(col("cohort_week"), col("activity_week"))
  }

  val qEventsRetentionSql: String =
    """WITH e AS (
      |  SELECT user_id, date_trunc('week', date_trunc('microseconds', ts)) AS wk FROM events
      |), c AS (
      |  SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1
      |)
      |SELECT strftime(cohort_wk, '%Y-%m-%d %H:%M:%S') AS cohort_week,
      |  strftime(wk, '%Y-%m-%d %H:%M:%S') AS activity_week,
      |  count(DISTINCT user_id) AS active_users
      |FROM e JOIN c USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY cohort_week, activity_week""".stripMargin

  /** SCD2 (slowly-changing-dimension type 2) history build: each user's
    * purchase events become version rows with `[valid_from, valid_to)`
    * intervals — `valid_to` is the next version's timestamp (`lead`),
    * open (null) on the current version. The standard warehouse op for
    * turning a change stream into a queryable dimension history; one
    * window per user partition, no self-join. Deterministic ordering via
    * the unique event_id tie-break.
    */
  def qScd2History(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("next_ts", lead(col("ts"), 1).over(w))
      .select(col("user_id"), col("event_id"),
        fmt(col("ts")).as("valid_from"),
        fmt(col("next_ts")).as("valid_to"),
        col("value"),
        col("next_ts").isNull.as("is_current"))
      .orderBy(col("user_id"), col("event_id"))
  }

  val qScd2HistorySql: String =
    """SELECT user_id, event_id,
      |  strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  strftime(lead(ts, 1) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
      |  value,
      |  (lead(ts, 1) OVER w IS NULL) AS is_current
      |FROM (
      |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, value
      |  FROM events WHERE event_type = 'purchase')
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  /** AS-OF snapshot over the SCD2 history — the query the history exists
    * to serve: reconstruct the dimension state at a point in time T by
    * selecting, per user, the version row whose `[valid_from, valid_to)`
    * interval contains T. T is the corpus midpoint in exact microseconds
    * (`(min_us + max_us) DIV 2` over the full stream — a data-derived
    * scalar, so the query is deterministic at every scale without an
    * authored wall-clock constant). Intervals partition each user's
    * timeline, so at most one version matches per user.
    *
    * Scale: the version build is [[qScd2History]]'s one user-partitioned
    * window; the snapshot filter rides a broadcast 1-row bound relation —
    * no join against the history beyond the scalar.
    */
  def qScd2Asof(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val versions = events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("vf", unix_micros(col("ts")))
      .withColumn("vt", lead(unix_micros(col("ts")), 1).over(w))
    val bounds = events(spark, dir)
      .agg(min(unix_micros(col("ts"))).as("lo"), max(unix_micros(col("ts"))).as("hi"))
      .select(expr("(lo + hi) DIV 2").as("as_of_us"))
    versions.crossJoin(broadcast(bounds))
      .filter(col("vf") <= col("as_of_us") &&
        (col("vt").isNull || col("vt") > col("as_of_us")))
      .select(col("user_id"), col("event_id"),
        fmt(col("ts")).as("valid_from"), col("value"), col("as_of_us"))
      .orderBy(col("user_id"))
  }

  val qScd2AsofSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, value,
      |    epoch_us(date_trunc('microseconds', ts)) AS vf,
      |    lead(epoch_us(date_trunc('microseconds', ts)), 1) OVER
      |      (PARTITION BY user_id ORDER BY date_trunc('microseconds', ts), event_id) AS vt
      |  FROM events WHERE event_type = 'purchase'
      |), b AS (
      |  SELECT (min(epoch_us(date_trunc('microseconds', ts)))
      |          + max(epoch_us(date_trunc('microseconds', ts)))) // 2 AS as_of_us
      |  FROM events
      |)
      |SELECT user_id, event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
      |  value, as_of_us
      |FROM p CROSS JOIN b
      |WHERE vf <= as_of_us AND (vt IS NULL OR vt > as_of_us)
      |ORDER BY user_id""".stripMargin

  /** Time-series densification (gap filling): the complete hourly grid
    * from the stream's first to last hour × every event type, with
    * observed counts joined in and silent hours zero-filled — the
    * resampling step every downstream window/forecast op assumes. The
    * grid is generated from ONE global min/max aggregate (scalar
    * broadcast) and is calendar-sized — tiny relative to the events
    * stream, which is scanned once for the counts. The COUNTS side of
    * the final join carries the broadcast hint: the grid is the
    * preserved side of the left-outer join and a preserved side can
    * never be the hash-build side, so a hint there would be silently
    * ignored — the counts relation is post-aggregate calendar-sized
    * anyway, the natural build side.
    */
  def qEventsDensify(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"))
    val bounds = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val hours = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val types = ev.select(col("event_type")).distinct()
    val counts = ev.groupBy(col("h"), col("event_type")).agg(count(lit(1)).as("n"))
    hours.crossJoin(types)
      .join(broadcast(counts), Seq("h", "event_type"), "left")
      .select(fmt(col("h")).as("hour"), col("event_type"),
        coalesce(col("n"), lit(0L)).as("n"))
      .orderBy(col("hour"), col("event_type"))
  }

  val qEventsDensifySql: String =
    """WITH e AS (
      |  SELECT date_trunc('hour', date_trunc('microseconds', ts)) AS h, event_type
      |  FROM events
      |), hours AS (
      |  SELECT unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h FROM e
      |), types AS (
      |  SELECT DISTINCT event_type FROM e
      |), counts AS (
      |  SELECT h, event_type, count(*) AS n FROM e GROUP BY 1, 2
      |)
      |SELECT strftime(hours.h, '%Y-%m-%d %H:%M:%S') AS hour,
      |  types.event_type AS event_type,
      |  COALESCE(counts.n, 0) AS n
      |FROM hours CROSS JOIN types
      |LEFT JOIN counts ON counts.h = hours.h AND counts.event_type = types.event_type
      |ORDER BY hour, types.event_type""".stripMargin

  /** Last-touch attribution: each purchase is credited to the nearest
    * PRECEDING non-purchase event by the same user (strictly earlier under
    * the (ts, event_id) total order); purchases with no prior touch are
    * `organic`. One `last(..., ignoreNulls)` window over the per-user
    * stream — no self-join, no per-purchase subquery. Scale: a single
    * shuffle on user_id; with the events table bucketed on user_id the
    * exchange disappears entirely.
    */
  def qAttributionLastTouch(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val wPrior = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ev.select(col("event_type"),
        last(when(col("event_type") =!= "purchase", col("event_type")),
          ignoreNulls = true).over(wPrior).as("touch"))
      .filter(col("event_type") === "purchase")
      .select(coalesce(col("touch"), lit("organic")).as("touch"))
      .groupBy(col("touch"))
      .agg(count(lit(1)).as("n_purchases"))
      .orderBy(col("touch"))
  }

  val qAttributionLastTouchSql: String =
    """WITH e AS (
      |  SELECT event_id, user_id, event_type, date_trunc('microseconds', ts) AS ts
      |  FROM events
      |), t AS (
      |  SELECT event_type,
      |    last_value(CASE WHEN event_type <> 'purchase' THEN event_type END IGNORE NULLS)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS touch
      |  FROM e
      |)
      |SELECT COALESCE(touch, 'organic') AS touch, count(*) AS n_purchases
      |FROM t WHERE event_type = 'purchase'
      |GROUP BY 1
      |ORDER BY touch""".stripMargin

  /** Event-transition bigrams: the first-order Markov transition counts of
    * each user's event stream — `lag` over the (ts, event_id)-ordered
    * per-user partition, then a count per (prev, next) pair. The standard
    * sessionized-behavior profile; 25 output rows regardless of stream
    * size, all post-window work is a map-side-combinable aggregate.
    */
  def qEventBigrams(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .select(col("event_type").as("next"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("next"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("prev"), col("next"))
  }

  val qEventBigramsSql: String =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, date_trunc('microseconds', ts) AS ts
      |  FROM events
      |), b AS (
      |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
      |    event_type AS next
      |  FROM e
      |)
      |SELECT prev, next, count(*) AS n
      |FROM b WHERE prev IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY n DESC, prev, next""".stripMargin

  /** Rolling-window anomaly detection on the hourly event-count series:
    * each hour is tested against the trailing 24 hours (excluding
    * itself) with a one-sided z² test, division-free —
    * `(n·x − S)² > n·(n·Q − S²)` is `z² > n` (population variance)
    * cleared of all divisions — a deliberately conservative gate
    * (~|z| > 4.9 at n = 24): the series is bursty at the hour grain and
    * only order-of-magnitude spikes should page. Every comparison is
    * between exact longs and the flag cannot
    * drift between engines (the [[Checks.qOutlierOrders]] discipline
    * applied to a window frame). Hours with under 12 trailing samples
    * are not scored. Scale: the series is calendar-sized (one row per
    * (type, hour) after the first aggregate), so the window pass is
    * trivial no matter how large the event stream is; the stream is
    * touched exactly once.
    */
  def qRollingAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val h = events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("x"))
    val win = Window.partitionBy(col("event_type")).orderBy(col("hour"))
      .rowsBetween(-24, -1)
    h.select(col("event_type"), col("hour"), col("x"),
        count(lit(1)).over(win).as("n"),
        sum(col("x")).over(win).as("s"),
        sum(col("x") * col("x")).over(win).as("q"))
      .filter(col("n") >= 12)
      .select(col("event_type"), fmt(col("hour")).as("hour"), col("x"),
        ((col("n") * col("x") - col("s")) * (col("n") * col("x") - col("s"))
          > col("n") * (col("n") * col("q") - col("s") * col("s")))
          .as("is_anomaly"))
      .orderBy(col("event_type"), col("hour"))
  }

  val qRollingAnomalySql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    date_trunc('hour', date_trunc('microseconds', ts)) AS hour,
      |    count(*) AS x
      |  FROM events GROUP BY 1, 2
      |), w AS (
      |  SELECT event_type, hour, x,
      |    count(*) OVER win AS n, sum(x) OVER win AS s, sum(x*x) OVER win AS q
      |  FROM h
      |  WINDOW win AS (PARTITION BY event_type ORDER BY hour
      |                 ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
      |)
      |SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour, x,
      |  (n*x - s)*(n*x - s) > n*(n*q - s*s) AS is_anomaly
      |FROM w
      |WHERE n >= 12
      |ORDER BY event_type, hour""".stripMargin

  /** Inter-purchase gap profile (time-to-event): per user, the gaps
    * between consecutive purchases under the (ts, event_id) order, in
    * exact microseconds (`unix_micros` longs — no timestamp-diff
    * rounding), profiled per user cohort with exact-percentile parity.
    * One per-user window, then a 10-row aggregate.
    */
  def qPurchaseGaps(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    events(spark, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .filter(col("prev").isNotNull)
      .select(pmod(col("user_id"), lit(10)).as("cohort"),
        (unix_micros(col("ts")) - unix_micros(col("prev"))).as("gap"))
      .groupBy(col("cohort"))
      .agg(count(lit(1)).as("n_gaps"),
        expr("percentile(gap, 0.5)").as("p50_gap_us"),
        max(col("gap")).as("max_gap_us"))
      .orderBy(col("cohort"))
  }

  val qPurchaseGapsSql: String =
    """WITH p AS (
      |  SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts
      |  FROM events WHERE event_type = 'purchase'
      |), g AS (
      |  SELECT user_id % 10 AS cohort,
      |    epoch_us(ts) - epoch_us(lag(ts, 1)
      |      OVER (PARTITION BY user_id ORDER BY ts, event_id)) AS gap
      |  FROM p
      |)
      |SELECT cohort, count(*) AS n_gaps,
      |  quantile_cont(gap, 0.5) AS p50_gap_us,
      |  max(gap) AS max_gap_us
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY 1
      |ORDER BY cohort""".stripMargin

  /** Grouped linear-trend forecast: per event type, the OLS slope of the
    * hourly count series and the one-step-ahead forecast — both computed
    * from exact-integer sums only (`slope = (nΣxy − ΣxΣy)/(nΣx² −(Σx)²)`,
    * forecast folded into one rational with the same denominator), so the
    * sole floating-point step is the final rounded division and the
    * result is bit-identical across engines and partitionings. One
    * aggregate over the calendar-sized hourly series; the x index is a
    * per-type row_number (dense, deterministic — hours are unique within
    * a type).
    */
  def qTrendForecast(spark: SparkSession, dir: String): DataFrame = {
    val h = events(spark, dir)
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour"))
      .agg(count(lit(1)).as("y"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour"))
    val s = h.withColumn("x", row_number().over(w).cast(LongType))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"),
        max(col("x")).as("xmax"))
    s.select(col("event_type"), col("n").as("n_hours"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast(DoubleType)
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType), 6)
          .as("slope"),
        round(((col("sy") * col("sxx") - col("sx") * col("sxy"))
          + (col("n") * col("sxy") - col("sx") * col("sy")) * (col("xmax") + 1))
          .cast(DoubleType)
          / (col("n") * col("sxx") - col("sx") * col("sx")).cast(DoubleType), 6)
          .as("forecast_next"))
      .orderBy(col("event_type"))
  }

  val qTrendForecastSql: String =
    """WITH h AS (
      |  SELECT event_type,
      |    date_trunc('hour', date_trunc('microseconds', ts)) AS hour,
      |    count(*) AS y
      |  FROM events GROUP BY 1, 2
      |), xy AS (
      |  SELECT event_type,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY hour) AS BIGINT) AS x,
      |    y
      |  FROM h
      |), s AS (
      |  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x*y) AS sxy, sum(x*x) AS sxx, max(x) AS xmax
      |  FROM xy GROUP BY 1
      |)
      |SELECT event_type, CAST(n AS BIGINT) AS n_hours,
      |  round(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 6)
      |    AS slope,
      |  round(CAST((sy*sxx - sx*sxy) + (n*sxy - sx*sy)*(xmax+1) AS DOUBLE)
      |        / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS forecast_next
      |FROM s ORDER BY event_type""".stripMargin

  /** Iterations for the Markov stationary-distribution power method. */
  val MarkovIters = 5

  /** Stationary distribution of the first-order event-type Markov chain:
    * where does a user's session settle in the long run — the steady-state
    * complement to [[qEventBigrams]]'s one-step transition counts. Five
    * power-method rounds over the |types|²-sized transition relation in
    * EXACT integers: each round moves `(mass·c) DIV tot` along every
    * transition (the same truncating-division discipline as PageRank, so
    * the result is bit-identical at any parallelism and the oracle replays
    * the rounds as chained CTEs). Types that never transition out keep
    * only the mass that arrives in the final round — chain semantics,
    * mirrored exactly.
    *
    * Scale: the corpus-sized work is ONE bigram aggregation (the same
    * shape as q_event_bigrams); every iteration joins |types|²-sized
    * relations (enum-bounded — broadcast), so the rounds are free at any
    * corpus size.
    */
  def qMarkovStationary(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val big = events(spark, dir)
      .select(col("event_type").as("next"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("next"))
      .agg(count(lit(1)).as("c"))
    val outSum = big.groupBy(col("prev")).agg(sum(col("c")).as("tot"))
    val trans = big.join(outSum, "prev")
    val types = big.select(col("prev").as("t"))
      .union(big.select(col("next").as("t"))).distinct()
    var v = types.withColumn("mass", lit(1000000L))
    for (_ <- 1 to MarkovIters) {
      v = trans.join(v, trans("prev") === v("t"))
        .select(col("next"), expr("(mass * c) DIV tot").as("m"))
        .groupBy(col("next")).agg(sum(col("m")).as("mass"))
        .select(col("next").as("t"), col("mass"))
    }
    types.join(v, Seq("t"), "left")
      .select(col("t").as("event_type"),
        coalesce(col("mass"), lit(0L)).as("stationary_mass"))
      .orderBy(col("event_type"))
  }

  val qMarkovStationarySql: String = {
    def round(i: Int): String =
      s"""v$i AS (
         |  SELECT tr.next AS t, CAST(sum((v.mass * tr.c) // tr.tot) AS BIGINT) AS mass
         |  FROM trans tr JOIN v${i - 1} v ON v.t = tr.prev
         |  GROUP BY 1
         |)""".stripMargin
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, date_trunc('microseconds', ts) AS ts
       |  FROM events
       |), b AS (
       |  SELECT lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev,
       |    event_type AS next
       |  FROM e
       |), big AS (
       |  SELECT prev, next, count(*) AS c FROM b WHERE prev IS NOT NULL GROUP BY 1, 2
       |), outs AS (
       |  SELECT prev, CAST(sum(c) AS BIGINT) AS tot FROM big GROUP BY 1
       |), trans AS (
       |  SELECT big.prev, big.next, big.c, outs.tot FROM big JOIN outs USING (prev)
       |), types AS (
       |  SELECT DISTINCT prev AS t FROM big UNION SELECT DISTINCT next FROM big
       |), v0 AS (
       |  SELECT t, CAST(1000000 AS BIGINT) AS mass FROM types
       |), ${(1 to MarkovIters).map(round).mkString(", ")}
       |SELECT ty.t AS event_type, coalesce(v.mass, 0) AS stationary_mass
       |FROM types ty LEFT JOIN v$MarkovIters v ON v.t = ty.t
       |ORDER BY event_type""".stripMargin
  }

  /** Attribution window and half-life for [[qAttributionDecay]]. */
  val DecayWindowHours = 48L
  val DecayHalfLifeHours = 12L

  /** Time-decay (multi-touch) attribution: every view/click in the 48 h
    * before a purchase earns credit halving every 12 h —
    * `credit_milli = 1000 DIV 2^(Δhours DIV 12)` — rolled up per touch
    * type. The multi-touch complement to [[qAttributionLastTouch]] (there
    * winner-takes-all; here every touch in the window shares, recency-
    * weighted). All arithmetic is exact integers: Δ in microseconds,
    * floor-divided to hours, a power-of-two divisor via shiftleft — no
    * float decay curve to drift cross-engine.
    *
    * Scale: the touch×purchase pairing is a per-user range join — shuffle
    * both sides on user_id, bound pairs by the window; per-user event
    * counts are session-sized, so the pair fan-out is linear in events ×
    * touches-per-window (at open-ended scale, bucket by (user, 48 h) the
    * way [[RangeJoin]] does to keep the equi-key).
    */
  def qAttributionDecay(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val touches = ev.filter(col("event_type").isin("view", "click"))
      .select(col("user_id"), col("event_type").as("touch_type"),
        unix_micros(col("ts")).as("t_us"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), unix_micros(col("ts")).as("p_us"))
    touches.join(purchases, Seq("user_id"))
      .filter(col("t_us") < col("p_us") &&
        col("p_us") - col("t_us") <= DecayWindowHours * 3600L * 1000000L)
      .select(col("touch_type"),
        expr(s"1000 DIV (shiftleft(CAST(1 AS BIGINT), " +
          s"CAST(((p_us - t_us) DIV ${3600L * 1000000L}) DIV $DecayHalfLifeHours AS INT)))")
          .as("credit_milli"))
      .groupBy(col("touch_type"))
      .agg(count(lit(1)).as("n_credited"), sum(col("credit_milli")).as("total_credit_milli"))
      .orderBy(col("touch_type"))
  }

  val qAttributionDecaySql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, epoch_us(date_trunc('microseconds', ts)) AS us
       |  FROM events
       |), t AS (
       |  SELECT user_id, event_type AS touch_type, us AS t_us FROM e
       |  WHERE event_type IN ('view', 'click')
       |), p AS (
       |  SELECT user_id, us AS p_us FROM e WHERE event_type = 'purchase'
       |), credited AS (
       |  SELECT t.touch_type,
       |    1000 // (CAST(1 AS BIGINT) << CAST(((p.p_us - t.t_us) // ${3600L * 1000000L})
       |      // $DecayHalfLifeHours AS INT)) AS credit_milli
       |  FROM t JOIN p ON p.user_id = t.user_id
       |  WHERE t.t_us < p.p_us
       |    AND p.p_us - t.t_us <= ${DecayWindowHours * 3600L * 1000000L}
       |)
       |SELECT touch_type, count(*) AS n_credited,
       |  CAST(sum(credit_milli) AS BIGINT) AS total_credit_milli
       |FROM credited GROUP BY 1
       |ORDER BY touch_type""".stripMargin

  /** RFM (recency / frequency / monetary) customer segmentation: per-user
    * purchase recency, count, and exact-cents spend, each cut into
    * quartiles (1 = lowest) by the explicit rank formula
    * `q = ((rank−1)·4) DIV n + 1`, then segment counts per (r,f,m) code —
    * the classic lifecycle-marketing cube. Every rank comes from
    * [[Rank.globalRank]] (range-partitioned distributed ranking, no
    * single-reducer window), ties broken by user_id, so the quartile
    * codes are total-order deterministic; money is DECIMAL cents, never
    * float-summed.
    *
    * Scale: one fact-table aggregation to a user-dimension relation, then
    * three range exchanges of that dimension (one per metric) and a
    * 64-cell rollup. The user count is a control-plane scalar (same
    * contract as PageRank's |V|).
    */
  def qRfmSegments(spark: SparkSession, dir: String): DataFrame = {
    val p = events(spark, dir).filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("r_us"),
        count(lit(1)).as("f"),
        sum(dec(col("value")) * 100).cast("long").as("m_cents"))
    val n = p.count()
    var u = p
    for ((m, q) <- Seq(("r_us", "r_q"), ("f", "f_q"), ("m_cents", "m_q"))) {
      u = Rank.globalRank(u, Seq(col(m), col("user_id")), numParts = 8, rankName = s"rk_$q")
        .withColumn(q, expr(s"((rk_$q - 1) * 4) DIV $n + 1"))
    }
    u.groupBy(col("r_q"), col("f_q"), col("m_q"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("r_q"), col("f_q"), col("m_q"))
  }

  val qRfmSegmentsSql: String =
    """WITH e AS (
      |  SELECT user_id, epoch_us(date_trunc('microseconds', ts)) AS us, value
      |  FROM events WHERE event_type = 'purchase'
      |), p AS (
      |  SELECT user_id, max(us) AS r_us, count(*) AS f,
      |    CAST(sum(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS m_cents
      |  FROM e GROUP BY 1
      |), n AS (SELECT count(*) AS n FROM p),
      |rr AS (
      |  SELECT p.*,
      |    row_number() OVER (ORDER BY r_us, user_id) AS rn_r,
      |    row_number() OVER (ORDER BY f, user_id) AS rn_f,
      |    row_number() OVER (ORDER BY m_cents, user_id) AS rn_m
      |  FROM p
      |), q AS (
      |  SELECT ((rn_r - 1) * 4) // n + 1 AS r_q,
      |    ((rn_f - 1) * 4) // n + 1 AS f_q,
      |    ((rn_m - 1) * 4) // n + 1 AS m_q
      |  FROM rr CROSS JOIN n
      |)
      |SELECT r_q, f_q, m_q, count(*) AS n_users
      |FROM q GROUP BY 1, 2, 3
      |ORDER BY 1, 2, 3""".stripMargin

  /** Cohort lifetime-value cube: users cohorted by their signup week,
    * purchase revenue accumulated per (cohort week × weeks-since-signup)
    * cell — the LTV triangle that pairs with [[qEventsRetention]]'s
    * retention matrix. Money is DECIMAL cents (never float-summed) and
    * the week age is an exact integer division of microsecond deltas
    * (week-truncated NTZ timestamps differ by exact multiples of 7 days —
    * no DST in the pinned UTC session).
    *
    * Scale: two filtered aggregations of the fact table plus one join on
    * user_id (signup side is user-dimension-sized — broadcast), then a
    * calendar-sized rollup.
    */
  def qCohortLtv(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
    val signup = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id"))
      .agg(min(date_trunc("week", col("ts"))).as("cw"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), date_trunc("week", col("ts")).as("pw"),
        (dec(col("value")) * 100).as("cents"))
    purch.join(broadcast(signup), Seq("user_id"))
      .filter(col("pw") >= col("cw"))
      .withColumn("age_weeks",
        expr(s"(unix_micros(pw) - unix_micros(cw)) DIV ${7L * 86400L * 1000000L}"))
      .groupBy(date_format(col("cw"), "yyyy-MM-dd").as("cohort_week"), col("age_weeks"))
      .agg(sum(col("cents")).cast("long").as("sum_cents"),
        count_distinct(col("user_id")).as("n_buyers"))
      .orderBy(col("cohort_week"), col("age_weeks"))
  }

  val qCohortLtvSql: String =
    s"""WITH e AS (
       |  SELECT user_id, event_type, date_trunc('microseconds', ts) AS ts, value
       |  FROM events
       |), s AS (
       |  SELECT user_id, min(date_trunc('week', ts)) AS cw
       |  FROM e WHERE event_type = 'signup' GROUP BY 1
       |), p AS (
       |  SELECT user_id, date_trunc('week', ts) AS pw,
       |    CAST(value AS DECIMAL(18,2)) * 100 AS cents
       |  FROM e WHERE event_type = 'purchase'
       |)
       |SELECT strftime(s.cw, '%Y-%m-%d') AS cohort_week,
       |  (epoch_us(p.pw) - epoch_us(s.cw)) // ${7L * 86400L * 1000000L} AS age_weeks,
       |  CAST(sum(p.cents) AS BIGINT) AS sum_cents,
       |  count(DISTINCT p.user_id) AS n_buyers
       |FROM p JOIN s USING (user_id)
       |WHERE p.pw >= s.cw
       |GROUP BY 1, 2
       |ORDER BY 1, 2""".stripMargin

  /** Daily/weekly active users and the DAU/WAU stickiness ratio — the
    * engagement dashboard staple. The trailing-7-day distinct count is
    * computed WITHOUT a range join: each (user, day) activity row emits
    * the 7 future days it keeps the user "weekly active" for (a ×7
    * map-side explode with an equi-keyed distinct), so the plan stays
    * hash-joinable — no theta join, no nested loop. Stickiness is exact
    * basis points.
    *
    * Scale: the fact table collapses to the (user, day) activity relation
    * first (dedup shuffle); the ×7 explode amplifies only that deduped
    * relation, and everything downstream is (users × days)-sized.
    */
  def qDauWau(spark: SparkSession, dir: String): DataFrame = {
    val ud = events(spark, dir)
      .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val wau = ud
      .select(col("user_id"), col("day"), explode(sequence(lit(0), lit(6))).as("i"))
      .select(col("user_id"), expr("date_add(day, i)").as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as("wau"))
    dau.join(wau, Seq("day"))
      .select(date_format(col("day"), "yyyy-MM-dd").as("day"),
        col("dau"), col("wau"),
        expr("dau * 10000 DIV wau").as("stickiness_bp"))
      .orderBy(col("day"))
  }

  val qDauWauSql: String =
    """WITH ud AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
      |), dau AS (
      |  SELECT day, count(*) AS dau FROM ud GROUP BY 1
      |), w AS (
      |  SELECT DISTINCT user_id, day + CAST(i AS INTEGER) AS day
      |  FROM ud CROSS JOIN range(7) r(i)
      |), wau AS (
      |  SELECT day, count(*) AS wau FROM w GROUP BY 1
      |)
      |SELECT strftime(d.day, '%Y-%m-%d') AS day, d.dau, w2.wau,
      |  (d.dau * 10000) // w2.wau AS stickiness_bp
      |FROM dau d JOIN wau w2 USING (day)
      |ORDER BY day""".stripMargin

  /** LINEAR-INTERPOLATION gap fill — the companion to [[qEventsDensify]]
    * (which zero-fills): per event type, an hourly revenue series with
    * gaps is completed by linearly interpolating between the surrounding
    * observations (flat extrapolation at the edges), each output row
    * labeled `obs` / `interp` / `edge`. This is the standard sensor /
    * finance resampling step before models that assume a regular grid.
    *
    * Exact-integer discipline: observed values are exact-decimal cent
    * sums; the interpolation slope-step is computed magnitude-first
    * (`|Δv|·(h−h₀) DIV span`) with a CASE sign, because Spark `DIV`
    * truncates toward zero while DuckDB `//` floors — they agree only on
    * non-negatives (the [[Sketches]] signed-division rule).
    *
    * Scale: the observation aggregate is the one data pass; the dense
    * grid is (hours × types) — time-domain-sized metadata — and the
    * prev/next scans are two windows over that grid partitioned by type,
    * never over events. Observations are sparsified (every 7th event) so
    * real gaps exist at every SF.
    */
  def qInterpolate(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(spark, dir).filter(col("event_id") % 7 === 0)
      .select(date_trunc("hour", col("ts")).as("h"), col("event_type"),
        Tables.dec(col("value")).as("v"))
    val obs = ev.groupBy(col("h"), col("event_type"))
      .agg((sum(col("v")) * 100).cast(LongType).as("cents"))
    val bounds = ev.agg(min(col("h")).as("lo"), max(col("h")).as("hi"))
    val hours = bounds
      .select(explode(sequence(col("lo"), col("hi"), expr("interval 1 hour"))).as("h"))
    val types = ev.select(col("event_type")).distinct()
    val grid = hours.crossJoin(types)
      .join(broadcast(obs), Seq("h", "event_type"), "left")
      .withColumn("hu", expr("unix_timestamp(h) DIV 3600"))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("hu"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wNext = Window.partitionBy(col("event_type")).orderBy(col("hu"))
      .rowsBetween(0, Window.unboundedFollowing)
    grid
      .withColumn("pv", last(col("cents"), ignoreNulls = true).over(wPrev))
      .withColumn("ph", last(when(col("cents").isNotNull, col("hu")), ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("cents"), ignoreNulls = true).over(wNext))
      .withColumn("nh", first(when(col("cents").isNotNull, col("hu")), ignoreNulls = true).over(wNext))
      .select(fmt(col("h")).as("hour"), col("event_type"),
        expr("""CASE
          WHEN cents IS NOT NULL THEN cents
          WHEN pv IS NULL THEN nv
          WHEN nv IS NULL THEN pv
          ELSE pv + (CASE WHEN nv < pv THEN -1 ELSE 1 END) *
               (abs(nv - pv) * (hu - ph) DIV (nh - ph))
          END""").as("value_cents"),
        expr("""CASE
          WHEN cents IS NOT NULL THEN 'obs'
          WHEN pv IS NULL OR nv IS NULL THEN 'edge'
          ELSE 'interp' END""").as("kind"))
      .orderBy(col("hour"), col("event_type"))
  }

  val qInterpolateSql: String =
    """WITH e AS (
      |  SELECT date_trunc('hour', date_trunc('microseconds', ts)) AS h, event_type,
      |    CAST(value AS DECIMAL(18,2)) AS v
      |  FROM events WHERE event_id % 7 = 0
      |), obs AS (
      |  SELECT h, event_type, CAST(sum(v) * 100 AS BIGINT) AS cents
      |  FROM e GROUP BY 1, 2
      |), hours AS (
      |  SELECT unnest(generate_series(min(h), max(h), INTERVAL 1 HOUR)) AS h FROM e
      |), types AS (
      |  SELECT DISTINCT event_type FROM e
      |), grid AS (
      |  SELECT hours.h, types.event_type, obs.cents,
      |    CAST(epoch(hours.h) AS BIGINT) // 3600 AS hu
      |  FROM hours CROSS JOIN types
      |  LEFT JOIN obs ON obs.h = hours.h AND obs.event_type = types.event_type
      |), scanned AS (
      |  SELECT h, event_type, cents, hu,
      |    last_value(cents IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY hu
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
      |    last_value(CASE WHEN cents IS NOT NULL THEN hu END IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY hu
      |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
      |    first_value(cents IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY hu
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
      |    first_value(CASE WHEN cents IS NOT NULL THEN hu END IGNORE NULLS) OVER
      |      (PARTITION BY event_type ORDER BY hu
      |       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
      |  FROM grid
      |)
      |SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS hour, event_type,
      |  CASE
      |    WHEN cents IS NOT NULL THEN cents
      |    WHEN pv IS NULL THEN nv
      |    WHEN nv IS NULL THEN pv
      |    ELSE pv + (CASE WHEN nv < pv THEN -1 ELSE 1 END) *
      |         (abs(nv - pv) * (hu - ph) // (nh - ph))
      |  END AS value_cents,
      |  CASE
      |    WHEN cents IS NOT NULL THEN 'obs'
      |    WHEN pv IS NULL OR nv IS NULL THEN 'edge'
      |    ELSE 'interp' END AS kind
      |FROM scanned
      |ORDER BY hour, event_type""".stripMargin

  /** M4 DOWNSAMPLING (Jugel et al., "M4: A Visualization-Oriented Time
    * Series Data Aggregation", PVLDB 7(10), 2014): per series per pixel
    * bucket, keep exactly the first, last, min, and max points — the
    * smallest reduction that renders a line chart pixel-identically to the
    * full series. At 100 TB this IS how a dashboard reads a time series:
    * the 4-point-per-bucket aggregate pushes down to a scan + partial agg
    * (one shuffle at bucket granularity, output = pixels × series rows),
    * instead of shipping millions of raw points to a renderer.
    *
    * first/last ride `min_by`/`max_by` over a packed total-order key
    * (`epoch_seconds·10^7 + event_id` — unique, fits a long at this
    * generator's id range; a production deployment packs (ts, seq) wider
    * or uses a struct key), so the choice is deterministic in both
    * engines (DuckDB `arg_min`/`arg_max`). Values are exact cents.
    */
  def qM4Downsample(spark: SparkSession, dir: String): DataFrame = {
    val ev = events(spark, dir)
      .select(col("event_type"),
        (Tables.dec(col("value")) * 100).cast(LongType).as("cents"),
        expr("unix_timestamp(ts) DIV 86400").as("b"),
        expr("unix_timestamp(ts) * 10000000 + event_id").as("o"))
    ev.groupBy(col("event_type"), col("b"))
      .agg(count(lit(1)).as("n"),
        min(col("cents")).as("v_min"), max(col("cents")).as("v_max"),
        min_by(col("cents"), col("o")).as("v_first"),
        max_by(col("cents"), col("o")).as("v_last"))
      .orderBy(col("event_type"), col("b"))
  }

  val qM4DownsampleSql: String =
    """WITH e AS (
      |  SELECT event_type,
      |    CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents,
      |    CAST(floor(epoch(date_trunc('microseconds', ts))) AS BIGINT) // 86400 AS b,
      |    CAST(floor(epoch(date_trunc('microseconds', ts))) AS BIGINT) * 10000000 + event_id AS o
      |  FROM events
      |)
      |SELECT event_type, b, CAST(count(*) AS BIGINT) AS n,
      |  min(cents) AS v_min, max(cents) AS v_max,
      |  arg_min(cents, o) AS v_first, arg_max(cents, o) AS v_last
      |FROM e GROUP BY event_type, b
      |ORDER BY event_type, b""".stripMargin

  /** Candidate session gaps (seconds) for [[qSessionSweep]]. */
  val SessionGapsSec = Seq(600L, 1800L, 3600L, 7200L)

  /** SESSION-GAP TUNING SWEEP — the sessionization dual of
    * [[Dedup.qDedupThresholdSweep]]: session counts and mean
    * events-per-session at each candidate inactivity gap, all from ONE
    * per-user lag pass (the expensive sort runs once; each gap is a cheap
    * conditional re-aggregation over the inter-event gap relation, since
    * `sessions(G) = users + |{gaps > G}|`). The report a pipeline reads
    * before committing a session window to its funnel/attribution
    * queries. Exact integers: gaps in microseconds, the mean in
    * millionths.
    */
  def qSessionSweep(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = events(spark, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = ev
      .select(col("user_id"), col("ts"), col("event_id"))
      .withColumn("gap_us",
        unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    TextDedup.materializeAndRelease(sessionSweepFrom(gaps), gaps)
  }

  /** The sweep aggregation over ANY (user_id, gap_us) relation (one row
    * per event; gap_us null for a user's first event) — shared by the
    * batch query and the streaming gap stream
    * ([[graft.streaming.SessionStream]]), whose per-user one-timestamp
    * state emits the identical relation at arrival time.
    */
  def sessionSweepFrom(gaps: DataFrame): DataFrame = {
    val totals = gaps.agg(count(lit(1)).as("n_events"),
      countDistinct(col("user_id")).as("n_users"))
    gaps
      .select(col("gap_us"),
        explode(typedLit(SessionGapsSec)).as("gap_s"))
      .groupBy(col("gap_s"))
      .agg(coalesce(sum(when(col("gap_us") > col("gap_s") * 1000000L, 1L)
        .otherwise(0L)), lit(0L)).as("n_breaks"))
      .crossJoin(broadcast(totals))
      .select(col("gap_s"),
        (col("n_users") + col("n_breaks")).as("n_sessions"),
        expr("n_events * 1000000 DIV (n_users + n_breaks)")
          .as("events_per_session_micro"))
      .orderBy(col("gap_s"))
  }

  val qSessionSweepSql: String = {
    val gapsList = SessionGapsSec.mkString(", ")
    s"""WITH g AS (
       |  SELECT user_id,
       |    epoch_us(ts) - epoch_us(lag(ts, 1) OVER (
       |      PARTITION BY user_id ORDER BY ts, event_id)) AS gap_us
       |  FROM events
       |), tot AS (
       |  SELECT count(*) AS n_events, count(DISTINCT user_id) AS n_users FROM g
       |), x AS (
       |  SELECT CAST(g0 AS BIGINT) AS gap_s, gap_us
       |  FROM g CROSS JOIN unnest(ARRAY[$gapsList]) AS t(g0)
       |)
       |SELECT CAST(gap_s AS BIGINT) AS gap_s,
       |  CAST(tot.n_users + sum(CASE WHEN gap_us > gap_s * 1000000 THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_sessions,
       |  CAST(tot.n_events * 1000000
       |    // (tot.n_users + sum(CASE WHEN gap_us > gap_s * 1000000 THEN 1 ELSE 0 END))
       |    AS BIGINT) AS events_per_session_micro
       |FROM x CROSS JOIN tot
       |GROUP BY gap_s, tot.n_users, tot.n_events
       |ORDER BY gap_s""".stripMargin
  }

  /** K-ANONYMITY audit (Sweeney 2002, IJUFKS 10(5) — the re-identification
    * gate a dataset passes before release): build each user's
    * QUASI-IDENTIFIER profile from behavioral columns — dominant event
    * type (deterministic argmax: count desc, then type — via the native
    * bounded-heap [[graft.plans.TopKPerKey]], k = 1) and the activity
    * bucket `least(n_events DIV 10, 10)` — and report every profile's
    * population with its `at_risk = n_users < k` flag (k = 5, the
    * conventional floor): a profile shared by fewer than k users
    * re-identifies them to anyone holding the side table.
    *
    * Shape at 100 TB: two map-side-combinable aggregates (user×type,
    * user) + the bounded-heap argmax (map-side partial heaps of 1 row
    * per user-partition) + one profile-sized aggregate; output bounded
    * by |types| × 11 buckets. No window, no self-join.
    */
  def qKAnonymity(spark: SparkSession, dir: String): DataFrame = {
    val ev = table(spark, dir, "events")
    val typeCounts = ev.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
    val top = graft.plans.TopKPerKey
      .perKey(typeCounts, Seq(col("user_id")),
        Seq(col("cnt").desc, col("event_type").asc), k = 1)
      .select(col("user_id"), col("event_type").as("top_type"))
    val activity = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n_events"))
    top.join(activity, "user_id")
      .select(col("top_type"),
        least(expr("n_events DIV 10"), lit(10L)).as("act_bucket"))
      .groupBy(col("top_type"), col("act_bucket"))
      .agg(count(lit(1)).as("n_users"))
      .withColumn("at_risk", col("n_users") < 5)
      .orderBy(col("top_type"), col("act_bucket"))
  }

  val qKAnonymitySql: String =
    """WITH tc AS (
      |  SELECT user_id, event_type, count(*) AS cnt FROM events GROUP BY 1, 2
      |), top AS (
      |  SELECT user_id, event_type AS top_type FROM (
      |    SELECT user_id, event_type,
      |      row_number() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type) AS rn
      |    FROM tc)
      |  WHERE rn = 1
      |), act AS (
      |  SELECT user_id, count(*) AS n_events FROM events GROUP BY 1
      |)
      |SELECT top_type, CAST(least(n_events // 10, 10) AS BIGINT) AS act_bucket,
      |  CAST(count(*) AS BIGINT) AS n_users, count(*) < 5 AS at_risk
      |FROM top JOIN act USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_session_sweep" -> (qSessionSweep _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_interpolate" -> (qInterpolate _),
    "q_m4_downsample" -> (qM4Downsample _),
    "q_dau_wau" -> (qDauWau _),
    "q_cohort_ltv" -> (qCohortLtv _),
    "q_rfm_segments" -> (qRfmSegments _),
    "q_attribution_decay" -> (qAttributionDecay _),
    "q_markov_stationary" -> (qMarkovStationary _),
    "q_trend_forecast" -> (qTrendForecast _),
    "q_purchase_gaps" -> (qPurchaseGaps _),
    "q_rolling_anomaly" -> (qRollingAnomaly _),
    "q_attribution_last_touch" -> (qAttributionLastTouch _),
    "q_event_bigrams" -> (qEventBigrams _),
    "q_sequence_match" -> (qSequenceMatch _),
    "q_session_patterns" -> (qSessionPatterns _),
    "q_cusum_shift" -> (qCusumShift _),
    "q_events_densify" -> (qEventsDensify _),
    "q_scd2_history" -> (qScd2History _),
    "q_scd2_asof" -> (qScd2Asof _),
    "q_events_retention" -> (qEventsRetention _),
    "q_events_hourly" -> (qEventsHourly _),
    "q_events_sliding" -> (qEventsSliding _),
    "q_events_sessions" -> (qEventsSessions _),
    "q_events_asof" -> (qEventsAsof _),
    "q_events_json" -> (qEventsJson _),
    "q_events_funnel" -> (qEventsFunnel _),
  )

  def oracle: Map[String, String] = Map(
    "q_session_sweep" -> qSessionSweepSql,
    "q_k_anonymity" -> qKAnonymitySql,
    "q_interpolate" -> qInterpolateSql,
    "q_m4_downsample" -> qM4DownsampleSql,
    "q_dau_wau" -> qDauWauSql,
    "q_cohort_ltv" -> qCohortLtvSql,
    "q_rfm_segments" -> qRfmSegmentsSql,
    "q_attribution_decay" -> qAttributionDecaySql,
    "q_markov_stationary" -> qMarkovStationarySql,
    "q_trend_forecast" -> qTrendForecastSql,
    "q_purchase_gaps" -> qPurchaseGapsSql,
    "q_rolling_anomaly" -> qRollingAnomalySql,
    "q_attribution_last_touch" -> qAttributionLastTouchSql,
    "q_event_bigrams" -> qEventBigramsSql,
    "q_sequence_match" -> qSequenceMatchSql,
    "q_session_patterns" -> qSessionPatternsSql,
    "q_cusum_shift" -> qCusumShiftSql,
    "q_events_densify" -> qEventsDensifySql,
    "q_scd2_history" -> qScd2HistorySql,
    "q_scd2_asof" -> qScd2AsofSql,
    "q_events_retention" -> qEventsRetentionSql,
    "q_events_hourly" -> qEventsHourlySql,
    "q_events_sliding" -> qEventsSlidingSql,
    "q_events_sessions" -> qEventsSessionsSql,
    "q_events_asof" -> qEventsAsofSql,
    "q_events_json" -> qEventsJsonSql,
    "q_events_funnel" -> qEventsFunnelSql,
  )
}
