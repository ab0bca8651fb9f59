package graft.ops

import graft.{QuerySpec, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.IntegerType

/** Event-stream analytics over the `events` table (FIXTURES.md §A) —
  * the batch half of the streaming surface (see `graft.streaming` for
  * the Structured Streaming variants of the same computations).
  *
  * Maps the reference's only time logic (wall-clock formatting,
  * `sharepoint_to_bronze_delta.py:121-123,189-191`) onto the full
  * time-series surface a real engine needs: tumbling windows,
  * gap-based sessionization, JSON property extraction
  * (`props` exercises the Graph-JSON access patterns of
  * `utility_sp_grant_siteselected.py:69-75`), funnels and rates.
  *
  * Scale notes (100 TB):
  *  - every query groups/partitions on (user_id | event_type | bucketed
  *    time), all high-cardinality or bounded keys — shuffles hash on
  *    those keys and AQE coalesces;
  *  - sessionization state per user is bounded by that user's events;
  *    the window sort is per-partition after the shuffle, no global sort;
  *  - JSON extraction is a codegen'd expression on the scan, pushed
  *    alongside column pruning (only `props` is read for it).
  */
object Events {

  /** Microsecond-precision event time — both Spark (`unix_micros`) and
    * DuckDB (`epoch_us`) agree exactly; second-precision casts would
    * truncate and misclassify boundary gaps. */
  private val tsUs = unix_micros(col("ts"))

  private val sessionGapUs = 30L * 60 * 1000000 // 30 min in micros

  /** e35's planted transport jitter (µs): a Knuth multiplicative hash
    * of event_id, < 300 s — the fixture's events are event-time
    * ordered, so this is the deterministic stand-in for arrival
    * disorder. Shared with the StreamsSpec watermark-parity test so
    * the batch audit and the streaming drop check replay the SAME
    * arrival sequence. Portable integer arithmetic that DuckDB
    * replays literally; the id reduces mod 2³¹−1 BEFORE the multiply
    * so the product stays < 2⁶³ at ANY id scale (the sf1 rehearsal's
    * 10⁹-offset copies overflowed the unreduced form) — an identity
    * at every gate SF, where ids are < 2³¹. */
  private[graft] def plantedJitterUs(eventId: Column): Column =
    (pmod(eventId, lit(2147483647L)) * lit(2654435761L)) %
      lit(2147483647L) % lit(300L) * lit(1000000L)

  /** Sessionize: new session when the gap to the previous event of the
    * same user exceeds the gap parameter (classic lag + running-sum). */
  private def sessionized(df: org.apache.spark.sql.DataFrame) = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    df.withColumn("prev_us", lag(tsUs, 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull ||
          tsUs - col("prev_us") > sessionGapUs, 1L).otherwise(0L))
      .withColumn("session_id",
        sum(col("is_new")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  private def sessionizedSqlWith(splitOp: String) =
    s"""SELECT user_id, ts, event_id, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS session_id
       FROM (
         SELECT *, CASE WHEN prev_us IS NULL
             OR epoch_us(ts) - prev_us $splitOp 1800000000 THEN 1 ELSE 0 END
           AS is_new
         FROM (
           SELECT user_id, ts, event_id, value,
             LAG(epoch_us(ts), 1) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_us
           FROM events) a) b"""

  /** Gap-based sessionization oracle (split when gap > 30 min) — the
    * twin of [[sessionized]]. */
  private val sessionizedSql = sessionizedSqlWith(">")

  /** `session_window` semantics oracle: Spark merges an event into the
    * open session only when it lands STRICTLY inside (start < prev
    * start + gap), i.e. a gap of exactly 30 min starts a NEW session —
    * unlike [[sessionized]]'s `>` split. The e04 oracle must use `>=`
    * or a boundary-exact fixture event would diverge. */
  private val sessionWindowSql = sessionizedSqlWith(">=")

  val specs: Seq[QuerySpec] = Seq(

    // ---- per-type global stats ----
    QuerySpec(
      "e01_type_stats",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("event_type"))
          .agg(count(lit(1)).as("n"),
            dsum128(col("value")).as("total_value"),
            davg128(col("value")).as("avg_value"),
            countDistinct(col("user_id")).as("n_users"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, COUNT(1) AS n,
        ${dsumSql("value")} AS total_value,
        ${davgSql("value")} AS avg_value,
        COUNT(DISTINCT user_id) AS n_users
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- tumbling 1-hour windows (batch window()) ----
    QuerySpec(
      "e02_hourly_windows",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(window(col("ts"), "1 hour").as("w"))
          .agg(count(lit(1)).as("n"), dsum128(col("value")).as("total_value"))
          .select(col("w.start").as("hour_start"), col("n"), col("total_value"))
          .orderBy("hour_start")
      },
      Some(s"""SELECT date_trunc('hour', ts) AS hour_start, COUNT(1) AS n,
        ${dsumSql("value")} AS total_value
      FROM events GROUP BY 1 ORDER BY 1""")),

    // ---- gap-based sessionization (lag + running sum) ----
    QuerySpec(
      "e03_sessionization",
      (s, d) => {
        sessionized(Tables.events(s, d))
          .groupBy(col("user_id"), col("session_id"))
          .agg(count(lit(1)).as("n_events"),
            min(col("ts")).as("session_start"),
            max(col("ts")).as("session_end"),
            ((max(tsUs) - min(tsUs)) / 1000000.0).as("duration_sec"))
          .orderBy("user_id", "session_id")
      },
      Some(s"""SELECT user_id, session_id, COUNT(1) AS n_events,
        MIN(ts) AS session_start, MAX(ts) AS session_end,
        (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) / 1000000.0 AS duration_sec
      FROM ($sessionizedSql) s
      GROUP BY user_id, session_id
      ORDER BY user_id, session_id""")),

    // ---- native session_window (same sessions, engine operator) ----
    QuerySpec(
      "e04_session_window",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(col("user_id"), session_window(col("ts"), "30 minutes").as("w"))
          .agg(count(lit(1)).as("n_events"))
          .select(col("user_id"), col("w.start").as("session_start"),
            col("w.end").as("session_end"), col("n_events"))
          .orderBy("user_id", "session_start")
      },
      Some(s"""SELECT user_id, MIN(ts) AS session_start,
        MAX(ts) + INTERVAL 30 MINUTE AS session_end, COUNT(1) AS n_events
      FROM ($sessionWindowSql) s
      GROUP BY user_id, session_id
      ORDER BY user_id, session_start""")),

    // ---- JSON property extraction (props = {"k": int}) ----
    QuerySpec(
      "e05_json_props",
      (s, d) => {
        val k = get_json_object(col("props"), "$.k").cast(IntegerType)
        Tables.events(s, d)
          .withColumn("k", k)
          .groupBy(col("event_type"))
          .agg(min(col("k")).as("min_k"), max(col("k")).as("max_k"),
            davg128(col("k")).as("avg_k"),
            sum(when(col("k") > 50, 1L).otherwise(0L)).as("n_high"))
          .orderBy("event_type")
      },
      Some(s"""SELECT event_type, MIN(k) AS min_k, MAX(k) AS max_k,
        ${davgSql("k")} AS avg_k,
        CAST(SUM(CASE WHEN k > 50 THEN 1 ELSE 0 END) AS BIGINT) AS n_high
      FROM (SELECT event_type,
              CAST(json_extract_string(props, '$$.k') AS INT) AS k
            FROM events) t
      GROUP BY event_type ORDER BY event_type""")),

    // ---- signup → purchase funnel within 7 days ----
    QuerySpec(
      "e06_funnel",
      (s, d) => {
        val ev = Tables.events(s, d)
        val sign = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(col("ts")).as("signup_ts"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), col("ts").as("p_ts"))
        sign.join(pur,
            col("user_id") === col("p_user") &&
            col("p_ts") >= col("signup_ts") &&
            col("p_ts") <= col("signup_ts") + expr("INTERVAL 7 DAYS"), "left")
          .agg(countDistinct(col("user_id")).as("n_signed_up"),
            countDistinct(when(col("p_ts").isNotNull, col("user_id")))
              .as("n_converted"))
      },
      Some("""SELECT COUNT(DISTINCT s.user_id) AS n_signed_up,
        COUNT(DISTINCT CASE WHEN p.p_ts IS NOT NULL THEN s.user_id END)
          AS n_converted
      FROM (SELECT user_id, MIN(ts) AS signup_ts FROM events
            WHERE event_type = 'signup' GROUP BY user_id) s
      LEFT JOIN (SELECT user_id AS p_user, ts AS p_ts FROM events
                 WHERE event_type = 'purchase') p
        ON s.user_id = p.p_user AND p.p_ts >= s.signup_ts
           AND p.p_ts <= s.signup_ts + INTERVAL 7 DAY""")),

    // ---- per-type top-3 most active users ----
    QuerySpec(
      "e07_top_users_per_type",
      (s, d) => {
        val counts = Tables.events(s, d)
          .groupBy(col("event_type"), col("user_id"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(desc("n"), col("user_id"))
        counts.withColumn("rk", row_number().over(w))
          .filter(col("rk") <= 3)
          .orderBy("event_type", "rk")
      },
      Some("""SELECT event_type, user_id, n, rk FROM (
        SELECT event_type, user_id, n,
          CAST(ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY n DESC, user_id) AS INT) AS rk
        FROM (SELECT event_type, user_id, COUNT(1) AS n
              FROM events GROUP BY event_type, user_id) c) r
      WHERE rk <= 3 ORDER BY event_type, rk""")),

    // ---- daily error rate + distinct users (conditional agg) ----
    QuerySpec(
      "e08_daily_error_rate",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n_total"),
            sum(when(col("event_type") === "error", 1L).otherwise(0L))
              .as("n_errors"),
            countDistinct(col("user_id")).as("n_users"))
          .withColumn("error_rate",
            col("n_errors").cast("double") / col("n_total").cast("double"))
          .orderBy("day")
      },
      Some("""SELECT day, n_total, n_errors, n_users,
        CAST(n_errors AS DOUBLE) / CAST(n_total AS DOUBLE) AS error_rate
      FROM (SELECT date_trunc('day', ts) AS day, COUNT(1) AS n_total,
              CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                AS BIGINT) AS n_errors,
              COUNT(DISTINCT user_id) AS n_users
            FROM events GROUP BY 1) t
      ORDER BY day""")),

    // ---- approximate distinct users per day (HLL; algorithm differs
    //      from DuckDB's → rows-only; exact twin is e08.n_users) ----
    QuerySpec(
      "e09_approx_users_daily",
      (s, d) => {
        Tables.events(s, d)
          .groupBy(date_trunc("day", col("ts")).as("day"))
          .agg(approx_count_distinct(col("user_id")).as("approx_users"))
          .orderBy("day")
      },
      None),

    // ---- AS-OF join: each purchase matched to the user's most recent
    //      click at-or-before it. Spark lacks a native as-of join; the
    //      scalable plan is union-the-tagged-streams + one window pass
    //      (shuffle on user_id, per-user sort) — NOT an inequality
    //      join. Ties break on (ts, tag, event_id) so the oracle's
    //      LATERAL top-1 agrees exactly. ----
    QuerySpec(
      "e10_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val clicks = ev.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(0).as("tag"), col("event_id").as("click_id"))
        val purchases = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts"), col("event_id"),
            lit(1).as("tag"), lit(null).cast("long").as("click_id"))
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("tag"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        clicks.unionAll(purchases)
          .withColumn("asof_click", last(col("click_id"), ignoreNulls = true).over(w))
          .filter(col("tag") === 1)
          .select(col("event_id").as("purchase_id"), col("user_id"),
            col("asof_click").as("click_id"))
          .orderBy("purchase_id")
      },
      Some("""SELECT p.event_id AS purchase_id, p.user_id, c.click_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      LEFT JOIN LATERAL (
        SELECT event_id AS click_id FROM events c
        WHERE c.event_type = 'click' AND c.user_id = p.user_id
          AND c.ts <= p.ts
        ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON true
      ORDER BY purchase_id""")),

    // ---- range (interval) join: purchases within 30 min after an
    //      error, same user. Scalable plan: both sides bucketed to the
    //      interval width, equi-join on (user, bucket) with the error
    //      probing its own + next bucket, exact predicate after —
    //      bounded fan-out instead of an inequality nested loop. ----
    QuerySpec(
      "e11_range_join",
      (s, d) => {
        val gapUs = 30L * 60 * 1000000
        val ev = Tables.events(s, d)
        val errs = ev.filter(col("event_type") === "error")
          .select(col("user_id"), col("event_id").as("error_id"),
            unix_micros(col("ts")).as("e_us"))
          .withColumn("bucket",
            explode(array((col("e_us") / gapUs).cast("long"),
              (col("e_us") / gapUs).cast("long") + 1)))
        val purch = ev.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id").as("purchase_id"),
            unix_micros(col("ts")).as("p_us"),
            (unix_micros(col("ts")) / gapUs).cast("long").as("bucket"))
        errs.join(purch, Seq("user_id", "bucket"))
          .filter(col("p_us") > col("e_us") &&
            col("p_us") <= col("e_us") + gapUs)
          .select(col("error_id"), col("purchase_id"), col("user_id"),
            ((col("p_us") - col("e_us")) / 1000000.0).as("gap_sec"))
          .orderBy("error_id", "purchase_id")
      },
      Some("""SELECT e.event_id AS error_id, p.event_id AS purchase_id,
        e.user_id,
        (epoch_us(p.ts) - epoch_us(e.ts)) / 1000000.0 AS gap_sec
      FROM (SELECT * FROM events WHERE event_type = 'error') e
      JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        ON e.user_id = p.user_id
        AND epoch_us(p.ts) > epoch_us(e.ts)
        AND epoch_us(p.ts) <= epoch_us(e.ts) + 1800000000
      ORDER BY error_id, purchase_id""")),

    // ---- schema-full JSON parsing: from_json → typed struct (the
    //      production path for the Graph documents of SURVEY §1.1;
    //      e05's get_json_object is the ad-hoc twin) ----
    QuerySpec(
      "e12_from_json",
      (s, d) => {
        import org.apache.spark.sql.types.{StructField, StructType}
        val schema = StructType(Seq(StructField("k", IntegerType)))
        Tables.events(s, d)
          .withColumn("p", from_json(col("props"), schema))
          .filter(col("user_id") < 10)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"),
            min(col("p.k")).as("min_k"), max(col("p.k")).as("max_k"),
            davg128(col("p.k")).as("avg_k"))
          .orderBy("user_id")
      },
      Some(s"""SELECT user_id, COUNT(1) AS n, MIN(k) AS min_k,
        MAX(k) AS max_k, ${davgSql("k")} AS avg_k
      FROM (SELECT user_id,
              CAST(json_extract_string(props, '$$.k') AS INT) AS k
            FROM events WHERE user_id < 10) t
      GROUP BY user_id ORDER BY user_id""")),

    // ---- per-event session features (training-data featurization):
    //      position within session, seconds since session start ----
    QuerySpec(
      "e13_session_features",
      (s, d) => {
        val bySession = Window
          .partitionBy(col("user_id"), col("session_id"))
          .orderBy(col("ts"), col("event_id"))
        sessionized(Tables.events(s, d))
          .filter(col("user_id") < 10)
          .withColumn("pos_in_session", row_number().over(bySession))
          .withColumn("sec_into_session",
            (tsUs - min(tsUs).over(bySession)) / 1000000.0)
          .select(col("event_id"), col("user_id"), col("session_id"),
            col("pos_in_session"), col("sec_into_session"))
          .orderBy("event_id")
      },
      Some(s"""SELECT event_id, user_id, session_id,
        CAST(ROW_NUMBER() OVER w AS INT) AS pos_in_session,
        (epoch_us(ts) - MIN(epoch_us(ts)) OVER w) / 1000000.0
          AS sec_into_session
      FROM (SELECT * FROM ($sessionizedSql) x WHERE user_id < 10) s
      WINDOW w AS (PARTITION BY user_id, session_id
        ORDER BY ts, event_id)
      ORDER BY event_id""")),

    // ---- cohort retention: users grouped by first-activity day, how
    //      many return k days later. Two shuffles total: per-user min
    //      (partial-agg'd) + the (cohort, offset) distinct-count;
    //      the first-day table joins back broadcast-ish on user_id ----
    QuerySpec(
      "e14_cohort_retention",
      (s, d) => {
        val ev = Tables.events(s, d)
        val first = ev.groupBy(col("user_id"))
          .agg(min(to_date(col("ts"))).as("cohort_day"))
        ev.select(col("user_id"), to_date(col("ts")).as("day"))
          .join(first, "user_id")
          .select(col("cohort_day"),
            datediff(col("day"), col("cohort_day")).as("day_offset"),
            col("user_id"))
          .filter(col("day_offset") <= 7)
          .groupBy(col("cohort_day"), col("day_offset"))
          .agg(countDistinct(col("user_id")).as("n_active"))
          .orderBy("cohort_day", "day_offset")
      },
      Some("""SELECT cohort_day, CAST(day_offset AS INT) AS day_offset,
        COUNT(DISTINCT user_id) AS n_active
      FROM (
        SELECT e.user_id, f.cohort_day,
          DATE_DIFF('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset
        FROM events e
        JOIN (SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
              FROM events GROUP BY user_id) f
          ON e.user_id = f.user_id) t
      WHERE day_offset <= 7
      GROUP BY cohort_day, day_offset
      ORDER BY cohort_day, day_offset""")),

    // ---- daily volume anomalies per event type: z-score of each
    //      day's count against that type's own mean/stddev. The
    //      moments come from INTEGER sums (count, count²) so both
    //      engines compute bit-identical doubles — the builtin STDDEV
    //      is avoided on purpose (Welford vs two-pass accumulate in a
    //      different order). Two bounded shuffles: (type, day) counts,
    //      then per-type moments broadcast back onto ~types×days rows. ----
    QuerySpec(
      "e15_daily_anomaly",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            date_trunc("day", col("ts")).as("day"))
          .agg(count(lit(1)).as("n"))
        val moments = daily.groupBy(col("event_type"))
          .agg(sum(col("n")).as("sn"),
            sum(col("n") * col("n")).as("sn2"),
            count(lit(1)).as("days"))
          .select(col("event_type"),
            (col("sn").cast("double") / col("days")).as("mean_n"),
            sqrt((col("sn2").cast("double") -
              col("sn").cast("double") * col("sn").cast("double") /
                col("days")) / (col("days") - 1)).as("sd_n"))
        daily.join(broadcast(moments), "event_type")
          .select(col("event_type"), col("day"), col("n"),
            ((col("n").cast("double") - col("mean_n")) / col("sd_n"))
              .as("z"))
          .withColumn("is_anomaly", abs(col("z")) >= 2.0)
          .orderBy("event_type", "day")
      },
      Some("""SELECT d.event_type, d.day, d.n,
        (CAST(d.n AS DOUBLE) - m.mean_n) / m.sd_n AS z,
        abs((CAST(d.n AS DOUBLE) - m.mean_n) / m.sd_n) >= 2.0 AS is_anomaly
      FROM (SELECT event_type, date_trunc('day', ts) AS day,
              COUNT(1) AS n
            FROM events GROUP BY 1, 2) d
      JOIN (SELECT event_type,
              CAST(SUM(n) AS DOUBLE) / COUNT(1) AS mean_n,
              sqrt((CAST(SUM(n * n) AS DOUBLE) -
                CAST(SUM(n) AS DOUBLE) * CAST(SUM(n) AS DOUBLE)
                  / COUNT(1)) / (COUNT(1) - 1)) AS sd_n
            FROM (SELECT event_type, date_trunc('day', ts) AS day,
                    COUNT(1) AS n
                  FROM events GROUP BY 1, 2) i
            GROUP BY event_type) m
        ON d.event_type = m.event_type
      ORDER BY d.event_type, d.day""")),

    // ---- ordered-sequence pattern matching (the MATCH_RECOGNIZE /
    //      CEP shape, reduced to relational ops): each user's full
    //      event history becomes one time-ordered type string, and the
    //      contiguous funnel view>click>purchase is counted by a
    //      row-local regex — e06 asks "did a purchase follow a signup
    //      within 7 days"; this asks "how many times did the EXACT
    //      ordered walk occur". Determinism: the order key is
    //      (ts, event_id) so equal timestamps cannot flip the string
    //      between engines; the literal pattern has no regex
    //      metacharacters, and both engines count non-overlapping
    //      occurrences left-to-right. One shuffle on user_id; per-user
    //      state is that user's history (at 100 TB: window the
    //      sequence per session — e03's gap rule — or cap it with the
    //      t27 rank-then-aggregate trick; the pattern scan itself
    //      stays row-local either way). ----
    QuerySpec(
      "e16_funnel_pattern",
      (s, d) => {
        val seqCol = concat_ws(">",
          transform(
            sort_array(collect_list(struct(
              col("ts"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")))
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), seqCol.as("seq"))
          .select(col("user_id"), col("n_events"),
            regexp_count(col("seq"), lit("view>click>purchase"))
              .cast("int").as("n_funnels"))
          .withColumn("converted", col("n_funnels") >= 1)
          .orderBy("user_id")
      },
      Some("""SELECT user_id, COUNT(1) AS n_events,
        CAST(len(regexp_extract_all(
          string_agg(event_type, '>' ORDER BY ts, event_id),
          'view>click>purchase')) AS INT) AS n_funnels,
        len(regexp_extract_all(
          string_agg(event_type, '>' ORDER BY ts, event_id),
          'view>click>purchase')) >= 1 AS converted
      FROM events GROUP BY user_id ORDER BY user_id""")),

    // ---- first-order user-journey Markov chain: transition counts
    //      and row-normalized probabilities between consecutive event
    //      types per user (the journey-analytics companion of e16 —
    //      e16 matches a KNOWN walk, this estimates the walk
    //      distribution itself). LAG over (user_id | ts, event_id)
    //      pairs each event with its successor — one shuffle on
    //      user_id; the count is a bounded-key groupBy (≤ types²
    //      rows); probabilities divide two exact longs inside each
    //      prev-type row group (a broadcast-sized join), so the
    //      doubles are bit-identical across engines and the oracle
    //      hash-matches. At 100 TB the transition matrix stays types²
    //      — the per-user pairing is the only data-sized stage and it
    //      rides the same user_id shuffle as sessionization. ----
    QuerySpec(
      "e17_markov_transitions",
      (s, d) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val pairs = Tables.events(s, d)
          .select(col("user_id"), col("event_type").as("cur"),
            lag(col("event_type"), 1).over(w).as("prev"))
          .filter(col("prev").isNotNull)
        val counts = pairs.groupBy(col("prev"), col("cur"))
          .agg(count(lit(1)).as("n"))
        val outTot = counts.groupBy(col("prev"))
          .agg(sum(col("n")).as("tot"))
        counts.join(broadcast(outTot), "prev")
          .select(col("prev"), col("cur"), col("n"),
            (col("n").cast("double") / col("tot").cast("double"))
              .as("p"))
          .orderBy("prev", "cur")
      },
      Some("""WITH pairs AS (
        SELECT LAG(event_type, 1) OVER (PARTITION BY user_id
            ORDER BY ts, event_id) AS prev,
          event_type AS cur
        FROM events),
      counts AS (
        SELECT prev, cur, COUNT(1) AS n FROM pairs
        WHERE prev IS NOT NULL GROUP BY prev, cur),
      tot AS (SELECT prev, CAST(SUM(n) AS BIGINT) AS tot
              FROM counts GROUP BY prev)
      SELECT c.prev, c.cur, c.n,
        CAST(c.n AS DOUBLE) / CAST(t.tot AS DOUBLE) AS p
      FROM counts c JOIN tot t ON c.prev = t.prev
      ORDER BY c.prev, c.cur""")),

    // ---- time-series resample + forward fill: regularize a sparse
    //      per-type daily series onto a complete date spine and
    //      carry the last observation forward over gaps — the gap-
    //      filling step in front of any downstream forecasting /
    //      anomaly model (a 1%-of-users slice makes the gaps real).
    //      The spine is types × date range — CONTROL-sized (it grows
    //      with the calendar, not the corpus) and generated by
    //      sequence(), never scanned; the data-sized work is one
    //      daily partial-agg shuffle. The fill is last(ignoreNulls)
    //      over (type, day) windows — per-type partitions, bounded
    //      by days, no global window. Averages use the decimal-sum
    //      form so carried values are bitwise identical in both
    //      engines. ----
    QuerySpec(
      "e18_resample_ffill",
      (s, d) => {
        val sliced = Tables.events(s, d)
          .filter(pmod(col("user_id"), lit(100)) === 7)
          .select(col("event_type"), to_date(col("ts")).as("day"),
            col("value"))
        val daily = sliced.groupBy(col("event_type"), col("day"))
          .agg(davg128(col("value")).as("day_avg"), count(lit(1)).as("n"))
        val bounds = sliced.agg(min(col("day")).as("lo"),
          max(col("day")).as("hi"))
        val spine = sliced.select("event_type").distinct()
          .crossJoin(broadcast(bounds))
          .select(col("event_type"),
            explode(sequence(col("lo"), col("hi"),
              expr("interval 1 day"))).as("day"))
        val wFill = Window.partitionBy(col("event_type"))
          .orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, 0)
        spine.join(daily, Seq("event_type", "day"), "left")
          .select(col("event_type"), col("day"),
            coalesce(col("n"), lit(0L)).as("n"), col("day_avg"),
            last(col("day_avg"), ignoreNulls = true).over(wFill)
              .as("filled_avg"))
          .orderBy("event_type", "day")
      },
      Some(s"""WITH sliced AS (
        SELECT event_type, CAST(ts AS DATE) AS day, value
        FROM events WHERE user_id % 100 = 7),
      daily AS (
        SELECT event_type, day, ${davgSql("value")} AS day_avg,
          COUNT(1) AS n
        FROM sliced GROUP BY 1, 2),
      bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM sliced),
      spine AS (
        SELECT t.event_type,
          CAST(unnest(generate_series(b.lo, b.hi, INTERVAL 1 DAY))
            AS DATE) AS day
        FROM (SELECT DISTINCT event_type FROM sliced) t, bounds b)
      SELECT s.event_type, s.day,
        CAST(COALESCE(d.n, 0) AS BIGINT) AS n, d.day_avg,
        last_value(d.day_avg IGNORE NULLS) OVER (
          PARTITION BY s.event_type ORDER BY s.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
          AS filled_avg
      FROM spine s LEFT JOIN daily d USING (event_type, day)
      ORDER BY event_type, day""")),

    // ---- VARIANT semi-structured access: `parse_json` ONCE into the
    //      binary-encoded VARIANT type, then typed `variant_get`
    //      extractions — the engine-native successor to per-field
    //      string re-parsing (e05's get_json_object walks the JSON
    //      text once PER FIELD; variant decodes once per row and
    //      fields are O(1) offset lookups, the columnar-shredding
    //      path for open schemas). Integer extractions and sums keep
    //      both engines exact. ----
    QuerySpec(
      "e19_variant_props",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("events_var")
        s.sql("""
          SELECT event_type, COUNT(1) AS n,
            MIN(variant_get(parse_json(props), '$.k', 'long')) AS k_min,
            MAX(variant_get(parse_json(props), '$.k', 'long')) AS k_max,
            SUM(variant_get(parse_json(props), '$.k', 'long')) AS k_sum
          FROM events_var GROUP BY event_type ORDER BY event_type""")
      },
      Some("""SELECT event_type, COUNT(1) AS n,
        MIN(CAST(props->>'k' AS BIGINT)) AS k_min,
        MAX(CAST(props->>'k' AS BIGINT)) AS k_max,
        CAST(SUM(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS k_sum
      FROM events GROUP BY event_type ORDER BY event_type""")),

    // ---- KMV distinct-set algebra: per-type distinct-cohort sketches
    //      that answer UNION and INTERSECTION questions after the
    //      fact — "how many cohorts did A and B share?" without
    //      re-scanning, the question HLL (e09) cannot answer. Each
    //      sketch is the k smallest hashes (mergeable bottom-k —
    //      map-side partials, any merge order, identical sketch). The
    //      pairwise analysis is a SELF-JOIN on the sketch relation —
    //      types² stays in dataflow, and the whole estimator algebra
    //      (bottom-k merge, (k−1)/u_k, union-Jaccard intersection) is
    //      column expressions over the sketch arrays, no driver loop
    //      and no UDF. EXACT REGIME pinned for the oracle: the
    //      sketched key is the user cohort (user_id % 200), so
    //      per-type and union cardinality ≤ 200 < k — the bottom-k IS
    //      the whole set and every estimate is provably exact (t20's
    //      Space-Saving pattern), hash-matched against DuckDB's exact
    //      distinct counts. The estimator path itself is unchanged;
    //      OpsSpec keeps the scale-regime bounds on raw user_id. ----
    QuerySpec(
      "e20_kmv_users",
      (s, d) => {
        import s.implicits._
        val k = 256
        val agg = new graft.functions.Aggregators.Kmv(k)
        val sketches = Tables.events(s, d)
          .select(col("event_type"),
            xxhash64(col("user_id") % 200).as("h"))
          .as[(String, Long)]
          .groupByKey(_._1).mapValues(_._2)
          .agg(agg.toColumn.name("sk"))
          .toDF("event_type", "sk")
        // KMV algebra as column expressions (unsigned hash order)
        def unsigned(c: Column): Column = c.bitwiseXOR(lit(Long.MinValue))
        def u01(c: Column): Column =
          (unsigned(c).cast("double") - lit(Long.MinValue.toDouble)) /
            lit(math.pow(2.0, 64))
        def est(sk: Column): Column =
          when(size(sk) < k, size(sk).cast("double"))
            .otherwise(lit((k - 1).toDouble) / u01(element_at(sk, -1)))
        def kmvMerge(x: Column, y: Column): Column =
          slice(array_sort(array_distinct(concat(x, y)),
            (l, r) => when(unsigned(l) < unsigned(r), -1)
              .when(unsigned(l) > unsigned(r), 1).otherwise(0)), 1, k)
        val joined = sketches.toDF("ta", "ska")
          .join(sketches.toDF("tb", "skb"), col("ta") < col("tb"))
          .withColumn("un", kmvMerge(col("ska"), col("skb")))
        val inter = size(filter(col("un"), h =>
          array_contains(col("ska"), h) && array_contains(col("skb"), h)))
        joined.select(col("ta"), col("tb"),
            est(col("ska")).as("est_a"),
            est(col("skb")).as("est_b"),
            est(col("un")).as("est_union"),
            // ρ·|A∪B|; round because the Jaccard division and multiply
            // round-trip an integer through two float ops
            round(inter.cast("double") / size(col("un")) * est(col("un")))
              .as("est_intersect"))
          .orderBy("ta", "tb")
      },
      Some("""WITH pt AS (
        SELECT DISTINCT event_type, user_id % 200 AS cohort FROM events),
      c AS (SELECT event_type, COUNT(*) AS n FROM pt GROUP BY 1),
      inter AS (
        SELECT a.event_type AS ta, b.event_type AS tb, COUNT(*) AS m
        FROM pt a JOIN pt b
          ON a.cohort = b.cohort AND a.event_type < b.event_type
        GROUP BY 1, 2)
      SELECT ca.event_type AS ta, cb.event_type AS tb,
        CAST(ca.n AS DOUBLE) AS est_a,
        CAST(cb.n AS DOUBLE) AS est_b,
        CAST(ca.n + cb.n - COALESCE(i.m, 0) AS DOUBLE) AS est_union,
        CAST(COALESCE(i.m, 0) AS DOUBLE) AS est_intersect
      FROM c ca JOIN c cb ON ca.event_type < cb.event_type
      LEFT JOIN inter i ON i.ta = ca.event_type AND i.tb = cb.event_type
      ORDER BY ta, tb""")),

    // ---- RANGE frame over event time: trailing-7-day average on a
    //      SPARSE daily series. The frame is a VALUE range (day ≥
    //      current − 6 days), not a row count — on a gappy series a
    //      `ROWS 6 PRECEDING` frame silently reaches weeks back,
    //      which is the classic sliding-window bug this query's
    //      days_in_win column makes visible. Execution: one daily
    //      partial-agg shuffle, then per-type sorted windows with
    //      BOUNDED frame state (≤7 days); the range comparison rides
    //      the same sort. AVG divides an exact integer sum once →
    //      both engines emit identical doubles. ----
    QuerySpec(
      "e21_range_frame",
      (s, d) => {
        Tables.events(s, d).createOrReplaceTempView("events_rf")
        s.sql("""
          WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day, COUNT(1) AS n
            FROM events_rf WHERE user_id % 100 = 7 GROUP BY 1, 2)
          SELECT event_type, day, n,
            CAST(AVG(n) OVER (PARTITION BY event_type ORDER BY day
              RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
              AS DOUBLE) AS avg7,
            COUNT(1) OVER (PARTITION BY event_type ORDER BY day
              RANGE BETWEEN INTERVAL 6 DAYS PRECEDING AND CURRENT ROW)
              AS days_in_win
          FROM daily ORDER BY event_type, day""")
      },
      Some("""WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day, COUNT(1) AS n
        FROM events WHERE user_id % 100 = 7 GROUP BY 1, 2)
      SELECT event_type, day, n,
        CAST(AVG(n) OVER (PARTITION BY event_type ORDER BY day
          RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
          AS DOUBLE) AS avg7,
        CAST(COUNT(1) OVER (PARTITION BY event_type ORDER BY day
          RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW)
          AS BIGINT) AS days_in_win
      FROM daily ORDER BY event_type, day""")),

    // ---- SCD TYPE 2 interval construction: compress each user's
    //      event stream into validity intervals of their current
    //      event_type — the warehouse dimension-history build
    //      (valid_from / valid_to / is_current) from an append-only
    //      log. Islands pattern: a change marker vs lag, running sum
    //      → run id, one group per run, then valid_to = next run's
    //      valid_from via lead. Two windows, both partitioned by
    //      user_id (one hash shuffle, per-user sorted state); the
    //      second window runs on the RUNS relation, already
    //      compressed. Ordering inside a user is (ts, event_id) —
    //      the unique tiebreak that makes the whole history a pure
    //      function of the log, so the oracle hash-checks it.
    //      Cohort-restricted like e21 to keep test output bounded;
    //      the plan is cohort-free at 100 TB (user_id is the only
    //      shuffle key either way). ----
    QuerySpec(
      "e22_scd2_intervals",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        val prevType = lag(col("event_type"), 1).over(w)
        val runs = Tables.events(s, d)
          .filter(col("user_id") % 50 === 7)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("chg",
            when(prevType.isNull || prevType =!= col("event_type"), 1)
              .otherwise(0))
          .withColumn("seq", sum(col("chg"))
            .over(w.rowsBetween(Window.unboundedPreceding,
              Window.currentRow)).cast("int"))
          .groupBy(col("user_id"), col("seq"), col("event_type"))
          .agg(min(col("ts")).as("valid_from"),
            count(lit(1)).as("n_events"))
        val w2 = Window.partitionBy(col("user_id")).orderBy(col("seq"))
        runs
          .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
          .withColumn("is_current", col("valid_to").isNull)
          .orderBy("user_id", "seq")
      },
      Some("""WITH ev AS (
        SELECT user_id, ts, event_id, event_type FROM events
        WHERE user_id % 50 = 7),
      m AS (
        SELECT *, CASE WHEN lag(event_type) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
          OR lag(event_type) OVER
            (PARTITION BY user_id ORDER BY ts, event_id) <> event_type
          THEN 1 ELSE 0 END AS chg
        FROM ev),
      r AS (
        SELECT *, CAST(SUM(chg) OVER (PARTITION BY user_id
          ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS INT)
          AS seq
        FROM m),
      g AS (
        SELECT user_id, seq, event_type, MIN(ts) AS valid_from,
          CAST(COUNT(1) AS BIGINT) AS n_events
        FROM r GROUP BY 1, 2, 3)
      SELECT user_id, seq, event_type, valid_from,
        lead(valid_from) OVER (PARTITION BY user_id ORDER BY seq)
          AS valid_to,
        (lead(valid_from) OVER (PARTITION BY user_id ORDER BY seq)
          IS NULL) AS is_current,
        n_events
      FROM g ORDER BY user_id, seq""")),

    // ---- EXPONENTIAL DECAY over a trailing window: per-type daily
    //      revenue discounted at 2^-age over the last 8 days — the
    //      time-series smoothing primitive (EWMA-style) that naive
    //      float plans can't oracle-check. Exactness design: daily
    //      revenue is summed in INTEGER CENTS (floor(value*100) —
    //      floor, not round: HALF_UP vs banker's diverges between
    //      engines), the decay weight 2^(7-age) is an exact integer,
    //      so the weighted numerator is pure int64 arithmetic —
    //      order-independent, overflow-free (≪ 2^53) — and the single
    //      final division is one deterministic IEEE op. Scale shape:
    //      one hash shuffle (groupBy type×day), then a RANGE-framed
    //      window over the already-compressed daily relation — the
    //      window input is |types|·|days| rows regardless of event
    //      count. ----
    QuerySpec(
      "e23_decayed_revenue",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
          .agg(sum(floor(col("value") * 100).cast("long")).as("cents"))
          .withColumn("di",
            datediff(col("day").cast("date"), to_date(lit("1970-01-01"))))
        val w = Window.partitionBy(col("event_type")).orderBy(col("di"))
          .rangeBetween(-7, 0)
        daily
          .withColumn("wl",
            collect_list(struct(col("di").as("d"), col("cents").as("c")))
              .over(w))
          .select(col("event_type"), col("day"), col("cents"),
            (aggregate(col("wl"), lit(0L), (acc, e) =>
              acc + e.getField("c") *
                pow(lit(2.0), lit(7) - (col("di") - e.getField("d")))
                  .cast("long"))
              .cast("double") / lit(12800.0)).as("decayed_rev"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
        SELECT event_type, date_trunc('day', ts) AS day,
          CAST(SUM(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2),
      d2 AS (
        SELECT *, CAST(CAST(day AS DATE) - DATE '1970-01-01' AS INT) AS di
        FROM daily)
      SELECT a.event_type, a.day, a.cents,
        CAST(SUM(b.cents * CAST(power(2, 7 - (a.di - b.di)) AS BIGINT))
          AS DOUBLE) / 12800.0 AS decayed_rev
      FROM d2 a JOIN d2 b
        ON a.event_type = b.event_type AND b.di BETWEEN a.di - 7 AND a.di
      GROUP BY a.event_type, a.day, a.cents
      ORDER BY a.event_type, a.day""")),

    // ---- LAST-TOUCH ATTRIBUTION: credit each purchase's value to the
    //      user's most recent preceding non-purchase event type (the
    //      "channel"), 'direct' when the purchase is the user's first
    //      touch. The conditional last_value(... IGNORE NULLS) over a
    //      rows-to-1-preceding frame is the attribution primitive;
    //      revenue re-aggregates with the decimal-exact dsum so the
    //      rollup hash-matches. One shuffle on user_id for the window,
    //      one on channel (5 values) for the rollup. ----
    QuerySpec(
      "e24_attribution",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        Tables.events(s, d)
          .withColumn("channel",
            last(when(col("event_type") =!= "purchase", col("event_type")),
              ignoreNulls = true).over(w))
          .filter(col("event_type") === "purchase")
          .select(coalesce(col("channel"), lit("direct")).as("channel"),
            col("value"))
          .groupBy("channel")
          .agg(count(lit(1)).as("n_purchases"),
            dsum128(col("value")).as("revenue"),
            davg128(col("value")).as("avg_purchase"))
          .orderBy("channel")
      },
      Some(s"""WITH attrib AS (
        SELECT COALESCE(LAST_VALUE(CASE WHEN event_type <> 'purchase'
              THEN event_type END IGNORE NULLS)
            OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            'direct') AS channel,
          event_type, value
        FROM events)
      SELECT channel, COUNT(1) AS n_purchases,
        ${dsumSql("value")} AS revenue,
        ${davgSql("value")} AS avg_purchase
      FROM attrib WHERE event_type = 'purchase'
      GROUP BY channel ORDER BY channel""")),

    // ---- sweep-line interval overlap: peak concurrent sessions per
    //      day. Sessions (e03's gap rule) become ±1 deltas at their
    //      endpoints; same-instant deltas MERGE to a net (= ends
    //      processed before starts — a session ending exactly as
    //      another starts never overlaps it, and zero-duration
    //      sessions never count). The running sum is the textbook
    //      scale-killer (one global ordered window), so it ships as a
    //      DISTRIBUTED prefix sum: within-day running sums partitioned
    //      by day (parallel, data-sized), then a day-level carry table
    //      (bounded by distinct days — tiny forever) cumulated in one
    //      single-partition window over days only. A day's peak must
    //      include the overnight carry itself: a day of pure endings
    //      peaks at its first instant, BEFORE any delta lands. ----
    QuerySpec(
      "e25_peak_concurrency",
      (s, d) => {
        // persisted: both delta branches read it — without the persist
        // the sessionization window + min/max aggregate run twice
        val sess = graft.Scoped.persist(
          sessionized(Tables.events(s, d))
            .groupBy(col("user_id"), col("session_id"))
            .agg(min(col("ts")).as("st"), max(col("ts")).as("en")))
        val deltas = sess.select(col("st").as("ts"), lit(1L).as("delta"))
          .union(sess.select(col("en").as("ts"), lit(-1L).as("delta")))
          .groupBy(col("ts")).agg(sum(col("delta")).as("net"))
          .withColumn("day", to_date(col("ts")))
        val byDay = Window.partitionBy(col("day")).orderBy(col("ts"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val perDay = deltas
          .withColumn("run", sum(col("net")).over(byDay))
          .groupBy(col("day"))
          .agg(max(col("run")).as("peak_rel"), sum(col("net")).as("day_net"))
        // day SPINE: a day wholly inside an open session has no delta
        // rows, yet its peak is the overnight carry — without the fill
        // such days would be silently absent and read as zero. The
        // spine is bounded by calendar time, like the carry table.
        val spine = perDay
          .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
          .select(explode(sequence(col("d0"), col("d1"))).as("day"))
        val overDays = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, -1)
        spine.join(perDay, Seq("day"), "left")
          .withColumn("day_net", coalesce(col("day_net"), lit(0L)))
          .withColumn("carry",
            coalesce(sum(col("day_net")).over(overDays), lit(0L)))
          .select(col("day"),
            when(col("peak_rel").isNotNull,
              greatest(col("carry"), col("carry") + col("peak_rel")))
              .otherwise(col("carry")).as("peak_concurrent"),
            (col("carry") + col("day_net")).as("open_at_eod"))
          .orderBy("day")
      },
      Some(s"""WITH sess AS (
        SELECT user_id, session_id, MIN(ts) AS st, MAX(ts) AS en
        FROM ($sessionizedSql) x GROUP BY user_id, session_id),
      deltas AS (
        SELECT ts, CAST(SUM(delta) AS BIGINT) AS net FROM (
          SELECT st AS ts, 1 AS delta FROM sess
          UNION ALL SELECT en AS ts, -1 AS delta FROM sess) u
        GROUP BY ts),
      runs AS (
        SELECT CAST(ts AS DATE) AS day, net,
          CAST(SUM(net) OVER (ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
            AS run
        FROM deltas),
      per_day AS (
        SELECT day, CAST(MAX(run) AS BIGINT) AS peak_run,
          CAST(SUM(net) AS BIGINT) AS day_net
        FROM runs GROUP BY day),
      spine AS (
        SELECT CAST(unnest(generate_series(
          (SELECT MIN(day) FROM per_day),
          (SELECT MAX(day) FROM per_day),
          INTERVAL 1 DAY)) AS DATE) AS day),
      filled AS (
        SELECT s.day, p.peak_run, COALESCE(p.day_net, 0) AS day_net
        FROM spine s LEFT JOIN per_day p USING (day))
      SELECT day,
        CASE WHEN peak_run IS NOT NULL
          THEN greatest(carry, peak_run) ELSE carry END
          AS peak_concurrent,
        carry + day_net AS open_at_eod
      FROM (
        SELECT day, peak_run, day_net,
          CAST(COALESCE(SUM(day_net) OVER (ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
            AS BIGINT) AS carry
        FROM filled) t
      ORDER BY day""")),

    // ---- sliding-window COUNT(DISTINCT): rolling 7-day active users
    //      (DAU/WAU/stickiness). A windowed distinct cannot ride a
    //      running sum — distinct is not subtractable — and the naive
    //      per-day re-scan is O(days · window). The scale shape:
    //      dedup to (day, user) FIRST (the only data-sized shuffle),
    //      then explode each pair to the ≤7 observation days it
    //      serves and count distinct users per day — a bounded 7×
    //      fan-out of the deduped relation in place of a sliding
    //      re-scan, the same trick as e11's range-join bucketing.
    //      Report days come from the activity spine, so the relation
    //      is a pure function of the log. ----
    QuerySpec(
      "e26_rolling_wau",
      (s, d) => {
        // persisted: three branches (fan-out, spine, dau) read it —
        // without the persist each re-runs the scan + distinct
        val pairs = graft.Scoped.persist(
          Tables.events(s, d)
            .select(to_date(col("ts")).as("day"), col("user_id"))
            .distinct())
        val spine = pairs.select(col("day")).distinct()
        val wau = pairs
          .select(col("user_id"),
            explode(sequence(lit(0), lit(6))).as("off"),
            col("day"))
          .select(date_add(col("day"), col("off")).as("day"),
            col("user_id"))
          .join(spine, Seq("day"), "left_semi")
          .groupBy(col("day"))
          .agg(count_distinct(col("user_id")).as("wau"))
        pairs.groupBy(col("day")).agg(count_distinct(col("user_id")).as("dau"))
          .join(wau, Seq("day"))
          .select(col("day"), col("dau"), col("wau"),
            (col("dau").cast("double") / col("wau")).as("stickiness"))
          .orderBy("day")
      },
      Some("""WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
      spine AS (SELECT DISTINCT day FROM pairs),
      wau AS (
        SELECT obs_day AS day, COUNT(DISTINCT user_id) AS wau FROM (
          SELECT day + CAST(i AS INT) AS obs_day, user_id
          FROM (SELECT day, user_id,
                  unnest(generate_series(0, 6)) AS i
                FROM pairs) e) x
        WHERE obs_day IN (SELECT day FROM spine)
        GROUP BY obs_day),
      dau AS (
        SELECT day, COUNT(DISTINCT user_id) AS dau FROM pairs GROUP BY day)
      SELECT d.day, d.dau, w.wau,
        CAST(d.dau AS DOUBLE) / w.wau AS stickiness
      FROM dau d JOIN wau w USING (day)
      ORDER BY d.day""")),

    // ---- inter-arrival statistics: per event type, the distribution
    //      of gaps between a user's consecutive events of that type —
    //      mean/max plus the coefficient of variation (CV ≈ 1 is
    //      Poisson arrivals, CV > 1 is bursty), the queueing signal
    //      behind rate-limit and capacity models. The variance rides
    //      EXACT decimal sums of gap and gap² (gap² needs DECIMAL(38,0)
    //      — microsecond gaps square to 10²⁵), then a fixed sequence
    //      of double ops both engines execute identically — a plain
    //      STDDEV would be order-dependent and unhashable. One lag
    //      window per (user, type) partition + one per-type rollup. ----
    QuerySpec(
      "e27_interarrival",
      (s, d) => {
        val byUserType = Window
          .partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts"), col("event_id"))
        val gaps = Tables.events(s, d)
          .withColumn("prev_us", lag(tsUs, 1).over(byUserType))
          .filter(col("prev_us").isNotNull)
          .select(col("event_type"),
            (tsUs - col("prev_us")).as("gap_us"))
        // squares must ride decimal BEFORE the multiply: µs gaps square
        // past Long.Max (a 5h gap is 2e10 µs → 4e20), and DuckDB's
        // BIGINT multiply would error on the same overflow
        val gapDec = col("gap_us").cast("decimal(19,0)")
        // gap_us stays on the DECIMAL dsum: a single gap can exceed
        // the tick quantizer's per-row long range (|x| < 9.2e8 ⇒
        // gaps over ~15 min don't fit scale-10 ticks in one long)
        gaps.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_gaps"),
            (dsum(col("gap_us")) / count(lit(1)) / 1e6).as("avg_gap_s"),
            (max(col("gap_us")).cast("double") / 1e6).as("max_gap_s"),
            sum(gapDec * gapDec).cast("double").as("sum_sq"),
            dsum(col("gap_us")).as("sum_us"))
          .select(col("event_type"), col("n_gaps"), col("avg_gap_s"),
            col("max_gap_s"),
            (sqrt(greatest(
              col("sum_sq") / col("n_gaps") -
                (col("sum_us") / col("n_gaps")) *
                (col("sum_us") / col("n_gaps")),
              lit(0.0))) /
              (col("sum_us") / col("n_gaps"))).as("cv"))
          .orderBy("event_type")
      },
      Some(s"""WITH gaps AS (
        SELECT event_type,
          epoch_us(ts) - LAG(epoch_us(ts), 1) OVER (
            PARTITION BY user_id, event_type
            ORDER BY ts, event_id) AS gap_us
        FROM events),
      agg AS (
        SELECT event_type, COUNT(1) AS n_gaps,
          ${dsumSql("gap_us")} / COUNT(1) / 1e6 AS avg_gap_s,
          CAST(MAX(gap_us) AS DOUBLE) / 1e6 AS max_gap_s,
          CAST(CAST(SUM(CAST(gap_us AS DECIMAL(19,0)) *
            CAST(gap_us AS DECIMAL(19,0))) AS VARCHAR) AS DOUBLE)
            AS sum_sq,
          ${dsumSql("gap_us")} AS sum_us
        FROM gaps WHERE gap_us IS NOT NULL
        GROUP BY event_type)
      SELECT event_type, n_gaps, avg_gap_s, max_gap_s,
        sqrt(greatest(
          sum_sq / n_gaps - (sum_us / n_gaps) * (sum_us / n_gaps),
          0.0)) / (sum_us / n_gaps) AS cv
      FROM agg ORDER BY event_type""")),

    // ---- trend detection: each (event_type, day) count against its
    //      own trailing 7-day baseline — the monitoring query behind
    //      "is this event spiking today?". The baseline is a RANGE
    //      frame over the integer epoch-day (7 PRECEDING .. 1
    //      PRECEDING), so missing days genuinely shrink the window
    //      instead of silently sliding a row frame over gaps; days
    //      with no prior baseline drop out rather than fabricating a
    //      ratio. All inputs are exact integer counts; the ratio is a
    //      fixed double-division sequence both engines execute
    //      identically → hash-exact. Scale: one shuffle to the
    //      (type, day) aggregate — |types|×|days| rows at ANY corpus
    //      size — then the window rides that tiny relation. ----
    QuerySpec(
      "e28_trending",
      (s, d) => {
        val daily = Tables.events(s, d)
          .groupBy(col("event_type"),
            datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
              .as("day_num"))
          .agg(count(lit(1)).as("n"))
        val w = Window.partitionBy(col("event_type"))
          .orderBy(col("day_num")).rangeBetween(-7, -1)
        daily
          .withColumn("b_sum", sum(col("n")).over(w))
          .withColumn("b_days", count(col("n")).over(w))
          .filter(col("b_days") > 0)
          .select(col("event_type"),
            date_add(lit("1970-01-01").cast("date"), col("day_num"))
              .as("day"),
            col("n"), col("b_days"),
            (col("b_sum").cast("double") / col("b_days").cast("double"))
              .as("baseline"),
            (col("n").cast("double") /
              (col("b_sum").cast("double") / col("b_days").cast("double")))
              .as("trend"))
          .orderBy("event_type", "day")
      },
      Some("""WITH daily AS (
        SELECT event_type,
          datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS day_num,
          COUNT(1) AS n
        FROM events GROUP BY 1, 2),
      base AS (
        SELECT event_type, day_num, n,
          SUM(n) OVER (PARTITION BY event_type ORDER BY day_num
            RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS b_sum,
          COUNT(n) OVER (PARTITION BY event_type ORDER BY day_num
            RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING) AS b_days
        FROM daily)
      SELECT event_type,
        DATE '1970-01-01' + CAST(day_num AS INT) AS day,
        n, b_days,
        CAST(b_sum AS DOUBLE) / CAST(b_days AS DOUBLE) AS baseline,
        CAST(n AS DOUBLE) /
          (CAST(b_sum AS DOUBLE) / CAST(b_days AS DOUBLE)) AS trend
      FROM base WHERE b_days > 0
      ORDER BY event_type, day""")),

    // ---- growth accounting: classify every active (user, day) as
    //      NEW (first day ever), RETAINED (also active the previous
    //      calendar day) or RESURRECTED (returning after a gap), and
    //      count CHURNED (active yesterday, absent today) — the
    //      standard DAU decomposition (new + retained + resurrected =
    //      active; churn is yesterday's actives who left). One lag and
    //      one lead over the same (user → day) partition classify and
    //      emit churn events; churn days that fall outside the
    //      observed day spine (the day after the last day of data)
    //      are dropped, not fabricated. Integer counts end to end →
    //      hash-exact. Scale: the distinct (user, day) relation is
    //      the only shuffle (user-keyed window after it); per-day
    //      output is |days| rows at any corpus size. ----
    QuerySpec(
      "e29_growth_accounting",
      (s, d) => {
        val actives = Tables.events(s, d)
          .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
        val wU = Window.partitionBy(col("user_id")).orderBy(col("day"))
        val classed = actives
          .withColumn("prev", lag(col("day"), 1).over(wU))
          .withColumn("next", lead(col("day"), 1).over(wU))
        val perDay = classed.groupBy(col("day")).agg(
          count(lit(1)).as("n_active"),
          sum(when(col("prev").isNull, 1L).otherwise(0L)).as("n_new"),
          sum(when(datediff(col("day"), col("prev")) === 1, 1L)
            .otherwise(0L)).as("n_retained"),
          sum(when(col("prev").isNotNull &&
            datediff(col("day"), col("prev")) > 1, 1L)
            .otherwise(0L)).as("n_resurrected"))
        val churn = classed
          .filter(col("next").isNull ||
            datediff(col("next"), col("day")) > 1)
          .groupBy(date_add(col("day"), 1).as("day"))
          .agg(count(lit(1)).as("n_churned"))
        perDay.join(churn, Seq("day"), "left")
          .select(col("day"), col("n_active"), col("n_new"),
            col("n_retained"), col("n_resurrected"),
            coalesce(col("n_churned"), lit(0L)).as("n_churned"))
          .orderBy("day")
      },
      Some("""WITH actives AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
      classed AS (
        SELECT user_id, day,
          LAG(day) OVER (PARTITION BY user_id ORDER BY day) AS prev,
          LEAD(day) OVER (PARTITION BY user_id ORDER BY day) AS next
        FROM actives),
      per_day AS (
        SELECT day, COUNT(1) AS n_active,
          CAST(SUM(CASE WHEN prev IS NULL THEN 1 ELSE 0 END) AS BIGINT)
            AS n_new,
          CAST(SUM(CASE WHEN datediff('day', prev, day) = 1
            THEN 1 ELSE 0 END) AS BIGINT) AS n_retained,
          CAST(SUM(CASE WHEN prev IS NOT NULL
            AND datediff('day', prev, day) > 1
            THEN 1 ELSE 0 END) AS BIGINT) AS n_resurrected
        FROM classed GROUP BY day),
      churn AS (
        SELECT day + 1 AS day, COUNT(1) AS n_churned
        FROM classed
        WHERE next IS NULL OR datediff('day', day, next) > 1
        GROUP BY day + 1)
      SELECT p.day, p.n_active, p.n_new, p.n_retained, p.n_resurrected,
        CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
      FROM per_day p LEFT JOIN churn c USING (day)
      ORDER BY p.day""")),

    // ---- hour-of-week seasonality profile: the 168-cell
    //      (weekday × hour) activity fingerprint capacity planning
    //      and anomaly baselines start from — event counts, distinct
    //      users, decimal-exact value totals, and each cell's share
    //      of the whole. Weekday alignment is the classic cross-
    //      engine trap: Spark's dayofweek is Sunday=1 while DuckDB's
    //      isodow is Monday=1 — both sides use the Monday=0 form
    //      (Spark `weekday`, DuckDB `isodow - 1`) so the cells line
    //      up. Scale: one shuffle to at most 168 groups; the share
    //      joins a broadcast 1-row total. ----
    QuerySpec(
      "e30_seasonality",
      (s, d) => {
        val cells = Tables.events(s, d)
          .groupBy(weekday(col("ts")).as("dow"), hour(col("ts")).as("hr"))
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"),
            dsum128(col("value")).as("total_value"))
        val tot = cells.agg(sum(col("n_events")).as("tot"))
        cells.crossJoin(broadcast(tot))
          .select(col("dow"), col("hr"), col("n_events"), col("n_users"),
            col("total_value"),
            (col("n_events").cast("double") / col("tot").cast("double"))
              .as("share"))
          .orderBy("dow", "hr")
      },
      Some(s"""WITH cells AS (
        SELECT CAST(isodow(ts) - 1 AS INT) AS dow,
          CAST(hour(ts) AS INT) AS hr,
          COUNT(1) AS n_events, COUNT(DISTINCT user_id) AS n_users,
          ${dsumSql("value")} AS total_value
        FROM events GROUP BY 1, 2),
      tot AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tot FROM cells)
      SELECT dow, hr, n_events, n_users, total_value,
        CAST(n_events AS DOUBLE) / CAST(tot AS DOUBLE) AS share
      FROM cells, tot ORDER BY dow, hr""")),

    // ---- journey trigrams: the top-10 most common 3-step event-type
    //      paths walked by any user — the "what do people actually do"
    //      query behind UX funnels, one order up from e17's pairwise
    //      Markov matrix (which cannot distinguish a>b>a from a>b>c).
    //      Two LEADs over the same (user → ts, event_id) partition
    //      build each consecutive triple; rank ties break on the path
    //      string; top-10 is sort+limit → TakeOrderedAndProject, never
    //      a global sort. Scale: one user-keyed shuffle (the window),
    //      one |types|³-bounded aggregate. ----
    QuerySpec(
      "e31_journey_trigrams",
      (s, d) => {
        val byUser = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("ts"), col("event_id"),
            col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(byUser))
          .withColumn("t3", lead(col("event_type"), 2).over(byUser))
          // all three legs non-null: concat_ws SKIPS nulls while the
          // oracle's || propagates them — a null middle leg would
          // bucket differently on the two engines
          .filter(col("event_type").isNotNull && col("t2").isNotNull &&
            col("t3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
            .as("path"))
          .groupBy(col("path")).agg(count(lit(1)).as("n"))
          .orderBy(desc("n"), col("path")).limit(10)
      },
      Some("""SELECT path, n FROM (
        SELECT t1 || '>' || t2 || '>' || t3 AS path, COUNT(1) AS n
        FROM (SELECT event_type AS t1,
                LEAD(event_type, 1) OVER w AS t2,
                LEAD(event_type, 2) OVER w AS t3
              FROM events
              WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)) x
        WHERE t1 IS NOT NULL AND t2 IS NOT NULL AND t3 IS NOT NULL
        GROUP BY 1) g
      ORDER BY n DESC, path LIMIT 10""")),

    // ---- conversion-lag distribution: how long from a user's FIRST
    //      signup to their FIRST subsequent purchase, bucketed by
    //      whole days — the time-to-value histogram behind e06's
    //      binary 7-day gate (which says IF users convert; this says
    //      WHEN). Never-converting users land in a NULL-keyed bucket
    //      rather than vanishing. Microsecond integer arithmetic end
    //      to end → hash-exact. Scale: two user-keyed min-aggregates
    //      and a |days|-bounded rollup. ----
    QuerySpec(
      "e32_conversion_lag",
      (s, d) => {
        val ev = Tables.events(s, d)
        val sign = ev.filter(col("event_type") === "signup")
          .groupBy(col("user_id")).agg(min(tsUs).as("s_us"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("user_id").as("p_user"), tsUs.as("p_us"))
        // the >= predicate must sit IN the join: filtered afterwards,
        // a user whose only purchases PRECEDE signup would vanish
        // instead of landing in the never-converted bucket
        val firstPur = sign.join(pur,
            col("user_id") === col("p_user") && col("p_us") >= col("s_us"),
            "left")
          .groupBy(col("user_id"), col("s_us"))
          .agg(min(col("p_us")).as("fp_us"))
        // integral `div`, not double true-division + cast: the join
        // predicate guarantees fp_us >= s_us, so truncating and floor
        // division agree, and the arithmetic stays integer end to end
        // like the oracle's `//` (no 2^53 double-mantissa dependence)
        firstPur
          .select(expr("(fp_us - s_us) div 86400000000").as("lag_days"))
          .groupBy(col("lag_days"))
          .agg(count(lit(1)).as("n_users"))
          .orderBy(asc_nulls_last("lag_days"))
      },
      Some("""WITH sign AS (
        SELECT user_id, MIN(epoch_us(ts)) AS s_us
        FROM events WHERE event_type = 'signup' GROUP BY user_id),
      fp AS (
        SELECT s.user_id, s.s_us, MIN(p.p_us) AS fp_us
        FROM sign s LEFT JOIN (
          SELECT user_id, epoch_us(ts) AS p_us
          FROM events WHERE event_type = 'purchase') p
        ON s.user_id = p.user_id AND p.p_us >= s.s_us
        GROUP BY s.user_id, s.s_us)
      SELECT CAST((fp_us - s_us) // 86400000000 AS BIGINT) AS lag_days,
        COUNT(1) AS n_users
      FROM fp GROUP BY 1 ORDER BY lag_days NULLS LAST""")),

    // ---- retention cohort matrix: users grouped by the week of
    //      their FIRST event (cohort), and for each later week
    //      offset, the fraction of the cohort still active — the
    //      canonical product-analytics triangle (e29's growth
    //      accounting says how many users move between states; this
    //      says how long each acquisition wave survives). Weeks are
    //      integer epoch-microsecond buckets (µs div week), so every
    //      boundary is engine-agnostic and the matrix is hash-exact;
    //      the start-of-week date is derived for readability. Scale:
    //      one (user, week) distinct, then the user's first week as
    //      a WINDOW MIN over the user partition (no self-join), and
    //      a rollup bounded by cohorts × offsets; cohort sizes are
    //      the offset-0 diagonal, joined back as a broadcast. ----
    QuerySpec(
      "e33_retention_cohorts",
      (s, d) => {
        val weekUs = 604800000000L
        val activity = Tables.events(s, d)
          .select(col("user_id"),
            expr(s"unix_micros(ts) div $weekUs").as("wk"))
          .distinct()
        val wUser = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
        val cells = activity
          .withColumn("cw", min(col("wk")).over(wUser))
          .groupBy(col("cw"), (col("wk") - col("cw")).as("offset_weeks"))
          .agg(count(lit(1)).as("n_active"))
        val sizes = cells.filter(col("offset_weeks") === 0)
          .select(col("cw"), col("n_active").as("cohort_size"))
        cells.join(broadcast(sizes), "cw")
          .select(
            expr("date_add(DATE'1970-01-01', cast(cw * 7 as int))")
              .as("cohort_week"),
            col("offset_weeks"), col("cohort_size"), col("n_active"),
            (col("n_active").cast("double") /
              col("cohort_size").cast("double")).as("retention"))
          .orderBy("cohort_week", "offset_weeks")
      },
      Some("""WITH activity AS (
        SELECT DISTINCT user_id, epoch_us(ts) // 604800000000 AS wk
        FROM events),
      firsts AS (
        SELECT user_id, MIN(wk) AS cw FROM activity GROUP BY user_id),
      cells AS (
        SELECT f.cw, a.wk - f.cw AS offset_weeks, COUNT(1) AS n_active
        FROM activity a JOIN firsts f USING (user_id)
        GROUP BY 1, 2),
      sizes AS (
        SELECT cw, n_active AS cohort_size FROM cells
        WHERE offset_weeks = 0)
      SELECT DATE '1970-01-01' + CAST(c.cw * 7 AS INT) AS cohort_week,
        c.offset_weeks, z.cohort_size, c.n_active,
        CAST(c.n_active AS DOUBLE) / CAST(z.cohort_size AS DOUBLE)
          AS retention
      FROM cells c JOIN sizes z USING (cw)
      ORDER BY cohort_week, offset_weeks""")),

    // ---- SKETCH REAGGREGATION: rolling 7-day distinct cohorts from
    //      MERGED daily HLL sketches (hll_sketch_agg → window
    //      hll_union_agg → estimate) next to the exact WAU — the
    //      pattern that makes distinct-counting tractable at 100 TB:
    //      raw events are touched ONCE to build per-day sketches
    //      (kilobytes each), and every derived window (7-day, 30-day,
    //      arbitrary dashboards) is a UNION of sketches, where e26's
    //      exact fan-out re-shuffles user ids per window width. The
    //      union window rides the O(days) daily relation, not events.
    //      EXACT REGIME pinned for the oracle (e20's playbook): the
    //      sketched key is the user COHORT (pmod(user_id, 256) —
    //      non-negative for ANY id sign, and the oracle mirrors it
    //      as ((user_id % 256) + 256) % 256 since DuckDB's % follows
    //      the dividend's sign; the sign alignment also keeps the
    //      distinct-cohort bound at 256, never 511, so the coupon-
    //      regime premise holds for signed ids too), so every
    //      window's distinct count ≤ 256 — inside the lgConfigK=12
    //      sketch's EXACT coupon regime, measured on this library:
    //      sketch-estimate and 7-way-union-estimate both return the
    //      exact count through ≥380 distinct values and first drift
    //      at ~400 (the SET-mode collision-corrected estimate stops
    //      rounding to the integer), so 256 carries a ~1.5× margin.
    //      Per-day sketches AND their rolling unions are therefore
    //      exact at EVERY scale factor by construction (the 26-bit
    //      coupon space holds the 256 fixed hashed cohort values
    //      collision-free — a DETERMINISTIC property of the fixed
    //      key set, verified by OpsSpec's all-cohorts UNION probe,
    //      not a per-corpus gamble).
    //      The estimator path is UNCHANGED — sketch, union, estimate;
    //      OpsSpec keeps the approximate-regime accuracy contract on
    //      raw user_id (lgConfigK=12 → σ ≈ 1.6%, asserted < 5%). ----
    QuerySpec(
      "e34_rolling_hll",
      (s, d) => {
        val pairs = graft.Scoped.persist(
          Tables.events(s, d)
            .select(to_date(col("ts")).as("day"),
              pmod(col("user_id"), lit(256L)).as("cohort"))
            .distinct())
        val daily = pairs.groupBy(col("day"))
          .agg(hll_sketch_agg(col("cohort")).as("sk"),
            count_distinct(col("cohort")).as("dau"))
        // exact rolling weekly actives via e26's fan-out, side-by-side
        val spine = pairs.select(col("day")).distinct()
        val exact = pairs
          .select(col("cohort"),
            explode(sequence(lit(0), lit(6))).as("off"), col("day"))
          .select(date_add(col("day"), col("off")).as("day"),
            col("cohort"))
          .join(spine, Seq("day"), "left_semi")
          .groupBy(col("day"))
          .agg(count_distinct(col("cohort")).as("wau_exact"))
        // the day-level relation is O(days) — union each output day's
        // TRUE calendar window [day-6, day] by fanning each daily
        // sketch out to the ≤7 days it covers, mirroring the exact
        // twin's fan-out. A rowsBetween(-6,0) frame over the daily
        // relation would instead union the last 7 PRESENT days: on a
        // corpus with gap days the two sides would disagree by window
        // semantics, not HLL error, and the <5% contract could fail
        // spuriously. 7·O(days) sketch rows stay trivially bounded.
        val est = daily
          .select(col("day"), col("sk"),
            explode(sequence(lit(0), lit(6))).as("off"))
          .select(date_add(col("day"), col("off")).as("day"), col("sk"))
          .join(spine, Seq("day"), "left_semi")
          .groupBy(col("day"))
          .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
            .as("wau_est"))
        daily.select(col("day"), col("dau"))
          .join(est, Seq("day"))
          .join(exact, Seq("day"))
          .select(col("day"), col("dau"), col("wau_exact"),
            col("wau_est"),
            (abs(col("wau_est") - col("wau_exact")).cast("double") /
              col("wau_exact")).as("rel_err"))
          .orderBy("day")
      },
      // the pinned coupon regime makes est ≡ exact, so the oracle is
      // the plain exact rollup — same shape as e26's, on the cohort key
      Some("""WITH pairs AS (
        SELECT DISTINCT CAST(ts AS DATE) AS day,
          ((user_id % 256) + 256) % 256 AS cohort
        FROM events),
      spine AS (SELECT DISTINCT day FROM pairs),
      wk AS (
        SELECT obs_day AS day, COUNT(DISTINCT cohort) AS wau_exact FROM (
          SELECT day + CAST(i AS INT) AS obs_day, cohort
          FROM (SELECT day, cohort,
                  unnest(generate_series(0, 6)) AS i
                FROM pairs) e) x
        WHERE obs_day IN (SELECT day FROM spine)
        GROUP BY obs_day),
      dau AS (
        SELECT day, COUNT(DISTINCT cohort) AS dau FROM pairs GROUP BY day)
      SELECT d.day, d.dau, w.wau_exact,
        CAST(w.wau_exact AS BIGINT) AS wau_est,
        CAST(ABS(w.wau_exact - w.wau_exact) AS DOUBLE) / w.wau_exact
          AS rel_err
      FROM dau d JOIN wk w USING (day)
      ORDER BY d.day""")),

    // ---- event-time DISORDER audit — the measurement that sizes a
    //      streaming watermark delay (`withWatermark`) BEFORE the
    //      stream runs: per arrival-hour, how far behind the running
    //      event-time high-water mark do events arrive, and how many
    //      would a given delay have dropped? The fixture's events
    //      arrive in event-time order, so arrival order is
    //      reconstructed with a bounded DETERMINISTIC transport
    //      jitter (a Knuth multiplicative hash of event_id, < 300 s —
    //      portable integer arithmetic both engines replay exactly,
    //      the t09 oracle discipline). All lateness arithmetic stays
    //      in exact integer MICROSECONDS until the final division.
    //      Scale: the only window partitions by arrival HOUR (730
    //      partitions/month, events-per-hour bounded); no global
    //      ordering anywhere — cross-hour disorder is invisible to
    //      this frame, the documented approximation (jitter < 300 s
    //      << 1 h keeps the boundary leakage marginal). ----
    QuerySpec(
      "e35_disorder_audit",
      (s, d) => {
        val ev = Tables.events(s, d)
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"))
          .withColumn("arr_us", col("ts_us") + plantedJitterUs(col("event_id")))
          .withColumn("hour",
            timestamp_micros(col("arr_us") - pmod(col("arr_us"),
              lit(3600000000L))))
        val w = Window.partitionBy(col("hour"))
          .orderBy(col("arr_us"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val late = ev.withColumn("wm_us", max(col("ts_us")).over(w))
          .withColumn("late_us",
            when(col("wm_us") > col("ts_us"),
              col("wm_us") - col("ts_us")).otherwise(0L))
        late.groupBy(col("hour"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("late_us") > 0, 1L).otherwise(0L))
              .as("n_disordered"),
            sum(when(col("late_us") > 60000000L, 1L).otherwise(0L))
              .as("n_late_60s"),
            (max(col("late_us")).cast("double") / 1000000.0)
              .as("max_late_s"))
          .orderBy("hour")
      },
      Some("""WITH ev AS (
        SELECT event_id, epoch_us(ts) AS ts_us,
          epoch_us(ts) + ((event_id % 2147483647) * 2654435761)
            % 2147483647 % 300 * 1000000 AS arr_us
        FROM events),
      hr AS (
        SELECT *, make_timestamp(arr_us - arr_us % 3600000000) AS hour
        FROM ev),
      lt AS (
        SELECT hour, ts_us,
          GREATEST(COALESCE(MAX(ts_us) OVER (PARTITION BY hour
            ORDER BY arr_us, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), ts_us)
            - ts_us, 0) AS late_us
        FROM hr)
      SELECT hour, CAST(COUNT(1) AS BIGINT) AS n_events,
        CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
          AS n_disordered,
        CAST(SUM(CASE WHEN late_us > 60000000 THEN 1 ELSE 0 END)
          AS BIGINT) AS n_late_60s,
        CAST(MAX(late_us) AS DOUBLE) / 1000000.0 AS max_late_s
      FROM lt GROUP BY hour ORDER BY hour"""))
  )
}

