"""Event-table queries: tumbling windows, sessionization, JSON props.

These are the batch event-time analytics the reference lacks entirely
(SURVEY.md §2.10 — its "temporal" aspect is per-year snapshots); the
streaming (readStream) versions of the same plans live in
streaming/events.py and are asserted equal in tests.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.relational import sessionize
from ..sources.tables import load_table
from .entry_queries import register


@register(
    "events_windowed_agg",
    """
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS value_sum
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def events_windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 15-minute event-time windows per event type (F.window —
    the same windowing primitive Structured Streaming uses)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_sessionize",
    """
WITH g AS (
  SELECT user_id, ts,
         CASE WHEN epoch(ts) - lag(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts)
                   > 30 * 60
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
),
s AS (
  SELECT user_id,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM g
)
SELECT user_id, CAST(max(session_id) AS BIGINT) AS n_sessions,
       count(*) AS n_events
FROM s GROUP BY user_id ORDER BY user_id
""",
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity), one shuffle on user:
    sessions and events per user."""
    ev = load_table(spark, sf_dir, "events")
    s = sessionize(ev, "user_id", "ts", gap_minutes=30)
    return (
        s.groupBy("user_id")
        .agg(
            F.max("session_id").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
        .orderBy("user_id")
    )


@register(
    "events_json_props",
    """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS k_sum,
       CAST(max(CAST(json_extract_string(props, '$.k') AS INT)) AS INT) AS k_max
FROM events GROUP BY event_type ORDER BY event_type
""",
)
def events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props: JSON-path extraction inside an aggregate."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(k).alias("k_sum"),
            F.max(k).alias("k_max"),
        )
        .orderBy("event_type")
    )


@register(
    "events_top_users_per_type",
    """
WITH u AS (
  SELECT event_type, user_id, count(*) AS n, round(sum(value), 2) AS value_sum
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY n DESC, user_id) AS rn
  FROM u
)
SELECT event_type, user_id, n, value_sum, CAST(rn AS INT) AS rn
FROM r WHERE rn <= 5 ORDER BY event_type, rn
""",
)
def events_top_users_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most active users per event type (distributed top-k: window
    row_number, map-side pre-aggregation)."""
    ev = load_table(spark, sf_dir, "events")
    u = ev.groupBy("event_type", "user_id").agg(
        F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value_sum")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("n").desc(), "user_id")
    return (
        u.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .orderBy("event_type", "rn")
    )


@register(
    "streaming_windowed",
    """
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS value_sum
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def streaming_windowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The tumbling-window aggregate executed as an actual Structured
    Streaming query (readStream parquet replay → watermark → window →
    memory sink). The returned rows ARE the stream's final complete-mode
    table, so the batch-semantics oracle certifies stream == batch
    end-to-end (the streaming *lifecycle* still isn't SQL, but its
    output is)."""
    from ..streaming.events import run_windowed_stream_demo

    return run_windowed_stream_demo(spark, sf_dir)


@register(
    "streaming_stateful_counts",
    """
SELECT user_id,
       count(*) AS n_events,
       round(sum(value), 2) AS value_sum
FROM events GROUP BY 1 ORDER BY 1
""",
)
def streaming_stateful_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    per-user running event counters carried in GroupState across
    micro-batches. Returns the final per-user state rows, which the
    batch-semantics oracle certifies against a plain groupBy."""
    from ..streaming.events import run_stateful_counts_demo

    return run_stateful_counts_demo(spark, sf_dir)


@register(
    "asof_join_events_orders",
    """
WITH o AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT e.event_id, e.user_id,
       strftime(e.ts, '%Y-%m-%d %H:%M:%S') AS ts,
       o.o_orderkey AS last_orderkey,
       strftime(o.o_orderdate, '%Y-%m-%d') AS last_orderdate
FROM events e
ASOF LEFT JOIN o ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
ORDER BY e.event_id
""",
)
def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each event annotated with the customer's most recent
    order at event time. Union-and-carry idiom (operators/relational.py
    `asof_join`): one shuffle on the key, per-key sorted carry — no
    range-candidate explosion. Right side deduped per (key, ts) so ties
    are deterministic."""
    from ..operators.relational import asof_join

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey", "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    joined = asof_join(
        ev, o,
        key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_cols=["o_orderkey", "o_orderdate"],
        right_key="o_custkey",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        F.col("o_orderkey").alias("last_orderkey"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("last_orderdate"),
    ).orderBy("event_id")


@register(
    "range_join_events_orders",
    """
WITH o AS (
  SELECT o_orderkey, o_custkey,
         TIMESTAMP '2024-01-01'
           + ((CAST(o_orderdate AS DATE) - DATE '1995-01-01') % 27) * INTERVAL 1 DAY
           AS lo
  FROM orders
)
SELECT o.o_orderkey AS orderkey,
       count(*) AS n_events,
       round(sum(e.value), 2) AS value_sum
FROM o
JOIN events e
  ON e.user_id = o.o_custkey
 AND e.ts >= o.lo
 AND e.ts <= o.lo + INTERVAL 3 DAY
GROUP BY 1 ORDER BY 1
""",
)
def range_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval/range join: events inside the 3-day window anchored at
    each order by the same customer. Binned to an equi join on (key, bin)
    (operators/relational.py `range_join_binned`) — Catalyst would
    otherwise plan the inequality as a broadcast-nested-loop, O(|L|*|R|).

    Anchor: the testdata's order dates (1995-2001) and event timestamps
    (2024-01) never overlap, so the raw o_orderdate window was a vacuous
    0-row check; each order date is remapped deterministically into the
    events epoch (2024-01-01 + days-since-1995 mod 27) to exercise the
    operator on real overlap density.
    """
    from ..operators.relational import range_join_binned

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    anchor = F.expr(
        "TIMESTAMP '2024-01-01' + make_dt_interval("
        "datediff(o_orderdate, DATE '1995-01-01') % 27)"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_custkey").alias("user_id"),
        anchor.alias("lo"),
        (anchor + F.expr("INTERVAL 3 DAYS")).alias("hi"),
    )
    joined = range_join_binned(
        ev, o, key="user_id", left_point="ts", right_lo="lo", right_hi="hi",
        bin_width=3 * 86400,
    )
    return (
        joined.groupBy(F.col("o_orderkey").alias("orderkey"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("value_sum"))
        .orderBy("orderkey")
    )


@register(
    "streaming_sessionize",
    """
WITH t AS (
  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS te FROM events
), s AS (
  SELECT user_id, te,
         CASE WHEN lag(te) OVER w IS NULL
                OR te - lag(te) OVER w > 1800 THEN 1 ELSE 0 END AS is_new
  FROM t WINDOW w AS (PARTITION BY user_id ORDER BY te)
), g AS (
  SELECT user_id, te,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY te
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
), sess AS (
  SELECT user_id, sid, min(te) AS session_start,
         count(*) AS n_events
  FROM g GROUP BY 1, 2
)
SELECT user_id, session_start, n_events
FROM sess
WHERE sid < (SELECT max(sid) FROM sess s2 WHERE s2.user_id = sess.user_id)
ORDER BY user_id, session_start
""",
)
def streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stateful streaming sessionization (applyInPandasWithState):
    per-user open-session state across micro-batches, CLOSED sessions
    emitted in append mode (each user's final session stays open in
    state — see run_stateful_sessionize_demo). The oracle recomputes the
    closed-session set relationally: 30-min-gap sessionize, then drop
    each user's last (max-sid) session."""
    from ..streaming.events import run_stateful_sessionize_demo

    return run_stateful_sessionize_demo(spark, sf_dir)


@register(
    "streaming_dedup",
    """
SELECT event_type, count(*) AS n_after_dedup
FROM events GROUP BY 1 ORDER BY 1
""",
)
def streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once from an at-least-once replay:
    dropDuplicatesWithinWatermark over a DOUBLED event delivery, with
    dedup state bounded by the watermark horizon. The oracle is the
    single-delivery per-type count — matching it proves the second
    delivery was fully suppressed."""
    from ..streaming.events import run_dedup_stream_demo

    return run_dedup_stream_demo(spark, sf_dir)


@register(
    "events_click_attribution",
    """
SELECT c.user_id AS user_id, count(*) AS n_pairs
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY 1 ORDER BY 1
""",
)
def events_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase attribution: per user, the number of (click,
    purchase) pairs where the purchase lands within 30 minutes after the
    click — an interval SELF-join. Binned to an equi join on
    (user_id, time-bin) via `range_join_binned` so the plan is a hash
    join, not a nested loop; the same semantics run as a watermarked
    stream-stream join in `streaming_join`."""
    from ..operators.relational import range_join_binned

    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("lo"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("hi"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    joined = range_join_binned(
        purchases, clicks,
        key="user_id", left_point="p_ts", right_lo="lo", right_hi="hi",
        bin_width=30 * 60,
    )
    return (
        joined.groupBy("user_id")
        .agg(F.count("*").alias("n_pairs"))
        .orderBy("user_id")
    )


@register(
    "streaming_join",
    """
SELECT c.user_id AS user_id, count(*) AS n_pairs
FROM events c
JOIN events p
  ON p.user_id = c.user_id
 AND c.event_type = 'click'
 AND p.event_type = 'purchase'
 AND p.ts >= c.ts
 AND p.ts <= c.ts + INTERVAL 30 MINUTE
GROUP BY 1 ORDER BY 1
""",
)
def streaming_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join (clicks ⋈ purchases within
    30 min, bounded join state on both sides). The oracle is the batch
    interval self-join — same SQL as `events_click_attribution` — so a
    hash match certifies no pair was dropped or duplicated by the
    streaming state machinery (single-batch replay: the watermark evicts
    nothing on this bounded input)."""
    from ..streaming.events import run_stream_stream_join_demo

    return run_stream_stream_join_demo(spark, sf_dir)


@register(
    "streaming_enrich",
    """
SELECT c.c_nationkey AS nationkey, count(*) AS n_events
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1
""",
)
def streaming_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static broadcast enrichment written through an idempotent
    foreachBatch parquet sink (dynamic partition overwrite keyed by batch
    id). The returned rows are read back from the files the stream wrote,
    so the batch-join oracle certifies the whole write path (a doubled
    batch replay would double counts and hash-mismatch)."""
    from ..streaming.events import run_stream_static_enrich_demo

    return run_stream_static_enrich_demo(spark, sf_dir)


@register(
    "events_hierarchical_rollup",
    """
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS h, event_type,
         count(*) AS n, sum(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT strftime(date_trunc('day', h), '%Y-%m-%d') AS day, event_type,
       CAST(sum(n) AS BIGINT) AS n_events,
       round(sum(v), 2) AS value_sum,
       CAST(count(*) AS BIGINT) AS n_hours_active
FROM hourly
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_hierarchical_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: daily aggregates derived
    from HOURLY pre-aggregates, never re-touching raw events — the
    continuous-aggregate pattern (sums/counts re-aggregate losslessly;
    the hourly tier is what a production pipeline materializes
    incrementally, and every coarser resolution reads tiers, not the
    100 TB raw feed). Two cascaded hash aggregates; the second runs on
    |hours × types| rows."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(F.count("*").alias("n"), F.sum("value").alias("v"))
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", "h"), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.round(F.sum("v"), 2).alias("value_sum"),
            F.count("*").alias("n_hours_active"),
        )
        .orderBy("day", "event_type")
    )


@register(
    "events_scd2_history",
    """
WITH m AS (
  SELECT user_id, ts, event_type, event_id,
         CASE WHEN lag(event_type) OVER w IS NULL
                OR lag(event_type) OVER w <> event_type
              THEN 1 ELSE 0 END AS brk
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
s AS (
  SELECT user_id, ts, event_type, brk,
         SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                        ROWS UNBOUNDED PRECEDING) AS seg
  FROM m
),
g AS (
  SELECT user_id, seg, min(event_type) AS event_type,
         min(ts) AS valid_from, CAST(count(*) AS BIGINT) AS n_events
  FROM s GROUP BY user_id, seg
),
f AS (
  SELECT user_id, event_type, valid_from, n_events,
         lead(valid_from) OVER (PARTITION BY user_id
                                ORDER BY valid_from, seg)
           AS valid_to
  FROM g
)
SELECT user_id, event_type,
       strftime(valid_from, '%Y-%m-%d %H:%M:%S') AS valid_from,
       COALESCE(strftime(valid_to, '%Y-%m-%d %H:%M:%S'), '') AS valid_to,
       n_events,
       (valid_to IS NULL) AS is_current
FROM f ORDER BY user_id, valid_from
""",
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 history build (Kimball dimension versioning) from the
    event stream: collapse each user's consecutive runs of the same
    event_type into validity intervals [valid_from, valid_to) with an
    is_current flag — the gaps-and-islands pattern (lag-break marker →
    running-sum segment id → per-segment aggregate → lead for the close
    timestamp). All four steps share ONE partitioning (user_id): Spark
    plans a single Exchange followed by sort-based windows and a
    partial-merge aggregate — at 100 TB the whole history build is one
    shuffle of the change feed."""
    ev = load_table(spark, sf_dir, "events")
    worder = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = (
        F.lag("event_type").over(worder).isNull()
        | (F.lag("event_type").over(worder) != F.col("event_type"))
    ).cast("int")
    s = ev.select("user_id", "ts", "event_type", "event_id").withColumn(
        "brk", brk
    ).withColumn(
        "seg",
        F.sum("brk").over(
            worder.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    g = s.groupBy("user_id", "seg").agg(
        F.min("event_type").alias("event_type"),
        F.min("ts").alias("valid_from"),
        F.count("*").alias("n_events"),
    )
    # seg tiebreak: two same-user segments can share valid_from when
    # events tie on ts (none in this testdata — verified 0 at all three
    # SFs — but routine in real streams); seg is unique per user and
    # anchored to the same (ts, event_id) total order in both engines,
    # so lead() stays deterministic under ties. Found by the plan
    # fuzzer's window-tie audit (BASELINE.md round-10 fuzzer entry).
    wlead = Window.partitionBy("user_id").orderBy("valid_from", "seg")
    f = g.withColumn("valid_to", F.lead("valid_from").over(wlead))
    return f.select(
        "user_id",
        "event_type",
        F.date_format("valid_from", "yyyy-MM-dd HH:mm:ss").alias("valid_from"),
        F.coalesce(
            F.date_format("valid_to", "yyyy-MM-dd HH:mm:ss"), F.lit("")
        ).alias("valid_to"),
        "n_events",
        F.col("valid_to").isNull().alias("is_current"),
    ).orderBy("user_id", "valid_from")


@register(
    "events_funnel",
    """
WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
           WHERE event_type = 'view' GROUP BY user_id),
     c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN v USING (user_id)
           WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
     p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN c USING (user_id)
           WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id),
     f AS (SELECT 1 AS step, 'view' AS step_name, count(*) AS users FROM v
           UNION ALL SELECT 2, 'click', count(*) FROM c
           UNION ALL SELECT 3, 'purchase', count(*) FROM p)
SELECT CAST(step AS INT) AS step, step_name, CAST(users AS BIGINT) AS users,
       round(coalesce(users * 1.0 / lag(users) OVER (ORDER BY step), 1.0), 6)
         AS conversion
FROM f ORDER BY step
""",
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel view -> click -> purchase: each user advances a
    step only with an event strictly AFTER their previous step's earliest
    qualifying event (min-timestamp chaining, the standard funnel
    semantics). Three keyed min-aggregates + two equi joins on user_id —
    after the first shuffle the rest are co-partitioned; step-over-step
    conversion from a 3-row window."""
    ev = load_table(spark, sf_dir, "events")
    t1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    t2 = (
        ev.filter(F.col("event_type") == "click")
        .join(t1, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    t3 = (
        ev.filter(F.col("event_type") == "purchase")
        .join(t2, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    steps = None
    for step, (name, df) in enumerate([("view", t1), ("click", t2), ("purchase", t3)], 1):
        row = df.agg(F.count("*").alias("users")).select(
            F.lit(step).alias("step"), F.lit(name).alias("step_name"), "users"
        )
        steps = row if steps is None else steps.unionByName(row)
    w = Window.orderBy("step")
    return steps.select(
        "step",
        "step_name",
        "users",
        F.round(
            F.coalesce(F.col("users") / F.lag("users").over(w), F.lit(1.0)), 6
        ).alias("conversion"),
    ).orderBy("step")


@register(
    "events_cohort_retention",
    """
WITH f AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
           FROM events GROUP BY user_id),
     a AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
           FROM events)
SELECT f.cohort_week AS cohort_week,
       CAST((a.week - f.cohort_week) / 7 AS INT) AS week_offset,
       count(*) AS active_users
FROM a JOIN f USING (user_id)
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention matrix: users grouped by the ISO week of
    their first event; active_users counts distinct users of each cohort
    seen again k weeks later. Both sides reduce events to small per-user
    frames before the join (shuffle on user_id, then on the tiny
    (cohort, offset) key)."""
    ev = load_table(spark, sf_dir, "events")
    first = ev.groupBy("user_id").agg(
        F.to_date(F.date_trunc("week", F.min("ts"))).alias("cohort_week")
    )
    active = ev.select(
        "user_id", F.to_date(F.date_trunc("week", "ts")).alias("week")
    ).distinct()
    return (
        active.join(first, "user_id")
        .groupBy("cohort_week", (F.datediff("week", "cohort_week") / 7).cast("int").alias("week_offset"))
        .agg(F.count("*").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "events_gap_fill",
    """
WITH h AS (SELECT event_type, date_trunc('hour', ts) AS hr,
                  count(*) AS n, round(sum(value), 2) AS v
           FROM events GROUP BY 1, 2),
     bounds AS (SELECT date_trunc('hour', min(ts)) AS lo,
                       date_trunc('hour', max(ts)) AS hi FROM events),
     grid AS (SELECT t.event_type, g.hr
              FROM (SELECT DISTINCT event_type FROM events) t,
                   (SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hr
                    FROM bounds) g)
SELECT grid.event_type AS event_type,
       strftime(grid.hr, '%Y-%m-%d %H:%M:%S') AS hour,
       coalesce(h.n, 0) AS n,
       last_value(h.v IGNORE NULLS)
         OVER (PARTITION BY grid.event_type ORDER BY grid.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value
FROM grid LEFT JOIN h ON grid.event_type = h.event_type AND grid.hr = h.hr
ORDER BY event_type, hour
""",
)
def events_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap filling: a dense hourly (type × hour) grid
    (sequence + explode — generated, never shuffled), left-joined with the
    hourly aggregate; empty buckets get n=0 and carry the last observed
    hourly value-sum forward (LOCF via last(ignorenulls) running window)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("v"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    types = ev.select("event_type").distinct()
    grid = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hr"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hr"], "left")
        .select(
            "event_type",
            F.date_format("hr", "yyyy-MM-dd HH:mm:ss").alias("hour"),
            F.coalesce("n", F.lit(0)).alias("n"),
            F.last("v", ignorenulls=True).over(w).alias("locf_value"),
        )
        .orderBy("event_type", "hour")
    )


@register(
    "events_transitions",
    """
WITH s AS (SELECT user_id, event_type,
                  lag(event_type) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS prev_type
           FROM events)
SELECT prev_type, event_type AS next_type, count(*) AS n
FROM s WHERE prev_type IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def events_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition (Markov) counts: lag over the
    per-user event sequence (total order via (ts, event_id) tiebreak),
    then a tiny 5×5 aggregate. One shuffle on user_id."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    return (
        s.groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count("*").alias("n"))
        .orderBy("prev_type", "next_type")
    )

_SESSION_WINDOW_SQL = """
WITH s AS (
  SELECT user_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE THEN 1 ELSE 0
         END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)
), g AS (
  SELECT user_id, ts, value,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts
                           ROWS UNBOUNDED PRECEDING) AS sid
  FROM s
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS value_sum
FROM g GROUP BY user_id, sid ORDER BY user_id, session_start
"""


@register("events_session_window", _SESSION_WINDOW_SQL)
def events_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (F.session_window): Spark assigns each
    event to a gap-merged session range — the built-in form of the
    gaps-and-islands sessionize. Note the boundary semantics: session
    ranges are [start, last+gap), so a gap of EXACTLY 30 min starts a
    new session (>=, where the lag-based `events_sessionize` uses >);
    the oracle replays >= to match."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.session_window(F.col("ts").cast("timestamp"), "30 minutes").alias("w"),
            "user_id",
        )
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            "n_events",
            "value_sum",
        )
        .orderBy("user_id", "session_start")
    )


@register("streaming_session_window", _SESSION_WINDOW_SQL)
def streaming_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same session-window aggregate executed as a watermarked
    Structured Streaming query (update mode, session state merged and
    evicted by event-time watermark). The returned rows are the stream's
    final upserts, so the gaps-and-islands oracle certifies
    stream == batch for native session windows too."""
    from ..streaming.events import run_session_window_stream_demo

    return run_session_window_stream_demo(spark, sf_dir)


@register(
    "events_variant_props",
    """
WITH v AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS INT) AS k
  FROM events
)
SELECT event_type,
       CAST(count(k) AS BIGINT) AS n_props,
       CAST(sum(k) AS BIGINT) AS k_sum,
       CAST(sum(CASE WHEN k % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS k_even
FROM v GROUP BY 1 ORDER BY 1
""",
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type: parse_json
    ONCE into the binary variant encoding, then typed variant_get
    extractions — the parse-once/extract-many shape that beats repeated
    get_json_object string re-parsing when many fields are read at scale
    (events_json_props shows the string-path form of the same query)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(v, '$.k', 'int')")
    return (
        ev.select("event_type", F.parse_json("props").alias("v"))
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_props"),
            F.sum("k").alias("k_sum"),
            F.sum(F.when(F.col("k") % 2 == 0, 1).otherwise(0)).alias("k_even"),
        )
        .orderBy("event_type")
    )


@register(
    "streaming_state_inspect",
    """
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts), '%Y-%m-%d %H:%M:%S')
         AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS value_sum
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def streaming_state_inspect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State Data Source (`spark.read.format("statestore")`): the
    windowed aggregate's RocksDB/HDFS state read back from the
    checkpoint as a DataFrame — streaming-state observability. The
    oracle is the batch windowed aggregate: after a full replay the
    checkpoint's per-(window, type) state must equal the batch answer,
    so a hash match certifies the state store's contents, not just the
    sink's."""
    from ..streaming.events import run_state_inspect_demo

    return run_state_inspect_demo(spark, sf_dir)


@register(
    "salted_join_event_nations",
    """
SELECT c.c_nationkey AS nationkey,
       count(*) AS n_events,
       round(sum(e.value), 2) AS value_sum
FROM events e JOIN customer c ON e.user_id = c.c_custkey
GROUP BY 1 ORDER BY 1
""",
)
def salted_join_event_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant equi join through `salted_join`
    (operators/relational.py): the fact side's hot keys are spread over
    16 salt buckets, the dimension side replicated per salt — the manual
    fallback for plans where AQE's runtime skew split can't act. The
    oracle is the plain join, so the hash match proves salting is
    result-invariant (its whole point)."""
    from ..operators.relational import salted_join

    ev = load_table(spark, sf_dir, "events").select("user_id", "value")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_nationkey"
    )
    joined = salted_join(ev, dim, key="user_id", n_salts=16)
    return (
        joined.groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("value_sum"),
        )
        .orderBy("nationkey")
    )


@register(
    "events_sliding_window",
    """
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts) - i * INTERVAL '15 minutes',
                '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type,
       count(*) AS n,
       round(sum(value), 2) AS value_sum
FROM events CROSS JOIN unnest([0, 1]) AS t(i)
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def events_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLIDING event-time windows (30-min window, 15-min slide): every
    event lands in exactly window/slide = 2 overlapping windows —
    F.window's three-arg form, the shape behind rolling KPIs. Spark
    expands the windows map-side (no self-join); the oracle replicates
    each event into its 2 windows with an unnest cross join."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window(F.col("ts").cast("timestamp"), "30 minutes", "15 minutes").alias("w"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 2).alias("value_sum"))
        .select(
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
        .orderBy("window_start", "event_type")
    )


@register(
    "events_twap",
    """
WITH seq AS (
  SELECT user_id, "value",
         epoch_us(ts) AS t,
         lead(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           AS t_next
  FROM events
)
SELECT user_id,
       round(sum("value" * (t_next - t)) / sum(t_next - t), 6) AS twap,
       CAST(count(*) AS BIGINT) AS n_intervals
FROM seq WHERE t_next IS NOT NULL AND t_next > t
GROUP BY user_id
ORDER BY user_id
""",
)
def events_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user (TWAP — the telemetry/
    finance aggregate where samples hold until the next observation):
    each reading is weighted by its holding interval via lead(ts), then
    one grouped sum-ratio. One window sort co-partitioned with the
    following aggregation (both keyed on user_id — a single shuffle
    serves both), deterministic tie-break on event_id. Zero-length
    intervals contribute nothing and are excluded symmetrically in both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "user_id",
        "value",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
        F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w).alias("t_next"),
    )
    dt = F.col("t_next") - F.col("t")
    return (
        seq.filter(F.col("t_next").isNotNull() & (dt > 0))
        .groupBy("user_id")
        .agg(
            F.round(F.sum(F.col("value") * dt) / F.sum(dt), 6).alias("twap"),
            F.count("*").alias("n_intervals"),
        )
        .orderBy("user_id")
    )


@register(
    "streaming_incremental_rollup",
    """
SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum("value"), 2) AS value_sum
FROM events GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def streaming_incremental_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streamed incremental materialized view: per-micro-batch partial
    daily rollups appended by foreachBatch (idempotent batch-id
    partitions), merged at read. The batch-aggregate oracle certifies
    that the partials merge to EXACTLY the full-history rollup — a
    dropped batch, doubled replay, or non-mergeable aggregate would
    hash-mismatch."""
    from ..streaming.events import run_incremental_rollup_demo

    return run_incremental_rollup_demo(spark, sf_dir)


@register(
    "events_decayed_counts",
    """
WITH mx AS (SELECT max(epoch_us(ts)) AS tmax FROM events),
w AS (
  SELECT event_type,
         exp(-(ln(2) / 24.0) * ((tmax - epoch_us(ts)) / 3600000000.0)) AS wt,
         "value"
  FROM events, mx
)
SELECT event_type,
       round(sum(wt), 6) AS decayed_count,
       round(sum(wt * "value"), 6) AS decayed_value,
       CAST(count(*) AS BIGINT) AS raw_count
FROM w GROUP BY event_type ORDER BY event_type
""",
)
def events_decayed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed aggregates (24 h half-life) anchored at
    the corpus max event time — the recency-weighted counter behind
    trending/decayed-popularity features. The decay weight is a pure
    per-row expression once the scalar anchor is broadcast (one tiny
    aggregate + a literal join), so the whole computation is one scan +
    one hash aggregate; crucially the aggregate stays MERGEABLE (decayed
    sums add), unlike sliding-window recency counts which need the raw
    events retained."""
    ev = load_table(spark, sf_dir, "events")
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    mx = ev.agg(F.max(t).alias("tmax"))
    lam = math.log(2) / 24.0
    w = ev.crossJoin(F.broadcast(mx)).select(  # 1-row broadcast anchor
        "event_type",
        F.exp(-lam * ((F.col("tmax") - t) / 3_600_000_000.0)).alias("wt"),
        "value",
    )
    return (
        w.groupBy("event_type")
        .agg(
            F.round(F.sum("wt"), 6).alias("decayed_count"),
            F.round(F.sum(F.col("wt") * F.col("value")), 6).alias("decayed_value"),
            F.count("*").alias("raw_count"),
        )
        .orderBy("event_type")
    )


_EWMA_ALPHA = 0.3
_EWMA_WIN = 20


@register(
    "events_ewma",
    f"""
WITH seq AS (
  SELECT event_id, user_id, "value",
         list("value") OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {_EWMA_WIN - 1} PRECEDING AND CURRENT ROW
         ) AS w
  FROM events
)
SELECT event_id,
       floor(
         list_reduce(w, (acc, x) -> {_EWMA_ALPHA} * x + {1 - _EWMA_ALPHA} * acc)
         * 1000000 + 0.5
       ) / 1000000 AS ewma
FROM seq ORDER BY event_id
""",
)
def events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per user over a bounded
    20-sample window: the window collects the trailing values as an
    ARRAY, and the recurrence s = alpha*x + (1-alpha)*s folds over it
    with a higher-order aggregate — both the collection and the fold are
    JVM-side, no UDF. Bounding the window is what makes EWMA
    window-expressible at all (the unbounded recurrence is inherently
    sequential); 20 samples at alpha=0.3 carries (1-alpha)^20 ~ 0.0008
    of older mass, below the 6-dp quantization. The fold order (oldest
    first) is stated identically in both engines, so the raw doubles
    are bit-identical — but engine round() implementations disagree
    when raw*1e6 sits within an ulp of .5 (6 of 100k rows at sf0.1:
    Spark rounds the exact binary value via BigDecimal HALF_UP, DuckDB
    rounds through the multiply). The output therefore quantizes with
    an explicit floor(x*1e6 + 0.5)/1e6 stated identically in both
    engines: every operation is the same IEEE double op on the same
    bits, so the quantized result is deterministic across engines at
    any corpus size. The Spark floor returns LONG (DuckDB's stays
    DOUBLE), so it is cast back to double explicitly; both expressions
    assume |value*1e6| < 2^53, where long and double floors coincide
    exactly (events.value is O(100), so raw*1e6 is O(1e8))."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_EWMA_WIN - 1), 0)
    )
    seq = ev.select(
        "event_id", F.collect_list("value").over(w).alias("w")
    )
    raw = F.aggregate(
        F.expr("slice(w, 2, size(w) - 1)"),
        F.element_at("w", 1),
        lambda acc, x: _EWMA_ALPHA * x + (1 - _EWMA_ALPHA) * acc,
    )
    return seq.select(
        "event_id",
        (F.floor(raw * 1_000_000 + F.lit(0.5)).cast("double") / 1_000_000)
        .alias("ewma"),
    ).orderBy("event_id")


@register(
    "streaming_windowed_append",
    """
WITH mx AS (SELECT max(ts) AS m FROM events),
w AS (
  SELECT time_bucket(INTERVAL '15 minutes', ts) AS ws, event_type,
         count(*) AS n, round(sum("value"), 2) AS value_sum
  FROM events GROUP BY 1, 2
)
SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
       event_type, n, value_sum
FROM w, mx
WHERE ws + INTERVAL '15 minutes' <= m - INTERVAL '30 minutes'
ORDER BY 1, 2
""",
)
def streaming_windowed_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPEND-mode watermark semantics as a hashable result: the events
    replay as two chronological files (maxFilesPerTrigger=1), and the
    memory sink receives ONLY the windows the advancing watermark
    finalized — i.e. exactly the windows whose end is at or before
    max(event time) - 30 min, which the oracle states declaratively.
    This certifies late-data eviction end-to-end: a window emitted
    twice, a watermark that failed to advance between batches, or an
    unfinalized window leaking into the sink all hash-mismatch. (The
    final open windows stay IN STATE by design — append mode's
    exactly-once emission contract.)"""
    from ..streaming.events import run_windowed_append_demo

    return run_windowed_append_demo(spark, sf_dir).orderBy(
        "window_start", "event_type"
    )
