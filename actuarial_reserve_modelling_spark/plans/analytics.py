"""Event-analytics composites over the ``events`` table: batch
sessionization (gaps-and-islands) and cohort retention — the workloads
an analytics user actually runs against an event stream's batch mirror.

Both are pure window/aggregate pipelines: one shuffle keyed by user for
the windows, one for the final rollup. At 100 TB the user key is the
natural partitioner and skewed power-users are the hazard — AQE skew
split handles the rollup; the per-user window is bounded by per-user
event counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from actuarial_reserve_modelling_spark.catalog import load_table
from actuarial_reserve_modelling_spark.plans.registry import register


@register(
    "w9_sessionization",
    "W2,W3,A4 (batch gaps-and-islands)",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    numbered AS (
        SELECT user_id, ts, event_id,
               CAST(sum(new_session) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS INT) AS session_idx
        FROM flagged
    )
    SELECT user_id, session_idx,
           count(*) AS n_events,
           CAST(min(ts) AS TIMESTAMP) AS session_start,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS duration_s
    FROM numbered
    WHERE user_id % 10 = 1
    GROUP BY user_id, session_idx
    """,
)
def w9_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization by 30-minute inactivity gaps: lag → flag →
    running-sum session index → per-session stats. The batch mirror of
    the streaming session window (t4) — same sessions, replayable over
    history. Two windows share one (user_id) shuffle partitioning."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.col("ts") - F.lag("ts").over(w) > F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("new_session"),
    )
    numbered = flagged.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("new_session")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("int")
        .alias("session_idx"),
    )
    return (
        numbered.filter(F.col("user_id") % 10 == 1)
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").cast("timestamp").alias("session_start"),
            (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
                "duration_s"
            ),
        )
    )


@register(
    "w10_cohort_retention",
    "W2,A4,A5,F4 (cohort analysis)",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               CAST(date_trunc('week', min(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ),
    activity AS (
        SELECT DISTINCT e.user_id,
               CAST(date_trunc('week', e.ts) AS TIMESTAMP) AS active_week
        FROM events e
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.active_week) // 7 AS INT)
               AS week_idx,
           count(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    """,
)
def w10_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen week, counted as
    active in each subsequent week. The first-seen table is user-sized
    (small, broadcastable at any realistic user count relative to the
    event volume); the activity distinct collapses events to
    (user, week) before the join."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("timestamp").alias("cohort_week")
    )
    activity = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("timestamp").alias("active_week")
    ).distinct()
    return (
        activity.join(F.broadcast(firsts), "user_id")
        .groupBy(
            "cohort_week",
            F.floor(F.datediff("active_week", "cohort_week") / 7)
            .cast("int")
            .alias("week_idx"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "w11_funnel",
    "A4,A5,J2,F8 (ordered-sequence funnel)",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) FILTER (event_type = 'view') AS t_view
        FROM events GROUP BY user_id HAVING t_view IS NOT NULL
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t_click
        FROM events e JOIN v USING (user_id)
        WHERE e.event_type = 'click' AND e.ts > v.t_view
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN c USING (user_id)
        WHERE e.event_type = 'purchase' AND e.ts > c.t_click
        GROUP BY e.user_id
    )
    SELECT count(v.user_id) AS n_view,
           count(c.user_id) AS n_click,
           count(p.user_id) AS n_purchase
    FROM v
    LEFT JOIN c USING (user_id)
    LEFT JOIN p USING (user_id)
    """,
)
def w11_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-sequence funnel view → click → purchase: each stage's
    entry time is the earliest qualifying event strictly after the
    previous stage. Three grouped mins joined back on user — the stage
    tables shrink monotonically, so at scale each successive join is
    cheaper (and broadcastable once below threshold); the events scan
    is reused by plan, not re-read."""
    ev = load_table(spark, sf_dir, "events")
    v = (
        ev.groupBy("user_id")
        .agg(F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias("t_view"))
        .filter(F.col("t_view").isNotNull())
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .agg(
            F.count("t_view").alias("n_view"),
            F.count("t_click").alias("n_click"),
            F.count("t_purchase").alias("n_purchase"),
        )
    )
