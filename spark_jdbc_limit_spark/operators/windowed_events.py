"""Batch twins of the streaming window operators (SURVEY.md §2B
"streaming", build plan M4): identical window semantics expressed in batch
mode so the DuckDB oracle can verify them. tests/test_streaming.py
additionally proves the REAL streams (streaming/windows.py) produce the
same rows as these twins on the same files.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from spark_jdbc_limit_spark.operators.registry import query
from spark_jdbc_limit_spark.sources.catalog import load_table

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


@query(
    "events_tumbling_windows",
    category="streaming",
    description="Tumbling 5-minute windows per event type (batch twin)",
    oracle=f"""
        SELECT strftime(time_bucket(INTERVAL '5 minutes', ts), '{TS_FMT_DUCK}') AS window_start,
               event_type,
               COUNT(*) AS n_events,
               CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY 1, 2
        ORDER BY 1, 2
    """,
)
def events_tumbling_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "5 minutes"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(F.col("value").cast("decimal(18,6)")), 2).cast("double").alias("sum_value"),
        )
        .select(
            F.date_format("window.start", TS_FMT_SPARK).alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
        .orderBy("window_start", "event_type")
    )


@query(
    "events_sliding_windows",
    category="streaming",
    description="Sliding windows: 10-minute length, 5-minute slide (batch twin)",
    oracle=f"""
        SELECT strftime(time_bucket(INTERVAL '5 minutes', ts) - (k * INTERVAL '5 minutes'),
                        '{TS_FMT_DUCK}') AS window_start,
               COUNT(*) AS n_events
        FROM events, UNNEST([0, 1]) AS t(k)
        GROUP BY 1
        ORDER BY 1
    """,
)
def events_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A row falls in length/slide = 2 overlapping windows; Spark expands
    rows internally (Expand node) — the oracle does the same with UNNEST."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("window.start", TS_FMT_SPARK).alias("window_start"),
            "n_events",
        )
        .orderBy("window_start")
    )


@query(
    "events_session_windows",
    category="streaming",
    description="Session windows per user, 30-minute gap (batch twin)",
    oracle=f"""
        WITH ordered AS (
            SELECT user_id, ts,
                   CASE WHEN LAG(ts) OVER w IS NULL
                         OR ts - LAG(ts) OVER w >= INTERVAL '30 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), islands AS (
            SELECT user_id, ts,
                   SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM ordered
        )
        SELECT strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
               strftime(MAX(ts) + INTERVAL '30 minutes', '{TS_FMT_DUCK}') AS session_end,
               user_id,
               COUNT(*) AS n_events
        FROM islands
        GROUP BY user_id, sess_id
        ORDER BY user_id, session_start
    """,
)
def events_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """session_window in batch mode — sessions close after 30 idle minutes;
    window.end = last event + gap (same convention as the oracle's
    gaps-and-islands formulation)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.date_format("session_window.start", TS_FMT_SPARK).alias("session_start"),
            F.date_format("session_window.end", TS_FMT_SPARK).alias("session_end"),
            "user_id",
            "n_events",
        )
        .orderBy("user_id", "session_start")
    )


@query(
    "events_dedup_keys",
    category="streaming",
    description="Dedup on (user_id, event_type) — batch twin of streaming dedup",
    oracle="""
        SELECT DISTINCT user_id, event_type
        FROM events
        ORDER BY user_id, event_type
    """,
)
def events_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select("user_id", "event_type").distinct().orderBy("user_id", "event_type")


@query(
    "events_enrich_dim_join",
    category="streaming",
    description="Events enriched with the customer dimension (batch twin of the stream-static join)",
    oracle="""
        SELECT e.event_id, e.user_id, c.c_mktsegment AS segment,
               ROUND(e.value, 2) AS value_r
        FROM events e JOIN customer c ON c.c_custkey = e.user_id
        ORDER BY e.event_id
    """,
)
def events_enrich_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimension enrichment of the event stream, batch mode. The streaming
    twin (streaming/windows.py::stream_enriched_with_dim) runs the SAME
    join per micro-batch with the dim broadcast — the standard pattern for
    attaching slowly-changing reference data to a 100 TB/day stream
    without shuffling the stream side."""
    ev = load_table(spark, sf_dir, "events")
    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), F.col("c_mktsegment").alias("segment")
    )
    return ev.join(F.broadcast(dim), "user_id").select(
        "event_id", "user_id", "segment", F.round("value", 2).alias("value_r")
    )


SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes, in microseconds


@query(
    "events_sessionize_gap",
    category="streaming",
    description="Batch gap-based sessionization: 30-min inactivity splits sessions",
    oracle=f"""
        WITH o AS (
            SELECT user_id, event_id, ts, epoch_us(ts) AS us,
                   CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
                             OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > {SESSION_GAP_US}
                        THEN 1 ELSE 0 END AS brk
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        s AS (
            SELECT user_id, us,
                   SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                  ROWS UNBOUNDED PRECEDING) AS session_id
            FROM o
        )
        SELECT user_id,
               CAST(session_id AS BIGINT) AS session_id,
               COUNT(*) AS n_events,
               MIN(us) AS start_us,
               MAX(us) AS end_us,
               MAX(us) - MIN(us) AS duration_us
        FROM s
        GROUP BY user_id, session_id
    """,
)
def events_sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The classic event-stream sessionization, in batch: a session breaks
    after 30 minutes of inactivity; session ids are a running sum of break
    flags. Two window passes + one aggregate, all on the SAME partition
    key (user_id) — Catalyst plans ONE exchange and reuses its
    partitioning for both windows and the final groupBy, which is the
    shape that matters at 100 TB (users ≫ cores, so no skew; state never
    leaves the executor). Integer microsecond arithmetic end to end so
    the DuckDB twin is bit-exact (timestamps are NTZ; session pins UTC)."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    brk = F.when(
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > SESSION_GAP_US), 1
    ).otherwise(0)
    run = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    sess = (
        ev.select("user_id", "event_id", "ts", us.alias("us"), brk.alias("brk"))
        .select("user_id", "us", F.sum("brk").over(run).alias("session_id"))
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("us").alias("start_us"),
        F.max("us").alias("end_us"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


ATTRIBUTION_WINDOW_MIN = 10


@query(
    "events_view_click_attribution",
    category="streaming",
    description=f"View→click attribution join within {ATTRIBUTION_WINDOW_MIN} min (batch twin of the stream-stream join)",
    oracle=f"""
        SELECT v.event_id AS view_id,
               c.event_id AS click_id,
               v.user_id,
               epoch_us(c.ts) - epoch_us(v.ts) AS lag_us
        FROM events v
        JOIN events c
          ON v.user_id = c.user_id
         AND v.event_type = 'view' AND c.event_type = 'click'
         AND c.ts >= v.ts
         AND c.ts <= v.ts + INTERVAL {ATTRIBUTION_WINDOW_MIN} minutes
    """,
)
def events_view_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The attribution join every event pipeline runs: each view pairs
    with the same user's clicks in the next N minutes. Equi-key on
    user_id (hash join) with the time range as a post-join predicate —
    never a cross join. This is the batch twin of
    streaming/windows.py::stream_view_click_join, whose stream-stream
    state is exactly this join with watermark-bounded buffers;
    tests/test_streaming.py pins stream == batch row sets."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"),
        F.col("user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("v_us"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user_id"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("c_us"),
    )
    win_us = ATTRIBUTION_WINDOW_MIN * 60 * 1_000_000
    return (
        v.join(
            c,
            (F.col("user_id") == F.col("c_user_id"))
            & (F.col("c_us") >= F.col("v_us"))
            & (F.col("c_us") <= F.col("v_us") + win_us),
        )
        .select(
            "view_id",
            "click_id",
            "user_id",
            (F.col("c_us") - F.col("v_us")).alias("lag_us"),
        )
    )
