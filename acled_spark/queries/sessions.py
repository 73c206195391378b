"""Sessionization: gap-based user sessions over the event stream
(extended surface — the canonical stateful-analytics operator).

Batch formulation: lag-gap flag -> running sum = session id (two window
functions over one user-partitioned sort).  The streaming twin is
``applyInPandasWithState`` with a session-gap timeout (see
tests/test_stateful_streaming.py) — same semantics, incremental state.

Scale: one shuffle on user_id; sessions assemble within each partition.
Skewed power-users are the hazard — AQE skew handling, or pre-split
ultra-hot keys by (user_id, day) when sessions can't span days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from acled_spark.registry import query
from acled_spark.tables import load

SESSION_GAP_MIN = 30


@query(
    "sess_user_sessions",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, ts, value,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts, value,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events,
             ROUND(SUM(value), 2) AS session_value
      FROM sessions GROUP BY user_id, session_id
    )
    SELECT user_id,
           COUNT(*) AS n_sessions,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(MAX(n_events) AS BIGINT) AS max_session_events,
           ROUND(AVG(n_events), 4) AS avg_session_events
    FROM per_session GROUP BY user_id
    ORDER BY user_id
    """,
    tags=("sessions", "window", "extended"),
)
def sess_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session stats from 30-min-gap sessionization."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_session = F.when(
        F.lag("ts").over(w).isNull()
        | (
            F.col("ts") - F.lag("ts").over(w)
            > F.expr(f"INTERVAL '{SESSION_GAP_MIN}' MINUTE")
        ),
        1,
    ).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    sessions = ev.select(
        "user_id", "event_id", "ts", "value", new_session.alias("new_session")
    ).withColumn("session_id", F.sum("new_session").over(run))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )
    return (
        per_session.groupBy("user_id")
        .agg(
            F.count("*").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("total_events"),
            F.max("n_events").cast("long").alias("max_session_events"),
            F.round(F.avg("n_events"), 4).alias("avg_session_events"),
        )
        .orderBy("user_id")
    )
