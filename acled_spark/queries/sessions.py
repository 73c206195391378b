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
      SELECT user_id, event_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR ts - LAG(ts) OVER w > INTERVAL {SESSION_GAP_MIN} MINUTE
                  THEN 1 ELSE 0 END AS new_session
      FROM events WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id
      FROM flagged
    ),
    per_session AS (
      SELECT user_id, session_id, COUNT(*) AS n_events
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
    """Per-user session stats from 30-min-gap sessionization.

    NULL-timestamp events are excluded on both engines: they cannot be
    sessionized, and the engines disagree on where NULLs sort in an
    ascending window (Spark first, DuckDB last), so keeping them would
    pair lag/lead chains differently per engine.
    """
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
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
        "user_id", "event_id", "ts", new_session.alias("new_session")
    ).withColumn("session_id", F.sum("new_session").over(run))
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count("*").alias("n_events"),
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


# --- ordered user-journey funnel --------------------------------------------
_FUNNEL_STEPS = ("signup", "view", "click", "purchase")


@query(
    "funnel_user_journey",
    oracle="""
    WITH m AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t0,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t1,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t2,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t3
      FROM events GROUP BY user_id
    ),
    s AS (
      SELECT t0 IS NOT NULL AS s0,
             t0 IS NOT NULL AND t1 > t0 AS s1,
             t0 IS NOT NULL AND t1 > t0 AND t2 > t1 AS s2,
             t0 IS NOT NULL AND t1 > t0 AND t2 > t1 AND t3 > t2 AS s3
      FROM m
    )
    SELECT COUNT(*) AS users,
           COUNT(CASE WHEN s0 THEN 1 END) AS signed_up,
           COUNT(CASE WHEN s1 THEN 1 END) AS viewed_after,
           COUNT(CASE WHEN s2 THEN 1 END) AS clicked_after,
           COUNT(CASE WHEN s3 THEN 1 END) AS purchased_after
    FROM s
    """,
    tags=("funnel", "session", "extended"),
)
def funnel_user_journey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup->view->click->purchase funnel (first-occurrence).

    One conditional-min aggregation per user (single shuffle on
    user_id), then pure column logic: a user advances to step k only if
    their FIRST step-k event is strictly after their first step-(k-1)
    event.  NULL timestamps fail every comparison, so drop-off falls
    out of three-valued logic with no special-casing.  Scale: the wide
    stage carries 4 timestamps per user; the funnel math is free.
    """
    ev = load(spark, sf_dir, "events")
    m = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == step, F.col("ts"))).alias(f"t{i}")
            for i, step in enumerate(_FUNNEL_STEPS)
        ]
    )
    s0 = F.col("t0").isNotNull()
    s1 = s0 & (F.col("t1") > F.col("t0"))
    s2 = s1 & (F.col("t2") > F.col("t1"))
    s3 = s2 & (F.col("t3") > F.col("t2"))
    return m.agg(
        F.count("*").alias("users"),
        F.count(F.when(s0, 1)).alias("signed_up"),
        F.count(F.when(s1, 1)).alias("viewed_after"),
        F.count(F.when(s2, 1)).alias("clicked_after"),
        F.count(F.when(s3, 1)).alias("purchased_after"),
    )


# --- weekly cohort retention -------------------------------------------------
RETENTION_WEEKS = 4  # offsets 0..3


@query(
    "cohort_retention",
    oracle=f"""
    WITH act AS (
      SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      FROM events
    ),
    c AS (
      SELECT user_id, week,
             MIN(week) OVER (PARTITION BY user_id) AS cohort_week
      FROM act
    ),
    o AS (
      SELECT user_id, cohort_week,
             date_diff('day', cohort_week, week) // 7 AS wk_offset
      FROM c
    )
    SELECT cohort_week,
           COUNT(DISTINCT user_id) AS cohort_size,
           {", ".join(f"COUNT(DISTINCT CASE WHEN wk_offset = {k} THEN user_id END) AS w{k}" for k in range(RETENTION_WEEKS))}
    FROM o GROUP BY cohort_week ORDER BY cohort_week
    """,
    tags=("sessions", "cohort", "extended"),
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: of the users whose FIRST activity
    fell in cohort_week, how many were active again k weeks later.

    Both engines truncate weeks to Monday and difference the truncated
    dates, so the offset is exact integer arithmetic.  Scale: the
    (user, week) distinct is the only corpus-sized shuffle; the
    first-seen window rides the same user-keyed partitioning, and the
    final rollup is weeks x offsets.  cohort_size == w0 by construction
    (every user is active in their own first week) — kept as a built-in
    sanity column.
    """
    ev = load(spark, sf_dir, "events")
    act = ev.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("week")
    ).distinct()
    c = act.withColumn(
        "cohort_week", F.min("week").over(Window.partitionBy("user_id"))
    )
    o = c.select(
        "user_id",
        "cohort_week",
        F.floor(F.datediff("week", "cohort_week") / 7).alias("wk_offset"),
    )
    aggs = [F.count_distinct("user_id").alias("cohort_size")] + [
        F.count_distinct(F.when(F.col("wk_offset") == k, F.col("user_id"))).alias(f"w{k}")
        for k in range(RETENTION_WEEKS)
    ]
    return o.groupBy("cohort_week").agg(*aggs).orderBy("cohort_week")


# --- cumulative distinct users (running reach) -------------------------------
@query(
    "w6_cumulative_distinct",
    oracle="""
    WITH d AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
               WHERE ts IS NOT NULL),
    f AS (
      SELECT user_id, day,
             day = MIN(day) OVER (PARTITION BY user_id) AS is_first
      FROM d
    ),
    per_day AS (
      SELECT day,
             COUNT(*) AS daily_active,
             COUNT(CASE WHEN is_first THEN 1 END) AS new_users
      FROM f GROUP BY day
    )
    SELECT day, daily_active, new_users,
           CAST(SUM(new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumulative_users
    FROM per_day ORDER BY day
    """,
    tags=("window", "extended"),
)
def w6_cumulative_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active / new / cumulative-distinct user counts.

    COUNT(DISTINCT) OVER a running frame isn't supported by either
    engine, so running reach is decomposed the scalable way: a user
    contributes to the cumulative count exactly on their FIRST day
    (first-seen window flag), and the running sum of new_users over the
    tiny per-day rollup reproduces the running distinct total.  Scale:
    one (user, day) distinct shuffle + user-keyed window; the ordered
    running sum touches only |days| rows.
    """
    # NULL ts would be a NULL day ordering first (Spark) vs last
    # (DuckDB) in the running window — excluded identically instead
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    d = ev.select("user_id", F.col("ts").cast("date").alias("day")).distinct()
    f = d.withColumn(
        "is_first", F.col("day") == F.min("day").over(Window.partitionBy("user_id"))
    )
    per_day = f.groupBy("day").agg(
        F.count("*").alias("daily_active"),
        F.count(F.when(F.col("is_first"), 1)).alias("new_users"),
    )
    running = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return per_day.select(
        "day",
        "daily_active",
        "new_users",
        F.sum("new_users").over(running).cast("long").alias("cumulative_users"),
    ).orderBy("day")


# --- event-type transition matrix (first-order Markov) -----------------------
@query(
    "sess_transitions",
    oracle="""
    WITH nxt AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS to_type
      FROM events WHERE ts IS NOT NULL
    ),
    pairs AS (
      SELECT from_type, to_type, COUNT(*) AS cnt
      FROM nxt WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, cnt,
           ROUND(cnt / CAST(SUM(cnt) OVER (PARTITION BY from_type) AS DOUBLE), 4)
             AS prob
    FROM pairs ORDER BY from_type, to_type
    """,
    tags=("sessions", "extended"),
)
def sess_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences.

    lead() over the (user, time) sort pairs each event with its
    successor; the terminal event of each user drops out (NULL lead).
    The probability divides exact integer counts, so only the final
    ROUND is floating.  Scale: one user-keyed window shuffle over the
    stream, then a |types|^2 aggregate — the window partitioning is
    reused straight from the sessionization family.
    """
    # NULL-ts events excluded on both engines (sort-position divergence)
    ev = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    wu = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(wu).alias("to_type"),
    )
    pairs = (
        nxt.filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count("*").alias("cnt"))
    )
    wf = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "cnt",
        F.round(F.col("cnt") / F.sum("cnt").over(wf).cast("double"), 4).alias("prob"),
    ).orderBy("from_type", "to_type")
