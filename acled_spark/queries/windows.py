"""Window-function operators W1-W4 (SURVEY.md §2.5).

Reference citations under /root/reference/dagster_pipeline/dagster_acled/.

Scale note: W1/W4 window over an already-aggregated daily frame (365
rows/year after the rollup) — the window exchange is trivially small.
Never window raw 100 TB rows when the frame can be pre-aggregated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from acled_spark.registry import query
from acled_spark.tables import load


def _daily_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    # NULL-ts events are excluded (r8 lens review): the consumers are
    # ORDERED windows (moving average, lag), and the engines place a
    # NULL day at OPPOSITE ends of the sort (Spark NULLS FIRST, DuckDB
    # NULLS LAST) — one NULL-ts row silently shifts every frame and lag
    # pairing differently per engine.  Mirrored as ts IS NOT NULL in
    # the w1/w4 oracles; the sessionization family applies the same
    # rule for the same reason.
    ev = load(spark, sf_dir, "events")
    return (
        ev.filter(F.col("ts").isNotNull())
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count("*").alias("cnt"))
    )


# --- W1: trailing 7-day moving average (min_periods=1) ----------------------
# Ref: assets/report.py:283 (rolling(window=7, min_periods=1).mean()).
@query(
    "w1_moving_avg_7d",
    oracle="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
               FROM events WHERE ts IS NOT NULL GROUP BY day)
    SELECT day, cnt,
           ROUND(AVG(cnt) OVER (ORDER BY day
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS ma7
    FROM d ORDER BY day
    """,
    tags=("window", "time"),
)
def w1_moving_avg_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-row moving average with partial windows (ref report.py:283)."""
    d = _daily_counts(spark, sf_dir)
    w = Window.orderBy("day").rowsBetween(-6, 0)
    return d.select(
        "day", "cnt", F.round(F.avg("cnt").over(w), 4).alias("ma7")
    ).orderBy("day")


# --- W2: global-total share window ------------------------------------------
# Ref: asset_checks/acled_checks.py:853 (SUM(COUNT(*)) OVER ()).
@query(
    "w2_global_share",
    oracle="""
    WITH s AS (SELECT c_mktsegment, COUNT(*) AS cnt FROM customer GROUP BY c_mktsegment)
    SELECT c_mktsegment, cnt,
           ROUND(cnt * 100.0 / SUM(cnt) OVER (), 2) AS share_pct
    FROM s ORDER BY cnt DESC, c_mktsegment
    """,
    tags=("window",),
)
def w2_global_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of global total via empty-frame window (ref acled_checks.py:853)."""
    c = load(spark, sf_dir, "customer")
    s = c.groupBy("c_mktsegment").agg(F.count("*").alias("cnt"))
    w = Window.partitionBy()
    return s.select(
        "c_mktsegment",
        "cnt",
        F.round(F.col("cnt") * 100.0 / F.sum("cnt").over(w), 2).alias("share_pct"),
    ).orderBy(F.desc("cnt"), "c_mktsegment")


# --- W3: rank-by-order ------------------------------------------------------
# Ref: assets/report.py:432-459 ("Region Rank" = position after sort).
@query(
    "w3_rank_rows",
    oracle="""
    WITH s AS (SELECT event_type, COUNT(*) AS cnt FROM events GROUP BY event_type)
    SELECT event_type, cnt,
           CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, event_type NULLS LAST) AS BIGINT) AS rnk
    FROM s ORDER BY rnk
    """,
    tags=("window",),
)
def w3_rank_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number rank over sorted aggregate (ref report.py:432-459).

    The ascending tiebreak pins NULLS LAST on BOTH engines (r13
    adversarial tier): Spark's ASC default is NULLS FIRST, DuckDB's is
    NULLS LAST, so a NULL group key tied on cnt ranked differently per
    engine — the missing-type bucket now always ranks after real types.
    """
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("event_type").agg(F.count("*").alias("cnt"))
    w = Window.orderBy(F.desc("cnt"), F.asc_nulls_last("event_type"))
    return s.select(
        "event_type",
        "cnt",
        F.row_number().over(w).cast("long").alias("rnk"),
    ).orderBy("rnk")


# --- A20 (extended): ranking-function suite ----------------------------------
# rank / dense_rank / ntile — absent from the reference (SURVEY §2.5 note)
# but table-stakes window surface for an engine replacing it.
@query(
    "a20_ranking_suite",
    oracle="""
    WITH s AS (SELECT user_id, COUNT(*) AS cnt, ROUND(SUM(value), 2) AS total
               FROM events GROUP BY user_id)
    SELECT user_id, cnt, total,
           CAST(RANK() OVER (ORDER BY cnt DESC) AS BIGINT) AS rnk,
           CAST(DENSE_RANK() OVER (ORDER BY cnt DESC) AS BIGINT) AS drnk,
           CAST(NTILE(4) OVER (ORDER BY total DESC, user_id NULLS LAST) AS BIGINT) AS quartile
    FROM s ORDER BY user_id
    """,
    tags=("window", "extended"),
)
def a20_ranking_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile over a per-user aggregate (extended surface)."""
    ev = load(spark, sf_dir, "events")
    s = ev.groupBy("user_id").agg(
        F.count("*").alias("cnt"), F.round(F.sum("value"), 2).alias("total")
    )
    by_cnt = Window.orderBy(F.desc("cnt"))
    by_total = Window.orderBy(F.desc("total"), F.asc_nulls_last("user_id"))
    return s.select(
        "user_id",
        "cnt",
        "total",
        F.rank().over(by_cnt).cast("long").alias("rnk"),
        F.dense_rank().over(by_cnt).cast("long").alias("drnk"),
        F.ntile(4).over(by_total).cast("long").alias("quartile"),
    ).orderBy("user_id")


# --- F4 (scalar): date arithmetic / relative windows --------------------------
# Ref: assets/report.py:36-42 (end_date - timedelta(days_back)),
# ml.py:181-183 (training window) — date_sub/date_add/datediff.
@query(
    "f4_date_arithmetic",
    oracle="""
    WITH bounds AS (SELECT MAX(CAST(ts AS DATE)) AS end_day FROM events)
    SELECT CAST(ts AS DATE) AS day,
           COUNT(*) AS cnt,
           CAST(date_diff('day', CAST(ts AS DATE), b.end_day) AS INTEGER) AS days_before_end
    FROM events, bounds b
    WHERE CAST(ts AS DATE) >= b.end_day - INTERVAL 7 DAY
    GROUP BY day, b.end_day ORDER BY day
    """,
    tags=("scalar", "time"),
)
def f4_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative date window: last 7 days before the max date (ref report.py:36-42).

    The window bound derives from a 1-row aggregate broadcast onto the
    scan — the 'trailing N days' report/training pattern.
    """
    ev = load(spark, sf_dir, "events")
    bounds = ev.agg(F.max(F.to_date("ts")).alias("end_day"))
    return (
        ev.crossJoin(F.broadcast(bounds))
        .filter(F.to_date("ts") >= F.date_sub(F.col("end_day"), 7))
        .groupBy(F.to_date("ts").alias("day"), "end_day")
        .agg(F.count("*").alias("cnt"))
        .select(
            "day",
            "cnt",
            F.datediff(F.col("end_day"), F.col("day")).cast("int").alias(
                "days_before_end"
            ),
        )
        .orderBy("day")
    )


# --- W4 (extended): lag delta day-over-day ----------------------------------
# Beyond the reference's window surface; standard analytics-engine op.
@query(
    "w4_lag_delta",
    oracle="""
    WITH d AS (SELECT CAST(ts AS DATE) AS day, COUNT(*) AS cnt
               FROM events WHERE ts IS NOT NULL GROUP BY day)
    SELECT day, cnt,
           CAST(cnt - COALESCE(LAG(cnt, 1) OVER (ORDER BY day), 0) AS BIGINT) AS delta
    FROM d ORDER BY day
    """,
    tags=("window", "time", "extended"),
)
def w4_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-over-day delta via lag (extended window surface)."""
    d = _daily_counts(spark, sf_dir)
    w = Window.orderBy("day")
    return d.select(
        "day",
        "cnt",
        (F.col("cnt") - F.coalesce(F.lag("cnt", 1).over(w), F.lit(0)))
        .cast("long")
        .alias("delta"),
    ).orderBy("day")


# --- W5: event-time range frame ---------------------------------------------
# A RANGE frame over epoch seconds — the window shape Spark reserves for
# numeric orderBy (rangeBetween needs a numeric sort key, so event time
# is staged as epoch seconds).  The epoch derivation (NTZ->session-tz
# cast, then unix time) equals DuckDB's naive epoch(ts) ONLY under the
# UTC-pinned session tables.configure() enforces — in a DST zone the
# absolute offset varies across the data, so the cast does NOT cancel
# in subtraction (r8 lens review: do not relax the PARITY_CONF pin
# without re-deriving this query's key on both engines).
@query(
    "w5_range_frame",
    oracle="""
    WITH e AS (
      SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ep FROM events
    ),
    c AS (
      SELECT event_type,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY ep
                            RANGE BETWEEN 60 PRECEDING AND CURRENT ROW) - 1
               AS preceding_60s
      FROM e
    )
    SELECT event_type,
           COUNT(*) AS n_events,
           ROUND(AVG(preceding_60s), 4) AS avg_burst,
           CAST(MAX(preceding_60s) AS BIGINT) AS max_burst
    FROM c GROUP BY event_type ORDER BY event_type
    """,
    tags=("window", "range-frame", "extended"),
)
def w5_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type burstiness: same-user events in the 60 s before each event.

    count over RANGE [ep-60, ep] minus self — a value-based frame, not a
    row-based one, so gaps in event time are handled exactly.  (user_id,
    ts) is unique in events, so "minus self" is exact on both engines.
    Scale: one shuffle on user_id; the frame scan is linear per
    partition via Spark's sliding range-frame implementation.
    """
    ev = load(spark, sf_dir, "events")
    # floor on BOTH sides: DuckDB's double->BIGINT cast rounds half-even
    # while Spark's truncates, so an explicit floor is the only portable
    # seconds key.
    ep = F.floor(F.unix_micros(F.col("ts").cast("timestamp_ltz")) / F.lit(1_000_000))
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ep"))
        .rangeBetween(-60, 0)
    )
    c = ev.select(
        "user_id", "event_type", ep.cast("long").alias("ep")
    ).select("event_type", (F.count("*").over(w) - 1).alias("preceding_60s"))
    return (
        c.groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.avg("preceding_60s"), 4).alias("avg_burst"),
            F.max("preceding_60s").cast("long").alias("max_burst"),
        )
        .orderBy("event_type")
    )
