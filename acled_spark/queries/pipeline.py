"""Pipeline-semantics operators: keyed upsert merge (S8) and tumbling
daily bucketing (T3) — the batch-checkable faces of the silver/streaming
layers (SURVEY §2.1 S8, §2.10 T3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from acled_spark.registry import query
from acled_spark.silver import merge_updates
from acled_spark.tables import load

# Deterministic simulated update batch over `events`:
#   - every event of a user_id % 7 == 0 gets value + 100 (corrections)
#   - every event_id % 13 == 0 is re-keyed to event_id + 10_000_000 (new rows)
_NEW_KEY_OFFSET = 10_000_000


def _updates(ev: DataFrame) -> DataFrame:
    corrections = ev.filter(F.col("user_id") % 7 == 0).withColumn(
        "value", F.col("value") + 100.0
    )
    inserts = ev.filter(F.col("event_id") % 13 == 0).withColumn(
        "event_id", F.col("event_id") + _NEW_KEY_OFFSET
    )
    return corrections.unionByName(inserts)


@query(
    "s8_upsert_merge",
    oracle=f"""
    WITH updates AS (
      SELECT event_id, ts, user_id, event_type, value + 100.0 AS value, props
      FROM events WHERE user_id % 7 = 0
      UNION ALL
      SELECT event_id + {_NEW_KEY_OFFSET} AS event_id, ts, user_id, event_type, value, props
      FROM events WHERE event_id % 13 = 0
    ),
    merged AS (
      SELECT * FROM updates
      UNION ALL
      SELECT e.* FROM events e
      WHERE NOT EXISTS (SELECT 1 FROM updates u WHERE u.event_id = e.event_id)
    )
    SELECT COUNT(*) AS n_rows,
           COUNT(DISTINCT event_id) AS n_keys,
           ROUND(SUM(value), 2) AS total_value,
           COUNT(CASE WHEN event_id >= {_NEW_KEY_OFFSET} THEN 1 END) AS n_inserted
    FROM merged
    """,
    tags=("pipeline", "upsert"),
)
def s8_upsert_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PK-upsert MERGE semantics audit (ref base_assets.py:197-233).

    Runs the engine's actual merge operator
    (:func:`acled_spark.silver.merge_updates`) against a simulated
    correction+insert batch; the oracle re-derives the same MERGE with
    NOT EXISTS set logic.  n_rows == n_keys proves key uniqueness after
    merge; total_value shifts by exactly 100×|corrections|.
    """
    ev = load(spark, sf_dir, "events")
    merged = merge_updates(ev, _updates(ev), key="event_id")
    return merged.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("event_id").alias("n_keys"),
        F.round(F.sum("value"), 2).alias("total_value"),
        F.count(F.when(F.col("event_id") >= _NEW_KEY_OFFSET, 1)).alias("n_inserted"),
    )


@query(
    "t3_tumbling_window",
    oracle="""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS window_start,
           COUNT(*) AS event_count,
           ROUND(SUM(value), 2) AS total_value
    FROM events GROUP BY window_start ORDER BY window_start
    """,
    tags=("pipeline", "streaming", "time"),
)
def t3_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-day window aggregation (ref partitions.py:9-11, T3).

    Uses the streaming-native ``window()`` operator in batch mode — the
    exact same expression runs under readStream with a watermark (see
    acled_spark.streaming); daily partition = tumbling calendar-day
    window.
    """
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 day").alias("w"))
        .agg(
            F.count("*").alias("event_count"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_count",
            "total_value",
        )
        .orderBy("window_start")
    )
