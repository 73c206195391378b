"""DB-API upsert sink (S8, JDBC face): the reference's ON CONFLICT
contract (base_assets.py:197-233) exercised against a real relational
store — stdlib sqlite3, whose ``ON CONFLICT (k) DO UPDATE SET
c=EXCLUDED.c`` grammar is the same as Postgres'.  The connection
factory is shipped to executor worker processes, so every write here is
genuinely distributed (concurrent writers against one database file).
"""

from __future__ import annotations

import functools
import sqlite3

import pytest
from pyspark.sql import functions as F

from acled_spark.db_sink import build_upsert_sql, upsert_dbapi

CREATE = """
CREATE TABLE IF NOT EXISTS events (
    event_id INTEGER PRIMARY KEY,
    region TEXT,
    value REAL
)
"""


def _factory(path):
    # bound by partial -> picklable; generous timeout because N writer
    # partitions share one sqlite file lock
    return functools.partial(sqlite3.connect, path, timeout=60)


def _frame(spark, rows):
    return spark.createDataFrame(rows, "event_id int, region string, value double")


def _dump(path, cols="event_id, region, value"):
    with sqlite3.connect(path) as conn:
        return sorted(conn.execute(f"SELECT {cols} FROM events"))


def test_upsert_roundtrip_and_count(spark, tmp_path):
    db = str(tmp_path / "t.db")
    rows = [(i, "EU" if i % 2 else "NA", float(i)) for i in range(100)]
    n = upsert_dbapi(
        _frame(spark, rows), _factory(db), "events", key="event_id",
        num_writers=4, batch_size=16, create_sql=CREATE,
    )
    assert n == 100
    assert _dump(db) == sorted(rows)


def test_replay_is_idempotent_and_conflicts_update(spark, tmp_path):
    db = str(tmp_path / "t.db")
    base = [(1, "EU", 1.0), (2, "NA", 2.0)]
    upsert_dbapi(_frame(spark, base), _factory(db), "events",
                 key="event_id", create_sql=CREATE)
    # replay -> no change
    upsert_dbapi(_frame(spark, base), _factory(db), "events", key="event_id")
    assert _dump(db) == sorted(base)
    # corrected rows win on the key, untouched keys survive
    upsert_dbapi(_frame(spark, [(2, "NA", 99.0), (3, "AS", 3.0)]),
                 _factory(db), "events", key="event_id")
    assert _dump(db) == [(1, "EU", 1.0), (2, "NA", 99.0), (3, "AS", 3.0)]


def test_duplicate_keys_in_batch_resolve_by_order_col(spark, tmp_path):
    """merge_updates pre-dedupe: the greatest order_col row per key is
    the one the database sees, independent of partitioning."""
    db = str(tmp_path / "t.db")
    dups = [(1, "old", 1.0), (1, "new", 2.0), (1, "mid", 1.5)]
    n = upsert_dbapi(
        _frame(spark, dups).repartition(8), _factory(db), "events",
        key="event_id", order_col="value", num_writers=4, create_sql=CREATE,
    )
    assert n == 1
    assert _dump(db) == [(1, "new", 2.0)]


def test_composite_key(spark, tmp_path):
    db = str(tmp_path / "c.db")
    create = (
        "CREATE TABLE IF NOT EXISTS events ("
        "event_id INTEGER, region TEXT, value REAL, "
        "PRIMARY KEY (event_id, region))"
    )
    upsert_dbapi(
        _frame(spark, [(1, "EU", 1.0), (1, "NA", 2.0)]), _factory(db),
        "events", key=["event_id", "region"], create_sql=create,
    )
    upsert_dbapi(
        _frame(spark, [(1, "EU", 9.0)]), _factory(db), "events",
        key=["event_id", "region"],
    )
    assert _dump(db) == [(1, "EU", 9.0), (1, "NA", 2.0)]


def test_empty_frame_writes_nothing(spark, tmp_path):
    db = str(tmp_path / "t.db")
    n = upsert_dbapi(
        _frame(spark, []).limit(0), _factory(db), "events",
        key="event_id", create_sql=CREATE,
    )
    assert n == 0
    assert _dump(db) == []


def test_bad_args_raise(spark, tmp_path):
    df = _frame(spark, [(1, "EU", 1.0)])
    f = _factory(str(tmp_path / "t.db"))
    with pytest.raises(ValueError, match="key columns"):
        upsert_dbapi(df, f, "events", key="nope")
    with pytest.raises(ValueError, match="num_writers"):
        upsert_dbapi(df, f, "events", key="event_id", num_writers=0)
    with pytest.raises(ValueError, match="batch_size"):
        upsert_dbapi(df, f, "events", key="event_id", batch_size=0)


def test_build_upsert_sql_dialects():
    sql = build_upsert_sql("t", ["k", "a", "b"], ["k"])
    assert sql == (
        'INSERT INTO "t" ("k", "a", "b") VALUES (?, ?, ?) '
        'ON CONFLICT ("k") DO UPDATE SET "a"=EXCLUDED."a", "b"=EXCLUDED."b"'
    )
    # psycopg2-style placeholders
    assert "VALUES (%s, %s)" in build_upsert_sql("t", ["k", "a"], ["k"],
                                                 paramstyle="format")
    # all-key table -> DO NOTHING (nothing to update)
    assert build_upsert_sql("t", ["k"], ["k"]).endswith("DO NOTHING")
    # verbatim dialect override (MySQL)
    assert build_upsert_sql(
        "t", ["k", "a"], ["k"],
        conflict_clause="ON DUPLICATE KEY UPDATE a=VALUES(a)",
    ).endswith("ON DUPLICATE KEY UPDATE a=VALUES(a)")
    with pytest.raises(ValueError, match="paramstyle"):
        build_upsert_sql("t", ["k"], ["k"], paramstyle="numeric")


def test_real_events_slice_end_to_end(spark, tmp_path):
    """The silver-shaped path: a day of the events table upserted, then
    replayed with corrections — row count stable, values shifted."""
    from acled_spark.tables import load

    db = str(tmp_path / "silver.db")
    create = (
        "CREATE TABLE IF NOT EXISTS events ("
        "event_id INTEGER PRIMARY KEY, event_type TEXT, value REAL)"
    )
    day = (
        load(spark, "/root/testdata/sf0.001", "events")
        .filter(F.to_date("ts") == "2024-01-05")
        .select("event_id", "event_type", "value")
    )
    n = upsert_dbapi(day, _factory(db), "events", key="event_id",
                     num_writers=4, create_sql=create)
    assert n == day.count() > 0
    cols = "event_id, event_type, value"
    before = _dump(db, cols)
    corrected = day.withColumn("value", F.col("value") + 1000.0)
    upsert_dbapi(corrected, _factory(db), "events", key="event_id",
                 num_writers=4)
    after = _dump(db, cols)
    assert len(after) == len(before)
    assert all(b2 - b1 == pytest.approx(1000.0)
               for (*_, b1), (*_, b2) in zip(before, after))


def test_null_key_rows_rejected_loudly(spark, tmp_path):
    """r7 review: SQL unique indexes treat NULLs as distinct, so ON
    CONFLICT never fires for a NULL-keyed row and every replay inserts
    it again — the idempotency contract demands a loud driver-side
    failure instead."""
    import pytest

    from acled_spark.db_sink import upsert_dbapi

    df = spark.createDataFrame(
        [(1, "a"), (None, "b")], "event_id long, payload string"
    )
    with pytest.raises(ValueError, match="NULL in key"):
        upsert_dbapi(
            df,
            _factory(str(tmp_path / "x.db")),
            "t",
            key="event_id",
            create_sql="CREATE TABLE IF NOT EXISTS t "
            "(event_id INTEGER PRIMARY KEY, payload TEXT)",
        )
