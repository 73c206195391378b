"""Comparison-BOUNDARY pins (round-12 mutation lens, second wave).

Three second-wave mutations flipped a comparison boundary and slipped
the driver gate because the continuous-valued corpus never lands
exactly ON a boundary: no event pair is gapped exactly 30:00, no
check-suite value sits exactly at its lo bound, and no embedding's
hyperplane projection is exactly 0 (measure-zero for real-valued
vectors).  These pins plant the boundary inputs the corpus cannot
produce, so `>` vs `>=` defects in those three spots fail a test
instead of shipping.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def _events(spark, tmp_path, rows):
    d = str(tmp_path)
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.parquet(f"{d}/events.parquet")
    return d


def test_session_gap_boundary_exactly_30min_stays_one_session(
    spark, tmp_path
):
    """The split rule is gap > 30min (STRICT): an exactly-30:00 gap
    continues the session, 30:01 starts a new one.  The driver corpus
    has no exact-boundary pair, so a >= mutation slipped the hash
    gate; this planted triple pins the strictness."""
    from acled_spark.queries.sessions import sess_user_sessions

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, t0, 7, "view", 1.0, None),
        # exactly 1800s later: SAME session
        (2, t0 + datetime.timedelta(seconds=1800), 7, "view", 1.0, None),
        # 1801s after event 2: NEW session
        (3, t0 + datetime.timedelta(seconds=3601), 7, "view", 1.0, None),
    ]
    d = _events(spark, tmp_path, rows)
    row = sess_user_sessions(spark, d).collect()[0]
    assert row["n_sessions"] == 2
    assert row["max_session_events"] == 2  # events 1+2 share a session


def test_value_range_bounds_are_inclusive(spark):
    """Values exactly AT lo/hi are in-range ([lo, hi], closed): the
    check-suite corpus never sits on a bound, so a < lo -> <= lo
    mutation slipped the driver gate."""
    from acled_spark.checks.engine import value_range

    df = spark.createDataFrame(
        [(0.0,), (10.0,), (-0.001,), (10.001,), (5.0,)], "v double"
    )
    res = value_range("v", lo=0.0, hi=10.0).run(df)
    assert res.metrics["out_of_range"] == 2  # only the two OUTSIDE rows
    assert not res.passed  # the suite flags them...
    clean = value_range("v", lo=0.0, hi=10.0).run(
        spark.createDataFrame([(0.0,), (10.0,)], "v double")
    )
    assert clean.passed  # ...but boundary values alone are clean


def test_lsh_zero_projection_signs_positive_both_engines(spark):
    """A zero vector projects to exactly 0 on every hyperplane; the
    sign convention is >= 0 -> bit '1' in BOTH the Spark and the
    DuckDB twin, so the bucket stays cross-engine-identical.  Exact-
    zero projections are measure-zero for real embeddings — only a
    planted one exercises the boundary."""
    import duckdb

    from acled_spark.queries.similarity import (
        DIM,
        N_PLANES,
        _bucket_spark,
        _bucket_sql,
    )

    zero = [0.0] * DIM
    got = (
        spark.createDataFrame([(zero,)], "embedding array<double>")
        .select(_bucket_spark(F.col("embedding")).alias("b"))
        .collect()[0]["b"]
    )
    assert got == "1" * N_PLANES
    duck = duckdb.sql(
        f"SELECT {_bucket_sql()} FROM (SELECT {zero!r}::DOUBLE[] AS e)"
    ).fetchone()[0]
    assert duck == got


def test_funnel_same_instant_step_is_not_after(spark, tmp_path):
    """Funnel advancement is STRICTLY-after (t1 > t0): a first view at
    the exact same instant as the signup does not count as
    viewed-after.  No corpus user has two same-instant first steps, so
    a >= mutation slipped the driver gate."""
    from acled_spark.queries.sessions import funnel_user_journey

    t0 = datetime.datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        # user 1: view at EXACTLY the signup instant -> not "after"
        (1, t0, 1, "signup", 1.0, None),
        (2, t0, 1, "view", 1.0, None),
        # user 2: view strictly after -> counts
        (3, t0, 2, "signup", 1.0, None),
        (4, t0 + datetime.timedelta(seconds=1), 2, "view", 1.0, None),
    ]
    d = _events(spark, tmp_path, rows)
    row = funnel_user_journey(spark, d).collect()[0]
    assert row["signed_up"] == 2
    assert row["viewed_after"] == 1  # user 2 only


def test_asof_join_same_instant_click_is_included(spark, tmp_path):
    """The as-of contract is t.ts >= q.ts (INCLUSIVE): a click at the
    exact purchase instant is that purchase's most-recent click (the
    sort places side 0 before side 1 at equal ts).  Pinned against the
    tiebreak flip the driver corpus cannot see (no same-instant
    click+purchase pair), and against DuckDB's native ASOF JOIN which
    defines the oracle semantics."""
    from acled_spark.queries.joins import j7_asof_join

    t0 = datetime.datetime(2024, 3, 1, 9, 0, 0)
    rows = [
        (1, t0 - datetime.timedelta(seconds=60), 7, "click", 5.0, None),
        (2, t0, 7, "click", 9.0, None),     # same instant as the purchase
        (3, t0, 7, "purchase", 1.0, None),  # must see click 2, gap 0
    ]
    d = _events(spark, tmp_path, rows)
    row = j7_asof_join(spark, d).collect()[0]
    assert row["gap_us"] == 0
    assert row["click_value"] == 9.0
