"""Cross-engine parity for the ordered-window queries on a PLANTED
NULL-ts corpus (r8 lens review).

Spark window sorts place NULL FIRST, DuckDB's place it LAST — so one
NULL-ts event used to shift every w1 moving-average frame and w4 lag
pairing differently per engine (verified live: ma7 diverged on every
row).  Both engines now exclude NULL-ts days from the daily counts;
this suite plants NULL-ts events and runs the registered queries'
engine-vs-oracle parity over them, so the exclusion can't silently
regress when someone edits `_daily_counts` or the oracles.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest

from acled_spark.registry import all_specs
from tests.conftest import assert_parity

# w1/w4 read only the events table; a23 groups by day too (its NULL-day
# row is dropped by the n_obs filter on both engines — pinned here so
# that coincidence stays true).
_WINDOW_QUERIES = ["w1_moving_avg_7d", "w4_lag_delta", "a23_daily_anomaly"]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("win_edge")
    rows = []
    eid = 0
    for day in range(1, 11):                      # 10 days x 4 events
        for k in range(4):
            rows.append(
                (eid, dt.datetime(2024, 1, day, 8 + k), "click",
                 100 + eid, float(day * 10 + k))
            )
            eid += 1
    for _ in range(3):                            # the planted NULL-ts rows
        rows.append((eid, None, "click", 100 + eid, 1.0))
        eid += 1
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, event_type string, "
        "user_id long, value double",
    ).coalesce(1).write.parquet(str(d / "events.parquet"))
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{edge_dir}/events.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _WINDOW_QUERIES)
def test_window_edge_corpus_parity(spark, edge_duck, edge_dir, name):
    assert_parity(spark, edge_duck, all_specs()[name], sf_dir=edge_dir)


def test_null_ts_days_excluded_not_reordered(spark, edge_dir):
    """The semantic pin behind the parity: the NULL day appears in
    NEITHER engine's output (instead of leading Spark's sort and
    trailing DuckDB's), and the real days' frames are unaffected."""
    rows = all_specs()["w1_moving_avg_7d"].builder(spark, edge_dir).collect()
    assert len(rows) == 10                       # 10 real days, no NULL row
    assert all(r["day"] is not None for r in rows)
    assert rows[0]["ma7"] == 4.0                 # first frame = day 1 alone
