"""Oracle-parity tests: every registered query vs its DuckDB oracle.

This mirrors the driver's correctness gate (CORRECTNESS_r{N}.json) at
sf0.001 so regressions surface locally before a round runs.
"""

from __future__ import annotations

import pytest

from acled_spark.registry import all_specs
from tests.conftest import assert_parity

_SPECS = all_specs()
_WITH_ORACLE = [name for name, s in sorted(_SPECS.items()) if s.oracle is not None]


@pytest.mark.parametrize("name", _WITH_ORACLE)
def test_oracle_parity(spark, duck, name):
    assert_parity(spark, duck, _SPECS[name])


def test_all_queries_return_rows(spark):
    """Every query (oracle or not) must run and produce a stable schema,
    and the oracle-LESS queries — whose only other driver check is
    rows-only — must actually produce rows (r7 test review: the old
    version discarded the collect result, so a query regressing to
    0 rows passed a test named ...return_rows)."""
    no_oracle = {n for n, s in _SPECS.items() if s.oracle is None}
    for name, spec in sorted(_SPECS.items()):
        df = spec.builder(spark, "/root/testdata/sf0.001")
        assert df.columns, f"{name}: empty schema"
        rows = df.limit(1).collect()  # smoke-execute the plan
        if name in no_oracle:
            assert rows, f"{name}: oracle-less query returned zero rows"


def test_j1_global_mean_fallback_on_orphan_segment(spark, tmp_path):
    """The r12 mutation lens DROPPED j1's global-mean COALESCE and the
    driver gate stayed green: TPC-H assigns orders to every market
    segment at every sf, so the fallback branch was dead on the whole
    driver corpus.  Planted here: one customer in a segment with zero
    orders — builder and oracle must still agree, and the orphan row
    must carry the global mean (the branch the mutation killed)."""
    import duckdb

    d = str(tmp_path)
    spark.createDataFrame(
        [(1, "BUILDING"), (2, "BUILDING"), (3, "ORPHAN")],
        "c_custkey long, c_mktsegment string",
    ).coalesce(1).write.parquet(f"{d}/customer.parquet")
    spark.createDataFrame(
        [(10, 1, 100.0), (11, 1, 300.0), (12, 2, 200.0)],
        "o_orderkey long, o_custkey long, o_totalprice double",
    ).coalesce(1).write.parquet(f"{d}/orders.parquet")

    con = duckdb.connect()
    for t in ("customer", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{d}/{t}.parquet/*.parquet')"
        )
    spec = _SPECS["j1_target_stat_lookup"]
    assert_parity(spark, con, spec, sf_dir=d)
    rows = {r["c_custkey"]: r for r in spec.builder(spark, d).collect()}
    # global mean over the 3 orders = 200.0; the orphan segment has no
    # stats row, so its encoding IS the global mean
    assert rows[3]["segment_encoded"] == 200.0
    con.close()
