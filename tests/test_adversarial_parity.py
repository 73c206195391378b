"""Standing adversarial-corpus parity gate (round 13, VERDICT r12 #1).

The r12 mutation lens named corpus-shaped blindness as the driver hash
gate's dominant weakness: nine planted defects slipped because the
natural sf tiers never exercise NULLs, exact comparison boundaries,
same-instant events, unseen labels, or degenerate vectors.  This test
runs the FULL oracle-parity suite — every registered query against its
DuckDB oracle, the exact compare the driver applies — over the planted
boundary corpus from ``tools/gen_adversarial_tier.py``, so every query
(current and future) gets boundary coverage as a standing pytest gate,
not a per-bug bespoke pin.

First sweep findings (round 13, each fixed + re-verified 127/127):

- ``sim_quantize_error``: ANSI DIVIDE_BY_ZERO on the zero vector —
  Spark's subexpression elimination hoists the CodegenFallback
  aggregate past the CaseWhen guard under TakeOrderedAndProject
  (similarity.py: intrinsically-safe scale).
- ``f1_try_cast_json``: the ORACLE died on one malformed-JSON props
  row (DuckDB json_extract_string throws where Spark get_json_object
  is null-on-error) — json_valid guard in the oracle.
- ``s8_upsert_merge``: the oracle assumed a key-unique base table;
  planted duplicate event_ids made the NOT EXISTS keep both copies
  where merge_updates collapses per key (DISTINCT base CTE).
- ``w3_rank_rows``: ascending rank tiebreak on a nullable column —
  Spark ASC default is NULLS FIRST, DuckDB's NULLS LAST, so the NULL
  event_type group tied on cnt ranked differently per engine (pinned
  NULLS LAST on both; a20's latent ntile tiebreak pinned alongside).

Two tests: the oracled set must hash-MATCH exactly; the rows-only set
(a19/a26/sim_ann_ivf/sim_pca — self-certifying invariant columns) must
at least run to completion on the boundary corpus.
"""

from __future__ import annotations

import os

import duckdb
import pytest

import __spark_entry__ as E
from tests.conftest import normalize
from tools.gen_adversarial_tier import TABLES, ensure

# slow tier (VERDICT r14 #1): adversarial driver-sim tier (~6 min): the natural-tier parity suite and the driver's own oracle gate cover the same queries; run with `-m ""`.
pytestmark = pytest.mark.slow



@pytest.fixture(scope="session")
def adv_dir() -> str:
    return ensure()


@pytest.fixture(scope="session")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for name in TABLES:
        path = os.path.join(adv_dir, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def test_full_oracle_parity_on_adversarial_tier(spark, adv_dir, adv_duck):
    """Every oracled query, exact driver-style compare, one pass —
    failures aggregated so a regression names every affected query."""
    qs, osql = E.queries(), E.oracle_sql()
    bad = []
    for name in qs:
        if name not in osql:
            continue
        try:
            sdf = qs[name](spark, adv_dir)
            s_cols, s_rows = normalize(
                list(sdf.columns), [tuple(r) for r in sdf.collect()]
            )
            res = adv_duck.execute(osql[name])
            d_cols, d_rows = normalize(
                [d[0] for d in res.description],
                [tuple(r) for r in res.fetchall()],
            )
        except Exception as exc:  # noqa: BLE001 - aggregate, then fail
            bad.append(f"{name}: {type(exc).__name__}: {str(exc)[:120]}")
            continue
        if s_cols != d_cols:
            bad.append(f"{name}: cols {s_cols} != {d_cols}")
        elif [tuple(map(str, r)) for r in s_rows] != [
            tuple(map(str, r)) for r in d_rows
        ]:
            bad.append(f"{name}: values diverge ({len(s_rows)}/{len(d_rows)} rows)")
    assert not bad, "adversarial-tier parity failures:\n" + "\n".join(bad)


def test_rows_only_queries_survive_adversarial_tier(spark, adv_dir):
    """The four by-design rows-only queries must complete on the
    boundary corpus (their value invariants ride output columns and
    are pinned elsewhere; here the contract is no boundary crash)."""
    qs, osql = E.queries(), E.oracle_sql()
    crashes = []
    for name in qs:
        if name in osql:
            continue
        try:
            qs[name](spark, adv_dir).collect()
        except Exception as exc:  # noqa: BLE001
            crashes.append(f"{name}: {type(exc).__name__}: {str(exc)[:120]}")
    assert not crashes, "rows-only adversarial crashes:\n" + "\n".join(crashes)
