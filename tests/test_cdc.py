"""Snapshot-diff (CDC) semantics on constructed frames.

The registered ``cdc_snapshot_diff`` query is oracle-checked in
test_parity; this pins the reusable two-frame API's per-status
semantics, including the fingerprint-normalization contract
(formatting-only edits are ``unchanged``).
"""

from __future__ import annotations

from acled_spark.queries.cdc import snapshot_diff

_COLS = ["doc_id", "source", "text"]


def test_snapshot_diff_statuses(spark):
    old = spark.createDataFrame(
        [
            (1, "s0", "alpha beta"),        # unchanged
            (2, "s0", "gamma delta"),       # changed in new
            (3, "s1", "epsilon"),           # removed in new
            (5, "s1", "Zeta   Eta"),        # formatting-only edit -> unchanged
            (6, "s2", None),                # NULL text, both sides -> unchanged
            (7, "s2", None),                # NULL text, old only -> removed
        ],
        _COLS,
    )
    new = spark.createDataFrame(
        [
            (1, "s0", "alpha beta"),
            (2, "s0", "gamma delta rev2"),
            (4, "s2", "theta"),             # added
            (5, "s1", "zeta eta"),
            (6, "s2", None),
            (8, "s2", None),                # NULL text, new only -> added
        ],
        _COLS,
    )
    got = {
        r["doc_id"]: (r["status"], r["source"])
        for r in snapshot_diff(old, new).collect()
    }
    assert got == {
        1: ("unchanged", "s0"),
        2: ("changed", "s0"),
        3: ("removed", "s1"),
        4: ("added", "s2"),
        5: ("unchanged", "s1"),
        6: ("unchanged", "s2"),
        7: ("removed", "s2"),
        8: ("added", "s2"),
    }


def test_snapshot_diff_never_shuffles_text(spark):
    """Text must be reduced to a digest before the join exchange."""
    old = spark.createDataFrame([(1, "s0", "alpha")], _COLS)
    new = spark.createDataFrame([(1, "s0", "alpha")], _COLS)
    plan = snapshot_diff(old, new)._jdf.queryExecution().executedPlan().toString()
    exchange_and_below = plan[plan.index("Exchange"):] if "Exchange" in plan else ""
    # every Exchange's output attribute list carries fp/digest columns,
    # never the raw text column
    for line in exchange_and_below.splitlines():
        if line.strip().startswith("+- Exchange") or line.strip().startswith("Exchange"):
            assert "text" not in line, line


def test_registered_oracle_parity_with_null_text(spark, tmp_path):
    """Engine-vs-oracle parity on a corpus WITH NULL texts (VERDICT r4 #2).

    The oracle keys presence on explicit join-side flags (not
    fingerprint NULL-ness), so a NULL-text doc present in both
    snapshots must classify 'unchanged' on BOTH sides.  doc_id=77
    survives both modulus filters (77%11=0, 77%13=12, 77%7=0 makes it
    'changed' — so use 76: 76%11=10, 76%13=11, 76%7=6 -> NULL text in
    old and new, untouched by the rev2 edit -> 'unchanged').
    """
    import duckdb

    from acled_spark.registry import all_specs
    from tests.conftest import assert_parity

    rows = [
        (76, None, "en", "s_null", 0),      # NULL text, both snapshots
        (154, None, "en", "s_null", 0),     # NULL text, 154%7=0 -> edit path
        (3, "plain doc", "en", "s0", 9),    # old-missing (3%11=3) -> added
        (18, None, "en", "s_null", 0),      # NULL text, new-missing (18%13=5)
        (1, "stable doc", "en", "s0", 10),
        # 7%11=7 and 7%13=7 (in both snapshots), 7%7=0 -> 'changed';
        # NOT 14, whose 14%11=3 drops it from old and makes it 'added'
        (7, "edited doc", "en", "s0", 10),
    ]
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )
    spec = all_specs()["cdc_snapshot_diff"]
    assert_parity(spark, con, spec, sf_dir=sf_dir)

    # and the engine-side classification itself: NULL-text in both ->
    # unchanged, never 'added'.  doc 154 hits the %7 edit path but
    # concat(NULL, ' rev2') stays NULL in both engines, so it is
    # unchanged too; doc 18 (NULL text, missing from new) is removed.
    got = {
        (r["status"], r["source"]): r["n_docs"]
        for r in spec.builder(spark, sf_dir).collect()
    }
    assert got[("unchanged", "s_null")] == 2  # docs 76, 154
    assert got[("removed", "s_null")] == 1    # doc 18
    assert ("added", "s_null") not in got
    assert got[("changed", "s0")] == 1        # doc 7: the non-NULL
    # IS-NOT-DISTINCT-FROM branch is exercised on a real fp change too
    con.close()


# --- property: snapshot_diff vs a pure-Python reference ----------------------
import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_texts = st.sampled_from(
    ["alpha beta", "Alpha   Beta", "gamma", "gamma rev2", "delta", None]
)
_snapshot = st.dictionaries(
    st.integers(min_value=0, max_value=9), _texts, max_size=8
)


def _norm(t):
    return None if t is None else re.sub(r"\s+", " ", t).strip().lower()


def _ref_diff(old: dict, new: dict) -> dict:
    out = {}
    for i in set(old) | set(new):
        if i not in old:
            out[i] = "added"
        elif i not in new:
            out[i] = "removed"
        elif _norm(old[i]) == _norm(new[i]):
            out[i] = "unchanged"
        else:
            out[i] = "changed"
    return out


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(old=_snapshot, new=_snapshot)
def test_snapshot_diff_matches_reference(spark, old, new):
    schema = "doc_id long, source string, text string"
    odf = spark.createDataFrame(
        [(i, "s", t) for i, t in old.items()], schema
    )
    ndf = spark.createDataFrame(
        [(i, "s", t) for i, t in new.items()], schema
    )
    got = {
        r["doc_id"]: r["status"] for r in snapshot_diff(odf, ndf).collect()
    }
    assert got == _ref_diff(old, new)
