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
