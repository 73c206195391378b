"""Registry-WIDE physical-plan hygiene gate.

test_plans.py pins specific queries' plans; this suite asserts the
global invariants every registered query must satisfy at any scale —
the anti-pattern sweep the 100-TB design review runs by hand, executed
mechanically over the whole registry so a new query (or an optimizer
regression after a Spark upgrade) cannot silently reintroduce:

- a NON-broadcast cartesian product (CartesianProduct): quadratic
  row fan-out through a shuffle — always a bug here (tiny-frame
  cross-joins must broadcast; j9's interval join is
  BroadcastNestedLoopJoin, which is fine and distinct);
- unbounded scan duplication: a query re-reading its parquet inputs
  more than the known per-query bound means a shared pipeline got
  re-evaluated instead of reused (the class of regression the
  localCheckpoint/exchange-reuse work exists to prevent).

Queries whose BUILDERS execute driver-side loops (star contraction,
streaming certification, PCA, ANN fit) are exercised too — their
RETURNED frame must still satisfy the invariants (their loop-internal
jobs are covered by their own plan pins).
"""

from __future__ import annotations

import re

import pytest

from acled_spark.registry import all_specs

SF_DIR = "/root/testdata/sf0.001"

# Known per-query parquet-scan bounds ABOVE the default of 4.  Every
# entry must carry the reason; an unexplained growth fails the gate.
_SCAN_BOUND_EXCEPTIONS = {
    # classifies one corpus half against the other: each half's
    # fingerprint AND band pipelines scan their (pruned) side — 4
    # scans per side is the documented per-half-pipeline design
    "dedup_incremental_check": 8,
    # old + new snapshot, each fingerprinted for diff AND retained-set
    "release_delta_audit": 6,
    # contamination joins train-side grams to eval-side grams, each
    # side re-derived from its pruned scan + the split lookup
    "text_contamination": 6,
    # winnowing self-join: two exploded fingerprint streams
    "text_winnow_pairs": 6,
    # dup-span self-join over two exploded gram streams + doc lengths
    "text_dup_spans": 6,
    # two-pass by design: vocabulary LM scan + scoring scan
    "text_unigram_logprob": 5,
    # CERTIFICATION face: the exact brute-force baseline and the IVF
    # path each re-derive from the (tiny at cert time) embeddings
    # table to stay independent — the production face (ann.ivf_search)
    # scans once; cert cost priced in SCALE.md
    "sim_ann_ivf": 8,
    # five-check suite fused into one job over one table, but the
    # validation census reads events once per independent check family
    "chk_validation_summary": 5,
}
_DEFAULT_SCAN_BOUND = 4


def _final_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.mark.parametrize("name", sorted(all_specs()))
def test_no_cartesian_and_bounded_scans(spark, name):
    df = all_specs()[name].builder(spark, SF_DIR)
    plan = _final_plan(df)
    assert "CartesianProduct" not in plan, (
        f"{name}: non-broadcast cartesian product in the physical plan"
    )
    n_scans = len(re.findall(r"Scan parquet", plan))
    bound = _SCAN_BOUND_EXCEPTIONS.get(name, _DEFAULT_SCAN_BOUND)
    assert n_scans <= bound, (
        f"{name}: {n_scans} parquet scans (bound {bound}) — a shared "
        "pipeline is being re-evaluated; reuse or checkpoint it"
    )
