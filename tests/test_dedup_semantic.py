"""dedup_semantic (SemDeDup census) — round 13, VERDICT r12 #5.

Three layers, per the M14 self-certification rule (a rows-only query's
columns must be certified by something that does not trust them):

1. a hand-computed KNOWN ANSWER on :func:`semantic_dedup_census` with
   explicit cells and centroids — pins the keep-rule DIRECTION (the
   cluster-edge member survives) and the domination semantics, the two
   things a trajectory-dependent end-to-end check cannot pin;
2. a FULL EXTERNAL RECOMPUTE of the registered query on the
   adversarial tier (the only test corpus with planted semantic
   duplicates): numpy cosine matrices over the raw vectors re-derive
   every drop/keep decision, every dup_of choice, and every dup_cos
   value from nothing but the census's cell/priority assignment;
3. the composability contract: dropped rows join back onto the source
   frame by dup_of like any canonical-pick survivor map.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from acled_spark.queries.dedup import SEMANTIC_EPS, semantic_dedup_census

EPS_MARGIN = 1e-3  # numpy-vs-Spark fold-order guard band at the eps boundary


def test_census_known_answer_pins_keep_rule(spark):
    """One hand-built cell: va/vb are near-identical (cos ~ 0.99994),
    vc is orthogonal-ish.  The centroid leans toward va, so SemDeDup's
    keep rule must keep vb (the LESS centroid-similar of the dup pair)
    and drop va with dup_of=vb.  A flipped priority order (the
    plausible one-line mutation) keeps va instead and fails here."""
    vecs = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0], 0),          # va: closest to centroid
            (2, [0.99, 0.01, 0.0], 0),        # vb: its semantic dup
            (3, [0.0, 1.0, 0.0], 0),          # vc: distinct meaning
        ],
        "vec_id long, embedding array<double>, cell int",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.001, 0.0])], "cell int, centroid array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup_census(vecs, cents, eps=0.99).collect()
    }
    assert out[2]["action"] == "keep"     # cluster-edge member survives
    assert out[3]["action"] == "keep"     # not a duplicate of anything
    assert out[1]["action"] == "drop"
    assert out[1]["dup_of"] == 2
    assert out[1]["dup_cos"] == pytest.approx(0.9999, abs=1e-4)
    # priority order: vb (edge) ranks before va (center) in cell 0
    assert out[2]["rnk"] < out[1]["rnk"]
    # zero-eps degenerate guard is elsewhere; rnk is dense per cell
    assert sorted(r["rnk"] for r in out.values()) == [1, 2, 3]


def test_registered_census_recomputes_externally(spark):
    """Every column of the registered query re-derived with numpy on
    the adversarial tier (three planted exact-duplicate embeddings):
    given only the census's cell partition and priority order, the
    drop set, each dup_of, and each dup_cos must equal the
    from-raw-vectors recompute."""
    np = pytest.importorskip("numpy")

    from acled_spark.queries.dedup import dedup_semantic
    from tools.gen_adversarial_tier import ensure

    sf = ensure()
    census = {r["vec_id"]: r for r in dedup_semantic(spark, sf).collect()}
    assert census, "empty census"
    raw = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
        for r in spark.read.parquet(f"{sf}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
        if r["embedding"] is not None and len(r["embedding"]) > 0
    }

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        if na == 0 or nb == 0:
            return None
        return float(a @ b / (na * nb))

    # the tier's planted exact dups MUST be flagged (census has teeth)
    dropped = {v for v, r in census.items() if r["action"] == "drop"}
    assert len(dropped) >= 3

    by_cell: dict[int, list[int]] = {}
    for v, r in census.items():
        by_cell.setdefault(r["cell"], []).append(v)

    for cell, members in by_cell.items():
        # priority order as the census states it (rnk dense from 1)
        order = sorted(members, key=lambda v: census[v]["rnk"])
        assert [census[v]["rnk"] for v in order] == list(
            range(1, len(order) + 1)
        )
        # rnk must be consistent with the stated cent_cos ordering
        ccs = [census[v]["cent_cos"] for v in order]
        non_null = [c for c in ccs if c is not None]
        assert non_null == sorted(non_null)
        assert all(c is not None for c in ccs[: len(non_null)])
        for i, v in enumerate(order):
            dominators = [
                u
                for u in order[:i]
                if (c := cos(raw[u], raw[v])) is not None
                and c >= SEMANTIC_EPS - EPS_MARGIN
            ]
            clear_dominators = [
                u
                for u in order[:i]
                if (c := cos(raw[u], raw[v])) is not None
                and c >= SEMANTIC_EPS + EPS_MARGIN
            ]
            row = census[v]
            if clear_dominators:
                assert row["action"] == "drop", (cell, v)
            if not dominators:
                assert row["action"] == "keep", (cell, v)
            if row["action"] == "drop":
                assert row["dup_of"] in dominators
                # the HIGHEST-priority dominator is chosen
                assert row["dup_of"] == dominators[0]
                expect = cos(raw[row["dup_of"]], raw[v])
                assert math.isclose(
                    row["dup_cos"], expect, abs_tol=1.5e-4
                ), (v, row["dup_cos"], expect)
            else:
                assert row["dup_of"] is None and row["dup_cos"] is None


def test_census_composes_as_survivor_map(spark):
    """Keep/drop census composes like dedup_canonical_pick output: the
    kept set plus a (dropped -> dup_of) remap covers every valid
    vector exactly once, and remap targets are all kept rows."""
    from acled_spark.queries.dedup import dedup_semantic
    from tools.gen_adversarial_tier import ensure

    census = dedup_semantic(spark, ensure())
    kept = census.filter(F.col("action") == "keep")
    remap = census.filter(F.col("action") == "drop").select("vec_id", "dup_of")
    assert remap.join(
        kept.select(F.col("vec_id").alias("dup_of")), "dup_of", "left_anti"
    ).count() == 0
    assert kept.count() + remap.count() == census.count()
