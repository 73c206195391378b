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
   frame by dup_of like any canonical-pick survivor map;
4. the INCREMENTAL face (:func:`semantic_classify_batch`): the
   lexical store's contract mirrored semantically (self-rule,
   keeper precedence, conservative store-absorbed dominators) plus
   agreement with the full census on a frozen quantizer.
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


def _mk_index(spark, vectors):
    from acled_spark.ann import build_ivf_index

    df = spark.createDataFrame(
        vectors, "vec_id long, embedding array<float>"
    )
    return build_ivf_index(df, nlist=2, max_iter=5, persist=False), df


def test_incremental_classify_batch_faces(spark):
    """semantic_classify_batch mirrors the lexical store's contract:
    replays are not dups (self-rule), near-copies of kept vectors flag
    is_semantic_dup with the most-similar keeper, novel vectors
    survive, within-batch near-pairs resolve by census priority, and a
    batch vector whose only dominator was store-absorbed is
    conservatively KEPT."""
    from acled_spark.queries.dedup import (
        semantic_classify_batch,
        semantic_dedup_census,
    )
    from acled_spark.ann import centroid_frame

    base = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 0.0, 1.0]),
    ]
    index, corpus = _mk_index(spark, base)
    kept = semantic_dedup_census(
        index.assigned, centroid_frame(spark, index.model)
    ).filter("action = 'keep'").select("vec_id", "cell").join(
        corpus, "vec_id"
    ).select("vec_id", "embedding", "cell")
    assert kept.count() == 4  # orthogonal basis: nothing drops

    batch = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),          # replay of kept id 1
            (10, [0.999, 0.01, 0.0, 0.0]),      # near-copy of kept 1
            (11, [0.9995, 0.005, 0.0, 0.0]),    # near kept 1 AND near 10
            (12, [0.5, 0.5, 0.5, 0.5]),         # novel direction
            (13, [0.51, 0.5, 0.5, 0.49]),       # near-copy of 12, in-batch
        ],
        "vec_id long, embedding array<float>",
    )
    v = {
        r["vec_id"]: r
        for r in semantic_classify_batch(index, batch, kept, eps=0.99).collect()
    }
    assert len(v) == 5
    # self-rule: the replay is NOT a store dup of itself...
    assert not v[1]["is_semantic_dup"]
    # ...but near-copies of a kept vector are, with the keeper as dup_of
    assert v[10]["is_semantic_dup"] and v[10]["dup_of"] == 1
    assert v[11]["is_semantic_dup"] and v[11]["dup_of"] == 1
    assert v[10]["dup_cos"] >= 0.99 and v[11]["dup_cos"] >= 0.99
    # store-absorbed dominators can't witness a batch drop: 10/11 both
    # left via the store face, so neither flags is_batch_dup
    assert not v[10]["is_batch_dup"] and not v[11]["is_batch_dup"]
    # novel pair: one survives, the other is a batch dup of it
    pair = {12: v[12], 13: v[13]}
    dropped = [i for i, r in pair.items() if r["is_batch_dup"]]
    survived = [i for i, r in pair.items() if not r["is_batch_dup"]]
    assert len(dropped) == 1 and len(survived) == 1
    assert not pair[dropped[0]]["is_semantic_dup"]
    assert pair[dropped[0]]["batch_dup_of"] == survived[0]
    # survivors = the append set: replay + one of the novel pair
    survivors = {
        i for i, r in v.items()
        if not r["is_semantic_dup"] and not r["is_batch_dup"]
    }
    assert survivors == {1, 12, 13} - {dropped[0]}


def test_incremental_agrees_with_full_census_on_disjoint_content(spark):
    """For a batch with no within-eps relation to the kept set, the
    incremental verdicts must agree with running the full census over
    old ∪ batch (restricted to the batch rows): same drop set, same
    within-batch dominators."""
    from acled_spark.ann import centroid_frame
    from acled_spark.queries.dedup import (
        semantic_classify_batch,
        semantic_dedup_census,
    )

    base = [(i, [float(i == j) for j in range(8)]) for i in range(4)]
    index, corpus = _mk_index(spark, base)
    kept = index.assigned.select("vec_id", "embedding", "cell")

    batch_rows = [
        (20, [0.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0]),
        (21, [0.0, 0.0, 0.0, 0.0, 0.999, 0.01, 0.0, 0.0]),
        (22, [0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 1.0, 0.0]),
    ]
    batch = spark.createDataFrame(
        batch_rows, "vec_id long, embedding array<float>"
    )
    inc = {
        r["vec_id"]: r
        for r in semantic_classify_batch(index, batch, kept, eps=0.99).collect()
    }
    # full census over the union, same frozen cells
    from acled_spark.ann import _assign_cells

    union = corpus.unionByName(batch)
    assigned = _assign_cells(index, union, "embedding", "vec_id").select(
        "vec_id", "embedding", "cell"
    )
    full = {
        r["vec_id"]: r
        for r in semantic_dedup_census(
            assigned, centroid_frame(spark, index.model), eps=0.99
        ).collect()
        if r["vec_id"] >= 20
    }
    for vid in (20, 21, 22):
        inc_dropped = inc[vid]["is_semantic_dup"] or inc[vid]["is_batch_dup"]
        assert inc_dropped == (full[vid]["action"] == "drop"), vid
    # the 20/21 near-pair resolves to the same dominator both ways
    dropped = [i for i in (20, 21) if inc[i]["is_batch_dup"]]
    assert len(dropped) == 1
    assert full[dropped[0]]["action"] == "drop"
    assert inc[dropped[0]]["batch_dup_of"] == full[dropped[0]]["dup_of"]
