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


def test_census_chain_resolves_dup_of_to_kept_root(spark):
    """ADVICE r13 known answer: a transitive near-dup chain va~vb and
    vb~vc within eps, va~vc NOT.  With the centroid at 0 deg and the
    chain at 16/9/2 deg, priority (cent_cos ascending) is va rnk1,
    vb rnk2, vc rnk3.  vb drops under va; vc's ONLY dominator is vb
    (va sits past eps), so vc's direct witness is itself DROPPED —
    dup_of must resolve through the chain to the kept va while
    dup_witness keeps the within-eps evidence.  This is exactly the
    dangling-survivor-remap shape the r13 adversarial tier did not
    plant."""
    deg = math.radians
    arc = lambda d: [math.cos(deg(d)), math.sin(deg(d)), 0.0]  # noqa: E731
    # angles from the centroid direction (0 deg): va=16, vb=9, vc=2;
    # eps=0.99 is ~8.11 deg, so (va,vb)=7 and (vb,vc)=7 are pairs,
    # (va,vc)=14 is not
    vecs = spark.createDataFrame(
        [(1, arc(16.0), 0), (2, arc(9.0), 0), (3, arc(2.0), 0)],
        "vec_id long, embedding array<double>, cell int",
    )
    cents = spark.createDataFrame(
        [(0, arc(0.0))], "cell int, centroid array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup_census(vecs, cents, eps=0.99).collect()
    }
    assert [out[i]["rnk"] for i in (1, 2, 3)] == [1, 2, 3]
    assert out[1]["action"] == "keep"
    # vb: direct drop under va
    assert out[2]["action"] == "drop"
    assert out[2]["dup_witness"] == 1 and out[2]["dup_of"] == 1
    assert out[2]["dup_cos"] == pytest.approx(math.cos(deg(7.0)), abs=1e-6)
    # vc: witness is the DROPPED vb; dup_of resolves to the kept va
    # even though cos(va, vc) < eps (the documented chain semantics)
    assert out[3]["action"] == "drop"
    assert out[3]["dup_witness"] == 2
    assert out[3]["dup_of"] == 1
    assert out[3]["dup_cos"] == pytest.approx(math.cos(deg(7.0)), abs=1e-6)
    assert math.cos(deg(14.0)) < 0.99  # the chain premise itself


def test_census_eps_thresholds_unrounded_cosine(spark):
    """ADVICE r13: a true cosine just BELOW eps must not be flagged
    via 4-decimal rounding.  cos(8.06 deg) ~ 0.989876 rounds to 0.9899
    (still under), but cos(8.103 deg) ~ 0.990013... build the sharp
    case: a pair whose cosine is 0.98995 <= c < 0.99 — rounded-to-4 it
    reads 0.9900 and the old threshold flagged it."""
    deg = math.radians
    # angle with cosine ~0.98996: acos(0.98996) = 8.1276 deg
    a = 8.1276
    assert 0.98995 < math.cos(deg(a)) < 0.99
    arc = lambda d: [math.cos(deg(d)), math.sin(deg(d))]  # noqa: E731
    vecs = spark.createDataFrame(
        [(1, arc(0.0), 0), (2, arc(a), 0)],
        "vec_id long, embedding array<double>, cell int",
    )
    cents = spark.createDataFrame(
        [(0, arc(0.0))], "cell int, centroid array<double>"
    )
    out = {
        r["vec_id"]: r
        for r in semantic_dedup_census(vecs, cents, eps=0.99).collect()
    }
    assert out[1]["action"] == "keep" and out[2]["action"] == "keep"


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
                assert row["dup_witness"] in dominators
                # the HIGHEST-priority DIRECT dominator is the witness
                assert row["dup_witness"] == dominators[0]
                expect = cos(raw[row["dup_witness"]], raw[v])
                assert math.isclose(
                    row["dup_cos"], expect, abs_tol=1.5e-4
                ), (v, row["dup_cos"], expect)
                # dup_of = the witness chain resolved to a KEPT root
                # (ADVICE r13) — recompute the resolution externally
                root = row["dup_witness"]
                for _ in range(len(order)):
                    if census[root]["action"] == "keep":
                        break
                    root = census[root]["dup_witness"]
                assert row["dup_of"] == root, (v, row["dup_of"], root)
                assert census[row["dup_of"]]["action"] == "keep"
            else:
                assert row["dup_of"] is None and row["dup_cos"] is None
                assert row["dup_witness"] is None


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


def test_tier_chain_and_flood_shapes(spark):
    """The r14 adversarial-tier embedding shapes, end-to-end through
    the registered query:

    1. the planted transitive chain (K+11/12/13 at 2/9/16 deg) shares
       one quantizer cell and the far endpoint's dup_of resolves to
       the kept chain root through the dropped middle vector;
    2. the mutual-eps flood cell (K+14..K+19): uncapped, exactly one
       member keeps; capped below the cell size, the WHOLE cell is
       excluded from pairing and every member keeps (the documented
       max_block explicit-exclusion semantics, VERDICT r13 #5b)."""
    from acled_spark.queries.dedup import dedup_semantic
    from tools.gen_adversarial_tier import K, ensure

    sf = ensure()
    census = {r["vec_id"]: r for r in dedup_semantic(spark, sf).collect()}

    chain = [K + 11, K + 12, K + 13]
    assert len({census[i]["cell"] for i in chain}) == 1, (
        "chain trio split across cells — adjust planted angles"
    )
    # priority 2-deg < 9-deg < 16-deg in cent_cos?  The cell centroid
    # position depends on co-resident natural vectors, so pin only the
    # invariant part: one kept root, the other two drop, every dup_of
    # lands on a KEPT row, and any dropped row whose witness is itself
    # dropped resolved PAST it (the chain actually exercised).
    actions = {i: census[i]["action"] for i in chain}
    assert sorted(actions.values()) == ["drop", "drop", "keep"], actions
    kept_root = next(i for i in chain if actions[i] == "keep")
    for i in chain:
        if actions[i] == "drop":
            assert census[i]["dup_of"] == kept_root
            assert census[census[i]["dup_of"]]["action"] == "keep"
    # the far endpoint's DIRECT witness is the middle vector whenever
    # the middle dropped (it is the only within-eps higher or lower
    # neighbour of the endpoint)
    endpoints = {K + 11: K + 12, K + 13: K + 12}
    for ep, mid in endpoints.items():
        if actions[ep] == "drop" and actions[mid] == "drop":
            assert census[ep]["dup_witness"] == mid  # resolved past it

    flood = [K + 14 + j for j in range(6)]
    assert len({census[i]["cell"] for i in flood}) == 1, (
        "flood cell split — adjust planted angles"
    )
    flood_actions = [census[i]["action"] for i in flood]
    assert flood_actions.count("keep") == 1, flood_actions
    # capped below the cell size: the whole cell is excluded and every
    # member keeps
    flood_cell_size = sum(
        1 for r in census.values() if r["cell"] == census[flood[0]]["cell"]
    )
    capped = {
        r["vec_id"]: r
        for r in dedup_semantic(
            spark, sf, max_block=flood_cell_size - 1
        ).collect()
    }
    assert all(capped[i]["action"] == "keep" for i in flood)
    assert all(capped[i]["dup_of"] is None for i in flood)


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


def test_batch_drop_on_any_surviving_dominator(spark):
    """ADVICE r13: the batch face must drop a vector when ANY
    store-surviving dominator is within eps — not just when the single
    highest-priority one survives.  Geometry (2D arc, angles from the
    cell centroid at 0 deg; eps=0.99 is ~8.11 deg):

    - keeper w at 33 deg (the store),
    - batch d1 at 26 deg: 7 deg from w -> store-absorbed,
    - batch d2 at 24 deg: 9 deg from w -> store-survivor,
    - batch x  at 20 deg: within eps of BOTH d1 (6 deg) and d2
      (4 deg), 13 deg from w -> not a store dup.

    Priority is d1 rnk1, d2 rnk2, x rnk3, so x's HIGHEST-priority
    dominator is the absorbed d1 — the r13 code checked only d1 and
    kept x, letting two within-eps vectors (d2, x) both survive.  The
    fixed face filters the pair frame first: x drops as a batch dup
    of d2; d2 itself survives conservatively (its only dominator d1
    was absorbed)."""
    from acled_spark.ann import _assign_cells
    from acled_spark.queries.dedup import semantic_classify_batch

    deg = math.radians

    def arc(d):
        return [math.cos(deg(d)), math.sin(deg(d)), 0.0, 0.0]

    # index fit on two tight clusters -> centroids ~ e1 and ~ e3
    base = [
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0, 0.0]),
        (3, [0.0, 0.0, 1.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
    ]
    index, _ = _mk_index(spark, base)
    kept_raw = spark.createDataFrame(
        [(10, arc(33.0))], "vec_id long, embedding array<double>"
    )
    kept = _assign_cells(index, kept_raw, "embedding", "vec_id").select(
        "vec_id", "embedding", "cell"
    )
    batch = spark.createDataFrame(
        [(20, arc(26.0)), (21, arc(24.0)), (22, arc(20.0))],
        "vec_id long, embedding array<double>",
    )
    v = {
        r["vec_id"]: r
        for r in semantic_classify_batch(index, batch, kept, eps=0.99).collect()
    }
    # d1: store-absorbed
    assert v[20]["is_semantic_dup"] and v[20]["dup_of"] == 10
    assert not v[20]["is_batch_dup"]
    # d2: conservative keep (only dominator was absorbed)
    assert not v[21]["is_semantic_dup"] and not v[21]["is_batch_dup"]
    # x: dropped by the SURVIVING lower-priority dominator d2
    assert not v[22]["is_semantic_dup"]
    assert v[22]["is_batch_dup"], (
        "r13 regression: only the min-rnk dominator was checked for "
        "store absorption"
    )
    assert v[22]["batch_dup_of"] == 21
    assert v[22]["batch_dup_witness"] == 21
    assert v[22]["batch_dup_cos"] == pytest.approx(
        math.cos(deg(4.0)), abs=1e-6
    )


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
