"""Planted-heavy-tail pins for the two round-12 frequency-floor knobs
(VERDICT r11 #1): ``text_bigram_logprob(min_count)`` and
``drift_vocab_js(support_floor)``.

The corpus mirrors tools/measure_bigram_floor.py's planted tier in
miniature: three 'natural' sources whose docs repeat a small shared
vocabulary (every natural gram count comfortably above the floors),
plus one 'webtail' source whose tokens are doc-unique — every webtail
gram is hapax.  The floors must cut the hapax tail out of the LM /
support artifact while leaving natural documents' scores and verdicts
intact; the measured full-size table is SCALE.md §bigram-floor.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from acled_spark.queries.text import drift_vocab_js, text_bigram_logprob

NATURAL_TEXT = "alpha beta gamma delta alpha beta gamma delta alpha beta"
N_NATURAL = 8           # docs per natural source
N_TAIL_DOCS = 10
N_TAIL_TOKENS = 12
TAIL_BASE = 1_000


@pytest.fixture(scope="module")
def tail_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("floor_tail")
    rows = []
    doc = 0
    for s in ("s0", "s1", "s2"):
        for _ in range(N_NATURAL):
            rows.append((doc, NATURAL_TEXT, "en", s, len(NATURAL_TEXT)))
            doc += 1
    for i in range(N_TAIL_DOCS):
        text = " ".join(
            f"w{TAIL_BASE + i}x{j}" for j in range(N_TAIL_TOKENS)
        )
        rows.append((TAIL_BASE + i, text, "xx", "webtail", len(text)))
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(d / "documents.parquet")
    )
    return str(d)


def _nll_by_doc(spark, tail_dir, min_count):
    return {
        r["doc_id"]: r["avg_nll"]
        for r in text_bigram_logprob(spark, tail_dir, min_count=min_count).collect()
    }


def test_bigram_floor_cuts_hapax_tail_from_lm_only(spark, tail_dir):
    """min_count=2 drops every webtail (hapax) bigram from the LM but
    natural bigrams — all repeated 8x3 times — survive; the artifact
    shrinks from hapax-majority to the repeated-gram vocabulary."""
    from acled_spark.queries.text import WS, ws_trim

    docs = spark.read.parquet(f"{tail_dir}/documents.parquet")
    arr = F.split(F.lower(ws_trim(F.col("text"))), f"{WS}+")
    lm = (
        docs.select(arr.alias("arr"))
        .filter(F.size("arr") >= 2)
        .select(
            F.explode(
                F.arrays_zip(
                    F.expr("slice(arr, 1, size(arr) - 1)").alias("w1"),
                    F.expr("slice(arr, 2, size(arr) - 1)").alias("w2"),
                )
            ).alias("b")
        )
        .groupBy("b.w1", "b.w2")
        .agg(F.count("*").alias("c12"))
    )
    total = lm.count()
    kept = lm.filter(F.col("c12") >= 2).count()
    n_hapax_tail = N_TAIL_DOCS * (N_TAIL_TOKENS - 1)
    assert total == kept + n_hapax_tail  # the tail is exactly the hapax set
    assert kept == 4  # alpha-beta, beta-gamma, gamma-delta, delta-alpha


def test_bigram_floor_preserves_ranking_and_natural_scores(spark, tail_dir):
    """Floored (webtail) docs shift by exactly +ln 2 per bigram —
    hapax (1+1)/(c1+V) -> unseen (0+1)/(c1+V) — so ranking is
    order-preserved; natural docs' scores must not move at all (the
    prefix totals stay unfloored)."""
    base = _nll_by_doc(spark, tail_dir, min_count=1)
    floored = _nll_by_doc(spark, tail_dir, min_count=2)
    assert set(base) == set(floored)  # same top-20 membership
    # every webtail doc outranks every natural doc under both models
    tail_ids = {d for d in base if d >= TAIL_BASE}
    assert len(tail_ids) == N_TAIL_DOCS
    for d in base:
        delta = floored[d] - base[d]
        if d >= TAIL_BASE:
            assert abs(delta - math.log(2.0)) < 1e-3, (d, delta)
        else:
            assert delta == 0.0, (d, delta)
    assert min(floored[d] for d in tail_ids) > max(
        floored[d] for d in base if d < TAIL_BASE
    )


def test_bigram_floor_default_is_identity(spark, tail_dir):
    """min_count=1 must be row-identical to the knobless call — the
    registered/oracled face is the unpruned model."""
    assert _nll_by_doc(spark, tail_dir, 1) == {
        r["doc_id"]: r["avg_nll"]
        for r in text_bigram_logprob(spark, tail_dir).collect()
    }


def test_js_floor_localizes_the_flood(spark, tail_dir):
    """At floor=1 the webtail hapax flood owns enough corpus mass that
    every natural source reads drifted; at the default floor the flood
    leaves the shared support, natural sources read ~0, and webtail
    alone stays flagged at the all-absent bound 0.5*ln 2."""
    flooded = {
        r["source"]: r
        for r in drift_vocab_js(spark, tail_dir, support_floor=1).collect()
    }
    floored = {
        r["source"]: r for r in drift_vocab_js(spark, tail_dir).collect()
    }
    for s in ("s0", "s1", "s2"):
        assert flooded[s]["drifted"], s          # polluted verdict
        assert not floored[s]["drifted"], s      # localized verdict
        assert floored[s]["jsd"] < 0.01, s
    assert flooded["webtail"]["drifted"]
    assert floored["webtail"]["drifted"]
    assert floored["webtail"]["jsd"] == round(0.5 * math.log(2.0), 4)
    # the artifact cut: support shrinks from full vocab to the repeated set
    assert flooded["s0"]["n_support_terms"] > floored["s0"]["n_support_terms"]
    assert floored["s0"]["n_support_terms"] == 4  # alpha beta gamma delta


def test_floor_knobs_reject_nonpositive(spark, tail_dir):
    with pytest.raises(ValueError):
        text_bigram_logprob(spark, tail_dir, min_count=0)
    with pytest.raises(ValueError):
        drift_vocab_js(spark, tail_dir, support_floor=0)


def test_hash_grams_face_is_result_identical(spark, tail_dir):
    """hash_grams=True swaps gram-text join/shuffle keys for 8-byte
    xxhash64 longs; on any corpus whose distinct-gram count is far
    below the 64-bit birthday bound the results must be IDENTICAL to
    the string face, floored or not."""
    for kw in ({}, {"min_count": 2}):
        a = [
            tuple(r)
            for r in text_bigram_logprob(spark, tail_dir, **kw).collect()
        ]
        b = [
            tuple(r)
            for r in text_bigram_logprob(
                spark, tail_dir, hash_grams=True, **kw
            ).collect()
        ]
        assert a == b, kw
