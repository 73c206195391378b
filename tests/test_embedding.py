"""Distributed PCA power iteration vs numpy's exact eigendecomposition."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from acled_spark.embedding import (
    eigen_residual,
    mean_vector,
    power_iteration_top_component,
    remove_top_component,
    top_component,
)
from acled_spark.tables import load

SF_DIR = "/root/testdata/sf0.001"


def _np_embeddings(spark):
    rows = (
        load(spark, SF_DIR, "embeddings")
        .select("embedding")
        .collect()
    )
    return np.array([r["embedding"] for r in rows], dtype=np.float64)


def test_top_component_matches_numpy(spark):
    emb = load(spark, SF_DIR, "embeddings")
    res = top_component(emb)
    X = _np_embeddings(spark)
    C = np.cov(X, rowvar=False, bias=True)
    w, V = np.linalg.eigh(C)
    top_val, top_vec = w[-1], V[:, -1]

    assert res["residual"] < 1e-9  # certified eigenpair of THIS corpus
    assert res["eigenvalue"] == pytest.approx(top_val, rel=1e-6)
    cos = abs(float(np.dot(res["component"], top_vec)))
    assert cos > 1 - 1e-9  # same direction up to sign
    assert res["explained_ratio"] == pytest.approx(
        top_val / np.trace(C), rel=1e-6
    )
    # unit norm, deterministic sign (largest-|loading| entry positive)
    assert math.isclose(sum(x * x for x in res["component"]), 1.0, rel_tol=1e-6)
    k = max(range(len(res["component"])), key=lambda i: abs(res["component"][i]))
    assert res["component"][k] > 0


@pytest.mark.slow  # ~17 s iteration loop (VERDICT r14 #1)
def test_power_iteration_on_gapped_spectrum(spark):
    """The matrix-free variant converges fast when the spectrum has a
    real gap (rate (λ2/λ1)^t) and certifies itself with the same
    distributed eigen_residual; on the near-flat random test embeddings
    the exact Gramian path exists precisely because this one wouldn't."""
    import random

    rng = random.Random(3)
    d = 16
    # dominant direction e0 with big variance, small isotropic noise
    rows = [
        (
            i,
            [rng.gauss(0, 5.0) if j == 0 else rng.gauss(0, 0.3) for j in range(d)],
        )
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    res = power_iteration_top_component(df, iters=15)
    assert res["converged"], res["delta"]
    assert res["residual"] < 1e-4
    assert abs(res["component"][0]) > 0.99  # found the planted direction
    # the distributed residual check agrees with the locally computed one
    ext = eigen_residual(df, "embedding", res["component"], res["eigenvalue"])
    assert ext == pytest.approx(res["residual"], abs=1e-9)


def test_mean_vector_matches_numpy(spark):
    emb = load(spark, SF_DIR, "embeddings")
    mu = mean_vector(emb)
    X = _np_embeddings(spark)
    assert np.allclose(mu, X.mean(axis=0), atol=1e-9)


def test_remove_top_component_kills_its_variance(spark):
    """After ABTT projection the removed direction carries ~zero
    variance and every vector is orthogonal to the component."""
    emb = load(spark, SF_DIR, "embeddings")
    res = top_component(emb)
    v = res["component"]
    out = remove_top_component(emb, v)

    arr = F.array(*[F.lit(float(x)) for x in v])
    dot_v = F.aggregate(
        F.zip_with(F.col("embedding_abtt"), arr, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    row = out.agg(F.max(F.abs(dot_v)).alias("max_proj")).collect()[0]
    # x' = x - (x·v)v with unit v gives x'·v = 0 exactly, every row
    assert row["max_proj"] == pytest.approx(0.0, abs=1e-9)


def test_registered_query_emits_certified_rows(spark):
    from acled_spark.registry import all_specs

    df = all_specs()["sim_pca_top_component"].builder(spark, SF_DIR)
    rows = df.collect()
    assert len(rows) == 64  # one per dimension
    assert all(r["residual_ok"] for r in rows)
    assert 0 < rows[0]["explained_ratio"] < 1


def test_null_embeddings_excluded_consistently(spark):
    """Round-7 review: rows with NULL embeddings must drop out of the
    WHOLE decomposition (they contribute to no aggregate), not just the
    sums — the old df.count() denominator biased λ and explained_ratio
    low by the NULL fraction, and PCA.fit crashed on the null vector."""
    from acled_spark.embedding import top_component
    from acled_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings").limit(50)
    with_nulls = emb.unionByName(
        emb.limit(5).withColumn(
            "embedding", F.lit(None).cast("array<float>")
        )
    )
    clean = top_component(emb)
    dirty = top_component(with_nulls)
    assert dirty["n"] == clean["n"] == 50
    assert dirty["eigenvalue"] == pytest.approx(clean["eigenvalue"], rel=1e-9)
    assert dirty["explained_ratio"] == pytest.approx(
        clean["explained_ratio"], rel=1e-9
    )


def test_empty_corpus_raises_value_error(spark):
    """Round-7 review: an empty frame must fail with a clear message,
    not a ZeroDivisionError from 1/sqrt(0) deep in the iteration."""
    import pytest

    from acled_spark.embedding import mean_vector, power_iteration_top_component
    from acled_spark.tables import load

    empty = load(spark, SF_DIR, "embeddings").filter(F.lit(False))
    with pytest.raises(ValueError, match="no vectors"):
        mean_vector(empty)
    with pytest.raises(ValueError, match="no vectors"):
        power_iteration_top_component(empty)


def test_empty_array_embeddings_excluded_like_nulls(spark):
    """r7 follow-up: a zero-length embedding (failed encoder output)
    contributes to NO aggregate, so n/eigenvalue/residual must exclude
    it exactly like a NULL — and PCA.fit must not see a 0-dim vector."""
    from acled_spark.embedding import eigen_residual, top_component
    from acled_spark.tables import load

    emb = load(spark, SF_DIR, "embeddings").limit(40)
    dirty = emb.unionByName(
        emb.limit(3).withColumn(
            "embedding", F.array().cast("array<float>")
        )
    )
    clean = top_component(emb)
    res = top_component(dirty)
    assert res["n"] == clean["n"] == 40
    assert res["eigenvalue"] == pytest.approx(clean["eigenvalue"], rel=1e-9)
    assert res["residual"] < 1e-6
    # the standalone certifier sees the same n
    r = eigen_residual(dirty, "embedding", res["component"], res["eigenvalue"])
    assert r < 1e-6


def test_null_element_and_ragged_vectors_excluded_consistently(spark):
    """r8 lens: a vector with one NULL element poisoned its C·v
    contribution to NULL while n still counted it — eigenvalue,
    explained_ratio, and the residual certification deflated silently.
    _valid_vectors excludes NULL-element/ragged/empty vectors from the
    sums AND the count, so the certified numbers match the clean
    corpus exactly."""
    import random

    from acled_spark.embedding import top_component

    rng = random.Random(3)
    clean = [(i, [rng.gauss(0, 1) + (0.5 * (j == 0)) for j in range(8)])
             for i in range(60)]
    dirty = clean + [
        (100, [1.0, None, 1.0, 1.0, 1.0, 1.0, 1.0, 1.0]),  # NULL element
        (101, [2.0, 2.0]),                                  # ragged
        (102, []),                                          # empty
        (103, None),                                        # NULL vector
    ]
    schema = "vec_id long, embedding array<double>"
    ref = top_component(spark.createDataFrame(clean, schema))
    got = top_component(spark.createDataFrame(dirty, schema))
    assert got["n"] == ref["n"] == 60
    # last-ulp wiggle only: the filtered frame's partitioning changes
    # the JVM-side sum order, so values agree to ~1e-12, not ==
    assert got["eigenvalue"] == pytest.approx(ref["eigenvalue"], rel=1e-9)
    assert got["residual"] < 1e-12 and ref["residual"] < 1e-12
    assert got["component"] == pytest.approx(ref["component"], abs=1e-9)
    assert got["explained_ratio"] == pytest.approx(
        ref["explained_ratio"], rel=1e-9
    )


def test_eigen_residual_known_answer(spark):
    """Hand-computed pin of the residual DEFINITION ‖C·v − λv‖ / λ —
    the r12 mutation lens dropped the /λ normalization and every
    existing assertion passed: true-eigenpair residuals are ~0 under
    either normalization, and the self-comparison at line ~76 computes
    ext with the SAME function.  A known-answer on a deliberately
    WRONG λ pins the base: C = diag(0.5, 2.0) for these four vectors,
    so (v=[1,0], λ=0.25) has ‖Cv−λv‖ = 0.25 and residual 0.25/0.25=1."""
    from acled_spark.embedding import eigen_residual

    df = spark.createDataFrame(
        [([1.0, 0.0],), ([-1.0, 0.0],), ([0.0, 2.0],), ([0.0, -2.0],)],
        "embedding array<double>",
    )
    assert eigen_residual(df, "embedding", [1.0, 0.0], 0.5) == pytest.approx(
        0.0, abs=1e-12
    )
    assert eigen_residual(df, "embedding", [1.0, 0.0], 0.25) == pytest.approx(
        1.0, abs=1e-9
    )
