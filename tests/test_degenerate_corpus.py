"""Degenerate-corpus lens (round 11): every registered query must
survive a day-one pipeline — an EMPTY corpus (0-row tables, real
schemas) and a TINY one (a single row per table) — by either returning
a well-formed DataFrame or raising the library's documented
``ValueError`` contract.  Undocumented crash classes (opaque JVM
IllegalArgumentException, ANSI ArithmeticException, IndexError off an
empty ``collect()``) are exactly what greets a user who points the
engine at a corpus that hasn't ingested yet.

The round-11 sweep (tools/degenerate_sweep.py, every registered query
x all tiers) found three such crashes, each pinned below after the fix:

- ``a19_approx_distinct``: ANSI DIVIDE_BY_ZERO — rel-err divided by an
  exact distinct count of 0 (olap.py).
- ``sim_ann_ivf``: ``KMeans.fit`` aborted on 0 rows, and on any corpus
  smaller than ``nlist`` (ann.py: validity filter + documented empty
  error + k clamp).
- ``sim_pca_top_component``: MLlib ``RowMatrix.computeCovariance``
  IllegalArgumentException on a 1-vector corpus (embedding.py: n >= 2
  gate in both eigen paths).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E
# ONE tier definition, shared with the sweep tool — two hand-maintained
# copies would let the lens and these pins cover different corpora
from tools.degenerate_sweep import write_tier


@pytest.fixture(scope="session")
def empty_tier(spark, tmp_path_factory):
    return write_tier(spark, str(tmp_path_factory.mktemp("tier_empty")), "empty")


@pytest.fixture(scope="session")
def tiny_tier(spark, tmp_path_factory):
    return write_tier(spark, str(tmp_path_factory.mktemp("tier_tiny")), "tiny")


@pytest.fixture(scope="session")
def nulls_tier(spark, tmp_path_factory):
    """Non-key columns ALL NULL — the 'bad ingest day' shape: NULL
    timestamps under windows, NULL text under tokenizers, NULL
    embeddings under vector math, NULL join keys.  The round-11 sweep
    found this tier already clean (prior NULL lenses); this fixture
    keeps it that way."""
    return write_tier(spark, str(tmp_path_factory.mktemp("tier_nulls")), "nulls")


def test_every_query_survives_an_empty_corpus(spark, empty_tier):
    """Every registered query over 0-row tables: a DataFrame (any
    row count) or a documented ValueError.  One test, failures
    aggregated, so a regression names every affected query at once.
    (The tiny tier is swept by tools/degenerate_sweep.py; its three
    historical crashers are pinned individually below.)"""
    crashes = []
    for name, fn in E.queries().items():
        try:
            fn(spark, empty_tier).collect()
        except ValueError:
            pass  # the documented degenerate-input contract
        except Exception as exc:  # noqa: BLE001
            crashes.append(f"{name}: {type(exc).__name__}: {str(exc)[:120]}")
    assert not crashes, "undocumented empty-corpus crashes:\n" + "\n".join(crashes)


def test_every_query_survives_an_all_null_corpus(spark, nulls_tier):
    """Same contract over rows whose non-key columns are ALL NULL."""
    crashes = []
    for name, fn in E.queries().items():
        try:
            fn(spark, nulls_tier).collect()
        except ValueError:
            pass
        except Exception as exc:  # noqa: BLE001
            crashes.append(f"{name}: {type(exc).__name__}: {str(exc)[:120]}")
    assert not crashes, "undocumented all-NULL crashes:\n" + "\n".join(crashes)


def test_a19_empty_corpus_is_vacuously_within_bound(spark, empty_tier):
    row = E.queries()["a19_approx_distinct"](spark, empty_tier).collect()[0]
    assert row["exact_users"] == 0 and row["approx_users"] == 0
    assert row["rel_err_users"] == 0.0 and row["rel_err_types"] == 0.0
    assert row["within_bound"] is True


def test_ivf_empty_corpus_raises_value_error(spark, empty_tier):
    from acled_spark.ann import build_ivf_index

    emb = spark.read.parquet(f"{empty_tier}/embeddings.parquet")
    with pytest.raises(ValueError, match="no vectors"):
        build_ivf_index(emb, nlist=8)


def test_ivf_single_vector_raises_value_error(spark, tiny_tier):
    from acled_spark.ann import build_ivf_index

    emb = spark.read.parquet(f"{tiny_tier}/embeddings.parquet")
    with pytest.raises(ValueError, match="at least 2"):
        build_ivf_index(emb, nlist=8)


def test_ivf_corpus_smaller_than_nlist_clamps_k(spark):
    """5 vectors, nlist=16: the quantizer fits k=5 instead of aborting,
    and search still returns exact-ish neighbors from the 5 cells."""
    from acled_spark.ann import build_ivf_index, ivf_search

    rows = [(i, [float(i == j) for j in range(8)]) for i in range(5)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    index = build_ivf_index(emb, nlist=16, max_iter=3, persist=False)
    assert index.model.summary.k == 5
    out = ivf_search(index, emb.filter(F.col("vec_id") == 0), top_k=3, nprobe=5)
    got = {r["neighbor_id"] for r in out.collect()}
    # self-matches are excluded by contract; all non-self cosines tie
    # at 0.0, so the deterministic neighbor_id tiebreak picks 1..3
    assert got == {1, 2, 3}


def test_ivf_invalid_vectors_excluded_from_index(spark):
    """NULL / ragged / NULL-element vectors previously crashed
    KMeans.fit; now they fall out at the validity gate and the index
    holds exactly the valid rows."""
    from acled_spark.ann import build_ivf_index

    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.0, 1.0, 0.0]),
        (2, [0.0, 0.0, 1.0]),
        (3, None),
        (4, [1.0, 2.0]),  # ragged
        (5, [1.0, None, 0.0]),  # NULL element
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    index = build_ivf_index(emb, nlist=16, max_iter=2, persist=False)
    assert {r["vec_id"] for r in index.assigned.collect()} == {0, 1, 2}


def test_ivf_upsert_excludes_invalid_vectors(spark):
    """The upsert/assign path shares the build's validity contract but
    anchored to the INDEX width: a maintainer batch carrying NULL /
    ragged / NULL-element vectors folds in only the assignable ones
    instead of crashing model.transform mid-stream."""
    from acled_spark.ann import build_ivf_index, ivf_upsert

    base = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    emb = spark.createDataFrame(base, "vec_id long, embedding array<double>")
    index = build_ivf_index(emb, nlist=2, max_iter=2, persist=False)
    batch = spark.createDataFrame(
        [
            (10, [0.5, 0.5, 0.0, 0.0]),
            (11, None),
            (12, [1.0, 2.0]),  # wrong width for this index
            (13, [1.0, None, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    folded = ivf_upsert(index, batch, persist=False)
    assert {r["vec_id"] for r in folded.assigned.collect()} == {0, 1, 2, 3, 10}
    # an ALL-invalid batch is a no-op: same index back, no
    # rematerialization / no durable epoch advance (round-11 review —
    # the validity filter would otherwise bypass the maintainer's
    # empty-batch guard)
    junk = spark.createDataFrame(
        [(20, None), (21, [1.0])], "vec_id long, embedding array<double>"
    )
    assert ivf_upsert(index, junk, persist=False) is index


def test_pca_single_vector_raises_value_error(spark):
    from acled_spark.embedding import (
        power_iteration_top_component,
        top_component,
    )

    one = spark.createDataFrame(
        [(0, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="at least 2"):
        top_component(one)
    with pytest.raises(ValueError, match="at least 2"):
        power_iteration_top_component(one)
