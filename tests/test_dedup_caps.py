"""Hot-shingle / hot-bucket frequency caps (VERDICT r3 #2).

LSH candidate generation is bounded only probabilistically; on skewed
real corpora one boilerplate gram or one near-constant-document bucket
goes quadratic.  These tests plant exactly that skew and pin that the
``max_doc_freq`` / ``max_bucket`` knobs bound the pair fan-out while
true near-dup evidence survives — and that the default (cap off) is
byte-identical to the exact semantics the oracles check.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

# slow tier (VERDICT r14 #1): mutation-lens / convergence sweeps (~40 s); run with `-m ""`.
pytestmark = pytest.mark.slow


N_HOT = 60  # docs sharing the planted boilerplate gram / hot bucket


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, "en", "test", len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )


@pytest.fixture(scope="module")
def boilerplate_corpus(spark):
    """N_HOT docs with unique bodies + one shared boilerplate 3-gram;
    two docs (9001, 9002) that genuinely near-duplicate each other."""
    boiler = "all rights reserved"
    rows = [f"unique body {i} alpha beta{i} gamma{i} {boiler}" for i in range(N_HOT)]
    df = _docs(spark, rows)
    near = spark.createDataFrame(
        [
            (9001, "the quick brown fox jumps over the lazy dog today", "en", "t", 50),
            (9002, "the quick brown fox jumps over the lazy dog tonight", "en", "t", 51),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return df.unionByName(near)


def test_ngram_max_doc_freq_bounds_pair_fanout(boilerplate_corpus):
    from acled_spark.queries.dedup import ngram_jaccard_pairs

    uncapped = ngram_jaccard_pairs(boilerplate_corpus).count()
    # the planted gram alone contributes C(N_HOT, 2) candidate pairs
    assert uncapped >= N_HOT * (N_HOT - 1) // 2

    capped = ngram_jaccard_pairs(boilerplate_corpus, max_doc_freq=10)
    rows = capped.collect()
    # boilerplate-only pairs are gone: fan-out is bounded, not quadratic
    assert len(rows) < N_HOT
    # the genuine near-dup pair survives (its shingles are low-frequency)
    match = [r for r in rows if (r["doc1"], r["doc2"]) == (9001, 9002)]
    assert match and match[0]["jaccard"] > 0.7


def test_ngram_cap_at_or_above_df_is_exact(boilerplate_corpus):
    """A cap no shingle exceeds must be a no-op (oracle-exactness)."""
    from acled_spark.queries.dedup import ngram_jaccard_pairs

    exact = sorted(
        map(tuple, ngram_jaccard_pairs(boilerplate_corpus).collect())
    )
    lax = sorted(
        map(
            tuple,
            ngram_jaccard_pairs(
                boilerplate_corpus, max_doc_freq=N_HOT + 10
            ).collect(),
        )
    )
    assert exact == lax


def test_ngram_capped_jaccard_never_overestimates(boilerplate_corpus):
    """Capping drops intersection evidence only — every surviving pair's
    jaccard is <= its exact value (a capped run can miss near-dups,
    never invent them)."""
    from acled_spark.queries.dedup import ngram_jaccard_pairs

    exact = {
        (r["doc1"], r["doc2"]): r["jaccard"]
        for r in ngram_jaccard_pairs(boilerplate_corpus).collect()
    }
    for r in ngram_jaccard_pairs(boilerplate_corpus, max_doc_freq=10).collect():
        assert r["jaccard"] <= exact[(r["doc1"], r["doc2"])] + 1e-9


@pytest.fixture(scope="module")
def hot_bucket_corpus(spark):
    """N_HOT identical template docs (one giant LSH bucket in EVERY
    band) + one genuine near-dup pair in small buckets."""
    rows = ["fixed template body repeated verbatim in every document"] * N_HOT
    df = _docs(spark, rows)
    near = spark.createDataFrame(
        [
            (9001, "the quick brown fox jumps over the lazy dog today", "en", "t", 50),
            (9002, "the quick brown fox jumps over the lazy dog tonight", "en", "t", 51),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    return df.unionByName(near)


def test_lsh_max_bucket_bounds_pair_expansion(hot_bucket_corpus):
    from acled_spark.queries.dedup import lsh_candidate_edges, minhash_bands_spark

    bands = minhash_bands_spark(hot_bucket_corpus)
    uncapped = lsh_candidate_edges(bands).count()
    assert uncapped >= N_HOT * (N_HOT - 1) // 2

    capped = lsh_candidate_edges(bands, max_bucket=5).collect()
    # the quadratic bucket is dropped wholesale
    assert len(capped) < N_HOT
    # the true near-dup pair still collides in its (small) buckets
    assert (9001, 9002) in {(r["u"], r["v"]) for r in capped}


def test_lsh_cap_at_or_above_bucket_size_is_exact(hot_bucket_corpus):
    from acled_spark.queries.dedup import lsh_candidate_edges, minhash_bands_spark

    bands = minhash_bands_spark(hot_bucket_corpus)
    exact = sorted(map(tuple, lsh_candidate_edges(bands).collect()))
    lax = sorted(
        map(tuple, lsh_candidate_edges(bands, max_bucket=N_HOT + 10).collect())
    )
    assert exact == lax


def test_min_label_propagation_convergence_flag(spark):
    """The census's ``converged`` certificate (VERDICT r5 #4): bounded-k
    min-label propagation under-merges a path graph of diameter > k, and
    the one-extra-round certificate must say so; with k >= diameter the
    labels are the true components and the flag flips true."""
    from acled_spark.queries.dedup import min_label_components

    # path 0-1-2-...-7 (diameter 7) plus an isolated 2-clique 100-101
    edges = [(i, i + 1) for i in range(7)] + [(100, 101)]
    ed = spark.createDataFrame(edges, "u long, v long")

    labels, chg = min_label_components(ed, rounds=3)
    assert chg.collect()[0]["chg"] == 1  # NOT converged at k=3
    got = {r["v"]: r["lbl"] for r in labels.collect()}
    assert got[7] != 0  # far end of the path has not seen label 0 yet

    labels, chg = min_label_components(ed, rounds=8)
    assert chg.collect()[0]["chg"] == 0  # converged
    got = {r["v"]: r["lbl"] for r in labels.collect()}
    assert all(got[i] == 0 for i in range(8))
    assert got[100] == got[101] == 100

    # empty edge set: no vertices, trivially converged (the crossJoin
    # in the census then broadcasts converged=true onto zero rows)
    _, chg = min_label_components(ed.limit(0), rounds=3)
    assert chg.collect()[0]["chg"] == 0


def test_registry_queries_unchanged_by_refactor(spark):
    """dedup_ngram_jaccard / dedup_cluster_census still match their
    oracles after extracting the capped builders (default = exact)."""
    import duckdb

    from acled_spark.registry import all_specs

    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in ("documents",):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    for name in ("dedup_ngram_jaccard", "dedup_cluster_census"):
        spec = all_specs()[name]
        sdf = spec.builder(spark, sf)
        cols = sorted(sdf.columns)
        srows = sorted(
            tuple(float(r[c]) for c in cols) for r in sdf.collect()
        )
        odf = con.execute(spec.oracle).fetchdf()
        orows = sorted(
            tuple(float(row[c]) for c in cols) for _, row in odf.iterrows()
        )
        assert srows == orows, name


def test_star_contraction_exact_on_deep_chain(spark):
    """The operator the census docstring defers to: a diameter-10 chain
    under-merges at k=3 min-label propagation but star contraction
    reaches the exact fixpoint in O(log^2 n) rounds with a certificate."""
    from acled_spark.queries.dedup import (
        min_label_components,
        star_contraction_components,
    )

    edges = [(i, i + 1) for i in range(100, 110)] + [(1, 2), (2, 3), (1, 3)]
    ed = spark.createDataFrame(edges, "u long, v long")

    labels, rounds, converged = star_contraction_components(ed)
    got = {r["v"]: r["lbl"] for r in labels.collect()}
    expected = {i: 100 for i in range(100, 111)} | {1: 1, 2: 1, 3: 1}
    assert got == expected
    assert converged and rounds <= 10

    # the bounded-k census on the same graph honestly reports non-convergence
    _, chg = min_label_components(ed, 3)
    assert chg.collect()[0]["chg"] == 1


def test_star_contraction_exact_under_duplicate_orientations(spark):
    """r14 pin for the large_star .distinct() removal: on a triangle,
    large_star emits the SAME (u, v) attachment under two different
    centers ((3, 1) via center 1 and via center 2), so without the old
    per-round dedup the inter-round edge frame genuinely carries
    duplicate rows.  The removal is sound because the only consumer —
    small_star's window-min — is multiplicity-blind and small_star's
    own output IS distinct'd; this test plants exactly that shape (a
    triangle fused to a chain) and pins the exact fixpoint labels plus
    the convergence certificate, which depends on the per-round
    signature (count + xor) that duplicate rows would corrupt if they
    survived a round boundary."""
    from pyspark.sql import functions as F

    from acled_spark.queries.dedup import star_contraction_components

    # triangle {1,2,3} + tail 3-4-5; plus an isolated pair {9, 10}
    edges = [(1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (9, 10)]
    ed = spark.createDataFrame(edges, "u long, v long")
    labels, rounds, converged = star_contraction_components(ed)
    got = {r["v"]: r["lbl"] for r in labels.collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 9: 9, 10: 9}
    assert converged

    # prove the planted shape really exercises duplicate orientations:
    # re-run round 1's large_star by hand and count (3, 1) rows
    sym = ed.select(F.col("u").alias("a"), F.col("v").alias("b")).unionByName(
        ed.select(F.col("v").alias("a"), F.col("u").alias("b"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("a")
    ls = (
        sym.withColumn("m", F.least(F.min("b").over(w), F.col("a")))
        .filter(F.col("b") > F.col("a"))
        .select(F.col("b").alias("u"), F.col("m").alias("v"))
        .filter(F.col("u") != F.col("v"))
    )
    dup_rows = (
        ls.groupBy("u", "v").count().filter(F.col("count") > 1).count()
    )
    assert dup_rows >= 1  # the dedup the removal skipped was real


def test_star_contraction_empty_and_max_rounds(spark):
    from acled_spark.queries.dedup import star_contraction_components

    empty = spark.createDataFrame([], "u long, v long")
    labels, rounds, converged = star_contraction_components(empty)
    assert labels.count() == 0 and converged

    # max_rounds hit -> converged=False, labels still returned
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "u long, v long"
    )
    _, _, conv = star_contraction_components(chain, max_rounds=1)
    assert not conv


def test_containment_finds_doc_inside_doc_jaccard_misses(spark):
    """The metric's reason to exist: a short doc quoted whole inside a
    long host has containment 1.0 while Jaccard collapses toward 0 with
    host length — below any sane near-dup threshold."""
    from acled_spark.queries.dedup import containment_pairs

    rows = [
        (1, "alpha beta gamma delta epsilon", "en", "s", 30),
        (2, "intro words here alpha beta gamma delta epsilon plus a very "
            "long tail of extra unrelated content going on and on",
         "en", "s", 100),
        (3, "totally different text about other things entirely", "en", "s", 50),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {
        (r["doc1"], r["doc2"]): (r["containment"], r["jaccard"])
        for r in containment_pairs(docs).collect()
    }
    assert out[(1, 2)][0] == 1.0       # fully contained
    assert out[(1, 2)][1] < 0.2        # jaccard would never flag it
    assert (1, 3) not in out and (2, 3) not in out  # no shared shingles


def test_containment_cap_shares_jaccard_cap_semantics(spark):
    """One candidate-generation core: capping max_doc_freq drops the
    same hot shingles from BOTH metrics and can only lower them."""
    from acled_spark.queries.dedup import containment_pairs

    boiler = "all rights reserved by the site owner today"
    rows = [(i, f"{boiler} unique token{i} tail{i} words{i}", "en", "s", 60)
            for i in range(10)]
    # a TRUE near-dup pair sharing rare (df=2 <= cap) shingles, so the
    # capped run keeps evidence and the monotonicity claim is exercised
    # non-vacuously (r7 test review: with only boilerplate pairs the
    # cap dropped everything and `not capped or ...` passed vacuously)
    rows += [
        (100, f"{boiler} genuine shared alpha beta gamma tail100", "en", "s", 70),
        (101, f"{boiler} genuine shared alpha beta gamma tail101", "en", "s", 70),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    exact = {(r["doc1"], r["doc2"]): r["containment"]
             for r in containment_pairs(docs).collect()}
    capped = {(r["doc1"], r["doc2"]): r["containment"]
              for r in containment_pairs(docs, max_doc_freq=5).collect()}
    assert exact  # boilerplate shingles create pairs
    assert (100, 101) in capped  # rare-shingle evidence SURVIVES the cap
    assert capped  # the monotonicity loop below is non-vacuous
    assert all(capped[k] <= exact[k] for k in capped)  # never adds evidence
    # boilerplate-only pairs are exactly what the cap exists to drop
    assert (0, 1) in exact and (0, 1) not in capped


@pytest.fixture(scope="module")
def hot_block_embeddings(spark):
    """Five small label blocks (one holding a genuine near-dup vector
    pair) + one planted 200-vector near-constant block under label 99
    — the runaway quantizer cell max_block exists to bound."""
    from acled_spark.queries.similarity import DIM

    def vec(seed, jitter=0.0):
        return [((seed * 31 + j * 7) % 13) / 13.0 + (jitter if j == 0 else 0.0)
                for j in range(DIM)]

    rows = []
    vid = 0
    for lab in range(5):
        for k in range(6):
            rows.append((vid, lab, vec(lab * 100 + k))); vid += 1
    # near-dup pair inside label 0: same direction, tiny perturbation
    rows.append((9001, 0, vec(7)))
    rows.append((9002, 0, vec(7, jitter=0.001)))
    rows += [(10_000 + k, 99, vec(42)) for k in range(200)]
    return spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<float>"
    )


def test_embedding_max_block_bounds_pair_fanout(hot_block_embeddings):
    from acled_spark.queries.dedup import embedding_cosine_pairs

    uncapped = embedding_cosine_pairs(hot_block_embeddings).count()
    assert uncapped >= 200 * 199 // 2  # the planted block alone

    capped = embedding_cosine_pairs(hot_block_embeddings, max_block=50).collect()
    # the quadratic block is dropped wholesale (explicit exclusion)
    assert len(capped) < 200
    assert all(r["label"] != 99 for r in capped)
    # the genuine near-dup pair in a natural-sized block survives
    match = [r for r in capped if (r["vec1"], r["vec2"]) == (9001, 9002)]
    assert match and match[0]["cosine"] > 0.999


def test_embedding_cap_at_or_above_block_size_is_exact(hot_block_embeddings):
    """A cap no block exceeds must be a no-op (oracle-exactness)."""
    from acled_spark.queries.dedup import embedding_cosine_pairs

    exact = sorted(map(tuple, embedding_cosine_pairs(hot_block_embeddings).collect()))
    lax = sorted(
        map(
            tuple,
            embedding_cosine_pairs(hot_block_embeddings, max_block=500).collect(),
        )
    )
    assert exact == lax
