"""The approximation ladder's error bounds, measured against exact
baselines (SCALE.md 'approximation ladders') — the scale paths must be
not just present but quantifiably close."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from acled_spark.tables import load

SF_DIR = "/root/testdata/sf0.01"  # larger corpus -> meaningful estimates


def test_approx_count_distinct_within_rsd(spark):
    ev = load(spark, SF_DIR, "events")
    row = ev.agg(
        F.countDistinct("user_id").alias("exact"),
        F.approx_count_distinct("user_id", 0.01).alias("approx"),
    ).collect()[0]
    rel_err = abs(row["approx"] - row["exact"]) / row["exact"]
    assert rel_err <= 0.03, (row["exact"], row["approx"])


def test_percentile_approx_close_to_exact(spark):
    li = load(spark, SF_DIR, "lineitem")
    row = li.agg(
        F.percentile("l_extendedprice", 0.5).alias("exact_med"),
        F.percentile_approx("l_extendedprice", 0.5, 10_000).alias("approx_med"),
        F.percentile("l_extendedprice", 0.99).alias("exact_p99"),
        F.percentile_approx("l_extendedprice", 0.99, 10_000).alias("approx_p99"),
    ).collect()[0]
    assert row["approx_med"] == pytest.approx(row["exact_med"], rel=0.01)
    assert row["approx_p99"] == pytest.approx(row["exact_p99"], rel=0.01)


def test_lsh_buckets_concentrate_similarity_above_random(spark):
    """Random-hyperplane buckets must concentrate cosine similarity well
    above the random-pair baseline.

    NB: with 6 hyperplanes and true-neighbor cosines of only ~0.3-0.4
    (angles near 70°), bucket recall of the exact top-10 is legitimately
    modest — the statistically honest claim is lift over random, not
    top-k recall.  The high-recall ANN path for such corpora is IVF
    (tests/test_ann.py: 0.84-0.92 recall).
    """
    from acled_spark.queries.similarity import sim_ann_lsh
    from acled_spark.tables import load

    ann = sim_ann_lsh(spark, SF_DIR).collect()
    assert ann, "LSH returned no in-bucket candidates"
    ann_mean = sum(r["cosine"] for r in ann) / len(ann)

    # random-pair baseline: queries x a hash-sampled slice of the corpus
    emb = load(spark, SF_DIR, "embeddings")
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qe")
    )
    sample = emb.filter(F.pmod(F.col("vec_id"), 37) == 3)
    dot = lambda a, b: F.aggregate(  # noqa: E731
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    nrm = lambda c: F.sqrt(dot(c, c))  # noqa: E731
    rand_mean = (
        sample.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("qid"))
        .select(
            (dot(F.col("embedding"), F.col("qe"))
             / (nrm(F.col("embedding")) * nrm(F.col("qe")))).alias("cos")
        )
        .agg(F.avg("cos"))
        .collect()[0][0]
    )
    assert ann_mean > rand_mean + 0.05, (ann_mean, rand_mean)


def test_weighted_sample_biases_toward_heavy_weights(spark):
    """Weight-proportional sampling must overselect high-price orders:
    the sampled mean o_totalprice should exceed the population mean, and
    every order must be selectable (keys defined for all rows)."""
    from acled_spark.queries.filters_q import P9_SAMPLE_K, p9_weighted_sample
    from acled_spark.tables import load
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.01"
    sample = p9_weighted_sample(spark, sf)
    rows = sample.collect()
    assert len(rows) == P9_SAMPLE_K
    pop_mean = (
        load(spark, sf, "orders").agg(F.avg("o_totalprice")).collect()[0][0]
    )
    samp_mean = sum(r["o_totalprice"] for r in rows) / len(rows)
    # With weights spanning ~3 orders of magnitude the bias is large;
    # 1.15x is far below its expectation but way above noise.
    assert samp_mean > 1.15 * pop_mean
    # determinism: the sample is a pure function of the data
    again = {r["o_orderkey"] for r in p9_weighted_sample(spark, sf).collect()}
    assert again == {r["o_orderkey"] for r in rows}


def test_approx_quantiles_close_to_exact(spark):
    """a26 sketch quantiles within 1% relative error of the exact
    percentile at every probed rank (its correctness bound, same
    pattern as the a19 HLL accuracy pin)."""
    from pyspark.sql import functions as F

    from acled_spark.queries.olap import a26_approx_quantiles
    from acled_spark.tables import load

    sf = "/root/testdata/sf0.01"
    approx = {
        r["event_type"]: r for r in a26_approx_quantiles(spark, sf).collect()
    }
    exact = {
        r["event_type"]: r
        for r in load(spark, sf, "events")
        .groupBy("event_type")
        .agg(
            F.percentile("value", F.lit(0.5)).alias("p50"),
            F.percentile("value", F.lit(0.9)).alias("p90"),
            F.percentile("value", F.lit(0.99)).alias("p99"),
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for et, ex in exact.items():
        for q in ("p50", "p90", "p99"):
            assert abs(approx[et][q] - ex[q]) <= 0.01 * max(abs(ex[q]), 1e-9), (
                et, q, approx[et][q], ex[q],
            )


def test_a19_self_certifies_within_bound(spark):
    """The registry query's own output carries rel-err vs exact and a
    within_bound flag — the invariant the driver's rows-only check pins.

    The rel-err columns are RECOMPUTED here from the approx/exact
    columns in the same row, not just read back: the r12 mutation lens
    planted a wrong-base rel_err (approx vs approx == 0, within_bound
    vacuously true) and the read-back-only assertions passed — a
    self-certifying column must be certified by something that does
    not trust it."""
    from acled_spark.registry import all_specs

    # sf0.01, NOT sf0.001: at 15 distinct users the HLL estimate is
    # exact and a wrong-base rel_err of 0 equals the true 0 — the
    # recompute only discriminates where the sketch actually errs
    # (151 vs 150 here, rel_err 0.0067)
    row = all_specs()["a19_approx_distinct"].builder(spark, SF_DIR).collect()[0]
    assert row["within_bound"] is True
    assert row["rel_err_users"] <= 0.05
    assert row["rel_err_types"] <= 0.05
    assert row["exact_users"] > 0
    nonzero = 0
    for kind in ("users", "types"):
        ext = abs(row[f"approx_{kind}"] - row[f"exact_{kind}"]) / row[
            f"exact_{kind}"
        ]
        nonzero += ext > 0
        assert row[f"rel_err_{kind}"] == pytest.approx(ext, abs=1e-4), kind
    # the corpus must keep exercising a REAL sketch error, or the
    # recompute above degenerates back into 0 == 0
    assert nonzero >= 1


def test_a26_self_certifies_rank_error(spark):
    """max_rank_err is RECOMPUTED externally from the query's own
    sketch quantiles against the raw events — the r12 mutation lens
    planted max->least in the error rollup and the read-back-only
    assertions passed (a smaller wrong error still clears the bound)."""
    from acled_spark.registry import all_specs

    sf = "/root/testdata/sf0.001"
    rows = all_specs()["a26_approx_quantiles"].builder(spark, sf).collect()
    assert rows
    vals = {}  # event_type -> sorted non-null values
    for v in load(spark, sf, "events").select("event_type", "value").collect():
        if v["value"] is not None:
            vals.setdefault(v["event_type"], []).append(v["value"])
    for r in rows:
        assert r["within_bound"] is True, (r["event_type"], r["max_rank_err"])
        assert r["max_rank_err"] <= 1 / 10000 + 1 / r["n"]
        xs = sorted(vals[r["event_type"]])
        errs = []
        for col, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
            lo = sum(1 for x in xs if x < r[col]) / len(xs)
            hi = sum(1 for x in xs if x <= r[col]) / len(xs)
            errs.append(max(0.0, lo - q, q - hi))
        assert r["max_rank_err"] == pytest.approx(max(errs), abs=1e-6), (
            r["event_type"], errs,
        )


def test_max_rank_err_rollup_is_the_maximum(spark):
    """Planted asymmetric interval errors: (p50, p90, p99) realized
    errors (0.3, 0.05, 0.009) must roll up to 0.3.  On any corpus
    small enough for an end-to-end test the GK sketch is exact and all
    three errors are 0.0 — max, min, and first coincide, so only a
    planted-literal pin can catch a wrong rollup (r12 mutation lens:
    greatest->least slipped every value-level gate)."""
    from acled_spark.queries.olap import max_rank_err_expr

    df = spark.createDataFrame(
        [(0.8, 0.9, 0.95, 0.95, 0.999, 1.0)],
        "lo_p50 double, hi_p50 double, lo_p90 double, hi_p90 double,"
        " lo_p99 double, hi_p99 double",
    )
    got = df.select(max_rank_err_expr().alias("e")).collect()[0]["e"]
    assert got == pytest.approx(0.3, abs=1e-12)
