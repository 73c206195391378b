"""Cap-profile advisor: turn SCALE.md's "run one cheap profile first,
set the cap above the tail" prose into an API (VERDICT r7 #3).

All three quadratic-term caps in the dedup family are sized the same
way:

- ``max_doc_freq`` (:func:`acled_spark.queries.dedup.ngram_jaccard_pairs`
  / ``containment_pairs``) bounds the shingle-index self-join fan-out;
- ``max_bucket`` (:func:`acled_spark.queries.dedup.lsh_candidate_edges`)
  bounds the per-bucket pair expansion;
- ``max_block`` (:func:`acled_spark.queries.dedup.embedding_cosine_pairs`,
  r9) bounds the per-label cosine pair join.

The measured tables (SCALE.md §max_doc_freq, §max_bucket) force two
rules: a cap BELOW the natural key-size tail deletes true near-dup
signal (sf1.0: ``max_doc_freq=50`` → 0/20 top-pair overlap), while on
a bounded tail the cap is a no-op that still pays its shuffle
(``max_doc_freq=200`` → +25 %).  So the advisor recommends a cap ONLY
when the profile shows a genuine tail (max ≫ p99.9), and places it a
decade above the bulk (``headroom × p99.9``) — above every natural
key, below the boilerplate mass.  On the measured corpora this
reproduces the tables: natural sf1.0 buckets (max 79, p99.9 = 30) →
no cap; the planted 5000-doc skew tier → a cap inside the measured
[100, 1000] band where wall-clock drops 34.2 s → 2.3 s with 702/702
natural edges kept.

Scale shape: ONE corpus scan into per-key counts, then a
(size → n_keys) histogram — cardinality ≤ distinct size values, so
the collect is measured in kilobytes even at 100 TB — from which the
percentiles are EXACT (no sampled sketch to mis-rank a spike).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: max/bulk above this reads as a skew tail worth capping.
TAIL_RATIO = 10.0
#: recommended cap = headroom × bulk — "a decade above the bulk",
#: the documented "cap ≳ 10× expected true group size" rule with the
#: profile's own bulk statistic standing in for the group size.
HEADROOM = 10.0
#: below this many keys, p99.9 degenerates to the max by construction
#: (the top 0.1% IS the single largest key), so the tail test
#: max ≫ p99.9 can never fire.  Only :func:`profile_blocks` opts into
#: a MEDIAN-bulk fallback under this threshold (label blocks from a
#: coarse quantizer have tens-to-hundreds of cells, not the shingle
#: index's millions); profile_caps/profile_buckets keep the p99.9 bulk
#: unconditionally, so a naturally spread small shingle/bucket
#: population can never trip a median-based cap that would wholesale-
#: drop legitimate large keys (ADVICE r9).
SMALL_PROFILE_KEYS = 1000


@dataclass
class CapProfile:
    """Distribution of per-key sizes + the cap recommendation."""

    n_keys: int
    total: int              # sum of sizes (rows profiled)
    max_size: int
    p50: int
    p99: int
    p999: int
    #: (decade, n_keys): decade d holds sizes in [10^d, 10^(d+1))
    decades: list[tuple[int, int]] = field(default_factory=list)
    recommended_cap: int | None = None

    @property
    def tail_detected(self) -> bool:
        return self.recommended_cap is not None


def _profile_sizes(
    sizes: DataFrame,
    size_col: str,
    tail_ratio: float,
    headroom: float,
    median_fallback: bool = False,
) -> CapProfile:
    """Per-key sizes -> CapProfile.  Exact percentiles from the
    (size, n_keys) histogram (one small collect), never a sketch — a
    sampled p99.9 under-counting a single hot key is exactly the
    failure this advisor exists to catch."""
    hist = sorted(
        (int(r["s"]), int(r["n"]))
        for r in sizes.groupBy(F.col(size_col).alias("s"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    if not hist:
        return CapProfile(
            n_keys=0, total=0, max_size=0, p50=0, p99=0, p999=0
        )
    n_keys = sum(n for _, n in hist)
    total = sum(s * n for s, n in hist)

    def pct(q: float) -> int:
        # smallest size with cumulative key count >= q * n_keys
        need, cum = q * n_keys, 0
        for s, n in hist:
            cum += n
            if cum >= need:
                return s
        return hist[-1][0]

    p50, p99, p999 = pct(0.50), pct(0.99), pct(0.999)
    max_size = hist[-1][0]
    decades: dict[int, int] = {}
    for s, n in hist:
        d = len(str(s)) - 1  # floor(log10(s)) for s >= 1
        decades[d] = decades.get(d, 0) + n
    # bulk statistic: p99.9 when the key population supports it; the
    # median below SMALL_PROFILE_KEYS (where p99.9 == max by
    # construction and the tail test could never fire) — but ONLY for
    # callers that opt in (profile_blocks).  The other profiles keep
    # p99.9 so a small naturally-spread population never trips a
    # median-based cap (ADVICE r9).
    bulk = p999 if (n_keys >= SMALL_PROFILE_KEYS or not median_fallback) else p50
    rec = None
    if max_size > tail_ratio * bulk:
        rec = int(headroom * max(bulk, 1))
    return CapProfile(
        n_keys=n_keys,
        total=total,
        max_size=max_size,
        p50=p50,
        p99=p99,
        p999=p999,
        decades=sorted(decades.items()),
        recommended_cap=rec,
    )


def profile_caps(
    docs: DataFrame,
    tail_ratio: float = TAIL_RATIO,
    headroom: float = HEADROOM,
) -> CapProfile:
    """Document-frequency profile of the shingle index →
    ``max_doc_freq`` recommendation for
    :func:`~acled_spark.queries.dedup.ngram_jaccard_pairs` /
    ``containment_pairs``.

    Key = (lang, shingle) — the same blocking the self-join uses, so
    the profiled df is literally the per-shingle join fan-out.  One
    exploded-shingle scan, one count aggregation; at 100 TB hash the
    shingle to 16 bytes first if exchange width matters (the advisor
    only needs counts, not the grams).
    """
    from acled_spark.queries.dedup import shingles_spark

    df = (
        docs.select(
            "lang", F.explode(shingles_spark(F.col("text"))).alias("shingle")
        )
        .groupBy("lang", "shingle")
        .agg(F.count("*").alias("df"))
    )
    return _profile_sizes(df, "df", tail_ratio, headroom)


def profile_blocks(
    emb: DataFrame,
    tail_ratio: float = TAIL_RATIO,
    headroom: float = HEADROOM,
) -> CapProfile:
    """Label-block-size profile of an embeddings frame → ``max_block``
    recommendation for
    :func:`~acled_spark.queries.dedup.embedding_cosine_pairs`.

    Key = label (the coarse-quantizer cell), i.e. exactly the blocking
    the cosine pair join quadratically explodes.  NULL labels are
    excluded: the blocking join is null-unsafe, so a NULL-label vector
    never pairs and cannot contribute fan-out.  One map-side-combinable
    aggregate over the label column only; the histogram collect is
    |distinct block sizes|-bounded.

    Feed it the SAME frame the pair join consumes — for the registered
    query that is
    :func:`acled_spark.queries.dedup.valid_width_embeddings` (the
    width-filtered frame), not the raw table: ragged vectors never
    pair, so counting them inflates block sizes and skews the
    recommendation (ADVICE r9).

    This is the ONE profile that opts into the small-key MEDIAN-bulk
    fallback (quantizer cells number in the tens-to-hundreds, where
    p99.9 degenerates to the max).  Caveat that fallback carries: on a
    naturally spread small population (median far below max with no
    single runaway cell) the median test can fire and the recommended
    cap would drop legitimate large blocks wholesale — before applying
    a cap from a sub-1000-key profile, check ``decades``: a genuine
    runaway shows as an isolated top-decade key separated from the
    bulk; a continuum of sizes up to the max means re-quantize (split
    the big cells), don't drop.
    """
    sizes = (
        emb.filter(F.col("label").isNotNull())
        .groupBy("label")
        .agg(F.count("*").alias("sz"))
    )
    return _profile_sizes(sizes, "sz", tail_ratio, headroom, median_fallback=True)


def profile_buckets(
    bands: DataFrame,
    tail_ratio: float = TAIL_RATIO,
    headroom: float = HEADROOM,
) -> CapProfile:
    """Bucket-size profile of LSH band rows → ``max_bucket``
    recommendation for
    :func:`~acled_spark.queries.dedup.lsh_candidate_edges`.

    ``bands`` is the (doc_id, band_id, band_key) frame
    :func:`~acled_spark.queries.dedup.minhash_bands_spark` produces;
    key = (band_id, band_key), i.e. exactly the grouping the pair
    expansion quadratically explodes.
    """
    sizes = (
        bands.groupBy("band_id", "band_key").agg(F.count("*").alias("sz"))
    )
    return _profile_sizes(sizes, "sz", tail_ratio, headroom)
