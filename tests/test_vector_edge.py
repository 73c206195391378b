"""Cross-engine parity for the vector queries on a PLANTED edge corpus.

The degenerate input every embedding pipeline eventually meets: an
all-zero vector (failed encoder call, padded row).  Cosine against it is
undefined — and under Spark's default ANSI mode an unguarded division
aborted sim_topk_bruteforce / sim_ann_lsh outright (round-7 review
finding), while the DuckDB oracle kept running.  Both engines now
EXCLUDE zero-norm vectors from probe and candidate sets; this suite
plants two zero vectors (one in the probe id range, one outside) and
runs the registered vector queries' engine-vs-oracle parity over them.

Also pins the shared kernel contract (acled_spark/vector.py): the one
dot/norm spelling all three consumer modules now import.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from acled_spark.queries.similarity import DIM
from acled_spark.registry import all_specs
from tests.conftest import assert_parity

_rng = random.Random(7)


def _vec(scale: float = 1.0) -> list[float]:
    return [round(_rng.gauss(0.0, scale), 3) for _ in range(DIM)]


# 12 vectors, 3 labels x 4 (small blocks keep dedup_embedding_cosine's
# 18 pairs under its LIMIT 20, so row selection can't depend on engine
# NULL-ordering).  vec_id 3 is a ZERO probe, vec_id 9 a ZERO candidate.
ROWS = [
    (0, _vec(), 0),
    (1, _vec(), 0),
    (2, _vec(0.5), 0),
    (3, [0.0] * DIM, 0),          # zero-norm PROBE (vec_id < N_QUERIES)
    (4, _vec(2.0), 1),
    (5, _vec(), 1),
    (6, _vec(), 1),
    (7, _vec(0.1), 1),
    (8, _vec(), 2),
    (9, [0.0] * DIM, 2),          # zero-norm candidate
    (10, _vec(), 2),
    (11, _vec(3.0), 2),
    # DEGENERATE WIDTHS (r7 review): a ragged vector NULL-coses via
    # zip_with padding in Spark but ABORTS DuckDB's list_dot_product,
    # and an empty array bypassed the zero-maxabs guard (array_max([])
    # is NULL) into an ANSI /0 — both now excluded by the shared
    # fixed-width/non-empty filters on BOTH engines
    (12, [round(0.1 * i, 3) for i in range(10)], 0),   # ragged (10-dim)
    (13, [], 1),                                        # empty array
    # NULL embedding (ADVICE r7): Spark's aggregate(NULL, ...) is NULL
    # while the f9b oracle's bare COALESCE mapped it to 0.0 — the oracle
    # now guards NULL out front, and this row keeps the divergence pinned
    (14, None, 2),
]
SCHEMA = "vec_id long, embedding array<float>, label int"

# every oracle-backed query over the embeddings table whose arithmetic
# is the sequential-fold kernel (bit-identical across engines)
_VECTOR_QUERIES = [
    "sim_topk_bruteforce",
    "sim_ann_lsh",
    "sim_ann_multiprobe",
    "sim_quantize_error",
    "dedup_embedding_cosine",
    "f9b_vector_norm",
]


@pytest.fixture(scope="module")
def edge_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("vec_edge")
    spark.createDataFrame(ROWS, SCHEMA).coalesce(1).write.parquet(
        str(d / "embeddings.parquet")
    )
    return str(d)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{edge_dir}/embeddings.parquet/*.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", _VECTOR_QUERIES)
def test_vector_edge_corpus_parity(spark, edge_duck, edge_dir, name):
    assert_parity(spark, edge_duck, all_specs()[name], sf_dir=edge_dir)


def test_zero_norm_vectors_excluded_not_fatal(spark, edge_dir):
    """The semantic pin behind the parity: zero-norm vectors appear as
    neither probes nor neighbors (instead of aborting the query under
    ANSI /0), and the norm query itself still reports them as 0.0."""
    specs = all_specs()
    topk = specs["sim_topk_bruteforce"].builder(spark, edge_dir).collect()
    assert {r["query_id"] for r in topk} == {0, 1, 2, 4}  # probe 3 dropped
    assert all(r["neighbor_id"] not in (3, 9) for r in topk)

    lsh = specs["sim_ann_lsh"].builder(spark, edge_dir).collect()
    assert all(r["query_id"] != 3 and r["neighbor_id"] not in (3, 9) for r in lsh)

    norms = {
        r["vec_id"]: r["l2_norm"]
        for r in specs["f9b_vector_norm"].builder(spark, edge_dir).collect()
    }
    assert norms[3] == 0.0 and norms[9] == 0.0  # still audited, not hidden

    # degenerate-width rows are excluded from the cosine family too
    assert all(
        r["neighbor_id"] not in (12, 13)
        for r in specs["sim_ann_multiprobe"].builder(spark, edge_dir).collect()
    )
    # ...but NOT hidden from the quantization audit's input domain
    # decision: the empty vector is excluded (undefined mae), while the
    # ragged one still audits (per-vector op, width-independent)
    q_ids = {
        r["vec_id"]
        for r in specs["sim_quantize_error"].builder(spark, edge_dir).collect()
    }
    assert 12 in q_ids and 13 not in q_ids


def test_shared_kernel_fold_matches_duckdb(spark):
    """vector.py's dot() folds left-to-right like list_dot_product: an
    ill-conditioned sum (big, -big, tiny) keeps the order-dependent
    result, so any future respelling that reorders the fold fails here."""
    from pyspark.sql import functions as F

    from acled_spark.vector import dot, l2_norm

    vals = [1e16, -1e16, 1.0, 3.0]
    df = spark.range(1).select(
        dot(
            F.array(*[F.lit(v) for v in vals]),
            F.array(*[F.lit(1.0)] * len(vals)),
        ).alias("d"),
        l2_norm(F.array(F.lit(3.0), F.lit(4.0))).alias("n"),
    )
    row = df.collect()[0]
    expected = 0.0
    for v in vals:  # the sequential fold, spelled in Python
        expected += v * 1.0
    assert row["d"] == expected
    assert row["n"] == 5.0
    got = duckdb.sql(
        f"SELECT list_dot_product({vals!r}, [1.0, 1.0, 1.0, 1.0]) AS d"
    ).fetchone()[0]
    assert got == expected
