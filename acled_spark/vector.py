"""Shared JVM-side vector kernels over ``array<float/double>`` columns.

THE one spelling of the embedding math primitives (cast-to-double,
dot product, L2 norm) used by similarity.py, dedup.py and scalars.py.
These expressions are parity-critical: the ``aggregate`` fold runs
sequentially left-to-right in BOTH Spark and DuckDB
(``list_dot_product`` folds in element order too), which is what keeps
the doubles bit-identical across engines — so the spelling must live in
exactly one place.  All three are higher-order-function expressions:
whole-stage-codegen JVM evaluation, no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(col: str | Column) -> Column:
    """Elementwise cast to ``array<double>`` (floats widen exactly)."""
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential left-to-right dot product — bit-identical to DuckDB's
    ``list_dot_product`` fold order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2_norm(col: str | Column) -> Column:
    """sqrt(Σ x²) over the double-cast vector, same fold order as dot()."""
    e = as_double(col)
    return F.sqrt(dot(e, e))
