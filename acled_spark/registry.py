"""Query registry: every engine operator as (Spark builder, DuckDB oracle).

Each operator from SURVEY.md §2 registers here with:
- a *builder* ``(spark, sf_dir) -> DataFrame`` — the idiomatic Spark plan;
- an *oracle* — equivalent ANSI SQL runnable by DuckDB on the same parquet
  (``None`` for genuinely non-SQL-expressible ops, which get a weaker
  rows-only check from the harness).

Parity rules (the harness hash-compares values after sorting columns by
name):

- alias every computed column identically in builder and oracle;
- round every floating aggregate (sums/avgs of doubles) to a fixed number
  of decimals on BOTH sides — different reduction orders perturb the last
  ulp of a double, and rounding collapses that to an identical value;
- give every ``LIMIT`` a total order (unique tiebreaker column) so top-k
  is deterministic across engines;
- cast DuckDB's exotic aggregate result types (HUGEINT sums, DECIMAL
  quantiles) back to BIGINT/DOUBLE so schemas line up.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str, oracle: str | None = None, tags: tuple[str, ...] = ()
) -> Callable[[Builder], Builder]:
    """Decorator: register ``fn`` as the Spark builder for ``name``."""

    def deco(fn: Builder) -> Builder:
        prior = REGISTRY.get(name)
        if prior is not None and (
            prior.builder.__module__, prior.builder.__qualname__
        ) != (fn.__module__, fn.__qualname__):
            # same-function re-registration is allowed: after a FAILED
            # partial import of the queries package, Python re-executes
            # the modules on the next _ensure_loaded() — refusing the
            # identical decorator would mask the original error with a
            # spurious "duplicate" here
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, tags=tags, doc=fn.__doc__ or ""
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side-effect: modules register their queries.
    from acled_spark import queries  # noqa: F401


def all_specs() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(REGISTRY)


def spark_queries() -> dict[str, Builder]:
    return {name: spec.builder for name, spec in all_specs().items()}


def oracle_map() -> dict[str, str]:
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
