"""Data-quality validation engine (SURVEY §2 asset checks, §5).

Re-expresses the reference's 13 hand-written checks plus the YAML-driven
check factory (``asset_checks/acled_checks.py``, ``base_checks.py:13-248``,
``checks.yaml``) as parameterized DataFrame aggregation checks.

Design: every check compiles to expressions inside ONE aggregation pass
where possible (the reference re-reads the partition per check,
``acled_checks.py:15-36`` — here the frame is scanned once and cached by
the runner).  Blocking semantics = raise :class:`ValidationError`
(Dagster's ``blocking=True`` halt, ``acled_checks.py:96,193,542``).
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


@dataclass(frozen=True)
class CheckResult:
    name: str
    passed: bool
    blocking: bool
    metrics: dict = field(default_factory=dict)
    description: str = ""


class ValidationError(RuntimeError):
    """A blocking check failed — downstream materialization must halt."""

    def __init__(self, failures: list[CheckResult]):
        self.failures = failures
        names = ", ".join(f.name for f in failures)
        super().__init__(f"blocking check(s) failed: {names}")


@dataclass(frozen=True)
class Check:
    name: str
    fn: Callable[[DataFrame], CheckResult]
    blocking: bool = False

    def run(self, df: DataFrame) -> CheckResult:
        return self.fn(df)


def run_checks(
    df: DataFrame, checks: Sequence[Check], raise_on_blocking: bool = True
) -> list[CheckResult]:
    """Run a check suite over one cached scan of the frame.

    The reference re-reads the stored partition for every check; we
    cache() so the N checks share one materialization (SURVEY §4
    'caching' improvement).
    """
    df = df.cache()
    try:
        results = [c.run(df) for c in checks]
    finally:
        df.unpersist()
    blocking_failures = [r for r in results if not r.passed and r.blocking]
    if blocking_failures and raise_on_blocking:
        raise ValidationError(blocking_failures)
    return results


# ---------------------------------------------------------------------------
# Parameterized check builders (the YAML factory's vocabulary,
# ref base_checks.py + checks.yaml)
# ---------------------------------------------------------------------------

def non_empty(blocking: bool = True) -> Check:
    """Partition must contain rows (ref acled_checks.py:92-135, blocking)."""

    def _fn(df: DataFrame) -> CheckResult:
        n = df.count()
        return CheckResult(
            "non_empty", n > 0, blocking, {"row_count": n},
            "partition contains at least one row",
        )

    return Check("non_empty", _fn, blocking)


def required_columns(columns: Sequence[str], blocking: bool = False) -> Check:
    """All required columns present (ref acled_checks.py:138-186, checks.yaml:19-27)."""

    def _fn(df: DataFrame) -> CheckResult:
        missing = [c for c in columns if c not in df.columns]
        return CheckResult(
            "required_columns", not missing, blocking,
            {"missing": missing}, "schema contains all required columns",
        )

    return Check("required_columns", _fn, blocking)


def value_range(
    column: str,
    lo: float | None = None,
    hi: float | None = None,
    allow_null: bool = True,
    blocking: bool = False,
) -> Check:
    """Column values within [lo, hi] (ref acled_checks.py:249-331 coords,
    :334-399 fatalities; checks.yaml:40-41)."""
    if lo is None and hi is None:
        raise ValueError(
            f"value_range[{column}]: at least one of lo/hi is required — "
            "a boundless range check would pass vacuously"
        )

    def _fn(df: DataFrame) -> CheckResult:
        c = F.col(column)
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (c < lo)
        if hi is not None:
            bad = bad | (c > hi)
        agg = df.agg(
            F.count(F.when(bad, 1)).alias("out_of_range"),
            F.count(F.when(c.isNull(), 1)).alias("nulls"),
        ).collect()[0]
        bad_n = agg["out_of_range"] + (0 if allow_null else agg["nulls"])
        return CheckResult(
            f"value_range[{column}]", bad_n == 0, blocking,
            {"out_of_range": agg["out_of_range"], "nulls": agg["nulls"]},
            f"{column} within [{lo}, {hi}]",
        )

    return Check(f"value_range[{column}]", _fn, blocking)


def domain_membership(
    column: str, valid: Sequence[str], blocking: bool = False
) -> Check:
    """All values in a fixed domain; reports unknown + missing categories
    via anti-membership set logic (ref acled_checks.py:402-472, J3)."""

    def _fn(df: DataFrame) -> CheckResult:
        actual = {r[0] for r in df.select(column).distinct().collect() if r[0] is not None}
        unknown = sorted(actual - set(valid))
        missing = sorted(set(valid) - actual)
        return CheckResult(
            f"domain[{column}]", not unknown, blocking,
            {"unknown": unknown, "missing": missing},
            f"{column} values within the declared domain",
        )

    return Check(f"domain[{column}]", _fn, blocking)


def pk_unique(columns: Sequence[str], blocking: bool = False) -> Check:
    """Primary key uniqueness (ref acled_checks.py:475-534, checks.yaml:68-69)."""

    def _fn(df: DataFrame) -> CheckResult:
        total = df.count()
        distinct = df.select(*columns).distinct().count()
        return CheckResult(
            "pk_unique", total == distinct, blocking,
            {"rows": total, "distinct_keys": distinct, "duplicates": total - distinct},
            f"({', '.join(columns)}) unique",
        )

    return Check("pk_unique", _fn, blocking)


def row_count_bounds(
    lo: int = 1, hi: int = 10_000, blocking: bool = True
) -> Check:
    """Row count within expected bounds (ref acled_checks.py:538-620,
    1..10000/day, blocking)."""

    def _fn(df: DataFrame) -> CheckResult:
        n = df.count()
        return CheckResult(
            "row_count_bounds", lo <= n <= hi, blocking,
            {"row_count": n, "lo": lo, "hi": hi},
            f"row count within [{lo}, {hi}]",
        )

    return Check("row_count_bounds", _fn, blocking)


def completeness(
    columns: Sequence[str], min_pct: float = 95.0, blocking: bool = False
) -> Check:
    """Critical-field completeness >= min_pct, null+empty aware in one pass
    (ref acled_checks.py:623-722)."""

    def _fn(df: DataFrame) -> CheckResult:
        aggs = []
        for c in columns:
            col = F.col(c)
            missing = col.isNull()
            if dict(df.dtypes).get(c) == "string":
                missing = missing | (col == "")
            aggs.append(F.count(F.when(missing, 1)).alias(c))
        aggs.append(F.count(F.lit(1)).alias("__total"))
        row = df.agg(*aggs).collect()[0]
        total = row["__total"]
        per_col = {c: row[c] for c in columns}
        missing_total = sum(per_col.values())
        pct = (
            100.0
            if total == 0
            else 100.0 * (1 - missing_total / (total * len(columns)))
        )
        return CheckResult(
            "completeness", pct >= min_pct, blocking,
            {"completeness_pct": round(pct, 2), "missing_by_column": per_col},
            f"critical fields >= {min_pct}% complete",
        )

    return Check("completeness", _fn, blocking)


def dominance(
    column: str, max_share_pct: float = 80.0, blocking: bool = False
) -> Check:
    """No single category may dominate (ref acled_checks.py:818-936:
    >80% single event_type is an alarm)."""

    def _fn(df: DataFrame) -> CheckResult:
        top = (
            df.groupBy(column)
            .count()
            .withColumn(
                "share",
                100.0 * F.col("count") / F.sum("count").over(Window.partitionBy()),
            )
            .orderBy(F.desc("count"))
            .limit(1)
            .collect()
        )
        if not top:
            return CheckResult(
                f"dominance[{column}]", True, blocking, {}, "empty frame"
            )
        share = top[0]["share"]
        return CheckResult(
            f"dominance[{column}]", share <= max_share_pct, blocking,
            {"top_value": top[0][column], "share_pct": round(share, 2)},
            f"no {column} above {max_share_pct}% share",
        )

    return Check(f"dominance[{column}]", _fn, blocking)


def partition_date_match(
    column: str, expected_date, blocking: bool = True
) -> Check:
    """Every row's date equals the partition day (ref acled_checks.py:189-246,
    blocking)."""

    def _fn(df: DataFrame) -> CheckResult:
        bad = df.filter(
            F.col(column).isNull() | (F.col(column) != F.lit(expected_date))
        ).count()
        return CheckResult(
            "partition_date_match", bad == 0, blocking,
            {"mismatched_rows": bad, "expected": str(expected_date)},
            f"{column} == partition day {expected_date}",
        )

    return Check("partition_date_match", _fn, blocking)
