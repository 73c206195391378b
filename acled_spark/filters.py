"""Column-filter predicate DSL — the engine's public query-filter API.

The reference exposes a 31-column filter DSL: every event column has a
``col`` value plus a ``col_where`` operator override, compiled into API
query params (``acled_request_config.py:326-417`` fields, ``:425-454``
``build_params``).  Default operators there: LIKE (contains) for text,
``=`` for numerics/enums, ``>=`` for timestamps.

Here the same DSL compiles to BOTH:
- a Spark ``Column`` predicate (AND-composed, Catalyst pushes it into the
  parquet scan as ``PushedFilters``), and
- an equivalent ANSI-SQL ``WHERE`` fragment (used to auto-generate the
  DuckDB oracle, so the DSL itself is the artifact under test).
"""

from __future__ import annotations

import math
import numbers
import re
from collections.abc import Sequence
from dataclasses import dataclass
from datetime import date, datetime

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the 31 reference filter columns are all plain snake_case
#: identifiers; anything else is either a typo or an injection attempt
#: against the three surfaces a column name reaches VERBATIM — the
#: generated oracle WHERE fragment (to_sql), the API query-param name
#: (to_params), and Spark's column resolver (where a stray dot would
#: silently re-resolve as a struct-field path).  Reject at
#: construction, the one choke point all three share (r10 hostile-
#: input review).
_IDENT = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")

_OPS = {
    "eq",
    "ne",
    "gt",
    "ge",
    "lt",
    "le",
    "like",      # contains semantics: LIKE '%v%' (reference default for text)
    "prefix",    # LIKE 'v%'
    "in",
    "between",
    "isnull",
    "notnull",
}


@dataclass(frozen=True)
class Predicate:
    """One column predicate: (column, operator, value).

    Value types accepted BY CONTRACT (not accident): any
    :class:`numbers.Integral` / :class:`numbers.Real` — including numpy
    scalars (``np.int64``, ``np.float32``) as they come off a pandas or
    Spark ``collect()`` — plus ``str``, ``bool``, ``date``/``datetime``
    and ``None``.  Numeric abstract-base-class dispatch happens in the
    shared literal emitters (:func:`_spark_lit` / :func:`_sql_lit`), so
    both the Spark column and the generated SQL/API fragment render a
    plain numeric literal; exotic Real subtypes with lossy ``float()``
    conversions are the caller's responsibility.
    """

    column: str
    op: str
    value: object = None

    def __post_init__(self) -> None:
        if not isinstance(self.column, str) or not _IDENT.match(self.column):
            raise ValueError(
                f"invalid filter column {self.column!r}: column names must "
                "be plain identifiers ([A-Za-z_][A-Za-z0-9_]*) — they are "
                "interpolated verbatim into the generated SQL WHERE "
                "fragment and the API query-param name"
            )
        if self.op not in _OPS:
            raise ValueError(f"unknown filter op: {self.op!r} (valid: {sorted(_OPS)})")
        if self.op in ("in", "between"):
            if isinstance(self.value, (str, bytes)):
                # a bare string iterates as CHARACTERS: 'in' would
                # compile to isin('B','a','t','t','l','e','s') and push
                # 'B|a|t|t|l|e|s' to the API — both silently wrong; fail
                # loudly at construction instead (round-7 review)
                raise TypeError(
                    f"op {self.op!r} needs an iterable of values, got a bare "
                    f"string {self.value!r} — wrap it: [{self.value!r}]"
                )
            # materialize ONCE (frozen dataclass -> object.__setattr__):
            # validating via tuple() would otherwise consume a one-shot
            # iterator and leave it exhausted for to_column()/to_sql()
            vals = tuple(self.value)
            object.__setattr__(self, "value", vals)
            if self.op == "between" and len(vals) != 2:
                raise ValueError(
                    f"op 'between' needs exactly (lo, hi), got {len(vals)} values"
                )

    # -- Spark side ---------------------------------------------------------
    def to_column(self) -> Column:
        c = F.col(self.column)
        op, v = self.op, self.value
        # every scalar comparison routes through _spark_lit, like
        # 'between': a raw datetime literal is session-timezone
        # TimestampType while the columns (and the generated SQL
        # oracle's TIMESTAMP literal) are tz-naive — mixing the two
        # shifted boundary rows by the session offset
        if op == "eq":
            return c == _spark_lit(v)
        if op == "ne":
            return c != _spark_lit(v)
        if op == "gt":
            return c > _spark_lit(v)
        if op == "ge":
            return c >= _spark_lit(v)
        if op == "lt":
            return c < _spark_lit(v)
        if op == "le":
            return c <= _spark_lit(v)
        if op == "like":
            return c.contains(v)
        if op == "prefix":
            return c.startswith(v)
        if op == "in":
            vals = list(v)
            if not vals:
                return F.lit(False)  # empty IN-list: always-false
            # literals through _spark_lit like every other comparison
            # (datetime values must stay tz-naive)
            return c.isin([_spark_lit(x) for x in vals])
        if op == "between":
            lo, hi = v
            return c.between(_spark_lit(lo), _spark_lit(hi))
        if op == "isnull":
            return c.isNull()
        if op == "notnull":
            return c.isNotNull()
        raise AssertionError(op)

    # -- SQL side (oracle generation) ---------------------------------------
    def to_sql(self) -> str:
        col, op, v = self.column, self.op, self.value
        if op == "eq":
            return f"{col} = {_sql_lit(v)}"
        if op == "ne":
            return f"{col} <> {_sql_lit(v)}"
        if op == "gt":
            return f"{col} > {_sql_lit(v)}"
        if op == "ge":
            return f"{col} >= {_sql_lit(v)}"
        if op == "lt":
            return f"{col} < {_sql_lit(v)}"
        if op == "le":
            return f"{col} <= {_sql_lit(v)}"
        if op == "like":
            return f"{col} LIKE {_sql_lit(f'%{_like_escape(v)}%')} ESCAPE '\\'"
        if op == "prefix":
            return f"{col} LIKE {_sql_lit(f'{_like_escape(v)}%')} ESCAPE '\\'"
        if op == "in":
            if not list(v):
                return "FALSE"  # empty IN-list: always-false, like isin([])
            vals = ", ".join(_sql_lit(x) for x in v)
            return f"{col} IN ({vals})"
        if op == "between":
            lo, hi = v
            return f"{col} BETWEEN {_sql_lit(lo)} AND {_sql_lit(hi)}"
        if op == "isnull":
            return f"{col} IS NULL"
        if op == "notnull":
            return f"{col} IS NOT NULL"
        raise AssertionError(op)


def _spark_lit(v: object) -> Column:
    if isinstance(v, datetime):
        return F.lit(v.isoformat(sep=" ")).cast("timestamp_ntz")
    if isinstance(v, date):
        return F.lit(v.isoformat()).cast("date")
    return F.lit(v)


def _like_escape(v: object) -> str:
    """Escape LIKE wildcards so SQL matches Spark's literal-substring
    semantics (`Column.contains` / `startswith` never treat % or _ as
    wildcards)."""
    return (
        str(v).replace("\\", "\\\\").replace("%", "\\%").replace("_", "\\_")
    )


def _sql_lit(v: object) -> str:
    if isinstance(v, str):
        escaped = v.replace("'", "''")
        return f"'{escaped}'"
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    if isinstance(v, date):
        return f"DATE '{v.isoformat()}'"
    # numerics render via the canonical int/float repr (shortest
    # round-trip float text); the old catch-all repr() fallback let any
    # object with a hostile __repr__ write itself into the SQL fragment
    # unescaped (r10 hostile-input review).  Accept the ABC families,
    # not exact types: numpy.int64 is an Integral but NOT an int
    # subclass (unlike numpy.float64), so callers feeding aggregation
    # results into predicates would otherwise regress (ADVICE r10) —
    # coercing via int()/float() keeps the rendered text canonical.
    if isinstance(v, numbers.Integral):
        return repr(int(v))
    if isinstance(v, numbers.Real):
        f = float(v)
        if not math.isfinite(f):
            raise ValueError(
                f"non-finite float {f!r} has no SQL literal form"
            )
        if f != v:
            # a lossy coercion (Fraction(1,3), ...) would silently turn
            # an exact equality predicate into an approximate one on
            # the SQL face while the Spark face (F.lit) rejects the
            # type — the two faces of one Predicate must never diverge
            raise ValueError(
                f"{type(v).__name__} value {v!r} does not coerce to "
                "float exactly; convert explicitly before building the "
                "predicate"
            )
        return repr(f)
    raise TypeError(
        f"unsupported filter literal type {type(v).__name__!r} "
        f"(supported: str, bool, int, float, date, datetime)"
    )


@dataclass(frozen=True)
class FilterSpec:
    """AND-composition of predicates — mirrors ``build_params`` semantics
    (every configured column predicate applies conjunctively,
    ref acled_request_config.py:425-454)."""

    predicates: Sequence[Predicate]

    def to_column(self) -> Column:
        if not self.predicates:
            return F.lit(True)
        out = self.predicates[0].to_column()
        for p in self.predicates[1:]:
            out = out & p.to_column()
        return out

    def to_sql(self) -> str:
        if not self.predicates:
            return "TRUE"
        return " AND ".join(p.to_sql() for p in self.predicates)

    def apply(self, df: DataFrame) -> DataFrame:
        return df.filter(self.to_column())

    def to_params(self) -> tuple[dict[str, str], list[Predicate]]:
        """Serialize into ACLED-style API query params — the source-side
        half of predicate pushdown (ref acled_request_config.py:425-454:
        ``field`` carries the value, ``field_where`` the operator).

        Returns ``(params, residual)``: predicates the param grammar
        can't express (IS NULL / BETWEEN / escapes-needing LIKE values)
        come back as ``residual`` instead of being silently dropped.
        Pushdown here is best-effort bandwidth savings — the engine-side
        ``apply``/``to_column`` remains the authoritative filter.
        """
        params: dict[str, str] = {}
        residual: list[Predicate] = []
        tokens = {"ne": "<>", "gt": ">", "ge": ">=", "lt": "<", "le": "<="}

        def clean(v: object) -> bool:
            # the pipe IS the wire-format OR-list delimiter for EVERY
            # param (eq/in/LIKE all share one grammar), so any value
            # containing it would be server-side split into several
            # values and mis-match — unrecoverable engine-side
            return "|" not in str(v)

        for p in self.predicates:
            if p.column in params or f"{p.column}_where" in params:
                residual.append(p)  # one param pair per column max
                continue
            if p.op == "eq" and clean(p.value):
                # explicit '=' companion: without it the server applies
                # the column's DEFAULT operator, which is LIKE-contains
                # for text columns — a bare actor1=Military would
                # superset-match 'Military Forces of ...' with an empty
                # residual and no engine-side correction
                params[p.column] = str(p.value)
                params[f"{p.column}_where"] = "="
            elif p.op in tokens and clean(p.value):
                params[p.column] = str(p.value)
                params[f"{p.column}_where"] = tokens[p.op]
            elif (
                p.op == "in"
                and list(p.value)  # empty IN: always-false, engine-side
                and all(clean(x) for x in p.value)
            ):
                params[p.column] = "|".join(str(x) for x in p.value)
                params[f"{p.column}_where"] = "="
            elif (
                p.op in ("like", "prefix")
                # Engine semantics are literal substring/prefix
                # (contains/startswith); the API's LIKE grammar treats %
                # and _ as wildcards and offers no documented escape, so
                # any value containing a wildcard (or a backslash, whose
                # server-side handling is unspecified) must stay
                # engine-side or the pushed filter would match a
                # superset and fetch_day would persist rows the caller
                # excluded.
                and not any(ch in str(p.value) for ch in ("%", "_", "\\"))
                and clean(p.value)
            ):
                pat = f"%{p.value}%" if p.op == "like" else f"{p.value}%"
                params[p.column] = pat
                params[f"{p.column}_where"] = "LIKE"
            else:
                residual.append(p)
        return params, residual


def build_filter(spec: dict[str, object]) -> FilterSpec:
    """Reference-style config dict -> FilterSpec.

    Mirrors ``AcledConfig``'s ``col`` / ``col_where`` pairs: a plain
    ``{"column": value}`` entry uses the column's default operator
    (``like`` for str, ``eq`` otherwise), while ``{"column__op": value}``
    overrides it (``acled_request_config.py:326-417``).
    """
    preds = []
    for key, value in spec.items():
        if "__" in key:
            column, op = key.rsplit("__", 1)
        else:
            column = key
            op = "like" if isinstance(value, str) else "eq"
        preds.append(Predicate(column, op, value))
    return FilterSpec(tuple(preds))
