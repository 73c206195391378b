"""PII detection / redaction over document text (training-data hygiene).

A large-scale corpus pipeline scrubs personally identifiable strings
before training; the reference has no such operator (its `notes` column
ships raw — SURVEY §2.8 note), so this extends the engine's
LLM-data-pipeline surface alongside dedup/quality/contamination.

Engine shape: pure native ``regexp_count`` / ``regexp_replace`` chains —
JVM-side, whole-stage codegen, zero Python in the hot path.  At 100 TB
the scan dominates and these expressions ride the parquet reader's
vectorized batches (same argument as :mod:`acled_spark.queries.text`).

Every pattern is written in the common subset of Java regex (Spark) and
RE2 (DuckDB/Go): no lookarounds, no backreferences — so the SAME string
drives both the Spark builder and the SQL oracle, and cross-engine
parity is testable (tests/test_pii.py plants PII in both engines and
compares match-for-match).

Pattern notes (deliberately pragmatic, documented over-matches):

- ``ipv4`` accepts octets > 255 (exact range alternation triples the
  pattern for no recall gain on real text);
- ``phone`` is the NANP-ish 3-3-4 shape with optional country code —
  a 10-digit run with no separators counts as phone-like by design;
- ``credit_card`` is the 4×4 digit-group shape, no Luhn check (a
  checksum is not regex-expressible; a Luhn pass would be a second,
  non-oracle column — out of scope here);
- application ORDER matters for redaction: ``credit_card`` before
  ``phone`` (a 16-digit card contains a phone-shaped substring),
  ``ssn`` before ``phone`` is safe (3-2-4 never matches 3-3-4).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (name, pattern) in APPLICATION ORDER — see module docstring.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(\d{1,3}\.){3}\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("credit_card", r"\b\d{4}[- ]?\d{4}[- ]?\d{4}[- ]?\d{4}\b"),
    ("phone", r"(\+\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b"),
)


def _replacement(name: str) -> str:
    return f"[{name.upper()}]"


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-type match counts as native columns (``regexp_count``).

    Counts are computed on the RAW text, each type independently — a
    credit card therefore also counts as phone-shaped here; the
    redaction chain (:func:`scrub_pii`) is where precedence applies.
    """
    return {name: F.regexp_count(text, F.lit(pat)) for name, pat in PII_PATTERNS}


def scrub_pii(text: Column) -> Column:
    """Redact every PII pattern, in precedence order, to ``[TYPE]``.

    One chained ``regexp_replace`` expression — a single projection,
    no intermediate materialization.
    """
    out = text
    for name, pat in PII_PATTERNS:
        out = F.regexp_replace(out, pat, _replacement(name))
    return out


def scrub_frame(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrubbed frame + per-row audit columns.

    Adds ``<text_col>_scrubbed``, one ``pii_<type>`` count per pattern,
    and ``pii_any`` — the gate a pipeline filters or routes on.
    """
    text = F.col(text_col)
    counts = pii_counts(text)
    out = df.withColumn(f"{text_col}_scrubbed", scrub_pii(text))
    any_expr = F.lit(False)
    for name, c in counts.items():
        # NULL text -> regexp_count NULL -> coalesce to 0: the routing
        # gate must be two-valued, or a NULL-text row passes NEITHER
        # filter('pii_any') NOR filter(~pii_any) and silently vanishes
        # from both sinks
        c = F.coalesce(c, F.lit(0))
        out = out.withColumn(f"pii_{name}", c)
        any_expr = any_expr | (c > 0)
    return out.withColumn("pii_any", any_expr)


# --- oracle half (shared-pattern SQL generation) ---------------------------

def counts_sql(text_expr: str) -> dict[str, str]:
    """DuckDB expressions counting each pattern on ``text_expr`` —
    same regex strings as the Spark side (RE2-compatible subset)."""
    return {
        name: f"len(regexp_extract_all({text_expr}, '{pat}'))"
        for name, pat in PII_PATTERNS
    }


def scrub_sql(text_expr: str) -> str:
    """DuckDB expression applying the same redaction chain."""
    out = text_expr
    for name, pat in PII_PATTERNS:
        out = f"regexp_replace({out}, '{pat}', '{_replacement(name)}', 'g')"
    return out
