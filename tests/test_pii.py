"""PII scrub: planted-PII behavior + cross-engine regex parity.

The corpus-level query (`text_pii_scrub`) is parity-swept in
test_parity.py but the synthetic corpus is digit-free, so the
match-POSITIVE half of the contract lives here: planted emails,
phones, SSNs, IPs and card numbers must be counted and redacted
identically by the Spark expressions and the DuckDB oracle SQL
(same pattern strings, Java-regex/RE2 common subset).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from acled_spark.pii import (
    PII_PATTERNS,
    counts_sql,
    pii_counts,
    scrub_frame,
    scrub_pii,
    scrub_sql,
)

SAMPLES = [
    # (doc_id, text, expected {type: count}, expected scrubbed)
    (0, "mail me at jane.doe+spam@example.co.uk today",
     {"email": 1}, "mail me at [EMAIL] today"),
    (1, "server 10.0.255.1 and 192.168.1.77 are up",
     {"ipv4": 2}, "server [IPV4] and [IPV4] are up"),
    (2, "ssn 123-45-6789 on file",
     {"ssn": 1, "phone": 0}, "ssn [SSN] on file"),
    (3, "call 555-867-5309 or +1 (212) 555-0123",
     {"phone": 2}, "call [PHONE] or [PHONE]"),
    (4, "card 4111-1111-1111-1111 charged",
     # dashed 4-4-4-4 grouping holds no 3-3-4 phone-shaped substring,
     # so raw counts stay clean; precedence still matters for the
     # separator-free variant (see test_precedence_card_redacted_before_phone)
     {"credit_card": 1, "phone": 0}, "card [CREDIT_CARD] charged"),
    (5, "plain text, no identifiers at all", {}, None),
    (6, "bare ten digits 2125550123 look phone-like",
     {"phone": 1}, "bare ten digits [PHONE] look phone-like"),
]


def test_counts_and_scrub_on_planted_pii(spark):
    df = spark.createDataFrame(
        [(i, t) for i, t, _, _ in SAMPLES], "doc_id int, text string"
    )
    out = {r["doc_id"]: r for r in scrub_frame(df).collect()}
    for doc_id, text, expected, scrubbed in SAMPLES:
        row = out[doc_id]
        for name, _ in PII_PATTERNS:
            assert row[f"pii_{name}"] == expected.get(name, 0), (
                doc_id, name, row[f"pii_{name}"])
        assert row["pii_any"] == bool(expected)
        assert row["text_scrubbed"] == (scrubbed if scrubbed is not None else text)


def test_precedence_card_redacted_before_phone(spark):
    """The redaction chain must consume the card BEFORE the phone rule
    sees its phone-shaped substring (application order contract)."""
    df = spark.createDataFrame([("4111 1111 1111 1111",)], "text string")
    got = df.select(scrub_pii(F.col("text")).alias("s")).collect()[0]["s"]
    assert got == "[CREDIT_CARD]"


def test_cross_engine_parity_on_planted_pii(spark):
    """Same pattern strings, both engines, match-for-match equality of
    every count and the fully scrubbed text."""
    rows = [(i, t) for i, t, _, _ in SAMPLES]
    sdf = spark.createDataFrame(rows, "doc_id int, text string")
    exprs = [F.col("doc_id")] + [
        c.alias(name) for name, c in pii_counts(F.col("text")).items()
    ] + [scrub_pii(F.col("text")).alias("scrubbed")]
    spark_rows = sorted(tuple(r) for r in sdf.select(*exprs).collect())

    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id INT, text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    count_cols = ", ".join(f"{e} AS {n}" for n, e in counts_sql("text").items())
    duck_rows = sorted(
        tuple(r) for r in con.execute(
            f"SELECT doc_id, {count_cols}, {scrub_sql('text')} AS scrubbed FROM t"
        ).fetchall()
    )
    assert spark_rows == duck_rows


def test_scrub_is_idempotent(spark):
    """Scrubbing already-scrubbed text is a no-op — replacement tokens
    must not themselves match any pattern."""
    df = spark.createDataFrame(
        [(t,) for _, t, _, _ in SAMPLES], "text string"
    )
    once = df.select(scrub_pii(F.col("text")).alias("t1"))
    twice = once.select(
        F.col("t1"), scrub_pii(F.col("t1")).alias("t2")
    ).collect()
    for r in twice:
        assert r["t1"] == r["t2"]


def test_null_and_empty_text(spark):
    df = spark.createDataFrame([(None,), ("",)], "text string")
    out = scrub_frame(df).collect()
    by_text = {r["text"]: r for r in out}
    assert by_text[""]["text_scrubbed"] == ""
    assert by_text[""]["pii_any"] is False
    assert by_text[None]["text_scrubbed"] is None


def test_scrub_frame_null_text_routes_clean_not_nowhere(spark):
    """NULL text must give pii_any=False (two-valued gate): a NULL
    would fail BOTH filter('pii_any') and filter(~pii_any), silently
    dropping the row from quarantine and clean sinks alike."""
    df = spark.createDataFrame(
        [(1, "mail me at a@b.com"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in scrub_frame(df).collect()}
    assert out[1]["pii_any"] is True
    assert out[2]["pii_any"] is False
    assert out[2]["pii_email"] == 0
    routed = scrub_frame(df)
    n_q = routed.filter(F.col("pii_any")).count()
    n_clean = routed.filter(~F.col("pii_any")).count()
    assert n_q + n_clean == 2
