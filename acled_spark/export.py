"""Training-data export/import: JSONL and CSV shard sinks + sources.

The interchange formats every downstream trainer consumes.  JSONL is the
canonical LLM-corpus format (one JSON object per line, gzip shards);
CSV covers tabular handoff.  Both are thin, deliberate wrappers over
Spark's native readers/writers, so compression codecs, schema
enforcement, and predicate pushdown (CSV/JSON readers support column
pruning) come from the engine.

Scale notes:
- `shards` controls output fan-in via repartition BY RANGE on a sort
  key, so shard N of a re-run holds the same rows (deterministic
  sharding — retraining sees stable shard boundaries) and each shard is
  internally sorted for reproducible diffing.
- Readers take an explicit schema: schema inference reads the data
  twice and guesses types (a 100 TB anti-pattern); the pipeline's
  schemas are known.
- `mode=PERMISSIVE` + `columnNameOfCorruptRecord` quarantines malformed
  lines into a column instead of failing the job — corrupt-line auditing
  is a first-class concern when ingesting crawled JSONL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    sort_col: str | None = None,
    compression: str = "gzip",
) -> None:
    """Write a DataFrame as compressed JSONL shards.

    With ``shards`` + ``sort_col``, output is range-partitioned and
    per-shard sorted on the key — byte-stable across re-runs on the
    same input, which makes corpus diffs and resumable training real.
    """
    if shards is not None and sort_col is not None:
        df = df.repartitionByRange(shards, F.col(sort_col)).sortWithinPartitions(
            sort_col
        )
    elif shards is not None:
        df = df.repartition(shards)
    elif sort_col is not None:
        # honor the sort contract even without resharding
        df = df.sortWithinPartitions(sort_col)
    df.write.mode("overwrite").option("compression", compression).json(path)


def read_jsonl(
    spark: SparkSession, path: str, schema: str, keep_corrupt: bool = False
) -> DataFrame:
    """Read JSONL with an explicit schema.  Malformed lines never fail the
    scan: with ``keep_corrupt`` they're quarantined into
    ``_corrupt_record`` (PERMISSIVE), otherwise dropped at parse time
    (DROPMALFORMED — a post-hoc filter on the corrupt column would trip
    Spark's corrupt-column-only query restriction under column pruning,
    SPARK-21610)."""
    if keep_corrupt:
        return (
            spark.read.schema(f"{schema}, {CORRUPT_COL} string")
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", CORRUPT_COL)
            .json(path)
        )
    return spark.read.schema(schema).option("mode", "DROPMALFORMED").json(path)


def corrupt_line_audit(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Count parseable vs malformed lines in a JSONL dataset (ingest QA).

    One pass over the raw text: ``from_json`` yields NULL for lines that
    don't parse.  (Querying the PERMISSIVE reader's ``_corrupt_record``
    alone is disallowed by Spark — SPARK-21610 — and the text formulation
    needs no cache workaround.)
    """
    # Blank lines are skipped by the JSON reader, so exclude them here
    # too or total_lines can't reconcile with read_jsonl's row count.
    lines = spark.read.text(path).filter(F.length(F.trim("value")) > 0)
    # PERMISSIVE from_json yields a struct (with the raw line in the
    # corrupt field) rather than NULL, so probe that field.
    parsed = lines.select(
        F.from_json(
            "value",
            f"{schema}, {CORRUPT_COL} string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("rec")
    )
    return parsed.agg(
        F.count("*").alias("total_lines"),
        F.count(F.when(F.col(f"rec.{CORRUPT_COL}").isNotNull(), 1)).alias(
            "corrupt_lines"
        ),
    )


def write_csv(
    df: DataFrame, path: str, shards: int | None = None, header: bool = True
) -> None:
    if shards is not None:
        df = df.repartition(shards)
    df.write.mode("overwrite").option("header", header).option(
        "compression", "gzip"
    ).csv(path)


def read_csv(
    spark: SparkSession, path: str, schema: str, header: bool = True
) -> DataFrame:
    return spark.read.schema(schema).option("header", header).csv(path)
