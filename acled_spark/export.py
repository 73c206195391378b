"""Training-data export/import: JSONL and CSV shard sinks + sources.

The interchange formats every downstream trainer consumes.  JSONL is the
canonical LLM-corpus format (one JSON object per line, gzip shards);
CSV covers tabular handoff.  Both are thin, deliberate wrappers over
Spark's native readers/writers, so compression codecs, schema
enforcement, and predicate pushdown (CSV/JSON readers support column
pruning) come from the engine.

Scale notes:
- `shards` controls output fan-in via DETERMINISTIC hash-prefix
  bucketing of the sort key (never sampled range boundaries, which are
  run-dependent), so shard N of a re-run holds the same rows and each
  shard is internally sorted by (bucket, key) — byte-stable for
  reproducible diffing.  Shards are NOT contiguous key ranges.
- Readers take an explicit schema: schema inference reads the data
  twice and guesses types (a 100 TB anti-pattern); the pipeline's
  schemas are known.
- `mode=PERMISSIVE` + `columnNameOfCorruptRecord` quarantines malformed
  lines into a column instead of failing the job — corrupt-line auditing
  is a first-class concern when ingesting crawled JSONL.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"


def write_jsonl(
    df: DataFrame,
    path: str,
    shards: int | None = None,
    sort_col: str | None = None,
    compression: str = "gzip",
    shuffle_seed: str | None = None,
) -> None:
    """Write a DataFrame as compressed JSONL shards.

    With ``shards`` + ``sort_col``, rows bucket by a deterministic
    hash prefix of the key and sort by (bucket, key) within each shard
    — byte-stable across re-runs on the same input, which makes corpus
    diffs and resumable training real.  Shard membership is a pure
    function of (key, shard count), NOT a contiguous key range: a
    consumer needing global order must merge on the key, not
    concatenate shards.

    With ``shuffle_seed`` + ``sort_col``, rows are instead GLOBALLY
    SHUFFLED by the seeded permutation of ``sort_col`` (see
    :func:`acled_spark.queries.packing.shuffle_assignment`) — still
    byte-stable per (seed, input), which is how training exports get
    randomized order without losing reproducibility; bump the seed to
    re-shuffle between epochs.  ``shards`` then fixes the bucket count.
    """
    if shuffle_seed is not None:
        if sort_col is None:
            raise ValueError("shuffle_seed requires sort_col (the row id key)")
        from acled_spark.queries.packing import N_SHUFFLE_SHARDS, shuffle_key_cols

        n_shards = shards if shards is not None else N_SHUFFLE_SHARDS
        # __-prefixed temp names so a user column can't be silently
        # clobbered-and-dropped; sorting directly on (shard, hash key)
        # equals sorting on shuffle_assignment's (shard, pos) — same
        # bytes with ONE exchange and no row_number window
        hk_col, shard_col = "__shuffle_hk", "__shuffle_shard"
        clash = {hk_col, shard_col} & set(df.columns)
        if clash:
            raise ValueError(f"input columns collide with shuffle temps: {clash}")
        hk, shard = shuffle_key_cols(sort_col, shuffle_seed, n_shards)
        df = (
            df.withColumn(hk_col, hk)
            .withColumn(shard_col, shard)
            # explicit partition count: hash-of-shard assignment is
            # deterministic, so shard contents stay byte-stable
            .repartition(n_shards, F.col(shard_col))
            .sortWithinPartitions(shard_col, hk_col, sort_col)
            .drop(shard_col, hk_col)
        )
    elif shards is not None and sort_col is not None:
        # Deterministic hash-prefix buckets of the key, NOT
        # repartitionByRange: RangePartitioner samples its boundaries
        # (seeded from the RDD id), so re-exports of identical input
        # could shift rows across shard edges and flip per-shard bytes
        # — exactly the manifest-diff contract this writer exists for.
        # Shard membership is a pure function of (key, shard count);
        # rows are sorted on the key within each shard.  Like the
        # shuffle path below, bucket->partition placement goes through
        # Spark's hash partitioner, so two buckets may share a file and
        # the writer emits UP TO ``shards`` files — deterministically.
        from acled_spark.queries.packing import shuffle_key_cols

        # same collision contract as the shuffle branch above: silently
        # clobbering-and-dropping a user column named like the temp
        # would remove a data column from the export (round-7 review)
        if "__range_shard" in df.columns:
            raise ValueError(
                "input columns collide with shard temp: {'__range_shard'}"
            )
        _, shard = shuffle_key_cols(sort_col, "range-shard", shards)
        df = (
            df.withColumn("__range_shard", shard)
            .repartition(shards, F.col("__range_shard"))
            .sortWithinPartitions("__range_shard", sort_col)
            .drop("__range_shard")
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


def _nonblank_line(col: F.Column) -> F.Column:
    """Predicate for lines the file-based JSON reader actually parses.

    Measured (round-7 review): the reader SKIPS lines that are empty
    after stripping JSON whitespace (space/tab/CR/LF), while VT/FF-only
    lines are NOT skipped — they parse as corrupt records.  ``F.trim``
    strips only ASCII spaces, so the previous filter kept tab-only
    lines in ``total_lines`` that the reader never yields, breaking the
    audit's reconciliation contract (a spurious ``export_rows`` problem
    on an intact export).
    """
    return F.length(F.regexp_replace(col, "[ \t\r\n]", "")) > 0


def corrupt_line_audit(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """Count parseable vs malformed lines in a JSONL dataset (ingest QA).

    One pass over the raw text: ``from_json`` yields NULL for lines that
    don't parse.  (Querying the PERMISSIVE reader's ``_corrupt_record``
    alone is disallowed by Spark — SPARK-21610 — and the text formulation
    needs no cache workaround.)
    """
    # Lines the JSON reader skips must be excluded here too or
    # total_lines can't reconcile with read_jsonl's row count.
    lines = spark.read.text(path).filter(_nonblank_line(F.col("value")))
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


# --- shard manifests: export integrity for training runs ---------------------
MANIFEST_NAME = "_manifest.json"

#: 15 hex digits (60 bits) per row, summed as DECIMAL (a long sum would
#: overflow under ANSI after ~2^3 rows of near-max digests): the sum is
#: ORDER-INDEPENDENT, so a re-read under any task scheduling reproduces
#: it — and any dropped, duplicated, or edited row shifts it (unlike an
#: XOR fold, where a duplicated row cancels itself out).
_DIGEST_HEX_DIGITS = 15


def row_digest_expr(columns: list[str]) -> Column:
    """Per-row manifest digest: decimal value of the first
    ``_DIGEST_HEX_DIGITS`` hex digits of md5(to_json(row)).

    Module-level and known-answer-pinned (r13 mutation lens, M31): the
    write and verify faces share this expression, so any
    self-consistent change (a different hex window, a different base, a
    different digit count) round-trips cleanly through every
    write→verify gate while silently changing what the manifest
    certifies — the M8 codec class.  The external pin is
    ``tests/test_export.py::test_row_digest_known_answer``, which
    recomputes the digest with python hashlib on a frozen row.

    to_json options pinned: LTZ timestamps render through the SESSION
    timezone by default, so a manifest written under a UTC session
    would never verify from a non-UTC one (every per-row digest
    shifts) — the integrity gate must not depend on who reads it.
    ignoreNullFields pinned to its default so the digest is also
    immune to a session that flipped spark.sql.jsonGenerator.*.
    """
    return F.conv(
        F.substring(
            F.md5(
                F.to_json(
                    F.struct(*columns),
                    {"timeZone": "UTC", "ignoreNullFields": "true"},
                )
            ),
            1,
            _DIGEST_HEX_DIGITS,
        ),
        16,
        10,
    ).cast("decimal(20,0)")


def _shard_stats(df: DataFrame) -> DataFrame:
    """(file URI, rows, digest) per input file of an already-loaded
    export.  Grouped on the FULL ``input_file_name()`` URI, not the
    basename: partitioned layouts reuse basenames across subdirectories
    (every task writes ``part-00000-<uuid>...`` under its own
    ``lang=…/``), so a basename key would silently merge distinct
    files.  The tiny result is relativized/decoded driver-side."""
    row_digest = row_digest_expr(df.columns)
    return (
        df.withColumn("_file", F.input_file_name())
        .groupBy("_file")
        .agg(
            F.count("*").alias("rows"),
            F.sum(row_digest).cast("decimal(38,0)").alias("digest"),
        )
    )


def _rel_shard_name(file_uri: str, root_path: str | None) -> str:
    """Manifest key for one input file: its path relative to the export
    root (``input_file_name`` URIs are percent-encoded — decoded here so
    keys match the on-disk listing's raw names), basename if the file
    lies elsewhere or no root was given."""
    from urllib.parse import unquote, urlparse

    p = unquote(urlparse(file_uri).path)
    if root_path:
        prefix = root_path.rstrip("/") + "/"
        if p.startswith(prefix):
            return p[len(prefix):]
    return posixpath.basename(p)


def shard_manifest(df: DataFrame, path: str | None = None) -> list[dict]:
    """Per-shard row counts + content digests of a loaded export.

    ``df`` must come straight from a reader (``read_jsonl``/``read_csv``
    /parquet) so ``input_file_name()`` is populated.  The digest is a
    sum of per-row md5 prefixes over the canonical JSON encoding of the
    full row — order-independent, partitioning-independent, and
    computed distributed (one scan, a |shards|-row aggregate).

    Pass ``path`` to reconcile against the ON-DISK file inventory:
    ``input_file_name`` grouping only sees files that yield rows, so
    without the listing a zero-row shard (truncated file, foreign
    leftover from a partial re-export) would be invisible; with it,
    such files appear as ``rows=0, digest="0"`` entries.  Shards are
    keyed by path RELATIVE to ``path`` (basename for flat exports), so
    partitioned layouts — whose tasks reuse basenames across
    subdirectories — keep one entry per physical file.
    """
    from acled_spark.fsutil import fs_list_data_files, fs_qualified_path

    root = fs_qualified_path(df.sparkSession, path) if path is not None else None
    stats: dict[str, dict] = {}
    for r in _shard_stats(df).collect():
        name = _rel_shard_name(r["_file"], root)
        if name in stats:
            # two distinct physical files collapsed onto one key — the
            # basename fallback on a partitioned layout (tasks reuse
            # part-file names across partition dirs).  Silently merging
            # would drop a shard from the manifest; demand the root.
            raise ValueError(
                f"duplicate shard key {name!r} from distinct files — "
                "pass the export root via path= so partitioned layouts "
                "key shards by their relative path"
            )
        # digest serialized as a string: it exceeds 2^63 on large shards
        # and must survive a JSON round-trip exactly
        stats[name] = {"shard": name, "rows": r["rows"], "digest": str(r["digest"])}
    if path is not None:
        for name in fs_list_data_files(df.sparkSession, path):
            stats.setdefault(name, {"shard": name, "rows": 0, "digest": "0"})
    return [stats[k] for k in sorted(stats)]


def write_manifest(df: DataFrame, path: str) -> int:
    """Materialize ``MANIFEST_NAME`` next to an export's shards.

    Call after the export write, passing the re-read frame (the manifest
    must describe the BYTES ON DISK, not the pre-write plan).  Returns
    the number of shards recorded.  The manifest itself is tiny
    (|shards| entries), hidden from Spark data readers by its leading
    underscore, and written driver-side via the Hadoop FS API so it
    works on any supported scheme.
    """
    import json

    from acled_spark.fsutil import fs_write_text

    entries = shard_manifest(df, path)
    fs_write_text(
        df.sparkSession,
        posixpath.join(path, MANIFEST_NAME),
        json.dumps(entries, indent=1),
    )
    return len(entries)


def verify_manifest(
    spark: SparkSession, path: str, schema: str, reader=read_jsonl
) -> list[dict]:
    """Re-derive shard stats from DISK and diff against ``MANIFEST_NAME``.

    Returns a list of mismatch records (empty == export intact): one per
    shard that is missing, unexpected, or whose rows/digest changed —
    the pre-training integrity gate that catches partial writes,
    truncated shards, and silent rewrites (the corruption that arrives
    with CONSISTENT file checksums) before a run trains on them.

    The gate builds its OWN fresh read after dropping Spark's cached
    file listing for ``path`` — a caller-supplied frame could carry a
    stale InMemoryFileIndex from before the corruption and either crash
    on changed files or silently verify the original bytes.

    Codec-level corruption (a truncated gzip member throws EOFException
    JVM-side — DROPMALFORMED only absorbs JSON parse errors) fails the
    one-job bulk pass, so the gate falls back to reading each on-disk
    shard in isolation and reports the undecodable ones as
    ``problem="unreadable"`` instead of raising.  (The fallback reads
    files individually, so partition-directory shards lose their
    directory-derived columns; their comparison drops to row counts —
    digests would differ on every intact shard and bury the real
    corruption in false positives.)

    For the JSONL reader (the default), one extra raw-text pass counts
    unparseable lines per shard: DROPMALFORMED makes the rows/digest
    comparison blind to garbage APPENDED to a shard (the malformed
    lines simply vanish from the parse — round-7 review), so any shard
    carrying lines the parser rejects is reported as
    ``problem="unparseable_lines"`` even when its parseable content
    still matches the manifest.
    """
    import json

    from acled_spark.fsutil import fs_list_data_files, fs_read_text

    spark.catalog.refreshByPath(path)
    df = reader(spark, path, schema)
    recorded = {
        e["shard"]: e
        for e in json.loads(fs_read_text(spark, posixpath.join(path, MANIFEST_NAME)))
    }
    unreadable: set[str] = set()
    rows_only: set[str] = set()
    try:
        actual = {e["shard"]: e for e in shard_manifest(df, path)}
    except Exception:
        actual = {}
        for name in fs_list_data_files(spark, path):
            try:
                entries = shard_manifest(reader(spark, posixpath.join(path, name), schema))
                stat = entries[0] if entries else {"rows": 0, "digest": "0"}
                actual[name] = {
                    "shard": name,
                    "rows": stat["rows"],
                    "digest": stat["digest"],
                }
                if "/" in name:
                    # per-file reads see no partition-directory columns,
                    # so digests can't match the bulk-read manifest —
                    # compare row counts only for subdirectory shards
                    rows_only.add(name)
            except Exception:
                unreadable.add(name)
                actual[name] = {"shard": name, "rows": -1, "digest": ""}
    problems: list[dict] = []
    corrupt_by_shard: dict[str, int] = {}
    if reader is read_jsonl:
        from acled_spark.fsutil import fs_qualified_path

        try:
            root = fs_qualified_path(spark, path)
            raw = spark.read.text(path).filter(_nonblank_line(F.col("value")))
            per_file = (
                raw.select(
                    F.input_file_name().alias("_file"),
                    F.from_json(
                        "value",
                        f"{schema}, {CORRUPT_COL} string",
                        {"mode": "PERMISSIVE",
                         "columnNameOfCorruptRecord": CORRUPT_COL},
                    ).alias("rec"),
                )
                .groupBy("_file")
                .agg(
                    F.count(
                        F.when(F.col(f"rec.{CORRUPT_COL}").isNotNull(), 1)
                    ).alias("corrupt")
                )
                .collect()
            )
            corrupt_by_shard = {
                _rel_shard_name(r["_file"], root): r["corrupt"]
                for r in per_file
                if r["corrupt"]
            }
        except Exception as exc:
            # A failed raw-text pass must SURFACE, not silently skip
            # the appended-garbage gate (r8 lens review): codec-level
            # corruption usually also fails the bulk pass (whose
            # per-shard fallback reports those shards "unreadable"),
            # but a text-pass-ONLY failure previously produced no
            # record at all — verify_manifest returned [] ("export
            # intact") with its DROPMALFORMED-blindness gate unrun.
            corrupt_by_shard = {}
            if not unreadable:
                problems.append(
                    {
                        "shard": "*",
                        "problem": "text_pass_failed",
                        "error": f"{type(exc).__name__}: {exc}"[:500],
                    }
                )
    for shard in sorted(corrupt_by_shard):
        problems.append(
            {
                "shard": shard,
                "problem": "unparseable_lines",
                "corrupt_lines": corrupt_by_shard[shard],
            }
        )
    for shard in sorted(set(recorded) | set(actual)):
        if shard not in actual:
            problems.append({"shard": shard, "problem": "missing"})
        elif shard in unreadable:
            problems.append(
                {
                    "shard": shard,
                    "problem": "unreadable",
                    "recorded": recorded.get(shard),
                }
            )
        elif shard not in recorded:
            problems.append({"shard": shard, "problem": "unexpected"})
        elif (
            recorded[shard]["rows"] != actual[shard]["rows"]
            if shard in rows_only
            else (recorded[shard]["rows"], recorded[shard]["digest"])
            != (actual[shard]["rows"], actual[shard]["digest"])
        ):
            problems.append(
                {
                    "shard": shard,
                    "problem": "content_mismatch",
                    "recorded": recorded[shard],
                    "actual": actual[shard],
                }
            )
    return problems
