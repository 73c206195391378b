"""Distributed DB-API upsert sink — the JDBC/Postgres face of S8.

The reference's silver store is Postgres, maintained with
``INSERT … VALUES … ON CONFLICT (event_id_cnty) DO UPDATE SET
col=EXCLUDED.col`` over ``executemany``, commit-or-rollback (ref
dagster_acled/assets/base_assets.py:197-233).  The engine's primary
silver is Spark-managed parquet/Delta (:mod:`acled_spark.silver`);
this module is the SURVEY §1.5 *alternative* S8 mapping — "JDBC sink
via ``foreachPartition`` upsert" — for users pointing the engine at an
existing relational store.

Spark-first shape:

- The batch is pre-deduped to **one row per key** through
  :func:`acled_spark.silver.merge_updates` (same survivor contract as
  the Delta MERGE path), so the database never sees two conflicting
  writes for a key within one upsert, regardless of row order.
- The write itself is ``mapPartitions`` — per-partition imperative I/O
  is the one place the RDD layer is the right tool.  Each partition
  opens ONE connection from a picklable ``connection_factory``, streams
  ``executemany`` batches of ``batch_size`` rows, and commits once at
  partition end.  A failed partition rolls back atomically and the
  Spark task retry replays it; ``ON CONFLICT DO UPDATE`` makes the
  replay idempotent (the reference leans on the same property,
  SURVEY.md:467).
- ``num_writers`` bounds concurrency with ``coalesce`` (narrow, no
  shuffle): at 100 TB the scarce resource is database connections /
  server write throughput, not Spark parallelism — 1000 executors must
  not open 1000×cores connections against one Postgres.

Returns the exact number of rows sent, aggregated from per-partition
counts (also what forces execution — Spark sinks are lazy otherwise).
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from acled_spark.silver import merge_updates


def _quote(ident: str) -> str:
    """Double-quote an SQL identifier (Postgres + SQLite grammar)."""
    return '"' + ident.replace('"', '""') + '"'


def _quote_table(table: str) -> str:
    """Quote a possibly schema-qualified table name part by part, so
    reserved words and mixed case work ("analytics"."user") — same
    quoting discipline the column identifiers already get."""
    return ".".join(_quote(part) for part in table.split("."))


def build_upsert_sql(
    table: str,
    columns: list[str],
    keys: list[str],
    paramstyle: str = "qmark",
    conflict_clause: str | None = None,
) -> str:
    """The reference's upsert statement, parameterized by dialect.

    ``paramstyle`` is the DB-API module's declared style: ``qmark``
    (sqlite3) or ``format`` (psycopg2 / MySQLdb).  The default conflict
    clause is the Postgres/SQLite ``ON CONFLICT (keys) DO UPDATE SET
    col=EXCLUDED.col`` for every non-key column (ref
    base_assets.py:207-212); pass ``conflict_clause`` verbatim for
    other dialects (e.g. MySQL ``ON DUPLICATE KEY UPDATE …``).
    """
    if paramstyle == "qmark":
        ph = ", ".join(["?"] * len(columns))
    elif paramstyle == "format":
        ph = ", ".join(["%s"] * len(columns))
    else:
        raise ValueError(f"unsupported paramstyle: {paramstyle!r}")
    non_keys = [c for c in columns if c not in keys]
    if conflict_clause is None:
        if not non_keys:
            conflict_clause = (
                f"ON CONFLICT ({', '.join(_quote(k) for k in keys)}) DO NOTHING"
            )
        else:
            sets = ", ".join(
                f"{_quote(c)}=EXCLUDED.{_quote(c)}" for c in non_keys
            )
            conflict_clause = (
                f"ON CONFLICT ({', '.join(_quote(k) for k in keys)}) "
                f"DO UPDATE SET {sets}"
            )
    return (
        f"INSERT INTO {_quote_table(table)} "
        f"({', '.join(_quote(c) for c in columns)}) "
        f"VALUES ({ph}) {conflict_clause}"
    )


def _chunks(it: Iterable, size: int) -> Iterator[list]:
    buf: list = []
    for x in it:
        buf.append(x)
        if len(buf) >= size:
            yield buf
            buf = []
    if buf:
        yield buf


def upsert_dbapi(
    df: DataFrame,
    connection_factory: Callable[[], object],
    table: str,
    key: str | list[str],
    order_col: str | None = None,
    num_writers: int = 8,
    batch_size: int = 1000,
    paramstyle: str = "qmark",
    conflict_clause: str | None = None,
    create_sql: str | None = None,
) -> int:
    """Idempotent keyed upsert into a relational table (S8, JDBC face).

    ``connection_factory`` must be a zero-arg picklable callable
    returning a DB-API 2.0 connection — it is shipped to executors, so
    bind credentials/DSN into it (e.g. ``functools.partial``), never a
    live connection.  Type adaptation (dates, decimals) is the
    factory's concern: register adapters there if the driver needs
    them.

    ``create_sql`` (e.g. ``CREATE TABLE IF NOT EXISTS …``, ref
    base_assets.py:160-195) runs once on the driver before the
    distributed write — DDL from N concurrent partitions would race.

    Returns the number of rows written (one per distinct key in
    ``df``).
    """
    keys = [key] if isinstance(key, str) else list(key)
    missing = [k for k in keys if k not in df.columns]
    if missing:
        raise ValueError(f"key columns not in frame: {missing}")
    if num_writers < 1:
        raise ValueError("num_writers must be >= 1")
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    # NULL key values break the idempotency contract outright: SQL
    # unique indexes treat NULLs as distinct, so ON CONFLICT never
    # fires for them and EVERY replay (task retry, foreachBatch
    # redelivery) inserts the row again — duplicates accumulating in
    # the relational store with no error (r7 review).  Fail loudly on
    # the driver instead.
    null_key_pred = None
    for k in keys:
        cond = F.col(k).isNull()
        null_key_pred = cond if null_key_pred is None else (null_key_pred | cond)
    null_keys = df.filter(null_key_pred).count()
    if null_keys:
        raise ValueError(
            f"{null_keys} row(s) carry NULL in key column(s) {keys}: "
            "ON CONFLICT never matches NULL unique-index entries, so "
            "replays would duplicate these rows — filter them out or "
            "repair the keys upstream"
        )

    columns = df.columns
    sql = build_upsert_sql(table, columns, keys, paramstyle, conflict_clause)

    if create_sql is not None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            cur.execute(create_sql)
            conn.commit()
        finally:
            conn.close()

    # One surviving row per key BEFORE rows scatter across writers:
    # two partitions upserting the same key would otherwise race and
    # the survivor would depend on partition scheduling.  The
    # localCheckpoint is a stage barrier: coalesce(num_writers) below
    # would otherwise propagate up the narrow chain and run the whole
    # window dedup at num_writers-task parallelism — the dedup should
    # use the cluster, only the WRITE should be connection-bounded.
    latest = merge_updates(df.limit(0), df, keys, order_col).localCheckpoint()

    def write_partition(rows: Iterator) -> Iterator[int]:
        first = next(rows, None)
        if first is None:
            return
        conn = connection_factory()
        written = 0
        try:
            cur = conn.cursor()
            import itertools

            tuples = (
                tuple(r[c] for c in columns)
                for r in itertools.chain([first], rows)
            )
            for batch in _chunks(tuples, batch_size):
                cur.executemany(sql, batch)
                written += len(batch)
            conn.commit()
        except Exception:
            conn.rollback()
            raise
        finally:
            conn.close()
        yield written

    counts = latest.coalesce(num_writers).rdd.mapPartitions(write_partition)
    return int(sum(counts.collect()))
