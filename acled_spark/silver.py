"""Silver-layer keyed upsert — the pipeline's idempotency backbone.

The reference maintains its silver store with a primary-key upsert
(``INSERT ... ON CONFLICT (event_id_cnty) DO UPDATE``, row-wise
executemany — ref base_assets.py:197-233).  Re-running a partition is
safe; late/corrected data is handled by replay (ref SURVEY §2.10 T4).

Spark-first re-expression (no transactional table format required):

- :func:`merge_updates` — pure DataFrame MERGE semantics: updates win
  over existing rows on the key; deterministic survivor within each side.
- :func:`upsert_partitioned` — storage path: merge only the partitions
  the update batch touches, rewrite them with **dynamic partition
  overwrite** (untouched partitions are never read or written).

Scale notes (100 TB): the merge shuffles on the key once; with the
target bucketed by key the exchange disappears entirely.  Dynamic
overwrite bounds the rewrite to touched date partitions — the
reference's "replay one day" contract maps to rewriting one partition
directory, not the table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SRC_COL = "__src_priority"
_RN_COL = "__merge_rn"


def merge_updates(
    existing: DataFrame,
    updates: DataFrame,
    key: str | list[str],
    order_col: str | None = None,
) -> DataFrame:
    """MERGE semantics as a DataFrame op: one surviving row per key.

    Updates beat existing rows (``ON CONFLICT DO UPDATE``); within a
    side, the row with the greatest ``order_col`` wins (replay of the
    same batch is a no-op).  Remaining ties (duplicate keys with no/equal
    order_col) break on a full-row content hash, so the survivor is
    deterministic regardless of partitioning.
    """
    keys = [key] if isinstance(key, str) else list(key)
    cols = existing.columns
    if set(cols) != set(updates.columns):
        raise ValueError(
            f"schema mismatch: existing={sorted(cols)} updates={sorted(updates.columns)}"
        )
    unioned = existing.select(*cols).withColumn(_SRC_COL, F.lit(0)).unionByName(
        updates.select(*cols).withColumn(_SRC_COL, F.lit(1))
    )
    order = [F.desc(_SRC_COL)]
    if order_col is not None:
        order.append(F.desc(order_col))
    # final tiebreak: a content hash of the full row — survivor choice is
    # a function of the DATA, never of partition layout (duplicate keys
    # within one side would otherwise resolve nondeterministically)
    order.append(F.desc(F.xxhash64(*cols)))
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        unioned.withColumn(_RN_COL, F.row_number().over(w))
        .filter(F.col(_RN_COL) == 1)
        .drop(_SRC_COL, _RN_COL)
    )


def upsert_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    target_path: str,
    key: str | list[str],
    partition_col: str,
    order_col: str | None = None,
) -> None:
    """Idempotent keyed upsert into a date-partitioned parquet table.

    Only partitions present in ``updates`` are read, merged, and
    rewritten (dynamic partition overwrite) — the Spark analog of the
    reference's per-day replay (``base_assets.py:207-233``).
    """
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    if _table_exists(spark, target_path):
        touched = [r[0] for r in updates.select(partition_col).distinct().collect()]
        existing = (
            spark.read.parquet(target_path)
            .filter(F.col(partition_col).isin(touched))
            .select(*updates.columns)
        )
        merged = merge_updates(existing, updates, key, order_col)
    else:
        merged = merge_updates(
            updates.limit(0), updates, key, order_col
        )
    (
        merged.write.mode("overwrite")
        .partitionBy(partition_col)
        .parquet(target_path)
    )


def delete_keys(
    spark: SparkSession,
    target_path: str,
    tombstones: DataFrame,
    key: str | list[str],
    partition_col: str | None = None,
) -> int:
    """Propagate key deletions into a partitioned parquet table (the
    right-to-be-forgotten / retraction half of MERGE; the reference's
    store only upserts, so this extends SURVEY §2.1 S8).

    If ``partition_col`` is given AND present in ``tombstones``, only the
    partitions named by the tombstones are read, anti-joined, and
    rewritten; otherwise the whole table is rewritten (a keyed delete
    with unknown partition bounds must touch every partition — ship the
    partition value with the tombstone to avoid that at scale).

    Dynamic partition overwrite only replaces partitions that appear in
    the OUTPUT, so a partition whose every row is deleted would silently
    survive; those are removed explicitly through the Hadoop FS API
    (works on any FileSystem implementation, not just local disk).
    Returns the number of rows deleted.
    """
    keys = [key] if isinstance(key, str) else list(key)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    bounded = partition_col is not None and partition_col in tombstones.columns
    current = spark.read.parquet(target_path)
    if bounded:
        touched = [
            r[0] for r in tombstones.select(partition_col).distinct().collect()
        ]
        # NULL-safe partition membership: isin() drops NULL tombstone
        # values, which would silently skip __HIVE_DEFAULT_PARTITION__.
        pred = F.col(partition_col).isin([t for t in touched if t is not None])
        if any(t is None for t in touched):
            pred = pred | F.col(partition_col).isNull()
        scoped = current.filter(pred)
    else:
        scoped = current
    victims = F.broadcast(tombstones.select(*keys).distinct())
    # Cheap no-op path first: replayed tombstones whose keys are already
    # gone shouldn't checkpoint/rewrite anything.
    deleted = scoped.join(victims, on=keys, how="left_semi").count()
    if deleted == 0:
        return 0
    kept = scoped.join(victims, on=keys, how="left_anti")
    kept = kept.localCheckpoint()  # sever lineage: the rewrite reads its input
    if partition_col is not None:
        emptied = [
            r[0]
            for r in (
                scoped.select(partition_col)
                .distinct()
                .join(kept.select(partition_col).distinct(), partition_col, "left_anti")
            ).collect()
        ]
        kept.write.mode("overwrite").partitionBy(partition_col).parquet(target_path)
        if emptied:
            jvm = spark._jvm
            conf = spark._jsc.hadoopConfiguration()
            # Spark escapes special chars in partition directory names
            # (e.g. ':' -> '%3A') and maps NULL to the Hive default
            # partition — mirror both or the cleanup silently no-ops.
            esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
            for p in emptied:
                dirname = (
                    "__HIVE_DEFAULT_PARTITION__"
                    if p is None
                    else esc.escapePathName(str(p))
                )
                jpath = jvm.org.apache.hadoop.fs.Path(
                    f"{target_path}/{partition_col}={dirname}"
                )
                fs = jpath.getFileSystem(conf)
                fs.delete(jpath, True)
    else:
        kept.write.mode("overwrite").parquet(target_path)
    return deleted


def _table_exists(spark: SparkSession, path: str) -> bool:
    if not os.path.exists(path):
        return False
    # a partitioned parquet dir with at least one partition directory
    return any(
        not entry.startswith("_") for entry in os.listdir(path)
    )
