"""Table maintenance: small-file compaction for partitioned stores.

The reference writes ≤10k rows per daily partition (one S3 object/day —
fine there, but a Spark table accumulating per-batch appends grows many
small files per partition; at 100 TB the NameNode/listing and task-
scheduling overhead of millions of tiny files dominates (SURVEY §7.4.5
"small-partition overhead").

:func:`compact_partitions` rewrites selected (or all) partitions to a
target file count with dynamic partition overwrite — untouched
partitions are never read or written, so compaction can run rolling
(e.g. yesterday's partitions only) behind the ingest.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def partition_file_counts(path: str, partition_col: str) -> dict[str, int]:
    """Data files per hive partition directory (driver-side listing —
    on object stores swap in the catalog/manifest listing)."""
    out: dict[str, int] = {}
    prefix = f"{partition_col}="
    if not os.path.isdir(path):
        return out
    for entry in sorted(os.listdir(path)):
        if entry.startswith(prefix):
            full = os.path.join(path, entry)
            out[entry[len(prefix):]] = sum(
                1
                for f in os.listdir(full)
                if f.endswith(".parquet") and not f.startswith(("_", "."))
            )
    return out


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    partitions: Sequence[str] | None = None,
    files_per_partition: int = 1,
    sort_cols: Sequence[str] | None = None,
) -> dict[str, int]:
    """Rewrite fragmented partitions down to ``files_per_partition`` files.

    Returns the pre-compaction file counts of the partitions rewritten.
    Idempotent; safe to re-run.  Selection defaults to every partition
    with more files than the target.

    ``sort_cols`` clusters rows within each output file (a
    ``sortWithinPartitions`` before the write — no extra shuffle): at
    scale this tightens parquet row-group min/max bounds on those
    columns, so later point/range scans skip row groups (the
    linear-order half of Z-ordering, which is the right trade for
    single-column hot predicates like a key or a timestamp).
    """
    counts = partition_file_counts(path, partition_col)
    if partitions is None:
        partitions = [p for p, n in counts.items() if n > files_per_partition]
    if not partitions:
        return {}
    df = spark.read.parquet(path).filter(
        F.col(partition_col).isin(list(partitions))
    )
    if files_per_partition == 1:
        # hash by the partition column: every partition value lands in
        # exactly one task -> exactly one output file per partition dir
        shaped = df.repartition(len(partitions), partition_col)
    else:
        # salt within partition value to spread across N files
        shaped = (
            df.withColumn(
                "__salt",
                F.pmod(F.monotonically_increasing_id(), files_per_partition),
            )
            .repartition(
                files_per_partition * len(partitions), partition_col, "__salt"
            )
            .drop("__salt")
        )
    if sort_cols:
        # partition_col leads the sort: the partitioned writer requires
        # rows ordered by the partition columns and would otherwise
        # inject its own (unstable) sort, clobbering the clustering
        shaped = shaped.sortWithinPartitions(partition_col, *sort_cols)
    from acled_spark.silver import _dynamic_overwrite

    with _dynamic_overwrite(spark):
        (
            shaped.write.mode("overwrite")
            .partitionBy(partition_col)
            .parquet(path)
        )
    return {p: counts[p] for p in partitions if p in counts}
