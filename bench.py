#!/usr/bin/env python
"""Benchmark harness: run every registered query at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:  {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced end-to-end with a noop write (full computation, no
driver-side result transfer skewing the numbers).
"""

from __future__ import annotations

import json
import os
import sys
import time

from acled_spark.registry import all_specs
from acled_spark.session import get_spark


def _force(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="acled-spark-bench")

    specs = all_specs()
    # Warm the JVM + parquet footers once so per-query numbers measure the
    # query, not session startup.
    from acled_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()

    timings: dict[str, float] = {}
    for name in sorted(specs):
        spec = specs[name]
        t0 = time.perf_counter()
        try:
            _force(spec.builder(spark, sf_dir))
            timings[name] = round(time.perf_counter() - t0, 3)
        except Exception as exc:  # keep the bench line parseable on failure
            print(f"bench: {name} FAILED: {exc}", file=sys.stderr)
            timings[name] = -1.0

    total = round(sum(t for t in timings.values() if t >= 0), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
