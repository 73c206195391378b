"""Same-session spread on/off A/B for documents-consuming queries.

The r14 scan-spread default (tables.SPREAD_TABLES) was A/B'd on the cdc
family only; VERDICT r14 #3 asks for the same protocol on every
remaining spread-default consumer.  This probe runs each query's
builder + noop sink N times with the spread ON and N times with the
process-wide kill-switch (SPARK_GRAFT_SPREAD=0) flipped, interleaved
(on/off pairs) so a box-speed drift during the probe hits both arms,
and reports min + median per arm plus a single-pass canary before and
after so readings can be discarded when the box bursts.

Usage: python tools/spread_ab.py q1[,q2,...] [passes=3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    names = sys.argv[1].split(",")
    passes = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from acled_spark.registry import all_specs
    from acled_spark.session import get_spark
    from bench import _force, run_canary

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="spread-ab")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    unknown = [n for n in names if n not in specs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # settle codegen the way the bench warmup does
    for warm in ("q1_pricing_summary", "w3_rank_rows", "j2_static_map_lookup"):
        _force(specs[warm].builder(spark, sf_dir))
    print(f"canary(pre): {run_canary(spark, single_pass=True)}", flush=True)

    for name in names:
        spec = specs[name]
        on: list[float] = []
        off: list[float] = []
        # one untimed build per arm settles query-specific codegen
        for arm_env, sink in (("", on), ("0", off)):
            os.environ["SPARK_GRAFT_SPREAD"] = arm_env
            _force(spec.builder(spark, sf_dir))
        for _ in range(passes):
            for arm_env, sink in (("", on), ("0", off)):
                os.environ["SPARK_GRAFT_SPREAD"] = arm_env
                t0 = time.perf_counter()
                _force(spec.builder(spark, sf_dir))
                sink.append(time.perf_counter() - t0)
        os.environ.pop("SPARK_GRAFT_SPREAD", None)
        fmt = lambda xs: "[" + ", ".join(f"{x:.3f}" for x in sorted(xs)) + "]"
        print(
            f"{name}: spread_on min {min(on):.3f} {fmt(on)} | "
            f"spread_off min {min(off):.3f} {fmt(off)} | "
            f"off/on {min(off) / min(on):.2f}",
            flush=True,
        )
    print(f"canary(post): {run_canary(spark, single_pass=True)}", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
