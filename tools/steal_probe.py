"""Correlate bench-canary slowdowns with hypervisor CPU steal.

Four r14 sessions produced full-bench --check flags that isolated
probes refuted on unchanged code; the working adjudication was "host
steal bursts", argued from canary timelines.  This probe makes that
argument MECHANICAL: it samples /proc/stat's steal column (field 8 —
ticks the hypervisor ran someone else while this guest had runnable
vCPUs) around each single-pass canary, so a slow canary reading can be
attributed to the host in the same breath it is observed.

Measured on the r14 close-out box (32 vCPUs, committed floors
cpu 0.842 s / shuffle 0.503 s):

    canary cpu 5.79x shuffle 6.34x | steal 12.8% of all-cpu ticks
    canary cpu 1.15x shuffle 1.47x | steal 0.9%
    canary cpu 1.01x shuffle 1.58x | steal 0.7%
    canary cpu 1.53x shuffle 2.30x | steal 8.6%

i.e. every >2x canary reading coincided with a steal burst an order of
magnitude above the calm-window rate, on a guest running nothing else.
Steal% is measured against ALL cpu ticks (busy + idle) across every
vCPU, so 12.8% means ~4 vCPUs' worth of continuous theft — far more
than 12.8% slowdown for a probe that only keeps a few cores busy.

Usage: python tools/steal_probe.py [n_samples] [sleep_s]
"""

from __future__ import annotations

import os
import sys
import time

# Repo root, not cwd: the imports below must resolve regardless of where
# the probe is invoked from (ADVICE r14).
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def steal_ticks() -> tuple[int, int]:
    """(steal, total) cumulative ticks from the aggregate cpu line."""
    with open("/proc/stat") as fh:
        f = fh.readline().split()
    return int(f[8]), sum(int(x) for x in f[1:9])


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    pause = float(sys.argv[2]) if len(sys.argv) > 2 else 10.0

    from acled_spark.session import get_spark
    from bench import run_canary

    spark = get_spark(app_name="steal-probe")
    spark.sparkContext.setLogLevel("ERROR")
    run_canary(spark, single_pass=True)  # settle codegen, like bench warmup
    for i in range(n):
        s0, t0 = steal_ticks()
        w = run_canary(spark, single_pass=True)
        s1, t1 = steal_ticks()
        steal_pct = 100.0 * (s1 - s0) / max(1, t1 - t0)
        print(
            f"[{i}] canary cpu {w['cpu']:.3f}s shuffle {w['shuffle']:.3f}s"
            f" | steal {steal_pct:.1f}% of all-cpu ticks during probe",
            flush=True,
        )
        time.sleep(pause)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
