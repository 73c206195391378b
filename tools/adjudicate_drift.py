#!/usr/bin/env python
"""Mechanically adjudicate a bench session against a baseline, the way
``bench.py --check`` now does live (VERDICT r13 #1): compute
session_speed, then split raw per-query flags into REGRESSION
(survives normalization — plan-state) vs DRIFT-SUSPECT (absorbed by
session_speed — box-state).

session_speed source, in preference order:
1. canary: both files carry a same-CANARY_VERSION canary
   (``canary_wall`` / ``canary_floor``) — the live path.
2. ``--proxy median``: the median per-query ratio now/was across all
   queries both files time.  This is the FALLBACK for canary-less
   historical sessions (e.g. the r13 driver session) and is weaker by
   construction: a change that genuinely slowed MANY queries would
   inflate the proxy and excuse itself.  The tool prints which source
   it used; a canary is always preferred when present.

Usage:
    python tools/adjudicate_drift.py SESSION.json [BASELINE.json]
    # baseline defaults to the committed BENCH_FULL.json

Prints one summary line plus a table of flags, and exits 0 (it is an
analysis tool, not a gate — the gate is ``bench.py --check``).
"""

from __future__ import annotations

import json
import os
import statistics
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def median_ratio_proxy(now_q: dict, base_q: dict) -> float | None:
    ratios = [
        now_q[k] / base_q[k]
        for k in now_q
        if k in base_q and base_q[k] > 0 and now_q[k] > 0
    ]
    return round(statistics.median(ratios), 3) if ratios else None


def adjudicate(session: dict, baseline: dict) -> dict:
    now_q = {k: v for k, v in session.get("queries", session).items() if v > 0}
    base_q = {k: v for k, v in baseline.get("queries", baseline).items() if v > 0}
    speed = bench.session_speed(
        session.get("canary_wall") or session.get("canary_floor"),
        bench.baseline_canary_floor(baseline),
    )
    source = "canary"
    if speed is None:
        speed = median_ratio_proxy(now_q, base_q)
        source = "median-ratio proxy (no comparable canary)"
    raw, regressions, suspects = [], [], []
    for name in sorted(now_q):
        was = base_q.get(name)
        if was is None:
            continue
        now = now_q[name]
        raw_flag = now > 1.5 * was and now - was > 0.5
        adj = was * (speed if speed is not None else 1.0)
        norm_flag = now > 1.5 * adj and now - adj > 0.5
        if raw_flag:
            raw.append((name, was, now))
        if norm_flag:
            regressions.append((name, was, now))
        elif raw_flag:
            suspects.append((name, was, now))
    return {
        "session_speed": speed,
        "speed_source": source,
        "raw_flags": raw,
        "regressions": regressions,
        "drift_suspects": suspects,
    }


def main() -> None:
    if len(sys.argv) < 2:
        raise SystemExit(__doc__)
    with open(sys.argv[1]) as fh:
        session = json.load(fh)
    base_path = sys.argv[2] if len(sys.argv) > 2 else bench.FULL_PATH
    with open(base_path) as fh:
        baseline = json.load(fh)
    r = adjudicate(session, baseline)
    print(
        f"session_speed={r['session_speed']} ({r['speed_source']}); "
        f"raw flags: {len(r['raw_flags'])}, surviving REGRESSIONs: "
        f"{len(r['regressions'])}, DRIFT-SUSPECT: {len(r['drift_suspects'])}"
    )
    for tag, rows in (("REGRESSION", r["regressions"]),
                      ("DRIFT-SUSPECT", r["drift_suspects"])):
        for name, was, now in sorted(rows, key=lambda x: x[1] - x[2]):
            print(f"  {tag} {name}: {was:.3f}s -> {now:.3f}s ({now / was:.2f}x)")


if __name__ == "__main__":
    main()
