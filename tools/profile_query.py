"""Per-stage empirical profile of one registered query (guide §1.1).

Runs a query with the Spark UI enabled, forces it through the noop sink
(guide §1.4), then scrapes the UI REST API for per-stage wall time,
executor run time, input bytes, and shuffle read/write bytes — the
"where is the time actually going" table the optimization round needs
before touching any plan.

Usage: python tools/profile_query.py q1 q2 ... [--passes 2]

Output (stdout): per query, one line per stage of the SLOWEST pass plus
a totals line; stages sorted by executorRunTime desc.  Timing noise is
handled the same way as bench.py: the reported wall is the MIN of the
passes, but stage tables come from the last pass (warm JVM).
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

from acled_spark.registry import all_specs  # noqa: E402

UI_PORT = 4055


def _rest(path: str):
    with urllib.request.urlopen(
        f"http://localhost:{UI_PORT}/api/v1/{path}", timeout=10
    ) as r:
        return json.load(r)


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 2
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1])
    import os

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from acled_spark.session import get_spark

    spark = get_spark(
        app_name="profile-query",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": str(UI_PORT),
        },
    )
    specs = all_specs()
    unknown = set(args) - set(specs)
    if unknown:
        raise SystemExit(f"unknown queries: {sorted(unknown)}")

    from acled_spark.tables import TABLE_NAMES, load

    for t in TABLE_NAMES:
        load(spark, sf_dir, t).count()

    app_id = spark.sparkContext.applicationId

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    for name in args:
        spec = specs[name]
        walls = []
        boundaries = []
        for p in range(passes):
            jobs_before = {j["jobId"] for j in _rest(f"applications/{app_id}/jobs")}
            spark.sparkContext.setJobDescription(f"profile:{name}:pass{p}")
            t0 = time.perf_counter()
            noop(spec.builder(spark, sf_dir))
            walls.append(time.perf_counter() - t0)
            boundaries.append(jobs_before)
        spark.sparkContext.setJobDescription(None)

        # stages of the LAST pass (warm): jobs not present before it
        jobs = _rest(f"applications/{app_id}/jobs")
        last_jobs = [j for j in jobs if j["jobId"] not in boundaries[-1]]
        stage_ids = sorted({s for j in last_jobs for s in j["stageIds"]})
        stages = _rest(f"applications/{app_id}/stages")
        by_id = {}
        for s in stages:
            if s["stageId"] in stage_ids and s["status"] != "SKIPPED":
                by_id.setdefault(s["stageId"], s)
        rows = []
        for sid in stage_ids:
            s = by_id.get(sid)
            if s is None:
                rows.append((sid, "SKIPPED", 0, 0, 0, 0, 0, ""))
                continue
            sub = s.get("submissionTime")
            com = s.get("completionTime")
            wall = 0.0
            if sub and com:
                fmt = "%Y-%m-%dT%H:%M:%S.%f"
                wall = (
                    time.mktime(time.strptime(com[:-3], fmt))
                    + float(com[-7:-3]) / 1000
                    - time.mktime(time.strptime(sub[:-3], fmt))
                    - float(sub[-7:-3]) / 1000
                )
            rows.append(
                (
                    sid,
                    s["status"],
                    s.get("executorRunTime", 0),
                    s.get("inputBytes", 0),
                    s.get("shuffleReadBytes", 0),
                    s.get("shuffleWriteBytes", 0),
                    s.get("numTasks", 0),
                    (s.get("description") or s.get("name", ""))[:80],
                )
            )
        print(f"\n=== {name}: walls={[round(w, 3) for w in walls]} "
              f"min={min(walls):.3f}s  jobs(last pass)={len(last_jobs)} "
              f"stages={len(stage_ids)}")
        rows.sort(key=lambda r: -r[2])
        for sid, st, ert, inb, srb, swb, nt, nm in rows:
            print(
                f"  stage {sid:>4} {st:<9} exec {ert/1000.0:7.2f}s "
                f"in {inb/1e6:8.1f}MB  sh_r {srb/1e6:7.1f}MB "
                f"sh_w {swb/1e6:7.1f}MB  tasks {nt:>3}  {nm}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
