"""Capture .explain('formatted') for registered queries into plans/<tag>/.

Usage: python tools/capture_plans.py <outdir-suffix: before|after> q1 q2 ...
Writes plans/r15/<query>_<suffix>.txt.  Explain only — no execution —
except that some builders run bounded driver-side jobs while building
(eager checkpoints); that is inherent to their shape.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> int:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from acled_spark.registry import all_specs
    from acled_spark.session import get_spark

    spark = get_spark(app_name="capture-plans")
    specs = all_specs()
    os.makedirs("plans/r15", exist_ok=True)
    for name in names:
        df = specs[name].builder(spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        out = f"plans/r15/{name}_{suffix}.txt"
        with open(out, "w") as fh:
            fh.write(plan)
        print(f"wrote {out} ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
