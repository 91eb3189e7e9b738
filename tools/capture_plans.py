#!/usr/bin/env python
"""Capture .explain('formatted') for registry legs into plans/<tag>/.

Usage: python tools/capture_plans.py <tag> <suffix> leg [leg ...]
Writes plans/<tag>/<leg>_<suffix>.txt. Uses a small local session so it
can run next to other work; plans do not depend on core count (shuffle
partition counts do, but we keep the session's default conf so the
captured plan matches the bench session's shape).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from external_benchmarks_spark.session import get_spark  # noqa: E402


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    legs = sys.argv[3:]
    import __spark_entry__ as entry

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("capture-plans")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    q = entry.queries()
    for leg in legs:
        df = q[leg](spark, sf)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{leg}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan)} bytes)")


if __name__ == "__main__":
    main()
