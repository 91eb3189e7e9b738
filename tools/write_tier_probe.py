#!/usr/bin/env python
"""Standalone, uncontended re-measure of the serving write tiers.

The write tiers are the bench legs most exposed to host IO stalls
(every micro-batch MERGE writes one file per touched bucket plus the
manifest), and the r12 full-bench runs measured the SAME code at
300 QPS as both 301.8/s clean and 169.6/s saturated 40 minutes apart.
Per the SCALE.md noise protocol, the credible number is the best of N
fresh-session, idle-box probes (stalls are one-sided).

Usage: python tools/write_tier_probe.py [n_runs] -> one JSON line.
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from external_benchmarks_spark.session import get_spark

import bench


def main() -> None:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("wtier")
    spark.range(1).count()
    out: dict = {}
    for qps in (20, 200, 300, 400):
        runs = []
        for _ in range(n_runs):
            if qps == 20:
                r = bench.mixed_rw(spark, sf)
            else:
                r = bench.serving_write_tier(spark, sf, write_qps=qps)
            runs.append(r)
        key = "mixed_rw" if qps == 20 else f"tier_{qps}qps"
        out[key] = runs
        print(f"# {key}: {runs}", file=sys.stderr)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
