#!/usr/bin/env python
"""Uncontended re-measure of the r11 PQ-family bench wobble.

The round-11 driver's post-HEAD BENCH_full re-run showed ivfpq_topk
0.666->1.435s, pq_topk 0.571->1.152s, dedup_keep_best 0.559->1.067s,
quant_dot_topk 0.222->0.408s on identical code. The r10 hierarchy_rollup
precedent says: re-measure in a FRESH session with nothing else having
run (the full bench executes ~118 legs before these four, so session
heap/GC state is maximally contended there), with a cold/warm split,
and either declare noise with spreads recorded or stage-split the cost.

Protocol (matches the r11 hierarchy investigation): one fresh
SparkSession, Arrow-worker warmup, then per leg 1 cold + 5 warm reps;
report cold, warm median, warm min/max. Run the whole script N times
(fresh JVM each) for cross-session spread.

Usage: python tools/pq_wobble.py [sf_dir]  -> one JSON line on stdout.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from external_benchmarks_spark.session import get_spark

import __spark_entry__ as entry_mod

LEGS = ["quant_dot_topk", "pq_topk", "ivfpq_topk", "dedup_keep_best"]


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark("pq-wobble")
    spark.range(1).count()
    q = entry_mod.queries()
    # Arrow python-worker warmup on an unrelated leg so the cold numbers
    # below price the PLAN, not worker-process startup.
    q["l2_norm"](spark, sf).count()

    out: dict[str, dict[str, float]] = {}
    for name in LEGS:
        reps = []
        for _ in range(6):
            t0 = time.perf_counter()
            q[name](spark, sf).count()
            reps.append(time.perf_counter() - t0)
        warm = sorted(reps[1:])
        out[name] = {
            "cold": round(reps[0], 3),
            "median": round(warm[len(warm) // 2], 3),
            "min": round(warm[0], 3),
            "max": round(warm[-1], 3),
        }
        print(f"# {name}: {out[name]}", file=sys.stderr)
    print(json.dumps({"sf": sf, "legs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
