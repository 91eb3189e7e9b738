#!/usr/bin/env python
"""Leg-by-leg diff of two bench run records (BENCH_runs/*.json or the
committed BENCH_full.json). Prints legs sorted by absolute delta and a
ctrl-normalized summary so host-weather rounds read honestly.

Usage: python tools/bench_diff.py OLD.json NEW.json [--top N]
"""
from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()
    old = json.load(open(args.old))
    new = json.load(open(args.new))
    qo, qn = old["queries"], new["queries"]
    common = sorted(set(qo) & set(qn))
    added = sorted(set(qn) - set(qo))
    removed = sorted(set(qo) - set(qn))
    ho = (old.get("host_control") or {}).get("median")
    hn = (new.get("host_control") or {}).get("median")
    print(f"host_control median: {ho} -> {hn}")
    so = sum(qo[k] for k in common)
    sn = sum(qn[k] for k in common)
    print(f"common legs: {len(common)}  sum {so:.1f}s -> {sn:.1f}s "
          f"({sn / so:.3f}x)")
    if removed:
        print("REMOVED (contract violation if committed!):", removed)
    if added:
        print("added legs:", added)
    # Largest |delta| first so --top keeps the most interesting legs.
    rows = sorted(common, key=lambda k: -abs(qn[k] - qo[k]))
    print(f"\n{'leg':34s} {'old':>8s} {'new':>8s} {'delta':>8s} {'ratio':>6s}")
    shown = [k for k in rows if abs(qn[k] - qo[k]) >= 0.05][: args.top]
    for k in shown:
        d = qn[k] - qo[k]
        r = qn[k] / qo[k] if qo[k] else float("inf")
        print(f"{k:34s} {qo[k]:8.3f} {qn[k]:8.3f} {d:+8.3f} {r:6.2f}")


if __name__ == "__main__":
    main()
