#!/usr/bin/env python
"""Control-gated promotion of a bench run to the committed record.

bench.py writes every run to BENCH_runs/BENCH_<ts>.json (gitignored);
BENCH_full.json — the artifact cross-round comparisons consume — only
changes through THIS script, which refuses to promote a run taken in a
dirty host window (r12 verdict #1: the committed r12 record encoded a
1.47x host stall that the round's own forensics had already attributed
to the box; r12 #3: the driver's post-HEAD re-run silently replaced the
record with an even worse window).

Gates, computed against a CLEAN baseline — BENCH_controls.json when it
exists (written on every clean promotion; survives a forced record),
else the committed BENCH_full.json PROVIDED it was not itself forced:
  1. host_control: the run's fixed-work pure-JVM probe (bench.py leg 0)
     must read <= --max-control-ratio (default 1.2) x the baseline's
     median, and its own warm spread must be <= --max-spread
     (default 1.5). A fixed-work JVM sum cannot reflect a plan change;
     if it moved, the window is dirty.
  2. control trio: join_agg / tpch_q1 / global_topk (numeric-codegen
     legs, stable across 12 rounds) must each read <= the same ratio.

A baseline without host_control (pre-r13) skips gate 1's ratio but
still enforces the run's own spread. If the committed record carries
_promotion.forced and no BENCH_controls.json exists, ratio gating is
REFUSED rather than baselined on the stalled record (r13 ADVICE: a
single --force must not loosen future gates by the stall factor).
--force overrides all gates and records that it did (forced: true in
the promoted file's _promotion stamp) so a forced promotion can't
masquerade as a clean one; a forced promotion never updates
BENCH_controls.json.

Usage:
  python tools/promote_bench.py            # latest run in BENCH_runs/
  python tools/promote_bench.py RUN.json   # a specific run file
  python tools/promote_bench.py --force    # promote despite gate failure
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RECORD = os.path.join(REPO, "BENCH_full.json")
CONTROLS = os.path.join(REPO, "BENCH_controls.json")
RUNS = os.path.join(REPO, "BENCH_runs")
CONTROL_LEGS = ("join_agg", "tpch_q1", "global_topk")


def gate_baseline(record: dict, controls: dict | None):
    """Pick what the ratio gates compare against.

    Returns (baseline_dict_or_None, note). A forced record is never a
    baseline: it encodes the very stall the gate exists to refuse, so
    baselining on it would let an equally-stalled future run pass
    trivially (r13 ADVICE, tools/promote_bench.py finding)."""
    if controls:
        return controls, "baseline: BENCH_controls.json (last clean promotion)"
    if (record.get("_promotion") or {}).get("forced"):
        return None, (
            "committed record is forced and no BENCH_controls.json exists"
        )
    return record, "baseline: committed BENCH_full.json"


def latest_run() -> str | None:
    runs = sorted(glob.glob(os.path.join(RUNS, "BENCH_*.json")))
    return runs[-1] if runs else None


def check_gates(
    run: dict, baseline: dict | None, max_ratio: float, max_spread: float
):
    """Returns (ok, findings): every gate evaluated, not fail-fast, so
    a refusal names everything wrong with the window at once.

    baseline is the CLEAN comparison point (see gate_baseline); None
    means no clean baseline exists — ratio gates refuse outright."""
    findings = []
    hc = run.get("host_control") or {}
    spread = hc.get("spread")
    if spread is None:
        findings.append(("FAIL", "run has no host_control probe"))
    elif spread > max_spread:
        findings.append(
            ("FAIL", f"host_control warm spread {spread} > {max_spread}")
        )
    else:
        findings.append(("ok", f"host_control spread {spread}"))
    if baseline is None:
        findings.append((
            "FAIL",
            "no clean baseline for ratio gates (committed record is "
            "forced) — re-baseline by promoting a clean run with --force "
            "after an idle-box probe, or seed BENCH_controls.json",
        ))
        return False, findings
    prev_hc = (baseline.get("host_control") or {}).get("median")
    if prev_hc and hc.get("median"):
        r = hc["median"] / prev_hc
        tag = "ok" if r <= max_ratio else "FAIL"
        findings.append(
            (tag, f"host_control median ratio {r:.2f}x vs baseline")
        )
    elif hc.get("median"):
        findings.append(
            ("ok", "baseline has no host_control: ratio gate skipped")
        )
    run_q = run.get("queries") or {}
    rec_q = baseline.get("queries") or {}
    for leg in CONTROL_LEGS:
        a, b = run_q.get(leg), rec_q.get(leg)
        if not a or not b:
            findings.append(
                ("ok", f"{leg}: missing in run or baseline, skipped")
            )
            continue
        r = a / b
        tag = "ok" if r <= max_ratio else "FAIL"
        findings.append((tag, f"{leg} {b}s -> {a}s ({r:.2f}x)"))
    return all(t != "FAIL" for t, _ in findings), findings


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("run", nargs="?", help="run file (default: latest)")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--max-control-ratio", type=float, default=1.2)
    ap.add_argument("--max-spread", type=float, default=1.5)
    args = ap.parse_args()

    run_path = args.run or latest_run()
    if not run_path or not os.path.exists(run_path):
        print(f"no run file found ({run_path or RUNS + '/BENCH_*.json'})")
        return 2
    with open(run_path) as fh:
        run = json.load(fh)
    record = {}
    if os.path.exists(RECORD):
        with open(RECORD) as fh:
            record = json.load(fh)
    controls = None
    if os.path.exists(CONTROLS):
        with open(CONTROLS) as fh:
            controls = json.load(fh)

    baseline, note = gate_baseline(record, controls)
    print(f"[--] {note}")
    ok, findings = check_gates(
        run, baseline, args.max_control_ratio, args.max_spread
    )
    for tag, msg in findings:
        print(f"[{tag}] {msg}")
    if not ok and not args.force:
        print(
            "\nREFUSED: window is dirty — re-run bench.py on an idle box "
            "(or --force, which stamps the record as forced)."
        )
        return 1

    run["_promotion"] = {
        "from": os.path.basename(run_path),
        "forced": bool(not ok and args.force),
        "gates": [f"{t}: {m}" for t, m in findings],
    }
    tmp = RECORD + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(run, fh, indent=1, sort_keys=True)
        fh.write("\n")
    os.replace(tmp, RECORD)
    if not run["_promotion"]["forced"]:
        # a CLEAN promotion refreshes the durable gate baseline, so a
        # later forced record can never loosen future gates
        run_q = run.get("queries") or {}
        ctrl = {
            "source": os.path.basename(run_path),
            "host_control": run.get("host_control"),
            "queries": {k: run_q.get(k) for k in CONTROL_LEGS},
        }
        tmp = CONTROLS + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(ctrl, fh, indent=1, sort_keys=True)
            fh.write("\n")
        os.replace(tmp, CONTROLS)
        print("updated BENCH_controls.json (clean-gate baseline)")
    print(f"\npromoted {os.path.basename(run_path)} -> BENCH_full.json"
          + (" (FORCED)" if run["_promotion"]["forced"] else ""))
    return 0


if __name__ == "__main__":
    sys.exit(main())
