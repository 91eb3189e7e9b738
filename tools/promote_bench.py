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

Gate 3 (r15, the stall-block detector the three r14 runs motivate):
every r14 window failed on a DIFFERENT contiguous run-order block of
legs reading 3-26x while its other 110+ legs were clean — CPU/IO
stall phases cover consecutive legs, plan regressions don't travel in
run-order packs. For each leg the detector computes this run's value
over the cross-run BEST (min over all BENCH_runs/ windows, the
one-sided stall rule); a contiguous block of >= --stall-block-len
(default 3) legs each reading > --stall-ratio (default 3.0) x its
cross-run best fails the gate and is printed leg by leg.

--composite (r15) promotes a per-leg best-of-runs composite instead of
one window: each queries[] cell takes its MIN across all runs in
BENCH_runs/, non-leg cells come from the cleanest single run (lowest
control-trio ratio vs baseline), and the stamp records per-leg source
runs plus composite: true — the honest record when no single clean
window exists all day (r14: four attempts, every one stalled on a
different block). Composite promotions update BENCH_controls.json
only if their control trio passes the ratio gate.

Usage:
  python tools/promote_bench.py            # latest run in BENCH_runs/
  python tools/promote_bench.py RUN.json   # a specific run file
  python tools/promote_bench.py --composite  # per-leg best across runs
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


def all_runs() -> list[tuple[str, dict]]:
    out = []
    for p in sorted(glob.glob(os.path.join(RUNS, "BENCH_*.json"))):
        try:
            with open(p) as fh:
                out.append((os.path.basename(p), json.load(fh)))
        except (OSError, json.JSONDecodeError):
            pass
    return out


def cross_run_best(runs: list[tuple[str, dict]]) -> dict[str, tuple[float, str]]:
    """Per-leg (min_value, source_run) across every recorded window —
    the one-sided stall rule applied across runs."""
    best: dict[str, tuple[float, str]] = {}
    for name, run in runs:
        for leg, v in (run.get("queries") or {}).items():
            if isinstance(v, (int, float)) and (
                leg not in best or v < best[leg][0]
            ):
                best[leg] = (float(v), name)
    return best


def stall_blocks(
    run: dict,
    best: dict[str, tuple[float, str]],
    ratio: float,
    min_len: int,
) -> list[list[tuple[str, float]]]:
    """Contiguous run-order blocks of legs reading > ratio x their
    cross-run best (the pool must exclude this run — a uniformly
    stalled run can't vouch for itself). Legs absent from the pool
    (new this round) can't be judged and break a block like a clean
    leg does."""
    blocks, cur = [], []
    for leg, v in (run.get("queries") or {}).items():
        if not isinstance(v, (int, float)) or leg not in best:
            continue
        b, _src = best[leg]
        if b > 0 and v / b > ratio:
            cur.append((leg, round(v / b, 2)))
        else:
            if len(cur) >= min_len:
                blocks.append(cur)
            cur = []
    if len(cur) >= min_len:
        blocks.append(cur)
    return blocks


def check_stall_blocks(
    run: dict, run_name: str, ratio: float, min_len: int
) -> list[tuple[str, str]]:
    """Gate 3 findings: stall blocks in this run vs the OTHER runs'
    per-leg bests (this run's own values excluded from the pool so a
    uniformly-stalled run can't vouch for itself)."""
    others = [(n, r) for n, r in all_runs() if n != run_name]
    if not others:
        return [("ok", "stall-block gate: no other runs to compare against")]
    best = cross_run_best(others)
    blocks = stall_blocks(run, best, ratio, min_len)
    if not blocks:
        return [("ok", f"no contiguous >{ratio}x-vs-cross-run-best block")]
    return [
        (
            "FAIL",
            "stall block: "
            + ", ".join(f"{leg} {r}x" for leg, r in blk),
        )
        for blk in blocks
    ]


def build_composite(
    runs: list[tuple[str, dict]], baseline: dict | None
) -> tuple[dict, dict]:
    """Per-leg best-of-runs composite. Base = the run with the lowest
    control-trio ratio vs baseline (ties: latest); every scalar leg
    then takes its cross-run min. Returns (composite, stamp_extra)."""
    def trio_ratio(run: dict) -> float:
        if not baseline:
            return float("inf")
        rq, bq = run.get("queries") or {}, baseline.get("queries") or {}
        rs = [
            rq[l] / bq[l]
            for l in CONTROL_LEGS
            if isinstance(rq.get(l), (int, float)) and bq.get(l)
        ]
        return sum(rs) / len(rs) if rs else float("inf")

    def spread_ok(run: dict) -> bool:
        hc = run.get("host_control") or {}
        s = hc.get("spread")
        return isinstance(s, (int, float)) and s <= 1.5

    # Base = latest run at the best control-trio ratio AMONG runs whose
    # own host_control spread passes the gate the base will be judged
    # by (r15: the selector used to pick a spread-failing run — best
    # trio of the day but one wobbled probe rep — and then refuse the
    # whole composite on that base's spread while a compliant base
    # existed; the base only contributes non-leg cells and the
    # host_control stamp, the legs are cross-run mins either way).
    # Falls back to all runs if none passes, so the gate still fires.
    pool = [(n, r) for n, r in runs if spread_ok(r)] or runs
    best_ratio = min(trio_ratio(r) for _, r in pool)
    base_name, base = next(
        (n, r) for n, r in reversed(pool) if trio_ratio(r) == best_ratio
    )
    comp = json.loads(json.dumps(base))  # deep copy
    best = cross_run_best(runs)
    sources: dict[str, str] = {}
    q = comp.get("queries") or {}
    for leg, v in list(q.items()):
        if isinstance(v, (int, float)) and leg in best:
            q[leg] = best[leg][0]
            sources[leg] = best[leg][1]
    comp["value"] = round(
        sum(v for v in q.values() if isinstance(v, (int, float))), 3
    )
    return comp, {
        "composite": True,
        "base_run": base_name,
        "n_runs": len(runs),
        "leg_sources": sources,
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("run", nargs="?", help="run file (default: latest)")
    ap.add_argument("--force", action="store_true")
    ap.add_argument("--composite", action="store_true")
    ap.add_argument("--max-control-ratio", type=float, default=1.2)
    ap.add_argument("--max-spread", type=float, default=1.5)
    ap.add_argument("--stall-ratio", type=float, default=3.0)
    ap.add_argument("--stall-block-len", type=int, default=3)
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

    stamp_extra: dict = {}
    if args.composite:
        runs = all_runs()
        if not runs:
            print("no runs in BENCH_runs/ to composite")
            return 2
        run, stamp_extra = build_composite(runs, baseline)
        run_path = os.path.join(RUNS, stamp_extra["base_run"])
        print(
            f"[--] composite over {stamp_extra['n_runs']} runs, "
            f"base {stamp_extra['base_run']}"
        )

    ok, findings = check_gates(
        run, baseline, args.max_control_ratio, args.max_spread
    )
    if not args.composite:
        findings += check_stall_blocks(
            run, os.path.basename(run_path),
            args.stall_ratio, args.stall_block_len,
        )
    for tag, msg in findings:
        print(f"[{tag}] {msg}")
    ok = all(t != "FAIL" for t, _ in findings)
    if not ok and not args.force:
        print(
            "\nREFUSED: window is dirty — re-run bench.py on an idle box, "
            "promote a per-leg best with --composite, or --force (which "
            "stamps the record as forced)."
        )
        return 1

    run["_promotion"] = {
        "from": os.path.basename(run_path),
        "forced": bool(not ok and args.force),
        "gates": [f"{t}: {m}" for t, m in findings],
        **stamp_extra,
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
