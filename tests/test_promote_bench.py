"""Promotion gate for bench records (tools/promote_bench.py): the
committed BENCH_full.json may only be replaced by a run whose own
host-control probe and control-leg trio read clean against it — the
r12 lesson (a 1.47x host-stall record was committed, then silently
replaced by an even worse one) encoded as machinery."""

from __future__ import annotations

import importlib.util
import os

spec = importlib.util.spec_from_file_location(
    "promote_bench",
    os.path.join(os.path.dirname(__file__), "..", "tools", "promote_bench.py"),
)
pb = importlib.util.module_from_spec(spec)
spec.loader.exec_module(pb)


def _run(spread=1.1, median=0.1, join_agg=0.34, q1=0.31, topk=0.18):
    return {
        "host_control": {"spread": spread, "median": median},
        "queries": {"join_agg": join_agg, "tpch_q1": q1, "global_topk": topk},
    }


RECORD = _run()


def test_clean_window_promotes():
    ok, findings = pb.check_gates(_run(), RECORD, 1.2, 1.5)
    assert ok, findings


def test_high_spread_refuses():
    ok, findings = pb.check_gates(_run(spread=1.93), RECORD, 1.2, 1.5)
    assert not ok
    assert any("spread" in m for t, m in findings if t == "FAIL")


def test_slow_controls_refuse():
    # every control leg 2x the committed record: a stalled window even
    # if the probe happened to read clean at its instant
    ok, findings = pb.check_gates(
        _run(join_agg=0.76, q1=1.87, topk=0.42), RECORD, 1.2, 1.5
    )
    assert not ok
    fails = [m for t, m in findings if t == "FAIL"]
    assert len(fails) == 3, findings


def test_missing_probe_refuses():
    run = _run()
    del run["host_control"]
    ok, findings = pb.check_gates(run, RECORD, 1.2, 1.5)
    assert not ok


def test_pre_r13_record_skips_ratio_but_keeps_spread():
    # the current committed record predates host_control: the ratio
    # gate is unavailable, but the run's own spread still gates
    rec = {"queries": dict(RECORD["queries"])}
    ok, _ = pb.check_gates(_run(), rec, 1.2, 1.5)
    assert ok
    ok, _ = pb.check_gates(_run(spread=2.4), rec, 1.2, 1.5)
    assert not ok


def test_faster_run_promotes():
    # the gate is one-sided: a strictly faster clean run always clears
    ok, _ = pb.check_gates(
        _run(join_agg=0.2, q1=0.2, topk=0.1), RECORD, 1.2, 1.5
    )
    assert ok


def test_forced_record_is_never_the_baseline():
    # r13 ADVICE: a --force must not loosen future gates by the stall
    # factor. With no clean controls file, a forced record yields no
    # baseline at all; with one, the controls file wins.
    forced = dict(_run(join_agg=0.76, q1=1.87, topk=0.42))
    forced["_promotion"] = {"forced": True}
    baseline, note = pb.gate_baseline(forced, None)
    assert baseline is None and "forced" in note
    controls = {"queries": dict(RECORD["queries"]), "host_control": None}
    baseline, note = pb.gate_baseline(forced, controls)
    assert baseline is controls


def test_clean_record_is_baseline_when_no_controls_file():
    baseline, _ = pb.gate_baseline(RECORD, None)
    assert baseline is RECORD


def test_no_baseline_refuses_ratio_gates():
    # a window that reads clean by its own spread still cannot promote
    # without a clean comparison point
    ok, findings = pb.check_gates(_run(), None, 1.2, 1.5)
    assert not ok
    assert any("no clean baseline" in m for t, m in findings if t == "FAIL")


def test_controls_file_gates_a_stalled_run_despite_forced_record():
    # the full r13 failure mode, end to end at the gate level: the
    # committed record is forced+stalled; a new equally-stalled run
    # must STILL refuse because the controls file holds clean values
    controls = {"queries": dict(RECORD["queries"]), "host_control": None}
    forced = dict(_run(join_agg=0.76, q1=1.87, topk=0.42))
    forced["_promotion"] = {"forced": True}
    baseline, _ = pb.gate_baseline(forced, controls)
    stalled = _run(join_agg=0.74, q1=1.80, topk=0.41)
    ok, findings = pb.check_gates(stalled, baseline, 1.2, 1.5)
    assert not ok
    assert sum(1 for t, _ in findings if t == "FAIL") == 3, findings
