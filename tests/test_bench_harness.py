"""Unit tests for bench.py's stall-defense machinery (host-only, no TPU).

The round-4 driver bench recorded value 0.0 because the whole 600 s budget
sat inside one first warm call (docs/PERF.md "executable warm-up anatomy").
These tests pin the defensive properties: stages run under deadlines, late
completions still bank, banking keeps the max, and a zeroed emit surfaces
the committed last-good snapshot.
"""

import importlib
import json
import sys
import threading
import time

import pytest


@pytest.fixture()
def bench(monkeypatch, tmp_path):
    sys.path.insert(0, "/root/repo")
    b = importlib.import_module("bench")
    importlib.reload(b)                       # fresh RESULT/_EMITTED state
    monkeypatch.setattr(b, "BUDGET_S", 10_000.0)
    monkeypatch.setattr(b, "T_START", time.time())
    monkeypatch.setattr(b, "LAST_GOOD_PATH", str(tmp_path / "last_good.json"))
    return b


def test_run_staged_completes_fast_stage(bench):
    hit = []
    assert bench.run_staged("fast", lambda: hit.append(1), deadline_s=30)
    assert hit == [1]


def test_run_staged_deadline_moves_on_and_banks_late(bench):
    gate = threading.Event()

    def slow_stage():
        gate.wait(timeout=30)
        bench.bank("late", primary_tps=123.0, late_metric=1)

    t0 = time.time()
    assert not bench.run_staged("slow", slow_stage, deadline_s=1.5)
    assert time.time() - t0 < 10  # moved on at the deadline, not at completion
    assert bench.RESULT["value"] == 0.0
    gate.set()                                 # the stage now finishes...
    for _ in range(100):
        if bench.RESULT["value"]:
            break
        time.sleep(0.05)
    assert bench.RESULT["value"] == 123.0      # ...and its bank still counted
    assert "late" in bench.RESULT["detail"]["stages_completed"]


def test_run_staged_reports_stage_exception(bench):
    def boom():
        raise RuntimeError("nope")

    assert not bench.run_staged("boom", boom, deadline_s=10)


def test_bank_keeps_max_primary(bench):
    bench.bank("a", primary_tps=10.0)
    bench.bank("b", primary_tps=5.0)
    assert bench.RESULT["value"] == 10.0
    bench.bank("c", primary_tps=20.0)
    assert bench.RESULT["value"] == 20.0


def test_emit_zero_value_surfaces_last_good(bench, capsys):
    json.dump({"when": "yesterday", "result": {"value": 999.0}},
              open(bench.LAST_GOOD_PATH, "w"))
    bench.emit(tag="budget_exceeded")
    out = json.loads(capsys.readouterr().out.strip())
    assert out["value"] == 0.0                 # honest: nothing live measured
    assert out["detail"]["last_good_tpu_run_not_live"]["result"]["value"] == 999.0


def test_emit_writes_last_good_on_tpu_success(bench, capsys):
    bench.bank("init", backend="tpu")
    bench.bank("x", primary_tps=50.0)
    bench.emit(tag="complete")
    capsys.readouterr()
    saved = json.load(open(bench.LAST_GOOD_PATH))
    assert saved["result"]["value"] == 50.0
