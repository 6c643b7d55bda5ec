"""The bench's self-limiting machinery (bench.py): the driver parses the
single JSON line from a run bounded by an external timeout, so the budget
gating, emit-once semantics, and watchdog backstop are load-bearing."""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    """Load bench.py with an effectively infinite budget: each load spawns
    the module's watchdog thread, and an un-emitted instance with the
    default budget would os._exit the whole pytest process once it fires."""
    import importlib.util

    old = os.environ.get("BENCH_BUDGET_S")
    os.environ["BENCH_BUDGET_S"] = "1e9"
    try:
        spec = importlib.util.spec_from_file_location(
            "bench_under_test", os.path.join(REPO, "bench.py"))
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        if old is None:
            os.environ.pop("BENCH_BUDGET_S", None)
        else:
            os.environ["BENCH_BUDGET_S"] = old
    return mod


def test_stage_gate_records_skips(monkeypatch):
    bench = _load_bench()
    extra = {}
    monkeypatch.setattr(bench, "remaining", lambda: 50.0)
    assert bench.stage_gate(extra, "cheap", 40.0) is True
    assert bench.stage_gate(extra, "expensive", 200.0) is False
    skips = extra["skipped_budget"]
    assert len(skips) == 1 and skips[0]["stage"] == "expensive"
    assert skips[0]["est_s"] == 200.0


def test_emit_exactly_once(capsys):
    bench = _load_bench()
    bench.RESULT.update({"metric": "m", "value": 1})
    bench.emit(tag="first")
    bench.emit(tag="second")  # must be a no-op
    out = capsys.readouterr().out.strip().splitlines()
    assert len(out) == 1
    d = json.loads(out[0])
    assert d["extra"]["emitted_by"] == "first"
    assert "bench_wall_s" in d["extra"]


def test_emit_without_result_is_silent(capsys):
    bench = _load_bench()
    bench.emit()  # RESULT empty -> nothing printed, flag not consumed
    assert capsys.readouterr().out == ""
    bench.RESULT.update({"metric": "m", "value": 2})
    bench.emit(tag="later")
    assert json.loads(capsys.readouterr().out)["value"] == 2


@pytest.mark.slow
def test_watchdog_emits_partial_on_overrun():
    """A stage that overruns the budget must still yield ONE parsed JSON
    line (the round-4 failure mode was rc=124 with no output at all)."""
    code = """
import os, sys, time
os.environ["BENCH_BUDGET_S"] = "1"
os.environ["BENCH_WATCHDOG_GRACE_S"] = "1"
sys.path.insert(0, %r)
import importlib.util
spec = importlib.util.spec_from_file_location("b", os.path.join(%r, "bench.py"))
b = importlib.util.module_from_spec(spec)
spec.loader.exec_module(b)
b.RESULT.update({"metric": "partial", "value": 7, "extra": {}})
b.start_watchdog()
time.sleep(30)  # a hung stage; the watchdog must fire and exit
print("UNREACHABLE")
"""
    r = subprocess.run(
        [sys.executable, "-c", code % (REPO, REPO)],
        capture_output=True, text=True, timeout=25,
        env={**os.environ, "JAX_PLATFORMS": "cpu"})
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    assert len(lines) == 1, r.stdout + r.stderr
    d = json.loads(lines[0])
    assert d["value"] == 7
    assert d["extra"]["emitted_by"] == "watchdog"
    assert "UNREACHABLE" not in r.stdout
