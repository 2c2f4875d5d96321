"""bench.py watchdog evidence-channel contract (VERDICT r4 item 1).

The driver runs bench.py under its own timeout and parses the LAST JSON
line of stdout. BENCH_r04 was rc=124/parsed:null because the watchdog
held the fenced result while pipelined children ran and its internal
budgets summed past the driver's timeout. The contract now under test:

1. The fenced JSON line is printed the moment the fenced child succeeds,
   so a later kill can no longer erase the headline (a pipelined line
   printed afterwards supersedes it).
2. Every attempt is budgeted against a hard total-wall deadline
   (MMNN_BENCH_DEADLINE_SECS); attempts that don't fit are skipped.

Children are mocked — no JAX, no hardware.
"""

import json
import subprocess
import sys
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402

FENCED = {"metric": "m", "value": 600.0, "unit": "volumes/sec/chip",
          "vs_baseline": 420.0, "fenced_step_ms": 106.7}
PIPELINED = {"pipelined_step_ms": 81.5,
             "pipelined_volumes_per_sec_per_chip": 785.0,
             "fenced_step_ms": 114.0,
             "fenced_volumes_per_sec_per_chip": 561.0}


def _ok(payload):
    return types.SimpleNamespace(stdout=json.dumps(payload) + "\n",
                                 stderr="", returncode=0)


def _json_lines(out):
    return [json.loads(ln) for ln in out.splitlines() if ln.startswith("{")]


def test_fenced_line_survives_pipelined_stall(monkeypatch, capsys):
    """Every pipelined attempt times out -> the fenced headline, printed
    BEFORE the pipelined attempts started, is the last JSON line; rc=0."""
    calls = []

    def fake_run(cmd, env=None, timeout=None, **kw):
        calls.append(bool(env.get("MMNN_BENCH_PIPELINED")))
        if env.get("MMNN_BENCH_PIPELINED"):
            raise subprocess.TimeoutExpired(cmd, timeout)
        return _ok(FENCED)

    monkeypatch.setattr(subprocess, "run", fake_run)
    rc = bench._run_with_watchdog()
    out = capsys.readouterr().out
    lines = _json_lines(out)
    assert rc == 0
    assert calls == [False, True, True]  # fenced once, 2 pipelined retries
    assert lines[0]["value"] == 600.0  # printed before pipelined attempts
    assert lines[-1]["value"] == 600.0  # and stands as the parsed headline


def test_pipelined_upgrade_supersedes_fenced_line(monkeypatch, capsys):
    """When pipelined succeeds, the LAST JSON line carries its value while
    the earlier fenced line remains above it."""
    def fake_run(cmd, env=None, timeout=None, **kw):
        return _ok(PIPELINED if env.get("MMNN_BENCH_PIPELINED") else FENCED)

    monkeypatch.setattr(subprocess, "run", fake_run)
    rc = bench._run_with_watchdog()
    lines = _json_lines(capsys.readouterr().out)
    assert rc == 0
    assert lines[0]["value"] == 600.0
    assert lines[-1]["value"] == 785.0
    assert lines[-1]["unit"] == "volumes/sec/chip"
    assert lines[-1]["vs_baseline"] > 0


def test_pipelined_attempts_try_depth10_then_depth5(monkeypatch, capsys):
    """Attempt 1 chases the faster depth-10 chain (safe now that the
    fenced headline prints first); the retry falls back to the robust
    depth-5 chain. An operator-set MMNN_BENCH_SEG is respected."""
    segs = []

    def fake_run(cmd, env=None, timeout=None, **kw):
        if env.get("MMNN_BENCH_PIPELINED"):
            segs.append(env.get("MMNN_BENCH_SEG"))
            raise subprocess.TimeoutExpired(cmd, timeout)
        return _ok(FENCED)

    monkeypatch.setattr(subprocess, "run", fake_run)
    monkeypatch.delenv("MMNN_BENCH_SEG", raising=False)
    rc = bench._run_with_watchdog()
    assert rc == 0
    assert segs == ["10", "5"]
    assert _json_lines(capsys.readouterr().out)[-1]["value"] == 600.0

    segs.clear()
    monkeypatch.setenv("MMNN_BENCH_SEG", "3")
    rc = bench._run_with_watchdog()
    assert rc == 0
    assert segs == ["3", "3"]
    capsys.readouterr()


def test_wall_deadline_skips_pipelined(monkeypatch, capsys):
    """A fenced child that eats most of the wall budget leaves less than
    the 60 s attempt floor -> pipelined attempts are SKIPPED (no child
    spawned) and the already-printed fenced line stands."""
    clock = {"t": 0.0}
    calls = []

    def fake_run(cmd, env=None, timeout=None, **kw):
        calls.append(bool(env.get("MMNN_BENCH_PIPELINED")))
        clock["t"] += 50.0  # fenced child takes 50 of the 100 s budget
        return _ok(FENCED)

    monkeypatch.setenv("MMNN_BENCH_DEADLINE_SECS", "100")
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(subprocess, "run", fake_run)
    rc = bench._run_with_watchdog()
    cap = capsys.readouterr()
    lines = _json_lines(cap.out)
    assert rc == 0
    assert calls == [False]  # only the fenced child ran
    assert lines[-1]["value"] == 600.0
    assert "skipped, wall budget" in cap.err


def test_fenced_retry_budgets_respect_deadline(monkeypatch, capsys):
    """Fenced attempts that time out stop retrying once the wall budget
    is spent; rc=1 with no JSON output (the true no-evidence case)."""
    clock = {"t": 0.0}
    calls = []

    def fake_run(cmd, env=None, timeout=None, **kw):
        calls.append(timeout)
        clock["t"] += timeout  # child burns its whole budget then dies
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setenv("MMNN_BENCH_DEADLINE_SECS", "900")
    monkeypatch.setattr(bench.time, "monotonic", lambda: clock["t"])
    monkeypatch.setattr(subprocess, "run", fake_run)
    rc = bench._run_with_watchdog()
    cap = capsys.readouterr()
    assert rc == 1
    assert _json_lines(cap.out) == []
    # attempt 1 must NOT get the whole wall: ~320 s is reserved so a hung
    # first child (the relay pathology) leaves room for one warm retry.
    # attempt 1: min(1200, 900-320) = 580; attempt 2: min(600, 320) = 320;
    # budget then spent -> no attempt 3.
    assert calls == [580.0, 320.0]
    assert sum(calls) <= 900.0
