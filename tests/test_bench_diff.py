"""The bench regression gate must flag real slowdowns and exit nonzero —
this is the CI-side guard for VERDICT r4 task 8 (mechanical surfacing of
round-over-round bench regressions). No Spark involved: pure logic tests
over synthetic payloads, plus a subprocess check of the exit-code contract."""

from __future__ import annotations

import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.bench_diff import NOISE_FLOOR_SEC, diff, load_bench

OLD = {"value": 2.0, "queries": {"q1": 1.0, "q2": 0.1, "q3": 0.9}}


def test_flags_regression_over_threshold():
    new = {"value": 2.6, "queries": {"q1": 1.6, "q2": 0.1, "q3": 0.9}}
    regs = diff(OLD, new, 1.5)
    assert len(regs) == 1 and regs[0].startswith("q1:")


def test_noise_floor_suppresses_tiny_queries():
    # q2 triples but stays under the 0.3s floor: local[32] job-launch noise
    new = {"value": 2.2, "queries": {"q1": 1.0, "q2": 0.29, "q3": 0.9}}
    assert diff(OLD, new, 1.5) == []
    assert NOISE_FLOOR_SEC == 0.3


def test_missing_query_is_a_regression():
    new = {"value": 1.1, "queries": {"q1": 1.0, "q2": 0.1}}
    regs = diff(OLD, new, 1.5)
    assert any("q3" in r and "missing" in r for r in regs)


def test_new_queries_are_not_regressions():
    new = {"value": 2.0, "queries": dict(OLD["queries"], q_new=5.0)}
    assert diff(OLD, new, 1.5) == []


def test_load_bench_unwraps_driver_format(tmp_path):
    raw = tmp_path / "raw.json"
    raw.write_text(json.dumps(OLD))
    wrapped = tmp_path / "wrapped.json"
    wrapped.write_text(json.dumps({"n": 1, "rc": 0, "parsed": OLD}))
    assert load_bench(str(raw)) == load_bench(str(wrapped)) == OLD


def test_exit_code_contract(tmp_path):
    """The driver relies on the process exit code: 0 clean, 1 on regression."""
    old = tmp_path / "old.json"
    old.write_text(json.dumps(OLD))
    slow = tmp_path / "slow.json"
    slow.write_text(
        json.dumps({"value": 9.0, "queries": dict(OLD["queries"], q1=8.0)})
    )
    tool = os.path.join(os.path.dirname(__file__), "..", "tools", "bench_diff.py")
    ok = subprocess.run(
        [sys.executable, tool, str(old), str(old)], capture_output=True
    )
    assert ok.returncode == 0
    bad = subprocess.run(
        [sys.executable, tool, str(old), str(slow)], capture_output=True
    )
    assert bad.returncode == 1
    assert b"q1" in bad.stderr
