"""Measured skew-guard resource bound (VERDICT r9 #1): the fuzz tests
prove the chunk guards OUTPUT-equal; this proves the RESOURCE claim with
real task metrics — on a single mega-bucket the guarded plan's worst task
writes <= ROWS_PER_TASK_BOUND * cap^2 pair records while the unguarded
expression concentrates the whole quadratic expansion in ONE task.

Runs tools/stress_skew.py (direct layer, small scale) in a SUBPROCESS:
the harness needs fresh SparkSessions with the event log enabled, and
getOrCreate inside this pytest process would silently reuse the shared
fixture session without it. The full-scale run is the committed
STRESS_r10.json artifact.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def test_skew_guard_bounds_max_task_rows(tmp_path):
    out = tmp_path / "stress.json"
    env = dict(
        os.environ,
        STRESS_N_BUCKET="512",
        STRESS_N_SIDE="256",
        STRESS_CAP="64",
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(repo, "tools/stress_skew.py"),
         str(out), "--direct-only"],
        env=env,
        capture_output=True,
        text=True,
        timeout=900,
        cwd=repo,
    )
    assert proc.returncode == 0, f"harness failed:\n{proc.stdout[-2000:]}\n{proc.stderr[-2000:]}"
    report = json.load(open(out))
    assert report["ok"], report["problems"]
    cap = report["cap"]
    for path, r in report["direct"].items():
        g, u = r["guarded"], r["unguarded"]
        # output equality: the guard changes distribution, never the answer
        assert (g["n_pairs"], g["checksum"]) == (u["n_pairs"], u["checksum"])
        # the bound: guarded worst task is cap^2-sized ...
        assert 0 < g["max_task_shuffle_write_records"] <= (
            report["rows_per_task_bound"] * cap * cap
        ), path
        # ... while the unguarded expression demonstrably skews (the whole
        # bucket's expansion transits one task)
        assert u["max_task_shuffle_write_records"] >= u["n_pairs"], path
        assert (
            u["max_task_shuffle_write_records"]
            >= 4 * g["max_task_shuffle_write_records"]
        ), path
