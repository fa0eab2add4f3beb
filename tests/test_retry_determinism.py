"""Determinism under task retries — see tests/probes/retry_determinism_probe.py."""

from __future__ import annotations

import os
import subprocess
import sys


def test_deterministic_result_survives_task_retry():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    probe = os.path.join(repo, "tests", "probes", "retry_determinism_probe.py")
    env = dict(os.environ, PYTHONPATH=repo)
    out = subprocess.run(
        [sys.executable, probe], capture_output=True, text=True, timeout=240, env=env
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "RETRY_OK 97" in out.stdout
