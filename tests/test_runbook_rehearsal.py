"""Real-weights day-one runbook (scripts/adjudicate_real_models.sh).

The official weight files have never been obtainable in this environment
(reference checkout strips them, /root/reference/.MISSING_LARGE_BLOBS; no
network). The runbook is the ONE command to run the moment they are; the
rehearsal mode proves the harness itself against full-class-count
TF-dialect random-weight stand-ins, so day one is a parameter change, not
a debugging session.

The full rehearsal (~minutes: generates a 14,795-class Perch stand-in and
runs the real-model pytest tier on it) is env-gated as a slow test; a
light tier always validates the script's plumbing.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "adjudicate_real_models.sh")


def test_script_exists_executable_and_parses():
    assert os.path.exists(SCRIPT)
    assert os.access(SCRIPT, os.X_OK)
    subprocess.run(["bash", "-n", SCRIPT], check=True)


def test_script_requires_env_or_rehearse():
    env = {
        k: v for k, v in os.environ.items()
        if not k.startswith(("BIRDNET_", "PERCH_"))
    }
    proc = subprocess.run(
        ["bash", SCRIPT], capture_output=True, text=True, env=env, cwd=REPO,
        timeout=60,
    )
    assert proc.returncode == 2
    assert "no *_MODEL env vars set" in proc.stderr
    assert "--rehearse" in proc.stderr


def test_script_rejects_unknown_flag():
    proc = subprocess.run(
        ["bash", SCRIPT, "--bogus"], capture_output=True, text=True,
        cwd=REPO, timeout=60,
    )
    assert proc.returncode == 2
    assert "usage:" in proc.stderr


def test_full_rehearsal():
    """The whole runbook against generated stand-ins (slow: gated).

    BIRDNET_TEST_SLOW=1 python -m pytest tests/test_runbook_rehearsal.py
    """
    if not os.environ.get("BIRDNET_TEST_SLOW"):
        pytest.skip("set BIRDNET_TEST_SLOW=1 to run the full rehearsal")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        ["bash", SCRIPT, "--rehearse", "--no-bench"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    sys.stdout.write(proc.stdout[-4000:])
    sys.stderr.write(proc.stderr[-4000:])
    assert proc.returncode == 0
    assert "adjudication complete" in proc.stdout
    assert "step 1/3" in proc.stdout
    assert "step 2/3" in proc.stdout
