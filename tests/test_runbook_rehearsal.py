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


# ---------------------------------------------------------------------------
# Oracle-leg rehearsal (round-4 verdict item 5): record_oracle.py had
# never executed anywhere (needs an onnxruntime wheel). The fake-ORT shim
# (tests/_fake_ort/onnxruntime.py — the engine playing the oracle) drives
# the full record → .npz → env gate → parity-compare path end to end.
# ---------------------------------------------------------------------------

FAKE_ORT_DIR = os.path.join(REPO, "tests", "_fake_ort")


def _record_env():
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env["PYTHONPATH"] = os.pathsep.join(
        [FAKE_ORT_DIR, REPO] + ([env["PYTHONPATH"]] if env.get("PYTHONPATH") else [])
    )
    return env


def test_oracle_record_and_compare_rehearsal(tmp_path):
    """record_oracle.py runs against the shim, brands the .npz as
    rehearsal-sourced, and the oracle-parity tier consumes it (PASSES,
    not skips)."""
    from birdnet_tpu.models import birdnet_v24

    model = tmp_path / "v24_tiny.onnx"
    birdnet_v24.save_tiny(model, num_species=12)
    labels = tmp_path / "labels.txt"
    labels.write_text("\n".join(f"sp_{i}" for i in range(12)))
    oracle = tmp_path / "v24_oracle.npz"

    rec = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "record_oracle.py"),
         "--model", str(model), "--out", str(oracle), "--n", "2"],
        capture_output=True, text=True, env=_record_env(), cwd=REPO,
        timeout=600,
    )
    assert rec.returncode == 0, rec.stderr[-2000:]
    assert "REHEARSAL shim" in rec.stderr  # loud non-independence warning
    assert oracle.exists()

    import numpy as np

    data = np.load(oracle)
    assert str(data["oracle_source"]) == "birdnet_tpu-fake-ort"
    assert data["inputs"].shape == (2, 144_000)
    assert data["logits"].shape == (2, 12)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.update(
        BIRDNET_V24_MODEL=str(model),
        BIRDNET_V24_LABELS=str(labels),
        BIRDNET_V24_ORACLE=str(oracle),
    )
    cmp_proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_real_models.py::test_real_v24_oracle_parity",
         "-q", "-W", "ignore::DeprecationWarning"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert cmp_proc.returncode == 0, (
        cmp_proc.stdout[-2000:] + cmp_proc.stderr[-1000:]
    )
    assert "1 passed" in cmp_proc.stdout, cmp_proc.stdout[-1000:]
    assert "skipped" not in cmp_proc.stdout.splitlines()[-1]


def test_oracle_rehearsal_detects_divergence(tmp_path):
    """The compare tier must FAIL on a corrupted oracle — proving the
    gate has teeth, not just a green path."""
    from birdnet_tpu.models import birdnet_v24

    model = tmp_path / "v24_tiny.onnx"
    birdnet_v24.save_tiny(model, num_species=12)
    labels = tmp_path / "labels.txt"
    labels.write_text("\n".join(f"sp_{i}" for i in range(12)))
    oracle = tmp_path / "v24_oracle.npz"

    rec = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "record_oracle.py"),
         "--model", str(model), "--out", str(oracle), "--n", "2"],
        capture_output=True, text=True, env=_record_env(), cwd=REPO,
        timeout=600,
    )
    assert rec.returncode == 0, rec.stderr[-2000:]

    import numpy as np

    data = dict(np.load(oracle))
    data["logits"] = data["logits"] + 0.01  # beyond the 1e-4 gate
    np.savez_compressed(oracle, **data)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.update(
        BIRDNET_V24_MODEL=str(model),
        BIRDNET_V24_LABELS=str(labels),
        BIRDNET_V24_ORACLE=str(oracle),
    )
    cmp_proc = subprocess.run(
        [sys.executable, "-m", "pytest",
         "tests/test_real_models.py::test_real_v24_oracle_parity", "-q"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=900,
    )
    assert cmp_proc.returncode != 0
    assert "1 failed" in cmp_proc.stdout
