"""Multi-host (DCN) serving tier tests.

``shard_files`` logic is pure; the end-to-end test launches two real
coordinated processes (jax.distributed on the CPU backend) that split
three recordings, analyze them, and all-gather the merged results — the
same control flow a TPU pod front tier runs over DCN.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from birdnet_tpu.parallel import shard_files
from birdnet_tpu.utils.audio_io import write_wav


def test_shard_files_partition():
    files = [f"f{i}.wav" for i in range(7)]
    shards = [shard_files(files, r, 3) for r in range(3)]
    # disjoint and complete
    flat = [f for s in shards for f in s]
    assert sorted(flat) == sorted(files)
    assert len(set(flat)) == len(files)
    assert shard_files(files, 0, 1) == files


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_distributed_analysis(tmp_path):
    from birdnet_tpu.models import birdnet_v24

    model = tmp_path / "v24_tiny.onnx"
    birdnet_v24.save_tiny(model, num_species=10)
    labels = tmp_path / "labels.txt"
    labels.write_text("\n".join(f"sp_{i}" for i in range(10)), encoding="utf-8")

    rng = np.random.default_rng(0)
    wavs = []
    for i in range(3):
        w = tmp_path / f"rec{i}.wav"
        sig = (0.3 * np.sin(2 * np.pi * (500 + 300 * i) *
                            np.arange(48_000 * 3) / 48_000)).astype(np.float32)
        sig += (0.02 * rng.normal(size=sig.shape)).astype(np.float32)
        write_wav(w, sig.astype(np.float32), 48_000)
        wavs.append(str(w))

    port = _free_port()
    out = tmp_path / "results.json"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # no virtual device mesh in the workers
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "tests._multihost_worker",
                f"127.0.0.1:{port}", "2", str(rank),
                str(model), str(labels), str(out), *wavs,
            ],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            cwd=repo,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-2000:]

    results = []
    for rank in range(2):
        with open(f"{out}.{rank}", encoding="utf-8") as f:
            results.append(json.load(f))
    # both processes hold the SAME merged map covering every file
    assert results[0] == results[1]
    assert sorted(results[0]) == sorted(wavs)
    for path, dets in results[0].items():
        assert len(dets) == 1  # 3 s recording at 3 s segments → one segment
        # each entry: [start_s, [(species, conf) x3]]
        for t, preds in dets:
            assert len(preds) == 3
            assert all(p[0].startswith("sp_") for p in preds)


def test_cli_distributed_two_processes(tmp_path):
    """Two CLI processes with --coordinator split the files and both finish."""
    from birdnet_tpu.models import birdnet_v24

    model = tmp_path / "m.onnx"
    birdnet_v24.save_tiny(model, num_species=10)
    labels = tmp_path / "labels.txt"
    labels.write_text("\n".join(f"sp_{i}" for i in range(10)), encoding="utf-8")
    wavs = []
    for i in range(3):
        w = tmp_path / f"r{i}.wav"
        sig = (0.3 * np.sin(2 * np.pi * (400 + 200 * i) *
                            np.arange(48_000 * 3) / 48_000)).astype(np.float32)
        write_wav(w, sig, 48_000)
        wavs.append(str(w))

    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    csv = tmp_path / "out.csv"
    procs = [
        subprocess.Popen(
            [
                sys.executable, "-m", "birdnet_tpu.cli", *wavs,
                "-m", str(model), "-l", str(labels),
                "--provider", "cpu", "--min-confidence", "0.0", "-t", "0",
                "--csv", str(csv),
                "--coordinator", f"127.0.0.1:{port}",
                "--num-processes", "2", "--process-id", str(rank),
            ],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, cwd=repo,
        )
        for rank in range(2)
    ]
    outs = [p.communicate(timeout=600) for p in procs]
    for p, (so, se) in zip(procs, outs):
        assert p.returncode == 0, se.decode()[-1500:]
    # rank 0 got files 0 and 2; rank 1 got file 1
    assert b"analyzing 2 file(s)" in outs[0][1]
    assert b"analyzing 1 file(s)" in outs[1][1]
    # per-process CSV shards both exist and cover all three files
    import csv as _csv

    rows = []
    for rank in range(2):
        with open(f"{csv}.{rank}", encoding="utf-8") as f:
            rows += list(_csv.reader(f))[1:]
    files_seen = {r[0] for r in rows}
    assert files_seen == set(wavs)
