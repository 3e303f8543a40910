"""STFT-frontend fusion (compiler/fuse_frontend.py::fuse_stft_frontend)
+ its lowering + the segments_stft_melspec kernel oracle.

CPU tier: structural match (incl. MelWeightMatrix materialization),
fallback bit-equality, interpret-mode kernel parity, direct kernel vs
f64 numpy oracle (hardware timing runs via scripts/stft_frontend_sweep).
"""

import os

import numpy as np
import pytest

from birdnet_tpu.compiler.fuse_frontend import unfuse_frontend
from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.models import birdnet_v24


def _build():
    return birdnet_v24.build_model(
        num_species=10, width=0.1, depth=1, seed=0, frontend="stft"
    )


@pytest.fixture(scope="module")
def imported():
    return import_onnx(_build())


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(11)
    return (rng.normal(size=(2, birdnet_v24.SAMPLE_COUNT)) * 0.1).astype(
        np.float32
    )


def _run(imported, x, env=None, precision="fast"):
    old = {}
    env = env or {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        fwd = make_forward(imported, precision=precision)
        return np.asarray(fwd(imported.params, x)[0], np.float32)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_stft_frontend_fused_at_import(imported):
    fused = [
        n for n in imported.graph.node if n.op_type == "_FusedStftFrontend"
    ]
    assert len(fused) == 1
    node = fused[0]
    assert int(node.attrs["hop"]) == 280
    assert int(node.attrs["frame_length"]) == 1024
    assert abs(float(node.attrs["eps"]) - 1e-6) < 1e-12
    # STFT, ReduceSumSquare, MelWeightMatrix, MatMul, Add, Log,
    # Transpose, Unsqueeze — the mel producer moves into the body.
    assert len(node.attrs["body"].node) == 8
    # Window and mel ride as TENSOR attrs (host values for basis folding).
    win = node.attrs["window"].to_numpy()
    mel = node.attrs["mel"].to_numpy()
    assert win.shape == (1024,)
    assert mel.shape == (513, 10) or mel.shape[0] == 513
    # The mel matrix was materialized from the MelWeightMatrix node.
    assert mel.ndim == 2 and np.abs(mel).max() > 0


def test_unfuse_restores_chain(imported):
    import copy

    g = copy.deepcopy(imported.graph)
    assert unfuse_frontend(g) == 1
    assert not any(n.op_type == "_FusedStftFrontend" for n in g.node)
    ops = [n.op_type for n in g.node[:8]]
    assert "STFT" in ops and "MelWeightMatrix" in ops and "Log" in ops


def test_fallback_is_bit_identical(imported, audio):
    """On CPU (ineligible backend) the fused node re-interprets its body —
    outputs must equal a fully-unfused import."""
    got = _run(imported, audio)

    plain = import_onnx(_build())
    unfuse_frontend(plain.graph)
    want = _run(plain, audio)
    np.testing.assert_array_equal(got, want)


def test_interpret_kernel_close_to_fallback(imported, audio):
    """Kernel path (interpret mode, bf16 operands) vs the body chain under
    the same fast policy: logits agree to bf16-activation tolerance."""
    want = _run(imported, audio)
    got = _run(imported, audio, env={"BIRDNET_FRONTEND_INTERPRET": "1"})
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 5e-2


def test_kernel_matches_f64_oracle():
    """Direct kernel (f32, interpret) vs the f64 numpy oracle, including
    nonzero-support DFT truncation with a banded mel matrix."""
    import jax.numpy as jnp

    from birdnet_tpu.ops.pallas.frontend import (
        segments_stft_melspec,
        stft_melspec_reference,
    )

    rng = np.random.default_rng(0)
    S, hop, flen, M = 9000, 280, 1024, 24
    segs = (rng.normal(size=(3, S)) * 0.1).astype(np.float32)
    win = (
        0.5 - 0.5 * np.cos(2 * np.pi * np.arange(flen) / flen)
    ).astype(np.float32)
    bins = flen // 2 + 1
    mel = np.zeros((bins, M), np.float32)
    for m in range(M):
        c = 5 + m * 18
        for b in range(max(0, c - 9), min(bins, c + 9)):
            mel[b, m] = 1.0 - abs(b - c) / 9
    want = stft_melspec_reference(segs, win, mel, hop=hop)
    got = np.asarray(
        segments_stft_melspec(
            jnp.asarray(segs), win, mel, hop=hop, frame_length=flen,
            compute_dtype=jnp.float32, interpret=True,
        )
    )
    assert got.shape == want.shape == (3, M, (S - flen) // hop + 1)
    assert np.abs(got - want).max() < 1e-3


def test_kernel_full_mel_support():
    """A mel matrix with full bin support (lo=0, hi=bins) still matches —
    no truncation edge case."""
    import jax.numpy as jnp

    from birdnet_tpu.ops.pallas.frontend import (
        segments_stft_melspec,
        stft_melspec_reference,
    )

    rng = np.random.default_rng(3)
    S, hop, flen, M = 4000, 160, 512, 8
    segs = (rng.normal(size=(2, S)) * 0.1).astype(np.float32)
    win = np.hamming(flen).astype(np.float32)
    bins = flen // 2 + 1
    mel = rng.uniform(0.01, 1.0, size=(bins, M)).astype(np.float32)
    want = stft_melspec_reference(segs, win, mel, hop=hop)
    got = np.asarray(
        segments_stft_melspec(
            jnp.asarray(segs), win, mel, hop=hop, frame_length=flen,
            compute_dtype=jnp.float32, interpret=True,
        )
    )
    assert np.abs(got - want).max() < 1e-2


def test_v30_stft_geometry_fuses_and_matches():
    """The fusion + fallback also cover the v3.0 geometry (5 s @ 32 kHz,
    hop 312) with two outputs (embeddings + logits)."""
    from birdnet_tpu.models import birdnet_v30

    def build():
        return birdnet_v30.build_model(
            num_species=10, embedding_dim=32, width=0.1, depth=1, seed=1,
            frontend="stft",
        )

    imp = import_onnx(build())
    assert sum(
        1 for n in imp.graph.node if n.op_type == "_FusedStftFrontend"
    ) == 1
    rng = np.random.default_rng(5)
    x = (rng.normal(size=(2, birdnet_v30.SAMPLE_COUNT)) * 0.1).astype(
        np.float32
    )
    got = _run(imp, x)
    plain = import_onnx(build())
    unfuse_frontend(plain.graph)
    want = _run(plain, x)
    np.testing.assert_array_equal(got, want)
    got_k = _run(imp, x, env={"BIRDNET_FRONTEND_INTERPRET": "1"})
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got_k - want).max() / scale < 5e-2


def test_quantize_still_finds_convs(imported):
    """PTQ unfuses the frontend before scanning for quantizable convs."""
    from birdnet_tpu.compiler.quantize import (
        quantize_model,
        synthetic_calibration_segments,
    )

    q = quantize_model(
        imported, synthetic_calibration_segments(birdnet_v24.SAMPLE_COUNT, 2)
    )
    assert any(n.op_type == "QLinearConv" for n in q.graph.node)
