"""Frontend fusion (compiler/fuse_frontend.py) + its lowering.

CPU tier: structural match, fallback bit-equality, interpret-mode kernel
parity (hardware timing runs via the streaming bench)."""

import os

import numpy as np
import pytest

from birdnet_tpu.compiler.fuse_frontend import unfuse_frontend
from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.models import birdnet_v24


@pytest.fixture(scope="module")
def imported():
    return import_onnx(
        birdnet_v24.build_model(num_species=10, width=0.1, depth=1, seed=0)
    )


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


def test_frontend_fused_at_import(imported):
    fused = [n for n in imported.graph.node if n.op_type == "_FusedFrontend"]
    assert len(fused) == 1
    node = fused[0]
    assert int(node.attrs["hop"]) == 280
    assert abs(float(node.attrs["eps"]) - 1e-6) < 1e-12
    assert len(node.attrs["body"].node) == 6


def test_unfuse_restores_chain(imported):
    import copy

    g = copy.deepcopy(imported.graph)
    assert unfuse_frontend(g) == 1
    assert not any(n.op_type == "_FusedFrontend" for n in g.node)
    ops = [n.op_type for n in g.node[:6]]
    assert ops.count("Unsqueeze") == 2 and "Conv" in ops and "Log" in ops


def test_fallback_is_bit_identical(imported, audio):
    """On CPU (ineligible backend) the fused node re-interprets its body —
    outputs must equal a fully-unfused import."""
    got = _run(imported, audio)

    plain = import_onnx(
        birdnet_v24.build_model(num_species=10, width=0.1, depth=1, seed=0)
    )
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
