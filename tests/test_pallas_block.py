"""Fused MBConv Pallas block: interpret-mode oracle tests (CPU)."""

import numpy as np
import pytest

from birdnet_tpu.ops.pallas.block import mbconv_block, mbconv_reference
from birdnet_tpu.ops.pallas.block2 import mbconv_block2


def _args(rng, c_in, c_mid, c_se, c_out):
    def mk(*s, sc=0.2):
        return (rng.normal(size=s) * sc).astype(np.float32)

    return [
        mk(c_mid, c_in), mk(c_mid, sc=0.1),
        mk(c_mid, 1, 3, 3), mk(c_mid, sc=0.1),
        mk(c_se, c_mid), mk(c_se, sc=0.1),
        mk(c_mid, c_se), mk(c_mid, sc=0.1),
        mk(c_out, c_mid), mk(c_out, sc=0.1),
    ]


@pytest.mark.parametrize(
    "c_in,c_mid,c_out,residual",
    [(24, 96, 24, True), (24, 96, 32, False), (16, 16, 16, True)],
)
def test_mbconv_block_matches_reference(rng, c_in, c_mid, c_out, residual):
    irng = np.random.default_rng(3)
    n, h, w = 2, 16, 128
    x = (irng.normal(size=(n, c_in, h, w)) * 0.3).astype(np.float32)
    args = _args(irng, c_in, c_mid, max(c_mid // 4, 4), c_out)
    y = np.asarray(
        mbconv_block(x, *args, residual=residual, interpret=True), np.float32
    )
    ref = np.asarray(mbconv_reference(x, *args, residual=residual))
    assert y.shape == ref.shape == (n, c_out, h, w)
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, f"bf16 block diverged from f32 reference: rel={rel}"


def test_mbconv_edge_handling(rng):
    """Depthwise edge masking: an impulse at each corner must not wrap."""
    irng = np.random.default_rng(5)
    n, c, h, w = 1, 16, 16, 128
    x = np.zeros((n, c, h, w), np.float32)
    x[0, :, 0, 0] = 1.0
    x[0, :, h - 1, w - 1] = 1.0
    args = _args(irng, c, c, 4, c)
    y = np.asarray(mbconv_block(x, *args, residual=False, interpret=True),
                   np.float32)
    ref = np.asarray(mbconv_reference(x, *args, residual=False))
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02


@pytest.mark.parametrize(
    "c_in,c_mid,c_out,residual",
    [(24, 96, 24, True), (24, 96, 32, False), (16, 16, 16, True)],
)
def test_mbconv_block2_matches_reference(rng, c_in, c_mid, c_out, residual):
    irng = np.random.default_rng(3)
    n, h, w = 2, 16, 128
    x = (irng.normal(size=(n, c_in, h, w)) * 0.3).astype(np.float32)
    args = _args(irng, c_in, c_mid, max(c_mid // 4, 4), c_out)
    y = np.asarray(
        mbconv_block2(x, *args, residual=residual, interpret=True), np.float32
    )
    ref = np.asarray(mbconv_reference(x, *args, residual=residual))
    assert y.shape == ref.shape == (n, c_out, h, w)
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, f"bf16 v2 block diverged from f32 reference: rel={rel}"


def test_mbconv_block2_edge_handling(rng):
    """v2's multiply-mask edges: corner impulses must not wrap rows/cols."""
    irng = np.random.default_rng(5)
    n, c, h, w = 1, 16, 16, 128
    x = np.zeros((n, c, h, w), np.float32)
    x[0, :, 0, 0] = 1.0
    x[0, :, h - 1, w - 1] = 1.0
    args = _args(irng, c, c, 4, c)
    y = np.asarray(mbconv_block2(x, *args, residual=False, interpret=True),
                   np.float32)
    ref = np.asarray(mbconv_reference(x, *args, residual=False))
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02
