"""Pallas frontend on real TPU hardware (row-aligned configs).

Runs only under BIRDNET_TEST_TPU=1 on an actual TPU — this is the hardware
validation of the compiled kernel path (interpret-mode semantics live in
test_pallas_frontend.py, which auto-skips on TPU)."""

import os

import numpy as np
import pytest

requires_tpu = pytest.mark.skipif(
    not os.environ.get("BIRDNET_TEST_TPU"), reason="needs real TPU (BIRDNET_TEST_TPU=1)"
)


@requires_tpu
def test_tpu_row_aligned(rng):
    import jax

    from birdnet_tpu.ops.pallas.frontend import (
        frame_filterbank_logpower,
        frontend_reference,
    )
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    dev = default_device()
    if dev.platform not in ("tpu", "axon"):
        pytest.skip("no TPU device")

    S, hop, K, F = 144_000, 128, 1024, 96
    n_seg = 4
    audio = rng.normal(size=(n_seg * S + 2048,)).astype(np.float32)
    w = (rng.normal(size=(F, K)) * 0.02).astype(np.float32)
    fn = jax.jit(
        lambda a, ww: frame_filterbank_logpower(
            a, ww, n_segments=n_seg, step=S, sample_count=S, hop=hop, scale=1.0
        )
    )
    out = np.asarray(fn(jax.device_put(audio, dev), jax.device_put(w, dev)))
    ref = frontend_reference(
        audio, w, n_segments=n_seg, step=S, sample_count=S, hop=hop, scale=1.0
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-3)


@requires_tpu
def test_tpu_unaligned_rejected():
    import numpy as np

    from birdnet_tpu.ops.pallas.frontend import frame_filterbank_logpower

    with pytest.raises(NotImplementedError):
        frame_filterbank_logpower(
            np.zeros(200_000, np.float32),
            np.zeros((8, 1024), np.float32),
            n_segments=1, step=144_000, sample_count=144_000, hop=280,
        )


@requires_tpu
def test_tpu_mbconv_block():
    """Fused MBConv block kernel on real hardware (compiled Mosaic path)."""
    from birdnet_tpu.ops.pallas.block import mbconv_block, mbconv_reference
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    dev = default_device()
    if dev.platform not in ("tpu", "axon"):
        pytest.skip("no TPU device")
    # The exact backbone stage1-block2 config hardware-validated on v5e
    # (Mosaic is shape-sensitive: e.g. c_in 24 → c_mid 96 with c_se 24
    # fails remote compile while both real backbone shapes pass).
    irng = np.random.default_rng(7)
    n, c_in, h, w = 128, 24, 48, 256
    c_mid, c_se, c_out = 24, 6, 24

    def mk(*s, sc=0.2):
        return (irng.normal(size=s) * sc).astype(np.float32)

    x = mk(n, c_in, h, w, sc=0.3)
    args = [
        mk(c_mid, c_in), mk(c_mid, sc=0.05),
        mk(c_mid, 1, 3, 3), mk(c_mid, sc=0.05),
        mk(c_se, c_mid), mk(c_se, sc=0.05),
        mk(c_mid, c_se), mk(c_mid, sc=0.05),
        mk(c_out, c_mid), mk(c_out, sc=0.05),
    ]
    y = np.asarray(mbconv_block(x, *args, residual=True), np.float32)
    ref = np.asarray(mbconv_reference(x, *args, residual=True))
    rel = np.abs(y - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 0.02, f"hardware kernel diverged: rel={rel}"
