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
def test_tpu_arbitrary_hop_frontend():
    """Arbitrary-hop pre-folded frontend kernel on real hardware
    (compiled Mosaic path: per-segment row blocks + MXU filterbank)."""
    import jax
    import jax.numpy as jnp

    from birdnet_tpu.ops.pallas.frontend import (
        frontend_reference,
        segments_filterbank_logpower,
    )
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    dev = default_device()
    if dev.platform not in ("tpu", "axon"):
        pytest.skip("no TPU device")
    irng = np.random.default_rng(7)
    S, hop, K, F, n_seg = 144_000, 280, 1024, 96, 8
    audio = (irng.normal(size=n_seg * S) * 0.1).astype(np.float32)
    w = (irng.normal(size=(F, K)) * 0.02).astype(np.float32)
    segs = jax.device_put(audio.reshape(n_seg, S), dev)
    fn = jax.jit(
        lambda a, ww: segments_filterbank_logpower(
            a, ww, hop=hop, compute_dtype=jnp.float32
        )
    )
    out = np.asarray(fn(segs, jax.device_put(w, dev)))
    ref = frontend_reference(
        audio, w, n_segments=n_seg, step=S, sample_count=S, hop=hop,
        scale=1.0,
    ).transpose(0, 2, 1)  # kernel returns [N, F, T]
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=5e-3)


@requires_tpu
def test_tpu_stage123_megakernel():
    """Stage-prefix megakernel on real hardware: compiled Mosaic path vs
    the f32 conv oracle (in-pipeline it is default-OFF — every split point
    measured slower than XLA, scripts/split_sweep.py — but the kernel
    itself must stay correct for experimentation)."""
    import jax
    import jax.numpy as jnp

    from birdnet_tpu.ops.pallas.stage123 import (
        from_planes,
        stage_stack_forward,
        to_planes,
    )
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    dev = default_device()
    if dev.platform not in ("tpu", "axon"):
        pytest.skip("no TPU device")
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from test_stage123 import SMALL_BLOCKS, _oracle, _rand_weights

    irng = np.random.default_rng(3)
    blocks = list(SMALL_BLOCKS[:4])  # stem 32ch; strides 1,1,2,1 -> 2x2 grid
    stem_w, stem_b, bws = _rand_weights(irng, blocks)
    img = (irng.normal(size=(4, 1, 96, 511)) * 0.5).astype(np.float32)
    planes = to_planes(jnp.asarray(img)).astype(jnp.bfloat16)
    y = jax.jit(
        lambda p: stage_stack_forward(
            p, stem_w, stem_b, bws, blocks, compute_dtype=jnp.bfloat16
        )
    )(jax.device_put(planes, dev))
    got = np.asarray(from_planes(y, 2, 2), np.float32)
    want = np.asarray(_oracle(img, stem_w, stem_b, bws, blocks))
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 5e-2
