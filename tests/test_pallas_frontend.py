"""Pallas fused-frontend kernel: semantics vs the numpy oracle.

Runs in interpreter mode on CPU (the kernel's TPU compilation is blocked by
Mosaic lane-tiling rules for arbitrary hop — see the module docstring)."""

import numpy as np
import pytest

from birdnet_tpu.ops.pallas.frontend import (
    frame_filterbank_logpower,
    frontend_reference,
)


@pytest.mark.parametrize(
    "S,hop,K,F,step,n_seg",
    [
        (4000, 280, 1024, 96, 3000, 4),   # overlapping segments
        (4000, 280, 1024, 96, 4000, 3),   # zero overlap
        (2048, 128, 512, 64, 1024, 5),    # aligned hop
    ],
)
def test_kernel_matches_oracle(rng, S, hop, K, F, step, n_seg):
    audio = rng.normal(size=(n_seg - 1) * step + S + 2 * hop).astype(np.float32)
    w = (rng.normal(size=(F, K)) * 0.02).astype(np.float32)
    ref = frontend_reference(
        audio, w, n_segments=n_seg, step=step, sample_count=S, hop=hop, scale=1.0
    )
    out = np.asarray(
        frame_filterbank_logpower(
            audio, w, n_segments=n_seg, step=step, sample_count=S, hop=hop,
            scale=1.0, interpret=True,
        )
    )
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_kernel_int16_dequant(rng):
    S, hop, K, F, step, n_seg = 4000, 280, 1024, 96, 3000, 3
    audio = rng.normal(size=(n_seg - 1) * step + S + 2 * hop)
    i16 = (np.clip(audio, -1, 0.999) * 32768).astype(np.int16)
    w = (rng.normal(size=(F, K)) * 0.02).astype(np.float32)
    ref = frontend_reference(
        i16, w, n_segments=n_seg, step=step, sample_count=S, hop=hop
    )
    out = np.asarray(
        frame_filterbank_logpower(
            i16, w, n_segments=n_seg, step=step, sample_count=S, hop=hop,
            interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_kernel_conv_weight_layout(rng):
    """[F, 1, K] Conv1d weight layout is accepted."""
    S, hop, K, F, step, n_seg = 2048, 128, 512, 64, 2048, 2
    audio = rng.normal(size=n_seg * S + 2 * hop).astype(np.float32)
    w3 = (rng.normal(size=(F, 1, K)) * 0.02).astype(np.float32)
    ref = frontend_reference(
        audio, w3, n_segments=n_seg, step=step, sample_count=S, hop=hop, scale=1.0
    )
    out = np.asarray(
        frame_filterbank_logpower(
            audio, w3, n_segments=n_seg, step=step, sample_count=S, hop=hop,
            scale=1.0, interpret=True,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_kernel_audio_too_short(rng):
    with pytest.raises(ValueError):
        frame_filterbank_logpower(
            np.zeros(100, np.float32),
            np.zeros((8, 64), np.float32),
            n_segments=2, step=100, sample_count=128, hop=32, interpret=True,
        )


# ---- phased (arbitrary-hop) segments kernel --------------------------------


@pytest.mark.parametrize(
    "S,hop,K,F,n_seg,dtype",
    [
        (1000, 28, 96, 20, 8, "float32"),    # 7 phases (gcd(1000,28)=4)
        (1000, 28, 96, 20, 8, "bfloat16"),   # engine fast-policy operands
        (1400, 28, 96, 20, 5, "float32"),    # phase 0 only (1400 % 28 == 0)
        (4000, 280, 1024, 96, 3, "float32"),  # BirdNET-shaped mini config
    ],
)
def test_phased_segments_kernel_matches_oracle(rng, S, hop, K, F, n_seg, dtype):
    import jax.numpy as jnp

    from birdnet_tpu.ops.pallas.frontend import segments_filterbank_logpower

    audio = rng.normal(size=n_seg * S).astype(np.float32)
    w = (rng.normal(size=(F, K)) * 0.02).astype(np.float32)
    # oracle: segments are the flat stream at step=S
    ref = frontend_reference(
        audio, w, n_segments=n_seg, step=S, sample_count=S, hop=hop, scale=1.0
    )
    segs = audio.reshape(n_seg, S)
    compute = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    out = np.asarray(
        segments_filterbank_logpower(
            jnp.asarray(segs).astype(compute), w, hop=hop,
            compute_dtype=compute, interpret=True,
        )
    ).astype(np.float32)
    out = out.transpose(0, 2, 1)  # kernel returns [N, F, T]
    assert out.shape == ref.shape
    tol = 2e-1 if dtype == "bfloat16" else 1e-3
    np.testing.assert_allclose(out, ref, rtol=tol, atol=tol)


def test_oracle_scale_matches_kernel_on_float32(rng):
    """frontend_reference must apply ``scale`` to float32 audio exactly
    like the kernel does (scale acts by value, not by input dtype)."""
    S, hop, K, F, step, n_seg = 1024, 128, 256, 16, 512, 3
    total = (n_seg - 1) * step + S
    audio_i16 = (rng.normal(size=total) * 3000).astype(np.int16)
    ref_i16 = frontend_reference(
        audio_i16, (rng.normal(size=(F, K)) * 0.0).astype(np.float32) + 0.02,
        n_segments=n_seg, step=step, sample_count=S, hop=hop,
    )
    # identical values presented as float32 with the same scale arg
    ref_f32 = frontend_reference(
        audio_i16.astype(np.float32),
        np.full((F, K), 0.02, np.float32),
        n_segments=n_seg, step=step, sample_count=S, hop=hop,
    )
    np.testing.assert_allclose(ref_f32, ref_i16, rtol=1e-5, atol=1e-5)


def test_segments_kernel_scale_applies_to_float32(rng):
    """``scale`` must act by value for every input dtype: f32 segments
    with scale=1/32768 equal the pre-scaled f32 segments with scale=1."""
    from birdnet_tpu.ops.pallas.frontend import segments_filterbank_logpower

    S, hop, K, F, n_seg = 1024, 160, 256, 16, 3
    segs = (rng.normal(size=(n_seg, S)) * 3000).astype(np.float32)
    w = (rng.normal(size=(F, K)) * 0.02).astype(np.float32)
    scale = 1.0 / 32768.0
    want = np.asarray(
        segments_filterbank_logpower(
            segs * scale, w, hop=hop, compute_dtype=np.float32,
            interpret=True,
        )
    )
    got = np.asarray(
        segments_filterbank_logpower(
            segs, w, hop=hop, scale=scale, compute_dtype=np.float32,
            interpret=True,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_segments_kernel_coprime_hop(rng):
    """hop coprime with S (no phase structure at all) still works — the
    pre-folded design has no alignment constraint."""
    from birdnet_tpu.ops.pallas.frontend import segments_filterbank_logpower

    S, hop, K, F, n_seg = 1003, 28, 96, 20, 5
    audio = rng.normal(size=n_seg * S).astype(np.float32)
    w = (rng.normal(size=(F, K)) * 0.02).astype(np.float32)
    ref = frontend_reference(
        audio, w, n_segments=n_seg, step=S, sample_count=S, hop=hop,
        scale=1.0,
    ).transpose(0, 2, 1)
    out = np.asarray(
        segments_filterbank_logpower(
            audio.reshape(n_seg, S), w, hop=hop, interpret=True,
            compute_dtype=np.float32,
        )
    )
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)
