"""Polyphase-plane megakernel (ops/pallas/stage123.py) vs a plain-JAX
conv oracle. Runs in Pallas interpret mode on CPU; the identical compiled
comparison runs on hardware via scripts/bench_stage123.py."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from birdnet_tpu.ops.pallas.stage123 import (
    BASE_H,
    BASE_W,
    LANES,
    BlockGeom,
    edge_masks,
    from_planes,
    stage_stack_forward,
    tap_source,
    to_planes,
)


def _silu(v):
    return v * jax.nn.sigmoid(v)


def _conv(x, w, stride=1, pad=1, groups=1):
    # HIGHEST precision: on TPU an f32 conv otherwise runs bf16 passes,
    # which makes the oracle itself ~1e-4 noisy vs the true-f32
    # interpret-mode kernel and the comparison borderline-flaky.
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _oracle(img, stem_w, stem_b, block_weights, blocks):
    """f32 NCHW reference of the fused subgraph (matches
    models/_builder.py's stem + mbconv semantics after BN folding)."""
    x = _silu(_conv(img, stem_w, stride=2) + stem_b.reshape(1, -1, 1, 1))
    for geom, bw in zip(blocks, block_weights):
        h1 = _silu(
            _conv(x, bw["w1"].reshape(geom.c_mid, geom.c_in, 1, 1), pad=0)
            + bw["b1"].reshape(1, -1, 1, 1)
        )
        h2 = _silu(
            _conv(h1, bw["wd"].reshape(geom.c_mid, 1, 3, 3),
                  stride=geom.stride, groups=geom.c_mid)
            + bw["bd"].reshape(1, -1, 1, 1)
        )
        gap = jnp.mean(h2, axis=(2, 3), keepdims=True)  # [N, C, 1, 1]
        s1 = _silu(
            jnp.einsum("sc,nchw->nshw", bw["se1"].reshape(geom.c_se, geom.c_mid),
                       gap, precision=jax.lax.Precision.HIGHEST)
            + bw["bse1"].reshape(1, -1, 1, 1)
        )
        s2 = jax.nn.sigmoid(
            jnp.einsum("cs,nshw->nchw", bw["se2"].reshape(geom.c_mid, geom.c_se),
                       s1, precision=jax.lax.Precision.HIGHEST)
            + bw["bse2"].reshape(1, -1, 1, 1)
        )
        h3 = h2 * s2
        y = (
            _conv(h3, bw["w3"].reshape(geom.c_out, geom.c_mid, 1, 1), pad=0)
            + bw["b3"].reshape(1, -1, 1, 1)
        )
        if geom.residual:
            y = y + x
        x = y
    return x


def _rand_weights(rng, blocks):
    stem_w = rng.normal(size=(32, 1, 3, 3)).astype(np.float32) * 0.4
    stem_b = rng.normal(size=32).astype(np.float32) * 0.05
    bws = []
    for g in blocks:
        bws.append({
            "w1": rng.normal(size=(g.c_mid, g.c_in)).astype(np.float32)
            * (1.5 / np.sqrt(g.c_in)),
            "b1": rng.normal(size=g.c_mid).astype(np.float32) * 0.05,
            "wd": rng.normal(size=(g.c_mid, 1, 3, 3)).astype(np.float32) * 0.3,
            "bd": rng.normal(size=g.c_mid).astype(np.float32) * 0.05,
            "se1": rng.normal(size=(g.c_se, g.c_mid)).astype(np.float32)
            * (1.0 / np.sqrt(g.c_mid)),
            "bse1": rng.normal(size=g.c_se).astype(np.float32) * 0.05,
            "se2": rng.normal(size=(g.c_mid, g.c_se)).astype(np.float32)
            * (1.0 / np.sqrt(g.c_se)),
            "bse2": rng.normal(size=g.c_mid).astype(np.float32) * 0.05,
            "w3": rng.normal(size=(g.c_out, g.c_mid)).astype(np.float32)
            * (1.0 / np.sqrt(g.c_mid)),
            "b3": rng.normal(size=g.c_out).astype(np.float32) * 0.05,
        })
    return stem_w, stem_b, bws


# Reduced-width version of the real 6-block schedule (same strides /
# residuals / plane geometry; channel counts shrunk for interpret mode).
SMALL_BLOCKS = (
    BlockGeom(c_in=32, c_mid=32, c_se=8, c_out=16, stride=1, residual=False),
    BlockGeom(c_in=16, c_mid=16, c_se=8, c_out=16, stride=1, residual=True),
    BlockGeom(c_in=16, c_mid=24, c_se=8, c_out=16, stride=2, residual=False),
    BlockGeom(c_in=16, c_mid=24, c_se=8, c_out=16, stride=1, residual=True),
    BlockGeom(c_in=16, c_mid=24, c_se=8, c_out=24, stride=2, residual=False),
    BlockGeom(c_in=24, c_mid=32, c_se=8, c_out=24, stride=1, residual=True),
)


def test_tap_source_geometry():
    # interior: pure plane shift
    assert tap_source(4, 4, 1, 1, 1, 1, 0) == (2 * 4 + 1, 0, 0)
    # top edge wraps to last phase with i-1
    assert tap_source(4, 4, 1, 0, 0, -1, 0) == (3 * 4, -1, 0)
    # bottom edge wraps to phase 0 with i+1
    assert tap_source(4, 4, 1, 3, 0, 1, 0) == (0, 1, 0)
    # stride 2: q = 2*ry+dy never exceeds a-1, only the -1 wrap exists
    assert tap_source(4, 4, 2, 1, 0, 1, 0) == (3 * 4, 0, 0)
    assert tap_source(2, 2, 2, 0, 0, -1, -1) == (1 * 2 + 1, -1, -1)


def test_plane_roundtrip():
    rng = np.random.default_rng(0)
    img = rng.normal(size=(2, 1, 96, 511)).astype(np.float32)
    planes = np.asarray(to_planes(img))
    assert planes.shape == (2, 64, LANES)
    # plane (ry, rx) at (i, j) is orig[8i+ry, 8j+rx]
    for ry, rx, i, j in [(0, 0, 0, 0), (3, 5, 7, 60), (7, 7, 11, 62)]:
        assert planes[1, ry * 8 + rx, i * BASE_W + j] == img[1, 0, 8 * i + ry, 8 * j + rx]
    # the padded column x=511 (planes rx=7 at j=63) is zero
    for ry in range(8):
        for i in range(BASE_H):
            assert planes[0, ry * 8 + 7, i * BASE_W + 63] == 0.0


def test_edge_masks_shape():
    m = edge_masks()
    assert m.shape == (9, LANES)
    assert np.all(m[4] == 1.0)  # no-shift mask is all ones


@pytest.mark.parametrize("n_blocks", [1, 3, 6])
def test_stage_stack_matches_oracle_f32(rng, n_blocks):
    blocks = SMALL_BLOCKS[:n_blocks]
    stem_w, stem_b, bws = _rand_weights(rng, blocks)
    img = rng.normal(size=(1, 1, 96, 511)).astype(np.float32) * 0.5

    want = np.asarray(_oracle(img, stem_w, stem_b, bws, blocks))

    planes = to_planes(img)
    got_planes = stage_stack_forward(
        planes, stem_w, stem_b, bws, blocks,
        fast_act=False, compute_dtype=jnp.float32, interpret=True,
    )
    a = 4 // int(np.prod([g.stride for g in blocks]))
    if a == 4:      # no stride-2 blocks yet: output at 48x256 (P=16)
        n, c, _ = got_planes.shape
        got = np.asarray(got_planes).reshape(n, c, 4, 4, BASE_H, BASE_W)
        got = got.transpose(0, 1, 4, 2, 5, 3).reshape(n, c, 48, 256)
    elif a == 2:
        n, c, _ = got_planes.shape
        got = np.asarray(got_planes).reshape(n, c, 2, 2, BASE_H, BASE_W)
        got = got.transpose(0, 1, 4, 2, 5, 3).reshape(n, c, 24, 128)
    else:
        got = np.asarray(from_planes(got_planes))

    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_stage_stack_bf16_and_fast_act_close(rng):
    blocks = SMALL_BLOCKS
    stem_w, stem_b, bws = _rand_weights(rng, blocks)
    img = rng.normal(size=(1, 1, 96, 511)).astype(np.float32) * 0.5
    want = np.asarray(_oracle(img, stem_w, stem_b, bws, blocks))
    planes = to_planes(img).astype(jnp.bfloat16)
    got = np.asarray(from_planes(stage_stack_forward(
        planes, stem_w, stem_b, bws, blocks,
        fast_act=True, compute_dtype=jnp.bfloat16, interpret=True,
    ))).astype(np.float32)
    scale = np.abs(want).max()
    assert np.abs(got - want).max() / scale < 0.05  # bf16 + fast-act noise
