"""Pallas TPU kernel: fused MBConv (inverted-residual) block.

The BirdNET v2.4 backbone is EfficientNet-style MBConv blocks (expand 1x1
→ SiLU → depthwise 3x3 → SiLU → squeeze-excitation → project 1x1 →
residual). Roofline analysis (docs/performance.md) shows the model is
HBM-bandwidth-bound: lowered as separate XLA convs, every stage writes its
activation to HBM and the next reads it back — ~9x more traffic than the
block's true input+output.

This kernel runs the ENTIRE block per sample inside VMEM:

    HBM x[n] ──DMA──▶ VMEM [C_in, H·W]
       ▼ MXU  h1 = silu(w1 @ x + b1)                 [C_mid, H·W]
       ▼ VPU  h2 = silu(dw3x3(h1) + bd)   (9 static lane-rolls, edge-masked)
       ▼ MXU  SE: s = sigmoid(se2 @ silu(se1 @ mean(h2) + bse1) + bse2)
       ▼ MXU  y  = w3 @ (h2 · s) + b3 (+ x if residual)   [C_out, H·W]
    VMEM ──DMA──▶ HBM y[n]

Only x and y cross HBM. The depthwise stencil runs on the FLATTENED
[C, H·W] layout: a (dy, dx) tap is a static lane-roll by dy·W + dx with
broadcasted-iota edge masks (Mosaic supports static whole-array rolls;
strided 2-D slices and ref reshapes it does not — see frontend.py notes).

Supported: stride 1, 3x3 depthwise, SAME padding, W a lane multiple
(128/256) — exactly the byte-dominant stride-1 blocks of the backbone.
Stride-2 blocks keep XLA's lowering (their downsampled outputs are cheap).

STATUS (measured on v5e, jax 0.9): **correct on hardware** (0.5% rel vs
the f32 reference at both backbone block shapes) but **0.87–0.93x of
XLA's fused chain** — the masked-roll depthwise stage is VPU-bound
(9 taps x roll+select+fma over [C, 12288] f32), and XLA's own block
fusion already achieves ~650 GB/s effective across the full model (single
-op micro-benchmarks undersell it at ~240 GB/s). Not wired into the
compiler; kept as validated Mosaic groundwork. Leads if revisited: lane
shifts on the MXU via banded shift matrices (einsum('chw,wv->chv')) so
only the 9 tap-fmas hit the VPU, and sublane rolls for the row taps.

Hard-won Mosaic rules (this kernel + probes):
- ``pltpu.roll`` on the **lane axis compiles for f32 at ANY static
  amount, and for NO amount at bf16** (every bf16 roll fails remote
  compile) — keep roll operands f32.
- 1-lane matmuls ([C, C] @ [C, 1]) are fragile; reduce-formulate
  channel-vector contractions instead (broadcast-multiply + sum).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu_f32(v):
    return v * jax.nn.sigmoid(v)


def _mbconv_kernel(
    x_ref,      # [1, C_in, HW]
    w1_ref,     # [C_mid, C_in]
    b1_ref,     # [C_mid, 1]
    wd_ref,     # [C_mid, 16]  (3x3 taps padded to 16 lanes)
    bd_ref,     # [C_mid, 1]
    se1_ref,    # [C_se, C_mid]
    bse1_ref,   # [C_se, 1]
    se2_ref,    # [C_mid, C_se]
    bse2_ref,   # [C_mid, 1]
    w3_ref,     # [C_out, C_mid]
    b3_ref,     # [C_out, 1]
    o_ref,      # [1, C_out, HW]
    *,
    height: int,
    width: int,
    residual: bool,
):
    x = x_ref[0]                                   # [C_in, HW] bf16
    # ---- expand 1x1 + SiLU (MXU) ----
    acc = jnp.dot(w1_ref[...], x, preferred_element_type=jnp.float32)
    # Stays f32 through the depthwise stage: Mosaic supports lane rolls on
    # f32 but NOT on bf16 (measured: every bf16 roll amount fails to
    # compile; every f32 amount works).
    h1 = _silu_f32(acc + b1_ref[...].astype(jnp.float32))  # [C_mid, HW] f32

    # ---- depthwise 3x3, SAME, stride 1 (VPU; static rolls + edge masks) --
    hw = height * width
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, hw), 1)
    col = pos % width
    row = pos // width
    accd = jnp.zeros(h1.shape, jnp.float32)
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shift = dy * width + dx
            # value at flat position p + shift (same-channel neighbor);
            # pltpu.roll requires a non-negative amount, so wrap modulo HW
            t = pltpu.roll(h1, (-shift) % hw, axis=1) if shift else h1
            valid = jnp.logical_and(
                jnp.logical_and(col + dx >= 0, col + dx < width),
                jnp.logical_and(row + dy >= 0, row + dy < height),
            )
            tap = wd_ref[:, (dy + 1) * 3 + (dx + 1)][:, None]
            accd = accd + jnp.where(valid, t, 0.0) * tap.astype(jnp.float32)
    h2 = _silu_f32(accd + bd_ref[...].astype(jnp.float32))  # [C_mid, HW] f32

    # ---- squeeze-excitation on the channel means (reduce-formulated:
    # 1-lane matmuls are fragile on the MXU; [C, C]·[1, C] → sum is VPU) --
    gap = jnp.mean(h2, axis=1, keepdims=True)               # [C_mid, 1]
    s1 = _silu_f32(
        jnp.sum(se1_ref[...].astype(jnp.float32) * gap[:, 0][None, :],
                axis=1, keepdims=True)
        + bse1_ref[...].astype(jnp.float32)
    )                                                        # [C_se, 1]
    s2 = jax.nn.sigmoid(
        jnp.sum(se2_ref[...].astype(jnp.float32) * s1[:, 0][None, :],
                axis=1, keepdims=True)
        + bse2_ref[...].astype(jnp.float32)
    )                                                        # [C_mid, 1]
    h3 = (h2 * s2).astype(x.dtype)

    # ---- project 1x1 (+ residual) (MXU) ---------------------------------
    acc3 = jnp.dot(w3_ref[...], h3, preferred_element_type=jnp.float32)
    y = acc3 + b3_ref[...].astype(jnp.float32)
    if residual:
        y = y + x.astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def mbconv_block(
    x,            # [N, C_in, H, W]
    w1, b1,       # [C_mid, C_in], [C_mid]
    wd, bd,       # [C_mid, 1, 3, 3] (ONNX depthwise layout), [C_mid]
    se1, bse1,    # [C_se, C_mid], [C_se]
    se2, bse2,    # [C_mid, C_se], [C_mid]
    w3, b3,       # [C_out, C_mid], [C_out]
    residual: bool,
    interpret: bool = False,
):
    """Run the fused MBConv block. Returns [N, C_out, H, W].

    Weights arrive in ONNX conv layouts and are reshaped host-side (they
    are tiny). Activations stay bf16 with f32 accumulation/epilogues —
    the 'fast'/'mixed' MXU policy.
    """
    n, c_in, h, w = x.shape
    c_mid = w1.shape[0]
    c_out = w3.shape[0]
    hw = h * w
    dtype = jnp.bfloat16

    x2 = jnp.reshape(x, (n, c_in, hw)).astype(dtype)
    # depthwise taps: [C_mid, 1, 3, 3] → [C_mid, 9] → pad lanes to 16
    wd9 = jnp.reshape(jnp.asarray(wd), (c_mid, 9))
    wd16 = jnp.pad(wd9, ((0, 0), (0, 7))).astype(dtype)

    def col(v):
        return jnp.reshape(jnp.asarray(v), (-1, 1)).astype(jnp.float32)

    kernel = functools.partial(
        _mbconv_kernel, height=h, width=w, residual=residual
    )
    c_se = se1.shape[0]
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c_out, hw), dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c_in, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_mid, c_in), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_mid, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_mid, 16), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_mid, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_se, c_mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_se, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_mid, c_se), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_mid, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, c_mid), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_out, hw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x2,
        jnp.asarray(w1).astype(dtype), col(b1),
        wd16, col(bd),
        jnp.asarray(se1).astype(dtype), col(bse1),
        jnp.asarray(se2).astype(dtype), col(bse2),
        jnp.asarray(w3).astype(dtype), col(b3),
    )
    return jnp.reshape(out, (n, c_out, h, w))


def mbconv_reference(
    x, w1, b1, wd, bd, se1, bse1, se2, bse2, w3, b3, residual: bool
):
    """Plain-XLA reference of the same block (f32), for oracle tests."""
    from jax import lax

    c_mid = w1.shape[0]
    dn = lax.ConvDimensionNumbers((0, 1, 2, 3), (0, 1, 2, 3), (0, 1, 2, 3))
    x = jnp.asarray(x, jnp.float32)

    def conv1x1(v, wt, bt):
        y = lax.conv_general_dilated(
            v, jnp.asarray(wt, jnp.float32)[:, :, None, None], (1, 1),
            [(0, 0), (0, 0)], dimension_numbers=dn)
        return y + jnp.asarray(bt, jnp.float32)[None, :, None, None]

    h1 = _silu_f32(conv1x1(x, w1, b1))
    hd = lax.conv_general_dilated(
        h1, jnp.asarray(wd, jnp.float32), (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=dn, feature_group_count=c_mid)
    h2 = _silu_f32(hd + jnp.asarray(bd, jnp.float32)[None, :, None, None])
    gap = jnp.mean(h2, axis=(2, 3))                      # [N, C_mid]
    s1 = _silu_f32(gap @ jnp.asarray(se1, jnp.float32).T
                   + jnp.asarray(bse1, jnp.float32))
    s2 = jax.nn.sigmoid(s1 @ jnp.asarray(se2, jnp.float32).T
                        + jnp.asarray(bse2, jnp.float32))
    h3 = h2 * s2[:, :, None, None]
    y = conv1x1(h3, w3, b3)
    if residual:
        y = y + x
    return y
