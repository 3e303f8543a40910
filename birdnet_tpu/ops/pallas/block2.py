"""Pallas TPU kernel v2: fused MBConv (inverted-residual) block.

Second-generation version of :mod:`.block`. Same contract (whole block per
sample inside VMEM — only x and y cross HBM) with a restructured depthwise
stage that cuts the VPU/XLU work v1 measured as its bottleneck:

- **5 rolls instead of 8**: the 3x3 stencil separates into 3 lane-rolls of
  h1 by dx in {-1, 0, +1} (shared across all dy), then per-dy row sums and
  2 lane-rolls of the row sums by dy*W (the flat [C, H*W] layout makes a
  row shift a lane roll too). v1 rolled once per tap.
- **Masks are precomputed kernel inputs applied by multiply**: v1 computed
  col/row from a broadcasted iota with mod/div every call and applied
  edge validity via select. Here the W-edge and H-edge masks arrive as
  [1, HW] f32 planes (built once on host) and fold into the tap FMAs.
- Everything else keeps v1's hard-won Mosaic rules: f32 through the rolls
  (lane rolls compile for f32 at any static amount, for NO amount at
  bf16), reduce-formulated SE (1-lane matmuls are fragile), bf16 MXU
  operands with f32 accumulation.

Supported: stride 1, 3x3 depthwise, SAME padding, W a lane multiple.
Reference semantics per mbconv of models/_builder.py (expand 1x1 + SiLU →
depthwise 3x3 + SiLU → SE → project 1x1 → residual).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _silu_f32(v):
    return v * jax.nn.sigmoid(v)


def _mbconv2_kernel(
    x_ref,        # [1, C_in, HW] bf16
    w1_ref,       # [C_mid, C_in] bf16
    b1_ref,       # [C_mid, 1] f32
    wd_ref,       # [C_mid, 16] f32 (3x3 taps padded to 16 lanes)
    bd_ref,       # [C_mid, 1] f32
    se1_ref,      # [C_se, C_mid] bf16
    bse1_ref,     # [C_se, 1] f32
    se2_ref,      # [C_mid, C_se] bf16
    bse2_ref,     # [C_mid, 1] f32
    w3_ref,       # [C_out, C_mid] bf16
    b3_ref,       # [C_out, 1] f32
    wmask_ref,    # [2, HW] f32: [0]=valid when col>0 (dx=-1), [1]=col<W-1
    hmask_ref,    # [2, HW] f32: [0]=valid when row>0 (dy=-1), [1]=row<H-1
    o_ref,        # [1, C_out, HW]
    *,
    width: int,
    hw: int,
    residual: bool,
):
    x = x_ref[0]                                     # [C_in, HW] bf16
    # ---- expand 1x1 + SiLU (MXU), f32 through the depthwise rolls ----
    acc = jnp.dot(w1_ref[...], x, preferred_element_type=jnp.float32)
    h1 = _silu_f32(acc + b1_ref[...])                # [C_mid, HW] f32

    # ---- depthwise 3x3 (separated stencil) ----
    # dx-shifted copies, W edges masked by multiply (mask is 0/1 f32).
    left = pltpu.roll(h1, 1, axis=1) * wmask_ref[0][None, :]    # value at col-1
    right = pltpu.roll(h1, hw - 1, axis=1) * wmask_ref[1][None, :]  # col+1
    accd = jnp.zeros(h1.shape, jnp.float32)
    for dy in (-1, 0, 1):
        t = dy + 1
        rowsum = (
            left * wd_ref[:, t * 3 + 0][:, None]
            + h1 * wd_ref[:, t * 3 + 1][:, None]
            + right * wd_ref[:, t * 3 + 2][:, None]
        )
        if dy == -1:
            rowsum = pltpu.roll(rowsum, width, axis=1) * hmask_ref[0][None, :]
        elif dy == 1:
            rowsum = pltpu.roll(rowsum, hw - width, axis=1) * hmask_ref[1][None, :]
        accd = accd + rowsum
    h2 = _silu_f32(accd + bd_ref[...])               # [C_mid, HW] f32

    # ---- squeeze-excitation (reduce-formulated channel contractions) ----
    gap = jnp.mean(h2, axis=1, keepdims=True)        # [C_mid, 1]
    s1 = _silu_f32(
        jnp.sum(se1_ref[...].astype(jnp.float32) * gap[:, 0][None, :],
                axis=1, keepdims=True)
        + bse1_ref[...]
    )                                                # [C_se, 1]
    s2 = jax.nn.sigmoid(
        jnp.sum(se2_ref[...].astype(jnp.float32) * s1[:, 0][None, :],
                axis=1, keepdims=True)
        + bse2_ref[...]
    )                                                # [C_mid, 1]
    h3 = (h2 * s2).astype(x.dtype)

    # ---- project 1x1 (+ residual) (MXU) ----
    acc3 = jnp.dot(w3_ref[...], h3, preferred_element_type=jnp.float32)
    y = acc3 + b3_ref[...]
    if residual:
        y = y + x.astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)


def mbconv_block2(
    x,            # [N, C_in, H, W]
    w1, b1,       # [C_mid, C_in], [C_mid]
    wd, bd,       # [C_mid, 1, 3, 3] (ONNX depthwise layout), [C_mid]
    se1, bse1,    # [C_se, C_mid], [C_se]
    se2, bse2,    # [C_mid, C_se], [C_mid]
    w3, b3,       # [C_out, C_mid], [C_out]
    residual: bool,
    interpret: bool = False,
):
    """Run the fused MBConv block (v2). Returns [N, C_out, H, W]."""
    n, c_in, h, w = x.shape
    c_mid = w1.shape[0]
    c_out = w3.shape[0]
    hw = h * w
    dtype = jnp.bfloat16

    x2 = jnp.reshape(x, (n, c_in, hw)).astype(dtype)
    wd9 = jnp.reshape(jnp.asarray(wd), (c_mid, 9)).astype(jnp.float32)
    wd16 = jnp.pad(wd9, ((0, 0), (0, 7)))

    # Edge-validity masks on the flat position axis (host-built constants).
    pos = np.arange(hw)
    col = pos % w
    row = pos // w
    wmask = np.stack([(col > 0), (col < w - 1)]).astype(np.float32)
    hmask = np.stack([(row > 0), (row < h - 1)]).astype(np.float32)

    def colv(v):
        return jnp.reshape(jnp.asarray(v), (-1, 1)).astype(jnp.float32)

    kernel = functools.partial(
        _mbconv2_kernel, width=w, hw=hw, residual=residual
    )
    c_se = se1.shape[0]

    def vspec(shape):
        return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                            memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, c_out, hw), dtype),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, c_in, hw), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            vspec((c_mid, c_in)),
            vspec((c_mid, 1)),
            vspec((c_mid, 16)),
            vspec((c_mid, 1)),
            vspec((c_se, c_mid)),
            vspec((c_se, 1)),
            vspec((c_mid, c_se)),
            vspec((c_mid, 1)),
            vspec((c_out, c_mid)),
            vspec((c_out, 1)),
            vspec((2, hw)),
            vspec((2, hw)),
        ],
        out_specs=pl.BlockSpec((1, c_out, hw), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x2,
        jnp.asarray(w1).astype(dtype), colv(b1),
        wd16, colv(bd),
        jnp.asarray(se1).astype(dtype), colv(bse1),
        jnp.asarray(se2).astype(dtype), colv(bse2),
        jnp.asarray(w3).astype(dtype), colv(b3),
        jnp.asarray(wmask), jnp.asarray(hmask),
    )
    return jnp.reshape(out, (n, c_out, h, w))
