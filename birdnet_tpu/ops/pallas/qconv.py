"""Pallas int8 1x1-conv + fused requantization (matmul form).

Why this kernel exists: XLA TPU cannot fuse an elementwise epilogue into a
convolution whose accumulator type differs from its output type, so every
QLinearConv lowered through XLA materializes its **int32 accumulator**
tensor in HBM (verified on the optimized HLO: the s32 conv output and the
f32 requant chain live in separate fusions), round-tripping 4 bytes/elem
where the bf16 pipeline moves 2. That asymmetry is most of why the int8
path measured *slower* than bf16-`fast` in round 1 (54.7 vs 33.5
us/segment).

Here the 1x1 conv is an MXU matmul ``[C_out, C_in] @ [C_in, n]`` in int8
with the whole requant epilogue — bias add, scale, optional activation,
round-half-even, saturate, s8 cast — applied in VMEM before anything
touches HBM: traffic is s8 in, s8 out (1 byte/elem each way).

Measured on v5e (24→96→24 conv pair at 48x256, batch 128, bit-exact vs
the XLA chain): **8.8 us/image vs 21.6 us/image for the XLA int8 chain**
(2.4x). The bf16-`fast` XLA pair measures 4.7 us/image — int8 still does
not *beat* bf16 on this byte-bound model (see docs/performance.md for the
full measured matrix and why); this kernel removes most of the int8
penalty rather than making int8 the fastest mode.

Reference analog: TensorRT's int8 engine fuses requant into conv
epilogues natively (reference: src/tensorrt_config.rs:100-160).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Lane-tile chunks per grid step: whole-image chunks measured fastest
# (12288 lanes: 8.18 us/image vs 9.27 at 3072 on the pair probe).
_MAX_TILE_N = 16384


def _pick_tile(n: int) -> int:
    """Largest divisor of n that is a lane multiple and <= _MAX_TILE_N."""
    best = 0
    for t in range(128, min(n, _MAX_TILE_N) + 1, 128):
        if n % t == 0:
            best = t
    return best


def eligible(n_spatial: int) -> bool:
    return _pick_tile(n_spatial) > 0


def _qconv_kernel(x_ref, w_ref, sc_ref, b_ref, o_ref, *, act: str,
                  y_scale: float, out_min: int, out_max: int):
    """One image x one lane-chunk: s8 matmul + requant, all in VMEM.

    The activation runs on the DEQUANTIZED value (acc * x_s*w_s) and only
    then the output scale divides — order matters for non-homogeneous
    activations (silu/sigmoid/tanh); matches ops._requantize exactly."""
    acc = jax.lax.dot_general(
        w_ref[...], x_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    acc = acc + b_ref[...]
    v = acc.astype(jnp.float32) * sc_ref[...]
    if act == "relu":
        v = jnp.maximum(v, 0.0)
    elif act == "silu":
        v = v * jax.nn.sigmoid(v)
    elif act == "sigmoid":
        v = jax.nn.sigmoid(v)
    elif act == "tanh":
        v = jnp.tanh(v)
    # round-half-even (jnp.round) + saturate matches the ONNX semantics of
    # ops._requantize. True division by y_scale, NOT multiplication by a
    # precomputed reciprocal: the f32 reciprocal can be 1 ulp off, which
    # flips round-half-even boundary cases and breaks the bit-identical
    # contract with the XLA path.
    q = jnp.round(v / y_scale)
    # Bare lax max/min, not jnp.clip: clip is a nested jit whose i32[]
    # bound operands pallas rejects as captured constants under some trace
    # contexts (see also _NO_FOLD_OPS in compiler/importer.py).
    q = jax.lax.max(q, jnp.full((), out_min, q.dtype))
    q = jax.lax.min(q, jnp.full((), out_max, q.dtype))
    o_ref[0] = q.astype(o_ref.dtype)


def qconv1x1_requant(
    x,            # [B, C_in, N] int8 (N = flattened spatial)
    w,            # [C_out, C_in] int8
    bias_i32,     # [C_out] int32 at scale x_s*w_s (or None)
    scale,        # [C_out] f32 = x_s * w_s  (dequant multiplier)
    y_scale: float,  # static output requant scale (divides)
    act: str = "",
    out_dtype=jnp.int8,
    interpret: bool = False,
):
    """Fused quantized 1x1 conv. Returns [B, C_out, N] ``out_dtype``."""
    b_dim, c_in, n = x.shape
    c_out = w.shape[0]
    tile = _pick_tile(n)
    if tile <= 0:
        raise ValueError(f"spatial size {n} is not a lane multiple")
    if bias_i32 is None:
        bias_i32 = jnp.zeros((c_out,), jnp.int32)
    info = jnp.iinfo(out_dtype)
    kern = functools.partial(
        _qconv_kernel, act=act, y_scale=float(y_scale),
        out_min=int(info.min), out_max=int(info.max)
    )
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b_dim, c_out, n), out_dtype),
        grid=(b_dim, n // tile),
        in_specs=[
            pl.BlockSpec((1, c_in, tile), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, c_in), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c_out, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c_out, tile), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(
        x,
        w,
        jnp.asarray(scale, jnp.float32).reshape(-1, 1),
        jnp.asarray(bias_i32, jnp.int32).reshape(-1, 1),
    )
