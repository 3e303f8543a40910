"""Whole-backbone-prefix VMEM megakernel: stem + stages 1-3 per segment.

Round-1 analysis (docs/performance.md) put the MBConv backbone at XLA's
HBM byte-roofline: every conv materializes its activations, so the early
high-resolution stages (stem + the first six blocks = 75% of model time,
23.4 us/segment measured at tile 128) are bandwidth-bound. This kernel
runs that whole prefix for one segment inside VMEM: HBM sees only the
96x512 mel image in (bf16, ~98 KB) and the stage-3 activations out
(~123 KB) — everything between lives in registers/VMEM.

Design: the **polyphase-plane layout**. Mosaic supports neither strided
slices nor lane-granular gathers, so stride-2 convolutions cannot
subsample in-kernel directly. Instead every activation at resolution
(H, W) = (a·12, b·64) is stored flat as ``[C, P·768]`` where the P = a·b
*phase planes* interleave the image: plane (ry, rx) holds
``orig[y = a·i + ry, x = b·j + rx]`` flattened to 768 = 12·64 lanes.
Under this layout:

- a 3x3 tap at offset (dy, dx) maps to a *different plane* at the same
  (i, j) — a free lane-slice — except at phase boundaries, where it is a
  lane-roll by ±64/±1 with a precomputed edge mask (conv zero padding);
- **stride-2 subsampling is plane selection**: the stride-2 output's
  plane enumeration simply consumes the even input phases — no data
  movement at all;
- 1x1 convs are MXU matmuls ``[C_out, C_in] @ [C_in, P·768]`` on the
  flat layout, unchanged.

The per-plane tap loops operate on [C, 768] slices, which Mosaic keeps
register-resident — measured ~18x faster than the full-width roll/mask
formulation of ops/pallas/block2.py (the round-1 kernel this supersedes).

Exactness envelope (BirdNET v2.4 shapes): H divisible by 8 and
W + 1 divisible by 512-alignment — for the 96x511 mel image the single
padded zero column at x = 511 IS the conv's own SAME-padding column, so
the kernel is semantically exact, not approximate. Models whose widths
need more than one pad column (v3.0/Perch at 568 frames) are out of the
v1 envelope and fall back to the XLA path.

``fast_act=True`` replaces ``jax.nn.sigmoid`` in the big silu epilogues
with ``1/(1+exp(-x))`` using Mosaic's approximate reciprocal: measured
4x faster (10.4 -> 2.6 us per [96,12288] pass) at ~1e-3 relative error —
below the bf16 activation roundoff the `fast` policy already accepts.
The SE gates (tiny tensors) always use the exact sigmoid.

Reference context: the reference gets this fusion for free from the ONNX
Runtime / TensorRT engine's fused blocks (reference:
src/tensorrt_config.rs:100-160); XLA cannot fuse across convolutions, so
on TPU this kernel is the native equivalent.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BASE_H = 12
BASE_W = 64
LANES = BASE_H * BASE_W  # 768


@dataclass(frozen=True)
class BlockGeom:
    """One MBConv block's static configuration."""

    c_in: int
    c_mid: int
    c_se: int
    c_out: int
    stride: int       # 1 or 2 (applies to the depthwise conv)
    residual: bool


def tap_source(a: int, b: int, s: int, ry_o: int, rx_o: int,
               dy: int, dx: int):
    """(input plane, i-shift, j-shift) for tap (dy, dx) in {-1,0,1}^2 of a
    pad-1 3x3 conv with stride ``s``, output phase (ry_o, rx_o), input
    phase grid (a, b)."""
    qy = s * ry_o + dy
    qx = s * rx_o + dx
    ish = jsh = 0
    if qy < 0:
        qy += a
        ish = -1
    elif qy >= a:
        qy -= a
        ish = 1
    if qx < 0:
        qx += b
        jsh = -1
    elif qx >= b:
        qx -= b
        jsh = 1
    return qy * b + qx, ish, jsh


def edge_masks() -> np.ndarray:
    """[9, LANES] f32 masks indexed by k = (ish+1)*3 + (jsh+1): zero at the
    base-grid rows/cols whose shifted source would wrap (= conv zero pad)."""
    pos = np.arange(LANES)
    i, j = pos // BASE_W, pos % BASE_W
    m_i = {-1: i > 0, 0: np.ones(LANES, bool), 1: i < BASE_H - 1}
    m_j = {-1: j > 0, 0: np.ones(LANES, bool), 1: j < BASE_W - 1}
    rows = []
    for ish in (-1, 0, 1):
        for jsh in (-1, 0, 1):
            rows.append((m_i[ish] & m_j[jsh]).astype(np.float32))
    return np.stack(rows)


def _silu(v, fast: bool):
    if fast:
        return v * pl.reciprocal(1.0 + jnp.exp(-v), approx=True)
    return v * jax.nn.sigmoid(v)


def _mm(w_ref, x, compute_dtype):
    """[C_out, C_in] @ [C_in, N] with f32 accumulation."""
    return jax.lax.dot_general(
        w_ref[...], x.astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _build_kernel(blocks: Sequence[BlockGeom], fast_act: bool,
                  compute_dtype):
    """Generate the kernel body. Ref order:
    img, stem_w, stem_b, (w1,b1,wd,bd,se1,bse1,se2,bse2,w3,b3)*blocks,
    masks, out."""

    def rollmask(v, ish, jsh, masks_ref):
        d = ish * BASE_W + jsh
        if d:
            v = pltpu.roll(v, (-d) % LANES, axis=1)
        if ish or jsh:
            k = (ish + 1) * 3 + (jsh + 1)
            v = v * masks_ref[k:k + 1, :]
        return v

    # Channel-chunk size for the per-plane tap loops: a [32, 768] slice is
    # 24 vregs, so the 3 live tap sources + accumulator stay register-
    # resident. Wider slices ([160, 768] = 120 vregs each) spill to VMEM
    # per term — measured 13x slower on the stage-2 block.
    C_CHUNK = 32

    def depthwise(h1, c_mid, a, b, s, wd_ref, bd_ref, masks_ref):
        """Per-(channel-chunk, plane) taps:
        h1 f32 [C, a*b*L] -> silu(dw+bd) f32 planes."""
        a_o, b_o = a // s, b // s
        out_planes = []
        for ry_o in range(a_o):
            for rx_o in range(b_o):
                chunks = []
                for c0 in range(0, c_mid, C_CHUNK):
                    c1 = min(c0 + C_CHUNK, c_mid)
                    acc = None
                    for dy in (-1, 0, 1):
                        for dx in (-1, 0, 1):
                            p_in, ish, jsh = tap_source(
                                a, b, s, ry_o, rx_o, dy, dx)
                            src = h1[c0:c1,
                                     p_in * LANES:(p_in + 1) * LANES]
                            src = rollmask(src, ish, jsh, masks_ref)
                            t = (dy + 1) * 3 + (dx + 1)
                            term = src * wd_ref[c0:c1, t][:, None]
                            acc = term if acc is None else acc + term
                    chunks.append(
                        _silu(acc + bd_ref[c0:c1, :], fast_act))
                out_planes.append(
                    chunks[0] if len(chunks) == 1
                    else jnp.concatenate(chunks, axis=0)
                )
        return out_planes

    def kernel(*refs):
        img_ref, stem_w_ref, stem_b_ref = refs[0], refs[1], refs[2]
        block_refs = refs[3:3 + 10 * len(blocks)]
        masks_ref = refs[3 + 10 * len(blocks)]
        o_ref = refs[-1]

        # ---- stem: 1-channel 3x3 stride-2 conv (+folded BN) + silu ----
        img = img_ref[0].astype(jnp.float32)  # [64, L]
        stem_planes = []
        for ry_o in range(4):
            for rx_o in range(4):
                acc = None
                for dy in (-1, 0, 1):
                    for dx in (-1, 0, 1):
                        p_in, ish, jsh = tap_source(8, 8, 2, ry_o, rx_o, dy, dx)
                        src = img[p_in:p_in + 1, :]
                        src = rollmask(src, ish, jsh, masks_ref)
                        t = (dy + 1) * 3 + (dx + 1)
                        term = stem_w_ref[:, t][:, None] * src
                        acc = term if acc is None else acc + term
                stem_planes.append(_silu(acc + stem_b_ref[...], fast_act))
        x = jnp.concatenate(
            [p.astype(compute_dtype) for p in stem_planes], axis=1
        )  # [32, 16*L]

        # ---- MBConv blocks ----
        a = b = 4
        for bi, geom in enumerate(blocks):
            (w1_ref, b1_ref, wd_ref, bd_ref, se1_ref, bse1_ref, se2_ref,
             bse2_ref, w3_ref, b3_ref) = block_refs[10 * bi:10 * bi + 10]
            s = geom.stride
            # expand 1x1 + silu (f32 through the depthwise rolls)
            h1 = _silu(_mm(w1_ref, x, compute_dtype) + b1_ref[...], fast_act)
            # depthwise 3x3 (stride folds into plane enumeration)
            planes = depthwise(h1, geom.c_mid, a, b, s, wd_ref, bd_ref,
                               masks_ref)
            h2 = jnp.concatenate(planes, axis=1)  # [C_mid, (a//s)*(b//s)*L]
            a, b = a // s, b // s
            # squeeze-excitation (reduce-formulated channel contractions;
            # exact sigmoid — tiny tensors)
            gap = jnp.mean(h2, axis=1, keepdims=True)  # [C_mid, 1]
            s1 = _silu(
                jnp.sum(se1_ref[...] * gap[:, 0][None, :], axis=1,
                        keepdims=True) + bse1_ref[...],
                False,
            )
            s2 = jax.nn.sigmoid(
                jnp.sum(se2_ref[...] * s1[:, 0][None, :], axis=1,
                        keepdims=True) + bse2_ref[...]
            )
            h3 = (h2 * s2).astype(compute_dtype)
            # project 1x1 (+ residual)
            y = _mm(w3_ref, h3, compute_dtype) + b3_ref[...]
            if geom.residual:
                y = y + x.astype(jnp.float32)
            x = y.astype(compute_dtype)

        o_ref[0] = x.astype(o_ref.dtype)

    return kernel


def _colv(v):
    return jnp.asarray(v, jnp.float32).reshape(-1, 1)


def _wtaps(wd):
    """ONNX depthwise [C,1,3,3] (or stem [C,1,3,3]) -> [C, 16] tap table
    (9 taps, lane-padded). jnp-based: weights may be jit tracers when the
    engine threads params through the forward (compiler/importer.py)."""
    wd = jnp.asarray(wd, jnp.float32).reshape(wd.shape[0], 9)
    return jnp.pad(wd, ((0, 0), (0, 7)))


def stage_stack_forward(
    img_planes,                # [N, 64, LANES] (bf16 or f32)
    stem_w,                    # [32, 1, 3, 3] (BN-folded)
    stem_b,                    # [32]
    block_weights: List[dict],  # per block: w1,b1,wd,bd,se1,bse1,se2,bse2,w3,b3
    blocks: Sequence[BlockGeom],
    fast_act: bool = False,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
):
    """Run the fused stem+stage prefix. Returns [N, C_out_last, LANES]
    (final resolution planes = row-major [12, 64])."""
    n = img_planes.shape[0]
    c_last = blocks[-1].c_out
    s_total = int(np.prod([g.stride for g in blocks]))
    p_last = (4 // s_total) * (4 // s_total)
    out_lanes = p_last * LANES
    kern = _build_kernel(blocks, fast_act, compute_dtype)

    def const_spec(shape):
        nd = len(shape)
        return pl.BlockSpec(shape, lambda i, _nd=nd: (0,) * _nd,
                            memory_space=pltpu.VMEM)

    c_stem = stem_w.shape[0]
    in_specs = [
        pl.BlockSpec((1, 64, LANES), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        const_spec((c_stem, 16)),
        const_spec((c_stem, 1)),
    ]
    args = [
        img_planes,
        jnp.asarray(_wtaps(stem_w)),
        _colv(stem_b),
    ]
    for geom, bw in zip(blocks, block_weights):
        w1 = jnp.asarray(bw["w1"], jnp.float32).reshape(geom.c_mid, geom.c_in)
        se1 = jnp.asarray(bw["se1"], jnp.float32).reshape(geom.c_se, geom.c_mid)
        se2 = jnp.asarray(bw["se2"], jnp.float32).reshape(geom.c_mid, geom.c_se)
        w3 = jnp.asarray(bw["w3"], jnp.float32).reshape(geom.c_out, geom.c_mid)
        args += [
            w1.astype(compute_dtype), _colv(bw["b1"]),
            jnp.asarray(_wtaps(bw["wd"])), _colv(bw["bd"]),
            se1, _colv(bw["bse1"]),
            se2, _colv(bw["bse2"]),
            w3.astype(compute_dtype), _colv(bw["b3"]),
        ]
        in_specs += [
            const_spec((geom.c_mid, geom.c_in)), const_spec((geom.c_mid, 1)),
            const_spec((geom.c_mid, 16)), const_spec((geom.c_mid, 1)),
            const_spec((geom.c_se, geom.c_mid)), const_spec((geom.c_se, 1)),
            const_spec((geom.c_mid, geom.c_se)), const_spec((geom.c_mid, 1)),
            const_spec((geom.c_out, geom.c_mid)), const_spec((geom.c_out, 1)),
        ]
    args.append(jnp.asarray(edge_masks()))
    in_specs.append(const_spec((9, LANES)))

    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((n, c_last, out_lanes),
                                       img_planes.dtype),
        grid=(n,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, c_last, out_lanes), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(*args)


# ---------------------------------------------------------------------------
# host/XLA-side layout helpers
# ---------------------------------------------------------------------------


def to_planes(img):
    """[N, 1, 96, W] mel image -> [N, 64, LANES] polyphase planes.

    W is padded up to 512 with zeros; exactness requires at most ONE pad
    column (the conv's own SAME-padding column) — i.e. W in {511, 512}.
    """
    n, c, h, w = img.shape
    if c != 1 or h != 8 * BASE_H:
        raise ValueError(f"stem input must be [N,1,96,W], got {img.shape}")
    wp = 8 * BASE_W
    if w > wp or wp - w > 1:
        raise ValueError(
            f"width {w} outside the exact envelope ({wp - 1}..{wp})"
        )
    if w < wp:
        img = jnp.pad(img, ((0, 0), (0, 0), (0, 0), (0, wp - w)))
    # y = 8i + ry, x = 8j + rx
    x = img.reshape(n, BASE_H, 8, BASE_W, 8)          # [n, i, ry, j, rx]
    x = x.transpose(0, 2, 4, 1, 3)                     # [n, ry, rx, i, j]
    return x.reshape(n, 64, LANES)


def from_planes(y, a: int = 1, b: int = 1):
    """[N, C, a*b*LANES] polyphase planes -> [N, C, a*12, b*64] NCHW.

    Inverse of the plane interleave: plane (ry, rx) holds
    ``orig[y = a*i + ry, x = b*j + rx]``, so H groups as (i, ry) and W as
    (j, rx). ``a = b = 1`` is the fully-subsampled final resolution."""
    n, c, _ = y.shape
    if a == 1 and b == 1:
        return y.reshape(n, c, BASE_H, BASE_W)
    y = y.reshape(n, c, a, b, BASE_H, BASE_W)      # [n, c, ry, rx, i, j]
    y = y.transpose(0, 1, 4, 2, 5, 3)              # [n, c, i, ry, j, rx]
    return y.reshape(n, c, a * BASE_H, b * BASE_W)
