"""Long-tail ONNX operators: spatial sampling, losses, random, sequences.

Registered into the same registry as ``ops.py`` (imported from its tail).
These complete the ai.onnx core-domain coverage beyond what the flagship
audio models use — the reference reaches the full ONNX Runtime kernel
library through ``ort`` (reference: src/classifier.rs:637-639), so graphs
using any core op must load here too.

Design notes (TPU/XLA semantics):

- **Trace-time dynamic-shape ops** (NonZero, Unique, Compress's condition,
  NonMaxSuppression): their output shapes depend on data, which XLA cannot
  compile. They are supported when the deciding inputs are compile-time
  constants (initializer-derived chains fold to numpy in this importer) and
  raise a clear error otherwise.
- **Sequence/Optional types** are trace-time containers: a sequence is a
  Python list flowing through the interpreter environment, an absent
  optional is ``None``. Element compute stays on device; only the list
  structure is host-side, mirroring how ONNX Runtime keeps sequences as
  host objects of device tensors.
- **Random ops** are seeded at trace time: the ``seed`` attribute (or a
  stable hash of the node name when absent) derives a ``jax.random`` key,
  so a compiled program is deterministic — same behavior as ONNX with an
  explicit seed; with no seed ONNX leaves determinism implementation-
  defined and we choose reproducibility.
"""

from __future__ import annotations

import zlib

import jax
import jax.numpy as jnp
import numpy as np

from .ops import (
    _ONNX_TO_NP,
    OpContext,
    _is_static,
    _keys_cubic,
    _run_subgraph,
    _static_int,
    _static_ints,
    get_lowering,
    op,
)

# ---------------------------------------------------------------------------
# trivial math
# ---------------------------------------------------------------------------


@op("Acosh")
def _acosh(ctx, x):
    return [jnp.arccosh(x)]


@op("Asinh")
def _asinh(ctx, x):
    return [jnp.arcsinh(x)]


@op("Atanh")
def _atanh(ctx, x):
    return [jnp.arctanh(x)]


@op("Swish")
def _swish(ctx, x):
    # opset 24: Swish(x) = x * sigmoid(alpha * x), alpha default 1.0
    alpha = float(ctx.attr("alpha", 1.0))
    return [x * jax.nn.sigmoid(alpha * x)]


@op("TensorScatter")
def _tensor_scatter(ctx, past, update, write_indices=None):
    """Opset-24 TensorScatter: batched in-place-style cache update (the
    KV-cache write behind fused attention). For each batch b the update
    rows land at ``write_indices[b] + i`` along ``axis`` (``linear``
    mode) or at that position modulo the cache length (``circular``).
    The reference reaches this through ORT's kernel
    (src/classifier.rs:637-639)."""
    # Static write_indices are bounds-checked below (JAX scatter silently
    # drops out-of-range rows where ORT errors); keep the host value. A
    # concrete value may arrive as a jax.Array too (constant-folded
    # Cast/Add chains), not just np.ndarray — anything non-Tracer counts.
    w_host = (
        np.asarray(write_indices)
        if write_indices is not None and _is_static(write_indices)
        else None
    )
    past = jnp.asarray(past)
    update = jnp.asarray(update)
    axis = int(ctx.attr("axis", -2))
    mode = ctx.attr("mode", b"linear")
    mode = mode.decode() if isinstance(mode, bytes) else str(mode)
    if mode not in ("linear", "circular"):
        raise ValueError(
            f"TensorScatter mode must be 'linear' or 'circular', got {mode!r}"
        )
    if axis < 0:
        axis += past.ndim
    if axis == 0:
        raise ValueError("TensorScatter axis cannot be the batch dimension")
    if past.ndim != update.ndim:
        raise ValueError(
            "TensorScatter past_cache and update must have the same rank; "
            f"got {past.ndim} vs {update.ndim}"
        )
    batch = past.shape[0]
    cache_len = past.shape[axis]
    upd_len = update.shape[axis]
    if upd_len > cache_len:
        raise ValueError(
            f"TensorScatter update length {upd_len} exceeds cache length "
            f"{cache_len} along axis {axis}"
        )
    if write_indices is None:
        w = jnp.zeros((batch,), dtype=jnp.int32)
    else:
        w = jnp.asarray(write_indices).astype(jnp.int32).reshape(batch)
    if w_host is not None and mode == "linear":
        wmax = int(np.max(w_host)) if w_host.size else 0
        wmin = int(np.min(w_host)) if w_host.size else 0
        if wmin < 0 or wmax + upd_len > cache_len:
            raise ValueError(
                f"TensorScatter linear write_indices out of range: writes "
                f"[{wmin}, {wmax + upd_len}) exceed cache length {cache_len}"
            )
    pos = w[:, None] + jnp.arange(upd_len, dtype=jnp.int32)[None, :]
    if mode == "circular":
        pos = pos % cache_len
    pastm = jnp.moveaxis(past, axis, 1)    # [B, S, rest...]
    updm = jnp.moveaxis(update, axis, 1)   # [B, S_u, rest...]

    def write_one(p, u, idx):
        return p.at[idx].set(u)

    outm = jax.vmap(write_one)(pastm, updm.astype(pastm.dtype), pos)
    return [jnp.moveaxis(outm, 1, axis)]


@op("MeanVarianceNormalization")
def _mvn(ctx, x):
    axes = tuple(ctx.attr("axes", (0, 2, 3)))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    # Spec formula is E(X^2) - (EX)^2, but that cancels to small NEGATIVE
    # values for near-constant inputs with large means (sqrt → NaN); the
    # two-pass form is mathematically identical and non-negative.
    var = jnp.mean(jnp.square(x - mean), axis=axes, keepdims=True)
    return [(x - mean) / jnp.sqrt(var)]


@op("Det")
def _det(ctx, x):
    return [jnp.linalg.det(x)]


# Deprecated opset-9 alias kept for old exporters (identical semantics to
# ScatterElements, which replaced it in opset 11).
op("Scatter")(get_lowering("ScatterElements"))


# ---------------------------------------------------------------------------
# shape surgery
# ---------------------------------------------------------------------------


@op("CenterCropPad")
def _center_crop_pad(ctx, x, shape):
    target = _static_ints(shape, "CenterCropPad shape")
    axes = ctx.attr("axes")
    if axes is None:
        axes = list(range(len(target)))
    rank = x.ndim
    axes = [a + rank if a < 0 else a for a in axes]
    for a, t in zip(axes, target):
        d = x.shape[a]
        if t < d:  # centered crop; extra element goes to the end slice
            start = (d - t) // 2
            x = jax.lax.slice_in_dim(x, start, start + t, axis=a)
        elif t > d:  # centered pad; extra zero goes to the end
            before = (t - d) // 2
            pads = [(0, 0)] * rank
            pads[a] = (before, t - d - before)
            x = jnp.pad(x, pads)
    return [x]


@op("Compress")
def _compress(ctx, x, condition):
    if not _is_static(condition):
        raise NotImplementedError(
            "Compress requires a compile-time-constant condition: the output "
            "length is data-dependent, which XLA cannot compile. Constant "
            "conditions (initializer-derived) are supported."
        )
    cond = np.asarray(condition).astype(bool).reshape(-1)
    axis = ctx.attr("axis")
    if axis is None:
        size = int(np.prod(x.shape))
        idx = np.flatnonzero(cond[:size])
        return [jnp.take(jnp.reshape(x, (-1,)), idx)]
    axis = int(axis)
    n = x.shape[axis]
    idx = np.flatnonzero(cond[:n])
    return [jnp.take(x, idx, axis=axis)]


@op("NonZero")
def _nonzero(ctx, x):
    if not _is_static(x):
        raise NotImplementedError(
            "NonZero on traced data has a data-dependent output shape, which "
            "XLA cannot compile; it is supported on compile-time constants "
            "(shape-computation chains fold to numpy in this importer)."
        )
    return [np.stack(np.nonzero(np.asarray(x))).astype(np.int64)]


@op("Unique")
def _unique(ctx, x):
    if not _is_static(x):
        raise NotImplementedError(
            "Unique has data-dependent output shapes; only compile-time-"
            "constant inputs are supported under XLA."
        )
    xv = np.asarray(x)
    axis = ctx.attr("axis")
    is_sorted = int(ctx.attr("sorted", 1))
    if axis is None:
        flat = xv.reshape(-1)
        y, index, inverse, counts = np.unique(
            flat, return_index=True, return_inverse=True, return_counts=True
        )
    else:
        axis = int(axis)
        y, index, inverse, counts = np.unique(
            xv, axis=axis, return_index=True, return_inverse=True,
            return_counts=True,
        )
    if not is_sorted:
        # First-occurrence order: permute the sorted uniques by where each
        # was first seen in the input.
        order = np.argsort(index, kind="stable")
        rank = np.empty_like(order)
        rank[order] = np.arange(len(order))
        y = np.take(y, order, axis=0 if axis is None else axis)
        index = index[order]
        counts = counts[order]
        inverse = rank[inverse]
    return [
        y,
        index.astype(np.int64),
        inverse.reshape(-1).astype(np.int64),
        counts.astype(np.int64),
    ]


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


def _nll_core(ctx, logp, target, weight, ignore_index, reduction):
    """Shared NLL: ``logp`` is [N, C, d...] log-probabilities (or raw values
    for NegativeLogLikelihoodLoss), ``target`` [N, d...] int class ids."""
    tgt = jnp.asarray(target).astype(jnp.int32)
    if ignore_index is not None:
        ignore = tgt == jnp.int32(ignore_index)
        safe_tgt = jnp.where(ignore, 0, tgt)
    else:
        ignore = jnp.zeros(tgt.shape, bool)
        safe_tgt = tgt
    # gather logp[n, target[n, d...], d...]
    moved = jnp.moveaxis(logp, 1, -1)  # [N, d..., C]
    picked = jnp.take_along_axis(moved, safe_tgt[..., None], axis=-1)[..., 0]
    if weight is not None:
        w = jnp.asarray(weight)[safe_tgt]
    else:
        w = jnp.ones(picked.shape, picked.dtype)
    w = jnp.where(ignore, 0, w).astype(picked.dtype)
    loss = -picked * w
    loss = jnp.where(ignore, 0, loss)
    if reduction == "none":
        return loss
    if reduction == "sum":
        return jnp.sum(loss)
    # mean: weighted mean over non-ignored elements
    return jnp.sum(loss) / jnp.sum(w)


@op("NegativeLogLikelihoodLoss")
def _nll_loss(ctx, x, target, weight=None):
    return [
        _nll_core(
            ctx, x, target, weight,
            ctx.attr("ignore_index"), ctx.attr("reduction", "mean"),
        )
    ]


@op("SoftmaxCrossEntropyLoss")
def _softmax_xent(ctx, scores, labels, weights=None):
    logp = jax.nn.log_softmax(scores, axis=1)
    loss = _nll_core(
        ctx, logp, labels, weights,
        ctx.attr("ignore_index"), ctx.attr("reduction", "mean"),
    )
    if ctx.num_outputs > 1:
        return [loss, logp]
    return [loss]


# ---------------------------------------------------------------------------
# random
# ---------------------------------------------------------------------------


# Trace-order draw counter stashed in the interpreter environment under a
# sentinel name no graph value can use. A mutable list survives the
# dict-copy into control-flow subgraphs, so every seedless random node —
# including the same node re-executed across unrolled Loop/SequenceMap
# iterations, and unnamed duplicate nodes — gets an independent stream,
# while retraces replay the same order and stay deterministic.
_RAND_COUNTER = "\x00rand_draws"


def _rand_key(ctx: OpContext):
    seed = ctx.attr("seed")
    if seed is not None:
        raw = int.from_bytes(np.float32(seed).tobytes(), "little")
    else:
        counter = ctx.env.setdefault(_RAND_COUNTER, [0])
        n = counter[0]
        counter[0] += 1
        raw = zlib.crc32(f"{ctx.node_name}:{ctx.op_type}:{n}".encode())
    return jax.random.PRNGKey(raw & 0x7FFFFFFF)


def _rand_dtype(ctx, default=jnp.float32):
    dt = ctx.attr("dtype")
    return _ONNX_TO_NP[int(dt)] if dt is not None else default


@op("RandomNormal")
def _random_normal(ctx):
    shape = tuple(int(s) for s in ctx.attr("shape"))
    dtype = _rand_dtype(ctx)
    mean = float(ctx.attr("mean", 0.0))
    scale = float(ctx.attr("scale", 1.0))
    return [jax.random.normal(_rand_key(ctx), shape, dtype) * scale + mean]


@op("RandomNormalLike")
def _random_normal_like(ctx, x):
    dtype = _rand_dtype(ctx, jnp.asarray(x).dtype)
    mean = float(ctx.attr("mean", 0.0))
    scale = float(ctx.attr("scale", 1.0))
    return [jax.random.normal(_rand_key(ctx), jnp.shape(x), dtype) * scale + mean]


@op("RandomUniform")
def _random_uniform(ctx):
    shape = tuple(int(s) for s in ctx.attr("shape"))
    dtype = _rand_dtype(ctx)
    low = float(ctx.attr("low", 0.0))
    high = float(ctx.attr("high", 1.0))
    return [jax.random.uniform(_rand_key(ctx), shape, dtype, low, high)]


@op("RandomUniformLike")
def _random_uniform_like(ctx, x):
    dtype = _rand_dtype(ctx, jnp.asarray(x).dtype)
    low = float(ctx.attr("low", 0.0))
    high = float(ctx.attr("high", 1.0))
    return [jax.random.uniform(_rand_key(ctx), jnp.shape(x), dtype, low, high)]


@op("Bernoulli")
def _bernoulli(ctx, x):
    x = jnp.asarray(x)
    dtype = _rand_dtype(ctx, x.dtype)
    u = jax.random.uniform(_rand_key(ctx), x.shape, x.dtype)
    return [(u < x).astype(dtype)]


@op("Multinomial")
def _multinomial(ctx, x):
    # Input [B, C]: unnormalized log-probabilities per class.
    x = jnp.asarray(x)
    sample_size = int(ctx.attr("sample_size", 1))
    dtype = _rand_dtype(ctx, jnp.int32)
    b = x.shape[0]
    samples = jax.random.categorical(
        _rand_key(ctx), x, axis=-1, shape=(sample_size, b)
    )
    return [samples.T.astype(dtype)]


# ---------------------------------------------------------------------------
# spatial sampling: GridSample / AffineGrid / RoiAlign / Col2Im / NMS
# ---------------------------------------------------------------------------


def _reflect(coord, lo, hi):
    """Reflect ``coord`` into [lo, hi] (torch grid_sampler semantics)."""
    span = hi - lo
    if span <= 0:  # size-1 axis under align_corners: the one valid coord
        return jnp.full_like(coord, lo)
    c = jnp.mod(coord - lo, 2 * span)
    c = span - jnp.abs(c - span)
    return c + lo


def _gs_unnormalize(g, size, align_corners):
    if align_corners:
        return (g + 1) * 0.5 * (size - 1)
    return ((g + 1) * size - 1) * 0.5


def _gs_index(coord, size, padding_mode, align_corners):
    """Map a (possibly OOB) continuous coordinate per padding mode. Returns
    (coord, None) — masking for 'zeros' happens at gather time."""
    if padding_mode == "border":
        return jnp.clip(coord, 0, size - 1)
    if padding_mode == "reflection":
        if align_corners:
            c = _reflect(coord, 0.0, float(size - 1))
        else:
            c = _reflect(coord, -0.5, size - 0.5)
        return jnp.clip(c, 0, size - 1)
    return coord  # zeros: keep raw, mask at gather


def _gs_gather(img, iy, ix, zeros_mask):
    """img [C,H,W]; iy/ix int arrays [...] (may be OOB under 'zeros')."""
    H, W = img.shape[1], img.shape[2]
    valid = (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    cy = jnp.clip(iy, 0, H - 1)
    cx = jnp.clip(ix, 0, W - 1)
    v = img[:, cy, cx]  # [C, ...]
    if zeros_mask:
        v = jnp.where(valid[None], v, 0)
    return v


def _cubic_weights(t, a=-0.75):
    """Cubic-convolution weights for the 4 taps around t in [0,1)
    (shared Keys kernel from ops.py, jnp backend)."""
    def k(x):
        return _keys_cubic(x, a, xp=jnp)

    return [k(t + 1), k(t), k(1 - t), k(2 - t)]


def _gs_gather3(img, iz, iy, ix, zeros_mask):
    """img [C,D,H,W]; iz/iy/ix int arrays (may be OOB under 'zeros')."""
    D, H, W = img.shape[1], img.shape[2], img.shape[3]
    valid = (
        (iz >= 0) & (iz < D) & (iy >= 0) & (iy < H) & (ix >= 0) & (ix < W)
    )
    cz = jnp.clip(iz, 0, D - 1)
    cy = jnp.clip(iy, 0, H - 1)
    cx = jnp.clip(ix, 0, W - 1)
    v = img[:, cz, cy, cx]  # [C, ...]
    if zeros_mask:
        v = jnp.where(valid[None], v, 0)
    return v


def _grid_sample_3d(ctx, x, grid, mode, padding, align):
    """Volumetric (5-D) GridSample, opset 20: nearest and trilinear; cubic
    is 2-D-only per the spec (and torch, whose semantics it mirrors)."""
    if mode == "cubic":
        raise NotImplementedError("GridSample mode=cubic is 2-D only")
    N, C, D, H, W = x.shape
    g = jnp.asarray(grid).astype(jnp.float32)  # [N, Do, Ho, Wo, 3] (x,y,z)
    fx = _gs_index(_gs_unnormalize(g[..., 0], W, align), W, padding, align)
    fy = _gs_index(_gs_unnormalize(g[..., 1], H, align), H, padding, align)
    fz = _gs_index(_gs_unnormalize(g[..., 2], D, align), D, padding, align)
    zeros = padding == "zeros"

    if mode == "nearest":
        ix = jnp.round(fx).astype(jnp.int32)
        iy = jnp.round(fy).astype(jnp.int32)
        iz = jnp.round(fz).astype(jnp.int32)
        out = jax.vmap(lambda img, z, y, xx: _gs_gather3(img, z, y, xx, zeros))(
            x, iz, iy, ix
        )
        return [out.astype(x.dtype)]

    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    z0 = jnp.floor(fz)
    wx, wy, wz = fx - x0, fy - y0, fz - z0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    z0 = z0.astype(jnp.int32)

    def one(img, z0, y0, x0, wz, wy, wx):
        acc = 0.0
        for dz, wzt in ((0, 1 - wz), (1, wz)):
            for dy, wyt in ((0, 1 - wy), (1, wy)):
                for dx, wxt in ((0, 1 - wx), (1, wx)):
                    v = _gs_gather3(img, z0 + dz, y0 + dy, x0 + dx, zeros)
                    acc = acc + v * (wzt * wyt * wxt)[None]
        return acc

    out = jax.vmap(one)(x, z0, y0, x0, wz, wy, wx)
    return [out.astype(x.dtype)]


@op("GridSample")
def _grid_sample(ctx, x, grid):
    """GridSample (opset 16 'bilinear/bicubic' and opset 20
    'linear/cubic' spellings), 4-D planar and 5-D volumetric inputs,
    padding zeros/border/reflection, align_corners — semantics match
    torch.nn.functional.grid_sample, which the ONNX spec was modeled on."""
    x = jnp.asarray(x)
    if x.ndim not in (4, 5):
        raise NotImplementedError(
            f"GridSample supports 4-D [N,C,H,W] or 5-D [N,C,D,H,W] inputs; "
            f"got rank {x.ndim}"
        )
    if x.ndim == 5:
        mode5 = {"bilinear": "linear", "bicubic": "cubic"}.get(
            ctx.attr("mode", "linear"), ctx.attr("mode", "linear")
        )
        return _grid_sample_3d(
            ctx, x, grid, mode5, ctx.attr("padding_mode", "zeros"),
            bool(int(ctx.attr("align_corners", 0))),
        )
    mode = {"bilinear": "linear", "bicubic": "cubic"}.get(
        ctx.attr("mode", "linear"), ctx.attr("mode", "linear")
    )
    padding = ctx.attr("padding_mode", "zeros")
    align = bool(int(ctx.attr("align_corners", 0)))
    N, C, H, W = x.shape
    g = jnp.asarray(grid).astype(jnp.float32)  # [N, Ho, Wo, 2] (x, y)
    fx = _gs_unnormalize(g[..., 0], W, align)
    fy = _gs_unnormalize(g[..., 1], H, align)
    zeros = padding == "zeros"

    if mode == "nearest":
        fx = _gs_index(fx, W, padding, align)
        fy = _gs_index(fy, H, padding, align)
        ix = jnp.round(fx).astype(jnp.int32)
        iy = jnp.round(fy).astype(jnp.int32)

        def one(img, iy, ix):
            return _gs_gather(img, iy, ix, zeros)

        out = jax.vmap(one)(x, iy, ix)  # [N, C, Ho, Wo]
        return [out.astype(x.dtype)]

    if mode == "linear":
        fx = _gs_index(fx, W, padding, align)
        fy = _gs_index(fy, H, padding, align)
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        wx = fx - x0
        wy = fy - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)

        def one(img, y0, x0, wy, wx):
            v00 = _gs_gather(img, y0, x0, zeros)
            v01 = _gs_gather(img, y0, x0 + 1, zeros)
            v10 = _gs_gather(img, y0 + 1, x0, zeros)
            v11 = _gs_gather(img, y0 + 1, x0 + 1, zeros)
            top = v00 * (1 - wx)[None] + v01 * wx[None]
            bot = v10 * (1 - wx)[None] + v11 * wx[None]
            return top * (1 - wy)[None] + bot * wy[None]

        out = jax.vmap(one)(x, y0, x0, wy, wx)
        return [out.astype(x.dtype)]

    if mode == "cubic":
        # Padding is applied per-tap on the integer pixel index
        # (torch get_value_bounded): reflect/clip the tap coordinate, or
        # zero-mask OOB taps under 'zeros'.
        x0 = jnp.floor(fx)
        y0 = jnp.floor(fy)
        tx = fx - x0
        ty = fy - y0

        def tap_coord(base, off, size):
            c = base + off
            if padding in ("border", "reflection"):
                return _gs_index(c, size, padding, align).astype(jnp.int32)
            return c.astype(jnp.int32)

        def one(img, y0, x0, tx, ty):
            wxs = _cubic_weights(tx)
            wys = _cubic_weights(ty)
            acc = 0.0
            for j in range(4):
                iy = tap_coord(y0, j - 1, H)
                row = 0.0
                for i in range(4):
                    ix = tap_coord(x0, i - 1, W)
                    row = row + _gs_gather(img, iy, ix, zeros) * wxs[i][None]
                acc = acc + row * wys[j][None]
            return acc

        out = jax.vmap(one)(x, y0, x0, tx, ty)
        return [out.astype(x.dtype)]

    raise NotImplementedError(f"GridSample mode {mode!r}")


@op("AffineGrid")
def _affine_grid(ctx, theta, size):
    dims = _static_ints(size, "AffineGrid size")
    align = bool(int(ctx.attr("align_corners", 0)))
    spatial = dims[2:]
    nd = len(spatial)
    if nd not in (2, 3):
        raise NotImplementedError("AffineGrid supports 2-D or 3-D spatial")

    def base(d):
        if align:
            return jnp.linspace(-1.0, 1.0, d)
        return (2 * jnp.arange(d, dtype=jnp.float32) + 1) / d - 1

    # Coordinate order within a grid point is (x, y[, z]) = reversed spatial.
    axes = [base(d) for d in spatial]
    mesh = jnp.meshgrid(*axes, indexing="ij")  # each [*spatial]
    coords = jnp.stack(list(reversed(mesh)) + [jnp.ones(spatial)], axis=-1)
    th = jnp.asarray(theta).astype(coords.dtype)  # [N, nd, nd+1]
    out = jnp.einsum("...k,njk->n...j", coords, th)
    return [out.astype(jnp.asarray(theta).dtype)]


def _roi_bilinear(img, y, x):
    """ORT/Caffe2 bilinear_interpolate: img [C,H,W], y/x scalar arrays of
    sample points; points outside [-1, size] contribute 0."""
    H, W = img.shape[1], img.shape[2]
    invalid = (y < -1.0) | (y > H) | (x < -1.0) | (x > W)
    y = jnp.clip(y, 0.0, None)
    x = jnp.clip(x, 0.0, None)
    y_low = jnp.minimum(jnp.floor(y), H - 1).astype(jnp.int32)
    x_low = jnp.minimum(jnp.floor(x), W - 1).astype(jnp.int32)
    y_high = jnp.minimum(y_low + 1, H - 1)
    x_high = jnp.minimum(x_low + 1, W - 1)
    ly = jnp.clip(y - y_low, 0.0, 1.0)
    lx = jnp.clip(x - x_low, 0.0, 1.0)
    v = (
        img[:, y_low, x_low] * ((1 - ly) * (1 - lx))[None]
        + img[:, y_low, x_high] * ((1 - ly) * lx)[None]
        + img[:, y_high, x_low] * (ly * (1 - lx))[None]
        + img[:, y_high, x_high] * (ly * lx)[None]
    )
    return jnp.where(invalid[None], 0.0, v)


@op("RoiAlign")
def _roi_align(ctx, x, rois, batch_indices):
    orig_dtype = jnp.asarray(x).dtype
    x = jnp.asarray(x).astype(jnp.float32)
    out_h = int(ctx.attr("output_height", 1))
    out_w = int(ctx.attr("output_width", 1))
    ratio = int(ctx.attr("sampling_ratio", 0))
    scale = float(ctx.attr("spatial_scale", 1.0))
    mode = ctx.attr("mode", "avg")
    coord_mode = ctx.attr("coordinate_transformation_mode", "half_pixel")
    offset = 0.5 if coord_mode == "half_pixel" else 0.0

    if ratio <= 0 and not _is_static(rois):
        raise NotImplementedError(
            "RoiAlign with sampling_ratio=0 derives per-ROI sample counts "
            "from the ROI size (data-dependent shapes); pass a positive "
            "sampling_ratio or compile-time-constant ROIs."
        )

    if not _is_static(batch_indices):
        raise NotImplementedError(
            "RoiAlign batch_indices must be compile-time constants"
        )
    bidx = _static_ints(batch_indices, "RoiAlign batch_indices")

    def one_roi(img, roi, grid_h, grid_w):
        x1 = roi[0] * scale - offset
        y1 = roi[1] * scale - offset
        x2 = roi[2] * scale - offset
        y2 = roi[3] * scale - offset
        roi_w = x2 - x1
        roi_h = y2 - y1
        if coord_mode != "half_pixel":  # legacy: clamp degenerate ROIs
            roi_w = jnp.maximum(roi_w, 1.0)
            roi_h = jnp.maximum(roi_h, 1.0)
        bin_h = roi_h / out_h
        bin_w = roi_w / out_w
        # sample points: centers of a grid_h x grid_w lattice per bin
        py = (jnp.arange(out_h)[:, None] * bin_h + y1
              + (jnp.arange(grid_h, dtype=jnp.float32)[None] + 0.5)
              * bin_h / grid_h)  # [out_h, grid_h]
        px = (jnp.arange(out_w)[:, None] * bin_w + x1
              + (jnp.arange(grid_w, dtype=jnp.float32)[None] + 0.5)
              * bin_w / grid_w)  # [out_w, grid_w]
        yy = py.reshape(-1)  # [out_h*grid_h]
        xx = px.reshape(-1)  # [out_w*grid_w]
        gy, gx = jnp.meshgrid(yy, xx, indexing="ij")
        vals = _roi_bilinear(img, gy.reshape(-1), gx.reshape(-1))
        vals = vals.reshape(img.shape[0], out_h, grid_h, out_w, grid_w)
        if mode == "max":
            return jnp.max(vals, axis=(2, 4))
        return jnp.mean(vals, axis=(2, 4))

    outs = []
    rois_static = _is_static(rois)
    rois_arr = np.asarray(rois) if rois_static else jnp.asarray(rois)
    for i, b in enumerate(bidx):
        roi = rois_arr[i]
        if ratio > 0:
            gh = gw = ratio
        else:  # static ROI: adaptive ceil(roi_size / out_size)
            rw = max(float(roi[2] - roi[0]) * scale, 1.0)
            rh = max(float(roi[3] - roi[1]) * scale, 1.0)
            gh = max(int(np.ceil(rh / out_h)), 1)
            gw = max(int(np.ceil(rw / out_w)), 1)
        outs.append(one_roi(x[b], jnp.asarray(roi, jnp.float32), gh, gw))
    return [jnp.stack(outs).astype(orig_dtype)]


@op("Col2Im")
def _col2im(ctx, data, image_shape, block_shape):
    img_dims = _static_ints(image_shape, "Col2Im image_shape")
    blk_dims = _static_ints(block_shape, "Col2Im block_shape")
    nd = len(img_dims)
    dil = list(ctx.attr("dilations", [1] * nd))
    pads = list(ctx.attr("pads", [0] * (2 * nd)))
    strides = list(ctx.attr("strides", [1] * nd))
    n_pos = [
        (img_dims[d] + pads[d] + pads[nd + d] - dil[d] * (blk_dims[d] - 1) - 1)
        // strides[d] + 1
        for d in range(nd)
    ]
    L = int(np.prod(n_pos))
    P = int(np.prod(blk_dims))
    data = jnp.asarray(data)
    if data.shape[2] != L:
        raise ValueError(
            f"Col2Im data has {data.shape[2]} block positions but the "
            f"image/block/stride geometry implies {L}"
        )
    if data.shape[1] % P:
        raise ValueError(
            f"Col2Im data channel dim {data.shape[1]} is not a multiple of "
            f"the block size {P}"
        )
    N = data.shape[0]
    C = data.shape[1] // P
    img_size = int(np.prod(img_dims))

    # Static index map [P, L] → flattened image index (or img_size marker
    # for padding positions, dropped by the scatter).
    k_idx = np.stack(
        np.meshgrid(*[np.arange(b) for b in blk_dims], indexing="ij"), -1
    ).reshape(P, nd)
    p_idx = np.stack(
        np.meshgrid(*[np.arange(n) for n in n_pos], indexing="ij"), -1
    ).reshape(L, nd)
    coords = (
        p_idx[None] * np.asarray(strides)
        + k_idx[:, None] * np.asarray(dil)
        - np.asarray(pads[:nd])
    )  # [P, L, nd]
    valid = np.all((coords >= 0) & (coords < np.asarray(img_dims)), axis=-1)
    flat = np.zeros((P, L), np.int64)
    mult = 1
    for d in range(nd - 1, -1, -1):
        flat += coords[..., d] * mult
        mult *= img_dims[d]
    flat = np.where(valid, flat, img_size)  # marker → dropped

    patches = data.reshape(N, C, P, L)
    out = jnp.zeros((N, C, img_size), patches.dtype)
    out = out.at[:, :, flat.reshape(-1)].add(
        patches.reshape(N, C, -1), mode="drop"
    )
    return [out.reshape((N, C) + tuple(img_dims))]


@op("NonMaxSuppression")
def _nms(ctx, boxes, scores, max_out=None, iou_thr=None, score_thr=None):
    for name, v in (("boxes", boxes), ("scores", scores), ("max", max_out),
                    ("iou", iou_thr), ("score", score_thr)):
        if v is not None and not _is_static(v):
            raise NotImplementedError(
                "NonMaxSuppression has a data-dependent output shape; only "
                f"compile-time-constant inputs are supported (got traced {name})."
            )
    boxes = np.asarray(boxes, np.float32)  # [B, nb, 4]
    scores = np.asarray(scores, np.float32)  # [B, nc, nb]
    # Spec: max_output_boxes_per_class defaults to 0, which means NO output.
    max_per_class = (
        int(np.asarray(max_out).reshape(-1)[0])
        if max_out is not None and np.asarray(max_out).size else 0
    )
    if max_per_class <= 0:
        return [np.zeros((0, 3), np.int64)]
    iou_t = float(np.asarray(iou_thr).reshape(-1)[0]) if iou_thr is not None else 0.0
    score_t = (
        float(np.asarray(score_thr).reshape(-1)[0]) if score_thr is not None else None
    )
    center = bool(int(ctx.attr("center_point_box", 0)))

    def corners(b):
        if center:
            cx, cy, w, h = b[:, 0], b[:, 1], b[:, 2], b[:, 3]
            return np.stack(
                [cy - h / 2, cx - w / 2, cy + h / 2, cx + w / 2], axis=1
            )
        y1 = np.minimum(b[:, 0], b[:, 2])
        y2 = np.maximum(b[:, 0], b[:, 2])
        x1 = np.minimum(b[:, 1], b[:, 3])
        x2 = np.maximum(b[:, 1], b[:, 3])
        return np.stack([y1, x1, y2, x2], axis=1)

    def iou(a, bs):
        yy1 = np.maximum(a[0], bs[:, 0])
        xx1 = np.maximum(a[1], bs[:, 1])
        yy2 = np.minimum(a[2], bs[:, 2])
        xx2 = np.minimum(a[3], bs[:, 3])
        inter = np.clip(yy2 - yy1, 0, None) * np.clip(xx2 - xx1, 0, None)
        area_a = (a[2] - a[0]) * (a[3] - a[1])
        area_b = (bs[:, 2] - bs[:, 0]) * (bs[:, 3] - bs[:, 1])
        union = area_a + area_b - inter
        return np.where(union > 0, inter / union, 0.0)

    selected = []
    for b in range(boxes.shape[0]):
        cb = corners(boxes[b])
        for c in range(scores.shape[1]):
            sc = scores[b, c]
            cand = np.arange(sc.shape[0])
            if score_t is not None:
                cand = cand[sc[cand] > score_t]
            cand = cand[np.argsort(-sc[cand], kind="stable")]
            kept = []
            for i in cand:
                if max_per_class and len(kept) >= max_per_class:
                    break
                if kept and np.any(iou(cb[i], cb[np.asarray(kept)]) > iou_t):
                    continue
                kept.append(i)
            selected.extend((b, c, int(i)) for i in kept)
    return [np.asarray(selected, np.int64).reshape(-1, 3)]


# ---------------------------------------------------------------------------
# sequences (trace-time Python lists of device tensors)
# ---------------------------------------------------------------------------


@op("SequenceEmpty")
def _sequence_empty(ctx):
    return [[]]


@op("SequenceConstruct")
def _sequence_construct(ctx, *tensors):
    return [list(tensors)]


@op("SequenceLength")
def _sequence_length(ctx, s):
    return [np.int64(len(s))]


def _seq_pos(pos, n, what, insert=False):
    p = _static_int(pos, f"{what} position")
    hi = n if insert else n - 1
    if p < -n or p > hi:
        raise ValueError(f"{what} position {p} out of range for length {n}")
    return p


@op("SequenceAt")
def _sequence_at(ctx, s, pos):
    if not _is_static(pos):
        raise NotImplementedError(
            "SequenceAt requires a compile-time-constant position (sequence "
            "element shapes may differ, so the index fixes the output shape)"
        )
    return [s[_seq_pos(pos, len(s), "SequenceAt")]]


@op("SequenceInsert")
def _sequence_insert(ctx, s, t, pos=None):
    out = list(s)
    if pos is None:
        out.append(t)
    else:
        p = _seq_pos(pos, len(s), "SequenceInsert", insert=True)
        out.insert(p if p >= 0 else p + len(s), t)
    return [out]


@op("SequenceErase")
def _sequence_erase(ctx, s, pos=None):
    out = list(s)
    p = _seq_pos(pos, len(s), "SequenceErase") if pos is not None else -1
    del out[p]
    return [out]


@op("ConcatFromSequence")
def _concat_from_sequence(ctx, s):
    axis = int(ctx.attr("axis"))
    if int(ctx.attr("new_axis", 0)):
        return [jnp.stack([jnp.asarray(t) for t in s], axis=axis)]
    return [jnp.concatenate([jnp.asarray(t) for t in s], axis=axis)]


@op("SplitToSequence")
def _split_to_sequence(ctx, x, split=None):
    axis = int(ctx.attr("axis", 0))
    x = jnp.asarray(x)
    n = x.shape[axis]
    if split is None:
        keepdims = int(ctx.attr("keepdims", 1))
        parts = [jax.lax.slice_in_dim(x, i, i + 1, axis=axis) for i in range(n)]
        if not keepdims:
            parts = [jnp.squeeze(p, axis=axis) for p in parts]
        return [parts]
    sizes = _static_ints(split, "SplitToSequence split")
    if np.asarray(split).ndim == 0:
        size = sizes[0]
        sizes = [size] * (n // size)
        if n % size:
            sizes.append(n % size)
    parts, off = [], 0
    for sz in sizes:
        parts.append(jax.lax.slice_in_dim(x, off, off + sz, axis=axis))
        off += sz
    return [parts]


@op("SequenceMap")
def _sequence_map(ctx, s, *extras):
    """Apply the ``body`` subgraph to each element; additional inputs are
    mapped elementwise when sequences, broadcast when tensors. Unrolled at
    trace time (XLA compiles the concatenation of the per-element bodies)."""
    body = ctx.attr("body")
    n_out = max(ctx.num_outputs, 1)
    results = [[] for _ in range(n_out)]
    for i, elem in enumerate(s):
        extra_env = {body.input[0].name: elem}
        for j, ex in enumerate(extras):
            extra_env[body.input[j + 1].name] = (
                ex[i] if isinstance(ex, list) else ex
            )
        outs = _run_subgraph(ctx, body, extra_env)
        for j in range(n_out):
            results[j].append(outs[j])
    return results


# ---------------------------------------------------------------------------
# optionals (trace-time: absent = None)
# ---------------------------------------------------------------------------


@op("Optional")
def _optional(ctx, *args):
    return [args[0] if args else None]


@op("OptionalHasElement")
def _optional_has_element(ctx, *args):
    has = bool(args) and args[0] is not None
    # An empty-name input also arrives as trimmed-away (opset 18 allows
    # calling with no input at all).
    return [np.bool_(has)]


@op("OptionalGetElement")
def _optional_get_element(ctx, x=None):
    if x is None:
        raise ValueError("OptionalGetElement on an empty optional")
    return [x]


# ---------------------------------------------------------------------------
# DeformConv / MaxRoiPool
# ---------------------------------------------------------------------------


@op("DeformConv")
def _deform_conv(ctx, x, w, offset, b=None, mask=None):
    """Deformable convolution v2 (opset 19). Each kernel tap samples the
    input at (base + learned offset) by bilinear interpolation, optionally
    modulated by a mask; the contraction over (C_in, taps) then runs as one
    MXU einsum. Matches torchvision.ops.deform_conv2d semantics."""
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    if x.ndim != 4:
        raise NotImplementedError("DeformConv supports 2-D spatial inputs")
    N, C, H, W = x.shape
    oC, wc, kH, kW = w.shape
    strides = list(ctx.attr("strides", [1, 1]))
    dil = list(ctx.attr("dilations", [1, 1]))
    pads = list(ctx.attr("pads", [0, 0, 0, 0]))
    group = int(ctx.attr("group", 1))
    offset_group = int(ctx.attr("offset_group", 1))
    offset = jnp.asarray(offset)
    oH, oW = offset.shape[2], offset.shape[3]
    K = kH * kW

    # Base sampling positions per output pixel and tap: [oH/oW, kH/kW]
    base_y = (jnp.arange(oH)[:, None] * strides[0] - pads[0]
              + jnp.arange(kH)[None] * dil[0]).astype(jnp.float32)
    base_x = (jnp.arange(oW)[:, None] * strides[1] - pads[1]
              + jnp.arange(kW)[None] * dil[1]).astype(jnp.float32)
    # offset layout: [N, offset_group*K*2, oH, oW], (y, x) interleaved per tap
    off = offset.reshape(N, offset_group, K, 2, oH, oW).astype(jnp.float32)
    ky, kx = jnp.meshgrid(jnp.arange(kH), jnp.arange(kW), indexing="ij")
    by = base_y[:, ky.reshape(-1)]  # [oH, K]
    bx = base_x[:, kx.reshape(-1)]  # [oW, K]
    # sample coords [N, og, K, oH, oW]
    sy = by.T[None, None, :, :, None] + off[:, :, :, 0]
    sx = bx.T[None, None, :, None, :] + off[:, :, :, 1]

    def bilin_sample(img, yy, xx):
        """img [Cg,H,W]; yy/xx [...]; zero padding outside (same corner
        masking as GridSample's zeros mode — reuse _gs_gather)."""
        y0 = jnp.floor(yy)
        x0 = jnp.floor(xx)
        wy = yy - y0
        wx = xx - x0
        y0 = y0.astype(jnp.int32)
        x0 = x0.astype(jnp.int32)
        g = lambda iy, ix: _gs_gather(img, iy, ix, zeros_mask=True)  # noqa: E731
        return (g(y0, x0) * ((1 - wy) * (1 - wx))[None]
                + g(y0, x0 + 1) * ((1 - wy) * wx)[None]
                + g(y0 + 1, x0) * (wy * (1 - wx))[None]
                + g(y0 + 1, x0 + 1) * (wy * wx)[None])

    cg = C // offset_group  # channels per offset group

    def one_batch(img, sy_b, sx_b, m_b):
        # img [C,H,W]; sy_b/sx_b [og,K,oH,oW]; m_b [og,K,oH,oW] or None
        parts = []
        for og in range(offset_group):
            v = bilin_sample(
                img[og * cg:(og + 1) * cg],
                sy_b[og].reshape(-1),
                sx_b[og].reshape(-1),
            ).reshape(cg, K, oH, oW)
            if m_b is not None:
                v = v * m_b[og][None]
            parts.append(v)
        return jnp.concatenate(parts, axis=0)  # [C, K, oH, oW]

    if mask is not None:
        m = jnp.asarray(mask).reshape(
            N, offset_group, K, oH, oW
        ).astype(jnp.float32)
        cols = jax.vmap(one_batch)(x.astype(jnp.float32), sy, sx, m)
    else:
        cols = jax.vmap(lambda i, a, bb: one_batch(i, a, bb, None))(
            x.astype(jnp.float32), sy, sx
        )
    # grouped contraction: split C and oC into conv groups
    icg = C // group
    ocg = oC // group
    cols_g = cols.reshape(N, group, icg, kH, kW, oH, oW)
    w_g = w.reshape(group, ocg, wc, kH, kW).astype(jnp.float32)
    y = jnp.einsum("ngikjhw,goikj->ngohw", cols_g, w_g,
                   preferred_element_type=jnp.float32)
    y = y.reshape(N, oC, oH, oW)
    if b is not None:
        y = y + jnp.asarray(b).astype(jnp.float32)[None, :, None, None]
    return [y.astype(x.dtype)]


@op("MaxRoiPool")
def _max_roi_pool(ctx, x, rois):
    """Legacy ROI max pooling. Bin boundaries are data-dependent, so each
    output cell reduces a boundary mask over the full feature map — fully
    traceable (no dynamic slicing), fine at typical detector sizes."""
    orig_dtype = jnp.asarray(x).dtype
    x = jnp.asarray(x).astype(jnp.float32)
    ph, pw = (int(v) for v in ctx.attr("pooled_shape"))
    scale = float(ctx.attr("spatial_scale", 1.0))
    N, C, H, W = x.shape
    rois = jnp.asarray(rois).astype(jnp.float32)  # [R, 5]: (batch, x1,y1,x2,y2)
    hs = jnp.arange(H, dtype=jnp.float32)
    ws = jnp.arange(W, dtype=jnp.float32)

    def one_roi(roi):
        b = roi[0].astype(jnp.int32)
        x1 = jnp.round(roi[1] * scale)
        y1 = jnp.round(roi[2] * scale)
        x2 = jnp.round(roi[3] * scale)
        y2 = jnp.round(roi[4] * scale)
        roi_h = jnp.maximum(y2 - y1 + 1, 1.0)
        roi_w = jnp.maximum(x2 - x1 + 1, 1.0)
        bin_h = roi_h / ph
        bin_w = roi_w / pw
        img = jnp.take(x, b, axis=0)  # [C,H,W]
        # bin p covers rows [floor(y1 + p*bin_h), ceil(y1 + (p+1)*bin_h))
        p = jnp.arange(ph, dtype=jnp.float32)
        q = jnp.arange(pw, dtype=jnp.float32)
        hstart = jnp.clip(jnp.floor(y1 + p * bin_h), 0, H)
        hend = jnp.clip(jnp.ceil(y1 + (p + 1) * bin_h), 0, H)
        wstart = jnp.clip(jnp.floor(x1 + q * bin_w), 0, W)
        wend = jnp.clip(jnp.ceil(x1 + (q + 1) * bin_w), 0, W)
        hmask = (hs[None] >= hstart[:, None]) & (hs[None] < hend[:, None])
        wmask = (ws[None] >= wstart[:, None]) & (ws[None] < wend[:, None])
        mask = hmask[:, None, :, None] & wmask[None, :, None, :]  # [ph,pw,H,W]
        empty = ~jnp.any(mask, axis=(2, 3))
        vals = jnp.where(mask[None], img[:, None, None], -jnp.inf)
        out = jnp.max(vals, axis=(3, 4))  # [C, ph, pw]
        return jnp.where(empty[None], 0.0, out)

    return [jax.vmap(one_roi)(rois).astype(orig_dtype)]


@op("RMSNormalization")
def _rms_norm(ctx, x, scale):
    """Opset-23 RMS normalization: x / sqrt(mean(x^2 over [axis:]) + eps)
    * scale, computed in ``stash_type`` (float32 default) like the ORT
    kernel, then cast back."""
    axis = int(ctx.attr("axis", -1))
    eps = float(ctx.attr("epsilon", 1e-5))
    x = jnp.asarray(x)
    orig = x.dtype
    stash = _ONNX_TO_NP[int(ctx.attr("stash_type", 1))]
    xs = x.astype(stash)
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    ms = jnp.mean(jnp.square(xs), axis=axes, keepdims=True)
    y = xs * jax.lax.rsqrt(ms + eps)
    return [(y * jnp.asarray(scale).astype(stash)).astype(orig)]


# ---------------------------------------------------------------------------
# text ops — the last two ai.onnx core-domain operators
# ---------------------------------------------------------------------------
#
# Strings never exist on a TPU: StringNormalizer is a pure host op over
# compile-time-constant string tensors (the codec materializes STRING
# tensors as numpy object arrays), and TfIdfVectorizer's string-pool form
# folds the pool to integer ids at trace time. TfIdfVectorizer's integer
# form is lowered to jitted gather/compare/scatter-add, so it runs on
# device for traced inputs — n-gram matching is a dense [N, P, G] compare
# that XLA maps onto the VPU. The reference reaches these through ONNX
# Runtime's CPU kernel library (reference: src/classifier.rs:637-639).


@op("StringNormalizer")
def _string_normalizer(ctx, x):
    """Opset-10 StringNormalizer: optional stopword removal + case change.

    Host-only (string tensors cannot be device values): supported when the
    input is compile-time constant, e.g. an initializer or Constant-fed
    chain. The ``locale`` attribute is accepted but ignored (Python str
    casing, the same practical behavior as ORT's default locale).
    """
    if not _is_static(x):
        raise NotImplementedError(
            "StringNormalizer operates on string tensors, which cannot be "
            "traced device values; only compile-time-constant inputs are "
            "supported"
        )
    arr = np.asarray(x)
    if arr.ndim not in (1, 2) or (arr.ndim == 2 and arr.shape[0] != 1):
        raise ValueError(
            f"StringNormalizer input must be [C] or [1, C], got {arr.shape}"
        )
    flat = [str(s) for s in arr.reshape(-1)]
    action = str(ctx.attr("case_change_action", "NONE"))
    if action not in ("NONE", "LOWER", "UPPER"):
        raise ValueError(f"invalid case_change_action {action!r}")
    stopwords = ctx.attr("stopwords") or []
    if stopwords:
        if int(ctx.attr("is_case_sensitive", 0)):
            drop = {str(w) for w in stopwords}
            flat = [s for s in flat if s not in drop]
        else:
            drop = {str(w).lower() for w in stopwords}
            flat = [s for s in flat if s.lower() not in drop]
    if action == "LOWER":
        flat = [s.lower() for s in flat]
    elif action == "UPPER":
        flat = [s.upper() for s in flat]
    if not flat:
        # Spec: when everything is removed, emit one empty string — shape
        # [1] for 1-D inputs, [1, 1] for [1, C] inputs.
        out = np.asarray([""], dtype=object)
        return [out.reshape(1, 1) if arr.ndim == 2 else out]
    out = np.asarray(flat, dtype=object)
    return [out.reshape(1, -1) if arr.ndim == 2 else out]


@op("TfIdfVectorizer")
def _tfidf_vectorizer(ctx, x):
    """Opset-9 TfIdfVectorizer: n-gram counting with skips.

    Counting rule (matches the ORT kernel): a pool n-gram of length n
    matches at start i with stride d when ``x[i + j*d] == gram[j]`` for all
    j. Unigrams are counted once (stride 1); n >= 2 grams are counted for
    every stride d in 1..max_skip_count+1. Only gram lengths within
    [min_gram_length, max_gram_length] contribute. Output column of the
    g-th pool gram is ``ngram_indexes[g]``; mode TF emits counts, IDF emits
    weight*(count > 0), TFIDF emits weight*count (weights default 1).
    """
    mode = str(ctx.attr("mode"))
    if mode not in ("TF", "IDF", "TFIDF"):
        raise ValueError(f"invalid TfIdfVectorizer mode {mode!r}")
    min_n = int(ctx.attr("min_gram_length"))
    max_n = int(ctx.attr("max_gram_length"))
    max_skip = int(ctx.attr("max_skip_count"))
    ngram_counts = [int(v) for v in ctx.attr("ngram_counts")]
    ngram_indexes = np.asarray(
        [int(v) for v in ctx.attr("ngram_indexes")], dtype=np.int64
    )
    weights = ctx.attr("weights")
    pool_ints = ctx.attr("pool_int64s")
    if pool_ints is not None:
        pool = np.asarray([int(v) for v in pool_ints], dtype=np.int64)
        xv = x
    else:
        pool_strings = ctx.attr("pool_strings")
        if pool_strings is None:
            raise ValueError(
                "TfIdfVectorizer needs pool_int64s or pool_strings"
            )
        if not _is_static(x):
            raise NotImplementedError(
                "TfIdfVectorizer with a string pool operates on string "
                "tensors, which cannot be traced device values; only "
                "compile-time-constant inputs are supported"
            )
        # Fold strings to dense integer ids: pool entries get their first-
        # seen id, input strings outside the pool get -1 (matches nothing).
        ids: dict = {}
        for s in pool_strings:
            ids.setdefault(str(s), len(ids))
        pool = np.asarray([ids[str(s)] for s in pool_strings], dtype=np.int64)
        xv = np.asarray(
            [ids.get(str(s), -1) for s in np.asarray(x).reshape(-1)],
            dtype=np.int64,
        ).reshape(np.asarray(x).shape)

    one_d = hasattr(xv, "ndim") and xv.ndim == 1
    # Keep the input's integer dtype (int64 narrows to int32 when x64 is
    # off, like every other integer op here); match the pool to it.
    x2 = jnp.atleast_2d(jnp.asarray(xv))
    pool = pool.astype(x2.dtype)
    N, C = x2.shape
    out_size = int(ngram_indexes.max()) + 1 if ngram_indexes.size else 0
    out = jnp.zeros((N, out_size), jnp.float32)

    gram_pos = 0  # running pool-gram index (for ngram_indexes/weights)
    for level, start in enumerate(ngram_counts):
        n = level + 1
        end = ngram_counts[level + 1] if level + 1 < len(ngram_counts) else len(pool)
        n_elems = end - start
        if n_elems < 0 or n_elems % n:
            raise ValueError(
                f"TfIdfVectorizer pool segment for {n}-grams has {n_elems} "
                f"elements, not a multiple of {n}"
            )
        n_grams = n_elems // n
        if n_grams == 0:
            continue
        grams = pool[start:end].reshape(n_grams, n)
        if not (min_n <= n <= max_n):
            gram_pos += n_grams
            continue
        strides = (1,) if n == 1 else tuple(range(1, max_skip + 2))
        counts = jnp.zeros((N, n_grams), jnp.float32)
        for d in strides:
            p = C - (n - 1) * d
            if p <= 0:
                continue
            idx = np.arange(p)[:, None] + np.arange(n)[None, :] * d
            windows = x2[:, idx]  # [N, P, n]
            eq = jnp.all(
                windows[:, :, None, :] == grams[None, None, :, :], axis=-1
            )
            counts = counts + eq.sum(axis=1, dtype=jnp.float32)
        w = (
            np.asarray([float(v) for v in weights], dtype=np.float32)[
                gram_pos:gram_pos + n_grams
            ]
            if weights is not None
            else np.ones(n_grams, np.float32)
        )
        if mode == "IDF":
            vals = (counts > 0).astype(jnp.float32) * w[None, :]
        elif mode == "TFIDF":
            vals = counts * w[None, :]
        else:
            vals = counts
        cols = ngram_indexes[gram_pos:gram_pos + n_grams]
        out = out.at[:, cols].add(vals)
        gram_pos += n_grams

    return [out[0] if one_d else out]


def _static_strings(x, op_name):
    if not _is_static(x):
        raise NotImplementedError(
            f"{op_name} operates on string tensors, which cannot be traced "
            f"device values; only compile-time-constant inputs are supported"
        )
    return np.asarray(x)


@op("StringConcat")
def _string_concat(ctx, a, b):
    """Opset-20 StringConcat: elementwise concatenation with numpy-style
    broadcasting. Host-only (strings never reach the device)."""
    av = _static_strings(a, "StringConcat")
    bv = _static_strings(b, "StringConcat")
    av, bv = np.broadcast_arrays(av, bv)
    out = np.asarray(
        [str(x) + str(y) for x, y in zip(av.reshape(-1), bv.reshape(-1))],
        dtype=object,
    )
    return [out.reshape(av.shape)]


@op("StringSplit")
def _string_split(ctx, x):
    """Opset-20 StringSplit: splits each element, padding rows with ""
    to the max substring count; second output is per-element counts.
    ``delimiter`` absent/empty means whitespace-split (consecutive
    whitespace collapsed, like str.split())."""
    xv = _static_strings(x, "StringSplit")
    delim = ctx.attr("delimiter")
    maxsplit = ctx.attr("maxsplit")
    ms = int(maxsplit) if maxsplit is not None else -1
    parts = [str(s).split(delim if delim else None, ms) for s in xv.reshape(-1)]
    width = max((len(p) for p in parts), default=0)
    padded = np.asarray(
        [p + [""] * (width - len(p)) for p in parts], dtype=object
    ).reshape(xv.shape + (width,))
    counts = np.asarray([len(p) for p in parts], dtype=np.int64).reshape(xv.shape)
    return [padded, counts]


@op("RegexFullMatch")
def _regex_full_match(ctx, x):
    """Opset-20 RegexFullMatch. The spec prescribes RE2 syntax; Python's
    ``re`` accepts a superset of RE2's common constructs — patterns using
    RE2-only extensions are rejected by ``re.compile`` with a clear error
    rather than silently mismatching."""
    import re

    xv = _static_strings(x, "RegexFullMatch")
    pattern = ctx.attr("pattern")
    if pattern is None:
        raise ValueError("RegexFullMatch requires the 'pattern' attribute")
    rx = re.compile(str(pattern))
    out = np.asarray(
        [rx.fullmatch(str(s)) is not None for s in xv.reshape(-1)],
        dtype=np.bool_,
    )
    return [out.reshape(xv.shape)]


@op("ImageDecoder")
def _image_decoder(ctx, stream):
    """Opset-20 ImageDecoder: decode a compressed image byte stream to
    uint8 ``[H, W, C]``.

    A pure host op, like ORT's kernel (which links libjpeg/libpng
    natively — reference reaches it via src/classifier.rs:637-639); here
    Pillow supplies the codecs (JPEG/PNG/BMP/TIFF/WebP/PNM and more), so
    the format coverage is a superset of the spec's list. Host-only: the
    encoded stream must be compile-time constant (an initializer or
    Constant-fed chain) — image bytes never reach the device.

    ``pixel_format``: RGB (default) / BGR / Grayscale (ITU-R 601-2 luma
    conversion for color sources, the same convention ORT applies).
    """
    if not _is_static(stream):
        raise NotImplementedError(
            "ImageDecoder decodes an encoded byte stream host-side; only "
            "compile-time-constant inputs are supported (the stream cannot "
            "be a traced device value)"
        )
    arr = np.asarray(stream)
    if arr.dtype != np.uint8 or arr.ndim != 1:
        raise ValueError(
            f"ImageDecoder input must be a 1-D uint8 byte stream, got "
            f"{arr.dtype} with shape {arr.shape}"
        )
    fmt = str(ctx.attr("pixel_format", "RGB"))
    if fmt not in ("RGB", "BGR", "Grayscale"):
        raise ValueError(f"invalid pixel_format {fmt!r}")
    try:
        from PIL import Image
    except ImportError as e:  # pragma: no cover - Pillow is baked in
        raise NotImplementedError(
            "ImageDecoder needs Pillow for the host-side image codecs "
            "(the libjpeg/libpng role ONNX Runtime links natively)"
        ) from e
    import io

    try:
        img = Image.open(io.BytesIO(arr.tobytes()))
        img.load()
    except Exception as e:
        raise ValueError(f"ImageDecoder: undecodable image stream ({e})")
    if fmt == "Grayscale":
        out = np.asarray(img.convert("L"), dtype=np.uint8)[..., None]
    else:
        out = np.asarray(img.convert("RGB"), dtype=np.uint8)
        if fmt == "BGR":
            out = out[..., ::-1]
    return [np.ascontiguousarray(out)]
