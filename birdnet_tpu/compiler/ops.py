"""ONNX op → JAX lowering registry.

Each supported ONNX operator is lowered to jax.numpy / jax.lax primitives.
XLA then fuses and tiles these onto the TPU MXU/VPU — this registry plus XLA
is the TPU-native equivalent of the ONNX Runtime kernel library the reference
drives through ``ort`` (reference: src/classifier.rs:637-639).

Conventions:
- Tensors follow ONNX layouts (NCHW for convs). XLA's layout assignment maps
  these onto TPU-friendly tilings; a separate optimization pass may rewrite
  layouts before lowering.
- "Static" inputs (shapes, axes, slice bounds) must be compile-time concrete.
  The importer keeps initializer-derived integer tensors as numpy constants,
  and ops like ``Shape`` return numpy arrays (shapes are static under jit),
  so shape-computation chains fold away at trace time.
- Matmul/conv honor a precision policy: ``mixed`` casts operands to bfloat16
  with float32 accumulation (``preferred_element_type``) for MXU speed.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..onnx.proto import DataType as _DT

_REGISTRY: Dict[str, Callable] = {}

# Non-default-domain ops (ONNX Runtime contrib ops etc.), keyed by
# (domain, op_type). Populated by ops_contrib.py. Real-world "ORT-optimized"
# model files (onnxruntime's offline graph optimizer, the reference's engine
# at /root/reference src/classifier.rs:348-350 accepts them transparently)
# carry fused nodes in the `com.microsoft` domain.
_CONTRIB_REGISTRY: Dict[tuple, Callable] = {}


def op(*names):
    def deco(fn):
        for n in names:
            _REGISTRY[n] = fn
        return fn

    return deco


def contrib_op(domain, *names):
    def deco(fn):
        for n in names:
            _CONTRIB_REGISTRY[(domain, n)] = fn
        return fn

    return deco


# com.microsoft contrib ops that later graduated into the core opset with
# IDENTICAL signatures — only these may fall back to the core table. A
# blanket name-based fallback would silently mis-dispatch contrib ops whose
# name collides with a core op but whose contract differs (com.microsoft
# Attention/Unique vs their core namesakes).
_GRADUATED_MS_OPS = frozenset(
    {"Gelu", "LayerNormalization", "Trilu", "Range", "GridSample",
     # The contrib QDQ pair is the pre-opset-21 spelling of wide-type
     # quantization (int16/uint16/int32 ORT-quantized files carry it);
     # signature (x, scale, zp) + axis is identical and the core
     # lowerings derive the target dtype from the zero point, so they
     # evaluate these nodes exactly.
     "QuantizeLinear", "DequantizeLinear"}
)


def get_lowering(op_type: str, domain: str = "") -> Callable:
    if domain not in ("", "ai.onnx"):
        fn = _CONTRIB_REGISTRY.get((domain, op_type))
        if fn is None and domain == "com.microsoft" and (
            op_type in _GRADUATED_MS_OPS
        ):
            fn = _REGISTRY.get(op_type)
        if fn is None:
            raise NotImplementedError(
                f"ONNX op '{domain}.{op_type}' is not supported by the "
                f"birdnet_tpu compiler"
            )
        return fn
    fn = _REGISTRY.get(op_type)
    if fn is None:
        raise NotImplementedError(
            f"ONNX op '{op_type}' is not supported by the birdnet_tpu compiler"
        )
    return fn


def supported_ops() -> List[str]:
    return sorted(_REGISTRY)


def supported_contrib_ops() -> List[str]:
    return sorted(f"{d}.{n}" for d, n in _CONTRIB_REGISTRY)


class OpContext:
    """Per-node lowering context. ``env`` is the enclosing value environment
    (control-flow subgraphs read outer-scope captures from it)."""

    __slots__ = ("op_type", "attrs", "opset", "precision", "node_name",
                 "num_outputs", "env", "out_names")

    def __init__(self, op_type, attrs, opset=17, precision="fp32",
                 node_name="", num_outputs=1, env=None, out_names=()):
        self.op_type = op_type
        self.attrs = attrs
        self.opset = opset
        self.precision = precision
        self.node_name = node_name
        self.num_outputs = num_outputs
        self.env = env if env is not None else {}
        # Positional output names from the node ("" = omitted); lets a
        # lowering skip work for outputs the graph never binds (e.g. the
        # string-label output of an ai.onnx.ml classifier under jit).
        self.out_names = tuple(out_names)

    def wants_output(self, position: int) -> bool:
        if not self.out_names:
            return True  # unknown -> assume needed
        return position < len(self.out_names) and bool(self.out_names[position])

    def attr(self, name, default=None):
        return self.attrs.get(name, default)


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _is_static(x) -> bool:
    """True if x is a compile-time concrete value."""
    return not isinstance(x, jax.core.Tracer)


def _static_ints(x, what: str) -> List[int]:
    if not _is_static(x):
        raise ValueError(f"{what} must be a compile-time constant")
    return [int(v) for v in np.asarray(x).reshape(-1)]


def _static_int(x, what: str) -> int:
    vals = _static_ints(x, what)
    return vals[0]


_ONNX_TO_NP = {
    _DT.FLOAT: jnp.float32,
    _DT.UINT8: jnp.uint8,
    _DT.INT8: jnp.int8,
    _DT.UINT16: jnp.uint16,
    _DT.INT16: jnp.int16,
    _DT.INT32: jnp.int32,
    _DT.INT64: jnp.int64,
    _DT.BOOL: jnp.bool_,
    _DT.FLOAT16: jnp.float16,
    _DT.DOUBLE: jnp.float64,
    _DT.UINT32: jnp.uint32,
    _DT.UINT64: jnp.uint64,
    _DT.BFLOAT16: jnp.bfloat16,
    _DT.FLOAT8E4M3FN: jnp.float8_e4m3fn,
    _DT.FLOAT8E4M3FNUZ: jnp.float8_e4m3fnuz,
    _DT.FLOAT8E5M2: jnp.float8_e5m2,
    _DT.FLOAT8E5M2FNUZ: jnp.float8_e5m2fnuz,
}


# Precision policies:
#   fp32  — everything float32 (parity/debug)
#   mixed — bf16 MXU operands, f32 accumulation, f32 activations (default)
#   fast  — bf16 MXU operands AND activations, f32 accumulation inside
#           matmul/conv (half the HBM traffic; ~+35% on v5e, top-1 identical)
#   bf16  — bf16 everything including accumulation (fastest, least precise)
_BF16_OPERAND_POLICIES = ("mixed", "fast", "bf16")


def _mxu_operands(ctx: OpContext, *xs):
    """Apply the precision policy to matmul/conv operands."""
    if ctx.precision in _BF16_OPERAND_POLICIES:
        return tuple(
            x.astype(jnp.bfloat16) if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating) else x
            for x in xs
        )
    return xs


def _acc_dtype(ctx: OpContext):
    return jnp.bfloat16 if ctx.precision == "bf16" else jnp.float32


def _out_cast(ctx: OpContext, y, orig_dtype):
    if ctx.precision == "mixed" and y.dtype != orig_dtype:
        return y.astype(orig_dtype)
    if ctx.precision == "fast" and y.dtype != jnp.bfloat16:
        # Keep activations bf16 between ops; accumulation stayed f32.
        return y.astype(jnp.bfloat16)
    return y


# ---------------------------------------------------------------------------
# trivial / elementwise
# ---------------------------------------------------------------------------


@op("Identity")
def _identity(ctx, x):
    return [jnp.asarray(x)]


@op("Dropout")
def _dropout(ctx, x, ratio=None, training_mode=None):
    # Inference-only framework: Dropout is identity; optional mask output.
    outs = [jnp.asarray(x)]
    if ctx.num_outputs > 1:
        outs.append(jnp.ones(jnp.shape(x), dtype=jnp.bool_))
    return outs


_FLOAT8_DTYPES = (
    jnp.float8_e4m3fn, jnp.float8_e4m3fnuz,
    jnp.float8_e5m2, jnp.float8_e5m2fnuz,
)


@op("Cast")
def _cast(ctx, x):
    to = ctx.attr("to")
    if isinstance(to, (bytes, str)):
        # Opsets 1-5 spell the target as a STRING enum name ("FLOAT").
        name = to.decode() if isinstance(to, bytes) else to
        to = getattr(_DT, name.upper(), None)
        if to is None:
            raise ValueError(f"Cast: unknown legacy dtype name {name!r}")
    to = int(to)
    x = jnp.asarray(x)
    if to in (_DT.INT4, _DT.UINT4):
        # 4-bit targets saturate per the ONNX spec.
        lo, hi = (-8, 7) if to == _DT.INT4 else (0, 15)
        container = jnp.int4 if to == _DT.INT4 else jnp.uint4
        if jnp.issubdtype(x.dtype, jnp.floating):
            x = jnp.round(x)
        return [jnp.clip(x, lo, hi).astype(container)]
    target = _ONNX_TO_NP[to]
    if target in _FLOAT8_DTYPES and int(ctx.attr("saturate", 1)):
        # Cast's opset-19 default saturate=1: clamp to the format's finite
        # range (a plain astype overflows to nan for e4m3fn, inf for e5m2).
        info = jnp.finfo(target)
        x = jnp.clip(
            x.astype(jnp.float32), float(info.min), float(info.max)
        )
    return [x.astype(target)]


@op("CastLike")
def _cast_like(ctx, x, like):
    return [jnp.asarray(x).astype(jnp.asarray(like).dtype)]


@op("Constant")
def _constant(ctx):
    for key in (
        "value", "sparse_value", "value_float", "value_int",
        "value_floats", "value_ints", "value_string", "value_strings",
    ):
        v = ctx.attr(key)
        if v is not None:
            if key == "value":
                return [v.to_numpy()]
            if key == "sparse_value":
                # SparseTensorProto (Constant-12+): densified, same as
                # sparse initializers (TPU weights are dense on the MXU).
                return [v.to_dense()]
            if key == "value_float":
                return [np.float32(v)]
            if key == "value_int":
                return [np.int64(v)]
            if key == "value_floats":
                return [np.asarray(v, dtype=np.float32)]
            if key == "value_string":
                return [np.asarray(v, dtype=object).reshape(())]
            if key == "value_strings":
                return [np.asarray(list(v), dtype=object)]
            return [np.asarray(v, dtype=np.int64)]
    raise ValueError("Constant node without a value attribute")


@op("ConstantOfShape")
def _constant_of_shape(ctx, shape):
    dims = _static_ints(shape, "ConstantOfShape shape")
    v = ctx.attr("value")
    if v is None:
        return [np.zeros(dims, dtype=np.float32)]
    fill = v.to_numpy()
    return [np.full(dims, fill.reshape(-1)[0], dtype=fill.dtype)]


def _legacy_broadcast_b(ctx, a, b):
    """Opsets 1-6 binary-op broadcast dialect (pre-numpy, 2017): with
    ``broadcast=1``, B aligns to A starting at ``axis`` (default:
    trailing-aligned); appending trailing singleton axes to B makes
    modern numpy broadcasting reproduce that alignment exactly. With
    ``broadcast=0``/absent the spec requires identical shapes, which
    modern broadcasting evaluates identically. ONNX Runtime still runs
    these files; so do we (docs/onnx-compat.md "opset floor")."""
    if ctx.opset > 6 or not int(ctx.attr("broadcast", 0) or 0):
        return b
    a_nd, b_nd = jnp.ndim(a), jnp.ndim(b)
    if b_nd == 0 or a_nd <= b_nd:
        return b
    axis = ctx.attr("axis")
    axis = a_nd - b_nd if axis is None else int(axis)
    if axis < 0:
        axis += a_nd
    trailing = a_nd - axis - b_nd
    if trailing < 0:
        raise ValueError(
            f"legacy broadcast axis {axis} leaves no room for a rank-"
            f"{b_nd} operand against rank {a_nd}"
        )
    return jnp.reshape(b, jnp.shape(b) + (1,) * trailing)


def _binary(fn):
    def impl(ctx, a, b):
        return [fn(jnp.asarray(a), jnp.asarray(_legacy_broadcast_b(ctx, a, b)))]

    return impl


op("Add")(_binary(jnp.add))
op("Sub")(_binary(jnp.subtract))
op("Mul")(_binary(jnp.multiply))
def _div_impl(a, b):
    # ONNX Div on integers truncates toward zero (lax.div); floats divide.
    if jnp.issubdtype(jnp.result_type(a, b), jnp.integer):
        return lax.div(a, jnp.asarray(b, dtype=a.dtype))
    return jnp.divide(a, b)


op("Div")(_binary(_div_impl))
op("Pow")(_binary(lambda a, b: jnp.power(a, b.astype(a.dtype))))
op("Equal")(_binary(jnp.equal))
op("Greater")(_binary(jnp.greater))
op("Less")(_binary(jnp.less))
op("GreaterOrEqual")(_binary(jnp.greater_equal))
op("LessOrEqual")(_binary(jnp.less_equal))
op("And")(_binary(jnp.logical_and))
op("Or")(_binary(jnp.logical_or))
op("Xor")(_binary(jnp.logical_xor))
op("BitwiseAnd")(_binary(jnp.bitwise_and))
op("BitwiseOr")(_binary(jnp.bitwise_or))
@op("Mod")
def _mod(ctx, a, b):
    # fmod=1 selects C fmod semantics (result takes the sign of the
    # dividend); ONNX mandates fmod=1 for floating-point inputs. fmod=0
    # is Python-style mod (sign of the divisor).
    if int(ctx.attr("fmod", 0)):
        return [jnp.fmod(jnp.asarray(a), jnp.asarray(b))]
    return [jnp.mod(jnp.asarray(a), jnp.asarray(b))]


@op("Min")
def _min(ctx, *xs):
    r = jnp.asarray(xs[0])
    for x in xs[1:]:
        r = jnp.minimum(r, jnp.asarray(x))
    return [r]


@op("Max")
def _max(ctx, *xs):
    r = jnp.asarray(xs[0])
    for x in xs[1:]:
        r = jnp.maximum(r, jnp.asarray(x))
    return [r]


@op("Sum")
def _sum_op(ctx, *xs):
    r = jnp.asarray(xs[0])
    for x in xs[1:]:
        r = r + jnp.asarray(x)
    return [r]


@op("Mean")
def _mean_op(ctx, *xs):
    r = jnp.asarray(xs[0])
    for x in xs[1:]:
        r = r + jnp.asarray(x)
    return [r / float(len(xs))]


def _unary(fn):
    def impl(ctx, x):
        return [fn(jnp.asarray(x))]

    return impl


op("Sqrt")(_unary(jnp.sqrt))
op("Exp")(_unary(jnp.exp))
op("Log")(_unary(jnp.log))
op("Abs")(_unary(jnp.abs))
op("Neg")(_unary(jnp.negative))
op("Floor")(_unary(jnp.floor))
op("Ceil")(_unary(jnp.ceil))
op("Round")(_unary(jnp.round))
op("Sign")(_unary(jnp.sign))
op("Not")(_unary(jnp.logical_not))
op("Reciprocal")(_unary(lambda x: 1.0 / x))
op("Sin")(_unary(jnp.sin))
op("Cos")(_unary(jnp.cos))
op("Tan")(_unary(jnp.tan))
op("Asin")(_unary(jnp.arcsin))
op("Acos")(_unary(jnp.arccos))
op("Atan")(_unary(jnp.arctan))
op("Sinh")(_unary(jnp.sinh))
op("Cosh")(_unary(jnp.cosh))
op("Tanh")(_unary(jnp.tanh))
op("Erf")(_unary(lax.erf))
op("Relu")(_unary(jax.nn.relu))
op("Sigmoid")(_unary(jax.nn.sigmoid))
op("Softplus")(_unary(jax.nn.softplus))
op("Softsign")(_unary(jax.nn.soft_sign))
op("Mish")(_unary(lambda x: x * jnp.tanh(jax.nn.softplus(x))))
op("HardSwish")(_unary(jax.nn.hard_swish))
op("IsNaN")(_unary(jnp.isnan))
@op("IsInf")
def _isinf(ctx, x):
    """IsInf with the spec's detect_negative/detect_positive halves
    (default both on) — found ignoring them via the elementwise sweep."""
    x = jnp.asarray(x)
    neg = int(ctx.attr("detect_negative", 1))
    pos = int(ctx.attr("detect_positive", 1))
    out = jnp.zeros(x.shape, jnp.bool_)
    if pos:
        out = out | (x == jnp.inf)
    if neg:
        out = out | (x == -jnp.inf)
    return [out]


@op("LeakyRelu")
def _leaky_relu(ctx, x):
    alpha = float(ctx.attr("alpha", 0.01))
    x = jnp.asarray(x)
    return [jnp.where(x >= 0, x, alpha * x)]


@op("PRelu")
def _prelu(ctx, x, slope):
    x = jnp.asarray(x)
    slope = jnp.asarray(slope)
    if (
        ctx.opset <= 6
        and slope.ndim == 1
        and x.ndim > 2
        and slope.shape[0] == x.shape[1]
    ):
        # Legacy dialect: a 1-D slope is per-CHANNEL (NCHW axis 1), not
        # trailing-aligned as modern unidirectional broadcast would read
        # it — including when C coincidentally equals the trailing dim
        # (the caffe2-era semantic is unconditionally per-channel).
        slope = slope.reshape((1, -1) + (1,) * (x.ndim - 2))
    return [jnp.where(x >= 0, x, slope * x)]


@op("Elu")
def _elu(ctx, x):
    alpha = float(ctx.attr("alpha", 1.0))
    x = jnp.asarray(x)
    return [jnp.where(x > 0, x, alpha * jnp.expm1(x))]


@op("Selu")
def _selu(ctx, x):
    alpha = float(ctx.attr("alpha", 1.6732632423543772))
    gamma = float(ctx.attr("gamma", 1.0507009873554805))
    x = jnp.asarray(x)
    return [gamma * jnp.where(x > 0, x, alpha * jnp.expm1(x))]


@op("HardSigmoid")
def _hard_sigmoid(ctx, x):
    alpha = float(ctx.attr("alpha", 0.2))
    beta = float(ctx.attr("beta", 0.5))
    return [jnp.clip(alpha * jnp.asarray(x) + beta, 0.0, 1.0)]


@op("Gelu")
def _gelu(ctx, x):
    approx = ctx.attr("approximate", "none")
    return [jax.nn.gelu(jnp.asarray(x), approximate=(approx == "tanh"))]


@op("Clip")
def _clip(ctx, x, lo=None, hi=None):
    x = jnp.asarray(x)
    if ctx.opset < 11:
        lo = ctx.attr("min", -3.402823e38)
        hi = ctx.attr("max", 3.402823e38)
    if lo is not None:
        x = jnp.maximum(x, jnp.asarray(lo, dtype=x.dtype))
    if hi is not None:
        x = jnp.minimum(x, jnp.asarray(hi, dtype=x.dtype))
    return [x]


@op("Where")
def _where(ctx, cond, a, b):
    return [jnp.where(jnp.asarray(cond), jnp.asarray(a), jnp.asarray(b))]


@op("Softmax")
def _softmax(ctx, x):
    x = jnp.asarray(x)
    if ctx.opset >= 13:
        axis = int(ctx.attr("axis", -1))
        return [jax.nn.softmax(x, axis=axis)]
    # opset < 13: flatten from axis, softmax over the flattened tail
    axis = int(ctx.attr("axis", 1))
    if axis < 0:
        axis += x.ndim
    shape = x.shape
    flat = x.reshape(shape[:axis] + (-1,))
    return [jax.nn.softmax(flat, axis=-1).reshape(shape)]


@op("LogSoftmax")
def _log_softmax(ctx, x):
    x = jnp.asarray(x)
    if ctx.opset >= 13:
        axis = int(ctx.attr("axis", -1))
        return [jax.nn.log_softmax(x, axis=axis)]
    # opset < 13: flatten from axis, log-softmax over the flattened tail
    # (same 2-D coercion as legacy Softmax/Hardmax).
    axis = int(ctx.attr("axis", 1))
    if axis < 0:
        axis += x.ndim
    shape = x.shape
    flat = x.reshape(shape[:axis] + (-1,))
    return [jax.nn.log_softmax(flat, axis=-1).reshape(shape)]


# ---------------------------------------------------------------------------
# matmul / gemm
# ---------------------------------------------------------------------------


@op("MatMul")
def _matmul(ctx, a, b):
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    orig = a.dtype
    a2, b2 = _mxu_operands(ctx, a, b)
    y = jnp.matmul(a2, b2, preferred_element_type=_acc_dtype(ctx))
    return [_out_cast(ctx, y, orig)]


@op("Gemm")
def _gemm(ctx, a, b, c=None):
    alpha = float(ctx.attr("alpha", 1.0))
    beta = float(ctx.attr("beta", 1.0))
    ta = int(ctx.attr("transA", 0))
    tb = int(ctx.attr("transB", 0))
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if ta:
        a = a.T
    if tb:
        b = b.T
    orig = a.dtype
    a2, b2 = _mxu_operands(ctx, a, b)
    y = jnp.matmul(a2, b2, preferred_element_type=_acc_dtype(ctx))
    y = _out_cast(ctx, y, orig)
    if alpha != 1.0:
        y = alpha * y
    if c is not None:
        bias = jnp.asarray(c).astype(y.dtype)  # keep the policy's activation dtype
        y = y + (beta * bias if beta != 1.0 else bias)
    return [y]


@op("Einsum")
def _einsum(ctx, *xs):
    eq = ctx.attr("equation")
    xs = [jnp.asarray(x) for x in xs]
    orig = xs[0].dtype
    xs2 = _mxu_operands(ctx, *xs)
    y = jnp.einsum(eq, *xs2, preferred_element_type=_acc_dtype(ctx))
    return [_out_cast(ctx, y, orig)]


# ---------------------------------------------------------------------------
# convolution
# ---------------------------------------------------------------------------


def _resolve_pads(ctx, x_spatial, kernel, strides, dilations):
    """Return list[(lo, hi)] per spatial dim from pads/auto_pad attrs."""
    nd = len(kernel)
    auto_pad = ctx.attr("auto_pad", "NOTSET")
    if auto_pad in ("NOTSET", "", b"NOTSET"):
        pads = ctx.attr("pads")
        if pads is None:
            return [(0, 0)] * nd
        pads = [int(p) for p in pads]
        return [(pads[i], pads[i + nd]) for i in range(nd)]
    if auto_pad == "VALID":
        return [(0, 0)] * nd
    out = []
    for i in range(nd):
        in_dim = x_spatial[i]
        eff_k = (kernel[i] - 1) * dilations[i] + 1
        out_dim = -(-in_dim // strides[i])  # ceil
        total = max((out_dim - 1) * strides[i] + eff_k - in_dim, 0)
        if auto_pad == "SAME_UPPER":
            out.append((total // 2, total - total // 2))
        elif auto_pad == "SAME_LOWER":
            out.append((total - total // 2, total // 2))
        else:
            raise ValueError(f"unsupported auto_pad {auto_pad!r}")
    return out


def _conv_geometry(ctx, x, w):
    """Shared Conv/QLinearConv/ConvInteger geometry: kwargs for
    ``lax.conv_general_dilated`` derived from the ONNX conv attributes."""
    nd = x.ndim - 2  # spatial rank
    kernel = list(ctx.attr("kernel_shape", w.shape[2:]))
    strides = [int(s) for s in ctx.attr("strides", [1] * nd)]
    dilations = [int(d) for d in ctx.attr("dilations", [1] * nd)]
    group = int(ctx.attr("group", 1))
    if any(v < 1 for v in strides) or any(v < 1 for v in dilations):
        raise ValueError(
            f"Conv strides/dilations must be >= 1, got strides={strides} "
            f"dilations={dilations}"
        )
    if group < 1 or x.shape[1] % group or w.shape[0] % group:
        raise ValueError(
            f"Conv group={group} must divide input channels {x.shape[1]} "
            f"and output channels {w.shape[0]}"
        )
    pads = _resolve_pads(ctx, x.shape[2:], kernel, strides, dilations)
    spec = tuple(range(nd + 2))
    dn = lax.ConvDimensionNumbers(lhs_spec=spec, rhs_spec=spec, out_spec=spec)
    return dict(
        window_strides=strides,
        padding=pads,
        rhs_dilation=dilations,
        dimension_numbers=dn,
        feature_group_count=group,
    )


def _polyphase_conv1d(ctx, x, w, b, strides, pads, orig):
    """Large-stride single-channel Conv1d as one dense matmul.

    The BirdNET-style learned filterbank (kernel 1024, stride 280, C_in=1 —
    the in-graph spectrogram frontend) lowers terribly through XLA's conv
    path on TPU (measured 9.1 us/segment, 26% of total model time). The
    polyphase decomposition j = k*s + r turns it into a reshape + ONE MXU
    matmul with contraction depth s, plus m=ceil(K/s) statically shifted
    adds:

        R = x.reshape(N, rows, s);  P = R @ Wstack[s, m*C]
        out[n, c, i] = sum_k P[n, i+k, k*C + c]

    Measured on v5e: 2.0 us/segment for the bench frontend — 4.5x faster
    than the conv lowering, no Pallas required.
    """
    s = strides[0]
    n, _, length = x.shape
    c_out, _, k = w.shape
    lo, hi = pads[0]
    if lo or hi:
        x = jnp.pad(x, ((0, 0), (0, 0), (lo, hi)))
        length += lo + hi
    t = (length - k) // s + 1
    m = -(-k // s)
    rows = t + m - 1
    need = rows * s
    if need > length:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, need - length)))
    x2, w2 = _mxu_operands(ctx, x, w)
    r = x2[:, 0, :need].reshape(n, rows, s)
    # Wstack[r, k*C + c] = w[c, k*s + r] (zero-padded past the true kernel).
    wpad = jnp.pad(w2[:, 0, :], ((0, 0), (0, m * s - k)))
    wstack = wpad.reshape(c_out, m, s).transpose(2, 1, 0).reshape(s, m * c_out)
    p = jnp.matmul(r, wstack, preferred_element_type=_acc_dtype(ctx))
    y = p[:, 0:t, 0:c_out]
    for ki in range(1, m):
        y = y + p[:, ki:ki + t, ki * c_out:(ki + 1) * c_out]
    if b is not None:
        y = y + jnp.asarray(b).reshape(1, 1, -1).astype(y.dtype)
    y = _out_cast(ctx, y, orig)
    return [jnp.swapaxes(y, 1, 2)]


@op("Conv")
def _conv(ctx, x, w, b=None):
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    nd = x.ndim - 2  # spatial rank
    geo = _conv_geometry(ctx, x, w)
    orig = x.dtype
    # NOTE: a C_in=1 small-kernel Conv2d "tap-sum of strided slices" variant
    # (9 broadcast-FMAs for the 3x3 stem) was measured on v5e at 21 us/seg
    # vs 3.4 for XLA's conv — strided slices relayout and the broadcast
    # products materialize. XLA's native lowering stays for 2-D convs.
    if (
        nd == 1
        and geo["feature_group_count"] == 1
        and w.shape[1] == 1
        and geo["window_strides"][0] >= 16
        and w.shape[2] >= 16
        and geo["rhs_dilation"] == [1]
        and (x.shape[2] + sum(geo["padding"][0]) - w.shape[2])
        // geo["window_strides"][0] >= 0
    ):
        return _polyphase_conv1d(
            ctx, x, w, b, geo["window_strides"], geo["padding"], orig
        )
    x2, w2 = _mxu_operands(ctx, x, w)
    y = lax.conv_general_dilated(
        x2,
        w2,
        preferred_element_type=_acc_dtype(ctx),
        **geo,
    )
    y = _out_cast(ctx, y, orig)
    if b is not None:
        bias = jnp.asarray(b).reshape((1, -1) + (1,) * nd)
        y = y + bias.astype(y.dtype)
    return [y]


@op("ConvTranspose")
def _conv_transpose(ctx, x, w, b=None):
    x = jnp.asarray(x)
    w = jnp.asarray(w)  # ONNX: (C_in, C_out/group, *k)
    nd = x.ndim - 2
    kernel = list(ctx.attr("kernel_shape", w.shape[2:]))
    strides = [int(s) for s in ctx.attr("strides", [1] * nd)]
    dilations = [int(d) for d in ctx.attr("dilations", [1] * nd)]
    group = int(ctx.attr("group", 1))
    output_padding = [int(p) for p in ctx.attr("output_padding", [0] * nd)]
    pads = _resolve_pads(ctx, x.shape[2:], kernel, strides, dilations)

    # lax.conv_transpose with transpose_kernel=True expects IOHW kernels,
    # which matches the ONNX ConvTranspose (C_in, C_out, *k) layout.
    spec = tuple(range(nd + 2))
    dn = lax.ConvDimensionNumbers(lhs_spec=spec, rhs_spec=spec, out_spec=spec)
    # Effective transpose padding: p' = k - 1 - p (per side) with dilation.
    tpads = []
    for i in range(nd):
        eff_k = (kernel[i] - 1) * dilations[i] + 1
        lo = eff_k - 1 - pads[i][0]
        hi = eff_k - 1 - pads[i][1] + output_padding[i]
        tpads.append((lo, hi))

    def one_group(xg, wg):
        return lax.conv_general_dilated(
            xg,
            jnp.flip(wg, axis=tuple(range(2, 2 + nd))).swapaxes(0, 1),
            window_strides=[1] * nd,
            padding=tpads,
            lhs_dilation=strides,
            rhs_dilation=dilations,
            dimension_numbers=dn,
            preferred_element_type=_acc_dtype(ctx),
        )

    if group == 1:
        y = one_group(x, w)
    else:
        # ONNX weight layout (C_in, C_out/group, *k): C_in splits evenly
        # over groups; each group is an independent transpose conv whose
        # outputs concatenate along channels.
        cin_g = x.shape[1] // group
        y = jnp.concatenate(
            [
                one_group(
                    x[:, g * cin_g:(g + 1) * cin_g],
                    w[g * cin_g:(g + 1) * cin_g],
                )
                for g in range(group)
            ],
            axis=1,
        )
    y = _out_cast(ctx, y, x.dtype)
    if b is not None:
        y = y + jnp.asarray(b).reshape((1, -1) + (1,) * nd).astype(y.dtype)
    return [y]


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


@op("BatchNormalization")
def _batchnorm(ctx, x, scale, bias, mean, var):
    if ctx.opset <= 6:
        # Legacy dialect: is_test/consumed_inputs/momentum are ignorable
        # for the single-output inference form; the multi-output training
        # form and spatial=0 (per-element stats) are rejected typed.
        if ctx.num_outputs > 1:
            raise NotImplementedError(
                "legacy BatchNormalization training form (multiple "
                "outputs, is_test=0) is not supported; inference-only "
                "framework"
            )
        if not int(ctx.attr("spatial", 1)):
            raise NotImplementedError(
                "legacy BatchNormalization spatial=0 is not supported"
            )
    eps = float(ctx.attr("epsilon", 1e-5))
    x = jnp.asarray(x)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    scale = jnp.asarray(scale).reshape(shape)
    bias = jnp.asarray(bias).reshape(shape)
    mean = jnp.asarray(mean).reshape(shape)
    var = jnp.asarray(var).reshape(shape)
    inv = scale * lax.rsqrt(var + eps)
    return [x * inv + (bias - mean * inv)]


@op("InstanceNormalization")
def _instancenorm(ctx, x, scale, bias):
    eps = float(ctx.attr("epsilon", 1e-5))
    x = jnp.asarray(x)
    axes = tuple(range(2, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return [
        jnp.asarray(scale).reshape(shape) * (x - mean) * lax.rsqrt(var + eps)
        + jnp.asarray(bias).reshape(shape)
    ]


@op("LayerNormalization")
def _layernorm(ctx, x, scale, bias=None):
    axis = int(ctx.attr("axis", -1))
    eps = float(ctx.attr("epsilon", 1e-5))
    x = jnp.asarray(x)
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    mean = jnp.mean(x, axis=axes, keepdims=True)
    var = jnp.var(x, axis=axes, keepdims=True)
    inv = lax.rsqrt(var + eps)
    y = (x - mean) * inv * jnp.asarray(scale)
    if bias is not None:
        y = y + jnp.asarray(bias)
    outs = [y]
    if ctx.num_outputs > 1:
        outs.append(mean)
    if ctx.num_outputs > 2:
        outs.append(inv)
    return outs


@op("GroupNormalization")
def _groupnorm(ctx, x, scale, bias):
    eps = float(ctx.attr("epsilon", 1e-5))
    groups = int(ctx.attr("num_groups"))
    x = jnp.asarray(x)
    n, c = x.shape[0], x.shape[1]
    spatial = x.shape[2:]
    xg = x.reshape((n, groups, c // groups) + spatial)
    axes = tuple(range(2, xg.ndim))
    mean = jnp.mean(xg, axis=axes, keepdims=True)
    var = jnp.var(xg, axis=axes, keepdims=True)
    xg = (xg - mean) * lax.rsqrt(var + eps)
    y = xg.reshape(x.shape)
    shape = (1, -1) + (1,) * (x.ndim - 2)
    return [y * jnp.asarray(scale).reshape(shape) + jnp.asarray(bias).reshape(shape)]


@op("LRN")
def _lrn(ctx, x):
    size = int(ctx.attr("size"))
    alpha = float(ctx.attr("alpha", 1e-4))
    beta = float(ctx.attr("beta", 0.75))
    bias = float(ctx.attr("bias", 1.0))
    x = jnp.asarray(x)
    sq = x * x
    half = size // 2
    pad = [(0, 0), (half, size - 1 - half)] + [(0, 0)] * (x.ndim - 2)
    sq = jnp.pad(sq, pad)
    window = [1, size] + [1] * (x.ndim - 2)
    ssum = lax.reduce_window(sq, 0.0, lax.add, window, [1] * x.ndim, "VALID")
    return [x / jnp.power(bias + (alpha / size) * ssum, beta)]


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------


def _pool_common(ctx, x):
    """Window geometry for Max/AveragePool. Returns the explicit
    (attribute/auto_pad) padding separately from the total padding with
    any ceil-mode extension — AveragePool's count_include_pad=1 divisor
    must count explicit pad cells but NOT the ceil overhang (torch and
    onnxruntime both clip edge-window divisors to real coverage)."""
    nd = x.ndim - 2
    kernel = [int(k) for k in ctx.attr("kernel_shape")]
    strides = [int(s) for s in ctx.attr("strides", [1] * nd)]
    dilations = [int(d) for d in ctx.attr("dilations", [1] * nd)]
    if any(v < 1 for v in kernel + strides + dilations):
        raise ValueError(
            f"pool kernel/strides/dilations must be >= 1, got "
            f"kernel={kernel} strides={strides} dilations={dilations}"
        )
    pads = _resolve_pads(ctx, x.shape[2:], kernel, strides, dilations)
    explicit_pads = pads
    if int(ctx.attr("ceil_mode", 0)):
        # Size the end padding so the window count matches ceil division —
        # EXCEPT that a window which would start in the right padded
        # region is ignored (ONNX opset-19 clarification; torch and
        # onnxruntime both apply it as a single decrement). The total
        # padding is then exactly what the kept windows cover, and the
        # explicit component is truncated to match so AveragePool's
        # count_include_pad divisor sees the right pad cells.
        new_pads, new_explicit = [], []
        for i in range(nd):
            in_dim = x.shape[2 + i]
            eff_k = (kernel[i] - 1) * dilations[i] + 1
            lo, hi = pads[i]
            out_ceil = -(-(in_dim + lo + hi - eff_k) // strides[i]) + 1
            if (out_ceil - 1) * strides[i] >= lo + in_dim:
                out_ceil -= 1
            need = max(0, (out_ceil - 1) * strides[i] + eff_k - in_dim - lo)
            new_pads.append((lo, need))
            new_explicit.append((lo, min(hi, need)))
        pads = new_pads
        explicit_pads = new_explicit
    window = [1, 1] + kernel
    win_strides = [1, 1] + strides
    win_dil = [1, 1] + dilations
    full_pads = [(0, 0), (0, 0)] + pads
    full_explicit = [(0, 0), (0, 0)] + explicit_pads
    return window, win_strides, win_dil, full_pads, full_explicit


@op("MaxPool")
def _maxpool(ctx, x):
    x = jnp.asarray(x)
    window, strides, dil, pads, _ = _pool_common(ctx, x)
    init = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    y = lax.reduce_window(
        x, jnp.asarray(init, x.dtype), lax.max, window, strides, pads, window_dilation=dil
    )
    if ctx.num_outputs == 1:
        return [y]
    # Indices output: int64 positions into the WHOLE input tensor flattened
    # row-major (N and C included) — or with the spatial block composed
    # column-major under storage_order=1; ties take the first kernel
    # position in row-major scan order — ONNX Runtime's behavior. Strategy:
    # pad with the finite dtype minimum, extract each window as a patch
    # vector, argmax over the kernel axis, then rebuild the absolute
    # coordinate per spatial dim.
    col_major = bool(int(ctx.attr("storage_order", 0)))
    nd = x.ndim - 2
    kernel, strid, dils = window[2:], strides[2:], dil[2:]
    spads = pads[2:]
    # Patches are extracted by a one-hot convolution, where any ±inf input
    # value hits a zero kernel tap and 0 * inf = NaN poisons the window.
    # Sanitize ±inf to the finite dtype extremes for the INDEX computation
    # only (the pooled VALUES come from reduce_window above, exact); the
    # ordering among finite values is unchanged, and a separate validity
    # mask keeps argmax off padded cells even when a whole window ties at
    # the minimum (e.g. -inf log-magnitude silence).
    if jnp.issubdtype(x.dtype, jnp.floating):
        fin = jnp.finfo(x.dtype)
        xi = jnp.clip(x, fin.min, fin.max)
        pad_val = fin.min
    else:
        xi = x
        pad_val = jnp.iinfo(x.dtype).min
    xp = jnp.pad(xi, pads, constant_values=pad_val)
    patches = lax.conv_general_dilated_patches(
        xp, tuple(kernel), tuple(strid), "VALID", rhs_dilation=tuple(dils)
    )
    ones_p = jnp.pad(jnp.ones_like(xi, dtype=jnp.float32), pads)
    valid = lax.conv_general_dilated_patches(
        ones_p, tuple(kernel), tuple(strid), "VALID",
        rhs_dilation=tuple(dils),
    ) > 0.5
    n_b, n_c = x.shape[0], x.shape[1]
    k_total = int(np.prod(kernel))
    out_sp = patches.shape[2:]
    # feature dim is (C, *kernel) with kernel positions row-major
    pr = patches.reshape((n_b, n_c, k_total) + out_sp)
    vr = valid.reshape((n_b, n_c, k_total) + out_sp)
    vmax = jnp.where(vr, pr, pad_val).max(axis=2, keepdims=True)
    # first VALID position holding the window max (row-major scan order)
    k_best = jnp.argmax(vr & (jnp.where(vr, pr, pad_val) == vmax), axis=2)

    base = (
        jnp.arange(n_b, dtype=jnp.int32).reshape((n_b,) + (1,) * (1 + nd)) * n_c
        + jnp.arange(n_c, dtype=jnp.int32).reshape((1, n_c) + (1,) * nd)
    ).astype(jnp.int64)
    spatial_dims = [x.shape[2 + d] for d in range(nd)]

    def coord(d):
        k_stride = int(np.prod(kernel[d + 1:]))
        off = (k_best // k_stride) % kernel[d]
        pos = jnp.arange(out_sp[d], dtype=jnp.int32) * strid[d] - spads[d][0]
        pos = pos.reshape(
            (1, 1) + tuple(out_sp[d] if i == d else 1 for i in range(nd))
        )
        return pos + off * dils[d]

    if col_major:
        flat = base * int(np.prod(spatial_dims))
        stride = 1
        for d in range(nd):
            flat = flat + coord(d) * stride
            stride *= spatial_dims[d]
    else:
        flat = base
        for d in range(nd):
            flat = flat * spatial_dims[d] + coord(d)
    return [y, flat.astype(jnp.int64)]


@op("MaxUnpool")
def _max_unpool(ctx, x, indices, output_shape=None):
    """Inverse of MaxPool: scatter pooled values back to their recorded
    positions (zeros elsewhere). ``indices`` use the whole-tensor
    row-major flat convention — the same one our MaxPool Indices output
    produces."""
    x = jnp.asarray(x)
    idx = jnp.asarray(indices)
    nd = x.ndim - 2
    kernel = [int(k) for k in ctx.attr("kernel_shape")]
    strides = [int(s) for s in ctx.attr("strides", [1] * nd)]
    pads_attr = [int(p) for p in ctx.attr("pads", [0] * (2 * nd))]
    if output_shape is not None:
        out_shape = _static_ints(output_shape, "MaxUnpool output_shape")
    else:
        out_shape = list(x.shape[:2]) + [
            (x.shape[2 + i] - 1) * strides[i]
            + kernel[i]
            - pads_attr[i]
            - pads_attr[nd + i]
            for i in range(nd)
        ]
    total = int(np.prod(out_shape))
    flat = jnp.zeros(total, x.dtype).at[idx.reshape(-1)].set(x.reshape(-1))
    return [flat.reshape(out_shape)]


@op("AveragePool")
def _avgpool(ctx, x):
    x = jnp.asarray(x)
    window, strides, dil, pads, explicit_pads = _pool_common(ctx, x)
    count_include_pad = int(ctx.attr("count_include_pad", 0))
    ssum = lax.reduce_window(x, jnp.asarray(0, x.dtype), lax.add, window, strides, pads, window_dilation=dil)
    if count_include_pad and pads == explicit_pads:
        # No ceil-mode overhang: every window covers exactly the kernel.
        return [ssum / float(np.prod(window))]
    if count_include_pad:
        # count_include_pad counts the EXPLICIT padding but not the
        # ceil-mode overhang (torch/onnxruntime clip edge-window divisors
        # to real coverage): pre-pad ones over the explicit region, then
        # reduce with only the remaining (overhang) padding zero-counted.
        ones = jnp.pad(jnp.ones(x.shape, dtype=x.dtype), explicit_pads,
                       constant_values=1)
        extra = [
            (lo_t - lo_e, hi_t - hi_e)
            for (lo_t, hi_t), (lo_e, hi_e) in zip(pads, explicit_pads)
        ]
        counts = lax.reduce_window(
            ones, jnp.asarray(0, x.dtype), lax.add, window, strides, extra,
            window_dilation=dil,
        )
        return [ssum / counts]
    ones = jnp.ones(x.shape, dtype=x.dtype)
    counts = lax.reduce_window(
        ones, jnp.asarray(0, x.dtype), lax.add, window, strides, pads, window_dilation=dil
    )
    return [ssum / counts]


@op("GlobalAveragePool")
def _global_avgpool(ctx, x):
    x = jnp.asarray(x)
    return [jnp.mean(x, axis=tuple(range(2, x.ndim)), keepdims=True)]


@op("GlobalMaxPool")
def _global_maxpool(ctx, x):
    x = jnp.asarray(x)
    return [jnp.max(x, axis=tuple(range(2, x.ndim)), keepdims=True)]


# ---------------------------------------------------------------------------
# shape manipulation
# ---------------------------------------------------------------------------


@op("Shape")
def _shape(ctx, x):
    shape = np.asarray(jnp.shape(x), dtype=np.int64)
    start = int(ctx.attr("start", 0))
    end = ctx.attr("end")
    return [shape[start: int(end) if end is not None else None]]


@op("Size")
def _size(ctx, x):
    return [np.int64(int(np.prod(jnp.shape(x))))]


@op("Reshape")
def _reshape(ctx, x, shape=None):
    x = jnp.asarray(x)
    if shape is None:
        # Opsets 1-4 carry the target as a `shape` attribute (the target
        # moved to an input in opset 5).
        shape = ctx.attr("shape")
        if shape is None:
            raise ValueError("Reshape without a shape input or attribute")
    dims = _static_ints(shape, "Reshape shape")
    allowzero = int(ctx.attr("allowzero", 0))
    out = []
    for i, d in enumerate(dims):
        if d == 0 and not allowzero:
            out.append(x.shape[i])
        else:
            out.append(d)
    return [x.reshape(out)]


@op("Transpose")
def _transpose(ctx, x):
    x = jnp.asarray(x)
    perm = ctx.attr("perm")
    if perm is None:
        perm = list(range(x.ndim))[::-1]
    return [jnp.transpose(x, [int(p) for p in perm])]


@op("Flatten")
def _flatten(ctx, x):
    x = jnp.asarray(x)
    axis = int(ctx.attr("axis", 1))
    if axis < 0:
        axis += x.ndim
    lead = int(np.prod(x.shape[:axis])) if axis > 0 else 1
    return [x.reshape(lead, -1)]


def _axes_arg(ctx, x, axes_input):
    """Resolve axes from attr (opset<13) or input (>=13)."""
    if axes_input is not None:
        return _static_ints(axes_input, "axes")
    axes = ctx.attr("axes")
    return [int(a) for a in axes] if axes is not None else None


@op("Squeeze")
def _squeeze(ctx, x, axes=None):
    x = jnp.asarray(x)
    ax = _axes_arg(ctx, x, axes)
    if ax is None:
        ax = [i for i, d in enumerate(x.shape) if d == 1]
    ax = [a + x.ndim if a < 0 else a for a in ax]
    return [jnp.squeeze(x, axis=tuple(ax))]


@op("Unsqueeze")
def _unsqueeze(ctx, x, axes=None):
    x = jnp.asarray(x)
    ax = _axes_arg(ctx, x, axes)
    out_ndim = x.ndim + len(ax)
    ax = sorted(a + out_ndim if a < 0 else a for a in ax)
    for a in ax:
        x = jnp.expand_dims(x, a)
    return [x]


@op("Concat")
def _concat(ctx, *xs):
    axis = ctx.attr("axis")
    if axis is None and ctx.opset <= 3:
        axis = 1  # opsets 1-3: axis optional, default 1
    axis = int(axis)
    arrs = [jnp.asarray(x) for x in xs]
    if all(_is_static(x) for x in xs):
        return [np.concatenate([np.asarray(x) for x in xs], axis=axis)]
    return [jnp.concatenate(arrs, axis=axis)]


@op("Split")
def _split(ctx, x, split=None):
    x = jnp.asarray(x)
    axis = int(ctx.attr("axis", 0))
    if axis < 0:
        axis += x.ndim
    if split is None:
        split = ctx.attr("split")
    if split is not None:
        sizes = _static_ints(split, "Split sizes") if not isinstance(split, list) else [int(s) for s in split]
        offsets = np.cumsum([0] + sizes)
        return [
            lax.slice_in_dim(x, int(offsets[i]), int(offsets[i + 1]), axis=axis)
            for i in range(len(sizes))
        ]
    n = ctx.num_outputs
    total = x.shape[axis]
    size = -(-total // n)
    return [
        lax.slice_in_dim(x, i * size, min((i + 1) * size, total), axis=axis)
        for i in range(n)
    ]


@op("Slice")
def _slice(ctx, x, starts=None, ends=None, axes=None, steps=None):
    x = jnp.asarray(x)
    if ctx.opset < 10 or starts is None:
        starts = ctx.attr("starts")
        ends = ctx.attr("ends")
        axes = ctx.attr("axes")
        steps = None
    starts = _static_ints(starts, "Slice starts") if not isinstance(starts, list) else starts
    ends = _static_ints(ends, "Slice ends") if not isinstance(ends, list) else ends
    if axes is None:
        axes_l = list(range(len(starts)))
    else:
        axes_l = _static_ints(axes, "Slice axes") if not isinstance(axes, list) else axes
    steps_l = (
        [1] * len(starts)
        if steps is None
        else (_static_ints(steps, "Slice steps") if not isinstance(steps, list) else steps)
    )
    slices = [slice(None)] * x.ndim
    for st, en, ax, sp in zip(starts, ends, axes_l, steps_l):
        if ax < 0:
            ax += x.ndim
        dim = x.shape[ax]
        # ONNX clamping semantics (INT64_MAX/MIN sentinels included)
        if sp > 0:
            st = max(st + dim, 0) if st < 0 else min(st, dim)
            en = max(en + dim, 0) if en < 0 else min(en, dim)
            slices[ax] = slice(st, en, sp)
        else:
            # Negative step: ONNX clamps start into [0, dim-1] (so an
            # out-of-range negative start like INT64_MIN means "from 0").
            st = max(st + dim, 0) if st < 0 else min(st, dim - 1)
            en = en + dim if -dim <= en < 0 else en
            slices[ax] = slice(st, None if en < 0 else en, sp)
    return [x[tuple(slices)]]


@op("Gather")
def _gather(ctx, x, indices):
    axis = int(ctx.attr("axis", 0))
    if _is_static(x) and _is_static(indices):
        return [np.take(np.asarray(x), np.asarray(indices).astype(np.int64), axis=axis)]
    return [jnp.take(jnp.asarray(x), jnp.asarray(indices), axis=axis)]


@op("GatherElements")
def _gather_elements(ctx, x, indices):
    axis = int(ctx.attr("axis", 0))
    return [jnp.take_along_axis(jnp.asarray(x), jnp.asarray(indices), axis=axis)]


@op("GatherND")
def _gather_nd(ctx, x, indices):
    x = jnp.asarray(x)
    indices = jnp.asarray(indices)
    batch_dims = int(ctx.attr("batch_dims", 0))

    def gather0(data, idx):
        k = idx.shape[-1]
        flat_idx = idx.reshape(-1, k)
        gathered = data[tuple(flat_idx[:, i] for i in range(k))]
        return gathered.reshape(idx.shape[:-1] + data.shape[k:])

    fn = gather0
    # batch_dims leading axes are shared: vmap the plain gather over each.
    for _ in range(batch_dims):
        fn = jax.vmap(fn)
    return [fn(x, indices)]


@op("ScatterElements")
def _scatter_elements(ctx, x, indices, updates):
    axis = int(ctx.attr("axis", 0))
    reduction = ctx.attr("reduction", "none")
    x = jnp.asarray(x)
    indices = jnp.asarray(indices)
    updates = jnp.asarray(updates)
    if axis < 0:
        axis += x.ndim
    # Build full coordinate grids; the scatter axis uses `indices`.
    coords = list(jnp.meshgrid(*[jnp.arange(d) for d in indices.shape], indexing="ij"))
    coords[axis] = indices
    idx = tuple(coords)
    if reduction == "add":
        return [x.at[idx].add(updates)]
    if reduction == "mul":
        return [x.at[idx].multiply(updates)]
    if reduction == "min":
        return [x.at[idx].min(updates)]
    if reduction == "max":
        return [x.at[idx].max(updates)]
    if reduction in ("none", None):
        return [x.at[idx].set(updates)]
    raise NotImplementedError(f"ScatterElements reduction {reduction!r}")


@op("ScatterND")
def _scatter_nd(ctx, x, indices, updates):
    x = jnp.asarray(x)
    indices = jnp.asarray(indices)
    updates = jnp.asarray(updates)
    reduction = ctx.attr("reduction", "none")
    k = indices.shape[-1]
    flat_idx = indices.reshape(-1, k)
    upd_shape = (-1,) + x.shape[k:]
    flat_upd = updates.reshape(upd_shape)
    idx = tuple(flat_idx[:, i] for i in range(k))
    if reduction == "add":
        return [x.at[idx].add(flat_upd)]
    if reduction == "mul":
        return [x.at[idx].multiply(flat_upd)]
    if reduction == "min":
        return [x.at[idx].min(flat_upd)]
    if reduction == "max":
        return [x.at[idx].max(flat_upd)]
    if reduction in ("none", None):
        return [x.at[idx].set(flat_upd)]
    raise NotImplementedError(f"ScatterND reduction {reduction!r}")


@op("Expand")
def _expand(ctx, x, shape):
    x = jnp.asarray(x)
    dims = _static_ints(shape, "Expand shape")
    target = np.broadcast_shapes(tuple(x.shape), tuple(dims))
    return [jnp.broadcast_to(x, target)]


@op("Tile")
def _tile(ctx, x, repeats, legacy_axis=None):
    if legacy_axis is not None:
        # Opsets 1-6 signature: (input, tiles, axis) — repeat `tiles`
        # times along the single `axis`.
        x = jnp.asarray(x)
        reps = [1] * x.ndim
        reps[_static_int(legacy_axis, "Tile axis")] = _static_int(
            repeats, "Tile tiles"
        )
        return [jnp.tile(x, reps)]
    reps = _static_ints(repeats, "Tile repeats")
    return [jnp.tile(jnp.asarray(x), reps)]


@op("Pad")
def _pad(ctx, x, pads=None, constant_value=None, axes=None):
    x = jnp.asarray(x)
    mode = ctx.attr("mode", "constant")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if pads is None:
        pads_attr = ctx.attr("pads")
        if pads_attr is None:
            # Opset 1 spells the attribute `paddings` (renamed in opset 2).
            pads_attr = ctx.attr("paddings")
        if pads_attr is None:
            raise ValueError("Pad without pads input or pads/paddings attr")
        pads_l = [int(p) for p in pads_attr]
    else:
        pads_l = _static_ints(pads, "Pad pads")
    if axes is not None:
        ax = _static_ints(axes, "Pad axes")
    else:
        ax = list(range(x.ndim))
    n = len(ax)
    width = [(0, 0)] * x.ndim
    for i, a in enumerate(ax):
        if a < 0:
            a += x.ndim
        width[a] = (pads_l[i], pads_l[i + n])
    if any(lo < 0 or hi < 0 for lo, hi in width):
        # Negative pad values CROP the corresponding edge (ONNX permits
        # mixing: crop one edge, pad the other).
        slices = tuple(
            slice(
                -lo if lo < 0 else 0,
                x.shape[d] + hi if hi < 0 else None,
            )
            for d, (lo, hi) in enumerate(width)
        )
        x = x[slices]
        width = [(max(lo, 0), max(hi, 0)) for lo, hi in width]
    if mode == "constant":
        # opset < 11 carries the fill value as the `value` float attribute;
        # opset >= 11 as the optional constant_value input.
        cv = ctx.attr("value", 0.0)
        if constant_value is not None:
            cv = np.asarray(constant_value).reshape(-1)
            cv = cv[0] if cv.size else 0
        return [jnp.pad(x, width, constant_values=cv)]
    jmode = {"reflect": "reflect", "edge": "edge", "wrap": "wrap"}[mode]
    return [jnp.pad(x, width, mode=jmode)]


@op("Range")
def _range(ctx, start, limit, delta):
    for v, what in ((start, "start"), (limit, "limit"), (delta, "delta")):
        if not _is_static(v):
            raise ValueError(f"Range {what} must be a compile-time constant")
    s = np.asarray(start).reshape(())
    l = np.asarray(limit).reshape(())
    d = np.asarray(delta).reshape(())
    dtype = s.dtype
    if np.issubdtype(dtype, np.floating):
        # ONNX defines the length as ceil((limit-start)/delta); computing
        # k*delta+start avoids np.arange's float accumulation quirks.
        n = max(0, int(np.ceil((float(l) - float(s)) / float(d))))
        return [(np.arange(n, dtype=np.float64) * float(d) + float(s)).astype(dtype)]
    return [np.arange(int(s), int(l), int(d), dtype=dtype)]


@op("OneHot")
def _onehot(ctx, indices, depth, values):
    axis = int(ctx.attr("axis", -1))
    d = _static_int(depth, "OneHot depth")
    values = jnp.asarray(values)
    oh = jax.nn.one_hot(jnp.asarray(indices), d, axis=axis, dtype=values.dtype)
    return [oh * (values[1] - values[0]) + values[0]]


# ---------------------------------------------------------------------------
# reductions
# ---------------------------------------------------------------------------


def _reduce(fn, needs_float=False):
    def impl(ctx, x, axes=None):
        x = jnp.asarray(x)
        if ctx.opset >= 18 or axes is not None:
            ax = _axes_arg(ctx, x, axes)
        else:
            ax = ctx.attr("axes")
            ax = [int(a) for a in ax] if ax is not None else None
        keepdims = bool(int(ctx.attr("keepdims", 1)))
        noop = bool(int(ctx.attr("noop_with_empty_axes", 0)))
        if ax is None or len(ax) == 0:
            # noop_with_empty_axes applies both to an explicitly-empty axes
            # tensor and to an absent axes input (exporters use either
            # encoding for "no axes" at opset 18).
            if noop:
                return [x]
            ax = None
        else:
            ax = tuple(ax)
        return [fn(x, axis=ax, keepdims=keepdims)]

    return impl


op("ReduceSum")(_reduce(jnp.sum))
op("ReduceMean")(_reduce(jnp.mean))
op("ReduceMax")(_reduce(jnp.max))
op("ReduceMin")(_reduce(jnp.min))
op("ReduceProd")(_reduce(jnp.prod))
op("ReduceL1")(_reduce(lambda x, axis, keepdims: jnp.sum(jnp.abs(x), axis=axis, keepdims=keepdims)))
op("ReduceL2")(_reduce(lambda x, axis, keepdims: jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))))
op("ReduceLogSum")(_reduce(lambda x, axis, keepdims: jnp.log(jnp.sum(x, axis=axis, keepdims=keepdims))))
op("ReduceLogSumExp")(_reduce(lambda x, axis, keepdims: jax.scipy.special.logsumexp(x, axis=axis, keepdims=keepdims)))
op("ReduceSumSquare")(_reduce(lambda x, axis, keepdims: jnp.sum(x * x, axis=axis, keepdims=keepdims)))


def _arg_reduce(fn):
    def impl(ctx, x):
        x = jnp.asarray(x)
        axis = int(ctx.attr("axis", 0))
        keepdims = bool(int(ctx.attr("keepdims", 1)))
        if int(ctx.attr("select_last_index", 0)):
            # jnp.arg{max,min} return the FIRST tied index; flip the axis and
            # mirror the result to get the last occurrence instead.
            n = x.shape[axis if axis >= 0 else axis + x.ndim]
            y = (n - 1 - fn(jnp.flip(x, axis), axis=axis)).astype(jnp.int64)
        else:
            y = fn(x, axis=axis).astype(jnp.int64)
        if keepdims:
            y = jnp.expand_dims(y, axis)
        return [y]

    return impl


op("ArgMax")(_arg_reduce(jnp.argmax))
op("ArgMin")(_arg_reduce(jnp.argmin))


@op("TopK")
def _topk(ctx, x, k=None):
    x = jnp.asarray(x)
    # opset < 10 carries k as a required int attribute; >= 10 as an input.
    if k is not None:
        kk = _static_int(k, "TopK k")
    else:
        k_attr = ctx.attr("k")
        if k_attr is None:
            raise ValueError("TopK (opset<10) requires the k attribute")
        kk = int(k_attr)
    axis = int(ctx.attr("axis", -1))
    largest = int(ctx.attr("largest", 1))
    if axis < 0:
        axis += x.ndim
    moved = jnp.moveaxis(x, axis, -1)
    if largest:
        vals, idxs = lax.top_k(moved, kk)
    else:
        vals, idxs = lax.top_k(-moved, kk)
        vals = -vals
    return [
        jnp.moveaxis(vals, -1, axis),
        jnp.moveaxis(idxs.astype(jnp.int64), -1, axis),
    ]


@op("CumSum")
def _cumsum(ctx, x, axis):
    ax = _static_int(axis, "CumSum axis")
    x = jnp.asarray(x)
    exclusive = int(ctx.attr("exclusive", 0))
    reverse = int(ctx.attr("reverse", 0))
    if reverse:
        x = jnp.flip(x, ax)
    y = jnp.cumsum(x, axis=ax)
    if exclusive:
        y = y - x
    if reverse:
        y = jnp.flip(y, ax)
    return [y]


# ---------------------------------------------------------------------------
# signal / misc
# ---------------------------------------------------------------------------


def _resize_src_coords(d_in: int, d_out: int, scale: float, coord_mode: str) -> np.ndarray:
    """ONNX Resize output→input coordinate mapping (float, unclamped)."""
    i = np.arange(d_out, dtype=np.float64)
    if coord_mode == "half_pixel":
        return (i + 0.5) / scale - 0.5
    if coord_mode == "pytorch_half_pixel":
        return (i + 0.5) / scale - 0.5 if d_out > 1 else np.zeros(d_out)
    if coord_mode == "asymmetric":
        return i / scale
    if coord_mode == "align_corners":
        return i * ((d_in - 1) / (d_out - 1)) if d_out > 1 else np.zeros(d_out)
    if coord_mode == "half_pixel_symmetric":
        adjustment = d_out / (scale * d_in)
        center = d_in / 2.0
        offset = center * (1.0 - adjustment)
        return offset + (i + 0.5) / scale - 0.5
    raise NotImplementedError(
        f"Resize coordinate_transformation_mode {coord_mode!r} not supported"
    )


def _resize_nearest_idx(src: np.ndarray, d_in: int, nearest_mode: str) -> np.ndarray:
    if nearest_mode == "round_prefer_floor":
        idx = np.ceil(src - 0.5)
    elif nearest_mode == "round_prefer_ceil":
        idx = np.floor(src + 0.5)
    elif nearest_mode == "floor":
        idx = np.floor(src)
    elif nearest_mode == "ceil":
        idx = np.ceil(src)
    else:
        raise NotImplementedError(f"Resize nearest_mode {nearest_mode!r} not supported")
    return np.clip(idx.astype(np.int64), 0, d_in - 1)


def _keys_cubic(t, a: float, xp=np):
    """Keys cubic convolution kernel (ONNX cubic_coeff_a, default -0.75).
    Branchless so it serves both the trace-time numpy Resize weights and
    the runtime jnp GridSample taps (pass ``xp=jnp``)."""
    at = xp.abs(t)
    w1 = ((a + 2.0) * at - (a + 3.0)) * at * at + 1.0
    w2 = (((at - 5.0) * at + 8.0) * at - 4.0) * a
    return xp.where(at <= 1.0, w1, xp.where(at < 2.0, w2, xp.zeros_like(at)))


def _resize_weight_matrix(d_in: int, src: np.ndarray, scale: float,
                          mode: str, *, antialias: bool,
                          exclude_outside: bool, cubic_a: float) -> np.ndarray:
    """Trace-time [d_out, d_in] resampling weights for one axis.

    Covers the spec's full linear/cubic space: ``antialias=1`` stretches
    the kernel by 1/scale on downscale (PIL/torch-style, normalized);
    ``exclude_outside=1`` zeroes taps outside the input and renormalizes;
    otherwise out-of-range taps clamp to the edge (onnxruntime's
    exclude_outside=0 behavior). Applied as one MXU matmul per axis."""
    support = 1.0 if mode == "linear" else 2.0
    kscale = max(1.0, 1.0 / scale) if antialias and scale < 1.0 else 1.0
    if kscale > 1.0:
        # Antialias border handling follows PIL/torch (the producers of
        # antialias=1 models): the stretched window CLIPS to in-bounds taps
        # and renormalizes, rather than folding its tail onto the edge
        # pixel. Interior outputs are unaffected either way.
        exclude_outside = True
    W = np.zeros((src.size, d_in), np.float64)
    for i, c in enumerate(src):
        j0 = int(np.ceil(c - support * kscale))
        j1 = int(np.floor(c + support * kscale))
        js = np.arange(j0, j1 + 1)
        t = (js - c) / kscale
        if mode == "linear":
            w = np.maximum(0.0, 1.0 - np.abs(t))
        else:
            w = _keys_cubic(t, cubic_a)
        if exclude_outside:
            w = w * ((js >= 0) & (js < d_in))
        total = w.sum()
        if total != 0.0:
            w = w / total
        np.add.at(W[i], np.clip(js, 0, d_in - 1), w)
    return W.astype(np.float32)


def _apply_axis_weights(x, axis: int, W: np.ndarray):
    """y[..., i, ...] = sum_j W[i, j] * x[..., j, ...] along ``axis``
    (f32 accumulation, original dtype restored)."""
    orig = x.dtype
    moved = jnp.moveaxis(x, axis, -1).astype(jnp.float32)
    y = jnp.matmul(moved, jnp.asarray(W.T, dtype=jnp.float32))
    return jnp.moveaxis(y, -1, axis).astype(orig)


def _resize_axis(x, axis: int, src: np.ndarray, linear: bool, nearest_mode: str):
    """Resample one axis of ``x`` by gathering at source coordinates ``src``."""
    d_in = x.shape[axis]
    if not linear:
        return jnp.take(x, jnp.asarray(_resize_nearest_idx(src, d_in, nearest_mode)), axis=axis)
    # Linear: weights use the unclamped fractional offset; taps clamp to the
    # edge (ONNX Runtime's exclude_outside=0 behavior).
    lo_f = np.floor(src)
    frac = (src - lo_f).astype(np.float32)
    lo = np.clip(lo_f.astype(np.int64), 0, d_in - 1)
    hi = np.clip(lo_f.astype(np.int64) + 1, 0, d_in - 1)
    shape = [1] * x.ndim
    shape[axis] = src.size
    w = jnp.asarray(frac).reshape(shape).astype(x.dtype)
    xl = jnp.take(x, jnp.asarray(lo), axis=axis)
    xh = jnp.take(x, jnp.asarray(hi), axis=axis)
    return xl + (xh - xl) * w


def _resize_tf_crop(ctx, x, roi, axes_l, out_shape, mode, nearest_mode):
    """``tf_crop_and_resize``: the TF detection-export idiom. Normalized
    per-axis ROI [start..., end...] selects the crop; outputs whose source
    coordinate falls outside the input get ``extrapolation_value``
    (reference semantics: onnxruntime's TF-compatible crop-resize;
    cubic+crop never appears in practice and raises)."""
    if mode == "cubic":
        raise NotImplementedError("Resize tf_crop_and_resize with mode=cubic")
    if int(ctx.attr("antialias", 0)) or int(ctx.attr("exclude_outside", 0)):
        raise NotImplementedError(
            "Resize tf_crop_and_resize with antialias/exclude_outside"
        )
    if roi is None or not _is_static(roi):
        raise ValueError(
            "Resize tf_crop_and_resize requires a compile-time-constant roi"
        )
    roi_v = np.asarray(roi, dtype=np.float64).reshape(-1)
    n_ax = len(axes_l)
    if roi_v.size != 2 * n_ax:
        raise ValueError(
            f"Resize roi has {roi_v.size} elements, expected {2 * n_ax}"
        )
    extrap = float(ctx.attr("extrapolation_value", 0.0))
    linear = mode == "linear"
    oob_masks = []  # one [d_out] bool per resampled axis, broadcast later
    for pos, axis in enumerate(axes_l):
        d_in = x.shape[axis]
        d_out = out_shape[axis]
        start, end = roi_v[pos], roi_v[n_ax + pos]
        i = np.arange(d_out, dtype=np.float64)
        if d_out > 1:
            src = start * (d_in - 1) + i * (end - start) * (d_in - 1) / (
                d_out - 1
            )
        else:
            src = np.full(1, 0.5 * (start + end) * (d_in - 1))
        oob = (src < 0.0) | (src > d_in - 1)
        x = _resize_axis(x, axis, src, linear, nearest_mode)
        shape = [1] * x.ndim
        shape[axis] = d_out
        oob_masks.append(jnp.asarray(oob).reshape(shape))
    # Other axes keep identity size by the spec's roi/axes contract.
    if oob_masks:
        any_oob = oob_masks[0]
        for m in oob_masks[1:]:
            any_oob = any_oob | m
        x = jnp.where(any_oob, jnp.asarray(extrap, dtype=x.dtype), x)
    return [x]


@op("Resize")
def _resize(ctx, x, roi=None, scales=None, sizes=None):
    x = jnp.asarray(x)
    mode = ctx.attr("mode", "nearest")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if ctx.opset < 11:
        # Opset-10 Resize has inputs (X, scales) and fixed legacy semantics:
        # asymmetric coordinates with floor-nearest, like Upsample.
        scales, roi = roi, None
        coord_mode = "asymmetric"
        nearest_mode = "floor"
    else:
        coord_mode = ctx.attr("coordinate_transformation_mode", "half_pixel")
        if isinstance(coord_mode, bytes):
            coord_mode = coord_mode.decode()
        nearest_mode = ctx.attr("nearest_mode", "round_prefer_floor")
        if isinstance(nearest_mode, bytes):
            nearest_mode = nearest_mode.decode()
    # Per spec both attributes only affect linear/cubic interpolation.
    antialias = bool(int(ctx.attr("antialias", 0)))
    exclude_outside = bool(int(ctx.attr("exclude_outside", 0)))
    cubic_a = float(ctx.attr("cubic_coeff_a", -0.75))

    policy = ctx.attr("keep_aspect_ratio_policy", "stretch")
    if isinstance(policy, bytes):
        policy = policy.decode()
    if policy not in ("stretch", "not_larger", "not_smaller"):
        raise NotImplementedError(f"Resize keep_aspect_ratio_policy {policy!r} not supported")

    # Opset-18 axes attribute: scales/sizes apply only to the listed axes.
    axes_attr = ctx.attr("axes")
    if axes_attr is not None:
        axes_l = [int(a) + (x.ndim if int(a) < 0 else 0) for a in axes_attr]
    else:
        axes_l = list(range(x.ndim))

    if sizes is not None:
        sz = _static_ints(sizes, "Resize sizes")
        out_shape = list(x.shape)
        if policy != "stretch":
            # One uniform scale over the listed axes: the min (not_larger)
            # or max (not_smaller) of the per-axis target ratios; targets
            # are then ROUNDED per the spec, aspect preserved.
            ratios = [o / x.shape[ax] for ax, o in zip(axes_l, sz)]
            uniform = min(ratios) if policy == "not_larger" else max(ratios)
            for ax in axes_l:
                out_shape[ax] = int(np.round(uniform * x.shape[ax]))
        else:
            for ax, o in zip(axes_l, sz):
                out_shape[ax] = o
        # The coordinate transform uses the effective scale d_out/d_in.
        sc = [o / d for o, d in zip(out_shape, x.shape)]
    else:
        sc_sub = list(np.asarray(scales, dtype=np.float64).reshape(-1))
        sc = [1.0] * x.ndim
        for ax, s in zip(axes_l, sc_sub):
            sc[ax] = s
        out_shape = [int(math.floor(d * s)) for d, s in zip(x.shape, sc)]

    if mode not in ("nearest", "linear", "cubic"):
        raise NotImplementedError(f"Resize mode {mode!r} not supported")

    if coord_mode == "tf_crop_and_resize":
        return _resize_tf_crop(ctx, x, roi, axes_l, out_shape, mode,
                               nearest_mode)

    linear = mode == "linear"
    for axis, (d_out, s) in enumerate(zip(out_shape, sc)):
        if d_out == x.shape[axis] and abs(s - 1.0) < 1e-12:
            continue
        src = _resize_src_coords(x.shape[axis], d_out, float(s), coord_mode)
        if mode == "cubic" or (
            linear and (exclude_outside or (antialias and s < 1.0))
        ):
            # General path: per-axis weight matrix (spec-exact Keys cubic
            # with cubic_coeff_a, antialias stretch, exclude_outside).
            W = _resize_weight_matrix(
                x.shape[axis], src, float(s), "linear" if linear else "cubic",
                antialias=antialias, exclude_outside=exclude_outside,
                cubic_a=cubic_a,
            )
            x = _apply_axis_weights(x, axis, W)
        else:
            x = _resize_axis(x, axis, src, linear, nearest_mode)
    return [x]


@op("Upsample")
def _upsample(ctx, x, scales=None):
    """Legacy Upsample (deprecated opset 10; old TF/keras exporters emit
    it). Uses ASYMMETRIC coordinates with floor-nearest — the legacy
    semantics ONNX Runtime implements (Resize with
    coordinate_transformation_mode=asymmetric), which differ from
    jax.image.resize's half-pixel convention."""
    x = jnp.asarray(x)
    mode = ctx.attr("mode", "nearest")
    if isinstance(mode, bytes):
        mode = mode.decode()
    if scales is None:
        scales = ctx.attr("scales")  # opset 7 spelling: attribute
    if scales is None and ctx.opset <= 6:
        # Original 2017 experimental spelling: per-axis scale attributes
        # on NCHW images.
        h_scale = ctx.attr("height_scale")
        w_scale = ctx.attr("width_scale")
        if h_scale is None or w_scale is None:
            raise ValueError(
                "Upsample (opset<=6) requires height_scale and "
                "width_scale attributes"
            )
        scales = [1.0, 1.0, float(h_scale), float(w_scale)]
    if scales is None:
        raise ValueError("Upsample node carries no scales input or attribute")
    sc = np.asarray(scales, dtype=np.float64).reshape(-1)
    linear = mode in ("linear", "bilinear", "trilinear")
    for axis, s in enumerate(sc):
        d_in = x.shape[axis]
        d_out = int(math.floor(d_in * s))
        if d_out == d_in and s == 1.0:
            continue
        # Asymmetric mapping uses the ORIGINAL scale (x_src = x_out / s),
        # not the d_in/d_out ratio — for fractional scales where d_in*s is
        # non-integer the two pick different source indices (ORT legacy
        # semantics use x/scale). Shares the Resize per-axis machinery.
        src = _resize_src_coords(d_in, d_out, float(s), "asymmetric")
        x = _resize_axis(x, axis, src, linear, "floor")
    return [x]


@op("Celu")
def _celu(ctx, x):
    alpha = float(ctx.attr("alpha", 1.0))
    x = jnp.asarray(x)
    return [jnp.maximum(x, 0) + jnp.minimum(0, alpha * jnp.expm1(x / alpha))]


@op("ThresholdedRelu")
def _thresholded_relu(ctx, x):
    alpha = float(ctx.attr("alpha", 1.0))
    x = jnp.asarray(x)
    return [jnp.where(x > alpha, x, 0.0)]


@op("Shrink")
def _shrink(ctx, x):
    lambd = float(ctx.attr("lambd", 0.5))
    bias = float(ctx.attr("bias", 0.0))
    x = jnp.asarray(x)
    return [jnp.where(x < -lambd, x + bias, jnp.where(x > lambd, x - bias, 0.0))]


@op("Trilu")
def _trilu(ctx, x, k=None):
    x = jnp.asarray(x)
    kk = _static_int(k, "Trilu k") if k is not None else 0
    upper = int(ctx.attr("upper", 1))
    return [jnp.triu(x, kk) if upper else jnp.tril(x, kk)]


@op("EyeLike")
def _eyelike(ctx, x):
    x = jnp.asarray(x)
    dtype = ctx.attr("dtype")
    dt = _ONNX_TO_NP[int(dtype)] if dtype is not None else x.dtype
    kk = int(ctx.attr("k", 0))
    return [jnp.eye(x.shape[0], x.shape[1], k=kk, dtype=dt)]


def _qdq_scale_zp(ctx, x, scale, zero_point):
    """Expand a QDQ scale/zero-point to broadcast against ``x``.

    Three spec granularities: per-tensor (scalar), per-axis (1-D along
    ``axis``), and blocked (opset 21: ``block_size`` > 0, scale has x's
    rank with the ``axis`` dim divided by the block size — each block's
    scale repeats ``block_size`` times along ``axis``, tail block
    clamped)."""
    scale = jnp.asarray(scale)
    axis = int(ctx.attr("axis", 1))
    if axis < 0:
        axis += x.ndim
    bs = int(ctx.attr("block_size", 0))
    if bs > 0:
        if scale.ndim != x.ndim:
            raise ValueError(
                f"{ctx.op_type}: blocked quantization needs a scale of "
                f"x's rank ({x.ndim}); got rank {scale.ndim}"
            )
        blk = jnp.minimum(
            jnp.arange(x.shape[axis]) // bs, scale.shape[axis] - 1
        )
        scale = jnp.take(scale, blk, axis=axis)
        if zero_point is not None:
            zero_point = jnp.take(
                jnp.asarray(zero_point), blk, axis=axis
            )
    elif scale.ndim == 1 and scale.shape[0] > 1:
        shape = [1] * x.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        if zero_point is not None:
            zero_point = jnp.asarray(zero_point).reshape(shape)
    return scale, zero_point


@op("DequantizeLinear")
def _dequantize_linear(ctx, x, scale, zero_point=None):
    """QDQ dequantize: (x - zero_point) * scale — per-tensor, per-axis,
    or blocked (opset 21 ``block_size``) granularity."""
    x = jnp.asarray(x)
    scale, zero_point = _qdq_scale_zp(ctx, x, scale, zero_point)
    xf = x.astype(jnp.float32)
    if zero_point is not None:
        xf = xf - jnp.asarray(zero_point).astype(jnp.float32)
    return [xf * scale.astype(jnp.float32)]


@op("QuantizeLinear")
def _quantize_linear(ctx, x, scale, zero_point=None):
    """QDQ quantize: saturating round(x / scale) + zero_point — per-tensor,
    per-axis, or blocked (opset 21 ``block_size``) granularity; the target
    dtype comes from the zero point, the ``output_dtype`` attribute
    (opset 21, zero-point-free form), or defaults to uint8."""
    x = jnp.asarray(x).astype(jnp.float32)
    scale, zero_point = _qdq_scale_zp(ctx, x, scale, zero_point)
    scale = scale.astype(jnp.float32)
    q = jnp.round(x / scale)
    if zero_point is not None:
        zp = jnp.asarray(zero_point)
        q = q + zp.astype(jnp.float32)
        out_dtype = zp.dtype
    elif ctx.attr("output_dtype") is not None:
        out_dtype = jnp.dtype(_ONNX_TO_NP[int(ctx.attr("output_dtype"))])
    else:
        out_dtype = jnp.dtype(jnp.uint8)
    if jnp.issubdtype(out_dtype, jnp.floating):
        # float8 targets (opset 19+): the default saturate=1 clamps to the
        # format's finite range (astype alone overflows to inf/nan).
        y = x / scale
        if int(ctx.attr("saturate", 1)):
            info = jnp.finfo(out_dtype)
            y = jnp.clip(y, float(info.min), float(info.max))
        return [y.astype(out_dtype)]
    info = jnp.iinfo(out_dtype)  # ml_dtypes int4/uint4 report [-8,7]/[0,15]
    return [jnp.clip(q, info.min, info.max).astype(out_dtype)]


# ---------------------------------------------------------------------------
# integer / quantized compute — the int8 MXU path
#
# TPU v5e executes int8 matmuls/convs on the MXU at 2x the bf16 peak
# (measured 66 TOPS vs 51 TFLOPS on this hardware). These lowerings keep
# operands int8 with int32 accumulation (``preferred_element_type``) so XLA
# emits the native int8 systolic-array path. Zero points are handled by
# algebraic correction terms rather than widening the operands, which would
# forfeit the int8 MXU. The reference exposes int8 only as a TensorRT flag
# (src/tensorrt_config.rs int8 option); here it is a first-class compute path.
# ---------------------------------------------------------------------------


def _quant_pair(q, zp):
    """Normalize a quantized tensor to int8 for the MXU.

    uint8 tensors are shifted down by 128 (with the zero point shifted to
    match, preserving the dequantized value). Returns
    ``(q_s8, zp_i32, zp_is_statically_zero)``.
    """
    q = jnp.asarray(q)
    if q.dtype == jnp.uint8:
        shift = 128
        q = (q.astype(jnp.int32) - 128).astype(jnp.int8)
    elif q.dtype == jnp.int8:
        shift = 0
    else:
        raise NotImplementedError(
            f"quantized compute expects int8/uint8 operands, got {q.dtype}"
        )
    base = np.int32(0) if zp is None else zp
    if _is_static(base):
        arr = np.asarray(base).astype(np.int64) - shift
        return q, jnp.asarray(arr.astype(np.int32)), bool(np.all(arr == 0))
    return q, jnp.asarray(base).astype(jnp.int32) - shift, False


def _bcast_channel(v, ndim, axis):
    """Reshape a 1-D per-channel vector for broadcasting along ``axis``."""
    v = jnp.asarray(v)
    if v.ndim == 1 and v.shape[0] > 1:
        shape = [1] * ndim
        shape[axis] = -1
        return v.reshape(shape)
    return v


def _int_conv_acc(ctx, x, w, x_zp, w_zp):
    """Exact int32 accumulator of conv(x - x_zp, w - w_zp).

    Fast path (every mainstream quantizer): weight zero point statically
    zero and activation zero point a static scalar — runs an int8 MXU conv.
    A nonzero activation zero point is handled by padding with the zero
    point (dequantized zero, matching float Conv's zero padding) and
    subtracting the per-output-channel correction ``x_zp * sum(w)``.
    Otherwise falls back to an exact int32-operand conv.
    """
    x_s8, xzp, xzp_zero = _quant_pair(x, x_zp)
    w_s8, wzp, wzp_zero = _quant_pair(w, w_zp)
    nd = x_s8.ndim - 2
    geo = _conv_geometry(ctx, x_s8, w_s8)
    xzp_static_scalar = _is_static(xzp) and np.asarray(xzp).size == 1
    if wzp_zero and (xzp_zero or xzp_static_scalar):
        if xzp_zero:
            return lax.conv_general_dilated(
                x_s8, w_s8, preferred_element_type=jnp.int32, **geo
            )
        xzp_i = int(np.asarray(xzp).reshape(-1)[0])
        x_pad = jnp.pad(
            x_s8,
            ((0, 0), (0, 0)) + tuple(geo["padding"]),
            constant_values=np.int8(xzp_i),
        )
        acc = lax.conv_general_dilated(
            x_pad,
            w_s8,
            preferred_element_type=jnp.int32,
            **{**geo, "padding": [(0, 0)] * nd},
        )
        sum_w = jnp.sum(w_s8.astype(jnp.int32), axis=tuple(range(1, w_s8.ndim)))
        return acc - xzp_i * sum_w.reshape((1, -1) + (1,) * nd)
    # General exact path: widen to int32. Padded taps must contribute
    # (0 - 0) = dequantized zero, so subtract zero points *before* the conv.
    x32 = x_s8.astype(jnp.int32) - _bcast_channel(xzp, x_s8.ndim, 1)
    w32 = w_s8.astype(jnp.int32) - _bcast_channel(wzp, w_s8.ndim, 0)
    return lax.conv_general_dilated(
        x32, w32, preferred_element_type=jnp.int32, **geo
    )


def _int_matmul_acc(a, b, a_zp, b_zp):
    """Exact int32 accumulator of matmul(a - a_zp, b - b_zp); int8 MXU when
    the b zero point is statically zero and the a zero point is scalar."""
    a_s8, azp, azp_zero = _quant_pair(a, a_zp)
    b_s8, bzp, bzp_zero = _quant_pair(b, b_zp)
    azp_scalar = jnp.asarray(azp).size == 1
    if bzp_zero and (azp_zero or azp_scalar):
        acc = jnp.matmul(a_s8, b_s8, preferred_element_type=jnp.int32)
        if not azp_zero:
            sum_b = jnp.sum(b_s8.astype(jnp.int32), axis=-2, keepdims=True)
            acc = acc - jnp.asarray(azp).reshape(()).astype(jnp.int32) * sum_b
        return acc
    # General path (per-row a_zp / nonzero b_zp): widen to int32.
    azp_b = jnp.asarray(azp)
    if azp_b.ndim == 1 and azp_b.shape[0] > 1:
        azp_b = azp_b.reshape(-1, 1)  # per-row of a's second-to-last axis
    a32 = a_s8.astype(jnp.int32) - azp_b
    b32 = b_s8.astype(jnp.int32) - jnp.asarray(bzp)  # 1-D bzp is per-column
    return jnp.matmul(a32, b32, preferred_element_type=jnp.int32)


# Activations foldable into the quantized epilogue. They run in f32 on the
# dequantized accumulator BEFORE requantization — bit-identical to the
# unfused f32 computation, and they save a full HBM round trip: without
# folding, each activation is a separate elementwise pass over int8
# activations, doubling the memory traffic of a bandwidth-bound block.
_EPILOGUE_ACTS = {
    "": lambda v: v,
    "relu": lambda v: jnp.maximum(v, 0.0),
    "sigmoid": jax.nn.sigmoid,
    "silu": lambda v: v * jax.nn.sigmoid(v),
    "tanh": jnp.tanh,
}


def _requantize(ctx, acc_f32, y_scale, y_zp, channel_ndim=None):
    """float accumulator → quantized output tensor (round-half-even,
    saturating cast; output dtype follows the zero point, uint8 default).
    An optional ``_fused_act`` attribute applies the activation in the f32
    epilogue (exact; see _EPILOGUE_ACTS). ``_fused_relu`` is the legacy
    boolean spelling of ``_fused_act='relu'``."""
    act = ctx.attr("_fused_act", "relu" if int(ctx.attr("_fused_relu", 0)) else "")
    acc_f32 = _EPILOGUE_ACTS[act](acc_f32)
    y_scale = jnp.asarray(y_scale).astype(jnp.float32)
    if channel_ndim is not None:
        y_scale = _bcast_channel(y_scale, channel_ndim, 1)
    q = jnp.round(acc_f32 / y_scale)
    if y_zp is not None:
        zp = jnp.asarray(y_zp)
        out_dtype = zp.dtype
        q = q + zp.astype(jnp.float32)
    else:
        out_dtype = jnp.uint8
    info = jnp.iinfo(out_dtype)
    return jnp.clip(q, info.min, info.max).astype(out_dtype)


def _qconv1x1_kernel_eligible(ctx, x, w, x_zp, w_zp, y_zp):
    """Pallas fused conv+requant eligibility: symmetric int8 1x1 stride-1
    ungrouped conv on a TPU backend with a lane-aligned spatial extent.
    (The XLA path materializes the s32 accumulator in HBM — convs can't
    fuse epilogues — so the kernel halves the int8 path's HBM traffic;
    see ops/pallas/qconv.py for the measured numbers.)"""
    if NO_PALLAS_SENTINEL in ctx.env:
        return False
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    if x.ndim != 4 or x.dtype != jnp.int8 or w.dtype != jnp.int8:
        return False
    if tuple(w.shape[2:]) != (1, 1):
        return False
    if [int(s) for s in ctx.attr("strides", [1, 1])] != [1, 1]:
        return False
    if [int(d) for d in ctx.attr("dilations", [1, 1])] != [1, 1]:
        return False
    if int(ctx.attr("group", 1)) != 1:
        return False
    ap = ctx.attr("auto_pad", "NOTSET")
    if isinstance(ap, bytes):
        ap = ap.decode()
    if ap in ("NOTSET", ""):
        if [int(p) for p in ctx.attr("pads", [0, 0, 0, 0])] != [0, 0, 0, 0]:
            return False
    elif ap != "VALID":
        return False
    for zp in (x_zp, w_zp, y_zp):
        if zp is None:
            return False  # y_zp None means uint8 output; keep XLA path
        if not _is_static(zp) or np.asarray(zp).dtype != np.int8:
            return False
        if not np.all(np.asarray(zp) == 0):
            return False
    from ..ops.pallas.qconv import eligible

    return eligible(int(x.shape[2]) * int(x.shape[3]))


@op("QLinearConv")
def _qlinear_conv(ctx, x, x_s, x_zp, w, w_s, w_zp, y_s, y_zp=None, b=None):
    """Quantized conv on the int8 MXU. Inputs per the ONNX spec; the
    optional ``_fused_act`` attribute (relu/sigmoid/silu/tanh) is set by
    the QDQ fusion pass for Conv→activation→QuantizeLinear chains and runs
    in the f32 requant epilogue (exact, and one HBM pass instead of two).

    Symmetric int8 1x1 convs on TPU route to the Pallas fused
    conv+requant kernel (ops/pallas/qconv.py): bit-identical to this
    lowering's XLA path, 2.4x faster (the XLA path must materialize the
    int32 accumulator in HBM)."""
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    nd = x.ndim - 2
    if (
        nd == 2
        and _is_static(x_s) and _is_static(w_s) and _is_static(y_s)
        and np.asarray(y_s).size == 1
        and _qconv1x1_kernel_eligible(ctx, x, w, x_zp, w_zp, y_zp)
    ):
        from ..ops.pallas.qconv import qconv1x1_requant

        n_img, c_in, h, wdim = x.shape
        act = ctx.attr(
            "_fused_act", "relu" if int(ctx.attr("_fused_relu", 0)) else ""
        )
        scale = np.broadcast_to(
            np.asarray(x_s, np.float32).reshape(-1)
            * np.asarray(w_s, np.float32).reshape(-1),
            (w.shape[0],),
        )
        y = qconv1x1_requant(
            x.reshape(n_img, c_in, h * wdim),
            w[:, :, 0, 0],
            None if b is None else jnp.asarray(b, jnp.int32),
            scale,
            float(np.asarray(y_s).reshape(())),
            act=act,
            out_dtype=jnp.int8,
        )
        return [y.reshape(n_img, w.shape[0], h, wdim)]
    acc = _int_conv_acc(ctx, x, w, x_zp, w_zp)
    if b is not None:
        acc = acc + jnp.asarray(b).astype(jnp.int32).reshape((1, -1) + (1,) * nd)
    scale = jnp.asarray(x_s).astype(jnp.float32) * _bcast_channel(
        jnp.asarray(w_s).astype(jnp.float32), x.ndim, 1
    )
    return [_requantize(ctx, acc.astype(jnp.float32) * scale, y_s, y_zp,
                        channel_ndim=x.ndim)]


@op("QLinearMatMul")
def _qlinear_matmul(ctx, a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp=None):
    """Quantized matmul on the int8 MXU (per-tensor a scale, per-tensor or
    per-column b scale)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    acc = _int_matmul_acc(a, b, a_zp, b_zp)
    scale = jnp.asarray(a_s).astype(jnp.float32) * jnp.asarray(b_s).astype(
        jnp.float32
    )  # 1-D b scale broadcasts along the output's last (column) axis
    return [_requantize(ctx, acc.astype(jnp.float32) * scale, y_s, y_zp)]


@op("_QLinearGemm")
def _qlinear_gemm(ctx, a, a_s, a_zp, b, b_s, b_zp, y_s, y_zp=None, bias=None):
    """Internal fused op emitted by the QDQ pass for quantized Gemm
    (ONNX has no QLinearGemm). alpha=beta=1 is guaranteed by the pass;
    ``bias`` is int32 at scale a_s*b_s. transB applies to the stored weight."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if int(ctx.attr("transA", 0)):
        a = a.T
    if int(ctx.attr("transB", 0)):
        # Stored weight is [N, K] with per-channel scale along N; after the
        # transpose the 1-D scale broadcasts along the output's column axis.
        b = b.T
    acc = _int_matmul_acc(a, b, a_zp, b_zp)
    if bias is not None:
        acc = acc + jnp.asarray(bias).astype(jnp.int32)
    scale = jnp.asarray(a_s).astype(jnp.float32) * jnp.asarray(b_s).astype(
        jnp.float32
    )
    return [_requantize(ctx, acc.astype(jnp.float32) * scale, y_s, y_zp)]


@op("ConvInteger")
def _conv_integer(ctx, x, w, x_zp=None, w_zp=None):
    return [_int_conv_acc(ctx, jnp.asarray(x), jnp.asarray(w), x_zp, w_zp)]


@op("MatMulInteger")
def _matmul_integer(ctx, a, b, a_zp=None, b_zp=None):
    return [_int_matmul_acc(jnp.asarray(a), jnp.asarray(b), a_zp, b_zp)]


@op("DynamicQuantizeLinear")
def _dynamic_quantize_linear(ctx, x):
    """Per the ONNX spec: uint8 quantization with range adjusted to include
    zero, scale = (max - min)/255, NaN-free saturating round-half-even."""
    x = jnp.asarray(x).astype(jnp.float32)
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    scale = (x_max - x_min) / 255.0
    safe_scale = jnp.where(scale == 0, 1.0, scale)
    zp = jnp.clip(jnp.round(0.0 - x_min / safe_scale), 0.0, 255.0)
    y = jnp.clip(jnp.round(x / safe_scale) + zp, 0.0, 255.0).astype(jnp.uint8)
    return [y, scale.astype(jnp.float32), zp.astype(jnp.uint8)]


def _run_subgraph(ctx: OpContext, graph, extra_env=None):
    """Interpret a control-flow subgraph with outer-scope capture: the
    enclosing environment is visible (ONNX closure rule), shadowed by the
    subgraph's own initializers and explicit inputs."""
    from .importer import interpret_graph

    env = dict(ctx.env)
    for t in graph.initializer:
        env[t.name] = t.to_numpy()
    if extra_env:
        env.update(extra_env)
    return interpret_graph(
        graph, ctx.opset, ctx.precision, env, [v.name for v in graph.output]
    )


# ---------------------------------------------------------------------------
# fused MBConv (see compiler/fuse_mbconv.py)
# ---------------------------------------------------------------------------

# The Pallas whole-block kernel is disabled by the mesh-sharded paths
# (a pallas_call inside pjit would not partition over the batch axis):
# make_forward(..., disable_pallas_fusion=True) plants this sentinel in
# the interpreter environment, which control-flow subgraphs inherit.
NO_PALLAS_SENTINEL = "\x00no_pallas_fusion"


@op("_FusedMBConv")
def _fused_mbconv(ctx, x, w1, b1, wd, bd, se1w, se1b, se2w, se2b, w3, b3):
    """Whole MBConv block, re-interpreting the original node chain stored
    in the ``body`` attribute — bit-identical to the unfused graph. The
    grouping exists for the stage-prefix bundler (fuse_stage_prefix.py)
    and per-block analysis tooling; per-block Pallas kernels were
    measured a LOSS end-to-end and removed (round-1 block/block2 and the
    round-2 stage123 in-pipeline sweep — docs/performance.md has the
    numbers and the mechanism)."""
    body = ctx.attr("body")
    return list(_run_subgraph(ctx, body))


@op("_FusedStagePrefix")
def _fused_stage_prefix(ctx, x, stem_w, stem_b, *block_args):
    """Stem + leading MBConv chain as ONE Pallas megakernel call
    (ops/pallas/stage123.py): the whole prefix for each segment runs inside
    VMEM, cutting its HBM traffic to the mel image in and the last block's
    activations out. Bundled by compiler/fuse_stage_prefix.py.

    **Default OFF** (``k = 0``: body fallback). The in-pipeline sweep
    (scripts/split_sweep.py, v5e, 4096-segment dispatches) measured EVERY
    split point slower than the pure XLA lowering — 20.7k seg/s at
    split 0 vs 20.2k/20.2k/19.3k/18.7k at splits 1/2/3/6: the depthwise
    tap arithmetic is VPU-bound and the polyphase roll/mask overhead plus
    the from_planes boundary relayout outweigh the HBM savings
    (docs/performance.md has the full attribution). The kernel stays
    correct, tested, and reachable for experimentation:

    - ``BIRDNET_STAGE123_SPLIT=k`` runs the kernel for stem + the first
      ``k`` blocks, interpreting the remaining blocks op-by-op.
    - ``BIRDNET_PALLAS_STAGE123=0`` force-disables regardless.

    Eligibility is decided here at trace time: TPU backend, bf16
    activation policy, and the kernel's exact geometry envelope
    ([N, 1, 96, W] with W in {511, 512} — see stage123.py's module
    docstring for why one pad column keeps it exact). Everything else
    re-interprets the ``body`` chain, bit-identical to the unfused graph.
    """
    import os

    from ..ops.pallas.stage123 import BlockGeom

    x = jnp.asarray(x)
    strides = [int(s) for s in ctx.attr("strides")]
    n_blocks = len(strides)
    residuals = [int(r) for r in ctx.attr("residuals")]
    body = ctx.attr("body")

    eligible = (
        os.environ.get("BIRDNET_PALLAS_STAGE123", "1") != "0"
        and NO_PALLAS_SENTINEL not in ctx.env
        and ctx.precision in ("fast", "bf16")
        and x.ndim == 4
        and x.shape[1] == 1
        and x.shape[2] == 96
        and x.shape[3] in (511, 512)
        and jax.default_backend() in ("tpu", "axon")
    )
    interpret = os.environ.get("BIRDNET_STAGE123_INTERPRET") == "1"
    if interpret:  # CI-tier wiring test: run the kernel in interpret mode
        eligible = (x.ndim == 4 and x.shape[1] == 1 and x.shape[2] == 96
                    and x.shape[3] in (511, 512))
    split = os.environ.get("BIRDNET_STAGE123_SPLIT")
    if split is not None:
        k = max(0, min(n_blocks, int(split)))
    elif interpret:
        k = n_blocks  # wiring tests exercise the full kernel path
    else:
        k = 0  # measured default: XLA wins at every split (see docstring)
    if not eligible or k == 0:
        return list(_run_subgraph(ctx, body))

    from ..ops.pallas.stage123 import (
        from_planes, stage_stack_forward, to_planes,
    )

    blocks = []
    bws = []
    for bi in range(k):
        (w1, b1, wd, bd, se1w, se1b, se2w, se2b, w3, b3) = (
            jnp.asarray(a) for a in block_args[10 * bi:10 * bi + 10]
        )
        blocks.append(BlockGeom(
            c_in=w1.shape[1], c_mid=w1.shape[0], c_se=se1w.shape[0],
            c_out=w3.shape[0], stride=strides[bi],
            residual=bool(residuals[bi]),
        ))
        bws.append({
            "w1": w1[:, :, 0, 0], "b1": b1, "wd": wd, "bd": bd,
            "se1": se1w[:, :, 0, 0], "bse1": se1b,
            "se2": se2w[:, :, 0, 0], "bse2": se2b,
            "w3": w3[:, :, 0, 0], "b3": b3,
        })
    planes = to_planes(x.astype(jnp.bfloat16))
    y = stage_stack_forward(
        planes, jnp.asarray(stem_w), jnp.asarray(stem_b), bws, blocks,
        fast_act=(ctx.precision == "fast"),
        compute_dtype=jnp.bfloat16,
        interpret=interpret,
    )
    grid = 4  # phase grid after the stride-2 stem
    for s in strides[:k]:
        grid //= s
    x_k = from_planes(y, grid, grid)
    if k == n_blocks:
        return [x_k]
    # Partial split: interpret the remaining blocks from the body chain,
    # seeded with the kernel's intermediate activation.
    from ..onnx import proto as P

    block_outputs = list(ctx.attr("block_outputs"))
    suffix = P.GraphProto(
        name="stage_prefix_suffix",
        node=body.node[3 + k:],
        initializer=[],
        input=[],
        output=[P.make_value_info(block_outputs[-1], _DT.FLOAT, [])],
    )
    return list(_run_subgraph(ctx, suffix,
                              extra_env={block_outputs[k - 1]: x_k}))


@op("_FusedFrontend")
def _fused_frontend(ctx, x, w):
    """Conv-form audio frontend (framing + filterbank + power + log) as one
    Pallas kernel per segment (ops/pallas/frontend.py::
    segments_filterbank_logpower). Bundled by compiler/fuse_frontend.py.

    The kernel wins 2.93x standalone against the XLA conv chain
    (scripts/bench_frontend.py: 2.99 vs 8.77 us/segment, bit-exact under
    the same bf16 policy) but measures 0.96-0.97x END-TO-END in the
    streaming scan (scripts/frontend_sweep.py, two 4096-segment runs):
    XLA overlaps the conv-frontend with neighboring backbone work, and
    the custom-call boundary serializes that overlap away. Default is
    therefore the XLA body; set ``BIRDNET_PALLAS_FRONTEND=1`` to opt in
    (bf16 policies on TPU only — numerics are policy-equivalent).
    """
    import os

    x = jnp.asarray(x)
    body = ctx.attr("body")
    hop = int(ctx.attr("hop"))
    eps = float(ctx.attr("eps"))
    interpret = os.environ.get("BIRDNET_FRONTEND_INTERPRET") == "1"
    eligible = (
        x.ndim == 2
        and x.shape[0] is not None
        and (interpret
             or (os.environ.get("BIRDNET_PALLAS_FRONTEND", "0") == "1"
                 and NO_PALLAS_SENTINEL not in ctx.env
                 and ctx.precision in ("fast", "bf16")
                 and jax.default_backend() in ("tpu", "axon")))
    )
    if not eligible:
        return list(_run_subgraph(ctx, body))

    from ..ops.pallas.frontend import segments_filterbank_logpower

    out = segments_filterbank_logpower(
        x.astype(jnp.bfloat16), jnp.asarray(w), hop=hop, eps=eps,
        compute_dtype=jnp.bfloat16, interpret=interpret,
    )  # [N, F, T] — already the mel-image orientation
    return [out[:, None]]


@op("_FusedStftFrontend")
def _fused_stft_frontend(ctx, x):
    """STFT-form audio frontend (framing + windowed DFT + power + mel +
    log) as one Pallas kernel per segment (ops/pallas/frontend.py::
    segments_stft_melspec). Bundled by compiler/fuse_frontend.py::
    fuse_stft_frontend; window/mel arrive as TENSOR attrs so the
    lowering can fold the window into the DFT basis and truncate to the
    mel filterbank's nonzero bin support host-side.

    Unlike the conv-form kernel (opt-in — XLA hides that chain under
    scan overlap), the XLA lowering of the STFT chain costs ~15
    us/segment MORE than the conv form (docs/performance.md), so this
    kernel defaults ON for bf16 policies on TPU;
    ``BIRDNET_PALLAS_STFT=0`` disables. Ineligible configs re-interpret
    ``body``, bit-identical to the unfused graph.
    """
    import os

    x = jnp.asarray(x)
    body = ctx.attr("body")
    interpret = os.environ.get("BIRDNET_FRONTEND_INTERPRET") == "1"
    eligible = (
        x.ndim == 2
        and x.shape[0] is not None
        and (interpret
             or (os.environ.get("BIRDNET_PALLAS_STFT", "1") != "0"
                 and NO_PALLAS_SENTINEL not in ctx.env
                 and ctx.precision in ("fast", "bf16")
                 and jax.default_backend() in ("tpu", "axon")))
    )
    if not eligible:
        return list(_run_subgraph(ctx, body))

    from ..ops.pallas.frontend import segments_stft_melspec

    out = segments_stft_melspec(
        x.astype(jnp.bfloat16),
        ctx.attr("window").to_numpy(),
        ctx.attr("mel").to_numpy(),
        hop=int(ctx.attr("hop")),
        frame_length=int(ctx.attr("frame_length")),
        eps=float(ctx.attr("eps")),
        compute_dtype=jnp.bfloat16,
        interpret=interpret,
    )  # [N, M, T] — already the mel-image orientation
    return [out[:, None]]


@op("If")
def _if(ctx, cond):
    """ONNX If. A static condition picks the branch at trace time (only
    that subgraph is compiled); a data-dependent condition lowers to
    ``lax.cond`` over both traced subgraphs (their output shapes/dtypes
    must match, which XLA enforces)."""
    if _is_static(cond):
        branch = (
            ctx.attr("then_branch")
            if bool(np.asarray(cond).reshape(-1)[0])
            else ctx.attr("else_branch")
        )
        return list(_run_subgraph(ctx, branch))

    def _branch(graph):
        def f(_):
            return tuple(jnp.asarray(v) for v in _run_subgraph(ctx, graph))

        return f

    pred = jnp.asarray(cond).reshape(())
    outs = lax.cond(
        pred, _branch(ctx.attr("then_branch")), _branch(ctx.attr("else_branch")), None
    )
    return list(outs)


def _loop_while(ctx, body, body_inputs, start_i, cond0, carried, max_trip):
    """Data-dependent Loop tail: ``lax.while_loop`` over the carried state
    (compiled once, looped on device). ONNX requires loop-invariant carried
    shapes for this form, which matches XLA's while-carry rule; scan
    outputs are structurally impossible here (their length is unknowable at
    compile time) and are rejected by the caller."""
    n = len(carried)
    state0 = (
        jnp.asarray(start_i, jnp.int32),
        jnp.asarray(cond0).reshape(()).astype(jnp.bool_),
    ) + tuple(jnp.asarray(c) for c in carried)
    if max_trip is not None and _is_static(max_trip):
        mt = int(np.asarray(max_trip).reshape(()))
        # Exporters spell a pure `while cond` loop as trip_count=INT64_MAX
        # (torch.jit.script does). Anything that can't survive the int32
        # cast below is an "unbounded" sentinel, not a real bound — keeping
        # it would overflow to a negative bound and run zero iterations.
        max_trip = None if mt >= 2**31 - 1 else mt
    if max_trip is not None:
        bound = jnp.asarray(max_trip).reshape(()).astype(jnp.int32)
        # A *traced* trip count >= 2^31 wraps negative in that cast (the
        # static case was normalized above). Negative trip counts are not
        # meaningful ONNX, so a negative bound can only be a wrapped
        # unbounded sentinel — saturate instead of silently running zero
        # iterations.
        bound = jnp.where(bound < 0, jnp.iinfo(jnp.int32).max, bound)

    def cond_fun(state):
        ok = state[1]
        if max_trip is not None:
            ok = jnp.logical_and(ok, state[0] < bound)
        return ok

    def body_fun(state):
        i = state[0]
        extra = dict(zip(body_inputs, (i, state[1]) + state[2:]))
        outs = _run_subgraph(ctx, body, extra)
        new_cond = jnp.asarray(outs[0]).reshape(()).astype(jnp.bool_)
        new_carried = tuple(
            jnp.asarray(o) for o in outs[1:1 + n]
        )
        return (i + 1, new_cond) + new_carried

    final = lax.while_loop(cond_fun, body_fun, state0)
    return list(final[2:])


def _loop_is_for(body) -> bool:
    """True when the body's cond_out is a passthrough of cond_in (the
    exporter pattern for a plain ``for i in range(M)``): the loop can
    never terminate early, so it lowers to ``lax.scan``."""
    if len(body.input) < 2:
        return False
    target = body.output[0].name
    src = body.input[1].name
    aliases = {src}
    for node in body.node:
        if node.op_type == "Identity" and node.input[0] in aliases:
            aliases.add(node.output[0])
    return target in aliases


def _loop_scan(ctx, body, body_inputs, m, v_initial, n_carried):
    """Static for-loop as ``lax.scan``: compiled once, any trip count,
    scan outputs stacked by the scan itself."""
    def step(carry, i):
        extra = dict(
            zip(body_inputs, [i, jnp.bool_(True)] + list(carry))
        )
        outs = _run_subgraph(ctx, body, extra)
        new_carry = tuple(jnp.asarray(o) for o in outs[1:1 + n_carried])
        scans = tuple(jnp.asarray(o) for o in outs[1 + n_carried:])
        return new_carry, scans

    init = tuple(jnp.asarray(v) for v in v_initial)
    final, stacked = jax.lax.scan(step, init, jnp.arange(m, dtype=jnp.int32))
    return list(final) + list(stacked)


# For-loops at or under this trip count unroll at trace time (constants
# fold per iteration, and exotic bodies with iteration-dependent shapes
# stay legal); longer ones lower to lax.scan (compiled once, no cap).
_LOOP_UNROLL_LIMIT = 64


@op("Loop")
def _loop(ctx, trip_count=None, cond=None, *v_initial):
    """ONNX Loop. Static trip count + static condition unrolls at trace
    time (the common exporter pattern, supports scan outputs); plain
    for-loops (cond_out = cond_in passthrough) longer than
    ``_LOOP_UNROLL_LIMIT`` lower to ``lax.scan`` — compiled once, any
    trip count. A data-dependent trip count or condition lowers to
    ``lax.while_loop`` (compiled once, looped on device) — including the
    hybrid case where a statically-started unroll discovers a traced
    ``cond_out`` mid-body. Scan outputs are impossible on the while path
    (their stacked length is unknowable at compile time) and raise
    NotImplementedError.

    Body graph inputs: (iter_num, cond_in, *carried); outputs:
    (cond_out, *carried_out, *scan_outputs). Scan outputs are stacked
    along a new leading axis.
    """
    body = ctx.attr("body")
    n_carried = len(v_initial)
    n_scan = ctx.num_outputs - n_carried
    body_inputs = [vi.name for vi in body.input]

    dynamic = (trip_count is not None and not _is_static(trip_count)) or (
        cond is not None and not _is_static(cond)
    )
    if dynamic:
        if n_scan > 0:
            raise NotImplementedError(
                "Loop with a data-dependent trip count/condition and scan "
                "outputs (their stacked shape is unknowable at compile time)"
            )
        cond0 = cond if cond is not None else np.bool_(True)
        return _loop_while(
            ctx, body, body_inputs, 0, cond0, list(v_initial), trip_count
        )

    if cond is not None and not bool(np.asarray(cond).reshape(-1)[0]):
        # Initially-false condition: zero iterations.
        if n_scan > 0:
            raise NotImplementedError(
                "Loop with zero iterations and scan outputs (their shapes "
                "are unknowable without running the body)"
            )
        return list(v_initial)
    m = (
        _static_int(trip_count, "Loop trip count")
        if trip_count is not None
        else None
    )
    if m is not None and m > _LOOP_UNROLL_LIMIT and _loop_is_for(body):
        if m >= 2**31 - 1:
            # A for-form body (cond passthrough) can never terminate early,
            # so an INT64_MAX-style trip count is an infinite loop — reject
            # it cleanly rather than materializing arange(2^63) in scan.
            raise NotImplementedError(
                f"Loop trip count {m} with a pass-through termination "
                f"condition is effectively infinite"
            )
        return _loop_scan(ctx, body, body_inputs, m, v_initial, n_carried)
    if m is not None and m > 256:
        raise NotImplementedError(
            f"Loop trip count {m} too large to unroll (and the body's "
            f"termination condition is not a plain for-loop passthrough)"
        )
    if m == 0:
        if n_scan > 0:
            raise NotImplementedError(
                "Loop with zero iterations and scan outputs (their shapes "
                "are unknowable without running the body)"
            )
        return list(v_initial)

    carried = list(v_initial)
    scan_outputs = None
    i = 0
    while m is None or i < m:
        if m is None and i >= 256:
            raise NotImplementedError(
                "Loop with no trip count ran >256 statically-true "
                "iterations at trace time (likely infinite)"
            )
        extra = dict(zip(body_inputs, [np.int64(i), np.bool_(True)] + carried))
        outs = _run_subgraph(ctx, body, extra)
        # Per the ONNX spec, iteration i's outputs are consumed even when
        # its cond_out is false (the break applies to iteration i+1).
        carried = list(outs[1:1 + n_carried])
        scans = outs[1 + n_carried:]
        if scan_outputs is None:
            scan_outputs = [[s] for s in scans]
        else:
            for dest, s in zip(scan_outputs, scans):
                dest.append(s)
        cond_out = outs[0]
        if not _is_static(cond_out):
            # Hybrid: the termination condition turned out data-dependent;
            # continue the remaining iterations on device.
            if n_scan > 0:
                raise NotImplementedError(
                    "Loop with a data-dependent termination condition and "
                    "scan outputs"
                )
            return _loop_while(
                ctx, body, body_inputs, i + 1, cond_out, carried, m
            )
        if not bool(np.asarray(cond_out).reshape(-1)[0]):
            break
        i += 1
    stacked = [
        jnp.stack([jnp.asarray(x) for x in parts]) for parts in (scan_outputs or [])
    ]
    return carried + stacked


@op("Scan")
def _scan(ctx, *inputs):
    """ONNX Scan lowered to ``jax.lax.scan`` — compiled once, looped on
    device (no unrolling, unlike Loop which must resolve a condition).

    Node inputs: N initial state values then M scan inputs; body graph
    inputs mirror that; body outputs: N state values then K scan outputs.
    """
    body = ctx.attr("body")
    m_scan = int(ctx.attr("num_scan_inputs"))
    n_state = len(inputs) - m_scan
    if n_state < 0:
        raise ValueError("Scan: num_scan_inputs exceeds provided inputs")
    in_axes = [int(a) for a in ctx.attr("scan_input_axes", [0] * m_scan)]
    out_axes_attr = ctx.attr("scan_output_axes")
    in_dirs = [int(d) for d in ctx.attr("scan_input_directions", [0] * m_scan)]
    out_dirs_attr = ctx.attr("scan_output_directions")

    state0 = [jnp.asarray(v) for v in inputs[:n_state]]
    xs = []
    for x, ax, d in zip(inputs[n_state:], in_axes, in_dirs):
        x = jnp.moveaxis(jnp.asarray(x), ax, 0)
        if d:  # reverse direction
            x = jnp.flip(x, 0)
        xs.append(x)

    body_input_names = [vi.name for vi in body.input]
    k_scan_out = len(body.output) - n_state

    def step(carry, x_slice):
        extra = dict(zip(body_input_names, list(carry) + list(x_slice)))
        outs = _run_subgraph(ctx, body, extra)
        new_carry = tuple(jnp.asarray(o) for o in outs[:n_state])
        scan_out = tuple(jnp.asarray(o) for o in outs[n_state:])
        return new_carry, scan_out

    final_state, stacked = jax.lax.scan(step, tuple(state0), tuple(xs))
    results = list(final_state)
    out_axes = [int(a) for a in (out_axes_attr or [0] * k_scan_out)]
    out_dirs = [int(d) for d in (out_dirs_attr or [0] * k_scan_out)]
    for y, ax, d in zip(stacked, out_axes, out_dirs):
        if d:
            y = jnp.flip(y, 0)
        results.append(jnp.moveaxis(y, 0, ax))
    return results


# ---------------------------------------------------------------------------
# recurrent ops (LSTM / GRU / RNN) — lax.scan device loops
#
# The input projection X·Wᵀ for ALL timesteps is hoisted out of the scan as
# one big MXU matmul; the scan body only does the [B,H]·[H,G·H] recurrence.
# ---------------------------------------------------------------------------


def _rnn_act(name, alpha=None, beta=None):
    name = name.decode() if isinstance(name, bytes) else str(name)
    if name == "Sigmoid":
        return jax.nn.sigmoid
    if name == "Tanh":
        return jnp.tanh
    if name == "Relu":
        return lambda v: jnp.maximum(v, 0.0)
    if name == "LeakyRelu":
        a = 0.01 if alpha is None else float(alpha)
        return lambda v: jnp.where(v >= 0, v, a * v)
    if name == "HardSigmoid":
        a = 0.2 if alpha is None else float(alpha)
        bb = 0.5 if beta is None else float(beta)
        return lambda v: jnp.clip(a * v + bb, 0.0, 1.0)
    if name == "Elu":
        a = 1.0 if alpha is None else float(alpha)
        return lambda v: jnp.where(v > 0, v, a * (jnp.exp(v) - 1.0))
    if name == "Softsign":
        return lambda v: v / (1.0 + jnp.abs(v))
    if name == "Softplus":
        return jax.nn.softplus
    if name == "Affine":
        a = 1.0 if alpha is None else float(alpha)
        bb = 0.0 if beta is None else float(beta)
        return lambda v: a * v + bb
    if name == "ScaledTanh":
        a = 1.0 if alpha is None else float(alpha)
        bb = 1.0 if beta is None else float(beta)
        return lambda v: a * jnp.tanh(bb * v)
    if name == "ThresholdedRelu":
        a = 1.0 if alpha is None else float(alpha)
        return lambda v: jnp.where(v > a, v, 0.0)
    raise NotImplementedError(f"RNN activation {name!r} not supported")


def _rnn_prepare(ctx, x, seq_lens, hidden):
    """Shared RNN-family plumbing. Returns
    (x [T,B,I], directions, seq_lens or None, init [dirs,B,H] fn, acts)."""
    x = jnp.asarray(x)
    if int(ctx.attr("layout", 0)) == 1:  # [B,T,I] → [T,B,I]
        x = jnp.swapaxes(x, 0, 1)
    direction = ctx.attr("direction", "forward")
    direction = (
        direction.decode() if isinstance(direction, bytes) else str(direction)
    )
    dirs = 2 if direction == "bidirectional" else 1
    if seq_lens is not None and direction != "forward":
        raise NotImplementedError(
            "sequence_lens with reverse/bidirectional RNNs"
        )
    alphas = ctx.attr("activation_alpha") or []
    betas = ctx.attr("activation_beta") or []
    names = ctx.attr("activations")

    def acts_for(d):
        if not names:
            return None
        per_dir = len(names) // dirs
        out = []
        for k in range(per_dir):
            i = d * per_dir + k
            out.append(
                _rnn_act(
                    names[i],
                    alphas[i] if i < len(alphas) else None,
                    betas[i] if i < len(betas) else None,
                )
            )
        return out

    b = x.shape[1]
    layout = int(ctx.attr("layout", 0))

    def init_state(v, d):
        if v is None:
            return jnp.zeros((b, hidden), x.dtype)
        v = jnp.asarray(v)
        # layout 0: [dirs, B, H]; layout 1: [B, dirs, H]
        return v[:, d, :] if layout == 1 else v[d]

    clip = ctx.attr("clip")
    pre = (
        (lambda g: jnp.clip(g, -float(clip), float(clip)))
        if clip is not None
        else (lambda g: g)
    )
    return x, direction, dirs, init_state, acts_for, pre


def _rnn_scan(xw, step_gates, h0, extra_carry, seq_lens):
    """Run the recurrence over the hoisted input projections ``xw``
    [T, B, G·H]. ``step_gates(xw_t, h, extra) -> (h_new, new_extra)``;
    masking freezes state and zeroes Y past each row's sequence length."""
    lens = None if seq_lens is None else jnp.asarray(seq_lens).reshape(-1)

    def step(carry, xw_t):
        t, h, ex = carry
        h_new, ex_new = step_gates(xw_t, h, ex)
        if lens is not None:
            mask = (t < lens)[:, None]
            h_new = jnp.where(mask, h_new, h)
            ex_new = tuple(
                jnp.where(mask, n, o) for n, o in zip(ex_new, ex)
            )
            y_t = jnp.where(mask, h_new, 0)
        else:
            y_t = h_new
        return (t + 1, h_new, ex_new), y_t

    (_, h_f, ex_f), ys = jax.lax.scan(
        step, (jnp.int32(0), h0, extra_carry), xw
    )
    return ys, h_f, ex_f


def _rnn_family(ctx, kind, x, w, r, b=None, seq_lens=None,
                initial_h=None, initial_c=None, p=None):
    n_gates = {"RNN": 1, "GRU": 3, "LSTM": 4}[kind]
    w = jnp.asarray(w)
    r = jnp.asarray(r)
    hidden = int(ctx.attr("hidden_size", r.shape[-1]))
    x, direction, dirs, init_state, acts_for, pre = _rnn_prepare(
        ctx, x, seq_lens, hidden
    )
    lbr = int(ctx.attr("linear_before_reset", 0))
    ys_all, hs, cs = [], [], []
    for d in range(dirs):
        rev = direction == "reverse" or d == 1
        x_d = jnp.flip(x, 0) if rev else x
        wd, rd = w[d], r[d]
        if b is not None:
            bd = jnp.asarray(b)[d]
            wb, rbias = bd[: n_gates * hidden], bd[n_gates * hidden:]
        else:
            wb = rbias = jnp.zeros(n_gates * hidden, x.dtype)
        acts = acts_for(d)
        h0 = init_state(initial_h, d)
        xw = jnp.einsum(
            "tbi,gi->tbg", x_d, wd, preferred_element_type=jnp.float32
        ).astype(x.dtype) + wb
        r_t = rd.T

        def split(g):
            return [
                g[:, k * hidden:(k + 1) * hidden] for k in range(n_gates)
            ]

        if kind == "LSTM":
            f_act, g_act, h_act = acts or (
                jax.nn.sigmoid, jnp.tanh, jnp.tanh
            )
            c0 = init_state(initial_c, d)
            if p is not None:
                # Peepholes: P[d] = [Pi, Po, Pf] (3*hidden), elementwise
                # against the cell state INSIDE the activation (and clip).
                pd = jnp.asarray(p)[d].astype(x.dtype)
                p_i, p_o, p_f = (
                    pd[:hidden], pd[hidden:2 * hidden], pd[2 * hidden:]
                )
            else:
                p_i = p_o = p_f = jnp.zeros(hidden, x.dtype)

            def lstm_gates(xw_t, h, ex):
                (c,) = ex
                gi, go, gf, gc = split(xw_t + h @ r_t + rbias)
                i_g = f_act(pre(gi + p_i * c))
                f_g = f_act(pre(gf + p_f * c))
                c_new = f_g * c + i_g * g_act(pre(gc))
                # Po couples against the NEW cell state (ONNX equations).
                o_g = f_act(pre(go + p_o * c_new))
                return o_g * h_act(c_new), (c_new,)

            ys, h_f, (c_f,) = _rnn_scan(xw, lstm_gates, h0, (c0,), seq_lens)
            cs.append(c_f)
        elif kind == "GRU":
            f_act, g_act = acts or (jax.nn.sigmoid, jnp.tanh)
            # The reset gate couples into the h-gate recurrence, so the
            # recurrent term is split per gate instead of one fused matmul.
            rz, rr, rh = (
                r_t[:, : hidden], r_t[:, hidden: 2 * hidden],
                r_t[:, 2 * hidden:],
            )
            rb_z, rb_r, rb_h = (
                rbias[: hidden], rbias[hidden: 2 * hidden],
                rbias[2 * hidden:],
            )

            def gru_gates(xw_t, h, ex):
                gz = f_act(pre(xw_t[:, : hidden] + h @ rz + rb_z))
                gr = f_act(pre(xw_t[:, hidden: 2 * hidden] + h @ rr + rb_r))
                if lbr:
                    gh = g_act(
                        pre(xw_t[:, 2 * hidden:] + gr * (h @ rh + rb_h))
                    )
                else:
                    gh = g_act(
                        pre(xw_t[:, 2 * hidden:] + (gr * h) @ rh + rb_h)
                    )
                return (1 - gz) * gh + gz * h, ()

            ys, h_f, _ = _rnn_scan(xw, gru_gates, h0, (), seq_lens)
        else:  # RNN
            (act,) = acts or (jnp.tanh,)

            def rnn_gates(xw_t, h, ex):
                return act(pre(xw_t + h @ r_t + rbias)), ()

            ys, h_f, _ = _rnn_scan(xw, rnn_gates, h0, (), seq_lens)
        if rev:
            ys = jnp.flip(ys, 0)
        ys_all.append(ys)
        hs.append(h_f)

    y = jnp.stack(ys_all, axis=1)          # [T, dirs, B, H]
    y_h = jnp.stack(hs, axis=0)            # [dirs, B, H]
    if int(ctx.attr("layout", 0)) == 1:
        y = jnp.transpose(y, (2, 0, 1, 3))  # [B, T, dirs, H]
        y_h = jnp.swapaxes(y_h, 0, 1)
    outs = [y, y_h]
    if kind == "LSTM":
        y_c = jnp.stack(cs, axis=0)
        if int(ctx.attr("layout", 0)) == 1:
            y_c = jnp.swapaxes(y_c, 0, 1)
        outs.append(y_c)
    return outs


@op("LSTM")
def _lstm(ctx, x, w, r, b=None, seq_lens=None, initial_h=None,
          initial_c=None, p=None):
    """ONNX LSTM (gate order i,o,f,c) via lax.scan, incl. peepholes (P)."""
    return _rnn_family(
        ctx, "LSTM", x, w, r, b, seq_lens, initial_h, initial_c, p
    )


@op("GRU")
def _gru(ctx, x, w, r, b=None, seq_lens=None, initial_h=None):
    """ONNX GRU (gate order z,r,h; both linear_before_reset modes)."""
    return _rnn_family(ctx, "GRU", x, w, r, b, seq_lens, initial_h)


@op("RNN")
def _rnn(ctx, x, w, r, b=None, seq_lens=None, initial_h=None):
    """ONNX vanilla RNN (single gate, default Tanh)."""
    return _rnn_family(ctx, "RNN", x, w, r, b, seq_lens, initial_h)


@op("HannWindow", "HammingWindow", "BlackmanWindow")
def _window(ctx, size):
    n = _static_int(size, f"{ctx.op_type} size")
    periodic = int(ctx.attr("periodic", 1))
    dtype = _ONNX_TO_NP[int(ctx.attr("output_datatype", 1))]
    denom = n if periodic else n - 1
    k = np.arange(n, dtype=np.float64)
    w = 2.0 * np.pi * k / denom
    if ctx.op_type == "HannWindow":
        out = 0.5 - 0.5 * np.cos(w)
    elif ctx.op_type == "HammingWindow":
        out = 25.0 / 46.0 - (21.0 / 46.0) * np.cos(w)
    else:  # BlackmanWindow
        out = 0.42 - 0.5 * np.cos(w) + 0.08 * np.cos(2.0 * w)
    return [np.asarray(out).astype(np.dtype(dtype))]


@op("MelWeightMatrix")
def _mel_weight_matrix(ctx, num_mel_bins, dft_length, sample_rate,
                       lower_edge_hertz, upper_edge_hertz):
    """Triangular mel filterbank per the ONNX spec (HTK mel scale)."""
    m = _static_int(num_mel_bins, "num_mel_bins")
    dft = _static_int(dft_length, "dft_length")
    sr = _static_int(sample_rate, "sample_rate")
    lo = float(np.asarray(lower_edge_hertz).reshape(-1)[0])
    hi = float(np.asarray(upper_edge_hertz).reshape(-1)[0])
    dtype = _ONNX_TO_NP[int(ctx.attr("output_datatype", 1))]
    from ._melbank import mel_weight_matrix

    return [mel_weight_matrix(m, dft, sr, lo, hi).astype(np.dtype(dtype))]


@op("STFT")
def _stft(ctx, signal, frame_step, window=None, frame_length=None):
    """Short-time Fourier transform (ONNX opset 17).

    ``signal``: [B, L] or [B, L, 1] real. Output: [B, frames, bins, 2]
    (real/imag), ``bins = frame_length//2 + 1`` when onesided.
    """
    x = jnp.asarray(signal)
    if x.ndim == 3:
        if x.shape[2] != 1:
            raise NotImplementedError("complex STFT input not supported")
        x = x[:, :, 0]
    step = _static_int(frame_step, "STFT frame_step")
    if frame_length is not None:
        flen = _static_int(frame_length, "STFT frame_length")
    elif window is not None:
        flen = int(jnp.shape(window)[0])  # shape is static even when traced
    else:
        raise ValueError("STFT needs frame_length or window")
    onesided = int(ctx.attr("onesided", 1))
    n_frames = (x.shape[1] - flen) // step + 1
    if n_frames <= 0:
        # Signal shorter than one frame: zero frames (matches the gather
        # path's behavior with an empty index array).
        bins = flen // 2 + 1 if onesided else flen
        return [jnp.zeros((x.shape[0], 0, bins, 2), dtype=x.dtype)]
    m = -(-flen // step)
    if m <= 32:
        # Polyphase framing: reshape to [B, rows, step] and concatenate m
        # row-shifted slices — frame i is x[i*step : i*step+flen]. Avoids
        # the [n_frames, flen] gather (523k indices for BirdNET-sized
        # frontends), which lowers terribly on TPU.
        rows = n_frames + m - 1
        need = rows * step
        if need > x.shape[1]:
            x = jnp.pad(x, ((0, 0), (0, need - x.shape[1])))
        r = x[:, :need].reshape(x.shape[0], rows, step)
        parts = [
            lax.slice_in_dim(r, k, k + n_frames, axis=1) for k in range(m)
        ]
        frames = jnp.concatenate(parts, axis=2)[:, :, :flen]
    else:
        idx = np.arange(n_frames)[:, None] * step + np.arange(flen)[None, :]
        frames = x[:, idx]  # [B, frames, flen]
    if window is not None:
        win = jnp.asarray(window).astype(frames.dtype)
        if win.shape[0] < flen:
            # Spec: windows shorter than frame_length are zero-padded.
            win = jnp.pad(win, (0, flen - win.shape[0]))
        frames = frames * win
    if flen <= 4096:
        # DFT as an MXU matmul: XLA's TPU FFT measures ~90 us/segment at
        # BirdNET frame sizes (flen 1024, 511 frames) — 9x slower than the
        # dense [T, flen] @ [flen, 2*bins] product, despite the FLOP
        # asymptotics. Precision: bf16 operands ONLY under fast/bf16;
        # 'mixed' deliberately keeps true-f32 passes here (unlike the
        # package-wide matmul policy) because spectra are
        # cancellation-prone — see the branch comments below.
        bins = flen // 2 + 1 if onesided else flen
        ang = (-2.0 * np.pi / flen) * np.outer(
            np.arange(flen), np.arange(bins)
        )
        basis = np.concatenate(
            [np.cos(ang), np.sin(ang)], axis=1
        ).astype(np.float32)  # [flen, 2*bins]
        if ctx.precision in ("fast", "bf16"):
            # bf16 operands: spectra are cancellation-prone, so only the
            # explicitly-reduced policies trade precision here.
            f2, b2 = frames.astype(jnp.bfloat16), jnp.asarray(basis).astype(jnp.bfloat16)
            out = jnp.matmul(f2, b2, preferred_element_type=jnp.float32)
        else:
            # fp32/mixed keep true-f32 DFT passes (bf16 single-pass shows
            # ~0.3 log-space error on near-cancelling bins — see
            # ops/pallas/frontend.py measurement notes).
            out = jnp.matmul(
                frames.astype(jnp.float32), jnp.asarray(basis),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        spec_r = out[..., :bins]
        spec_i = out[..., bins:]
        return [jnp.stack([spec_r, spec_i], axis=-1).astype(x.dtype)]
    if onesided:
        spec = jnp.fft.rfft(frames, axis=-1)
    else:
        spec = jnp.fft.fft(frames, axis=-1)
    return [jnp.stack([spec.real, spec.imag], axis=-1).astype(x.dtype)]


@op("DepthToSpace")
def _depth_to_space(ctx, x):
    x = jnp.asarray(x)
    bs = int(ctx.attr("blocksize"))
    mode = ctx.attr("mode", "DCR")
    n, c, h, w = x.shape
    if mode == "DCR":
        y = x.reshape(n, bs, bs, c // (bs * bs), h, w)
        y = y.transpose(0, 3, 4, 1, 5, 2)
    else:
        y = x.reshape(n, c // (bs * bs), bs, bs, h, w)
        y = y.transpose(0, 1, 4, 2, 5, 3)
    return [y.reshape(n, c // (bs * bs), h * bs, w * bs)]


@op("SpaceToDepth")
def _space_to_depth(ctx, x):
    x = jnp.asarray(x)
    bs = int(ctx.attr("blocksize"))
    n, c, h, w = x.shape
    y = x.reshape(n, c, h // bs, bs, w // bs, bs)
    y = y.transpose(0, 3, 5, 1, 2, 4)
    return [y.reshape(n, c * bs * bs, h // bs, w // bs)]


# ---------------------------------------------------------------------------
# bitwise / sequence / norm extensions
# ---------------------------------------------------------------------------

op("BitwiseNot")(_unary(jnp.bitwise_not))
op("BitwiseXor")(_binary(jnp.bitwise_xor))


@op("BitShift")
def _bitshift(ctx, x, y):
    direction = ctx.attr("direction")
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if direction == "LEFT":
        return [jnp.left_shift(x, y)]
    if direction == "RIGHT":
        return [jnp.right_shift(x, y)]
    raise ValueError(f"BitShift direction must be LEFT or RIGHT, got {direction!r}")


@op("Hardmax")
def _hardmax(ctx, x):
    # One-hot of the FIRST maximum along the axis (argmax tie rule).
    x = jnp.asarray(x)
    if ctx.opset >= 13:
        axis = int(ctx.attr("axis", -1))
        if axis < 0:
            axis += x.ndim
        idx = jnp.argmax(x, axis=axis)
        return [jax.nn.one_hot(idx, x.shape[axis], axis=axis, dtype=x.dtype)]
    # opset < 13: coerce to 2D from axis (like legacy Softmax), one-hot over
    # the flattened tail, reshape back.
    axis = int(ctx.attr("axis", 1))
    if axis < 0:
        axis += x.ndim
    shape = x.shape
    lead = int(np.prod(shape[:axis])) if axis > 0 else 1
    flat = x.reshape(lead, -1)
    idx = jnp.argmax(flat, axis=1)
    return [jax.nn.one_hot(idx, flat.shape[1], dtype=x.dtype).reshape(shape)]


@op("LpNormalization")
def _lp_normalization(ctx, x):
    x = jnp.asarray(x)
    axis = int(ctx.attr("axis", -1))
    p = int(ctx.attr("p", 2))
    if p == 1:
        norm = jnp.sum(jnp.abs(x), axis=axis, keepdims=True)
    elif p == 2:
        norm = jnp.sqrt(jnp.sum(x * x, axis=axis, keepdims=True))
    else:
        raise NotImplementedError("LpNormalization requires p in {1, 2}")
    return [x / norm]


@op("LpPool")
def _lppool(ctx, x):
    x = jnp.asarray(x)
    window, strides, dil, pads, _ = _pool_common(ctx, x)
    p = int(ctx.attr("p", 2))
    xp = x * x if p == 2 else jnp.power(jnp.abs(x), float(p))
    s = lax.reduce_window(
        xp, jnp.asarray(0, x.dtype), lax.add, window, strides, pads,
        window_dilation=dil,
    )
    return [jnp.sqrt(s) if p == 2 else jnp.power(s, 1.0 / p)]


@op("GlobalLpPool")
def _global_lppool(ctx, x):
    x = jnp.asarray(x)
    p = int(ctx.attr("p", 2))
    axes = tuple(range(2, x.ndim))
    xp = x * x if p == 2 else jnp.power(jnp.abs(x), float(p))
    s = jnp.sum(xp, axis=axes, keepdims=True)
    return [jnp.sqrt(s) if p == 2 else jnp.power(s, 1.0 / p)]


@op("ReverseSequence")
def _reverse_sequence(ctx, x, seq_lens):
    # Reverse the first seq_lens[b] elements along time_axis for each batch
    # row; elements past the length pass through unchanged. sequence_lens is
    # runtime data, so indices are computed with traced jnp ops.
    x = jnp.asarray(x)
    batch_axis = int(ctx.attr("batch_axis", 1))
    time_axis = int(ctx.attr("time_axis", 0))
    lens = jnp.asarray(seq_lens).astype(jnp.int32)
    t = jnp.arange(x.shape[time_axis], dtype=jnp.int32)
    src = jnp.where(
        t[None, :] < lens[:, None], lens[:, None] - 1 - t[None, :], t[None, :]
    )  # [batch, time]
    xb = jnp.moveaxis(x, (batch_axis, time_axis), (0, 1))
    idx = src.reshape(src.shape + (1,) * (xb.ndim - 2))
    yb = jnp.take_along_axis(xb, idx, axis=1)
    return [jnp.moveaxis(yb, (0, 1), (batch_axis, time_axis))]


@op("DFT")
def _dft(ctx, x, dft_length=None, axis=None):
    """ONNX DFT (opset 17 attribute-axis form and opset 20 input-axis form).

    Input: [batch, d1, ..., dn, c] with c=1 (real) or c=2 (real/imag).
    Output: same rank, last dim 2. ``onesided`` halves the transformed axis
    to ``n//2 + 1`` (real input only, forward only).
    """
    x = jnp.asarray(x)
    inverse = int(ctx.attr("inverse", 0))
    onesided = int(ctx.attr("onesided", 0))
    if axis is not None:
        ax = _static_int(axis, "DFT axis")
    elif ctx.opset >= 20:
        ax = -2
    else:
        ax = int(ctx.attr("axis", 1))
    if ax < 0:
        ax += x.ndim
    if ax == x.ndim - 1:
        raise ValueError("DFT axis cannot be the component (last) dimension")
    comp = x.shape[-1]
    if comp not in (1, 2):
        raise ValueError(f"DFT input last dim must be 1 or 2, got {comp}")
    n = (
        _static_int(dft_length, "DFT dft_length")
        if dft_length is not None
        else x.shape[ax]
    )
    out_dtype = x.dtype if jnp.issubdtype(x.dtype, jnp.floating) else jnp.float32
    if onesided:
        if inverse:
            raise ValueError("DFT onesided=1 with inverse=1 is invalid")
        if comp == 2:
            raise NotImplementedError("DFT onesided=1 requires real input")
        spec = jnp.fft.rfft(x[..., 0].astype(jnp.float32), n=n, axis=ax)
    else:
        sig = (
            x[..., 0].astype(jnp.float32)
            if comp == 1
            else lax.complex(x[..., 0].astype(jnp.float32), x[..., 1].astype(jnp.float32))
        )
        fft = jnp.fft.ifft if inverse else jnp.fft.fft
        spec = fft(sig, n=n, axis=ax)
    return [jnp.stack([spec.real, spec.imag], axis=-1).astype(out_dtype)]


# ---------------------------------------------------------------------------
# attention family (opset 23)
# ---------------------------------------------------------------------------


@op("Attention")
def _attention(ctx, q, k, v, attn_mask=None, past_key=None, past_value=None):
    """ONNX Attention (opset 23): scaled dot-product attention with optional
    mask, causality, GQA, KV cache, and softcap.

    Q/K/V are 4D [B, heads, seq, head] or 3D [B, seq, heads*head] (the 3D
    form requires the q_num_heads/kv_num_heads attributes). Computation
    order per the ONNX reference: QK*scale → (+ causal/mask bias) →
    softcap → softmax; qk_matmul_output_mode 0-3 taps the chain after each
    step. present_key/present_value are the post-cache-concat K/V (before
    any GQA head repetition).
    """
    q = jnp.asarray(q)
    k = jnp.asarray(k)
    v = jnp.asarray(v)
    three_d = q.ndim == 3
    if three_d:
        qh = ctx.attr("q_num_heads")
        kvh = ctx.attr("kv_num_heads")
        if qh is None or kvh is None:
            raise ValueError(
                "Attention with 3D inputs requires q_num_heads/kv_num_heads"
            )
        qh, kvh = int(qh), int(kvh)
        b, qs = q.shape[0], q.shape[1]
        q = q.reshape(b, qs, qh, q.shape[2] // qh).transpose(0, 2, 1, 3)
        k = k.reshape(b, k.shape[1], kvh, k.shape[2] // kvh).transpose(0, 2, 1, 3)
        v = v.reshape(b, v.shape[1], kvh, v.shape[2] // kvh).transpose(0, 2, 1, 3)
    if past_key is not None:
        k = jnp.concatenate([jnp.asarray(past_key).astype(k.dtype), k], axis=2)
    if past_value is not None:
        v = jnp.concatenate([jnp.asarray(past_value).astype(v.dtype), v], axis=2)
    present_k, present_v = k, v
    n_q_heads, n_kv_heads = q.shape[1], k.shape[1]
    if n_q_heads != n_kv_heads:
        if n_q_heads % n_kv_heads:
            raise ValueError(
                f"Attention GQA requires q heads ({n_q_heads}) to be a "
                f"multiple of kv heads ({n_kv_heads})"
            )
        rep = n_q_heads // n_kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)

    scale = ctx.attr("scale")
    scale = float(scale) if scale is not None else 1.0 / math.sqrt(q.shape[-1])
    softcap = float(ctx.attr("softcap", 0.0))
    qk_mode = int(ctx.attr("qk_matmul_output_mode", 0))

    orig = q.dtype
    q2, k2 = _mxu_operands(ctx, q, k)
    scores = (
        jnp.matmul(q2, jnp.swapaxes(k2, -1, -2), preferred_element_type=_acc_dtype(ctx))
        * scale
    )
    qk_out = scores
    bias = None
    if int(ctx.attr("is_causal", 0)):
        # Upper-left alignment: query row i may attend key columns j <= i.
        qs, ts = q.shape[2], k.shape[2]
        tri = np.tril(np.ones((qs, ts), dtype=bool))
        bias = jnp.where(tri, 0.0, -jnp.inf).astype(scores.dtype)
    if attn_mask is not None:
        m = jnp.asarray(attn_mask)
        m = (
            jnp.where(m, 0.0, -jnp.inf).astype(scores.dtype)
            if m.dtype == jnp.bool_
            else m.astype(scores.dtype)
        )
        bias = m if bias is None else bias + m
    if bias is not None:
        scores = scores + bias
        if qk_mode == 1:
            qk_out = scores
    if softcap > 0.0:
        scores = softcap * jnp.tanh(scores / softcap)
        if qk_mode == 2:
            qk_out = scores
    sp = ctx.attr("softmax_precision")
    sm_dtype = _ONNX_TO_NP[int(sp)] if sp is not None else np.float32
    probs = jax.nn.softmax(scores.astype(sm_dtype), axis=-1)
    if qk_mode == 3:
        qk_out = probs
    p2, v2 = _mxu_operands(ctx, probs.astype(orig), v)
    y = jnp.matmul(p2, v2, preferred_element_type=_acc_dtype(ctx))
    y = _out_cast(ctx, y, orig)
    if three_d:
        b, h, s, d = y.shape
        y = y.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    outs = [y]
    if ctx.num_outputs > 1:
        outs.append(present_k)
    if ctx.num_outputs > 2:
        outs.append(present_v)
    if ctx.num_outputs > 3:
        outs.append(_out_cast(ctx, qk_out, orig))
    return outs


@op("RotaryEmbedding")
def _rotary_embedding(ctx, x, cos_cache, sin_cache, position_ids=None):
    """ONNX RotaryEmbedding (opset 23).

    X: [B, heads, seq, head] (4D) or [B, seq, hidden] (3D, needs the
    num_heads attribute). Caches are [max_pos, rotary_dim/2] when
    position_ids is given, else [B, seq, rotary_dim/2]. The first
    rotary_dim components of each head are rotated; the tail passes
    through.
    """
    x = jnp.asarray(x)
    three_d = x.ndim == 3
    if three_d:
        nh = ctx.attr("num_heads")
        if nh is None:
            raise ValueError("RotaryEmbedding with 3D input requires num_heads")
        nh = int(nh)
        b, s, hidden = x.shape
        x = x.reshape(b, s, nh, hidden // nh).transpose(0, 2, 1, 3)
    cos = jnp.asarray(cos_cache)
    sin = jnp.asarray(sin_cache)
    if position_ids is not None:
        pos = jnp.asarray(position_ids)  # [B, S]
        cos = cos[pos]  # [B, S, rd/2]
        sin = sin[pos]
    # → broadcast over heads: [B, 1, S, rd/2]
    cos = cos[:, None, :, :].astype(x.dtype)
    sin = sin[:, None, :, :].astype(x.dtype)
    head = x.shape[-1]
    rd = int(ctx.attr("rotary_embedding_dim", 0)) or 2 * cos.shape[-1]
    rot, tail = x[..., :rd], x[..., rd:]
    if int(ctx.attr("interleaved", 0)):
        x1, x2 = rot[..., 0::2], rot[..., 1::2]
    else:
        x1, x2 = rot[..., : rd // 2], rot[..., rd // 2:]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    if int(ctx.attr("interleaved", 0)):
        rot_out = jnp.stack([r1, r2], axis=-1).reshape(rot.shape)
    else:
        rot_out = jnp.concatenate([r1, r2], axis=-1)
    y = jnp.concatenate([rot_out, tail], axis=-1) if rd < head else rot_out
    if three_d:
        b, h, s, d = y.shape
        y = y.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    return [y]


# Long-tail core-domain operators (sequences, optionals, random, spatial
# sampling, losses, trace-time dynamic-shape ops) register themselves on
# import; keep this at module tail so they can import helpers from here.
from . import ops_extended  # noqa: E402,F401  (registration side effect)
from . import ops_contrib  # noqa: E402,F401  (com.microsoft contrib ops)
from . import ops_ml  # noqa: E402,F401  (ai.onnx.ml classical-ML domain)
