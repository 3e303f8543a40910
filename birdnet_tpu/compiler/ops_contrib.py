"""ONNX Runtime contrib-op lowerings (the ``com.microsoft`` domain).

Real-world model files frequently carry these: onnxruntime's *offline*
graph optimizer (``optimized_model_filepath`` / ``ORT_ENABLE_ALL``) rewrites
plain ONNX into fused contrib nodes and users save + ship the result. The
reference consumes such files transparently because its engine IS
onnxruntime (reference: src/classifier.rs:348-350 — ``commit_from_file``
accepts anything the ORT graph loader takes). This module gives the
birdnet_tpu importer the same reach for the contrib ops that appear in
CNN/audio/transformer inference graphs.

Dispatch: ``ops.get_lowering(op_type, domain)`` tries the contrib registry
first for non-default domains; for ``com.microsoft`` only, an explicit
allowlist of ops that later graduated into the core opset with identical
signatures (Gelu, LayerNormalization, Trilu, Range, GridSample) falls back
to the core table. Everything else — including name collisions with
different contracts (``Attention``, ``Unique``) and arbitrary vendor
domains — either has an explicit lowering here or fails at load time with
the domain-qualified name.

Everything lowers to the same XLA-friendly primitives as the core table:
matmuls/convs ride the MXU via the shared precision policy, the QLinear*
family reuses the exact int8-MXU accumulators from ops.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .ops import (  # noqa: F401 - shared helpers
    OpContext,
    _REGISTRY,
    _acc_dtype,
    _bcast_channel,
    _int_matmul_acc,
    _mxu_operands,
    _out_cast,
    _requantize,
    _static_ints,
    contrib_op,
    op,
)

_MS = "com.microsoft"


def ms_op(*names):
    return contrib_op(_MS, *names)


# ---------------------------------------------------------------------------
# fused activation epilogues (FusedConv / FusedGemm)
# ---------------------------------------------------------------------------


def _fused_activation(ctx, y):
    """Apply the ORT fusion epilogue named by the ``activation`` attribute.

    Parameter spelling differs across contrib schemas: FusedConv packs them
    into ``activation_params`` (floats, in op-specific order) while FusedGemm
    uses ``activation_alpha``/``activation_beta``/``activation_gamma``.
    Both are honored.
    """
    act = ctx.attr("activation", "")
    if not act:
        return y
    params = [float(p) for p in ctx.attr("activation_params", [])]

    def p(i, default, named):
        if i < len(params):
            return params[i]
        v = ctx.attr(named)
        return default if v is None else float(v)

    if act == "Relu":
        return jnp.maximum(y, 0.0)
    if act == "Sigmoid":
        return jax.nn.sigmoid(y)
    if act == "Tanh":
        return jnp.tanh(y)
    if act == "LeakyRelu":
        alpha = p(0, 0.01, "activation_alpha")
        return jnp.where(y >= 0, y, alpha * y)
    if act == "Clip":
        lo = p(0, float(np.finfo(np.float32).min), "activation_alpha")
        hi = p(1, float(np.finfo(np.float32).max), "activation_beta")
        return jnp.clip(y, lo, hi)
    if act == "HardSigmoid":
        alpha = p(0, 0.2, "activation_alpha")
        beta = p(1, 0.5, "activation_beta")
        return jnp.clip(alpha * y + beta, 0.0, 1.0)
    raise NotImplementedError(
        f"{ctx.op_type}: fused activation '{act}' is not supported"
    )


@ms_op("FusedConv")
def _fused_conv(ctx, x, w, b=None, z=None):
    """Conv + optional residual add (Z) + fused activation epilogue."""
    y = _REGISTRY["Conv"](ctx, x, w, b)[0]
    if z is not None:
        y = y + jnp.asarray(z).astype(y.dtype)
    return [_fused_activation(ctx, y).astype(y.dtype)]


@ms_op("FusedGemm")
def _fused_gemm(ctx, a, b, c=None):
    y = _REGISTRY["Gemm"](ctx, a, b, c)[0]
    return [_fused_activation(ctx, y).astype(y.dtype)]


@ms_op("FusedMatMul", "TransposeMatMul")
def _fused_matmul(ctx, a, b):
    """MatMul with pre-folded transposes and a scalar alpha (ORT folds
    Transpose/Mul neighbors into this node). ``transA/transB`` swap the
    last two axes; batch-dim transposes (transBatchA/B) never appear in
    the graphs this framework targets."""
    if int(ctx.attr("transBatchA", 0)) or int(ctx.attr("transBatchB", 0)):
        raise NotImplementedError("FusedMatMul: transBatchA/transBatchB")
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    if int(ctx.attr("transA", 0)):
        a = jnp.swapaxes(a, -1, -2)
    if int(ctx.attr("transB", 0)):
        b = jnp.swapaxes(b, -1, -2)
    orig = a.dtype
    a2, b2 = _mxu_operands(ctx, a, b)
    y = jnp.matmul(a2, b2, preferred_element_type=_acc_dtype(ctx))
    y = _out_cast(ctx, y, orig)
    alpha = float(ctx.attr("alpha", 1.0))
    if alpha != 1.0:
        y = (alpha * y).astype(y.dtype)
    return [y]


# ---------------------------------------------------------------------------
# Gelu family
# ---------------------------------------------------------------------------


@ms_op("FastGelu")
def _fast_gelu(ctx, x, bias=None):
    x = jnp.asarray(x)
    if bias is not None:
        x = x + jnp.asarray(bias).astype(x.dtype)
    return [jax.nn.gelu(x, approximate=True).astype(x.dtype)]


@ms_op("BiasGelu")
def _bias_gelu(ctx, x, bias):
    x = jnp.asarray(x)
    x = x + jnp.asarray(bias).astype(x.dtype)
    return [jax.nn.gelu(x, approximate=False).astype(x.dtype)]


@ms_op("QuickGelu")
def _quick_gelu(ctx, x):
    x = jnp.asarray(x)
    alpha = float(ctx.attr("alpha", 1.702))
    return [(x * jax.nn.sigmoid(alpha * x)).astype(x.dtype)]


@ms_op("GemmFastGelu")
def _gemm_fast_gelu(ctx, x, w, bias=None):
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    orig = x.dtype
    x2, w2 = _mxu_operands(ctx, x, w)
    y = jnp.matmul(x2, w2, preferred_element_type=_acc_dtype(ctx))
    y = _out_cast(ctx, y, orig)
    if bias is not None:
        y = y + jnp.asarray(bias).astype(y.dtype)
    return [jax.nn.gelu(y, approximate=True).astype(y.dtype)]


# ---------------------------------------------------------------------------
# bias + skip fusions
# ---------------------------------------------------------------------------


@ms_op("BiasAdd")
def _bias_add(ctx, x, bias, skip):
    x = jnp.asarray(x)
    return [
        x
        + jnp.asarray(bias).astype(x.dtype)
        + jnp.asarray(skip).astype(x.dtype)
    ]


@ms_op("BiasSoftmax")
def _bias_softmax(ctx, x, bias):
    """softmax(x + bias) with the contrib op's coerce-to-2D semantics:
    softmax runs over ALL dims >= axis (default 1), like pre-opset-13
    Softmax. ``is_inner_broadcast=1`` means the bias spans the leading
    dims and broadcasts along the inner (softmax) dims — trailing size-1
    axes are appended; =0 is standard trailing-aligned broadcasting."""
    x = jnp.asarray(x)
    bias = jnp.asarray(bias).astype(x.dtype)
    axis = int(ctx.attr("axis", 1))
    if axis < 0:
        axis += x.ndim
    if int(ctx.attr("is_inner_broadcast", 0)):
        bias = bias.reshape(bias.shape + (1,) * (x.ndim - bias.ndim))
    s = x + bias
    flat = s.reshape(s.shape[:axis] + (-1,))
    return [jax.nn.softmax(flat, axis=-1).reshape(s.shape)]


def _ln_stats(s, eps):
    mean = jnp.mean(s, axis=-1, keepdims=True)
    var = jnp.var(s, axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps)
    return mean, inv


def _skip_ln_sum(x, skip, bias):
    s = jnp.asarray(x)
    s = s + jnp.asarray(skip).astype(s.dtype)
    if bias is not None:
        s = s + jnp.asarray(bias).astype(s.dtype)
    return s


@ms_op("SkipLayerNormalization")
def _skip_layer_norm(ctx, x, skip, gamma, beta=None, bias=None):
    """LayerNorm(input + skip + bias) over the last axis. Optional outputs
    (positional): mean, inv_std_var, and the pre-norm sum at index 3."""
    eps = float(ctx.attr("epsilon", 1e-5))
    s = _skip_ln_sum(x, skip, bias)
    mean, inv = _ln_stats(s.astype(jnp.float32), eps)
    y = ((s.astype(jnp.float32) - mean) * inv).astype(s.dtype) * jnp.asarray(
        gamma
    ).astype(s.dtype)
    if beta is not None:
        y = y + jnp.asarray(beta).astype(s.dtype)
    outs = [y]
    if ctx.num_outputs > 1:
        outs.append(mean)
    if ctx.num_outputs > 2:
        outs.append(inv)
    if ctx.num_outputs > 3:
        outs.append(s)
    return outs


@ms_op("SkipSimplifiedLayerNormalization")
def _skip_simplified_layer_norm(ctx, x, skip, gamma, bias=None):
    """RMS-norm variant: (input + skip + bias) * rsqrt(mean(sum²)+eps) * gamma."""
    eps = float(ctx.attr("epsilon", 1e-5))
    s = _skip_ln_sum(x, skip, bias)
    sf = s.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(sf * sf, axis=-1, keepdims=True) + eps)
    y = (sf * inv).astype(s.dtype) * jnp.asarray(gamma).astype(s.dtype)
    outs = [y]
    if ctx.num_outputs > 1:
        outs.append(jnp.zeros_like(inv))  # "mean" slot: unused by the RMS form
    if ctx.num_outputs > 2:
        outs.append(inv)
    if ctx.num_outputs > 3:
        outs.append(s)
    return outs


@op("SimplifiedLayerNormalization")
def _simplified_layer_norm(ctx, x, scale):
    """RMS norm as emitted by onnxruntime's optimizer — registered in the
    CORE table because ORT emits it with an empty domain despite it never
    being a standard op (the standard spelling, RMSNormalization, arrived
    in opset 23). Inputs (X, scale); attrs axis/epsilon; optional second
    output inv_std_var."""
    axis = int(ctx.attr("axis", -1))
    eps = float(ctx.attr("epsilon", 1e-5))
    x = jnp.asarray(x)
    if axis < 0:
        axis += x.ndim
    axes = tuple(range(axis, x.ndim))
    xf = x.astype(jnp.float32)
    inv = jax.lax.rsqrt(jnp.mean(xf * xf, axis=axes, keepdims=True) + eps)
    y = (xf * inv).astype(x.dtype) * jnp.asarray(scale).astype(x.dtype)
    outs = [y]
    if ctx.num_outputs > 1:
        outs.append(inv)
    return outs


# ---------------------------------------------------------------------------
# NHWC conv (ORT layout-transformer output)
# ---------------------------------------------------------------------------


@ms_op("NhwcConv")
def _nhwc_conv(ctx, x, w, b=None):
    """Conv with channels-last input [N,H,W,C] and pre-transposed weight
    [M, kH, kW, C/group] (the layout transformer folds the weight transpose
    at save time). Lowered by transposing around the core Conv — XLA's
    layout assignment erases the transposes on TPU."""
    x = jnp.asarray(x)
    w = jnp.asarray(w)
    x_cf = jnp.moveaxis(x, -1, 1)
    w_cf = jnp.moveaxis(w, -1, 1)
    y = _REGISTRY["Conv"](ctx, x_cf, w_cf, b)[0]
    return [jnp.moveaxis(y, 1, -1)]


# ---------------------------------------------------------------------------
# QLinear* elementwise/pool family (int8 end-to-end graphs)
# ---------------------------------------------------------------------------


def _dq(x, scale, zp):
    xf = jnp.asarray(x).astype(jnp.float32)
    if zp is not None:
        xf = xf - jnp.asarray(zp).astype(jnp.float32)
    return xf * jnp.asarray(scale).astype(jnp.float32)


def _default_zp(y_zp, like):
    """ORT contrib QLinear* default when the output zero point is omitted:
    zp = 0 with the output dtype following the INPUT dtype (ops.py's
    ``_requantize`` would otherwise default to uint8, flipping int8
    graphs' signedness)."""
    if y_zp is not None:
        return y_zp
    # dtype only — ``like`` may be a tracer, so no value conversion here
    return np.zeros((), dtype=np.dtype(jnp.asarray(like).dtype))


@ms_op("QLinearAdd")
def _qlinear_add(ctx, a, a_s, a_zp, b, b_s, b_zp, c_s, c_zp=None):
    return [_requantize(ctx, _dq(a, a_s, a_zp) + _dq(b, b_s, b_zp), c_s,
                        _default_zp(c_zp, a))]


@ms_op("QLinearMul")
def _qlinear_mul(ctx, a, a_s, a_zp, b, b_s, b_zp, c_s, c_zp=None):
    return [_requantize(ctx, _dq(a, a_s, a_zp) * _dq(b, b_s, b_zp), c_s,
                        _default_zp(c_zp, a))]


@ms_op("QLinearSigmoid")
def _qlinear_sigmoid(ctx, x, x_s, x_zp, y_s, y_zp=None):
    return [_requantize(ctx, jax.nn.sigmoid(_dq(x, x_s, x_zp)), y_s,
                        _default_zp(y_zp, x))]


@ms_op("QLinearLeakyRelu")
def _qlinear_leaky_relu(ctx, x, x_s, x_zp, y_s, y_zp=None):
    alpha = float(ctx.attr("alpha", 0.01))
    xf = _dq(x, x_s, x_zp)
    return [_requantize(ctx, jnp.where(xf >= 0, xf, alpha * xf), y_s,
                        _default_zp(y_zp, x))]


def _maybe_channels_last(ctx, xf):
    if int(ctx.attr("channels_last", 0)):
        return jnp.moveaxis(xf, -1, 1), True
    return xf, False


@ms_op("QLinearAveragePool")
def _qlinear_average_pool(ctx, x, x_s, x_zp, y_s, y_zp=None):
    xf = _dq(x, x_s, x_zp)
    xf, was_cl = _maybe_channels_last(ctx, xf)
    y = _REGISTRY["AveragePool"](ctx, xf)[0]
    if was_cl:
        y = jnp.moveaxis(y, 1, -1)
    return [_requantize(ctx, y, y_s, _default_zp(y_zp, x))]


@ms_op("QLinearGlobalAveragePool")
def _qlinear_global_average_pool(ctx, x, x_s, x_zp, y_s, y_zp=None):
    xf = _dq(x, x_s, x_zp)
    xf, was_cl = _maybe_channels_last(ctx, xf)
    y = jnp.mean(xf, axis=tuple(range(2, xf.ndim)), keepdims=True)
    if was_cl:
        y = jnp.moveaxis(y, 1, -1)
    return [_requantize(ctx, y, y_s, _default_zp(y_zp, x))]


@ms_op("QLinearConcat")
def _qlinear_concat(ctx, y_s, y_zp, *parts):
    if len(parts) % 3:
        raise NotImplementedError(
            "QLinearConcat expects (tensor, scale, zero_point) triples"
        )
    axis = int(ctx.attr("axis"))
    xs = [
        _dq(parts[i], parts[i + 1], parts[i + 2])
        for i in range(0, len(parts), 3)
    ]
    return [_requantize(ctx, jnp.concatenate(xs, axis=axis), y_s, y_zp)]


@ms_op("MatMulIntegerToFloat")
def _matmul_integer_to_float(ctx, a, b, a_s, b_s, a_zp=None, b_zp=None,
                             bias=None):
    acc = _int_matmul_acc(jnp.asarray(a), jnp.asarray(b), a_zp, b_zp)
    a_scale = jnp.asarray(a_s).astype(jnp.float32)
    if a_scale.ndim == 1 and a_scale.shape[0] > 1:
        a_scale = a_scale[:, None]  # per-ROW a scale: broadcast along rows
    b_scale = jnp.asarray(b_s).astype(jnp.float32)
    # 1-D b scale broadcasts along the output's column axis
    y = acc.astype(jnp.float32) * (a_scale * b_scale)
    if bias is not None:
        y = y + jnp.asarray(bias).astype(jnp.float32)
    return [y]


@ms_op("DynamicQuantizeMatMul")
def _dynamic_quantize_matmul(ctx, a, b, b_s, b_zp=None, bias=None):
    a_q, a_s, a_zp = _REGISTRY["DynamicQuantizeLinear"](ctx, a)
    acc = _int_matmul_acc(a_q, jnp.asarray(b), a_zp, b_zp)
    scale = a_s * jnp.asarray(b_s).astype(jnp.float32)
    y = acc.astype(jnp.float32) * scale
    if bias is not None:
        y = y + jnp.asarray(bias).astype(jnp.float32)
    return [y]


# ---------------------------------------------------------------------------
# Attention (com.microsoft) — packed-QKV self-attention, pre-dating the
# opset-23 core Attention (whose signature differs; explicit registration
# here keeps the core fallback from mis-dispatching this name).
# ---------------------------------------------------------------------------


@ms_op("Attention")
def _ms_attention(ctx, x, weights, bias=None, mask_index=None, past=None,
                  attention_bias=None, past_sequence_length=None):
    """Self-attention over input [B,S,H_in] with packed QKV projection
    weights [H_in, q+k+v] (qkv_hidden_sizes attr when unequal; no output
    projection — ORT keeps that as a separate MatMul). Supported mask
    forms: [B] right-padding lengths, [B,S] raw key masks, [B,S,S]
    per-query masks, and [B,1,M,M] per-query masks (sliced to the live
    S×S window); 1 = attend, masked logits get ``mask_filter_value``
    added, matching onnxruntime. The packed 1-D (2B,)/(3B+2,) begin/end
    forms raise. KV cache (``past``) and rotary embedding (``do_rotary``)
    never appear in the one-shot inference graphs this framework
    targets and raise explicitly."""
    if past is not None or past_sequence_length is not None:
        raise NotImplementedError("com.microsoft.Attention: past/KV-cache")
    if int(ctx.attr("do_rotary", 0)):
        raise NotImplementedError("com.microsoft.Attention: do_rotary")
    num_heads = int(ctx.attr("num_heads"))
    unidirectional = int(ctx.attr("unidirectional", 0))
    mask_filter = float(ctx.attr("mask_filter_value", -10000.0))

    x = jnp.asarray(x)
    weights = jnp.asarray(weights)
    b_sz, s_len, _ = x.shape
    sizes = ctx.attr("qkv_hidden_sizes")
    if sizes is not None:
        q_h, k_h, v_h = (int(v) for v in sizes)
    else:
        q_h = k_h = v_h = weights.shape[1] // 3

    orig = x.dtype
    x2, w2 = _mxu_operands(ctx, x, weights)
    qkv = jnp.matmul(x2, w2, preferred_element_type=_acc_dtype(ctx))
    qkv = _out_cast(ctx, qkv, orig)
    if bias is not None:
        qkv = qkv + jnp.asarray(bias).astype(qkv.dtype)
    q = qkv[..., :q_h]
    k = qkv[..., q_h:q_h + k_h]
    v = qkv[..., q_h + k_h:]

    def heads(t, h_dim):
        return t.reshape(b_sz, s_len, num_heads, h_dim // num_heads).transpose(
            0, 2, 1, 3
        )

    q, k, v = heads(q, q_h), heads(k, k_h), heads(v, v_h)
    scale = ctx.attr("scale")
    scale = (
        float(scale) if scale is not None else 1.0 / np.sqrt(k.shape[-1])
    )
    q2, k2 = _mxu_operands(ctx, q, k)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q2, k2, preferred_element_type=jnp.float32
    ) * scale

    if mask_index is not None:
        m = jnp.asarray(mask_index)
        if m.ndim == 1:
            if m.shape[0] != b_sz:
                raise NotImplementedError(
                    "com.microsoft.Attention: packed 1-D (2B,)/(3B+2,) "
                    "begin/end mask forms"
                )
            # [B] right-padding key lengths
            keep = (jnp.arange(s_len)[None, :] < m[:, None])[:, None, None, :]
        elif m.ndim == 2:  # [B,S] raw key mask
            keep = (m[:, -s_len:] != 0)[:, None, None, :]
        elif m.ndim == 3:  # [B,S,T] per-query mask
            keep = (m[:, :, -s_len:] != 0)[:, None, :, :]
        elif m.ndim == 4:  # [B,1,M,M] per-query mask over max_seq
            keep = m[:, :, :s_len, :s_len] != 0
        else:
            raise NotImplementedError(
                f"com.microsoft.Attention: mask_index rank {m.ndim}"
            )
        logits = jnp.where(keep, logits, logits + mask_filter)
    if attention_bias is not None:
        logits = logits + jnp.asarray(attention_bias).astype(logits.dtype)
    if unidirectional:
        causal = jnp.tril(jnp.ones((s_len, s_len), dtype=bool))
        logits = jnp.where(causal[None, None], logits, logits + mask_filter)

    probs = jax.nn.softmax(logits, axis=-1)
    p2, v2 = _mxu_operands(ctx, probs.astype(orig), v)
    y = jnp.einsum(
        "bhqk,bhkd->bhqd", p2, v2, preferred_element_type=_acc_dtype(ctx)
    )
    y = _out_cast(ctx, y, orig)
    return [y.transpose(0, 2, 1, 3).reshape(b_sz, s_len, v_h)]
