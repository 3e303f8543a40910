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
    _run_subgraph,
    _static_int,
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
    forms: [B] right-padding lengths over the TOTAL (past + current) key
    sequence, [B,T] raw key masks, [B,S,T] per-query masks, and
    [B,1,M,M] per-query masks (sliced to the live rows/cols); 1 =
    attend, masked logits get ``mask_filter_value`` added, matching
    onnxruntime. The packed 1-D (2B,)/(3B+2,) begin/end forms raise.

    KV cache: ``past`` is the stacked [2, B, heads, S_past, head] tensor
    ORT's GPT-2 exporter emits; the optional second output is the
    analogous ``present`` [2, B, heads, S_past+S, head].
    ``past_present_share_buffer`` (``past_sequence_length`` input) is a
    CUDA in-place-buffer protocol with no XLA analog and raises; rotary
    embedding inside this op (``do_rotary``) raises — files at that
    vintage carry the separate com.microsoft.RotaryEmbedding node,
    which is supported."""
    if past_sequence_length is not None or int(
        ctx.attr("past_present_share_buffer", 0)
    ):
        raise NotImplementedError(
            "com.microsoft.Attention: past_present_share_buffer"
        )
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
    past_len = 0
    if past is not None:
        p = jnp.asarray(past)
        if p.ndim != 5 or p.shape[0] != 2:
            raise NotImplementedError(
                "com.microsoft.Attention: past must be [2,B,heads,S_past,head]"
            )
        past_len = p.shape[3]
        k = jnp.concatenate([p[0].astype(k.dtype), k], axis=2)
        v = jnp.concatenate([p[1].astype(v.dtype), v], axis=2)
    present = (k, v)
    t_len = k.shape[2]
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
            # [B] right-padding key lengths over the total sequence
            keep = (jnp.arange(t_len)[None, :] < m[:, None])[:, None, None, :]
        elif m.ndim == 2:  # [B,T] raw key mask
            keep = (m[:, -t_len:] != 0)[:, None, None, :]
        elif m.ndim == 3:  # [B,S,T] per-query mask
            keep = (m[:, :, -t_len:] != 0)[:, None, :, :]
        elif m.ndim == 4:  # [B,1,M,M] per-query mask over max_seq
            keep = m[:, :, past_len:past_len + s_len, :t_len] != 0
        else:
            raise NotImplementedError(
                f"com.microsoft.Attention: mask_index rank {m.ndim}"
            )
        logits = jnp.where(keep, logits, logits + mask_filter)
    if attention_bias is not None:
        logits = logits + jnp.asarray(attention_bias).astype(logits.dtype)
    if unidirectional:
        # Query row i sits at global position past_len + i.
        causal = (
            jnp.arange(t_len)[None, :]
            <= (past_len + jnp.arange(s_len))[:, None]
        )
        logits = jnp.where(causal[None, None], logits, logits + mask_filter)

    probs = jax.nn.softmax(logits, axis=-1)
    p2, v2 = _mxu_operands(ctx, probs.astype(orig), v)
    y = jnp.einsum(
        "bhqk,bhkd->bhqd", p2, v2, preferred_element_type=_acc_dtype(ctx)
    )
    y = _out_cast(ctx, y, orig)
    outs = [y.transpose(0, 2, 1, 3).reshape(b_sz, s_len, v_h)]
    if ctx.num_outputs > 1:
        outs.append(jnp.stack(present, axis=0))
    return outs


# ---------------------------------------------------------------------------
# Transformer contrib family beyond packed-QKV Attention: the remaining
# nodes onnxruntime's transformer optimizer (and optimum's ORT exports)
# emits for BERT-family encoders (EmbedLayerNormalization), cross- and
# self-attention with separate Q/K/V (MultiHeadAttention), llama-style
# decoders (GroupQueryAttention, RotaryEmbedding), and the stable-diffusion
# UNet set (GroupNorm / SkipGroupNorm / BiasSplitGelu). Conventions are
# hand-read from the onnxruntime contrib-op schema docs and kernel sources
# (no ORT wheel exists in this environment to cross-check); each docstring
# records the convention it implements.
# ---------------------------------------------------------------------------


@ms_op("EmbedLayerNormalization")
def _embed_layer_norm(ctx, input_ids, segment_ids=None, word_emb=None,
                      position_emb=None, segment_emb=None, gamma=None,
                      beta=None, mask=None, position_ids=None):
    """BERT embedding fusion: word + position (+ segment) table lookups,
    LayerNorm(gamma, beta), and the mask length reduction, in one node.

    Conventions (ORT embed_layer_norm kernel): positions default to the
    column index 0..S-1 per row when ``position_ids`` is absent
    (broadcast [1,S] accepted); ``segment_ids`` default to zeros when the
    segment table is present; output 1 (``mask_index``, int32 [B]) is the
    per-row sum of ``mask`` — zeros when no mask is given; optional
    output 2 is the pre-norm embedding sum."""
    eps = float(ctx.attr("epsilon", 1e-12))
    ids = jnp.asarray(input_ids).astype(jnp.int32)
    b_sz, s_len = ids.shape
    emb = jnp.asarray(word_emb)[ids]
    if position_ids is not None:
        pos = jnp.broadcast_to(
            jnp.asarray(position_ids).astype(jnp.int32), (b_sz, s_len)
        )
    else:
        pos = jnp.broadcast_to(
            jnp.arange(s_len, dtype=jnp.int32)[None], (b_sz, s_len)
        )
    emb = emb + jnp.asarray(position_emb)[pos]
    if segment_emb is not None:
        seg = (
            jnp.asarray(segment_ids).astype(jnp.int32)
            if segment_ids is not None
            else jnp.zeros((b_sz, s_len), jnp.int32)
        )
        emb = emb + jnp.asarray(segment_emb)[seg]
    mean, inv = _ln_stats(emb.astype(jnp.float32), eps)
    y = ((emb.astype(jnp.float32) - mean) * inv).astype(emb.dtype)
    y = y * jnp.asarray(gamma).astype(emb.dtype)
    if beta is not None:
        y = y + jnp.asarray(beta).astype(emb.dtype)
    if mask is not None:
        mask_index = jnp.sum(
            (jnp.asarray(mask) != 0).astype(jnp.int32), axis=1
        )
    else:
        mask_index = jnp.zeros((b_sz,), jnp.int32)
    outs = [y, mask_index]
    if ctx.num_outputs > 2:
        outs.append(emb)
    return outs


def _mha_core(ctx, q, k, v, *, past_key=None, past_value=None,
              key_padding_mask=None, attention_bias=None, scale=None,
              unidirectional=0, mask_filter=-10000.0, softcap=0.0,
              local_window=0, key_lengths=None):
    """Shared scaled-dot-product core over head-split [B,N,S,h] operands.

    Handles KV-cache concat, GQA head repetition, [B]-length /[B,T]-mask
    key padding (``mask_filter`` added to masked logits, the ORT
    convention), additive ``attention_bias``, causal masking at global
    positions (query i lives at ``past_len + i``), optional sliding
    window (attend the last ``local_window`` keys only), and softcap.
    Returns (y [B,N,S,h_v], present_k, present_v)."""
    past_len = 0
    if past_key is not None:
        pk = jnp.asarray(past_key)
        past_len = pk.shape[2]
        k = jnp.concatenate([pk.astype(k.dtype), k], axis=2)
        v = jnp.concatenate([jnp.asarray(past_value).astype(v.dtype), v],
                            axis=2)
    present_k, present_v = k, v
    n_q, n_kv = q.shape[1], k.shape[1]
    if n_q != n_kv:
        if n_q % n_kv:
            raise ValueError(
                f"{ctx.op_type}: q heads ({n_q}) must be a multiple of "
                f"kv heads ({n_kv})"
            )
        rep = n_q // n_kv
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    s_len, t_len = q.shape[2], k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(q.shape[-1])

    orig = q.dtype
    q2, k2 = _mxu_operands(ctx, q, k)
    logits = jnp.einsum(
        "bhqd,bhkd->bhqk", q2, k2, preferred_element_type=jnp.float32
    ) * scale

    if key_padding_mask is not None:
        m = jnp.asarray(key_padding_mask)
        if m.ndim == 1:
            keep = (jnp.arange(t_len)[None, :] < m[:, None])[:, None, None, :]
        elif m.ndim == 2:
            keep = (m[:, -t_len:] != 0)[:, None, None, :]
        else:
            raise NotImplementedError(
                f"{ctx.op_type}: key_padding_mask rank {m.ndim}"
            )
        logits = jnp.where(keep, logits, logits + mask_filter)
    if attention_bias is not None:
        logits = logits + jnp.asarray(attention_bias).astype(logits.dtype)
    if key_lengths is not None:
        # GQA seqlens protocol (always causal; masked logits are -inf,
        # matching ORT's GQA kernel). Tokens are LEFT-aligned with right
        # padding:
        #   prompt (no past): token i sits at position i; valid keys are
        #     j <= i and j < len_b.
        #   continuation (past of static length Sp): row b's valid past
        #     occupies cache slots 0..len_b-S-1 and the current chunk is
        #     appended at static slots Sp..Sp+S-1, at positions
        #     len_b-S+i (so the newest token of every row sits at
        #     position len_b-1, ORT's decode convention).
        lens_b = jnp.asarray(key_lengths).astype(jnp.int32)[
            :, None, None, None
        ]
        jj = jnp.arange(t_len)[None, None, None, :]
        ii = jnp.arange(s_len)[None, None, :, None]
        if past_len == 0:
            keep = (jj <= ii) & (jj < lens_b)
            q_pos = ii
            k_pos = jj
        else:
            valid_past = jj < jnp.maximum(lens_b - s_len, 0)
            current = (jj >= past_len) & ((jj - past_len) <= ii)
            keep = valid_past | current
            q_pos = lens_b - s_len + ii
            k_pos = jnp.where(jj >= past_len,
                              lens_b - s_len + (jj - past_len), jj)
        if local_window and local_window > 0:
            keep = keep & (k_pos > q_pos - local_window)
        logits = jnp.where(keep, logits, -jnp.inf)
    elif unidirectional:
        g_pos = past_len + jnp.arange(s_len)
        causal = (
            jnp.arange(t_len)[None, :] <= g_pos[:, None]
        )[None, None]
        if local_window and local_window > 0:
            causal = jnp.logical_and(
                causal,
                jnp.arange(t_len)[None, None, :]
                > g_pos[None, :, None] - local_window,
            )
        logits = jnp.where(causal, logits, -jnp.inf)
    if softcap and softcap > 0.0:
        logits = softcap * jnp.tanh(logits / softcap)

    probs = jax.nn.softmax(logits, axis=-1)
    p2, v2 = _mxu_operands(ctx, probs.astype(orig), v)
    y = jnp.einsum(
        "bhqk,bhkd->bhqd", p2, v2, preferred_element_type=_acc_dtype(ctx)
    )
    return _out_cast(ctx, y, orig), present_k, present_v


def _merge_heads(y):
    b, h, s, d = y.shape
    return y.transpose(0, 2, 1, 3).reshape(b, s, h * d)


@ms_op("MultiHeadAttention")
def _multi_head_attention(ctx, query, key=None, value=None, bias=None,
                          key_padding_mask=None, attention_bias=None,
                          past_key=None, past_value=None):
    """com.microsoft MultiHeadAttention: attention over already-projected
    Q/K/V (the optimizer keeps the projections as surrounding MatMuls).

    Input forms (ORT multihead_attention schema): separate 3-D
    Q [B,Sq,Hq] / K [B,Skv,Hk] / V [B,Skv,Hv]; K/V pre-split 4-D
    [B,N,Skv,h] (cross-attention with cached keys); packed QKV
    [B,S,N,3,h] (key/value absent); packed KV [B,Skv,N,2,h]. ``bias``
    [Hq+Hk+Hv] adds to Q/K/V before head split (3-D forms only — the
    packed and pre-split forms are emitted bias-free). Masks follow the
    Attention conventions ([B] lengths / [B,T] key mask +
    ``mask_filter_value``); ``past_key``/``past_value`` are [B,N,Sp,h]
    with matching present outputs 1/2."""
    num_heads = int(ctx.attr("num_heads"))
    mask_filter = float(ctx.attr("mask_filter_value", -10000.0))
    unidirectional = int(ctx.attr("unidirectional", 0))
    scale = ctx.attr("scale")
    scale = float(scale) if scale is not None else None

    q = jnp.asarray(query)

    def split_heads(t):
        b, s, h = t.shape
        return t.reshape(b, s, num_heads, h // num_heads).transpose(0, 2, 1, 3)

    if q.ndim == 5:  # packed QKV [B,S,N,3,h]
        if key is not None or value is not None or bias is not None:
            raise NotImplementedError(
                "com.microsoft.MultiHeadAttention: packed QKV with "
                "key/value/bias inputs"
            )
        qkv = q.transpose(0, 2, 3, 1, 4)  # [B,N,3,S,h]
        q_, k_, v_ = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    else:
        kk = None if key is None else jnp.asarray(key)
        if kk is not None and kk.ndim == 5:  # packed KV [B,Skv,N,2,h]
            if value is not None or bias is not None:
                raise NotImplementedError(
                    "com.microsoft.MultiHeadAttention: packed KV with "
                    "value/bias inputs"
                )
            kv = kk.transpose(0, 2, 3, 1, 4)
            k_, v_ = kv[:, :, 0], kv[:, :, 1]
            q_ = split_heads(q)
        elif kk is not None and kk.ndim == 4:  # pre-split cross-attn K/V
            if bias is not None:
                raise NotImplementedError(
                    "com.microsoft.MultiHeadAttention: bias with 4-D "
                    "pre-split key/value"
                )
            k_, v_ = kk, jnp.asarray(value)
            q_ = split_heads(q)
        else:
            vv = jnp.asarray(value)
            if bias is not None:
                bb = jnp.asarray(bias)
                qh, kh = q.shape[-1], kk.shape[-1]
                q = q + bb[:qh].astype(q.dtype)
                kk = kk + bb[qh:qh + kh].astype(kk.dtype)
                vv = vv + bb[qh + kh:].astype(vv.dtype)
            q_, k_, v_ = split_heads(q), split_heads(kk), split_heads(vv)

    y, pres_k, pres_v = _mha_core(
        ctx, q_, k_, v_,
        past_key=past_key, past_value=past_value,
        key_padding_mask=key_padding_mask, attention_bias=attention_bias,
        scale=scale, unidirectional=unidirectional, mask_filter=mask_filter,
    )
    outs = [_merge_heads(y)]
    if ctx.num_outputs > 1:
        outs.append(pres_k)
    if ctx.num_outputs > 2:
        outs.append(pres_v)
    return outs


@ms_op("RotaryEmbedding")
def _ms_rotary_embedding(ctx, x, position_ids, cos_cache, sin_cache):
    """com.microsoft RotaryEmbedding — same math as the opset-23 core op
    (which this delegates to: interleaved / num_heads /
    rotary_embedding_dim attributes line up), plus the contrib-only
    position forms: ``position_ids`` may be [B,S], broadcastable [1,S],
    or a single-element offset tensor meaning positions
    ``offset + arange(S)`` (the KV-cache decode step idiom)."""
    if float(ctx.attr("scale", 1.0)) != 1.0:
        raise NotImplementedError(
            "com.microsoft.RotaryEmbedding: scale != 1.0"
        )
    if int(ctx.attr("is_packed_batching", 0)):
        raise NotImplementedError(
            "com.microsoft.RotaryEmbedding: is_packed_batching"
        )
    x = jnp.asarray(x)
    b_sz = x.shape[0]
    s_len = x.shape[1] if x.ndim == 3 else x.shape[2]
    pos = jnp.asarray(position_ids).astype(jnp.int32)
    if pos.size == 1:
        pos = pos.reshape(()) + jnp.arange(s_len, dtype=jnp.int32)
        pos = jnp.broadcast_to(pos[None], (b_sz, s_len))
    else:
        pos = jnp.broadcast_to(pos, (b_sz, s_len))
    return _REGISTRY["RotaryEmbedding"](ctx, x, cos_cache, sin_cache, pos)


def _gqa_rotary(ctx, t, pos, cos_cache, sin_cache, interleaved):
    """Apply rotary embedding to head-split [B,N,S,h] at positions [B,S]."""
    cos = jnp.asarray(cos_cache)[pos][:, None].astype(t.dtype)
    sin = jnp.asarray(sin_cache)[pos][:, None].astype(t.dtype)
    rd = 2 * cos.shape[-1]
    rot, tail = t[..., :rd], t[..., rd:]
    if interleaved:
        x1, x2 = rot[..., 0::2], rot[..., 1::2]
    else:
        x1, x2 = rot[..., : rd // 2], rot[..., rd // 2:]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    if interleaved:
        rot_out = jnp.stack([r1, r2], axis=-1).reshape(rot.shape)
    else:
        rot_out = jnp.concatenate([r1, r2], axis=-1)
    return (
        jnp.concatenate([rot_out, tail], axis=-1)
        if rd < t.shape[-1] else rot_out
    )


@ms_op("GroupQueryAttention")
def _group_query_attention(ctx, query, key=None, value=None, past_key=None,
                           past_value=None, seqlens_k=None,
                           total_sequence_length=None, cos_cache=None,
                           sin_cache=None):
    """com.microsoft GroupQueryAttention (llama-family ORT exports).

    Static-shape subset: query [B,S,N*h] with key/value [B,S,kvN*h]
    (or packed [B,S,(N+2*kvN)*h] query when key/value are absent),
    optional past_key/past_value [B,kvN,Sp,h] CONCATENATED to presents
    of length Sp+S (the non-``past_present_share_buffer`` protocol —
    in-place buffer sharing is a CUDA-ism with no XLA analog).
    ``seqlens_k`` [B] int32 is the ORT convention "total valid sequence
    length minus 1" per row; it may be runtime data (traced). Tokens are
    LEFT-aligned with right padding: in the prompt phase token i sits at
    position i (keys j <= i, j < len); in a continuation the valid past
    occupies cache slots 0..len-S-1, the current chunk is appended at
    static slots Sp..Sp+S-1, and rotary positions are len-S+i so every
    row's newest token sits at position len-1 (ORT's decode
    convention). Attention is always causal; ``local_window_size``
    attends the trailing position window only (sliding-window models);
    ``softcap`` and ``do_rotary`` (interleaved or split-half, partial
    dims via cache width) follow the kernel conventions.
    ``total_sequence_length`` only disambiguates the share-buffer
    protocol and is validated statically when constant."""
    num_heads = int(ctx.attr("num_heads"))
    kv_heads = int(ctx.attr("kv_num_heads"))
    scale = ctx.attr("scale")
    scale = float(scale) if scale is not None else None
    softcap = float(ctx.attr("softcap", 0.0))
    local_window = int(ctx.attr("local_window_size", -1))
    if int(ctx.attr("smooth_softmax", 0)):
        raise NotImplementedError(
            "com.microsoft.GroupQueryAttention: smooth_softmax"
        )

    q = jnp.asarray(query)
    b_sz, s_len = q.shape[0], q.shape[1]
    if key is None:  # packed QKV: [B,S,(N+2*kvN)*h]
        head = q.shape[-1] // (num_heads + 2 * kv_heads)
        qh = num_heads * head
        kh = kv_heads * head
        key = q[..., qh:qh + kh]
        value = q[..., qh + kh:]
        q = q[..., :qh]
    k = jnp.asarray(key)
    v = jnp.asarray(value)

    def split(t, n):
        b, s, h = t.shape
        return t.reshape(b, s, n, h // n).transpose(0, 2, 1, 3)

    q_, k_, v_ = split(q, num_heads), split(k, kv_heads), split(v, kv_heads)

    past_len = 0 if past_key is None else jnp.asarray(past_key).shape[2]
    if seqlens_k is not None:
        lens = jnp.asarray(seqlens_k).astype(jnp.int32) + 1
    else:
        lens = jnp.full((b_sz,), past_len + s_len, jnp.int32)
    if total_sequence_length is not None and not isinstance(
        total_sequence_length, jax.core.Tracer
    ):
        tot = int(np.asarray(total_sequence_length).reshape(-1)[0])
        if tot != past_len + s_len:
            raise NotImplementedError(
                "com.microsoft.GroupQueryAttention: "
                f"total_sequence_length {tot} != past+current "
                f"{past_len + s_len} (past_present_share_buffer protocol)"
            )

    if int(ctx.attr("do_rotary", 0)):
        interleaved = int(ctx.attr("rotary_interleaved", 0))
        if past_len == 0:
            # Prompt: left-aligned tokens, position of token i is i.
            pos = jnp.broadcast_to(
                jnp.arange(s_len, dtype=jnp.int32)[None], (b_sz, s_len)
            )
        else:
            # Continuation: the newest token of row b sits at position
            # lens[b]-1 (ORT's decode convention).
            pos = jnp.maximum(
                lens[:, None] - s_len
                + jnp.arange(s_len, dtype=jnp.int32)[None],
                0,
            )
        q_ = _gqa_rotary(ctx, q_, pos, cos_cache, sin_cache, interleaved)
        k_ = _gqa_rotary(ctx, k_, pos, cos_cache, sin_cache, interleaved)

    y, pres_k, pres_v = _mha_core(
        ctx, q_, k_, v_,
        past_key=past_key, past_value=past_value,
        scale=scale, unidirectional=1,
        softcap=softcap, local_window=local_window,
        key_lengths=lens,
    )
    outs = [_merge_heads(y)]
    if ctx.num_outputs > 1:
        outs.append(pres_k)
    if ctx.num_outputs > 2:
        outs.append(pres_v)
    return outs


# ---------------------------------------------------------------------------
# Stable-diffusion UNet set: GroupNorm / SkipGroupNorm / BiasSplitGelu
# ---------------------------------------------------------------------------


def _group_norm_core(ctx, x_cl, gamma, beta, *, groups, eps, swish):
    """GroupNorm over channels-last [B, ..., C] input; gamma/beta [C]."""
    c = x_cl.shape[-1]
    if c % groups:
        raise ValueError(
            f"{ctx.op_type}: channels {c} not divisible by groups {groups}"
        )
    b = x_cl.shape[0]
    g = x_cl.reshape(b, -1, groups, c // groups).astype(jnp.float32)
    mean = jnp.mean(g, axis=(1, 3), keepdims=True)
    var = jnp.var(g, axis=(1, 3), keepdims=True)
    yn = (g - mean) * jax.lax.rsqrt(var + eps)
    y = yn.reshape(x_cl.shape)
    y = y * jnp.asarray(gamma).astype(jnp.float32)
    y = y + jnp.asarray(beta).astype(jnp.float32)
    if swish:
        y = y * jax.nn.sigmoid(y)
    return y.astype(x_cl.dtype)


@ms_op("GroupNorm")
def _ms_group_norm(ctx, x, gamma, beta):
    """com.microsoft GroupNorm (stable-diffusion UNet exports): input
    [B,H,W,C] when ``channels_last=1`` (the default) else [B,C,H,W];
    float32 gamma/beta [C]; ``activation=1`` fuses swish (x·sigmoid x).
    Statistics are computed per (batch, group) over spatial × group
    channels in float32, matching the ORT kernel."""
    groups = int(ctx.attr("groups"))
    eps = float(ctx.attr("epsilon", 1e-5))
    swish = int(ctx.attr("activation", 0))
    x = jnp.asarray(x)
    if int(ctx.attr("channels_last", 1)):
        return [_group_norm_core(ctx, x, gamma, beta, groups=groups,
                                 eps=eps, swish=swish)]
    x_cl = jnp.moveaxis(x, 1, -1)
    y = _group_norm_core(ctx, x_cl, gamma, beta, groups=groups, eps=eps,
                         swish=swish)
    return [jnp.moveaxis(y, -1, 1)]


@ms_op("SkipGroupNorm")
def _skip_group_norm(ctx, x, gamma, beta, skip, bias=None):
    """GroupNorm(x + skip + bias) over channels-last [B,H,W,C] input
    (this op is NHWC-only in ORT). ``skip`` broadcasts from [B,H,W,C],
    [B,1,1,C], or [B,C]; ``bias`` is [C]. Optional output 1 is the
    pre-norm sum (fed to the next residual)."""
    x = jnp.asarray(x)
    sk = jnp.asarray(skip)
    if sk.ndim == 2:
        sk = sk[:, None, None, :]
    s = x + sk.astype(x.dtype)
    if bias is not None:
        s = s + jnp.asarray(bias).astype(x.dtype)
    y = _group_norm_core(
        ctx, s, gamma, beta,
        groups=int(ctx.attr("groups")),
        eps=float(ctx.attr("epsilon", 1e-5)),
        swish=int(ctx.attr("activation", 0)),
    )
    outs = [y]
    if ctx.num_outputs > 1:
        outs.append(s)
    return outs


@ms_op("BiasSplitGelu")
def _bias_split_gelu(ctx, x, bias):
    """Diffusion MLP fusion: add bias, split the last axis in half, then
    ``first_half * Gelu(second_half)`` (exact erf Gelu, the ORT kernel's
    form). Output has half the input's last-axis width."""
    s = jnp.asarray(x) + jnp.asarray(bias).astype(jnp.asarray(x).dtype)
    a, g = jnp.split(s, 2, axis=-1)
    gf = g.astype(jnp.float32)
    gelu = 0.5 * gf * (1.0 + jax.lax.erf(gf / np.sqrt(2.0)))
    return [a * gelu.astype(s.dtype)]


# ---------------------------------------------------------------------------
# Block-quantized weight ops (onnxruntime-genai / optimum LLM exports):
# MatMulNBits carries the 4-bit weight-only projection weights,
# GatherBlockQuantized the quantized embedding tables.
# ---------------------------------------------------------------------------


def _unpack_nibbles(b, *, signed=False):
    """Unpack uint8 bytes into 4-bit values along the last axis, low
    nibble first (the ORT packing: element i lands in the low nibble of
    byte i//2 when i is even)."""
    b = jnp.asarray(b).astype(jnp.uint8)
    lo = (b & 0xF).astype(jnp.int32)
    hi = (b >> 4).astype(jnp.int32)
    q = jnp.stack([lo, hi], axis=-1).reshape(b.shape[:-1] + (-1,))
    if signed:  # two's-complement nibbles
        q = jnp.where(q >= 8, q - 16, q)
    return q


@ms_op("MatMulNBits")
def _matmul_nbits(ctx, a, b, scales, zero_points=None, g_idx=None,
                  bias=None):
    """com.microsoft MatMulNBits: ``A @ W.T`` where W [N,K] is stored
    block-quantized at ``bits`` (4 or 8) with per-block scales.

    B is uint8 [N, n_blocks, blob] (blob = block_size*bits/8, nibbles
    packed low-first along K); scales [N, n_blocks] (flat accepted);
    zero_points either packed uint8 nibbles (one column's blocks padded
    to a byte boundary) or float (subtracted pre-scale:
    ``w = (q - zp) * scale``); absent → 2^(bits-1). ``g_idx`` [K] maps
    each element to its (act-order) block for scale/zp selection. The
    ``accuracy_level`` hint is ignored — the matmul runs under the
    package precision policy. Dequantization is jnp-traced; for
    initializer weights XLA constant-folds it at compile time."""
    k_dim = int(ctx.attr("K"))
    n_dim = int(ctx.attr("N"))
    bits = int(ctx.attr("bits", 4))
    bs = int(ctx.attr("block_size"))
    if bits not in (4, 8):
        raise NotImplementedError(f"MatMulNBits: bits={bits}")
    n_blocks = (k_dim + bs - 1) // bs

    b = jnp.asarray(b)
    if bits == 4:
        q = _unpack_nibbles(b.reshape(n_dim, n_blocks, -1))
    else:
        q = b.reshape(n_dim, n_blocks, -1).astype(jnp.int32)
    q = q.reshape(n_dim, -1)[:, :k_dim]  # [N, K]

    sc = jnp.asarray(scales).reshape(n_dim, n_blocks).astype(jnp.float32)
    if zero_points is None:
        zp = jnp.full((n_dim, n_blocks), float(1 << (bits - 1)), jnp.float32)
    else:
        zpt = jnp.asarray(zero_points)
        if zpt.dtype == jnp.uint8 and bits == 4:
            # packed nibbles, each column padded to a byte boundary
            per_col = (n_blocks + 1) // 2
            zp = _unpack_nibbles(zpt.reshape(n_dim, per_col))[:, :n_blocks]
            zp = zp.astype(jnp.float32)
        elif zpt.dtype == jnp.uint8:
            zp = zpt.reshape(n_dim, n_blocks).astype(jnp.float32)
        else:  # float-typed zero points
            zp = zpt.reshape(n_dim, n_blocks).astype(jnp.float32)

    if g_idx is not None:
        gi = np.asarray(_static_ints(g_idx, "MatMulNBits g_idx"))
        sc_e = sc[:, gi]
        zp_e = zp[:, gi]
    else:
        idx = np.minimum(np.arange(k_dim) // bs, n_blocks - 1)
        sc_e = sc[:, idx]
        zp_e = zp[:, idx]
    w = ((q.astype(jnp.float32) - zp_e) * sc_e)  # [N, K]

    a = jnp.asarray(a)
    orig = a.dtype
    a2, w2 = _mxu_operands(ctx, a, w.astype(orig).T)
    y = jnp.matmul(a2, w2, preferred_element_type=_acc_dtype(ctx))
    y = _out_cast(ctx, y, orig)
    if bias is not None:
        y = y + jnp.asarray(bias).astype(y.dtype)
    return [y]


@ms_op("GatherBlockQuantized")
def _gather_block_quantized(ctx, data, indices, scales, zero_points=None):
    """Gather rows from a block-quantized table, dequantizing with
    per-block scales along ``quantize_axis``.

    ``data`` is int4/uint4 (codec-unpacked) or uint8 (packed 4-bit pairs
    along the quantize axis, low nibble first); ``scales`` matches data's
    shape with the quantize axis divided by ``block_size``;
    ``zero_points`` matches scales (integer-typed subtracted pre-scale,
    absent → 0 for signed, 8 for unsigned). Dequantize-then-gather is
    expressed gather-first so only the selected rows dequantize."""
    gather_axis = int(ctx.attr("gather_axis", 0))
    quant_axis = int(ctx.attr("quantize_axis", 1))
    bs = int(ctx.attr("block_size", 128))

    d = jnp.asarray(data)
    signed = d.dtype in (jnp.int4, jnp.int8)
    if d.dtype == jnp.uint8:  # packed 4-bit pairs along quant_axis
        d = jnp.moveaxis(d, quant_axis, -1)
        q = _unpack_nibbles(d)
        q = jnp.moveaxis(q, -1, quant_axis)
        default_zp = 8.0
    else:
        q = d.astype(jnp.int32)
        default_zp = 0.0 if signed else 8.0

    sc = jnp.asarray(scales).astype(jnp.float32)
    if zero_points is None:
        zp = jnp.full(sc.shape, default_zp, jnp.float32)
    else:
        zpt = jnp.asarray(zero_points)
        if zpt.dtype == jnp.uint8 and jnp.asarray(data).dtype == jnp.uint8:
            zpt = jnp.moveaxis(zpt, quant_axis, -1)
            zpt = _unpack_nibbles(zpt)
            zpt = jnp.moveaxis(zpt, -1, quant_axis)
            zp = zpt[
                tuple(slice(0, s) for s in sc.shape)
            ].astype(jnp.float32)
        else:
            zp = zpt.astype(jnp.float32)

    idx = jnp.asarray(indices).astype(jnp.int32)
    if gather_axis == quant_axis:
        raise NotImplementedError(
            "GatherBlockQuantized: gather_axis == quantize_axis"
        )
    q_g = jnp.take(q, idx, axis=gather_axis)
    sc_g = jnp.take(sc, idx, axis=gather_axis)
    zp_g = jnp.take(zp, idx, axis=gather_axis)
    # Broadcast per-block scale/zp up to per-element along quant_axis.
    qa = quant_axis + (idx.ndim - 1 if quant_axis > gather_axis else 0)
    k = q_g.shape[qa]
    blk = jnp.minimum(jnp.arange(k) // bs, sc_g.shape[qa] - 1)
    sc_e = jnp.take(sc_g, blk, axis=qa)
    zp_e = jnp.take(zp_g, blk, axis=qa)
    y = (q_g.astype(jnp.float32) - zp_e) * sc_e
    return [y]


# ---------------------------------------------------------------------------
# quantized transformer/classical ops: QGemm / QAttention / QLinearSoftmax
# (the remaining kernels ORT's quantization tool emits for int8 BERT-class
# files), plus Inverse and MurmurHash3
# ---------------------------------------------------------------------------


def _dq_weight(w, w_s, w_zp, per_col_axis):
    """Dequantize a weight whose scale/zero-point may be scalar or
    per-output-column (1-D); ``per_col_axis`` is the axis of ``w`` the
    1-D vectors run along."""
    wf = jnp.asarray(w).astype(jnp.float32)
    zp = None if w_zp is None else jnp.asarray(w_zp).astype(jnp.float32)
    sc = jnp.asarray(w_s).astype(jnp.float32)

    def orient(v):
        if v.ndim == 1 and v.shape[0] > 1:
            shape = [1] * wf.ndim
            shape[per_col_axis] = v.shape[0]
            return v.reshape(shape)
        return v

    if zp is not None:
        wf = wf - orient(zp)
    return wf * orient(sc)


@ms_op("QGemm")
def _qgemm(ctx, a, a_s, a_zp, b, b_s, b_zp, c=None, y_s=None, y_zp=None):
    """com.microsoft.QGemm: Gemm over quantized A/B. Per the ORT contrib
    schema, the optional int32 bias C carries the implicit scale
    ``alpha * a_scale * b_scale`` (per-column b_scale broadcasts over the
    output columns); with ``y_scale`` present the output requantizes to
    y_zero_point's dtype, else it stays float32."""
    alpha = float(ctx.attr("alpha", 1.0))
    trans_a = int(ctx.attr("transA", 0))
    trans_b = int(ctx.attr("transB", 0))
    af = _dq(a, a_s, a_zp)
    # b per-column quantization runs along the OUTPUT-column axis of B:
    # axis 1 normally, axis 0 when transB.
    bf = _dq_weight(b, b_s, b_zp, per_col_axis=0 if trans_b else 1)
    if trans_a:
        af = jnp.swapaxes(af, -1, -2)
    if trans_b:
        bf = jnp.swapaxes(bf, -1, -2)
    a2, b2 = _mxu_operands(ctx, af, bf)
    y = alpha * jnp.matmul(a2, b2, preferred_element_type=jnp.float32)
    if c is not None:
        c_scale = (
            alpha
            * jnp.asarray(a_s).astype(jnp.float32)
            * jnp.asarray(b_s).astype(jnp.float32)  # [N] broadcasts on cols
        )
        y = y + jnp.asarray(c).astype(jnp.float32) * c_scale
    if y_s is None:
        return [y]
    return [_requantize(ctx, y, y_s, _default_zp(y_zp, a))]


@ms_op("QAttention")
def _qattention(ctx, x, w, bias, x_s, w_s, mask_index=None, x_zp=None,
                w_zp=None, past=None):
    """com.microsoft.QAttention (quantized BERT self-attention): int8
    input and packed-QKV weight with scales/zero-points; dequantize both
    and run the float contrib Attention path (same node attrs:
    num_heads, unidirectional, mask_filter_value, qkv_hidden_sizes).
    Output is float, matching the ORT kernel."""
    xf = _dq(x, x_s, x_zp)
    wf = _dq_weight(w, w_s, w_zp, per_col_axis=1)
    return _ms_attention(ctx, xf, wf, bias, mask_index, past)


@ms_op("QLinearSoftmax")
def _qlinear_softmax(ctx, x, x_s, x_zp, y_s, y_zp=None):
    """Dequantize → softmax → requantize. The ``opset`` attribute selects
    softmax semantics: >= 13 is per-axis; < 13 is the legacy
    coerce-to-2D-from-axis form (same rule as core Softmax)."""
    axis = int(ctx.attr("axis", -1))
    opset = int(ctx.attr("opset", 13))
    xf = _dq(x, x_s, x_zp)
    ax = axis + xf.ndim if axis < 0 else axis
    if opset >= 13:
        y = jax.nn.softmax(xf, axis=ax)
    else:
        lead = 1
        for d in xf.shape[:ax]:
            lead *= d
        y = jax.nn.softmax(xf.reshape(lead, -1), axis=-1).reshape(xf.shape)
    return [_requantize(ctx, y, y_s, _default_zp(y_zp, x))]


@ms_op("Inverse")
def _ms_inverse(ctx, x):
    """Batched matrix inverse ([..., M, M]); computed in float32 and cast
    back (f16 inputs have no stable direct path)."""
    x = jnp.asarray(x)
    y = jnp.linalg.inv(x.astype(jnp.float32))
    return [y.astype(x.dtype)]


# -- MurmurHash3 -------------------------------------------------------------

_MM3_C1 = np.uint32(0xCC9E2D51)
_MM3_C2 = np.uint32(0x1B873593)


def _mm3_mix_block(xp, h, k1):
    def rotl(v, r):
        return (v << np.uint32(r)) | (v >> np.uint32(32 - r))

    k1 = k1 * _MM3_C1
    k1 = rotl(k1, 15)
    k1 = k1 * _MM3_C2
    h = h ^ k1
    h = rotl(h, 13)
    return h * np.uint32(5) + np.uint32(0xE6546B64)


def _mm3_fmix(xp, h):
    h = h ^ (h >> np.uint32(16))
    h = h * np.uint32(0x85EBCA6B)
    h = h ^ (h >> np.uint32(13))
    h = h * np.uint32(0xC2B2AE35)
    return h ^ (h >> np.uint32(16))


def _mm3_hash_u32_blocks(xp, blocks, n_bytes, seed):
    """MurmurHash3_x86_32 over little-endian 4-byte blocks (no tail —
    numeric element widths are multiples of 4). ``blocks``: list of
    uint32 arrays, one per block position."""
    h = xp.full(blocks[0].shape, np.uint32(seed), dtype=xp.uint32)
    for k1 in blocks:
        h = _mm3_mix_block(xp, h, k1)
    h = h ^ np.uint32(n_bytes)
    return _mm3_fmix(xp, h)


def _mm3_hash_bytes(data: bytes, seed: int) -> int:
    """Scalar byte-string MurmurHash3_x86_32 (host path for strings)."""
    h = np.uint32(seed)
    n = len(data)
    n_blocks = n // 4
    with np.errstate(over="ignore"):
        for i in range(n_blocks):
            k1 = np.uint32(int.from_bytes(data[4 * i: 4 * i + 4], "little"))
            h = _mm3_mix_block(np, h, k1)
        tail = data[4 * n_blocks:]
        if tail:
            k1 = np.uint32(int.from_bytes(tail, "little"))

            def rotl(v, r):
                return (v << np.uint32(r)) | (v >> np.uint32(32 - r))

            k1 = k1 * _MM3_C1
            k1 = rotl(k1, 15)
            k1 = k1 * _MM3_C2
            h = h ^ k1
        h = h ^ np.uint32(n)
        h = _mm3_fmix(np, h)
    return int(h)


@ms_op("MurmurHash3")
def _murmurhash3(ctx, x):
    """com.microsoft.MurmurHash3: per-element MurmurHash3_x86_32 over each
    element's little-endian byte representation (strings: utf-8 bytes) —
    the feature-hashing kernel sklearn-style pipelines ship. ``seed``
    attr; ``positive=1`` (default) yields uint32, else int32 (same bits).

    Numeric 4-byte elements hash on device (pure uint32 arithmetic, so
    the op jits and fuzzes like any other); 8-byte and string inputs
    hash on the host and therefore require compile-time-constant data
    (8-byte traced values would already have been truncated by jax's
    x64-disabled default)."""
    seed = int(ctx.attr("seed", 0)) & 0xFFFFFFFF
    positive = int(ctx.attr("positive", 1))
    out_np = np.uint32 if positive else np.int32

    if isinstance(x, (list, np.ndarray)) and np.asarray(x).dtype.kind in (
        "U", "S", "O"
    ):
        arr = np.asarray(x)
        flat = [
            _mm3_hash_bytes(
                (s.decode() if isinstance(s, bytes) else str(s)).encode("utf-8"),
                seed,
            )
            for s in arr.reshape(-1)
        ]
        return [np.asarray(flat, np.uint32).astype(out_np).reshape(arr.shape)]

    import jax.core as jcore

    static = not isinstance(x, jcore.Tracer)
    dt = np.dtype(jnp.asarray(x).dtype) if not static else np.asarray(x).dtype
    if dt.itemsize == 8:
        if not static:
            raise NotImplementedError(
                "MurmurHash3: 8-byte inputs must be compile-time constants "
                "(jax x64-disabled tracing truncates them)"
            )
        arr = np.asarray(x)
        view = arr.reshape(-1).view("<u4").reshape(-1, 2)
        with np.errstate(over="ignore"):
            out = _mm3_hash_u32_blocks(
                np, [view[:, 0].copy(), view[:, 1].copy()], 8, seed
            )
        return [out.astype(out_np).reshape(arr.shape)]
    if dt.itemsize != 4:
        raise NotImplementedError(
            f"MurmurHash3: unsupported element width {dt.itemsize}"
        )
    if static:
        arr = np.asarray(x)
        blocks = [arr.reshape(-1).view("<u4").copy()]
        with np.errstate(over="ignore"):
            out = _mm3_hash_u32_blocks(np, blocks, 4, seed)
        out = out.astype(out_np).reshape(arr.shape)
        return [out]
    xa = jnp.asarray(x)
    bits = jax.lax.bitcast_convert_type(xa, jnp.uint32)
    out = _mm3_hash_u32_blocks(jnp, [bits], 4, seed)
    if not positive:
        out = jax.lax.bitcast_convert_type(out, jnp.int32)
    return [out]


@ms_op("QLinearReduceMean")
def _qlinear_reduce_mean(ctx, x, x_s, x_zp, y_s, y_zp=None):
    """Dequantize → ReduceMean (axes/keepdims attrs, opset-13 attr form —
    the vintage ORT's quantizer emits) → requantize; the tail-pool kernel
    in ORT-quantized MobileNet-class files."""
    xf = _dq(x, x_s, x_zp)
    axes = ctx.attr("axes")
    keepdims = bool(int(ctx.attr("keepdims", 1)))
    if axes is None:
        ax = None
    else:
        ax = tuple(int(a) for a in np.asarray(axes).reshape(-1))
    y = jnp.mean(xf, axis=ax, keepdims=keepdims)
    return [_requantize(ctx, y, y_s, _default_zp(y_zp, x))]


# ---------------------------------------------------------------------------
# In-graph generation: com.microsoft GreedySearch — onnxruntime's
# convert_generation.py wraps an entire GPT-style decoder in ONE node whose
# ``decoder`` attribute is the full per-step subgraph (input_ids /
# position_ids / attention_mask / past_* in, logits / present_* out), and
# the op runs the whole autoregressive loop. The reference consumes such
# files whole via ort (src/classifier.rs:348-350). Conventions hand-read
# from the contrib schema docs + convert_generation.py (no ORT wheel in
# this environment); the docstring records what is implemented.
#
# TPU-native design: XLA cannot grow tensor shapes inside one program, so
# the growing-KV protocol the subgraph speaks is run against a FIXED
# max_length cache buffer — each step feeds the full buffer as ``past``
# (garbage tail masked off via the subgraph's own attention_mask input),
# and the present row the step appends at the buffer's end is scattered
# back into its true slot. The whole loop is one ``lax.while_loop`` over
# static shapes: compiled once, resident on device, no host round-trips
# per token.
# ---------------------------------------------------------------------------


def _gen_subgraph_io(graph, what):
    """Split a generation decoder subgraph's formal inputs into the fixed
    triple (input_ids, position_ids, attention_mask) + past names, and
    outputs into logits + present names (the convert_generation.py
    layout)."""
    in_names = [v.name for v in graph.input]
    out_names = [v.name for v in graph.output]
    if len(in_names) < 3 or len(out_names) < 1:
        raise ValueError(
            f"{what}: decoder subgraph needs >= 3 inputs "
            f"(input_ids, position_ids, attention_mask) and a logits "
            f"output; got {in_names} -> {out_names}"
        )
    n_layers = len(in_names) - 3
    if len(out_names) != 1 + n_layers:
        raise ValueError(
            f"{what}: expected one present per past "
            f"({n_layers}), got outputs {out_names}"
        )
    return in_names[:3], in_names[3:], out_names


def _gen_past_shape(graph, b_sz, what):
    """Static [2, B, heads, 0, head] prefill shape from the first past
    input's declared dims (GPT stacked-KV convention; the seq axis is
    index 3 and may be symbolic)."""
    if len(graph.input) < 4:
        raise NotImplementedError(
            f"{what}: decoder subgraph declares no past inputs "
            "(a KV-cache-less decoder is not a generation step graph)"
        )
    dims = []
    vi = graph.input[3]
    tensor_type = vi.type.tensor_type
    for i, d in enumerate(tensor_type.shape.dim):
        if i == 3:
            dims.append(0)
        elif d.dim_value:
            dims.append(int(d.dim_value))
        elif i == 1:
            dims.append(b_sz)
        else:
            raise NotImplementedError(
                f"{what}: past dim {i} of {vi.name!r} must be static "
                f"(or the batch/sequence axis)"
            )
    if len(dims) != 5 or dims[0] != 2:
        raise NotImplementedError(
            f"{what}: past must be the stacked [2,B,heads,seq,head] GPT "
            f"layout; {vi.name!r} declares rank {len(dims)}"
        )
    return tuple(dims)


def _gen_process_logits(logits, *, seen, length, min_length, eos,
                        repetition_penalty, vocab_mask):
    """ORT's GPT logits processors (ported from the HF processor set):
    vocab mask, CTRL-style repetition penalty over every token already in
    the sequence, and EOS suppression while ``length`` (the sequence
    length BEFORE the new token, HF's ``cur_len``) is under
    ``min_length``."""
    lf = jnp.asarray(logits).astype(jnp.float32)
    if vocab_mask is not None:
        lf = jnp.where(
            jnp.asarray(vocab_mask).astype(jnp.bool_)[None, :], lf, -jnp.inf
        )
    if repetition_penalty is not None:
        p = jnp.asarray(repetition_penalty).reshape(()).astype(jnp.float32)
        penalized = jnp.where(lf > 0, lf / p, lf * p)
        lf = jnp.where(seen.astype(jnp.bool_), penalized, lf)
    if min_length is not None:
        ml = jnp.asarray(min_length).reshape(()).astype(jnp.int32)
        lf = lf.at[:, eos].set(
            jnp.where(length < ml, -jnp.inf, lf[:, eos])
        )
    return lf


def _gpt_search_loop(ctx, input_ids, max_length, min_length,
                     repetition_penalty, vocab_mask, prefix_vocab_mask,
                     attention_mask, *, select):
    """Shared GPT decode loop for GreedySearch and Sampling: prefill +
    fixed-buffer ``lax.while_loop`` steps; ``select(processed_logits, t)``
    picks each next token (argmax for greedy, categorical for sampling).
    Returns ``sequences`` [B, max_length] int32."""
    what = f"com.microsoft.{ctx.op_type}"
    if int(ctx.attr("model_type", 0)) != 0:
        raise NotImplementedError(
            f"{what}: only model_type=0 (GPT) is implemented — "
            "convert_generation.py exports encoder-decoder greedy "
            "decoding as BeamSearch with num_beams=1 (supported)"
        )
    if int(ctx.attr("no_repeat_ngram_size", 0)):
        raise NotImplementedError(f"{what}: no_repeat_ngram_size")
    if prefix_vocab_mask is not None:
        raise NotImplementedError(f"{what}: prefix_vocab_mask")
    eos = int(ctx.attr("eos_token_id"))
    pad = int(ctx.attr("pad_token_id"))
    decoder = ctx.attr("decoder")
    if decoder is None:
        raise ValueError(f"{what}: missing decoder graph")
    init_decoder = ctx.attr("init_decoder") or decoder

    from jax import lax

    ids0 = jnp.asarray(input_ids).astype(jnp.int32)
    b_sz, s0 = ids0.shape
    max_len = _static_int(max_length, f"{what} max_length")
    if attention_mask is not None:
        am = np.asarray(attention_mask) if not isinstance(
            attention_mask, jax.core.Tracer
        ) else None
        if am is None or not np.all(am != 0):
            raise NotImplementedError(
                f"{what}: padded prompts "
                "(attention_mask with zeros / traced mask)"
            )

    out_seq = jnp.full((b_sz, max_len), pad, jnp.int32)
    if s0 >= max_len:  # nothing to generate: prompt (truncated) + pads
        return out_seq.at[:, :max_len].set(ids0[:, :max_len])
    out_seq = out_seq.at[:, :s0].set(ids0)

    (in_ids_n, in_pos_n, in_mask_n), past_names, out_names = \
        _gen_subgraph_io(decoder, what)
    init_in, init_past, init_out = _gen_subgraph_io(
        init_decoder, f"{what} init_decoder"
    )

    # ---- prefill: whole prompt, empty past --------------------------------
    p_shape = _gen_past_shape(init_decoder, b_sz, what)
    prefill_env = {
        init_in[0]: ids0,
        init_in[1]: jnp.broadcast_to(
            jnp.arange(s0, dtype=jnp.int32)[None], (b_sz, s0)
        ),
        init_in[2]: jnp.ones((b_sz, s0), jnp.int32),
    }
    for name in init_past:
        prefill_env[name] = jnp.zeros(p_shape, jnp.float32)
    pre = _run_subgraph(ctx, init_decoder, prefill_env)
    logits0 = jnp.asarray(pre[0])
    vocab = logits0.shape[-1]
    p_buf = max_len  # cache slots; valid prefix grows, tail stays masked

    def pad_to_buf(t):
        t = jnp.asarray(t).astype(jnp.float32)
        padding = [(0, 0)] * 5
        padding[3] = (0, p_buf - t.shape[3])
        return jnp.pad(t, padding)

    bufs = tuple(pad_to_buf(p) for p in pre[1:])

    seen = jnp.zeros((b_sz, vocab), jnp.bool_)
    seen = seen.at[
        jnp.repeat(jnp.arange(b_sz), s0), ids0.reshape(-1)
    ].set(True)
    first = select(
        _gen_process_logits(
            logits0[:, -1], seen=seen, length=jnp.int32(s0),
            min_length=min_length, eos=eos,
            repetition_penalty=repetition_penalty, vocab_mask=vocab_mask,
        ),
        jnp.int32(s0),
    )
    done = first == eos
    out_seq = out_seq.at[:, s0].set(first)
    seen = seen.at[jnp.arange(b_sz), first].set(True)

    # ---- steps: fixed-buffer past, one while_loop -------------------------
    def step(state):
        t, cur, done, out_seq, seen, bufs = state
        # keys: buffer slots 0..p_buf-1 (valid where slot < t-1) + current
        key_mask = jnp.concatenate(
            [
                jnp.broadcast_to(
                    (jnp.arange(p_buf, dtype=jnp.int32) < t - 1)[None],
                    (b_sz, p_buf),
                ),
                jnp.ones((b_sz, 1), jnp.bool_),
            ],
            axis=1,
        ).astype(jnp.int32)
        env = {
            in_ids_n: cur[:, None],
            in_pos_n: jnp.full((b_sz, 1), t - 1, jnp.int32),
            in_mask_n: key_mask,
        }
        env.update(dict(zip(past_names, bufs)))
        outs = _run_subgraph(ctx, decoder, env)
        logits = _gen_process_logits(
            jnp.asarray(outs[0])[:, -1], seen=seen, length=t,
            min_length=min_length, eos=eos,
            repetition_penalty=repetition_penalty, vocab_mask=vocab_mask,
        )
        nxt = select(logits, t)
        nxt = jnp.where(done, jnp.int32(pad), nxt)
        new_done = done | (nxt == eos)
        out_seq = out_seq.at[:, t].set(nxt)
        seen = seen.at[jnp.arange(b_sz), nxt].set(True)
        # the step appended cur's KV at buffer index p_buf: scatter it
        # into its true slot t-1
        new_bufs = tuple(
            lax.dynamic_update_slice_in_dim(
                b, jnp.asarray(p)[:, :, :, p_buf:p_buf + 1], t - 1, axis=3
            )
            for b, p in zip(bufs, outs[1:])
        )
        return t + 1, nxt, new_done, out_seq, seen, new_bufs

    def cont(state):
        t, _, done, *_ = state
        return jnp.logical_and(t < max_len, ~jnp.all(done))

    state = (jnp.int32(s0 + 1), first, done, out_seq, seen, bufs)
    final = lax.while_loop(cont, step, state)
    return final[3]


def _argmax_select(logits, _t):
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


@ms_op("GreedySearch")
def _greedy_search(ctx, input_ids, max_length, min_length=None,
                   repetition_penalty=None, vocab_mask=None,
                   prefix_vocab_mask=None, attention_mask=None):
    """com.microsoft GreedySearch (GPT branch of convert_generation.py).

    ``sequences`` [B, max_length] int32 = the prompt followed by greedy
    continuations; rows stop at ``eos_token_id`` and pad with
    ``pad_token_id``. Logits processors: ``vocab_mask`` [V],
    ``repetition_penalty`` (CTRL form: positive logits divide, negative
    multiply, over every token already emitted), ``min_length`` (EOS
    suppressed while the sequence is shorter, HF cur_len convention).
    ``max_length`` must be static (it sizes the device cache buffer —
    the same specialization ORT's cache allocation performs). Scope:
    ``model_type=0`` (GPT) with the stacked [2,B,heads,seq,head] past
    layout; encoder-decoder model types, ``no_repeat_ngram_size``,
    ``prefix_vocab_mask``, and padded prompts raise typed errors."""
    return [_gpt_search_loop(
        ctx, input_ids, max_length, min_length, repetition_penalty,
        vocab_mask, prefix_vocab_mask, attention_mask,
        select=_argmax_select,
    )]


def _top_p_filter(logits, top_p, filter_value, min_keep):
    """HF's TopPLogitsWarper over [B, V] logits: keep the smallest
    prefix of the descending-softmax whose cumulative probability
    exceeds ``top_p`` (always at least ``min_keep`` tokens); the rest
    get ``filter_value``."""
    sorted_logits = jnp.sort(logits, axis=-1)[:, ::-1]
    probs = jax.nn.softmax(sorted_logits, axis=-1)
    cum = jnp.cumsum(probs, axis=-1)
    # HF convention: a token is REMOVED when the cumulative probability
    # up to and including the previous token already exceeds top_p
    remove_sorted = (cum - probs) > top_p
    remove_sorted = remove_sorted.at[:, :min_keep].set(False)
    # map back: a token is kept iff its logit rank is inside the kept set
    kth = jnp.sum(~remove_sorted, axis=-1) - 1  # last kept rank
    threshold = jnp.take_along_axis(
        sorted_logits, kth[:, None], axis=-1
    )
    return jnp.where(logits >= threshold, logits, filter_value)


@ms_op("Sampling")
def _sampling_search(ctx, input_ids, max_length, min_length=None,
                     repetition_penalty=None, vocab_mask=None,
                     prefix_vocab_mask=None, attention_mask=None,
                     presence_mask=None, seed_input=None):
    """com.microsoft Sampling (GPT branch of convert_generation.py):
    the GreedySearch loop with temperature + top-p (nucleus) sampling
    instead of argmax. Convention (hand-read from the contrib schema +
    HF warpers the kernel ports; no ORT wheel here to cross-check):
    attrs ``temperature`` (divides processed logits), ``top_p`` (< 1.0
    enables nucleus filtering to ``filter_value`` keeping at least
    ``min_tokens_to_keep``), ``seed``. RNG: a jax PRNG keyed from
    ``seed`` and folded with the step index — sequences are drawn from
    the same distribution as ORT's but are NOT bit-equal to its
    Philox stream (documented engine convention; with top_p→0 or
    temperature→0 the draw degenerates to argmax and is exact).
    ``presence_mask`` [B,V] scaled by ``presence_penalty`` subtracts
    from the temperature-scaled logits before filtering (the genai
    convention); ``custom`` sampling raises a typed error."""
    if int(ctx.attr("custom", 0)):
        raise NotImplementedError("com.microsoft.Sampling: custom=1")
    presence_penalty = float(ctx.attr("presence_penalty", 0.0))
    temperature = float(ctx.attr("temperature", 1.0))
    top_p = float(ctx.attr("top_p", 1.0))
    filter_value = float(ctx.attr("filter_value", -np.inf))
    min_keep = int(ctx.attr("min_tokens_to_keep", 1))
    seed = (
        _static_int(seed_input, "Sampling seed")
        if seed_input is not None else int(ctx.attr("seed", 0))
    )
    base_key = jax.random.PRNGKey(seed)

    def select(logits, t):
        scaled = logits / jnp.float32(max(temperature, 1e-6))
        if presence_mask is not None:
            # per-(batch, vocab) presence counts scaled by the penalty
            # and subtracted from the scaled logits (genai convention)
            scaled = scaled - (
                jnp.asarray(presence_mask).astype(jnp.float32)
                * presence_penalty
            )
        if top_p < 1.0:
            scaled = _top_p_filter(scaled, top_p, filter_value, min_keep)
        key = jax.random.fold_in(base_key, t)
        return jax.random.categorical(key, scaled, axis=-1).astype(
            jnp.int32
        )

    return [_gpt_search_loop(
        ctx, input_ids, max_length, min_length, repetition_penalty,
        vocab_mask, prefix_vocab_mask, attention_mask, select=select,
    )]


def _beam_gather(t, idx):
    """take_along_axis over the beam axis, trailing dims broadcast."""
    while idx.ndim < t.ndim:
        idx = idx[..., None]
    return jnp.take_along_axis(t, idx, axis=1)


def _beam_state_init(ids0, *, b_sz, n_beams, s0, max_len, pad, vocab):
    """The HF static-shape beam-search state tuple: running sequences /
    scores (beam 0 seeded at 0, rest -1e9), finished sequences / scores,
    finished flags, the early-stop heuristic gate, and the per-beam
    seen-token mask for the repetition penalty."""
    running_seq = jnp.full((b_sz, n_beams, max_len), pad, jnp.int32)
    running_seq = running_seq.at[:, :, :s0].set(
        jnp.broadcast_to(ids0[:, None], (b_sz, n_beams, s0))
    )
    running_scores = jnp.zeros((b_sz, n_beams), jnp.float32)
    running_scores = running_scores.at[:, 1:].set(-1e9)
    seq = jnp.full((b_sz, n_beams, max_len), pad, jnp.int32)
    beam_scores = jnp.full((b_sz, n_beams), -1e9, jnp.float32)
    finished = jnp.zeros((b_sz, n_beams), jnp.bool_)
    heuristic = jnp.ones((b_sz, 1), jnp.bool_)
    seen_b = jnp.zeros((b_sz, vocab), jnp.bool_)
    seen_b = seen_b.at[
        jnp.repeat(jnp.arange(b_sz), s0), ids0.reshape(-1)
    ].set(True)
    seen = jnp.broadcast_to(seen_b[:, None], (b_sz, n_beams, vocab))
    return (running_seq, running_scores, seq, beam_scores, finished,
            heuristic, seen)


def _make_beam_round(*, b_sz, n_beams, vocab, s0, max_len, eos, early_stop,
                     lp_pen, min_length, repetition_penalty, vocab_mask,
                     extra_processor=None):
    """One beam-search step as a pure function over (cur_len, last-token
    logits, state) — the candidate/running/finished machinery HF's
    static-shape generate implements. Returns (new_state, parent beam
    indices for cache reordering, continue flag)."""
    from jax import lax

    n_cand = 2 * n_beams
    top_mask = jnp.arange(n_cand) < n_beams  # EOS absorbed from top ranks

    def one_round(cur_len, logits, state):
        (running_seq, running_scores, seq, beam_scores, finished,
         heuristic, seen) = state
        lp = jax.nn.log_softmax(
            logits.astype(jnp.float32), axis=-1
        ).reshape(b_sz, n_beams, vocab)
        lp = jax.vmap(
            lambda l, s: _gen_process_logits(
                l, seen=s, length=cur_len, min_length=min_length, eos=eos,
                repetition_penalty=repetition_penalty,
                vocab_mask=vocab_mask,
            ),
            in_axes=1, out_axes=1,
        )(lp, seen)
        if extra_processor is not None:
            lp = extra_processor(lp, running_seq, cur_len)
        total = (lp + running_scores[:, :, None]).reshape(b_sz, -1)
        vals, idx = lax.top_k(total, n_cand)  # (B, 2K)
        parent = idx // vocab
        tok = (idx % vocab).astype(jnp.int32)
        cand_seq = _beam_gather(running_seq, parent)
        cand_seq = cand_seq.at[:, :, cur_len].set(tok)
        hits = (tok == eos) | (cur_len + 1 >= max_len)

        # running beams for the next iteration
        run_vals = vals + hits.astype(jnp.float32) * -1e9
        _, idx2 = lax.top_k(run_vals, n_beams)
        new_running_seq = _beam_gather(cand_seq, idx2)
        new_running_scores = jnp.take_along_axis(run_vals, idx2, axis=1)
        parent2 = jnp.take_along_axis(parent, idx2, axis=1)  # (B, K)
        tok2 = jnp.take_along_axis(tok, idx2, axis=1)
        new_seen = _beam_gather(seen, parent2)
        new_seen = new_seen.at[
            jnp.arange(b_sz)[:, None], jnp.arange(n_beams)[None], tok2
        ].set(True)

        # finished-beam merge
        did_finish = hits & top_mask[None, :]
        gen_len = (cur_len + 1 - s0).astype(jnp.float32)
        fin_scores = vals / (gen_len ** lp_pen)
        full_and_stop = jnp.all(finished, axis=-1, keepdims=True)
        if early_stop:
            fin_scores = fin_scores + full_and_stop.astype(jnp.float32) * -1e9
        fin_scores = fin_scores + (~heuristic).astype(jnp.float32) * -1e9
        fin_scores = fin_scores + (~did_finish).astype(jnp.float32) * -1e9
        merged_seq = jnp.concatenate([seq, cand_seq], axis=1)
        merged_scores = jnp.concatenate([beam_scores, fin_scores], axis=1)
        merged_fin = jnp.concatenate([finished, did_finish], axis=1)
        _, idx3 = lax.top_k(merged_scores, n_beams)
        new_seq = _beam_gather(merged_seq, idx3)
        new_beam_scores = jnp.take_along_axis(merged_scores, idx3, axis=1)
        new_finished = jnp.take_along_axis(merged_fin, idx3, axis=1)

        # early-stop improvement heuristic (next iteration's gate)
        best_possible = new_running_scores[:, :1] / (
            (cur_len + 1 - s0).astype(jnp.float32) ** lp_pen
        )
        worst_finished = jnp.where(
            new_finished,
            jnp.min(new_beam_scores, axis=1, keepdims=True),
            -1e9,
        )
        new_heuristic = heuristic & jnp.any(
            best_possible > worst_finished, axis=-1, keepdims=True
        )
        cont = (
            jnp.any(new_heuristic)
            & ~(jnp.all(new_finished) & early_stop)
            & ~jnp.all(hits)
        )
        return (
            (new_running_seq, new_running_scores, new_seq, new_beam_scores,
             new_finished, new_heuristic, new_seen),
            parent2, cont,
        )

    return one_round


def _whisper_timestamp_rules(*, timestamp_begin, no_timestamps, eos,
                             begin_index, max_initial):
    """The whisper timestamp logits rules (ORT's TimestampLogitsProcessor,
    ported from openai-whisper / HF's WhisperTimeStampLogitsProcessor):
    suppress <|notimestamps|>; timestamps appear in pairs (after a lone
    timestamp only text-or-eos, after a pair only non-timestamps);
    timestamps never decrease; the first generated token must be a
    timestamp within ``max_initial`` of the start; and when the summed
    timestamp log-probability beats every text token, text is masked.
    Runs host-side on concrete values (the encoder-decoder branch is a
    host-driven loop), as a beam extra_processor over log-prob scores."""

    def apply(lp, running_seq, cur_len):
        b_sz, n_beams, vocab = lp.shape
        s = np.array(lp, np.float32).reshape(b_sz * n_beams, vocab)
        seqs = np.asarray(running_seq).reshape(b_sz * n_beams, -1)
        t = int(cur_len)
        s[:, no_timestamps] = -np.inf
        for k in range(s.shape[0]):
            sampled = seqs[k, begin_index:t]
            last_ts = sampled.size >= 1 and sampled[-1] >= timestamp_begin
            pen_ts = sampled.size < 2 or sampled[-2] >= timestamp_begin
            if last_ts:
                if pen_ts:
                    s[k, timestamp_begin:] = -np.inf
                else:
                    s[k, :eos] = -np.inf
            stamps = sampled[sampled >= timestamp_begin]
            if stamps.size > 0:
                last = stamps[-1] if (last_ts and not pen_ts) \
                    else stamps[-1] + 1
                s[k, timestamp_begin:last] = -np.inf
        if t == begin_index:
            s[:, :timestamp_begin] = -np.inf
            if max_initial is not None:
                s[:, timestamp_begin + max_initial + 1:] = -np.inf
        # prob rule on the masked scores
        m = s - s.max(axis=-1, keepdims=True)
        with np.errstate(divide="ignore"):
            logprobs = m - np.log(np.exp(m).sum(axis=-1, keepdims=True))
        for k in range(s.shape[0]):
            ts_lp = np.logaddexp.reduce(logprobs[k, timestamp_begin:])
            max_text = logprobs[k, :timestamp_begin].max()
            if ts_lp > max_text:
                s[k, :timestamp_begin] = -np.inf
        return jnp.asarray(s.reshape(b_sz, n_beams, vocab))

    return apply


def _beam_search_encdec(ctx, features, max_length, *, min_length,
                        num_beams, num_return_sequences, length_penalty,
                        repetition_penalty, vocab_mask, prefix_vocab_mask,
                        attention_mask, decoder_input_ids,
                        timestamp_rules=False):
    """Encoder-decoder branch of BeamSearch / WhisperBeamSearch
    (model_type 1/2). Two subgraph layouts: whisper's 2-input form
    (encoder features + decoder_input_ids) and T5's 3-input form with
    encoder_attention_mask between them (the decoder carries the mask
    too; it binds to all-ones — prompts here are unpadded, padded
    encoder inputs raise typed errors).

    Protocol: the ``encoder`` subgraph (attr ``encoder`` or
    ``encoder_decoder_init``) runs the encoder AND the decoder prefill —
    inputs (encoder features, decoder_input_ids), outputs (prefill
    logits, present_* caches). The ``decoder`` subgraph is the with-past
    step: its past inputs are matched to encoder outputs by name
    (``past_X`` ↔ ``present_X``); names containing ``cross`` are the
    STATIC cross-attention caches, the rest grow by one position per
    step. Because the step subgraph carries no attention-mask input, the
    fixed-buffer trick the GPT branch uses is unavailable: the loop runs
    host-driven with true growing cache shapes (one traced program per
    past length — the engine's standard decode discipline), each step's
    beam reordering a gather over the flattened batch·beam cache axis.
    The beam machinery itself is the same static-shape HF algorithm the
    GPT branch runs. Inputs must be concrete (a traced call raises)."""
    if int(ctx.attr("no_repeat_ngram_size", 0)):
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: no_repeat_ngram_size"
        )
    if prefix_vocab_mask is not None:
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: prefix_vocab_mask"
        )
    if decoder_input_ids is None:
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: decoder_input_ids is required "
            "(decoder_start_token_id synthesis is not implemented)"
        )
    if attention_mask is not None:
        am = np.asarray(attention_mask) if not isinstance(
            attention_mask, jax.core.Tracer
        ) else None
        if am is None or not np.all(am != 0):
            raise NotImplementedError(
                f"com.microsoft.{ctx.op_type}: padded encoder inputs "
                "(attention_mask with zeros / traced mask)"
            )
    if any(
        isinstance(v, jax.core.Tracer)
        for v in (features, decoder_input_ids, max_length)
    ):
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: the encoder-decoder branch "
            "runs a host-driven loop over growing cache shapes and needs "
            "concrete inputs (call the forward without jax.jit)"
        )
    eos = int(ctx.attr("eos_token_id"))
    pad = int(ctx.attr("pad_token_id"))
    early_stop = bool(int(ctx.attr("early_stopping", 0)))
    decoder = ctx.attr("decoder")
    encoder = ctx.attr("encoder") or ctx.attr("encoder_decoder_init")
    if decoder is None or encoder is None:
        raise ValueError(
            f"com.microsoft.{ctx.op_type}: missing encoder/decoder graphs"
        )

    feats = jnp.asarray(features)
    dec_ids = jnp.asarray(decoder_input_ids).astype(jnp.int32)
    b_sz, s0 = dec_ids.shape
    max_len = _static_int(max_length, f"{ctx.op_type} max_length")
    n_beams = _static_int(num_beams, f"{ctx.op_type} num_beams")
    n_return = (
        _static_int(num_return_sequences,
                    f"{ctx.op_type} num_return_sequences")
        if num_return_sequences is not None else n_beams
    )
    if n_return > n_beams:
        raise ValueError(
            f"com.microsoft.{ctx.op_type}: num_return_sequences > num_beams"
        )
    lp_pen = (
        jnp.asarray(length_penalty).reshape(()).astype(jnp.float32)
        if length_penalty is not None else jnp.float32(1.0)
    )
    rows = b_sz * n_beams

    if s0 >= max_len:
        out = jnp.broadcast_to(
            dec_ids[:, None, :max_len], (b_sz, n_return, max_len)
        ).astype(jnp.int32)
        outs = [out]
        if ctx.num_outputs > 1:
            outs.append(jnp.zeros((b_sz, n_return), jnp.float32))
        return outs

    # ---- encoder + decoder prefill (batch rows; replicated to beams) ------
    # Two subgraph layouts exist: whisper's 2-input form (features,
    # decoder_input_ids) and T5's 3-input form with encoder_attention_mask
    # between them (the decoder then carries the mask too, for
    # cross-attention). Prompts here are unpadded (guarded above), so the
    # mask binds to ones.
    enc_in = [v.name for v in encoder.input]
    enc_out = [v.name for v in encoder.output]
    t5_layout = (
        len(enc_in) == 3 and "mask" in enc_in[1].lower()
    )
    if len(enc_in) > 3 or (
        len(enc_in) == 2 and "mask" in enc_in[1].lower()
    ) or (len(enc_in) == 3 and not t5_layout):
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: encoder subgraph layout "
            f"{enc_in} is neither the 2-input whisper form (features, "
            "decoder_input_ids) nor the 3-input T5 form (ids, "
            "encoder_attention_mask, decoder_input_ids)"
        )
    enc_env = {enc_in[0]: feats}
    if t5_layout:
        enc_env[enc_in[1]] = jnp.ones(feats.shape[:2], jnp.int32)
        enc_env[enc_in[2]] = dec_ids
    elif len(enc_in) > 1:
        enc_env[enc_in[1]] = dec_ids
    pre = _run_subgraph(ctx, encoder, enc_env)
    logits0 = jnp.asarray(pre[0])[:, -1]
    vocab = logits0.shape[-1]
    present_by_name = dict(zip(enc_out[1:], pre[1:]))

    dec_in = [v.name for v in decoder.input]
    dec_mask_name = None
    past_names = []
    for n in dec_in[1:]:
        if "past" in n:
            past_names.append(n)
        elif "mask" in n.lower() and dec_mask_name is None:
            dec_mask_name = n  # T5: encoder_attention_mask per step
        else:
            raise NotImplementedError(
                f"com.microsoft.{ctx.op_type}: decoder subgraph input "
                f"{n!r} beyond input_ids + past_* + encoder_attention_mask "
                "(e.g. explicit encoder_hidden_states) is not implemented"
            )
    pasts = {}
    for name in past_names:
        src_name = name.replace("past", "present", 1)
        if src_name not in present_by_name:
            raise NotImplementedError(
                f"com.microsoft.{ctx.op_type}: decoder input {name!r} has "
                f"no matching encoder output {src_name!r}"
            )
        p = jnp.asarray(present_by_name[src_name]).astype(jnp.float32)
        pasts[name] = jnp.repeat(p, n_beams, axis=0)  # beam-replicate
    is_cross = {n: "cross" in n for n in past_names}
    enc_len = next(
        (int(pasts[n].shape[2]) for n in past_names if is_cross[n]), None
    )
    if dec_mask_name is not None and enc_len is None:
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: {dec_mask_name!r} without "
            "cross-attention caches to derive the encoder length from"
        )
    dec_out = [v.name for v in decoder.output]
    out_by_past = {}
    for i, name in enumerate(dec_out[1:]):
        out_by_past[name.replace("present", "past", 1)] = i + 1

    state = _beam_state_init(
        dec_ids, b_sz=b_sz, n_beams=n_beams, s0=s0, max_len=max_len,
        pad=pad, vocab=vocab,
    )
    extra = None
    if timestamp_rules:
        # id layout: ORT's whisper kernel derives the timestamp region
        # from the vocab tail; the attrs override when present
        # (hand-read convention — no ORT wheel here to cross-check)
        no_ts = ctx.attr("no_timestamps_token_id")
        no_ts = int(no_ts) if no_ts is not None else eos + 106
        max_init = ctx.attr("max_initial_timestamp_index")
        max_init = int(max_init) if max_init is not None else 50
        extra = _whisper_timestamp_rules(
            timestamp_begin=no_ts + 1, no_timestamps=no_ts, eos=eos,
            begin_index=s0, max_initial=max_init,
        )
    one_round = _make_beam_round(
        b_sz=b_sz, n_beams=n_beams, vocab=vocab, s0=s0, max_len=max_len,
        eos=eos, early_stop=early_stop, lp_pen=lp_pen,
        min_length=min_length, repetition_penalty=repetition_penalty,
        vocab_mask=vocab_mask, extra_processor=extra,
    )
    logits_bk = jnp.broadcast_to(
        logits0[:, None], (b_sz, n_beams, vocab)
    ).reshape(rows, vocab)
    state, parent2, cont = one_round(jnp.int32(s0), logits_bk, state)

    def reorder(parent2, pasts):
        flat = np.asarray(
            jnp.arange(b_sz)[:, None] * n_beams + parent2
        ).reshape(-1)
        return {
            n: (p if is_cross[n] else jnp.take(p, flat, axis=0))
            for n, p in pasts.items()
        }

    # cross caches are beam-identical (one encoder pass); only the
    # growing self caches need the parent gather
    pasts = reorder(parent2, pasts)

    t = s0
    while bool(np.asarray(cont)) and t + 1 < max_len:
        t += 1
        running_seq = state[0]
        cur_tok = np.asarray(running_seq[:, :, t - 1]).reshape(rows, 1)
        env = {dec_in[0]: jnp.asarray(cur_tok)}
        if dec_mask_name is not None:
            # unpadded encoder positions (guarded above): all-ones over
            # the cross-cache length
            env[dec_mask_name] = jnp.ones((rows, enc_len), jnp.int32)
        env.update(pasts)
        outs = _run_subgraph(ctx, decoder, env)
        for name in past_names:
            if not is_cross[name]:
                pasts[name] = jnp.asarray(
                    outs[out_by_past[name]]
                ).astype(jnp.float32)
        state, parent2, cont = one_round(
            jnp.int32(t), jnp.asarray(outs[0])[:, -1], state
        )
        pasts = reorder(parent2, pasts)

    _, _, seq, beam_scores, *_ = state
    outs = [seq[:, :n_return]]
    if ctx.num_outputs > 1:
        outs.append(beam_scores[:, :n_return])
    return outs


@ms_op("BeamSearch", "WhisperBeamSearch")
def _beam_search_op(ctx, input_ids, max_length, min_length=None,
                    num_beams=None, num_return_sequences=None,
                    length_penalty=None, repetition_penalty=None,
                    vocab_mask=None, prefix_vocab_mask=None,
                    attention_mask=None, decoder_input_ids=None,
                    logits_processor=None, *extra_inputs):
    """com.microsoft BeamSearch (GPT branch of convert_generation.py).

    ``sequences`` [B, num_return_sequences, max_length] int32 (prompt +
    continuation, EOS included, pad-filled) and optional
    ``sequences_scores`` [B, num_return_sequences] (length-penalized
    cumulative log-probs, best first). The algorithm is the
    static-shape beam search HF's generate implements (2·num_beams
    candidates per step, EOS absorption restricted to the top num_beams
    ranks, length penalty ``sum_logprobs / ((len - prompt_len) ** p)``,
    the early-stop improvement heuristic, per-batch freezing) run as ONE
    ``lax.while_loop`` over fixed max_length KV cache buffers — beam
    reordering is a gather over the flattened batch·beam cache axis, on
    device. Logits processors apply to log-softmax scores (the beam
    convention): vocab_mask, CTRL repetition penalty per beam history,
    min_length EOS suppression. ``max_length`` / ``num_beams`` /
    ``num_return_sequences`` must be static (they size device buffers).
    Scope: ``model_type=0`` (GPT), stacked [2,B,heads,seq,head] pasts;
    encoder-decoder types, ``no_repeat_ngram_size``,
    ``prefix_vocab_mask``, and padded prompts raise typed errors."""
    if any(v is not None for v in extra_inputs):
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: inputs beyond decoder_input_ids/"
            "logits_processor (cross_qk_layer_head / extra_decoding_ids / "
            "temperature) are not implemented"
        )
    if ctx.num_outputs > 2:
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: outputs beyond sequences/"
            "sequences_scores (scores / cross_qk) are not implemented"
        )
    lpv = 0
    if logits_processor is not None:
        lpv = (
            None if isinstance(logits_processor, jax.core.Tracer)
            else int(np.asarray(logits_processor).reshape(-1)[0])
        )
    model_type = int(ctx.attr("model_type", 0))
    if ctx.op_type == "WhisperBeamSearch":
        model_type = 2
    if lpv not in (0, 1) or (lpv == 1 and model_type not in (1, 2)):
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: logits_processor={lpv} "
            "(timestamp rules apply to the encoder-decoder branch only)"
        )
    if model_type not in (0, 1, 2):
        raise NotImplementedError(
            f"com.microsoft.{ctx.op_type}: model_type={model_type}"
        )
    if model_type in (1, 2):
        return _beam_search_encdec(
            ctx, input_ids, max_length, min_length=min_length,
            num_beams=num_beams, num_return_sequences=num_return_sequences,
            length_penalty=length_penalty,
            repetition_penalty=repetition_penalty, vocab_mask=vocab_mask,
            prefix_vocab_mask=prefix_vocab_mask,
            attention_mask=attention_mask,
            decoder_input_ids=decoder_input_ids,
            timestamp_rules=(lpv == 1),
        )
    if int(ctx.attr("no_repeat_ngram_size", 0)):
        raise NotImplementedError(
            "com.microsoft.BeamSearch: no_repeat_ngram_size"
        )
    if prefix_vocab_mask is not None:
        raise NotImplementedError(
            "com.microsoft.BeamSearch: prefix_vocab_mask"
        )
    eos = int(ctx.attr("eos_token_id"))
    pad = int(ctx.attr("pad_token_id"))
    early_stop = bool(int(ctx.attr("early_stopping", 0)))
    decoder = ctx.attr("decoder")
    if decoder is None:
        raise ValueError("com.microsoft.BeamSearch: missing decoder graph")
    init_decoder = ctx.attr("init_decoder") or decoder

    from jax import lax

    ids0 = jnp.asarray(input_ids).astype(jnp.int32)
    b_sz, s0 = ids0.shape
    max_len = _static_int(max_length, "BeamSearch max_length")
    n_beams = _static_int(num_beams, "BeamSearch num_beams")
    n_return = (
        _static_int(num_return_sequences, "BeamSearch num_return_sequences")
        if num_return_sequences is not None else n_beams
    )
    if n_return > n_beams:
        raise ValueError(
            "com.microsoft.BeamSearch: num_return_sequences > num_beams"
        )
    if attention_mask is not None:
        am = np.asarray(attention_mask) if not isinstance(
            attention_mask, jax.core.Tracer
        ) else None
        if am is None or not np.all(am != 0):
            raise NotImplementedError(
                "com.microsoft.BeamSearch: padded prompts"
            )
    lp_pen = (
        jnp.asarray(length_penalty).reshape(()).astype(jnp.float32)
        if length_penalty is not None else jnp.float32(1.0)
    )
    n_cand = 2 * n_beams
    top_mask = jnp.arange(n_cand) < n_beams  # EOS absorbed from top ranks

    if s0 >= max_len:
        out = jnp.broadcast_to(
            ids0[:, None, :max_len], (b_sz, n_return, max_len)
        ).astype(jnp.int32)
        outs = [out]
        if ctx.num_outputs > 1:
            outs.append(jnp.zeros((b_sz, n_return), jnp.float32))
        return outs

    (in_ids_n, in_pos_n, in_mask_n), past_names, _ = \
        _gen_subgraph_io(decoder, "com.microsoft.BeamSearch")
    init_in, init_past, _ = _gen_subgraph_io(
        init_decoder, "com.microsoft.BeamSearch init_decoder"
    )
    rows = b_sz * n_beams
    p_buf = max_len

    # ---- prefill ONCE per batch row, then replicate over the beam axis
    # (all beams share the prompt; recomputing it num_beams times would
    # be the dominant waste on long prompts)
    p_shape = _gen_past_shape(init_decoder, b_sz, "BeamSearch")
    prefill_env = {
        init_in[0]: ids0,
        init_in[1]: jnp.broadcast_to(
            jnp.arange(s0, dtype=jnp.int32)[None], (b_sz, s0)
        ),
        init_in[2]: jnp.ones((b_sz, s0), jnp.int32),
    }
    for name in init_past:
        prefill_env[name] = jnp.zeros(p_shape, jnp.float32)
    pre = _run_subgraph(ctx, init_decoder, prefill_env)
    logits0 = jnp.repeat(jnp.asarray(pre[0])[:, -1], n_beams, axis=0)
    vocab = logits0.shape[-1]

    def pad_to_buf(t):
        t = jnp.asarray(t).astype(jnp.float32)
        padding = [(0, 0)] * 5
        padding[3] = (0, p_buf - t.shape[3])
        return jnp.repeat(jnp.pad(t, padding), n_beams, axis=1)

    bufs = tuple(pad_to_buf(p) for p in pre[1:])

    state = _beam_state_init(
        ids0, b_sz=b_sz, n_beams=n_beams, s0=s0, max_len=max_len,
        pad=pad, vocab=vocab,
    )
    one_round = _make_beam_round(
        b_sz=b_sz, n_beams=n_beams, vocab=vocab, s0=s0, max_len=max_len,
        eos=eos, early_stop=early_stop, lp_pen=lp_pen,
        min_length=min_length, repetition_penalty=repetition_penalty,
        vocab_mask=vocab_mask,
    )

    state, parent2, cont = one_round(jnp.int32(s0), logits0, state)
    flat_parent = (
        jnp.arange(b_sz)[:, None] * n_beams + parent2
    ).reshape(-1)
    bufs = tuple(b[:, flat_parent] for b in bufs)

    def body(carry):
        t, cont, state, bufs = carry
        running_seq = state[0]
        cur = running_seq[:, :, :].reshape(rows, max_len)
        cur_tok = jnp.take_along_axis(
            cur, jnp.full((rows, 1), t - 1, jnp.int32), axis=1
        )
        key_mask = jnp.concatenate(
            [
                jnp.broadcast_to(
                    (jnp.arange(p_buf, dtype=jnp.int32) < t - 1)[None],
                    (rows, p_buf),
                ),
                jnp.ones((rows, 1), jnp.bool_),
            ],
            axis=1,
        ).astype(jnp.int32)
        env = {
            in_ids_n: cur_tok,
            in_pos_n: jnp.full((rows, 1), t - 1, jnp.int32),
            in_mask_n: key_mask,
        }
        env.update(dict(zip(past_names, bufs)))
        outs = _run_subgraph(ctx, decoder, env)
        new_bufs = tuple(
            lax.dynamic_update_slice_in_dim(
                b, jnp.asarray(p).astype(jnp.float32)[
                    :, :, :, p_buf:p_buf + 1
                ], t - 1, axis=3,
            )
            for b, p in zip(bufs, outs[1:])
        )
        state, parent2, cont = one_round(
            t, jnp.asarray(outs[0])[:, -1], state
        )
        flat_parent = (
            jnp.arange(b_sz)[:, None] * n_beams + parent2
        ).reshape(-1)
        new_bufs = tuple(b[:, flat_parent] for b in new_bufs)
        return t + 1, cont, state, new_bufs

    def cond(carry):
        t, cont, *_ = carry
        return jnp.logical_and(t < max_len, cont)

    final = lax.while_loop(
        cond, body, (jnp.int32(s0 + 1), cont, state, bufs)
    )
    _, _, state, _ = final
    _, _, seq, beam_scores, *_ = state
    outs = [seq[:, :n_return]]
    if ctx.num_outputs > 1:
        outs.append(beam_scores[:, :n_return])
    return outs


# ---------------------------------------------------------------------------
# Whisper word-timestamp pair: UnfoldTensor + DynamicTimeWarping — ORT's
# whisper export with word-level timestamps carries these in the
# cross-attention post-processing chain (conventions hand-read from the
# contrib schema + the openai-whisper timing code the kernels port; no
# ORT wheel here to cross-check).
# ---------------------------------------------------------------------------


@ms_op("UnfoldTensor")
def _unfold_tensor(ctx, x):
    """torch.Tensor.unfold semantics: slide a window of ``size`` with
    ``step`` along ``dim``; the window becomes a NEW TRAILING axis and
    ``dim`` shrinks to the window count."""
    dim = int(ctx.attr("dim", -1))
    size = int(ctx.attr("size"))
    step = int(ctx.attr("step", 1))
    x = jnp.asarray(x)
    if dim < 0:
        dim += x.ndim
    n_win = (x.shape[dim] - size) // step + 1
    if n_win <= 0:
        raise ValueError(
            f"com.microsoft.UnfoldTensor: size {size} exceeds dim "
            f"{x.shape[dim]}"
        )
    idx = (jnp.arange(n_win)[:, None] * step
           + jnp.arange(size)[None, :])  # [n_win, size]
    y = jnp.take(x, idx, axis=dim)  # dim -> (n_win, size) in place
    # move the window axis to the end (torch.unfold layout)
    return [jnp.moveaxis(y, dim + 1, -1)]


@ms_op("DynamicTimeWarping")
def _dynamic_time_warping(ctx, x):
    """Optimal monotone alignment path of a 2-D cost matrix — the
    openai-whisper ``dtw`` routine ORT ships for word-level timestamps
    (diag/up/left moves; on ties the reference's strict comparisons
    fall through to the LEFT move — ported verbatim, quirks included). Output [2, path_len]
    int32 (row indices; column indices), path length data-dependent —
    so the op needs a concrete input (a traced call raises; whisper
    timestamp extraction runs it on host-side attention maps)."""
    if isinstance(x, jax.core.Tracer):
        raise NotImplementedError(
            "com.microsoft.DynamicTimeWarping: data-dependent output "
            "length needs a concrete input (call without jax.jit)"
        )
    c = np.asarray(x, dtype=np.float64)
    if c.ndim == 3 and c.shape[0] == 1:
        c = c[0]
    if c.ndim != 2:
        raise ValueError(
            f"com.microsoft.DynamicTimeWarping: expected a 2-D cost "
            f"matrix, got rank {c.ndim}"
        )
    n, m = c.shape
    cost = np.full((n + 1, m + 1), np.inf)
    trace = np.full((n + 1, m + 1), -1, np.int8)
    cost[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            c0 = cost[i - 1, j - 1]
            c1 = cost[i - 1, j]
            c2 = cost[i, j - 1]
            # the reference's exact strict-comparison chain: ties fall
            # through to the left move (t=2), even when c2 is larger
            if c0 < c1 and c0 < c2:
                t, best = 0, c0
            elif c1 < c0 and c1 < c2:
                t, best = 1, c1
            else:
                t, best = 2, c2
            cost[i, j] = c[i - 1, j - 1] + best
            trace[i, j] = t
    i, j = n, m
    path_i, path_j = [], []
    while i > 0 and j > 0:
        path_i.append(i - 1)
        path_j.append(j - 1)
        t = trace[i, j]
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return [np.asarray([path_i[::-1], path_j[::-1]], np.int32)]
