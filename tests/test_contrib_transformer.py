"""Transformer / diffusion com.microsoft contrib ops.

onnxruntime's transformer optimizer rewrites BERT-family encoders into
EmbedLayerNormalization + Attention + SkipLayerNormalization chains,
cross/self-attention with separate Q/K/V into MultiHeadAttention, llama
exports into GroupQueryAttention + RotaryEmbedding, and stable-diffusion
UNets into GroupNorm / SkipGroupNorm / BiasSplitGelu. The reference
consumes such files transparently because its engine IS onnxruntime
(reference: src/classifier.rs:348-350). These tests hand-build such
graphs through the wire codec and assert parity against numpy/torch
oracles (no ORT wheel exists in this environment; the implemented
conventions are documented per-op in compiler/ops_contrib.py).
"""

from __future__ import annotations

import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P

from test_contrib_ops import _model, _run, _tensor, _vi  # noqa: F401

ATOL = 2e-4
MS = "com.microsoft"


def _rng(seed):
    return np.random.default_rng(seed)


def _softmax(x, axis=-1):
    x = x - x.max(axis=axis, keepdims=True)
    e = np.exp(x)
    return e / e.sum(axis=axis, keepdims=True)


def _sdpa_oracle(q, k, v, *, scale=None, keep=None, bias=None,
                 causal=False, past_len=0, mask_filter=-10000.0,
                 hard_mask=None, softcap=0.0):
    """NumPy attention over [B,N,S,h]: QK*scale (+mask_filter where not
    keep) (+bias) (+causal at global positions) -> softmax -> @V."""
    b, n, s, h = q.shape
    t = k.shape[2]
    if scale is None:
        scale = 1.0 / np.sqrt(h)
    logits = np.einsum("bnsh,bnth->bnst", q, k).astype(np.float64) * scale
    if keep is not None:
        logits = np.where(keep, logits, logits + mask_filter)
    if hard_mask is not None:
        logits = np.where(hard_mask, logits, -np.inf)
    if bias is not None:
        logits = logits + bias
    if causal:
        pos = past_len + np.arange(s)[:, None]
        cmask = np.arange(t)[None, :] <= pos
        logits = np.where(cmask[None, None], logits, logits + mask_filter)
    if softcap > 0.0:
        logits = softcap * np.tanh(logits / softcap)
    probs = _softmax(logits, axis=-1)
    return np.einsum("bnst,bnth->bnsh", probs, v).astype(np.float32)


def _split_heads(x, n):
    b, s, h = x.shape
    return x.reshape(b, s, n, h // n).transpose(0, 2, 1, 3)


def _merge(y):
    b, n, s, h = y.shape
    return y.transpose(0, 2, 1, 3).reshape(b, s, n * h)


# ---------------------------------------------------------------------------
# Attention with KV cache (past / present)
# ---------------------------------------------------------------------------


def test_attention_past_present_causal():
    """GPT-2-style packed-QKV Attention decode step: past [2,B,N,Sp,h],
    unidirectional, present output."""
    r = _rng(0)
    b, s, sp, n, h = 2, 3, 5, 2, 4
    hid = n * h
    x = r.standard_normal((b, s, hid), dtype=np.float32)
    w = (r.standard_normal((hid, 3 * hid)) * 0.3).astype(np.float32)
    bias = (r.standard_normal(3 * hid) * 0.1).astype(np.float32)
    past = r.standard_normal((2, b, n, sp, h), dtype=np.float32)

    node = P.make_node(
        "Attention", ["x", "w", "bias", "", "past"], ["y", "present"],
        domain=MS, num_heads=n, unidirectional=1,
    )
    m = _model(
        [node],
        [_vi("x", x.shape), _vi("past", past.shape)],
        [_vi("y", (b, s, hid)), _vi("present", (2, b, n, sp + s, h))],
        [_tensor("w", w), _tensor("bias", bias)],
    )
    y, present = _run(m, x, past)

    qkv = x @ w + bias
    q = _split_heads(qkv[..., :hid], n)
    k = _split_heads(qkv[..., hid:2 * hid], n)
    v = _split_heads(qkv[..., 2 * hid:], n)
    k_all = np.concatenate([past[0], k], axis=2)
    v_all = np.concatenate([past[1], v], axis=2)
    want = _merge(_sdpa_oracle(q, k_all, v_all, causal=True, past_len=sp))
    np.testing.assert_allclose(y, want, atol=ATOL)
    np.testing.assert_allclose(present[0], k_all, atol=ATOL)
    np.testing.assert_allclose(present[1], v_all, atol=ATOL)


def test_attention_past_with_length_mask():
    """[B] mask_index lengths count over the TOTAL (past+current) keys."""
    r = _rng(1)
    b, s, sp, n, h = 2, 2, 4, 2, 4
    hid = n * h
    x = r.standard_normal((b, s, hid), dtype=np.float32)
    w = (r.standard_normal((hid, 3 * hid)) * 0.3).astype(np.float32)
    past = r.standard_normal((2, b, n, sp, h), dtype=np.float32)
    lens = np.array([sp + s, sp + 1], dtype=np.int32)

    node = P.make_node(
        "Attention", ["x", "w", "", "mask", "past"], ["y"],
        domain=MS, num_heads=n,
    )
    m = _model(
        [node],
        [_vi("x", x.shape), _vi("mask", lens.shape, P.DataType.INT32),
         _vi("past", past.shape)],
        [_vi("y", (b, s, hid))],
        [_tensor("w", w)],
    )
    (y,) = _run(m, x, lens, past)

    qkv = x @ w
    q = _split_heads(qkv[..., :hid], n)
    k = np.concatenate([past[0], _split_heads(qkv[..., hid:2 * hid], n)], 2)
    v = np.concatenate([past[1], _split_heads(qkv[..., 2 * hid:], n)], 2)
    keep = (np.arange(sp + s)[None, :] < lens[:, None])[:, None, None, :]
    want = _merge(_sdpa_oracle(q, k, v, keep=keep))
    np.testing.assert_allclose(y, want, atol=ATOL)


# ---------------------------------------------------------------------------
# EmbedLayerNormalization
# ---------------------------------------------------------------------------


def _ln(x, g, b, eps):
    mean = x.mean(-1, keepdims=True)
    var = x.var(-1, keepdims=True)
    return (x - mean) / np.sqrt(var + eps) * g + b


def test_embed_layer_normalization_full():
    r = _rng(2)
    b, s, hdim, vocab, maxpos = 2, 5, 8, 20, 12
    ids = r.integers(0, vocab, (b, s)).astype(np.int32)
    seg = r.integers(0, 2, (b, s)).astype(np.int32)
    mask = np.array([[1, 1, 1, 0, 0], [1, 1, 1, 1, 1]], dtype=np.int32)
    we = r.standard_normal((vocab, hdim), dtype=np.float32)
    pe = r.standard_normal((maxpos, hdim), dtype=np.float32)
    se = r.standard_normal((2, hdim), dtype=np.float32)
    g = r.standard_normal(hdim).astype(np.float32)
    bb = r.standard_normal(hdim).astype(np.float32)

    node = P.make_node(
        "EmbedLayerNormalization",
        ["ids", "seg", "we", "pe", "se", "g", "b", "mask"],
        ["y", "mask_index", "emb_sum"],
        domain=MS, epsilon=1e-12,
    )
    m = _model(
        [node],
        [_vi("ids", ids.shape, P.DataType.INT32),
         _vi("seg", seg.shape, P.DataType.INT32),
         _vi("mask", mask.shape, P.DataType.INT32)],
        [_vi("y", (b, s, hdim)), _vi("mask_index", (b,), P.DataType.INT32),
         _vi("emb_sum", (b, s, hdim))],
        [_tensor("we", we), _tensor("pe", pe), _tensor("se", se),
         _tensor("g", g), _tensor("b", bb)],
    )
    y, mask_index, emb_sum = _run(m, ids, seg, mask)

    want_sum = we[ids] + pe[np.arange(s)][None] + se[seg]
    np.testing.assert_allclose(emb_sum, want_sum, atol=ATOL)
    np.testing.assert_allclose(y, _ln(want_sum, g, bb, 1e-12), atol=ATOL)
    np.testing.assert_array_equal(mask_index, mask.sum(1))


def test_embed_layer_normalization_minimal_and_position_ids():
    """No segment table, no mask (mask_index -> zeros), broadcast [1,S]
    position_ids."""
    r = _rng(3)
    b, s, hdim, vocab = 2, 4, 6, 10
    ids = r.integers(0, vocab, (b, s)).astype(np.int32)
    pos_ids = np.array([[3, 2, 1, 0]], dtype=np.int32)
    we = r.standard_normal((vocab, hdim), dtype=np.float32)
    pe = r.standard_normal((8, hdim), dtype=np.float32)
    g = r.standard_normal(hdim).astype(np.float32)
    bb = r.standard_normal(hdim).astype(np.float32)

    node = P.make_node(
        "EmbedLayerNormalization",
        ["ids", "", "we", "pe", "", "g", "b", "", "pos"],
        ["y", "mask_index"],
        domain=MS,
    )
    m = _model(
        [node],
        [_vi("ids", ids.shape, P.DataType.INT32),
         _vi("pos", pos_ids.shape, P.DataType.INT32)],
        [_vi("y", (b, s, hdim)), _vi("mask_index", (b,), P.DataType.INT32)],
        [_tensor("we", we), _tensor("pe", pe), _tensor("g", g),
         _tensor("b", bb)],
    )
    y, mask_index = _run(m, ids, pos_ids)

    want_sum = we[ids] + pe[pos_ids[0]][None]
    np.testing.assert_allclose(y, _ln(want_sum, g, bb, 1e-12), atol=ATOL)
    np.testing.assert_array_equal(mask_index, np.zeros(b, np.int32))


# ---------------------------------------------------------------------------
# MultiHeadAttention
# ---------------------------------------------------------------------------


def test_mha_separate_qkv_bias_and_key_mask():
    r = _rng(4)
    b, sq, skv, n, h = 2, 3, 5, 2, 4
    hid = n * h
    q = r.standard_normal((b, sq, hid), dtype=np.float32)
    k = r.standard_normal((b, skv, hid), dtype=np.float32)
    v = r.standard_normal((b, skv, hid), dtype=np.float32)
    bias = (r.standard_normal(3 * hid) * 0.2).astype(np.float32)
    mask = np.array([[1, 1, 1, 1, 0], [1, 1, 0, 0, 0]], dtype=np.int32)

    node = P.make_node(
        "MultiHeadAttention", ["q", "k", "v", "bias", "mask"], ["y"],
        domain=MS, num_heads=n, scale=0.17,
    )
    m = _model(
        [node],
        [_vi("q", q.shape), _vi("k", k.shape), _vi("v", v.shape),
         _vi("mask", mask.shape, P.DataType.INT32)],
        [_vi("y", (b, sq, hid))],
        [_tensor("bias", bias)],
    )
    (y,) = _run(m, q, k, v, mask)

    qh = _split_heads(q + bias[:hid], n)
    kh = _split_heads(k + bias[hid:2 * hid], n)
    vh = _split_heads(v + bias[2 * hid:], n)
    keep = (mask != 0)[:, None, None, :]
    want = _merge(_sdpa_oracle(qh, kh, vh, scale=0.17, keep=keep))
    np.testing.assert_allclose(y, want, atol=ATOL)


def test_mha_packed_qkv():
    r = _rng(5)
    b, s, n, h = 2, 4, 3, 4
    packed = r.standard_normal((b, s, n, 3, h), dtype=np.float32)
    node = P.make_node("MultiHeadAttention", ["qkv"], ["y"],
                       domain=MS, num_heads=n)
    m = _model([node], [_vi("qkv", packed.shape)],
               [_vi("y", (b, s, n * h))], [])
    (y,) = _run(m, packed)

    q = packed[:, :, :, 0].transpose(0, 2, 1, 3)
    k = packed[:, :, :, 1].transpose(0, 2, 1, 3)
    v = packed[:, :, :, 2].transpose(0, 2, 1, 3)
    np.testing.assert_allclose(y, _merge(_sdpa_oracle(q, k, v)), atol=ATOL)


def test_mha_packed_kv_and_presplit_kv():
    r = _rng(6)
    b, sq, skv, n, h = 2, 2, 6, 2, 4
    hid = n * h
    q = r.standard_normal((b, sq, hid), dtype=np.float32)
    kv = r.standard_normal((b, skv, n, 2, h), dtype=np.float32)

    node = P.make_node("MultiHeadAttention", ["q", "kv"], ["y"],
                       domain=MS, num_heads=n)
    m = _model([node], [_vi("q", q.shape), _vi("kv", kv.shape)],
               [_vi("y", (b, sq, hid))], [])
    (y,) = _run(m, q, kv)

    qh = _split_heads(q, n)
    kh = kv[:, :, :, 0].transpose(0, 2, 1, 3)
    vh = kv[:, :, :, 1].transpose(0, 2, 1, 3)
    want = _merge(_sdpa_oracle(qh, kh, vh))
    np.testing.assert_allclose(y, want, atol=ATOL)

    # pre-split 4-D K/V (cross-attention with cached keys)
    k4 = np.ascontiguousarray(kh)
    v4 = np.ascontiguousarray(vh)
    node = P.make_node("MultiHeadAttention", ["q", "k", "v"], ["y"],
                       domain=MS, num_heads=n)
    m = _model([node], [_vi("q", q.shape), _vi("k", k4.shape),
                        _vi("v", v4.shape)],
               [_vi("y", (b, sq, hid))], [])
    (y2,) = _run(m, q, k4, v4)
    np.testing.assert_allclose(y2, want, atol=ATOL)


def test_mha_past_present_causal():
    r = _rng(7)
    b, s, sp, n, h = 1, 2, 3, 2, 4
    hid = n * h
    q = r.standard_normal((b, s, hid), dtype=np.float32)
    k = r.standard_normal((b, s, hid), dtype=np.float32)
    v = r.standard_normal((b, s, hid), dtype=np.float32)
    pk = r.standard_normal((b, n, sp, h), dtype=np.float32)
    pv = r.standard_normal((b, n, sp, h), dtype=np.float32)

    node = P.make_node(
        "MultiHeadAttention",
        ["q", "k", "v", "", "", "", "pk", "pv"],
        ["y", "present_k", "present_v"],
        domain=MS, num_heads=n, unidirectional=1,
    )
    m = _model(
        [node],
        [_vi("q", q.shape), _vi("k", k.shape), _vi("v", v.shape),
         _vi("pk", pk.shape), _vi("pv", pv.shape)],
        [_vi("y", (b, s, hid)), _vi("present_k", (b, n, sp + s, h)),
         _vi("present_v", (b, n, sp + s, h))],
        [],
    )
    y, present_k, present_v = _run(m, q, k, v, pk, pv)

    k_all = np.concatenate([pk, _split_heads(k, n)], axis=2)
    v_all = np.concatenate([pv, _split_heads(v, n)], axis=2)
    want = _merge(_sdpa_oracle(_split_heads(q, n), k_all, v_all,
                               causal=True, past_len=sp))
    np.testing.assert_allclose(y, want, atol=ATOL)
    np.testing.assert_allclose(present_k, k_all, atol=ATOL)
    np.testing.assert_allclose(present_v, v_all, atol=ATOL)


# ---------------------------------------------------------------------------
# contrib RotaryEmbedding
# ---------------------------------------------------------------------------


def _rotary_oracle(x4, pos, cos_cache, sin_cache, interleaved):
    """x4 [B,N,S,h]; pos [B,S]; caches [max, rd/2]."""
    cos = cos_cache[pos][:, None]
    sin = sin_cache[pos][:, None]
    rd = 2 * cos_cache.shape[-1]
    rot, tail = x4[..., :rd], x4[..., rd:]
    if interleaved:
        x1, x2 = rot[..., 0::2], rot[..., 1::2]
    else:
        x1, x2 = rot[..., : rd // 2], rot[..., rd // 2:]
    r1 = x1 * cos - x2 * sin
    r2 = x1 * sin + x2 * cos
    if interleaved:
        out = np.stack([r1, r2], axis=-1).reshape(rot.shape)
    else:
        out = np.concatenate([r1, r2], axis=-1)
    return np.concatenate([out, tail], axis=-1) if rd < x4.shape[-1] else out


def test_ms_rotary_embedding_3d_with_position_ids():
    r = _rng(8)
    b, s, n, h = 2, 4, 2, 6
    x = r.standard_normal((b, s, n * h), dtype=np.float32)
    cos = r.standard_normal((10, h // 2)).astype(np.float32)
    sin = r.standard_normal((10, h // 2)).astype(np.float32)
    pos = r.integers(0, 10, (b, s)).astype(np.int64)

    node = P.make_node("RotaryEmbedding", ["x", "pos", "cos", "sin"], ["y"],
                       domain=MS, num_heads=n, interleaved=1)
    m = _model([node],
               [_vi("x", x.shape), _vi("pos", pos.shape, P.DataType.INT64)],
               [_vi("y", x.shape)],
               [_tensor("cos", cos), _tensor("sin", sin)])
    (y,) = _run(m, x, pos)

    x4 = _split_heads(x, n)
    want = _merge(_rotary_oracle(x4, pos, cos, sin, interleaved=1))
    np.testing.assert_allclose(y, want, atol=ATOL)


def test_ms_rotary_embedding_scalar_offset():
    """position_ids as a single-element offset tensor: pos = off+arange(S)
    (the decode-step idiom)."""
    r = _rng(9)
    b, n, s, h = 1, 2, 3, 4
    x = r.standard_normal((b, n, s, h), dtype=np.float32)
    cos = r.standard_normal((12, h // 2)).astype(np.float32)
    sin = r.standard_normal((12, h // 2)).astype(np.float32)
    off = np.array([5], dtype=np.int64)

    node = P.make_node("RotaryEmbedding", ["x", "pos", "cos", "sin"], ["y"],
                       domain=MS)
    m = _model([node],
               [_vi("x", x.shape), _vi("pos", off.shape, P.DataType.INT64)],
               [_vi("y", x.shape)],
               [_tensor("cos", cos), _tensor("sin", sin)])
    (y,) = _run(m, x, off)

    pos = np.broadcast_to(5 + np.arange(s), (b, s))
    want = _rotary_oracle(x, pos, cos, sin, interleaved=0)
    np.testing.assert_allclose(y, want, atol=ATOL)


# ---------------------------------------------------------------------------
# GroupQueryAttention
# ---------------------------------------------------------------------------


def _gqa_oracle(q, k, v, lens, *, sp=0, scale=None, window=0, softcap=0.0):
    """q [B,N,S,h]; k/v [B,kvN,T,h] post-concat; lens [B] valid total.

    Mirrors the documented left-aligned convention: prompt (sp=0) puts
    token i at position i with keys j <= i, j < len; continuation keeps
    the valid past (slots 0..len-S-1) plus the causal current chunk at
    static slots sp..sp+S-1 (positions len-S+i)."""
    b, nq, s, h = q.shape
    nkv, t = k.shape[1], k.shape[2]
    rep = nq // nkv
    k = np.repeat(k, rep, axis=1)
    v = np.repeat(v, rep, axis=1)
    if scale is None:
        scale = 1.0 / np.sqrt(h)
    logits = np.einsum("bnsh,bnth->bnst", q, k).astype(np.float64) * scale
    jj = np.arange(t)[None, None, None, :]
    ii = np.arange(s)[None, None, :, None]
    lens_b = lens[:, None, None, None]
    if sp == 0:
        keep = (jj <= ii) & (jj < lens_b)
        q_pos, k_pos = np.broadcast_to(ii, keep.shape), jj
    else:
        keep = (jj < np.maximum(lens_b - s, 0)) | (
            (jj >= sp) & ((jj - sp) <= ii)
        )
        q_pos = lens_b - s + ii
        k_pos = np.where(jj >= sp, lens_b - s + (jj - sp), jj)
    if window > 0:
        keep = keep & (k_pos > q_pos - window)
    logits = np.where(keep, logits, -np.inf)
    if softcap > 0.0:
        logits = softcap * np.tanh(logits / softcap)
    probs = _softmax(logits, axis=-1)
    return np.einsum("bnst,bnth->bnsh", probs, v).astype(np.float32)


def test_gqa_prompt_grouped_heads():
    r = _rng(10)
    b, s, n, kvn, h = 2, 5, 4, 2, 4
    q = r.standard_normal((b, s, n * h), dtype=np.float32)
    k = r.standard_normal((b, s, kvn * h), dtype=np.float32)
    v = r.standard_normal((b, s, kvn * h), dtype=np.float32)
    lens = np.array([s, 3], dtype=np.int32)  # row 1 right-padded

    node = P.make_node(
        "GroupQueryAttention",
        ["q", "k", "v", "", "", "seqlens", "total"],
        ["y", "present_k", "present_v"],
        domain=MS, num_heads=n, kv_num_heads=kvn,
    )
    m = _model(
        [node],
        [_vi("q", q.shape), _vi("k", k.shape), _vi("v", v.shape),
         _vi("seqlens", (b,), P.DataType.INT32)],
        [_vi("y", (b, s, n * h)), _vi("present_k", (b, kvn, s, h)),
         _vi("present_v", (b, kvn, s, h))],
        [_tensor("total", np.array([s], np.int32))],
    )
    y, pk, pv = _run(m, q, k, v, (lens - 1))

    kh = _split_heads(k, kvn)
    vh = _split_heads(v, kvn)
    want = _merge(_gqa_oracle(_split_heads(q, n), kh, vh, lens))
    got = np.asarray(y)
    # Compare only the valid query rows per batch (padded rows carry
    # unspecified values in ORT too).
    for bi in range(b):
        np.testing.assert_allclose(
            got[bi, :lens[bi]], want[bi, :lens[bi]], atol=ATOL
        )
    np.testing.assert_allclose(pk, kh, atol=ATOL)
    np.testing.assert_allclose(pv, vh, atol=ATOL)


def test_gqa_decode_step_with_rotary_and_past():
    r = _rng(11)
    b, sp, n, kvn, h = 2, 6, 4, 2, 8
    s = 1
    q = r.standard_normal((b, s, n * h), dtype=np.float32)
    k = r.standard_normal((b, s, kvn * h), dtype=np.float32)
    v = r.standard_normal((b, s, kvn * h), dtype=np.float32)
    pk = r.standard_normal((b, kvn, sp, h), dtype=np.float32)
    pv = r.standard_normal((b, kvn, sp, h), dtype=np.float32)
    lens = np.array([sp + 1, sp - 1], dtype=np.int32)  # row 1 shorter
    maxpos = 16
    inv = 1.0 / (10000.0 ** (np.arange(h // 2) / (h // 2)))
    ang = np.arange(maxpos)[:, None] * inv[None]
    cos, sin = np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    node = P.make_node(
        "GroupQueryAttention",
        ["q", "k", "v", "pk", "pv", "seqlens", "total", "cos", "sin"],
        ["y", "present_k", "present_v"],
        domain=MS, num_heads=n, kv_num_heads=kvn, do_rotary=1,
    )
    m = _model(
        [node],
        [_vi("q", q.shape), _vi("k", k.shape), _vi("v", v.shape),
         _vi("pk", pk.shape), _vi("pv", pv.shape),
         _vi("seqlens", (b,), P.DataType.INT32)],
        [_vi("y", (b, s, n * h)), _vi("present_k", (b, kvn, sp + s, h)),
         _vi("present_v", (b, kvn, sp + s, h))],
        [_tensor("total", np.array([sp + s], np.int32)),
         _tensor("cos", cos), _tensor("sin", sin)],
    )
    y, got_pk, got_pv = _run(m, q, k, v, pk, pv, (lens - 1))

    pos = np.maximum(lens[:, None] - s + np.arange(s)[None, :], 0)
    qr = _rotary_oracle(_split_heads(q, n), pos, cos, sin, 0)
    kr = _rotary_oracle(_split_heads(k, kvn), pos, cos, sin, 0)
    k_all = np.concatenate([pk, kr], axis=2)
    v_all = np.concatenate([pv, _split_heads(v, kvn)], axis=2)
    want = _merge(_gqa_oracle(qr, k_all, v_all, lens, sp=sp))
    np.testing.assert_allclose(y, want, atol=ATOL)
    np.testing.assert_allclose(got_pk, k_all, atol=ATOL)
    np.testing.assert_allclose(got_pv, v_all, atol=ATOL)


def test_gqa_sliding_window_and_softcap():
    r = _rng(12)
    b, s, n, h = 1, 8, 2, 4
    q = r.standard_normal((b, s, n * h), dtype=np.float32)
    k = r.standard_normal((b, s, n * h), dtype=np.float32)
    v = r.standard_normal((b, s, n * h), dtype=np.float32)
    lens = np.array([s], dtype=np.int32)

    node = P.make_node(
        "GroupQueryAttention",
        ["q", "k", "v", "", "", "seqlens", "total"],
        ["y"],
        domain=MS, num_heads=n, kv_num_heads=n,
        local_window_size=3, softcap=5.0,
    )
    m = _model(
        [node],
        [_vi("q", q.shape), _vi("k", k.shape), _vi("v", v.shape),
         _vi("seqlens", (1,), P.DataType.INT32)],
        [_vi("y", (b, s, n * h))],
        [_tensor("total", np.array([s], np.int32))],
    )
    (y,) = _run(m, q, k, v, (lens - 1))

    want = _merge(_gqa_oracle(_split_heads(q, n), _split_heads(k, n),
                              _split_heads(v, n), lens, window=3,
                              softcap=5.0))
    np.testing.assert_allclose(y, want, atol=ATOL)


# ---------------------------------------------------------------------------
# GroupNorm / SkipGroupNorm / BiasSplitGelu (stable-diffusion set)
# ---------------------------------------------------------------------------


def _torch_group_norm(x_nchw, groups, g, b, eps, swish):
    import torch

    y = torch.nn.functional.group_norm(
        torch.from_numpy(x_nchw), groups,
        torch.from_numpy(g), torch.from_numpy(b), eps,
    )
    if swish:
        y = y * torch.sigmoid(y)
    return y.numpy()


def test_group_norm_channels_last_swish():
    r = _rng(13)
    b, hh, ww, c = 2, 4, 5, 8
    x = r.standard_normal((b, hh, ww, c), dtype=np.float32)
    g = r.standard_normal(c).astype(np.float32)
    bb = r.standard_normal(c).astype(np.float32)

    node = P.make_node("GroupNorm", ["x", "g", "b"], ["y"], domain=MS,
                       groups=4, epsilon=1e-5, channels_last=1, activation=1)
    m = _model([node], [_vi("x", x.shape)], [_vi("y", x.shape)],
               [_tensor("g", g), _tensor("b", bb)])
    (y,) = _run(m, x)

    want = _torch_group_norm(
        x.transpose(0, 3, 1, 2), 4, g, bb, 1e-5, swish=True
    ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, want, atol=ATOL)


def test_group_norm_channels_first():
    r = _rng(14)
    b, c, hh, ww = 2, 6, 3, 4
    x = r.standard_normal((b, c, hh, ww), dtype=np.float32)
    g = r.standard_normal(c).astype(np.float32)
    bb = r.standard_normal(c).astype(np.float32)

    node = P.make_node("GroupNorm", ["x", "g", "b"], ["y"], domain=MS,
                       groups=3, epsilon=1e-5, channels_last=0, activation=0)
    m = _model([node], [_vi("x", x.shape)], [_vi("y", x.shape)],
               [_tensor("g", g), _tensor("b", bb)])
    (y,) = _run(m, x)
    want = _torch_group_norm(x, 3, g, bb, 1e-5, swish=False)
    np.testing.assert_allclose(y, want, atol=ATOL)


def test_skip_group_norm_broadcast_skip_and_sum_output():
    r = _rng(15)
    b, hh, ww, c = 2, 3, 3, 4
    x = r.standard_normal((b, hh, ww, c), dtype=np.float32)
    skip = r.standard_normal((b, c), dtype=np.float32)  # [B,C] broadcast
    bias = r.standard_normal(c).astype(np.float32)
    g = r.standard_normal(c).astype(np.float32)
    bb = r.standard_normal(c).astype(np.float32)

    node = P.make_node(
        "SkipGroupNorm", ["x", "g", "b", "skip", "bias"], ["y", "s"],
        domain=MS, groups=2, epsilon=1e-5, activation=0,
    )
    m = _model([node], [_vi("x", x.shape), _vi("skip", skip.shape)],
               [_vi("y", x.shape), _vi("s", x.shape)],
               [_tensor("g", g), _tensor("b", bb), _tensor("bias", bias)])
    y, s = _run(m, x, skip)

    want_s = x + skip[:, None, None, :] + bias
    np.testing.assert_allclose(s, want_s, atol=ATOL)
    want_y = _torch_group_norm(
        want_s.transpose(0, 3, 1, 2), 2, g, bb, 1e-5, swish=False
    ).transpose(0, 2, 3, 1)
    np.testing.assert_allclose(y, want_y, atol=ATOL)


def test_bias_split_gelu():
    import torch

    r = _rng(16)
    b, s, d = 2, 3, 16
    x = r.standard_normal((b, s, d), dtype=np.float32)
    bias = r.standard_normal(d).astype(np.float32)

    node = P.make_node("BiasSplitGelu", ["x", "bias"], ["y"], domain=MS)
    m = _model([node], [_vi("x", x.shape)], [_vi("y", (b, s, d // 2))],
               [_tensor("bias", bias)])
    (y,) = _run(m, x)

    t = torch.from_numpy(x + bias)
    a, gpart = t.chunk(2, dim=-1)
    want = (a * torch.nn.functional.gelu(gpart)).numpy()
    np.testing.assert_allclose(y, want, atol=ATOL)


# ---------------------------------------------------------------------------
# registry / rejection
# ---------------------------------------------------------------------------


def test_new_contrib_ops_registered():
    from birdnet_tpu.compiler.ops import supported_contrib_ops

    names = supported_contrib_ops()
    for op_name in ("EmbedLayerNormalization", "MultiHeadAttention",
                    "RotaryEmbedding", "GroupQueryAttention", "GroupNorm",
                    "SkipGroupNorm", "BiasSplitGelu"):
        assert f"{MS}.{op_name}" in names


def test_attention_share_buffer_rejects():
    r = _rng(17)
    b, s, n, h = 1, 2, 2, 4
    hid = n * h
    x = r.standard_normal((b, s, hid), dtype=np.float32)
    w = r.standard_normal((hid, 3 * hid)).astype(np.float32)
    node = P.make_node("Attention", ["x", "w"], ["y"], domain=MS,
                       num_heads=n, past_present_share_buffer=1)
    m = _model([node], [_vi("x", x.shape)], [_vi("y", (b, s, hid))],
               [_tensor("w", w)])
    with pytest.raises(Exception, match="share_buffer"):
        _run(m, x)


# ---------------------------------------------------------------------------
# MatMulNBits / GatherBlockQuantized (onnxruntime-genai LLM exports)
# ---------------------------------------------------------------------------


def _pack_nibbles(vals):
    """Pack 4-bit ints low-nibble-first along the last axis."""
    v = np.asarray(vals, np.uint8) & 0x0F
    if v.shape[-1] % 2:
        v = np.concatenate([v, np.zeros(v.shape[:-1] + (1,), np.uint8)], -1)
    return (v[..., 0::2] | (v[..., 1::2] << 4)).astype(np.uint8)


def test_matmul_nbits_4bit_packed_zp_bias():
    r = _rng(20)
    n_dim, k_dim, bs = 6, 16, 8
    nb = k_dim // bs
    q = r.integers(0, 16, (n_dim, k_dim)).astype(np.int32)
    scales = (r.random((n_dim, nb)) * 0.2 + 0.01).astype(np.float32)
    zp = r.integers(0, 16, (n_dim, nb)).astype(np.int32)
    a = r.standard_normal((2, 3, k_dim), dtype=np.float32)
    bias = r.standard_normal(n_dim).astype(np.float32)

    b_packed = _pack_nibbles(q.reshape(n_dim, nb, bs)).reshape(n_dim, nb, -1)
    zp_packed = _pack_nibbles(zp)  # [N, ceil(nb/2)]

    node = P.make_node(
        "MatMulNBits", ["a", "b", "scales", "zp", "", "bias"], ["y"],
        domain=MS, K=k_dim, N=n_dim, bits=4, block_size=bs,
    )
    m = _model(
        [node], [_vi("a", a.shape)], [_vi("y", (2, 3, n_dim))],
        [_tensor("b", b_packed), _tensor("scales", scales),
         _tensor("zp", zp_packed), _tensor("bias", bias)],
    )
    (y,) = _run(m, a)

    w = (q - np.repeat(zp, bs, 1)) * np.repeat(scales, bs, 1)
    want = a @ w.T + bias
    np.testing.assert_allclose(y, want, atol=ATOL)


def test_matmul_nbits_8bit_float_zp_and_tail_block():
    """bits=8, float zero points, K not a multiple of block_size (the
    tail block's padding elements are ignored)."""
    r = _rng(21)
    n_dim, k_dim, bs = 4, 10, 4
    nb = (k_dim + bs - 1) // bs  # 3 blocks, last holds 2 real elements
    q = r.integers(0, 256, (n_dim, nb * bs)).astype(np.int32)
    scales = (r.random((n_dim, nb)) * 0.1 + 0.01).astype(np.float32)
    zpf = (r.random((n_dim, nb)) * 8).astype(np.float32)
    a = r.standard_normal((3, k_dim), dtype=np.float32)

    node = P.make_node(
        "MatMulNBits", ["a", "b", "scales", "zp"], ["y"],
        domain=MS, K=k_dim, N=n_dim, bits=8, block_size=bs,
    )
    m = _model(
        [node], [_vi("a", a.shape)], [_vi("y", (3, n_dim))],
        [_tensor("b", q.astype(np.uint8).reshape(n_dim, nb, bs)),
         _tensor("scales", scales), _tensor("zp", zpf)],
    )
    (y,) = _run(m, a)

    w = (q[:, :k_dim] - np.repeat(zpf, bs, 1)[:, :k_dim]) \
        * np.repeat(scales, bs, 1)[:, :k_dim]
    np.testing.assert_allclose(y, a @ w.T, atol=ATOL)


def test_matmul_nbits_g_idx_act_order():
    r = _rng(22)
    n_dim, k_dim, bs = 3, 8, 4
    nb = k_dim // bs
    q = r.integers(0, 16, (n_dim, k_dim)).astype(np.int32)
    scales = (r.random((n_dim, nb)) * 0.2 + 0.01).astype(np.float32)
    a = r.standard_normal((2, k_dim), dtype=np.float32)
    g_idx = r.integers(0, nb, k_dim).astype(np.int32)

    node = P.make_node(
        "MatMulNBits", ["a", "b", "scales", "", "g_idx"], ["y"],
        domain=MS, K=k_dim, N=n_dim, bits=4, block_size=bs,
    )
    m = _model(
        [node], [_vi("a", a.shape)], [_vi("y", (2, n_dim))],
        [_tensor("b", _pack_nibbles(q.reshape(n_dim, nb, bs))
                 .reshape(n_dim, nb, -1)),
         _tensor("scales", scales), _tensor("g_idx", g_idx)],
    )
    (y,) = _run(m, a)

    w = (q - 8.0) * scales[:, g_idx]
    np.testing.assert_allclose(y, a @ w.T, atol=ATOL)


def test_gather_block_quantized_int4_table():
    import ml_dtypes

    r = _rng(23)
    vocab, hdim, bs = 12, 8, 4
    q = r.integers(-8, 8, (vocab, hdim)).astype(np.int32)
    scales = (r.random((vocab, hdim // bs)) * 0.3 + 0.02).astype(np.float32)
    ids = r.integers(0, vocab, (2, 3)).astype(np.int64)

    packed = bytes(_pack_nibbles(q.reshape(-1)).tolist())
    data_t = P.TensorProto(name="data", data_type=P.DataType.INT4,
                           dims=[vocab, hdim], raw_data=packed)

    node = P.make_node(
        "GatherBlockQuantized", ["data", "ids", "scales"], ["y"],
        domain=MS, gather_axis=0, quantize_axis=1, block_size=bs,
    )
    m = _model(
        [node], [_vi("ids", ids.shape, P.DataType.INT64)],
        [_vi("y", (2, 3, hdim))],
        [data_t, _tensor("scales", scales)],
    )
    (y,) = _run(m, ids)

    table = q * np.repeat(scales, bs, 1)
    np.testing.assert_allclose(y, table[ids], atol=ATOL)


def test_gather_block_quantized_uint8_packed():
    r = _rng(24)
    vocab, hdim, bs = 6, 8, 4
    q = r.integers(0, 16, (vocab, hdim)).astype(np.int32)
    scales = (r.random((vocab, hdim // bs)) * 0.3 + 0.02).astype(np.float32)
    zp = r.integers(0, 16, (vocab, hdim // bs)).astype(np.int32)
    ids = np.array([1, 4], dtype=np.int64)

    node = P.make_node(
        "GatherBlockQuantized", ["data", "ids", "scales", "zp"], ["y"],
        domain=MS, gather_axis=0, quantize_axis=1, block_size=bs,
    )
    m = _model(
        [node], [_vi("ids", ids.shape, P.DataType.INT64)],
        [_vi("y", (2, hdim))],
        [_tensor("data", _pack_nibbles(q)),
         _tensor("scales", scales),
         _tensor("zp", _pack_nibbles(zp))],
    )
    (y,) = _run(m, ids)

    table = (q - np.repeat(zp, bs, 1)) * np.repeat(scales, bs, 1)
    np.testing.assert_allclose(y, table[ids], atol=ATOL)


# ---------------------------------------------------------------------------
# property fuzz: random MHA / GQA configurations vs the numpy oracle
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("seed", range(8))
def test_mha_property_fuzz(seed):
    r = _rng(100 + seed)
    n = int(r.integers(1, 5))
    h = int(r.choice([2, 4, 8]))
    b = int(r.integers(1, 4))
    sq = int(r.integers(1, 7))
    skv = int(r.integers(1, 9))
    hid = n * h
    causal = bool(r.integers(0, 2)) and sq <= skv
    use_past = bool(r.integers(0, 2))
    sp = int(r.integers(1, 5)) if use_past else 0
    use_mask = bool(r.integers(0, 2))
    scale = float(r.random() * 0.5 + 0.05) if r.integers(0, 2) else None

    q = r.standard_normal((b, sq, hid), dtype=np.float32)
    k = r.standard_normal((b, skv, hid), dtype=np.float32)
    v = r.standard_normal((b, skv, hid), dtype=np.float32)
    t_total = sp + skv

    inputs = ["q", "k", "v", "", "", ""]
    vis = [_vi("q", q.shape), _vi("k", k.shape), _vi("v", v.shape)]
    run_args = [q, k, v]
    mask = None
    if use_mask:
        mask = (r.random((b, t_total)) > 0.3).astype(np.int32)
        mask[:, 0] = 1  # never fully-masked rows
        inputs[4] = "mask"
        vis.append(_vi("mask", mask.shape, P.DataType.INT32))
        run_args.append(mask)
    pk = pv = None
    if use_past:
        pk = r.standard_normal((b, n, sp, h), dtype=np.float32)
        pv = r.standard_normal((b, n, sp, h), dtype=np.float32)
        inputs += ["pk", "pv"]
        vis += [_vi("pk", pk.shape), _vi("pv", pv.shape)]
        run_args += [pk, pv]

    attrs = dict(num_heads=n, unidirectional=int(causal))
    if scale is not None:
        attrs["scale"] = scale
    node = P.make_node("MultiHeadAttention", inputs, ["y"], domain=MS,
                       **attrs)
    m = _model([node], vis, [_vi("y", (b, sq, hid))], [])
    (y,) = _run(m, *run_args)

    qh, kh, vh = _split_heads(q, n), _split_heads(k, n), _split_heads(v, n)
    if use_past:
        kh = np.concatenate([pk, kh], axis=2)
        vh = np.concatenate([pv, vh], axis=2)
    keep = (mask != 0)[:, None, None, :] if use_mask else None
    want = _merge(_sdpa_oracle(qh, kh, vh, scale=scale, keep=keep,
                               causal=causal, past_len=sp))
    np.testing.assert_allclose(y, want, atol=5e-4)


@pytest.mark.parametrize("seed", range(8))
def test_gqa_property_fuzz(seed):
    r = _rng(200 + seed)
    kvn = int(r.choice([1, 2]))
    n = kvn * int(r.choice([1, 2, 4]))
    h = int(r.choice([4, 8]))
    b = int(r.integers(1, 4))
    decode = bool(r.integers(0, 2))
    s = 1 if decode else int(r.integers(2, 7))
    sp = int(r.integers(1, 6)) if decode or r.integers(0, 2) else 0
    rot = bool(r.integers(0, 2))
    interleaved = int(r.integers(0, 2))
    window = int(r.choice([0, 2, 3])) if not rot else 0
    packed = bool(r.integers(0, 2)) and sp == 0

    q = r.standard_normal((b, s, n * h), dtype=np.float32)
    k = r.standard_normal((b, s, kvn * h), dtype=np.float32)
    v = r.standard_normal((b, s, kvn * h), dtype=np.float32)
    lens = (sp + s - r.integers(0, min(s, sp + s), b)).astype(np.int32)
    lens = np.maximum(lens, 1)

    maxpos = 32
    inv = 1.0 / (10000.0 ** (np.arange(h // 2) / (h // 2)))
    ang = np.arange(maxpos)[:, None] * inv[None]
    cos = np.cos(ang).astype(np.float32)
    sin = np.sin(ang).astype(np.float32)

    attrs = dict(num_heads=n, kv_num_heads=kvn, do_rotary=int(rot),
                 rotary_interleaved=interleaved)
    if window:
        attrs["local_window_size"] = window

    if packed:
        qkv = np.concatenate([q, k, v], axis=-1)
        ins = ["q", "", ""]
        vis = [_vi("q", qkv.shape)]
        run_args = [qkv]
    else:
        ins = ["q", "k", "v"]
        vis = [_vi("q", q.shape), _vi("k", k.shape), _vi("v", v.shape)]
        run_args = [q, k, v]
    pk = pv = None
    if sp:
        pk = r.standard_normal((b, kvn, sp, h), dtype=np.float32)
        pv = r.standard_normal((b, kvn, sp, h), dtype=np.float32)
        ins += ["pk", "pv"]
        vis += [_vi("pk", pk.shape), _vi("pv", pv.shape)]
        run_args += [pk, pv]
    else:
        ins += ["", ""]
    ins += ["seqlens", "total", "cos", "sin"]
    vis.append(_vi("seqlens", (b,), P.DataType.INT32))
    run_args.append(lens - 1)
    inits = [_tensor("total", np.array([sp + s], np.int32)),
             _tensor("cos", cos), _tensor("sin", sin)]

    node = P.make_node("GroupQueryAttention", ins, ["y"], domain=MS, **attrs)
    m = _model([node], vis, [_vi("y", (b, s, n * h))], inits)
    (y,) = _run(m, *run_args)

    qh, kh, vh = _split_heads(q, n), _split_heads(k, kvn), _split_heads(v, kvn)
    if rot:
        if sp == 0:
            pos = np.broadcast_to(np.arange(s), (b, s))
        else:
            pos = np.maximum(lens[:, None] - s + np.arange(s)[None, :], 0)
        qh = _rotary_oracle(qh, pos, cos, sin, interleaved)
        kh = _rotary_oracle(kh, pos, cos, sin, interleaved)
    if sp:
        kh = np.concatenate([pk, kh], axis=2)
        vh = np.concatenate([pv, vh], axis=2)
    want = _merge(_gqa_oracle(qh, kh, vh, lens, sp=sp, window=window))
    np.testing.assert_allclose(np.asarray(y), want, atol=5e-4)


# ---------------------------------------------------------------------------
# Whisper word-timestamp pair: UnfoldTensor + DynamicTimeWarping
# ---------------------------------------------------------------------------


def test_unfold_tensor_matches_torch():
    import torch

    r = _rng(71)
    x = r.standard_normal((2, 3, 11)).astype(np.float32)
    node = P.make_node("UnfoldTensor", ["x"], ["y"], domain=MS,
                       dim=2, size=4, step=3)
    m = _model([node], [_vi("x", x.shape)], [_vi("y", (2, 3, 3, 4))], [])
    (y,) = _run(m, x)
    want = torch.from_numpy(x).unfold(2, 4, 3).numpy()
    np.testing.assert_array_equal(y, want)


def test_unfold_tensor_middle_dim():
    import torch

    r = _rng(72)
    x = r.standard_normal((9, 5)).astype(np.float32)
    node = P.make_node("UnfoldTensor", ["x"], ["y"], domain=MS,
                       dim=0, size=2, step=2)
    m = _model([node], [_vi("x", x.shape)], [_vi("y", (4, 5, 2))], [])
    (y,) = _run(m, x)
    np.testing.assert_array_equal(
        y, torch.from_numpy(x).unfold(0, 2, 2).numpy()
    )


def _dtw_brute(c):
    """Exhaustive minimal-cost monotone path (diag/down/right moves) —
    independent of the DP implementation under test."""
    n, m = c.shape
    best = {"cost": np.inf, "path": None}

    def walk(i, j, cost, path):
        cost += c[i, j]
        path = path + [(i, j)]
        if cost >= best["cost"]:
            return
        if i == n - 1 and j == m - 1:
            best["cost"], best["path"] = cost, path
            return
        if i + 1 < n and j + 1 < m:
            walk(i + 1, j + 1, cost, path)
        if i + 1 < n:
            walk(i + 1, j, cost, path)
        if j + 1 < m:
            walk(i, j + 1, cost, path)

    walk(0, 0, 0.0, [])
    return best["cost"], best["path"]


def test_dynamic_time_warping_optimal_path():
    from birdnet_tpu.compiler.importer import import_onnx, make_forward

    r = _rng(73)
    for trial in range(5):
        c = r.random((5, 6)).astype(np.float32)  # continuous: unique optimum
        node = P.make_node("DynamicTimeWarping", ["x"], ["y"], domain=MS)
        m = _model([node], [_vi("x", c.shape)],
                   [_vi("y", (2, 0), P.DataType.INT32)], [])
        model = import_onnx(m)
        fwd = make_forward(model, precision="fp32")
        (y,) = fwd(model.params, c)
        y = np.asarray(y)

        want_cost, want_path = _dtw_brute(c.astype(np.float64))
        got_path = list(zip(y[0].tolist(), y[1].tolist()))
        assert got_path[0] == (0, 0) and got_path[-1] == (4, 5)
        got_cost = float(sum(c[i, j] for i, j in got_path))
        np.testing.assert_allclose(got_cost, want_cost, rtol=1e-6)
        assert got_path == want_path
