"""Oracle tests for the wave-3 op additions (bitwise, Lp*, ReverseSequence,
DFT, opset-23 attention family)."""

import math

import numpy as np
import pytest

from birdnet_tpu.onnx import proto as P
from tests.test_compiler_ops import run_graph

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# bitwise
# ---------------------------------------------------------------------------


def test_bitshift_left_right(rng):
    x = rng.integers(0, 2**20, size=(3, 5)).astype(np.uint32)
    s = rng.integers(0, 8, size=(3, 5)).astype(np.uint32)
    (left,) = run_graph(
        [P.make_node("BitShift", ["x", "s"], ["y"], direction="LEFT")],
        {"x": x, "s": s},
    )
    (right,) = run_graph(
        [P.make_node("BitShift", ["x", "s"], ["y"], direction="RIGHT")],
        {"x": x, "s": s},
    )
    np.testing.assert_array_equal(left, np.left_shift(x, s))
    np.testing.assert_array_equal(right, np.right_shift(x, s))


def test_bitwise_not_xor(rng):
    a = rng.integers(-(2**30), 2**30, size=(4, 4)).astype(np.int32)
    b = rng.integers(-(2**30), 2**30, size=(4, 4)).astype(np.int32)
    (nt,) = run_graph([P.make_node("BitwiseNot", ["a"], ["y"])], {"a": a})
    (xr,) = run_graph([P.make_node("BitwiseXor", ["a", "b"], ["y"])], {"a": a, "b": b})
    np.testing.assert_array_equal(nt, np.bitwise_not(a))
    np.testing.assert_array_equal(xr, np.bitwise_xor(a, b))


# ---------------------------------------------------------------------------
# Hardmax / Lp family
# ---------------------------------------------------------------------------


def test_hardmax_opset13(rng):
    x = rng.normal(size=(3, 7, 5)).astype(np.float32)
    (y,) = run_graph([P.make_node("Hardmax", ["x"], ["y"], axis=1)], {"x": x})
    expected = torch.nn.functional.one_hot(
        torch.from_numpy(x).argmax(dim=1), 7
    ).movedim(-1, 1).float().numpy()
    np.testing.assert_array_equal(y, expected)


def test_hardmax_first_max_tie(rng):
    x = np.array([[1.0, 3.0, 3.0, 0.0]], dtype=np.float32)
    (y,) = run_graph([P.make_node("Hardmax", ["x"], ["y"])], {"x": x})
    np.testing.assert_array_equal(y, [[0.0, 1.0, 0.0, 0.0]])


def test_hardmax_legacy_flattens(rng):
    # opset < 13: one-hot over the flattened tail from axis.
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Hardmax", ["x"], ["y"], axis=1)], {"x": x}, opset=11
    )
    flat = x.reshape(2, -1)
    expected = np.zeros_like(flat)
    expected[np.arange(2), flat.argmax(axis=1)] = 1.0
    np.testing.assert_array_equal(y, expected.reshape(x.shape))


def test_lp_normalization_vs_torch(rng):
    x = rng.normal(size=(4, 16)).astype(np.float32)
    for p in (1, 2):
        (y,) = run_graph(
            [P.make_node("LpNormalization", ["x"], ["y"], axis=-1, p=p)], {"x": x}
        )
        expected = torch.nn.functional.normalize(
            torch.from_numpy(x), p=p, dim=-1, eps=0.0
        ).numpy()
        np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_lppool_vs_torch(rng):
    x = rng.normal(size=(2, 3, 10, 12)).astype(np.float32)
    (y,) = run_graph(
        [
            P.make_node(
                "LpPool", ["x"], ["y"], kernel_shape=[3, 3], strides=[2, 2], p=2
            )
        ],
        {"x": x},
        opset=18,
    )
    expected = torch.nn.LPPool2d(2, 3, stride=2)(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_global_lppool_vs_torch(rng):
    x = rng.normal(size=(2, 5, 6, 7)).astype(np.float32)
    (y,) = run_graph([P.make_node("GlobalLpPool", ["x"], ["y"], p=2)], {"x": x})
    expected = (
        torch.from_numpy(x).flatten(2).norm(p=2, dim=2).numpy().reshape(2, 5, 1, 1)
    )
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# ReverseSequence
# ---------------------------------------------------------------------------


def test_reverse_sequence_time_major(rng):
    x = rng.normal(size=(6, 3, 4)).astype(np.float32)  # [T, B, F]
    lens = np.array([4, 1, 6], dtype=np.int64)
    (y,) = run_graph(
        [
            P.make_node(
                "ReverseSequence", ["x", "l"], ["y"], batch_axis=1, time_axis=0
            )
        ],
        {"x": x, "l": lens},
    )
    expected = x.copy()
    for b, n in enumerate(lens):
        expected[:n, b] = x[:n, b][::-1]
    np.testing.assert_array_equal(y, expected)


def test_reverse_sequence_batch_major(rng):
    x = rng.normal(size=(3, 5)).astype(np.float32)  # [B, T]
    lens = np.array([5, 2, 3], dtype=np.int64)
    (y,) = run_graph(
        [
            P.make_node(
                "ReverseSequence", ["x", "l"], ["y"], batch_axis=0, time_axis=1
            )
        ],
        {"x": x, "l": lens},
    )
    expected = x.copy()
    for b, n in enumerate(lens):
        expected[b, :n] = x[b, :n][::-1]
    np.testing.assert_array_equal(y, expected)


# ---------------------------------------------------------------------------
# DFT
# ---------------------------------------------------------------------------


def test_dft_forward_real(rng):
    x = rng.normal(size=(2, 16, 1)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("DFT", ["x"], ["y"], axis=1)], {"x": x}, opset=17
    )
    spec = np.fft.fft(x[..., 0], axis=1)
    np.testing.assert_allclose(y[..., 0], spec.real, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y[..., 1], spec.imag, rtol=1e-4, atol=1e-4)


def test_dft_onesided_matches_rfft(rng):
    x = rng.normal(size=(1, 32, 1)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("DFT", ["x"], ["y"], axis=1, onesided=1)], {"x": x}, opset=17
    )
    spec = np.fft.rfft(x[..., 0], axis=1)
    assert y.shape == (1, 17, 2)
    np.testing.assert_allclose(y[..., 0], spec.real, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(y[..., 1], spec.imag, rtol=1e-4, atol=1e-4)


def test_dft_inverse_complex_roundtrip(rng):
    x = rng.normal(size=(1, 12, 2)).astype(np.float32)
    (f,) = run_graph(
        [P.make_node("DFT", ["x"], ["y"], axis=1)], {"x": x}, opset=17
    )
    (back,) = run_graph(
        [P.make_node("DFT", ["x"], ["y"], axis=1, inverse=1)],
        {"x": f.astype(np.float32)},
        opset=17,
    )
    np.testing.assert_allclose(back, x, rtol=1e-3, atol=1e-4)


def test_dft_length_pads_and_truncates(rng):
    x = rng.normal(size=(1, 10, 1)).astype(np.float32)
    for n in (16, 6):
        (y,) = run_graph(
            [P.make_node("DFT", ["x", "n"], ["y"], axis=1)],
            {"x": x},
            {"n": np.array(n, dtype=np.int64)},
            opset=17,
        )
        spec = np.fft.fft(x[..., 0], n=n, axis=1)
        assert y.shape == (1, n, 2)
        np.testing.assert_allclose(y[..., 0], spec.real, rtol=1e-4, atol=1e-4)


def test_dft_opset20_axis_input(rng):
    x = rng.normal(size=(2, 8, 3, 1)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("DFT", ["x", "", "ax"], ["y"])],
        {"x": x},
        {"ax": np.array(1, dtype=np.int64)},
        opset=20,
    )
    spec = np.fft.fft(x[..., 0], axis=1)
    np.testing.assert_allclose(y[..., 0], spec.real, rtol=1e-4, atol=1e-4)
    # default axis in the opset-20 form is -2 (the last signal dim)
    (yd,) = run_graph([P.make_node("DFT", ["x"], ["y"])], {"x": x}, opset=20)
    spec_d = np.fft.fft(x[..., 0], axis=2)
    np.testing.assert_allclose(yd[..., 0], spec_d.real, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# Attention (opset 23)
# ---------------------------------------------------------------------------


def _sdpa(q, k, v, **kw):
    return torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v), **kw
    ).numpy()


def test_attention_basic_4d(rng):
    q = rng.normal(size=(2, 4, 6, 8)).astype(np.float32)
    k = rng.normal(size=(2, 4, 10, 8)).astype(np.float32)
    v = rng.normal(size=(2, 4, 10, 8)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Attention", ["q", "k", "v"], ["y"])],
        {"q": q, "k": k, "v": v},
        opset=23,
    )
    np.testing.assert_allclose(y, _sdpa(q, k, v), rtol=1e-4, atol=1e-5)


def test_attention_causal(rng):
    q = rng.normal(size=(1, 2, 5, 4)).astype(np.float32)
    k = rng.normal(size=(1, 2, 5, 4)).astype(np.float32)
    v = rng.normal(size=(1, 2, 5, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Attention", ["q", "k", "v"], ["y"], is_causal=1)],
        {"q": q, "k": k, "v": v},
        opset=23,
    )
    np.testing.assert_allclose(y, _sdpa(q, k, v, is_causal=True), rtol=1e-4, atol=1e-5)


def test_attention_bool_and_float_masks(rng):
    q = rng.normal(size=(1, 2, 3, 4)).astype(np.float32)
    k = rng.normal(size=(1, 2, 6, 4)).astype(np.float32)
    v = rng.normal(size=(1, 2, 6, 4)).astype(np.float32)
    bool_mask = rng.integers(0, 2, size=(1, 1, 3, 6)).astype(bool)
    bool_mask[..., 0] = True  # keep every row attendable
    (y,) = run_graph(
        [P.make_node("Attention", ["q", "k", "v", "m"], ["y"])],
        {"q": q, "k": k, "v": v, "m": bool_mask},
        opset=23,
    )
    np.testing.assert_allclose(
        y, _sdpa(q, k, v, attn_mask=torch.from_numpy(bool_mask)), rtol=1e-4, atol=1e-5
    )
    float_mask = rng.normal(size=(3, 6)).astype(np.float32)
    (yf,) = run_graph(
        [P.make_node("Attention", ["q", "k", "v", "m"], ["y"])],
        {"q": q, "k": k, "v": v, "m": float_mask},
        opset=23,
    )
    np.testing.assert_allclose(
        yf, _sdpa(q, k, v, attn_mask=torch.from_numpy(float_mask)), rtol=1e-4, atol=1e-5
    )


def test_attention_gqa(rng):
    q = rng.normal(size=(1, 8, 4, 16)).astype(np.float32)
    k = rng.normal(size=(1, 2, 7, 16)).astype(np.float32)
    v = rng.normal(size=(1, 2, 7, 16)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Attention", ["q", "k", "v"], ["y"])],
        {"q": q, "k": k, "v": v},
        opset=23,
    )
    expected = _sdpa(q, np.repeat(k, 4, axis=1), np.repeat(v, 4, axis=1))
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_attention_3d_form(rng):
    b, qs, ks, h, d = 2, 3, 5, 4, 8
    q = rng.normal(size=(b, qs, h * d)).astype(np.float32)
    k = rng.normal(size=(b, ks, h * d)).astype(np.float32)
    v = rng.normal(size=(b, ks, h * d)).astype(np.float32)
    (y,) = run_graph(
        [
            P.make_node(
                "Attention", ["q", "k", "v"], ["y"], q_num_heads=h, kv_num_heads=h
            )
        ],
        {"q": q, "k": k, "v": v},
        opset=23,
    )
    q4 = q.reshape(b, qs, h, d).transpose(0, 2, 1, 3)
    k4 = k.reshape(b, ks, h, d).transpose(0, 2, 1, 3)
    v4 = v.reshape(b, ks, h, d).transpose(0, 2, 1, 3)
    expected = _sdpa(q4, k4, v4).transpose(0, 2, 1, 3).reshape(b, qs, h * d)
    assert y.shape == (b, qs, h * d)
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_attention_kv_cache_and_present(rng):
    q = rng.normal(size=(1, 2, 3, 4)).astype(np.float32)
    k = rng.normal(size=(1, 2, 3, 4)).astype(np.float32)
    v = rng.normal(size=(1, 2, 3, 4)).astype(np.float32)
    pk = rng.normal(size=(1, 2, 5, 4)).astype(np.float32)
    pv = rng.normal(size=(1, 2, 5, 4)).astype(np.float32)
    y, present_k, present_v = run_graph(
        [
            P.make_node(
                "Attention",
                ["q", "k", "v", "", "pk", "pv"],
                ["y", "present_k", "present_v"],
            )
        ],
        {"q": q, "k": k, "v": v, "pk": pk, "pv": pv},
        outputs=["y", "present_k", "present_v"],
        opset=23,
    )
    full_k = np.concatenate([pk, k], axis=2)
    full_v = np.concatenate([pv, v], axis=2)
    np.testing.assert_allclose(y, _sdpa(q, full_k, full_v), rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(present_k, full_k)
    np.testing.assert_array_equal(present_v, full_v)


def test_attention_scale_and_softcap(rng):
    q = rng.normal(size=(1, 1, 4, 8)).astype(np.float32)
    k = rng.normal(size=(1, 1, 6, 8)).astype(np.float32)
    v = rng.normal(size=(1, 1, 6, 8)).astype(np.float32)
    scale, cap = 0.5, 3.0
    (y,) = run_graph(
        [P.make_node("Attention", ["q", "k", "v"], ["y"], scale=scale, softcap=cap)],
        {"q": q, "k": k, "v": v},
        opset=23,
    )
    scores = q[0, 0] @ k[0, 0].T * scale
    scores = cap * np.tanh(scores / cap)
    e = np.exp(scores - scores.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    np.testing.assert_allclose(y[0, 0], probs @ v[0, 0], rtol=1e-4, atol=1e-5)


def test_attention_qk_output_modes(rng):
    q = rng.normal(size=(1, 1, 3, 4)).astype(np.float32)
    k = rng.normal(size=(1, 1, 3, 4)).astype(np.float32)
    v = rng.normal(size=(1, 1, 3, 4)).astype(np.float32)
    scores = q[0, 0] @ k[0, 0].T / math.sqrt(4)
    tri = np.tril(np.ones((3, 3), dtype=bool))
    masked = np.where(tri, scores, -np.inf)
    e = np.exp(masked - masked.max(axis=-1, keepdims=True))
    probs = e / e.sum(axis=-1, keepdims=True)
    for mode, expected in ((0, scores), (1, masked), (3, probs)):
        _, _, _, qk = run_graph(
            [
                P.make_node(
                    "Attention",
                    ["q", "k", "v"],
                    ["y", "pk", "pv", "qk"],
                    is_causal=1,
                    qk_matmul_output_mode=mode,
                )
            ],
            {"q": q, "k": k, "v": v},
            outputs=["y", "pk", "pv", "qk"],
            opset=23,
        )
        np.testing.assert_allclose(qk[0, 0], expected, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------------------
# RotaryEmbedding (opset 23)
# ---------------------------------------------------------------------------


def _rope_oracle(x, cos, sin, interleaved=False, rd=None):
    """Independent oracle via complex multiplication: (x1 + i·x2)·e^{iθ}."""
    rd = rd or x.shape[-1]
    rot, tail = x[..., :rd], x[..., rd:]
    if interleaved:
        x1, x2 = rot[..., 0::2], rot[..., 1::2]
    else:
        half = rd // 2
        x1, x2 = rot[..., :half], rot[..., half:]
    z = (x1 + 1j * x2) * (cos + 1j * sin)
    if interleaved:
        out = np.stack([z.real, z.imag], axis=-1).reshape(rot.shape)
    else:
        out = np.concatenate([z.real, z.imag], axis=-1)
    return np.concatenate([out, tail], axis=-1).astype(x.dtype)


def test_rotary_embedding_with_position_ids(rng):
    b, h, s, d = 2, 3, 5, 8
    x = rng.normal(size=(b, h, s, d)).astype(np.float32)
    max_pos = 16
    inv = 1.0 / (10000 ** (np.arange(0, d, 2) / d))
    theta = np.arange(max_pos)[:, None] * inv[None, :]
    cos, sin = np.cos(theta).astype(np.float32), np.sin(theta).astype(np.float32)
    pos = rng.integers(0, max_pos, size=(b, s)).astype(np.int64)
    (y,) = run_graph(
        [P.make_node("RotaryEmbedding", ["x", "c", "s", "p"], ["y"])],
        {"x": x, "c": cos, "s": sin, "p": pos},
        opset=23,
    )
    expected = _rope_oracle(x, cos[pos][:, None], sin[pos][:, None])
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_rotary_embedding_interleaved_partial(rng):
    b, h, s, d, rd = 1, 2, 4, 8, 4
    x = rng.normal(size=(b, h, s, d)).astype(np.float32)
    cos = rng.normal(size=(b, s, rd // 2)).astype(np.float32)
    sin = rng.normal(size=(b, s, rd // 2)).astype(np.float32)
    (y,) = run_graph(
        [
            P.make_node(
                "RotaryEmbedding",
                ["x", "c", "s"],
                ["y"],
                interleaved=1,
                rotary_embedding_dim=rd,
            )
        ],
        {"x": x, "c": cos, "s": sin},
        opset=23,
    )
    expected = _rope_oracle(
        x, cos[:, None], sin[:, None], interleaved=True, rd=rd
    )
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_rotary_embedding_3d(rng):
    b, s, h, d = 2, 3, 2, 6
    x = rng.normal(size=(b, s, h * d)).astype(np.float32)
    cos = rng.normal(size=(b, s, d // 2)).astype(np.float32)
    sin = rng.normal(size=(b, s, d // 2)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("RotaryEmbedding", ["x", "c", "s"], ["y"], num_heads=h)],
        {"x": x, "c": cos, "s": sin},
        opset=23,
    )
    x4 = x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    expected = (
        _rope_oracle(x4, cos[:, None], sin[:, None])
        .transpose(0, 2, 1, 3)
        .reshape(b, s, h * d)
    )
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)
