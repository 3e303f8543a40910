"""Oracle tests for the int8 quantized-compute lowerings.

The oracle is the quantized-op definition itself: dequantize the integer
operands to float, run the float op, and requantize with round-half-even
saturation — computed in numpy at float64. Exactness claims (the int32
accumulator paths) are checked against int64 numpy arithmetic.
"""

import numpy as np
import pytest

from birdnet_tpu.onnx import proto as P
from tests.test_compiler_ops import run_graph


def _dq(q, scale, zp, axis=None):
    q = q.astype(np.int64)
    scale = np.asarray(scale, dtype=np.float64)
    zp = np.asarray(0 if zp is None else zp, dtype=np.int64)
    if axis is not None and scale.ndim == 1 and scale.size > 1:
        shape = [1] * q.ndim
        shape[axis] = -1
        scale = scale.reshape(shape)
        zp = zp.reshape(shape) if zp.ndim == 1 and zp.size > 1 else zp
    return (q - zp) * scale


def _q(x, scale, zp):
    zp_arr = np.asarray(0 if zp is None else zp, dtype=np.int64)
    dtype = np.uint8 if zp is None else np.asarray(zp).dtype
    info = np.iinfo(dtype)
    # numpy rint is round-half-even, matching ONNX QuantizeLinear
    q = np.rint(x / np.asarray(scale, dtype=np.float64)) + zp_arr
    return np.clip(q, info.min, info.max).astype(dtype)


def _conv_ref(x, w, b=None, pads=0, strides=1):
    import torch

    return torch.nn.functional.conv2d(
        torch.from_numpy(x.astype(np.float64)),
        torch.from_numpy(w.astype(np.float64)),
        None if b is None else torch.from_numpy(b.astype(np.float64)),
        stride=strides,
        padding=pads,
    ).numpy()


def _rand_q(rng, shape, dtype):
    info = np.iinfo(dtype)
    return rng.integers(info.min, info.max + 1, size=shape).astype(dtype)


@pytest.fixture(scope="module")
def irng():
    return np.random.default_rng(1234)


# ---------------------------------------------------------------------------
# MatMulInteger / ConvInteger: exact int32 accumulators
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "a_dt,b_dt,a_zp,b_zp",
    [
        (np.int8, np.int8, None, None),
        (np.uint8, np.int8, np.uint8(131), None),
        (np.int8, np.int8, np.int8(-5), np.int8(0)),
        (np.uint8, np.uint8, np.uint8(120), np.uint8(128)),
        (np.int8, np.int8, np.int8(7), np.int8(3)),  # nonzero w_zp: wide path
    ],
)
def test_matmul_integer_exact(irng, a_dt, b_dt, a_zp, b_zp):
    a = _rand_q(irng, (5, 32), a_dt)
    b = _rand_q(irng, (32, 9), b_dt)
    inits = {}
    names = ["a", "b", "azp" if a_zp is not None else ""]
    if a_zp is not None:
        inits["azp"] = np.asarray(a_zp)
    if b_zp is not None:
        names.append("bzp")
        inits["bzp"] = np.asarray(b_zp)
    while names and names[-1] == "":
        names.pop()
    (y,) = run_graph(
        [P.make_node("MatMulInteger", names, ["y"])], {"a": a, "b": b}, inits
    )
    expected = (a.astype(np.int64) - (0 if a_zp is None else int(a_zp))) @ (
        b.astype(np.int64) - (0 if b_zp is None else int(b_zp))
    )
    assert y.dtype == np.int32
    np.testing.assert_array_equal(y.astype(np.int64), expected)


def test_matmul_integer_per_row_a_zp(irng):
    a = _rand_q(irng, (4, 16), np.uint8)
    b = _rand_q(irng, (16, 6), np.int8)
    azp = _rand_q(irng, (4,), np.uint8)
    (y,) = run_graph(
        [P.make_node("MatMulInteger", ["a", "b", "azp"], ["y"])],
        {"a": a, "b": b},
        {"azp": azp},
    )
    expected = (a.astype(np.int64) - azp.astype(np.int64)[:, None]) @ b.astype(
        np.int64
    )
    np.testing.assert_array_equal(y.astype(np.int64), expected)


@pytest.mark.parametrize(
    "x_dt,x_zp,w_zp,pads",
    [
        (np.int8, None, None, [0, 0, 0, 0]),
        (np.int8, np.int8(5), None, [1, 1, 1, 1]),  # zp + padding correction
        (np.uint8, np.uint8(100), None, [2, 1, 2, 1]),
        (np.int8, np.int8(-3), np.int8(2), [1, 1, 1, 1]),  # wide path
    ],
)
def test_conv_integer_exact(irng, x_dt, x_zp, w_zp, pads):
    x = _rand_q(irng, (2, 3, 8, 8), x_dt)
    w = _rand_q(irng, (4, 3, 3, 3), np.int8)
    names = ["x", "w"]
    inits = {"w": w}
    names.append("xzp" if x_zp is not None else "")
    if x_zp is not None:
        inits["xzp"] = np.asarray(x_zp)
    if w_zp is not None:
        names.append("wzp")
        inits["wzp"] = np.asarray(w_zp)
    while names and names[-1] == "":
        names.pop()
    (y,) = run_graph(
        [P.make_node("ConvInteger", names, ["y"], pads=pads, strides=[1, 1])],
        {"x": x},
        inits,
    )
    xs = x.astype(np.int64) - (0 if x_zp is None else int(x_zp))
    ws = w.astype(np.int64) - (0 if w_zp is None else int(w_zp))
    expected = _conv_ref(xs, ws, pads=(pads[0], pads[1]))
    assert y.dtype == np.int32
    np.testing.assert_array_equal(y.astype(np.int64), expected.astype(np.int64))


def test_conv_integer_grouped_with_zp(irng):
    x = _rand_q(irng, (1, 4, 6, 6), np.uint8)
    w = _rand_q(irng, (4, 2, 3, 3), np.int8)
    (y,) = run_graph(
        [
            P.make_node(
                "ConvInteger", ["x", "w", "xzp"], ["y"], group=2, pads=[1, 1, 1, 1]
            )
        ],
        {"x": x},
        {"w": w, "xzp": np.uint8(77)},
    )
    import torch

    xs = torch.from_numpy(x.astype(np.float64) - 77.0)
    expected = torch.nn.functional.conv2d(
        xs, torch.from_numpy(w.astype(np.float64)), padding=1, groups=2
    ).numpy()
    np.testing.assert_array_equal(y.astype(np.int64), expected.astype(np.int64))


# ---------------------------------------------------------------------------
# QLinearMatMul / QLinearConv: dequant→float-op→requant oracle
# ---------------------------------------------------------------------------


def test_qlinear_matmul(irng):
    a = _rand_q(irng, (6, 24), np.uint8)
    b = _rand_q(irng, (24, 8), np.int8)
    a_s, b_s, y_s = 0.02, 0.05, 0.1
    a_zp, y_zp = np.uint8(128), np.uint8(120)
    (y,) = run_graph(
        [
            P.make_node(
                "QLinearMatMul",
                ["a", "as", "azp", "b", "bs", "bzp", "ys", "yzp"],
                ["y"],
            )
        ],
        {"a": a},
        {
            "as": np.float32(a_s),
            "azp": a_zp,
            "b": b,
            "bs": np.float32(b_s),
            "bzp": np.int8(0),
            "ys": np.float32(y_s),
            "yzp": y_zp,
        },
    )
    ref_f = _dq(a, a_s, a_zp) @ _dq(b, b_s, None)
    expected = _q(ref_f, y_s, y_zp)
    assert y.dtype == np.uint8
    # rounding at the int boundary can differ by 1 ulp in rare float ties
    np.testing.assert_allclose(
        y.astype(np.int64), expected.astype(np.int64), atol=1
    )


def test_qlinear_matmul_per_column_scale(irng):
    a = _rand_q(irng, (5, 16), np.int8)
    b = _rand_q(irng, (16, 4), np.int8)
    b_s = np.array([0.01, 0.02, 0.04, 0.08], dtype=np.float32)
    (y,) = run_graph(
        [
            P.make_node(
                "QLinearMatMul",
                ["a", "as", "azp", "b", "bs", "bzp", "ys", "yzp"],
                ["y"],
            )
        ],
        {"a": a},
        {
            "as": np.float32(0.03),
            "azp": np.int8(0),
            "b": b,
            "bs": b_s,
            "bzp": np.zeros(4, np.int8),
            "ys": np.float32(0.2),
            "yzp": np.int8(0),
        },
    )
    ref_f = _dq(a, 0.03, None) @ _dq(b, b_s, None, axis=1)
    expected = _q(ref_f, 0.2, np.int8(0))
    np.testing.assert_allclose(y.astype(np.int64), expected.astype(np.int64), atol=1)


@pytest.mark.parametrize("per_channel", [False, True])
def test_qlinear_conv(irng, per_channel):
    x = _rand_q(irng, (2, 3, 10, 10), np.uint8)
    w = _rand_q(irng, (5, 3, 3, 3), np.int8)
    x_s, y_s = 0.015, 0.3
    x_zp, y_zp = np.uint8(110), np.uint8(128)
    if per_channel:
        w_s = np.array([0.01, 0.02, 0.03, 0.015, 0.025], dtype=np.float32)
        w_zp = np.zeros(5, np.int8)
    else:
        w_s = np.float32(0.02)
        w_zp = np.int8(0)
    b = irng.integers(-2000, 2000, size=5).astype(np.int32)
    (y,) = run_graph(
        [
            P.make_node(
                "QLinearConv",
                ["x", "xs", "xzp", "w", "ws", "wzp", "ys", "yzp", "b"],
                ["y"],
                pads=[1, 1, 1, 1],
            )
        ],
        {"x": x},
        {
            "xs": np.float32(x_s),
            "xzp": x_zp,
            "w": w,
            "ws": w_s,
            "wzp": w_zp,
            "ys": np.float32(y_s),
            "yzp": y_zp,
            "b": b,
        },
    )
    # float oracle: dequantized conv with bias at scale x_s*w_s, zero padding
    xf = _dq(x, x_s, x_zp)
    wf = _dq(w, w_s, None, axis=0)
    bf = b.astype(np.float64) * (x_s * np.asarray(w_s, np.float64))
    ref_f = _conv_ref(xf, wf, bf, pads=1)
    expected = _q(ref_f, y_s, y_zp)
    assert y.dtype == np.uint8
    np.testing.assert_allclose(y.astype(np.int64), expected.astype(np.int64), atol=1)


def test_qlinear_conv_fused_relu(irng):
    """_fused_relu clamps at the output zero point (exact relu in q-space)."""
    x = _rand_q(irng, (1, 2, 6, 6), np.int8)
    w = _rand_q(irng, (3, 2, 3, 3), np.int8)
    common = {
        "xs": np.float32(0.05),
        "xzp": np.int8(0),
        "w": w,
        "ws": np.float32(0.04),
        "wzp": np.int8(0),
        "ys": np.float32(0.11),
        "yzp": np.int8(10),
    }
    inputs = ["x", "xs", "xzp", "w", "ws", "wzp", "ys", "yzp"]
    (plain,) = run_graph(
        [P.make_node("QLinearConv", inputs, ["y"], pads=[1, 1, 1, 1])],
        {"x": x},
        dict(common),
    )
    (fused,) = run_graph(
        [
            P.make_node(
                "QLinearConv", inputs, ["y"], pads=[1, 1, 1, 1], _fused_relu=1
            )
        ],
        {"x": x},
        dict(common),
    )
    np.testing.assert_array_equal(
        fused.astype(np.int64), np.maximum(plain.astype(np.int64), 10)
    )
    assert (fused.astype(np.int64) >= 10).all()


def test_qlinear_gemm_internal(irng):
    a = _rand_q(irng, (4, 12), np.int8)
    w = _rand_q(irng, (7, 12), np.int8)  # [N, K], transB=1
    w_s = (irng.random(7).astype(np.float32) * 0.05 + 0.01).astype(np.float32)
    bias = irng.integers(-500, 500, size=7).astype(np.int32)
    (y,) = run_graph(
        [
            P.make_node(
                "_QLinearGemm",
                ["a", "as", "azp", "w", "ws", "wzp", "ys", "yzp", "b"],
                ["y"],
                transB=1,
            )
        ],
        {"a": a},
        {
            "as": np.float32(0.02),
            "azp": np.int8(0),
            "w": w,
            "ws": w_s,
            "wzp": np.zeros(7, np.int8),
            "ys": np.float32(0.15),
            "yzp": np.int8(-4),
            "b": bias,
        },
    )
    ref_f = _dq(a, 0.02, None) @ _dq(w, w_s, None, axis=0).T
    ref_f = ref_f + bias.astype(np.float64) * (0.02 * w_s.astype(np.float64))
    expected = _q(ref_f, 0.15, np.int8(-4))
    np.testing.assert_allclose(y.astype(np.int64), expected.astype(np.int64), atol=1)


def test_dynamic_quantize_linear():
    x = np.array([-1.0, -0.5, 0.0, 0.25, 0.5, 1.5], dtype=np.float32)
    y, scale, zp = run_graph(
        [P.make_node("DynamicQuantizeLinear", ["x"], ["y", "s", "z"])],
        {"x": x},
        outputs=["y", "s", "z"],
    )
    expected_scale = (1.5 - (-1.0)) / 255.0
    np.testing.assert_allclose(scale, expected_scale, rtol=1e-6)
    expected_zp = np.rint(0.0 - (-1.0) / expected_scale)
    assert zp == expected_zp
    ref = np.clip(np.rint(x / expected_scale) + expected_zp, 0, 255).astype(np.uint8)
    np.testing.assert_array_equal(y, ref)
    assert y.dtype == np.uint8
    # dequantized reconstruction stays within half a step
    np.testing.assert_allclose(
        (y.astype(np.float32) - zp) * scale, x, atol=expected_scale / 2 + 1e-7
    )


def test_dynamic_quantize_linear_all_zero():
    y, scale, zp = run_graph(
        [P.make_node("DynamicQuantizeLinear", ["x"], ["y", "s", "z"])],
        {"x": np.zeros(8, np.float32)},
        outputs=["y", "s", "z"],
    )
    assert np.all(y == zp)
    assert np.isfinite(scale)


# ---------------------------------------------------------------------------
# Blocked quantization (opset 21): block_size attr on QDQ — scale/zp carry
# x's rank with the quantize axis divided by block_size; each block's
# scale repeats along the axis (tail clamped). This is the ONNX-standard
# int4/int8 blocked form the onnx quantizer emits for LLM weights.
# ---------------------------------------------------------------------------


def test_dequantize_linear_blocked():
    r = np.random.default_rng(80)
    k, n, bs = 10, 3, 4  # K not divisible: tail block of 2 (clamped index)
    q = r.integers(0, 255, (k, n), dtype=np.uint8)
    nb = -(-k // bs)
    sc = (r.random((nb, n)) * 0.1 + 0.01).astype(np.float32)
    zp = r.integers(0, 255, (nb, n), dtype=np.uint8)

    (y,) = run_graph(
        [P.make_node("DequantizeLinear", ["q", "sc", "zp"], ["y"],
                     axis=0, block_size=bs)],
        {"q": q}, {"sc": sc, "zp": zp}, opset=21,
    )
    idx = np.minimum(np.arange(k) // bs, nb - 1)
    want = (q.astype(np.float32) - zp[idx].astype(np.float32)) * sc[idx]
    np.testing.assert_allclose(y, want, rtol=1e-6)


def test_quantize_linear_blocked_roundtrip():
    r = np.random.default_rng(81)
    k, n, bs = 8, 2, 4
    x = (r.standard_normal((k, n)) * 2).astype(np.float32)
    nb = k // bs
    sc = (r.random((nb, n)) * 0.05 + 0.01).astype(np.float32)
    zp = r.integers(100, 156, (nb, n), dtype=np.uint8)

    (q,) = run_graph(
        [P.make_node("QuantizeLinear", ["x", "sc", "zp"], ["y"],
                     axis=0, block_size=bs)],
        {"x": x}, {"sc": sc, "zp": zp}, opset=21,
    )
    idx = np.arange(k) // bs
    want = np.clip(
        np.round(x / sc[idx]) + zp[idx].astype(np.float32), 0, 255
    ).astype(np.uint8)
    np.testing.assert_array_equal(q, want)


def test_quantize_linear_output_dtype_attr():
    """opset-21 zero-point-free form: output_dtype names the target."""
    x = np.array([[0.5, -3.2, 100.7]], np.float32)
    sc = np.float32(0.1)
    (q,) = run_graph(
        [P.make_node("QuantizeLinear", ["x", "sc"], ["y"],
                     output_dtype=int(P.DataType.INT16))],
        {"x": x}, {"sc": sc.reshape(())}, opset=21,
    )
    assert q.dtype == np.int16
    np.testing.assert_array_equal(q, np.array([[5, -32, 1007]], np.int16))


def test_blocked_qdq_property_fuzz():
    """Random blocked-QDQ configurations (rank, quantize axis, block
    size, signed/unsigned, divisible and tail-block K) round-trip
    against a direct numpy expansion of the per-block scale/zp."""
    rng = np.random.default_rng(90)
    for trial in range(10):
        rank = int(rng.integers(2, 4))
        shape = tuple(int(rng.integers(2, 7)) for _ in range(rank))
        axis = int(rng.integers(0, rank))
        bs = int(rng.choice([2, 3, 4]))
        signed = bool(rng.integers(0, 2))
        k = shape[axis]
        nb = -(-k // bs)
        sshape = list(shape)
        sshape[axis] = nb
        dt = np.int8 if signed else np.uint8
        lo, hi = (-128, 127) if signed else (0, 255)
        q = rng.integers(lo, hi + 1, shape).astype(dt)
        sc = (rng.random(sshape) * 0.1 + 0.01).astype(np.float32)
        zp = rng.integers(lo, hi + 1, sshape).astype(dt)

        (y,) = run_graph(
            [P.make_node("DequantizeLinear", ["q", "sc", "zp"], ["y"],
                         axis=axis, block_size=bs)],
            {"q": q}, {"sc": sc, "zp": zp}, opset=21,
        )
        idx = np.minimum(np.arange(k) // bs, nb - 1)
        sc_e = np.take(sc, idx, axis=axis)
        zp_e = np.take(zp, idx, axis=axis)
        want = (q.astype(np.float32) - zp_e.astype(np.float32)) * sc_e
        np.testing.assert_allclose(y, want, rtol=1e-6, atol=1e-7)
