"""com.microsoft contrib-op lowerings (ORT-optimized model files).

onnxruntime's offline graph optimizer rewrites plain ONNX into fused
contrib nodes (FusedConv, SkipLayerNormalization, QLinear* elementwise,
packed-QKV Attention, ...) and users ship the optimized file; the
reference consumes those transparently because its engine IS onnxruntime
(reference: src/classifier.rs:348-350). These tests hand-build such graphs
(producer "onnxruntime", nodes in the com.microsoft domain, wire-format
round-tripped) and assert parity against numpy/torch oracles.
"""

from __future__ import annotations

import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P

ATOL = 1e-4
MS = "com.microsoft"


def _vi(name, dims, elem=P.DataType.FLOAT):
    return P.ValueInfoProto(
        name=name,
        type=P.TypeProto(tensor_type=P.TensorTypeProto(
            elem_type=elem,
            shape=P.TensorShapeProto(
                dim=[P.Dimension(dim_value=d) for d in dims]
            ),
        )),
    )


_DT_MAP = {
    np.dtype(np.float32): P.DataType.FLOAT,
    np.dtype(np.int64): P.DataType.INT64,
    np.dtype(np.int32): P.DataType.INT32,
    np.dtype(np.int8): P.DataType.INT8,
    np.dtype(np.uint8): P.DataType.UINT8,
}


def _tensor(name, arr):
    arr = np.asarray(arr)
    return P.TensorProto(name=name, data_type=_DT_MAP[arr.dtype],
                         dims=list(arr.shape), raw_data=arr.tobytes())


def _model(nodes, inputs, outputs, initializers, opset=17):
    graph = P.GraphProto(
        name="ort_optimized_graph",
        node=nodes,
        input=inputs,
        output=outputs,
        initializer=initializers,
    )
    m = P.ModelProto(
        ir_version=8,
        producer_name="onnxruntime",
        producer_version="1.22.0",
        graph=graph,
        opset_import=[
            P.OperatorSetId(domain="", version=opset),
            P.OperatorSetId(domain=MS, version=1),
        ],
    )
    # Round-trip through wire bytes so decode paths are exercised too.
    return P.decode_model(P.encode_model(m))


def _run(model_proto, *inputs, n_out=None):
    import jax

    model = import_onnx(model_proto)
    fwd = jax.jit(make_forward(model, precision="fp32"))
    outs = [np.asarray(o) for o in fwd(model.params, *inputs)]
    return outs if n_out is None else outs[:n_out]


def _rng(seed=0):
    return np.random.default_rng(seed)


# ---------------------------------------------------------------------------
# fused float ops
# ---------------------------------------------------------------------------


def test_fused_conv_relu_with_residual():
    torch = pytest.importorskip("torch")
    r = _rng(1)
    x = r.standard_normal((2, 3, 16, 16), dtype=np.float32)
    w = (r.standard_normal((8, 3, 3, 3)) * 0.2).astype(np.float32)
    b = r.standard_normal(8).astype(np.float32)
    z = r.standard_normal((2, 8, 16, 16), dtype=np.float32)
    node = P.make_node("FusedConv", ["x", "w", "b", "z"], ["y"], domain=MS,
                       activation="Relu", kernel_shape=[3, 3],
                       pads=[1, 1, 1, 1], strides=[1, 1])
    m = _model([node], [_vi("x", x.shape), _vi("z", z.shape)],
               [_vi("y", (2, 8, 16, 16))], [_tensor("w", w), _tensor("b", b)])
    (got,) = _run(m, x, z)
    want = torch.relu(
        torch.nn.functional.conv2d(
            torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
            padding=1,
        ) + torch.from_numpy(z)
    ).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fused_conv_leaky_relu_params():
    torch = pytest.importorskip("torch")
    r = _rng(2)
    x = r.standard_normal((1, 4, 10, 10), dtype=np.float32)
    w = (r.standard_normal((6, 4, 1, 1)) * 0.3).astype(np.float32)
    node = P.make_node("FusedConv", ["x", "w"], ["y"], domain=MS,
                       activation="LeakyRelu", activation_params=[0.2],
                       kernel_shape=[1, 1])
    m = _model([node], [_vi("x", x.shape)], [_vi("y", (1, 6, 10, 10))],
               [_tensor("w", w)])
    (got,) = _run(m, x)
    want = torch.nn.functional.leaky_relu(
        torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w)),
        0.2,
    ).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fused_gemm_clip_activation_alpha_beta():
    r = _rng(3)
    a = r.standard_normal((4, 5), dtype=np.float32)
    w = r.standard_normal((5, 3), dtype=np.float32)
    c = r.standard_normal(3).astype(np.float32)
    node = P.make_node("FusedGemm", ["a", "w", "c"], ["y"], domain=MS,
                       activation="Clip", activation_alpha=-0.5,
                       activation_beta=0.5)
    m = _model([node], [_vi("a", a.shape)], [_vi("y", (4, 3))],
               [_tensor("w", w), _tensor("c", c)])
    (got,) = _run(m, a)
    np.testing.assert_allclose(got, np.clip(a @ w + c, -0.5, 0.5), atol=ATOL)


def test_fused_matmul_transposes_and_alpha():
    r = _rng(4)
    a = r.standard_normal((2, 5, 4), dtype=np.float32)
    b = r.standard_normal((2, 6, 5), dtype=np.float32)
    node = P.make_node("FusedMatMul", ["a", "b"], ["y"], domain=MS,
                       transA=1, transB=1, alpha=0.125)
    m = _model([node], [_vi("a", a.shape), _vi("b", b.shape)],
               [_vi("y", (2, 4, 6))], [])
    (got,) = _run(m, a, b)
    want = 0.125 * np.swapaxes(a, -1, -2) @ np.swapaxes(b, -1, -2)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_gelu_family():
    torch = pytest.importorskip("torch")
    r = _rng(5)
    x = r.standard_normal((3, 17), dtype=np.float32)
    bias = r.standard_normal(17).astype(np.float32)
    xt = torch.from_numpy(x)
    bt = torch.from_numpy(bias)

    def one(op_name, inputs, want, **attrs):
        node = P.make_node(op_name, inputs, ["y"], domain=MS, **attrs)
        m = _model([node], [_vi("x", x.shape)], [_vi("y", x.shape)],
                   [_tensor("bias", bias)] if "bias" in inputs else [])
        (got,) = _run(m, x)
        np.testing.assert_allclose(got, want, atol=ATOL, err_msg=op_name)

    one("FastGelu", ["x", "bias"],
        torch.nn.functional.gelu(xt + bt, approximate="tanh").numpy())
    one("FastGelu", ["x"],
        torch.nn.functional.gelu(xt, approximate="tanh").numpy())
    one("BiasGelu", ["x", "bias"],
        torch.nn.functional.gelu(xt + bt, approximate="none").numpy())
    one("QuickGelu", ["x"],
        (xt * torch.sigmoid(1.702 * xt)).numpy())
    one("QuickGelu", ["x"], (xt * torch.sigmoid(0.5 * xt)).numpy(), alpha=0.5)
    # com.microsoft.Gelu falls back to the core erf Gelu (same semantics)
    one("Gelu", ["x"], torch.nn.functional.gelu(xt).numpy())


def test_gemm_fast_gelu():
    torch = pytest.importorskip("torch")
    r = _rng(6)
    x = r.standard_normal((4, 8), dtype=np.float32)
    w = r.standard_normal((8, 6), dtype=np.float32)
    b = r.standard_normal(6).astype(np.float32)
    node = P.make_node("GemmFastGelu", ["x", "w", "b"], ["y"], domain=MS)
    m = _model([node], [_vi("x", x.shape)], [_vi("y", (4, 6))],
               [_tensor("w", w), _tensor("b", b)])
    (got,) = _run(m, x)
    want = torch.nn.functional.gelu(
        torch.from_numpy(x @ w + b), approximate="tanh"
    ).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_bias_add_and_bias_softmax():
    r = _rng(7)
    x = r.standard_normal((2, 5, 8), dtype=np.float32)
    bias = r.standard_normal(8).astype(np.float32)
    skip = r.standard_normal((2, 5, 8), dtype=np.float32)
    node = P.make_node("BiasAdd", ["x", "bias", "skip"], ["y"], domain=MS)
    m = _model([node], [_vi("x", x.shape), _vi("skip", skip.shape)],
               [_vi("y", x.shape)], [_tensor("bias", bias)])
    (got,) = _run(m, x, skip)
    np.testing.assert_allclose(got, x + bias + skip, atol=ATOL)

    logits = r.standard_normal((2, 4, 5, 5), dtype=np.float32)
    b2 = r.standard_normal((2, 4, 5, 5)).astype(np.float32)
    node = P.make_node("BiasSoftmax", ["l", "b2"], ["y"], domain=MS, axis=-1)
    m = _model([node], [_vi("l", logits.shape), _vi("b2", b2.shape)],
               [_vi("y", logits.shape)], [])
    (got,) = _run(m, logits, b2)
    s = logits + b2
    e = np.exp(s - s.max(-1, keepdims=True))
    np.testing.assert_allclose(got, e / e.sum(-1, keepdims=True), atol=ATOL)


def test_bias_softmax_default_axis_flattens_like_legacy_softmax():
    """The contrib op's default axis is 1 with coerce-to-2D semantics:
    softmax over ALL dims >= axis, not a single axis."""
    r = _rng(30)
    x = r.standard_normal((2, 3, 4), dtype=np.float32)
    bias = r.standard_normal((2, 3, 4)).astype(np.float32)
    node = P.make_node("BiasSoftmax", ["x", "b"], ["y"], domain=MS)
    m = _model([node], [_vi("x", x.shape), _vi("b", bias.shape)],
               [_vi("y", x.shape)], [])
    (got,) = _run(m, x, bias)
    s = (x + bias).reshape(2, 12)
    e = np.exp(s - s.max(-1, keepdims=True))
    want = (e / e.sum(-1, keepdims=True)).reshape(2, 3, 4)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_bias_softmax_inner_broadcast():
    """is_inner_broadcast=1: bias spans the LEADING dims and broadcasts
    along the inner (softmax) dims."""
    r = _rng(31)
    x = r.standard_normal((2, 3, 4), dtype=np.float32)
    bias = r.standard_normal((2,)).astype(np.float32)
    node = P.make_node("BiasSoftmax", ["x", "b"], ["y"], domain=MS,
                       axis=1, is_inner_broadcast=1)
    m = _model([node], [_vi("x", x.shape), _vi("b", bias.shape)],
               [_vi("y", x.shape)], [])
    (got,) = _run(m, x, bias)
    s = (x + bias[:, None, None]).reshape(2, 12)
    e = np.exp(s - s.max(-1, keepdims=True))
    want = (e / e.sum(-1, keepdims=True)).reshape(2, 3, 4)
    np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# skip/simplified layer norms
# ---------------------------------------------------------------------------


def _ln_oracle(s, gamma, beta, eps):
    mean = s.mean(-1, keepdims=True)
    var = s.var(-1, keepdims=True)
    inv = 1.0 / np.sqrt(var + eps)
    y = (s - mean) * inv * gamma
    return (y + beta if beta is not None else y), mean, inv


def test_skip_layer_normalization_all_outputs():
    r = _rng(8)
    x = r.standard_normal((2, 3, 16), dtype=np.float32)
    skip = r.standard_normal((2, 3, 16), dtype=np.float32)
    gamma = r.standard_normal(16).astype(np.float32)
    beta = r.standard_normal(16).astype(np.float32)
    bias = r.standard_normal(16).astype(np.float32)
    node = P.make_node(
        "SkipLayerNormalization", ["x", "skip", "g", "b", "bias"],
        ["y", "mean", "inv", "sum"], domain=MS, epsilon=1e-5,
    )
    m = _model(
        [node], [_vi("x", x.shape), _vi("skip", skip.shape)],
        [_vi("y", x.shape), _vi("mean", (2, 3, 1)), _vi("inv", (2, 3, 1)),
         _vi("sum", x.shape)],
        [_tensor("g", gamma), _tensor("b", beta), _tensor("bias", bias)],
    )
    y, mean, inv, total = _run(m, x, skip)
    s = x + skip + bias
    want_y, want_mean, want_inv = _ln_oracle(s, gamma, beta, 1e-5)
    np.testing.assert_allclose(y, want_y, atol=ATOL)
    np.testing.assert_allclose(mean, want_mean, atol=ATOL)
    np.testing.assert_allclose(inv, want_inv, rtol=1e-4)
    np.testing.assert_allclose(total, s, atol=ATOL)


def test_skip_simplified_layer_normalization():
    r = _rng(9)
    x = r.standard_normal((2, 4, 8), dtype=np.float32)
    skip = r.standard_normal((2, 4, 8), dtype=np.float32)
    gamma = r.standard_normal(8).astype(np.float32)
    node = P.make_node("SkipSimplifiedLayerNormalization",
                       ["x", "skip", "g"], ["y"], domain=MS, epsilon=1e-6)
    m = _model([node], [_vi("x", x.shape), _vi("skip", skip.shape)],
               [_vi("y", x.shape)], [_tensor("g", gamma)])
    (got,) = _run(m, x, skip)
    s = x + skip
    want = s / np.sqrt((s * s).mean(-1, keepdims=True) + 1e-6) * gamma
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_simplified_layer_normalization_core_domain():
    """ORT emits SimplifiedLayerNormalization with an EMPTY domain."""
    r = _rng(10)
    x = r.standard_normal((3, 12), dtype=np.float32)
    scale = r.standard_normal(12).astype(np.float32)
    node = P.make_node("SimplifiedLayerNormalization", ["x", "s"], ["y"],
                       axis=-1, epsilon=1e-5)  # note: domain=""
    m = _model([node], [_vi("x", x.shape)], [_vi("y", x.shape)],
               [_tensor("s", scale)])
    (got,) = _run(m, x)
    want = x / np.sqrt((x * x).mean(-1, keepdims=True) + 1e-5) * scale
    np.testing.assert_allclose(got, want, atol=ATOL)


# ---------------------------------------------------------------------------
# NhwcConv
# ---------------------------------------------------------------------------


def test_nhwc_conv_matches_torch():
    torch = pytest.importorskip("torch")
    r = _rng(11)
    x_nchw = r.standard_normal((2, 3, 9, 11), dtype=np.float32)
    w_oihw = (r.standard_normal((5, 3, 3, 3)) * 0.2).astype(np.float32)
    b = r.standard_normal(5).astype(np.float32)
    x = np.ascontiguousarray(np.moveaxis(x_nchw, 1, -1))  # NHWC
    w = np.ascontiguousarray(np.moveaxis(w_oihw, 1, -1))  # [M,kH,kW,C]
    node = P.make_node("NhwcConv", ["x", "w", "b"], ["y"], domain=MS,
                       kernel_shape=[3, 3], pads=[1, 1, 1, 1],
                       strides=[2, 2])
    m = _model([node], [_vi("x", x.shape)], [_vi("y", (2, 5, 6, 5))],
               [_tensor("w", w), _tensor("b", b)])
    (got,) = _run(m, x)
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x_nchw), torch.from_numpy(w_oihw),
        torch.from_numpy(b), stride=2, padding=1,
    ).numpy()
    np.testing.assert_allclose(got, np.moveaxis(want, 1, -1), atol=ATOL)


# ---------------------------------------------------------------------------
# QLinear* family
# ---------------------------------------------------------------------------


def _q(x, s, zp):
    info = np.iinfo(zp.dtype)
    return np.clip(np.round(x / s) + zp, info.min, info.max).astype(zp.dtype)


def _dq(q, s, zp):
    return (q.astype(np.float32) - np.float32(zp)) * np.float32(s)


def test_qlinear_add_mul():
    r = _rng(12)
    a = r.integers(0, 255, (3, 7), dtype=np.uint8)
    b = r.integers(0, 255, (3, 7), dtype=np.uint8)
    a_s, a_zp = np.float32(0.02), np.uint8(120)
    b_s, b_zp = np.float32(0.05), np.uint8(128)
    c_s, c_zp = np.float32(0.07), np.uint8(110)
    for op_name, fn in [("QLinearAdd", np.add), ("QLinearMul", np.multiply)]:
        node = P.make_node(
            op_name,
            ["a", "a_s", "a_zp", "b", "b_s", "b_zp", "c_s", "c_zp"], ["y"],
            domain=MS,
        )
        m = _model(
            [node],
            [_vi("a", a.shape, P.DataType.UINT8),
             _vi("b", b.shape, P.DataType.UINT8)],
            [_vi("y", a.shape, P.DataType.UINT8)],
            [_tensor("a_s", a_s), _tensor("a_zp", a_zp),
             _tensor("b_s", b_s), _tensor("b_zp", b_zp),
             _tensor("c_s", c_s), _tensor("c_zp", c_zp)],
        )
        (got,) = _run(m, a, b)
        want = _q(fn(_dq(a, a_s, a_zp), _dq(b, b_s, b_zp)), c_s, c_zp)
        # round-half-even ties may land one code apart
        assert np.abs(got.astype(int) - want.astype(int)).max() <= 1, op_name


def test_qlinear_sigmoid_and_leaky_relu():
    r = _rng(13)
    x = r.integers(-128, 127, (4, 9), dtype=np.int8)
    x_s, x_zp = np.float32(0.04), np.int8(3)
    y_s, y_zp = np.float32(0.004), np.int8(-128)
    node = P.make_node("QLinearSigmoid",
                       ["x", "x_s", "x_zp", "y_s", "y_zp"], ["y"], domain=MS)
    m = _model([node], [_vi("x", x.shape, P.DataType.INT8)],
               [_vi("y", x.shape, P.DataType.INT8)],
               [_tensor("x_s", x_s), _tensor("x_zp", x_zp),
                _tensor("y_s", y_s), _tensor("y_zp", y_zp)])
    (got,) = _run(m, x)
    want = _q(1.0 / (1.0 + np.exp(-_dq(x, x_s, x_zp))), y_s, y_zp)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1

    y_s2, y_zp2 = np.float32(0.04), np.int8(3)
    node = P.make_node("QLinearLeakyRelu",
                       ["x", "x_s", "x_zp", "y_s", "y_zp"], ["y"], domain=MS,
                       alpha=0.1)
    m = _model([node], [_vi("x", x.shape, P.DataType.INT8)],
               [_vi("y", x.shape, P.DataType.INT8)],
               [_tensor("x_s", x_s), _tensor("x_zp", x_zp),
                _tensor("y_s", y_s2), _tensor("y_zp", y_zp2)])
    (got,) = _run(m, x)
    xf = _dq(x, x_s, x_zp)
    want = _q(np.where(xf >= 0, xf, 0.1 * xf), y_s2, y_zp2)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_qlinear_global_average_pool_channels_last():
    r = _rng(14)
    x = r.integers(0, 255, (2, 6, 5, 4), dtype=np.uint8)  # NHWC
    x_s, x_zp = np.float32(0.03), np.uint8(128)
    y_s, y_zp = np.float32(0.03), np.uint8(128)
    node = P.make_node("QLinearGlobalAveragePool",
                       ["x", "x_s", "x_zp", "y_s", "y_zp"], ["y"], domain=MS,
                       channels_last=1)
    m = _model([node], [_vi("x", x.shape, P.DataType.UINT8)],
               [_vi("y", (2, 1, 1, 4), P.DataType.UINT8)],
               [_tensor("x_s", x_s), _tensor("x_zp", x_zp),
                _tensor("y_s", y_s), _tensor("y_zp", y_zp)])
    (got,) = _run(m, x)
    want = _q(_dq(x, x_s, x_zp).mean(axis=(1, 2), keepdims=True), y_s, y_zp)
    assert got.shape == (2, 1, 1, 4)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_qlinear_concat():
    r = _rng(15)
    a = r.integers(0, 255, (2, 3), dtype=np.uint8)
    b = r.integers(0, 255, (2, 5), dtype=np.uint8)
    scales = dict(y_s=np.float32(0.05), y_zp=np.uint8(100),
                  a_s=np.float32(0.02), a_zp=np.uint8(10),
                  b_s=np.float32(0.09), b_zp=np.uint8(200))
    node = P.make_node(
        "QLinearConcat",
        ["y_s", "y_zp", "a", "a_s", "a_zp", "b", "b_s", "b_zp"], ["y"],
        domain=MS, axis=1,
    )
    m = _model([node],
               [_vi("a", a.shape, P.DataType.UINT8),
                _vi("b", b.shape, P.DataType.UINT8)],
               [_vi("y", (2, 8), P.DataType.UINT8)],
               [_tensor(k, v) for k, v in scales.items()])
    (got,) = _run(m, a, b)
    want = _q(
        np.concatenate(
            [_dq(a, scales["a_s"], scales["a_zp"]),
             _dq(b, scales["b_s"], scales["b_zp"])], axis=1,
        ), scales["y_s"], scales["y_zp"],
    )
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1


def test_qlinear_add_int8_output_dtype_when_zp_omitted():
    """Omitted output zero point: zp=0 with the INPUT's dtype (an int8
    graph must not flip to uint8 and clamp negatives to zero)."""
    r = _rng(32)
    a = r.integers(-128, 127, (3, 5), dtype=np.int8)
    b = r.integers(-128, 127, (3, 5), dtype=np.int8)
    a_s, a_zp = np.float32(0.02), np.int8(0)
    b_s, b_zp = np.float32(0.02), np.int8(0)
    c_s = np.float32(0.05)
    node = P.make_node(
        "QLinearAdd", ["a", "a_s", "a_zp", "b", "b_s", "b_zp", "c_s"], ["y"],
        domain=MS,
    )
    m = _model([node],
               [_vi("a", a.shape, P.DataType.INT8),
                _vi("b", b.shape, P.DataType.INT8)],
               [_vi("y", a.shape, P.DataType.INT8)],
               [_tensor("a_s", a_s), _tensor("a_zp", a_zp),
                _tensor("b_s", b_s), _tensor("b_zp", b_zp),
                _tensor("c_s", c_s)])
    (got,) = _run(m, a, b)
    assert got.dtype == np.int8
    want = _q(_dq(a, a_s, a_zp) + _dq(b, b_s, b_zp), c_s, np.int8(0))
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    assert got.min() < 0  # negatives survive (uint8 would have clamped)


def test_matmul_integer_to_float_per_row_a_scale():
    r = _rng(33)
    a = r.integers(-100, 100, (3, 6), dtype=np.int8)
    b = r.integers(-100, 100, (6, 4), dtype=np.int8)
    a_s = np.array([0.01, 0.02, 0.03], dtype=np.float32)  # per-row [M]
    b_s = np.float32(0.05)
    node = P.make_node("MatMulIntegerToFloat", ["a", "b", "a_s", "b_s"],
                       ["y"], domain=MS)
    m = _model([node], [_vi("a", a.shape, P.DataType.INT8)],
               [_vi("y", (3, 4))],
               [_tensor("b", b), _tensor("a_s", a_s), _tensor("b_s", b_s)])
    (got,) = _run(m, a)
    want = (a.astype(np.int32) @ b.astype(np.int32)).astype(np.float32) \
        * (a_s[:, None] * b_s)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_matmul_integer_to_float_with_bias():
    r = _rng(16)
    a = r.integers(-100, 100, (3, 6), dtype=np.int8)
    b = r.integers(-100, 100, (6, 4), dtype=np.int8)
    a_s, b_s = np.float32(0.01), np.float32(0.02)
    bias = r.standard_normal(4).astype(np.float32)
    node = P.make_node("MatMulIntegerToFloat",
                       ["a", "b", "a_s", "b_s", "", "", "bias"], ["y"],
                       domain=MS)
    m = _model([node], [_vi("a", a.shape, P.DataType.INT8)],
               [_vi("y", (3, 4))],
               [_tensor("b", b), _tensor("a_s", a_s), _tensor("b_s", b_s),
                _tensor("bias", bias)])
    (got,) = _run(m, a)
    want = (a.astype(np.int32) @ b.astype(np.int32)).astype(np.float32) \
        * (a_s * b_s) + bias
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_dynamic_quantize_matmul():
    r = _rng(17)
    a = r.standard_normal((4, 8)).astype(np.float32)
    b = r.integers(-100, 100, (8, 5), dtype=np.int8)
    b_s = np.float32(0.015)
    node = P.make_node("DynamicQuantizeMatMul", ["a", "b", "b_s"], ["y"],
                       domain=MS)
    m = _model([node], [_vi("a", a.shape)], [_vi("y", (4, 5))],
               [_tensor("b", b), _tensor("b_s", b_s)])
    (got,) = _run(m, a)
    # oracle: the spec'd DynamicQuantizeLinear then exact int32 matmul
    x_min, x_max = min(a.min(), 0.0), max(a.max(), 0.0)
    a_s = np.float32((x_max - x_min) / 255.0)
    a_zp = np.clip(np.round(-x_min / a_s), 0, 255).astype(np.uint8)
    a_q = np.clip(np.round(a / a_s) + a_zp, 0, 255).astype(np.uint8)
    acc = (a_q.astype(np.int32) - int(a_zp)) @ b.astype(np.int32)
    want = acc.astype(np.float32) * (a_s * b_s)
    # one quantization step of slack on top of the float tolerance
    np.testing.assert_allclose(got, want, atol=float(a_s * b_s) * 8 + ATOL)


# ---------------------------------------------------------------------------
# com.microsoft Attention (packed QKV)
# ---------------------------------------------------------------------------


def _attention_oracle(x, w, bias, num_heads, mask_keep=None, causal=False,
                      filt=-10000.0):
    b_sz, s, _ = x.shape
    h = w.shape[1] // 3
    qkv = x @ w + bias
    q, k, v = qkv[..., :h], qkv[..., h:2 * h], qkv[..., 2 * h:]
    d = h // num_heads

    def split(t):
        return t.reshape(b_sz, s, num_heads, d).transpose(0, 2, 1, 3)

    q, k, v = split(q), split(k), split(v)
    logits = q @ k.transpose(0, 1, 3, 2) / np.sqrt(d)
    if mask_keep is not None:
        logits = np.where(mask_keep[:, None, None, :], logits, logits + filt)
    if causal:
        tri = np.tril(np.ones((s, s), dtype=bool))
        logits = np.where(tri[None, None], logits, logits + filt)
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    y = probs @ v
    return y.transpose(0, 2, 1, 3).reshape(b_sz, s, h)


def _attention_model(x_shape, w, bias, mask_dims=None,
                     mask_elem=P.DataType.INT32, **attrs):
    inputs = ["x", "w", "bias"]
    vis = [_vi("x", x_shape)]
    if mask_dims is not None:
        inputs.append("mask")
        vis.append(_vi("mask", mask_dims, mask_elem))
    node = P.make_node("Attention", inputs, ["y"], domain=MS, **attrs)
    return _model([node], vis, [_vi("y", x_shape)],
                  [_tensor("w", w), _tensor("bias", bias)])


def test_ms_attention_self_attention():
    r = _rng(18)
    b_sz, s, hidden, heads = 2, 7, 16, 4
    x = r.standard_normal((b_sz, s, hidden), dtype=np.float32)
    w = (r.standard_normal((hidden, 3 * hidden)) * 0.2).astype(np.float32)
    bias = r.standard_normal(3 * hidden).astype(np.float32)
    m = _attention_model(x.shape, w, bias, num_heads=heads)
    (got,) = _run(m, x)
    want = _attention_oracle(x, w, bias, heads)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_ms_attention_matches_torch_sdpa():
    torch = pytest.importorskip("torch")
    r = _rng(19)
    b_sz, s, hidden, heads = 1, 6, 8, 2
    x = r.standard_normal((b_sz, s, hidden), dtype=np.float32)
    w = (r.standard_normal((hidden, 3 * hidden)) * 0.3).astype(np.float32)
    bias = np.zeros(3 * hidden, dtype=np.float32)
    m = _attention_model(x.shape, w, bias, num_heads=heads)
    (got,) = _run(m, x)
    qkv = torch.from_numpy(x @ w)
    q, k, v = qkv.split(hidden, dim=-1)

    def split(t):
        return t.reshape(b_sz, s, heads, hidden // heads).transpose(1, 2)

    want = torch.nn.functional.scaled_dot_product_attention(
        split(q), split(k), split(v)
    ).transpose(1, 2).reshape(b_sz, s, hidden).numpy()
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_ms_attention_qkv_hidden_sizes_and_scale():
    """Unequal Q/K vs V widths via qkv_hidden_sizes, plus an explicit
    scale attribute (overrides 1/sqrt(head_dim))."""
    r = _rng(36)
    b_sz, s, hidden, heads = 2, 5, 8, 2
    q_h = k_h = hidden
    v_h = 12  # different value width
    x = r.standard_normal((b_sz, s, hidden), dtype=np.float32)
    w = (r.standard_normal((hidden, q_h + k_h + v_h)) * 0.2).astype(
        np.float32
    )
    bias = r.standard_normal(q_h + k_h + v_h).astype(np.float32)
    scale = 0.25
    node = P.make_node("Attention", ["x", "w", "bias"], ["y"], domain=MS,
                       num_heads=heads, qkv_hidden_sizes=[q_h, k_h, v_h],
                       scale=scale)
    m = _model([node], [_vi("x", x.shape)], [_vi("y", (b_sz, s, v_h))],
               [_tensor("w", w), _tensor("bias", bias)])
    (got,) = _run(m, x)

    qkv = x @ w + bias
    q, k, v = qkv[..., :q_h], qkv[..., q_h:q_h + k_h], qkv[..., q_h + k_h:]

    def split(t, h_dim):
        return t.reshape(b_sz, s, heads, h_dim // heads).transpose(0, 2, 1, 3)

    q, k, v = split(q, q_h), split(k, k_h), split(v, v_h)
    logits = q @ k.transpose(0, 1, 3, 2) * scale
    e = np.exp(logits - logits.max(-1, keepdims=True))
    probs = e / e.sum(-1, keepdims=True)
    want = (probs @ v).transpose(0, 2, 1, 3).reshape(b_sz, s, v_h)
    assert got.shape == (b_sz, s, v_h)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_ms_attention_padding_mask_lengths():
    r = _rng(20)
    b_sz, s, hidden, heads = 2, 5, 8, 2
    x = r.standard_normal((b_sz, s, hidden), dtype=np.float32)
    w = (r.standard_normal((hidden, 3 * hidden)) * 0.2).astype(np.float32)
    bias = r.standard_normal(3 * hidden).astype(np.float32)
    lengths = np.array([3, 5], dtype=np.int32)  # [B] right-padding form
    m = _attention_model(x.shape, w, bias, mask_dims=[b_sz],
                         num_heads=heads)
    (got,) = _run(m, x, lengths)
    keep = np.arange(s)[None, :] < lengths[:, None]
    want = _attention_oracle(x, w, bias, heads, mask_keep=keep)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_ms_attention_raw_mask_and_causal():
    r = _rng(21)
    b_sz, s, hidden, heads = 2, 4, 8, 2
    x = r.standard_normal((b_sz, s, hidden), dtype=np.float32)
    w = (r.standard_normal((hidden, 3 * hidden)) * 0.2).astype(np.float32)
    bias = np.zeros(3 * hidden, dtype=np.float32)
    mask = np.array([[1, 1, 0, 1], [1, 0, 1, 1]], dtype=np.int32)
    m = _attention_model(x.shape, w, bias, mask_dims=[b_sz, s],
                         num_heads=heads, unidirectional=1)
    (got,) = _run(m, x, mask)
    want = _attention_oracle(x, w, bias, heads, mask_keep=mask != 0,
                             causal=True)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_ms_attention_per_query_masks():
    """3-D [B,S,T] and 4-D [B,1,M,M] per-query masks apply per query row,
    not collapsed to the last row's key mask."""
    r = _rng(34)
    b_sz, s, hidden, heads = 2, 4, 8, 2
    x = r.standard_normal((b_sz, s, hidden), dtype=np.float32)
    w = (r.standard_normal((hidden, 3 * hidden)) * 0.2).astype(np.float32)
    bias = np.zeros(3 * hidden, dtype=np.float32)
    mask3 = r.integers(0, 2, (b_sz, s, s), dtype=np.int32)
    mask3[..., 0] = 1  # keep at least one key per query

    def oracle_perquery(keep):
        h = hidden
        qkv = x @ w + bias
        q, k, v = qkv[..., :h], qkv[..., h:2 * h], qkv[..., 2 * h:]
        d = h // heads

        def split(t):
            return t.reshape(b_sz, s, heads, d).transpose(0, 2, 1, 3)

        q_, k_, v_ = split(q), split(k), split(v)
        logits = q_ @ k_.transpose(0, 1, 3, 2) / np.sqrt(d)
        logits = np.where(keep, logits, logits - 10000.0)
        e = np.exp(logits - logits.max(-1, keepdims=True))
        probs = e / e.sum(-1, keepdims=True)
        return (probs @ v_).transpose(0, 2, 1, 3).reshape(b_sz, s, h)

    m = _attention_model(x.shape, w, bias, mask_dims=[b_sz, s, s],
                         num_heads=heads)
    (got,) = _run(m, x, mask3)
    np.testing.assert_allclose(
        got, oracle_perquery((mask3 != 0)[:, None, :, :]), atol=ATOL
    )

    max_seq = s + 3  # 4-D form is sized to max_seq; live window is s×s
    mask4 = r.integers(0, 2, (b_sz, 1, max_seq, max_seq), dtype=np.int32)
    mask4[..., 0] = 1
    m = _attention_model(x.shape, w, bias,
                         mask_dims=[b_sz, 1, max_seq, max_seq],
                         num_heads=heads)
    (got,) = _run(m, x, mask4)
    np.testing.assert_allclose(
        got, oracle_perquery(mask4[:, :, :s, :s] != 0), atol=ATOL
    )


def test_ms_attention_packed_1d_mask_raises():
    r = _rng(35)
    b_sz, s, hidden = 2, 4, 8
    x = r.standard_normal((b_sz, s, hidden), dtype=np.float32)
    w = (r.standard_normal((hidden, 3 * hidden)) * 0.2).astype(np.float32)
    bias = np.zeros(3 * hidden, dtype=np.float32)
    m = _attention_model(x.shape, w, bias, mask_dims=[2 * b_sz], num_heads=2)
    packed = np.zeros(2 * b_sz, dtype=np.int32)
    with pytest.raises(NotImplementedError, match="begin/end"):
        _run(m, x, packed)


# ---------------------------------------------------------------------------
# dispatch behavior
# ---------------------------------------------------------------------------


def test_name_colliding_contrib_op_is_not_misdispatched():
    """com.microsoft.Unique has a different output contract than core
    Unique; the core-table fallback must not silently run it."""
    from birdnet_tpu.errors import ModelLoadError

    node = P.make_node("Unique", ["x"], ["y", "idx", "counts"], domain=MS)
    m = _model([node], [_vi("x", (4,))],
               [_vi("y", (4,)), _vi("idx", (4,), P.DataType.INT64),
                _vi("counts", (4,), P.DataType.INT64)], [])
    with pytest.raises(ModelLoadError, match="com.microsoft.Unique"):
        _run(m, np.zeros(4, np.float32))


def test_graduated_contrib_ops_fall_back_to_core():
    from birdnet_tpu.compiler.ops import get_lowering

    for name in ("Gelu", "LayerNormalization", "Trilu", "Range",
                 "GridSample"):
        assert get_lowering(name, MS) is get_lowering(name)
    with pytest.raises(NotImplementedError, match="vendor.Add"):
        get_lowering("Add", "vendor")


def test_unknown_contrib_op_names_the_domain():
    from birdnet_tpu.errors import ModelLoadError

    node = P.make_node("SomeProprietaryOp", ["x"], ["y"], domain=MS)
    m = _model([node], [_vi("x", (2, 2))], [_vi("y", (2, 2))], [])
    with pytest.raises(ModelLoadError, match="com.microsoft.SomeProprietaryOp"):
        _run(m, np.zeros((2, 2), np.float32))


def test_contrib_registry_is_reported():
    from birdnet_tpu.compiler.ops import supported_contrib_ops

    names = supported_contrib_ops()
    assert f"{MS}.FusedConv" in names
    assert f"{MS}.Attention" in names
    assert len(names) >= 15


def test_ms_attention_mask_filter_value():
    """Non-default mask_filter_value must flow into the masked logits (the
    attr was the one untested knob in the contrib registry audit)."""
    r = _rng(31)
    b_sz, s, hidden, heads = 2, 6, 8, 2
    x = r.standard_normal((b_sz, s, hidden), dtype=np.float32)
    w = (r.standard_normal((hidden, 3 * hidden)) * 0.2).astype(np.float32)
    bias = r.standard_normal(3 * hidden).astype(np.float32)
    keep = np.ones((b_sz, s), dtype=np.int32)
    keep[:, -2:] = 0  # mask the last two key positions
    filt = -1e4 / 4  # non-default value; big enough to zero the softmax
    m = _attention_model(x.shape, w, bias, mask_dims=list(keep.shape),
                         num_heads=heads, mask_filter_value=filt)
    (got,) = _run(m, x, keep)
    want = _attention_oracle(x, w, bias, heads,
                             mask_keep=keep.astype(bool), filt=filt)
    np.testing.assert_allclose(got, want, atol=2e-5)


# ---------------------------------------------------------------------------
# round 4: QGemm / QAttention / QLinearSoftmax / Inverse / MurmurHash3
# ---------------------------------------------------------------------------


def _quant_dq(q, s, zp):
    return (q.astype(np.float32) - np.float32(zp)) * np.float32(s)


def test_qgemm_float_output_with_int32_bias():
    rng = _rng(40)
    a_q = rng.integers(-100, 100, (4, 6), dtype=np.int8)
    b_q = rng.integers(-100, 100, (6, 5), dtype=np.int8)
    c = rng.integers(-500, 500, (5,), dtype=np.int32)
    a_s, a_zp = np.float32(0.03), np.int8(3)
    b_s, b_zp = np.float32(0.05), np.int8(-2)
    alpha = 1.5
    node = P.make_node(
        "QGemm", ["a", "as", "azp", "b", "bs", "bzp", "c"], ["y"],
        domain=MS, alpha=alpha,
    )
    m = _model(
        [node], [_vi("a", (4, 6), P.DataType.INT8)],
        [P.make_value_info("y", P.DataType.FLOAT, [4, 5])],
        [_tensor("as", a_s), _tensor("azp", a_zp), _tensor("b", b_q),
         _tensor("bs", b_s), _tensor("bzp", b_zp), _tensor("c", c)],
    )
    (y,) = _run(m, a_q)
    ref = alpha * (_quant_dq(a_q, a_s, a_zp) @ _quant_dq(b_q, b_s, b_zp))
    ref = ref + c.astype(np.float32) * (alpha * float(a_s) * float(b_s))
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-4)


def test_qgemm_per_column_scale_transB_quantized_output():
    rng = _rng(41)
    a_q = rng.integers(0, 200, (3, 6), dtype=np.uint8)
    b_q = rng.integers(-100, 100, (5, 6), dtype=np.int8)  # transB: [N,K]
    a_s, a_zp = np.float32(0.02), np.uint8(128)
    b_s = rng.uniform(0.01, 0.08, 5).astype(np.float32)  # per-col [N]
    b_zp = rng.integers(-4, 4, 5).astype(np.int8)
    y_s, y_zp = np.float32(0.1), np.int8(5)
    node = P.make_node(
        "QGemm", ["a", "as", "azp", "b", "bs", "bzp", "", "ys", "yzp"],
        ["y"], domain=MS, transB=1,
    )
    m = _model(
        [node], [_vi("a", (3, 6), P.DataType.UINT8)],
        [P.make_value_info("y", P.DataType.INT8, [3, 5])],
        [_tensor("as", a_s), _tensor("azp", a_zp), _tensor("b", b_q),
         _tensor("bs", b_s), _tensor("bzp", b_zp), _tensor("ys", y_s),
         _tensor("yzp", y_zp)],
    )
    (y,) = _run(m, a_q)
    bf = (b_q.astype(np.float32) - b_zp[:, None].astype(np.float32)) * (
        b_s[:, None]
    )
    ref_f = _quant_dq(a_q, a_s, a_zp) @ bf.T
    ref = np.clip(np.rint(ref_f / y_s) + int(y_zp), -128, 127).astype(np.int8)
    assert y.dtype == np.int8
    # rounding at the requant boundary may differ by 1 ulp on exact halves
    np.testing.assert_allclose(
        y.astype(np.int32), ref.astype(np.int32), atol=1
    )


def test_qattention_matches_dequantized_attention():
    """QAttention == float contrib Attention over the dequantized
    operands (the float path itself is torch-oracle-tested)."""
    rng = _rng(42)
    B, S, H, NH = 2, 5, 16, 2
    x_q = rng.integers(-100, 100, (B, S, H), dtype=np.int8)
    w_q = rng.integers(-100, 100, (H, 3 * H), dtype=np.int8)
    bias = rng.normal(size=3 * H).astype(np.float32)
    x_s, x_zp = np.float32(0.04), np.int8(2)
    w_s, w_zp = np.float32(0.03), np.int8(-1)

    qnode = P.make_node(
        "QAttention", ["x", "w", "bias", "xs", "ws", "", "xzp", "wzp"],
        ["y"], domain=MS, num_heads=NH, unidirectional=1,
    )
    qm = _model(
        [qnode], [_vi("x", (B, S, H), P.DataType.INT8)],
        [P.make_value_info("y", P.DataType.FLOAT, [B, S, H])],
        [_tensor("w", w_q), _tensor("bias", bias), _tensor("xs", x_s),
         _tensor("ws", w_s), _tensor("xzp", x_zp), _tensor("wzp", w_zp)],
    )
    (y,) = _run(qm, x_q)

    xf = _quant_dq(x_q, x_s, x_zp)
    wf = _quant_dq(w_q, w_s, w_zp)
    fnode = P.make_node(
        "Attention", ["x", "w", "bias"], ["y"], domain=MS,
        num_heads=NH, unidirectional=1,
    )
    fm = _model(
        [fnode], [_vi("x", (B, S, H))],
        [P.make_value_info("y", P.DataType.FLOAT, [B, S, H])],
        [_tensor("w", wf), _tensor("bias", bias)],
    )
    (ref,) = _run(fm, xf)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("opset_attr,axis", [(13, -1), (13, 1), (11, 1)])
def test_qlinear_softmax(opset_attr, axis):
    rng = _rng(43)
    x_q = rng.integers(-120, 120, (2, 3, 4), dtype=np.int8)
    x_s, x_zp = np.float32(0.05), np.int8(1)
    y_s, y_zp = np.float32(1.0 / 256), np.uint8(0)
    node = P.make_node(
        "QLinearSoftmax", ["x", "xs", "xzp", "ys", "yzp"], ["y"],
        domain=MS, axis=axis, opset=opset_attr,
    )
    m = _model(
        [node], [_vi("x", (2, 3, 4), P.DataType.INT8)],
        [P.make_value_info("y", P.DataType.UINT8, [2, 3, 4])],
        [_tensor("xs", x_s), _tensor("xzp", x_zp), _tensor("ys", y_s),
         _tensor("yzp", y_zp)],
    )
    (y,) = _run(m, x_q)
    xf = _quant_dq(x_q, x_s, x_zp)
    if opset_attr >= 13:
        e = np.exp(xf - xf.max(axis=axis, keepdims=True))
        sm = e / e.sum(axis=axis, keepdims=True)
    else:
        flat = xf.reshape(2, -1) if axis == 1 else xf.reshape(-1, 4)
        e = np.exp(flat - flat.max(axis=-1, keepdims=True))
        sm = (e / e.sum(axis=-1, keepdims=True)).reshape(xf.shape)
    ref = np.clip(np.rint(sm / y_s), 0, 255).astype(np.uint8)
    np.testing.assert_allclose(
        y.astype(np.int32), ref.astype(np.int32), atol=1
    )


def test_inverse_batched():
    rng = _rng(44)
    x = rng.normal(size=(3, 4, 4)).astype(np.float32)
    x += 4.0 * np.eye(4, dtype=np.float32)  # well-conditioned
    node = P.make_node("Inverse", ["x"], ["y"], domain=MS)
    m = _model([node], [_vi("x", x.shape)],
               [P.make_value_info("y", P.DataType.FLOAT, list(x.shape))], [])
    (y,) = _run(m, x)
    np.testing.assert_allclose(y, np.linalg.inv(x), rtol=1e-4, atol=1e-5)


def test_murmurhash3_int32_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.utils import murmurhash3_32

    rng = _rng(45)
    x = rng.integers(-(2**31), 2**31 - 1, size=12, dtype=np.int32)
    for positive in (1, 0):
        node = P.make_node(
            "MurmurHash3", ["x"], ["y"], domain=MS, seed=7, positive=positive,
        )
        out_dt = P.DataType.UINT32 if positive else P.DataType.INT32
        m = _model([node], [_vi("x", (12,), P.DataType.INT32)],
                   [P.make_value_info("y", out_dt, [12])], [])
        (y,) = _run(m, x)
        ref = np.asarray(
            [murmurhash3_32(int(v), seed=7, positive=bool(positive))
             for v in x],
            dtype=np.uint32 if positive else np.int32,
        )
        np.testing.assert_array_equal(np.asarray(y).astype(ref.dtype), ref)


def test_murmurhash3_float_and_static_paths_match_sklearn_bytes():
    from sklearn.utils import murmurhash3_32

    rng = _rng(46)
    x = rng.normal(size=6).astype(np.float32)
    node = P.make_node("MurmurHash3", ["x"], ["y"], domain=MS, seed=11)
    m = _model([node], [_vi("x", (6,), P.DataType.FLOAT)],
               [P.make_value_info("y", P.DataType.UINT32, [6])], [])
    (y,) = _run(m, x)
    ref = np.asarray(
        [murmurhash3_32(v.tobytes(), seed=11, positive=True) for v in x],
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(np.asarray(y).astype(np.uint32), ref)

    # static (initializer) int64 input: 8-byte little-endian blocks
    xi = np.array([1, -5, 2**40 + 3], dtype=np.int64)
    node = P.make_node("MurmurHash3", ["xi"], ["y"], domain=MS, seed=3)
    m = _model([node], [],
               [P.make_value_info("y", P.DataType.UINT32, [3])],
               [_tensor("xi", xi)])
    (y,) = _run(m)
    ref = np.asarray(
        [murmurhash3_32(v.tobytes(), seed=3, positive=True) for v in xi],
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(np.asarray(y).astype(np.uint32), ref)


def test_qlinear_reduce_mean():
    rng = _rng(47)
    x_q = rng.integers(0, 255, (2, 3, 4, 4), dtype=np.uint8)
    x_s, x_zp = np.float32(0.02), np.uint8(120)
    y_s, y_zp = np.float32(0.02), np.uint8(120)
    node = P.make_node(
        "QLinearReduceMean", ["x", "xs", "xzp", "ys", "yzp"], ["y"],
        domain=MS, axes=[2, 3], keepdims=1,
    )
    m = _model(
        [node], [_vi("x", (2, 3, 4, 4), P.DataType.UINT8)],
        [P.make_value_info("y", P.DataType.UINT8, [2, 3, 1, 1])],
        [_tensor("xs", x_s), _tensor("xzp", x_zp), _tensor("ys", y_s),
         _tensor("yzp", y_zp)],
    )
    (y,) = _run(m, x_q)
    xf = (x_q.astype(np.float32) - 120) * 0.02
    ref = np.clip(
        np.rint(xf.mean(axis=(2, 3), keepdims=True) / y_s) + 120, 0, 255
    ).astype(np.uint8)
    np.testing.assert_allclose(
        y.astype(np.int32), ref.astype(np.int32), atol=1
    )


# ---------------------------------------------------------------------------
# com.microsoft QuantizeLinear / DequantizeLinear — the pre-opset-21
# spelling of wide-type QDQ. ORT's quantizer emits these for int16/uint16
# activation quantization (QInt16/QUInt16 modes); the signature matches
# the core pair exactly and the zero point carries the target dtype.
# ---------------------------------------------------------------------------


def _tensor_u16(name, v):
    return P.TensorProto(name=name, data_type=P.DataType.UINT16,
                         dims=[], raw_data=np.uint16(v).tobytes())


def test_ms_qdq_int16_roundtrip():
    r = _rng(70)
    x = (r.standard_normal((2, 5)) * 3).astype(np.float32)
    sc = np.float32(0.002)
    zp = np.uint16(32768)

    nodes = [
        P.make_node("QuantizeLinear", ["x", "sc", "zp"], ["q"],
                    domain="com.microsoft"),
        P.make_node("DequantizeLinear", ["q", "sc", "zp"], ["y"],
                    domain="com.microsoft"),
    ]
    m = _model(nodes, [_vi("x", x.shape)], [_vi("y", x.shape)],
               [_tensor("sc", sc.reshape(())), _tensor_u16("zp", zp)])
    (y,) = _run(m, x)

    q = np.clip(np.round(x / sc) + 32768.0, 0, 65535)
    want = (q - 32768.0) * sc
    np.testing.assert_allclose(y, want, atol=1e-6)


def test_ms_dequantize_int32_bias():
    """int32 dequantize (conv/gemm bias path in ORT-quantized files)."""
    b = np.array([-120000, 0, 345678], np.int32)
    sc = np.float32(1.5e-4)

    nodes = [P.make_node("DequantizeLinear", ["b", "sc"], ["y"],
                         domain="com.microsoft")]
    m = _model(
        nodes, [], [_vi("y", b.shape)],
        [_tensor("b", b), _tensor("sc", sc.reshape(()))],
    )
    import jax

    from birdnet_tpu.compiler.importer import import_onnx, make_forward

    model = import_onnx(m)
    fwd = jax.jit(make_forward(model, precision="fp32"))
    (y,) = [np.asarray(o) for o in fwd(model.params)]
    np.testing.assert_allclose(y, b.astype(np.float32) * sc, rtol=1e-6)
