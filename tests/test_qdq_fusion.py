"""Tests for the QDQ graph rewrites (sink / fuse / collapse / DCE).

Strategy: build QDQ-format graphs (the standard fake-quantized export
format), import them with and without the optimizer, and require (a) the
optimized graph to contain the fused QLinear* ops, (b) both paths to agree
within one quantization step (the fused path computes the exact integer
math; the unfused path simulates it in float).
"""

import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P


def _build(nodes, inputs, inits, outputs=("y",), opset=17):
    init = [P.TensorProto.from_numpy(v, name=k) for k, v in inits.items()]
    in_vis = [
        P.make_value_info(k, P._NUMPY_TO_DTYPE[np.asarray(v).dtype],
                          list(np.asarray(v).shape))
        for k, v in inputs.items()
    ]
    out_vis = [P.make_value_info(n, P.DataType.FLOAT, []) for n in outputs]
    graph = P.GraphProto(
        name="t", node=nodes, initializer=init, input=in_vis, output=out_vis
    )
    return P.make_model(graph, opset_version=opset)


def _run(model, inputs, optimize):
    imported = import_onnx(model, optimize=optimize)
    fwd = make_forward(imported)
    outs = fwd(imported.params, *[np.asarray(v) for v in inputs.values()])
    return imported, [np.asarray(o) for o in outs]


def _ops(imported):
    return [n.op_type for n in imported.graph.node]


@pytest.fixture(scope="module")
def irng():
    return np.random.default_rng(7)


def _qdq_conv_model(seed, per_channel=True, with_relu=True, bias_mode="float"):
    """x_f32 → Q → DQ → Conv(+bias) (→Relu) → Q → DQ → y_f32."""
    irng = np.random.default_rng(seed)
    x = (irng.random((1, 3, 12, 12), dtype=np.float32) - 0.5) * 4
    wq = irng.integers(-127, 128, size=(8, 3, 3, 3)).astype(np.int8)
    ws = (
        (irng.random(8).astype(np.float32) * 0.02 + 0.005)
        if per_channel
        else np.float32(0.01)
    )
    b_f = (irng.random(8).astype(np.float32) - 0.5) * 0.2
    inits = {
        "xs": np.float32(0.02),
        "xzp": np.int8(0),
        "wq": wq,
        "ws": ws,
        "wzp": np.zeros(8, np.int8) if per_channel else np.int8(0),
        "ys": np.float32(0.05),
        "yzp": np.int8(-3),
    }
    nodes = [
        P.make_node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "xs", "xzp"], ["xf"]),
        P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"], axis=0),
    ]
    conv_inputs = ["xf", "wf"]
    if bias_mode == "float":
        inits["b"] = b_f
        conv_inputs.append("b")
    elif bias_mode == "int32_dq":
        scale = 0.02 * np.asarray(ws, np.float64).reshape(-1)
        inits["bq"] = np.rint(b_f / scale).astype(np.int32)
        inits["bs"] = scale.astype(np.float32)
        nodes.append(P.make_node("DequantizeLinear", ["bq", "bs"], ["bf"], axis=0))
        conv_inputs.append("bf")
    nodes.append(
        P.make_node("Conv", conv_inputs, ["c"], pads=[1, 1, 1, 1], strides=[1, 1])
    )
    last = "c"
    if with_relu:
        nodes.append(P.make_node("Relu", [last], ["r"]))
        last = "r"
    nodes += [
        P.make_node("QuantizeLinear", [last, "ys", "yzp"], ["yq"]),
        P.make_node("DequantizeLinear", ["yq", "ys", "yzp"], ["y"]),
    ]
    return _build(nodes, {"x": x}, inits), {"x": x}


@pytest.mark.parametrize("per_channel", [False, True])
@pytest.mark.parametrize("bias_mode", ["float", "int32_dq", "none"])
def test_fuse_conv_qdq(per_channel, bias_mode):
    model, inputs = _qdq_conv_model(11, per_channel, True, bias_mode)
    ref_model, _ = _qdq_conv_model(11, per_channel, True, bias_mode)
    imported, (y_fused,) = _run(model, inputs, optimize=True)
    ops = _ops(imported)
    assert "QLinearConv" in ops
    assert "Conv" not in ops and "Relu" not in ops
    _, (y_ref,) = _run(ref_model, inputs, optimize=False)
    # one quantization step of tolerance at the float/int boundary
    np.testing.assert_allclose(y_fused, y_ref, atol=0.05 + 1e-6)
    assert (y_fused >= -3 * 0.05 * 1.0001 - 1e-6).all()  # relu floor at zp


def test_fuse_without_relu():
    model, inputs = _qdq_conv_model(12, True, with_relu=False)
    imported, (y_fused,) = _run(model, inputs, optimize=True)
    assert "QLinearConv" in _ops(imported)
    node = next(n for n in imported.graph.node if n.op_type == "QLinearConv")
    assert "_fused_relu" not in node.attrs


def test_fuse_matmul_qdq(irng):
    a = (irng.random((4, 16), dtype=np.float32) - 0.5) * 2
    wq = irng.integers(-127, 128, size=(16, 6)).astype(np.int8)
    ws = (irng.random(6).astype(np.float32) * 0.03 + 0.01)
    inits = {
        "as_": np.float32(0.01),
        "azp": np.int8(0),
        "wq": wq,
        "ws": ws,
        "wzp": np.zeros(6, np.int8),
        "ys": np.float32(0.04),
        "yzp": np.int8(0),
    }
    nodes = [
        P.make_node("QuantizeLinear", ["a", "as_", "azp"], ["aq"]),
        P.make_node("DequantizeLinear", ["aq", "as_", "azp"], ["af"]),
        P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"], axis=1),
        P.make_node("MatMul", ["af", "wf"], ["m"]),
        P.make_node("QuantizeLinear", ["m", "ys", "yzp"], ["mq"]),
        P.make_node("DequantizeLinear", ["mq", "ys", "yzp"], ["y"]),
    ]
    model = _build(nodes, {"a": a}, inits)
    imported, (y_fused,) = _run(model, {"a": a}, optimize=True)
    assert "QLinearMatMul" in _ops(imported)
    model2 = _build(
        [
            P.make_node("QuantizeLinear", ["a", "as_", "azp"], ["aq"]),
            P.make_node("DequantizeLinear", ["aq", "as_", "azp"], ["af"]),
            P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"], axis=1),
            P.make_node("MatMul", ["af", "wf"], ["m"]),
            P.make_node("QuantizeLinear", ["m", "ys", "yzp"], ["mq"]),
            P.make_node("DequantizeLinear", ["mq", "ys", "yzp"], ["y"]),
        ],
        {"a": a},
        dict(inits),
    )
    _, (y_ref,) = _run(model2, {"a": a}, optimize=False)
    np.testing.assert_allclose(y_fused, y_ref, atol=0.04 + 1e-6)


def test_fuse_gemm_qdq(irng):
    a = (irng.random((3, 10), dtype=np.float32) - 0.5) * 2
    wq = irng.integers(-127, 128, size=(5, 10)).astype(np.int8)  # [N,K] transB
    ws = (irng.random(5).astype(np.float32) * 0.03 + 0.01)
    b_f = (irng.random(5).astype(np.float32) - 0.5)
    inits = {
        "as_": np.float32(0.012),
        "azp": np.int8(0),
        "wq": wq,
        "ws": ws,
        "wzp": np.zeros(5, np.int8),
        "b": b_f,
        "ys": np.float32(0.06),
        "yzp": np.int8(4),
    }
    nodes = [
        P.make_node("QuantizeLinear", ["a", "as_", "azp"], ["aq"]),
        P.make_node("DequantizeLinear", ["aq", "as_", "azp"], ["af"]),
        P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"], axis=0),
        P.make_node("Gemm", ["af", "wf", "b"], ["g"], transB=1),
        P.make_node("Relu", ["g"], ["r"]),
        P.make_node("QuantizeLinear", ["r", "ys", "yzp"], ["gq"]),
        P.make_node("DequantizeLinear", ["gq", "ys", "yzp"], ["y"]),
    ]
    model = _build(nodes, {"a": a}, inits)
    imported, (y_fused,) = _run(model, {"a": a}, optimize=True)
    assert "_QLinearGemm" in _ops(imported)
    # rebuild fresh nodes (the optimizer mutates them in place)
    nodes2 = [
        P.make_node("QuantizeLinear", ["a", "as_", "azp"], ["aq"]),
        P.make_node("DequantizeLinear", ["aq", "as_", "azp"], ["af"]),
        P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"], axis=0),
        P.make_node("Gemm", ["af", "wf", "b"], ["g"], transB=1),
        P.make_node("Relu", ["g"], ["r"]),
        P.make_node("QuantizeLinear", ["r", "ys", "yzp"], ["gq"]),
        P.make_node("DequantizeLinear", ["gq", "ys", "yzp"], ["y"]),
    ]
    _, (y_ref,) = _run(_build(nodes2, {"a": a}, dict(inits)), {"a": a}, optimize=False)
    np.testing.assert_allclose(y_fused, y_ref, atol=0.06 + 1e-6)


def test_gemm_alpha_blocks_fusion(irng):
    a = irng.random((2, 4), dtype=np.float32)
    wq = irng.integers(-127, 128, size=(4, 3)).astype(np.int8)
    inits = {
        "as_": np.float32(0.01), "azp": np.int8(0),
        "wq": wq, "ws": np.float32(0.02), "wzp": np.int8(0),
        "ys": np.float32(0.05), "yzp": np.int8(0),
    }
    nodes = [
        P.make_node("QuantizeLinear", ["a", "as_", "azp"], ["aq"]),
        P.make_node("DequantizeLinear", ["aq", "as_", "azp"], ["af"]),
        P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"]),
        P.make_node("Gemm", ["af", "wf"], ["g"], alpha=0.5),
        P.make_node("QuantizeLinear", ["g", "ys", "yzp"], ["gq"]),
        P.make_node("DequantizeLinear", ["gq", "ys", "yzp"], ["y"]),
    ]
    imported, _ = _run(_build(nodes, {"a": a}, inits), {"a": a}, optimize=True)
    assert "Gemm" in _ops(imported)


def test_per_channel_wrong_axis_blocks_fusion(irng):
    """Conv weights quantized along axis 1 (not output channels) can't fuse."""
    x = irng.random((1, 2, 6, 6), dtype=np.float32)
    wq = irng.integers(-127, 128, size=(4, 2, 3, 3)).astype(np.int8)
    inits = {
        "xs": np.float32(0.02), "xzp": np.int8(0),
        "wq": wq, "ws": np.array([0.01, 0.02], np.float32),
        "wzp": np.zeros(2, np.int8),
        "ys": np.float32(0.05), "yzp": np.int8(0),
    }
    nodes = [
        P.make_node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "xs", "xzp"], ["xf"]),
        P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"], axis=1),
        P.make_node("Conv", ["xf", "wf"], ["c"], pads=[1, 1, 1, 1]),
        P.make_node("QuantizeLinear", ["c", "ys", "yzp"], ["cq"]),
        P.make_node("DequantizeLinear", ["cq", "ys", "yzp"], ["y"]),
    ]
    imported, _ = _run(_build(nodes, {"x": x}, inits), {"x": x}, optimize=True)
    assert "Conv" in _ops(imported)
    assert "QLinearConv" not in _ops(imported)


def test_sink_maxpool_into_int_domain(irng):
    x = (irng.random((1, 2, 8, 8), dtype=np.float32) - 0.5) * 2
    inits = {
        "s": np.float32(0.02), "zp": np.int8(0),
    }
    nodes = [
        P.make_node("QuantizeLinear", ["x", "s", "zp"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "s", "zp"], ["xf"]),
        P.make_node("MaxPool", ["xf"], ["p"], kernel_shape=[2, 2], strides=[2, 2]),
        P.make_node("QuantizeLinear", ["p", "s", "zp"], ["pq"]),
        P.make_node("DequantizeLinear", ["pq", "s", "zp"], ["y"]),
    ]
    imported, (y,) = _run(_build(nodes, {"x": x}, inits), {"x": x}, optimize=True)
    ops = _ops(imported)
    # MaxPool runs on the int8 codes; one Q in, one DQ out
    assert ops.count("QuantizeLinear") == 1
    assert ops.count("DequantizeLinear") == 1
    assert "MaxPool" in ops
    # value check vs unoptimized
    nodes2 = [
        P.make_node("QuantizeLinear", ["x", "s", "zp"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "s", "zp"], ["xf"]),
        P.make_node("MaxPool", ["xf"], ["p"], kernel_shape=[2, 2], strides=[2, 2]),
        P.make_node("QuantizeLinear", ["p", "s", "zp"], ["pq"]),
        P.make_node("DequantizeLinear", ["pq", "s", "zp"], ["y"]),
    ]
    _, (y_ref,) = _run(_build(nodes2, {"x": x}, dict(inits)), {"x": x}, optimize=False)
    np.testing.assert_array_equal(y, y_ref)


def test_collapse_requant_roundtrip(irng):
    """DQ→Q with identical params cancels exactly."""
    x = (irng.random((4, 8), dtype=np.float32) - 0.5) * 3
    inits = {"s": np.float32(0.03), "zp": np.int8(5)}
    nodes = [
        P.make_node("QuantizeLinear", ["x", "s", "zp"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "s", "zp"], ["xf"]),
        P.make_node("QuantizeLinear", ["xf", "s", "zp"], ["xq2"]),
        P.make_node("DequantizeLinear", ["xq2", "s", "zp"], ["y"]),
    ]
    imported, (y,) = _run(_build(nodes, {"x": x}, inits), {"x": x}, optimize=True)
    ops = _ops(imported)
    assert ops.count("QuantizeLinear") == 1 and ops.count("DequantizeLinear") == 1
    nodes2 = [
        P.make_node("QuantizeLinear", ["x", "s", "zp"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "s", "zp"], ["y"]),
    ]
    _, (y_ref,) = _run(_build(nodes2, {"x": x}, dict(inits)), {"x": x}, optimize=False)
    np.testing.assert_array_equal(y, y_ref)


def test_two_conv_chain_stays_int8(irng):
    """Conv→pool→Conv with matching qparams: the whole middle runs int8."""
    x = (irng.random((1, 2, 8, 8), dtype=np.float32) - 0.5) * 2
    w1 = irng.integers(-127, 128, size=(4, 2, 3, 3)).astype(np.int8)
    w2 = irng.integers(-127, 128, size=(6, 4, 3, 3)).astype(np.int8)
    inits = {
        "xs": np.float32(0.02), "xzp": np.int8(0),
        "w1": w1, "w1s": np.float32(0.01), "w1zp": np.int8(0),
        "w2": w2, "w2s": np.float32(0.015), "w2zp": np.int8(0),
        "mid_s": np.float32(0.04), "mid_zp": np.int8(-8),
        "ys": np.float32(0.2), "yzp": np.int8(0),
    }
    nodes = [
        P.make_node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "xs", "xzp"], ["xf"]),
        P.make_node("DequantizeLinear", ["w1", "w1s", "w1zp"], ["w1f"]),
        P.make_node("Conv", ["xf", "w1f"], ["c1"], pads=[1, 1, 1, 1]),
        P.make_node("Relu", ["c1"], ["r1"]),
        P.make_node("QuantizeLinear", ["r1", "mid_s", "mid_zp"], ["c1q"]),
        P.make_node("DequantizeLinear", ["c1q", "mid_s", "mid_zp"], ["c1f"]),
        P.make_node("MaxPool", ["c1f"], ["p"], kernel_shape=[2, 2], strides=[2, 2]),
        P.make_node("QuantizeLinear", ["p", "mid_s", "mid_zp"], ["pq"]),
        P.make_node("DequantizeLinear", ["pq", "mid_s", "mid_zp"], ["pf"]),
        P.make_node("DequantizeLinear", ["w2", "w2s", "w2zp"], ["w2f"]),
        P.make_node("Conv", ["pf", "w2f"], ["c2"], pads=[1, 1, 1, 1]),
        P.make_node("QuantizeLinear", ["c2", "ys", "yzp"], ["c2q"]),
        P.make_node("DequantizeLinear", ["c2q", "ys", "yzp"], ["y"]),
    ]
    imported, (y,) = _run(_build(nodes, {"x": x}, inits), {"x": x}, optimize=True)
    ops = _ops(imported)
    assert ops.count("QLinearConv") == 2
    assert "Conv" not in ops and "Relu" not in ops
    # exactly one boundary Q (input) and one boundary DQ (output)
    assert ops.count("QuantizeLinear") == 1
    assert ops.count("DequantizeLinear") == 1
    assert np.isfinite(y).all()


def test_fusion_blocked_when_conv_output_shared(irng):
    """A Conv whose f32 output has a second consumer must stay unfused."""
    x = irng.random((1, 2, 6, 6), dtype=np.float32)
    wq = irng.integers(-127, 128, size=(3, 2, 3, 3)).astype(np.int8)
    inits = {
        "xs": np.float32(0.02), "xzp": np.int8(0),
        "wq": wq, "ws": np.float32(0.02), "wzp": np.int8(0),
        "ys": np.float32(0.05), "yzp": np.int8(0),
    }
    nodes = [
        P.make_node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "xs", "xzp"], ["xf"]),
        P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"]),
        P.make_node("Conv", ["xf", "wf"], ["c"], pads=[1, 1, 1, 1]),
        P.make_node("QuantizeLinear", ["c", "ys", "yzp"], ["cq"]),
        P.make_node("DequantizeLinear", ["cq", "ys", "yzp"], ["yq_f"]),
        P.make_node("Add", ["c", "yq_f"], ["y"]),  # second consumer of c
    ]
    imported, _ = _run(_build(nodes, {"x": x}, inits), {"x": x}, optimize=True)
    assert "Conv" in _ops(imported)
    assert "QLinearConv" not in _ops(imported)


def test_collapse_requant_absent_zp_int8_not_collapsed(irng):
    """DQ(int8)→Q with BOTH zero points absent must NOT collapse: the Q
    implies uint8 output (negatives clamp to 0), not an int8 passthrough."""
    x = ((irng.random((3, 8), dtype=np.float32) - 0.5) * 2).astype(np.float32)
    inits = {"s": np.float32(0.03), "zp8": np.int8(0)}
    nodes = [
        # produce an int8 tensor, then a zp-less DQ→Q round trip
        P.make_node("QuantizeLinear", ["x", "s", "zp8"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "s"], ["xf"]),
        P.make_node("QuantizeLinear", ["xf", "s"], ["xq2"]),  # uint8!
        P.make_node("DequantizeLinear", ["xq2", "s"], ["y"]),
    ]
    imported, (y,) = _run(_build(nodes, {"x": x}, inits), {"x": x}, optimize=True)
    ops = _ops(imported)
    assert ops.count("QuantizeLinear") == 2  # round trip kept
    nodes2 = [
        P.make_node("QuantizeLinear", ["x", "s", "zp8"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "s"], ["xf"]),
        P.make_node("QuantizeLinear", ["xf", "s"], ["xq2"]),
        P.make_node("DequantizeLinear", ["xq2", "s"], ["y"]),
    ]
    _, (y_ref,) = _run(_build(nodes2, {"x": x}, dict(inits)), {"x": x}, optimize=False)
    np.testing.assert_array_equal(y, y_ref)
    assert (y >= 0).all()  # uint8 semantics preserved: negatives clamped


def test_collapse_requant_absent_zp_uint8_collapses(irng):
    """DQ(uint8)→Q with both zps absent IS an exact round trip."""
    x = (irng.random((3, 8), dtype=np.float32) * 2).astype(np.float32)
    inits = {"s": np.float32(0.03)}
    nodes = [
        P.make_node("QuantizeLinear", ["x", "s"], ["xq"]),  # uint8
        P.make_node("DequantizeLinear", ["xq", "s"], ["xf"]),
        P.make_node("QuantizeLinear", ["xf", "s"], ["xq2"]),
        P.make_node("DequantizeLinear", ["xq2", "s"], ["y"]),
    ]
    imported, _ = _run(_build(nodes, {"x": x}, inits), {"x": x}, optimize=True)
    assert _ops(imported).count("QuantizeLinear") == 1


def test_fuse_silu_epilogue(irng):
    """Conv→Sigmoid→Mul(SiLU)→Q folds into the QLinearConv f32 epilogue —
    exact vs the unfused QDQ graph, and the elementwise nodes disappear."""
    x = (irng.random((1, 3, 10, 10), dtype=np.float32) - 0.5) * 2
    wq = irng.integers(-127, 128, size=(6, 3, 3, 3)).astype(np.int8)
    inits = {
        "xs": np.float32(0.02), "xzp": np.int8(0),
        "wq": wq, "ws": np.float32(0.01), "wzp": np.int8(0),
        "ys": np.float32(0.02), "yzp": np.int8(0),
    }
    def nodes():
        return [
            P.make_node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
            P.make_node("DequantizeLinear", ["xq", "xs", "xzp"], ["xf"]),
            P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"]),
            P.make_node("Conv", ["xf", "wf"], ["c"], pads=[1, 1, 1, 1]),
            P.make_node("Sigmoid", ["c"], ["s"]),
            P.make_node("Mul", ["c", "s"], ["m"]),
            P.make_node("QuantizeLinear", ["m", "ys", "yzp"], ["mq"]),
            P.make_node("DequantizeLinear", ["mq", "ys", "yzp"], ["y"]),
        ]
    imported, (y_fused,) = _run(_build(nodes(), {"x": x}, dict(inits)), {"x": x}, optimize=True)
    ops = _ops(imported)
    assert "QLinearConv" in ops
    assert "Sigmoid" not in ops and "Mul" not in ops
    node = next(n for n in imported.graph.node if n.op_type == "QLinearConv")
    assert node.attrs.get("_fused_act") == "silu"
    _, (y_ref,) = _run(_build(nodes(), {"x": x}, dict(inits)), {"x": x}, optimize=False)
    np.testing.assert_array_equal(y_fused, y_ref)  # exact epilogue fold


def test_silu_shared_with_extra_consumer_not_folded(irng):
    """If the conv output feeds anything beyond the SiLU pair, no fold."""
    x = irng.random((1, 2, 6, 6), dtype=np.float32)
    wq = irng.integers(-127, 128, size=(3, 2, 3, 3)).astype(np.int8)
    inits = {
        "xs": np.float32(0.02), "xzp": np.int8(0),
        "wq": wq, "ws": np.float32(0.01), "wzp": np.int8(0),
        "ys": np.float32(0.05), "yzp": np.int8(0),
    }
    nodes = [
        P.make_node("QuantizeLinear", ["x", "xs", "xzp"], ["xq"]),
        P.make_node("DequantizeLinear", ["xq", "xs", "xzp"], ["xf"]),
        P.make_node("DequantizeLinear", ["wq", "ws", "wzp"], ["wf"]),
        P.make_node("Conv", ["xf", "wf"], ["c"], pads=[1, 1, 1, 1]),
        P.make_node("Sigmoid", ["c"], ["s"]),
        P.make_node("Mul", ["c", "s"], ["m"]),
        P.make_node("QuantizeLinear", ["m", "ys", "yzp"], ["mq"]),
        P.make_node("DequantizeLinear", ["mq", "ys", "yzp"], ["md"]),
        P.make_node("Add", ["md", "c"], ["y"]),  # third consumer of c
    ]
    imported, _ = _run(_build(nodes, {"x": x}, inits), {"x": x}, optimize=True)
    assert "Conv" in _ops(imported)
    assert "QLinearConv" not in _ops(imported)
