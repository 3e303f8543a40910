"""Numpy-oracle sweep over elementwise/reduction ops with no dedicated test.

A registry audit found these ops only exercised *indirectly* (inside
torch-exported graphs); this pins each against numpy directly so a
lowering regression names the op instead of failing a composite graph.
"""

import numpy as np
import pytest

from test_compiler_ops import run_graph

from birdnet_tpu.onnx import proto as P

RNG = np.random.default_rng(42)
X = RNG.normal(size=(3, 7)).astype(np.float32)
XPOS = np.abs(X) + 0.1
B = RNG.normal(size=(3, 7)).astype(np.float32)
I32A = RNG.integers(0, 64, size=(3, 7)).astype(np.int32)
I32B = RNG.integers(0, 64, size=(3, 7)).astype(np.int32)
XSPECIAL = np.array(
    [[1.0, -1.0, 0.0, np.inf, -np.inf, np.nan, 2.5]], dtype=np.float32
)

UNARY = [
    ("Ceil", X, np.ceil),
    ("Floor", X, np.floor),
    ("Sqrt", XPOS, np.sqrt),
    ("Reciprocal", XPOS, lambda a: 1.0 / a),
    ("Sign", X, np.sign),
    ("Sin", X, np.sin),
    ("Cos", X, np.cos),
    ("Sinh", X, np.sinh),
    ("Cosh", X, np.cosh),
]


@pytest.mark.parametrize("op,x,ref", UNARY, ids=[u[0] for u in UNARY])
def test_unary_vs_numpy(op, x, ref):
    (y,) = run_graph([P.make_node(op, ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(y, ref(x), rtol=1e-6, atol=1e-6)


BINARY = [
    ("Pow", XPOS, np.abs(B), np.power),
    ("Equal", I32A, I32B, np.equal),
    ("GreaterOrEqual", X, B, np.greater_equal),
    ("LessOrEqual", X, B, np.less_equal),
    ("BitwiseAnd", I32A, I32B, np.bitwise_and),
    ("BitwiseOr", I32A, I32B, np.bitwise_or),
]


@pytest.mark.parametrize("op,a,b,ref", BINARY, ids=[b[0] for b in BINARY])
def test_binary_vs_numpy(op, a, b, ref):
    (y,) = run_graph(
        [P.make_node(op, ["a", "b"], ["y"])], {"a": a, "b": b},
        opset=18,
    )
    np.testing.assert_allclose(y, ref(a, b), rtol=1e-6, atol=1e-6)


def test_prelu_vs_numpy():
    slope = np.array([0.25], dtype=np.float32)
    (y,) = run_graph(
        [P.make_node("PRelu", ["x", "s"], ["y"])], {"x": X}, {"s": slope}
    )
    np.testing.assert_allclose(y, np.where(X > 0, X, 0.25 * X), rtol=1e-6)


def test_isnan_isinf_vs_numpy():
    (y,) = run_graph([P.make_node("IsNaN", ["x"], ["y"])], {"x": XSPECIAL})
    np.testing.assert_array_equal(y, np.isnan(XSPECIAL))
    (y,) = run_graph([P.make_node("IsInf", ["x"], ["y"])], {"x": XSPECIAL})
    np.testing.assert_array_equal(y, np.isinf(XSPECIAL))
    # detect_negative / detect_positive halves
    (y,) = run_graph(
        [P.make_node("IsInf", ["x"], ["y"], detect_negative=0)],
        {"x": XSPECIAL},
    )
    np.testing.assert_array_equal(y, XSPECIAL == np.inf)
    (y,) = run_graph(
        [P.make_node("IsInf", ["x"], ["y"], detect_positive=0)],
        {"x": XSPECIAL},
    )
    np.testing.assert_array_equal(y, XSPECIAL == -np.inf)


def test_castlike_vs_numpy():
    target = np.zeros(1, dtype=np.int32)
    (y,) = run_graph(
        [P.make_node("CastLike", ["x", "t"], ["y"])],
        {"x": X}, {"t": target},
    )
    assert y.dtype == np.int32
    np.testing.assert_array_equal(y, X.astype(np.int32))


@pytest.mark.parametrize(
    "op,ref",
    [
        ("ReduceL1", lambda a, ax, kd: np.sum(np.abs(a), axis=ax, keepdims=kd)),
        ("ReduceMin", lambda a, ax, kd: np.min(a, axis=ax, keepdims=kd)),
        ("ReduceProd", lambda a, ax, kd: np.prod(a, axis=ax, keepdims=kd)),
    ],
    ids=["ReduceL1", "ReduceMin", "ReduceProd"],
)
@pytest.mark.parametrize("keepdims", [0, 1])
def test_reduce_vs_numpy(op, ref, keepdims):
    axes = np.array([1], dtype=np.int64)
    (y,) = run_graph(
        [P.make_node(op, ["x", "axes"], ["y"], keepdims=keepdims)],
        {"x": X * 0.5}, {"axes": axes}, opset=18,
    )
    np.testing.assert_allclose(
        y, ref(X * 0.5, 1, bool(keepdims)), rtol=1e-5, atol=1e-6
    )


def test_sequence_empty_roundtrip():
    """SequenceEmpty -> SequenceInsert -> SequenceAt recovers the tensor."""
    (y,) = run_graph(
        [
            P.make_node("SequenceEmpty", [], ["seq"]),
            P.make_node("SequenceInsert", ["seq", "x"], ["seq2"]),
            P.make_node("SequenceAt", ["seq2", "zero"], ["y"]),
        ],
        {"x": X},
        {"zero": np.array(0, dtype=np.int64)},
    )
    np.testing.assert_array_equal(y, X)


# --- attribute-coverage pins (attrs a registry audit found untested) ---


def test_reshape_allowzero():
    x0 = np.zeros((0, 4), np.float32)
    (y,) = run_graph(
        [P.make_node("Reshape", ["x", "s"], ["y"], allowzero=1)],
        {"x": x0}, {"s": np.array([0, 4], np.int64)},
    )
    assert y.shape == (0, 4)
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    (y,) = run_graph(
        [P.make_node("Reshape", ["x", "s"], ["y"])],
        {"x": x}, {"s": np.array([0, 3], np.int64)},
    )
    assert y.shape == (2, 3)  # allowzero=0: zero copies the input dim


def test_shape_start_end():
    x = np.zeros((2, 3, 4), np.float32)
    (y,) = run_graph([P.make_node("Shape", ["x"], ["y"], start=1)], {"x": x})
    np.testing.assert_array_equal(y, [3, 4])
    (y,) = run_graph([P.make_node("Shape", ["x"], ["y"], end=-1)], {"x": x})
    np.testing.assert_array_equal(y, [2, 3])
    (y,) = run_graph(
        [P.make_node("Shape", ["x"], ["y"], start=0, end=2)], {"x": x}
    )
    np.testing.assert_array_equal(y, [2, 3])


def test_melweightmatrix_output_datatype():
    (y,) = run_graph(
        [P.make_node(
            "MelWeightMatrix", ["nm", "dft", "sr", "lo", "hi"], ["y"],
            output_datatype=int(P.DataType.FLOAT16),
        )],
        {"nm": np.array(8, np.int64)},
        {"dft": np.array(64, np.int64), "sr": np.array(16000, np.int64),
         "lo": np.array(0.0, np.float32), "hi": np.array(8000.0, np.float32)},
    )
    assert y.dtype == np.float16
    assert y.shape == (33, 8)


def test_scan_input_output_axes():
    """scan_input_axes/scan_output_axes=[1]: scan along columns, stack
    the per-step outputs back along axis 1 (row-cumsum)."""
    body = P.GraphProto(
        name="b",
        node=[P.make_node("Add", ["acc", "xi"], ["acc_out"]),
              P.make_node("Identity", ["acc_out"], ["yi"])],
        input=[P.make_value_info("acc", P.DataType.FLOAT, [3]),
               P.make_value_info("xi", P.DataType.FLOAT, [3])],
        output=[P.make_value_info("acc_out", P.DataType.FLOAT, [3]),
                P.make_value_info("yi", P.DataType.FLOAT, [3])],
    )
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    final, ys = run_graph(
        [P.make_node("Scan", ["acc0", "x"], ["final", "ys"], body=body,
                     num_scan_inputs=1, scan_input_axes=[1],
                     scan_output_axes=[1])],
        {"x": x}, {"acc0": np.zeros(3, np.float32)},
        outputs=["final", "ys"],
    )
    np.testing.assert_allclose(final, x.sum(axis=1))
    np.testing.assert_allclose(ys, np.cumsum(x, axis=1))


def test_legacy_slice_attrs_opset9():
    (y,) = run_graph(
        [P.make_node("Slice", ["x"], ["y"], starts=[1], ends=[3], axes=[1])],
        {"x": np.arange(12, dtype=np.float32).reshape(3, 4)}, opset=9,
    )
    np.testing.assert_array_equal(
        y, np.arange(12, dtype=np.float32).reshape(3, 4)[:, 1:3]
    )


def test_convtranspose_nonzero_output_padding():
    torch = pytest.importorskip("torch")
    import torch.nn as nn

    from _torch_export import export_onnx_bytes, torch_outputs
    import jax

    from birdnet_tpu.compiler.importer import import_onnx, make_forward

    torch.manual_seed(0)
    m = nn.ConvTranspose2d(3, 4, 3, stride=2, padding=1,
                           output_padding=1).eval()
    xt = torch.randn(1, 3, 5, 5)
    mod = import_onnx(export_onnx_bytes(m, (xt,)))
    got = np.asarray(
        jax.jit(make_forward(mod, precision="fp32"))(mod.params, xt.numpy())[0]
    )
    np.testing.assert_allclose(got, torch_outputs(m, (xt,))[0], atol=1e-5)
