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
