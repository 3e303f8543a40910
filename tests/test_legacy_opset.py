"""Opset 1-6 legacy dialect (2017, pre-numpy-broadcasting).

ONNX Runtime still evaluates the original 2017 model-zoo era files
(reference consumes anything its loader takes, src/classifier.rs:348-350);
round 3 rejected them typed, round 4 implements the dialect:

- binary-op ``broadcast``/``axis`` alignment (B aligned at ``axis``,
  default trailing, via appended singleton axes),
- attribute-form Reshape (opsets 1-4), string-enum Cast (1-5),
  per-axis-scale Upsample (1-6), 3-input Tile (1-6), default-axis-1
  Concat (1-3), channel-aligned 1-D PRelu slope,
- ignorable legacy attrs (``consumed_inputs``, ``is_test``) ignored;
  the legacy *training* BatchNormalization form stays a typed rejection.

Every case is oracle-tested against numpy.
"""

from __future__ import annotations

import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.errors import ModelLoadError
from birdnet_tpu.onnx import proto as P

from test_contrib_ops import _vi  # noqa: F401


def _legacy_model(nodes, inputs, outputs, initializers=(), opset=6):
    graph = P.GraphProto(
        name="legacy_2017",
        node=list(nodes),
        input=list(inputs),
        output=list(outputs),
        initializer=list(initializers),
    )
    return P.ModelProto(
        ir_version=3,
        producer_name="caffe2",  # the 2017-era producer
        graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=opset)],
    )


def _run(model, *inputs):
    import jax

    m = import_onnx(model)
    fwd = jax.jit(make_forward(m, precision="fp32"))
    return [np.asarray(o) for o in fwd(m.params, *inputs)]


def _out(shape=()):
    return P.make_value_info("y", P.DataType.FLOAT, list(shape))


# -- legacy binary broadcast -------------------------------------------------


@pytest.mark.parametrize("op_type,npfn", [
    ("Add", np.add), ("Sub", np.subtract), ("Mul", np.multiply),
    ("Div", np.divide),
])
def test_legacy_broadcast_at_axis(op_type, npfn):
    """B [3,4] aligned at axis 1 of A [2,3,4,5] — the alignment modern
    numpy broadcasting cannot express without explicit reshape."""
    a = np.random.default_rng(0).normal(size=(2, 3, 4, 5)).astype(np.float32)
    b = np.random.default_rng(1).normal(size=(3, 4)).astype(np.float32)
    node = P.make_node(op_type, ["a", "b"], ["y"], broadcast=1, axis=1)
    m = _legacy_model(
        [node], [_vi("a", a.shape), _vi("b", b.shape)], [_out()]
    )
    (y,) = _run(m, a, b)
    ref = npfn(a, b.reshape(1, 3, 4, 1))
    np.testing.assert_allclose(y, ref, rtol=1e-6, atol=1e-6)


def test_legacy_broadcast_trailing_default():
    """Without ``axis``, B is trailing-aligned (suffix match) — same as
    modern unidirectional broadcast."""
    a = np.arange(24, dtype=np.float32).reshape(2, 3, 4)
    b = np.arange(4, dtype=np.float32)
    node = P.make_node("Add", ["a", "b"], ["y"], broadcast=1)
    m = _legacy_model([node], [_vi("a", a.shape), _vi("b", b.shape)], [_out()])
    (y,) = _run(m, a, b)
    np.testing.assert_allclose(y, a + b)


def test_legacy_broadcast_scalar_and_exact():
    a = np.arange(6, dtype=np.float32).reshape(2, 3)
    s = np.float32(2.5)
    node = P.make_node("Mul", ["a", "b"], ["y"], broadcast=1)
    m = _legacy_model([node], [_vi("a", a.shape), _vi("b", ())], [_out()])
    (y,) = _run(m, a, s)
    np.testing.assert_allclose(y, a * 2.5)
    # broadcast=0 (exact shapes) evaluates plainly
    node = P.make_node("Sub", ["a", "b"], ["y"])
    m = _legacy_model([node], [_vi("a", a.shape), _vi("b", a.shape)], [_out()])
    (y,) = _run(m, a, a)
    np.testing.assert_allclose(y, np.zeros_like(a))


def test_legacy_broadcast_comparison_and_logical():
    a = np.random.default_rng(2).normal(size=(2, 3, 4)).astype(np.float32)
    b = np.random.default_rng(3).normal(size=(3,)).astype(np.float32)
    node = P.make_node("Greater", ["a", "b"], ["y"], broadcast=1, axis=1)
    m = _legacy_model(
        [node], [_vi("a", a.shape), _vi("b", b.shape)],
        [P.make_value_info("y", P.DataType.BOOL, [])],
    )
    (y,) = _run(m, a, b)
    np.testing.assert_array_equal(y, a > b.reshape(1, 3, 1))


# -- legacy op signatures ----------------------------------------------------


def test_legacy_reshape_shape_attribute():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    node = P.make_node("Reshape", ["x"], ["y"], shape=[2, 6])
    m = _legacy_model([node], [_vi("x", x.shape)], [_out()], opset=4)
    (y,) = _run(m, x)
    np.testing.assert_allclose(y, x.reshape(2, 6))


def test_legacy_cast_string_to():
    x = np.array([1.7, -2.3], np.float32)
    node = P.make_node("Cast", ["x"], ["y"], to="INT64")
    m = _legacy_model(
        [node], [_vi("x", x.shape)],
        [P.make_value_info("y", P.DataType.INT64, [2])], opset=5,
    )
    (y,) = _run(m, x)
    assert y.dtype in (np.int64, np.int32)  # x64-disabled jax truncates
    np.testing.assert_array_equal(y, [1, -2])


def test_legacy_concat_default_axis_1():
    a = np.ones((2, 3), np.float32)
    b = 2 * np.ones((2, 4), np.float32)
    node = P.make_node("Concat", ["a", "b"], ["y"])
    m = _legacy_model(
        [node], [_vi("a", a.shape), _vi("b", b.shape)], [_out()], opset=3
    )
    (y,) = _run(m, a, b)
    np.testing.assert_allclose(y, np.concatenate([a, b], axis=1))


def test_legacy_tile_tiles_axis_inputs():
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    nodes = [P.make_node("Tile", ["x", "t", "ax"], ["y"])]
    t = P.TensorProto(name="t", data_type=P.DataType.INT64, dims=[],
                      int64_data=[3])
    ax = P.TensorProto(name="ax", data_type=P.DataType.INT64, dims=[],
                       int64_data=[1])
    m = _legacy_model([*nodes], [_vi("x", x.shape)], [_out()],
                      initializers=[t, ax], opset=6)
    (y,) = _run(m, x)
    np.testing.assert_allclose(y, np.tile(x, (1, 3)))


def test_legacy_upsample_scale_attributes():
    x = np.arange(8, dtype=np.float32).reshape(1, 2, 2, 2)
    node = P.make_node(
        "Upsample", ["x"], ["y"], mode="nearest",
        height_scale=2.0, width_scale=2.0,
    )
    m = _legacy_model([node], [_vi("x", x.shape)], [_out()], opset=6)
    (y,) = _run(m, x)
    ref = x.repeat(2, axis=2).repeat(2, axis=3)
    np.testing.assert_allclose(y, ref)


def test_legacy_prelu_channel_slope():
    """1-D slope [C] applies per channel (NCHW axis 1), not trailing."""
    x = np.random.default_rng(4).normal(size=(2, 3, 4, 5)).astype(np.float32)
    slope = np.array([0.1, 0.2, 0.3], np.float32)
    node = P.make_node("PRelu", ["x", "s"], ["y"])
    m = _legacy_model(
        [node], [_vi("x", x.shape), _vi("s", slope.shape)], [_out()], opset=6
    )
    (y,) = _run(m, x, slope)
    ref = np.where(x >= 0, x, slope.reshape(1, 3, 1, 1) * x)
    np.testing.assert_allclose(y, ref, rtol=1e-6)


def test_legacy_batchnorm_inference_form_with_junk_attrs():
    """is_test/consumed_inputs/momentum are legacy noise on the inference
    form; the math must match modern BN."""
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 3, 4, 4)).astype(np.float32)
    scale = rng.normal(size=3).astype(np.float32)
    bias = rng.normal(size=3).astype(np.float32)
    mean = rng.normal(size=3).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=3).astype(np.float32)
    node = P.make_node(
        "BatchNormalization", ["x", "s", "b", "m", "v"], ["y"],
        is_test=1, momentum=0.9, spatial=1,
        consumed_inputs=[0, 0, 0, 1, 1],
    )
    m = _legacy_model(
        [node],
        [_vi("x", x.shape), _vi("s", (3,)), _vi("b", (3,)),
         _vi("m", (3,)), _vi("v", (3,))],
        [_out()], opset=6,
    )
    (y,) = _run(m, x, scale, bias, mean, var)
    sh = (1, 3, 1, 1)
    ref = (x - mean.reshape(sh)) / np.sqrt(var.reshape(sh) + 1e-5)
    ref = ref * scale.reshape(sh) + bias.reshape(sh)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_legacy_batchnorm_training_form_rejected():
    node = P.make_node(
        "BatchNormalization", ["x", "s", "b", "m", "v"],
        ["y", "m_out", "v_out", "sm", "sv"], is_test=0,
    )
    m = _legacy_model(
        [node],
        [_vi("x", (2, 3, 4, 4)), _vi("s", (3,)), _vi("b", (3,)),
         _vi("m", (3,)), _vi("v", (3,))],
        [_out(), P.make_value_info("m_out", P.DataType.FLOAT, [3])],
        opset=6,
    )
    with pytest.raises((ModelLoadError, NotImplementedError),
                       match="training form"):
        _run(m, np.zeros((2, 3, 4, 4), np.float32),
             *[np.zeros(3, np.float32)] * 4)


# -- end-to-end 2017-zoo-style mini CNN --------------------------------------


def test_legacy_zoo_style_cnn_end_to_end():
    """An opset-3 graph shaped like the original ONNX model-zoo exports
    (caffe2 era): Conv → BatchNorm(is_test) → PRelu([C] slope) →
    MaxPool → Reshape(shape attr) → Gemm(broadcast=1) — against a numpy
    oracle."""
    rng = np.random.default_rng(6)
    x = rng.normal(size=(1, 1, 8, 8)).astype(np.float32)
    w = rng.normal(size=(3, 1, 3, 3)).astype(np.float32) * 0.3
    bn_s = rng.uniform(0.5, 1.5, 3).astype(np.float32)
    bn_b = rng.normal(size=3).astype(np.float32)
    bn_m = rng.normal(size=3).astype(np.float32) * 0.1
    bn_v = rng.uniform(0.5, 2.0, 3).astype(np.float32)
    slope = np.array([0.05, 0.1, 0.15], np.float32)
    fc_w = rng.normal(size=(5, 3 * 3 * 3)).astype(np.float32) * 0.1
    fc_b = rng.normal(size=5).astype(np.float32)

    def t(name, arr):
        return P.TensorProto(
            name=name, data_type=P.DataType.FLOAT,
            dims=list(arr.shape), raw_data=arr.tobytes(),
        )

    nodes = [
        P.make_node("Conv", ["x", "w"], ["c"], kernel_shape=[3, 3],
                    pads=[0, 0, 0, 0], strides=[1, 1]),
        P.make_node("BatchNormalization", ["c", "bs", "bb", "bm", "bv"],
                    ["n"], is_test=1, consumed_inputs=[0, 0, 0, 1, 1]),
        P.make_node("PRelu", ["n", "sl"], ["p"]),
        P.make_node("MaxPool", ["p"], ["mp"], kernel_shape=[2, 2],
                    strides=[2, 2]),
        P.make_node("Reshape", ["mp"], ["flat"], shape=[1, 27]),
        P.make_node("Gemm", ["flat", "fw", "fb"], ["y"], transB=1,
                    broadcast=1),
    ]
    m = _legacy_model(
        nodes, [_vi("x", x.shape)], [_out((1, 5))],
        initializers=[t("w", w), t("bs", bn_s), t("bb", bn_b),
                      t("bm", bn_m), t("bv", bn_v), t("sl", slope),
                      t("fw", fc_w), t("fb", fc_b)],
        opset=3,
    )
    (y,) = _run(m, x)

    # numpy oracle
    from numpy.lib.stride_tricks import sliding_window_view

    win = sliding_window_view(x[0, 0], (3, 3))  # [6,6,3,3]
    conv = np.einsum("hwij,oij->ohw", win, w[:, 0])  # [3,6,6]
    sh = (3, 1, 1)
    bn = (conv - bn_m.reshape(sh)) / np.sqrt(bn_v.reshape(sh) + 1e-5)
    bn = bn * bn_s.reshape(sh) + bn_b.reshape(sh)
    act = np.where(bn >= 0, bn, slope.reshape(sh) * bn)
    pooled = act.reshape(3, 3, 2, 3, 2).max(axis=(2, 4))  # [3,3,3]
    flat = pooled.reshape(1, 27)
    ref = flat @ fc_w.T + fc_b
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


# -- property fuzz: legacy alignment vs a numpy oracle -----------------------


@pytest.mark.parametrize("seed", range(40))
def test_legacy_broadcast_fuzz(seed):
    """Random A rank 2-4, random contiguous B sub-shape aligned at a random
    legal axis, random op — engine vs a direct numpy transcription of the
    2017 alignment rule (reshape B to pad trailing singletons)."""
    rng = np.random.default_rng(1000 + seed)
    a_rank = int(rng.integers(2, 5))
    a_shape = tuple(int(rng.integers(1, 5)) for _ in range(a_rank))
    b_rank = int(rng.integers(1, a_rank + 1))
    axis = int(rng.integers(0, a_rank - b_rank + 1))
    b_shape = a_shape[axis:axis + b_rank]
    op_type, npfn = [
        ("Add", np.add), ("Sub", np.subtract), ("Mul", np.multiply),
        ("Pow", lambda x, y: np.power(x, y).astype(np.float32)),
    ][int(rng.integers(0, 4))]
    a = rng.normal(size=a_shape).astype(np.float32)
    b = rng.uniform(0.5, 2.0, size=b_shape).astype(np.float32)

    explicit_axis = bool(rng.integers(0, 2))
    attrs = {"broadcast": 1}
    if explicit_axis:
        attrs["axis"] = axis
    elif axis != a_rank - b_rank:
        attrs["axis"] = axis  # default is trailing; keep non-default explicit
    node = P.make_node(op_type, ["a", "b"], ["y"], **attrs)
    m = _legacy_model([node], [_vi("a", a_shape), _vi("b", b_shape)], [_out()])
    (y,) = _run(m, a, b)
    b_aligned = b.reshape(b_shape + (1,) * (a_rank - axis - b_rank))
    np.testing.assert_allclose(
        y, npfn(a, b_aligned), rtol=1e-5, atol=1e-6
    )


def test_legacy_prelu_channel_slope_when_c_equals_trailing_dim():
    """C == W must STILL align the 1-D slope to the channel axis (the
    guard that skipped alignment when slope length matched the trailing
    dim was a silent-wrong-values bug, review round 4)."""
    x = np.random.default_rng(7).normal(size=(1, 3, 8, 3)).astype(np.float32)
    slope = np.array([0.1, 0.2, 0.3], np.float32)
    node = P.make_node("PRelu", ["x", "s"], ["y"])
    m = _legacy_model(
        [node], [_vi("x", x.shape), _vi("s", slope.shape)], [_out()], opset=6
    )
    (y,) = _run(m, x, slope)
    ref = np.where(x >= 0, x, slope.reshape(1, 3, 1, 1) * x)
    np.testing.assert_allclose(y, ref, rtol=1e-6)


def test_legacy_pad_opset1_paddings_attribute():
    """Pad-1 spells the attribute `paddings` (renamed `pads` in opset 2)
    and the fill value `value`."""
    x = np.arange(6, dtype=np.float32).reshape(2, 3)
    node = P.make_node(
        "Pad", ["x"], ["y"], mode="constant",
        paddings=[0, 1, 0, 2], value=9.0,
    )
    m = _legacy_model([node], [_vi("x", x.shape)], [_out()], opset=1)
    (y,) = _run(m, x)
    ref = np.pad(x, ((0, 0), (1, 2)), constant_values=9.0)
    np.testing.assert_allclose(y, ref)
