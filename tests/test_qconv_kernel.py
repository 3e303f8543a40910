"""Pallas fused int8 1x1-conv+requant kernel vs the XLA QLinearConv oracle.

The kernel (ops/pallas/qconv.py) must be bit-identical to the XLA lowering
in compiler/ops.py (which defines the framework's ONNX requant semantics:
round-half-even, saturate). On CPU the kernel runs in interpret mode; on
real TPU the same comparison runs compiled (BIRDNET_TEST_TPU=1)."""

import numpy as np
import pytest

from birdnet_tpu.onnx import proto as P


def _run_qlinearconv_xla(x, w, b, x_s, w_s, y_s, act=""):
    """Oracle: the importer's XLA QLinearConv path on a 1-node graph, with
    the Pallas kernel disabled via the sharding sentinel."""
    import jax

    from birdnet_tpu.compiler.importer import import_onnx, make_forward

    c_out, c_in = w.shape[:2]
    n_img, _, h, wdim = x.shape
    attrs = dict(kernel_shape=[1, 1], strides=[1, 1], pads=[0, 0, 0, 0],
                 group=1)
    if act:
        attrs["_fused_act"] = act
    nodes = [
        P.make_node(
            "QLinearConv",
            ["x", "xs", "xzp", "w", "ws", "wzp", "ys", "yzp", "b"],
            ["y"],
            **attrs,
        ),
    ]
    inits = [
        P.TensorProto.from_numpy(np.float32(x_s), name="xs"),
        P.TensorProto.from_numpy(np.int8(0), name="xzp"),
        P.TensorProto.from_numpy(w, name="w"),
        P.TensorProto.from_numpy(w_s, name="ws"),
        P.TensorProto.from_numpy(np.zeros(c_out, np.int8), name="wzp"),
        P.TensorProto.from_numpy(np.float32(y_s), name="ys"),
        P.TensorProto.from_numpy(np.int8(0), name="yzp"),
        P.TensorProto.from_numpy(b, name="b"),
    ]
    graph = P.GraphProto(
        name="q1",
        node=nodes,
        initializer=inits,
        input=[P.make_value_info("x", P.DataType.INT8, list(x.shape))],
        output=[P.make_value_info("y", P.DataType.INT8,
                                  [n_img, c_out, h, wdim])],
    )
    imp = import_onnx(P.encode_model(P.make_model(graph)), optimize=False)
    fwd = make_forward(imp, precision="fast", disable_pallas_fusion=True)
    (y,) = jax.jit(fwd)(imp.params, x)
    return np.asarray(y)


@pytest.mark.parametrize("act", ["", "relu", "silu"])
def test_qconv_kernel_bit_exact(rng, act):
    from birdnet_tpu.ops.pallas.qconv import qconv1x1_requant

    n_img, c_in, c_out, h, w_dim = 2, 8, 16, 4, 128
    x = rng.integers(-50, 50, (n_img, c_in, h, w_dim)).astype(np.int8)
    w = rng.integers(-127, 128, (c_out, c_in, 1, 1)).astype(np.int8)
    b = rng.integers(-3000, 3000, c_out).astype(np.int32)
    x_s = 0.02
    w_s = (np.abs(rng.normal(size=c_out)) * 0.01 + 1e-3).astype(np.float32)
    y_s = 0.04

    want = _run_qlinearconv_xla(x, w, b, x_s, w_s, y_s, act=act)

    got = np.asarray(
        qconv1x1_requant(
            x.reshape(n_img, c_in, h * w_dim),
            w[:, :, 0, 0],
            b,
            (x_s * w_s).astype(np.float32),
            y_s,
            act=act,
            interpret=True,
        )
    ).reshape(n_img, c_out, h, w_dim)

    np.testing.assert_array_equal(got, want)


def test_qconv_kernel_bit_exact_reciprocal_hostile_scale(rng):
    """y_scale whose f32 reciprocal is inexact (1/0.3): multiplication by
    the precomputed reciprocal lands 1 ulp off true division, which flips
    round-half-even boundary accumulators. The kernel must divide."""
    from birdnet_tpu.ops.pallas.qconv import qconv1x1_requant

    n_img, c_in, c_out, h, w_dim = 4, 8, 16, 8, 128
    x = rng.integers(-90, 90, (n_img, c_in, h, w_dim)).astype(np.int8)
    w = rng.integers(-127, 128, (c_out, c_in, 1, 1)).astype(np.int8)
    b = rng.integers(-5000, 5000, c_out).astype(np.int32)
    # x_s*w_s = 0.15 exactly-representable-ish, y_s = 0.3: many integer
    # accumulators dequantize to exact n+0.5 multiples where the two
    # requant formulas disagree at the ulp level.
    x_s = 0.15
    w_s = np.ones(c_out, np.float32)
    y_s = 0.3

    want = _run_qlinearconv_xla(x, w, b, x_s, w_s, y_s)
    got = np.asarray(
        qconv1x1_requant(
            x.reshape(n_img, c_in, h * w_dim),
            w[:, :, 0, 0],
            b,
            (x_s * w_s).astype(np.float32),
            y_s,
            interpret=True,
        )
    ).reshape(n_img, c_out, h, w_dim)
    np.testing.assert_array_equal(got, want)


def test_qconv_tile_picker():
    from birdnet_tpu.ops.pallas.qconv import _pick_tile, eligible

    assert _pick_tile(12288) == 12288
    assert _pick_tile(128) == 128
    assert _pick_tile(100) == 0
    assert _pick_tile(48 * 256) == 12288
    assert _pick_tile(3 * 16 * 128) > 0  # late-stage tiny maps
    assert eligible(24 * 128)
    assert not eligible(129)
