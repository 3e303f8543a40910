"""Modern ONNX tensor dtypes: bfloat16, the float8 family, packed int4.

Real-world files carry these today — TF exports with bf16 weights,
fp8-QDQ graphs (opset 19+), and weight-only int4 quantization (opset 21,
AWQ/GPTQ-style exports). The reference consumes them through
onnxruntime's tensor decoder (src/classifier.rs:348-350); here the codec
decodes them (packed nibbles → 8-bit containers, fp8 via ml_dtypes) and
the compiler lowers Cast/QuantizeLinear/DequantizeLinear over them.
"""

from __future__ import annotations

import ml_dtypes
import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P

ATOL = 1e-4


def _run(model_proto, *inputs):
    import jax

    model = import_onnx(model_proto)
    fwd = jax.jit(make_forward(model, precision="fp32"))
    return [np.asarray(o) for o in fwd(model.params, *inputs)]


def _model(nodes, inputs, outputs, initializers, opset=21):
    graph = P.GraphProto(name="g", node=nodes, input=inputs, output=outputs,
                         initializer=initializers)
    m = P.ModelProto(
        ir_version=10, producer_name="pytest", graph=graph,
        opset_import=[P.OperatorSetId(domain="", version=opset)],
    )
    return P.decode_model(P.encode_model(m))


def _vi(name, dims, elem=P.DataType.FLOAT):
    return P.make_value_info(name, elem, list(dims))


# ---------------------------------------------------------------------------
# codec decode
# ---------------------------------------------------------------------------


def _pack_int4(vals):
    """Pack 4-bit values (given as ints) low-nibble-first, pad odd counts."""
    nib = [v & 0x0F for v in vals]
    if len(nib) % 2:
        nib.append(0)
    return bytes(nib[i] | (nib[i + 1] << 4) for i in range(0, len(nib), 2))


def test_codec_unpacks_int4_even_and_odd_counts():
    vals = [-8, -1, 0, 7, 3, -5, 2]  # 7 elements → padded nibble on the wire
    t = P.TensorProto(name="w", data_type=P.DataType.INT4, dims=[7],
                      raw_data=_pack_int4(vals))
    got = t.to_numpy()
    assert got.dtype == ml_dtypes.int4  # true 4-bit container
    np.testing.assert_array_equal(got.astype(np.int8), np.array(vals, np.int8))

    uvals = [0, 15, 7, 8]
    t = P.TensorProto(name="w", data_type=P.DataType.UINT4, dims=[2, 2],
                      raw_data=_pack_int4(uvals))
    got = t.to_numpy()
    assert got.dtype == ml_dtypes.uint4
    np.testing.assert_array_equal(
        got.astype(np.uint8), np.array(uvals, np.uint8).reshape(2, 2)
    )


def test_codec_int4_truncated_payload_is_an_error():
    t = P.TensorProto(name="w", data_type=P.DataType.INT4, dims=[9],
                      raw_data=_pack_int4([1, 2, 3, 4]))
    with pytest.raises(ValueError, match="nibbles"):
        t.to_numpy()


def test_codec_int4_int32_data_storage():
    """int32_data packs two nibbles per entry (the onnx.helper 4bitx2
    convention), same as raw_data bytes."""
    t = P.TensorProto(name="w", data_type=P.DataType.INT4, dims=[3],
                      int32_data=[0x1F, 0x08])  # nibbles: -1, 1, -8 (+pad)
    np.testing.assert_array_equal(
        t.to_numpy().astype(np.int8), np.array([-1, 1, -8], np.int8)
    )


def test_codec_int4_roundtrip_via_from_numpy():
    arr = np.array([-8, 7, 0, -1, 3], np.int8).astype(ml_dtypes.int4)
    rt = P.TensorProto.from_numpy(arr, "w")
    assert rt.data_type == P.DataType.INT4
    assert len(rt.raw_data) == 3  # packed: ceil(5/2)
    np.testing.assert_array_equal(
        rt.to_numpy().astype(np.int8), arr.astype(np.int8)
    )


def test_codec_bfloat16_raw_and_bitpattern_roundtrip():
    arr = np.array([1.5, -2.0, 0.0, 3e8], dtype=ml_dtypes.bfloat16)
    t = P.TensorProto(name="w", data_type=P.DataType.BFLOAT16, dims=[4],
                      raw_data=arr.tobytes())
    got = t.to_numpy()
    assert got.dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(got.view(np.uint16), arr.view(np.uint16))

    # spec alternative: uint16 bit patterns carried in int32_data
    t = P.TensorProto(name="w", data_type=P.DataType.BFLOAT16, dims=[4],
                      int32_data=[int(v) for v in arr.view(np.uint16)])
    np.testing.assert_array_equal(
        t.to_numpy().view(np.uint16), arr.view(np.uint16)
    )


def test_codec_float8_raw_and_bitpattern():
    for np_dt, onnx_dt in [
        (ml_dtypes.float8_e4m3fn, P.DataType.FLOAT8E4M3FN),
        (ml_dtypes.float8_e5m2, P.DataType.FLOAT8E5M2),
    ]:
        arr = np.array([0.5, -1.25, 0.0, 8.0], dtype=np_dt)
        t = P.TensorProto(name="w", data_type=onnx_dt, dims=[4],
                          raw_data=arr.tobytes())
        got = t.to_numpy()
        assert got.dtype == np_dt
        np.testing.assert_array_equal(got.view(np.uint8), arr.view(np.uint8))
        t = P.TensorProto(name="w", data_type=onnx_dt, dims=[4],
                          int32_data=[int(v) for v in arr.view(np.uint8)])
        np.testing.assert_array_equal(
            t.to_numpy().view(np.uint8), arr.view(np.uint8)
        )


def test_codec_encodes_bf16_and_fp8_numpy_arrays():
    """from_numpy round-trips the ml_dtypes families (checkpoint re-encode
    of decoded modern-dtype weights)."""
    for dt in (ml_dtypes.bfloat16, ml_dtypes.float8_e4m3fn):
        arr = np.array([1.0, -0.5, 2.0], dtype=dt)
        rt = P.TensorProto.from_numpy(arr, "w").to_numpy()
        assert rt.dtype == arr.dtype
        np.testing.assert_array_equal(
            rt.view(np.uint8), arr.view(np.uint8)
        )


# ---------------------------------------------------------------------------
# compiler lowering
# ---------------------------------------------------------------------------


def test_weight_only_int4_dequant_matmul():
    """The AWQ/GPTQ export shape: packed int4 weights + per-column scales
    feeding DequantizeLinear → MatMul."""
    r = np.random.default_rng(0)
    w_q = r.integers(-8, 8, (6, 4)).astype(np.int8)
    scale = (r.random(4, dtype=np.float32) * 0.1 + 0.01).astype(np.float32)
    zp = np.array([0, 1, -2, 3], np.int8)  # int4 zero points
    x = r.standard_normal((3, 6), dtype=np.float32)

    w_t = P.TensorProto(name="w_q", data_type=P.DataType.INT4, dims=[6, 4],
                        raw_data=_pack_int4(w_q.reshape(-1).tolist()))
    zp_t = P.TensorProto(name="zp", data_type=P.DataType.INT4, dims=[4],
                         raw_data=_pack_int4(zp.tolist()))
    nodes = [
        P.make_node("DequantizeLinear", ["w_q", "scale", "zp"], ["w"],
                    axis=1),
        P.make_node("MatMul", ["x", "w"], ["y"]),
    ]
    m = _model(nodes, [_vi("x", (3, 6))], [_vi("y", (3, 4))],
               [w_t, P.TensorProto.from_numpy(scale, "scale"), zp_t])
    (got,) = _run(m, x)
    want = x @ ((w_q.astype(np.float32) - zp.astype(np.float32)) * scale)
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_fp8_qdq_roundtrip_matches_mldtypes():
    r = np.random.default_rng(1)
    x = (r.standard_normal((4, 8)) * 20).astype(np.float32)
    scale = np.float32(0.5)
    zp = np.zeros((), dtype=ml_dtypes.float8_e4m3fn)
    nodes = [
        P.make_node("QuantizeLinear", ["x", "s", "zp"], ["q"]),
        P.make_node("DequantizeLinear", ["q", "s", "zp"], ["y"]),
    ]
    m = _model(nodes, [_vi("x", x.shape)], [_vi("y", x.shape)],
               [P.TensorProto.from_numpy(scale, "s"),
                P.TensorProto.from_numpy(zp, "zp")], opset=19)
    (got,) = _run(m, x)
    fi = ml_dtypes.finfo(ml_dtypes.float8_e4m3fn)
    q = np.clip(x / scale, float(fi.min), float(fi.max)).astype(
        ml_dtypes.float8_e4m3fn
    )
    want = q.astype(np.float32) * scale
    np.testing.assert_allclose(got, want, atol=ATOL)


def test_bf16_weights_cast_to_float_matmul():
    """TF-export idiom: bf16 initializer → Cast(FLOAT) → MatMul."""
    r = np.random.default_rng(2)
    w = r.standard_normal((5, 3)).astype(ml_dtypes.bfloat16)
    x = r.standard_normal((2, 5), dtype=np.float32)
    nodes = [
        P.make_node("Cast", ["w_bf16"], ["w"], to=P.DataType.FLOAT),
        P.make_node("MatMul", ["x", "w"], ["y"]),
    ]
    m = _model(nodes, [_vi("x", x.shape)], [_vi("y", (2, 3))],
               [P.TensorProto.from_numpy(w, "w_bf16")])
    (got,) = _run(m, x)
    np.testing.assert_allclose(got, x @ w.astype(np.float32), atol=ATOL)


def test_cast_to_int4_saturates():
    x = np.array([-100.0, -8.4, -7.6, 7.4, 7.6, 100.0], np.float32)
    nodes = [P.make_node("Cast", ["x"], ["y"], to=P.DataType.INT4)]
    m = _model(nodes, [_vi("x", (6,))], [_vi("y", (6,), P.DataType.INT4)], [])
    (got,) = _run(m, x)
    assert got.dtype == ml_dtypes.int4
    np.testing.assert_array_equal(
        got.astype(np.int8), np.clip(np.round(x), -8, 7).astype(np.int8)
    )

    nodes = [P.make_node("Cast", ["x"], ["y"], to=P.DataType.UINT4)]
    m = _model(nodes, [_vi("x", (6,))], [_vi("y", (6,), P.DataType.UINT4)], [])
    (got,) = _run(m, x)
    assert got.dtype == ml_dtypes.uint4
    np.testing.assert_array_equal(
        got.astype(np.uint8), np.clip(np.round(x), 0, 15).astype(np.uint8)
    )


def test_fp8_e5m2_quantize_saturates_not_inf():
    x = np.array([1e6, -1e6, 3.0], np.float32)
    scale = np.float32(1.0)
    zp = np.zeros((), dtype=ml_dtypes.float8_e5m2)
    nodes = [P.make_node("QuantizeLinear", ["x", "s", "zp"], ["q"]),
             P.make_node("DequantizeLinear", ["q", "s", "zp"], ["y"])]
    m = _model(nodes, [_vi("x", (3,))], [_vi("y", (3,))],
               [P.TensorProto.from_numpy(scale, "s"),
                P.TensorProto.from_numpy(zp, "zp")], opset=19)
    (got,) = _run(m, x)
    assert np.isfinite(got).all()
    fi = ml_dtypes.finfo(ml_dtypes.float8_e5m2)
    np.testing.assert_allclose(got[:2], [float(fi.max), float(fi.min)])


def test_quantize_linear_int4_zero_point_saturates_to_4bit():
    """QuantizeLinear with an INT4 zero point must clip to [-8,7], not the
    8-bit container range (found by review: the old int8 widening lost
    the 4-bit identity)."""
    x = np.array([20.0, -20.0, 3.0], np.float32)
    scale = np.float32(1.0)
    zp = np.zeros((), np.int8).astype(ml_dtypes.int4)
    nodes = [P.make_node("QuantizeLinear", ["x", "s", "zp"], ["q"]),
             P.make_node("DequantizeLinear", ["q", "s", "zp"], ["y"])]
    m = _model(nodes, [_vi("x", (3,))], [_vi("y", (3,))],
               [P.TensorProto.from_numpy(scale, "s"),
                P.TensorProto.from_numpy(zp, "zp")], opset=21)
    (got,) = _run(m, x)
    np.testing.assert_allclose(got, [7.0, -8.0, 3.0])


def test_cast_float8_saturate_attribute():
    """Cast to float8 defaults to saturate=1 (clamp to finite range);
    saturate=0 overflows per IEEE."""
    x = np.array([1e6, -1e6, 500.0], np.float32)
    node = P.make_node("Cast", ["x"], ["y"], to=P.DataType.FLOAT8E4M3FN)
    m = _model([node], [_vi("x", (3,))],
               [_vi("y", (3,), P.DataType.FLOAT8E4M3FN)], [], opset=21)
    (got,) = _run(m, x)
    fi = ml_dtypes.finfo(ml_dtypes.float8_e4m3fn)
    np.testing.assert_array_equal(
        got.astype(np.float32),
        [float(fi.max), float(fi.min), 448.0 if float(fi.max) == 448.0 else float(np.asarray(np.float32(500.0)).astype(ml_dtypes.float8_e4m3fn))],
    )

    node = P.make_node("Cast", ["x"], ["y"], to=P.DataType.FLOAT8E5M2,
                       saturate=0)
    m = _model([node], [_vi("x", (3,))],
               [_vi("y", (3,), P.DataType.FLOAT8E5M2)], [], opset=21)
    (got,) = _run(m, x)
    assert np.isinf(got.astype(np.float32)[:2]).all()  # e5m2 has inf
