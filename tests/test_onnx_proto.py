"""ONNX protobuf codec tests: encode → decode roundtrips."""

import numpy as np
import pytest

from birdnet_tpu.onnx import proto as P


def _simple_graph():
    w = np.arange(12, dtype=np.float32).reshape(3, 4)
    b = np.array([1, 2, 3], dtype=np.int64)
    graph = P.GraphProto(
        name="g",
        node=[
            P.make_node("MatMul", ["x", "w"], ["mm"], name="mm0"),
            P.make_node(
                "Unsqueeze", ["mm", "axes"], ["y"], name="u0"
            ),
        ],
        initializer=[
            P.TensorProto.from_numpy(w, name="w"),
            P.TensorProto.from_numpy(b, name="axes"),
        ],
        input=[P.make_value_info("x", P.DataType.FLOAT, ["batch", 3])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [1, "batch", 4])],
    )
    return graph, w, b


def test_model_roundtrip():
    graph, w, b = _simple_graph()
    model = P.make_model(graph, opset_version=17)
    data = P.encode_model(model)
    decoded = P.decode_model(data)

    assert decoded.ir_version == 8
    assert decoded.producer_name == "birdnet_tpu"
    assert decoded.opset_import[0].version == 17
    g = decoded.graph
    assert g.name == "g"
    assert [n.op_type for n in g.node] == ["MatMul", "Unsqueeze"]
    assert g.node[0].input == ["x", "w"]
    assert g.node[0].output == ["mm"]

    init = {t.name: t.to_numpy() for t in g.initializer}
    np.testing.assert_array_equal(init["w"], w)
    np.testing.assert_array_equal(init["axes"], b)

    assert g.input[0].name == "x"
    assert g.input[0].shape(dynamic=1) == [1, 3]
    assert g.output[0].shape() == [1, 1, 4]


def test_attribute_roundtrip():
    node = P.make_node(
        "Conv",
        ["x", "w"],
        ["y"],
        strides=[2, 2],
        pads=[1, 1, 1, 1],
        group=3,
        alpha=0.5,
        auto_pad="SAME_UPPER",
        names=["a", "b"],
        coeffs=[1.5, 2.5],
    )
    graph = P.GraphProto(name="g", node=[node])
    decoded = P.decode_model(P.encode_model(P.make_model(graph)))
    attrs = decoded.graph.node[0].attrs
    assert attrs["strides"] == [2, 2]
    assert attrs["pads"] == [1, 1, 1, 1]
    assert attrs["group"] == 3
    assert attrs["alpha"] == 0.5
    assert attrs["auto_pad"] == "SAME_UPPER"
    assert attrs["names"] == ["a", "b"]
    assert attrs["coeffs"] == [1.5, 2.5]


def test_fp16_in_int32_data():
    # The ONNX spec stores fp16 payloads in int32_data as uint16 bit
    # patterns (0x3C00=1.0, 0x4000=2.0); they must be reinterpreted, not
    # value-cast (and certainly not silently zeroed).
    t = P.TensorProto(
        name="h", data_type=P.DataType.FLOAT16, dims=[2], int32_data=[15360, 16384]
    )
    np.testing.assert_array_equal(t.to_numpy(), np.array([1.0, 2.0], np.float16))


def test_double_data_roundtrip():
    t = P.TensorProto(
        name="d", data_type=P.DataType.DOUBLE, dims=[2], double_data=[1.5, 2.5]
    )
    node = P.NodeProto(
        op_type="Constant",
        output=["y"],
        attribute=[P.AttributeProto(name="value", type=P.AttrType.TENSOR, t=t)],
    )
    decoded = P.decode_model(P.encode_model(P.make_model(P.GraphProto(node=[node]))))
    got = decoded.graph.node[0].attribute[0].t.to_numpy()
    np.testing.assert_array_equal(got, np.array([1.5, 2.5], np.float64))


def test_uint64_data_roundtrip():
    big = (1 << 63) + 7  # above int64 range: must survive unsigned
    t = P.TensorProto(
        name="u", data_type=P.DataType.UINT64, dims=[2], uint64_data=[big, 3]
    )
    node = P.NodeProto(
        op_type="Constant",
        output=["y"],
        attribute=[P.AttributeProto(name="value", type=P.AttrType.TENSOR, t=t)],
    )
    decoded = P.decode_model(P.encode_model(P.make_model(P.GraphProto(node=[node]))))
    got = decoded.graph.node[0].attribute[0].t.to_numpy()
    np.testing.assert_array_equal(got, np.array([big, 3], np.uint64))


def test_missing_payload_raises_not_zeros():
    t = P.TensorProto(name="w", data_type=P.DataType.FLOAT, dims=[2, 2])
    with pytest.raises(ValueError, match="no data"):
        t.to_numpy()


def test_nested_length_overrun_rejected():
    # A nested LEN that overruns its enclosing message must error, not
    # silently parse sibling/parent bytes as the child's fields (a
    # conformant protobuf parser rejects this).
    inner = P.encode_tensor(
        P.TensorProto(name="t", data_type=P.DataType.FLOAT, dims=[1], float_data=[1.0])
    )
    attr = bytearray()
    P._write_string(attr, 1, "value")
    P._write_tag(attr, 5, 2)  # field 5 (tensor), wire type LEN
    P._write_varint(attr, len(inner) + 50)  # overstated length
    attr += inner
    with pytest.raises(ValueError, match="overrun"):
        P.decode_attribute(memoryview(bytes(attr)), 0, len(attr))


def test_graphs_attribute_roundtrip():
    # Repeated-graph attributes (AttributeProto field 11, type GRAPHS) are
    # legal wire content even though no standard op uses them; a decoder
    # that drops them would silently corrupt such a model.
    sub = P.GraphProto(
        name="branch",
        node=[P.make_node("Relu", ["a"], ["b"])],
        output=[P.make_value_info("b", P.DataType.FLOAT, [1])],
    )
    attr = P.AttributeProto(name="bodies", type=P.AttrType.GRAPHS, graphs=[sub, sub])
    node = P.NodeProto(op_type="_Custom", input=["x"], output=["y"], attribute=[attr])
    decoded = P.decode_model(P.encode_model(P.make_model(P.GraphProto(node=[node]))))
    got = decoded.graph.node[0].attribute[0]
    assert got.type == P.AttrType.GRAPHS
    assert len(got.graphs) == 2
    assert got.graphs[0].name == "branch"
    assert got.graphs[1].node[0].op_type == "Relu"
    assert got.graphs[0].output[0].name == "b"


def test_tensor_attribute_roundtrip():
    t = np.float32(3.5) * np.ones((2, 2), dtype=np.float32)
    node = P.make_node("ConstantOfShape", ["s"], ["y"], value=t)
    decoded = P.decode_model(P.encode_model(P.make_model(P.GraphProto(node=[node]))))
    got = decoded.graph.node[0].attrs["value"].to_numpy()
    np.testing.assert_array_equal(got, t)


def test_negative_int_attrs_roundtrip():
    node = P.make_node("Squeeze", ["x"], ["y"], axes=[-1, -2], axis=-3)
    decoded = P.decode_model(P.encode_model(P.make_model(P.GraphProto(node=[node]))))
    attrs = decoded.graph.node[0].attrs
    assert attrs["axes"] == [-1, -2]
    assert attrs["axis"] == -3


def test_tensor_dtypes_roundtrip():
    arrays = [
        np.array([1.5, -2.5], dtype=np.float32),
        np.array([1, -2, 3], dtype=np.int64),
        np.array([1, 2], dtype=np.int32),
        np.array([True, False], dtype=np.bool_),
        np.array([1.0], dtype=np.float64),
        np.array([[1, 2]], dtype=np.uint8),
    ]
    for arr in arrays:
        t = P.TensorProto.from_numpy(arr, name="t")
        data = P.encode_tensor(t)
        back = P.decode_tensor(memoryview(data), 0, len(data)).to_numpy()
        np.testing.assert_array_equal(back, arr)
        assert back.dtype == arr.dtype


def test_save_and_load_file(tmp_path):
    graph, w, _ = _simple_graph()
    path = tmp_path / "m.onnx"
    P.save_model(P.make_model(graph), path)
    m = P.load_model(path)
    assert m.graph.name == "g"
    np.testing.assert_array_equal(m.graph.initializer[0].to_numpy(), w)


def test_external_data_loading(tmp_path):
    """Initializers with data_location=EXTERNAL load from side files."""
    import birdnet_tpu.onnx.proto as PP
    from birdnet_tpu.compiler.importer import import_onnx

    w = np.arange(24, dtype=np.float32).reshape(4, 6)
    side = tmp_path / "weights.bin"
    prefix = b"\x00" * 16
    side.write_bytes(prefix + w.tobytes() + b"\xff" * 8)

    t = PP.TensorProto(
        name="w",
        data_type=PP.DataType.FLOAT,
        dims=[4, 6],
        data_location=1,
        external_data={"location": "weights.bin", "offset": "16",
                       "length": str(w.nbytes)},
    )
    # to_numpy before resolution is a clear error
    with np.testing.assert_raises(ValueError):
        t.to_numpy()
    t.load_external(str(tmp_path))
    np.testing.assert_array_equal(t.to_numpy(), w)

    # escape attempts rejected
    t2 = PP.TensorProto(
        name="w", data_type=PP.DataType.FLOAT, dims=[1],
        data_location=1, external_data={"location": "../../etc/passwd"},
    )
    with np.testing.assert_raises(ValueError):
        t2.load_external(str(tmp_path))

    # full path: serialized model with an external initializer, loaded by
    # file path — the importer resolves the side file from the model dir
    graph = P.GraphProto(
        name="g",
        node=[P.make_node("MatMul", ["x", "w"], ["y"])],
        initializer=[
            PP.TensorProto(
                name="w", data_type=PP.DataType.FLOAT, dims=[4, 6],
                data_location=1,
                external_data={"location": "weights.bin", "offset": "16",
                               "length": str(w.nbytes)},
            )
        ],
        input=[P.make_value_info("x", P.DataType.FLOAT, [2, 4])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [2, 6])],
    )
    model_path = tmp_path / "ext.onnx"
    P.save_model(P.make_model(graph), model_path)
    imp = import_onnx(str(model_path))
    np.testing.assert_array_equal(imp.params["w"], w)


def test_external_data_prefix_sibling_rejected(tmp_path):
    """'/x/m' must not admit '/x/m_secrets' (commonpath, not str prefix)."""
    import birdnet_tpu.onnx.proto as PP

    base = tmp_path / "m"
    base.mkdir()
    sibling = tmp_path / "m_secrets"
    sibling.mkdir()
    (sibling / "f.bin").write_bytes(b"\x00" * 16)
    t = PP.TensorProto(
        name="w", data_type=PP.DataType.FLOAT, dims=[4],
        data_location=1, external_data={"location": "../m_secrets/f.bin"},
    )
    with np.testing.assert_raises(ValueError):
        t.load_external(str(base))


def test_decoder_robust_to_corruption():
    """Bit-flipped models must raise cleanly (ValueError/ModelLoadError),
    never hang or crash the process."""
    import numpy as np

    from birdnet_tpu.errors import ModelLoadError
    from birdnet_tpu.compiler.importer import import_onnx

    graph, _, _ = _simple_graph()
    data = bytearray(P.encode_model(P.make_model(graph)))
    rng = np.random.default_rng(0)
    outcomes = {"ok": 0, "raised": 0}
    for _ in range(150):
        mutated = bytearray(data)
        for _ in range(rng.integers(1, 4)):
            pos = int(rng.integers(0, len(mutated)))
            mutated[pos] = int(rng.integers(0, 256))
        try:
            import_onnx(bytes(mutated))
            outcomes["ok"] += 1
        except ModelLoadError:
            outcomes["raised"] += 1
    # No hangs, no segfaults, every mutation either parsed or raised.
    assert outcomes["ok"] + outcomes["raised"] == 150


def test_scalar_tensor_roundtrip_keeps_0d_shape():
    """Regression: np.ascontiguousarray promotes 0-d to 1-d; from_numpy must
    not — scalar initializers (Loop trip counts, thresholds) are 0-d."""
    t = P.TensorProto.from_numpy(np.array(3, np.int64), name="s")
    assert t.dims == []
    g = P.GraphProto(name="t", node=[], initializer=[t], input=[], output=[])
    m = P.decode_model(P.encode_model(P.make_model(g)))
    back = m.graph.initializer[0].to_numpy()
    assert back.shape == () and back == 3
