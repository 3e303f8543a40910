"""ONNX protobuf codec tests: encode → decode roundtrips."""

import numpy as np

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
