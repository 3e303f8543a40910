"""Checkpoint (fast weight cache) tests."""

import numpy as np
import pytest

from birdnet_tpu import Classifier
from birdnet_tpu.checkpoint import import_any, load_checkpoint, save_checkpoint
from birdnet_tpu.compiler.importer import import_onnx
from birdnet_tpu.errors import ModelLoadError
from birdnet_tpu.testutil import mock_labels, sine_segment


@pytest.fixture(scope="module")
def tiny_model_path(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path_factory.mktemp("ck") / "v24.onnx"
    birdnet_v24.save_tiny(p, num_species=10)
    return str(p)


def test_roundtrip(tiny_model_path, tmp_path):
    imp = import_onnx(tiny_model_path)
    ck = tmp_path / "model.btck"
    save_checkpoint(imp, ck)
    back = load_checkpoint(ck)
    assert back.opset == imp.opset
    assert back.input_shapes == imp.input_shapes
    assert back.output_names == imp.output_names
    assert set(back.params) == set(imp.params)
    for k in imp.params:
        np.testing.assert_array_equal(back.params[k], imp.params[k])
    for k in imp.consts:
        np.testing.assert_array_equal(back.consts[k], imp.consts[k])
    assert [n.op_type for n in back.graph.node] == [
        n.op_type for n in imp.graph.node
    ]


def test_checkpoint_strips_stale_initializers(tiny_model_path, tmp_path):
    """graph.pb must not persist the pre-optimization initializer list:
    it doubles the checkpoint size and records weights that contradict the
    authoritative flat params (BN-fold mutates tensors, not protos)."""
    import os
    import zipfile

    imp = import_onnx(tiny_model_path)
    ck = tmp_path / "model.btck"
    save_checkpoint(imp, ck)
    # the in-memory model keeps its initializers (save must not mutate)
    assert imp.graph.initializer
    back = load_checkpoint(ck)
    assert back.graph.initializer == []
    with zipfile.ZipFile(ck) as zf:
        graph_pb_size = zf.getinfo("graph.pb").file_size
        flat = sum(
            i.file_size for i in zf.infolist() if i.filename.startswith(("p/", "c/"))
        )
    # the graph proto is now structure-only — far smaller than the weights
    assert graph_pb_size < flat / 4
    assert os.path.getsize(ck) < os.path.getsize(tiny_model_path) * 1.5


def test_corrupt_graph_pb_raises_model_load_error(tiny_model_path, tmp_path):
    import zipfile

    imp = import_onnx(tiny_model_path)
    ck = tmp_path / "model.btck"
    save_checkpoint(imp, ck)
    # rewrite the zip with corrupted graph bytes
    ck2 = tmp_path / "corrupt.btck"
    with zipfile.ZipFile(ck) as zin, zipfile.ZipFile(ck2, "w") as zout:
        for item in zin.infolist():
            data = zin.read(item.filename)
            if item.filename == "graph.pb":
                data = data[: len(data) // 2] + b"\xff\xff\xff\xff"
            zout.writestr(item, data)
    with pytest.raises(ModelLoadError):
        load_checkpoint(ck2)


def test_classifier_from_checkpoint_matches_onnx(tiny_model_path, tmp_path):
    labels = mock_labels(10)
    clf = Classifier.builder().model_path(tiny_model_path).labels(labels).build()
    ck = tmp_path / "model.btck"
    clf.save_checkpoint(ck)
    clf2 = Classifier.builder().model_path(ck).labels(labels).build()
    seg = sine_segment()
    r1 = clf.predict(seg)
    r2 = clf2.predict(seg)
    np.testing.assert_array_equal(r1.raw_scores, r2.raw_scores)


def test_import_any_sniffs(tiny_model_path, tmp_path):
    imp = import_any(tiny_model_path)  # onnx
    ck = tmp_path / "model.btck"
    save_checkpoint(imp, ck)
    imp2 = import_any(ck)  # checkpoint
    assert imp2.output_names == imp.output_names


def test_bad_checkpoint(tmp_path):
    p = tmp_path / "junk.btck"
    p.write_bytes(b"PK\x03\x04 but not a zip really")
    with pytest.raises(ModelLoadError):
        import_any(p)


@pytest.mark.cpu_oracle
def test_checkpoint_preserves_contrib_domains(tmp_path):
    """A .btck of an ORT-optimized (com.microsoft) model must keep node
    domains through the graph re-encode, or reload would dispatch the
    fused ops against the wrong (core) table."""
    import jax

    from birdnet_tpu.compiler.importer import make_forward
    from birdnet_tpu.onnx import proto as P

    r = np.random.default_rng(0)
    x = r.standard_normal((2, 6), dtype=np.float32)
    w = r.standard_normal((6, 4), dtype=np.float32)
    node = P.make_node("FusedGemm", ["x", "w"], ["y"],
                       domain="com.microsoft", activation="Relu")
    graph = P.GraphProto(
        name="g", node=[node],
        input=[P.make_value_info("x", P.DataType.FLOAT, [2, 6])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [2, 4])],
        initializer=[P.TensorProto.from_numpy(w, "w")],
    )
    m = P.ModelProto(ir_version=8, producer_name="onnxruntime", graph=graph,
                     opset_import=[P.OperatorSetId(domain="", version=17),
                                   P.OperatorSetId(domain="com.microsoft",
                                                   version=1)])
    imp = import_onnx(P.encode_model(m))
    ck = tmp_path / "contrib.btck"
    save_checkpoint(imp, ck)
    reloaded = load_checkpoint(ck)
    assert reloaded.graph.node[0].domain == "com.microsoft"
    got = np.asarray(
        jax.jit(make_forward(reloaded, precision="fp32"))(reloaded.params, x)[0]
    )
    np.testing.assert_allclose(got, np.maximum(x @ w, 0.0), atol=1e-5)


@pytest.mark.cpu_oracle
def test_checkpoint_roundtrips_bf16_params(tmp_path):
    """bfloat16 weights (≥16 elements → params) must survive the manifest's
    dtype-string round trip (np.dtype('bfloat16') via ml_dtypes)."""
    import jax
    import ml_dtypes

    from birdnet_tpu.compiler.importer import make_forward
    from birdnet_tpu.onnx import proto as P

    r = np.random.default_rng(1)
    w = r.standard_normal((8, 4)).astype(ml_dtypes.bfloat16)
    x = r.standard_normal((3, 8), dtype=np.float32)
    nodes = [
        P.make_node("Cast", ["w16"], ["w"], to=P.DataType.FLOAT),
        P.make_node("MatMul", ["x", "w"], ["y"]),
    ]
    graph = P.GraphProto(
        name="g", node=nodes,
        input=[P.make_value_info("x", P.DataType.FLOAT, [3, 8])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [3, 4])],
        initializer=[P.TensorProto.from_numpy(w, "w16")],
    )
    m = P.ModelProto(ir_version=10, producer_name="tf2onnx", graph=graph,
                     opset_import=[P.OperatorSetId(domain="", version=17)])
    imp = import_onnx(P.encode_model(m))
    ck = tmp_path / "bf16.btck"
    save_checkpoint(imp, ck)
    reloaded = load_checkpoint(ck)
    got = np.asarray(
        jax.jit(make_forward(reloaded, precision="fp32"))(reloaded.params, x)[0]
    )
    np.testing.assert_allclose(got, x @ w.astype(np.float32), atol=1e-5)
