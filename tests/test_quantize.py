"""Post-training int8 quantization: accuracy and wiring tests.

Uses the generated reference-shaped models (tiny variants) — quantized
inference must keep top-1 agreement with the fp32 model on in-distribution
inputs and produce a graph whose hot layers are QLinear* ops.
"""

import numpy as np
import pytest

import birdnet_tpu
from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.compiler.quantize import (
    quantize_model,
    synthetic_calibration_segments,
)
from birdnet_tpu.errors import ModelLoadError
from birdnet_tpu.models import birdnet_v24


@pytest.fixture(scope="module")
def tiny_v24(tmp_path_factory):
    p = tmp_path_factory.mktemp("q") / "v24_tiny.onnx"
    birdnet_v24.save_tiny(p, num_species=32)
    return str(p)


def _segments(n, count=144_000, seed=3):
    rng = np.random.default_rng(seed)
    t = np.arange(count, dtype=np.float32)
    rows = []
    for i in range(n):
        f = 300.0 + 700.0 * i
        sig = 0.4 * np.sin(2 * np.pi * f * t / 48_000.0)
        sig += 0.05 * rng.standard_normal(count)
        rows.append(sig.astype(np.float32))
    return np.stack(rows)


def test_quantize_structure_and_params(tiny_v24):
    model = import_onnx(tiny_v24)
    qmodel = quantize_model(model, [_segments(2)])
    ops = [n.op_type for n in qmodel.graph.node]
    assert any(op.startswith(("QLinear", "_QLinear")) for op in ops)
    # quantized weights are int8 params; their float originals are gone
    int8_params = [p for p in qmodel.params.values() if p.dtype == np.int8]
    assert int8_params, "expected int8 weight params"
    assert qmodel.param_bytes() < model.param_bytes(), "int8 must shrink weights"
    # the source model is untouched
    assert all(
        not n.op_type.startswith(("QLinear", "_QLinear")) for n in model.graph.node
    )


def test_quantized_top1_matches_fp32(tiny_v24):
    model = import_onnx(tiny_v24)
    calib = [_segments(4, seed=1), _segments(4, seed=2)]
    qmodel = quantize_model(model, calib)
    fwd = make_forward(model)
    qfwd = make_forward(qmodel)
    x = _segments(4, seed=9)
    (logits,) = fwd(model.params, x)
    (qlogits,) = qfwd(qmodel.params, x)
    logits, qlogits = np.asarray(logits), np.asarray(qlogits)
    assert logits.shape == qlogits.shape
    # A random-weight model has nearly flat logits (spread <1), so exact
    # argmax is noise-fragile; require the fp32 winner in the int8 top-3
    # on every row plus tight absolute/correlation bounds.
    top3 = np.argsort(qlogits, axis=1)[:, -3:]
    for i, win in enumerate(logits.argmax(axis=1)):
        assert win in top3[i]
    assert np.abs(logits - qlogits).max() < 0.1
    for row, qrow in zip(logits, qlogits):
        c = np.corrcoef(row, qrow)[0, 1]
        assert c > 0.98, f"fp32/int8 logit correlation too low: {c}"


def test_builder_int8_end_to_end(tiny_v24):
    labels = [f"s{i}" for i in range(32)]
    clf_fp = (
        birdnet_tpu.Classifier.builder()
        .model_path(tiny_v24)
        .labels(labels)
        .top_k(5)
        .build()
    )
    clf_q = (
        birdnet_tpu.Classifier.builder()
        .model_path(tiny_v24)
        .labels(labels)
        .top_k(5)
        .int8(calibration_segments=[_segments(4)])
        .build()
    )
    seg = _segments(1, seed=42)[0]
    fp = clf_fp.predict(seg)
    q = clf_q.predict(seg)
    assert q.predictions[0].species == fp.predictions[0].species
    fp_top = {p.species for p in fp.predictions}
    q_top = {p.species for p in q.predictions}
    assert len(fp_top & q_top) >= 3  # top-5 sets mostly agree


def test_builder_int8_synthetic_calibration(tiny_v24):
    labels = [f"s{i}" for i in range(32)]
    clf = (
        birdnet_tpu.Classifier.builder()
        .model_path(tiny_v24)
        .labels(labels)
        .int8()  # default synthetic calibration
        .build()
    )
    res = clf.predict(_segments(1)[0])
    assert len(res.predictions) > 0
    assert np.isfinite(res.raw_scores).all()


def test_quantize_rejects_model_without_layers():
    from birdnet_tpu.onnx import proto as P

    g = P.GraphProto(
        name="t",
        node=[P.make_node("Relu", ["x"], ["y"])],
        initializer=[],
        input=[P.make_value_info("x", P.DataType.FLOAT, [1, 4])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [1, 4])],
    )
    model = import_onnx(P.make_model(g))
    with pytest.raises(ModelLoadError):
        quantize_model(model, [np.ones((1, 4), np.float32)])


def test_synthetic_calibration_shape():
    batches = synthetic_calibration_segments(1000, batches=3, batch_size=2)
    assert len(batches) == 3
    for b in batches:
        assert b.shape == (2, 1000)
        assert b.dtype == np.float32
        assert np.abs(b).max() <= 1.0


def test_quantized_checkpoint_roundtrip(tiny_v24, tmp_path):
    from birdnet_tpu.checkpoint import load_checkpoint, save_checkpoint

    model = import_onnx(tiny_v24)
    qmodel = quantize_model(model, [_segments(2)])
    p = tmp_path / "q.btck"
    save_checkpoint(qmodel, p)
    loaded = load_checkpoint(p)
    x = _segments(2, seed=5)
    (a,) = make_forward(qmodel)(qmodel.params, x)
    (b,) = make_forward(loaded)(loaded.params, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_builder_int8_raw_recording_calibration(tiny_v24):
    """A raw 1-D recording (int16 PCM) is chunked into calibration segments."""
    rng = np.random.default_rng(0)
    recording = (rng.normal(size=144_000 * 5) * 4000).astype(np.int16)
    labels = [f"s{i}" for i in range(32)]
    clf = (
        birdnet_tpu.Classifier.builder()
        .model_path(tiny_v24)
        .labels(labels)
        .int8(calibration_segments=recording)
        .build()
    )
    res = clf.predict(_segments(1)[0])
    assert np.isfinite(res.raw_scores).all()


def test_calibration_from_samples_shapes():
    from birdnet_tpu.compiler.quantize import calibration_from_samples

    batches = calibration_from_samples(np.ones(10_000, np.int16), 3_000)
    segs = np.concatenate(batches)
    assert segs.shape[1] == 3_000
    assert segs.dtype == np.float32
    assert np.abs(segs).max() <= 1.0
    # short audio pads up to one segment
    (b,) = calibration_from_samples(np.ones(10, np.float32), 100)
    assert b.shape == (1, 100)


def test_builder_int8_2d_segment_stack(tiny_v24):
    """A 2-D [N, sample_count] array is split into batches, not iterated
    into 1-D rows misread as whole model inputs."""
    labels = [f"s{i}" for i in range(32)]
    clf = (
        birdnet_tpu.Classifier.builder()
        .model_path(tiny_v24)
        .labels(labels)
        .int8(calibration_segments=_segments(6))
        .build()
    )
    res = clf.predict(_segments(1)[0])
    assert np.isfinite(res.raw_scores).all()


def test_quantize_keeps_float_weight_shared_with_unquantized_node():
    """A weight tied to both an eligible MatMul and a float-only consumer
    keeps its float copy (regression: it used to be deleted)."""
    from birdnet_tpu.onnx import proto as P

    rng = np.random.default_rng(5)
    w = rng.normal(size=(16, 8)).astype(np.float32)
    x = rng.normal(size=(4, 16)).astype(np.float32)
    nodes = [
        P.make_node("MatMul", ["x", "w"], ["m"]),
        P.make_node("Relu", ["m"], ["r"]),
        # float-only second consumer of the same weight initializer
        P.make_node("ReduceSum", ["w"], ["wsum"], keepdims=1),
        P.make_node("Mul", ["r", "scale2"], ["r2"]),
        P.make_node("MatMul", ["r2", "w2"], ["y0"]),
        P.make_node("Add", ["y0", "wsum"], ["y"]),
    ]
    inits = {
        "w": w,
        "w2": rng.normal(size=(8, 1)).astype(np.float32),
        "scale2": np.float32(0.5) * np.ones(8, np.float32),
    }
    init = [P.TensorProto.from_numpy(v, name=k) for k, v in inits.items()]
    g = P.GraphProto(
        name="t",
        node=nodes,
        initializer=init,
        input=[P.make_value_info("x", P.DataType.FLOAT, [4, 16])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [4, 1])],
    )
    model = import_onnx(P.make_model(g), optimize=False)
    q = quantize_model(
        model, [x], quantize_first_layer=True
    )
    # loads and runs: the float 'w' still exists for ReduceSum
    (y_ref,) = make_forward(model)(model.params, x)
    (y_q,) = make_forward(q)(q.params, x)
    np.testing.assert_allclose(
        np.asarray(y_q), np.asarray(y_ref), rtol=0.1, atol=0.1
    )
