"""Semantically invalid model files must fail with typed ModelLoadError.

The codec fuzz suite covers byte-level corruption; this covers the layer
above it — files that decode fine but describe a broken graph (dangling
names, impossible conv geometry, mismatched initializers). The reference
validates graphs at session creation and surfaces Error::ModelLoad
(commit_from_file, src/classifier.rs:348-350); the public builder here
must do the same rather than leaking raw KeyError/ValueError tracebacks
from trace time.
"""

from __future__ import annotations

import copy

import numpy as np
import pytest

from birdnet_tpu import Classifier
from birdnet_tpu.errors import ModelLoadError
from birdnet_tpu.onnx import proto as P

N_SPECIES = 7
LABELS = [f"s{i}" for i in range(N_SPECIES)]


@pytest.fixture(scope="module")
def tiny_v24(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path_factory.mktemp("semantic") / "v24_tiny.onnx"
    birdnet_v24.save_tiny(p, num_species=N_SPECIES)
    return P.decode_model(open(p, "rb").read())


def _build(tmp_path, model):
    p = tmp_path / "mutated.onnx"
    p.write_bytes(P.encode_model(model))
    return (
        Classifier.builder()
        .model_path(str(p))
        .labels(LABELS)
        .build()
    )


def _first_conv(model):
    for n in model.graph.node:
        if n.op_type == "Conv":
            return n
    raise AssertionError("tiny v2.4 has no Conv node")


def test_baseline_builds(tmp_path, tiny_v24):
    clf = _build(tmp_path, tiny_v24)
    assert clf.num_species == N_SPECIES


def test_dangling_node_input(tmp_path, tiny_v24):
    m = copy.deepcopy(tiny_v24)
    _first_conv(m).input[1] = "no_such_tensor"
    with pytest.raises(ModelLoadError):
        _build(tmp_path, m)


def test_broken_producer_chain(tmp_path, tiny_v24):
    m = copy.deepcopy(tiny_v24)
    _first_conv(m).output[0] = "renamed_out"
    with pytest.raises(ModelLoadError):
        _build(tmp_path, m)


def test_unproduced_graph_output(tmp_path, tiny_v24):
    m = copy.deepcopy(tiny_v24)
    m.graph.output[0].name = "not_produced_anywhere"
    with pytest.raises(ModelLoadError):
        _build(tmp_path, m)


def test_initializer_dims_mismatch(tmp_path, tiny_v24):
    m = copy.deepcopy(tiny_v24)
    w = m.graph.initializer[0]
    w.dims[0] = int(w.dims[0]) + 3
    with pytest.raises(ModelLoadError):
        _build(tmp_path, m)


def test_unknown_op(tmp_path, tiny_v24):
    m = copy.deepcopy(tiny_v24)
    m.graph.node[-1].op_type = "NoSuchOp"
    with pytest.raises(ModelLoadError, match="NoSuchOp"):
        _build(tmp_path, m)


def test_zero_conv_strides(tmp_path, tiny_v24):
    m = copy.deepcopy(tiny_v24)
    conv = _first_conv(m)
    replaced = False
    for a in conv.attribute:
        if a.name == "strides":
            a.ints = [0] * len(a.ints)
            replaced = True
    if not replaced:
        nd = 2
        conv.attribute.append(
            P.AttributeProto(name="strides", type=7, ints=[0] * nd)
        )
    with pytest.raises(ModelLoadError, match="validation trace"):
        _build(tmp_path, m)


def test_bad_conv_group(tmp_path, tiny_v24):
    m = copy.deepcopy(tiny_v24)
    conv = _first_conv(m)
    replaced = False
    for a in conv.attribute:
        if a.name == "group":
            a.i = 7
            replaced = True
    if not replaced:
        conv.attribute.append(P.AttributeProto(name="group", type=2, i=7))
    with pytest.raises(ModelLoadError):
        _build(tmp_path, m)


@pytest.mark.parametrize("seed", range(10))
def test_random_semantic_mutations(seed):
    """Randomized arm of the suite above (scripts/semantic_fuzz.py is the
    wide-net version): one random structural mutation of a torch-exported
    graph either rejects typed at validation or executes cleanly."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    import semantic_fuzz as SF

    kind = list(SF.BASE_KINDS)[seed % len(SF.BASE_KINDS)]
    res = SF.run_one(kind, 90_000 + seed)
    assert not res.startswith("RAW"), res


def test_pre_broadcast_era_opset_accepted(tmp_path, tiny_v24):
    """Opset <= 6 files evaluate through the legacy-dialect shims (round-4;
    previously a typed rejection). A graph that uses none of the legacy
    attributes — like this one — must produce identical predictions under
    either opset tag; the dialect itself is covered in
    tests/test_legacy_opset.py."""
    m = copy.deepcopy(tiny_v24)
    for imp in m.opset_import:
        if imp.domain in ("", "ai.onnx"):
            imp.version = 6
    seg = np.sin(
        np.linspace(0, 1000, 144_000), dtype=np.float32
    )
    legacy = _build(tmp_path, m).predict(seg)
    modern = _build(tmp_path, tiny_v24).predict(seg)
    assert [p.index for p in legacy.predictions] == [
        p.index for p in modern.predictions
    ]
    np.testing.assert_allclose(
        legacy.raw_scores, modern.raw_scores, rtol=1e-5, atol=1e-6
    )
