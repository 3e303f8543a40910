"""Model generator contract tests: exact reference I/O shapes (SURVEY §0)."""

import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx
from birdnet_tpu.detection import detect_model_type
from birdnet_tpu.onnx import proto as P
from birdnet_tpu.types import ModelType


def _shapes(model):
    imp = import_onnx(P.encode_model(model))
    return imp


def test_v24_contract():
    from birdnet_tpu.models import birdnet_v24

    imp = _shapes(birdnet_v24.build_model(width=0.1, depth=1, num_species=10))
    assert imp.input_shapes == [[None, 144_000]]
    assert [s[-1] for s in imp.output_shapes] == [10]
    cfg = detect_model_type(*imp.detection_shapes())
    assert cfg.model_type is ModelType.BIRDNET_V24


def test_v30_contract():
    from birdnet_tpu.models import birdnet_v30

    imp = _shapes(birdnet_v30.build_model(width=0.1, depth=1, num_species=10,
                                          embedding_dim=32))
    assert imp.input_shapes == [[None, 160_000]]
    assert imp.output_names == ["embeddings", "logits"]
    assert [s[-1] for s in imp.output_shapes] == [32, 10]
    cfg = detect_model_type(*imp.detection_shapes())
    assert cfg.model_type is ModelType.BIRDNET_V30
    assert cfg.embedding_dim == 32


def test_perch_contract():
    from birdnet_tpu.models import perch_v2

    imp = _shapes(perch_v2.build_model(width=0.1, depth=1, num_species=12,
                                       embedding_dim=48))
    assert imp.input_shapes == [[None, 160_000]]
    # 4 outputs with logits LAST (index 3) — the demux quirk
    assert len(imp.output_names) == 4
    assert imp.output_names[3] == "logits"
    assert imp.output_shapes[3][-1] == 12
    assert imp.output_shapes[0][-1] == 48
    cfg = detect_model_type(*imp.detection_shapes())
    assert cfg.model_type is ModelType.PERCH_V2


def test_meta_contract():
    from birdnet_tpu.models import meta

    imp = _shapes(meta.build_model(num_species=10, hidden=16))
    assert imp.input_shapes == [[1, 3]]
    assert imp.output_shapes == [[1, 10]]


def test_full_size_v24_matches_reference_footprint():
    """Default v2.4 params ≈ the reference's documented ~50 MB weights
    (reference: docs/gpu-batch-optimization.md:222)."""
    from birdnet_tpu.models import birdnet_v24

    imp = _shapes(birdnet_v24.build_model())
    mb = imp.param_bytes() / 1e6
    assert 40 <= mb <= 60, f"expected ~50 MB, got {mb:.1f} MB"
    cfg = detect_model_type(*imp.detection_shapes())
    assert cfg.num_species == 6522


def test_generators_deterministic():
    from birdnet_tpu.models import birdnet_v24

    a = P.encode_model(birdnet_v24.build_model(width=0.1, depth=1, num_species=5, seed=9))
    b = P.encode_model(birdnet_v24.build_model(width=0.1, depth=1, num_species=5, seed=9))
    assert a == b
    c = P.encode_model(birdnet_v24.build_model(width=0.1, depth=1, num_species=5, seed=10))
    assert a != c
