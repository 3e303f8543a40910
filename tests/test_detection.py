"""Model detection tests (mirrors reference src/detection.rs:183-285 matrix)."""

import pytest

from birdnet_tpu.detection import detect_model_type
from birdnet_tpu.errors import ModelDetectionError
from birdnet_tpu.types import ModelType


def test_detect_v24():
    cfg = detect_model_type([1, 144_000], [[1, 6522]])
    assert cfg.model_type is ModelType.BIRDNET_V24
    assert cfg.sample_rate == 48_000
    assert cfg.segment_duration == 3.0
    assert cfg.sample_count == 144_000
    assert cfg.num_species == 6522
    assert cfg.embedding_dim is None


def test_detect_v30():
    cfg = detect_model_type([1, 160_000], [[1, 1024], [1, 6522]])
    assert cfg.model_type is ModelType.BIRDNET_V30
    assert cfg.sample_rate == 32_000
    assert cfg.num_species == 6522
    assert cfg.embedding_dim == 1024


def test_detect_perch_v2():
    shapes = [[1, 1536], [1, 5, 1536], [1, 500, 128], [1, 14795]]
    cfg = detect_model_type([1, 160_000], shapes)
    assert cfg.model_type is ModelType.PERCH_V2
    assert cfg.num_species == 14795  # logits at output index 3
    assert cfg.embedding_dim == 1536


def test_detect_perch_v2_variable_embedding_dim():
    shapes = [[1, 768], [1, 5, 768], [1, 500, 128], [1, 10932]]
    cfg = detect_model_type([1, 160_000], shapes)
    assert cfg.embedding_dim == 768
    assert cfg.num_species == 10932


def test_detect_3d_input_shape():
    cfg = detect_model_type([1, 1, 144_000], [[1, 6522]])
    assert cfg.model_type is ModelType.BIRDNET_V24


def test_detect_unknown_combination():
    with pytest.raises(ModelDetectionError) as ei:
        detect_model_type([1, 100_000], [[1, 10]])
    assert "unsupported model: 100000 samples, 1 outputs" in str(ei.value)


def test_detect_v24_samples_wrong_output_count():
    with pytest.raises(ModelDetectionError):
        detect_model_type([1, 144_000], [[1, 10], [1, 20]])


def test_detect_160k_three_outputs_rejected():
    with pytest.raises(ModelDetectionError):
        detect_model_type([1, 160_000], [[1, 1], [1, 2], [1, 3]])


def test_detect_bad_input_rank():
    with pytest.raises(ModelDetectionError) as ei:
        detect_model_type([144_000], [[1, 10]])
    assert "unexpected input shape" in str(ei.value)
    with pytest.raises(ModelDetectionError):
        detect_model_type([1, 2, 3, 4], [[1, 10]])


def test_detect_empty_output_shape():
    with pytest.raises(ModelDetectionError) as ei:
        detect_model_type([1, 144_000], [[]])
    assert "empty output shape" in str(ei.value)


# --- override path (detection.rs:83-145) ---


def test_override_valid_v24():
    cfg = detect_model_type([1, 144_000], [[1, 321]], ModelType.BIRDNET_V24)
    assert cfg.model_type is ModelType.BIRDNET_V24
    assert cfg.num_species == 321


def test_override_v30_on_160k_2_outputs():
    cfg = detect_model_type(
        [1, 160_000], [[1, 512], [1, 100]], ModelType.BIRDNET_V30
    )
    assert cfg.model_type is ModelType.BIRDNET_V30
    assert cfg.embedding_dim == 512
    assert cfg.num_species == 100


def test_override_perch_on_160k_4_outputs():
    cfg = detect_model_type(
        [1, 160_000],
        [[1, 1536], [1, 2, 1536], [1, 50, 96], [1, 14795]],
        ModelType.PERCH_V2,
    )
    assert cfg.model_type is ModelType.PERCH_V2


def test_override_wrong_sample_count():
    with pytest.raises(ModelDetectionError) as ei:
        detect_model_type([1, 160_000], [[1, 10]], ModelType.BIRDNET_V24)
    assert "expects 144000 samples" in str(ei.value)


def test_override_wrong_output_count():
    with pytest.raises(ModelDetectionError) as ei:
        detect_model_type([1, 144_000], [[1, 10], [1, 2]], ModelType.BIRDNET_V24)
    assert "expects 1 output" in str(ei.value)
    with pytest.raises(ModelDetectionError):
        detect_model_type([1, 160_000], [[1, 10]], ModelType.BIRDNET_V30)
    with pytest.raises(ModelDetectionError):
        detect_model_type([1, 160_000], [[1, 10], [1, 2]], ModelType.PERCH_V2)
