"""Core type tests (mirrors reference src/types.rs:187-294 test matrix)."""

from birdnet_tpu.types import (
    DeviceBackend,
    LabelFormat,
    LocationScore,
    ModelType,
    Prediction,
)


def test_birdnet_v24_properties():
    m = ModelType.BIRDNET_V24
    assert m.sample_rate == 48_000
    assert m.segment_duration == 3.0
    assert m.sample_count == 144_000
    assert not m.has_embeddings
    assert m.expected_label_format is LabelFormat.TEXT


def test_birdnet_v30_properties():
    m = ModelType.BIRDNET_V30
    assert m.sample_rate == 32_000
    assert m.segment_duration == 5.0
    assert m.sample_count == 160_000
    assert m.has_embeddings
    assert m.expected_label_format is LabelFormat.CSV


def test_perch_v2_properties():
    m = ModelType.PERCH_V2
    assert m.sample_rate == 32_000
    assert m.segment_duration == 5.0
    assert m.sample_count == 160_000
    assert m.has_embeddings
    assert m.expected_label_format is LabelFormat.CSV


def test_sample_count_matches_rate_times_duration():
    for m in ModelType:
        assert m.sample_count == int(m.sample_rate * m.segment_duration)


def test_display_names():
    assert ModelType.BIRDNET_V24.display_name == "BirdNET v2.4"
    assert ModelType.BIRDNET_V30.display_name == "BirdNET v3.0"
    assert ModelType.PERCH_V2.display_name == "Perch v2"


def test_location_score_creation():
    s = LocationScore(species="Turdus merula_Common Blackbird", score=0.85, index=42)
    assert s.species == "Turdus merula_Common Blackbird"
    assert s.score == 0.85
    assert s.index == 42


def test_prediction_fields():
    p = Prediction(species="x", confidence=0.5, index=3)
    assert (p.species, p.confidence, p.index) == ("x", 0.5, 3)


def test_device_backend_strings():
    assert str(DeviceBackend.CPU) == "CPU"
    assert DeviceBackend.CPU.category == "CPU"
    assert DeviceBackend.TPU.category == "Accelerator"
    assert DeviceBackend.GPU.category == "GPU"


def test_version_matches_pyproject():
    """__version__ and pyproject.toml must not drift (they did once).
    Parsed with a regex, not tomllib — the project supports Python 3.10
    where tomllib does not exist."""
    import pathlib
    import re

    import birdnet_tpu

    root = pathlib.Path(__file__).resolve().parent.parent
    text = (root / "pyproject.toml").read_text()
    m = re.search(r'^version = "([^"]+)"', text, flags=re.M)
    assert m, "pyproject.toml has no version line"
    assert birdnet_tpu.__version__ == m.group(1)


def test_readme_root_imports():
    """Every name the README's code blocks import from the package root
    must actually be exported there (reference analog: the lib.rs:93-111
    re-export list is the crate's public contract)."""
    import birdnet_tpu as bt

    for name in [
        "Classifier", "ClassifierBuilder", "RangeFilter",
        "InferenceOptions", "CancellationToken", "read_wav", "write_wav",
        "chunk_audio", "load_labels_from_file", "init_runtime",
        "available_devices", "top_k_predictions",
    ]:
        assert hasattr(bt, name), f"README imports birdnet_tpu.{name}"
