"""Range filter tests (mirrors reference src/rangefilter.rs:582-917 matrix
plus the real-model workflow from tests/integration_test.rs:595-835, run on
a generated meta model)."""

import numpy as np
import pytest

import birdnet_tpu.errors as E
from birdnet_tpu.rangefilter import (
    RangeFilter,
    calculate_week,
    filter_predictions,
    validate_coordinates,
    validate_date,
)
from birdnet_tpu.types import LocationScore, Prediction


# --- week calendar (rangefilter.rs:77-81, tests :619-627) -------------------


def test_week_january_first():
    assert calculate_week(1, 1) == 1.0


def test_week_boundaries():
    assert calculate_week(1, 7) == 1.0
    assert calculate_week(1, 8) == 2.0
    assert calculate_week(1, 28) == 4.0
    assert calculate_week(2, 1) == 5.0
    assert calculate_week(12, 28) == 48.0


def test_week_can_exceed_48():
    # Days 29-31 produce week 49 (documented reference quirk)
    assert calculate_week(12, 29) == 49.0
    assert calculate_week(12, 31) == 49.0
    assert calculate_week(1, 31) == 5.0


def test_week_midyear():
    assert calculate_week(6, 15) == (6 - 1) * 4 + (15 - 1) // 7 + 1


# --- validation ---------------------------------------------------------------


def test_valid_coordinates():
    validate_coordinates(0.0, 0.0)
    validate_coordinates(-90.0, -180.0)
    validate_coordinates(90.0, 180.0)


@pytest.mark.parametrize("lat,lon", [(90.1, 0.0), (-90.1, 0.0), (0.0, 180.1), (0.0, -180.1)])
def test_invalid_coordinates(lat, lon):
    with pytest.raises(E.InvalidCoordinatesError):
        validate_coordinates(lat, lon)


def test_valid_dates():
    validate_date(1, 1)
    validate_date(12, 31)


@pytest.mark.parametrize("month,day", [(0, 1), (13, 1), (1, 0), (1, 32)])
def test_invalid_dates(month, day):
    with pytest.raises(E.InvalidDateError):
        validate_date(month, day)


# --- filter semantics (rangefilter.rs:333-386) ------------------------------


def _pred(species, conf, idx=0):
    return Prediction(species=species, confidence=conf, index=idx)


def _score(species, score, idx=0):
    return LocationScore(species=species, score=score, index=idx)


def test_filter_drops_below_threshold():
    preds = [_pred("a", 0.9), _pred("b", 0.8)]
    scores = [_score("a", 0.5), _score("b", 0.001)]
    out = filter_predictions(preds, scores, threshold=0.01)
    assert [p.species for p in out] == ["a"]
    assert out[0].confidence == 0.9  # unchanged without rerank


def test_filter_keeps_absent_species_unchanged():
    preds = [_pred("a", 0.9), _pred("mystery", 0.7)]
    scores = [_score("a", 0.5)]
    out = filter_predictions(preds, scores, threshold=0.01)
    assert [p.species for p in out] == ["a", "mystery"]
    assert out[1].confidence == 0.7


def test_filter_rerank_multiplies_and_resorts():
    preds = [_pred("a", 0.9), _pred("b", 0.8)]
    scores = [_score("a", 0.1), _score("b", 0.9)]
    out = filter_predictions(preds, scores, threshold=0.01, rerank=True)
    # a: 0.9*0.1=0.09, b: 0.8*0.9=0.72 → b first
    assert [p.species for p in out] == ["b", "a"]
    assert out[0].confidence == pytest.approx(0.72)
    assert out[1].confidence == pytest.approx(0.09)


def test_filter_exact_threshold_kept():
    preds = [_pred("a", 0.5)]
    scores = [_score("a", 0.01)]
    out = filter_predictions(preds, scores, threshold=0.01)
    assert len(out) == 1


def test_filter_empty_inputs():
    assert filter_predictions([], [_score("a", 0.5)], 0.01) == []
    preds = [_pred("a", 0.9)]
    out = filter_predictions(preds, [], 0.01)
    assert [p.species for p in out] == ["a"]  # nothing in meta model → all kept


# --- builder + model workflow -------------------------------------------------


LABELS = [f"species_{i}" for i in range(10)]


@pytest.fixture(scope="session")
def meta_model(tmp_path_factory):
    from birdnet_tpu.models import meta

    p = tmp_path_factory.mktemp("models") / "meta_tiny.onnx"
    meta.save_tiny(p, num_species=10)
    return str(p)


def test_builder_requires_model():
    with pytest.raises(E.ModelPathRequiredError):
        RangeFilter.builder().labels(LABELS).build()


def test_builder_requires_labels(meta_model):
    with pytest.raises(E.LabelsRequiredError):
        RangeFilter.builder().model_path(meta_model).build()


def test_builder_label_count(meta_model):
    with pytest.raises(E.LabelCountError):
        RangeFilter.builder().model_path(meta_model).labels(["x"]).build()


def test_default_threshold(meta_model):
    rf = RangeFilter.builder().model_path(meta_model).labels(LABELS).build()
    assert rf.threshold == 0.01


def test_predict_scores(meta_model):
    rf = RangeFilter.builder().model_path(meta_model).labels(LABELS).build()
    scores = rf.predict(42.5, -76.4, 6, 15)
    assert all(isinstance(s, LocationScore) for s in scores)
    vals = [s.score for s in scores]
    assert vals == sorted(vals, reverse=True)
    assert all(v >= 0.01 for v in vals)
    assert all(s.species == LABELS[s.index] for s in scores)
    # deterministic
    scores2 = rf.predict(42.5, -76.4, 6, 15)
    assert [(s.species, s.score) for s in scores2] == [
        (s.species, s.score) for s in scores
    ]


def test_predict_validates(meta_model):
    rf = RangeFilter.builder().model_path(meta_model).labels(LABELS).build()
    with pytest.raises(E.InvalidCoordinatesError):
        rf.predict(91.0, 0.0, 6, 15)
    with pytest.raises(E.InvalidDateError):
        rf.predict(0.0, 0.0, 13, 15)


def test_threshold_filters_scores(meta_model):
    rf_low = RangeFilter.builder().model_path(meta_model).labels(LABELS).threshold(0.0).build()
    rf_high = (
        RangeFilter.builder().model_path(meta_model).labels(LABELS).threshold(0.9).build()
    )
    low = rf_low.predict(10.0, 10.0, 3, 3)
    high = rf_high.predict(10.0, 10.0, 3, 3)
    assert len(low) == 10  # threshold 0 keeps everything
    assert len(high) <= len(low)
    assert all(s.score >= 0.9 for s in high)


def test_end_to_end_filter_workflow(meta_model):
    """Classifier predictions filtered by meta model (integration-style)."""
    rf = RangeFilter.builder().model_path(meta_model).labels(LABELS).build()
    scores = rf.predict(42.5, -76.4, 6, 15)
    preds = [_pred(LABELS[i], 0.8 - 0.05 * i, i) for i in range(5)]
    out = rf.filter_predictions(preds, scores)
    assert all(p.species in LABELS for p in out)
    reranked = rf.filter_predictions(preds, scores, rerank=True)
    confs = [p.confidence for p in reranked]
    assert confs == sorted(confs, reverse=True)
    # batch variant
    batches = rf.filter_predictions_batch([preds, preds[:2]], scores)
    assert len(batches) == 2


def test_wrong_output_count_rejected(tmp_path):
    """A 2-output model is not a valid meta model."""
    from birdnet_tpu.models import birdnet_v30

    p = tmp_path / "v30.onnx"
    birdnet_v30.save_tiny(p, num_species=10, embedding_dim=8)
    with pytest.raises(E.RangeFilterInferenceError):
        RangeFilter.builder().model_path(p).labels(LABELS).build()


def test_dynamic_species_dim_rejected(tmp_path):
    """A meta model whose SPECIES output dim is dynamic must fail with a
    clear error, not num_species=1 and a baffling label-count mismatch."""
    import numpy as np

    from birdnet_tpu.onnx import proto as P

    w = np.zeros((3, 10), np.float32)
    graph = P.GraphProto(
        name="meta_dyn",
        node=[P.make_node("MatMul", ["input", "w"], ["output"])],
        initializer=[P.TensorProto.from_numpy(w, name="w")],
        input=[P.make_value_info("input", P.DataType.FLOAT, [1, 3])],
        output=[P.make_value_info("output", P.DataType.FLOAT, ["batch", "species"])],
    )
    p = tmp_path / "meta_dyn.onnx"
    p.write_bytes(P.encode_model(P.make_model(graph)))
    with pytest.raises(E.RangeFilterInferenceError, match="dynamic species"):
        RangeFilter.builder().model_path(p).labels(LABELS).build()


def test_from_classifier_labels_integration(meta_model, tmp_path):
    """Labels copied from a live classifier stay in sync (reference:
    rangefilter.rs:186-193)."""
    from birdnet_tpu import Classifier
    from birdnet_tpu.models import birdnet_v24

    mp = tmp_path / "v24.onnx"
    birdnet_v24.save_tiny(mp, num_species=10)
    clf = Classifier.builder().model_path(mp).labels(LABELS).top_k(5).build()
    rf = (
        RangeFilter.builder()
        .model_path(meta_model)
        .from_classifier_labels(clf.labels)
        .build()
    )
    assert rf.labels == clf.labels
    preds = clf.predict(np.zeros(144_000, np.float32)).predictions
    scores = rf.predict(42.0, -76.0, 6, 15)
    out = rf.filter_predictions(preds, scores)
    assert all(p.species in clf.labels for p in out)
