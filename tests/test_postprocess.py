"""Postprocess tests (mirrors reference src/postprocess.rs:95-332 matrix)."""

import math

import numpy as np
import pytest

from birdnet_tpu.postprocess import sigmoid, top_k_predictions


LABELS = [f"species_{i}" for i in range(10)]


def test_sigmoid_values():
    assert sigmoid(0.0) == pytest.approx(0.5)
    assert sigmoid(10.0) == pytest.approx(1.0, abs=1e-4)
    assert sigmoid(-10.0) == pytest.approx(0.0, abs=1e-4)
    assert math.isnan(sigmoid(float("nan")))
    assert sigmoid(float("inf")) == 1.0
    assert sigmoid(float("-inf")) == 0.0


def test_sigmoid_no_overflow_for_large_negative():
    assert sigmoid(-1000.0) == 0.0


def test_basic_top_k():
    logits = [0.1, 5.0, -2.0, 3.0, 1.0]
    preds = top_k_predictions(logits, LABELS, 3)
    assert [p.index for p in preds] == [1, 3, 4]
    assert preds[0].species == "species_1"
    assert preds[0].confidence == pytest.approx(sigmoid(5.0), rel=1e-6)
    # sorted descending
    confs = [p.confidence for p in preds]
    assert confs == sorted(confs, reverse=True)


def test_top_k_larger_than_n():
    preds = top_k_predictions([1.0, 2.0], LABELS, 10)
    assert len(preds) == 2
    assert [p.index for p in preds] == [1, 0]


def test_top_k_zero_and_empty():
    assert top_k_predictions([1.0], LABELS, 0) == []
    assert top_k_predictions([], LABELS, 5) == []


def test_min_confidence_filter():
    logits = [0.0, 5.0, -5.0]
    preds = top_k_predictions(logits, LABELS, 3, min_confidence=0.4)
    # sigmoid(-5) ≈ 0.0067 filtered; sigmoid(0)=0.5 and sigmoid(5)≈0.993 kept
    assert [p.index for p in preds] == [1, 0]


def test_min_confidence_filters_all():
    preds = top_k_predictions([-10.0, -20.0], LABELS, 2, min_confidence=0.5)
    assert preds == []


def test_missing_label_becomes_unknown():
    logits = [0.0] * 12
    logits[11] = 9.0
    preds = top_k_predictions(logits, LABELS, 1)
    assert preds[0].species == "unknown_11"
    assert preds[0].index == 11


def test_nan_logit_selected_but_filtered_by_min_confidence():
    # NaN orders above +inf (Rust total_cmp), so it enters the top-K…
    logits = [1.0, float("nan"), 0.5]
    preds = top_k_predictions(logits, LABELS, 1, min_confidence=0.0)
    # …but NaN confidence never passes a min-confidence filter
    assert preds == []


def test_nan_logit_kept_without_min_confidence():
    logits = [1.0, float("nan"), 0.5]
    preds = top_k_predictions(logits, LABELS, 3)
    assert len(preds) == 3
    assert any(math.isnan(p.confidence) for p in preds)


def test_nan_sorts_first_matching_device_total_order():
    # total_cmp: NaN orders above +inf, so in the descending result NaN
    # comes FIRST — same element order as the device path (lax.top_k's
    # total order preserved by top_k_from_device).
    logits = [1.0, float("nan"), 0.5]
    preds = top_k_predictions(logits, LABELS, 3)
    assert math.isnan(preds[0].confidence)
    assert [p.index for p in preds[1:]] == [0, 2]


def test_infinities():
    logits = [float("-inf"), 0.0, float("inf")]
    preds = top_k_predictions(logits, LABELS, 3)
    assert preds[0].index == 2
    assert preds[0].confidence == 1.0
    assert preds[-1].index == 0
    assert preds[-1].confidence == 0.0


def test_all_equal_logits():
    preds = top_k_predictions([2.0] * 5, LABELS, 3)
    assert len(preds) == 3
    assert all(p.confidence == pytest.approx(sigmoid(2.0)) for p in preds)


def test_large_vector_matches_numpy_reference(rng):
    logits = rng.normal(size=6522).astype(np.float32)
    preds = top_k_predictions(logits, [f"s{i}" for i in range(6522)], 10)
    expected = np.argsort(logits)[::-1][:10]
    assert [p.index for p in preds] == expected.tolist()


def test_negative_logits_only():
    preds = top_k_predictions([-1.0, -3.0, -2.0], LABELS, 2)
    assert [p.index for p in preds] == [0, 2]
    assert all(0.0 < p.confidence < 0.5 for p in preds)
