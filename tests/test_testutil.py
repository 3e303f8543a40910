"""Tests for the public test-utility module (reference: src/testutil.rs)."""

import numpy as np

from birdnet_tpu.postprocess import top_k_predictions
from birdnet_tpu.testutil import (
    mock_config,
    mock_embeddings,
    mock_labels,
    mock_logits_with_top_k,
    mock_prediction_result,
    random_logits,
    silent_segment,
    sine_segment,
)
from birdnet_tpu.types import ModelType


def test_mock_config_constants():
    cfg = mock_config(ModelType.BIRDNET_V30, num_species=42)
    assert cfg.sample_rate == 32_000
    assert cfg.sample_count == 160_000
    assert cfg.num_species == 42
    assert cfg.embedding_dim == 1024
    assert mock_config(ModelType.BIRDNET_V24).embedding_dim is None


def test_segments():
    s = silent_segment(ModelType.PERCH_V2)
    assert s.shape == (160_000,)
    assert s.sum() == 0.0
    w = sine_segment(ModelType.BIRDNET_V24, freq=440.0)
    assert w.shape == (144_000,)
    assert abs(float(w.max()) - 0.5) < 1e-3


def test_mock_labels():
    assert mock_labels(3) == ["species_0", "species_1", "species_2"]


def test_mock_prediction_result():
    r = mock_prediction_result()
    assert r.predictions[0].confidence == 0.9
    assert r.model_type is ModelType.BIRDNET_V24


def test_random_logits_deterministic():
    a = random_logits(100)
    b = random_logits(100)
    np.testing.assert_array_equal(a, b)
    assert a.min() >= -5.0 and a.max() < 5.0
    assert not np.array_equal(a, random_logits(100, seed=99))


def test_mock_logits_with_top_k_roundtrip():
    logits = mock_logits_with_top_k(50, [7, 3, 20])
    preds = top_k_predictions(logits, mock_labels(50), 3)
    assert [p.index for p in preds] == [7, 3, 20]


def test_mock_embeddings():
    e = mock_embeddings(64)
    assert e.shape == (64,)
    np.testing.assert_array_equal(e, mock_embeddings(64))


def test_random_logits_no_overflow_warnings():
    import warnings

    from birdnet_tpu.testutil import random_logits

    with warnings.catch_warnings():
        warnings.simplefilter("error")  # downstream suites use -W error
        v = random_logits(100)
    assert v.shape == (100,)
    assert np.isfinite(v).all()


def test_mock_logits_top_k_contract_beyond_20():
    from birdnet_tpu.testutil import mock_logits_with_top_k

    idx = list(range(25))
    logits = mock_logits_with_top_k(100, idx)
    order = np.argsort(logits)[::-1][:25]
    assert list(order) == idx  # strictly-descending winners, all 25
