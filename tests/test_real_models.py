"""Tier-3 env-gated tests against real model weights.

The reference gates real-model integration tests on fixture files and env
vars (reference: tests/integration_test.rs:18-49, :599-607; PERCH_V2_MODEL,
BIRDNET_META_MODEL). Same pattern here: set the env vars to the real ONNX
files to exercise the full import → detect → predict path on genuine
weights. Without them the tests skip.

  BIRDNET_V24_MODEL=/path/birdnet_v24.onnx  BIRDNET_V24_LABELS=/path/labels.txt
  BIRDNET_V30_MODEL=... BIRDNET_V30_LABELS=...
  PERCH_V2_MODEL=...    PERCH_V2_LABELS=...
  BIRDNET_META_MODEL=...
"""

import os

import numpy as np
import pytest

from birdnet_tpu import Classifier, ModelType, RangeFilter


def _env_pair(model_var, labels_var):
    model = os.environ.get(model_var)
    labels = os.environ.get(labels_var)
    if not model or not labels:
        pytest.skip(f"{model_var}/{labels_var} not set")
    return model, labels


def _sine(n, rate, freq=1000.0):
    t = np.arange(n, dtype=np.float32) / rate
    return (0.5 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_real_v24_predict():
    model, labels = _env_pair("BIRDNET_V24_MODEL", "BIRDNET_V24_LABELS")
    clf = Classifier.builder().model_path(model).labels_path(labels).top_k(5).build()
    assert clf.model_type is ModelType.BIRDNET_V24
    assert clf.num_species == 6522
    r = clf.predict(_sine(144_000, 48_000))
    assert len(r.predictions) <= 5
    confs = [p.confidence for p in r.predictions]
    assert confs == sorted(confs, reverse=True)
    assert all(0.0 <= c <= 1.0 for c in confs)


def test_real_v24_batch_and_stream_agree():
    model, labels = _env_pair("BIRDNET_V24_MODEL", "BIRDNET_V24_LABELS")
    clf = Classifier.builder().model_path(model).labels_path(labels).top_k(3).build()
    audio = _sine(48_000 * 9, 48_000)
    stream = clf.analyze_samples(audio)
    from birdnet_tpu.utils.audio_io import chunk_audio

    segs, _ = chunk_audio(audio, 144_000, 0.0, 48_000)
    batch = clf.predict_batch(segs)
    assert len(stream) == len(batch)
    for (_, preds), ref in zip(stream, batch):
        assert [p.index for p in preds] == [p.index for p in ref.predictions]


def test_real_v30_embeddings():
    model, labels = _env_pair("BIRDNET_V30_MODEL", "BIRDNET_V30_LABELS")
    clf = Classifier.builder().model_path(model).labels_path(labels).build()
    assert clf.model_type is ModelType.BIRDNET_V30
    r = clf.predict(_sine(160_000, 32_000))
    assert r.embeddings is not None
    assert r.embeddings.shape == (1024,)


def test_real_perch_v2():
    model, labels = _env_pair("PERCH_V2_MODEL", "PERCH_V2_LABELS")
    clf = Classifier.builder().model_path(model).labels_path(labels).build()
    assert clf.model_type is ModelType.PERCH_V2
    assert clf.num_species == 14_795
    r = clf.predict(_sine(160_000, 32_000))
    assert r.embeddings is not None
    assert len(r.raw_scores) == 14_795


def test_real_meta_model():
    model = os.environ.get("BIRDNET_META_MODEL")
    labels = os.environ.get("BIRDNET_V24_LABELS")
    if not model or not labels:
        pytest.skip("BIRDNET_META_MODEL/BIRDNET_V24_LABELS not set")
    rf = RangeFilter.builder().model_path(model).labels_path(labels).build()
    scores = rf.predict(42.5, -76.4, 6, 15)
    assert all(s.score >= 0.01 for s in scores)
    vals = [s.score for s in scores]
    assert vals == sorted(vals, reverse=True)
