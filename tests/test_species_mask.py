"""Species-list candidate masking: device-side -inf logits before top-K.

The reference has no species-list feature; the semantic implemented here is
the BirdNET-Analyzer custom-species-list convention — the list restricts
the *candidate set* (top-K slots go to listed species), not the printed
output. Covers the mask builder, the fused-top-K helper, every Classifier
path (predict / batch / context / streaming) and the mesh engine.
"""

import numpy as np
import pytest

from birdnet_tpu import Classifier
from birdnet_tpu.errors import InferenceError
from birdnet_tpu.labels import species_mask_from_names
from birdnet_tpu.testutil import mock_labels, sine_segment

LABELS = [f"Sci{i}_Common{i}" for i in range(10)]
ALLOWED = ["Sci2_Common2", "Sci5_Common5", "Sci7_Common7"]
ALLOWED_IDX = {2, 5, 7}


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path_factory.mktemp("smask") / "v24.onnx"
    birdnet_v24.save_tiny(p, num_species=10)
    return str(p)


@pytest.fixture(scope="module")
def unrestricted(model_path):
    return (
        Classifier.builder().model_path(model_path).labels(LABELS)
        .top_k(10).build()
    )


@pytest.fixture(scope="module")
def restricted(model_path):
    return (
        Classifier.builder().model_path(model_path).labels(LABELS)
        .top_k(3).species_list(ALLOWED).build()
    )


# -- mask construction -------------------------------------------------------

def test_mask_matches_full_label_or_either_half():
    labels = ["Poecile atricapillus_Black-capped Chickadee", "Sci_Common"]
    assert list(species_mask_from_names(
        labels, ["Poecile atricapillus_Black-capped Chickadee"])) == [True, False]
    assert list(species_mask_from_names(
        labels, ["Poecile atricapillus"])) == [True, False]
    assert list(species_mask_from_names(
        labels, ["Black-capped Chickadee"])) == [True, False]
    assert list(species_mask_from_names(labels, ["Common"])) == [False, True]
    assert not species_mask_from_names(labels, ["Nothing"]).any()
    assert not species_mask_from_names(labels, ["", "  "]).any()


def test_mask_label_without_underscore_matches_whole():
    assert list(species_mask_from_names(["noise"], ["noise"])) == [True]


# -- fused helper vs oracle ---------------------------------------------------

def test_fused_topk_mask_matches_masked_oracle():
    import jax.numpy as jnp

    from birdnet_tpu.ops.topk import fused_sigmoid_topk

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 10)).astype(np.float32)
    mask = np.zeros(10, bool)
    mask[list(ALLOWED_IDX)] = True
    conf, idx = fused_sigmoid_topk(jnp.asarray(logits), 3, jnp.asarray(mask))
    conf, idx = np.asarray(conf), np.asarray(idx)
    for r in range(4):
        order = sorted(ALLOWED_IDX, key=lambda i: -logits[r, i])
        assert list(idx[r]) == order
        np.testing.assert_allclose(
            conf[r], 1 / (1 + np.exp(-logits[r, order])), rtol=1e-6
        )


# -- Classifier paths ---------------------------------------------------------

def test_predict_restricted_to_allowed(restricted):
    result = restricted.predict(sine_segment())
    assert len(result.predictions) == 3
    assert {p.index for p in result.predictions} <= ALLOWED_IDX
    # raw logits stay unmasked (full-vector parity surface)
    assert np.isfinite(np.asarray(result.raw_scores)).all()


def test_predict_matches_unrestricted_order(unrestricted, restricted):
    """The restricted top-K must equal the allowed subset of the full
    ranking, in the same relative order with the same confidences."""
    seg = sine_segment()
    full = unrestricted.predict(seg).predictions  # top-10 of 10 = all
    expected = [p for p in full if p.index in ALLOWED_IDX]
    got = restricted.predict(seg).predictions
    assert [p.index for p in got] == [p.index for p in expected]
    np.testing.assert_allclose(
        [p.confidence for p in got],
        [p.confidence for p in expected],
        rtol=1e-5,
    )


def test_topk_larger_than_allowed_drops_stragglers(model_path):
    clf = (
        Classifier.builder().model_path(model_path).labels(LABELS)
        .top_k(8).species_list(ALLOWED).build()
    )
    preds = clf.predict(sine_segment()).predictions
    assert len(preds) == len(ALLOWED_IDX)
    assert {p.index for p in preds} == ALLOWED_IDX


def test_predict_batch_and_context_restricted(restricted):
    segs = [sine_segment(freq=f) for f in (500.0, 2000.0)]
    for r in restricted.predict_batch(segs):
        assert {p.index for p in r.predictions} <= ALLOWED_IDX
    ctx = restricted.create_batch_context(4)
    for r in restricted.predict_batch_with_context(ctx, segs):
        assert {p.index for p in r.predictions} <= ALLOWED_IDX


def test_streaming_restricted(restricted):
    samples = np.concatenate([sine_segment(), sine_segment(freq=3000.0)])
    for _, preds in restricted.analyze_samples(samples):
        assert preds and {p.index for p in preds} <= ALLOWED_IDX


def test_streaming_matches_predict(unrestricted, restricted):
    seg = sine_segment()
    (_, stream_preds), = restricted.analyze_samples(seg)
    direct = restricted.predict(seg).predictions
    assert [p.index for p in stream_preds] == [p.index for p in direct]


def test_mesh_engine_restricted(model_path):
    from birdnet_tpu.parallel import make_mesh

    clf = (
        Classifier.builder().model_path(model_path).labels(LABELS)
        .top_k(3).species_list(ALLOWED)
        .with_mesh(make_mesh(shape=(4, 2))).build()
    )
    r = clf.predict(sine_segment())
    assert {p.index for p in r.predictions} <= ALLOWED_IDX
    for _, preds in clf.analyze_samples(sine_segment()):
        assert {p.index for p in preds} <= ALLOWED_IDX


# -- validation ----------------------------------------------------------------

def test_no_match_raises(model_path):
    with pytest.raises(InferenceError, match="species list"):
        (
            Classifier.builder().model_path(model_path)
            .labels(mock_labels(10)).species_list(["Nonexistent bird"])
            .build()
        )


def test_species_mask_property(restricted, unrestricted):
    assert unrestricted.species_mask is None
    mask = restricted.species_mask
    assert mask.dtype == bool and mask.sum() == 3
    assert set(np.flatnonzero(mask)) == ALLOWED_IDX
