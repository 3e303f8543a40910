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
        # rtol 1e-5: TPU's lax.logistic differs from the numpy oracle by
        # up to ~1.6e-6 relative (measured on v5e); order is exact.
        np.testing.assert_allclose(
            conf[r], 1 / (1 + np.exp(-logits[r, order])), rtol=1e-5
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
    import jax

    from birdnet_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs an 8-device mesh (virtual CPU mesh or real pod)")

    clf = (
        Classifier.builder().model_path(model_path).labels(LABELS)
        .top_k(3).species_list(ALLOWED)
        .with_mesh(make_mesh(shape=(4, 2))).build()
    )
    r = clf.predict(sine_segment())
    assert {p.index for p in r.predictions} <= ALLOWED_IDX
    for _, preds in clf.analyze_samples(sine_segment()):
        assert {p.index for p in preds} <= ALLOWED_IDX
    # runtime per-row mask composes with the builder mask on the mesh too
    m = np.zeros(10, bool); m[[5, 9]] = True
    preds = clf.predict(sine_segment(), species_mask=m).predictions
    assert {p.index for p in preds} == {5}


# -- per-request (runtime) masks ----------------------------------------------

def test_predict_batch_per_row_masks(unrestricted):
    """Each row's top-K selects only its own allowed species — different
    masks coexist in one compiled batch."""
    seg = sine_segment()
    full = unrestricted.predict(seg).predictions  # top-10 = full ranking
    m_a = np.zeros(10, bool); m_a[[1, 3, 8]] = True
    m_b = np.zeros(10, bool); m_b[[0, 2]] = True
    results = unrestricted.predict_batch(
        [seg, seg], species_masks=np.stack([m_a, m_b])
    )
    expect_a = [p.index for p in full if m_a[p.index]]
    expect_b = [p.index for p in full if m_b[p.index]]
    assert [p.index for p in results[0].predictions] == expect_a
    assert [p.index for p in results[1].predictions] == expect_b


def test_predict_single_species_mask(unrestricted):
    m = np.zeros(10, bool); m[[4, 6]] = True
    preds = unrestricted.predict(sine_segment(), species_mask=m).predictions
    assert {p.index for p in preds} == {4, 6}


def test_context_path_per_row_masks(unrestricted):
    ctx = unrestricted.create_batch_context(4)
    seg = sine_segment()
    m = np.zeros((2, 10), bool)
    m[0, [5]] = True
    m[1, [2, 9]] = True
    out = unrestricted.predict_batch_with_context(
        ctx, [seg, seg], species_masks=m
    )
    assert {p.index for p in out[0].predictions} == {5}
    assert {p.index for p in out[1].predictions} == {2, 9}


def test_row_mask_composes_with_builder_mask(restricted):
    """Runtime mask ANDs with the build-time species_list mask."""
    m = np.zeros(10, bool); m[[5, 9]] = True  # 9 not in builder list
    preds = restricted.predict(sine_segment(), species_mask=m).predictions
    assert {p.index for p in preds} == {5}


def test_row_mask_shape_validated(unrestricted):
    from birdnet_tpu.errors import InputSizeError

    with pytest.raises(InputSizeError):
        unrestricted.predict_batch(
            [sine_segment()], species_masks=np.ones((1, 7), bool)
        )


def test_batcher_mixed_masks_coalesce(unrestricted):
    from birdnet_tpu.serve import DynamicBatcher

    m_a = np.zeros(10, bool); m_a[[1, 3]] = True
    m_b = np.zeros(10, bool); m_b[[0]] = True
    seg = sine_segment()
    full = unrestricted.predict(seg).predictions
    with DynamicBatcher(unrestricted, max_batch=8, max_wait_ms=50.0) as b:
        futs = [
            b.submit(seg, species_mask=m_a),
            b.submit(seg, species_mask=m_b),
            b.submit(seg),  # unmasked rides along
        ]
        r_a, r_b, r_free = (f.result(timeout=120) for f in futs)
    assert [p.index for p in r_a.predictions] == [
        p.index for p in full if m_a[p.index]
    ]
    assert [p.index for p in r_b.predictions] == [
        p.index for p in full if m_b[p.index]
    ]
    assert [p.index for p in r_free.predictions] == [p.index for p in full]


def test_analyze_per_call_mask(unrestricted):
    """One runtime species list for a whole streaming analyze call."""
    seg = sine_segment()
    full = unrestricted.predict(seg).predictions
    m = np.zeros(10, bool); m[[0, 4, 7]] = True
    samples = np.concatenate([seg, seg])
    for _, preds in unrestricted.analyze_samples(samples, species_mask=m):
        assert [p.index for p in preds] == [
            p.index for p in full if m[p.index]
        ]
    # iter variant takes the same kwarg
    got = list(unrestricted.analyze_samples_iter(samples, species_mask=m))
    assert all({p.index for p in preds} <= {0, 4, 7} for _, preds in got)
    # composes with the build-time list on the restricted classifier


def test_analyze_mask_composes_with_builder(restricted):
    m = np.zeros(10, bool); m[[5, 9]] = True  # 9 not in builder list
    for _, preds in restricted.analyze_samples(sine_segment(), species_mask=m):
        assert {p.index for p in preds} == {5}


# -- validation ----------------------------------------------------------------

def test_batch_1d_mask_gets_actionable_error(unrestricted):
    # Passing predict()'s [N] mask shape to predict_batch must explain the
    # [B, N] requirement, not emit "expected 10 samples, got 10".
    from birdnet_tpu.errors import InferenceError

    m = np.ones(10, bool)
    with pytest.raises(InferenceError, match="2-D"):
        unrestricted.predict_batch([sine_segment()], species_masks=m)


def test_no_match_raises(model_path):
    from birdnet_tpu.errors import SpeciesListError

    with pytest.raises(SpeciesListError, match="species list"):
        (
            Classifier.builder().model_path(model_path)
            .labels(mock_labels(10)).species_list(["Nonexistent bird"])
            .build()
        )
    assert issubclass(SpeciesListError, InferenceError)  # catch-compat


def test_allowed_species(restricted, unrestricted):
    assert unrestricted.allowed_species() is None
    assert restricted.allowed_species() == ALLOWED


def test_species_mask_property(restricted, unrestricted):
    assert unrestricted.species_mask is None
    mask = restricted.species_mask
    assert mask.dtype == bool and mask.sum() == 3
    assert set(np.flatnonzero(mask)) == ALLOWED_IDX


def test_mesh_engine_masks_on_padded_head(tmp_path):
    """Species masks through the mesh path at a num_species that does NOT
    divide the model axis (10 over a 4-way axis → head padded to 12):
    build-time and per-call masks must extend over the pad positions
    (engine._pad_row_mask / _selection_mask) and never surface pad
    indices."""
    import jax

    from birdnet_tpu.models import birdnet_v24
    from birdnet_tpu.parallel import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs an 8-device mesh")
    p = tmp_path / "v24_pad.onnx"
    birdnet_v24.save_tiny(p, num_species=10)
    mesh = make_mesh(shape=(2, 4))  # model axis 4; 10 % 4 != 0
    clf = (
        Classifier.builder().model_path(p).labels(LABELS)
        .top_k(4).species_list(ALLOWED)
        .with_mesh(mesh).build()
    )
    assert clf._engine._n_padded == 12
    r = clf.predict(sine_segment())
    assert {x.index for x in r.predictions} <= ALLOWED_IDX
    assert all(x.index < 10 for x in r.predictions)
    assert len(r.raw_scores) == 10  # padded logits sliced back

    # per-call runtime mask composes on the padded head too
    m = np.zeros(10, bool)
    m[[5, 9]] = True
    preds = clf.predict(sine_segment(), species_mask=m).predictions
    assert {x.index for x in preds} == {5}

    # streaming path with a runtime mask (covers the stream _pad_row_mask)
    for _, preds in clf.analyze_samples(sine_segment(), species_mask=m):
        assert {x.index for x in preds} == {5}
