"""Classifier integration tests on generated tiny models.

Mirrors the reference's Tier-3 integration coverage
(tests/integration_test.rs) but runs without downloaded weights: the model
generators produce correctly-shaped random-weight ONNX files — the fake
backend the reference explicitly deferred
(docs/test-coverage-implementation-summary.md:205-220).
"""

import threading

import numpy as np
import pytest

import birdnet_tpu.errors as E
from birdnet_tpu import (
    CancellationToken,
    Classifier,
    InferenceOptions,
    ModelType,
)


@pytest.fixture(scope="session")
def v24_model(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path_factory.mktemp("models") / "v24_tiny.onnx"
    birdnet_v24.save_tiny(p, num_species=10)
    return str(p)


@pytest.fixture(scope="session")
def v30_model(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v30

    p = tmp_path_factory.mktemp("models") / "v30_tiny.onnx"
    birdnet_v30.save_tiny(p, num_species=10, embedding_dim=32)
    return str(p)


@pytest.fixture(scope="session")
def perch_model(tmp_path_factory):
    from birdnet_tpu.models import perch_v2

    p = tmp_path_factory.mktemp("models") / "perch_tiny.onnx"
    perch_v2.save_tiny(p, num_species=12, embedding_dim=48)
    return str(p)


LABELS10 = [f"species_{i}" for i in range(10)]


@pytest.fixture(scope="session")
def v24_classifier(v24_model):
    return (
        Classifier.builder()
        .model_path(v24_model)
        .labels(LABELS10)
        .top_k(3)
        .build()
    )


def _tol(clf):
    """fp tolerances: tight on fp32 (CPU tests), loose under bf16-operand
    policies on real TPU hardware (BIRDNET_TEST_TPU=1)."""
    if clf._engine.precision == "fp32":
        return dict(rtol=1e-3, atol=1e-4)
    return dict(rtol=5e-2, atol=5e-3)


def sine_segment(n=144_000, freq=1000.0, rate=48_000.0):
    t = np.arange(n, dtype=np.float32) / rate
    return np.sin(2 * np.pi * freq * t).astype(np.float32)


# --- build / detection -----------------------------------------------------


def test_build_detects_v24(v24_classifier):
    assert v24_classifier.model_type is ModelType.BIRDNET_V24
    assert v24_classifier.config.sample_count == 144_000
    assert v24_classifier.num_species == 10


def test_builder_requires_model_path():
    with pytest.raises(E.ModelPathRequiredError):
        Classifier.builder().labels(LABELS10).build()


def test_builder_requires_labels(v24_model):
    with pytest.raises(E.LabelsRequiredError):
        Classifier.builder().model_path(v24_model).build()


def test_builder_label_count_mismatch(v24_model):
    with pytest.raises(E.LabelCountError) as ei:
        Classifier.builder().model_path(v24_model).labels(["a", "b"]).build()
    assert ei.value.expected == 10
    assert ei.value.got == 2


def test_builder_bad_model_file(tmp_path):
    p = tmp_path / "junk.onnx"
    p.write_bytes(b"not a model")
    with pytest.raises(E.BirdnetError):
        Classifier.builder().model_path(p).labels(LABELS10).build()


def test_builder_missing_model_file():
    with pytest.raises(E.ModelLoadError):
        Classifier.builder().model_path("/nonexistent.onnx").labels(LABELS10).build()


def test_builder_labels_path(v24_model, tmp_path):
    lp = tmp_path / "labels.txt"
    lp.write_text("\n".join(LABELS10), encoding="utf-8")
    clf = Classifier.builder().model_path(v24_model).labels_path(lp).build()
    assert clf.labels == LABELS10


def test_builder_override_validation(v24_model):
    with pytest.raises(E.ModelDetectionError):
        (
            Classifier.builder()
            .model_path(v24_model)
            .labels(LABELS10)
            .model_type(ModelType.BIRDNET_V30)
            .build()
        )


# --- predict invariants (integration_test.rs:97-122 analog) ----------------


def test_predict_invariants(v24_classifier):
    r = v24_classifier.predict(sine_segment())
    assert r.model_type is ModelType.BIRDNET_V24
    assert len(r.predictions) <= 3
    confs = [p.confidence for p in r.predictions]
    assert confs == sorted(confs, reverse=True)
    assert all(0.0 <= c <= 1.0 for c in confs)
    assert all(p.species in LABELS10 for p in r.predictions)
    assert r.embeddings is None
    assert len(r.raw_scores) == 10
    # top-1 confidence equals sigmoid of max raw logit
    expected = 1.0 / (1.0 + np.exp(-np.max(r.raw_scores)))
    assert r.predictions[0].confidence == pytest.approx(float(expected), rel=1e-5)


def test_predict_deterministic(v24_classifier):
    seg = sine_segment()
    r1 = v24_classifier.predict(seg)
    r2 = v24_classifier.predict(seg)
    np.testing.assert_array_equal(r1.raw_scores, r2.raw_scores)


def test_predict_wrong_size(v24_classifier):
    with pytest.raises(E.InputSizeError) as ei:
        v24_classifier.predict(np.zeros(1000, dtype=np.float32))
    assert ei.value.expected == 144_000
    assert ei.value.got == 1000


def test_predict_min_confidence(v24_model):
    clf = (
        Classifier.builder()
        .model_path(v24_model)
        .labels(LABELS10)
        .top_k(10)
        .min_confidence(0.99)
        .build()
    )
    r = clf.predict(sine_segment())
    # random weights → logits near 0 → confidences near 0.5 < 0.99
    assert r.predictions == []


# --- batch ------------------------------------------------------------------


def test_predict_batch(v24_classifier):
    segs = [sine_segment(freq=f) for f in (500.0, 1000.0, 2000.0)]
    results = v24_classifier.predict_batch(segs)
    assert len(results) == 3
    for r in results:
        assert len(r.predictions) <= 3
        assert len(r.raw_scores) == 10


def test_predict_batch_empty(v24_classifier):
    assert v24_classifier.predict_batch([]) == []


def test_predict_batch_wrong_size(v24_classifier):
    segs = [sine_segment(), np.zeros(5, dtype=np.float32)]
    with pytest.raises(E.BatchInputSizeError) as ei:
        v24_classifier.predict_batch(segs)
    assert ei.value.index == 1


def test_streaming_timeout_scale_covers_bucketed_dispatch(v24_classifier):
    """The timeout budget must cover the tile bucket the engine actually
    dispatches (5 needed tiles -> 6-tile superchunk), not the raw need —
    otherwise healthy runs on bucket-rounded recordings time out."""
    from birdnet_tpu.compiler.stream import MONITORED_MAX_TILES, _bucket_tiles

    clf = v24_classifier
    tile = clf._streaming_engine().tile
    assert _bucket_tiles(5) > 5  # precondition: 5 is not a bucket size
    assert clf.streaming_timeout_scale(tile, 5 * tile) == _bucket_tiles(5)
    # Huge recordings cap at the monitored superchunk bound.
    assert (
        clf.streaming_timeout_scale(tile, 1000 * tile) == MONITORED_MAX_TILES
    )


def test_predict_batch_matches_single(v24_classifier):
    seg = sine_segment()
    single = v24_classifier.predict(seg)
    batch = v24_classifier.predict_batch([seg, seg])
    for r in batch:
        np.testing.assert_allclose(
            r.raw_scores, single.raw_scores, **_tol(v24_classifier)
        )


# --- batch context ----------------------------------------------------------


def test_batch_context_roundtrip(v24_classifier):
    ctx = v24_classifier.create_batch_context(4)
    assert ctx.max_batch_size == 4
    assert ctx.input_buffer_bytes() == 4 * 144_000 * 4
    segs = [sine_segment(freq=f) for f in (500.0, 1500.0)]
    results = v24_classifier.predict_batch_with_context(ctx, segs)
    assert len(results) == 2
    # re-use: results consistent with plain batch path
    plain = v24_classifier.predict_batch(segs)
    for a, b in zip(results, plain):
        np.testing.assert_allclose(a.raw_scores, b.raw_scores, **_tol(v24_classifier))
    # repeated use with different sizes, no error
    assert len(v24_classifier.predict_batch_with_context(ctx, segs[:1])) == 1
    assert len(v24_classifier.predict_batch_with_context(ctx, segs * 2)) == 4


def test_batch_context_precompile_row_mask(v24_classifier):
    """precompile_row_mask=True must warm the species-mask executable so
    serving's first masked request doesn't compile inside the worker."""
    ctx = v24_classifier.create_batch_context(2, precompile_row_mask=True)
    eng = v24_classifier._engine
    assert any(key[3] for key in eng._compiled), "row-mask variant compiled"
    segs = [sine_segment(freq=500.0)]
    masks = np.ones((1, 10), bool)
    res = v24_classifier.predict_batch_with_context(ctx, segs, species_masks=masks)
    assert len(res) == 1


def test_batch_context_zero_allocation(v24_classifier):
    """prepare_input hands out the pre-allocated staging buffers themselves,
    alternating between exactly two identities — no per-call host allocation
    (reference: batch_context.rs:122, IoBinding exists to avoid per-call
    allocation)."""
    ctx = v24_classifier.create_batch_context(2)
    seg = sine_segment()
    idents = set()
    for _ in range(6):
        buf, b = ctx.prepare_input([seg])
        assert b == 1
        idents.add(id(buf))
    assert len(idents) == 2
    # successive real calls stay correct despite buffer reuse
    r1 = v24_classifier.predict_batch_with_context(ctx, [sine_segment(freq=500.0)])
    r2 = v24_classifier.predict_batch_with_context(ctx, [sine_segment(freq=1500.0)])
    p1 = v24_classifier.predict(sine_segment(freq=500.0))
    p2 = v24_classifier.predict(sine_segment(freq=1500.0))
    np.testing.assert_allclose(r1[0].raw_scores, p1.raw_scores, **_tol(v24_classifier))
    np.testing.assert_allclose(r2[0].raw_scores, p2.raw_scores, **_tol(v24_classifier))


def test_batch_context_exceeds_max(v24_classifier):
    ctx = v24_classifier.create_batch_context(2)
    segs = [sine_segment()] * 3
    with pytest.raises(E.InferenceError) as ei:
        v24_classifier.predict_batch_with_context(ctx, segs)
    assert "batch size 3 exceeds context max 2" in str(ei.value)


def test_batch_context_segment_size_error(v24_classifier):
    ctx = v24_classifier.create_batch_context(2)
    with pytest.raises(E.BatchInputSizeError) as ei:
        v24_classifier.predict_batch_with_context(
            ctx, [sine_segment(), np.zeros(3, np.float32)]
        )
    assert ei.value.index == 1


def test_batch_context_rejects_perch(perch_model):
    clf = (
        Classifier.builder()
        .model_path(perch_model)
        .labels([f"s{i}" for i in range(12)])
        .build()
    )
    with pytest.raises(E.InferenceError) as ei:
        clf.create_batch_context(4)
    assert "PerchV2" in str(ei.value)


# --- v3.0 / Perch demux ------------------------------------------------------


def test_v30_embeddings(v30_model):
    clf = (
        Classifier.builder().model_path(v30_model).labels(LABELS10).top_k(5).build()
    )
    assert clf.model_type is ModelType.BIRDNET_V30
    assert clf.config.embedding_dim == 32
    r = clf.predict(np.zeros(160_000, dtype=np.float32))
    assert r.embeddings is not None
    assert r.embeddings.shape == (32,)
    assert len(r.raw_scores) == 10
    # batch path carries per-item embeddings
    rs = clf.predict_batch([np.zeros(160_000, dtype=np.float32)] * 2)
    assert all(x.embeddings.shape == (32,) for x in rs)


def test_perch_demux(perch_model):
    labels = [f"s{i}" for i in range(12)]
    clf = Classifier.builder().model_path(perch_model).labels(labels).build()
    assert clf.model_type is ModelType.PERCH_V2
    assert clf.config.embedding_dim == 48
    r = clf.predict(np.zeros(160_000, dtype=np.float32))
    # logits from output index 3, embeddings from output 0
    assert len(r.raw_scores) == 12
    assert r.embeddings.shape == (48,)


# --- concurrency (integration_test.rs:488-529 analog) ------------------------


def test_concurrent_predict(v24_classifier):
    seg = sine_segment()
    expected = v24_classifier.predict(seg).raw_scores
    errors = []

    def worker():
        try:
            for _ in range(5):
                r = v24_classifier.predict(seg)
                np.testing.assert_array_equal(r.raw_scores, expected)
        except Exception as e:  # noqa: BLE001
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert errors == []


# --- timeout / cancellation ---------------------------------------------------


def test_pre_cancelled_token(v24_classifier):
    tok = CancellationToken()
    tok.cancel()
    with pytest.raises(E.InferenceCancelledError):
        v24_classifier.predict(
            sine_segment(), InferenceOptions(cancellation_token=tok)
        )


def test_generous_timeout_passes(v24_classifier):
    r = v24_classifier.predict(sine_segment(), InferenceOptions(timeout=60.0))
    assert len(r.predictions) <= 3


def test_token_not_cancelled_passes(v24_classifier):
    tok = CancellationToken()
    r = v24_classifier.predict(
        sine_segment(), InferenceOptions(cancellation_token=tok)
    )
    assert len(r.predictions) <= 3
    assert not tok.is_cancelled()


# --- builder state / device precedence (classifier.rs:1079-1474 analog) -----


def test_builder_first_non_cpu_wins():
    from birdnet_tpu.classifier import ClassifierBuilder

    b = ClassifierBuilder().with_cpu().with_tpu()
    assert b._requested_device == "tpu"  # accelerator overrides earlier cpu
    b2 = ClassifierBuilder().with_tpu().with_cpu()
    assert b2._requested_device == "tpu"  # cpu never downgrades
    b3 = ClassifierBuilder().with_device("gpu").with_device("tpu")
    assert b3._requested_device == "gpu"  # first non-cpu wins


def test_builder_chaining_state():
    from birdnet_tpu.classifier import ClassifierBuilder
    from birdnet_tpu.types import ModelType

    b = (
        ClassifierBuilder()
        .model_path("m.onnx")
        .labels(["a"])
        .top_k(7)
        .min_confidence(0.25)
        .model_type(ModelType.PERCH_V2)
        .precision("fast")
    )
    assert b._model_path == "m.onnx"
    assert b._top_k == 7
    assert b._min_confidence == 0.25
    assert b._model_type is ModelType.PERCH_V2
    assert b._precision == "fast"


def test_classifier_properties(v24_classifier):
    assert v24_classifier.top_k_value == 3
    assert v24_classifier.min_confidence_value is None
    assert v24_classifier.labels == LABELS10
    assert v24_classifier.num_species == 10


def test_inference_options_chaining(v24_classifier):
    from birdnet_tpu import InferenceOptions, CancellationToken

    tok = CancellationToken()
    opts = InferenceOptions.with_timeout(30.0).with_cancellation_token(tok)
    assert opts.timeout == 30.0
    assert opts.cancellation_token is tok
    assert opts.needs_monitor()
    r = v24_classifier.predict(sine_segment(), opts)
    assert len(r.predictions) <= 3


def test_perch_canonical_species_count_with_reference_labels(tmp_path):
    """Full canonical Perch v2 head (14,795 classes) + the real label CSV
    shipped with the reference: detection, label-count validation, and a
    predict round trip at the true output width."""
    import os

    perch_csv = "/root/reference/data/labels/perch_v2/labels.csv"
    if not os.path.exists(perch_csv):
        pytest.skip("reference label data not mounted")
    from birdnet_tpu.models import perch_v2

    p = tmp_path / "perch_canonical.onnx"
    # thin trunk, true head width
    perch_v2.save(p, width=0.05, depth=1, num_species=14_795, embedding_dim=64)
    clf = (
        Classifier.builder()
        .model_path(p)
        .labels_path(perch_csv)
        .top_k(5)
        .build()
    )
    assert clf.model_type is ModelType.PERCH_V2
    assert clf.num_species == 14_795
    seg = np.zeros(clf.config.sample_count, np.float32)
    res = clf.predict(seg)
    assert len(res.predictions) == 5
    assert res.raw_scores.shape == (14_795,)
    # species names come from the CSV's first column
    assert all(r.species for r in res.predictions)
    assert res.embeddings is not None and res.embeddings.shape == (64,)


def test_builder_rejects_unknown_precision():
    import pytest as _pytest

    from birdnet_tpu import Classifier

    with _pytest.raises(ValueError, match="precision"):
        Classifier.builder().precision("fastest")
