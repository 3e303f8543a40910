"""Multi-chip Classifier (with_mesh) on the virtual 8-device CPU mesh:
must match the single-device classifier exactly."""

import numpy as np
import pytest

from birdnet_tpu import Classifier
from birdnet_tpu.parallel import make_mesh
from birdnet_tpu.testutil import mock_labels, sine_segment


LABELS = mock_labels(10)


@pytest.fixture(scope="module")
def model_path(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path_factory.mktemp("shard") / "v24.onnx"
    birdnet_v24.save_tiny(p, num_species=10)
    return str(p)


@pytest.fixture(scope="module")
def single(model_path):
    return Classifier.builder().model_path(model_path).labels(LABELS).top_k(3).build()


@pytest.fixture(scope="module")
def sharded(model_path):
    mesh = make_mesh(shape=(4, 2))
    return (
        Classifier.builder()
        .model_path(model_path)
        .labels(LABELS)
        .top_k(3)
        .with_mesh(mesh)
        .build()
    )


def test_predict_matches(single, sharded):
    seg = sine_segment()
    a = single.predict(seg)
    b = sharded.predict(seg)
    assert [p.index for p in a.predictions] == [p.index for p in b.predictions]
    np.testing.assert_allclose(a.raw_scores, b.raw_scores, rtol=1e-4, atol=1e-5)


def test_predict_batch_matches(single, sharded):
    segs = [sine_segment(freq=f) for f in (400.0, 900.0, 1400.0, 2100.0, 2600.0)]
    a = single.predict_batch(segs)
    b = sharded.predict_batch(segs)
    assert len(a) == len(b)
    for ra, rb in zip(a, b):
        np.testing.assert_allclose(ra.raw_scores, rb.raw_scores, rtol=1e-4, atol=1e-5)


def test_batch_context_on_mesh(sharded):
    ctx = sharded.create_batch_context(8)
    segs = [sine_segment(freq=f) for f in (500.0, 1500.0, 2500.0)]
    results = sharded.predict_batch_with_context(ctx, segs)
    assert len(results) == 3
    plain = sharded.predict_batch(segs)
    for a, b in zip(results, plain):
        np.testing.assert_allclose(a.raw_scores, b.raw_scores, rtol=1e-3, atol=1e-4)


def test_streaming_on_mesh_matches(single, sharded):
    rng = np.random.default_rng(4)
    audio = (0.2 * rng.normal(size=144_000 * 5)).astype(np.float32)
    a = single.analyze_samples(audio)
    b = sharded.analyze_samples(audio)
    assert len(a) == len(b)
    for (t1, p1), (t2, p2) in zip(a, b):
        assert t1 == pytest.approx(t2)
        assert [p.index for p in p1] == [p.index for p in p2]


def test_streaming_iter_on_mesh(sharded):
    audio = np.zeros(144_000 * 3, dtype=np.float32)
    out = list(sharded.analyze_samples_iter(audio, chunk_segments=2))
    assert len(out) == 3


def test_embeddings_on_mesh(tmp_path):
    from birdnet_tpu.models import birdnet_v30

    p = tmp_path / "v30.onnx"
    birdnet_v30.save_tiny(p, num_species=10, embedding_dim=32)
    mesh = make_mesh(shape=(2, 4))
    clf = (
        Classifier.builder().model_path(p).labels(LABELS).with_mesh(mesh).build()
    )
    r = clf.predict(np.zeros(160_000, np.float32))
    assert r.embeddings.shape == (32,)
    emb, times = clf.embed_samples(np.zeros(160_000 * 2, np.float32))
    assert emb.shape == (2, 32)


def test_serving_tier_on_mesh(single, sharded):
    """The DynamicBatcher (serving scheduler) runs over a mesh classifier
    unchanged: the batch context compiles a sharded executable and results
    match the single-device batcher."""
    from birdnet_tpu.serve import DynamicBatcher

    rng = np.random.default_rng(11)
    segs = [
        (0.1 * rng.standard_normal(144_000)).astype(np.float32)
        for _ in range(6)
    ]
    with DynamicBatcher(single, max_batch=4, max_wait_ms=50) as b_single:
        want = [b_single.submit(s) for s in segs]
        want = [f.result(timeout=300) for f in want]
    with DynamicBatcher(sharded, max_batch=4, max_wait_ms=50) as b_mesh:
        got = [b_mesh.submit(s) for s in segs]
        got = [f.result(timeout=300) for f in got]
        assert b_mesh.metrics.snapshot()["batches_total"] <= 6
    for a, c in zip(want, got):
        assert [p.index for p in a.predictions] == [
            p.index for p in c.predictions
        ]


def test_perch_real_head_width_on_mesh(tmp_path):
    """Perch v2 with the REAL 14,795-class head through the production
    classifier mesh path: the head TP-shards via species padding
    (14,795 % 4 != 0 → padded to 14,796) and predictions match the
    single-device classifier exactly (reference: src/classifier.rs:929-934,
    detection.rs:217-231)."""
    from birdnet_tpu.models import perch_v2
    from birdnet_tpu.onnx import proto as P

    p = tmp_path / "perch_real_head.onnx"
    model = perch_v2.build_model(
        width=0.1, depth=1, num_species=14795, embedding_dim=40
    )
    p.write_bytes(P.encode_model(model))
    labels = [f"sp_{i}" for i in range(14795)]

    single = (
        Classifier.builder().model_path(p).labels(labels).top_k(5).build()
    )
    sharded = (
        Classifier.builder().model_path(p).labels(labels).top_k(5)
        .with_mesh(make_mesh(shape=(2, 4))).build()
    )
    from birdnet_tpu.types import ModelType

    seg = sine_segment(model_type=ModelType.PERCH_V2)
    a = single.predict(seg)
    b = sharded.predict(seg)
    assert [x.index for x in a.predictions] == [x.index for x in b.predictions]
    np.testing.assert_allclose(
        a.raw_scores, b.raw_scores, rtol=1e-4, atol=1e-5
    )
    assert len(b.raw_scores) == 14795
    assert b.embeddings.shape == (40,)
    np.testing.assert_allclose(
        a.embeddings, b.embeddings, rtol=1e-4, atol=1e-5
    )
