"""Streaming whole-recording path tests: must match the batch oracle."""

import numpy as np
import pytest

import birdnet_tpu.errors as E
from birdnet_tpu import Classifier


LABELS = [f"species_{i}" for i in range(10)]


@pytest.fixture(scope="module")
def clf(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path_factory.mktemp("models") / "v24_tiny.onnx"
    birdnet_v24.save_tiny(p, num_species=10)
    return (
        Classifier.builder().model_path(p).labels(LABELS).top_k(3).build()
    )


def _audio(seconds, seed=0):
    rng = np.random.default_rng(seed)
    n = int(48_000 * seconds)
    return (0.3 * np.sin(2 * np.pi * 800 * np.arange(n) / 48_000)
            + 0.05 * rng.normal(size=n)).astype(np.float32)


def _oracle(clf, samples, overlap):
    from birdnet_tpu.utils.audio_io import chunk_audio

    segs, times = chunk_audio(samples, clf.config.sample_count, overlap, 48_000)
    results = clf.predict_batch(segs)
    return times, results


@pytest.mark.parametrize("seconds,overlap", [(9.0, 0.0), (7.5, 0.0), (10.0, 1.5)])
def test_stream_matches_batch_oracle(clf, seconds, overlap):
    samples = _audio(seconds)
    stream = clf.analyze_samples(samples, overlap_seconds=overlap)
    times, oracle = _oracle(clf, samples, overlap)
    assert len(stream) == len(oracle)
    for (t, preds), t_ref, ref in zip(stream, times, oracle):
        assert t == pytest.approx(t_ref)
        assert [p.index for p in preds] == [p.index for p in ref.predictions]
        for a, b in zip(preds, ref.predictions):
            assert a.confidence == pytest.approx(b.confidence, rel=1e-3, abs=1e-4)
            assert a.species == b.species


def test_stream_int16_input(clf):
    samples = _audio(6.0)
    i16 = (np.clip(samples, -1, 1 - 1 / 32768) * 32768).astype(np.int16)
    stream_i16 = clf.analyze_samples(i16)
    stream_f32 = clf.analyze_samples(i16.astype(np.float32) / 32768.0)
    assert len(stream_i16) == len(stream_f32)
    for (t1, p1), (t2, p2) in zip(stream_i16, stream_f32):
        assert [p.index for p in p1] == [p.index for p in p2]
        for a, b in zip(p1, p2):
            assert a.confidence == pytest.approx(b.confidence, rel=1e-4)


def test_stream_multiple_superchunks(clf, monkeypatch):
    """Recording longer than one superchunk splits + reassembles correctly."""
    import birdnet_tpu.compiler.stream as stream_mod

    eng = clf._streaming_engine()
    # Shrink the superchunk so a short file spans several dispatches.
    monkeypatch.setattr(stream_mod, "MAX_TILES", 2)
    monkeypatch.setattr(stream_mod, "_TILE_BUCKETS", (1, 2))
    samples = _audio(40.0)  # 14 segments → 4 chunks of ≤4 (tile=32… tile)
    eng.tile = 2  # 2 segments per tile → chunks of 4 segments
    eng._compiled.clear()
    stream = clf.analyze_samples(samples)
    times, oracle = _oracle(clf, samples, 0.0)
    assert len(stream) == len(oracle)
    for (t, preds), ref in zip(stream, oracle):
        assert [p.index for p in preds] == [p.index for p in ref.predictions]


def test_unmonitored_dispatch_bounds_in_flight(clf, monkeypatch):
    """Even without a cancel/timeout monitor, the dispatch loop waits on the
    second-oldest superchunk before dispatching the next — bounding device
    memory at two in-flight chunk buffers (a 50 h+ single-call analyze would
    otherwise queue input buffers until HBM ran out)."""
    import birdnet_tpu.compiler.stream as stream_mod

    eng = clf._streaming_engine()
    monkeypatch.setattr(stream_mod, "MAX_TILES", 2)
    monkeypatch.setattr(stream_mod, "_TILE_BUCKETS", (1, 2))
    eng.tile = 2
    eng._compiled.clear()
    dispatch_waits = []
    real_wait = stream_mod._wait

    def spy(arrays, options):
        dispatch_waits.append(options)
        return real_wait(arrays, options)

    monkeypatch.setattr(stream_mod, "_wait", spy)
    samples = _audio(40.0)  # 14 segments → 4 chunks of 4
    stream = clf.analyze_samples(samples)  # no options → unmonitored
    assert len(stream) == 14
    # 3 dispatch-time waits (chunks 2-4 each wait on the second-oldest,
    # which is then drained to host — no re-wait at collection) + 1
    # collection wait for the final chunk.
    assert len(dispatch_waits) == 4
    eng._compiled.clear()


def test_stream_empty(clf):
    assert clf.analyze_samples(np.zeros(0, np.float32)) == []


def test_stream_overlap_too_large(clf):
    with pytest.raises(E.InferenceError):
        clf.analyze_samples(_audio(5.0), overlap_seconds=3.0)


def test_stream_min_confidence(tmp_path):
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path / "m.onnx"
    birdnet_v24.save_tiny(p, num_species=10)
    clf = (
        Classifier.builder()
        .model_path(p)
        .labels(LABELS)
        .min_confidence(0.999)
        .build()
    )
    out = clf.analyze_samples(_audio(6.0))
    assert all(preds == [] for _, preds in out)


def test_embed_samples_v30(tmp_path):
    from birdnet_tpu.models import birdnet_v30

    p = tmp_path / "v30.onnx"
    birdnet_v30.save_tiny(p, num_species=10, embedding_dim=32)
    clf = Classifier.builder().model_path(p).labels(LABELS).build()
    audio = np.zeros(160_000 * 3, dtype=np.float32)
    emb, times = clf.embed_samples(audio)
    assert emb.shape == (3, 32)
    assert list(times) == [0.0, 5.0, 10.0]
    # matches the per-segment path (tolerance loosened for bf16 policies)
    ref = clf.predict(audio[:160_000]).embeddings
    if clf._engine.precision == "fp32":
        np.testing.assert_allclose(emb[0], ref, rtol=1e-4, atol=1e-5)
    else:
        np.testing.assert_allclose(emb[0], ref, rtol=5e-2, atol=5e-3)


def test_embed_samples_multichunk_drain(tmp_path, monkeypatch):
    """Embeddings across MULTIPLE superchunks: the dispatch loop drains
    each waited chunk's outputs (incl. [tiles, E] embeddings) to host —
    the concatenated result must match the single-chunk answer."""
    import birdnet_tpu.compiler.stream as stream_mod
    from birdnet_tpu.models import birdnet_v30

    p = tmp_path / "v30.onnx"
    birdnet_v30.save_tiny(p, num_species=10, embedding_dim=16)
    clf = Classifier.builder().model_path(p).labels(LABELS).build()
    audio = np.linspace(-0.4, 0.4, 160_000 * 6, dtype=np.float32)
    ref_emb, ref_times = clf.embed_samples(audio)  # one chunk

    eng = clf._streaming_engine()
    monkeypatch.setattr(stream_mod, "MAX_TILES", 2)
    monkeypatch.setattr(stream_mod, "_TILE_BUCKETS", (1, 2))
    eng.tile = 2
    eng._compiled.clear()
    emb, times = clf.embed_samples(audio)  # 3 chunks of 2 segments
    eng._compiled.clear()
    assert emb.shape == ref_emb.shape == (6, 16)
    np.testing.assert_array_equal(times, ref_times)
    np.testing.assert_allclose(emb, ref_emb, rtol=5e-2, atol=5e-3)


def test_embed_samples_v24_rejected(clf):
    with pytest.raises(E.InferenceError) as ei:
        clf.embed_samples(np.zeros(144_000, np.float32))
    assert "does not produce embeddings" in str(ei.value)


def test_analyze_samples_iter_matches_batch(clf):
    samples = _audio(15.0)
    full = clf.analyze_samples(samples)
    # tiny chunk size to force multiple chunks (3 segments per chunk)
    chunked = list(clf.analyze_samples_iter(samples, chunk_segments=3))
    assert len(chunked) == len(full)
    for (t1, p1), (t2, p2) in zip(chunked, full):
        assert t1 == pytest.approx(t2)
        assert [p.index for p in p1] == [p.index for p in p2]


def test_analyze_samples_iter_with_overlap(clf):
    samples = _audio(12.0)
    full = clf.analyze_samples(samples, overlap_seconds=1.5)
    chunked = list(
        clf.analyze_samples_iter(samples, overlap_seconds=1.5, chunk_segments=2)
    )
    assert len(chunked) == len(full)
    for (t1, p1), (t2, p2) in zip(chunked, full):
        assert t1 == pytest.approx(t2)
        assert [p.index for p in p1] == [p.index for p in p2]


def test_analyze_wav(clf, tmp_path):
    from birdnet_tpu.utils.audio_io import write_wav

    wav = tmp_path / "a.wav"
    write_wav(wav, _audio(7.0), 48_000)
    out = clf.analyze_wav(wav)
    assert len(out) == 3  # ceil(7/3)
    # rate mismatch rejected without resample=True
    wav32 = tmp_path / "b.wav"
    write_wav(wav32, np.zeros(32_000, np.float32), 32_000)
    with pytest.raises(E.AudioFormatError):
        clf.analyze_wav(wav32)
    out = clf.analyze_wav(wav32, resample=True)
    assert len(out) == 1


def test_stream_pre_cancelled_token(clf):
    """Streaming honors cancellation between dispatch and collection
    (the reference honors options between batches,
    birdnet-analyze.rs:562-610)."""
    from birdnet_tpu import CancellationToken, InferenceOptions

    tok = CancellationToken()
    tok.cancel()
    with pytest.raises(E.InferenceCancelledError):
        clf.analyze_samples(
            _audio(9.0), options=InferenceOptions(cancellation_token=tok)
        )


class _StubEngine:
    """Duck-typed engine for exercising streaming_analyze's dispatch loop
    without real compilation: records every dispatched chunk size."""

    def __init__(self, tile=4, sample_count=100):
        from birdnet_tpu.types import ModelConfig, ModelType

        self.config = ModelConfig(
            model_type=ModelType.BIRDNET_V24,
            sample_rate=100,
            segment_duration=1.0,
            sample_count=sample_count,
            num_species=5,
            embedding_dim=None,
        )
        self.tile = tile
        self.top_k = 3
        self.embed_index = None
        self.params = {}
        self.dispatched_tiles = []

    def _compile(self, n_tiles, step, dtype, with_embeddings=False,
                 with_mask=False):
        tile, k = self.tile, self.top_k

        class _Ready:
            """Minimal stand-in for a jax.Array: ready immediately."""

            def __init__(self, arr):
                self._arr = arr

            def is_ready(self):
                return True

            def __array__(self, dtype=None, copy=None):
                return self._arr

        def fn(params, audio):
            self.dispatched_tiles.append(n_tiles)
            n = n_tiles * tile
            return (
                _Ready(np.zeros((n, k), np.float32)),
                _Ready(np.zeros((n, k), np.int32)),
            )

        return fn


def test_monitored_superchunks_are_bounded():
    """With a cancellation/timeout monitor active the superchunk is capped
    at MONITORED_MAX_TILES so a cancel strands at most ~one small chunk of
    committed device work (reference spirit: RunOptions::terminate within
    10 ms, src/classifier.rs:527-554)."""
    from birdnet_tpu import CancellationToken, InferenceOptions
    from birdnet_tpu.compiler.stream import (
        MONITORED_MAX_TILES,
        streaming_analyze,
    )

    # 40 tiles worth of segments at tile=4 → 160 segments of 100 samples
    eng = _StubEngine(tile=4)
    samples = np.zeros(160 * 100, np.float32)

    # Unmonitored: everything goes out in one big dispatch.
    conf, idx, times = streaming_analyze(
        eng, samples, 0.0, None, False, None, place=lambda c: c
    )
    assert conf.shape == (160, 3)
    assert len(eng.dispatched_tiles) == 1

    # Monitored: chunks capped at MONITORED_MAX_TILES tiles each.
    eng2 = _StubEngine(tile=4)
    opts = InferenceOptions(cancellation_token=CancellationToken())
    streaming_analyze(eng2, samples, 0.0, opts, False, None, place=lambda c: c)
    assert all(t <= MONITORED_MAX_TILES for t in eng2.dispatched_tiles)
    assert len(eng2.dispatched_tiles) > 1


def test_cancel_strands_at_most_one_chunk():
    """After the token fires, at most one further superchunk may already be
    committed (the pipeline keeps ≤2 in flight and waits on the oldest)."""
    from birdnet_tpu import CancellationToken, InferenceOptions
    from birdnet_tpu.compiler.stream import streaming_analyze

    tok = CancellationToken()
    eng = _StubEngine(tile=4)
    dispatches = []
    orig_compile = eng._compile

    def counting_compile(n_tiles, step, dtype, with_embeddings=False,
                         with_mask=False):
        inner = orig_compile(n_tiles, step, dtype, with_embeddings)

        def fn(params, audio):
            dispatches.append(n_tiles)
            if len(dispatches) == 2:
                tok.cancel()  # fires while chunk 2 is "in flight"
            return inner(params, audio)

        return fn

    eng._compile = counting_compile
    samples = np.zeros(160 * 100, np.float32)  # 40 tiles = 3 chunks of 16
    with np.testing.assert_raises(E.InferenceCancelledError):
        streaming_analyze(
            eng,
            samples,
            0.0,
            InferenceOptions(cancellation_token=tok),
            False,
            None,
            place=lambda c: c,
        )
    # Cancel fired during dispatch 2; the loop waits on the oldest pending
    # chunk before dispatching chunk 3, so chunk 3 never launches.
    assert len(dispatches) == 2


def test_stream_tiny_timeout(clf):
    """A zero-second-scale timeout raises InferenceTimeoutError."""
    from birdnet_tpu import InferenceOptions

    with pytest.raises(E.InferenceTimeoutError):
        # timeout so small the wait must expire (the device work is
        # abandoned, not terminated — documented semantic difference)
        clf.analyze_samples(
            _audio(30.0), options=InferenceOptions(timeout=1e-9)
        )
