"""Serving tier: DynamicBatcher coalescing + HTTP server end-to-end.

The server runs on an ephemeral port with tiny generated models (the fake
backend, SURVEY §4) and is driven with stdlib urllib — no network beyond
localhost, no extra dependencies. Mirrors the reference's concurrency
integration test (reference: tests/integration_test.rs:488-529) but goes
further: concurrent requests must *coalesce into fewer device batches*,
not just survive.
"""

import base64
import json
import struct
import threading
import time
import urllib.error
import urllib.request
import os
import wave

import numpy as np
import pytest

import birdnet_tpu.errors as E
from birdnet_tpu import Classifier
from birdnet_tpu.serve import DynamicBatcher, make_server

# Pipeline-vs-direct comparisons run two different XLA programs (batched
# serve tile vs batch-1 predict). On CPU they are bit-identical; on real
# TPU the default precision's bf16 accumulation orders differ per program
# (~4e-4 rel., measured), so the tolerance is hardware-aware.
PIPELINE_RTOL = 2e-3 if os.environ.get("BIRDNET_TEST_TPU") else 1e-5

LABELS10 = [f"species_{i}" for i in range(10)]
LABELS12 = [f"species_{i}" for i in range(12)]


@pytest.fixture(scope="module")
def v24_classifier(tmp_path_factory):
    from birdnet_tpu.models import birdnet_v24

    p = tmp_path_factory.mktemp("serve_models") / "v24_tiny.onnx"
    birdnet_v24.save_tiny(p, num_species=10)
    return (
        Classifier.builder()
        .model_path(str(p))
        .labels(LABELS10)
        .top_k(3)
        .build()
    )


@pytest.fixture(scope="module")
def perch_classifier(tmp_path_factory):
    from birdnet_tpu.models import perch_v2

    p = tmp_path_factory.mktemp("serve_models") / "perch_tiny.onnx"
    perch_v2.save_tiny(p, num_species=12, embedding_dim=48)
    return (
        Classifier.builder()
        .model_path(str(p))
        .labels(LABELS12)
        .top_k(3)
        .build()
    )


def _segment(classifier, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(
        classifier.config.sample_count, dtype=np.float32
    ) * 0.1


# ---------------------------------------------------------------------------
# DynamicBatcher unit tests
# ---------------------------------------------------------------------------


class TestDynamicBatcher:
    def test_single_request_matches_direct_predict(self, v24_classifier):
        seg = _segment(v24_classifier)
        direct = v24_classifier.predict(seg)
        with DynamicBatcher(v24_classifier, max_batch=8, max_wait_ms=1) as b:
            served = b.predict(seg, timeout=60)
        assert [p.species for p in served.predictions] == [
            p.species for p in direct.predictions
        ]
        np.testing.assert_allclose(
            [p.confidence for p in served.predictions],
            [p.confidence for p in direct.predictions],
            rtol=PIPELINE_RTOL,
        )

    def test_concurrent_requests_coalesce(self, v24_classifier):
        n = 16
        segs = [_segment(v24_classifier, seed=i) for i in range(n)]
        direct = v24_classifier.predict_batch(segs)
        with DynamicBatcher(
            v24_classifier, max_batch=16, max_wait_ms=200
        ) as b:
            futures = [b.submit(s) for s in segs]
            results = [f.result(timeout=120) for f in futures]
            stats = b.metrics.snapshot()
        # All submitted within the 200 ms window → far fewer batches than
        # requests (a single one when the queue kept up).
        assert stats["requests_total"] == n
        assert stats["batches_total"] <= 4
        assert stats["segments_total"] == n
        assert stats["mean_batch_fill"] >= n / 4
        for got, want in zip(results, direct):
            assert [p.species for p in got.predictions] == [
                p.species for p in want.predictions
            ]

    def test_submit_validates_size_in_caller_thread(self, v24_classifier):
        with DynamicBatcher(v24_classifier, max_batch=4) as b:
            with pytest.raises(E.InputSizeError):
                b.submit(np.zeros(100, np.float32))
            # queue unaffected; good requests still work
            r = b.predict(_segment(v24_classifier), timeout=60)
            assert len(r.predictions) <= 3

    def test_queue_full_rejects(self, v24_classifier):
        b = DynamicBatcher(
            v24_classifier, max_batch=1, max_wait_ms=0, max_queue=1
        )
        try:
            seg = _segment(v24_classifier)
            # Saturate: submit many quickly; at least one should be rejected
            # OR all complete (the worker may drain fast on CPU) — assert
            # the error path only when it fires.
            rejected = 0
            futures = []
            for _ in range(64):
                try:
                    futures.append(b.submit(seg))
                except E.InferenceError as e:
                    assert "overloaded" in str(e)
                    rejected += 1
            for f in futures:
                f.result(timeout=120)
            assert rejected == b.metrics.snapshot()["rejected_total"]
        finally:
            b.close()

    def test_close_drains_pending(self, v24_classifier):
        b = DynamicBatcher(v24_classifier, max_batch=4, max_wait_ms=50)
        futures = [
            b.submit(_segment(v24_classifier, seed=i)) for i in range(6)
        ]
        b.close()  # drain=True: everything completes
        for f in futures:
            assert f.result(timeout=1) is not None
        with pytest.raises(E.InferenceError):
            b.submit(_segment(v24_classifier))

    def test_perch_fallback_path(self, perch_classifier):
        seg = _segment(perch_classifier)
        direct = perch_classifier.predict(seg)
        with DynamicBatcher(
            perch_classifier, max_batch=4, max_wait_ms=1
        ) as b:
            served = b.predict(seg, timeout=120)
        assert [p.species for p in served.predictions] == [
            p.species for p in direct.predictions
        ]
        # Perch results carry embeddings through the batcher too
        assert served.embeddings is not None

    def test_two_workers_parity_and_progress(self, v24_classifier):
        """workers=2: both pipelines share the queue; results match
        single-worker predictions and every request completes."""
        n = 12
        segs = [_segment(v24_classifier, seed=50 + i) for i in range(n)]
        direct = v24_classifier.predict_batch(segs)
        with DynamicBatcher(
            v24_classifier, max_batch=4, max_wait_ms=1, workers=2
        ) as b:
            futures = [b.submit(s) for s in segs]
            results = [f.result(timeout=300) for f in futures]
            assert b.metrics.snapshot()["segments_total"] == n
        for got, want in zip(results, direct):
            assert [p.index for p in got.predictions] == [
                p.index for p in want.predictions
            ]

    def test_latency_metrics_populated(self, v24_classifier):
        with DynamicBatcher(v24_classifier, max_batch=4, max_wait_ms=1) as b:
            for i in range(3):
                b.predict(_segment(v24_classifier, seed=i), timeout=60)
            s = b.metrics.snapshot()
        assert s["latency_p50_ms"] is not None and s["latency_p50_ms"] > 0
        assert s["batches_total"] >= 1


# ---------------------------------------------------------------------------
# HTTP server end-to-end
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def server(v24_classifier):
    srv = make_server(v24_classifier, host="127.0.0.1", port=0, max_batch=8)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}"
    srv.shutdown()
    srv.state.close()
    srv.server_close()
    thread.join(timeout=10)


def _get(base, path):
    try:
        with urllib.request.urlopen(base + path, timeout=120) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


def _post(base, path, body, content_type="application/octet-stream"):
    req = urllib.request.Request(
        base + path, data=body, headers={"Content-Type": content_type}
    )
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read().decode())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read().decode())


class TestServer:
    def test_health(self, server):
        status, body = _get(server, "/v1/health")
        assert status == 200
        assert body["status"] == "ok"
        assert body["model_type"] == "BIRDNET_V24"

    def test_info(self, server, v24_classifier):
        status, body = _get(server, "/v1/info")
        assert status == 200
        cfg = v24_classifier.config
        assert body["sample_count"] == cfg.sample_count
        assert body["sample_rate"] == cfg.sample_rate
        assert body["num_species"] == 10
        assert body["max_batch"] == 8
        assert body["species_allowed"] is None  # no --species-list

    def test_info_reports_species_restriction(self, v24_classifier):
        srv = make_server(
            v24_classifier, host="127.0.0.1", port=0,
            species_allow={"species_1", "species_4"},
        )
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            host, port = srv.server_address[:2]
            status, body = _get(f"http://{host}:{port}", "/v1/info")
            assert status == 200
            assert body["species_allowed"] == 2
        finally:
            srv.shutdown()
            srv.state.close()
            srv.server_close()

    def test_labels(self, server):
        status, body = _get(server, "/v1/labels")
        assert status == 200
        assert body["labels"] == LABELS10

    def test_predict_i16(self, server, v24_classifier):
        seg = _segment(v24_classifier)
        i16 = (seg * 32768.0).clip(-32768, 32767).astype("<i2")
        status, body = _post(server, "/v1/predict", i16.tobytes())
        assert status == 200
        direct = v24_classifier.predict(
            i16.astype(np.float32) / 32768.0
        )
        assert [p["species"] for p in body["predictions"]] == [
            p.species for p in direct.predictions
        ]

    def test_predict_per_request_species(self, server, v24_classifier):
        """?species= restricts the top-K candidate set for that request
        only (server fixture has no global species list)."""
        seg = _segment(v24_classifier)
        i16 = (seg * 32768.0).clip(-32768, 32767).astype("<i2")
        status, body = _post(
            server, "/v1/predict?species=species_2,species_6", i16.tobytes()
        )
        assert status == 200
        assert {p["species"] for p in body["predictions"]} == {
            "species_2", "species_6"
        }
        # unknown list → 400, not silently-empty results
        status, body = _post(
            server, "/v1/predict?species=not_a_bird", i16.tobytes()
        )
        assert status == 400
        assert "species" in body["message"]

    def test_predict_f32(self, server, v24_classifier):
        seg = _segment(v24_classifier, seed=7)
        status, body = _post(
            server, "/v1/predict?dtype=f32", seg.astype("<f4").tobytes()
        )
        assert status == 200
        direct = v24_classifier.predict(seg)
        np.testing.assert_allclose(
            [p["confidence"] for p in body["predictions"]],
            [p.confidence for p in direct.predictions],
            rtol=PIPELINE_RTOL,
        )

    def test_predict_json_samples(self, server, v24_classifier):
        seg = _segment(v24_classifier, seed=3)
        status, body = _post(
            server,
            "/v1/predict",
            json.dumps({"samples": seg.tolist()}).encode(),
            content_type="application/json",
        )
        assert status == 200
        assert len(body["predictions"]) <= 3

    def test_predict_json_pcm16_b64(self, server, v24_classifier):
        seg = _segment(v24_classifier, seed=4)
        i16 = (seg * 32768.0).clip(-32768, 32767).astype("<i2")
        status, body = _post(
            server,
            "/v1/predict",
            json.dumps(
                {"pcm16_b64": base64.b64encode(i16.tobytes()).decode()}
            ).encode(),
            content_type="application/json",
        )
        assert status == 200
        assert len(body["predictions"]) <= 3

    def test_predict_wrong_size_is_400_with_reference_message(
        self, server, v24_classifier
    ):
        status, body = _post(
            server, "/v1/predict", np.zeros(100, "<i2").tobytes()
        )
        assert status == 400
        assert body["error"] == "InputSizeError"
        # message parity with the reference's InputSize display
        # (reference: src/error.rs InputSize variant)
        assert str(v24_classifier.config.sample_count) in body["message"]
        assert "100" in body["message"]

    def test_predict_min_confidence_filter(self, server, v24_classifier):
        seg = _segment(v24_classifier, seed=5)
        status, body = _post(
            server, "/v1/predict?min_confidence=1.1", seg.astype("<f4").tobytes()
        )
        # threshold above 1.0 → everything filtered (but request succeeds)
        # (query needs dtype=f32; reuse the default i16 misparse? no — set it)
        status, body = _post(
            server,
            "/v1/predict?min_confidence=1.1&dtype=f32",
            seg.astype("<f4").tobytes(),
        )
        assert status == 200
        assert body["predictions"] == []

    def test_unknown_route_404(self, server):
        status, body = _get(server, "/v1/nope")
        assert status == 404
        assert body["error"] == "NotFound"

    def test_malformed_query_params_are_400_not_500(self, server,
                                                    v24_classifier):
        seg = _segment(v24_classifier).astype("<f4")
        for qs in (
            "?dtype=f32&min_confidence=abc",
            "?dtype=f32&timeout_s=xyz",
        ):
            status, body = _post(server, "/v1/predict" + qs, seg.tobytes())
            assert status == 400, qs
            assert body["error"] == "BadRequest"
        status, body = _post(
            server, "/v1/analyze?rate=notanumber",
            np.zeros(100, "<i2").tobytes(),
        )
        assert status == 400

    def test_malformed_json_body_is_400(self, server):
        status, body = _post(
            server, "/v1/predict", b"{not json",
            content_type="application/json",
        )
        assert status == 400

    def test_overlap_out_of_range_is_400(self, server, v24_classifier):
        cfg = v24_classifier.config
        pcm = np.zeros(cfg.sample_count, "<i2")
        status, body = _post(
            server,
            f"/v1/analyze?rate={cfg.sample_rate}&overlap=99",
            pcm.tobytes(),
        )
        assert status == 400
        assert "overlap" in body["message"]

    def test_unread_body_does_not_corrupt_keepalive(self, server,
                                                    v24_classifier):
        """A POST to an unknown route leaves its body unread; the server
        must close that connection rather than parse the leftover bytes as
        the next request."""
        import http.client
        import urllib.parse

        host = urllib.parse.urlparse(server).netloc
        conn = http.client.HTTPConnection(host, timeout=60)
        body = np.zeros(1000, "<i2").tobytes()
        conn.request(
            "POST", "/v1/predictt", body=body,
            headers={"Content-Type": "application/octet-stream"},
        )
        r = conn.getresponse()
        assert r.status == 404
        r.read()
        # same client object: auto-reconnects if the server closed; the
        # next request must be a clean 200, not garbage parsed from `body`
        conn.request("GET", "/v1/health")
        r2 = conn.getresponse()
        assert r2.status == 200
        r2.read()
        conn.close()

    def test_analyze_wav(self, server, v24_classifier, tmp_path):
        cfg = v24_classifier.config
        # 3 segments of audio as a real RIFF WAV in memory
        n = cfg.sample_count * 3
        rng = np.random.default_rng(11)
        pcm = (rng.standard_normal(n) * 3000).astype("<i2")
        import io

        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(cfg.sample_rate)
            w.writeframes(pcm.tobytes())
        status, body = _post(server, "/v1/analyze", buf.getvalue())
        assert status == 200
        assert body["segments"] == 3
        assert len(body["detections"]) == 3
        assert body["detections"][0]["start_time"] == 0.0
        assert body["detections"][1]["start_time"] == pytest.approx(
            cfg.segment_duration
        )
        # equals the library's own streaming result
        direct = v24_classifier.analyze_samples(pcm)
        for det, (t, preds) in zip(body["detections"], direct):
            assert [p["species"] for p in det["predictions"]] == [
                p.species for p in preds
            ]

    def test_analyze_per_request_species(self, server, v24_classifier):
        cfg = v24_classifier.config
        rng = np.random.default_rng(13)
        pcm = (rng.standard_normal(cfg.sample_count) * 3000).astype("<i2")
        status, body = _post(
            server,
            f"/v1/analyze?rate={cfg.sample_rate}"
            f"&species=species_1,species_8",
            pcm.tobytes(),
        )
        assert status == 200
        emitted = {
            p["species"]
            for det in body["detections"]
            for p in det["predictions"]
        }
        assert emitted <= {"species_1", "species_8"}
        assert emitted  # candidate masking: top-K from the allowed set

    def test_analyze_raw_pcm_needs_rate(self, server, v24_classifier):
        pcm = np.zeros(v24_classifier.config.sample_count, "<i2")
        status, body = _post(server, "/v1/analyze", pcm.tobytes())
        assert status == 400
        assert "rate" in body["message"]

    def test_analyze_raw_pcm_with_rate(self, server, v24_classifier):
        cfg = v24_classifier.config
        pcm = np.zeros(cfg.sample_count, "<i2")
        status, body = _post(
            server, f"/v1/analyze?rate={cfg.sample_rate}", pcm.tobytes()
        )
        assert status == 200
        assert body["segments"] == 1

    def test_analyze_wrong_rate_is_400(self, server):
        pcm = np.zeros(1000, "<i2")
        status, body = _post(server, "/v1/analyze?rate=8000", pcm.tobytes())
        assert status == 400
        assert body["error"] == "AudioFormatError"

    def test_metrics_progress(self, server):
        status, body = _get(server, "/v1/metrics")
        assert status == 200
        assert body["requests_total"] >= 1
        assert body["batches_total"] >= 1
        assert body["analyses_total"] >= 1
        assert "latency_p50_ms" in body

    def test_metrics_prometheus_format(self, server):
        with urllib.request.urlopen(
            server + "/v1/metrics?format=prometheus", timeout=120
        ) as r:
            assert r.status == 200
            assert r.headers["Content-Type"].startswith("text/plain")
            text = r.read().decode()
        assert "# TYPE birdnet_requests_total counter" in text
        assert "birdnet_requests_total " in text
        assert "# TYPE birdnet_queue_depth gauge" in text
        # ms percentiles export as seconds
        assert "birdnet_latency_p50_seconds " in text
        assert "_ms" not in text

    def test_concurrent_http_predicts_coalesce(self, server, v24_classifier):
        before = _get(server, "/v1/metrics")[1]
        n = 12
        segs = [
            _segment(v24_classifier, seed=100 + i).astype("<f4") for i in range(n)
        ]
        results = [None] * n
        errs = []

        def hit(i):
            try:
                results[i] = _post(
                    server, "/v1/predict?dtype=f32", segs[i].tobytes()
                )
            except Exception as e:  # pragma: no cover
                errs.append(e)

        threads = [
            threading.Thread(target=hit, args=(i,)) for i in range(n)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=300)
        assert not errs
        assert all(r is not None and r[0] == 200 for r in results)
        after = _get(server, "/v1/metrics")[1]
        made = after["batches_total"] - before["batches_total"]
        assert made <= n  # coalescing happened (usually ≪ n)


@pytest.fixture(scope="module")
def rf_server(v24_classifier, tmp_path_factory):
    """Server with a tiny meta model for range filtering."""
    from birdnet_tpu.models import meta
    from birdnet_tpu.rangefilter import RangeFilter

    p = tmp_path_factory.mktemp("serve_meta") / "meta_tiny.onnx"
    meta.save_tiny(p, num_species=10)
    rf = (
        RangeFilter.builder()
        .model_path(str(p))
        .labels(list(v24_classifier.labels))
        .build()
    )
    srv = make_server(
        v24_classifier, host="127.0.0.1", port=0, max_batch=4, range_filter=rf
    )
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}", rf
    srv.shutdown()
    srv.state.close()
    srv.server_close()
    thread.join(timeout=10)


class TestRangeFilterServing:
    def test_rangefilter_endpoint(self, rf_server):
        base, rf = rf_server
        status, body = _get(base, "/v1/rangefilter?lat=42.5&lon=-76.4&date=06-15")
        assert status == 200
        direct = rf.predict(42.5, -76.4, 6, 15)
        assert body["count"] == len(direct)
        assert body["threshold"] == rf.threshold
        assert [s["species"] for s in body["scores"]] == [
            s.species for s in direct
        ]

    def test_rangefilter_needs_lat_lon(self, rf_server):
        base, _ = rf_server
        status, body = _get(base, "/v1/rangefilter")
        assert status == 400

    def test_rangefilter_invalid_coords_400(self, rf_server):
        base, _ = rf_server
        status, body = _get(base, "/v1/rangefilter?lat=95&lon=0")
        assert status == 400
        assert body["error"] == "InvalidCoordinatesError"

    def test_predict_with_location_filters(self, rf_server, v24_classifier):
        base, rf = rf_server
        seg = _segment(v24_classifier, seed=42)
        status, plain = _post(
            base, "/v1/predict?dtype=f32", seg.astype("<f4").tobytes()
        )
        assert status == 200
        status, filtered = _post(
            base,
            "/v1/predict?dtype=f32&lat=42.5&lon=-76.4&date=06-15",
            seg.astype("<f4").tobytes(),
        )
        assert status == 200
        # parity with the library's own filter semantics
        direct = v24_classifier.predict(seg)
        scores = rf.predict(42.5, -76.4, 6, 15)
        want = rf.filter_predictions(direct.predictions, scores)
        assert [p["species"] for p in filtered["predictions"]] == [
            p.species for p in want
        ]
        assert len(filtered["predictions"]) <= len(plain["predictions"])

    def test_predict_with_rerank(self, rf_server, v24_classifier):
        base, rf = rf_server
        seg = _segment(v24_classifier, seed=43)
        status, body = _post(
            base,
            "/v1/predict?dtype=f32&lat=10&lon=20&date=03-01&rerank=1",
            seg.astype("<f4").tobytes(),
        )
        assert status == 200
        direct = v24_classifier.predict(seg)
        scores = rf.predict(10, 20, 3, 1)
        want = rf.filter_predictions(direct.predictions, scores, rerank=True)
        np.testing.assert_allclose(
            [p["confidence"] for p in body["predictions"]],
            [p.confidence for p in want],
            rtol=PIPELINE_RTOL,
        )

    def test_analyze_with_location(self, rf_server, v24_classifier):
        base, rf = rf_server
        cfg = v24_classifier.config
        pcm = (
            np.random.default_rng(9).standard_normal(cfg.sample_count) * 3000
        ).astype("<i2")
        status, body = _post(
            base,
            f"/v1/analyze?rate={cfg.sample_rate}&lat=42.5&lon=-76.4&date=06-15",
            pcm.tobytes(),
        )
        assert status == 200
        direct = v24_classifier.analyze_samples(pcm)
        scores = rf.predict(42.5, -76.4, 6, 15)
        want = rf.filter_predictions(direct[0][1], scores)
        assert [
            p["species"] for p in body["detections"][0]["predictions"]
        ] == [p.species for p in want]

    def test_location_without_meta_model_400(self, server, v24_classifier):
        # `server` fixture has no range filter
        seg = _segment(v24_classifier, seed=1)
        status, body = _post(
            server,
            "/v1/predict?dtype=f32&lat=1&lon=2",
            seg.astype("<f4").tobytes(),
        )
        assert status == 400
        assert "meta model" in body["message"]


class TestServeClient:
    def test_predict_roundtrip(self, server, v24_classifier):
        from birdnet_tpu.serve import ServeClient

        c = ServeClient(server)
        seg = _segment(v24_classifier, seed=21)
        preds = c.predict(seg)
        direct = v24_classifier.predict(seg)
        assert [p.species for p in preds] == [
            p.species for p in direct.predictions
        ]
        np.testing.assert_allclose(
            [p.confidence for p in preds],
            [p.confidence for p in direct.predictions],
            rtol=PIPELINE_RTOL,
        )

    def test_predict_i16_body(self, server, v24_classifier):
        from birdnet_tpu.serve import ServeClient

        c = ServeClient(server)
        i16 = (_segment(v24_classifier, seed=22) * 32768).clip(
            -32768, 32767
        ).astype(np.int16)
        preds = c.predict(i16)
        assert preds and all(0.0 <= p.confidence <= 1.0 for p in preds)

    def test_error_reraises_taxonomy_type(self, server):
        from birdnet_tpu.serve import ServeClient

        c = ServeClient(server)
        with pytest.raises(E.InputSizeError) as ei:
            c.predict(np.zeros(100, np.float32))
        assert "expected 144000 samples, got 100" in str(ei.value)
        assert ei.value.http_status == 400

    def test_analyze_and_metadata(self, server, v24_classifier):
        from birdnet_tpu.serve import ServeClient

        c = ServeClient(server)
        cfg = v24_classifier.config
        assert c.labels() == LABELS10
        assert c.info()["sample_count"] == cfg.sample_count
        assert c.health()["status"] == "ok"
        pcm = np.zeros(cfg.sample_count * 2, np.int16)
        dets = c.analyze(pcm, rate=cfg.sample_rate)
        assert len(dets) == 2
        assert dets[1][0] == pytest.approx(cfg.segment_duration)
        assert c.metrics()["requests_total"] >= 1

    def test_analyze_wav_kwargs_wire_encoding(self, server, v24_classifier,
                                              tmp_path):
        """Boolean kwargs must encode as '1' (the server matches '1'/'true',
        not str(True)); numeric kwargs pass through."""
        from birdnet_tpu.serve import ServeClient

        cfg = v24_classifier.config
        rate = 24000  # half the model rate → only works when resample lands
        pcm = np.zeros(cfg.sample_count // 2, np.int16)
        wav_path = tmp_path / "half_rate.wav"
        with wave.open(str(wav_path), "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(rate)
            w.writeframes(pcm.tobytes())
        c = ServeClient(server)
        with pytest.raises(E.AudioFormatError):
            c.analyze_wav(str(wav_path))  # no resample → 400
        dets = c.analyze_wav(str(wav_path), resample=True, min_confidence=0.0)
        assert len(dets) == 1

    def test_rangefilter_client(self, rf_server):
        from birdnet_tpu.serve import ServeClient

        base, rf = rf_server
        c = ServeClient(base)
        scores = c.rangefilter(42.5, -76.4, date="06-15")
        direct = rf.predict(42.5, -76.4, 6, 15)
        assert [(s.species, s.index) for s in scores] == [
            (s.species, s.index) for s in direct
        ]


class TestSoak:
    def test_mixed_concurrent_traffic_no_5xx(self, server, v24_classifier):
        """16 client threads fire a mix of predicts, analyzes, bad
        requests, and metrics reads; the server must answer everything
        with the right class of status (no 5xx) and keep counters
        consistent."""
        cfg = v24_classifier.config
        good_seg = _segment(v24_classifier, seed=77).astype("<f4").tobytes()
        bad_seg = np.zeros(10, "<f4").tobytes()
        pcm = np.zeros(cfg.sample_count, "<i2").tobytes()
        statuses = []
        lock = threading.Lock()

        def worker(i):
            for j in range(4):
                kind = (i + j) % 4
                if kind == 0:
                    s, _ = _post(
                        server, "/v1/predict?dtype=f32", good_seg
                    )
                    want = 200
                elif kind == 1:
                    s, _ = _post(server, "/v1/predict?dtype=f32", bad_seg)
                    want = 400
                elif kind == 2:
                    s, _ = _post(
                        server, f"/v1/analyze?rate={cfg.sample_rate}", pcm
                    )
                    want = 200
                else:
                    s, _ = _get(server, "/v1/metrics")
                    want = 200
                with lock:
                    statuses.append((kind, s, want))

        threads = [
            threading.Thread(target=worker, args=(i,)) for i in range(16)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=600)
        assert len(statuses) == 64
        for kind, got, want in statuses:
            assert got == want, (kind, got, want)
        m = _get(server, "/v1/metrics")[1]
        assert m["errors_total"] == 0  # device-side failures only
        assert m["segments_total"] == m["requests_total"]


class TestReviewHardening:
    """Regression tests for the round-2 serving-tier review findings."""

    def test_resolve_future_tolerates_cancelled_future(self):
        # A caller cancelling between batch collection and result delivery
        # must not raise InvalidStateError out of the worker loop.
        from concurrent.futures import Future

        from birdnet_tpu.serve.batcher import _resolve_future

        f = Future()
        assert f.cancel()
        _resolve_future(f, result=1)  # no raise
        f2 = Future()
        _resolve_future(f2, result=42)
        assert f2.result(timeout=0) == 42
        f3 = Future()
        _resolve_future(f3, exception=RuntimeError("boom"))
        with pytest.raises(RuntimeError):
            f3.result(timeout=0)

    def test_resolve_future_blocks_late_cancel(self):
        # Once resolution has begun (PENDING→RUNNING), cancel() must fail,
        # closing the check-then-set race window.
        from concurrent.futures import Future

        f = Future()
        assert f.set_running_or_notify_cancel()
        assert not f.cancel()

    def test_analyze_admission_503_when_saturated(self, v24_classifier):
        srv = make_server(v24_classifier, host="127.0.0.1", port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            host, port = srv.server_address[:2]
            base = f"http://{host}:{port}"
            # Exhaust the admission slots and make the wait immediate.
            st = srv.state
            st.analyze_admission_timeout = 0.05
            for _ in range(4):
                st.analyze_slots.acquire()
            cfg = v24_classifier.config
            pcm = np.zeros(cfg.sample_count, "<i2").tobytes()
            status, body = _post(base, f"/v1/analyze?rate={cfg.sample_rate}", pcm)
            assert status == 503
            assert body["error"] == "Overloaded"
            for _ in range(4):
                st.analyze_slots.release()
            # and a slot being free again admits normally
            status, _ = _post(base, f"/v1/analyze?rate={cfg.sample_rate}", pcm)
            assert status == 200
        finally:
            srv.shutdown()
            srv.state.close()
            srv.server_close()
            t.join(timeout=10)

    def test_predict_malformed_timeout_rejected_before_submit(
        self, server, v24_classifier
    ):
        seg = _segment(v24_classifier, seed=5).astype("<f4").tobytes()
        before = _get(server, "/v1/metrics")[1]["requests_total"]
        status, body = _post(server, "/v1/predict?dtype=f32&timeout_s=abc", seg)
        assert status == 400
        # the segment must not have been queued for device work
        after = _get(server, "/v1/metrics")[1]["requests_total"]
        assert after == before

    def test_rangefilter_device_fault_maps_to_500(self, v24_classifier):
        from birdnet_tpu.errors import RangeFilterInferenceError

        class _BrokenRF:
            threshold = 0.01

            def predict(self, lat, lon, month, day):
                raise RangeFilterInferenceError("device fault")

        srv = make_server(
            v24_classifier, host="127.0.0.1", port=0, range_filter=_BrokenRF()
        )
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        try:
            host, port = srv.server_address[:2]
            base = f"http://{host}:{port}"
            status, body = _get(base, "/v1/rangefilter?lat=10.0&lon=20.0")
            assert status == 500
            assert body["error"] == "RangeFilterInferenceError"
            # POST path: a filtered predict hits the same fault class
            seg = _segment(v24_classifier, seed=6).astype("<f4").tobytes()
            status, body = _post(
                base, "/v1/predict?dtype=f32&lat=10.0&lon=20.5", seg
            )
            assert status == 500
            assert body["error"] == "RangeFilterInferenceError"
        finally:
            srv.shutdown()
            srv.state.close()
            srv.server_close()
            t.join(timeout=10)

    def test_analyze_validates_overlap_before_decode(self, server, v24_classifier):
        cfg = v24_classifier.config
        # Body is junk: validation must reject on the query string alone.
        status, body = _post(
            server, f"/v1/analyze?rate={cfg.sample_rate}&overlap=99", b"\0\0"
        )
        assert status == 400
        assert "overlap" in body["message"]


class TestServeCLI:
    def test_parser_defaults(self):
        from birdnet_tpu.serve.server import build_parser

        args = build_parser().parse_args(
            ["--model", "m.onnx", "--labels", "l.txt"]
        )
        assert args.port == 8439
        assert args.max_batch == 32
        assert args.max_wait_ms == 5.0
        assert args.provider == "auto"


# ---------------------------------------------------------------------------
# /v1/embed — bulk embedding extraction (round 4)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def perch_server(perch_classifier):
    srv = make_server(perch_classifier, host="127.0.0.1", port=0, max_batch=4)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    host, port = srv.server_address[:2]
    yield f"http://{host}:{port}"
    srv.shutdown()
    srv.state.close()
    srv.server_close()
    thread.join(timeout=10)


class TestEmbedEndpoint:
    def test_embed_matches_direct(self, perch_server, perch_classifier):
        import base64

        cfg = perch_classifier.config
        rng = np.random.default_rng(31)
        audio = (rng.standard_normal(cfg.sample_count * 3) * 3000).astype(
            np.int16
        )
        status, body = _post(
            perch_server, f"/v1/embed?rate={cfg.sample_rate}",
            audio.astype("<i2").tobytes(),
        )
        assert status == 200, body
        assert body["model_type"] == "PERCH_V2"
        assert body["segments"] == 3
        assert body["embedding_dim"] == 48
        emb = np.frombuffer(
            base64.b64decode(body["embeddings_b64"]), dtype=np.float32
        ).reshape(3, 48)
        ref_emb, ref_times = perch_classifier.embed_samples(audio)
        np.testing.assert_allclose(emb, ref_emb, rtol=PIPELINE_RTOL,
                                   atol=1e-4)
        assert body["start_times"] == [round(float(t), 3) for t in ref_times]

    def test_embed_client_roundtrip(self, perch_server, perch_classifier):
        from birdnet_tpu.serve import ServeClient

        cfg = perch_classifier.config
        c = ServeClient(perch_server)
        rng = np.random.default_rng(32)
        audio = (rng.standard_normal(cfg.sample_count * 2) * 3000).astype(
            np.int16
        )
        emb, times = c.embed(audio, rate=cfg.sample_rate)
        assert emb.shape == (2, 48)
        ref_emb, _ = perch_classifier.embed_samples(audio)
        np.testing.assert_allclose(emb, ref_emb, rtol=PIPELINE_RTOL,
                                   atol=1e-4)
        assert len(times) == 2

    def test_embed_on_model_without_embeddings_is_400(self, server):
        status, body = _post(
            server, "/v1/embed?rate=48000",
            np.zeros(144000, "<i2").tobytes(),
        )
        assert status == 400
        assert "no embeddings output" in body["message"]

    def test_embed_wav_body_and_overlap_validation(self, perch_server,
                                                   perch_classifier):
        cfg = perch_classifier.config
        status, body = _post(
            perch_server, "/v1/embed?overlap=99",
            np.zeros(cfg.sample_count, "<i2").tobytes(),
        )
        assert status == 400
        assert "overlap" in body["message"]
