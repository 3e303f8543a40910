"""HTTP inference server (`birdnet-serve`).

The reference ships a batch CLI only; deployment as a service means
embedding the Rust library in your own daemon. This module is the
TPU-native serving front end the prompt's production story needs: a
dependency-free (stdlib ``http.server``) JSON/PCM API over one shared
:class:`~birdnet_tpu.classifier.Classifier`, with concurrent ``/v1/predict``
requests coalesced into device batches by
:class:`~birdnet_tpu.serve.batcher.DynamicBatcher` and whole-recording
``/v1/analyze`` requests going through the streaming device pipeline
(one upload, fused segmentation + inference + top-K on device).

Endpoints
---------
- ``GET  /v1/health``   liveness + model identity
- ``GET  /v1/info``     model config, device, serving parameters
- ``GET  /v1/labels``   full label list
- ``GET  /v1/metrics``  request/batch/latency counters (JSON)
- ``POST /v1/predict``  one segment → top-K predictions
    Body: ``application/octet-stream`` raw little-endian PCM
    (``?dtype=i16`` default, or ``f32``), or ``application/json``
    ``{"samples": [...]}``. Exactly ``sample_count`` samples
    (classifier.rs:612-618 semantics; errors map to HTTP 400 with the
    reference's message strings).
    Query: ``min_confidence`` (host-side filter), ``embeddings=1``
    (base64 float32, v3.0/Perch only), ``species=a,b,c`` (per-request
    candidate restriction: the batch program takes a per-row species
    mask, so requests with different lists still coalesce into one
    device batch).
- ``POST /v1/analyze``  whole recording → timestamped detections
- ``POST /v1/embed``    whole recording → per-segment embeddings
  (v3.0/Perch; base64 float32 [segments, dim] + start times — the bulk
  Perch embedding workflow)
    Body: a WAV file (RIFF; mono/16-bit rules as the CLI,
    birdnet-analyze.rs:653-704) or raw i16 PCM with ``?rate=``.
    Query: ``overlap`` seconds (default 0), ``min_confidence``,
    ``resample=1`` to accept non-model rates.
- ``GET  /v1/rangefilter?lat=&lon=[&date=MM-DD]``  meta-model species
    scores for a site (requires ``--meta-model``). The same
    ``lat``/``lon``/``date``/``rerank`` params on predict/analyze apply
    the reference's filter/rerank semantics to results
    (rangefilter.rs:333-386); per-site scores are cached server-side.

Error mapping: 400 for validation errors (input size, audio format), 404
unknown route, 413 oversized body, 503 queue-full/overload, 500 anything
else — always ``{"error": <ExceptionName>, "message": <display string>}``.
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import sys
import tempfile
import threading
import time
import urllib.parse
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from ..classifier import Classifier
from ..errors import (
    AudioFormatError,
    AudioReadError,
    BirdnetError,
    InferenceError,
    InputSizeError,
    RangeFilterInferenceError,
    SpeciesListError,
)
from ..runtime import init_runtime
from ..types import Prediction
from .batcher import DynamicBatcher

MAX_BODY_BYTES = 1 << 30  # 1 GiB — ~3h of 48kHz i16 mono


class ServerState:
    """Everything the handler threads share."""

    def __init__(
        self,
        classifier: Classifier,
        max_batch: int = 32,
        max_wait_ms: float = 5.0,
        max_queue: int = 4096,
        range_filter=None,
        species_allow=None,
        workers: int = 1,
        max_analyze_inflight: int = 4,
    ):
        self.classifier = classifier
        self.batcher = DynamicBatcher(
            classifier,
            max_batch=max_batch,
            max_wait_ms=max_wait_ms,
            max_queue=max_queue,
            workers=workers,
        )
        self.range_filter = range_filter
        self.species_allow = (
            frozenset(species_allow) if species_allow else None
        )
        self._scores_cache: dict = {}  # (lat, lon, month, day) → scores
        self._scores_lock = threading.Lock()
        self._species_mask_cache: dict = {}  # raw ?species= string → mask
        self.started_at = time.time()
        self.analyze_lock = threading.Lock()  # one streaming pass at a time
        # Bounds concurrently-admitted /v1/analyze requests (each holds its
        # body + decoded samples in RAM while queued on analyze_lock).
        self.analyze_slots = threading.BoundedSemaphore(max_analyze_inflight)
        self.analyze_admission_timeout = 120.0  # s to wait for a slot → 503
        self.analyses_total = 0
        self.analyze_segments_total = 0

    def location_scores(self, lat: float, lon: float, month: int, day: int):
        """Meta-model species scores for a location/date, cached — serving
        traffic from one deployment clusters on a few sites, and the meta
        model is deterministic per (lat, lon, week)."""
        key = (round(lat, 4), round(lon, 4), month, day)
        with self._scores_lock:
            if key in self._scores_cache:
                return self._scores_cache[key]
        scores = self.range_filter.predict(lat, lon, month, day)
        with self._scores_lock:
            if len(self._scores_cache) >= 256:
                self._scores_cache.clear()
            self._scores_cache[key] = scores
        return scores

    def species_mask_for(self, spec: str):
        """Per-request candidate mask from a ``?species=a,b,c`` value
        (names match a full ``Scientific_Common`` label or either half),
        cached by the raw string — deployments reuse a handful of lists.
        Raises ``_HttpError(400)`` when nothing matches."""
        with self._scores_lock:
            mask = self._species_mask_cache.get(spec)
        if mask is None:
            from ..labels import species_mask_from_names

            mask = species_mask_from_names(
                self.classifier.labels, spec.split(",")
            )
            with self._scores_lock:
                if len(self._species_mask_cache) >= 256:
                    self._species_mask_cache.clear()
                self._species_mask_cache[spec] = mask
        if not mask.any():
            raise _HttpError(
                400, "species= matches none of the model's labels"
            )
        return mask

    def close(self) -> None:
        self.batcher.close()


def _pred_json(p: Prediction) -> dict:
    return {
        "species": p.species,
        "confidence": float(p.confidence),
        "index": int(p.index),
    }


def _apply_min_conf(preds, min_conf: Optional[float]):
    if min_conf is None:
        return preds
    return [p for p in preds if p.confidence >= min_conf]


class _Handler(BaseHTTPRequestHandler):
    server_version = "birdnet-tpu-serve/0.4"
    protocol_version = "HTTP/1.1"

    # quiet by default; the server object can set log=True
    def log_message(self, fmt, *args):
        if getattr(self.server, "verbose", False):
            sys.stderr.write(
                "%s - %s\n" % (self.address_string(), fmt % args)
            )

    @property
    def state(self) -> ServerState:
        return self.server.state  # type: ignore[attr-defined]

    # -- plumbing -----------------------------------------------------------

    def _send_json(self, obj, status: int = 200) -> None:
        body = json.dumps(obj).encode()
        if status >= 400:
            # Error paths may not have consumed the request body; leftover
            # bytes on a keep-alive connection would be parsed as the next
            # request line. Closing is always safe.
            self.close_connection = True
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        if status >= 400:
            self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)

    def _send_error_json(self, exc: Exception, status: int) -> None:
        self._send_json(
            {"error": type(exc).__name__, "message": str(exc)}, status=status
        )

    def _send_prometheus(self, metrics: dict) -> None:
        """Render the metrics dict in Prometheus text exposition format
        (``birdnet_`` prefix; ms percentiles exported as seconds)."""
        lines = []
        for key, value in metrics.items():
            if value is None:
                continue
            if key.endswith("_ms"):
                name = "birdnet_" + key[: -len("_ms")] + "_seconds"
                value = value / 1000.0
            elif key.endswith("_s"):
                name = "birdnet_" + key[: -len("_s")] + "_seconds"
            else:
                name = "birdnet_" + key
            kind = "counter" if key.endswith("_total") else "gauge"
            lines.append(f"# TYPE {name} {kind}")
            lines.append(f"{name} {value}")
        body = ("\n".join(lines) + "\n").encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/plain; version=0.0.4")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _read_body(self) -> bytes:
        length = int(self.headers.get("Content-Length", 0))
        if length > MAX_BODY_BYTES:
            raise _HttpError(413, f"body too large ({length} bytes)")
        if length <= 0:
            raise _HttpError(400, "empty request body")
        return self.rfile.read(length)

    def _query(self) -> dict:
        parsed = urllib.parse.urlparse(self.path)
        return {
            k: v[-1]
            for k, v in urllib.parse.parse_qs(parsed.query).items()
        }

    def _route(self) -> str:
        return urllib.parse.urlparse(self.path).path.rstrip("/")

    def _location_args(self, query: dict):
        """Parse lat/lon/date query params → (lat, lon, month, day) or
        None when absent. Errors early when the server has no meta model."""
        if "lat" not in query and "lon" not in query:
            return None
        if "lat" not in query or "lon" not in query:
            raise _HttpError(400, "range filtering needs both lat and lon")
        if self.state.range_filter is None:
            raise _HttpError(
                400,
                "server was started without a meta model "
                "(--meta-model); range filtering unavailable",
            )
        lat, lon = float(query["lat"]), float(query["lon"])
        if "date" in query:
            parts = query["date"].split("-")
            if len(parts) != 2:
                raise _HttpError(400, "date must be MM-DD")
            month, day = int(parts[0]), int(parts[1])
        else:
            now = time.localtime()
            month, day = now.tm_mon, now.tm_mday
        return lat, lon, month, day

    def _filter_ctx(self, query: dict):
        """Resolve everything ``_apply_filters`` needs from the query ONCE:
        (location scores or None, rerank flag, min_confidence or None).
        Parsing/meta-model work happens here so per-segment filtering on the
        analyze path is just list work, not thousands of re-parses."""
        loc = self._location_args(query)
        scores = self.state.location_scores(*loc) if loc is not None else None
        rerank = query.get("rerank") in ("1", "true")
        min_conf = (
            float(query["min_confidence"])
            if "min_confidence" in query
            else None
        )
        return scores, rerank, min_conf

    def _apply_filters(self, predictions, fctx):
        """Apply the server species list, optional per-request location
        filtering, and min-confidence."""
        scores, rerank, min_conf = fctx
        if self.state.species_allow is not None:
            predictions = [
                p
                for p in predictions
                if p.species in self.state.species_allow
            ]
        if scores is not None:
            predictions = self.state.range_filter.filter_predictions(
                predictions, scores, rerank=rerank
            )
        return _apply_min_conf(predictions, min_conf)

    def _filtered(self, predictions, query: dict):
        return self._apply_filters(predictions, self._filter_ctx(query))

    # -- GET ----------------------------------------------------------------

    def do_GET(self):  # noqa: N802 (stdlib casing)
        try:
            route = self._route()
            st = self.state
            cfg = st.classifier.config
            if route == "/v1/health":
                self._send_json(
                    {
                        "status": "ok",
                        "model_type": cfg.model_type.name,
                        "device": str(st.classifier.device),
                        "uptime_s": round(time.time() - st.started_at, 1),
                    }
                )
            elif route == "/v1/info":
                self._send_json(
                    {
                        "model_type": cfg.model_type.name,
                        "sample_rate": cfg.sample_rate,
                        "sample_count": cfg.sample_count,
                        "segment_seconds": cfg.segment_duration,
                        "num_species": cfg.num_species,
                        "embedding_dim": cfg.embedding_dim,
                        "top_k": st.classifier.top_k_value,
                        "min_confidence": st.classifier.min_confidence_value,
                        "device": str(st.classifier.device),
                        "max_batch": st.batcher.max_batch,
                        "species_allowed": (
                            len(st.species_allow)
                            if st.species_allow is not None
                            else None
                        ),
                    }
                )
            elif route == "/v1/labels":
                self._send_json({"labels": st.classifier.labels})
            elif route == "/v1/rangefilter":
                loc = self._location_args(self._query())
                if loc is None:
                    raise _HttpError(400, "rangefilter needs lat and lon")
                scores = st.location_scores(*loc)
                self._send_json(
                    {
                        "count": len(scores),
                        "threshold": st.range_filter.threshold,
                        "scores": [
                            {
                                "species": s.species,
                                "score": float(s.score),
                                "index": int(s.index),
                            }
                            for s in scores
                        ],
                    }
                )
            elif route == "/v1/metrics":
                m = st.batcher.metrics.snapshot()
                m["queue_depth"] = st.batcher.queue_depth()
                m["analyses_total"] = st.analyses_total
                m["analyze_segments_total"] = st.analyze_segments_total
                m["uptime_s"] = round(time.time() - st.started_at, 1)
                if self._query().get("format") == "prometheus":
                    self._send_prometheus(m)
                else:
                    self._send_json(m)
            else:
                self._send_json(
                    {"error": "NotFound", "message": f"no route {route}"},
                    status=404,
                )
        except _HttpError as e:
            self._send_json(
                {"error": _HTTP_ERROR_NAMES.get(e.status, "BadRequest"),
                 "message": e.message},
                status=e.status,
            )
        except RangeFilterInferenceError as e:
            # meta-model device/runtime fault — a server-side failure, not
            # a malformed request; 5xx so clients/load balancers retry
            self._send_error_json(e, 500)
        except BirdnetError as e:
            self._send_error_json(e, 400)
        except ValueError as e:
            self._send_json(
                {"error": "BadRequest", "message": str(e)}, status=400
            )
        except Exception as e:  # pragma: no cover - handler safety net
            self._send_error_json(e, 500)

    # -- POST ---------------------------------------------------------------

    def do_POST(self):  # noqa: N802
        route = self._route()
        try:
            if route == "/v1/predict":
                self._predict()
            elif route == "/v1/analyze":
                self._analyze()
            elif route == "/v1/embed":
                self._embed()
            else:
                self._send_json(
                    {"error": "NotFound", "message": f"no route {route}"},
                    status=404,
                )
        except _HttpError as e:
            self._send_json(
                {"error": _HTTP_ERROR_NAMES.get(e.status, "BadRequest"),
                 "message": e.message},
                status=e.status,
            )
        except (InputSizeError, AudioFormatError, AudioReadError) as e:
            self._send_error_json(e, 400)
        except InferenceError as e:
            # queue-full/overload surfaces as 503 so load balancers back off
            status = 503 if "overloaded" in str(e) else 500
            self._send_error_json(e, status)
        except RangeFilterInferenceError as e:
            self._send_error_json(e, 500)  # server-side meta-model fault
        except BirdnetError as e:
            self._send_error_json(e, 400)
        except ValueError as e:
            # malformed query params / JSON bodies are caller errors
            self._send_json(
                {"error": "BadRequest", "message": str(e)}, status=400
            )
        except Exception as e:
            self._send_error_json(e, 500)

    def _decode_segment(self, body: bytes, query: dict) -> np.ndarray:
        ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
        if ctype == "application/json":
            payload = json.loads(body.decode())
            if "samples" in payload:
                return np.asarray(payload["samples"], dtype=np.float32)
            if "pcm16_b64" in payload:
                raw = base64.b64decode(payload["pcm16_b64"])
                i16 = np.frombuffer(raw, dtype="<i2")
                return i16.astype(np.float32) / 32768.0
            raise _HttpError(
                400, "JSON body needs 'samples' or 'pcm16_b64'"
            )
        dtype = query.get("dtype", "i16")
        if dtype == "i16":
            if len(body) % 2:
                raise _HttpError(400, "odd byte count for i16 PCM")
            return np.frombuffer(body, dtype="<i2").astype(np.float32) / 32768.0
        if dtype == "f32":
            if len(body) % 4:
                raise _HttpError(400, "byte count not a multiple of 4 for f32")
            return np.frombuffer(body, dtype="<f4").astype(np.float32)
        raise _HttpError(400, f"unknown dtype {dtype!r} (use i16 or f32)")

    def _predict(self) -> None:
        import concurrent.futures

        query = self._query()
        body = self._read_body()
        segment = self._decode_segment(body, query)
        st = self.state
        mask = (
            st.species_mask_for(query["species"])
            if query.get("species")
            else None
        )
        # Parse everything fallible BEFORE submitting: a 400 after submit
        # would leave the segment running on device for a dead request.
        timeout = float(query.get("timeout_s", 60.0))
        fctx = self._filter_ctx(query)
        fut = st.batcher.submit(segment, species_mask=mask)
        try:
            result = fut.result(timeout=timeout)
        except concurrent.futures.TimeoutError:
            raise _HttpError(
                504, f"inference did not complete within {timeout}s"
            ) from None
        preds = self._apply_filters(result.predictions, fctx)
        out = {
            "model_type": result.model_type.name,
            "predictions": [_pred_json(p) for p in preds],
        }
        if query.get("embeddings") in ("1", "true") and (
            result.embeddings is not None
        ):
            emb = np.asarray(result.embeddings, dtype=np.float32)
            out["embeddings_b64"] = base64.b64encode(emb.tobytes()).decode()
            out["embedding_dim"] = int(emb.shape[-1])
        self._send_json(out)

    def _analyze(self) -> None:
        st = self.state
        # Admission control: ThreadingHTTPServer spawns a thread per request
        # and each analyze holds its full body + decoded samples in RAM while
        # waiting on analyze_lock. Bound the ADMITTED count BEFORE reading
        # the (up to 1 GiB) body — unadmitted requests wait with the bytes
        # still in the socket (TCP flow control), so bursts queue without
        # memory growth and only sustained overload answers 503.
        if not st.analyze_slots.acquire(timeout=st.analyze_admission_timeout):
            raise _HttpError(
                503,
                "too many concurrent analyze requests; retry later",
            )
        try:
            self._analyze_admitted()
        finally:
            st.analyze_slots.release()

    def _decode_recording(self, query, cfg, resample: bool) -> np.ndarray:
        """Shared recording-body decode for /v1/analyze and /v1/embed:
        WAV (RIFF magic) or raw i16 PCM with ?rate=, optional device
        polyphase resample to the model rate."""
        body = self._read_body()
        if body[:4] == b"RIFF":
            samples, rate = _read_wav_bytes(body)
        else:
            if "rate" not in query:
                raise _HttpError(
                    400,
                    "raw PCM needs ?rate= (or send a WAV file body)",
                )
            rate = int(query["rate"])
            if len(body) % 2:
                raise _HttpError(400, "odd byte count for i16 PCM")
            samples = np.frombuffer(body, dtype="<i2")
        if rate != cfg.sample_rate:
            if not resample:
                raise AudioFormatError(
                    f"model expects {cfg.sample_rate} Hz audio, input is "
                    f"{rate} Hz (pass resample=1 to convert)"
                )
            from ..ops.resample import resample_audio

            samples = resample_audio(
                samples, rate, cfg.sample_rate, out_dtype=np.int16
            )
        return samples

    def _embed(self) -> None:
        """POST /v1/embed — bulk embedding extraction over a whole
        recording (the primary Perch v2 workflow: embeddings for
        downstream classifiers/search indexes). Same body forms and
        admission control as /v1/analyze; returns base64 row-major
        float32 [segments, dim] plus start times."""
        st = self.state
        if not st.analyze_slots.acquire(timeout=st.analyze_admission_timeout):
            raise _HttpError(
                503, "too many concurrent analyze/embed requests; retry later"
            )
        try:
            self._embed_admitted()
        finally:
            st.analyze_slots.release()

    def _embed_admitted(self) -> None:
        from .._demux import demux_indices

        st = self.state
        cfg = st.classifier.config
        if demux_indices(cfg.model_type)[1] is None:
            raise _HttpError(
                400,
                f"{cfg.model_type.name} has no embeddings output "
                f"(BirdNET v3.0 / Perch v2 only)",
            )
        query = self._query()
        overlap = float(query.get("overlap", 0.0))
        if overlap >= cfg.segment_duration or overlap < 0:
            raise _HttpError(
                400,
                f"overlap must be in [0, {cfg.segment_duration}) seconds",
            )
        resample = query.get("resample") in ("1", "true")
        samples = self._decode_recording(query, cfg, resample)

        with st.analyze_lock:
            t0 = time.monotonic()
            emb, times = st.classifier.embed_samples(samples, overlap)
            dt = time.monotonic() - t0
            st.analyses_total += 1
            st.analyze_segments_total += len(times)

        emb = np.asarray(emb, dtype=np.float32)
        self._send_json({
            "model_type": cfg.model_type.name,
            "segments": int(emb.shape[0]),
            "embedding_dim": int(emb.shape[-1]),
            "start_times": [round(float(t), 3) for t in times],
            "embeddings_b64": base64.b64encode(
                np.ascontiguousarray(emb).tobytes()
            ).decode(),
            "wall_seconds": round(dt, 4),
        })

    def _analyze_admitted(self) -> None:
        st = self.state
        cfg = st.classifier.config
        query = self._query()

        # Everything fallible that the query string alone determines is
        # checked BEFORE decoding/resampling the recording — a malformed
        # overlap/species/location must not cost a full device resample.
        overlap = float(query.get("overlap", 0.0))
        if overlap >= cfg.segment_duration or overlap < 0:
            raise _HttpError(
                400,
                f"overlap must be in [0, {cfg.segment_duration}) seconds",
            )
        resample = query.get("resample") in ("1", "true")
        mask = (
            st.species_mask_for(query["species"])
            if query.get("species")
            else None
        )
        fctx = self._filter_ctx(query)

        samples = self._decode_recording(query, cfg, resample)

        with st.analyze_lock:
            # t0 starts inside the lock: wall_seconds/segments_per_second
            # report THIS request's device pass, not time spent queued
            # behind other analyses.
            t0 = time.monotonic()
            detections = st.classifier.analyze_samples(
                samples, overlap, species_mask=mask
            )
            dt = time.monotonic() - t0
            st.analyses_total += 1
            st.analyze_segments_total += len(detections)

        audio_seconds = len(samples) / cfg.sample_rate
        out = {
            "model_type": cfg.model_type.name,
            "segments": len(detections),
            "audio_seconds": round(audio_seconds, 3),
            "wall_seconds": round(dt, 4),
            "segments_per_second": round(len(detections) / dt, 1)
            if dt > 0
            else None,
            "realtime_factor": round(audio_seconds / dt, 1)
            if dt > 0
            else None,
            "detections": [
                {
                    "start_time": round(t, 3),
                    "predictions": [
                        _pred_json(p) for p in self._apply_filters(preds, fctx)
                    ],
                }
                for t, preds in detections
            ],
        }
        self._send_json(out)


_HTTP_ERROR_NAMES = {
    400: "BadRequest",
    404: "NotFound",
    413: "PayloadTooLarge",
    503: "Overloaded",
    504: "Timeout",
}


class _HttpError(Exception):
    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status
        self.message = message


def _read_wav_bytes(body: bytes):
    """Decode an in-memory WAV via the same validated reader the CLI uses
    (native wavio / numpy fallback are path-based, so spool to a temp
    file — the decode itself dominates, not the spool)."""
    from ..utils.audio_io import read_wav

    with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
        f.write(body)
        path = f.name
    try:
        samples, rate, _ = read_wav(path, dtype="int16")
    finally:
        os.unlink(path)
    return samples, rate


def make_server(
    classifier: Classifier,
    host: str = "127.0.0.1",
    port: int = 0,
    max_batch: int = 32,
    max_wait_ms: float = 5.0,
    max_queue: int = 4096,
    range_filter=None,
    species_allow=None,
    workers: int = 1,
    verbose: bool = False,
) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``server.state`` carries the
    shared classifier + batcher. Use ``serve_forever()`` / ``shutdown()``."""
    server = ThreadingHTTPServer((host, port), _Handler)
    server.daemon_threads = True
    server.state = ServerState(  # type: ignore[attr-defined]
        classifier,
        max_batch=max_batch,
        max_wait_ms=max_wait_ms,
        max_queue=max_queue,
        range_filter=range_filter,
        species_allow=species_allow,
        workers=workers,
    )
    server.verbose = verbose  # type: ignore[attr-defined]
    return server


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="birdnet-serve",
        description="Serve a BirdNET/Perch model over HTTP with dynamic "
        "request batching",
    )
    p.add_argument("--model", required=True, help="ONNX model or .btck checkpoint")
    p.add_argument("--labels", required=True, help="labels file")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8439)
    p.add_argument("--provider", default="auto", help="auto|cpu|tpu")
    p.add_argument("--precision", default=None, help="fp32|mixed|fast|bf16")
    p.add_argument("--top-k", type=int, default=10)
    p.add_argument("--min-confidence", type=float, default=None)
    p.add_argument("--max-batch", type=int, default=32)
    p.add_argument(
        "--max-wait-ms",
        type=float,
        default=5.0,
        help="batching window: how long the first queued request waits for "
        "the batch to fill",
    )
    p.add_argument("--max-queue", type=int, default=4096)
    p.add_argument(
        "--workers",
        type=int,
        default=1,
        help="batch pipelines sharing the queue (2 overlaps host "
        "staging/readback with device compute; measure with "
        "scripts/serve_bench.py --workers)",
    )
    p.add_argument(
        "--species-list",
        metavar="FILE",
        default=None,
        help="restrict served predictions to species listed in FILE "
        "(one per line; full Scientific_Common label or either half)",
    )
    p.add_argument(
        "--meta-model",
        default=None,
        help="BirdNET meta model for per-request range filtering "
        "(?lat=&lon=&date=MM-DD on predict/analyze, GET /v1/rangefilter)",
    )
    p.add_argument(
        "--mesh",
        action="store_true",
        help="serve over all local chips as a DP(+TP) mesh (one process "
        "drives the mesh; alternatively run one birdnet-serve per chip "
        "behind a load balancer — see docs/serving.md)",
    )
    p.add_argument(
        "--warmup",
        action="store_true",
        help="pre-compile the predict and analyze programs before "
        "accepting traffic (first-request latency moves to startup; the "
        "persistent XLA cache makes warm restarts fast)",
    )
    p.add_argument("-v", "--verbose", action="store_true")
    return p


def main(argv=None) -> int:
    from ..utils.logfilter import filter_native_stderr, silence_cosmetic_python_logs

    # Same cosmetic-log suppression as the CLI (cpu_aot_loader
    # pseudo-feature lines, libtpu/axon discovery probes,
    # experimental-platform warning).
    silence_cosmetic_python_logs()
    with filter_native_stderr():
        return _main(argv)


def _main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.provider == "cpu":
        # Honor an explicit CPU request on accelerator hosts (same as the
        # CLI): pin the platform before any backend init.
        from ..runtime import set_platform

        set_platform("cpu")
    init_runtime()
    builder = (
        Classifier.builder()
        .model_path(args.model)
        .labels_path(args.labels)
        .top_k(args.top_k)
    )
    if args.min_confidence is not None:
        builder = builder.min_confidence(args.min_confidence)
    if args.precision:
        builder = builder.precision(args.precision)
    if args.mesh:
        builder = builder.with_mesh()
    elif args.provider not in ("auto", "cpu"):
        builder = builder.with_device(args.provider)
    species_wanted = None
    if args.species_list:
        with open(args.species_list, "r", encoding="utf-8") as f:
            species_wanted = [ln.strip() for ln in f if ln.strip()]
        # Candidate restriction happens on device (logits masked to -inf
        # before the fused top-K), so /v1/predict's top-K slots go to
        # listed species; the ServerState.species_allow post-filter stays
        # as the per-request guard for embedded make_server() users.
        builder = builder.species_list(species_wanted)
    try:
        classifier = builder.build()
    except SpeciesListError:
        print(
            f"error: no species in {args.species_list} match the "
            f"model's labels",
            file=sys.stderr,
        )
        return 2
    species_allow = None
    if species_wanted is not None:
        species_allow = set(classifier.allowed_species())
    range_filter = None
    if args.meta_model:
        from ..rangefilter import RangeFilter

        range_filter = (
            RangeFilter.builder()
            .model_path(args.meta_model)
            .from_classifier_labels(classifier.labels)
            .build()
        )
    server = make_server(
        classifier,
        host=args.host,
        port=args.port,
        max_batch=args.max_batch,
        max_wait_ms=args.max_wait_ms,
        max_queue=args.max_queue,
        range_filter=range_filter,
        species_allow=species_allow,
        workers=args.workers,
        verbose=args.verbose,
    )
    if args.warmup:
        # The batcher's fixed-shape executable compiled at construction;
        # compile the streaming/analyze program too by running one tiny
        # silent recording through it (smallest tile bucket), and the
        # per-request species-mask variants (?species= compiles separate
        # executables — without this the first masked request would pay a
        # full XLA compile inside the batcher worker, stalling every
        # queued request behind it).
        print("warming up analyze pipeline...", file=sys.stderr)
        t0 = time.monotonic()
        silent = np.zeros(classifier.config.sample_count, np.int16)
        all_species = np.ones(classifier.config.num_species, bool)
        classifier.analyze_samples(silent)
        classifier.analyze_samples(silent, species_mask=all_species)
        # Both batcher variants: for Perch v2 no BatchInferenceContext is
        # pre-compiled at construction, so the plain (unmasked) predict
        # executable would otherwise first compile inside the worker on the
        # first real request.
        server.state.batcher.predict(silent.astype(np.float32))
        server.state.batcher.predict(
            silent.astype(np.float32), species_mask=all_species
        )
        print(
            f"warmup done in {time.monotonic() - t0:.1f}s", file=sys.stderr
        )
    host, port = server.server_address[:2]
    print(
        f"birdnet-serve: {classifier.config.model_type.name} on "
        f"{classifier.device} — listening on http://{host}:{port} "
        f"(max_batch={args.max_batch}, window={args.max_wait_ms}ms)",
        file=sys.stderr,
    )
    # SIGTERM (the orchestrator's stop signal) drains like Ctrl-C: stop
    # accepting, finish queued work, exit 0.
    import signal

    def _on_sigterm(signum, frame):
        threading.Thread(target=server.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _on_sigterm)
    except ValueError:
        pass  # non-main thread (embedded use)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        print("shutting down (draining queued requests)", file=sys.stderr)
        server.state.close()  # type: ignore[attr-defined]
        server.server_close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
