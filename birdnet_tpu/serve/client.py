"""Python client for the ``birdnet-serve`` HTTP API.

Stdlib-only (urllib). Mirrors the library's own return types where it
matters: ``predict`` returns a list of :class:`~birdnet_tpu.types.Prediction`
and ``analyze`` a list of ``(start_time, [Prediction, ...])`` — so code
written against :class:`~birdnet_tpu.classifier.Classifier` can switch to a
remote server by swapping the object.

    client = ServeClient("http://tpu-host:8439")
    preds = client.predict(segment)                    # [Prediction, ...]
    dets = client.analyze_wav("recording.wav")         # [(t, [Prediction])]

Server-side errors re-raise as the matching exception from
:mod:`birdnet_tpu.errors` when the ``error`` field names one (the server
sends the taxonomy name + display string), else :class:`ServeError`.
"""

from __future__ import annotations

import base64
import json
import urllib.error
import urllib.parse
import urllib.request
from typing import List, Optional, Sequence, Tuple

import numpy as np

from .. import errors as _errors
from ..types import LocationScore, Prediction


class ServeError(Exception):
    """Server returned an error the client can't map to the taxonomy."""

    def __init__(self, status: int, error: str, message: str):
        super().__init__(f"{error} (HTTP {status}): {message}")
        self.status = status
        self.error = error
        self.message = message


def _raise_for(status: int, payload: dict) -> None:
    name = payload.get("error", "ServeError")
    message = payload.get("message", "")
    exc_type = getattr(_errors, name, None)
    if isinstance(exc_type, type) and issubclass(
        exc_type, _errors.BirdnetError
    ):
        # Re-raise as the exact taxonomy type with the exact server display
        # string. Constructors are structured (e.g. InputSizeError(expected,
        # got)) and only the formatted message crosses the wire, so bypass
        # __init__: isinstance checks and str(e) both match a local raise;
        # structured attributes (.expected, ...) are absent on client-side
        # re-raises.
        exc = exc_type.__new__(exc_type)
        Exception.__init__(exc, message)
        exc.http_status = status
        raise exc
    raise ServeError(status, name, message)


def _to_i16_pcm(samples) -> np.ndarray:
    """int16 passthrough; float samples in [-1, 1) clip-scale to i16 (the
    single conversion point for every recording-upload method)."""
    arr = np.asarray(samples)
    if arr.dtype == np.int16:
        return arr
    return (
        np.clip(np.asarray(arr, np.float32), -1.0, 1.0 - 1.0 / 32768)
        * 32768.0
    ).astype(np.int16)


class ServeClient:
    """Client for one ``birdnet-serve`` endpoint."""

    def __init__(self, base_url: str, timeout: float = 300.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    # -- plumbing -----------------------------------------------------------

    def _request(
        self,
        path: str,
        body: Optional[bytes] = None,
        content_type: str = "application/octet-stream",
        params: Optional[dict] = None,
    ) -> dict:
        url = self.base_url + path
        if params:
            url += "?" + urllib.parse.urlencode(
                {k: v for k, v in params.items() if v is not None}
            )
        req = urllib.request.Request(
            url,
            data=body,
            headers={"Content-Type": content_type} if body else {},
        )
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as r:
                return json.loads(r.read().decode())
        except urllib.error.HTTPError as e:
            try:
                payload = json.loads(e.read().decode())
            except Exception:  # noqa: BLE001 - non-JSON error body
                raise ServeError(e.code, "HTTPError", str(e)) from None
            _raise_for(e.code, payload)

    @staticmethod
    def _preds(items: Sequence[dict]) -> List[Prediction]:
        return [
            Prediction(
                species=d["species"],
                confidence=d["confidence"],
                index=d["index"],
            )
            for d in items
        ]

    # -- API ----------------------------------------------------------------

    def health(self) -> dict:
        return self._request("/v1/health")

    def info(self) -> dict:
        return self._request("/v1/info")

    def labels(self) -> List[str]:
        return self._request("/v1/labels")["labels"]

    def metrics(self) -> dict:
        return self._request("/v1/metrics")

    def predict(
        self,
        segment,
        min_confidence: Optional[float] = None,
        lat: Optional[float] = None,
        lon: Optional[float] = None,
        date: Optional[str] = None,
        rerank: bool = False,
        embeddings: bool = False,
        species: Optional[Sequence[str]] = None,
    ):
        """Classify one segment. float32 ships as raw f32 PCM, int16 as raw
        i16 (half the bytes). Returns ``[Prediction, ...]`` — or
        ``(predictions, embeddings)`` when ``embeddings=True``.

        ``species``: per-request species list — the server restricts the
        top-K *candidate set* to these names (full ``Scientific_Common``
        labels or either half) before selection."""
        seg = np.asarray(segment)
        if seg.dtype == np.int16:
            body, dtype = seg.astype("<i2").tobytes(), "i16"
        else:
            body, dtype = (
                seg.astype("<f4", copy=False).tobytes(),
                "f32",
            )
        params = {
            "dtype": dtype,
            "min_confidence": min_confidence,
            "lat": lat,
            "lon": lon,
            "date": date,
        }
        if species:
            params["species"] = ",".join(species)
        if rerank:
            params["rerank"] = 1
        if embeddings:
            params["embeddings"] = 1
        out = self._request("/v1/predict", body=body, params=params)
        preds = self._preds(out["predictions"])
        if embeddings:
            emb = None
            if "embeddings_b64" in out:
                emb = np.frombuffer(
                    base64.b64decode(out["embeddings_b64"]), dtype=np.float32
                )
            return preds, emb
        return preds

    def analyze(
        self,
        samples,
        rate: int,
        overlap: float = 0.0,
        min_confidence: Optional[float] = None,
        lat: Optional[float] = None,
        lon: Optional[float] = None,
        date: Optional[str] = None,
        rerank: bool = False,
        resample: bool = False,
        species: Optional[Sequence[str]] = None,
    ) -> List[Tuple[float, List[Prediction]]]:
        """Analyze a whole recording given as samples (int16 or float in
        [-1, 1)). Returns ``[(start_time, [Prediction, ...]), ...]``.
        ``species``: per-request candidate restriction (see
        :meth:`predict`)."""
        arr = _to_i16_pcm(samples)
        params = {
            "rate": rate,
            "overlap": overlap or None,
            "min_confidence": min_confidence,
            "lat": lat,
            "lon": lon,
            "date": date,
            "species": ",".join(species) if species else None,
        }
        if rerank:
            params["rerank"] = 1
        if resample:
            params["resample"] = 1
        out = self._request(
            "/v1/analyze", body=arr.astype("<i2").tobytes(), params=params
        )
        return [
            (d["start_time"], self._preds(d["predictions"]))
            for d in out["detections"]
        ]

    def analyze_wav(self, path, **kwargs) -> List[Tuple[float, List[Prediction]]]:
        """Upload a WAV file for analysis (same validation as the CLI).
        Accepts the :meth:`analyze` keyword options (overlap,
        min_confidence, lat/lon/date, rerank, resample)."""
        with open(path, "rb") as f:
            body = f.read()
        params = {}
        for k, v in kwargs.items():
            if v is None or v is False:
                continue
            if k == "species" and not isinstance(v, str):
                v = ",".join(v)
            # flags must wire-encode as "1" (the server matches "1"/"true",
            # not Python's str(True))
            params[k] = 1 if v is True else v
        out = self._request("/v1/analyze", body=body, params=params or None)
        return [
            (d["start_time"], self._preds(d["predictions"]))
            for d in out["detections"]
        ]

    def embed(
        self,
        samples,
        rate: int,
        overlap: float = 0.0,
        resample: bool = False,
    ):
        """Bulk embedding extraction over a whole recording (v3.0/Perch —
        the primary Perch workflow). Returns ``(embeddings [N, E] float32,
        start_times [N])``."""
        import base64

        arr = _to_i16_pcm(samples)
        params = {"rate": rate, "overlap": overlap or None}
        if resample:
            params["resample"] = 1
        out = self._request(
            "/v1/embed", body=arr.astype("<i2").tobytes(), params=params
        )
        emb = np.frombuffer(
            base64.b64decode(out["embeddings_b64"]), dtype=np.float32
        ).reshape(out["segments"], out["embedding_dim"])
        return emb, list(out["start_times"])

    def rangefilter(
        self, lat: float, lon: float, date: Optional[str] = None
    ) -> List[LocationScore]:
        out = self._request(
            "/v1/rangefilter", params={"lat": lat, "lon": lon, "date": date}
        )
        return [
            LocationScore(
                species=s["species"], score=s["score"], index=s["index"]
            )
            for s in out["scores"]
        ]
