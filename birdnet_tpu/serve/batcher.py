"""Dynamic request batching for production serving.

The reference is a library embedded in a caller's process; its only
concurrency story is "``Classifier`` is ``Send + Sync`` behind a session
mutex" (reference: src/classifier.rs:434-449), so concurrent callers
*serialize* and each pays a full single-segment dispatch. For a serving
deployment that wastes the accelerator: on TPU a batch-128 dispatch costs
barely more than a batch-1 dispatch (MXU utilization comes from the batch
dimension — docs/performance.md).

``DynamicBatcher`` is the TPU-native serving scheduler: concurrent
``predict`` requests from many client threads coalesce into one fixed-shape
device batch. A worker thread collects requests until the batch is full or
the oldest request has waited ``max_wait_ms``, pads the batch to the
compiled shape, runs it through the zero-allocation
:class:`~birdnet_tpu.batch_context.BatchInferenceContext` (donated HBM
buffers — batch_context.rs:122 analog), and distributes per-request results
through futures. One compiled executable, constant memory, no recompile
storms — the continuous-batching pattern inference servers use, built on
the same primitives the library already exposes.

Latency/throughput knobs:
- ``max_batch``: the compiled batch shape (default 32, the reference CLI's
  accelerator default — birdnet-analyze.rs:39-42).
- ``max_wait_ms``: how long the first request in a batch may wait for
  company (default 5 ms). 0 disables coalescing delay: each wakeup takes
  whatever is queued right now.
"""

from __future__ import annotations

import collections
import threading
import time
from concurrent.futures import Future
from typing import List, Optional

import numpy as np

from ..errors import InferenceError, InputSizeError
from ..types import ModelType, PredictionResult


class BatcherMetrics:
    """Thread-safe serving counters + latency percentiles.

    Latencies are kept in a bounded ring of the most recent ``window``
    request latencies (submit → result), from which p50/p95/p99 are
    computed on demand — the observability surface the reference keeps in
    its CLI summary lines (birdnet-analyze.rs:637-647), lifted to a
    long-running server.
    """

    def __init__(self, window: int = 2048):
        self._lock = threading.Lock()
        self._latencies = collections.deque(maxlen=window)
        self.requests_total = 0
        self.segments_total = 0
        self.batches_total = 0
        self.rejected_total = 0
        self.errors_total = 0
        self._batch_fill_sum = 0

    def reset(self) -> None:
        """Zero all counters/latencies — e.g. after warmup traffic, so a
        measurement window reflects only its own requests."""
        with self._lock:
            self._latencies.clear()
            self.requests_total = 0
            self.segments_total = 0
            self.batches_total = 0
            self.rejected_total = 0
            self.errors_total = 0
            self._batch_fill_sum = 0

    def record_batch(self, fill: int) -> None:
        with self._lock:
            self.batches_total += 1
            self.segments_total += fill
            self._batch_fill_sum += fill

    def record_request(self) -> None:
        with self._lock:
            self.requests_total += 1

    def record_rejected(self) -> None:
        with self._lock:
            self.rejected_total += 1

    def record_error(self) -> None:
        with self._lock:
            self.errors_total += 1

    def record_latency(self, seconds: float) -> None:
        with self._lock:
            self._latencies.append(seconds)

    def snapshot(self) -> dict:
        with self._lock:
            lats = sorted(self._latencies)
            fill = (
                self._batch_fill_sum / self.batches_total
                if self.batches_total
                else 0.0
            )

            def pct(p: float) -> Optional[float]:
                if not lats:
                    return None
                return lats[min(len(lats) - 1, int(p * len(lats)))]

            return {
                "requests_total": self.requests_total,
                "segments_total": self.segments_total,
                "batches_total": self.batches_total,
                "rejected_total": self.rejected_total,
                "errors_total": self.errors_total,
                "mean_batch_fill": round(fill, 2),
                "latency_p50_ms": _ms(pct(0.50)),
                "latency_p95_ms": _ms(pct(0.95)),
                "latency_p99_ms": _ms(pct(0.99)),
            }


def _resolve_future(fut: Future, result=None, exception=None) -> None:
    """Resolve a caller-visible Future without racing its cancel().

    ``submit`` hands callers a bare Future, so ``fut.cancel()`` succeeds any
    time before resolution. Transitioning PENDING→RUNNING first makes the
    subsequent set_result/set_exception race-free; the InvalidStateError
    guard covers a cancel that wins the transition itself. Without this, a
    caller cancelling between the cancelled() check and set_result() would
    raise out of the worker loop and kill the batcher thread for good.
    """
    try:
        if not fut.set_running_or_notify_cancel():
            return  # caller cancelled; nothing to deliver
        if exception is not None:
            fut.set_exception(exception)
        else:
            fut.set_result(result)
    except Exception:  # InvalidStateError under any remaining interleaving
        pass


def _ms(v: Optional[float]) -> Optional[float]:
    return None if v is None else round(v * 1000.0, 3)


class _Pending:
    __slots__ = ("segment", "future", "t_submit", "species_mask")

    def __init__(self, segment: np.ndarray, species_mask=None):
        self.segment = segment
        self.future: Future = Future()
        self.t_submit = time.monotonic()
        self.species_mask = species_mask


class DynamicBatcher:
    """Coalesce concurrent single-segment requests into device batches."""

    def __init__(
        self,
        classifier,
        max_batch: int = 32,
        max_wait_ms: float = 5.0,
        max_queue: int = 4096,
        workers: int = 1,
    ):
        """``workers`` > 1 runs that many batch pipelines (each with its
        own buffer context) against the shared queue: while one worker's
        batch computes on the device, another stages/reads back — host
        work overlaps device work. The device itself serializes
        executions, so >2 rarely helps; measure with
        scripts/serve_bench.py --workers."""
        if max_batch < 1:
            raise InferenceError("max_batch must be >= 1")
        if workers < 1:
            raise InferenceError("workers must be >= 1")
        self._classifier = classifier
        self._max_batch = int(max_batch)
        self._max_wait = max(0.0, float(max_wait_ms)) / 1000.0
        self._max_queue = int(max_queue)
        self.metrics = BatcherMetrics()

        # Perch v2 has no BatchInferenceContext (reference quirk preserved,
        # batch_context.rs:107-114); the batcher pads to max_batch itself so
        # the predict_batch path still compiles exactly one shape.
        self._contexts: collections.deque = collections.deque()
        if classifier.model_type is not ModelType.PERCH_V2:
            for _ in range(int(workers)):
                self._contexts.append(
                    classifier.create_batch_context(
                        # Serving accepts ?species= on any request, so both
                        # executables (masked + unmasked) must be warm before
                        # traffic: a compile inside _execute stalls the queue.
                        self._max_batch,
                        precompile_row_mask=True,
                    )
                )
        else:
            self._pad_segment = np.zeros(
                classifier.config.sample_count, np.float32
            )
            self._contexts.extend([None] * int(workers))

        self._queue: collections.deque[_Pending] = collections.deque()
        self._cond = threading.Condition()
        self._closed = False
        self._workers = [
            threading.Thread(
                target=self._run,
                args=(self._contexts[i],),
                name=f"birdnet-batcher-{i}",
                daemon=True,
            )
            for i in range(int(workers))
        ]
        for w in self._workers:
            w.start()

    # -- client side --------------------------------------------------------

    @property
    def max_batch(self) -> int:
        return self._max_batch

    def queue_depth(self) -> int:
        with self._cond:
            return len(self._queue)

    def submit(self, segment, species_mask=None) -> "Future[PredictionResult]":
        """Enqueue one segment; returns a future resolving to its
        :class:`PredictionResult`.

        Size validation happens *here*, in the caller's thread, so one
        malformed request fails fast with the reference's ``InputSize``
        error (classifier.rs:612-618) instead of poisoning a whole batch.

        ``species_mask``: optional bool [num_species] per-request
        candidate mask — requests with different masks still coalesce
        into one device batch (the compiled program takes a per-row mask
        input).
        """
        seg = np.asarray(segment, dtype=np.float32).reshape(-1)
        expected = self._classifier.config.sample_count
        if seg.shape[0] != expected:
            raise InputSizeError(expected=expected, got=seg.shape[0])
        if species_mask is not None:
            species_mask = np.asarray(species_mask, dtype=bool).reshape(-1)
            if species_mask.shape[0] != self._classifier.config.num_species:
                # caller error, like the segment-size check above (maps to
                # HTTP 400, not 500)
                raise InputSizeError(
                    expected=self._classifier.config.num_species,
                    got=int(species_mask.shape[0]),
                )
        item = _Pending(seg, species_mask)
        with self._cond:
            if self._closed:
                raise InferenceError("batcher is closed")
            if len(self._queue) >= self._max_queue:
                self.metrics.record_rejected()
                raise InferenceError(
                    f"server overloaded: request queue full "
                    f"({self._max_queue} pending)"
                )
            self._queue.append(item)
            self._cond.notify()
        self.metrics.record_request()
        return item.future

    def predict(self, segment, timeout: Optional[float] = None,
                species_mask=None):
        """Blocking convenience wrapper: ``submit`` + wait."""
        return self.submit(segment, species_mask).result(timeout=timeout)

    def close(self, drain: bool = True) -> None:
        """Stop the worker. With ``drain`` (default) queued requests finish
        first; otherwise they fail with :class:`InferenceError`."""
        with self._cond:
            if self._closed:
                return
            self._closed = True
            if not drain:
                while self._queue:
                    item = self._queue.popleft()
                    item.future.set_exception(
                        InferenceError("batcher closed before execution")
                    )
            self._cond.notify_all()
        for w in self._workers:
            w.join()

    def __enter__(self) -> "DynamicBatcher":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # -- worker side --------------------------------------------------------

    def _collect(self) -> List[_Pending]:
        """Take one batch from the queue: block for the first request, then
        wait up to ``max_wait`` (measured from that request's submit time)
        for the batch to fill."""
        with self._cond:
            while not self._queue and not self._closed:
                self._cond.wait()
            if not self._queue:
                return []  # closed and drained
            batch = [self._queue.popleft()]
            deadline = batch[0].t_submit + self._max_wait
            while len(batch) < self._max_batch:
                while self._queue and len(batch) < self._max_batch:
                    batch.append(self._queue.popleft())
                if len(batch) >= self._max_batch or self._closed:
                    break
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cond.wait(timeout=remaining)
            return batch

    def _run(self, ctx) -> None:
        while True:
            batch = self._collect()
            if not batch:
                return
            self._execute(batch, ctx)

    def _execute(self, batch: List[_Pending], ctx) -> None:
        segments = [p.segment for p in batch]
        rows = None
        if any(p.species_mask is not None for p in batch):
            n = self._classifier.config.num_species
            rows = np.ones((len(batch), n), dtype=bool)
            for i, p in enumerate(batch):
                if p.species_mask is not None:
                    rows[i] = p.species_mask
        try:
            if ctx is not None:
                results = self._classifier.predict_batch_with_context(
                    ctx, segments, species_masks=rows
                )
            else:
                # Perch: pad to the compiled shape, slice real results.
                padded = segments + [self._pad_segment] * (
                    self._max_batch - len(segments)
                )
                padded_rows = rows
                if rows is not None and len(padded) > len(segments):
                    padded_rows = np.ones((len(padded), rows.shape[1]), bool)
                    padded_rows[: len(segments)] = rows
                results = self._classifier.predict_batch(
                    padded, species_masks=padded_rows
                )[: len(segments)]
        except Exception as e:  # device/runtime failure → every caller
            self.metrics.record_error()
            for p in batch:
                _resolve_future(p.future, exception=e)
            return
        self.metrics.record_batch(len(batch))
        now = time.monotonic()
        for p, r in zip(batch, results):
            self.metrics.record_latency(now - p.t_submit)
            _resolve_future(p.future, result=r)
