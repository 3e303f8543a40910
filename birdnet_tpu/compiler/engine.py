"""Inference engine: compiled executables, batch bucketing, fused postprocess.

This is the TPU-native replacement for the reference's ``ort::Session`` +
``IoBinding`` execution layer (reference: src/classifier.rs:637-639,
src/batch_context.rs). Key design points:

- **One XLA program per batch bucket.** XLA requires static shapes; arbitrary
  batch sizes are padded up to the nearest power-of-two bucket so any B ≤
  max_batch runs without a recompile storm (the reference tolerates any B;
  so do we, at the cost of ≤2× padded compute on odd sizes).
- **Fused postprocess.** ``lax.top_k`` + sigmoid run inside the same XLA
  program as the model, so the per-call host transfer is B×K confidences +
  indices (+ logits/embeddings when the caller wants them).
- **AOT compile outside the timed path.** Compilation happens on first use of
  a bucket (or eagerly via ``warmup``), never inside the timeout-monitored
  inference wait — mirroring how the reference's TensorRT engine build
  happens at session creation, not inside ``run``.
- **Donation.** Batch-context mode donates the input buffer to XLA so the
  padded [max_B, S] staging array's HBM is reused across calls (the
  IoBinding pre-allocated buffer analog).
- **No session mutex.** JAX dispatch is thread-safe; only the executable
  cache is locked. Concurrent ``predict`` calls actually overlap, unlike the
  reference's serializing ``Mutex<Session>`` (classifier.rs:434-449).
"""

from __future__ import annotations

import threading
import time
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..errors import (
    InferenceCancelledError,
    InferenceError,
    InferenceTimeoutError,
)
from ..inference_options import InferenceOptions
from ..types import ModelConfig
from .importer import ImportedModel, make_forward

from .._demux import demux_indices

_MONITOR_POLL_S = 0.01  # 10 ms poll, matching the reference monitor thread
                        # (reference: src/classifier.rs:527-554)


def _bucket(b: int) -> int:
    """Next power-of-two ≥ b."""
    return 1 << (b - 1).bit_length() if b > 1 else 1


class InferenceEngine:
    """Compiled model + postprocess, with per-bucket executables."""

    def __init__(
        self,
        imported: ImportedModel,
        config: ModelConfig,
        device=None,
        precision: Optional[str] = None,
        top_k: int = 10,
        species_mask: Optional[np.ndarray] = None,
    ):
        from ..runtime import default_device, init_runtime

        init_runtime()
        self.device = device if device is not None else default_device()
        if precision is None:
            precision = "mixed" if self.device.platform in ("tpu", "axon") else "fp32"
        self.precision = precision
        self.config = config
        self.top_k = max(0, min(top_k, config.num_species))
        # Optional species-list restriction: bool [num_species], compiled
        # into the program as a constant -inf mask before top-K.
        self.species_mask = (
            None if species_mask is None else np.asarray(species_mask, bool)
        )
        self._forward = make_forward(imported, precision=precision)
        self.params = jax.device_put(imported.params, self.device)
        # key: (bucket, with_embeddings, donate, with_row_mask)
        self._compiled: Dict[Tuple[int, bool, bool, bool], object] = {}
        self._lock = threading.Lock()
        self.logits_index, self.embed_index = demux_indices(config.model_type)
        if self.logits_index >= imported.num_outputs:
            raise InferenceError(
                f"model has {imported.num_outputs} outputs; expected logits at "
                f"index {self.logits_index}"
            )
        if self.embed_index is not None and self.embed_index >= imported.num_outputs:
            raise InferenceError(
                f"model has {imported.num_outputs} outputs; expected "
                f"embeddings at index {self.embed_index}"
            )

    # -- program construction ------------------------------------------------

    def _program(self, with_embeddings: bool, with_row_mask: bool = False):
        """The full fused program: model forward → top-k → sigmoid.

        ``with_row_mask`` compiles a variant taking a per-row bool
        ``[B, num_species]`` candidate mask (per-request species lists in
        the serving tier); it composes with the build-time
        ``species_mask`` constant.
        """
        k = self.top_k
        logits_index = self.logits_index
        embed_index = self.embed_index
        forward = self._forward
        mask = (
            None if self.species_mask is None else jnp.asarray(self.species_mask)
        )

        def select(logits, row_mask):
            from ..ops.topk import fused_sigmoid_topk

            if k > 0:
                return fused_sigmoid_topk(logits, k, mask, row_mask)
            b = logits.shape[0]
            return (
                jnp.zeros((b, 0), dtype=logits.dtype),
                jnp.zeros((b, 0), dtype=jnp.int32),
            )

        def finish(outs, row_mask):
            logits = outs[logits_index]
            conf, idx = select(logits, row_mask)
            emb = (
                outs[embed_index]
                if (with_embeddings and embed_index is not None)
                else None
            )
            return conf, idx, logits, emb

        if with_row_mask:
            def program(params, x, row_mask):
                return finish(forward(params, x), row_mask)
        else:
            def program(params, x):
                return finish(forward(params, x), None)

        return program

    def compiled(
        self,
        bucket: int,
        with_embeddings: bool = True,
        donate: bool = False,
        with_row_mask: bool = False,
    ):
        """AOT-compiled executable for a batch bucket (cached).

        ``donate`` hands the input buffer's HBM to XLA for reuse — the
        batch-context/IoBinding path (reference: batch_context.rs:231-270).
        ``with_row_mask`` compiles the per-row species-mask variant.
        """
        key = (bucket, with_embeddings, donate, with_row_mask)
        fn = self._compiled.get(key)
        if fn is not None:
            return fn
        with self._lock:
            fn = self._compiled.get(key)
            if fn is not None:
                return fn
            program = self._program(with_embeddings, with_row_mask)
            jitted = jax.jit(program, donate_argnums=(1,) if donate else ())
            sharding = jax.sharding.SingleDeviceSharding(self.device)
            x_spec = jax.ShapeDtypeStruct(
                (bucket, self.config.sample_count), jnp.float32, sharding=sharding
            )
            params_spec = jax.tree.map(
                lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype, sharding=sharding),
                self.params,
            )
            specs = (params_spec, x_spec)
            if with_row_mask:
                specs = specs + (
                    jax.ShapeDtypeStruct(
                        (bucket, self.config.num_species), jnp.bool_,
                        sharding=sharding,
                    ),
                )
            try:
                import warnings

                with warnings.catch_warnings():
                    # The input buffer can't alias the (differently-shaped)
                    # outputs; donation still lets XLA reuse its HBM for
                    # intermediates, so the "not usable" warning is expected.
                    warnings.filterwarnings(
                        "ignore", message="Some donated buffers were not usable"
                    )
                    fn = jitted.lower(*specs).compile()
            except Exception as e:  # noqa: BLE001
                raise InferenceError(f"XLA compilation failed: {e}") from e
            self._compiled[key] = fn
            return fn

    def warmup(self, batch_sizes=(1,)) -> None:
        """Pre-compile executables (the TRT-engine-build analog)."""
        for b in batch_sizes:
            self.compiled(_bucket(b))

    # -- execution -------------------------------------------------------

    def run_batch(
        self,
        segments: np.ndarray,
        options: Optional[InferenceOptions] = None,
        with_embeddings: bool = True,
        bucket: Optional[int] = None,
        donate: bool = False,
        row_masks: Optional[np.ndarray] = None,
        n_valid: Optional[int] = None,
    ):
        """Run a [B, S] float32 batch. Returns numpy
        (conf [B,k], idx [B,k], logits [B,N], embeddings [B,E] or None).

        Pads B up to the bucket; compilation happens before the timeout
        clock starts. ``row_masks``: optional per-row bool
        [n_valid, num_species] candidate masks (per-request species
        lists). ``n_valid``: true row count when ``segments`` arrives
        already padded (batch-context staging buffers) — this method is
        the single owner of pad-row mask semantics (padded rows get
        all-True masks) and of slicing results back to real rows.
        """
        b = n_valid if n_valid is not None else segments.shape[0]
        bkt = bucket if bucket is not None else _bucket(b)
        fn = self.compiled(  # outside timed region
            bkt, with_embeddings, donate, with_row_mask=row_masks is not None
        )
        if segments.shape[0] < bkt:
            pad = np.zeros(
                (bkt - segments.shape[0], segments.shape[1]), dtype=np.float32
            )
            segments = np.concatenate([segments, pad], axis=0)
        try:
            x = jax.device_put(segments, self.device)
            if row_masks is not None:
                rows = np.ones((bkt, self.config.num_species), dtype=bool)
                rows[:b] = row_masks
                conf, idx, logits, emb = fn(
                    self.params, x, jax.device_put(rows, self.device)
                )
            else:
                conf, idx, logits, emb = fn(self.params, x)
            results = [r for r in (conf, idx, logits, emb) if r is not None]
            _wait(results, options)
        except (InferenceCancelledError, InferenceTimeoutError):
            raise
        except Exception as e:  # noqa: BLE001 - XLA runtime failures (OOM, …)
            raise InferenceError(str(e)) from e
        conf = np.asarray(conf)[:b]
        idx = np.asarray(idx)[:b]
        logits = np.asarray(logits)[:b]
        emb_np = np.asarray(emb)[:b] if emb is not None else None
        return conf, idx, logits, emb_np


def _wait(arrays, options: Optional[InferenceOptions]) -> None:
    """Block until device results are ready, honoring timeout/cancellation.

    XLA cannot terminate a launched program (unlike
    ``ort::RunOptions::terminate``, reference: src/classifier.rs:539-547);
    on timeout/cancel the wait is abandoned and the device work completes in
    the background — observably equivalent error behavior.
    """
    if options is None or not options.needs_monitor():
        for a in arrays:
            jax.block_until_ready(a)
        return

    token = options.cancellation_token
    # A non-positive timeout is an already-expired deadline → immediate
    # timeout below (never "no deadline").
    deadline = (
        time.monotonic() + options.timeout
        if options.timeout is not None
        else None
    )
    if token is not None and token.is_cancelled():
        raise InferenceCancelledError()
    if deadline is not None and options.timeout <= 0:
        raise InferenceTimeoutError(options.timeout)
    while True:
        if all(a.is_ready() for a in arrays):
            for a in arrays:
                jax.block_until_ready(a)
            return
        if token is not None and token.is_cancelled():
            raise InferenceCancelledError()
        if deadline is not None and time.monotonic() > deadline:
            raise InferenceTimeoutError(options.timeout)
        time.sleep(_MONITOR_POLL_S)
