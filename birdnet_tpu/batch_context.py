"""Buffer-reusing batch inference context.

The reference's ``BatchInferenceContext`` wraps an ONNX Runtime IoBinding
with a pre-allocated host input buffer so repeated batches run with zero
allocation (reference: src/batch_context.rs:69-122). The TPU-native
equivalent:

- a pair of pinned host staging buffers of ``max_batch × sample_count``
  float32 used alternately (the ``input_buffer`` analog,
  batch_context.rs:122 — double-buffered so no per-call host allocation
  happens: the buffer handed to the device for call N is not refilled
  until call N+2, by which time its results have been read back);
- a fixed-shape XLA executable at ``[max_batch, S]`` with the input buffer
  *donated* to XLA, so its HBM is reused across calls (the
  bind-outputs-to-device analog, batch_context.rs:231-270);
- short batches are padded to ``max_batch`` and results sliced, keeping one
  executable and constant memory — no recompile storm for ragged tails.

Reference quirks preserved: Perch v2 rejected (batch_context.rs:107-114),
batch-exceeds-max error (batch_context.rs:191-196), per-segment size errors
with index (batch_context.rs:198-206), and the buffer-introspection API
(batch_context.rs:147-159).
"""

from __future__ import annotations

from typing import List, Tuple

import numpy as np

from .errors import BatchInputSizeError, InferenceError
from .types import ModelConfig, ModelType


class BatchInferenceContext:
    """Pre-allocated buffers for repeated batched inference."""

    def __init__(
        self,
        engine,
        config: ModelConfig,
        max_batch_size: int,
        precompile_row_mask: bool = False,
    ):
        if config.model_type is ModelType.PERCH_V2:
            raise InferenceError(
                "BatchInferenceContext does not yet support PerchV2 models. "
                "Use predict_batch() instead."
            )
        if max_batch_size < 1:
            raise InferenceError("max_batch_size must be >= 1")
        self._engine = engine
        self._config = config
        self._max_batch_size = int(max_batch_size)
        # Double-buffered staging: zero per-call allocation (the reference's
        # IoBinding exists precisely to avoid per-call allocation,
        # batch_context.rs:122, :188-226). predict_batch_with_context reads
        # results back before returning, so a buffer is never refilled while
        # its device copy is still in use.
        self._buffers = (
            np.zeros((self._max_batch_size, config.sample_count), np.float32),
            np.zeros((self._max_batch_size, config.sample_count), np.float32),
        )
        self._active = 0
        self.donate = True
        # Pre-compile the fixed-shape donated executable now, so the first
        # timed batch doesn't pay compilation (TRT engine-build analog).
        engine.compiled(
            self._max_batch_size,
            with_embeddings=config.model_type is not ModelType.BIRDNET_V24,
            donate=True,
        )
        if precompile_row_mask:
            # Serving passes per-request species masks, which use a second
            # executable (extra [B, N] bool input). Without this, the first
            # masked request compiles inside the batcher worker, stalling
            # everything queued behind it.
            engine.compiled(
                self._max_batch_size,
                with_embeddings=config.model_type is not ModelType.BIRDNET_V24,
                donate=True,
                with_row_mask=True,
            )

    # -- introspection (batch_context.rs:147-159 analog) -------------------

    @property
    def max_batch_size(self) -> int:
        return self._max_batch_size

    def input_buffer_bytes(self) -> int:
        return int(self._buffers[0].nbytes)

    def output_buffer_bytes(self) -> int:
        logits = self._max_batch_size * self._config.num_species * 4
        emb = (
            self._max_batch_size * (self._config.embedding_dim or 0) * 4
        )
        topk = self._max_batch_size * self._engine.top_k * 8
        return logits + emb + topk

    def total_buffer_bytes(self) -> int:
        return self.input_buffer_bytes() + self.output_buffer_bytes()

    # -- input staging -------------------------------------------------------

    def prepare_input(self, segments) -> Tuple[np.ndarray, int]:
        """Validate + copy segments into the active staging buffer
        (reference: batch_context.rs:188-226). Returns (the padded staging
        buffer itself — no copy is made — and the actual batch size).

        The two staging buffers alternate across calls, so the array handed
        to the device on one call is not touched again until two calls
        later; by then its results have been read back to host."""
        segs: List[np.ndarray] = [
            np.asarray(s, dtype=np.float32).reshape(-1) for s in segments
        ]
        b = len(segs)
        if b > self._max_batch_size:
            raise InferenceError(
                f"batch size {b} exceeds context max {self._max_batch_size}"
            )
        sample_count = self._config.sample_count
        buf = self._buffers[self._active]
        self._active ^= 1
        for i, s in enumerate(segs):
            if s.shape[0] != sample_count:
                raise BatchInputSizeError(
                    index=i, expected=sample_count, got=s.shape[0]
                )
            buf[i, :] = s
        if b < self._max_batch_size:
            buf[b:, :] = 0.0
        return buf, b

    def clear_inputs(self) -> None:
        """Zero the staging buffers (reference: batch_context.rs:284-286)."""
        for buf in self._buffers:
            buf[:] = 0.0
