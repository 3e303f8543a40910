"""Prediction post-processing: top-K selection with sigmoid.

Host (numpy) reference implementation mirroring reference src/postprocess.rs:
- top-K selected over the *raw logits* (postprocess.rs:52-60);
- sigmoid applied only to the K winners (postprocess.rs:62-66);
- missing label → ``unknown_{index}`` (postprocess.rs:69-71);
- optional min-confidence filter on the sigmoided values (postprocess.rs:76);
- result sorted by confidence descending (postprocess.rs:80-84);
- NaN-safe: NaN logits order like Rust's ``total_cmp`` (NaN above +inf), and a
  NaN confidence never passes a min-confidence filter.

The on-device fused equivalent (``jax.lax.top_k`` + sigmoid inside the jitted
model graph) lives in :mod:`birdnet_tpu.ops.topk`; this module is the
semantics oracle it is tested against.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np

from .types import Prediction


def sigmoid(x: float) -> float:
    """Logistic sigmoid (reference: postprocess.rs:90-93)."""
    if math.isnan(x):
        return float("nan")
    if x >= 0:
        return 1.0 / (1.0 + math.exp(-x))
    # Numerically stable for large negative x.
    e = math.exp(x)
    return e / (1.0 + e)


def top_k_predictions(
    logits: Sequence[float],
    labels: Sequence[str],
    top_k: int,
    min_confidence: Optional[float] = None,
) -> List[Prediction]:
    """Select top-K predictions with sigmoid activation
    (reference: postprocess.rs:40-87)."""
    logits = np.asarray(logits, dtype=np.float32)
    n = logits.shape[0]
    if n == 0 or top_k <= 0:
        return []

    k = min(top_k, n)

    # np.argpartition/argsort treat NaN as the largest value, matching Rust
    # total_cmp ordering for (positive-bit-pattern) NaN above +inf.
    if k < n:
        part = np.argpartition(logits, n - k)[n - k:]
    else:
        part = np.arange(n)
    order = part[np.argsort(logits[part])[::-1]]

    predictions: List[Prediction] = []
    for idx in order.tolist():
        score = float(logits[idx])
        confidence = sigmoid(score)
        if min_confidence is not None and not (confidence >= min_confidence):
            continue
        species = (
            labels[idx] if idx < len(labels) else f"unknown_{idx}"
        )
        predictions.append(Prediction(species=species, confidence=confidence, index=idx))

    # Already ordered by logit desc; sigmoid is monotonic, but re-sort to
    # guarantee the documented confidence-descending contract. NaN sorts
    # FIRST (total_cmp: NaN above +inf), matching the device path exactly —
    # lax.top_k uses the same total order, and top_k_from_device preserves
    # device order — so both paths agree element-for-element on NaN inputs.
    predictions.sort(
        key=lambda p: (-p.confidence if not math.isnan(p.confidence) else -math.inf)
    )
    return predictions


def top_k_from_device(
    values: np.ndarray,
    indices: np.ndarray,
    labels: Sequence[str],
    min_confidence: Optional[float] = None,
) -> List[Prediction]:
    """Build predictions from device-computed (sigmoided values, indices).

    The device path (ops/topk.py) returns confidence-sorted top-K per row;
    this applies the host-side label join + min-confidence filter with the
    same semantics as :func:`top_k_predictions`.
    """
    predictions: List[Prediction] = []
    for val, idx in zip(values.tolist(), indices.tolist()):
        if min_confidence is not None and not (val >= min_confidence):
            continue
        species = labels[idx] if idx < len(labels) else f"unknown_{idx}"
        predictions.append(Prediction(species=species, confidence=float(val), index=int(idx)))
    return predictions
