"""On-device fused postprocess: top-K + sigmoid.

The reference runs an O(n log k) min-heap on the host over 6,522–14,795
logits per segment (reference: src/postprocess.rs:40-87). Here the selection
runs *inside* the jitted model graph with ``jax.lax.top_k``, and sigmoid is
applied only to the K winners — same semantics, but fused with the model so
only ``B×K`` values + indices cross the host boundary (plus the raw logits
when requested for ``PredictionResult.raw_scores`` parity).
"""

from __future__ import annotations

import jax
from jax import lax


def fused_sigmoid_topk(logits: jax.Array, k: int):
    """Per-row top-k of raw logits, sigmoid on the winners.

    ``logits``: [B, N]. Returns (confidences [B, k], indices [B, k]) sorted
    descending by logit — identical order to the host oracle because sigmoid
    is monotonic. NaN logits sort above +inf (XLA top_k uses a total order
    consistent with the reference's ``total_cmp``).
    """
    vals, idx = lax.top_k(logits, k)
    return jax.nn.sigmoid(vals), idx
