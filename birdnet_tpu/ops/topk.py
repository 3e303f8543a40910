"""On-device fused postprocess: top-K + sigmoid.

The reference runs an O(n log k) min-heap on the host over 6,522–14,795
logits per segment (reference: src/postprocess.rs:40-87). Here the selection
runs *inside* the jitted model graph with ``jax.lax.top_k``, and sigmoid is
applied only to the K winners — same semantics, but fused with the model so
only ``B×K`` values + indices cross the host boundary (plus the raw logits
when requested for ``PredictionResult.raw_scores`` parity).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax


def apply_species_mask(logits: jax.Array, mask: Optional[jax.Array]):
    """Mask disallowed species out of top-K selection.

    ``mask``: bool [N] (or None for a no-op), broadcast over the batch.
    Disallowed logits become -inf so they can never enter the top-K
    (sigmoid(-inf) = 0, so any that still surface when K exceeds the
    allowed count carry zero confidence and are dropped host-side).
    This is the BirdNET-ecosystem "species list" semantic: restrict the
    *candidate set* before selection, not the printed output after it.
    """
    if mask is None:
        return logits
    return jnp.where(mask, logits, jnp.array(-jnp.inf, dtype=logits.dtype))


def compose_species_masks(
    logits: jax.Array,
    constant_mask: Optional[jax.Array],
    row_mask: Optional[jax.Array] = None,
):
    """Apply the build-time species mask and an optional runtime mask
    (per-row [B, N] or per-call [N]) to ``logits`` for top-K selection.
    The single composition point for every engine's top-K epilogue."""
    sel = apply_species_mask(logits, constant_mask)
    return apply_species_mask(sel, row_mask)


def fused_sigmoid_topk(
    logits: jax.Array,
    k: int,
    mask: Optional[jax.Array] = None,
    row_mask: Optional[jax.Array] = None,
    idx_dtype=None,
):
    """Per-row top-k of raw logits, sigmoid on the winners.

    ``logits``: [B, N]. Returns (confidences [B, k], indices [B, k]) sorted
    descending by logit — identical order to the host oracle because sigmoid
    is monotonic. NaN logits sort above +inf (XLA top_k uses a total order
    consistent with the reference's ``total_cmp``). ``mask`` (bool [N])
    restricts selection to allowed species (see :func:`apply_species_mask`);
    ``row_mask`` (bool [B, N] or [N]) additionally applies a runtime
    per-request mask. This is THE top-K epilogue — every engine/program
    builder (batched, streaming, sharded) must call it rather than inlining
    the select→top_k→sigmoid chain, so mask semantics can never diverge.
    """
    vals, idx = lax.top_k(compose_species_masks(logits, mask, row_mask), k)
    if idx_dtype is not None:
        idx = idx.astype(idx_dtype)
    return jax.nn.sigmoid(vals), idx
