"""Output-index demux per model type (reference: src/classifier.rs:914-950).

BirdNET v2.4: [logits]; v3.0: [embeddings, logits]; Perch v2: [embedding,
spatial_embedding, spectrogram, logits] with logits at index 3.
"""

from __future__ import annotations

from typing import Optional, Tuple

from .types import ModelType

_DEMUX = {
    ModelType.BIRDNET_V24: (0, None),
    ModelType.BIRDNET_V30: (1, 0),
    ModelType.PERCH_V2: (3, 0),
}


def demux_indices(model_type: ModelType) -> Tuple[int, Optional[int]]:
    """Returns (logits output index, embeddings output index or None)."""
    return _DEMUX[model_type]
