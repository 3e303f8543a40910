"""Test utilities: mock configs, synthetic audio, deterministic logits.

Mirrors the reference's ``testutil`` module (reference: src/testutil.rs:
mock_config :30-47, silent/sine segments :51-67, mock_labels :71-73,
mock_prediction_result :77-106, LCG random_logits :110-121,
mock_logits_with_top_k :125-133, mock_embeddings :137-147) — plus the piece
the reference deferred: tiny architecture-faithful fake models
(:mod:`birdnet_tpu.models` ``save_tiny``) so predict paths are unit-testable
without real weights.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from .types import ModelConfig, ModelType, Prediction, PredictionResult


def mock_config(model_type: ModelType = ModelType.BIRDNET_V24,
                num_species: int = 10) -> ModelConfig:
    """A ModelConfig with the canonical per-type constants
    (reference: testutil.rs:30-47)."""
    return ModelConfig(
        model_type=model_type,
        sample_rate=model_type.sample_rate,
        segment_duration=model_type.segment_duration,
        sample_count=model_type.sample_count,
        num_species=num_species,
        embedding_dim=(
            None
            if model_type is ModelType.BIRDNET_V24
            else (1024 if model_type is ModelType.BIRDNET_V30 else 1536)
        ),
    )


def silent_segment(model_type: ModelType = ModelType.BIRDNET_V24) -> np.ndarray:
    """All-zero segment of the right length (testutil.rs:51-55)."""
    return np.zeros(model_type.sample_count, dtype=np.float32)


def sine_segment(
    model_type: ModelType = ModelType.BIRDNET_V24, freq: float = 1000.0,
    amplitude: float = 0.5,
) -> np.ndarray:
    """Sine-wave segment (testutil.rs:58-67)."""
    n = model_type.sample_count
    t = np.arange(n, dtype=np.float32) / model_type.sample_rate
    return (amplitude * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def mock_labels(n: int = 10) -> List[str]:
    """``species_0`` … ``species_{n-1}`` (testutil.rs:71-73)."""
    return [f"species_{i}" for i in range(n)]


def mock_prediction_result(
    model_type: ModelType = ModelType.BIRDNET_V24,
    predictions: Optional[Sequence[Prediction]] = None,
    embeddings: Optional[np.ndarray] = None,
) -> PredictionResult:
    """Hand-built PredictionResult fixture (testutil.rs:77-106)."""
    if predictions is None:
        predictions = [
            Prediction(species="species_0", confidence=0.9, index=0),
            Prediction(species="species_1", confidence=0.7, index=1),
        ]
    return PredictionResult(
        model_type=model_type,
        predictions=list(predictions),
        embeddings=embeddings,
        raw_scores=np.zeros(10, dtype=np.float32),
    )


def random_logits(n: int, seed: int = 12345) -> np.ndarray:
    """Deterministic LCG-style pseudo-random logits in [-5, 5)
    (testutil.rs:110-121 uses the same trick for cross-run stability)."""
    # Python ints masked to 64 bits: numpy uint64 scalar arithmetic emits
    # RuntimeWarning('overflow') on (intended) wraparound, which breaks
    # downstream suites running with warnings-as-errors.
    mask = (1 << 64) - 1
    state = int(seed) & mask
    out = np.empty(n, dtype=np.float32)
    a, c = 6364136223846793005, 1442695040888963407
    for i in range(n):
        state = (a * state + c) & mask
        out[i] = (float(state >> 33) / float(1 << 31)) * 10.0 - 5.0
    return out


def mock_logits_with_top_k(n: int, top_indices: Sequence[int]) -> np.ndarray:
    """Logits where ``top_indices`` are the strictly-descending winners
    (testutil.rs:125-133)."""
    # Background sits strictly below the LAST winner regardless of how
    # many winners there are (10.0 - rank with a fixed -10.0 fill broke
    # the contract past 20 indices).
    fill = min(-10.0, 10.0 - len(top_indices) - 1.0)
    logits = np.full(n, fill, dtype=np.float32)
    for rank, idx in enumerate(top_indices):
        logits[idx] = 10.0 - rank
    return logits


def mock_embeddings(dim: int = 1024, seed: int = 7) -> np.ndarray:
    """Deterministic embeddings vector (testutil.rs:137-147)."""
    rng = np.random.default_rng(seed)
    return rng.normal(size=dim).astype(np.float32)
