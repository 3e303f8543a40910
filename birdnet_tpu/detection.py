"""Model type auto-detection from graph tensor shapes.

Mirrors reference src/detection.rs: the ``(sample_count, num_outputs)``
dispatch — ``(144000, 1)`` → BirdNET v2.4, ``(160000, 2)`` → BirdNET v3.0,
``(160000, 4)`` → Perch v2 (detection.rs:29-79) — plus the user-override
validation path (detection.rs:83-145).
"""

from __future__ import annotations

from typing import Optional, Sequence

from .errors import ModelDetectionError
from .types import ModelConfig, ModelType


def detect_model_type(
    input_shape: Sequence[int],
    output_shapes: Sequence[Sequence[int]],
    override_type: Optional[ModelType] = None,
) -> ModelConfig:
    """Detect the model type from input/output tensor shapes
    (reference: detection.rs:15-80).

    ``input_shape`` is ``[batch, samples]`` or ``[batch, 1, samples]``;
    ``output_shapes`` is the ordered list of graph output shapes.
    """
    sample_count = _extract_sample_count(input_shape)
    num_outputs = len(output_shapes)

    if override_type is not None:
        return _build_config_with_override(override_type, sample_count, output_shapes)

    if (sample_count, num_outputs) == (144_000, 1):
        return ModelConfig(
            model_type=ModelType.BIRDNET_V24,
            sample_rate=48_000,
            segment_duration=3.0,
            sample_count=144_000,
            num_species=_extract_last_dim(output_shapes[0]),
            embedding_dim=None,
        )

    if (sample_count, num_outputs) == (160_000, 2):
        # outputs: [embeddings, predictions]
        return ModelConfig(
            model_type=ModelType.BIRDNET_V30,
            sample_rate=32_000,
            segment_duration=5.0,
            sample_count=160_000,
            num_species=_extract_last_dim(output_shapes[1]),
            embedding_dim=_extract_last_dim(output_shapes[0]),
        )

    if (sample_count, num_outputs) == (160_000, 4):
        # outputs: [embedding, spatial_embedding, spectrogram, predictions]
        return ModelConfig(
            model_type=ModelType.PERCH_V2,
            sample_rate=32_000,
            segment_duration=5.0,
            sample_count=160_000,
            num_species=_extract_last_dim(output_shapes[3]),
            embedding_dim=_extract_last_dim(output_shapes[0]),
        )

    raise ModelDetectionError(
        f"unsupported model: {sample_count} samples, {num_outputs} outputs "
        f"(expected 144000/1, 160000/2, or 160000/4)"
    )


_EXPECTED_OUTPUTS = {
    ModelType.BIRDNET_V24: 1,
    ModelType.BIRDNET_V30: 2,
    ModelType.PERCH_V2: 4,
}

_OVERRIDE_NAMES = {
    ModelType.BIRDNET_V24: "BirdNET v2.4",
    ModelType.BIRDNET_V30: "BirdNET v3.0",
    ModelType.PERCH_V2: "Perch v2",
}


def _build_config_with_override(
    model_type: ModelType,
    sample_count: int,
    output_shapes: Sequence[Sequence[int]],
) -> ModelConfig:
    """Validate a user-specified model type against actual shapes
    (reference: detection.rs:83-145)."""
    expected_samples = model_type.sample_count
    if sample_count != expected_samples:
        raise ModelDetectionError(
            f"model type {model_type.name} expects {expected_samples} samples, "
            f"but model has {sample_count}"
        )

    expected_outputs = _EXPECTED_OUTPUTS[model_type]
    if len(output_shapes) != expected_outputs:
        raise ModelDetectionError(
            f"{_OVERRIDE_NAMES[model_type]} expects {expected_outputs} "
            f"output{'s' if expected_outputs != 1 else ''}, got {len(output_shapes)}"
        )

    if model_type is ModelType.BIRDNET_V24:
        embedding_dim: Optional[int] = None
        num_species = _extract_last_dim(output_shapes[0])
    elif model_type is ModelType.BIRDNET_V30:
        embedding_dim = _extract_last_dim(output_shapes[0])
        num_species = _extract_last_dim(output_shapes[1])
    else:  # Perch v2: predictions at output index 3
        embedding_dim = _extract_last_dim(output_shapes[0])
        num_species = _extract_last_dim(output_shapes[3])

    return ModelConfig(
        model_type=model_type,
        sample_rate=model_type.sample_rate,
        segment_duration=model_type.segment_duration,
        sample_count=sample_count,
        num_species=num_species,
        embedding_dim=embedding_dim,
    )


def _extract_sample_count(shape: Sequence[int]) -> int:
    """Sample count from ``[batch, samples]`` or ``[batch, 1, samples]``
    (reference: detection.rs:149-163). Deliberate parity note: like the
    reference, a 3-D shape's MIDDLE dim is not validated — ``[B, 2, S]``
    reads S, and any channel mismatch surfaces later at the conv shapes."""
    if len(shape) == 2:
        value = shape[1]
    elif len(shape) == 3:
        value = shape[2]
    else:
        raise ModelDetectionError(f"unexpected input shape: {list(shape)}")
    if not isinstance(value, int) or value < 0:
        raise ModelDetectionError(f"invalid sample count: {value}")
    return value


def _extract_last_dim(shape: Sequence[int]) -> int:
    """Last dimension of an output shape (reference: detection.rs:166-174)."""
    if len(shape) == 0:
        raise ModelDetectionError("empty output shape")
    value = shape[-1]
    if not isinstance(value, int) or value < 0:
        raise ModelDetectionError(f"invalid dimension: {value}")
    return value
