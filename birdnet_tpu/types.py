"""Core datatypes: model types, configs, predictions, device info.

Mirrors reference src/types.rs. The reference's ``ExecutionProviderInfo``
enum of 11 ONNX Runtime execution providers becomes a device-backend enum
centered on TPU/CPU (the hardware this framework targets), with the same
``as_str``/``category`` reporting surface.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass, field
from typing import Optional


class LabelFormat(enum.Enum):
    """Expected label format per model type (src/types.rs:60-68)."""

    TEXT = "text"  # one label per line
    CSV = "csv"  # first column is label
    JSON = "json"  # JSON array or object


class ModelType(enum.Enum):
    """Supported model types (src/types.rs:2-10)."""

    BIRDNET_V24 = "birdnet_v24"
    BIRDNET_V30 = "birdnet_v30"
    PERCH_V2 = "perch_v2"

    @property
    def sample_rate(self) -> int:
        """Sample rate in Hz (src/types.rs:15-20)."""
        return 48_000 if self is ModelType.BIRDNET_V24 else 32_000

    @property
    def segment_duration(self) -> float:
        """Segment duration in seconds (src/types.rs:24-29)."""
        return 3.0 if self is ModelType.BIRDNET_V24 else 5.0

    @property
    def sample_count(self) -> int:
        """Expected sample count per segment (src/types.rs:33-38)."""
        return 144_000 if self is ModelType.BIRDNET_V24 else 160_000

    @property
    def has_embeddings(self) -> bool:
        """Whether this model produces embeddings (src/types.rs:42-47)."""
        return self is not ModelType.BIRDNET_V24

    @property
    def expected_label_format(self) -> LabelFormat:
        """Expected label file format (src/types.rs:51-56)."""
        return (
            LabelFormat.TEXT
            if self is ModelType.BIRDNET_V24
            else LabelFormat.CSV
        )

    @property
    def display_name(self) -> str:
        """Human-readable name (reference CLI: birdnet-analyze.rs:112-118)."""
        return {
            ModelType.BIRDNET_V24: "BirdNET v2.4",
            ModelType.BIRDNET_V30: "BirdNET v3.0",
            ModelType.PERCH_V2: "Perch v2",
        }[self]


@dataclass
class ModelConfig:
    """Model configuration derived from detected model type (src/types.rs:71-85)."""

    model_type: ModelType
    sample_rate: int
    segment_duration: float
    sample_count: int
    num_species: int
    embedding_dim: Optional[int] = None


@dataclass
class Prediction:
    """Single species prediction (src/types.rs:88-96)."""

    species: str
    confidence: float  # 0.0 - 1.0, after sigmoid
    index: int


@dataclass
class PredictionResult:
    """Complete inference result (src/types.rs:99-109)."""

    model_type: ModelType
    predictions: list  # list[Prediction], sorted by confidence descending
    embeddings: Optional[list] = None  # None for BirdNET v2.4
    raw_scores: list = field(default_factory=list)


@dataclass
class LocationScore:
    """Species probability from the meta model for a location/date (src/types.rs:112-120)."""

    species: str
    score: float  # 0.0 - 1.0
    index: int


class DeviceBackend(enum.Enum):
    """Hardware backend info — the TPU-native analog of the reference's
    ``ExecutionProviderInfo`` (src/types.rs:123-147).

    The reference enumerates ONNX Runtime execution providers; here the
    compute path is XLA, so backends are the JAX platforms this process can
    target. ``as_str``/``category`` mirror src/types.rs:150-177.
    """

    CPU = "cpu"
    TPU = "tpu"
    GPU = "gpu"
    AXON = "axon"  # tunneled TPU platform

    @property
    def as_str(self) -> str:
        return {
            DeviceBackend.CPU: "CPU",
            DeviceBackend.TPU: "TPU",
            DeviceBackend.GPU: "GPU",
            DeviceBackend.AXON: "TPU (axon)",
        }[self]

    @property
    def category(self) -> str:
        """Hardware category (analog of src/types.rs:169-177)."""
        return {
            DeviceBackend.CPU: "CPU",
            DeviceBackend.TPU: "Accelerator",
            DeviceBackend.GPU: "GPU",
            DeviceBackend.AXON: "Accelerator",
        }[self]

    def __str__(self) -> str:  # Display impl parity (src/types.rs:181-185)
        return self.as_str


@dataclass
class DeviceInfo:
    """A concrete device visible to the runtime (analog of an available EP)."""

    backend: DeviceBackend
    device_id: int
    description: str = ""

    def __str__(self) -> str:
        return f"{self.backend.as_str}:{self.device_id}"
