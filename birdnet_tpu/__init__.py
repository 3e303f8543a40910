"""birdnet_tpu — TPU-native bioacoustic bird-species classification.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference Rust + ONNX Runtime library (tphakala/rust-birdnet-onnx): BirdNET
v2.4 / v3.0 / Google Perch v2 inference, model auto-detection, top-K
postprocessing, the BirdNET meta-model range filter, batched and
buffer-reusing inference paths, timeout/cancellation, and a CLI.

Public surface mirrors the reference's re-export list (reference:
src/lib.rs:93-111).
"""

__version__ = "0.5.0"

from .detection import detect_model_type  # noqa: F401
from .errors import (  # noqa: F401
    AudioFormatError,
    AudioReadError,
    BatchInputSizeError,
    BirdnetError,
    InferenceCancelledError,
    InferenceError,
    InferenceTimeoutError,
    InputSizeError,
    InvalidCoordinatesError,
    InvalidDateError,
    LabelCountError,
    LabelLoadError,
    LabelParseError,
    LabelsRequiredError,
    ModelDetectionError,
    ModelLoadError,
    ModelPathRequiredError,
    RangeFilterInferenceError,
    RuntimeInitError,
    SpeciesListError,
)
from .batch_context import BatchInferenceContext  # noqa: F401
from .classifier import Classifier, ClassifierBuilder  # noqa: F401
from .device_config import CPUConfig, TPUConfig  # noqa: F401
from .execution_providers import (  # noqa: F401
    available_execution_providers,
    is_device_available,
)
from .inference_options import CancellationToken, InferenceOptions  # noqa: F401
from .runtime import available_devices, default_device, init_runtime  # noqa: F401
from .labels import load_labels_from_file, parse_labels  # noqa: F401
from .utils.audio_io import chunk_audio, read_wav, write_wav  # noqa: F401
from .rangefilter import (  # noqa: F401
    RangeFilter,
    RangeFilterBuilder,
    calculate_week,
    filter_predictions,
    validate_coordinates,
    validate_date,
)
from .postprocess import sigmoid, top_k_predictions  # noqa: F401
from .types import (  # noqa: F401
    DeviceBackend,
    DeviceInfo,
    LabelFormat,
    LocationScore,
    ModelConfig,
    ModelType,
    Prediction,
    PredictionResult,
)
