"""Typed error taxonomy for birdnet_tpu.

Mirrors the reference's 18-variant error enum (reference: src/error.rs:6-128)
as a Python exception hierarchy. Message formats match the reference's
``#[error(...)]`` display strings so user-facing behavior is identical.
"""

from __future__ import annotations


class BirdnetError(Exception):
    """Base class for all birdnet_tpu errors (reference: src/error.rs:6)."""


class InputSizeError(BirdnetError):
    """Audio segment has wrong number of samples (src/error.rs:8-14)."""

    def __init__(self, expected: int, got: int):
        self.expected = expected
        self.got = got
        super().__init__(
            f"input size mismatch: expected {expected} samples, got {got}"
        )


class BatchInputSizeError(BirdnetError):
    """One segment in a batch has wrong sample count (src/error.rs:17-25)."""

    def __init__(self, index: int, expected: int, got: int):
        self.index = index
        self.expected = expected
        self.got = got
        super().__init__(
            f"batch input size mismatch: segment {index} has {got} samples, "
            f"expected {expected}"
        )


class ModelDetectionError(BirdnetError):
    """Failed to detect model type from graph structure (src/error.rs:28-32)."""

    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"model detection failed: {reason}")


class LabelCountError(BirdnetError):
    """Number of labels doesn't match model output size (src/error.rs:35-41)."""

    def __init__(self, expected: int, got: int):
        self.expected = expected
        self.got = got
        super().__init__(f"label count mismatch: model expects {expected}, got {got}")


class ModelPathRequiredError(BirdnetError):
    """Model path was not provided to builder (src/error.rs:44-45)."""

    def __init__(self) -> None:
        super().__init__("model path required")


class LabelsRequiredError(BirdnetError):
    """Labels were not provided to builder (src/error.rs:48-49)."""

    def __init__(self) -> None:
        super().__init__("labels required (provide path or vec)")


class ModelLoadError(BirdnetError):
    """Failed to load ONNX model (src/error.rs:52-53)."""

    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"failed to load model: {reason}")


class LabelLoadError(BirdnetError):
    """Failed to load labels from file (src/error.rs:56-62)."""

    def __init__(self, path: str, reason: str):
        self.path = path
        self.reason = reason
        super().__init__(f"failed to load labels from {path}: {reason}")


class LabelParseError(BirdnetError):
    """Failed to parse label file content (src/error.rs:65-66)."""

    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"failed to parse labels: {reason}")


class InferenceError(BirdnetError):
    """Inference execution failed (src/error.rs:69-70)."""

    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"inference failed: {reason}")


class SpeciesListError(InferenceError):
    """A species list matched none of the model's labels (no reference
    counterpart — raised by ``ClassifierBuilder.species_list`` validation
    at build time). Subclasses :class:`InferenceError` so pre-existing
    handlers keep working; a distinct type so callers dispatch on it
    instead of matching message substrings."""

    def __init__(self, reason: str):
        self.reason = reason
        # Bypass InferenceError's "inference failed:" prefix: this is a
        # build-time validation failure, and that message would point a
        # log reader at the wrong phase.
        BirdnetError.__init__(self, reason)


class InvalidCoordinatesError(BirdnetError):
    """Invalid geographic coordinates (src/error.rs:73-81)."""

    def __init__(self, latitude: float, longitude: float, reason: str):
        self.latitude = latitude
        self.longitude = longitude
        self.reason = reason
        super().__init__(
            f"invalid coordinates: latitude: {latitude}, longitude: {longitude}, "
            f"reason: {reason}"
        )


class InvalidDateError(BirdnetError):
    """Invalid date (src/error.rs:84-92)."""

    def __init__(self, month: int, day: int, reason: str):
        self.month = month
        self.day = day
        self.reason = reason
        super().__init__(f"invalid date: month: {month}, day: {day}, reason: {reason}")


class RangeFilterInferenceError(BirdnetError):
    """Range filter inference failed (src/error.rs:95-96)."""

    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"range filter inference failed: {reason}")


class InferenceTimeoutError(BirdnetError):
    """Inference timed out (src/error.rs:99-103).

    Note: on TPU a launched XLA program cannot be terminated mid-flight;
    the timeout bounds the *wait* for the result (the device computation is
    abandoned), which is observably equivalent to the reference's
    ``RunOptions::terminate()`` semantics.
    """

    def __init__(self, duration: float):
        self.duration = duration
        super().__init__(f"inference timed out after {duration}s")


class InferenceCancelledError(BirdnetError):
    """Inference was cancelled via cancellation token (src/error.rs:106-107)."""

    def __init__(self) -> None:
        super().__init__("inference was cancelled")


class RuntimeInitError(BirdnetError):
    """Failed to initialize the TPU/XLA runtime (src/error.rs:110-111)."""

    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"failed to initialize runtime: {reason}")


class AudioFormatError(BirdnetError):
    """Audio file format is not supported (src/error.rs:114-118)."""

    def __init__(self, reason: str):
        self.reason = reason
        super().__init__(f"unsupported audio format: {reason}")


class AudioReadError(BirdnetError):
    """Failed to read audio file (src/error.rs:121-127)."""

    def __init__(self, path: str, reason: str):
        self.path = path
        self.reason = reason
        super().__init__(f"failed to read audio file {path}: {reason}")
