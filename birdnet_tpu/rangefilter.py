"""Geographic range filter using the BirdNET meta model.

Mirrors reference src/rangefilter.rs:
- 48-week calendar: ``(month-1)*4 + (day-1)//7 + 1`` (rangefilter.rs:77-81;
  can reach 49 for days 29-31 — preserved);
- coordinate/date validation (rangefilter.rs:91-133);
- builder with threshold default **0.01** (rangefilter.rs:160-167);
- ``predict(lat, lon, month, day)`` → ``[1,3]`` input, scores ≥ threshold,
  sorted descending (rangefilter.rs:435-502);
- ``filter_predictions`` semantics: species in the meta model below
  threshold → dropped; at/above → kept (optionally confidence×score
  reranked); **absent from the meta model → kept unchanged**
  (rangefilter.rs:333-386).

The meta model is a tiny MLP; it runs as a jitted XLA program like the main
models (no separate runtime).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from .detection import _extract_last_dim  # shared shape helper
from .errors import (
    InvalidCoordinatesError,
    InvalidDateError,
    LabelCountError,
    LabelsRequiredError,
    ModelPathRequiredError,
    RangeFilterInferenceError,
)
from .labels import load_labels_from_file
from .types import LocationScore, ModelType, Prediction


def calculate_week(month: int, day: int) -> float:
    """48-week BirdNET calendar (reference: rangefilter.rs:77-81).

    Week = (month-1)*4 + (day-1)//7 + 1; days 29-31 can yield week 49.
    """
    return float((month - 1) * 4 + (day - 1) // 7 + 1)


def validate_coordinates(latitude: float, longitude: float) -> None:
    """Validate lat ∈ [-90, 90], lon ∈ [-180, 180] (rangefilter.rs:91-108)."""
    if not (-90.0 <= latitude <= 90.0):
        raise InvalidCoordinatesError(
            latitude,
            longitude,
            f"latitude must be in range [-90, 90], got {latitude}",
        )
    if not (-180.0 <= longitude <= 180.0):
        raise InvalidCoordinatesError(
            latitude,
            longitude,
            f"longitude must be in range [-180, 180], got {longitude}",
        )


def validate_date(month: int, day: int) -> None:
    """Validate month ∈ [1, 12], day ∈ [1, 31] (rangefilter.rs:110-133)."""
    if not 1 <= month <= 12:
        raise InvalidDateError(month, day, f"month must be in range [1, 12], got {month}")
    if not 1 <= day <= 31:
        raise InvalidDateError(month, day, f"day must be in range [1, 31], got {day}")


def filter_predictions(
    predictions: Sequence[Prediction],
    location_scores: Sequence[LocationScore],
    threshold: float,
    rerank: bool = False,
) -> List[Prediction]:
    """Filter predictions by location scores (reference:
    rangefilter.rs:333-386). Pure function; no model needed."""
    location_map: Dict[str, float] = {s.species: s.score for s in location_scores}
    filtered: List[Prediction] = []
    for pred in predictions:
        score = location_map.get(pred.species)
        if score is None:
            # Species not in meta model: keep unchanged.
            filtered.append(
                Prediction(species=pred.species, confidence=pred.confidence, index=pred.index)
            )
        elif score >= threshold:
            confidence = pred.confidence * score if rerank else pred.confidence
            filtered.append(
                Prediction(species=pred.species, confidence=confidence, index=pred.index)
            )
        # else: in meta model but below threshold → dropped
    if rerank:
        filtered.sort(key=lambda p: -p.confidence)
    return filtered


class RangeFilterBuilder:
    """Builder for :class:`RangeFilter` (reference: rangefilter.rs:144-328)."""

    def __init__(self) -> None:
        self._model_path: Optional[str] = None
        self._labels_path: Optional[str] = None
        self._labels: Optional[List[str]] = None
        self._threshold: float = 0.01  # reference default (rangefilter.rs:160-167)
        self._device: Optional[str] = None

    def model_path(self, path) -> "RangeFilterBuilder":
        self._model_path = str(path)
        return self

    def labels_path(self, path) -> "RangeFilterBuilder":
        self._labels_path = str(path)
        return self

    def labels(self, labels: Sequence[str]) -> "RangeFilterBuilder":
        self._labels = list(labels)
        return self

    def from_classifier_labels(self, labels: Sequence[str]) -> "RangeFilterBuilder":
        """Copy labels from a classifier so they stay in sync
        (reference: rangefilter.rs:186-193)."""
        self._labels = list(labels)
        return self

    def threshold(self, t: float) -> "RangeFilterBuilder":
        self._threshold = float(t)
        return self

    def with_device(self, platform: str) -> "RangeFilterBuilder":
        self._device = platform
        return self

    def build(self) -> "RangeFilter":
        if self._model_path is None:
            raise ModelPathRequiredError()
        if self._labels_path is None and self._labels is None:
            raise LabelsRequiredError()

        import jax

        from .compiler.importer import import_onnx, make_forward
        from .runtime import default_device, init_runtime

        init_runtime()
        imported = import_onnx(self._model_path)

        # Build validates exactly one output (reference: rangefilter.rs:221-277)
        if imported.num_outputs != 1:
            raise RangeFilterInferenceError(
                f"meta model must have exactly 1 output, got {imported.num_outputs}"
            )
        out_shape = list(imported.output_shapes[0])
        if out_shape and out_shape[-1] is None:
            # Only the batch dim may be dynamic: substituting 1 for a
            # dynamic SPECIES dim would yield num_species=1 and a
            # nonsensical "model expects 1 label" error downstream.
            raise RangeFilterInferenceError(
                "meta model has a dynamic species dimension "
                f"(output shape {imported.output_shapes[0]}); the species "
                "count must be static"
            )
        num_species = _extract_last_dim(
            [d if d is not None else 1 for d in out_shape]
        )

        if self._labels is not None:
            labels = list(self._labels)
        else:
            # Meta-model labels use the Text format (one per line).
            labels = load_labels_from_file(self._labels_path, ModelType.BIRDNET_V24)
        if len(labels) != num_species:
            raise LabelCountError(expected=num_species, got=len(labels))

        device = default_device(self._device) if self._device else default_device()
        params = jax.device_put(imported.params, device)
        forward = make_forward(imported, precision="fp32")

        def program(p, x):
            return forward(p, x)[0]

        fn = jax.jit(program)
        return RangeFilter(
            fn=fn, params=params, labels=labels, threshold=self._threshold, device=device
        )


class RangeFilter:
    """Thread-safe location/date species filter (reference:
    rangefilter.rs:396-580)."""

    def __init__(self, fn, params, labels: List[str], threshold: float, device):
        self._fn = fn
        self._params = params
        self._labels = labels
        self._threshold = threshold
        self._device = device

    @staticmethod
    def builder() -> RangeFilterBuilder:
        return RangeFilterBuilder()

    @property
    def labels(self) -> List[str]:
        return self._labels

    @property
    def threshold(self) -> float:
        return self._threshold

    def predict(
        self, latitude: float, longitude: float, month: int, day: int
    ) -> List[LocationScore]:
        """Species scores for a location/date (reference:
        rangefilter.rs:435-502)."""
        validate_coordinates(latitude, longitude)
        validate_date(month, day)
        week = calculate_week(month, day)
        x = np.array([[latitude, longitude, week]], dtype=np.float32)
        try:
            scores = np.asarray(self._fn(self._params, x)).reshape(-1)
        except Exception as e:  # noqa: BLE001
            raise RangeFilterInferenceError(str(e)) from e

        out = [
            LocationScore(species=self._labels[i], score=float(s), index=i)
            for i, s in enumerate(scores)
            if s >= self._threshold and i < len(self._labels)
        ]
        out.sort(key=lambda ls: -ls.score)
        return out

    def filter_predictions(
        self,
        predictions: Sequence[Prediction],
        location_scores: Sequence[LocationScore],
        rerank: bool = False,
    ) -> List[Prediction]:
        """Filter predictions by location scores (reference:
        rangefilter.rs:527-534)."""
        return filter_predictions(
            predictions, location_scores, self._threshold, rerank
        )

    def filter_predictions_batch(
        self,
        batch: Sequence[Sequence[Prediction]],
        location_scores: Sequence[LocationScore],
        rerank: bool = False,
    ) -> List[List[Prediction]]:
        """Batch variant (reference: rangefilter.rs:567-579)."""
        return [
            filter_predictions(preds, location_scores, self._threshold, rerank)
            for preds in batch
        ]
