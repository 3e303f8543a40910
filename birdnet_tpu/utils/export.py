"""Detection export writers: Raven selection tables + Audacity labels.

The wider BirdNET ecosystem exchanges detections as Raven Pro selection
tables and Audacity label tracks (the upstream BirdNET-Analyzer's
``--rtype table``/``audacity``); the Rust reference CLI only prints text.
These writers let birdnet_tpu results flow into the same downstream
review tools.

Formats:
- **Raven selection table**: tab-separated, one selection per detection,
  with the column set Raven workflows expect (`Begin Time (s)`,
  `End Time (s)`, `Low Freq (Hz)`, `High Freq (Hz)`, `Common Name`,
  `Species Code`, `Confidence`, `Begin Path`, `File Offset (s)`).
  Species codes aren't shipped with the models' label files, so the
  scientific-name half of the label stands in.
- **Audacity labels**: ``start\\tend\\tlabel`` per line, importable via
  File → Import → Labels.

Labels in the BirdNET convention are ``Scientific_Common``; both halves
are emitted where the format distinguishes them.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

from ..types import Prediction

RAVEN_HEADER = (
    "Selection\tView\tChannel\tBegin Time (s)\tEnd Time (s)\t"
    "Low Freq (Hz)\tHigh Freq (Hz)\tCommon Name\tSpecies Code\t"
    "Confidence\tBegin Path\tFile Offset (s)"
)


def split_label(label: str) -> Tuple[str, str]:
    """``Scientific_Common`` → (scientific, common); labels without an
    underscore use the whole string for both."""
    if "_" in label:
        sci, common = label.split("_", 1)
        return sci, common
    return label, label


class RavenWriter:
    """Accumulate detections and write one Raven selection table."""

    def __init__(
        self, path, sample_rate: int, segment_duration: float,
        max_freq: Optional[float] = None,
    ):
        self._path = str(path)
        self._segment_duration = float(segment_duration)
        self._low_freq = 0
        # selection box upper bound: model band, capped at Nyquist
        self._high_freq = int(
            min(15_000.0 if max_freq is None else max_freq, sample_rate / 2)
        )
        self._rows: List[str] = []
        # Combined-table stream positions: in a multi-file Raven table,
        # Begin/End Time are CUMULATIVE across the preceding files'
        # durations; only 'File Offset (s)' is within-file.
        self._file_starts: dict = {}
        self._next_start = 0.0

    def add(
        self,
        audio_path: str,
        offset: float,
        predictions: List[Prediction],
        duration_secs: float,
    ) -> None:
        if audio_path not in self._file_starts:
            self._file_starts[audio_path] = self._next_start
            self._next_start += float(duration_secs)
        base = self._file_starts[audio_path]
        end = min(offset + self._segment_duration, duration_secs)
        for p in predictions:
            sci, common = split_label(p.species)
            n = len(self._rows) + 1
            self._rows.append(
                f"{n}\tSpectrogram 1\t1\t{base + offset:.3f}\t{base + end:.3f}\t"
                f"{self._low_freq}\t{self._high_freq}\t{common}\t{sci}\t"
                f"{p.confidence:.4f}\t{audio_path}\t{offset:.3f}"
            )

    def write(self) -> int:
        with open(self._path, "w", encoding="utf-8") as f:
            f.write(RAVEN_HEADER + "\n")
            for row in self._rows:
                f.write(row + "\n")
        return len(self._rows)


class AudacityWriter:
    """Accumulate detections and write an Audacity label track."""

    def __init__(self, path, segment_duration: float):
        self._path = str(path)
        self._segment_duration = float(segment_duration)
        self._rows: List[str] = []

    def add(
        self,
        audio_path: str,
        offset: float,
        predictions: List[Prediction],
        duration_secs: float,
    ) -> None:
        end = min(offset + self._segment_duration, duration_secs)
        for p in predictions:
            _, common = split_label(p.species)
            self._rows.append(
                f"{offset:.6f}\t{end:.6f}\t{common} {p.confidence:.2f}"
            )

    def write(self) -> int:
        with open(self._path, "w", encoding="utf-8") as f:
            for row in self._rows:
                f.write(row + "\n")
        return len(self._rows)
