"""Label loading: Text / CSV / JSON parsers.

Mirrors reference src/labels.rs semantics exactly:
- Text: one label per line, trimmed, blanks skipped (labels.rs:42-48).
- CSV: first column, flexible row widths, header-row heuristic including the
  Perch v2 ``inat*`` / ``*_fsd50k`` dataset identifiers (labels.rs:51-93).
- JSON: three accepted shapes — ``["a", "b"]``, ``{"labels": [...]}``,
  ``[{"name"|"label"|"species": ...}]`` (labels.rs:96-122).
"""

from __future__ import annotations

import csv
import io
import json
from typing import List, Union

from .errors import LabelLoadError, LabelParseError
from .types import LabelFormat, ModelType


def load_labels_from_file(path, model_type: ModelType) -> List[str]:
    """Load labels from a file using the format expected by the model type
    (reference: labels.rs:22-30)."""
    path = str(path)
    try:
        with open(path, "r", encoding="utf-8") as f:
            content = f.read()
    except OSError as e:
        raise LabelLoadError(path=path, reason=str(e)) from e
    return parse_labels(content, model_type.expected_label_format)


def parse_labels(content: str, fmt: Union[LabelFormat, str]) -> List[str]:
    """Parse labels from a content string according to format (labels.rs:33-39)."""
    if isinstance(fmt, str):
        fmt = LabelFormat(fmt)
    if fmt is LabelFormat.TEXT:
        return _parse_text_labels(content)
    if fmt is LabelFormat.CSV:
        return _parse_csv_labels(content)
    return _parse_json_labels(content)


def _parse_text_labels(content: str) -> List[str]:
    """One label per line; trim; skip blank lines (labels.rs:42-48)."""
    return [line.strip() for line in content.splitlines() if line.strip()]


# Header tokens recognized by the CSV header heuristic (labels.rs:83-93).
_HEADER_EXACT = {"label", "species", "name", "class", "common_name", "scientific_name"}


def _looks_like_header(value: str) -> bool:
    lower = value.lower()
    return (
        lower in _HEADER_EXACT
        or lower.startswith("inat")  # Perch v2 dataset identifier
        or lower.endswith("_fsd50k")  # Perch v2 dataset identifier
    )


def _parse_csv_labels(content: str) -> List[str]:
    """First column is label; skip a detected header row (labels.rs:51-80)."""
    labels: List[str] = []
    first_row = True
    try:
        reader = csv.reader(io.StringIO(content))
        for record in reader:
            if not record:
                first_row = False
                continue
            label = record[0].strip()
            if first_row and _looks_like_header(label):
                first_row = False
                continue
            first_row = False
            if label:
                labels.append(label)
    except csv.Error as e:
        raise LabelParseError(str(e)) from e
    return labels


def _parse_json_labels(content: str) -> List[str]:
    """Accept three JSON shapes (labels.rs:96-122)."""
    try:
        data = json.loads(content)
    except json.JSONDecodeError:
        data = None

    if isinstance(data, list) and all(isinstance(x, str) for x in data):
        return list(data)

    if (
        isinstance(data, dict)
        and isinstance(data.get("labels"), list)
        and all(isinstance(x, str) for x in data["labels"])
    ):
        return list(data["labels"])

    if isinstance(data, list) and all(isinstance(x, dict) for x in data):
        labels = []
        for entry in data:
            for key in ("name", "label", "species"):
                v = entry.get(key)
                if isinstance(v, str):
                    labels.append(v)
                    break
        if labels:
            return labels

    raise LabelParseError(
        "unrecognized JSON format: expected array of strings, {labels: [...]}, "
        "or [{name: ...}]"
    )
