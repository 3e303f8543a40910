"""Error taxonomy tests: message formats match reference src/error.rs."""

import pytest

from birdnet_tpu import errors as E


def test_all_variants_subclass_base():
    variants = [
        E.InputSizeError(1, 2),
        E.BatchInputSizeError(0, 1, 2),
        E.ModelDetectionError("r"),
        E.LabelCountError(1, 2),
        E.ModelPathRequiredError(),
        E.LabelsRequiredError(),
        E.ModelLoadError("r"),
        E.LabelLoadError("p", "r"),
        E.LabelParseError("r"),
        E.InferenceError("r"),
        E.InvalidCoordinatesError(0.0, 0.0, "r"),
        E.InvalidDateError(1, 1, "r"),
        E.RangeFilterInferenceError("r"),
        E.InferenceTimeoutError(1.0),
        E.InferenceCancelledError(),
        E.RuntimeInitError("r"),
        E.AudioFormatError("r"),
        E.AudioReadError("p", "r"),
    ]
    assert len(variants) == 18  # reference has 18 variants (src/error.rs:6-128)
    for v in variants:
        assert isinstance(v, E.BirdnetError)


def test_message_formats():
    assert str(E.InputSizeError(144000, 1000)) == (
        "input size mismatch: expected 144000 samples, got 1000"
    )
    assert str(E.BatchInputSizeError(2, 144000, 10)) == (
        "batch input size mismatch: segment 2 has 10 samples, expected 144000"
    )
    assert str(E.ModelDetectionError("bad")) == "model detection failed: bad"
    assert str(E.LabelCountError(6522, 10)) == (
        "label count mismatch: model expects 6522, got 10"
    )
    assert str(E.ModelPathRequiredError()) == "model path required"
    assert str(E.LabelsRequiredError()) == "labels required (provide path or vec)"
    assert str(E.LabelLoadError("/x", "no")) == "failed to load labels from /x: no"
    assert str(E.LabelParseError("bad")) == "failed to parse labels: bad"
    assert str(E.InferenceError("x")) == "inference failed: x"
    assert str(E.InferenceCancelledError()) == "inference was cancelled"
    assert "latitude: 91.0" in str(E.InvalidCoordinatesError(91.0, 0.0, "r"))
    assert "month: 13" in str(E.InvalidDateError(13, 1, "r"))


def test_errors_are_raisable():
    with pytest.raises(E.BirdnetError):
        raise E.InputSizeError(1, 2)
    with pytest.raises(E.InputSizeError) as ei:
        raise E.InputSizeError(144000, 7)
    assert ei.value.expected == 144000
    assert ei.value.got == 7
