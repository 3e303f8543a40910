"""ONNX signal-op lowerings (STFT / windows / MelWeightMatrix) vs torch."""

import numpy as np
import pytest

from birdnet_tpu.compiler import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P

torch = pytest.importorskip("torch")

from tests.test_compiler_ops import run_graph  # noqa: E402


def test_hann_window_vs_torch():
    (y,) = run_graph(
        [P.make_node("HannWindow", ["size"], ["y"])],
        {},
        {"size": np.array(256, dtype=np.int64)},
        opset=17,
    )
    expected = torch.hann_window(256, periodic=True).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_hamming_window_vs_torch():
    (y,) = run_graph(
        [P.make_node("HammingWindow", ["size"], ["y"])],
        {},
        {"size": np.array(128, dtype=np.int64)},
        opset=17,
    )
    # ONNX Hamming uses 25/46 coefficients
    expected = torch.hamming_window(
        128, periodic=True, alpha=25.0 / 46.0, beta=21.0 / 46.0
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_blackman_window_vs_torch():
    (y,) = run_graph(
        [P.make_node("BlackmanWindow", ["size"], ["y"])],
        {},
        {"size": np.array(100, dtype=np.int64)},
        opset=17,
    )
    expected = torch.blackman_window(100, periodic=True).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-6)


def test_stft_vs_torch(rng):
    x = rng.normal(size=(2, 2048)).astype(np.float32)
    window = torch.hann_window(512, periodic=True).numpy().astype(np.float32)
    (y,) = run_graph(
        [P.make_node("STFT", ["x", "step", "win"], ["y"], onesided=1)],
        {"x": x},
        {
            "step": np.array(160, dtype=np.int64),
            "win": window,
        },
        opset=17,
    )
    ref = torch.stft(
        torch.from_numpy(x),
        n_fft=512,
        hop_length=160,
        window=torch.from_numpy(window),
        center=False,
        onesided=True,
        return_complex=True,
    )  # [B, bins, frames]
    ref = ref.numpy().transpose(0, 2, 1)  # [B, frames, bins]
    np.testing.assert_allclose(y[..., 0], ref.real, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(y[..., 1], ref.imag, rtol=1e-3, atol=1e-3)


def test_stft_no_window(rng):
    x = rng.normal(size=(1, 1024)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("STFT", ["x", "step", "", "flen"], ["y"], onesided=1)],
        {"x": x},
        {
            "step": np.array(256, dtype=np.int64),
            "flen": np.array(256, dtype=np.int64),
        },
        opset=17,
    )
    assert y.shape == (1, 4, 129, 2)
    ref = np.fft.rfft(x[0, :256])
    np.testing.assert_allclose(y[0, 0, :, 0], ref.real, rtol=1e-3, atol=1e-3)


def test_mel_weight_matrix_properties():
    (w,) = run_graph(
        [P.make_node("MelWeightMatrix", ["m", "d", "sr", "lo", "hi"], ["y"])],
        {},
        {
            "m": np.array(64, dtype=np.int64),
            "d": np.array(1024, dtype=np.int64),
            "sr": np.array(48_000, dtype=np.int64),
            "lo": np.array(150.0, dtype=np.float32),
            "hi": np.array(15_000.0, dtype=np.float32),
        },
        opset=17,
    )
    assert w.shape == (513, 64)  # [dft/2+1, mel_bins]
    assert (w >= 0).all() and w.max() <= 1.0 + 1e-6
    # every mel bin has support, peaks move up in frequency
    assert (w.sum(axis=0) > 0).all()
    peaks = w.argmax(axis=0)
    assert (np.diff(peaks) >= 0).all()
    # bins below lower edge have no weight
    low_bin = int(150.0 / (48_000 / 1024))
    assert w[: max(low_bin - 1, 0)].sum() == 0.0


def test_mel_spectrogram_pipeline(rng):
    """STFT → magnitude → mel projection as a mini ONNX graph."""
    x = rng.normal(size=(1, 4800)).astype(np.float32)
    window = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(512) / 512)).astype(np.float32)
    nodes = [
        P.make_node("STFT", ["x", "step", "win"], ["spec"], onesided=1),
        P.make_node("ReduceSumSquare", ["spec"], ["power"], axes=[-1], keepdims=0),
        P.make_node("MelWeightMatrix", ["m", "d", "sr", "lo", "hi"], ["mel"]),
        P.make_node("MatMul", ["power", "mel"], ["y"]),
    ]
    (y,) = run_graph(
        nodes,
        {"x": x},
        {
            "step": np.array(160, dtype=np.int64),
            "win": window,
            "m": np.array(40, dtype=np.int64),
            "d": np.array(512, dtype=np.int64),
            "sr": np.array(16_000, dtype=np.int64),
            "lo": np.array(20.0, dtype=np.float32),
            "hi": np.array(8_000.0, dtype=np.float32),
        },
        opset=17,
    )
    assert y.shape == (1, (4800 - 512) // 160 + 1, 40)
    assert np.isfinite(y).all()
    assert (y >= 0).all()


def test_stft_frontend_model_end_to_end(tmp_path):
    """A v2.4-shaped model using the TF-export-style STFT+mel frontend runs
    through the classifier and streaming paths."""
    from birdnet_tpu import Classifier
    from birdnet_tpu.models import birdnet_v24
    from birdnet_tpu.onnx import proto as P
    from birdnet_tpu.testutil import mock_labels, sine_segment

    path = tmp_path / "v24_stft.onnx"
    P.save_model(
        birdnet_v24.build_model(width=0.1, depth=1, num_species=10, frontend="stft"),
        path,
    )
    clf = Classifier.builder().model_path(path).labels(mock_labels(10)).top_k(3).build()
    r = clf.predict(sine_segment())
    assert len(r.predictions) == 3
    stream = clf.analyze_samples(np.tile(sine_segment(), 2))
    assert len(stream) == 2
    assert [p.index for p in stream[0][1]] == [p.index for p in r.predictions]


def test_stft_two_sided_vs_torch(rng):
    """onesided=0 exercises the full-spectrum DFT-matmul basis."""
    x = rng.normal(size=(1, 1024)).astype(np.float32)
    window = torch.hann_window(256, periodic=True).numpy().astype(np.float32)
    (y,) = run_graph(
        [P.make_node("STFT", ["x", "step", "win"], ["y"], onesided=0)],
        {"x": x},
        {"step": np.array(128, dtype=np.int64), "win": window},
        opset=17,
    )
    ref = torch.stft(
        torch.from_numpy(x), n_fft=256, hop_length=128,
        window=torch.from_numpy(window), center=False, onesided=False,
        return_complex=True,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(y[..., 0], ref.real, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(y[..., 1], ref.imag, rtol=1e-3, atol=1e-3)


def test_stft_small_step_gather_fallback(rng):
    """step so small that m = ceil(flen/step) > 32 takes the gather path."""
    x = rng.normal(size=(1, 700)).astype(np.float32)
    window = torch.hann_window(512, periodic=True).numpy().astype(np.float32)
    (y,) = run_graph(
        [P.make_node("STFT", ["x", "step", "win"], ["y"], onesided=1)],
        {"x": x},
        {"step": np.array(8, dtype=np.int64), "win": window},
        opset=17,
    )
    ref = torch.stft(
        torch.from_numpy(x), n_fft=512, hop_length=8,
        window=torch.from_numpy(window), center=False, onesided=True,
        return_complex=True,
    ).numpy().transpose(0, 2, 1)
    np.testing.assert_allclose(y[..., 0], ref.real, rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(y[..., 1], ref.imag, rtol=1e-3, atol=1e-3)


def test_stft_signal_shorter_than_frame(rng):
    """Zero frames when the signal can't fill one window."""
    x = rng.normal(size=(2, 100)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("STFT", ["x", "step", "", "flen"], ["y"], onesided=1)],
        {"x": x},
        {"step": np.array(300, dtype=np.int64),
         "flen": np.array(512, dtype=np.int64)},
        opset=17,
    )
    assert y.shape == (2, 0, 257, 2)
