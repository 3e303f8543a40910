"""Real TensorFlow adjudicates the STFT/mel frontend conventions.

The official BirdNET v2.4 / v3.0 / Perch v2 files are TF exports whose
in-graph frontend is ``tf.signal.stft`` → power → mel projection
(docs/performance.md "STFT-form frontends"). Until now the engine's
STFT / HannWindow / MelWeightMatrix lowerings were pinned against torch
and hand-transcribed spec oracles — this file closes the remaining
convention risk by comparing directly against ``tf.signal``, the actual
producer semantics behind the real files (same adjudication move as
tests/test_sklearn_oracle.py made for the ai.onnx.ml conventions).

Reference analog: the ort engine consumes these graphs natively
(src/classifier.rs:348-350); numeric fidelity to the TF producer is what
"runs the official weights correctly" will ultimately mean.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from birdnet_tpu.onnx import proto as P  # noqa: E402
from test_compiler_ops import run_graph  # noqa: E402


def _i64(v):
    return np.asarray(v, dtype=np.int64)


# ---------------------------------------------------------------------------
# MelWeightMatrix vs tf.signal.linear_to_mel_weight_matrix
# ---------------------------------------------------------------------------

MEL_GRID = [
    # (num_mel, num_spectrogram_bins, sample_rate, fmin, fmax) — includes
    # the three model families' plausible geometries
    (96, 513, 48000, 0.0, 24000.0),     # BirdNET v2.4-like
    (96, 513, 32000, 50.0, 15000.0),    # v3.0-like band-limited
    (128, 513, 32000, 60.0, 16000.0),   # Perch-like
    (40, 257, 16000, 20.0, 8000.0),     # speech-standard
    (8, 65, 8000, 0.0, 4000.0),         # tiny
]


@pytest.mark.parametrize("n_mels,dft_bins,sr,fmin,fmax", MEL_GRID)
def test_mel_weight_matrix_matches_tf(n_mels, dft_bins, sr, fmin, fmax):
    (got,) = run_graph(
        [P.make_node("MelWeightMatrix", ["m", "d", "sr", "lo", "hi"], ["y"])],
        {
            "m": _i64(n_mels),
            "d": _i64((dft_bins - 1) * 2),
            "sr": _i64(sr),
            "lo": np.float32(fmin),
            "hi": np.float32(fmax),
        },
    )
    ref = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=n_mels,
        num_spectrogram_bins=dft_bins,
        sample_rate=sr,
        lower_edge_hertz=fmin,
        upper_edge_hertz=fmax,
    ).numpy()
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=2e-5)


# ---------------------------------------------------------------------------
# HannWindow vs tf.signal.hann_window
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("size", [256, 1024, 400])
def test_hann_window_matches_tf(size):
    (got,) = run_graph(
        [P.make_node("HannWindow", ["n"], ["y"])],
        {"n": _i64(size)},
    )
    ref = tf.signal.hann_window(size, periodic=True).numpy()
    np.testing.assert_allclose(got, ref, atol=1e-6)


# ---------------------------------------------------------------------------
# STFT vs tf.signal.stft
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("t,flen,step", [
    (4800, 1024, 280),   # BirdNET-like frame geometry
    (2000, 512, 160),
    (1024, 1024, 512),   # exactly one full frame + partial
])
def test_stft_matches_tf(rng, t, flen, step):
    x = rng.standard_normal(t).astype(np.float32)
    win = tf.signal.hann_window(flen, periodic=True).numpy()
    (got,) = run_graph(
        [P.make_node("STFT", ["x", "step", "win"], ["y"], onesided=1)],
        {"x": x.reshape(1, t, 1), "step": _i64(step), "win": win},
    )
    ref = tf.signal.stft(
        x, frame_length=flen, frame_step=step, fft_length=flen,
        window_fn=tf.signal.hann_window, pad_end=False,
    ).numpy()  # [frames, flen//2+1] complex64
    assert got.shape == (1, ref.shape[0], ref.shape[1], 2)
    np.testing.assert_allclose(got[0, :, :, 0], ref.real, atol=2e-3)
    np.testing.assert_allclose(got[0, :, :, 1], ref.imag, atol=2e-3)


# ---------------------------------------------------------------------------
# Full frontend: STFT → power → mel → log, TF pipeline as the oracle
# ---------------------------------------------------------------------------

def test_mel_spectrogram_frontend_matches_tf(rng):
    """The exact TF-export frontend shape the real files carry, with the
    whole reference output computed by tf.signal rather than any oracle of
    ours."""
    sr, t, flen, step, n_mels = 32000, 8000, 1024, 280, 96
    dft_bins = flen // 2 + 1
    x = (rng.standard_normal(t) * 0.3).astype(np.float32)
    win = tf.signal.hann_window(flen, periodic=True).numpy()

    (got,) = run_graph(
        [
            P.make_node("STFT", ["x", "step", "win"], ["spec"], onesided=1),
            # |z|^2 = re^2 + im^2 via Mul + ReduceSum over the last axis
            P.make_node("Mul", ["spec", "spec"], ["sq"]),
            P.make_node("ReduceSum", ["sq", "last_axis"], ["power"],
                        keepdims=0),
            P.make_node("MelWeightMatrix", ["m", "d", "srt", "lo", "hi"],
                        ["mel"]),
            P.make_node("MatMul", ["power", "mel"], ["melspec"]),
            P.make_node("Add", ["melspec", "eps"], ["shifted"]),
            P.make_node("Log", ["shifted"], ["y"]),
        ],
        {"x": x.reshape(1, t, 1), "step": _i64(step), "win": win},
        {
            "last_axis": _i64([-1]),
            "m": _i64(n_mels),
            "d": _i64(flen),
            "srt": _i64(sr),
            "lo": np.float32(0.0),
            "hi": np.float32(sr / 2),
            "eps": np.float32(1e-6),
        },
    )

    spec = tf.signal.stft(x, frame_length=flen, frame_step=step,
                          fft_length=flen,
                          window_fn=tf.signal.hann_window, pad_end=False)
    power = tf.math.real(spec * tf.math.conj(spec))
    mel = tf.signal.linear_to_mel_weight_matrix(
        num_mel_bins=n_mels, num_spectrogram_bins=dft_bins,
        sample_rate=sr, lower_edge_hertz=0.0, upper_edge_hertz=sr / 2)
    ref = tf.math.log(tf.matmul(power, mel) + 1e-6).numpy()

    assert got.shape == (1,) + ref.shape
    np.testing.assert_allclose(got[0], ref, atol=5e-3)
