"""Mel filterbank matrix per the ONNX ``MelWeightMatrix`` spec (HTK scale).

Shared by the op lowering (compiler/ops.py) and the STFT-frontend fusion
pass (compiler/fuse_frontend.py), which must materialize the matrix at
import time when the producing node feeds the fused chain.
"""

from __future__ import annotations

import numpy as np


def mel_weight_matrix(
    num_mel_bins: int,
    dft_length: int,
    sample_rate: int,
    lower_edge_hertz: float,
    upper_edge_hertz: float,
) -> np.ndarray:
    """Triangular mel filterbank ``[dft_length//2 + 1, num_mel_bins]``
    (float64; callers cast). Matches ONNX MelWeightMatrix / TF
    ``linear_to_mel_weight_matrix`` semantics."""
    n_bins = dft_length // 2 + 1

    def hz_to_mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)

    mel_edges = np.linspace(
        hz_to_mel(lower_edge_hertz), hz_to_mel(upper_edge_hertz),
        num_mel_bins + 2,
    )
    bin_freqs = np.arange(n_bins, dtype=np.float64) * sample_rate / dft_length
    bin_mels = hz_to_mel(bin_freqs)
    lower = mel_edges[:-2][None, :]
    center = mel_edges[1:-1][None, :]
    upper = mel_edges[2:][None, :]
    bm = bin_mels[:, None]
    up_slope = (bm - lower) / np.maximum(center - lower, 1e-12)
    down_slope = (upper - bm) / np.maximum(upper - center, 1e-12)
    return np.maximum(0.0, np.minimum(up_slope, down_slope))
