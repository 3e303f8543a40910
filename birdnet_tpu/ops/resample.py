"""Device-side polyphase audio resampling.

The reference rejects WAVs whose sample rate differs from the model's
(reference: birdnet-analyze.rs:448-455), forcing users to resample offline.
Here resampling is a rational polyphase filter expressed as a single
``lax.conv_general_dilated`` (upsample-by-L via ``lhs_dilation``, windowed-
sinc low-pass, downsample-by-M via ``window_strides``) — exactly the shape
the MXU/VPU likes, so a whole recording resamples on-device in one fused op.

Matches ``scipy.signal.resample_poly`` semantics (Kaiser-windowed sinc,
same padding) within float tolerance; tested against it.
"""

from __future__ import annotations

import math
from fractions import Fraction
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def design_kaiser_sinc(L: int, M: int, beta: float = 5.0, window_mult: int = 10) -> np.ndarray:
    """Windowed-sinc low-pass for rational L/M resampling (the filter
    ``scipy.signal.resample_poly`` designs by default)."""
    max_rate = max(L, M)
    f_c = 1.0 / max_rate  # cutoff in normalized (Nyquist=1) units
    half_len = window_mult * max_rate
    n = np.arange(-half_len, half_len + 1, dtype=np.float64)
    sinc = np.sinc(n * f_c) * f_c
    window = np.kaiser(2 * half_len + 1, beta)
    h = sinc * window
    h /= h.sum()  # unity DC gain (scipy firwin scale=True)
    return (h * L).astype(np.float64)


def resample_poly(
    samples,
    orig_rate: int,
    target_rate: int,
    dtype=jnp.float32,
) -> jax.Array:
    """Resample 1-D audio from ``orig_rate`` to ``target_rate`` on device.

    Output length = ceil(len(samples) * L / M) for the reduced ratio L/M,
    matching scipy.signal.resample_poly.
    """
    if orig_rate == target_rate:
        return jnp.asarray(samples, dtype=dtype)
    frac = Fraction(target_rate, orig_rate)
    L, M = frac.numerator, frac.denominator
    x = jnp.asarray(samples, dtype=dtype).reshape(1, 1, -1)
    n_in = x.shape[-1]
    n_out = -(-n_in * L // M)

    h = design_kaiser_sinc(L, M)
    half = (len(h) - 1) // 2
    w = jnp.asarray(h[::-1].copy(), dtype=dtype).reshape(1, 1, -1)

    # Align so output sample j corresponds to input time j*M/L, like scipy:
    # upsampled index of output j is j*M; the filter is centered (half taps
    # each side) → pad with zeros via conv padding.
    dn = lax.ConvDimensionNumbers((0, 1, 2), (0, 1, 2), (0, 1, 2))
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=[M],
        padding=[(half, half + L * M)],  # generous tail; trimmed below
        lhs_dilation=[L],
        dimension_numbers=dn,
        preferred_element_type=jnp.float32,
        # Strict f32: XLA's default would run this f32 conv as a single
        # bf16 pass on TPU (~2e-3 relative ≈ 54 dB SNR on the resampled
        # audio, which is then requantized to int16). Resampling is one
        # conv per recording, so exactness costs nothing.
        precision=lax.Precision.HIGHEST,
    )
    return y[0, 0, :n_out].astype(dtype)


def resample_audio(
    samples: np.ndarray,
    orig_rate: int,
    target_rate: int,
    out_dtype=np.float32,
) -> np.ndarray:
    """Resample PCM audio (int16 or float32 in) to ``target_rate`` on
    device, returning host ``out_dtype`` (int16 requantizes for the
    streaming engine's raw-PCM upload path). Shared by the CLI and
    ``Classifier.analyze_wav``."""
    samples = np.asarray(samples)
    if samples.dtype == np.int16:
        f32 = samples.astype(np.float32) / 32768.0
    else:
        f32 = samples.astype(np.float32)
    y = np.asarray(resample_poly(f32, orig_rate, target_rate))
    if np.dtype(out_dtype) == np.int16:
        return np.clip(y * 32768.0, -32768, 32767).astype(np.int16)
    return y.astype(out_dtype)


def resample_host(samples: np.ndarray, orig_rate: int, target_rate: int) -> np.ndarray:
    """Host fallback using scipy (same algorithm)."""
    from scipy.signal import resample_poly as scipy_resample

    frac = Fraction(target_rate, orig_rate)
    return scipy_resample(
        np.asarray(samples, dtype=np.float64), frac.numerator, frac.denominator
    ).astype(np.float32)
