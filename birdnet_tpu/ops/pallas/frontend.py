"""Pallas TPU kernel: fused audio frontend (framing + filterbank + log-power).

The BirdNET-style frontend is a strided Conv1d filterbank over raw audio
followed by power + log compression. Lowered naively, every segment's
144 k samples are first materialized as a frames matrix and the conv writes
a [B, F, T] activation — with overlapping segments the HBM traffic
multiplies (each audio sample is re-read once per overlapping window).

This kernel fuses the whole frontend per segment:

    HBM audio (1-D, int16 or f32) ──DMA──▶ VMEM segment buffer
       │ (int16 path dequantizes in-register: x/32768)
       ▼
    frame extraction (static hop) → [T, K] patch matrix in VMEM
       ▼
    MXU matmul [T, K] @ [K, F]  →  log(x² + eps)  →  [T, F] out block

Audio is read from HBM exactly once per segment; patches, products, and the
nonlinearity never touch HBM. Grid = one program per segment; segment start
offsets are ``program_id * step`` (static step), so overlapping segments
share the same HBM buffer without host-side duplication.

STATUS: semantics validated against the numpy oracle (interpret mode, see
tests/test_pallas_frontend.py). On-TPU compilation is blocked by current
Mosaic tiling rules: a (1, N) HBM memref is lane-tiled (1, 128), and DMA
slices of raw 1-D audio need offsets/sizes that are 128-multiples — false
for arbitrary hop/step (e.g. hop 280, step 72000). The production streaming
path therefore keeps XLA's conv lowering for the frontend, which profiling
shows is ~1% of model time (docs/performance.md); this kernel documents the
fused design for when Mosaic lifts the restriction (or for hop/step choices
that are 128-aligned).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _frontend_kernel(
    audio_ref,  # HBM: [total_samples] int16 or float32
    w_ref,      # VMEM: [K, F] filterbank (transposed conv weight)
    out_ref,    # VMEM block: [1, T, F]
    seg_scratch,  # VMEM: [1, S] audio dtype
    patch_scratch,  # VMEM: [T, K] float32
    sem,        # DMA semaphore
    *,
    step: int,
    sample_count: int,
    hop: int,
    kernel_size: int,
    n_frames: int,
    eps: float,
    scale: float,
):
    n_parts_ = -(-kernel_size // hop)
    rows_ = n_frames + n_parts_ - 1
    i = pl.program_id(0)
    start = i * step

    # One DMA per segment: HBM audio span → VMEM (audio is [1, total]).
    dma = pltpu.make_async_copy(
        audio_ref.at[:, pl.ds(start, rows_ * hop)],
        seg_scratch,
        sem,
    )
    dma.start()
    dma.wait()

    # Polyphase frame extraction — all static shapes/offsets (Mosaic requires
    # 128-aligned *dynamic* lane offsets; hop is arbitrary, so dynamic
    # per-frame slicing is out). View the segment as [rows, hop]; frame j is
    # rows j..j+n_parts-1 concatenated, truncated to kernel_size:
    #   patches = [A[0:T] | A[1:T+1] | ... | A[p:T+p][:, :tail]]
    n_parts = -(-kernel_size // hop)
    rows = n_frames + n_parts - 1
    # Ref-level 2D view (Mosaic supports 2D→2D ref reshape; 1D refs don't
    # reshape, hence the [1, rows*hop] scratch).
    grid2d = seg_scratch.reshape(rows, hop)
    parts = []
    for p in range(n_parts):
        width = min(hop, kernel_size - p * hop)
        part = grid2d[p: p + n_frames, :width]
        if part.dtype != jnp.float32:
            part = part.astype(jnp.float32) * scale
        parts.append(part)
    patch_scratch[:] = jnp.concatenate(parts, axis=1)

    # Filterbank on the MXU + fused log-power.
    fb = jnp.dot(
        patch_scratch[:],
        w_ref[:],
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = jnp.log(fb * fb + eps)


def frame_filterbank_logpower(
    audio: jax.Array,
    weights: jax.Array,
    *,
    n_segments: int,
    step: int,
    sample_count: int,
    hop: int,
    eps: float = 1e-6,
    scale: float = 1.0 / 32768.0,
    interpret: bool = False,
) -> jax.Array:
    """Fused frontend over ``n_segments`` overlapping segments of ``audio``.

    ``audio``: 1-D float32 (pre-scaled) or int16 (dequantized in-kernel by
    ``scale``). ``weights``: [F, K] filterbank (Conv1d weight layout
    ``[F, 1, K]`` squeezed). Returns ``[n_segments, T, F]`` log-power,
    where ``T = (sample_count - kernel_size) // hop + 1``.
    """
    weights = jnp.asarray(weights)
    if weights.ndim == 3:
        weights = weights[:, 0, :]
    n_filters, kernel_size = weights.shape
    n_frames = (sample_count - kernel_size) // hop + 1
    n_parts = -(-kernel_size // hop)
    rows = n_frames + n_parts - 1
    need = (n_segments - 1) * step + rows * hop
    audio = jnp.asarray(audio)
    if audio.shape[0] < need:
        raise ValueError(
            f"audio too short: need {need} samples for {n_segments} segments "
            f"(have {audio.shape[0]}); pad before calling"
        )
    wt = weights.T  # [K, F] for the MXU

    kernel = functools.partial(
        _frontend_kernel,
        step=step,
        sample_count=sample_count,
        hop=hop,
        kernel_size=kernel_size,
        n_frames=n_frames,
        eps=eps,
        scale=scale,
    )
    return pl.pallas_call(
        kernel,
        grid=(n_segments,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # filterbank resident
        ],
        out_specs=pl.BlockSpec(
            (1, n_frames, n_filters),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_segments, n_frames, n_filters), jnp.float32
        ),
        scratch_shapes=[
            pltpu.VMEM((1, rows * hop), audio.dtype),
            pltpu.VMEM((n_frames, kernel_size), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio.reshape(1, -1), wt)


def frontend_reference(
    audio: np.ndarray,
    weights: np.ndarray,
    *,
    n_segments: int,
    step: int,
    sample_count: int,
    hop: int,
    eps: float = 1e-6,
    scale: float = 1.0 / 32768.0,
) -> np.ndarray:
    """Numpy oracle for the kernel (same math, host-side)."""
    weights = np.asarray(weights)
    if weights.ndim == 3:
        weights = weights[:, 0, :]
    n_filters, kernel_size = weights.shape
    n_frames = (sample_count - kernel_size) // hop + 1
    audio = np.asarray(audio)
    if audio.dtype != np.float32:
        audio = audio.astype(np.float32) * scale
    out = np.empty((n_segments, n_frames, n_filters), np.float32)
    for i in range(n_segments):
        seg = audio[i * step: i * step + sample_count]
        patches = np.stack(
            [seg[j * hop: j * hop + kernel_size] for j in range(n_frames)]
        )
        fb = patches @ weights.T
        out[i] = np.log(fb * fb + eps)
    return out
