"""Pallas TPU kernel: fused audio frontend (framing + filterbank + log-power).

The BirdNET-style frontend is a strided Conv1d filterbank over raw audio
followed by power + log compression. Lowered naively, every segment's
144 k samples are first materialized as a frames matrix and the conv writes
a [B, F, T] activation — with overlapping segments the HBM traffic
multiplies (each audio sample is re-read once per overlapping window).

This kernel fuses the whole frontend per segment:

    HBM audio ──DMA──▶ VMEM segment buffer (int16 dequantizes in-register)
       ▼
    polyphase frame extraction (static slices) → [T, K] patches in VMEM
       ▼
    MXU matmul [T, K] @ [K, F]  →  log(x² + eps)  →  [T, F] out block

Audio is read from HBM exactly once per segment; patches, products, and the
nonlinearity never touch HBM. Grid = one program per segment.

STATUS / Mosaic constraints (measured on v5e, jax 0.9):
- Semantics are oracle-verified in interpreter mode for aligned and
  unaligned configs (tests/test_pallas_frontend.py).
- **Arbitrary hop (e.g. BirdNET's 280) cannot be lowered soundly today**:
  dynamic lane offsets must be 128-multiples, and ``ref.reshape`` is NOT a
  flat-memory view (rows pad to lane tiles, silently reinterpreting
  memory — we measured wrong results before removing it).
- The row-aligned variant (``hop % 128 == 0``, ``step % hop == 0``, 2-D
  ``[*, hop]`` audio layout, whole-row DMAs, static lane slices) compiles
  on v5e but currently FAULTS the TPU worker at run time (under
  investigation — likely the non-sublane-multiple scratch/DMA extents).
  The TPU path is therefore opt-in via ``BIRDNET_PALLAS_FRONTEND=1``.
- The production streaming path keeps XLA's conv lowering for the frontend
  (profiled at ~1% of model time, docs/performance.md); this kernel is the
  fused design for alignment-friendly frontends and documents the exact
  Mosaic pitfalls for future work (ROADMAP.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel_row_aligned(
    audio_ref,      # HBM: [total_rows, hop]
    w_ref,          # VMEM: [K, F]
    out_ref,        # VMEM block: [1, T, F]
    seg_scratch,    # VMEM: [rows, hop] audio dtype
    patch_scratch,  # VMEM: [T, K] float32
    sem,
    *,
    rows_per_step: int,
    rows: int,
    hop: int,
    kernel_size: int,
    n_frames: int,
    eps: float,
    scale: float,
):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        audio_ref.at[pl.ds(i * rows_per_step, rows), :],
        seg_scratch,
        sem,
    )
    dma.start()
    dma.wait()
    _filterbank_body(seg_scratch, w_ref, out_ref, patch_scratch,
                     hop=hop, kernel_size=kernel_size, n_frames=n_frames,
                     eps=eps, scale=scale)


def _filterbank_body(grid2d, w_ref, out_ref, patch_scratch, *,
                     hop, kernel_size, n_frames, eps, scale):
    """Shared tail: polyphase patch assembly + MXU filterbank + log-power.

    ``grid2d``: [rows, hop] ref of segment samples. Frame j is rows
    j..j+n_parts-1 concatenated, truncated to kernel_size — all static
    slices, so no Mosaic dynamic-lane constraints apply.
    """
    n_parts = -(-kernel_size // hop)
    parts = []
    for p in range(n_parts):
        width = min(hop, kernel_size - p * hop)
        part = grid2d[p: p + n_frames, :width]
        if part.dtype != jnp.float32:
            part = part.astype(jnp.float32) * scale
        parts.append(part)
    patch_scratch[:] = jnp.concatenate(parts, axis=1)
    fb = jnp.dot(patch_scratch[:], w_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(fb * fb + eps)


def _kernel_flat(
    audio_ref,      # HBM: [1, total]
    w_ref,
    out_ref,
    seg_scratch,    # VMEM: [1, rows*hop]
    patch_scratch,
    sem,
    *,
    step: int,
    rows: int,
    hop: int,
    kernel_size: int,
    n_frames: int,
    eps: float,
    scale: float,
):
    """Unaligned-config variant (interpreter mode only — see module
    docstring: the ref.reshape below is unsound under Mosaic tiling)."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        audio_ref.at[:, pl.ds(i * step, rows * hop)],
        seg_scratch,
        sem,
    )
    dma.start()
    dma.wait()
    _filterbank_body(seg_scratch.reshape(rows, hop), w_ref, out_ref,
                     patch_scratch, hop=hop, kernel_size=kernel_size,
                     n_frames=n_frames, eps=eps, scale=scale)


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

    On TPU (``interpret=False``) the config must be row-aligned:
    ``hop % 128 == 0`` and ``step % hop == 0``.
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

    row_aligned = hop % 128 == 0 and step % hop == 0
    if not interpret:
        import os

        if not os.environ.get("BIRDNET_PALLAS_FRONTEND"):
            raise NotImplementedError(
                "the compiled Pallas frontend is experimental (it can fault "
                "the TPU worker — see module docstring); set "
                "BIRDNET_PALLAS_FRONTEND=1 to opt in, or use interpret=True / "
                "the XLA conv frontend"
            )
        if not row_aligned:
            raise NotImplementedError(
                f"TPU path needs hop % 128 == 0 and step % hop == 0 "
                f"(got hop={hop}, step={step}); use interpret=True or the XLA "
                f"conv frontend (see module docstring)"
            )

    common = dict(
        rows=rows,
        hop=hop,
        kernel_size=kernel_size,
        n_frames=n_frames,
        eps=eps,
        scale=scale,
    )
    if row_aligned:
        total_rows = -(-int(audio.shape[0]) // hop)
        pad = total_rows * hop - int(audio.shape[0])
        if pad:
            audio = jnp.concatenate([audio, jnp.zeros(pad, audio.dtype)])
        audio_in = audio.reshape(total_rows, hop)
        kernel = functools.partial(
            _kernel_row_aligned, rows_per_step=step // hop, **common
        )
        seg_scratch = pltpu.VMEM((rows, hop), audio.dtype)
    else:
        audio_in = audio.reshape(1, -1)
        kernel = functools.partial(_kernel_flat, step=step, **common)
        seg_scratch = pltpu.VMEM((1, rows * hop), audio.dtype)

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
            seg_scratch,
            pltpu.VMEM((n_frames, kernel_size), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio_in, wt)


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
