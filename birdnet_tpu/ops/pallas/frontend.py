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

STATUS (measured on v5e, jax 0.9):
- **Row-aligned configs (``hop % 128 == 0``, ``step % hop == 0``) run
  correctly on TPU hardware** — oracle-verified to ~1e-3 in log space
  (tests/test_pallas_tpu.py::test_tpu_row_aligned). Design points that
  made it work: 2-D ``[*, hop]`` audio layout with whole-row DMAs; scratch
  and DMA extents padded to sublane (8-row) multiples (non-multiples FAULT
  the worker); static ``pltpu.roll`` to realign polyphase parts (Mosaic
  rejects concats of differently-offset slices); tile-padded output block;
  ``precision=HIGHEST`` on the MXU dot (the default is bf16-based and shows
  ~0.3 log-space error on near-cancelling sums — easily mistaken for a
  lowering bug).
- **Arbitrary hop (e.g. BirdNET's 280)** is covered by
  :func:`segments_filterbank_logpower`: each segment of the ``[N, S]``
  input is padded to whole ``hop``-rows and reshaped to its own
  ``[rows, hop]`` matrix XLA-side, so every segment is self-aligned and
  Pallas block pipelining moves it — no dynamic-offset DMA (whose row
  start Mosaic cannot prove tile-aligned for packed 16-bit layouts), no
  in-kernel reshape (``ref.reshape`` is NOT a flat-memory view — rows pad
  to lane tiles, silently reinterpreting memory, measured), and no
  constraint relating hop to the segment length.
- In-kernel part rolls run in f32 regardless of compute dtype: Mosaic's
  vector rotate is 32-bit-only ("Rotate with non-32-bit data", measured).
- Wired into imported graphs by compiler/fuse_frontend.py
  (``_FusedFrontend``); ineligible configs interpret the original chain.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round8(n: int) -> int:
    return -(-n // 8) * 8


def _kernel_row_aligned(
    audio_ref,      # HBM: [total_rows, hop]
    w_ref,          # VMEM: [K, F]
    out_ref,        # VMEM block: [1, T, F]
    seg_scratch,    # VMEM: [round8(rows), hop] audio dtype
    patch_scratch,  # VMEM: [round8(T), K] float32
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
    # DMA a sublane-multiple row count (scratch is padded accordingly; the
    # wrapper guarantees the audio has the extra tail rows).
    dma = pltpu.make_async_copy(
        audio_ref.at[pl.ds(i * rows_per_step, seg_scratch.shape[0]), :],
        seg_scratch,
        sem,
    )
    dma.start()
    dma.wait()
    _filterbank_body(seg_scratch, w_ref, out_ref, patch_scratch,
                     hop=hop, kernel_size=kernel_size, n_frames=n_frames,
                     eps=eps, scale=scale)


def _assemble_patch(seg, *, hop, kernel_size, t_pad, scale):
    """Polyphase frame assembly: [rows, hop] segment value → [t_pad, K]
    patch value (frame j = samples j*hop .. j*hop+K, all static slices).

    Rolls run in f32 regardless of compute dtype: Mosaic's vector rotate
    is 32-bit-only ("Rotate with non-32-bit data" — measured on v5e).
    Callers cast the returned patch to their compute dtype at the scratch
    write, so MXU operands still match the activation policy.
    """
    n_parts = -(-kernel_size // hop)
    if seg.dtype != jnp.float32:
        seg = seg.astype(jnp.float32)
    if scale != 1.0:
        # Applied for every input dtype: scale's effect must depend on its
        # value, not on whether the caller's segments were already f32.
        seg = seg * jnp.float32(scale)
    parts = []
    for p in range(n_parts):
        width = min(hop, kernel_size - p * hop)
        # Static roll realigns part p's rows to offset 0 so every slice and
        # the concat share sublane offset 0 (Mosaic rejects concats of
        # differently-offset slices). roll needs a non-negative shift;
        # rolling down by (N - p) moves row r+p to row r.
        shifted = pltpu.roll(seg, seg.shape[0] - p, 0) if p else seg
        parts.append(jax.lax.slice(shifted, (0, 0), (t_pad, width)))
    return jnp.concatenate(parts, axis=1)


def _filterbank_body(grid2d, w_ref, out_ref, patch_scratch, *,
                     hop, kernel_size, n_frames, eps, scale,
                     compute_dtype=jnp.float32, transposed_out=False):
    """Shared tail: polyphase patch assembly + MXU filterbank + log-power.

    ``grid2d``: [rows, hop] ref of segment samples. Frame j is rows
    j..j+n_parts-1 concatenated, truncated to kernel_size — all static
    slices, so no Mosaic dynamic-lane constraints apply. ``patch_scratch``
    may be sublane-padded; garbage pad rows are computed and sliced away.

    ``compute_dtype=float32`` uses a HIGHEST-precision dot (true-f32 MXU
    passes; the default TPU precision is bf16-based and shows ~0.3
    log-space error on near-cancelling sums). bf16 matches the engine's
    ``fast``/``bf16`` activation policies — the same operand width the
    XLA conv lowering uses there.
    """
    patch = _assemble_patch(
        grid2d[:], hop=hop, kernel_size=kernel_size,
        t_pad=patch_scratch.shape[0], scale=scale,
    )
    patch_scratch[:] = patch.astype(patch_scratch.dtype)
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else None)
    if transposed_out:
        # [F, K] x [T, K] -> [F, T]: the mel-image orientation downstream
        # convs consume ([N, 1, F, T]) — computing it on the MXU directly
        # avoids an XLA-side transpose of the whole output.
        fb = jax.lax.dot_general(
            w_ref[:], patch_scratch[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec,
        )
    else:
        fb = jnp.dot(patch_scratch[:], w_ref[:],
                     preferred_element_type=jnp.float32, precision=prec)
    fb = fb.astype(jnp.float32)
    res = jnp.log(fb * fb + eps)
    if out_ref.shape[1] == res.shape[0]:
        out_ref[0] = res.astype(out_ref.dtype)
    else:
        out_ref[0] = res[: out_ref.shape[1]].astype(out_ref.dtype)


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

    ``audio``: 1-D float32 or int16; ``scale`` is applied in-kernel to
    EVERY input dtype (the default dequantizes int16 — pass ``scale=1.0``
    for audio that is already in [-1, 1)). ``weights``: [F, K] filterbank
    (Conv1d weight layout ``[F, 1, K]`` squeezed). Returns
    ``[n_segments, T, F]`` log-power, where
    ``T = (sample_count - kernel_size) // hop + 1``.

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
    if not interpret and not row_aligned:
        raise NotImplementedError(
            f"compiled TPU path needs hop % 128 == 0 and step % hop == 0 "
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
        # Sublane-multiple allocation: enough rows that every static part
        # slice [p : p + round8(T)] stays in bounds.
        t_pad = _round8(n_frames)
        rows_alloc = _round8(n_parts - 1 + t_pad)
        rows_per_step = step // hop
        need_rows = (n_segments - 1) * rows_per_step + rows_alloc
        total_rows = max(-(-int(audio.shape[0]) // hop), need_rows)
        pad = total_rows * hop - int(audio.shape[0])
        if pad:
            audio = jnp.concatenate([audio, jnp.zeros(pad, audio.dtype)])
        audio_in = audio.reshape(total_rows, hop)
        kernel = functools.partial(
            _kernel_row_aligned, rows_per_step=rows_per_step, **common
        )
        seg_scratch = pltpu.VMEM((rows_alloc, hop), audio.dtype)
        patch_rows = t_pad
        out_rows = t_pad
        out_cols = -(-n_filters // 128) * 128
    else:
        audio_in = audio.reshape(1, -1)
        kernel = functools.partial(_kernel_flat, step=step, **common)
        seg_scratch = pltpu.VMEM((1, rows * hop), audio.dtype)
        patch_rows = n_frames
        out_rows = n_frames
        out_cols = n_filters

    wt_padded = (
        jnp.pad(wt, ((0, 0), (0, out_cols - n_filters)))
        if out_cols != n_filters
        else wt
    )
    return pl.pallas_call(
        kernel,
        grid=(n_segments,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),  # audio stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # filterbank resident
        ],
        out_specs=pl.BlockSpec(
            (1, out_rows, out_cols),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (n_segments, out_rows, out_cols), jnp.float32
        ),
        scratch_shapes=[
            seg_scratch,
            pltpu.VMEM((patch_rows, kernel_size), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(audio_in, wt_padded)[:, :n_frames, :n_filters]


def _kernel_prefolded(
    rows_ref,        # VMEM block: [1, rows_alloc, hop] (auto-pipelined)
    w_ref,           # VMEM: [F_pad, K] (compute dtype)
    out_ref,         # VMEM block: [1, F_pad, t_pad]
    patch_scratch,   # VMEM: [t_pad, K] compute dtype
    *,
    hop: int,
    kernel_size: int,
    n_frames: int,
    eps: float,
    scale: float,
    compute_dtype,
):
    """Arbitrary-hop variant over pre-folded segments.

    Each segment arrives as its OWN ``[rows_alloc, hop]`` row matrix
    (a free per-row pad+reshape on the [N, S] input), so row 0 lane 0 is
    exactly the segment's sample 0 — no dynamic-offset DMA (whose row
    start Mosaic cannot prove tile-aligned for packed 16-bit layouts,
    measured on v5e) and no phase realign. Pallas block pipelining
    overlaps the per-segment transfer with compute.
    """
    _filterbank_body(rows_ref[0], w_ref, out_ref, patch_scratch,
                     hop=hop, kernel_size=kernel_size, n_frames=n_frames,
                     eps=eps, scale=scale, compute_dtype=compute_dtype,
                     transposed_out=True)


def segments_filterbank_logpower(
    segments: jax.Array,
    weights: jax.Array,
    *,
    hop: int,
    eps: float = 1e-6,
    scale: float = 1.0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused frontend over pre-sliced segments ``[N, S]`` at ANY hop.

    The arbitrary-hop successor to :func:`frame_filterbank_logpower`
    (which requires ``hop % 128 == 0``): each segment is padded to a
    whole number of ``hop``-wide rows and reshaped to its own
    ``[rows_alloc, hop]`` matrix (a per-row pad+reshape XLA fuses into
    the producer chain), so every segment is self-aligned — row 0 lane 0
    IS sample 0. No dynamic-offset DMA, no phase constraint, any hop.

    ``segments``: [N, S], already scaled (pass ``scale`` otherwise).
    ``compute_dtype``: bf16 matches the engine's ``fast``/``bf16``
    activation policies (same MXU operand width as the XLA conv lowering
    it replaces) and is also the output dtype; f32 uses a
    HIGHEST-precision dot and f32 output.
    Returns ``[N, F, T]`` log-power — the mel-image orientation, computed
    on the MXU directly so no whole-output transpose is needed.
    """
    weights = jnp.asarray(weights)
    if weights.ndim == 3:
        weights = weights[:, 0, :]
    n_filters, kernel_size = weights.shape
    n, sample_count = segments.shape
    n_frames = (sample_count - kernel_size) // hop + 1
    n_parts = -(-kernel_size // hop)
    t_pad = _round8(n_frames)
    rows_alloc = _round8(t_pad + n_parts)
    pad = rows_alloc * hop - sample_count
    if pad < 0:
        raise ValueError(
            f"segment of {sample_count} samples exceeds the "
            f"{rows_alloc}x{hop} row allocation"
        )
    if pad:
        segments = jnp.pad(segments, ((0, 0), (0, pad)))
    rows3 = segments.reshape(n, rows_alloc, hop)

    f_pad = -(-n_filters // 8) * 8
    wf = weights.astype(compute_dtype)  # [F, K]
    if f_pad != n_filters:
        wf = jnp.pad(wf, ((0, f_pad - n_filters), (0, 0)))
    out_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                 else jnp.float32)

    kernel = functools.partial(
        _kernel_prefolded,
        hop=hop,
        kernel_size=kernel_size,
        n_frames=n_frames,
        eps=eps,
        scale=scale,
        compute_dtype=compute_dtype,
    )
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows_alloc, hop), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, f_pad, t_pad), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, f_pad, t_pad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((t_pad, kernel_size), compute_dtype),
        ],
        interpret=interpret,
    )(rows3, wf)[:, :n_filters, :n_frames]


def _kernel_stft_prefolded(
    rows_ref,        # VMEM block: [1, rows_alloc, hop] (auto-pipelined)
    bc_ref,          # VMEM: [flen, bins_pad] windowed cos basis
    bs_ref,          # VMEM: [flen, bins_pad] windowed sin basis
    mel_ref,         # VMEM: [bins_pad, m_pad] mel weights (zero pad rows)
    out_ref,         # VMEM block: [1, m_pad, t_pad]
    patch_scratch,   # VMEM: [t_pad, flen] compute dtype
    *,
    hop: int,
    frame_length: int,
    n_frames: int,
    eps: float,
    scale: float,
    compute_dtype,
):
    """STFT-form frontend over pre-folded segments: framing + windowed DFT
    (two MXU matmuls) + power + mel projection (MXU) + log, all in VMEM.

    The Hann window is folded into the DFT basis rows host-side
    (frames*win @ B == frames @ diag(win)B), so framing feeds the MXU
    directly. The basis carries only the mel filterbank's nonzero bin
    support (its zero rows contribute nothing to the projection), which
    cuts DFT columns ~bins → support — a truncation XLA cannot discover
    from the unfused graph.
    """
    patch = _assemble_patch(
        rows_ref[0], hop=hop, kernel_size=frame_length,
        t_pad=patch_scratch.shape[0], scale=scale,
    )
    patch_scratch[:] = patch.astype(patch_scratch.dtype)
    prec = (jax.lax.Precision.HIGHEST
            if compute_dtype == jnp.float32 else None)
    c = jnp.dot(patch_scratch[:], bc_ref[:],
                preferred_element_type=jnp.float32, precision=prec)
    s = jnp.dot(patch_scratch[:], bs_ref[:],
                preferred_element_type=jnp.float32, precision=prec)
    power = (c * c + s * s).astype(mel_ref.dtype)  # [t_pad, bins_pad]
    # [bins_pad, M] x [t_pad, bins_pad] -> [M, t_pad]: the mel-image
    # orientation downstream convs consume, straight off the MXU.
    fb = jax.lax.dot_general(
        mel_ref[:], power,
        dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )
    out_ref[0] = jnp.log(fb + eps).astype(out_ref.dtype)


def segments_stft_melspec(
    segments: jax.Array,
    window: jax.Array,
    mel: jax.Array,
    *,
    hop: int,
    frame_length: int,
    eps: float = 1e-6,
    scale: float = 1.0,
    compute_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jax.Array:
    """Fused STFT→power→mel→log frontend over segments ``[N, S]``, any hop.

    The TF-export-style spectrogram stage (ONNX ``STFT`` →
    ``ReduceSumSquare`` → mel ``MatMul`` → ``Add(eps)`` → ``Log``) as one
    Pallas kernel per segment, using the same pre-folded row layout as
    :func:`segments_filterbank_logpower`. ``window``: [flen] analysis
    window (folded into the DFT basis). ``mel``: [bins, M] filterbank
    (``bins = flen//2 + 1``, onesided). Returns ``[N, M, T]`` log-mel in
    the mel-image orientation, ``T = (S - flen)//hop + 1``.

    ``compute_dtype=bf16`` matches the engine's ``fast``/``bf16``
    policies (the XLA STFT lowering uses bf16 DFT operands there too);
    f32 uses HIGHEST-precision dots and f32 output.
    """
    segments = jnp.asarray(segments)
    window = np.asarray(window, np.float32).reshape(-1)
    mel = np.asarray(mel, np.float32)
    flen = int(window.shape[0])
    bins, n_mels = mel.shape
    if bins != flen // 2 + 1:
        raise ValueError(
            f"mel rows ({bins}) must equal flen//2+1 ({flen // 2 + 1})"
        )
    n, sample_count = segments.shape
    n_frames = (sample_count - flen) // hop + 1
    if n_frames <= 0:
        raise ValueError(
            f"segment of {sample_count} samples shorter than one "
            f"{flen}-sample frame"
        )
    n_parts = -(-flen // hop)
    t_pad = _round8(n_frames)
    rows_alloc = _round8(t_pad + n_parts)
    pad = rows_alloc * hop - sample_count
    if pad < 0:
        raise ValueError(
            f"segment of {sample_count} samples exceeds the "
            f"{rows_alloc}x{hop} row allocation"
        )
    if pad:
        segments = jnp.pad(segments, ((0, 0), (0, pad)))
    rows3 = segments.reshape(n, rows_alloc, hop)

    # Restrict the DFT to the mel filterbank's nonzero bin support.
    nz = np.flatnonzero(np.abs(mel).max(axis=1) > 0.0)
    lo_bin = int(nz[0]) if nz.size else 0
    hi_bin = int(nz[-1]) + 1 if nz.size else 1
    bins_u = hi_bin - lo_bin
    bins_pad = -(-bins_u // 128) * 128
    m_pad = -(-n_mels // 8) * 8

    ang = (-2.0 * np.pi / flen) * np.outer(
        np.arange(flen, dtype=np.float64),
        np.arange(lo_bin, hi_bin, dtype=np.float64),
    )
    wcol = window.astype(np.float64)[:, None]
    bc = np.zeros((flen, bins_pad), np.float32)
    bs = np.zeros((flen, bins_pad), np.float32)
    bc[:, :bins_u] = (np.cos(ang) * wcol).astype(np.float32)
    bs[:, :bins_u] = (np.sin(ang) * wcol).astype(np.float32)
    mel_used = np.zeros((bins_pad, m_pad), np.float32)
    mel_used[:bins_u, :n_mels] = mel[lo_bin:hi_bin]

    out_dtype = (jnp.bfloat16 if compute_dtype == jnp.bfloat16
                 else jnp.float32)
    kernel = functools.partial(
        _kernel_stft_prefolded,
        hop=hop,
        frame_length=flen,
        n_frames=n_frames,
        eps=eps,
        scale=scale,
        compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, rows_alloc, hop), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, m_pad, t_pad), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, m_pad, t_pad), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((t_pad, flen), compute_dtype),
        ],
        interpret=interpret,
    )(
        rows3,
        jnp.asarray(bc, compute_dtype),
        jnp.asarray(bs, compute_dtype),
        jnp.asarray(mel_used, compute_dtype),
    )
    return out[:, :n_mels, :n_frames]


def stft_melspec_reference(
    segments: np.ndarray,
    window: np.ndarray,
    mel: np.ndarray,
    *,
    hop: int,
    eps: float = 1e-6,
    scale: float = 1.0,
) -> np.ndarray:
    """Numpy oracle for :func:`segments_stft_melspec` (f64 host math)."""
    segments = np.asarray(segments, np.float64) * scale
    window = np.asarray(window, np.float64).reshape(-1)
    mel = np.asarray(mel, np.float64)
    flen = window.shape[0]
    n, sample_count = segments.shape
    n_frames = (sample_count - flen) // hop + 1
    n_mels = mel.shape[1]
    out = np.empty((n, n_mels, n_frames), np.float64)
    for i in range(n):
        frames = np.stack(
            [segments[i, j * hop: j * hop + flen] for j in range(n_frames)]
        )
        spec = np.fft.rfft(frames * window[None, :], axis=-1)
        power = spec.real**2 + spec.imag**2  # [T, bins]
        out[i] = np.log(power @ mel + eps).T
    return out.astype(np.float32)


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
    audio = np.asarray(audio).astype(np.float32)
    # Matches the kernel (_assemble_patch): scale applies to EVERY input
    # dtype — its effect must not depend on whether audio arrived as int16
    # or as an already-converted float32 of the same values.
    if scale != 1.0:
        audio = audio * np.float32(scale)
    out = np.empty((n_segments, n_frames, n_filters), np.float32)
    for i in range(n_segments):
        seg = audio[i * step: i * step + sample_count]
        patches = np.stack(
            [seg[j * hop: j * hop + kernel_size] for j in range(n_frames)]
        )
        fb = patches @ weights.T
        out[i] = np.log(fb * fb + eps)
    return out
