"""Streaming whole-file inference: segment, classify, and select top-K for an
entire recording inside XLA programs, with minimal host↔device traffic.

The reference CLI chunks audio on the host and round-trips every batch
through the session (reference: birdnet-analyze.rs:707-743, :562-635) —
fine over PCIe, ruinous over thin links, and wasteful everywhere: with
overlap the host re-uploads shared samples once per overlapping segment.

TPU-native design:

- audio uploads ONCE per superchunk (optionally as int16 — WAV's native
  width — halving bytes; the ``/32768`` scale runs on device);
- segmentation is a device-side gather (``vmap(dynamic_slice)``) inside the
  jitted program — overlapping segments share the uploaded samples;
- a ``lax.scan`` over batch tiles runs the model + fused top-K for the whole
  superchunk in ONE dispatch;
- the host reads back only ``[n_segments, K]`` confidences + indices
  (~80 bytes/segment vs 576 KB/segment uploaded by the per-batch path).

Superchunks bound both compile variants (tile counts are bucketed) and the
cancellation/timeout granularity: options are honored between superchunk
dispatches, like the reference honors them between batches.
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .._demux import demux_indices
from ..errors import InferenceError
from ..inference_options import InferenceOptions
from ..types import ModelConfig
from .engine import _wait
from .importer import ImportedModel, make_forward

# Tile-count buckets per dispatch: bounded compile variants, ≤33% padding
# waste. Max 96 tiles (= 12,288 segments at tile 128 ≈ 10 h of 3 s audio,
# ~3.5 GB int16 on device): same-process A/B on v5e measured 64 → 24.1k,
# 96 → 26.6k, 128 → 26.5k seg/s — dispatch overhead keeps amortizing to
# 96 tiles and flattens there (the earlier "plateau past 48" came from
# noisier cross-invocation runs).
_TILE_BUCKETS = (1, 2, 3, 4, 6, 8, 12, 16, 24, 32, 48, 64, 96)
MAX_TILES = _TILE_BUCKETS[-1]

# Superchunk cap when a cancellation/timeout monitor is active: a cancel
# can only strand work already committed to the device, so monitored runs
# dispatch 16-tile superchunks (2,048 segments at tile 128, ~80 ms of chip
# work) instead of 96-tile ones (~10 h of audio). Unmonitored runs keep
# the full-size superchunks and their throughput (the reference's
# RunOptions::terminate stops within ~10 ms; this bounds the analogous
# abandoned work, reference: src/classifier.rs:527-554).
MONITORED_MAX_TILES = 16


def _bucket_tiles(n: int) -> int:
    for b in _TILE_BUCKETS:
        if n <= b:
            return b
    return MAX_TILES


# Precision policies whose activations are bf16: frames can be cast to bf16
# right after the int16 scale, so the fused slice→scale→cast chain writes
# half the bytes and the f32 frames tensor never exists in HBM.
_BF16_ACTIVATION_POLICIES = frozenset(("fast", "bf16"))


def prepare_frames(frames, precision: str):
    """Scale int16 frames to float and apply the activation-precision cast."""
    if frames.dtype != jnp.float32:
        frames = frames.astype(jnp.float32) * (1.0 / 32768.0)
    if precision in _BF16_ACTIVATION_POLICIES:
        frames = frames.astype(jnp.bfloat16)
    return frames


def frame_tile(audio, tile_idx, tile: int, step: int, S: int):
    """Slice one tile's [tile, S] frames out of the device-resident audio.

    Zero-overlap audio arrives pre-shaped [rows, S] (a free host-side view),
    so framing is a contiguous 2-D row slice — no 1-D slice + reshape
    relayout on device. Overlapping audio stays 1-D; the static intra-span
    offsets fuse into plain copies.
    """
    if step == S:
        return lax.dynamic_slice(audio, (tile_idx * tile, 0), (tile, S))
    span = (tile - 1) * step + S
    sp = lax.dynamic_slice(audio, (tile_idx * tile * step,), (span,))
    return jnp.stack(
        [lax.slice_in_dim(sp, i * step, i * step + S) for i in range(tile)]
    )


def audio_device_shape(n_tiles: int, tile: int, step: int, S: int):
    """Device-side audio shape for a dispatch (2-D rows when overlap-free)."""
    if step == S:
        return (n_tiles * tile, S)
    return ((n_tiles * tile - 1) * step + S,)


def chunk_to_device_layout(chunk: np.ndarray, step: int, S: int) -> np.ndarray:
    """Host-side reshape matching :func:`audio_device_shape` (free view)."""
    if step == S:
        return chunk.reshape(-1, S)
    return chunk


class StreamingEngine:
    """Whole-recording analysis with one dispatch per superchunk."""

    def __init__(
        self,
        imported: ImportedModel,
        config: ModelConfig,
        device=None,
        precision: Optional[str] = None,
        top_k: int = 10,
        tile: Optional[int] = None,
        params=None,
        species_mask=None,
    ):
        from ..runtime import default_device, init_runtime

        init_runtime()
        self.device = device if device is not None else default_device()
        on_tpu = self.device.platform in ("tpu", "axon")
        if precision is None:
            # "fast" (bf16 activations, f32 accumulation) is the streaming
            # default on TPU: measured top-1 IDENTICAL to "mixed" (0.9998
            # agreement, 0.0000 top-1 confidence delta on 4,096 segments)
            # at +28-64% sustained throughput. Embedding extraction follows
            # the engine precision — build with .precision("mixed"/"fp32")
            # when full-precision embeddings matter.
            precision = "fast" if on_tpu else "fp32"
        self.precision = precision
        self.config = config
        # max(0, …) like InferenceEngine: top_k=0 must behave identically
        # on the predict and analyze paths (lax.top_k handles k=0).
        self.top_k = max(0, min(top_k, config.num_species))
        self.species_mask = (
            None if species_mask is None else np.asarray(species_mask, bool)
        )
        # Tile 128 keeps the MXU fed (measured 2.6× over 32 on v5e: small
        # channel counts need a big batch dimension for utilization).
        self.tile = tile if tile is not None else (128 if on_tpu else 32)
        self._forward = make_forward(imported, precision=precision)
        # Reuse already-resident device params when provided (avoids a second
        # HBM copy when sharing with an InferenceEngine).
        self.params = (
            params if params is not None else jax.device_put(imported.params, self.device)
        )
        self.logits_index, self.embed_index = demux_indices(config.model_type)
        self._compiled: Dict[Tuple, object] = {}
        self._lock = threading.Lock()

    # -- program ---------------------------------------------------------

    def _compile(self, n_tiles: int, step: int, dtype,
                 with_embeddings: bool = False,
                 with_mask: bool = False) -> object:
        key = (n_tiles, step, np.dtype(dtype).name, with_embeddings,
               with_mask)
        fn = self._compiled.get(key)
        if fn is not None:
            return fn
        with self._lock:
            fn = self._compiled.get(key)
            if fn is not None:
                return fn
            S = self.config.sample_count
            tile = self.tile
            k = self.top_k
            forward = self._forward
            precision = self.precision
            logits_index = self.logits_index
            embed_index = self.embed_index if with_embeddings else None
            mask = (
                None if self.species_mask is None
                else jnp.asarray(self.species_mask)
            )
            from ..ops.topk import fused_sigmoid_topk

            def run(params, audio, run_mask):
                def body(_, tile_idx):
                    # Framing + int16 scale + activation cast INSIDE the tile
                    # body: the chain fuses into one pass instead of
                    # materializing a float32 copy of the whole superchunk
                    # (4.7 GB at 64 tiles).
                    frames = prepare_frames(
                        frame_tile(audio, tile_idx, tile, step, S), precision
                    )
                    outs = forward(params, frames)
                    logits = outs[logits_index]
                    result = fused_sigmoid_topk(
                        logits, k, mask, run_mask, idx_dtype=jnp.int32
                    )
                    if embed_index is not None:
                        result = result + (outs[embed_index],)
                    return None, result

                _, results = lax.scan(body, None, jnp.arange(n_tiles))
                conf, idx = results[0], results[1]
                out = (conf.reshape(-1, k), idx.reshape(-1, k))
                if embed_index is not None:
                    emb = results[2]
                    out = out + (emb.reshape((-1,) + emb.shape[2:]),)
                return out

            if with_mask:
                # Per-call [num_species] candidate mask (one species list
                # per analyze request — per-request lists in serving).
                def program(params, audio, run_mask):
                    return run(params, audio, run_mask)
            else:
                def program(params, audio):
                    return run(params, audio, None)

            jitted = jax.jit(program)
            sharding = jax.sharding.SingleDeviceSharding(self.device)
            params_spec = jax.tree.map(
                lambda p: jax.ShapeDtypeStruct(p.shape, p.dtype, sharding=sharding),
                self.params,
            )
            audio_spec = jax.ShapeDtypeStruct(
                audio_device_shape(n_tiles, tile, step, S), dtype,
                sharding=sharding,
            )
            specs = (params_spec, audio_spec)
            if with_mask:
                specs = specs + (jax.ShapeDtypeStruct(
                    (self.config.num_species,), jnp.bool_, sharding=sharding
                ),)
            try:
                fn = jitted.lower(*specs).compile()
            except Exception as e:  # noqa: BLE001
                raise InferenceError(f"XLA compilation failed: {e}") from e
            self._compiled[key] = fn
            return fn

    # -- execution -------------------------------------------------------

    def analyze(
        self,
        samples: np.ndarray,
        overlap_seconds: float = 0.0,
        options: Optional[InferenceOptions] = None,
        with_embeddings: bool = False,
        n_segments: Optional[int] = None,
        species_mask=None,
    ):
        """Classify every (overlapping) segment of ``samples``.

        ``samples``: 1-D float32 (or int16, uploaded raw and scaled
        on-device). Returns ``(confidences [N, K], indices [N, K],
        start_times [N])`` — plus ``embeddings [N, E]`` appended when
        ``with_embeddings`` (v3.0/Perch only) — with segments in file
        order: the streaming equivalent of the reference CLI's
        chunk → predict_batch loop. ``species_mask``: optional per-call
        bool [num_species] candidate mask.
        """
        return streaming_analyze(
            self,
            samples,
            overlap_seconds,
            options,
            with_embeddings,
            n_segments,
            place=lambda chunk: jax.device_put(chunk, self.device),
            species_mask=species_mask,
        )

    def warmup(self, n_tiles: int = MAX_TILES, overlap_seconds: float = 0.0,
               dtype=np.float32) -> None:
        step = self.config.sample_count - int(overlap_seconds * self.config.sample_rate)
        if step <= 0 or overlap_seconds < 0:
            # Same guard as streaming_analyze: warming a never-usable
            # variant would be an expensive compile (or an opaque crash).
            raise InferenceError(
                "overlap must be in [0, segment duration) seconds"
            )
        self._compile(n_tiles, step, dtype)


def streaming_analyze(
    eng,
    samples: np.ndarray,
    overlap_seconds: float,
    options: Optional[InferenceOptions],
    with_embeddings: bool,
    n_segments: Optional[int],
    place,
    species_mask=None,
):
    """The superchunk dispatch loop, shared by the single-device and
    mesh-sharded streaming engines. ``eng`` provides ``config``, ``tile``,
    ``top_k``, ``embed_index`` and ``_compile(n_tiles, step, dtype,
    with_embeddings)``; ``place`` puts a host chunk onto the device/mesh.
    """
    if with_embeddings and eng.embed_index is None:
        raise InferenceError(
            f"{eng.config.model_type.display_name} does not produce embeddings"
        )
    samples = np.asarray(samples)
    if samples.dtype not in (np.float32, np.int16):
        samples = samples.astype(np.float32)
    S = eng.config.sample_count
    rate = eng.config.sample_rate
    step = S - int(overlap_seconds * rate)
    if step <= 0:
        raise InferenceError("overlap must be smaller than the segment duration")
    n_total = samples.shape[0]
    if n_segments is None and n_total > 0:
        n_segments = -(-n_total // step)
    if not n_total or not n_segments:
        k = max(1, eng.top_k)
        empty = (
            np.zeros((0, k), np.float32),
            np.zeros((0, k), np.int32),
            np.zeros(0),
        )
        if with_embeddings:
            empty = empty + (
                np.zeros((0, eng.config.embedding_dim or 0), np.float32),
            )
        return empty
    monitored = options is not None and options.needs_monitor()
    segs_per_chunk = (MONITORED_MAX_TILES if monitored else MAX_TILES) * eng.tile
    mask_dev = None
    if species_mask is not None:
        mask_dev = place(np.asarray(species_mask, dtype=bool))

    # Dispatch superchunks with pipelined uploads: device_put + dispatch are
    # async, so chunk c+1 uploads while chunk c computes.
    pending = []
    try:
        for seg0 in range(0, n_segments, segs_per_chunk):
            seg1 = min(seg0 + segs_per_chunk, n_segments)
            n_seg = seg1 - seg0
            n_tiles = _bucket_tiles(-(-n_seg // eng.tile))
            fn = eng._compile(n_tiles, step, samples.dtype, with_embeddings,
                              with_mask=mask_dev is not None)
            audio_len = (n_tiles * eng.tile - 1) * step + S
            lo = seg0 * step
            chunk = samples[lo:lo + audio_len]
            if chunk.shape[0] < audio_len:
                pad = np.zeros(audio_len - chunk.shape[0], dtype=samples.dtype)
                chunk = np.concatenate([chunk, pad])
            audio_dev = place(chunk_to_device_layout(chunk, step, S))
            outs = (
                fn(eng.params, audio_dev, mask_dev)
                if mask_dev is not None
                else fn(eng.params, audio_dev)
            )
            pending.append((outs, n_seg))
            # Bound in-flight superchunks at two: chunk c+1 uploads while
            # chunk c computes (full pipeline overlap), and device memory
            # is capped at two chunk input buffers — an unbounded dispatch
            # loop would queue ~3.5 GB of int16 per full superchunk until
            # HBM ran out on a 50 h+ single-call analyze. The same bound
            # honors cancellation/timeout between dispatches (the reference
            # honors options between batches, birdnet-analyze.rs:562-610):
            # at most one superchunk of work is "committed" past a cancel.
            if len(pending) > 1:
                outs_prev, n_prev = pending[-2]
                _wait(list(outs_prev), options)
                # Drain the waited chunk to host NOW: keeping every
                # superchunk's outputs alive on device until the loop ends
                # would grow HBM O(n_segments) (embeddings especially) —
                # this caps retained device outputs at the two in-flight
                # chunks, and overlaps readback with the next compute.
                pending[-2] = (
                    [np.asarray(o)[:n_prev] for o in outs_prev], n_prev
                )

        collected = None
        for outs, n_seg in pending:
            if isinstance(outs, list):  # already drained to host above
                arrays = outs
            else:
                _wait(list(outs), options)
                arrays = [np.asarray(o)[:n_seg] for o in outs]
            if collected is None:
                collected = [[a] for a in arrays]
            else:
                for dest, a in zip(collected, arrays):
                    dest.append(a)
    except InferenceError:
        raise
    except Exception as e:  # noqa: BLE001 - XLA runtime failures (OOM, …)
        from ..errors import InferenceCancelledError, InferenceTimeoutError

        if isinstance(e, (InferenceCancelledError, InferenceTimeoutError)):
            raise
        raise InferenceError(str(e)) from e
    start_times = np.arange(n_segments, dtype=np.float64) * (step / rate)
    result = tuple(np.concatenate(parts) for parts in collected)
    return result[:2] + (start_times,) + result[2:]
