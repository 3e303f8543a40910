"""ShardedEngine: multi-chip drop-in for the single-device engines.

Exposes the same surface the Classifier drives (``run_batch`` like
compiler/engine.InferenceEngine, ``analyze`` like compiler/stream.
StreamingEngine) but executes over a ``jax.sharding.Mesh``: segment batches
shard over the ``data`` axis, the classifier head shards over ``model``
(see parallel/sharding.py for the layout rules), audio replicates, and XLA
places the collectives on ICI.

Selected via ``Classifier.builder().with_mesh(...)`` — the scale-out story
the reference lacks entirely (single device, SURVEY §2 parallelism table).
"""

from __future__ import annotations

import threading
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .._demux import demux_indices
from ..errors import InferenceError
from ..inference_options import InferenceOptions
from ..types import ModelConfig
from ..compiler.engine import _wait
from ..compiler.importer import ImportedModel, make_forward
from .sharding import param_specs

class ShardedEngine:
    """Mesh-parallel inference engine (DP batches + TP classifier head)."""

    streams_natively = True  # Classifier streams through this engine directly

    def __init__(
        self,
        imported: ImportedModel,
        config: ModelConfig,
        mesh: Mesh,
        precision: Optional[str] = None,
        top_k: int = 10,
        tile: Optional[int] = None,
        data_axis: str = "data",
        model_axis: str = "model",
        species_mask: Optional[np.ndarray] = None,
    ):
        if data_axis not in mesh.shape or model_axis not in mesh.shape:
            raise InferenceError(
                f"mesh must have {data_axis!r} and {model_axis!r} axes "
                f"(got {tuple(mesh.axis_names)}); build one with "
                f"birdnet_tpu.parallel.make_mesh()"
            )
        self.mesh = mesh
        self.data_axis = data_axis
        self.model_axis = model_axis
        self.dp = mesh.shape[data_axis]
        self.device = mesh.devices.flat[0]
        on_tpu = self.device.platform in ("tpu", "axon")
        if precision is None:
            precision = "mixed" if on_tpu else "fp32"
        self.precision = precision
        self.config = config
        self.top_k = max(0, min(top_k, config.num_species))
        self.species_mask = (
            None if species_mask is None else np.asarray(species_mask, bool)
        )
        default_tile = 128 if on_tpu else 32
        # Tile must split evenly over the data axis.
        self.tile = tile if tile is not None else max(
            self.dp, (default_tile // self.dp) * self.dp
        )
        if self.tile % self.dp:
            raise InferenceError(
                f"tile {self.tile} not divisible by data-axis size {self.dp}"
            )
        self.logits_index, self.embed_index = demux_indices(config.model_type)

        # Species-pad the head so it TP-shards even when num_species
        # doesn't divide the model axis (Perch v2's 14,795 classes; see
        # sharding._species_pad_model — pad logits are masked out of top-K
        # and sliced off returned raw scores; the forward is built from
        # the padded model so per-class consts stay shape-consistent).
        from .sharding import _species_pad_model

        padded_model, self._n_padded = _species_pad_model(
            imported, config, mesh.shape[model_axis]
        )
        self._forward = make_forward(padded_model, precision=precision,
                                     disable_pallas_fusion=True)
        specs = param_specs(
            padded_model.params, config, model_axis, mesh.shape[model_axis],
            num_species=self._n_padded,
        )
        self._param_shardings = {
            name: NamedSharding(mesh, spec) for name, spec in specs.items()
        }
        self.params = {
            name: jax.device_put(p, self._param_shardings[name])
            for name, p in padded_model.params.items()
        }
        self._replicated = NamedSharding(mesh, P())
        self._batch_sharded = NamedSharding(mesh, P(data_axis, None))
        self._compiled: Dict[Tuple, object] = {}
        self._lock = threading.Lock()

    # -- species-padded head helpers ---------------------------------------

    def _selection_mask(self):
        """Build-time species mask, extended with False over head pad
        positions (pad logits must never enter top-K selection)."""
        n = self.config.num_species
        if self._n_padded == n:
            return (
                None if self.species_mask is None
                else jnp.asarray(self.species_mask)
            )
        keep = np.zeros(self._n_padded, dtype=bool)
        keep[:n] = True if self.species_mask is None else self.species_mask
        return jnp.asarray(keep)

    def _pad_row_mask(self, row_mask):
        """Extend a runtime candidate mask ([B, N] or [N]) with False over
        the head pad positions."""
        if row_mask is None or self._n_padded == self.config.num_species:
            return row_mask
        pad_shape = row_mask.shape[:-1] + (
            self._n_padded - self.config.num_species,
        )
        return jnp.concatenate(
            [row_mask, jnp.zeros(pad_shape, dtype=bool)], axis=-1
        )

    # -- batched path (InferenceEngine-compatible) -------------------------

    def _batch_bucket(self, b: int) -> int:
        p2 = 1 << (b - 1).bit_length() if b > 1 else 1
        return max(self.dp, -(-p2 // self.dp) * self.dp)

    def compiled(
        self,
        bucket: int,
        with_embeddings: bool = True,
        donate: bool = False,
        with_row_mask: bool = False,
    ):
        """AOT-compiled mesh executable for a batch bucket (cached; bucket
        is normalized up to a data-axis multiple so warmup/context keys
        match run_batch's). ``with_row_mask`` compiles the per-request
        species-mask variant (bool [bucket, num_species] input)."""
        bucket = -(-bucket // self.dp) * self.dp
        key = ("batch", bucket, with_embeddings, donate, with_row_mask)
        fn = self._compiled.get(key)
        if fn is not None:
            return fn
        with self._lock:
            fn = self._compiled.get(key)
            if fn is not None:
                return fn
            k = self.top_k
            n = self.config.num_species
            n_padded = self._n_padded
            forward = self._forward
            logits_index = self.logits_index
            embed_index = self.embed_index if with_embeddings else None
            mask = self._selection_mask()
            pad_row_mask = self._pad_row_mask
            from ..ops.topk import fused_sigmoid_topk

            def finish(outs, row_mask):
                logits = outs[logits_index]
                if k > 0:
                    conf, idx = fused_sigmoid_topk(
                        logits, k, mask, pad_row_mask(row_mask)
                    )
                else:
                    conf = jnp.zeros((logits.shape[0], 0), logits.dtype)
                    idx = jnp.zeros((logits.shape[0], 0), jnp.int32)
                if n_padded != n:
                    logits = logits[:, :n]
                emb = outs[embed_index] if embed_index is not None else None
                return conf, idx, logits, emb

            if with_row_mask:
                def program(params, x, row_mask):
                    return finish(forward(params, x), row_mask)
            else:
                def program(params, x):
                    return finish(forward(params, x), None)

            out_shardings = (
                self._batch_sharded,
                self._batch_sharded,
                self._batch_sharded,
                self._batch_sharded if embed_index is not None else None,
            )
            in_shardings = (self._param_shardings, self._batch_sharded)
            if with_row_mask:
                in_shardings = in_shardings + (self._batch_sharded,)
            jitted = jax.jit(
                program,
                in_shardings=in_shardings,
                out_shardings=out_shardings,
                donate_argnums=(1,) if donate else (),
            )
            x_spec = jax.ShapeDtypeStruct(
                (bucket, self.config.sample_count), jnp.float32,
                sharding=self._batch_sharded,
            )
            params_spec = {
                name: jax.ShapeDtypeStruct(
                    p.shape, p.dtype, sharding=self._param_shardings[name]
                )
                for name, p in self.params.items()
            }
            specs = (params_spec, x_spec)
            if with_row_mask:
                specs = specs + (
                    jax.ShapeDtypeStruct(
                        (bucket, self.config.num_species), jnp.bool_,
                        sharding=self._batch_sharded,
                    ),
                )
            try:
                import warnings

                with warnings.catch_warnings():
                    warnings.filterwarnings(
                        "ignore", message="Some donated buffers were not usable"
                    )
                    fn = jitted.lower(*specs).compile()
            except Exception as e:  # noqa: BLE001
                raise InferenceError(f"XLA compilation failed: {e}") from e
            self._compiled[key] = fn
            return fn

    def run_batch(
        self,
        segments: np.ndarray,
        options: Optional[InferenceOptions] = None,
        with_embeddings: bool = True,
        bucket: Optional[int] = None,
        donate: bool = False,
        row_masks: Optional[np.ndarray] = None,
        n_valid: Optional[int] = None,
    ):
        # n_valid: true row count when segments arrive pre-padded (batch
        # context) — row masks are [n_valid, N]; padded rows get all-True
        # (same contract as compiler.engine.InferenceEngine.run_batch).
        b = n_valid if n_valid is not None else segments.shape[0]
        bkt = bucket if bucket is not None else self._batch_bucket(b)
        if bkt % self.dp:
            bkt = -(-bkt // self.dp) * self.dp
        fn = self.compiled(
            bkt, with_embeddings, donate, with_row_mask=row_masks is not None
        )
        if segments.shape[0] < bkt:
            pad = np.zeros(
                (bkt - segments.shape[0], segments.shape[1]), dtype=np.float32
            )
            segments = np.concatenate([segments, pad], axis=0)
        try:
            x = jax.device_put(segments, self._batch_sharded)
            if row_masks is not None:
                rows = np.ones((bkt, self.config.num_species), dtype=bool)
                rows[:b] = row_masks
                conf, idx, logits, emb = fn(
                    self.params, x,
                    jax.device_put(rows, self._batch_sharded),
                )
            else:
                conf, idx, logits, emb = fn(self.params, x)
            _wait([r for r in (conf, idx, logits, emb) if r is not None], options)
        except InferenceError:
            raise
        except Exception as e:  # noqa: BLE001
            from ..errors import InferenceCancelledError, InferenceTimeoutError

            if isinstance(e, (InferenceCancelledError, InferenceTimeoutError)):
                raise
            raise InferenceError(str(e)) from e
        conf = np.asarray(conf)[:b]
        idx = np.asarray(idx)[:b]
        logits = np.asarray(logits)[:b]
        emb_np = np.asarray(emb)[:b] if emb is not None else None
        return conf, idx, logits, emb_np

    # -- streaming path (StreamingEngine-compatible) -----------------------

    def _compile(self, n_tiles: int, step: int, dtype,
                 with_embeddings: bool = False, with_mask: bool = False):
        key = ("stream", n_tiles, step, np.dtype(dtype).name, with_embeddings,
               with_mask)
        fn = self._compiled.get(key)
        if fn is not None:
            return fn
        with self._lock:
            fn = self._compiled.get(key)
            if fn is not None:
                return fn
            from ..compiler.stream import frame_tile, prepare_frames

            S = self.config.sample_count
            tile = self.tile
            k = max(1, self.top_k)
            forward = self._forward
            precision = self.precision
            logits_index = self.logits_index
            embed_index = self.embed_index if with_embeddings else None
            batch_sharded = self._batch_sharded
            mask = self._selection_mask()
            pad_row_mask = self._pad_row_mask
            from ..ops.topk import fused_sigmoid_topk

            def run(params, audio, run_mask):
                run_mask = pad_row_mask(run_mask)

                def body(_, tile_idx):
                    # Framing/scale/cast inside the body (see
                    # compiler/stream.py for the fusion rationale).
                    frames = prepare_frames(
                        frame_tile(audio, tile_idx, tile, step, S), precision
                    )
                    frames = lax.with_sharding_constraint(frames, batch_sharded)
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
                def program(params, audio, run_mask):
                    return run(params, audio, run_mask)

                in_shardings = (self._param_shardings, self._replicated,
                                self._replicated)
            else:
                def program(params, audio):
                    return run(params, audio, None)

                in_shardings = (self._param_shardings, self._replicated)

            fn = jax.jit(program, in_shardings=in_shardings)
            self._compiled[key] = fn
            return fn

    def analyze(
        self,
        samples: np.ndarray,
        overlap_seconds: float = 0.0,
        options: Optional[InferenceOptions] = None,
        with_embeddings: bool = False,
        n_segments: Optional[int] = None,
        species_mask=None,
    ):
        from ..compiler.stream import streaming_analyze

        return streaming_analyze(
            self,
            samples,
            overlap_seconds,
            options,
            with_embeddings,
            n_segments,
            place=lambda chunk: jax.device_put(chunk, self._replicated),
            species_mask=species_mask,
        )

    def warmup(self, batch_sizes=(1,)) -> None:
        for b in batch_sizes:
            self.compiled(self._batch_bucket(b))
