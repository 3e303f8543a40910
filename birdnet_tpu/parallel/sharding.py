"""Multi-chip sharding: data-parallel batches + tensor-parallel classifier head.

The reference is single-device (multi-GPU only via ``device_id`` selection,
reference: src/cuda_config.rs:179-182) with **no distributed runtime**
(SURVEY §2). This module is the TPU-native scaling path beyond parity:

- **DP**: the segment batch shards over the ``data`` mesh axis — the natural
  extension of ``predict_batch``. Pure data-parallel inference needs no
  explicit communication; results gather over ICI on host readback.
- **TP**: the classification head is the dominant matmul for BirdNET v2.4
  (feat × 6,522 classes ≈ 8.3 M params) and Perch v2 (× 14,795). Any weight
  whose leading dim equals ``num_species`` shards over the ``model`` axis;
  the per-shard top-K then rides an XLA-inserted all-gather of candidates
  (B×K per shard — tiny) instead of gathering full logits.

Everything goes through ``jax.jit`` with ``NamedSharding`` annotations; XLA
inserts the collectives (scaling-book recipe: pick a mesh, annotate, let the
compiler place psum/all-gather on ICI).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..types import ModelConfig


def make_mesh(
    devices: Optional[Sequence] = None,
    shape: Optional[Tuple[int, int]] = None,
    axis_names: Tuple[str, str] = ("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over the given devices.

    Default shape: all devices on ``data`` when the device count is odd or
    small, else a 2-way ``model`` axis (head TP) with the rest on ``data``.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        tp = 2 if n % 2 == 0 and n >= 4 else 1
        shape = (n // tp, tp)
    arr = np.asarray(devices).reshape(shape)
    return Mesh(arr, axis_names)


def param_specs(
    params: Dict[str, np.ndarray],
    config: ModelConfig,
    model_axis: str = "model",
    model_size: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    num_species: Optional[int] = None,
) -> Dict[str, P]:
    """Partition specs per parameter: head weights shard over ``model_axis``
    (dimension matching ``num_species``), everything else replicated.

    ``model_size`` (or ``mesh``, from which it is derived): the mesh's
    model-axis extent — dims that don't divide it evenly stay replicated
    (e.g. 6,522 species over a 4-way axis). Without either, specs are
    emitted unguarded; prefer passing the mesh. ``num_species`` overrides
    the species-dim extent to match (used by the sharded programs after
    ``_species_pad`` rounds the head up to a divisible width)."""
    if model_size is None and mesh is not None:
        model_size = mesh.shape.get(model_axis)
    n = num_species if num_species is not None else config.num_species

    def fits(dim: int) -> bool:
        return model_size is None or dim % model_size == 0

    specs: Dict[str, P] = {}
    for name, p in params.items():
        if p.ndim == 2 and p.shape[0] == n and fits(n):
            specs[name] = P(model_axis, None)
        elif p.ndim == 2 and p.shape[1] == n and fits(n):
            specs[name] = P(None, model_axis)
        elif p.ndim == 1 and p.shape[0] == n and fits(n):
            specs[name] = P(model_axis)
        else:
            specs[name] = P()
    return specs


def _species_pad(
    params: Dict[str, np.ndarray], config: ModelConfig, model_size: int,
    floats_only: bool = False,
) -> Tuple[Dict[str, np.ndarray], int]:
    """Zero-pad species-dim params so the classifier head TP-shards even
    when ``num_species`` doesn't divide the model axis (Perch v2's 14,795
    classes over any power-of-two axis; JAX NamedSharding requires exact
    divisibility). Exact by construction for the supported families: the
    species axis is *terminal* (it exists only as the output dim of the
    head matmul / its bias / per-class vectors), so zero pad columns add
    new logit positions without touching real ones; the sharded programs
    mask pad positions to -inf before top-K and slice them off returned
    logits. Returns (padded params, padded species extent).

    Scope note: the dim match is by SIZE, so a non-head tensor whose dim
    coincidentally equals ``num_species`` would also pad. Zero-padding
    stays value-exact on real positions through matmul (zero
    contributions), add, and mul; a mismatched interior pad otherwise
    fails the trace loudly with a shape error — silent corruption would
    require a softmax/mean/div over the species axis inside the graph,
    which no supported family has (their logits are raw head outputs).
    At the real class counts (6,522 / 14,795) collisions do not occur."""
    n = config.num_species
    if model_size is None or model_size <= 1 or n % model_size == 0:
        return params, n
    pad = -n % model_size
    out = dict(params)
    for name, p in params.items():
        if floats_only and not np.issubdtype(p.dtype, np.floating):
            continue  # integer consts (axes/shapes/indices) must not pad
        if p.ndim == 2 and p.shape[0] == n:
            out[name] = np.concatenate(
                [p, np.zeros((pad, p.shape[1]), p.dtype)], axis=0
            )
        elif p.ndim == 2 and p.shape[1] == n:
            out[name] = np.concatenate(
                [p, np.zeros((p.shape[0], pad), p.dtype)], axis=1
            )
        elif p.ndim == 1 and p.shape[0] == n:
            out[name] = np.concatenate([p, np.zeros((pad,), p.dtype)])
    return out, n + pad


# Ops that mix values ACROSS positions of an axis (normalizers, axis
# reductions, axis selections). Zero pad logits are value-exact through
# every positionwise op (matmul contributions, add, mul, sigmoid), but a
# cross-position op over the species axis would let the pads change real
# positions (exp(0)=1 joins a softmax denominator; zero wins an all-negative
# ArgMax/ReduceMax; zero poisons ReduceProd). None of the supported
# families carries one downstream of the head (their logits are raw head
# outputs), so hitting this is a custom-graph safety refusal, not a
# supported-path branch.
_PAD_UNSAFE_OPS = frozenset({
    "Softmax", "LogSoftmax", "Hardmax", "ArgMax", "ArgMin", "TopK",
    "ReduceMean", "ReduceSum", "ReduceProd", "ReduceMin", "ReduceMax",
    "ReduceL1", "ReduceL2", "ReduceLogSum", "ReduceLogSumExp",
    "ReduceSumSquare",
})


def _check_pad_safety(graph, padded_names) -> None:
    """Refuse (typed error) to species-pad when a cross-position op
    consumes a value derived from a padded tensor (advisor finding: a
    softmax-head custom classifier would otherwise be silently wrong —
    zero pad logits contribute exp(0)=1 to the denominator). Conservative
    by design: axis attributes are not inspected (input ranks are unknown
    before trace), so ANY such op downstream of a padded tensor refuses;
    run on an unpadded mesh extent (a model axis dividing num_species)
    to shard such graphs instead."""
    from ..errors import ModelLoadError

    derived = set(padded_names)

    def walk(g) -> None:
        for node in g.node:
            hit = [i for i in node.input if i and i in derived]
            if hit:
                if node.op_type in _PAD_UNSAFE_OPS:
                    raise ModelLoadError(
                        f"cannot species-pad for tensor-parallel sharding: "
                        f"node {node.name!r} ({node.op_type}) consumes "
                        f"{hit[0]!r}, which derives from a zero-padded "
                        f"species tensor — a cross-position op over the "
                        f"padded axis would corrupt real class values. "
                        f"Use a model-axis size that divides num_species, "
                        f"or run unsharded."
                    )
                derived.update(o for o in node.output if o)
            for v in node.attrs.values():
                subs = v if isinstance(v, (list, tuple)) else [v]
                for sub in subs:
                    if hasattr(sub, "node"):
                        walk(sub)

    walk(graph)


def _species_pad_model(imported, config: ModelConfig, model_size: int):
    """Species-pad an ImportedModel for head TP: pads the species dim in
    ``params`` AND in float ``consts`` (tiny per-class vectors — e.g. a
    10-species test head's bias — fall below the importer's param-size
    floor and live in consts; an unpadded per-class const against a padded
    head weight would break the trace). Integer consts are never padded
    (axes/shape/index tensors). Returns (padded ImportedModel clone or the
    original when no padding is needed, padded species extent)."""
    import dataclasses

    n = config.num_species
    if model_size is None or model_size <= 1 or n % model_size == 0:
        return imported, n
    params, n_padded = _species_pad(imported.params, config, model_size)
    consts, _ = _species_pad(
        imported.consts, config, model_size, floats_only=True
    )
    padded_names = {
        name for name, before in imported.params.items()
        if params[name].shape != before.shape
    }
    padded_names.update(
        name for name, before in imported.consts.items()
        if consts[name].shape != before.shape
    )
    _check_pad_safety(imported.graph, padded_names)
    return (
        dataclasses.replace(imported, params=params, consts=consts),
        n_padded,
    )


def shard_params(params, config: ModelConfig, mesh: Mesh, model_axis: str = "model"):
    """Place params on the mesh with head-TP sharding."""
    specs = param_specs(params, config, model_axis, mesh.shape[model_axis])
    return {
        name: jax.device_put(p, NamedSharding(mesh, specs[name]))
        for name, p in params.items()
    }


def _head_partition(imported, config: ModelConfig, mesh: Mesh,
                    model_axis: str, species_mask):
    """Shared head-TP setup for the sharded programs: species-pad the
    model to a model-axis-divisible head width, derive per-param
    NamedShardings on the padded shapes, and fold the pad positions into
    the top-K candidate mask (pad logits must never win selection).
    Returns (padded_model, pad_fn, params_shardings, mask, n_padded);
    build the forward from ``padded_model`` (its consts are padded too)."""
    n = config.num_species
    model_size = mesh.shape[model_axis]
    padded_model, n_padded = _species_pad_model(imported, config, model_size)
    p_specs = param_specs(
        padded_model.params, config, model_axis, model_size,
        num_species=n_padded,
    )
    params_shardings = {
        name: NamedSharding(mesh, spec) for name, spec in p_specs.items()
    }
    if n_padded != n:
        keep = np.zeros(n_padded, dtype=bool)
        keep[:n] = True if species_mask is None else np.asarray(
            species_mask, bool
        )
        mask = jnp.asarray(keep)
    else:
        mask = None if species_mask is None else jnp.asarray(
            species_mask, bool
        )

    def pad_fn(params):
        padded, _ = _species_pad(params, config, model_size)
        return padded

    return padded_model, pad_fn, params_shardings, mask, n_padded


def make_sharded_program(
    imported,
    config: ModelConfig,
    mesh: Mesh,
    top_k: int = 10,
    precision: str = "fp32",
    data_axis: str = "data",
    model_axis: str = "model",
    species_mask=None,
    with_embeddings: bool = False,
):
    """Build the jitted multi-chip inference step.

    Returns ``(fn, shard_inputs)`` where ``fn(params, x)`` maps a
    batch-sharded ``[B, S]`` to (confidences ``[B, K]``, indices ``[B, K]``,
    logits ``[B, N]``) — plus embeddings ``[B, E]`` when
    ``with_embeddings`` and the family has them (v3.0 at output 0, Perch
    v2's 4-output demux; reference: src/classifier.rs:914-950) — and
    ``shard_inputs(params, x)`` places values onto the mesh. B must be
    divisible by the ``data`` axis size.

    When ``num_species`` doesn't divide the model axis (Perch's 14,795)
    the head is zero-padded to a divisible width (``_species_pad``): pad
    positions are masked out of top-K and sliced off the returned logits,
    which then gather over the model axis instead of staying sharded.
    """
    from ..compiler.importer import make_forward
    from .._demux import demux_indices

    logits_index, embed_index = demux_indices(config.model_type)
    emit_emb = with_embeddings and embed_index is not None
    n = config.num_species
    k = max(0, min(top_k, n))

    padded_model, pad_fn, params_shardings, mask, n_padded = _head_partition(
        imported, config, mesh, model_axis, species_mask
    )
    forward = make_forward(padded_model, precision=precision,
                           disable_pallas_fusion=True)
    x_sharding = NamedSharding(mesh, P(data_axis, None))
    batch_sharded = NamedSharding(mesh, P(data_axis, None))
    logits_sharding = (
        batch_sharded if n_padded != n
        else NamedSharding(mesh, P(data_axis, model_axis))
    )
    out_shardings = (batch_sharded, batch_sharded, logits_sharding)
    if emit_emb:
        out_shardings = out_shardings + (batch_sharded,)

    def program(params, x):
        from ..ops.topk import fused_sigmoid_topk

        outs = forward(params, x)
        logits = outs[logits_index]
        conf, idx = fused_sigmoid_topk(logits, k, mask)
        if n_padded != n:
            logits = logits[:, :n]
        if emit_emb:
            return conf, idx, logits, outs[embed_index]
        return conf, idx, logits

    fn = jax.jit(
        program,
        in_shardings=(params_shardings, x_sharding),
        out_shardings=out_shardings,
    )

    def shard_inputs(params, x):
        sharded_params = {
            name: jax.device_put(p, params_shardings[name])
            for name, p in pad_fn(params).items()
        }
        return sharded_params, jax.device_put(jnp.asarray(x), x_sharding)

    return fn, shard_inputs


def make_sharded_stream_program(
    imported,
    config: ModelConfig,
    mesh: Mesh,
    n_tiles: int,
    step: int,
    tile: int = 128,
    top_k: int = 10,
    precision: str = "fp32",
    data_axis: str = "data",
    model_axis: str = "model",
    audio_dtype=None,
    species_mask=None,
):
    """Multi-chip version of the streaming whole-recording program
    (compiler/stream.py): one ``lax.scan`` over batch tiles where each
    tile's segment batch shards over the ``data`` axis and the classifier
    head shards over ``model``.

    Audio is replicated (cheap: int16 ≤ ~350 MB/hour) so overlapping
    segments never cross shard boundaries; the per-tile frames matrix gets a
    sharding constraint and XLA partitions everything downstream, placing
    the top-K candidate all-gather on ICI.

    Returns ``(fn, shard_inputs)``; ``fn(params, audio) → (conf [N, K],
    idx [N, K])``. ``tile`` must be divisible by the data-axis size.
    """
    import numpy as np

    from ..compiler.importer import make_forward
    from .._demux import demux_indices

    logits_index, _ = demux_indices(config.model_type)
    k = max(1, min(top_k, config.num_species))
    S = config.sample_count

    padded_model, pad_fn, params_shardings, mask, _n_padded = _head_partition(
        imported, config, mesh, model_axis, species_mask
    )
    forward = make_forward(padded_model, precision=precision,
                           disable_pallas_fusion=True)
    replicated = NamedSharding(mesh, P())
    batch_sharded = NamedSharding(mesh, P(data_axis, None))

    def program(params, audio):
        from ..compiler.stream import frame_tile, prepare_frames
        from ..ops.topk import fused_sigmoid_topk

        def body(_, tile_idx):
            # Framing/scale/cast inside the body (see compiler/stream.py
            # for the fusion rationale).
            frames = prepare_frames(
                frame_tile(audio, tile_idx, tile, step, S), precision
            )
            frames = jax.lax.with_sharding_constraint(frames, batch_sharded)
            logits = forward(params, frames)[logits_index]
            return None, fused_sigmoid_topk(logits, k, mask, idx_dtype=jnp.int32)

        _, (conf, idx) = jax.lax.scan(body, None, jnp.arange(n_tiles))
        return conf.reshape(-1, k), idx.reshape(-1, k)

    fn = jax.jit(
        program,
        in_shardings=(params_shardings, replicated),
        out_shardings=(batch_sharded, batch_sharded),
    )

    def shard_inputs(params, audio):
        from ..compiler.stream import chunk_to_device_layout

        sharded_params = {
            name: jax.device_put(p, params_shardings[name])
            for name, p in pad_fn(params).items()
        }
        audio = np.asarray(audio)
        need = (n_tiles * tile - 1) * step + S
        if audio.shape[0] < need:
            pad = np.zeros(need - audio.shape[0], dtype=audio.dtype)
            audio = np.concatenate([audio, pad])
        audio = chunk_to_device_layout(audio[:need], step, S)
        return sharded_params, jax.device_put(audio, replicated)

    return fn, shard_inputs
