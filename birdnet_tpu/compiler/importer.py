"""ONNX graph → JAX function importer.

This is the TPU-native replacement for the reference's
``Session::commit_from_file`` boundary into the ONNX Runtime C++ engine
(reference: src/classifier.rs:348-350): the graph is decoded by
:mod:`birdnet_tpu.onnx.proto`, its float initializers become a params pytree
(jit arguments, so they can be donated/sharded/cast), and the node list is
abstractly interpreted into a pure, jittable function via the op registry in
:mod:`birdnet_tpu.compiler.ops`.

Compile-time constant folding comes for free: constants stay concrete numpy /
eager-JAX values during tracing, so ``Shape``/``Gather``/``Concat``/
``Reshape`` chains evaluate away and never reach XLA.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple, Union

import numpy as np

from ..errors import ModelLoadError
from ..onnx import proto as onnx_proto
from ..onnx.proto import GraphProto, ModelProto
from . import ops as op_registry

# Float initializers become jit params; tiny ones (thresholds, exponents,
# epsilon tensors) and all integer tensors stay compile-time constants so
# shape/axis computations fold.
_PARAM_MIN_SIZE = 16
# Quantized (int8/uint8) weight tensors also become params rather than
# baked-in XLA constants — they are real model weights (QDQ / QLinear
# graphs) and must stay donatable/shardable. Only rank-2+ tensors qualify:
# 1-D int8 vectors are per-channel zero points, which must stay
# compile-time constants so the quantized lowerings can prove they are
# zero (the int8 MXU fast path).
_QPARAM_MIN_SIZE = 1024


@dataclass
class ImportedModel:
    """A decoded ONNX model ready for JAX execution."""

    graph: GraphProto
    opset: int
    params: Dict[str, np.ndarray]  # float weights (jit arguments)
    consts: Dict[str, np.ndarray]  # compile-time constants
    input_names: List[str] = field(default_factory=list)
    input_shapes: List[List[Optional[int]]] = field(default_factory=list)
    output_names: List[str] = field(default_factory=list)
    output_shapes: List[List[Optional[int]]] = field(default_factory=list)
    # Scalar flag inputs whose only graph effect is gating ``If`` branches
    # (optimum's merged-decoder ``use_cache_branch`` pattern). They stay in
    # ``input_names`` — callers pass them like any other input — but
    # ``make_forward`` dispatches on their concrete value to a per-value
    # specialized program instead of tracing them (see
    # ``_find_dispatch_inputs``).
    dispatch_inputs: List[str] = field(default_factory=list)

    @property
    def num_outputs(self) -> int:
        return len(self.output_names)

    def param_bytes(self) -> int:
        return sum(int(p.nbytes) for p in self.params.values())

    def detection_shapes(self) -> Tuple[List[int], List[List[int]]]:
        """Input/output shapes in the form ``detect_model_type`` expects
        (dynamic dims reported as 1, mirroring the reference's treatment of
        symbolic batch dims; reference: src/classifier.rs:387-420)."""
        inp = [d if d is not None else 1 for d in self.input_shapes[0]]
        outs = [
            [d if d is not None else 1 for d in sh] for sh in self.output_shapes
        ]
        return inp, outs


def split_params(tensors: Dict[str, np.ndarray]):
    """Partition initializers into jit params (donatable/shardable weights)
    and compile-time constants (shape/axis/threshold scalars)."""
    params: Dict[str, np.ndarray] = {}
    consts: Dict[str, np.ndarray] = {}
    for name, arr in tensors.items():
        if np.issubdtype(arr.dtype, np.floating) and arr.size >= _PARAM_MIN_SIZE:
            params[name] = arr
        elif (
            arr.dtype in (np.int8, np.uint8)
            and arr.ndim >= 2
            and arr.size >= _QPARAM_MIN_SIZE
        ):
            params[name] = arr
        else:
            consts[name] = arr
    return params, consts


def import_onnx(
    source: Union[str, bytes, ModelProto], optimize: bool = True,
    freeze_inputs: Optional[Dict[str, object]] = None,
    auto_specialize: bool = True,
) -> ImportedModel:
    """Load an ONNX model from a path, serialized bytes, or ModelProto.

    ``optimize`` runs the import-time graph rewrites (Conv+BN folding,
    identity elimination) from :mod:`birdnet_tpu.compiler.optimize`.

    ``freeze_inputs`` maps graph-input names to fixed values; each named
    input becomes a trace-time constant instead of a runtime argument
    (it disappears from ``input_names``). This is the XLA-idiomatic
    escape hatch for graphs that branch on a runtime flag: optimum's
    *merged* generation decoder gates an ``If`` on a
    ``use_cache_branch`` input whose branches return different cache
    shapes — untraceable as data-dependent control flow, but frozen to
    True/False the ``If`` folds statically and each value yields its own
    specialized program (exactly the split decoder / decoder_with_past
    pair, recovered from the single merged file).

    ``auto_specialize`` (default on) detects that pattern with **zero user
    flags**: any scalar bool/int graph input whose only effect on the
    graph is gating ``If`` conditions is recorded in ``dispatch_inputs``,
    and ``make_forward`` then dispatches at call time on the flag's
    concrete value to a per-value specialized program — the engine-level
    behavior ORT gives the merged file (reference:
    src/classifier.rs:348-350)."""
    model_dir = None
    try:
        if isinstance(source, ModelProto):
            model = source
        elif isinstance(source, (bytes, bytearray, memoryview)):
            model = onnx_proto.decode_model(source)
        else:
            import os

            model_dir = os.path.dirname(os.path.abspath(str(source)))
            model = onnx_proto.load_model(source)
    except ModelLoadError:
        raise
    except Exception as e:  # noqa: BLE001 - any decode failure of untrusted
        # bytes (IndexError/KeyError/Unicode/Overflow/...) is a load error
        raise ModelLoadError(str(e)) from e

    if model.graph is None:
        raise ModelLoadError("model has no graph")
    graph = model.graph
    if model.functions:
        from .functions import inline_functions

        try:
            inline_functions(graph, model.functions)
        except ModelLoadError:
            raise
        except Exception as e:  # noqa: BLE001 - malformed function defs in
            # untrusted bytes surface as load errors, not internal crashes
            raise ModelLoadError(f"function inlining failed: {e}") from e
    opset = 17
    for imp in model.opset_import:
        if imp.domain in ("", "ai.onnx"):
            opset = imp.version
    # No opset floor: opsets 1-6 (2017, pre-numpy-broadcasting) evaluate
    # through the legacy dialect shims — binary-op `broadcast`/`axis`
    # alignment, attribute-form Reshape/Upsample/Tile, string-enum Cast,
    # channel-aligned PRelu, default-axis Concat — matching ONNX Runtime's
    # acceptance of the 2017 model-zoo era (docs/onnx-compat.md "opset
    # floor"). The few legacy *training* forms (multi-output
    # BatchNormalization) stay typed rejections.

    # Resolve externally-stored weights (ONNX external data) against the
    # model's directory before materializing.
    try:
        sparse_parts = [
            t
            for sp in graph.sparse_initializer
            for t in (sp.values, sp.indices)
            if t is not None
        ]
        for init in list(graph.initializer) + sparse_parts:
            if init.data_location == onnx_proto._DATA_LOCATION_EXTERNAL:
                if model_dir is None:
                    raise ModelLoadError(
                        "model uses external weight data; load it by file "
                        "path so the side files can be found"
                    )
                init.load_external(model_dir)
        tensors: Dict[str, np.ndarray] = {
            init.name: init.to_numpy() for init in graph.initializer
        }
        # Sparse initializers (GraphProto field 15) densify at import —
        # XLA/TPU weights are dense on the MXU; ORT likewise evaluates
        # these files (reference: src/classifier.rs:348-350). Names must
        # be unique across initializer + sparse_initializer per spec.
        for sp in graph.sparse_initializer:
            if not sp.name:
                raise ModelLoadError("sparse initializer has no name")
            if sp.name in tensors:
                raise ModelLoadError(
                    f"initializer name {sp.name!r} appears in both "
                    f"initializer and sparse_initializer"
                )
            tensors[sp.name] = sp.to_dense()
    except ModelLoadError:
        raise
    except Exception as e:  # noqa: BLE001 - any decode failure of untrusted
        # bytes (IndexError/KeyError/Unicode/Overflow/...) is a load error
        raise ModelLoadError(str(e)) from e
    if freeze_inputs:
        _freeze_graph_inputs(graph, tensors, freeze_inputs)
    if optimize:
        from .optimize import optimize_graph

        optimize_graph(graph, tensors)

    params, consts = split_params(tensors)

    initializer_names = set(params) | set(consts)
    input_names, input_shapes = [], []
    for vi in graph.input:
        if vi.name in initializer_names:
            continue  # weights listed as graph inputs (older exporters)
        input_names.append(vi.name)
        input_shapes.append(_static_shape(vi))
    output_names = [vi.name for vi in graph.output]
    output_shapes = [_static_shape(vi) for vi in graph.output]

    imported = ImportedModel(
        graph=graph,
        opset=opset,
        params=params,
        consts=consts,
        input_names=input_names,
        input_shapes=input_shapes,
        output_names=output_names,
        output_shapes=output_shapes,
    )
    _validate_ops(imported)
    _validate_outputs(imported)
    _validate_refs(imported)
    # Reference/topology validation runs BEFORE dispatch detection:
    # _find_dispatch_inputs' single-pass use analysis is only sound on a
    # topologically-ordered graph (a consumer listed before the
    # passthrough producing its derived name would escape the walk).
    if auto_specialize:
        imported.dispatch_inputs = _find_dispatch_inputs(graph, input_names)
    return imported


def _validate_refs(model: ImportedModel) -> None:
    """Import-time reference validation: every node input must resolve to
    a graph input, an initializer, or the output of an *earlier* node, and
    every node must therefore appear in topological order (the ONNX spec
    requires it; ORT rejects both dangling references and out-of-order
    graphs at session creation — reference: src/classifier.rs:348-350).
    Without this, a dangling weight reference imported cleanly and only
    surfaced at trace time, and the dispatch-flag use analysis
    (``_flag_only_gates_if``) could be fooled by a non-topological
    listing. Subgraphs validate recursively with ONNX closure capture:
    outer names are visible, plus the subgraph's formal inputs and local
    initializers."""

    def walk(g: GraphProto, available: set, where: str) -> None:
        produced_later = set()
        for n in g.node:
            produced_later.update(o for o in n.output if o)
        avail = set(available)
        for node in g.node:
            for inp in node.input:
                if not inp or inp in avail:
                    continue
                label = f"node {node.name!r} ({node.op_type}){where}"
                if inp in produced_later:
                    raise ModelLoadError(
                        f"graph is not topologically sorted: {label} "
                        f"consumes {inp!r} before the node producing it"
                    )
                raise ModelLoadError(
                    f"{label} references unknown value {inp!r}"
                )
            for sub in _node_subgraphs(node):
                sub_avail = set(avail)
                sub_avail.update(vi.name for vi in sub.input)
                sub_avail.update(t.name for t in sub.initializer)
                sub_avail.update(sp.name for sp in sub.sparse_initializer)
                walk(sub, sub_avail, f" in subgraph {sub.name!r}")
            avail.update(o for o in node.output if o)

    top = set(model.input_names) | set(model.params) | set(model.consts)
    walk(model.graph, top, "")


# Value-preserving (or truthiness-preserving) unary ops through which a
# dispatch flag may pass on its way to an ``If`` condition. Only input 0 is
# the data path for each (Squeeze/Unsqueeze/Reshape carry axes/shape at
# position 1, which must NOT be the flag). Cast qualifies ONLY when the
# target is BOOL (checked in the walk): a narrowing integer cast is not
# truthiness-preserving (int32 256 → uint8 0), and keying the dispatch on
# the flag's truthiness would then pick the wrong branch.
_DISPATCH_PASSTHROUGH = frozenset(
    {"Cast", "Identity", "Not", "Squeeze", "Unsqueeze", "Reshape"}
)
# Element types a dispatch flag may declare (bool, or ints whose truthiness
# gates the If after a Cast). Kept narrow: float flags are not a pattern any
# exporter emits.
_DISPATCH_ELEM_TYPES = frozenset(
    {
        onnx_proto.DataType.BOOL,
        onnx_proto.DataType.UINT8,
        onnx_proto.DataType.INT8,
        onnx_proto.DataType.INT16,
        onnx_proto.DataType.INT32,
        onnx_proto.DataType.INT64,
    }
)


def _find_dispatch_inputs(graph: GraphProto, input_names) -> List[str]:
    """Detect merged-decoder style flag inputs.

    A graph input qualifies when (a) it declares a bool/int element type
    with an explicit scalar or ``[1]`` shape, and (b) every use of it —
    across the top graph and all nested subgraphs, through chains of
    value/truthiness-preserving unary ops — is as the *condition* of an
    ``If`` node, with at least one such ``If`` present. For such a flag the
    graph's outputs depend only on the flag's truthiness, so specializing
    one program per value is exact (this is optimum's
    ``decoder_model_merged.onnx`` ``use_cache_branch`` pattern, whose
    shape-divergent ``If`` branches cannot lower to ``lax.cond``;
    docs/onnx-compat.md "merged generation decoder")."""
    out: List[str] = []
    for vi in graph.input:
        if vi.name not in input_names:
            continue
        tt = vi.type.tensor_type if vi.type is not None else None
        if tt is None or tt.elem_type not in _DISPATCH_ELEM_TYPES:
            continue
        if tt.shape is None:
            continue  # no declared shape: cannot prove it is a scalar flag
        dims = _static_shape(vi)
        if dims not in ([], [1]):
            continue
        if _flag_only_gates_if(graph, vi.name):
            out.append(vi.name)
    return out


def _flag_only_gates_if(graph: GraphProto, flag: str) -> bool:
    """True iff every use of ``flag`` (transitively through
    ``_DISPATCH_PASSTHROUGH`` chains, including closure-captured uses inside
    subgraphs) is an ``If`` condition, and at least one ``If`` consumes it.
    Conservative: any other use, any graph/subgraph output exposing a
    derived value, or any subgraph formal input shadowing one, disqualifies
    the flag."""
    derived = {flag}
    found_if = [False]

    def walk(g: GraphProto) -> bool:
        if any(vi.name in derived for vi in g.output):
            return False
        for node in g.node:
            used = [
                i for i, inp in enumerate(node.input) if inp and inp in derived
            ]
            if used:
                ok_passthrough = (
                    node.op_type in _DISPATCH_PASSTHROUGH and used == [0]
                )
                if ok_passthrough and node.op_type == "Cast":
                    to = node.attrs.get("to")
                    ok_passthrough = (
                        to is not None
                        and int(to) == onnx_proto.DataType.BOOL
                    )
                if node.op_type == "If" and used == [0]:
                    found_if[0] = True
                elif ok_passthrough:
                    derived.update(o for o in node.output if o)
                else:
                    return False
            for sub in _node_subgraphs(node):
                if any(vi.name in derived for vi in sub.input):
                    return False  # formal input shadows a derived name
                if not walk(sub):
                    return False
        # Re-check outputs: a passthrough inside this graph may have derived
        # a name that is also this graph's output.
        return not any(vi.name in derived for vi in g.output)

    return walk(graph) and found_if[0]


def _node_subgraphs(node):
    for v in node.attrs.values():
        if isinstance(v, GraphProto):
            yield v
        elif isinstance(v, (list, tuple)):
            for item in v:
                if isinstance(item, GraphProto):
                    yield item


def _freeze_graph_inputs(graph, tensors, freeze_inputs) -> None:
    """Turn named graph inputs into initializer-style constants.

    Values are cast to the input's declared element type (and checked
    against its static dims) before joining ``tensors`` — from there the
    normal params/consts split applies, so scalar flags become
    trace-time constants that fold ``If`` conditions and shape math."""
    declared = {vi.name: vi for vi in graph.input}
    for name, value in freeze_inputs.items():
        if name in tensors:
            raise ValueError(
                f"freeze_inputs: {name!r} is an initializer, not a "
                f"runtime graph input"
            )
        vi = declared.get(name)
        if vi is None:
            avail = [n for n in declared if n not in tensors]
            raise ValueError(
                f"freeze_inputs: {name!r} is not a graph input "
                f"(inputs: {avail})"
            )
        arr = np.asarray(value)
        tt = vi.type.tensor_type if vi.type is not None else None
        if tt is not None and tt.elem_type in onnx_proto._DTYPE_TO_NUMPY:
            arr = arr.astype(onnx_proto._DTYPE_TO_NUMPY[tt.elem_type])
        want = _static_shape(vi)
        if arr.ndim == 0 and len(want) == 1 and want[0] in (1, None):
            arr = arr.reshape(1)  # python scalar for a [1]-shaped flag
        if len(want) not in (0, arr.ndim) or any(
            d is not None and d != a for d, a in zip(want, arr.shape)
        ):
            raise ValueError(
                f"freeze_inputs: {name!r} declares shape {want}, got "
                f"{list(arr.shape)}"
            )
        tensors[name] = arr


def _static_shape(vi) -> List[Optional[int]]:
    if vi.type is None or vi.type.tensor_type is None or vi.type.tensor_type.shape is None:
        return []
    out = []
    for d in vi.type.tensor_type.shape.dim:
        out.append(int(d.dim_value) if d.dim_value is not None and d.dim_value > 0 else None)
    return out


def _validate_outputs(model: ImportedModel) -> None:
    """Every graph output must be produced by a node or be an input/
    initializer; a dangling output name would otherwise surface as a raw
    KeyError at trace time (reference analog: ORT validates the graph at
    session load, surfaced as Error::ModelLoad)."""
    produced = set(model.input_names) | set(model.params) | set(model.consts)
    for n in model.graph.node:
        produced.update(o for o in n.output if o)
    missing = [o for o in model.output_names if o not in produced]
    if missing:
        raise ModelLoadError(
            f"graph outputs are not produced by any node: "
            f"{', '.join(sorted(missing))}"
        )


def _validate_ops(model: ImportedModel) -> None:
    unsupported = set()
    for n in model.graph.node:
        try:
            op_registry.get_lowering(n.op_type, n.domain)
        except NotImplementedError:
            name = f"{n.domain}.{n.op_type}" if n.domain else n.op_type
            unsupported.add(name)
    if unsupported:
        raise ModelLoadError(
            f"model uses unsupported ops: {', '.join(sorted(unsupported))}"
        )


# Control-flow / fused ops whose lowerings interpret subgraphs that may
# capture *outer-scope* tracers through ``env`` — even when every direct
# input is static, they cannot be evaluated at compile time.
# Ops that must not run under the compile-time-eval fold: control flow
# (traces subgraphs), and every op that may dispatch a pallas_call — a
# kernel traced inside ``ensure_compile_time_eval`` sees each scalar it
# creates as a captured constant and pallas_call rejects it ("captures
# constants ... pass them as inputs"). QLinearConv routes to the Pallas
# qconv kernel on TPU.
_NO_FOLD_OPS = frozenset(
    {"If", "Loop", "Scan", "SequenceMap", "QLinearConv", "_FusedMBConv",
     "_FusedStagePrefix", "_FusedFrontend", "_FusedStftFrontend"}
)


def interpret_graph(
    graph: GraphProto,
    opset: int,
    precision: str,
    env: Dict[str, object],
    output_names,
):
    """Interpret a node list against a pre-seeded environment.

    Shared by the top-level forward and by control-flow ops (If/Loop), whose
    subgraphs may read outer-scope values already present in ``env`` (the
    ONNX closure-capture rule).

    Trace-time constant folding: when every input to a node is a
    compile-time concrete value (numpy or non-tracer jax array), the
    lowering is evaluated under ``jax.ensure_compile_time_eval()`` so its
    result stays concrete even inside a ``jit`` trace (JAX stages *all* ops
    on the trace otherwise). This is what lets exporter-emitted dynamic
    shape chains — ``Shape → Gather → Unsqueeze → Concat → Expand/Pad/
    Resize``, the standard torch/tf2onnx idiom for symbolic batch dims —
    fold down to the static shapes XLA requires.

    Under the ``fp32`` policy every node traces with
    ``jax.default_matmul_precision("highest")``: without it XLA is free to
    run f32 dots/convs through reduced-precision fast paths (single bf16
    passes on TPU; oneDNN fast-math on CPU — measured 8e-3 absolute error
    vs a float64 oracle on a depth-10 Conv1d), which breaks the policy's
    full-float32 parity contract. The bf16-operand policies (mixed/fast/
    bf16) cast operands explicitly and keep the default pass structure.
    """
    import jax

    if precision == "fp32":
        with jax.default_matmul_precision("highest"):
            return _interpret_nodes(graph, opset, precision, env, output_names)
    return _interpret_nodes(graph, opset, precision, env, output_names)


def _interpret_nodes(
    graph: GraphProto,
    opset: int,
    precision: str,
    env: Dict[str, object],
    output_names,
):
    import jax

    def _trailing_trimmed_len(outputs):
        n = len(outputs)
        while n and not outputs[n - 1]:
            n -= 1
        return n

    for node in graph.node:
        fn = op_registry.get_lowering(node.op_type, node.domain)
        ctx = op_registry.OpContext(
            op_type=node.op_type,
            attrs=node.attrs,
            opset=opset,
            precision=precision,
            node_name=node.name,
            # Outputs are POSITIONAL; an empty name means "omitted" but
            # later positions still count (e.g. LayerNorm ["y","","inv"]).
            # Count up to the last non-empty position so lowerings return
            # the full prefix and the zip below binds the right names.
            num_outputs=_trailing_trimmed_len(node.output),
            env=env,
            out_names=node.output,
        )
        try:
            args = [env[i] if i else None for i in node.input]
        except KeyError as e:
            raise ModelLoadError(
                f"node {node.name!r} ({node.op_type}) references unknown "
                f"value {e}"
            ) from e
        # Trim trailing absent optional inputs.
        while args and args[-1] is None:
            args.pop()
        if node.op_type not in _NO_FOLD_OPS and all(
            not isinstance(a, jax.core.Tracer) for a in args
        ):
            with jax.ensure_compile_time_eval():
                outs = fn(ctx, *args)
        else:
            outs = fn(ctx, *args)
        for out_name, out_val in zip(node.output, outs):
            if out_name:
                env[out_name] = out_val
    return tuple(env[o] for o in output_names)


def make_forward(model: ImportedModel, precision: str = "fp32",
                 disable_pallas_fusion: bool = False):
    """Build the pure forward function ``fn(params, *inputs) -> tuple(outputs)``.

    The returned function abstractly interprets the node list; under
    ``jax.jit`` this happens once at trace time, after which XLA owns the
    whole fused program (the analog of the reference's compiled ORT session).

    ``precision``: ``fp32`` | ``mixed`` (bf16 MXU operands, f32 accumulate)
    | ``fast`` (bf16 activations too) | ``bf16``.

    ``disable_pallas_fusion``: lower fused-block nodes via their reference
    subgraphs (required under pjit/mesh sharding, where a pallas_call would
    not partition over the batch axis).

    Models with ``dispatch_inputs`` (auto-detected merged-decoder flags,
    see ``_find_dispatch_inputs``) return a *dispatching* forward: the full
    input signature is unchanged, but when a flag argument is a concrete
    host value the call routes to an internally-jitted program specialized
    on that value (the If folds at trace time, so shape-divergent branches
    — untraceable via ``lax.cond`` — each compile standalone). A traced
    flag falls back to the ordinary single-program trace, preserving the
    shape-equal-If jit path.
    """
    _validate_ops(model)
    base = _make_plain_forward(model, precision, disable_pallas_fusion)
    if not model.dispatch_inputs:
        return base
    return _make_dispatching_forward(model, precision, disable_pallas_fusion, base)


def _make_plain_forward(model: ImportedModel, precision: str,
                        disable_pallas_fusion: bool, pinned=None):
    """The single-program forward. ``pinned`` optionally maps input names to
    trace-time constant values (specialization: those inputs are seeded into
    the env instead of consumed from ``*inputs``)."""
    graph = model.graph
    opset = model.opset
    consts = model.consts
    pinned = dict(pinned) if pinned else {}
    input_names = [n for n in model.input_names if n not in pinned]
    output_names = model.output_names

    def forward(params: Dict[str, np.ndarray], *inputs):
        if len(inputs) != len(input_names):
            raise ValueError(
                f"model expects {len(input_names)} inputs, got {len(inputs)}"
            )
        env: Dict[str, object] = dict(consts)
        if disable_pallas_fusion:
            env[op_registry.NO_PALLAS_SENTINEL] = True
        env.update(params)
        env.update(pinned)
        for name, x in zip(input_names, inputs):
            env[name] = x
        return interpret_graph(graph, opset, precision, env, output_names)

    return forward


def _make_dispatching_forward(model: ImportedModel, precision: str,
                              disable_pallas_fusion: bool, base):
    """Call-time dispatch over the flag inputs in ``model.dispatch_inputs``.

    One specialized, internally-jitted program per observed flag
    truthiness combination (for a qualifying flag the graph's outputs
    depend only on truthiness — every use is an If condition through
    value/truthiness-preserving chains — so keying the cache on the bool is
    exact). This is how the engine consumes optimum's
    ``decoder_model_merged.onnx`` with zero user flags, matching ORT's
    acceptance of the file (reference: src/classifier.rs:348-350)."""
    import jax

    flag_names = list(model.dispatch_inputs)
    flag_idx = [model.input_names.index(n) for n in flag_names]
    flag_set = frozenset(flag_idx)
    declared = {vi.name: vi for vi in model.graph.input}
    cache: Dict[Tuple[bool, ...], object] = {}

    def _canonical(name: str, truth: bool) -> np.ndarray:
        vi = declared[name]
        tt = vi.type.tensor_type
        dt = onnx_proto._DTYPE_TO_NUMPY.get(tt.elem_type, np.dtype(np.bool_))
        arr = np.asarray(1 if truth else 0, dtype=dt)
        return arr.reshape(1) if _static_shape(vi) == [1] else arr

    def _specialized(key: Tuple[bool, ...]):
        fn = cache.get(key)
        if fn is None:
            pinned = {
                n: _canonical(n, truth) for n, truth in zip(flag_names, key)
            }
            fn = jax.jit(
                _make_plain_forward(model, precision, disable_pallas_fusion, pinned)
            )
            cache[key] = fn
        return fn

    def forward(params: Dict[str, np.ndarray], *inputs):
        if len(inputs) != len(model.input_names):
            raise ValueError(
                f"model expects {len(model.input_names)} inputs, got "
                f"{len(inputs)}"
            )
        flags = [inputs[i] for i in flag_idx]
        if any(isinstance(f, jax.core.Tracer) for f in flags):
            return base(params, *inputs)
        key = tuple(bool(np.asarray(f).reshape(-1)[0]) for f in flags)
        rest = tuple(x for i, x in enumerate(inputs) if i not in flag_set)
        return _specialized(key)(params, *rest)

    return forward
