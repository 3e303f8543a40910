"""Import-time graph optimizations.

These rewrites run once at model-load time, on numpy weights, before the
params pytree is built. They matter on TPU because weights are jit
*arguments* (donatable/shardable), which means XLA cannot constant-fold
across them — so weight-level fusions like Conv+BatchNorm folding must
happen here. This is the analog of the graph-optimization levels inside
ONNX Runtime's session build (reference boundary: src/classifier.rs:348-350).

Passes:
- ``eliminate_identity``: drop Identity/Dropout nodes, rewiring consumers.
- ``fold_batchnorm``: fold inference BatchNormalization into a preceding
  Conv/Gemm/ConvTranspose when the BN stats are initializers, rewriting the
  weights ``w' = w * s/sqrt(v+eps)`` and bias accordingly.
- ``sink_through_qdq``: move value-preserving ops (MaxPool, reshapes)
  sandwiched between a DequantizeLinear and a matching QuantizeLinear into
  the quantized domain, so quantized regions stay int8 end to end.
- ``fuse_qdq``: rewrite DequantizeLinear→Conv/MatMul/Gemm(→Relu)→
  QuantizeLinear chains into QLinearConv/QLinearMatMul/_QLinearGemm nodes
  whose lowerings run on the int8 MXU (the TensorRT-int8 analog; reference:
  src/tensorrt_config.rs int8 option).
- ``collapse_requant``: cancel adjacent DequantizeLinear→QuantizeLinear
  pairs with identical quantization parameters (exact round trip).
- ``eliminate_dead_nodes``: drop nodes whose outputs are never consumed.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from ..onnx.proto import GraphProto, NodeProto, make_attr


def _usage_counts(graph: GraphProto) -> Dict[str, int]:
    """Value-name use counts, INCLUDING references from If/Loop/Scan (and
    fused-op) subgraph bodies — those reference outer-scope tensors by
    name, so a rewrite that trusts top-level counts alone could fold or
    fuse away a tensor a subgraph still reads. Subgraph-local shadowing
    names inflate outer counts, which only makes rewrites more
    conservative, never wrong."""
    counts: Dict[str, int] = {}

    def add(g: GraphProto) -> None:
        for node in g.node:
            for i in node.input:
                if i:
                    counts[i] = counts.get(i, 0) + 1
            # Internal fused ops ("_Fused*" etc.) are exempt: their body is
            # an exact capture of already-removed top-level members, so its
            # references duplicate the fused node's own consumption rather
            # than representing an additional consumer.
            if node.op_type.startswith("_"):
                continue
            for a in node.attribute:
                sub = getattr(a, "g", None)
                if sub is not None:
                    add(sub)
                for sg in getattr(a, "graphs", []) or []:
                    add(sg)
        for out in g.output:
            counts[out.name] = counts.get(out.name, 0) + 1

    add(graph)
    return counts


def eliminate_identity(graph: GraphProto) -> int:
    """Remove Identity (and inference Dropout with single output) nodes."""
    rename: Dict[str, str] = {}
    kept: List[NodeProto] = []
    graph_outputs = {o.name for o in graph.output}
    for node in graph.node:
        removable = node.op_type == "Identity" or (
            node.op_type == "Dropout" and len([o for o in node.output if o]) == 1
        )
        if removable and node.output[0] not in graph_outputs:
            src = node.input[0]
            rename[node.output[0]] = rename.get(src, src)
        else:
            kept.append(node)
    if rename:
        _apply_rename(kept, rename)
    removed = len(graph.node) - len(kept)
    graph.node[:] = kept
    return removed


def _apply_rename(nodes: List[NodeProto], rename: Dict[str, str]) -> None:
    """Rewrite value references per ``rename`` — including closure-captured
    references inside If/Loop/Scan subgraph bodies, minus any name a
    subgraph defines locally (formal input, local initializer, or local
    node output), which shadows the outer binding per ONNX scoping. A
    top-level-only rewrite would leave subgraphs reading the eliminated
    Identity's stale output name (latent bug surfaced by the round-5
    import-time reference validator)."""
    for node in nodes:
        node.input[:] = [rename.get(i, i) for i in node.input]
        for attr in node.attribute:
            for sub in _attr_subgraphs(attr):
                shadowed = {vi.name for vi in sub.input}
                shadowed.update(t.name for t in sub.initializer)
                shadowed.update(sp.name for sp in sub.sparse_initializer)
                for n2 in sub.node:
                    shadowed.update(o for o in n2.output if o)
                inner = {
                    k: v for k, v in rename.items() if k not in shadowed
                }
                if inner:
                    _apply_rename(sub.node, inner)


def _attr_subgraphs(attr):
    if attr.g is not None:
        yield attr.g
    for g in attr.graphs:
        yield g


def fold_batchnorm(graph: GraphProto, tensors: Dict[str, np.ndarray]) -> int:
    """Fold BatchNormalization into the producing Conv/Gemm. Returns count."""
    producers: Dict[str, NodeProto] = {}
    for node in graph.node:
        for o in node.output:
            if o:
                producers[o] = node
    usage = _usage_counts(graph)
    graph_outputs = {o.name for o in graph.output}

    folded = 0
    kept: List[NodeProto] = []
    for node in graph.node:
        if node.op_type != "BatchNormalization" or len([o for o in node.output if o]) != 1:
            kept.append(node)
            continue
        x_name = node.input[0]
        prod = producers.get(x_name)
        if (
            prod is None
            or prod.op_type not in ("Conv", "Gemm")
            or usage.get(x_name, 0) != 1
            or x_name in graph_outputs
        ):
            kept.append(node)
            continue
        names = node.input[1:5]
        w_name = prod.input[1]
        # A bias that is produced dynamically (non-initializer) can't be folded:
        # the producer node would overwrite our corrected value at run time.
        bias_dynamic = len(prod.input) > 2 and prod.input[2] and prod.input[2] not in tensors
        if (
            not all(n in tensors for n in names)
            or w_name not in tensors
            # Weight-tied graphs: scaling a shared initializer in place would
            # corrupt the other consumers, so fold only single-consumer weights.
            or usage.get(w_name, 0) != 1
            or bias_dynamic
        ):
            kept.append(node)
            continue
        scale, bias, mean, var = (tensors[n].astype(np.float64) for n in names)
        eps = 1e-5
        for a in node.attribute:
            if a.name == "epsilon":
                eps = float(a.f)
        inv = scale / np.sqrt(var + eps)

        w = tensors[prod.input[1]].astype(np.float64)
        if prod.op_type == "Conv":
            # w: (M, C/g, *k); scale along output channels M
            w_new = w * inv.reshape((-1,) + (1,) * (w.ndim - 1))
        else:  # Gemm: w is (K, N) or (N, K) with transB
            trans_b = 0
            for a in prod.attribute:
                if a.name == "transB":
                    trans_b = int(a.i)
            w_new = w * (inv.reshape(-1, 1) if trans_b else inv.reshape(1, -1))

        if len(prod.input) > 2 and prod.input[2] in tensors:
            b_old = tensors[prod.input[2]].astype(np.float64)
        else:
            b_old = np.zeros(inv.shape[0], dtype=np.float64)
        b_new = (b_old - mean) * inv + bias

        dtype = tensors[w_name].dtype
        tensors[w_name] = w_new.astype(dtype)
        # Always write the corrected bias under a fresh name: the old bias
        # initializer may be shared with other nodes (w_name is unique here
        # thanks to the single-consumer check above, so this can't collide).
        bias_name = f"{w_name}_bn_bias"
        tensors[bias_name] = b_new.astype(dtype)
        if len(prod.input) > 2:
            prod.input[2] = bias_name
        else:
            prod.input.append(bias_name)
        # Rewire: producer now emits the BN's output name directly.
        prod.output[prod.output.index(x_name)] = node.output[0]
        producers[node.output[0]] = prod
        folded += 1
    graph.node[:] = kept
    return folded


# ---------------------------------------------------------------------------
# QDQ (quantize-dequantize) graph rewrites — the int8 MXU enablement passes
# ---------------------------------------------------------------------------

# Ops that commute with (de)quantization: applying them to the raw integer
# codes yields the same codes as quantizing their float result, provided the
# quantization parameters are unchanged (max is monotone; the rest only move
# elements around).
_QDQ_SINKABLE = {
    "MaxPool", "GlobalMaxPool", "Reshape", "Transpose", "Flatten",
    "Squeeze", "Unsqueeze",
}


def _producer_map(graph: GraphProto) -> Dict[str, NodeProto]:
    return {o: n for n in graph.node for o in n.output if o}


def _opt_input(node: NodeProto, idx: int) -> str:
    return node.input[idx] if len(node.input) > idx else ""


def _same_qparams(
    tensors, s_a: str, z_a: str, s_b: str, z_b: str, q_dtype=None
) -> bool:
    """True when two (scale, zero_point) initializer pairs are provably the
    same quantization (values compared, not names).

    ``q_dtype`` is the dtype of the already-quantized tensor (the DQ
    input). When BOTH zero points are absent, ONNX implies zp=0 of dtype
    uint8 on the QuantizeLinear side — so the pair only matches if the
    existing tensor is itself uint8 (an int8 tensor re-quantized through a
    zp-less Q would clamp negatives to 0 and change dtype)."""
    if s_a not in tensors or s_b not in tensors:
        return False
    if not np.array_equal(tensors[s_a], tensors[s_b]):
        return False
    if not z_a and not z_b:
        return q_dtype is not None and np.dtype(q_dtype) == np.uint8
    if not z_a or not z_b:
        return False
    if z_a not in tensors or z_b not in tensors:
        return False
    za, zb = tensors[z_a], tensors[z_b]
    return za.dtype == zb.dtype and np.array_equal(za, zb)


def _quantized_dtype(name: str, tensors, producers) -> Optional[np.dtype]:
    """Integer dtype of a quantized tensor, or None if unknowable."""
    if name in tensors:
        dt = tensors[name].dtype
        return dt if dt in (np.int8, np.uint8) else None
    p = producers.get(name)
    if p is None:
        return None
    if p.op_type == "QuantizeLinear":
        zp = _opt_input(p, 2)
        if zp:
            return tensors[zp].dtype if zp in tensors else None
        return np.dtype(np.uint8)
    if p.op_type in ("QLinearConv", "QLinearMatMul", "_QLinearGemm"):
        zp = _opt_input(p, 7)
        if zp:
            return tensors[zp].dtype if zp in tensors else None
        return np.dtype(np.uint8)
    if p.op_type in _QDQ_SINKABLE:
        return _quantized_dtype(p.input[0], tensors, producers)
    return None


def sink_through_qdq(graph: GraphProto, tensors) -> int:
    """Move DQ→(sinkable op)→Q sandwiches into the quantized domain."""
    moved = 0
    changed = True
    while changed:
        changed = False
        producers = _producer_map(graph)
        usage = _usage_counts(graph)
        gouts = {o.name for o in graph.output}
        for q in graph.node:
            if q.op_type != "QuantizeLinear":
                continue
            m = producers.get(q.input[0])
            if (
                m is None
                or m.op_type not in _QDQ_SINKABLE
                or usage.get(m.output[0], 0) != 1
                or m.output[0] in gouts
            ):
                continue
            d = producers.get(m.input[0])
            if (
                d is None
                or d.op_type != "DequantizeLinear"
                or usage.get(d.output[0], 0) != 1
                or d.output[0] in gouts
            ):
                continue
            q_dt = _quantized_dtype(d.input[0], tensors, producers)
            if q_dt is None:
                continue
            if not _same_qparams(
                tensors, d.input[1], _opt_input(d, 2),
                q.input[1], _opt_input(q, 2), q_dtype=q_dt,
            ):
                continue
            # Rewire: x_q → m(int) → q's old output; drop d and q (they must
            # be removed explicitly — m now produces q's output name, so
            # dead-node elimination would consider q still live).
            m.input[0] = d.input[0]
            m.output[0] = q.output[0]
            graph.node[:] = [n for n in graph.node if n is not d and n is not q]
            moved += 1
            changed = True
            break  # maps are stale; rescan
    return moved


def follow_activation(node: NodeProto, consumers, usage, gouts):
    """Match an epilogue-foldable activation chain hanging off ``node``.

    Returns ``(act_name, chain_nodes, out_tensor)`` — ``act_name`` is one
    of the _EPILOGUE_ACTS keys in compiler.ops ('' = none), ``chain_nodes``
    the nodes the fold consumes, ``out_tensor`` the tensor to quantize.
    Chains: Relu / Sigmoid / Tanh (single consumer), and SiLU as the
    two-consumer Mul(x, Sigmoid(x)) pattern. Every intermediate must be
    exclusively consumed and not a graph output.
    """
    out = node.output[0]
    if out in gouts:
        return "", [], out
    cs = consumers.get(out, [])
    unary = {"Relu": "relu", "Sigmoid": "sigmoid", "Tanh": "tanh"}
    if len(cs) == 1 and cs[0].op_type in unary:
        c = cs[0]
        if usage.get(c.output[0], 0) >= 1 and c.output[0] not in gouts:
            return unary[c.op_type], [c], c.output[0]
    if len(cs) == 2:
        sig = next((c for c in cs if c.op_type == "Sigmoid"), None)
        mul = next((c for c in cs if c.op_type == "Mul"), None)
        if (
            sig is not None
            and mul is not None
            and sig is not mul
            and sorted(mul.input) == sorted([out, sig.output[0]])
            and usage.get(sig.output[0], 0) == 1
            and sig.output[0] not in gouts
            and mul.output[0] not in gouts
        ):
            return "silu", [sig, mul], mul.output[0]
    return "", [], out


def _dequant_const(tensors, q_name, s_name, z_name) -> Optional[np.ndarray]:
    """Concretely dequantize an initializer (used for bias conversion)."""
    if q_name not in tensors or s_name not in tensors:
        return None
    if z_name and z_name not in tensors:
        return None
    q = tensors[q_name].astype(np.float64)
    if z_name:
        q = q - tensors[z_name].astype(np.float64)
    return q * tensors[s_name].astype(np.float64)


def fuse_qdq(graph: GraphProto, tensors) -> int:
    """Fuse DQ→{Conv,MatMul,Gemm}(→Relu)→Q chains into QLinear* nodes.

    The rewritten nodes keep the raw int8 tensors as operands, which the
    lowerings feed straight to the int8 MXU. An activation between the
    compute op and the requantize (relu/sigmoid/silu/tanh, see
    ``follow_activation``) folds into the f32 requant epilogue via the
    ``_fused_act`` attribute — exact, and one HBM pass instead of two.
    """
    producers = _producer_map(graph)
    usage = _usage_counts(graph)
    gouts = {o.name for o in graph.output}
    consumers: Dict[str, List[NodeProto]] = {}
    for n in graph.node:
        for i in n.input:
            if i:
                consumers.setdefault(i, []).append(n)

    replace: Dict[int, NodeProto] = {}
    removed = set()
    fused = 0
    for n in graph.node:
        if n.op_type not in ("Conv", "MatMul", "Gemm") or id(n) in removed:
            continue
        if n.op_type == "Gemm":
            attrs = n.attrs
            if float(attrs.get("alpha", 1.0)) != 1.0 or float(
                attrs.get("beta", 1.0)
            ) != 1.0:
                continue

        dq_x = producers.get(n.input[0])
        dq_w = producers.get(n.input[1])
        if (
            dq_x is None or dq_x.op_type != "DequantizeLinear"
            or dq_w is None or dq_w.op_type != "DequantizeLinear"
        ):
            continue
        x_s, x_zp = dq_x.input[1], _opt_input(dq_x, 2)
        w_s, w_zp = dq_w.input[1], _opt_input(dq_w, 2)
        # Activation scale/zp must be static per-tensor scalars (the int8
        # fast path's zero-point-padding correction requires it).
        if x_s not in tensors or tensors[x_s].size != 1:
            continue
        if x_zp and (x_zp not in tensors or tensors[x_zp].size != 1):
            continue
        if _quantized_dtype(dq_x.input[0], tensors, producers) is None:
            continue
        # Weights must be quantized initializers with a static scale.
        w_q_name = dq_w.input[0]
        if w_q_name not in tensors or tensors[w_q_name].dtype not in (
            np.int8, np.uint8,
        ):
            continue
        if w_s not in tensors or (w_zp and w_zp not in tensors):
            continue
        w_rank = tensors[w_q_name].ndim
        ws_val = tensors[w_s]
        if ws_val.size > 1:  # per-channel: the axis must match the lowering
            axis = int(dq_w.attrs.get("axis", 1))
            if axis < 0:
                axis += w_rank
            if n.op_type == "Conv":
                expected = 0
            elif n.op_type == "MatMul":
                expected = w_rank - 1
            else:  # Gemm: output-channel axis depends on transB
                expected = 0 if int(n.attrs.get("transB", 0)) else 1
            if axis != expected:
                continue

        # Optional bias (Conv/Gemm input 2): float initializer or DQ of an
        # int32 initializer; requantized concretely to scale x_s * w_s.
        b_f = None
        b_name = _opt_input(n, 2)
        dq_b = None
        if b_name:
            if b_name in tensors and np.issubdtype(
                tensors[b_name].dtype, np.floating
            ):
                b_f = tensors[b_name].astype(np.float64)
            else:
                dq_b = producers.get(b_name)
                if dq_b is None or dq_b.op_type != "DequantizeLinear":
                    continue
                b_f = _dequant_const(
                    tensors, dq_b.input[0], dq_b.input[1], _opt_input(dq_b, 2)
                )
                if b_f is None:
                    continue

        # Output chain: Conv →(activation)→ QuantizeLinear, each link
        # exclusive. Foldable activations (relu/sigmoid/silu/tanh) run in
        # the f32 requant epilogue — exact, one HBM pass instead of two.
        out = n.output[0]
        if out in gouts:
            continue
        act, act_nodes, act_out = follow_activation(n, consumers, usage, gouts)
        if act:
            if usage.get(act_out, 0) != 1:
                continue
            c1 = consumers[act_out][0]
        else:
            if usage.get(out, 0) != 1:
                continue
            c1 = consumers[out][0]
        if c1.op_type != "QuantizeLinear":
            continue
        qnode = c1
        y_s, y_zp = qnode.input[1], _opt_input(qnode, 2)
        if y_s not in tensors or tensors[y_s].size != 1:
            continue
        if y_zp and y_zp not in tensors:
            continue

        bias_i32_name = ""
        if b_f is not None:
            scale = tensors[x_s].astype(np.float64).reshape(()) * ws_val.astype(
                np.float64
            ).reshape(-1)
            b_i32 = np.clip(
                np.rint(b_f.reshape(-1) / scale), -(2**31), 2**31 - 1
            ).astype(np.int32)
            bias_i32_name = f"{n.output[0]}_qdq_bias"
            tensors[bias_i32_name] = b_i32

        new_op = {
            "Conv": "QLinearConv",
            "MatMul": "QLinearMatMul",
            "Gemm": "_QLinearGemm",
        }[n.op_type]
        inputs = [dq_x.input[0], x_s, x_zp, w_q_name, w_s, w_zp, y_s, y_zp]
        if bias_i32_name:
            inputs.append(bias_i32_name)
        while inputs and not inputs[-1]:
            inputs.pop()
        attribute = [a for a in n.attribute if a.name not in ("alpha", "beta")]
        if act:
            attribute = attribute + [make_attr("_fused_act", act)]
        replace[id(n)] = NodeProto(
            op_type=new_op,
            name=(n.name or n.op_type) + "_qfused",
            input=inputs,
            output=[qnode.output[0]],
            attribute=attribute,
        )
        removed.add(id(qnode))
        for a_node in act_nodes:
            removed.add(id(a_node))
        fused += 1
        # usage bookkeeping so later fusions see the dropped f32 edges
        usage[out] = 0
        usage[n.input[0]] = usage.get(n.input[0], 1) - 1
        usage[n.input[1]] = usage.get(n.input[1], 1) - 1
        if dq_b is not None:
            usage[b_name] = usage.get(b_name, 1) - 1

    if fused:
        graph.node[:] = [
            replace.get(id(x), x) for x in graph.node if id(x) not in removed
        ]
        eliminate_dead_nodes(graph)
    return fused


def collapse_requant(graph: GraphProto, tensors) -> int:
    """Cancel DQ→Q pairs with identical qparams: the round trip is exact
    (same scale/zp/dtype ⇒ clip(round((q-z)s/s)+z) == q), so consumers can
    read the original quantized tensor directly."""
    producers = _producer_map(graph)
    gouts = {o.name for o in graph.output}
    rename: Dict[str, str] = {}
    for q in graph.node:
        if q.op_type != "QuantizeLinear" or q.output[0] in gouts:
            continue
        src = rename.get(q.input[0], q.input[0])
        d = producers.get(src)
        if d is None or d.op_type != "DequantizeLinear":
            continue
        q_dt = _quantized_dtype(d.input[0], tensors, producers)
        if q_dt is None:
            continue
        if not _same_qparams(
            tensors, d.input[1], _opt_input(d, 2),
            q.input[1], _opt_input(q, 2), q_dtype=q_dt,
        ):
            continue
        rename[q.output[0]] = rename.get(d.input[0], d.input[0])
    if not rename:
        return 0
    for n in graph.node:
        n.input[:] = [rename.get(i, i) for i in n.input]
    eliminate_dead_nodes(graph)
    return len(rename)


def eliminate_dead_nodes(graph: GraphProto) -> int:
    """Drop nodes none of whose outputs are consumed (fixpoint)."""
    removed = 0
    while True:
        used = {o.name for o in graph.output}
        for n in graph.node:
            used.update(i for i in n.input if i)
        kept = [
            n for n in graph.node
            if any(o in used for o in n.output if o)
        ]
        if len(kept) == len(graph.node):
            return removed
        removed += len(graph.node) - len(kept)
        graph.node[:] = kept


def _collect_used_names(graph: GraphProto, used: set) -> None:
    """All value names referenced by nodes/outputs, recursing into subgraph
    attributes (If/Loop/Scan bodies and fused-op bodies reference outer-scope
    tensors by name)."""
    for node in graph.node:
        used.update(i for i in node.input if i)
        for a in node.attribute:
            g = getattr(a, "g", None)
            if g is not None:
                _collect_used_names(g, used)
            for sg in getattr(a, "graphs", []) or []:
                _collect_used_names(sg, used)
    for o in graph.output:
        used.add(o.name)


def prune_dead_initializers(graph: GraphProto, tensors: Dict[str, np.ndarray]) -> int:
    """Drop tensors no kept node or graph output references. Rewrites like
    BN folding and frontend fusion orphan their source initializers (scale/
    bias/mean/var, window/mel); without this sweep split_params would promote
    the dead floats into jit params and carry them through every donation,
    shard, and checkpoint."""
    used: set = set()
    _collect_used_names(graph, used)
    used.update(i.name for i in graph.input)
    dead = [k for k in tensors if k not in used]
    for k in dead:
        del tensors[k]
    return len(dead)


def optimize_graph(graph: GraphProto, tensors: Dict[str, np.ndarray]) -> Dict[str, int]:
    """Run all passes; mutates graph/tensors. Returns per-pass counts."""
    stats = {}
    stats["identity_removed"] = eliminate_identity(graph)
    stats["batchnorm_folded"] = fold_batchnorm(graph, tensors)
    stats["qdq_sunk"] = sink_through_qdq(graph, tensors)
    stats["qdq_fused"] = fuse_qdq(graph, tensors)
    stats["requant_collapsed"] = collapse_requant(graph, tensors)
    if stats["qdq_fused"] or stats["requant_collapsed"]:
        stats["dead_removed"] = eliminate_dead_nodes(graph)
    from .fuse_frontend import fuse_frontend, fuse_stft_frontend
    from .fuse_mbconv import fuse_mbconv
    from .fuse_stage_prefix import fuse_stage_prefix

    stats["mbconv_fused"] = fuse_mbconv(graph, tensors)
    stats["stage_prefix_blocks"] = fuse_stage_prefix(graph, tensors)
    stats["frontend_fused"] = fuse_frontend(graph, tensors)
    stats["stft_frontend_fused"] = fuse_stft_frontend(graph, tensors)
    stats["dead_initializers"] = prune_dead_initializers(graph, tensors)
    return stats
