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
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from ..onnx.proto import GraphProto, NodeProto


def _usage_counts(graph: GraphProto) -> Dict[str, int]:
    counts: Dict[str, int] = {}
    for node in graph.node:
        for i in node.input:
            if i:
                counts[i] = counts.get(i, 0) + 1
    for out in graph.output:
        counts[out.name] = counts.get(out.name, 0) + 1
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
        for node in kept:
            node.input[:] = [rename.get(i, i) for i in node.input]
    removed = len(graph.node) - len(kept)
    graph.node[:] = kept
    return removed


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
        if not all(n in tensors for n in names) or prod.input[1] not in tensors:
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

        dtype = tensors[prod.input[1]].dtype
        tensors[prod.input[1]] = w_new.astype(dtype)
        bias_name = prod.input[2] if len(prod.input) > 2 and prod.input[2] else f"{prod.input[1]}_bn_bias"
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


def optimize_graph(graph: GraphProto, tensors: Dict[str, np.ndarray]) -> Dict[str, int]:
    """Run all passes; mutates graph/tensors. Returns per-pass counts."""
    stats = {}
    stats["identity_removed"] = eliminate_identity(graph)
    stats["batchnorm_folded"] = fold_batchnorm(graph, tensors)
    return stats
