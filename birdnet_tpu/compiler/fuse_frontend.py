"""Import-time bundling of the conv-form audio frontend.

BirdNET-style graphs embed their spectrogram stage as a strided Conv1d
filterbank over raw audio + power + log compression
(models/_builder.py::learned_frontend emits exactly this form):

    x [N, S] -> Unsqueeze -> Conv1d([F,1,K], stride hop, VALID)
      -> Mul(y, y) -> Add(eps) -> Log -> Unsqueeze -> [N, 1, F, T]

Lowered op-by-op, the conv re-reads every sample K/hop (~3.7x) times and
the power/log round-trip HBM. This pass bundles the chain into ONE
``_FusedFrontend`` node; the lowering (compiler/ops.py) runs the fused
Pallas kernel :func:`birdnet_tpu.ops.pallas.frontend.
segments_filterbank_logpower` — each segment is pre-folded into its own
[rows, hop] matrix (free pad+reshape), block-pipelined into VMEM once,
framed by static row slices, matmul'd on the MXU and log-compressed
without touching HBM in between. Ineligible
configs re-interpret the ``body`` attribute, bit-identical to the
unfused graph.

Reference context: the reference feeds pre-framed host audio to the ORT
session and gets the frontend inside the engine's fused graph
(reference: src/classifier.rs:637-639); on TPU this pass + kernel are
the native equivalent.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List

import numpy as np

from ..onnx import proto as P
from .fuse_mbconv import _attr_list, _auto_pad


def _axes_is_1(node, tensors) -> bool:
    """Unsqueeze with axes == [1] (attr form or input form)."""
    axes = node.attrs.get("axes")
    if axes is not None:
        return [int(a) for a in axes] == [1]
    if len(node.input) > 1 and node.input[1] in tensors:
        return [int(a) for a in np.asarray(tensors[node.input[1]]).reshape(-1)] == [1]
    return False


def fuse_frontend(graph: P.GraphProto, tensors: Dict) -> int:
    """Bundle the conv-frontend chain into one ``_FusedFrontend`` node.

    Returns 1 if a frontend was matched (at most one per graph — it must
    start at a graph input), else 0. Mutates ``graph.node``.
    """
    nodes = graph.node
    uses = Counter(i for n in nodes for i in n.input if i)
    for o in graph.output:
        uses[o.name] += 1
    consumers: Dict[str, List[P.NodeProto]] = {}
    for n in nodes:
        for i in n.input:
            if i:
                consumers.setdefault(i, []).append(n)

    output_names = {o.name for o in graph.output}

    def sole(name, op_type):
        """The single consumer node of ``name`` (which may reference it in
        SEVERAL inputs — the power stage is Mul(y, y)), or None."""
        if name in output_names:
            return None
        cs = consumers.get(name, [])
        distinct = {id(c) for c in cs}
        if len(distinct) != 1:
            return None
        c = cs[0]
        if uses[name] != sum(1 for i in c.input if i == name):
            return None
        return c if c.op_type == op_type else None

    graph_inputs = {v.name for v in graph.input}
    for unsq in nodes:
        if unsq.op_type != "Unsqueeze" or unsq.input[0] not in graph_inputs:
            continue
        if not _axes_is_1(unsq, tensors):
            continue
        conv = sole(unsq.output[0], "Conv")
        if conv is None or len(conv.input) != 2 or conv.input[1] not in tensors:
            continue
        w = tensors[conv.input[1]]
        if w.ndim != 3 or w.shape[1] != 1:
            continue
        strides = _attr_list(conv, "strides", [1])
        if (len(strides) != 1 or strides[0] < 1
                or int(conv.attrs.get("group", 1) or 1) != 1
                or _attr_list(conv, "dilations", [1]) != [1]):
            continue
        if _auto_pad(conv) == "NOTSET":
            if _attr_list(conv, "pads", [0, 0]) != [0, 0]:
                continue
        elif _auto_pad(conv) != "VALID":
            continue
        hop = strides[0]
        power = sole(conv.output[0], "Mul")
        if power is None or power.input[0] != power.input[1]:
            continue
        add = sole(power.output[0], "Add")
        if add is None:
            continue
        eps_name = add.input[1] if add.input[0] == power.output[0] else add.input[0]
        if eps_name not in tensors:
            continue
        eps_arr = np.asarray(tensors[eps_name]).reshape(-1)
        if eps_arr.size != 1:
            continue
        log = sole(add.output[0], "Log")
        if log is None:
            continue
        unsq2 = sole(log.output[0], "Unsqueeze")
        if unsq2 is None or not _axes_is_1(unsq2, tensors):
            continue
        out_name = unsq2.output[0]
        members = [unsq, conv, power, add, log, unsq2]
        body = P.GraphProto(
            name="frontend_body",
            node=list(members),
            initializer=[],
            input=[],
            output=[P.make_value_info(out_name, P.DataType.FLOAT, [])],
        )
        fused = P.make_node(
            "_FusedFrontend",
            [unsq.input[0], conv.input[1]],
            [out_name],
            hop=hop,
            eps=float(eps_arr[0]),
            body=body,
        )
        member_ids = {id(m) for m in members}
        new_nodes = []
        for n in nodes:
            if id(n) == id(unsq2):
                new_nodes.append(fused)
            elif id(n) in member_ids:
                continue
            else:
                new_nodes.append(n)
        graph.node = new_nodes
        return 1
    return 0


def unfuse_frontend(graph: P.GraphProto) -> int:
    """Expand ``_FusedFrontend`` back to the original op chain."""
    count = 0
    out = []
    for n in graph.node:
        if n.op_type == "_FusedFrontend":
            out.extend(n.attrs["body"].node)
            count += 1
        else:
            out.append(n)
    if count:
        graph.node = out
    return count
