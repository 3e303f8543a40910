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
    sole = _sole_consumer_query(graph)
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


def _scalar_init(name, tensors):
    """The scalar float value of initializer ``name``, or None."""
    if name not in tensors:
        return None
    arr = np.asarray(tensors[name]).reshape(-1)
    return float(arr[0]) if arr.size == 1 else None


def fuse_stft_frontend(graph: P.GraphProto, tensors: Dict) -> int:
    """Bundle the STFT-form spectrogram chain into one
    ``_FusedStftFrontend`` node.

    Matches the TF-export-style frontend starting at a graph input
    (models/_builder.py::stft_mel_frontend emits exactly this form;
    the real BirdNET exports are TF-produced — reference:
    src/detection.rs:15-80 only sees the resulting I/O shapes):

        x [N, S] -> STFT(step, window; onesided) -> [N, T, bins, 2]
          -> ReduceSumSquare(axes=[-1], keepdims=0)   (power spectrum)
          -> MatMul(mel)                              (mel projection)
          -> Add(eps) -> Log -> Transpose(0,2,1) -> Unsqueeze([1])

    ``mel`` may be an initializer or the output of a ``MelWeightMatrix``
    node with all-initializer inputs (the fusion materializes it). The
    lowering (compiler/ops.py::_fused_stft_frontend) runs the fused
    Pallas kernel; ineligible configs re-interpret ``body``,
    bit-identical to the unfused graph. Returns 1 on a match, else 0.
    """
    nodes = graph.node
    sole = _sole_consumer_query(graph)
    graph_inputs = {v.name for v in graph.input}
    producers = {n.output[0]: n for n in nodes if n.output}

    for stft in nodes:
        if stft.op_type != "STFT" or stft.input[0] not in graph_inputs:
            continue
        if int(stft.attrs.get("onesided", 1) or 0) != 1:
            continue
        if len(stft.input) < 3 or not stft.input[2]:
            continue
        hop = _scalar_init(stft.input[1], tensors)
        if hop is None or stft.input[2] not in tensors:
            continue
        hop = int(hop)
        window = np.asarray(tensors[stft.input[2]], np.float32).reshape(-1)
        flen = int(window.shape[0])
        if len(stft.input) > 3 and stft.input[3]:
            fl = _scalar_init(stft.input[3], tensors)
            if fl is None or int(fl) != flen:
                continue
        rss = sole(stft.output[0], "ReduceSumSquare")
        if rss is None or int(rss.attrs.get("keepdims", 1) or 0) != 0:
            continue
        axes = rss.attrs.get("axes")
        if axes is None and len(rss.input) > 1 and rss.input[1] in tensors:
            axes = np.asarray(tensors[rss.input[1]]).reshape(-1)
        if axes is None or [int(a) for a in np.asarray(axes).reshape(-1)] not in ([-1], [3]):
            continue
        mm = sole(rss.output[0], "MatMul")
        if mm is None or mm.input[0] != rss.output[0]:
            continue
        mel_name = mm.input[1]
        mel_node = None
        if mel_name in tensors:
            mel = np.asarray(tensors[mel_name], np.float32)
        else:
            mel_node = producers.get(mel_name)
            if (mel_node is None or mel_node.op_type != "MelWeightMatrix"
                    or sole(mel_name, "MatMul") is not mm
                    or any(i not in tensors for i in mel_node.input if i)):
                continue
            from ._melbank import mel_weight_matrix

            ins = [np.asarray(tensors[i]).reshape(-1) for i in mel_node.input]
            mel = mel_weight_matrix(
                int(ins[0][0]), int(ins[1][0]), int(ins[2][0]),
                float(ins[3][0]), float(ins[4][0]),
            ).astype(np.float32)
        if mel.ndim != 2 or mel.shape[0] != flen // 2 + 1:
            continue
        add = sole(mm.output[0], "Add")
        if add is None:
            continue
        eps_name = add.input[1] if add.input[0] == mm.output[0] else add.input[0]
        eps = _scalar_init(eps_name, tensors)
        if eps is None:
            continue
        log = sole(add.output[0], "Log")
        if log is None:
            continue
        tr = sole(log.output[0], "Transpose")
        if tr is None or [int(p) for p in tr.attrs.get("perm", [])] != [0, 2, 1]:
            continue
        unsq = sole(tr.output[0], "Unsqueeze")
        if unsq is None or not _axes_is_1(unsq, tensors):
            continue
        out_name = unsq.output[0]
        members = [stft, rss] + ([mel_node] if mel_node is not None else [])
        members += [mm, add, log, tr, unsq]
        body = P.GraphProto(
            name="stft_frontend_body",
            node=list(members),
            initializer=[],
            input=[],
            output=[P.make_value_info(out_name, P.DataType.FLOAT, [])],
        )
        # Window and mel ride as TENSOR attrs, not inputs: the lowering
        # folds the window into the DFT basis and reads the mel matrix's
        # nonzero bin support HOST-side at trace time, which param inputs
        # (traced arrays) could not provide.
        fused = P.make_node(
            "_FusedStftFrontend",
            [stft.input[0]],
            [out_name],
            hop=hop,
            frame_length=flen,
            eps=eps,
            window=window,
            mel=mel,
            body=body,
        )
        member_ids = {id(m) for m in members}
        new_nodes = []
        for n in nodes:
            if id(n) == id(unsq):
                new_nodes.append(fused)
            elif id(n) in member_ids:
                continue
            else:
                new_nodes.append(n)
        graph.node = new_nodes
        return 1
    return 0


def _sole_consumer_query(graph: P.GraphProto):
    """Build a ``sole(name, op_type)`` closure: the single consumer node
    of a tensor name (which may be referenced in several of that node's
    inputs), or None. Graph outputs have no sole consumer."""
    from .optimize import _usage_counts

    nodes = graph.node
    # Deep counts: a tensor also read inside an If/Loop/Scan body must not
    # look sole-consumed by its top-level reader (the producer would move
    # into the fused body and the subgraph's reference would dangle).
    uses = _usage_counts(graph)
    consumers: Dict[str, List[P.NodeProto]] = {}
    for n in nodes:
        for i in n.input:
            if i:
                consumers.setdefault(i, []).append(n)
    output_names = {o.name for o in graph.output}

    def sole(name, op_type):
        if name in output_names:
            return None
        cs = consumers.get(name, [])
        distinct = {id(c) for c in cs}
        if len(distinct) != 1:
            return None
        c = cs[0]
        if uses.get(name, 0) != sum(1 for i in c.input if i == name):
            return None
        return c if c.op_type == op_type else None

    return sole


def unfuse_frontend(graph: P.GraphProto) -> int:
    """Expand ``_FusedFrontend``/``_FusedStftFrontend`` back to the
    original op chain."""
    count = 0
    out = []
    for n in graph.node:
        if n.op_type in ("_FusedFrontend", "_FusedStftFrontend"):
            out.extend(n.attrs["body"].node)
            count += 1
        else:
            out.append(n)
    if count:
        graph.node = out
    return count
