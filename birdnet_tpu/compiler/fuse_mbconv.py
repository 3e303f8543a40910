"""Import-time grouping of MBConv (inverted-residual) chains.

The EfficientNet-style backbone used by BirdNET v2.4/v3.0 spends most of
its HBM traffic on MBConv interiors: expand 1x1 + SiLU -> depthwise 3x3 +
SiLU -> squeeze-excitation -> project 1x1 -> residual. Lowered op-by-op,
every interior activation round-trips HBM. This pass matches the chain
(post Conv+BatchNorm folding) and replaces it with ONE ``_FusedMBConv``
node that carries the original nodes as a ``body`` graph attribute.

The lowering (compiler/ops.py::_fused_mbconv) re-interprets ``body``,
which is bit-identical to the unfused graph by construction — the
grouping is zero-overhead structure for analysis tooling
(stage-prefix fusion, per-block profiling) rather than a kernel
dispatch point. The round-1 per-block VMEM kernels this node once
routed to were measured slower than XLA's lowering and deleted; the
full investigation and numbers live in docs/performance.md
§"backbone-fusion question".

The match is purely structural, so fusion is always safe.
``unfuse_mbconv`` restores the original nodes (used by the PTQ
quantizer, which needs to see the raw Convs).
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional

from ..onnx import proto as P


def _attr_list(node, name, default):
    v = node.attrs.get(name)
    if v is None:
        return default
    return [int(x) for x in v]


def _auto_pad(node) -> str:
    ap = node.attrs.get("auto_pad", "NOTSET") or "NOTSET"
    if isinstance(ap, bytes):
        ap = ap.decode()
    return ap


def _is_1x1(node, tensors) -> bool:
    if len(node.input) < 2 or node.input[1] not in tensors:
        return False
    w = tensors[node.input[1]]
    if w.ndim != 4 or tuple(w.shape[2:]) != (1, 1):
        return False
    s = _attr_list(node, "strides", [1, 1])
    g = int(node.attrs.get("group", 1) or 1)
    d = _attr_list(node, "dilations", [1, 1])
    ap = _auto_pad(node)
    # For a 1x1 stride-1 kernel, VALID / SAME_UPPER / SAME_LOWER are all
    # equivalent to explicit zero pads.
    if ap == "NOTSET":
        pads_ok = _attr_list(node, "pads", [0, 0, 0, 0]) == [0, 0, 0, 0]
    else:
        pads_ok = ap in ("VALID", "SAME_UPPER", "SAME_LOWER")
    return pads_ok and s == [1, 1] and g == 1 and d == [1, 1]


def _dw3x3_stride(node, tensors) -> Optional[int]:
    """If ``node`` is a depthwise 3x3 SAME conv the fused kernels model,
    return its stride (1 or 2); else None.

    Stride 2 additionally requires the *top-left anchored* pad convention
    (explicit pads starting [1, 1, ...]): the conv center sits at even
    input coordinates (``y_in = 2*y_out``), which is how both the model
    builder (models/_builder.py:76) and the polyphase-plane megakernel
    (ops/pallas/stage123.py::tap_source) place it. SAME_UPPER at stride 2
    centers at odd coordinates — a different function — and must NOT
    match.
    """
    if len(node.input) < 2 or node.input[1] not in tensors:
        return None
    w = tensors[node.input[1]]
    if w.ndim != 4 or w.shape[1] != 1 or tuple(w.shape[2:]) != (3, 3):
        return None
    g = int(node.attrs.get("group", 1) or 1)
    if (g != w.shape[0]
            or _attr_list(node, "kernel_shape", [3, 3]) != [3, 3]
            or _attr_list(node, "dilations", [1, 1]) != [1, 1]):
        return None
    stride = _attr_list(node, "strides", [1, 1])
    if stride not in ([1, 1], [2, 2]):
        return None
    s = stride[0]
    ap = _auto_pad(node)
    # ONNX's default pads is ZERO (VALID), which must NOT match. For a
    # 3x3 stride-1 kernel SAME_UPPER and SAME_LOWER both resolve to
    # (1,1) per side; for stride 2 only the anchored explicit form is
    # accepted (see docstring).
    if s == 1:
        if ap == "NOTSET":
            pads_ok = _attr_list(node, "pads", None) == [1, 1, 1, 1]
        else:
            pads_ok = ap in ("SAME_UPPER", "SAME_LOWER")
    else:
        pads = _attr_list(node, "pads", None)
        # [1,1,b,r] with b/r in {0,1}: for even input dims the bottom /
        # right pad row is never read at stride 2, so these are the same
        # conv; the builder emits [1,1,1,1].
        pads_ok = (ap == "NOTSET" and pads is not None
                   and pads[:2] == [1, 1] and pads[2] in (0, 1)
                   and pads[3] in (0, 1))
    return s if pads_ok else None


def fuse_mbconv(graph: P.GraphProto, tensors: Dict) -> int:
    """Rewrite matched MBConv chains into ``_FusedMBConv`` nodes.

    Returns the number of blocks fused. Mutates ``graph.node``.
    """
    nodes = graph.node
    prod: Dict[str, P.NodeProto] = {}
    for n in nodes:
        for o in n.output:
            if o:
                prod[o] = n
    from .optimize import _usage_counts

    # Deep counts (subgraph-body references included) — see optimize.py.
    uses = Counter(_usage_counts(graph))

    def swish_parts(mul_node) -> Optional[str]:
        """If ``mul_node`` is Mul(a, Sigmoid(a)), return a's name."""
        if mul_node.op_type != "Mul" or len(mul_node.input) != 2:
            return None
        a, b = mul_node.input
        sig = prod.get(b)
        if sig is not None and sig.op_type == "Sigmoid" and sig.input[0] == a:
            return a
        sig = prod.get(a)
        if sig is not None and sig.op_type == "Sigmoid" and sig.input[0] == b:
            return b
        return None

    consumed = set()
    replacements: List = []  # (anchor_node, fused_node, member_ids)
    consumers: Dict[str, List[P.NodeProto]] = {}
    for n in nodes:
        for i in n.input:
            if i:
                consumers.setdefault(i, []).append(n)

    for dw in nodes:
        if dw.op_type != "Conv" or id(dw) in consumed:
            continue
        dw_stride = _dw3x3_stride(dw, tensors)
        if dw_stride is None or len(dw.input) != 3:
            continue
        # ---- backwards: h1 = swish(expand Conv) ----
        h1_mul = prod.get(dw.input[0])
        if h1_mul is None or id(h1_mul) in consumed:
            continue
        bn1 = swish_parts(h1_mul)
        if bn1 is None or uses[h1_mul.output[0]] != 1 or uses[bn1] != 2:
            continue
        expand = prod.get(bn1)
        if (expand is None or expand.op_type != "Conv"
                or not _is_1x1(expand, tensors) or len(expand.input) != 3
                or expand.input[1] not in tensors):
            continue
        x_name = expand.input[0]
        sig1 = [c for c in consumers.get(bn1, []) if c.op_type == "Sigmoid"]
        if len(sig1) != 1:
            continue
        # ---- forwards: h2 = swish(dw out) ----
        bn2 = dw.output[0]
        if uses[bn2] != 2:
            continue
        h2_muls = [c for c in consumers.get(bn2, []) if c.op_type == "Mul"]
        sig2 = [c for c in consumers.get(bn2, []) if c.op_type == "Sigmoid"]
        if len(h2_muls) != 1 or len(sig2) != 1:
            continue
        h2_mul = h2_muls[0]
        if swish_parts(h2_mul) != bn2:
            continue
        h2 = h2_mul.output[0]
        if uses[h2] != 2:
            continue
        # ---- SE: GAP -> conv -> swish -> conv -> sigmoid -> Mul(h2, .) ----
        gaps = [c for c in consumers.get(h2, []) if c.op_type == "GlobalAveragePool"]
        scale_muls = [c for c in consumers.get(h2, []) if c.op_type == "Mul"]
        if len(gaps) != 1 or len(scale_muls) != 1:
            continue
        gap = gaps[0]
        if uses[gap.output[0]] != 1:
            continue
        se1 = next(iter(consumers.get(gap.output[0], [])), None)
        if (se1 is None or se1.op_type != "Conv" or not _is_1x1(se1, tensors)
                or len(se1.input) != 3 or se1.input[1] not in tensors
                or uses[se1.output[0]] != 2):
            continue
        se_swishes = [c for c in consumers.get(se1.output[0], [])
                      if c.op_type == "Mul"]
        se_sigs = [c for c in consumers.get(se1.output[0], [])
                   if c.op_type == "Sigmoid"]
        if len(se_swishes) != 1 or len(se_sigs) != 1:
            continue
        se_swish = se_swishes[0]
        if (swish_parts(se_swish) != se1.output[0]
                or uses[se_swish.output[0]] != 1):
            continue
        se2 = next(iter(consumers.get(se_swish.output[0], [])), None)
        if (se2 is None or se2.op_type != "Conv" or not _is_1x1(se2, tensors)
                or len(se2.input) != 3 or se2.input[1] not in tensors
                or uses[se2.output[0]] != 1):
            continue
        se2_sig = next(iter(consumers.get(se2.output[0], [])), None)
        if (se2_sig is None or se2_sig.op_type != "Sigmoid"
                or uses[se2_sig.output[0]] != 1):
            continue
        scale_mul = scale_muls[0]
        if set(scale_mul.input) != {h2, se2_sig.output[0]}:
            continue
        h3 = scale_mul.output[0]
        if uses[h3] != 1:
            continue
        # ---- project ----
        proj = next(iter(consumers.get(h3, [])), None)
        if (proj is None or proj.op_type != "Conv" or not _is_1x1(proj, tensors)
                or len(proj.input) != 3 or proj.input[1] not in tensors):
            continue
        out_name = proj.output[0]
        members = [expand, sig1[0], h1_mul, dw, sig2[0], h2_mul, gap,
                   se1, se_sigs[0], se_swish, se2, se2_sig, scale_mul, proj]
        residual = 0
        # ---- optional residual Add(x, proj) — stride 1 only (at stride 2
        # the spatial shapes differ, so no Add can reference x) ----
        if dw_stride == 1 and uses[out_name] == 1:
            add = next(iter(consumers.get(out_name, [])), None)
            if (add is not None and add.op_type == "Add"
                    and set(add.input) == {x_name, out_name}):
                members.append(add)
                out_name = add.output[0]
                residual = 1
        member_ids = {id(m) for m in members}
        if member_ids & consumed:
            continue
        body = P.GraphProto(
            name="mbconv_body",
            node=list(members),
            initializer=[],
            input=[],
            output=[P.make_value_info(out_name, P.DataType.FLOAT, [])],
        )
        fused = P.make_node(
            "_FusedMBConv",
            [x_name,
             expand.input[1], expand.input[2],
             dw.input[1], dw.input[2],
             se1.input[1], se1.input[2],
             se2.input[1], se2.input[2],
             proj.input[1], proj.input[2]],
            [out_name],
            residual=residual,
            stride=dw_stride,
            body=body,
        )
        consumed |= member_ids
        replacements.append((members[-1], fused, member_ids))

    if not replacements:
        return 0
    anchor_to_fused = {id(anchor): fused for anchor, fused, _ in replacements}
    new_nodes = []
    for n in nodes:
        if id(n) in anchor_to_fused:
            new_nodes.append(anchor_to_fused[id(n)])
        elif id(n) in consumed:
            continue
        else:
            new_nodes.append(n)
    graph.node = new_nodes
    return len(replacements)


def unfuse_mbconv(graph: P.GraphProto) -> int:
    """Expand ``_FusedMBConv`` nodes back to their original chains."""
    count = 0
    out = []
    for n in graph.node:
        if n.op_type == "_FusedMBConv":
            out.extend(n.attrs["body"].node)
            count += 1
        else:
            out.append(n)
    if count:
        graph.node = out
    return count
