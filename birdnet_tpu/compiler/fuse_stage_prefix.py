"""Import-time bundling of the backbone prefix: stem + leading MBConv chain.

Round-1 profiling (docs/performance.md) put the stem and the first six
MBConv blocks — 75% of BirdNET v2.4's device time — at XLA's HBM
byte-roofline: every conv materializes its activations. The polyphase-plane
megakernel (ops/pallas/stage123.py) runs that whole prefix for each segment
inside VMEM. This pass makes the kernel reachable from *imported graphs*:
after :func:`fuse_mbconv` has grouped individual blocks, it matches

    stem Conv([C,1,3,3], stride 2, anchored SAME pads) -> swish
        -> _FusedMBConv * k

and replaces the chain with ONE ``_FusedStagePrefix`` node carrying the
original nodes as a ``body`` attribute. The lowering (compiler/ops.py)
decides kernel eligibility at trace time (input geometry, backend,
precision, split point) and otherwise re-interprets ``body`` — which is
bit-identical to the unfused graph by construction.

The chain stops at the point the polyphase layout can no longer subsample
by plane selection: after the stem the phase grid is 4x4, and each
stride-2 block halves it, so at most two stride-2 blocks are bundled
(12x64 final resolution for the 96x511 mel image). Blocks beyond that
remain individual ``_FusedMBConv`` nodes.

Reference context: the reference gets cross-layer fusion from the ONNX
Runtime / TensorRT engine (reference: src/tensorrt_config.rs:100-160);
XLA cannot fuse across convolutions, so this pass + kernel are the
TPU-native equivalent.
"""

from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional

from ..onnx import proto as P
from .fuse_mbconv import _attr_list, _auto_pad

# After the stem the phase grid is (4, 4); each stride-2 block halves it,
# and plane-selection subsampling needs the grid to stay integral.
_MAX_STRIDE_PRODUCT = 4


def _is_stem(node, tensors) -> bool:
    """Conv with weight [C, 1, 3, 3], stride [2, 2], anchored SAME pads
    (top/left 1 — the convention tap_source models; see
    fuse_mbconv._dw3x3_stride for why SAME_UPPER must not match), bias."""
    if node.op_type != "Conv" or len(node.input) != 3:
        return False
    if node.input[1] not in tensors:
        return False
    w = tensors[node.input[1]]
    if w.ndim != 4 or w.shape[1] != 1 or tuple(w.shape[2:]) != (3, 3):
        return False
    if int(node.attrs.get("group", 1) or 1) != 1:
        return False
    if (_attr_list(node, "strides", [1, 1]) != [2, 2]
            or _attr_list(node, "dilations", [1, 1]) != [1, 1]):
        return False
    if _auto_pad(node) != "NOTSET":
        return False
    pads = _attr_list(node, "pads", None)
    return (pads is not None and pads[:2] == [1, 1]
            and pads[2] in (0, 1) and pads[3] in (0, 1))


def fuse_stage_prefix(graph: P.GraphProto, tensors: Dict,
                      max_blocks: Optional[int] = None) -> int:
    """Bundle stem + leading ``_FusedMBConv`` chain into one
    ``_FusedStagePrefix`` node. Returns the number of blocks bundled
    (0 if no prefix was matched). Mutates ``graph.node``.

    Must run after :func:`fuse_mbconv` (it consumes its output nodes).
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
    consumers: Dict[str, List[P.NodeProto]] = {}
    for n in nodes:
        for i in n.input:
            if i:
                consumers.setdefault(i, []).append(n)

    def sole_consumer(name):
        if uses[name] != 1:
            return None
        return next(iter(consumers.get(name, [])), None)

    for stem in nodes:
        if not _is_stem(stem, tensors):
            continue
        # ---- swish(stem): stem output feeds Sigmoid AND Mul (2 uses) ----
        if uses[stem.output[0]] != 2:
            continue
        cs = consumers.get(stem.output[0], [])
        sigs = [c for c in cs if c.op_type == "Sigmoid"]
        muls = [c for c in cs if c.op_type == "Mul"]
        if len(sigs) != 1 or len(muls) != 1:
            continue
        sig, mul = sigs[0], muls[0]
        if (uses[sig.output[0]] != 1
                or set(mul.input) != {stem.output[0], sig.output[0]}):
            continue
        # ---- chain of fused blocks ----
        chain: List[P.NodeProto] = []
        cur = mul.output[0]
        stride_product = 1
        while max_blocks is None or len(chain) < max_blocks:
            nxt = sole_consumer(cur)
            if nxt is None or nxt.op_type != "_FusedMBConv":
                break
            s = int(nxt.attrs.get("stride", 1))
            if stride_product * s > _MAX_STRIDE_PRODUCT:
                break
            if any(name not in tensors for name in nxt.input[1:]):
                break
            chain.append(nxt)
            stride_product *= s
            cur = nxt.output[0]
        if not chain:
            continue
        out_name = chain[-1].output[0]
        body = P.GraphProto(
            name="stage_prefix_body",
            node=[stem, sig, mul] + list(chain),
            initializer=[],
            input=[],
            output=[P.make_value_info(out_name, P.DataType.FLOAT, [])],
        )
        fused = P.make_node(
            "_FusedStagePrefix",
            [stem.input[0], stem.input[1], stem.input[2]]
            + [name for blk in chain for name in blk.input[1:]],
            [out_name],
            strides=[int(b.attrs.get("stride", 1)) for b in chain],
            residuals=[int(b.attrs.get("residual", 0)) for b in chain],
            block_outputs=[b.output[0] for b in chain],
            body=body,
        )
        member_ids = {id(m) for m in body.node}
        new_nodes = []
        for n in nodes:
            if id(n) == id(chain[-1]):
                new_nodes.append(fused)
            elif id(n) in member_ids:
                continue
            else:
                new_nodes.append(n)
        graph.node = new_nodes
        return len(chain)
    return 0


def unfuse_stage_prefix(graph: P.GraphProto) -> int:
    """Expand ``_FusedStagePrefix`` back to stem + ``_FusedMBConv`` nodes
    (after which :func:`fuse_mbconv.unfuse_mbconv` restores raw convs)."""
    count = 0
    out = []
    for n in graph.node:
        if n.op_type == "_FusedStagePrefix":
            out.extend(n.attrs["body"].node)
            count += 1
        else:
            out.append(n)
    if count:
        graph.node = out
    return count
