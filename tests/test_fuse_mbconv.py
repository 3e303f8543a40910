"""MBConv fusion pass: structural + fallback-equality tests (CPU)."""

from copy import deepcopy

import numpy as np
import pytest

from birdnet_tpu.compiler.fuse_mbconv import fuse_mbconv, unfuse_mbconv
from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.models import birdnet_v24
from birdnet_tpu.onnx import proto as P


@pytest.fixture(scope="module")
def fused_model():
    return import_onnx(birdnet_v24.build_model(width=0.25, depth=2,
                                               num_species=10))


def test_fuses_all_blocks(fused_model):
    # 12 MBConv blocks in the depth-2 schedule (stride-1 AND stride-2 both
    # fuse); the stage-prefix pass then bundles the first 6 (stem + stages
    # 1-3) into one _FusedStagePrefix, leaving 6 standalone.
    n = sum(1 for nd in fused_model.graph.node if nd.op_type == "_FusedMBConv")
    assert n == 6
    prefix = [nd for nd in fused_model.graph.node
              if nd.op_type == "_FusedStagePrefix"]
    assert len(prefix) == 1
    assert [int(s) for s in prefix[0].attrs["strides"]] == [1, 1, 2, 1, 2, 1]


def test_fused_node_wiring(fused_model):
    node = next(nd for nd in fused_model.graph.node
                if nd.op_type == "_FusedMBConv")
    assert len(node.input) == 11  # x + 5 weight/bias pairs
    assert len(node.attrs["body"].node) in (14, 15)  # +Add when residual
    assert node.attrs["residual"] in (0, 1)
    # every weight input resolves to a param or const
    known = set(fused_model.params) | set(fused_model.consts)
    for name in node.input[1:]:
        assert name in known


def test_fallback_matches_unfused_bitwise(fused_model):
    """The interpret fallback re-runs the original nodes: identical output."""
    from birdnet_tpu.compiler.fuse_stage_prefix import unfuse_stage_prefix

    x = (np.random.default_rng(0).normal(size=(2, 144_000)) * 0.1
         ).astype(np.float32)
    unfused = deepcopy(fused_model)
    assert unfuse_stage_prefix(unfused.graph) == 1
    assert unfuse_mbconv(unfused.graph) == 12
    for precision in ("fp32", "fast"):
        yf = np.asarray(
            make_forward(fused_model, precision)(fused_model.params, x)[0],
            np.float32)
        yu = np.asarray(
            make_forward(unfused, precision)(unfused.params, x)[0], np.float32)
        np.testing.assert_array_equal(yf, yu)


def test_unfuse_roundtrip_refuses_nothing(fused_model):
    from birdnet_tpu.compiler.fuse_stage_prefix import (
        fuse_stage_prefix,
        unfuse_stage_prefix,
    )

    g = deepcopy(fused_model.graph)
    n_before = len(g.node)
    assert unfuse_stage_prefix(g) == 1
    assert unfuse_mbconv(g) == 12
    assert not any(nd.op_type == "_FusedMBConv" for nd in g.node)
    # re-fusing the expanded graph finds the same 12 blocks + same prefix
    tensors = {}
    tensors.update(fused_model.params)
    tensors.update(fused_model.consts)
    assert fuse_mbconv(g, tensors) == 12
    assert fuse_stage_prefix(g, tensors) == 6
    assert len(g.node) == n_before


def test_fused_graph_serializes(fused_model):
    """The body graph attribute survives the proto codec (checkpoint path)."""
    model = birdnet_v24.build_model(width=0.1, depth=1, num_species=10)
    imp = import_onnx(model)
    n = sum(1 for nd in imp.graph.node if nd.op_type == "_FusedMBConv")
    assert n > 0
    blob = P.encode_model(P.make_model(imp.graph, opset_version=imp.opset))
    decoded = P.decode_model(blob)
    n2 = sum(1 for nd in decoded.graph.node
             if nd.op_type == "_FusedMBConv")
    assert n2 == n
    body = next(nd for nd in decoded.graph.node
                if nd.op_type == "_FusedMBConv").attrs["body"]
    assert len(body.node) in (14, 15)


def test_valid_padding_depthwise_not_fused():
    """A padless (VALID) 3x3 depthwise chain must not match: the fused
    kernel assumes SAME padding (ONNX default pads is zero)."""
    from birdnet_tpu.models._builder import GraphBuilder

    gb = GraphBuilder("t", seed=0)
    c = 16
    x = gb.conv_bn_act("input", 1, c, [3, 3], strides=[1, 1])
    y = gb.conv_bn_act(x, c, c, [1, 1])
    # depthwise WITHOUT pads (VALID)
    y = gb.conv(y, c, c, [3, 3], pads=[0, 0, 0, 0], group=c)
    y = gb.batchnorm(y, c)
    y = gb.swish(y)
    y = gb.se_block(y, c)
    y = gb.conv(y, c, c, [1, 1], pads=[0, 0, 0, 0])
    y = gb.batchnorm(y, c)
    model = gb.build(
        inputs=[P.make_value_info("input", P.DataType.FLOAT, [1, 1, 16, 16])],
        outputs=[P.make_value_info(y, P.DataType.FLOAT, [])],
    )
    imp = import_onnx(model)
    assert not any(n.op_type == "_FusedMBConv" for n in imp.graph.node)


def test_pad_predicates_auto_pad_spellings():
    """Equivalent auto_pad spellings are accepted; VALID 3x3 is not."""
    from birdnet_tpu.compiler.fuse_mbconv import _dw3x3_stride, _is_1x1

    w1 = np.zeros((8, 4, 1, 1), np.float32)
    wd = np.zeros((8, 1, 3, 3), np.float32)
    tensors = {"w1": w1, "wd": wd}

    def conv(w, **attrs):
        return P.make_node("Conv", ["x", w, "b"], ["y"], **attrs)

    # 1x1: explicit zero pads, VALID, SAME_UPPER, SAME_LOWER all equal
    assert _is_1x1(conv("w1"), tensors)
    assert _is_1x1(conv("w1", auto_pad="VALID"), tensors)
    assert _is_1x1(conv("w1", auto_pad="SAME_UPPER"), tensors)
    assert _is_1x1(conv("w1", auto_pad="SAME_LOWER"), tensors)
    assert not _is_1x1(conv("w1", pads=[1, 1, 1, 1]), tensors)

    # dw 3x3 s1: explicit SAME pads or SAME_* auto_pad; never VALID/default
    same = dict(group=8, kernel_shape=[3, 3], strides=[1, 1])
    assert _dw3x3_stride(conv("wd", pads=[1, 1, 1, 1], **same), tensors) == 1
    assert _dw3x3_stride(conv("wd", auto_pad="SAME_UPPER", **same),
                         tensors) == 1
    assert _dw3x3_stride(conv("wd", auto_pad="SAME_LOWER", **same),
                         tensors) == 1
    assert _dw3x3_stride(conv("wd", **same), tensors) is None  # default = 0
    assert _dw3x3_stride(conv("wd", auto_pad="VALID", **same), tensors) is None
    assert _dw3x3_stride(conv("wd", pads=[0, 0, 0, 0], **same),
                         tensors) is None

    # dw 3x3 s2: only the top-left anchored explicit pad convention — the
    # conv tap_source models (center at even input coords). SAME_UPPER at
    # stride 2 centers at odd coords: a different function, must not match.
    s2 = dict(group=8, kernel_shape=[3, 3], strides=[2, 2])
    assert _dw3x3_stride(conv("wd", pads=[1, 1, 1, 1], **s2), tensors) == 2
    assert _dw3x3_stride(conv("wd", pads=[1, 1, 0, 0], **s2), tensors) == 2
    assert _dw3x3_stride(conv("wd", auto_pad="SAME_UPPER", **s2),
                         tensors) is None
    assert _dw3x3_stride(conv("wd", pads=[0, 0, 1, 1], **s2), tensors) is None
    assert _dw3x3_stride(conv("wd", **s2), tensors) is None
