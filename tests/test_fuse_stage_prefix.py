"""Stage-prefix fusion (compiler/fuse_stage_prefix.py) + its lowering.

CPU tier: the fusion is structural and the fallback body must be
bit-identical to the unfused graph; the Pallas kernel path is exercised in
interpret mode via ``BIRDNET_STAGE123_INTERPRET=1`` (hardware timing runs
via scripts/bench_stage123.py).
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from birdnet_tpu.compiler.fuse_mbconv import unfuse_mbconv
from birdnet_tpu.compiler.fuse_stage_prefix import (
    fuse_stage_prefix,
    unfuse_stage_prefix,
)
from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.models import birdnet_v24


@pytest.fixture(scope="module")
def tiny_model():
    return birdnet_v24.build_model(num_species=10, width=0.1, depth=1, seed=0)


@pytest.fixture(scope="module")
def imported(tiny_model):
    return import_onnx(tiny_model)


def test_prefix_fused_at_import(imported):
    """import_model's optimize pipeline bundles stem + leading blocks."""
    fused = [n for n in imported.graph.node
             if n.op_type == "_FusedStagePrefix"]
    assert len(fused) == 1
    node = fused[0]
    strides = [int(s) for s in node.attrs["strides"]]
    # v2.4 schedule (width 0.1, depth 1): s1 block then two s2 blocks is
    # the maximum the 4x4 phase grid admits.
    assert strides == [1, 2, 2]
    assert len(node.input) == 3 + 10 * len(strides)
    # No bare stem conv remains before the fused node.
    assert node.attrs["body"].node[0].op_type == "Conv"


def test_unfuse_roundtrip(imported):
    """unfuse restores stem + _FusedMBConv nodes; mbconv unfuse then
    restores raw convs — the original import inventory."""
    import copy

    g = copy.deepcopy(imported.graph)
    n_prefix = unfuse_stage_prefix(g)
    assert n_prefix == 1
    assert not any(n.op_type == "_FusedStagePrefix" for n in g.node)
    assert any(n.op_type == "_FusedMBConv" for n in g.node)
    unfuse_mbconv(g)
    assert not any(n.op_type == "_FusedMBConv" for n in g.node)
    convs = [n for n in g.node if n.op_type == "Conv"]
    assert len(convs) >= 1 + 5 * n_prefix  # stem + 5 convs per block


def _run(imported, x, env=None, precision="fast"):
    old = {}
    env = env or {}
    for k, v in env.items():
        old[k] = os.environ.get(k)
        os.environ[k] = v
    try:
        fwd = make_forward(imported, precision=precision)
        return np.asarray(fwd(imported.params, x)[0], np.float32)
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(7)
    return (rng.normal(size=(2, birdnet_v24.SAMPLE_COUNT)) * 0.1).astype(
        np.float32
    )


def test_fallback_matches_unfused_graph(imported, audio):
    """With the kernel disabled, the fused graph's outputs are identical
    to a fully-unfused import (same nodes re-interpreted)."""
    got = _run(imported, audio, env={"BIRDNET_PALLAS_STAGE123": "0"})

    # Fresh build: import_onnx mutates the ModelProto in place (BN folding),
    # so the module fixture's proto cannot be imported twice. Same seed =>
    # identical weights.
    plain = import_onnx(
        birdnet_v24.build_model(num_species=10, width=0.1, depth=1, seed=0)
    )
    unfuse_stage_prefix(plain.graph)
    unfuse_mbconv(plain.graph)
    want = _run(plain, audio)
    np.testing.assert_array_equal(got, want)


def test_interpret_kernel_matches_fallback(imported, audio):
    """The megakernel path (interpret mode on CPU) agrees with the
    fallback interpretation within bf16 tolerance."""
    want = _run(imported, audio, env={"BIRDNET_PALLAS_STAGE123": "0"})
    got = _run(imported, audio, env={"BIRDNET_STAGE123_INTERPRET": "1"})
    scale = np.abs(want).max() + 1e-6
    assert np.abs(got - want).max() / scale < 5e-2


def test_partial_split_matches_fallback(imported, audio):
    """BIRDNET_STAGE123_SPLIT=k runs kernel prefix + interpreted suffix;
    outputs must still agree."""
    want = _run(imported, audio, env={"BIRDNET_PALLAS_STAGE123": "0"})
    for k in ("1", "2"):
        got = _run(
            imported, audio,
            env={"BIRDNET_STAGE123_INTERPRET": "1",
                 "BIRDNET_STAGE123_SPLIT": k},
        )
        scale = np.abs(want).max() + 1e-6
        assert np.abs(got - want).max() / scale < 5e-2, f"split={k}"


def test_split_zero_is_pure_fallback(imported, audio):
    got = _run(imported, audio, env={"BIRDNET_STAGE123_SPLIT": "0"})
    want = _run(imported, audio, env={"BIRDNET_PALLAS_STAGE123": "0"})
    np.testing.assert_array_equal(got, want)


def test_checkpoint_roundtrips_fused_node(imported, tmp_path, audio):
    """.btck save/load preserves the _FusedStagePrefix node (STRINGS +
    INTS + subgraph attrs survive the codec)."""
    from birdnet_tpu.checkpoint import load_checkpoint, save_checkpoint

    p = tmp_path / "m.btck"
    save_checkpoint(imported, p)
    back = load_checkpoint(p)
    fused = [n for n in back.graph.node
             if n.op_type == "_FusedStagePrefix"]
    assert len(fused) == 1
    assert [int(s) for s in fused[0].attrs["strides"]] == [1, 2, 2]
    assert list(fused[0].attrs["block_outputs"]) == list(
        next(n for n in imported.graph.node
             if n.op_type == "_FusedStagePrefix").attrs["block_outputs"]
    )
    got = _run(back, audio, env={"BIRDNET_PALLAS_STAGE123": "0"})
    want = _run(imported, audio, env={"BIRDNET_PALLAS_STAGE123": "0"})
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
