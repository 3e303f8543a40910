"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx
from birdnet_tpu.detection import detect_model_type
from birdnet_tpu.onnx import proto as P
from birdnet_tpu.parallel import make_mesh, make_sharded_program, param_specs


@pytest.fixture(scope="module")
def tiny_v24():
    from birdnet_tpu.models import birdnet_v24

    imp = import_onnx(
        P.encode_model(birdnet_v24.build_model(width=0.1, depth=1, num_species=16))
    )
    cfg = detect_model_type(*imp.detection_shapes())
    return imp, cfg


@pytest.fixture(scope="module")
def tiny_v30():
    """BirdNET v3.0: dual output [embeddings, logits] (logits at 1)."""
    from birdnet_tpu.models import birdnet_v30

    imp = import_onnx(
        P.encode_model(
            birdnet_v30.build_model(
                width=0.1, depth=1, num_species=24, embedding_dim=16
            )
        )
    )
    cfg = detect_model_type(*imp.detection_shapes())
    return imp, cfg


@pytest.fixture(scope="module")
def tiny_perch():
    """Perch v2 at the REAL 14,795-class head width (random weights, tiny
    backbone): 4-output demux (logits at index 3), variable embedding dim
    (40 here — shape-driven, not the published 1536). 14,795 divides no
    power-of-two model axis, so this fixture exercises the _species_pad
    head-TP path end-to-end (reference: src/classifier.rs:929-934,
    detection.rs:217-231)."""
    from birdnet_tpu.models import perch_v2

    imp = import_onnx(
        P.encode_model(
            perch_v2.build_model(
                width=0.1, depth=1, num_species=14795, embedding_dim=40
            )
        )
    )
    cfg = detect_model_type(*imp.detection_shapes())
    assert cfg.num_species == 14795
    return imp, cfg


def _single_device_oracle(imp, cfg, x, k):
    from birdnet_tpu._demux import demux_indices
    from birdnet_tpu.compiler.importer import make_forward

    li, ei = demux_indices(cfg.model_type)
    outs = jax.jit(make_forward(imp))(imp.params, x)
    logits = np.asarray(outs[li])
    idx = np.argsort(logits, axis=1)[:, ::-1][:, :k]
    conf = 1.0 / (1.0 + np.exp(-np.take_along_axis(logits, idx, 1)))
    emb = np.asarray(outs[ei]) if ei is not None else None
    return logits, idx, conf, emb


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert set(mesh.axis_names) == {"data", "model"}
    mesh2 = make_mesh(shape=(8, 1))
    assert mesh2.shape["data"] == 8


def test_param_specs_shard_head(tiny_v24):
    imp, cfg = tiny_v24
    specs = param_specs(imp.params, cfg)
    head = [n for n, s in specs.items() if s != jax.sharding.PartitionSpec()]
    assert head, "classifier head should be TP-sharded"
    for name in head:
        p = imp.params[name]
        assert cfg.num_species in p.shape


@pytest.mark.parametrize("shape", [(8, 1), (4, 2), (2, 4)])
def test_sharded_program_matches_single_device(tiny_v24, shape):
    imp, cfg = tiny_v24
    mesh = make_mesh(shape=shape)
    fn, shard_inputs = make_sharded_program(imp, cfg, mesh, top_k=5)
    batch = shape[0] * 2  # divisible by data axis
    x = np.random.default_rng(0).normal(size=(batch, cfg.sample_count)).astype(np.float32)
    params, xs = shard_inputs(imp.params, x)
    conf, idx, logits = fn(params, xs)
    assert conf.shape == (batch, 5)
    assert logits.shape == (batch, cfg.num_species)

    # single-device oracle
    from birdnet_tpu.compiler.importer import make_forward

    fwd = make_forward(imp)
    ref_logits = np.asarray(jax.jit(fwd)(imp.params, x)[0])
    np.testing.assert_allclose(np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-5)
    ref_top = np.argsort(ref_logits, axis=1)[:, ::-1][:, :5]
    np.testing.assert_array_equal(np.asarray(idx), ref_top)


@pytest.mark.parametrize("step_frac,shape", [(1.0, (4, 2)), (0.5, (8, 1))])
def test_sharded_stream_matches_oracle(tiny_v24, step_frac, shape):
    from birdnet_tpu.parallel import make_sharded_stream_program

    imp, cfg = tiny_v24
    mesh = make_mesh(shape=shape)
    tile = shape[0] * 2
    n_tiles = 3
    step = int(cfg.sample_count * step_frac)
    fn, shard_inputs = make_sharded_stream_program(
        imp, cfg, mesh, n_tiles=n_tiles, step=step, tile=tile, top_k=4
    )
    n_seg = n_tiles * tile
    rng_l = np.random.default_rng(7)
    audio = rng_l.normal(size=(n_seg - 1) * step + cfg.sample_count).astype(np.float32)
    params, audio_d = shard_inputs(imp.params, audio)
    conf, idx = fn(params, audio_d)
    assert conf.shape == (n_seg, 4)

    # oracle: single-device per-segment batches
    from birdnet_tpu.compiler.importer import make_forward

    fwd = make_forward(imp)
    frames = np.stack(
        [audio[i * step: i * step + cfg.sample_count] for i in range(n_seg)]
    )
    ref_logits = np.asarray(jax.jit(fwd)(imp.params, frames)[0])
    ref_idx = np.argsort(ref_logits, axis=1)[:, ::-1][:, :4]
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    ref_conf = 1.0 / (1.0 + np.exp(-np.take_along_axis(ref_logits, ref_idx, 1)))
    np.testing.assert_allclose(np.asarray(conf), ref_conf, rtol=1e-4, atol=1e-5)


def test_sharded_stream_int16(tiny_v24):
    from birdnet_tpu.parallel import make_sharded_stream_program

    imp, cfg = tiny_v24
    mesh = make_mesh(shape=(4, 2))
    fn, shard_inputs = make_sharded_stream_program(
        imp, cfg, mesh, n_tiles=2, step=cfg.sample_count, tile=8, top_k=3,
    )
    audio = (np.random.default_rng(0).normal(size=16 * cfg.sample_count) * 3000).astype(np.int16)
    params, audio_d = shard_inputs(imp.params, audio)
    conf, idx = fn(params, audio_d)
    assert conf.shape == (16, 3)


def test_sharded_program_collectives_on_device_mesh(tiny_v24):
    """Logits stay sharded over the model axis; top-k gathers only B×K."""
    imp, cfg = tiny_v24
    mesh = make_mesh(shape=(2, 4))
    fn, shard_inputs = make_sharded_program(imp, cfg, mesh, top_k=3)
    x = np.zeros((4, cfg.sample_count), np.float32)
    params, xs = shard_inputs(imp.params, x)
    conf, idx, logits = fn(params, xs)
    jax.block_until_ready(logits)
    # logits sharded over (data, model)
    assert len(logits.sharding.device_set) == 8


# ---------------------------------------------------------------------------
# Family coverage beyond v2.4: dual-output v3.0 and 4-output Perch v2 at the
# real 14,795-class head width (round-3 verdict item 3 — the TP assignment
# had only ever seen single-output graphs).
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(4, 2), (2, 4)])
def test_sharded_v30_dual_output_parity(tiny_v30, shape):
    """v3.0: embeddings at output 0, logits at 1 — the sharded program must
    demux the right output and return batch-sharded embeddings."""
    imp, cfg = tiny_v30
    mesh = make_mesh(shape=shape)
    fn, shard_inputs = make_sharded_program(
        imp, cfg, mesh, top_k=5, with_embeddings=True
    )
    batch = shape[0] * 2
    x = np.random.default_rng(3).normal(
        size=(batch, cfg.sample_count)
    ).astype(np.float32)
    params, xs = shard_inputs(imp.params, x)
    conf, idx, logits, emb = fn(params, xs)
    assert emb.shape == (batch, 16)

    ref_logits, ref_idx, ref_conf, ref_emb = _single_device_oracle(
        imp, cfg, x, 5
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(conf), ref_conf, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(emb), ref_emb, rtol=1e-4, atol=1e-5
    )


def test_sharded_perch_real_head_width_tp(tiny_perch):
    """Perch v2, 14,795 classes over a 4-way model axis: the head is
    zero-padded to 14,796 for TP, pad positions never enter top-K, and
    returned logits slice back to 14,795 — exact index parity and logits
    allclose vs the unsharded single-device run."""
    imp, cfg = tiny_perch
    mesh = make_mesh(shape=(2, 4))
    fn, shard_inputs = make_sharded_program(
        imp, cfg, mesh, top_k=5, with_embeddings=True
    )
    batch = 4
    x = np.random.default_rng(4).normal(
        size=(batch, cfg.sample_count)
    ).astype(np.float32)
    params, xs = shard_inputs(imp.params, x)
    # the head weight must actually be TP-sharded (padded to 14,796)
    head = [
        name for name, p in params.items()
        if any(d in (14795, 14796) for d in p.shape)
    ]
    assert head, "no head params found"
    sharded_head = [
        name for name in head
        if "model" in tuple(params[name].sharding.spec)
    ]
    assert sharded_head, "real-width head did not TP-shard"
    for name in sharded_head:
        assert 14796 in params[name].shape  # padded, divisible by 4

    conf, idx, logits, emb = fn(params, xs)
    assert logits.shape == (batch, 14795)
    assert emb.shape == (batch, 40)
    assert int(np.asarray(idx).max()) < 14795  # pad positions never win

    ref_logits, ref_idx, ref_conf, ref_emb = _single_device_oracle(
        imp, cfg, x, 5
    )
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(conf), ref_conf, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(emb), ref_emb, rtol=1e-4, atol=1e-5
    )


def test_sharded_perch_stream_real_head(tiny_perch):
    """The streaming program through the same padded-head path."""
    from birdnet_tpu.parallel import make_sharded_stream_program

    imp, cfg = tiny_perch
    mesh = make_mesh(shape=(2, 4))
    tile, n_tiles = 4, 2
    fn, shard_inputs = make_sharded_stream_program(
        imp, cfg, mesh, n_tiles=n_tiles, step=cfg.sample_count, tile=tile,
        top_k=3,
    )
    n_seg = n_tiles * tile
    audio = (
        np.random.default_rng(5).normal(size=n_seg * cfg.sample_count) * 3000
    ).astype(np.int16)
    params, audio_d = shard_inputs(imp.params, audio)
    conf, idx = fn(params, audio_d)
    assert conf.shape == (n_seg, 3)
    assert int(np.asarray(idx).max()) < 14795

    frames = (
        audio.reshape(n_seg, cfg.sample_count).astype(np.float32)
        * (1.0 / 32768.0)
    )
    _, ref_idx, ref_conf, _ = _single_device_oracle(imp, cfg, frames, 3)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(conf), ref_conf, rtol=1e-4, atol=1e-5
    )


def test_species_pad_helper():
    from birdnet_tpu.parallel.sharding import _species_pad
    from birdnet_tpu.types import ModelType

    cfg = detect_model_type([1, 144000], [[1, 15]])
    params = {
        "head_w": np.ones((8, 15), np.float32),
        "head_wT": np.ones((15, 8), np.float32),
        "head_b": np.arange(15, dtype=np.float32),
        "conv": np.ones((4, 4, 3, 3), np.float32),
    }
    padded, n_pad = _species_pad(params, cfg, 4)
    assert n_pad == 16
    assert padded["head_w"].shape == (8, 16)
    assert padded["head_wT"].shape == (16, 8)
    assert padded["head_b"].shape == (16,)
    assert padded["conv"].shape == (4, 4, 3, 3)
    np.testing.assert_array_equal(padded["head_b"][:15], params["head_b"])
    assert padded["head_b"][15] == 0.0
    # divisible → untouched (identity)
    same, n_same = _species_pad(params, cfg, 5)
    assert n_same == 15 and same["head_w"] is params["head_w"]


def test_species_pad_refuses_softmax_head():
    """A graph whose padded head feeds a cross-position op (Softmax over
    the species axis) must refuse species padding with a typed error —
    zero pad logits would contribute exp(0)=1 to the softmax denominator
    and silently change real-class probabilities (advisor finding)."""
    import birdnet_tpu.onnx.proto as P
    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.errors import ModelLoadError
    from birdnet_tpu.parallel.sharding import _species_pad_model

    n = 15  # does not divide 4 → padding engages
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, n)).astype(np.float32)
    graph = P.GraphProto(
        name="softmax_head",
        node=[
            P.make_node("MatMul", ["x", "w"], ["logits"]),
            P.make_node("Softmax", ["logits"], ["probs"], axis=-1),
        ],
        initializer=[P.TensorProto.from_numpy(w, name="w")],
        input=[P.make_value_info("x", P.DataType.FLOAT, [1, 64])],
        output=[P.make_value_info("probs", P.DataType.FLOAT, [1, n])],
    )
    imp = import_onnx(P.encode_model(P.make_model(graph)))
    cfg = detect_model_type([1, 144000], [[1, n]])
    with pytest.raises(ModelLoadError, match="species-pad"):
        _species_pad_model(imp, cfg, 4)
    # Divisible model axis: no padding, no refusal.
    same, n_same = _species_pad_model(imp, cfg, 5)
    assert n_same == n and same is imp


def test_species_pad_allows_positionwise_tail():
    """Positionwise ops downstream of the padded head (Sigmoid, Add, Mul)
    stay allowed — zero pads are value-exact through them."""
    import birdnet_tpu.onnx.proto as P
    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.parallel.sharding import _species_pad_model

    n = 15
    rng = np.random.default_rng(1)
    w = rng.normal(size=(64, n)).astype(np.float32)
    b = rng.normal(size=(n,)).astype(np.float32)
    graph = P.GraphProto(
        name="sigmoid_head",
        node=[
            P.make_node("MatMul", ["x", "w"], ["h"]),
            P.make_node("Add", ["h", "b"], ["logits"]),
            P.make_node("Sigmoid", ["logits"], ["y"]),
        ],
        initializer=[
            P.TensorProto.from_numpy(w, name="w"),
            P.TensorProto.from_numpy(b, name="b"),
        ],
        input=[P.make_value_info("x", P.DataType.FLOAT, [1, 64])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [1, n])],
    )
    imp = import_onnx(P.encode_model(P.make_model(graph)))
    cfg = detect_model_type([1, 144000], [[1, n]])
    padded, n_pad = _species_pad_model(imp, cfg, 4)
    assert n_pad == 16
    assert padded.params["w"].shape == (64, 16)


# ---------------------------------------------------------------------------
# Full-geometry sharded parity (slow tier; round-4 verdict item 2).
# The fast tier shards width-0.1 backbones; these run the REAL channel
# geometry through make_sharded_program once:
#   BIRDNET_TEST_SLOW=1 python -m pytest tests/test_sharding.py -k full_geometry
# ---------------------------------------------------------------------------


def _full_geometry_parity(imp, cfg, with_embeddings, seed):
    mesh = make_mesh()  # (4 data, 2 model) on the virtual 8-device mesh
    dp = mesh.shape["data"]
    fn, shard_inputs = make_sharded_program(
        imp, cfg, mesh, top_k=10, with_embeddings=with_embeddings
    )
    x = np.random.default_rng(seed).normal(
        size=(dp * 2, cfg.sample_count)
    ).astype(np.float32)
    params, xs = shard_inputs(imp.params, x)
    outs = fn(params, xs)
    jax.block_until_ready(outs)
    conf, idx, logits = outs[:3]
    ref_logits, ref_idx, ref_conf, ref_emb = _single_device_oracle(
        imp, cfg, x, 10
    )
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(
        np.asarray(logits), ref_logits, rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(conf), ref_conf, rtol=1e-4, atol=1e-5
    )
    if with_embeddings:
        np.testing.assert_allclose(
            np.asarray(outs[3]), ref_emb, rtol=1e-4, atol=1e-5
        )


def _slow_gate():
    import os

    if not os.environ.get("BIRDNET_TEST_SLOW"):
        pytest.skip("set BIRDNET_TEST_SLOW=1 for full-geometry sharded runs")


def test_full_geometry_v24_sharded_parity():
    """Full-size BirdNET v2.4 (50 MB params, 6,522 species — the exact
    build entry() single-chips) through DP+TP: 6,522 divides the 2-way
    model axis, so the head shards WITHOUT species padding at real
    reduction-axis sizes."""
    _slow_gate()
    from birdnet_tpu.models import birdnet_v24

    imp = import_onnx(P.encode_model(birdnet_v24.build_model()))
    cfg = detect_model_type(*imp.detection_shapes())
    assert cfg.num_species == 6522
    assert imp.param_bytes() > 45e6  # genuinely the 50 MB geometry
    _full_geometry_parity(imp, cfg, with_embeddings=False, seed=11)


def test_full_geometry_perch_sharded_parity():
    """Real-width Perch v2 (published head: 14,795 classes, 1536-dim
    embeddings; full-width backbone) through DP+TP: 14,795 divides no
    power-of-two axis, so the real-width head rides the species-pad TP
    path with real channel counts on both matmul operands."""
    _slow_gate()
    from birdnet_tpu.models import perch_v2

    imp = import_onnx(
        P.encode_model(
            perch_v2.build_model(num_species=14795, embedding_dim=1536)
        )
    )
    cfg = detect_model_type(*imp.detection_shapes())
    assert cfg.num_species == 14795
    _full_geometry_parity(imp, cfg, with_embeddings=True, seed=12)


def test_full_geometry_v30_sharded_parity():
    """Full-size BirdNET v3.0 (dual output: 1024-dim embeddings at 0,
    6,522-class logits at 1) through DP+TP at real geometry."""
    _slow_gate()
    from birdnet_tpu.models import birdnet_v30

    imp = import_onnx(P.encode_model(birdnet_v30.build_model()))
    cfg = detect_model_type(*imp.detection_shapes())
    _full_geometry_parity(imp, cfg, with_embeddings=True, seed=13)
