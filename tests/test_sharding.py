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
