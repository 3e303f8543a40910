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
