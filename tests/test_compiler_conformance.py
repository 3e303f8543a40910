"""ONNX spec-conformance regression tests for the round-2 compiler review.

Each test pins a silent-numerics or graph-rewrite hazard found by review:
attribute forms the original lowerings ignored (Mod fmod, ArgMax
select_last_index, Resize coordinate_transformation_mode, ReduceSum
noop_with_empty_axes), input forms they mishandled (float Range, Slice
negative-step clamping, opset-10 Resize), and optimizer rewrites that
corrupted shared or dynamic graph structure (BatchNorm folding with
weight-tied or dynamically-produced bias, orphaned initializers).

Oracles are torch CPU where its semantics provably match the ONNX spec,
hand-computed values otherwise — never the code under test.
"""

import numpy as np
import pytest

from birdnet_tpu.compiler import import_onnx, make_forward
from birdnet_tpu.compiler.optimize import optimize_graph, prune_dead_initializers
from birdnet_tpu.onnx import proto as P
from tests.test_compiler_ops import run_graph

torch = pytest.importorskip("torch")


# ---------------------------------------------------------------------------
# Mod: fmod attribute (C fmod = sign of dividend)
# ---------------------------------------------------------------------------


def test_mod_fmod_floats():
    a = np.array([-5.0, 5.0, -5.0, 5.0, -4.3], dtype=np.float32)
    b = np.array([3.0, -3.0, -3.0, 3.0, 2.1], dtype=np.float32)
    (y,) = run_graph([P.make_node("Mod", ["a", "b"], ["y"], fmod=1)], {"a": a, "b": b})
    expected = torch.fmod(torch.from_numpy(a), torch.from_numpy(b)).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-6)
    # fmod(-5, 3) is -2, NOT python-mod's +1
    assert y[0] == pytest.approx(-2.0)


def test_mod_integer_default():
    a = np.array([-5, 5, 7], dtype=np.int64)
    b = np.array([3, -3, 4], dtype=np.int64)
    (y,) = run_graph([P.make_node("Mod", ["a", "b"], ["y"])], {"a": a, "b": b})
    np.testing.assert_array_equal(y, np.mod(a, b))


# ---------------------------------------------------------------------------
# ReduceSum opset 18: noop_with_empty_axes with the axes input absent
# ---------------------------------------------------------------------------


def test_reduce_noop_with_absent_axes_input():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    (y,) = run_graph(
        [P.make_node("ReduceSum", ["x"], ["y"], noop_with_empty_axes=1, keepdims=0)],
        {"x": x},
        opset=18,
    )
    np.testing.assert_array_equal(y, x)  # identity, not a full reduction


def test_reduce_full_when_noop_unset():
    x = np.arange(12, dtype=np.float32).reshape(3, 4)
    (y,) = run_graph(
        [P.make_node("ReduceSum", ["x"], ["y"], keepdims=0)], {"x": x}, opset=18
    )
    assert y.shape == ()
    assert y == pytest.approx(x.sum())


# ---------------------------------------------------------------------------
# ArgMax / ArgMin: select_last_index
# ---------------------------------------------------------------------------


def test_argmax_select_last_index():
    x = np.array([[1.0, 9.0, 3.0, 9.0, 2.0]], dtype=np.float32)
    (first,) = run_graph([P.make_node("ArgMax", ["x"], ["y"], axis=1, keepdims=0)], {"x": x})
    (last,) = run_graph(
        [P.make_node("ArgMax", ["x"], ["y"], axis=1, keepdims=0, select_last_index=1)],
        {"x": x},
    )
    assert first[0] == 1 and last[0] == 3


def test_argmin_select_last_index_negative_axis():
    x = np.array([[4.0, -2.0, 7.0], [4.0, -2.0, -2.0]], dtype=np.float32)
    (last,) = run_graph(
        [P.make_node("ArgMin", ["x"], ["y"], axis=-1, keepdims=1, select_last_index=1)],
        {"x": x},
    )
    np.testing.assert_array_equal(last, [[1], [2]])


# ---------------------------------------------------------------------------
# Range: float start/limit/delta
# ---------------------------------------------------------------------------


def test_range_float():
    (y,) = run_graph(
        [P.make_node("Range", ["s", "l", "d"], ["y"])],
        {},
        {
            "s": np.float32(0.0),
            "l": np.float32(1.0),
            "d": np.float32(0.25),
        },
    )
    np.testing.assert_allclose(y, [0.0, 0.25, 0.5, 0.75], rtol=1e-6)
    assert y.dtype == np.float32


def test_range_float_noninteger_count():
    (y,) = run_graph(
        [P.make_node("Range", ["s", "l", "d"], ["y"])],
        {},
        {"s": np.float32(0.0), "l": np.float32(5.0), "d": np.float32(1.5)},
    )
    np.testing.assert_allclose(y, [0.0, 1.5, 3.0, 4.5], rtol=1e-6)


def test_range_int_still_works():
    (y,) = run_graph(
        [P.make_node("Range", ["s", "l", "d"], ["y"])],
        {},
        {"s": np.int64(2), "l": np.int64(9), "d": np.int64(3)},
    )
    np.testing.assert_array_equal(y, [2, 5, 8])


# ---------------------------------------------------------------------------
# Slice: negative step with out-of-range negative start
# ---------------------------------------------------------------------------


def test_slice_negative_step_start_clamps_to_zero():
    x = np.arange(5, dtype=np.float32)
    int64_min = np.iinfo(np.int64).min
    (y,) = run_graph(
        [P.make_node("Slice", ["x", "st", "en", "ax", "sp"], ["y"])],
        {"x": x},
        {
            "st": np.array([-7], dtype=np.int64),
            "en": np.array([int64_min], dtype=np.int64),
            "ax": np.array([0], dtype=np.int64),
            "sp": np.array([-1], dtype=np.int64),
        },
    )
    # ONNX clamps start into [0, dim-1] for negative steps: only element 0.
    np.testing.assert_array_equal(y, [0.0])


def test_slice_negative_step_full_reverse():
    x = np.arange(5, dtype=np.float32)
    int64_min = np.iinfo(np.int64).min
    int64_max = np.iinfo(np.int64).max
    (y,) = run_graph(
        [P.make_node("Slice", ["x", "st", "en", "ax", "sp"], ["y"])],
        {"x": x},
        {
            "st": np.array([int64_max], dtype=np.int64),
            "en": np.array([int64_min], dtype=np.int64),
            "ax": np.array([0], dtype=np.int64),
            "sp": np.array([-1], dtype=np.int64),
        },
    )
    np.testing.assert_array_equal(y, x[::-1])


# ---------------------------------------------------------------------------
# Resize: coordinate_transformation_mode / nearest_mode conformance
# ---------------------------------------------------------------------------


def _resize_graph(x, mode, coord_mode=None, scales=None, sizes=None, **extra):
    attrs = dict(mode=mode, **extra)
    if coord_mode is not None:
        attrs["coordinate_transformation_mode"] = coord_mode
    inits = {}
    inputs = ["x", "", "", ""]
    if scales is not None:
        inputs[2] = "scales"
        inits["scales"] = np.asarray(scales, dtype=np.float32)
    if sizes is not None:
        inputs[3] = "sizes"
        inits["sizes"] = np.asarray(sizes, dtype=np.int64)
    while inputs and not inputs[-1]:
        inputs.pop()
    (y,) = run_graph([P.make_node("Resize", inputs, ["y"], **attrs)], {"x": x}, inits)
    return y


def test_resize_nearest_asymmetric_matches_torch(rng):
    # torch 'nearest' implements exactly asymmetric coordinates with floor
    # rounding — the tf2onnx default for nearest exports.
    x = rng.normal(size=(1, 2, 5, 5)).astype(np.float32)
    y = _resize_graph(
        x, "nearest", "asymmetric", scales=[1, 1, 1.7, 1.7], nearest_mode="floor"
    )
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=1.7, mode="nearest"
    ).numpy()
    np.testing.assert_array_equal(y, expected)


def test_resize_linear_align_corners_matches_torch(rng):
    x = rng.normal(size=(1, 1, 4, 6)).astype(np.float32)
    y = _resize_graph(x, "linear", "align_corners", sizes=[1, 1, 7, 13])
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(7, 13), mode="bilinear", align_corners=True
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_resize_linear_pytorch_half_pixel_matches_torch(rng):
    x = rng.normal(size=(1, 3, 5, 4)).astype(np.float32)
    y = _resize_graph(x, "linear", "pytorch_half_pixel", sizes=[1, 3, 9, 11])
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(9, 11), mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_resize_default_half_pixel_linear_matches_torch(rng):
    # half_pixel == pytorch_half_pixel whenever every output dim > 1.
    x = rng.normal(size=(1, 1, 6, 6)).astype(np.float32)
    y = _resize_graph(x, "linear", None, scales=[1, 1, 2.0, 2.0])
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2.0, mode="bilinear", align_corners=False
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_resize_nearest_half_pixel_round_prefer_floor():
    # Hand-checked ONNX default semantics: src = (i+0.5)/s - 0.5 with
    # round-half-DOWN at exact .5 ties. d_in=4, s=1.5, d_out=6:
    # src = [-0.167, 0.5, 1.167, 1.833, 2.5, 3.167]; the two exact ties
    # (0.5 and 2.5) must round down to 0 and 2 under round_prefer_floor.
    x = np.arange(4, dtype=np.float32).reshape(1, 1, 1, 4)
    y = _resize_graph(x, "nearest", None, scales=[1, 1, 1, 1.5])
    np.testing.assert_array_equal(y.reshape(-1), [0, 0, 1, 2, 2, 3])
    # round_prefer_ceil breaks the same ties upward.
    y2 = _resize_graph(
        x, "nearest", None, scales=[1, 1, 1, 1.5], nearest_mode="round_prefer_ceil"
    )
    np.testing.assert_array_equal(y2.reshape(-1), [0, 1, 1, 2, 3, 3])


def test_resize_opset10_two_input_form(rng):
    # Opset-10 Resize: inputs are (X, scales) and semantics are legacy
    # asymmetric + floor, identical to Upsample.
    x = rng.normal(size=(1, 2, 4, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Resize", ["x", "scales"], ["y"], mode="nearest")],
        {"x": x},
        {"scales": np.array([1, 1, 2, 2], dtype=np.float32)},
        opset=10,
    )
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="nearest"
    ).numpy()
    np.testing.assert_array_equal(y, expected)


def test_resize_axes_attribute(rng):
    x = rng.normal(size=(1, 2, 4, 4)).astype(np.float32)
    y = _resize_graph(
        x, "nearest", "asymmetric", scales=[2.0, 2.0], nearest_mode="floor", axes=[2, 3]
    )
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=2, mode="nearest"
    ).numpy()
    np.testing.assert_array_equal(y, expected)


def test_resize_unsupported_modes_raise():
    x = np.zeros((1, 1, 4, 4), dtype=np.float32)
    with pytest.raises(Exception, match="tf_crop_and_resize"):
        _resize_graph(x, "nearest", "tf_crop_and_resize", scales=[1, 1, 2, 2])


# ---------------------------------------------------------------------------
# MaxPool: Indices output (whole-tensor row-major flat positions)
# ---------------------------------------------------------------------------


def _onnx_indices_from_torch(tidx, n, c, h, w):
    # torch returns per-(n,c)-plane indices into H*W; ONNX flattens over
    # the whole tensor including N and C.
    plane = tidx.numpy().astype(np.int64)
    n_idx = np.arange(n).reshape(n, 1, 1, 1)
    c_idx = np.arange(c).reshape(1, c, 1, 1)
    return (n_idx * c + c_idx) * (h * w) + plane


def test_maxpool_indices_storage_order_col_major(rng):
    """storage_order=1 composes the SPATIAL block of the flat index
    column-major; derived from the row-major result by coordinate
    decompose/recompose."""
    x = rng.normal(size=(2, 3, 6, 9)).astype(np.float32)
    _, idx_row = run_graph(
        [P.make_node("MaxPool", ["x"], ["y", "i"], kernel_shape=[2, 3],
                     strides=[2, 2])],
        {"x": x}, outputs=["y", "i"],
    )
    _, idx_col = run_graph(
        [P.make_node("MaxPool", ["x"], ["y", "i"], kernel_shape=[2, 3],
                     strides=[2, 2], storage_order=1)],
        {"x": x}, outputs=["y", "i"],
    )
    h, w = 6, 9
    plane = idx_row % (h * w)
    base = idx_row // (h * w)
    hh, ww = plane // w, plane % w
    want = base * (h * w) + hh + ww * h  # column-major spatial
    np.testing.assert_array_equal(idx_col, want)


@pytest.mark.cpu_oracle
def test_maxpool_indices_vs_torch(rng):
    x = rng.normal(size=(2, 3, 8, 10)).astype(np.float32)
    y, idx = run_graph(
        [P.make_node("MaxPool", ["x"], ["y", "i"], kernel_shape=[2, 2], strides=[2, 2])],
        {"x": x},
        outputs=["y", "i"],
    )
    ty, tidx = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), 2, 2, return_indices=True
    )
    np.testing.assert_allclose(y, ty.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(idx, _onnx_indices_from_torch(tidx, 2, 3, 8, 10))


@pytest.mark.cpu_oracle
def test_maxpool_indices_padded_dilated_vs_torch(rng):
    x = rng.normal(size=(1, 2, 9, 9)).astype(np.float32)
    y, idx = run_graph(
        [
            P.make_node(
                "MaxPool",
                ["x"],
                ["y", "i"],
                kernel_shape=[3, 3],
                strides=[2, 2],
                pads=[1, 1, 1, 1],
                dilations=[1, 1],
            )
        ],
        {"x": x},
        outputs=["y", "i"],
    )
    ty, tidx = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), 3, 2, padding=1, return_indices=True
    )
    np.testing.assert_allclose(y, ty.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(idx, _onnx_indices_from_torch(tidx, 1, 2, 9, 9))


def test_maxpool_indices_1d(rng):
    x = rng.normal(size=(1, 1, 12)).astype(np.float32)
    y, idx = run_graph(
        [P.make_node("MaxPool", ["x"], ["y", "i"], kernel_shape=[3], strides=[3])],
        {"x": x},
        outputs=["y", "i"],
    )
    ty, tidx = torch.nn.functional.max_pool1d(
        torch.from_numpy(x), 3, 3, return_indices=True
    )
    np.testing.assert_allclose(y, ty.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(idx, tidx.numpy().astype(np.int64))


def test_maxunpool_roundtrip_vs_torch(rng):
    x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
    (y,) = run_graph(
        [
            P.make_node("MaxPool", ["x"], ["p", "i"], kernel_shape=[2, 2], strides=[2, 2]),
            P.make_node("MaxUnpool", ["p", "i"], ["y"], kernel_shape=[2, 2], strides=[2, 2]),
        ],
        {"x": x},
    )
    tp, ti = torch.nn.functional.max_pool2d(torch.from_numpy(x), 2, 2, return_indices=True)
    expected = torch.nn.functional.max_unpool2d(tp, ti, 2, 2).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_scatter_min_max_reductions(rng):
    x = rng.normal(size=(4, 5)).astype(np.float32)
    upd = rng.normal(size=(2, 5)).astype(np.float32)
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 3]], dtype=np.int64)
    for red in ("min", "max"):
        (y,) = run_graph(
            [P.make_node("ScatterElements", ["x", "i", "u"], ["y"], axis=0, reduction=red)],
            {"x": x},
            {"i": idx, "u": upd},
            opset=18,
        )
        expected = torch.from_numpy(x.copy())
        expected = torch.scatter_reduce(
            expected, 0, torch.from_numpy(idx), torch.from_numpy(upd),
            reduce=("amin" if red == "min" else "amax"), include_self=True,
        ).numpy()
        np.testing.assert_allclose(y, expected, rtol=1e-6)


@pytest.mark.cpu_oracle
def test_grouped_conv_transpose_vs_torch(rng):
    x = rng.normal(size=(1, 4, 6, 6)).astype(np.float32)
    w = rng.normal(size=(4, 2, 3, 3)).astype(np.float32)  # (C_in, C_out/g, k, k)
    (y,) = run_graph(
        [
            P.make_node(
                "ConvTranspose", ["x", "w"], ["y"],
                strides=[2, 2], pads=[1, 1, 1, 1], group=2,
            )
        ],
        {"x": x},
        {"w": w},
    )
    expected = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1, groups=2
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_gather_nd_batch_dims(rng):
    x = rng.normal(size=(2, 3, 4, 5)).astype(np.float32)
    idx = rng.integers(0, 4, size=(2, 3, 2, 1)).astype(np.int64)
    (y,) = run_graph(
        [P.make_node("GatherND", ["x", "i"], ["y"], batch_dims=2)],
        {"x": x},
        {"i": idx},
    )
    expected = np.empty((2, 3, 2, 5), np.float32)
    for b0 in range(2):
        for b1 in range(3):
            for j in range(2):
                expected[b0, b1, j] = x[b0, b1, idx[b0, b1, j, 0]]
    np.testing.assert_allclose(y, expected)


def test_gather_nd_batch_dims_k2(rng):
    x = rng.normal(size=(2, 4, 5, 6)).astype(np.float32)
    idx = np.stack(
        [rng.integers(0, 4, size=(2, 3)), rng.integers(0, 5, size=(2, 3))],
        axis=-1,
    ).astype(np.int64)  # [2, 3, 2]; batch_dims=1
    (y,) = run_graph(
        [P.make_node("GatherND", ["x", "i"], ["y"], batch_dims=1)],
        {"x": x},
        {"i": idx},
    )
    expected = np.empty((2, 3, 6), np.float32)
    for b in range(2):
        for j in range(3):
            expected[b, j] = x[b, idx[b, j, 0], idx[b, j, 1]]
    np.testing.assert_allclose(y, expected)


def test_pad_negative_values_crop(rng):
    # ONNX Pad permits negative values: they crop the edge. Mixed
    # pad-one-edge / crop-the-other must work too.
    x = rng.normal(size=(2, 3, 6)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Pad", ["x", "pads"], ["y"])],
        {"x": x},
        {"pads": np.array([0, 0, -1, 0, 0, 2], dtype=np.int64)},
    )
    expected = np.pad(x[:, :, 1:], [(0, 0), (0, 0), (0, 2)])
    np.testing.assert_array_equal(y, expected)
    # crop both ends of one axis under reflect mode on another
    (y2,) = run_graph(
        [P.make_node("Pad", ["x", "pads"], ["y"], mode="reflect")],
        {"x": x},
        {"pads": np.array([0, 1, -1, 0, 1, -2], dtype=np.int64)},
    )
    expected2 = np.pad(x[:, :, 1:-2], [(0, 0), (1, 1), (0, 0)], mode="reflect")
    np.testing.assert_array_equal(y2, expected2)


def test_non_trailing_empty_output_binds_later_names(rng):
    # ONNX outputs are positional; an empty middle name means "omitted"
    # but LATER positions still bind (LayerNorm Y, <omitted Mean>,
    # InvStdDev is the canonical case).
    x = rng.normal(size=(2, 6)).astype(np.float32)
    scale = np.ones(6, np.float32)
    y, inv = run_graph(
        [P.make_node("LayerNormalization", ["x", "scale"], ["y", "", "inv"])],
        {"x": x},
        {"scale": scale},
        outputs=["y", "inv"],
    )
    expected_inv = 1.0 / np.sqrt(x.var(axis=-1, keepdims=True) + 1e-5)
    np.testing.assert_allclose(inv, expected_inv, rtol=1e-4)
    np.testing.assert_allclose(
        y, (x - x.mean(-1, keepdims=True)) * expected_inv, rtol=1e-4, atol=1e-5
    )


def test_negative_timeout_times_out_immediately():
    # A computed remaining-budget gone negative must time out, not
    # silently disable the deadline.
    from birdnet_tpu.errors import InferenceTimeoutError
    from birdnet_tpu.inference_options import InferenceOptions

    opts = InferenceOptions.with_timeout(-0.01)
    assert opts.needs_monitor()
    import jax.numpy as jnp

    from birdnet_tpu.compiler.engine import _wait

    with pytest.raises(InferenceTimeoutError):
        _wait([jnp.zeros(4)], opts)


def test_quantized_graph_proto_is_self_contained(rng):
    # Every tensor a node references must exist in graph.initializer (or
    # be a graph input / another node's output) after quantization.
    from birdnet_tpu.compiler.quantize import quantize_model

    x_vi = P.make_value_info("x", P.DataType.FLOAT, [1, 8])
    w = rng.normal(size=(8, 8)).astype(np.float32)
    graph = P.GraphProto(
        name="q",
        node=[
            P.make_node("MatMul", ["x", "w"], ["m"]),
            P.make_node("Relu", ["m"], ["y"]),
        ],
        initializer=[P.TensorProto.from_numpy(w, name="w")],
        input=[x_vi],
        output=[P.make_value_info("y", P.DataType.FLOAT, [1, 8])],
    )
    model = import_onnx(P.make_model(graph, opset_version=17))
    calib = [rng.normal(size=(1, 8)).astype(np.float32) for _ in range(4)]
    qm = quantize_model(model, calib, quantize_first_layer=True)
    available = {t.name for t in qm.graph.initializer}
    available.update(i.name for i in qm.graph.input)
    for node in qm.graph.node:
        for o in node.output:
            available.add(o)
    for node in qm.graph.node:
        for i in node.input:
            assert not i or i in available, (node.op_type, i)


def test_maxpool_indices_column_major_identity_when_width_one():
    """Degenerate cross-check: with a single spatial column the row- and
    column-major spatial compositions coincide."""
    x = np.arange(8, dtype=np.float32).reshape(1, 1, 8, 1)
    _, i0 = run_graph(
        [P.make_node("MaxPool", ["x"], ["y", "i"], kernel_shape=[2, 1],
                     strides=[2, 1])],
        {"x": x}, outputs=["y", "i"])
    _, i1 = run_graph(
        [P.make_node("MaxPool", ["x"], ["y", "i"], kernel_shape=[2, 1],
                     strides=[2, 1], storage_order=1)],
        {"x": x}, outputs=["y", "i"])
    np.testing.assert_array_equal(i0, i1)


# ---------------------------------------------------------------------------
# fold_batchnorm: dynamic bias, weight tying, shared bias
# ---------------------------------------------------------------------------


def _bn_inits(c, rng):
    return {
        "scale": rng.uniform(0.5, 1.5, c).astype(np.float32),
        "bias": rng.normal(size=c).astype(np.float32),
        "mean": rng.normal(size=c).astype(np.float32),
        "var": rng.uniform(0.5, 2.0, c).astype(np.float32),
    }


def test_fold_batchnorm_skips_dynamic_bias(rng):
    # Conv bias produced at run time (graph input): folding must be skipped,
    # and optimized output must equal the unoptimized oracle.
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    b_dyn = rng.normal(size=4).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    nodes = [
        P.make_node("Conv", ["x", "w", "b_dyn"], ["c"], pads=[1, 1, 1, 1]),
        P.make_node("BatchNormalization", ["c", "scale", "bias", "mean", "var"], ["y"]),
    ]
    inits = {"w": w, **_bn_inits(4, rng)}
    (ref,) = run_graph(nodes, {"x": x, "b_dyn": b_dyn}, inits, optimize=False)
    (opt,) = run_graph(nodes, {"x": x, "b_dyn": b_dyn}, inits, optimize=True)
    np.testing.assert_allclose(opt, ref, rtol=1e-4, atol=1e-5)


def test_fold_batchnorm_skips_weight_tied_convs(rng):
    # Two convs share one weight initializer; only one is followed by BN.
    # In-place weight scaling would corrupt the other conv.
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    nodes = [
        P.make_node("Conv", ["x", "w"], ["c1"], pads=[1, 1, 1, 1]),
        P.make_node("BatchNormalization", ["c1", "scale", "bias", "mean", "var"], ["y"]),
        P.make_node("Conv", ["x", "w"], ["y2"], pads=[1, 1, 1, 1]),
    ]
    inits = {"w": w, **_bn_inits(4, rng)}
    ref = run_graph(nodes, {"x": x}, inits, outputs=["y", "y2"], optimize=False)
    opt = run_graph(nodes, {"x": x}, inits, outputs=["y", "y2"], optimize=True)
    for o, r in zip(opt, ref):
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-5)


@pytest.mark.cpu_oracle
def test_fold_batchnorm_shared_bias_initializer(rng):
    # Two convs share one bias initializer; folding conv1's BN must not
    # rewrite the shared bias in place under conv2.
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    w1 = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    w2 = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=4).astype(np.float32)
    nodes = [
        P.make_node("Conv", ["x", "w1", "b"], ["c1"], pads=[1, 1, 1, 1]),
        P.make_node("BatchNormalization", ["c1", "scale", "bias", "mean", "var"], ["y"]),
        P.make_node("Conv", ["x", "w2", "b"], ["y2"], pads=[1, 1, 1, 1]),
    ]
    inits = {"w1": w1, "w2": w2, "b": b, **_bn_inits(4, rng)}
    ref = run_graph(nodes, {"x": x}, inits, outputs=["y", "y2"], optimize=False)
    opt = run_graph(nodes, {"x": x}, inits, outputs=["y", "y2"], optimize=True)
    for o, r in zip(opt, ref):
        np.testing.assert_allclose(o, r, rtol=1e-4, atol=1e-5)


def test_fold_batchnorm_still_folds_simple_case(rng):
    # The plain single-consumer case must still fold (BN node removed).
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=4).astype(np.float32)
    inits = [
        P.TensorProto.from_numpy(v, name=k)
        for k, v in {"w": w, "b": b, **_bn_inits(4, rng)}.items()
    ]
    graph = P.GraphProto(
        name="t",
        node=[
            P.make_node("Conv", ["x", "w", "b"], ["c"], pads=[1, 1, 1, 1]),
            P.make_node("BatchNormalization", ["c", "scale", "bias", "mean", "var"], ["y"]),
        ],
        initializer=inits,
        input=[P.make_value_info("x", P.DataType.FLOAT, [1, 3, 8, 8])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [])],
    )
    tensors = {t.name: t.to_numpy() for t in graph.initializer}
    stats = optimize_graph(graph, tensors)
    assert stats["batchnorm_folded"] == 1
    assert all(n.op_type != "BatchNormalization" for n in graph.node)


# ---------------------------------------------------------------------------
# prune_dead_initializers
# ---------------------------------------------------------------------------


def test_orphaned_bn_initializers_pruned(rng):
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    inits = [
        P.TensorProto.from_numpy(v, name=k)
        for k, v in {"w": w, **_bn_inits(4, rng)}.items()
    ]
    graph = P.GraphProto(
        name="t",
        node=[
            P.make_node("Conv", ["x", "w"], ["c"], pads=[1, 1, 1, 1]),
            P.make_node("BatchNormalization", ["c", "scale", "bias", "mean", "var"], ["y"]),
        ],
        initializer=inits,
        input=[P.make_value_info("x", P.DataType.FLOAT, [1, 3, 8, 8])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [])],
    )
    tensors = {t.name: t.to_numpy() for t in graph.initializer}
    stats = optimize_graph(graph, tensors)
    assert stats["batchnorm_folded"] == 1
    # The BN's scale/bias/mean/var floats must not survive as params.
    for name in ("scale", "bias", "mean", "var"):
        assert name not in tensors
    assert "w_bn_bias" in tensors


def test_usage_counts_include_subgraph_references(rng):
    # A tensor read only inside an If/Loop body must count as used —
    # BN folding and the fusion matchers all key off these counts.
    from birdnet_tpu.compiler.optimize import _usage_counts

    body = P.GraphProto(
        name="then",
        node=[P.make_node("Add", ["c", "c"], ["t"])],
        output=[P.make_value_info("t", P.DataType.FLOAT, [])],
    )
    graph = P.GraphProto(
        name="g",
        node=[
            P.make_node("Relu", ["x"], ["c"]),
            P.make_node("Loop", ["x"], ["y"], body=body),
        ],
        output=[P.make_value_info("y", P.DataType.FLOAT, [])],
    )
    counts = _usage_counts(graph)
    assert counts.get("c", 0) == 2  # two reads inside the body
    assert counts.get("x", 0) == 2


def test_fold_batchnorm_skips_subgraph_referenced_intermediate(rng):
    # Conv output feeding BN is ALSO read by an If-style body: folding
    # would delete the Conv's original output name while the body still
    # references it.
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    inits = [
        P.TensorProto.from_numpy(v, name=k)
        for k, v in {"w": w, **_bn_inits(4, rng)}.items()
    ]
    body = P.GraphProto(
        name="b",
        node=[P.make_node("Relu", ["c"], ["t"])],
        output=[P.make_value_info("t", P.DataType.FLOAT, [])],
    )
    graph = P.GraphProto(
        name="g",
        node=[
            P.make_node("Conv", ["x", "w"], ["c"], pads=[1, 1, 1, 1]),
            P.make_node("BatchNormalization", ["c", "scale", "bias", "mean", "var"], ["y"]),
            P.make_node("Loop", ["x"], ["y2"], body=body),
        ],
        initializer=inits,
        input=[P.make_value_info("x", P.DataType.FLOAT, [1, 3, 8, 8])],
        output=[
            P.make_value_info("y", P.DataType.FLOAT, []),
            P.make_value_info("y2", P.DataType.FLOAT, []),
        ],
    )
    tensors = {t.name: t.to_numpy() for t in graph.initializer}
    from birdnet_tpu.compiler.optimize import fold_batchnorm

    assert fold_batchnorm(graph, tensors) == 0  # must skip
    assert any(n.op_type == "BatchNormalization" for n in graph.node)


def test_prune_keeps_subgraph_references(rng):
    # A tensor referenced only inside a fused-op body subgraph must survive.
    w = rng.normal(size=(4,)).astype(np.float32)
    body = P.GraphProto(
        name="body",
        node=[P.make_node("Add", ["x", "w"], ["y"])],
        initializer=[],
        input=[],
        output=[P.make_value_info("y", P.DataType.FLOAT, [])],
    )
    graph = P.GraphProto(
        name="t",
        node=[P.make_node("_Whatever", ["x"], ["y"], body=body)],
        initializer=[P.TensorProto.from_numpy(w, name="w")],
        input=[P.make_value_info("x", P.DataType.FLOAT, [4])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [])],
    )
    tensors = {"w": w}
    assert prune_dead_initializers(graph, tensors) == 0
    assert "w" in tensors


@pytest.mark.cpu_oracle
def test_imported_model_params_free_of_bn_tensors(rng):
    # End-to-end: import with optimize=True and check the jit param set.
    x_vi = P.make_value_info("x", P.DataType.FLOAT, [1, 3, 8, 8])
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    bn = _bn_inits(4, rng)
    inits = [
        P.TensorProto.from_numpy(v, name=k) for k, v in {"w": w, **bn}.items()
    ]
    graph = P.GraphProto(
        name="t",
        node=[
            P.make_node("Conv", ["x", "w"], ["c"], pads=[1, 1, 1, 1]),
            P.make_node("BatchNormalization", ["c", "scale", "bias", "mean", "var"], ["y"]),
        ],
        initializer=inits,
        input=[x_vi],
        output=[P.make_value_info("y", P.DataType.FLOAT, [])],
    )
    model = import_onnx(P.make_model(graph, opset_version=17), optimize=True)
    for name in ("scale", "bias", "mean", "var"):
        assert name not in model.params and name not in model.consts
    # and the optimized model still computes the right thing
    x = rng.normal(size=(1, 3, 8, 8)).astype(np.float32)
    fwd = make_forward(model)
    (opt,) = fwd(model.params, x)
    expected = torch.nn.functional.batch_norm(
        torch.nn.functional.conv2d(torch.from_numpy(x), torch.from_numpy(w), padding=1),
        torch.from_numpy(bn["mean"]),
        torch.from_numpy(bn["var"]),
        torch.from_numpy(bn["scale"]),
        torch.from_numpy(bn["bias"]),
        eps=1e-5,
    ).numpy()
    np.testing.assert_allclose(np.asarray(opt), expected, rtol=1e-3, atol=1e-4)
