"""Oracle tests for the extended op wave: spatial sampling, losses, random,
sequences/optionals, and trace-time dynamic-shape ops."""

import jax
import numpy as np
import pytest

from birdnet_tpu.compiler.importer import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P
from tests.test_compiler_ops import run_graph

torch = pytest.importorskip("torch")


def jit_run(nodes, inputs, initializers=None, outputs=None, opset=21):
    """Like run_graph but under jax.jit (inputs traced)."""
    init = [
        P.TensorProto.from_numpy(v, name=k)
        for k, v in (initializers or {}).items()
    ]
    in_vis = [
        P.make_value_info(
            k, P._NUMPY_TO_DTYPE[np.asarray(v).dtype], list(np.asarray(v).shape)
        )
        for k, v in inputs.items()
    ]
    out_names = outputs or ["y"]
    out_vis = [P.make_value_info(n, P.DataType.FLOAT, []) for n in out_names]
    graph = P.GraphProto(
        name="t", node=nodes, initializer=init, input=in_vis, output=out_vis
    )
    model = import_onnx(P.make_model(graph, opset_version=opset), optimize=False)
    fwd = jax.jit(make_forward(model))
    outs = fwd(model.params, *[np.asarray(v) for v in inputs.values()])
    return [np.asarray(o) for o in outs]


# ---------------------------------------------------------------------------
# trivial math
# ---------------------------------------------------------------------------


def test_inverse_hyperbolic(rng):
    x = rng.uniform(1.1, 5.0, size=(3, 4)).astype(np.float32)
    t = rng.uniform(-0.9, 0.9, size=(3, 4)).astype(np.float32)
    (y,) = run_graph([P.make_node("Acosh", ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(y, np.arccosh(x), rtol=1e-6)
    (y,) = run_graph([P.make_node("Asinh", ["t"], ["y"])], {"t": t})
    np.testing.assert_allclose(y, np.arcsinh(t), rtol=1e-6)
    (y,) = run_graph([P.make_node("Atanh", ["t"], ["y"])], {"t": t})
    np.testing.assert_allclose(y, np.arctanh(t), rtol=1e-5, atol=1e-7)


def test_swish(rng):
    x = rng.normal(size=(4, 8)).astype(np.float32)
    (y,) = run_graph([P.make_node("Swish", ["x"], ["y"])], {"x": x}, opset=24)
    expected = x / (1 + np.exp(-x))
    np.testing.assert_allclose(y, expected, rtol=1e-6, atol=1e-7)
    (y,) = run_graph(
        [P.make_node("Swish", ["x"], ["y"], alpha=0.5)], {"x": x}, opset=24
    )
    np.testing.assert_allclose(y, x / (1 + np.exp(-0.5 * x)), rtol=1e-6, atol=1e-7)


def test_mean_variance_normalization(rng):
    x = rng.normal(2.0, 3.0, size=(2, 3, 4, 5)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("MeanVarianceNormalization", ["x"], ["y"])], {"x": x}
    )
    mean = x.mean(axis=(0, 2, 3), keepdims=True)
    var = (x**2).mean(axis=(0, 2, 3), keepdims=True) - mean**2
    np.testing.assert_allclose(y, (x - mean) / np.sqrt(var), rtol=1e-4, atol=1e-5)
    (y,) = run_graph(
        [P.make_node("MeanVarianceNormalization", ["x"], ["y"], axes=[1])],
        {"x": x},
    )
    mean = x.mean(axis=1, keepdims=True)
    var = (x**2).mean(axis=1, keepdims=True) - mean**2
    np.testing.assert_allclose(y, (x - mean) / np.sqrt(var), rtol=1e-4, atol=1e-5)


def test_det(rng):
    x = rng.normal(size=(5, 3, 3)).astype(np.float32)
    (y,) = run_graph([P.make_node("Det", ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(y, np.linalg.det(x), rtol=1e-4, atol=1e-5)


def test_deprecated_scatter_alias(rng):
    data = np.zeros((3, 3), np.float32)
    indices = np.array([[1, 0, 2], [0, 2, 1]], np.int64)
    updates = np.array([[1.0, 1.1, 1.2], [2.0, 2.1, 2.2]], np.float32)
    (y,) = run_graph(
        [P.make_node("Scatter", ["d", "i", "u"], ["y"], axis=0)],
        {"d": data},
        {"i": indices, "u": updates},
        opset=10,
    )
    expected = np.array(
        [[2.0, 1.1, 0.0], [1.0, 0.0, 2.2], [0.0, 2.1, 1.2]], np.float32
    )
    np.testing.assert_array_equal(y, expected)


# ---------------------------------------------------------------------------
# shape surgery / trace-time dynamic shapes
# ---------------------------------------------------------------------------


def test_center_crop_pad(rng):
    x = rng.normal(size=(4, 7)).astype(np.float32)
    # crop 7 -> 4 on axis 1 (odd excess: 1 from front, 2 from back),
    # pad 4 -> 6 on axis 0 (1 before, 1 after)
    (y,) = jit_run(
        [P.make_node("CenterCropPad", ["x", "s"], ["y"])],
        {"x": x},
        {"s": np.array([6, 4], np.int64)},
        opset=18,
    )
    cropped = x[:, 1:5]
    expected = np.pad(cropped, [(1, 1), (0, 0)])
    np.testing.assert_array_equal(y, expected)


def test_center_crop_pad_axes_subset(rng):
    x = rng.normal(size=(2, 5, 5)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("CenterCropPad", ["x", "s"], ["y"], axes=[-1])],
        {"x": x},
        {"s": np.array([3], np.int64)},
        opset=18,
    )
    np.testing.assert_array_equal(y, x[:, :, 1:4])


def test_compress(rng):
    x = rng.normal(size=(3, 4)).astype(np.float32)
    cond = np.array([0, 1, 1, 0], bool)
    (y,) = jit_run(
        [P.make_node("Compress", ["x", "c"], ["y"], axis=1)],
        {"x": x},
        {"c": cond},
    )
    np.testing.assert_array_equal(y, np.compress(cond, x, axis=1))
    # flattened form (no axis)
    cond2 = np.array([1, 0, 1, 0, 0, 1], bool)
    (y,) = jit_run(
        [P.make_node("Compress", ["x", "c"], ["y"])],
        {"x": x[:2]},
        {"c": cond2},
    )
    np.testing.assert_array_equal(y, np.compress(cond2, x[:2].reshape(-1)))


def test_nonzero_static():
    x = np.array([[1, 0], [0, 3]], np.int64)
    (y,) = run_graph([P.make_node("NonZero", ["x"], ["y"])], {"x": x})
    np.testing.assert_array_equal(y, np.stack(np.nonzero(x)))
    assert y.dtype == np.int64


def test_nonzero_traced_rejected(rng):
    x = rng.normal(size=(2, 2)).astype(np.float32)
    with pytest.raises(NotImplementedError, match="NonZero"):
        jit_run([P.make_node("NonZero", ["x"], ["y"])], {"x": x})


def test_unique_unsorted_spec_example():
    # Example from the ONNX spec (sorted=0).
    x = np.array([2.0, 1.0, 1.0, 3.0, 4.0, 3.0], np.float32)
    ys = run_graph(
        [P.make_node("Unique", ["x"], ["y", "idx", "inv", "cnt"], sorted=0)],
        {"x": x},
        outputs=["y", "idx", "inv", "cnt"],
    )
    np.testing.assert_array_equal(ys[0], [2.0, 1.0, 3.0, 4.0])
    np.testing.assert_array_equal(ys[1], [0, 1, 3, 4])
    np.testing.assert_array_equal(ys[2], [0, 1, 1, 2, 3, 2])
    np.testing.assert_array_equal(ys[3], [1, 2, 2, 1])


def test_unique_sorted_with_axis():
    x = np.array([[1, 0, 0], [1, 0, 0], [2, 3, 4]], np.float32)
    ys = run_graph(
        [P.make_node("Unique", ["x"], ["y", "idx", "inv", "cnt"], axis=0)],
        {"x": x},
        outputs=["y", "idx", "inv", "cnt"],
    )
    np.testing.assert_array_equal(ys[0], [[1, 0, 0], [2, 3, 4]])
    np.testing.assert_array_equal(ys[1], [0, 2])
    np.testing.assert_array_equal(ys[2], [0, 0, 1])
    np.testing.assert_array_equal(ys[3], [2, 1])


# ---------------------------------------------------------------------------
# losses
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
def test_nll_loss_vs_torch(rng, reduction):
    x = rng.normal(size=(4, 7, 3)).astype(np.float32)
    target = rng.integers(0, 7, size=(4, 3)).astype(np.int64)
    w = rng.uniform(0.5, 2.0, size=(7,)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("NegativeLogLikelihoodLoss", ["x", "t", "w"], ["y"],
                     reduction=reduction)],
        {"x": x, "t": target},
        {"w": w},
    )
    expected = torch.nn.functional.nll_loss(
        torch.from_numpy(x), torch.from_numpy(target),
        torch.from_numpy(w), reduction=reduction,
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_nll_loss_ignore_index(rng):
    x = rng.normal(size=(5, 4)).astype(np.float32)
    target = np.array([0, 1, 2, 3, 1], np.int64)
    (y,) = jit_run(
        [P.make_node("NegativeLogLikelihoodLoss", ["x", "t"], ["y"],
                     reduction="mean", ignore_index=1)],
        {"x": x, "t": target},
    )
    expected = torch.nn.functional.nll_loss(
        torch.from_numpy(x), torch.from_numpy(target), ignore_index=1
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("reduction", ["none", "sum", "mean"])
def test_softmax_cross_entropy_vs_torch(rng, reduction):
    x = rng.normal(size=(6, 5)).astype(np.float32)
    target = rng.integers(0, 5, size=(6,)).astype(np.int64)
    w = rng.uniform(0.5, 2.0, size=(5,)).astype(np.float32)
    loss, logp = jit_run(
        [P.make_node("SoftmaxCrossEntropyLoss", ["x", "t", "w"],
                     ["loss", "logp"], reduction=reduction)],
        {"x": x, "t": target},
        {"w": w},
        outputs=["loss", "logp"],
    )
    expected = torch.nn.functional.cross_entropy(
        torch.from_numpy(x), torch.from_numpy(target), torch.from_numpy(w),
        reduction=reduction,
    ).numpy()
    np.testing.assert_allclose(loss, expected, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        logp, torch.log_softmax(torch.from_numpy(x), 1).numpy(),
        rtol=1e-5, atol=1e-6,
    )


# ---------------------------------------------------------------------------
# random
# ---------------------------------------------------------------------------


def test_random_normal_stats_and_determinism():
    nodes = [P.make_node("RandomNormal", [], ["y"], shape=[2000],
                         mean=3.0, scale=0.5, seed=7.0)]
    (a,) = run_graph(nodes, {"x": np.zeros(1, np.float32)})
    (b,) = run_graph(nodes, {"x": np.zeros(1, np.float32)})
    np.testing.assert_array_equal(a, b)  # seeded: deterministic
    assert abs(a.mean() - 3.0) < 0.05
    assert abs(a.std() - 0.5) < 0.05


def test_random_uniform_range_dtype():
    (y,) = run_graph(
        [P.make_node("RandomUniform", [], ["y"], shape=[500], low=-2.0,
                     high=-1.0, dtype=int(P.DataType.FLOAT16), seed=1.0)],
        {"x": np.zeros(1, np.float32)},
    )
    assert y.dtype == np.float16
    assert (y >= -2.0).all() and (y <= -1.0).all()


def test_random_like_shapes(rng):
    x = rng.normal(size=(3, 5)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("RandomNormalLike", ["x"], ["y"], seed=2.0)], {"x": x}
    )
    assert y.shape == x.shape and y.dtype == np.float32
    (y,) = jit_run(
        [P.make_node("RandomUniformLike", ["x"], ["y"], seed=2.0,
                     dtype=int(P.DataType.FLOAT16))], {"x": x}
    )
    assert y.shape == x.shape and y.dtype == np.float16


def test_bernoulli_extremes():
    p = np.array([0.0, 1.0, 0.0, 1.0], np.float32)
    (y,) = jit_run([P.make_node("Bernoulli", ["p"], ["y"],
                                dtype=int(P.DataType.INT32))], {"p": p})
    np.testing.assert_array_equal(y, [0, 1, 0, 1])
    assert y.dtype == np.int32


def test_multinomial_peaked():
    # Extremely peaked logits: sampling must return the peak class.
    logits = np.full((3, 5), -1e9, np.float32)
    peak = [2, 0, 4]
    for i, c in enumerate(peak):
        logits[i, c] = 0.0
    (y,) = jit_run(
        [P.make_node("Multinomial", ["x"], ["y"], sample_size=4, seed=3.0)],
        {"x": logits},
    )
    assert y.shape == (3, 4) and y.dtype == np.int32
    np.testing.assert_array_equal(y, np.asarray(peak)[:, None].repeat(4, 1))


# ---------------------------------------------------------------------------
# GridSample / AffineGrid
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("mode", ["nearest", "bilinear", "bicubic"])
@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align", [0, 1])
def test_grid_sample_vs_torch(rng, mode, padding, align):
    x = rng.normal(size=(2, 3, 6, 7)).astype(np.float32)
    # grid includes out-of-bounds coordinates to exercise padding
    grid = rng.uniform(-1.6, 1.6, size=(2, 4, 5, 2)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("GridSample", ["x", "g"], ["y"], mode=mode,
                     padding_mode=padding, align_corners=align)],
        {"x": x, "g": grid},
        opset=16,
    )
    expected = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode=mode,
        padding_mode=padding, align_corners=bool(align),
    ).numpy()
    tol = 2e-3 if mode == "bicubic" else 1e-4
    np.testing.assert_allclose(y, expected, rtol=tol, atol=tol)


@pytest.mark.parametrize("mode", ["nearest", "bilinear"])
@pytest.mark.parametrize("padding", ["zeros", "border", "reflection"])
@pytest.mark.parametrize("align", [0, 1])
def test_grid_sample_volumetric_vs_torch(rng, mode, padding, align):
    """Opset-20 5-D GridSample against torch's volumetric grid_sample."""
    x = rng.normal(size=(2, 3, 4, 5, 6)).astype(np.float32)
    grid = rng.uniform(-1.6, 1.6, size=(2, 3, 4, 2, 3)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("GridSample", ["x", "g"], ["y"], mode=mode,
                     padding_mode=padding, align_corners=align)],
        {"x": x, "g": grid},
        opset=16,
    )
    expected = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode=mode,
        padding_mode=padding, align_corners=bool(align),
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-4)


def test_grid_sample_volumetric_cubic_raises(rng):
    x = rng.normal(size=(1, 1, 3, 3, 3)).astype(np.float32)
    grid = rng.uniform(-1, 1, size=(1, 2, 2, 2, 3)).astype(np.float32)
    with pytest.raises(Exception, match="2-D only"):
        jit_run(
            [P.make_node("GridSample", ["x", "g"], ["y"], mode="bicubic")],
            {"x": x, "g": grid}, opset=16,
        )


def test_grid_sample_opset20_spelling(rng):
    x = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
    grid = rng.uniform(-1, 1, size=(1, 2, 2, 2)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("GridSample", ["x", "g"], ["y"], mode="linear")],
        {"x": x, "g": grid},
        opset=20,
    )
    expected = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode="bilinear",
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("align", [0, 1])
def test_affine_grid_2d_vs_torch(rng, align):
    theta = rng.normal(size=(2, 2, 3)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("AffineGrid", ["t", "s"], ["y"], align_corners=align)],
        {"t": theta},
        {"s": np.array([2, 3, 5, 6], np.int64)},
        opset=20,
    )
    expected = torch.nn.functional.affine_grid(
        torch.from_numpy(theta), [2, 3, 5, 6], align_corners=bool(align)
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_affine_grid_3d_vs_torch(rng):
    theta = rng.normal(size=(1, 3, 4)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("AffineGrid", ["t", "s"], ["y"], align_corners=1)],
        {"t": theta},
        {"s": np.array([1, 2, 3, 4, 5], np.int64)},
        opset=20,
    )
    expected = torch.nn.functional.affine_grid(
        torch.from_numpy(theta), [1, 2, 3, 4, 5], align_corners=True
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# RoiAlign / Col2Im / NMS
# ---------------------------------------------------------------------------


def _ref_roi_align(x, rois, bidx, out_h, out_w, ratio, scale, mode, offset):
    """Independent numpy reference implementing the ORT/Caffe2 algorithm."""
    def bilin(img, y, xx):
        H, W = img.shape[1:]
        if y < -1.0 or y > H or xx < -1.0 or xx > W:
            return np.zeros(img.shape[0], np.float32)
        y = max(y, 0.0)
        xx = max(xx, 0.0)
        yl = min(int(np.floor(y)), H - 1)
        xl = min(int(np.floor(xx)), W - 1)
        yh = min(yl + 1, H - 1)
        xh = min(xl + 1, W - 1)
        ly = min(max(y - yl, 0.0), 1.0)
        lx = min(max(xx - xl, 0.0), 1.0)
        return (img[:, yl, xl] * (1 - ly) * (1 - lx)
                + img[:, yl, xh] * (1 - ly) * lx
                + img[:, yh, xl] * ly * (1 - lx)
                + img[:, yh, xh] * ly * lx)

    outs = []
    for r, b in zip(rois, bidx):
        x1, y1, x2, y2 = (c * scale - offset for c in r)
        rw, rh = x2 - x1, y2 - y1
        if offset == 0.0:
            rw, rh = max(rw, 1.0), max(rh, 1.0)
        bh, bw = rh / out_h, rw / out_w
        gh = ratio if ratio > 0 else max(int(np.ceil(rh / out_h)), 1)
        gw = ratio if ratio > 0 else max(int(np.ceil(rw / out_w)), 1)
        out = np.zeros((x.shape[1], out_h, out_w), np.float32)
        for oy in range(out_h):
            for ox in range(out_w):
                samples = [
                    bilin(x[b], y1 + oy * bh + (iy + 0.5) * bh / gh,
                          x1 + ox * bw + (ix + 0.5) * bw / gw)
                    for iy in range(gh) for ix in range(gw)
                ]
                agg = np.max(samples, 0) if mode == "max" else np.mean(samples, 0)
                out[:, oy, ox] = agg
        outs.append(out)
    return np.stack(outs)


@pytest.mark.parametrize("mode", ["avg", "max"])
@pytest.mark.parametrize("coord", ["half_pixel", "output_half_pixel"])
def test_roi_align_vs_reference(rng, mode, coord):
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    rois = np.array(
        [[0.5, 0.5, 6.5, 6.5], [1.0, 2.0, 7.0, 7.5], [0.0, 0.0, 8.0, 8.0]],
        np.float32,
    )
    bidx = np.array([0, 1, 0], np.int64)
    (y,) = jit_run(
        [P.make_node("RoiAlign", ["x", "r", "b"], ["y"], output_height=3,
                     output_width=4, sampling_ratio=2, spatial_scale=0.5,
                     mode=mode, coordinate_transformation_mode=coord)],
        {"x": x},
        {"r": rois, "b": bidx},
    )
    offset = 0.5 if coord == "half_pixel" else 0.0
    expected = _ref_roi_align(x, rois, bidx, 3, 4, 2, 0.5, mode, offset)
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_roi_align_adaptive_sampling(rng):
    # sampling_ratio=0 with static ROIs: per-ROI adaptive grid.
    x = rng.normal(size=(1, 2, 10, 10)).astype(np.float32)
    rois = np.array([[0.0, 0.0, 9.0, 9.0], [2.0, 2.0, 4.0, 4.0]], np.float32)
    bidx = np.array([0, 0], np.int64)
    (y,) = jit_run(
        [P.make_node("RoiAlign", ["x", "r", "b"], ["y"], output_height=2,
                     output_width=2, sampling_ratio=0)],
        {"x": x},
        {"r": rois, "b": bidx},
    )
    expected = _ref_roi_align(x, rois, bidx, 2, 2, 0, 1.0, "avg", 0.5)
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_col2im_vs_torch_fold(rng):
    # ONNX Col2Im == torch.nn.functional.fold for 2-D blocks.
    data = rng.normal(size=(2, 3 * 2 * 2, 10)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("Col2Im", ["d", "img", "blk"], ["y"],
                     strides=[2, 1], pads=[0, 1, 0, 1], dilations=[1, 1])],
        {"d": data},
        {"img": np.array([5, 4], np.int64), "blk": np.array([2, 2], np.int64)},
        opset=18,
    )
    expected = torch.nn.functional.fold(
        torch.from_numpy(data), (5, 4), (2, 2), dilation=1, padding=(0, 1),
        stride=(2, 1),
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_col2im_1d(rng):
    data = rng.normal(size=(1, 2 * 3, 4)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("Col2Im", ["d", "img", "blk"], ["y"])],
        {"d": data},
        {"img": np.array([6], np.int64), "blk": np.array([3], np.int64)},
        opset=18,
    )
    expected = np.zeros((1, 2, 6), np.float32)
    patches = data.reshape(1, 2, 3, 4)
    for pos in range(4):
        expected[:, :, pos:pos + 3] += patches[:, :, :, pos]
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_nms_suppress_by_iou():
    # Canonical ONNX test vectors.
    boxes = np.array([[[0.0, 0.0, 1.0, 1.0], [0.0, 0.1, 1.0, 1.1],
                       [0.0, -0.1, 1.0, 0.9], [0.0, 10.0, 1.0, 11.0],
                       [0.0, 10.1, 1.0, 11.1], [0.0, 100.0, 1.0, 101.0]]],
                     np.float32)
    scores = np.array([[[0.9, 0.75, 0.6, 0.95, 0.5, 0.3]]], np.float32)
    (y,) = run_graph(
        [P.make_node("NonMaxSuppression", ["b", "s", "m", "i"], ["y"])],
        {"b": boxes},
        {"s": scores, "m": np.array([3], np.int64),
         "i": np.array([0.5], np.float32)},
    )
    np.testing.assert_array_equal(y, [[0, 0, 3], [0, 0, 0], [0, 0, 5]])


def test_nms_score_threshold_and_center_box():
    boxes = np.array([[[0.5, 0.5, 1.0, 1.0], [0.5, 0.6, 1.0, 1.0],
                       [0.5, 10.5, 1.0, 1.0]]], np.float32)
    scores = np.array([[[0.9, 0.75, 0.4]]], np.float32)
    (y,) = run_graph(
        [P.make_node("NonMaxSuppression", ["b", "s", "m", "i", "t"], ["y"],
                     center_point_box=1)],
        {"b": boxes},
        {"s": scores, "m": np.array([5], np.int64),
         "i": np.array([0.5], np.float32),
         "t": np.array([0.5], np.float32)},
    )
    # box 2 fails the score threshold; box 1 overlaps box 0 beyond 0.5 IoU
    np.testing.assert_array_equal(y, [[0, 0, 0]])


def test_nms_traced_rejected(rng):
    boxes = rng.uniform(size=(1, 4, 4)).astype(np.float32)
    scores = rng.uniform(size=(1, 1, 4)).astype(np.float32)
    with pytest.raises(NotImplementedError, match="NonMaxSuppression"):
        jit_run(
            [P.make_node("NonMaxSuppression", ["b", "s"], ["y"])],
            {"b": boxes, "s": scores},
        )


# ---------------------------------------------------------------------------
# sequences / optionals
# ---------------------------------------------------------------------------


def test_sequence_construct_at_insert_erase(rng):
    a = rng.normal(size=(2, 3)).astype(np.float32)
    b = rng.normal(size=(2, 3)).astype(np.float32)
    c = rng.normal(size=(2, 3)).astype(np.float32)
    nodes = [
        P.make_node("SequenceConstruct", ["a", "b"], ["s"]),
        P.make_node("SequenceInsert", ["s", "c", "pos"], ["s2"]),  # at front
        P.make_node("SequenceErase", ["s2", "last"], ["s3"]),  # drop b
        P.make_node("SequenceAt", ["s3", "idx"], ["y"]),  # -> a
        P.make_node("SequenceLength", ["s3"], ["n"]),
        P.make_node("ConcatFromSequence", ["s3"], ["cat"], axis=0, new_axis=1),
    ]
    y, n, cat = jit_run(
        nodes,
        {"a": a, "b": b, "c": c},
        {"pos": np.array(0, np.int64), "last": np.array(-1, np.int64),
         "idx": np.array(1, np.int64)},
        outputs=["y", "n", "cat"],
    )
    np.testing.assert_array_equal(y, a)
    assert n == 2
    np.testing.assert_array_equal(cat, np.stack([c, a]))


def test_split_to_sequence_scalar_and_vector(rng):
    x = rng.normal(size=(7, 2)).astype(np.float32)
    nodes = [
        P.make_node("SplitToSequence", ["x", "sp"], ["s"], axis=0),
        P.make_node("ConcatFromSequence", ["s"], ["y"], axis=0),
        P.make_node("SequenceLength", ["s"], ["n"]),
    ]
    y, n = jit_run(
        nodes, {"x": x}, {"sp": np.array(3, np.int64)}, outputs=["y", "n"]
    )
    np.testing.assert_array_equal(y, x)
    assert n == 3  # chunks 3, 3, 1
    y, n = jit_run(
        nodes, {"x": x}, {"sp": np.array([2, 5], np.int64)}, outputs=["y", "n"]
    )
    np.testing.assert_array_equal(y, x)
    assert n == 2


def test_split_to_sequence_default_squeezes(rng):
    x = rng.normal(size=(3, 4)).astype(np.float32)
    nodes = [
        P.make_node("SplitToSequence", ["x"], ["s"], axis=0, keepdims=0),
        P.make_node("SequenceAt", ["s", "i"], ["y"]),
    ]
    (y,) = jit_run(nodes, {"x": x}, {"i": np.array(2, np.int64)})
    np.testing.assert_array_equal(y, x[2])
    assert y.shape == (4,)


def test_sequence_map(rng):
    x = rng.normal(size=(4, 3)).astype(np.float32)
    bias = rng.normal(size=(3,)).astype(np.float32)
    body = P.GraphProto(
        name="body",
        node=[P.make_node("Add", ["e", "extra"], ["out"])],
        input=[
            P.make_value_info("e", P.DataType.FLOAT, [3]),
            P.make_value_info("extra", P.DataType.FLOAT, [3]),
        ],
        output=[P.make_value_info("out", P.DataType.FLOAT, [3])],
    )
    nodes = [
        P.make_node("SplitToSequence", ["x"], ["s"], axis=0, keepdims=0),
        P.make_node("SequenceMap", ["s", "b"], ["mapped"], body=body),
        P.make_node("ConcatFromSequence", ["mapped"], ["y"], axis=0, new_axis=1),
    ]
    (y,) = jit_run(nodes, {"x": x, "b": bias}, opset=18)
    np.testing.assert_allclose(y, x + bias, rtol=1e-6)


def test_optional_roundtrip(rng):
    x = rng.normal(size=(2, 2)).astype(np.float32)
    nodes = [
        P.make_node("Optional", ["x"], ["o"]),
        P.make_node("OptionalHasElement", ["o"], ["has"]),
        P.make_node("OptionalGetElement", ["o"], ["y"]),
    ]
    has, y = jit_run(nodes, {"x": x}, outputs=["has", "y"])
    assert has
    np.testing.assert_array_equal(y, x)


def test_optional_empty():
    nodes = [
        P.make_node("Optional", [], ["o"], type=int(P.DataType.FLOAT)),
        P.make_node("OptionalHasElement", ["o"], ["has"]),
    ]
    (has,) = run_graph(nodes, {"x": np.zeros(1, np.float32)}, outputs=["has"])
    assert not has


# ---------------------------------------------------------------------------
# DeformConv / MaxRoiPool
# ---------------------------------------------------------------------------


def test_deform_conv_zero_offset_is_conv(rng):
    """With all-zero offsets and no mask, DeformConv == Conv (torch oracle)."""
    x = rng.normal(size=(2, 4, 9, 9)).astype(np.float32)
    w = rng.normal(size=(6, 4, 3, 3)).astype(np.float32)
    b = rng.normal(size=(6,)).astype(np.float32)
    oh = ow = 9  # stride 1, pad 1
    offset = np.zeros((2, 2 * 3 * 3, oh, ow), np.float32)
    (y,) = jit_run(
        [P.make_node("DeformConv", ["x", "w", "off", "b"], ["y"],
                     pads=[1, 1, 1, 1])],
        {"x": x, "off": offset},
        {"w": w, "b": b},
        opset=19,
    )
    expected = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        padding=1,
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-4)


def _ref_deform_conv(x, w, offset, bias, mask, strides, pads, dil, group, og):
    """Direct-loop numpy reference (torchvision deform_conv2d semantics)."""
    N, C, H, W = x.shape
    oC, icg, kH, kW = w.shape
    oH, oW = offset.shape[2], offset.shape[3]
    K = kH * kW
    off = offset.reshape(N, og, K, 2, oH, oW)
    msk = mask.reshape(N, og, K, oH, oW) if mask is not None else None
    cg = C // og
    out = np.zeros((N, oC, oH, oW), np.float32)

    def bilin(img, y, xx):
        if y <= -1 or y >= H or xx <= -1 or xx >= W:
            # all four corners out of range contribute zero; partial
            # overlap handled below by per-corner masking
            pass
        y0, x0 = int(np.floor(y)), int(np.floor(xx))
        wy, wx = y - y0, xx - x0
        v = np.zeros(img.shape[0], np.float32)
        for dy, fy in ((0, 1 - wy), (1, wy)):
            for dx, fx in ((0, 1 - wx), (1, wx)):
                iy, ix = y0 + dy, x0 + dx
                if 0 <= iy < H and 0 <= ix < W:
                    v += img[:, iy, ix] * fy * fx
        return v

    for n in range(N):
        for g in range(group):
            for oc in range(oC // group):
                for oy in range(oH):
                    for ox in range(oW):
                        acc = 0.0
                        for ci in range(icg):
                            c = g * icg + ci
                            grp = c // cg
                            for ki in range(kH):
                                for kj in range(kW):
                                    k = ki * kW + kj
                                    sy = (oy * strides[0] - pads[0]
                                          + ki * dil[0]
                                          + off[n, grp, k, 0, oy, ox])
                                    sx = (ox * strides[1] - pads[1]
                                          + kj * dil[1]
                                          + off[n, grp, k, 1, oy, ox])
                                    v = bilin(x[n, c:c + 1], sy, sx)[0]
                                    if msk is not None:
                                        v *= msk[n, grp, k, oy, ox]
                                    acc += v * w[g * (oC // group) + oc, ci, ki, kj]
                        out[n, g * (oC // group) + oc, oy, ox] = acc
    if bias is not None:
        out += bias[None, :, None, None]
    return out


def test_deform_conv_v2_offsets_mask_vs_reference(rng):
    x = rng.normal(size=(1, 4, 6, 6)).astype(np.float32)
    w = rng.normal(size=(4, 2, 2, 2)).astype(np.float32)
    oh = ow = 3  # stride 2, no pad, kernel 2
    offset = rng.uniform(-1.5, 1.5, size=(1, 2 * 2 * 2 * 2, oh, ow)).astype(np.float32)
    mask = rng.uniform(0.0, 1.0, size=(1, 2 * 2 * 2, oh, ow)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("DeformConv", ["x", "w", "off", "", "m"], ["y"],
                     strides=[2, 2], group=2, offset_group=2)],
        {"x": x, "off": offset, "m": mask},
        {"w": w},
        opset=19,
    )
    expected = _ref_deform_conv(
        x, w, offset, None, mask, (2, 2), (0, 0), (1, 1), 2, 2
    )
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def _ref_max_roi_pool(x, rois, ph, pw, scale):
    """Caffe ROIPooling reference."""
    N, C, H, W = x.shape
    out = np.zeros((len(rois), C, ph, pw), np.float32)
    for r, roi in enumerate(rois):
        b = int(roi[0])
        x1 = int(round(roi[1] * scale))
        y1 = int(round(roi[2] * scale))
        x2 = int(round(roi[3] * scale))
        y2 = int(round(roi[4] * scale))
        rh = max(y2 - y1 + 1, 1)
        rw = max(x2 - x1 + 1, 1)
        bh, bw = rh / ph, rw / pw
        for p in range(ph):
            for q in range(pw):
                hs = min(max(int(np.floor(p * bh)) + y1, 0), H)
                he = min(max(int(np.ceil((p + 1) * bh)) + y1, 0), H)
                ws = min(max(int(np.floor(q * bw)) + x1, 0), W)
                we = min(max(int(np.ceil((q + 1) * bw)) + x1, 0), W)
                if he <= hs or we <= ws:
                    out[r, :, p, q] = 0.0
                else:
                    out[r, :, p, q] = x[b, :, hs:he, ws:we].max(axis=(1, 2))
    return out


def test_max_roi_pool_vs_reference(rng):
    x = rng.normal(size=(2, 3, 10, 12)).astype(np.float32)
    rois = np.array(
        [[0, 0, 0, 11, 9], [1, 2, 3, 8, 7], [0, 4, 4, 5, 5]], np.float32
    )
    (y,) = jit_run(
        [P.make_node("MaxRoiPool", ["x", "r"], ["y"], pooled_shape=[3, 3])],
        {"x": x, "r": rois},
    )
    expected = _ref_max_roi_pool(x, rois, 3, 3, 1.0)
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_max_roi_pool_spatial_scale(rng):
    x = rng.normal(size=(1, 2, 8, 8)).astype(np.float32)
    rois = np.array([[0, 0, 0, 14, 14]], np.float32)
    (y,) = jit_run(
        [P.make_node("MaxRoiPool", ["x", "r"], ["y"], pooled_shape=[2, 2],
                     spatial_scale=0.5)],
        {"x": x, "r": rois},
    )
    expected = _ref_max_roi_pool(x, rois, 2, 2, 0.5)
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_rms_normalization_vs_torch(rng):
    x = rng.normal(size=(3, 5, 8)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, size=(8,)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("RMSNormalization", ["x", "s"], ["y"], epsilon=1e-5)],
        {"x": x},
        {"s": scale},
        opset=23,
    )
    expected = torch.nn.functional.rms_norm(
        torch.from_numpy(x), (8,), torch.from_numpy(scale), eps=1e-5
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_rms_normalization_multi_axis(rng):
    x = rng.normal(size=(2, 4, 6)).astype(np.float32)
    scale = rng.uniform(0.5, 1.5, size=(4, 6)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("RMSNormalization", ["x", "s"], ["y"], axis=1)],
        {"x": x},
        {"s": scale},
        opset=23,
    )
    ms = np.mean(x**2, axis=(1, 2), keepdims=True)
    expected = x / np.sqrt(ms + 1e-5) * scale
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


# ---------------------------------------------------------------------------
# review-fix regressions
# ---------------------------------------------------------------------------


def test_nms_default_max_boxes_means_no_output():
    # Spec: max_output_boxes_per_class defaults to 0 == "no output".
    boxes = np.array([[[0.0, 0.0, 1.0, 1.0], [0.0, 10.0, 1.0, 11.0]]], np.float32)
    scores = np.array([[[0.9, 0.8]]], np.float32)
    (y,) = run_graph(
        [P.make_node("NonMaxSuppression", ["b", "s"], ["y"])],
        {"b": boxes}, {"s": scores},
    )
    assert y.shape == (0, 3)


def test_grid_sample_reflection_size1_axis(rng):
    # Regression: reflection over a size-1 axis with align_corners divides
    # by a zero span (NaN coordinates).
    x = rng.normal(size=(1, 2, 1, 5)).astype(np.float32)
    grid = rng.uniform(-1.5, 1.5, size=(1, 2, 3, 2)).astype(np.float32)
    (y,) = jit_run(
        [P.make_node("GridSample", ["x", "g"], ["y"], mode="bilinear",
                     padding_mode="reflection", align_corners=1)],
        {"x": x, "g": grid}, opset=16,
    )
    expected = torch.nn.functional.grid_sample(
        torch.from_numpy(x), torch.from_numpy(grid), mode="bilinear",
        padding_mode="reflection", align_corners=True,
    ).numpy()
    assert np.isfinite(y).all()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-4)


def test_roi_align_preserves_dtype(rng):
    x = rng.normal(size=(1, 2, 6, 6)).astype(np.float16)
    rois = np.array([[0.0, 0.0, 5.0, 5.0]], np.float32)
    bidx = np.array([0], np.int64)
    (y,) = jit_run(
        [P.make_node("RoiAlign", ["x", "r", "b"], ["y"], output_height=2,
                     output_width=2, sampling_ratio=1)],
        {"x": x}, {"r": rois, "b": bidx},
    )
    assert y.dtype == np.float16


def test_unnamed_random_nodes_draw_independently():
    # Regression: two seedless unnamed RandomNormal nodes must not share a
    # PRNG key (trace-order counter dedups them).
    nodes = [
        P.make_node("RandomNormal", [], ["a"], shape=[64]),
        P.make_node("RandomNormal", [], ["b"], shape=[64]),
        P.make_node("Sub", ["a", "b"], ["y"]),
    ]
    (y,) = run_graph(nodes, {"x": np.zeros(1, np.float32)})
    assert np.abs(y).max() > 1e-6  # identical keys would give exact zeros


def test_mvn_near_constant_large_mean_no_nan():
    x = np.full((2, 3, 4, 4), 1000.0, np.float32)
    x[0, 0, 0, 0] += 0.01
    (y,) = run_graph(
        [P.make_node("MeanVarianceNormalization", ["x"], ["y"], axes=[2, 3])],
        {"x": x},
    )
    # E[x^2]-E[x]^2 cancels negative here; two-pass variance must not NaN
    # on the perturbed channel.
    assert np.isfinite(y[0, 0]).all()


def test_tensor_scatter_linear(rng):
    """Opset-24 TensorScatter, linear mode: per-batch KV-cache row writes
    at write_indices[b] + i along axis (numpy oracle)."""
    past = rng.normal(size=(2, 4, 8, 5)).astype(np.float32)   # [B,H,S,D]
    upd = rng.normal(size=(2, 4, 3, 5)).astype(np.float32)
    w = np.array([2, 5], dtype=np.int64)
    (y,) = run_graph(
        [P.make_node("TensorScatter", ["p", "u", "w"], ["y"], axis=-2,
                     mode="linear")],
        {"p": past, "u": upd, "w": w},
    )
    ref = past.copy()
    for b in range(2):
        ref[b, :, w[b]:w[b] + 3, :] = upd[b]
    np.testing.assert_allclose(y, ref)


def test_tensor_scatter_circular_and_default_indices(rng):
    past = rng.normal(size=(2, 3, 6)).astype(np.float32)      # axis=-2 → 3
    upd = rng.normal(size=(2, 2, 6)).astype(np.float32)
    w = np.array([2, 1], dtype=np.int64)
    (y,) = run_graph(
        [P.make_node("TensorScatter", ["p", "u", "w"], ["y"],
                     mode="circular")],
        {"p": past, "u": upd, "w": w},
    )
    ref = past.copy()
    for b in range(2):
        for i in range(2):
            ref[b, (w[b] + i) % 3, :] = upd[b, i]
    np.testing.assert_allclose(y, ref)

    # write_indices omitted → zeros; default axis −2
    (y0,) = run_graph(
        [P.make_node("TensorScatter", ["p", "u"], ["y"])],
        {"p": past, "u": upd},
    )
    ref0 = past.copy()
    ref0[:, :2, :] = upd
    np.testing.assert_allclose(y0, ref0)


def test_tensor_scatter_rejects_out_of_range_static_indices(rng):
    """Linear-mode writes past the cache end must raise at load time (JAX
    scatter would silently drop the rows where ORT errors) — both when the
    indices are a direct initializer and when they arrive through a
    constant-folded Cast (a concrete jax.Array, not np.ndarray)."""
    past = rng.normal(size=(1, 4, 2)).astype(np.float32)
    upd = rng.normal(size=(1, 3, 2)).astype(np.float32)
    w32 = np.array([3], dtype=np.int32)  # 3 + 3 > 4: out of range

    with pytest.raises(ValueError, match="out of range"):
        run_graph(
            [P.make_node("TensorScatter", ["p", "u", "w64"], ["y"],
                         mode="linear")],
            {"p": past, "u": upd},
            initializers={"w64": w32.astype(np.int64)},
            opset=24,
        )

    with pytest.raises(ValueError, match="out of range"):
        run_graph(
            [
                P.make_node("Cast", ["w32"], ["w64"], to=P.DataType.INT64),
                P.make_node("TensorScatter", ["p", "u", "w64"], ["y"],
                            mode="linear"),
            ],
            {"p": past, "u": upd},
            initializers={"w32": w32},
            opset=24,
        )
