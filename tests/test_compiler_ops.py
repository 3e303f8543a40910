"""Op-lowering numerical tests.

Each test builds a small ONNX graph with the codec, imports it through the
compiler, and compares against an independent implementation (torch CPU or
numpy). This is the per-op parity harness the reference delegates to ONNX
Runtime's own test suite.
"""

import numpy as np
import pytest

from birdnet_tpu.compiler import import_onnx, make_forward
from birdnet_tpu.onnx import proto as P

torch = pytest.importorskip("torch")


def run_graph(nodes, inputs, initializers=None, outputs=None, opset=17, optimize=False):
    """Build a model from nodes and run it; inputs/outputs are name->array."""
    init = [P.TensorProto.from_numpy(v, name=k) for k, v in (initializers or {}).items()]
    in_vis = [
        P.make_value_info(k, P._NUMPY_TO_DTYPE[np.asarray(v).dtype], list(np.asarray(v).shape))
        for k, v in inputs.items()
    ]
    out_names = outputs or ["y"]
    out_vis = [P.make_value_info(n, P.DataType.FLOAT, []) for n in out_names]
    graph = P.GraphProto(name="t", node=nodes, initializer=init, input=in_vis, output=out_vis)
    model = import_onnx(P.make_model(graph, opset_version=opset), optimize=optimize)
    fwd = make_forward(model)
    outs = fwd(model.params, *[np.asarray(v) for v in inputs.values()])
    return [np.asarray(o) for o in outs]


def test_conv2d_vs_torch(rng):
    x = rng.normal(size=(2, 3, 16, 16)).astype(np.float32)
    w = rng.normal(size=(8, 3, 3, 3)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Conv", ["x", "w", "b"], ["y"], strides=[2, 2], pads=[1, 1, 1, 1])],
        {"x": x},
        {"w": w, "b": b},
    )
    expected = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b), stride=2, padding=1
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_conv2d_depthwise_vs_torch(rng):
    x = rng.normal(size=(1, 8, 12, 12)).astype(np.float32)
    w = rng.normal(size=(8, 1, 3, 3)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Conv", ["x", "w"], ["y"], group=8, pads=[1, 1, 1, 1])],
        {"x": x},
        {"w": w},
    )
    expected = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), padding=1, groups=8
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_conv1d_same_upper_vs_torch(rng):
    x = rng.normal(size=(1, 1, 64)).astype(np.float32)
    w = rng.normal(size=(4, 1, 5)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Conv", ["x", "w"], ["y"], auto_pad="SAME_UPPER", strides=[1])],
        {"x": x},
        {"w": w},
    )
    expected = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), padding=2
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "length,k,stride,c_out,pads,bias",
    [
        (4000, 1024, 280, 96, None, True),   # BirdNET-style filterbank frontend
        (512, 64, 64, 8, None, False),       # k == stride (pure reshape+matmul)
        (500, 100, 48, 5, None, True),       # k not a multiple of stride
        (300, 32, 17, 3, [7, 11], False),    # asymmetric explicit pads
        (1040, 1024, 280, 4, None, True),    # single output frame
    ],
)
def test_conv1d_polyphase_vs_torch(rng, length, k, stride, c_out, pads, bias):
    """Large-stride C_in=1 Conv1d takes the polyphase matmul path."""
    x = rng.normal(size=(2, 1, length)).astype(np.float32)
    w = rng.normal(size=(c_out, 1, k)).astype(np.float32)
    attrs = dict(strides=[stride])
    if pads is not None:
        attrs["pads"] = pads
    inits = {"w": w}
    names = ["x", "w"]
    tb = None
    if bias:
        b = rng.normal(size=(c_out,)).astype(np.float32)
        inits["b"] = b
        names.append("b")
        tb = torch.from_numpy(b)
    (y,) = run_graph([P.make_node("Conv", names, ["y"], **attrs)], {"x": x}, inits)
    xt = torch.from_numpy(x)
    if pads is not None:
        xt = torch.nn.functional.pad(xt, (pads[0], pads[1]))
    expected = torch.nn.functional.conv1d(
        xt, torch.from_numpy(w), tb, stride=stride
    ).numpy()
    assert y.shape == expected.shape
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-4)


def test_conv1d_polyphase_randomized_vs_torch():
    """Seeded random sweep over the polyphase-eligible config space."""
    r = np.random.default_rng(123)
    for _ in range(20):
        stride = int(r.integers(16, 400))
        k = int(r.integers(16, 1200))
        c_out = int(r.integers(1, 12))
        t = int(r.integers(1, 9))  # desired output frames
        length = (t - 1) * stride + k + int(r.integers(0, stride))
        bias = bool(r.integers(0, 2))
        x = r.normal(size=(1, 1, length)).astype(np.float32)
        w = r.normal(size=(c_out, 1, k)).astype(np.float32)
        inits = {"w": w}
        names = ["x", "w"]
        tb = None
        if bias:
            b = r.normal(size=(c_out,)).astype(np.float32)
            inits["b"] = b
            names.append("b")
            tb = torch.from_numpy(b)
        (y,) = run_graph(
            [P.make_node("Conv", names, ["y"], strides=[stride])],
            {"x": x}, inits,
        )
        expected = torch.nn.functional.conv1d(
            torch.from_numpy(x), torch.from_numpy(w), tb, stride=stride
        ).numpy()
        assert y.shape == expected.shape, (k, stride, length)
        np.testing.assert_allclose(
            y, expected, rtol=1e-3, atol=1e-3,
            err_msg=f"k={k} stride={stride} len={length} bias={bias}",
        )


def test_conv_dilated_vs_torch(rng):
    x = rng.normal(size=(1, 2, 20, 20)).astype(np.float32)
    w = rng.normal(size=(4, 2, 3, 3)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Conv", ["x", "w"], ["y"], dilations=[2, 2], pads=[2, 2, 2, 2])],
        {"x": x},
        {"w": w},
    )
    expected = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), padding=2, dilation=2
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_convtranspose_vs_torch(rng):
    x = rng.normal(size=(1, 4, 8, 8)).astype(np.float32)
    w = rng.normal(size=(4, 6, 3, 3)).astype(np.float32)  # (C_in, C_out, k, k)
    (y,) = run_graph(
        [P.make_node("ConvTranspose", ["x", "w"], ["y"], strides=[2, 2], pads=[1, 1, 1, 1])],
        {"x": x},
        {"w": w},
    )
    expected = torch.nn.functional.conv_transpose2d(
        torch.from_numpy(x), torch.from_numpy(w), stride=2, padding=1
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_batchnorm_vs_torch(rng):
    x = rng.normal(size=(2, 5, 7, 7)).astype(np.float32)
    scale = rng.normal(size=(5,)).astype(np.float32)
    bias = rng.normal(size=(5,)).astype(np.float32)
    mean = rng.normal(size=(5,)).astype(np.float32)
    var = rng.uniform(0.5, 2.0, size=(5,)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("BatchNormalization", ["x", "s", "b", "m", "v"], ["y"], epsilon=1e-3)],
        {"x": x},
        {"s": scale, "b": bias, "m": mean, "v": var},
    )
    expected = torch.nn.functional.batch_norm(
        torch.from_numpy(x),
        torch.from_numpy(mean),
        torch.from_numpy(var),
        torch.from_numpy(scale),
        torch.from_numpy(bias),
        training=False,
        eps=1e-3,
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_maxpool_ceil_mode_vs_torch(rng):
    x = rng.normal(size=(1, 3, 11, 11)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("MaxPool", ["x"], ["y"], kernel_shape=[3, 3], strides=[2, 2], ceil_mode=1)],
        {"x": x},
    )
    expected = torch.nn.functional.max_pool2d(
        torch.from_numpy(x), 3, stride=2, ceil_mode=True
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5)


def test_avgpool_vs_torch(rng):
    x = rng.normal(size=(1, 3, 10, 10)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("AveragePool", ["x"], ["y"], kernel_shape=[2, 2], strides=[2, 2])],
        {"x": x},
    )
    expected = torch.nn.functional.avg_pool2d(torch.from_numpy(x), 2, 2).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5)


def test_avgpool_padded_count_exclude_vs_torch(rng):
    x = rng.normal(size=(1, 2, 9, 9)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("AveragePool", ["x"], ["y"], kernel_shape=[3, 3], strides=[2, 2], pads=[1, 1, 1, 1])],
        {"x": x},
    )
    expected = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), 3, 2, padding=1, count_include_pad=False
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5)


def test_avgpool_ceil_mode_count_include_pad_vs_torch(rng):
    """Regression (found by the random-graph differential suite): with
    ceil_mode=1 AND count_include_pad=1, the divisor counts explicit pad
    cells but NOT the ceil overhang — torch and onnxruntime clip edge
    windows to their real coverage."""
    x = rng.normal(size=(2, 3, 14, 19)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("AveragePool", ["x"], ["y"], kernel_shape=[2, 2],
                     strides=[2, 2], ceil_mode=1, count_include_pad=1)],
        {"x": x},
    )
    expected = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), 2, 2, ceil_mode=True, count_include_pad=True
    ).numpy()
    assert y.shape == expected.shape == (2, 3, 7, 10)
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)



    """Explicit padding + ceil overhang together: pad cells count when
    count_include_pad=1, the overhang never does."""
    x = rng.normal(size=(1, 2, 9, 11)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("AveragePool", ["x"], ["y"], kernel_shape=[3, 3],
                     strides=[2, 2], pads=[1, 1, 1, 1], ceil_mode=1,
                     count_include_pad=1)],
        {"x": x},
    )
    expected = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x), 3, 2, padding=1, ceil_mode=True,
        count_include_pad=True
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_resize_linear_antialias_downscale_vs_torch(rng):
    """antialias=1 linear downscale (opset 18): PIL/torch triangle filter
    stretched by 1/scale, normalized."""
    x = rng.normal(size=(2, 3, 16, 20)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Resize", ["x", "", "", "sizes"], ["y"], mode="linear",
                     coordinate_transformation_mode="pytorch_half_pixel",
                     antialias=1)],
        {"x": x},
        initializers={"sizes": np.array([2, 3, 7, 9], np.int64)},
        opset=18,
    )
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(7, 9), mode="bilinear",
        align_corners=False, antialias=True,
    ).numpy()
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


def test_resize_cubic_vs_torch_bicubic(rng):
    """Spec-exact Keys cubic (cubic_coeff_a=-0.75, torch's kernel), both
    half-pixel and the previously unsupported align_corners coords."""
    x = rng.normal(size=(1, 2, 8, 9)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Resize", ["x", "", "", "sizes"], ["y"], mode="cubic",
                     coordinate_transformation_mode="pytorch_half_pixel")],
        {"x": x},
        initializers={"sizes": np.array([1, 2, 13, 17], np.int64)},
        opset=18,
    )
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(13, 17), mode="bicubic",
        align_corners=False,
    ).numpy()
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)

    (y,) = run_graph(
        [P.make_node("Resize", ["x", "", "", "sizes"], ["y"], mode="cubic",
                     coordinate_transformation_mode="align_corners")],
        {"x": x},
        initializers={"sizes": np.array([1, 2, 13, 17], np.int64)},
        opset=18,
    )
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(13, 17), mode="bicubic",
        align_corners=True,
    ).numpy()
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


def test_resize_cubic_antialias_downscale_vs_torch(rng):
    """antialias bicubic downscale; torch's antialiased path is
    PIL-consistent (Keys a=-0.5), exported with cubic_coeff_a=-0.5."""
    x = rng.normal(size=(1, 2, 17, 19)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Resize", ["x", "", "", "sizes"], ["y"], mode="cubic",
                     coordinate_transformation_mode="pytorch_half_pixel",
                     antialias=1, cubic_coeff_a=-0.5)],
        {"x": x},
        initializers={"sizes": np.array([1, 2, 7, 8], np.int64)},
        opset=18,
    )
    want = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(7, 8), mode="bicubic",
        align_corners=False, antialias=True,
    ).numpy()
    np.testing.assert_allclose(y, want, rtol=1e-4, atol=1e-5)


def _resize_1d_spec_oracle(row, d_out, scale, coord, mode, a, exclude):
    """Independent direct-convolution implementation of the ONNX Resize
    formula for one axis (loop form, no shared code with the lowering)."""
    d_in = row.shape[0]
    out = np.zeros(d_out, np.float64)
    for i in range(d_out):
        if coord == "half_pixel":
            c = (i + 0.5) / scale - 0.5
        elif coord == "asymmetric":
            c = i / scale
        else:
            raise AssertionError(coord)
        support = 1.0 if mode == "linear" else 2.0
        acc = 0.0
        wsum = 0.0
        for j in range(int(np.ceil(c - support)), int(np.floor(c + support)) + 1):
            t = abs(j - c)
            if mode == "linear":
                w = max(0.0, 1.0 - t)
            elif t <= 1.0:
                w = ((a + 2.0) * t - (a + 3.0)) * t * t + 1.0
            elif t < 2.0:
                w = (((t - 5.0) * t + 8.0) * t - 4.0) * a
            else:
                w = 0.0
            if 0 <= j < d_in:
                acc += w * row[j]
                wsum += w
            elif not exclude:
                acc += w * row[min(max(j, 0), d_in - 1)]
                wsum += w
        out[i] = acc / wsum if wsum else 0.0
    return out.astype(np.float32)


def test_resize_cubic_exclude_outside_vs_spec_oracle(rng):
    """exclude_outside=1: edge taps outside the input are zeroed and the
    kernel renormalized — differs from the clamp default at the borders."""
    row = rng.normal(size=6).astype(np.float32)
    x = row.reshape(1, 1, 6)
    for exclude in (0, 1):
        (y,) = run_graph(
            [P.make_node("Resize", ["x", "", "scales"], ["y"], mode="cubic",
                         coordinate_transformation_mode="half_pixel",
                         exclude_outside=exclude)],
            {"x": x},
            initializers={"scales": np.array([1, 1, 2.0], np.float32)},
            opset=18,
        )
        want = _resize_1d_spec_oracle(row, 12, 2.0, "half_pixel", "cubic",
                                      -0.75, bool(exclude))
        np.testing.assert_allclose(
            y.reshape(-1), want, rtol=1e-4, atol=1e-5,
            err_msg=f"exclude_outside={exclude}",
        )
    # sanity: the two settings genuinely differ at the borders
    (y0,) = run_graph(
        [P.make_node("Resize", ["x", "", "scales"], ["y"], mode="cubic",
                     coordinate_transformation_mode="half_pixel",
                     exclude_outside=0)],
        {"x": x}, initializers={"scales": np.array([1, 1, 2.0], np.float32)},
        opset=18)
    (y1,) = run_graph(
        [P.make_node("Resize", ["x", "", "scales"], ["y"], mode="cubic",
                     coordinate_transformation_mode="half_pixel",
                     exclude_outside=1)],
        {"x": x}, initializers={"scales": np.array([1, 1, 2.0], np.float32)},
        opset=18)
    assert np.abs(y0 - y1).max() > 1e-6


def test_resize_tf_crop_and_resize(rng):
    """Identity ROI ([0,1] per axis) reduces the crop formula to
    align_corners resampling — cross-checked against that path; an ROI
    reaching outside [0,1] fills with extrapolation_value."""
    x = rng.normal(size=(1, 2, 8, 10)).astype(np.float32)
    sizes = np.array([1, 2, 5, 7], np.int64)
    roi_id = np.array([0, 0, 0, 0, 1, 1, 1, 1], np.float32)
    (y,) = run_graph(
        [P.make_node("Resize", ["x", "roi", "", "sizes"], ["y"],
                     mode="linear",
                     coordinate_transformation_mode="tf_crop_and_resize")],
        {"x": x}, initializers={"roi": roi_id, "sizes": sizes}, opset=18,
    )
    (want,) = run_graph(
        [P.make_node("Resize", ["x", "", "", "sizes"], ["y"], mode="linear",
                     coordinate_transformation_mode="align_corners")],
        {"x": x}, initializers={"sizes": sizes}, opset=18,
    )
    np.testing.assert_allclose(y, want, rtol=1e-5, atol=1e-6)

    # center crop of the H axis, W identity
    roi_c = np.array([0, 0, 0.25, 0, 1, 1, 0.75, 1], np.float32)
    (y,) = run_graph(
        [P.make_node("Resize", ["x", "roi", "", "sizes"], ["y"],
                     mode="linear",
                     coordinate_transformation_mode="tf_crop_and_resize")],
        {"x": x}, initializers={"roi": roi_c, "sizes": sizes}, opset=18,
    )
    # oracle: direct bilinear sampling at the spec's crop coordinates
    h_in, w_in, h_out, w_out = 8, 10, 5, 7
    src_h = 0.25 * (h_in - 1) + np.arange(h_out) * 0.5 * (h_in - 1) / (h_out - 1)
    src_w = np.arange(w_out) * (w_in - 1) / (w_out - 1)

    def bilinear(img, sh, sw):
        out = np.zeros((h_out, w_out), np.float64)
        for i, cy in enumerate(sh):
            y0 = int(np.floor(cy)); fy = cy - y0
            y1 = min(y0 + 1, h_in - 1)
            for j, cx in enumerate(sw):
                x0 = int(np.floor(cx)); fx = cx - x0
                x1 = min(x0 + 1, w_in - 1)
                top = img[y0, x0] * (1 - fx) + img[y0, x1] * fx
                bot = img[y1, x0] * (1 - fx) + img[y1, x1] * fx
                out[i, j] = top * (1 - fy) + bot * fy
        return out

    for n in range(1):
        for ch in range(2):
            np.testing.assert_allclose(
                y[n, ch], bilinear(x[n, ch], src_h, src_w),
                rtol=1e-4, atol=1e-5,
            )

    # ROI past the input edge: those outputs take extrapolation_value
    roi_o = np.array([0, 0, 0.5, 0, 1, 1, 1.5, 1], np.float32)
    (y,) = run_graph(
        [P.make_node("Resize", ["x", "roi", "", "sizes"], ["y"],
                     mode="linear",
                     coordinate_transformation_mode="tf_crop_and_resize",
                     extrapolation_value=-7.5)],
        {"x": x}, initializers={"roi": roi_o, "sizes": sizes}, opset=18,
    )
    src_h = 0.5 * (h_in - 1) + np.arange(h_out) * (h_in - 1) / (h_out - 1)
    oob_rows = (src_h < 0) | (src_h > h_in - 1)
    assert oob_rows.any()
    assert (y[:, :, oob_rows, :] == -7.5).all()
    assert not (y[:, :, ~oob_rows, :] == -7.5).any()


def test_resize_keep_aspect_ratio_policies(rng):
    """not_larger / not_smaller pick one uniform scale over the listed
    axes (spec: min/max of the target ratios, rounded sizes)."""
    x = rng.normal(size=(1, 1, 10, 20)).astype(np.float32)
    for policy, want_hw in (("not_larger", (5, 10)), ("not_smaller", (8, 16))):
        (y,) = run_graph(
            [P.make_node("Resize", ["x", "", "", "sizes"], ["y"],
                         mode="linear",
                         coordinate_transformation_mode="half_pixel",
                         keep_aspect_ratio_policy=policy, axes=[2, 3])],
            {"x": x},
            initializers={"sizes": np.array([8, 10], np.int64)},
            opset=18,
        )
        assert y.shape == (1, 1) + want_hw, policy


def test_gemm_transb_vs_torch(rng):
    a = rng.normal(size=(4, 8)).astype(np.float32)
    b = rng.normal(size=(6, 8)).astype(np.float32)
    c = rng.normal(size=(6,)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Gemm", ["a", "b", "c"], ["y"], transB=1, alpha=1.0, beta=1.0)],
        {"a": a},
        {"b": b, "c": c},
    )
    expected = (torch.from_numpy(a) @ torch.from_numpy(b).T + torch.from_numpy(c)).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_softmax_logsoftmax_vs_torch(rng):
    x = rng.normal(size=(3, 12)).astype(np.float32)
    (y,) = run_graph([P.make_node("Softmax", ["x"], ["y"], axis=-1)], {"x": x})
    np.testing.assert_allclose(
        y, torch.softmax(torch.from_numpy(x), -1).numpy(), rtol=1e-5, atol=1e-6
    )


@pytest.mark.parametrize(
    "op,tfn",
    [
        ("Relu", torch.relu),
        ("Sigmoid", torch.sigmoid),
        ("Tanh", torch.tanh),
        ("Erf", torch.erf),
        ("Softplus", torch.nn.functional.softplus),
        ("HardSwish", torch.nn.functional.hardswish),
        ("Exp", torch.exp),
        ("Abs", torch.abs),
    ],
)
def test_unary_vs_torch(rng, op, tfn):
    x = rng.normal(size=(4, 17)).astype(np.float32)
    (y,) = run_graph([P.make_node(op, ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(y, tfn(torch.from_numpy(x)).numpy(), rtol=1e-4, atol=1e-5)


def test_leaky_prelu_elu_vs_torch(rng):
    x = rng.normal(size=(4, 9)).astype(np.float32)
    (y,) = run_graph([P.make_node("LeakyRelu", ["x"], ["y"], alpha=0.2)], {"x": x})
    np.testing.assert_allclose(
        y, torch.nn.functional.leaky_relu(torch.from_numpy(x), 0.2).numpy(), rtol=1e-5
    )
    (y,) = run_graph([P.make_node("Elu", ["x"], ["y"], alpha=1.5)], {"x": x})
    np.testing.assert_allclose(
        y, torch.nn.functional.elu(torch.from_numpy(x), 1.5).numpy(), rtol=1e-5, atol=1e-6
    )


def test_reshape_transpose_flatten(rng):
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Reshape", ["x", "shape"], ["y"])],
        {"x": x},
        {"shape": np.array([2, 12], dtype=np.int64)},
    )
    assert y.shape == (2, 12)
    (y,) = run_graph(
        [P.make_node("Reshape", ["x", "shape"], ["y"])],
        {"x": x},
        {"shape": np.array([0, -1], dtype=np.int64)},
    )
    assert y.shape == (2, 12)  # 0 copies input dim
    (y,) = run_graph([P.make_node("Transpose", ["x"], ["y"], perm=[2, 0, 1])], {"x": x})
    np.testing.assert_array_equal(y, x.transpose(2, 0, 1))
    (y,) = run_graph([P.make_node("Flatten", ["x"], ["y"], axis=2)], {"x": x})
    assert y.shape == (6, 4)


def test_squeeze_unsqueeze_opset13(rng):
    x = rng.normal(size=(1, 3, 1, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Squeeze", ["x", "axes"], ["y"])],
        {"x": x},
        {"axes": np.array([0, 2], dtype=np.int64)},
    )
    assert y.shape == (3, 4)
    (y,) = run_graph(
        [P.make_node("Unsqueeze", ["x", "axes"], ["y"])],
        {"x": x},
        {"axes": np.array([0, -1], dtype=np.int64)},
    )
    assert y.shape == (1, 1, 3, 1, 4, 1)


def test_concat_split_slice(rng):
    a = rng.normal(size=(2, 3)).astype(np.float32)
    b = rng.normal(size=(2, 5)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Concat", ["a", "b"], ["y"], axis=1)], {"a": a, "b": b}
    )
    np.testing.assert_array_equal(y, np.concatenate([a, b], axis=1))

    x = rng.normal(size=(2, 8)).astype(np.float32)
    y0, y1 = run_graph(
        [P.make_node("Split", ["x", "split"], ["y", "y2"], axis=1)],
        {"x": x},
        {"split": np.array([3, 5], dtype=np.int64)},
        outputs=["y", "y2"],
    )
    np.testing.assert_array_equal(y0, x[:, :3])
    np.testing.assert_array_equal(y1, x[:, 3:])

    (y,) = run_graph(
        [P.make_node("Slice", ["x", "starts", "ends", "axes", "steps"], ["y"])],
        {"x": x},
        {
            "starts": np.array([1], dtype=np.int64),
            "ends": np.array([7], dtype=np.int64),
            "axes": np.array([1], dtype=np.int64),
            "steps": np.array([2], dtype=np.int64),
        },
    )
    np.testing.assert_array_equal(y, x[:, 1:7:2])


def test_slice_negative_and_clamped(rng):
    x = rng.normal(size=(5, 6)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Slice", ["x", "st", "en"], ["y"])],
        {"x": x},
        {
            "st": np.array([-3, 0], dtype=np.int64),
            "en": np.array([2**63 - 1, 100], dtype=np.int64),
        },
    )
    np.testing.assert_array_equal(y, x[-3:, :])


def test_pad_modes(rng):
    x = rng.normal(size=(2, 3)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Pad", ["x", "pads", "cv"], ["y"], mode="constant")],
        {"x": x},
        {
            "pads": np.array([0, 1, 0, 2], dtype=np.int64),
            "cv": np.array(7.0, dtype=np.float32),
        },
    )
    np.testing.assert_array_equal(y, np.pad(x, [(0, 0), (1, 2)], constant_values=7.0))
    (y,) = run_graph(
        [P.make_node("Pad", ["x", "pads"], ["y"], mode="reflect")],
        {"x": x},
        {"pads": np.array([0, 1, 0, 1], dtype=np.int64)},
    )
    np.testing.assert_array_equal(y, np.pad(x, [(0, 0), (1, 1)], mode="reflect"))


def test_reduce_ops_opset18(rng):
    x = rng.normal(size=(3, 4, 5)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("ReduceMean", ["x", "axes"], ["y"], keepdims=0)],
        {"x": x},
        {"axes": np.array([1, 2], dtype=np.int64)},
        opset=18,
    )
    np.testing.assert_allclose(y, x.mean(axis=(1, 2)), rtol=1e-5)
    (y,) = run_graph(
        [P.make_node("ReduceMax", ["x"], ["y"], axes=[0], keepdims=1)],
        {"x": x},
        opset=13,
    )
    np.testing.assert_allclose(y, x.max(axis=0, keepdims=True))


def test_global_pools(rng):
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    (y,) = run_graph([P.make_node("GlobalAveragePool", ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(y, x.mean(axis=(2, 3), keepdims=True), rtol=1e-5)
    (y,) = run_graph([P.make_node("GlobalMaxPool", ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(y, x.max(axis=(2, 3), keepdims=True))


def test_shape_gather_reshape_chain_folds(rng):
    """Shape→Gather→Concat→Reshape chains must fold at import/trace time."""
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    nodes = [
        P.make_node("Shape", ["x"], ["sh"]),
        P.make_node("Gather", ["sh", "idx0"], ["d0"], axis=0),
        P.make_node("Concat", ["d0", "neg1"], ["newshape"], axis=0),
        P.make_node("Reshape", ["x", "newshape"], ["y"]),
    ]
    (y,) = run_graph(
        nodes,
        {"x": x},
        {
            "idx0": np.array([0], dtype=np.int64),
            "neg1": np.array([-1], dtype=np.int64),
        },
    )
    assert y.shape == (2, 12)


def test_matmul_where_clip(rng):
    a = rng.normal(size=(3, 4)).astype(np.float32)
    b = rng.normal(size=(4, 5)).astype(np.float32)
    (y,) = run_graph([P.make_node("MatMul", ["a", "b"], ["y"])], {"a": a, "b": b})
    np.testing.assert_allclose(y, a @ b, rtol=1e-4, atol=1e-5)

    x = rng.normal(size=(6,)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Clip", ["x", "lo", "hi"], ["y"])],
        {"x": x},
        {"lo": np.array(-0.5, dtype=np.float32), "hi": np.array(0.5, dtype=np.float32)},
    )
    np.testing.assert_allclose(y, np.clip(x, -0.5, 0.5))


def test_topk_op(rng):
    x = rng.normal(size=(2, 10)).astype(np.float32)
    vals, idxs = run_graph(
        [P.make_node("TopK", ["x", "k"], ["y", "yi"], axis=-1, largest=1)],
        {"x": x},
        {"k": np.array([3], dtype=np.int64)},
        outputs=["y", "yi"],
    )
    tv, ti = torch.topk(torch.from_numpy(x), 3, dim=-1)
    np.testing.assert_allclose(vals, tv.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(idxs, ti.numpy())


def test_argmax_cast_expand(rng):
    x = rng.normal(size=(3, 7)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("ArgMax", ["x"], ["y"], axis=1, keepdims=0)], {"x": x}
    )
    np.testing.assert_array_equal(y, x.argmax(axis=1))
    (y,) = run_graph(
        [P.make_node("Cast", ["x"], ["y"], to=P.DataType.INT32)], {"x": x}
    )
    assert y.dtype == np.int32
    (y,) = run_graph(
        [P.make_node("Expand", ["x", "sh"], ["y"])],
        {"x": x.reshape(3, 1, 7)},
        {"sh": np.array([3, 4, 7], dtype=np.int64)},
    )
    assert y.shape == (3, 4, 7)


def test_layernorm_vs_torch(rng):
    x = rng.normal(size=(2, 5, 16)).astype(np.float32)
    w = rng.normal(size=(16,)).astype(np.float32)
    b = rng.normal(size=(16,)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("LayerNormalization", ["x", "w", "b"], ["y"], axis=-1, epsilon=1e-5)],
        {"x": x},
        {"w": w, "b": b},
    )
    expected = torch.nn.functional.layer_norm(
        torch.from_numpy(x), (16,), torch.from_numpy(w), torch.from_numpy(b), 1e-5
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_instancenorm_vs_torch(rng):
    x = rng.normal(size=(2, 3, 8, 8)).astype(np.float32)
    s = rng.normal(size=(3,)).astype(np.float32)
    b = rng.normal(size=(3,)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("InstanceNormalization", ["x", "s", "b"], ["y"], epsilon=1e-5)],
        {"x": x},
        {"s": s, "b": b},
    )
    expected = torch.nn.functional.instance_norm(
        torch.from_numpy(x), weight=torch.from_numpy(s), bias=torch.from_numpy(b), eps=1e-5
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-3, atol=1e-4)


def test_unsupported_op_reports_name():
    from birdnet_tpu.errors import ModelLoadError

    graph = P.GraphProto(
        name="t",
        node=[P.make_node("FancyCustomOp", ["x"], ["y"])],
        input=[P.make_value_info("x", P.DataType.FLOAT, [1])],
        output=[P.make_value_info("y", P.DataType.FLOAT, [1])],
    )
    with pytest.raises(ModelLoadError) as ei:
        import_onnx(P.make_model(graph))
    assert "FancyCustomOp" in str(ei.value)


def test_celu_thresholded_shrink_vs_torch(rng):
    x = rng.normal(size=(3, 9)).astype(np.float32)
    (y,) = run_graph([P.make_node("Celu", ["x"], ["y"], alpha=1.2)], {"x": x})
    np.testing.assert_allclose(
        y, torch.celu(torch.from_numpy(x), 1.2).numpy(), rtol=1e-5, atol=1e-6
    )
    (y,) = run_graph([P.make_node("ThresholdedRelu", ["x"], ["y"], alpha=0.5)], {"x": x})
    np.testing.assert_allclose(
        y, torch.nn.functional.threshold(torch.from_numpy(x), 0.5, 0.0).numpy(), rtol=1e-6
    )
    (y,) = run_graph([P.make_node("Shrink", ["x"], ["y"], lambd=0.5, bias=0.1)], {"x": x})
    expected = np.where(x < -0.5, x + 0.1, np.where(x > 0.5, x - 0.1, 0.0))
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_trilu_eyelike(rng):
    x = rng.normal(size=(4, 5)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Trilu", ["x", "k"], ["y"], upper=1)],
        {"x": x},
        {"k": np.array(1, dtype=np.int64)},
    )
    np.testing.assert_array_equal(y, np.triu(x, 1))
    (y,) = run_graph([P.make_node("EyeLike", ["x"], ["y"])], {"x": x})
    np.testing.assert_array_equal(y, np.eye(4, 5, dtype=np.float32))


def test_qdq_roundtrip(rng):
    x = rng.normal(size=(2, 6)).astype(np.float32)
    scale = np.array(0.05, dtype=np.float32)
    zp = np.array(3, dtype=np.int8)
    (q,) = run_graph(
        [P.make_node("QuantizeLinear", ["x", "s", "z"], ["y"])],
        {"x": x},
        {"s": scale, "z": zp},
    )
    assert q.dtype == np.int8
    tq = torch.quantize_per_tensor(
        torch.from_numpy(x), 0.05, 3, torch.qint8
    ).int_repr().numpy()
    np.testing.assert_allclose(q, tq, atol=1)  # rounding mode may differ at .5
    (dq,) = run_graph(
        [P.make_node("DequantizeLinear", ["x", "s", "z"], ["y"])],
        {"x": q},
        {"s": scale, "z": zp},
    )
    np.testing.assert_allclose(dq, (q.astype(np.float32) - 3) * 0.05, rtol=1e-6)


def test_qdq_per_channel(rng):
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    scale = np.array([0.1, 0.2, 0.4], dtype=np.float32)
    (q,) = run_graph(
        [P.make_node("QuantizeLinear", ["x", "s"], ["y"], axis=1)],
        {"x": x},
        {"s": scale},
    )
    assert q.dtype == np.uint8
    (dq,) = run_graph(
        [P.make_node("DequantizeLinear", ["x", "s"], ["y"], axis=1)],
        {"x": q},
        {"s": scale},
    )
    assert dq.shape == x.shape


def test_if_static_condition():
    then_g = P.GraphProto(
        name="then",
        node=[P.make_node("Constant", [], ["out"], value=np.float32(1.0) * np.ones(2, np.float32))],
        output=[P.make_value_info("out", P.DataType.FLOAT, [2])],
    )
    else_g = P.GraphProto(
        name="else",
        node=[P.make_node("Constant", [], ["out"], value=np.float32(-1.0) * np.ones(2, np.float32))],
        output=[P.make_value_info("out", P.DataType.FLOAT, [2])],
    )
    for cond, expected in [(True, 1.0), (False, -1.0)]:
        (y,) = run_graph(
            [P.make_node("If", ["cond"], ["y"], then_branch=then_g, else_branch=else_g)],
            {},
            {"cond": np.array(cond)},
        )
        np.testing.assert_allclose(np.asarray(y), expected * np.ones(2, np.float32))


def test_loop_static_trip_count(rng):
    """Loop body: carried = carried * 2; scan output = carried."""
    body = P.GraphProto(
        name="body",
        node=[
            P.make_node("Identity", ["cond_in"], ["cond_out"]),
            P.make_node("Mul", ["v", "two"], ["v_out"]),
            P.make_node("Identity", ["v_out"], ["scan0"]),
        ],
        initializer=[P.TensorProto.from_numpy(np.float32(2.0) * np.ones(1, np.float32), name="two")],
        input=[
            P.make_value_info("iter", P.DataType.INT64, []),
            P.make_value_info("cond_in", P.DataType.BOOL, []),
            P.make_value_info("v", P.DataType.FLOAT, [1]),
        ],
        output=[
            P.make_value_info("cond_out", P.DataType.BOOL, []),
            P.make_value_info("v_out", P.DataType.FLOAT, [1]),
            P.make_value_info("scan0", P.DataType.FLOAT, [1]),
        ],
    )
    x = np.ones(1, dtype=np.float32)
    final, scans = run_graph(
        [P.make_node("Loop", ["M", "cond", "x"], ["final", "scans"], body=body)],
        {"x": x},
        {"M": np.array(4, dtype=np.int64), "cond": np.array(True)},
        outputs=["final", "scans"],
    )
    np.testing.assert_allclose(final, [16.0])
    np.testing.assert_allclose(scans.reshape(-1), [2.0, 4.0, 8.0, 16.0])


def test_loop_early_exit_consumes_final_iteration(rng):
    """Per ONNX spec, the iteration that sets cond_out=false still counts."""
    body = P.GraphProto(
        name="body",
        node=[
            P.make_node("Less", ["iter", "one"], ["cond_out"]),
            P.make_node("Mul", ["v", "two"], ["v_out"]),
        ],
        initializer=[
            P.TensorProto.from_numpy(np.array(1, dtype=np.int64), name="one"),
            P.TensorProto.from_numpy(np.float32(2.0) * np.ones(1, np.float32), name="two"),
        ],
        input=[
            P.make_value_info("iter", P.DataType.INT64, []),
            P.make_value_info("cond_in", P.DataType.BOOL, []),
            P.make_value_info("v", P.DataType.FLOAT, [1]),
        ],
        output=[
            P.make_value_info("cond_out", P.DataType.BOOL, []),
            P.make_value_info("v_out", P.DataType.FLOAT, [1]),
        ],
    )
    (final,) = run_graph(
        [P.make_node("Loop", ["M", "cond", "x"], ["final"], body=body)],
        {"x": np.ones(1, dtype=np.float32)},
        {"M": np.array(4, dtype=np.int64), "cond": np.array(True)},
        outputs=["final"],
    )
    # iter=0: cond_out = (0 < 1) = True, v = 2; iter=1: cond_out = False,
    # v = 4 — that iteration's output still counts, then the loop breaks.
    np.testing.assert_allclose(final, [4.0])


def test_subgraph_outer_scope_capture():
    """If branches may read values from the enclosing graph (ONNX closure)."""
    then_g = P.GraphProto(
        name="then",
        node=[P.make_node("Add", ["outer_val", "outer_val"], ["out"])],
        output=[P.make_value_info("out", P.DataType.FLOAT, [2])],
    )
    else_g = P.GraphProto(
        name="else",
        node=[P.make_node("Identity", ["outer_val"], ["out"])],
        output=[P.make_value_info("out", P.DataType.FLOAT, [2])],
    )
    nodes = [
        P.make_node("Add", ["x", "x"], ["outer_val"]),
        P.make_node("If", ["cond"], ["y"], then_branch=then_g, else_branch=else_g),
    ]
    x = np.array([1.0, 2.0], dtype=np.float32)
    (y,) = run_graph(
        nodes, {"x": x}, {"cond": np.array(True)},
    )
    np.testing.assert_allclose(y, 4 * x)


def test_stft_short_window_zero_padded(rng):
    x = rng.normal(size=(1, 1024)).astype(np.float32)
    short_win = np.ones(200, dtype=np.float32)
    (y,) = run_graph(
        [P.make_node("STFT", ["x", "step", "win", "flen"], ["y"], onesided=1)],
        {"x": x},
        {
            "step": np.array(256, dtype=np.int64),
            "win": short_win,
            "flen": np.array(256, dtype=np.int64),
        },
        opset=17,
    )
    # equivalent to windowing with [ones(200), zeros(56)]
    ref = np.fft.rfft(x[0, :256] * np.pad(short_win, (0, 56)))
    np.testing.assert_allclose(y[0, 0, :, 0], ref.real, rtol=1e-3, atol=1e-3)


def test_gemm_bias_keeps_fast_policy_dtype(rng):
    from birdnet_tpu.compiler.ops import OpContext, get_lowering
    import jax.numpy as jnp

    a = rng.normal(size=(4, 8)).astype(np.float32)
    b = rng.normal(size=(6, 8)).astype(np.float32)
    c = rng.normal(size=(6,)).astype(np.float32)
    ctx = OpContext("Gemm", {"transB": 1}, precision="fast")
    (y,) = get_lowering("Gemm")(ctx, a, b, c)
    assert y.dtype == jnp.bfloat16


def test_scan_cumulative_sum(rng):
    """Scan body: state' = state + x; scan output = state' (running sum)."""
    body = P.GraphProto(
        name="body",
        node=[
            P.make_node("Add", ["state", "x_t"], ["state_out"]),
            P.make_node("Identity", ["state_out"], ["y_t"]),
        ],
        input=[
            P.make_value_info("state", P.DataType.FLOAT, [3]),
            P.make_value_info("x_t", P.DataType.FLOAT, [3]),
        ],
        output=[
            P.make_value_info("state_out", P.DataType.FLOAT, [3]),
            P.make_value_info("y_t", P.DataType.FLOAT, [3]),
        ],
    )
    x = rng.normal(size=(5, 3)).astype(np.float32)
    init = np.zeros(3, dtype=np.float32)
    final, ys = run_graph(
        [P.make_node("Scan", ["init", "xs"], ["final", "ys"], body=body,
                     num_scan_inputs=1)],
        {"init": init, "xs": x},
        outputs=["final", "ys"],
    )
    np.testing.assert_allclose(final, x.sum(axis=0), rtol=1e-5)
    np.testing.assert_allclose(ys, np.cumsum(x, axis=0), rtol=1e-5)


def test_scan_reverse_direction(rng):
    body = P.GraphProto(
        name="body",
        node=[
            P.make_node("Add", ["state", "x_t"], ["state_out"]),
            P.make_node("Identity", ["state_out"], ["y_t"]),
        ],
        input=[
            P.make_value_info("state", P.DataType.FLOAT, [2]),
            P.make_value_info("x_t", P.DataType.FLOAT, [2]),
        ],
        output=[
            P.make_value_info("state_out", P.DataType.FLOAT, [2]),
            P.make_value_info("y_t", P.DataType.FLOAT, [2]),
        ],
    )
    x = rng.normal(size=(4, 2)).astype(np.float32)
    final, ys = run_graph(
        [P.make_node("Scan", ["init", "xs"], ["final", "ys"], body=body,
                     num_scan_inputs=1,
                     scan_input_directions=[1],
                     scan_output_directions=[1])],
        {"init": np.zeros(2, np.float32), "xs": x},
        outputs=["final", "ys"],
    )
    # reverse cumsum, outputs flipped back
    rev = np.cumsum(x[::-1], axis=0)[::-1]
    np.testing.assert_allclose(ys, rev, rtol=1e-5)
    np.testing.assert_allclose(final, x.sum(axis=0), rtol=1e-5)


def test_fp32_policy_is_strict_float32(rng):
    """The fp32 policy must not let XLA route f32 convs/dots through
    reduced-precision fast paths (XLA-CPU oneDNN fast-math measured 8.0e-3
    absolute error on this exact geometry; TPU's default is a single bf16
    pass). interpret_graph pins jax.default_matmul_precision("highest")
    under fp32, so the error vs a float64 oracle must sit at f32 roundoff
    scale — this asserts ~3 decimal orders below the fast-math failure."""
    x = rng.normal(size=(2, 1, 4000)).astype(np.float32)
    w = rng.normal(size=(16, 1, 10)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Conv", ["x", "w"], ["y"], strides=[5])],
        {"x": x},
        {"w": w},
    )
    t = (4000 - 10) // 5 + 1
    idx = np.arange(t)[:, None] * 5 + np.arange(10)[None, :]
    patches = x[:, 0, :].astype(np.float64)[:, idx]          # [2, t, 10]
    oracle = np.einsum("ntk,ok->not", patches, w[:, 0, :].astype(np.float64))
    assert np.abs(y - oracle).max() < 2e-5

    a = rng.normal(size=(64, 512)).astype(np.float32)
    b = rng.normal(size=(512, 32)).astype(np.float32)
    (ym,) = run_graph([P.make_node("MatMul", ["a", "b"], ["y"])],
                      {"a": a}, {"b": b})
    om = a.astype(np.float64) @ b.astype(np.float64)
    assert np.abs(ym - om).max() < 2e-4  # depth-512 f32 accumulation scale
