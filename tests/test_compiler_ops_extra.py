"""Oracle tests for the remaining op lowerings."""

import numpy as np
import pytest

from birdnet_tpu.onnx import proto as P
from tests.test_compiler_ops import run_graph

torch = pytest.importorskip("torch")


def test_lrn_vs_torch(rng):
    x = rng.normal(size=(2, 8, 6, 6)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("LRN", ["x"], ["y"], size=5, alpha=1e-3, beta=0.75, bias=1.5)],
        {"x": x},
    )
    expected = torch.nn.functional.local_response_norm(
        torch.from_numpy(x), 5, alpha=1e-3, beta=0.75, k=1.5
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-4, atol=1e-5)


def test_resize_nearest_scales(rng):
    x = rng.normal(size=(1, 2, 4, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Resize", ["x", "", "scales"], ["y"], mode="nearest")],
        {"x": x},
        {"scales": np.array([1.0, 1.0, 2.0, 2.0], dtype=np.float32)},
    )
    assert y.shape == (1, 2, 8, 8)
    # each input pixel appears in a 2x2 block
    np.testing.assert_allclose(y[0, 0, ::2, ::2], x[0, 0], rtol=1e-6)


def test_resize_linear_sizes(rng):
    x = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Resize", ["x", "", "", "sizes"], ["y"], mode="linear")],
        {"x": x},
        {"sizes": np.array([1, 1, 8, 8], dtype=np.int64)},
    )
    assert y.shape == (1, 1, 8, 8)
    assert np.isfinite(y).all()


def test_depth_to_space_modes(rng):
    x = rng.normal(size=(1, 8, 4, 6)).astype(np.float32)
    # CRD mode is exactly torch.pixel_shuffle
    (crd,) = run_graph(
        [P.make_node("DepthToSpace", ["x"], ["y"], blocksize=2, mode="CRD")], {"x": x}
    )
    expected = torch.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    np.testing.assert_allclose(crd, expected, rtol=1e-6)
    # DCR mode per the ONNX formula: out[n,c,h*b+i,w*b+j] = in[n,(i*b+j)*C'+c,h,w]
    (dcr,) = run_graph(
        [P.make_node("DepthToSpace", ["x"], ["y"], blocksize=2, mode="DCR")], {"x": x}
    )
    b, c_out = 2, 2
    for i in range(b):
        for j in range(b):
            np.testing.assert_allclose(
                dcr[0, :, i::b, j::b], x[0, (i * b + j) * c_out:(i * b + j + 1) * c_out]
            )


def test_space_to_depth_roundtrip(rng):
    x = rng.normal(size=(1, 2, 8, 12)).astype(np.float32)
    (s,) = run_graph([P.make_node("SpaceToDepth", ["x"], ["y"], blocksize=2)], {"x": x})
    assert s.shape == (1, 8, 4, 6)
    (back,) = run_graph(
        [P.make_node("DepthToSpace", ["x"], ["y"], blocksize=2, mode="DCR")], {"x": s}
    )
    np.testing.assert_allclose(back, x)


def test_groupnorm_vs_torch(rng):
    x = rng.normal(size=(2, 8, 5, 5)).astype(np.float32)
    s = rng.normal(size=(8,)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("GroupNormalization", ["x", "s", "b"], ["y"], num_groups=4, epsilon=1e-5)],
        {"x": x},
        {"s": s, "b": b},
        opset=21,
    )
    expected = torch.nn.functional.group_norm(
        torch.from_numpy(x), 4, torch.from_numpy(s), torch.from_numpy(b), 1e-5
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-3, atol=1e-4)


def test_einsum(rng):
    a = rng.normal(size=(3, 4, 5)).astype(np.float32)
    b = rng.normal(size=(5, 6)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Einsum", ["a", "b"], ["y"], equation="bij,jk->bik")],
        {"a": a, "b": b},
    )
    np.testing.assert_allclose(y, np.einsum("bij,jk->bik", a, b), rtol=1e-4, atol=1e-5)


def test_cumsum_variants(rng):
    x = rng.normal(size=(3, 5)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("CumSum", ["x", "ax"], ["y"])],
        {"x": x}, {"ax": np.array(1, dtype=np.int64)},
    )
    np.testing.assert_allclose(y, np.cumsum(x, axis=1), rtol=1e-5)
    (y,) = run_graph(
        [P.make_node("CumSum", ["x", "ax"], ["y"], exclusive=1, reverse=1)],
        {"x": x}, {"ax": np.array(1, dtype=np.int64)},
    )
    ref = np.flip(np.cumsum(np.flip(x, 1), axis=1) - np.flip(x, 1), 1)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_onehot():
    idx = np.array([0, 2, 1], dtype=np.int64)
    (y,) = run_graph(
        [P.make_node("OneHot", ["i", "d", "v"], ["y"], axis=-1)],
        {"i": idx},
        {"d": np.array(4, dtype=np.int64),
         "v": np.array([0.0, 1.0], dtype=np.float32)},
    )
    np.testing.assert_allclose(y, np.eye(4, dtype=np.float32)[idx])


def test_selu_mish_softsign_hardsigmoid_vs_torch(rng):
    x = rng.normal(size=(4, 7)).astype(np.float32)
    (y,) = run_graph([P.make_node("Selu", ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(y, torch.selu(torch.from_numpy(x)).numpy(), rtol=1e-5, atol=1e-6)
    (y,) = run_graph([P.make_node("Mish", ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(
        y, torch.nn.functional.mish(torch.from_numpy(x)).numpy(), rtol=1e-4, atol=1e-5
    )
    (y,) = run_graph([P.make_node("Softsign", ["x"], ["y"])], {"x": x})
    np.testing.assert_allclose(
        y, torch.nn.functional.softsign(torch.from_numpy(x)).numpy(), rtol=1e-5
    )
    (y,) = run_graph([P.make_node("HardSigmoid", ["x"], ["y"],
                                  alpha=1 / 6, beta=0.5)], {"x": x})
    np.testing.assert_allclose(
        y, torch.nn.functional.hardsigmoid(torch.from_numpy(x)).numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_gelu_vs_torch(rng):
    x = rng.normal(size=(3, 9)).astype(np.float32)
    (y,) = run_graph([P.make_node("Gelu", ["x"], ["y"])], {"x": x}, opset=20)
    np.testing.assert_allclose(
        y, torch.nn.functional.gelu(torch.from_numpy(x)).numpy(), rtol=1e-4, atol=1e-5
    )
    (y,) = run_graph([P.make_node("Gelu", ["x"], ["y"], approximate="tanh")], {"x": x}, opset=20)
    np.testing.assert_allclose(
        y, torch.nn.functional.gelu(torch.from_numpy(x), approximate="tanh").numpy(),
        rtol=1e-4, atol=1e-5,
    )


def test_tile_where_range(rng):
    x = rng.normal(size=(2, 3)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Tile", ["x", "r"], ["y"])],
        {"x": x}, {"r": np.array([2, 3], dtype=np.int64)},
    )
    np.testing.assert_array_equal(y, np.tile(x, (2, 3)))
    (y,) = run_graph(
        [P.make_node("Where", ["c", "a", "b"], ["y"])],
        {"c": x > 0, "a": x, "b": -x},
    )
    np.testing.assert_allclose(y, np.abs(x))
    (y,) = run_graph(
        [P.make_node("Range", ["s", "l", "d"], ["y"])],
        {},
        {"s": np.array(2, dtype=np.int64), "l": np.array(11, dtype=np.int64),
         "d": np.array(3, dtype=np.int64)},
    )
    np.testing.assert_array_equal(y, np.arange(2, 11, 3))


def test_mod_and_logic(rng):
    a = np.array([5, -5, 7], dtype=np.int32)
    b = np.array([3, 3, -4], dtype=np.int32)
    (y,) = run_graph([P.make_node("Mod", ["a", "b"], ["y"])], {"a": a, "b": b})
    np.testing.assert_array_equal(y, np.mod(a, b))
    p = np.array([True, False, True])
    q = np.array([True, True, False])
    (y,) = run_graph([P.make_node("Xor", ["p", "q"], ["y"])], {"p": p, "q": q})
    np.testing.assert_array_equal(y, p ^ q)


def test_gather_elements_vs_torch(rng):
    x = rng.normal(size=(3, 4)).astype(np.float32)
    idx = rng.integers(0, 4, size=(3, 2)).astype(np.int64)
    (y,) = run_graph(
        [P.make_node("GatherElements", ["x", "i"], ["y"], axis=1)],
        {"x": x, "i": idx},
    )
    expected = torch.gather(torch.from_numpy(x), 1, torch.from_numpy(idx)).numpy()
    np.testing.assert_allclose(y, expected)


def test_reduce_l2_logsumexp(rng):
    x = rng.normal(size=(3, 6)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("ReduceL2", ["x"], ["y"], axes=[1], keepdims=0)], {"x": x}, opset=13
    )
    np.testing.assert_allclose(y, np.linalg.norm(x, axis=1), rtol=1e-5)
    (y,) = run_graph(
        [P.make_node("ReduceLogSumExp", ["x"], ["y"], axes=[1], keepdims=0)], {"x": x}, opset=13
    )
    from scipy.special import logsumexp

    np.testing.assert_allclose(y, logsumexp(x, axis=1), rtol=1e-5)


def test_softmax_opset11_flatten_semantics(rng):
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    (y,) = run_graph([P.make_node("Softmax", ["x"], ["y"], axis=1)], {"x": x}, opset=11)
    flat = x.reshape(2, 12)
    e = np.exp(flat - flat.max(axis=1, keepdims=True))
    ref = (e / e.sum(axis=1, keepdims=True)).reshape(2, 3, 4)
    np.testing.assert_allclose(y, ref, rtol=1e-5, atol=1e-6)


def test_gather_nd(rng):
    x = rng.normal(size=(3, 4, 5)).astype(np.float32)
    idx = np.array([[0, 1], [2, 3]], dtype=np.int64)  # -> [2, 5]
    (y,) = run_graph([P.make_node("GatherND", ["x", "i"], ["y"])], {"x": x, "i": idx})
    np.testing.assert_allclose(y, np.stack([x[0, 1], x[2, 3]]))
    # full-depth indices -> scalars
    idx3 = np.array([[0, 1, 2], [2, 3, 4]], dtype=np.int64)
    (y,) = run_graph([P.make_node("GatherND", ["x", "i"], ["y"])], {"x": x, "i": idx3})
    np.testing.assert_allclose(y, [x[0, 1, 2], x[2, 3, 4]])


def test_scatter_elements_vs_torch(rng):
    x = rng.normal(size=(3, 5)).astype(np.float32)
    idx = rng.integers(0, 5, size=(3, 2)).astype(np.int64)
    upd = rng.normal(size=(3, 2)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("ScatterElements", ["x", "i", "u"], ["y"], axis=1)],
        {"x": x, "i": idx, "u": upd},
    )
    expected = torch.from_numpy(x.copy()).scatter_(
        1, torch.from_numpy(idx), torch.from_numpy(upd)
    ).numpy()
    np.testing.assert_allclose(y, expected)


def test_scatter_elements_add(rng):
    x = np.zeros((2, 4), dtype=np.float32)
    idx = np.array([[1, 1], [0, 3]], dtype=np.int64)
    upd = np.ones((2, 2), dtype=np.float32)
    (y,) = run_graph(
        [P.make_node("ScatterElements", ["x", "i", "u"], ["y"], axis=1,
                     reduction="add")],
        {"x": x, "i": idx, "u": upd},
        opset=18,
    )
    expected = np.array([[0, 2, 0, 0], [1, 0, 0, 1]], dtype=np.float32)
    np.testing.assert_allclose(y, expected)


def test_scatter_nd(rng):
    x = np.zeros((4, 3), dtype=np.float32)
    idx = np.array([[1], [3]], dtype=np.int64)
    upd = np.array([[1, 2, 3], [4, 5, 6]], dtype=np.float32)
    (y,) = run_graph(
        [P.make_node("ScatterND", ["x", "i", "u"], ["y"])],
        {"x": x, "i": idx, "u": upd},
    )
    expected = x.copy()
    expected[1] = [1, 2, 3]
    expected[3] = [4, 5, 6]
    np.testing.assert_allclose(y, expected)


def test_upsample_legacy_input_scales(rng):
    """Deprecated Upsample (opset 9/10 spelling: scales as input)."""
    x = rng.normal(size=(1, 2, 4, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Upsample", ["x", "scales"], ["y"], mode="nearest")],
        {"x": x},
        {"scales": np.array([1.0, 1.0, 2.0, 2.0], dtype=np.float32)},
        opset=10,
    )
    assert y.shape == (1, 2, 8, 8)
    np.testing.assert_allclose(y[0, 0, ::2, ::2], x[0, 0], rtol=1e-6)


def test_upsample_legacy_attr_scales_bilinear(rng):
    """Opset 7 spelling (attribute scales), ASYMMETRIC linear coordinates
    (the legacy semantics ORT implements for Upsample): out[i] lerps
    between floor(i/scale) and its neighbor with weight frac(i/scale)."""
    x = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Upsample", ["x"], ["y"], mode="bilinear",
                     scales=[1.0, 1.0, 2.0, 2.0])],
        {"x": x},
        opset=9,
    )
    assert y.shape == (1, 1, 8, 8)

    def up1d(a, scale):
        d_out = int(a.shape[-1] * scale)
        src = np.arange(d_out) / scale
        lo = np.clip(np.floor(src).astype(int), 0, a.shape[-1] - 1)
        hi = np.minimum(lo + 1, a.shape[-1] - 1)
        w = (src - lo).astype(np.float32)
        return a[..., lo] * (1 - w) + a[..., hi] * w

    expected = up1d(np.swapaxes(up1d(np.swapaxes(x, -1, -2), 2.0), -1, -2), 2.0)
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_upsample_fractional_scale_uses_original_scale(rng):
    """Scale 1.7 on dim 5: d_out = floor(5*1.7) = 8, and the asymmetric
    mapping must use floor(i/1.7), NOT floor(i*5/8) — the two disagree at
    i=5 (2 vs 3). Matches torch's floor(i/scale) nearest semantics."""
    x = rng.normal(size=(1, 1, 5, 5)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Upsample", ["x", "scales"], ["y"], mode="nearest")],
        {"x": x},
        {"scales": np.array([1.0, 1.0, 1.7, 1.7], dtype=np.float32)},
        opset=10,
    )
    assert y.shape == (1, 1, 8, 8)
    src = np.floor(np.arange(8) / 1.7).astype(int)
    expected = x[:, :, src][:, :, :, src]
    np.testing.assert_allclose(y, expected, rtol=1e-6)
    # and the ratio-based mapping would differ at index 5
    ratio = np.floor(np.arange(8) * (5 / 8)).astype(int)
    assert not np.array_equal(src, ratio)


def test_upsample_nearest_noninteger_scale_vs_torch(rng):
    """Nearest with scale 1.5 must floor (asymmetric), matching torch's
    F.interpolate(mode='nearest')."""
    x = rng.normal(size=(1, 1, 4, 4)).astype(np.float32)
    (y,) = run_graph(
        [P.make_node("Upsample", ["x", "scales"], ["y"], mode="nearest")],
        {"x": x},
        {"scales": np.array([1.0, 1.0, 1.5, 1.5], dtype=np.float32)},
        opset=10,
    )
    expected = torch.nn.functional.interpolate(
        torch.from_numpy(x), scale_factor=1.5, mode="nearest"
    ).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-6)


def test_logsoftmax_legacy_2d_coercion(rng):
    """Opset < 13 LogSoftmax flattens from axis and normalizes over the tail
    (same 2-D coercion as legacy Softmax), not per-axis."""
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    (y,) = run_graph([P.make_node("LogSoftmax", ["x"], ["y"], axis=1)], {"x": x}, opset=11)
    flat = torch.from_numpy(x).reshape(2, -1)
    expected = torch.nn.functional.log_softmax(flat, dim=1).reshape(x.shape).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_logsoftmax_opset13_per_axis(rng):
    x = rng.normal(size=(2, 3, 4)).astype(np.float32)
    (y,) = run_graph([P.make_node("LogSoftmax", ["x"], ["y"], axis=1)], {"x": x}, opset=13)
    expected = torch.nn.functional.log_softmax(torch.from_numpy(x), dim=1).numpy()
    np.testing.assert_allclose(y, expected, rtol=1e-5, atol=1e-6)


def test_pad_legacy_value_attribute():
    """Opset < 11 Pad carries pads + fill value as attributes."""
    x = np.ones((2, 2), np.float32)
    (y,) = run_graph(
        [P.make_node("Pad", ["x"], ["y"], pads=[1, 0, 0, 1], value=5.0, mode="constant")],
        {"x": x},
        opset=10,
    )
    expected = np.pad(x, [(1, 0), (0, 1)], constant_values=5.0)
    np.testing.assert_allclose(y, expected)


def test_topk_legacy_k_attribute(rng):
    """Opset < 10 TopK carries k as a required attribute, not an input."""
    x = rng.normal(size=(2, 8)).astype(np.float32)
    vals, idx = run_graph(
        [P.make_node("TopK", ["x"], ["v", "i"], k=3, axis=1)],
        {"x": x},
        outputs=["v", "i"],
        opset=9,
    )
    ev, ei = torch.topk(torch.from_numpy(x), 3, dim=1)
    np.testing.assert_allclose(vals, ev.numpy(), rtol=1e-6)
    np.testing.assert_array_equal(idx, ei.numpy().astype(np.int64))


def test_topk_legacy_missing_k_attribute_typed_error(rng):
    """Opset < 10 TopK without the required k attribute raises a typed
    error naming the op, not a raw int(None) TypeError."""
    x = rng.normal(size=(2, 8)).astype(np.float32)
    with pytest.raises(Exception, match="TopK.*requires the k attribute"):
        run_graph(
            [P.make_node("TopK", ["x"], ["v", "i"], axis=1)],
            {"x": x},
            outputs=["v", "i"],
            opset=9,
        )
