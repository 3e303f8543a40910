"""Oracle tests for the LSTM/GRU/RNN lowerings (torch references).

Gate-order mapping: ONNX stores LSTM gates as (i, o, f, c) while torch
uses (i, f, g, o); ONNX GRU uses (z, r, h) while torch uses (r, z, n).
torch's GRU formulation equals ONNX ``linear_before_reset=1``.
"""

import numpy as np
import pytest

from birdnet_tpu.onnx import proto as P
from tests.test_compiler_ops import run_graph

torch = pytest.importorskip("torch")


def _torch_lstm_to_onnx(lstm, bidirectional):
    """(W [D,4H,I], R [D,4H,H], B [D,8H]) in ONNX i,o,f,c order."""
    ws, rs, bs = [], [], []
    suffixes = ["", "_reverse"] if bidirectional else [""]
    for sfx in suffixes:
        w_ih = getattr(lstm, f"weight_ih_l0{sfx}").detach().numpy()
        w_hh = getattr(lstm, f"weight_hh_l0{sfx}").detach().numpy()
        b_ih = getattr(lstm, f"bias_ih_l0{sfx}").detach().numpy()
        b_hh = getattr(lstm, f"bias_hh_l0{sfx}").detach().numpy()
        h = w_hh.shape[1]

        def reorder(m):  # torch i,f,g,o → onnx i,o,f,c(=g)
            i, f, g, o = np.split(m, 4, axis=0)
            return np.concatenate([i, o, f, g], axis=0)

        ws.append(reorder(w_ih))
        rs.append(reorder(w_hh))
        bs.append(np.concatenate([reorder(b_ih), reorder(b_hh)]))
    return (np.stack(ws).astype(np.float32),
            np.stack(rs).astype(np.float32),
            np.stack(bs).astype(np.float32))


@pytest.mark.parametrize("bidirectional", [False, True])
def test_lstm_vs_torch(bidirectional):
    torch.manual_seed(0)
    T, B, I, H = 7, 3, 5, 4
    lstm = torch.nn.LSTM(I, H, bidirectional=bidirectional)
    x = torch.randn(T, B, I)
    y_ref, (h_ref, c_ref) = lstm(x)
    w, r, b = _torch_lstm_to_onnx(lstm, bidirectional)
    dirs = 2 if bidirectional else 1
    y, y_h, y_c = run_graph(
        [P.make_node(
            "LSTM", ["x", "w", "r", "b"], ["y", "y_h", "y_c"],
            hidden_size=H,
            direction="bidirectional" if bidirectional else "forward",
        )],
        {"x": x.numpy()},
        {"w": w, "r": r, "b": b},
        outputs=["y", "y_h", "y_c"],
    )
    assert y.shape == (T, dirs, B, H)
    # torch Y is [T, B, dirs*H] with forward/backward concatenated
    ref = y_ref.detach().numpy().reshape(T, B, dirs, H).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_h, h_ref.detach().numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_c, c_ref.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_lstm_reverse_direction():
    """reverse == bidirectional's backward half."""
    torch.manual_seed(1)
    T, B, I, H = 5, 2, 3, 4
    lstm = torch.nn.LSTM(I, H, bidirectional=True)
    x = torch.randn(T, B, I)
    y_ref, _ = lstm(x)
    w, r, b = _torch_lstm_to_onnx(lstm, True)
    y, y_h, _ = run_graph(
        [P.make_node(
            "LSTM", ["x", "w", "r", "b"], ["y", "y_h", "y_c"],
            hidden_size=H, direction="reverse",
        )],
        {"x": x.numpy()},
        {"w": w[1:], "r": r[1:], "b": b[1:]},
        outputs=["y", "y_h", "y_c"],
    )
    ref_back = y_ref.detach().numpy()[:, :, H:]
    np.testing.assert_allclose(y[:, 0], ref_back, rtol=1e-4, atol=1e-5)


def test_lstm_initial_state_and_layout():
    torch.manual_seed(2)
    T, B, I, H = 4, 2, 3, 5
    lstm = torch.nn.LSTM(I, H)
    x = torch.randn(T, B, I)
    h0 = torch.randn(1, B, H)
    c0 = torch.randn(1, B, H)
    y_ref, _ = lstm(x, (h0, c0))
    w, r, b = _torch_lstm_to_onnx(lstm, False)
    # layout=1: [B, T, I] in, [B, T, dirs, H] out
    y, y_h, y_c = run_graph(
        [P.make_node(
            "LSTM", ["x", "w", "r", "b", "", "h0", "c0"],
            ["y", "y_h", "y_c"], hidden_size=H, layout=1,
        )],
        {"x": x.numpy().transpose(1, 0, 2)},
        {"w": w, "r": r, "b": b,
         "h0": h0.numpy().transpose(1, 0, 2),
         "c0": c0.numpy().transpose(1, 0, 2)},
        outputs=["y", "y_h", "y_c"],
    )
    assert y.shape == (B, T, 1, H)
    ref = y_ref.detach().numpy().transpose(1, 0, 2)[:, :, None, :]
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_lstm_sequence_lens_masking():
    """Past each row's length: Y zeroed, state frozen."""
    torch.manual_seed(3)
    T, B, I, H = 6, 3, 4, 4
    lstm = torch.nn.LSTM(I, H)
    x = torch.randn(T, B, I)
    w, r, b = _torch_lstm_to_onnx(lstm, False)
    lens = np.array([6, 3, 1], np.int32)
    y, y_h, _ = run_graph(
        [P.make_node(
            "LSTM", ["x", "w", "r", "b", "lens"], ["y", "y_h", "y_c"],
            hidden_size=H,
        )],
        {"x": x.numpy()},
        {"w": w, "r": r, "b": b, "lens": lens},
        outputs=["y", "y_h", "y_c"],
    )
    y_full, _ = lstm(x)
    y_full = y_full.detach().numpy()
    for bi, L in enumerate(lens):
        np.testing.assert_allclose(
            y[:L, 0, bi], y_full[:L, bi], rtol=1e-4, atol=1e-5
        )
        assert np.all(y[L:, 0, bi] == 0)
        np.testing.assert_allclose(
            y_h[0, bi], y_full[L - 1, bi], rtol=1e-4, atol=1e-5
        )


@pytest.mark.parametrize("bidirectional", [False, True])
def test_gru_vs_torch(bidirectional):
    torch.manual_seed(4)
    T, B, I, H = 6, 2, 4, 3
    gru = torch.nn.GRU(I, H, bidirectional=bidirectional)
    x = torch.randn(T, B, I)
    y_ref, h_ref = gru(x)
    ws, rs, bs = [], [], []
    for sfx in (["", "_reverse"] if bidirectional else [""]):
        w_ih = getattr(gru, f"weight_ih_l0{sfx}").detach().numpy()
        w_hh = getattr(gru, f"weight_hh_l0{sfx}").detach().numpy()
        b_ih = getattr(gru, f"bias_ih_l0{sfx}").detach().numpy()
        b_hh = getattr(gru, f"bias_hh_l0{sfx}").detach().numpy()

        def reorder(m):  # torch r,z,n → onnx z,r,h(=n)
            rr, zz, nn = np.split(m, 3, axis=0)
            return np.concatenate([zz, rr, nn], axis=0)

        ws.append(reorder(w_ih))
        rs.append(reorder(w_hh))
        bs.append(np.concatenate([reorder(b_ih), reorder(b_hh)]))
    dirs = 2 if bidirectional else 1
    y, y_h = run_graph(
        [P.make_node(
            "GRU", ["x", "w", "r", "b"], ["y", "y_h"],
            hidden_size=H, linear_before_reset=1,  # torch's formulation
            direction="bidirectional" if bidirectional else "forward",
        )],
        {"x": x.numpy()},
        {"w": np.stack(ws).astype(np.float32),
         "r": np.stack(rs).astype(np.float32),
         "b": np.stack(bs).astype(np.float32)},
        outputs=["y", "y_h"],
    )
    ref = y_ref.detach().numpy().reshape(T, B, dirs, H).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_h, h_ref.detach().numpy(), rtol=1e-4, atol=1e-5)


def test_gru_linear_before_reset_zero_differs():
    """lbr=0 (the ONNX default) is a different formulation from torch's;
    sanity-check it runs and differs when biases are nonzero."""
    rng = np.random.default_rng(0)
    T, B, I, H = 4, 2, 3, 3
    x = rng.normal(size=(T, B, I)).astype(np.float32)
    w = rng.normal(size=(1, 3 * H, I)).astype(np.float32)
    r = rng.normal(size=(1, 3 * H, H)).astype(np.float32)
    b = rng.normal(size=(1, 6 * H)).astype(np.float32)
    outs = {}
    for lbr in (0, 1):
        y, _ = run_graph(
            [P.make_node("GRU", ["x", "w", "r", "b"], ["y", "y_h"],
                         hidden_size=H, linear_before_reset=lbr)],
            {"x": x}, {"w": w, "r": r, "b": b}, outputs=["y", "y_h"],
        )
        outs[lbr] = y
    assert np.isfinite(outs[0]).all() and np.isfinite(outs[1]).all()
    assert np.abs(outs[0] - outs[1]).max() > 1e-4


def test_rnn_vs_torch():
    torch.manual_seed(5)
    T, B, I, H = 5, 2, 3, 4
    rnn = torch.nn.RNN(I, H)  # tanh
    x = torch.randn(T, B, I)
    y_ref, h_ref = rnn(x)
    w = rnn.weight_ih_l0.detach().numpy()[None]
    r = rnn.weight_hh_l0.detach().numpy()[None]
    b = np.concatenate(
        [rnn.bias_ih_l0.detach().numpy(), rnn.bias_hh_l0.detach().numpy()]
    )[None]
    y, y_h = run_graph(
        [P.make_node("RNN", ["x", "w", "r", "b"], ["y", "y_h"],
                     hidden_size=H)],
        {"x": x.numpy()},
        {"w": w.astype(np.float32), "r": r.astype(np.float32),
         "b": b.astype(np.float32)},
        outputs=["y", "y_h"],
    )
    np.testing.assert_allclose(
        y[:, 0], y_ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        y_h, h_ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def test_rnn_relu_activation():
    torch.manual_seed(6)
    T, B, I, H = 4, 2, 3, 4
    rnn = torch.nn.RNN(I, H, nonlinearity="relu")
    x = torch.randn(T, B, I) * 0.3
    y_ref, _ = rnn(x)
    w = rnn.weight_ih_l0.detach().numpy()[None].astype(np.float32)
    r = rnn.weight_hh_l0.detach().numpy()[None].astype(np.float32)
    b = np.concatenate(
        [rnn.bias_ih_l0.detach().numpy(), rnn.bias_hh_l0.detach().numpy()]
    )[None].astype(np.float32)
    y, _ = run_graph(
        [P.make_node("RNN", ["x", "w", "r", "b"], ["y", "y_h"],
                     hidden_size=H, activations=["Relu"])],
        {"x": x.numpy()}, {"w": w, "r": r, "b": b}, outputs=["y", "y_h"],
    )
    np.testing.assert_allclose(
        y[:, 0], y_ref.detach().numpy(), rtol=1e-4, atol=1e-5
    )


def _numpy_lstm_peephole(x, w, r, b, p, h0, c0):
    """Independent oracle: ONNX LSTM equations with peepholes (spec order
    i,o,f,c; P = [Pi, Po, Pf]). Forward, single direction, batch-first
    loops — deliberately naive."""
    T, B, _ = x.shape
    H = r.shape[-1]
    wd, rd, bd, pd = w[0], r[0], b[0], p[0]
    wb, rb = bd[: 4 * H], bd[4 * H:]
    p_i, p_o, p_f = pd[:H], pd[H:2 * H], pd[2 * H:]
    sig = lambda v: 1.0 / (1.0 + np.exp(-v))
    h, c = h0.copy(), c0.copy()
    ys = np.zeros((T, B, H), np.float64)
    for t in range(T):
        g = x[t] @ wd.T + h @ rd.T + wb + rb  # [B, 4H], order i,o,f,c
        gi, go, gf, gc = g[:, :H], g[:, H:2*H], g[:, 2*H:3*H], g[:, 3*H:]
        i_g = sig(gi + p_i * c)
        f_g = sig(gf + p_f * c)
        c = f_g * c + i_g * np.tanh(gc)
        o_g = sig(go + p_o * c)
        h = o_g * np.tanh(c)
        ys[t] = h
    return ys, h, c


def test_lstm_peepholes_vs_numpy_oracle():
    rng = np.random.default_rng(7)
    T, B, I, H = 6, 2, 3, 4
    x = rng.normal(size=(T, B, I)).astype(np.float32)
    w = rng.normal(size=(1, 4 * H, I)).astype(np.float32) * 0.5
    r = rng.normal(size=(1, 4 * H, H)).astype(np.float32) * 0.5
    b = rng.normal(size=(1, 8 * H)).astype(np.float32) * 0.1
    p = rng.normal(size=(1, 3 * H)).astype(np.float32) * 0.5
    y, y_h, y_c = run_graph(
        [P.make_node(
            "LSTM", ["x", "w", "r", "b", "", "", "", "p"],
            ["y", "y_h", "y_c"], hidden_size=H,
        )],
        {"x": x},
        {"w": w, "r": r, "b": b, "p": p},
        outputs=["y", "y_h", "y_c"],
    )
    ys, h_f, c_f = _numpy_lstm_peephole(
        x.astype(np.float64), w, r, b, p,
        np.zeros((B, H)), np.zeros((B, H)),
    )
    np.testing.assert_allclose(y[:, 0], ys, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_h[0], h_f, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(y_c[0], c_f, rtol=1e-4, atol=1e-5)
    # zero peepholes must equal the no-P path exactly
    y0, _, _ = run_graph(
        [P.make_node(
            "LSTM", ["x", "w", "r", "b", "", "", "", "p"],
            ["y", "y_h", "y_c"], hidden_size=H,
        )],
        {"x": x},
        {"w": w, "r": r, "b": b, "p": np.zeros((1, 3 * H), np.float32)},
        outputs=["y", "y_h", "y_c"],
    )
    yn, _, _ = run_graph(
        [P.make_node("LSTM", ["x", "w", "r", "b"], ["y", "y_h", "y_c"], hidden_size=H)],
        {"x": x},
        {"w": w, "r": r, "b": b},
        outputs=["y", "y_h", "y_c"],
    )
    np.testing.assert_allclose(y0, yn, rtol=1e-6)


@pytest.mark.parametrize("act,alpha,beta", [
    ("Affine", 0.5, 0.25),
    ("ScaledTanh", 1.5, 0.8),
    ("ThresholdedRelu", 0.3, None),
])
def test_rnn_spec_activations_vs_numpy(act, alpha, beta):
    """The spec's long-tail RNN activations (Affine/ScaledTanh/
    ThresholdedRelu) against a direct numpy recurrence."""
    r = np.random.default_rng(7)
    T, B, I, H = 4, 2, 3, 4
    x = (r.standard_normal((T, B, I)) * 0.5).astype(np.float32)
    w = (r.standard_normal((1, H, I)) * 0.4).astype(np.float32)
    rr = (r.standard_normal((1, H, H)) * 0.4).astype(np.float32)
    b = (r.standard_normal((1, 2 * H)) * 0.1).astype(np.float32)

    def f(v):
        if act == "Affine":
            return alpha * v + beta
        if act == "ScaledTanh":
            return alpha * np.tanh(beta * v)
        return np.where(v > alpha, v, 0.0)

    attrs = dict(hidden_size=H, activations=[act])
    if alpha is not None:
        attrs["activation_alpha"] = [alpha]
    if beta is not None:
        attrs["activation_beta"] = [beta]
    (y,) = run_graph(
        [P.make_node("RNN", ["x", "w", "r", "b"], ["y"], **attrs)],
        {"x": x},
        {"w": w, "r": rr, "b": b},
        outputs=["y"],
    )
    h = np.zeros((B, H), np.float32)
    for t in range(T):
        h = f(x[t] @ w[0].T + h @ rr[0].T + b[0, :H] + b[0, H:])
        np.testing.assert_allclose(y[t, 0], h, rtol=1e-4, atol=1e-5)
