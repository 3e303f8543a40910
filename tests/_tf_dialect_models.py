"""Full-architecture TF-export-dialect models, written by the independent
wire-writer (tests/_tf_wire.py) — bytes that never touch the repo encoder.

These are the exact graph idioms the REAL TF-exported BirdNET v2.4 /
v3.0 / Perch v2 files carry (docs/performance.md "STFT-form frontends";
reference loads them at src/classifier.rs:348-350):

- STFT -> power -> MelWeightMatrix -> log frontend as in-graph signal ops
  (window + frame_step as initializers, onesided)
- NHWC data layout with Transpose sandwiches around NCHW Conv blocks
  (tf2onnx's conv handling), one block with BatchNormalization + MaxPool
  inside the NCHW region
- auto_pad=SAME_UPPER everywhere (TF "SAME" padding)
- opset-13+ axes-as-INPUTS for Squeeze/Unsqueeze/ReduceSum
- the TF-style dynamic flatten chain Shape -> Gather -> Unsqueeze ->
  Concat([-1]) -> Reshape
- SiLU spelled as Sigmoid + Mul, global pooling as ReduceMean over the
  NHWC spatial axes, dense heads as MatMul[in,out] + Add
- TF SavedModel-style tensor names with ":0" suffixes

The oracle (``TfOracle``) re-computes everything independently:
float64 numpy rfft for the STFT, a per-column loop transcription of the
ONNX MelWeightMatrix spec, and torch float32 for the conv/dense stack —
no birdnet_tpu code anywhere in the forward path.
"""

from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

import _tf_wire as W

FLEN = 1024


# ---------------------------------------------------------------------------
# independent oracle pieces
# ---------------------------------------------------------------------------

def mel_matrix_oracle(n_mels, dft, sr, fmin, fmax):
    """ONNX MelWeightMatrix spec, transcribed per-column (HTK mel scale,
    continuous triangular filters — TF linear_to_mel_weight_matrix)."""
    nbins = dft // 2 + 1

    def to_mel(f):
        return 2595.0 * np.log10(1.0 + f / 700.0)

    edges = np.linspace(to_mel(fmin), to_mel(fmax), n_mels + 2)
    bin_mels = to_mel(np.arange(nbins) * sr / float(dft))
    out = np.zeros((nbins, n_mels))
    for m in range(n_mels):
        lo, ce, hi = edges[m], edges[m + 1], edges[m + 2]
        for k in range(nbins):
            up = (bin_mels[k] - lo) / max(ce - lo, 1e-12)
            dn = (hi - bin_mels[k]) / max(hi - ce, 1e-12)
            out[k, m] = max(0.0, min(up, dn))
    return out.astype(np.float32)


def _same_upper_pad(size, kernel, stride):
    """TF 'SAME' padding split: extra padding goes at the END
    (ONNX auto_pad=SAME_UPPER)."""
    out = -(-size // stride)
    total = max((out - 1) * stride + kernel - size, 0)
    return total // 2, total - total // 2


class TfOracle:
    """Independent forward pass for a built TF-dialect model."""

    def __init__(self, weights, meta):
        self.w = weights
        self.meta = meta

    def frontend(self, x):
        """[N, S] float32 -> log-mel [N, T, M] float32."""
        m = self.meta
        hop, sr, n_mels = m["hop"], m["sr"], m["n_mels"]
        n, s = x.shape
        t = (s - FLEN) // hop + 1
        hann = self.w["hann"].astype(np.float64)
        frames = np.stack(
            [x[:, i * hop: i * hop + FLEN].astype(np.float64) for i in range(t)],
            axis=1,
        )  # [N, T, FLEN]
        spec = np.fft.rfft(frames * hann, axis=-1)  # [N, T, 513]
        power = (spec.real.astype(np.float32) ** 2
                 + spec.imag.astype(np.float32) ** 2)
        mel = mel_matrix_oracle(n_mels, FLEN, sr, m["fmin"], m["fmax"])
        melspec = power.astype(np.float32) @ mel
        return np.log(melspec + np.float32(1e-6))

    def backbone(self, logmel):
        """log-mel [N, T, M] -> (act NHWC [N,h,w,c2], pooled [N,c2],
        flat [N,F])."""
        w = {k: torch.from_numpy(v) for k, v in self.w.items()
             if isinstance(self.w[k], np.ndarray)}
        img = torch.from_numpy(logmel)[..., None]  # NHWC [N, T, M, 1]
        x = img.permute(0, 3, 1, 2)  # NCHW

        def conv_same(x, kernel, stride, bias=None):
            _, _, h, wd = x.shape
            pt, pb = _same_upper_pad(h, kernel.shape[2], stride)
            pl, pr = _same_upper_pad(wd, kernel.shape[3], stride)
            x = F.pad(x, (pl, pr, pt, pb))
            return F.conv2d(x, kernel, bias, stride=stride)

        x = conv_same(x, w["W1"], 2, w["B1"])
        x = F.relu(x)
        x = x.permute(0, 2, 3, 1).permute(0, 3, 1, 2)  # sandwich round-trip
        x = conv_same(x, w["W2"], 2)
        x = (x - w["bn_mean"][None, :, None, None]) \
            / torch.sqrt(w["bn_var"][None, :, None, None] + 1e-3) \
            * w["bn_scale"][None, :, None, None] \
            + w["bn_bias"][None, :, None, None]
        _, _, h, wd = x.shape
        pt, pb = _same_upper_pad(h, 2, 2)
        pl, pr = _same_upper_pad(wd, 2, 2)
        x = F.pad(x, (pl, pr, pt, pb), value=float("-inf"))
        x = F.max_pool2d(x, 2, 2)
        act = x.permute(0, 2, 3, 1)  # NHWC
        act = act * torch.sigmoid(act)
        pooled = act.mean(dim=(1, 2))
        flat = act.reshape(act.shape[0], -1)
        return act, pooled, flat

    def forward(self, x):
        """[N, S] -> ordered graph outputs (numpy float32)."""
        m = self.meta
        logmel = self.frontend(np.asarray(x, np.float32))
        act, pooled, flat = self.backbone(logmel)
        w = self.w
        logits = (flat @ torch.from_numpy(w["Wl"])
                  + torch.from_numpy(w["bl"])).numpy()
        if m["family"] == "v24":
            return [logits]
        emb = (pooled @ torch.from_numpy(w["We"])
               + torch.from_numpy(w["be"])).numpy()
        if m["family"] == "v30":
            return [emb, logits]
        spatial = (act @ torch.from_numpy(w["Wse"])).numpy()
        return [emb, spatial, logmel, logits]


# ---------------------------------------------------------------------------
# the TF-dialect graph, emitted through the independent writer
# ---------------------------------------------------------------------------

def build_tf_dialect_model(family, num_species, seed=0, n_mels=40,
                           c1=8, c2=16, emb_dim=24, spatial_dim=8):
    """Returns (model_bytes, TfOracle). ``family`` in {v24, v30, perch}."""
    rng = np.random.default_rng(seed)
    if family == "v24":
        s, sr, hop = 144_000, 48_000, 280
    else:
        s, sr, hop = 160_000, 32_000, 280
    t = (s - FLEN) // hop + 1
    t3 = -(-(-(-t // 2) // 2) // 2)       # three SAME /2 stages
    m3 = -(-(-(-n_mels // 2) // 2) // 2)
    flat_dim = t3 * m3 * c2
    fmin, fmax = 150.0, 15_000.0

    def rand(*shape, scale=None):
        fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        scale = scale if scale is not None else 1.0 / np.sqrt(max(fan_in, 1))
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    hann = (0.5 - 0.5 * np.cos(
        2.0 * np.pi * np.arange(FLEN) / FLEN)).astype(np.float32)
    weights = dict(
        hann=hann,
        W1=rand(c1, 1, 3, 3), B1=rand(c1),
        W2=rand(c2, c1, 3, 3),
        bn_scale=(rng.uniform(0.5, 1.5, c2)).astype(np.float32),
        bn_bias=rand(c2),
        bn_mean=rand(c2),
        bn_var=(rng.uniform(0.5, 2.0, c2)).astype(np.float32),
        Wl=rand(flat_dim, num_species), bl=rand(num_species),
        We=rand(c2, emb_dim), be=rand(emb_dim),
        Wse=rand(c2, spatial_dim),
    )

    i64 = lambda name, v: W.tensor(name, np.asarray(v, np.int64))  # noqa: E731
    f32 = lambda name, v: W.tensor(name, np.asarray(v, np.float32))  # noqa: E731

    inits = [
        i64("stft/frame_step", hop),
        f32("stft/hann_window", hann),
        i64("power/reduce_axes", [-1]),
        i64("mel/num_mel_bins", n_mels),
        i64("mel/dft_length", FLEN),
        i64("mel/sample_rate", sr),
        f32("mel/lower_edge_hertz", fmin),
        f32("mel/upper_edge_hertz", fmax),
        f32("log/eps", 1e-6),
        i64("img/unsqueeze_axes", [3]),
        f32("conv1/W", weights["W1"]),
        f32("conv1/B", weights["B1"]),
        f32("conv2/W", weights["W2"]),
        f32("bn/scale", weights["bn_scale"]),
        f32("bn/bias", weights["bn_bias"]),
        f32("bn/mean", weights["bn_mean"]),
        f32("bn/var", weights["bn_var"]),
        i64("flatten/gather_idx", 0),
        i64("flatten/unsqueeze_axes", [0]),
        i64("flatten/neg_one", [-1]),
        f32("head/W", weights["Wl"]),
        f32("head/b", weights["bl"]),
    ]

    x_in = "serving_default_inputs:0"
    nodes = [
        # frontend: STFT -> Mul/ReduceSum power -> MelWeightMatrix -> Log
        W.node("STFT", [x_in, "stft/frame_step", "stft/hann_window"],
               ["stft:0"], W.attr_i("onesided", 1)),
        W.node("Mul", ["stft:0", "stft:0"], ["power/sq:0"]),
        W.node("ReduceSum", ["power/sq:0", "power/reduce_axes"],
               ["power:0"], W.attr_i("keepdims", 0)),
        W.node("MelWeightMatrix",
               ["mel/num_mel_bins", "mel/dft_length", "mel/sample_rate",
                "mel/lower_edge_hertz", "mel/upper_edge_hertz"],
               ["mel/matrix:0"]),
        W.node("MatMul", ["power:0", "mel/matrix:0"], ["mel/spec:0"]),
        W.node("Add", ["mel/spec:0", "log/eps"], ["log/stable:0"]),
        W.node("Log", ["log/stable:0"], ["logmel:0"]),
        W.node("Unsqueeze", ["logmel:0", "img/unsqueeze_axes"],
               ["img_nhwc:0"]),
        # conv block 1: NHWC -> NCHW sandwich, SAME_UPPER
        W.node("Transpose", ["img_nhwc:0"], ["conv1/pre:0"],
               W.attr_ints("perm", [0, 3, 1, 2])),
        W.node("Conv", ["conv1/pre:0", "conv1/W", "conv1/B"],
               ["conv1/out:0"],
               W.attr_s("auto_pad", "SAME_UPPER"),
               W.attr_ints("strides", [2, 2]),
               W.attr_ints("kernel_shape", [3, 3])),
        W.node("Relu", ["conv1/out:0"], ["conv1/relu:0"]),
        W.node("Transpose", ["conv1/relu:0"], ["conv1/nhwc:0"],
               W.attr_ints("perm", [0, 2, 3, 1])),
        # conv block 2: NCHW region with BatchNorm + MaxPool
        W.node("Transpose", ["conv1/nhwc:0"], ["conv2/pre:0"],
               W.attr_ints("perm", [0, 3, 1, 2])),
        W.node("Conv", ["conv2/pre:0", "conv2/W"], ["conv2/out:0"],
               W.attr_s("auto_pad", "SAME_UPPER"),
               W.attr_ints("strides", [2, 2]),
               W.attr_ints("kernel_shape", [3, 3])),
        W.node("BatchNormalization",
               ["conv2/out:0", "bn/scale", "bn/bias", "bn/mean", "bn/var"],
               ["bn:0"], W.attr_f("epsilon", 1e-3)),
        W.node("MaxPool", ["bn:0"], ["pool:0"],
               W.attr_s("auto_pad", "SAME_UPPER"),
               W.attr_ints("kernel_shape", [2, 2]),
               W.attr_ints("strides", [2, 2])),
        W.node("Transpose", ["pool:0"], ["pool_nhwc:0"],
               W.attr_ints("perm", [0, 2, 3, 1])),
        # SiLU spelled as Sigmoid + Mul (TF export style)
        W.node("Sigmoid", ["pool_nhwc:0"], ["act/sig:0"]),
        W.node("Mul", ["pool_nhwc:0", "act/sig:0"], ["act:0"]),
        # TF dynamic flatten: Shape -> Gather -> Unsqueeze -> Concat -> Reshape
        W.node("Shape", ["act:0"], ["flatten/shape:0"]),
        W.node("Gather", ["flatten/shape:0", "flatten/gather_idx"],
               ["flatten/batch:0"], W.attr_i("axis", 0)),
        W.node("Unsqueeze", ["flatten/batch:0", "flatten/unsqueeze_axes"],
               ["flatten/batch1:0"]),
        W.node("Concat", ["flatten/batch1:0", "flatten/neg_one"],
               ["flatten/target:0"], W.attr_i("axis", 0)),
        W.node("Reshape", ["act:0", "flatten/target:0"], ["flat:0"]),
        # dense head: MatMul[in,out] + Add
        W.node("MatMul", ["flat:0", "head/W"], ["head/mm:0"]),
        W.node("Add", ["head/mm:0", "head/b"],
               ["StatefulPartitionedCall:0"]),
    ]
    logits_name = "StatefulPartitionedCall:0"
    nb = "batch"
    out_vis = []

    if family in ("v30", "perch"):
        inits += [f32("emb/W", weights["We"]), f32("emb/b", weights["be"])]
        nodes += [
            W.node("ReduceMean", ["act:0"], ["pooled:0"],
                   W.attr_ints("axes", [1, 2]), W.attr_i("keepdims", 0)),
            W.node("MatMul", ["pooled:0", "emb/W"], ["emb/mm:0"]),
            W.node("Add", ["emb/mm:0", "emb/b"],
                   ["StatefulPartitionedCall:1"]),
        ]

    if family == "v24":
        out_vis = [W.value_info(logits_name, W.FLOAT, [nb, num_species])]
    elif family == "v30":
        out_vis = [
            W.value_info("StatefulPartitionedCall:1", W.FLOAT, [nb, emb_dim]),
            W.value_info(logits_name, W.FLOAT, [nb, num_species]),
        ]
    else:  # perch: [embedding, spatial_embedding, spectrogram, logits]
        inits += [f32("spatial/W", weights["Wse"])]
        nodes += [
            W.node("MatMul", ["act:0", "spatial/W"],
                   ["StatefulPartitionedCall:2"]),
        ]
        out_vis = [
            W.value_info("StatefulPartitionedCall:1", W.FLOAT, [nb, emb_dim]),
            W.value_info("StatefulPartitionedCall:2", W.FLOAT,
                         [nb, t3, m3, spatial_dim]),
            W.value_info("logmel:0", W.FLOAT, [nb, t, n_mels]),
            W.value_info(logits_name, W.FLOAT, [nb, num_species]),
        ]

    g = W.graph(
        f"tf_dialect_{family}", nodes, inits,
        [W.value_info(x_in, W.FLOAT, [nb, s])], out_vis,
    )
    meta = dict(family=family, sr=sr, hop=hop, n_mels=n_mels, fmin=fmin,
                fmax=fmax, sample_count=s, num_species=num_species,
                emb_dim=emb_dim)
    return W.model(g, opset=17), TfOracle(weights, meta)
