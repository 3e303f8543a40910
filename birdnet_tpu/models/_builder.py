"""ONNX graph builder for generating reference-shaped models.

The real BirdNET/Perch ONNX weight files are not redistributable and are not
present in this environment (the reference strips them too, see
/root/reference/.MISSING_LARGE_BLOBS). These builders generate architecture-
faithful, random-weight ONNX models with the exact input/output contracts of
the real ones (SURVEY §0 table), so the full pipeline — codec → importer →
compiler → classifier → CLI — is testable and benchmarkable end to end. A
user with the real .onnx files loads them through the identical path.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from ..onnx import proto as P


class GraphBuilder:
    """Accumulates ONNX nodes + initializers with seeded random weights."""

    def __init__(self, name: str, seed: int = 0):
        self.name = name
        self.rng = np.random.default_rng(seed)
        self.nodes: List[P.NodeProto] = []
        self.initializers: List[P.TensorProto] = []
        self._counter = 0

    # -- naming / registration -------------------------------------------

    def fresh(self, hint: str) -> str:
        self._counter += 1
        return f"{hint}_{self._counter}"

    def add_init(self, name: str, arr: np.ndarray) -> str:
        self.initializers.append(P.TensorProto.from_numpy(arr, name=name))
        return name

    def weight(self, name: str, shape: Sequence[int], fan_in: Optional[int] = None) -> str:
        """He-scaled random weight so activations stay O(1) through depth."""
        if fan_in is None:
            fan_in = int(np.prod(shape[1:])) if len(shape) > 1 else shape[0]
        std = np.sqrt(2.0 / max(fan_in, 1))
        arr = self.rng.normal(0.0, std, size=shape).astype(np.float32)
        return self.add_init(name, arr)

    def node(self, op_type: str, inputs, outputs=None, **attrs) -> str:
        if outputs is None:
            outputs = [self.fresh(op_type.lower())]
        self.nodes.append(P.make_node(op_type, inputs, outputs, **attrs))
        return outputs[0]

    # -- layer helpers -----------------------------------------------------

    def conv(
        self,
        x: str,
        c_in: int,
        c_out: int,
        kernel,
        strides=None,
        pads=None,
        group: int = 1,
        bias: bool = False,
        name: Optional[str] = None,
    ) -> str:
        if isinstance(kernel, int):
            kernel = [kernel]
        nd = len(kernel)
        strides = strides or [1] * nd
        if isinstance(strides, int):
            strides = [strides] * nd
        if pads is None:
            pads = [k // 2 for k in kernel] * 2  # SAME-ish for odd kernels
        name = name or self.fresh("conv")
        w = self.weight(f"{name}_w", [c_out, c_in // group] + list(kernel))
        inputs = [x, w]
        if bias:
            inputs.append(self.add_init(f"{name}_b", np.zeros(c_out, dtype=np.float32)))
        return self.node(
            "Conv",
            inputs,
            [name],
            kernel_shape=list(kernel),
            strides=list(strides),
            pads=list(pads),
            group=group,
        )

    def batchnorm(self, x: str, channels: int, name: Optional[str] = None) -> str:
        name = name or self.fresh("bn")
        scale = self.add_init(
            f"{name}_s", self.rng.uniform(0.8, 1.2, channels).astype(np.float32)
        )
        bias = self.add_init(
            f"{name}_b", self.rng.normal(0, 0.05, channels).astype(np.float32)
        )
        mean = self.add_init(
            f"{name}_m", self.rng.normal(0, 0.05, channels).astype(np.float32)
        )
        var = self.add_init(
            f"{name}_v", self.rng.uniform(0.8, 1.2, channels).astype(np.float32)
        )
        return self.node(
            "BatchNormalization", [x, scale, bias, mean, var], [name], epsilon=1e-3
        )

    def swish(self, x: str) -> str:
        s = self.node("Sigmoid", [x])
        return self.node("Mul", [x, s])

    def relu(self, x: str) -> str:
        return self.node("Relu", [x])

    def add(self, a: str, b: str) -> str:
        return self.node("Add", [a, b])

    def gap(self, x: str) -> str:
        """GlobalAveragePool → Flatten to [N, C]."""
        g = self.node("GlobalAveragePool", [x])
        return self.node("Flatten", [g], axis=1)

    def gemm(self, x: str, c_in: int, c_out: int, bias: bool = True, name=None) -> str:
        name = name or self.fresh("fc")
        w = self.weight(f"{name}_w", [c_out, c_in], fan_in=c_in)
        inputs = [x, w]
        if bias:
            inputs.append(self.add_init(f"{name}_b", np.zeros(c_out, dtype=np.float32)))
        return self.node("Gemm", inputs, [name], transB=1)

    def conv_bn_act(self, x, c_in, c_out, kernel, strides=1, group=1, act="swish"):
        y = self.conv(x, c_in, c_out, kernel, strides=strides, group=group)
        y = self.batchnorm(y, c_out)
        if act == "swish":
            return self.swish(y)
        if act == "relu":
            return self.relu(y)
        return y

    def se_block(self, x: str, channels: int, reduce: int = 4) -> str:
        """Squeeze-and-excitation: GAP → 1x1 conv → swish → 1x1 conv → sigmoid → scale."""
        mid = max(channels // reduce, 4)
        g = self.node("GlobalAveragePool", [x])
        r = self.conv(g, channels, mid, [1, 1], pads=[0, 0, 0, 0], bias=True)
        r = self.swish(r)
        e = self.conv(r, mid, channels, [1, 1], pads=[0, 0, 0, 0], bias=True)
        e = self.node("Sigmoid", [e])
        return self.node("Mul", [x, e])

    def mbconv(self, x, c_in, c_out, stride=1, expand=4, kernel=3, se=True):
        """EfficientNet-style inverted residual block."""
        mid = c_in * expand
        y = self.conv_bn_act(x, c_in, mid, [1, 1], strides=[1, 1])
        y = self.conv_bn_act(y, mid, mid, [kernel, kernel], strides=stride, group=mid)
        if se:
            y = self.se_block(y, mid)
        y = self.conv(y, mid, c_out, [1, 1], pads=[0, 0, 0, 0])
        y = self.batchnorm(y, c_out)
        if stride == 1 and c_in == c_out:
            y = self.add(x, y)
        return y

    # -- graph assembly ----------------------------------------------------

    def build(
        self,
        inputs: List[P.ValueInfoProto],
        outputs: List[P.ValueInfoProto],
        opset: int = 17,
    ) -> P.ModelProto:
        graph = P.GraphProto(
            name=self.name,
            node=self.nodes,
            initializer=self.initializers,
            input=inputs,
            output=outputs,
        )
        return P.make_model(graph, opset_version=opset)


def stft_mel_frontend(
    gb: GraphBuilder,
    x: str,
    n_samples: int,
    sample_rate: int,
    n_fft: int = 1024,
    hop: int = 280,
    n_mels: int = 96,
    fmin: float = 150.0,
    fmax: float = 15_000.0,
) -> tuple:
    """In-graph spectrogram frontend using the ONNX signal ops (STFT →
    power → MelWeightMatrix projection → log), the way TF-exported BirdNET
    graphs express it. Returns ([N, 1, n_mels, T], T)."""
    t = (n_samples - n_fft) // hop + 1
    window = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(n_fft) / n_fft)).astype(np.float32)
    win = gb.add_init(gb.fresh("hann"), window)
    step = gb.add_init(gb.fresh("step"), np.array(hop, dtype=np.int64))
    spec = gb.node("STFT", [x, step, win], onesided=1)  # [N, T, bins, 2]
    power = gb.node("ReduceSumSquare", [spec], axes=[-1], keepdims=0)  # [N, T, bins]
    mel = gb.node(
        "MelWeightMatrix",
        [
            gb.add_init(gb.fresh("nmel"), np.array(n_mels, dtype=np.int64)),
            gb.add_init(gb.fresh("dft"), np.array(n_fft, dtype=np.int64)),
            gb.add_init(gb.fresh("sr"), np.array(sample_rate, dtype=np.int64)),
            gb.add_init(gb.fresh("fmin"), np.array(fmin, dtype=np.float32)),
            gb.add_init(gb.fresh("fmax"), np.array(fmax, dtype=np.float32)),
        ],
    )  # [bins, n_mels]
    melspec = gb.node("MatMul", [power, mel])  # [N, T, n_mels]
    eps = gb.add_init(gb.fresh("eps"), np.array(1e-6, dtype=np.float32))
    logmel = gb.node("Log", [gb.node("Add", [melspec, eps])])
    # [N, T, M] -> [N, 1, M, T]
    tr = gb.node("Transpose", [logmel], perm=[0, 2, 1])
    img = gb.node(
        "Unsqueeze", [tr, gb.add_init(gb.fresh("axes"), np.array([1], dtype=np.int64))]
    )
    return img, t


def learned_frontend(
    gb: GraphBuilder,
    x: str,
    n_samples: int,
    n_filters: int = 96,
    kernel: int = 1024,
    stride: int = 280,
) -> tuple:
    """In-graph audio frontend: framing+filterbank as a strided Conv1d, power,
    log compression — the conv-form equivalent of the spectrogram stage the
    real BirdNET embeds in its ONNX graph.

    Returns (tensor_name, n_frames): output shaped [N, 1, n_filters, T].
    """
    t = (n_samples - kernel) // stride + 1
    # [N, S] -> [N, 1, S]
    axes0 = gb.add_init(gb.fresh("axes"), np.array([1], dtype=np.int64))
    x3 = gb.node("Unsqueeze", [x, axes0])
    fb = gb.conv(x3, 1, n_filters, [kernel], strides=[stride], pads=[0, 0])
    power = gb.node("Mul", [fb, fb])
    eps = gb.add_init(gb.fresh("eps"), np.array(1e-6, dtype=np.float32))
    stabilized = gb.node("Add", [power, eps])
    logmel = gb.node("Log", [stabilized])
    # [N, F, T] -> [N, 1, F, T]
    axes1 = gb.add_init(gb.fresh("axes"), np.array([1], dtype=np.int64))
    img = gb.node("Unsqueeze", [logmel, axes1])
    return img, t
