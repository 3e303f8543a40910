"""BirdNET v2.4-shaped model generator.

Contract (reference: src/types.rs:15-38, src/detection.rs:29-41):
- input ``[batch, 144000]`` float32 (3 s @ 48 kHz)
- ONE output: logits ``[batch, num_species]`` (canonically 6522)

Architecture: learned conv frontend (strided Conv1d filterbank → power → log)
feeding an EfficientNet-style MBConv stack — the same family as the real
BirdNET v2.4 backbone — with a linear classification head. ~12.7 M params
(~51 MB fp32) at default width, matching the reference's documented ~50 MB
weight footprint (reference: docs/gpu-batch-optimization.md:222).
"""

from __future__ import annotations

from ..onnx import proto as P
from ._builder import GraphBuilder, learned_frontend, stft_mel_frontend

SAMPLE_COUNT = 144_000
NUM_SPECIES = 6522


def build_model(
    num_species: int = NUM_SPECIES,
    width: float = 1.0,
    depth: int = 2,
    seed: int = 0,
    batch_dim="batch",
    frontend: str = "conv",
) -> P.ModelProto:
    """Build a BirdNET v2.4-shaped ModelProto with random weights.

    ``width`` scales channel counts; ``depth`` is blocks per stage;
    ``frontend`` is ``conv`` (learned filterbank as strided Conv1d) or
    ``stft`` (ONNX STFT + MelWeightMatrix, the TF-export style). The
    default configuration is the benchmark model; ``save_tiny`` makes a
    seconds-fast variant for unit tests.
    """
    gb = GraphBuilder("birdnet_v24", seed=seed)

    def ch(c):
        return max(8, int(c * width) // 8 * 8)

    if frontend == "stft":
        img, _t = stft_mel_frontend(
            gb, "input", SAMPLE_COUNT, sample_rate=48_000, n_mels=96
        )
    else:
        img, _t = learned_frontend(gb, "input", SAMPLE_COUNT, n_filters=96)

    # Stem: [N,1,96,511] -> [N,ch32,48,256]
    x = gb.conv_bn_act(img, 1, ch(32), [3, 3], strides=[2, 2])

    # MBConv stages (EfficientNet-B0-like schedule on the 96x511 "image")
    stages = [
        (ch(32), ch(24), 1, 1),   # c_in, c_out, stride, expand
        (ch(24), ch(40), 2, 4),
        (ch(40), ch(80), 2, 4),
        (ch(80), ch(112), 2, 4),
        (ch(112), ch(192), 2, 4),
        (ch(192), ch(320), 1, 4),
    ]
    for c_in, c_out, stride, expand in stages:
        x = gb.mbconv(x, c_in, c_out, stride=stride, expand=expand)
        for _ in range(depth - 1):
            x = gb.mbconv(x, c_out, c_out, stride=1, expand=expand)

    # Head: 1x1 conv to embedding width, GAP, linear classifier
    head_ch = ch(1280)
    x = gb.conv_bn_act(x, ch(320), head_ch, [1, 1])
    feat = gb.gap(x)
    gb.gemm(feat, head_ch, num_species, name="output")

    return gb.build(
        inputs=[P.make_value_info("input", P.DataType.FLOAT, [batch_dim, SAMPLE_COUNT])],
        outputs=[P.make_value_info("output", P.DataType.FLOAT, [batch_dim, num_species])],
    )


def save(path, **kwargs) -> None:
    P.save_model(build_model(**kwargs), path)


def save_tiny(path, num_species: int = 10, seed: int = 0) -> None:
    """Tiny fast variant for unit tests (same I/O contract)."""
    P.save_model(
        build_model(num_species=num_species, width=0.1, depth=1, seed=seed), path
    )
