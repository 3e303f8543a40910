"""Google Perch v2-shaped model generator.

Contract (reference: src/detection.rs:58-71, src/classifier.rs:929-934):
- input ``[batch, 160000]`` float32 (5 s @ 32 kHz)
- FOUR outputs, in ONNX order:
  0. embedding           ``[batch, embedding_dim]``   (canonically 1536)
  1. spatial_embedding   ``[batch, frames, embedding_dim]``
  2. spectrogram         ``[batch, frames, mels]``
  3. logits              ``[batch, num_species]``     (canonically 14795)

The logits live at index 3 — the demux quirk the classifier must honor.
Embedding dim stays shape-driven (detection.rs:217-231 tests 768/1536).
"""

from __future__ import annotations

import numpy as np

from ..onnx import proto as P
from ._builder import GraphBuilder, learned_frontend, stft_mel_frontend

SAMPLE_COUNT = 160_000
NUM_SPECIES = 14_795
EMBEDDING_DIM = 1536


def build_model(
    num_species: int = NUM_SPECIES,
    embedding_dim: int = EMBEDDING_DIM,
    width: float = 1.0,
    depth: int = 2,
    seed: int = 2,
    batch_dim="batch",
    frontend: str = "conv",
) -> P.ModelProto:
    gb = GraphBuilder("perch_v2", seed=seed)

    def ch(c):
        return max(8, int(c * width) // 8 * 8)

    n_mels = 128
    if frontend == "stft":
        # TF-export style (ONNX STFT + MelWeightMatrix) at the Perch
        # geometry: 5 s @ 32 kHz, hop 320, 128 mels.
        img, t_frames = stft_mel_frontend(
            gb, "input", SAMPLE_COUNT, sample_rate=32_000, hop=320,
            n_mels=n_mels, fmax=15_000.0,
        )
    else:
        img, t_frames = learned_frontend(
            gb, "input", SAMPLE_COUNT, n_filters=n_mels, kernel=1024,
            stride=320,
        )
    # spectrogram output: [N,1,M,T] -> [N,T,M]
    spec = gb.node("Squeeze", [img, gb.add_init("sq_ax", np.array([1], dtype=np.int64))])
    gb.node("Transpose", [spec], ["spectrogram"], perm=[0, 2, 1])

    x = gb.conv_bn_act(img, 1, ch(40), [3, 3], strides=[2, 2])
    stages = [
        (ch(40), ch(24), 1, 1),
        (ch(24), ch(48), 2, 4),
        (ch(48), ch(96), 2, 4),
        (ch(96), ch(136), 2, 4),
        (ch(136), ch(232), 2, 4),
        (ch(232), ch(384), 1, 4),
    ]
    for c_in, c_out, stride, expand in stages:
        x = gb.mbconv(x, c_in, c_out, stride=stride, expand=expand)
        for _ in range(depth - 1):
            x = gb.mbconv(x, c_out, c_out, stride=1, expand=expand)

    # Project to embedding dim while spatial structure is still present.
    x = gb.conv_bn_act(x, ch(384), embedding_dim, [1, 1])

    # spatial embedding: average over freq, keep time: [N,E,F',T'] -> [N,T',E]
    freq_avg = gb.node(
        "ReduceMean",
        [x, gb.add_init("rm_ax", np.array([2], dtype=np.int64))],
        keepdims=0,
    )  # [N, E, T']
    gb.node("Transpose", [freq_avg], ["spatial_embedding"], perm=[0, 2, 1])

    # pooled embedding: mean over time of spatial embedding
    gb.node(
        "ReduceMean",
        ["spatial_embedding", gb.add_init("rm_ax2", np.array([1], dtype=np.int64))],
        ["embedding"],
        keepdims=0,
    )  # [N, E]

    gb.gemm("embedding", embedding_dim, num_species, name="logits")

    # Static frame counts for output value_info
    t_out = t_frames
    for _ in range(5):  # stem + 4 strided stages
        t_out = (t_out + 1) // 2

    return gb.build(
        inputs=[P.make_value_info("input", P.DataType.FLOAT, [batch_dim, SAMPLE_COUNT])],
        outputs=[
            P.make_value_info("embedding", P.DataType.FLOAT, [batch_dim, embedding_dim]),
            P.make_value_info(
                "spatial_embedding", P.DataType.FLOAT, [batch_dim, t_out, embedding_dim]
            ),
            P.make_value_info("spectrogram", P.DataType.FLOAT, [batch_dim, t_frames, n_mels]),
            P.make_value_info("logits", P.DataType.FLOAT, [batch_dim, num_species]),
        ],
    )


def save(path, **kwargs) -> None:
    P.save_model(build_model(**kwargs), path)


def save_tiny(path, num_species: int = 12, embedding_dim: int = 48, seed: int = 2) -> None:
    P.save_model(
        build_model(
            num_species=num_species,
            embedding_dim=embedding_dim,
            width=0.1,
            depth=1,
            seed=seed,
        ),
        path,
    )
