"""BirdNET v3.0-shaped model generator.

Contract (reference: src/types.rs:15-38, src/detection.rs:43-56):
- input ``[batch, 160000]`` float32 (5 s @ 32 kHz)
- TWO outputs, in ONNX order: embeddings ``[batch, 1024]``, then logits
  ``[batch, num_species]``.
"""

from __future__ import annotations

from ..onnx import proto as P
from ._builder import GraphBuilder, learned_frontend, stft_mel_frontend

SAMPLE_COUNT = 160_000
NUM_SPECIES = 6522
EMBEDDING_DIM = 1024


def build_model(
    num_species: int = NUM_SPECIES,
    embedding_dim: int = EMBEDDING_DIM,
    width: float = 1.0,
    depth: int = 2,
    seed: int = 1,
    batch_dim="batch",
    frontend: str = "conv",
) -> P.ModelProto:
    gb = GraphBuilder("birdnet_v30", seed=seed)

    def ch(c):
        return max(8, int(c * width) // 8 * 8)

    if frontend == "stft":
        # TF-export style (ONNX STFT + MelWeightMatrix) at the v3.0
        # geometry: 5 s @ 32 kHz, hop 312.
        img, _t = stft_mel_frontend(
            gb, "input", SAMPLE_COUNT, sample_rate=32_000, hop=312,
            n_mels=96, fmax=15_000.0,
        )
    else:
        img, _t = learned_frontend(
            gb, "input", SAMPLE_COUNT, n_filters=96, stride=312
        )

    x = gb.conv_bn_act(img, 1, ch(32), [3, 3], strides=[2, 2])
    stages = [
        (ch(32), ch(24), 1, 1),
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

    head_ch = ch(1280)
    x = gb.conv_bn_act(x, ch(320), head_ch, [1, 1])
    feat = gb.gap(x)
    # embeddings output, then logits computed FROM the embeddings
    gb.gemm(feat, head_ch, embedding_dim, name="embeddings")
    gb.gemm("embeddings", embedding_dim, num_species, name="logits")

    return gb.build(
        inputs=[P.make_value_info("input", P.DataType.FLOAT, [batch_dim, SAMPLE_COUNT])],
        outputs=[
            P.make_value_info("embeddings", P.DataType.FLOAT, [batch_dim, embedding_dim]),
            P.make_value_info("logits", P.DataType.FLOAT, [batch_dim, num_species]),
        ],
    )


def save(path, **kwargs) -> None:
    P.save_model(build_model(**kwargs), path)


def save_tiny(path, num_species: int = 10, embedding_dim: int = 32, seed: int = 1) -> None:
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
