"""BirdNET meta-model (range filter) generator.

Contract (reference: src/rangefilter.rs:451-459, :255-259):
- input ``[1, 3]`` float32 = [latitude, longitude, week]
- ONE output: per-species occurrence scores ``[1, num_species]`` in [0, 1]

The real meta model is a small MLP over (lat, lon, week) encodings; this
generator builds an equivalent MLP with sigmoid output so scores land in
the reference's threshold regime (default 0.01, rangefilter.rs:160-167).
"""

from __future__ import annotations

import numpy as np

from ..onnx import proto as P
from ._builder import GraphBuilder

NUM_SPECIES = 6522


def build_model(
    num_species: int = NUM_SPECIES,
    hidden: int = 256,
    seed: int = 3,
    batch_dim=1,
) -> P.ModelProto:
    gb = GraphBuilder("birdnet_meta", seed=seed)

    # Normalize inputs to O(1): lat/90, lon/180, week/48
    scale = gb.add_init(
        "in_scale", np.array([[1 / 90.0, 1 / 180.0, 1 / 48.0]], dtype=np.float32)
    )
    x = gb.node("Mul", ["input", scale])
    h = gb.gemm(x, 3, hidden)
    h = gb.relu(h)
    h = gb.gemm(h, hidden, hidden)
    h = gb.relu(h)
    logits = gb.gemm(h, hidden, num_species)
    gb.node("Sigmoid", [logits], ["output"])

    return gb.build(
        inputs=[P.make_value_info("input", P.DataType.FLOAT, [batch_dim, 3])],
        outputs=[P.make_value_info("output", P.DataType.FLOAT, [batch_dim, num_species])],
    )


def save(path, **kwargs) -> None:
    P.save_model(build_model(**kwargs), path)


def save_tiny(path, num_species: int = 10, seed: int = 3) -> None:
    P.save_model(build_model(num_species=num_species, hidden=16, seed=seed), path)
