"""A/B: fp32 params (in-graph bf16 casts) vs host-pre-cast bf16 params.

Under the ``fast`` policy every conv/matmul casts its weight operand to
bf16 inside the traced graph. Inside the 96-tile scan those casts are
loop-invariant; this measures whether XLA's while-loop LICM actually
hoists them (if not, the scan re-reads 50 MB fp32 + writes 25 MB bf16 of
weight traffic per tile). The candidate fix is trivial: cast the params
pytree to bf16 once on host before upload.

Measured conclusion (v5e, 4096 segments): bf16-params 0.926x with
bit-identical outputs — XLA DOES hoist the converts; see ROADMAP.md.

Usage: python scripts/param_cast_ab.py [--nseg 4096] [--runs 6]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nseg", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--runs", type=int, default=6)
    args = ap.parse_args()

    import jax
    import ml_dtypes

    from _sweep_common import make_layout, print_parity, timed_seg_s
    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import StreamingEngine
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.models import birdnet_v24
    from birdnet_tpu.onnx import proto as P
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    imported = import_onnx(P.encode_model(birdnet_v24.build_model()))
    config = detect_model_type(*imported.detection_shapes())
    layout, step, n_tiles = make_layout(config, args.nseg, args.tile)

    def bf16_params(params):
        return {
            k: (np.asarray(v).astype(ml_dtypes.bfloat16)
                if np.issubdtype(np.asarray(v).dtype, np.floating) else v)
            for k, v in params.items()
        }

    audio_d = None
    variants = {"fp32-params": None,
                "bf16-params": jax.device_put(
                    bf16_params(imported.params), device)}
    results, outs = {}, {}
    for name, params in variants.items():
        engine = StreamingEngine(
            imported, config, device=device, top_k=10, tile=args.tile,
            precision="fast", params=params,
        )
        fn = engine._compile(n_tiles, step, np.int16)
        if audio_d is None:
            audio_d = jax.device_put(layout, device)
        results[name], outs[name] = timed_seg_s(
            fn, engine.params, audio_d, args.nseg, args.runs, name
        )

    print_parity(outs["fp32-params"], outs["bf16-params"])
    print(f"bf16/fp32 params: "
          f"{results['bf16-params']/results['fp32-params']:.3f}x", flush=True)


if __name__ == "__main__":
    main()
