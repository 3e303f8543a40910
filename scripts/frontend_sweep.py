"""A/B the fused Pallas frontend in the real streaming pipeline.

Builds the StreamingEngine with BIRDNET_PALLAS_FRONTEND=0 (XLA conv
chain) then =1 (pallas kernel) and reports sustained seg/s for each.
Usage: python scripts/frontend_sweep.py [--nseg 4096]
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
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import jax

    from _sweep_common import make_layout, print_parity, timed_seg_s
    from bench import _bench_model_path
    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import StreamingEngine
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    imported = import_onnx(_bench_model_path())
    config = detect_model_type(*imported.detection_shapes())
    layout, step, n_tiles = make_layout(config, args.nseg, args.tile)

    results = {}
    outs_by_mode = {}
    for mode in ("0", "1"):
        os.environ["BIRDNET_PALLAS_FRONTEND"] = mode
        engine = StreamingEngine(
            imported, config, device=device, top_k=10, tile=args.tile,
            precision="fast",
        )
        fn = engine._compile(n_tiles, step, np.int16)
        audio_d = jax.device_put(layout, device)
        label = "frontend=" + ("xla" if mode == "0" else "pallas")
        results[mode], outs_by_mode[mode] = timed_seg_s(
            fn, engine.params, audio_d, args.nseg, args.runs, label
        )
    os.environ.pop("BIRDNET_PALLAS_FRONTEND", None)

    print_parity(outs_by_mode["0"], outs_by_mode["1"])
    print(f"pallas/xla: {results['1']/results['0']:.3f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
