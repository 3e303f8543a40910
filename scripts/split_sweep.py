"""A/B the stage-prefix megakernel split point in the real streaming pipeline.

For each BIRDNET_STAGE123_SPLIT value, build the StreamingEngine fresh
(the lowering reads the env at trace time), run the sustained
device-resident dispatch, and report seg/s. Split 0 = pure XLA (round-1
behavior); 6 = whole prefix in the kernel.

Usage: python scripts/split_sweep.py [--splits 0,1,2,3,6] [--nseg 4096]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splits", default="0,1,2,3,6")
    ap.add_argument("--nseg", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import jax

    from _sweep_common import make_layout, timed_seg_s
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
    for split in [s.strip() for s in args.splits.split(",")]:
        os.environ["BIRDNET_STAGE123_SPLIT"] = split
        engine = StreamingEngine(
            imported, config, device=device, top_k=10, tile=args.tile,
            precision="fast",
        )
        fn = engine._compile(n_tiles, step, np.int16)
        audio_d = jax.device_put(layout, device)
        results[split], _ = timed_seg_s(
            fn, engine.params, audio_d, args.nseg, args.runs,
            f"split={split}"
        )
    os.environ.pop("BIRDNET_STAGE123_SPLIT", None)

    best = max(results, key=results.get)
    base = results.get("0")
    print(f"best split={best}: {results[best]:.0f} seg/s"
          + (f" ({results[best]/base:.3f}x of split-0)" if base else ""),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
