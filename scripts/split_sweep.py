"""A/B the stage-prefix megakernel split point in the real streaming pipeline.

For each BIRDNET_STAGE123_SPLIT value, build the StreamingEngine fresh
(the lowering reads the env at trace time), run the sustained
device-resident dispatch, and report seg/s. Split 0 = pure XLA (round-1
behavior); 6 = whole prefix in the kernel.

Usage: python scripts/split_sweep.py [--splits 0,1,2,3,6] [--nseg 4096]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--splits", default="0,1,2,3,6")
    ap.add_argument("--nseg", type=int, default=4096)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--runs", type=int, default=4)
    args = ap.parse_args()

    import jax

    from bench import _bench_model_path
    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import (
        StreamingEngine,
        chunk_to_device_layout,
    )
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    imported = import_onnx(_bench_model_path())
    config = detect_model_type(*imported.detection_shapes())

    n_samples = args.nseg * config.sample_count
    rng = np.random.default_rng(0)
    audio = (rng.normal(size=n_samples) * 3000).astype(np.int16)
    step = config.sample_count
    n_tiles = args.nseg // args.tile
    audio_len = (n_tiles * args.tile - 1) * step + config.sample_count
    padded = np.zeros(audio_len, np.int16)
    padded[:n_samples] = audio
    layout = chunk_to_device_layout(padded, step, config.sample_count)

    results = {}
    for split in [s.strip() for s in args.splits.split(",")]:
        os.environ["BIRDNET_STAGE123_SPLIT"] = split
        engine = StreamingEngine(
            imported, config, device=device, top_k=10, tile=args.tile,
            precision="fast",
        )
        t0 = time.monotonic()
        fn = engine._compile(n_tiles, step, np.int16)
        audio_d = jax.device_put(layout, device)
        out = fn(engine.params, audio_d)
        np.asarray(out[0])
        print(f"# split={split}: compile+warm {time.monotonic()-t0:.0f}s",
              file=sys.stderr, flush=True)
        dts = []
        for _ in range(args.runs):
            t0 = time.monotonic()
            out = fn(engine.params, audio_d)
            np.asarray(out[0]); np.asarray(out[1])
            dts.append(time.monotonic() - t0)
        keep = [d for d in dts if d <= 1.5 * min(dts)] or dts
        dt = statistics.median(keep)
        seg_s = args.nseg / dt
        results[split] = seg_s
        print(f"split={split}: {dt*1000:.0f}ms -> {seg_s:.0f} seg/s "
              f"({args.nseg/args.tile} tiles, {len(dts)-len(keep)} "
              f"stall-dropped)", flush=True)
    os.environ.pop("BIRDNET_STAGE123_SPLIT", None)

    best = max(results, key=results.get)
    base = results.get("0")
    print(f"best split={best}: {results[best]:.0f} seg/s"
          + (f" ({results[best]/base:.3f}x of split-0)" if base else ""),
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
