"""Focused follow-up: superchunk scaling at fast/tile-128, tile variants,
and fast-vs-mixed top-1 agreement at the best config."""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import statistics
import sys
import time

import numpy as np


def measure(eng, config, device, tile, n_segments, runs=3):
    import jax

    step = config.sample_count
    n_tiles = n_segments // tile
    fn = eng._compile(n_tiles, step, np.int16)
    audio_len = (n_tiles * tile - 1) * step + config.sample_count
    rng = np.random.default_rng(0)
    padded = (rng.normal(size=audio_len) * 3000).astype(np.int16)
    from birdnet_tpu.compiler.stream import chunk_to_device_layout
    audio_d = jax.device_put(chunk_to_device_layout(padded, step, config.sample_count), device)
    out = fn(eng.params, audio_d)
    np.asarray(out[0])
    dts = []
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn(eng.params, audio_d)
        np.asarray(out[0])
        np.asarray(out[1])
        dts.append(time.monotonic() - t0)
    return n_segments / statistics.median(dts), out


def main():
    import jax  # noqa: F401

    from bench import _bench_model_path
    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import StreamingEngine
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    imported = import_onnx(_bench_model_path())
    config = detect_model_type(*imported.detection_shapes())

    engines = {}

    def eng(precision, tile):
        key = (precision, tile)
        if key not in engines:
            engines[key] = StreamingEngine(
                imported, config, device=device, top_k=10, tile=tile,
                precision=precision,
            )
        return engines[key]

    for tile, nseg in [(128, 4096), (128, 6144), (128, 8192), (64, 4096),
                       (192, 4032)]:
        try:
            seg_s, _ = measure(eng("fast", tile), config, device, tile, nseg)
            print(f"fast tile={tile} nseg={nseg}: {seg_s:.0f} seg/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"fast tile={tile} nseg={nseg}: FAILED {type(e).__name__} "
                  f"{str(e)[:200]}", flush=True)

    # agreement at best config vs mixed
    _, out_f = measure(eng("fast", 128), config, device, 128, 4096, runs=1)
    _, out_m = measure(eng("mixed", 128), config, device, 128, 4096, runs=1)
    fi = np.asarray(out_f[1])[:, 0]
    mi = np.asarray(out_m[1])[:, 0]
    conf_f = np.asarray(out_f[0])[:, 0]
    conf_m = np.asarray(out_m[0])[:, 0]
    print(f"fast-vs-mixed top1 agreement: {(fi == mi).mean():.4f}; "
          f"max |conf diff| on top1: {np.abs(conf_f - conf_m).max():.4f}",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
