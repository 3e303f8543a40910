"""Sweep: precision x tile x superchunk for the streaming headline number.

Device-resident sustained protocol (forced readback), median of 3.
"""

import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


import itertools
import statistics
import sys
import time

import numpy as np


def measure(precision, tile, n_segments):
    import jax

    from bench import _bench_model_path
    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import StreamingEngine
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.runtime import default_device

    device = default_device()
    imported = import_onnx(_bench_model_path())
    config = detect_model_type(*imported.detection_shapes())
    eng = StreamingEngine(
        imported, config, device=device, top_k=10, tile=tile,
        precision=precision,
    )
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
    for _ in range(3):
        t0 = time.monotonic()
        out = fn(eng.params, audio_d)
        np.asarray(out[0])
        np.asarray(out[1])
        dts.append(time.monotonic() - t0)
    return n_segments / statistics.median(dts)


def main():
    from birdnet_tpu.runtime import init_runtime

    init_runtime()
    results = []
    for precision, tile, nseg in itertools.product(
        ("mixed", "fast"), (128, 256), (2048, 4096)
    ):
        try:
            seg_s = measure(precision, tile, nseg)
        except Exception as e:  # noqa: BLE001
            print(f"{precision} tile={tile} nseg={nseg}: FAILED {e}",
                  flush=True)
            continue
        results.append((seg_s, precision, tile, nseg))
        print(f"{precision} tile={tile} nseg={nseg}: {seg_s:.0f} seg/s",
              flush=True)
    results.sort(reverse=True)
    print("BEST:", results[0] if results else None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
