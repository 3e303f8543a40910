"""Perch v2 tile-size sweep (VERDICT r2 item 8: the Perch-specific lever hunt).

The 128-segment tile was chosen by a v2.4 sweep; Perch's activations are
~2.2x larger per segment ([64,250] stage-1 maps vs v2.4's [48,256] at
half the time span), so the VMEM-locality optimum could sit elsewhere.
Same-process interleaved A/B over tile sizes at a fixed dispatch size,
stall-filtered medians, parity vs tile 128.

Usage: python scripts/perch_tile_sweep.py [--nseg 6144] [--runs 5]
       [--model perch_v2|birdnet_v24|birdnet_v30]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _stall_filter  # noqa: E402  (single copy of the threshold)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--nseg", type=int, default=6144,
                    help="segments per dispatch (divisible by every tile)")
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[64, 96, 128, 192, 256])
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--model", default="perch_v2")
    args = ap.parse_args()

    import jax

    from birdnet_tpu.compiler.importer import import_onnx
    from birdnet_tpu.compiler.stream import StreamingEngine
    from birdnet_tpu.detection import detect_model_type
    from birdnet_tpu.models import birdnet_v24, birdnet_v30, perch_v2
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    builder = {"perch_v2": perch_v2, "birdnet_v24": birdnet_v24,
               "birdnet_v30": birdnet_v30}[args.model]
    imported = import_onnx(builder.build_model())
    config = detect_model_type(*imported.detection_shapes())
    S = config.sample_count

    for t in args.tiles:
        if args.nseg % t:
            raise SystemExit(f"--nseg {args.nseg} not divisible by tile {t}")

    rng = np.random.default_rng(0)
    audio_h = (rng.standard_normal((args.nseg, S), dtype=np.float32)
               * 3000).astype(np.int16)

    # One upload + one device param copy shared across every tile size:
    # nseg*S int16 is ~2 GB for Perch — per-tile copies would hold
    # len(tiles) of those in HBM at once and skew the A/B itself.
    audio_d = jax.device_put(audio_h, device)
    shared_params = None
    progs = {}
    for t in args.tiles:
        eng = StreamingEngine(imported, config, device=device, top_k=10,
                              tile=t, precision="fast", params=shared_params)
        shared_params = eng.params
        t0 = time.monotonic()
        fn = eng._compile(args.nseg // t, S, np.int16)
        out = fn(eng.params, audio_d)
        conf, idx = np.asarray(out[0]), np.asarray(out[1])
        print(f"# tile {t}: compile+warm {time.monotonic()-t0:.0f}s",
              flush=True)
        progs[t] = (fn, eng.params, audio_d, conf, idx, [])

    # Interleave timed runs across tiles so tunnel/HBM drift cancels.
    for r in range(args.runs):
        for t in args.tiles:
            fn, params, audio_d, _, _, dts = progs[t]
            t0 = time.monotonic()
            out = fn(params, audio_d)
            np.asarray(out[0]); np.asarray(out[1])
            dts.append(time.monotonic() - t0)

    # Parity vs 128 is top-1 index agreement (confidence deltas between
    # tile sizes are pure reduction-order noise at bf16).
    base_idx = progs[128][4] if 128 in progs else None
    print(f"\n{'tile':>6s} {'seg/s':>9s} {'vs 128':>7s}")
    base = None
    rows = []
    for t in args.tiles:
        _, _, _, conf, idx, dts = progs[t]
        keep = _stall_filter(dts)
        seg_s = args.nseg / statistics.median(keep)
        rows.append((t, seg_s, conf, idx, len(dts) - len(keep)))
        if t == 128:
            base = seg_s
    for t, seg_s, conf, idx, dropped in rows:
        rel = f"{seg_s / base:6.3f}x" if base else "      -"
        extra = ""
        if base_idx is not None and t != 128:
            agree = float((idx[:, 0] == base_idx[:, 0]).mean())
            extra = f"  top-1 agree {agree:.4f}"
        extra += f"  ({dropped} stall-dropped)" if dropped else ""
        print(f"{t:6d} {seg_s:9.0f} {rel}{extra}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
