"""Shared harness for the streaming A/B sweep scripts.

One copy of the measurement discipline (docs/performance.md): seeded
int16 audio synthesis + tile padding + chunk_to_device_layout, a
warm+timed run loop with host readback (the axon ``block_until_ready``
lie) and the 1.5x-min stall filter, and the top-1/top-K parity report.
Used by frontend_sweep, split_sweep, stft_frontend_sweep, param_cast_ab;
bench.py keeps its own `_robust_median` (it reports raw AND filtered).
"""

import statistics
import sys
import time

import numpy as np


def make_layout(config, nseg: int, tile: int, seed: int = 0):
    """Synthesize ``nseg`` segments of seeded int16 noise, pad to whole
    tiles, and return ``(device_layout, step, n_tiles)`` for
    ``StreamingEngine._compile(n_tiles, step, np.int16)``."""
    from birdnet_tpu.compiler.stream import chunk_to_device_layout

    n_samples = nseg * config.sample_count
    rng = np.random.default_rng(seed)
    audio = (rng.normal(size=n_samples) * 3000).astype(np.int16)
    step = config.sample_count
    n_tiles = nseg // tile
    audio_len = (n_tiles * tile - 1) * step + config.sample_count
    padded = np.zeros(audio_len, np.int16)
    padded[:n_samples] = audio
    return chunk_to_device_layout(padded, step, config.sample_count), step, n_tiles


def timed_seg_s(fn, params, audio_d, nseg: int, runs: int, label: str):
    """Warm once (compile), then time ``runs`` dispatches with host
    readback; report the stall-filtered median. Returns
    ``(seg_s, (conf, idx))`` with the warm-run outputs for parity."""
    t0 = time.monotonic()
    out = fn(params, audio_d)
    conf = np.asarray(out[0])
    idx = np.asarray(out[1])
    print(f"# {label}: compile+warm {time.monotonic()-t0:.0f}s",
          file=sys.stderr, flush=True)
    dts = []
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn(params, audio_d)
        np.asarray(out[0]); np.asarray(out[1])
        dts.append(time.monotonic() - t0)
    keep = [d for d in dts if d <= 1.5 * min(dts)] or dts
    dt = statistics.median(keep)
    seg_s = nseg / dt
    print(f"{label}: {dt*1000:.0f}ms -> {seg_s:.0f} seg/s "
          f"({len(dts)-len(keep)} stall-dropped)", flush=True)
    return seg_s, (conf, idx)


def print_parity(a, b):
    """Top-1 agreement + max top-K confidence delta between two
    ``(conf, idx)`` pairs from :func:`timed_seg_s`."""
    (c0, i0), (c1, i1) = a, b
    agree = float((i0[:, 0] == i1[:, 0]).mean())
    dconf = float(np.abs(c0 - c1).max())
    print(f"# parity: top-1 agreement {agree:.4f}, "
          f"max top-K confidence delta {dconf:.4f}", flush=True)
