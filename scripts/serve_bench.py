"""Serving load test: DynamicBatcher throughput/latency vs knobs.

Drives the batcher directly (no HTTP overhead) with a closed-loop client
pool, sweeping (max_batch, max_wait_ms, clients), and reports sustained
request throughput + latency percentiles — the numbers behind
docs/serving.md's tuning table.

Usage:
    python scripts/serve_bench.py [--model PATH] [--seconds 5]
        [--clients 4,16,64] [--batches 8,32] [--waits 0,5]

With no --model, generates the full-size random-weight BirdNET v2.4
(the bench model). On CPU this measures scheduler overhead; on the real
chip it measures the serving operating curve.
"""

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_classifier(model_path, precision):
    from birdnet_tpu import Classifier
    from birdnet_tpu.checkpoint import import_any
    from birdnet_tpu.detection import detect_model_type

    # Generate exactly as many labels as the model expects — a v2.4
    # constant would LabelCountError on v3.0 / Perch v2 / custom models.
    cfg = detect_model_type(*import_any(model_path).detection_shapes())
    labels = [f"species_{i}" for i in range(cfg.num_species)]
    b = (
        Classifier.builder()
        .model_path(model_path)
        .labels(labels)
        .top_k(3)
    )
    if precision:
        b = b.precision(precision)
    return b.build()


def _closed_loop(batcher, segment, n_clients, seconds):
    """n_clients threads each submit→wait→repeat for `seconds`. Returns
    (requests_done, wall, latencies)."""
    stop_at = time.monotonic() + seconds
    counts = [0] * n_clients
    errors = [0] * n_clients
    lats = [[] for _ in range(n_clients)]

    def client(i):
        rng = np.random.default_rng(i)
        while time.monotonic() < stop_at:
            seg = segment + rng.standard_normal(1).astype(np.float32) * 1e-6
            t0 = time.monotonic()
            try:
                batcher.predict(seg, timeout=120)
            except Exception:
                # Overload/timeout must not silently kill the client: a row
                # with dead clients would report a healthy-looking number
                # for fewer clients than its label claims.
                errors[i] += 1
                continue
            lats[i].append(time.monotonic() - t0)
            counts[i] += 1

    threads = [
        threading.Thread(target=client, args=(i,)) for i in range(n_clients)
    ]
    t0 = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t0
    all_lats = sorted(x for l in lats for x in l)
    return sum(counts), wall, all_lats, sum(errors)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default=None)
    ap.add_argument("--precision", default=None)
    ap.add_argument("--seconds", type=float, default=5.0)
    ap.add_argument("--clients", default="4,16,64")
    ap.add_argument("--batches", default="8,32")
    ap.add_argument("--waits", default="0,5")
    ap.add_argument(
        "--workers",
        default="1",
        help="comma list of batcher pipeline counts to sweep (2 overlaps "
        "host staging/readback with device compute)",
    )
    ap.add_argument(
        "--provider",
        default=None,
        help="pin the device platform (e.g. cpu); the axon plugin "
        "overrides JAX_PLATFORMS, so an env var alone cannot force CPU",
    )
    args = ap.parse_args()

    if args.provider:
        import jax

        jax.config.update("jax_platforms", args.provider)

    model_path = args.model
    if model_path is None:
        cache = os.path.expanduser("~/.cache/birdnet_tpu/bench")
        os.makedirs(cache, exist_ok=True)
        model_path = os.path.join(cache, "birdnet_v24_bench.onnx")
        if not os.path.exists(model_path):
            from birdnet_tpu.models import birdnet_v24

            print("generating bench model...", file=sys.stderr)
            birdnet_v24.save(model_path)

    from birdnet_tpu.serve import DynamicBatcher

    clf = _build_classifier(model_path, args.precision)
    segment = (
        np.sin(
            np.linspace(0, 2000, clf.config.sample_count), dtype=np.float32
        )
        * 0.3
    )
    print(f"device={clf.device} model={clf.model_type.name}", file=sys.stderr)

    rows = []
    for max_batch in (int(x) for x in args.batches.split(",")):
      for wait in (float(x) for x in args.waits.split(",")):
        for n_workers in (int(x) for x in args.workers.split(",")):
            for n_clients in (int(x) for x in args.clients.split(",")):
                # fresh batcher per row so mean_fill reflects this row only
                # (executable caches make re-creation cheap)
                with DynamicBatcher(
                    clf,
                    max_batch=max_batch,
                    max_wait_ms=wait,
                    workers=n_workers,
                ) as batcher:
                    _closed_loop(  # warmup
                        batcher, segment, 4, min(1.0, args.seconds)
                    )
                    # Metrics are cumulative: zero out the warmup's small
                    # batches so mean_fill reflects this row only.
                    batcher.metrics.reset()
                    done, wall, lats, errs = _closed_loop(
                        batcher, segment, n_clients, args.seconds
                    )
                    snap = batcher.metrics.snapshot()
                row = {
                    "max_batch": max_batch,
                    "max_wait_ms": wait,
                    "workers": n_workers,
                    "clients": n_clients,
                    "req_per_s": round(done / wall, 1),
                    "p50_ms": round(lats[len(lats) // 2] * 1000, 2)
                    if lats
                    else None,
                    "p99_ms": round(
                        lats[min(len(lats) - 1, int(0.99 * len(lats)))]
                        * 1000,
                        2,
                    )
                    if lats
                    else None,
                    "mean_fill": snap["mean_batch_fill"],
                    "client_errors": errs,
                }
                rows.append(row)
                print(json.dumps(row))
    # summary: best throughput row
    best = max(rows, key=lambda r: r["req_per_s"])
    print(f"# best: {json.dumps(best)}", file=sys.stderr)


if __name__ == "__main__":
    main()
