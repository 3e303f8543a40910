"""Microbench: lax.top_k vs two-stage exact top-k on [tile, N] logits.

Two-stage: pad N to c*128 chunks, per-chunk top-k (small sorts), then
top-k over the tile x (chunks*k) candidates with index remap. Exact when
k <= chunk width; tie order matches lax.top_k (lower index wins) because
candidates keep chunk-major order.

Usage: python scripts/topk_bench.py [--n 6522] [--tile 128] [--k 10]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def two_stage_top_k(logits, k, chunk=512):
    import jax.numpy as jnp
    from jax import lax

    b, n = logits.shape
    nc = -(-n // chunk)
    pad = nc * chunk - n
    if pad:
        fill = jnp.full((b, pad), -jnp.inf, dtype=logits.dtype)
        logits = jnp.concatenate([logits, fill], axis=1)
    vals, idx = lax.top_k(logits.reshape(b, nc, chunk), k)  # [b, nc, k]
    base = (jnp.arange(nc, dtype=jnp.int32) * chunk)[None, :, None]
    gidx = idx.astype(jnp.int32) + base
    cv, ci = lax.top_k(vals.reshape(b, nc * k), k)
    return cv, jnp.take_along_axis(gidx.reshape(b, nc * k), ci, axis=1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=6522)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=256)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--chunk", type=int, default=512)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    rng = np.random.default_rng(0)
    base = jax.device_put(
        rng.normal(size=(args.tile, args.n)).astype(np.float32), device
    )

    def timed(name, fn):
        jfn = jax.jit(fn)
        float(jfn(base))
        dts = []
        for _ in range(3):
            t0 = time.monotonic()
            float(jfn(base))
            dts.append(time.monotonic() - t0)
        dt = statistics.median(dts) / args.reps
        print(f"{name:24s} {dt * 1e6:9.1f} us/tile "
              f"({dt / args.tile * 1e6:6.3f} us/seg)")

    dt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32

    def loop(body):
        def prog(x):
            def it(i, c):
                logits = (x * (1.0 + c)).astype(dt)
                v = body(logits)
                return (v > 1e30).astype(jnp.float32) * 1e-30
            return lax.fori_loop(0, args.reps, it, jnp.float32(0.0))
        return prog

    def baseline(logits):
        return jnp.sum(logits.astype(jnp.float32))

    def xla_topk(logits):
        v, i = lax.top_k(logits, args.k)
        return jnp.sum(jax.nn.sigmoid(v).astype(jnp.float32)) + jnp.sum(i)

    def two_stage(logits):
        v, i = two_stage_top_k(logits, args.k, args.chunk)
        return jnp.sum(jax.nn.sigmoid(v).astype(jnp.float32)) + jnp.sum(i)

    # correctness first
    lb = base.astype(dt)
    v1, i1 = jax.jit(lambda x: lax.top_k(x, args.k))(lb)
    v2, i2 = jax.jit(lambda x: two_stage_top_k(x, args.k, args.chunk))(lb)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    print("# two-stage exact: indices+values match lax.top_k")

    timed("read-only baseline", loop(baseline))
    timed("lax.top_k", loop(xla_topk))
    timed(f"two-stage (chunk {args.chunk})", loop(two_stage))
    return 0


if __name__ == "__main__":
    sys.exit(main())
