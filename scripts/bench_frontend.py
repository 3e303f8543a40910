"""A/B the phased Pallas frontend vs the XLA conv-frontend chain on TPU.

Times one tile of BirdNET v2.4-shaped segments ([128, 144000] bf16)
through (a) the XLA lowering of the frontend body chain and (b)
ops/pallas/frontend.py::segments_filterbank_logpower, and checks output
parity. Usage: python scripts/bench_frontend.py [--tile 128]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--r1", type=int, default=20)
    ap.add_argument("--r2", type=int, default=100)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from birdnet_tpu.ops.pallas.frontend import segments_filterbank_logpower
    from birdnet_tpu.runtime import init_runtime

    init_runtime()
    S, hop, K, F = 144_000, 280, 1024, 96
    tile = args.tile
    rng = np.random.default_rng(0)
    segs = (rng.normal(size=(tile, S)) * 0.1).astype(np.float32)
    w = (rng.normal(size=(F, K)) * 0.02).astype(np.float32)
    segs_bf = jnp.asarray(segs, jnp.bfloat16)
    w_j = jnp.asarray(w)

    def xla_chain(x):
        # the frontend body under the fast policy: bf16 conv operands
        fb = jax.lax.conv_general_dilated(
            x[:, None, :].astype(jnp.bfloat16), w_j[:, None, :].astype(jnp.bfloat16),
            window_strides=(hop,), padding=[(0, 0)],
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32,
        )  # [N, F, T]
        return jnp.log(fb * fb + 1e-6).astype(jnp.bfloat16)

    def pallas_fe(x):
        return segments_filterbank_logpower(
            x, w_j, hop=hop, compute_dtype=jnp.bfloat16
        )

    # parity
    a = np.asarray(jax.jit(xla_chain)(segs_bf), np.float32)
    b = np.asarray(jax.jit(pallas_fe)(segs_bf), np.float32)
    print(f"# parity: max abs diff {np.abs(a - b).max():.4f} "
          f"(log-space, bf16 operands both)", file=sys.stderr, flush=True)

    def timed(f, label):
        def looped(R):
            def prog(x):
                def body(i, carry):
                    x2, acc = carry
                    y = f(x2)
                    probe = y[0, 0, 0].astype(jnp.float32)
                    x3 = (x2.astype(jnp.float32) * (1.0 + probe * 1e-12)
                          ).astype(x2.dtype)
                    return (x3, acc + probe)
                return jax.lax.fori_loop(0, R, body, (x, jnp.float32(0)))[1]
            return jax.jit(prog)
        f1, f2 = looped(args.r1), looped(args.r2)
        xd = jax.device_put(segs_bf)
        t0 = time.monotonic()
        np.asarray(f1(xd)); np.asarray(f2(xd))
        print(f"# {label}: compile {time.monotonic()-t0:.0f}s",
              file=sys.stderr, flush=True)
        t1 = t2 = 1e9
        for _ in range(4):
            s = time.perf_counter(); np.asarray(f1(xd)); e = time.perf_counter()
            t1 = min(t1, e - s)
            s = time.perf_counter(); np.asarray(f2(xd)); e = time.perf_counter()
            t2 = min(t2, e - s)
        per = (t2 - t1) / (args.r2 - args.r1)
        print(f"{label}: {per*1e3:.2f} ms/tile = "
              f"{per/tile*1e6:.2f} us/segment", flush=True)
        return per

    t_x = timed(xla_chain, "xla-frontend")
    t_p = timed(pallas_fe, "pallas-frontend")
    print(f"speedup: {t_x/t_p:.2f}x", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
