"""Hardware bench: fused MBConv kernels (v1/v2) vs XLA chain per block shape.

Shapes are the stride-1 (fuseable) blocks of the bench v2.4 backbone.
Timing: fori_loop reps serialized by perturbing w1, scalar readback.

Usage: python scripts/mbconv_bench.py [--reps 32] [--batch 128]
"""

import argparse
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (name, c_in, c_mid, c_se, c_out, h, w, residual)
SHAPES = [
    ("block00", 32, 32, 8, 24, 48, 256, False),
    ("block01", 24, 24, 6, 24, 48, 256, True),
    ("block03", 40, 160, 40, 40, 24, 128, True),
    ("block05", 80, 320, 80, 80, 12, 64, True),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=32)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--impls", default="xla_f32,xla_bf16,v1,v2")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from birdnet_tpu.ops.pallas.block import mbconv_block, mbconv_reference
    from birdnet_tpu.ops.pallas.block2 import mbconv_block2
    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    B = args.batch

    def xla_bf16(x, *a, residual):
        """The 'fast'-policy XLA chain: bf16 activations, f32 accumulation."""
        from jax import lax as L

        (w1, b1, wd, bd, se1, bse1, se2, bse2, w3, b3) = a
        dn = L.ConvDimensionNumbers((0, 1, 2, 3), (0, 1, 2, 3), (0, 1, 2, 3))
        bf = jnp.bfloat16

        def conv1x1(v, wt, bt):
            y = L.conv_general_dilated(
                v.astype(bf), jnp.asarray(wt, bf)[:, :, None, None], (1, 1),
                [(0, 0), (0, 0)], dimension_numbers=dn,
                preferred_element_type=jnp.float32)
            return y + jnp.asarray(bt, jnp.float32)[None, :, None, None]

        def silu(v):
            return (v * jax.nn.sigmoid(v)).astype(bf)

        c_mid = w1.shape[0]
        h1 = silu(conv1x1(x, w1, b1))
        hd = L.conv_general_dilated(
            h1, jnp.asarray(wd, bf), (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=dn, feature_group_count=c_mid,
            preferred_element_type=jnp.float32)
        h2 = silu(hd + jnp.asarray(bd, jnp.float32)[None, :, None, None])
        gap = jnp.mean(h2.astype(jnp.float32), axis=(2, 3))
        s1 = (gap @ jnp.asarray(se1, jnp.float32).T
              + jnp.asarray(bse1, jnp.float32))
        s1 = s1 * jax.nn.sigmoid(s1)
        s2 = jax.nn.sigmoid(s1 @ jnp.asarray(se2, jnp.float32).T
                            + jnp.asarray(bse2, jnp.float32))
        h3 = (h2 * s2[:, :, None, None].astype(bf))
        y = conv1x1(h3, w3, b3)
        if residual:
            y = y + x.astype(jnp.float32)
        return y.astype(bf)

    for (name, c_in, c_mid, c_se, c_out, h, w, residual) in SHAPES:
        rng = np.random.default_rng(1)

        def mk(*s, sc=0.2):
            return (rng.normal(size=s) * sc).astype(np.float32)

        x_np = (rng.normal(size=(B, c_in, h, w)) * 0.3).astype(np.float32)
        a_np = [mk(c_mid, c_in), mk(c_mid, sc=0.1), mk(c_mid, 1, 3, 3),
                mk(c_mid, sc=0.1), mk(c_se, c_mid), mk(c_se, sc=0.1),
                mk(c_mid, c_se), mk(c_mid, sc=0.1), mk(c_out, c_mid),
                mk(c_out, sc=0.1)]
        x_d = jax.device_put(x_np, device)
        a_d = [jax.device_put(v, device) for v in a_np]

        impls = {
            "xla_f32": lambda x, *a: mbconv_reference(x, *a, residual=residual),
            "xla_bf16": lambda x, *a: xla_bf16(x, *a, residual=residual),
            "v1": lambda x, *a: mbconv_block(x, *a, residual=residual),
            "v2": lambda x, *a: mbconv_block2(x, *a, residual=residual),
        }
        ref = None
        line = [f"{name} (mid={c_mid} {h}x{w})"]
        for impl_name in args.impls.split(","):
            impl = impls[impl_name]

            def looped(x, *a):
                def body(i, c):
                    out = impl(x, a[0] * (1.0 + c), *a[1:])
                    return (out[0, 0, 0, 0].astype(jnp.float32) > 1e30
                            ).astype(jnp.float32) * 1e-30
                return lax.fori_loop(0, args.reps, body, jnp.float32(0.0))

            try:
                out = np.asarray(
                    jax.jit(impl)(x_d, *a_d), dtype=np.float32)
                jfn = jax.jit(looped)
                float(jfn(x_d, *a_d))
            except Exception as e:  # noqa: BLE001
                line.append(f"{impl_name}=FAILED({str(e).splitlines()[0][:60]})")
                continue
            dts = []
            for _ in range(3):
                t0 = time.monotonic()
                float(jfn(x_d, *a_d))
                dts.append(time.monotonic() - t0)
            dt = statistics.median(dts) / args.reps
            if ref is None:
                ref = out
                rel = 0.0
            else:
                rel = float(np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9))
            line.append(f"{impl_name}={dt / B * 1e6:.2f}us/seg(rel={rel:.0e})")
        print("  ".join(line), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
