"""Mosaic capability + cost probes for the fused MBConv v2 kernel.

Variants of the in-VMEM 3x3 depthwise stage, probed for compile success
and cost at backbone shapes, against the XLA depthwise conv:

  padslice  — padded VALUE via jnp.pad, 9 static value slices
  storeslice— zero scratch, aligned store, 9 unaligned value slices
  roll3d    — pltpu.roll on sublane (H) and lane (W) axes + edge masks

Usage: python scripts/mbconv_probe.py [--shape 160,24,128] [--dtype f32]
"""

import argparse
import functools
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", default="160,24,128")
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--variants", default="padslice,storeslice,roll3d")
    ap.add_argument("--dtypes", default="f32,bf16")
    args = ap.parse_args()
    C, H, W = (int(v) for v in args.shape.split(","))

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    print(f"# shape C={C} H={H} W={W} batch={args.batch}")

    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(args.batch, C, H, W)).astype(np.float32)
    wd_np = rng.normal(size=(C, 9)).astype(np.float32) * 0.1

    def taps_padslice(x, wd_ref, dtype):
        padded = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1)))
        acc = jnp.zeros((C, H, W), jnp.float32)
        for dy in range(3):
            for dx in range(3):
                tap = wd_ref[:, dy * 3 + dx][:, None, None].astype(jnp.float32)
                sl = lax.slice(padded, (0, dy, dx), (C, dy + H, dx + W))
                acc = acc + sl.astype(jnp.float32) * tap
        return acc

    def taps_roll3d(x, wd_ref, dtype):
        xv = x.astype(dtype)
        row = lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
        col = lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
        acc = jnp.zeros((C, H, W), jnp.float32)
        for dy in (-1, 0, 1):
            ry = pltpu.roll(xv, (-dy) % H, axis=1) if dy else xv
            for dx in (-1, 0, 1):
                t = pltpu.roll(ry, (-dx) % W, axis=2) if dx else ry
                valid = jnp.logical_and(
                    jnp.logical_and(row + dy >= 0, row + dy < H),
                    jnp.logical_and(col + dx >= 0, col + dx < W),
                )
                tap = wd_ref[:, (dy + 1) * 3 + (dx + 1)][:, None, None]
                acc = acc + jnp.where(valid, t, 0).astype(jnp.float32) * (
                    tap.astype(jnp.float32)
                )
        return acc

    def make_kernel(variant, dtype):
        if variant == "storeslice":
            def kernel(x_ref, wd_ref, o_ref, scratch):
                scratch[:] = jnp.zeros_like(scratch)
                scratch[:, 8:8 + H, 128:128 + W] = x_ref[0].astype(scratch.dtype)
                padded = scratch[:]
                acc = jnp.zeros((C, H, W), jnp.float32)
                for dy in range(3):
                    for dx in range(3):
                        tap = wd_ref[:, dy * 3 + dx][:, None, None].astype(jnp.float32)
                        sl = lax.slice(
                            padded, (0, 7 + dy, 127 + dx),
                            (C, 7 + dy + H, 127 + dx + W))
                        acc = acc + sl.astype(jnp.float32) * tap
                o_ref[0] = acc.astype(o_ref.dtype)
            scratch = [pltpu.VMEM((C, H + 16, W + 256), dtype)]
        else:
            taps = taps_padslice if variant == "padslice" else taps_roll3d
            def kernel(x_ref, wd_ref, o_ref):
                o_ref[0] = taps(x_ref[0], wd_ref, dtype).astype(o_ref.dtype)
            scratch = []
        return kernel, scratch

    def run_probe(variant, dtype_name):
        dtype = jnp.float32 if dtype_name == "f32" else jnp.bfloat16
        kernel, scratch = make_kernel(variant, dtype)
        fn = pl.pallas_call(
            kernel,
            grid=(args.batch,),
            in_specs=[
                pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((C, 16), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((args.batch, C, H, W), jnp.float32),
            scratch_shapes=scratch,
        )
        wd16 = jnp.pad(jnp.asarray(wd_np), ((0, 0), (0, 7)))
        x_d = jax.device_put(x_np, device)
        wd_d = jax.device_put(np.asarray(wd16), device)

        def looped(a, b):
            def body(i, c):
                out = fn(a, b * (1.0 + c))
                return (out[0, 0, 0, 0] > 1e30).astype(jnp.float32) * 1e-30
            return lax.fori_loop(0, args.reps, body, jnp.float32(0.0))

        name = f"pallas {variant} {dtype_name}"
        try:
            out = np.asarray(jax.jit(lambda a, b: fn(a, b))(x_d, wd_d))
            jfn = jax.jit(looped)
            float(jfn(x_d, wd_d))
        except Exception as e:  # noqa: BLE001
            print(f"{name:26s} FAILED: {str(e).splitlines()[0][:110]}")
            return
        dts = []
        for _ in range(3):
            t0 = time.monotonic()
            float(jfn(x_d, wd_d))
            dts.append(time.monotonic() - t0)
        dt = statistics.median(dts) / args.reps
        err = np.abs(out - ref).max() / (np.abs(ref).max() + 1e-9)
        print(f"{name:26s} {dt * 1e6:8.0f} us/call "
              f"({dt / args.batch * 1e6:6.2f} us/sample) relerr={err:.1e}")

    # correctness oracle + XLA cost
    def xla_dw(x, wd):
        dn = lax.ConvDimensionNumbers((0, 1, 2, 3), (0, 1, 2, 3), (0, 1, 2, 3))
        w4 = wd[:, :9].reshape(C, 1, 3, 3)
        return lax.conv_general_dilated(
            x, w4, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn,
            feature_group_count=C)

    x_d = jax.device_put(x_np, device)
    wd_d = jax.device_put(wd_np, device)
    ref = np.asarray(jax.jit(xla_dw)(x_d, wd_d))

    def ref_looped(a, b):
        def body(i, c):
            out = xla_dw(a, b * (1.0 + c))
            return (out[0, 0, 0, 0] > 1e30).astype(jnp.float32) * 1e-30
        return lax.fori_loop(0, args.reps, body, jnp.float32(0.0))

    jref = jax.jit(ref_looped)
    float(jref(x_d, wd_d))
    dts = []
    for _ in range(3):
        t0 = time.monotonic()
        float(jref(x_d, wd_d))
        dts.append(time.monotonic() - t0)
    dt = statistics.median(dts) / args.reps
    print(f"{'XLA depthwise f32':26s} {dt * 1e6:8.0f} us/call "
          f"({dt / args.batch * 1e6:6.2f} us/sample)")

    for variant in args.variants.split(","):
        for dtype_name in args.dtypes.split(","):
            run_probe(variant, dtype_name)
    return 0


if __name__ == "__main__":
    sys.exit(main())
