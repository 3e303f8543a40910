"""Bisect which construct Mosaic rejects: minimal kernels at [1,C,H,W]."""

import functools
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

C, H, W = 160, 24, 128


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from birdnet_tpu.runtime import default_device, init_runtime

    init_runtime()
    device = default_device()
    rng = np.random.default_rng(0)
    x_np = rng.normal(size=(8, C, H, W)).astype(np.float32)
    x_d = jax.device_put(x_np, device)

    def try_kernel(name, body):
        def kernel(x_ref, o_ref):
            o_ref[0] = body(x_ref[0])

        fn = pl.pallas_call(
            kernel,
            grid=(8,),
            in_specs=[pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((1, C, H, W), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, C, H, W), jnp.float32),
        )
        try:
            out = np.asarray(jax.jit(fn)(x_d))
            print(f"{name:34s} OK  (sum {out.sum():.3f})")
            return True
        except Exception as e:  # noqa: BLE001
            print(f"{name:34s} FAILED: {str(e).splitlines()[0][:90]}")
            return False

    try_kernel("copy", lambda x: x)
    try_kernel("mul2", lambda x: x * 2.0)
    try_kernel("pad-slice-center",
               lambda x: lax.slice(jnp.pad(x, ((0, 0), (1, 1), (1, 1))),
                                   (0, 1, 1), (C, 1 + H, 1 + W)))
    try_kernel("pad-slice-offset",
               lambda x: lax.slice(jnp.pad(x, ((0, 0), (1, 1), (1, 1))),
                                   (0, 0, 0), (C, H, W)))
    try_kernel("roll-h", lambda x: pltpu.roll(x, 1, axis=1))
    try_kernel("roll-w", lambda x: pltpu.roll(x, 1, axis=2))
    try_kernel("slice-h-offset",
               lambda x: jnp.concatenate(
                   [lax.slice(x, (0, 1, 0), (C, H, W)),
                    lax.slice(x, (0, 0, 0), (C, 1, W))], axis=1))
    try_kernel("iota3d",
               lambda x: x + lax.broadcasted_iota(
                   jnp.int32, (1, H, W), 2).astype(jnp.float32))
    return 0


if __name__ == "__main__":
    sys.exit(main())
