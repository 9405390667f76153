"""Measure Mosaic per-grid-step overhead on this chip.

Same total compute (N_STEPS x an inner fori of vector ops on a (Z, Bt)
block), once as grid=(32,) with BlockSpec-pipelined IO and once as
grid=(1,) over the whole array with an internal fori over tiles. The time
difference / 31 is the per-grid-step cost — the candidate explanation for
the VMEM decoder's in-situ sweeps running ~25% above their isolated cost
(docs/PERFORMANCE.md). Decides whether a megakernel (internal batch loop)
is worth building.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

Z, BT, T = 27, 512, 32
INNER = 400  # vector-op loop per tile — dominates so overhead is the delta


def work(x):
    def body(i, v):
        return jnp.maximum(v ^ (v + 1), v - 3)

    return jax.lax.fori_loop(0, INNER, body, x)


def grid32():
    def kernel(x_ref, o_ref):
        o_ref[...] = work(x_ref[...].astype(jnp.int32)).astype(jnp.int8)

    def run(x):
        return pl.pallas_call(
            kernel,
            grid=(T,),
            in_specs=[pl.BlockSpec((Z, BT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((Z, BT), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Z, T * BT), jnp.int8),
        )(x)
    return jax.jit(run)


def grid1():
    def kernel(x_ref, o_ref):
        def tile(t, _):
            v = x_ref[:, pl.ds(t * BT, BT)].astype(jnp.int32)
            o_ref[:, pl.ds(t * BT, BT)] = work(v).astype(jnp.int8)
            return 0

        jax.lax.fori_loop(0, T, tile, 0)

    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((Z, T * BT), jnp.int8),
        )(x)
    return jax.jit(run)


def fetch_timed(fn, x, reps=8, trials=4):
    np.asarray(fn(x))
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            out = fn(x)
        np.asarray(out)
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-100, 100, (Z, T * BT)).astype(np.int8))
    t32 = fetch_timed(grid32(), x)
    t1 = fetch_timed(grid1(), x)
    print(json.dumps({
        "variant": "grid_step_overhead",
        "grid32_ms": round(t32 * 1e3, 3),
        "grid1_ms": round(t1 * 1e3, 3),
        "per_step_us": round((t32 - t1) / (T - 1) * 1e6, 3),
    }))


if __name__ == "__main__":
    main()
