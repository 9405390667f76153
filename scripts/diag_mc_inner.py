"""Hardware check + timing for the MC megakernel's internal tile loop.

The tile loop's PRNG mix uses the tile index exactly like grid mode's
pl.program_id, so for identical (seeds, chanf) the per-lane counters must
be BITWISE equal between the two modes on hardware — asserted here —
while the inner loop saves the per-grid-step Mosaic re-entry (~12.6 us x
n_tiles; scripts/diag_gridstep.py).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ldpc_tpu.codes.ieee80211n import make_code  # noqa: E402
from ldpc_tpu.kernels.minsum_pallas import make_pallas_decoder  # noqa: E402


def timed(fn, *args, reps=8, trials=5):
    out = fn(*args)
    [np.asarray(o) for o in out]
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        [np.asarray(o) for o in out]
        best = min(best, (time.time() - t0) / reps)
    return best, out


def main():
    code = make_code(648, "1/2")
    B, bt = 16384, 512
    kb = code.k // code.Z
    sigma = np.float32(0.8913)  # ~2.0 dB for r=1/2 BPSK
    scale = 4.0
    gain = np.float32(2.0 * scale) / (sigma * sigma)
    seeds = jnp.asarray([12345, 67890, 0], jnp.int32)
    chanf = jnp.asarray([sigma, gain], jnp.float32)
    outs = {}
    for inner in (False, True):
        d = make_pallas_decoder(code, max_iter=20, qmax=127,
                                schedule="flooding", early_term=False,
                                batch_tile=bt, input_scale=scale,
                                count_info_cols=kb, mc_batch=B,
                                mc_inner_loop=inner)
        f = jax.jit(lambda s, c, d=d: d(s, c))
        sec, out = timed(f, seeds, chanf)
        outs[inner] = [np.asarray(o) for o in out]
        print(json.dumps({"variant": f"mc_inner={inner}",
                          "ms_per_batch": round(sec * 1e3, 3),
                          "info_gbps": round(B * code.k / sec / 1e9, 4),
                          "bit_errs": int(outs[inner][0].sum())}),
              flush=True)
    same = all(np.array_equal(a, b)
               for a, b in zip(outs[False], outs[True]))
    print(json.dumps({"variant": "inner_vs_grid_bitwise_equal",
                      "equal": bool(same)}), flush=True)


if __name__ == "__main__":
    main()
