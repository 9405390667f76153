"""A/B the paired flooding sweep (minsum_pallas pair_layers) on hardware.

Decision data for whether stacking two independent base rows per vector op
(halving CN-reduction op count; +qmax pads) beats the unpaired sweep — the
answer depends on whether Mosaic charges per-op issue overhead that the
(Z=27, Bt) operand shape leaves on the table (see also microbench_rot.py
`opshape`).

Timing methodology (first version of this script got it wrong and measured
the tunnel instead of the chip): the input batch is device_put ONCE outside
the loop — re-passing a host numpy array re-streams 10.6 MB through the
~MB/s tunnel per call — and each trial syncs by fetching a device-side
SCALAR reduction of the last rep's output, never the (B, n) hard-bit
tensor. Prints one JSON line per variant.

Run serially with other TPU jobs (tunnel contention makes parallel jobs look
hung).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    from ldpc_tpu.codes.ieee80211n import make_code
    from ldpc_tpu.kernels.minsum_pallas import make_pallas_decoder

    code = make_code(648, "1/2")
    B, bt, iters = 16384, 512, 20
    rng = np.random.default_rng(0)
    x = rng.normal(0, 40, size=(B, code.n))
    x[: B // 2] = rng.normal(30, 25, size=(B // 2, code.n))
    chan = jax.device_put(np.clip(np.round(x), -127, 127).astype(np.int8))

    checksum = jax.jit(lambda h: jnp.sum(h.astype(jnp.int32)))

    for tag, pair in (("plain", False), ("paired", True)):
        # jit the wrapper: make_pallas_decoder returns an unjitted callable
        # (production callers jit the surrounding pipeline); called raw it
        # runs eagerly — one tunnel round-trip per op.
        dec = jax.jit(make_pallas_decoder(
            code, max_iter=iters, beta=2, qmax=127, schedule="flooding",
            early_term=False, batch_tile=bt, pair_layers=pair))
        h, _, _ = dec(chan)
        cs = int(np.asarray(checksum(h)))  # compile + warm + scalar fetch
        best, trials, reps = float("inf"), 7, 10
        for _ in range(trials):
            t0 = time.time()
            for _ in range(reps):
                h, _, _ = dec(chan)
            np.asarray(checksum(h))  # sync whole burst via one scalar
            best = min(best, (time.time() - t0) / reps)
        print(json.dumps({
            "variant": tag, "ms_per_batch": round(best * 1e3, 2),
            "us_per_sweep_tile": round(
                best / iters / (B // bt) * 1e6, 3),
            "hard_checksum": cs,
        }), flush=True)


if __name__ == "__main__":
    main()
