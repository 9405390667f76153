"""A/B the paired flooding sweep (minsum_pallas pair_layers) on hardware.

Decision data for whether stacking two independent base rows per vector op
(halving CN-reduction op count; +qmax pads) beats the unpaired sweep — the
answer depends on whether Mosaic charges per-op issue overhead that the
(Z=27, Bt) operand shape leaves on the table (see also microbench_rot.py
`opshape`). Prints one JSON line per variant.

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

    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    from ldpc_tpu.codes.ieee80211n import make_code
    from ldpc_tpu.kernels.minsum_pallas import make_pallas_decoder

    code = make_code(648, "1/2")
    B, bt, iters = 16384, 512, 20
    rng = np.random.default_rng(0)
    x = rng.normal(0, 40, size=(B, code.n))
    x[: B // 2] = rng.normal(30, 25, size=(B // 2, code.n))
    chan = np.clip(np.round(x), -127, 127).astype(np.int8)

    for tag, pair in (("plain", False), ("paired", True)):
        dec = make_pallas_decoder(code, max_iter=iters, beta=2, qmax=127,
                                  schedule="flooding", early_term=False,
                                  batch_tile=bt, pair_layers=pair)
        h, _, _ = dec(chan)
        h0 = np.asarray(h)  # compile + warm + fetch
        best, trials, reps = float("inf"), 5, 3
        for _ in range(trials):
            t0 = time.time()
            for _ in range(reps):
                h, _, _ = dec(chan)
            np.asarray(h)
            best = min(best, (time.time() - t0) / reps)
        print(json.dumps({
            "variant": tag, "ms_per_batch": round(best * 1e3, 2),
            "us_per_sweep_tile": round(
                best / iters / (B // bt) * 1e6, 3),
            "hard_checksum": int(h0.astype(np.int64).sum()),
        }), flush=True)


if __name__ == "__main__":
    main()
