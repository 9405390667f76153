"""Diagnose per-call vs per-sweep cost of the canonical config on the TPU.

Two independent splits:
  superbatch : full pipeline with superbatches = 1 vs 8 in ONE device call.
               If per-call launch overhead dominates the gap to the
               microbench prediction, ms/sub-batch collapses at 8.
  sweepslope : decode-only at max_iter = 20 vs 60; slope = true in-situ
               per-sweep cost, directly comparable to
               scripts/microbench_rot.py flat_minsum (5.95 us/sweep).

Prints one JSON line per split.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def fetch_timed(fn, *args, reps=5, trials=4):
    out = fn(*args)
    np.asarray(out if not isinstance(out, tuple) else out[-1])
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out if not isinstance(out, tuple) else out[-1])
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    which = sys.argv[1]
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.sim import build_code
    cfg = PRESETS["wifi-648-r12-minsum"]
    code = build_code(cfg)
    batch = 16384

    if which == "superbatch":
        from ldpc_tpu.ops.channel import sigma_for
        from ldpc_tpu.sim import make_run_batch
        sigma = np.float32(sigma_for(2.0, code.rate, "bpsk"))
        key = jax.random.PRNGKey(0)
        out = {}
        for sb in (1, 8):
            rb = make_run_batch(code, cfg, batch=batch,
                                decoder_backend="auto", batch_tile=512,
                                superbatches=sb)
            sec = fetch_timed(lambda k: rb(k, sigma), key,
                              reps=max(2, 10 // sb), trials=4)
            out[f"ms_per_subbatch_sb{sb}"] = round(sec / sb * 1e3, 3)
            out[f"info_gbps_sb{sb}"] = round(batch * code.k * sb / sec / 1e9,
                                             4)
        print(json.dumps({"variant": "superbatch_amortization", **out}))
    elif which == "sweepslope":
        import jax.numpy as jnp
        from ldpc_tpu.kernels.minsum_pallas import make_pallas_decoder
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.integers(-40, 40, size=(batch, code.n))
                        .astype(np.int8))
        times = {}
        for it in (20, 60):
            dec = make_pallas_decoder(code, max_iter=it, beta=0, qmax=127,
                                      schedule="flooding", early_term=False,
                                      batch_tile=512)
            jd = jax.jit(dec)
            times[it] = fetch_timed(jd, q, reps=5, trials=4)
        slope_us = (times[60] - times[20]) / (40 * batch // 512) * 1e6
        print(json.dumps({
            "variant": "decode_sweep_slope",
            "ms_20it": round(times[20] * 1e3, 3),
            "ms_60it": round(times[60] * 1e3, 3),
            "us_per_sweep_per_tile": round(slope_us, 3),
            "microbench_prediction": 5.95,
        }))


if __name__ == "__main__":
    main()
