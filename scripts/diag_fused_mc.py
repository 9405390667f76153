"""Hardware check + A/B for the fused multi-SNR MC megakernel (per-lane
sigma rows — pipeline.make_run_batch n_points > 1 with rng='device').

1. EXACTNESS: a fused run with every point at the SAME sigma must produce
   per-point counters that sum to exactly the single-point megakernel's
   totals — identical PRNG stream (seeds + tile index), identical float32
   gain math, lanes merely re-labeled.
2. THROUGHPUT: 6-point fused batch, device-RNG megakernel vs the host
   threefry fused path (what run_fused used before this mode existed).

Timing: device_put'd inputs, scalar-fetch sync, best-of-trials bursts
(CLAUDE.md methodology). Run serially with other TPU jobs.
"""
import dataclasses
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(rb, key, sigma, reps=10, trials=5):
    out = rb(key, sigma)
    np.asarray(out)  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            out = rb(key, sigma)
        np.asarray(out)
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.ops.channel import sigma_for
    from ldpc_tpu.sim import build_code, make_run_batch

    cfg = PRESETS["wifi-648-r12-minsum"]
    B, P = 18432, 6  # 6 points x 3072 lanes, divisible by tile 512
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, batch=B, rng="device"))
    code = build_code(cfg)
    key = jax.random.PRNGKey(9)
    sig = np.float32(sigma_for(2.0, code.rate, "bpsk"))

    # 1. exactness: fused same-sigma == single-point totals
    rb1 = make_run_batch(code, cfg, batch=B, batch_tile=512)
    single = np.asarray(rb1(key, sig))
    rbP = make_run_batch(code, cfg, batch=B, batch_tile=512, n_points=P)
    assert rbP.mc, "fused run did not admit the MC megakernel"
    fused = np.asarray(rbP(key, jnp.asarray([sig] * P)))
    ok = bool((fused.sum(axis=1) == single).all())
    print(json.dumps({"check": "fused_mc_exact_vs_single", "ok": ok,
                      "single": single.tolist(),
                      "fused_sum": fused.sum(axis=1).tolist()}), flush=True)
    assert ok

    # 2. throughput: device-RNG fused vs host fused
    sigmas = jnp.asarray([sigma_for(e, code.rate, "bpsk")
                          for e in (1.0, 1.5, 2.0, 2.5, 3.0, 3.5)],
                         jnp.float32)
    t_mc = bench(rbP, key, sigmas)
    cfg_h = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, rng="host"))
    rbH = make_run_batch(build_code(cfg_h), cfg_h, batch=B, batch_tile=512,
                         n_points=P)
    t_host = bench(rbH, key, sigmas)
    for tag, t in (("fused-mc", t_mc), ("fused-host", t_host)):
        print(json.dumps({
            "variant": tag, "ms_per_batch": round(t * 1e3, 2),
            "info_gbps": round(code.k * B / t / 1e9, 3)}), flush=True)


if __name__ == "__main__":
    main()
