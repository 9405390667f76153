"""TPU validation + timing for the Monte-Carlo megakernel (rng="device").

1. Statistical check: BER/FER/avg-iters from the mc megakernel at 2.0 dB must
   agree with the host-threefry pipeline within Monte-Carlo error (different
   RNG family -> statistically, not bitwise, comparable).
2. Timing: best-of-trials superbatched burst, same methodology as bench.py.

Run: PYTHONPATH=. python scripts/diag_mc_tpu.py [--time-only]
"""
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.sim import build_code, make_run_batch
    from ldpc_tpu.ops.channel import sigma_for

    cfg = PRESETS["wifi-648-r12-minsum"]
    code = build_code(cfg)
    batch, superbatches = 16384, 32
    sigma = np.float32(sigma_for(cfg.channel.ebn0_db, code.rate,
                                 cfg.channel.modulation))
    key = jax.random.PRNGKey(0)

    rb_mc = make_run_batch(code, cfg, batch=batch, decoder_backend="auto",
                           batch_tile=512, superbatches=superbatches,
                           rng="device")
    t0 = time.time()
    out = rb_mc(key, sigma)
    out = np.asarray(out)
    print(f"mc compile+first: {time.time()-t0:.1f}s counters={out.tolist()}",
          flush=True)

    if "--time-only" not in sys.argv:
        rb_host = make_run_batch(code, cfg, batch=batch,
                                 decoder_backend="auto", batch_tile=512,
                                 superbatches=superbatches)
        outh = np.asarray(rb_host(key, sigma))
        for name, o in (("host", outh), ("mc", out)):
            frames = int(o[0])
            ber = o[1] / (frames * code.k)
            fer = o[2] / frames
            print(f"{name}: frames={frames} ber={ber:.3e} fer={fer:.3e}"
                  f" avg_iters={o[3]/frames:.2f} conv={o[4]/frames:.3f}",
                  flush=True)

    # timing
    trials, reps = 6, 2
    best = float("inf")
    acc = 0
    for t in range(trials):
        t0 = time.time()
        for r in range(reps):
            out = rb_mc(jax.random.fold_in(key, 1 + t * reps + r), sigma)
        acc += int(out[1])
        best = min(best, (time.time() - t0) / (reps * superbatches))
    info_bps = batch * code.k / best
    print(f"mc: ms/batch={best*1e3:.3f} info_bps={info_bps:.4e} "
          f"({info_bps/1e9:.3f} Gb/s)", flush=True)


if __name__ == "__main__":
    main()
