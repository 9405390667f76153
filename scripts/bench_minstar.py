"""min* kernel throughput verdict (round-5, VERDICT item 3b).

Measures the Pallas VMEM min* decoder against the min-sum-family kernel
on the canonical wifi-648 pipeline at the bench methodology (best-of-
trials pipelined bursts, host-fetch sync) and prints the measured
op-count price of sum-product-grade CN arithmetic. The min* CN sweep
runs 3d-6 pairwise box-plus combines (~20 vector ops each) where
min-sum runs one min1/min2 merge (~4 ops/entry) — static estimate ~4-5x
CN cost; this records what the silicon actually charges end-to-end.

Run (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python scripts/bench_minstar.py
Appends the verdict to results/bench_minstar.json.
"""
import dataclasses
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(cfg, batch=16384, bt=512, sb=8, trials=8, reps=2):
    import jax
    from ldpc_tpu.ops.channel import sigma_for
    from ldpc_tpu.sim import build_code, make_run_batch

    code = build_code(cfg)
    rb = make_run_batch(code, cfg, batch=batch, decoder_backend="auto",
                        batch_tile=bt, superbatches=sb)
    sigma = np.float32(sigma_for(cfg.channel.ebn0_db, code.rate,
                                 cfg.channel.modulation))
    key = jax.random.PRNGKey(0)
    out = rb(key, sigma)
    _ = int(out[1])
    best = float("inf")
    for t in range(trials):
        t0 = time.time()
        for r in range(reps):
            out = rb(jax.random.fold_in(key, t * reps + r), sigma)
        _ = int(out[1])
        best = min(best, (time.time() - t0) / (reps * sb))
    return batch * code.k_eff / best, best * 1e3, rb.backend_label


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    from ldpc_tpu.config import PRESETS

    base = PRESETS["wifi-648-r12-minsum"]
    base = dataclasses.replace(
        base, decoder=dataclasses.replace(base.decoder, schedule="layered",
                                          early_term=True))
    rows = {}
    for name, alg, blsb in (("oms_b1", "offset-min-sum", 1),
                            ("minstar", "min-star", 0)):
        cfg = dataclasses.replace(
            base,
            quant=dataclasses.replace(base.quant, beta_lsb=blsb),
            decoder=dataclasses.replace(base.decoder, algorithm=alg))
        bps, ms, backend = measure(cfg)
        rows[name] = {"info_bps": round(bps, 1), "ms_per_batch": round(ms, 3),
                      "backend": backend}
        print(name, rows[name], flush=True)
    rows["minstar_cost_factor"] = round(
        rows["oms_b1"]["info_bps"] / rows["minstar"]["info_bps"], 3)
    rows["config"] = ("wifi-648 r=1/2 layered 20it ET, batch 16384 bt 512 "
                      "sb 8, full pipeline, best-of-8 bursts")
    with open("results/bench_minstar.json", "w") as f:
        json.dump(rows, f, indent=1)
    print(json.dumps({"minstar_vs_oms_cost": rows["minstar_cost_factor"]}))


if __name__ == "__main__":
    main()
