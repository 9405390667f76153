"""Benchmark driver — run on the real TPU chip.

Measures the north-star metric (BASELINE.json:2): decoded information bits per
second per chip on the canonical config (802.11n n=648 rate-1/2, BPSK/AWGN,
8-bit fixed-point min-sum, flooding, 20 fixed iterations — BASELINE.json:7),
using the full jitted pipeline (encode -> modulate -> AWGN -> demap ->
quantize -> Pallas decode -> counters).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "vs_prev"}.
vs_baseline is value / 1e9 — the >= 1 Gbit/s/chip target (BASELINE.md row 4;
the reference publishes no numbers, BASELINE.json:13). vs_prev is value /
recorded-previous value (bench_baselines.json) — the SURVEY.md §4.2
throughput-regression row: the process exits 1 when the measurement falls
more than 15% below the recorded baseline.

Also prints (stderr) the roofline ratio: measured vs the VPU-bound model of
docs/PERFORMANCE.md — ~14 essential int32 vector ops per base-matrix entry
per flooding sweep at the per-op throughput measured on this chip at the
kernel's real operand shape (scripts/microbench_rot.py opshape: 0.448 ns
per kilo-element per op on (Z=27, 512); recalibrated round 2).

Timing methodology: the tunneled single-chip platform has bursty dispatch
latency (observed 10 ms..200 ms for the identical program), so the metric is
the best of several trials, each trial timing a pipelined burst of calls
synced once by a host fetch of the scalar counters at the end.

`python bench.py --record` re-records the baseline after an intentional
improvement.
"""
import json
import os
import sys
import time

import numpy as np

BASELINES_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "bench_baselines.json")
CONFIG = "wifi-648-r12-minsum"

# VPU-bound roofline model, recalibrated round 2 (docs/PERFORMANCE.md
# 'Roofline'): ~14 essential int32 vector ops per base-matrix entry per
# flooding sweep, each op measured at 0.448 ns/kelem on the kernel's real
# (Z=27, Bt) operand shape (microbench_rot.py `opshape` — the earlier 0.78
# flat_base figure mixed in rotation concats and understated attainable
# per-op speed, masking that the kernel is ~at the elementwise ceiling).
# Entries x Z / n converts per-entry ops to per-codeword-element cost
# (computed from the actual base matrix at the call site — 88 * 27 / 648
# for 802.11n); +12% measured non-decode pipeline cost.
OP_NS_PER_KELEM = 0.448
OPS_PER_ENTRY = 14
PIPELINE_OVERHEAD = 1.12


def roofline_info_bps(k: int, n: int, iters: int, entries: int,
                      Z: int) -> float:
    ns_per_kelem_sweep = OPS_PER_ENTRY * OP_NS_PER_KELEM * (entries * Z / n)
    ns_per_cw = ns_per_kelem_sweep * (n / 1000.0) * iters
    return k / (ns_per_cw * PIPELINE_OVERHEAD) * 1e9


def main() -> None:
    import jax

    # Persistent compile cache: first compile over the tunneled toolchain
    # costs minutes; subsequent bench runs hit the cache.
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.sim import build_code, make_run_batch
    from ldpc_tpu.ops.channel import sigma_for

    cfg = PRESETS[CONFIG]
    code = build_code(cfg)
    batch = 16384
    # superbatches: one device call runs 32 sub-batches via fori_loop —
    # the production sweep driver's amortization of the tunneled
    # platform's per-call dispatch overhead (~2-3 ms, which does not exist
    # on directly-attached hardware). Counters sum exactly.
    superbatches = 32
    # rng="device": the Monte-Carlo megakernel — info bits, QC encode,
    # Box-Muller AWGN, demap, quantize, decode and error counting all run
    # inside the Pallas kernel off the TPU hardware PRNG (the production
    # single-chip fast path; statistically validated against the host
    # threefry chain in scripts/diag_mc_tpu.py).
    run_batch = make_run_batch(code, cfg, batch=batch,
                               decoder_backend="auto", batch_tile=512,
                               superbatches=superbatches, rng="device")
    sigma = np.float32(sigma_for(cfg.channel.ebn0_db, code.rate,
                                 cfg.channel.modulation))
    key = jax.random.PRNGKey(0)

    out = run_batch(key, sigma)          # compile + warm up
    bit_errs = int(out[1])
    # Tunnel dispatch latency is bursty (same-day best-of-6 measurements
    # ranged 1.00-1.06 Gb/s); more trials tighten the best-of estimator at
    # ~1 s/trial.
    trials, reps = 10, 2
    best = float("inf")
    for t in range(trials):
        t0 = time.time()
        for r in range(reps):
            out = run_batch(jax.random.fold_in(key, t * reps + r), sigma)
        bit_errs += int(out[1])          # host fetch forces completion
        best = min(best, (time.time() - t0) / (reps * superbatches))
    info_bps = batch * code.k / best

    prev = None
    if os.path.exists(BASELINES_PATH):
        prev = json.load(open(BASELINES_PATH)).get(CONFIG, {}).get("info_bps")
    vs_prev = round(info_bps / prev, 4) if prev else None

    print(json.dumps({
        "metric": "decoded_info_bits_per_s_per_chip",
        "value": round(info_bps, 1),
        "unit": "bit/s",
        "vs_baseline": round(info_bps / 1e9, 4),
        "vs_prev": vs_prev,
    }))
    roof = roofline_info_bps(code.k, code.n, cfg.decoder.max_iter,
                             entries=int((code.base >= 0).sum()),
                             Z=code.Z)
    print(f"# config={CONFIG} batch={batch} "
          f"platform={jax.default_backend()} ms/batch={best*1e3:.2f} "
          f"roofline_ratio={info_bps/roof:.2f} (model {roof/1e9:.2f} Gb/s) "
          f"full pipeline encode..decode(20 it)..count", file=sys.stderr)

    if "--record" in sys.argv:
        data = (json.load(open(BASELINES_PATH))
                if os.path.exists(BASELINES_PATH) else {})
        data[CONFIG] = {"info_bps": round(info_bps, 1),
                        "recorded": time.strftime("%Y-%m-%d")}
        json.dump(data, open(BASELINES_PATH, "w"), indent=1)
        print(f"# recorded baseline {info_bps:.3e} -> {BASELINES_PATH}",
              file=sys.stderr)
    elif prev and info_bps < 0.85 * prev:
        print(f"# PERF REGRESSION: {info_bps:.3e} bit/s is "
              f"{info_bps/prev:.1%} of the recorded baseline {prev:.3e} "
              f"(limit 85%)", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
