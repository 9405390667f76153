"""Benchmark driver — run on the real TPU chip.

Measures the north-star metric (BASELINE.json:2): decoded information bits per
second per chip on the canonical config (802.11n n=648 rate-1/2, BPSK/AWGN,
8-bit fixed-point min-sum, flooding, 20 fixed iterations — BASELINE.json:7),
using the full jitted pipeline (encode -> modulate -> AWGN -> demap ->
quantize -> Pallas decode -> counters).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 1e9 — the >= 1 Gbit/s/chip target (BASELINE.md row 4;
the reference publishes no numbers, BASELINE.json:13).

Timing methodology: the tunneled single-chip platform has bursty dispatch
latency (observed 10 ms..200 ms for the identical program), so the metric is
the best of several trials, each trial timing a pipelined burst of calls
synced once by a host fetch of the scalar counters at the end.
"""
import json
import sys
import time

import numpy as np


def main() -> None:
    import jax

    # Persistent compile cache: first compile over the tunneled toolchain
    # costs minutes; subsequent bench runs hit the cache.
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.sim import build_code, make_run_batch
    from ldpc_tpu.ops.channel import sigma_for

    cfg = PRESETS["wifi-648-r12-minsum"]
    code = build_code(cfg)
    batch = 16384
    run_batch = make_run_batch(code, cfg, batch=batch,
                               decoder_backend="auto", batch_tile=1024)
    sigma = np.float32(sigma_for(cfg.channel.ebn0_db, code.rate,
                                 cfg.channel.modulation))
    key = jax.random.PRNGKey(0)

    out = run_batch(key, sigma)          # compile + warm up
    bit_errs = int(out[1])
    trials, reps = 5, 10
    best = float("inf")
    for t in range(trials):
        t0 = time.time()
        for r in range(reps):
            out = run_batch(jax.random.fold_in(key, t * reps + r), sigma)
        bit_errs += int(out[1])          # host fetch forces completion
        best = min(best, (time.time() - t0) / reps)
    info_bps = batch * code.k / best

    print(json.dumps({
        "metric": "decoded_info_bits_per_s_per_chip",
        "value": round(info_bps, 1),
        "unit": "bit/s",
        "vs_baseline": round(info_bps / 1e9, 4),
    }))
    print(f"# config=wifi-648-r12-minsum batch={batch} "
          f"platform={jax.default_backend()} ms/batch={best*1e3:.2f} "
          f"full pipeline encode..decode(20 it)..count", file=sys.stderr)


if __name__ == "__main__":
    main()
