"""HW check: auto two-phase ET composed with the HBM-regime kernels on
DVB-S2 n=64800 (round-3): phase 1 = slot-streaming-ET(p1), repack, phase 2
= slot-streaming-ET(20) on the compacted lanes. Targets the 1.8 dB left
edge where whole-tile stragglers hold plain stream-ET at ~parity with
fixed-20 (docs/PERFORMANCE.md).
"""
import dataclasses
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    import jax.numpy as jnp
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.ops.channel import sigma_for
    from ldpc_tpu.sim import Sweep, build_code, make_run_batch

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    ebn0s = [float(a) for a in (sys.argv[2:] or ["1.8", "2.2"])]
    base = PRESETS["dvbs2-64800-r12"]
    base = dataclasses.replace(
        base, run=dataclasses.replace(base.run, batch=B))
    code = build_code(base)

    cfg_fix = base  # early_term=False in the preset
    cfg_et = dataclasses.replace(
        base, decoder=dataclasses.replace(base.decoder, early_term=True))
    rb_fix = make_run_batch(code, cfg_fix, batch=B,
                            decoder_backend="auto", batch_tile=128)
    rb_et = make_run_batch(code, cfg_et, batch=B,
                           decoder_backend="auto", batch_tile=128)
    cfg_auto = dataclasses.replace(
        base, decoder=dataclasses.replace(base.decoder, early_term=True,
                                          phase1_iters=-1))
    sweep = Sweep(cfg_auto, decoder_backend="auto", batch=B, batch_tile=128)

    from ldpc_tpu.utils.profiling import timed as _timed

    def timed(fn, key, sigma, reps=3, trials=4):
        out = np.asarray(fn(key, jnp.float32(sigma)))
        return _timed(fn, key, jnp.float32(sigma), reps=reps,
                      trials=trials), out

    key = jax.random.PRNGKey(3)
    for si, e in enumerate(ebn0s):
        sigma = sigma_for(e, code.rate, "bpsk")
        rb_auto = sweep._tuned_run_batch(si, sigma)
        tuned = [k for k in sweep._tuned_rb
                 if sweep._tuned_rb[k] is rb_auto]
        s_fix, _ = timed(rb_fix, key, sigma)
        s_et, out_e = timed(rb_et, key, sigma)
        s_auto, out_a = timed(rb_auto, key, sigma)
        print(json.dumps({
            "variant": "auto_two_phase_dvbs2_64800", "ebn0_db": e,
            "tuned": tuned[0] if tuned else None,
            "fixed20_ms": round(s_fix * 1e3, 2),
            "stream_et_ms": round(s_et * 1e3, 2),
            "auto_ms": round(s_auto * 1e3, 2),
            "auto_vs_fixed": round(s_fix / s_auto, 3),
            "counters_equal_single_phase": bool(np.array_equal(out_e,
                                                               out_a)),
            "auto_gbps": round(B * code.k / s_auto / 1e9, 4)}), flush=True)


if __name__ == "__main__":
    main()
