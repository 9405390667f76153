"""HW check: AUTO two-phase ET (phase1_iters=-1, sim/tune.py) on the
canonical config (802.11n n=648 r=1/2, 8-bit min-sum, max 20 iters,
batch 16384) across the waterfall. Round-2 verdict: hand-tuned two-phase
could LOSE to fixed-20 (9.54 ms vs 8.10 at a mistuned operating point);
the auto tuner must never be slower than fixed-20 across 2.0-3.0 dB.
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

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    ebn0s = [float(a) for a in (sys.argv[2:] or ["2.0", "2.4", "2.8", "3.0"])]
    base = PRESETS["wifi-648-r12-minsum"]
    base = dataclasses.replace(
        base, run=dataclasses.replace(base.run, batch=B))
    code = build_code(base)

    cfg_fix = dataclasses.replace(
        base, decoder=dataclasses.replace(base.decoder, early_term=False))
    cfg_et = dataclasses.replace(
        base, decoder=dataclasses.replace(base.decoder, early_term=True))
    rb_fix = make_run_batch(code, cfg_fix, batch=B,
                            decoder_backend="pallas", batch_tile=1024)
    rb_et = make_run_batch(code, cfg_et, batch=B,
                           decoder_backend="pallas", batch_tile=1024)

    cfg_auto = dataclasses.replace(
        base, decoder=dataclasses.replace(base.decoder, early_term=True,
                                          phase1_iters=-1))
    sweep = Sweep(cfg_auto, decoder_backend="pallas", batch=B,
                  batch_tile=1024)

    from ldpc_tpu.utils.profiling import timed as _timed

    def timed(fn, key, sigma, reps=4, trials=4):
        out = np.asarray(fn(key, jnp.float32(sigma)))
        return _timed(fn, key, jnp.float32(sigma), reps=reps,
                      trials=trials), out

    key = jax.random.PRNGKey(3)
    for si, e in enumerate(ebn0s):
        sigma = sigma_for(e, code.rate, "bpsk")
        rb_auto = sweep._tuned_run_batch(si, sigma)
        tuned = [k for k in sweep._tuned_rb
                 if sweep._tuned_rb[k] is rb_auto]
        s_fix, out_f = timed(rb_fix, key, sigma)
        s_et, out_e = timed(rb_et, key, sigma)
        s_auto, out_a = timed(rb_auto, key, sigma)
        # exactness: ET paths must agree with each other on counters
        ok = np.array_equal(out_e, out_a)
        print(json.dumps({
            "variant": "auto_two_phase_wifi648", "ebn0_db": e,
            "tuned": tuned[0] if tuned else None,
            "fixed20_ms": round(s_fix * 1e3, 2),
            "et_single_ms": round(s_et * 1e3, 2),
            "auto_ms": round(s_auto * 1e3, 2),
            "auto_vs_fixed": round(s_fix / s_auto, 3),
            "auto_not_slower_than_fixed": bool(s_auto <= s_fix * 1.02),
            "counters_equal_single_phase": bool(ok),
            "auto_gbps": round(B * code.k / s_auto / 1e9, 4)}), flush=True)


if __name__ == "__main__":
    main()
