"""HW check: early-terminating stream kernels (resident-ET where the tile
footprint fits, SLOT-STREAMING ET for n=64800 — round-3) on DVB-S2 — does
ET pay in the HBM regime?

Compares fixed-20 vs the dispatched ET variant at operating SNRs (noisy
all-zero codeword through the real quantized-LLR chain), and asserts
hardware bit-exactness (hard bits / per-lane iters / convergence) vs the
C oracle.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def llrs_at(code, ebn0_db, batch, seed):
    """Quantized channel LLRs for the all-zeros codeword at Eb/N0 (BPSK)."""
    rng = np.random.default_rng(seed)
    sigma = 1.0 / np.sqrt(2.0 * code.rate * 10 ** (ebn0_db / 10))
    y = 1.0 + sigma * rng.standard_normal((batch, code.n))
    llr = 2.0 * y / sigma ** 2
    q = np.clip(np.round(llr * 4.0), -127, 127)  # scale=4 (QuantConfig default)
    return q.astype(np.int8)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    import jax.numpy as jnp
    from ldpc_tpu import oracle
    from ldpc_tpu.codes.dvbs2 import make_code
    from ldpc_tpu.kernels.minsum_stream import make_stream_decoder

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 64800
    batch = 1024
    code = make_code(n, "1/2")

    def timed(fn, chan, reps=3, trials=4):
        out = fn(chan)
        np.asarray(out[2])
        best = float("inf")
        for _ in range(trials):
            t0 = time.time()
            for _ in range(reps):
                out = fn(chan)
            np.asarray(out[2])
            best = min(best, (time.time() - t0) / reps)
        return best, out

    dec_fix = make_stream_decoder(code, max_iter=20, beta=2, qmax=127,
                                  batch_tile=128)
    dec_et = make_stream_decoder(code, max_iter=20, beta=2, qmax=127,
                                 batch_tile=128, early_term=True)
    print(json.dumps({"n": n, "fixed_variant": dec_fix.variant,
                      "et_variant": dec_et.variant}), flush=True)
    jfix = jax.jit(lambda x: dec_fix(x))
    jet = jax.jit(lambda x: dec_et(x))

    for ebn0 in (float(a) for a in (sys.argv[2:] or ["1.8", "2.2", "2.6"])):
        chan_np = llrs_at(code, ebn0, batch, seed=int(ebn0 * 10))
        chan = jnp.asarray(chan_np)
        s_fix, _ = timed(jfix, chan)
        s_et, out = timed(jet, chan)
        h, it, cv = map(np.asarray, out)
        print(json.dumps({
            "variant": f"dvbs2_{n}_et_vs_fixed20",
            "ebn0_db": ebn0,
            "fixed_ms": round(s_fix * 1e3, 1),
            "et_ms": round(s_et * 1e3, 1),
            "speedup": round(s_fix / s_et, 3),
            "avg_iters": round(float(it.mean()), 2),
            "conv": round(float(cv.mean()), 4),
            "fixed_gbps": round(batch * code.k / s_fix / 1e9, 4),
            "et_gbps": round(batch * code.k / s_et / 1e9, 4)}), flush=True)

        ho, ito, cvo = oracle.decode_batch(
            chan_np[:128], code, max_iter=20, beta=2, qmax=127,
            schedule="layered", early_term=True)
        ok = (np.array_equal(h[:128], ho) and np.array_equal(it[:128], ito)
              and np.array_equal(cv[:128], cvo))
        print(json.dumps({"variant": f"dvbs2_{n}_et_exact_hw",
                          "ebn0_db": ebn0, "vs_oracle_128": bool(ok)}),
              flush=True)
        if not ok:
            d = np.flatnonzero(it[:128] != ito)
            print("  iter mismatches:", d[:10], it[:128][d[:10]], ito[d[:10]])


if __name__ == "__main__":
    main()
