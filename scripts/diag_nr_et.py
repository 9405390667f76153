"""HW check: slot-streaming early termination on 5G NR BG1 Z=384 (round 3).

NR decoded fixed-iteration only through round 2 (the resident-ET footprint
question never arose — residency itself loses on NR's degree-22 layers).
The slot-streaming ET kernel needs only the int8 hard-bit state resident
(~3.3 MB at Z=384), so NR is in-domain. Rate matching applies: punctured
2Z systematic columns enter at LLR 0, so early iterations rarely satisfy
the syndrome — ET pays only once the punctured bits are resolved.
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def llrs_at(code, ebn0_db, batch, seed):
    """Quantized channel LLRs, all-zeros codeword, BPSK, NR rate matching
    (punctured -> 0, shortened -> +saturated), Eb/N0 over TRANSMITTED bits."""
    rng = np.random.default_rng(seed)
    excluded = set(map(int, code.punct_vns)) | set(map(int,
                                                       code.shortened_vns))
    n_tx = code.n - len(excluded)
    rate = code.k_eff / n_tx
    sigma = 1.0 / np.sqrt(2.0 * rate * 10 ** (ebn0_db / 10))
    y = 1.0 + sigma * rng.standard_normal((batch, n_tx))
    llr = 2.0 * y / sigma ** 2
    q = np.clip(np.round(llr * 4.0), -127, 127).astype(np.int8)
    full = np.zeros((batch, code.n), np.int8)
    tx = [v for v in range(code.n) if v not in excluded]
    full[:, tx] = q
    if len(code.shortened_vns):
        full[:, np.asarray(code.shortened_vns)] = 127
    return full


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    import jax.numpy as jnp
    from ldpc_tpu import oracle
    from ldpc_tpu.codes.nr_bg import make_code
    from ldpc_tpu.kernels.minsum_stream import make_stream_decoder

    Z = int(sys.argv[1]) if len(sys.argv) > 1 else 384
    batch = 256
    code = make_code(base_graph=1, Z=Z)

    dec_fix = make_stream_decoder(code, max_iter=20, beta=2, qmax=127,
                                  batch_tile=128)
    dec_et = make_stream_decoder(code, max_iter=20, beta=2, qmax=127,
                                 batch_tile=128, early_term=True)
    print(json.dumps({"Z": Z, "fixed_variant": dec_fix.variant,
                      "et_variant": dec_et.variant}), flush=True)
    jfix = jax.jit(lambda x: dec_fix(x))
    jet = jax.jit(lambda x: dec_et(x))
    # TIMING fns return a device-side SCALAR reduction: profiling.timed
    # syncs by fetching its output, and a (B, n) hard-bit tensor would
    # drag multi-MB through the ~4 MB/s tunnel per trial (CLAUDE.md)
    tfix = jax.jit(lambda x: dec_fix(x)[1].sum())
    tet = jax.jit(lambda x: dec_et(x)[1].sum())

    from ldpc_tpu.utils.profiling import timed as _timed

    def timed(tfn, fn, chan, reps=3, trials=4):
        out = fn(chan)
        np.asarray(out[2])
        return _timed(tfn, chan, reps=reps, trials=trials), out

    for ebn0 in (float(a) for a in (sys.argv[2:] or ["2.0", "2.5", "3.0"])):
        chan_np = llrs_at(code, ebn0, batch, seed=int(ebn0 * 10))
        chan = jnp.asarray(chan_np)
        s_fix, _ = timed(tfix, jfix, chan)
        s_et, out = timed(tet, jet, chan)
        h, it, cv = map(np.asarray, out)
        ho, ito, cvo = oracle.decode_batch(
            chan_np[:128], code, max_iter=20, beta=2, qmax=127,
            schedule="layered", early_term=True)
        ok = (np.array_equal(h[:128], ho) and np.array_equal(it[:128], ito)
              and np.array_equal(cv[:128], cvo))
        print(json.dumps({
            "variant": f"nr_bg1_z{Z}_et_vs_fixed20", "ebn0_db": ebn0,
            "fixed_ms": round(s_fix * 1e3, 2),
            "et_ms": round(s_et * 1e3, 2),
            "speedup": round(s_fix / s_et, 3),
            "avg_iters": round(float(it.mean()), 2),
            "conv": round(float(cv.mean()), 4),
            "vs_oracle_128": bool(ok),
            "et_gbps": round(batch * code.k_eff / s_et / 1e9, 4)}),
            flush=True)


if __name__ == "__main__":
    main()
