"""HW edge-case validation for the slot-streaming ET kernel (round 3).

Interpret mode validates VALUES under synchronous DMA semantics; these
paths must also be exercised ON SILICON, where DMA timing is real:
  * odd-mb (k_unroll=2) stream-ET, forced non-resident (n=16200 normally
    prefers resident-ET) — bit-exact vs the C oracle;
  * zero-iteration tile (every lane a codeword at entry): the n_act0==0
    epilogue DMA branch, n=16200 and n=64800;
  * mixed noiseless/noisy lanes: per-lane latch + whole-tile-skip
    interplay.
Also times forced stream-ET vs the preferred resident-ET on n=16200 (the
dispatch preference check).
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    import jax.numpy as jnp
    from ldpc_tpu import oracle
    from ldpc_tpu.codes.dvbs2 import make_code
    from ldpc_tpu.kernels.minsum_stream import make_stream_decoder
    from ldpc_tpu.utils.profiling import timed

    rng = np.random.default_rng(42)
    code = make_code(16200, "1/2")
    dec_s = make_stream_decoder(code, max_iter=20, beta=2, qmax=127,
                                batch_tile=128, early_term=True,
                                resident=False)
    dec_r = make_stream_decoder(code, max_iter=20, beta=2, qmax=127,
                                batch_tile=128, early_term=True)
    print(json.dumps({"forced": dec_s.variant, "auto": dec_r.variant}),
          flush=True)
    js = jax.jit(lambda x: dec_s(x))
    jr = jax.jit(lambda x: dec_r(x))

    sigma = 1.0 / np.sqrt(2.0 * code.rate * 10 ** (2.2 / 10))
    y = 1.0 + sigma * rng.standard_normal((256, code.n))
    chan = np.clip(np.round(2.0 * y / sigma**2 * 4.0), -127,
                   127).astype(np.int8)
    cj = jnp.asarray(chan)
    h, it, cv = map(np.asarray, js(cj))
    ho, ito, cvo = oracle.decode_batch(chan[:128], code, max_iter=20,
                                       beta=2, qmax=127, schedule="layered",
                                       early_term=True)
    ok = (np.array_equal(h[:128], ho) and np.array_equal(it[:128], ito)
          and np.array_equal(cv[:128], cvo))
    print(json.dumps({"case": "odd_mb_stream_et_bitexact_hw",
                      "ok": bool(ok)}), flush=True)

    chan0 = jnp.asarray(np.full((256, code.n), 127, np.int8))
    h0, it0, cv0 = map(np.asarray, js(chan0))
    print(json.dumps({"case": "zero_iter_tile_hw",
                      "ok": bool((it0 == 0).all() and cv0.all()
                                 and not h0.any())}), flush=True)

    chan_m = chan.copy()
    chan_m[::2] = 127
    hm, itm, cvm = map(np.asarray, js(jnp.asarray(chan_m)))
    hom, itom, cvom = oracle.decode_batch(chan_m[:128], code, max_iter=20,
                                          beta=2, qmax=127,
                                          schedule="layered",
                                          early_term=True)
    okm = (np.array_equal(hm[:128], hom)
           and np.array_equal(itm[:128], itom)
           and np.array_equal(cvm[:128], cvom))
    print(json.dumps({"case": "mixed_lanes_bitexact_hw", "ok": bool(okm)}),
          flush=True)

    # dispatch preference: resident-ET vs forced stream-ET at 2.2 dB.
    # Time SCALAR-output wrappers: profiling.timed syncs by fetching its
    # output, and the (B, n) hard bits would cost multi-MB tunnel fetches.
    tr = jax.jit(lambda x: dec_r(x)[1].sum())
    ts = jax.jit(lambda x: dec_s(x)[1].sum())
    np.asarray(tr(cj))
    np.asarray(ts(cj))
    s_res = timed(tr, cj, reps=3, trials=4)
    s_str = timed(ts, cj, reps=3, trials=4)
    print(json.dumps({"case": "n16200_et_dispatch_check",
                      "resident_et_ms": round(s_res * 1e3, 2),
                      "stream_et_ms": round(s_str * 1e3, 2),
                      "resident_preferred_ok": bool(s_res <= s_str * 1.05)}),
          flush=True)

    code2 = make_code(64800, "1/2")
    dec2 = make_stream_decoder(code2, max_iter=20, beta=2, qmax=127,
                               batch_tile=128, early_term=True)
    j2 = jax.jit(lambda x: dec2(x))
    chanz = jnp.asarray(np.full((128, code2.n), 127, np.int8))
    hz, itz, cvz = map(np.asarray, j2(chanz))
    print(json.dumps({"case": "zero_iter_64800_hw",
                      "ok": bool((itz == 0).all() and cvz.all()
                                 and not hz.any())}), flush=True)


if __name__ == "__main__":
    main()
