"""Probe: NR BG1 Z=384 resident-int32 stream kernel at a raised scoped-VMEM
cap (est. footprint ~38 MB; 32 MB is hardware-verified, this probes 40).
Prints bit-exactness vs the static streaming kernel + timing for both.
One JSON line per result (bench.py fetch-sync methodology)."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    import jax.numpy as jnp
    from ldpc_tpu.codes.nr_bg import make_code
    from ldpc_tpu.kernels.minsum_stream import make_stream_decoder

    code = make_code(base_graph=1, Z=384)
    batch = 256
    rng = np.random.default_rng(0)
    chan = jnp.asarray(
        rng.integers(-40, 40, size=(batch, code.n)).astype(np.int8))

    def timed(fn, reps=5, trials=4):
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

    dres = make_stream_decoder(code, max_iter=20, beta=2, qmax=127,
                               batch_tile=128, resident=True,
                               posterior_i16=False,
                               res_cap_bytes=40 * 2 ** 20)
    assert dres.variant == "resident" and dres.post_dtype == jnp.int32
    jres = jax.jit(lambda x: dres(x))
    sec_r, out_r = timed(jres)
    print(json.dumps({"variant": "nr_resident_i32_cap40",
                      "ms_per_batch256": round(sec_r * 1e3, 2),
                      "info_gbps": round(batch * code.k_eff / sec_r / 1e9,
                                         4)}), flush=True)

    dst = make_stream_decoder(code, max_iter=20, beta=2, qmax=127,
                              batch_tile=128, resident=False)
    jst = jax.jit(lambda x: dst(x))
    sec_s, out_s = timed(jst)
    print(json.dumps({"variant": "nr_static_i32",
                      "ms_per_batch256": round(sec_s * 1e3, 2),
                      "info_gbps": round(batch * code.k_eff / sec_s / 1e9,
                                         4)}), flush=True)

    hr, cr = np.asarray(out_r[0]), np.asarray(out_r[2])
    hs, cs = np.asarray(out_s[0]), np.asarray(out_s[2])
    print(json.dumps({"variant": "nr_resident_eq_static_hw",
                      "bit_exact": bool(np.array_equal(hr, hs)
                                        and np.array_equal(cr, cs))}),
          flush=True)


if __name__ == "__main__":
    main()
