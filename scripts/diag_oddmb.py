"""HW check: odd-mb (DVB-S2 n=16200 r=1/2, mb=25) static + resident stream
kernels — bit-exactness vs the C oracle and timing vs the dynamic kernel."""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    import jax.numpy as jnp
    from ldpc_tpu import oracle
    from ldpc_tpu.codes.dvbs2 import make_code
    from ldpc_tpu.kernels.minsum_stream import make_stream_decoder

    code = make_code(16200, "1/2")
    batch = 1024
    rng = np.random.default_rng(0)
    chan_np = rng.integers(-40, 40, size=(batch, code.n)).astype(np.int8)
    chan = jnp.asarray(chan_np)

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

    outs = {}
    for tag, kw in [("resident", dict(resident=True)),
                    ("static", dict(resident=False)),
                    ("dynamic", dict(static_unroll=False))]:
        dec = make_stream_decoder(code, max_iter=20, beta=2, qmax=127,
                                  batch_tile=128, **kw)
        sec, out = timed(jax.jit(lambda x, d=dec: d(x)))
        outs[tag] = (np.asarray(out[0]), np.asarray(out[2]))
        print(json.dumps({
            "variant": f"dvbs2_16200_{tag}_it20",
            "ms_per_batch1024": round(sec * 1e3, 1),
            "info_gbps": round(batch * code.k / sec / 1e9, 4)}), flush=True)

    ho, _, cvo = oracle.decode_batch(chan_np[:128], code, max_iter=20,
                                     beta=2, qmax=127, schedule="layered",
                                     early_term=False)
    ok = all(np.array_equal(outs[t][0][:128], ho)
             and np.array_equal(outs[t][1][:128], cvo) for t in outs)
    eq = all(np.array_equal(outs[t][0], outs["dynamic"][0])
             and np.array_equal(outs[t][1], outs["dynamic"][1])
             for t in outs)
    print(json.dumps({"variant": "dvbs2_16200_oddmb_exact_hw",
                      "vs_oracle_128": bool(ok), "all_equal": bool(eq)}),
          flush=True)


if __name__ == "__main__":
    main()
