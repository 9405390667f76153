"""Split the canonical-config pipeline cost: full vs no-decode vs decode.

Uses superbatches=8 inside one device call so per-call tunnel overhead is
amortized away; prints one JSON line with ms per sub-batch for
  full     : encode..decode(20 it)..count
  nodecode : identical program with the decoder replaced by a trivial
             hard-decision (sign of quantized LLRs) — everything except
             the kernel, including both transposes' moral equivalent
  decode   : the Pallas kernel alone on resident int8 LLRs (in a
             superbatched fori loop)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def fetch_timed(fn, *args, reps=3, trials=4):
    out = fn(*args)
    np.asarray(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        np.asarray(out)
        best = min(best, (time.time() - t0) / reps)
    return best


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.ops import channel as ch
    from ldpc_tpu.ops.encode import info_positions, make_encoder
    from ldpc_tpu.ops.quantize import quantize
    from ldpc_tpu.sim import build_code
    from ldpc_tpu.sim.pipeline import select_decoder
    cfg = PRESETS["wifi-648-r12-minsum"]
    code = build_code(cfg)
    B, SB = 16384, 8
    enc = make_encoder(code)
    dec, _ = select_decoder(code, cfg, "pallas", 512)
    info_pos = jnp.asarray(info_positions(code))
    sigma = np.float32(0.9)

    def chain(key, use_decoder: bool):
        def one(i, acc):
            k = jax.random.fold_in(key, i)
            ki, kn = jax.random.split(k)
            info = jax.random.bernoulli(ki, 0.5, (B, code.k)).astype(jnp.uint8)
            cw = enc(info)
            x = ch.modulate(cw, "bpsk")
            y = ch.awgn(kn, x, sigma)
            q = quantize(ch.demap(y, sigma, "bpsk"), cfg.quant)
            if use_decoder:
                hard, iters, conv = dec(q)
            else:
                hard = (q < 0).astype(jnp.uint8)
                iters = jnp.zeros((B,), jnp.int32)
                conv = jnp.zeros((B,), bool)
            err = hard[:, info_pos] != info
            return acc + jnp.stack(
                [jnp.sum(err, dtype=jnp.int32),
                 jnp.sum(iters, dtype=jnp.int32),
                 jnp.sum(conv, dtype=jnp.int32)])

        return jax.lax.fori_loop(0, SB, one, jnp.zeros(3, jnp.int32))

    full = jax.jit(lambda k: chain(k, True))
    nodec = jax.jit(lambda k: chain(k, False))

    rng = np.random.default_rng(0)
    q0 = jnp.asarray(rng.integers(-40, 40, (B, code.n)).astype(np.int8))

    def dec_only(key):
        def one(i, acc):
            hard, iters, conv = dec(q0)
            return acc + jnp.sum(hard[:, 0], dtype=jnp.int32) + i
        return jax.lax.fori_loop(0, SB, one, jnp.int32(0))

    deco = jax.jit(dec_only)

    key = jax.random.PRNGKey(0)
    t_full = fetch_timed(full, key) / SB
    t_nod = fetch_timed(nodec, key) / SB
    t_dec = fetch_timed(deco, key) / SB
    print(json.dumps({
        "variant": "pipeline_split_sb8",
        "full_ms": round(t_full * 1e3, 3),
        "nodecode_ms": round(t_nod * 1e3, 3),
        "decode_only_ms": round(t_dec * 1e3, 3),
        "implied_overhead_ms": round((t_full - t_dec) * 1e3, 3),
    }))


if __name__ == "__main__":
    main()
