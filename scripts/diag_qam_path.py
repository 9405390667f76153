"""HW check: the BASELINE QAM workload (802.11n n=1944 r=3/4, 16-QAM, OMS
layered ET — PRESETS['multihost-qam-chain']) through the round-3 transposed
fast path vs the round-2 batch-first host chain (hand-replicated here: same
ops, batch-first layout, (B, n) <-> kernel transposes included — exactly
what make_run_batch built before the gate was lifted).
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import dataclasses
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    import jax.numpy as jnp
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.ops import channel as ch
    from ldpc_tpu.ops.encode import make_encoder, info_positions
    from ldpc_tpu.ops.quantize import quantize
    from ldpc_tpu.sim import build_code, make_run_batch
    from ldpc_tpu.sim.pipeline import select_decoder

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    cfg = PRESETS["multihost-qam-chain"]
    cfg = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, batch=B, mesh_shape=None))
    code = build_code(cfg)
    mod = cfg.channel.modulation
    sigma = np.float32(ch.sigma_for(cfg.channel.ebn0_db, code.rate, mod))

    # NEW: transposed fast path via make_run_batch
    rb_t = make_run_batch(code, cfg, batch=B, decoder_backend="pallas",
                          batch_tile=1024)
    assert rb_t.backend_label.startswith("pallas"), rb_t.backend_label

    # OLD: batch-first host chain (round-2 behavior for mod != bpsk)
    dec_bf, label_bf = select_decoder(code, cfg, "pallas", 1024, batch=B)
    enc = make_encoder(code)
    info_pos = jnp.asarray(info_positions(code))

    def run_bf(key, sig):
        kinfo, knoise = jax.random.split(key)
        info = jax.random.bernoulli(kinfo, 0.5, (B, code.k)).astype(jnp.uint8)
        cw = enc(info)
        x = ch.modulate(cw, mod)
        y = ch.awgn(knoise, x, sig)
        llr = ch.demap(y, sig, mod)
        q = quantize(llr, cfg.quant)
        hard, iters, conv = dec_bf(q)
        err = hard[:, info_pos] != info
        return jnp.stack([jnp.int32(B),
                          jnp.sum(err, dtype=jnp.int32),
                          jnp.sum(jnp.any(err, axis=-1)),
                          jnp.sum(iters, dtype=jnp.int32),
                          jnp.sum(conv, dtype=jnp.int32)])

    jbf = jax.jit(run_bf)
    key = jax.random.PRNGKey(11)

    from ldpc_tpu.utils.profiling import timed as _timed

    def timed(fn, reps=4, trials=4):
        out = np.asarray(fn(key, jnp.float32(sigma)))
        return _timed(fn, key, jnp.float32(sigma), reps=reps,
                      trials=trials), out

    s_t, out_t = timed(rb_t)
    s_bf, out_bf = timed(jbf)
    kbits = B * code.k
    print(json.dumps({
        "variant": "qam16_n1944_r34_oms_layered_et",
        "batch": B,
        "transposed_ms": round(s_t * 1e3, 2),
        "batchfirst_ms": round(s_bf * 1e3, 2),
        "speedup": round(s_bf / s_t, 3),
        "transposed_gbps": round(kbits / s_t / 1e9, 4),
        "batchfirst_gbps": round(kbits / s_bf / 1e9, 4),
        "backend": rb_t.backend_label,
        "fer_t": round(float(out_t[2]) / B, 5),
        "fer_bf": round(float(out_bf[2]) / B, 5),
        "conv_t": round(float(out_t[4]) / B, 4),
        "conv_bf": round(float(out_bf[4]) / B, 4)}), flush=True)


if __name__ == "__main__":
    main()
