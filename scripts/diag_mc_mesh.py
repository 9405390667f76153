"""HW check: mesh-compatible device RNG (round-3 VERDICT item 5).

Two exact contracts, validated on the real chip:

1. TILE CONTINUATION — the megakernel's stream identity is the GLOBAL tile
   index (seed word 2 = tile base): one mc_batch=B run must produce lane
   outputs bit-identical to the concatenation of two mc_batch=B/2 runs
   with tile bases 0 and T/2 (same key, same batch_tile). This is exactly
   what a 2-shard mesh computes per shard, so it proves shard streams are
   disjoint AND that counters are bit-identical across mesh sizes without
   needing multi-chip hardware.

2. MESH(1) EQUALITY — make_run_batch with a single-device mesh (shard_map
   path, tile base 0) must produce counters equal to the mesh-None path.
"""
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    import jax.numpy as jnp
    from ldpc_tpu.codes.ieee80211n import make_code
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.kernels import minsum_pallas as mp
    from ldpc_tpu.parallel import make_mesh
    from ldpc_tpu.sim import build_code, make_run_batch

    code = make_code(648, "1/2")
    cfg = PRESETS["wifi-648-r12-minsum"]
    B, bt = 1024, 128
    scale = float(cfg.quant.scale)
    sigma = 1.0 / np.sqrt(2.0 * code.rate * 10 ** (2.0 / 10))
    chanf = jnp.asarray([sigma, 2.0 * scale / sigma**2], jnp.float32)
    kb = code.k // code.Z

    def mk(mc_batch):
        return mp.make_decoder(
            code, cfg.decoder, cfg.quant, batch_tile=bt,
            pre_transposed=True, input_scale=scale, count_info_cols=kb,
            mc_batch=mc_batch, mc_inner_loop=True)

    d_full = jax.jit(mk(B))
    d_half = jax.jit(mk(B // 2))
    seeds0 = jnp.asarray([1234, -987, 0], jnp.int32)
    T_half = (B // 2) // bt
    seeds1 = jnp.asarray([1234, -987, T_half], jnp.int32)

    full = [np.asarray(o) for o in d_full(seeds0, chanf)]
    h0 = [np.asarray(o) for o in d_half(seeds0, chanf)]
    h1 = [np.asarray(o) for o in d_half(seeds1, chanf)]
    cat = [np.concatenate([a, b]) for a, b in zip(h0, h1)]
    ok_tiles = all(np.array_equal(f, c) for f, c in zip(full, cat))
    print(json.dumps({"variant": "mc_tile_continuation",
                      "full_vs_two_halves_equal": bool(ok_tiles),
                      "conv_full": int(full[3].sum()),
                      "conv_halves": int(cat[3].sum())}), flush=True)

    # 2. mesh(1) through make_run_batch == mesh None
    import dataclasses
    cfg2 = dataclasses.replace(
        cfg, run=dataclasses.replace(cfg.run, batch=B, rng="device"))
    code2 = build_code(cfg2)
    rb0 = make_run_batch(code2, cfg2, batch=B, decoder_backend="pallas",
                         batch_tile=bt)
    mesh = make_mesh(devices=jax.devices()[:1])
    rb1 = make_run_batch(code2, cfg2, batch=B, mesh=mesh,
                         decoder_backend="pallas", batch_tile=bt)
    assert rb0.mc and rb1.mc, (rb0.mc, rb1.mc)
    key = jax.random.PRNGKey(7)
    c0 = np.asarray(rb0(key, jnp.float32(sigma)))
    c1 = np.asarray(rb1(key, jnp.float32(sigma)))
    print(json.dumps({"variant": "mc_mesh1_equality",
                      "counters_equal": bool(np.array_equal(c0, c1)),
                      "counters": c0.tolist()}), flush=True)


if __name__ == "__main__":
    main()
