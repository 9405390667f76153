"""Round-2 TPU measurement driver. One measurement per argv[1]:

  wifi_flat    full pipeline, n=648 preset, batch_tile=512 (flat layout)
  wifi_vreg    same, batch_tile=1024 (vreg layout, int8 c2v via ladder)
  wifi_decode  decode-only (pre-quantized LLRs resident on device)
  wifi_et      flooding + early termination at 2.0 dB (operating point)
  wifi_et_layered  layered + ET at 2.0 dB
  dvbs2        DVB-S2 stream-kernel decode-only, batch 1024 + full pipeline
  dvbs2_exact  stream kernel vs C oracle bit-exactness on hardware
  nr           NR BG1 Z=384 preset full pipeline (stream kernel)

Each prints one JSON line. Timing: best-of-trials, fetch-synced (bench.py
methodology — block_until_ready does not reliably block on the tunnel).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def fetch_timed(fn, *args, reps=5, trials=4):
    import jax  # noqa: F401
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.time() - t0) / reps)
    return best


def _sync(out):
    if isinstance(out, (tuple, list)):
        np.asarray(out[-1])
    else:
        np.asarray(out)


def setup():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    return jax


def wifi_pipeline(batch_tile):
    jax = setup()
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.ops.channel import sigma_for
    from ldpc_tpu.sim import build_code, make_run_batch
    cfg = PRESETS["wifi-648-r12-minsum"]
    code = build_code(cfg)
    batch = 16384
    rb = make_run_batch(code, cfg, batch=batch, decoder_backend="auto",
                        batch_tile=batch_tile)
    sigma = np.float32(sigma_for(cfg.channel.ebn0_db, code.rate, "bpsk"))
    key = jax.random.PRNGKey(0)
    sec = fetch_timed(lambda k: rb(k, sigma), key, reps=10, trials=5)
    return {"variant": f"wifi_pipeline_bt{batch_tile}",
            "ms_per_batch": round(sec * 1e3, 3),
            "info_gbps": round(batch * code.k / sec / 1e9, 4)}


def wifi_decode(bt=512, c2v=None):
    jax = setup()
    import jax.numpy as jnp
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.sim.pipeline import select_decoder
    from ldpc_tpu.sim import build_code
    cfg = PRESETS["wifi-648-r12-minsum"]
    code = build_code(cfg)
    batch = 16384
    if c2v is None:
        dec, backend = select_decoder(code, cfg, "pallas", bt)
    else:
        from ldpc_tpu.kernels.minsum_pallas import make_pallas_decoder
        import jax.numpy as jnp2
        dec = make_pallas_decoder(code, max_iter=20, beta=0, qmax=127,
                                  schedule="flooding", early_term=False,
                                  batch_tile=bt, c2v_dtype=getattr(jnp2, c2v))
        backend = f"pallas-{c2v}"
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-40, 40, size=(batch, code.n)).astype(np.int8))
    jdec = jax.jit(lambda x: dec(x))
    sec = fetch_timed(jdec, q, reps=10, trials=5)
    return {"variant": f"wifi_decode_bt{bt}", "backend": backend,
            "ms_per_batch": round(sec * 1e3, 3),
            "info_gbps": round(batch * code.k / sec / 1e9, 4)}


def wifi_et(schedule, phase1=None, frac=0.25, db=2.0):
    jax = setup()
    import dataclasses
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.ops.channel import sigma_for
    from ldpc_tpu.sim import build_code, make_run_batch
    cfg = PRESETS["wifi-648-r12-minsum"]
    cfg = dataclasses.replace(cfg, decoder=dataclasses.replace(
        cfg.decoder, early_term=True, schedule=schedule,
        algorithm="offset-min-sum", phase1_iters=phase1, phase2_frac=frac),
        quant=dataclasses.replace(cfg.quant, beta_lsb=2))
    code = build_code(cfg)
    batch = 16384
    rb = make_run_batch(code, cfg, batch=batch, decoder_backend="auto",
                        batch_tile=512)
    sigma = np.float32(sigma_for(db, code.rate, "bpsk"))
    key = jax.random.PRNGKey(0)
    sec = fetch_timed(lambda k: rb(k, sigma), key, reps=10, trials=5)
    out = np.asarray(rb(key, sigma))
    tag = f"_2p{phase1}f{frac}" if phase1 else ""
    return {"variant": f"wifi_oms_et_{schedule}{tag}_{db}dB",
            "ms_per_batch": round(sec * 1e3, 3),
            "info_gbps": round(batch * code.k / sec / 1e9, 4),
            "avg_iters": round(float(out[3]) / batch, 2),
            "fer": round(float(out[2]) / batch, 5)}


def dvbs2(bt=128):
    jax = setup()
    import jax.numpy as jnp
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.kernels.minsum_stream import make_decoder as make_st
    from ldpc_tpu.ops.channel import sigma_for
    from ldpc_tpu.sim import build_code, make_run_batch
    cfg = PRESETS["dvbs2-64800-r12"]
    code = build_code(cfg)
    batch = 1024
    dec = make_st(code, cfg.decoder, cfg.quant, batch_tile=bt)
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.integers(-40, 40, size=(batch, code.n)).astype(np.int8))
    jdec = jax.jit(lambda x: dec(x))
    sec = fetch_timed(jdec, q, reps=3, trials=4)
    res = {"variant": f"dvbs2_stream_decode_bt{bt}",
           "ms_per_batch1024": round(sec * 1e3, 1),
           "info_gbps": round(batch * code.k / sec / 1e9, 4)}
    # full pipeline at the BASELINE batch
    rb = make_run_batch(code, cfg, batch=8192, decoder_backend="auto")
    sigma = np.float32(sigma_for(cfg.channel.ebn0_db, code.rate, "bpsk"))
    sec2 = fetch_timed(lambda k: rb(k, sigma), jax.random.PRNGKey(0),
                       reps=2, trials=3)
    res["pipeline_ms_per_batch8192"] = round(sec2 * 1e3, 1)
    res["pipeline_info_gbps"] = round(8192 * code.k / sec2 / 1e9, 4)
    return res


def dvbs2_exact():
    jax = setup()
    import jax.numpy as jnp
    from ldpc_tpu import oracle
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.kernels.minsum_stream import make_stream_decoder
    from ldpc_tpu.sim import build_code
    cfg = PRESETS["dvbs2-64800-r12"]
    code = build_code(cfg)
    B = 128
    rng = np.random.default_rng(7)
    chan = rng.integers(-50, 50, size=(B, code.n)).astype(np.int8)
    dec = make_stream_decoder(code, max_iter=6, beta=2, qmax=127)
    h, it, cv = map(np.asarray, dec(jnp.asarray(chan)))
    ho, ito, cvo = oracle.decode_batch(chan, code, max_iter=6, beta=2,
                                       qmax=127, schedule="layered",
                                       early_term=False)
    ok = bool(np.array_equal(h, ho) and np.array_equal(cv, cvo))
    return {"variant": "dvbs2_stream_vs_c_oracle", "bit_exact": ok,
            "frames": B, "iters": 6}


def nr():
    jax = setup()
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.ops.channel import sigma_for
    from ldpc_tpu.sim import build_code, make_run_batch
    from ldpc_tpu.sim.pipeline import select_decoder
    cfg = PRESETS["nr-bg1-layered"]
    code = build_code(cfg)
    _, backend = select_decoder(code, cfg, "auto")
    batch = 256
    rb = make_run_batch(code, cfg, batch=batch, decoder_backend="auto")
    sigma = np.float32(sigma_for(cfg.channel.ebn0_db, code.rate, "bpsk"))
    sec = fetch_timed(lambda k: rb(k, sigma), jax.random.PRNGKey(0),
                      reps=5, trials=4)
    return {"variant": "nr_bg1_z384_pipeline", "backend": backend,
            "ms_per_batch256": round(sec * 1e3, 2),
            "info_gbps": round(batch * code.k_eff / sec / 1e9, 4)}


def main():
    v = sys.argv[1]
    fn = {
        "wifi_flat": lambda: wifi_pipeline(512),
        "wifi_vreg": lambda: wifi_pipeline(1024),
        "wifi_decode": wifi_decode,
        "wifi_decode_2048": lambda: wifi_decode(2048, "int8"),
        "wifi_et_25": lambda: wifi_et("flooding", db=2.5),
        "wifi_et_2p8_25": lambda: wifi_et("flooding", phase1=8, frac=0.1875,
                                          db=2.5),
        "wifi_et_2p6_30": lambda: wifi_et("flooding", phase1=6, frac=0.125,
                                          db=3.0),
        "wifi_et_30": lambda: wifi_et("flooding", db=3.0),
        "wifi_et": lambda: wifi_et("flooding"),
        "wifi_et_layered": lambda: wifi_et("layered"),
        "wifi_et_2p": lambda: wifi_et("flooding", phase1=8),
        "wifi_et_2p6": lambda: wifi_et("flooding", phase1=6),
        "wifi_et_2p12": lambda: wifi_et("flooding", phase1=12, frac=0.1875),
        "wifi_et_2p10": lambda: wifi_et("flooding", phase1=10, frac=0.3125),
        "dvbs2": dvbs2,
        "dvbs2_256": lambda: dvbs2(256),
        "dvbs2_exact": dvbs2_exact,
        "nr": nr,
    }[v]
    print(json.dumps(fn()), flush=True)


if __name__ == "__main__":
    main()
