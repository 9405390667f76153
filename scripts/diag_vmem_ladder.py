"""HW probe: the VMEM-kernel admission ladder at the verified 40 MB window
(round-3 VERDICT item 3). Round 2 hardcoded a 14 MB admission budget
(sim/pipeline.py) while 40 MB grants are verified to compile AND run —
mid-size instances (NR Z<=128; 802.11n ET+fused at big tiles) may be
bounced to slower stream/qc-jnp routes a binary order of magnitude below
what the chip admits.

Measures, per instance: VMEM-kernel decode time at the raised budget
(including COMPILE wall time — the kernel unrolls all base entries, and
NR BG1's 316 entries may blow Mosaic compile time) vs the currently
routed backend. Output drives the pipeline ladder constants.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def bench(dec, chan, reps=4, trials=4):
    import jax.numpy as jnp
    t0 = time.time()
    out = dec(chan)
    np.asarray(out[2] if isinstance(out, tuple) else out)
    compile_s = time.time() - t0
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            out = dec(chan)
        np.asarray(out[2] if isinstance(out, tuple) else out)
        best = min(best, (time.time() - t0) / reps)
    return best, compile_s


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    import jax.numpy as jnp
    from ldpc_tpu.codes.ieee80211n import make_code as wifi
    from ldpc_tpu.codes.nr_bg import make_code as nr
    from ldpc_tpu.kernels import minsum_pallas as mp
    from ldpc_tpu.kernels.minsum_stream import make_stream_decoder
    from ldpc_tpu.ops.decode_qc import make_qc_decoder

    rng = np.random.default_rng(0)
    B = 1024

    def llrs(n):
        x = rng.normal(12, 14, size=(B, n))
        return jnp.asarray(np.clip(np.round(x), -127, 127).astype(np.int8))

    which = sys.argv[1] if len(sys.argv) > 1 else "all"

    # --- NR BG1 Z=128 layered fixed-iteration: currently routed to the
    # static stream kernel (0.213 Gb/s class). VMEM estimate at bt=128 is
    # ~16 MB (> the 14 MB gate), ~32 MB at bt=256 — both inside 40.
    if which in ("all", "nr"):
        code = nr(base_graph=1, Z=128)
        chan = llrs(code.n)
        st = jax.jit(make_stream_decoder(code, max_iter=20, beta=2,
                                         qmax=127, batch_tile=128))
        s_st, c_st = bench(st, chan)
        for bt in (128, 256):
            est = mp.vmem_bytes(code, bt, "layered", jnp.int8, False)
            try:
                d = jax.jit(mp.make_pallas_decoder(
                    code, max_iter=20, beta=2, qmax=127, schedule="layered",
                    early_term=False, batch_tile=bt, c2v_dtype=jnp.int8))
                s_v, c_v = bench(d, chan)
                err = None
            except Exception as e:  # noqa: BLE001 — record the failure mode
                s_v = c_v = None
                err = str(e)[:200]
            print(json.dumps({
                "variant": "nr_bg1_z128_vmem_probe", "batch_tile": bt,
                "est_mb": round(est / 2**20, 1),
                "stream_ms": round(s_st * 1e3, 2),
                "stream_compile_s": round(c_st, 1),
                "vmem_ms": None if s_v is None else round(s_v * 1e3, 2),
                "vmem_compile_s": None if c_v is None else round(c_v, 1),
                "speedup_vs_stream": (None if s_v is None
                                      else round(s_st / s_v, 3)),
                "error": err}), flush=True)

    # --- 802.11n n=648 ET + fused-IO: the ET+fused combo's 1.4x margin
    # pushes the estimate past 14 MB at bt>=512, so the round-2 ladder
    # routed production ET runs to bt=256. Compare at the production
    # batch (16384).
    if which in ("all", "wifi"):
        Bw = 16384
        code = wifi(648, "1/2")
        nb, Z, kb = code.base.shape[1], code.Z, code.k // code.Z
        llr_f = (rng.standard_normal((code.n, Bw)) * 8).astype(np.float32)
        info = rng.integers(0, 2, (code.k, Bw)).astype(np.uint8)
        llr_t = jnp.asarray(llr_f).reshape(nb, Z, Bw)
        info_t = jnp.asarray(info).reshape(kb, Z, Bw)
        for bt in (256, 512, 1024):
            est = mp.vmem_bytes(code, bt, "flooding", jnp.int32, True,
                                fused_in=True, counting=True)
            d = jax.jit(mp.make_pallas_decoder(
                code, max_iter=20, beta=0, qmax=127, schedule="flooding",
                early_term=True, batch_tile=bt, pre_transposed=True,
                input_scale=4.0, count_info_cols=kb))
            s_v, c_v = bench(lambda x: d(x, info_t), llr_t)
            print(json.dumps({
                "variant": "wifi648_et_fused_vmem_probe", "batch_tile": bt,
                "est_mb": round(est / 2**20, 1),
                "vmem_ms": round(s_v * 1e3, 2),
                "vmem_compile_s": round(c_v, 1)}), flush=True)


if __name__ == "__main__":
    main()
