"""Batch-tile sweep for the MC megakernel bench config.

Per-grid-step overhead measured 12.6 us (diag_gridstep.py); at the bench's
batch_tile=512 that is 32 steps x 12.6 us ~= 0.40 ms of the 5.00 ms batch.
Larger tiles cut the step count (512 -> 2048 leaves 8 steps) at the price
of VMEM pressure (the scoped limit is raisable to at least 32 MB on this
chip). This measures the actual trade on hardware.

Usage: python scripts/diag_btile.py [tile ...]   (default 512 1024 2048)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

from ldpc_tpu.config import PRESETS  # noqa: E402
from ldpc_tpu.ops.channel import sigma_for  # noqa: E402
from ldpc_tpu.sim import build_code, make_run_batch  # noqa: E402


def main():
    tiles = [int(a) for a in sys.argv[1:]] or [512, 1024, 2048]
    cfg = PRESETS["wifi-648-r12-minsum"]
    code = build_code(cfg)
    batch, superbatches = 16384, 32
    sigma = np.float32(sigma_for(cfg.channel.ebn0_db, code.rate,
                                 cfg.channel.modulation))
    key = jax.random.PRNGKey(0)
    for bt in tiles:
        rb = make_run_batch(code, cfg, batch=batch, decoder_backend="auto",
                            batch_tile=bt, superbatches=superbatches,
                            rng="device")
        try:
            out = rb(key, sigma)
            int(out[1])
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"batch_tile": bt,
                              "error": str(e)[:200]}), flush=True)
            continue
        best = float("inf")
        for t in range(5):
            t0 = time.time()
            for r in range(2):
                out = rb(jax.random.fold_in(key, 1 + t * 2 + r), sigma)
            int(out[1])
            best = min(best, (time.time() - t0) / (2 * superbatches))
        print(json.dumps({"batch_tile": bt,
                          "ms_per_batch": round(best * 1e3, 3),
                          "info_gbps": round(batch * code.k / best / 1e9,
                                             4)}), flush=True)


if __name__ == "__main__":
    main()
