"""Round-3 artifact regeneration on the TPU chip.

1. results/nr_bg1_z128_r13 — STALE since round 2: the recorded
   "decoder_backend": "qc-jnp" predates the stream-kernel rewiring, and
   round 3's recalibrated VMEM admission (29 MB) moves this code onto the
   VMEM Pallas kernel outright. Regenerated from scratch (stale .state
   removed) so the artifact carries the backend that produced it.
2. results/dvbs2_64800_et — NEW: the flagship n=64800 frame decoded with
   the round-3 slot-streaming early-termination kernel (per-lane adaptive
   iteration counts; avg_iters/early_term_rate become meaningful).

Run: PYTHONPATH=. python scripts/tpu_queue_r3.py
"""
import os
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

sys.path.insert(0, ".")

from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,  # noqa: E402
                             QuantConfig, RunConfig, SimConfig)
from ldpc_tpu.sim import Sweep  # noqa: E402
from ldpc_tpu.sim.report import write_outputs  # noqa: E402


def cfg_for(family, **kw):
    quant = QuantConfig(bits=8, scale=4.0, beta_lsb=2)
    dec = DecoderConfig(algorithm="offset-min-sum",
                        schedule=kw.pop("schedule", "layered"), max_iter=20,
                        early_term=kw.pop("early_term", True))
    return SimConfig(code=CodeConfig(family=family, **kw),
                     channel=ChannelConfig(modulation="bpsk"),
                     quant=quant, decoder=dec, run=RunConfig(seed=1))


RUNS = {
    "nr_bg1_z128_r13": (cfg_for("5gnr", base_graph=1, Z=128, rate="1/3"),
                        [0.0, 0.5, 1.0, 1.5], 4096, 100_000, 4),
    "dvbs2_64800_et": (cfg_for("dvbs2", n=64800, rate="1/2",
                               early_term=True),
                       [1.0, 1.25, 1.5], 1024, 20_000, 2),
}


def main():
    outdir = "results"
    for name, (cfg, ebn0, batch, max_frames, sb) in RUNS.items():
        state = os.path.join(outdir, name + ".state")
        if os.path.exists(state):
            os.remove(state)  # full regeneration, not resume
        t0 = time.time()
        sweep = Sweep(cfg, batch=batch, batch_tile=512, superbatches=sb,
                      checkpoint_path=state)
        res = sweep.run(ebn0, target_frame_errors=150, max_frames=max_frames)
        res.code_name = name
        write_outputs(res, os.path.join(outdir, name))
        print(f"{name}: {time.time()-t0:.0f}s [{res.decoder_backend}]",
              flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
