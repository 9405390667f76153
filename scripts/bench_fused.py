"""Fused vs sequential SNR sweep wall-clock on the TPU (VERDICT item 6).

Six-point 802.11n n=648 OMS sweep, same targets, two drivers:
  sequential: Sweep.run (lookahead pipelining, superbatches)
  fused:      Sweep.run_fused (all points in one device program, per-point
              lane retirement, same lookahead)
Prints one JSON line with both wall-clocks and the speedup.
"""
import json
import sys
import time

import numpy as np  # noqa: F401

sys.path.insert(0, ".")


def main():
    import dataclasses

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.sim import Sweep

    cfg = PRESETS["wifi-648-r12-minsum"]
    cfg = dataclasses.replace(
        cfg,
        decoder=dataclasses.replace(cfg.decoder, algorithm="offset-min-sum",
                                    early_term=True),
        quant=dataclasses.replace(cfg.quant, beta_lsb=2),
        run=dataclasses.replace(cfg.run, batch=7680))
    ebn0 = [1.0, 1.5, 2.0, 2.5, 3.0, 3.5]
    target_fe, max_fr = 200, 400_000

    s_seq = Sweep(cfg, batch_tile=512, lookahead=8, superbatches=4)
    # warm both compiled programs so the comparison is wall-clock of the
    # SWEEP, not of the tunnel's multi-minute remote compiles
    s_seq.run([2.0], target_frame_errors=10**9,
              max_frames=cfg.run.batch * 4)
    t0 = time.time()
    r_seq = s_seq.run(ebn0, target_frame_errors=target_fe,
                      max_frames=max_fr)
    t_seq = time.time() - t0

    s_fus = Sweep(cfg, batch_tile=512, lookahead=8, superbatches=4)
    s_fus.run_fused(ebn0, target_frame_errors=1, max_frames=cfg.run.batch)
    t0 = time.time()
    r_fus = s_fus.run_fused(ebn0, target_frame_errors=target_fe,
                            max_frames=max_fr)
    t_fus = time.time() - t0

    frames_seq = sum(p.frames for p in r_seq.points)
    frames_fus = sum(p.frames for p in r_fus.points)
    print(json.dumps({
        "variant": "fused_vs_sequential_6pt",
        "seq_wall_s": round(t_seq, 2), "fused_wall_s": round(t_fus, 2),
        "speedup": round(t_seq / t_fus, 3),
        "frames_seq": frames_seq, "frames_fused": frames_fus,
        "fers_seq": [round(p.fer, 5) for p in r_seq.points],
        "fers_fused": [round(p.fer, 5) for p in r_fus.points],
    }))


if __name__ == "__main__":
    main()
