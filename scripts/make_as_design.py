"""Absorbing-set-aware construction A/B (round-5 design-loop closure).

Round 4 proved census-based seed SELECTION cuts the 3.0 dB tail 2.6x
(results/census_ab.json). This script moves the census INTO construction:
start from qc_peg_best's pick at the same wifi-648 geometry (kb=12 cb=12
Z=27, wifi info-column profile) and run as_optimize (codes/peg.py) —
census-guided circulant re-placement accepting only strict exact-spectrum
improvements. The artifact records both exact censuses + the optimization
log; the silicon tail A/B (same config as census_ab) runs on the TPU via
--silicon.

Writes results/as_design.json.
Usage: PYTHONPATH=. python scripts/make_as_design.py [--evals N]
       [--silicon]  (TPU: adds measured tail FER rows for both codes)
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    evals = 600
    if "--evals" in sys.argv:
        evals = int(sys.argv[sys.argv.index("--evals") + 1])
    silicon = "--silicon" in sys.argv
    import jax
    if not silicon:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")

    from ldpc_tpu.analysis.asenum import exact_absorbing_census
    from ldpc_tpu.codes.code import expand_qc
    from ldpc_tpu.codes.ieee80211n import make_code as make_wifi
    from ldpc_tpu.codes.peg import (as_optimize, count_6cycles, girth,
                                    qc_peg_best)

    wifi = make_wifi(648, "1/2")
    degs = np.sort((wifi.base[:, :12] >= 0).sum(axis=0))

    if silicon:
        # reuse the CPU-stage artifact (deterministic construction) so the
        # TPU session doesn't redo the ~10 min census hill-climb
        try:
            with open("results/as_design.json") as f:
                doc = json.load(f)
            base_code = expand_qc(
                np.asarray(doc["base_matrix_baseline"], np.int64), 27,
                name=doc["baseline"]["name"])
            opt_code = expand_qc(
                np.asarray(doc["base_matrix_optimized"], np.int64), 27,
                name=doc["optimized"]["name"])
            print("reusing CPU-stage artifact", flush=True)
            _run_silicon(doc, base_code, opt_code)
            return
        except FileNotFoundError:
            pass  # fall through: build everything fresh

    t0 = time.time()
    base_code, table = qc_peg_best(kb=12, cb=12, Z=27, col_degrees=degs,
                                   n_seeds=8, seed0=1)
    t_select = time.time() - t0
    c_base = exact_absorbing_census(base_code)
    print(f"qc_peg_best pick: {base_code.name} girth {girth(base_code)} "
          f"classes {c_base['classes']} ({t_select:.0f}s)", flush=True)

    t0 = time.time()
    opt_code, log = as_optimize(base_code, max_evals=evals)
    t_opt = time.time() - t0
    c_opt = exact_absorbing_census(opt_code)
    print(f"as_optimize: girth {girth(opt_code)} classes "
          f"{c_opt['classes']} ({t_opt:.0f}s, "
          f"{sum(1 for e in log if e['event'] == 'accept')} accepts)",
          flush=True)
    c_std = exact_absorbing_census(wifi)

    doc = {
        "config": "wifi-648 geometry kb=12 cb=12 Z=27, wifi info profile; "
                  "baseline = qc_peg_best(n_seeds=8, seed0=1) by (girth, "
                  "c6, exact spectrum); optimizer = as_optimize census-"
                  "guided shift re-placement (a<=7 b<=3 dv_cap=3)",
        "standard": {"classes": c_std["classes"], "key_note":
                     "published table, for context"},
        "baseline": {"name": base_code.name, "girth": girth(base_code),
                     "cycles6": count_6cycles(base_code),
                     "classes": c_base["classes"],
                     "select_wall_s": round(t_select, 1),
                     "seed_table": table},
        "optimized": {"name": opt_code.name, "girth": girth(opt_code),
                      "cycles6": count_6cycles(opt_code),
                      "classes": c_opt["classes"],
                      "opt_wall_s": round(t_opt, 1),
                      "evals": evals,
                      "accepts": sum(1 for e in log
                                     if e["event"] == "accept"),
                      "log": log},
        "improved": bool(tuple(c_opt["key"]) < tuple(c_base["key"])),
        "base_matrix_optimized": opt_code.base.tolist(),
        "base_matrix_baseline": base_code.base.tolist(),
    }
    with open("results/as_design.json", "w") as f:
        json.dump(doc, f, indent=1)
    print("improved:", doc["improved"], flush=True)

    if silicon:
        _run_silicon(doc, base_code, opt_code)


def _run_silicon(doc, base_code, opt_code):
    import time

    from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,
                                 QuantConfig, RunConfig, SimConfig)
    from ldpc_tpu.sim.sweep import Sweep
    ebn0 = [2.75, 3.0, 3.25]
    batch, frames = 16384, 4_063_232
    fer = {}
    for label, code in (("baseline", base_code), ("optimized", opt_code)):
        cfg = SimConfig(
            code=CodeConfig(family="qcpeg", n=648, rate="1/2", Z=27),
            channel=ChannelConfig(modulation="bpsk"),
            quant=QuantConfig(bits=8, scale=4.0, beta_lsb=1),
            decoder=DecoderConfig(algorithm="offset-min-sum",
                                  schedule="layered", max_iter=20,
                                  early_term=True),
            run=RunConfig(batch=batch, seed=29, all_zeros=True))
        sweep = Sweep(cfg, batch=batch, batch_tile=512, superbatches=4,
                      code=code)
        t0 = time.time()
        res = sweep.run(ebn0, target_frame_errors=10 ** 9,
                        max_frames=frames)
        fer[label] = [{"ebn0_db": p.ebn0_db, "fer": p.fer,
                       "frame_errs": p.frame_errs, "frames": p.frames}
                      for p in res.points]
        print(label, fer[label], f"({time.time()-t0:.0f}s)", flush=True)
    doc["silicon_fer"] = fer
    doc["silicon_fer_note"] = (
        "2.75-3.25 dB is the WATERFALL TAIL regime, where the weighted "
        "mix of classes governs, not the lexicographic spectrum; the "
        "spectrum key's domain is the deep floor (silicon_floor below).")
    with open("results/as_design.json", "w") as f:
        json.dump(doc, f, indent=1)

    # deep-floor A/B (the spectrum key's actual domain): mixture IS with
    # each code's OWN exact census sets + radial ladder, stratified, two
    # seeds per point — the round-4-converged wifi-648 floor machinery
    # (results/floor_ab.json config)
    from ldpc_tpu.analysis.asenum import enumerate_sets
    from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,
                                 QuantConfig, RunConfig, SimConfig)
    from ldpc_tpu.sim.impsamp import estimate_fer, expand_radial, \
        make_is_run
    floor = {}
    for label, code in (("baseline", base_code), ("optimized", opt_code)):
        cfg = SimConfig(
            code=CodeConfig(family="qcpeg", n=648, rate="1/2", Z=27),
            quant=QuantConfig(bits=8, scale=4.0, beta_lsb=1),
            decoder=DecoderConfig(algorithm="offset-min-sum",
                                  schedule="layered", max_iter=20,
                                  early_term=True))
        r = enumerate_sets(code, a_max=8, b_max=3, dv_cap=3, emit_min_a=3,
                           emit_cap=8192)
        sets = [S for (a, b, f_, S) in sorted(
            r.sets, key=lambda t: (not t[2], t[0] + t[1], t[0])) if f_][:64]
        sets_x, deltas = expand_radial(sets, [1.2, 1.6, 2.0, 2.4])
        run = make_is_run(code, cfg, sets=sets_x, delta=deltas, pi0=0.25,
                          batch=8192, stratify=True)
        rows = []
        for snr in (4.5, 5.0):
            for seed in (41, 42):
                t0 = time.time()
                est = estimate_fer(code, cfg, sets=sets_x, ebn0_db=snr,
                                   frames=1_000_000, batch=8192,
                                   seed=seed, run=run)
                rows.append({"ebn0_db": snr, "seed": seed, "fer": est.fer,
                             "rel_std": est.rel_std,
                             "raw_hits": est.raw_hits})
                print(f"{label} {snr} dB s{seed}: {est.fer:.3e} "
                      f"+-{est.rel_std:.2f} ({time.time()-t0:.0f}s)",
                      flush=True)
        floor[label] = {"n_proposal_sets": len(sets), "points": rows}
    doc["silicon_floor"] = floor
    doc["silicon_floor_note"] = (
        "capped-set estimate_fer rows: the optimized code's 64-set cap "
        "covers only ~18% of its (6,3) class and its seeds disagree — "
        "kept as evidence; the authoritative A/B is the symmetry-folded "
        "block below (complete orbit coverage).")
    with open("results/as_design.json", "w") as f:
        json.dump(doc, f, indent=1)

    # authoritative deep-floor A/B: symmetry-folded estimator with the
    # COMPLETE absorbing-orbit cover of each code (sim/impsamp.py
    # make_symmetric_run; validated against the converged wifi-648 floor)
    from ldpc_tpu.sim.impsamp import (canonical_rotation,
                                      estimate_fer_symmetric)
    sym = {}
    for label, code in (("baseline", base_code), ("optimized", opt_code)):
        cfg = SimConfig(
            code=CodeConfig(family="qcpeg", n=648, rate="1/2", Z=27),
            quant=QuantConfig(bits=8, scale=4.0, beta_lsb=1),
            decoder=DecoderConfig(algorithm="offset-min-sum",
                                  schedule="layered", max_iter=20,
                                  early_term=True))
        r = enumerate_sets(code, a_max=8, b_max=3, dv_cap=3, emit_min_a=3,
                           emit_cap=16384)
        reps = sorted(set(canonical_rotation(code, S)
                          for (a, b, f_, S) in r.sets if f_))
        reps_x, deltas = expand_radial(reps, [1.2, 1.6, 2.0])
        rows = []
        run = None
        from ldpc_tpu.sim.impsamp import make_symmetric_run
        run = make_symmetric_run(code, cfg, reps_x, delta=deltas,
                                 pi0=0.25, batch=8192)
        for snr in (4.5, 5.0):
            for seed in (41, 42):
                t0 = time.time()
                est = estimate_fer_symmetric(
                    code, cfg, reps_x, ebn0_db=snr, frames=524_288,
                    delta=deltas, pi0=0.25, batch=8192, seed=seed,
                    run=run)
                est["wall_s"] = round(time.time() - t0, 1)
                rows.append(est)
                print(f"sym {label} {snr} dB s{seed}: {est['fer']:.3e} "
                      f"+-{est['rel_std']:.2f} ({est['wall_s']}s)",
                      flush=True)
        sym[label] = {"n_orbit_reps": len(reps), "points": rows}
    doc["silicon_floor_symmetric"] = sym
    with open("results/as_design.json", "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
