"""Command-line interface (SURVEY.md §1.3 'CLI / sweep driver').

The reference's entry point was `./sim <code> <snr_lo> <snr_hi> <step> <iters>
<frames>` plus compiled-in constants; here the same run is a named preset or
explicit flags over the frozen config dataclasses (SURVEY.md §5.6). The five
BASELINE.json workload configs ship as presets.

Examples:
  python -m ldpc_tpu.cli sweep --preset wifi-648-r12-minsum \
      --ebn0 1.0:3.5:0.5 --target-errors 100 --out results/wifi648
  python -m ldpc_tpu.cli sweep --family ieee80211n --n 1296 --rate 3/4 \
      --algorithm offset-min-sum --schedule layered --ebn0 2.0,2.5,3.0
  python -m ldpc_tpu.cli presets
  python -m ldpc_tpu.cli codes
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import sys
from typing import List

from .config import (PRESETS, ChannelConfig, CodeConfig, DecoderConfig,
                     QuantConfig, RunConfig, SimConfig)


def _parse_ebn0(spec: str) -> List[float]:
    """'1.0:3.0:0.5' (lo:hi:step, inclusive) or '1.0,2.0,2.5'."""
    if ":" in spec:
        lo, hi, step = (float(x) for x in spec.split(":"))
        if step <= 0:
            raise ValueError(f"--ebn0 {spec}: step must be positive")
        out, v = [], lo
        while v <= hi + 1e-9:
            out.append(round(v, 6))
            v += step
        return out
    return [float(x) for x in spec.split(",")]


def _build_config(args) -> SimConfig:
    if args.preset:
        cfg = PRESETS[args.preset]
    else:
        cfg = SimConfig()
    code = cfg.code
    if args.family:
        code = dataclasses.replace(code, family=args.family)
    if args.n:
        code = dataclasses.replace(code, n=args.n)
    if args.rate:
        code = dataclasses.replace(code, rate=args.rate)
    if args.base_graph:
        code = dataclasses.replace(code, base_graph=args.base_graph)
    if args.Z:
        code = dataclasses.replace(code, Z=args.Z)
    if args.k_info:
        code = dataclasses.replace(code, k_info=args.k_info)
    if getattr(args, "code_file", None):
        # An explicit H file implies the alist family.
        code = dataclasses.replace(code, family="alist", path=args.code_file)
    if getattr(args, "puncture_frac", None):
        code = dataclasses.replace(code, punct_frac=args.puncture_frac)
    if getattr(args, "puncture_scheme", None):
        code = dataclasses.replace(code, punct_scheme=args.puncture_scheme)
    if getattr(args, "shorten_bits", None):
        code = dataclasses.replace(code, shorten_bits=args.shorten_bits)
    if getattr(args, "profile", None):
        code = dataclasses.replace(code, profile=args.profile)
    if getattr(args, "code_seed", None) is not None:
        code = dataclasses.replace(code, code_seed=args.code_seed)
    if getattr(args, "core_rows", None):
        code = dataclasses.replace(code, core_rows=args.core_rows)
    if getattr(args, "ext_row_degree", None):
        code = dataclasses.replace(code, ext_row_degree=args.ext_row_degree)
    chan = cfg.channel
    if args.modulation:
        chan = dataclasses.replace(chan, modulation=args.modulation)
    dec = cfg.decoder
    if getattr(args, "auto_two_phase", False):
        args.phase1_iters = -1
    for f, v in (("algorithm", args.algorithm), ("schedule", args.schedule),
                 ("max_iter", args.max_iter),
                 ("phase1_iters", args.phase1_iters)):
        if v:
            dec = dataclasses.replace(dec, **{f: v})
    if args.phase1_iters:
        if args.no_early_term:
            raise SystemExit("--phase1-iters/--auto-two-phase require early "
                             "termination; drop --no-early-term")
        # two-phase/auto tuning are ET mechanisms: asking for them on an
        # early_term=False preset means "turn ET on", not a silent no-op
        dec = dataclasses.replace(dec, early_term=True)
    if args.no_early_term:
        dec = dataclasses.replace(dec, early_term=False)
    quant = cfg.quant
    if args.bits:
        quant = dataclasses.replace(quant, bits=args.bits)
    if args.beta_lsb is not None:
        quant = dataclasses.replace(quant, beta_lsb=args.beta_lsb)
    run = cfg.run
    for f, v in (("batch", args.batch), ("seed", args.seed),
                 ("max_frames", args.max_frames),
                 ("target_frame_errors", args.target_errors)):
        if v is not None:
            run = dataclasses.replace(run, **{f: v})
    if args.all_zeros:
        run = dataclasses.replace(run, all_zeros=True)
    if args.rng:
        run = dataclasses.replace(run, rng=args.rng)
    return SimConfig(code=code, channel=chan, quant=quant, decoder=dec, run=run)


def cmd_sweep(args) -> int:
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    if args.num_processes and args.num_processes > 1:
        # Multi-host launch path (SURVEY.md §3.5): one process per host,
        # bootstrapped over the TCP coordinator BEFORE any other jax use;
        # the mesh then spans every process's devices and XLA psums the
        # counters over ICI/DCN. Example (2 hosts):
        #   host0: ... sweep --coordinator h0:1234 --num-processes 2 --process-id 0 --mesh 2x4
        #   host1: ... sweep --coordinator h0:1234 --num-processes 2 --process-id 1 --mesh 2x4
        if args.coordinator is None or args.process_id is None:
            raise SystemExit("--num-processes requires --coordinator and "
                             "--process-id")
        from .parallel import init_distributed
        init_distributed(args.coordinator, args.num_processes,
                         args.process_id)
    import jax
    from .sim import Sweep
    from .sim.report import plot_waterfall, to_csv, write_outputs

    cfg = _build_config(args)
    mesh = None
    if args.mesh:
        from .parallel import make_mesh
        shape = tuple(int(x) for x in args.mesh.split("x"))
        axes = ("dcn", "ici")[-len(shape):] if len(shape) > 1 else ("batch",)
        mesh = make_mesh(shape=shape, axes=axes)
    elif args.num_processes and args.num_processes > 1:
        from .parallel import make_mesh
        mesh = make_mesh()  # all global devices on one flat axis
    # Default checkpoint rides next to the artifacts: an interrupted sweep
    # resumes sample-exactly by rerunning the same command (SURVEY.md §5.4).
    ckpt = args.checkpoint
    if ckpt is None and args.out and not args.no_checkpoint:
        ckpt = args.out + ".state"
    sweep = Sweep(cfg, mesh=mesh, decoder_backend=args.decoder_backend,
                  checkpoint_path=ckpt,
                  lookahead=args.lookahead, superbatches=args.superbatches)
    ebn0 = _parse_ebn0(args.ebn0)
    res = sweep.run_fused(ebn0) if args.fused else sweep.run(ebn0)
    if jax.process_index() != 0:
        return 0  # host 0 owns reporting; counters are psum-replicated
    if args.out:
        paths = write_outputs(res, args.out)
        if args.plot:
            paths.append(plot_waterfall([res], args.out + ".png"))
        print("wrote: " + " ".join(paths))
    else:
        sys.stdout.write(to_csv(res))
    return 0


def cmd_presets(args) -> int:
    for name, cfg in PRESETS.items():
        c = cfg.code
        print(f"{name}: {c.family} n={c.n} rate={c.rate} "
              f"{cfg.channel.modulation} {cfg.decoder.algorithm}/"
              f"{cfg.decoder.schedule} iters={cfg.decoder.max_iter}")
    return 0


def _analyze_scan_scale(args, cfg) -> int:
    """Quantizer DESIGN scan: DE threshold as a function of the LLR scale
    at the configured bit width — the fixed-point design question the
    reference answers by rerunning its whole simulation per format. One
    JSON line per scale; the last line names the best. Single-edge
    lambda/rho DE (fast enough to scan; protograph refinement can follow
    on the winner via --proto)."""
    import math

    from .analysis import de
    from .config import cn_params
    from .sim.sweep import build_code

    lo, hi, count = args.scan_scale.split(":")
    scales = [float(lo) * (float(hi) / float(lo)) ** (i / (int(count) - 1))
              for i in range(int(count))] if int(count) > 1 else [float(lo)]
    code = build_code(cfg)
    sp = de.spectra_from_code(code)
    rate = code.k_eff / code.n
    best = None
    for s in scales:
        q = dataclasses.replace(cfg.quant, scale=s)
        if cfg.decoder.algorithm == "min-star":
            from .config import minstar_thresholds
            # the LUT re-derives per scale — the scan covers the actual
            # hardware family (larger scale = more correction thresholds)
            beta, alpha, ms = 0, None, minstar_thresholds(q)
        else:
            beta, alpha = cn_params(cfg.decoder, q)
            ms = None
        try:
            sigma = de.de_threshold_awgn_spectra(
                sp, q, beta=beta, alpha=alpha, iters=args.iters,
                tol=args.tol, target=args.target,
                bracket=tuple(args.bracket), minstar=ms)
            row = {"scale": round(s, 4), "bits": q.bits,
                   "sigma_star": round(sigma, 4),
                   "ebn0_star_db": round(
                       -20.0 * math.log10(sigma * math.sqrt(2 * rate)), 3)}
        except (AssertionError, ValueError) as e:
            row = {"scale": round(s, 4), "bits": q.bits, "error": str(e)}
        print(json.dumps(row), flush=True)
        if "ebn0_star_db" in row and (
                best is None or row["ebn0_star_db"] < best["ebn0_star_db"]):
            best = row
    if best is None:
        raise SystemExit("scan-scale: no scale produced a threshold; widen "
                         "--bracket or relax --target")
    print(json.dumps({"best_scale": best["scale"],
                      "best_ebn0_star_db": best["ebn0_star_db"],
                      "code": code.name, "bits": cfg.quant.bits,
                      "algorithm": cfg.decoder.algorithm}))
    return 0


def cmd_construct(args) -> int:
    """Construct the configured code (any family; the point is qcpeg),
    report its structural quality, optionally export alist. Pure NumPy —
    the H-matrix-generation role the reference kept in MATLAB scripts
    (SURVEY.md §1.2), plus the girth/rank validation of SURVEY.md §8.1."""
    from .codes.code import gf2_rank
    from .codes.peg import girth
    from .sim.sweep import build_code

    cfg = _build_config(args)
    code = build_code(cfg)
    out = {"code": code.name, "family": cfg.code.family, "n": code.n,
           "k": code.k, "m": code.m, "Z": code.Z, "edges": code.num_edges,
           "rate": code.rate, "standard_exact": code.standard_exact}
    if code.n <= 8192:
        out["girth"] = girth(code)
        out["full_rank"] = gf2_rank(code.h_dense()) == code.m
    if getattr(args, "census", None):
        from .analysis.asenum import exact_absorbing_census
        a_max, b_max, dv_cap = (int(x) for x in args.census.split(","))
        c = exact_absorbing_census(code, a_max=a_max, b_max=b_max,
                                   dv_cap=dv_cap)
        del c["key"]  # JSON-unfriendly tuple; classes carry the content
        out["absorbing_census"] = c
    if getattr(args, "export_alist", None):
        from .codes.alist import write_alist
        write_alist(code, args.export_alist)
        out["alist"] = args.export_alist
    print(json.dumps(out))
    return 0


def _floor_symmetric(args, cfg, code, dom, deltas, batch, mesh) -> int:
    """floor --symmetric: symmetry-folded mixture IS (one canonical
    representative per QC orbit, exact M0/M Z-fold — sim/impsamp.py
    make_symmetric_run). The convergence bar is a PRODUCT feature here:
    --seeds runs every listed seed and the output marks each point
    converged only when all seeds agree within their quoted errors.
    Validated on the wifi-648 deep floor; on mechanism-diverse codes
    (DVB-S2 below the knee) expect honest non-convergence — see
    docs/PERFORMANCE.md round-5 floor verdict."""
    from .sim.impsamp import (canonical_rotation, estimate_fer_symmetric,
                              expand_radial, make_symmetric_run)

    if code.Z is None:
        raise SystemExit("floor --symmetric requires a QC code")
    reps = sorted(set(canonical_rotation(code, s) for s in dom))
    print(f"# {len(dom)} proposal sets -> {len(reps)} orbit reps "
          f"(Z={code.Z} fold)", file=sys.stderr)
    reps_x, delta_run = expand_radial(reps, deltas)
    run = make_symmetric_run(code, cfg, reps_x, delta=delta_run,
                             pi0=args.pi0, batch=batch, mesh=mesh)
    seeds = ([int(s) for s in str(args.seeds).split(",")]
             if args.seeds else [cfg.run.seed])
    points = []
    for e in _parse_ebn0(args.ebn0):
        rows = []
        for seed in seeds:
            est = estimate_fer_symmetric(code, cfg, reps_x, ebn0_db=e,
                                         frames=args.frames, batch=batch,
                                         delta=delta_run, pi0=args.pi0,
                                         seed=seed, run=run)
            est["seed"] = seed
            rows.append(est)
        # seed repeatability: every pair agrees within combined 2-sigma
        # AND every seed's own rel_std is below 0.7 — with rel_std ~ 1
        # (estimate dominated by ~one event) the 2-sigma band spans any
        # pair, so the pairwise test alone is vacuous (first NR run
        # marked order-of-magnitude seed gaps as repeatable)
        conv = all(r["rel_std"] < 0.7 for r in rows) and all(
            abs(a["fer"] - b["fer"])
            <= 2 * (a["fer"] * a["rel_std"] + b["fer"] * b["rel_std"])
            for i, a in enumerate(rows) for b in rows[i + 1:])
        pt = {"ebn0_db": e, "seeds": rows,
              "seed_repeatable": bool(conv) if len(rows) > 1 else None}
        points.append(pt)
        print(json.dumps({"ebn0_db": e,
                          "fer_by_seed": [r["fer"] for r in rows],
                          "seed_repeatable": pt["seed_repeatable"]}),
              flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"config": json.loads(cfg.to_json()),
                       "code": code.name,
                       "proposal": {"n_orbit_reps": len(reps),
                                    "orbit_multiplier": int(code.Z),
                                    "delta": deltas, "pi0": args.pi0,
                                    "estimator": "symmetry-folded "
                                                 "(exact M0/M Z-fold)"},
                       "points": points}, f, indent=1)
    return 0


def cmd_floor(args) -> int:
    """Error-floor estimation: harvest decoder failures at the waterfall
    knee, refine/search trapping sets (analysis/trapping.py), then estimate
    FER down the floor with defensive mixture importance sampling
    (sim/impsamp.py). Unbiased; reports relative standard error and what
    plain MC could have resolved with the same frames."""
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    from .analysis.trapping import (classify, dominant_sets, refine_support,
                                    search_trapping_sets)
    from .sim.impsamp import (estimate_fer, harvest_error_supports,
                              make_is_run)
    from .sim.sweep import build_code

    cfg = _build_config(args)
    code = build_code(cfg)
    if (args.allocation != "proportional" or args.pilot_frames > 0) \
            and not args.stratified:
        # estimate_fer keys Neyman/pilot machinery off the stratified run;
        # silently ignoring these flags published misleading configs once
        raise SystemExit("floor: --allocation/--pilot-frames require "
                         "--stratified (lane allocation only exists for "
                         "the stratified estimator)")
    batch = args.batch or 8192  # shared --batch flag defaults to None
    mesh = None
    if args.mesh:
        from .parallel import make_mesh
        shape = tuple(int(x) for x in args.mesh.split("x"))
        axes = ("dcn", "ici")[-len(shape):] if len(shape) > 1 else ("batch",)
        mesh = make_mesh(shape=shape, axes=axes)
    try:
        sup = harvest_error_supports(code, cfg, ebn0_db=args.harvest_ebn0,
                                     frames=args.harvest_frames,
                                     batch=min(batch, args.harvest_frames),
                                     seed=cfg.run.seed + 11,
                                     max_supports=512)
    except ValueError as e:
        raise SystemExit(f"floor: {e}")
    cores = sorted({refine_support(code, s) for s in sup[:128]
                    if len(s) <= 24}, key=lambda s: sorted(s))
    found = search_trapping_sets(code, a_max=10, b_max=4, seeds=cores,
                                 max_sets=768)
    dom = list(dict.fromkeys(
        [c for c in cores if 3 <= len(c) <= 16]
        + dominant_sets(found, k=args.k_sets, min_a=4)))[:args.k_sets]
    if args.exact_sets:
        # union in the exhaustive census's sets (native-C enumeration):
        # absorbing first, then smallest (a + b, a) — the provably
        # complete list of small attractors strengthens the proposal
        # beyond what harvesting happens to sample
        from .analysis.asenum import enumerate_sets
        a_max, b_max, dv_cap = (int(x) for x in args.exact_sets.split(","))
        r = enumerate_sets(code, a_max=a_max, b_max=b_max, dv_cap=dv_cap,
                           emit_min_a=3, emit_cap=8192)
        exact = [frozenset(S) for (_, _, _, S) in sorted(
            r.sets, key=lambda t: (not t[2], t[0] + t[1], t[0]))]
        print(f"# exact census: {len(exact)} sets "
              f"(a<={a_max} b<={b_max} dv<={dv_cap}"
              f"{', truncated' if r.emit_truncated else ''})",
              file=sys.stderr)
        dom = list(dict.fromkeys(dom + exact))[:args.k_sets]
    classes = sorted({classify(code, s) for s in dom})
    print(f"# harvested {len(sup)} failures -> {len(dom)} proposal sets, "
          f"classes {classes[:12]}", file=sys.stderr)
    if not dom:
        print("# WARNING: no failures harvested — estimates are plain MC; "
              "lower --harvest-ebn0 or raise --harvest-frames",
              file=sys.stderr)
    deltas = [float(x) for x in str(args.delta).split(",")]
    if getattr(args, "symmetric", False):
        return _floor_symmetric(args, cfg, code, dom, deltas, batch, mesh)
    if len(deltas) > 1:
        from .sim.impsamp import expand_radial
        dom_run, delta_run = expand_radial(dom, deltas)
        print(f"# radial ladder: {len(dom)} sets x {len(deltas)} depths "
              f"{deltas} -> {len(dom_run)} components", file=sys.stderr)
    else:
        dom_run, delta_run = dom, deltas[0]
    run = make_is_run(code, cfg, sets=dom_run, delta=delta_run,
                      pi0=args.pi0, batch=batch, mesh=mesh,
                      stratify=args.stratified)
    points = []
    for e in _parse_ebn0(args.ebn0):
        est = estimate_fer(code, cfg, sets=dom_run, ebn0_db=e,
                           frames=args.frames, batch=batch,
                           seed=cfg.run.seed, run=run,
                           allocation=args.allocation,
                           pilot_frames=args.pilot_frames)
        points.append(est.to_dict())
        print(json.dumps(points[-1]), flush=True)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"config": json.loads(cfg.to_json()),
                       "code": code.name,
                       "proposal": {"n_sets": len(dom),
                                    "classes": [list(c) for c in classes],
                                    "delta": deltas, "pi0": args.pi0,
                                    "stratified": bool(args.stratified),
                                    "allocation": args.allocation},
                       "points": points}, f, indent=1)
    return 0


def cmd_import_standard(args) -> int:
    """One-command exact-table swap-in (codes/imported.py): validate a
    published standard shift table against the family invariants
    (SURVEY.md §8.1 — dimensions, shift range, GF(2) rank, girth,
    IRA encodability, degree profile), smoke-decode it, and store it in
    the table registry. Family builders then return the exact table with
    standard_exact=True; only codes/ behavior changes (CLAUDE.md
    invariant 3)."""
    import os

    import jax

    from .codes import imported as imp

    # validation (incl. the smoke decode) is a CPU workload by design —
    # never grab the TPU for it
    jax.config.update("jax_platforms", "cpu")
    if args.tables_dir:
        os.environ["LDPC_TPU_TABLES"] = args.tables_dir
    fam = args.family
    if fam == "ieee80211n":
        if not (args.n and args.rate):
            raise SystemExit("import-standard: ieee80211n needs --n --rate")
        key = f"n{args.n}_r{args.rate.replace('/', '')}"
    elif fam == "dvbs2":
        if not (args.n and args.rate):
            raise SystemExit("import-standard: dvbs2 needs --n --rate")
        key = f"n{args.n}_r{args.rate.replace('/', '')}"
    elif fam == "5gnr":
        if not (args.base_graph and args.z):
            raise SystemExit("import-standard: 5gnr needs --base-graph --z")
        key = f"bg{args.base_graph}_z{args.z}"
    else:
        raise SystemExit(f"import-standard: unsupported family {fam!r}")

    if args.remove:
        ok = imp.remove(fam, key)
        print(json.dumps({"family": fam, "key": key,
                          "removed": bool(ok)}))
        return 0 if ok else 1

    if not args.file:
        raise SystemExit("import-standard: --file is required")
    Z_file, base = imp.parse_table_file(args.file)
    Z = args.z or Z_file
    if Z is None:
        raise SystemExit("import-standard: lifting size unknown — pass "
                         "--z or use a JSON file with a 'Z' field")
    try:
        report = imp.validate_table(fam, Z, base, n=args.n, rate=args.rate,
                                    base_graph=args.base_graph)
        if not args.no_smoke:
            report["smoke"] = imp.smoke_decode(Z, base)
    except ValueError as e:
        raise SystemExit(f"import-standard: REJECTED — {e}")
    path = imp.store(fam, key, Z, base,
                     meta={"source": os.path.abspath(args.file),
                           "validation": report})
    report.update({"stored": path, "family": fam, "key": key})
    print(json.dumps(report))
    return 0


def cmd_codes(args) -> int:
    from .codes.ieee80211n import all_codes
    export = getattr(args, "export_alist", None)
    if export:
        import os
        from .codes.alist import write_alist
        os.makedirs(export, exist_ok=True)
    for code in all_codes():
        print(f"{code.name}: n={code.n} k={code.k} m={code.m} Z={code.Z} "
              f"E={code.num_edges} exact={code.standard_exact}")
        if export:
            import os
            write_alist(code, os.path.join(export, f"{code.name}.alist"))
    if export:
        print(f"wrote alist files to {export}/")
    return 0


def cmd_report(args) -> int:
    import json as _json
    import types
    from .sim.report import plot_waterfall

    results = []
    for path in args.jsons:
        d = _json.load(open(path))
        r = types.SimpleNamespace(
            code_name=d["code"], decoder_backend=d["decoder_backend"],
            rows=lambda rows=d["results"]: rows)
        results.append(r)
    plot_waterfall(results, args.out, metric=args.metric)
    print(f"wrote {args.out}")
    return 0


def cmd_config(args) -> int:
    print(_build_config(args).to_json())
    return 0


def _analyze_pexit(args, cfg) -> int:
    """PEXIT threshold (analysis/exit.py): float sum-product under the
    consistent-Gaussian approximation, per-edge-type MI recursion — the
    fast design-screening leg of the analysis funnel (measured ~35x/
    threshold vs exact proto-DE at production scale, results/
    pexit_screen.json)
    (PEXIT screen -> exact proto-DE -> silicon MC). Quantizer and
    fixed-point algorithm flags do not apply and are flagged if set."""
    import math

    from .analysis.exit import exit_curves_regular, pexit_threshold_awgn
    from .sim.sweep import build_code

    if args.channel != "awgn":
        raise SystemExit("analyze: --pexit supports AWGN only")
    noted = [f for f, v in (("--algorithm", args.algorithm),
                            ("--bits", args.bits),
                            ("--beta-lsb", args.beta_lsb)) if v is not None]
    if noted:
        print(f"# note: ignored by --pexit (float sum-product ensemble "
              f"analysis): {' '.join(noted)}", file=sys.stderr)
    code = build_code(cfg)
    lo, hi = args.bracket
    # analyze's default sigma bracket is tuned for quantized DE; PEXIT
    # (float SP) thresholds sit higher — widen the default high end
    if tuple(args.bracket) == (0.3, 1.5):
        hi = 2.4
    try:
        sigma, ebn0 = pexit_threshold_awgn(
            code, iters=max(args.iters, 300), target_pe=args.target,
            tol=args.tol, bracket=(lo, hi))
    except (AssertionError, ValueError) as e:
        raise SystemExit(f"analyze --pexit: {e}")
    excl = set(map(int, code.punct_vns)) | set(map(int, code.shortened_vns))
    rate = code.k_eff / (code.n - len(excl))
    out = {"channel": "awgn-bpsk", "code": code.name,
           "method": "pexit (protograph EXIT, consistent-Gaussian float "
                     "sum-product; rate matching modeled per column)",
           "rate_for_ebn0": rate,
           "sigma_star": round(sigma, 4),
           "ebn0_star_db": round(ebn0, 3),
           "pe_target": args.target,
           "note": "Gaussian-approximation ensemble asymptote — screening "
                   "figure; validate finalists with --proto (exact "
                   "quantized multi-edge-type DE) and silicon MC"}
    if args.exit_chart:
        # average-degree EXIT chart at the threshold: the classic tunnel
        # picture (closing exactly at sigma*)
        import numpy as np

        from .analysis.de import spectra_from_code
        sp = spectra_from_code(code)
        dv = float((np.arange(len(sp.vnode)) * sp.vnode).sum())
        dc = float((np.arange(len(sp.cnode)) * sp.cnode).sum())
        Ia, I_ev, I_ec_inv = exit_curves_regular(
            max(2, int(round(dv))), max(2, int(round(dc))), sigma)
        with open(args.exit_chart, "w") as f:
            json.dump({"sigma_n": sigma, "dv": int(round(dv)),
                       "dc": int(round(dc)),
                       "I_a": [round(float(x), 6) for x in Ia],
                       "I_ev": [round(float(x), 6) for x in I_ev],
                       "I_ec_inv": [round(float(x), 6) for x in I_ec_inv]},
                      f)
        out["exit_chart"] = args.exit_chart
    print(json.dumps(out))
    return 0


def cmd_analyze(args) -> int:
    """Density-evolution threshold for the configured code (the offline
    analysis role the reference kept in MATLAB — analysis/de.py). Pure
    NumPy: never touches the TPU."""
    import math

    from .analysis import de
    from .config import cn_params
    from .sim.sweep import build_code

    cfg = _build_config(args)
    if getattr(args, "pexit", False):
        # dispatch BEFORE the quantized-DE algorithm gate: PEXIT is float
        # sum-product and merely notes ignored algorithm flags
        return _analyze_pexit(args, cfg)
    if cfg.decoder.algorithm not in ("min-sum", "offset-min-sum",
                                     "normalized-min-sum", "min-star"):
        raise SystemExit(f"analyze: quantized DE covers the fixed-point "
                         f"min-sum family and min-star, not "
                         f"{cfg.decoder.algorithm}")
    if getattr(args, "scan_scale", None):
        return _analyze_scan_scale(args, cfg)
    # DE uses only the code profile + quantizer + CN parameters; flag the
    # decode/sweep flags that parse but cannot affect the computation
    # (--iters, not --max-iter, bounds the DE recursion).
    ignored = [f for f, v in (
        ("--max-iter", args.max_iter), ("--schedule", args.schedule),
        ("--modulation", args.modulation), ("--batch", args.batch),
        ("--seed", args.seed), ("--rng", args.rng),
        ("--phase1-iters", args.phase1_iters),
        ("--no-early-term", args.no_early_term),
        ("--all-zeros", args.all_zeros)) if v]
    if ignored:
        print(f"# note: ignored by analyze (DE is decoder-parameter-only): "
              f"{' '.join(ignored)}", file=sys.stderr)
    code = build_code(cfg)
    sp = de.spectra_from_code(code)
    if cfg.decoder.algorithm == "min-star":
        from .config import minstar_thresholds
        beta, alpha, minstar = 0, None, minstar_thresholds(cfg.quant)
    else:
        beta, alpha = cn_params(cfg.decoder, cfg.quant)
        minstar = None
    kw = dict(beta=beta, alpha=alpha, iters=args.iters, tol=args.tol,
              target=args.target, minstar=minstar)
    if sp.vnode[1] > 0 and args.min_decision_degree < 2:
        print("# note: code has degree-1 variables (irreducible decision "
              "floor); consider --min-decision-degree 2", file=sys.stderr)
    if args.min_decision_degree > 1:
        kw["decision_vnode"] = de.decision_weights_min_degree(
            sp, args.min_decision_degree)
    try:
        if args.proto:
            if args.channel != "awgn":
                raise SystemExit("analyze: --proto supports AWGN only")
            if args.min_decision_degree > 1:
                print("# note: --min-decision-degree ignored with --proto "
                      "(protograph decision Pe is already over info columns, "
                      "which excludes the degree-1 parity variables)",
                      file=sys.stderr)
            from .analysis.proto_de import proto_de_threshold_awgn
            lo, hi = args.bracket
            sigma = proto_de_threshold_awgn(
                code, cfg.quant, beta=beta, alpha=alpha, iters=args.iters,
                tol=args.tol, target=args.target, bracket=(lo, hi),
                minstar=minstar)
            excl = set(map(int, code.punct_vns)) | set(
                map(int, code.shortened_vns))
            rate = code.k_eff / (code.n - len(excl))
            out = {"channel": "awgn-bpsk", "code": code.name,
                   "method": "protograph (multi-edge-type, rate matching "
                             "modeled; decision = info columns)",
                   "rate_for_ebn0": rate, "bits": cfg.quant.bits,
                   "algorithm": cfg.decoder.algorithm,
                   "sigma_star": round(sigma, 4),
                   "ebn0_star_db": round(
                       -20.0 * math.log10(sigma * math.sqrt(2 * rate)), 3)}
            if sigma >= hi - 2 * args.tol:
                out["bracket_saturated"] = True
        elif args.channel == "awgn":
            lo, hi = args.bracket
            sigma = de.de_threshold_awgn_spectra(
                sp, cfg.quant, bracket=(lo, hi), **kw)
            rate = code.k_eff / code.n
            out = {"channel": "awgn-bpsk", "code": code.name,
                   "rate": rate, "bits": cfg.quant.bits,
                   "algorithm": cfg.decoder.algorithm,
                   "sigma_star": round(sigma, 4),
                   "ebn0_star_db": round(
                       -20.0 * math.log10(sigma * math.sqrt(2 * rate)), 3)}
            if sigma >= hi - 2 * args.tol:
                out["bracket_saturated"] = True
                print(f"# WARNING: threshold sits at the bracket's upper "
                      f"edge ({hi}) — the true sigma* may be larger; "
                      f"raise --bracket", file=sys.stderr)
        else:
            p = de.de_threshold_bsc_spectra(
                sp, cfg.quant, bracket=(1e-3, 0.4), **kw)
            out = {"channel": "bsc", "code": code.name,
                   "algorithm": cfg.decoder.algorithm,
                   "p_star": round(p, 5)}
            if p >= 0.4 - 2 * args.tol:
                out["bracket_saturated"] = True
    except ValueError as e:
        # e.g. bit-granular (non-Z-aligned) puncturing, which the
        # per-column analyses refuse rather than silently over-puncture
        raise SystemExit(f"analyze: {e}")
    except AssertionError as e:
        raise SystemExit(
            f"analyze: {e} — DE does not reach Pe <= {args.target} at the "
            f"bracket's easy end; widen --bracket downward, raise --iters, "
            f"or relax --target (profiles with DE floors, e.g. NR mother "
            f"codes, need --target 1e-4 --min-decision-degree 2)")
    out.update({"pe_target": args.target,
                "max_dv": sp.max_dv, "max_dc": sp.max_dc,
                "note": ("protograph ensemble asymptote (exact edge types "
                         "of the structured base)" if args.proto else
                         "ensemble asymptote over the code's lambda/rho "
                         "spectra (single edge type)")})
    print(json.dumps(out))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="ldpc_tpu", description=__doc__,
                                formatter_class=argparse.RawDescriptionHelpFormatter)
    sub = p.add_subparsers(dest="cmd", required=True)

    sw = sub.add_parser("sweep", help="run a BER/FER sweep")
    cfgp = sub.add_parser("config", help="print the resolved config JSON")
    co = sub.add_parser(
        "construct",
        help="construct a code (e.g. --family qcpeg) and report "
             "girth/rank; --export-alist FILE writes H")
    co.add_argument("--export-alist", dest="export_alist", default=None)
    co.add_argument("--census", default=None, metavar="A,B,DVCAP",
                    help="exhaustive absorbing-set census (native-C ESU "
                         "enumeration, analysis/asenum.py), e.g. 8,3,3 = "
                         "all connected sets a<=8 b<=3 over VNs of degree "
                         "<=3")
    fl = sub.add_parser(
        "floor",
        help="error-floor FER via trapping-set mixture importance "
             "sampling (harvest -> refine/search -> unbiased IS)")
    fl.add_argument("--ebn0", default="3.0,3.5,4.0,4.5,5.0",
                    help="IS estimation points, lo:hi:step or comma list")
    fl.add_argument("--frames", type=int, default=1_000_000,
                    help="proposal frames per SNR point")
    fl.add_argument("--harvest-ebn0", dest="harvest_ebn0", type=float,
                    default=2.2, help="waterfall-knee SNR for harvesting")
    fl.add_argument("--harvest-frames", dest="harvest_frames", type=int,
                    default=131072)
    fl.add_argument("--delta", default="2.0",
                    help="mean shift toward each set (2.0 = full flip); a "
                         "comma list (e.g. 1.2,1.6,2.0) builds a radial "
                         "LADDER — every set at every depth (the deep-"
                         "floor variance fix)")
    fl.add_argument("--pi0", type=float, default=0.25,
                    help="unshifted mixture weight (weights bounded by "
                         "1/pi0; the defensive component)")
    fl.add_argument("--k-sets", dest="k_sets", type=int, default=48)
    fl.add_argument("--exact-sets", dest="exact_sets", default=None,
                    metavar="A,B,DVCAP",
                    help="union the exhaustive census's sets into the IS "
                         "proposal (e.g. 8,2,3); absorbing sets rank "
                         "first")
    fl.add_argument("--symmetric", action="store_true",
                    help="symmetry-folded estimator (QC codes): one "
                         "canonical representative per orbit, exact "
                         "M0/M Z-fold; combine with --seeds for the "
                         "seed-repeatability convergence bar")
    fl.add_argument("--seeds", default=None,
                    help="with --symmetric: comma list of seeds; the "
                         "output marks each point seed_repeatable only "
                         "when all agree within quoted errors")
    fl.add_argument("--stratified", action="store_true",
                    help="deterministic per-component lane allocation "
                         "(removes multinomial component-count noise — the "
                         "crossover-region variance fix)")
    fl.add_argument("--allocation", default="proportional",
                    choices=["proportional", "neyman"],
                    help="stratified lane allocation rule; neyman runs a "
                         "pilot phase and allocates ~ pi_j * std_j")
    fl.add_argument("--pilot-frames", dest="pilot_frames", type=int,
                    default=0,
                    help="pilot frames per point for --allocation neyman "
                         "(excluded from the reported estimate)")
    fl.add_argument("--out", default=None, help="JSON output path")
    fl.add_argument("--platform", default=None,
                    choices=["cpu", "tpu", "axon"])
    fl.add_argument("--mesh", default=None,
                    help="mesh shape, e.g. 8 or 2x4 — shards the IS frame "
                         "batch like the sweep's DP")
    an = sub.add_parser(
        "analyze", help="density-evolution threshold for the configured "
                        "code (offline, pure NumPy — analysis/de.py)")
    an.add_argument("--channel", default="awgn", choices=["awgn", "bsc"])
    an.add_argument("--iters", type=int, default=120)
    an.add_argument("--tol", type=float, default=2e-3)
    an.add_argument("--target", type=float, default=1e-7,
                    help="Pe convergence target (use 1e-4 for profiles "
                         "with DE floors, e.g. NR mother codes)")
    an.add_argument("--bracket", type=float, nargs=2, default=[0.3, 1.5],
                    help="AWGN sigma bisection bracket")
    an.add_argument("--proto", action="store_true",
                    help="protograph (multi-edge-type) DE: exact for the "
                         "structured bases, rate matching modeled, "
                         "decision over info columns (slower — NR BG1 "
                         "Z=384 ~2 min)")
    an.add_argument("--pexit", action="store_true",
                    help="protograph EXIT (Gaussian-approximation float "
                         "sum-product, analysis/exit.py): the fast "
                         "design-screening tool (~35x/threshold vs "
                         "--proto at production scale); "
                         "quantizer/algorithm flags do not apply")
    an.add_argument("--exit-chart", dest="exit_chart", default=None,
                    help="with --pexit: also write the (I_a, I_ev, "
                         "I_ec^-1) EXIT chart of the profile's average "
                         "(dv, dc) at the threshold to this JSON path")
    an.add_argument("--scan-scale", dest="scan_scale", default=None,
                    help="quantizer design: scan LLR scales 'lo:hi:count' "
                         "(geometric) and report the DE threshold per "
                         "scale + the best")
    an.add_argument("--min-decision-degree", dest="min_decision_degree",
                    type=int, default=1,
                    help="restrict the decision average to variable "
                         "degrees >= D (2 excludes NR's degree-1 "
                         "extension parities)")
    for q in (sw, cfgp, an, co, fl):
        q.add_argument("--preset", choices=sorted(PRESETS), default=None)
        q.add_argument("--family", default=None,
                       choices=["ieee80211n", "5gnr", "dvbs2", "toy",
                                "qcpeg", "pbrl"])
        q.add_argument("--core-rows", dest="core_rows", type=int,
                       default=None,
                       help="pbrl family: dual-diagonal core rows (cb)")
        q.add_argument("--ext-row-degree", dest="ext_row_degree", type=int,
                       default=None,
                       help="pbrl family: circulants per extension row")
        q.add_argument("--profile", default=None,
                       help="qcpeg family: info-column base degrees, "
                            "'deg:frac,...' or explicit 'd0,d1,...' "
                            "(default uniform 3)")
        q.add_argument("--code-seed", dest="code_seed", type=int,
                       default=None,
                       help="qcpeg family: construction seed")
        q.add_argument("--n", type=int, default=None)
        q.add_argument("--rate", default=None)
        q.add_argument("--base-graph", dest="base_graph", type=int, default=None)
        q.add_argument("--Z", type=int, default=None)
        q.add_argument("--code-file", dest="code_file", default=None,
                       help="load H from a MacKay alist file "
                            "(sets family=alist)")
        q.add_argument("--k-info", dest="k_info", type=int, default=None,
                       help="5G NR payload bits (enables shortening)")
        q.add_argument("--puncture-frac", dest="puncture_frac", type=float,
                       default=None,
                       help="rate-compatible puncturing: fraction of parity "
                            "bits never transmitted (LLR 0 at the decoder); "
                            "works with any family")
        q.add_argument("--puncture-scheme", dest="puncture_scheme",
                       default=None, choices=["tail", "random"],
                       help="puncture order (nested across fractions)")
        q.add_argument("--shorten-bits", dest="shorten_bits", type=int,
                       default=None,
                       help="generic shortening: last N info bits known "
                            "zero (any family)")
        q.add_argument("--modulation", default=None,
                       choices=["bpsk", "qpsk", "16qam", "64qam",
                                "8psk", "16apsk", "32apsk"])
        q.add_argument("--algorithm", default=None,
                       choices=["min-sum", "offset-min-sum",
                                "normalized-min-sum", "min-star",
                                "sum-product", "min-sum-float",
                                "offset-min-sum-float",
                                "normalized-min-sum-float"])
        q.add_argument("--schedule", default=None,
                       choices=["flooding", "layered"])
        q.add_argument("--max-iter", dest="max_iter", type=int, default=None)
        q.add_argument("--phase1-iters", dest="phase1_iters", type=int,
                       default=None,
                       help="two-phase early termination: iterations before "
                            "repacking unconverged lanes (TPU operating-"
                            "point optimization; bit-exact); -1 = AUTO "
                            "(probe the convergence CDF per SNR point)")
        q.add_argument("--auto-two-phase", action="store_true",
                       help="shorthand for --phase1-iters -1")
        q.add_argument("--no-early-term", action="store_true")
        q.add_argument("--bits", type=int, default=None)
        q.add_argument("--beta-lsb", dest="beta_lsb", type=int, default=None)
        q.add_argument("--batch", type=int, default=None)
        q.add_argument("--seed", type=int, default=None)
        q.add_argument("--max-frames", dest="max_frames", type=int, default=None)
        q.add_argument("--target-errors", dest="target_errors", type=int,
                       default=None)
        q.add_argument("--all-zeros", action="store_true",
                       help="transmit the all-zeros codeword (skip encoder)")
        q.add_argument("--rng", default=None, choices=["host", "device"],
                       help="device = Monte-Carlo megakernel: the whole "
                            "chain runs inside the decode kernel off the "
                            "TPU hardware PRNG (single-chip fast path; "
                            "host threefry elsewhere)")
    sw.add_argument("--ebn0", default="1.0:3.0:0.5",
                    help="lo:hi:step or comma list (dB)")
    sw.add_argument("--decoder-backend", default="auto",
                    choices=["auto", "pallas", "jnp", "qc-jnp"])
    sw.add_argument("--mesh", default=None,
                    help="mesh shape, e.g. 8 or 2x4 (dcn x ici)")
    sw.add_argument("--fused", action="store_true",
                    help="advance all SNR points in one fused device program")
    sw.add_argument("--checkpoint", default=None,
                    help="JSON state path for resume (default: <out>.state "
                         "when --out is given)")
    sw.add_argument("--no-checkpoint", action="store_true",
                    help="disable the <out>.state default checkpoint")
    sw.add_argument("--lookahead", type=int, default=4,
                    help="device calls kept in flight (latency hiding)")
    sw.add_argument("--superbatches", type=int, default=1,
                    help="sub-batches accumulated inside one device call")
    sw.add_argument("--coordinator", default=None,
                    help="multi-host: coordinator address host:port")
    sw.add_argument("--num-processes", dest="num_processes", type=int,
                    default=None, help="multi-host: total process count")
    sw.add_argument("--process-id", dest="process_id", type=int, default=None,
                    help="multi-host: this process's index")
    sw.add_argument("--out", default=None, help="output prefix (json+csv)")
    sw.add_argument("--plot", action="store_true", help="also write PNG")
    sw.add_argument("--platform", default=None, choices=["cpu", "tpu", "axon"],
                    help="force the JAX platform (the env var is latched by "
                         "the preloaded jax import; this uses jax.config)")

    sub.add_parser("presets", help="list named workload presets")
    cp = sub.add_parser("codes", help="list built-in 802.11n codes")
    cp.add_argument("--export-alist", dest="export_alist", default=None,
                    help="also write each code's H to DIR in alist format")
    rp = sub.add_parser("report", help="plot waterfalls from saved results")
    rp.add_argument("jsons", nargs="+", help="result .json files")
    rp.add_argument("--out", required=True, help="output PNG path")
    rp.add_argument("--metric", default="ber", choices=["ber", "fer"])
    im = sub.add_parser(
        "import-standard",
        help="validate + install a published exact shift table "
             "(codes/imported.py); family builders then return it with "
             "standard_exact=True")
    im.add_argument("--family", required=True,
                    choices=["ieee80211n", "5gnr", "dvbs2"])
    im.add_argument("--n", type=int, default=None)
    im.add_argument("--rate", default=None)
    im.add_argument("--base-graph", dest="base_graph", type=int,
                    default=None)
    im.add_argument("--z", type=int, default=None,
                    help="lifting size (optional for JSON files with 'Z')")
    im.add_argument("--file", default=None,
                    help="shift table: JSON {'Z', 'base'} or whitespace "
                         "grid ('-' = no edge)")
    im.add_argument("--no-smoke", dest="no_smoke", action="store_true",
                    help="skip the decode smoke test")
    im.add_argument("--remove", action="store_true",
                    help="remove a previously imported table instead")
    im.add_argument("--tables-dir", dest="tables_dir", default=None,
                    help="registry directory (default $LDPC_TPU_TABLES or "
                         "<repo>/imported_tables)")
    return p


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO,
                        format="%(asctime)s %(name)s %(message)s")
    args = build_parser().parse_args(argv)
    return {"sweep": cmd_sweep, "presets": cmd_presets,
            "codes": cmd_codes, "config": cmd_config,
            "report": cmd_report, "analyze": cmd_analyze,
            "construct": cmd_construct, "floor": cmd_floor,
            "import-standard": cmd_import_standard}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
