"""Offset (beta) design scan via protograph DE — which OMS offset should
the DVB-S2/NR presets use? The round-2 cn-variants study answered this
EMPIRICALLY for 802.11n (results/cn_variants_*); this artifact answers it
ANALYTICALLY for the structured long codes where Monte-Carlo sweeps per
beta are expensive, using the exact multi-edge-type thresholds
(analysis/proto_de.py). Pure NumPy. Usage:
PYTHONPATH=. python scripts/make_beta_scan.py [outdir]
"""
import json
import math
import sys
import time

sys.path.insert(0, ".")

from ldpc_tpu.analysis.proto_de import proto_de_threshold_awgn  # noqa: E402
from ldpc_tpu.config import QuantConfig  # noqa: E402


def main() -> None:
    outdir = sys.argv[1] if len(sys.argv) > 1 else "results"
    from ldpc_tpu.codes.dvbs2 import make_code as dvbs2
    from ldpc_tpu.codes.nr_bg import make_code as nrbg

    rows = []
    cases = [("dvbs2_64800_r12", dvbs2(64800, "1/2"), (0.6, 1.3), None),
             ("nr_bg1_z384_r12", nrbg(base_graph=1, Z=384), (0.5, 1.4),
              None),
             ("nr_bg2_z128_r12", nrbg(base_graph=2, Z=128), (0.5, 1.3),
              None)]
    for name, code, bracket, _ in cases:
        excl = set(map(int, code.punct_vns)) | set(map(int,
                                                       code.shortened_vns))
        rate = code.k_eff / (code.n - len(excl))
        for beta in (0, 1, 2, 3):
            q = QuantConfig(bits=8, scale=4.0, beta_lsb=beta)
            t0 = time.time()
            sigma = proto_de_threshold_awgn(code, q, beta=beta, iters=70,
                                            tol=5e-3, target=1e-5,
                                            bracket=bracket)
            row = {"code": name, "beta_lsb": beta,
                   "sigma_star": round(sigma, 4),
                   "ebn0_star_db": round(
                       -20.0 * math.log10(sigma * math.sqrt(2 * rate)), 3),
                   "wall_s": round(time.time() - t0, 1)}
            rows.append(row)
            print(row, flush=True)

    # best-beta summary per code
    best = {}
    for r in rows:
        b = best.get(r["code"])
        if b is None or r["sigma_star"] > b["sigma_star"]:
            best[r["code"]] = r
    out = {"scan": rows,
           "best": {k: {"beta_lsb": v["beta_lsb"],
                        "ebn0_star_db": v["ebn0_star_db"]}
                    for k, v in best.items()},
           "notes": "protograph-DE AWGN thresholds vs OMS offset beta "
                    "(8-bit, scale 4, Pe<=1e-5, rate matching modeled; "
                    "Eb/N0 over transmitted bits)"}
    path = f"{outdir}/proto_beta_scan.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
