"""Quantizer design table: DE-optimal LLR scale per bit width.

The reference answers 'which fixed-point format?' by re-running its whole
C simulation per format; here the quantized-DE layer answers it in
seconds per (bits, scale) cell. Scans the canonical 802.11n n=648 r=1/2
OMS profile; validates (or indicts) the repo's frozen scale=4.0 at 8 bits
and gives the design rule for narrow formats. Pure CPU/NumPy.

Writes results/scale_design.json.

Usage: PYTHONPATH=. python scripts/make_scale_design.py
"""
import json
import math
import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    from ldpc_tpu.analysis import de
    from ldpc_tpu.codes.ieee80211n import make_code
    from ldpc_tpu.config import QuantConfig

    code = make_code(648, "1/2")
    sp = de.spectra_from_code(code)
    rate = code.k / code.n
    out = {"code": code.name, "algorithm": "offset-min-sum (beta 2 LSB)",
           "rows": []}
    scales = [1.0, 1.5, 2.0, 3.0, 4.0, 6.0, 8.0, 12.0]
    for bits in (4, 5, 6, 7, 8):
        best = None
        for s in scales:
            q = QuantConfig(bits=bits, scale=s, beta_lsb=2)
            try:
                sigma = de.de_threshold_awgn_spectra(
                    sp, q, beta=2, bracket=(0.3, 1.1))
                e = round(-20 * math.log10(sigma * math.sqrt(2 * rate)), 3)
            except (AssertionError, ValueError):
                continue
            row = {"bits": bits, "scale": s, "ebn0_star_db": e,
                   "llr_clip": round(q.qmax / s, 2)}
            out["rows"].append(row)
            if best is None or e < best["ebn0_star_db"]:
                best = row
        out.setdefault("best", {})[str(bits)] = best
        print(f"bits {bits}: best {best}", flush=True)
    with open("results/scale_design.json", "w") as f:
        json.dump(out, f, indent=1)
    print("done", flush=True)


if __name__ == "__main__":
    main()
