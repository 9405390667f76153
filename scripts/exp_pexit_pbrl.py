"""Experiment: PEXIT-guided PBRL extension-row column selection vs the
BFS-placed design, scored by proto-DE rung thresholds."""
import numpy as np, time, itertools
from ldpc_tpu.analysis.exit import pexit_threshold_sigma
from ldpc_tpu.analysis.proto_de import proto_de_threshold_awgn
from ldpc_tpu.codes.peg import pbrl_construct, parse_profile
from ldpc_tpu.codes.qcstruct import parity_skeleton, detect_enc_struct
from ldpc_tpu.codes.code import expand_qc
from ldpc_tpu.codes.rate_compat import puncture
from ldpc_tpu.config import QuantConfig

kb, cb, Z, n_ext, erd = 12, 4, 27, 12, 4
core_prof = np.asarray([2]*3 + [3]*6 + [4]*3)
quant = QuantConfig(bits=8, scale=4.0, beta_lsb=2)
rng = np.random.default_rng(0)

# Start from the BFS-designed mother (keeps the core; we re-choose ext rows)
bfs = pbrl_construct(kb=kb, cb=cb, Z=Z, n_ext=n_ext,
                     core_col_degrees=core_prof, ext_row_degree=erd, seed=0)
B_bfs = bfs.base.copy()
mb, nb = B_bfs.shape

def rung_threshold_pexit(B, last_row):
    """PEXIT sigma threshold of the subgraph rows 0..last_row, decision
    over info columns (higher sigma = better)."""
    rows = B[:last_row + 1]
    # columns beyond the transmitted set: ext parity cols of rows > last_row
    # are entirely absent from the subgraph (weight-1), so just slice cols
    keep_cols = list(range(kb + cb)) + [kb + cb + t for t in range(last_row + 1 - cb)]
    sub = rows[:, keep_cols]
    try:
        return pexit_threshold_sigma(sub, iters=300, tol=2e-3,
                                     decision_cols=list(range(kb)),
                                     bracket=(0.2, 2.4))
    except (AssertionError, ValueError):
        return 0.0

# Greedy PEXIT re-design of extension rows on top of the same core
B = B_bfs.copy()
B[cb:, :kb + cb] = -1  # strip BFS ext-row circulants (keep identities)
allowed = list(range(kb + cb))
t0 = time.time()
for e in range(cb, mb):
    pool = [tuple(sorted(rng.choice(allowed, erd, replace=False))) for _ in range(48)]
    pool.append(tuple(sorted(np.nonzero(B_bfs[e, :kb + cb] >= 0)[0])))  # BFS pick
    pool = list(dict.fromkeys(pool))
    best, best_t = None, -1.0
    for cand in pool:
        Bt = B.copy()
        for j in cand:
            Bt[e, j] = 0  # shifts irrelevant to PEXIT
        t = rung_threshold_pexit(Bt, e)
        if t > best_t:
            best, best_t = cand, t
    for j in best:
        B[e, j] = 0
    print(f"row {e}: best {best} pexit sigma* {best_t:.3f} ({time.time()-t0:.0f}s)", flush=True)

# assign shifts to the PEXIT-chosen ext entries by the same BFS+veto placer
from ldpc_tpu.codes.peg import _place_row_edge
B2 = B_bfs.copy()
B2[cb:, :kb + cb] = -1
for e in range(cb, mb):
    cols = sorted(np.nonzero(B[e, :kb + cb] >= 0)[0])
    for j in cols:
        # place exactly onto column j: restrict allowed cols to {j}
        ok = _place_row_edge(B2, Z, e, [int(j)], rng)
        assert ok, (e, j)
pexit_code = expand_qc(B2, Z, name="pbrl-pexit", standard_exact=False)
assert detect_enc_struct(B2) is not None

fracs = {"r0.50": 108/432, "r0.57": 189/432, "r0.67": 270/432, "r0.75": 324/432}
def rungs(code):
    out = {}
    for k, f in fracs.items():
        s = proto_de_threshold_awgn(puncture(code, frac=f), quant, beta=2, bracket=(0.35, 1.2))
        c = puncture(code, frac=f)
        out[k] = round(float(-20*np.log10(s*np.sqrt(2*c.rate))), 3)
    return out
print("BFS design rungs:  ", rungs(bfs), flush=True)
print("PEXIT design rungs:", rungs(pexit_code), flush=True)
print("EXP_DONE", flush=True)
