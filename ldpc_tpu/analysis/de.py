"""Density evolution for (dv, dc)-regular LDPC ensembles (NumPy, offline).

Two analyses, both tracking the all-zeros-codeword / symmetric-channel
message distributions on the cycle-free ensemble (standard DE assumptions):

1. Hard-decision Gallager-A/B over the BSC — closed-form error-probability
   recursion (Gallager 1963):
     q_l      = (1 - (1 - 2 p_l)^(dc-1)) / 2          [CN wrong prob]
     p_{l+1}  = (1-p0) * P[Bin(dv-1, q_l) >= t]
              + p0 * (1 - P[Bin(dv-1, 1-q_l) >= t])   [VN flip rule, thr t]
   with t = dv-1 for Gallager-A and floor((dv-1)/2)+1 (strict majority of
   the other checks) for Gallager-B — the same pinned thresholds as
   golden/decoder.decode_hard.

2. Discrete density evolution for THIS repo's exact fixed-point min-sum /
   offset / normalized-min-sum semantics (golden/decoder.py): integer
   message alphabet [-qmax, qmax], CN = sign-product x exclude-self min
   magnitude folded pairwise (associative), then the pinned magnitude
   transform ((mag*num)>>shift, -beta, floor 0, cap qmax), VN = exact wide
   accumulation then saturation to [-qmax, qmax], hard decision 'bit=1 iff
   total < 0'. The channel pmf comes from the same quantizer
   (round-half-away-from-zero, symmetric saturation) applied to BPSK-AWGN
   LLRs (llr = 2y/sigma^2, y ~ N(+1, sigma^2)) or BSC LLRs
   (ops/channel.bsc_llr).

Thresholds are found by bisection on the channel parameter: the largest
sigma (AWGN) / p (BSC) whose decision-error probability falls below a
target within the iteration budget. These are ensemble asymptotics —
finite-length codes operate with a gap to them (tests cross-check the
direction against the Monte-Carlo simulator on a regular array code).
"""
from __future__ import annotations

import math
from typing import Optional, Tuple

import numpy as np

from ..config import QuantConfig


# ---------------------------------------------------------------------------
# 1. Hard-decision Gallager-A/B recursion (BSC)
# ---------------------------------------------------------------------------

def _binom_tail(n: int, k: int, p: np.ndarray) -> np.ndarray:
    """P[Bin(n, p) >= k] (exact sum; n is tiny)."""
    p = np.asarray(p, np.float64)
    out = np.zeros_like(p)
    for j in range(k, n + 1):
        out += math.comb(n, j) * p**j * (1 - p) ** (n - j)
    return out


def gallager_trajectory(p0: float, dv: int, dc: int,
                        algorithm: str = "gallager-b",
                        threshold: Optional[int] = None,
                        iters: int = 500) -> np.ndarray:
    """Message-error-probability trajectory p_0..p_iters for BSC(p0)."""
    if threshold is not None:
        t = int(threshold)
    elif algorithm == "gallager-a":
        t = max(dv - 1, 1)
    elif algorithm == "gallager-b":
        t = (dv - 1) // 2 + 1
    else:
        raise ValueError(algorithm)
    traj = [p0]
    p = float(p0)
    for _ in range(iters):
        q = (1.0 - (1.0 - 2.0 * p) ** (dc - 1)) / 2.0
        p = float((1 - p0) * _binom_tail(dv - 1, t, q)
                  + p0 * (1.0 - _binom_tail(dv - 1, t, 1.0 - q)))
        traj.append(p)
        if p < 1e-12 or p > 0.5:
            break
    return np.asarray(traj)


def gallager_threshold(dv: int, dc: int, algorithm: str = "gallager-b",
                       threshold: Optional[int] = None,
                       tol: float = 1e-5) -> float:
    """Largest p0 for which the recursion converges to 0 (bisection)."""
    lo, hi = 0.0, 0.5
    while hi - lo > tol:
        mid = (lo + hi) / 2
        ok = gallager_trajectory(mid, dv, dc, algorithm, threshold)[-1] < 1e-10
        lo, hi = (mid, hi) if ok else (lo, mid)
    return lo


# ---------------------------------------------------------------------------
# 2. Discrete density evolution for quantized min-sum (AWGN / BSC)
# ---------------------------------------------------------------------------

def _phi(x):
    return 0.5 * (1.0 + np.vectorize(math.erf)(x / math.sqrt(2.0)))


def chan_pmf_awgn(sigma: float, quant: QuantConfig) -> np.ndarray:
    """pmf over [-qmax, qmax] of the quantized channel LLR under the
    all-zeros codeword: y ~ N(+1, sigma^2), llr = 2y/sigma^2, quantized by
    the pinned round-half-away + symmetric-saturation rule."""
    Q = quant.qmax
    scale = float(quant.scale)
    mu = 2.0 * scale / sigma**2          # mean of scale*llr
    sd = 2.0 * scale / sigma             # std  of scale*llr
    v = np.arange(-Q, Q + 1, dtype=np.float64)
    lo = np.where(v > -Q, v - 0.5, -np.inf)   # round-half-away cell edges;
    hi = np.where(v < Q, v + 0.5, np.inf)     # saturation absorbs the tails
    pmf = _phi((hi - mu) / sd) - _phi((lo - mu) / sd)
    return pmf / pmf.sum()


def chan_pmf_bsc(p: float, quant: QuantConfig) -> np.ndarray:
    """Two-spike pmf of the quantized BSC LLR (ops/channel.bsc_llr) under
    the all-zeros codeword: magnitude log((1-p)/p), wrong sign w.p. p."""
    from ..golden.decoder import quantize as gq
    Q = quant.qmax
    mag = math.log((1.0 - p) / p)
    qv = int(gq(np.array([mag]), quant.scale, quant.bits)[0])
    pmf = np.zeros(2 * Q + 1)
    pmf[Q + qv] += 1.0 - p
    pmf[Q - qv] += p
    return pmf


def _cn_pair(pa: np.ndarray, pb: np.ndarray, Q: int) -> np.ndarray:
    """pmf of c = sgn(a) sgn(b) min(|a|, |b|) for independent a, b.

    sign(0) = +1 per the pinned convention, but a zero magnitude forces
    c = 0 regardless of signs, so all mass with min-mag 0 lands on 0.
    """
    ap, bp = pa[Q + 1:], pb[Q + 1:]            # P(x = +v), v = 1..Q
    an, bn = pa[:Q][::-1], pb[:Q][::-1]        # P(x = -v), v = 1..Q
    a0, b0 = pa[Q], pb[Q]
    # Tails P(|x| > v & sign s), v = 1..Q (reverse cumsum shifted by one).
    def tail(x):
        c = np.cumsum(x[::-1])[::-1]
        return np.concatenate([c[1:], [0.0]])
    TAp, TAn, TBp, TBn = tail(ap), tail(an), tail(bp), tail(bn)
    pos = (ap * TBp + an * TBn + bp * TAp + bn * TAn
           + ap * bp + an * bn)
    neg = (ap * TBn + an * TBp + bp * TAn + bn * TAp
           + ap * bn + an * bp)
    out = np.zeros(2 * Q + 1)
    out[Q + 1:] = pos
    out[:Q] = neg[::-1]
    out[Q] = a0 + b0 - a0 * b0
    return out


def _cn_mag_transform(pmf: np.ndarray, Q: int, beta: int,
                      alpha: Optional[Tuple[int, int]]) -> np.ndarray:
    """Apply the pinned magnitude transform to a message pmf:
    mag' = min(max(((mag*num)>>shift) - beta, 0), Q), sign kept."""
    out = np.zeros_like(pmf)
    for v in range(-Q, Q + 1):
        mag = abs(v)
        if alpha is not None:
            mag = (mag * alpha[0]) >> alpha[1]
        mag = min(max(mag - beta, 0), Q)
        nv = mag if v > 0 else -mag
        out[Q + nv] += pmf[Q + v]
    return out


def _vn_conv(chan: np.ndarray, c2v: np.ndarray, n_msgs: int,
             Q: int) -> np.ndarray:
    """pmf of clip(chan + sum of n_msgs iid c2v, [-Q, Q]) (exact wide
    accumulation then saturation, per the pinned VN rule)."""
    acc = chan.copy()
    for _ in range(n_msgs):
        acc = np.convolve(acc, c2v)
    # acc is centered: length L, value range [-(L-1)/2, (L-1)/2].
    C = (len(acc) - 1) // 2
    out = acc[C - Q: C + Q + 1].copy()
    out[0] += acc[: C - Q].sum()
    out[-1] += acc[C + Q + 1:].sum()
    return out


def de_pe_trajectory(chan_pmf: np.ndarray, dv: int, dc: int,
                     beta: int = 0, alpha: Optional[Tuple[int, int]] = None,
                     qmax: int = 127, iters: int = 100) -> np.ndarray:
    """Decision-error-probability trajectory of quantized min-sum DE.

    chan_pmf: pmf over [-qmax, qmax] (chan_pmf_awgn / chan_pmf_bsc).
    Returns Pe after 0..iters iterations, Pe = P(decision total < 0).
    """
    Q = qmax
    assert len(chan_pmf) == 2 * Q + 1

    def pe_decision(c2v):
        acc = chan_pmf.copy()
        for _ in range(dv):
            acc = np.convolve(acc, c2v)
        C = (len(acc) - 1) // 2
        return float(acc[:C].sum())

    v2c = chan_pmf.copy()
    traj = [float(chan_pmf[:Q].sum())]
    for _ in range(iters):
        folded = v2c
        for _ in range(dc - 2):
            folded = _cn_pair(folded, v2c, Q)
        c2v = _cn_mag_transform(folded, Q, beta, alpha)
        v2c = _vn_conv(chan_pmf, c2v, dv - 1, Q)
        # Renormalize: the per-iteration roundoff in the fold/conv chain is
        # ~1e-16 but amplifies ~(dc-1+2(dv-1))x per iteration — without this
        # the drift overflows float64 within ~60 iterations.
        np.maximum(v2c, 0.0, out=v2c)
        v2c /= v2c.sum()
        traj.append(pe_decision(c2v))
        if traj[-1] < 1e-12:
            break
    return np.asarray(traj)


def de_threshold_awgn(dv: int, dc: int, quant: QuantConfig,
                      beta: int = 0,
                      alpha: Optional[Tuple[int, int]] = None,
                      iters: int = 100, target: float = 1e-7,
                      tol: float = 2e-3,
                      bracket: Tuple[float, float] = (0.3, 1.5)) -> float:
    """Largest AWGN sigma at which DE drives Pe below target (bisection).
    Eb/N0 at rate R: -20*log10(sigma*sqrt(2R))."""
    lo, hi = bracket

    def ok(sigma):
        pe = de_pe_trajectory(chan_pmf_awgn(sigma, quant), dv, dc, beta,
                              alpha, quant.qmax, iters)
        return pe[-1] < target

    assert ok(lo), "bracket low end must converge"
    while hi - lo > tol:
        mid = (lo + hi) / 2
        lo, hi = (mid, hi) if ok(mid) else (lo, mid)
    return lo


def de_threshold_bsc(dv: int, dc: int, quant: QuantConfig,
                     beta: int = 0,
                     alpha: Optional[Tuple[int, int]] = None,
                     iters: int = 100, target: float = 1e-7,
                     tol: float = 1e-4,
                     bracket: Tuple[float, float] = (1e-3, 0.4)) -> float:
    """Largest BSC flip probability at which quantized min-sum DE converges."""
    lo, hi = bracket

    def ok(p):
        pe = de_pe_trajectory(chan_pmf_bsc(p, quant), dv, dc, beta,
                              alpha, quant.qmax, iters)
        return pe[-1] < target

    assert ok(lo), "bracket low end must converge"
    while hi - lo > tol:
        mid = (lo + hi) / 2
        lo, hi = (mid, hi) if ok(mid) else (lo, mid)
    return lo
