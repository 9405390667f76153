"""Modulation, AWGN channel, and LLR demapping as jittable XLA ops.

Covers the reference's channel layer (BASELINE.json:5 'AWGN channel + BPSK/QAM
LLR computation', :11 'QAM mod + AWGN + LLR demap'): BPSK and Gray-mapped
square QAM (QPSK/16/64), unit average symbol energy, max-log per-bit LLRs
computed per axis (exact for Gray-labeled square QAM).

Conventions (shared with the golden model):
  * bit 0 -> +amplitude on its axis; LLR > 0 means bit 0.
  * BPSK over the real AWGN channel: sigma**2 = 1/(2 R EbN0_lin),
    LLR = 2 y / sigma**2.
  * QAM over the complex channel (I/Q as two reals): per-dimension noise
    variance sigma**2 = N0/2 with N0 = 1/(R m EbN0_lin), m bits/symbol, Es = 1.
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

MODULATIONS = ("bpsk", "qpsk", "16qam", "64qam")

BITS_PER_SYM = {"bpsk": 1, "qpsk": 2, "16qam": 4, "64qam": 6}


def _gray_levels(bits_per_axis: int) -> Tuple[np.ndarray, np.ndarray]:
    """PAM levels and their Gray bit labels for one axis.

    Returns (levels[L] float64 unnormalized odd integers ..-3,-1,1,3..,
             labels[L, bits_per_axis] uint8) where labels follow the standard
    reflected-Gray mapping with MSB first (bit 0 selects the sign half).
    """
    L = 1 << bits_per_axis
    levels = np.arange(-(L - 1), L, 2, dtype=np.float64)
    idx = np.arange(L)
    gray = idx ^ (idx >> 1)
    # level i (ascending) carries gray code of i, but with MSB inverted so that
    # bit pattern 0.. maps to the positive side (bit 0 -> +): flip order.
    labels = np.zeros((L, bits_per_axis), np.uint8)
    for i in range(L):
        g = gray[L - 1 - i]  # descending gray index on ascending levels
        for b in range(bits_per_axis):
            labels[i, b] = (g >> (bits_per_axis - 1 - b)) & 1
    return levels, labels


def _axis_norm(bits_per_axis: int) -> float:
    L = 1 << bits_per_axis
    levels = np.arange(-(L - 1), L, 2, dtype=np.float64)
    mean_sq = float(np.mean(levels**2))
    return 1.0 / math.sqrt(2.0 * mean_sq)  # two axes share Es = 1


def sigma_for(ebn0_db: float, rate: float, modulation: str) -> float:
    """Per-real-dimension noise standard deviation for Es = 1."""
    ebn0 = 10.0 ** (ebn0_db / 10.0)
    m = BITS_PER_SYM[modulation]
    if modulation == "bpsk":
        return math.sqrt(1.0 / (2.0 * rate * ebn0))
    n0 = 1.0 / (rate * m * ebn0)
    return math.sqrt(n0 / 2.0)


def modulate(bits: jnp.ndarray, modulation: str) -> jnp.ndarray:
    """bits (..., n) in {0,1} -> symbols.

    BPSK: (..., n) real. QAM: (..., n/m, 2) with I/Q as the trailing axis.
    """
    if modulation == "bpsk":
        return (1 - 2 * bits.astype(jnp.int32)).astype(jnp.float32)
    m = BITS_PER_SYM[modulation]
    ba = m // 2
    levels, labels = _gray_levels(ba)
    norm = _axis_norm(ba)
    # label -> level lookup table indexed by the integer formed by the bits
    lut = np.zeros(1 << ba, np.float32)
    for i in range(len(levels)):
        key = 0
        for b in range(ba):
            key = (key << 1) | int(labels[i, b])
        lut[key] = levels[i] * norm
    lut_j = jnp.asarray(lut)
    g = bits.reshape(bits.shape[:-1] + (-1, 2, ba))  # (..., nsym, axis, ba)
    weights = jnp.asarray([1 << (ba - 1 - b) for b in range(ba)], jnp.int32)
    keys = jnp.sum(g.astype(jnp.int32) * weights, axis=-1)
    return lut_j[keys]  # (..., nsym, 2)


def _bcast_sigma(sigma, x: jnp.ndarray):
    """Scalar sigma, or per-codeword sigma (B,) broadcast over x (B, ...) —
    the fused-SNR-sweep path (SURVEY.md §2.3 'sweep parallelism')."""
    sigma = jnp.asarray(sigma, x.dtype)
    if sigma.ndim == 0:
        return sigma
    return sigma.reshape((-1,) + (1,) * (x.ndim - 1))


def awgn(key: jax.Array, x: jnp.ndarray, sigma) -> jnp.ndarray:
    return x + _bcast_sigma(sigma, x) * jax.random.normal(key, x.shape, x.dtype)


def demap(y: jnp.ndarray, sigma, modulation: str) -> jnp.ndarray:
    """Received symbols -> per-bit float LLRs (..., n). Max-log for QAM.
    sigma: scalar or per-codeword (B,)."""
    if modulation == "bpsk":
        sb = _bcast_sigma(sigma, y)
        return 2.0 * y / (sb * sb)
    m = BITS_PER_SYM[modulation]
    ba = m // 2
    levels, labels = _gray_levels(ba)
    norm = _axis_norm(ba)
    lev = jnp.asarray(levels * norm, jnp.float32)  # (L,)
    lab = np.asarray(labels, bool)  # (L, ba)
    sb = _bcast_sigma(sigma, y)
    n0 = 2.0 * sb * sb
    # y: (..., nsym, 2); per-axis distances to each level
    d2 = (y[..., None] - lev) ** 2  # (..., nsym, 2, L)
    big = jnp.float32(1e30)
    llrs = []
    for b in range(ba):
        m0 = jnp.min(jnp.where(jnp.asarray(~lab[:, b]), d2, big), axis=-1)
        m1 = jnp.min(jnp.where(jnp.asarray(lab[:, b]), d2, big), axis=-1)
        llrs.append((m1 - m0) / n0)  # (..., nsym, 2)
    # Interleave back to bit order: per symbol the bits are
    # [I_b0..I_b(ba-1), Q_b0..Q_b(ba-1)]? No — modulate consumed
    # (..., nsym, axis, ba), i.e. I-bits first then Q-bits.
    stack = jnp.stack(llrs, axis=-1)  # (..., nsym, 2, ba)
    return stack.reshape(y.shape[:-2] + (-1,))


def llrs_bpsk_exact(y: jnp.ndarray, sigma: float) -> jnp.ndarray:
    return demap(y, sigma, "bpsk")


def bsc(key: jax.Array, bits: jnp.ndarray, p) -> jnp.ndarray:
    """Binary symmetric channel: flip each bit independently with probability
    p. The SURVEY.md §5.3 stress-test fault injector (`bitflip_channel`) —
    hard bit-flip faults rather than soft AWGN noise."""
    flips = jax.random.bernoulli(key, p, bits.shape)
    return jnp.bitwise_xor(bits.astype(jnp.uint8), flips.astype(jnp.uint8))


def bsc_llr(bits: jnp.ndarray, p) -> jnp.ndarray:
    """Channel LLRs for hard BSC observations: LLR = (1 - 2y) * log((1-p)/p)
    (> 0 favors bit 0, matching the demap sign convention)."""
    p = jnp.asarray(p, jnp.float32)
    mag = jnp.log((1.0 - p) / p)
    return (1 - 2 * bits.astype(jnp.float32)) * mag
