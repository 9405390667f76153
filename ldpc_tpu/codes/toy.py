"""Tiny code fixtures for bit-exact decoder testing (SURVEY.md §4.2).

These play the role of the reference's implicit smoke tests (all-zeros codeword
+ known seed): small enough to eyeball per-iteration message dumps, yet shaped
like the real codes (the toy QC code has dual-diagonal parity like 802.11n).
"""
from __future__ import annotations

import numpy as np

from .code import LDPCCode, expand_qc


def hamming74() -> LDPCCode:
    """(7,4) Hamming code viewed as an LDPC code."""
    H = np.array(
        [
            [1, 1, 0, 1, 1, 0, 0],
            [1, 0, 1, 1, 0, 1, 0],
            [0, 1, 1, 1, 0, 0, 1],
        ],
        np.uint8,
    )
    cn_adj = [np.nonzero(r)[0].astype(np.int32) for r in H]
    return LDPCCode(name="hamming74", n=7, m=3, k=4, cn_adj=cn_adj)


def toy_qc(Z: int = 4) -> LDPCCode:
    """A 3x6 base-matrix QC code (rate 1/2, n = 6Z) with an 802.11n-style
    parity structure: weight-3 first parity column with equal top/bottom
    shifts, then a dual-diagonal staircase of zero-shift identities."""
    base = np.array(
        [
            [0, 1, -1, 1, 0, -1],
            [2, -1, 3, 0, 0, 0],
            [-1, 3, 1, 1, -1, 0],
        ],
        np.int64,
    )
    base = np.where(base >= 0, base % Z, -1)
    return expand_qc(base, Z, name=f"toy_qc_z{Z}")
