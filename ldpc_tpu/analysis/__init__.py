"""Asymptotic analysis tools (density evolution) — the offline-analysis
layer of the framework (SURVEY.md §1.2 'MATLAB analysis' row: the reference
kept its analysis in MATLAB next to the C simulator; here it is NumPy next
to the JAX simulator)."""
from .de import (  # noqa: F401
    chan_pmf_awgn, chan_pmf_bsc, de_pe_trajectory, de_threshold_awgn,
    de_threshold_bsc, gallager_threshold, gallager_trajectory)
