"""Asymptotic analysis tools (density evolution) — the offline-analysis
layer of the framework (SURVEY.md §1.2 'MATLAB analysis' row: the reference
kept its analysis in MATLAB next to the C simulator; here it is NumPy next
to the JAX simulator)."""
from .exit import (  # noqa: F401
    J, J_inv, exit_curves_regular, pexit_threshold_awgn,
    pexit_threshold_sigma, pexit_trajectory, sigma_ch_columns,
    sigma_ch_for)
from .proto_de import (  # noqa: F401
    column_channel_pmfs, proto_de_threshold_awgn, proto_de_trajectory)
from .trapping import (  # noqa: F401
    classify, dominant_sets, is_absorbing, odd_checks, refine_support,
    search_trapping_sets)
from .de import (  # noqa: F401
    DegreeSpectra, chan_pmf_awgn, chan_pmf_bsc, de_pe_trajectory,
    de_pe_trajectory_spectra, de_threshold_awgn, de_threshold_awgn_spectra,
    de_threshold_bsc, de_threshold_bsc_spectra,
    decision_weights_min_degree, gallager_threshold,
    gallager_threshold_spectra, gallager_trajectory,
    gallager_trajectory_spectra, regular_spectra, spectra_from_code)
