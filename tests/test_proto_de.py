"""Protograph (multi-edge-type) DE — analysis/proto_de.py.

The collapse contract is the load-bearing test: on a fully symmetric
protograph with a uniform channel, every edge type's density is equal by
symmetry and the recursion must reproduce the (dv, dc)-regular single-
edge-type DE EXACTLY (same pinned integer semantics underneath)."""
import numpy as np
import pytest

from ldpc_tpu.analysis import de
from ldpc_tpu.analysis.proto_de import (column_channel_pmfs,
                                        proto_de_threshold_awgn,
                                        proto_de_trajectory)
from ldpc_tpu.config import QuantConfig

Q8 = QuantConfig(bits=8, scale=4.0, beta_lsb=1)


def test_regular_collapse_exact():
    base = np.zeros((3, 6), np.int64)  # (3,6)-regular protograph
    chan = de.chan_pmf_awgn(0.8, Q8)
    t_proto = proto_de_trajectory(base, np.tile(chan, (6, 1)), beta=1,
                                  qmax=Q8.qmax, iters=10)
    t_reg = de.de_pe_trajectory(chan, 3, 6, beta=1, qmax=Q8.qmax, iters=10)
    np.testing.assert_allclose(t_proto, t_reg[:len(t_proto)], rtol=0,
                               atol=1e-14)


def test_punctured_column_slows_convergence():
    """Zeroing one column's channel (the rate-matching model) must hurt:
    same base, punctured variant converges strictly slower."""
    base = np.zeros((3, 6), np.int64)
    chan = de.chan_pmf_awgn(0.75, Q8)
    pm = np.tile(chan, (6, 1))
    pm_punct = pm.copy()
    pm_punct[0] = 0.0
    pm_punct[0, Q8.qmax] = 1.0  # LLR 0
    t_full = proto_de_trajectory(base, pm, beta=1, qmax=Q8.qmax, iters=30)
    t_punc = proto_de_trajectory(base, pm_punct, beta=1, qmax=Q8.qmax,
                                 iters=30)
    n = min(len(t_full), len(t_punc))
    assert t_punc[n - 1] > t_full[n - 1]


def test_shortened_column_is_known():
    """A shortened (saturated +qmax) column contributes zero decision
    error and STRONG messages — convergence at least as fast as the
    un-shortened base."""
    base = np.zeros((3, 6), np.int64)
    chan = de.chan_pmf_awgn(0.8, Q8)
    pm = np.tile(chan, (6, 1))
    pm_short = pm.copy()
    pm_short[0] = 0.0
    pm_short[0, 2 * Q8.qmax] = 1.0  # +qmax spike
    t_full = proto_de_trajectory(base, pm, beta=1, qmax=Q8.qmax, iters=20,
                                 decision_cols=[1, 2, 3, 4, 5])
    t_short = proto_de_trajectory(base, pm_short, beta=1, qmax=Q8.qmax,
                                  iters=20, decision_cols=[1, 2, 3, 4, 5])
    n = min(len(t_full), len(t_short))
    assert t_short[n - 1] <= t_full[n - 1] + 1e-15


def test_column_channel_pmfs_rate_matching():
    from ldpc_tpu.codes.nr_bg import make_code
    code = make_code(base_graph=2, Z=16)
    pm = column_channel_pmfs(code, 0.8, Q8)
    Q = Q8.qmax
    punct_blocks = sorted({int(v) // 16 for v in code.punct_vns})
    assert punct_blocks == [0, 1]  # first 2Z systematic bits
    for j in punct_blocks:
        assert pm[j, Q] == 1.0  # delta at LLR 0
    assert abs(pm.sum(axis=1) - 1).max() < 1e-12


@pytest.mark.slow
def test_dvbs2_structure_gain_direction():
    """The headline claim: the structured IRA protograph threshold beats
    the single-edge lambda/rho ensemble threshold on DVB-S2 (whose
    measured waterfall sits ~0.2 dB below the single-edge number)."""
    from ldpc_tpu.codes.dvbs2 import make_code
    q2 = QuantConfig(bits=8, scale=4.0, beta_lsb=2)
    code = make_code(16200, "1/2")  # short frame: faster, same structure
    sp = de.spectra_from_code(code)
    s_single = de.de_threshold_awgn_spectra(sp, q2, beta=2, iters=60,
                                            tol=1e-2, bracket=(0.6, 1.3),
                                            target=1e-5)
    s_proto = proto_de_threshold_awgn(code, q2, beta=2, iters=60,
                                      tol=1e-2, bracket=(0.6, 1.3),
                                      target=1e-5)
    assert s_proto > s_single  # larger tolerable sigma = better threshold
