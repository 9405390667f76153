"""PEXIT (protograph EXIT) analysis — analysis/exit.py.

The load-bearing anchors: the (3,6)-regular AWGN BP threshold is the
best-pinned number in the LDPC literature (sigma* = 0.8809, Eb/N0* =
1.11 dB), and PEXIT under the Gaussian approximation is known to land
within ~0.01 of it; the 802.11n ensemble threshold must sit between the
Shannon limit and the measured finite-length waterfall (same bracketing
contract as the quantized-DE tests in test_de.py)."""
import math

import numpy as np
import pytest

from ldpc_tpu.analysis import exit as px


class TestJFunction:
    def test_endpoints_and_monotone(self):
        s = np.linspace(0.0, 12.0, 200)
        I = px.J(s)
        assert I[0] == 0.0
        assert I[-1] > 1.0 - 1e-8
        assert px.J(np.array([40.0]))[0] > 1.0 - 1e-12
        assert np.all(np.diff(I) >= 0)

    def test_inverse_roundtrip(self):
        s = np.array([0.05, 0.3, 1.0, 2.5, 6.0, 15.0])
        err = np.abs(px.J_inv(px.J(s)) - s)
        assert err.max() < 1e-3

    def test_known_values(self):
        """J(sigma) spot values, independently verified by brute-force
        numeric integration of 1 - E[log2(1+e^-L)], L ~ N(s^2/2, s^2)
        (4M-point trapezoid at build time, agreement to 1e-12)."""
        v = px.J(np.array([1.0, 2.0, 3.0]))
        np.testing.assert_allclose(v, [0.160747, 0.485944, 0.759979],
                                   atol=1e-5)


class TestThresholds:
    def test_regular_36_threshold(self):
        """(3,6)-regular: DE-exact sigma* = 0.8809; PEXIT/GA is famously
        accurate here (measured 0.8808 at build time)."""
        B = np.zeros((3, 6), int)
        sig = px.pexit_threshold_sigma(B, iters=2000, tol=5e-4,
                                       bracket=(0.5, 1.2))
        assert 0.86 < sig < 0.90

    def test_wifi648_bracketed_by_shannon_and_waterfall(self):
        """802.11n n=648 r=1/2 protograph: threshold above the r=1/2 BPSK
        Shannon limit (0.188 dB) and below the measured 8-bit OMS waterfall
        (~2.0 dB, results/cn_variants_oms_b1.json)."""
        from ldpc_tpu.codes.ieee80211n import make_code
        code = make_code(648, "1/2")
        sigma, ebn0 = px.pexit_threshold_awgn(code, iters=1000, tol=1e-3)
        assert 0.188 < ebn0 < 2.0

    def test_puncturing_raises_threshold(self):
        """Puncturing a transmitted column always costs threshold (the
        rate-matching model must hurt, directionally like proto-DE)."""
        B = np.zeros((3, 6), int)
        s_full = px.pexit_threshold_sigma(B, iters=1500, tol=1e-3,
                                          bracket=(0.4, 1.2))
        s_punct = px.pexit_threshold_sigma(B, punct_cols=[0], iters=1500,
                                           tol=1e-3, bracket=(0.4, 1.2))
        assert s_punct < s_full - 2e-3

    def test_shortened_column_helps(self):
        """A known (shortened) column only adds information: threshold
        cannot get worse."""
        B = np.zeros((3, 6), int)
        s_full = px.pexit_threshold_sigma(B, iters=1500, tol=1e-3,
                                          bracket=(0.4, 1.4))
        s_short = px.pexit_threshold_sigma(
            B, short_cols=[5], decision_cols=[0, 1, 2, 3, 4], iters=1500,
            tol=1e-3, bracket=(0.4, 1.4))
        assert s_short > s_full - 1e-3


class TestExitChart:
    @staticmethod
    def _tunnel_open(dv, dc, sigma_n):
        """Iterate the scalar two-curve recursion; open tunnel -> I -> 1."""
        Ia, I_ev, I_ec_of = px.exit_curves_regular(dv, dc, sigma_n)
        x = 0.0
        for _ in range(3000):
            ev = np.interp(x, Ia, I_ev)
            x_new = float(np.interp(ev, Ia, I_ec_of))
            if x_new <= x + 1e-12:
                break
            x = x_new
        return x > 0.999

    def test_tunnel_open_below_threshold(self):
        assert self._tunnel_open(3, 6, 0.80)

    def test_tunnel_closed_above_threshold(self):
        assert not self._tunnel_open(3, 6, 0.95)


class TestAgreementWithProtoDE:
    @pytest.mark.slow
    def test_dvbs2_direction(self):
        """DVB-S2 n=16200 r=1/2: PEXIT (float sum-product ensemble) must be
        OPTIMISTIC relative to the measured quantized waterfall but in the
        same regime as the exact proto-DE threshold (0.908 dB for n=64800;
        the float GA threshold lands within a few tenths of a dB)."""
        from ldpc_tpu.codes.dvbs2 import make_code
        code = make_code(n=16200, rate="1/2")
        sigma, ebn0 = px.pexit_threshold_awgn(code, iters=1500, tol=1e-3)
        assert 0.1 < ebn0 < 1.6
