"""Hard-decision decoders (Gallager-A/B, parallel bit-flipping).

Contract: the batched jnp ops (ops/decode_hard.py) match the golden scalars
(golden/decoder.py `decode_hard`) EXACTLY — hard bits, iteration counts, and
convergence flags — on identical hard channel inputs (SURVEY.md §4.2
bit-exactness pattern, extended to the §5.3 fault-injection decoders).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes.ieee80211n import make_code
from ldpc_tpu.codes.toy import array_qc, hamming74, toy_qc
from ldpc_tpu.golden import decode_hard, encode
from ldpc_tpu.ops.decode_hard import make_hard_decoder

ALGOS = ["gallager-b", "gallager-a", "bit-flip"]


def _random_received(code, rng, B, p):
    """Random codewords through a BSC(p): (clean, received) uint8 (B, n)."""
    clean = np.stack([
        encode(code, rng.integers(0, 2, code.k).astype(np.uint8))
        for _ in range(B)
    ])
    flips = (rng.random(clean.shape) < p).astype(np.uint8)
    return clean, np.bitwise_xor(clean, flips)


class TestBitExactVsGolden:
    @pytest.mark.parametrize("algorithm", ALGOS)
    @pytest.mark.parametrize("codemk", [hamming74, lambda: toy_qc(4)])
    def test_toy_codes(self, algorithm, codemk, rng):
        code = codemk()
        B = 64
        _, y = _random_received(code, rng, B, p=0.12)
        dec = jax.jit(make_hard_decoder(code, max_iter=12,
                                        algorithm=algorithm))
        hard, iters, conv = map(np.asarray, dec(jnp.asarray(y)))
        for b in range(B):
            g = decode_hard(y[b], code, max_iter=12, algorithm=algorithm)
            np.testing.assert_array_equal(hard[b], g.hard)
            assert int(iters[b]) == g.iters
            assert bool(conv[b]) == g.converged

    @pytest.mark.parametrize("algorithm", ALGOS)
    def test_wifi648(self, algorithm, rng):
        code = make_code(648, "1/2")
        B = 12
        _, y = _random_received(code, rng, B, p=0.03)
        dec = jax.jit(make_hard_decoder(code, max_iter=20,
                                        algorithm=algorithm))
        hard, iters, conv = map(np.asarray, dec(jnp.asarray(y)))
        for b in range(B):
            g = decode_hard(y[b], code, max_iter=20, algorithm=algorithm)
            np.testing.assert_array_equal(hard[b], g.hard)
            assert int(iters[b]) == g.iters
            assert bool(conv[b]) == g.converged

    def test_explicit_threshold(self, rng):
        code = toy_qc(4)
        _, y = _random_received(code, rng, 32, p=0.1)
        dec = jax.jit(make_hard_decoder(code, max_iter=10,
                                        algorithm="gallager-b", threshold=2))
        hard, iters, conv = map(np.asarray, dec(jnp.asarray(y)))
        for b in range(8):
            g = decode_hard(y[b], code, max_iter=10, algorithm="gallager-b",
                            threshold=2)
            np.testing.assert_array_equal(hard[b], g.hard)
            assert int(iters[b]) == g.iters

    @pytest.mark.parametrize("algorithm", ALGOS)
    def test_no_early_term_matches(self, algorithm, rng):
        code = toy_qc(4)
        _, y = _random_received(code, rng, 16, p=0.1)
        dec = jax.jit(make_hard_decoder(code, max_iter=6,
                                        algorithm=algorithm,
                                        early_term=False))
        hard, iters, conv = map(np.asarray, dec(jnp.asarray(y)))
        for b in range(16):
            g = decode_hard(y[b], code, max_iter=6, algorithm=algorithm,
                            early_term=False)
            np.testing.assert_array_equal(hard[b], g.hard)
            assert int(iters[b]) == g.iters == 6
            assert bool(conv[b]) == g.converged


class TestBehavior:
    @pytest.mark.parametrize("algorithm", ALGOS)
    def test_noiseless_zero_iterations(self, algorithm, rng):
        code = make_code(648, "1/2")
        clean, _ = _random_received(code, rng, 4, p=0.0)
        dec = jax.jit(make_hard_decoder(code, algorithm=algorithm))
        hard, iters, conv = map(np.asarray, dec(jnp.asarray(clean)))
        np.testing.assert_array_equal(hard, clean)
        assert (iters == 0).all() and conv.all()

    def test_bit_flip_corrects_sparse_flips_wifi(self, rng):
        """At low flip probability parallel BF removes most channel errors
        (Gallager-A/B are NOT asserted here: 46% of wifi648's variables have
        degree 2 — the dual-diagonal parity chain — and hard-decision message
        passing is known to propagate errors through degree-2 chains; see the
        regular-code tests below for the regime Gallager analysis covers)."""
        code = make_code(648, "1/2")
        B = 64
        clean, y = _random_received(code, rng, B, p=0.008)
        dec = jax.jit(make_hard_decoder(code, max_iter=30,
                                        algorithm="bit-flip"))
        hard, _, conv = map(np.asarray, dec(jnp.asarray(y)))
        errs_in = int((y != clean).sum())
        errs_out = int((hard != clean).sum())
        assert errs_in > 0
        assert errs_out < errs_in / 4, (errs_in, errs_out)

    def test_gallager_corrects_on_regular_code(self, rng):
        """(3,6)-regular array code, all-zeros codeword: Gallager-B reduces
        the error count and converges on >=90% of frames at p=0.01."""
        code = array_qc()
        B = 256
        y = (rng.random((B, code.n)) < 0.01).astype(np.uint8)
        dec = jax.jit(make_hard_decoder(code, max_iter=30,
                                        algorithm="gallager-b"))
        hard, _, conv = map(np.asarray, dec(jnp.asarray(y)))
        errs_in, errs_out = int(y.sum()), int(hard.sum())
        assert errs_in > 0
        assert errs_out < errs_in, (errs_in, errs_out)
        assert conv.mean() >= 0.90

    def test_converged_implies_syndrome(self, rng):
        code = toy_qc(4)
        _, y = _random_received(code, rng, 64, p=0.1)
        dec = jax.jit(make_hard_decoder(code, algorithm="gallager-b"))
        hard, _, conv = map(np.asarray, dec(jnp.asarray(y)))
        for b in np.nonzero(conv)[0]:
            for vs in code.cn_adj:
                assert np.bitwise_xor.reduce(hard[b][vs]) == 0

    def test_gallager_b_beats_bit_flip_on_regular_code(self, rng):
        """Message passing outperforms posterior-level flipping where its
        analysis applies (regular code, same iteration budget)."""
        code = array_qc()
        B = 256
        y = (rng.random((B, code.n)) < 0.02).astype(np.uint8)
        conv = {}
        for alg in ("gallager-b", "bit-flip"):
            dec = jax.jit(make_hard_decoder(code, max_iter=30,
                                            algorithm=alg))
            _, _, c = map(np.asarray, dec(jnp.asarray(y)))
            conv[alg] = int(c.sum())
        assert conv["gallager-b"] > conv["bit-flip"]

    def test_bad_algorithm_rejected(self):
        with pytest.raises(ValueError):
            make_hard_decoder(toy_qc(4), algorithm="nope")
        with pytest.raises(ValueError):
            decode_hard(np.zeros(24, np.int32), toy_qc(4), algorithm="nope")
