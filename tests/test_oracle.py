"""Native C oracle: bit-exact vs the NumPy golden model, then used to
cross-check the jnp decoder at Monte-Carlo scale (SURVEY.md §3.4)."""
import numpy as np
import pytest

from ldpc_tpu.codes.ieee80211n import make_code
from ldpc_tpu.codes.toy import hamming74, toy_qc
from ldpc_tpu.golden.decoder import decode_fixed
from ldpc_tpu import oracle


def _llrs(rng, B, n):
    x = rng.normal(0, 40, size=(B, n))
    x[: B // 2] = rng.normal(30, 25, size=(B // 2, n))
    return np.clip(np.round(x), -127, 127).astype(np.int8)


@pytest.mark.parametrize("code_fn", [toy_qc, hamming74,
                                     lambda: make_code(648, "1/2")])
@pytest.mark.parametrize("kw", [
    dict(schedule="flooding", beta=0, early_term=False, max_iter=6),
    dict(schedule="flooding", beta=2, early_term=True, max_iter=8),
    dict(schedule="layered", beta=0, early_term=True, max_iter=6),
    dict(schedule="layered", beta=2, early_term=False, max_iter=5),
])
def test_oracle_matches_golden(code_fn, kw, rng):
    code = code_fn()
    B = 16
    chan = _llrs(rng, B, code.n)
    hard, iters, conv = oracle.decode_batch(chan, code, qmax=127, **kw)
    for b in range(B):
        g = decode_fixed(chan[b].astype(np.int32), code, qmax=127, **kw)
        np.testing.assert_array_equal(hard[b], g.hard)
        assert iters[b] == g.iters
        assert conv[b] == g.converged


def test_oracle_matches_jnp_at_scale(rng):
    """The oracle's speed lets the jnp decoder be cross-checked on a much
    larger batch than the per-codeword golden model allows."""
    from ldpc_tpu.ops.decode_ref import make_flooding_decoder
    code = make_code(648, "1/2")
    B = 256
    chan = _llrs(rng, B, code.n)
    dec = make_flooding_decoder(code, max_iter=10, beta=2, qmax=127,
                                early_term=True)
    h_j, it_j, cv_j = map(np.asarray, dec(chan))
    h_c, it_c, cv_c = oracle.decode_batch(chan, code, max_iter=10, beta=2,
                                          qmax=127, schedule="flooding",
                                          early_term=True)
    np.testing.assert_array_equal(h_j, h_c)
    np.testing.assert_array_equal(it_j, it_c)
    np.testing.assert_array_equal(cv_j, cv_c)


@pytest.mark.parametrize("algorithm", ["gallager-b", "gallager-a",
                                       "bit-flip"])
def test_hard_oracle_matches_golden(algorithm, rng):
    """Round-3: the native C oracle covers the HARD-DECISION family too —
    exact equality (hard bits, per-codeword iters, convergence) vs
    golden.decode_hard on BSC-noised codewords, default and explicit
    thresholds."""
    from ldpc_tpu import oracle
    from ldpc_tpu.codes.toy import array_qc
    from ldpc_tpu.golden.decoder import decode_hard
    code = array_qc(3, 6, 17)
    bits = (rng.random((32, code.n)) < 0.035).astype(np.uint8)
    for thr in (None, 2):
        h, it, cv = oracle.decode_hard_batch(bits, code, max_iter=12,
                                             algorithm=algorithm,
                                             threshold=thr)
        assert 0 < cv.mean() < 1 or thr == 2  # exercise mixed convergence
        for b in range(bits.shape[0]):
            r = decode_hard(bits[b], code, max_iter=12,
                            algorithm=algorithm, threshold=thr)
            np.testing.assert_array_equal(h[b], r.hard)
            assert it[b] == r.iters and cv[b] == bool(r.converged)
