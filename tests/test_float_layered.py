"""Layered float decoders (round-2 VERDICT item 8): golden
decode_float(schedule='layered') and ops/decode_ref.make_layered_float_decoder
give layered fixed-point runs a same-schedule float quantization bound.

Equality strategy: min-sum-family CN updates are pure min/abs/sign/add — on
integer-valued inputs every intermediate stays an exact small integer (or
half-integer for OMS beta=0.5) in BOTH float64 (golden) and float32 (jnp), so
the contract is exact equality, mirroring the fixed-point tests. Sum-product
(tanh chain) is checked behaviorally instead.
"""
import numpy as np
import pytest

from ldpc_tpu.codes.ieee80211n import make_code
from ldpc_tpu.codes.toy import toy_qc
from ldpc_tpu.golden.decoder import decode_fixed, decode_float
from ldpc_tpu.golden.encoder import encode
from ldpc_tpu.ops.decode_ref import make_float_decoder


def _int_llrs(rng, B, n, lo=-40, hi=40):
    return rng.integers(lo, hi, size=(B, n)).astype(np.float32)


def _golden_float_batch(chan, code, **kw):
    hards, iters, convs = [], [], []
    for row in chan:
        r = decode_float(row.astype(np.float64), code, **kw)
        hards.append(r.hard)
        iters.append(r.iters)
        convs.append(r.converged)
    return np.stack(hards), np.array(iters), np.array(convs)


class TestGoldenLayeredFloat:
    def test_layered_float_minsum_equals_fixed_unclipped(self, rng):
        """Float layered min-sum on integer inputs with a non-binding clip
        IS integer layered min-sum: exact equality with decode_fixed at a
        huge qmax pins the layered schedule semantics (same pre-layer
        posterior reads, same syndrome cadence)."""
        code = toy_qc(4)
        for _ in range(12):
            chan = rng.integers(-30, 30, code.n).astype(np.int32)
            rf = decode_fixed(chan, code, max_iter=6, beta=0,
                              qmax=1 << 20, schedule="layered")
            rl = decode_float(chan.astype(np.float64), code, max_iter=6,
                              algorithm="min-sum", beta=0.0,
                              schedule="layered")
            np.testing.assert_array_equal(rl.hard, rf.hard)
            assert rl.iters == rf.iters
            assert rl.converged == rf.converged

    def test_layered_differs_from_flooding(self, rng):
        """Sanity: the layered schedule is actually exercised (iteration
        counts differ from flooding somewhere in the batch)."""
        code = toy_qc(4)
        diffs = 0
        for _ in range(20):
            chan = rng.normal(6, 10, code.n)
            rl = decode_float(chan, code, max_iter=20, algorithm="min-sum",
                              beta=0.0, schedule="layered")
            rf = decode_float(chan, code, max_iter=20, algorithm="min-sum",
                              beta=0.0, schedule="flooding")
            diffs += int(rl.iters != rf.iters)
        assert diffs > 0

    def test_layered_sum_product_converges_faster(self, rng):
        """Layered BP converges in <= the flooding iterations on average
        (the classic 2x factor) — behavioral check for the tanh path."""
        code = toy_qc(4)
        il, ifl = [], []
        for _ in range(40):
            info = rng.integers(0, 2, code.k).astype(np.uint8)
            cw = encode(code, info)
            y = (1 - 2.0 * cw) + 0.8 * rng.standard_normal(code.n)
            llr = 2 * y / 0.8**2
            rl = decode_float(llr, code, max_iter=30, schedule="layered")
            rf = decode_float(llr, code, max_iter=30, schedule="flooding")
            if rl.converged and rf.converged:
                il.append(rl.iters)
                ifl.append(rf.iters)
        assert len(il) > 10
        assert np.mean(il) <= np.mean(ifl)

    def test_bad_schedule_rejected(self):
        with pytest.raises(ValueError):
            decode_float(np.zeros(toy_qc(4).n), toy_qc(4),
                         schedule="zigzag")


class TestJnpLayeredFloat:
    @pytest.mark.parametrize("kw", [
        dict(algorithm="min-sum", beta=0.0, early_term=False, max_iter=5),
        dict(algorithm="min-sum", beta=0.0, early_term=True, max_iter=6),
        dict(algorithm="offset-min-sum", beta=0.5, early_term=True,
             max_iter=5),
        dict(algorithm="normalized-min-sum", beta=0.75, early_term=True,
             max_iter=5),
    ])
    def test_jnp_equals_golden_layered(self, rng, kw):
        code = toy_qc(4)
        B = 16
        chan = _int_llrs(rng, B, code.n)
        dec = make_float_decoder(code, schedule="layered", **kw)
        h, it, cv = map(np.asarray, dec(chan))
        gh, git, gcv = _golden_float_batch(chan, code, schedule="layered",
                                           **kw)
        np.testing.assert_array_equal(h, gh)
        np.testing.assert_array_equal(it, git)
        np.testing.assert_array_equal(cv, gcv)

    def test_jnp_layered_wifi(self, rng):
        code = make_code(648, "1/2")
        B = 4
        chan = _int_llrs(rng, B, code.n, -20, 20)
        dec = make_float_decoder(code, schedule="layered",
                                 algorithm="offset-min-sum", beta=0.5,
                                 early_term=True, max_iter=4)
        h, it, cv = map(np.asarray, dec(chan))
        gh, git, gcv = _golden_float_batch(
            chan, code, schedule="layered", algorithm="offset-min-sum",
            beta=0.5, early_term=True, max_iter=4)
        np.testing.assert_array_equal(h, gh)
        np.testing.assert_array_equal(it, git)
        np.testing.assert_array_equal(cv, gcv)


def test_pipeline_accepts_layered_float():
    """select_decoder no longer rejects layered float algorithms, and a
    layered float sweep batch runs end to end."""
    import dataclasses
    import jax
    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.sim import build_code
    from ldpc_tpu.sim.pipeline import make_run_batch, select_decoder
    cfg = PRESETS["wifi-648-r12-minsum"]
    cfg = dataclasses.replace(
        cfg,
        code=dataclasses.replace(cfg.code, family="toy", Z=4),
        decoder=dataclasses.replace(cfg.decoder,
                                    algorithm="offset-min-sum-float",
                                    schedule="layered", max_iter=5))
    code = build_code(cfg)
    _, label = select_decoder(code, cfg)
    assert label == "jnp-float"
    rb = make_run_batch(code, cfg, batch=64)
    out = np.asarray(rb(jax.random.PRNGKey(0), np.float32(0.8)))
    assert out[0] == 64 and out.shape == (5,)
