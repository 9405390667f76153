"""BER integration tests (SURVEY.md §4.2 'Integration: BER').

The fixed-vs-float 'quantization bound' methodology is the reference's own
correctness argument (BASELINE.json:5 'within its fixed-point quantization
bound'): the 8-bit offset-min-sum decoder must track the float decoder's
error rates within Monte-Carlo uncertainty at the canonical operating point.
Deterministic by seed."""
import dataclasses

import pytest

from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,
                             QuantConfig, RunConfig, SimConfig)
from ldpc_tpu.sim import Sweep
from ldpc_tpu.sim.stats import rates_compatible

BASE = SimConfig(
    code=CodeConfig(family="ieee80211n", n=648, rate="1/2"),
    channel=ChannelConfig(modulation="bpsk"),
    quant=QuantConfig(bits=8, scale=4.0, beta_lsb=2),
    decoder=DecoderConfig(algorithm="offset-min-sum", schedule="flooding",
                          max_iter=20, early_term=True),
    run=RunConfig(batch=512, seed=7))


def _point(alg, ebn0=2.0, frames=1536):
    cfg = dataclasses.replace(
        BASE, decoder=dataclasses.replace(BASE.decoder, algorithm=alg))
    res = Sweep(cfg, decoder_backend="jnp").run(
        [ebn0], target_frame_errors=10 ** 9, max_frames=frames)
    return res.points[0]


def test_quantization_bound_oms():
    """8-bit fixed OMS vs float OMS at 2.0 dB: overlapping 99% intervals for
    both BER and FER (the float-vs-fixed gap is within Monte-Carlo error at
    this operating point; SURVEY.md §6 sanity anchor)."""
    fx = _point("offset-min-sum")
    fl = _point("offset-min-sum-float")
    k = BASE.code.n // 2
    assert fx.frames == fl.frames > 0
    assert rates_compatible(fx.bit_errs, fx.frames * k,
                            fl.bit_errs, fl.frames * k)
    assert rates_compatible(fx.frame_errs, fx.frames,
                            fl.frame_errs, fl.frames)
    # sanity: the operating point is in the waterfall, not error-free/noise
    assert 0 < fx.frame_errs < fx.frames


def test_waterfall_slope():
    """BER falls by >= 10x from 1.0 dB to 2.5 dB (waterfall region)."""
    lo = _point("offset-min-sum", ebn0=1.0, frames=512)
    hi = _point("offset-min-sum", ebn0=2.5, frames=2048)
    k = BASE.code.n // 2
    ber_lo = lo.bit_errs / (lo.frames * k)
    ber_hi = hi.bit_errs / (hi.frames * k)
    assert ber_lo > 10 * max(ber_hi, 1e-9)
