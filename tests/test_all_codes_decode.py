"""Decode smoke across the full 802.11n set: every one of the 12 codes must
correct most frames at a rate-appropriate operating point (guards the shift
tables end-to-end, beyond the structural invariants in test_codes.py)."""
import dataclasses

import pytest

from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,
                             QuantConfig, RunConfig, SimConfig)
from ldpc_tpu.sim import Sweep

# comfortable operating points (~0.5+ dB above threshold)
EBN0 = {"1/2": 3.0, "2/3": 3.5, "3/4": 4.0, "5/6": 4.5}


@pytest.mark.parametrize("n", [648, 1296, 1944])
@pytest.mark.parametrize("rate", ["1/2", "2/3", "3/4", "5/6"])
def test_wifi_code_decodes(n, rate):
    cfg = SimConfig(
        code=CodeConfig(family="ieee80211n", n=n, rate=rate),
        channel=ChannelConfig(modulation="bpsk"),
        quant=QuantConfig(bits=8, scale=4.0, beta_lsb=2),
        decoder=DecoderConfig(algorithm="offset-min-sum", schedule="layered",
                              max_iter=15, early_term=True),
        run=RunConfig(batch=64, seed=2))
    res = Sweep(cfg, decoder_backend="jnp").run(
        [EBN0[rate]], target_frame_errors=10 ** 9, max_frames=64)
    pt = res.points[0]
    assert pt.frames == 64
    assert pt.frame_errs <= 8, (n, rate, pt.frame_errs)
