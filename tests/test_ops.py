"""Stage-3 tests: XLA ops vs golden model (SURVEY.md §4.2 'bit-exact equality'
contract for the decoder; property tests for encoder/channel/quantizer)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ldpc_tpu.codes import ieee80211n as wifi
from ldpc_tpu.codes.toy import hamming74, toy_qc
from ldpc_tpu.config import DecoderConfig, QuantConfig
from ldpc_tpu.golden import decode_fixed, encode as g_encode, quantize as g_quantize
from ldpc_tpu.ops import channel as ch
from ldpc_tpu.ops.decode_ref import make_flooding_decoder, make_layered_decoder
from ldpc_tpu.ops.encode import make_encoder
from ldpc_tpu.ops.quantize import quantize


class TestQuantizeOp:
    def test_matches_golden(self, rng):
        x = rng.standard_normal(100_000).astype(np.float32) * 8
        q_jnp = np.asarray(quantize(jnp.asarray(x)))
        q_gold = g_quantize(x, scale=4.0).astype(np.int8)
        assert np.array_equal(q_jnp, q_gold)

    def test_saturates(self):
        q = np.asarray(quantize(jnp.asarray([1e6, -1e6], jnp.float32)))
        assert q.tolist() == [127, -127]


class TestEncodeOp:
    @pytest.mark.parametrize("make", [lambda: toy_qc(4),
                                      lambda: wifi.make_code(648, "1/2"),
                                      lambda: wifi.make_code(1944, "5/6")])
    def test_matches_golden_and_property(self, make, rng):
        code = make()
        enc = jax.jit(make_encoder(code))
        info = rng.integers(0, 2, size=(32, code.k)).astype(np.uint8)
        cw = np.asarray(enc(jnp.asarray(info)))
        assert np.array_equal(cw, g_encode(code, info))
        H = code.h_dense()
        assert np.all((cw @ H.T) % 2 == 0)


def _bpsk_chan(cw, sigma, rng):
    y = (1.0 - 2.0 * cw) + sigma * rng.standard_normal(cw.shape)
    return 2.0 * y / sigma**2


CASES = [
    ("toy4", lambda: toy_qc(4), 0.75),
    ("toy8", lambda: toy_qc(8), 0.8),
    ("hamming", hamming74, 0.9),
]


class TestDecodeRefBitExact:
    @pytest.mark.parametrize("name,make,sigma", CASES)
    @pytest.mark.parametrize("schedule", ["flooding", "layered"])
    @pytest.mark.parametrize("beta,early", [(0, False), (0, True), (2, True)])
    def test_bit_exact_vs_golden(self, name, make, sigma, schedule, beta,
                                 early, rng):
        code = make()
        B, max_iter = 8, 8
        maker = (make_flooding_decoder if schedule == "flooding"
                 else make_layered_decoder)
        dec = jax.jit(maker(code, max_iter=max_iter, beta=beta,
                            early_term=early))
        info = rng.integers(0, 2, size=(B, code.k)).astype(np.uint8)
        cw = g_encode(code, info)
        chan = g_quantize(_bpsk_chan(cw, sigma, rng), 4.0).astype(np.int8)
        hard, iters, conv = map(np.asarray, dec(jnp.asarray(chan)))
        for b in range(B):
            res = decode_fixed(chan[b].astype(np.int32), code,
                               max_iter=max_iter, beta=beta,
                               schedule=schedule, early_term=early)
            assert np.array_equal(hard[b], res.hard), (name, b)
            assert iters[b] == res.iters, (name, b, iters[b], res.iters)
            assert bool(conv[b]) == res.converged, (name, b)

    @pytest.mark.parametrize("schedule", ["flooding", "layered"])
    def test_bit_exact_vs_golden_wifi648(self, schedule, rng):
        """Canonical code, one param combo per schedule (the full matrix runs
        on the fast toy codes above; golden on n=648 is ~130 ms/frame)."""
        code = wifi.make_code(648, "1/2")
        B, max_iter, beta = 4, 6, 2
        maker = (make_flooding_decoder if schedule == "flooding"
                 else make_layered_decoder)
        dec = jax.jit(maker(code, max_iter=max_iter, beta=beta,
                            early_term=True))
        info = rng.integers(0, 2, size=(B, code.k)).astype(np.uint8)
        cw = g_encode(code, info)
        chan = g_quantize(_bpsk_chan(cw, 0.82, rng), 4.0).astype(np.int8)
        hard, iters, conv = map(np.asarray, dec(jnp.asarray(chan)))
        for b in range(B):
            res = decode_fixed(chan[b].astype(np.int32), code,
                               max_iter=max_iter, beta=beta,
                               schedule=schedule, early_term=True)
            assert np.array_equal(hard[b], res.hard), b
            assert iters[b] == res.iters and bool(conv[b]) == res.converged

    def test_zero_iter_convergence(self):
        code = toy_qc(4)
        dec = jax.jit(make_flooding_decoder(code, max_iter=10))
        chan = jnp.full((3, code.n), 20, jnp.int8)
        hard, iters, conv = dec(chan)
        assert np.all(np.asarray(iters) == 0)
        assert np.all(np.asarray(conv))
        assert not np.asarray(hard).any()


class TestChannel:
    @pytest.mark.parametrize("mod", ["qpsk", "16qam", "64qam",
                                     "8psk", "16apsk", "32apsk"])
    def test_unit_energy(self, mod, rng):
        m = ch.BITS_PER_SYM[mod]
        bits = rng.integers(0, 2, size=(64, 60 * m)).astype(np.uint8)
        sym = np.asarray(ch.modulate(jnp.asarray(bits), mod))
        es = np.mean(np.sum(sym**2, axis=-1))
        assert es == pytest.approx(1.0, rel=0.05)

    @pytest.mark.parametrize("mod", ["bpsk", "qpsk", "16qam", "64qam",
                                     "8psk", "16apsk", "32apsk"])
    def test_noiseless_demap_roundtrip(self, mod, rng):
        m = ch.BITS_PER_SYM[mod]
        bits = rng.integers(0, 2, size=(16, 30 * m)).astype(np.uint8)
        sym = ch.modulate(jnp.asarray(bits), mod)
        llr = np.asarray(ch.demap(sym, 0.3, mod))
        assert llr.shape == bits.shape
        assert np.array_equal((llr < 0).astype(np.uint8), bits)

    def test_bpsk_llr_closed_form(self, rng):
        y = rng.standard_normal((4, 8)).astype(np.float32)
        sigma = 0.7
        llr = np.asarray(ch.demap(jnp.asarray(y), sigma, "bpsk"))
        assert np.allclose(llr, 2 * y / sigma**2, rtol=1e-5)

    def test_awgn_variance(self):
        key = jax.random.PRNGKey(0)
        x = jnp.zeros((2000, 50))
        y = np.asarray(ch.awgn(key, x, 0.5))
        assert np.std(y) == pytest.approx(0.5, rel=0.05)

    def test_sigma_for_bpsk(self):
        # Eb/N0 = 0 dB, rate 1/2: sigma^2 = 1/(2*0.5*1) = 1
        assert ch.sigma_for(0.0, 0.5, "bpsk") == pytest.approx(1.0)

    @pytest.mark.parametrize("mod", ["16qam", "64qam"])
    def test_qam_demap_matches_exhaustive_maxlog(self, mod, rng):
        """Per-axis max-log equals full-constellation max-log for Gray square
        QAM (SURVEY.md §4.2 'QAM LLR vs exhaustive max-log')."""
        m = ch.BITS_PER_SYM[mod]
        ba = m // 2
        bits = rng.integers(0, 2, size=(4, 6 * m)).astype(np.uint8)
        sym = np.asarray(ch.modulate(jnp.asarray(bits), mod))
        sigma = 0.35
        rx = sym + sigma * rng.standard_normal(sym.shape)
        llr = np.asarray(ch.demap(jnp.asarray(rx.astype(np.float32)), sigma, mod))
        # exhaustive: enumerate all 2^m constellation points
        levels, labels = ch._gray_levels(ba)
        norm = ch._axis_norm(ba)
        pts, labs = [], []
        for i in range(len(levels)):
            for q in range(len(levels)):
                pts.append((levels[i] * norm, levels[q] * norm))
                labs.append(list(labels[i]) + list(labels[q]))
        pts = np.array(pts); labs = np.array(labs, bool)
        n0 = 2 * sigma**2
        rx_f = rx.reshape(-1, 2)
        d2 = np.sum((rx_f[:, None, :] - pts[None]) ** 2, axis=-1)
        for b in range(m):
            m0 = np.min(np.where(~labs[:, b], d2, 1e30), axis=-1)
            m1 = np.min(np.where(labs[:, b], d2, 1e30), axis=-1)
            ref = ((m1 - m0) / n0).reshape(rx.shape[0], -1)
            got = llr.reshape(rx.shape[0], -1, m)[:, :, b]
            assert np.allclose(got, ref, rtol=1e-4, atol=1e-4), (mod, b)


class TestAPSK:
    """DVB-S2 native constellations (8PSK, 16/32APSK; EN 302 307-1 ring
    geometry, quasi-Gray labels — see ops/channel._quadrant_gray_rings)."""

    @pytest.mark.parametrize("mod", ["8psk", "16apsk", "32apsk"])
    def test_ring_gray_adjacency(self, mod):
        """Angularly adjacent points on each ring (incl. the wrap) differ in
        exactly one label bit — the property the boustrophedon construction
        exists to guarantee."""
        pts, labels = ch._constellation(mod)
        radii = np.round(np.hypot(pts[:, 0], pts[:, 1]), 6)
        for r in np.unique(radii):
            on = np.where(radii == r)[0]
            ang = np.arctan2(pts[on, 1], pts[on, 0])
            ring = on[np.argsort(ang)]
            for a, b in zip(ring, np.roll(ring, -1)):
                d = int(np.sum(labels[a] != labels[b]))
                assert d == 1, (mod, r, a, b)

    def test_ring_geometry(self):
        """Ring counts and radius ratios match the configured DVB-S2 values;
        Es = 1 exactly (constellation is deterministic)."""
        for mod, counts, gammas in [("8psk", (8,), ()),
                                    ("16apsk", (4, 12), (3.15,)),
                                    ("32apsk", (4, 12, 16), (2.84, 5.27))]:
            pts, labels = ch._constellation(mod)
            radii = np.round(np.hypot(pts[:, 0], pts[:, 1]), 9)
            uniq, cnt = np.unique(radii, return_counts=True)
            assert tuple(cnt) == counts, mod
            for g, expect in zip(uniq[1:] / uniq[0], gammas):
                assert g == pytest.approx(expect, rel=1e-6), mod
            assert np.mean(np.sum(pts**2, axis=-1)) == pytest.approx(1.0)
            # labels are a bijection onto {0,1}^m
            m = ch.BITS_PER_SYM[mod]
            codes = {int("".join(map(str, l)), 2) for l in labels}
            assert codes == set(range(1 << m))

    @pytest.mark.parametrize("mod", ["8psk", "16apsk", "32apsk"])
    def test_demap_matches_bruteforce(self, mod, rng):
        """Generic max-log demap vs an independent scalar brute force over
        the constellation (SURVEY.md §4.2 'QAM LLR vs exhaustive max-log')."""
        m = ch.BITS_PER_SYM[mod]
        bits = rng.integers(0, 2, size=(3, 8 * m)).astype(np.uint8)
        sym = np.asarray(ch.modulate(jnp.asarray(bits), mod))
        sigma = 0.4
        rx = (sym + sigma * rng.standard_normal(sym.shape)).astype(np.float32)
        llr = np.asarray(ch.demap(jnp.asarray(rx), sigma, mod))
        pts, labels = ch._constellation(mod)
        n0 = 2 * sigma**2
        for fi, frame in enumerate(rx):
            for si, y in enumerate(frame):
                for b in range(m):
                    d0 = min(np.sum((y - pts[i]) ** 2)
                             for i in range(len(pts)) if labels[i, b] == 0)
                    d1 = min(np.sum((y - pts[i]) ** 2)
                             for i in range(len(pts)) if labels[i, b] == 1)
                    ref = (d1 - d0) / n0
                    got = llr[fi, si * m + b]
                    assert got == pytest.approx(ref, rel=1e-3, abs=1e-3)

    def test_non_dividing_symbol_size_rejected(self):
        """n=648 is not a multiple of the 32APSK 5-bit symbol: the pipeline
        must refuse up front, not die in a reshape mid-trace."""
        import dataclasses
        import pytest as _pytest
        from ldpc_tpu.config import PRESETS
        from ldpc_tpu.sim import build_code, make_run_batch
        cfg = PRESETS["wifi-648-r12-minsum"]
        cfg = dataclasses.replace(
            cfg, run=dataclasses.replace(cfg.run, batch=32),
            channel=dataclasses.replace(cfg.channel, modulation="32apsk"))
        with _pytest.raises(ValueError, match="symbol size"):
            make_run_batch(build_code(cfg), cfg, batch=32,
                           decoder_backend="jnp")

    def test_8psk_chain_decodes(self, rng):
        """End-to-end pipeline smoke: 802.11n n=648 r=1/2 OMS over 8PSK/AWGN
        at high SNR decodes nearly all frames (n=648 is divisible by the
        3-bit symbol size)."""
        import dataclasses
        import jax
        from ldpc_tpu.config import PRESETS
        from ldpc_tpu.sim import build_code, make_run_batch
        cfg = PRESETS["wifi-648-r12-minsum"]
        cfg = dataclasses.replace(
            cfg, run=dataclasses.replace(cfg.run, batch=32),
            channel=dataclasses.replace(cfg.channel, modulation="8psk"))
        code = build_code(cfg)
        rb = make_run_batch(code, cfg, batch=32, decoder_backend="jnp")
        sigma = np.float32(ch.sigma_for(7.0, code.rate, "8psk"))
        out = np.asarray(rb(jax.random.PRNGKey(0), sigma))
        frames, bit_e, frame_e = map(int, out[:3])
        assert frames == 32
        assert frame_e <= 2  # ~7 dB Eb/N0: waterfall floor for 8PSK r=1/2


class TestPerLaneSigma:
    """Per-codeword sigma broadcasting (the fused-SNR-sweep path) must equal
    per-row scalar-sigma calls for both BPSK and QAM."""

    @pytest.mark.parametrize("mod", ["bpsk", "16qam", "8psk"])
    def test_vector_sigma_matches_scalar(self, mod, rng):
        import jax
        from ldpc_tpu.ops import channel as ch
        B, nbits = 4, 48
        bits = jnp.asarray(rng.integers(0, 2, size=(B, nbits), dtype=np.uint8))
        x = ch.modulate(bits, mod)
        key = jax.random.PRNGKey(3)
        sigmas = np.array([0.3, 0.5, 0.8, 1.1], np.float32)
        y_vec = np.asarray(ch.awgn(key, x, jnp.asarray(sigmas)))
        llr_vec = np.asarray(ch.demap(jnp.asarray(y_vec),
                                      jnp.asarray(sigmas), mod))
        noise = (np.asarray(ch.awgn(key, x, 1.0)) - np.asarray(x))
        for b in range(B):
            y_b = np.asarray(x)[b] + sigmas[b] * noise[b]
            np.testing.assert_allclose(y_vec[b], y_b, rtol=1e-5, atol=1e-5)
            llr_b = np.asarray(ch.demap(jnp.asarray(y_vec[b:b + 1]),
                                        float(sigmas[b]), mod))
            np.testing.assert_allclose(llr_vec[b], llr_b[0], rtol=1e-4,
                                       atol=1e-4)


class TestBSC:
    """Bit-flip fault injector (SURVEY.md §5.3 `bitflip_channel`)."""

    def test_flip_rate(self):
        import jax
        bits = jnp.zeros((2000, 100), jnp.uint8)
        p = 0.1
        out = np.asarray(ch.bsc(jax.random.PRNGKey(1), bits, p))
        assert out.dtype == np.uint8
        rate = out.mean()
        assert abs(rate - p) < 0.005  # 200k trials, ~30 sigma margin

    def test_llr_sign_convention(self):
        llr = np.asarray(ch.bsc_llr(jnp.asarray([0, 1], jnp.uint8), 0.05))
        assert llr[0] > 0 and llr[1] < 0  # LLR > 0 means bit 0
        mag = np.log(0.95 / 0.05)
        np.testing.assert_allclose(np.abs(llr), mag, rtol=1e-5)

    def test_decoder_corrects_bsc_faults(self, rng):
        """Stress test: min-sum over BSC LLRs corrects most flips at p=2%
        on the n=648 r=1/2 code (far below the BSC capacity limit)."""
        import jax
        from ldpc_tpu.config import QuantConfig
        code = wifi.make_code(648, "1/2")
        quant = QuantConfig(bits=8, scale=4.0, beta_lsb=0)
        dec = make_flooding_decoder(code, max_iter=20, beta=0,
                                    qmax=quant.qmax, early_term=True)
        B, p = 64, 0.02
        info = rng.integers(0, 2, size=(B, code.k)).astype(np.uint8)
        cw = jnp.asarray(g_encode(code, info))
        rx = ch.bsc(jax.random.PRNGKey(7), cw, p)
        flips_in = int(np.sum(np.asarray(rx) != np.asarray(cw)))
        q = quantize(ch.bsc_llr(rx, p), quant)
        hard, iters, conv = dec(q)
        errs_out = int(np.sum(np.asarray(hard) != np.asarray(cw)))
        assert flips_in > 500  # the channel did inject faults
        assert errs_out < flips_in / 10  # decoder corrected the bulk
        assert np.asarray(conv).mean() > 0.9


def test_quant_bits_over_8_rejected():
    """bits > 8 would silently WRAP in the int8 datapath cast — QuantConfig
    rejects it up front (round-2 review finding)."""
    from ldpc_tpu.config import QuantConfig
    with pytest.raises(ValueError, match="int8"):
        QuantConfig(bits=10)
    with pytest.raises(ValueError, match="int8"):
        QuantConfig(bits=1)
    assert QuantConfig(bits=4).qmax == 7
