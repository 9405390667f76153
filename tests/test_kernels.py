"""Pallas kernel bit-exactness tests (SURVEY.md §4.2 'Unit: decoder kernel').

The Pallas decoder must equal the NumPy golden model EXACTLY on identical int8
inputs — min-sum over integers is deterministic, so the contract is equality,
not tolerance. Interpreter mode (interpret=True) is the sanitizer: the kernel
runs with pure NumPy semantics on CPU (SURVEY.md §5.2).
"""
import numpy as np
import pytest

from ldpc_tpu.codes.ieee80211n import make_code
from ldpc_tpu.codes.toy import toy_qc
from ldpc_tpu.golden.decoder import decode_fixed
from ldpc_tpu.kernels.minsum_pallas import make_pallas_decoder


def _random_llrs(rng, B, n, qmax=127):
    # Mixture of easy (large-|LLR|) and hard (noisy) lanes to exercise both
    # converged and non-converged paths.
    x = rng.normal(0, 40, size=(B, n))
    x[: B // 2] = rng.normal(30, 25, size=(B // 2, n))
    return np.clip(np.round(x), -qmax, qmax).astype(np.int8)


def _golden_batch(chan, code, **kw):
    hards, iters, convs = [], [], []
    for row in chan:
        r = decode_fixed(row.astype(np.int32), code, **kw)
        hards.append(r.hard)
        iters.append(r.iters)
        convs.append(r.converged)
    return np.stack(hards), np.array(iters), np.array(convs)


CASES = [
    dict(schedule="flooding", beta=0, early_term=False, max_iter=6),
    dict(schedule="flooding", beta=0, early_term=True, max_iter=7),
    dict(schedule="flooding", beta=2, early_term=True, max_iter=6),
    dict(schedule="layered", beta=0, early_term=False, max_iter=6),
    dict(schedule="layered", beta=2, early_term=True, max_iter=7),
]


@pytest.mark.parametrize("kw", CASES)
def test_toy_qc_bitexact(rng, kw):
    code = toy_qc(Z=4)
    B = 8
    chan = _random_llrs(rng, B, code.n)
    dec = make_pallas_decoder(code, qmax=127, batch_tile=4, interpret=True,
                              **kw)
    hard, iters, conv = map(np.asarray, dec(chan))
    g_hard, g_iters, g_conv = _golden_batch(chan, code, qmax=127, **kw)
    np.testing.assert_array_equal(hard, g_hard)
    np.testing.assert_array_equal(iters, g_iters)
    np.testing.assert_array_equal(conv, g_conv)


@pytest.mark.slow
@pytest.mark.parametrize("seed", [11, 12, 13])
def test_random_topology_bitexact(seed, rng):
    """Topology fuzz: randomly GENERATED small QC codes (random row
    supports, random shifts via gen_qc_code — different kb/cb/extension
    shapes per seed) must decode bit-exactly vs golden through the Pallas
    kernel, both schedules. Guards the layout compiler + kernel against
    assumptions that happen to hold for the standard code shapes."""
    from ldpc_tpu.codes.qcstruct import gen_qc_code
    g = np.random.default_rng(seed)
    kb = int(g.integers(3, 7))
    cb = int(g.integers(3, 5))
    mb = cb + int(g.integers(0, 3))  # 0-2 extension rows
    Z = int(g.choice([4, 6, 8]))
    rows = []
    for i in range(mb):
        deg = int(g.integers(2, kb + 1))
        rows.append(sorted(g.choice(kb, size=deg, replace=False).tolist()))
    ext_core = [sorted((kb + g.choice(cb, size=int(g.integers(1, 3)),
                                      replace=False)).tolist())
                for _ in range(mb - cb)]
    code = gen_qc_code(rows, kb=kb, cb=cb, Z=Z, rng=g,
                       name=f"fuzz_{seed}",
                       ext_core_cols=ext_core if mb > cb else None,
                       require_girth6=False)
    B = 8
    chan = _random_llrs(rng, B, code.n)
    for kw in (dict(schedule="flooding", beta=2, early_term=True,
                    max_iter=5),
               dict(schedule="layered", beta=0, early_term=True,
                    max_iter=5)):
        dec = make_pallas_decoder(code, qmax=127, batch_tile=8,
                                  interpret=True, **kw)
        hard, iters, conv = map(np.asarray, dec(chan))
        g_hard, g_iters, g_conv = _golden_batch(chan, code, qmax=127, **kw)
        np.testing.assert_array_equal(hard, g_hard)
        np.testing.assert_array_equal(iters, g_iters)
        np.testing.assert_array_equal(conv, g_conv)


@pytest.mark.parametrize("kw", [
    dict(schedule="flooding", beta=0, early_term=False, max_iter=5),
    dict(schedule="layered", beta=2, early_term=True, max_iter=5),
])
@pytest.mark.slow
def test_wifi648_bitexact(rng, kw):
    code = make_code(648, "1/2")
    B = 4
    chan = _random_llrs(rng, B, code.n)
    dec = make_pallas_decoder(code, qmax=127, batch_tile=4, interpret=True,
                              **kw)
    hard, iters, conv = map(np.asarray, dec(chan))
    g_hard, g_iters, g_conv = _golden_batch(chan, code, qmax=127, **kw)
    np.testing.assert_array_equal(hard, g_hard)
    np.testing.assert_array_equal(iters, g_iters)
    np.testing.assert_array_equal(conv, g_conv)


@pytest.mark.slow
@pytest.mark.parametrize("bits", [4, 6])
def test_low_bitwidth_bitexact(rng, bits):
    """Bit widths below the canonical 8 (the reference class exists to study
    exactly this): Pallas and the jnp QC reference must stay bit-exact vs
    golden at qmax = 2**(bits-1) - 1. Messages/posteriors only shrink, so
    every storage path (int8 c2v, int16 totals) remains lossless."""
    import jax.numpy as jnp
    from ldpc_tpu.ops.decode_qc import make_qc_decoder
    qmax = (1 << (bits - 1)) - 1
    code = toy_qc(Z=4)
    B = 8
    chan = _random_llrs(rng, B, code.n, qmax=qmax)
    for kw in (dict(schedule="flooding", beta=1, early_term=True, max_iter=6),
               dict(schedule="layered", beta=0, early_term=True, max_iter=6)):
        dec = make_pallas_decoder(code, qmax=qmax, batch_tile=4,
                                  interpret=True, **kw)
        hard, iters, conv = map(np.asarray, dec(chan))
        g_hard, g_iters, g_conv = _golden_batch(chan, code, qmax=qmax, **kw)
        np.testing.assert_array_equal(hard, g_hard)
        np.testing.assert_array_equal(iters, g_iters)
        np.testing.assert_array_equal(conv, g_conv)
        qdec = make_qc_decoder(code, qmax=qmax, **kw)
        qh, qi, qc = map(np.asarray, qdec(jnp.asarray(chan)))
        np.testing.assert_array_equal(qh, g_hard)
        np.testing.assert_array_equal(qi, g_iters)
        np.testing.assert_array_equal(qc, g_conv)


def test_all_zero_noiseless(rng):
    """All-zeros codeword with clean LLRs converges instantly with 0 iters."""
    code = toy_qc(Z=4)
    chan = np.full((4, code.n), 60, np.int8)
    dec = make_pallas_decoder(code, schedule="layered", early_term=True,
                              max_iter=5, batch_tile=4, interpret=True)
    hard, iters, conv = map(np.asarray, dec(chan))
    assert not hard.any()
    assert (iters == 0).all()
    assert conv.all()


@pytest.mark.parametrize("kw", [
    dict(schedule="flooding", beta=0, early_term=False, max_iter=4),
    dict(schedule="flooding", beta=0, early_term=True, max_iter=4),
    dict(schedule="layered", beta=2, early_term=True, max_iter=3),
])
@pytest.mark.slow
def test_vreg_layout_matches_flat(rng, kw):
    """The vreg-exact (Z, Bs, 128) layout (batch_tile % 1024 == 0 — the TPU
    fast path) must be bit-identical to the flat layout on the same inputs;
    flat is golden-verified above, so transitivity covers vreg vs golden.
    One 1024-lane tile on the toy code keeps interpret mode affordable."""
    code = toy_qc(Z=4)
    B = 1024
    chan = _random_llrs(rng, B, code.n)
    d_vreg = make_pallas_decoder(code, qmax=127, batch_tile=1024,
                                 interpret=True, **kw)
    d_flat = make_pallas_decoder(code, qmax=127, batch_tile=256,
                                 interpret=True, **kw)
    h1, i1, c1 = map(np.asarray, d_vreg(chan))
    h2, i2, c2 = map(np.asarray, d_flat(chan))
    np.testing.assert_array_equal(h1, h2)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_array_equal(c1, c2)


@pytest.mark.slow
def test_vreg_layout_c2v_dtypes(rng):
    """int16/int8 c2v STORAGE must not change results (values are clipped to
    +-qmax before storing, so narrower storage is lossless)."""
    import jax.numpy as jnp
    code = toy_qc(Z=4)
    chan = _random_llrs(rng, 1024, code.n)
    outs = []
    for dt in (jnp.int32, jnp.int16, jnp.int8):
        dec = make_pallas_decoder(code, qmax=127, batch_tile=1024,
                                  schedule="flooding", early_term=False,
                                  max_iter=4, interpret=True, c2v_dtype=dt)
        outs.append(tuple(map(np.asarray, dec(chan))))
    for o in outs[1:]:
        for a, b in zip(outs[0], o):
            np.testing.assert_array_equal(a, b)


class TestTwoPhaseET:
    """Two-phase repacking early termination (pipeline.make_two_phase_decoder)
    must be BIT-EXACT vs the single-phase ET decoder: integer min-sum is
    deterministic, so restarting an unconverged lane replays its trajectory."""

    def _cfg(self, p1):
        from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,
                                     QuantConfig, RunConfig, SimConfig)
        return SimConfig(
            code=CodeConfig(family="toy", Z=8),
            channel=ChannelConfig(),
            quant=QuantConfig(bits=8, scale=4.0, beta_lsb=0),
            decoder=DecoderConfig(algorithm="min-sum", schedule="flooding",
                                  max_iter=12, early_term=True,
                                  phase1_iters=p1),
            run=RunConfig(batch=256))

    def test_bitexact_vs_single_phase(self, rng):
        import dataclasses
        from ldpc_tpu.codes.toy import toy_qc
        from ldpc_tpu.sim.pipeline import select_decoder
        code = toy_qc(8)
        B = 256
        # channel-realistic LLRs at a sigma where ~10% of lanes miss the
        # phase-1 budget (tuned: sigma=0.8 -> ~40/256 unconverged at 12 it)
        sigma = 0.8
        y = 1.0 + sigma * rng.standard_normal((B, code.n))
        chan = np.clip(np.round(2 * y / sigma**2 * 4.0),
                       -127, 127).astype(np.int8)
        cfg2 = self._cfg(3)
        cfg1 = dataclasses.replace(
            cfg2, decoder=dataclasses.replace(cfg2.decoder,
                                              phase1_iters=None))
        d2, lbl2 = select_decoder(code, cfg2, "jnp", batch=B)
        d1, lbl1 = select_decoder(code, cfg1, "jnp", batch=B)
        assert lbl2.endswith("-2phase") and not lbl1.endswith("-2phase")
        h2, it2, cv2 = map(np.asarray, d2(chan))
        h1, it1, cv1 = map(np.asarray, d1(chan))
        assert 0 < (~cv1).sum() <= B // 4, "operating point off for the test"
        np.testing.assert_array_equal(h2, h1)
        np.testing.assert_array_equal(it2, it1)
        np.testing.assert_array_equal(cv2, cv1)

    def test_overflow_falls_back_exactly(self, rng):
        """More unconverged lanes than capacity -> full-batch fallback, same
        results."""
        import dataclasses
        from ldpc_tpu.codes.toy import toy_qc
        from ldpc_tpu.sim.pipeline import select_decoder
        code = toy_qc(8)
        B = 256
        chan = (rng.integers(-6, 6, size=(B, code.n))).astype(np.int8)  # junk
        # junk LLRs: nearly nothing converges -> capacity overflow
        cfg2 = self._cfg(2)
        cfg1 = dataclasses.replace(
            cfg2, decoder=dataclasses.replace(cfg2.decoder,
                                              phase1_iters=None))
        d2, _ = select_decoder(code, cfg2, "jnp", batch=B)
        d1, _ = select_decoder(code, cfg1, "jnp", batch=B)
        h2, it2, cv2 = map(np.asarray, d2(chan))
        h1, it1, cv1 = map(np.asarray, d1(chan))
        assert (~cv1).sum() > B // 4  # genuinely overflows capacity
        np.testing.assert_array_equal(h2, h1)
        np.testing.assert_array_equal(it2, it1)
        np.testing.assert_array_equal(cv2, cv1)


@pytest.mark.slow
def test_pre_transposed_decode_matches(rng):
    """pre_transposed=True consumes (nb, Z, B) and must produce identical
    results to the (B, n) entry on the same logical inputs — both layouts,
    with and without ET."""
    from ldpc_tpu.codes.ieee80211n import make_code as wifi_code
    code = wifi_code(648, "1/2")
    B = 1024
    chan = _random_llrs(rng, B, code.n)
    for bt, kw in ((1024, dict(schedule="flooding", early_term=False,
                               max_iter=4)),
                   (256, dict(schedule="layered", early_term=True,
                              max_iter=3, beta=2))):
        d_n = make_pallas_decoder(code, qmax=127, batch_tile=bt,
                                  interpret=True, **kw)
        d_t = make_pallas_decoder(code, qmax=127, batch_tile=bt,
                                  interpret=True, pre_transposed=True, **kw)
        nb, Z = code.base.shape[1], code.Z
        chan_t = np.ascontiguousarray(
            chan.reshape(B, nb, Z).transpose(1, 2, 0))
        h1, i1, c1 = map(np.asarray, d_n(chan))
        h2t, i2, c2 = map(np.asarray, d_t(chan_t))
        h2 = h2t.reshape(code.n, B).T
        np.testing.assert_array_equal(h1, h2)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_array_equal(c1, c2)


@pytest.mark.slow
def test_fused_io_counts_match(rng):
    """input_scale (in-kernel quantizer) + count_info_cols (in-kernel error
    counting) must reproduce exactly the external quantize + XLA counting on
    the same float LLRs — both ET and fixed-iteration paths."""
    from ldpc_tpu.codes.ieee80211n import make_code as wifi_code
    from ldpc_tpu.ops.quantize import quantize
    from ldpc_tpu.config import QuantConfig
    import jax.numpy as jnp
    code = wifi_code(648, "1/2")
    nb, Z = code.base.shape[1], code.Z
    kb = code.k // Z
    B = 512
    scale = 4.0
    llr = (rng.standard_normal((code.n, B)) * 8).astype(np.float32)
    info = rng.integers(0, 2, (code.k, B)).astype(np.uint8)
    for kw in (dict(schedule="flooding", early_term=False, max_iter=4),
               dict(schedule="flooding", early_term=True, max_iter=4),
               dict(schedule="layered", early_term=True, max_iter=3,
                    beta=2)):
        d_f = make_pallas_decoder(code, qmax=127, batch_tile=256,
                                  interpret=True, pre_transposed=True,
                                  input_scale=scale, count_info_cols=kb,
                                  **kw)
        d_p = make_pallas_decoder(code, qmax=127, batch_tile=256,
                                  interpret=True, pre_transposed=True, **kw)
        bits, frame, it_f, cv_f = map(np.asarray, d_f(
            jnp.asarray(llr).reshape(nb, Z, B),
            jnp.asarray(info).reshape(kb, Z, B)))
        q = np.asarray(quantize(jnp.asarray(llr),
                                QuantConfig(bits=8, scale=scale)))
        h_p, it_p, cv_p = map(np.asarray, d_p(
            jnp.asarray(q).reshape(nb, Z, B)))
        err = h_p.reshape(code.n, B)[:code.k] != info
        np.testing.assert_array_equal(bits, err.sum(axis=0))
        np.testing.assert_array_equal(frame.astype(bool), err.any(axis=0))
        np.testing.assert_array_equal(it_f, it_p)
        np.testing.assert_array_equal(cv_f, cv_p)


@pytest.mark.slow
def test_mc_megakernel_inject_matches(rng):
    """Monte-Carlo megakernel (in-kernel info bits, QC encode, Box-Muller
    AWGN, demap, quantize, decode, count) with injected random words must
    reproduce exactly a jnp reference applying the identical formulas plus
    the already-trusted plain interpret kernel — flooding and layered."""
    import jax
    import jax.numpy as jnp
    from ldpc_tpu.codes.ieee80211n import make_code as wifi_code
    from ldpc_tpu.codes.qcstruct import qc_encode_numpy

    code = wifi_code(648, "1/2")
    nb, Z = code.base.shape[1], code.Z
    kb = code.k // Z
    nph = (nb + 1) // 2
    B = 256
    scale, qmax = 4.0, 127
    sigma = 0.82
    gain = np.float32(2.0) * np.float32(scale) / (np.float32(sigma)
                                                  * np.float32(sigma))
    u_info = rng.integers(0, 1 << 32, (kb, Z, B), dtype=np.uint32)
    u_n1 = rng.integers(0, 1 << 32, (nph, Z, B), dtype=np.uint32)
    u_n2 = rng.integers(0, 1 << 32, (nph, Z, B), dtype=np.uint32)
    ui = jnp.asarray(u_info.view(np.int32))
    u1 = jnp.asarray(u_n1.view(np.int32))
    u2 = jnp.asarray(u_n2.view(np.int32))

    # jnp reference with the kernel's exact op sequence (same XLA backend
    # as interpret mode, so transcendentals match bit-for-bit).
    def to_unit(w):
        wu = jax.lax.bitcast_convert_type(w, jnp.uint32)
        s = jax.lax.shift_right_logical(wu, jnp.uint32(8))
        si = jax.lax.bitcast_convert_type(s, jnp.int32)
        return (si.astype(jnp.float32) * jnp.float32(2.0 ** -24)
                + jnp.float32(2.0 ** -25))

    info = (u_info & 1).astype(np.uint8)            # (kb, Z, B)
    cw = qc_encode_numpy(code, info.reshape(code.k, B).T).T  # (n, B)
    f1, f2 = to_unit(u1), to_unit(u2)
    r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(f1))
    th = jnp.float32(2.0 * np.pi) * f2
    nrm = jnp.stack([r * jnp.cos(th), r * jnp.sin(th)], axis=1).reshape(
        2 * nph, Z, B)[:nb]                         # (nb, Z, B)
    xf = (jnp.float32(1.0)
          - jnp.float32(2.0) * jnp.asarray(cw.reshape(nb, Z, B), jnp.int32)
          .astype(jnp.float32))
    xs = (xf + jnp.float32(sigma) * nrm) * gain
    q = jnp.where(xs >= 0, jnp.floor(xs + 0.5), jnp.ceil(xs - 0.5))
    q = jnp.clip(q, -qmax, qmax).astype(jnp.int8)

    for kw in (dict(schedule="flooding", early_term=False, max_iter=4),
               dict(schedule="layered", early_term=True, max_iter=3,
                    beta=2)):
        d_mc = make_pallas_decoder(code, qmax=qmax, batch_tile=128,
                                   interpret=True, input_scale=scale,
                                   count_info_cols=kb, mc_batch=B,
                                   inject_random=True, **kw)
        d_p = make_pallas_decoder(code, qmax=qmax, batch_tile=128,
                                  interpret=True, pre_transposed=True, **kw)
        seeds = jnp.zeros((3,), jnp.int32)
        chanf = jnp.asarray([sigma, gain], jnp.float32)
        bits, frame, it_m, cv_m = map(np.asarray,
                                      d_mc(seeds, chanf, ui, u1, u2))
        h_p, it_p, cv_p = map(np.asarray, d_p(q))
        err = h_p.reshape(code.n, B)[:code.k] != info.reshape(code.k, B)
        np.testing.assert_array_equal(bits, err.sum(axis=0))
        np.testing.assert_array_equal(frame.astype(bool), err.any(axis=0))
        np.testing.assert_array_equal(it_m, it_p)
        np.testing.assert_array_equal(cv_m, cv_p)


@pytest.mark.slow
def test_mc_inner_loop_matches_grid(rng):
    """mc_inner_loop=True runs every batch tile inside ONE grid step (kills
    the measured ~12.6 us/step Mosaic re-entry); with injected random words
    it must be bit-identical to the per-tile-grid megakernel — the PRNG mix
    uses the tile index either way, so the contract extends to hardware."""
    import jax.numpy as jnp
    from ldpc_tpu.codes.ieee80211n import make_code as wifi_code

    code = wifi_code(648, "1/2")
    nb, Z = code.base.shape[1], code.Z
    kb = code.k // Z
    nph = (nb + 1) // 2
    B = 256  # two tiles of 128 — the inner loop actually iterates
    scale, qmax = 4.0, 127
    sigma, gain = 0.82, np.float32(2.0 * 4.0 / (0.82 * 0.82))
    ui = jnp.asarray(rng.integers(0, 1 << 32, (kb, Z, B),
                                  dtype=np.uint32).view(np.int32))
    u1 = jnp.asarray(rng.integers(0, 1 << 32, (nph, Z, B),
                                  dtype=np.uint32).view(np.int32))
    u2 = jnp.asarray(rng.integers(0, 1 << 32, (nph, Z, B),
                                  dtype=np.uint32).view(np.int32))
    seeds = jnp.zeros((3,), jnp.int32)
    chanf = jnp.asarray([sigma, gain], jnp.float32)
    outs = []
    for inner in (False, True):
        d = make_pallas_decoder(code, qmax=qmax, batch_tile=128,
                                interpret=True, input_scale=scale,
                                count_info_cols=kb, mc_batch=B,
                                inject_random=True, mc_inner_loop=inner,
                                schedule="flooding", early_term=False,
                                max_iter=4)
        outs.append(tuple(map(np.asarray, d(seeds, chanf, ui, u1, u2))))
    for a, b in zip(*outs):
        np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("inner,bt,B", [
    (False, 128, 256),   # flat layout, grid mode
    (True, 128, 256),    # flat layout, internal tile loop
    (True, 1024, 2048),  # vreg-exact layout (production run_fused default)
])
@pytest.mark.slow
def test_mc_lane_sigma_matches_scalar(inner, bt, B, rng):
    """Per-lane-sigma megakernel (the fused multi-SNR sweep mode): with
    injected random words, every lane must equal the SCALAR-sigma megakernel
    run at that lane's sigma — lanes are independent and the injected stream
    is identical, so the contract is exact equality, stripe by stripe."""
    import jax.numpy as jnp

    code = make_code(648, "1/2")
    nb, Z = code.base.shape[1], code.Z
    kb = code.k // Z
    nph = (nb + 1) // 2
    P = 2
    scale, qmax = 4.0, 127
    sigmas = np.asarray([0.55, 1.1], np.float32)
    ui = jnp.asarray(rng.integers(0, 1 << 32, (kb, Z, B),
                                  dtype=np.uint32).view(np.int32))
    u1 = jnp.asarray(rng.integers(0, 1 << 32, (nph, Z, B),
                                  dtype=np.uint32).view(np.int32))
    u2 = jnp.asarray(rng.integers(0, 1 << 32, (nph, Z, B),
                                  dtype=np.uint32).view(np.int32))
    seeds = jnp.zeros((3,), jnp.int32)
    kw = dict(qmax=qmax, batch_tile=bt, interpret=True, input_scale=scale,
              count_info_cols=kb, mc_batch=B, inject_random=True,
              mc_inner_loop=inner, schedule="flooding", early_term=True,
              max_iter=4, beta=2)
    point = np.arange(B) % P
    sig_lane = jnp.asarray(sigmas[point])
    gain_lane = jnp.float32(2.0 * scale) / (sig_lane * sig_lane)
    d_lane = make_pallas_decoder(code, mc_lane_sigma=True, **kw)
    lane_out = tuple(map(np.asarray, d_lane(
        seeds, jnp.zeros((2,), jnp.float32), ui, u1, u2,
        sigma_lane=sig_lane, gain_lane=gain_lane)))
    d_scalar = make_pallas_decoder(code, **kw)
    for p in range(P):
        sig = float(sigmas[p])
        chanf = jnp.asarray(
            [sig, np.float32(2.0 * scale) / np.float32(sig * sig)],
            jnp.float32)
        ref = tuple(map(np.asarray, d_scalar(seeds, chanf, ui, u1, u2)))
        sel = point == p
        for a, b in zip(lane_out, ref):
            np.testing.assert_array_equal(a[sel], b[sel])


@pytest.mark.parametrize("code_fn,max_iter", [
    (lambda: toy_qc(4), 5),            # mb=3: odd -> unpaired tail layer
    (lambda: make_code(648, "1/2"), 4),  # mb=12: fully paired
])
@pytest.mark.slow
def test_pair_layers_bitexact(code_fn, max_iter, rng):
    """Opt-in paired flooding sweep (two base rows stacked on sublanes,
    +qmax pad slots) must equal the unpaired kernel EXACTLY — the pad can
    never displace min1/min2 (all real magnitudes <= qmax, degrees >= 2)
    nor flip the parity XOR (positive pad)."""
    code = code_fn()
    chan = _random_llrs(rng, 8, code.n)
    kw = dict(schedule="flooding", early_term=False, max_iter=max_iter,
              beta=1, qmax=127, batch_tile=4, interpret=True)
    ref = make_pallas_decoder(code, **kw)
    paired = make_pallas_decoder(code, pair_layers=True, **kw)
    h0, i0, c0 = map(np.asarray, ref(chan))
    h1, i1, c1 = map(np.asarray, paired(chan))
    np.testing.assert_array_equal(h1, h0)
    np.testing.assert_array_equal(i1, i0)
    np.testing.assert_array_equal(c1, c0)
