"""5G NR and DVB-S2 code families + structured QC encoder tests
(SURVEY.md §4.2 'Unit: codes', §8.1 invariants; BASELINE.json:9-10)."""
import jax.numpy as jnp
import numpy as np
import pytest

from ldpc_tpu.codes import dvbs2, nr_bg
from ldpc_tpu.codes.code import gf2_rank
from ldpc_tpu.codes.ieee80211n import all_codes, make_code as make_wifi
from ldpc_tpu.codes.qcstruct import (base_collisions, detect_enc_struct,
                                     make_qc_encoder, qc_encode_numpy)
from ldpc_tpu.golden.encoder import encode as golden_encode


class TestStructDetect:
    def test_all_wifi_tables_detected(self):
        for code in all_codes():
            st = detect_enc_struct(code.base)
            assert st is not None, code.name
            assert st.kb == code.k // code.Z
            assert st.cb == code.m // code.Z  # full dual-diagonal

    def test_qc_encoder_matches_golden_wifi(self, rng):
        for code in [make_wifi(648, "1/2"), make_wifi(1944, "5/6")]:
            info = rng.integers(0, 2, size=(4, code.k), dtype=np.uint8)
            cw = qc_encode_numpy(code, info)
            assert (cw == golden_encode(code, info)).all()

    def test_jax_qc_encoder_matches_numpy(self, rng):
        code = make_wifi(648, "1/2")
        info = rng.integers(0, 2, size=(5, code.k), dtype=np.uint8)
        enc = make_qc_encoder(code)
        assert (np.asarray(enc(jnp.asarray(info)))
                == qc_encode_numpy(code, info)).all()


class TestNR:
    @pytest.mark.parametrize("bg,Z", [(1, 32), (2, 16)])
    def test_full_graph_invariants(self, bg, Z, rng):
        code = nr_bg.full_graph(bg, Z)
        p = nr_bg._PARAMS[bg]
        assert code.n == (p["kb"] + p["mb"]) * Z
        assert code.k == p["kb"] * Z
        assert not code.standard_exact  # generated '-like' realization
        assert gf2_rank(code.h_dense()) == code.m
        info = rng.integers(0, 2, size=(2, code.k), dtype=np.uint8)
        assert not code.syndrome(qc_encode_numpy(code, info)).any()

    def test_girth6_when_feasible(self):
        code = nr_bg.full_graph(2, 32)
        assert not base_collisions(code.base, 32)

    def test_lifting_sets(self):
        assert 384 in nr_bg.ALL_Z and 2 in nr_bg.ALL_Z
        assert all(z <= 384 for z in nr_bg.ALL_Z)
        assert 384 == max(nr_bg.LIFT_SETS[3])  # 3*128

    @pytest.mark.parametrize("rate,ok", [("1/3", True), ("1/2", True),
                                         ("2/3", True), ("1/10", False)])
    def test_rate_matching(self, rate, ok, rng):
        if not ok:
            with pytest.raises(ValueError):
                nr_bg.make_code(1, 32, rate)
            return
        code = nr_bg.make_code(1, 32, rate)
        # first 2Z always punctured; realized rate matches the request
        assert list(code.punct_vns[:64]) == list(range(64))
        assert abs(code.rate - eval(rate.replace("/", "/"))) < 1e-9
        info = rng.integers(0, 2, size=(1, code.k), dtype=np.uint8)
        assert not code.syndrome(qc_encode_numpy(code, info)).any()


class TestDVBS2:
    def test_profiles_consistent(self):
        for rate, (k, nhi, d1) in dvbs2.PROFILES.items():
            assert k % dvbs2.Z == 0 and nhi % dvbs2.Z == 0 and nhi <= k

    @pytest.mark.parametrize("rate", ["1/2", "8/9"])
    def test_build_and_encode(self, rate, rng):
        code = dvbs2.make_code(64800, rate)
        k, nhi, d1 = dvbs2.PROFILES[rate]
        assert code.n == 64800 and code.k == k and code.Z == 360
        assert not code.standard_exact
        assert not base_collisions(code.base, 360)
        dv = np.zeros(code.n, np.int64)
        for vs in code.cn_adj:
            dv[vs] += 1
        assert (dv[:nhi] == d1).all() and (dv[nhi:k] == 3).all()
        assert (dv[k:k + 360] == 3).all() and (dv[k + 360:] == 2).all()
        info = rng.integers(0, 2, size=(1, k), dtype=np.uint8)
        assert not code.syndrome(qc_encode_numpy(code, info)).any()

    def test_jax_encoder_large(self, rng):
        code = dvbs2.make_code(64800, "1/2")
        info = rng.integers(0, 2, size=(2, code.k), dtype=np.uint8)
        enc = make_qc_encoder(code)
        assert (np.asarray(enc(jnp.asarray(info)))
                == qc_encode_numpy(code, info)).all()

    @pytest.mark.parametrize("rate", ["1/4", "1/2", "8/9"])
    def test_short_frames(self, rate, rng):
        """n=16200 short frames (EN 302 307-1): short-frame k_ldpc values,
        IRA structure, encodable, decodable through the auto-dispatched
        pipeline."""
        code = dvbs2.make_code(16200, rate)
        k = dvbs2.SHORT_K[rate]
        assert code.n == 16200 and code.k == k and code.Z == 360
        assert not code.standard_exact
        info = rng.integers(0, 2, size=(1, k), dtype=np.uint8)
        assert not code.syndrome(qc_encode_numpy(code, info)).any()
        # staircase parity part intact (degree 2 except the first block)
        dv = np.zeros(code.n, np.int64)
        for vs in code.cn_adj:
            dv[vs] += 1
        assert (dv[k + 360:] == 2).all()

    def test_short_frame_decodes(self, rng):
        """One decode through the QC-structured path, vs the golden model."""
        from ldpc_tpu.golden.decoder import decode_fixed
        from ldpc_tpu.ops.decode_qc import make_qc_decoder
        code = dvbs2.make_code(16200, "1/2")
        chan = rng.integers(-30, 30, size=(4, code.n)).astype(np.int8)
        dec = make_qc_decoder(code, max_iter=3, beta=2, qmax=127,
                              schedule="layered", early_term=False)
        h, it, cv = map(np.asarray, dec(jnp.asarray(chan)))
        g = decode_fixed(chan[0], code, max_iter=3, beta=2, qmax=127,
                         schedule="layered", early_term=False)
        np.testing.assert_array_equal(h[0], g.hard)


class TestPuncturedPipeline:
    def test_nr_run_batch(self):
        import jax
        from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,
                                     QuantConfig, RunConfig, SimConfig)
        from ldpc_tpu.sim import build_code, make_run_batch
        cfg = SimConfig(
            code=CodeConfig(family="5gnr", base_graph=2, Z=16, rate="1/3"),
            channel=ChannelConfig(modulation="bpsk"),
            quant=QuantConfig(beta_lsb=2),
            decoder=DecoderConfig(algorithm="offset-min-sum",
                                  schedule="layered", max_iter=6),
            run=RunConfig(batch=32))
        code = build_code(cfg)
        assert len(code.punct_vns) == 32  # 2Z
        rb = make_run_batch(code, cfg, decoder_backend="jnp")
        out = tuple(map(int, rb(jax.random.PRNGKey(0), np.float32(0.7))))
        assert out[0] == 32
        assert 0 <= out[2] <= 32


class TestShortening:
    def test_shortened_code_fields(self):
        code = nr_bg.make_code(2, 32, "1/3", k_info=256)
        assert code.k == 320 and code.k_eff == 256
        assert list(code.shortened_vns) == list(range(256, 320))
        assert abs(code.rate - 1 / 3) < 1e-9

    def test_shortened_pipeline_noiseless(self):
        """Near-noiseless shortened run decodes perfectly and counts no
        errors on filler bits."""
        import jax
        import numpy as np
        from ldpc_tpu.config import (ChannelConfig, CodeConfig, DecoderConfig,
                                     QuantConfig, RunConfig, SimConfig)
        from ldpc_tpu.sim import build_code, make_run_batch
        cfg = SimConfig(
            code=CodeConfig(family="5gnr", base_graph=2, Z=32, rate="1/3",
                            k_info=256),
            channel=ChannelConfig(modulation="bpsk"),
            quant=QuantConfig(beta_lsb=2),
            decoder=DecoderConfig(algorithm="offset-min-sum",
                                  schedule="layered", max_iter=10),
            run=RunConfig(batch=32))
        code = build_code(cfg)
        rb = make_run_batch(code, cfg, decoder_backend="jnp")
        out = tuple(map(int, rb(jax.random.PRNGKey(0), np.float32(0.25))))
        assert out[1] == 0 and out[2] == 0  # no bit/frame errors at high SNR


def test_nr_heavy_shortening_overlap_rate_exact():
    """k_info < 2Z: the shortened tail overlaps the punctured prefix; the
    rate-matching sizing must count the UNION (round-1 advisor finding,
    codes-side completion). The built graph transmits exactly round(k/R)
    bits and the realized rate equals the requested one."""
    from ldpc_tpu.codes.nr_bg import make_code
    c = make_code(base_graph=1, Z=384, rate="1/4", k_info=500)
    assert c.n_tx == 2000 and abs(c.rate - 0.25) < 1e-9
    # requests whose core parities cannot fit are rejected, not mis-built
    with pytest.raises(ValueError, match="out of range"):
        make_code(base_graph=1, Z=384, rate="1/3", k_info=500)


def test_dvbs2_rate_seeds_differ():
    """'1/2' vs '1/4' must not draw identical shift tables (the old
    two-byte seed truncation collided on shared prefixes)."""
    import numpy as np
    from ldpc_tpu.codes.dvbs2 import make_code
    b12 = make_code(n=64800, rate="1/2").base
    b14 = make_code(n=64800, rate="1/4").base
    k = min(b12.shape[1], b14.shape[1])
    assert not np.array_equal(b12[:4, :k], b14[:4, :k])
