"""Stage-2 tests: code builders + layout compiler (SURVEY.md §4.2 'unit: codes',
§8.1 invariant validation of reconstructed standard tables)."""
import numpy as np
import pytest

from ldpc_tpu.codes import (
    LDPCCode,
    compile_edge_layout,
    compile_qc_layout,
    expand_qc,
    gf2_rank,
    has_4cycle,
)
from ldpc_tpu.codes import ieee80211n as wifi
from ldpc_tpu.codes.toy import toy_qc
from ldpc_tpu.golden import encode

ALL_WIFI = [(n, r) for n in wifi.N_VALUES for r in wifi.RATES]


@pytest.mark.parametrize("n,rate", ALL_WIFI)
class TestWifiCodes:
    def test_shape_and_structure(self, n, rate):
        B = wifi.base_matrix(n, rate)
        mb, nb = B.shape
        Z = wifi.Z_OF_N[n]
        code = wifi.make_code(n, rate)
        assert code.n == n and code.m == mb * Z
        assert code.k / code.n == pytest.approx(eval(rate))
        # Dual-diagonal parity structure (IEEE 802.11-2012 Annex F):
        kb = nb - mb
        # first parity column has weight 3, equal shift top/bottom, 0 in middle
        col = B[:, kb]
        nz = np.nonzero(col >= 0)[0]
        assert len(nz) == 3
        assert nz[0] == 0 and nz[-1] == mb - 1
        assert col[nz[0]] == col[nz[-1]]
        assert col[nz[1]] == 0
        # remaining parity columns: staircase of paired zero-shift identities
        for j in range(kb + 1, nb):
            colj = B[:, j]
            nz = np.nonzero(colj >= 0)[0]
            assert list(nz) == [j - kb - 1, j - kb]
            assert np.all(colj[nz] == 0)

    def test_full_rank(self, n, rate):
        code = wifi.make_code(n, rate)
        assert gf2_rank(code.h_dense()) == code.m

    def test_girth_at_least_6(self, n, rate):
        assert not has_4cycle(wifi.make_code(n, rate))

    def test_encode_property(self, n, rate):
        code = wifi.make_code(n, rate)
        rng = np.random.default_rng(1)
        info = rng.integers(0, 2, size=(4, code.k)).astype(np.uint8)
        cw = encode(code, info)
        H = code.h_dense()
        assert np.all((cw @ H.T) % 2 == 0)
        assert np.all(cw[:, : code.k] == info)  # systematic, identity perm

    def test_degree_profile(self, n, rate):
        """Row degrees match the base matrix; column degrees bounded."""
        B = wifi.base_matrix(n, rate)
        code = wifi.make_code(n, rate)
        Z = wifi.Z_OF_N[n]
        row_deg = (B >= 0).sum(axis=1)
        degs = np.array([len(a) for a in code.cn_adj])
        assert np.all(degs.reshape(-1, Z) == row_deg[:, None])
        max_dv = max(len(a) for a in code.vn_adj())
        assert 127 * (max_dv + 1) < 2 ** 15  # int16 posterior accumulator safe


class TestNegativeInvariant:
    def test_corrupted_shift_breaks_girth_or_differs(self):
        """SURVEY.md §8.1: an intentionally corrupted table must be detected by
        the invariant suite — here, corrupting a staircase shift breaks the
        dual-diagonal structure check and changes H."""
        B = wifi.base_matrix(648, "1/2").copy()
        B[1, 13] = 5  # corrupt a zero-shift staircase identity
        code = expand_qc(B, 27, name="corrupt")
        good = wifi.make_code(648, "1/2")
        assert not np.array_equal(code.h_dense(), good.h_dense())
        nz = np.nonzero(B[:, 13] >= 0)[0]
        assert not np.all(B[nz, 13] == 0)  # structure check fires


class TestLayout:
    @pytest.mark.parametrize("make", [lambda: toy_qc(4),
                                      lambda: wifi.make_code(648, "1/2"),
                                      lambda: wifi.make_code(648, "5/6")])
    def test_edge_layout_roundtrip(self, make):
        code = make()
        lay = compile_edge_layout(code)
        assert lay.E == code.num_edges
        # cn_edges gathers back exactly the adjacency
        for c in range(code.m):
            d = len(code.cn_adj[c])
            es = lay.cn_edges[c, :d]
            assert np.array_equal(lay.edge_vn[es], code.cn_adj[c])
            assert np.all(lay.cn_edges[c, d:] == lay.E)
        # every edge appears exactly once in vn_edges
        flat = lay.vn_edges[lay.vn_mask]
        assert sorted(flat.tolist()) == list(range(lay.E))
        # vn_edges rows point to edges of that vn
        for v in range(code.n):
            es = lay.vn_edges[v][lay.vn_mask[v]]
            assert np.all(lay.edge_vn[es] == v)

    def test_qc_layout(self):
        code = wifi.make_code(648, "1/2")
        qc = compile_qc_layout(code)
        assert qc.Z == 27 and qc.mb == 12 and qc.nb == 24
        B = wifi.base_matrix(648, "1/2")
        # reconstruct adjacency of check (i, r) from the layer view
        for i in range(qc.mb):
            for t in range(qc.max_row_deg):
                if not qc.layer_mask[i, t]:
                    assert qc.layer_cols[i, t] == -1
                    continue
                j, s = qc.layer_cols[i, t], qc.layer_shifts[i, t]
                assert B[i, j] == s
                for r in (0, qc.Z - 1):
                    v = j * qc.Z + (r + s) % qc.Z
                    assert v in code.cn_adj[i * qc.Z + r]


def test_syndrome_vectorized_matches_loop():
    # The reduceat fast path (round 4) vs the definitional loop, including
    # degree-0 checks (reduceat cannot represent empty segments natively)
    # and batched leading axes.
    rng = np.random.default_rng(3)
    cn = [np.sort(rng.choice(40, size=int(rng.integers(2, 7)),
                             replace=False)).astype(np.int32)
          for _ in range(15)]
    cn.insert(3, np.zeros(0, np.int32))
    cn.append(np.zeros(0, np.int32))
    code = LDPCCode(name="t", n=40, m=17, k=23, cn_adj=cn)
    bits = rng.integers(0, 2, (5, 40)).astype(np.uint8)
    ref = np.zeros((5, 17), np.uint8)
    for c, vs in enumerate(cn):
        if len(vs):
            ref[:, c] = np.bitwise_xor.reduce(bits[:, vs], axis=-1)
    assert (code.syndrome(bits) == ref).all()
    assert (code.syndrome(bits[2]) == ref[2]).all()
