"""Exact connected trapping/absorbing-set enumeration (csrc/as_enum.c via
analysis/asenum.py).

Oracles: (1) brute-force Python enumeration over all subsets of a small
toy code (connectivity by BFS, (a, b) by GF(2) syndrome) — the C ESU
enumerator must match COUNTS exactly, class by class; (2) the existing
pure-NumPy is_absorbing on every emitted set; (3) prefix consistency —
a_max=k results must be the exact prefix of a_max=k+1 results (prune
soundness); (4) the published 802.11n n=648 structure (round-4 finding:
27 absorbing (6,2) sets, none below a=6 — the greedy census had reported
zero, the instrument gap this module closes)."""
import itertools

import numpy as np
import pytest

from ldpc_tpu.analysis.asenum import (
    absorbing_spectrum_key,
    enumerate_sets,
    exact_absorbing_census,
)
from ldpc_tpu.analysis.trapping import classify, is_absorbing
from ldpc_tpu.codes.ieee80211n import make_code as make_wifi
from ldpc_tpu.codes.toy import toy_qc


@pytest.fixture(scope="module")
def toy():
    return toy_qc(4)  # n=24, m=12 — small enough for brute force


@pytest.fixture(scope="module")
def wifi648():
    return make_wifi(648, "1/2")


def _brute_counts(code, a_max, b_max):
    adj = [set() for _ in range(code.n)]
    for c in range(code.m):
        vs = list(map(int, code.cn_adj[c]))
        for x in vs:
            for y in vs:
                if x != y:
                    adj[x].add(y)

    def connected(S):
        S = set(S)
        start = next(iter(S))
        seen = {start}
        st = [start]
        while st:
            v = st.pop()
            for u in adj[v] & S:
                if u not in seen:
                    seen.add(u)
                    st.append(u)
        return seen == S

    cnt = np.zeros((a_max + 1, b_max + 1), np.int64)
    acnt = np.zeros((a_max + 1, b_max + 1), np.int64)
    for a in range(1, a_max + 1):
        for S in itertools.combinations(range(code.n), a):
            if not connected(S):
                continue
            aa, b = classify(code, S)
            if b <= b_max:
                cnt[aa, b] += 1
                if is_absorbing(code, S):
                    acnt[aa, b] += 1
    return cnt, acnt


class TestBruteForce:
    def test_counts_match_brute_force(self, toy):
        a_max, b_max = 4, 3
        res = enumerate_sets(toy, a_max=a_max, b_max=b_max,
                             emit_min_a=1, emit_cap=100000)
        cnt, acnt = _brute_counts(toy, a_max, b_max)
        np.testing.assert_array_equal(res.class_counts, cnt)
        np.testing.assert_array_equal(res.absorb_counts, acnt)
        assert not res.emit_truncated

    def test_absorbing_flags_agree(self, toy):
        res = enumerate_sets(toy, a_max=4, b_max=3, emit_min_a=1,
                             emit_cap=100000)
        assert res.sets, "nothing emitted"
        for (a, b, absb, S) in res.sets:
            assert classify(toy, S) == (a, b)
            assert is_absorbing(toy, S) == absb

    def test_emission_no_duplicates(self, toy):
        res = enumerate_sets(toy, a_max=4, b_max=3, emit_min_a=1,
                             emit_cap=100000)
        keys = [frozenset(S) for (_, _, _, S) in res.sets]
        assert len(keys) == len(set(keys))  # ESU: each set exactly once


class TestConsistency:
    def test_prefix_consistency(self, toy):
        # counts at a <= k must be identical whether a_max is k or k+2
        # (prune soundness: the size budget may only grow the tally)
        r4 = enumerate_sets(toy, a_max=4, b_max=3, emit_min_a=99,
                            emit_cap=1)
        r6 = enumerate_sets(toy, a_max=6, b_max=3, emit_min_a=99,
                            emit_cap=1)
        np.testing.assert_array_equal(r6.class_counts[:5], r4.class_counts)
        np.testing.assert_array_equal(r6.absorb_counts[:5],
                                      r4.absorb_counts)

    def test_emit_cap_truncates_list_not_counts(self, toy):
        full = enumerate_sets(toy, a_max=4, b_max=3, emit_min_a=1,
                              emit_cap=100000)
        capped = enumerate_sets(toy, a_max=4, b_max=3, emit_min_a=1,
                                emit_cap=3)
        assert capped.emit_truncated and len(capped.sets) == 3
        np.testing.assert_array_equal(capped.class_counts,
                                      full.class_counts)

    def test_param_validation(self, toy):
        with pytest.raises(ValueError):
            enumerate_sets(toy, a_max=0)
        with pytest.raises(ValueError):
            enumerate_sets(toy, a_max=4, b_max=-1)


class TestWifi648:
    def test_standard_absorbing_spectrum(self, wifi648):
        """The round-4 headline: the standard table's smallest absorbing
        sets are the 27 (6,2)s (mixed info/parity structure) — NOTHING
        below a=6 — where the greedy census reported zero everywhere."""
        res = enumerate_sets(wifi648, a_max=6, b_max=2, dv_cap=3,
                             emit_min_a=6, emit_cap=256)
        assert int(res.absorb_counts[:6].sum()) == 0
        assert int(res.absorb_counts[6, 2]) == 27
        # the emitted sets are genuine absorbing sets of the full graph
        ab = [(a, b, S) for (a, b, f, S) in res.sets if f]
        assert len(ab) == 27
        for a, b, S in ab:
            assert classify(wifi648, S) == (6, 2)
            assert is_absorbing(wifi648, S)

    def test_dv_cap_scope_reporting(self, wifi648):
        res = enumerate_sets(wifi648, a_max=6, b_max=2, dv_cap=3,
                             emit_min_a=99, emit_cap=1)
        assert res.n_allowed == 567  # 297 deg-2 + 270 deg-3; 81 hubs out
        assert res.hub_floor == 12 - 2 * (6 - 1)

    def test_staircase_chain_counts(self, wifi648):
        # the dual-diagonal staircase contributes the classic (L, 2)
        # chain TRAPPING sets; closed form: Z * (mb - L) for chains of L
        # consecutive staircase columns (mb=12 parity blocks, Z=27) plus
        # boundary variants — assert the exact enumerator sees the (a,2)
        # classes the round-4 DVB study seeded structurally
        res = enumerate_sets(wifi648, a_max=5, b_max=2, dv_cap=3,
                             emit_min_a=99, emit_cap=1)
        for a in range(2, 6):
            assert int(res.class_counts[a, 2]) >= 27 * (12 - a)


class TestSeedSelectionIntegration:
    def test_census_and_key(self, toy):
        c = exact_absorbing_census(toy, a_max=4, b_max=3, dv_cap=0)
        assert set(c) == {"key", "total", "classes", "a_max", "b_max",
                          "dv_cap"}
        assert len(c["key"]) == 4 * 4  # a in 1..4, b in 0..3
        assert c["total"] == sum(c["classes"].values())

    def test_spectrum_key_orders_small_first(self):
        # a synthetic comparison: one (5,3) set must outweigh many (6,2)s
        import dataclasses

        from ldpc_tpu.analysis.asenum import EnumResult
        base = dict(a_max=6, b_max=3, dv_cap=3, sets=[], nodes_visited=0,
                    n_allowed=0, hub_floor=0.0, emit_truncated=False,
                    class_counts=np.zeros((7, 4), np.int64))
        x = np.zeros((7, 4), np.int64)
        x[5, 3] = 1
        bad = EnumResult(absorb_counts=x, **base)
        y = np.zeros((7, 4), np.int64)
        y[6, 2] = 100
        better = EnumResult(absorb_counts=y, **base)
        assert absorbing_spectrum_key(better) < absorbing_spectrum_key(bad)

    @pytest.mark.slow
    def test_qc_peg_best_uses_exact_census(self):
        from ldpc_tpu.codes.peg import qc_peg_best
        code, table = qc_peg_best(kb=4, cb=4, Z=8,
                                  col_degrees=np.asarray([3, 3, 3, 3]),
                                  n_seeds=2)
        assert len(table) == 2
        for row in table:
            assert "absorbing_classes" in row
            assert row["absorbing"] == sum(
                row["absorbing_classes"].values())
        assert code.n == 64


class TestDVBS2Census:
    @pytest.mark.slow
    def test_accumulator_chains_and_smallest_absorbing(self):
        """DVB-S2 n=64800 r=1/2 (round 4): the exhaustive census confirms
        the round-4 structural seeding — at b <= 2 the ONLY small sets
        are the accumulator staircase (L, 2) chains (arithmetic counts
        32040 - 360(L-1)), with zero absorbing sets; the smallest
        absorbing sets in the graph are one QC orbit of 360 (7,3)s
        (results/dvb_census.json)."""
        from ldpc_tpu.codes.dvbs2 import make_code
        code = make_code(n=64800, rate="1/2")
        r = enumerate_sets(code, a_max=5, b_max=2, dv_cap=3,
                           emit_min_a=99, emit_cap=1)
        for L in range(1, 6):
            assert int(r.class_counts[L, 2]) == 32040 - 360 * (L - 1)
        assert int(r.absorb_counts.sum()) == 0
