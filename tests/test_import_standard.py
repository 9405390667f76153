"""One-command exact-table swap-in (codes/imported.py + CLI
import-standard, round 5).

The three remaining parity partials (802.11n repaired tables, generated
NR/DVB-S2 shifts) are standards-DATA gaps; this seam makes the eventual
swap a validated one-command operation. Tests: a synthetic "standard"
table (the repo's own table re-exported) round-trips through validation
+ registry and flips the family builder to standard_exact=True; a
corrupted table (injected 4-cycle / wrong shape / broken profile) is
rejected; removal restores the generated fallback."""
import json

import numpy as np
import pytest

from ldpc_tpu.codes import imported as imp
from ldpc_tpu.codes.ieee80211n import is_standard_exact
from ldpc_tpu.codes.ieee80211n import make_code as make_wifi


@pytest.fixture()
def registry(tmp_path, monkeypatch):
    monkeypatch.setenv("LDPC_TPU_TABLES", str(tmp_path))
    yield tmp_path


def _wifi_like():
    # one of the three girth-repaired '_like' tables
    code = make_wifi(648, "3/4")
    assert not code.standard_exact
    return code


class TestValidate:
    def test_roundtrip_own_table_passes(self, registry):
        c = _wifi_like()
        rep = imp.validate_table("ieee80211n", c.Z, c.base, n=648,
                                 rate="3/4")
        assert rep["rank"] == c.m and rep["girth"] >= 6

    def test_validation_reference_not_launderable(self, registry):
        # validate_table compares against the PINNED in-repo table, so a
        # previously stored registry entry cannot become the yardstick:
        # store a table, then a profile-breaking candidate still rejects
        c = _wifi_like()
        imp.store("ieee80211n", "n648_r34", c.Z, c.base)
        b = c.base.copy()
        on = tuple(np.argwhere(b >= 0)[0])
        off = tuple(np.argwhere(b < 0)[0])
        b[off] = b[on]
        b[on] = -1
        with pytest.raises(ValueError, match="profile"):
            imp.validate_table("ieee80211n", c.Z, b, n=648, rate="3/4")

    def test_four_cycle_rejected(self, registry):
        c = _wifi_like()
        b = c.base.copy()
        # close a 4-cycle: s[r1,j1] - s[r1,j2] + s[r2,j2] - s[r2,j1] = 0
        rs = np.argwhere(b >= 0)
        for (r1, j1) in rs:
            hit = False
            for (r2, j2) in rs:
                if (r2 > r1 and j2 != j1 and b[r1, j2] >= 0
                        and b[r2, j1] >= 0 and b[r2, j2] >= 0):
                    b[r2, j2] = (b[r1, j2] - b[r1, j1] + b[r2, j1]) % c.Z
                    hit = True
                    break
            if hit:
                break
        with pytest.raises(ValueError, match="girth"):
            imp.validate_table("ieee80211n", c.Z, b, n=648, rate="3/4")

    def test_wrong_shape_rejected(self, registry):
        c = _wifi_like()
        with pytest.raises(ValueError, match="shape|profile"):
            imp.validate_table("ieee80211n", c.Z, c.base[:, :-1], n=648,
                               rate="3/4")

    def test_profile_change_rejected(self, registry):
        c = _wifi_like()
        b = c.base.copy()
        # move an edge: breaks the published degree profile
        on = tuple(np.argwhere(b >= 0)[0])
        off = tuple(np.argwhere(b < 0)[0])
        b[off] = b[on]
        b[on] = -1
        with pytest.raises(ValueError, match="profile"):
            imp.validate_table("ieee80211n", c.Z, b, n=648, rate="3/4")

    def test_shift_range_rejected(self, registry):
        c = _wifi_like()
        b = c.base.copy()
        b[np.argwhere(b >= 0)[0][0], np.argwhere(b >= 0)[0][1]] = c.Z
        with pytest.raises(ValueError, match="range"):
            imp.validate_table("ieee80211n", c.Z, b, n=648, rate="3/4")


class TestRegistrySwap:
    def test_store_flips_builder_to_exact(self, registry):
        c = _wifi_like()
        imp.store("ieee80211n", "n648_r34", c.Z, c.base)
        c2 = make_wifi(648, "3/4")
        assert c2.standard_exact and c2.name.endswith("_std")
        # the predicate agrees with the builder (registry-aware)
        assert is_standard_exact(648, "3/4")
        # graph identical (we imported the same table)
        assert all(np.array_equal(a, b)
                   for a, b in zip(c.cn_adj, c2.cn_adj))
        assert imp.remove("ieee80211n", "n648_r34")
        c3 = make_wifi(648, "3/4")
        assert not c3.standard_exact
        assert not is_standard_exact(648, "3/4")

    def test_nr_full_graph_swap(self, registry):
        # registry consulted UNCACHED: store()/remove() take effect in the
        # same process with no cache_clear gymnastics (advisor round-5)
        from ldpc_tpu.codes.nr_bg import full_graph, make_code as make_nr
        g = full_graph(2, 52)
        imp.store("5gnr", "bg2_z52", 52, g.base)
        g2 = full_graph(2, 52)
        assert g2.standard_exact and g2.name.endswith("_std")
        code = make_nr(2, 52, rate="1/3")
        assert code.standard_exact and code.name.endswith("_std")
        imp.remove("5gnr", "bg2_z52")
        assert not full_graph(2, 52).standard_exact

    def test_smoke_decode_catches_broken_table(self, registry):
        # an all-shift-zero table of the right profile: rank collapses
        # before smoke, so smoke needs a structurally-valid but weak
        # code — instead verify smoke PASSES the real table (positive
        # path; the operating point is rate-aware)
        c = _wifi_like()
        rep = imp.smoke_decode(c.Z, c.base, frames=64)
        assert rep["ber"] <= rep["uncoded_ber"] / 10.0


class TestCLI:
    def test_import_and_remove(self, registry, tmp_path):
        from ldpc_tpu.cli import main
        c = _wifi_like()
        p = tmp_path / "tab.json"
        json.dump({"Z": c.Z, "base": c.base.tolist()}, open(p, "w"))
        rc = main(["import-standard", "--family", "ieee80211n",
                   "--n", "648", "--rate", "3/4", "--file", str(p),
                   "--no-smoke"])
        assert rc == 0
        assert make_wifi(648, "3/4").standard_exact
        rc = main(["import-standard", "--family", "ieee80211n",
                   "--n", "648", "--rate", "3/4", "--remove"])
        assert rc == 0
        assert not make_wifi(648, "3/4").standard_exact

    def test_text_grid_format(self, registry, tmp_path):
        c = _wifi_like()
        p = tmp_path / "tab.txt"
        with open(p, "w") as f:
            for row in c.base:
                f.write(" ".join("-" if s < 0 else str(int(s))
                                 for s in row) + "\n")
        Z, base = imp.parse_table_file(str(p))
        assert Z is None and np.array_equal(base, c.base)
