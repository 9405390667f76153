"""MacKay alist IO (codes/alist.py) — round-trip, validation, and the
full simulation path on a loaded (unstructured) code.

The reference class loads H from alist-style row/col adjacency files
(SURVEY.md §2.1 C1); a migrating user's own .alist files must work
through the whole stack: dense systematic encoder, general edge-gather
decoder, sweep driver, CLI.
"""
import subprocess
import sys

import numpy as np
import pytest

from ldpc_tpu.codes.alist import read_alist, write_alist
from ldpc_tpu.codes.ieee80211n import make_code
from ldpc_tpu.codes.toy import hamming74


def _eq_adj(a, b):
    assert a.n == b.n and a.m == b.m and a.k == b.k
    for x, y in zip(a.cn_adj, b.cn_adj):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_roundtrip_wifi648(tmp_path):
    code = make_code(648, "1/2")
    p = str(tmp_path / "wifi648.alist")
    write_alist(code, p)
    loaded = read_alist(p)
    _eq_adj(code, loaded)
    assert loaded.Z is None  # loaded codes are unstructured by design


def test_roundtrip_hamming(tmp_path):
    code = hamming74()
    p = str(tmp_path / "h74.alist")
    write_alist(code, p)
    loaded = read_alist(p)
    _eq_adj(code, loaded)


@pytest.mark.parametrize("mutate, match", [
    (lambda t: t[:-20], "truncated"),
    (lambda t: t.replace(t.split("\n")[0], "7 0", 1), "bad dimensions"),
])
def test_malformed_rejected(tmp_path, mutate, match):
    p = str(tmp_path / "h.alist")
    write_alist(hamming74(), p)
    text = open(p).read()
    open(p, "w").write(mutate(text))
    with pytest.raises(ValueError, match=match):
        read_alist(p)


def test_degree_sum_mismatch_rejected(tmp_path):
    p = str(tmp_path / "h.alist")
    write_alist(hamming74(), p)
    lines = open(p).read().split("\n")
    cols = lines[2].split()
    cols[0] = str(int(cols[0]) + 1)  # inflate one column degree
    lines[2] = " ".join(cols)
    open(p, "w").write("\n".join(lines))
    with pytest.raises(ValueError, match="degrees sum|bad column"):
        read_alist(p)


def test_rank_deficient_rejected(tmp_path):
    code = hamming74()
    p = str(tmp_path / "h.alist")
    # duplicate the last check -> dependent row
    dup = type(code)(name="dup", n=code.n, m=code.m + 1, k=code.k,
                     cn_adj=list(code.cn_adj) + [code.cn_adj[-1]])
    write_alist(dup, p)
    with pytest.raises(ValueError, match="rank-deficient"):
        read_alist(p)


def test_sweep_on_loaded_code(tmp_path):
    """build_code(family=alist) -> encode/decode/sweep end-to-end."""
    import dataclasses

    from ldpc_tpu.config import PRESETS
    from ldpc_tpu.sim import Sweep, build_code

    p = str(tmp_path / "wifi648.alist")
    write_alist(make_code(648, "1/2"), p)
    cfg = PRESETS["wifi-648-r12-minsum"]
    cfg = dataclasses.replace(
        cfg,
        code=dataclasses.replace(cfg.code, family="alist", path=p),
        run=dataclasses.replace(cfg.run, batch=256, max_frames=256,
                                target_frame_errors=10 ** 9),
        decoder=dataclasses.replace(cfg.decoder, max_iter=5),
    )
    code = build_code(cfg)
    assert (code.n, code.k) == (648, 324)
    res = Sweep(cfg).run([2.0])
    row = res.rows()[0]
    assert row["frames"] == 256
    assert 0.0 <= row["ber"] < 0.5


def test_cli_export_and_sweep(tmp_path):
    out = tmp_path / "alists"
    r = subprocess.run(
        [sys.executable, "-m", "ldpc_tpu.cli", "codes",
         "--export-alist", str(out)],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr
    files = sorted(out.glob("*.alist"))
    assert len(files) == 12
    loaded = read_alist(str(files[0]))
    assert loaded.n in (648, 1296, 1944)


def test_gf2_rank_same_word_columns():
    """Round-2 review finding: fancy-indexed |= dropped all but one bit per
    64-bit word, so checks with two variables in the same 64-aligned block
    lost edges and valid full-rank files were rejected."""
    from ldpc_tpu.codes.alist import _gf2_rank

    adj = [np.array(a, np.int64) for a in ([0, 1], [1, 2], [2])]
    assert _gf2_rank(adj, 3) == 3
    # and the Hamming(7,4) H (all columns inside one word) keeps rank 3
    code = hamming74()
    assert _gf2_rank([np.asarray(r, np.int64) for r in code.cn_adj], 7) == 3


def test_duplicate_adjacency_rejected(tmp_path):
    """A doubled edge GF(2)-cancels in H but doubles a Tanner edge — the
    loader must reject it, not silently decode on a different graph."""
    # n=4, m=2; row 1 = {1, 1} (duplicate, declared degree 2), row 2 = {2};
    # column 1 lists rows {1, 1} consistently, so only the strict-increase
    # check can catch it.
    txt = "\n".join([
        "4 2", "2 2",
        "2 1 0 0",                    # dv per column
        "2 1",                        # dc per row
        "1 1", "2 0", "0 0", "0 0",   # column lists
        "1 1", "2 0",                 # row lists
    ]) + "\n"
    p = tmp_path / "dup.alist"
    p.write_text(txt)
    with pytest.raises(ValueError, match="adjacency"):
        read_alist(str(p))
