"""Microbenchmark: circulant-rotation cost by memory layout (real TPU).

Answers the round-2 kernel-design question: how much of the VMEM decoder's
sweep time is misaligned sublane movement? Two layouts for the same logical
(Z=27, batch) state:

  flat: (Z, Bt)        — batch on lanes, Z on sublanes (round-1 kernel).
        A rotation by s slices at sublane offset s (27 % 8 != 0): Mosaic
        must shuffle across vreg rows.
  vreg: (Z, Bs, 128)   — each Z-row is Bs/8 full vregs; a rotation is a
        pair of vreg-ALIGNED slices, i.e. pure addressing.

Variants (select by argv[1]):
  flat_rot / flat_base : gather-rotate-accumulate sweep vs same without
                         rotation (delta = rotation cost), flat layout
  vreg_rot / vreg_base : same pair, vreg layout
  flat_minsum / vreg_minsum : the FULL flooding min-sum sweep (gather,
                         CN min1/min2/sign, emit+accumulate) per layout —
                         direct prediction of kernel-v2 per-iteration time
  int16     : retest packed int16 vector compute legality (maxsi/abs/
              select miscompiled in round 1) — prints PASS/FAIL + values

Prints one JSON line per run: {variant, us_per_sweep, ns_per_kelem, ...}.
"""
import json
import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")
from ldpc_tpu.codes.ieee80211n import make_code  # noqa: E402
from ldpc_tpu.codes.layout import compile_qc_layout  # noqa: E402
from ldpc_tpu.utils.profiling import timed  # noqa: E402

ITERS = 500
Z = 27
NB = 24


def entries_648():
    qc = compile_qc_layout(make_code(648, "1/2"))
    ents = []
    for i in range(qc.mb):
        for t in range(qc.max_row_deg):
            if qc.layer_mask[i, t]:
                ents.append((int(qc.layer_cols[i, t]),
                             int(qc.layer_shifts[i, t])))
    return ents  # 88 (col, shift) pairs


ENTS = entries_648()


def rot_flat(x, s):
    if s == 0:
        return x
    return jnp.concatenate([x[s:], x[:s]], axis=0)


# ---- gather+accumulate sweeps (rotation cost isolation) ----

def make_sweep(shape3, use_rot, iters=500):
    """dst[j] = sum over entries rot(src[j], s); ping-pong buffers."""
    def kernel(chan_ref, out_ref, a_ref, b_ref):
        for j in range(NB):
            a_ref[j] = chan_ref[j].astype(jnp.int32)

        def sweep(src, dst):
            for j in range(NB):
                dst[j] = chan_ref[j].astype(jnp.int32)
            for (j, s) in ENTS:
                r = rot_flat(src[j], s if use_rot else 0)
                dst[j] = dst[j] + r

        def body(i, _):
            sweep(a_ref, b_ref)
            sweep(b_ref, a_ref)
            return 0

        jax.lax.fori_loop(0, iters // 2, body, 0)
        for j in range(NB):
            out_ref[j] = a_ref[j].astype(jnp.int8)

    full = (NB,) + shape3
    def run(chan):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(full, jnp.int8),
            scratch_shapes=[pltpu.VMEM(full, jnp.int32),
                            pltpu.VMEM(full, jnp.int32)],
        )(chan)
    return jax.jit(run), full


# ---- full flooding min-sum sweep (both layouts) ----

def make_minsum(shape3, qmax=127, c2v_dtype=None, vmem_mb=None, iters=500):
    ND = len(ENTS)
    c2v_dtype = c2v_dtype or jnp.int32
    def kernel(chan_ref, out_ref, a_ref, b_ref, c2v_ref):
        for j in range(NB):
            a_ref[j] = chan_ref[j].astype(jnp.int32)
        c2v_ref[...] = jnp.zeros(c2v_ref.shape, c2v_ref.dtype)

        def sweep(src, dst):
            for j in range(NB):
                dst[j] = chan_ref[j].astype(jnp.int32)
            # one flooding CN sweep, 8 layers x ~11 entries merged as the
            # real kernel does (per-layer minsum over row entries)
            off = 0
            from ldpc_tpu.codes.layout import compile_qc_layout
            # layers: group ENTS by base row (11 rows of ~8? n648: 12 rows)
            # reconstruct rows statically:
            qc_rows = ROWS
            for ents in qc_rows:
                v2cs, olds = [], []
                for (j, s) in ents:
                    e = EIDX[(j, s)]
                    old = c2v_ref[e].astype(jnp.int32)
                    rolled = rot_flat(src[j], s)
                    v2cs.append(jnp.clip(rolled - old, -qmax, qmax))
                    olds.append(old)
                mags = [jnp.abs(v) for v in v2cs]
                min1 = mags[0]
                min2 = jnp.full_like(min1, jnp.array(1 << 14, jnp.int32))
                negacc = v2cs[0]
                for t in range(1, len(v2cs)):
                    m = mags[t]
                    min2 = jnp.minimum(min2, jnp.maximum(min1, m))
                    min1 = jnp.minimum(min1, m)
                    negacc = negacc ^ v2cs[t]   # bit31 = sign parity
                for (j, s), v, m in zip(ents, v2cs, mags):
                    e = EIDX[(j, s)]
                    mag = jnp.where(m == min1, min2, min1)
                    t2 = negacc ^ v             # bit31 = parity excl. self
                    new = jnp.where(t2 < 0, -mag, mag)
                    c2v_ref[e] = new.astype(c2v_ref.dtype)
                    sb = Z - s
                    r = rot_flat(new, sb % Z)
                    dst[j] = dst[j] + r

        def body(i, _):
            sweep(a_ref, b_ref)
            sweep(b_ref, a_ref)
            return 0

        jax.lax.fori_loop(0, iters // 2, body, 0)
        for j in range(NB):
            out_ref[j] = a_ref[j].astype(jnp.int8)

    full = (NB,) + shape3
    c2v_full = (ND,) + shape3
    params = {}
    if vmem_mb:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=vmem_mb * 2**20)
    def run(chan):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(full, jnp.int8),
            scratch_shapes=[pltpu.VMEM(full, jnp.int32),
                            pltpu.VMEM(full, jnp.int32),
                            pltpu.VMEM(c2v_full, c2v_dtype)],
            **params,
        )(chan)
    return jax.jit(run), full


# rows for minsum variant
from ldpc_tpu.codes.layout import compile_qc_layout as _cql  # noqa: E402
_qc = _cql(make_code(648, "1/2"))
ROWS = []
EIDX = {}
_e = 0
for _i in range(_qc.mb):
    row = []
    for _t in range(_qc.max_row_deg):
        if _qc.layer_mask[_i, _t]:
            pair = (int(_qc.layer_cols[_i, _t]), int(_qc.layer_shifts[_i, _t]))
            row.append(pair)
            EIDX[pair] = _e
            _e += 1
    ROWS.append(row)


def int16_test():
    """Round-1 failure: maxsi/abs/select on vector<...xi16> miscompiled."""
    def kernel(a_ref, b_ref, o_ref):
        a = a_ref[...]
        b = b_ref[...]
        m = jnp.maximum(a, b)
        ab = jnp.abs(a)
        sel = jnp.where(a < b, m, ab)
        o_ref[...] = jnp.minimum(sel, jnp.maximum(a, jnp.int16(3)))

    rng = np.random.default_rng(0)
    a = rng.integers(-120, 120, size=(64, 256)).astype(np.int16)
    b = rng.integers(-120, 120, size=(64, 256)).astype(np.int16)
    out = pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(a.shape, jnp.int16),
    )(a, b)
    ref = np.minimum(np.where(a < b, np.maximum(a, b), np.abs(a)),
                     np.maximum(a, np.int16(3)))
    ok = np.array_equal(np.asarray(out), ref)
    print(json.dumps({"variant": "int16", "pass": bool(ok)}))
    if not ok:
        bad = np.nonzero(np.asarray(out) != ref)
        print(f"# first mismatches at {bad[0][:5]},{bad[1][:5]}",
              file=sys.stderr)


def fetch_timed(fn, chan, reps=4, trials=4):
    """Seconds per call, synced by HOST FETCH (block_until_ready does not
    reliably block on the tunneled axon platform — bench.py methodology)."""
    import time
    np.asarray(fn(chan))  # compile + warm
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            out = fn(chan)
        np.asarray(out)  # forces the whole queued burst to completion
        best = min(best, (time.time() - t0) / reps)
    return best


def make_opchain(shape, n_ops, iters=200):
    """Dependent elementwise int32 op chain on one operand shape.

    Isolates Mosaic PER-OP overhead vs per-element cost: running the same
    total element-ops as fewer ops on a taller operand (Z, 2Z, 4Z rows)
    tells whether stacking independent layers into one op would pay in the
    decoder sweep (ns/kelem/op should FALL with operand size if per-op
    issue overhead is significant)."""
    def kernel(x_ref, o_ref, a_ref, b_ref):
        a_ref[...] = x_ref[...].astype(jnp.int32)
        b_ref[...] = a_ref[...] ^ jnp.array(11, jnp.int32)

        def body(i, _):
            a = a_ref[...]
            b = b_ref[...]
            for _ in range(n_ops // 4):
                a = jnp.abs(b - a)
                b = jnp.minimum(b, jnp.maximum(a, b ^ a))
            a_ref[...] = a
            b_ref[...] = b
            return 0

        jax.lax.fori_loop(0, iters, body, 0)
        o_ref[...] = a_ref[...].astype(jnp.int8)

    def run(x):
        return pl.pallas_call(
            kernel,
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct(shape, jnp.int8),
            scratch_shapes=[pltpu.VMEM(shape, jnp.int32),
                            pltpu.VMEM(shape, jnp.int32)],
        )(x)
    return jax.jit(run)


def opshape_test():
    """Same TOTAL element-ops at three operand heights; prints ns/kelem/op."""
    rng = np.random.default_rng(0)
    for rows, n_ops in ((Z, 64), (2 * Z, 32), (4 * Z, 16)):
        shape = (rows, 512)
        # Slope needs the iteration DELTA to dwarf the tunnel's bursty
        # 10-200 ms dispatch noise: ~0.7 us/iter here, so 60k extra iters
        # puts the delta at ~40 ms (the 100-vs-400 first attempt measured
        # noise and returned negative slopes).
        f1 = make_opchain(shape, n_ops, iters=20000)
        f2 = make_opchain(shape, n_ops, iters=80000)
        x = jnp.asarray(rng.integers(-100, 100, size=shape).astype(np.int8))
        t1 = fetch_timed(f1, x)
        t2 = fetch_timed(f2, x)
        per_iter = (t2 - t1) / 60000
        kelem = rows * 512 / 1000.0
        print(json.dumps({
            "variant": f"opshape_{rows}x512", "ops_per_iter": n_ops,
            "us_per_iter": round(per_iter * 1e6, 3),
            "ns_per_kelem_per_op": round(per_iter * 1e9 / kelem / n_ops, 4),
        }), flush=True)


def main():
    variant = sys.argv[1]
    if variant == "int16":
        int16_test()
        return
    if variant == "opshape":
        opshape_test()
        return
    layout, kind = variant.split("_", 1)
    if layout == "flat":
        shape3, bt = (Z, 512), 512
    else:
        shape3, bt = (Z, 8, 128), 1024
    I1, I2 = 200, 800

    def build(iters):
        if kind in ("rot", "base"):
            return make_sweep(shape3, use_rot=(kind == "rot"), iters=iters)
        if kind == "minsum":
            return make_minsum(shape3, iters=iters)
        if kind == "minsum16":
            return make_minsum(shape3, c2v_dtype=jnp.int16, iters=iters)
        if kind == "minsum32v":
            return make_minsum(shape3, c2v_dtype=jnp.int32, vmem_mb=32,
                               iters=iters)
        raise ValueError(kind)

    rng = np.random.default_rng(0)
    f1, full = build(I1)
    f2, _ = build(I2)
    chan = jnp.asarray(rng.integers(-100, 100, size=full).astype(np.int8))
    t1 = fetch_timed(f1, chan)
    t2 = fetch_timed(f2, chan)
    us_per_sweep = (t2 - t1) / (I2 - I1) * 1e6
    kelem = NB * Z * bt / 1000.0
    print(json.dumps({
        "variant": variant, "batch_tile": bt,
        "t_small_ms": round(t1 * 1e3, 3), "t_big_ms": round(t2 * 1e3, 3),
        "us_per_sweep": round(us_per_sweep, 3),
        "ns_per_kelem": round(us_per_sweep * 1000 / kelem, 3),
    }))


if __name__ == "__main__":
    main()
