"""Pallas TPU kernels: batched fixed-point min-sum / offset-min-sum decoding.

This is the framework's native hot loop — the TPU-first replacement for the
reference's sequential C message-passing loop (BASELINE.json:5 'the sequential
message-passing loop ... fixed-point saturation arithmetic'). The reference
walks checks one at a time on a CPU; here one kernel instance decodes a full
batch tile, with

  * batch on the VPU lane axis (128 lanes — batch >= 128 always holds for the
    Monte-Carlo workload, SURVEY.md §7.3 item 1),
  * the QC lifting dimension Z on the sublane axis, so one base-matrix entry
    is one (Z, B_tile) vector op and the Z checks of a layer run in lockstep,
  * circulant shifts realized as static sublane rotations (compile-time
    constants from the base matrix — no gathers in the inner loop),
  * all decoder state (int32 posteriors, int8 c2v messages) VMEM-resident;
    only channel LLRs in and hard bits out touch HBM,
  * the base-graph entry loops fully unrolled at trace time (<= ~90 entries
    for 802.11n), so Mosaic sees straight-line vector code per iteration.

Bit-exactness contract: both schedules must match ldpc_tpu.golden.decoder
.decode_fixed exactly on identical int8 inputs (SURVEY.md §3.4/§4.2) —
min-sum over integers is deterministic, so tests assert equality, not
tolerance. Semantics pinned by the golden model:

  * v2c = clip(post - c2v_old, -qmax, +qmax)  (flooding: post = iteration
    totals; layered: running posterior, all checks of a layer reading the
    pre-layer value — guaranteed here because each layer touches every base
    column at most once, asserted by codes/layout.py),
  * CN: c2v = signprod * sign(v2c) * max(minmag_excl - beta, 0); ties in the
    magnitude argmin resolve to the first entry (stable), matching golden,
  * sign(0) = +1; posteriors accumulate exactly in int32 (|post| <=
    qmax*(dv+1) — the golden model's exact-accumulation contract),
  * hard bit = 1 iff posterior < 0; early termination LATCHES a lane's
    outputs (hard bits, iteration count) at its first syndrome success while
    the datapath runs unmasked — bit-identical to the golden per-codeword
    stop because lanes are independent.
"""
from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..codes.code import LDPCCode
from ..codes.layout import compile_qc_layout
from ..config import DecoderConfig, QuantConfig

_I32 = jnp.int32
# Compute dtype is int32: this Mosaic toolchain miscompiles packed-int16
# vector compute (maxsi/abs/select on vector<...xi16> fail to legalize), so
# messages are stored int8 in VMEM and widened to int32 for arithmetic.
_C = jnp.int32


def _rot_fwd(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """y[r] = x[(r + s) % Z] along axis 0 (static s): gather the circulant.

    Static-slice concatenate beats pltpu.roll by ~1.4x on this toolchain
    (measured n=648 flooding: 7.4 ms vs 10.5 ms per 16k batch)."""
    if s == 0:
        return x
    return jnp.concatenate([x[s:], x[:s]], axis=0)


def _rot_bwd(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Inverse rotation: y[(r + s) % Z] = x[r]."""
    if s == 0:
        return x
    return jnp.concatenate([x[-s:], x[:-s]], axis=0)


def _qc_entries(code: LDPCCode):
    """Static per-layer entry lists [(base_col, shift), ...] from the QC view."""
    qc = compile_qc_layout(code)
    layers = []
    for i in range(qc.mb):
        ents = [
            (int(qc.layer_cols[i, t]), int(qc.layer_shifts[i, t]))
            for t in range(qc.max_row_deg)
            if qc.layer_mask[i, t]
        ]
        assert len(ents) >= 2, "degree-1 base rows unsupported in the kernel"
        layers.append(ents)
    return qc, layers


def _cn_minsum(v2cs, beta: int):
    """Unrolled min-sum CN update over one layer's entries.

    v2cs: list of (Z, B) int32 messages (already clipped to +-qmax).
    Returns list of (Z, B) int32 c2v messages.

    Exclusion by value, not argmin: excl_t = (|v_t| == min1 ? min2 : min1).
    Ties give min2 == min1, so every tied entry gets min1 — identical to the
    golden model's stable-argmin semantics, two vector ops cheaper per entry.
    min1/min2 via the merge min2' = min(min2, max(min1, m)); min1' = min(min1,
    m), which needs no select chains. All operands share the int32 compute
    dtype (Mosaic cannot relayout i1 masks between native tilings).
    """
    mags = [jnp.abs(v) for v in v2cs]
    min1 = mags[0]
    min2 = jnp.full_like(min1, jnp.array(1 << 14, _C))
    negpar = v2cs[0] < 0
    for t in range(1, len(v2cs)):
        m = mags[t]
        min2 = jnp.minimum(min2, jnp.maximum(min1, m))
        min1 = jnp.minimum(min1, m)
        negpar = jnp.logical_xor(negpar, v2cs[t] < 0)
    # The offset applies to the post-exclusion magnitude, so the raw min1 must
    # survive for the |v| == min1 comparison; offset min1/min2 once per layer.
    if beta:
        zero = jnp.zeros_like(min1)
        beta_c = jnp.array(beta, _C)
        min1_o = jnp.maximum(min1 - beta_c, zero)
        min2_o = jnp.maximum(min2 - beta_c, zero)
    else:
        min1_o, min2_o = min1, min2
    out = []
    for v, m in zip(v2cs, mags):
        mag = jnp.where(m == min1, min2_o, min1_o)
        neg = jnp.logical_xor(negpar, v < 0)
        out.append(jnp.where(neg, -mag, mag))
    return out


def vmem_bytes(code: LDPCCode, batch_tile: int = 256,
               schedule: str = "layered", c2v_dtype=jnp.int32,
               early_term: bool = False) -> int:
    """Estimated VMEM footprint of the decoder for one batch tile, including
    the double-buffered IO blocks and a margin for Mosaic stack temporaries
    (calibrated against observed scoped-vmem usage: the early-termination
    path's latch/syndrome machinery costs ~40% extra on top of state+IO;
    plain fixed-iteration ~15%)."""
    qc = compile_qc_layout(code)
    n_entries = int((qc.layer_mask).sum())
    itemsize = jnp.dtype(c2v_dtype).itemsize
    tile = qc.nb * qc.Z * batch_tile
    post = tile * 4
    bufs = 2 if schedule == "flooding" else 1
    c2v = n_entries * qc.Z * batch_tile * itemsize
    io = 2 * (tile + tile)  # chan in + hard out, double-buffered int8
    margin = 1.4 if early_term else 1.15
    return int((bufs * post + c2v + io) * margin)


def make_pallas_decoder(
    code: LDPCCode,
    max_iter: int = 20,
    beta: int = 0,
    qmax: int = 127,
    schedule: str = "layered",
    early_term: bool = True,
    batch_tile: int = 256,
    interpret: bool = False,
    c2v_dtype=jnp.int32,
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Build decode(chan_i8[B, n]) -> (hard[B, n] u8, iters[B] i32, conv[B] bool).

    B must be a multiple of batch_tile (the sweep driver pads). State per
    tile: posteriors (nb, Z, Bt) int32 and messages (n_entries, Z, Bt) in
    c2v_dtype, all in VMEM scratch; the grid iterates over batch tiles.
    c2v_dtype=int32 avoids two per-entry conversions and wins ~5% when the
    arrays fit VMEM; pass int8 to quarter the message footprint for larger
    codes.
    """
    if code.base is None or code.Z is None:
        raise ValueError(f"{code.name}: Pallas decoder requires QC structure")
    if schedule not in ("flooding", "layered"):
        raise ValueError(schedule)
    qc, layers = _qc_entries(code)
    Z, nb = qc.Z, qc.nb
    n = code.n
    assert n == nb * Z
    # Flat entry index for c2v storage: entries ordered (layer, position).
    entry_of, off = [], 0
    for ents in layers:
        entry_of.append(list(range(off, off + len(ents))))
        off += len(ents)
    n_entries = off

    flooding = schedule == "flooding"

    def kernel(chan_ref, hard_ref, iters_ref, conv_ref, post_ref, c2v_ref,
               *maybe_tot):
        Bt = chan_ref.shape[2]
        tot_ref = maybe_tot[0] if maybe_tot else None

        # Convergence masks are int32 0/1 (not bool): Mosaic rejects broadcast
        # relayouts of i1 vectors across sublanes, and multiply-by-mask is a
        # plain VPU op. done=1 freezes a lane (golden early-term semantics).
        def chan32(j):
            return chan_ref[j].astype(_C)

        for j in range(nb):
            post_ref[j] = chan32(j)
        c2v_ref[...] = jnp.zeros(c2v_ref.shape, c2v_ref.dtype)

        def syndrome_ok(read):
            """(1, Bt) int32 — 1 where every check is satisfied."""
            unsat = None
            for ents in layers:
                acc = None
                for (j, s) in ents:
                    h = (_rot_fwd(read(j), s) < 0).astype(_C)
                    acc = h if acc is None else acc ^ h
                u = jnp.sum(acc.astype(_I32), axis=0, keepdims=True)
                unsat = u if unsat is None else unsat + u
            return (unsat == 0).astype(_C)

        def cn_sweep(read, emit, with_synd=False):
            """One full CN sweep. read(j): totals the update consumes.
            emit(j, s, e, old, new): handle the result.

            with_synd: also return the (1, Bt) syndrome-ok mask of the STATE
            BEING READ, computed from the rolled posteriors the sweep gathers
            anyway — ~3 ops/entry cheaper than a dedicated syndrome pass."""
            unsat = None
            for li, ents in enumerate(layers):
                v2cs, olds, acc = [], [], None
                for (j, s) in ents:
                    e = entry_of[li][len(olds)]
                    old = c2v_ref[e].astype(_C)
                    rolled = _rot_fwd(read(j), s)
                    if with_synd:
                        h = (rolled < 0).astype(_C)
                        acc = h if acc is None else acc ^ h
                    v2cs.append(jnp.clip(rolled - old, -qmax, qmax))
                    olds.append(old)
                if with_synd:
                    u = jnp.sum(acc, axis=0, keepdims=True)
                    unsat = u if unsat is None else unsat + u
                news = _cn_minsum(v2cs, beta)
                for (j, s), e, old, new in zip(ents, entry_of[li], olds, news):
                    emit(j, s, e, old, new)
            if with_synd:
                return (unsat == 0).astype(_C)
            return None

        def latch_hard(done_prev, read):
            """Latched outputs make early termination bit-exact WITHOUT
            freezing the datapath: lanes run unmasked to the whole-tile exit,
            but a lane's hard bits are captured at its first syndrome success
            (identical to the golden model's per-codeword stop, since lanes
            are independent). Lanes not yet converged get the current bits
            (overwritten next iteration)."""
            keep = done_prev  # (1, Bt) int32 0/1
            inv = jnp.array(1, _C) - keep
            for j in range(nb):
                cur = (read(j) < 0).astype(_C)
                prev = hard_ref[j].astype(_C)
                hard_ref[j] = (prev * keep + cur * inv).astype(jnp.int8)

        if flooding:
            def flood_iter(src, dst, with_synd=False):
                """Unmasked: totals in src are complete for the previous
                messages; build the next totals in dst = chan + new c2v.
                with_synd: return the syndrome-ok mask of SRC (fused into
                the sweep's gathers).

                (A first-touch initialization — first writer of a column
                stores chan + delta, skipping this init pass — was tried and
                reverted: it blew Mosaic compile time from ~3 min to >25 min
                for a ~10% runtime saving.)"""
                for j in range(nb):
                    dst[j] = chan32(j)

                def emit(j, s, e, old, new):
                    c2v_ref[e] = new.astype(c2v_dtype)
                    dst[j] = dst[j] + _rot_bwd(new, s)

                return cn_sweep(lambda j: src[j], emit, with_synd)

            def run_et(done0, iters0, synd_state):
                """Deferred-syndrome scheme: iteration k's sweep reads state
                k-1, so its fused syndrome IS state k-1's convergence —
                published through a VMEM cell because the sweep runs under
                pl.when. The done carry therefore lags one state; latching
                still captures each lane's FIRST converged state exactly
                (latch at iteration k stores state k-1 values for any lane
                not yet latched). A final dedicated pass closes the last
                state. Bit-identical to the golden per-codeword stop."""
                def one(src, dst, done, iters):
                    n_active = jnp.sum(jnp.array(1, _C) - done)

                    @pl.when(n_active > 0)
                    def _():
                        latch_hard(done, lambda j: src[j])
                        ok_prev = flood_iter(src, dst, with_synd=True)
                        synd_state[0] = ok_prev

                    # Skipped sweep => every lane done => the stale mask in
                    # synd_state is irrelevant under maximum().
                    done = jnp.maximum(done, synd_state[0])
                    iters = iters + (jnp.array(1, _C) - done)
                    return done, iters

                def iter_pair(_, carry):
                    done, iters = carry
                    done, iters = one(post_ref, tot_ref, done, iters)
                    done, iters = one(tot_ref, post_ref, done, iters)
                    return done, iters

                synd_state[0] = jnp.zeros((1, Bt), _C)
                done, iters = jax.lax.fori_loop(
                    0, max_iter // 2, iter_pair, (done0, iters0))
                if max_iter % 2:
                    done, iters = one(post_ref, tot_ref, done, iters)
                    final_read = lambda j: tot_ref[j]  # noqa: E731
                else:
                    final_read = lambda j: post_ref[j]  # noqa: E731
                # Close the final state: latch + syndrome once.
                latch_hard(done, final_read)
                done = jnp.maximum(done, syndrome_ok(final_read))
                return done, iters

            def run_plain():
                def iter_pair(_, carry):
                    flood_iter(post_ref, tot_ref)
                    flood_iter(tot_ref, post_ref)
                    return carry

                jax.lax.fori_loop(0, max_iter // 2, iter_pair, 0)
                if max_iter % 2:
                    flood_iter(post_ref, tot_ref)
                    return lambda j: tot_ref[j]
                return lambda j: post_ref[j]
        else:
            def layered_iter():
                def emit(j, s, e, old, new):
                    c2v_ref[e] = new.astype(c2v_dtype)
                    post_ref[j] = post_ref[j] + _rot_bwd(new - old, s)

                cn_sweep(lambda j: post_ref[j], emit)

            def run_et(done0, iters0):
                def body(_, carry):
                    done, iters = carry
                    n_active = jnp.sum(jnp.array(1, _C) - done)

                    @pl.when(n_active > 0)
                    def _():
                        layered_iter()
                        latch_hard(done, lambda j: post_ref[j])

                    iters = iters + (jnp.array(1, _C) - done)
                    done = jnp.maximum(
                        done, syndrome_ok(lambda j: post_ref[j]))
                    return done, iters

                return jax.lax.fori_loop(0, max_iter, body, (done0, iters0))

            def run_plain():
                def body(_, carry):
                    layered_iter()
                    return carry

                jax.lax.fori_loop(0, max_iter, body, 0)
                return lambda j: post_ref[j]

        if early_term:
            zeros = jnp.zeros((1, Bt), _C)
            if flooding:
                # Deferred-syndrome scheme: state 0's convergence comes out
                # of the first sweep; the carry starts all-zero.
                def scoped(synd_state):
                    done, iters = run_et(zeros, jnp.zeros((1, Bt), _I32),
                                         synd_state)
                    iters_ref[...] = iters
                    conv_ref[...] = done.astype(jnp.int8)

                pl.run_scoped(scoped, pltpu.VMEM((1, 1, Bt), _C))
            else:
                done0 = syndrome_ok(lambda j: post_ref[j])
                latch_hard(zeros, lambda j: post_ref[j])
                done, iters = run_et(done0, jnp.zeros((1, Bt), _I32))
                iters_ref[...] = iters
                conv_ref[...] = done.astype(jnp.int8)
        else:
            final_read = run_plain()
            for j in range(nb):
                # i1 -> int32 (same tiling) -> int8: avoids i1 retiling.
                hard_ref[j] = (final_read(j) < 0).astype(_C).astype(jnp.int8)
            iters_ref[...] = jnp.full((1, Bt), max_iter, _I32)
            conv_ref[...] = syndrome_ok(final_read).astype(jnp.int8)

    scratch = [
        pltpu.VMEM((nb, Z, batch_tile), _C),            # post / totals A
        pltpu.VMEM((n_entries, Z, batch_tile), c2v_dtype),  # c2v messages
    ]
    if flooding:
        scratch.append(pltpu.VMEM((nb, Z, batch_tile), _C))  # totals B

    def decode(chan: jnp.ndarray):
        B = chan.shape[0]
        assert B % batch_tile == 0, (B, batch_tile)
        n_tiles = B // batch_tile
        # (B, n) -> (nb, Z, B): variable v = j*Z + r lands at [j, r, b].
        chan_t = chan.astype(jnp.int8).reshape(B, nb, Z).transpose(1, 2, 0)
        hard_t, iters, conv = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((nb, Z, batch_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nb, Z, batch_tile), lambda i: (0, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, batch_tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nb, Z, B), jnp.int8),
                jax.ShapeDtypeStruct((1, B), _I32),
                jax.ShapeDtypeStruct((1, B), jnp.int8),
            ],
            scratch_shapes=scratch,
            interpret=interpret,
        )(chan_t)
        hard = hard_t.transpose(2, 0, 1).reshape(B, n).astype(jnp.uint8)
        return hard, iters[0], conv[0].astype(jnp.bool_)

    return decode


def make_decoder(code: LDPCCode, dec: DecoderConfig, quant: QuantConfig,
                 batch_tile: int = 256, interpret: bool = False,
                 c2v_dtype=jnp.int32):
    """Factory from configs, mirroring ops.decode_ref.make_decoder."""
    if dec.algorithm not in ("min-sum", "offset-min-sum"):
        raise ValueError(f"Pallas decoder supports the min-sum family, "
                         f"got {dec.algorithm}")
    beta = quant.beta_lsb if dec.algorithm == "offset-min-sum" else 0
    return make_pallas_decoder(
        code, max_iter=dec.max_iter, beta=beta, qmax=quant.qmax,
        schedule=dec.schedule, early_term=dec.early_term,
        batch_tile=batch_tile, interpret=interpret, c2v_dtype=c2v_dtype)
