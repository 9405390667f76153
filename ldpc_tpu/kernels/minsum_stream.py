"""HBM-streaming Pallas kernel: layered min-sum for codes too big for VMEM.

The SURVEY.md §5.7 'long-codeword' regime (DVB-S2 n=64800, 5G NR Z=384):
posteriors and messages live in HBM and the kernel streams one layer's
working set (<= max_row_deg blocks of (Z, B_tile)) through VMEM per step —
the moral equivalent of blockwise attention. The VMEM kernel
(minsum_pallas.py) remains the fast path whenever state fits.

Round-2 design — a conflict-aware software pipeline (VERDICT item 3; the
round-1 kernel serialized fetch -> compute -> writeback per layer and sat
2.5x off its HBM roofline):

  * two layer slots (double buffering): while layer l computes in slot
    l % 2, layer l+1's blocks stream into the other slot;
  * c2v message blocks are PER-ENTRY — no two layers ever touch the same
    block — so their fetches/writebacks pipeline unconditionally;
  * posterior blocks shared by CONSECUTIVE layers (for DVB-S2's IRA
    staircase that is every layer pair) are never round-tripped through
    HBM: the next layer receives the just-updated block by a VMEM->VMEM
    copy (the `fwd` table, computed at build time, names the source slot);
    the HBM writeback still happens, asynchronously, for later layers;
  * a block fetched for layer l+1 can race only with layer l's writeback
    of the same column (forwarded instead — never fetched) or with layer
    l-1's writebacks (waited before the slot is reused), so every DMA is
    race-free by construction; the layer sequence is treated as CYCLIC so
    the pipeline also covers the iteration boundary (layer mb-1 -> 0);
  * per-layer metadata (base columns, circulant shifts, pad mask, flat
    entry ids, forward table) rides in scalar-prefetch SMEM; circulant
    shifts are dynamic `pltpu.roll`s, so trace size is O(max_row_deg),
    not O(E);
  * the kernel runs fixed-iteration layered decoding and returns raw int32
    posteriors; hard decision and the final syndrome are one cheap XLA pass
    outside (per-iteration early termination is not worth a syndrome pass
    in the HBM-bound regime).

Bit-exact vs golden decode_fixed(schedule="layered", early_term=False) —
asserted in tests (interpret mode) and against the C oracle on hardware.
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

_C = jnp.int32


def make_stream_decoder(
    code: LDPCCode,
    max_iter: int = 20,
    beta: int = 0,
    qmax: int = 127,
    batch_tile: int = 128,
    interpret: bool = False,
    static_unroll: bool = True,
    posterior_i16: bool | None = None,
    alpha=None,
    resident: bool | None = None,
    res_cap_bytes: int | None = None,
    early_term: bool = False,
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """decode(chan_i8[B, n]) -> (hard u8, iters i32, conv bool).

    static_unroll (default): the layer schedule is unrolled at trace time —
    exact per-layer degrees (no masked compute; NR BG1 pads 22 slots for
    mostly-degree-5 layers), static concat rotations instead of dynamic
    pltpu.rolls, static DMA indices, no SMEM metadata. Double-buffer slot
    parity must alternate per global layer across the fori_loop boundary:
    even mb gives that directly; odd mb (DVB-S2 n=16200 r=1/2, mb=25)
    unrolls TWO decoding iterations per loop body and requires even
    max_iter. Odd mb AND odd max_iter falls back to the dynamic kernel.

    early_term: golden-exact per-lane early termination in the HBM regime —
    requires the RESIDENT kernel (the syndrome needs every posterior in
    VMEM). Per iteration: full syndrome pass over the resident posteriors,
    hard bits latched into a VMEM buffer at each lane's first syndrome
    success (lanes run unmasked — identical outputs because lanes are
    independent; same scheme as minsum_pallas), whole-tile skip once every
    lane has converged (granularity: one loop body = 1 iteration for even
    mb, 2 for odd). Raises ValueError when the ET footprint cannot fit.
    """
    if code.base is None or code.Z is None:
        raise ValueError(f"{code.name}: streaming decoder requires QC structure")
    if code.Z % 8 and not (static_unroll and
                           (code.base.shape[0] % 2 == 0
                            or max_iter % 2 == 0)):
        # Only the DYNAMIC kernel needs sublane-aligned Z (its traced-shift
        # pltpu.rolls and traced-index DMAs reject unaligned shapes); the
        # static-unrolled kernel uses compile-time shifts and indices.
        raise ValueError(
            f"{code.name}: the dynamic streaming kernel requires "
            f"sublane-aligned Z (multiple of 8), got Z={code.Z} — use the "
            f"static-unrolled path (even mb or even max_iter), or the "
            f"VMEM/qc-jnp decoder")
    qc = compile_qc_layout(code)
    if not (qc.layer_mask.sum(axis=1) >= 2).all():
        # A degree-1 base row would leave min2 at the 1<<14 sentinel and
        # truncate c2v = +-(1<<14 - beta) through int8 — error out instead
        # (the VMEM kernel's _qc_entries asserts the same invariant).
        raise ValueError(f"{code.name}: degree-1 base rows unsupported in "
                         f"the streaming kernel")
    Z, nb, mb, D = qc.Z, qc.nb, qc.mb, qc.max_row_deg
    n = code.n
    # Layer-major padded metadata. Padded slots read block/entry 0 harmlessly
    # and never write back.
    lcols = np.where(qc.layer_mask, qc.layer_cols, 0).astype(np.int32)
    lshifts = np.where(qc.layer_mask, qc.layer_shifts, 0).astype(np.int32)
    lmask = qc.layer_mask.astype(np.int32)
    lent = np.cumsum(lmask.reshape(-1)).reshape(mb, D) - lmask
    lent = np.where(qc.layer_mask, lent, 0).astype(np.int32)
    n_entries = int(lmask.sum())
    # Forward table (cyclic): fwd[l, s] = slot index s' of layer (l-1) % mb
    # holding the same posterior column, else -1. Forwarded blocks are VMEM-
    # copied from the previous layer's slot instead of fetched from HBM.
    fwd = np.full((mb, D), -1, np.int32)
    for l in range(mb):
        prev = (l - 1) % mb
        prev_cols = {int(lcols[prev, s]): s for s in range(D)
                     if lmask[prev, s]}
        for s in range(D):
            if lmask[l, s] and int(lcols[l, s]) in prev_cols:
                fwd[l, s] = prev_cols[int(lcols[l, s])]
    pfetch = ((lmask > 0) & (fwd < 0)).astype(np.int32)

    # Static per-layer schedule: LAYERS[l] = [(col, shift, entry, fwd_src)]
    LAYERS = []
    for l in range(mb):
        ents = []
        for s in range(D):
            if lmask[l, s]:
                fw = int(fwd[l, s]) if fwd[l, s] >= 0 else None
                ents.append((int(lcols[l, s]), int(lshifts[l, s]),
                             int(lent[l, s]), fw))
        LAYERS.append(ents)
    # The static kernels double-buffer by LAYER PARITY: layer g uses slot
    # g % 2, so consecutive global layers must alternate slots across the
    # fori_loop boundary. Even mb gives that for free (k_unroll=1); odd mb
    # gets it by unrolling TWO decoding iterations per loop body (2*mb is
    # even) — requires even max_iter (the universal default; odd max_iter
    # on odd mb falls back to the dynamic kernel).
    if mb % 2 == 0:
        k_unroll = 1
    elif max_iter % 2 == 0:
        k_unroll = 2
    else:
        k_unroll = 0
    use_static = static_unroll and k_unroll > 0
    L_body = k_unroll * mb
    n_loop = max_iter // k_unroll if k_unroll else 0

    # Posterior storage width. The invariant post = chan + sum(c2v) bounds
    # |post| <= (max_col_degree + 1) * qmax, so int16 HBM/VMEM storage is
    # LOSSLESS for every supported code (NR BG1 dv<=30 -> 3937) and cuts the
    # dominant posterior stream (fetch + writeback) in half: per-layer slot
    # traffic drops from (4+4+1+1) to (2+2+1+1) bytes/element. All ARITHMETIC
    # stays int32 in-register (packed int16 vector compute miscompiles on
    # this toolchain — storage only); each block pays one widen on load and
    # one narrow on store. Measured on v5e: DVB-S2 r=1/2 (D=7, fetch-bound)
    # 87.9 -> 73.9 ms/batch-1024 (+19%), but NR BG1 (D=22 core rows,
    # conversion on the compute critical path) 10.2 -> ~11.5 ms (-10%) — so
    # the default gates on the row-degree profile; posterior_i16 overrides.
    # Only the static kernel narrows; the dynamic fallback keeps int32 (its
    # traced-shift pltpu.rolls reject sub-word relayouts).
    col_deg = np.zeros(nb, np.int64)
    for l in range(mb):
        for s in range(D):
            if lmask[l, s]:
                col_deg[int(lcols[l, s])] += 1
    max_col_deg = int(col_deg.max())
    # Z % 8: Mosaic rejects DMA slices of PACKED (sub-32-bit) memrefs whose
    # sublane extent is not tile-aligned ("Slice shape along dimension 2
    # must be aligned to tiling (8), but is 27" — hit on 802.11n Z=27 for
    # both int16 posteriors and int8 messages); int32 blocks have no such
    # restriction (the int32 posterior fetch on the preceding line compiled
    # fine), so unaligned Z falls back to int32 for BOTH streams. Sub-word
    # storage is purely a bandwidth optimization — unaligned-Z codes are
    # small (wifi Z<=81) and normally take the VMEM kernel anyway.
    sub32_ok = Z % 8 == 0
    i16_ok = (use_static and sub32_ok
              and (max_col_deg + 1) * qmax < (1 << 15))
    msg_dtype = jnp.int8 if sub32_ok else _C
    msg_bytes = 1 if sub32_ok else 4
    hl_dtype = jnp.int8 if sub32_ok else _C  # ET hard-bit latch buffer
    hl_bytes = 1 if sub32_ok else 4
    if res_cap_bytes is None:
        # 32 MB and 40 MB are both hardware-verified to compile AND run;
        # the non-ET auto gate stays at 32 because the 32–40 MB window only
        # admits high-degree int32 tiles (NR BG1) where residency measured
        # slower. The ET kernel's ACTUAL Mosaic stack demand measures
        # ~1.6x the _res_limit estimate (syndrome/latch temporaries), and
        # granting it is only safe up to the hardware-verified run window:
        # DVB-S2 n=16200 (21 MiB demand) runs; n=64800 (69 MiB demand)
        # compiled but FAULTED THE CHIP at run time — the estimate gate
        # below (40 MB / 1.65) keeps projected demand inside ~42 MB.
        res_cap_bytes = (int(40 * 2 ** 20 / 1.65) if early_term
                         else 32 * 2 ** 20)

    # Posterior-RESIDENT mode: when the whole tile's posteriors fit VMEM
    # alongside the c2v slots and Mosaic's compute temporaries, keep them
    # resident for the entire decode (kernel_resident) — only c2v streams.
    # The scoped-VMEM cap is raisable to 32 MB on this part (verified to
    # compile AND run); the temp estimate is ~4 int32 temporaries per layer
    # slot entry, calibrated against observed Mosaic stack use.
    def _res_limit(pb):
        state = (nb * Z * batch_tile * pb
                 + 2 * D * Z * batch_tile * msg_bytes)
        if early_term:
            state += nb * Z * batch_tile * hl_bytes  # latched hard bits
        temp = D * Z * batch_tile * 16
        return int((state + temp) * 1.15)

    # Posterior width choice differs by mode:
    # - STREAMING: int16 halves the dominant per-layer HBM slot traffic —
    #   profitable unless row degree is large (D > 12: NR BG1's degree-22
    #   layers measured ~10% SLOWER from widen/narrow on the compute path).
    # - RESIDENT: there is no per-layer posterior DMA left, so int16 is
    #   pure compute overhead — prefer int32 unless int16 is what makes the
    #   tile fit the cap (measured: NR BG1 resident-int16 11.7 ms/batch-256
    #   vs non-resident-int32 10.2).
    res_pb = None
    if use_static and (resident is None or resident):
        if posterior_i16 is True and i16_ok:
            res_pb = 2 if _res_limit(2) <= res_cap_bytes else None
        elif posterior_i16 is False:
            res_pb = 4 if _res_limit(4) <= res_cap_bytes else None
        elif i16_ok and D <= 12 and _res_limit(2) <= res_cap_bytes:
            res_pb = 2
        elif _res_limit(4) <= res_cap_bytes:
            res_pb = 4
        # No int16-to-fit fallback for D > 12: the widen/narrow penalty
        # scales with layer degree and loses to non-resident streaming
        # there (NR BG1 measured above).
    stream_et = False
    if early_term:
        # Two ET variants: the resident kernel (posteriors + latch in VMEM
        # — fastest, n=16200-class) where its footprint fits; otherwise the
        # SLOT-STREAMING ET kernel (round-3: only the int8 hard-bit state
        # `hl` is resident, so the n=64800 regime is in-domain).
        if not use_static:
            raise ValueError(
                f"{code.name}: early_term requires the static-unrolled "
                f"stream path (even mb, or even max_iter)")
        if resident is None:
            resident = res_pb is not None
            stream_et = not resident
        elif resident:
            if res_pb is None:
                raise ValueError(
                    f"{code.name}: resident-ET tile footprint exceeds the "
                    f"{res_cap_bytes >> 20} MB scoped-VMEM cap")
        else:
            stream_et = True
    elif resident is None:
        resident = res_pb is not None
    elif resident:
        if not use_static:
            raise ValueError(f"{code.name}: resident mode requires the "
                             f"static-unrolled path (even mb)")
        if res_pb is None:
            raise ValueError(
                f"{code.name}: resident tile footprint exceeds the "
                f"{res_cap_bytes >> 20} MB scoped-VMEM cap")
    if resident:
        posterior_i16 = res_pb == 2
    if posterior_i16 is None:
        posterior_i16 = D <= 12
    post_dtype = jnp.int16 if (posterior_i16 and i16_ok) else _C
    post_bytes = 2 if post_dtype == jnp.int16 else 4
    res_limit = _res_limit(post_bytes)
    # Slot-streaming ET footprint: slot buffers + the int8 hard-bit state.
    # The syndrome pass over hl comes in two forms: fully UNROLLED (small
    # codes) and a fori_loop over layers with traced-index hl reads and
    # dynamic pltpu.rolls (big codes — the n=64800 fully-unrolled pass blew
    # the Mosaic stack: 31.3 MiB demanded at a 30 MiB limit, and the demand
    # CHASES the limit, 52.7 MiB at 40, so unrolling cannot be granted
    # around; the looped pass keeps one layer of temporaries live). The
    # traced-shift rolls need sublane-aligned Z, which every code in this
    # regime has (DVB-S2 Z=360, NR Z%8==0); small unaligned-Z codes keep
    # the unrolled pass.
    # odd-mb bodies unroll TWO sweeps AND TWO syndrome passes (k_unroll),
    # doubling the per-body stack — count it (n=16200 mb=25: 151 entries
    # x2 demanded 18.4 MiB at a 16 MiB grant with the unrolled pass).
    synd_dyn = sub32_ok and n_entries * max(k_unroll, 1) > 256
    et_state = (2 * D * Z * batch_tile * (post_bytes + msg_bytes)
                + nb * Z * batch_tile * hl_bytes)
    # grant: state + the static kernel's measured sweep-stack need
    # (2.4x int32-equivalent slot buffers) + headroom, capped at the
    # hardware-verified-safe 40 MB window
    _et_bufs = 2 * D * Z * batch_tile * (4 + msg_bytes)
    et_grant = min(40 * 2 ** 20,
                   max(16 * 2 ** 20,
                       nb * Z * batch_tile * hl_bytes
                       + int(_et_bufs * 2.4) + 4 * 2 ** 20))
    if stream_et and (et_state * (1.6 if synd_dyn else 3.2)
                      > 40 * 2 ** 20):
        raise ValueError(
            f"{code.name}: stream-ET state {et_state >> 20} MB exceeds the "
            f"verified-safe scoped-VMEM window at batch_tile={batch_tile}")

    total = max_iter * mb

    def kernel(lcols_ref, lshifts_ref, lmask_ref, lent_ref, fwd_ref,
               pfetch_ref, c2v_in_ref, post_in_ref, post_ref, c2v_ref,
               pbuf, cbuf, pf, cf, pw, cw):
        t = pl.program_id(0)

        def p_fetch(slot, l, s):
            return pltpu.make_async_copy(post_ref.at[t, lcols_ref[l, s]],
                                         pbuf.at[slot, s], pf.at[slot, s])

        def c_fetch(slot, l, s):
            return pltpu.make_async_copy(c2v_ref.at[t, lent_ref[l, s]],
                                         cbuf.at[slot, s], cf.at[slot, s])

        def p_wb(slot, l, s):
            return pltpu.make_async_copy(pbuf.at[slot, s],
                                         post_ref.at[t, lcols_ref[l, s]],
                                         pw.at[slot, s])

        def c_wb(slot, l, s):
            return pltpu.make_async_copy(cbuf.at[slot, s],
                                         c2v_ref.at[t, lent_ref[l, s]],
                                         cw.at[slot, s])

        # Prologue: fetch ALL valid blocks of layer 0 into slot 0 (the
        # steady-state fetch skips forwarded blocks; at step 0 there is no
        # previous layer to forward from).
        for s in range(D):
            @pl.when(lmask_ref[0, s] > 0)
            def _():
                p_fetch(0, 0, s).start()
                c_fetch(0, 0, s).start()

        def step_body(step, _):
            l = jax.lax.rem(step, mb)
            slot = jax.lax.rem(step, 2)
            nslot = 1 - slot
            lnext = jax.lax.rem(step + 1, mb)
            lprev = jax.lax.rem(step + mb - 1, mb)

            # 1. Wait for this layer's fetched blocks (step 0 fetched
            #    everything valid; steady state only non-forwarded blocks).
            for s in range(D):
                fetched = jnp.logical_and(
                    lmask_ref[l, s] > 0,
                    jnp.logical_or(step == 0, pfetch_ref[l, s] > 0))

                @pl.when(fetched)
                def _():
                    p_fetch(slot, l, s).wait()

                @pl.when(lmask_ref[l, s] > 0)
                def _():
                    c_fetch(slot, l, s).wait()

            # 2. Forward shared posterior blocks from the previous layer's
            #    slot (they were updated by its compute and are still intact:
            #    fetches only ever land in the CURRENT step's nslot).
            for s in range(D):
                @pl.when(jnp.logical_and(step > 0, fwd_ref[l, s] >= 0))
                def _():
                    pbuf[slot, s] = pbuf[nslot, fwd_ref[l, s]]

            # 3. Prefetch layer step+1 into the other slot BEFORE computing
            #    this layer, so the DMAs overlap the compute. The slot was
            #    last used by layer step-1 — its writebacks must have left
            #    the buffers (and, for any column shared with step+1, have
            #    landed in HBM) first. A fetched (non-forwarded) column of
            #    layer step+1 is by construction absent from layer step, so
            #    it cannot race this step's writebacks.
            @pl.when(jnp.logical_and(step + 1 < total, step > 0))
            def _():
                for s in range(D):
                    @pl.when(lmask_ref[lprev, s] > 0)
                    def _():
                        p_wb(nslot, lprev, s).wait()
                        c_wb(nslot, lprev, s).wait()

            @pl.when(step + 1 < total)
            def _():
                for s in range(D):
                    @pl.when(pfetch_ref[lnext, s] > 0)
                    def _():
                        p_fetch(nslot, lnext, s).start()

                    @pl.when(lmask_ref[lnext, s] > 0)
                    def _():
                        c_fetch(nslot, lnext, s).start()

            # 4. CN update: min1/min2 with value-exclusion (golden tie
            #    semantics; see minsum_pallas._cn_minsum).
            big = jnp.array(1 << 14, _C)
            min1 = jnp.full((Z, batch_tile), big, _C)
            min2 = jnp.full((Z, batch_tile), big, _C)
            negpar = jnp.zeros((Z, batch_tile), _C)
            mags, negs, olds = [], [], []
            for s in range(D):
                sh = lshifts_ref[l, s]
                rolled = pltpu.roll(pbuf[slot, s], Z - sh, 0)
                old = cbuf[slot, s].astype(_C)
                v = jnp.clip(rolled - old, -qmax, qmax)
                mvalid = lmask_ref[l, s]
                mag = jnp.where(mvalid > 0, jnp.abs(v), big)
                neg = jnp.where(mvalid > 0, (v < 0).astype(_C), 0)
                min2 = jnp.minimum(min2, jnp.maximum(min1, mag))
                min1 = jnp.minimum(min1, mag)
                negpar = negpar ^ neg
                mags.append(mag)
                negs.append(neg)
                olds.append(old)
            min1_o, min2_o = min1, min2
            if alpha is not None:  # normalized-min-sum dyadic scaling
                min1_o = jax.lax.shift_right_arithmetic(
                    min1_o * jnp.array(alpha[0], _C), jnp.array(alpha[1], _C))
                min2_o = jax.lax.shift_right_arithmetic(
                    min2_o * jnp.array(alpha[0], _C), jnp.array(alpha[1], _C))
            if beta:
                zero = jnp.zeros_like(min1)
                min1_o = jnp.maximum(min1_o - beta, zero)
                min2_o = jnp.maximum(min2_o - beta, zero)
            for s in range(D):
                out_mag = jnp.where(mags[s] == min1, min2_o, min1_o)
                sgn = negpar ^ negs[s]  # 0/1
                new = jnp.where(sgn > 0, -out_mag, out_mag)
                sh = lshifts_ref[l, s]

                @pl.when(lmask_ref[l, s] > 0)
                def _():
                    pbuf[slot, s] = (pbuf[slot, s]
                                     + pltpu.roll(new - olds[s], sh, 0))
                    cbuf[slot, s] = new.astype(msg_dtype)

            # 5. Start this layer's writebacks (async; they drain during the
            #    next layer's compute and are waited before their slot is
            #    reused in phase 3 two steps from now).
            for s in range(D):
                @pl.when(lmask_ref[l, s] > 0)
                def _():
                    p_wb(slot, l, s).start()
                    c_wb(slot, l, s).start()

            return 0

        jax.lax.fori_loop(0, total, step_body, 0)

        # Epilogue: drain the last two layers' writebacks (phase 5 waited
        # everything older). Static indices — metadata known at trace time.
        for back in (1, 0) if total >= 2 else (0,):
            step = total - 1 - back
            l, slot = step % mb, step % 2
            for s in range(D):
                if lmask[l, s]:
                    pltpu.make_async_copy(
                        pbuf.at[slot, s],
                        post_ref.at[t, int(lcols[l, s])],
                        pw.at[slot, s]).wait()
                    pltpu.make_async_copy(
                        cbuf.at[slot, s],
                        c2v_ref.at[t, int(lent[l, s])],
                        cw.at[slot, s]).wait()

    # Layer entry ids are layer-major-contiguous (lent = cumsum over the
    # layer-major mask), so one DMA moves a whole layer's c2v blocks.
    layer_off = []
    off_acc = 0
    for l in range(mb):
        layer_off.append(off_acc)
        for s, e in enumerate(e2 for (_c, _s, e2, _f) in LAYERS[l]):
            assert e == off_acc + s, "c2v entries must be layer-contiguous"
        off_acc += len(LAYERS[l])

    def _rot_f(x, sh):
        # y[r] = x[(r + sh) % Z] (static shift, vreg-level concat)
        if sh == 0:
            return x
        return jnp.concatenate([x[sh:], x[:sh]], axis=0)

    def _rot_b(x, sh):
        if sh == 0:
            return x
        return jnp.concatenate([x[-sh:], x[:-sh]], axis=0)

    def _layer_cn(ents, read_post, read_old, emit):
        """One layer's CN update — exact degree, static rotations, sign
        parity in bit 31 (see minsum_pallas._cn_minsum). read_post(s, col)
        and read_old(s) return (Z, Bt) int32; emit(s, col, sh, new_post,
        new_msg) handles the int32 results (callers narrow to storage)."""
        v2cs, olds, posts = [], [], []
        for s, (col, sh, e, fw) in enumerate(ents):
            old = read_old(s)
            post = read_post(s, col)  # widen once; reused below
            rolled = _rot_f(post, sh)
            v2cs.append(jnp.clip(rolled - old, -qmax, qmax))
            olds.append(old)
            posts.append(post)
        mags = [jnp.abs(v) for v in v2cs]
        min1 = mags[0]
        min2 = jnp.full_like(min1, jnp.array(1 << 14, _C))
        negacc = v2cs[0]
        for i2 in range(1, len(v2cs)):
            m = mags[i2]
            min2 = jnp.minimum(min2, jnp.maximum(min1, m))
            min1 = jnp.minimum(min1, m)
            negacc = negacc ^ v2cs[i2]
        min1_o, min2_o = min1, min2
        if alpha is not None:  # normalized-min-sum dyadic scaling
            num, sh_a = jnp.array(alpha[0], _C), jnp.array(alpha[1], _C)
            min1_o = jax.lax.shift_right_arithmetic(min1_o * num, sh_a)
            min2_o = jax.lax.shift_right_arithmetic(min2_o * num, sh_a)
        if beta:
            zero = jnp.zeros_like(min1)
            bc = jnp.array(beta, _C)
            min1_o = jnp.maximum(min1_o - bc, zero)
            min2_o = jnp.maximum(min2_o - bc, zero)
        for s, (col, sh, e, fw) in enumerate(ents):
            mag = jnp.where(mags[s] == min1, min2_o, min1_o)
            excl = negacc ^ v2cs[s]
            new = jnp.where(excl < 0, -mag, mag)
            emit(s, col, sh, posts[s] + _rot_b(new - olds[s], sh), new)

    def kernel_static(c2v_in_ref, post_in_ref, post_ref, c2v_ref,
                      pbuf, cbuf, pf, cf, pw, cw):
        t = pl.program_id(0)

        def pF(slot, col, s):
            return pltpu.make_async_copy(post_ref.at[t, col],
                                         pbuf.at[slot, s], pf.at[slot, s])

        def cF(slot, ent, s):
            return pltpu.make_async_copy(c2v_ref.at[t, ent],
                                         cbuf.at[slot, s], cf.at[slot, s])

        def pW(slot, col, s):
            return pltpu.make_async_copy(pbuf.at[slot, s],
                                         post_ref.at[t, col],
                                         pw.at[slot, s])

        def cW(slot, ent, s):
            return pltpu.make_async_copy(cbuf.at[slot, s],
                                         c2v_ref.at[t, ent], cw.at[slot, s])

        # Prologue: layer 0 fully fetched into slot 0.
        for s, (col, sh, e, fw) in enumerate(LAYERS[0]):
            pF(0, col, s).start()
            cF(0, e, s).start()

        def iter_body(it, _):
            # g indexes GLOBAL layers within the body (k_unroll decoding
            # iterations of mb layers each); slot parity g % 2 is then
            # consistent across the fori_loop boundary for any mb.
            for g in range(L_body):
                l = g % mb
                A = g % 2
                Bs_ = 1 - A
                ents = LAYERS[l]
                ln = (l + 1) % mb
                lp = (l - 1) % mb

                # 1. wait this layer's fetches (forwarded posterior blocks
                # were only ever fetched by the prologue: g == 0, it == 0).
                for s, (col, sh, e, fw) in enumerate(ents):
                    if fw is None:
                        pF(A, col, s).wait()
                    elif g == 0:
                        @pl.when(it == 0)
                        def _():
                            pF(0, col, s).wait()
                    cF(A, e, s).wait()

                # 2. forward shared posterior blocks from the previous layer
                for s, (col, sh, e, fw) in enumerate(ents):
                    if fw is not None:
                        if g == 0:
                            @pl.when(it > 0)
                            def _():
                                pbuf[A, s] = pbuf[Bs_, fw]
                        else:
                            pbuf[A, s] = pbuf[Bs_, fw]

                # 3. drain the previous global layer's writebacks (they used
                # slot Bs_), then prefetch the next global layer into it —
                # BEFORE this layer's compute, so the DMAs overlap it.
                def wb_waits(lp=lp, Bs_=Bs_):
                    for s2, (c2, _s, e2, _f) in enumerate(LAYERS[lp]):
                        pW(Bs_, c2, s2).wait()
                        cW(Bs_, e2, s2).wait()

                def next_fetches(ln=ln, Bs_=Bs_):
                    for s2, (c2, _s, e2, f2) in enumerate(LAYERS[ln]):
                        if f2 is None:
                            pF(Bs_, c2, s2).start()
                        cF(Bs_, e2, s2).start()

                if g == 0:
                    @pl.when(it > 0)
                    def _():
                        wb_waits()
                    next_fetches()
                elif g == L_body - 1:
                    wb_waits()

                    @pl.when(it + 1 < n_loop)
                    def _():
                        next_fetches()
                else:
                    wb_waits()
                    next_fetches()

                # 4. CN update (shared helper; buffers narrow on emit)
                def emit_slot(s, col, sh, new_post, new_msg):
                    pbuf[A, s] = new_post.astype(post_dtype)
                    cbuf[A, s] = new_msg.astype(msg_dtype)

                _layer_cn(ents,
                          lambda s, col: pbuf[A, s].astype(_C),
                          lambda s: cbuf[A, s].astype(_C),
                          emit_slot)

                # 5. start this layer's writebacks
                for s, (col, sh, e, fw) in enumerate(ents):
                    pW(A, col, s).start()
                    cW(A, e, s).start()
            return 0

        jax.lax.fori_loop(0, n_loop, iter_body, 0)

        # Epilogue: ONLY the final global layer's writebacks are still
        # outstanding — every other layer's were waited at the next global
        # layer's phase 3 (the last layer's wb_waits runs unconditionally,
        # unlike the dynamic kernel's step-gated variant). Waiting any of
        # them twice would underflow the DMA semaphore and fault the chip.
        # The final global layer is mb-1 on slot (L_body-1) % 2 == 1
        # (L_body is even for k_unroll=2; mb-1 is odd for even mb).
        AE = (L_body - 1) % 2
        for s, (col, sh, e, fw) in enumerate(LAYERS[mb - 1]):
            pW(AE, col, s).wait()
            cW(AE, e, s).wait()

    def kernel_resident(c2v_in_ref, post_in_ref, post_ref, c2v_ref,
                        pres, cbuf, psem, cf, cw):
        """Posterior-RESIDENT variant: the whole tile's posteriors live in
        VMEM for the duration of the decode (one bulk DMA in/out per tile);
        only c2v messages stream, and a layer's c2v blocks move as ONE
        contiguous DMA per direction (entry ids are layer-major). Compared
        to the slot-streaming kernel this removes ~2/3 of the steady-state
        HBM traffic (posterior fetch+writeback) and collapses the per-layer
        DMA-orchestration count from ~4*D to 2 — the scalar-core DMA issue/
        wait rate was a measured bottleneck at ~50k DMAs per invocation."""
        t = pl.program_id(0)

        def cF(slot, l):
            d = len(LAYERS[l])
            return pltpu.make_async_copy(
                c2v_ref.at[t, pl.ds(layer_off[l], d)],
                cbuf.at[slot, pl.ds(0, d)], cf.at[slot])

        def cW(slot, l):
            d = len(LAYERS[l])
            return pltpu.make_async_copy(
                cbuf.at[slot, pl.ds(0, d)],
                c2v_ref.at[t, pl.ds(layer_off[l], d)], cw.at[slot])

        load = pltpu.make_async_copy(post_ref.at[t], pres, psem)
        load.start()
        cF(0, 0).start()
        load.wait()

        def iter_body(it, _):
            # g indexes GLOBAL layers within the body (k_unroll decoding
            # iterations; see kernel_static) so slot parity g % 2 holds
            # across the fori_loop boundary for any mb.
            for g in range(L_body):
                l = g % mb
                A = g % 2
                Bs_ = 1 - A
                ents = LAYERS[l]
                # 1. this layer's c2v blocks have landed
                cF(A, l).wait()
                # 2. drain the previous global layer's writeback from the
                #    other slot, then prefetch the next global layer's c2v
                #    into it (overlaps compute).
                if g == 0:
                    @pl.when(it > 0)
                    def _():
                        cW(Bs_, mb - 1).wait()
                    cF(Bs_, 1 % mb).start()
                elif g == L_body - 1:
                    cW(Bs_, (l - 1) % mb).wait()

                    @pl.when(it + 1 < n_loop)
                    def _():
                        cF(Bs_, 0).start()
                else:
                    cW(Bs_, (l - 1) % mb).wait()
                    cF(Bs_, (l + 1) % mb).start()

                # 3. CN update against the resident posterior
                def emit_res(s, col, sh, new_post, new_msg):
                    pres[col] = new_post.astype(post_dtype)
                    cbuf[A, s] = new_msg.astype(msg_dtype)

                _layer_cn(ents,
                          lambda s, col: pres[col].astype(_C),
                          lambda s: cbuf[A, s].astype(_C),
                          emit_res)

                # 4. writeback (drained when the slot is reused, phase 2)
                cW(A, l).start()
            return 0

        jax.lax.fori_loop(0, n_loop, iter_body, 0)
        cW((L_body - 1) % 2, mb - 1).wait()
        store = pltpu.make_async_copy(pres, post_ref.at[t], psem)
        store.start()
        store.wait()

    def kernel_resident_et(c2v_in_ref, post_in_ref, post_ref, c2v_ref,
                           hard_ref, stats_ref,
                           pres, cbuf, hl, mbuf, psem, hsem, cf, cw):
        """Resident kernel with golden-exact per-lane early termination.

        After every decoding iteration a full syndrome pass runs over the
        RESIDENT posteriors (mb*D static rotations + sign-parity XORs —
        parity rides bit 31, as in minsum_pallas.syndrome_ok); lanes whose
        syndrome first passes get their hard bits latched into `hl` (the
        datapath runs unmasked — identical outputs because lanes are
        independent, the same argument as minsum_pallas.latch_hard). Once
        every lane is done the remaining loop bodies skip their sweeps and
        DMAs under pl.when; semantic updates outside the pl.when are no-ops
        on unchanged posteriors. DMA accounting at dynamic exit: every
        active body starts exactly L_body c2v fetches and waits L_body
        (g == L_body-1 prefetches layer 0 UNCONDITIONALLY, unlike the
        fixed-iteration kernel), so exactly one layer-0 fetch into slot 0
        dangles at the epilogue regardless of when the exit happened; one
        layer mb-1 writeback on slot 1 dangles iff any body ran.
        """
        t = pl.program_id(0)

        def cF(slot, l):
            d = len(LAYERS[l])
            return pltpu.make_async_copy(
                c2v_ref.at[t, pl.ds(layer_off[l], d)],
                cbuf.at[slot, pl.ds(0, d)], cf.at[slot])

        def cW(slot, l):
            d = len(LAYERS[l])
            return pltpu.make_async_copy(
                cbuf.at[slot, pl.ds(0, d)],
                c2v_ref.at[t, pl.ds(layer_off[l], d)], cw.at[slot])

        load = pltpu.make_async_copy(post_ref.at[t], pres, psem)
        load.start()
        cF(0, 0).start()
        load.wait()

        one32 = jnp.array(1, _C)

        def syndrome_done():
            """(1, Bt) int32 0/1 — 1 where every parity check passes."""
            unsat = None
            for l in range(mb):
                acc = None
                for (col, sh, e, fw) in LAYERS[l]:
                    h = _rot_f(pres[col].astype(_C), sh)
                    acc = h if acc is None else acc ^ h
                u = jnp.sum((acc < 0).astype(_C), axis=0, keepdims=True)
                unsat = u if unsat is None else unsat + u
            return (unsat == 0).astype(_C)

        def latch(mask):
            """hl <- current posterior signs on lanes where mask==1."""
            inv = one32 - mask
            for col in range(nb):
                cur = (pres[col].astype(_C) < 0).astype(_C)
                prev = hl[col].astype(_C)
                hl[col] = (prev * inv + cur * mask).astype(hl_dtype)

        # Initial state: latch EVERY lane's channel-sign bits (covers lanes
        # already satisfied at iteration 0, like decode_qc's done0).
        for col in range(nb):
            hl[col] = (pres[col].astype(_C) < 0).astype(_C).astype(hl_dtype)
        done0 = syndrome_done()
        n_act0 = jnp.sum(one32 - done0)

        def sweep_half(first_half):
            """mb layers of one decoding iteration (one half of the body
            when k_unroll == 2). DMA slots follow GLOBAL layer parity."""
            g0 = 0 if first_half else mb
            for gi in range(mb):
                g = g0 + gi
                l = g % mb
                A = g % 2
                Bs_ = 1 - A
                ents = LAYERS[l]
                cF(A, l).wait()
                if g == 0:
                    # the previous BODY's final writeback (none before the
                    # first body; skipped bodies form a suffix, so if this
                    # body runs the previous one did too)
                    @pl.when(first_it[0])
                    def _():
                        cW(Bs_, mb - 1).wait()
                    cF(Bs_, 1 % mb).start()
                elif g == L_body - 1:
                    cW(Bs_, (l - 1) % mb).wait()
                    cF(Bs_, 0).start()  # unconditional: dynamic exit
                else:
                    cW(Bs_, (l - 1) % mb).wait()
                    cF(Bs_, (l + 1) % mb).start()

                def emit_res(s, col, sh, new_post, new_msg):
                    pres[col] = new_post.astype(post_dtype)
                    cbuf[A, s] = new_msg.astype(msg_dtype)

                _layer_cn(ents,
                          lambda s, col: pres[col].astype(_C),
                          lambda s: cbuf[A, s].astype(_C),
                          emit_res)
                cW(A, l).start()

        first_it = [None]  # set per-body: traced (it > 0) predicate

        def iter_body(it, carry):
            done, iters = carry
            n_act = jnp.sum(one32 - done)
            first_it[0] = it > 0
            for half in range(k_unroll):
                @pl.when(n_act > 0)
                def _(half=half):
                    sweep_half(half == 0)
                done_new = jnp.maximum(done, syndrome_done())
                newly = done_new - done
                n_new = jnp.sum(newly)

                @pl.when(n_new > 0)
                def _(newly=newly):
                    latch(newly)

                iters = iters + (one32 - done)
                done = done_new
            return done, iters

        done, iters = jax.lax.fori_loop(
            0, n_loop, iter_body,
            (done0, jnp.zeros((1, batch_tile), _C)))

        # Close: never-converged lanes report their final posterior bits.
        rem = one32 - done
        @pl.when(jnp.sum(rem) > 0)
        def _():
            latch(rem)

        @pl.when(n_act0 > 0)
        def _():
            cW((L_body - 1) % 2, mb - 1).wait()
        cF(0, 0).wait()

        mbuf[0] = iters
        mbuf[1] = done
        st = pltpu.make_async_copy(hl, hard_ref.at[t], hsem)
        st.start()
        st2 = pltpu.make_async_copy(mbuf, stats_ref.at[t], psem)
        st2.start()
        st.wait()
        st2.wait()

    def kernel_stream_et(lc_ref, ls_ref, lm_ref,
                         c2v_in_ref, post_in_ref, post_ref, c2v_ref,
                         hard_ref, stats_ref,
                         pbuf, cbuf, hl, mbuf, pf, pw, cf, cw, hsem, ssem):
        """SLOT-STREAMING kernel with golden-exact per-lane early
        termination — the n=64800 regime where the resident-ET footprint
        faults the chip (round-2 VERDICT item 1).

        No posterior residency: one (nb, Z, Bt) int8 buffer `hl` is both
        the hard-bit LATCH and the syndrome STATE. Each layer's emit blends
        the just-updated posterior signs into hl under the per-lane done
        mask (done lanes keep their first-converged bits; unconverged lanes
        track end-of-iteration signs exactly, because every column's last
        writer in the sweep is the last layer touching it). The syndrome
        is then a pure-VMEM pass over hl (mb*D static rotations + XORs) —
        zero extra HBM traffic, riding under the DMA shadow of the
        HBM-bound sweep. Once every lane is done, whole loop bodies skip
        under pl.when (granularity: k_unroll decoding iterations).

        DMA accounting at dynamic exit (skipped bodies form a suffix):
        every active body waits the previous body's layer-(mb-1)
        writebacks and starts an UNCONDITIONAL layer-0 prefetch at its last
        global layer, so at the epilogue exactly one layer-0 fetch into
        slot 0 dangles (from the last active body, or from the prologue if
        no body ran — the prologue additionally fetched the forwarded
        posterior entries, waited under n_act0 == 0), and one layer-(mb-1)
        writeback set dangles iff any body ran.
        """
        t = pl.program_id(0)

        def pF(slot, col, s):
            return pltpu.make_async_copy(post_ref.at[t, col],
                                         pbuf.at[slot, s], pf.at[slot, s])

        def pW(slot, col, s):
            return pltpu.make_async_copy(pbuf.at[slot, s],
                                         post_ref.at[t, col],
                                         pw.at[slot, s])

        def cF(slot, l):
            d = len(LAYERS[l])
            return pltpu.make_async_copy(
                c2v_ref.at[t, pl.ds(layer_off[l], d)],
                cbuf.at[slot, pl.ds(0, d)], cf.at[slot])

        def cW(slot, l):
            d = len(LAYERS[l])
            return pltpu.make_async_copy(
                cbuf.at[slot, pl.ds(0, d)],
                c2v_ref.at[t, pl.ds(layer_off[l], d)], cw.at[slot])

        one32 = jnp.array(1, _C)

        # ---- init: hl <- channel signs (pipelined streaming pass over all
        # posterior columns, 2*D fetches in flight through the slot
        # positions; every fetch is waited, so the pf semaphores are clean
        # for the prologue). One-time ~nb*Z*Bt*post_bytes HBM read.
        def iF(i):
            return pltpu.make_async_copy(post_ref.at[t, i],
                                         pbuf.at[(i // D) % 2, i % D],
                                         pf.at[(i // D) % 2, i % D])

        depth = min(2 * D, nb)
        for i in range(depth):
            iF(i).start()
        for col in range(nb):
            iF(col).wait()
            blk = pbuf[(col // D) % 2, col % D].astype(_C)
            hl[col] = (blk < 0).astype(_C).astype(hl_dtype)
            if col + depth < nb:
                iF(col + depth).start()

        def syndrome_done():
            """(1, Bt) int32 0/1 — 1 where every parity check passes,
            computed from the hl hard-bit state (0/1 ints: the check
            parity is the XOR chain itself). Big codes run the layer loop
            as a fori_loop (traced-index hl reads + dynamic rolls) so the
            Mosaic stack holds ONE layer's temporaries, not mb*D — the
            fully-unrolled n=64800 pass measured 31–53 MiB of stack."""
            if synd_dyn:
                def body(l, unsat):
                    acc = jnp.zeros((Z, batch_tile), _C)
                    for s in range(D):
                        blk = hl[lc_ref[l, s]].astype(_C)
                        h = pltpu.roll(blk, Z - ls_ref[l, s], 0)
                        acc = acc ^ (h * lm_ref[l, s])
                    return unsat + jnp.sum(acc, axis=0, keepdims=True)
                unsat = jax.lax.fori_loop(
                    0, mb, body, jnp.zeros((1, batch_tile), _C))
                return (unsat == 0).astype(_C)
            unsat = None
            for l in range(mb):
                acc = None
                for (col, sh, e, fw) in LAYERS[l]:
                    h = _rot_f(hl[col].astype(_C), sh)
                    acc = h if acc is None else acc ^ h
                u = jnp.sum(acc, axis=0, keepdims=True)
                unsat = u if unsat is None else unsat + u
            return (unsat == 0).astype(_C)

        done0 = syndrome_done()
        n_act0 = jnp.sum(one32 - done0)

        # ---- prologue: layer 0 fully fetched into slot 0
        for s, (col, sh, e, fw) in enumerate(LAYERS[0]):
            pF(0, col, s).start()
        cF(0, 0).start()

        def sweep_mb(first_half, done, not_first):
            """mb global layers of one decoding iteration (one half of the
            body for k_unroll == 2); `done` freezes converged lanes in the
            hl blend; `not_first` gates the cross-body DMA waits/forwards
            (traced: bodies are themselves under pl.when)."""
            g0 = 0 if first_half else mb
            inv = one32 - done
            for gi in range(mb):
                g = g0 + gi
                l = g % mb
                A = g % 2
                Bs_ = 1 - A
                ents = LAYERS[l]
                ln = (l + 1) % mb
                lp = (l - 1) % mb

                # 1. wait this layer's fetches (forwarded posterior blocks
                # were only ever fetched by the prologue: g == 0 on the
                # first body).
                for s, (col, sh, e, fw) in enumerate(ents):
                    if fw is None:
                        pF(A, col, s).wait()
                    elif g == 0:
                        @pl.when(jnp.logical_not(not_first))
                        def _(col=col, s=s):
                            pF(0, col, s).wait()
                cF(A, l).wait()

                # 2. forward shared posterior blocks from the previous
                # global layer's slot
                for s, (col, sh, e, fw) in enumerate(ents):
                    if fw is not None:
                        if g == 0:
                            @pl.when(not_first)
                            def _(s=s, fw=fw):
                                pbuf[A, s] = pbuf[Bs_, fw]
                        else:
                            pbuf[A, s] = pbuf[Bs_, fw]

                # 3. drain the previous global layer's writebacks from the
                # other slot, then prefetch the next global layer into it
                # (overlaps this layer's compute).
                def wb_waits(lp=lp, Bs_=Bs_):
                    for s2, (c2, _s, e2, _f) in enumerate(LAYERS[lp]):
                        pW(Bs_, c2, s2).wait()
                    cW(Bs_, lp).wait()

                def next_fetches(ln=ln, Bs_=Bs_):
                    for s2, (c2, _s, e2, f2) in enumerate(LAYERS[ln]):
                        if f2 is None:
                            pF(Bs_, c2, s2).start()
                    cF(Bs_, ln).start()

                if g == 0:
                    @pl.when(not_first)
                    def _():
                        wb_waits()
                    next_fetches()
                elif g == L_body - 1:
                    wb_waits()
                    next_fetches()  # unconditional: dynamic exit
                else:
                    wb_waits()
                    next_fetches()

                # 4. CN update + hl blend (done lanes stay latched)
                def emit_slot(s, col, sh, new_post, new_msg):
                    pbuf[A, s] = new_post.astype(post_dtype)
                    cbuf[A, s] = new_msg.astype(msg_dtype)
                    cur = (new_post < 0).astype(_C)
                    prev = hl[col].astype(_C)
                    hl[col] = (prev * done + cur * inv).astype(hl_dtype)

                _layer_cn(ents,
                          lambda s, col: pbuf[A, s].astype(_C),
                          lambda s: cbuf[A, s].astype(_C),
                          emit_slot)

                # 5. start this layer's writebacks
                for s, (col, sh, e, fw) in enumerate(ents):
                    pW(A, col, s).start()
                cW(A, l).start()

        def iter_body(it, carry):
            done, iters = carry
            n_act = jnp.sum(one32 - done)
            not_first = it > 0
            for half in range(k_unroll):
                @pl.when(n_act > 0)
                def _(half=half, done=done, not_first=not_first):
                    sweep_mb(half == 0, done, not_first)
                iters = iters + (one32 - done)
                done = jnp.maximum(done, syndrome_done())
            return done, iters

        done, iters = jax.lax.fori_loop(
            0, n_loop, iter_body,
            (done0, jnp.zeros((1, batch_tile), _C)))

        # ---- epilogue: drain dangling DMAs (see accounting note above)
        for s, (col, sh, e, fw) in enumerate(LAYERS[0]):
            if fw is None:
                pF(0, col, s).wait()
            else:
                @pl.when(n_act0 == 0)
                def _(col=col, s=s):
                    pF(0, col, s).wait()
        cF(0, 0).wait()
        AE = (L_body - 1) % 2

        @pl.when(n_act0 > 0)
        def _():
            for s, (col, sh, e, fw) in enumerate(LAYERS[mb - 1]):
                pW(AE, col, s).wait()
            cW(AE, mb - 1).wait()

        mbuf[0] = iters
        mbuf[1] = done
        st = pltpu.make_async_copy(hl, hard_ref.at[t], hsem)
        st.start()
        st2 = pltpu.make_async_copy(mbuf, stats_ref.at[t], ssem)
        st2.start()
        st.wait()
        st2.wait()

    lcols_j, lshifts_j = jnp.asarray(lcols), jnp.asarray(lshifts)
    lmask_j, lent_j = jnp.asarray(lmask), jnp.asarray(lent)
    fwd_j, pfetch_j = jnp.asarray(fwd), jnp.asarray(pfetch)

    def syndrome_ok(post3):  # (B, nb, Z) int32 -> (B,) bool
        unsat = None
        for i in range(mb):
            acc = None
            for tt in range(D):
                if not qc.layer_mask[i, tt]:
                    continue
                j, s = int(qc.layer_cols[i, tt]), int(qc.layer_shifts[i, tt])
                h = (jnp.roll(post3[:, j], -s, axis=-1) < 0).astype(_C)
                acc = h if acc is None else acc ^ h
            u = jnp.sum(acc, axis=-1)
            unsat = u if unsat is None else unsat + u
        return unsat == 0

    def decode(chan: jnp.ndarray):
        B = chan.shape[0]
        assert B % batch_tile == 0, (B, batch_tile)
        n_tiles = B // batch_tile
        # (B, n) -> (n_tiles, nb, Z, Bt); posterior arrives pre-initialized.
        chan_t = (chan.astype(jnp.int8)
                  .reshape(n_tiles, batch_tile, nb, Z)
                  .transpose(0, 2, 3, 1))
        post_init = chan_t.astype(post_dtype)
        scratch = [
            pltpu.VMEM((2, D, Z, batch_tile), post_dtype),
            pltpu.VMEM((2, D, Z, batch_tile), msg_dtype),
            pltpu.SemaphoreType.DMA((2, D)),
            pltpu.SemaphoreType.DMA((2, D)),
            pltpu.SemaphoreType.DMA((2, D)),
            pltpu.SemaphoreType.DMA((2, D)),
        ]
        # Slot buffers alone can exceed the default 16 MB scoped-VMEM cap
        # for high-row-degree codes (NR BG1: D=22). The chip has more
        # physical VMEM (verified by running a 17.5 MB kernel at a raised
        # limit — scripts/microbench_rot.py vreg_minsum32v); request what
        # the buffers + Mosaic temporaries need.
        # Sized from the int32-equivalent footprint even when posteriors are
        # stored int16: Mosaic's compute temporaries are int32 regardless, so
        # the stack need does not shrink with the buffer dtype (NR BG1 D=22
        # measured 18.3 MB stack with int16 buffers — above the 16 MB floor
        # a (post_bytes+1)-based formula would have requested).
        bufs = 2 * D * Z * batch_tile * (4 + msg_bytes)
        # observed actual stack need for NR BG1 (D=22): 1.98x bufs; leave
        # real headroom beyond that
        vmem_limit = max(16 * 2 ** 20, int(bufs * 2.4))
        params = pltpu.CompilerParams(
            has_side_effects=True, vmem_limit_bytes=vmem_limit)
        out_shape = [
            jax.ShapeDtypeStruct((n_tiles, nb, Z, batch_tile), post_dtype),
            jax.ShapeDtypeStruct((n_tiles, n_entries, Z, batch_tile),
                                 msg_dtype),
        ]
        c2v_init = jnp.zeros((n_tiles, n_entries, Z, batch_tile), msg_dtype)
        if resident and early_term:
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
                scratch_shapes=[
                    pltpu.VMEM((nb, Z, batch_tile), post_dtype),
                    pltpu.VMEM((2, D, Z, batch_tile), msg_dtype),
                    pltpu.VMEM((nb, Z, batch_tile), hl_dtype),
                    pltpu.VMEM((2, 1, batch_tile), _C),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            _, _, hl_out, stats = pl.pallas_call(
                kernel_resident_et,
                out_shape=out_shape + [
                    jax.ShapeDtypeStruct((n_tiles, nb, Z, batch_tile),
                                         hl_dtype),
                    jax.ShapeDtypeStruct((n_tiles, 2, 1, batch_tile), _C),
                ],
                grid_spec=gs,
                input_output_aliases={1: 0, 0: 1},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    # The ET kernel's syndrome/latch passes carry more Mosaic
                    # stack than the plain resident kernel (measured demand:
                    # DVB-S2 n=16200 21.1 MiB vs 13.2 estimated, n=64800
                    # 68.8 MiB vs 34.6 — the demand saturates rather than
                    # tracking the granted limit): grant 2.1x the estimate.
                    # 69 MiB compiles AND runs on v5e (hardware-verified;
                    # the 16 MB figure in docs is a soft default, not the
                    # physical VMEM).
                    vmem_limit_bytes=max(16 * 2 ** 20,
                                         int(res_limit * 2.1))),
                interpret=interpret,
            )(c2v_init, post_init)
            hard = (hl_out.transpose(0, 3, 1, 2)
                    .reshape(B, n).astype(jnp.uint8))
            iters = stats[:, 0, 0].reshape(B)
            conv = stats[:, 1, 0].reshape(B).astype(bool)
            return hard, iters, conv
        if stream_et:
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=3,  # lcols/lshifts/lmask (dyn syndrome)
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 4,
                scratch_shapes=[
                    pltpu.VMEM((2, D, Z, batch_tile), post_dtype),  # pbuf
                    pltpu.VMEM((2, D, Z, batch_tile), msg_dtype),   # cbuf
                    pltpu.VMEM((nb, Z, batch_tile), hl_dtype),      # hl
                    pltpu.VMEM((2, 1, batch_tile), _C),             # mbuf
                    pltpu.SemaphoreType.DMA((2, D)),                # pf
                    pltpu.SemaphoreType.DMA((2, D)),                # pw
                    pltpu.SemaphoreType.DMA((2,)),                  # cf
                    pltpu.SemaphoreType.DMA((2,)),                  # cw
                    pltpu.SemaphoreType.DMA,                        # hsem
                    pltpu.SemaphoreType.DMA,                        # ssem
                ],
            )
            _, _, hl_out, stats = pl.pallas_call(
                kernel_stream_et,
                out_shape=out_shape + [
                    jax.ShapeDtypeStruct((n_tiles, nb, Z, batch_tile),
                                         hl_dtype),
                    jax.ShapeDtypeStruct((n_tiles, 2, 1, batch_tile), _C),
                ],
                grid_spec=gs,
                input_output_aliases={4: 0, 3: 1},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True, vmem_limit_bytes=et_grant),
                interpret=interpret,
            )(lcols_j, lshifts_j, lmask_j, c2v_init, post_init)
            hard = (hl_out.transpose(0, 3, 1, 2)
                    .reshape(B, n).astype(jnp.uint8))
            iters = stats[:, 0, 0].reshape(B)
            conv = stats[:, 1, 0].reshape(B).astype(bool)
            return hard, iters, conv
        if resident:
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                scratch_shapes=[
                    pltpu.VMEM((nb, Z, batch_tile), post_dtype),
                    pltpu.VMEM((2, D, Z, batch_tile), msg_dtype),
                    pltpu.SemaphoreType.DMA,
                    pltpu.SemaphoreType.DMA((2,)),
                    pltpu.SemaphoreType.DMA((2,)),
                ],
            )
            post, _ = pl.pallas_call(
                kernel_resident,
                out_shape=out_shape,
                grid_spec=gs,
                input_output_aliases={1: 0, 0: 1},
                compiler_params=pltpu.CompilerParams(
                    has_side_effects=True,
                    vmem_limit_bytes=max(16 * 2 ** 20, res_limit)),
                interpret=interpret,
            )(c2v_init, post_init)
        elif use_static:
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=0,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                scratch_shapes=scratch,
            )
            post, _ = pl.pallas_call(
                kernel_static,
                out_shape=out_shape,
                grid_spec=gs,
                input_output_aliases={1: 0, 0: 1},
                compiler_params=params,
                interpret=interpret,
            )(c2v_init, post_init)
        else:
            gs = pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=6,
                grid=(n_tiles,),
                in_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                out_specs=[pl.BlockSpec(memory_space=pl.ANY)] * 2,
                scratch_shapes=scratch,
            )
            post, _ = pl.pallas_call(
                kernel,
                out_shape=out_shape,
                grid_spec=gs,
                input_output_aliases={7: 0, 6: 1},
                compiler_params=params,
                interpret=interpret,
            )(lcols_j, lshifts_j, lmask_j, lent_j, fwd_j, pfetch_j,
              c2v_init, post_init)
        post3 = post.transpose(0, 3, 1, 2).reshape(B, nb, Z).astype(_C)
        hard = (post3 < 0).reshape(B, n).astype(jnp.uint8)
        conv = syndrome_ok(post3)
        iters = jnp.full((B,), max_iter, jnp.int32)
        return hard, iters, conv

    decode.variant = ("resident-et" if (resident and early_term)
                      else "stream-et" if stream_et
                      else "resident" if resident
                      else "static" if use_static else "dynamic")
    decode.post_dtype = post_dtype
    decode.msg_dtype = msg_dtype
    return decode


def make_decoder(code: LDPCCode, dec: DecoderConfig, quant: QuantConfig,
                 batch_tile: int = 128, interpret: bool = False):
    if dec.algorithm not in ("min-sum", "offset-min-sum",
                             "normalized-min-sum"):
        raise ValueError(f"streaming decoder supports the min-sum family, "
                         f"got {dec.algorithm}")
    if dec.schedule != "layered":
        raise ValueError("streaming decoder is layered-only")
    from ..config import cn_params
    beta, alpha = cn_params(dec, quant)
    return make_stream_decoder(code, max_iter=dec.max_iter, beta=beta,
                               qmax=quant.qmax, batch_tile=batch_tile,
                               interpret=interpret, alpha=alpha,
                               early_term=dec.early_term)
