"""Pallas TPU kernels: batched fixed-point min-sum / offset-min-sum decoding.

This is the framework's native hot loop — the TPU-first replacement for the
reference's sequential C message-passing loop (BASELINE.json:5 'the sequential
message-passing loop ... fixed-point saturation arithmetic'). The reference
walks checks one at a time on a CPU; here one kernel instance decodes a full
batch tile, with

  * batch split (sublane, lane) = (Bs, 128): every per-(base-column, Z-row)
    slot is a whole number of (8, 128) vregs when Bs % 8 == 0, so ALL
    elementwise work runs at 100% lane utilization,
  * the QC lifting dimension Z on the LEADING axis of each (Z, Bs, 128)
    block: a circulant rotation is a concatenation of two VREG-ALIGNED
    slices — pure addressing, no cross-sublane shuffles. (Round 1 put batch
    on lanes and Z on sublanes; with Z=27 every rotation then crossed vreg
    rows and Mosaic emitted shuffle chains — measured 1.9x slower per
    element, scripts/microbench_rot.py.)
  * circulant shifts are compile-time constants from the base matrix — no
    gathers in the inner loop,
  * all decoder state (int32 posteriors, c2v messages in a configurable
    storage dtype) is VMEM-resident; only channel LLRs in and hard bits out
    touch HBM,
  * the base-graph entry loops are fully unrolled at trace time (<= ~90
    entries for 802.11n), so Mosaic sees straight-line vector code,
  * sign bookkeeping rides in bit 31: the CN sign product is a running XOR
    of the raw int32 messages (bit31(a ^ b) = sign(a) XOR sign(b)), and the
    self-excluded sign is one more XOR — cheaper than materializing 0/1
    sign masks (which also cost i1-relayout workarounds on this toolchain).

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
  * sign(0) = +1 (bit 31 of 0 is clear, so the XOR form agrees exactly);
    posteriors accumulate exactly in int32 (|post| <= qmax*(dv+1) — the
    golden model's exact-accumulation contract),
  * hard bit = 1 iff posterior < 0; early termination LATCHES a lane's
    outputs (hard bits, iteration count) at its first syndrome success while
    the datapath runs unmasked — bit-identical to the golden per-codeword
    stop because lanes are independent.

Compute dtype is int32 throughout: this Mosaic toolchain fails to legalize
packed int16 vector compute (arith.maxsi on vector<...xi16> — re-verified
round 2, scripts/microbench_rot.py int16), so int8/int16 are storage-only.
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
_C = jnp.int32  # compute dtype (see module docstring)

LANES = 128


def _rot_fwd(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """y[r] = x[(r + s) % Z] along axis 0 (static s).

    Axis 0 indexes whole (Bs, 128) vreg blocks, so both slices and the
    concatenate are vreg-granular — no sublane shuffles."""
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


def _cn_minsum(v2cs, beta: int, alpha=None, qmax: int = None):
    """Unrolled min-sum CN update over one layer's entries.

    v2cs: list of (Z, Bs, 128) int32 messages. Pass qmax to fold the golden
    model's v2c saturation into the magnitude: |clip(v, +-qmax)| ==
    min(|v|, qmax) and clip preserves the sign (bit 31), so feeding RAW
    post - c2v differences with qmax set is bit-identical to feeding
    pre-clipped messages — one vector op cheaper per entry (min vs
    minimum+maximum). Returns list of (Z, Bs, 128) int32 c2v messages.

    Exclusion by value, not argmin: excl_t = (|v_t| == min1 ? min2 : min1).
    Ties give min2 == min1, so every tied entry gets min1 — identical to the
    golden model's stable-argmin semantics, two vector ops cheaper per entry.
    min1/min2 via the merge min2' = min(min2, max(min1, m)); min1' = min(min1,
    m), which needs no select chains. Sign parity is a running XOR of the RAW
    messages: bit 31 of the accumulator is the product sign, and one more XOR
    with v_t removes v_t's own sign — golden's sign(0) = +1 holds because
    bit 31 of zero is clear (and clipping never flips a sign).
    """
    mags = [jnp.abs(v) for v in v2cs]
    if qmax is not None:
        q = jnp.array(qmax, _C)
        mags = [jnp.minimum(m, q) for m in mags]
    min1 = mags[0]
    min2 = jnp.full_like(min1, jnp.array(1 << 14, _C))
    negacc = v2cs[0]
    for t in range(1, len(v2cs)):
        m = mags[t]
        min2 = jnp.minimum(min2, jnp.maximum(min1, m))
        min1 = jnp.minimum(min1, m)
        negacc = negacc ^ v2cs[t]
    # The scale/offset apply to the post-exclusion magnitude, so the raw min1
    # must survive for the |v| == min1 comparison; both transforms are
    # monotonic, so applying them to min1/min2 once per layer (cheap) equals
    # the golden model's per-edge post-exclusion application.
    min1_o, min2_o = min1, min2
    if alpha is not None:
        num = jnp.array(alpha[0], _C)
        sh = jnp.array(alpha[1], _C)
        min1_o = jax.lax.shift_right_arithmetic(min1_o * num, sh)
        min2_o = jax.lax.shift_right_arithmetic(min2_o * num, sh)
    if beta:
        zero = jnp.zeros_like(min1)
        beta_c = jnp.array(beta, _C)
        min1_o = jnp.maximum(min1_o - beta_c, zero)
        min2_o = jnp.maximum(min2_o - beta_c, zero)
    out = []
    for v, m in zip(v2cs, mags):
        mag = jnp.where(m == min1, min2_o, min1_o)
        excl = negacc ^ v  # bit31 = sign product excluding v itself
        out.append(jnp.where(excl < 0, -mag, mag))
    return out


def _cn_minstar(v2cs, thresholds, qmax: int):
    """Unrolled min* (approx sum-product) CN update over one layer's
    entries — the Pallas mirror of golden/decoder._cn_update_minstar and
    ops/decode_qc._cn_minstar (same pinned semantics: per-combine clip to
    [0, qmax], threshold-LUT Jacobian correction, +INF sentinel identity,
    prefix/suffix combines in entry order; bit-exact equality asserted in
    tests/test_minstar.py).

    v2cs may be RAW post - c2v differences: the leaf conversion clips the
    magnitude to qmax (clip preserves sign), after which every chain value
    is a materialized signed int32 exactly like the golden model — so the
    sign-of-zero convention (a zero-magnitude combine forgets its sign)
    is inherited rather than re-implemented. Sign products ride bit 31
    via x ^ y (sign(0) = +1 holds: bit 31 of zero is clear).

    Identity combines are specialized away: box(INF, x) == x for any
    already-clipped x, so pre/suf chains start at clipped leaves and the
    first/last outputs are the opposite chain's ends — 3d-6 pairwise
    combines instead of 3d-2. Cost per combine is ~4x a min-sum merge
    step (two corr LUTs of len(thresholds) compares each), the measured
    price of sum-product-grade CN arithmetic on the VPU."""
    q = jnp.array(qmax, _C)

    def corr(u):
        c = None
        for t in thresholds:
            m = (u <= jnp.array(t, _C)).astype(_C)
            c = m if c is None else c + m
        return c

    def bp2(x, y):
        ax, ay = jnp.abs(x), jnp.abs(y)
        mag = jnp.minimum(ax, ay)
        if thresholds:
            mag = mag + corr(ax + ay) - corr(jnp.abs(ax - ay))
        mag = jnp.clip(mag, 0, q)
        return jnp.where((x ^ y) < 0, -mag, mag)

    def leaf(v):
        av = jnp.minimum(jnp.abs(v), q)
        return jnp.where(v < 0, -av, av)

    d = len(v2cs)
    if d == 1:
        # box(INF, INF) -> clip(INF) = +qmax (the min-sum degree-1
        # convention, golden _cn_update_minstar docstring)
        return [jnp.full_like(v2cs[0], q)]
    leaves = [leaf(v) for v in v2cs]
    pre = [leaves[0]]                      # pre[i] = box(v[0..i])
    for i in range(1, d - 1):
        pre.append(bp2(pre[-1], leaves[i]))
    suf = [None] * d                       # suf[j] = box(v[j..d-1])
    suf[d - 1] = leaves[d - 1]
    for j in range(d - 2, 0, -1):
        suf[j] = bp2(leaves[j], suf[j + 1])
    out = [suf[1]]
    for i in range(1, d - 1):
        out.append(bp2(pre[i - 1], suf[i + 1]))
    out.append(pre[d - 2])
    return out


def vmem_bytes(code: LDPCCode, batch_tile: int = 256,
               schedule: str = "layered", c2v_dtype=jnp.int32,
               early_term: bool = False, fused_in: bool = False,
               counting: bool = False, mc: bool = False) -> int:
    """Estimated VMEM footprint of the decoder for one batch tile, including
    the double-buffered IO blocks, the fused-IO/MC scratch tiles, and a
    margin for Mosaic stack temporaries (calibrated against observed
    scoped-vmem usage: the early-termination path's latch/syndrome machinery
    costs ~40% extra on top of state+IO; plain fixed-iteration ~15%).

    fused_in: float32 LLR input blocks (4x wider) + int8 qchan scratch.
    counting: int8 hard-bit scratch; outputs shrink to per-lane rows.
    mc: megakernel — no input blocks (SMEM scalars), + int8 codeword
    scratch (mc implies fused_in and counting)."""
    qc = compile_qc_layout(code)
    n_entries = int((qc.layer_mask).sum())
    itemsize = jnp.dtype(c2v_dtype).itemsize
    tile = qc.nb * qc.Z * batch_tile
    post = tile * 4
    bufs = 2 if schedule == "flooding" else 1
    c2v = n_entries * qc.Z * batch_tile * itemsize
    if mc:
        fused_in = counting = True
        io = 0  # seeds/chanf ride SMEM; outputs are per-lane rows
    else:
        in_item = 4 if fused_in else 1
        out_item = 0 if counting else 1  # counting emits per-lane rows
        io = 2 * tile * (in_item + out_item)  # double-buffered
    extra = tile * ((1 if fused_in else 0)    # qchan int8
                    + (1 if counting else 0)  # hard-bit int8 scratch
                    + (1 if mc else 0))       # codeword int8
    margin = 1.4 if early_term else 1.15
    return int((bufs * post + c2v + io + extra) * margin)


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
    pre_transposed: bool = False,
    input_scale=None,
    count_info_cols=None,
    mc_batch=None,
    inject_random: bool = False,
    mc_inner_loop: bool = False,
    alpha=None,
    pair_layers: bool = False,
    mc_lane_sigma: bool = False,
    minstar=None,
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Build decode(chan_i8[B, n]) -> (hard[B, n] u8, iters[B] i32, conv[B] bool).

    B must be a multiple of batch_tile (the sweep driver pads). State per
    tile: posteriors (nb, Z, Bs, 128) int32 and messages (n_entries, Z, Bs,
    128) in c2v_dtype, all VMEM scratch; the grid iterates over batch tiles.
    batch_tile % 1024 == 0 selects the vreg-exact layout — the fast path;
    other tile sizes use the flat (Z, batch_tile) layout.
    c2v_dtype=int32 avoids two per-entry conversions when VMEM allows; int16/
    int8 halve/quarter the message footprint for bigger codes.

    Fused-IO extensions (both require pre_transposed; the Monte-Carlo fast
    path — measured ~0.8 ms/16k-batch of XLA-side fusions on v5e):
      input_scale: chan is float32 LLRs; the kernel quantizes during init
        with golden semantics (round half away from zero, clip to +-qmax),
        bit-identical to ops/quantize.quantize in float32.
      count_info_cols=kb: decode(chan_t, info_t[kb, Z, B]) returns
        (lane_bit_errs[B] i32, lane_frame_err[B] i8, iters[B], conv[B])
        instead of hard bits — error counting against the systematic info
        block happens in VMEM and the (nb, Z, B) hard output never touches
        HBM. Caller must verify info positions are the identity prefix.

    Monte-Carlo megakernel (mc_batch=B, with input_scale + count_info_cols):
    the ENTIRE simulation step runs inside the kernel — info bits from the
    per-core hardware PRNG (pltpu.prng_random_bits), the O(E) QC structured
    encode (codes/qcstruct.py ported to static rolls+XORs), BPSK + AWGN via
    Box-Muller, max-log demap, quantize, decode, count. HBM traffic drops to
    four per-lane counter rows; the XLA-side chain (measured 1.9 ms per 16k
    batch on v5e — a third of the whole pipeline) disappears.
      decode(seeds_i32[3], chanf_f32[2]) -> (bits, frame, iters, conv)
      chanf = [sigma, gain] with gain = 2*scale/sigma^2: the kernel computes
      q = quantize((x + sigma*n) * gain), x = 1-2c.
      mc_lane_sigma=True serves the FUSED multi-SNR sweep: decode(seeds,
      chanf_ignored, sigma_lane=(B,), gain_lane=(B,)) — per-lane noise
      rows shaped like the counter outputs, broadcast against the
      (Z, ...) datapath blocks (lane b simulates SNR point b % n_points).
    RNG contract: stream = f(seeds[0..2], grid tile index) — deterministic
    and reproducible for a fixed (seed, batch_tile); it is a DIFFERENT
    random family than the host threefry path, so device-rng counters are
    statistically, not bitwise, comparable to host-rng counters.
    inject_random=True (testing): the random words arrive as inputs
    decode(seeds, chanf, u_info[kb,Z,B], u_n1[nph,Z,B], u_n2[nph,Z,B]) so
    interpreter mode (which lacks prng_seed) can verify the full datapath
    bit-exactly against a jnp reference.
    """
    if code.base is None or code.Z is None:
        raise ValueError(f"{code.name}: Pallas decoder requires QC structure")
    if schedule not in ("flooding", "layered"):
        raise ValueError(schedule)
    if minstar is not None:
        if beta or alpha is not None:
            raise ValueError("min-star does not compose with beta/alpha")
        # the paired flooding sweep pads short layers with qmax entries —
        # an identity for min1/min2 merges but NOT for box-plus; min*
        # simply uses the unpaired sweep (bit-exact either way)
        pair_layers = False

    def cn_upd(v2cs, fold_qmax=True):
        """The layer CN update — min-sum family or min* box-plus. min*
        always clips leaf magnitudes (exact whether or not inputs are
        pre-clipped); the min-sum family folds the clip only when asked
        (fold_qmax=False: inputs already within +-qmax)."""
        if minstar is not None:
            return _cn_minstar(v2cs, minstar, qmax)
        return _cn_minsum(v2cs, beta, alpha,
                          qmax=qmax if fold_qmax else None)
    qc, layers = _qc_entries(code)
    Z, nb = qc.Z, qc.nb
    n = code.n
    # Layout selection: the (Z, Bs, 128) vreg layout needs Bs % 8 == 0 to be
    # vreg-exact; smaller tiles (VMEM-constrained codes, tiny test tiles)
    # would waste 8/Bs of every vreg there, so they keep the flat (Z, Bt)
    # layout (batch on lanes, Z on sublanes — rotations pay sublane shuffles
    # but lanes stay full).
    vreg_layout = batch_tile % (8 * LANES) == 0
    Bs = batch_tile // LANES if vreg_layout else 0
    bshape = (Bs, LANES) if vreg_layout else (batch_tile,)
    assert n == nb * Z
    # Flat entry index for c2v storage: entries ordered (layer, position).
    entry_of, off = [], 0
    for ents in layers:
        entry_of.append(list(range(off, off + len(ents))))
        off += len(ents)
    n_entries = off

    flooding = schedule == "flooding"
    mshape = (1,) + bshape  # per-lane masks/counters
    counting = count_info_cols is not None
    fused_in = input_scale is not None
    mc_mode = mc_batch is not None
    if (counting or fused_in) and not (pre_transposed or mc_mode):
        raise ValueError("fused-IO modes require pre_transposed=True")
    if mc_mode:
        if not (fused_in and counting):
            raise ValueError("mc_batch requires input_scale and "
                             "count_info_cols")
        from ..codes.qcstruct import detect_enc_struct
        enc_st = detect_enc_struct(code.base)
        if enc_st is None:
            raise ValueError(f"{code.name}: mc mode requires the encodable "
                             f"QC parity structure")
        if count_info_cols != enc_st.kb:
            raise ValueError("mc mode: count_info_cols must equal the "
                             "structural kb (identity info prefix)")
        assert mc_batch % batch_tile == 0, (mc_batch, batch_tile)
        nph = (nb + 1) // 2  # Box-Muller pairs covering nb blocks
    # Internal tile loop (mc mode only): ONE grid step runs every batch
    # tile via lax.fori_loop, eliminating the measured ~12.6 us of Mosaic
    # per-grid-step re-entry (scripts/diag_gridstep.py) — ~0.4 ms per 32-
    # tile 16k batch. The PRNG mix uses the tile index either way, so the
    # random stream is IDENTICAL to grid mode (equality-testable on
    # hardware, not just statistically comparable).
    mc_inner = bool(mc_inner_loop) and mc_batch is not None

    def kernel(*refs):
        it_refs = iter(refs)
        if mc_mode:
            seed_ref = next(it_refs)
            chanf_ref = next(it_refs)
            if mc_lane_sigma:
                sigl_ref = next(it_refs)
                gainl_ref = next(it_refs)
            if inject_random:
                uinfo_ref = next(it_refs)
                un1_ref = next(it_refs)
                un2_ref = next(it_refs)
            chan_ref = info_ref = None
        else:
            chan_ref = next(it_refs)
            info_ref = next(it_refs) if counting else None
        if counting:
            bits_ref = next(it_refs)
            frame_ref = next(it_refs)
        else:
            hard_ref = next(it_refs)
        iters_ref = next(it_refs)
        conv_ref = next(it_refs)
        post_ref = next(it_refs)
        c2v_ref = next(it_refs)
        tot_ref = next(it_refs) if flooding else None
        qchan_ref = next(it_refs) if (fused_in or mc_mode) else None
        if counting:
            hard_ref = next(it_refs)  # VMEM scratch, never leaves the chip
        cw_ref = next(it_refs) if mc_mode else None
        if mc_inner:
            # The per-tile body writes tiny per-tile cells; the tile loop
            # copies them into the full-batch outputs at the tile's offset.
            out_bits, out_frame = bits_ref, frame_ref
            out_iters, out_conv = iters_ref, conv_ref
            bits_ref = next(it_refs)
            frame_ref = next(it_refs)
            iters_ref = next(it_refs)
            conv_ref = next(it_refs)
        if mc_mode:
            info_ref = cw_ref  # info bits are the identity prefix of cw

        def run_tile(tile_idx):
            # Convergence masks are int32 0/1 (not bool): Mosaic rejects broadcast
            # relayouts of i1 vectors across sublanes, and multiply-by-mask is a
            # plain VPU op. done=1 freezes a lane (golden early-term semantics).
            if mc_mode:
                if not inject_random:
                    # Mosaic's prng_seed takes at most TWO 32-bit words: fold
                    # the GLOBAL tile index in with an odd-constant multiply
                    # (distinct (seed, tile) -> distinct pair). seed word 2
                    # is the tile BASE (round-3: a mesh shard passes
                    # shard_index * tiles_per_shard so device streams are
                    # disjoint AND continue the single-chip tile numbering —
                    # same bt + same global batch = bit-identical lanes on
                    # any mesh size; single chip passes 0, unchanged).
                    mix = ((seed_ref[2] + tile_idx)
                           * jnp.int32(-2048144789))  # 0x85EBCA6B
                    pltpu.prng_seed(seed_ref[0] ^ mix,
                                    seed_ref[1] + mix)
                if mc_lane_sigma:
                    # Per-LANE noise level (the fused multi-SNR sweep: lane
                    # b simulates point b % n_points): f32 rows shaped like
                    # the counter outputs; (Bs, 128) / (Bt,) broadcast
                    # against the (Z,)+bshape datapath tensors.
                    if not mc_inner:
                        sigma_f = sigl_ref[0]
                        gain_f = gainl_ref[0]
                    elif vreg_layout:
                        sigma_f = sigl_ref[0, pl.ds(tile_idx * Bs, Bs), :]
                        gain_f = gainl_ref[0, pl.ds(tile_idx * Bs, Bs), :]
                    else:
                        sigma_f = sigl_ref[0, pl.ds(tile_idx * batch_tile,
                                                    batch_tile)]
                        gain_f = gainl_ref[0, pl.ds(tile_idx * batch_tile,
                                                    batch_tile)]
                else:
                    sigma_f = chanf_ref[0]
                    gain_f = chanf_ref[1]

                def draw(idx, which):
                    """One (Z,)+bshape block of raw 32-bit random words."""
                    if inject_random:
                        src = {"info": uinfo_ref, "n1": un1_ref,
                               "n2": un2_ref}[which]
                        if not mc_inner:
                            return src[idx]
                        if vreg_layout:
                            return src[idx, :, pl.ds(tile_idx * Bs, Bs), :]
                        return src[idx, :,
                                   pl.ds(tile_idx * batch_tile, batch_tile)]
                    return pltpu.bitcast(
                        pltpu.prng_random_bits((Z,) + bshape), jnp.int32)

                # 1. info bits -- one random word per bit, LSB taken.
                for j in range(enc_st.kb):
                    cw_ref[j] = (draw(j, "info") & 1).astype(jnp.int8)

                # 2. structured QC encode (qc_encode_numpy ported; all shifts
                #    static). Check r of circulant C(s) reads variable (r+s)%Z,
                #    so C(s) x = _rot_fwd(x, s).
                def cwb(j):
                    return cw_ref[j].astype(_C)

                def lam_row(i, upto):
                    acc = None
                    for j in range(upto):
                        s = int(code.base[i, j])
                        if s >= 0:
                            r = _rot_fwd(cwb(j), s)
                            acc = r if acc is None else acc ^ r
                    return acc

                kb_e, cb_e = enc_st.kb, enc_st.cb
                lam_core = [lam_row(i, kb_e) for i in range(cb_e)]
                p0 = lam_core[0]
                for l_ in lam_core[1:]:
                    p0 = p0 ^ l_
                par_prev = p0
                cw_ref[kb_e] = p0.astype(jnp.int8)
                for t in range(cb_e - 1):
                    acc = lam_core[t]
                    s0 = int(code.base[t, kb_e])
                    if s0 >= 0:
                        acc = acc ^ _rot_fwd(p0, s0)
                    if t > 0:
                        acc = acc ^ par_prev
                    par_prev = acc
                    cw_ref[kb_e + t + 1] = acc.astype(jnp.int8)
                for e in range(cb_e, len(code.base)):
                    own = kb_e + cb_e + (e - cb_e)
                    acc = None
                    for j in range(kb_e + cb_e):
                        s = int(code.base[e, j])
                        if s >= 0:
                            r = _rot_fwd(cwb(j), s)
                            acc = r if acc is None else acc ^ r
                    cw_ref[own] = acc.astype(jnp.int8)

                # 3. BPSK + AWGN (Box-Muller pairs) + demap + quantize, fused:
                #    q = round_half_away((x + sigma*n) * gain) clipped to +-qmax,
                #    x = 1-2c, gain = 2*scale/sigma^2.
                def to_unit(w):
                    # top 24 bits -> (0, 1]: never 0, so log() is finite.
                    u = pltpu.bitcast(jax.lax.shift_right_logical(
                        pltpu.bitcast(w, jnp.uint32), jnp.uint32(8)), jnp.int32)
                    return (u.astype(jnp.float32) * jnp.float32(2.0 ** -24)
                            + jnp.float32(2.0 ** -25))

                qmax_f = jnp.float32(qmax)
                for p in range(nph):
                    f1 = to_unit(draw(p, "n1"))
                    f2 = to_unit(draw(p, "n2"))
                    r = jnp.sqrt(jnp.float32(-2.0) * jnp.log(f1))
                    th = jnp.float32(2.0 * np.pi) * f2
                    pair = ((2 * p, r * jnp.cos(th)), (2 * p + 1, r * jnp.sin(th)))
                    for j, nrm in pair:
                        if j >= nb:
                            continue
                        xf = (jnp.float32(1.0) - jnp.float32(2.0)
                              * cwb(j).astype(jnp.float32))
                        xs = (xf + sigma_f * nrm) * gain_f
                        q = jnp.where(xs >= 0, jnp.floor(xs + 0.5),
                                      jnp.ceil(xs - 0.5))
                        q = jnp.clip(q, -qmax_f, qmax_f).astype(_C)
                        qchan_ref[j] = q.astype(jnp.int8)
                        post_ref[j] = q

                def chan32(j):
                    return qchan_ref[j].astype(_C)
            elif fused_in:
                # In-kernel quantizer, bit-identical to ops/quantize.quantize in
                # float32: round half away from zero, symmetric clip.
                scale_f = jnp.float32(input_scale)
                qmax_f = jnp.float32(qmax)

                def quant32(j):
                    xs = chan_ref[j] * scale_f
                    r = jnp.where(xs >= 0, jnp.floor(xs + 0.5),
                                  jnp.ceil(xs - 0.5))
                    return jnp.clip(r, -qmax_f, qmax_f).astype(_C)

                for j in range(nb):
                    q = quant32(j)
                    qchan_ref[j] = q.astype(jnp.int8)
                    post_ref[j] = q

                def chan32(j):
                    return qchan_ref[j].astype(_C)
            else:
                def chan32(j):
                    return chan_ref[j].astype(_C)

                for j in range(nb):
                    post_ref[j] = chan32(j)
            if not (flooding and not early_term):
                # The specialized first flooding sweep below writes every c2v
                # entry, so the plain-flooding path skips this whole-buffer fill.
                c2v_ref[...] = jnp.zeros(c2v_ref.shape, c2v_ref.dtype)

            def emit_counts():
                """Per-lane info-bit error count + frame flag from the final
                (latched) hard bits vs the systematic info block — the XLA-side
                compare/reduce fusions move into VMEM."""
                bits = None
                for j in range(count_info_cols):
                    d = hard_ref[j].astype(_C) ^ info_ref[j].astype(_C)
                    s = jnp.sum(d, axis=0, keepdims=True)
                    bits = s if bits is None else bits + s
                bits_ref[...] = bits
                frame_ref[...] = (bits > 0).astype(jnp.int8)

            def syndrome_ok(read):
                """(1, Bs, 128) int32 — 1 where every check is satisfied."""
                unsat = None
                for ents in layers:
                    acc = None
                    for (j, s) in ents:
                        h = _rot_fwd(read(j), s)
                        acc = h if acc is None else acc ^ h
                    # bit 31 of acc = XOR of the signs = this check's parity
                    u = jnp.sum((acc < 0).astype(_I32), axis=0, keepdims=True)
                    unsat = u if unsat is None else unsat + u
                return (unsat == 0).astype(_C)

            def cn_sweep(read, emit, with_synd=False):
                """One full CN sweep. read(j): totals the update consumes.
                emit(j, s, e, old, new): handle the result.

                with_synd: also return the (1, Bs, 128) syndrome-ok mask of the
                STATE BEING READ, computed from the rolled posteriors the sweep
                gathers anyway — the sign-parity XOR rides bit 31 of the raw
                values, so it costs ONE xor per entry."""
                unsat = None
                for li, ents in enumerate(layers):
                    v2cs, olds, acc = [], [], None
                    for (j, s) in ents:
                        e = entry_of[li][len(olds)]
                        old = c2v_ref[e].astype(_C)
                        rolled = _rot_fwd(read(j), s)
                        if with_synd:
                            acc = rolled if acc is None else acc ^ rolled
                        v2cs.append(rolled - old)  # raw; qmax folds the clip
                        olds.append(old)
                    if with_synd:
                        u = jnp.sum((acc < 0).astype(_I32), axis=0, keepdims=True)
                        unsat = u if unsat is None else unsat + u
                    news = cn_upd(v2cs)
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
                keep = done_prev  # (1, Bs, 128) int32 0/1
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
                    reverted in round 1: it blew Mosaic compile time from ~3 min
                    to >25 min for a ~10% runtime saving.)"""
                    for j in range(nb):
                        dst[j] = chan32(j)

                    def emit(j, s, e, old, new):
                        c2v_ref[e] = new.astype(c2v_ref.dtype)
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

                    synd_state[0] = jnp.zeros(mshape, _C)
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

                def flood_first():
                    """Specialized iteration 1: every c2v is zero and totals
                    equal the channel LLRs (|q| <= qmax), so v2c = totals with
                    no c2v load, no subtract, no clip — and the sweep WRITES
                    every entry, replacing the whole-buffer zero fill."""
                    for j in range(nb):
                        tot_ref[j] = chan32(j)
                    for li, ents in enumerate(layers):
                        v2cs = [_rot_fwd(post_ref[j], s) for (j, s) in ents]
                        news = cn_upd(v2cs, fold_qmax=False)
                        for (j, s), e, new in zip(ents, entry_of[li], news):
                            c2v_ref[e] = new.astype(c2v_ref.dtype)
                            tot_ref[j] = tot_ref[j] + _rot_bwd(new, s)

                def run_plain():
                    flood_first()  # post -> tot
                    rem = max_iter - 1

                    def iter_pair(_, carry):
                        flood_iter(tot_ref, post_ref)
                        flood_iter(post_ref, tot_ref)
                        return carry

                    jax.lax.fori_loop(0, rem // 2, iter_pair, 0)
                    if rem % 2:
                        flood_iter(tot_ref, post_ref)
                        return lambda j: post_ref[j]
                    return lambda j: tot_ref[j]

                if pair_layers and not early_term:
                    # Paired flooding sweep (default via make_decoder; this
                    # builder's own default stays False): two INDEPENDENT base
                    # rows stacked on the sublane axis, halving the vector
                    # OP COUNT of the CN reduction (each op covers 2x the
                    # elements). Slots past the shorter row's degree ride as
                    # a +qmax constant: after the qmax fold every real
                    # magnitude is <= qmax and row degrees are >= 2, so a
                    # qmax candidate can never displace min1 or min2, and
                    # its clear sign bit leaves the parity XOR unchanged —
                    # bit-exact by construction (asserted vs the unpaired
                    # kernel in tests/test_kernels.py).
                    mb_l = len(layers)
                    GROUPS = [(i, i + 1) for i in range(0, mb_l - 1, 2)]
                    if mb_l % 2:
                        GROUPS.append((mb_l - 1, None))

                    def flood_pair(src, dst, first):
                        for j in range(nb):
                            dst[j] = chan32(j)
                        pad = jnp.full((Z,) + bshape, jnp.array(qmax, _C),
                                       _C)
                        for (la, lb) in GROUPS:
                            parts = [(layers[la], entry_of[la])]
                            if lb is not None:
                                parts.append((layers[lb], entry_of[lb]))
                            d = max(len(e) for e, _ in parts)
                            v2cs = []
                            for t in range(d):
                                halves = []
                                for ents, eids in parts:
                                    if t < len(ents):
                                        j, s = ents[t]
                                        r = _rot_fwd(src[j], s)
                                        if not first:
                                            r = r - c2v_ref[eids[t]].astype(
                                                _C)
                                        halves.append(r)
                                    else:
                                        halves.append(pad)
                                v2cs.append(halves[0] if len(halves) == 1
                                            else jnp.concatenate(halves,
                                                                 axis=0))
                            news = _cn_minsum(v2cs, beta, alpha,
                                              qmax=None if first else qmax)
                            # (paired sweep is min-sum-family only:
                            # minstar disables pair_layers above)
                            for t, new in enumerate(news):
                                for h, (ents, eids) in enumerate(parts):
                                    if t >= len(ents):
                                        continue
                                    j, s = ents[t]
                                    nh = (new if len(parts) == 1
                                          else new[h * Z:(h + 1) * Z])
                                    c2v_ref[eids[t]] = nh.astype(
                                        c2v_ref.dtype)
                                    dst[j] = dst[j] + _rot_bwd(nh, s)

                    def run_plain():  # noqa: F811
                        flood_pair(post_ref, tot_ref, True)
                        rem = max_iter - 1

                        def iter_pair(_, carry):
                            flood_pair(tot_ref, post_ref, False)
                            flood_pair(post_ref, tot_ref, False)
                            return carry

                        jax.lax.fori_loop(0, rem // 2, iter_pair, 0)
                        if rem % 2:
                            flood_pair(tot_ref, post_ref, False)
                            return lambda j: post_ref[j]
                        return lambda j: tot_ref[j]
            else:
                def layered_iter():
                    def emit(j, s, e, old, new):
                        c2v_ref[e] = new.astype(c2v_ref.dtype)
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
                zeros = jnp.zeros(mshape, _C)
                if flooding:
                    # Deferred-syndrome scheme: state 0's convergence comes out
                    # of the first sweep; the carry starts all-zero.
                    def scoped(synd_state):
                        done, iters = run_et(zeros, jnp.zeros(mshape, _I32),
                                             synd_state)
                        iters_ref[...] = iters
                        conv_ref[...] = done.astype(jnp.int8)

                    pl.run_scoped(scoped, pltpu.VMEM((1,) + mshape, _C))
                else:
                    done0 = syndrome_ok(lambda j: post_ref[j])
                    latch_hard(zeros, lambda j: post_ref[j])
                    done, iters = run_et(done0, jnp.zeros(mshape, _I32))
                    iters_ref[...] = iters
                    conv_ref[...] = done.astype(jnp.int8)
            else:
                final_read = run_plain()
                for j in range(nb):
                    # i1 -> int32 (same tiling) -> int8: avoids i1 retiling.
                    hard_ref[j] = (final_read(j) < 0).astype(_C).astype(jnp.int8)
                iters_ref[...] = jnp.full(mshape, max_iter, _I32)
                conv_ref[...] = syndrome_ok(final_read).astype(jnp.int8)
            if counting:
                emit_counts()

        if mc_inner:
            def tile_loop(t, _):
                run_tile(t)
                if vreg_layout:
                    sl = pl.ds(t * Bs, Bs)
                    out_bits[:, sl, :] = bits_ref[...]
                    out_frame[:, sl, :] = frame_ref[...]
                    out_iters[:, sl, :] = iters_ref[...]
                    out_conv[:, sl, :] = conv_ref[...]
                else:
                    sl = pl.ds(t * batch_tile, batch_tile)
                    out_bits[:, sl] = bits_ref[...]
                    out_frame[:, sl] = frame_ref[...]
                    out_iters[:, sl] = iters_ref[...]
                    out_conv[:, sl] = conv_ref[...]
                return 0

            jax.lax.fori_loop(0, mc_batch // batch_tile, tile_loop, 0)
        else:
            run_tile(pl.program_id(0))

    scratch = [
        pltpu.VMEM((nb, Z) + bshape, _C),                # post / totals A
        pltpu.VMEM((n_entries, Z) + bshape, c2v_dtype),  # c2v messages
    ]
    if flooding:
        scratch.append(pltpu.VMEM((nb, Z) + bshape, _C))  # totals B
    if fused_in or mc_mode:
        scratch.append(pltpu.VMEM((nb, Z) + bshape, jnp.int8))  # qchan
    if counting:
        scratch.append(pltpu.VMEM((nb, Z) + bshape, jnp.int8))  # hard bits
    if mc_mode:
        scratch.append(pltpu.VMEM((nb, Z) + bshape, jnp.int8))  # codeword
    if mc_inner:
        scratch += [pltpu.VMEM((1,) + bshape, _I32),    # bits cell
                    pltpu.VMEM((1,) + bshape, jnp.int8),  # frame cell
                    pltpu.VMEM((1,) + bshape, _I32),    # iters cell
                    pltpu.VMEM((1,) + bshape, jnp.int8)]  # conv cell
    import math as _math
    scratch_bytes = sum(
        _math.prod(s.shape) * jnp.dtype(s.dtype).itemsize for s in scratch)
    # Scoped-VMEM grant: scratch x1.7 Mosaic stack margin PLUS a flat 7 MB
    # for the pallas_call IO blocks, which share the same scoped budget but
    # are not in `scratch` (a fused-IO float32 input block at tile 512 is
    # ~1.3 MB, double-buffered, plus info/output/mask blocks — the layered+
    # ET+fused-IO combination measured 17 MB demand against the bare 16 MB
    # floor, and n=1944 layered+ET+fused at bt=1024 demanded 26.43 MB
    # against a 25.87 MB x1.6+6 grant, round 3). Capped at 40 MB: grants
    # in the verified-safe window (CLAUDE.md: the chip faults somewhere
    # between 42 and 69 MB).
    vmem_grant = min(40 * 2 ** 20,
                     max(16 * 2 ** 20, int(scratch_bytes * 1.7)) + 7 * 2 ** 20)

    in_dtype = jnp.float32 if fused_in else jnp.int8

    if mc_mode:
        B = mc_batch
        n_tiles = B // batch_tile
        if vreg_layout:
            bdims = (n_tiles * Bs, LANES)
            blockb = (Bs, LANES)
            state_idx = lambda i: (0, 0, i, 0)  # noqa: E731
            mask_idx = lambda i: (0, i, 0)  # noqa: E731
        else:
            bdims = (B,)
            blockb = (batch_tile,)
            state_idx = lambda i: (0, 0, i)  # noqa: E731
            mask_idx = lambda i: (0, i)  # noqa: E731
        mask_block = (1,) + blockb
        mask_full = (1,) + bdims
        mask_spec = pl.BlockSpec(mask_block, mask_idx,
                                 memory_space=pltpu.VMEM)
        smem_spec = pl.BlockSpec(memory_space=pltpu.SMEM)

        def decode_mc(seeds: jnp.ndarray, chanf: jnp.ndarray,
                      u_info: jnp.ndarray = None, u_n1: jnp.ndarray = None,
                      u_n2: jnp.ndarray = None, *,
                      sigma_lane: jnp.ndarray = None,
                      gain_lane: jnp.ndarray = None):
            """seeds: (3,) int32 [key_hi, key_lo, stream]; chanf: (2,)
            float32 [sigma, gain]. Returns per-lane (bit_errs i32,
            frame_err i32, iters i32, conv bool), each (B,).

            mc_lane_sigma mode (the fused multi-SNR sweep): sigma_lane and
            gain_lane are (B,) float32 per-lane noise parameters; chanf is
            ignored by the datapath (pass zeros)."""
            in_specs = [smem_spec, smem_spec]
            inputs = [seeds.astype(jnp.int32), chanf.astype(jnp.float32)]
            full_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
            if ((sigma_lane is not None) != mc_lane_sigma
                    or (gain_lane is not None) != mc_lane_sigma):
                raise ValueError(
                    "sigma_lane and gain_lane must BOTH be given exactly "
                    f"when mc_lane_sigma={mc_lane_sigma}")
            if mc_lane_sigma:
                for row in (sigma_lane, gain_lane):
                    in_specs.append(full_spec if mc_inner else mask_spec)
                    inputs.append(row.astype(jnp.float32).reshape(mask_full))
            if inject_random:
                assert u_info is not None
                for u, rows in ((u_info, enc_st.kb), (u_n1, nph),
                                (u_n2, nph)):
                    in_specs.append(full_spec if mc_inner else pl.BlockSpec(
                        (rows, Z) + blockb, state_idx,
                        memory_space=pltpu.VMEM))
                    inputs.append(u.astype(jnp.int32)
                                  .reshape((rows, Z) + bdims))
            bits, frame, iters, conv = pl.pallas_call(
                kernel,
                grid=(1,) if mc_inner else (n_tiles,),
                in_specs=in_specs,
                out_specs=[full_spec if mc_inner else mask_spec] * 4,
                out_shape=[
                    jax.ShapeDtypeStruct(mask_full, _I32),
                    jax.ShapeDtypeStruct(mask_full, jnp.int8),
                    jax.ShapeDtypeStruct(mask_full, _I32),
                    jax.ShapeDtypeStruct(mask_full, jnp.int8),
                ],
                scratch_shapes=scratch,
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem_grant),
                interpret=interpret,
            )(*inputs)
            return (bits.reshape(B), frame.reshape(B).astype(jnp.int32),
                    iters.reshape(B), conv.reshape(B).astype(jnp.bool_))

        return decode_mc

    def decode(chan: jnp.ndarray, info: jnp.ndarray = None):
        """chan: (B, n) int8, or (nb, Z, B) when pre_transposed (the
        transposed-pipeline fast path: the caller's chain runs batch-last,
        so feeding the kernel layout is a pure reshape — no 10-MB int8
        transposes in or out). float32 LLRs when input_scale is set.
        info: (kb, Z, B) uint8 systematic bits when count_info_cols."""
        B = chan.shape[-1] if pre_transposed else chan.shape[0]
        assert B % batch_tile == 0, (B, batch_tile)
        assert (info is not None) == counting
        n_tiles = B // batch_tile
        if vreg_layout:
            # kernel layout (nb, Z, T*Bs, 128): variable v = j*Z + r of
            # codeword b = t*Bt + u*128 + l lands at [j, r, t*Bs + u, l].
            if pre_transposed:
                chan_t = chan.astype(in_dtype).reshape(
                    nb, Z, n_tiles * Bs, LANES)
            else:
                chan_t = (chan.astype(in_dtype)
                          .reshape(n_tiles * Bs, LANES, nb, Z)
                          .transpose(2, 3, 0, 1))
            bdims = (n_tiles * Bs, LANES)
            blockb = (Bs, LANES)
            state_idx = lambda i: (0, 0, i, 0)  # noqa: E731
            mask_idx = lambda i: (0, i, 0)  # noqa: E731
        else:
            # kernel layout (nb, Z, B): batch on lanes, Z on sublanes.
            if pre_transposed:
                chan_t = chan.astype(in_dtype).reshape(nb, Z, B)
            else:
                chan_t = (chan.astype(in_dtype)
                          .reshape(B, nb, Z).transpose(1, 2, 0))
            bdims = (B,)
            blockb = (batch_tile,)
            state_idx = lambda i: (0, 0, i)  # noqa: E731
            mask_idx = lambda i: (0, i)  # noqa: E731
        state_block = (nb, Z) + blockb
        mask_block = (1,) + blockb
        state_full = (nb, Z) + bdims
        mask_full = (1,) + bdims
        state_spec = pl.BlockSpec(state_block, state_idx,
                                  memory_space=pltpu.VMEM)
        mask_spec = pl.BlockSpec(mask_block, mask_idx,
                                 memory_space=pltpu.VMEM)
        in_specs = [state_spec]
        inputs = [chan_t]
        if counting:
            kb = count_info_cols
            info_t = info.astype(jnp.int8).reshape((kb, Z) + bdims)
            in_specs.append(pl.BlockSpec((kb, Z) + blockb, state_idx,
                                         memory_space=pltpu.VMEM))
            inputs.append(info_t)
            out_specs = [mask_spec, mask_spec, mask_spec, mask_spec]
            out_shape = [
                jax.ShapeDtypeStruct(mask_full, _I32),     # lane bit errs
                jax.ShapeDtypeStruct(mask_full, jnp.int8),  # lane frame err
                jax.ShapeDtypeStruct(mask_full, _I32),     # iters
                jax.ShapeDtypeStruct(mask_full, jnp.int8),  # conv
            ]
        else:
            out_specs = [state_spec, mask_spec, mask_spec]
            out_shape = [
                jax.ShapeDtypeStruct(state_full, jnp.int8),
                jax.ShapeDtypeStruct(mask_full, _I32),
                jax.ShapeDtypeStruct(mask_full, jnp.int8),
            ]
        out = pl.pallas_call(
            kernel,
            grid=(n_tiles,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=vmem_grant),
            interpret=interpret,
        )(*inputs)
        if counting:
            bits, frame, iters, conv = out
            return (bits.reshape(B), frame.reshape(B).astype(jnp.int32),
                    iters.reshape(B), conv.reshape(B).astype(jnp.bool_))
        hard_t, iters, conv = out
        if pre_transposed:
            hard = hard_t.reshape(nb, Z, B).astype(jnp.uint8)
        elif vreg_layout:
            hard = (hard_t.transpose(2, 3, 0, 1)
                    .reshape(B, n).astype(jnp.uint8))
        else:
            hard = hard_t.transpose(2, 0, 1).reshape(B, n).astype(jnp.uint8)
        return (hard, iters.reshape(B), conv.reshape(B).astype(jnp.bool_))

    return decode


def make_decoder(code: LDPCCode, dec: DecoderConfig, quant: QuantConfig,
                 batch_tile: int = 256, interpret: bool = False,
                 c2v_dtype=jnp.int32, pre_transposed: bool = False,
                 input_scale=None, count_info_cols=None, mc_batch=None,
                 inject_random: bool = False, mc_inner_loop: bool = False,
                 mc_lane_sigma: bool = False):
    """Factory from configs, mirroring ops.decode_ref.make_decoder.

    The plain-flooding path defaults to the PAIRED sweep (two base rows per
    vector op — bit-exact either way, measured ~2% faster end-to-end on
    v5e: scripts/diag_pair.py 7.10 vs 7.22 ms/16k decode, bench 1.056 vs
    1.029 Gb/s). LDPC_PAIR_LAYERS=0/1 overrides for A/B measurement."""
    if dec.algorithm not in ("min-sum", "offset-min-sum",
                             "normalized-min-sum", "min-star"):
        raise ValueError(f"Pallas decoder supports the min-sum family and "
                         f"min-star, got {dec.algorithm}")
    import os
    from ..config import cn_params, minstar_thresholds
    if dec.algorithm == "min-star":
        beta, alpha = 0, None
        minstar = minstar_thresholds(quant)
    else:
        beta, alpha = cn_params(dec, quant)
        minstar = None
    return make_pallas_decoder(
        code, max_iter=dec.max_iter, beta=beta, qmax=quant.qmax, alpha=alpha,
        schedule=dec.schedule, early_term=dec.early_term,
        batch_tile=batch_tile, interpret=interpret, c2v_dtype=c2v_dtype,
        pre_transposed=pre_transposed, input_scale=input_scale,
        count_info_cols=count_info_cols, mc_batch=mc_batch,
        inject_random=inject_random, mc_inner_loop=mc_inner_loop,
        mc_lane_sigma=mc_lane_sigma, minstar=minstar,
        pair_layers=os.environ.get("LDPC_PAIR_LAYERS", "1") == "1")
