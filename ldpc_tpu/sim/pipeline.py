"""The jitted end-to-end simulation step (SURVEY.md §3.1 'NEW FRAMEWORK').

The reference's per-frame chain encode -> bpsk -> awgn -> demap -> quantize ->
decode -> count (its main() hot path) is compiled here into ONE XLA program per
chip over a sharded codeword batch. Only five scalar counters leave the device
per superbatch — the psum the survey names (BASELINE.json:5) is inserted by
XLA when the replicated scalar outputs are reduced from the batch-sharded
tensors.

Determinism contract (SURVEY.md §4.2 'Distributed'): the threefry RNG is run
in partitionable mode, so the SAME seed produces the SAME counters on a
1-device and an 8-device mesh — each chip generates exactly its shard of the
global random stream.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..codes.code import LDPCCode
from ..config import SimConfig
from ..ops import channel as ch
from ..ops.decode_ref import make_decoder as make_jnp_decoder
from ..ops.encode import info_positions, make_encoder
from ..ops.quantize import quantize

jax.config.update("jax_threefry_partitionable", True)


FLOAT_ALGOS = ("sum-product", "min-sum-float", "offset-min-sum-float",
               "normalized-min-sum-float")


def is_float_mode(cfg: SimConfig) -> bool:
    """Float decoding (the reference's MATLAB golden path): no quantizer, the
    float BP decoder consumes raw LLRs (SURVEY.md §2.1 C12)."""
    return cfg.decoder.algorithm in FLOAT_ALGOS


def maybe_shard_map_decoder(dec, dec_label: str, mesh, batch: int):
    """Wrap a batch-first Pallas decoder in shard_map when a mesh is given
    (and the per-shard batch divides the decoder's tile): the SPMD
    partitioner treats a Pallas kernel as an opaque custom call and would
    gather + replicate around it on a real multi-chip mesh; shard_map pins
    per-device execution on the local batch shard — bit-identical (lanes
    independent; counter identity pinned in tests/test_mesh_backends.py)
    and collective-free until the counter psums. Returns dec unchanged
    when not applicable. The decoder's batch_tile attribute is preserved
    (the two-phase tuner reads it)."""
    tile = max(getattr(dec, "batch_tile", 1), 1)
    if (mesh is None or dec_label not in ("pallas", "pallas-stream")
            or (batch // mesh.size) % tile != 0):
        return dec
    axes = mesh.axis_names

    def wrapped(q):
        return jax.shard_map(
            dec, mesh=mesh, in_specs=P(axes, None),
            out_specs=(P(axes, None), P(axes), P(axes)),
            check_vma=False)(q)

    wrapped.batch_tile = tile
    return wrapped


def select_decoder(code: LDPCCode, cfg: SimConfig, backend: str = "auto",
                   batch_tile: int = 1024, interpret: bool = False,
                   batch: Optional[int] = None,
                   pre_transposed: bool = False,
                   fused_io: Optional[tuple] = None,
                   mc_batch: Optional[int] = None,
                   mc_inner_loop: bool = True,
                   mc_lane_sigma: bool = False):
    """Decoder dispatch: the Pallas kernel on TPU, the jnp reference op
    elsewhere (SURVEY.md §2.1 C8: kernel + pure-XLA fallback); float
    algorithms always use the jnp float decoder.

    When cfg.decoder.phase1_iters is set (and early_term, and the caller
    supplies `batch`), the returned decoder is the two-phase repacking
    wrapper (make_two_phase_decoder) around the chosen backend."""
    # Accept our own emitted labels as backend requests: Sweep resolves the
    # backend once and feeds the LABEL back into make_run_batch so the
    # plain/fused builds agree. "pallas-stream" re-resolves through the
    # "pallas" ladder (deterministic: the same fits-probe picks the stream
    # kernel again); the "-2phase" suffix is re-derived from cfg below.
    if backend.endswith("-2phase"):
        backend = backend[: -len("-2phase")]
    if backend == "pallas-stream":
        backend = "pallas"
    elif backend == "jnp-float":
        backend = "auto"  # float mode returns early below regardless
    if is_float_mode(cfg):
        from ..ops.decode_ref import make_float_decoder
        alg = cfg.decoder.algorithm.replace("-float", "")
        if alg == "normalized-min-sum":
            # the float NMS factor rides the beta slot (see _cn_update_float)
            beta_f = cfg.quant.alpha_num / (1 << cfg.quant.alpha_shift)
        else:
            beta_f = cfg.quant.beta_lsb / cfg.quant.scale  # LLR-domain offset
        return make_float_decoder(
            code, max_iter=cfg.decoder.max_iter, algorithm=alg, beta=beta_f,
            early_term=cfg.decoder.early_term,
            schedule=cfg.decoder.schedule), "jnp-float"

    chosen_bt = [1]  # batch-tile granularity of the built decoder

    def build(dec_cfg):
        """Decoder for an arbitrary DecoderConfig on the resolved backend."""
        b = backend
        if dec_cfg.algorithm == "min-star":
            # min* runs the Pallas VMEM kernel (unrolled prefix/suffix
            # box-plus in the layer sweep, minsum_pallas._cn_minstar) in
            # the VMEM regime; the HBM streaming kernel has no min*
            # variant, so big codes fall to the QC-XLA backend below.
            if code.base is None or code.Z is None:
                raise ValueError("min-star requires a QC code")
        if b == "auto":
            plat = jax.default_backend()
            b = "pallas" if plat in ("tpu", "axon") else "jnp"
        if dec_cfg.algorithm == "min-star" and b == "jnp":
            b = "qc-jnp"  # the edge-gather jnp decoder has no min* update
        if b == "pallas":
            from ..kernels import minsum_pallas as mp
            if code.base is None or code.Z is None:
                return make_jnp_decoder(code, dec_cfg, cfg.quant), "jnp"
            # Pick (batch_tile, c2v dtype): big vreg-aligned tiles beat wide
            # c2v storage, so narrow the dtype BEFORE shrinking the tile.
            # Beyond 128 lanes + int8, the HBM-resident regime (SURVEY.md
            # §5.7) takes over (DVB-S2 n=64800, NR Z=384).
            #
            # Admission budget, round-3 recalibration at the verified 40 MB
            # grant window (scripts/diag_vmem_ladder.py). Raised from the
            # round-2 14 MB: NR BG1 Z=128 moves onto the VMEM kernel at
            # bt=128 (15.3 MB est, 1.05x over its stream routing) and
            # 802.11n ET+fused onto bt=512 (14.5 MB est, matches bt=1024's
            # 11.5-11.9 ms within noise). NOT raised further: two
            # admitted-at-29-MB shapes (NR bt=256 est 30.6; 802.11n n=1944
            # layered+ET+fused bt=512 est 27.2) hit Mosaic stack OOMs whose
            # demand CHASES the grant (26.4M@25.9 -> 33.6M@28.1), so they
            # cannot be granted around — 22 MB keeps every measured win
            # while excluding both.
            VMEM_BUDGET = 22 * 2 ** 20
            et = dec_cfg.early_term
            bt, dt, fits = batch_tile, jnp.int32, False
            while True:
                for dt in (jnp.int32, jnp.int16, jnp.int8):
                    if mp.vmem_bytes(code, bt, dec_cfg.schedule, dt, et,
                                     fused_in=fused_io is not None,
                                     counting=fused_io is not None,
                                     mc=mc_batch is not None
                                     ) <= VMEM_BUDGET:
                        fits = True
                        break
                if fits or bt <= 128:
                    break
                bt //= 2
            if not fits:
                # HBM-resident regime: the streaming Pallas kernel where its
                # domain applies (layered; early termination additionally
                # needs the posterior-resident variant to fit — probe and
                # fall back to the QC-structured XLA decoder otherwise).
                if dec_cfg.schedule == "layered":
                    from ..kernels.minsum_stream import make_decoder as m_st
                    try:
                        st = m_st(code, dec_cfg, cfg.quant,
                                  interpret=interpret)
                        chosen_bt[0] = 128  # stream decode asserts B % tile
                        return st, "pallas-stream"
                    except ValueError:
                        pass  # outside the stream kernel's domain
                b = "qc-jnp"
            else:
                chosen_bt[0] = bt
                scale, kb = fused_io if fused_io else (None, None)
                return mp.make_decoder(code, dec_cfg, cfg.quant,
                                       batch_tile=bt, interpret=interpret,
                                       c2v_dtype=dt,
                                       pre_transposed=pre_transposed,
                                       input_scale=scale,
                                       count_info_cols=kb,
                                       mc_batch=mc_batch,
                                       mc_inner_loop=mc_inner_loop,
                                       mc_lane_sigma=mc_lane_sigma), "pallas"
        if b == "qc-jnp":
            from ..ops.decode_qc import make_decoder as make_qc
            return make_qc(code, dec_cfg, cfg.quant), "qc-jnp"
        return make_jnp_decoder(code, dec_cfg, cfg.quant), "jnp"

    dec, label = build(cfg.decoder)
    dec.batch_tile = chosen_bt[0]  # tile granularity (mc tile-base seeding)
    p1 = cfg.decoder.phase1_iters
    # phase1_iters == -1 is the AUTO sentinel (sim/tune.py): the Sweep
    # driver probes the convergence CDF per SNR point and rebuilds with an
    # explicit (p1, cap); a direct build treats it as single-phase.
    if (p1 and p1 > 0 and cfg.decoder.early_term and batch
            and p1 < cfg.decoder.max_iter):
        import dataclasses
        dec_p1, _ = build(dataclasses.replace(cfg.decoder, max_iter=p1))
        # capacity: phase2_frac of the batch, rounded up to the decoder's
        # batch-tile granularity (phase-2 shapes must divide the tile).
        g = chosen_bt[0]
        want = max(int(batch * cfg.decoder.phase2_frac), g)
        cap = min(batch, -(-want // g) * g)
        if pre_transposed:
            # round-3: two-phase composes with the transposed fast path —
            # lane gather/scatter on the TRAILING axis, fused counting kept
            tp = make_two_phase_decoder_t(
                dec_p1, dec, cap,
                counting=fused_io is not None and fused_io[1] is not None)
        else:
            tp = make_two_phase_decoder(dec_p1, dec, cap)
        tp.batch_tile = g
        return tp, label + "-2phase"
    return dec, label


def make_two_phase_decoder_t(dec_p1, dec_full, capacity: int,
                             counting: bool):
    """Two-phase ET for the TRANSPOSED (batch-last) decoders (round 3):
    same exactness argument as make_two_phase_decoder below, with the lane
    gather/scatter on the TRAILING axis. Composes with fused in-kernel
    counting (counting=True): the per-lane count rows repack exactly like
    hard bits would, so the hard bits never need to leave VMEM.

    decode(llr_t[nb, Z, B], info_t[kb, Z, B]) when counting, else
    decode(llr_t) — matching the wrapped decoders' signatures."""
    def pad_last(x):
        return jnp.concatenate(
            [x, jnp.zeros(x.shape[:-1] + (1,), x.dtype)], axis=-1)

    def decode(llr_t, info_t=None):
        B = llr_t.shape[-1]
        args1 = (llr_t, info_t) if counting else (llr_t,)
        out1 = dec_p1(*args1)
        cv1 = out1[-1]
        uncv = jnp.logical_not(cv1.astype(bool))
        n_uncv = jnp.sum(uncv, dtype=jnp.int32)

        def two_phase(_):
            idx = jnp.nonzero(uncv, size=capacity, fill_value=B)[0]
            llr2 = pad_last(llr_t)[..., idx]
            args2 = (llr2, pad_last(info_t)[..., idx]) if counting \
                else (llr2,)
            out2 = dec_full(*args2)

            def merge(a, b):
                ap = jnp.concatenate(
                    [a, jnp.zeros(a.shape[:-1] + (1,), a.dtype)], axis=-1)
                return jnp.moveaxis(
                    jnp.moveaxis(ap, -1, 0).at[idx].set(
                        jnp.moveaxis(b, -1, 0)), 0, -1)[..., :B]

            return tuple(merge(a, b) for a, b in zip(out1, out2))

        def full(_):
            return tuple(dec_full(*args1))

        return jax.lax.cond(n_uncv <= capacity, two_phase, full, None)

    decode.capacity = capacity
    return decode


def make_two_phase_decoder(dec_p1, dec_full, capacity: int):
    """Early termination that PAYS on TPU (VERDICT round-1 item 2).

    A single straggler lane pins a whole SIMD batch tile at max_iter, so
    in-kernel per-lane early termination saves little wall time. Instead:

      phase 1: dec_p1 (ET kernel, few iterations) on the full batch —
               latches every lane that converges early;
      repack:  gather the unconverged lanes into a `capacity`-lane batch
               (static shape; jnp.nonzero with size=);
      phase 2: dec_full (ET kernel, full max_iter) on the compacted batch,
               RESTARTING from channel LLRs — bit-exact because integer
               min-sum is deterministic: the restart replays the identical
               iteration trajectory, so hard bits, convergence flags, and
               first-success iteration counts equal the single-phase run;
      overflow: if more than `capacity` lanes are unconverged (wrong
               operating point), fall back to dec_full on the whole batch
               via lax.cond — still exact, just not faster.

    Gather fill positions point at a padding row appended to the batch, so
    scatter-back indices for REAL lanes are unique (no write races).
    """
    def decode(q: jnp.ndarray):
        B = q.shape[0]
        h1, it1, cv1 = dec_p1(q)
        uncv = jnp.logical_not(cv1)
        n_uncv = jnp.sum(uncv, dtype=jnp.int32)

        def two_phase(_):
            # fill entries index the padding row B — harmless gather, and
            # their scatter writes land on the padding row (sliced off).
            idx = jnp.nonzero(uncv, size=capacity, fill_value=B)[0]
            qpad = jnp.concatenate([q, jnp.zeros((1,) + q.shape[1:],
                                                 q.dtype)], axis=0)
            h2, it2, cv2 = dec_full(qpad[idx])
            hp = jnp.concatenate([h1, jnp.zeros((1,) + h1.shape[1:],
                                                h1.dtype)], axis=0)
            itp = jnp.concatenate([it1, jnp.zeros((1,), it1.dtype)])
            cvp = jnp.concatenate([cv1, jnp.zeros((1,), cv1.dtype)])
            hp = hp.at[idx].set(h2)
            itp = itp.at[idx].set(it2)
            cvp = cvp.at[idx].set(cv2)
            return hp[:B], itp[:B], cvp[:B]

        def full(_):
            return dec_full(q)

        return jax.lax.cond(n_uncv <= capacity, two_phase, full, None)

    decode.capacity = capacity
    return decode


@dataclass(frozen=True)
class BatchCounters:
    """Scalar results of one superbatch (device-reduced)."""
    frames: int
    bit_errs: int        # info-bit errors (the north-star counts info bits)
    frame_errs: int
    iter_sum: int
    converged: int

    def __add__(self, o: "BatchCounters") -> "BatchCounters":
        return BatchCounters(
            self.frames + o.frames, self.bit_errs + o.bit_errs,
            self.frame_errs + o.frame_errs, self.iter_sum + o.iter_sum,
            self.converged + o.converged)

    @staticmethod
    def zero() -> "BatchCounters":
        return BatchCounters(0, 0, 0, 0, 0)


def make_run_batch(
    code: LDPCCode,
    cfg: SimConfig,
    batch: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    decoder_backend: str = "auto",
    batch_tile: int = 1024,
    interpret: bool = False,
    n_points: int = 1,
    superbatches: int = 1,
    rng: Optional[str] = None,
) -> Callable[[jax.Array, jnp.ndarray], Tuple[jnp.ndarray, ...]]:
    """Returns jitted run_batch(key, sigma) -> int32 array (5,) stacking
    (frames, bit_errs, frame_errs, iter_sum, converged). sigma is a traced
    scalar so one compilation covers the whole SNR sweep. With a mesh, the
    batch dimension is sharded over every mesh axis via explicit constraints.

    superbatches > 1 accumulates that many sub-batches inside ONE device
    call (lax.fori_loop over folded sub-keys): on the tunneled platform each
    dispatch/fetch costs ~4 round trips (~200 ms), so a single call must
    carry enough compute to amortize it. Counters sum exactly; the RNG key
    space is (call_key, sub_index), so resume stays sample-exact at call
    granularity.

    n_points > 1 is the fused-SNR-sweep mode (SURVEY.md §2.3 'sweep
    parallelism'): sigma becomes a (n_points,) vector, lane b simulates point
    b % n_points, and every counter comes back with shape (n_points,) — all
    SNR points of a sweep advance inside one sharded device program."""
    B = batch or cfg.run.batch
    # the kernel tile must divide the batch; halve until it does (non-
    # power-of-two batches, e.g. fused sweeps striping 6 points, land on
    # a smaller tile automatically)
    while batch_tile > 128 and B % batch_tile:
        batch_tile //= 2
    mod = cfg.channel.modulation
    enc = make_encoder(code)
    float_mode = is_float_mode(cfg)
    info_pos = jnp.asarray(info_positions(code))

    # Transposed fast path: run the whole chain batch-LAST so the Pallas
    # kernel's (nb, Z, B) layout is a pure reshape — the (B, n) <-> kernel
    # transposes cost ~1.3 ms per 16k batch of int8 on this chip (measured,
    # scripts/diag_split.py), a sixth of the whole pipeline. Applies to the
    # elementwise-only chain (BPSK, no rate matching, single sigma) on the
    # VMEM Pallas decoder; everything else keeps the batch-first layout.
    rng_mode = rng if rng is not None else cfg.run.rng
    # Round-3 (VERDICT item 2): every modulation rides the transposed fast
    # path — channel.modulate_t/awgn_t/demap_t are native batch-LAST ops,
    # and per-lane sigma (B,) broadcasts naturally against trailing-B
    # shapes, so fused multi-SNR sweeps (n_points > 1) compose too.
    two_phase = bool(cfg.decoder.phase1_iters
                     and cfg.decoder.phase1_iters > 0
                     and cfg.decoder.early_term
                     and cfg.decoder.phase1_iters < cfg.decoder.max_iter)
    transposed = (not float_mode
                  and code.n % ch.BITS_PER_SYM[mod] == 0
                  and not cfg.run.all_zeros
                  and not (len(code.punct_vns) or len(code.shortened_vns))
                  and code.base is not None and code.Z is not None
                  and code.n <= 4096)
    fused_io = None
    mc = False
    if transposed:
        # Fused-IO upgrade: quantize inside the kernel (float32 LLR input)
        # and, when the info bits are the identity prefix of the codeword
        # (systematic QC codes), count info-bit errors in VMEM too — the
        # XLA-side quantize and compare/reduce fusions cost ~0.8 ms per 16k
        # batch on v5e (docs/PERFORMANCE.md).
        ident_info = (code.k % code.Z == 0
                      and np.array_equal(info_positions(code),
                                         np.arange(code.k)))
        fused_io = (float(cfg.quant.scale),
                    code.k // code.Z if ident_info else None)
        # Device-RNG Monte-Carlo megakernel (kernels/minsum_pallas.py mc
        # mode): the whole chain runs in the kernel off the hardware PRNG.
        # BPSK only (the in-kernel channel is the per-bit real AWGN chain);
        # needs the structural encoder and identity info prefix. Round-3
        # (VERDICT item 5): meshes are in-domain — each shard runs the
        # kernel on its B/size lanes under shard_map with seed word 2 set
        # to shard_index * tiles_per_shard, so device streams are disjoint
        # and CONTINUE the single-chip tile numbering (same batch_tile +
        # same global batch => bit-identical lanes on any mesh size).
        B_mc = B // mesh.size if mesh is not None else B
        # The megakernel tile must divide the PER-SHARD batch (its grid/
        # inner loop is per shard); halve until it does. NOTE the device-
        # PRNG stream identity is (seed, global tile of batch_tile lanes):
        # counters are mesh-size invariant IFF the resolved tile matches —
        # pass an explicit batch_tile that divides every mesh size's
        # B/size for cross-mesh-reproducible device-RNG runs (the host
        # threefry path is unconditionally mesh-invariant).
        bt_mc = min(batch_tile, B_mc)
        while bt_mc > 128 and B_mc % bt_mc:
            bt_mc //= 2
        if (mod == "bpsk" and rng_mode == "device" and not two_phase
                and fused_io[1] is not None
                and B_mc % bt_mc == 0 and B_mc % 128 == 0):
            from ..codes.qcstruct import detect_enc_struct
            mc = detect_enc_struct(code.base) is not None
        dec, dec_label = select_decoder(
            code, cfg, decoder_backend,
            bt_mc if mc else min(batch_tile, B), interpret,
            batch=B, pre_transposed=True, fused_io=fused_io,
            mc_batch=B_mc if mc else None,
            mc_lane_sigma=mc and n_points > 1)
        if dec_label not in ("pallas", "pallas-2phase"):
            transposed = False
            mc = False
    if not transposed:
        dec, dec_label = select_decoder(code, cfg, decoder_backend,
                                        min(batch_tile, B), interpret,
                                        batch=B)
        dec = maybe_shard_map_decoder(dec, dec_label, mesh, B)

    # Rate matching (5G NR): punctured variables are never transmitted and
    # enter the decoder with LLR 0; shortened variables are known zeros and
    # enter saturated positive (SURVEY.md §7.1 stage 6).
    punctured = len(code.punct_vns) or len(code.shortened_vns)
    if punctured:
        # n_tx counts the UNION of punctured and shortened positions (heavy
        # NR shortening can overlap the 2Z punctured range; double-counting
        # would bias the Eb/N0 -> sigma calibration).
        excluded = set(map(int, code.punct_vns)) | set(
            map(int, code.shortened_vns))
        n_tx = code.n - len(excluded)
        tx_pos = jnp.asarray(
            [v for v in range(code.n) if v not in excluded], jnp.int32)
        short_pos = (jnp.asarray(code.shortened_vns)
                     if len(code.shortened_vns) else None)
        bps = ch.BITS_PER_SYM[mod]
        if mod != "bpsk" and n_tx % bps:
            raise ValueError(
                f"transmitted length {n_tx} not a multiple of the {mod} "
                f"symbol size ({bps} bits)")
    elif mod != "bpsk" and code.n % ch.BITS_PER_SYM[mod]:
        # without rate matching the whole codeword is transmitted; catch a
        # non-dividing symbol size here instead of a reshape error mid-trace
        raise ValueError(
            f"codeword length {code.n} not a multiple of the {mod} "
            f"symbol size ({ch.BITS_PER_SYM[mod]} bits)")

    if mesh is not None:
        if B % mesh.size:
            raise ValueError(f"batch {B} not divisible by mesh size {mesh.size}")
        def shard_b(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(mesh.axis_names,
                                         *([None] * (x.ndim - 1)))))

        def shard_last(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(*([None] * (x.ndim - 1)),
                                         mesh.axis_names)))
    else:
        def shard_b(x):
            return x

        def shard_last(x):
            return x

    # Shortened (filler) info bits are known zeros: never random, never in
    # error (their saturated LLR pins the decoder), excluded from k_eff.
    short_info = (np.intersect1d(np.asarray(code.shortened_vns),
                                 np.asarray(info_positions(code)))
                  if len(code.shortened_vns) else None)
    if short_info is not None and len(short_info):
        keep = np.ones(code.k, np.uint8)
        # positions within the info vector (identity for structured codes)
        pos_of = {int(p): i for i, p in enumerate(info_positions(code))}
        keep[[pos_of[int(v)] for v in short_info]] = 0
        keep_j = jnp.asarray(keep)
    else:
        keep_j = None

    if n_points > 1 and B % n_points:
        raise ValueError(f"batch {B} not divisible by n_points {n_points}")

    all_zeros = cfg.run.all_zeros

    if mc:
        scale = float(cfg.quant.scale)

        def _mc_seeds(key: jax.Array):
            # Stream identity: the raw 32-bit key words + the TILE BASE in
            # word 2 (superbatching folds the key per sub-batch, so every
            # sub-batch reseeds distinctly); the kernel adds its grid tile
            # index to the base. Single chip: base 0. Mesh: each shard sets
            # shard_index * tiles_per_shard (mc_call below), so shard
            # streams are disjoint and continue the single-chip numbering.
            kd = jax.random.key_data(key).astype(jnp.int32).reshape(-1)
            return jnp.stack([kd[0], kd[-1], jnp.int32(0)])

        if mesh is not None:
            tiles_local = (B // mesh.size) // dec.batch_tile
            axes = mesh.axis_names

            def mc_call(seeds, chanf, sig=None, gain=None):
                def body(seeds, chanf, *lanes):
                    idx = jnp.int32(0)
                    for ax in axes:
                        idx = idx * mesh.shape[ax] + jax.lax.axis_index(ax)
                    s = seeds.at[2].set(idx * jnp.int32(tiles_local))
                    if lanes:
                        return dec(s, chanf, sigma_lane=lanes[0],
                                   gain_lane=lanes[1])
                    return dec(s, chanf)

                extra = () if sig is None else (sig, gain)
                in_specs = (P(), P()) + ((P(axes), P(axes))
                                         if sig is not None else ())
                # check_vma=False: pallas_call emits ShapeDtypeStructs
                # without varying-mesh-axis annotations
                return jax.shard_map(body, mesh=mesh, in_specs=in_specs,
                                     out_specs=P(axes),
                                     check_vma=False)(seeds, chanf, *extra)
        else:
            def mc_call(seeds, chanf, sig=None, gain=None):
                if sig is not None:
                    return dec(seeds, chanf, sigma_lane=sig, gain_lane=gain)
                return dec(seeds, chanf)

        if n_points > 1:
            # Fused multi-SNR sweep through the megakernel: lane b simulates
            # point b % n_points (the same striping as the host fused path,
            # so Sweep.run_fused's slot attribution applies unchanged); the
            # kernel reads per-lane sigma/gain rows.
            point = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (B,), 0), n_points)

            def run_batch(key: jax.Array, sigma: jnp.ndarray):
                sigma = jnp.asarray(sigma, jnp.float32)
                if sigma.shape != (n_points,):
                    # gather clamping would silently map out-of-range point
                    # indices to the last element — refuse at trace time
                    raise ValueError(f"fused sweep expects sigma of shape "
                                     f"({n_points},), got {sigma.shape}")
                sig_lane = sigma[point]
                gain_lane = (jnp.float32(2.0) * jnp.float32(scale)
                             / (sig_lane * sig_lane))
                lane_bits, lane_frame, iters, conv = mc_call(
                    _mc_seeds(key), jnp.zeros((2,), jnp.float32),
                    sig=sig_lane, gain=gain_lane)
                seg = lambda v: jax.ops.segment_sum(  # noqa: E731
                    v.astype(jnp.int32), point, num_segments=n_points)
                return jnp.stack([
                    jnp.full((n_points,), B // n_points, jnp.int32),
                    seg(lane_bits), seg(lane_frame), seg(iters), seg(conv)])
        else:
            def run_batch(key: jax.Array, sigma: jnp.ndarray):
                sig = jnp.float32(sigma)
                chanf = jnp.stack(
                    [sig,
                     jnp.float32(2.0) * jnp.float32(scale) / (sig * sig)])
                lane_bits, lane_frame, iters, conv = mc_call(_mc_seeds(key),
                                                             chanf)
                return jnp.stack([
                    jnp.int32(B), jnp.sum(lane_bits), jnp.sum(lane_frame),
                    jnp.sum(iters, dtype=jnp.int32),
                    jnp.sum(conv, dtype=jnp.int32)])
    elif transposed:
        from ..ops.encode import make_encoder_t
        enc_t = make_encoder_t(code)
        nb, Z = code.base.shape[1], code.Z
        kb = fused_io[1]

        def run_batch(key: jax.Array, sigma: jnp.ndarray):
            kinfo, knoise = jax.random.split(key)
            if n_points > 1:
                # fused multi-SNR: lane b simulates point b % n_points
                # (the Sweep.run_fused striping); batch-last per-lane
                # sigma is a plain trailing-axis broadcast.
                point = jax.lax.rem(
                    jax.lax.broadcasted_iota(jnp.int32, (B,), 0), n_points)
                sigma = jnp.asarray(sigma, jnp.float32)
                if sigma.shape != (n_points,):
                    raise ValueError(f"fused sweep expects sigma of shape "
                                     f"({n_points},), got {sigma.shape}")
                sig = sigma[point]  # (B,)
            else:
                sig = sigma
            info_t = shard_last(jax.random.bernoulli(
                kinfo, 0.5, (code.k, B)).astype(jnp.uint8))
            cw_t = enc_t(info_t)
            x = ch.modulate_t(cw_t, mod)
            y = ch.awgn_t(knoise, x, sig)
            llr = shard_last(ch.demap_t(y, sig, mod))
            if kb is not None:
                lane_bits, lane_frame, iters, conv = dec(
                    llr.reshape(nb, Z, B), info_t.reshape(kb, Z, B))
            else:
                hard_t, iters, conv = dec(llr.reshape(nb, Z, B))
                info_err = hard_t.reshape(code.n, B)[info_pos] != info_t
                lane_bits = jnp.sum(info_err, axis=0, dtype=jnp.int32)
                lane_frame = jnp.any(info_err, axis=0).astype(jnp.int32)
            if n_points > 1:
                seg = lambda v: jax.ops.segment_sum(  # noqa: E731
                    v.astype(jnp.int32), point, num_segments=n_points)
                return jnp.stack([
                    jnp.full((n_points,), B // n_points, jnp.int32),
                    seg(lane_bits), seg(lane_frame), seg(iters), seg(conv)])
            return jnp.stack([
                jnp.int32(B), jnp.sum(lane_bits), jnp.sum(lane_frame),
                jnp.sum(iters, dtype=jnp.int32),
                jnp.sum(conv, dtype=jnp.int32)])
    else:
        run_batch = None

    def run_batch_bf(key: jax.Array, sigma: jnp.ndarray):
        kinfo, knoise = jax.random.split(key)
        if all_zeros:
            info = shard_b(jnp.zeros((B, code.k), jnp.uint8))
        else:
            info = shard_b(jax.random.bernoulli(
                kinfo, 0.5, (B, code.k)).astype(jnp.uint8))
        if keep_j is not None:
            info = info * keep_j
        if n_points > 1:
            point = jax.lax.rem(
                jax.lax.broadcasted_iota(jnp.int32, (B,), 0), n_points)
            sigma = jnp.asarray(sigma)
            if sigma.shape != (n_points,):
                raise ValueError(f"fused sweep expects sigma of shape "
                                 f"({n_points},), got {sigma.shape}")
            sigma = sigma[point]  # (B,) per-lane noise level
        cw = jnp.zeros((B, code.n), jnp.uint8) if all_zeros else enc(info)
        tx = cw[:, tx_pos] if punctured else cw
        x = ch.modulate(tx, mod)
        y = ch.awgn(knoise, x, sigma)
        llr = ch.demap(y, sigma, mod)
        if punctured:
            full = jnp.zeros((B, code.n), llr.dtype).at[:, tx_pos].set(llr)
            if short_pos is not None:
                full = full.at[:, short_pos].set(jnp.float32(1e6))
            llr = full
        q = shard_b(llr.astype(jnp.float32) if float_mode
                    else quantize(llr, cfg.quant))
        hard, iters, conv = dec(q)
        info_err = hard[:, info_pos] != info
        lane_bits = jnp.sum(info_err, axis=-1, dtype=jnp.int32)
        lane_frame = jnp.any(info_err, axis=-1).astype(jnp.int32)
        # ONE stacked output => one device->host transfer per batch; on the
        # tunneled platform each separate scalar fetch costs a full RTT.
        if n_points > 1:
            seg = lambda v: jax.ops.segment_sum(  # noqa: E731
                v.astype(jnp.int32), point, num_segments=n_points)
            return jnp.stack([
                jnp.full((n_points,), B // n_points, jnp.int32),
                seg(lane_bits), seg(lane_frame), seg(iters), seg(conv)])
        return jnp.stack([
            jnp.int32(B), jnp.sum(lane_bits), jnp.sum(lane_frame),
            jnp.sum(iters, dtype=jnp.int32),
            jnp.sum(conv, dtype=jnp.int32)])

    if run_batch is None:
        run_batch = run_batch_bf

    if superbatches > 1:
        inner = run_batch

        def run_batch(key: jax.Array, sigma: jnp.ndarray):  # noqa: F811
            def body(i, acc):
                return acc + inner(jax.random.fold_in(key, i), sigma)

            shape = (5, n_points) if n_points > 1 else (5,)
            return jax.lax.fori_loop(
                0, superbatches, body, jnp.zeros(shape, jnp.int32))

    if mesh is not None:
        repl = NamedSharding(mesh, P())
        rb = jax.jit(run_batch, in_shardings=(repl, repl),
                     out_shardings=repl)
    else:
        rb = jax.jit(run_batch)
    # The resolved decoder label rides on the returned callable so callers
    # (Sweep) don't need a second select_decoder build just to learn it.
    rb.backend_label = dec_label
    rb.mc = mc  # Monte-Carlo megakernel mode (diagnostics/tests)
    # resolved decoder tile granularity (the auto two-phase tuner's
    # capacity floor; 1 for jnp-family backends)
    rb.batch_tile = getattr(dec, "batch_tile", 1)
    return rb
