"""HBM-streaming Pallas kernel: layered min-sum for codes too big for VMEM.

The SURVEY.md §5.7 'long-codeword' regime (DVB-S2 n=64800, 5G NR Z=384):
posteriors and messages live in HBM and the kernel streams one layer's
working set (<= max_row_deg blocks of (Z, B_tile)) through VMEM per step —
the moral equivalent of blockwise attention. The VMEM kernel
(minsum_pallas.py) remains the fast path whenever state fits.

Design:
  * arrays laid out (n_tiles, nb, Z, Bt) so every DMA is one contiguous
    (Z, Bt) block addressed by traced indices;
  * initial state rides in through input/output aliasing: the posterior
    buffer arrives pre-filled with widened channel LLRs and the message
    buffer with zeros, so the kernel body is nothing but the layer loop;
  * per-layer metadata (base columns, circulant shifts, pad mask, flat
    entry ids) rides in scalar-prefetch SMEM; the layer loop is a compact
    fori_loop — circulant shifts are dynamic `pltpu.roll`s, so trace size is
    O(max_row_deg), not O(E);
  * a layer's blocks are fetched (parallel DMAs), updated, and written back
    before the next layer's fetches — consecutive layers may share columns,
    so cross-layer posterior prefetch would race; conflict-aware prefetch
    is future work;
  * the kernel runs fixed-iteration layered decoding and returns raw int32
    posteriors; hard decision and the final syndrome are one cheap XLA pass
    outside (per-iteration early termination is not worth a syndrome pass
    in the HBM-bound regime).

Bit-exact vs golden decode_fixed(schedule="layered", early_term=False) —
asserted in tests against the C oracle.
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
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """decode(chan_i8[B, n]) -> (hard u8, iters i32, conv bool)."""
    if code.base is None or code.Z is None:
        raise ValueError(f"{code.name}: streaming decoder requires QC structure")
    if code.Z % 8:
        raise ValueError(
            f"{code.name}: streaming decoder requires sublane-aligned Z "
            f"(multiple of 8), got Z={code.Z} — Mosaic dynamic rolls and "
            f"block DMAs reject unaligned shapes (DVB-S2 Z=360 and NR "
            f"Z=384 qualify; use the VMEM or qc-jnp decoder otherwise)")
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

    def kernel(lcols_ref, lshifts_ref, lmask_ref, lent_ref,
               c2v_in_ref, post_in_ref, post_ref, c2v_ref,
               pbuf, cbuf, psems, csems):
        t = pl.program_id(0)

        def layer_body(l, _):
            # Fetch this layer's posterior + message blocks (parallel DMAs).
            for s in range(D):
                pltpu.make_async_copy(post_ref.at[t, lcols_ref[l, s]],
                                      pbuf.at[s], psems.at[s]).start()
                pltpu.make_async_copy(c2v_ref.at[t, lent_ref[l, s]],
                                      cbuf.at[s], csems.at[s]).start()
            for s in range(D):
                pltpu.make_async_copy(post_ref.at[t, lcols_ref[l, s]],
                                      pbuf.at[s], psems.at[s]).wait()
                pltpu.make_async_copy(c2v_ref.at[t, lent_ref[l, s]],
                                      cbuf.at[s], csems.at[s]).wait()

            # CN update: min1/min2 with value-exclusion (golden tie
            # semantics; see minsum_pallas._cn_minsum).
            big = jnp.array(1 << 14, _C)
            min1 = jnp.full((Z, batch_tile), big, _C)
            min2 = jnp.full((Z, batch_tile), big, _C)
            negpar = jnp.zeros((Z, batch_tile), _C)
            mags, negs, olds = [], [], []
            for s in range(D):
                sh = lshifts_ref[l, s]
                rolled = pltpu.roll(pbuf[s], Z - sh, 0)
                old = cbuf[s].astype(_C)
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
            if beta:
                zero = jnp.zeros_like(min1)
                min1_o = jnp.maximum(min1 - beta, zero)
                min2_o = jnp.maximum(min2 - beta, zero)
            else:
                min1_o, min2_o = min1, min2
            for s in range(D):
                out_mag = jnp.where(mags[s] == min1, min2_o, min1_o)
                sgn = negpar ^ negs[s]  # 0/1
                new = jnp.where(sgn > 0, -out_mag, out_mag)
                sh = lshifts_ref[l, s]

                @pl.when(lmask_ref[l, s] > 0)
                def _():
                    pbuf[s] = pbuf[s] + pltpu.roll(new - olds[s], sh, 0)
                    cbuf[s] = new.astype(jnp.int8)

            # Write back before the next layer may touch the same columns.
            for s in range(D):
                @pl.when(lmask_ref[l, s] > 0)
                def _():
                    pltpu.make_async_copy(pbuf.at[s],
                                          post_ref.at[t, lcols_ref[l, s]],
                                          psems.at[s]).start()
                    pltpu.make_async_copy(cbuf.at[s],
                                          c2v_ref.at[t, lent_ref[l, s]],
                                          csems.at[s]).start()
            for s in range(D):
                @pl.when(lmask_ref[l, s] > 0)
                def _():
                    pltpu.make_async_copy(pbuf.at[s],
                                          post_ref.at[t, lcols_ref[l, s]],
                                          psems.at[s]).wait()
                    pltpu.make_async_copy(cbuf.at[s],
                                          c2v_ref.at[t, lent_ref[l, s]],
                                          csems.at[s]).wait()
            return 0

        def iter_body(i, _):
            jax.lax.fori_loop(0, mb, layer_body, 0)
            return 0

        jax.lax.fori_loop(0, max_iter, iter_body, 0)

    lcols_j, lshifts_j = jnp.asarray(lcols), jnp.asarray(lshifts)
    lmask_j, lent_j = jnp.asarray(lmask), jnp.asarray(lent)

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
        post_init = chan_t.astype(_C)
        gs = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # c2v init (zeros)
                pl.BlockSpec(memory_space=pl.ANY),  # post init (chan32)
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pl.ANY),  # post
                pl.BlockSpec(memory_space=pl.ANY),  # c2v
            ],
            scratch_shapes=[
                pltpu.VMEM((D, Z, batch_tile), _C),
                pltpu.VMEM((D, Z, batch_tile), jnp.int8),
                pltpu.SemaphoreType.DMA((D,)),
                pltpu.SemaphoreType.DMA((D,)),
            ],
        )
        post, _ = pl.pallas_call(
            kernel,
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, nb, Z, batch_tile), _C),
                jax.ShapeDtypeStruct((n_tiles, n_entries, Z, batch_tile),
                                     jnp.int8),
            ],
            grid_spec=gs,
            input_output_aliases={5: 0, 4: 1},
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
            interpret=interpret,
        )(lcols_j, lshifts_j, lmask_j, lent_j,
          jnp.zeros((n_tiles, n_entries, Z, batch_tile), jnp.int8),
          post_init)
        post3 = post.transpose(0, 3, 1, 2).reshape(B, nb, Z)
        hard = (post3 < 0).reshape(B, n).astype(jnp.uint8)
        conv = syndrome_ok(post3)
        iters = jnp.full((B,), max_iter, jnp.int32)
        return hard, iters, conv

    return decode


def make_decoder(code: LDPCCode, dec: DecoderConfig, quant: QuantConfig,
                 batch_tile: int = 128, interpret: bool = False):
    if dec.algorithm not in ("min-sum", "offset-min-sum"):
        raise ValueError(f"streaming decoder supports the min-sum family, "
                         f"got {dec.algorithm}")
    if dec.schedule != "layered":
        raise ValueError("streaming decoder is layered-only")
    beta = quant.beta_lsb if dec.algorithm == "offset-min-sum" else 0
    return make_stream_decoder(code, max_iter=dec.max_iter, beta=beta,
                               qmax=quant.qmax, batch_tile=batch_tile,
                               interpret=interpret)
