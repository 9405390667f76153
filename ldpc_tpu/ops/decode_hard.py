"""Hard-decision decoders as pure-XLA jnp ops (batched, jittable).

Gallager-A/B message passing and parallel bit-flipping over hard channel
bits — the decoding-side complement to the BSC fault injector
(ops/channel.bsc, SURVEY.md §5.3). Every rule is pinned in
golden/decoder.py ("Hard-decision golden decoders" section); the batched
ops here must match the golden scalars EXACTLY (integer/boolean arithmetic
is deterministic, so the contract is equality, same as decode_ref).

Layout mirrors decode_ref.py: dense check-major (M, D) message tables from
codes/layout.py, a flat (M*D + 1) buffer per codeword whose last slot is a
dump/pad slot, and gather-only updates. Pad message slots carry -1 so
variable-side disagreement counts can ignore them without a separate mask
gather. Early termination is batched (per-lane done mask + whole-batch
while_loop exit), identical in observable outputs to the golden
per-codeword stop.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..codes.code import LDPCCode
from ..codes.layout import compile_edge_layout
from ..golden.decoder import _default_thresholds


def _syndrome_ok(hard_pad: jnp.ndarray, ev: jnp.ndarray) -> jnp.ndarray:
    """hard_pad: (B, n+1) int32 bits with zero pad; ev: (m, D). -> (B,) bool."""
    synd = jnp.sum(hard_pad[:, ev], axis=-1) & 1
    return ~jnp.any(synd.astype(bool), axis=-1)


def make_hard_decoder(
    code: LDPCCode,
    max_iter: int = 30,
    algorithm: str = "gallager-b",
    threshold: Optional[int] = None,
    early_term: bool = True,
) -> Callable[[jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]]:
    """Returns decode(y[B, n] bits) -> (hard[B, n] uint8, iters[B] i32,
    converged[B] bool). algorithm: 'gallager-b' | 'gallager-a' | 'bit-flip'.
    """
    if algorithm == "bit-flip":
        return _make_bitflip_decoder(code, max_iter, threshold, early_term)
    if algorithm not in ("gallager-a", "gallager-b"):
        raise ValueError(algorithm)
    lay = compile_edge_layout(code)
    M, D, N = lay.m, lay.max_dc, lay.n
    ev = jnp.asarray(lay.ev_dense)                     # (M, D) pad N
    vn_pos = jnp.asarray(lay.vn_pos)                   # (N, max_dv) pad M*D
    mask = jnp.asarray(lay.cn_mask)                    # (M, D)
    dv = jnp.asarray(lay.vn_mask.sum(axis=1), jnp.int32)  # (N,)
    t_np = (np.full(N, int(threshold), np.int32) if threshold is not None
            else _default_thresholds(code, algorithm))
    # Pad slot (index N) gets a huge threshold so pad edges never flip.
    t_pad = jnp.asarray(np.concatenate([t_np, [1 << 20]]).astype(np.int32))

    def pad1(x, val=0):
        return jnp.pad(x, ((0, 0), (0, 1)), constant_values=val)

    def decode(y: jnp.ndarray):
        B = y.shape[0]
        y32 = y.astype(jnp.int32)
        y_pad = pad1(y32)
        y_ev = y_pad[:, ev]                            # (B, M, D)
        v2c0 = jnp.where(mask, y_ev, 0)
        hard0 = y32.astype(bool)
        done0 = (_syndrome_ok(y_pad, ev) if early_term
                 else jnp.zeros(B, bool))
        iters0 = jnp.zeros(B, jnp.int32)

        def body(carry):
            it, v2c, hard, done, iters = carry
            # CN pass: exclude-self XOR (pads carry 0 — XOR-neutral).
            par = jnp.sum(v2c, axis=-1, keepdims=True) & 1
            c2v = jnp.bitwise_xor(par, v2c)            # (B, M, D)
            c2v_flat = pad1(jnp.where(mask, c2v, -1).reshape(B, M * D),
                            val=-1)
            g = c2v_flat[:, vn_pos]                    # (B, N, max_dv)
            dis = jnp.sum(((g >= 0) & (g != y32[:, :, None]))
                          .astype(jnp.int32), axis=-1)  # (B, N)
            hard_new = (2 * dis > dv) ^ hard0          # flip vs channel bit
            ok_new = _syndrome_ok(pad1(hard_new.astype(jnp.int32)), ev)
            # VN pass: exclude-self disagreement vs threshold.
            d_all = pad1(dis)[:, ev]                   # (B, M, D)
            own = ((c2v != y_ev) & mask).astype(jnp.int32)
            d_e = d_all - own
            v2c_new = jnp.where(d_e >= t_pad[ev], 1 - y_ev, y_ev)
            v2c_new = jnp.where(mask, v2c_new, 0)
            v2c = jnp.where(done[:, None, None], v2c, v2c_new)
            hard = jnp.where(done[:, None], hard, hard_new)
            iters = iters + (~done).astype(jnp.int32)
            done = done | ok_new if early_term else done
            return it + 1, v2c, hard, done, iters

        carry = (jnp.int32(0), v2c0, hard0, done0, iters0)
        if early_term:
            def cond(carry):
                it, _, _, done, _ = carry
                return (it < max_iter) & ~jnp.all(done)
            carry = jax.lax.while_loop(cond, body, carry)
        else:
            carry = jax.lax.fori_loop(0, max_iter, lambda _, c: body(c),
                                      carry)
        _, _, hard, done, iters = carry
        conv = done if early_term else _syndrome_ok(
            pad1(hard.astype(jnp.int32)), ev)
        return hard.astype(jnp.uint8), iters, conv

    return decode


def _make_bitflip_decoder(code, max_iter, threshold, early_term):
    lay = compile_edge_layout(code)
    M, D = lay.m, lay.max_dc
    ev = jnp.asarray(lay.ev_dense)
    vn_pos = jnp.asarray(lay.vn_pos)
    dv = jnp.asarray(lay.vn_mask.sum(axis=1), jnp.int32)
    t = None if threshold is None else jnp.int32(int(threshold))

    def pad1(x):
        return jnp.pad(x, ((0, 0), (0, 1)))

    def decode(y: jnp.ndarray):
        B = y.shape[0]
        x0 = y.astype(jnp.int32)
        done0 = (_syndrome_ok(pad1(x0), ev) if early_term
                 else jnp.zeros(B, bool))
        iters0 = jnp.zeros(B, jnp.int32)

        def body(carry):
            it, x, done, iters = carry
            synd = jnp.sum(pad1(x)[:, ev], axis=-1) & 1          # (B, M)
            # Per-variable unsatisfied-check count: replicate each check's
            # syndrome bit across its D slots, then gather by flat edge
            # position (the dump slot contributes 0 for pad edges).
            synd_rep = pad1(jnp.repeat(synd, D, axis=1))         # (B, M*D+1)
            unsat = jnp.sum(synd_rep[:, vn_pos], axis=-1)        # (B, N)
            flip = (2 * unsat > dv) if t is None else (unsat >= t)
            x_new = jnp.where(flip, 1 - x, x)
            ok_new = _syndrome_ok(pad1(x_new), ev)
            x = jnp.where(done[:, None], x, x_new)
            iters = iters + (~done).astype(jnp.int32)
            done = done | ok_new if early_term else done
            return it + 1, x, done, iters

        carry = (jnp.int32(0), x0, done0, iters0)
        if early_term:
            def cond(carry):
                it, _, done, _ = carry
                return (it < max_iter) & ~jnp.all(done)
            carry = jax.lax.while_loop(cond, body, carry)
        else:
            carry = jax.lax.fori_loop(0, max_iter, lambda _, c: body(c),
                                      carry)
        _, x, done, iters = carry
        conv = done if early_term else _syndrome_ok(pad1(x), ev)
        return x.astype(jnp.uint8), iters, conv

    return decode
