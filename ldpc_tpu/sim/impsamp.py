"""Error-floor estimation by defensive mixture importance sampling.

Plain Monte-Carlo cannot reach the error-floor region (FER 1e-9 needs
~1e10 frames). This module estimates the floor with a MIXTURE importance-
sampling proposal built from trapping sets (analysis/trapping.py): the
AWGN noise mean is shifted toward each candidate set's error region, and
the unshifted channel stays in the mixture with weight pi0, so

  * the estimator is UNBIASED for the true FER regardless of which sets
    were found — a missed error mechanism costs variance, never bias;
  * likelihood weights are bounded by 1/pi0 (q >= pi0 * p pointwise), so
    the worst case is a bounded constant-factor loss vs plain MC, never a
    weight blow-up.

All-zeros transmission (valid: min-sum with symmetric quantization is
sign-symmetric, so the error probability is codeword-independent — the
same argument that justifies RunConfig.all_zeros). BPSK/AWGN only.

Estimator: FER = E_q[ 1{frame error} * p(z)/q(z) ], with
p = N(0, sigma^2 I), q = pi0*p + (1-pi0)/K * sum_k N(mu_k, sigma^2 I),
mu_k = -delta * indicator(S_k). Per-batch sums of w and w^2 leave the
device; the running relative standard error is exact.

TPU notes: the chain reuses the framework's channel/quantize ops and the
select_decoder backend ladder (Pallas on TPU, jnp on CPU); the weight
computation is one (B, n) x (n, K) matmul plus a logsumexp — MXU-friendly
and negligible next to decode.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SimConfig
from ..ops import channel as ch
from ..ops.encode import info_positions
from ..ops.quantize import quantize
from .pipeline import select_decoder


def _check_domain(cfg: SimConfig, code=None) -> None:
    if cfg.channel.modulation != "bpsk":
        raise ValueError("importance sampling supports BPSK only")
    if code is not None and (len(code.punct_vns)
                             or len(code.shortened_vns)):
        # The IS chain applies real channel observations to every position;
        # silently estimating a punctured/shortened system with the wrong
        # channel would be off by orders of magnitude (the pipeline's
        # rate-matching block is not replicated here).
        raise ValueError(
            "importance sampling does not model rate matching yet: "
            f"{code.name} has punctured/shortened positions — estimate the "
            "mother code, or Monte-Carlo the rate-matched code directly")


# ---------------------------------------------------------------------------
# Failure harvesting (the empirical source of trapping-set candidates)
# ---------------------------------------------------------------------------

def harvest_error_supports(code, cfg: SimConfig, ebn0_db: float,
                           frames: int = 4096, batch: int = 512,
                           backend: str = "auto", seed: int = 1,
                           interpret: bool = False,
                           max_supports: int = 256) -> List[np.ndarray]:
    """Run plain all-zeros Monte-Carlo and return the error supports
    (positions of nonzero decoded bits) of every failed frame. Harvested
    at a waterfall-floor transition SNR these are the dominant trapping-set
    cores (after analysis.trapping.refine_support)."""
    _check_domain(cfg, code)
    dec, _ = select_decoder(code, cfg, backend, batch_tile=min(batch, 1024),
                            interpret=interpret, batch=batch)
    sigma = ch.sigma_for(ebn0_db, code.rate, "bpsk")

    # Two-step fetch: only the (B,) failure mask crosses the device->host
    # link every batch; the (n_bad, n) hard bits are gathered on-device and
    # fetched only for failing frames. (CLAUDE.md tunnel gotcha: never
    # stream a (B, n) tensor per call — at the default harvest sizes the
    # full tensor would be ~85 MB through a ~4 MB/s link.)
    @jax.jit
    def run(key):
        z = sigma * jax.random.normal(key, (batch, code.n))
        llr = ch.demap(1.0 + z, sigma, "bpsk")
        q = quantize(llr, cfg.quant)
        hard, _, _ = dec(q)
        return hard.any(axis=1), hard

    # FIXED-SHAPE row gather: a dynamic-length index vector would retrace/
    # recompile per distinct failure count (minutes each over the tunnel).
    # Failures beyond the per-batch cap are dropped — max_supports caps the
    # total anyway, and failure supports are exchangeable samples.
    max_bad = min(64, batch)
    gather = jax.jit(lambda hard, idx: jnp.take(hard, idx, axis=0))
    out: List[np.ndarray] = []
    key = jax.random.PRNGKey(seed)
    for i in range((frames + batch - 1) // batch):
        mask, hard = run(jax.random.fold_in(key, i))
        bad = np.nonzero(np.asarray(mask))[0][:max_bad]
        if not len(bad):
            continue
        idx = np.zeros(max_bad, np.int32)
        idx[:len(bad)] = bad
        rows = np.asarray(gather(hard, jnp.asarray(idx)))[:len(bad)]
        for r in rows:
            out.append(np.nonzero(r)[0].astype(np.int32))
            if len(out) >= max_supports:
                return out
    return out


# ---------------------------------------------------------------------------
# Mixture-IS estimator
# ---------------------------------------------------------------------------

def mixture_log_weight(z: jnp.ndarray, M: jnp.ndarray, sizes: jnp.ndarray,
                       log_pi: jnp.ndarray, delta: float,
                       sigma) -> jnp.ndarray:
    """log p(z)/q(z) for the defensive Gaussian mixture (B,) — the common
    N(.,sigma^2 I) normalizers cancel, so only the mean shifts enter:

      log w = -logsumexp_k[ log pi_k + (2 z.mu_k - |mu_k|^2) / (2 sigma^2) ]

    with mu_0 = 0 and mu_k = -delta * M[k-1]. Bounded above by -log pi_0.
    Exposed for direct numerical testing against a brute-force density
    ratio (tests/test_trapping.py)."""
    sigma = jnp.float32(sigma)
    s_k = z @ M.T  # (B, K): z . indicator_k
    expo = (-2.0 * delta * s_k - (delta ** 2) * sizes) / (2.0 * sigma ** 2)
    terms = jnp.concatenate(
        [jnp.zeros((z.shape[0], 1), jnp.float32), expo], axis=1) + log_pi
    return -jax.scipy.special.logsumexp(terms, axis=1)

@dataclasses.dataclass
class ISEstimate:
    ebn0_db: float
    fer: float                 # importance-sampled FER estimate
    rel_std: float             # relative standard error of fer
    frames: int
    raw_hits: int              # frames that erred under the proposal
    fer_plain_ci95: float      # what plain MC could have resolved: 2/frames
    ber: float                 # importance-sampled info-BER estimate

    def to_dict(self):
        d = dataclasses.asdict(self)
        if not np.isfinite(d["rel_std"]):
            d["rel_std"] = None  # strict-JSON safe (Infinity is not RFC 8259)
        return d


def make_is_run(code, cfg: SimConfig, sets: Sequence[Sequence[int]],
                delta: float = 2.0, pi0: float = 0.5, batch: int = 1024,
                backend: str = "auto", interpret: bool = False,
                mesh=None) -> Callable[[jax.Array, float], jnp.ndarray]:
    """One jitted IS batch: run(key, sigma) -> stacked sums
    [sum w*err, sum (w*err)^2, raw err frames, sum w*bit_errs] (float32).

    sets may be empty: the proposal is then exactly p and every weight is
    1 — the estimator degenerates to plain Monte-Carlo by construction
    (tested; this is the unbiasedness anchor).

    mesh: optional jax.sharding.Mesh — the frame batch shards over all
    mesh axes like the main pipeline's DP (partitionable threefry keeps
    the SAMPLES identical to the unsharded run; only the f32 summation
    order differs across shards).
    """
    _check_domain(cfg, code)
    if not 0 < pi0 <= 1:
        raise ValueError(f"pi0 must be in (0, 1], got {pi0}")
    if not sets and pi0 < 1:
        pi0 = 1.0
    K = len(sets)
    dec, _ = select_decoder(code, cfg, backend, batch_tile=min(batch, 1024),
                            interpret=interpret, batch=batch)
    info_pos = jnp.asarray(np.asarray(info_positions(code)))
    if K:
        M = np.zeros((K, code.n), np.float32)
        for k, s in enumerate(sets):
            M[k, np.asarray(sorted(set(map(int, s))), np.int64)] = 1.0
        # |mu_k|^2 must describe the shift actually applied: count UNIQUE
        # positions (a duplicated index in a caller's set would otherwise
        # silently bias the weights)
        sizes = M.sum(axis=1).astype(np.float32)
        Mj = jnp.asarray(M)
        sizes_j = jnp.asarray(sizes)
        log_pi = jnp.log(jnp.concatenate(
            [jnp.asarray([pi0], jnp.float32),
             jnp.full((K,), (1.0 - pi0) / K, jnp.float32)]))
    else:
        Mj = sizes_j = log_pi = None

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        if batch % mesh.size:
            raise ValueError(f"batch {batch} not divisible by mesh size "
                             f"{mesh.size}")

        def shard_b(x):
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(mesh, P(mesh.axis_names,
                                         *([None] * (x.ndim - 1)))))
    else:
        def shard_b(x):
            return x

    def run(key: jax.Array, sigma) -> jnp.ndarray:
        sigma = jnp.float32(sigma)
        kc, kn = jax.random.split(key)
        eps = shard_b(jax.random.normal(kn, (batch, code.n), jnp.float32))
        z = sigma * eps
        if K:
            # component per lane: 0 = unshifted, 1..K = sets
            comp = jax.random.categorical(
                kc, jnp.broadcast_to(log_pi, (batch, K + 1)), axis=-1)
            shift_row = jnp.where(comp[:, None] > 0,
                                  -delta * Mj[jnp.maximum(comp - 1, 0)], 0.0)
            z = z + shift_row
            w = jnp.exp(mixture_log_weight(z, Mj, sizes_j, log_pi, delta,
                                           sigma))
        else:
            w = jnp.ones((batch,), jnp.float32)
        llr = ch.demap(1.0 + z, sigma, "bpsk")
        q = quantize(llr, cfg.quant)
        hard, _, _ = dec(q)
        info_err = hard[:, info_pos] != 0
        err = jnp.any(info_err, axis=-1).astype(jnp.float32)
        bits = jnp.sum(info_err, axis=-1).astype(jnp.float32)
        we = w * err
        return jnp.stack([jnp.sum(we), jnp.sum(we * we), jnp.sum(err),
                          jnp.sum(w * bits)])

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P
        repl = NamedSharding(mesh, P())
        out = jax.jit(run, in_shardings=(repl, repl), out_shardings=repl)
    else:
        out = jax.jit(run)
    out.batch = batch  # estimate_fer validates against its own accounting
    return out


def estimate_fer(code, cfg: SimConfig, sets: Sequence[Sequence[int]],
                 ebn0_db: float, frames: int, delta: float = 2.0,
                 pi0: float = 0.5, batch: int = 1024,
                 backend: str = "auto", seed: int = 0,
                 interpret: bool = False, mesh=None,
                 run: Optional[Callable] = None) -> ISEstimate:
    """Mixture-IS FER estimate at one SNR point. `frames` is rounded up to
    whole batches. Pass a prebuilt `run` (make_is_run) to amortize compiles
    across SNR points."""
    if run is None:
        run = make_is_run(code, cfg, sets, delta=delta, pi0=pi0, batch=batch,
                          backend=backend, interpret=interpret, mesh=mesh)
    elif getattr(run, "batch", batch) != batch:
        # a prebuilt run sums over ITS batch size; silently dividing by a
        # different N would scale every reported rate
        batch = run.batch
    sigma = ch.sigma_for(ebn0_db, code.rate, "bpsk")
    nb = (frames + batch - 1) // batch
    # fold the SNR point into the stream so a floor curve's points are
    # statistically independent (the pipeline's fold_in(seed, snr) contract)
    key = jax.random.fold_in(jax.random.PRNGKey(seed),
                             int(round(ebn0_db * 1000)) & 0x7FFFFFFF)
    sw = sw2 = raw = swb = 0.0
    for i in range(nb):
        out = np.asarray(run(jax.random.fold_in(key, i), sigma), np.float64)
        sw += out[0]
        sw2 += out[1]
        raw += out[2]
        swb += out[3]
    N = nb * batch
    fer = sw / N
    var = max(sw2 / N - fer ** 2, 0.0) / N
    rel = float(np.sqrt(var) / fer) if fer > 0 else float("inf")
    return ISEstimate(ebn0_db=float(ebn0_db), fer=float(fer),
                      rel_std=rel, frames=int(N), raw_hits=int(raw),
                      fer_plain_ci95=2.0 / N,
                      ber=float(swb / (N * code.k_eff)))
