"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference had nothing beyond wall-clock timing; here:
  * trace(): jax.profiler context emitting TensorBoard/Perfetto traces (XLA
    + Pallas kernel timings are captured natively on TPU);
  * timed(): block_until_ready-bracketed wall timer;
  * compiled_cost(): XLA's own FLOP/byte estimates for a jitted callable.
"""
from __future__ import annotations

import contextlib
import time
from typing import Any, Callable, Dict, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    """Profile everything inside the context into `logdir` (view with
    TensorBoard's profile plugin or Perfetto)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def _fetch_sync(out) -> None:
    """Force completion by HOST FETCH of one leaf.

    jax.block_until_ready does NOT reliably block on the tunneled "axon"
    platform (it returned before execution finished and produced
    faster-than-physics timings in round 2) — transferring bytes to the
    host is the only dependable synchronization there, and it is exactly
    what the production sweep does with its counters.
    """
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)


def timed(fn: Callable, *args, reps: int = 10, trials: int = 3) -> float:
    """Best-of-trials seconds per call, dispatch-pipelined within a trial,
    synchronized by host fetch (see _fetch_sync — block_until_ready is not
    trustworthy on the tunneled platform).

    The tunneled single-chip platform has bursty dispatch latency, so the
    minimum over trials is the meaningful figure (see bench.py).
    """
    out = fn(*args)
    _fetch_sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _fetch_sync(out)
        best = min(best, (time.time() - t0) / reps)
    return best


def compiled_cost(fn: Callable, *args) -> Optional[Dict[str, Any]]:
    """XLA cost analysis (flops, bytes accessed) of fn jitted on *args."""
    try:
        compiled = jax.jit(fn).lower(*args).compile()
        return compiled.cost_analysis()
    except Exception:
        return None
