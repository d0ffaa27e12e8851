"""Honest device timing over high-latency transports.

This environment reaches its TPU through a tunnel where
``block_until_ready`` returns before execution finishes and every
host<->device round trip costs ~30 ms, so naive wall-clock timing is
meaningless.  The technique here:

1. Chain ``iters`` dependent applications of the op inside ONE jitted
   ``lax.fori_loop`` (data-dependent carry, so iterations cannot be
   elided or overlapped away), ending in a scalar reduction.
2. Force completion by fetching that scalar to the host.
3. Run two iteration counts and difference them, cancelling the fixed
   per-call transport/dispatch overhead:
   ``t_iter = (t(n2) - t(n1)) / (n2 - n1)``.

Take the min over repeats to strip scheduler noise.
"""

from __future__ import annotations

import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp


def _timed_call(loop_fn, carry, iters: int, repeats: int) -> float:
    float(loop_fn(carry, iters))  # warm the compile cache
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(loop_fn(carry, iters))
        best = min(best, time.perf_counter() - t0)
    return best


def time_op(step: Callable, carry, *, iters: tuple[int, int] = (4, 20),
            repeats: int = 5) -> float:
    """Seconds per application of ``step``.

    ``step(carry) -> carry`` must keep a fixed carry structure and be
    data-dependent on its input (e.g. for HPSS use ``H + P``, which is
    ~idempotent but dependent).  Returns the differenced per-iteration
    time in seconds.
    """

    @functools.partial(jax.jit, static_argnames="n")
    def loop_fn(c, n):
        out = jax.lax.fori_loop(0, n, lambda i, s: step(s), c)
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(l.astype(jnp.float32)) for l in leaves)

    n1, n2 = iters
    t1 = _timed_call(loop_fn, carry, n1, repeats)
    t2 = _timed_call(loop_fn, carry, n2, repeats)
    return max((t2 - t1) / (n2 - n1), 1e-9)
