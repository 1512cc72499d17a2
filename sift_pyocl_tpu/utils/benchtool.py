"""Trustworthy device timing on platforms with async/memoizing dispatch.

Measured quirks of the axon TPU tunnel (2026-08-16, this repo's bench logs):
  * `block_until_ready` can return before device execution completes (an
    8192^3 matmul "finished" at 35,000 TFLOP/s — 90x the v5e peak);
  * the runtime memoizes (executable, input-value) pairs, so repeating a call
    with identical arguments returns a cached result at tunnel-RTT speed;
  * per-call dispatch costs tens of ms, so single-shot timings are noise.

Protocol implemented here (each point defeats one quirk above):
  1. chain N iterations of the step function inside ONE jitted fori_loop with
     a full data dependency between iterations (amortizes dispatch, makes the
     device do N real executions);
  2. every timed call gets a fresh, never-seen input VALUE (defeats
     memoization);
  3. completion is awaited by fetching an output scalar to the host (a value
     cannot be fabricated — this is the only reliable barrier);
  4. the per-iteration time is the slope between a short and a long chain,
     which cancels dispatch overhead and the input-upload cost;
  5. executables for both chain lengths are compiled before timing.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def _fetch(tree) -> float:
    """Force real completion by pulling one scalar of every leaf to host."""
    tot = 0.0
    for leaf in jax.tree_util.tree_leaves(tree):
        tot += float(jnp.ravel(leaf)[0])
    return tot


def chained_ms(
    step: Callable,
    x0: jnp.ndarray,
    n_lo: int = 1,
    n_hi: int = 17,
    reps: int = 3,
    perturb_scale: float = 1e-4,
) -> float:
    """Median per-iteration milliseconds of `step` (array -> array-like).

    `step` must return either an array of x0's shape, or a pytree which is
    reduced to a scalar and folded back into the carry (keeping a full data
    dependency on everything `step` computed).
    """

    def body(i, c):
        out = step(c)
        if isinstance(out, jnp.ndarray) and out.shape == c.shape and out.dtype == c.dtype:
            return out * 0.9999 + 0.0001
        s = jnp.float32(0.0)
        for leaf in jax.tree_util.tree_leaves(out):
            s = s + jnp.sum(leaf).astype(jnp.float32)
        return c + perturb_scale * jnp.tanh(s * 1e-9)

    # n is DYNAMIC (traced): fori_loop lowers to while_loop, so ONE compiled
    # executable serves every chain length — on platforms with slow remote
    # compiles (axon) this halves bench wall time vs static_argnames=("n",).
    @jax.jit
    def chain(x, n):
        return lax.fori_loop(0, n, body, x)

    rng = np.random.default_rng(12345)

    def fresh():
        # fresh VALUE each call (device-side add of a host-random constant)
        x = x0 + jnp.float32(rng.uniform(0.0, 1.0))
        _fetch(x)  # materialize before the timed region
        return x

    lo = jnp.int32(n_lo)
    hi = jnp.int32(n_hi)
    # compile + warm both chain lengths off the clock
    _fetch(chain(fresh(), lo))
    _fetch(chain(fresh(), hi))

    slopes = []
    for _ in range(reps):
        x = fresh()
        t0 = time.perf_counter()
        _fetch(chain(x, lo))
        t_lo = time.perf_counter() - t0
        x = fresh()
        t0 = time.perf_counter()
        _fetch(chain(x, hi))
        t_hi = time.perf_counter() - t0
        slopes.append((t_hi - t_lo) / (n_hi - n_lo))
    return float(np.median(slopes) * 1e3)
