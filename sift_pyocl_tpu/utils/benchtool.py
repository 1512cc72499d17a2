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

import argparse
import json
import os
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


# ---------------------------------------------------------------------------
# Shared harness for the tools/ A/B scripts and profilers (round-4
# consolidation): every on-chip experiment needs the same compile-cache
# setup, the same CLI knobs, and the same "run interleaved rows, print a
# JSON line per row, then the summary" loop.  Keeping it here means each
# tools/ab_*.py is only its experiment-specific chain definitions.


def enable_compile_cache(cache_dir: str | None = None) -> None:
    """Point JAX's persistent compile cache at the repo-local directory."""
    if cache_dir is None:
        cache_dir = os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)))), ".jax_compile_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # noqa: BLE001 — cache is an optimization, never fatal
        pass


def ab_args(default_shape=(1080, 1920), n_hi: int = 17, reps: int = 3,
            extra: Callable[[argparse.ArgumentParser], None] | None = None):
    """Standard A/B CLI (--shape --n-hi --reps [--stages]) + cache setup."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--shape", type=int, nargs=2, default=list(default_shape))
    ap.add_argument("--n-hi", type=int, default=n_hi)
    ap.add_argument("--reps", type=int, default=reps)
    ap.add_argument("--stages", type=str, default="",
                    help="comma-separated row subset")
    if extra is not None:
        extra(ap)
    args = ap.parse_args()
    enable_compile_cache()
    return args


def run_ab_rows(rows, x0, args) -> dict:
    """Time each (name, step_fn) row interleaved in THIS process.

    Interleaving in one process is the only methodology that survives the
    platform's ~±0.5 ms cross-run noise floor (BASELINE.md round-2 notes).
    Prints one JSON line per row as it lands plus a final summary dict.
    """
    want = set(args.stages.split(",")) if getattr(args, "stages", "") else None
    out = {}
    for name, fn in rows:
        if want and name not in want:
            continue
        t0 = time.perf_counter()
        ms = chained_ms(fn, x0, n_hi=args.n_hi, reps=args.reps)
        out[name] = round(ms, 3)
        print(json.dumps({name: out[name],
                          "wall_s": round(time.perf_counter() - t0, 1)}),
              flush=True)
    print(json.dumps(out), flush=True)
    return out
