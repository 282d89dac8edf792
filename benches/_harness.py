"""Shared bench harness for the serving-tunnel environment.

Dispatch has ~31 ms fixed RPC latency and ``block_until_ready`` does not
block through the tunnel, so every bench (a) repeats the op INSIDE one
jitted program with a data dependence threaded through the loop carry, and
(b) measures the marginal time between a low and a high repetition count,
forcing completion with a scalar pull.
"""

from __future__ import annotations

import functools
import json
import sys
import time


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def setup_jax():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log(f"device: {jax.devices()[0]}")
    return jax


def marginal_ms(step_fn, init_carry, lo: int = 2, hi: int = 22, calls: int = 4) -> float:
    """step_fn(k, carry) -> carry (must chain data); returns ms per step."""
    import jax
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnames=("reps",))
    def run(carry, reps):
        out = jax.lax.fori_loop(0, reps, step_fn, carry)
        # Pull one scalar per leaf to force completion without moving data.
        return sum(jnp.sum(leaf.ravel()[:1].astype(jnp.float32))
                   for leaf in jax.tree.leaves(out))

    def best(reps):
        _ = float(run(init_carry, reps))  # compile + warm
        b = 1e9
        for _ in range(calls):
            t0 = time.perf_counter()
            _ = float(run(init_carry, reps))
            b = min(b, time.perf_counter() - t0)
        return b

    t_lo = best(lo)
    t_hi = best(hi)
    return (t_hi - t_lo) / (hi - lo) * 1000.0


def emit(metric: str, value: float, unit: str, baseline: float | None):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 4),
                "unit": unit,
                "vs_baseline": None if baseline is None else round(baseline / value, 2),
            }
        )
    )
