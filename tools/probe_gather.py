"""Probe raw TPU costs of gather / searchsorted / sort at 500k scale."""
import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    n = 500_000
    db = jnp.asarray(rng.uniform(0, 1, n), jnp.float32)
    srt = jnp.sort(jnp.asarray(rng.integers(0, 2**31 - 1, n), jnp.int32))
    idx = jnp.asarray(rng.integers(0, n, n), jnp.int32)
    keys = jnp.asarray(rng.integers(0, 2**30, n), jnp.int32)

    def timed(name, step, lo=2, hi=12):
        """step(k_i32) -> array whose first element is pulled; chained via k."""

        @functools.partial(jax.jit, static_argnames=("reps",))
        def run(reps):
            def body(_, carry):
                k, acc = carry
                out = step(k)
                return (k + 1, acc + out.ravel()[0].astype(jnp.float32))

            return jax.lax.fori_loop(0, reps, body, (jnp.int32(0), jnp.float32(0)))[1]

        def best(reps, calls=3):
            b = 1e9
            for _ in range(calls):
                t0 = time.perf_counter()
                _ = float(run(reps))
                b = min(b, time.perf_counter() - t0)
            return b

        _ = best(lo, 1)  # compile
        ms = (best(hi) - best(lo)) / (hi - lo) * 1000
        log(f"{name}: {ms:.3f} ms")

    timed("take 500k f32 (random idx)", lambda k: jnp.take(db, (idx + k) % n))
    timed(
        "searchsorted scan 500k into 500k",
        lambda k: jnp.searchsorted(srt, keys + k, method="scan"),
    )
    timed(
        "searchsorted sort 500k into 500k",
        lambda k: jnp.searchsorted(srt, keys + k, method="sort"),
    )
    timed("argsort 500k i32", lambda k: jnp.argsort(keys + k))
    return 0


if __name__ == "__main__":
    sys.exit(main())
