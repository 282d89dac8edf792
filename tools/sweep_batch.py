"""Sweep BATCH for the headline bench workload. Diagnostics to stderr."""
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

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.image_icp import align_impl_pallas_v3_batched
    from align3d_tpu.icp.params import IcpParams
    from align3d_tpu.range_image import build_pyramid_impl

    H, W, ITERS = 480, 640, 10
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth0 = (2000 + 2 * xs + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    depth1 = (2000 + 2 * (xs + 1) + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    tex = rng.uniform(30, 220, size=(H, W + 8, 3)).astype(np.uint8)
    target = build_pyramid_impl(True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, :W]), jnp.asarray(depth0))[0]
    source = build_pyramid_impl(True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, 1 : W + 1]), jnp.asarray(depth1))[0]
    n = H * W
    params = IcpParams(max_iterations=ITERS, engine="pallas")
    args = (
        source.points.reshape(n, 3), source.mask.reshape(n), source.intensities.reshape(n),
        target.points.reshape(n, 3), target.mask.reshape(n), target.normals.reshape(n, 3),
        target.intensity_map,
    )

    for BATCH in (8, 16, 32):
        def tile(a):
            return jnp.broadcast_to(a[None], (BATCH,) + a.shape)

        bargs = tuple(tile(a) for a in args)
        rot0, tr0 = tile(jnp.eye(3)), tile(jnp.zeros(3))

        @functools.partial(jax.jit, static_argnames=("reps",))
        def bench_fn(rot, tr, reps, bargs=bargs):
            def body(_, carry):
                r, t, acc = carry
                br, bt, bres = align_impl_pallas_v3_batched(r, t + 1e-12 * acc, *bargs, intr, params)
                return (r, t, acc + jnp.sum(bres))
            return jax.lax.fori_loop(0, reps, body, (rot, tr, jnp.float32(0)))[2]

        LO, HI = 1, max(2, 72 // BATCH + 1)
        t0 = time.perf_counter(); _ = float(bench_fn(rot0, tr0, LO)); log(f"B={BATCH} compile lo {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter(); _ = float(bench_fn(rot0, tr0, HI)); log(f"B={BATCH} compile hi {time.perf_counter()-t0:.1f}s")

        def best_of(reps, calls=4):
            best = 1e9
            for _ in range(calls):
                t0 = time.perf_counter()
                _ = float(bench_fn(rot0, tr0, reps))
                best = min(best, time.perf_counter() - t0)
            return best

        t_lo, t_hi = best_of(LO), best_of(HI)
        ms = (t_hi - t_lo) / ((HI - LO) * BATCH) * 1000.0
        log(f"BATCH={BATCH}: {ms:.3f} ms/pair  ({38.576/ms:.1f}x)")


if __name__ == "__main__":
    main()
