"""Microbenchmark for the fused ICP Pallas kernel (ops/icp_pallas_v3.py).

Times, on the real chip, with the same chained-reps methodology as bench.py:
  * kernel-only: 10 chained icp_step_pallas_batched calls (no solve/glue)
  * full align: align_impl_pallas_v3_batched, 10 iterations
for a configurable band radius, to separate kernel cost from GN glue and to
measure association-band sensitivity. Diagnostics to stderr, one JSON line
per measurement to stdout.

Usage: python benches/bench_icp_kernel.py [--radius 2] [--batch 8]
"""

import argparse
import functools
import json
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--radius", type=int, default=2)
    ap.add_argument("--engine", choices=["v3"], default="v3")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--skip-full", action="store_true")
    ap.add_argument("--skip-kernel", action="store_true")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.params import IcpParams
    from align3d_tpu.range_image import build_pyramid_impl

    from align3d_tpu.icp.image_icp import (
        align_impl_pallas_v3_batched as align_impl_pallas_batched,
    )
    from align3d_tpu.ops import icp_pallas_v3 as icp_pallas

    H, W = 480, 640
    ITERS = args.iters
    BATCH = args.batch

    log(f"device: {jax.devices()[0]}")
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(
        fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth0 = (2000 + 2 * xs + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    depth1 = (2000 + 2 * (xs + 1) + ys + rng.integers(0, 8, size=(H, W))).astype(
        np.uint16
    )
    tex = rng.uniform(30, 220, size=(H, W + 8, 3)).astype(np.uint8)
    target = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, :W]), jnp.asarray(depth0)
    )[0]
    source = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, 1 : W + 1]), jnp.asarray(depth1)
    )[0]

    n = H * W
    params = IcpParams(max_iterations=ITERS, engine="pallas", band_radius=args.radius)
    flat = (
        source.points.reshape(n, 3),
        source.mask.reshape(n),
        source.intensities.reshape(n),
        target.points.reshape(n, 3),
        target.mask.reshape(n),
        target.normals.reshape(n, 3),
        target.intensity_map,
    )

    def tile(a):
        return jnp.broadcast_to(a[None], (BATCH,) + a.shape)

    bargs = tuple(tile(a) for a in flat)
    rot0 = tile(jnp.eye(3))
    tr0 = tile(jnp.zeros(3))

    def best_of(fn, reps, calls=4):
        best = 1e9
        for _ in range(calls):
            t0 = time.perf_counter()
            _ = float(fn(rot0, tr0, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    LO, HI = 1, 9

    def measure(fn, name):
        t0 = time.perf_counter()
        _ = float(fn(rot0, tr0, LO))
        log(f"{name} compile({LO}): {time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        _ = float(fn(rot0, tr0, HI))
        log(f"{name} compile({HI}): {time.perf_counter() - t0:.1f}s")
        t_lo = best_of(fn, LO)
        t_hi = best_of(fn, HI)
        us = (t_hi - t_lo) / ((HI - LO) * BATCH * ITERS) * 1e6
        log(f"{name}: {us:.1f} us/pair/iter")
        print(
            json.dumps(
                {
                    "metric": f"{name}_us_per_pair_iter",
                    "value": round(us, 2),
                    "unit": "us",
                    "radius": args.radius,
                    "batch": BATCH,
                }
            ),
            flush=True,
        )
        return us

    # ---- full align ------------------------------------------------------
    if not args.skip_full:
        @functools.partial(jax.jit, static_argnames=("reps",))
        def full_impl(rot, tr, reps, *ba):
            def body(_, carry):
                r, t, acc = carry
                br, bt, bres = align_impl_pallas_batched(
                    r, t + 1e-12 * acc, *ba, intr, params
                )
                return (r, t, acc + jnp.sum(bres))

            r, t, acc = jax.lax.fori_loop(0, reps, body, (rot, tr, jnp.float32(0)))
            return acc

        def full_fn(rot, tr, reps):
            return full_impl(rot, tr, reps, *bargs)

        measure(full_fn, f"full_align_{args.engine}_r{args.radius}")

    # ---- kernel-only -------------------------------------------------------
    if not args.skip_kernel:
        sp = jax.vmap(icp_pallas.pack_source)(
            bargs[0].reshape(BATCH, H, W, 3),
            bargs[1].reshape(BATCH, H, W),
            bargs[2].reshape(BATCH, H, W),
        )
        tp = jax.vmap(icp_pallas.pack_target)(
            bargs[3].reshape(BATCH, H, W, 3),
            bargs[5].reshape(BATCH, H, W, 3),
            bargs[4].reshape(BATCH, H, W),
            bargs[6],
        )
        hp = sp.shape[1]
        pt = (
            params.max_distance,
            params.max_normal_angle,
            params.max_color_distance,
            params.band_radius,
        )

        @functools.partial(jax.jit, static_argnames=("reps",))
        def kern_impl(rot, tr, reps, sp, tp):
            cb0, dyb0, dxb0 = icp_pallas.predict_bases_batched(rot, tr, sp, intr, H)

            def body(_, carry):
                r, t, acc = carry
                t = t + 1e-30 * acc
                for _ in range(ITERS):
                    geo, col, stats = icp_pallas.icp_step_pallas_batched(
                        r, t, cb0, dyb0, dxb0, sp, tp, intr, H, W, pt,
                        emit_stats=False,
                    )
                    t = t + 1e-30 * geo[:, 7, 7, None]
                return (r, t, acc + jnp.sum(geo[:, 7, 7]))

            r, t, acc = jax.lax.fori_loop(0, reps, body, (rot, tr, jnp.float32(0)))
            return acc + jnp.sum(t)

        def kern_fn(rot, tr, reps):
            return kern_impl(rot, tr, reps, sp, tp)

        measure(kern_fn, f"kernel_only_{args.engine}_r{args.radius}")

    return 0


if __name__ == "__main__":
    sys.exit(main())
