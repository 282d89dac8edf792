"""Headline benchmark: projective ICP throughput on one chip.

Mirrors the reference's ``benches/bench_image_icp.rs`` workload — one
640x480 RGB-D pair, 10 GN iterations — on the fused banded-gather Pallas
v4 engine (align3d_tpu/ops/icp_pallas_v4.py). Baseline: 38.576 ms/pair on the
reference's i7-11800H (README.md:128-134, BASELINE.md).

Prints ONE JSON line:
  {"metric": "image_icp_640x480_ms_per_pair", "value": ..., "unit": "ms",
   "vs_baseline": <speedup factor vs 38.576 ms>}
Diagnostics go to stderr.
"""

import json
import sys
import time

import numpy as np

BASELINE_MS = 38.576
ITERS = 10
H, W = 480, 640


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main() -> int:
    import functools

    import jax

    # The Mosaic kernel's first compile through the serving tunnel is slow
    # (minutes); persist compiled programs so repeat bench runs start fast.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.params import IcpParams
    from align3d_tpu.range_image import build_pyramid_impl

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    # Synthetic textured slanted-plane pair (no dataset dependency).
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(
        fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth0 = (2000 + 2 * xs + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    depth1 = (2000 + 2 * (xs + 1) + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    tex = rng.uniform(30, 220, size=(H, W + 8, 3)).astype(np.uint8)

    target = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, :W]), jnp.asarray(depth0)
    )[0]
    source = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, 1 : W + 1]), jnp.asarray(depth1)
    )[0]

    n = H * W
    params = IcpParams(max_iterations=ITERS, engine="pallas_v4")
    args = (
        source.points.reshape(n, 3),
        source.mask.reshape(n),
        source.intensities.reshape(n),
        target.points.reshape(n, 3),
        target.mask.reshape(n),
        target.normals.reshape(n, 3),
        target.intensity_map,
    )

    # The serving tunnel adds ~30 ms of fixed RPC latency per dispatch and
    # block_until_ready does not block on it — so aligns run INSIDE one
    # jitted program (a fori of BATCH-pair aligns, chained through the carry
    # so no iteration can be CSE'd away) and completion is forced by pulling
    # a scalar.
    BATCH = 8

    def tile(a):
        return jnp.broadcast_to(a[None], (BATCH,) + a.shape)

    bargs = tuple(tile(a) for a in args)
    rot0 = tile(jnp.eye(3))
    tr0 = tile(jnp.zeros(3))

    # Transform-independent packing happens ONCE, outside the timed region —
    # mirroring the reference bench, which prebuilds both RangeImages and
    # constructs ImageIcp::new(target) outside criterion's loop and times
    # only icp.align (reference benches/bench_image_icp.rs).
    from align3d_tpu.icp.image_icp import (
        align_impl_pallas_v4_batched_packed,
        prepack_v4_batched,
    )

    sp, tp, cent, _, _ = jax.jit(
        functools.partial(prepack_v4_batched, intrinsics=intr)
    )(*bargs)

    @functools.partial(jax.jit, static_argnames=("reps",))
    def bench_fn(rot, tr, sp, tp, cent, reps):
        def body(_, carry):
            r, t, acc = carry
            # acc feeds the next rep's initial translation: every rep is
            # strictly serialized and none can be CSE'd away.
            br, bt, bres = align_impl_pallas_v4_batched_packed(
                r, t + 1e-12 * acc, sp, tp, cent, intr, H, W, params
            )
            return (r, t, acc + jnp.sum(bres))

        r, t, acc = jax.lax.fori_loop(0, reps, body, (rot, tr, jnp.float32(0)))
        return acc

    LO, HI = 1, 9
    t0 = time.perf_counter()
    _ = float(bench_fn(rot0, tr0, sp, tp, cent, LO))
    log(f"compile ({LO} rep): {time.perf_counter() - t0:.2f}s")
    t0 = time.perf_counter()
    _ = float(bench_fn(rot0, tr0, sp, tp, cent, HI))
    log(f"compile ({HI} reps): {time.perf_counter() - t0:.2f}s")

    def best_of(reps, calls=4):
        best = 1e9
        for _ in range(calls):
            t0 = time.perf_counter()
            _ = float(bench_fn(rot0, tr0, sp, tp, cent, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    # Slope between rep counts cancels the tunnel's fixed ~30 ms dispatch
    # RPC latency (block_until_ready does not cover it).
    t_lo = best_of(LO)
    t_hi = best_of(HI)
    ms_per_pair = (t_hi - t_lo) / ((HI - LO) * BATCH) * 1000.0
    log(
        f"slope over {(HI - LO) * BATCH} pair-aligns x {ITERS} iters: "
        f"{ms_per_pair:.3f} ms/pair ({1000.0 / ms_per_pair:.1f} pairs/s)"
    )

    print(
        json.dumps(
            {
                "metric": "image_icp_640x480_ms_per_pair",
                "value": round(ms_per_pair, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms_per_pair, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
