"""A/B timing of the banded Pallas align engines (v3 vs v4) on the real TPU.

Same workload and slope methodology as bench.py; usage:
  python tools/bench_engine.py v3
  python tools/bench_engine.py v4
"""

import functools
import sys
import time

import numpy as np

ITERS = 10
H, W = 480, 640
BATCH = 8


def main() -> int:
    which = sys.argv[1] if len(sys.argv) > 1 else "v4"
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.params import IcpParams
    from align3d_tpu.range_image import build_pyramid_impl
    from align3d_tpu.icp import image_icp as ii

    print(f"device: {jax.devices()[0]}", file=sys.stderr, flush=True)

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
    params = IcpParams(max_iterations=ITERS)
    args = (
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

    bargs = tuple(tile(a) for a in args)
    rot0 = tile(jnp.eye(3))
    tr0 = tile(jnp.zeros(3))

    if which == "v3":
        prepack = ii.prepack_v3_batched
        aligner = ii.align_impl_pallas_v3_batched_packed
    else:
        prepack = ii.prepack_v4_batched
        aligner = ii.align_impl_pallas_v4_batched_packed

    sp, tp, cent, _, _ = jax.jit(functools.partial(prepack, intrinsics=intr))(*bargs)
    print(
        f"{which}: target pack {tp.nbytes / 1e6:.1f} MB, source {sp.nbytes / 1e6:.1f} MB",
        file=sys.stderr,
        flush=True,
    )

    @functools.partial(jax.jit, static_argnames=("reps",))
    def bench_fn(rot, tr, sp, tp, cent, reps):
        def body(_, carry):
            r, t, acc = carry
            br, bt, bres = aligner(
                r, t + 1e-12 * acc, sp, tp, cent, intr, H, W, params
            )
            return (r, t, acc + jnp.sum(bres))

        r, t, acc = jax.lax.fori_loop(0, reps, body, (rot, tr, jnp.float32(0)))
        return acc

    LO, HI = 1, 9
    t0 = time.perf_counter()
    _ = float(bench_fn(rot0, tr0, sp, tp, cent, LO))
    print(f"compile ({LO} rep): {time.perf_counter() - t0:.2f}s", file=sys.stderr)
    t0 = time.perf_counter()
    _ = float(bench_fn(rot0, tr0, sp, tp, cent, HI))
    print(f"compile ({HI} reps): {time.perf_counter() - t0:.2f}s", file=sys.stderr)

    def best_of(reps, calls=4):
        best = 1e9
        for _ in range(calls):
            t0 = time.perf_counter()
            _ = float(bench_fn(rot0, tr0, sp, tp, cent, reps))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo = best_of(LO)
    t_hi = best_of(HI)
    ms_per_pair = (t_hi - t_lo) / ((HI - LO) * BATCH) * 1000.0
    print(
        f"{which}: {ms_per_pair:.3f} ms/pair ({1000.0 / ms_per_pair:.1f} pairs/s)",
        flush=True,
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
