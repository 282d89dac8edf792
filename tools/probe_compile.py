"""Measure cold-compile time of the v4 ICP kernel step in isolation.

Usage: python tools/probe_compile.py [batch] [--fori N] [--cache DIR]
Times jax.jit(...).lower() and .compile() separately for (a) one bare
icp_step_pallas_batched call and (b) optionally a fori_loop of N chained GN
iterations around it (the align-loop shape bench.py compiles).
"""

import sys
import time

sys.path.insert(0, ".")

H, W = 480, 640


def main() -> int:
    args = sys.argv[1:]
    batch = int(args[0]) if args and not args[0].startswith("--") else 2
    fori = 0
    cache = None
    fuzz = 0.0
    if "--fori" in args:
        fori = int(args[args.index("--fori") + 1])
    if "--cache" in args:
        cache = args[args.index("--cache") + 1]
    if "--fuzz" in args:
        # Perturb fx by a unique epsilon so the program hash is fresh: the
        # remote Mosaic compile server caches by hash, so repeat probes of an
        # identical program measure cache hits, not compiles.
        fuzz = float(args[args.index("--fuzz") + 1])

    import jax

    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import functools

    import jax.numpy as jnp
    import numpy as np

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.params import IcpParams
    from align3d_tpu.range_image import build_pyramid_impl

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(
        fx=525.0 + fuzz, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth0 = (2000 + 2 * xs + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    tex = rng.uniform(30, 220, size=(H, W, 3)).astype(np.uint8)
    tgt = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex), jnp.asarray(depth0)
    )[0]
    n = H * W

    from align3d_tpu.icp.image_icp import (
        align_impl_pallas_v4_batched_packed,
        prepack_v4_batched,
    )
    from align3d_tpu.ops import icp_pallas_v4 as k4

    def tile(a):
        return jnp.broadcast_to(a[None], (batch,) + a.shape)

    bargs = (
        tile(tgt.points.reshape(n, 3)),
        tile(tgt.mask.reshape(n)),
        tile(tgt.intensities.reshape(n)),
        tile(tgt.points.reshape(n, 3)),
        tile(tgt.mask.reshape(n)),
        tile(tgt.normals.reshape(n, 3)),
        tile(tgt.intensity_map),
    )
    sp, tp, cent, _, _ = jax.jit(
        functools.partial(prepack_v4_batched, intrinsics=intr)
    )(*bargs)
    sp, tp, cent = jax.block_until_ready((sp, tp, cent))

    params = IcpParams(max_iterations=10, engine="pallas_v4")
    rot0 = tile(jnp.eye(3))
    tr0 = tile(jnp.zeros(3))

    if fori == 0:
        # bare one-step kernel
        from align3d_tpu.ops.icp_pallas_v3 import predict_bases_centroid_batched

        hp = tp.shape[3]
        cb, dyb, dxb = jax.jit(
            functools.partial(predict_bases_centroid_batched, intrinsics=intr, hp=hp)
        )(rot0, tr0, cent)
        ptuple = (0.5, float(np.pi / 10), 2.75)

        def f(r, t, cb, dyb, dxb, spx, tpx):
            return k4.icp_step_pallas_batched(
                r, t, cb, dyb, dxb, spx, tpx, intr, H, W, ptuple
            )

        jf = jax.jit(f)
        t0 = time.perf_counter()
        lowered = jf.lower(rot0, tr0, cb, dyb, dxb, sp, tp)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        print(f"bare step: lower {t1 - t0:.1f}s compile {t2 - t1:.1f}s")
    else:
        def f(r, t, spx, tpx, cx):
            def body(_, carry):
                rr, tt, acc = carry
                br, bt, bres = align_impl_pallas_v4_batched_packed(
                    rr, tt + 1e-12 * acc, spx, tpx, cx, intr, H, W, params
                )
                return (rr, tt, acc + jnp.sum(bres))

            r_, t_, acc = jax.lax.fori_loop(
                0, fori, body, (r, t, jnp.float32(0))
            )
            return acc

        jf = jax.jit(f)
        t0 = time.perf_counter()
        lowered = jf.lower(rot0, tr0, sp, tp, cent)
        t1 = time.perf_counter()
        compiled = lowered.compile()
        t2 = time.perf_counter()
        print(f"fori({fori}) align: lower {t1 - t0:.1f}s compile {t2 - t1:.1f}s")
    return 0


if __name__ == "__main__":
    sys.exit(main())
