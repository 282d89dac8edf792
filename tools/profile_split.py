"""Split timing of the batched v3 align: full loop vs kernel-only loop.

Diagnostics to stderr. Run on the real TPU.
"""
import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def slope(fn, reps=(2, 12)):
    """Wall-clock slope between two rep counts (removes fixed dispatch cost)."""
    ts = []
    for n in reps:
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
        out[0].block_until_ready()
        ts.append(time.perf_counter() - t0)
    return (ts[1] - ts[0]) / (reps[1] - reps[0])


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.image_icp import (
        align_impl_pallas_v3_batched,
        _gn_from_aug16,
    )
    from align3d_tpu.icp.params import IcpParams
    from align3d_tpu.ops import icp_pallas_v3 as k3
    from align3d_tpu.range_image import build_pyramid_impl
    from align3d_tpu.se3 import Transform

    H, W, ITERS = 480, 640, 10
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(
        fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    d0 = (2000 + 2 * xs + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    d1 = (2000 + 2 * (xs + 1) + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    tex = rng.uniform(30, 220, size=(H, W + 8, 3)).astype(np.uint8)
    target = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, :W]), jnp.asarray(d0)
    )[0]
    source = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, 1 : W + 1]), jnp.asarray(d1)
    )[0]
    n = H * W
    params = IcpParams(max_iterations=ITERS)
    flat = (
        source.points.reshape(n, 3),
        source.mask.reshape(n),
        source.intensities.reshape(n),
        target.points.reshape(n, 3),
        target.mask.reshape(n),
        target.normals.reshape(n, 3),
        target.intensity_map,
    )
    bargs = tuple(
        jnp.asarray(np.broadcast_to(np.asarray(a)[None], (B,) + a.shape)) for a in flat
    )
    rot0 = jnp.broadcast_to(jnp.eye(3)[None], (B, 3, 3))
    tr0 = jnp.zeros((B, 3))

    # ---- full align (centroid predictor) -----------------------------------
    full = jax.jit(
        functools.partial(align_impl_pallas_v3_batched, intrinsics=intr, params=params)
    )
    t0 = time.perf_counter()
    out = full(rot0, tr0, *bargs)
    out[0].block_until_ready()
    log(f"full compile+run: {time.perf_counter()-t0:.1f}s")
    s = slope(lambda: full(rot0, tr0, *bargs))
    log(f"FULL align: {s*1000:.3f} ms/call = {s*1e6/B/ITERS:.2f} us/pair-iter "
        f"({s*1000/B:.4f} ms/pair)")

    # ---- kernel-only loop: fixed bases, still solve+exp ---------------------
    sp = jax.vmap(k3.pack_source)(
        bargs[0].reshape(B, H, W, 3), bargs[1].reshape(B, H, W), bargs[2].reshape(B, H, W)
    )
    tp = jax.vmap(k3.pack_target)(
        bargs[3].reshape(B, H, W, 3),
        bargs[5].reshape(B, H, W, 3),
        bargs[4].reshape(B, H, W),
        bargs[6],
    )
    pt = (params.max_distance, params.max_normal_angle, params.max_color_distance)
    cent = k3.source_centroids_batched(sp, intr)
    cb0, dyb0, dxb0 = k3.predict_bases_centroid_batched(rot0, tr0, cent, intr, sp.shape[1] * k3.CHUNK)

    @jax.jit
    def kernel_only(rot, tr, cb, dyb, dxb, sp, tp):
        def body(_, carry):
            rot, trans = carry
            geo_aug, col_aug, _ = k3.icp_step_pallas_batched(
                rot, trans, cb, dyb, dxb, sp, tp, intr, H, W, pt,
                emit_stats=False,
            )
            geom, color = _gn_from_aug16(geo_aug, col_aug)
            merged = geom.add_weighted(color, jnp.float32(1.0), jnp.float32(1.0))
            update = merged.solve()
            nt = Transform.exp(update) @ Transform(rot, trans)
            return (nt.rotation, nt.translation)

        return jax.lax.fori_loop(0, ITERS, body, (rot, tr))

    t0 = time.perf_counter()
    out = kernel_only(rot0, tr0, cb0, dyb0, dxb0, sp, tp)
    out[0].block_until_ready()
    log(f"kernel-only compile+run: {time.perf_counter()-t0:.1f}s")
    s = slope(lambda: kernel_only(rot0, tr0, cb0, dyb0, dxb0, sp, tp))
    log(f"KERNEL-ONLY loop: {s*1000:.3f} ms/call = {s*1e6/B/ITERS:.2f} us/pair-iter "
        f"({s*1000/B:.4f} ms/pair)")

    # ---- pack alone ----------------------------------------------------------
    @jax.jit
    def pack_only(pts_s, msk_s, int_s, pts_t, nrm_t, msk_t, imap_t):
        sp2 = jax.vmap(k3.pack_source)(
            pts_s.reshape(B, H, W, 3), msk_s.reshape(B, H, W), int_s.reshape(B, H, W)
        )
        tp2 = jax.vmap(k3.pack_target)(
            pts_t.reshape(B, H, W, 3),
            nrm_t.reshape(B, H, W, 3),
            msk_t.reshape(B, H, W),
            imap_t,
        )
        return (jnp.sum(sp2[:, 0, 0, 0]) + jnp.sum(tp2[:, 0, 0, 0, 0]))[None]

    pk = (bargs[0], bargs[1], bargs[2], bargs[3], bargs[5], bargs[4], bargs[6])
    out = pack_only(*pk)
    out.block_until_ready()
    s = slope(lambda: pack_only(*pk))
    log(f"PACK only: {s*1000:.3f} ms/call = {s*1e6/B:.2f} us/pair "
        f"(amortized over {ITERS} iters: {s*1e6/B/ITERS:.2f} us/pair-iter)")

    # ---- centroid predictor alone -------------------------------------------
    @jax.jit
    def pred_only(rot, tr):
        def body(_, carry):
            cb, dyb, dxb = k3.predict_bases_centroid_batched(
                rot, tr, cent, intr, sp.shape[1] * k3.CHUNK
            )
            return (carry[0] + jnp.sum(cb), carry[1] + jnp.sum(dyb))

        return jax.lax.fori_loop(0, ITERS, body, (jnp.int32(0), jnp.int32(0)))

    out = pred_only(rot0, tr0)
    out[0].block_until_ready()
    s = slope(lambda: pred_only(rot0, tr0))
    log(f"PREDICT(centroid) x{ITERS}: {s*1000:.3f} ms/call = "
        f"{s*1e6/B/ITERS:.2f} us/pair-iter")
    return 0


if __name__ == "__main__":
    sys.exit(main())
