"""Sub-stage timing of the batched pyramid build (9 frames, 640x480)."""

import sys

sys.path.insert(0, ".")
from benches._harness import log, marginal_ms, setup_jax  # noqa: E402

H, W = 480, 640
B = 9


def main() -> int:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.image import py_scale_down, rgb_to_luma_u8
    from align3d_tpu.ops import normals as normals_ops
    from align3d_tpu.ops import resize as resize_ops
    from align3d_tpu.ops.intensity import build_intensity_map
    from align3d_tpu.range_image import RangeImage

    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(
        fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    colors = jnp.asarray(
        rng.uniform(30, 220, size=(B, H, W, 3)).astype(np.uint8)
    )
    depths = jnp.asarray(
        np.stack(
            [
                (2000 + 2 * (xs + i) + ys + rng.integers(0, 8, (H, W))).astype(
                    np.uint16
                )
                for i in range(B)
            ]
        )
    )

    def chain(x, acc):
        return x + (acc * 1e-20).astype(x.dtype)

    # backproject
    def bp(_, acc):
        ri = jax.vmap(lambda c, d: RangeImage.from_rgbd(intr, c, d, 0.001))(
            colors, depths + (acc * 0).astype(jnp.uint16)
        )
        return acc + jnp.sum(ri.points) * 1e-20

    log(f"backproject: {marginal_ms(bp, jnp.float32(0), 1, 6, 3):.2f} ms")

    ri = jax.vmap(lambda c, d: RangeImage.from_rgbd(intr, c, d, 0.001))(
        colors, depths
    )
    pts, mask = ri.points, ri.mask

    def nrm(_, acc):
        n = jax.vmap(normals_ops.compute_normals)(chain(pts, acc), mask)
        return acc + jnp.sum(n) * 1e-20

    log(f"normals (full res): {marginal_ms(nrm, jnp.float32(0), 1, 6, 3):.2f} ms")

    norms = jax.vmap(normals_ops.compute_normals)(pts, mask)

    def rsz(_, acc):
        p1, m1 = jax.vmap(
            lambda p, m: resize_ops.resize_nearest_to_mean(p, m, H // 2, W // 2)
        )(chain(pts, acc), mask)
        n1, _ = jax.vmap(
            lambda p, m: resize_ops.resize_nearest_to_mean(p, m, H // 2, W // 2)
        )(chain(norms, acc), mask)
        p2, m2 = jax.vmap(
            lambda p, m: resize_ops.resize_nearest_to_mean(p, m, H // 4, W // 4)
        )(p1, m1)
        n2, _ = jax.vmap(
            lambda p, m: resize_ops.resize_nearest_to_mean(p, m, H // 4, W // 4)
        )(n1, m1)
        return acc + (jnp.sum(p2) + jnp.sum(n2) + jnp.sum(m2)) * 1e-20

    log(f"resize pts+norms (2 levels): {marginal_ms(rsz, jnp.float32(0), 1, 6, 3):.2f} ms")

    def col(_, acc):
        c1 = jax.vmap(lambda c: py_scale_down(c, 1.0))(chain(colors, acc))
        c2 = jax.vmap(lambda c: py_scale_down(c, 1.0))(c1)
        return acc + (jnp.sum(c1.astype(jnp.float32)) + jnp.sum(c2.astype(jnp.float32))) * 1e-20

    log(f"color blur+decimate (2 levels): {marginal_ms(col, jnp.float32(0), 1, 6, 3):.2f} ms")

    def inten(_, acc):
        tot = jnp.float32(0)
        for hh, ww, cc in ((H, W, colors),):
            lum = jax.vmap(rgb_to_luma_u8)(chain(cc, acc))
            m = jax.vmap(build_intensity_map)(lum)
            tot = tot + jnp.sum(m)
        return acc + tot * 1e-20

    log(f"luma+intensity map (level 0 only): {marginal_ms(inten, jnp.float32(0), 1, 6, 3):.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
