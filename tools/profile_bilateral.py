"""Per-stage timing of the bilateral-grid filter: splat / blur / normalize+slice.

Usage: python tools/profile_bilateral.py [depth_span_u16]
  default span ~1768 (gd~64); pass 3800 for the realistic bedroom/sample1
  span (gd~131).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benches._harness import log, marginal_ms, setup_jax  # noqa: E402

H, W = 480, 640


def main() -> int:
    setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from align3d_tpu.ops import bilateral as b

    span = int(sys.argv[1]) if len(sys.argv) > 1 else 1768
    rng = np.random.default_rng(0)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    ramp = (2 * xs + ys) * (span / 1768.0)
    depth = (2000 + ramp + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    depth[rng.random((H, W)) < 0.07] = 0
    depth = jnp.asarray(depth)

    filt = b.BilateralFilter()
    grid = b.BilateralGrid.from_image(depth, filt.sigma_space, filt.sigma_color,
                                      filt.pad_depth_to)
    gd = grid.dim[2]
    log(f"grid dims: {grid.dim}")
    cmin = grid.color_min

    def splat_step(_, acc):
        g = b._splat(depth + (acc * 1e-12).astype(jnp.uint16), cmin,
                     grid.dim[:3], filt.sigma_space, filt.sigma_color)
        return acc + jnp.sum(g[0, 0, 0])

    def blur_step(_, acc):
        g = b._blur(grid.data_cm + acc * 1e-20, jnp.int32(gd))
        return acc + jnp.sum(g[0, 0, 0])

    def norm_step(_, acc):
        g = b._normalize(grid.data_cm + acc * 1e-20)
        return acc + jnp.sum(g[0, 0, 0])

    def slice_step(_, acc):
        v = b._slice(grid.data_cm + acc * 1e-20, depth, cmin,
                     filt.sigma_space, filt.sigma_color)
        return acc + jnp.sum(v[0, 0])

    def slice_fused_step(_, acc):
        v = b._slice_fused(grid.data_cm + acc * 1e-20, depth, cmin,
                           filt.sigma_space, filt.sigma_color)
        return acc + jnp.sum(v[0, 0])

    def full_step(_, acc):
        out = filt.filter_static(depth + (acc * 1e-12).astype(jnp.uint16), cmin, gd)
        return acc + jnp.sum(out[0].astype(jnp.float32))

    for name, fn in [("splat", splat_step), ("blur", blur_step),
                     ("normalize", norm_step), ("slice", slice_step),
                     ("slice fused (pallas)", slice_fused_step),
                     ("full filter", full_step)]:
        ms = marginal_ms(fn, jnp.float32(0), lo=2, hi=22, calls=4)
        log(f"{name}: {ms:.3f} ms")

    def sb_step(_, acc):
        g = b.BilateralGrid.from_image_static(depth + (acc * 1e-12).astype(jnp.uint16), cmin, gd, filt.sigma_space, filt.sigma_color)
        g = g.convolve()
        return acc + jnp.sum(g.data_cm[0, 0, 0])

    def sbn_step(_, acc):
        g = b.BilateralGrid.from_image_static(depth + (acc * 1e-12).astype(jnp.uint16), cmin, gd, filt.sigma_space, filt.sigma_color)
        g = g.convolve().normalize()
        return acc + jnp.sum(g.data_cm[0, 0, 0])

    def sbns_step(_, acc):
        g = b.BilateralGrid.from_image_static(depth + (acc * 1e-12).astype(jnp.uint16), cmin, gd, filt.sigma_space, filt.sigma_color)
        v = g.convolve().normalize().slice(depth)
        return acc + jnp.sum(v[0].astype(jnp.float32))

    for name, fn in [("splat+blur", sb_step), ("splat+blur+norm", sbn_step),
                     ("splat+blur+norm+slice", sbns_step)]:
        ms = marginal_ms(fn, jnp.float32(0), lo=2, hi=22, calls=4)
        log(f"{name}: {ms:.3f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
