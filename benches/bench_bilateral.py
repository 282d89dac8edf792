"""Bilateral-grid depth filter, 640x480 u16 (reference benches/bench_bilateral
exists without published numbers; we publish ours)."""

import sys

sys.path.insert(0, ".")
from benches._harness import emit, log, marginal_ms, setup_jax  # noqa: E402


def main() -> int:
    setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from align3d_tpu.ops.bilateral import BilateralFilter

    rng = np.random.default_rng(0)
    h, w = 480, 640
    filt = BilateralFilter()

    def run(depth_np, label):
        depth = jnp.asarray(depth_np)
        # Static grid depth for the jit-chained loop (the grid's range axis
        # is data-dependent in the reference; see
        # BilateralGrid.from_image_static).
        gd = (
            int((int(depth_np.max()) - int(depth_np.min())) / filt.sigma_color)
            + 1 + 4
        )
        color_min = jnp.asarray(depth_np.min(), depth.dtype)

        def step(_, carry):
            d, acc = carry
            out = filt.filter_static(d, color_min, gd)
            s = jnp.sum(out.astype(jnp.float32))
            # Chain the carry through the input so XLA cannot hoist the
            # filter out of the rep loop as loop-invariant.
            d_next = d + (s * 0.0).astype(d.dtype)
            return (d_next, acc + s)

        ms = marginal_ms(step, (depth, jnp.float32(0)), lo=10, hi=410)
        log(f"bilateral filter 640x480 {label} (gd={gd}): {ms:.4f} ms")
        return ms

    # Narrow span (0.5 m at depth_scale 1/1000): the historical bench
    # workload, kept for cross-round comparability.
    narrow = (2000 + rng.integers(0, 500, (h, w))).astype(np.uint16)
    # Realistic indoor span: a slanted scene covering ~2-4.3 m with holes —
    # the grid's range axis (the cost driver) matches real captures.
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    wide = (2000 + 2 * xs + ys + rng.integers(0, 8, (h, w))).astype(np.uint16)
    wide[rng.random((h, w)) < 0.05] = 0

    ms_narrow = run(narrow, "narrow-span")
    ms_wide = run(wide, "realistic-span")
    emit("bilateral_filter_640x480_ms", ms_wide, "ms", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
