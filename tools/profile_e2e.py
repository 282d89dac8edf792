"""Split timing of the e2e odometry pipeline: pyramids vs per-level aligns.

Usage: python tools/profile_e2e.py
"""

import sys

sys.path.insert(0, ".")
from benches._harness import log, marginal_ms, setup_jax  # noqa: E402

H, W = 480, 640
NFRAMES = 9


def main() -> int:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.params import MsIcpParams
    from align3d_tpu.parallel import batch as pbatch

    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(
        fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    tex = rng.uniform(30, 220, size=(H, W + NFRAMES + 1, 3)).astype(np.uint8)
    colors = jnp.asarray(np.stack([tex[:, i : i + W] for i in range(NFRAMES)]))
    depths = jnp.asarray(
        np.stack(
            [
                (2000 + 2 * (xs + i) + ys + rng.integers(0, 8, size=(H, W))).astype(
                    np.uint16
                )
                for i in range(NFRAMES)
            ]
        )
    )
    b = NFRAMES - 1

    # --- pyramids only ------------------------------------------------------
    # Consume EVERY leaf with a full reduction: summing a single element lets
    # XLA slice-push through the elementwise chain and DCE the actual work.
    def pyr_step(_, acc):
        pyr = pbatch.build_pyramids_batched(
            intr, 0.001, colors, depths + (acc * 1e-12).astype(jnp.uint16),
            pyramid_levels=3,
        )
        tot = sum(
            jnp.sum(leaf.astype(jnp.float32))
            for ri in pyr
            for leaf in jax.tree.leaves(ri)
            if hasattr(leaf, "dtype")
        )
        return acc + tot * 1e-20

    ms = marginal_ms(pyr_step, jnp.float32(0), lo=1, hi=6, calls=3)
    log(f"pyramids (9 frames, 3 levels): {ms:.2f} ms ({ms / b:.3f} ms/frame)")

    # --- each level's align alone ------------------------------------------
    params = MsIcpParams.default_tpu("pallas_v4")
    pyr = jax.jit(
        lambda c, d: pbatch.build_pyramids_batched(intr, 0.001, c, d, pyramid_levels=3)
    )(colors, depths)
    pyr = jax.tree.map(lambda a: jax.device_put(a), pyr)
    for lvl in range(3):
        ri = pyr[lvl]
        src = jax.tree.map(lambda a: a[1:], ri)
        tgt = jax.tree.map(lambda a: a[:-1], ri)
        lp = params[lvl]

        def lvl_step(_, acc, src=src, tgt=tgt, lp=lp):
            from align3d_tpu.icp.params import MsIcpParams as MP
            from align3d_tpu.se3 import Transform

            init = Transform.identity((b,))
            init = Transform(init.rotation, init.translation + 1e-12 * acc)
            rel = pbatch.multiscale_align_batched([tgt], [src], MP((lp,)), init)
            return acc + jnp.sum(rel.translation[-1])

        ms = marginal_ms(lvl_step, jnp.float32(0), lo=1, hi=6, calls=3)
        log(
            f"level {lvl} ({ri.points.shape[1]}x{ri.points.shape[2]}, "
            f"engine {lp.engine}, {lp.max_iterations} iters): "
            f"{ms:.2f} ms ({ms / b:.3f} ms/frame)"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
