"""End-to-end odometry pipeline throughput: batched pyramid preprocessing +
3-level multiscale ICP (reference defaults: 20/20/30 iterations) + parallel
pose scan, ms per frame.

The reference has no published e2e number (its README anchor times only the
ICP align); this bench publishes ours — the "production serving" figure: how
fast a capture streams through the whole pipeline on one chip.
"""

import sys

sys.path.insert(0, ".")
from benches._harness import emit, log, marginal_ms, setup_jax  # noqa: E402

H, W = 480, 640
NFRAMES = int(__import__("os").environ.get("ODO_NFRAMES", "9"))  # pairs = NFRAMES-1


def main() -> int:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.params import MsIcpParams
    from align3d_tpu.parallel import batch as pbatch
    from align3d_tpu.se3 import Transform
    from align3d_tpu.trajectory import accumulate_scan

    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(
        fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    tex = rng.uniform(30, 220, size=(H, W + NFRAMES + 1, 3)).astype(np.uint8)
    colors = np.stack([tex[:, i : i + W] for i in range(NFRAMES)])
    depths = np.stack(
        [
            (2000 + 2 * (xs + i) + ys + rng.integers(0, 8, size=(H, W))).astype(
                np.uint16
            )
            for i in range(NFRAMES)
        ]
    )
    colors = jnp.asarray(colors)
    depths = jnp.asarray(depths)

    engine = sys.argv[1] if len(sys.argv) > 1 else "pallas_v4"
    params = (
        MsIcpParams.default()
        if engine == "xla"
        else MsIcpParams.default_tpu(engine)
    )
    log(f"engine: {engine}; {NFRAMES} frames, 3-level pyramid, iters 20/20/30")

    # Second variant: the full reference-README pipeline with the bilateral
    # depth filter ON (README.md:44-113 enables it for the published
    # bedroom-20 anchor). The grid's range axis is sized for this scene.
    from align3d_tpu.ops.bilateral import BilateralFilter

    filt = BilateralFilter()
    gd_static = (
        int((int(depths.max()) - int(depths.min())) / filt.sigma_color) + 1 + 4
    )

    def pipeline(colors_in, depths_in, initial, with_bilateral=False):
        if with_bilateral:
            cmin = jnp.min(depths_in, axis=(1, 2))
            depths_in = jax.vmap(
                lambda d, cm: filt.filter_static(d, cm, gd_static)
            )(depths_in, cmin)
        pyr = pbatch.build_pyramids_batched(
            intr, 0.001, colors_in, depths_in, pyramid_levels=3
        )
        src = [jax.tree.map(lambda a: a[1:], ri) for ri in pyr]
        tgt = [jax.tree.map(lambda a: a[:-1], ri) for ri in pyr]
        rel = pbatch.multiscale_align_batched(tgt, src, params, initial=initial)
        traj = accumulate_scan(rel)
        return traj.camera_to_world.rotation, traj.camera_to_world.translation

    b = NFRAMES - 1

    def step(_, carry):
        acc = carry
        init = Transform.identity((b,))
        init = Transform(init.rotation, init.translation + 1e-12 * acc)
        rot, trans = pipeline(colors, depths, init)
        return acc + jnp.sum(trans[-1])

    def step_bilateral(_, carry):
        acc = carry
        init = Transform.identity((b,))
        init = Transform(init.rotation, init.translation + 1e-12 * acc)
        rot, trans = pipeline(colors, depths, init, with_bilateral=True)
        return acc + jnp.sum(trans[-1])

    # lo>=3: XLA fully unrolls trip<=2 fori loops and its optimizer can
    # take minutes on the flattened 3-level align body (see bench.py note).
    ms = marginal_ms(step, jnp.float32(0.0), lo=3, hi=6, calls=3)
    ms_per_frame = ms / b
    log(
        f"odometry e2e: {ms:.2f} ms per {b}-pair step "
        f"({ms_per_frame:.3f} ms/frame, {1000.0 / ms_per_frame:.0f} frames/s/chip)"
    )
    ms_b = marginal_ms(step_bilateral, jnp.float32(0.0), lo=3, hi=6, calls=3)
    ms_b_frame = ms_b / b
    log(
        f"odometry e2e + bilateral (gd={gd_static}): {ms_b:.2f} ms per "
        f"{b}-pair step ({ms_b_frame:.3f} ms/frame, "
        f"{1000.0 / ms_b_frame:.0f} frames/s/chip)"
    )
    emit("odometry_e2e_640x480_ms_per_frame", ms_per_frame, "ms", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
