"""End-to-end odometry pipeline throughput: batched pyramid preprocessing +
3-level multiscale ICP (reference defaults: 20/20/30 iterations) + parallel
pose scan, ms per frame.

The reference has no published e2e number (its README anchor times only the
ICP align); this bench publishes ours — the "production serving" figure: how
fast a capture streams through the whole pipeline on one chip.

The HEADLINE series is 65 REAL fixture frames (sample1 + sample2 + a 3-frame
wrap, i.e. a 64-pair step — the BASELINE config-3 batch on real depth holes /
discontinuities / texture, same grounding bench.py got in r3); the synthetic
slanted-plane series is kept as a secondary line for cross-round comparison.
"""

import sys

sys.path.insert(0, ".")
from benches._harness import emit, log, marginal_ms, setup_jax  # noqa: E402

H, W = 480, 640
NFRAMES = int(__import__("os").environ.get("ODO_NFRAMES", "9"))  # pairs = NFRAMES-1


def _real_frames():
    """65 real sample1 frames (forward + palindrome + wrap = 64 adjacent
    pairs, every one a distinct real RGB-D pair) -> (colors (65,H,W,3) u8,
    depths (65,H,W) u16, intrinsics, depth_scale).

    sample1 only: sample2's raw depth sits at ~10x the u16 range (span
    22,500 vs 3,785), and mixing it into one batched series blows the
    bilateral grid's static depth axis to gd~1074 (a 20 GB intermediate at
    batch 65 — the reference sizes its grid per frame from min/max,
    grid.rs:51-54, so it never sees a cross-scale span either)."""
    import numpy as np

    from align3d_tpu import config
    from align3d_tpu.io.datasets.slamtb import SlamTbDataset

    ds = SlamTbDataset.load(config.ref_data_path("rgbd", "sample1"))
    base = [ds.get(i) for i in range(len(ds))]  # 31 frames
    frames = base + base[-2::-1]  # palindrome: 31 + 30 = 61
    frames = frames + base[: 65 - len(frames)]  # wrap to 65 = 64 pairs
    colors = np.stack([np.asarray(f.image.color) for f in frames])
    depths = np.stack([np.asarray(f.image.depth) for f in frames])
    return colors, depths, frames[0].camera, float(frames[0].image.depth_scale)


def run_series(label, colors, depths, intr, depth_scale, params):
    """Slope-timed e2e pipeline over one frame series; returns
    (ms_per_frame, ms_per_frame_bilateral_on)."""
    import jax
    import jax.numpy as jnp

    from align3d_tpu.ops.bilateral import BilateralFilter
    from align3d_tpu.parallel import batch as pbatch
    from align3d_tpu.se3 import Transform
    from align3d_tpu.trajectory import accumulate_scan

    colors = jnp.asarray(colors)
    depths = jnp.asarray(depths)
    b = colors.shape[0] - 1

    # Bilateral variant: the full reference-README pipeline (README.md:44-113
    # enables the filter for the published bedroom-20 anchor). The grid's
    # range axis is sized for the series' actual depth span.
    filt = BilateralFilter()
    nz = jnp.where(depths > 0, depths, jnp.uint16(65535))
    gd_static = (
        int((int(depths.max()) - int(nz.min())) / filt.sigma_color) + 1 + 4
    )

    def pipeline(colors_in, depths_in, initial, with_bilateral=False):
        if with_bilateral:
            cmin = jnp.min(
                jnp.where(depths_in > 0, depths_in, jnp.uint16(65535)),
                axis=(1, 2),
            )
            depths_in = jax.vmap(
                lambda d, cm: filt.filter_static(d, cm, gd_static)
            )(depths_in, cmin)
        pyr = pbatch.build_pyramids_batched(
            intr, depth_scale, colors_in, depths_in, pyramid_levels=3
        )
        src = [jax.tree.map(lambda a: a[1:], ri) for ri in pyr]
        tgt = [jax.tree.map(lambda a: a[:-1], ri) for ri in pyr]
        rel = pbatch.multiscale_align_batched(tgt, src, params, initial=initial)
        traj = accumulate_scan(rel)
        return traj.camera_to_world.rotation, traj.camera_to_world.translation

    def make_step(with_bilateral):
        def step(_, carry):
            acc = carry
            init = Transform.identity((b,))
            init = Transform(init.rotation, init.translation + 1e-12 * acc)
            rot, trans = pipeline(colors, depths, init, with_bilateral)
            return acc + jnp.sum(trans[-1])

        return step

    # lo>=3: XLA fully unrolls trip<=2 fori loops and its optimizer can
    # take minutes on the flattened 3-level align body (see bench.py note).
    ms = marginal_ms(make_step(False), jnp.float32(0.0), lo=3, hi=6, calls=3)
    ms_per_frame = ms / b
    log(
        f"[{label}] odometry e2e: {ms:.2f} ms per {b}-pair step "
        f"({ms_per_frame:.3f} ms/frame, {1000.0 / ms_per_frame:.0f} frames/s/chip)"
    )
    ms_b = marginal_ms(make_step(True), jnp.float32(0.0), lo=3, hi=6, calls=3)
    ms_b_frame = ms_b / b
    log(
        f"[{label}] odometry e2e + bilateral (gd={gd_static}): {ms_b:.2f} ms per "
        f"{b}-pair step ({ms_b_frame:.3f} ms/frame, "
        f"{1000.0 / ms_b_frame:.0f} frames/s/chip)"
    )
    return ms_per_frame, ms_b_frame


def main() -> int:
    setup_jax()
    import numpy as np

    from align3d_tpu import config
    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.params import MsIcpParams

    engine = sys.argv[1] if len(sys.argv) > 1 else "pallas_v4"
    params = (
        MsIcpParams.default()
        if engine == "xla"
        else MsIcpParams.default_tpu(engine)
    )
    log(f"engine: {engine}; 3-level pyramid, iters 20/20/30")

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
    ms_syn, _ = run_series(
        f"synthetic {NFRAMES - 1} pairs", colors, depths, intr, 0.001, params
    )

    ms_frame = ms_syn
    if config.has_ref_data():
        rc, rd, rintr, rscale = _real_frames()
        ms_frame, _ = run_series(
            "real 64 pairs", rc, rd, rintr, rscale, params
        )
    else:
        log("reference fixtures unavailable; headline falls back to synthetic")

    emit("odometry_e2e_640x480_ms_per_frame", ms_frame, "ms", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
