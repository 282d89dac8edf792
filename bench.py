"""Headline benchmark: projective ICP throughput on one chip.

Mirrors the reference's ``benches/bench_image_icp.rs`` workload — one
640x480 RGB-D pair, 10 GN iterations — on the fused banded-gather Pallas
v4 engine (align3d_tpu/ops/icp_pallas_v4.py). Baseline: 38.576 ms/pair on the
reference's i7-11800H (README.md:128-134, BASELINE.md).

The headline number is produced at the BASELINE config-3 spec: batch 64 of
DISTINCT real RGB-D pairs from the reference's own committed fixtures
(sample1/sample2, forward and reversed adjacent pairs). A synthetic
batch-8 run is reported as a secondary line for cross-round comparability.

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


def _real_pairs(batch):
    """(sources, targets) lists of RangeImages: distinct real fixture pairs."""
    from align3d_tpu import config
    from align3d_tpu.io.datasets.slamtb import SlamTbDataset
    from align3d_tpu.range_image import build_pyramid_impl

    import jax.numpy as jnp

    frames = []
    for name in ("sample1", "sample2"):
        ds = SlamTbDataset.load(config.ref_data_path("rgbd", name))
        for i in range(len(ds)):
            frames.append(ds.get(i))

    def ri(frame):
        return build_pyramid_impl(
            True, True, 1, 1.0, frame.camera,
            float(frame.image.depth_scale),
            jnp.asarray(frame.image.color), jnp.asarray(frame.image.depth),
        )[0]

    images = [ri(f) for f in frames]
    pairs = []
    for i in range(len(images) - 1):
        pairs.append((images[i + 1], images[i]))  # forward: source=i+1
    for i in range(len(images) - 1):
        pairs.append((images[i], images[i + 1]))  # reversed
    if len(pairs) < batch:
        raise RuntimeError(f"only {len(pairs)} distinct pairs available")
    return pairs[:batch]


def _synthetic_pair():
    import jax.numpy as jnp

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.range_image import build_pyramid_impl

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
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, 1 : W + 1]),
        jnp.asarray(depth1),
    )[0]
    return source, target


def _run(pairs, intrinsics, label):
    """Slope-timed batched v4 align over a list of (source, target) pairs."""
    import functools

    import jax
    import jax.numpy as jnp

    from align3d_tpu.icp.image_icp import (
        align_impl_pallas_v4_batched_packed,
        prepack_v4_batched,
    )
    from align3d_tpu.icp.params import IcpParams

    params = IcpParams(max_iterations=ITERS, engine="pallas_v4")
    batch = len(pairs)
    n = H * W

    def stackf(get):
        return jnp.stack([get(s, t) for s, t in pairs])

    bargs = (
        stackf(lambda s, t: s.points.reshape(n, 3)),
        stackf(lambda s, t: s.mask.reshape(n)),
        stackf(lambda s, t: s.intensities.reshape(n)),
        stackf(lambda s, t: t.points.reshape(n, 3)),
        stackf(lambda s, t: t.mask.reshape(n)),
        stackf(lambda s, t: t.normals.reshape(n, 3)),
        stackf(lambda s, t: t.intensity_map),
    )
    rot0 = jnp.broadcast_to(jnp.eye(3)[None], (batch, 3, 3))
    tr0 = jnp.zeros((batch, 3))

    # Transform-independent packing happens ONCE, outside the timed region —
    # mirroring the reference bench, which prebuilds both RangeImages and
    # constructs ImageIcp::new(target) outside criterion's loop. Block here
    # so the "compile" lines below time compiles, not queued data staging.
    t0 = time.perf_counter()
    sp, tp, cent, _, _ = jax.block_until_ready(
        jax.jit(functools.partial(prepack_v4_batched, intrinsics=intrinsics))(
            *bargs
        )
    )
    log(f"[{label}] data staging + prepack: {time.perf_counter() - t0:.2f}s")

    @functools.partial(jax.jit, static_argnames=("reps",))
    def bench_fn(rot, tr, sp, tp, cent, reps):
        def body(_, carry):
            r, t, acc = carry
            # acc feeds the next rep's initial translation: every rep is
            # strictly serialized and none can be CSE'd away.
            br, bt, bres = align_impl_pallas_v4_batched_packed(
                r, t + 1e-12 * acc, sp, tp, cent, intrinsics, H, W, params
            )
            return (r, t, acc + jnp.sum(bres))

        r, t, acc = jax.lax.fori_loop(0, reps, body, (rot, tr, jnp.float32(0)))
        return acc

    # LO=3, not 1: XLA fully unrolls a trip-count<=2 fori and the optimizer
    # takes minutes on the flattened align body (measured 73 s at trip 1, 30 s
    # at trip 2, ~2 s with the loop kept rolled). The slope math only needs
    # HI-LO. lower/compile/first-run are timed separately so compile time is
    # never conflated with dispatch, execution, or tunnel queueing.
    LO, HI = 3, 11
    compiled = {}
    for reps in (LO, HI):
        t0 = time.perf_counter()
        lowered = bench_fn.lower(rot0, tr0, sp, tp, cent, reps=reps)
        t1 = time.perf_counter()
        compiled[reps] = lowered.compile()
        t2 = time.perf_counter()
        _ = float(compiled[reps](rot0, tr0, sp, tp, cent))
        t3 = time.perf_counter()
        log(
            f"[{label}] {reps}-rep program: lower {t1 - t0:.2f}s, "
            f"compile {t2 - t1:.2f}s, first run {t3 - t2:.2f}s"
        )

    def best_of(reps, calls=4):
        best = 1e9
        for _ in range(calls):
            t0 = time.perf_counter()
            _ = float(compiled[reps](rot0, tr0, sp, tp, cent))
            best = min(best, time.perf_counter() - t0)
        return best

    # Slope between rep counts cancels the tunnel's fixed ~30 ms dispatch
    # RPC latency (block_until_ready does not cover it).
    t_lo = best_of(LO)
    t_hi = best_of(HI)
    ms_per_pair = (t_hi - t_lo) / ((HI - LO) * batch) * 1000.0
    log(
        f"[{label}] slope over {(HI - LO) * batch} pair-aligns x {ITERS} "
        f"iters: {ms_per_pair:.3f} ms/pair ({1000.0 / ms_per_pair:.1f} pairs/s)"
    )
    return ms_per_pair


def main() -> int:
    import jax

    # Persist compiled programs so repeat bench runs start fast. Cold
    # compile of the v4 kernel + 10-iteration align loop is ~1 s (lower)
    # + ~2 s (compile) at batch 64, measured with a fresh program hash
    # (tools/probe_compile.py --fuzz). Caveat: the FIRST pallas-kernel
    # execution of a fresh process pays a one-time cold-start through the
    # axon remote-compile tunnel that has nothing to do with the program
    # (r2: 742 s, r3: 246 s, measured 43 s this round — it lands on the
    # first executed program and every later program is unaffected). The
    # synthetic batch-8 run therefore goes FIRST so that one-time cost
    # lands on its logged "first run" line; the headline batch-64 lines
    # then reflect the program's true lower/compile/run cost.
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    from align3d_tpu import config

    s, t = _synthetic_pair()
    pairs8 = [(s, t)] * 8
    ms_syn = _run(pairs8, s.intrinsics, "synthetic batch 8")

    ms_headline = None
    if config.has_ref_data():
        pairs = _real_pairs(64)
        intr = pairs[0][0].intrinsics
        ms_headline = _run(pairs, intr, "real batch 64")
    else:
        log("reference fixtures unavailable; headline falls back to synthetic")

    ms = ms_headline if ms_headline is not None else ms_syn
    print(
        json.dumps(
            {
                "metric": "image_icp_640x480_ms_per_pair",
                "value": round(ms, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
