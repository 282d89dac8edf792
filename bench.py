"""Headline benchmark: batched projective ICP throughput on one chip.

Mirrors the reference's ``benches/bench_image_icp.rs`` workload — one
640x480 RGB-D pair, 10 GN iterations — but batched (64 pairs per program)
the way the TPU is meant to be fed. Baseline: 38.576 ms/pair on the
reference's i7-11800H (README.md:128-134, BASELINE.md).

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
BATCH = 64
ITERS = 10
H, W = 480, 640


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def main() -> int:
    import jax
    import jax.numpy as jnp

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.image_icp import align_impl
    from align3d_tpu.icp.params import IcpParams
    from align3d_tpu.range_image import build_pyramid_impl

    dev = jax.devices()[0]
    log(f"device: {dev} ({dev.platform})")

    # Synthetic textured slanted-plane pair (no dataset dependency).
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(
        fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    depth0 = (2000 + 2 * xs + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    depth1 = (2000 + 2 * (xs + 1) + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    tex = rng.uniform(30, 220, size=(H, W + 8, 3)).astype(np.uint8)

    target = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, :W]), jnp.asarray(depth0)
    )[0]
    source = build_pyramid_impl(
        True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex[:, 1 : W + 1]), jnp.asarray(depth1)
    )[0]

    n = H * W
    params = IcpParams(max_iterations=ITERS)

    def tile(a):
        return jnp.broadcast_to(a[None], (BATCH,) + a.shape)

    sp = tile(source.points.reshape(n, 3))
    sm = tile(source.mask.reshape(n))
    si = tile(source.intensities.reshape(n))
    tp = tile(target.points.reshape(n, 3))
    tm = tile(target.mask.reshape(n))
    tn = tile(target.normals.reshape(n, 3))
    tim = tile(target.intensity_map)
    rot0 = tile(jnp.eye(3))
    tr0 = tile(jnp.zeros(3))

    vmapped = jax.vmap(
        lambda r, t, a, b, c, d, e, f, g: align_impl(
            r, t, a, b, c, d, e, f, g, intr, params
        )
    )

    # The serving tunnel adds ~30 ms of fixed RPC latency per dispatch and
    # block_until_ready does not block on it — so repetitions run INSIDE one
    # jitted program (chained through the pose carry so no iteration can be
    # CSE'd away) and completion is forced by pulling a scalar.
    REPS = 4

    @jax.jit
    def bench_fn(rot, tr):
        def body(_, carry):
            r, t, acc = carry
            br, bt, bres = vmapped(r, t, sp, sm, si, tp, tm, tn, tim)
            return (br, bt, acc + jnp.sum(bres))
        r, t, acc = jax.lax.fori_loop(0, REPS, body, (rot, tr, jnp.float32(0)))
        return acc + jnp.sum(r[..., 0, 0]) + jnp.sum(t)

    t0 = time.perf_counter()
    _ = float(bench_fn(rot0, tr0))
    log(f"compile+first run: {time.perf_counter() - t0:.2f}s")

    # Fixed dispatch overhead estimate (trivial program round-trip).
    trivial = jax.jit(lambda x: x + 1.0)
    _ = float(trivial(jnp.float32(0)))
    t0 = time.perf_counter()
    n_trivial = 5
    for i in range(n_trivial):
        _ = float(trivial(jnp.float32(i)))
    rpc_overhead = (time.perf_counter() - t0) / n_trivial
    log(f"dispatch overhead: {rpc_overhead * 1000:.1f} ms")

    calls = 3
    t0 = time.perf_counter()
    for i in range(calls):
        _ = float(bench_fn(rot0, tr0))
    total = time.perf_counter() - t0
    compute = max(total - calls * rpc_overhead, 1e-9)

    ms_per_pair = compute / (calls * REPS * BATCH) * 1000.0
    log(
        f"{calls} calls x {REPS} reps x {BATCH} pairs x {ITERS} iters: {total:.3f}s "
        f"(compute {compute:.3f}s) -> {ms_per_pair:.3f} ms/pair "
        f"({1000.0 / ms_per_pair:.1f} pairs/s)"
    )

    print(
        json.dumps(
            {
                "metric": "image_icp_640x480_ms_per_pair",
                "value": round(ms_per_pair, 4),
                "unit": "ms",
                "vs_baseline": round(BASELINE_MS / ms_per_pair, 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
