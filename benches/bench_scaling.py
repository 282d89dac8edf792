"""Scaling efficiency of DP odometry over a device mesh (weak scaling).

BASELINE north-star gate: >=80% scaling efficiency at 2 hosts. Real
multi-chip hardware is not available in this image, so this bench measures
the same sharded program on a virtual CPU mesh: a fixed per-device pair
batch, run on 1 device and on N devices (N x the total work). Efficiency =
t(1) / t(N) — perfect weak scaling keeps step time flat because DP pair
alignment compiles to ZERO collectives until the final tiny pose scan.

Caveat printed with the result: the virtual mesh multiplexes onto the
host's physical cores, so on a machine with fewer cores than devices the
efficiency is bounded by core oversubscription, not by the program; the
number to gate on hardware is produced by this same script on a real mesh.

Usage: python benches/bench_scaling.py [N_devices] [per_device_pairs]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8
PER_DEV = int(sys.argv[2]) if len(sys.argv) > 2 else 2
H, W = 120, 160


def main() -> int:
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={N_DEV}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    import json
    import time

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.icp.params import MsIcpParams
    from align3d_tpu.parallel import batch as pbatch

    def log(*a):
        print(*a, file=sys.stderr, flush=True)

    log(f"devices: {jax.device_count()} virtual CPU, {os.cpu_count()} physical cores")

    intr = CameraIntrinsics(
        fx=130.0, fy=130.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H
    )
    params = MsIcpParams.default()

    def make_pairs(n_pairs, seed):
        rng = np.random.default_rng(seed)
        ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
        tex = rng.uniform(30, 220, size=(H, W + n_pairs + 1, 3)).astype(np.uint8)
        colors = np.stack([tex[:, i : i + W] for i in range(n_pairs + 1)])
        depths = np.stack(
            [
                (2000 + 4 * (xs + i) + 2 * ys + rng.integers(0, 8, size=(H, W)))
                .astype(np.uint16)
                for i in range(n_pairs + 1)
            ]
        )
        return colors, depths

    def timed(n_devices):
        mesh = pbatch.make_mesh(n_devices)
        npairs = PER_DEV * n_devices
        colors, depths = make_pairs(npairs, seed=n_devices)
        sc = jnp.asarray(colors[1:])
        sd = jnp.asarray(depths[1:])
        tc = jnp.asarray(colors[:-1])
        td = jnp.asarray(depths[:-1])

        def step(sc, sd, tc, td):
            src = pbatch.build_pyramids_batched(intr, 0.001, sc, sd)
            tgt = pbatch.build_pyramids_batched(intr, 0.001, tc, td)
            rel = pbatch.multiscale_align_batched(tgt, src, params)
            return rel.rotation, rel.translation

        sharded = NamedSharding(mesh, P(pbatch.BATCH_AXIS))
        repl = NamedSharding(mesh, P())
        f = jax.jit(step, in_shardings=(sharded,) * 4, out_shardings=(repl, repl))
        args = jax.device_put((sc, sd, tc, td), sharded)
        jax.block_until_ready(f(*args))  # compile
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            jax.block_until_ready(f(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    t1 = timed(1)
    tn = timed(N_DEV)
    eff = t1 / tn
    log(
        f"weak scaling: {PER_DEV} pairs/device; t(1)={t1 * 1e3:.1f} ms "
        f"t({N_DEV})={tn * 1e3:.1f} ms efficiency={eff * 100:.1f}%"
    )
    print(
        json.dumps(
            {
                "metric": f"dp_odometry_weak_scaling_eff_{N_DEV}dev",
                "value": round(eff, 4),
                "unit": "fraction",
                "vs_baseline": None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
