"""Time pack_source/pack_target with chained reps (run on the real TPU)."""
import functools
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from align3d_tpu.camera import CameraIntrinsics
    from align3d_tpu.ops import icp_pallas_v3 as k3
    from align3d_tpu.range_image import build_pyramid_impl

    H, W, B = 480, 640, 8
    rng = np.random.default_rng(0)
    intr = CameraIntrinsics(fx=525.0, fy=525.0, cx=W / 2 - 0.5, cy=H / 2 - 0.5, width=W, height=H)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    d0 = (2000 + 2 * xs + ys + rng.integers(0, 8, size=(H, W))).astype(np.uint16)
    tex = rng.uniform(30, 220, size=(H, W, 3)).astype(np.uint8)
    t = build_pyramid_impl(True, True, 1, 1.0, intr, 0.001, jnp.asarray(tex), jnp.asarray(d0))[0]

    def tile(a):
        return jnp.broadcast_to(a[None], (B,) + a.shape)

    pts, nrm, msk, imap, inten = (
        tile(t.points), tile(t.normals), tile(t.mask), tile(t.intensity_map),
        tile(t.intensities),
    )

    @functools.partial(jax.jit, static_argnames=("reps", "which"))
    def chain(pts, nrm, msk, imap, inten, reps, which):
        def body(_, acc):
            if which == "target":
                tp = jax.vmap(k3.pack_target)(pts + acc * 1e-30, nrm, msk, imap)
                return acc + tp[0, 0, 0, 0, 0]
            sp = jax.vmap(k3.pack_source)(pts + acc * 1e-30, msk, inten)
            return acc + sp[0, 0, 0, 0]

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))[None]

    for which in ("target", "source"):
        lo, hi = 1, 9
        f = lambda r: float(chain(pts, nrm, msk, imap, inten, r, which)[0])
        t0 = time.perf_counter(); f(lo); log(f"{which} compile(lo) {time.perf_counter()-t0:.1f}s")
        t0 = time.perf_counter(); f(hi); log(f"{which} compile(hi) {time.perf_counter()-t0:.1f}s")

        def best(r, calls=4):
            b = 1e9
            for _ in range(calls):
                t0 = time.perf_counter(); f(r); b = min(b, time.perf_counter() - t0)
            return b

        us = (best(hi) - best(lo)) / ((hi - lo) * B) * 1e6
        log(f"pack_{which}: {us:.1f} us/pair  ({us/10:.2f} us/pair-iter over 10 iters)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
