"""Probe alternative bilateral slice implementations at the real-series
batch-64 regime (the stage the r5 split showed dominates the in-pipeline
bilateral cost: 1.44 ms/frame at union gd on v5e).

Variants:
  A  current _slice_fused (Pallas row-group kernel)
  B  pure-XLA _slice, lax.map-chunked over the batch (bounds the fused
     (G,width,w,gd) intermediate that spilled to HBM at batch 64 in r4)
  C  Pallas kernel with a sublane take_along_axis z-gather per row
     (2 gathers/row instead of a dense (gdp,w) one-hot reduce)

Usage: python tools/probe_slice.py [gd] (TPU).
"""

import sys


sys.path.insert(0, ".")

from benches._harness import log, marginal_ms, setup_jax  # noqa: E402


def main() -> int:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from align3d_tpu import config
    from align3d_tpu.io.datasets.slamtb import SlamTbDataset
    from align3d_tpu.ops.bilateral import (
        BilateralFilter,
        _blur,
        _slice,
        _splat,
    )

    gd = int(sys.argv[1]) if len(sys.argv) > 1 else 80

    ds = SlamTbDataset.load(config.ref_data_path("rgbd", "sample1"))
    base = [np.asarray(ds.get(i).image.depth) for i in range(len(ds))]
    frames = base + base[-2::-1]
    frames = frames + base[: 64 - len(frames)]
    depths_np = np.stack(frames)  # 64 frames: divisible by the B chunks
    nfrm = len(depths_np)
    nz = np.where(depths_np > 0, depths_np, np.uint16(65535))
    cmin = jnp.asarray(nz.reshape(nfrm, -1).min(axis=1))
    depths = jnp.asarray(depths_np)

    filt = BilateralFilter()
    grids = jax.vmap(
        lambda d, cm: _splat(d, cm, (111, 147, gd), filt.sigma_space, filt.sigma_color)
    )(depths, cmin)
    grids = jax.vmap(lambda g: _blur(g, jnp.int32(gd)))(grids)
    # normalize inline (cheap) so variants time slice only
    from align3d_tpu.ops.bilateral import _normalize

    grids = jax.block_until_ready(jax.vmap(_normalize)(grids))
    log(f"grids: {grids.shape} ({grids.nbytes / 1e6:.0f} MB), gd={gd}")

    def timeit(name, fn):
        def step(_, carry):
            acc, gr = carry
            out = fn(gr + acc * 0)
            return (acc + jnp.sum(out[0, 0, :1].astype(jnp.float32)) * 1e-12, gr)

        ms = marginal_ms(step, (jnp.float32(0.0), grids), lo=3, hi=6, calls=3) / nfrm
        log(f"{name}: {ms:.3f} ms/frame")
        return ms

    sl_args = (filt.sigma_space, filt.sigma_color)

    from align3d_tpu.ops.bilateral import _slice_fused_batched

    timeit(
        "A fused lane-gather kernel (batched)",
        lambda gr: _slice_fused_batched(gr, depths, cmin, *sl_args),
    )

    for chunk in (4, 8, 16):
        def xla_chunked(gr, chunk=chunk):
            def one(args):
                g, d, cm = args
                return jax.vmap(lambda g_, d_, c_: _slice(g_, d_, c_, *sl_args))(
                    g, d, cm
                )

            gs = gr.reshape(nfrm // chunk, chunk, *gr.shape[1:])
            dd = depths.reshape(nfrm // chunk, chunk, *depths.shape[1:])
            cs = cmin.reshape(nfrm // chunk, chunk)
            out = jax.lax.map(one, (gs, dd, cs))
            return out.reshape(nfrm, *out.shape[2:])

        if nfrm % chunk == 0:
            timeit(f"B xla lax.map chunk={chunk}", xla_chunked)
        else:
            log(f"B chunk={chunk} skipped ({nfrm} % {chunk} != 0)")

    return 0


if __name__ == "__main__":
    sys.exit(main())
