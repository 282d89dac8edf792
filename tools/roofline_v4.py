"""Roofline / speed-of-light accounting for the v4 ICP kernel.

Answers VERDICT r4 "next #3": what fraction of this chip's attainable rate
does the 0.55 ms/pair headline kernel actually run at? Three measurements,
all on the real chip via the same slope-timing harness as the benches:

1. **Micro peaks** — attainable rates measured with dedicated kernels:
   VPU f32 FMA throughput (Pallas, VMEM-resident), dynamic lane-gather
   (``take_along_axis`` along 128 lanes, the association primitive), MXU
   bf16 matmul, and HBM stream bandwidth. These are the "speed of light"
   for each op class on THIS chip (tunnel and all), not datasheet numbers.

2. **Section costs** — the headline batch-64 real-pair workload run with
   the kernel's ``ablate`` profiling hook (icp_pallas_v4.py): "dma" (band
   DMA + ray math), "assoc" (+ banded association), "no_gather" (full minus
   the lane gathers), "no_reduce" (full minus the bf16 stack + MXU
   contraction), and the full kernel.

3. **Accounting** — counted essential ops per section divided by the
   measured micro peak gives each section's own speed-of-light time; the
   ratio of their sum to the measured full-kernel time is the headline
   fraction-of-light figure reported in BENCHMARKS.md.

Run: ``python tools/roofline_v4.py`` (TPU). Diagnostics to stderr, one
JSON summary line to stdout.
"""

import functools
import json
import sys

sys.path.insert(0, ".")

from benches._harness import log, marginal_ms, setup_jax  # noqa: E402

H, W = 480, 640
BATCH = 64
CHUNK = 16
NCH = 5


def vpu_fma_peak():
    """Measured VPU f32 FMA rate (GFLOP/s): a (S,) grid of steps, each
    running ilp independent chains of u FMAs on a register-resident tile
    (hundreds of steps per call so the slope dwarfs dispatch noise)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rows, u, ilp, steps = 128, 64, 4, 512

    def kern(x_ref, o_ref):
        s = pl.program_id(0)
        x = x_ref[...]
        accs = [x * jnp.float32(1.0 + 1e-7 * i) for i in range(ilp)]
        for _ in range(u):
            accs = [a * jnp.float32(1.0000001) + x for a in accs]
        o = accs[0]
        for a in accs[1:]:
            o = o + a

        @pl.when(s == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += o

    run = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[pl.BlockSpec((rows, 128), lambda s: (0, 0))],
        out_specs=pl.BlockSpec((rows, 128), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
    )

    def step(_, carry):
        return run(carry) * jnp.float32(1e-6)

    x0 = jnp.ones((rows, 128), jnp.float32)
    ms = marginal_ms(step, x0, lo=2, hi=10, calls=3)
    flops = rows * 128 * u * ilp * 2 * steps
    gflops = flops / (ms * 1e-3) / 1e9
    log(f"VPU f32 FMA peak: {gflops:.0f} GFLOP/s ({ms * 1e3:.1f} us/step)")
    return gflops


def lane_gather_peak():
    """Measured take_along_axis throughput on the association's exact
    shape ((NCH*CHUNK, 128) i32, per-lane dynamic index): us per take.
    ilp independent chains with DISTINCT index arrays (identical indices
    let the compiler merge chains), hundreds of grid steps per call."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    rows, u, ilp, steps = NCH * CHUNK, 16, 4, 512

    def kern(x_ref, idx_ref, o_ref):
        s = pl.program_id(0)
        x = x_ref[...]
        idxs = [idx_ref[i] for i in range(ilp)]
        accs = [x + jnp.int32(i) for i in range(ilp)]
        for _ in range(u):
            accs = [
                jnp.take_along_axis(a + x, idxs[i], axis=1)
                for i, a in enumerate(accs)
            ]
        acc = accs[0]
        for a in accs[1:]:
            acc = acc + a

        @pl.when(s == 0)
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

        o_ref[...] += acc

    run = pl.pallas_call(
        kern,
        grid=(steps,),
        in_specs=[
            pl.BlockSpec((rows, 128), lambda s: (0, 0)),
            pl.BlockSpec((ilp, rows, 128), lambda s: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rows, 128), lambda s: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
    )
    import numpy as np

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, 128, size=(ilp, rows, 128)), jnp.int32)

    def step(_, carry):
        return run(carry, idx) + jnp.int32(1)

    x0 = jnp.zeros((rows, 128), jnp.int32)
    ms = marginal_ms(step, x0, lo=2, hi=10, calls=3)
    per_take_us = ms * 1e3 / (u * ilp * steps)
    log(
        f"lane-gather peak: {per_take_us:.4f} us per ({rows},128) take "
        f"({rows * 128 / per_take_us / 1e3:.0f} M elt/s)"
    )
    return per_take_us


def mxu_peak():
    """Measured bf16 matmul rate (TFLOP/s) via a 4096^3 XLA matmul."""
    import jax
    import jax.numpy as jnp

    n = 4096
    a = jnp.ones((n, n), jnp.bfloat16)

    def step(_, carry):
        return (
            jnp.dot(carry, a, preferred_element_type=jnp.float32)
            .astype(jnp.bfloat16)
            * jnp.bfloat16(1e-3)
        )

    ms = marginal_ms(step, a, lo=2, hi=12, calls=3)
    tflops = 2 * n**3 / (ms * 1e-3) / 1e12
    log(f"MXU bf16 peak: {tflops:.0f} TFLOP/s ({ms:.2f} ms per {n}^3 matmul)")
    return tflops


def hbm_peak():
    """Measured HBM stream bandwidth (GB/s): read+write of 512 MB f32."""
    import jax
    import jax.numpy as jnp

    n = 128 * 1024 * 1024  # 512 MB
    x0 = jnp.ones((n,), jnp.float32)

    def step(_, carry):
        return carry * jnp.float32(1.0000001)

    ms = marginal_ms(step, x0, lo=2, hi=12, calls=3)
    gbs = 2 * 4 * n / (ms * 1e-3) / 1e9
    log(f"HBM stream: {gbs:.0f} GB/s (r+w of 512 MB in {ms:.2f} ms)")
    return gbs


def kernel_sections():
    """Headline batch-64 real-pair kernel step, per ablate mode (ms/step)."""
    import jax
    import jax.numpy as jnp

    import bench as headline
    from align3d_tpu.icp.params import IcpParams
    from align3d_tpu.icp.image_icp import prepack_v4_batched
    from align3d_tpu.ops import icp_pallas_v3 as k3
    from align3d_tpu.ops import icp_pallas_v4 as k4

    pairs = headline._real_pairs(BATCH)
    intr = pairs[0][0].intrinsics
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
    sp, tp, cent, _, _ = jax.block_until_ready(
        jax.jit(functools.partial(prepack_v4_batched, intrinsics=intr))(*bargs)
    )
    params = IcpParams(engine="pallas_v4")
    pt = (
        params.max_distance,
        params.max_normal_angle,
        params.max_color_distance,
        params.band_radius,
        0.0,
    )
    rot0 = jnp.broadcast_to(jnp.eye(3)[None], (BATCH, 3, 3))
    tr0 = jnp.zeros((BATCH, 3))
    hp = sp.shape[1] * CHUNK
    cb, dyb, dxb = jax.block_until_ready(
        k3.predict_bases_centroid_batched(rot0, tr0, cent, intr, hp)
    )

    out = {}
    for mode in ("dma", "assoc", "no_gather", "no_reduce", ""):
        # sp/tp ride the carry: closed-over device arrays embed as HLO
        # constants and ~700 MB of packs overflows the remote-compile
        # request (HTTP 413).
        def step(_, carry, mode=mode):
            acc, tr, sp_c, tp_c = carry
            geo, col = k4.icp_step_pallas_batched(
                rot0, tr, cb, dyb, dxb, sp_c, tp_c, intr, H, W, pt,
                ablate=mode,
            )
            acc = acc + geo[0, 0, 0] + col[0, 0, 0]
            return (acc, tr0 + 1e-12 * acc, sp_c, tp_c)

        ms = marginal_ms(
            step, (jnp.float32(0.0), tr0, sp, tp), lo=3, hi=11, calls=3
        )
        name = mode or "full"
        out[name] = ms
        log(f"kernel [{name:9s}]: {ms:.3f} ms / batch-{BATCH} step "
            f"({ms * 1e3 / BATCH:.2f} us/pair)")
    return out


def main() -> int:
    setup_jax()
    vpu = vpu_fma_peak()
    take_us = lane_gather_peak()
    mxu = mxu_peak()
    hbm = hbm_peak()
    if "--micros-only" in sys.argv:
        print(json.dumps({
            "vpu_gflops": round(vpu, 1),
            "take80x128_us": round(take_us, 4),
            "mxu_tflops": round(mxu, 1),
            "hbm_gbs": round(hbm, 1),
        }))
        return 0
    sec = kernel_sections()

    full = sec["full"]
    dma = sec["dma"]
    assoc = sec["assoc"] - sec["dma"]
    gather = sec["full"] - sec["no_gather"]
    reduce_ = sec["full"] - sec["no_reduce"]
    dense = sec["no_reduce"] - sec["assoc"]
    log(
        f"sections (ms/step): dma+rays {dma:.3f}, association {assoc:.3f} "
        f"(of which lane gathers ~{gather:.3f}), decode+dense {dense:.3f}, "
        f"stack+MXU reduce {reduce_:.3f}, full {full:.3f}"
    )

    # Essential-op accounting at the headline config: per pair-iteration,
    # nchunks=30 grid steps; association = g(5) x dg(2) x (2R+1=3) takes of
    # (80,128) per step. 900 takes/pair vs the measured per-take peak.
    takes_per_pair = 30 * 5 * 2 * 3
    assoc_light_ms = takes_per_pair * take_us / 1e3 * BATCH
    log(
        f"association light-speed bound (gathers alone): "
        f"{assoc_light_ms:.3f} ms/step vs measured assoc {assoc:.3f}"
    )

    print(
        json.dumps(
            {
                "vpu_gflops": round(vpu, 1),
                "take80x128_us": round(take_us, 4),
                "mxu_tflops": round(mxu, 1),
                "hbm_gbs": round(hbm, 1),
                "sections_ms": {k: round(v, 4) for k, v in sec.items()},
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
