"""Fused projective-ICP Gauss-Newton step as a Pallas TPU kernel.

Why this exists: the ICP inner loop is gather-bound. XLA's HBM gather runs at
~4 ns/row regardless of batching (measured on v5e), capping a 640x480 GN
iteration at ~2.3 ms even with the two-packed-table layout
(align3d_tpu/ops/target_pack.py). This kernel keeps the gather ON-CHIP:

* The target is packed once per align into channel-in-sublane tiles
  ``(H, G, 16, 128)`` (G = ceil(W/128) lane groups, 16 channels: z, normal,
  the 3x3 intensity-tap neighborhood of each pixel, valid flag) living in
  HBM.
* The source image is processed in chunks of 8 rows (one grid step each).
  Each step DMAs a band of target rows around the chunk's expected
  projection (scalar-prefetched per-chunk row base) into VMEM.
* Projective association becomes a *banded* gather: for every source pixel
  the projected target pixel is found among a small set of candidate
  (row, lane-group) tiles — candidate tiles are stacked and resolved with a
  single wide ``take_along_axis`` lane-gather (the one gather primitive
  Mosaic lowers natively) plus per-candidate selects.
* Residuals, gates-as-weights and Jacobians are formed densely in VMEM and
  reduced straight to the two augmented 8x8 normal-equation blocks
  ``sum w * [J r 1]^T [J r 1]`` on the MXU — the kernel's only output, so
  HBM traffic per iteration is the band DMAs plus 128 floats.

Association is displacement-banded: a pixel whose true correspondence lies
further than ``DY_RADIUS`` rows from its chunk's per-group predicted row (or
beyond the adjacent lane group) is dropped (weight 0). The per-group row
predictions are recomputed every iteration from the current transform with
dense XLA math, so the band follows the alignment as it converges; the
coarse pyramid levels (which handle large motion) use the exact XLA path.

Semantics replicated from the reference (src/icp/image_icp.rs:95-149 via the
XLA implementation in align3d_tpu/icp/image_icp.py): nearest-pixel lookup at
trunc(u+0.5), distance and normal-angle gates (NaN angle passes), bilinear
intensity + numeric gradient with the exact (u + 0.005) re-truncation
(src/intensity_map.rs:150-210), and the w-once accumulation H = sum w J J^T.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.ops.intensity import BORDER, GRAD_H, GRAD_H_INV

Array = jax.Array

CHUNK = 8  # source rows per grid step
HALO = 8  # extra target rows DMA'd on each side of the chunk
BAND = CHUNK + 2 * HALO
DY_RADIUS = 2  # candidate rows each side of the per-group predicted row
N_DY = 2 * DY_RADIUS + 1
N_GX = 3  # candidate lane groups: predicted group and both neighbors
N_CAND = N_DY * N_GX
NCH = 16  # packed channels (sublanes) per target tile

# Channel indices in the packed target tile.
CH_Z, CH_NX, CH_NY, CH_NZ = 0, 1, 2, 3
CH_TAP0 = 4  # 9 taps: (dv, du) row-major over {-1, 0, 1}^2, relative to
# the pixel itself (tap index 4 == the pixel's own intensity)
CH_VALID = 13


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def pack_target(
    points: Array,  # (H, W, 3) f32
    normals: Array,  # (H, W, 3)
    mask: Array,  # (H, W) bool
    intensity_map: Array,  # (H+2, W+2) f32 (bordered, ops.intensity)
) -> Array:
    """Target -> (Hp, G, 16, 128) channel-in-sublane tiles (Hp = H rounded up
    to CHUNK, G = ceil(W/128)); padding pixels are invalid (z = 0)."""
    h, w = mask.shape
    g = _ceil_div(w, 128)
    hp = _ceil_div(h, CHUNK) * CHUNK

    # 3x3 tap planes around each pixel: tap(dv, du)[v, u] = I[v+dv, u+du]
    # with I the bordered map (negative indices clamp — those taps are never
    # used by the math, see taps note in ops/target_pack.py).
    m_ext = jnp.pad(intensity_map, ((1, 0), (1, 0)), mode="edge")
    taps = [
        m_ext[dv : dv + h, du : du + w]
        for dv in range(3)
        for du in range(3)
    ]

    z = points[..., 2] * mask  # invalid -> exactly 0
    channels = [z, normals[..., 0], normals[..., 1], normals[..., 2]]
    channels += taps
    channels.append(mask.astype(jnp.float32))
    channels += [jnp.zeros((h, w), jnp.float32)] * (NCH - len(channels))

    t = jnp.stack(channels, axis=0)  # (16, H, W)
    t = jnp.pad(t, ((0, 0), (0, hp - h), (0, g * 128 - w)))
    t = t.reshape(NCH, hp, g, 128).transpose(1, 2, 0, 3)  # (Hp, G, 16, 128)
    return t


def pack_source(
    points: Array,  # (H, W, 3)
    mask: Array,  # (H, W)
    intensities: Array,  # (H, W) u8
) -> Array:
    """Source -> (Hp, G, 8, 128): [x, y, z, intensity, valid, 0, 0, 0]."""
    h, w = mask.shape
    g = _ceil_div(w, 128)
    hp = _ceil_div(h, CHUNK) * CHUNK
    channels = [
        points[..., 0],
        points[..., 1],
        points[..., 2],
        intensities.astype(jnp.float32),
        mask.astype(jnp.float32),
        jnp.zeros((h, w), jnp.float32),
        jnp.zeros((h, w), jnp.float32),
        jnp.zeros((h, w), jnp.float32),
    ]
    s = jnp.stack(channels, axis=0)
    s = jnp.pad(s, ((0, 0), (0, hp - h), (0, g * 128 - w)))
    return s.reshape(8, hp, g, 128).transpose(1, 2, 0, 3)


def predict_bases(
    rotation: Array,
    translation: Array,
    source_pack: Array,  # (Hp, G, 8, 128)
    intrinsics: CameraIntrinsics,
    h: int,
) -> tuple[Array, Array]:
    """Per-chunk band starts + per-(chunk, group) predicted row offsets.

    Dense XLA math (no gathers): project every source pixel with the current
    transform, take the masked mean row displacement per (chunk, group).
    Returns (chunk_base (nchunks,) i32, dy_base (nchunks, G) i32).
    """
    hp, g = source_pack.shape[0], source_pack.shape[1]
    nchunks = hp // CHUNK
    sx = source_pack[:, :, 0]
    sy = source_pack[:, :, 1]
    sz = source_pack[:, :, 2]
    sm = source_pack[:, :, 4]
    p = jnp.stack([sx, sy, sz], axis=-1) @ rotation.T + translation
    z = p[..., 2]
    safe_z = jnp.where(z == 0.0, 1e-12, z)
    v = p[..., 1] * jnp.float32(intrinsics.fy) / safe_z + jnp.float32(intrinsics.cy)
    src_row = jnp.arange(hp, dtype=jnp.float32)[:, None, None]
    dy = (jnp.trunc(v + 0.5) - src_row) * sm
    dy = dy.reshape(nchunks, CHUNK, g, 128)
    smc = sm.reshape(nchunks, CHUNK, g, 128)
    cnt = jnp.sum(smc, axis=(1, 3))
    mean_dy = jnp.sum(dy, axis=(1, 3)) / jnp.maximum(cnt, 1.0)  # (nchunks, G)
    dy_base = jnp.round(mean_dy).astype(jnp.int32)
    chunk_mean = jnp.round(
        jnp.sum(dy, axis=(1, 2, 3)) / jnp.maximum(jnp.sum(smc, axis=(1, 2, 3)), 1.0)
    ).astype(jnp.int32)
    chunk0 = jnp.arange(nchunks, dtype=jnp.int32) * CHUNK
    chunk_base = jnp.clip(chunk0 + chunk_mean - HALO, 0, max(hp - BAND, 0))
    return chunk_base, dy_base


def _icp_kernel(
    # scalar prefetch
    cb_ref,  # (nchunks,) i32 band start rows
    dyb_ref,  # (nchunks, G) i32 per-group row-displacement bases
    # inputs
    src_ref,  # (CHUNK, G, 8, 128) VMEM source chunk
    tr_ref,  # (1, 16) SMEM [r00..r22, t0..t2, pad]
    tpack_ref,  # (Hp, G, 16, 128) HBM target tiles
    # outputs
    sys_ref,  # (2, 8, 128) VMEM accumulated [geo, color] augmented systems
    stats_ref,  # (1, 16, 128) per-chunk: rows 0:G sum dy*valid, 8:8+G sum valid
    # scratch
    band,  # (BAND, G, 16, 128) VMEM
    gath,  # (16, CHUNK, G, 128) VMEM gathered target channels
    sem,
    *,
    g: int,
    h: int,
    w: int,
    fx: float,
    fy: float,
    cx: float,
    cy: float,
    max_distance_sqr: float,
    max_normal_angle: float,
    max_color_distance_sqr: float,
):
    i = pl.program_id(0)
    cb = cb_ref[i]

    copy = pltpu.make_async_copy(tpack_ref.at[pl.ds(cb, BAND)], band, sem)
    copy.start()

    f32 = jnp.float32
    src = src_ref[...]
    sx, sy, sz = src[:, :, 0], src[:, :, 1], src[:, :, 2]  # (CHUNK, G, 128)
    s_int = src[:, :, 3]
    s_msk = src[:, :, 4]

    r00, r01, r02 = tr_ref[0, 0], tr_ref[0, 1], tr_ref[0, 2]
    r10, r11, r12 = tr_ref[0, 3], tr_ref[0, 4], tr_ref[0, 5]
    r20, r21, r22 = tr_ref[0, 6], tr_ref[0, 7], tr_ref[0, 8]
    t0, t1, t2 = tr_ref[0, 9], tr_ref[0, 10], tr_ref[0, 11]

    px = r00 * sx + r01 * sy + r02 * sz + t0
    py = r10 * sx + r11 * sy + r12 * sz + t1
    pz = r20 * sx + r21 * sy + r22 * sz + t2

    safe_z = jnp.where(pz == 0.0, f32(1e-12), pz)
    u = px * f32(fx) / safe_z + f32(cx)
    v = py * f32(fy) / safe_z + f32(cy)

    u_int = jnp.trunc(u + 0.5)
    v_int = jnp.trunc(v + 0.5)
    inb = (u_int >= 0) & (u_int < w) & (v_int >= 0) & (v_int < h)
    ui = jnp.clip(u_int, 0, w - 1).astype(jnp.int32)
    vi = jnp.clip(v_int, 0, h - 1).astype(jnp.int32)
    tl = ui & 127  # lane within target group
    tg = ui >> 7  # target lane group

    copy.wait()

    # ---- banded gather ---------------------------------------------------
    # Per source row s: stack every candidate tile (N_CAND per group), one
    # wide lane-gather, then per-candidate row/group-match selects.
    for s in range(CHUNK):
        cands = []
        rows_abs = []  # absolute target row of each candidate (traced i32)
        for j in range(g):
            dyb = dyb_ref[i, j]
            for dy in range(-DY_RADIUS, DY_RADIUS + 1):
                rb_raw = i * CHUNK + s + dyb + dy - cb
                rb = jnp.clip(rb_raw, 0, BAND - 1)
                for dg in (-1, 0, 1):
                    g2 = min(max(j + dg, 0), g - 1)
                    cands.append(band[pl.ds(rb, 1), g2].reshape(NCH, 128))
                    rows_abs.append(cb + rb)
        table = jnp.concatenate(cands, axis=0)  # (g*N_CAND*16, 128)

        tl_s = tl[s]  # (G, 128)
        idx = jnp.broadcast_to(
            tl_s[:, None, :], (g, N_CAND * NCH, 128)
        ).reshape(g * N_CAND * NCH, 128)
        got = jnp.take_along_axis(table, idx, axis=1)

        for j in range(g):
            acc = jnp.zeros((NCH, 128), jnp.float32)
            for k in range(N_CAND):
                ci = j * N_CAND + k
                dg = (-1, 0, 1)[k % N_GX]
                g2 = min(max(j + dg, 0), g - 1)
                match = (vi[s, j] == rows_abs[ci]) & (tg[s, j] == g2)
                acc = jnp.where(
                    match[None, :], got[ci * NCH : (ci + 1) * NCH], acc
                )
            gath[:, s, j, :] = acc

    # ---- dense math (reference image_icp.rs:106-149) ---------------------
    tz = gath[CH_Z]  # (CHUNK, G, 128)
    nx_, ny_, nz_ = gath[CH_NX], gath[CH_NY], gath[CH_NZ]
    tvalid = gath[CH_VALID] > 0.0

    # Target point from its pixel coords + gathered depth (exactly how the
    # target's points were built: backproject_grid).
    uif = ui.astype(f32)
    vif = vi.astype(f32)
    tpx = (uif - f32(cx)) * tz / f32(fx)
    tpy = (vif - f32(cy)) * tz / f32(fy)

    dx_ = tpx - px
    dy_ = tpy - py
    dz_ = tz - pz
    dist_ok = dx_ * dx_ + dy_ * dy_ + dz_ * dz_ <= f32(max_distance_sqr)

    # acos is unavailable in Mosaic; use monotonicity instead:
    # |acos(d)| >= theta  <=>  d <= cos(theta), valid only for d in [-1, 1].
    # Outside that range acos is NaN and the reference's comparison passes
    # the gate — replicated by the explicit d >= -1 term (d can be any value
    # since the reference dots the unnormalized transformed POINT, :119).
    dot_pn = px * nx_ + py * ny_ + pz * nz_
    angle_rejected = (dot_pn <= f32(jnp.cos(max_normal_angle))) & (
        dot_pn >= f32(-1.0)
    )

    valid = (s_msk > 0) & inb & tvalid
    w_geom = (valid & dist_ok & (~angle_rejected)).astype(f32)

    r_geom = dx_ * nx_ + dy_ * ny_ + dz_ * nz_
    # J = [n, p x n]
    jg3 = py * nz_ - pz * ny_
    jg4 = pz * nx_ - px * nz_
    jg5 = px * ny_ - py * nx_

    # ---- photometric -----------------------------------------------------
    u_s = jnp.clip(u, 0.0, f32(w - 1))
    v_s = jnp.clip(v, 0.0, f32(h - 1))
    u0 = jnp.trunc(u_s)
    v0 = jnp.trunc(v_s)
    fu = u_s - u0
    fv = v_s - v0
    # Tap-grid offsets of the bilinear base relative to the nearest pixel:
    # du0 = u0 - ui is in {-1, 0} -> base tap column 1 + du0 in {0, 1}.
    cu = (u0.astype(jnp.int32) - ui + 1).astype(jnp.int32)  # in {0, 1}
    cv = (v0.astype(jnp.int32) - vi + 1).astype(jnp.int32)

    # Two-stage select tree over the 3x3 tap planes: first collapse rows by
    # cv (giving the quad's two rows at each of the 3 columns), then columns
    # by cu — 10 selects instead of 9 per tap lookup.
    cv1 = cv == 1

    def row_sel(c):  # taps at (cv + {0,1}, column c)
        a = jnp.where(cv1, gath[CH_TAP0 + 3 + c], gath[CH_TAP0 + c])
        b = jnp.where(cv1, gath[CH_TAP0 + 6 + c], gath[CH_TAP0 + 3 + c])
        return a, b

    r0c0, r1c0 = row_sel(0)
    r0c1, r1c1 = row_sel(1)
    r0c2, r1c2 = row_sel(2)
    cu1 = cu == 1
    t00 = jnp.where(cu1, r0c1, r0c0)
    t01 = jnp.where(cu1, r0c2, r0c1)
    t10 = jnp.where(cu1, r1c1, r1c0)
    t11 = jnp.where(cu1, r1c2, r1c1)

    def lerp2(a00, a01, a10, a11, fuu, fvv):
        r0 = a00 * (1.0 - fuu) + a01 * fuu
        r1 = a10 * (1.0 - fuu) + a11 * fuu
        return r0 * (1.0 - fvv) + r1 * fvv

    value = lerp2(t00, t01, t10, t11, fu, fv)

    # +H samples: crossing shifts the quad one column (row). Crossing needs
    # fu >= 0.995 >= 0.5, which forces cu == 0 (nearest pixel is u0 + 1), so
    # the crossed quad is always grid columns {1, 2}.
    uh_c = u_s + f32(GRAD_H)
    u0h = jnp.trunc(uh_c)
    cross_u = u0h > u0
    fuh = uh_c - u0h
    tu00 = jnp.where(cross_u, t01, t00)
    tu01 = jnp.where(cross_u, r0c2, t01)
    tu10 = jnp.where(cross_u, t11, t10)
    tu11 = jnp.where(cross_u, r1c2, t11)
    uh = lerp2(tu00, tu01, tu10, tu11, fuh, fv)

    vh_c = v_s + f32(GRAD_H)
    v0h = jnp.trunc(vh_c)
    cross_v = v0h > v0
    fvh = vh_c - v0h
    r2c0 = gath[CH_TAP0 + 6]
    r2c1 = gath[CH_TAP0 + 7]
    r2c2 = gath[CH_TAP0 + 8]
    t20 = jnp.where(cu1, r2c1, r2c0)
    t21 = jnp.where(cu1, r2c2, r2c1)
    tv00 = jnp.where(cross_v, t10, t00)
    tv01 = jnp.where(cross_v, t11, t01)
    tv10 = jnp.where(cross_v, t20, t10)
    tv11 = jnp.where(cross_v, t21, t11)
    vh = lerp2(tv00, tv01, tv10, tv11, fu, fvh)

    du_g = (uh - value) * f32(GRAD_H_INV)
    dv_g = (vh - value) * f32(GRAD_H_INV)

    source_color = s_int * f32(0.003921569)
    r_color = source_color - value
    color_ok = r_color * r_color <= f32(max_color_distance_sqr)
    w_color = w_geom * color_ok.astype(f32)

    zz = safe_z * safe_z
    gx = du_g * f32(fx) / safe_z
    gy = dv_g * f32(fy) / safe_z
    gz = -(du_g * px * f32(fx) + dv_g * py * f32(fy)) / zz
    jc3 = py * gz - pz * gy
    jc4 = pz * gx - px * gz
    jc5 = px * gy - py * gx

    # ---- MXU reduction: aug = sum w [J r 1]^T [J r 1] --------------------
    ones = jnp.ones_like(w_geom)

    def reduce_system(j0, j1, j2, j3, j4, j5, r, wgt):
        a = jnp.stack([j0, j1, j2, j3, j4, j5, r, ones], axis=0)  # (8,C,G,128)
        aw = a * wgt[None]
        a2 = a.reshape(8, CHUNK * g * 128)
        aw2 = aw.reshape(8, CHUNK * g * 128)
        return jax.lax.dot_general(
            aw2,
            a2,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (8, 8)

    geo = reduce_system(nx_, ny_, nz_, jg3, jg4, jg5, r_geom, w_geom)
    col = reduce_system(gx, gy, gz, jc3, jc4, jc5, r_color, w_color)

    @pl.when(i == 0)
    def _():
        sys_ref[...] = jnp.zeros((2, 8, 128), jnp.float32)

    sys_ref[0, :, 0:8] += geo
    sys_ref[1, :, 0:8] += col

    # Row-displacement stats for the NEXT iteration's band prediction:
    # per-lane partial sums over the chunk's rows (host reduces over lanes).
    # Uses the projection validity only (not the distance/angle gates) so the
    # band tracks where correspondences land even before they pass gates.
    proj_ok = (s_msk > 0) & inb
    pw = proj_ok.astype(f32)
    src_row = (i * CHUNK).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, g, 128), 0
    ).astype(jnp.float32)
    dy_val = (v_int - src_row) * pw
    # Unrolled accumulation over the chunk's rows — Mosaic rejects an axis-0
    # reduce of a 3D operand here ("unsupported output implicit dimension").
    dy_acc = dy_val[0]
    pw_acc = pw[0]
    for s in range(1, CHUNK):
        dy_acc = dy_acc + dy_val[s]
        pw_acc = pw_acc + pw[s]
    stats_ref[0, 0:g, :] = dy_acc  # (G, 128)
    stats_ref[0, 8 : 8 + g, :] = pw_acc


def bases_from_stats(
    stats: Array,  # (nchunks, 16, 128) kernel per-lane partials
    prev_dy_base: Array,  # (nchunks, G) i32
    hp: int,
) -> tuple[Array, Array]:
    """Fold kernel stats into next-iteration (chunk_base, dy_base)."""
    g = prev_dy_base.shape[1]
    dy_sum = jnp.sum(stats[:, 0:g], axis=-1)  # (nchunks, G)
    cnt = jnp.sum(stats[:, 8 : 8 + g], axis=-1)
    mean_dy = dy_sum / jnp.maximum(cnt, 1.0)
    dy_base = jnp.where(
        cnt > 0, jnp.round(mean_dy).astype(jnp.int32), prev_dy_base
    )
    chunk_cnt = jnp.sum(cnt, axis=-1)
    chunk_mean = jnp.sum(dy_sum, axis=-1) / jnp.maximum(chunk_cnt, 1.0)
    nchunks = stats.shape[0]
    chunk0 = jnp.arange(nchunks, dtype=jnp.int32) * CHUNK
    chunk_base = jnp.clip(
        chunk0 + jnp.round(chunk_mean).astype(jnp.int32) - HALO,
        0,
        max(hp - BAND, 0),
    )
    return chunk_base, dy_base


@functools.partial(
    jax.jit,
    static_argnames=("intrinsics", "h", "w", "params_tuple", "interpret"),
)
def icp_step_pallas(
    rotation: Array,
    translation: Array,
    chunk_base: Array,  # (nchunks,) i32 band start rows
    dy_base: Array,  # (nchunks, G) i32 row-displacement bases
    source_pack: Array,  # (Hp, G, 8, 128)
    target_pack: Array,  # (Hp, G, 16, 128)
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
    params_tuple: tuple,  # (max_distance, max_normal_angle, max_color_distance)
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """One banded GN accumulation pass.

    Returns (geo_aug, color_aug, stats): the 8x8 augmented systems
    [[H, g], [g^T, sum w r^2]] (count in [7, 7]) and the per-chunk
    displacement stats to feed :func:`bases_from_stats`.
    """
    hp, g = source_pack.shape[0], source_pack.shape[1]
    nchunks = hp // CHUNK
    max_distance, max_normal_angle, max_color_distance = params_tuple

    tr = jnp.concatenate(
        [rotation.reshape(9), translation.reshape(3), jnp.zeros(4, jnp.float32)]
    ).reshape(1, 16)

    kernel = functools.partial(
        _icp_kernel,
        g=g,
        h=h,
        w=w,
        fx=float(intrinsics.fx),
        fy=float(intrinsics.fy),
        cx=float(intrinsics.cx),
        cy=float(intrinsics.cy),
        max_distance_sqr=float(max_distance) ** 2,
        max_normal_angle=float(max_normal_angle),
        max_color_distance_sqr=float(max_color_distance) ** 2,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (CHUNK, g, 8, 128),
                lambda i, cb, dyb: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (2, 8, 128),
                lambda i, cb, dyb: (0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 16, 128),
                lambda i, cb, dyb: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((BAND, g, NCH, 128), jnp.float32),
            pltpu.VMEM((NCH, CHUNK, g, 128), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )

    out, stats = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((2, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((nchunks, 16, 128), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(chunk_base, dy_base, source_pack, tr, target_pack)

    return out[0, :, 0:8], out[1, :, 0:8], stats
