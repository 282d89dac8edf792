"""Fused projective-ICP Gauss-Newton step as a Pallas TPU kernel.

Why this exists: the ICP inner loop is gather-bound. XLA's HBM gather runs at
~4 ns/row regardless of batching (measured on v5e), capping a 640x480 GN
iteration at ~2.3 ms even with the two-packed-table layout
(align3d_tpu/ops/target_pack.py). This kernel keeps the gather ON-CHIP:

* The target is packed once per align into channel-in-sublane tiles
  ``(Hp, G, 8, 128)`` (G = ceil(W/128) lane groups) living in HBM. All
  per-pixel reads fit 8 f32 channels by integer-packing pairs into f32
  mantissas (exactly representable):
    c0: z (full f32 — the distance gate and residual stay exact)
    c1: nx_q * 4096 + ny_q         (12-bit quantized normal components)
    c2: nz_q * 2 + valid
    c3..c7: the 3x3 intensity-tap neighborhood as u8-pair words
            t[2k]*256 + t[2k+1] (u8 taps are exact: the intensity map is
            luma_u8 / 255 plus replicated borders)
* The source image is processed in chunks of 8 rows (one grid step each).
  Each step DMAs a band of target rows around the chunk's expected
  projection (scalar-prefetched per-chunk row base) into VMEM.
* Projective association becomes a *banded* gather: for every source pixel
  the projected target pixel is found among candidate (row, lane-group)
  tiles — 5 candidate rows x the 2 lane groups that cover the per-group
  predicted column displacement. Candidates are stacked and resolved with a
  single wide ``take_along_axis`` lane-gather (the one gather primitive
  Mosaic lowers natively) plus per-candidate selects; only the SELECTED
  packed channels are unpacked.
* Residuals, gates-as-weights and Jacobians are formed densely in VMEM and
  reduced straight to the two augmented 8x8 normal-equation blocks
  ``sum w * [J r 1]^T [J r 1]`` on the MXU — so HBM traffic per iteration
  is the band DMAs plus a few hundred floats.

Association is displacement-banded: a pixel whose true correspondence lies
further than ``DY_RADIUS`` rows from its chunk's per-group predicted row (or
outside the two candidate lane groups around the predicted column shift) is
dropped (weight 0). Per-(chunk, group) row/column predictions come from the
previous iteration's own projection statistics (emitted by the kernel), so
the band follows the alignment as it converges; the coarse pyramid levels
(which handle large motion) use the exact XLA path.

Semantics replicated from the reference (src/icp/image_icp.rs:95-149 via the
XLA implementation in align3d_tpu/icp/image_icp.py): nearest-pixel lookup at
trunc(u+0.5), distance and normal-angle gates (NaN angle passes), bilinear
intensity + numeric gradient with the exact (u + 0.005) re-truncation
(src/intensity_map.rs:150-210), and the w-once accumulation H = sum w J J^T.
Normals are 12-bit quantized (|dn| <= 2.5e-4): gate decisions can flip for
pixels within that margin of the angle threshold — irrelevant against the
ATE bound but why the parity tests compare counts approximately.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from align3d_tpu.camera import CameraIntrinsics
from align3d_tpu.ops.intensity import GRAD_H, GRAD_H_INV

Array = jax.Array

CHUNK = 8  # source rows per grid step
HALO = 8  # extra target rows DMA'd on each side of the chunk
BAND = CHUNK + 2 * HALO
DY_RADIUS = 2  # default candidate-row radius around the predicted row

NCH = 8  # packed f32 channels (sublanes) per target tile

NORM_LEVELS = 4094.0  # normal components quantized to [0, 4094] (12 bits)


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def pack_target(
    points: Array,  # (H, W, 3) f32
    normals: Array,  # (H, W, 3)
    mask: Array,  # (H, W) bool
    intensity_map: Array,  # (H+2, W+2) f32 (bordered, ops.intensity)
) -> Array:
    """Target -> (Hp, G, 8, 128) integer-packed channel tiles (Hp = H rounded
    up to CHUNK, G = ceil(W/128)); padding pixels are invalid (z = 0)."""
    h, w = mask.shape
    g = _ceil_div(w, 128)
    hp = _ceil_div(h, CHUNK) * CHUNK

    # 3x3 tap planes around each pixel: tap(dv, du)[v, u] = I[v+dv, u+du]
    # with I the bordered map (negative indices clamp — those taps are never
    # used by the math, see ops/target_pack.py).
    m_ext = jnp.pad(intensity_map, ((1, 0), (1, 0)), mode="edge")
    taps_u8 = [
        jnp.round(m_ext[dv : dv + h, du : du + w] * 255.0)
        for dv in range(3)
        for du in range(3)
    ]

    z = points[..., 2] * mask  # invalid -> exactly 0
    nq = [
        jnp.round((jnp.clip(normals[..., k], -1.0, 1.0) + 1.0) * (NORM_LEVELS / 2.0))
        for k in range(3)
    ]
    validf = mask.astype(jnp.float32)
    channels = [
        z,
        nq[0] * 4096.0 + nq[1],
        nq[2] * 2.0 + validf,
        taps_u8[0] * 256.0 + taps_u8[1],
        taps_u8[2] * 256.0 + taps_u8[3],
        taps_u8[4] * 256.0 + taps_u8[5],
        taps_u8[6] * 256.0 + taps_u8[7],
        taps_u8[8] * 256.0,
    ]
    t = jnp.stack(channels, axis=0)  # (8, H, W)
    t = jnp.pad(t, ((0, 0), (0, hp - h), (0, g * 128 - w)))
    return t.reshape(NCH, hp, g, 128).transpose(1, 2, 0, 3)  # (Hp, G, 8, 128)


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
) -> tuple[Array, Array, Array]:
    """Initial per-chunk band starts + per-(chunk, group) row/column offsets.

    Dense XLA math (no gathers): project every source pixel with the initial
    transform, take masked mean displacements per (chunk, group). Later
    iterations use the kernel's own stats (:func:`bases_from_stats`).
    Returns (chunk_base (nchunks,), dy_base (nchunks, G), dx_base) as i32.
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
    u = p[..., 0] * jnp.float32(intrinsics.fx) / safe_z + jnp.float32(intrinsics.cx)
    v = p[..., 1] * jnp.float32(intrinsics.fy) / safe_z + jnp.float32(intrinsics.cy)
    src_row = jnp.arange(hp, dtype=jnp.float32)[:, None, None]
    src_col = (
        jnp.arange(g, dtype=jnp.float32)[None, :, None] * 128.0
        + jnp.arange(128, dtype=jnp.float32)[None, None, :]
    )
    dy = (jnp.trunc(v + 0.5) - src_row) * sm
    dx = (jnp.trunc(u + 0.5) - src_col) * sm
    dy = dy.reshape(nchunks, CHUNK, g, 128)
    dx = dx.reshape(nchunks, CHUNK, g, 128)
    smc = sm.reshape(nchunks, CHUNK, g, 128)
    cnt = jnp.maximum(jnp.sum(smc, axis=(1, 3)), 1.0)
    dy_base = jnp.round(jnp.sum(dy, axis=(1, 3)) / cnt).astype(jnp.int32)
    dx_base = jnp.round(jnp.sum(dx, axis=(1, 3)) / cnt).astype(jnp.int32)
    chunk_mean = jnp.round(
        jnp.sum(dy, axis=(1, 2, 3)) / jnp.maximum(jnp.sum(smc, axis=(1, 2, 3)), 1.0)
    ).astype(jnp.int32)
    chunk0 = jnp.arange(nchunks, dtype=jnp.int32) * CHUNK
    chunk_base = jnp.clip(chunk0 + chunk_mean - HALO, 0, max(hp - BAND, 0))
    return chunk_base, dy_base, dx_base


def bases_from_stats(
    stats: Array,  # (nchunks, 24, 128) kernel per-lane partials
    prev_dy_base: Array,  # (nchunks, G) i32
    prev_dx_base: Array,  # (nchunks, G) i32
    hp: int,
) -> tuple[Array, Array, Array]:
    """Fold kernel stats into next-iteration (chunk_base, dy_base, dx_base)."""
    g = prev_dy_base.shape[1]
    dy_sum = jnp.sum(stats[:, 0:g], axis=-1)  # (nchunks, G)
    dx_sum = jnp.sum(stats[:, 8 : 8 + g], axis=-1)
    cnt = jnp.sum(stats[:, 16 : 16 + g], axis=-1)
    safe = jnp.maximum(cnt, 1.0)
    dy_base = jnp.where(
        cnt > 0, jnp.round(dy_sum / safe).astype(jnp.int32), prev_dy_base
    )
    dx_base = jnp.where(
        cnt > 0, jnp.round(dx_sum / safe).astype(jnp.int32), prev_dx_base
    )
    chunk_cnt = jnp.maximum(jnp.sum(cnt, axis=-1), 1.0)
    chunk_mean = jnp.sum(dy_sum, axis=-1) / chunk_cnt
    nchunks = stats.shape[0]
    chunk0 = jnp.arange(nchunks, dtype=jnp.int32) * CHUNK
    chunk_base = jnp.clip(
        chunk0 + jnp.round(chunk_mean).astype(jnp.int32) - HALO,
        0,
        max(hp - BAND, 0),
    )
    return chunk_base, dy_base, dx_base


def predict_bases_batched(
    rotation: Array, translation: Array, source_pack: Array, intrinsics, h: int
):
    """vmap of :func:`predict_bases` over a leading pair axis."""
    return jax.vmap(lambda r, t, s: predict_bases(r, t, s, intrinsics, h))(
        rotation, translation, source_pack
    )


def bases_from_stats_batched(
    stats: Array, prev_dy_base: Array, prev_dx_base: Array, hp: int
):
    """vmap of :func:`bases_from_stats` over a leading pair axis."""
    return jax.vmap(lambda s, a, b: bases_from_stats(s, a, b, hp))(
        stats, prev_dy_base, prev_dx_base
    )


def _icp_kernel(
    # scalar prefetch
    cb_ref,  # (B, nchunks) i32 band start rows
    dyb_ref,  # (B, nchunks, G) i32 per-group row-displacement bases
    dxb_ref,  # (B, nchunks, G) i32 per-group column-displacement bases
    # inputs
    src_ref,  # (1, CHUNK, G, 8, 128) VMEM source chunk of pair b
    tr_ref,  # (B, 16) SMEM [r00..r22, t0..t2, pad] per pair
    tpack_ref,  # (B, Hp, G, 8, 128) HBM target tiles
    # outputs
    sys_ref,  # (1, 2, 8, 128) VMEM accumulated [geo, color] augmented systems
    stats_ref,  # (1, 1, 24, 128): rows 0:G dy-sum, 8:8+G dx-sum, 16:16+G count
    # scratch
    band,  # (BAND, G, 8, 128) VMEM
    gath,  # (8, CHUNK, G, 128) VMEM gathered packed channels
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
    dy_radius: int,
    huber_delta: float,
):
    b = pl.program_id(0)  # pair in the batch
    i = pl.program_id(1)  # source row chunk
    cb = cb_ref[b, i]

    copy = pltpu.make_async_copy(tpack_ref.at[b].at[pl.ds(cb, BAND)], band, sem)
    copy.start()

    f32 = jnp.float32
    src = src_ref[0]  # (CHUNK, G, 8, 128) — block has a leading pair dim
    sx, sy, sz = src[:, :, 0], src[:, :, 1], src[:, :, 2]  # (CHUNK, G, 128)
    s_int = src[:, :, 3]
    s_msk = src[:, :, 4]

    r00, r01, r02 = tr_ref[b, 0], tr_ref[b, 1], tr_ref[b, 2]
    r10, r11, r12 = tr_ref[b, 3], tr_ref[b, 4], tr_ref[b, 5]
    r20, r21, r22 = tr_ref[b, 6], tr_ref[b, 7], tr_ref[b, 8]
    t0, t1, t2 = tr_ref[b, 9], tr_ref[b, 10], tr_ref[b, 11]

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

    copy.wait()

    # ---- banded gather ---------------------------------------------------
    # Candidate lane groups per (chunk, group): the three consecutive groups
    # anchored at floor((dxb - R)/128), which always cover the column span
    # [128j + dxb - R, 128j + 127 + dxb + R] (length 128 + 2R can straddle
    # both seams of a 2-group window, so 3 are needed — and 3 also handle
    # arbitrarily large predicted column shifts). Candidate rows: DY_RADIUS
    # around the per-group predicted row. One wide lane-gather per source
    # row resolves everything.
    n_gx = min(3, g)
    n_cand = (2 * dy_radius + 1) * n_gx
    for s in range(CHUNK):
        cands = []
        rows_abs = []  # absolute target row per candidate (traced scalar)
        groups = []  # lane-group id per candidate (traced scalar)
        for j in range(g):
            dyb = dyb_ref[b, i, j]
            dxb = dxb_ref[b, i, j]
            if g == 1:
                ga = jnp.int32(0)
            else:
                ga = jnp.clip(
                    j + (dxb - dy_radius) // 128, 0, g - n_gx
                ).astype(jnp.int32)
            for dy in range(-dy_radius, dy_radius + 1):
                rb_raw = i * CHUNK + s + dyb + dy - cb
                rb = jnp.clip(rb_raw, 0, BAND - 1)
                for dg in range(n_gx):
                    g2 = ga + dg
                    cands.append(
                        band[pl.ds(rb, 1), pl.ds(g2, 1)].reshape(NCH, 128)
                    )
                    rows_abs.append(cb + rb)
                    groups.append(g2)
        table = jnp.concatenate(cands, axis=0)  # (g*n_cand*8, 128)

        # Per-candidate in-group lane index, clipped into range (wrong-group
        # lanes are masked out by the match select).
        idx_rows = []
        for ci in range(g * n_cand):
            j = ci // n_cand
            il = jnp.clip(ui[s, j] - groups[ci] * 128, 0, 127)
            idx_rows.append(jnp.broadcast_to(il[None, :], (NCH, 128)))
        idx = jnp.concatenate(idx_rows, axis=0)
        got = jnp.take_along_axis(table, idx, axis=1)

        for j in range(g):
            tg_j = ui[s, j] >> 7
            acc = jnp.zeros((NCH, 128), jnp.float32)
            for k in range(n_cand):
                ci = j * n_cand + k
                match = (vi[s, j] == rows_abs[ci]) & (tg_j == groups[ci])
                acc = jnp.where(
                    match[None, :], got[ci * NCH : (ci + 1) * NCH], acc
                )
            gath[:, s, j, :] = acc

    # ---- unpack + dense math (reference image_icp.rs:106-149) ------------
    tz = gath[0]  # (CHUNK, G, 128)
    p1 = gath[1]
    nxq = jnp.floor(p1 * f32(1.0 / 4096.0))
    nyq = p1 - nxq * 4096.0
    p2 = gath[2]
    nzq = jnp.floor(p2 * 0.5)
    tvalid = (p2 - nzq * 2.0) > 0.0
    inv_levels = f32(2.0 / NORM_LEVELS)
    nx_ = nxq * inv_levels - 1.0
    ny_ = nyq * inv_levels - 1.0
    nz_ = nzq * inv_levels - 1.0

    taps = []
    for c in range(3, 8):
        hi = jnp.floor(gath[c] * f32(1.0 / 256.0))
        lo = gath[c] - hi * 256.0
        taps.append(hi * f32(1.0 / 255.0))
        taps.append(lo * f32(1.0 / 255.0))
    # taps[0..8] are the 3x3 neighborhood (row-major), taps[9] is padding.

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
    if huber_delta > 0.0:
        # Huber IRLS weight (matches optim.gauss_newton.huber_weight).
        abs_r = jnp.abs(r_geom)
        w_geom = w_geom * jnp.where(
            abs_r <= f32(huber_delta),
            f32(1.0),
            f32(huber_delta) / jnp.maximum(abs_r, f32(1e-30)),
        )
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
    cu1 = (u0.astype(jnp.int32) - ui + 1) == 1
    cv1 = (v0.astype(jnp.int32) - vi + 1) == 1

    # Two-stage select tree over the 3x3 tap planes.
    def row_sel(c):  # taps at (cv + {0,1}, column c)
        a = jnp.where(cv1, taps[3 + c], taps[c])
        b = jnp.where(cv1, taps[6 + c], taps[3 + c])
        return a, b

    r0c0, r1c0 = row_sel(0)
    r0c1, r1c1 = row_sel(1)
    r0c2, r1c2 = row_sel(2)
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
    t20 = jnp.where(cu1, taps[7], taps[6])
    t21 = jnp.where(cu1, taps[8], taps[7])
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
        sys_ref[...] = jnp.zeros((1, 2, 8, 128), jnp.float32)

    sys_ref[0, 0, :, 0:8] += geo
    sys_ref[0, 1, :, 0:8] += col

    # Displacement stats for the NEXT iteration's band prediction: per-lane
    # partial sums over the chunk's rows (host reduces over lanes). Uses the
    # projection validity only (not the distance/angle gates) so the band
    # tracks where correspondences land even before they pass gates.
    proj_ok = (s_msk > 0) & inb
    pw = proj_ok.astype(f32)
    src_row = (i * CHUNK).astype(jnp.float32) + jax.lax.broadcasted_iota(
        jnp.int32, (CHUNK, g, 128), 0
    ).astype(jnp.float32)
    src_col = (
        jax.lax.broadcasted_iota(jnp.int32, (CHUNK, g, 128), 1) * 128
        + jax.lax.broadcasted_iota(jnp.int32, (CHUNK, g, 128), 2)
    ).astype(jnp.float32)
    dy_val = (v_int - src_row) * pw
    dx_val = (u_int - src_col) * pw
    # Unrolled accumulation over the chunk's rows — Mosaic rejects an axis-0
    # reduce of a 3D operand here ("unsupported output implicit dimension").
    dy_acc = dy_val[0]
    dx_acc = dx_val[0]
    pw_acc = pw[0]
    for s in range(1, CHUNK):
        dy_acc = dy_acc + dy_val[s]
        dx_acc = dx_acc + dx_val[s]
        pw_acc = pw_acc + pw[s]
    stats_ref[0, 0, 0:g, :] = dy_acc  # (G, 128)
    stats_ref[0, 0, 8 : 8 + g, :] = dx_acc
    stats_ref[0, 0, 16 : 16 + g, :] = pw_acc


@functools.partial(
    jax.jit,
    static_argnames=("intrinsics", "h", "w", "params_tuple", "interpret"),
)
def icp_step_pallas_batched(
    rotation: Array,  # (B, 3, 3)
    translation: Array,  # (B, 3)
    chunk_base: Array,  # (B, nchunks) i32 band start rows
    dy_base: Array,  # (B, nchunks, G) i32 row-displacement bases
    dx_base: Array,  # (B, nchunks, G) i32 column-displacement bases
    source_pack: Array,  # (B, Hp, G, 8, 128)
    target_pack: Array,  # (B, Hp, G, 8, 128)
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
    params_tuple: tuple,  # (max_distance, max_normal_angle, max_color_distance)
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Banded GN accumulation over a batch of pairs (grid = (B, nchunks) —
    the Pallas pipeline overlaps pair b+1's DMA with pair b's compute, and
    one launch covers the whole batch).

    Returns (geo_aug (B, 8, 8), color_aug (B, 8, 8), stats (B, nchunks, 24,
    128)): augmented systems [[H, g], [g^T, sum w r^2]] with count at
    [7, 7], and displacement stats for :func:`bases_from_stats`.
    """
    bsz, hp, g = source_pack.shape[0], source_pack.shape[1], source_pack.shape[2]
    nchunks = hp // CHUNK
    max_distance, max_normal_angle, max_color_distance = params_tuple[:3]
    dy_radius = int(params_tuple[3]) if len(params_tuple) > 3 else DY_RADIUS
    huber_delta = float(params_tuple[4]) if len(params_tuple) > 4 else 0.0

    tr = jnp.concatenate(
        [
            rotation.reshape(bsz, 9),
            translation.reshape(bsz, 3),
            jnp.zeros((bsz, 4), jnp.float32),
        ],
        axis=1,
    )

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
        dy_radius=dy_radius,
        huber_delta=huber_delta,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bsz, nchunks),
        in_specs=[
            pl.BlockSpec(
                (1, CHUNK, g, 8, 128),
                lambda b, i, cb, dyb, dxb: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 2, 8, 128),
                lambda b, i, cb, dyb, dxb: (b, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, 24, 128),
                lambda b, i, cb, dyb, dxb: (b, i, 0, 0),
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
            jax.ShapeDtypeStruct((bsz, 2, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((bsz, nchunks, 24, 128), jnp.float32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(chunk_base, dy_base, dx_base, source_pack, tr, target_pack)

    return out[:, 0, :, 0:8], out[:, 1, :, 0:8], stats


def icp_step_pallas(
    rotation: Array,
    translation: Array,
    chunk_base: Array,  # (nchunks,) i32
    dy_base: Array,  # (nchunks, G) i32
    dx_base: Array,  # (nchunks, G) i32
    source_pack: Array,  # (Hp, G, 8, 128)
    target_pack: Array,  # (Hp, G, 8, 128)
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
    params_tuple: tuple,
    interpret: bool = False,
) -> tuple[Array, Array, Array]:
    """Single-pair convenience wrapper over :func:`icp_step_pallas_batched`."""
    geo, col, stats = icp_step_pallas_batched(
        rotation[None],
        translation[None],
        chunk_base[None],
        dy_base[None],
        dx_base[None],
        source_pack[None],
        target_pack[None],
        intrinsics,
        h,
        w,
        params_tuple,
        interpret,
    )
    return geo[0], col[0], stats[0]
