"""Fused projective-ICP GN step, kernel v3 — lean banded association.

Redesign of :mod:`align3d_tpu.ops.icp_pallas` (v2) after profiling: v2 spent
~65% of its time in per-source-row gather-table construction (8 rows x 75
candidate tiles per chunk, each re-loaded, re-broadcast and re-selected) and
ran its dense math on (8, G, 128) arrays whose (G, 128) tiles pad G=5
sublanes up to 8 (37% wasted VPU work). v3 restructures both:

* **Channel-major target pack** ``(G, 8, Hp, 128)``: a candidate load is a
  contiguous 16-row slice per (group, channel-stack) — one dynamic VMEM
  slice per candidate instead of 15 tile loads per source row. The valid
  bit is folded into ``z > 0`` (invalid pixels store z = 0 exactly), and
  normals are stored as raw f32 (no 12-bit quantization), so all
  per-pixel data fits 7 of the 8 channels:
    c0: z (invalid pixels store exactly 0)   c1: nx   c2: ny   c3: nz
    c4..c6: the 3x3 intensity taps, 3 u8 taps per f32 word
            (t[3k]*65536 + t[3k+1]*256 + t[3k+2] — 24 bits, exact)
* **Two-channel source pack** ``(nchunks, 2, CHUNK*G, 128)`` = [z,
  intensity]: source x/y are rebuilt in-kernel from the pixel ray
  ((col-cx)/fx * z), which is exactly how backprojection created them at
  the finest level (f32-rounding-level identical; at coarser pyramid
  levels the masked nearest-to-mean pick makes this an approximation of
  at most one fine-pixel ray — see align_impl notes).
* **16-row chunks, (dy, dg)-major association**: per (chunk, group) the
  tracked row/column displacement bases (scalar-prefetched, same stats
  feedback loop as v2) define (2R+1) candidate row offsets x 2 candidate
  lane groups. The 2-group window is anchored so the predicted column sits
  64 lanes from its edges (a span of 128 source lanes + <=64 residual
  always fits 256 lanes), replacing v2's 3-group cover. Each candidate is
  one 16-row slice + one wide lane-gather + one select, shared across the
  whole chunk.
* **Flat dense math**: everything runs on (CHUNK*G, 128) arrays (rows
  j-major) — full 8-sublane vregs, no padding.
* **Single MXU reduction**: both GN systems reduce in one
  (16, N) @ (N, 16) contraction — rows 0..7 geometric [n, pxn, r, 1],
  rows 8..15 photometric, weighted per block.
* **Double-buffered band DMA**: chunk i+1's target band streams in while
  chunk i computes.

Association semantics (gates, trunc(u+0.5) lookup, numeric intensity
gradient with the exact +0.005 re-truncation, w-once accumulation) are
identical to v2 / the XLA engine (align3d_tpu/icp/image_icp.py), which
replicate the reference src/icp/image_icp.rs:95-149. Pixels whose true
correspondence falls outside the candidate band are dropped (weight 0),
exactly like v2.
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

CHUNK = 16  # source rows per grid step
HALO = 8  # extra target rows on each side of the chunk's predicted band
BAND = CHUNK + 2 * HALO
DY_RADIUS = 1  # default candidate-row radius around the predicted row
NCH = 7  # packed target channels


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def _band(hp: int) -> int:
    return min(BAND, hp)


def pack_target(
    points: Array,  # (H, W, 3) f32
    normals: Array,  # (H, W, 3)
    mask: Array,  # (H, W) bool
    intensity_map: Array,  # (H+2, W+2) f32 (bordered, ops.intensity)
) -> Array:
    """Target -> (G, 8, Hp, 128) channel-major tiles; invalid pixels z = 0."""
    h, w = mask.shape
    g = _ceil_div(w, 128)
    hp = _ceil_div(h, CHUNK) * CHUNK

    # 3x3 tap planes: tap(dv, du)[v, u] = bordered_map[v + dv, u + du] with a
    # one-pixel edge pre-pad so dv/du in {0,1,2} index offsets {-1,0,+1}
    # (identical construction to v2 / ops/target_pack.py).
    m_ext = jnp.pad(intensity_map, ((1, 0), (1, 0)), mode="edge")
    taps_u8 = [
        jnp.round(m_ext[dv : dv + h, du : du + w] * 255.0)
        for dv in range(3)
        for du in range(3)
    ]

    z = points[..., 2] * mask  # invalid -> exactly 0
    channels = [
        z,
        normals[..., 0],
        normals[..., 1],
        normals[..., 2],
        taps_u8[0] * 65536.0 + taps_u8[1] * 256.0 + taps_u8[2],
        taps_u8[3] * 65536.0 + taps_u8[4] * 256.0 + taps_u8[5],
        taps_u8[6] * 65536.0 + taps_u8[7] * 256.0 + taps_u8[8],
    ]
    t = jnp.stack(channels, axis=0)  # (7, H, W)
    t = jnp.pad(t, ((0, 0), (0, hp - h), (0, g * 128 - w)))
    # (8, Hp, G, 128) -> (G, 8, Hp, 128)
    return t.reshape(NCH, hp, g, 128).transpose(2, 0, 1, 3)


def pack_source(
    points: Array,  # (H, W, 3)
    mask: Array,  # (H, W)
    intensities: Array,  # (H, W) u8
) -> Array:
    """Source -> (nchunks, 2, CHUNK*G, 128) = [z, intensity], rows j-major
    (row r = j*CHUNK + s). Invalid pixels z = 0."""
    h, w = mask.shape
    g = _ceil_div(w, 128)
    hp = _ceil_div(h, CHUNK) * CHUNK
    nchunks = hp // CHUNK
    s = jnp.stack(
        [points[..., 2] * mask, intensities.astype(jnp.float32)], axis=0
    )  # (2, H, W)
    s = jnp.pad(s, ((0, 0), (0, hp - h), (0, g * 128 - w)))
    # (2, nchunks, CHUNK, G, 128) -> (nchunks, 2, G, CHUNK, 128)
    s = s.reshape(2, nchunks, CHUNK, g, 128).transpose(1, 0, 3, 2, 4)
    return s.reshape(nchunks, 2, g * CHUNK, 128)


def _ray_uv(rotation, translation, source_pack, intrinsics, stride=1, f32=jnp.float32):
    """Dense XLA projection of the packed source under (R, t); returns
    (u_int, v_int, valid) each (nchunks, K/stride, 128/stride) plus row/col
    index maps. ``stride`` subsamples pixels (CHUNK must divide by it) —
    block means only need a sample."""
    z = source_pack[:, 0, ::stride, ::stride]  # (nchunks, K/stride, 128/stride)
    nchunks, k = z.shape[0], z.shape[1] * stride
    g = k // CHUNK
    r_io = jnp.arange(0, k, stride)
    jj = r_io // CHUNK
    s_in = r_io % CHUNK
    lane = jnp.arange(0, 128, stride)
    col = (jj[:, None] * 128 + lane[None, :]).astype(f32)  # (K, 128)
    row = (
        jnp.arange(nchunks)[:, None, None] * CHUNK + s_in[None, :, None]
    ).astype(f32)  # (nchunks, K, 1)
    dirx = (col - f32(intrinsics.cx)) * f32(1.0 / intrinsics.fx)
    diry = (row - f32(intrinsics.cy)) * f32(1.0 / intrinsics.fy)
    sx = dirx[None] * z
    sy = diry * z
    p = (
        jnp.stack([sx, sy, z], axis=-1) @ rotation.T + translation
    )  # (nchunks, K, 128, 3)
    pz = p[..., 2]
    safe_z = jnp.where(pz == 0.0, 1e-12, pz)
    u = p[..., 0] * f32(intrinsics.fx) / safe_z + f32(intrinsics.cx)
    v = p[..., 1] * f32(intrinsics.fy) / safe_z + f32(intrinsics.cy)
    return jnp.trunc(u + 0.5), jnp.trunc(v + 0.5), z > 0, row, col


def predict_bases(
    rotation: Array,
    translation: Array,
    source_pack: Array,  # (nchunks, 2, K, 128)
    intrinsics: CameraIntrinsics,
    h: int,
    stride: int = 1,
) -> tuple[Array, Array, Array]:
    """Per-chunk band starts + per-(chunk, group) row/col displacement bases
    from a dense (optionally strided) projection of ``(rotation,
    translation)``. Called before every kernel iteration with the current
    transform — fresh predictions keep the dy radius at 1 (a stale-stats
    feedback scheme like v2's needed radius 2 to absorb one iteration of
    prediction lag). Returns (chunk_base (nchunks,), dy_base (nchunks, G),
    dx_base (nchunks, G)) as i32."""
    nchunks, k = source_pack.shape[0], source_pack.shape[2]
    g = k // CHUNK
    hp = nchunks * CHUNK
    cs = CHUNK // stride
    u_int, v_int, m, row, col = _ray_uv(
        rotation, translation, source_pack, intrinsics, stride
    )
    mf = m.astype(jnp.float32)
    dy = (v_int - row) * mf
    dx = (u_int - col[None]) * mf
    dy = dy.reshape(nchunks, g, cs, 128 // stride)
    dx = dx.reshape(nchunks, g, cs, 128 // stride)
    mfc = mf.reshape(nchunks, g, cs, 128 // stride)
    cnt = jnp.maximum(jnp.sum(mfc, axis=(2, 3)), 1.0)
    dy_base = jnp.round(jnp.sum(dy, axis=(2, 3)) / cnt).astype(jnp.int32)
    dx_base = jnp.round(jnp.sum(dx, axis=(2, 3)) / cnt).astype(jnp.int32)
    chunk_mean = jnp.round(
        jnp.sum(dy, axis=(1, 2, 3)) / jnp.maximum(jnp.sum(mfc, axis=(1, 2, 3)), 1.0)
    ).astype(jnp.int32)
    chunk0 = jnp.arange(nchunks, dtype=jnp.int32) * CHUNK
    chunk_base = jnp.clip(chunk0 + chunk_mean - HALO, 0, max(hp - _band(hp), 0))
    return chunk_base, dy_base, dx_base


def source_centroids(
    source_pack: Array,  # (nchunks, 2, K, 128)
    intrinsics: CameraIntrinsics,
) -> tuple[Array, Array, Array, Array]:
    """Per-(chunk, group) masked mean source point + mean pixel row/col.

    One-time precomputation per align. Feeds :func:`predict_bases_centroid`,
    which replaces the dense strided per-iteration projection of
    :func:`predict_bases` with a projection of ONE representative point per
    (chunk, group) — mean-of-projections ≈ projection-of-mean to second
    order in the in-group depth spread, and the band halo (8 rows) plus the
    dy radius absorb that error exactly as they absorb the rounding the
    dense path already had.

    Returns (pbar (nchunks, G, 3), rowbar (nchunks, G), colbar (nchunks, G),
    cnt (nchunks, G)).
    """
    f32 = jnp.float32
    z = source_pack[:, 0]  # (nchunks, K, 128)
    nchunks, k = z.shape[0], z.shape[1]
    g = k // CHUNK
    r_io = jnp.arange(k)
    jj = r_io // CHUNK
    s_in = r_io % CHUNK
    lane = jnp.arange(128)
    col = (jj[:, None] * 128 + lane[None, :]).astype(f32)  # (K, 128)
    row = (
        jnp.arange(nchunks)[:, None, None] * CHUNK + s_in[None, :, None]
    ).astype(f32)  # (nchunks, K, 1)
    dirx = (col - f32(intrinsics.cx)) * f32(1.0 / intrinsics.fx)
    diry = (row - f32(intrinsics.cy)) * f32(1.0 / intrinsics.fy)
    m = (z > 0).astype(f32)

    def gsum(a):  # (nchunks, K, 128) -> (nchunks, G); rows are j-major
        return jnp.sum(a.reshape(nchunks, g, CHUNK, 128), axis=(2, 3))

    cnt = gsum(m)
    safe = jnp.maximum(cnt, 1.0)
    pbar = (
        jnp.stack([gsum(dirx[None] * z), gsum(diry * z), gsum(z)], axis=-1)
        / safe[..., None]
    )
    rowbar = gsum(jnp.broadcast_to(row, z.shape) * m) / safe
    colbar = gsum(col[None] * m) / safe
    return pbar, rowbar, colbar, cnt


def predict_bases_centroid(
    rotation: Array,
    translation: Array,
    centroids: tuple[Array, Array, Array, Array],
    intrinsics: CameraIntrinsics,
    hp: int,
) -> tuple[Array, Array, Array]:
    """(chunk_base, dy_base, dx_base) from the per-(chunk, group) centroids.

    Same contract as :func:`predict_bases` but O(nchunks*G) work per
    iteration instead of a dense projection — the per-iteration band
    prediction cost disappears from the align loop.
    """
    f32 = jnp.float32
    pbar, rowbar, colbar, cnt = centroids
    nchunks = pbar.shape[0]
    p = pbar @ rotation.T + translation  # (nchunks, G, 3)
    pz = p[..., 2]
    safe_z = jnp.where(pz == 0.0, f32(1e-12), pz)
    u = p[..., 0] * f32(intrinsics.fx) / safe_z + f32(intrinsics.cx)
    v = p[..., 1] * f32(intrinsics.fy) / safe_z + f32(intrinsics.cy)
    dyf = v - rowbar
    dxf = u - colbar
    have = cnt > 0
    dy_base = jnp.where(have, jnp.round(dyf), 0.0).astype(jnp.int32)
    dx_base = jnp.where(have, jnp.round(dxf), 0.0).astype(jnp.int32)
    chunk_cnt = jnp.maximum(jnp.sum(cnt, axis=-1), 1.0)
    chunk_mean = jnp.sum(jnp.where(have, dyf, 0.0) * cnt, axis=-1) / chunk_cnt
    chunk0 = jnp.arange(nchunks, dtype=jnp.int32) * CHUNK
    chunk_base = jnp.clip(
        chunk0 + jnp.round(chunk_mean).astype(jnp.int32) - HALO,
        0,
        max(hp - _band(hp), 0),
    )
    return chunk_base, dy_base, dx_base


def source_centroids_batched(source_pack, intrinsics):
    return jax.vmap(lambda s: source_centroids(s, intrinsics))(source_pack)


def predict_bases_centroid_batched(rotation, translation, centroids, intrinsics, hp):
    return jax.vmap(
        lambda r, t, c: predict_bases_centroid(r, t, c, intrinsics, hp)
    )(rotation, translation, centroids)


def bases_from_stats(
    stats: Array,  # (nchunks, 3, G, 8, 128) kernel partial sums
    prev_dy_base: Array,  # (nchunks, G) i32
    prev_dx_base: Array,  # (nchunks, G) i32
    hp: int,
) -> tuple[Array, Array, Array]:
    """Fold kernel stats into next-iteration (chunk_base, dy_base, dx_base)."""
    sums = jnp.sum(stats, axis=(-2, -1))  # (nchunks, 3, G)
    dy_sum, dx_sum, cnt = sums[:, 0], sums[:, 1], sums[:, 2]
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
        max(hp - _band(hp), 0),
    )
    return chunk_base, dy_base, dx_base


def predict_bases_batched(rotation, translation, source_pack, intrinsics, h, stride=1):
    return jax.vmap(lambda r, t, s: predict_bases(r, t, s, intrinsics, h, stride))(
        rotation, translation, source_pack
    )


def bases_from_stats_batched(stats, prev_dy_base, prev_dx_base, hp):
    return jax.vmap(lambda s, a, b: bases_from_stats(s, a, b, hp))(
        stats, prev_dy_base, prev_dx_base
    )


def _icp_kernel_v3(
    # scalar prefetch. dyb/dxb arrive FLATTENED to (B, nchunks*G): SMEM pads
    # the trailing dim to 128 lanes, so a (B, nchunks, G) layout would burn
    # B*nchunks*128 words (1 MB at B=64 — more than all of SMEM).
    cb_ref,  # (B, nchunks) i32 band start rows
    dyb_ref,  # (B, nchunks*G) i32 row-displacement bases
    dxb_ref,  # (B, nchunks*G) i32 column-displacement bases
    # inputs
    src_ref,  # (1, 1, 2, K, 128) VMEM source chunk of pair b
    tr_ref,  # (B, 16) SMEM [r00..r22, t0..t2, pad]
    tpack_ref,  # (B, G, 8, Hp, 128) HBM target tiles
    # outputs: sys_ref (1, 16, 128) accumulated 16x16 augmented system,
    # then (only when emit_stats) stats_ref (1, 1, 3, G, 8, 128), then
    # scratch: band (2, G, NCH, BAND_EFF, 128) double-buffered target band,
    # gath (NCH, K, 128) gathered channels, sems (2,) DMA semaphores.
    sys_ref,
    *rest,
    g: int,
    emit_stats: bool,
    h: int,
    w: int,
    band_rows: int,
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
    if emit_stats:
        stats_ref, band, gath, sems = rest
    else:
        band, gath, sems = rest
    b = pl.program_id(0)
    i = pl.program_id(1)
    nchunks = pl.num_programs(1)
    k = CHUNK * g
    f32 = jnp.float32

    # ---- double-buffered band DMA -----------------------------------------
    def band_dma(slot, idx):
        return pltpu.make_async_copy(
            tpack_ref.at[b, :, :, pl.ds(cb_ref[b, idx], band_rows)],
            band.at[slot],
            sems.at[slot],
        )

    @pl.when(i == 0)
    def _():
        band_dma(0, 0).start()

    @pl.when(i + 1 < nchunks)
    def _():
        band_dma(jax.lax.rem(i + 1, 2), i + 1).start()

    slot = jax.lax.rem(i, 2)
    cb = cb_ref[b, i]

    src = src_ref[0, 0]  # (2, K, 128)
    z = src[0]
    s_int = src[1]

    r00, r01, r02 = tr_ref[b, 0], tr_ref[b, 1], tr_ref[b, 2]
    r10, r11, r12 = tr_ref[b, 3], tr_ref[b, 4], tr_ref[b, 5]
    r20, r21, r22 = tr_ref[b, 6], tr_ref[b, 7], tr_ref[b, 8]
    t0, t1, t2 = tr_ref[b, 9], tr_ref[b, 10], tr_ref[b, 11]

    # Pixel rays (rows are j-major: r = j*CHUNK + s).
    r_iota = jax.lax.broadcasted_iota(jnp.int32, (k, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (k, 128), 1)
    s_in = jax.lax.rem(r_iota, CHUNK)
    col_i = (r_iota // CHUNK) * 128 + lane
    row_i = i * CHUNK + s_in
    col_f = col_i.astype(f32)
    row_f = row_i.astype(f32)
    dirx = (col_f - f32(cx)) * f32(1.0 / fx)
    diry = (row_f - f32(cy)) * f32(1.0 / fy)
    sx = dirx * z
    sy = diry * z

    px = r00 * sx + r01 * sy + r02 * z + t0
    py = r10 * sx + r11 * sy + r12 * z + t1
    pz = r20 * sx + r21 * sy + r22 * z + t2

    safe_z = jnp.where(pz == 0.0, f32(1e-12), pz)
    inv_z = 1.0 / safe_z
    u = px * f32(fx) * inv_z + f32(cx)
    v = py * f32(fy) * inv_z + f32(cy)

    u_int = jnp.trunc(u + 0.5)
    v_int = jnp.trunc(v + 0.5)
    inb = (u_int >= 0) & (u_int < w) & (v_int >= 0) & (v_int < h)
    ui = jnp.clip(u_int, 0, w - 1).astype(jnp.int32)
    vi = jnp.clip(v_int, 0, h - 1).astype(jnp.int32)

    band_dma(slot, i).wait()

    # ---- banded association: (2R+1) candidate rows x 2 lane groups --------
    s_vec = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, 128), 0)
    n_dg = 2 if g > 1 else 1
    for j in range(g):
        ui_j = ui[j * CHUNK : (j + 1) * CHUNK]  # (CHUNK, 128)
        vi_j = vi[j * CHUNK : (j + 1) * CHUNK]
        dyb_j = dyb_ref[b, i * g + j]
        dxb_j = dxb_ref[b, i * g + j]
        if g > 1:
            # Anchor the 2-group window so the predicted column sits 64
            # lanes in: span of 128 source lanes + |residual| <= 64 always
            # fits the 256-lane window.
            ga = jnp.clip((dxb_j + 128 * j - 64) // 128, 0, g - n_dg)
        else:
            ga = jnp.int32(0)
        acc = jnp.zeros((NCH, CHUNK, 128), f32)
        for dg in range(n_dg):
            g2 = ga + dg
            rel = ui_j - g2 * 128
            lane_idx = jnp.clip(rel, 0, 127)
            grp_ok = (rel >= 0) & (rel < 128)
            idx3 = jnp.broadcast_to(lane_idx[None], (NCH, CHUNK, 128))
            # One dynamic-offset slab per (group, window); the (2R+1) dy
            # candidates become STATIC sub-slices of it — a single sublane
            # realignment instead of one per candidate. At band edges the
            # slab covers a superset of the per-candidate clipped blocks
            # (row_ok keeps matches exact either way).
            slab_rows = CHUNK + 2 * dy_radius
            rb0s = jnp.clip(
                i * CHUNK + dyb_j - dy_radius - cb,
                0,
                band_rows - slab_rows,
            )
            slab = band[
                pl.ds(slot, 1), pl.ds(g2, 1), :, pl.ds(rb0s, slab_rows), :
            ].reshape(NCH, slab_rows, 128)
            for d in range(2 * dy_radius + 1):
                cand = slab[:, d : d + CHUNK, :]
                got = jnp.take_along_axis(
                    cand.reshape(NCH * CHUNK, 128),
                    idx3.reshape(NCH * CHUNK, 128),
                    axis=1,
                ).reshape(NCH, CHUNK, 128)
                row_ok = vi_j == (cb + rb0s + d + s_vec)
                m = row_ok & grp_ok
                acc = jnp.where(m[None], got, acc)
        gath[:, j * CHUNK : (j + 1) * CHUNK, :] = acc

    # ---- unpack + dense math (reference image_icp.rs:106-149) -------------
    tz = gath[0]  # (K, 128)
    nx_ = gath[1]
    ny_ = gath[2]
    nz_ = gath[3]
    tvalid = tz > 0.0

    taps = []
    for c in range(4, 7):
        word = gath[c]
        a = jnp.floor(word * f32(1.0 / 65536.0))
        rem = word - a * 65536.0
        bb = jnp.floor(rem * f32(1.0 / 256.0))
        cc = rem - bb * 256.0
        taps += [a * f32(1.0 / 255.0), bb * f32(1.0 / 255.0), cc * f32(1.0 / 255.0)]

    uif = ui.astype(f32)
    vif = vi.astype(f32)
    tpx = (uif - f32(cx)) * tz * f32(1.0 / fx)
    tpy = (vif - f32(cy)) * tz * f32(1.0 / fy)

    dx_ = tpx - px
    dy_ = tpy - py
    dz_ = tz - pz
    dist_ok = dx_ * dx_ + dy_ * dy_ + dz_ * dz_ <= f32(max_distance_sqr)

    # Angle gate via cos monotonicity; d outside [-1, 1] => NaN acos in the
    # reference => gate passes (see v2 notes).
    dot_pn = px * nx_ + py * ny_ + pz * nz_
    angle_rejected = (dot_pn <= f32(jnp.cos(max_normal_angle))) & (
        dot_pn >= f32(-1.0)
    )

    valid = (z > 0) & inb & tvalid
    w_geom = (valid & dist_ok & (~angle_rejected)).astype(f32)

    r_geom = dx_ * nx_ + dy_ * ny_ + dz_ * nz_
    if huber_delta > 0.0:
        # Huber IRLS weight on the geometric residual; the color weight below
        # inherits it, matching the XLA engine (optim.gauss_newton.huber_weight).
        abs_r = jnp.abs(r_geom)
        w_geom = w_geom * jnp.where(
            abs_r <= f32(huber_delta),
            f32(1.0),
            f32(huber_delta) / jnp.maximum(abs_r, f32(1e-30)),
        )
    jg3 = py * nz_ - pz * ny_
    jg4 = pz * nx_ - px * nz_
    jg5 = px * ny_ - py * nx_

    # ---- photometric (bilinear + numeric grad, intensity_map.rs:150-210) --
    u_s = jnp.clip(u, 0.0, f32(w - 1))
    v_s = jnp.clip(v, 0.0, f32(h - 1))
    u0 = jnp.trunc(u_s)
    v0 = jnp.trunc(v_s)
    fu = u_s - u0
    fv = v_s - v0
    cu1 = (u0.astype(jnp.int32) - ui + 1) == 1
    cv1 = (v0.astype(jnp.int32) - vi + 1) == 1

    def row_sel(c):
        a = jnp.where(cv1, taps[3 + c], taps[c])
        b2 = jnp.where(cv1, taps[6 + c], taps[3 + c])
        return a, b2

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

    gx = du_g * f32(fx) * inv_z
    gy = dv_g * f32(fy) * inv_z
    gz = -(du_g * px * f32(fx) + dv_g * py * f32(fy)) * inv_z * inv_z
    jc3 = py * gz - pz * gy
    jc4 = pz * gx - px * gz
    jc5 = px * gy - py * gx

    # ---- MXU reduction: one (16, N) @ (N, 16) for both systems ------------
    ones = jnp.ones_like(w_geom)
    chans = (
        nx_, ny_, nz_, jg3, jg4, jg5, r_geom, ones,
        gx, gy, gz, jc3, jc4, jc5, r_color, ones,
    )
    # One (16, N) @ (N, 16) contraction. Alternatives measured and rejected:
    # multi-dim contraction over (K, 128) (Mosaic: unimplemented) and a
    # lane-only contraction with K batched (84.6 us/pair-iter vs 69.7 — 80
    # tiny matmuls lose to one big one even though the reshape relayouts).
    a = jnp.stack(chans, axis=0).reshape(16, k * 128)
    aw = jnp.stack(
        tuple(c * w_geom for c in chans[:8])
        + tuple(c * w_color for c in chans[8:]),
        axis=0,
    ).reshape(16, k * 128)
    out16 = jax.lax.dot_general(
        aw,
        a,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (16, 16)

    @pl.when(i == 0)
    def _():
        sys_ref[...] = jnp.zeros((1, 16, 128), jnp.float32)

    sys_ref[0, :, 0:16] += out16

    # ---- displacement stats (optional; align loops re-predict instead) ----
    if not emit_stats:
        return
    pw = ((z > 0) & inb).astype(f32)
    dy_val = (v_int - row_f) * pw
    dx_val = (u_int - col_f) * pw

    # One aligned (8, 128) partial per (stat, group): halving adds down to 8
    # rows; further folding to one row costs sublane relayouts (measured
    # +24 us/pair/iter), so the host glue finishes the reduction.
    def fold8(val):
        rows = CHUNK
        while rows > 8:
            rows //= 2
            val = val[:rows] + val[rows:]
        return val

    for j in range(g):
        sl = slice(j * CHUNK, (j + 1) * CHUNK)
        stats_ref[0, 0, 0, j] = fold8(dy_val[sl])
        stats_ref[0, 0, 1, j] = fold8(dx_val[sl])
        stats_ref[0, 0, 2, j] = fold8(pw[sl])


@functools.partial(
    jax.jit,
    static_argnames=("intrinsics", "h", "w", "params_tuple", "interpret", "emit_stats"),
)
def icp_step_pallas_batched(
    rotation: Array,  # (B, 3, 3)
    translation: Array,  # (B, 3)
    chunk_base: Array,  # (B, nchunks) i32
    dy_base: Array,  # (B, nchunks, G) i32
    dx_base: Array,  # (B, nchunks, G) i32
    source_pack: Array,  # (B, nchunks, 2, K, 128)
    target_pack: Array,  # (B, G, 8, Hp, 128)
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
    params_tuple: tuple,  # (max_distance, max_normal_angle, max_color_distance[, radius])
    interpret: bool = False,
    emit_stats: bool = True,
) -> tuple[Array, Array, Array]:
    """One banded GN accumulation over a batch of pairs (grid (B, nchunks)).

    Returns (geo_aug (B, 8, 8), color_aug (B, 8, 8), stats): augmented
    systems [[H, g], [g^T, sum w r^2]] with the gate count at [7, 7];
    ``stats`` is (B, nchunks, 3, G, 8, 128) displacement partials for
    :func:`bases_from_stats`, or None when ``emit_stats=False`` (the align
    loops re-predict bases from the updated transform instead, which is
    both cheaper and fresher).
    """
    bsz, nchunks = source_pack.shape[0], source_pack.shape[1]
    k = source_pack.shape[3]
    g = k // CHUNK
    hp = nchunks * CHUNK
    band_rows = _band(hp)
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
        _icp_kernel_v3,
        g=g,
        h=h,
        w=w,
        band_rows=band_rows,
        fx=float(intrinsics.fx),
        fy=float(intrinsics.fy),
        cx=float(intrinsics.cx),
        cy=float(intrinsics.cy),
        max_distance_sqr=float(max_distance) ** 2,
        max_normal_angle=float(max_normal_angle),
        max_color_distance_sqr=float(max_color_distance) ** 2,
        dy_radius=dy_radius,
        huber_delta=huber_delta,
        emit_stats=emit_stats,
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(bsz, nchunks),
        in_specs=[
            pl.BlockSpec(
                (1, 1, 2, k, 128),
                lambda b, i, cb, dyb, dxb: (b, i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 16, 128),
                lambda b, i, cb, dyb, dxb: (b, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        )
        + (
            (
                pl.BlockSpec(
                    (1, 1, 3, g, 8, 128),
                    lambda b, i, cb, dyb, dxb: (b, i, 0, 0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            )
            if emit_stats
            else ()
        ),
        scratch_shapes=[
            pltpu.VMEM((2, g, NCH, band_rows, 128), jnp.float32),
            pltpu.VMEM((NCH, k, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    out_shape = (jax.ShapeDtypeStruct((bsz, 16, 128), jnp.float32),)
    if emit_stats:
        out_shape += (
            jax.ShapeDtypeStruct((bsz, nchunks, 3, g, 8, 128), jnp.float32),
        )
    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
    )(
        chunk_base,
        dy_base.reshape(bsz, nchunks * g),
        dx_base.reshape(bsz, nchunks * g),
        source_pack,
        tr,
        target_pack,
    )

    aug = outs[0][:, :, 0:16]
    stats = outs[1] if emit_stats else None
    return aug[:, 0:8, 0:8], aug[:, 8:16, 8:16], stats


def icp_step_pallas(
    rotation: Array,
    translation: Array,
    chunk_base: Array,
    dy_base: Array,
    dx_base: Array,
    source_pack: Array,
    target_pack: Array,
    intrinsics: CameraIntrinsics,
    h: int,
    w: int,
    params_tuple: tuple,
    interpret: bool = False,
    emit_stats: bool = True,
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
        emit_stats,
    )
    return geo[0], col[0], stats[0] if emit_stats else None
