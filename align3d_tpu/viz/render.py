"""Z-buffered software rasterizer: point splats and triangles.

The software analog of the reference's two Vulkan pipelines: point clouds
render as camera-facing discs (the geometry-shader surfel quads of
``viz/geometry/vkpointcloud.rs`` + its fragment-disc discard), meshes as
diffuse-shaded triangles (``viz/geometry/vkmesh.rs``). Fully vectorized
numpy; deterministic; renders headless to RGBA arrays / PNG files.
"""

from __future__ import annotations

import numpy as np

from align3d_tpu.viz.virtual_camera import VirtualCamera


class RenderImage:
    """Color + depth target (reference ``offscreen_render.rs`` RenderImage)."""

    def __init__(self, width: int, height: int, background=(0, 0, 0, 255)):
        self.width = width
        self.height = height
        self.color = np.zeros((height, width, 4), np.uint8)
        self.color[:] = np.asarray(background, np.uint8)
        self.depth = np.full((height, width), np.inf, np.float32)

    def save_png(self, path) -> None:
        from PIL import Image

        Image.fromarray(self.color, "RGBA").save(path)


def _project(camera: VirtualCamera, points: np.ndarray, width: int, height: int):
    """World points -> (x_px, y_px, z_ndc, in_front) via the camera VP."""
    vp = camera.view_projection()
    pts = np.asarray(points, np.float32).reshape(-1, 3)
    hom = vp[:3, :3] @ pts.T + vp[:3, 3:4]  # (3, N) of x', y', z'
    w = vp[3, :3] @ pts.T + vp[3, 3]  # (N,)
    in_front = w > 1e-9
    w_safe = np.where(in_front, w, 1.0)
    ndc = hom / w_safe
    x = (ndc[0] * 0.5 + 0.5) * (width - 1)
    # NDC +y is up; pixel +y is down (the Y flip the reference bakes into its
    # node graph, viz/node.rs:32-40).
    y = (0.5 - ndc[1] * 0.5) * (height - 1)
    return x, y, ndc[2], in_front & (np.abs(ndc[2]) <= 1.0)


class OffscreenRenderer:
    """Render geometry into a ``RenderImage`` (reference
    ``viz/offscreen_render.rs:29-209``)."""

    def __init__(self, width: int = 640, height: int = 480, background=(0, 0, 0, 255)):
        self.width = width
        self.height = height
        self.background = background

    def new_target(self) -> RenderImage:
        return RenderImage(self.width, self.height, self.background)

    def render_points(
        self,
        target: RenderImage,
        camera: VirtualCamera,
        points: np.ndarray,  # (N, 3) world
        colors: np.ndarray | None = None,  # (N, 3) u8
        radius_px: int = 1,
    ) -> None:
        """Splat points as z-tested discs of ``radius_px``."""
        x, y, z, ok = _project(camera, points, self.width, self.height)
        if colors is None:
            colors = np.full((x.shape[0], 3), 200, np.uint8)
        colors = np.asarray(colors, np.uint8).reshape(-1, 3)

        xi = np.round(x).astype(np.int64)
        yi = np.round(y).astype(np.int64)
        for dy in range(-radius_px + 1, radius_px):
            for dx in range(-radius_px + 1, radius_px):
                if dx * dx + dy * dy >= radius_px * radius_px and radius_px > 1:
                    continue  # disc footprint, not square
                xs = xi + dx
                ys = yi + dy
                sel = ok & (xs >= 0) & (xs < self.width) & (ys >= 0) & (ys < self.height)
                if not sel.any():
                    continue
                flat = ys[sel] * self.width + xs[sel]
                zs = z[sel]
                cs = colors[sel]
                # z-test with last-wins among equal depths: sort by -z so the
                # nearest lands last in the scatter.
                order = np.argsort(-zs, kind="stable")
                flat, zs, cs = flat[order], zs[order], cs[order]
                depth = target.depth.reshape(-1)
                passed = zs <= depth[flat]
                flat, zs, cs = flat[passed], zs[passed], cs[passed]
                depth[flat] = zs
                target.color.reshape(-1, 4)[flat, :3] = cs
                target.color.reshape(-1, 4)[flat, 3] = 255

    def render_mesh(
        self,
        target: RenderImage,
        camera: VirtualCamera,
        points: np.ndarray,  # (N, 3)
        faces: np.ndarray,  # (F, 3) int
        normals: np.ndarray | None = None,
        base_color=(180, 180, 190),
    ) -> None:
        """Diffuse-shaded triangle raster (vkmesh.rs pipeline equivalent)."""
        x, y, z, ok = _project(camera, points, self.width, self.height)
        if normals is None:
            from align3d_tpu.ops.mesh import compute_vertex_normals
            import jax.numpy as jnp

            normals = np.asarray(
                compute_vertex_normals(jnp.asarray(points), jnp.asarray(faces))
            )
        normals = np.nan_to_num(np.asarray(normals, np.float32))
        light = -np.asarray(camera.view, np.float32)
        shade = np.clip(normals @ light, 0.15, 1.0)  # headlight diffuse
        vcol = np.clip(
            shade[:, None] * np.asarray(base_color, np.float32)[None, :], 0, 255
        )

        depth = target.depth
        color = target.color
        for f in np.asarray(faces):
            if not (ok[f[0]] and ok[f[1]] and ok[f[2]]):
                continue
            xs = x[f]
            ys = y[f]
            zs = z[f]
            minx = max(int(np.floor(xs.min())), 0)
            maxx = min(int(np.ceil(xs.max())), self.width - 1)
            miny = max(int(np.floor(ys.min())), 0)
            maxy = min(int(np.ceil(ys.max())), self.height - 1)
            if minx > maxx or miny > maxy:
                continue
            gx, gy = np.meshgrid(
                np.arange(minx, maxx + 1), np.arange(miny, maxy + 1)
            )
            d = (ys[1] - ys[2]) * (xs[0] - xs[2]) + (xs[2] - xs[1]) * (ys[0] - ys[2])
            if abs(d) < 1e-12:
                continue
            l0 = ((ys[1] - ys[2]) * (gx - xs[2]) + (xs[2] - xs[1]) * (gy - ys[2])) / d
            l1 = ((ys[2] - ys[0]) * (gx - xs[2]) + (xs[0] - xs[2]) * (gy - ys[2])) / d
            l2 = 1.0 - l0 - l1
            inside = (l0 >= 0) & (l1 >= 0) & (l2 >= 0)
            if not inside.any():
                continue
            zpix = l0 * zs[0] + l1 * zs[1] + l2 * zs[2]
            cpix = (
                l0[..., None] * vcol[f[0]]
                + l1[..., None] * vcol[f[1]]
                + l2[..., None] * vcol[f[2]]
            )
            sub_d = depth[miny : maxy + 1, minx : maxx + 1]
            win = inside & (zpix <= sub_d)
            sub_d[win] = zpix[win]
            sub_c = color[miny : maxy + 1, minx : maxx + 1]
            sub_c[..., :3][win] = cpix[win].astype(np.uint8)
            sub_c[..., 3][win] = 255
