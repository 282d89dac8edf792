"""Scene graph (reference ``src/viz/node.rs``, ``src/viz/scene.rs``).

A ``Node`` pairs a geometry with a pose and visibility; a ``Scene`` composes
nodes and their bounding spheres. Rendering walks the nodes and dispatches
to the software rasterizer (the reference's ``collect_command_buffers``
equivalent — here it just draws).
"""

from __future__ import annotations

import dataclasses

import numpy as np

from align3d_tpu.viz.render import OffscreenRenderer, RenderImage
from align3d_tpu.viz.sphere import Sphere3D
from align3d_tpu.viz.virtual_camera import VirtualCamera


@dataclasses.dataclass
class Node:
    """Renderable node (node.rs:117-129 properties)."""

    points: np.ndarray  # (N, 3) world/local
    colors: np.ndarray | None = None  # (N, 3) u8
    faces: np.ndarray | None = None  # (F, 3) -> mesh node
    normals: np.ndarray | None = None
    transform: np.ndarray = dataclasses.field(
        default_factory=lambda: np.eye(4, dtype=np.float32)
    )
    visible: bool = True
    point_radius_px: int = 1

    def world_points(self) -> np.ndarray:
        pts = np.asarray(self.points, np.float32).reshape(-1, 3)
        return pts @ self.transform[:3, :3].T + self.transform[:3, 3]

    def bounding_sphere(self) -> Sphere3D:
        return Sphere3D.from_points(self.world_points())


class Scene:
    """Node list + composed bounding sphere (scene.rs:12-71)."""

    def __init__(self) -> None:
        self.nodes: list[Node] = []

    def add(self, node: Node) -> Node:
        self.nodes.append(node)
        return node

    def bounding_sphere(self) -> Sphere3D:
        sphere = Sphere3D.empty()
        for node in self.nodes:
            if node.visible:
                sphere = sphere.union(node.bounding_sphere())
        return sphere

    def render(
        self,
        renderer: OffscreenRenderer,
        camera: VirtualCamera,
        target: RenderImage | None = None,
    ) -> RenderImage:
        target = target or renderer.new_target()
        for node in self.nodes:
            if not node.visible:
                continue
            pts = node.world_points()
            if node.faces is not None:
                renderer.render_mesh(
                    target, camera, pts, node.faces, normals=node.normals
                )
            else:
                renderer.render_points(
                    target,
                    camera,
                    pts,
                    colors=node.colors,
                    radius_px=node.point_radius_px,
                )
        return target
