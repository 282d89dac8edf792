"""Mesh vertex normals (reference benches/bench_mesh.rs — no published
number; we publish ours on a 200k-face synthetic mesh)."""

import sys

sys.path.insert(0, ".")
from benches._harness import emit, log, marginal_ms, setup_jax  # noqa: E402


def main() -> int:
    setup_jax()
    import jax.numpy as jnp
    import numpy as np

    from align3d_tpu.ops.mesh import MeshNormals, compute_vertex_normals

    rng = np.random.default_rng(0)
    side = 320  # (side+1)^2 vertices, 2*side^2 = 204800 faces
    ys, xs = np.meshgrid(np.arange(side + 1), np.arange(side + 1), indexing="ij")
    zs = np.sin(xs * 0.1) * np.cos(ys * 0.1)
    pts = np.stack([xs, ys, zs], axis=-1).reshape(-1, 3).astype(np.float32)
    vid = lambda r, c: r * (side + 1) + c
    faces = []
    for r in range(side):
        base = r * (side + 1)
        a = np.arange(side)
        faces.append(np.stack([base + a, base + a + 1, base + side + 1 + a], axis=1))
        faces.append(
            np.stack([base + a + 1, base + side + 2 + a, base + side + 1 + a], axis=1)
        )
    faces = np.concatenate(faces).astype(np.int32)
    log(f"mesh: {pts.shape[0]} vertices, {faces.shape[0]} faces")
    pts_j = jnp.asarray(pts)
    faces_j = jnp.asarray(faces)

    evaluator = MeshNormals(faces, pts.shape[0])
    bd = evaluator._banded
    log(
        f"cached topology: max vertex degree {evaluator.degree}; banded "
        f"bands: {'none' if bd is None else f'vbr={bd.vbr} fbr={bd.fbr}'}"
    )

    def step_cached(_, carry):
        p, acc = carry
        vn = evaluator(p)  # auto: banded Pallas kernel on TPU
        return (p + 1e-12 * vn[0, 0], acc + jnp.sum(vn[0]))

    ms = marginal_ms(step_cached, (pts_j, jnp.float32(0)), lo=10, hi=210)
    log(f"mesh normals (MeshNormals auto path) {faces.shape[0]} faces: {ms:.3f} ms")

    def step_gather(_, carry):
        p, acc = carry
        vn = evaluator(p, method="gather")
        return (p + 1e-12 * vn[0, 0], acc + jnp.sum(vn[0]))

    ms_gather = marginal_ms(step_gather, (pts_j, jnp.float32(0)), lo=10, hi=110)
    log(
        f"mesh normals (gather-table path) {faces.shape[0]} faces: "
        f"{ms_gather:.3f} ms"
    )

    def step(_, carry):
        p, acc = carry
        vn = compute_vertex_normals(p, faces_j)
        return (p + 1e-12 * vn[0, 0], acc + jnp.sum(vn[0]))

    ms_scatter = marginal_ms(step, (pts_j, jnp.float32(0)), lo=10, hi=60)
    log(
        f"mesh normals (one-shot segment_sum) {faces.shape[0]} faces: "
        f"{ms_scatter:.3f} ms"
    )
    emit("mesh_normals_200k_faces_ms", ms, "ms", None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
