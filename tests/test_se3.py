"""SE(3) transform tests.

Golden values ported from the reference unit tests
(``src/transform.rs:320-411``) as cross-implementation oracles.
"""

import jax.numpy as jnp
import numpy as np

from align3d_tpu.se3 import Transform, matrix_to_quat, quat_to_matrix
from align3d_tpu import se3


def test_identity_roundtrip():
    t = Transform.identity()
    pts = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0], [7.0, 8.0, 9.0]])
    np.testing.assert_allclose(t.apply(pts), pts, atol=1e-6)


def test_apply_rotation_translation():
    # Reference test_transform: translate z+3, rotate pi about y
    # (src/transform.rs:349-361).
    axis_angle = jnp.asarray([0.0, np.pi, 0.0])
    t = Transform.exp(jnp.concatenate([jnp.zeros(3), axis_angle]))
    t = Transform(t.rotation, jnp.asarray([0.0, 0.0, 3.0]))
    pts = jnp.asarray([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0]])
    np.testing.assert_allclose(
        t.apply(pts), [[-1.0, 2.0, 0.0], [-1.0, 2.0, 0.0]], atol=1e-5
    )


def test_exp_golden():
    # Reference test_exp (src/transform.rs:364-388).
    t = Transform.exp(jnp.asarray([1.0, 2.0, 3.0, 0.4, 0.5, 0.3]))
    out = t.apply(jnp.asarray([5.5, 6.4, 7.8]))
    np.testing.assert_allclose(out, [8.9848175, 6.9635687, 9.880962], atol=1e-5)

    out2 = t.apply(jnp.asarray([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(out2, [3.5280778, 2.8378963, 5.8994026], atol=1e-5)

    mat = t.to_matrix4()
    out3 = mat @ jnp.asarray([1.0, 2.0, 3.0, 1.0])
    np.testing.assert_allclose(out3[:3], [3.5280778, 2.8378963, 5.8994026], atol=1e-5)
    assert out3[3] == 1.0


def test_exp_small_angle():
    twist = jnp.asarray([0.1, -0.2, 0.3, 1e-6, -1e-6, 1e-6])
    t = Transform.exp(twist)
    # Near identity rotation, translation ~ v.
    np.testing.assert_allclose(t.rotation, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(t.translation, [0.1, -0.2, 0.3], atol=1e-6)
    assert not np.any(np.isnan(np.asarray(t.rotation)))

    t0 = Transform.exp(jnp.zeros(6))
    np.testing.assert_allclose(t0.rotation, np.eye(3), atol=0)
    np.testing.assert_allclose(t0.translation, np.zeros(3), atol=0)


def test_compose():
    # Reference test_compose (src/transform.rs:391-411).
    t1 = Transform(jnp.eye(3), jnp.asarray([0.0, 0.0, 3.0]))
    rot = Transform.exp(jnp.asarray([0, 0, 0, 0.0, np.pi / 2, 0.0]))
    t2 = Transform(rot.rotation, jnp.asarray([0.0, 0.0, 3.0]))
    t = t1 @ t2
    pts = jnp.asarray([[1.0, 2.0, 3.0], [1.0, 2.0, 3.0]])
    np.testing.assert_allclose(
        t.apply(pts), [[2.9999998, 2.0, 5.0], [2.9999998, 2.0, 5.0]], atol=1e-5
    )


def test_inverse():
    t = Transform.exp(jnp.asarray([1.0, 2.0, 3.0, 0.4, 0.5, 0.3]))
    ti = t.inverse()
    ident = t @ ti
    np.testing.assert_allclose(ident.rotation, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(ident.translation, np.zeros(3), atol=1e-6)


def test_quat_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        rot = quat_to_matrix(jnp.asarray(q, jnp.float32))
        q2 = matrix_to_quat(rot)
        rot2 = quat_to_matrix(q2)
        np.testing.assert_allclose(rot, rot2, atol=1e-5)


def test_angle():
    for ang in [0.0, 0.1, 1.0, np.pi / 2, 3.0]:
        t = Transform.exp(jnp.asarray([0, 0, 0, 0.0, ang, 0.0]))
        np.testing.assert_allclose(t.angle(), ang, atol=1e-5)


def test_batched_ops():
    rng = np.random.default_rng(1)
    twists = jnp.asarray(rng.normal(size=(5, 6)) * 0.3, jnp.float32)
    batch = Transform.exp(twists)
    assert batch.batch_shape == (5,)
    single = Transform.exp(twists[2])
    np.testing.assert_allclose(batch[2].rotation, single.rotation, atol=1e-7)

    composed = batch @ batch
    np.testing.assert_allclose(
        composed[1].rotation, (single := batch[1] @ batch[1]).rotation, atol=1e-6
    )
    np.testing.assert_allclose(composed[1].translation, single.translation, atol=1e-6)

    pts = jnp.asarray(rng.normal(size=(5, 7, 3)), jnp.float32)
    out = batch.apply_batch(pts)
    np.testing.assert_allclose(out[3], batch[3].apply(pts[3]), atol=1e-6)


def test_from_matrix4():
    t = Transform.exp(jnp.asarray([1.0, 2.0, 3.0, 0.4, 0.5, 0.3]))
    t2 = Transform.from_matrix4(t.to_matrix4())
    np.testing.assert_allclose(t.rotation, t2.rotation, atol=1e-6)
    np.testing.assert_allclose(t.translation, t2.translation, atol=1e-6)


def test_stack():
    ts = [Transform.exp(jnp.asarray([0.1 * i, 0, 0, 0, 0.2 * i, 0])) for i in range(3)]
    batch = se3.stack(ts)
    assert batch.batch_shape == (3,)
    np.testing.assert_allclose(batch[1].translation, ts[1].translation)


def test_angle_between_normals():
    """Reference src/extra_math.rs:13 semantics: |acos(dot)|, no clamping."""
    import numpy as np

    from align3d_tpu.extra_math import angle_between_normals

    a = jnp.asarray([1.0, 0.0, 0.0])
    b = jnp.asarray([0.0, 1.0, 0.0])
    assert abs(float(angle_between_normals(a, b)) - np.pi / 2) < 1e-6
    assert float(angle_between_normals(a, a)) < 1e-3
    # Batched.
    batch = angle_between_normals(
        jnp.stack([a, a]), jnp.stack([b, -a])
    )
    np.testing.assert_allclose(np.asarray(batch), [np.pi / 2, np.pi], atol=1e-3)
