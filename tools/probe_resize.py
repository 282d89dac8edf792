"""Layout experiments for resize_nearest_to_mean on TPU."""

import sys

sys.path.insert(0, ".")
from benches._harness import log, marginal_ms, setup_jax  # noqa: E402

H, W = 480, 640
B = 9


def main() -> int:
    setup_jax()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from align3d_tpu.ops import resize as resize_ops

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.normal(size=(B, H, W, 3)).astype(np.float32))
    mask = jnp.asarray(rng.uniform(size=(B, H, W)) > 0.1)

    def chain(x, acc):
        return x + (acc * 1e-20).astype(x.dtype)

    # (a) current implementation, one level, points only
    def cur(_, acc):
        p1, m1 = jax.vmap(
            lambda p, m: resize_ops.resize_nearest_to_mean(p, m, H // 2, W // 2)
        )(chain(pts, acc), mask)
        return acc + jnp.sum(p1) * 1e-20

    log(f"current L1 points: {marginal_ms(cur, jnp.float32(0), 1, 6, 3):.2f} ms")

    # (b) channels-first planes
    def planes_impl(p, m, dh, dw):
        # p: (3, H, W), m: (H, W)
        def taps2(a):
            return [a[..., dv::2, du::2] for dv in (0, 1) for du in (0, 1)]

        vs = taps2(p)  # each (3, dh, dw)
        ms = taps2(m.astype(jnp.float32))
        count = sum(ms)
        any_valid = count > 0
        safe = jnp.where(any_valid, count, 1.0)
        mean = sum(v * mm[None] for v, mm in zip(vs, ms)) / safe[None]
        bv, bd = None, None
        for v, mm in zip(vs, ms):
            d = jnp.sum((v - mean) ** 2, axis=0)
            d = jnp.where(mm > 0, d, jnp.inf)
            if bv is None:
                bv, bd = v, d
            else:
                better = d < bd
                bd = jnp.where(better, d, bd)
                bv = jnp.where(better[None], v, bv)
        return jnp.where(any_valid[None], bv, 0.0), any_valid

    ptsT = jnp.moveaxis(pts, -1, 1)  # (B, 3, H, W)

    def pf(_, acc):
        p1, m1 = jax.vmap(lambda p, m: planes_impl(p, m, H // 2, W // 2))(
            chain(ptsT, acc), mask
        )
        return acc + jnp.sum(p1) * 1e-20

    log(f"planes-first L1 points: {marginal_ms(pf, jnp.float32(0), 1, 6, 3):.2f} ms")

    # (c) reshape-pair trick, channels-first: (3, H/2, 2, W/2, 2)
    def reshape_impl(p, m):
        dh, dw = H // 2, W // 2
        pr = p.reshape(3, dh, 2, dw, 2)
        mr = m.astype(jnp.float32).reshape(dh, 2, dw, 2)
        vs = [pr[:, :, dv, :, du] for dv in (0, 1) for du in (0, 1)]
        ms = [mr[:, dv, :, du] for dv in (0, 1) for du in (0, 1)]
        count = sum(ms)
        any_valid = count > 0
        safe = jnp.where(any_valid, count, 1.0)
        mean = sum(v * mm[None] for v, mm in zip(vs, ms)) / safe[None]
        bv, bd = None, None
        for v, mm in zip(vs, ms):
            d = jnp.sum((v - mean) ** 2, axis=0)
            d = jnp.where(mm > 0, d, jnp.inf)
            if bv is None:
                bv, bd = v, d
            else:
                better = d < bd
                bd = jnp.where(better, d, bd)
                bv = jnp.where(better[None], v, bv)
        return jnp.where(any_valid[None], bv, 0.0), any_valid

    def rs(_, acc):
        p1, m1 = jax.vmap(reshape_impl)(chain(ptsT, acc), mask)
        return acc + jnp.sum(p1) * 1e-20

    log(f"reshape-pair L1 points: {marginal_ms(rs, jnp.float32(0), 1, 6, 3):.2f} ms")

    # sanity: results agree
    a = jax.vmap(lambda p, m: resize_ops.resize_nearest_to_mean(p, m, H // 2, W // 2))(pts, mask)[0]
    b = jax.vmap(lambda p, m: planes_impl(p, m, H // 2, W // 2))(ptsT, mask)[0]
    c = jax.vmap(reshape_impl)(ptsT, mask)[0]
    log(f"agree b: {np.allclose(np.asarray(a), np.asarray(jnp.moveaxis(b, 1, -1)))}")
    log(f"agree c: {np.allclose(np.asarray(a), np.asarray(jnp.moveaxis(c, 1, -1)))}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
