import jax.numpy as jnp
import numpy as np

from rigidmultiblobswall_tpu.ops import mobility as mob


def _config(n, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(-2, 2, (n, 3))
    r[:, 2] = rng.uniform(0.5, 3.0, n)
    v = rng.normal(size=(n, 3))
    return jnp.asarray(r), jnp.asarray(v)


def _free_surface_oracle(r, v, eta, a):
    """Direct numpy implementation: RPY(d) + RPY(d_img) @ diag(1,1,-1)."""
    n = r.shape[0]

    def rpy_block(d):
        r2 = d @ d
        if r2 == 0:
            return (4 / 3) * np.eye(3)
        rr = np.sqrt(r2)
        if rr > 2:
            c1 = (1 + 2 / (3 * r2)) / rr
            c2 = (1 - 2 / r2) / r2 / rr
        else:
            c1 = (4 / 3) * (1 - 9 * rr / 32)
            c2 = (4 / 3) * (3 / 32) / rr
        return c1 * np.eye(3) + c2 * np.outer(d, d)

    P = np.diag([1.0, 1.0, -1.0])
    u = np.zeros((n, 3))
    for i in range(n):
        for j in range(n):
            d = (r[i] - r[j]) / a
            blk = rpy_block(d) if i != j else (4 / 3) * np.eye(3)
            d_img = d.copy()
            d_img[2] = (r[i, 2] + r[j, 2]) / a
            blk = blk + rpy_block(d_img) @ P
            u[i] += blk @ v[j]
    return u / (8 * np.pi * eta * a)


def test_free_surface_matches_oracle():
    r, v = _config(7, seed=1)
    u = mob.mobility_trans_times_force(r, v, 1.3, 0.3, domain="free_surface")
    expected = _free_surface_oracle(np.asarray(r), np.asarray(v), 1.3, 0.3)
    assert np.allclose(np.asarray(u), expected, atol=1e-12)


def test_free_surface_enhances_parallel_mobility():
    """Near a free surface the parallel self-mobility is ENHANCED (slip
    plane) unlike a no-slip wall which hinders it."""
    r = jnp.asarray([[0.0, 0.0, 0.5]])
    f = jnp.asarray([[1.0, 0.0, 0.0]])
    u_fs = mob.mobility_trans_times_force(r, f, 1.0, 0.3, domain="free_surface")
    u_bulk = mob.mobility_trans_times_force(r, f, 1.0, 0.3, domain="no_wall")
    u_wall = mob.mobility_trans_times_force(r, f, 1.0, 0.3, domain="single_wall")
    assert float(u_fs[0, 0]) > float(u_bulk[0, 0]) > float(u_wall[0, 0])


def test_free_surface_source_target_radii():
    from tests.reference_oracle import load_reference_mobility

    REF = load_reference_mobility()
    rng = np.random.default_rng(2)
    src = rng.uniform(-1, 1, (5, 3))
    src[:, 2] = rng.uniform(0.5, 2.0, 5)
    tgt = rng.uniform(-1, 1, (4, 3))
    tgt[:, 2] = rng.uniform(0.5, 2.0, 4)
    f = rng.normal(size=(5, 3))
    a_src = rng.uniform(0.2, 0.4, 5)
    a_tgt = rng.uniform(0.1, 0.3, 4)
    ours = np.asarray(mob.source_target_matvec(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f),
        jnp.asarray(a_src), jnp.asarray(a_tgt), 1.1, domain="free_surface"))
    if hasattr(REF, "free_surface_mobility_trans_times_force_source_target_numba"):
        # numba missing -> reference falls back; compute via our oracle shape
        pass
    # oracle: unbounded + image with reflection
    u_unb = REF.mobility_vector_product_source_target_unbounded(
        src, tgt, f.copy(), a_src, a_tgt, 1.1).reshape(-1, 3)
    src_img = src.copy()
    src_img[:, 2] *= -1.0
    u_img = REF.mobility_vector_product_source_target_unbounded(
        src_img, tgt, (f * np.array([1, 1, -1])).copy(), a_src, a_tgt,
        1.1).reshape(-1, 3)
    assert np.allclose(ours, u_unb + u_img, atol=1e-12)
