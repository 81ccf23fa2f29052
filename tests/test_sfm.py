"""SFM (scalar-field + matmul) fast path vs the blocked reference engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.ops import mobility as mob

ETA = 1.21
A = 0.37


def _config(n, seed=0, zmin=0.1):
    rng = np.random.default_rng(seed)
    r = rng.uniform(-3, 3, (n, 3))
    r[:, 2] = rng.uniform(zmin, 4.0, n)
    v = rng.normal(size=(n, 3))
    return jnp.asarray(r), jnp.asarray(v)


@pytest.mark.parametrize("domain", ["no_wall", "single_wall"])
@pytest.mark.parametrize("n", [3, 17, 65])
def test_sfm_matches_blocked(domain, n):
    r, v = _config(n, seed=n)
    fast = mob.pairwise_matvec(r, r, v, ETA, A, coupling="tt", domain=domain,
                               method="sfm", row_tile=16)
    slow = mob.pairwise_matvec(r, r, v, ETA, A, coupling="tt", domain=domain,
                               method="blocked", row_tile=16)
    assert np.allclose(np.asarray(fast), np.asarray(slow), rtol=0, atol=1e-12)


def test_sfm_with_wall_overlap_regularization():
    # blobs below z=a: damping + shift path through SFM
    r, v = _config(12, seed=3, zmin=0.02)
    fast = mob.pairwise_matvec(r, r, v, ETA, A, coupling="tt",
                               domain="single_wall", method="sfm")
    slow = mob.pairwise_matvec(r, r, v, ETA, A, coupling="tt",
                               domain="single_wall", method="blocked")
    assert np.allclose(np.asarray(fast), np.asarray(slow), atol=1e-12)


def test_auto_dispatch_uses_sfm_for_nonperiodic():
    """auto method must agree with both paths (it picks SFM here)."""
    r, v = _config(9, seed=4)
    auto = mob.mobility_trans_times_force(r, v, ETA, A, domain="single_wall")
    slow = mob.pairwise_matvec(r, r, v, ETA, A, coupling="tt",
                               domain="single_wall", method="blocked")
    assert np.allclose(np.asarray(auto), np.asarray(slow), atol=1e-12)


def test_periodic_falls_back_to_blocked():
    r, v = _config(8, seed=5)
    u = mob.mobility_trans_times_force(r, v, ETA, A, domain="no_wall",
                                       periodic_length=(6.0, 6.0, 0.0))
    u2 = mob.pairwise_matvec(r, r, v, ETA, A, coupling="tt", domain="no_wall",
                             periodic_length=(6.0, 6.0, 0.0),
                             method="blocked")
    assert np.allclose(np.asarray(u), np.asarray(u2), atol=1e-13)


def test_sfm_sharded_matches_single_device():
    from rigidmultiblobswall_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(8)
    r, v = _config(37, seed=6)
    single = mob.pairwise_matvec(r, r, v, ETA, A, coupling="tt",
                                 domain="single_wall", method="sfm")
    sharded = mob.pairwise_matvec(r, r, v, ETA, A, coupling="tt",
                                  domain="single_wall", method="sfm",
                                  mesh=mesh)
    assert np.allclose(np.asarray(sharded), np.asarray(single), atol=1e-12)


def test_sfm_under_jit():
    r, v = _config(20, seed=7)

    @jax.jit
    def f(r, v):
        return mob.mobility_trans_times_force(r, v, ETA, A,
                                              domain="single_wall")

    u = f(r, v)
    slow = mob.pairwise_matvec(r, r, v, ETA, A, coupling="tt",
                               domain="single_wall", method="blocked")
    assert np.allclose(np.asarray(u), np.asarray(slow), atol=1e-12)
