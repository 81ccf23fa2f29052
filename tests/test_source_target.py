import jax.numpy as jnp
import numpy as np

from rigidmultiblobswall_tpu.ops import mobility as mob
from tests.reference_oracle import load_reference_mobility

REF = load_reference_mobility()
ETA = 0.93


def _setup(ns=6, nt=5, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-1, 1, (ns, 3))
    src[:, 2] = rng.uniform(0.6, 2.0, ns)
    tgt = rng.uniform(-1, 1, (nt, 3))
    tgt[:, 2] = rng.uniform(0.4, 2.5, nt)
    f = rng.normal(size=(ns, 3))
    a_src = rng.uniform(0.2, 0.5, ns)
    a_tgt = rng.uniform(0.0, 0.4, nt)
    return src, tgt, f, a_src, a_tgt


def test_source_target_wall_matches_reference():
    src, tgt, f, a_src, a_tgt = _setup()
    ours = np.asarray(mob.source_target_matvec(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f),
        jnp.asarray(a_src), jnp.asarray(a_tgt), ETA, wall=True))
    ref = REF.mobility_vector_product_source_target_one_wall(
        src, tgt, f.copy(), a_src, a_tgt, ETA).reshape(-1, 3)
    assert np.allclose(ours, ref, atol=1e-12)


def test_source_target_unbounded_matches_reference():
    src, tgt, f, a_src, a_tgt = _setup(seed=1)
    ours = np.asarray(mob.source_target_matvec(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f),
        jnp.asarray(a_src), jnp.asarray(a_tgt), ETA, wall=False))
    ref = REF.mobility_vector_product_source_target_unbounded(
        src, tgt, f.copy(), a_src, a_tgt, ETA).reshape(-1, 3)
    assert np.allclose(ours, ref, atol=1e-12)


def test_source_target_overlapping_regimes():
    """Cover all three radius regimes: separated, overlapping, enclosed."""
    src = np.array([[0.0, 0, 1.0], [0.05, 0, 1.0], [3.0, 0, 1.0]])
    tgt = np.array([[0.0, 0, 1.0], [0.02, 0.01, 1.01]])
    a_src = np.array([0.3, 0.02, 0.3])
    a_tgt = np.array([0.3, 0.01])
    f = np.ones((3, 3))
    ours = np.asarray(mob.source_target_matvec(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f),
        jnp.asarray(a_src), jnp.asarray(a_tgt), ETA, wall=False))
    ref = REF.mobility_vector_product_source_target_unbounded(
        src, tgt, f.copy(), a_src, a_tgt, ETA).reshape(-1, 3)
    assert np.allclose(ours, ref, atol=1e-12)


def test_velocity_field_and_vtk(tmp_path):
    from rigidmultiblobswall_tpu.models import fields, solvers
    from tests.test_saddle import _sphere_system

    system, state = _sphere_system(count=1, seed=2)
    sol = solvers.solve_mobility_problem(system, state)
    out = str(tmp_path / "run")
    grid = [-2, 2, 4, -2, 2, 4, 0.2, 3, 4]
    vel = fields.plot_velocity_field_to_vtk(grid, system, state, sol.lam, out)
    assert vel.shape == (64, 3)
    assert np.all(np.isfinite(vel))
    content = open(out + ".velocity_field.vtk").read()
    assert "RECTILINEAR_GRID" in content
    assert "VECTORS velocity" in content
    assert content.count("\n") > 64


def test_dense_mobility_radii_matches_matvec():
    """dense_mobility_radii (the per-blob-radius dense builder used by
    the preconditioner and the dense utility solves) equals the
    source-target matvec applied to basis vectors, wall and no-wall."""
    rng = np.random.default_rng(3)
    n = 7
    r = rng.uniform(-1, 1, (n, 3))
    r[:, 2] = rng.uniform(0.3, 2.0, n)   # some blobs overlap the wall
    radii = rng.uniform(0.2, 0.6, n)
    for domain in ("single_wall", "no_wall", "free_surface"):
        M = np.asarray(mob.dense_mobility_radii(
            jnp.asarray(r), jnp.asarray(radii), ETA, domain=domain))
        assert M.shape == (3 * n, 3 * n)
        for k in range(3 * n):
            e = np.zeros(3 * n)
            e[k] = 1.0
            u = np.asarray(mob.mobility_radii_trans_times_force(
                jnp.asarray(r), jnp.asarray(e.reshape(n, 3)),
                jnp.asarray(radii), ETA, domain=domain)).ravel()
            np.testing.assert_allclose(M[:, k], u, rtol=0, atol=1e-12)
        # symmetric (RPY with radii is a valid SPD mobility)
        np.testing.assert_allclose(M, M.T, atol=1e-12)
        if domain != "free_surface":
            w = np.linalg.eigvalsh(M)
            assert w.min() > 0, (domain, w.min())
