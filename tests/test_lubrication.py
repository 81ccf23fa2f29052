import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.models import lubrication as lub

TABLES = (lub.LubricationTables.load()
          if os.path.isdir(lub.DEFAULT_TABLE_DIR) else None)

pytestmark = pytest.mark.skipif(TABLES is None,
                                reason="resistance tables not available")


def _solver(n, **kw):
    defaults = dict(num_bodies=n, eta=0.95, a=1.0, kT=0.1, dt=1e-3,
                    solver_tolerance=1e-8, tables=TABLES)
    defaults.update(kw)
    return lub.LubSolver(**defaults)


def _np_pair_matrix(s11, s12, r_hat, mf):
    """Independent numpy assembly of the 12x12 two-sphere matrix."""
    X11A, Y11A, Y11B, X11C, Y11C = s11
    X12A, Y12A, Y12B, X12C, Y12C = s12
    sq = np.outer(r_hat, r_hat)
    sh = np.eye(3) - sq
    cx = np.array([[0, -r_hat[2], r_hat[1]],
                   [r_hat[2], 0, -r_hat[0]],
                   [-r_hat[1], r_hat[0], 0]])
    R = np.zeros((12, 12))
    A11 = mf[0] * (X11A * sq + Y11A * sh)
    A12 = mf[0] * (X12A * sq + Y12A * sh)
    C11 = mf[2] * (X11C * sq + Y11C * sh)
    C12 = mf[2] * (X12C * sq + Y12C * sh)
    B11 = mf[1] * Y11B * cx
    B12 = mf[1] * Y12B * cx
    R[0:3, 0:3] = A11
    R[0:3, 3:6] = -B11
    R[0:3, 6:9] = A12
    R[0:3, 9:12] = B12
    R[3:6, 0:3] = B11
    R[3:6, 3:6] = C11
    R[3:6, 6:9] = B12
    R[3:6, 9:12] = C12
    R[6:9, 0:3] = A12
    R[6:9, 3:6] = -B12
    R[6:9, 6:9] = A11
    R[6:9, 9:12] = B11
    R[9:12, 0:3] = -B12
    R[9:12, 3:6] = C12
    R[9:12, 6:9] = -B11
    R[9:12, 9:12] = C11
    return R


def test_pair_matrix_assembly_matches_independent_numpy():
    rng = np.random.default_rng(0)
    s11 = rng.normal(size=5)
    s12 = rng.normal(size=5)
    r_hat = rng.normal(size=3)
    r_hat /= np.linalg.norm(r_hat)
    mf = (1.3, 2.1, 0.7)
    ours = np.asarray(lub._pair_matrix(jnp.asarray(s11), jnp.asarray(s12),
                                       jnp.asarray(r_hat), mf))
    assert np.allclose(ours, _np_pair_matrix(s11, s12, r_hat, mf), atol=1e-13)


def test_interp_hits_table_nodes():
    sol = _solver(2)
    x = TABLES.jo_x[100]
    vals = np.asarray(lub._interp_scalars(TABLES.jo_x, TABLES.jo_11,
                                          jnp.asarray([x])))
    assert np.allclose(vals[0], TABLES.jo_11[100], atol=1e-12)


def test_delta_r_symmetric_and_psd_near_contact():
    """Delta_R for a close pair near the wall: symmetric and (nearly)
    positive semidefinite — required for the Cholesky/Lanczos noise."""
    sol = _solver(2)
    pos = jnp.asarray([[0.0, 0.0, 1.2], [2.15, 0.0, 1.2]])
    blocks = lub.compute_delta_r_blocks(sol, pos)
    # materialize dense 12x12
    n = 12
    cols = []
    for j in range(n):
        e = jnp.zeros(n).at[j].set(1.0)
        cols.append(np.asarray(lub.delta_r_mult(blocks, e)))
    DR = np.stack(cols, axis=1)
    assert np.allclose(DR, DR.T, atol=1e-9)
    eigs = np.linalg.eigvalsh(DR)
    assert eigs.min() > -1e-8 * max(1.0, eigs.max())


def test_delta_r_vanishes_far_apart():
    sol = _solver(2)
    pos = jnp.asarray([[0.0, 0.0, 20.0], [30.0, 0.0, 20.0]])
    blocks = lub.compute_delta_r_blocks(sol, pos)
    v = jnp.ones(12)
    assert np.allclose(np.asarray(lub.delta_r_mult(blocks, v)), 0.0,
                       atol=1e-10)


def test_squeeze_resistance_diverges_near_contact():
    """Leading lubrication singularity: X11A resistance ~ 1/(4 eps) between
    equal spheres (gap eps)."""
    sol = _solver(2, debye_cut=1e-6)
    mf = sol.mob_factor
    for eps in (1e-2, 1e-3):
        R = np.asarray(lub.pair_resistance_sup(
            jnp.asarray(2.0 + eps), jnp.asarray([1.0, 0.0, 0.0]), mf,
            TABLES, sol.debye_cut))
        x11a = R[0, 0] / mf[0]
        assert abs(x11a - 0.25 / eps) / (0.25 / eps) < 0.2


def test_lub_solve_reduces_to_mobility_when_far():
    """With Delta_R ~ 0, the solve returns M Xm + X exactly."""
    sol = _solver(3, kT=0.0)
    rng = np.random.default_rng(1)
    pos = jnp.asarray([[0.0, 0.0, 30.0], [15.0, 0.0, 30.0],
                       [0.0, 15.0, 30.0]])
    blocks = lub.compute_delta_r_blocks(sol, pos)
    Xm = jnp.asarray(rng.normal(size=18))
    U, its = lub.lub_solve(sol, pos, blocks, Xm=Xm)
    expected = lub.wall_mobility_mult(sol, pos, Xm)
    assert np.allclose(np.asarray(U), np.asarray(expected), atol=1e-8)


def test_lubrication_slows_approaching_spheres():
    """Two spheres pushed together approach slower with the lubrication
    correction than with plain RPY."""
    sol = _solver(2, kT=0.0)
    pos = jnp.asarray([[0.0, 0.0, 8.0], [2.3, 0.0, 8.0]])
    blocks = lub.compute_delta_r_blocks(sol, pos)
    # push them together along x
    FT = jnp.zeros((2, 6)).at[0, 0].set(1.0).at[1, 0].set(-1.0).reshape(-1)
    U_lub, _ = lub.lub_solve(sol, pos, blocks, Xm=FT)
    U_rpy = lub.wall_mobility_mult(sol, pos, FT)
    rel_lub = float(U_lub[0] - U_lub[6])
    rel_rpy = float(U_rpy[0] - U_rpy[6])
    assert 0 < rel_lub < rel_rpy


def test_em_and_trap_steps_finite():
    sol = _solver(4, kT=0.05, dt=1e-3)
    rng = np.random.default_rng(2)
    pos = jnp.asarray(np.stack([rng.uniform(0, 6, 4), rng.uniform(0, 6, 4),
                                rng.uniform(1.2, 2.0, 4)], axis=1))
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (4, 1))

    def ft_calc(p):
        ft = jnp.zeros((4, 6))
        return ft.at[:, 2].set(-0.5)  # gravity

    p1, q1, aux = lub.step_euler_maruyama(sol, pos, quats, jax.random.PRNGKey(0),
                                          ft_calc)
    assert np.all(np.isfinite(np.asarray(p1)))
    p2, q2, aux2 = lub.step_trapezoidal(sol, pos, quats, jax.random.PRNGKey(1),
                                        ft_calc)
    assert np.all(np.isfinite(np.asarray(p2)))
    assert int(aux2.det_iterations) > 0
    assert int(aux2.stoch_iterations) > 0
    # sedimentation downward on average
    assert np.mean(np.asarray(p2)[:, 2]) < np.mean(np.asarray(pos)[:, 2])
