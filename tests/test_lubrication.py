import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.models import lubrication as lub

# packaged tables ship with the framework; RMB_TPU_LUB_TABLES overrides
TABLES = lub.LubricationTables.load()


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


# ---------------------------------------------------------------------------
# Round 2: neighbor-list blocks, preconditioner, Torque_from_Omega
# ---------------------------------------------------------------------------


def _cluster_positions(n, seed=5, spacing=2.05, z0=1.05):
    """Near-contact grid above the wall: lubrication-stiff configuration."""
    rng = np.random.default_rng(seed)
    side = int(np.ceil(n ** 0.5))
    idx = np.arange(n)
    pos = np.stack([(idx % side) * spacing, (idx // side) * spacing,
                    np.full(n, z0)], axis=1)
    pos += rng.uniform(-0.01, 0.01, (n, 3))
    pos[:, 2] = np.maximum(pos[:, 2], 1.01)
    return jnp.asarray(pos)


def test_sparse_blocks_match_dense():
    """Neighbor-list Delta_R must reproduce the dense-masked apply."""
    n = 40
    pos = _cluster_positions(n, spacing=2.2)
    sol_d = _solver(n)
    sol_s = _solver(n, max_neighbors=12)
    bd = lub.compute_delta_r_blocks(sol_d, pos)
    bs = lub.compute_delta_r_sparse(sol_s, pos)
    assert int(bs.overflow) == 0
    x = jnp.asarray(np.random.default_rng(3).normal(size=6 * n))
    yd = np.asarray(lub.delta_r_mult(bd, x))
    ys = np.asarray(lub.delta_r_mult(bs, x))
    assert np.allclose(ys, yd, atol=1e-10 * np.abs(yd).max())
    # sub-block product (rot rows, trans cols) matches too
    v = jnp.asarray(np.random.default_rng(4).normal(size=3 * n))
    sd = np.asarray(lub.delta_r_sub_mult(bd, v))
    ss = np.asarray(lub.delta_r_sub_mult(bs, v))
    assert np.allclose(ss, sd, atol=1e-10 * np.abs(sd).max())
    # diagonal R_Sup/R_MB factors match
    assert np.allclose(np.asarray(bs.diag_sup), np.asarray(bd.diag_sup),
                       atol=1e-10)
    assert np.allclose(np.asarray(bs.diag_mb), np.asarray(bd.diag_mb),
                       atol=1e-10)


def test_sparse_overflow_detected():
    n = 20
    pos = _cluster_positions(n, spacing=2.05)
    sol = _solver(n, max_neighbors=1)
    bs = lub.compute_delta_r_sparse(sol, pos)
    assert int(bs.overflow) > 0


def test_pc_solution_matches_and_cuts_iterations():
    """The block-diagonal R_Sup preconditioner must not change the
    solution and must cut GMRES iterations on a lubrication-stiff
    near-contact cluster (reference PC: Lub_Solver.py:541-588)."""
    n = 49
    pos = _cluster_positions(n, spacing=2.02, z0=1.02)
    rng = np.random.default_rng(9)
    FT = jnp.asarray(rng.normal(size=6 * n))
    sol_pc = _solver(n, solver_tolerance=1e-9)
    sol_no = _solver(n, solver_tolerance=1e-9, use_pc=False)
    blocks = lub.compute_delta_r_blocks(sol_pc, pos)
    u_pc, it_pc = lub.lub_solve(sol_pc, pos, blocks, Xm=FT)
    u_no, it_no = lub.lub_solve(sol_no, pos, blocks, Xm=FT)
    scale = np.abs(np.asarray(u_no)).max()
    assert np.allclose(np.asarray(u_pc), np.asarray(u_no),
                       atol=1e-6 * scale)
    assert int(it_pc) < int(it_no), (int(it_pc), int(it_no))


def test_torque_from_omega_constrains_rotation():
    """Injecting the solved torques must give angular velocity ~= omega
    for every body (Lub_Solver.py:890-1025)."""
    n = 16
    pos = _cluster_positions(n, spacing=2.5, z0=1.2)
    rng = np.random.default_rng(11)
    F = jnp.asarray(rng.normal(size=(n, 3)) * 0.5)
    sol = _solver(n, solver_tolerance=1e-10)
    blocks = lub.compute_delta_r_blocks(sol, pos)
    om = 0.7
    T, vo_guess, its = lub.torque_from_omega(sol, pos, blocks, om, F)
    FT = jnp.concatenate([F, T], axis=1).reshape(-1)
    U, _ = lub.lub_solve(sol, pos, blocks, Xm=FT, x0=jnp.asarray(vo_guess))
    W = np.asarray(U).reshape(n, 6)[:, 3:6]
    assert np.allclose(W, np.array([0.0, om, 0.0]), atol=1e-5)


def test_torque_cutoff_caps_norms():
    n = 9
    pos = _cluster_positions(n, spacing=2.05, z0=1.05)
    sol = _solver(n, solver_tolerance=1e-8)
    blocks = lub.compute_delta_r_blocks(sol, pos)
    F = jnp.zeros((n, 3))
    T_free, _, _ = lub.torque_from_omega(sol, pos, blocks, 1.0, F)
    cap = 0.5 * float(jnp.linalg.norm(T_free, axis=1).max())
    T_cut, _, _ = lub.torque_from_omega(sol, pos, blocks, 1.0, F,
                                        cut_torque=cap)
    assert float(jnp.linalg.norm(T_cut, axis=1).max()) <= cap * (1 + 1e-12)


def test_lub_solve_500_bodies_sparse():
    """>=500-body lubrication solve on the neighbor-list path with PC."""
    n = 512
    pos = _cluster_positions(n, spacing=2.1, z0=1.05)
    sol = _solver(n, max_neighbors=16, solver_tolerance=1e-6)
    blocks = lub.compute_delta_r_sparse(sol, pos)
    assert int(blocks.overflow) == 0
    rng = np.random.default_rng(13)
    FT = jnp.asarray(rng.normal(size=6 * n))
    U, its = lub.lub_solve(sol, pos, blocks, Xm=FT)
    assert np.all(np.isfinite(np.asarray(U)))
    assert 0 < int(its) < 200


def test_trapezoidal_with_omega_runs():
    """Prescribed-spin trapezoidal step (Uniform_Rollers mode)."""
    n = 12
    pos = _cluster_positions(n, spacing=2.4, z0=1.3)
    quats = jnp.tile(jnp.asarray([1.0, 0, 0, 0]), (n, 1))
    # kT=0: the deterministic rolling drift is tiny vs Brownian kicks
    sol = _solver(n, kT=0.0, dt=5e-4, solver_tolerance=1e-7)

    def ft_calc(p):
        ft = jnp.zeros((n, 6), p.dtype)
        return ft.at[:, 2].set(-0.1)

    pos2, q2, aux = lub.step_trapezoidal(
        sol, pos, quats, jax.random.PRNGKey(0), ft_calc,
        omega=1.0, cut_torque=50.0)
    assert np.all(np.isfinite(np.asarray(pos2)))
    assert int(aux.rejections_wall) == 0
    # bodies near a wall spinning about +y must roll in +x on average
    dx = np.asarray(pos2[:, 0] - pos[:, 0]).mean()
    assert dx > 0
