import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.models import kinematics as kin
from rigidmultiblobswall_tpu.models import saddle, solvers
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state
from rigidmultiblobswall_tpu.ops import mobility as mob


def _shell_vertices(n=12, radius=0.5):
    """Fibonacci sphere shell."""
    i = np.arange(n) + 0.5
    phi = np.arccos(1 - 2 * i / n)
    theta = np.pi * (1 + 5**0.5) * i
    return radius * np.stack([np.cos(theta) * np.sin(phi),
                              np.sin(theta) * np.sin(phi),
                              np.cos(phi)], axis=1)


def _sphere_system(count=2, blob_radius=0.15, domain="single_wall", seed=0):
    rng = np.random.default_rng(seed)
    ref = _shell_vertices(12, 0.5)
    t = BodyType(name="shell", ref_config=ref, count=count)
    system = System(types=(t,), eta=1.0, blob_radius=blob_radius,
                    domain=domain, g=1.0, repulsion_strength_wall=1.0,
                    debye_length_wall=0.5)
    pos = rng.uniform(-2, 2, (count, 3))
    pos[:, 2] = rng.uniform(1.0, 2.5, count)
    quat = rng.normal(size=(count, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    return system, make_state(pos, quat)


def _dense_saddle(system, state):
    """Dense saddle matrix [[M, -K], [-K^T, 0]] for verification."""
    M = np.asarray(solvers.dense_blob_mobility(system, state))
    K = np.asarray(solvers._dense_K(system, state))
    n3, b6 = M.shape[0], K.shape[1]
    S = np.zeros((n3 + b6, n3 + b6))
    S[:n3, :n3] = M
    S[:n3, n3:] = -K
    S[n3:, :n3] = -K.T
    return S


def test_linear_operator_matches_dense_saddle():
    system, state = _sphere_system()
    op = saddle.make_linear_operator(system, state)
    S = _dense_saddle(system, state)
    rng = np.random.default_rng(1)
    v = rng.normal(size=S.shape[0])
    ours = np.asarray(op(jnp.asarray(v)))
    assert np.allclose(ours, S @ v, atol=1e-11)


def test_block_diag_pc_exact_for_single_body():
    """For one isolated body the preconditioner IS the saddle inverse."""
    system, state = _sphere_system(count=1)
    pc = saddle.build_block_diag_pc(system, state)
    S = _dense_saddle(system, state)
    rng = np.random.default_rng(2)
    v = rng.normal(size=S.shape[0])
    x = np.asarray(saddle.apply_block_diag_pc(system, pc, jnp.asarray(v)))
    # S x should reproduce v on the blob rows and body rows
    assert np.allclose(S @ x, v, atol=1e-9)


def test_mobility_solve_matches_dense_solution():
    system, state = _sphere_system(count=3, seed=3)
    sol = solvers.solve_mobility_problem(system, state)
    assert bool(sol.residual_norm < 1e-6)

    # dense solve
    r_blobs = kin.blob_positions(system, state)
    rhs = np.asarray(solvers.build_rhs(system, state, r_blobs))
    S = _dense_saddle(system, state)
    x = np.linalg.solve(S, rhs)
    U_dense = x[3 * system.num_blobs:].reshape(-1, 6)
    assert np.allclose(np.asarray(sol.velocities), U_dense, atol=1e-6)
    lam_dense = x[:3 * system.num_blobs].reshape(-1, 3)
    assert np.allclose(np.asarray(sol.lam), lam_dense, atol=1e-6)


def test_pc_reduces_iterations():
    system, state = _sphere_system(count=4, seed=4)
    r_blobs = kin.blob_positions(system, state)
    rhs = solvers.build_rhs(system, state, r_blobs)
    from rigidmultiblobswall_tpu.ops.gmres import gmres

    op = saddle.make_linear_operator(system, state, r_blobs)
    rhs_unit = rhs / jnp.linalg.norm(rhs)
    plain = gmres(op, rhs_unit, tol=1e-8, restart=60, maxiter=500)
    pc = saddle.build_block_diag_pc(system, state)
    precond = gmres(op, rhs_unit, tol=1e-8, restart=60, maxiter=500,
                    M=lambda v: saddle.apply_block_diag_pc(system, pc, v))
    assert bool(precond.converged)
    assert int(precond.iterations) < int(plain.iterations)


def test_body_mobility_spd_and_matches_reference_formula():
    system, state = _sphere_system(count=1, seed=5)
    N = np.asarray(solvers.solve_body_mobility(system, state))
    assert np.allclose(N, N.T, atol=1e-11)
    assert np.linalg.eigvalsh(N).min() > 0
    # reference formula: pinv(K^T M^{-1} K) (body/body.py:194-205)
    M = np.asarray(solvers.dense_blob_mobility(system, state))
    K = np.asarray(solvers._dense_K(system, state))
    ref = np.linalg.pinv(K.T @ np.linalg.inv(M) @ K)
    assert np.allclose(N, ref, atol=1e-9)


def test_resistance_roundtrip():
    """resistance(mobility(F)) == F for an isolated body."""
    system, state = _sphere_system(count=2, seed=6)
    rng = np.random.default_rng(7)
    FT = rng.normal(size=(2, 6))
    zero_slip = jnp.zeros((system.num_blobs, 3))
    sol = solvers.solve_mobility_problem(system, state,
                                         slip=zero_slip,
                                         force_torque=jnp.asarray(FT),
                                         tol=1e-12)
    # saddle rows give K^T lambda = FT, and resistance recomputes exactly
    # F = K^T M^{-1} K U = K^T lambda
    FT_back = solvers.solve_resistance(system, state, sol.velocities,
                                       slip=zero_slip)
    assert np.allclose(np.asarray(FT_back), FT, atol=1e-6)


def test_in_plane_domain_solvable():
    """in_plane mobility is singular in z; the PC must fall back to the
    single-wall factorization and the solve stays finite with v_z ~ 0."""
    system, state = _sphere_system(count=2, seed=8)
    system = System(types=system.types, eta=system.eta,
                    blob_radius=system.blob_radius, domain="in_plane", g=1.0)
    sol = solvers.solve_mobility_problem(system, state)
    v = np.asarray(sol.velocities)
    assert np.all(np.isfinite(v))
    assert np.allclose(v[:, 2], 0.0, atol=1e-7)


def test_prescribed_kinematics_obstacle():
    """An obstacle with prescribed zero velocity stays put and the solve
    returns its prescribed velocity."""
    ref = _shell_vertices(12, 0.5)
    free_t = BodyType(name="free", ref_config=ref, count=1)
    obs_t = BodyType(name="wallpart", ref_config=ref, count=1,
                     prescribed_kinematics=True)
    system = System(types=(free_t, obs_t), eta=1.0, blob_radius=0.15,
                    domain="single_wall", g=1.0)
    pos = np.array([[0.0, 0.0, 1.5], [1.8, 0.0, 1.5]])
    quat = np.tile(np.array([1.0, 0, 0, 0]), (2, 1))
    state = make_state(pos, quat)
    sol = solvers.solve_mobility_problem(system, state)
    assert np.allclose(np.asarray(sol.velocities)[1], 0.0, atol=1e-10)
    # the free body must feel the obstacle: compare against obstacle-free
    system_free = System(types=(free_t,), eta=1.0, blob_radius=0.15,
                         domain="single_wall", g=1.0)
    state_free = make_state(pos[:1], quat[:1])
    sol_free = solvers.solve_mobility_problem(system_free, state_free)
    assert not np.allclose(np.asarray(sol.velocities)[0],
                           np.asarray(sol_free.velocities)[0], atol=1e-8)


def test_auto_spectral_capacities_reaches_zero_drops():
    """Clumped configurations can overflow the auto capacity heuristics;
    auto_spectral_capacities must grow them to a drop-free plan (and
    be a no-op for other domains)."""
    import dataclasses

    from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state

    rng = np.random.default_rng(5)
    # 5 tightly-clumped 8-blob bodies: whole bodies land in single cells
    t = BodyType(name="c", ref_config=rng.normal(size=(8, 3)) * 0.05,
                 count=5)
    L = 20.0
    system = System(types=(t,), eta=1.0, blob_radius=0.1, kT=0.0,
                    domain="periodic_spectral", periodic_length=(L, L, L),
                    spectral_tol=1e-3, spectral_grid_max=64,
                    spectral_bucket_capacity=8, spectral_cell_capacity=8)
    pos = np.full((5, 3), L / 2) + rng.uniform(-0.3, 0.3, size=(5, 3))
    quat = np.tile([1.0, 0, 0, 0], (5, 1))
    state = make_state(pos, quat)

    grown = saddle.auto_spectral_capacities(system, state)
    r = kin.blob_positions(grown, state)
    plan = saddle.maybe_dense_mobility(grown, r)
    assert int(plan.n_dropped) == 0 and int(plan.n_dropped_cells) == 0
    # undersized start really was dropping (the test is not vacuous)
    plan0 = saddle.maybe_dense_mobility(system, kin.blob_positions(system, state))
    assert int(plan0.n_dropped) > 0 or int(plan0.n_dropped_cells) > 0

    sw = dataclasses.replace(system, domain="single_wall",
                             periodic_length=(0.0, 0.0, 0.0))
    assert saddle.auto_spectral_capacities(sw, state) is sw


def test_collinear_rod_preconditioner_finite():
    """A straight rod of collinear blobs cannot resolve spin about its
    own axis: K^T M^{-1} K is rank-5 and the per-body mobility MUST use
    the reference's pinv (body.py:194). The batched-inverse fast path is
    only valid for non-collinear bodies (regression: NaN preconditioner
    for Cylinder_N_14-style structures)."""
    import jax

    from rigidmultiblobswall_tpu.models import saddle, solvers

    n = 8
    rod = np.stack([np.linspace(-1.0, 1.0, n),
                    np.zeros(n), np.zeros(n)], axis=1)
    t = BodyType(name="rod", ref_config=rod, count=2)
    system = System(types=(t,), eta=1.0, blob_radius=0.2,
                    domain="single_wall", solver_tolerance=1e-10)
    state = make_state([[0.0, 0.0, 1.5], [0.0, 2.5, 1.5]],
                       [[1.0, 0, 0, 0], [1.0, 0, 0, 0]])
    pc = saddle.build_block_diag_pc(system, state)
    for leaf in jax.tree.leaves(pc):
        assert bool(jnp.all(jnp.isfinite(leaf))), "non-finite PC factor"
    sol = solvers.solve_mobility_problem(
        system, state, force_torque=jnp.tile(
            jnp.asarray([0.0, 0, -1.0, 0, 0, 0]), (2, 1)))
    v = np.asarray(sol.velocities)
    assert np.all(np.isfinite(v))
    assert bool(np.asarray(sol.converged))
    assert np.all(v[:, 2] < 0)     # rods sediment downward
