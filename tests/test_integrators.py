import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.models import integrators, kinematics as kin, solvers
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state
from tests.test_saddle import _shell_vertices, _sphere_system


def _step(system, state, scheme, dt, key=None, **kw):
    step = integrators.make_stepper(system, scheme, dt, **kw)
    carry = integrators.init_carry(system)
    key = key if key is not None else jax.random.PRNGKey(0)
    return step(state, key, carry)


def test_forward_euler_matches_manual_update():
    system, state = _sphere_system(count=2, seed=10)
    dt = 1e-3
    sol = solvers.solve_mobility_problem(system, state)
    expected = kin.advance(state, sol.velocities, dt)
    new_state, carry, aux = _step(system, state, "deterministic_forward_euler", dt)
    assert np.allclose(np.asarray(new_state.pos), np.asarray(expected.pos),
                       atol=1e-12)
    assert np.allclose(np.asarray(new_state.quat), np.asarray(expected.quat),
                       atol=1e-12)
    assert int(aux.rejections) == 0
    assert int(aux.det_iterations) > 0


def test_solves_converged_flag_surfaces_gmres_state():
    """StepAux.solves_converged threads the GmresResult.converged flag up
    through MobilitySolution: True at a reachable tolerance, False when
    the iteration budget cannot reach it (VERDICT weak #7: a silently
    non-converged solve must be distinguishable)."""
    system, state = _sphere_system(count=4, seed=3)
    step = integrators.make_stepper(system, "deterministic_forward_euler",
                                    1e-3)
    _, _, aux = step(state, jax.random.PRNGKey(0),
                     integrators.init_carry(system))
    assert bool(np.asarray(aux.solves_converged))

    import dataclasses
    tight = dataclasses.replace(system, solver_tolerance=1e-30)
    step2 = integrators.make_stepper(tight, "deterministic_forward_euler",
                                     1e-3, gmres_maxiter=3, gmres_restart=3)
    _, _, aux2 = step2(state, jax.random.PRNGKey(0),
                       integrators.init_carry(tight))
    assert not bool(np.asarray(aux2.solves_converged))


def test_auto_force_cell_capacity_grows_to_occupancy():
    """The startup capacity sizing covers the densest cell (overflow
    silently weakens the repulsion, ops/forces.py)."""
    import dataclasses

    from rigidmultiblobswall_tpu.ops import forces as force_ops

    system, state = _sphere_system(count=2, seed=0)
    L = 40.0
    sys_nl = dataclasses.replace(
        system, blob_blob_force_method="neighbor_list",
        periodic_length=(L, L, L), domain="no_wall",
        blob_blob_cutoff=2.0, blob_blob_grid_dim=16,
        blob_blob_cell_capacity=8)
    # clump many blobs into one cell
    rng = np.random.default_rng(0)
    pos = jnp.asarray(rng.uniform(0.2, 1.0, size=(100, 3)))
    sized = force_ops.auto_force_cell_capacity(sys_nl, pos)
    assert sized.blob_blob_cell_capacity >= 100
    # non-neighbor-list systems pass through untouched
    assert force_ops.auto_force_cell_capacity(system, pos) is system


def test_capacity_overflows_surface_force_cell_drops():
    """StepAux.capacity_overflows counts linked-cell force overflow at
    the step's configuration EVERY step (a dropped blob silently loses
    repulsion; the t=0 auto-sizing cannot see mid-run density growth)."""
    import dataclasses

    system, state = _sphere_system(count=8, seed=2)
    L = 40.0
    sys_nl = dataclasses.replace(
        system, domain="no_wall", periodic_length=(L, L, L),
        blob_blob_force_method="neighbor_list", repulsion_strength=0.1,
        debye_length=0.2, blob_blob_cutoff=4.0, blob_blob_grid_dim=10,
        blob_blob_cell_capacity=8)
    # clump every body into one force cell: 8 bodies x several blobs
    # far exceed capacity 8
    state = state._replace(pos=jnp.asarray(
        np.random.default_rng(0).uniform(1.0, 3.0, (8, 3))))
    step = integrators.make_stepper(sys_nl, "deterministic_forward_euler",
                                    1e-4)
    _, _, aux = step(state, jax.random.PRNGKey(0),
                     integrators.init_carry(sys_nl))
    assert int(np.asarray(aux.capacity_overflows)) > 0
    # roomy capacity -> no overflow reported
    sys_ok = dataclasses.replace(sys_nl, blob_blob_cell_capacity=256)
    _, _, aux2 = step_ok = integrators.make_stepper(
        sys_ok, "deterministic_forward_euler", 1e-4)(
        state, jax.random.PRNGKey(0), integrators.init_carry(sys_ok))
    assert int(np.asarray(aux2.capacity_overflows)) == 0


def test_adams_bashforth_second_step_uses_history():
    system, state = _sphere_system(count=1, seed=11)
    dt = 1e-3
    step = jax.jit(integrators.make_stepper(
        system, "deterministic_adams_bashforth", dt))
    carry = integrators.init_carry(system)
    key = jax.random.PRNGKey(0)
    s1, carry, aux1 = step(state, key, carry)
    s2, carry, aux2 = step(s1, key, carry)
    # manual AB2 second step
    v2 = solvers.solve_mobility_problem(system, s1).velocities
    v_ab = 1.5 * v2 - 0.5 * aux1.velocities
    expected = kin.advance(s1, v_ab, dt)
    assert np.allclose(np.asarray(s2.pos), np.asarray(expected.pos), atol=1e-10)


def test_sedimentation_moves_down_slower_near_wall():
    """A sphere sedimenting under gravity near a wall falls slower than in
    bulk (basic physics regression)."""
    ref = _shell_vertices(12, 0.5)
    t = BodyType(name="shell", ref_config=ref, count=1)
    kwargs = dict(eta=1.0, blob_radius=0.15, g=1.0)
    sys_wall = System(types=(t,), domain="single_wall", **kwargs)
    sys_bulk = System(types=(t,), domain="no_wall", **kwargs)
    state = make_state(np.array([[0.0, 0.0, 0.8]]), np.array([[1.0, 0, 0, 0]]))
    v_wall = solvers.solve_mobility_problem(sys_wall, state).velocities
    v_bulk = solvers.solve_mobility_problem(sys_bulk, state).velocities
    assert float(v_wall[0, 2]) < 0
    assert float(v_bulk[0, 2]) < float(v_wall[0, 2]) < 0


def test_wall_rejection_retries_and_preserves_validity():
    """A large stochastic step near the wall triggers rejections but the
    accepted state stays valid."""
    ref = _shell_vertices(8, 0.3)
    t = BodyType(name="small", ref_config=ref, count=1)
    system = System(types=(t,), eta=1.0, blob_radius=0.1, kT=1.0, g=0.0,
                    domain="single_wall")
    state = make_state(np.array([[0.0, 0.0, 0.45]]), np.array([[1.0, 0, 0, 0]]))
    # big dt -> noise can push blobs through the wall
    new_state, carry, aux = _step(system, state, "stochastic_EM", dt=0.5,
                                  key=jax.random.PRNGKey(3))
    assert bool(kin.valid_configuration(system, new_state))


def test_dense_fe_matches_gmres_fe():
    system, state = _sphere_system(count=2, seed=20)
    s1, _, _ = _step(system, state, "deterministic_forward_euler", 1e-3,
                     tolerance=1e-12)
    s2, _, _ = _step(system, state, "deterministic_forward_euler_dense_algebra",
                     1e-3)
    assert np.allclose(np.asarray(s1.pos), np.asarray(s2.pos), atol=1e-9)
    assert np.allclose(np.asarray(s1.quat), np.asarray(s2.quat), atol=1e-9)


@pytest.mark.parametrize("scheme", ["stochastic_EM", "stochastic_Slip_Trapz",
                                    "stochastic_Slip_Mid_DLA",
                                    "stochastic_first_order_RFD",
                                    "stochastic_traction_EM",
                                    "stochastic_adams_bashforth",
                                    "stochastic_first_order_RFD_dense_algebra",
                                    "Fixman",
                                    "stochastic_GDC_RFD",
                                    "stochastic_Slip_Mid",
                                    "stochastic_traction_AB"])
def test_stochastic_schemes_step_is_finite(scheme):
    system, state = _sphere_system(count=2, seed=12)
    system = System(types=system.types, eta=system.eta,
                    blob_radius=system.blob_radius, kT=0.1, g=1.0,
                    domain="single_wall", repulsion_strength_wall=1.0,
                    debye_length_wall=0.5)
    new_state, carry, aux = _step(system, state, scheme, dt=1e-3,
                                  key=jax.random.PRNGKey(1))
    assert np.all(np.isfinite(np.asarray(new_state.pos)))
    assert np.all(np.isfinite(np.asarray(new_state.quat)))
    assert np.allclose(np.linalg.norm(np.asarray(new_state.quat), axis=1),
                       1.0, atol=1e-9)
    if "dense" not in scheme and "DLA" not in scheme and scheme != "Fixman":
        assert int(aux.stoch_iterations) > 0  # Lanczos ran


def test_em_velocity_covariance():
    """Weak test of fluctuation-dissipation: Var[U] ~ 2 kT N / dt for a
    single body (EM scheme, no forces)."""
    ref = _shell_vertices(10, 0.4)
    t = BodyType(name="shell", ref_config=ref, count=1)
    system = System(types=(t,), eta=1.0, blob_radius=0.12, kT=0.5, g=0.0,
                    domain="no_wall")
    state = make_state(np.array([[0.0, 0.0, 5.0]]), np.array([[1.0, 0, 0, 0]]))
    dt = 1e-2

    N_body = np.asarray(solvers.solve_body_mobility(system, state))

    step = integrators.make_stepper(system, "stochastic_EM", dt,
                                    lanczos_tolerance=1e-9)
    carry = integrators.init_carry(system)

    @jax.jit
    def one(key):
        _, _, aux = step(state, key, carry)
        return aux.velocities

    keys = jax.random.split(jax.random.PRNGKey(42), 600)
    vels = np.asarray(jax.vmap(one)(keys)).reshape(600, 6)
    cov = np.cov(vels.T, bias=True)
    expected = 2 * system.kT / dt * N_body
    scale = np.abs(expected).max()
    assert np.allclose(cov, expected, atol=0.25 * scale)


def test_update_pc_caching_matches_fresh_pc():
    """update_PC=3: the cached preconditioner changes GMRES convergence
    only (not the solution): deterministic trajectories must agree."""
    system, state = _sphere_system(count=2, seed=21)
    dt = 1e-3
    step1 = jax.jit(integrators.make_stepper(
        system, "deterministic_forward_euler", dt, tolerance=1e-10))
    step3 = jax.jit(integrators.make_stepper(
        system, "deterministic_forward_euler", dt, tolerance=1e-10,
        update_PC=3))
    c1 = integrators.init_carry(system)
    c3 = integrators.init_carry_with_pc(system, state)
    s1 = s3 = state
    key = jax.random.PRNGKey(0)
    for i in range(4):
        s1, c1, _ = step1(s1, key, c1)
        s3, c3, aux3 = step3(s3, key, c3)
    assert np.allclose(np.asarray(s1.pos), np.asarray(s3.pos), atol=1e-7)
    assert np.allclose(np.asarray(s1.quat), np.asarray(s3.quat), atol=1e-7)


def test_scan_simulation_runs():
    system, state = _sphere_system(count=1, seed=13)
    system = System(types=system.types, eta=system.eta,
                    blob_radius=system.blob_radius, kT=0.05, g=1.0,
                    domain="single_wall", repulsion_strength_wall=1.0,
                    debye_length_wall=0.5)
    final, traj, aux = integrators.simulate(
        system, state, jax.random.PRNGKey(7), scheme="stochastic_EM",
        dt=1e-3, n_steps=4, save_every=2)
    assert traj.pos.shape == (2, 1, 3)
    assert np.all(np.isfinite(np.asarray(final.pos)))


def test_slip_mid_dla_matches_midpoint_at_zero_kT():
    """With kT=0 the DLA midpoint scheme must reproduce the matrix-free
    deterministic midpoint trajectory (stochastic_Slip_Mid_DLA,
    quaternion_integrator_multi_bodies.py:1346-1438)."""
    import dataclasses

    from tests.test_saddle import _sphere_system

    system, state = _sphere_system(count=3, seed=61)
    system = dataclasses.replace(system, kT=0.0, solver_tolerance=1e-12)
    key = jax.random.PRNGKey(0)
    s_dla, _, _ = _step(system, state, "stochastic_Slip_Mid_DLA", 1e-3,
                        key=key)
    s_mid, _, _ = _step(system, state, "deterministic_midpoint", 1e-3,
                        key=key)
    assert np.allclose(np.asarray(s_dla.pos), np.asarray(s_mid.pos),
                       atol=1e-9)
    assert np.allclose(np.asarray(s_dla.quat), np.asarray(s_mid.quat),
                       atol=1e-9)


def test_carried_spectral_plan_matches_fresh_plans():
    """Stepping with the cross-step carried spectral plan (init_carry
    given a state; each step refreshes via ewald.update_plan) matches
    per-step fresh plan builds to engine tolerance."""
    rng = np.random.default_rng(31)
    n_bodies = 6
    t = BodyType(name="b", ref_config=rng.normal(size=(4, 3)) * 0.15,
                 count=n_bodies)
    L = 12.0
    system = System(types=(t,), eta=1.0, blob_radius=0.1, kT=0.05, g=0.0,
                    domain="periodic_spectral", periodic_length=(L, L, L),
                    spectral_tol=1e-4, spectral_grid_max=64,
                    spectral_cell_capacity=32,
                    repulsion_strength=0.1, debye_length=0.2,
                    solver_tolerance=1e-8)
    pos = rng.uniform(1.0, L - 1.0, size=(n_bodies, 3))
    quat = rng.normal(size=(n_bodies, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    state = make_state(pos, quat)

    step = integrators.make_stepper(system, "stochastic_Slip_Trapz", 1e-3,
                                    lanczos_tolerance=1e-6,
                                    lanczos_max_iter=32)
    key = jax.random.PRNGKey(0)

    def run(carry0):
        s, c = state, carry0
        for i in range(3):
            s, c, aux = step(s, jax.random.PRNGKey(i), c)
        return s

    s_fresh = run(integrators.init_carry(system, dtype=state.pos.dtype))
    s_carry = run(integrators.init_carry(system, dtype=state.pos.dtype,
                                         state=state))
    scale = float(jnp.max(jnp.abs(s_fresh.pos)))
    err = float(jnp.max(jnp.abs(s_carry.pos - s_fresh.pos))) / scale
    # the carried plan's stale plane/slab assignments perturb the wave
    # part at the engine tolerance only
    assert np.all(np.isfinite(np.asarray(s_carry.pos)))
    assert err < 50 * system.spectral_tol, err
