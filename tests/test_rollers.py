import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.models import rollers


def _suspension(n, **kw):
    defaults = dict(num_rollers=n, eta=0.9, blob_radius=0.3, g=1.0,
                    repulsion_strength_wall=1.0, debye_length_wall=0.3,
                    repulsion_strength=0.5, debye_length=0.3)
    defaults.update(kw)
    return rollers.RollerSuspension(**defaults)


def _positions(n, seed=0, zlo=1.5, zhi=3.0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(-3, 3, (n, 3))
    r[:, 2] = rng.uniform(zlo, zhi, n)
    return jnp.asarray(r)


def test_single_roller_hydro_equals_closed_form():
    """For one isolated roller the pairwise kernels reduce exactly to the
    Swan-Brady closed-form self mobilities used by the uncorrelated path."""
    sus_h = _suspension(1, free_kinematics=False,
                        omega_one_roller=(0.0, 2.0, 0.5),
                        hydro_interactions=True)
    sus_u = _suspension(1, free_kinematics=False,
                        omega_one_roller=(0.0, 2.0, 0.5),
                        hydro_interactions=False)
    r = jnp.asarray([[0.0, 0.0, 0.7]])
    v_h, t_h, _ = rollers.deterministic_velocity_and_torque(sus_h, r)
    v_u, t_u, _ = rollers.deterministic_velocity_and_torque(sus_u, r)
    assert np.allclose(np.asarray(t_h), np.asarray(t_u), rtol=1e-8)
    assert np.allclose(np.asarray(v_h), np.asarray(v_u), rtol=1e-8)


def test_roller_with_prescribed_omega_translates():
    """A roller spinning about y near a wall must translate in +x
    (the microroller propulsion mechanism)."""
    sus = _suspension(1, g=0.0, repulsion_strength=0.0,
                      repulsion_strength_wall=0.0, free_kinematics=False,
                      omega_one_roller=(0.0, 1.0, 0.0))
    r = jnp.asarray([[0.0, 0.0, 0.5]])
    v, t, _ = rollers.deterministic_velocity_and_torque(sus, r)
    assert float(v[0, 0]) > 0
    assert abs(float(v[0, 1])) < 1e-12
    # torque about y must be positive to sustain the rotation
    assert float(t[0, 1]) > 0


def test_torque_solve_satisfies_omega_constraint():
    """After the M_rr T = omega - M_rt F solve, the resulting angular
    velocity equals the prescribed omega."""
    from rigidmultiblobswall_tpu.ops import mobility as mob

    sus = _suspension(5, free_kinematics=False,
                      omega_one_roller=(0.3, 1.0, 0.0),
                      solver_tolerance=1e-12)
    r = _positions(5, seed=1)
    v, t, iters = rollers.deterministic_velocity_and_torque(sus, r)
    force = rollers.roller_forces(sus, r)
    w = mob.mobility_rot_times_force(r, force, sus.eta, sus.blob_radius,
                                     **sus.mobility_kwargs)
    w = w + mob.mobility_rot_times_torque(r, t, sus.eta, sus.blob_radius,
                                          **sus.mobility_kwargs)
    assert np.allclose(np.asarray(w),
                       np.tile([0.3, 1.0, 0.0], (5, 1)), atol=1e-8)
    assert int(iters) > 0


@pytest.mark.parametrize("scheme", ["stochastic_adams_bashforth_rollers",
                                    "stochastic_first_order_rollers",
                                    "stochastic_EM_rollers",
                                    "stochastic_mid_point_rollers",
                                    "stochastic_mid_point_version_2_rollers",
                                    "stochastic_trapezoidal_rollers",
                                    "stochastic_GDC_rollers"])
@pytest.mark.parametrize("hydro", [True, False])
def test_stochastic_schemes_finite_and_above_wall(scheme, hydro):
    sus = _suspension(6, kT=0.2, free_kinematics=True,
                      hydro_interactions=hydro)
    r = _positions(6, seed=2, zlo=0.6, zhi=1.5)
    step = rollers.make_stepper(sus, scheme, 1e-3)
    carry = rollers.init_carry(sus)
    r1, carry, aux = step(r, jax.random.PRNGKey(0), carry)
    assert np.all(np.isfinite(np.asarray(r1)))
    assert float(jnp.min(r1[:, 2])) >= 0.0


def test_constrained_omega_stochastic():
    sus = _suspension(4, kT=0.1, free_kinematics=False,
                      omega_one_roller=(0.0, 3.0, 0.0),
                      hydro_interactions=True)
    r = _positions(4, seed=3, zlo=0.6, zhi=1.2)
    step = rollers.make_stepper(sus, "stochastic_adams_bashforth_rollers", 1e-3)
    carry = rollers.init_carry(sus)
    r1, carry, aux = step(r, jax.random.PRNGKey(1), carry)
    assert np.all(np.isfinite(np.asarray(r1)))
    assert int(aux.stoch_iterations) > 0
    # collective microroller motion: mean x-velocity positive
    assert float(jnp.mean(aux.velocities[:, 0])) > 0


def test_adams_bashforth_uses_history():
    sus = _suspension(3, kT=0.0)
    r = _positions(3, seed=4)
    step = rollers.make_stepper(sus, "deterministic_adams_bashforth_rollers",
                                1e-3)
    carry = rollers.init_carry(sus)
    r1, carry, aux1 = step(r, jax.random.PRNGKey(0), carry)
    r2, carry, aux2 = step(r1, jax.random.PRNGKey(0), carry)
    v2, _, _ = rollers.deterministic_velocity_and_torque(sus, r1)
    expected = r1 + 1e-3 * (1.5 * v2 - 0.5 * aux1.velocities)
    assert np.allclose(np.asarray(r2), np.asarray(expected), atol=1e-12)


def test_simulate_scan():
    sus = _suspension(4, kT=0.05)
    r = _positions(4, seed=5)
    rf, traj, aux = rollers.simulate(
        sus, r, jax.random.PRNGKey(2),
        scheme="stochastic_adams_bashforth_rollers", dt=1e-3, n_steps=4,
        save_every=2)
    assert traj.shape == (2, 4, 3)
    assert np.all(np.isfinite(np.asarray(rf)))


def test_uncorrelated_brownian_msd():
    """Uncorrelated free rollers far from the wall: MSD over one step
    matches 2 mu kT dt per dimension (weak statistical test)."""
    sus = _suspension(200, kT=0.4, g=0.0, repulsion_strength=0.0,
                      repulsion_strength_wall=0.0, hydro_interactions=False,
                      domain="no_wall")
    rng = np.random.default_rng(6)
    r = jnp.asarray(rng.uniform(0, 100, (200, 3)) + [[0, 0, 1e5]])
    dt = 1e-2
    step = rollers.make_stepper(sus, "stochastic_first_order_rollers", dt)
    carry = rollers.init_carry(sus)
    r1, _, _ = step(r, jax.random.PRNGKey(3), carry)
    disp = np.asarray(r1 - r)
    mu = 1.0 / (6 * np.pi * sus.eta * sus.blob_radius)
    expected_var = 2 * mu * sus.kT * dt
    measured = disp.var()
    assert abs(measured - expected_var) / expected_var < 0.25


def test_det_stoch_lockstep_matches_separate_solves():
    """The fused constrained-omega update (one lockstep M_rr Krylov loop
    + shared M_tr sweep) reproduces deterministic_velocity_and_torque +
    stochastic_velocity exactly (same key split, same systems)."""
    n = 10
    sus = _suspension(n, kT=0.2, free_kinematics=False,
                      omega_one_roller=(0.0, 4.0, 0.0),
                      solver_tolerance=1e-12)
    r = _positions(n, seed=3)
    key = jax.random.PRNGKey(7)

    v_ref, t_ref, it_ref = rollers.deterministic_velocity_and_torque(sus, r)
    vs_ref, itl_ref, itg_ref = rollers.stochastic_velocity(sus, r, key, 1e-3)

    v, t, vs, it, it_l = rollers.det_stoch_velocity_lockstep(
        sus, r, key, 1e-3)
    scale_v = float(jnp.max(jnp.abs(v_ref)))
    scale_t = float(jnp.max(jnp.abs(t_ref)))
    assert float(jnp.max(jnp.abs(v - v_ref))) < 1e-8 * scale_v
    assert float(jnp.max(jnp.abs(t - t_ref))) < 1e-8 * scale_t
    assert float(jnp.max(jnp.abs(vs - vs_ref))) < 1e-8 * max(
        float(jnp.max(jnp.abs(vs_ref))), scale_v)
    assert int(it_l) == int(itl_ref)
