"""Kirchhoff-rod fiber stack: operator oracles, solver exactness, and
physics regressions (reference: cRigid_cFibers/c_fibers_obj.cpp driven
by Many_Free_Fibers.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.models import fibers as fib


def _random_state(sus, seed=0, bend=0.3):
    """Random smoothly-bent unit-tangent state with a bishop frame."""
    rng = np.random.default_rng(seed)
    t = np.tile(np.array([0.0, 0.0, 1.0]), (sus.num_fibers,
                                            sus.num_links, 1))
    t += bend * rng.normal(size=t.shape)
    t /= np.linalg.norm(t, axis=-1, keepdims=True)
    t = jnp.asarray(t)
    u, v = fib.bishop_frame(t)
    x0 = jnp.asarray(rng.normal(size=(sus.num_fibers, 3)) + 3.0)
    return fib.FiberState(x0=x0, t=t, u=u, v=v)


def _sus(**kw):
    args = dict(num_fibers=3, num_links=8, ds=0.25, a=0.125, k_bend=1.0,
                eta=1.0, kT=0.0)
    args.update(kw)
    return fib.FiberSuspension(**args)


# ---------------------------------------------------------------------------
# Geometry and frames
# ---------------------------------------------------------------------------


def test_bishop_frame_orthonormal():
    sus = _sus()
    st = _random_state(sus)
    for a, b in [(st.t, st.u), (st.t, st.v), (st.u, st.v)]:
        np.testing.assert_allclose(np.sum(np.asarray(a * b), axis=-1), 0.0,
                                   atol=1e-12)
    for a in (st.t, st.u, st.v):
        np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=-1),
                                   1.0, atol=1e-12)
    # v = t x u
    np.testing.assert_allclose(np.asarray(jnp.cross(st.t, st.u)),
                               np.asarray(st.v), atol=1e-12)


def test_blob_positions_and_end_to_end():
    sus = _sus()
    st = fib.straight_fiber_state(sus, np.zeros(3), [0.0, 1.0, 0.0])
    pos = np.asarray(fib.blob_positions(sus, st))
    B = sus.num_blobs_per_fiber
    expect = np.zeros((B, 3))
    expect[:, 1] = sus.ds * np.arange(B)
    for f in range(sus.num_fibers):
        np.testing.assert_allclose(pos[f], expect, atol=1e-14)
    e2e = np.asarray(fib.end_to_end_distance(sus, st))
    np.testing.assert_allclose(e2e, sus.ds * sus.num_links, atol=1e-14)


# ---------------------------------------------------------------------------
# Elasticity
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("clamp", [False, True])
def test_bending_force_is_minus_grad_energy(clamp):
    """The stencil force equals -dE/dX of the discrete WLC energy,
    differentiated through X -> tangents (autodiff oracle)."""
    sus = _sus(clamp=clamp, t_fix=(0.0, 1.0, 0.0))
    st = _random_state(sus, seed=1)
    pos = fib.blob_positions(sus, st)

    def energy_of_positions(x):
        t = (x[:, 1:] - x[:, :-1]) / sus.ds
        return fib.bending_energy(sus, t)

    grad = jax.grad(energy_of_positions)(pos)
    force = fib.bending_force(sus, st.t)
    if clamp:
        # anchored blob: the stencil zeroes its row (reaction absorbs it)
        np.testing.assert_allclose(np.asarray(force[:, 0]), 0.0, atol=1e-12)
        np.testing.assert_allclose(np.asarray(force[:, 1:]),
                                   -np.asarray(grad[:, 1:]), atol=1e-10)
    else:
        np.testing.assert_allclose(np.asarray(force), -np.asarray(grad),
                                   atol=1e-10)
        # free fiber: zero net force
        np.testing.assert_allclose(
            np.asarray(jnp.sum(force, axis=1)), 0.0, atol=1e-10)


@pytest.mark.parametrize("clamp", [False, True])
def test_d4_matrix_oracle(clamp):
    """d4_matrix vs a loop-built oracle of the published stencil rows
    (free: row0 (1,-2,1), row1 (-2,5,-4,1), interior (1,-4,6,-4,1),
    mirrored ends; clamp: row0 zero, row1 (-3,6,-4,1))."""
    sus = _sus(clamp=clamp)
    B = sus.num_blobs_per_fiber
    s = np.zeros((B, B))
    for j in range(B):
        if j == 0:
            if not clamp:
                s[j, j:j + 3] = [1.0, -2.0, 1.0]
        elif j == 1:
            s[j, 0:4] = [-3.0, 6.0, -4.0, 1.0] if clamp \
                else [-2.0, 5.0, -4.0, 1.0]
        elif j == B - 2:
            s[j, j - 2:j + 2] = [1.0, -4.0, 5.0, -2.0]
        elif j == B - 1:
            s[j, j - 2:j + 1] = [1.0, -2.0, 1.0]
        else:
            s[j, j - 2:j + 3] = [1.0, -4.0, 6.0, -4.0, 1.0]
    np.testing.assert_allclose(np.asarray(fib.d4_matrix(sus)), s, atol=0)


# ---------------------------------------------------------------------------
# Kinematic operators
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("clamp", [False, True])
def test_kinv_is_left_inverse_of_k(clamp):
    sus = _sus(clamp=clamp)
    st = _random_state(sus, seed=2)
    rng = np.random.default_rng(3)
    om = jnp.asarray(rng.normal(size=(sus.num_fibers, sus.n_om)))
    vel = fib.apply_K(sus, om, st.u, st.v)
    om_back = fib.apply_Kinv(sus, vel, st.u, st.v)
    np.testing.assert_allclose(np.asarray(om_back), np.asarray(om),
                               atol=1e-10)


@pytest.mark.parametrize("clamp", [False, True])
def test_b_bt_adjoint(clamp):
    sus = _sus(clamp=clamp)
    st = _random_state(sus, seed=4)
    rng = np.random.default_rng(5)
    theta = jnp.asarray(rng.normal(size=(sus.num_fibers, sus.n_theta)))
    u = jnp.asarray(rng.normal(size=(sus.num_fibers,
                                     sus.num_blobs_per_fiber, 3)))
    lhs = jnp.sum(fib.apply_B(sus, theta, st.t) * u)
    rhs = jnp.sum(theta * fib.apply_BT(sus, u, st.t))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


@pytest.mark.parametrize("clamp", [False, True])
def test_dense_operators_match_applies(clamp):
    sus = _sus(clamp=clamp)
    st = _random_state(sus, seed=6)
    rng = np.random.default_rng(7)
    om = jnp.asarray(rng.normal(size=(sus.num_fibers, sus.n_om)))
    theta = jnp.asarray(rng.normal(size=(sus.num_fibers, sus.n_theta)))
    kd = fib.k_dense(sus, st.u, st.v)
    bd = fib.b_dense(sus, st.t)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("fin,fn->fi", kd, om)),
        np.asarray(fib.apply_K(sus, om, st.u, st.v)).reshape(
            sus.num_fibers, -1), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(jnp.einsum("fin,fn->fi", bd, theta)),
        np.asarray(fib.apply_B(sus, theta, st.t)).reshape(
            sus.num_fibers, -1), atol=1e-12)


# ---------------------------------------------------------------------------
# Linear solve
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("clamp", [False, True])
def test_batched_solve_is_exact(clamp):
    sus = _sus(clamp=clamp, hydrodynamics="batched")
    st = _random_state(sus, seed=8)
    rng = np.random.default_rng(9)
    rhs = jnp.asarray(rng.normal(size=(sus.num_fibers,
                                       sus.num_blobs_per_fiber, 3)))
    impl = 0.5 * 1e-3 * sus.k_bend / sus.ds**3
    om, theta, (its, resid, conv) = fib.solve_fiber_system(
        sus, impl, st, rhs)
    assert float(resid) < 1e-8
    assert bool(conv)
    # and the system-apply of the solution reproduces the rhs
    x = jnp.concatenate([om, theta], axis=1).reshape(-1)
    back = fib.apply_system(sus, impl, st, x).reshape(rhs.shape)
    np.testing.assert_allclose(np.asarray(back), np.asarray(rhs),
                               atol=1e-8)


def test_full_hydro_gmres_converges_fast():
    """With interfiber hydro the per-fiber dense PC still clusters the
    spectrum: well-separated fibers converge in a handful of
    iterations."""
    sus = _sus(num_fibers=4, hydrodynamics="full",
               solver_tolerance=1e-10)
    rng = np.random.default_rng(10)
    st = _random_state(sus, seed=10, bend=0.1)
    # spread the fibers out
    st = st._replace(x0=jnp.asarray(rng.normal(size=(4, 3)) * 10.0 + 20.0))
    rhs = jnp.asarray(rng.normal(size=(sus.num_fibers,
                                       sus.num_blobs_per_fiber, 3)))
    impl = 0.5 * 1e-3 * sus.k_bend / sus.ds**3
    om, theta, (its, resid, conv) = fib.solve_fiber_system(
        sus, impl, st, rhs)
    assert bool(conv)
    assert int(its) <= 12


def test_constraint_forces_give_inextensible_motion():
    """U = M (F + lambda) must satisfy the link-length constraints:
    t_j . (U_{j+1} - U_j) = 0 (B^T U = 0)."""
    sus = _sus(num_fibers=2)
    st = _random_state(sus, seed=11)
    f = fib.bending_force(sus, st.t)
    lam = fib.constraint_forces(sus, st, f)
    pos = fib.blob_positions(sus, st)
    vel = fib.mobility_matvec(sus, pos, f + lam)
    bt = fib.apply_BT(sus, vel, st.t)
    np.testing.assert_allclose(np.asarray(bt), 0.0, atol=1e-8)


# ---------------------------------------------------------------------------
# Dynamics
# ---------------------------------------------------------------------------


def test_deterministic_relaxation_to_straight():
    """A bent free fiber with kT=0 relaxes toward straight: bending
    energy decreases monotonically, end-to-end grows toward L."""
    sus = _sus(num_fibers=1, num_links=10, ds=0.2, a=0.1, k_bend=0.5)
    # quarter-circle initial shape
    L = sus.num_links
    ang = 0.5 * np.pi * (np.arange(L) + 0.5) / L
    t = np.stack([np.cos(ang), np.sin(ang), np.zeros(L)], axis=1)
    t = jnp.asarray(t)[None]
    u, v = fib.bishop_frame(t)
    st = fib.FiberState(x0=jnp.zeros((1, 3)), t=t, u=u, v=v)

    m0 = sus.m0
    dt = 0.5 * (sus.ds**3 / m0) / sus.k_bend
    step = jax.jit(fib.make_stepper(sus, dt))
    e_prev = float(fib.bending_energy(sus, st.t))
    e2e_0 = float(fib.end_to_end_distance(sus, st)[0])
    key = jax.random.PRNGKey(0)
    energies = []
    for _ in range(60):
        st, aux = step(st, key)
        assert bool(aux.converged)
        energies.append(float(fib.bending_energy(sus, st.t)))
    assert energies[-1] < 0.2 * e_prev
    assert all(b <= a + 1e-12 for a, b in zip(energies, energies[1:]))
    e2e_1 = float(fib.end_to_end_distance(sus, st)[0])
    assert e2e_1 > e2e_0
    # tangents stay unit
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(st.t), axis=-1), 1.0, atol=1e-12)


def test_clamped_fiber_stays_anchored_and_aligns():
    """Clamped fiber: x0 never moves; with a ghost tangent along +z the
    first link relaxes toward t_fix."""
    sus = _sus(num_fibers=1, num_links=6, ds=0.2, a=0.1, k_bend=0.5,
               clamp=True, t_fix=(0.0, 0.0, 1.0))
    st = fib.straight_fiber_state(sus, [1.0, 1.0, 1.0], [0.0, 1.0, 0.0])
    dt = 0.5 * (sus.ds**3 / sus.m0) / sus.k_bend
    step = jax.jit(fib.make_stepper(sus, dt))
    x0_init = np.asarray(st.x0).copy()
    cos0 = float(st.t[0, 0, 2])
    key = jax.random.PRNGKey(0)
    for _ in range(120):
        st, aux = step(st, key)
    np.testing.assert_allclose(np.asarray(st.x0), x0_init, atol=1e-12)
    assert float(st.t[0, 0, 2]) > cos0 + 0.5  # rotated well toward +z


def test_equilibrium_tangent_correlation():
    """Discrete worm-like chain equilibrium: adjacent-tangent
    correlation <t_j . t_{j+1}> = coth(alpha) - 1/alpha with joint
    stiffness alpha = k_bend/(ds kT) — the fiber analog of the
    Gibbs-Boltzmann regressions for rigid bodies."""
    kT = 0.2
    sus = _sus(num_fibers=24, num_links=4, ds=0.25, a=0.125,
               k_bend=0.25, kT=kT, impl_c=0.5)
    alpha = sus.k_bend / (sus.ds * kT)  # = 5
    expect = 1.0 / np.tanh(alpha) - 1.0 / alpha

    st = _random_state(sus, seed=12, bend=0.05)
    dt = 0.8 * (sus.ds**3 / sus.m0) / sus.k_bend
    key = jax.random.PRNGKey(42)
    # burn-in then sample
    st, _, _ = fib.simulate(sus, st, key, dt=dt, n_steps=400,
                            save_every=400)
    _, traj, _ = fib.simulate(sus, st, jax.random.PRNGKey(43), dt=dt,
                              n_steps=3000, save_every=10)
    t = np.asarray(traj.t)  # (saves, F, L, 3)
    corr = np.sum(t[..., 1:, :] * t[..., :-1, :], axis=-1)
    measured = corr.mean()
    assert abs(measured - expect) < 0.03, (measured, expect)


def test_stresslet_shapes_and_symmetry_limit():
    sus = _sus(num_fibers=2)
    st = _random_state(sus, seed=13)
    s = np.asarray(fib.stresslet_deterministic(sus, st))
    assert s.shape == (2, 3, 3)
    assert np.all(np.isfinite(s))
