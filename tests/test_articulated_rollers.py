"""Articulated single-blob (rollers) path: grand-mobility constrained
solve + FE/midpoint schemes (quaternion_integrator_rollers.py:737-802,
:1455-1576; PC multi_bodies.py:1008-1108)."""

import jax
import jax.numpy as jnp
import numpy as np

from rigidmultiblobswall_tpu.models import articulated as art_mod
from rigidmultiblobswall_tpu.models import integrators, solvers
from rigidmultiblobswall_tpu.models.articulated import ArticulatedType
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state
from rigidmultiblobswall_tpu.ops import mobility as mob


def _single_blob_dimer(count=2, seed=0, link_len=2.5, g=1.0):
    ref = np.zeros((1, 3))
    t0 = BodyType(name="b0", ref_config=ref, count=count)
    t1 = BodyType(name="b1", ref_config=ref, count=count)
    art = ArticulatedType(
        name="dumbbell", count=count, sub_type_indices=(0, 1),
        pairs_local=np.array([[0, 1]]),
        links=np.array([[link_len / 2, 0, 0, -link_len / 2, 0, 0]]))
    system = System(types=(t0, t1), articulated=(art,), eta=1.0,
                    blob_radius=0.5, g=g, domain="single_wall",
                    repulsion_strength_wall=1.0, debye_length_wall=0.5)
    rng = np.random.default_rng(seed)
    pos0 = rng.uniform(-3, 3, (count, 3))
    pos0[:, 2] = rng.uniform(2.0, 4.0, count)
    pos1 = pos0 + np.array([link_len, 0, 0])
    pos = np.concatenate([pos0, pos1], axis=0)
    quat = np.tile(np.array([1.0, 0, 0, 0]), (2 * count, 1))
    return system, make_state(pos, quat)


def _dense_grand_mobility(system, r):
    """Assemble the 6N grand mobility column by column from the matvec."""
    n = r.shape[0]
    cols = []
    for j in range(6 * n):
        e = np.zeros(6 * n)
        e[j] = 1.0
        e = e.reshape(n, 6)
        u, w = mob.grand_mobility_matvec(
            r, jnp.asarray(e[:, 0:3]), jnp.asarray(e[:, 3:6]),
            system.eta, system.blob_radius, **system.mobility_kwargs)
        cols.append(np.concatenate(
            [np.asarray(u), np.asarray(w)], axis=1).ravel())
    return np.stack(cols, axis=1)


def test_single_blob_solve_matches_dense_kkt():
    system, state = _single_blob_dimer(count=1, seed=1)
    sol = solvers.solve_mobility_problem_single_blob(system, state,
                                                     tol=1e-11)
    # dense KKT: U = M (F + C^T phi), C U = B
    r = np.asarray(state.pos)
    M = _dense_grand_mobility(system, jnp.asarray(r))
    C = np.asarray(art_mod.dense_C_per_instance(
        system, system.articulated[0], state))[0]  # (3, 12)
    F = np.asarray(solvers.force_torque_calculator(
        system, state, state.pos)).ravel()
    B = np.zeros(3)  # constant links
    CMC = C @ M @ C.T
    phi = np.linalg.solve(CMC, B - C @ (M @ F))
    U = M @ (F + C.T @ phi)
    assert np.allclose(np.asarray(sol.velocities).ravel(), U,
                       atol=1e-7 * max(1.0, np.abs(U).max()))
    # the solver's U-equation is U + M C^T phi = M F, so its phi is the
    # negative of the KKT multiplier in U = M (F + C^T phi)
    assert np.allclose(np.asarray(sol.phi).ravel(), -phi, atol=1e-6)


def test_single_blob_solve_preserves_link_velocity():
    system, state = _single_blob_dimer(count=3, seed=2)
    sol = solvers.solve_mobility_problem_single_blob(system, state,
                                                     tol=1e-10)
    CU = art_mod.C_mul(system, state, sol.velocities)
    assert np.allclose(np.asarray(CU), 0.0, atol=1e-7)


def test_rotation_translation_coupling_present():
    """A torque on one blob must translate its partner through the grand
    mobility (the blob-level saddle path would lose this coupling for
    single-blob bodies)."""
    system, state = _single_blob_dimer(count=1, seed=3, g=0.0)
    system = System(types=system.types, articulated=system.articulated,
                    eta=system.eta, blob_radius=system.blob_radius, g=0.0,
                    domain="no_wall",
                    body_force_torque_fn=lambda s, st, r: jnp.tile(
                        jnp.asarray([0.0, 0, 0, 0, 1.0, 0]),
                        (s.num_bodies, 1)).at[1].set(0.0))
    sol = solvers.solve_mobility_problem_single_blob(system, state,
                                                     tol=1e-10)
    # torque about y on body 0 -> z-translation of body 1 (Stokeslet curl)
    assert abs(float(sol.velocities[1, 2])) > 1e-4


def test_articulated_rollers_fe_step():
    system, state = _single_blob_dimer(count=2, seed=4)
    step = jax.jit(integrators.make_stepper(
        system, "articulated_deterministic_forward_euler_rollers", 1e-2))
    carry = integrators.init_carry(system)
    s = state
    for i in range(3):
        s, carry, aux = step(s, jax.random.PRNGKey(i), carry)
    g = art_mod.constraint_violation(system, s)
    assert np.max(np.abs(np.asarray(g))) < 1e-6
    assert np.all(np.asarray(s.pos)[:, 2] < np.asarray(state.pos)[:, 2])
    assert int(aux.det_iterations) > 0


def test_articulated_rollers_midpoint_step():
    system, state = _single_blob_dimer(count=1, seed=5)
    step = jax.jit(integrators.make_stepper(
        system, "articulated_deterministic_midpoint_rollers", 1e-2))
    carry = integrators.init_carry(system)
    s, carry, aux = step(state, jax.random.PRNGKey(0), carry)
    g = art_mod.constraint_violation(system, s)
    assert np.max(np.abs(np.asarray(g))) < 1e-6
