"""Articulated (constrained) rigid body tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.models import articulated as art_mod
from rigidmultiblobswall_tpu.models import integrators, kinematics as kin, saddle, solvers
from rigidmultiblobswall_tpu.models.articulated import ArticulatedType
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state
from tests.test_saddle import _shell_vertices


def _dimer_system(count=2, seed=0, link_len=1.4, domain="single_wall"):
    """`count` dimers: two 8-blob shells joined by a ball joint."""
    rng = np.random.default_rng(seed)
    ref = _shell_vertices(8, 0.4)
    t0 = BodyType(name="d_sub0", ref_config=ref, count=count)
    t1 = BodyType(name="d_sub1", ref_config=ref, count=count)
    art = ArticulatedType(
        name="dimer", count=count, sub_type_indices=(0, 1),
        pairs_local=np.array([[0, 1]]),
        links=np.array([[link_len / 2, 0, 0, -link_len / 2, 0, 0]]))
    system = System(types=(t0, t1), articulated=(art,), eta=1.0,
                    blob_radius=0.12, g=1.0, domain=domain,
                    repulsion_strength_wall=1.0, debye_length_wall=0.5)
    # positions: sub0 at x, sub1 at x + link
    pos0 = rng.uniform(-2, 2, (count, 3))
    pos0[:, 2] = rng.uniform(1.5, 2.5, count)
    pos1 = pos0 + np.array([link_len, 0, 0])
    pos = np.concatenate([pos0, pos1], axis=0)
    quat = np.tile(np.array([1.0, 0, 0, 0]), (2 * count, 1))
    return system, make_state(pos, quat)


def test_constraint_violation_zero_at_consistent_config():
    system, state = _dimer_system()
    g = art_mod.constraint_violation(system, state)
    assert np.allclose(np.asarray(g), 0.0, atol=1e-12)


def test_C_products_adjoint():
    system, state = _dimer_system(count=3, seed=1)
    rng = np.random.default_rng(2)
    U = jnp.asarray(rng.normal(size=(system.num_bodies, 6)))
    phi = jnp.asarray(rng.normal(size=(saddle.num_constraints(system), 3)))
    lhs = jnp.vdot(art_mod.C_mul(system, state, U), phi)
    rhs = jnp.vdot(U, art_mod.CT_mul(system, state, phi))
    assert np.isclose(float(lhs), float(rhs), atol=1e-12)


def test_C_products_match_dense_C():
    system, state = _dimer_system(count=2, seed=3)
    art = system.articulated[0]
    C = np.asarray(art_mod.dense_C_per_instance(system, art, state))
    rng = np.random.default_rng(4)
    U = rng.normal(size=(system.num_bodies, 6))
    # instance-major U for the dense product
    CU = np.asarray(art_mod.C_mul(system, state, jnp.asarray(U)))
    for i in range(art.count):
        u_inst = np.concatenate([U[system.body_offsets[tj] + i]
                                 for tj in art.sub_type_indices])
        assert np.allclose(C[i] @ u_inst, CU[i], atol=1e-12)


def test_mobility_solve_preserves_link_velocity():
    """The constrained solve must give zero relative velocity at the
    joint: C U = 0 for constant links."""
    system, state = _dimer_system(count=2, seed=5)
    sol = solvers.solve_mobility_problem(system, state, tol=1e-10)
    CU = art_mod.C_mul(system, state, sol.velocities)
    assert np.allclose(np.asarray(CU), 0.0, atol=1e-7)
    assert sol.phi.shape == (2, 3)


def test_operator_matches_dense_with_constraints():
    system, state = _dimer_system(count=1, seed=6)
    op = saddle.make_linear_operator(system, state)
    n = saddle.saddle_size(system)
    rng = np.random.default_rng(7)
    # dense via columns
    cols = []
    for j in range(n):
        e = np.zeros(n)
        e[j] = 1.0
        cols.append(np.asarray(op(jnp.asarray(e))))
    S = np.stack(cols, axis=1)
    # saddle structure: symmetric overall sign pattern
    n3 = 3 * system.num_blobs
    nb6 = 6 * system.num_bodies
    # C block in rows [n3+nb6:], cols [n3:n3+nb6]
    C_block = S[n3 + nb6:, n3:n3 + nb6]
    CT_block = S[n3:n3 + nb6, n3 + nb6:]
    assert np.allclose(C_block, CT_block.T, atol=1e-12)
    # zero blocks
    assert np.allclose(S[n3 + nb6:, :n3], 0.0)
    assert np.allclose(S[n3 + nb6:, n3 + nb6:], 0.0)


def test_articulated_fe_step_maintains_constraints():
    system, state = _dimer_system(count=2, seed=8)
    step = jax.jit(integrators.make_stepper(
        system, "articulated_deterministic_forward_euler", 5e-3))
    carry = integrators.init_carry(system)
    s = state
    for i in range(3):
        s, carry, aux = step(s, jax.random.PRNGKey(i), carry)
    g = art_mod.constraint_violation(system, s)
    assert np.max(np.abs(np.asarray(g))) < 1e-6
    # bodies sedimented under gravity
    assert np.all(np.asarray(s.pos)[:, 2] < np.asarray(state.pos)[:, 2])


def test_articulated_midpoint_step():
    system, state = _dimer_system(count=1, seed=9)
    step = integrators.make_stepper(
        system, "articulated_deterministic_midpoint", 5e-3)
    carry = integrators.init_carry(system)
    s, carry, aux = step(state, jax.random.PRNGKey(0), carry)
    g = art_mod.constraint_violation(system, s)
    assert np.max(np.abs(np.asarray(g))) < 1e-6


def test_nonlinear_projection_restores_broken_links():
    system, state = _dimer_system(count=2, seed=10)
    # perturb positions and orientations to violate constraints
    rng = np.random.default_rng(11)
    bad_pos = np.asarray(state.pos) + 0.05 * rng.normal(size=(4, 3))
    bad_quat = np.asarray(state.quat) + 0.02 * rng.normal(size=(4, 4))
    bad_quat /= np.linalg.norm(bad_quat, axis=1, keepdims=True)
    bad = make_state(bad_pos, bad_quat)
    g0 = np.max(np.abs(np.asarray(art_mod.constraint_violation(system, bad))))
    assert g0 > 1e-3
    fixed = art_mod.nonlinear_projection(system, bad, tol=1e-10)
    g1 = np.max(np.abs(np.asarray(art_mod.constraint_violation(system, fixed))))
    assert g1 < 1e-8
    # quaternions stay unit
    assert np.allclose(np.linalg.norm(np.asarray(fixed.quat), axis=1), 1.0,
                       atol=1e-12)
    # center of mass preserved per instance
    for i in range(2):
        cm_bad = (bad_pos[i] + bad_pos[2 + i]) / 2
        fp = np.asarray(fixed.pos)
        cm_fixed = (fp[i] + fp[2 + i]) / 2
        assert np.allclose(cm_bad, cm_fixed, atol=1e-9)


def test_pc_with_constraints_reduces_iterations():
    system, state = _dimer_system(count=3, seed=12)
    r_blobs = kin.blob_positions(system, state)
    rhs = solvers.build_rhs(system, state, r_blobs)
    from rigidmultiblobswall_tpu.ops.gmres import gmres

    op = saddle.make_linear_operator(system, state, r_blobs)
    rhs_unit = rhs / jnp.linalg.norm(rhs)
    plain = gmres(op, rhs_unit, tol=1e-8, restart=60, maxiter=900)
    pc = saddle.build_block_diag_pc(system, state)
    precond = gmres(op, rhs_unit, tol=1e-8, restart=60, maxiter=900,
                    M=lambda v: saddle.apply_block_diag_pc(system, pc, v))
    assert bool(precond.converged)
    assert int(precond.iterations) < int(plain.iterations)
