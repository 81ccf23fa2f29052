"""Markov-chain Monte Carlo equilibrium sampler for rigid bodies.

Re-design of the reference's many_bodyMCMC package
(/root/reference/many_bodyMCMC/many_body_MCMC.py:158-239,
many_body_potential_pycuda.py:20-140): Metropolis-Hastings over body
locations and orientations with uniform translation and Gaussian-rotation
proposals; the total energy is gravity + wall repulsion + blob-blob soft
repulsion, with a large penalty for blobs behind the wall. The whole chain
runs as one `lax.scan`.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import quaternion as quat
from ..ops.mobility import _min_image
from . import kinematics as kin
from .system import State, System


def total_energy(system: System, state: State):
    """U = sum_i [weight z_i + U_wall(z_i)] + sum_{i<j} U_bb(r_ij), with a
    1e5 (1 - z) penalty for blobs below the wall
    (many_body_potential_pycuda.py:20-118)."""
    r = kin.blob_positions(system, state)
    z = r[:, 2]
    a = system.blob_radius
    eps_w = system.repulsion_strength_wall
    b_w = system.debye_length_wall
    weight = system.g

    u_one = weight * z + jnp.where(
        z < a, eps_w + eps_w * (a - z) / b_w,
        eps_w * jnp.exp(-(z - a) / b_w))
    u_one = jnp.where(z > 0, u_one, 1e5 * (1.0 - z))

    # pairwise soft repulsion (xy pseudo-periodic like the reference kernel)
    n = r.shape[0]
    d = _min_image(r[:, None, :] - r[None, :, :], tuple(system.periodic_length))
    r2 = jnp.sum(d * d, axis=-1)
    skip = jnp.eye(n, dtype=bool)
    rr = jnp.sqrt(jnp.where(skip | (r2 == 0.0), 1.0, r2))
    eps = system.repulsion_strength
    bb = system.debye_length
    u_pair = jnp.where(rr < 2 * a, eps + eps * (2 * a - rr) / bb,
                       eps * jnp.exp(-(rr - 2 * a) / bb))
    u_pair = jnp.where(skip, 0.0, u_pair)
    return jnp.sum(u_one) + 0.5 * jnp.sum(u_pair)


class MCMCState(NamedTuple):
    state: State
    energy: jax.Array
    accepted: jax.Array
    # adaptive proposal size + its EWMA acceptance tracker
    # (many_body_MCMC.py:183-199: ratio <- 0.95 ratio + 0.05 on accept;
    # during the first half of burn-in d <- d * 1.02 if ratio > 0.5
    # else d * 0.98)
    max_translation: jax.Array = None
    acc_ratio: jax.Array = None


def _max_body_length(system: System):
    return max(t.body_length + 2 * system.blob_radius for t in system.types)


def make_mcmc_kernel(system: System, *, max_translation=None):
    """One Metropolis step: (MCMCState, key, adapt?) -> MCMCState.
    Proposal: uniform translation in [-d, d]^3 and rotation
    exp(N(0,1) * d / L_max) with d carried in the state so burn-in can
    adapt it (many_body_MCMC.py:158-199)."""
    if max_translation is None:
        max_translation = 0.1 * system.blob_radius
    max_len = _max_body_length(system)
    free = jnp.asarray(~system.prescribed_body_mask)[:, None]

    def kernel(mc: MCMCState, key, adapt=False) -> MCMCState:
        k_trans, k_rot, k_accept = jax.random.split(key, 3)
        B = system.num_bodies
        dtype = mc.state.pos.dtype
        d = mc.max_translation
        dx = jax.random.uniform(k_trans, (B, 3), dtype=dtype,
                                minval=-1.0, maxval=1.0) * d
        dphi = jax.random.normal(k_rot, (B, 3), dtype=dtype) * (d / max_len)
        pos_new = mc.state.pos + free * dx
        quat_new = quat.multiply(quat.from_rotation(free * dphi),
                                 mc.state.quat)
        proposal = State(pos=pos_new, quat=quat_new)
        e_new = total_energy(system, proposal)
        log_u = jnp.log(jax.random.uniform(k_accept, (), dtype=dtype))
        accept = log_u < -(e_new - mc.energy) / system.kT
        state = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), proposal, mc.state)
        ratio = mc.acc_ratio * 0.95 + 0.05 * accept.astype(dtype)
        adapt = jnp.asarray(adapt)
        d = jnp.where(adapt, jnp.where(ratio > 0.5, d * 1.02, d * 0.98), d)
        return MCMCState(state=state,
                         energy=jnp.where(accept, e_new, mc.energy),
                         accepted=mc.accepted + accept.astype(jnp.int32),
                         max_translation=d, acc_ratio=ratio)

    return kernel


def init_mcmc(system: System, state: State, max_translation=None):
    if max_translation is None:
        max_translation = 0.1 * system.blob_radius
    dtype = state.pos.dtype
    return MCMCState(state=state, energy=total_energy(system, state),
                     accepted=jnp.asarray(0, jnp.int32),
                     max_translation=jnp.asarray(max_translation, dtype),
                     acc_ratio=jnp.asarray(0.5, dtype))


def run_mcmc(system: System, state: State, key, *, n_steps, save_every=1,
             max_translation=None, initial_step=0):
    """Run burn-in (negative `initial_step` steps, adapting the proposal
    size over their first half like the reference) then the chain;
    returns (final MCMCState, trajectory of saved States, energies)."""
    import numpy as np

    kernel = make_mcmc_kernel(system, max_translation=max_translation)
    mc0 = init_mcmc(system, state, max_translation=max_translation)

    key, k_burn = jax.random.split(key)
    if initial_step < 0:
        n_burn = -initial_step
        flags = jnp.asarray(
            np.arange(initial_step, 0) < (initial_step // 2))

        def burn(mc, inp):
            k, adapt = inp
            return kernel(mc, k, adapt), None

        mc0, _ = jax.lax.scan(
            burn, mc0, (jax.random.split(k_burn, n_burn), flags))

    # reference save cadence (many_body_MCMC.py:158-235): every step makes
    # a move, and the post-move state is recorded when step % n_save == 0
    # — so frame s is the state after s*save_every + 1 moves, frame 0
    # exists for any n_steps >= 1, and ALL n_steps moves execute (the
    # tail past the last save point still advances the chain)
    def inner(mc, k):
        return kernel(mc, k), None

    if n_steps < 1:
        empty = jax.tree.map(lambda x: jnp.zeros((0,) + x.shape, x.dtype),
                             mc0.state)
        return mc0, empty, jnp.zeros((0,), mc0.energy.dtype)

    k_first, k_blocks, k_tail = jax.random.split(key, 3)
    mc0 = kernel(mc0, k_first)
    frame0 = (mc0.state, mc0.energy)

    def outer(mc, key):
        mc, _ = jax.lax.scan(inner, mc, jax.random.split(key, save_every))
        return mc, (mc.state, mc.energy)

    n_blocks = max(n_steps - 1, 0) // save_every
    mc, (traj, energies) = jax.lax.scan(
        outer, mc0, jax.random.split(k_blocks, n_blocks))
    n_tail = max(n_steps - 1, 0) % save_every
    if n_tail:
        mc, _ = jax.lax.scan(inner, mc, jax.random.split(k_tail, n_tail))
    traj = jax.tree.map(
        lambda f0, t: jnp.concatenate([f0[None], t], axis=0), frame0[0],
        traj)
    energies = jnp.concatenate([frame0[1][None], energies], axis=0)
    return mc, traj, energies


class RejectionResult(NamedTuple):
    states: State        # (n_steps, ...) stacked proposals
    accepted: jax.Array  # (n_steps,) bool
    minimum_energy: jax.Array
    energies: jax.Array  # (n_steps,)


def run_rejection_sampler(system: System, key, *, n_steps,
                          n_estimate=100000, box_size=None):
    """Independent-sample rejection sampler (the reference's
    many_bodyMCMC/many_body_rejection.py): propose uniform positions in
    [0, L]^3 (L = 5 max body length) with random orientations; phase 1
    estimates the minimum energy over `n_estimate` draws, phase 2 accepts
    each draw with probability exp(-(E - E_min)/kT)."""
    if box_size is None:
        box_size = 5.0 * _max_body_length(system)
    B = system.num_bodies
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    def propose(k):
        k1, k2 = jax.random.split(k)
        pos = jax.random.uniform(k1, (B, 3), dtype=dtype,
                                 minval=0.0, maxval=box_size)
        q = quat.random(k2, (B,), dtype=dtype)
        return State(pos=pos, quat=q)

    def energy_of(k):
        return total_energy(system, propose(k))

    key, k_est = jax.random.split(key)

    def est_body(min_e, k):
        return jnp.minimum(min_e, energy_of(k)), None

    min_e, _ = jax.lax.scan(est_body, jnp.asarray(jnp.inf, dtype),
                            jax.random.split(k_est, n_estimate))
    min_e = min_e - system.kT  # safety factor (many_body_rejection.py:147)

    def sample_body(_, k):
        k_prop, k_acc = jax.random.split(k)
        s = propose(k_prop)
        e = total_energy(system, s)
        accept = jax.random.uniform(k_acc, (), dtype=dtype) < jnp.exp(
            -(e - min_e) / system.kT)
        return None, (s, accept, e)

    _, (states, accepted, energies) = jax.lax.scan(
        sample_body, None, jax.random.split(key, n_steps))
    return RejectionResult(states=states, accepted=accepted,
                           minimum_energy=min_e, energies=energies)
