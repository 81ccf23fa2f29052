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


def make_mcmc_kernel(system: System, *, max_translation=None):
    """One Metropolis step: state -> state. Proposal: uniform translation
    in [-d, d]^3 and rotation exp(N(0,1) * d / L_max)
    (many_body_MCMC.py:158-190)."""
    if max_translation is None:
        max_translation = 0.1 * system.blob_radius
    import numpy as np

    max_len = max(t.body_length + 2 * system.blob_radius
                  for t in system.types)
    max_angle = max_translation / max_len
    free = jnp.asarray(~system.prescribed_body_mask)[:, None]

    def kernel(mc: MCMCState, key) -> MCMCState:
        k_trans, k_rot, k_accept = jax.random.split(key, 3)
        B = system.num_bodies
        dx = jax.random.uniform(k_trans, (B, 3), dtype=mc.state.pos.dtype,
                                minval=-max_translation,
                                maxval=max_translation)
        dphi = jax.random.normal(k_rot, (B, 3),
                                 dtype=mc.state.pos.dtype) * max_angle
        pos_new = mc.state.pos + free * dx
        quat_new = quat.multiply(quat.from_rotation(free * dphi),
                                 mc.state.quat)
        proposal = State(pos=pos_new, quat=quat_new)
        e_new = total_energy(system, proposal)
        log_u = jnp.log(jax.random.uniform(k_accept, (),
                                           dtype=mc.state.pos.dtype))
        accept = log_u < -(e_new - mc.energy) / system.kT
        state = jax.tree.map(
            lambda new, old: jnp.where(accept, new, old), proposal, mc.state)
        return MCMCState(state=state,
                         energy=jnp.where(accept, e_new, mc.energy),
                         accepted=mc.accepted + accept.astype(jnp.int32))

    return kernel


def run_mcmc(system: System, state: State, key, *, n_steps, save_every=1,
             max_translation=None):
    """Run the chain with lax.scan; returns (final MCMCState, trajectory of
    saved States, energy history)."""
    kernel = make_mcmc_kernel(system, max_translation=max_translation)
    mc0 = MCMCState(state=state, energy=total_energy(system, state),
                    accepted=jnp.asarray(0, jnp.int32))

    def outer(mc, key):
        keys = jax.random.split(key, save_every)

        def inner(mc, k):
            return kernel(mc, k), None

        mc, _ = jax.lax.scan(inner, mc, keys)
        return mc, (mc.state, mc.energy)

    keys = jax.random.split(key, n_steps // save_every)
    mc, (traj, energies) = jax.lax.scan(outer, mc0, keys)
    return mc, traj, energies
