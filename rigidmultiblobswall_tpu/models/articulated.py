"""Articulated rigid bodies: ball-joint constraints between bodies.

Functional re-design of the reference's Constraint/Articulated classes
(/root/reference/constraint/constraint.py:15-133,
articulated/articulated.py:19-544):

  * constraints live in `ArticulatedType` groups: `count` identical
    articulated instances, each with `num_bodies` sub-bodies and
    `num_constraints` ball joints. Sub-body j of every instance forms one
    `BodyType` group, so everything batches over instances with static
    shapes.
  * C-matrix products are einsums over lab-frame link vectors
    (C U = v_p + w_p x l_p - v_q - w_q x l_q); C is only materialized per
    articulated instance for the 3nc x 6nb preconditioner resistance
    G = pinv(C N C^T).
  * the post-step nonlinear projection (scipy dogbox in the reference,
    articulated.py:148-520) is a batched damped Gauss-Newton over
    x = (dq in R^3, theta in R^4 per body) with the same residual
    [A dq + R(th_p) l_p - R(th_q) l_q + (q_p - q_q); |th|^2 - 1].

Time-dependent links (numexpr strings in `.const` extra columns) are
supported through a `links_fn(time) -> (links, links_deriv)` hook compiled
from the same expression strings.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import quaternion as quat
from .system import State, System


@dataclasses.dataclass(frozen=True)
class ArticulatedType:
    """`count` identical articulated instances.

    sub_type_indices: indices into System.types of the BodyType groups
    holding sub-body 0..num_bodies-1 (each has count = this count).
    pairs_local: (nc, 2) local sub-body indices of each constraint.
    links: (nc, 6) body-frame link vectors (p-side then q-side).
    links_fn: optional time hook -> (links (nc,6), links_deriv (nc,6)).
    """

    name: str
    count: int
    sub_type_indices: Tuple[int, ...]
    pairs_local: np.ndarray
    links: np.ndarray
    links_fn: Optional[Callable] = None

    def __post_init__(self):
        p = np.asarray(self.pairs_local, dtype=int).reshape(-1, 2)
        l = np.asarray(self.links, dtype=float).reshape(-1, 6)
        p.setflags(write=False)
        l.setflags(write=False)
        object.__setattr__(self, "pairs_local", p)
        object.__setattr__(self, "links", l)

    @property
    def num_bodies(self) -> int:
        return len(self.sub_type_indices)

    @property
    def num_constraints(self) -> int:
        return self.pairs_local.shape[0]


def num_constraints(system: System) -> int:
    arts = getattr(system, "articulated", ()) or ()
    return sum(a.count * a.num_constraints for a in arts)


def constraint_offsets(system: System):
    offs = [0]
    for a in system.articulated:
        offs.append(offs[-1] + a.count * a.num_constraints)
    return tuple(offs)


def _instance_bodies(system: System, art: ArticulatedType, state_arr):
    """Gather per-instance sub-body values: (count, num_bodies, ...)."""
    cols = [state_arr[system.body_slice(tj)] for tj in art.sub_type_indices]
    return jnp.stack(cols, axis=1)


def _scatter_instance_bodies(system: System, art: ArticulatedType, out, vals):
    """Scatter (count, num_bodies, k) back into a global (B, k) array."""
    for j, tj in enumerate(art.sub_type_indices):
        sl = system.body_slice(tj)
        out = out.at[sl].add(vals[:, j])
    return out


def links_at_time(art: ArticulatedType, time, dtype):
    if art.links_fn is not None:
        links, deriv = art.links_fn(time)
        return (jnp.asarray(links, dtype).reshape(-1, 6),
                jnp.asarray(deriv, dtype).reshape(-1, 6))
    links = jnp.asarray(art.links, dtype)
    return links, jnp.zeros_like(links)


def lab_frame_links(system: System, art: ArticulatedType, state: State,
                    time=0.0):
    """Rotate links (and derivs) to the lab frame: (count, nc, 3) x4
    (constraint.py:100-132)."""
    dtype = state.pos.dtype
    links, deriv = links_at_time(art, time, dtype)
    q_inst = _instance_bodies(system, art, state.quat)  # (count, nb, 4)
    qp = q_inst[:, art.pairs_local[:, 0]]  # (count, nc, 4)
    qq = q_inst[:, art.pairs_local[:, 1]]
    lp = quat.rotate(qp, jnp.broadcast_to(links[:, 0:3], qp.shape[:-1] + (3,)))
    lq = quat.rotate(qq, jnp.broadcast_to(links[:, 3:6], qq.shape[:-1] + (3,)))
    dp = quat.rotate(qp, jnp.broadcast_to(deriv[:, 0:3], qp.shape[:-1] + (3,)))
    dq_ = quat.rotate(qq, jnp.broadcast_to(deriv[:, 3:6], qq.shape[:-1] + (3,)))
    return lp, lq, dp, dq_


def C_mul(system: System, state: State, U, time=0.0):
    """C U: body velocities (B,6) -> constraint velocities (C_total,3):
    v_p + w_p x l_p - v_q - w_q x l_q (multi_bodies.py:373-394)."""
    U = U.reshape(system.num_bodies, 6)
    out = []
    for art in system.articulated:
        lp, lq, _, _ = lab_frame_links(system, art, state, time)
        U_inst = _instance_bodies(system, art, U)  # (count, nb, 6)
        Up = U_inst[:, art.pairs_local[:, 0]]
        Uq = U_inst[:, art.pairs_local[:, 1]]
        val = (Up[..., 0:3] + jnp.cross(Up[..., 3:6], lp)
               - Uq[..., 0:3] - jnp.cross(Uq[..., 3:6], lq))
        # self-constraint (p == q): the q side is dropped (constraint.py:79-82)
        self_c = art.pairs_local[:, 0] == art.pairs_local[:, 1]
        if self_c.any():
            mask = jnp.asarray(self_c, dtype=bool)[None, :, None]
            val = jnp.where(mask,
                            Up[..., 0:3] + jnp.cross(Up[..., 3:6], lp), val)
        out.append(val.reshape(-1, 3))
    if not out:
        return jnp.zeros((0, 3), dtype=state.pos.dtype)
    return jnp.concatenate(out, axis=0)


def CT_mul(system: System, state: State, phi, time=0.0):
    """C^T phi: constraint forces (C_total,3) -> body force-torques (B,6):
    p gets (phi, l_p x phi), q gets (-phi, -l_q x phi)
    (multi_bodies.py:397-421)."""
    dtype = state.pos.dtype
    out = jnp.zeros((system.num_bodies, 6), dtype=dtype)
    offs = constraint_offsets(system)
    for ia, art in enumerate(system.articulated):
        lp, lq, _, _ = lab_frame_links(system, art, state, time)
        nc = art.num_constraints
        phi_a = phi.reshape(-1, 3)[offs[ia]:offs[ia + 1]].reshape(
            art.count, nc, 3)
        contrib = jnp.zeros((art.count, art.num_bodies, 6), dtype=dtype)
        fp = jnp.concatenate([phi_a, jnp.cross(lp, phi_a)], axis=-1)
        fq = -jnp.concatenate([phi_a, jnp.cross(lq, phi_a)], axis=-1)
        self_c = jnp.asarray(art.pairs_local[:, 0] == art.pairs_local[:, 1])
        fq = jnp.where(self_c[None, :, None], 0.0, fq)
        contrib = contrib.at[:, art.pairs_local[:, 0]].add(fp)
        contrib = contrib.at[:, art.pairs_local[:, 1]].add(fq)
        out = _scatter_instance_bodies(system, art, out, contrib)
    return out


def constraint_rhs(system: System, state: State, time=0.0):
    """Prescribed link velocity B = -(dl_p - dl_q) in the lab frame
    (quaternion_integrator_multi_bodies.py:1470-1473)."""
    out = []
    for art in system.articulated:
        _, _, dp, dq_ = lab_frame_links(system, art, state, time)
        out.append((-(dp - dq_)).reshape(-1, 3))
    if not out:
        return jnp.zeros((0, 3), dtype=state.pos.dtype)
    return jnp.concatenate(out, axis=0)


def constraint_violation(system: System, state: State, time=0.0):
    """g = q_p + R_p l_p - q_q - R_q l_q, (C_total, 3)
    (constraint.py:85-97)."""
    out = []
    for art in system.articulated:
        lp, lq, _, _ = lab_frame_links(system, art, state, time)
        pos = _instance_bodies(system, art, state.pos)
        xp = pos[:, art.pairs_local[:, 0]]
        xq = pos[:, art.pairs_local[:, 1]]
        out.append((xp + lp - xq - lq).reshape(-1, 3))
    if not out:
        return jnp.zeros((0, 3), dtype=state.pos.dtype)
    return jnp.concatenate(out, axis=0)


def dense_C_per_instance(system: System, art: ArticulatedType, state: State,
                         time=0.0):
    """Dense C (count, 3 nc, 6 nb) for the articulated preconditioner
    (articulated.py:127-141)."""
    dtype = state.pos.dtype
    lp, lq, _, _ = lab_frame_links(system, art, state, time)
    nc, nb = art.num_constraints, art.num_bodies
    C = jnp.zeros((art.count, 3 * nc, 6 * nb), dtype=dtype)

    def cross_mat(v):
        zeros = jnp.zeros_like(v[..., 0])
        return jnp.stack([
            jnp.stack([zeros, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zeros, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zeros], axis=-1),
        ], axis=-2)

    eye = jnp.eye(3, dtype=dtype)
    for k in range(nc):
        p, q_ = int(art.pairs_local[k, 0]), int(art.pairs_local[k, 1])
        rows = slice(3 * k, 3 * k + 3)
        C = C.at[:, rows, 6 * p:6 * p + 3].add(eye)
        C = C.at[:, rows, 6 * p + 3:6 * p + 6].add(-cross_mat(lp[:, k]))
        if p != q_:
            C = C.at[:, rows, 6 * q_:6 * q_ + 3].add(-eye)
            C = C.at[:, rows, 6 * q_ + 3:6 * q_ + 6].add(cross_mat(lq[:, k]))
    return C


# ---------------------------------------------------------------------------
# Kinematic post-processing: CM tracking + nonlinear projection
# ---------------------------------------------------------------------------


def _connectivity_pinv(art: ArticulatedType):
    """pinv of the constraint connectivity A (3nc, 3nb)
    (articulated.py:52-57)."""
    nc, nb = art.num_constraints, art.num_bodies
    A = np.zeros((3 * nc, 3 * nb))
    for i in range(nc):
        p, q_ = art.pairs_local[i]
        A[3 * i:3 * i + 3, 3 * p:3 * p + 3] += np.eye(3)
        A[3 * i:3 * i + 3, 3 * q_:3 * q_ + 3] += -np.eye(3)
    return A, np.linalg.pinv(A)


def correct_center_of_mass(system: System, state: State, old_state: State,
                           velocities, dt, time=0.0,
                           midpoint_fraction=1.0) -> State:
    """Re-center each articulated instance: CM moves with the mean body
    velocity; relative positions come from the connectivity solve
    (articulated.py:63-124, scheme usage
    quaternion_integrator_multi_bodies.py:1662-1678)."""
    pos = state.pos
    U = velocities.reshape(system.num_bodies, 6)
    for art in system.articulated:
        A, Ainv = _connectivity_pinv(art)
        lp, lq, _, _ = lab_frame_links(system, art, state, time)
        # rhs b_i = -l_p + l_q per constraint (articulated.py:110-124)
        b = (-lp + lq).reshape(art.count, 3 * art.num_constraints)
        q_rel = jnp.einsum("ij,cj->ci", jnp.asarray(Ainv, pos.dtype), b)
        q_rel = q_rel.reshape(art.count, art.num_bodies, 3)

        pos_old = _instance_bodies(system, art, old_state.pos)
        v_inst = _instance_bodies(system, art, U)[..., 0:3]
        cm_old = jnp.mean(pos_old, axis=1)
        u_cm = jnp.mean(v_inst, axis=1)
        cm_new = cm_old + dt * midpoint_fraction * u_cm
        rel_cm = jnp.mean(q_rel, axis=1)
        new_pos_inst = q_rel + (cm_new - rel_cm)[:, None, :]
        for j, tj in enumerate(art.sub_type_indices):
            pos = pos.at[system.body_slice(tj)].set(new_pos_inst[:, j])
    return State(pos=pos, quat=state.quat)


def nonlinear_projection(system: System, state: State, time=0.0, *,
                         tol=1e-8, max_iter=20) -> State:
    """Batched damped Gauss-Newton enforcing the ball-joint constraints
    exactly, replacing the reference's scipy dogbox least squares
    (articulated.py:148-520). Unknowns per body: dq (3) and a correction
    quaternion theta (4); residual rows: 3 per constraint + |theta|^2-1
    per body; the CM shift of dq is removed before applying."""
    pos = state.pos
    qs = state.quat
    for art in system.articulated:
        nb, nc = art.num_bodies, art.num_constraints
        A, _ = _connectivity_pinv(art)
        Aj = jnp.asarray(A, pos.dtype)
        lp, lq, _, _ = lab_frame_links(system, art, state, time)  # lab links
        pos_inst = _instance_bodies(system, art, pos)   # (count, nb, 3)
        quat_inst = _instance_bodies(system, art, qs)   # (count, nb, 4)
        pi = art.pairs_local[:, 0]
        qi = art.pairs_local[:, 1]

        def residual(x, pos_i, lp_i, lq_i):
            dq = x[: 3 * nb].reshape(nb, 3)
            th = x[3 * nb:].reshape(nb, 4)
            Rp = quat.rotation_matrix(th[pi])
            Rq = quat.rotation_matrix(th[qi])
            g = (Aj @ dq.ravel()).reshape(nc, 3)
            g = g + jnp.einsum("kij,kj->ki", Rp, lp_i)
            g = g - jnp.einsum("kij,kj->ki", Rq, lq_i)
            g = g + pos_i[pi] - pos_i[qi]
            unit = jnp.sum(th * th, axis=1) - 1.0
            return jnp.concatenate([g.ravel(), unit])

        def solve_one(pos_i, lp_i, lq_i):
            x0 = jnp.zeros(7 * nb, pos.dtype).at[3 * nb::4].set(1.0)

            def cond(loop):
                x, it = loop
                r = residual(x, pos_i, lp_i, lq_i)
                return (jnp.max(jnp.abs(r[: 3 * nc])) > tol) & (it < max_iter)

            def body(loop):
                x, it = loop
                r = residual(x, pos_i, lp_i, lq_i)
                J = jax.jacfwd(residual)(x, pos_i, lp_i, lq_i)
                # damped normal equations (Levenberg regularization)
                JtJ = J.T @ J + 1e-12 * jnp.eye(x.size, dtype=x.dtype)
                dx = jnp.linalg.solve(JtJ, J.T @ r)
                return x - dx, it + 1

            x, it = jax.lax.while_loop(cond, body, (x0, jnp.asarray(0)))
            return x, it

        xs, iters = jax.vmap(solve_one)(pos_inst, lp, lq)
        dq = xs[:, : 3 * nb].reshape(art.count, nb, 3)
        th = xs[:, 3 * nb:].reshape(art.count, nb, 4)
        th = quat.normalize(th)
        dq = dq - jnp.mean(dq, axis=1, keepdims=True)  # CM-preserving
        new_pos = pos_inst + dq
        new_quat = quat.multiply(th, quat_inst)
        for j, tj in enumerate(art.sub_type_indices):
            sl = system.body_slice(tj)
            pos = pos.at[sl].set(new_pos[:, j])
            qs = qs.at[sl].set(new_quat[:, j])
    return State(pos=pos, quat=qs)
