"""Phoretic (chemically active) bodies: Laplace boundary-integral solve
coupled to slip.

Re-design of the reference's calc_slip Laplace path
(/root/reference/multi_bodies/multi_bodies.py:105-168): solve

    (I/2 - D + S k/D_c) c = c_background + S (emitting_rate / D_c)

by GMRES, compute the surface concentration gradient and convert it to a
phoretic slip  u_slip = M_s (I - n n^T) grad c.

Per-blob chemistry data (normals in the body frame, reaction/emitting
rates, surface mobility, quadrature weights) live on BodyType via the
`chemistry` attribute (the reference reads them from .Laplace files,
multi_bodies_utilities.py:290-317).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from ..ops import laplace
from ..ops import quaternion as quat
from ..ops.gmres import gmres
from . import kinematics as kin
from .system import State, System


@dataclasses.dataclass(frozen=True)
class Chemistry:
    """Per-blob chemical data for one body type (.Laplace file columns:
    normal (3), reaction_rate, emitting_rate, surface_mobility, weight)."""

    normals_ref: np.ndarray       # (nb,3) body frame
    reaction_rate: np.ndarray     # (nb,)
    emitting_rate: np.ndarray     # (nb,)
    surface_mobility: np.ndarray  # (nb,)
    weights: np.ndarray           # (nb,)

    @classmethod
    def from_laplace_file(cls, path):
        data = np.loadtxt(path)
        return cls(normals_ref=data[:, 0:3], reaction_rate=data[:, 3],
                   emitting_rate=data[:, 4], surface_mobility=data[:, 5],
                   weights=data[:, 6])


class PhoreticConfig(NamedTuple):
    chemistry: tuple              # one Chemistry (or None) per body type
    background: jnp.ndarray       # 9 coefficients (multi_bodies.py:124-131)
    diffusion_coefficient: float = 1.0


def _gather(system: System, chem_tuple, attr, dtype):
    out = []
    for t, chem in zip(system.types, chem_tuple):
        if chem is None:
            out.append(np.zeros(t.count * t.num_blobs))
        else:
            out.append(np.tile(getattr(chem, attr), t.count))
    return jnp.asarray(np.concatenate(out), dtype)


def lab_normals(system: System, state: State, chem_tuple):
    """Rotate body-frame normals to the lab frame, (N,3)."""
    dtype = state.pos.dtype
    out = []
    for i, (t, chem) in enumerate(zip(system.types, chem_tuple)):
        if chem is None:
            out.append(jnp.zeros((t.count * t.num_blobs, 3), dtype))
        else:
            _, q = kin.type_arrays(system, state, i)
            R = quat.rotation_matrix(q)
            n = jnp.einsum("cij,nj->cni", R,
                           jnp.asarray(chem.normals_ref, dtype))
            out.append(n.reshape(-1, 3))
    return jnp.concatenate(out, axis=0)


def background_concentration(background, r):
    """c_b(r) up to quadratic terms (multi_bodies.py:124-131)."""
    bg = jnp.asarray(background, r.dtype)
    H = jnp.zeros((3, 3), r.dtype)
    H = H.at[0, 0].set(bg[4]).at[0, 1].set(bg[5]).at[0, 2].set(bg[6])
    H = H.at[1, 1].set(bg[7]).at[1, 2].set(bg[8])
    H = H.at[2, 2].set(-bg[4] - bg[7])
    H = H + H.T - jnp.diag(jnp.diag(H))
    c = bg[0] + r @ bg[1:4]
    c = c + jnp.einsum("ik,kj,ij->i", r, H, r)
    grad = 4.0 * r @ H + 2.0 * bg[1:4]
    return c, grad


def phoretic_slip(system: System, state: State, cfg: PhoreticConfig, *,
                  tol=None, maxiter=1000, restart=200):
    """Solve the Laplace BVP and return (slip (N,3), concentration (N,),
    gmres iterations) (multi_bodies.py:105-168)."""
    dtype = state.pos.dtype
    r = kin.blob_positions(system, state)
    wall = system.domain == "single_wall"
    normals = lab_normals(system, state, cfg.chemistry)
    k_rate = _gather(system, cfg.chemistry, "reaction_rate", dtype)
    q_rate = _gather(system, cfg.chemistry, "emitting_rate", dtype)
    mobility_s = _gather(system, cfg.chemistry, "surface_mobility", dtype)
    weights = _gather(system, cfg.chemistry, "weights", dtype)
    Dc = cfg.diffusion_coefficient

    c_bg, grad_bg = background_concentration(cfg.background, r)
    rhs = c_bg + laplace.single_layer(r, r, q_rate / Dc, weights, wall=wall)

    def operator(c):
        x = 0.5 * c
        x = x - laplace.double_layer(r, r, c, weights, normals, wall=wall)
        x = x + laplace.single_layer(r, r, k_rate * c / Dc, weights,
                                     wall=wall)
        return x

    tol = system.solver_tolerance if tol is None else tol
    res = gmres(operator, rhs, tol=tol, maxiter=maxiter, restart=restart)
    c = res.x

    grad_c = grad_bg
    grad_c = grad_c + 2.0 * laplace.deriv_double_layer(
        r, r, c, weights, normals, wall=wall)
    grad_c = grad_c - 2.0 * laplace.dipole(
        r, r, (q_rate - k_rate * c) / Dc, weights, wall=wall)

    nn_grad = jnp.einsum("ik,ik->i", normals, grad_c)
    slip = mobility_s[:, None] * (grad_c - normals * nn_grad[:, None])
    return slip, c, res.iterations


def concentration_field(system: System, state: State, cfg: PhoreticConfig,
                        targets, *, c=None, tol=None):
    """Exterior concentration at off-surface points.

    Evaluates the boundary-integral representation consistent with the
    on-surface equation solved by :func:`phoretic_slip`
    (``c/2 - D[c] + S[(k c - q)/Dc] = c_bg``):

        c(x) = c_bg(x) + D[c](x) - S[(k c - q)/Dc](x)

    whose exterior surface limit (double-layer jump +c/2) reproduces the
    solved surface concentration. The reference's example driver calls a
    ``plot_concentration_field_pyVTK`` helper that is never defined in the
    repository (/root/reference/multi_bodies/examples/Laplace_sphere/
    multi_bodies_stkfmm.py:219) — this is the working equivalent.

    If ``c`` (the solved surface concentration) is None the BVP is solved
    first. Returns (c_at_targets (P,), c_surface (N,)).
    """
    dtype = state.pos.dtype
    if c is None:
        _, c, _ = phoretic_slip(system, state, cfg, tol=tol)
    r = kin.blob_positions(system, state)
    wall = system.domain == "single_wall"
    normals = lab_normals(system, state, cfg.chemistry)
    k_rate = _gather(system, cfg.chemistry, "reaction_rate", dtype)
    q_rate = _gather(system, cfg.chemistry, "emitting_rate", dtype)
    weights = _gather(system, cfg.chemistry, "weights", dtype)
    Dc = cfg.diffusion_coefficient
    tgt = jnp.asarray(targets, dtype)

    c_t, _ = background_concentration(cfg.background, tgt)
    # self_interaction=False: targets are off-surface points, the
    # index-coincidence self mask does not apply
    c_t = c_t + laplace.double_layer(r, tgt, c, weights, normals, wall=wall,
                                     self_interaction=False)
    c_t = c_t - laplace.single_layer(r, tgt, (k_rate * c - q_rate) / Dc,
                                     weights, wall=wall,
                                     self_interaction=False)
    return c_t, c
