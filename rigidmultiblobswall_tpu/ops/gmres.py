"""Restarted GMRES with right preconditioning, fully in-XLA.

Replaces the reference's scipy wrapper
(/root/reference/general_application_utils.py:514-635): right
preconditioning solves A M(y) = b and returns x = M(y), so convergence is
judged on the true residual. The Arnoldi process runs as a
`lax.while_loop` with Givens-rotation least squares, so the whole solver
jits and differentiates like any other JAX function.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax


class GmresResult(NamedTuple):
    x: jax.Array
    residual_norm: jax.Array
    iterations: jax.Array
    converged: jax.Array


def gmres(
    matvec: Callable,
    b: jax.Array,
    *,
    x0: Optional[jax.Array] = None,
    tol: float = 1e-8,
    atol: float = 0.0,
    restart: int = 60,
    maxiter: int = 1000,
    M: Optional[Callable] = None,
    verbose: bool = False,
) -> GmresResult:
    """Solve matvec(x) = b for flat vectors b of static size.

    M applies the preconditioner inverse (an approximation of A^{-1});
    right preconditioning as in the reference default. verbose=True
    prints the per-iteration residual from inside the jitted loop (the
    reference's --print-residual gmres_counter, multi_bodies.py:62-74).
    """
    n = b.shape[0]
    dtype = b.dtype
    if M is None:
        M = lambda v: v
    if x0 is None:
        x0 = jnp.zeros_like(b)

    m = int(min(restart, n, maxiter))
    max_cycles = max(1, -(-maxiter // m))

    b_norm = jnp.linalg.norm(b)
    target = jnp.maximum(tol * b_norm, atol)

    def a_tilde(y):
        return matvec(M(y))

    def run_cycle(y, r, rnorm):
        V = jnp.zeros((m + 1, n), dtype).at[0].set(r / jnp.where(rnorm > 0, rnorm, 1.0))
        R = jnp.zeros((m + 1, m), dtype)
        cs = jnp.zeros(m, dtype)
        sn = jnp.zeros(m, dtype)
        g = jnp.zeros(m + 1, dtype).at[0].set(rnorm)

        def inner_cond(state):
            j, V, R, cs, sn, g, res = state
            return (j < m) & (res > target)

        def inner_body(state):
            j, V, R, cs, sn, g, res = state
            w = a_tilde(V[j])
            # classical Gram-Schmidt, applied twice for stability
            mask = (jnp.arange(m + 1) <= j).astype(dtype)
            h1 = (V @ w) * mask
            w = w - V.T @ h1
            h2 = (V @ w) * mask
            w = w - V.T @ h2
            h = h1 + h2
            wnorm = jnp.linalg.norm(w)
            V = V.at[j + 1].set(jnp.where(wnorm > 0, w / jnp.where(wnorm > 0, wnorm, 1.0), 0.0))
            h = h.at[j + 1].set(wnorm)

            # apply the accumulated Givens rotations to the new column
            def apply_rot(i, hv):
                hi = hv[i]
                hip = hv[i + 1]
                hv = hv.at[i].set(cs[i] * hi + sn[i] * hip)
                return hv.at[i + 1].set(-sn[i] * hi + cs[i] * hip)

            h = lax.fori_loop(0, j, apply_rot, h)

            # new rotation to annihilate h[j+1]
            hj, hjp = h[j], h[j + 1]
            denom = jnp.sqrt(hj * hj + hjp * hjp)
            c = jnp.where(denom > 0, hj / jnp.where(denom > 0, denom, 1.0), 1.0)
            s = jnp.where(denom > 0, hjp / jnp.where(denom > 0, denom, 1.0), 0.0)
            h = h.at[j].set(c * hj + s * hjp).at[j + 1].set(0.0)
            cs = cs.at[j].set(c)
            sn = sn.at[j].set(s)
            gj = g[j]
            g = g.at[j].set(c * gj).at[j + 1].set(-s * gj)
            res = jnp.abs(g[j + 1])
            if verbose:
                jax.debug.print("gmres iteration {j}, residual {r}",
                                j=j, r=res)
            R = R.at[:, j].set(h)
            return (j + 1, V, R, cs, sn, g, res)

        state = (jnp.asarray(0), V, R, cs, sn, g, rnorm)
        j, V, R, cs, sn, g, res = lax.while_loop(inner_cond, inner_body, state)

        # triangular solve on the used leading block; unused columns get a
        # unit diagonal so the padded system stays nonsingular
        used = jnp.arange(m) < j
        Rm = R[:m, :m]
        Rm = jnp.where(jnp.eye(m, dtype=bool) & ~used[None, :], 1.0, Rm)
        gm = jnp.where(used, g[:m], 0.0)
        ym = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
        y = y + V[:m].T @ ym
        return y, j

    def outer_cond(state):
        y, r, rnorm, iters, cycles = state
        return (cycles < max_cycles) & (rnorm > target)

    r0 = b - matvec(x0)  # effective RHS of the correction system

    def outer_body(state):
        y, r, rnorm, iters, cycles = state
        y, j = run_cycle(y, r, rnorm)
        r = r0 - a_tilde(y)
        return (y, r, jnp.linalg.norm(r), iters + j, cycles + 1)
    state = (jnp.zeros_like(b), r0, jnp.linalg.norm(r0), jnp.asarray(0), jnp.asarray(0))
    y, r, rnorm, iters, _ = lax.while_loop(outer_cond, outer_body, state)
    x = x0 + M(y)
    return GmresResult(x=x, residual_norm=rnorm, iterations=iters,
                       converged=rnorm <= target)
