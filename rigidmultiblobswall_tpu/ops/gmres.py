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
    cold_start = x0 is None
    if cold_start:
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
            # denom == 0: A closed the Krylov space without the residual
            # reaching zero (singular operator) — the identity rotation
            # must NOT zero the estimate, or the outer loop would skip
            # the true-residual check and report a wrong x as converged
            res = jnp.where(denom > 0, jnp.abs(g[j + 1]), res)
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
        # a zero USED diagonal = Krylov-space breakdown (singular
        # operator, or an identically-zero RHS in the lockstep analog):
        # unit-diagonal it AND zero its g entry, so that direction
        # contributes y_m = 0 (finite; no 0/0 NaN, no fabricated y_m =
        # g_m). The residual estimate above stays nonzero in the
        # singular case, so the solve reports converged=False
        dz = (jnp.diagonal(Rm) == 0.0)
        Rm = jnp.where(jnp.eye(m, dtype=bool) & dz[None, :], 1.0, Rm)
        gm = jnp.where(used & ~dz, g[:m], 0.0)
        ym = jax.scipy.linalg.solve_triangular(Rm, gm, lower=False)
        y = y + V[:m].T @ ym
        return y, j, res

    def outer_cond(state):
        y, r, rnorm, iters, cycles = state
        return (cycles < max_cycles) & (rnorm > target)

    # effective RHS of the correction system (skip the A*0 product on a
    # cold start: at scale one pair sweep is the unit of cost)
    r0 = b if cold_start else b - matvec(x0)

    def outer_body(state):
        y, r, rnorm, iters, cycles = state
        y, j, est = run_cycle(y, r, rnorm)

        # When the Givens estimate converged inside the cycle, skip the
        # explicit true-residual product: at scale it is one full pair
        # sweep per solve for a number the estimate already gives to
        # ~1e-6 relative (CGS2 keeps the Arnoldi relation tight; the PC
        # is pinned exactly-linear, see saddle._full_precision). A
        # restart (estimate NOT converged) still recomputes the true
        # residual — restart correctness never rides the estimate.
        def true_resid(_):
            rr = r0 - a_tilde(y)
            return rr, jnp.linalg.norm(rr)

        r, rnorm = lax.cond(est <= target, lambda _: (r, est),
                            true_resid, None)
        return (y, r, rnorm, iters + j, cycles + 1)
    state = (jnp.zeros_like(b), r0, jnp.linalg.norm(r0), jnp.asarray(0), jnp.asarray(0))
    y, r, rnorm, iters, _ = lax.while_loop(outer_cond, outer_body, state)
    x = x0 + M(y)
    return GmresResult(x=x, residual_norm=rnorm, iterations=iters,
                       converged=rnorm <= target)


def gmres_lockstep(
    matvec: Callable,
    b: jax.Array,
    *,
    x0: Optional[jax.Array] = None,
    tol: float = 1e-8,
    atol: float = 0.0,
    restart: int = 60,
    maxiter: int = 1000,
    M: Optional[Callable] = None,
) -> GmresResult:
    """Solve matvec(X) = b for a STACK of right-hand sides b of shape
    (nrhs, n), running one independent Arnoldi process per RHS in
    lockstep: each iteration applies the operator to the whole (nrhs, n)
    block in ONE call, so an operator whose pair sweep / gridding cost is
    shared across columns (ops/ewald.matvec_multi, the batched dense
    planes product) amortizes it. The loop runs until EVERY RHS meets its
    own target; already-converged columns keep iterating harmlessly
    (their residual only shrinks further). matvec and M map
    (nrhs, n) -> (nrhs, n).

    This replaces back-to-back reference solves that share a
    configuration — e.g. the Slip-Trapz rigid solve and its RFD solve
    (quaternion_integrator_multi_bodies.py:966-1007) — with one batched
    Krylov loop. Returns per-RHS x/residual/converged; `iterations` is
    the number of BATCHED sweeps executed (the cost-relevant count: one
    sweep serves all columns)."""
    nrhs, n = b.shape
    dtype = b.dtype
    if M is None:
        M = lambda v: v
    cold_start = x0 is None
    if cold_start:
        x0 = jnp.zeros_like(b)

    m = int(min(restart, n, maxiter))
    max_cycles = max(1, -(-maxiter // m))

    b_norm = jnp.linalg.norm(b, axis=1)
    target = jnp.maximum(tol * b_norm, atol)                   # (nrhs,)

    def a_tilde(Y):
        return matvec(M(Y))

    def run_cycle(y, r, rnorm):
        safe = jnp.where(rnorm > 0, rnorm, 1.0)
        V = jnp.zeros((nrhs, m + 1, n), dtype).at[:, 0].set(r / safe[:, None])
        R = jnp.zeros((nrhs, m + 1, m), dtype)
        cs = jnp.zeros((nrhs, m), dtype)
        sn = jnp.zeros((nrhs, m), dtype)
        g = jnp.zeros((nrhs, m + 1), dtype).at[:, 0].set(rnorm)

        def inner_cond(state):
            j, V, R, cs, sn, g, res = state
            return (j < m) & jnp.any(res > target)

        def inner_body(state):
            j, V, R, cs, sn, g, res = state
            w = a_tilde(V[:, j])                               # (nrhs, n)
            # classical Gram-Schmidt, applied twice for stability. The
            # batched contractions MUST run at full f32: the default TPU
            # einsum precision (bf16 MXU) loses basis orthogonality and
            # the Givens residual estimate silently diverges from the
            # true residual (the single-RHS path's mat-vec products
            # lower to f32 VPU reductions and never see this).
            prec = jax.lax.Precision.HIGHEST
            mask = (jnp.arange(m + 1) <= j).astype(dtype)[None]
            h1 = jnp.einsum("bkn,bn->bk", V, w, precision=prec) * mask
            w = w - jnp.einsum("bkn,bk->bn", V, h1, precision=prec)
            h2 = jnp.einsum("bkn,bn->bk", V, w, precision=prec) * mask
            w = w - jnp.einsum("bkn,bk->bn", V, h2, precision=prec)
            h = h1 + h2
            wnorm = jnp.linalg.norm(w, axis=1)                 # (nrhs,)
            wsafe = jnp.where(wnorm > 0, wnorm, 1.0)
            V = V.at[:, j + 1].set(
                jnp.where(wnorm[:, None] > 0, w / wsafe[:, None], 0.0))
            h = h.at[:, j + 1].set(wnorm)

            def apply_rot(i, hv):
                hi = hv[:, i]
                hip = hv[:, i + 1]
                hv = hv.at[:, i].set(cs[:, i] * hi + sn[:, i] * hip)
                return hv.at[:, i + 1].set(-sn[:, i] * hi + cs[:, i] * hip)

            h = lax.fori_loop(0, j, apply_rot, h)

            hj, hjp = h[:, j], h[:, j + 1]
            denom = jnp.sqrt(hj * hj + hjp * hjp)
            dsafe = jnp.where(denom > 0, denom, 1.0)
            c = jnp.where(denom > 0, hj / dsafe, 1.0)
            s = jnp.where(denom > 0, hjp / dsafe, 0.0)
            h = h.at[:, j].set(c * hj + s * hjp).at[:, j + 1].set(0.0)
            cs = cs.at[:, j].set(c)
            sn = sn.at[:, j].set(s)
            gj = g[:, j]
            g = g.at[:, j].set(c * gj).at[:, j + 1].set(-s * gj)
            # per-column: a no-progress rotation (denom == 0; zero RHS
            # column or singular operator) keeps the previous estimate
            # instead of zeroing it (see the single-RHS comment)
            res = jnp.where(denom > 0, jnp.abs(g[:, j + 1]), res)
            R = R.at[:, :, j].set(h)
            return (j + 1, V, R, cs, sn, g, res)

        state = (jnp.asarray(0), V, R, cs, sn, g, rnorm)
        j, V, R, cs, sn, g, res = lax.while_loop(inner_cond, inner_body,
                                                 state)

        used = jnp.arange(m) < j
        Rm = R[:, :m, :m]
        eye = jnp.eye(m, dtype=bool) & ~used[None, :]
        Rm = jnp.where(eye[None], 1.0, Rm)
        # zero USED diagonals happen per-column: an identically-zero RHS
        # column (its whole Arnoldi process is zeros while the healthy
        # columns drive j forward) or a singular operator. Unit-diagonal
        # them AND zero their g entries: the direction contributes
        # y_m = 0 (no 0/0 NaN, no fabricated y_m); a genuinely singular
        # column keeps a nonzero residual estimate and reports
        # converged=False
        dz = jnp.diagonal(Rm, axis1=1, axis2=2) == 0.0   # (nrhs, m)
        Rm = jnp.where(jnp.eye(m, dtype=bool)[None] & dz[:, None, :],
                       1.0, Rm)
        gm = jnp.where(used[None] & ~dz, g[:, :m], 0.0)
        ym = jax.vmap(lambda Ri, gi: jax.scipy.linalg.solve_triangular(
            Ri, gi, lower=False))(Rm, gm)
        y = y + jnp.einsum("bkn,bk->bn", V[:, :m], ym,
                           precision=jax.lax.Precision.HIGHEST)
        return y, j, res

    def outer_cond(state):
        y, r, rnorm, iters, cycles = state
        return (cycles < max_cycles) & jnp.any(rnorm > target)

    r0 = b if cold_start else b - matvec(x0)

    def outer_body(state):
        y, r, rnorm, iters, cycles = state
        y, j, est = run_cycle(y, r, rnorm)

        # skip the explicit true-residual sweep when every column's
        # Givens estimate converged (see the single-RHS comment)
        def true_resid(_):
            rr = r0 - a_tilde(y)
            return rr, jnp.linalg.norm(rr, axis=1)

        r, rnorm = lax.cond(jnp.all(est <= target), lambda _: (r, est),
                            true_resid, None)
        return (y, r, rnorm, iters + j, cycles + 1)

    state = (jnp.zeros_like(b), r0, jnp.linalg.norm(r0, axis=1),
             jnp.asarray(0), jnp.asarray(0))
    y, r, rnorm, iters, _ = lax.while_loop(outer_cond, outer_body, state)
    x = x0 + M(y)
    return GmresResult(x=x, residual_norm=rnorm, iterations=iters,
                       converged=rnorm <= target)
