"""Boundary-integral Laplace operators for phoretic (diffusiophoretic)
slip.

Vectorized XLA implementations of the reference's numba kernels
(/root/reference/Laplace_kernels/Laplace_kernels_numba.py:13-470): single
layer, double layer, the surface derivative of the double layer, and the
dipole operator — each with optional half-space (wall) images.

All operators act on per-blob surface fields weighted by quadrature
weights; prefactor 1/(4 pi).
"""

from __future__ import annotations

import jax.numpy as jnp


def _pair_geometry(r_src, r_tgt):
    d = r_tgt[:, None, :] - r_src[None, :, :]
    rz_img = r_tgt[:, 2][:, None] + r_src[:, 2][None, :]
    return d, rz_img


def _inv_r(d2, mask_zero):
    return 1.0 / jnp.sqrt(jnp.where(mask_zero, 1.0, d2))


def single_layer(r_src, r_tgt, field, weights, *, wall=False,
                 self_interaction=True):
    """(S c)_i = 1/(4pi) sum_j c_j w_j (1/r_ij [+ 1/r_img])
    (Laplace_kernels_numba.py:13-65). Returns (Nt,)."""
    d, rz_img = _pair_geometry(r_src, r_tgt)
    d2 = jnp.sum(d * d, axis=-1)
    n_t, n_s = d2.shape
    self_mask = ((jnp.arange(n_t)[:, None] == jnp.arange(n_s)[None, :])
                 & self_interaction)
    S = jnp.where(self_mask | (d2 == 0.0), 0.0,
                  _inv_r(d2, self_mask | (d2 == 0.0)))
    if wall:
        d2w = d[..., 0] ** 2 + d[..., 1] ** 2 + rz_img ** 2
        S = S + _inv_r(d2w, d2w == 0.0)
    c = field * weights
    return (S @ c) / (4.0 * jnp.pi)


def double_layer(r_src, r_tgt, field, weights, normals, *, wall=False,
                 self_interaction=True):
    """(D c)_i = 1/(4pi) sum_j c_j w_j (r_ij . n_j)/r^3 [+ image with the
    z-component of n reflected] (Laplace_kernels_numba.py:68-135)."""
    d, rz_img = _pair_geometry(r_src, r_tgt)
    d2 = jnp.sum(d * d, axis=-1)
    n_t, n_s = d2.shape
    self_mask = ((jnp.arange(n_t)[:, None] == jnp.arange(n_s)[None, :])
                 & self_interaction)
    zero = self_mask | (d2 == 0.0)
    invr3 = _inv_r(d2, zero) ** 3
    rn = jnp.einsum("tsk,sk->ts", d, normals)
    T = jnp.where(zero, 0.0, invr3 * rn)
    if wall:
        d2w = d[..., 0] ** 2 + d[..., 1] ** 2 + rz_img ** 2
        invr3w = _inv_r(d2w, d2w == 0.0) ** 3
        rnw = (d[..., 0] * normals[None, :, 0]
               + d[..., 1] * normals[None, :, 1]
               - rz_img * normals[None, :, 2])
        T = T + invr3w * rnw
    c = field * weights
    return (T @ c) / (4.0 * jnp.pi)


def deriv_double_layer(r_src, r_tgt, field, weights, normals, *, wall=False,
                       self_interaction=True):
    """Surface gradient kernel: (L c)_i^a = 1/(4pi) sum_j c_j w_j
    L^{ab}(r_ij) n_j^b with L = (I - 3 rhat rhat)/r^3, trace-corrected
    Lzz = -Lxx-Lyy, and the image with n_z reflected
    (Laplace_kernels_numba.py:139-252). Returns (Nt, 3)."""

    def kernel_apply(d_eff, zero, nz_sign):
        invr = _inv_r(jnp.sum(d_eff * d_eff, axis=-1), zero)
        invr2 = invr * invr
        invr3 = invr2 * invr
        fo = -3.0 * invr2
        dx, dy, dz = d_eff[..., 0], d_eff[..., 1], d_eff[..., 2]
        Lxx = (1.0 + fo * dx * dx) * invr3
        Lxy = (fo * dx * dy) * invr3
        Lxz = (fo * dx * dz) * invr3
        Lyy = (1.0 + fo * dy * dy) * invr3
        Lyz = (fo * dy * dz) * invr3
        Lzz = -Lxx - Lyy
        nx, ny = normals[None, :, 0], normals[None, :, 1]
        nz = nz_sign * normals[None, :, 2]
        gx = Lxx * nx + Lxy * ny + Lxz * nz
        gy = Lxy * nx + Lyy * ny + Lyz * nz
        gz = Lxz * nx + Lyz * ny + Lzz * nz
        out = jnp.stack([gx, gy, gz], axis=-1)
        return jnp.where(zero[..., None], 0.0, out)

    d, rz_img = _pair_geometry(r_src, r_tgt)
    d2 = jnp.sum(d * d, axis=-1)
    n_t, n_s = d2.shape
    self_mask = ((jnp.arange(n_t)[:, None] == jnp.arange(n_s)[None, :])
                 & self_interaction)
    zero = self_mask | (d2 == 0.0)
    G = kernel_apply(d, zero, 1.0)
    if wall:
        d_img = d.at[..., 2].set(rz_img)
        d2w = jnp.sum(d_img * d_img, axis=-1)
        G = G + kernel_apply(d_img, d2w == 0.0, -1.0)
    c = field * weights
    return jnp.einsum("tsa,s->ta", G, c) / (4.0 * jnp.pi)


def dipole(r_src, r_tgt, field, weights, *, wall=False,
           self_interaction=True):
    """(T c)_i^a = 1/(4pi) sum_j c_j w_j r_ij^a / r^3 [+ image]
    (Laplace_kernels_numba.py:255-328). Returns (Nt, 3)."""
    d, rz_img = _pair_geometry(r_src, r_tgt)
    d2 = jnp.sum(d * d, axis=-1)
    n_t, n_s = d2.shape
    self_mask = ((jnp.arange(n_t)[:, None] == jnp.arange(n_s)[None, :])
                 & self_interaction)
    zero = self_mask | (d2 == 0.0)
    invr3 = _inv_r(d2, zero) ** 3
    T = jnp.where(zero[..., None], 0.0, d * invr3[..., None])
    if wall:
        d_img = d.at[..., 2].set(rz_img)
        d2w = jnp.sum(d_img * d_img, axis=-1)
        invr3w = _inv_r(d2w, d2w == 0.0) ** 3
        T = T + d_img * invr3w[..., None]
    c = field * weights
    return jnp.einsum("tsa,s->ta", T, c) / (4.0 * jnp.pi)
