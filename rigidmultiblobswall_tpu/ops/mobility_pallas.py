"""Pallas TPU kernel for the trans-trans mobility product.

Fuses the SFM decomposition (see mobility_sfm.py) into one kernel: pair
scalar fields are computed in VMEM and contracted on the MXU without ever
touching HBM — the TPU-native replacement for the reference's pycuda
`single_wall_mobility_trans_times_force` kernel family
(/root/reference/mobility/mobility_pycuda.py:150-370).

Layout: the grid runs over row tiles of targets; each kernel instance
loops over column tiles of sources, computing
  core RPY fields A, B and wall fields f1, g2, g3, g4, f5  (TR, TC)
and accumulating field @ rhs-columns products (TR, 47) on the MXU. The
rank-1 assembly with the target coordinates happens once per row tile.

Inputs are pre-regularized normalized coordinates (z already shifted,
vector already damped), as produced by mobility.pairwise_matvec.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# RHS column layout (concatenated along axis 1):
#  [0:3)   F            (A field, isotropic)
#  [3:19)  rank-1 core  [F, s, G9, p3]        (B field)
#  [19:22) F            (f1 field, isotropic)
#  [22:38) rank-1 image [F, s~, G~9, p~3]     (g2 field)
#  [38:42) [fz, fz*q~]                        (g3 field)
#  [42:46) [F, s~]                            (g4 field)
#  [46:47) fz                                 (f5 field)
N_COLS = 47


def _core_fields(r2, self_mask):
    zero = self_mask | (r2 == 0.0)
    r2s = jnp.where(zero, 1.0, r2)
    invr = lax.rsqrt(r2s)
    invr2 = invr * invr
    r = r2s * invr
    far = r > 2.0
    A = jnp.where(far, (1.0 + (2.0 / 3.0) * invr2) * invr,
                  (4.0 / 3.0) * (1.0 - 0.28125 * r))
    B = jnp.where(far, (1.0 - 2.0 * invr2) * invr2 * invr,
                  (4.0 / 3.0) * 0.09375 * invr)
    A = jnp.where(zero, jnp.where(self_mask, 4.0 / 3.0, 0.0), A)
    B = jnp.where(zero, 0.0, B)
    return A, B


def _wall_fields(R2, Rz, zs_row):
    invR = lax.rsqrt(R2)
    invR2 = invR * invR
    invR3 = invR * invR2
    invR5 = invR3 * invR2
    ez = Rz * invR
    ez2 = ez * ez
    h_hat = zs_row / Rz
    hh = h_hat * (1.0 - h_hat)

    f1 = -(3.0 * (1.0 + 2.0 * hh * ez2) * invR
           + 2.0 * (1.0 - 3.0 * ez2) * invR3
           - 2.0 * (1.0 - 5.0 * ez2) * invR5) / 3.0
    f2 = -(3.0 * (1.0 - 6.0 * hh * ez2) * invR
           - 6.0 * (1.0 - 5.0 * ez2) * invR3
           + 10.0 * (1.0 - 7.0 * ez2) * invR5) / 3.0
    f3 = ez * (3.0 * h_hat * (1.0 - 6.0 * (1.0 - h_hat) * ez2) * invR
               - 6.0 * (1.0 - 5.0 * ez2) * invR3
               + 10.0 * (2.0 - 7.0 * ez2) * invR5) * 2.0 / 3.0
    f4 = ez * (3.0 * h_hat * invR - 10.0 * invR5) * 2.0 / 3.0
    f5 = -(3.0 * h_hat * h_hat * ez2 * invR + 3.0 * ez2 * invR3
           + (2.0 - 15.0 * ez2) * invR5) * 4.0 / 3.0
    return f1, f2 * invR2, f3 * invR, f4 * invR, f5


def _dense_kernel(qx_ref, qy_ref, qz_ref, qsx_ref, qsy_ref, qsz_ref,
                  out_ref, *, wall, self_interaction):
    i = pl.program_id(0)
    j = pl.program_id(1)
    tr = qx_ref.shape[1]
    tc = qsx_ref.shape[1]
    xt = qx_ref[0, :]
    yt = qy_ref[0, :]
    zt = qz_ref[0, :]
    xs = qsx_ref[0, :]
    ys = qsy_ref[0, :]
    zs = qsz_ref[0, :]

    dx = xt[:, None] - xs[None, :]
    dy = yt[:, None] - ys[None, :]
    dz = zt[:, None] - zs[None, :]
    xy2 = dx * dx + dy * dy
    r2 = xy2 + dz * dz
    rows = i * tr + lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
    cols = j * tc + lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
    self_mask = (rows == cols) if self_interaction else (
        jnp.zeros((tr, tc), dtype=bool))
    A, B = _core_fields(r2, self_mask)

    mxx = A + B * dx * dx
    mxy = B * dx * dy
    mxz = B * dx * dz
    myx = mxy
    myy = A + B * dy * dy
    myz = B * dy * dz
    mzx = mxz
    mzy = myz
    mzz = A + B * dz * dz

    if wall:
        Rz = zt[:, None] + zs[None, :]
        R2 = xy2 + Rz * Rz
        f1, g2, g3, g4, f5 = _wall_fields(R2, Rz, zs[None, :])
        mxx += f1 + g2 * dx * dx
        mxy += g2 * dx * dy
        mxz += g2 * dx * Rz + g3 * dx
        myx += g2 * dy * dx
        myy += f1 + g2 * dy * dy
        myz += g2 * dy * Rz + g3 * dy
        mzx += g2 * Rz * dx + g4 * dx
        mzy += g2 * Rz * dy + g4 * dy
        mzz += f1 + g2 * Rz * Rz + g3 * Rz + g4 * Rz + f5

    for k, m in enumerate((mxx, mxy, mxz, myx, myy, myz, mzx, mzy, mzz)):
        out_ref[k, :, :] = m


def dense_tt_pallas(q_src, q_tgt, *, wall, self_interaction,
                    row_tile=128, col_tile=512, interpret=False):
    """Materialize the TT mobility as (3,3,Nt,Ns) component planes in one
    fused kernel (normalized units; caller applies prefactor/damping).
    ~3x over the XLA blocked builder: fields computed once in VMEM, nine
    planes written straight to HBM."""
    dtype = jnp.float32
    n_src = q_src.shape[0]
    n_tgt = q_tgt.shape[0]
    q_src = q_src.astype(dtype)
    q_tgt = q_tgt.astype(dtype)

    col_tile = min(col_tile, max(128, 1 << (n_src - 1).bit_length()))
    row_tile = min(row_tile, max(8, 1 << (n_tgt - 1).bit_length()))
    n_src_pad = -(-n_src // col_tile) * col_tile
    n_tgt_pad = -(-n_tgt // row_tile) * row_tile

    def pad1(x, n, fill):
        return jnp.pad(x, (0, n - x.shape[0]), constant_values=fill)[None, :]

    qtx = pad1(q_tgt[:, 0], n_tgt_pad, 0.0)
    qty = pad1(q_tgt[:, 1], n_tgt_pad, 0.0)
    qtz = pad1(q_tgt[:, 2], n_tgt_pad, 1.0)
    qsx = pad1(q_src[:, 0], n_src_pad, 0.0)
    qsy = pad1(q_src[:, 1], n_src_pad, 0.0)
    qsz = pad1(q_src[:, 2], n_src_pad, 1.0)

    grid = (n_tgt_pad // row_tile, n_src_pad // col_tile)
    kernel = functools.partial(_dense_kernel, wall=wall,
                               self_interaction=self_interaction)
    row_spec = pl.BlockSpec((1, row_tile), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, col_tile), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, col_spec, col_spec, col_spec],
        out_specs=pl.BlockSpec((9, row_tile, col_tile),
                               lambda i, j: (0, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((9, n_tgt_pad, n_src_pad), dtype),
        interpret=interpret,
    )(qtx, qty, qtz, qsx, qsy, qsz)
    return out[:, :n_tgt, :n_src].reshape(3, 3, n_tgt, n_src)


def _force_kernel(qx_ref, qy_ref, qz_ref, qsx_ref, qsy_ref, qsz_ref,
                  out_ref, *, eps_over_b, inv_debye, two_a):
    j = pl.program_id(1)
    i = pl.program_id(0)
    tr = qx_ref.shape[1]
    tc = qsx_ref.shape[1]
    xt, yt, zt = qx_ref[0, :], qy_ref[0, :], qz_ref[0, :]
    xs, ys, zs = qsx_ref[0, :], qsy_ref[0, :], qsz_ref[0, :]

    dx = xt[:, None] - xs[None, :]
    dy = yt[:, None] - ys[None, :]
    dz = zt[:, None] - zs[None, :]
    r2 = dx * dx + dy * dy + dz * dz
    rows = i * tr + lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
    cols = j * tc + lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
    skip = (rows == cols) | (r2 == 0.0)
    r2s = jnp.where(skip, 1.0, r2)
    invr = lax.rsqrt(r2s)
    r = r2s * invr
    mag = jnp.where(r > two_a,
                    eps_over_b * jnp.exp(-(r - two_a) * inv_debye) * invr,
                    eps_over_b * invr)
    mag = jnp.where(skip, 0.0, mag)

    fx = jnp.sum(mag * dx, axis=1)
    fy = jnp.sum(mag * dy, axis=1)
    fz = jnp.sum(mag * dz, axis=1)
    contrib = jnp.stack([fx, fy, fz], axis=1)

    @pl.when(j == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    out_ref[...] += contrib


def blob_blob_forces_pallas(r_vectors, *, repulsion_strength, debye_length,
                            blob_radius, row_tile=256, col_tile=512,
                            interpret=False):
    """Fused soft-repulsion pair force (the reference's forces_pycuda
    kernel, multi_bodies/forces_pycuda.py); non-periodic only."""
    dtype = jnp.float32
    n = r_vectors.shape[0]
    r = r_vectors.astype(dtype)
    col_tile = min(col_tile, max(128, 1 << (n - 1).bit_length()))
    row_tile = min(row_tile, max(8, 1 << (n - 1).bit_length()))
    n_pad_r = -(-n // row_tile) * row_tile
    n_pad_c = -(-n // col_tile) * col_tile

    def pad1(x, m, fill):
        return jnp.pad(x, (0, m - x.shape[0]), constant_values=fill)[None, :]

    qtx = pad1(r[:, 0], n_pad_r, 1e15)
    qty = pad1(r[:, 1], n_pad_r, 1e15)
    qtz = pad1(r[:, 2], n_pad_r, 1e15)
    qsx = pad1(r[:, 0], n_pad_c, -1e15)
    qsy = pad1(r[:, 1], n_pad_c, -1e15)
    qsz = pad1(r[:, 2], n_pad_c, -1e15)

    grid = (n_pad_r // row_tile, n_pad_c // col_tile)
    kernel = functools.partial(
        _force_kernel, eps_over_b=repulsion_strength / debye_length,
        inv_debye=1.0 / debye_length, two_a=2.0 * blob_radius)
    row_spec = pl.BlockSpec((1, row_tile), lambda i, j: (0, i),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, col_tile), lambda i, j: (0, j),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, col_spec, col_spec, col_spec],
        out_specs=pl.BlockSpec((row_tile, 3), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad_r, 3), dtype),
        interpret=interpret,
    )(qtx, qty, qtz, qsx, qsy, qsz)
    return out[:n]


def _symm_kernel(i_ref, j_ref, m_ref, v_ref, out_ref, *, tile):
    """One upper-triangle tile (i,j) of the symmetric planes matvec:
    out_i += sum_b M[a,b,i,j] v_j[b]; for i != j also the transpose
    contribution out_j += sum_a M[a,b,i,j]^T v_i[a]. Sequential TPU grid
    makes the read-modify-write accumulation into the full VMEM-resident
    output race-free."""
    k = pl.program_id(0)
    i = i_ref[k]
    j = j_ref[k]

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    m = m_ref[...]                                  # (3,3,T,T)
    vj = v_ref[:, pl.ds(j * tile, tile)]            # (3,T)
    ui = [0.0] * 3
    for a in range(3):
        for b in range(3):
            ui[a] += jnp.sum(m[a, b] * vj[b][None, :], axis=1)
    sl_i = (slice(None), pl.ds(i * tile, tile))
    out_ref[sl_i] += jnp.stack(ui)

    @pl.when(i != j)
    def _():
        vi = v_ref[:, pl.ds(i * tile, tile)]        # (3,T)
        uj = [0.0] * 3
        for b in range(3):
            for a in range(3):
                uj[b] += jnp.sum(m[a, b] * vi[a][:, None], axis=0)
        sl_j = (slice(None), pl.ds(j * tile, tile))
        out_ref[sl_j] += jnp.stack(uj)


def symm_planes_matvec(planes, vec, *, tile=256, interpret=False):
    """Symmetric matvec with materialized (3,3,N,N) mobility planes,
    reading only the upper-triangle tiles: u[i,a] = sum_{j,b} M[a,b,i,j]
    v[j,b] using the reciprocity symmetry M[a,b,i,j] = M[b,a,j,i].

    The dense operator matvec is HBM-bandwidth bound (every GMRES/Lanczos
    iteration streams all 9 N^2 planes); this kernel nearly halves that
    traffic. The reference has no equivalent (its dense path is a scipy
    `.dot`, mobility/mobility.py:711-738); this is a TPU-specific
    optimization of the materialized-operator fast path."""
    n = planes.shape[2]
    v = vec.reshape(n, 3).astype(planes.dtype)
    n_pad = -(-n // tile) * tile
    t_tiles = n_pad // tile
    if n_pad != n:
        planes = jnp.pad(planes, ((0, 0), (0, 0), (0, n_pad - n),
                                  (0, n_pad - n)))
        v = jnp.pad(v, ((0, n_pad - n), (0, 0)))
    vT = v.T.reshape(3, n_pad)

    iu, ju = [], []
    for i in range(t_tiles):
        for j in range(i, t_tiles):
            iu.append(i)
            ju.append(j)
    i_map = jnp.asarray(iu, dtype=jnp.int32)
    j_map = jnp.asarray(ju, dtype=jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(len(iu),),
        in_specs=[
            pl.BlockSpec((3, 3, tile, tile),
                         lambda k, i_ref, j_ref: (0, 0, i_ref[k], j_ref[k]),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, n_pad), lambda k, i_ref, j_ref: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((3, n_pad), lambda k, i_ref, j_ref: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_symm_kernel, tile=tile),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((3, n_pad), planes.dtype),
        interpret=interpret,
    )(i_map, j_map, planes, vT)
    return out[:, :n].T
