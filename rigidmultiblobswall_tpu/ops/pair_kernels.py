"""Direct-block fused pairwise mobility matvecs (Pallas TPU).

One kernel template evaluates the 3x3 RPY/Blake pair blocks *directly* on
the VPU and contracts them against the source vector in-register, with a
per-lane accumulator reduced once per row tile. This replaces both the
SFM rank-1 MXU formulation (ops/mobility_sfm; its fused Pallas variant
was removed once this engine superseded it) and the
generic XLA tile engine for the hot products:

- the SFM form was MXU-dot-bound (7 column-group dots per tile, each lane-
  padded to 128 -> ~5% MXU utilization) and its rank-1 expansion
  amplifies rounding by |q|^2, so it cannot use bf16;
- the direct-block form has NO MXU work and no (N, 47) VMEM-resident
  right-hand side, so it runs at the VPU roofline and scales to 100k+
  blobs single-chip.

Couplings (reference kernel family, /root/reference/mobility/mobility_pycuda.py):
  tt    velocity_from_force            (:150)
  tr    velocity_from_torque           (:1516)
  rt    rotation_from_force            (:926)
  rr    rotation_from_torque           (:593)
  grand velocity_from_force_and_torque (:1266) fused with rotation, i.e.
        (U, W) = [[Mtt, Mtr], [Mrt, Mrr]] (F, T) in ONE pass over the
        pair geometry (distances/rsqrts shared by all four blocks).

All math in normalized units (lengths / a, prefactors applied by the
caller); single-wall corrections are the Swan-Brady image system
(mobility_numba.py:241-276, :607-679, :998-1066, :1249-1321). The pair
formulas evaluated at the self geometry (dx=dy=0, Rz=2z, h_hat=1/2)
reproduce the reference's explicit wall self-corrections exactly, so the
wall terms need no self branch; only the unbounded core does.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NCOMP = {"tt": (3, 3), "tr": (3, 3), "rt": (3, 3), "rr": (3, 3),
          "grand": (6, 6)}


def _tt_coeffs(r2, invr, self_mask, zero):
    """Unbounded RPY TT coefficients: m_ab = c1 delta_ab + c2 d_a d_b."""
    invr2 = invr * invr
    r = r2 * invr
    far = r > 2.0
    c1 = jnp.where(far, (1.0 + (2.0 / 3.0) * invr2) * invr,
                   (4.0 / 3.0) * (1.0 - 0.28125 * r))
    c2 = jnp.where(far, (1.0 - 2.0 * invr2) * invr2 * invr,
                   (4.0 / 3.0) * 0.09375 * invr)
    c1 = jnp.where(zero, jnp.where(self_mask, 4.0 / 3.0, 0.0), c1)
    c2 = jnp.where(zero, 0.0, c2)
    return c1, c2


def _rr_coeffs(r2, invr, self_mask, zero):
    """Unbounded RPY RR coefficients: m_ab = c1 delta_ab + c2 d_a d_b."""
    invr2 = invr * invr
    invr3 = invr2 * invr
    r = r2 * invr
    far = r >= 2.0
    c1 = jnp.where(far, -0.5 * invr3,
                   1.0 - 0.84375 * r + 0.078125 * (r2 * r))
    c2 = jnp.where(far, 1.5 * invr2 * invr3,
                   0.28125 * invr - 0.046875 * r)
    c1 = jnp.where(zero, jnp.where(self_mask, 1.0, 0.0), c1)
    c2 = jnp.where(zero, 0.0, c2)
    return c1, c2


def _cross_coeff(r2, invr, zero):
    """RPY cross coefficient: m = c [d x] (antisymmetric)."""
    invr3 = invr * invr * invr
    r = r2 * invr
    c = jnp.where(r >= 2.0, invr3, 0.5 * (1.0 - 0.375 * r))
    return jnp.where(zero, 0.0, c)


def _wall_tt_g(R2, Rz, zs):
    """Wall TT scalar set folded onto raw (dx, dy, Rz) products:
    m_ab += f1 delta_ab + g2 e_a e_b + (g3, g4, f5 z-row/col terms).
    ONE implementation shared with the dense builder — a wall-correction
    fix lands in both kernels (plain jnp, traces fine inside Pallas).
    zs broadcasts as the source height."""
    from .mobility_pallas import _wall_fields

    return _wall_fields(R2, Rz, zs)


def _wall_rr_g(R2, Rz):
    """Wall RR scalar set folded onto raw products (rpy.wall_rr):
      mxx = f1 + f4 exy2 + G24 dx^2 ; mxy = G24 dx dy
      mzz = f1 + G2 Rz^2 + g3 Rz ;   mxz = G2 dx Rz ; mzx = G2 Rz dx + g3 dx
    with G2 = f2 invR2, G24 = (f2 - f4) invR2, g3 = f3 invR."""
    invR = lax.rsqrt(R2)
    invR2 = invR * invR
    invR3 = invR * invR2
    ez2 = Rz * Rz * invR2
    f1 = 0.5 * (1.0 - 6.0 * ez2) * invR3
    f2 = -1.5 * invR3
    f4 = 3.0 * invR3
    g3 = (3.0 * invR3 * Rz * invR) * invR  # f3 e_x / dx = 3 invR3 ez invR
    G2 = f2 * invR2
    G24 = (f2 - f4) * invR2
    exy2 = 1.0 - ez2  # ex^2 + ey^2
    A = f1 + f4 * exy2
    return A, G24, G2, g3, f1, ez2, invR3


def _wall_cross_g(R2, Rz, h):
    """Wall cross scalar set of rpy._wall_cross_core folded onto raw
    (dx, dy, Rz): entries use F1 = f1 invR, G3 = f3 invR2, f4 and
    F2 = f2 invR (h is the height argument: z_target for tr, z_source
    for rt)."""
    invR = lax.rsqrt(R2)
    invR2 = invR * invR
    invR4 = invR2 * invR2
    ez = Rz * invR
    ez2 = ez * ez
    h_hat = h / Rz
    f1 = invR2
    f2 = (6.0 * h_hat * ez2 * invR2 + (1.0 - 10.0 * ez2) * invR4) * 2.0
    f3 = -ez * (3.0 * h_hat * invR2 - 5.0 * invR4) * 2.0
    f4 = -ez * (h_hat * invR2 - invR4) * 2.0
    return f1 * invR, f2 * invR, f3 * invR2, f4


def _tt_condense(dx, dy, dz, xy2, r2, invr, self_mask, zero, wall, Rz, zs):
    """Condensed M_tt coefficients (5 scalars per pair): application to
    any number of RHS columns then costs ~10 VPU ops each (the condense
    cost — the dominant per-pair work — is shared, see n_rhs)."""
    c1, c2 = _tt_coeffs(r2, invr, self_mask, zero)
    if wall:
        R2 = xy2 + Rz * Rz
        f1, g2, g3, g4, f5 = _wall_tt_g(R2, Rz, zs)
        A = c1 + f1
        S = c2 + g2
        P = c2 * dz + g2 * Rz + g3
        Q = c2 * dz + g2 * Rz + g4
        mzz = A + c2 * dz * dz + g2 * Rz * Rz + (g3 + g4) * Rz + f5
    else:
        A = c1
        S = c2
        P = Q = c2 * dz
        mzz = c1 + c2 * dz * dz
    return A, S, P, Q, mzz


def _diag_apply(coeffs, dx, dy, vx, vy, vz):
    """Apply condensed diagonal-block (tt/rr) coefficients to one RHS."""
    A, S, P, Q, mzz = coeffs
    w = dx * vx + dy * vy
    u = S * w + P * vz
    tx = dx * u + A * vx
    ty = dy * u + A * vy
    tz = Q * w + mzz * vz
    return tx, ty, tz


def _tt_apply(dx, dy, dz, xy2, r2, invr, self_mask, zero, wall, Rz, zs,
              vx, vy, vz):
    """t = M_tt v with condensed coefficients (5 scalars per pair)."""
    coeffs = _tt_condense(dx, dy, dz, xy2, r2, invr, self_mask, zero,
                          wall, Rz, zs)
    return _diag_apply(coeffs, dx, dy, vx, vy, vz)


def _rr_condense(dx, dy, dz, xy2, r2, invr, self_mask, zero, wall, Rz):
    c1, c2 = _rr_coeffs(r2, invr, self_mask, zero)
    if wall:
        R2 = xy2 + Rz * Rz
        A_w, G24, G2, g3, f1, ez2, invR3 = _wall_rr_g(R2, Rz)
        A = c1 + A_w
        S = c2 + G24
        P = c2 * dz + G2 * Rz
        Q = c2 * dz + G2 * Rz + g3
        mzz = c1 + c2 * dz * dz + f1 + G2 * Rz * Rz + g3 * Rz
    else:
        A = c1
        S = c2
        P = Q = c2 * dz
        mzz = c1 + c2 * dz * dz
    return A, S, P, Q, mzz


def _rr_apply(dx, dy, dz, xy2, r2, invr, self_mask, zero, wall, Rz,
              vx, vy, vz):
    coeffs = _rr_condense(dx, dy, dz, xy2, r2, invr, self_mask, zero,
                          wall, Rz)
    return _diag_apply(coeffs, dx, dy, vx, vy, vz)


def _cross_condense(dx, dy, dz, xy2, r2, invr, zero, wall, which, Rz, h):
    """Condensed cross-block (tr/rt) entries: the antisymmetric core
    coefficient plus (when wall) the 8 wall-correction matrix entries."""
    c = _cross_coeff(r2, invr, zero)
    if not wall:
        return (c,)
    R2 = xy2 + Rz * Rz
    F1, F2, G3, f4 = _wall_cross_g(R2, Rz, h)
    # UT pattern at (sx*dx, sx*dy): tr flips the in-plane displacement
    s = -1.0 if which == "tr" else 1.0
    ux, uy = s * dx, s * dy
    # core corr entries (rpy._wall_cross_core, folded): then M -= corr,
    # and for rt the pattern transposes.
    cxx = -G3 * ux * uy
    cxy = -F1 * Rz + G3 * ux * ux - f4
    cxz = F1 * uy
    cyx = F1 * Rz - G3 * uy * uy + f4
    cyy = G3 * ux * uy
    cyz = -F1 * ux
    czx = -(F1 + F2) * uy - G3 * uy * Rz
    czy = (F1 + F2) * ux + G3 * ux * Rz
    return (c, cxx, cxy, cxz, cyx, cyy, cyz, czx, czy)


def _cross_apply_condensed(coeffs, dx, dy, dz, which, vx, vy, vz):
    c = coeffs[0]
    tx = c * (dz * vy - dy * vz)
    ty = c * (dx * vz - dz * vx)
    tz = c * (dy * vx - dx * vy)
    if len(coeffs) > 1:
        _, cxx, cxy, cxz, cyx, cyy, cyz, czx, czy = coeffs
        if which == "tr":
            wx = -(cxx * vx + cxy * vy + cxz * vz)
            wy = -(cyx * vx + cyy * vy + cyz * vz)
            wz = -(czx * vx + czy * vy)
        else:  # rt: transpose pattern
            wx = -(cxx * vx + cyx * vy + czx * vz)
            wy = -(cxy * vx + cyy * vy + czy * vz)
            wz = -(cxz * vx + cyz * vy)
        tx = tx + wx
        ty = ty + wy
        tz = tz + wz
    return tx, ty, tz


def _cross_apply(dx, dy, dz, xy2, r2, invr, zero, wall, which, Rz, h,
                 vx, vy, vz):
    """t = M v for the cross blocks. which='tr' (U from T, wall height =
    z_target) or 'rt' (W from F, wall height = z_source). Core part is the
    antisymmetric [d x] for both."""
    coeffs = _cross_condense(dx, dy, dz, xy2, r2, invr, zero, wall, which,
                             Rz, h)
    return _cross_apply_condensed(coeffs, dx, dy, dz, which, vx, vy, vz)


def _pair_kernel(qtx_ref, qty_ref, qtz_ref, qsx_ref, qsy_ref, qsz_ref,
                 v_ref, out_ref, *, coupling, wall, self_interaction,
                 n_rhs=1):
    i = pl.program_id(0)
    c = pl.program_id(1)
    n_cols = pl.num_programs(1)
    tr = qtx_ref.shape[1]
    tc = qsx_ref.shape[1]

    xt = qtx_ref[0, :]
    yt = qty_ref[0, :]
    zt = qtz_ref[0, :]
    xs = qsx_ref[0, :]
    ys = qsy_ref[0, :]
    zs = qsz_ref[0, :]

    dx = xt[:, None] - xs[None, :]
    dy = yt[:, None] - ys[None, :]
    dz = zt[:, None] - zs[None, :]
    xy2 = dx * dx + dy * dy
    r2 = xy2 + dz * dz

    rows = i * tr + lax.broadcasted_iota(jnp.int32, (tr, tc), 0)
    cols = c * tc + lax.broadcasted_iota(jnp.int32, (tr, tc), 1)
    self_mask = (rows == cols) if self_interaction else (
        jnp.zeros((tr, tc), dtype=bool))
    zero = self_mask | (r2 == 0.0)
    r2s = jnp.where(zero, 1.0, r2)
    invr = lax.rsqrt(r2s)
    Rz = zt[:, None] + zs[None, :] if wall else None
    zsr = zs[None, :]
    ztr = zt[:, None]

    @pl.when(c == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    # condense the pair-block coefficients ONCE; apply them to every RHS
    # column (multi-RHS lockstep solves share the dominant per-pair work)
    if coupling == "grand":
        ctt = _tt_condense(dx, dy, dz, xy2, r2s, invr, self_mask, zero,
                           wall, Rz, zsr)
        ctr = _cross_condense(dx, dy, dz, xy2, r2s, invr, zero, wall,
                              "tr", Rz, ztr)
        crt = _cross_condense(dx, dy, dz, xy2, r2s, invr, zero, wall,
                              "rt", Rz, zsr)
        crr = _rr_condense(dx, dy, dz, xy2, r2s, invr, self_mask, zero,
                           wall, Rz)
        comps = []
        for b in range(n_rhs):
            o = 6 * b
            fx, fy, fz = (v_ref[o + 0, :][None, :], v_ref[o + 1, :][None, :],
                          v_ref[o + 2, :][None, :])
            tx_, ty_, tz_ = (v_ref[o + 3, :][None, :],
                             v_ref[o + 4, :][None, :],
                             v_ref[o + 5, :][None, :])
            # U = Mtt F + Mtr T ; W = Mrt F + Mrr T
            ax, ay, az = _diag_apply(ctt, dx, dy, fx, fy, fz)
            bx, by, bz = _cross_apply_condensed(ctr, dx, dy, dz, "tr",
                                                tx_, ty_, tz_)
            cx, cy, cz = _cross_apply_condensed(crt, dx, dy, dz, "rt",
                                                fx, fy, fz)
            ex, ey, ez_ = _diag_apply(crr, dx, dy, tx_, ty_, tz_)
            comps += [ax + bx, ay + by, az + bz, cx + ex, cy + ey, cz + ez_]
    else:
        if coupling == "tt":
            coeffs = _tt_condense(dx, dy, dz, xy2, r2s, invr, self_mask,
                                  zero, wall, Rz, zsr)
            apply_one = lambda vx, vy, vz: _diag_apply(
                coeffs, dx, dy, vx, vy, vz)
        elif coupling == "rr":
            coeffs = _rr_condense(dx, dy, dz, xy2, r2s, invr, self_mask,
                                  zero, wall, Rz)
            apply_one = lambda vx, vy, vz: _diag_apply(
                coeffs, dx, dy, vx, vy, vz)
        elif coupling == "tr":
            coeffs = _cross_condense(dx, dy, dz, xy2, r2s, invr, zero,
                                     wall, "tr", Rz, ztr)
            apply_one = lambda vx, vy, vz: _cross_apply_condensed(
                coeffs, dx, dy, dz, "tr", vx, vy, vz)
        elif coupling == "rt":
            coeffs = _cross_condense(dx, dy, dz, xy2, r2s, invr, zero,
                                     wall, "rt", Rz, zsr)
            apply_one = lambda vx, vy, vz: _cross_apply_condensed(
                coeffs, dx, dy, dz, "rt", vx, vy, vz)
        else:
            raise ValueError(coupling)
        comps = []
        for b in range(n_rhs):
            o = 3 * b
            comps += list(apply_one(v_ref[o + 0, :][None, :],
                                    v_ref[o + 1, :][None, :],
                                    v_ref[o + 2, :][None, :]))

    for a, t in enumerate(comps):
        out_ref[a, :] += jnp.sum(t, axis=1)


def pair_matvec_pallas(q_src, q_tgt, vec, *, coupling="tt", wall=True,
                       self_interaction=True, row_tile=128, col_tile=None,
                       interpret=False):
    """Fused pairwise matvec in normalized units (lengths already / a,
    z heights already shifted; caller applies damping and 1/(8 pi eta a^k)
    prefactors).

    q_src (Ns,3), q_tgt (Nt,3) float32; vec (Ns, 3) — or (Ns, 6) = (F, T)
    for coupling='grand', with T pre-scaled by 1/a relative to F.
    Returns (Nt, 3) (or (Nt, 6) = (U, W a) for 'grand').

    vec may also stack B right-hand sides as (Ns, nin*B) (b-major
    columns): the per-pair geometry and condensed block coefficients are
    evaluated ONCE and applied to every column; returns (Nt, nout*B)."""
    dtype = jnp.float32
    n_src = q_src.shape[0]
    n_tgt = q_tgt.shape[0]
    nin, nout = _NCOMP[coupling]
    n_rhs = vec.reshape(n_src, -1).shape[1] // nin
    nin, nout = nin * n_rhs, nout * n_rhs
    if col_tile is None:
        # grand evaluates all four blocks per tile (more live temporaries);
        # smaller col tiles keep it inside the Mosaic scoped-VMEM limit
        col_tile = 256 if coupling == "grand" else 512
        if n_rhs > 1:
            col_tile = max(128, col_tile // 2)
    v = vec.reshape(n_src, nin).astype(dtype)
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
    vT = jnp.pad(v, ((0, n_src_pad - n_src), (0, 0))).T  # (nin, n_src_pad)

    grid = (n_tgt_pad // row_tile, n_src_pad // col_tile)
    kernel = functools.partial(_pair_kernel, coupling=coupling, wall=wall,
                               self_interaction=self_interaction,
                               n_rhs=n_rhs)
    row_spec = pl.BlockSpec((1, row_tile), lambda i, c: (0, i),
                            memory_space=pltpu.VMEM)
    col_spec = pl.BlockSpec((1, col_tile), lambda i, c: (0, c),
                            memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, col_spec, col_spec, col_spec,
                  pl.BlockSpec((nin, col_tile), lambda i, c: (0, c),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((nout, row_tile), lambda i, c: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nout, n_tgt_pad), dtype),
        interpret=interpret,
    )(qtx, qty, qtz, qsx, qsy, qsz, vT)
    return out[:, :n_tgt].T
