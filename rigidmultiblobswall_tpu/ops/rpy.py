"""Pairwise Rotne-Prager-Yamakawa (RPY) / Rotne-Prager-Blake mobility blocks.

Pure elementwise math: every function maps batched pair geometry to 3x3
mobility blocks of shape (..., 3, 3). No prefactors are applied here; the
drivers in `mobility.py` multiply by 1/(8 pi eta a^k).

Conventions (matching the reference semantics,
/root/reference/mobility/mobility_numba.py):
  - `d` is the displacement (r_target - r_source) / a, shape (..., 3).
  - `self_mask` marks pairs that are a blob with itself in the primary
    (non-image) box; those use the self-mobility.
  - Wall corrections take the in-plane displacement (dx, dy)/a, the image
    vertical coordinate rz = (z_i + z_j)/a and blob heights z/a; the wall
    is at z = 0.

Physics: RPY tensor with Swan-Brady single-wall corrections
(Blake image system for finite-size particles). The translation-translation
block reference math is mobility_numba.py:194-276; trans-rot :500-537 and
:607-679; rot-trans :892-927 and :998-1066; rot-rot :1137-1178 and
:1249-1321.
"""

from __future__ import annotations

import jax.numpy as jnp


def _safe_r(r2, mask_zero):
    """sqrt(r2) with masked entries replaced by 1 to avoid NaN gradients."""
    r2s = jnp.where(mask_zero, 1.0, r2)
    return jnp.sqrt(r2s)


def _sym3(mxx, mxy, mxz, myy, myz, mzz):
    rows = [
        jnp.stack([mxx, mxy, mxz], axis=-1),
        jnp.stack([mxy, myy, myz], axis=-1),
        jnp.stack([mxz, myz, mzz], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def _mat3(rows9):
    (xx, xy, xz, yx, yy, yz, zx, zy, zz) = rows9
    rows = [
        jnp.stack([xx, xy, xz], axis=-1),
        jnp.stack([yx, yy, yz], axis=-1),
        jnp.stack([zx, zy, zz], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


# ---------------------------------------------------------------------------
# Unbounded RPY blocks
# ---------------------------------------------------------------------------

def rpy_tt(d, self_mask):
    """Translation-translation RPY block (units of 1/(8 pi eta a)).

    far (r>2):  M = (c1 I + c2 d d) / r,  c1 = 1 + 2/(3 r^2),
                c2 = (1 - 2/r^2)/r^2
    near (r<=2): M = c1n I + c2n d d,     c1n = 4/3 (1 - 9r/32),
                c2n = (4/3)(3/32)/r
    self:       M = 4/3 I
    """
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    r2 = dx * dx + dy * dy + dz * dz
    zero = self_mask | (r2 == 0.0)
    r = _safe_r(r2, zero)
    invr = 1.0 / r
    invr2 = invr * invr

    four_thirds = 4.0 / 3.0
    far = r > 2.0
    c1_far = (1.0 + (2.0 / 3.0) * invr2) * invr
    c2_far = (1.0 - 2.0 * invr2) * invr2 * invr
    c1_near = four_thirds * (1.0 - 0.28125 * r)
    c2_near = four_thirds * 0.09375 * invr

    c1 = jnp.where(far, c1_far, c1_near)
    c2 = jnp.where(far, c2_far, c2_near)
    c1 = jnp.where(zero, 0.0, c1)
    c2 = jnp.where(zero, 0.0, c2)
    diag_self = jnp.where(self_mask, four_thirds, 0.0)

    mxx = c1 + c2 * dx * dx + diag_self
    myy = c1 + c2 * dy * dy + diag_self
    mzz = c1 + c2 * dz * dz + diag_self
    mxy = c2 * dx * dy
    mxz = c2 * dx * dz
    myz = c2 * dy * dz
    return _sym3(mxx, mxy, mxz, myy, myz, mzz)


def rpy_rr(d, self_mask):
    """Rotation-rotation RPY block (units of 1/(8 pi eta a^3)).

    far (r>=2): M = (-1/2 I + (3/2) dhat dhat) / r^3
    near:       M = c1 I + c2 d d,
                c1 = 1 - 27 r/32 + 5 r^3/64, c2 = 9/(32 r) - 3 r/64
    self:       M = I
    """
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    r2 = dx * dx + dy * dy + dz * dz
    zero = self_mask | (r2 == 0.0)
    r = _safe_r(r2, zero)
    invr = 1.0 / r
    invr2 = invr * invr
    invr3 = invr2 * invr

    far = r >= 2.0
    c1_far = -0.5 * invr3
    c2_far = 1.5 * invr2 * invr3
    c1_near = 1.0 - 0.84375 * r + 0.078125 * (r2 * r)
    c2_near = 0.28125 * invr - 0.046875 * r

    c1 = jnp.where(far, c1_far, c1_near)
    c2 = jnp.where(far, c2_far, c2_near)
    c1 = jnp.where(zero, 0.0, c1)
    c2 = jnp.where(zero, 0.0, c2)
    diag_self = jnp.where(self_mask, 1.0, 0.0)

    mxx = c1 + c2 * dx * dx + diag_self
    myy = c1 + c2 * dy * dy + diag_self
    mzz = c1 + c2 * dz * dz + diag_self
    mxy = c2 * dx * dy
    mxz = c2 * dx * dz
    myz = c2 * dy * dz
    return _sym3(mxx, mxy, mxz, myy, myz, mzz)


def rpy_cross(d, self_mask):
    """Trans-rot coupling block (units of 1/(8 pi eta a^2)).

    The same antisymmetric kernel serves both couplings:
      U_i += M(d_ij) T_j   (velocity from torque)
      W_i += M(d_ij) F_j   (angular velocity from force)

    far (r>=2): M = [d x] / r^3  (i.e. Mxy = dz/r^3, Mxz = -dy/r^3,
                Myz = dx/r^3, antisymmetric)
    near:       M = c1 [d x],    c1 = (1 - 3r/8)/2
    self:       0
    """
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    r2 = dx * dx + dy * dy + dz * dz
    zero = self_mask | (r2 == 0.0)
    r = _safe_r(r2, zero)
    invr3 = 1.0 / (r2 * r + jnp.where(zero, 1.0, 0.0))

    far = r >= 2.0
    c = jnp.where(far, invr3, 0.5 * (1.0 - 0.375 * r))
    c = jnp.where(zero, 0.0, c)

    zeros = jnp.zeros_like(c)
    mxy = c * dz
    mxz = -c * dy
    myz = c * dx
    return _mat3((zeros, mxy, mxz, -mxy, zeros, myz, -mxz, -myz, zeros))


# ---------------------------------------------------------------------------
# Single-wall (Swan-Brady / Blake image) corrections. Additive on the RPY
# blocks, same unit conventions. The wall sits at z=0.
# ---------------------------------------------------------------------------

def wall_tt(dx, dy, rz, hs, self_mask):
    """Wall correction to the translation-translation block.

    dx, dy: in-plane displacement (target - source)/a (image-projected).
    rz:     (z_target + z_source)/a  — vertical image distance.
    hs:     z_source/a.
    Self terms use 1/z expansions; pair terms the Swan-Brady scalar set
    (fact1..fact5 in mobility_numba.py:262-276).
    """
    inv_z = 1.0 / jnp.where(self_mask, hs, 1.0)
    inv_z3 = inv_z**3
    inv_z5 = inv_z3 * inv_z * inv_z
    self_xx = -(9.0 * inv_z - 2.0 * inv_z3 + inv_z5) / 12.0
    self_zz = -(9.0 * inv_z - 4.0 * inv_z3 + inv_z5) / 6.0

    R2 = dx * dx + dy * dy + rz * rz
    invR = 1.0 / _safe_r(R2, self_mask)
    ex = dx * invR
    ey = dy * invR
    ez = rz * invR
    invR3 = invR * invR * invR
    invR5 = invR3 * invR * invR
    h_hat = hs / rz
    hh = h_hat * (1.0 - h_hat)
    ez2 = ez * ez

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

    sm = self_mask
    mxx = jnp.where(sm, self_xx, f1 + f2 * ex * ex)
    myy = jnp.where(sm, self_xx, f1 + f2 * ey * ey)
    mzz = jnp.where(sm, self_zz, f1 + f2 * ez * ez + f3 * ez + f4 * ez + f5)
    mxy = jnp.where(sm, 0.0, f2 * ex * ey)
    mxz = jnp.where(sm, 0.0, f2 * ex * ez + f3 * ex)
    myz = jnp.where(sm, 0.0, f2 * ey * ez + f3 * ey)
    mzx = jnp.where(sm, 0.0, f2 * ez * ex + f4 * ex)
    mzy = jnp.where(sm, 0.0, f2 * ez * ey + f4 * ey)
    return _mat3((mxx, mxy, mxz, mxy, myy, myz, mzx, mzy, mzz))


def _wall_cross_core(dx, dy, rz, h):
    """Scalar set of the wall trans-torque correction in the UT component
    pattern (mobility_numba.py:659-679). The rot-force (WF) pattern is the
    transpose of this matrix (mobility_numba.py:1046-1066); callers handle
    argument reflection and transposition."""
    R2 = dx * dx + dy * dy + rz * rz
    invR = 1.0 / jnp.sqrt(jnp.where(R2 == 0.0, 1.0, R2))
    invR2 = invR * invR
    invR4 = invR2 * invR2
    ex = dx * invR
    ey = dy * invR
    ez = rz * invR
    h_hat = h / rz

    f1 = invR2
    f2 = (6.0 * h_hat * ez * ez * invR2 + (1.0 - 10.0 * ez * ez) * invR4) * 2.0
    f3 = -ez * (3.0 * h_hat * invR2 - 5.0 * invR4) * 2.0
    f4 = -ez * (h_hat * invR2 - invR4) * 2.0

    zeros = jnp.zeros_like(f1)
    # Correction is SUBTRACTED from the block: M -= corr.
    cxx = -f3 * ex * ey
    cxy = -f1 * ez + f3 * ex * ex - f4
    cxz = f1 * ey
    cyx = f1 * ez - f3 * ey * ey + f4
    cyy = f3 * ex * ey
    cyz = -f1 * ex
    czx = -f1 * ey - f2 * ey - f3 * ey * ez
    czy = f1 * ex + f2 * ex + f3 * ex * ez
    return _mat3((cxx, cxy, cxz, cyx, cyy, cyz, czx, czy, zeros))


def wall_rot_force(dx, dy, rz, hs, self_mask):
    """Wall correction for the rot-trans block (W_i from F_j).

    Pair term uses source height hs = z_source/a; self term is the
    antisymmetric 3/(24 z^4) coupling (mobility_numba.py:1040-1066).
    Returned block is additive (the internal subtraction is already
    folded in).
    """
    inv_z = 1.0 / jnp.where(self_mask, hs, 1.0)
    inv_z4 = inv_z**4
    self_xy = -inv_z4 * 0.125  # Mxy += -z^-4/8, Myx += +z^-4/8 (:1043-1044)

    # WF pattern = transpose of the UT pattern at the same geometry
    corr = jnp.swapaxes(_wall_cross_core(dx, dy, rz, hs), -1, -2)
    corr = -corr  # M -= corr

    sm = self_mask[..., None, None]
    self_block = jnp.zeros_like(corr)
    self_block = self_block.at[..., 0, 1].set(self_xy)
    self_block = self_block.at[..., 1, 0].set(-self_xy)
    return jnp.where(sm, self_block, corr)


def wall_trans_torque(dx, dy, rz, ht, self_mask):
    """Wall correction for the trans-rot block (U_i from T_j).

    The reference evaluates the rot-force correction at the reflected
    geometry: displacement negated in-plane and h = z_target/a
    (mobility_numba.py:646-679). ht: z_target/a.
    """
    inv_z = 1.0 / jnp.where(self_mask, ht, 1.0)
    inv_z4 = inv_z**4
    self_xy = inv_z4 * 0.125  # Mxy += +z^-4/8, Myx += -z^-4/8 (:656-657)

    corr = _wall_cross_core(-dx, -dy, rz, ht)
    corr = -corr

    sm = self_mask[..., None, None]
    self_block = jnp.zeros_like(corr)
    self_block = self_block.at[..., 0, 1].set(self_xy)
    self_block = self_block.at[..., 1, 0].set(-self_xy)
    return jnp.where(sm, self_block, corr)


def wall_rr(dx, dy, rz, hs, self_mask):
    """Wall correction for the rotation-rotation block
    (mobility_numba.py:1292-1321). hs: z_source/a (equals z_target for the
    self term, the only place a height enters)."""
    inv_z = 1.0 / jnp.where(self_mask, hs, 1.0)
    inv_z3 = inv_z**3
    self_xx = -inv_z3 * 0.3125
    self_zz = -inv_z3 * 0.125

    R2 = dx * dx + dy * dy + rz * rz
    invR = 1.0 / _safe_r(R2, self_mask)
    invR3 = invR * invR * invR
    ex = dx * invR
    ey = dy * invR
    ez = rz * invR

    f1 = (1.0 - 6.0 * ez * ez) * invR3 * 0.5
    f2 = -1.5 * invR3
    f3 = 3.0 * invR3 * ez
    f4 = 3.0 * invR3

    sm = self_mask
    mxx = jnp.where(sm, self_xx, f1 + f2 * ex * ex + f4 * ey * ey)
    myy = jnp.where(sm, self_xx, f1 + f2 * ey * ey + f4 * ex * ex)
    mzz = jnp.where(sm, self_zz, f1 + f2 * ez * ez + f3 * ez)
    mxy = jnp.where(sm, 0.0, (f2 - f4) * ex * ey)
    mxz = jnp.where(sm, 0.0, f2 * ex * ez)
    myz = jnp.where(sm, 0.0, f2 * ey * ez)
    mzx = jnp.where(sm, 0.0, f2 * ez * ex + f3 * ex)
    mzy = jnp.where(sm, 0.0, f2 * ez * ey + f3 * ey)
    return _mat3((mxx, mxy, mxz, mxy, myy, myz, mzx, mzy, mzz))


# ---------------------------------------------------------------------------
# In-plane variant: z-coupling rows/columns of the TT block suppressed
# (particles constrained to move in a horizontal plane),
# mobility_numba.py:291-437.
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Different-radii RPY (source radius b, target radius a), physical units,
# prefactor 1/(8 pi eta). Reference math:
# mobility_numba.py:1553-1647 (mobility_trans_times_force_source_target).
# ---------------------------------------------------------------------------

def rpy_tt_radii(d, a_tgt, b_src):
    """TT block for blobs of different radii; d is the PHYSICAL displacement
    (target - source), a_tgt/b_src broadcastable radii."""
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    r2_raw = dx * dx + dy * dy + dz * dz
    zero = r2_raw == 0.0
    r2 = jnp.where(zero, 1.0, r2_raw)  # safe denominators; zero pairs use near
    r = jnp.sqrt(r2)
    r3 = r2 * r
    a = a_tgt
    b = b_src
    a2 = a * a
    b2 = b * b
    s2 = a2 + b2

    c1_far = (1.0 + s2 / (3.0 * r2)) / r
    c2_far = ((1.0 - s2 / r2) / r2) / r
    four_thirds = 4.0 / 3.0
    dd2 = (b - a) ** 2
    c1_mid = ((16.0 * (b + a) * r3 - (dd2 + 3.0 * r2) ** 2)
              / (32.0 * r3)) * four_thirds / (b * a)
    c2_mid = ((3.0 * (dd2 - r2) ** 2 / (32.0 * r3)) / r2) * four_thirds / (b * a)
    c1_near = four_thirds / jnp.maximum(a, b)

    far = (~zero) & (r > (a + b))
    mid = (~zero) & (~far) & (r > jnp.abs(b - a))
    c1 = jnp.where(far, c1_far, jnp.where(mid, c1_mid, c1_near))
    c2 = jnp.where(far, c2_far, jnp.where(mid, c2_mid, 0.0))

    mxx = c1 + c2 * dx * dx
    myy = c1 + c2 * dy * dy
    mzz = c1 + c2 * dz * dz
    mxy = c2 * dx * dy
    mxz = c2 * dx * dz
    myz = c2 * dy * dz
    return _sym3(mxx, mxy, mxz, myy, myz, mzz)


def wall_tt_radii(dx, dy, rz, x3, y3, a_tgt, b_src):
    """Finite-size wall image correction for different radii, physical
    units (mobility_numba.py:1582-1647). dx, dy: in-plane displacement;
    rz = z_tgt + z_src; x3 = z_tgt; y3 = z_src."""
    a2 = a_tgt * a_tgt
    b2 = b_src * b_src
    r2 = dx * dx + dy * dy + rz * rz
    r = jnp.sqrt(jnp.where(r2 == 0.0, 1.0, r2))
    inv_r = 1.0 / r
    inv_r2 = inv_r * inv_r
    inv_r3 = inv_r2 * inv_r
    inv_r5 = inv_r3 * inv_r2
    inv_r7 = inv_r5 * inv_r2
    inv_r9 = inv_r7 * inv_r2
    s2 = a2 + b2

    # term 1: image RPY-like (negated stokeslet with sign flips on z column)
    t1c1 = (1.0 + s2 / (3.0 * r2)) * inv_r
    t1c2 = (1.0 - s2 / r2) * inv_r2 * inv_r
    xx = -(t1c1 + t1c2 * dx * dx)
    xy = -(t1c2 * dx * dy)
    xz = +(t1c2 * dx * rz)
    yx = -(t1c2 * dy * dx)
    yy = -(t1c1 + t1c2 * dy * dy)
    yz = +(t1c2 * dy * rz)
    zx = -(t1c2 * rz * dx)
    zy = -(t1c2 * rz * dy)
    zz = +(t1c1 + t1c2 * rz * rz)

    # term 2: Stokes doublet + source dipole pieces with x3*y3 prefactor
    xy3 = x3 * y3
    xx += -2.0 * (xy3 * (inv_r3 - 3.0 * dx * dx * inv_r5))
    xy += -2.0 * (xy3 * (-3.0 * dx * dy * inv_r5))
    xz += 2.0 * (-dx * x3 * inv_r3 + xy3 * (-3.0 * dx * rz * inv_r5))
    yx += -2.0 * (xy3 * (-3.0 * dy * dx * inv_r5))
    yy += -2.0 * (xy3 * (inv_r3 - 3.0 * dy * dy * inv_r5))
    yz += 2.0 * (-dy * x3 * inv_r3 + xy3 * (-3.0 * dy * rz * inv_r5))
    zx += -2.0 * (-y3 * dx * inv_r3 + xy3 * (-3.0 * rz * dx * inv_r5))
    zy += -2.0 * (-y3 * dy * inv_r3 + xy3 * (-3.0 * rz * dy * inv_r5))
    zz += 2.0 * (-inv_r - rz * x3 * inv_r3 - y3 * rz * inv_r3
                 + xy3 * (inv_r3 - 3.0 * rz * rz * inv_r5))

    # term 3: finite-size (a^2) correction
    ca = 2.0 * a2 / 3.0
    xx += -ca * (-y3 * (3.0 * rz * inv_r5 - 15.0 * rz * dx * dx * inv_r7))
    xy += -ca * (-y3 * (-15.0 * rz * dx * dy * inv_r7))
    xz += ca * (3.0 * dx * rz * inv_r5
                - y3 * (3.0 * dx * inv_r5 - 15.0 * rz * dx * rz * inv_r7))
    yx += -ca * (-y3 * (-15.0 * rz * dy * dx * inv_r7))
    yy += -ca * (-y3 * (3.0 * rz * inv_r5 - 15.0 * rz * dy * dy * inv_r7))
    yz += ca * (3.0 * dy * rz * inv_r5
                - y3 * (3.0 * dy * inv_r5 - 15.0 * rz * dy * rz * inv_r7))
    zx += -ca * (-y3 * (3.0 * dx * inv_r5 - 15.0 * rz * rz * dx * inv_r7))
    zy += -ca * (-y3 * (3.0 * dy * inv_r5 - 15.0 * rz * rz * dy * inv_r7))
    zz += ca * (-inv_r3 + 3.0 * rz * rz * inv_r5
                - y3 * (9.0 * rz * inv_r5 - 15.0 * rz**3 * inv_r7))

    # term 4: finite-size (b^2) correction
    cb = 2.0 * b2 / 3.0
    xx += -cb * (-x3 * (3.0 * rz * inv_r5 - 15.0 * rz * dx * dx * inv_r7))
    xy += -cb * (-x3 * (-15.0 * rz * dx * dy * inv_r7))
    xz += cb * (-x3 * (3.0 * dx * inv_r5 - 15.0 * rz * dx * rz * inv_r7))
    yx += -cb * (-x3 * (-15.0 * rz * dy * dx * inv_r7))
    yy += -cb * (-x3 * (3.0 * rz * inv_r5 - 15.0 * rz * dy * dy * inv_r7))
    yz += cb * (-x3 * (3.0 * dy * inv_r5 - 15.0 * rz * dy * rz * inv_r7))
    zx += -cb * (3.0 * rz * dx * inv_r5
                 - x3 * (3.0 * dx * inv_r5 - 15.0 * rz * rz * dx * inv_r7))
    zy += -cb * (3.0 * rz * dy * inv_r5
                 - x3 * (3.0 * dy * inv_r5 - 15.0 * rz * rz * dy * inv_r7))
    zz += cb * (-inv_r3 + 3.0 * rz * rz * inv_r5
                - x3 * (9.0 * rz * inv_r5 - 15.0 * rz**3 * inv_r7))

    # term 5: a^2 b^2 source-dipole-of-image correction
    cab = 2.0 * a2 * b2 / 3.0
    xx += -cab * (-inv_r5 + 5.0 * rz * rz * inv_r7 + 5.0 * dx * dx * inv_r7
                  - 35.0 * rz * rz * dx * dx * inv_r9)
    xy += -cab * (5.0 * dx * dy * inv_r7 - 35.0 * rz * rz * dx * dy * inv_r9)
    xz += cab * (15.0 * dx * rz * inv_r7 - 35.0 * rz**3 * dx * inv_r9)
    yx += -cab * (5.0 * dy * dx * inv_r7 - 35.0 * rz * rz * dy * dx * inv_r9)
    yy += -cab * (-inv_r5 + 5.0 * rz * rz * inv_r7 + 5.0 * dy * dy * inv_r7
                  - 35.0 * rz * rz * dy * dy * inv_r9)
    yz += cab * (15.0 * dy * rz * inv_r7 - 35.0 * rz**3 * dy * inv_r9)
    zx += -cab * (15.0 * rz * dx * inv_r7 - 35.0 * rz**3 * dx * inv_r9)
    zy += -cab * (15.0 * rz * dy * inv_r7 - 35.0 * rz**3 * dy * inv_r9)
    zz += cab * (-3.0 * inv_r5 + 30.0 * rz * rz * inv_r7
                 - 35.0 * rz**4 * inv_r9)

    return _mat3((xx, xy, xz, yx, yy, yz, zx, zy, zz))


def free_surface_tt(d, rz_img, self_mask):
    """TT block above a free surface (slip plane at z=0): RPY plus its
    image with the z-column reflected, M += M_RPY(R_img) diag(1,1,-1)
    (mobility_numba.py:1769-1937). rz_img = (z_t + z_s)/a; the image term
    applies to self pairs too (no separate self branch)."""
    m = rpy_tt(d, self_mask)
    d_img = d.at[..., 2].set(rz_img)
    m_img = rpy_tt(d_img, jnp.zeros_like(self_mask))
    refl = jnp.asarray([1.0, 1.0, -1.0], dtype=m.dtype)
    return m + m_img * refl


def _z_coupling_mask(dtype):
    zmask = jnp.ones((3, 3), dtype=dtype)
    zmask = zmask.at[2, 2].set(0.0)
    zmask = zmask.at[0, 2].set(0.0).at[1, 2].set(0.0)
    zmask = zmask.at[2, 0].set(0.0).at[2, 1].set(0.0)
    return zmask


def rpy_tt_in_plane(d, self_mask):
    """TT block with the z row and column zeroed: the reference's in-plane
    product only ever uses the xy sub-block and forces u_z = 0
    (mobility_numba.py:354-435)."""
    m = rpy_tt(d, self_mask)
    return m * _z_coupling_mask(m.dtype)


def wall_tt_in_plane(dx, dy, rz, hs, self_mask):
    """Wall TT correction with z couplings suppressed; the self term only
    corrects the xx/yy components (mobility_numba.py:397-437)."""
    m = wall_tt(dx, dy, rz, hs, self_mask)
    return m * _z_coupling_mask(m.dtype)
