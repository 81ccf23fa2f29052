#!/usr/bin/env python
"""Derive the image-multipole channel decomposition of the Swan-Brady
single-wall mobility correction, and emit generated JAX/numpy kernel code.

Math (derivation, not a port — the reference only ships the pointwise
pair formulas, mobility/mobility_numba.py:1553-1647):

The wall correction W(dx, dy, rz, x3, y3, a, b) (physical units, prefactor
1/(8 pi eta), rz = x3 + y3 the image-vector z component) becomes, after
substituting the target height x3 = rz - h (h := y3 the SOURCE height), a
polynomial in h of degree exactly 2:

    W = -RPY_s2(R) . D  +  T0(R)  +  h T1(R)  +  h^2 T2(R),

where R = (dx, dy, rz) is the image displacement, D = diag(1,1,-1), and
RPY_s2 is the far-form RPY tensor with s^2 = a^2 + b^2. Each channel
kernel T_m is itself a linear combination of derivative operators applied
to the two radial generators r and 1/r:

    T_m = sum_q  c_q * O_q(del) del_z^p [ r  or  1/r ],
    O_q in { delta_ij, del_i del_j, delta_i3 del_j, del_i delta_j3,
             delta_i3 delta_j3 }.

This operator form is what makes the spectral wall engine possible:
 * k-space multiplier of each channel = O_q(ik)(ik_z)^p FT{r or 1/r}
   with FT[r] = -8 pi / k^4, FT[1/r] = 4 pi / k^2  (rational in k);
 * screened near-field correction = the same operator combination applied
   to g4 = r - IFT[-8 pi phi/k^4] and g2 = 1/r - IFT[4 pi phi/k^2]
   (smooth erfc/Gaussian radial functions; phi = Hasimoto splitter).

The script fits the rational coefficients c_q numerically (f64 lstsq over
random configurations), rounds them to exact rationals, verifies the
reconstruction at 50-digit precision, and writes
rigidmultiblobswall_tpu/ops/_wall_channels_gen.py containing:
 * CHANNELS: the fitted (channel, radius-monomial) -> [(op, base, p, coeff)]
   term table,
 * code to evaluate exact channels, k-multipliers and screened kernels.

Run:  python tools/gen_wall_channels.py   (rewrites the generated module)
"""

import itertools
import os
import sys
from fractions import Fraction

import numpy as np
import sympy as sp

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "..", "rigidmultiblobswall_tpu", "ops",
                   "_wall_channels_gen.py")

dx, dy, rz, x3, y3, a, b, h = sp.symbols("dx dy rz x3 y3 a b h",
                                         positive=True)
X = (dx, dy, rz)
r = sp.sqrt(dx * dx + dy * dy + rz * rz)


def wall_tt_radii_sym():
    """The Swan-Brady finite-size wall correction, physical units
    (transcribed from rigidmultiblobswall_tpu/ops/rpy.py::wall_tt_radii,
    itself the reference math of mobility_numba.py:1582-1647)."""
    a2, b2 = a * a, b * b
    r2 = dx * dx + dy * dy + rz * rz
    rr = sp.sqrt(r2)
    ir = 1 / rr
    ir2, ir3 = ir * ir, ir**3
    ir5, ir7, ir9 = ir**5, ir**7, ir**9
    s2 = a2 + b2

    t1c1 = (1 + s2 / (3 * r2)) * ir
    t1c2 = (1 - s2 / r2) * ir2 * ir
    M = sp.zeros(3, 3)
    xx = -(t1c1 + t1c2 * dx * dx)
    xy = -(t1c2 * dx * dy)
    xz = +(t1c2 * dx * rz)
    yx = -(t1c2 * dy * dx)
    yy = -(t1c1 + t1c2 * dy * dy)
    yz = +(t1c2 * dy * rz)
    zx = -(t1c2 * rz * dx)
    zy = -(t1c2 * rz * dy)
    zz = +(t1c1 + t1c2 * rz * rz)

    xy3 = x3 * y3
    xx += -2 * (xy3 * (ir3 - 3 * dx * dx * ir5))
    xy += -2 * (xy3 * (-3 * dx * dy * ir5))
    xz += 2 * (-dx * x3 * ir3 + xy3 * (-3 * dx * rz * ir5))
    yx += -2 * (xy3 * (-3 * dy * dx * ir5))
    yy += -2 * (xy3 * (ir3 - 3 * dy * dy * ir5))
    yz += 2 * (-dy * x3 * ir3 + xy3 * (-3 * dy * rz * ir5))
    zx += -2 * (-y3 * dx * ir3 + xy3 * (-3 * rz * dx * ir5))
    zy += -2 * (-y3 * dy * ir3 + xy3 * (-3 * rz * dy * ir5))
    zz += 2 * (-ir - rz * x3 * ir3 - y3 * rz * ir3
               + xy3 * (ir3 - 3 * rz * rz * ir5))

    ca = 2 * a2 / 3
    xx += -ca * (-y3 * (3 * rz * ir5 - 15 * rz * dx * dx * ir7))
    xy += -ca * (-y3 * (-15 * rz * dx * dy * ir7))
    xz += ca * (3 * dx * rz * ir5
                - y3 * (3 * dx * ir5 - 15 * rz * dx * rz * ir7))
    yx += -ca * (-y3 * (-15 * rz * dy * dx * ir7))
    yy += -ca * (-y3 * (3 * rz * ir5 - 15 * rz * dy * dy * ir7))
    yz += ca * (3 * dy * rz * ir5
                - y3 * (3 * dy * ir5 - 15 * rz * dy * rz * ir7))
    zx += -ca * (-y3 * (3 * dx * ir5 - 15 * rz * rz * dx * ir7))
    zy += -ca * (-y3 * (3 * dy * ir5 - 15 * rz * rz * dy * ir7))
    zz += ca * (-ir3 + 3 * rz * rz * ir5
                - y3 * (9 * rz * ir5 - 15 * rz**3 * ir7))

    cb = 2 * b2 / 3
    xx += -cb * (-x3 * (3 * rz * ir5 - 15 * rz * dx * dx * ir7))
    xy += -cb * (-x3 * (-15 * rz * dx * dy * ir7))
    xz += cb * (-x3 * (3 * dx * ir5 - 15 * rz * dx * rz * ir7))
    yx += -cb * (-x3 * (-15 * rz * dy * dx * ir7))
    yy += -cb * (-x3 * (3 * rz * ir5 - 15 * rz * dy * dy * ir7))
    yz += cb * (-x3 * (3 * dy * ir5 - 15 * rz * dy * rz * ir7))
    zx += -cb * (3 * rz * dx * ir5
                 - x3 * (3 * dx * ir5 - 15 * rz * rz * dx * ir7))
    zy += -cb * (3 * rz * dy * ir5
                 - x3 * (3 * dy * ir5 - 15 * rz * rz * dy * ir7))
    zz += cb * (-ir3 + 3 * rz * rz * ir5
                - x3 * (9 * rz * ir5 - 15 * rz**3 * ir7))

    cab = 2 * a2 * b2 / 3
    xx += -cab * (-ir5 + 5 * rz * rz * ir7 + 5 * dx * dx * ir7
                  - 35 * rz * rz * dx * dx * ir9)
    xy += -cab * (5 * dx * dy * ir7 - 35 * rz * rz * dx * dy * ir9)
    xz += cab * (15 * dx * rz * ir7 - 35 * rz**3 * dx * ir9)
    yx += -cab * (5 * dy * dx * ir7 - 35 * rz * rz * dy * dx * ir9)
    yy += -cab * (-ir5 + 5 * rz * rz * ir7 + 5 * dy * dy * ir7
                  - 35 * rz * rz * dy * dy * ir9)
    yz += cab * (15 * dy * rz * ir7 - 35 * rz**3 * dy * ir9)
    zx += -cab * (15 * rz * dx * ir7 - 35 * rz**3 * dx * ir9)
    zy += -cab * (15 * rz * dy * ir7 - 35 * rz**3 * dy * ir9)
    zz += cab * (-3 * ir5 + 30 * rz * rz * ir7 - 35 * rz**4 * ir9)

    M[0, 0], M[0, 1], M[0, 2] = xx, xy, xz
    M[1, 0], M[1, 1], M[1, 2] = yx, yy, yz
    M[2, 0], M[2, 1], M[2, 2] = zx, zy, zz
    return M


def rpy_s2_far_times_D():
    """RPY far-form with s^2 = a^2 + b^2, right-multiplied by
    D = diag(1,1,-1): the image-Stokeslet piece that merges into the
    engine's existing sinc^2 channel (strength -D f at image points)."""
    s2 = a * a + b * b
    r2 = dx * dx + dy * dy + rz * rz
    rr = sp.sqrt(r2)
    c1 = (1 + s2 / (3 * r2)) / rr
    c2 = (1 - s2 / r2) / (r2 * rr)
    M = sp.zeros(3, 3)
    for i, Xi in enumerate(X):
        for j, Xj in enumerate(X):
            M[i, j] = (c1 if i == j else 0) + c2 * Xi * Xj
    D = sp.diag(1, 1, -1)
    return M * D


def wall_cross_core_sym():
    """Sympy transcription of ops/rpy.py::_wall_cross_core (the UT
    component pattern of the wall trans-torque correction,
    mobility_numba.py:659-679). Lengths in blob-radius units; the pair
    blocks derive from it by reflection/transposition (see rpy.py)."""
    R2 = dx * dx + dy * dy + rz * rz
    invR = 1 / sp.sqrt(R2)
    invR2 = invR * invR
    invR4 = invR2 * invR2
    ex, ey, ez = dx * invR, dy * invR, rz * invR
    h_hat = h / rz
    f1 = invR2
    f2 = (6 * h_hat * ez * ez * invR2 + (1 - 10 * ez * ez) * invR4) * 2
    f3 = -ez * (3 * h_hat * invR2 - 5 * invR4) * 2
    f4 = -ez * (h_hat * invR2 - invR4) * 2
    M = sp.zeros(3, 3)
    M[0, 0] = -f3 * ex * ey
    M[0, 1] = -f1 * ez + f3 * ex * ex - f4
    M[0, 2] = f1 * ey
    M[1, 0] = f1 * ez - f3 * ey * ey + f4
    M[1, 1] = f3 * ex * ey
    M[1, 2] = -f1 * ex
    M[2, 0] = -f1 * ey - f2 * ey - f3 * ey * ez
    M[2, 1] = f1 * ex + f2 * ex + f3 * ex * ez
    return M


def wall_rr_pair_sym():
    """Sympy transcription of the PAIR part of ops/rpy.py::wall_rr
    (mobility_numba.py:1292-1321); self term handled by the engine."""
    R2 = dx * dx + dy * dy + rz * rz
    invR = 1 / sp.sqrt(R2)
    invR3 = invR**3
    ex, ey, ez = dx * invR, dy * invR, rz * invR
    f1 = (1 - 6 * ez * ez) * invR3 / 2
    f2 = -sp.Rational(3, 2) * invR3
    f3 = 3 * invR3 * ez
    f4 = 3 * invR3
    M = sp.zeros(3, 3)
    M[0, 0] = f1 + f2 * ex * ex + f4 * ey * ey
    M[1, 1] = f1 + f2 * ey * ey + f4 * ex * ex
    M[2, 2] = f1 + f2 * ez * ez + f3 * ez
    M[0, 1] = (f2 - f4) * ex * ey
    M[1, 0] = (f2 - f4) * ex * ey
    M[0, 2] = f2 * ex * ez
    M[2, 0] = f2 * ez * ex + f3 * ex
    M[1, 2] = f2 * ey * ez
    M[2, 1] = f2 * ez * ey + f3 * ey
    return M


# ---------------------------------------------------------------------------
# Basis: O(del) del_z^p applied to base in {r (f4), 1/r (f2)}
# ---------------------------------------------------------------------------

OPS = ("iso", "hess", "zrow", "zcol", "zz")
# pseudo-tensor ops (rank-2, one epsilon contraction with {del, z-hat}):
#   curl      A_ij = eps_ijk del_k g
#   eps3      A_ij = eps_ij3 g
#   zcurlgrad A_ij = eps_i3k del_k del_j g
#   gradzcurl A_ij = del_i eps_j3k del_k g
#   zcurlzcol A_ij = eps_i3k del_k g delta_j3
#   zrowzcurl A_ij = delta_i3 eps_j3k del_k g
POPS = ("curl", "eps3", "zcurlgrad", "gradzcurl", "zcurlzcol", "zrowzcurl")
MAX_P = 6

EPS3 = np.zeros((3, 3, 3))
EPS3[0, 1, 2] = EPS3[1, 2, 0] = EPS3[2, 0, 1] = 1
EPS3[0, 2, 1] = EPS3[2, 1, 0] = EPS3[1, 0, 2] = -1


def _op_entries(op, f, diff):
    """3x3 matrix of operator `op` applied to scalar f with derivative
    callable diff(expr, axis_index); shared by the exact and the
    radial-symbolic constructions."""
    M = sp.zeros(3, 3)
    if op == "iso":
        for i in range(3):
            M[i, i] = f
    elif op == "hess":
        for i in range(3):
            for j in range(3):
                M[i, j] = diff(diff(f, i), j)
    elif op == "zrow":         # delta_i3 del_j f
        for j in range(3):
            M[2, j] = diff(f, j)
    elif op == "zcol":         # del_i f delta_j3
        for i in range(3):
            M[i, 2] = diff(f, i)
    elif op == "zz":
        M[2, 2] = f
    elif op == "curl":         # eps_ijk del_k f
        for i in range(3):
            for j in range(3):
                e = sum(int(EPS3[i, j, k]) * diff(f, k) for k in range(3)
                        if EPS3[i, j, k])
                M[i, j] = e if e != 0 else sp.Integer(0)
    elif op == "eps3":         # eps_ij3 f
        M[0, 1] = f
        M[1, 0] = -f
    elif op == "zcurlgrad":    # eps_i3k del_k del_j f
        for i in range(3):
            for j in range(3):
                e = sum(int(EPS3[i, 2, k]) * diff(diff(f, k), j)
                        for k in range(3) if EPS3[i, 2, k])
                M[i, j] = e if e != 0 else sp.Integer(0)
    elif op == "gradzcurl":    # del_i eps_j3k del_k f
        for i in range(3):
            for j in range(3):
                e = sum(int(EPS3[j, 2, k]) * diff(diff(f, k), i)
                        for k in range(3) if EPS3[j, 2, k])
                M[i, j] = e if e != 0 else sp.Integer(0)
    elif op == "zcurlzcol":    # eps_i3k del_k f delta_j3
        for i in range(3):
            e = sum(int(EPS3[i, 2, k]) * diff(f, k) for k in range(3)
                    if EPS3[i, 2, k])
            M[i, 2] = e if e != 0 else sp.Integer(0)
    elif op == "zrowzcurl":    # delta_i3 eps_j3k del_k f
        for j in range(3):
            e = sum(int(EPS3[j, 2, k]) * diff(f, k) for k in range(3)
                    if EPS3[j, 2, k])
            M[2, j] = e if e != 0 else sp.Integer(0)
    else:
        raise ValueError(op)
    return M


def basis_matrix(op, base, p):
    f = r if base == 4 else 1 / r
    f = sp.diff(f, rz, p)
    return _op_entries(op, f, lambda e, i: sp.diff(e, X[i]))


_OP_EXTRA_DEG = {"iso": 0, "hess": -2, "zrow": -1, "zcol": -1, "zz": 0,
                 "curl": -1, "eps3": 0, "zcurlgrad": -2, "gradzcurl": -2,
                 "zcurlzcol": -1, "zrowzcurl": -1}


def basis_degree(op, base, p):
    d = (1 if base == 4 else -1) - p
    return d + _OP_EXTRA_DEG[op]


_OP_N_DERIVS = {"iso": 0, "hess": 2, "zrow": 1, "zcol": 1, "zz": 0,
                "curl": 1, "eps3": 0, "zcurlgrad": 2, "gradzcurl": 2,
                "zcurlzcol": 1, "zrowzcurl": 1}


def candidates(degree, ops=OPS):
    out = []
    for op, base, p in itertools.product(ops, (4, 2), range(MAX_P + 1)):
        if (basis_degree(op, base, p) == degree
                # radial tables carry u-derivative orders 0..N_RAD-1 only
                and p + _OP_N_DERIVS[op] <= N_RAD - 1):
            out.append((op, base, p))
    return out


def fit_channel(target, degree, rng, npts=60, ops=OPS):
    """Fit target (3x3 sympy matrix in dx,dy,rz) to the degree-matched
    basis by f64 lstsq at random points; return [(op,base,p,Fraction)].

    A rank-deficient candidate set (the pseudo-tensor ops overlap) is
    reduced to independent columns by pivoted QR before solving, so the
    unique reduced solution stays rational."""
    cand = candidates(degree, ops)
    lam_t = sp.lambdify((dx, dy, rz), target, "numpy")
    lams = [sp.lambdify((dx, dy, rz), basis_matrix(*c), "numpy")
            for c in cand]
    pts = rng.uniform(0.3, 2.5, size=(npts, 3)) * np.sign(
        rng.uniform(-1, 1, size=(npts, 3)))
    pts[:, 2] = np.abs(pts[:, 2]) + 0.4      # rz > 0 (image vector)
    rows_t, rows_b = [], []
    for (px, py, pz) in pts:
        rows_t.append(np.asarray(lam_t(px, py, pz), float).ravel())
        rows_b.append(np.stack(
            [np.asarray(l(px, py, pz), float).ravel() for l in lams], -1))
    A = np.concatenate(rows_b, 0)
    y = np.concatenate(rows_t, 0)
    keep = list(range(len(cand)))
    svals = np.linalg.svd(A, compute_uv=False) if A.size else np.array([1.0])
    if svals.min() < 1e-8 * svals.max():
        import scipy.linalg as sla

        _, rqr, piv = sla.qr(A, pivoting=True, mode="economic")
        rank = int(np.sum(np.abs(np.diag(rqr))
                          > 1e-9 * np.abs(rqr[0, 0])))
        keep = sorted(piv[:rank].tolist())
        A = A[:, keep]
    coef_k, res, *_ = np.linalg.lstsq(A, y, rcond=None)
    resid = np.abs(A @ coef_k - y).max()
    if resid > 1e-9:
        raise RuntimeError(f"fit failed at degree {degree}: resid {resid}")
    coef = np.zeros(len(cand))
    coef[keep] = coef_k
    terms = []
    for c, val in zip(cand, coef):
        fr = Fraction(val).limit_denominator(10000)
        if fr != 0:
            if abs(float(fr) - val) > 1e-9:
                raise RuntimeError(f"non-rational coefficient {val} for {c}")
            terms.append((*c, fr))
    return terms


def reconstruct(terms):
    M = sp.zeros(3, 3)
    for (op, base, p, fr) in terms:
        M += sp.Rational(fr.numerator, fr.denominator) * basis_matrix(
            op, base, p)
    return M


def split_by_degree(M):
    """Split a 3x3 matrix of Laurent-type terms in (dx, dy, rz) into
    homogeneous-degree pieces {d: 3x3 matrix}."""
    t = sp.Symbol("t", positive=True)
    out = {}
    for i in range(3):
        for j in range(3):
            e = sp.expand(M[i, j])
            if e == 0:
                continue
            for term in e.as_ordered_terms():
                scaled = term.subs({dx: t * dx, dy: t * dy, rz: t * rz},
                                   simultaneous=True)
                ratio = sp.powsimp(sp.cancel(scaled / term), force=True)
                ratio = sp.simplify(ratio)
                if ratio == 1:
                    d = 0
                else:
                    b, ex = ratio.as_base_exp()
                    assert b == t and ex.is_Integer, (
                        f"non-homogeneous term degree {ratio} at {(i, j)}")
                    d = int(ex)
                if d not in out:
                    out[d] = sp.zeros(3, 3)
                out[d][i, j] += term
    return out


def fit_mixed_degrees(target, rng, ops):
    """Fit a (possibly degree-mixed) matrix: split into homogeneous
    pieces, fit each at its degree, merge and verify the whole."""
    pieces = split_by_degree(target)
    terms = []
    for d, mat in sorted(pieces.items()):
        terms.extend(fit_channel(mat, d, rng, ops=ops))
    worst = verify(target, terms, rng)
    return terms, worst


def verify(target, terms, rng, npts=40, digits=40):
    diff = target - reconstruct(terms)
    f = sp.lambdify((dx, dy, rz), diff, "mpmath")
    import mpmath
    mpmath.mp.dps = digits

    def _mpq(v):
        fr = Fraction(v).limit_denominator(10**6)
        return mpmath.mpf(fr.numerator) / mpmath.mpf(fr.denominator)
    worst = 0.0
    for _ in range(npts):
        px = _mpq(rng.uniform(-2, 2))
        py = _mpq(rng.uniform(-2, 2))
        pz = _mpq(rng.uniform(0.4, 3.))
        vals = f(px, py, pz)
        worst = max(worst, float(max(abs(v) for row in vals.tolist()
                                     for v in row)))
    if worst > 10.0 ** (5 - digits):
        raise RuntimeError(f"verification failed: {worst}")
    return worst


def main():
    rng = np.random.default_rng(7)
    W = wall_tt_radii_sym()
    W = W.subs({x3: rz - h, y3: h})
    W = sp.expand(W + rpy_s2_far_times_D())   # target: W + S_img = channels

    # collect channel x radius-monomial targets
    poly_h = [sp.expand(W.applyfunc(lambda e: e.coeff(h, m)))
              for m in range(3)]
    acc_h = sp.zeros(3, 3)
    for m in range(3):
        acc_h += poly_h[m] * h**m
    assert sp.simplify(sp.expand(W - acc_h)).is_zero_matrix
    mons = {"1": sp.Integer(1), "a2": a * a, "b2": b * b,
            "a2b2": a * a * b * b}

    channels = {}
    for m in range(3):
        for name, mon in mons.items():
            if name == "1":
                T = poly_h[m].applyfunc(
                    lambda e: e.subs({a: 0, b: 0}))
            elif name == "a2":
                T = poly_h[m].applyfunc(
                    lambda e: sp.expand(e).coeff(a, 2).subs(b, 0))
            elif name == "b2":
                T = poly_h[m].applyfunc(
                    lambda e: sp.expand(e).coeff(b, 2).subs(a, 0))
            else:
                T = poly_h[m].applyfunc(
                    lambda e: sp.expand(e).coeff(a, 2).coeff(b, 2))
            if T.is_zero_matrix:
                continue
            deg = -1 - m - {"1": 0, "a2": 2, "b2": 2, "a2b2": 4}[name]
            terms = fit_channel(T, deg, rng)
            worst = verify(T, terms, rng)
            print(f"channel m={m} mon={name}: {len(terms)} terms, "
                  f"verify residual {worst:.2e}")
            channels[(m, name)] = terms

    # completeness: monomial split must reconstruct poly_h exactly
    for m in range(3):
        acc = sp.zeros(3, 3)
        for name, mon in mons.items():
            if (m, name) in channels:
                acc += mon * reconstruct(channels[(m, name)])
        resid = sp.simplify(sp.expand(poly_h[m] - acc))
        assert resid.is_zero_matrix, f"monomial split incomplete at m={m}"

    # --- rotational coupling blocks (rollers/grand mobility) ---------
    core = wall_cross_core_sym()
    W_rt = sp.expand(-core.T)       # additive rot-force pair block
    rt_chan = {}
    for m in range(2):
        T = W_rt.applyfunc(lambda e: sp.expand(e).coeff(h, m))
        terms, worst = fit_mixed_degrees(T, rng, ops=OPS + POPS)
        print(f"rt channel m={m}: {len(terms)} terms, verify {worst:.2e}")
        rt_chan[m] = terms
    # completeness: h-split must reconstruct W_rt exactly
    acc = sp.zeros(3, 3)
    for m in range(2):
        acc += h**m * reconstruct(rt_chan[m])
    assert sp.simplify(sp.expand(W_rt - acc)).is_zero_matrix

    rr_terms, worst = fit_mixed_degrees(
        sp.expand(wall_rr_pair_sym()), rng, ops=OPS + POPS)
    print(f"rr channel: {len(rr_terms)} terms, verify {worst:.2e}")

    img_src = gen_img_apply(channels)
    mult_src = gen_mult_apply(channels)
    img_rot_src = gen_img_apply_rot(rt_chan, rr_terms)
    mult_rot_src = gen_mult_apply_rot(rt_chan, rr_terms)
    radial_src = gen_radial_sources()

    with open(OUT, "w") as fh:
        fh.write('"""GENERATED by tools/gen_wall_channels.py — do not edit.\n'
                 "\n"
                 "Channel decomposition of the Swan-Brady single-wall\n"
                 "correction (see the generator docstring):\n"
                 "  W(R, h) = -RPY_s2(R).D + sum_m h^m T_m(R),\n"
                 "  T_m = sum over CHANNELS[(m, mon)] of\n"
                 "        coeff * mon * O_op(del) del_z^p {r | 1/r}.\n"
                 'Verified against ops/rpy.py::wall_tt_radii at 40 digits.\n'
                 '"""\n\n'
                 "from fractions import Fraction\n\n")
        fh.write("# (channel m, radius monomial) -> [(op, base, p, coeff)]\n")
        fh.write("# op in {iso, hess, zrow, zcol, zz}; base 4 -> r "
                 "(FT -8 pi/k^4), 2 -> 1/r (FT 4 pi/k^2)\n")
        fh.write("CHANNELS = {\n")
        for key, terms in sorted(channels.items()):
            fh.write(f"    {key!r}: [\n")
            for (op, base, p, fr) in terms:
                fh.write(f"        ({op!r}, {base}, {p}, "
                         f"Fraction({fr.numerator}, {fr.denominator})),\n")
            fh.write("    ],\n")
        fh.write("}\n\n")
        fh.write("# rot-coupling image channels (lengths in a; rt/tr in\n"
                 "# 1/(8 pi eta a^2), rr in 1/(8 pi eta a^3) units):\n"
                 "#   W_rt(R, h_src) = C0 + h_src C1;  W_tr = reflected\n"
                 "#   transpose at h_tgt;  W_rr height-independent.\n")
        fh.write("CHANNELS_RT = {\n")
        for m, terms in sorted(rt_chan.items()):
            fh.write(f"    {m}: [\n")
            for (op, base, p, fr) in terms:
                fh.write(f"        ({op!r}, {base}, {p}, "
                         f"Fraction({fr.numerator}, {fr.denominator})),\n")
            fh.write("    ],\n")
        fh.write("}\n\n")
        fh.write("CHANNELS_RR = [\n")
        for (op, base, p, fr) in rr_terms:
            fh.write(f"    ({op!r}, {base}, {p}, "
                     f"Fraction({fr.numerator}, {fr.denominator})),\n")
        fh.write("]\n\n")
        fh.write(img_src)
        fh.write("\n\n")
        fh.write(mult_src)
        fh.write("\n\n")
        fh.write(img_rot_src)
        fh.write("\n\n")
        fh.write(mult_rot_src)
        fh.write("\n\n")
        fh.write(radial_src)
    print(f"wrote {OUT}")


# ---------------------------------------------------------------------------
# Code generation: radial-symbol basis (chain rule on c{base}_n = G^(n)(u),
# u = r^2), the equal-radius image-correction apply, k-multiplier apply,
# and the screened/exact radial derivative closed forms.
# ---------------------------------------------------------------------------

N_RAD = 5   # radial derivative orders 0..4 are reachable (max 4 derivatives)


def _csym(base, n):
    return sp.Symbol(f"c{base}_{n}")


def _mydiff(expr, var):
    """d/d var with the radial chain rule d c{b}_n / d var = 2 var c{b}_{n+1}
    (c{b}_n stands for d^n/du^n G_b(u) at u = dx^2+dy^2+rz^2)."""
    e = sp.diff(expr, var)
    for bb in (4, 2):
        for n in range(N_RAD):
            e = e + sp.diff(expr, _csym(bb, n)) * 2 * var * _csym(bb, n + 1)
    return sp.expand(e)


def basis_apply_sym(op, base, p):
    """basis_matrix with the radial generator left symbolic (c{base}_n)."""
    f = _csym(base, 0)
    for _ in range(p):
        f = _mydiff(f, rz)
    return _op_entries(op, f, lambda e, i: _mydiff(e, X[i]))


def _selfcheck_basis_sym(rng):
    """basis_apply_sym with exact radial substitutions must equal
    basis_matrix (checks the hand chain rule, incl. the pseudo ops)."""
    uu = sp.Symbol("uu", positive=True)
    exact = {4: sp.sqrt(uu), 2: 1 / sp.sqrt(uu)}
    subs = {}
    for bb in (4, 2):
        for n in range(N_RAD + 2):
            d = sp.diff(exact[bb], uu, n).subs(uu, dx**2 + dy**2 + rz**2)
            subs[_csym(bb, n)] = d
    for (op, base, p) in [("hess", 4, 2), ("zcol", 4, 3), ("hess", 2, 2),
                          ("zrow", 2, 1), ("iso", 2, 0), ("zz", 2, 2),
                          ("curl", 2, 1), ("curl", 4, 2), ("eps3", 2, 2),
                          ("zcurlgrad", 4, 1), ("gradzcurl", 2, 0),
                          ("zcurlzcol", 2, 1), ("zrowzcurl", 4, 2)]:
        diff = sp.simplify(basis_apply_sym(op, base, p).subs(subs)
                           - basis_matrix(op, base, p))
        assert diff.is_zero_matrix, f"chain rule broken for {(op, base, p)}"


def _emit_cse(exprs, out_names, fh_lines):
    reps, reduced = sp.cse(exprs, symbols=sp.numbered_symbols("t"))
    for sym, val in reps:
        fh_lines.append(f"    {sym} = {sp.pycode(val)}")
    for name, val in zip(out_names, reduced):
        fh_lines.append(f"    {name} = {sp.pycode(val)}")


def gen_img_apply(channels):
    """Emit img_terms(...): the equal-radius (A2 = a*a) channel sum
    (T0 + h T1 + h^2 T2) f with radial generators symbolic, so the same
    code evaluates the EXACT channels (c from exact derivatives) or the
    NEAR-FIELD SCREENED REMAINDER (c from g4/g2 derivatives)."""
    _selfcheck_basis_sym(np.random.default_rng(3))
    A2 = sp.Symbol("A2")
    monval = {"1": sp.Integer(1), "a2": A2, "b2": A2, "a2b2": A2 * A2}
    fx, fy, fz = sp.symbols("fx fy fz")
    fvec = sp.Matrix([fx, fy, fz])
    u_out = sp.zeros(3, 1)
    for (m, name), terms in channels.items():
        mat = sp.zeros(3, 3)
        for (op, base, p, fr) in terms:
            mat += sp.Rational(fr.numerator, fr.denominator) * basis_apply_sym(
                op, base, p)
        u_out += h**m * monval[name] * (mat * fvec)
    u_out = [sp.expand(u_out[i]) for i in range(3)]
    cargs = [f"c{b}_{n}" for b in (4, 2) for n in range(N_RAD)]
    lines = [
        "def img_terms(dx, dy, rz, h, fx, fy, fz, A2, " + ", ".join(cargs)
        + "):",
        '    """(T0 + h T1 + h^2 T2) f at image displacement (dx,dy,rz),',
        "    source height h, equal radii A2 = a*a. c{b}_{n} = the n-th",
        "    u-derivative (u = r^2) of the radial generator: exact",
        "    (sqrt(u), 1/sqrt(u)) for the full channels, or the screened",
        '    g4/g2 forms for the near-field remainder."""',
    ]
    _emit_cse(u_out, ["ux", "uy", "uz"], lines)
    lines.append("    return ux, uy, uz")
    return "\n".join(lines)


def gen_mult_apply(channels):
    """Emit mult_terms(...): k-space application
    u_hat += sum_m T_hat_m(k) c_m_hat with F4 = phi*(-8 pi)/k^4,
    F2 = phi*4 pi/k^2 precomputed arrays (the 1/(8 pi eta) physical
    prefactor NOT included — the engine applies it)."""
    kx, ky, kz = sp.symbols("kx ky kz")
    K = (kx, ky, kz)
    F4, F2 = sp.symbols("F4 F2")
    A2 = sp.Symbol("A2")
    monval = {"1": sp.Integer(1), "a2": A2, "b2": A2, "a2b2": A2 * A2}
    cs = {m: sp.Matrix(sp.symbols(f"c{m}x c{m}y c{m}z")) for m in range(3)}
    u_out = sp.zeros(3, 1)
    for (m, name), terms in channels.items():
        mat = sp.zeros(3, 3)
        for (op, base, p, fr) in terms:
            fhat = (F4 if base == 4 else F2) * (sp.I * kz) ** p
            T = sp.zeros(3, 3)
            if op == "iso":
                for i in range(3):
                    T[i, i] = fhat
            elif op == "hess":
                for i in range(3):
                    for j in range(3):
                        T[i, j] = (sp.I * K[i]) * (sp.I * K[j]) * fhat
            elif op == "zrow":
                for j in range(3):
                    T[2, j] = (sp.I * K[j]) * fhat
            elif op == "zcol":
                for i in range(3):
                    T[i, 2] = (sp.I * K[i]) * fhat
            elif op == "zz":
                T[2, 2] = fhat
            mat += sp.Rational(fr.numerator, fr.denominator) * T
        u_out += monval[name] * (mat * cs[m])
    u_out = [sp.expand(u_out[i]) for i in range(3)]
    lines = [
        "def mult_terms(kx, ky, kz, F4, F2, A2, c0x, c0y, c0z, "
        "c1x, c1y, c1z, c2x, c2y, c2z):",
        '    """k-space channel application (complex arrays);',
        "    F4 = phi*(-8 pi)/k^4, F2 = phi*4 pi/k^2, channel fields",
        '    c_m spread with strengths h^m f at image points."""',
    ]
    _emit_cse(u_out, ["ux", "uy", "uz"], lines)
    lines.append("    return ux, uy, uz")
    return "\n".join(lines)


def _recon_sym(terms):
    """Symbolic-radial reconstruction of a term table (c{b}_n symbols)."""
    M = sp.zeros(3, 3)
    for (op, base, p, fr) in terms:
        M += sp.Rational(fr.numerator, fr.denominator) * basis_apply_sym(
            op, base, p)
    return M


def gen_img_apply_rot(rt_chan, rr_terms):
    """Emit img_terms_rt / img_terms_tr / img_terms_rr: the wall
    rot-coupling image corrections with symbolic radial generators (same
    dual exact/screened use as img_terms). Units: lengths in a; blocks in
    1/(8 pi eta a^2) (rt/tr) and 1/(8 pi eta a^3) (rr); reference pair
    semantics ops/rpy.py::wall_rot_force/wall_trans_torque/wall_rr."""
    cargs = [f"c{b}_{n}" for b in (4, 2) for n in range(N_RAD)]
    fx, fy, fz = sp.symbols("fx fy fz")
    fvec = sp.Matrix([fx, fy, fz])

    M_rt = sp.zeros(3, 3)
    for m, terms in rt_chan.items():
        M_rt += h**m * _recon_sym(terms)
    w_rt = M_rt * fvec
    w_rt = [sp.expand(w_rt[i]) for i in range(3)]
    lines = [
        "def img_terms_rt(dx, dy, rz, h, fx, fy, fz, " + ", ".join(cargs)
        + "):",
        '    """Angular velocity from image force: (C0 + h C1) f at',
        "    image displacement (dx,dy,rz), SOURCE height h (units of a).",
        '    c{b}_{n}: radial generators as in img_terms."""',
    ]
    _emit_cse(w_rt, ["wx", "wy", "wz"], lines)
    lines.append("    return wx, wy, wz")
    src_rt = "\n".join(lines)

    # TR = transpose at the in-plane-reflected displacement, h = TARGET
    # height (rpy.py::wall_trans_torque; the c{b}_n radial symbols are
    # functions of u = dx^2+dy^2+rz^2 and survive the reflection)
    M_tr = M_rt.subs({dx: -dx, dy: -dy}, simultaneous=True).T
    u_tr = M_tr * fvec
    u_tr = [sp.expand(u_tr[i]) for i in range(3)]
    lines = [
        "def img_terms_tr(dx, dy, rz, h, tx, ty, tz, " + ", ".join(cargs)
        + "):",
        '    """Velocity from image torque: W_rt(-dx,-dy,rz,h)^T t,',
        '    h = TARGET height (units of a)."""',
    ]
    _emit_cse([e.subs({fx: sp.Symbol("tx"), fy: sp.Symbol("ty"),
                       fz: sp.Symbol("tz")}) for e in u_tr],
              ["ux", "uy", "uz"], lines)
    lines.append("    return ux, uy, uz")
    src_tr = "\n".join(lines)

    M_rr = _recon_sym(rr_terms)
    w_rr = M_rr * fvec
    w_rr = [sp.expand(w_rr[i]) for i in range(3)]
    lines = [
        "def img_terms_rr(dx, dy, rz, tx, ty, tz, " + ", ".join(cargs)
        + "):",
        '    """Angular velocity from image torque (pair part; height-',
        '    independent)."""',
    ]
    _emit_cse([e.subs({fx: sp.Symbol("tx"), fy: sp.Symbol("ty"),
                       fz: sp.Symbol("tz")}) for e in w_rr],
              ["wx", "wy", "wz"], lines)
    lines.append("    return wx, wy, wz")
    src_rr = "\n".join(lines)
    return src_rt + "\n\n\n" + src_tr + "\n\n\n" + src_rr


def _k_factor_matrix(terms, kx, ky, kz, F4, F2):
    """Sympy 3x3 k-space multiplier of a term table."""
    K = (kx, ky, kz)
    mat = sp.zeros(3, 3)
    for (op, base, p, fr) in terms:
        fhat = (F4 if base == 4 else F2) * (sp.I * kz) ** p
        T = sp.zeros(3, 3)
        if op == "iso":
            for i in range(3):
                T[i, i] = fhat
        elif op == "hess":
            for i in range(3):
                for j in range(3):
                    T[i, j] = (sp.I * K[i]) * (sp.I * K[j]) * fhat
        elif op == "zrow":
            for j in range(3):
                T[2, j] = (sp.I * K[j]) * fhat
        elif op == "zcol":
            for i in range(3):
                T[i, 2] = (sp.I * K[i]) * fhat
        elif op == "zz":
            T[2, 2] = fhat
        elif op == "curl":
            for i in range(3):
                for j in range(3):
                    T[i, j] = sum(int(EPS3[i, j, k]) * (sp.I * K[k])
                                  for k in range(3)) * fhat
        elif op == "eps3":
            T[0, 1] = fhat
            T[1, 0] = -fhat
        elif op == "zcurlgrad":
            for i in range(3):
                for j in range(3):
                    T[i, j] = sum(int(EPS3[i, 2, k]) * (sp.I * K[k])
                                  for k in range(3)) * (sp.I * K[j]) * fhat
        elif op == "gradzcurl":
            for i in range(3):
                for j in range(3):
                    T[i, j] = (sp.I * K[i]) * sum(
                        int(EPS3[j, 2, k]) * (sp.I * K[k])
                        for k in range(3)) * fhat
        elif op == "zcurlzcol":
            for i in range(3):
                T[i, 2] = sum(int(EPS3[i, 2, k]) * (sp.I * K[k])
                              for k in range(3)) * fhat
        elif op == "zrowzcurl":
            for j in range(3):
                T[2, j] = sum(int(EPS3[j, 2, k]) * (sp.I * K[k])
                              for k in range(3)) * fhat
        else:
            raise ValueError(op)
        mat += sp.Rational(fr.numerator, fr.denominator) * T
    return mat


def gen_mult_apply_rot(rt_chan, rr_terms):
    """Emit mult_terms_rt / mult_terms_tr / mult_terms_rr (k-space)."""
    kx, ky, kz = sp.symbols("kx ky kz")
    F4, F2 = sp.symbols("F4 F2")

    cs = {m: sp.Matrix(sp.symbols(f"c{m}x c{m}y c{m}z")) for m in range(2)}
    w_out = sp.zeros(3, 1)
    for m, terms in rt_chan.items():
        w_out += _k_factor_matrix(terms, kx, ky, kz, F4, F2) * cs[m]
    w_out = [sp.expand(w_out[i]) for i in range(3)]
    lines = [
        "def mult_terms_rt(kx, ky, kz, F4, F2, c0x, c0y, c0z, "
        "c1x, c1y, c1z):",
        '    """k-space rot-force channels: angular-velocity field from',
        "    image-force channel fields c_m (strengths h^m f at image",
        '    points); F4/F2 as in mult_terms."""',
    ]
    _emit_cse(w_out, ["wx", "wy", "wz"], lines)
    lines.append("    return wx, wy, wz")
    src_rt = "\n".join(lines)

    # TR: per-m output fields (interpolated with TARGET weights 1, h_t)
    cvec = sp.Matrix(sp.symbols("cx cy cz"))
    outs, names = [], []
    for m in range(2):
        Tm = _k_factor_matrix(rt_chan[m], kx, ky, kz, F4, F2)
        Ttr = Tm.subs({kx: -kx, ky: -ky}, simultaneous=True).T
        um = Ttr * cvec
        outs.extend(sp.expand(um[i]) for i in range(3))
        names.extend([f"u{m}x", f"u{m}y", f"u{m}z"])
    lines = [
        "def mult_terms_tr(kx, ky, kz, F4, F2, cx, cy, cz):",
        '    """k-space trans-torque channels: TWO velocity fields from',
        "    the image-torque field c (m=0, 1); real-space result is",
        '    sum_m h_target^m interp(u_m)."""',
    ]
    _emit_cse(outs, names, lines)
    lines.append(f"    return {', '.join(names)}")
    src_tr = "\n".join(lines)

    w_rr = _k_factor_matrix(rr_terms, kx, ky, kz, F4, F2) * cvec
    w_rr = [sp.expand(w_rr[i]) for i in range(3)]
    lines = [
        "def mult_terms_rr(kx, ky, kz, F4, F2, cx, cy, cz):",
        '    """k-space rot-rot channel: angular-velocity field from the',
        '    image-torque field c."""',
    ]
    _emit_cse(w_rr, ["wx", "wy", "wz"], lines)
    lines.append("    return wx, wy, wz")
    src_rr = "\n".join(lines)
    return src_rt + "\n\n\n" + src_tr + "\n\n\n" + src_rr


def gen_radial_sources():
    """Emit RADIAL_SRC: pycode strings (functions of u, xi; names erfc,
    exp, sqrt, pi) for d^n/du^n of the screened generators
      g4(u) = sqrt(u) erfc(xi sqrt(u)) - exp(-xi^2 u)/(xi sqrt(pi))
      g2(u) = erfc(xi sqrt(u))/sqrt(u) - (xi/sqrt(pi)) exp(-xi^2 u)
    (validated against quadrature of -8 pi (1-phi)/k^4 and
    4 pi (1-phi)/k^2) and of the exact generators sqrt(u), 1/sqrt(u)."""
    uu = sp.Symbol("u", positive=True)
    xi = sp.Symbol("xi", positive=True)
    g4 = sp.sqrt(uu) * sp.erfc(xi * sp.sqrt(uu)) - sp.exp(
        -xi * xi * uu) / (xi * sp.sqrt(sp.pi))
    g2 = sp.erfc(xi * sp.sqrt(uu)) / sp.sqrt(uu) - (
        xi / sp.sqrt(sp.pi)) * sp.exp(-xi * xi * uu)
    e4 = sp.sqrt(uu)
    e2 = 1 / sp.sqrt(uu)
    out = {}
    for nameb, fexpr in (("g4", g4), ("g2", g2), ("e4", e4), ("e2", e2)):
        rows = []
        d = fexpr
        for n in range(N_RAD):
            rows.append(sp.pycode(sp.simplify(d)))
            d = sp.diff(d, uu)
        out[nameb] = rows
    lines = ["# d^n/du^n closed forms; eval with {erfc, exp, sqrt, pi, u, xi}",
             "RADIAL_SRC = {"]
    for nameb, rows in out.items():
        lines.append(f"    {nameb!r}: [")
        for s in rows:
            lines.append(f"        {s!r},")
        lines.append("    ],")
    lines.append("}")
    return "\n".join(lines)


if __name__ == "__main__":
    main()
