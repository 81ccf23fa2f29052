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


# ---------------------------------------------------------------------------
# Basis: O(del) del_z^p applied to base in {r (f4), 1/r (f2)}
# ---------------------------------------------------------------------------

OPS = ("iso", "hess", "zrow", "zcol", "zz")
MAX_P = 6


def basis_matrix(op, base, p):
    f = r if base == 4 else 1 / r
    f = sp.diff(f, rz, p)
    M = sp.zeros(3, 3)
    if op == "iso":
        for i in range(3):
            M[i, i] = f
    elif op == "hess":
        for i, Xi in enumerate(X):
            for j, Xj in enumerate(X):
                M[i, j] = sp.diff(f, Xi, Xj)
    elif op == "zrow":         # delta_i3 del_j f
        for j, Xj in enumerate(X):
            M[2, j] = sp.diff(f, Xj)
    elif op == "zcol":         # del_i f delta_j3
        for i, Xi in enumerate(X):
            M[i, 2] = sp.diff(f, Xi)
    elif op == "zz":
        M[2, 2] = f
    return M


def basis_degree(op, base, p):
    d = (1 if base == 4 else -1) - p
    return d + {"iso": 0, "hess": -2, "zrow": -1, "zcol": -1, "zz": 0}[op]


def candidates(degree):
    out = []
    for op, base, p in itertools.product(OPS, (4, 2), range(MAX_P + 1)):
        if basis_degree(op, base, p) == degree:
            out.append((op, base, p))
    return out


def fit_channel(target, degree, rng, npts=60):
    """Fit target (3x3 sympy matrix in dx,dy,rz) to the degree-matched
    basis by f64 lstsq at random points; return [(op,base,p,Fraction)]."""
    cand = candidates(degree)
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
    coef, res, *_ = np.linalg.lstsq(A, y, rcond=None)
    resid = np.abs(A @ coef - y).max()
    if resid > 1e-9:
        raise RuntimeError(f"fit failed at degree {degree}: resid {resid}")
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

    img_src = gen_img_apply(channels)
    mult_src = gen_mult_apply(channels)
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
        fh.write(img_src)
        fh.write("\n\n")
        fh.write(mult_src)
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
    M = sp.zeros(3, 3)
    if op == "iso":
        for i in range(3):
            M[i, i] = f
    elif op == "hess":
        for i, Xi in enumerate(X):
            for j, Xj in enumerate(X):
                M[i, j] = _mydiff(_mydiff(f, Xi), Xj)
    elif op == "zrow":
        for j, Xj in enumerate(X):
            M[2, j] = _mydiff(f, Xj)
    elif op == "zcol":
        for i, Xi in enumerate(X):
            M[i, 2] = _mydiff(f, Xi)
    elif op == "zz":
        M[2, 2] = f
    return M


def _selfcheck_basis_sym(rng):
    """basis_apply_sym with exact radial substitutions must equal
    basis_matrix (checks the hand chain rule)."""
    uu = sp.Symbol("uu", positive=True)
    exact = {4: sp.sqrt(uu), 2: 1 / sp.sqrt(uu)}
    subs = {}
    for bb in (4, 2):
        for n in range(N_RAD + 2):
            d = sp.diff(exact[bb], uu, n).subs(uu, dx**2 + dy**2 + rz**2)
            subs[_csym(bb, n)] = d
    for (op, base, p) in [("hess", 4, 2), ("zcol", 4, 3), ("hess", 2, 2),
                          ("zrow", 2, 1), ("iso", 2, 0), ("zz", 2, 2)]:
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
