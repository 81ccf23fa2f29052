"""Rot-coupling (grand mobility) stage of the wall-spectral engine.

Extends ops/ewald_wall.py's trans-trans O(N log N) single-wall engine to
the full single-blob GRAND mobility [[tt, tr], [rt, rr]] used by the
rollers path (reference hot loop:
quaternion_integrator_rollers.py:905-982; the reference evaluates these
blocks with O(N^2) pycuda kernels — mobility_pycuda.py:1266).

Decomposition per block (same Hasimoto screen xi as the tt engine):

  pair parts (REAL sources only; the rot wall corrections carry no
  mirror-monopole baseline — W_rt = C0 + h C1 exactly, see
  tools/gen_wall_channels.py):
    cross:  u = gamma(r) (t x d),  w = gamma(r) (f x d)
            wave multiplier  +i (k x .) sinc(ka) w_r(ka) phi /(2 eta k^2)
            near remainder   gamma_r = gamma - gamma_w  (ewald.rot_*)
    rr:     w = alpha I + beta rhat rhat applied to t
            wave multiplier  (w_r(ka)^2 phi /(4 eta)) (I - khat khat)
            near remainder   (alpha_r, beta_r) + self_rr at r = 0

  image channels (real target <- image source; generated evaluators of
  the 40-digit-verified operator fits, _wall_channels_gen.py):
    rt:  w += [C0 + h_src C1] f      (img_terms_rt / mult_terms_rt)
    tr:  u += transposed-reflected rt at h_TARGET (img_terms_tr /
         mult_terms_tr -> u0 + (h_t/a) u1)
    rr:  w += height-independent channel (img_terms_rr / mult_terms_rr)
    near remainders evaluate the SAME screened radial series c4_*/c2_*
    as the tt engine (shared two-piece Chebyshev tables); wave parts
    evaluate the generated k-multipliers at SCALED wavenumbers k a (the
    rot fits are dimensionally consistent in a-scaled lengths only).

Wrap correction: the same polish-mode set as the tt engine, with rot
Toeplitz kernels (wall_kernels.build_polish_kernels_rot) applied on the
column profiles of the five input fields.

Overlap regularization: inputs and outputs damped by B = min(z/a, 1)
and heights shifted to z >= a (plan build), matching the direct grand
engine (ops/mobility.grand_mobility_matvec, mobility/mobility.py:52-119).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from . import _wall_channels_gen as gen
from . import ewald, wall_kernels
from . import ewald_wall as ew

__all__ = ["grand_matvec", "rot_tables_device"]


# ---------------------------------------------------------------------------
# Host tables
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=16)
def _host_cheb_rot(params: ew.WallParams):
    """Two-piece Chebyshev fits of the PAIR rot near remainders over
    [0, 2a] and [2a, r_cut] (kink at touching): rows = (gamma_r,
    alpha_r, beta_r). Plus the rr self coefficient. Physical units."""
    from numpy.polynomial import chebyshev as npcheb

    p = params
    edges = [(1e-9, 2.0 * p.a), (2.0 * p.a, p.r_cut)]
    for K in (24, 32, 40, 48):
        out = np.zeros((2, 3, K))
        err = 0.0
        for pidx, (lo, hi) in enumerate(edges):
            r = np.linspace(lo, hi, 3001)
            t = (2.0 * r - (hi + lo)) / (hi - lo)
            gamma, alpha, beta = ewald.rot_scalar_functions(r, p.a, p.eta)
            gw, cperp, cpar = ewald.rot_wave_freespace_scalars(
                r, p.a, p.eta, p.xi)
            rows = [gamma - gw, alpha - cperp, beta - (cpar - cperp)]
            for i, f in enumerate(rows):
                out[pidx, i] = npcheb.chebfit(t, f, K - 1)
                scale = max(np.abs(f).max(), 1e-30)
                err = max(err, np.abs(
                    npcheb.chebval(t, out[pidx, i]) - f).max() / scale)
        if err < max(5e-7, 0.02 * p.tol):
            break
    else:
        raise RuntimeError(f"rot near fit stalled at err {err}")
    _, _, _, _, self_rr = ewald.rot_realspace_tables(
        p.a, p.eta, p.xi, p.r_cut, n_points=64)
    return out, float(self_rr)


@functools.lru_cache(maxsize=16)
def _host_zdft_real(params: ew.WallParams):
    """Forward sliced-z DFT over the REAL-particle source planes
    (ra, rb) — pair rot parts spread real sources only."""
    gz = params.grid[2]
    _, _, (ra, rb) = ew._z_plane_ranges(params)
    kzi = np.arange(gz)
    zi = np.arange(ra, rb)
    M = np.exp(-2j * np.pi * np.outer(zi, kzi) / gz)
    return (M.real.astype(np.float32), M.imag.astype(np.float32))


@functools.lru_cache(maxsize=8)
def _host_rot_polish(params: ew.WallParams):
    """Rot polish kernel FFTs on the SAME mode set as the tt engine:
    (P, 8, 3, 3, 2 gz) complex as (re, im) f32 pairs."""
    gx, gy, gz = params.grid
    hx, hy, hz = params.spacing
    kx, ky, _ = ew._axis_freqs(params)
    margin = params.lz_box - params.data_extent
    idx, kxky = wall_kernels.polish_mode_set(gx, len(ky), kx, ky, margin,
                                             params.tol)
    wx = ewald._es_window_hat(np.abs(kxky[:, 0]),
                              0.5 * params.support * hx, params.es_beta)
    wy = ewald._es_window_hat(np.abs(kxky[:, 1]),
                              0.5 * params.support * hy, params.es_beta)
    circ = np.arange(2 * gz)
    circ = np.where(circ < gz, circ, circ - 2 * gz)
    dzg = circ * hz
    kern = wall_kernels.build_polish_kernels_rot(
        kxky, dzg, a=params.a, eta=params.eta, xi=params.xi,
        hx=hx, hy=hy, hz=hz, support=params.support,
        es_beta=params.es_beta, what_x=wx, what_y=wy, tol=params.tol)
    kfft = np.fft.fft(kern, axis=-1)                  # (P, 8, 3, 3, 2gz)
    return (kfft.real.astype(np.float32).reshape(len(idx), 72, -1),
            kfft.imag.astype(np.float32).reshape(len(idx), 72, -1))


def rot_tables_device(params: ew.WallParams, dtype=jnp.float32):
    """Device-resident position-independent rot tables, to be passed to
    grand_matvec as ARGUMENTS (never closed over inside jit: the polish
    kernels are 10^1..10^2 MB at bench slabs and would otherwise lower
    as HLO literal constants — the same trap as the noise factors)."""
    cheb, self_rr = _host_cheb_rot(params)
    re, im = _host_rot_polish(params)
    rdt = jnp.float32 if dtype == jnp.float32 else jnp.float64
    return dict(cheb=jnp.asarray(cheb, rdt),
                self_rr=float(self_rr),
                pol_re=jnp.asarray(re, rdt),
                pol_im=jnp.asarray(im, rdt))


# ---------------------------------------------------------------------------
# Near field (XLA cell sweep over the plan's combined layout)
# ---------------------------------------------------------------------------


def grand_near_xla(plan: ew.WallPlan, f, t, tables):
    """Rot-block near sweep: pair remainders (real sources) + screened
    image rot channels (image sources, real targets). f/t (N, 3) or
    None (DAMPED strengths; caller handles B). Returns (v, w) — the
    tr contribution to v and the rt+rr contributions to w. The tt block
    is NOT included (callers use ewald_wall.near_matvec/matvec)."""
    p = plan.params
    n = plan.n_real
    dtype = plan.pos_all.dtype
    have_f = f is not None
    have_t = t is not None
    zeros_n = jnp.zeros((n, 3), dtype)
    fv = f if have_f else zeros_n
    tv = t if have_t else zeros_n

    # strengths: pair parts act on REAL sources; channels act on RAW
    # strengths at image rows
    f_real = jnp.concatenate([fv, jnp.zeros_like(fv)], axis=0)
    t_real = jnp.concatenate([tv, jnp.zeros_like(tv)], axis=0)
    f_img = jnp.concatenate([jnp.zeros_like(fv), fv], axis=0)
    t_img = jnp.concatenate([jnp.zeros_like(tv), tv], axis=0)

    cap = p.cell_capacity
    n_cells = plan.nbr_cells.shape[0]
    box3 = jnp.asarray([p.box_xy[0], p.box_xy[1], p.lz_box], dtype)
    pos_pad = jnp.concatenate(
        [plan.pos_all, jnp.full((1, 3), jnp.nan, dtype)], axis=0)

    def padded(x):
        return jnp.concatenate([x, jnp.zeros((1, 3), dtype)], axis=0)

    ids = plan.cell_table.reshape(n_cells, cap)
    gat = dict(pos=pos_pad[ids], fr=padded(f_real)[ids],
               tr_=padded(t_real)[ids], fi=padded(f_img)[ids],
               ti=padded(t_img)[ids])

    TC = min(p.cell_tile, n_cells)
    n_pad_c = -(-n_cells // TC) * TC
    pad_c = n_pad_c - n_cells
    if pad_c:
        gat["pos"] = jnp.concatenate(
            [gat["pos"], jnp.full((pad_c, cap, 3), jnp.nan, dtype)], axis=0)
        for k in ("fr", "tr_", "fi", "ti"):
            gat[k] = jnp.concatenate(
                [gat[k], jnp.zeros((pad_c, cap, 3), dtype)], axis=0)
    ids_pad = (jnp.concatenate(
        [ids, jnp.full((pad_c, cap), 2 * n, jnp.int32)]) if pad_c else ids)
    nbr_pad = (jnp.concatenate(
        [plan.nbr_cells, jnp.zeros((pad_c, 27), jnp.int32)])
        if pad_c else plan.nbr_cells)

    cheb_rot = tables["cheb"]
    two_a = 2.0 * p.a
    mids = (0.5 * two_a, 0.5 * (two_a + p.r_cut))
    halfs = (0.5 * two_a, 0.5 * (p.r_cut - two_a))
    _, ir_lo, ir_mid, ir_hi = ew._host_img_cheb(p)
    img_cheb = jnp.asarray(ew._host_img_cheb(p)[0], dtype)
    inv_a = 1.0 / p.a
    z0 = p.z0
    pref_c = 1.0 / (8.0 * jnp.pi * p.eta * p.a * p.a)
    pref_r = pref_c * inv_a

    def tile_fn(c0):
        rp = lax.dynamic_slice_in_dim(gat["pos"], c0, TC, 0)
        rid = lax.dynamic_slice_in_dim(ids_pad, c0, TC, 0)
        nb = lax.dynamic_slice_in_dim(nbr_pad, c0, TC, 0)
        ps = gat["pos"][nb]                          # (TC,27,cap,3)
        sid = ids_pad[nb]
        d = rp[:, :, None, None, :] - ps[:, None, :, :, :]
        d = d - jnp.round(d / box3) * box3
        r2 = jnp.sum(d * d, axis=-1)
        r = jnp.sqrt(r2)
        inside = ((r < p.r_cut) & (r2 > 0)
                  & (rid[:, :, None, None] != sid[:, None, :, :]))
        d = jnp.where(inside[..., None], d, 0.0)
        src_z_phys = ps[..., 2] + z0
        tgt_z_phys = rp[..., 2] + z0
        src_real = (src_z_phys > 0.0)[:, None, :, :]
        pair_m = inside & src_real
        is_img = (inside & (src_z_phys < 0.0)[:, None, :, :]
                  & (tgt_z_phys > 0.0)[:, :, None, None])

        # ---- pair remainders (real sources)
        t0p = jnp.clip((r - mids[0]) / halfs[0], -1.0, 1.0)
        t1p = jnp.clip((r - mids[1]) / halfs[1], -1.0, 1.0)
        near = r < two_a
        vals = []
        for row in range(3):
            b1 = jnp.zeros_like(r)
            b2 = jnp.zeros_like(r)
            tt_ = jnp.where(near, t0p, t1p)
            for k in range(cheb_rot.shape[2] - 1, 0, -1):
                c = jnp.where(near, cheb_rot[0, row, k],
                              cheb_rot[1, row, k])
                b1, b2 = 2.0 * tt_ * b1 - b2 + c, b1
            c0c = jnp.where(near, cheb_rot[0, row, 0],
                            cheb_rot[1, row, 0])
            vals.append(tt_ * b1 - b2 + c0c)
        gam, alp, bet = vals
        gam = jnp.where(pair_m, gam, 0.0)
        alp = jnp.where(pair_m, alp, 0.0)
        bet = jnp.where(pair_m, bet, 0.0)
        fs = gat["fr"][nb]                            # (TC,27,cap,3)
        ts = gat["tr_"][nb]
        out_v = 0.0
        out_w = 0.0
        if have_t:
            # u = gamma_r (t x d)
            txd = jnp.cross(ts[:, None], d)
            out_v = out_v + gam[..., None] * txd
            # w = alpha t + beta (rhat.t) rhat
            r2s = jnp.where(pair_m, r2, 1.0)
            ddt = jnp.sum(d * ts[:, None], axis=-1) / r2s
            out_w = (out_w + alp[..., None] * ts[:, None]
                     + (bet * ddt)[..., None] * d)
        if have_f:
            fxd = jnp.cross(fs[:, None], d)
            out_w = out_w + gam[..., None] * fxd

        # ---- screened image rot channels
        hsrc = jnp.where(is_img, -src_z_phys[:, None, :, :] * inv_a, 1.0)
        htgt = jnp.where(is_img, tgt_z_phys[:, :, None, None] * inv_a, 1.0)
        rs = jnp.clip(jnp.where(is_img, r, ir_hi * p.a) * inv_a,
                      ir_lo, ir_hi)
        piece0 = rs < ir_mid
        t0i = (2.0 * rs - (ir_mid + ir_lo)) / (ir_mid - ir_lo)
        t1i = (2.0 * rs - (ir_hi + ir_mid)) / (ir_hi - ir_mid)
        ti = jnp.clip(jnp.where(piece0, t0i, t1i), -1.0, 1.0)
        cvals = ew._clenshaw_multi(img_cheb, ti, piece0)
        dxs = d[..., 0] * inv_a
        dys = d[..., 1] * inv_a
        rzs = d[..., 2] * inv_a
        mimg = jnp.where(is_img, 1.0, 0.0)
        if have_f:
            fi = gat["fi"][nb]
            wx, wy, wz = gen.img_terms_rt(
                dxs, dys, rzs, hsrc, fi[:, None, ..., 0],
                fi[:, None, ..., 1], fi[:, None, ..., 2], *cvals)
            out_w = out_w + (pref_c * mimg)[..., None] * jnp.stack(
                [wx, wy, wz], axis=-1)
        if have_t:
            ti_s = gat["ti"][nb]
            ux, uy, uz = gen.img_terms_tr(
                dxs, dys, rzs, htgt, ti_s[:, None, ..., 0],
                ti_s[:, None, ..., 1], ti_s[:, None, ..., 2], *cvals)
            out_v = out_v + (pref_c * mimg)[..., None] * jnp.stack(
                [ux, uy, uz], axis=-1)
            wx, wy, wz = gen.img_terms_rr(
                dxs, dys, rzs, ti_s[:, None, ..., 0],
                ti_s[:, None, ..., 1], ti_s[:, None, ..., 2], *cvals)
            out_w = out_w + (pref_r * mimg)[..., None] * jnp.stack(
                [wx, wy, wz], axis=-1)
        sv = jnp.sum(out_v, axis=(2, 3)) if have_t else jnp.zeros(
            (TC, cap, 3), dtype)
        sw = jnp.sum(out_w, axis=(2, 3))
        return sv, sw

    out_v_c, out_w_c = lax.map(tile_fn, jnp.arange(0, n_pad_c, TC))
    zero_row = jnp.zeros((1, 3), dtype)

    def rows_to_particles(rows):
        rows = rows.reshape(n_pad_c * cap, 3)[:n_cells * cap]
        rows = jnp.concatenate([rows, zero_row], axis=0)
        return rows[plan.cell_slot[:n]].astype(dtype)

    v = rows_to_particles(out_v_c) if have_t else zeros_n
    w = rows_to_particles(out_w_c)
    if have_t:
        w = w + tables["self_rr"] * tv
    return v, w


# ---------------------------------------------------------------------------
# Wave field
# ---------------------------------------------------------------------------


def rot_wave(plan: ew.WallPlan, f, t, tables):
    """Rot-block wave products: pair cross/rr over real sources +
    generated image rot channels + rot polish columns. Returns (v, w)
    EXCLUDING tt. f/t are damped (N, 3) or None."""
    p = plan.params
    n = plan.n_real
    dtype = plan.pos_all.dtype
    have_f = f is not None
    have_t = t is not None
    gx, gy, gz = p.grid
    gy2 = gy // 2 + 1
    (da, db), (ia, ib), (ra, rb) = ew._z_plane_ranges(p)
    nr = rb - ra
    _, Wf_img_hp, Wi_hp = ew._host_zdft(p)
    Wf_img = lax.complex(jnp.asarray(Wf_img_hp[0]),
                         jnp.asarray(Wf_img_hp[1]))
    Wi = lax.complex(jnp.asarray(Wi_hp[0]), jnp.asarray(Wi_hp[1]))
    re_r, im_r = _host_zdft_real(p)
    Wf_real = lax.complex(jnp.asarray(re_r), jnp.asarray(im_r))
    cdt = jnp.complex64 if dtype == jnp.float32 else jnp.complex128
    if cdt == jnp.complex128:
        Wf_img = Wf_img.astype(cdt)
        Wi = Wi.astype(cdt)
        Wf_real = Wf_real.astype(cdt)
    prec = lax.Precision.HIGHEST
    pi = plan.polish_idx

    # multiplier pieces (physical k; mask strips the polish modes)
    kx, ky, kz = ew._axis_freqs(p)
    whats = ew._host_whats(p)
    KX = jnp.asarray(kx, dtype)[:, None, None]
    KY = jnp.asarray(ky, dtype)[None, :, None]
    KZ = jnp.asarray(kz, dtype)[None, None, :]
    k2 = KX * KX + KY * KY + KZ * KZ
    k2s = jnp.where(k2 > 0, k2, 1.0)
    kk = jnp.sqrt(k2s)
    phi = (1.0 + k2 / (4 * p.xi ** 2)) * jnp.exp(-k2 / (4 * p.xi ** 2))
    sinc = jnp.sin(kk * p.a) / (kk * p.a)
    x = kk * p.a
    small = x < 1e-4
    xs = jnp.where(small, 1.0, x)
    j1x = (jnp.sin(xs) / xs - jnp.cos(xs)) / (xs * xs)
    wr = jnp.where(small, 1.0 - x * x / 10.0, 3.0 * j1x)
    h3 = float(np.prod(p.spacing))
    w2 = [jnp.asarray(w, dtype) ** 2 for w in whats]
    norm = h3 / (w2[0][:, None, None] * w2[1][None, :, None]
                 * w2[2][None, None, :])
    mask = plan.polish_mask.reshape(gx, gy2, 1).astype(dtype)
    pc = jnp.where(k2 > 0, sinc * wr * phi / (2 * p.eta * k2s)
                   * norm * mask, 0.0)
    pr = jnp.where(k2 > 0, wr * wr * phi / (4 * p.eta) * norm * mask, 0.0)
    khat = jnp.stack([KX / kk, KY / kk,
                      KZ / kk * jnp.ones_like(pr)])
    khat = jnp.where(k2 > 0, khat, 0.0)
    # scaled wavenumbers + folded F2 for the generated rot multipliers
    a_ = p.a
    KXs, KYs, KZs = KX * a_, KY * a_, KZ * a_
    k2sc = k2s * (a_ * a_)
    # scaled-fit channels in physical k: W^_phys(k) = pref_n a^3 W~^(ak)
    # (the a^3 is the Fourier measure of the length rescaling)
    pref_c = (1.0 / (8.0 * jnp.pi * p.eta * a_ * a_)) * a_ ** 3
    pref_r = pref_c / a_
    base = phi * norm * mask
    F2c = jnp.where(k2 > 0, base * (4.0 * jnp.pi) / k2sc * pref_c, 0.0)
    F2r = jnp.where(k2 > 0, base * (4.0 * jnp.pi) / k2sc * pref_r, 0.0)
    zeroF = jnp.zeros((), cdt)

    def zfft(cxy, Wf):
        return jnp.einsum("cxyz,zk->cxyk", cxy, Wf, precision=prec)

    def profile(cxy, lo):
        prof = jnp.zeros((3, len(pi), gz), cdt)
        return prof.at[:, :, lo:lo + cxy.shape[3]].set(
            cxy.reshape(3, gx * gy2, -1)[:, pi])

    sub_real = plan._sub(plan.tbl_real, plan.pos_all[:n], plan.inv_real)
    sub_img = plan._sub(plan.tbl_img, plan.pos_all[n:])
    h_s = plan.heights * (1.0 / a_)                     # scaled heights

    Vacc = jnp.zeros((3, gx, gy2, nr), cdt)
    V1acc = jnp.zeros((3, gx, gy2, nr), cdt)
    Wacc = jnp.zeros((3, gx, gy2, nr), cdt)
    profs = {}

    def cross_apply(ck):
        """+i (k x c) pc  (physical)."""
        cx, cy, cz = ck[0], ck[1], ck[2]
        ux = 1j * (KY * cz - KZ * cy) * pc
        uy = 1j * (KZ * cx - KX * cz) * pc
        uz = 1j * (KX * cy - KY * cx) * pc
        return jnp.stack([ux, uy, uz])

    if have_f:
        g_f = ewald.spread(sub_real, f)                  # (3, gx, gy, gz)
        cxy_f = jnp.fft.rfft2(g_f[:, :, :, ra:rb], axes=(1, 2))
        profs["C"] = profile(cxy_f, ra)
        ck_f = zfft(cxy_f, Wf_real)
        Wacc = Wacc + jnp.einsum("cxyk,kt->cxyt", cross_apply(ck_f), Wi,
                                 precision=prec)
        # image rt channels: moments (f, (h/a) f) at image points
        f_m = jnp.concatenate([f, h_s[:, None] * f], axis=1)  # (N, 6)
        g_b = ewald.spread(sub_img, f_m)                 # (6, gx, gy, gz)
        cxy_b = jnp.fft.rfft2(g_b[:, :, :, ia:ib], axes=(1, 2))
        profs["B0"] = profile(cxy_b[:3], ia)
        profs["B1"] = profile(cxy_b[3:], ia)
        ck_b = zfft(cxy_b, Wf_img)
        wx, wy, wz = gen.mult_terms_rt(
            KXs, KYs, KZs, zeroF, F2c,
            ck_b[0], ck_b[1], ck_b[2], ck_b[3], ck_b[4], ck_b[5])
        Wacc = Wacc + jnp.einsum("cxyk,kt->cxyt",
                                 jnp.stack([wx, wy, wz]), Wi,
                                 precision=prec)
    if have_t:
        g_t = ewald.spread(sub_real, t)
        cxy_t = jnp.fft.rfft2(g_t[:, :, :, ra:rb], axes=(1, 2))
        profs["D"] = profile(cxy_t, ra)
        ck_t = zfft(cxy_t, Wf_real)
        Vacc = Vacc + jnp.einsum("cxyk,kt->cxyt", cross_apply(ck_t), Wi,
                                 precision=prec)
        kdott = jnp.sum(khat * ck_t, axis=0, keepdims=True)
        Wacc = Wacc + jnp.einsum(
            "cxyk,kt->cxyt", pr[None] * (ck_t - khat * kdott), Wi,
            precision=prec)
        # image tr / rr channels from image-spread torques
        g_e = ewald.spread(sub_img, t)
        cxy_e = jnp.fft.rfft2(g_e[:, :, :, ia:ib], axes=(1, 2))
        profs["E"] = profile(cxy_e, ia)
        ck_e = zfft(cxy_e, Wf_img)
        u0x, u0y, u0z, u1x, u1y, u1z = gen.mult_terms_tr(
            KXs, KYs, KZs, zeroF, F2c, ck_e[0], ck_e[1], ck_e[2])
        Vacc = Vacc + jnp.einsum("cxyk,kt->cxyt",
                                 jnp.stack([u0x, u0y, u0z]), Wi,
                                 precision=prec)
        V1acc = V1acc + jnp.einsum("cxyk,kt->cxyt",
                                   jnp.stack([u1x, u1y, u1z]), Wi,
                                   precision=prec)
        wx, wy, wz = gen.mult_terms_rr(
            KXs, KYs, KZs, zeroF, F2r, ck_e[0], ck_e[1], ck_e[2])
        Wacc = Wacc + jnp.einsum("cxyk,kt->cxyt",
                                 jnp.stack([wx, wy, wz]), Wi,
                                 precision=prec)

    # ---- rot polish columns
    kf = lax.complex(tables["pol_re"], tables["pol_im"]).astype(cdt)
    kf = kf.reshape(kf.shape[0], 8, 3, 3, kf.shape[-1])  # (P,8,3,3,2gz)
    blocks = {"V": [], "V1": [], "W": []}
    if have_t:
        blocks["V"].append((0, "D"))
        blocks["V"].append((3, "E"))
        blocks["V1"].append((4, "E"))
        blocks["W"].append((1, "D"))
        blocks["W"].append((7, "E"))
    if have_f:
        blocks["W"].append((2, "C"))
        blocks["W"].append((5, "B0"))
        blocks["W"].append((6, "B1"))
    prof_f = {kk_: jnp.fft.fft(v_, n=2 * gz, axis=-1)
              for kk_, v_ in profs.items()}             # (3, P, 2gz)
    acc_map = {"V": Vacc, "V1": V1acc, "W": Wacc}
    for out_name, lst in blocks.items():
        if not lst:
            continue
        add = 0.0
        for ch, src in lst:
            out_fft = jnp.einsum("pijL,jpL->ipL", kf[:, ch], prof_f[src],
                                 precision=prec)
            add = add + jnp.fft.ifft(out_fft, axis=-1)[..., ra:rb]
        acc = acc_map[out_name].reshape(3, gx * gy2, nr)
        acc_map[out_name] = acc.at[:, pi].add(add).reshape(3, gx, gy2, nr)
    Vacc, V1acc, Wacc = acc_map["V"], acc_map["V1"], acc_map["W"]

    # ---- inverse transforms + interpolation (stacked channels)
    stack = jnp.concatenate([Vacc, V1acc, Wacc], axis=0)  # (9, ...)
    Ur = jnp.fft.irfft2(stack, s=(gx, gy), axes=(1, 2))
    U = (jnp.zeros((9, gx, gy, gz), dtype)
         .at[:, :, :, ra:rb].set(Ur.astype(dtype)))
    out = ewald.interpolate(sub_real, U)                 # (N, 9)
    v = out[:, 0:3] + h_s[:, None] * out[:, 3:6]
    w = out[:, 6:9]
    return (v if have_t else jnp.zeros((n, 3), dtype)), w


# ---------------------------------------------------------------------------
# Grand product
# ---------------------------------------------------------------------------


def grand_matvec(plan: ew.WallPlan, f, t, tables):
    """(u, w) = M_grand (f, t) on the wall-spectral engine for
    single-blob bodies: tt via the existing engine, rot blocks via the
    near/wave stages above. f/t (N, 3) or None (RAW strengths; overlap
    damping B applied to inputs and outputs here, matching
    ops/mobility.grand_mobility_matvec). `tables` from
    rot_tables_device(plan.params)."""
    n = plan.n_real
    dtype = plan.pos_all.dtype
    damp = plan.damp[:, None]
    fd = None if f is None else (f * damp).astype(dtype)
    td = None if t is None else (t * damp).astype(dtype)

    v = jnp.zeros((n, 3), dtype)
    w = jnp.zeros((n, 3), dtype)
    if f is not None:
        # tt (matvec applies damping itself, on raw f)
        v = v + ew.matvec(plan, f.astype(dtype))
    nv, nw = grand_near_xla(plan, fd, td, tables)
    wv, ww = rot_wave(plan, fd, td, tables)
    v = v + damp * (nv + wv)
    w = w + damp * (nw + ww)
    return v, w
