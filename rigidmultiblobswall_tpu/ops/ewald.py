"""Spectral (Positively-Split) Ewald RPY mobility for triply-periodic
boxes — the O(N log N) far-field engine.

The reference framework has no true periodic Stokes solver: its periodic
support is the pseudo-periodic minimum-image + image-box sweep
(reference: mobility/mobility_numba.py:140-192), and its pointers to
O(N log N) far fields (FMM hooks mobility/mobility.py:775-829, the empty
DPStokes submodule) are external, optional and unported (SURVEY.md
section 2.2). This module supplies the TPU-native answer — SCALING.md
route 3, the only single-digit-chip path to the 100k-blob north star.

Mathematical formulation (derived independently; see tests for the
numerical validations):

* Periodic RPY as a lattice k-sum. Using the double-surface-average
  definition of the RPY tensor (each blob averages the Stokeslet field
  over its radius-``a`` sphere surface), the periodic blob mobility is
  EXACTLY

      M(x) = (1/V) sum_{k != 0} (1/(eta k^2)) (I - k^ k^^T)
             sinc^2(k a) e^{i k.x},

  since the surface average contributes sinc(ka) = sin(ka)/(ka) per
  blob. (Sanity check built into the construction: with no splitting
  the k-integral of this form reproduces 1/(6 pi eta a) self mobility.)
  The k = 0 mode is omitted — the standard zero-mean-flow convention.

* Hasimoto splitting. 1 = phi(k) + (1 - phi(k)) with
  phi(k) = (1 + k^2/(4 xi^2)) exp(-k^2/(4 xi^2)): the phi part stays in
  wave space (Gaussian-damped, resolved on a grid), the remainder is a
  real-space pair correction that decays like erfc(xi r) and is summed
  over a cell list within r_cut.

* Real-space scalar functions by quadrature, not closed forms. The
  remainder tensor is isotropic, alpha(r) I + beta(r) r^ r^^T, with

      alpha + beta terms = RPY_closed_form(r) - (1/2 pi^2) int_0^inf dk
          k^2 g(k) [bessel combinations] ,  g = sinc^2(ka) phi(k)/(eta k^2),

  where the free-space inverse transform of the wave part uses
      coefficient of (I - r^r^): j0(kr) - j1(kr)/(kr),
      coefficient of  r^r^     : 2 j1(kr)/(kr).
  These 1D integrals are evaluated once on the host (f64 Simpson on a
  radial table) and interpolated on device — same pattern as the
  lubrication resistance tables, and immune to transcription errors in
  the erfc-zoo of published closed forms.

* NUFFT spreading with an exponential-of-semicircle window
  w(x) = exp(beta (sqrt(1 - (x/R)^2) - 1)) (the FINUFFT kernel: error
  ~ e^{-1.8 P} at oversampling 1.5, far better than a Gaussian's
  e^{-pi P/4}), FFT, k-space scaling by M^w(k)/w^(k)^2 (deconvolving
  both spread and interpolate; w^ by host-side quadrature per axis),
  inverse FFT, window interpolation. The grid oversamples the kernel
  cutoff k_max by `oversample` to push window aliasing below tol.

* TPU-native gridding with NO scatter. XLA:TPU lowers scatter-add with
  colliding indices to a serialized update loop — at N x P^3 stamp
  points it is unusably slow (measured: minutes at 98k blobs). Instead,
  z-slab gridding: every particle registers one entry per x-plane it
  stamps (P entries), keyed by (plane, z-block of height ZB >= P-1);
  entries are sorted into fixed-capacity segments at plan time. Each
  yz-plane is then assembled as one BATCHED (over z-blocks) matmul

      slab_t[b, (c,q)] = sum_{p in seg(a,t)} (wx_p Y[p,b])^T
                                              (Z16[p,c] f[p,q]),

  where Y is the dense window row along y (gy cols, MXU-contracted)
  but Z16 is COMPACT — evaluated only on the 2*ZB-wide slab of the
  particle's own z-block — and the overlapping slabs are reduced onto
  the plane by two reshapes + two periodic rolls (even/odd block
  families tile the axis exactly). Versus a dense-z formulation this
  cuts the window-evaluation count by gz/(2 ZB) and the matmul flops
  by the same factor; keying segments by (plane, z-block) directly
  (rather than per-bucket capacities) absorbs bucket-occupancy
  variance into the sort, so the segment capacity tracks the MEAN
  population. Interpolation is the exact transpose followed by a tiny
  (N, P) gather via a plan-time inverse index — fully collision-free.

Both split parts are symmetric positive definite (phi and 1-phi are
positive multipliers of an SPD kernel), so Lanczos noise and the whole
integrator stack run unchanged on this matvec.
"""

from __future__ import annotations

import dataclasses
import math
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import cells


# ---------------------------------------------------------------------------
# Host-side: closed-form RPY and the quadrature-built remainder tables
# ---------------------------------------------------------------------------


def rpy_scalar_functions(r, a, eta):
    """Unbounded RPY mobility scalars: M = alpha I + beta r^ r^^T.

    r >= 2a: (1/(8 pi eta r)) [(1 + 2a^2/3r^2) I + (1 - 2a^2/r^2) rr];
    r <  2a: (1/(6 pi eta a)) [(1 - 9r/32a) I + (3r/32a) rr]."""
    r = np.asarray(r, dtype=np.float64)
    with np.errstate(divide="ignore", invalid="ignore"):
        far_a = (1.0 + 2.0 * a * a / (3.0 * r * r)) / (8 * np.pi * eta * r)
        far_b = (1.0 - 2.0 * a * a / (r * r)) / (8 * np.pi * eta * r)
    near_a = (1.0 - 9.0 * r / (32.0 * a)) / (6 * np.pi * eta * a)
    near_b = (3.0 * r / (32.0 * a)) / (6 * np.pi * eta * a)
    alpha = np.where(r >= 2 * a, far_a, near_a)
    beta = np.where(r >= 2 * a, far_b, near_b)
    return alpha, beta


def _bessel_weights(x):
    """(j0(x) - j1(x)/x, 2 j1(x)/x) with series near x=0."""
    x = np.asarray(x, dtype=np.float64)
    small = np.abs(x) < 1e-4
    xs = np.where(small, 1.0, x)
    j0 = np.sin(xs) / xs
    j1_over_x = (np.sin(xs) / xs - np.cos(xs)) / (xs * xs)
    perp = np.where(small, 2.0 / 3.0 - 2.0 * x * x / 15.0, j0 - j1_over_x)
    par = np.where(small, 2.0 / 3.0 - x * x / 15.0, 2.0 * j1_over_x)
    return perp, par


def wave_freespace_scalars(r, a, eta, xi, *, n_k=4001):
    """Free-space inverse transform of the wave-space kernel at radii r:
    returns (c_perp, c_par) with M^w_free = c_perp (I - rr) + c_par rr,
    by Simpson quadrature over k in [0, k_max]."""
    r = np.asarray(r, dtype=np.float64)
    k_max = 2.0 * xi * math.sqrt(math.log(1e22))
    k = np.linspace(0.0, k_max, n_k)
    k[0] = 1e-30
    sinc = np.sin(k * a) / (k * a)
    phi = (1.0 + k * k / (4 * xi * xi)) * np.exp(-k * k / (4 * xi * xi))
    g_times_k2 = sinc * sinc * phi / eta  # k^2 g(k)
    x = np.outer(r, k)  # (nr, nk)
    perp_w, par_w = _bessel_weights(x)
    from scipy.integrate import simpson

    c_perp = simpson(g_times_k2[None, :] * perp_w, x=k, axis=1) / (
        2 * np.pi**2)
    c_par = simpson(g_times_k2[None, :] * par_w, x=k, axis=1) / (
        2 * np.pi**2)
    return c_perp, c_par


def rot_scalar_functions(r, a, eta):
    """Unbounded RPY rot-block scalars (reference pair math
    ops/rpy.py::rpy_cross / rpy_rr, mobility_numba semantics).

    cross: M_UT = M_WF = gamma(r) [r x]  (gamma multiplies the UNnormalized
      displacement), gamma = 1/(8 pi eta r^3) for r >= 2a and the RPY
      overlap form under;
    rr:    M_WT = alpha_rr I + beta_rr rhat rhat."""
    r = np.asarray(r, dtype=np.float64)
    rs = np.maximum(r, 1e-14)
    pref2 = 1.0 / (8 * np.pi * eta * a**3)
    with np.errstate(divide="ignore", invalid="ignore"):
        gamma_far = 1.0 / (8 * np.pi * eta * rs**3)
        a_far = -0.5 * pref2 * (a / rs) ** 3
        b_far = 1.5 * pref2 * (a / rs) ** 3
    x = rs / a
    gamma_near = pref2 * 0.5 * (1.0 - 0.375 * x)
    # near rr: c1 + c2 * d d (d scaled) -> alpha = c1, beta = c2 * x^2
    c1 = pref2 * (1.0 - 0.84375 * x + 0.078125 * x**3)
    c2x2 = pref2 * (0.28125 / np.maximum(x, 1e-14) - 0.046875 * x) * x * x
    gamma = np.where(r >= 2 * a, gamma_far, gamma_near)
    alpha_rr = np.where(r >= 2 * a, a_far, c1)
    beta_rr = np.where(r >= 2 * a, b_far, c2x2)
    return gamma, alpha_rr, beta_rr


def _w_r(x):
    """RPY rotlet window 3 j1(x)/x with series near 0."""
    x = np.asarray(x, dtype=np.float64)
    small = np.abs(x) < 1e-4
    xs = np.where(small, 1.0, x)
    j1_over_x = (np.sin(xs) / xs - np.cos(xs)) / (xs * xs)
    return np.where(small, 1.0 - x * x / 10.0, 3.0 * j1_over_x)


def rot_wave_freespace_scalars(r, a, eta, xi, *, n_k=4001):
    """Free-space inverse transforms of the wave-space rot kernels:
    cross gamma_w(r) (M_w = gamma_w [r x]) and rr (c_perp, c_par) with
    M_w_rr = c_perp (I - rr) + c_par rr. Wave multipliers (PSE grand
    mobility, Fiore/Balboa/Donev/Swan 2017 form):
      cross: -(i k x)/(2 eta k^2) sinc(ka) w_r(ka) phi(k)
      rr:    (w_r(ka)^2 phi(k) / (4 eta)) (I - khat khat)."""
    r = np.asarray(r, dtype=np.float64)
    k_max = 2.0 * xi * math.sqrt(math.log(1e22))
    k = np.linspace(0.0, k_max, n_k)
    k[0] = 1e-30
    sinc = np.sin(k * a) / (k * a)
    wr = _w_r(k * a)
    phi = (1.0 + k * k / (4 * xi * xi)) * np.exp(-k * k / (4 * xi * xi))
    from scipy.integrate import simpson

    # gamma_w(r) r_k = rhat_k d/dr IFT[-(sinc wr phi)/(2 eta k^2)]
    #   => gamma_w = (1/(4 pi^2 eta r)) Int k sinc wr phi j1(kr) dk
    x = np.outer(r, k)
    small = np.abs(x) < 1e-6
    xs = np.where(small, 1.0, x)
    j1 = np.where(small, x / 3.0, np.sin(xs) / (xs * xs) - np.cos(xs) / xs)
    rs = np.maximum(r, 1e-14)
    gamma_w = simpson((k * sinc * wr * phi)[None, :] * j1, x=k,
                      axis=1) / (4 * np.pi**2 * eta * rs)
    # r = 0: gamma_w multiplies r_k -> value irrelevant; keep finite limit
    gamma_w = np.where(r < 1e-12,
                       simpson(k * k * sinc * wr * phi / 3.0, x=k)
                       / (4 * np.pi**2 * eta), gamma_w)
    g_rr_times_k2 = k * k * wr * wr * phi / (4 * eta)
    perp_w, par_w = _bessel_weights(x)
    c_perp = simpson(g_rr_times_k2[None, :] * perp_w, x=k, axis=1) / (
        2 * np.pi**2)
    c_par = simpson(g_rr_times_k2[None, :] * par_w, x=k, axis=1) / (
        2 * np.pi**2)
    return gamma_w, c_perp, c_par


def rot_realspace_tables(a, eta, xi, r_max, *, n_points=2048):
    """Radial tables of the rot-block real-space remainder scalars:
    (r, gamma_r, alpha_rr_r, beta_rr_r, self_rr) with
      cross remainder = gamma_r [r x],
      rr remainder    = alpha_rr_r I + beta_rr_r rhat rhat,
      self_rr = RPY rr self 1/(8 pi eta a^3) minus the wave self."""
    r = np.linspace(0.0, r_max, n_points)
    gamma, alpha_rr, beta_rr = rot_scalar_functions(r, a, eta)
    alpha_rr[0] = 1.0 / (8 * np.pi * eta * a**3)
    beta_rr[0] = 0.0
    gamma_w, c_perp, c_par = rot_wave_freespace_scalars(r, a, eta, xi)
    gamma_r = gamma - gamma_w
    alpha_rr_r = alpha_rr - c_perp
    beta_rr_r = beta_rr - (c_par - c_perp)
    self_rr = 1.0 / (8 * np.pi * eta * a**3) - c_perp[0]
    return r, gamma_r, alpha_rr_r, beta_rr_r, self_rr


def rpy_radii_scalar_functions(r, ag, ah, eta):
    """Unequal-radii RPY TT scalars (alpha, beta) with
    M = alpha I + beta rhat rhat^T — numpy mirror of ops/rpy.rpy_tt_radii
    (reference radii kernels, mobility/mobility.py:830-966): the
    Rotne-Prager far form, the Wajnryb-et-al overlap form for
    |ag-ah| < r < ag+ah, and the rigid "one inside the other" plateau."""
    r = np.asarray(r, dtype=np.float64)
    rs = np.maximum(r, 1e-14)
    s2 = ag * ag + ah * ah
    pref = 1.0 / (8.0 * np.pi * eta)
    c1_far = (1.0 + s2 / (3.0 * rs * rs)) / rs
    c2_far = (1.0 - s2 / (rs * rs)) / rs**3
    dd2 = (ah - ag) ** 2
    ft = 4.0 / 3.0
    c1_mid = ((16.0 * (ag + ah) * rs**3 - (dd2 + 3.0 * rs * rs) ** 2)
              / (32.0 * rs**3)) * ft / (ag * ah)
    c2_mid = (3.0 * (dd2 - rs * rs) ** 2 / (32.0 * rs**5)) * ft / (ag * ah)
    c1_near = np.full_like(rs, ft / max(ag, ah))
    far = r > (ag + ah)
    mid = (~far) & (r > abs(ah - ag))
    c1 = np.where(far, c1_far, np.where(mid, c1_mid, c1_near))
    c2 = np.where(far, c2_far, np.where(mid, c2_mid, 0.0))
    return pref * c1, pref * c2 * r * r


def wave_freespace_scalars_radii(r, ag, ah, eta, xi, *, n_k=4001):
    """Free-space inverse transform of the wave-space kernel with
    PER-GROUP shape factors sinc(k ag) sinc(k ah) (the polydisperse PSE
    wave multiplier): (c_perp, c_par) with
    M^w_free = c_perp (I - rr) + c_par rr."""
    r = np.asarray(r, dtype=np.float64)
    k_max = 2.0 * xi * math.sqrt(math.log(1e22))
    k = np.linspace(0.0, k_max, n_k)
    k[0] = 1e-30
    sinc_g = np.sin(k * ag) / (k * ag)
    sinc_h = np.sin(k * ah) / (k * ah)
    phi = (1.0 + k * k / (4 * xi * xi)) * np.exp(-k * k / (4 * xi * xi))
    g_times_k2 = sinc_g * sinc_h * phi / eta
    x = np.outer(r, k)
    perp_w, par_w = _bessel_weights(x)
    from scipy.integrate import simpson

    c_perp = simpson(g_times_k2[None, :] * perp_w, x=k, axis=1) / (
        2 * np.pi**2)
    c_par = simpson(g_times_k2[None, :] * par_w, x=k, axis=1) / (
        2 * np.pi**2)
    return c_perp, c_par


def pair_remainder_radii(r, ag, ah, eta, xi):
    """Real-space remainder scalars (alpha_r, beta_r) for a group pair
    (ag, ah), evaluated DIRECTLY at radii r (quadrature, no tables):
    M^r(r; ag, ah) = RPY_radii(r) - M^w_free(r; sinc_g sinc_h). The
    r = 0 entry is the (g == g) self remainder."""
    r = np.asarray(r, dtype=np.float64)
    alpha, beta = rpy_radii_scalar_functions(r, ag, ah, eta)
    c_perp, c_par = wave_freespace_scalars_radii(r, ag, ah, eta, xi)
    return alpha - c_perp, beta - (c_par - c_perp)


def realspace_tables(a, eta, xi, r_max, *, n_points=2048):
    """Radial tables of the real-space remainder scalars
    (alpha_r, beta_r) with M^r(r) = alpha_r I + beta_r r^ r^^T =
    RPY(r) - M^w_free(r), on r in [0, r_max]. Returns
    (r_grid, alpha_r, beta_r, self_coeff) as float64 numpy arrays."""
    r = np.linspace(0.0, r_max, n_points)
    alpha, beta = rpy_scalar_functions(np.maximum(r, 1e-14), a, eta)
    # r = 0 entry: pair functions continuous at 0 via the near form
    alpha[0], beta[0] = 1.0 / (6 * np.pi * eta * a), 0.0
    c_perp, c_par = wave_freespace_scalars(r, a, eta, xi)
    # M^w_free = c_perp I + (c_par - c_perp) rr
    alpha_r = alpha - c_perp
    beta_r = beta - (c_par - c_perp)
    self_coeff = 1.0 / (6 * np.pi * eta * a) - c_perp[0]
    return r, alpha_r, beta_r, self_coeff


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EwaldParams:
    """Static spectral-Ewald configuration for one (box, a, eta, accuracy)."""

    a: float
    eta: float
    box: Tuple[float, float, float]
    xi: float
    r_cut: float
    grid: Tuple[int, int, int]
    support: int = 8           # window width P (grid points per axis)
    es_beta_factor: float = 0.98  # beta = f * pi * P * (1 - 1/(2*gamma))
    oversample: float = 1.5
    n_table: int = 2048
    # near-field cell-list slots per cell (0 = auto: mean occupancy +
    # 4 sigma, lane-rounded; make_plan stores the resolved value)
    cell_capacity: int = 48
    row_tile: int = 2048
    # entries per (plane, z-block) segment for the z-slab gridding
    # (0 = auto: 1.35x the mean + 5 sigma, rounded up to 8)
    bucket_capacity: int = 0
    plane_batch: int = 4       # yz-planes assembled per lax.map step
    # MXU precision for the gridding matmuls: f32 inputs on TPU default
    # to bf16 passes, far below the window accuracy — keep "highest"
    # unless tol is loose
    precision: str = "highest"
    # real-space sweep: cells per lax.map tile, Chebyshev terms per piece
    # (0 = grow the degree until the fit error is well under tol)
    cell_tile: int = 16
    n_cheb: int = 0
    # near-field engine: "pallas" = fused VPU kernel over a plan-time
    # pre-gathered (cell, 27*cap) source layout (TPU), "xla" = the
    # lax.map cell sweep, "auto" = pallas on TPU else xla
    near_impl: str = "auto"
    near_tile: int = 8         # cells per Pallas grid step
    tol: float = 1e-4          # accuracy target the params were built for
    # distinct per-blob radii (mixed-radii mode): when non-empty, the
    # wave kernel carries per-GROUP sinc(k a_g) shape factors (exact
    # polydisperse PSE — SPD by congruence), the near field uses
    # per-group-pair remainder tables, and make_plan needs group_of.
    # `a` then plays the grid/r_cut sizing role (pass max(radii)).
    radii: Tuple[float, ...] = ()

    @property
    def spacing(self):
        return tuple(L / n for L, n in zip(self.box, self.grid))

    @property
    def es_beta(self):
        return (self.es_beta_factor * math.pi * self.support
                * (1.0 - 0.5 / self.oversample))

    @property
    def zslab(self) -> int:
        """z-block height ZB for the slab gridding: slabs are 2*ZB wide
        and tile the z axis in two non-overlapping (even/odd) families,
        so the assembled plane is two reshapes + two rolls. Requires
        ZB >= support - 1 (a particle's window stays inside its own
        slab) and gz % (2 ZB) == 0 (an even number of blocks)."""
        gz = self.grid[2]
        if gz % 2:
            # the slab families tile z in pairs; an odd gz cannot satisfy
            # gz % (2 ZB) == 0 for any ZB and would silently corrupt the
            # gridding layout (default_params always rounds grids even)
            raise ValueError(f"spectral grid z dimension must be even, "
                             f"got {gz}")
        pm = max(self.support - 1, 8)
        for m in range(max(gz // (2 * pm), 1), 0, -1):
            if gz % (2 * m) == 0:
                return gz // (2 * m)
        return gz // 2


def _round_up_even(n):
    n = int(math.ceil(n))
    return n + (n % 2)


def _fft_friendly(n):
    """True when n has no prime factor beyond 7 (radix-friendly FFTs;
    e.g. 82 = 2 x 41 falls back to Bluestein on TPU)."""
    for p in (2, 3, 5, 7):
        while n % p == 0:
            n //= p
    return n == 1


def _round_up_grid(n, *, zslab_pm=None):
    """Round a per-axis grid size up to an even, FFT-friendly value.
    With zslab_pm set (the z axis of a slab layout), additionally
    require the z-slab rule (EwaldParams.zslab) to land a compact block
    height ZB <= 1.5 * pm — e.g. a naive gz = 82 factors as 2 x 41,
    forcing ZB = 41: 5x-wide gridding windows AND a radix-41 FFT."""
    g = _round_up_even(n)
    while True:
        if _fft_friendly(g):
            if zslab_pm is None:
                return g
            for m in range(max(g // (2 * zslab_pm), 1), 0, -1):
                if g % (2 * m) == 0:
                    zb = g // (2 * m)
                    break
            if zb <= (3 * zslab_pm) // 2:
                return g
        g += 2


def default_params(a, eta, box, *, tol=1e-4, r_cut_factor=None,
                   support=None, oversample=1.5, grid_max=256,
                   **kw) -> EwaldParams:
    """Heuristic parameter choice: splitting error ~ exp(-s^2) on both
    sides with s = xi r_cut = k_max/(2 xi); r_cut defaults to ~6a so the
    near sweep stays cheap, then xi = s/r_cut and the grid resolves
    gamma * k_max with k_max = 2 s xi. The window support defaults from
    the measured ES error model err ~ exp(5.5 - 1.81 P) at oversample
    1.5 (tests/test_ewald.py scan).

    grid_max caps the per-axis grid size: since grid ~ 1/r_cut, dilute
    boxes (large L/a) would otherwise demand enormous FFTs for a fixed
    r_cut = 6a; when the cap binds, r_cut is inflated (shifting work to
    the O(N) near-field sweep) so the wave grid stays bounded."""
    if support is None:
        support = int(min(max(math.ceil(
            (5.5 - math.log(0.3 * tol)) / 1.81), 6), 14))
    s = math.sqrt(max(-math.log(tol * 0.002), 4.0))
    box = tuple(float(b) for b in box)
    r_cut = (r_cut_factor if r_cut_factor is not None else 6.0) * a
    r_cut = min(r_cut, 0.45 * min(box))

    pm = max(int(support) - 1, 8)

    def _grid(rc):
        k_max = 2.0 * s * s / rc
        return tuple(max(_round_up_grid(oversample * k_max * L / math.pi,
                                        zslab_pm=pm if d == 2 else None), 8)
                     for d, L in enumerate(box))

    grid = _grid(r_cut)
    if grid_max and max(grid) > grid_max:
        r_cut = min(r_cut * max(grid) / float(grid_max), 0.45 * min(box))
        grid = _grid(r_cut)
    xi = s / r_cut
    return EwaldParams(a=float(a), eta=float(eta), box=box, xi=xi,
                       r_cut=r_cut, grid=grid, support=int(support),
                       oversample=float(oversample), tol=float(tol), **kw)


# ---------------------------------------------------------------------------
# The plan: everything reusable across matvecs at fixed positions
# ---------------------------------------------------------------------------


import functools


@functools.lru_cache(maxsize=16)
def _host_tables(params: EwaldParams):
    """Cached host-side radial tables (one quadrature per parameter set,
    shared by every make_plan call / jit trace)."""
    return realspace_tables(params.a, params.eta, params.xi, params.r_cut,
                            n_points=params.n_table)


@functools.lru_cache(maxsize=16)
def _host_cheb(params: EwaldParams):
    """Piecewise-Chebyshev fits of the real-space remainder scalars.

    Per-pair table gathers are slow on TPU; a K-term Clenshaw recurrence
    is pure VPU arithmetic. Two pieces ([0, 2a] and [2a, r_cut]) because
    the RPY scalars have a derivative kink at touching distance r = 2a.
    Returns (coeffs (2, 2, K), self_coeff); fit residual vs the
    quadrature tables is ~1e-9 (asserted in tests/test_ewald.py)."""
    from numpy.polynomial import chebyshev as npcheb

    r, a_tab, b_tab, self_c = _host_tables(params)
    edges = [(0.0, 2.0 * params.a), (2.0 * params.a, params.r_cut)]
    scale = 1.0 / (6 * np.pi * params.eta * params.a)
    target = 0.05 * params.tol
    for K in ([params.n_cheb] if params.n_cheb
              else (8, 10, 12, 14, 16, 20, 24, 28, 32)):
        out = np.zeros((2, 2, K))
        err = 0.0
        for i, (lo, hi) in enumerate(edges):
            m = (r >= lo) & (r <= hi)
            t = (2.0 * r[m] - (hi + lo)) / (hi - lo)
            for j, tab in enumerate((a_tab, b_tab)):
                out[i, j] = npcheb.chebfit(t, tab[m], K - 1)
                err = max(err, np.abs(
                    npcheb.chebval(t, out[i, j]) - tab[m]).max() / scale)
        if params.n_cheb or err < target:
            break
    return out, self_c


def _radii_pair_edges(params: EwaldParams, g: int, h: int):
    """Radial piece edges for group pair (g, h): the RPY radii scalars
    kink at |ag - ah| (one-inside-the-other boundary) and at ag + ah
    (touching), so each pair table is fit in three pieces. The first
    edge is floored away from zero so a same-radius pair keeps three
    well-conditioned (if tiny) pieces."""
    ag, ah = params.radii[g], params.radii[h]
    e1 = max(abs(ag - ah), 1e-3 * params.r_cut)
    e2 = ag + ah
    if not e1 < e2 < params.r_cut:
        raise ValueError(
            f"radii pair ({ag}, {ah}) needs r_cut > ag + ah "
            f"(r_cut={params.r_cut}); raise r_cut_factor")
    return (0.0, e1, e2, params.r_cut)


@functools.lru_cache(maxsize=16)
def _host_cheb_radii(params: EwaldParams):
    """Piecewise-Chebyshev fits of the per-group-pair real-space
    remainder scalars (mixed-radii mode). Fits use per-piece Chebyshev
    nodes evaluated by direct quadrature (pair_remainder_radii), so tiny
    pieces stay well-sampled. Returns (coeffs (G, G, 3 pieces,
    2 funcs, K), self_coeffs (G,))."""
    from numpy.polynomial import chebyshev as npcheb

    G = len(params.radii)
    scale = 1.0 / (6 * np.pi * params.eta * min(params.radii))
    target = 0.05 * params.tol
    for K in ([params.n_cheb] if params.n_cheb
              else (10, 12, 14, 16, 20, 24, 28, 32)):
        out = np.zeros((G, G, 3, 2, K))
        selfs = np.zeros((G,))
        err = 0.0
        nodes = np.cos(np.pi * (np.arange(4 * K) + 0.5) / (4 * K))
        for g in range(G):
            for h in range(g, G):
                edges = _radii_pair_edges(params, g, h)
                for i in range(3):
                    lo, hi = edges[i], edges[i + 1]
                    r = 0.5 * (hi + lo) + 0.5 * (hi - lo) * nodes
                    al, be = pair_remainder_radii(
                        r, params.radii[g], params.radii[h],
                        params.eta, params.xi)
                    for j, tab in enumerate((al, be)):
                        out[g, h, i, j] = npcheb.chebfit(nodes, tab, K - 1)
                        err = max(err, np.abs(
                            npcheb.chebval(nodes, out[g, h, i, j])
                            - tab).max() / scale)
                out[h, g] = out[g, h]
            a0, _ = pair_remainder_radii(
                np.asarray([0.0]), params.radii[g], params.radii[g],
                params.eta, params.xi)
            selfs[g] = a0[0]
        if params.n_cheb or err < target:
            break
    return out, selfs


@functools.lru_cache(maxsize=16)
def _host_whats(params: EwaldParams):
    """Per-axis window transforms w^(k) (host quadrature; tiny (g,)
    arrays — the only host-side k-space data)."""
    P = params.support
    beta = params.es_beta
    ks = _axis_freqs(params)
    return tuple(_es_window_hat(kd, 0.5 * P * hd, beta)
                 for kd, hd in zip(ks, params.spacing))


def _axis_freqs(params: EwaldParams):
    """Per-axis angular frequencies; the z axis is the rfft half-spectrum
    (the spread grid is real, so the wave product runs on rfftn output —
    half the FFT flops and k-table memory)."""
    (gx, gy, gz) = params.grid
    (Lx, Ly, Lz) = params.box
    return [2.0 * np.pi * np.fft.fftfreq(gx, d=Lx / gx),
            2.0 * np.pi * np.fft.fftfreq(gy, d=Ly / gy),
            2.0 * np.pi * np.fft.rfftfreq(gz, d=Lz / gz)]


def _device_kernel(params: EwaldParams, dtype, *, include_sinc=True):
    """k-space multiplier and unit wave vectors, assembled ON DEVICE from
    1-D inputs. The (g^3) tables must never be host constants: baked into
    a jitted step they blow the HLO up by hundreds of MB (the remote
    compile service rejects it), and they would be re-shipped per
    compile. Device assembly is ~20 flops/mode, sub-ms per plan.
    include_sinc=False drops the sinc(ka)^2 shape factor (mixed-radii
    mode applies per-GROUP factors separately, see _group_sinc)."""
    whats = _host_whats(params)
    ks = [jnp.asarray(kd, dtype) for kd in _axis_freqs(params)]
    kx = ks[0][:, None, None]
    ky = ks[1][None, :, None]
    kz = ks[2][None, None, :]
    k2 = kx * kx + ky * ky + kz * kz
    k2_safe = jnp.where(k2 > 0, k2, 1.0)
    k = jnp.sqrt(k2_safe)
    sinc2 = (jnp.sin(k * params.a) / (k * params.a)) ** 2 \
        if include_sinc else 1.0
    phi = (1.0 + k2 / (4 * params.xi**2)) * jnp.exp(
        -k2 / (4 * params.xi**2))
    h3 = float(np.prod(params.spacing))
    w2 = [jnp.asarray(w, dtype) ** 2 for w in whats]
    what2 = w2[0][:, None, None] * w2[1][None, :, None] * w2[2][None, None, :]
    # normalization: spread-side quadrature h^3/w^ twice, (1/V) sum_k,
    # and ifftn's 1/n^3 combine to exactly h^3 / w^^2 (V = n^3 h^3)
    kern = (sinc2 * phi / (params.eta * k2_safe)) * h3 / what2
    kern = kern.at[0, 0, 0].set(0.0)
    khat = jnp.stack([jnp.broadcast_to(kx / k, k2.shape),
                      jnp.broadcast_to(ky / k, k2.shape),
                      jnp.broadcast_to(kz / k, k2.shape)], axis=0)
    khat = khat.at[:, 0, 0, 0].set(0.0)
    return kern, khat


def _group_sinc(params: EwaldParams, dtype):
    """Per-group sinc(k a_g) shape-factor stack (G, nx, ny, nz//2+1),
    assembled on device (mixed-radii mode)."""
    ks = [jnp.asarray(kd, dtype) for kd in _axis_freqs(params)]
    k2 = (ks[0][:, None, None] ** 2 + ks[1][None, :, None] ** 2
          + ks[2][None, None, :] ** 2)
    k = jnp.sqrt(jnp.where(k2 > 0, k2, 1.0))
    return jnp.stack([jnp.sin(k * ag) / (k * ag) for ag in params.radii])


@dataclasses.dataclass(frozen=True)
class SpectralPlan:
    """Everything reusable across matvecs at fixed positions. Registered
    as a pytree with (cell_dims, params) static, so plans pass through
    jit/vmap boundaries as arguments — the 200+ MB k-space tables must
    NOT be closure-captured into jitted functions (they would be baked
    into the HLO as constants)."""

    positions: jax.Array      # (N, 3) wrapped into the box
    sort_pos: jax.Array       # (N, 3) positions the cell/segment sort was
    #                           built at: update_plan measures its drift
    #                           budget against THESE (not the last
    #                           refresh), so cumulative cross-step drift
    #                           triggers the full rebuild
    # real-space: piecewise-Chebyshev radial scalars + padded cell layout
    cheb: jax.Array           # (2 pieces, 2 funcs {alpha,beta}, K) coeffs
    self_coeff: jax.Array     # scalar
    cell_table: jax.Array     # (n_cells * cap,) particle ids (pad N)
    cell_slot: jax.Array      # (N,) flat (cell, slot) row per particle
    nbr_cells: jax.Array      # (n_cells, 27) neighbor cell ids
    n_dropped_cells: jax.Array  # scalar int32: cell-capacity overflows
    cell_dims: Tuple[int, int, int]
    # wave-space: (plane, z-block) segment layout for the z-slab gridding
    grid_tbl: jax.Array       # (gx * nzb * cap_seg,) int32 particle ids
    #                           (pad N), segment-major
    inv_idx: jax.Array        # (N, P) int32 segment rows of each
    #                           particle's P plane entries
    n_dropped: jax.Array      # scalar int32: segment-capacity overflows
    # Pallas near-field: plan-time pre-gathered source layout. Sources of
    # cell c = the slots of its 27 neighbor cells, wrap shifts resolved
    # into the stored positions (no min-image math in the kernel). All
    # None when the XLA near-field path is selected.
    src_pos: jax.Array | None  # (3, C_pad, S) f32, S = pad128(27 * cap)
    src_ids: jax.Array | None  # (C_pad, S) int32 particle ids (pad N)
    tgt_xyz: jax.Array | None  # (C_pad * cap, 3) target slot positions
    kernel: jax.Array         # (nx, ny, nz//2+1) scalar k-space multiplier
    khat: jax.Array           # (3, nx, ny, nz//2+1) unit wave vectors (rfft
    #                           half-spectrum along z)
    params: EwaldParams
    # mixed-radii mode (params.radii non-empty); all None otherwise.
    # kernel then carries the BASE multiplier (no sinc^2): per-group
    # factors live in gsinc, self_coeff is per-particle (N, 1), and the
    # near sweep selects per-group-pair tables from cheb_radii.
    group_of: jax.Array | None = None    # (N,) int32 radius-group index
    gsinc: jax.Array | None = None       # (G, nx, ny, nz//2+1)
    cheb_radii: jax.Array | None = None  # (G, G, 3 pieces, 2 funcs, K)

    @property
    def cap_seg(self) -> int:
        gx, _, gz = self.params.grid
        nzb = gz // self.params.zslab
        return self.grid_tbl.shape[0] // (gx * nzb)


jax.tree_util.register_dataclass(
    SpectralPlan,
    data_fields=["positions", "sort_pos", "cheb", "self_coeff",
                 "cell_table", "cell_slot", "nbr_cells", "n_dropped_cells",
                 "grid_tbl", "inv_idx", "n_dropped",
                 "src_pos", "src_ids", "tgt_xyz",
                 "kernel", "khat", "group_of", "gsinc", "cheb_radii"],
    meta_fields=["cell_dims", "params"])


def _resolve_near_impl(params: EwaldParams) -> str:
    if params.near_impl != "auto":
        return params.near_impl
    return ("pallas" if jax.default_backend() in ("tpu", "axon") else "xla")


def _es_window_np(x, R, beta):
    """Exponential-of-semicircle window on |x| <= R (numpy, host)."""
    t = np.clip(np.asarray(x, np.float64) / R, -1.0, 1.0)
    w = np.exp(beta * (np.sqrt(np.maximum(1.0 - t * t, 0.0)) - 1.0))
    return np.where(np.abs(x) <= R, w, 0.0)


def _es_window_hat(k, R, beta, *, n_quad=2000):
    """w^(k) = 2 int_0^R w(x) cos(kx) dx by host quadrature (the ES
    kernel has no closed-form transform)."""
    from scipy.integrate import simpson

    x = np.linspace(0.0, R, n_quad)
    w = _es_window_np(x, R, beta)
    k = np.atleast_1d(np.asarray(k, np.float64))
    integ = w[None, :] * np.cos(np.outer(k, x))
    return 2.0 * simpson(integ, x=x, axis=1)


def make_grid_layout(params: EwaldParams, pos, bucket_capacity=0):
    """(plane, z-block) segment layout for the z-slab gridding of one
    point set: each particle registers one entry per x-plane it stamps
    (P entries), keyed by (plane, z-block); entries are sorted into
    fixed-capacity segments so the capacity tracks the MEAN plane
    population N P / (gx nzb), not a per-bucket tail. Returns
    (grid_tbl (gx*nzb*cap_seg,), inv_idx (N, P), n_dropped). Factored
    out of make_plan so the wall engine (ops/ewald_wall.py) builds
    layouts for its several point sets (real+image, image, real)."""
    n = pos.shape[0]
    P = params.support
    gx, gy, gz = params.grid
    hx = params.box[0] / gx
    hz = params.box[2] / gz
    ZB = params.zslab
    nzb = gz // ZB
    G = gx * nzb
    cap_seg = bucket_capacity
    if cap_seg <= 0:
        mean_seg = n * P / G
        cap_seg = int(-(-(1.35 * mean_seg + 5.0 * math.sqrt(mean_seg)
                          + 8.0) // 8) * 8)
    offs = jnp.arange(P, dtype=jnp.int32) - P // 2
    base_x = jnp.mod(jnp.round(pos[:, 0] / hx).astype(jnp.int32), gx)
    base_z = jnp.mod(jnp.round(pos[:, 2] / hz).astype(jnp.int32), gz)
    tblk = base_z // ZB                                       # (N,)
    planes_of = jnp.mod(base_x[:, None] + offs[None, :], gx)  # (N, P)
    bucket = (planes_of * nzb + tblk[:, None]).reshape(-1)    # (N*P,)
    order = jnp.argsort(bucket)
    sb = bucket[order]
    slot_sorted = jnp.arange(n * P) - jnp.searchsorted(sb, sb, side="left")
    in_cap = slot_sorted < cap_seg
    addr = jnp.where(in_cap, sb * cap_seg + slot_sorted, G * cap_seg)
    grid_tbl = jnp.full((G * cap_seg + 1,), n, dtype=jnp.int32)
    grid_tbl = grid_tbl.at[addr].set((order // P).astype(jnp.int32))
    grid_tbl = grid_tbl[:-1]
    n_dropped = jnp.sum(~in_cap).astype(jnp.int32)
    # inverse map: entry (p, i) -> its segment row (sentinel when dropped)
    slot_of = jnp.full((n * P,), cap_seg, jnp.int32).at[order].set(
        jnp.where(in_cap, slot_sorted, cap_seg).astype(jnp.int32)
    ).reshape(n, P)
    inv_idx = jnp.where(slot_of < cap_seg,
                        bucket.reshape(n, P) * cap_seg + slot_of,
                        G * cap_seg)
    return grid_tbl, inv_idx, n_dropped


def make_plan(params: EwaldParams, positions,
              group_of=None) -> SpectralPlan:
    """Build the reusable machinery for M v products at fixed positions
    (one plan per configuration; ~45 matvecs amortize it per step).
    Mixed-radii mode (params.radii non-empty) additionally needs
    group_of: (N,) int32 index of each blob's radius group."""
    dtype = positions.dtype
    box = jnp.asarray(params.box, dtype)
    pos = positions - jnp.floor(positions / box) * box
    radii_mode = bool(params.radii)
    if radii_mode and group_of is None:
        raise ValueError("params.radii set: make_plan needs group_of")

    # ---- real-space Chebyshev coefficients (host, cached per params)
    cheb, self_c = _host_cheb(params)
    cheb_radii = gsinc = None
    if radii_mode:
        group_of = jnp.asarray(group_of, jnp.int32)
        cr, selfs = _host_cheb_radii(params)
        cheb_radii = jnp.asarray(cr, dtype)
        # per-particle self coefficient (broadcasts in _near_assemble)
        self_c = jnp.asarray(selfs, dtype)[group_of][:, None]
        gsinc = _group_sinc(params, dtype)

    # ---- cell list (fixed-capacity padded layout, sorted by cell id)
    dims = tuple(max(int(L // params.r_cut), 1) for L in params.box)
    if min(dims) < 4:
        raise ValueError(
            f"box {params.box} too small for r_cut {params.r_cut}: "
            "need >= 4 cells per periodic dim (use the direct pairwise "
            "engine at this size)")
    nx, ny, nz = dims
    cap = params.cell_capacity
    if cap <= 0:
        # auto: mean occupancy + 4 sigma (Poisson), lane-rounded. n and
        # the cell dims are static, so this stays jit-compatible. At
        # bench density (mean 20, max observed 38) this picks 40, a
        # measured 1.4x near-field speedup over the old fixed 48.
        # Clumped configurations (whole bodies per cell) can exceed it:
        # overflow is counted in n_dropped_cells — callers that care
        # (bench.py) grow the capacity until the count is zero.
        mean_occ = pos.shape[0] / (nx * ny * nz)
        cap = int(min(max(
            -(-(mean_occ + 4.0 * math.sqrt(mean_occ)) // 8) * 8, 16), 128))
    cap = int(cap)
    # store the resolved capacity: downstream consumers (real_matvec_*,
    # matvec_sharded) read plan.params.cell_capacity
    params = dataclasses.replace(params, cell_capacity=cap)
    n = pos.shape[0]
    n_cells = nx * ny * nz
    cell_table, cell_slot, cid, n_dropped_cells = cells.cell_bin(
        pos, box, dims, cap)
    nbr_cells = cells.neighbor_table(dims)

    # ---- Pallas near-field: pre-gathered (cell, 27*cap) source layout
    # (mixed-radii mode runs the channel-generic XLA cell sweep: the
    # fused Pallas kernel assumes one radius's two-piece series)
    src_pos = src_ids = tgt_xyz = None
    if not radii_mode and _resolve_near_impl(params) == "pallas":
        TC = params.near_tile
        S = cells.lane_pad_sources(cap)
        n_cells_pad = -(-n_cells // TC) * TC
        wrap = cells.wrap_counts(dims)
        src_ids = cells.padded_source_ids(cell_table, nbr_cells, n, dims,
                                          cap, n_cells_pad, S)
        src_pos = cells.gather_src_pos(pos, src_ids, wrap, box, dims, cap,
                                       n_cells_pad, S)
        tgt_xyz = cells.gather_tgt_xyz(pos, cell_table, cap, n_cells_pad,
                                       n_cells)

    # ---- (plane, z-block) segment layout for the z-slab gridding
    grid_tbl, inv_idx, n_dropped = make_grid_layout(
        params, pos, params.bucket_capacity)

    # ---- k-space kernel (assembled on device; only 1-D host inputs)
    kern, khat = _device_kernel(params, dtype, include_sinc=not radii_mode)

    return SpectralPlan(
        positions=pos,
        sort_pos=pos,
        cheb=jnp.asarray(cheb, dtype),
        self_coeff=jnp.asarray(self_c, dtype),
        cell_table=cell_table, cell_slot=cell_slot,
        nbr_cells=nbr_cells, n_dropped_cells=n_dropped_cells,
        cell_dims=dims,
        grid_tbl=grid_tbl, inv_idx=inv_idx, n_dropped=n_dropped,
        src_pos=src_pos, src_ids=src_ids, tgt_xyz=tgt_xyz,
        kernel=kern, khat=khat,
        group_of=group_of, gsinc=gsinc, cheb_radii=cheb_radii,
        params=params)


# pre-gather helpers shared with the linked-cell force sweep
_gather_src_pos = cells.gather_src_pos
_gather_tgt_xyz = cells.gather_tgt_xyz


def update_plan(plan: SpectralPlan, positions) -> SpectralPlan:
    """Refresh a plan for a slightly-moved same-topology configuration
    WITHOUT re-sorting: keeps the cell membership, the gridding segment
    assignment and the near-field slot layout, re-gathering only the
    position data (the argsorts and the (cell, 27*cap) source pre-gather
    dominate make_plan's cost).

    Exactness contract: the near-field pair sweep stays EXACT while no
    particle drifts (min-image, per axis) more than half the cell slack
    (cell_side - r_cut)/2 — every pair inside r_cut at the new positions
    is then still covered by the old 27-cell stencil, and distances are
    always evaluated from the NEW positions. The wave-side gridding keeps
    its tol-level accuracy while the drift stays under half a grid
    spacing (a stale plane/slab assignment truncates only the ~tol window
    tail). Outside that budget the function falls back to a FULL rebuild
    via lax.cond, so callers may use it unconditionally for in-step
    companion configurations — the RFD displacement and the trapezoidal
    predictor (quaternion_integrator_multi_bodies.py:993-1036)."""
    p = plan.params
    dtype = plan.positions.dtype
    box = jnp.asarray(p.box, dtype)
    pos_w = positions - jnp.floor(positions / box) * box
    # drift is measured against the positions the SORT was built at
    # (plan.sort_pos, carried unchanged through refreshes), so repeated
    # per-step refreshes cannot accumulate past the exactness budget:
    # once CUMULATIVE drift exceeds it, the full rebuild fires
    delta = pos_w - plan.sort_pos
    delta = delta - jnp.round(delta / box) * box       # min-image drift
    pos_eff = plan.sort_pos + delta

    dims = plan.cell_dims
    side = np.asarray(p.box, np.float64) / np.asarray(dims)
    budget = 0.5 * np.minimum(side - p.r_cut,
                              np.asarray(p.spacing, np.float64))
    ok = jnp.all(jnp.max(jnp.abs(delta), axis=0)
                 <= jnp.asarray(np.maximum(budget, 0.0), dtype))

    def refresh(_):
        new = {"positions": pos_eff}
        if plan.src_pos is not None:
            nx, ny, nz = dims
            n_cells = nx * ny * nz
            cap = p.cell_capacity
            wrap = cells.wrap_counts(dims)
            C_pad, S = plan.src_ids.shape
            new["src_pos"] = _gather_src_pos(
                pos_eff, plan.src_ids, wrap, box, dims, cap, C_pad, S)
            new["tgt_xyz"] = _gather_tgt_xyz(
                pos_eff, plan.cell_table, cap, C_pad, n_cells)
        return dataclasses.replace(plan, **new)

    def rebuild(_):
        # same params (capacities already resolved) -> identical shapes
        return make_plan(p, positions, group_of=plan.group_of)

    return lax.cond(ok, refresh, rebuild, None)


# ---------------------------------------------------------------------------
# Wave-space product
# ---------------------------------------------------------------------------


def _es_window_jnp(d, r_win, beta):
    """ES window on wrapped offsets; 0 outside |d| <= r_win (NaN-safe:
    padded particles carry NaN positions and map to weight 0)."""
    t = jnp.clip(d / r_win, -1.0, 1.0)
    w = jnp.exp(beta * (jnp.sqrt(jnp.maximum(1.0 - t * t, 0.0)) - 1.0))
    return jnp.where(jnp.abs(d) <= r_win, w, 0.0)


def _slab_candidates(plan: SpectralPlan, f):
    """Per-plane segment machinery shared by spread/interp.

    Candidates of yz-plane `a` are its nzb (z-block) segments, each of
    cap_seg rows. Windows: wx scalar, Y dense over gy, Z COMPACT over the
    2*ZB-wide slab of the row's own z-block (the z-slab trick: z-dense
    window evaluation was the dominant gridding cost). NaN-padded
    positions map to weight 0."""
    p = plan.params
    gx, gy, gz = p.grid
    P = p.support
    ZB = p.zslab
    SW = 2 * ZB
    nzb = gz // ZB
    cap = plan.cap_seg
    hx, hy, hz = p.spacing
    beta = p.es_beta
    dtype = plan.positions.dtype
    pos_pad = jnp.concatenate(
        [plan.positions, jnp.full((1, 3), jnp.nan, dtype)], axis=0)
    f_pad = None
    if f is not None:
        f_pad = jnp.concatenate(
            [f, jnp.zeros((1, f.shape[1]), f.dtype)], axis=0)
    yg = jnp.arange(gy, dtype=dtype) * hy
    # slab col c of block t sits at z = (t ZB + c - ZB/2) h
    zoff = ((jnp.arange(nzb, dtype=dtype)[:, None] * ZB
             + jnp.arange(SW, dtype=dtype)[None, :] - ZB // 2) * hz)
    Ly, Lz = p.box[1], p.box[2]
    tbl2 = plan.grid_tbl.reshape(gx, nzb * cap)

    def gather(a):
        """Segments (nzb, cap) of plane a and their windows."""
        cand = lax.dynamic_index_in_dim(tbl2, a, 0, keepdims=False
                                        ).reshape(nzb, cap)
        pp = pos_pad[cand]                               # (nzb, cap, 3)
        dx = a.astype(dtype) * hx - pp[..., 0]
        dx = dx - p.box[0] * jnp.round(dx / p.box[0])
        wx = _es_window_jnp(dx, 0.5 * P * hx, beta)      # (nzb, cap)
        dy = yg[None, None, :] - pp[..., 1][..., None]
        dy = dy - Ly * jnp.round(dy / Ly)
        Y = _es_window_jnp(dy, 0.5 * P * hy, beta)       # (nzb, cap, gy)
        dz = zoff[:, None, :] - pp[..., 2][..., None]    # (nzb, cap, SW)
        dz = dz - Lz * jnp.round(dz / Lz)
        Z = _es_window_jnp(dz, 0.5 * P * hz, beta)       # (nzb, cap, SW)
        return cand, wx, Y, Z

    return gather, f_pad


def _slabs_to_plane(S, ZB):
    """(nzb, gy, SW, 3) per-block slabs -> (gy, gz, 3) plane. Even/odd
    blocks each tile the axis exactly (SW = 2 ZB), so assembly is two
    reshapes + two rolls; consecutive slabs overlap by ZB and the rolls
    realize the overlapping periodic adds."""
    nzb, gy, SW, C = S.shape
    Se = jnp.moveaxis(S[0::2], 0, 1).reshape(gy, (nzb // 2) * SW, C)
    So = jnp.moveaxis(S[1::2], 0, 1).reshape(gy, (nzb // 2) * SW, C)
    return (jnp.roll(Se, -(ZB // 2), axis=1)
            + jnp.roll(So, ZB - ZB // 2, axis=1))


def _plane_to_slabs(ga, ZB, nzb):
    """Adjoint of _slabs_to_plane: (gy, gz, C) -> (nzb, gy, SW, C)."""
    gy, _, C = ga.shape
    SW = 2 * ZB
    E = jnp.roll(ga, ZB // 2, axis=1).reshape(gy, nzb // 2, SW, C)
    O = jnp.roll(ga, -(ZB - ZB // 2), axis=1).reshape(gy, nzb // 2, SW, C)
    S = jnp.stack([E, O], axis=2).reshape(gy, nzb, SW, C)
    return jnp.moveaxis(S, 0, 1)                         # (nzb, gy, SW, 3)


def spread(plan: SpectralPlan, forces):
    """S f: (N, C) forces -> (C, gx, gy, gz) grid (C = 3 per RHS; multi-RHS
    stacks share the window evaluation, which dominates). Per yz-plane: one
    batched (over z-blocks) matmul of the dense-y window rows against the
    COMPACT z-slab window-force blocks, then slab assembly by two rolls
    (no scatter anywhere)."""
    gx = plan.params.grid[0]
    planes = _spread_planes(plan, forces,
                            jnp.arange(gx, dtype=jnp.int32))
    return jnp.moveaxis(planes, -1, 0)                   # (C, gx, gy, gz)


def _spread_planes(plan: SpectralPlan, forces, plane_ids):
    """Local spread: (len(plane_ids), gy, gz, C) planes (sharded wave)."""
    p = plan.params
    gx, gy, gz = p.grid
    ZB = p.zslab
    SW = 2 * ZB
    nzb = gz // ZB
    n = plan.positions.shape[0]
    f = forces.reshape(n, -1)
    C = f.shape[1]
    gather, f_pad = _slab_candidates(plan, f)
    prec = getattr(lax.Precision, p.precision.upper())

    def one_plane(a):
        cand, wx, Y, Z = gather(a)
        W = wx[..., None] * Y
        Zf = Z[..., None] * f_pad[cand][:, :, None, :]
        S = jnp.einsum("nrb,nrc->nbc", W, Zf.reshape(nzb, -1, SW * C),
                       precision=prec)
        return _slabs_to_plane(S.reshape(nzb, gy, SW, C), ZB)

    return lax.map(one_plane, plane_ids,
                   batch_size=min(p.plane_batch, plane_ids.shape[0]))


def _interp_rows(plan: SpectralPlan, ug_planes, plane_ids):
    """Local interpolation rows (len(plane_ids), nzb, cap, C) from local
    (len, gy, gz, C) planes (sharded wave; the inverse-index gather over
    the all-gathered rows happens in the caller)."""
    p = plan.params
    gx, gy, gz = p.grid
    ZB = p.zslab
    SW = 2 * ZB
    nzb = gz // ZB
    cap = plan.cap_seg
    C = ug_planes.shape[-1]
    gather, _ = _slab_candidates(plan, None)
    prec = getattr(lax.Precision, p.precision.upper())

    def one_plane(args):
        a, ga = args
        cand, wx, Y, Z = gather(a)
        S = _plane_to_slabs(ga, ZB, nzb)
        W = wx[..., None] * Y
        T = jnp.einsum("nrb,nbc->nrc", W, S.reshape(nzb, gy, SW * C),
                       precision=prec)
        u = jnp.einsum("nrc,nrcq->nrq", Z, T.reshape(nzb, cap, SW, C),
                       precision=prec)
        return u

    return lax.map(one_plane, (plane_ids, ug_planes),
                   batch_size=min(p.plane_batch, plane_ids.shape[0]))


def interpolate(plan: SpectralPlan, ug):
    """S^T u: (C, gx, gy, gz) grid -> (N, C), the exact transpose of
    `spread` (slab extraction, batched matmul, compact-z contraction,
    collision-free inverse-index gather)."""
    gx = plan.params.grid[0]
    C = ug.shape[0]
    # one contiguous transpose up front: per-plane strided slices of the
    # component-leading layout are slow on TPU
    ugq = jnp.moveaxis(ug, 0, -1)                        # (gx, gy, gz, C)
    out = _interp_rows(plan, ugq, jnp.arange(gx, dtype=jnp.int32))
    out = out.reshape(-1, C)
    out = jnp.concatenate([out, jnp.zeros((1, C), out.dtype)], axis=0)
    return jnp.sum(out[plan.inv_idx], axis=1)            # (N, C)


def k_scale(plan: SpectralPlan, gk):
    """Project out khat and apply the scalar kernel on the rfft
    half-spectrum (the projector I - khat khat^T and the kernel are even
    in k, so they act identically on the half spectrum). gk may carry
    C = 3 B channels (B stacked RHS, b-major)."""
    shape = gk.shape
    g = gk.reshape(-1, 3, *shape[1:])
    kdotg = jnp.sum(plan.khat[None] * g, axis=1, keepdims=True)
    out = plan.kernel[None, None] * (g - plan.khat[None] * kdotg)
    return out.reshape(shape)


def _wave_matvec_radii(plan: SpectralPlan, forces):
    """Mixed-radii wave product: per-GROUP sinc(k a_g) shape factors.

    Sources expand into G group-channel blocks (each particle's force in
    its group's triplet — spread/interpolate window products are shared
    across channels), the k-space sum folds the source-side factors,
    the target-side factors broadcast the solution back to G blocks, and
    each particle reads its own group's interpolated triplet. Exact
    polydisperse RPY: M_w = D^T C D with D = sum_g sinc_g F S_g, C the
    base PSD convolution — SPD by congruence for ANY radii mix."""
    p = plan.params
    G = len(p.radii)
    n = plan.positions.shape[0]
    f = forces.reshape(n, -1)
    C = f.shape[1]
    onehot = jax.nn.one_hot(plan.group_of, G, dtype=f.dtype)   # (n, G)
    fe = (onehot[:, :, None] * f[:, None, :]).reshape(n, G * C)
    grid = spread(plan, fe)                        # (G*C, gx, gy, gz)
    gk = jnp.fft.rfftn(grid, axes=(1, 2, 3))
    gk = gk.reshape(G, C, *gk.shape[1:])
    gsum = jnp.sum(plan.gsinc[:, None] * gk, axis=0)         # (C, ...)
    uk = k_scale(plan, gsum)                       # base kernel, no sinc
    uk_g = (plan.gsinc[:, None] * uk[None]).reshape(G * C, *uk.shape[1:])
    ug = jnp.fft.irfftn(uk_g, s=p.grid, axes=(1, 2, 3))
    out = interpolate(plan, ug).reshape(n, G, C)
    return jnp.sum(onehot[:, :, None] * out, axis=1)          # (n, C)


def wave_matvec(plan: SpectralPlan, forces):
    """u^w = S^T F^{-1} B F S f (spread, rFFT, scale, irFFT, interpolate).
    forces (N, C) with C = 3 B (B stacked RHS sharing window products)."""
    if plan.gsinc is not None:
        return _wave_matvec_radii(plan, forces)
    grid = spread(plan, forces)                          # (C, gx, gy, gz)
    gx, gy, gz = plan.params.grid
    C = grid.shape[0]

    def spectral(g3):
        gk = jnp.fft.rfftn(g3, axes=(1, 2, 3))
        uk = k_scale(plan, gk)
        return jnp.fft.irfftn(uk, s=plan.params.grid, axes=(1, 2, 3))

    if C > 3 and gx * gy * gz > (1 << 24):
        # multi-RHS on a HUGE grid (beyond 256^3): run the spectral
        # stage one 3-channel chunk at a time — lax.map serializes, so
        # only one chunk's complex FFT transients (~vol x 16 B each) are
        # ever live. At 256^3 and below the transients fit comfortably
        # and chunking only costs overlap (measured +13% at 98k blobs),
        # so it stays off there.
        ug = lax.map(spectral,
                     grid.reshape(-1, 3, gx, gy, gz)).reshape(grid.shape)
    else:
        ug = spectral(grid)
    return interpolate(plan, ug)


def wave_sqrt_noise(plan: SpectralPlan, key):
    """Sample u with Cov(u) = M_wave EXACTLY, in closed form (no Lanczos).

    The wave part is M_w = S^T C S with C = F^{-1} K F a real-symmetric
    PSD convolution (K = kern * (I - khat khat^T), kern >= 0, both even
    in k). C^{1/2} = F^{-1} K^{1/2} F is available pointwise in k-space
    (sqrt of the scalar kernel; the projector is idempotent), so

        u = S^T F^{-1} K^{1/2} F w,   w ~ N(0, I) real grid white noise,

    has covariance S^T C^{1/2} C^{1/2,T} S = S^T C S = M_w. This is the
    positively-split Ewald (PSE) idea of Fiore/Balboa/Donev/Swan (2017),
    the reason the Hasimoto split here keeps BOTH parts SPD: iterative
    sqrt machinery is only ever needed for the cheap, well-conditioned
    near field (see integrators._noise_slip). Cost: one grid-noise fill,
    one rFFT pair, one interpolation — about half a wave_matvec."""
    p = plan.params
    dtype = plan.positions.dtype
    w = jax.random.normal(key, (3,) + tuple(p.grid), dtype=dtype)
    gk = jnp.fft.rfftn(w, axes=(1, 2, 3))
    kdotg = jnp.sum(plan.khat * gk, axis=0, keepdims=True)
    uk = jnp.sqrt(plan.kernel)[None] * (gk - plan.khat * kdotg)
    if plan.gsinc is not None:
        # mixed radii: target-side group factors; each particle reads its
        # group's triplet. Cov(u) = D^T C^{1/2} C^{1/2} D = M_w exactly
        # (same D as _wave_matvec_radii).
        G = len(p.radii)
        uk_g = (plan.gsinc[:, None] * uk[None]).reshape(
            G * 3, *uk.shape[1:])
        ug = jnp.fft.irfftn(uk_g, s=p.grid, axes=(1, 2, 3))
        out = interpolate(plan, ug).reshape(-1, G, 3)
        onehot = jax.nn.one_hot(plan.group_of, G, dtype=dtype)
        return jnp.sum(onehot[:, :, None] * out, axis=1)
    ug = jnp.fft.irfftn(uk, s=p.grid, axes=(1, 2, 3))
    return interpolate(plan, ug)


# ---------------------------------------------------------------------------
# Real-space product
# ---------------------------------------------------------------------------


def _clenshaw(coeffs, t):
    """Chebyshev series evaluation; coeffs (K,), t any shape."""
    b1 = jnp.zeros_like(t)
    b2 = jnp.zeros_like(t)
    for c in coeffs[:0:-1]:
        b1, b2 = 2.0 * t * b1 - b2 + c, b1
    return t * b1 - b2 + coeffs[0]


def _xla_near_tile_fn(plan: SpectralPlan, forces):
    """Cell-tile sweep closure for the XLA near field; returns
    (tile_fn, n_pad_c, TC). tile_fn(c0) -> (TC, cap, 3) slot rows for
    cells [c0, c0+TC) (dynamic_slice clamps out-of-range starts, which
    sharded callers place beyond the read range)."""
    p = plan.params
    pos = plan.positions
    n = pos.shape[0]
    dtype = pos.dtype
    f = forces.reshape(n, -1)
    nc = f.shape[1]
    box = jnp.asarray(p.box, dtype)
    cap = p.cell_capacity
    n_cells = plan.nbr_cells.shape[0]

    pos_pad = jnp.concatenate([pos, jnp.full((1, 3), jnp.nan, dtype)],
                              axis=0)
    f_pad = jnp.concatenate([f, jnp.zeros((1, nc), dtype)], axis=0)
    ids = plan.cell_table.reshape(n_cells, cap)            # (C, cap)
    pos_c = pos_pad[ids]                                   # (C, cap, 3)
    f_c = f_pad[ids]

    radii_mode = plan.cheb_radii is not None
    if radii_mode:
        g_pad = jnp.concatenate(
            [plan.group_of, jnp.zeros((1,), jnp.int32)], axis=0)
        g_c = g_pad[ids]                                   # (C, cap)

    TC = min(p.cell_tile, n_cells)
    n_pad_c = -(-n_cells // TC) * TC
    pad_c = n_pad_c - n_cells
    if pad_c:
        pos_c = jnp.concatenate(
            [pos_c, jnp.full((pad_c, cap, 3), jnp.nan, dtype)], axis=0)
        f_c = jnp.concatenate(
            [f_c, jnp.zeros((pad_c, cap, nc), dtype)], axis=0)
        if radii_mode:
            g_c = jnp.concatenate(
                [g_c, jnp.zeros((pad_c, cap), jnp.int32)], axis=0)
    ids_pad = (jnp.concatenate([ids, jnp.full((pad_c, cap), n, jnp.int32)])
               if pad_c else ids)
    nbr_pad = (jnp.concatenate(
        [plan.nbr_cells, jnp.zeros((pad_c, 27), jnp.int32)])
        if pad_c else plan.nbr_cells)

    # Chebyshev pieces: [0, 2a] and [2a, r_cut]
    two_a = 2.0 * p.a
    mids = jnp.asarray([0.5 * two_a, 0.5 * (two_a + p.r_cut)], dtype)
    halfs = jnp.asarray([0.5 * two_a, 0.5 * (p.r_cut - two_a)], dtype)

    def _scalars_radii(r, gt, gs):
        """Per-pair (alpha, beta): group-pair tables selected by mask,
        three pieces each (edges from _radii_pair_edges)."""
        al = jnp.zeros_like(r)
        be = jnp.zeros_like(r)
        G = len(p.radii)
        gtb = gt[:, :, None, None]
        gsb = gs[:, None, :, :]
        for g in range(G):
            for h in range(g, G):
                mask = (gtb == g) & (gsb == h)
                if h != g:
                    mask = mask | ((gtb == h) & (gsb == g))
                edges = _radii_pair_edges(p, g, h)
                vals = []
                for i in range(3):
                    lo, hi = edges[i], edges[i + 1]
                    t = jnp.clip((2.0 * r - (hi + lo)) / (hi - lo),
                                 -1.0, 1.0)
                    vals.append((_clenshaw(plan.cheb_radii[g, h, i, 0], t),
                                 _clenshaw(plan.cheb_radii[g, h, i, 1], t)))
                in1 = r < edges[1]
                in2 = r < edges[2]
                al_q = jnp.where(in1, vals[0][0],
                                 jnp.where(in2, vals[1][0], vals[2][0]))
                be_q = jnp.where(in1, vals[0][1],
                                 jnp.where(in2, vals[1][1], vals[2][1]))
                al = al + jnp.where(mask, al_q, 0.0)
                be = be + jnp.where(mask, be_q, 0.0)
        return al, be

    def tile_fn(c0):
        rp = lax.dynamic_slice_in_dim(pos_c, c0, TC, 0)    # (TC, cap, 3)
        rid = lax.dynamic_slice_in_dim(ids_pad, c0, TC, 0)  # (TC, cap)
        nb = lax.dynamic_slice_in_dim(nbr_pad, c0, TC, 0)  # (TC, 27)
        ps = pos_c[nb]                                     # (TC, 27, cap, 3)
        fs = f_c[nb]
        sid = ids_pad[nb]                                  # (TC, 27, cap)
        d = rp[:, :, None, None, :] - ps[:, None, :, :, :]
        d = d - jnp.round(d / box) * box                   # min image
        r2 = jnp.sum(d * d, axis=-1)                       # (TC,cap,27,cap)
        r = jnp.sqrt(r2)
        # r2 > 0 matches the Pallas kernel: exactly-coincident DISTINCT
        # blobs (a degenerate, measure-zero configuration) contribute
        # only through the wave part on every backend, instead of
        # diverging between near_impl choices
        inside = ((r < p.r_cut) & (r2 > 0)
                  & (rid[:, :, None, None] != sid[:, None, :, :]))
        d = jnp.where(inside[..., None], d, 0.0)
        if radii_mode:
            gt = lax.dynamic_slice_in_dim(g_c, c0, TC, 0)  # (TC, cap)
            gs = g_c[nb]                                   # (TC, 27, cap)
            al, be = _scalars_radii(r, gt, gs)
        else:
            near = r < two_a
            # evaluate both pieces' series at their own t, select
            t0 = jnp.clip((r - mids[0]) / halfs[0], -1.0, 1.0)
            t1 = jnp.clip((r - mids[1]) / halfs[1], -1.0, 1.0)
            al = jnp.where(near, _clenshaw(plan.cheb[0, 0], t0),
                           _clenshaw(plan.cheb[1, 0], t1))
            be = jnp.where(near, _clenshaw(plan.cheb[0, 1], t0),
                           _clenshaw(plan.cheb[1, 1], t1))
        al = jnp.where(inside, al, 0.0)
        bfac = jnp.where(inside, be / jnp.where(inside, r2, 1.0), 0.0)
        # per-RHS contraction: fs carries nc = 3 B channels (b-major)
        fs3 = fs.reshape(*fs.shape[:-1], nc // 3, 3)       # (TC,27,cap,B,3)
        ddotf = jnp.sum(d[..., None, :] * fs3[:, None], axis=-1)
        contrib = (al[..., None, None] * fs3[:, None]
                   + (bfac[..., None] * ddotf)[..., None] * d[..., None, :])
        out = jnp.sum(contrib, axis=(2, 3))                # (TC, cap, B, 3)
        return out.reshape(TC, cap, nc)

    return tile_fn, n_pad_c, TC


def _near_assemble(plan: SpectralPlan, rows, forces):
    """Slot rows (>= n_cells*cap, C) -> per-particle output + self term."""
    n = plan.positions.shape[0]
    dtype = forces.dtype
    f = forces.reshape(n, -1)
    rows = jnp.concatenate(
        [rows, jnp.zeros((1, rows.shape[1]), rows.dtype)], axis=0)
    return (rows[plan.cell_slot].astype(dtype)
            + plan.self_coeff * f.astype(dtype))


def real_matvec_xla(plan: SpectralPlan, forces):
    """Near-field remainder sum + self term, as a cell-blocked DENSE
    sweep: particles live in a padded (n_cells, cap) layout, every cell
    tile processes its 27 neighbor cells with pure tensor ops (per-pair
    gathers are the TPU killer — measured 5.5 s at 98k blobs for the
    gather-based variant vs ~10 ms dense), and the radial scalars come
    from a Clenshaw recurrence instead of table gathers."""
    cap = plan.params.cell_capacity
    n_cells = plan.nbr_cells.shape[0]
    n = plan.positions.shape[0]
    nc = forces.reshape(n, -1).shape[1]
    tile_fn, n_pad_c, TC = _xla_near_tile_fn(plan, forces)
    out_c = lax.map(tile_fn, jnp.arange(0, n_pad_c, TC))
    rows = out_c.reshape(n_pad_c * cap, nc)[:n_cells * cap]
    return _near_assemble(plan, rows, forces)


def _near_kernel(tgt_ref, spos_ref, sf_ref, out_ref, *, cap, tc, cheb,
                 mids, halfs, two_a, rc2, n_rhs=1):
    """Fused near-field sweep: block = `tc` cells; for each cell, the
    (cap targets) x (S sources) pair tile is evaluated on the VPU with
    targets on sublanes and sources on lanes. Radial scalars come from
    ONE Clenshaw recurrence per function with per-pair piece-selected
    coefficients (both pieces' t is in [-1,1] after selection, so there
    is no out-of-range polynomial blowup). All coefficients are
    compile-time python-float constants (weak-typed). The cell loop is a
    fori_loop (not a python unroll): the kernel body is traced once, which
    keeps Mosaic compile time independent of the tile size.

    n_rhs > 1 applies the pair block to several stacked force sets in one
    sweep (sf carries 3*n_rhs channels, b-major): the Clenshaw recurrence
    — the dominant per-pair cost — is shared across all RHS."""
    K = len(cheb[0][0])
    inv_h0, inv_h1 = 1.0 / halfs[0], 1.0 / halfs[1]

    def body(t, carry):
        # explicit i32: under jax_enable_x64 the loop index and the python
        # constant otherwise lower as mixed i32/i64 (Mosaic verify error)
        r0 = t.astype(jnp.int32) * jnp.int32(cap)
        tx = tgt_ref[pl.ds(r0, cap), 0:1]
        ty = tgt_ref[pl.ds(r0, cap), 1:2]
        tz = tgt_ref[pl.ds(r0, cap), 2:3]
        sx = spos_ref[0, t, :][None, :]
        sy = spos_ref[1, t, :][None, :]
        sz = spos_ref[2, t, :][None, :]
        dx = tx - sx
        dy = ty - sy
        dz = tz - sz
        r2 = dx * dx + dy * dy + dz * dz
        inside = (r2 < rc2) & (r2 > 0.0)
        r2s = jnp.where(inside, r2, 1.0)   # also scrubs NaN pad rows
        invr = lax.rsqrt(r2s)
        r = r2s * invr
        near = r < two_a
        ts = jnp.where(near, (r - mids[0]) * inv_h0, (r - mids[1]) * inv_h1)
        t2 = ts + ts
        a1 = jnp.zeros_like(r)
        a2 = jnp.zeros_like(r)
        b1 = jnp.zeros_like(r)
        b2 = jnp.zeros_like(r)
        for k in range(K - 1, 0, -1):
            ca = jnp.where(near, cheb[0][0][k], cheb[1][0][k])
            cb = jnp.where(near, cheb[0][1][k], cheb[1][1][k])
            a1, a2 = t2 * a1 - a2 + ca, a1
            b1, b2 = t2 * b1 - b2 + cb, b1
        al = ts * a1 - a2 + jnp.where(near, cheb[0][0][0], cheb[1][0][0])
        be = ts * b1 - b2 + jnp.where(near, cheb[0][1][0], cheb[1][1][0])
        al = jnp.where(inside, al, 0.0)
        bfac = jnp.where(inside, be * invr * invr, 0.0)
        dx = jnp.where(inside, dx, 0.0)
        dy = jnp.where(inside, dy, 0.0)
        dz = jnp.where(inside, dz, 0.0)
        for b in range(n_rhs):
            fx = sf_ref[3 * b + 0, t, :][None, :]
            fy = sf_ref[3 * b + 1, t, :][None, :]
            fz = sf_ref[3 * b + 2, t, :][None, :]
            g = bfac * (dx * fx + dy * fy + dz * fz)
            out_ref[pl.ds(r0, cap), 3 * b + 0:3 * b + 1] = jnp.sum(
                al * fx + g * dx, axis=1, keepdims=True)
            out_ref[pl.ds(r0, cap), 3 * b + 1:3 * b + 2] = jnp.sum(
                al * fy + g * dy, axis=1, keepdims=True)
            out_ref[pl.ds(r0, cap), 3 * b + 2:3 * b + 3] = jnp.sum(
                al * fz + g * dz, axis=1, keepdims=True)
        return carry

    lax.fori_loop(0, tc, body, 0)


def _near_rows_pallas(plan: SpectralPlan, forces, tgt_xyz, src_pos,
                      src_ids):
    """Pallas near-field slot rows for the given (possibly device-local
    slices of the) plan layouts; (C_local * cap, 3) f32."""
    p = plan.params
    cap = p.cell_capacity
    TC = p.near_tile
    C_local, S = src_ids.shape
    n = plan.positions.shape[0]
    f = forces.reshape(n, -1).astype(jnp.float32)
    nc = f.shape[1]
    f_pad = jnp.concatenate([f, jnp.zeros((1, nc), jnp.float32)], axis=0)
    sf = f_pad.T[:, src_ids]                             # (nc, C_local, S)

    cheb_np, _ = _host_cheb(p)
    # python-float coefficients: weak-typed in-kernel constants (numpy
    # f64 scalars would promote the whole pair block to f64 under x64)
    cheb = tuple(tuple(tuple(float(v) for v in fn) for fn in piece)
                 for piece in cheb_np)
    two_a = 2.0 * p.a
    mids = (0.5 * two_a, 0.5 * (two_a + p.r_cut))
    halfs = (0.5 * two_a, 0.5 * (p.r_cut - two_a))
    kernel = functools.partial(
        _near_kernel, cap=cap, tc=TC, cheb=cheb, mids=mids, halfs=halfs,
        two_a=two_a, rc2=p.r_cut * p.r_cut, n_rhs=nc // 3)
    return pl.pallas_call(
        kernel,
        grid=(C_local // TC,),
        in_specs=[
            pl.BlockSpec((TC * cap, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, TC, S), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nc, TC, S), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TC * cap, nc), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((C_local * cap, nc), jnp.float32),
        interpret=jax.default_backend() not in ("tpu", "axon"),
    )(tgt_xyz.astype(jnp.float32), src_pos.astype(jnp.float32), sf)


def real_matvec_pallas(plan: SpectralPlan, forces):
    """Near-field sweep on the plan-time pre-gathered source layout (see
    make_plan): no per-pair gathers, no min-image math (cell-level wrap
    shifts are folded into the stored source positions), full 128-lane
    utilization with S = pad128(27 * cap) sources per cell."""
    rows = _near_rows_pallas(plan, forces, plan.tgt_xyz, plan.src_pos,
                             plan.src_ids)
    return _near_assemble(plan, rows, forces)


def real_matvec(plan: SpectralPlan, forces):
    """Near-field remainder + self term; dispatches to the Pallas kernel
    on TPU (params.near_impl) or the XLA cell sweep elsewhere."""
    if plan.src_pos is not None:
        return real_matvec_pallas(plan, forces)
    return real_matvec_xla(plan, forces)


def matvec(plan: SpectralPlan, forces, mesh=None, axis_name="blobs"):
    """Full periodic RPY product M f, (N,3) -> (N,3). With a `mesh`, the
    near-field cell blocks and the gridding planes are divided across
    devices and the 3D FFT is distributed (see matvec_sharded)."""
    if mesh is not None and mesh.shape[axis_name] > 1:
        return matvec_sharded(mesh, plan, forces, axis_name=axis_name)
    return real_matvec(plan, forces) + wave_matvec(plan, forces)


def matvec_multi(plan: SpectralPlan, forces, mesh=None, axis_name="blobs"):
    """Stacked products M f_b, (B, N, 3) -> (B, N, 3), in ONE engine
    sweep: the gridding window products and the near-field Chebyshev pair
    scalars — the dominant costs — are shared across the B right-hand
    sides; only the FFT volume and the final contractions scale with B.
    Used by the lockstep multi-RHS GMRES (ops/gmres.gmres_lockstep) to
    solve same-configuration systems for the price of little more than
    one (the reference solves them back to back,
    quaternion_integrator_multi_bodies.py:966-1007)."""
    B, n = forces.shape[0], forces.shape[1]
    if B == 1:
        return matvec(plan, forces[0], mesh=mesh, axis_name=axis_name)[None]
    f = jnp.moveaxis(forces, 0, 1).reshape(n, 3 * B)     # b-major channels
    if mesh is not None and mesh.shape[axis_name] > 1:
        # distributed sweep shares gridding/near work across the B
        # channels exactly like the single-chip path
        out = matvec_sharded(mesh, plan, f, axis_name=axis_name)
    else:
        out = real_matvec(plan, f) + wave_matvec(plan, f)
    return jnp.moveaxis(out.reshape(n, B, 3), 1, 0)


def matvec_sharded(mesh, plan: SpectralPlan, forces, axis_name="blobs"):
    """Multi-chip periodic RPY product over an ICI mesh.

    Decomposition (inputs and outputs replicated, O(N) each):
      - near field: cell blocks divided across devices; each device runs
        the local Pallas/XLA sweep over its cells, slot rows are
        all-gathered (O(C cap), ~MB) and assembled locally.
      - wave field: yz-planes divided across devices; spread and
        interpolation are local per-plane work, and the 3D FFT is
        distributed: local fft_y + rfft_z on the plane shard, all_to_all
        transpose x<->y, local fft_x, k-scaling on the (replicated)
        device k-tables sliced to the local gy shard, inverse transforms
        mirrored. Falls back to a replicated (still correct) wave part
        when gx or gy is not divisible by the mesh size.

    The reference has no distributed backend at all (SURVEY.md section
    2.4); this is the TPU-native scale-out of its O(N log N) analog."""
    from jax import shard_map
    from jax.sharding import PartitionSpec

    D = mesh.shape[axis_name]
    p = plan.params
    gx, gy, gz = p.grid
    ZB = p.zslab
    nzb = gz // ZB
    cap_seg = plan.cap_seg
    cap = p.cell_capacity
    TC = p.near_tile
    n_cells = plan.nbr_cells.shape[0]
    # mixed-radii plans shard the near field but keep the wave part
    # replicated (the distributed-FFT stage does not carry the
    # group-channel logic; shard_fn's fallback calls the radii-aware
    # wave_matvec directly)
    wave_sharded = (gx % D == 0) and (gy % D == 0) and plan.gsinc is None
    gxd = gx // D if wave_sharded else gx
    gyd = gy // D if wave_sharded else gy

    use_pallas = plan.src_pos is not None
    if use_pallas:
        # pad the pre-gathered layouts so every device gets an equal,
        # aligned block of cells (dynamic_slice clamping would misalign
        # the boundary shard)
        C_pad = plan.src_ids.shape[0]
        Cd = -(-C_pad // (TC * D)) * TC
        extra = Cd * D - C_pad
        tgt2 = jnp.pad(plan.tgt_xyz, ((0, extra * cap), (0, 0)),
                       constant_values=jnp.nan)
        src_pos2 = jnp.pad(plan.src_pos, ((0, 0), (0, extra), (0, 0)),
                           constant_values=jnp.nan)
        src_ids2 = jnp.pad(plan.src_ids, ((0, extra), (0, 0)),
                           constant_values=plan.positions.shape[0])
    else:
        # the XLA sweep tiles by cell_tile (not near_tile, which is the
        # Pallas grid step) — _xla_near_tile_fn's own convention
        TCX = min(p.cell_tile, n_cells)
        n_pad_c0 = -(-n_cells // TCX) * TCX
        tiles_per = -(-n_pad_c0 // (TCX * D))

    def shard_fn(pl_, f, tgt2_, src_pos2_, src_ids2_):
        d = lax.axis_index(axis_name)
        nc = f.shape[1]                              # 3 B channels, b-major
        # ---- near field, local cell block
        if use_pallas:
            t_loc = lax.dynamic_slice_in_dim(tgt2_, d * Cd * cap,
                                             Cd * cap, 0)
            sp_loc = lax.dynamic_slice_in_dim(src_pos2_, d * Cd, Cd, 1)
            si_loc = lax.dynamic_slice_in_dim(src_ids2_, d * Cd, Cd, 0)
            rows_local = _near_rows_pallas(pl_, f, t_loc, sp_loc, si_loc)
        else:
            tile_fn, _, _ = _xla_near_tile_fn(pl_, f)
            starts = (d * tiles_per + jnp.arange(tiles_per)) * TCX
            rows_local = lax.map(tile_fn, starts).reshape(-1, nc)
        rows = lax.all_gather(rows_local, axis_name, axis=0, tiled=True)
        un = _near_assemble(pl_, rows[:n_cells * cap], f)

        # ---- wave field
        if not wave_sharded:
            return un + wave_matvec(pl_, f)
        plane_ids = d * gxd + jnp.arange(gxd, dtype=jnp.int32)
        slab = _spread_planes(pl_, f, plane_ids)     # (gxd, gy, gz, C)
        g = jnp.moveaxis(slab, -1, 0)                # (C, gxd, gy, gz)
        gk = jnp.fft.rfft(g, axis=3)
        gk = jnp.fft.fft(gk, axis=2)                 # (C, gxd, gy, nz2)
        gk = lax.all_to_all(gk, axis_name, split_axis=2, concat_axis=1,
                            tiled=True)              # (C, gx, gyd, nz2)
        gk = jnp.fft.fft(gk, axis=1)
        kern = lax.dynamic_slice_in_dim(pl_.kernel, d * gyd, gyd, 1)
        khat = lax.dynamic_slice_in_dim(pl_.khat, d * gyd, gyd, 2)
        gb = gk.reshape(nc // 3, 3, *gk.shape[1:])   # (B, 3, gx, gyd, nz2)
        kdotg = jnp.sum(khat[None] * gb, axis=1, keepdims=True)
        uk = (kern[None, None] * (gb - khat[None] * kdotg)).reshape(gk.shape)
        uk = jnp.fft.ifft(uk, axis=1)
        uk = lax.all_to_all(uk, axis_name, split_axis=1, concat_axis=2,
                            tiled=True)              # (C, gxd, gy, nz2)
        uk = jnp.fft.ifft(uk, axis=2)
        ug = jnp.fft.irfft(uk, n=gz, axis=3)         # (C, gxd, gy, gz)
        ug_planes = jnp.moveaxis(ug, 0, -1)          # (gxd, gy, gz, C)
        wrows_local = _interp_rows(pl_, ug_planes, plane_ids)
        wrows = lax.all_gather(wrows_local.reshape(-1, nc), axis_name,
                               axis=0, tiled=True)   # (gx*nzb*cap_seg, C)
        wrows = jnp.concatenate(
            [wrows, jnp.zeros((1, nc), wrows.dtype)], axis=0)
        uw = jnp.sum(wrows[pl_.inv_idx], axis=1)
        return un + uw.astype(un.dtype)

    if not use_pallas:
        tgt2 = src_pos2 = src_ids2 = jnp.zeros((), jnp.float32)
    n = plan.positions.shape[0]
    args = (plan, forces.reshape(n, -1), tgt2, src_pos2, src_ids2)
    specs = jax.tree_util.tree_map(lambda _: PartitionSpec(), args)
    return shard_map(shard_fn, mesh=mesh, in_specs=specs,
                     out_specs=PartitionSpec(), check_vma=False)(*args)


# ---------------------------------------------------------------------------
# Brute-force oracles (small N; used by tests and parameter validation)
# ---------------------------------------------------------------------------


def brute_force_wave(params: EwaldParams, positions, forces, *, n_waves=24):
    """Direct lattice k-sum of the wave part (no grid, no windows)."""
    pos = np.asarray(positions, dtype=np.float64)
    f = np.asarray(forces, dtype=np.float64).reshape(-1, 3)
    L = np.asarray(params.box)
    m = np.arange(-n_waves, n_waves + 1)
    mx, my, mz = np.meshgrid(m, m, m, indexing="ij")
    kvecs = 2 * np.pi * np.stack(
        [mx.ravel() / L[0], my.ravel() / L[1], mz.ravel() / L[2]], axis=1)
    k2 = np.sum(kvecs**2, axis=1)
    sel = k2 > 0
    kvecs, k2 = kvecs[sel], k2[sel]
    k = np.sqrt(k2)
    sinc = np.sin(k * params.a) / (k * params.a)
    phi = (1 + k2 / (4 * params.xi**2)) * np.exp(-k2 / (4 * params.xi**2))
    amp = sinc**2 * phi / (params.eta * k2) / np.prod(L)
    khat = kvecs / k[:, None]
    fk = np.exp(-1j * pos @ kvecs.T).T[:, :, None] * f[None]  # (nk,N,3)
    fk = fk.sum(axis=1)                                       # (nk,3)
    fk = fk - khat * np.sum(khat * fk, axis=1, keepdims=True)
    u = np.real(np.exp(1j * pos @ kvecs.T) @ (amp[:, None] * fk))
    return u


def brute_force_wave_radii(params: EwaldParams, positions, forces,
                           group_of, *, n_waves=24):
    """Direct lattice k-sum of the mixed-radii wave part (per-particle
    sinc(k a_g) factors; no grid, no windows)."""
    pos = np.asarray(positions, dtype=np.float64)
    f = np.asarray(forces, dtype=np.float64).reshape(-1, 3)
    g_of = np.asarray(group_of)
    a_of = np.asarray(params.radii)[g_of]                  # (N,)
    L = np.asarray(params.box)
    m = np.arange(-n_waves, n_waves + 1)
    mx, my, mz = np.meshgrid(m, m, m, indexing="ij")
    kvecs = 2 * np.pi * np.stack(
        [mx.ravel() / L[0], my.ravel() / L[1], mz.ravel() / L[2]], axis=1)
    k2 = np.sum(kvecs**2, axis=1)
    sel = k2 > 0
    kvecs, k2 = kvecs[sel], k2[sel]
    k = np.sqrt(k2)
    ka = np.outer(k, a_of)                                 # (nk, N)
    sinc = np.sin(ka) / ka
    phi = (1 + k2 / (4 * params.xi**2)) * np.exp(-k2 / (4 * params.xi**2))
    amp = phi / (params.eta * k2) / np.prod(L)
    khat = kvecs / k[:, None]
    fk = (np.exp(-1j * pos @ kvecs.T).T * sinc)[:, :, None] * f[None]
    fk = fk.sum(axis=1)                                    # (nk, 3)
    fk = fk - khat * np.sum(khat * fk, axis=1, keepdims=True)
    u = np.real((np.exp(1j * pos @ kvecs.T).T * sinc).transpose(1, 0)
                @ (amp[:, None] * fk))
    return u


def brute_force_real_radii(params: EwaldParams, positions, forces,
                           group_of):
    """Direct minimum-image mixed-radii remainder sum, with per-pair
    scalars from DIRECT quadrature (pair_remainder_radii — no Chebyshev
    tables, so engine-vs-oracle parity also validates the fits)."""
    pos = np.asarray(positions, dtype=np.float64)
    f = np.asarray(forces, dtype=np.float64).reshape(-1, 3)
    g_of = np.asarray(group_of)
    L = np.asarray(params.box)
    n = pos.shape[0]
    selfs = {g: pair_remainder_radii(
        np.asarray([0.0]), params.radii[g], params.radii[g],
        params.eta, params.xi)[0][0] for g in set(g_of.tolist())}
    u = np.stack([selfs[g] for g in g_of.tolist()])[:, None] * f
    for i in range(n):
        d = pos[i] - pos
        d -= np.round(d / L) * L
        r = np.linalg.norm(d, axis=1)
        sel = (r < params.r_cut) & (np.arange(n) != i) & (r > 0)
        for j in np.nonzero(sel)[0]:
            al, be = pair_remainder_radii(
                np.asarray([r[j]]), params.radii[g_of[i]],
                params.radii[g_of[j]], params.eta, params.xi)
            u[i] += (al[0] * f[j]
                     + (be[0] * (d[j] @ f[j]) / r[j] ** 2) * d[j])
    return u


def brute_force_real(params: EwaldParams, positions, forces):
    """Direct minimum-image near-field remainder sum (r_cut < L/2)."""
    pos = np.asarray(positions, dtype=np.float64)
    f = np.asarray(forces, dtype=np.float64).reshape(-1, 3)
    L = np.asarray(params.box)
    n = pos.shape[0]
    r_tab, a_tab, b_tab, self_c = realspace_tables(
        params.a, params.eta, params.xi, params.r_cut,
        n_points=params.n_table)
    u = self_c * f.copy()
    for i in range(n):
        d = pos[i] - pos
        d -= np.round(d / L) * L
        r = np.linalg.norm(d, axis=1)
        # r > 0: coincident distinct blobs are excluded on every backend
        # (see real_matvec_xla); they contribute via the wave part only
        sel = (r < params.r_cut) & (np.arange(n) != i) & (r > 0)
        al = np.interp(r[sel], r_tab, a_tab)
        be = np.interp(r[sel], r_tab, b_tab)
        dd = d[sel]
        rr = r[sel]
        ddotf = np.sum(dd * f[sel], axis=1)
        u[i] += np.sum(al[:, None] * f[sel]
                       + (be * ddotf / rr**2)[:, None] * dd, axis=0)
    return u
