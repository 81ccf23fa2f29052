"""Rot-block Hasimoto-split radial tables (ops/ewald.rot_realspace_tables).

The split is exact by construction (remainder := pair - wave); the
testable properties are (a) the remainder decays below the split
tolerance at r_cut (so truncating the near sweep there is valid), and
(b) the wave scalars reproduce the exact pair forms at large r where
the screen has converged (quadrature correctness)."""

import math

import numpy as np

from rigidmultiblobswall_tpu.ops import ewald


A, ETA = 0.31, 1.3


def _split(tol=1e-6):
    s = math.sqrt(-math.log(tol))
    r_cut = 6.0 * A
    return s / r_cut, r_cut


def test_rot_remainders_decay_at_cutoff():
    xi, r_cut = _split()
    r, gamma_r, a_r, b_r, self_rr = ewald.rot_realspace_tables(
        A, ETA, xi, 1.5 * r_cut, n_points=1024)
    # scale: the self mobilities of the blocks
    sc_cross = 1.0 / (8 * np.pi * ETA * A * A)
    sc_rr = 1.0 / (8 * np.pi * ETA * A**3)
    tail = r >= r_cut
    # the rot remainders carry extra polynomial s-prefactors vs the
    # plain e^{-s^2} = tol split estimate (measured ~2.5e-5 at s^2 =
    # ln 1e6); engine parameter choice compensates via its split margin
    assert np.abs(gamma_r[tail] * r[tail]).max() < 1e-4 * sc_cross
    assert np.abs(a_r[tail]).max() < 1e-4 * sc_rr
    assert np.abs(b_r[tail]).max() < 1e-4 * sc_rr
    # self coefficient is positive and below the full self mobility
    assert 0 < self_rr < sc_rr


def test_rot_wave_scalars_match_pair_far_field():
    """With a very sharp screen (large xi), the wave kernel IS the full
    kernel at moderate r: gamma_w -> 1/(8 pi eta r^3), rr scalars ->
    (-1/2, 1) * a^3/r^3 scale forms."""
    xi = 40.0 / (6.0 * A)          # screen converged well below r test
    r = np.linspace(2.5 * A, 5.0 * A, 64)
    gamma_w, c_perp, c_par = ewald.rot_wave_freespace_scalars(
        r, A, ETA, xi, n_k=8001)
    gamma_exact = 1.0 / (8 * np.pi * ETA * r**3)
    assert np.abs(gamma_w / gamma_exact - 1.0).max() < 1e-6
    pref = 1.0 / (16 * np.pi * ETA * r**3)
    # M_rr far = -pref I + 3 pref rhat rhat = c_perp (I-rr) + c_par rr
    assert np.abs(c_perp / (-pref) - 1.0).max() < 1e-5
    assert np.abs(c_par / (2 * pref) - 1.0).max() < 1e-5


def test_rot_pair_scalars_continuous_at_touching():
    g, a_rr, b_rr = ewald.rot_scalar_functions(
        np.array([2 * A - 1e-9, 2 * A + 1e-9]), A, ETA)
    assert abs(g[0] - g[1]) < 1e-6 * abs(g[1])
    assert abs(a_rr[0] - a_rr[1]) < 1e-6 * abs(a_rr[1])
    assert abs(b_rr[0] - b_rr[1]) < 1e-6 * abs(b_rr[1])
