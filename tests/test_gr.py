"""Radial-distribution tool: native core vs numpy fallback vs brute force.

Mirrors the contract of the reference executable
multi_bodies/examples/Radial_Dist_Test/gr_pseudo2D_single_blob.cpp
(xy minimum image, 3D distance, 2D ideal-gas normalization).
"""

import numpy as np
import pytest

from rigidmultiblobswall_tpu.native import load_library
from rigidmultiblobswall_tpu.utils.gr import (_accumulate_numpy,
                                              radial_distribution_pseudo2d)


def _brute_force(xyz, lx, ly, dr, n_bins, skip=0):
    hist = np.zeros(n_bins, dtype=np.int64)
    for f in range(skip, xyz.shape[0]):
        n = xyz.shape[1]
        for i in range(n - 1):
            for j in range(i + 1, n):
                d = xyz[f, i] - xyz[f, j]
                d[0] -= lx * np.rint(d[0] / lx)
                d[1] -= ly * np.rint(d[1] / ly)
                b = int(np.sqrt(np.sum(d * d)) / dr)
                if b < n_bins:
                    hist[b] += 2
    return hist


@pytest.fixture(scope="module")
def traj():
    rng = np.random.default_rng(7)
    xyz = rng.uniform(0.0, 8.0, size=(5, 24, 3))
    xyz[..., 2] = rng.uniform(1.0, 2.0, size=(5, 24))  # quasi-2D slab
    return xyz


def test_numpy_matches_brute_force(traj):
    lx = ly = 8.0
    n_bins = 64
    dr = lx / (2 * n_bins)
    hist, n_used = _accumulate_numpy(traj, lx, ly, dr, n_bins, skip=1)
    assert n_used == 4
    np.testing.assert_array_equal(
        hist, _brute_force(traj.copy(), lx, ly, dr, n_bins, skip=1))


def test_native_matches_numpy(traj):
    if load_library("gr") is None:
        pytest.skip("no C++ toolchain")
    r_n, g_n, h_n = radial_distribution_pseudo2d(traj, 8.0, 8.0, n_bins=64)
    r_p, g_p, h_p = radial_distribution_pseudo2d(traj, 8.0, 8.0, n_bins=64,
                                                 force_numpy=True)
    np.testing.assert_array_equal(h_n, h_p)
    np.testing.assert_allclose(g_n, g_p, rtol=0, atol=0)
    np.testing.assert_allclose(r_n, r_p)


def test_ideal_gas_gr_is_unity(traj):
    """For uniform xy positions in the box, g(r) ~ 1 below lx/2 (2D
    normalization is the point of the pseudo-2D variant)."""
    rng = np.random.default_rng(3)
    lx = ly = 10.0
    xyz = rng.uniform(0.0, lx, size=(400, 64, 3))
    xyz[..., 2] = 1.5  # flat slab: exactly 2D ideal gas in xy
    r, g, _ = radial_distribution_pseudo2d(xyz, lx, ly, n_bins=25)
    sel = (r > 1.0) & (r < lx / 2)
    assert abs(g[sel].mean() - 1.0) < 0.02
    np.testing.assert_allclose(g[sel], 1.0, atol=0.15)


def test_normalization_matches_reference_formula(traj):
    lx, ly, n_bins = 8.0, 8.0, 64
    r, g, hist = radial_distribution_pseudo2d(traj, lx, ly, n_bins=n_bins)
    n_frames, n_p = traj.shape[0], traj.shape[1]
    dr = lx / (2 * n_bins)
    i = np.arange(n_bins)
    n_ideal = np.pi * (n_p / (lx * ly)) * (((i + 1) * dr) ** 2 - (i * dr) ** 2)
    np.testing.assert_allclose(g, hist / (n_frames * n_p * n_ideal))
    np.testing.assert_allclose(r, (i + 0.5) * dr)
