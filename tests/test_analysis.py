import numpy as np
import pytest

from rigidmultiblobswall_tpu.utils import analysis
from tests.reference_oracle import load_reference_body

Body, Quaternion = load_reference_body()


def test_msd_fft_matches_direct():
    rng = np.random.default_rng(0)
    x = np.cumsum(rng.normal(size=(500, 3)), axis=0)
    direct = analysis.msd_direct(x, max_lag=100)
    fft = analysis.msd_fft(x, max_lag=100)
    assert np.allclose(direct[1:], fft[1:], rtol=1e-10)


def test_msd_brownian_slope():
    rng = np.random.default_rng(1)
    dt_var = 0.1
    x = np.cumsum(rng.normal(scale=np.sqrt(dt_var), size=(20000, 1)), axis=0)
    msd = analysis.msd_fft(x, max_lag=50)
    lags = np.arange(50)
    slope = np.polyfit(lags[1:], msd[1:], 1)[0]
    assert abs(slope - dt_var) / dt_var < 0.1


def test_trajectory_txt_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    locs = rng.normal(size=(7, 3))
    quats = rng.normal(size=(7, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    p = str(tmp_path / "traj.txt")
    analysis.write_trajectory_to_txt(p, [locs, quats], {"dt": 0.01, "n": 7})
    params, locs2, quats2 = analysis.read_trajectory_from_txt(p)
    assert params["dt"] == "0.01"
    assert np.allclose(locs, locs2, atol=1e-12)
    assert np.allclose(quats, quats2, atol=1e-12)


def test_transfer_mobility_matches_reference():
    """Parity with the reference implementation on a random SPD 6x6."""
    import importlib.util
    import sys

    sys.path.insert(0, "/root/reference")
    import general_application_utils as ref_utils

    rng = np.random.default_rng(3)
    m = rng.normal(size=(6, 6))
    m = m @ m.T
    p1 = rng.normal(size=3)
    p2 = rng.normal(size=3)
    ours = analysis.transfer_mobility(m, p1, p2)
    ref = ref_utils.transfer_mobility(m, p1, p2)
    assert np.allclose(ours, ref, atol=1e-12)


def test_transfer_mobility_roundtrip():
    rng = np.random.default_rng(4)
    m = rng.normal(size=(6, 6))
    m = m @ m.T
    p1 = rng.normal(size=3)
    p2 = rng.normal(size=3)
    back = analysis.transfer_mobility(
        analysis.transfer_mobility(m, p1, p2), p2, p1)
    assert np.allclose(back, m, atol=1e-10)


def test_rotational_msd_shape_and_symmetry():
    rng = np.random.default_rng(5)
    locs = np.cumsum(rng.normal(size=(50, 3)) * 0.01, axis=0)
    quats = rng.normal(size=(50, 4))
    quats /= np.linalg.norm(quats, axis=1, keepdims=True)
    out = analysis.rotational_msd(locs, quats, max_lag=10)
    assert out.shape == (10, 6, 6)
    for tau in range(1, 10):
        assert np.allclose(out[tau], out[tau].T, atol=1e-12)
        assert np.all(np.diag(out[tau]) >= 0)


def test_structure_factor_ideal_gas_normalization():
    """Uncorrelated uniform particles give S(k) ~= 1 at all k > 0 (the
    HydroGrid-analog sanity: per-particle normalization + mean
    subtraction), and the green/red cross spectrum ~= 0."""
    import numpy as np

    from rigidmultiblobswall_tpu.utils.analysis import StructureFactor

    rng = np.random.default_rng(0)
    n, L = 4000, 20.0
    sf = StructureFactor(L, L, (32, 32), (0, n // 2), n)
    for _ in range(60):
        pos = np.column_stack([rng.uniform(0, L, n), rng.uniform(0, L, n),
                               rng.uniform(0, 2.0, n)])
        sf.sample(pos)
    k, sgg, srr, sgr = sf.radial()
    # each species holds n/2 particles; per-TOTAL-particle norm -> 1/2
    assert abs(np.mean(sgg[2:]) - 0.5) < 0.05
    assert abs(np.mean(srr[2:]) - 0.5) < 0.05
    assert np.abs(np.mean(sgr[2:])) < 0.05
