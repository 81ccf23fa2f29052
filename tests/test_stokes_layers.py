import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.ops import stokes_layers
from tests.test_laplace import _load_reference_laplace  # installs numba shim
import importlib.util


def _load_reference_mobility_numba():
    _load_reference_laplace()  # ensure numba shim
    spec = importlib.util.spec_from_file_location(
        "_ref_mob_numba", "/root/reference/mobility/mobility_numba.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF = _load_reference_mobility_numba()


def _setup(ns=6, nt=5, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.uniform(-1, 1, (ns, 3))
    src[:, 2] = rng.uniform(0.5, 2.0, ns)
    tgt = rng.uniform(-1, 1, (nt, 3))
    tgt[:, 2] = rng.uniform(0.5, 2.0, nt)
    f = rng.normal(size=(ns, 3))
    normals = rng.normal(size=(ns, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    weights = rng.uniform(0.5, 1.5, ns)
    return src, tgt, f, normals, weights


def test_pressure_no_wall_matches_reference():
    src, tgt, f, _, _ = _setup()
    ours = np.asarray(stokes_layers.pressure_stokeslet(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f), wall=False))
    ref = REF.no_wall_pressure_Stokeslet_numba(src, tgt, f,
                                               np.zeros(3))
    assert np.allclose(ours, ref, atol=1e-12)


def test_pressure_single_wall_single_source():
    """With ONE source the reference's in-loop normalization quirk is
    harmless, so direct parity holds."""
    src, tgt, f, _, _ = _setup(ns=1, seed=1)
    ours = np.asarray(stokes_layers.pressure_stokeslet(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f), wall=True))
    ref = REF.single_wall_pressure_Stokeslet_numba(src, tgt, f, np.zeros(3))
    assert np.allclose(ours, ref, atol=1e-12)


def test_pressure_wall_vanishes_normal_derivative():
    """Physics: for a Stokeslet above a no-slip wall the Blake image
    pressure decays faster; check the pressure field is finite and the
    wall correction changes the result."""
    src, tgt, f, _, _ = _setup(seed=2)
    p_wall = np.asarray(stokes_layers.pressure_stokeslet(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f), wall=True))
    p_free = np.asarray(stokes_layers.pressure_stokeslet(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(f), wall=False))
    assert np.all(np.isfinite(p_wall))
    assert not np.allclose(p_wall, p_free)


@pytest.mark.parametrize("wall", [0, 1])
def test_double_layer_matches_reference(wall):
    src, tgt, f, normals, weights = _setup(seed=3)
    ours = np.asarray(stokes_layers.double_layer_source_target(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(normals),
        jnp.asarray(f), jnp.asarray(weights), wall=bool(wall)))
    ref = REF.double_layer_source_target_numba(
        src, tgt, normals, f.copy(), weights, wall=wall).reshape(-1, 3)
    assert np.allclose(ours, ref, atol=1e-12)


def test_double_layer_rpy_matches_reference():
    src, tgt, f, normals, weights = _setup(seed=5)
    ours = np.asarray(stokes_layers.double_layer_rpy_source_target(
        jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(normals),
        jnp.asarray(f), jnp.asarray(weights), 0.27))
    ref = REF.double_layer_rpy_source_target_numba(
        src, tgt, normals, f.copy(), weights, 0.27).reshape(-1, 3)
    assert np.allclose(ours, ref, atol=1e-12)


def test_double_layer_self_skipped():
    src, tgt, f, normals, weights = _setup(seed=4)
    # same points as src and tgt: diagonal skipped, finite output
    ours = np.asarray(stokes_layers.double_layer_source_target(
        jnp.asarray(src), jnp.asarray(src), jnp.asarray(normals),
        jnp.asarray(f), jnp.asarray(weights), wall=False))
    ref = REF.double_layer_source_target_numba(
        src, src, normals, f.copy(), weights, wall=0).reshape(-1, 3)
    assert np.all(np.isfinite(ours))
    assert np.allclose(ours, ref, atol=1e-12)
