"""Laplace boundary-integral kernels vs the reference implementations
(run as pure python via a numba no-op shim) and the phoretic slip solve."""

import importlib.util
import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.ops import laplace


def _load_reference_laplace():
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def njit(*a, **k):
            if a and callable(a[0]):
                return a[0]
            return lambda f: f

        numba.njit = njit
        numba.prange = range
        sys.modules["numba"] = numba
    spec = importlib.util.spec_from_file_location(
        "_ref_laplace",
        "/root/reference/Laplace_kernels/Laplace_kernels_numba.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


REF = _load_reference_laplace()


def _setup(n=14, seed=0):
    rng = np.random.default_rng(seed)
    r = rng.uniform(-1, 1, (n, 3))
    r[:, 2] = rng.uniform(0.5, 2.0, n)
    field = rng.normal(size=n)
    weights = rng.uniform(0.5, 1.5, n)
    normals = rng.normal(size=(n, 3))
    normals /= np.linalg.norm(normals, axis=1, keepdims=True)
    return r, field, weights, normals


@pytest.mark.parametrize("wall", [0, 1])
def test_single_layer_matches_reference(wall):
    r, field, weights, normals = _setup()
    ours = np.asarray(laplace.single_layer(
        jnp.asarray(r), jnp.asarray(r), jnp.asarray(field),
        jnp.asarray(weights), wall=bool(wall)))
    ref = REF.Laplace_single_layer_operator_numba(r, field, weights, wall=wall)
    assert np.allclose(ours, ref, atol=1e-13)


@pytest.mark.parametrize("wall", [0, 1])
def test_double_layer_matches_reference(wall):
    r, field, weights, normals = _setup(seed=1)
    ours = np.asarray(laplace.double_layer(
        jnp.asarray(r), jnp.asarray(r), jnp.asarray(field),
        jnp.asarray(weights), jnp.asarray(normals), wall=bool(wall)))
    ref = REF.Laplace_double_layer_operator_numba(r, field, weights, normals,
                                                  wall=wall)
    assert np.allclose(ours, ref, atol=1e-13)


@pytest.mark.parametrize("wall", [0, 1])
def test_deriv_double_layer_matches_reference(wall):
    r, field, weights, normals = _setup(seed=2)
    ours = np.asarray(laplace.deriv_double_layer(
        jnp.asarray(r), jnp.asarray(r), jnp.asarray(field),
        jnp.asarray(weights), jnp.asarray(normals), wall=bool(wall)))
    ref = REF.Laplace_deriv_double_layer_operator_numba(
        r, field, weights, normals, wall=wall).reshape(-1, 3)
    assert np.allclose(ours, ref, atol=1e-13)


@pytest.mark.parametrize("wall", [0, 1])
def test_dipole_matches_reference(wall):
    r, field, weights, normals = _setup(seed=3)
    ours = np.asarray(laplace.dipole(
        jnp.asarray(r), jnp.asarray(r), jnp.asarray(field),
        jnp.asarray(weights), wall=bool(wall)))
    ref = REF.Laplace_dipole_operator_numba(r, field, weights,
                                            wall=wall).reshape(-1, 3)
    assert np.allclose(ours, ref, atol=1e-13)


def test_phoretic_slip_janus_sphere():
    """A Janus sphere (emitting on one hemisphere) must self-propel: the
    slip is tangential and the concentration solve converges."""
    from rigidmultiblobswall_tpu.models import phoretic
    from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state
    from tests.test_saddle import _shell_vertices

    nb = 32
    ref = _shell_vertices(nb, 0.5)
    normals = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    emitting = np.where(ref[:, 2] > 0, 1.0, 0.0)  # active cap
    chem = phoretic.Chemistry(
        normals_ref=normals, reaction_rate=np.zeros(nb),
        emitting_rate=emitting, surface_mobility=np.ones(nb),
        weights=np.full(nb, 4 * np.pi * 0.5**2 / nb))
    t = BodyType(name="janus", ref_config=ref, count=1)
    system = System(types=(t,), blob_radius=0.1, domain="no_wall")
    state = make_state([[0.0, 0.0, 5.0]], [[1.0, 0, 0, 0]])
    cfg = phoretic.PhoreticConfig(chemistry=(chem,),
                                  background=jnp.zeros(9),
                                  diffusion_coefficient=1.0)
    slip, c, iters = phoretic.phoretic_slip(system, state, cfg)
    slip = np.asarray(slip)
    assert np.all(np.isfinite(slip))
    assert int(iters) > 0
    # tangential: slip . n == 0
    dots = np.einsum("ij,ij->i", slip, normals)
    assert np.allclose(dots, 0.0, atol=1e-10)
    # concentration higher on the emitting cap
    c = np.asarray(c)
    assert c[emitting > 0].mean() > c[emitting == 0].mean()
    # axisymmetric activity -> z-directed net slip asymmetry
    assert abs(slip[:, 2].mean()) > 1e-4
