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


def test_concentration_field_uniform_emitter_analytic():
    """Off-surface concentration of a uniformly emitting sphere (reaction
    rate 0) must match the exact monopole field c(r) = Q/(4 pi Dc r) with
    Q = emitting_rate * surface area; near the surface the representation
    must approach the solved surface concentration (jump consistency)."""
    from rigidmultiblobswall_tpu.models import phoretic
    from rigidmultiblobswall_tpu.models.system import (BodyType, System,
                                                       make_state)
    from tests.test_saddle import _shell_vertices

    nb, a, Dc, q = 162, 0.5, 1.3, 0.7
    ref = _shell_vertices(nb, a)
    normals = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    area = 4 * np.pi * a**2
    chem = phoretic.Chemistry(
        normals_ref=normals, reaction_rate=np.zeros(nb),
        emitting_rate=np.full(nb, q), surface_mobility=np.ones(nb),
        weights=np.full(nb, area / nb))
    t = BodyType(name="emitter", ref_config=ref, count=1)
    system = System(types=(t,), blob_radius=0.05, domain="no_wall",
                    solver_tolerance=1e-10)
    center = np.array([0.3, -0.2, 5.0])
    state = make_state([center], [[1.0, 0, 0, 0]])
    cfg = phoretic.PhoreticConfig(chemistry=(chem,),
                                  background=jnp.zeros(9),
                                  diffusion_coefficient=Dc)

    radii = np.array([2.0 * a, 3.0 * a, 6.0 * a])
    dirs = np.array([[1.0, 0, 0], [0, 1 / np.sqrt(2), 1 / np.sqrt(2)],
                     [0, 0, -1.0]])
    targets = center + radii[:, None] * dirs
    c_t, c_surf = phoretic.concentration_field(system, state, cfg, targets)
    c_t = np.asarray(c_t)
    exact = q * area / (4 * np.pi * Dc * radii)
    assert np.allclose(c_t, exact, rtol=2e-2), (c_t, exact)
    # near field: just outside the sphere the monopole law still holds
    near = center + np.array([[1.12 * a, 0, 0]])
    c_near, _ = phoretic.concentration_field(system, state, cfg, near,
                                             c=c_surf)
    assert np.allclose(np.asarray(c_near),
                       q * area / (4 * np.pi * Dc * 1.12 * a), rtol=5e-2)


def test_concentration_field_surface_limit_janus():
    """Double-layer sign/jump consistency: for a NON-uniform surface
    concentration (Janus sphere) the exterior field evaluated just outside
    a blob must approach that blob's solved surface value. A wrong
    double-layer sign would be off by ~c (the jump is +/- c/2)."""
    from rigidmultiblobswall_tpu.models import phoretic
    from rigidmultiblobswall_tpu.models.system import (BodyType, System,
                                                       make_state)
    from tests.test_saddle import _shell_vertices

    nb, a = 162, 0.5
    ref = _shell_vertices(nb, a)
    normals = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    emitting = np.where(ref[:, 2] > 0, 1.0, 0.0)
    chem = phoretic.Chemistry(
        normals_ref=normals, reaction_rate=np.full(nb, 0.5),
        emitting_rate=emitting, surface_mobility=np.ones(nb),
        weights=np.full(nb, 4 * np.pi * a**2 / nb))
    t = BodyType(name="janus", ref_config=ref, count=1)
    system = System(types=(t,), blob_radius=0.05, domain="no_wall",
                    solver_tolerance=1e-10)
    center = np.array([0.0, 0.0, 5.0])
    state = make_state([center], [[1.0, 0, 0, 0]])
    cfg = phoretic.PhoreticConfig(chemistry=(chem,),
                                  background=jnp.zeros(9),
                                  diffusion_coefficient=1.0)
    _, c_surf, _ = phoretic.phoretic_slip(system, state, cfg)
    c_surf = np.asarray(c_surf)
    # two probe blobs: one on the emitting cap, one on the inert side
    for bi in (int(np.argmax(ref[:, 2])), int(np.argmin(ref[:, 2]))):
        probe = center + 1.15 * ref[bi]
        c_p, _ = phoretic.concentration_field(system, state, cfg,
                                              probe[None], c=c_surf)
        # continuum decay over 15% radius is smooth; a sign error in the
        # double layer would shift the value by ~c_surf[bi] itself
        assert abs(float(c_p[0]) - c_surf[bi]) < 0.25 * abs(c_surf[bi]), (
            float(c_p[0]), c_surf[bi])


def test_plot_concentration_field_to_vtk(tmp_path):
    """The grid evaluation writes a scalar legacy-VTK file (the working
    equivalent of the reference's undefined plot_concentration_field_pyVTK,
    multi_bodies/examples/Laplace_sphere/multi_bodies_stkfmm.py:219)."""
    from rigidmultiblobswall_tpu.models import fields, phoretic
    from rigidmultiblobswall_tpu.models.system import (BodyType, System,
                                                       make_state)
    from tests.test_saddle import _shell_vertices

    nb = 32
    ref = _shell_vertices(nb, 0.5)
    normals = ref / np.linalg.norm(ref, axis=1, keepdims=True)
    chem = phoretic.Chemistry(
        normals_ref=normals, reaction_rate=np.zeros(nb),
        emitting_rate=np.ones(nb), surface_mobility=np.ones(nb),
        weights=np.full(nb, 4 * np.pi * 0.25 / nb))
    t = BodyType(name="emitter", ref_config=ref, count=1)
    system = System(types=(t,), blob_radius=0.1, domain="no_wall")
    state = make_state([[0.0, 0.0, 5.0]], [[1.0, 0, 0, 0]])
    cfg = phoretic.PhoreticConfig(chemistry=(chem,), background=jnp.zeros(9),
                                  diffusion_coefficient=1.0)
    grid = [-2, 2, 4, -2, 2, 4, 3, 7, 4]
    out = str(tmp_path / "run")
    c = fields.plot_concentration_field_to_vtk(grid, system, state, cfg, out)
    assert c.shape == (64,)
    txt = open(out + ".concentration_field.vtk").read()
    assert "SCALARS concentration" in txt and "RECTILINEAR_GRID" in txt
