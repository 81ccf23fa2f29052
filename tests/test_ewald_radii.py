"""Mixed-radii (polydisperse) spectral Ewald engine.

Validation chain (mirrors tests/test_ewald.py):
  1. xi-independence of the brute-force mixed-radii real+wave sums ->
     the per-group-pair remainder quadrature and the per-group sinc
     wave factors form a consistent split of ONE operator.
  2. Engine matvec vs the brute sums -> the group-channel NUFFT wave
     product and the per-pair-table near sweep (the oracle's radial
     scalars come from direct quadrature, so this also validates the
     piecewise-Chebyshev fits and their kink placement).
  3. Degenerate radii (one group) vs the uniform engine -> absolute
     normalization, riding the uniform engine's own Hasimoto check.
  4. SPD of both split parts + exact noise covariance -> what the
     PSE-style noise path (closed-form wave sqrt + near-only Lanczos)
     needs from the polydisperse split.

Reference surface: the radii kernel family of mobility/mobility.py:830-966
(pairwise backends only there — the reference has no spectral radii path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.ops import ewald

ETA = 1.3
BOX = (12.0, 12.0, 12.0)
RADII = (0.25, 0.45)


@pytest.fixture(scope="module")
def radii_system():
    rng = np.random.default_rng(7)
    n = 14
    pos = rng.uniform(0.0, BOX[0], size=(n, 3))
    groups = rng.integers(0, len(RADII), size=n).astype(np.int32)
    f = rng.normal(size=(n, 3))
    return pos, groups, f


def _params(tol=1e-5, **kw):
    return ewald.default_params(max(RADII), ETA, BOX, tol=tol,
                                radii=RADII, **kw)


def _brute(params, pos, f, groups, n_waves=30):
    return (ewald.brute_force_real_radii(params, pos, f, groups)
            + ewald.brute_force_wave_radii(params, pos, f, groups,
                                           n_waves=n_waves))


def test_brute_split_is_xi_independent(radii_system):
    pos, groups, f = radii_system
    p1 = _params(tol=1e-6)
    p2 = _params(tol=1e-6, r_cut_factor=9.0)
    assert abs(p1.xi - p2.xi) > 0.2
    u1 = _brute(p1, pos, f, groups)
    u2 = _brute(p2, pos, f, groups)
    err = np.linalg.norm(u1 - u2) / np.linalg.norm(u1)
    assert err < 2e-6, err


def test_fft_matvec_matches_brute(radii_system):
    pos, groups, f = radii_system
    p = _params(tol=1e-5)
    ref = _brute(p, pos, f, groups)
    plan = ewald.make_plan(p, jnp.asarray(pos), group_of=groups)
    u = np.asarray(ewald.matvec(plan, jnp.asarray(f)))
    err = np.linalg.norm(u - ref) / np.linalg.norm(ref)
    assert err < 5e-5, err


@pytest.mark.slow
def test_degenerate_radii_match_uniform_engine(radii_system):
    """One radius group == the uniform engine (same params otherwise)."""
    pos, _, f = radii_system
    a = 0.4
    pu = ewald.default_params(a, ETA, BOX, tol=1e-5)
    pr = ewald.default_params(a, ETA, BOX, tol=1e-5, radii=(a,))
    plan_u = ewald.make_plan(pu, jnp.asarray(pos))
    plan_r = ewald.make_plan(pr, jnp.asarray(pos),
                             group_of=np.zeros(pos.shape[0], np.int32))
    uu = np.asarray(ewald.matvec(plan_u, jnp.asarray(f)))
    ur = np.asarray(ewald.matvec(plan_r, jnp.asarray(f)))
    err = np.linalg.norm(uu - ur) / np.linalg.norm(uu)
    # same analytic operator through two code paths (sinc^2-folded
    # kernel + 2-piece tables vs group channels + 3-piece pair tables)
    assert err < 1e-6, err


def _dense(apply_fn, n):
    eye = np.eye(3 * n)
    return np.stack([np.asarray(apply_fn(
        jnp.asarray(e.reshape(n, 3)))).ravel() for e in eye], axis=1)


@pytest.mark.slow
def test_split_parts_symmetric_psd(radii_system):
    """Both polydisperse split parts must be SPD: the wave part by the
    D^T C D congruence, the near part because its spectral density
    (1 - phi(k)) >= 0 rides the SAME per-particle factors — exactly
    what near-only Lanczos + closed-form wave noise require."""
    pos, groups, _ = radii_system
    n = pos.shape[0]
    p = _params(tol=1e-4)
    plan = ewald.make_plan(p, jnp.asarray(pos), group_of=groups)
    mw = _dense(lambda v: ewald.wave_matvec(plan, v), n)
    mr = _dense(lambda v: ewald.real_matvec(plan, v), n)
    scale = np.linalg.norm(mw + mr, 2)
    assert np.abs(mw - mw.T).max() < 1e-10 * scale
    assert np.abs(mr - mr.T).max() < 1e-8 * scale
    assert np.linalg.eigvalsh(0.5 * (mw + mw.T)).min() > -1e-9 * scale
    assert np.linalg.eigvalsh(0.5 * (mr + mr.T)).min() > -1e-9 * scale


@pytest.mark.slow
def test_wave_sqrt_noise_covariance_radii(radii_system):
    """Cov of the mixed-radii closed-form wave sampler == dense wave
    operator (statistical check at Wishart accuracy)."""
    pos, groups, _ = radii_system
    n = 8
    pos, groups = pos[:n], groups[:n]
    p = _params(tol=1e-3)
    plan = ewald.make_plan(p, jnp.asarray(pos), group_of=groups)
    mw = _dense(lambda v: ewald.wave_matvec(plan, v), n)
    mw = 0.5 * (mw + mw.T)
    n_samp = 3000
    sampler = jax.jit(lambda k: ewald.wave_sqrt_noise(plan, k).ravel())
    keys = jax.random.split(jax.random.PRNGKey(5), n_samp)
    samples = np.asarray(jax.lax.map(sampler, keys, batch_size=50))
    emp = samples.T @ samples / n_samp
    err = np.linalg.norm(emp - mw) / np.linalg.norm(mw)
    assert err < 0.12, err


@pytest.mark.slow
def test_matvec_multi_matches_singles(radii_system):
    pos, groups, f = radii_system
    rng = np.random.default_rng(3)
    stack = jnp.asarray(rng.normal(size=(3,) + f.shape))
    p = _params(tol=1e-4)
    plan = ewald.make_plan(p, jnp.asarray(pos), group_of=groups)
    multi = np.asarray(ewald.matvec_multi(plan, stack))
    singles = np.stack([np.asarray(ewald.matvec(plan, s)) for s in stack])
    assert np.abs(multi - singles).max() < 1e-10 * np.abs(singles).max()


def test_update_plan_preserves_radii(radii_system):
    """Refresh AND rebuild paths keep the group machinery intact."""
    pos, groups, f = radii_system
    p = _params(tol=1e-4)
    plan = ewald.make_plan(p, jnp.asarray(pos), group_of=groups)
    # small drift -> refresh
    pos2 = pos + 1e-3
    plan2 = ewald.update_plan(plan, jnp.asarray(pos2))
    ref2 = np.asarray(ewald.matvec(
        ewald.make_plan(p, jnp.asarray(pos2), group_of=groups),
        jnp.asarray(f)))
    u2 = np.asarray(ewald.matvec(plan2, jnp.asarray(f)))
    assert np.abs(u2 - ref2).max() < 1e-8 * np.abs(ref2).max()
    # large drift -> rebuild branch (shapes identical, groups carried)
    pos3 = np.roll(pos, 3, axis=0)
    plan3 = ewald.update_plan(plan, jnp.asarray(pos3))
    assert plan3.gsinc is not None and plan3.cheb_radii is not None


def test_saddle_builds_radii_plan_and_step_runs():
    """End-to-end: a periodic_spectral System with two blob radii builds
    the mixed-radii plan (the round-4 NotImplementedError gap,
    models/saddle.py) and a deterministic Brownian-dynamics step runs."""
    from rigidmultiblobswall_tpu.models import integrators, saddle
    from rigidmultiblobswall_tpu.models.system import (BodyType, System,
                                                       make_state)

    verts = np.asarray([[0.35, 0.0, 0.0], [-0.35, 0.0, 0.0]])
    t1 = BodyType(name="dimer_big", ref_config=verts, count=4,
                  blob_radii=np.asarray([0.3, 0.3]))
    t2 = BodyType(name="dimer_small", ref_config=verts, count=4,
                  blob_radii=np.asarray([0.2, 0.2]))
    system = System(types=(t1, t2), eta=1.0, blob_radius=0.3, kT=0.0,
                    g=0.1, domain="periodic_spectral",
                    periodic_length=(12.0, 12.0, 12.0),
                    spectral_tol=1e-4, spectral_grid_max=64,
                    solver_tolerance=1e-6)
    assert system.has_mixed_radii
    rng = np.random.default_rng(0)
    pos = rng.uniform(2.0, 10.0, size=(8, 3))
    quat = rng.normal(size=(8, 4))
    quat /= np.linalg.norm(quat, axis=1, keepdims=True)
    state = make_state(pos, quat)

    r_blobs = None
    from rigidmultiblobswall_tpu.models import kinematics
    r_blobs = kinematics.blob_positions(system, state)
    plan = saddle.maybe_dense_mobility(system, r_blobs)
    assert isinstance(plan, ewald.SpectralPlan)
    assert plan.gsinc is not None and plan.gsinc.shape[0] == 2

    step = integrators.make_stepper(system, "deterministic_forward_euler",
                                    1e-3)
    carry = integrators.init_carry(system, dtype=r_blobs.dtype,
                                   state=state)
    new_state, _, aux = jax.jit(step)(state, jax.random.PRNGKey(0), carry)
    assert bool(np.all(np.isfinite(np.asarray(new_state.pos))))
    assert int(aux.det_iterations) > 0


@pytest.mark.slow
def test_radii_engine_matches_source_target_kernel_dilute():
    """VERDICT r4 ask #8 parity shape: the spectral mixed-radii operator
    vs the reference-parity-tested pairwise radii kernel
    (ops/mobility.mobility_radii_trans_times_force, no_wall), on a
    compact cluster in a LARGE periodic box with ZERO net force — the
    periodic-image contamination then decays as (cluster/L)^3."""
    from rigidmultiblobswall_tpu.ops import mobility as mob

    L = 40.0
    rng = np.random.default_rng(11)
    n = 10
    pos = L / 2 + rng.uniform(-1.6, 1.6, size=(n, 3))
    groups = rng.integers(0, 2, size=n).astype(np.int32)
    radii_of = np.asarray(RADII)[groups]
    f = rng.normal(size=(n, 3))
    f -= f.mean(axis=0, keepdims=True)          # zero net force
    p = ewald.default_params(max(RADII), ETA, (L, L, L), tol=1e-6,
                             radii=RADII, grid_max=128)
    plan = ewald.make_plan(p, jnp.asarray(pos), group_of=groups)
    u_spec = np.asarray(ewald.matvec(plan, jnp.asarray(f)))
    u_open = np.asarray(mob.mobility_radii_trans_times_force(
        jnp.asarray(pos), jnp.asarray(f), jnp.asarray(radii_of), ETA,
        domain="no_wall"))
    err = np.linalg.norm(u_spec - u_open) / np.linalg.norm(u_open)
    assert err < 5e-3, err


@pytest.mark.slow
def test_matvec_sharded_radii_matches_single_device():
    """Mixed-radii product over the 8-virtual-device mesh (near field
    cell-sharded, wave replicated) == single-device result."""
    from jax.sharding import Mesh

    rng = np.random.default_rng(13)
    n = 24
    pos = rng.uniform(0.0, BOX[0], size=(n, 3))
    groups = rng.integers(0, 2, size=n).astype(np.int32)
    f = rng.normal(size=(n, 3))
    p = _params(tol=1e-4)
    plan = ewald.make_plan(p, jnp.asarray(pos), group_of=groups)
    u1 = np.asarray(ewald.matvec(plan, jnp.asarray(f)))
    mesh = Mesh(np.array(jax.devices("cpu")[:8]), axis_names=("blobs",))
    u8 = np.asarray(ewald.matvec(plan, jnp.asarray(f), mesh=mesh))
    assert np.abs(u8 - u1).max() < 1e-10 * np.abs(u1).max()
