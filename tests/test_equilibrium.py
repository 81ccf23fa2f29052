"""Physics regression: Brownian dynamics must sample the Gibbs-Boltzmann
distribution (the reference validates its integrators the same way, e.g.
single_sphere/ and the boomerang paper runs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.models import integrators
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state


def _gb_mean_height(kT, g, eps, a, b):
    z = np.linspace(1e-4, 8, 6000)
    U = g * z + np.where(z < a, eps + eps * (a - z) / b,
                         eps * np.exp(-(z - a) / b))
    w = np.exp(-U / kT)
    return np.trapezoid(z * w, z) / np.trapezoid(w, z)


def test_bulk_diffusion_coefficient_from_msd():
    """Einstein relation: the in-plane MSD slope of a Brownian body far
    from the wall must equal 2 kT mu_tt per dimension, with mu_tt from
    the body mobility solve (the reference's MSD physics regressions)."""
    from rigidmultiblobswall_tpu.models import solvers
    from rigidmultiblobswall_tpu.utils import analysis

    kT = 0.4
    t = BodyType(name="blob", ref_config=np.zeros((1, 3)), count=1)
    system = System(types=(t,), eta=1.3, blob_radius=0.35, kT=kT, g=0.0,
                    domain="no_wall")
    state = make_state([[0.0, 0.0, 100.0]], [[1.0, 0, 0, 0]])

    N_body = np.asarray(solvers.solve_body_mobility(system, state))
    mu = N_body[0, 0]

    dt = 0.02
    final, traj, aux = integrators.simulate(
        system, state, jax.random.PRNGKey(3), scheme="stochastic_EM",
        dt=dt, n_steps=20000, save_every=1, lanczos_max_iter=4,
        gmres_maxiter=20)
    xy = np.asarray(traj.pos)[:, 0, 0:2]
    msd = analysis.msd_fft(xy, max_lag=40)
    lags = np.arange(40) * dt
    slope = np.polyfit(lags[1:], msd[1:], 1)[0]
    D_measured = slope / 4.0  # 2 dimensions: MSD = 4 D t
    D_exact = kT * mu
    assert abs(D_measured - D_exact) / D_exact < 0.1, (D_measured, D_exact)


@pytest.mark.parametrize("scheme", ["stochastic_Slip_Trapz", "stochastic_EM"])
def test_single_blob_gibbs_boltzmann_height(scheme):
    """A single-blob body under gravity + wall repulsion: the long-run
    height distribution must match exp(-U(z)/kT). This exercises the full
    stochastic machinery (Lanczos noise, RFD drift, rejection)."""
    kT, g, eps, a, b = 0.25, 1.0, 1.0, 0.3, 0.15
    t = BodyType(name="blob", ref_config=np.zeros((1, 3)), count=1)
    system = System(types=(t,), eta=1.0, blob_radius=a, kT=kT, g=g,
                    domain="single_wall", repulsion_strength_wall=eps,
                    debye_length_wall=b)
    state = make_state([[0.0, 0.0, 0.8]], [[1.0, 0, 0, 0]])

    n_steps = 6000
    dt = 0.05
    final, traj, aux = integrators.simulate(
        system, state, jax.random.PRNGKey(11), scheme=scheme, dt=dt,
        n_steps=n_steps, save_every=4, lanczos_max_iter=8,
        gmres_maxiter=50)
    z = np.asarray(traj.pos)[:, 0, 2]
    z = z[len(z) // 4:]
    z_exact = _gb_mean_height(kT, g, eps, a, b)
    # EM has O(dt) bias; allow 12%
    assert abs(z.mean() - z_exact) / z_exact < 0.12, (z.mean(), z_exact)
    assert np.all(z > 0)
