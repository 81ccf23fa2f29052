import jax
import jax.numpy as jnp
import numpy as np

from rigidmultiblobswall_tpu.models import mcmc
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state


def _single_blob_system(kT=0.5, g=2.0):
    t = BodyType(name="b", ref_config=np.zeros((1, 3)), count=1)
    return System(types=(t,), blob_radius=0.25, kT=kT, g=g,
                  repulsion_strength_wall=1.0, debye_length_wall=0.25,
                  repulsion_strength=0.0, domain="single_wall")


def test_energy_components():
    system = _single_blob_system()
    state = make_state([[0, 0, 2.0]], [[1, 0, 0, 0]])
    e = float(mcmc.total_energy(system, state))
    # gravity + wall repulsion at z=2, a=0.25, b=0.25
    expected = 2.0 * 2.0 + 1.0 * np.exp(-(2.0 - 0.25) / 0.25)
    assert np.isclose(e, expected, rtol=1e-12)
    # below wall: huge penalty
    bad = make_state([[0, 0, -0.5]], [[1, 0, 0, 0]])
    assert float(mcmc.total_energy(system, bad)) > 1e4


def test_mcmc_chain_acceptance_and_validity():
    system = _single_blob_system()
    state = make_state([[0, 0, 1.0]], [[1, 0, 0, 0]])
    mc, traj, energies = mcmc.run_mcmc(system, state, jax.random.PRNGKey(0),
                                       n_steps=400, save_every=10)
    acc = int(mc.accepted) / 400
    assert 0.05 < acc < 1.0
    assert np.all(np.isfinite(np.asarray(energies)))
    assert np.all(np.asarray(traj.pos)[:, 0, 2] > 0)


def test_mcmc_save_cadence_matches_reference():
    """Reference cadence (many_body_MCMC.py:201): frame s is the
    post-move state at step s*n_save, all n_steps moves execute even when
    n_save does not divide n_steps, and frame 0 always exists."""
    system = _single_blob_system()
    state = make_state([[0, 0, 1.0]], [[1, 0, 0, 0]])
    mc, traj, energies = mcmc.run_mcmc(
        system, state, jax.random.PRNGKey(3), n_steps=105, save_every=10)
    # saved steps 0, 10, ..., 100 -> 11 frames
    assert np.asarray(energies).shape[0] == 11
    assert np.asarray(traj.pos).shape[0] == 11
    # frame 0 is after ONE move, not the initial condition (the chain can
    # accept at step 0); acceptance counter covers all 105 moves
    assert 0 <= int(mc.accepted) <= 105
    # the energies are the recorded chain states
    assert np.all(np.isfinite(np.asarray(energies)))
    # frame 0 differs from a 0-move chain with probability ~acceptance;
    # deterministically check shapes only (value checked via cadence)


def test_mcmc_gibbs_boltzmann_height_distribution():
    """Equilibrium height distribution of a single blob under gravity +
    wall repulsion must match exp(-U(z)/kT) (the reference's physics
    regression for samplers, e.g. single_sphere/)."""
    system = _single_blob_system(kT=0.5, g=2.0)
    state = make_state([[0, 0, 0.6]], [[1, 0, 0, 0]])
    mc, traj, _ = mcmc.run_mcmc(system, state, jax.random.PRNGKey(1),
                                n_steps=200000, save_every=10,
                                max_translation=0.3)
    z = np.asarray(traj.pos)[:, 0, 2]
    z = z[len(z) // 5:]  # burn-in

    # compare mean height against the analytic Gibbs-Boltzmann average
    zg = np.linspace(1e-4, 6, 4000)
    a, b, eps, g, kT = 0.25, 0.25, 1.0, 2.0, 0.5
    U = g * zg + np.where(zg < a, eps + eps * (a - zg) / b,
                          eps * np.exp(-(zg - a) / b))
    w = np.exp(-U / kT)
    z_mean_exact = np.trapezoid(zg * w, zg) / np.trapezoid(w, zg)
    assert np.isclose(z.mean(), z_mean_exact, rtol=0.1)


def test_adaptive_burn_in_changes_proposal():
    """Burn-in with high acceptance must grow max_translation
    (many_body_MCMC.py:192-199)."""
    system = _single_blob_system()
    state = make_state([[0, 0, 1.0]], [[1, 0, 0, 0]])
    mc, _, _ = mcmc.run_mcmc(system, state, jax.random.PRNGKey(1),
                             n_steps=10, save_every=10, initial_step=-200)
    d0 = 0.1 * system.blob_radius
    assert abs(float(mc.max_translation) - d0) > 1e-6


def test_rejection_sampler_bounds():
    """Accepted probability exp(-(E - E_min)/kT) must be <= 1 for all
    samples: E >= minimum_energy for every accepted draw."""
    system = _single_blob_system()
    res = mcmc.run_rejection_sampler(system, jax.random.PRNGKey(2),
                                     n_steps=200, n_estimate=200)
    energies = np.asarray(res.energies)
    accepted = np.asarray(res.accepted)
    assert accepted.sum() > 0
    assert np.all(energies >= float(res.minimum_energy))
    # accepted states lie in the sampling box and above the wall
    pos = np.asarray(res.states.pos)[accepted]
    assert np.all(np.isfinite(pos))
