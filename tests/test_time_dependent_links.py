"""Time-dependent articulated links (the reference's numexpr .const extra
columns, constraint.py:100-127): an active hinge whose link length
oscillates must drive relative body motion."""

import jax
import jax.numpy as jnp
import numpy as np

from rigidmultiblobswall_tpu.models import articulated as art_mod
from rigidmultiblobswall_tpu.models import integrators
from rigidmultiblobswall_tpu.models.articulated import ArticulatedType
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state
from tests.test_saddle import _shell_vertices


def _oscillating_dimer(amp=0.2, omega=4.0, base=0.7):
    ref = _shell_vertices(8, 0.3)
    t0 = BodyType(name="s0", ref_config=ref, count=1)
    t1 = BodyType(name="s1", ref_config=ref, count=1)

    def links_fn(t):
        half = base + amp * jnp.sin(omega * t)
        links = jnp.stack([jnp.stack([half, 0.0, 0.0, -half, 0.0, 0.0])])
        dhalf = amp * omega * jnp.cos(omega * t)
        deriv = jnp.stack([jnp.stack([dhalf, 0.0, 0.0, -dhalf, 0.0, 0.0])])
        return links, deriv

    art = ArticulatedType(
        name="pulser", count=1, sub_type_indices=(0, 1),
        pairs_local=np.array([[0, 1]]),
        links=np.array([[base, 0, 0, -base, 0, 0]]), links_fn=links_fn)
    system = System(types=(t0, t1), articulated=(art,), eta=1.0,
                    blob_radius=0.1, g=0.0, domain="no_wall")
    pos = np.array([[0.0, 0.0, 5.0], [2 * base, 0.0, 5.0]])
    quat = np.tile([1.0, 0, 0, 0], (2, 1))
    return system, make_state(pos, quat)


def test_links_fn_evaluated_at_time():
    system, state = _oscillating_dimer()
    art = system.articulated[0]
    lp0, lq0, dp0, dq0 = art_mod.lab_frame_links(system, art, state, 0.0)
    lp1, lq1, dp1, dq1 = art_mod.lab_frame_links(system, art, state, 0.3)
    assert not np.allclose(np.asarray(lp0), np.asarray(lp1))
    assert abs(float(dp0[0, 0, 0])) > 0  # nonzero link velocity at t=0


def test_oscillating_link_drives_relative_motion():
    system, state = _oscillating_dimer()
    dt = 0.02
    step = jax.jit(integrators.make_stepper(
        system, "articulated_deterministic_forward_euler", dt,
        tolerance=1e-9))
    carry = integrators.init_carry(system)
    s = state
    seps = []
    for i in range(12):
        s, carry, aux = step(s, jax.random.PRNGKey(0), carry)
        seps.append(float(jnp.linalg.norm(s.pos[1] - s.pos[0])))
    seps = np.array(seps)
    # the separation must follow 2*(base + amp sin(omega t)) approximately
    t = dt * (np.arange(12) + 1)
    expected = 2 * (0.7 + 0.2 * np.sin(4.0 * t))
    assert np.allclose(seps, expected, atol=0.05), (seps, expected)
    # and actually oscillate (not constant)
    assert seps.max() - seps.min() > 0.1
