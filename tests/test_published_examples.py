"""Golden-data parity against results SHIPPED with the reference.

The reference's pair_active_rods example publishes the expected
instantaneous rigid-body velocities (`run_*_res.velocity.dat.reference`,
Section V.C of Balboa Usabiaga et al., arXiv:1602.02170): two active
extensile rods near a wall rotating counterclockwise about the wall
normal. We rebuild the example with our framework — the active slip via
`System.slip_fn` (the reference injects it through
examples/pair_active_rods/user_defined_functions.py::slip_extensile_rod)
— and must reproduce the shipped numbers to solver tolerance.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from rigidmultiblobswall_tpu.io import scene
from rigidmultiblobswall_tpu.models import kinematics as kin
from rigidmultiblobswall_tpu.models import solvers
from rigidmultiblobswall_tpu.models.system import BodyType, System, make_state

REF = "/root/reference/multi_bodies"
EX = os.path.join(REF, "examples/pair_active_rods")

pytestmark = pytest.mark.skipif(not os.path.isdir(EX),
                                reason="reference tree not present")


def _extensile_rod_slip(system, state, n_ends=0, n_perim=0):
    """slip_extensile_rod (slip_function.py): constant tangential slip of
    magnitude 20 toward the closest rod end over the outer 0.8 of each
    half-length; interior blobs and the `n_ends`-per-cap end blobs
    passive. Axis blob indices follow the reference's per-resolution
    choices."""
    speed = -20.0
    nb = system.types[0].num_blobs
    r = kin.blob_positions(system, state).reshape(
        system.num_bodies, nb, 3)
    if nb > 14:
        axis = r[:, nb - 2 * n_ends - 2] - r[:, n_perim - 2]
    else:
        axis = r[:, -1] - r[:, 0]
    length = jnp.linalg.norm(axis, axis=1, keepdims=True) \
        + 2.0 * system.blob_radius
    axis = axis / jnp.linalg.norm(axis, axis=1, keepdims=True)
    lower = length / 2.0 - 0.8
    upper = length / 2.0
    d = jnp.sum((r - state.pos[:, None, :]) * axis[:, None, :], axis=-1)
    slip = jnp.where(((d > lower) & (d <= upper))[..., None],
                     -speed * axis[:, None, :],
                     jnp.where(((d < -lower) & (d >= -upper))[..., None],
                               speed * axis[:, None, :], 0.0))
    if n_ends > 0:
        passive = jnp.arange(nb) >= nb - 2 * n_ends
        slip = jnp.where(passive[None, :, None], 0.0, slip)
    return slip.reshape(-1, 3)


CASES = {
    # res: (structure, blob_radius, slip kwargs)
    "low": ("Cylinder_N_14_Lg_1_9295_Rg_0_18323", 0.183228708092682,
            dict(n_ends=0, n_perim=0)),
    "mid": ("Cylinder_N_86_Lg_1_9384_Rg_0_1484", 0.0742,
            dict(n_ends=1, n_perim=6)),
    "high": ("Cylinder_N_324_Lg_2_0299_Rg_0_1554", 0.0402,
             dict(n_ends=6, n_perim=12)),
}


@pytest.mark.parametrize("res", ["low", "mid", "high"])
def test_pair_active_rods_matches_shipped_velocities(res):
    name, a, slip_kw = CASES[res]
    vertex = os.path.join(REF, f"Structures/{name}.vertex")
    clones = os.path.join(REF, f"Structures/{name}.clones")
    ref_cfg = scene.read_vertex_file(vertex)[:, :3]
    n, locs, quats = scene.read_clones_file(clones)
    assert n == 2

    t = BodyType(name="rod", ref_config=ref_cfg, count=2)
    system = System(
        types=(t,), eta=1e-3, blob_radius=a, kT=0.0, g=0.0,
        domain="single_wall", solver_tolerance=1e-9,
        slip_fn=lambda s, st: _extensile_rod_slip(s, st, **slip_kw))
    state = make_state(locs, quats)

    force_torque = jnp.asarray(
        np.loadtxt(os.path.join(EX, f"force_{res}_resolution.dat")))
    sol = solvers.solve_mobility_problem(system, state,
                                         force_torque=force_torque)
    golden = np.loadtxt(
        os.path.join(EX, f"run_{res}_res.velocity.dat.reference"))
    got = np.asarray(sol.velocities)
    err = np.abs(got - golden).max()
    assert err < 1e-5, (err, got)
    # the physics headline: both rods rotate counterclockwise about z at
    # omega_z ~ 4.0 rad/s (~0.64 Hz, README.md) at every resolution
    assert np.all(got[:, 5] > 3.0) and np.all(got[:, 5] < 5.0)
