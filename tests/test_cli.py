"""End-to-end CLI tests against goldens built from the reference's own
pure-python components (Body, Quaternion, single_wall_fluid_mobility)."""

import os

import numpy as np
import pytest

from rigidmultiblobswall_tpu import cli
from rigidmultiblobswall_tpu.io import scene
from tests.reference_oracle import load_reference_body, load_reference_mobility

REF_DIR = "/root/reference/multi_bodies"
REF_MOB = load_reference_mobility()
Body, Quaternion = load_reference_body()


def _reference_body_mobility(vertex, clones, eta, a):
    """Golden: the body_mobility scheme computed with reference classes
    (multi_bodies_utilities.py:583-614)."""
    ref_config = scene.read_vertex_file(vertex)
    n, locs, quats = scene.read_clones_file(clones)
    bodies = [Body(locs[i], Quaternion(quats[i]), ref_config, a)
              for i in range(n)]
    r_vectors = np.concatenate([b.get_r_vectors() for b in bodies])
    M = REF_MOB.single_wall_fluid_mobility(r_vectors, eta, a)
    K = np.zeros((r_vectors.size, 6 * n))
    offset = 0
    for k, b in enumerate(bodies):
        K[3 * offset:3 * (offset + b.Nblobs), 6 * k:6 * k + 6] = b.calc_K_matrix()
        offset += b.Nblobs
    return np.linalg.pinv(K.T @ np.linalg.inv(M) @ K)


def test_cli_body_mobility_matches_reference_golden(tmp_path, monkeypatch):
    vertex = os.path.join(REF_DIR, "Structures/boomerang_N_15.vertex")
    clones = os.path.join(REF_DIR, "Structures/boomerang_N_15.clones")
    if not os.path.exists(vertex):
        pytest.skip("reference structures not present")
    inp = tmp_path / "input.dat"
    out = str(tmp_path / "run")
    inp.write_text(f"""
scheme                body_mobility
eta                   1.0
blob_radius           0.25
output_name           {out}
structure             {vertex} {clones}
""")
    monkeypatch.chdir(tmp_path)
    cli.main(["--input-file", str(inp)])

    ours = np.loadtxt(out + ".body_mobility.dat")
    golden = _reference_body_mobility(vertex, clones, 1.0, 0.25)
    assert np.allclose(ours, golden, rtol=0, atol=1e-10)
    assert os.path.exists(out + ".body_slip_mobility.dat")
    assert os.path.exists(out + ".inputfile")
    assert os.path.exists(out + ".time")


def test_cli_mobility_scheme_outputs(tmp_path, monkeypatch):
    vertex = os.path.join(REF_DIR, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones_txt = "2\n0 0 2  1 0 0 0\n3 0 2  1 0 0 0\n"
    clones = tmp_path / "two.clones"
    clones.write_text(clones_txt)
    inp = tmp_path / "input.dat"
    out = str(tmp_path / "mob")
    inp.write_text(f"""
scheme                mobility
eta                   1.0
blob_radius           0.4
g                     1.0
output_name           {out}
structure             {vertex} {clones}
""")
    monkeypatch.chdir(tmp_path)
    cli.main(["--input-file", str(inp)])
    vel = np.loadtxt(out + ".velocity.dat")
    force = np.loadtxt(out + ".force.dat")
    assert vel.shape == (2, 6)
    assert force.shape == (2, 6)
    # both spheres sediment under gravity
    assert np.all(vel[:, 2] < 0)


def test_cli_dynamic_run_writes_trajectory(tmp_path, monkeypatch):
    vertex = os.path.join(REF_DIR, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = tmp_path / "one.clones"
    clones.write_text("1\n0 0 2  1 0 0 0\n")
    inp = tmp_path / "input.dat"
    out = str(tmp_path / "dyn")
    inp.write_text(f"""
scheme                stochastic_EM
dt                    0.001
n_steps               4
n_save                2
eta                   1.0
blob_radius           0.4
kT                    0.1
g                     1.0
repulsion_strength_wall  1.0
debye_length_wall     0.4
seed                  5
output_name           {out}
structure             {vertex} {clones}
""")
    monkeypatch.chdir(tmp_path)
    cli.main(["--input-file", str(inp)])
    # .clones snapshots at steps 0, 2, 4
    for s in (0, 2, 4):
        path = "%s.%s.%08d.clones" % (out, "one", s)
        n, locs, quats = scene.read_clones_file(path)
        assert n == 1
        assert np.all(np.isfinite(locs))
    info = open(out + ".info").read()
    assert "deterministic_iterations_count" in info


def test_cli_mcmc_scheme(tmp_path, monkeypatch):
    """body_mcmc scheme with adaptive burn-in writes .config and
    .MCMC_info (reference driver many_bodyMCMC/many_body_MCMC.py)."""
    vertex = os.path.join(REF_DIR, "Structures/shell_N_12_Rg_1_Rh_1_2625.vertex")
    clones = os.path.join(REF_DIR, "Structures/shell_N_12_Rg_1.clones")
    if not os.path.exists(vertex):
        pytest.skip("reference structures not present")
    inp = tmp_path / "input.dat"
    out = str(tmp_path / "run")
    inp.write_text(f"""
scheme                body_mcmc
n_steps               40
initial_step          -20
n_save                10
kT                    1.0
g                     1.0
blob_radius           0.25
seed                  0
save_clones           one_file
output_name           {out}
structure             {vertex} {clones}
""")
    monkeypatch.chdir(tmp_path)
    cli.main(["--input-file", str(inp)])
    info = open(out + ".MCMC_info").read()
    assert "acceptance ratio" in info and "max_translation" in info
    cfg_lines = open(out + ".shell_N_12_Rg_1.config").readlines()
    assert len(cfg_lines) > 0


def test_cli_lubrication_scheme(tmp_path, monkeypatch):
    """Lubrication trapezoidal driver with prescribed omega + torque
    cutoff (BASELINE config 5 composition) runs from an input file."""
    if not os.path.isdir("/root/reference/Lubrication/Resistance_Coefs"):
        pytest.skip("resistance tables not present")
    inp = tmp_path / "input.dat"
    out = str(tmp_path / "run")
    (tmp_path / "sphere.vertex").write_text("1\n0. 0. 0.\n")
    (tmp_path / "spheres.clones").write_text(
        "4\n0 0 1.2 1 0 0 0\n2.5 0 1.2 1 0 0 0\n"
        "0 2.5 1.2 1 0 0 0\n2.5 2.5 1.2 1 0 0 0\n")
    inp.write_text(f"""
scheme                lubrication_trapezoidal
n_steps               3
n_save                3
dt                    0.001
eta                   0.957e-3
blob_radius           1.0
kT                    0.004
g                     0.0025
repulsion_strength    0.016
debye_length          0.1
repulsion_strength_wall 0.016
debye_length_wall     0.1
solver_tolerance      1e-6
seed                  0
omega                 25.0
cut_torque            0.2
max_neighbors         3
Lub_Cut               4.0
repulsion_strength_firm 0.0163
firm_delta            1e-2
output_name           {out}
structure             sphere.vertex spheres.clones
""")
    monkeypatch.chdir(tmp_path)
    cli.main(["--input-file", str(inp)])
    info = open(out + ".info").read()
    assert "num_rejections_wall" in info
    pos = np.loadtxt(out + ".spheres.00000003.clones", skiprows=1)
    assert np.all(np.isfinite(pos))
    # prescribed spin about +y near the wall rolls the spheres in +x
    pos0 = np.loadtxt(str(tmp_path / "spheres.clones"), skiprows=1)
    assert np.mean(pos[:, 0] - pos0[:, 0]) > 0


def test_cli_phoretic_laplace_file(tmp_path, monkeypatch):
    """A .Laplace structure file triggers the boundary-integral slip
    coupling; a Janus sphere must self-propel along its axis
    (multi_bodies_utilities.py:290-317 wiring)."""
    vertex = os.path.join(REF_DIR,
                          "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    if not os.path.exists(vertex):
        pytest.skip("reference structures not present")
    v = np.loadtxt(vertex, skiprows=1)[:, :3]
    normals = v / np.linalg.norm(v, axis=1, keepdims=True)
    north = normals[:, 2] > 0
    lap = np.column_stack([
        normals, np.where(north, 5.0, 0.0), np.where(north, 0.0, 1.0),
        np.full(len(v), 5.0), np.full(len(v), 4 * np.pi / len(v))])
    np.savetxt(tmp_path / "janus.Laplace", lap)
    (tmp_path / "shell.clones").write_text("1\n0. 0. 3. 1. 0. 0. 0.\n")
    inp = tmp_path / "input.dat"
    out = str(tmp_path / "run")
    inp.write_text(f"""
scheme                deterministic_forward_euler
domain                no_wall
n_steps               2
n_save                1
dt                    0.05
eta                   1.0
g                     0
blob_radius           0.416
repulsion_strength    0
repulsion_strength_wall 0
solver_tolerance      1e-6
seed                  0
background_Laplace    1
save_clones           one_file
plot_concentration_field  -2 2 3 -2 2 3 1 5 3
output_name           {out}
structure             {vertex} shell.clones janus.Laplace
""")
    monkeypatch.chdir(tmp_path)
    cli.main(["--input-file", str(inp)])
    # the concentration field is written per saved frame
    vtk_txt = open(out + ".00000000.concentration_field.vtk").read()
    assert "SCALARS concentration" in vtk_txt
    rows = [l.split() for l in open(out + ".shell.config")
            if len(l.split()) == 7]
    p = np.array(rows, float)[:, :3]
    # self-propulsion: significant +z displacement with zero net force
    assert p[-1, 2] - p[0, 2] > 0.5
    assert abs(p[-1, 0] - p[0, 0]) < 1e-3


def test_cli_obstacle_scheme_validation(tmp_path):
    """Incompatible scheme + obstacle must fail at load
    (read_input.py:146-157)."""
    from rigidmultiblobswall_tpu.io import input_file as input_mod

    vertex = os.path.join(REF_DIR, "Structures/boomerang_N_15.vertex")
    clones = os.path.join(REF_DIR, "Structures/boomerang_N_15.clones")
    if not os.path.exists(vertex):
        pytest.skip("reference structures not present")
    inp = tmp_path / "input.dat"
    inp.write_text(f"""
scheme                stochastic_traction_EM
structure             {vertex} {clones}
obstacle              {vertex} {clones}
""")
    with pytest.raises(ValueError, match="Obstacles"):
        input_mod.read_input(str(inp))


def test_cli_restart_with_random_state(tmp_path, monkeypatch):
    """A run restarted from step 2 with the saved .random_state must
    reproduce the tail of an uninterrupted run exactly (the reference's
    np.random pickle restore + initial_step clones rewiring,
    multi_bodies.py:1154-1162, read_input.py:139-144)."""
    vertex = os.path.join(REF_DIR,
                          "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    if not os.path.exists(vertex):
        pytest.skip("reference structures not present")
    clones = tmp_path / "one.clones"
    clones.write_text("1\n0 0 2  1 0 0 0\n")

    def write_input(path, out, n_steps, initial_step=0, random_state=None):
        extra = (f"random_state          {random_state}\n"
                 if random_state else "")
        path.write_text(f"""
scheme                stochastic_EM
dt                    0.001
n_steps               {n_steps}
initial_step          {initial_step}
n_save                2
eta                   1.0
blob_radius           0.4
kT                    0.1
g                     1.0
repulsion_strength_wall  1.0
debye_length_wall     0.4
seed                  7
{extra}output_name           {out}
structure             {vertex} {clones}
""")

    monkeypatch.chdir(tmp_path)
    # uninterrupted 4-step run
    outC = str(tmp_path / "full")
    write_input(tmp_path / "inC.dat", outC, 4)
    cli.main(["--input-file", str(tmp_path / "inC.dat")])
    # 2-step run, then restart 2->4 from its clones + .random_state
    outA = str(tmp_path / "part")
    write_input(tmp_path / "inA.dat", outA, 2)
    cli.main(["--input-file", str(tmp_path / "inA.dat")])
    write_input(tmp_path / "inB.dat", outA, 4, initial_step=2,
                random_state=outA + ".random_state")
    cli.main(["--input-file", str(tmp_path / "inB.dat")])

    _, locC, quatC = scene.read_clones_file(outC + ".one.00000004.clones")
    _, locB, quatB = scene.read_clones_file(outA + ".one.00000004.clones")
    np.testing.assert_allclose(locB, locC, rtol=0, atol=1e-12)
    np.testing.assert_allclose(quatB, quatC, rtol=0, atol=1e-12)


def test_cli_dynamic_saves_mobilities(tmp_path, monkeypatch):
    """save_blobs_mobility/save_body_mobility dump the dense blob and 6x6
    body mobility at every save point (reference multi_bodies.py:1465-1477)."""
    vertex = os.path.join(REF_DIR, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = tmp_path / "one.clones"
    clones.write_text("1\n0 0 2  1 0 0 0\n")
    inp = tmp_path / "input.dat"
    out = str(tmp_path / "mobdump")
    inp.write_text(f"""
scheme                deterministic_forward_euler
dt                    0.001
n_steps               2
n_save                1
eta                   1.0
blob_radius           0.4
kT                    0.0
g                     1.0
save_blobs_mobility   True
save_body_mobility    True
output_name           {out}
structure             {vertex} {clones}
""")
    monkeypatch.chdir(tmp_path)
    cli.main(["--input-file", str(inp)])
    for s in (0, 1, 2):
        M = np.loadtxt("%s.blobs_mobility.%08d.dat" % (out, s))
        N = np.loadtxt("%s.body_mobility.%08d.dat" % (out, s))
        assert M.shape == (36, 36)
        assert N.shape == (6, 6)
        # both are SPD mobilities
        assert np.all(np.linalg.eigvalsh((M + M.T) / 2) > 0)
        assert np.all(np.linalg.eigvalsh((N + N.T) / 2) > 0)


def test_body_body_force_gate():
    """The Yukawa body-body force is opt-in: reference default
    body_body_force_torque_implementation=None adds nothing
    (multi_bodies.py:1139); 'python' activates it."""
    import dataclasses

    import jax.numpy as jnp

    from rigidmultiblobswall_tpu.models import kinematics as kin
    from rigidmultiblobswall_tpu.models import solvers
    from rigidmultiblobswall_tpu.models.system import (BodyType, System,
                                                       make_state)

    t = BodyType(name="b", ref_config=np.zeros((1, 3)), count=2)
    sys_off = System(types=(t,), eta=1.0, blob_radius=0.5, kT=0.0, g=0.0,
                     domain="single_wall", repulsion_strength=1.0,
                     debye_length=0.5)
    state = make_state(np.array([[0, 0, 2.0], [1.5, 0, 2.0]]),
                       np.tile([1.0, 0, 0, 0], (2, 1)))
    r = kin.blob_positions(sys_off, state)
    ft_off = solvers.force_torque_calculator(sys_off, state, r)
    sys_on = dataclasses.replace(sys_off, body_body_force_method="yukawa")
    ft_on = solvers.force_torque_calculator(sys_on, state, r)
    diff = np.asarray(ft_on - ft_off).reshape(2, 6)
    # equal-and-opposite extra x-forces, no torques
    assert abs(diff[0, 0]) > 1e-6
    np.testing.assert_allclose(diff[0, :3], -diff[1, :3], atol=1e-12)
    np.testing.assert_allclose(diff[:, 3:], 0.0, atol=1e-12)


def test_cli_body_mobility_double_layer(tmp_path, monkeypatch):
    """With a .Laplace file, body_mobility also writes the double-layer
    corrected slip mobility slip_mob @ (I/2 + D)
    (multi_bodies_utilities.py:607-613); D matches the reference's dense
    numba kernel formula."""
    vertex = os.path.join(REF_DIR,
                          "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    v = np.loadtxt(vertex, skiprows=1)[:, :3]
    normals = v / np.linalg.norm(v, axis=1, keepdims=True)
    lap = np.column_stack([
        normals, np.zeros(len(v)), np.ones(len(v)),
        np.ones(len(v)), np.full(len(v), 4 * np.pi / len(v))])
    np.savetxt(tmp_path / "s.Laplace", lap)
    (tmp_path / "s.clones").write_text("1\n0. 0. 3. 1. 0. 0. 0.\n")
    inp = tmp_path / "input.dat"
    out = str(tmp_path / "bm")
    inp.write_text(f"""
scheme                body_mobility
domain                no_wall
eta                   1.0
blob_radius           0.416
output_name           {out}
structure             {vertex} s.clones s.Laplace
""")
    monkeypatch.chdir(tmp_path)
    cli.main(["--input-file", str(inp)])
    slip_mob = np.loadtxt(out + ".body_slip_mobility.dat")
    dl = np.loadtxt(out + ".body_slip_mobility_double_layer.dat")
    assert dl.shape == slip_mob.shape == (6, 3 * len(v))

    # oracle: the reference's loop formula (zero diagonal blocks)
    n = len(v)
    D = np.zeros((3 * n, 3 * n))
    w = 4 * np.pi / n
    for i in range(n):
        for j in range(n):
            r = v[i] - v[j]
            rn = np.linalg.norm(r)
            if rn < 1e-14:
                continue
            D[3 * i:3 * i + 3, 3 * j:3 * j + 3] = (
                -3.0 / (4.0 * np.pi) * np.dot(r, normals[j]) * w
                * np.outer(r, r) / rn**5)
    np.testing.assert_allclose(dl, slip_mob @ (0.5 * np.eye(3 * n) + D),
                               rtol=1e-4, atol=1e-7)


def test_cli_user_defined_functions(tmp_path, monkeypatch):
    """A user_defined_functions.py in the run directory overrides the
    L5 force hooks (the reference's per-example override mechanism,
    multi_bodies_functions.py:466-472): a constant external torque makes
    the single sphere spin; postprocess sees every step."""
    vertex = os.path.join(REF_DIR, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = tmp_path / "one.clones"
    clones.write_text("1\n0 0 3  1 0 0 0\n")
    (tmp_path / "user_defined_functions.py").write_text("""
import jax.numpy as jnp

CALLS = []

def body_force_torque_fn(system, state, r_blobs):
    ft = jnp.zeros((system.num_bodies, 6), state.pos.dtype)
    return ft.at[:, 5].set(2.0)   # constant torque about z

def postprocess(system, state, step):
    CALLS.append(step)
    return state
""")
    inp = tmp_path / "input.dat"
    out = str(tmp_path / "udf")
    inp.write_text(f"""
scheme                deterministic_forward_euler
dt                    0.05
n_steps               4
n_save                4
eta                   1.0
blob_radius           0.4
kT                    0.0
g                     0.0
repulsion_strength    0
repulsion_strength_wall 0
output_name           {out}
structure             {vertex} {clones}
""")
    monkeypatch.chdir(tmp_path)
    cli.main(["--input-file", str(inp)])
    import sys as _sys
    udf_mod = _sys.modules.get("user_defined_functions")
    _, loc, quat = scene.read_clones_file(out + ".one.00000004.clones")
    # torque about z spins the quaternion away from identity about z
    assert abs(quat[0, 3]) > 1e-3
    assert abs(loc[0, 2] - 3.0) < 1e-6  # no force: no translation
    assert udf_mod is not None and udf_mod.CALLS == [0, 1, 2, 3]
