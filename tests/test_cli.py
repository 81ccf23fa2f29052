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
