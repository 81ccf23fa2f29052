import os

import numpy as np

from rigidmultiblobswall_tpu.io import input_file, scene

REF = "/root/reference"


def test_read_reference_vertex_file():
    path = os.path.join(REF, "multi_bodies/Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference structures not present")
    coor = scene.read_vertex_file(path)
    assert coor.shape[1] in (3, 4)
    assert coor.shape[0] == 12


def test_roundtrip_clones(tmp_path):
    rng = np.random.default_rng(0)
    loc = rng.normal(size=(5, 3))
    q = rng.normal(size=(5, 4))
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    p = tmp_path / "test.clones"
    scene.write_clones_file(p, loc, q)
    n, loc2, q2 = scene.read_clones_file(p)
    assert n == 5
    assert np.allclose(loc, loc2, atol=1e-12)
    assert np.allclose(q, q2, atol=1e-12)


def test_parse_reference_input_file():
    path = os.path.join(REF, "multi_bodies/inputfile_body_mobility.dat")
    if not os.path.exists(path):
        import pytest

        pytest.skip("reference input not present")
    cfg = input_file.read_input(path)
    assert cfg.scheme == "body_mobility"
    assert len(cfg.structures) == 1


def test_build_system_from_input(tmp_path):
    # synthesize a small scene
    vertex = tmp_path / "rod.vertex"
    vertex.write_text("2\n0 0 0\n0.5 0 0\n")
    clones = tmp_path / "rod.clones"
    clones.write_text("2\n0 0 1  1 0 0 0\n2 0 1.5  1 0 0 0\n")
    inp = tmp_path / "input.dat"
    inp.write_text(f"""
# test input
scheme                deterministic_forward_euler
dt                    0.01
n_steps               5
eta                   1.3
blob_radius           0.25
kT                    0.2
domain                single_wall
structure             {vertex} {clones}
""")
    cfg = input_file.read_input(str(inp))
    system, state = input_file.build_system(cfg)
    assert system.num_bodies == 2
    assert system.num_blobs == 4
    assert system.eta == 1.3
    assert state.pos.shape == (2, 3)
    assert np.allclose(np.asarray(state.pos)[1], [2, 0, 1.5])


def test_blob_blob_force_implementation_default_is_off(tmp_path):
    """The reference defaults blob_blob_force_implementation=None -> zero
    blob-blob forces (read_input.py:69, multi_bodies_functions.py:260);
    naming any backend enables the one XLA implementation."""
    import jax.numpy as jnp

    from rigidmultiblobswall_tpu.io import input_file as im
    from rigidmultiblobswall_tpu.models import kinematics as kin
    from rigidmultiblobswall_tpu.models import solvers

    (tmp_path / "b.vertex").write_text("1\n0. 0. 0.\n")
    (tmp_path / "b.clones").write_text("2\n0 0 2 1 0 0 0\n0.9 0 2 1 0 0 0\n")
    base = """
g                    0.0
blob_radius          0.5
repulsion_strength   1.0
debye_length         0.5
repulsion_strength_wall 0.0
structure            b.vertex b.clones
"""
    (tmp_path / "off.dat").write_text(base)
    (tmp_path / "on.dat").write_text(
        "blob_blob_force_implementation  python\n" + base)
    ft = {}
    for name in ("off", "on"):
        cfg = im.read_input(tmp_path / f"{name}.dat")
        system, state = im.build_system(cfg, base_dir=str(tmp_path))
        r = kin.blob_positions(system, state)
        ft[name] = np.asarray(
            solvers.force_torque_calculator(system, state, r))
    assert np.allclose(ft["off"], 0.0)
    assert abs(ft["on"][0, 0]) > 1e-3          # overlapping pair repels in x
    assert np.allclose(ft["on"][0, :3], -ft["on"][1, :3])
