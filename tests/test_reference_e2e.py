"""End-to-end trajectory parity against the REFERENCE CODE ITSELF.

Runs /root/reference's python-backend driver (via the py3.12
compatibility shim in tests/reference_shim.py) and our CLI on the SAME
input file, then compares the produced .clones trajectories step by
step. Deterministic schemes only (no RNG coupling)."""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF = "/root/reference/multi_bodies"
SHIM = os.path.join(REPO, "tests", "reference_shim.py")

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference tree not present")


def _input_text(scheme, structures, n_steps=5, dt=0.01, extra=""):
    lines = [f"""
scheme                                   {scheme}
mobility_blobs_implementation            python
mobility_vector_prod_implementation      python
blob_blob_force_implementation           python
body_body_force_torque_implementation    python
dt                                       {dt}
n_steps                                  {n_steps}
n_save                                   1
eta                                      1.0
g                                        1.0
blob_radius                              0.25
kT                                       0
repulsion_strength                       0.5
debye_length                             0.25
repulsion_strength_wall                  0.5
debye_length_wall                        0.25
solver_tolerance                         1e-10
seed                                     0
save_clones                              one_file_per_step
output_name                              OUTPUT
{extra}
"""]
    for s in structures:
        lines.append("structure " + " ".join(s))
    return "\n".join(lines) + "\n"


def _run_reference(workdir, input_path):
    proc = subprocess.run(
        [sys.executable, SHIM,
         os.path.join(REF, "multi_bodies.py"), "--input-file", input_path],
        cwd=workdir, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, proc.stderr[-3000:]


def _run_ours(workdir, input_path):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=1")
    proc = subprocess.run(
        [sys.executable, "-m", "rigidmultiblobswall_tpu.cli", "--f64",
         "--input-file", input_path],
        cwd=workdir, capture_output=True, text=True, timeout=900, env=env)
    assert proc.returncode == 0, proc.stderr[-3000:]


def _load_traj(prefix, name, n_steps):
    out = []
    for k in range(n_steps + 1):
        path = f"{prefix}.{name}.{k:08d}.clones"
        out.append(np.loadtxt(path, skiprows=1).reshape(-1, 7))
    return np.stack(out)


def _compare_trajectories(tmp_path, scheme, structures, name, n_steps=5,
                          dt=0.01, atol=1e-6, extra=""):
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    for d in (ref_dir, our_dir):
        (d / "input.dat").write_text(
            _input_text(scheme, structures, n_steps=n_steps, dt=dt,
                        extra=extra).replace("OUTPUT", "out"))
    _run_reference(str(ref_dir), "input.dat")
    _run_ours(str(our_dir), "input.dat")
    t_ref = _load_traj(str(ref_dir / "out"), name, n_steps)
    t_our = _load_traj(str(our_dir / "out"), name, n_steps)
    # orientations: quaternion sign is a gauge choice
    q_ref, q_our = t_ref[:, :, 3:], t_our[:, :, 3:]
    sign = np.sign(np.sum(q_ref * q_our, axis=-1, keepdims=True))
    err_pos = np.abs(t_ref[:, :, :3] - t_our[:, :, :3]).max()
    err_q = np.abs(q_ref - sign * q_our).max()
    assert err_pos < atol, f"position mismatch {err_pos:.3e}"
    assert err_q < atol, f"orientation mismatch {err_q:.3e}"
    return ref_dir, our_dir


def test_boomerang_forward_euler_matches_reference(tmp_path):
    """Single sedimenting boomerang above the wall, deterministic FE:
    trajectories must agree to solver tolerance."""
    vertex = os.path.join(REF, "Structures/boomerang_N_15.vertex")
    clones = os.path.join(REF, "Structures/boomerang_N_15.clones")
    _compare_trajectories(tmp_path, "deterministic_forward_euler",
                          [[vertex, clones]], "boomerang_N_15")


def test_multibody_shells_adams_bashforth_matches_reference(tmp_path):
    """Three interacting 12-blob shells (pair forces + wall + AB2):
    exercises the many-body GMRES + preconditioner + force path."""
    vertex = os.path.join(REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = str(tmp_path / "shells.clones")
    with open(clones, "w") as f:
        f.write("3\n")
        f.write("0 0 1.8 1 0 0 0\n")
        f.write("1.9 0 2.0 0.9238795 0 0.3826834 0\n")
        f.write("0.6 1.7 2.2 0.7071068 0.7071068 0 0\n")
    ref_dir, our_dir = _compare_trajectories(
        tmp_path, "deterministic_adams_bashforth",
        [[vertex, clones]], "shells", n_steps=4, dt=0.005)
    # both sides should also report comparable GMRES effort
    def iters(d):
        for line in open(str(d / "out.info")):
            if "deterministic_iterations_count" in line:
                return int(line.split()[-1])
        return None
    it_ref, it_our = iters(ref_dir), iters(our_dir)
    assert it_our is not None and it_our > 0
    if it_ref:
        assert it_our <= 3 * it_ref


def test_shells_deterministic_midpoint_matches_reference(tmp_path):
    """Two-solve midpoint scheme (quaternion_integrator_multi_bodies.py
    :188): the half-step re-solve and its warm start must not change the
    trajectory vs the reference."""
    vertex = os.path.join(REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = str(tmp_path / "shells.clones")
    with open(clones, "w") as f:
        f.write("2\n0 0 1.8 1 0 0 0\n1.9 0.3 2.1 0.9238795 0 0.3826834 0\n")
    _compare_trajectories(tmp_path, "deterministic_midpoint",
                          [[vertex, clones]], "shells", n_steps=4, dt=0.005)


def test_slip_trapz_zero_kT_matches_reference(tmp_path):
    """The recommended stochastic scheme (stochastic_Slip_Trapz,
    :925-1045) in its deterministic kT=0 limit: all three solves, the
    RFD plumbing and the trapezoidal average run in both codes with zero
    noise amplitude — trajectories must agree."""
    vertex = os.path.join(REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = str(tmp_path / "shells.clones")
    with open(clones, "w") as f:
        f.write("2\n0 0 1.8 1 0 0 0\n1.9 0 2.0 1 0 0 0\n")
    _compare_trajectories(tmp_path, "stochastic_Slip_Trapz",
                          [[vertex, clones]], "shells", n_steps=3, dt=0.005,
                          atol=2e-6)


@pytest.mark.parametrize("scheme", [
    "stochastic_EM",
    "stochastic_traction_EM",
    "stochastic_first_order_RFD",
    "stochastic_adams_bashforth",
    "stochastic_traction_AB",
    "stochastic_GDC_RFD",
    "stochastic_Slip_Mid",
    # dense-algebra family (O(N^3) utility schemes)
    "deterministic_forward_euler_dense_algebra",
    "stochastic_first_order_RFD_dense_algebra",
    "Fixman",
])
def test_stochastic_schemes_zero_kT_match_reference(tmp_path, scheme):
    """The whole stochastic scheme family in its deterministic kT=0
    limit: every solve/RFD/Lanczos plumbing path runs with zero noise
    amplitude in both codes and the trajectories must agree
    (quaternion_integrator_multi_bodies.py:262-1343)."""
    vertex = os.path.join(REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = str(tmp_path / "shells.clones")
    with open(clones, "w") as f:
        f.write("2\n0 0 1.8 1 0 0 0\n1.9 0 2.0 1 0 0 0\n")
    _compare_trajectories(tmp_path, scheme,
                          [[vertex, clones]], "shells", n_steps=3, dt=0.005,
                          atol=2e-6)


def test_body_body_yukawa_force_matches_reference(tmp_path):
    """Body-body Yukawa force path (multi_bodies_functions.py:359-408,
    enabled by body_body_force_torque_implementation): the body-level
    pair force must push two shells apart identically."""
    vertex = os.path.join(REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = str(tmp_path / "shells.clones")
    with open(clones, "w") as f:
        f.write("2\n0 0 2.0 1 0 0 0\n2.3 0 2.0 1 0 0 0\n")
    _compare_trajectories(
        tmp_path, "deterministic_forward_euler",
        [[vertex, clones]], "shells", n_steps=3, dt=0.01,
        extra="repulsion_strength_wall 0.0\ng 0.0")


def test_prescribed_obstacle_matches_reference(tmp_path):
    """A free shell next to a fixed obstacle shell (prescribed
    kinematics path, multi_bodies.py:1266-1301)."""
    vertex = os.path.join(REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    free_clones = str(tmp_path / "free.clones")
    obst_clones = str(tmp_path / "obst.clones")
    with open(free_clones, "w") as f:
        f.write("1\n2.2 0 2.0 1 0 0 0\n")
    with open(obst_clones, "w") as f:
        f.write("1\n0 0 2.0 1 0 0 0\n")
    extra = f"obstacle {vertex} {obst_clones}"
    _compare_trajectories(tmp_path, "deterministic_forward_euler",
                          [[vertex, free_clones]], "free",
                          n_steps=3, dt=0.01, extra=extra)


@pytest.mark.parametrize("scheme", [
    "articulated_deterministic_forward_euler",
    "articulated_deterministic_midpoint",
])
def test_articulated_chain_matches_reference(tmp_path, scheme):
    """Articulated 3-shell chain sedimenting above the wall: exercises
    the constraint blocks in the saddle solve + the nonlinear post-step
    projection (reference articulated/articulated.py:148-520 vs our
    Gauss-Newton), FE and midpoint variants
    (quaternion_integrator_multi_bodies.py:1638, :1690)."""
    vertex = os.path.join(REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    for d in ("ref", "ours"):
        (tmp_path / d).mkdir(exist_ok=True)
        (tmp_path / d / "chain.list_vertex").write_text(
            f"{vertex}\n{vertex}\n{vertex}\n")
        (tmp_path / d / "chain.clones").write_text(
            "3\n0 0 2.0 1 0 0 0\n2.0 0 2.0 1 0 0 0\n4.0 0 2.0 1 0 0 0\n")
        (tmp_path / d / "chain.const").write_text(
            "3\n2\n"
            "0 1 1.0 0. 0. -1.0 0. 0.\n"
            "1 2 1.0 0. 0. -1.0 0. 0.\n")
    structures = []  # articulated entry goes through `extra`
    extra = "articulated chain.list_vertex chain.clones chain.const"
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    for d in (ref_dir, our_dir):
        (d / "input.dat").write_text(
            _input_text(scheme, structures, n_steps=3, dt=0.01,
                        extra=extra).replace("OUTPUT", "out"))
    _run_reference(str(ref_dir), "input.dat")
    _run_ours(str(our_dir), "input.dat")
    t_ref = _load_traj(str(ref_dir / "out"), "chain", 3)
    t_our = _load_traj(str(our_dir / "out"), "chain", 3)
    q_ref, q_our = t_ref[:, :, 3:], t_our[:, :, 3:]
    sign = np.sign(np.sum(q_ref * q_our, axis=-1, keepdims=True))
    err_pos = np.abs(t_ref[:, :, :3] - t_our[:, :, :3]).max()
    err_q = np.abs(q_ref - sign * q_our).max()
    assert err_pos < 1e-5, f"position mismatch {err_pos:.3e}"
    assert err_q < 1e-5, f"orientation mismatch {err_q:.3e}"


def test_robot_arm_single_blob_articulated_matches_reference(tmp_path):
    """One 15-blob robot arm (the robot_arm_sedimentation example):
    single-blob articulated bodies driven by the grand-mobility
    constrained solve (articulated_deterministic_forward_euler_rollers,
    quaternion_integrator_rollers.py:737) sedimenting in unbounded
    flow."""
    ex = os.path.join(REF, "examples/robot_arm_sedimentation_example")
    const_src = open(os.path.join(
        ex, "robot_arm_N_15_Mx_10_Mz_10.const")).read()
    blob_vertex = os.path.join(ex, "blob.vertex")
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    for d in (ref_dir, our_dir):
        d.mkdir()
        (d / "arm.list_vertex").write_text(
            "".join(f"{blob_vertex}\n" for _ in range(15)))
        (d / "arm.clones").write_text(
            "15\n" + "".join(f"{2.5 * i} 0 0 1 0 0 0\n" for i in range(15)))
        (d / "arm.const").write_text(const_src)
        (d / "input.dat").write_text("""
scheme                                   articulated_deterministic_forward_euler_rollers
mobility_blobs_implementation            python_no_wall
mobility_vector_prod_implementation      numba_no_wall
domain                                   no_wall
blob_blob_force_implementation           python
body_body_force_torque_implementation    python
dt                                       0.01
n_steps                                  3
n_save                                   1
solver_tolerance                         1e-10
eta                                      1.0e-3
g                                        2.5e-2
blob_radius                              1
repulsion_strength                       0.0
repulsion_strength_wall                  0.0
save_clones                              one_file_per_step
output_name                              out
articulated arm.list_vertex arm.clones arm.const
""")
    _run_reference(str(ref_dir), "input.dat")
    _run_ours(str(our_dir), "input.dat")
    t_ref = _load_traj(str(ref_dir / "out"), "arm", 3)
    t_our = _load_traj(str(our_dir / "out"), "arm", 3)
    err_pos = np.abs(t_ref[:, :, :3] - t_our[:, :, :3]).max()
    assert err_pos < 1e-5, f"position mismatch {err_pos:.3e}"
    # the arm sediments: z decreases for every blob
    assert np.all(t_our[3, :, 2] < t_our[0, :, 2])


@pytest.mark.parametrize("scheme", [
    "deterministic_forward_euler_rollers",
    # the recommended rollers scheme in its kT=0 limit (AB2 +
    # constrained solve, zero noise/RFD amplitude)
    "stochastic_adams_bashforth_rollers",
])
def test_rollers_prescribed_omega_matches_reference(tmp_path, scheme):
    """Minimally-resolved microrollers (the examples/rollers setup):
    4 single-blob spheres above the wall driven at prescribed angular
    velocity — the constrained-omega torque solve M_rr T = w - M_rt F
    (quaternion_integrator_rollers.py:905-982) and the grand-mobility
    velocity assembly must reproduce the reference trajectory."""
    blob_vertex = os.path.join(REF, "Structures/blob.vertex")
    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    for d in (ref_dir, our_dir):
        d.mkdir()
        (d / "rollers.clones").write_text(
            "4\n" + "".join(f"{1.5 * i} 0 1.2 1 0 0 0\n" for i in range(4)))
        (d / "input.dat").write_text(f"""
scheme                                   {scheme}
mobility_blobs_implementation            python
mobility_vector_prod_implementation     numba
blob_blob_force_implementation           python
body_body_force_torque_implementation    python
domain                                   single_wall
dt                                       0.01
n_steps                                  3
n_save                                   1
solver_tolerance                         1e-10
eta                                      1.0e-3
g                                        0.0024892
blob_radius                              0.5
kT                                       0
omega_one_roller                         0.0 6.28 0.0
free_kinematics                          False
repulsion_strength                       0.0165677856
debye_length                             0.0656
repulsion_strength_wall                  0.0165677856
debye_length_wall                        0.0656
save_clones                              one_file_per_step
output_name                              out
structure {blob_vertex} rollers.clones
""")
    _run_reference(str(ref_dir), "input.dat")
    _run_ours(str(our_dir), "input.dat")
    t_ref = _load_traj(str(ref_dir / "out"), "rollers", 3)
    t_our = _load_traj(str(our_dir / "out"), "rollers", 3)
    err = np.abs(t_ref[:, :, :3] - t_our[:, :, :3]).max()
    assert err < 1e-6, f"position mismatch {err:.3e}"
    # rolling near the wall: omega_y > 0 propels +x
    assert np.all(t_our[3, :, 0] > t_our[0, :, 0])


def test_per_blob_radii_example_hydrodynamic_radii():
    """The examples/radii case: shells of hydrodynamic radius Rh=1 (the
    default blob radius) and Rh=0.5 (per-blob radius column in the
    .vertex file, mobility_radii_trans_times_force). The example is
    constructed so an isolated shell under total weight 12 g sediments
    at |v| = 12 g / (6 pi eta Rh) = 1/Rh exactly — the Stokes velocity
    recovers the advertised hydrodynamic radii. (The reference's pure-
    python radii backend crashes on shape, so the parity anchor is the
    analytic construction, not a subprocess run.)"""
    import jax.numpy as jnp

    from rigidmultiblobswall_tpu.io import scene
    from rigidmultiblobswall_tpu.models import solvers
    from rigidmultiblobswall_tpu.models.system import (BodyType, System,
                                                       make_state)

    v1 = scene.read_vertex_file(os.path.join(
        REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex"))
    v2 = scene.read_vertex_file(os.path.join(
        REF, "Structures/shell_N_12_Rg_0.3960_Rh_0.5.vertex"))
    assert v2.shape[1] == 4                 # explicit radius column
    eta, g, a = 0.0530516476972984, 0.083333333, 0.416420683
    t1 = BodyType(name="big", ref_config=v1[:, :3], count=1)
    t2 = BodyType(name="small", ref_config=v2[:, :3], count=1,
                  blob_radii=v2[:, 3])
    system = System(types=(t1, t2), eta=eta, blob_radius=a, g=0.0,
                    domain="no_wall", solver_tolerance=1e-10)
    # far apart: interactions negligible (the example puts them 1414 apart)
    state = make_state([[0.0, 0.0, 10.0], [1000.0, 1000.0, 10.0]],
                       [[1, 0, 0, 0], [1, 0, 0, 0]])
    W = 12.0 * g
    ft = jnp.asarray([[0.0, 0, -W, 0, 0, 0], [0.0, 0, -W, 0, 0, 0]])
    sol = solvers.solve_mobility_problem(system, state, force_torque=ft)
    v = np.asarray(sol.velocities)
    v_stokes_1 = W / (6 * np.pi * eta * 1.0)
    v_stokes_05 = W / (6 * np.pi * eta * 0.5)
    assert abs(-v[0, 2] / v_stokes_1 - 1.0) < 0.01, v[0]
    assert abs(-v[1, 2] / v_stokes_05 - 1.0) < 0.01, v[1]
    # lateral drift and spin vanish up to the 12-blob discretization's
    # residual anisotropy
    assert np.abs(v[:, [0, 1, 3, 4]]).max() < 1e-5


def test_squirmer_slip_matches_reference(tmp_path):
    """Slip-driven swimmer (the reference's squirmer example): a
    prescribed surface slip rotated to the lab frame every step must
    propel the body identically in both codes (slip pipeline:
    multi_bodies.py:170-174 vs BodyType.slip_ref)."""
    ex = os.path.join(REF, "examples/squirmer")
    vertex = os.path.join(REF, "Structures/shell_N_42_Rg_0_8913_Rh_1.vertex")
    slip = os.path.join(ex, "squirmer.slip")
    clones = str(tmp_path / "squirmer.clones")
    with open(clones, "w") as f:
        f.write("1\n0 0 3 0.707106781 0 0.707106781 0\n")
    _compare_trajectories(
        tmp_path, "deterministic_forward_euler",
        [[vertex, clones, slip]], "squirmer", n_steps=3, dt=0.01,
        extra="g 0.0")


# ---------------------------------------------------------------------------
# Flagellated bacteria (examples/bacteria): two-body articulated swimmer
# with REDUNDANT links (the head-flagellum weld is expressed as multiple
# ball joints, so C N C^T is exactly singular and the articulated PC
# must use pinv, multi_bodies.py:806).

_BACT_INPUT = """
scheme                                   articulated_deterministic_midpoint
mobility_blobs_implementation            python_no_wall
mobility_vector_prod_implementation      python_no_wall
domain                                   no_wall
blob_blob_force_implementation           python
dt                                       0.0025
n_steps                                  3
n_save                                   1
update_PC                                1
solver_tolerance                         1e-10
nonlinear_solver_tolerance               1e-10
eta                                      1e-03
g                                        0
blob_radius                              0.1310
repulsion_strength                       0.01
debye_length                             0.01310
repulsion_strength_wall                  0
debye_length_wall                        0.01310
save_clones                              one_file_per_step
output_name                              out
"""


def _bacteria_dir(d, const_path, clones_name, extra=""):
    d.mkdir(exist_ok=True)
    shell = os.path.join(REF, "Structures/shell_N_162_Rg_0_9497_Rh_1.vertex")
    flag = os.path.join(REF, "Structures/flagellum_L_10_alpha_0.35.vertex")
    (d / "bact.list_vertex").write_text(f"{shell}\n{flag}\n")
    (d / clones_name).write_text("2\n0 0 3 1 0 0 0\n0 0 4.262 1 0 0 0\n")
    (d / "input.dat").write_text(
        _BACT_INPUT + extra
        + f"\narticulated bact.list_vertex {clones_name} {const_path}\n")


def _compare_bacteria(tmp_path, name, n_steps=3, atol=5e-5):
    t_ref = _load_traj(str(tmp_path / "ref" / "out"), name, n_steps)
    t_our = _load_traj(str(tmp_path / "ours" / "out"), name, n_steps)
    q_ref, q_our = t_ref[:, :, 3:], t_our[:, :, 3:]
    sign = np.sign(np.sum(q_ref * q_our, axis=-1, keepdims=True))
    err_pos = np.abs(t_ref[:, :, :3] - t_our[:, :, :3]).max()
    err_q = np.abs(q_ref - sign * q_our).max()
    # per-step drift is ~3e-6: both codes solve the SINGULAR redundant-
    # constraint saddle system to 1e-10 residual, which conditioning
    # amplifies in the solution components
    assert err_pos < atol, f"position mismatch {err_pos:.3e}"
    assert err_q < atol, f"orientation mismatch {err_q:.3e}"
    return t_our


def test_bacteria_time_dependent_links_matches_reference(tmp_path):
    """Constant-angular-velocity bacterium (examples/bacteria,
    inputfile_bacteria_constant_angular_velocity.dat): the third link of
    Structures/bacteria_active.const carries cos/sin time expressions,
    so the constraint RHS gets the rotating links_deriv terms
    (constraint.py:106-119) and the flagellum is DRIVEN at
    omega_rel = 100 about the body axis."""
    const = os.path.join(REF, "Structures/bacteria_active.const")
    for d in ("ref", "ours"):
        _bacteria_dir(tmp_path / d, const, "bact.clones")
    _run_reference(str(tmp_path / "ref"), "input.dat")
    _run_ours(str(tmp_path / "ours"), "input.dat")
    t = _compare_bacteria(tmp_path, "bact")
    # the drive really spins the flagellum relative to the head: the two
    # bodies' quaternions separate from their identical start
    assert np.abs(t[-1, 0, 3:] - t[-1, 1, 3:]).max() > 1e-3


def test_bacteria_constant_torque_udf_matches_reference(tmp_path):
    """Constant-torque bacterium (examples/bacteria,
    inputfile_bacteria_constant_torque.dat): a user_defined_functions.py
    overrides the body-body force to apply +/- R tau in the body frame
    (head +, flagellum -, zero total) — the reference's L5 extension
    mechanism (multi_bodies_functions.py:474) vs our CLI hook loading,
    which must also REPLACE the built-in Yukawa body-body force."""
    const = os.path.join(REF, "Structures/bacteria_passive.const")
    extra = ("body_body_force_torque_implementation    python\n"
             "omega_one_roller                         0 0 0.4643845\n")
    for d in ("ref", "ours"):
        _bacteria_dir(tmp_path / d, const, "bacteria_constant_torque.clones",
                      extra=extra)
    # reference side: monkey-patch through the documented override hook
    (tmp_path / "ref" / "user_defined_functions.py").write_text("""
import numpy as np
import multi_bodies_functions


def _constant_torque(bodies, r_vectors, *args, **kwargs):
    ft = np.zeros((2 * len(bodies), 3))
    tau = np.asarray(kwargs.get('omega_one_roller'))
    sign = 1.0
    for i, b in enumerate(bodies):
        if b.ID == 'bacteria_constant_torque':
            ft[2 * i + 1] = sign * np.dot(b.orientation.rotation_matrix(),
                                          tau)
            sign = -sign
    return ft


multi_bodies_functions.calc_body_body_forces_torques_python = \\
    _constant_torque
""")
    # our side: the same physics through this framework's hook API
    (tmp_path / "ours" / "user_defined_functions.py").write_text("""
import jax.numpy as jnp
from rigidmultiblobswall_tpu.ops import quaternion as quat

TAU = (0.0, 0.0, 0.4643845)


def body_force_torque_fn(system, state, r_blobs):
    dtype = state.pos.dtype
    out = jnp.zeros((system.num_bodies, 6), dtype)
    tau = jnp.asarray(TAU, dtype)
    sign = 1.0
    for i, t in enumerate(system.types):
        if not t.name.startswith("bacteria_constant_torque"):
            continue
        sl = system.body_slice(i)
        R = quat.rotation_matrix(state.quat[sl])
        out = out.at[sl, 3:6].set(sign * jnp.einsum("cij,j->ci", R, tau))
        sign = -sign
    return out
""")
    _run_reference(str(tmp_path / "ref"), "input.dat")
    _run_ours(str(tmp_path / "ours"), "input.dat")
    t = _compare_bacteria(tmp_path, "bacteria_constant_torque")
    # the torque spins head and flagellum in opposite senses
    assert np.abs(t[-1, 0, 3:] - t[-1, 1, 3:]).max() > 1e-4


def _run_both_and_compare(tmp_path, input_text, name, n_steps, atol=1e-6):
    ref_dir, our_dir = tmp_path / "ref", tmp_path / "ours"
    for d in (ref_dir, our_dir):
        d.mkdir(exist_ok=True)
        (d / "input.dat").write_text(input_text)
    _run_reference(str(ref_dir), "input.dat")
    _run_ours(str(our_dir), "input.dat")
    t_ref = _load_traj(str(ref_dir / "out"), name, n_steps)
    t_our = _load_traj(str(our_dir / "out"), name, n_steps)
    q_ref, q_our = t_ref[:, :, 3:], t_our[:, :, 3:]
    sign = np.sign(np.sum(q_ref * q_our, axis=-1, keepdims=True))
    err_pos = np.abs(t_ref[:, :, :3] - t_our[:, :, :3]).max()
    err_q = np.abs(q_ref - sign * q_our).max()
    assert err_pos < atol, f"position mismatch {err_pos:.3e}"
    assert err_q < atol, f"orientation mismatch {err_q:.3e}"
    return t_ref, t_our


def test_free_surface_matches_reference(tmp_path):
    """Two shells sedimenting toward a FREE SURFACE (z=0): the reference's
    numba_free_surface product (mobility/mobility_numba.py free-surface
    image system) vs our domain='free_surface' reflected-image kernel.
    The dense-blobs PC uses the no-wall build on both sides (the
    reference ships no python free-surface dense builder); the PC only
    affects the iteration path, not the 1e-10-converged solution."""
    vertex = os.path.join(REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = str(tmp_path / "pair.clones")
    with open(clones, "w") as f:
        f.write("2\n0 0 1.1 1 0 0 0\n2.0 0 1.4 0.96 0.28 0 0\n")
    text = f"""
scheme                                   deterministic_forward_euler
mobility_blobs_implementation            python_no_wall
mobility_vector_prod_implementation      numba_free_surface
blob_blob_force_implementation           python
dt                                       0.01
n_steps                                  3
n_save                                   1
eta                                      1.0
g                                        1.0
blob_radius                              0.25
kT                                       0
repulsion_strength                       0.5
debye_length                             0.25
repulsion_strength_wall                  0.0
debye_length_wall                        0.25
solver_tolerance                         1e-10
save_clones                              one_file_per_step
output_name                              out
structure {vertex} {clones}
"""
    _run_both_and_compare(tmp_path, text, "pair", 3)


def test_pseudo_periodic_images_match_reference(tmp_path):
    """Two shells interacting ACROSS a periodic x-boundary: the
    reference's numba single-wall kernel with periodic_length applies
    the +-1 image convention (mobility_numba.py) that our pairwise
    engine reimplements (ops/mobility.py _box_offsets/_min_image).
    Bodies at x = 0.3 and x = 5.2 in an L_x = 5.6 box are nearest
    THROUGH the boundary, so a wrong image sweep shows immediately."""
    vertex = os.path.join(REF, "Structures/shell_N_12_Rg_0_7921_Rh_1.vertex")
    clones = str(tmp_path / "pair.clones")
    with open(clones, "w") as f:
        f.write("2\n0.3 0 1.5 1 0 0 0\n5.2 0 1.5 1 0 0 0\n")
    text = f"""
scheme                                   deterministic_forward_euler
mobility_blobs_implementation            python
mobility_vector_prod_implementation      numba
blob_blob_force_implementation           numba
periodic_length                          5.6 0 0
dt                                       0.01
n_steps                                  3
n_save                                   1
eta                                      1.0
g                                        1.0
blob_radius                              0.25
kT                                       0
repulsion_strength                       0.5
debye_length                             0.25
repulsion_strength_wall                  0.5
debye_length_wall                        0.25
solver_tolerance                         1e-10
save_clones                              one_file_per_step
output_name                              out
structure {vertex} {clones}
"""
    t_ref, t_our = _run_both_and_compare(tmp_path, text, "pair", 3)
    # the cross-boundary coupling must be visible: the two bodies'
    # z-velocities differ from an isolated body's by the pair coupling
    assert np.abs(t_our[1, 0, 2] - t_our[1, 1, 2]) < 1e-3
