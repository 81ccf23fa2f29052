"""Post-processing tools (tools/bodies_to_xyz.py, histogram.py,
averageFiles.py equivalents)."""

import numpy as np

from rigidmultiblobswall_tpu.utils import tools


def test_read_config_and_bodies_to_xyz(tmp_path):
    cfg = tmp_path / "run.body.config"
    cfg.write_text(
        "2\n"
        "0 0 1  1 0 0 0\n"
        "3 0 1  0 0 0 1\n"   # 180deg about z
        "2\n"
        "0 0 2  1 0 0 0\n"
        "3 0 2  0 0 0 1\n")
    frames = tools.read_config_file(str(cfg))
    assert frames.shape == (2, 2, 7)

    ref = np.array([[0.5, 0.0, 0.0], [-0.5, 0.0, 0.0]])
    out = tmp_path / "run.xyz"
    n = tools.bodies_to_xyz(frames, ref, str(out), blob_radius=0.25)
    assert n == 2 * 2 * 2
    lines = out.read_text().splitlines()
    assert lines[0] == "4"
    # body 0 identity: blobs at +-0.5 in x
    row = lines[2].split()
    assert float(row[1]) == 0.5 and float(row[4]) == 0.25
    # body 1 rotated 180deg about z: first blob at 3 - 0.5
    row = lines[4].split()
    assert np.isclose(float(row[1]), 2.5)


def test_histogram_from_file(tmp_path):
    f = tmp_path / "traj.dat"
    rows = ["# comment", "0 0.25 9", "0 0.75 9", "0 0.75 9", "0 1.25 9"]
    f.write_text("\n".join(rows) + "\n")
    centers, dens = tools.histogram_from_file(str(f), 1, 0.0, 1.0, 2)
    assert np.allclose(centers, [0.25, 0.75])
    # 3 in-range samples, dx=0.5: density integrates to 1
    assert np.isclose(np.sum(dens) * 0.5, 1.0)
    assert np.isclose(dens[1] / dens[0], 2.0)


def test_average_files(tmp_path):
    for i, scale in enumerate([1.0, 3.0]):
        (tmp_path / f"f{i}.dat").write_text(
            "\n".join(f"{scale * r} {2 * scale * r}" for r in (1, 2)) + "\n")
    mean, err = tools.average_files(
        [str(tmp_path / "f0.dat"), str(tmp_path / "f1.dat")])
    assert np.allclose(mean, [[2.0, 4.0], [4.0, 8.0]])
    assert np.all(err > 0)
